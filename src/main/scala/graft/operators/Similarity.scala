package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an `embeddings(vec_id BIGINT, embedding
  * ARRAY<FLOAT>)` table (north-star surface, `BASELINE.json:6`; no
  * reference precedent).
  *
  * Numeric determinism: all dot products are computed over DOUBLE with a
  * strict left-to-right fold (`aggregate(zip_with(...))`), matching DuckDB's
  * sequential `list_dot_product` — float32 inputs widen exactly to double,
  * so the two engines run the identical IEEE operation sequence.
  */
object Similarity {

  /** Left-to-right double dot product of two ARRAY<DOUBLE> columns — the
    * codegen'd `graft.functions.DotProduct` expression (identical IEEE
    * sequence as the `aggregate(zip_with(...))` fold it replaced). */
  def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** Cosine similarity of two ARRAY<DOUBLE> columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force cosine top-k against one query vector.
    *
    * The query vector is a literal (broadcast with the plan), so this is a
    * single scan + per-row expression + TakeOrderedAndProject — no shuffle
    * beyond the final top-k merge. This is the exact baseline; recall=1.
    * At 100 TB, scan cost dominates → see `ivfTopK` for the pruned path.
    * Ordering is on the ROUNDED similarity (ties broken by vec_id) so the
    * result is stable across engines and runs.
    */
  def bruteForceTopK(embs: DataFrame, query: Seq[Double], k: Int): DataFrame = {
    val q = lit(query.toArray)
    embs
      .select(col("vec_id"), round(cosine(asDouble(col("embedding")), q), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Exact all-pairs cosine scoring at/above `threshold`.
    *
    * The vector table is collected and broadcast — the same data movement
    * as a broadcast hash join's build side (embeddings tables at the dim
    * scale this targets are MBs) — and each task scores a stripe of rows
    * against the broadcast matrix with primitive-array loops. This is the
    * documented `mapPartitions` escape hatch: a per-partition numeric
    * kernel that Catalyst HOFs interpret ~100× slower.
    *
    * Numeric contract: dots accumulate left-to-right in double, norms are
    * `sqrt(self-dot)` — the identical IEEE sequence as the DuckDB oracle's
    * `list_dot_product`-based cosine, so results hash-match.
    *
    * At 100 TB: all-pairs is inherently quadratic; block first (lshBuckets
    * or IVF cells) and run this scorer within blocks.
    */
  def pairwiseCosine(embs: DataFrame, threshold: Double): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val rows = embs.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val ids = rows.map(_._1)
    val vecs = rows.map(_._2.map(_.toDouble))
    val bc = spark.sparkContext.broadcast((ids, vecs))
    val n = ids.length
    val scored = spark.range(n).as[Long].mapPartitions { stripe =>
      val (ids, vecs) = bc.value
      def dot(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var k = 0
        while (k < a.length) { s += a(k) * b(k); k += 1 }
        s
      }
      val norms = vecs.map(v => math.sqrt(dot(v, v)))
      stripe.flatMap { i0 =>
        val i = i0.toInt
        // zero-norm vectors have no direction: skip (their cosine is NaN,
        // which different engines compare against the threshold differently)
        if (norms(i) == 0.0) Iterator.empty
        else Iterator.range(i + 1, n).flatMap { j =>
          if (norms(j) == 0.0) None
          else {
            val s = dot(vecs(i), vecs(j)) / (norms(i) * norms(j))
            if (s >= threshold) Some((ids(i), ids(j), s)) else None
          }
        }
      }
    }.toDF("vec_a", "vec_b", "sim")
    scored.select(col("vec_a"), col("vec_b"), round(col("sim"), 6).as("sim"))
  }

  /** Signed random-hyperplane LSH bucket per vector: bit p of the bucket id
    * is the sign of `v · h_p` where hyperplane component `h_p[j] =
    * ((p * 31 + j * 17) mod 7) - 3` — small-integer hyperplanes chosen so
    * every product is exact in double and the sign is engine-independent.
    *
    * Scale path: bucketing is one narrow projection (no shuffle); near-dup
    * or ANN search then only compares vectors within a bucket (or within
    * Hamming-1 neighbor buckets for higher recall).
    */
  def lshBuckets(embs: DataFrame, numPlanes: Int = 8): DataFrame = {
    val bits = (0 until numPlanes).map { p =>
      val planeDot = aggregate(
        zip_with(asDouble(col("embedding")),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, j) => x * ((lit(p) * 31 + j * 17) % 7 - 3).cast("double")),
        lit(0.0d), (acc, x) => acc + x)
      when(planeDot > 0, lit("1")).otherwise(lit("0"))
    }
    embs.select(col("vec_id"), concat(bits: _*).as("bucket"))
  }

  /** IVF-style ANN top-k: assign every vector to its nearest of `nCells`
    * centroids (deterministically seeded as the first `nCells` vectors by
    * vec_id), search only the `nProbe` cells nearest the query.
    *
    * The centroid table is metadata-scale → broadcast join; the big side is
    * scanned once with a per-row argmin over the broadcast centroids; the
    * probed fraction ≈ nProbe/nCells of the data is then scored exactly.
    * At 100 TB: partition (bucket) the stored table BY cell id so probing
    * prunes file reads, not just rows.
    */
  def ivfTopK(embs: DataFrame, query: Seq[Double], k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = embs.sparkSession
    val cents = embs.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cell"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("cv"))
    val assigned = embs
      .join(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cell"),
        cosine(asDouble(col("embedding")), col("cv")).as("csim"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cell"))))
      .where(col("rk") === 1)
      .drop("rk", "csim")
    val q = lit(query.toArray)
    val probeCells = cents
      .select(col("cell"), cosine(col("cv"), q).as("qsim"))
      .orderBy(col("qsim").desc, col("cell"))
      .limit(nProbe)
    assigned
      .join(broadcast(probeCells.select(col("cell"))), Seq("cell"), "left_semi")
      .select(col("vec_id"), round(cosine(asDouble(col("embedding")), q), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
