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

  /** Scalar-quantized ANN top-k — the memory-compression scale path the
    * brute/LSH/IVF variants don't cover: every dimension quantizes to an
    * integer in [−64, 64] (`floor(clamp(x, −1, 1) · 64)` — floor, not
    * round, because floor is bit-identical across engines while round
    * differs at exact halves), candidates rank by the INTEGER quantized
    * dot product, and only the top `rescoreK` survivors are rescored with
    * the exact double cosine for the final top-k.
    *
    * 100 TB story: the candidate scan reads ~4× fewer bytes than float32
    * embeddings (8× vs double) and the integer dot is SIMD-friendly; the
    * exact (expensive) kernel touches rescoreK rows, not the corpus. The
    * plan is scan + expression + TakeOrderedAndProject twice — no shuffle
    * beyond the two top-k merges.
    *
    * Determinism: quantization is floor-based, the integer dot is exact in
    * both engines (|dot| ≤ 64²·dim ≪ 2⁵³, so DuckDB's double
    * `list_dot_product` is exact too), and both top-k boundaries tie-break
    * on vec_id.
    *
    * Dimension contract: `zip_with` null-pads mismatched lengths, which
    * would silently rank a wrong-dim row last (qdot null) while DuckDB's
    * `list_dot_product` ERRORS on the same input — asymmetric failure
    * modes. The per-row guard below makes a mismatch fail fast with the
    * same observable outcome (job error) in both engines; it costs one
    * codegen'd `size()` compare per row. */
  def sqTopK(embs: DataFrame, query: Seq[Double], k: Int, rescoreK: Int = 40): DataFrame = {
    require(query.nonEmpty, "sqTopK: query vector must be non-empty")
    val qq = query.map(x =>
      math.floor(math.max(-1.0, math.min(1.0, x)) * 64).toLong).toArray
    val quant = expr(
      "transform(embedding, x -> CAST(floor(greatest(least(CAST(x AS DOUBLE), 1.0D), -1.0D) * 64) AS BIGINT))")
    val qdot0 = aggregate(
      zip_with(quant, lit(qq), (a, b) => a * b), lit(0L), (acc, x) => acc + x)
    val qdot = when(size(col("embedding")) =!= lit(query.length),
      raise_error(concat(
        lit(s"sqTopK: query dim ${query.length} != embedding dim "),
        size(col("embedding")).cast("string"),
        lit(" at vec_id "), col("vec_id").cast("string"))))
      .otherwise(qdot0)
    embs
      .select(col("vec_id"), col("embedding"), qdot.as("qdot"))
      .orderBy(col("qdot").desc, col("vec_id"))
      .limit(rescoreK)
      .select(col("vec_id"),
        round(cosine(asDouble(col("embedding")), lit(query.toArray)), 6).as("sim"),
        col("qdot"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Product-quantized ANN top-k (the OTHER classic compressed-domain ANN
    * path next to [[sqTopK]]'s scalar quantization — Jégou et al. 2011,
    * "Product Quantization for Nearest Neighbor Search"): the vector space
    * splits into `numSubs` subspaces; each subvector encodes as the id of
    * its nearest codebook entry (argmin squared-L2, deterministically
    * seeded codebook = the subvectors of the first `numCents` non-zero
    * vectors — the IVF seed trick applied per subspace); candidates rank
    * by the ADC (asymmetric-distance) score — the SUM of per-subspace
    * `query·centroid` lookup-table entries — and only the top `rescoreK`
    * survivors are rescored with the exact double cosine.
    *
    * 100 TB story: a 64-dim float corpus compresses to `numSubs` BYTES per
    * vector (16× under float32, 64× under double) once codes are
    * materialized; the candidate scan then reads codes + a broadcast LUT,
    * and the exact kernel touches rescoreK rows. Here codes are computed
    * inline (one codegen'd argmin per subspace over broadcast-literal
    * codebooks — zero exchanges, the sqTopK plan shape with two
    * TakeOrderedAndProject passes); `write codes once, scan forever` is
    * the buildIvfIndex pattern applied to this encoder.
    *
    * Determinism (oracle-replayable end to end): the argmin compares
    * `c·c − 2·v_sub·c` (equivalent to squared-L2 up to the per-row
    * constant ‖v_sub‖², which cannot reorder candidates), ties break to
    * the smallest codebook position — the row_number(s2, cid) order; all
    * dot products are the same left-to-right IEEE sequence on both
    * engines; the 4-term ADC sum is a fixed-order a+b+c+d; both top-k
    * boundaries tie-break on vec_id. Zero-norm rows are excluded (cosine
    * undefined), matching the IVF contract. */
  def pqTopK(embs: DataFrame, query: Seq[Double], k: Int,
      numSubs: Int = 4, numCents: Int = 16, rescoreK: Int = 40): DataFrame = {
    require(query.nonEmpty, "pqTopK: query vector must be non-empty")
    val dim = query.length
    require(dim % numSubs == 0, s"pqTopK: dim $dim not divisible into $numSubs subspaces")
    val subLen = dim / numSubs
    val qArr = query.toArray
    val cents = centroidsOf(embs, numCents)
    require(cents.forall(_._2.length == dim),
      s"pqTopK: codebook seed vectors must have query dim $dim")
    val base = nonZeroVecs(embs)
      // fail fast on a dim mismatch (sqTopK contract: identical observable
      // outcome in both engines instead of silent null-padding)
      .withColumn("v", when(size(col("v")) =!= lit(dim),
          raise_error(concat(lit(s"pqTopK: query dim $dim != embedding dim "),
            size(col("v")).cast("string"), lit(" at vec_id "),
            col("vec_id").cast("string"))))
        .otherwise(col("v")))
    val adcTerms = (0 until numSubs).map { j =>
      val cbs = pqSubCodebook(cents, j, subLen)
      val code = pqCodeExpr(cbs, j, subLen)
      element_at(lit(pqLut(cbs, qArr, j, subLen)), code.cast("int") + 1)
    }
    base
      .select(col("vec_id"), col("v"), adcTerms.reduceLeft(_ + _).as("approx"))
      .orderBy(col("approx").desc, col("vec_id"))
      .limit(rescoreK)
      .select(col("vec_id"), round(cosine(col("v"), lit(qArr)), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Codebook of subspace `j`: (position, centroid subvector) pairs. */
  private def pqSubCodebook(cents: Array[(Long, Array[Double])], j: Int,
      subLen: Int): Array[(Long, Array[Double])] =
    cents.zipWithIndex.map { case ((_, cv), pos) =>
      (pos.toLong, cv.slice(j * subLen, (j + 1) * subLen))
    }

  /** Nearest-codebook-entry id for subspace `j` of `v` — the codegen'd
    * argmin of `c·c − 2·v_sub·c` (squared-L2 minus the per-row constant),
    * ties to the smallest position. */
  private def pqCodeExpr(cbs: Array[(Long, Array[Double])], j: Int,
      subLen: Int): Column = {
    val subv = slice(col("v"), j * subLen + 1, subLen)
    val codeStructs = cbs.map { case (pos, c) =>
      struct(
        (-(lit(sdot(c, c)) - lit(2.0) * dot(subv, lit(c)))).as("negs"),
        lit(-pos).as("negp"))
    }
    -array_max(array(codeStructs.toIndexedSeq: _*)).getField("negp")
  }

  /** ADC lookup table of subspace `j`: `query_sub · centroid` per entry. */
  private def pqLut(cbs: Array[(Long, Array[Double])], qArr: Array[Double],
      j: Int, subLen: Int): Array[Double] =
    cbs.map { case (_, c) => sdot(qArr.slice(j * subLen, (j + 1) * subLen), c) }

  /** Materialize the PQ compression: `(vec_id, codes ARRAY<INT>)` — one
    * code per subspace, i.e. ~`numSubs` BYTES of payload per vector — plus
    * the codebook, under `indexDir`. This is where [[pqTopK]]'s compression
    * claim becomes real bytes: a probe scans the codes table (plus
    * lookup-table metadata) instead of the float corpus, and only the
    * rescore touches `rescoreK` full vectors by id. The `buildIvfIndex`
    * pattern applied to the encoder: codebook stored alongside so probes
    * and growth always use the BUILD-time geometry. */
  def buildPqIndex(embs: DataFrame, indexDir: String,
      numSubs: Int = 4, numCents: Int = 16): Unit = {
    val spark = embs.sparkSession
    import spark.implicits._
    val cents = centroidsOf(embs, numCents)
    require(cents.nonEmpty, "buildPqIndex: no non-zero-norm vectors to seed the codebook")
    val dim = cents.head._2.length
    require(dim % numSubs == 0, s"buildPqIndex: dim $dim not divisible into $numSubs subspaces")
    val subLen = dim / numSubs
    val codeCols = (0 until numSubs).map(j =>
      pqCodeExpr(pqSubCodebook(cents, j, subLen), j, subLen).cast("int"))
    nonZeroVecs(embs)
      // fail fast on a dim mismatch — pqTopK's guard, applied at build
      // time: silently dropping the row would let the indexed path return
      // a top-k the inline path refuses to compute (asymmetric contracts)
      .withColumn("v", when(size(col("v")) =!= lit(dim),
          raise_error(concat(lit(s"buildPqIndex: codebook dim $dim != embedding dim "),
            size(col("v")).cast("string"), lit(" at vec_id "),
            col("vec_id").cast("string"))))
        .otherwise(col("v")))
      .select(col("vec_id"), array(codeCols: _*).as("codes"))
      .write.mode("overwrite").parquet(s"$indexDir/codes")
    cents.zipWithIndex
      .map { case ((_, cv), pos) => (pos.toLong, cv) }.toSeq
      .toDF("pos", "cv")
      .write.mode("overwrite").parquet(s"$indexDir/codebook")
  }

  /** Grow a [[buildPqIndex]] layout with NEW vectors — the PQ leg of the
    * index-append family ([[appendToIvfIndex]], `appendToCrossNearDupIndex`):
    * encoding uses the INDEX's own stored codebook (never recomputed), so
    * ADC probes see one consistent quantizer geometry across increments and
    * growth is a file append into the codes table — at 100 TB an arriving
    * batch appends ~1 byte/subspace/vector instead of triggering a corpus
    * re-encode. An index grown this way is IDENTICAL to one rebuilt from
    * scratch with the same codebook (spec-asserted at the CODES level —
    * per-vector code arrays compared, not just one probe), and a replayed
    * append converges: [[pqTopKIndexed]] ranks per distinct vec_id, so a
    * duplicated row cannot seat one id in two top-k slots.
    * Operating discipline: quantization error grows only as the data
    * distribution drifts from the build-time codebook — monitor recall on a
    * held-out probe set (the `sim_recall` gate pattern) and rebuild on
    * drift, the standard PQ trade. */
  def appendToPqIndex(embs: DataFrame, indexDir: String): Unit = {
    val spark = embs.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$indexDir/codebook")
      .select(col("pos"), col("cv"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    require(cents.nonEmpty, s"appendToPqIndex: empty codebook at $indexDir")
    val dim = cents.head._2.length
    // numSubs is recorded by the stored codes (array length); one
    // footer-only row recovers it without scanning the table.
    val numSubs = spark.read.parquet(s"$indexDir/codes")
      .select(size(col("codes"))).head().getInt(0)
    val subLen = dim / numSubs
    val codeCols = (0 until numSubs).map(j =>
      pqCodeExpr(pqSubCodebook(cents, j, subLen), j, subLen).cast("int"))
    nonZeroVecs(embs)
      .withColumn("v", when(size(col("v")) =!= lit(dim),
          raise_error(concat(lit(s"appendToPqIndex: codebook dim $dim != embedding dim "),
            size(col("v")).cast("string"), lit(" at vec_id "),
            col("vec_id").cast("string"))))
        .otherwise(col("v")))
      .select(col("vec_id"), array(codeCols: _*).as("codes"))
      .write.mode("append").parquet(s"$indexDir/codes")
  }

  /** ANN top-k over a [[buildPqIndex]] layout: rank candidates from the
    * CODES table (ADC over the stored byte codes — the corpus floats never
    * load), then join the top `rescoreK` ids back to `embs` for the exact
    * rescore. Result-identical to inline [[pqTopK]] with the same
    * parameters (spec-asserted): codes are the same argmin the inline
    * expression computes, and ADC scores are the same fixed-order LUT sum. */
  def pqTopKIndexed(embs: DataFrame, indexDir: String, query: Seq[Double],
      k: Int, rescoreK: Int = 40): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$indexDir/codebook")
      .select(col("pos"), col("cv"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    require(cents.nonEmpty, s"pqTopKIndexed: empty codebook at $indexDir")
    val dim = cents.head._2.length
    require(dim == query.length,
      s"pqTopKIndexed: query dim ${query.length} != index dim $dim")
    val qArr = query.toArray
    // numSubs is recorded by the codes themselves (array length); recover
    // it from ONE row of the RAW scan — before the dedup below, whose
    // aggregate would otherwise run just to answer a schema question.
    val rawCodes = spark.read.parquet(s"$indexDir/codes")
    val numSubs = rawCodes.select(size(col("codes"))).head().getInt(0)
    // replayed appends must not seat one vec_id in two candidate slots
    // (ivfPqTopK's probe-side discipline)
    val codes = rawCodes.dropDuplicates("vec_id")
    val subLen = dim / numSubs
    val adcTerms = (0 until numSubs).map { j =>
      val lut = pqLut(pqSubCodebook(cents, j, subLen), qArr, j, subLen)
      element_at(lit(lut), element_at(col("codes"), j + 1) + 1)
    }
    // The candidate id set is rescoreK longs — collected (bounded,
    // metadata-scale, same posture as the centroid literals) so the
    // rescore reaches the corpus scan as a pushed-down IN filter that
    // prunes row groups by vec_id statistics, instead of a join that
    // would read every corpus byte back in.
    val candIds = codes
      .select(col("vec_id"), adcTerms.reduceLeft(_ + _).as("approx"))
      .orderBy(col("approx").desc, col("vec_id"))
      .limit(rescoreK)
      .select(col("vec_id"))
      .as[Long].collect().toSeq
    nonZeroVecs(embs)
      .where(col("vec_id").isin(candIds: _*))
      .select(col("vec_id"), round(cosine(col("v"), lit(qArr)), 6).as("sim"))
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
  def pairwiseCosine(embs: DataFrame, threshold: Double,
      maxRows: Long = 1000000L): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    // Fail fast instead of OOMing the driver: this is the explicit small-N
    // exact kernel; the distributed path is `bucketedNearDup`. limit(cap+1)
    // both enforces the cap and IS the full collect when under it — no
    // separate count() job, one scan total.
    val rows0 = embs.select(col("vec_id"), col("embedding"))
      .limit(if (maxRows >= Int.MaxValue) Int.MaxValue else maxRows.toInt + 1)
      .as[(Long, Array[Float])].collect()
    require(rows0.length <= maxRows,
      s"pairwiseCosine collects the vector table to the driver (> cap $maxRows rows); " +
        "use Similarity.bucketedNearDup for the distributed blocked path")
    val rows = rows0.sortBy(_._1)
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
    * (firstByte(md5("p:j")) mod 7) - 3` — small-integer components so every
    * product is exact in double and the sign is engine-independent (the
    * DuckDB twin computes the identical md5 arithmetic).
    *
    * Why md5-derived and not an affine formula: a first cut used
    * `((p·31 + j·17) mod 7) - 3`, and p·31 mod 7 has period 7 in p — only
    * SEVEN distinct hyperplanes exist, so the bucket space caps at ~2⁷
    * regardless of numPlanes. Invisible at 2k–20k vectors; at 200k vectors
    * the whole corpus piled into 119 buckets (max 8.3k) and the within-
    * bucket candidate join went quadratic at 3.7×10⁸ pairs
    * (`BucketProbe`, 100× corpus). Same failure family — and same fix —
    * as the minhash seed constants (`Dedup.minhashAB`).
    *
    * Scale path: bucketing is one narrow projection (no shuffle); near-dup
    * or ANN search then only compares vectors within a bucket (or within
    * Hamming-1 neighbor buckets for higher recall).
    */
  /** Hyperplane literals cover any row dim up to this bound — `vec_dot`
    * folds over min(row dim, plane length), so a generous fixed width makes
    * the bucket a pure per-row function (no data-dependent sizing job, no
    * first-row nondeterminism on mixed-dim tables). */
  val MaxLshDim = 4096

  /** Up to 64 decorrelated hyperplanes × MaxLshDim dims, md5-derived once
    * per JVM (262k digests ≈ sub-second, amortized across every
    * lshBuckets plan build). */
  private lazy val lshPlaneTable: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(64) { p =>
      Array.tabulate(MaxLshDim) { j =>
        val b = md.digest(s"$p:$j".getBytes("UTF-8"))
        ((b(0) & 0xff) % 7 - 3).toDouble
      }
    }
  }

  def lshBuckets(embs: DataFrame, numPlanes: Int = 8): DataFrame = {
    require(numPlanes <= 64,
      s"numPlanes $numPlanes > 64: lshPlaneTable precomputes 64 planes")
    // The hyperplane family is a pure function of (p, j): materialize each
    // plane once as a literal double array and take the codegen'd `vec_dot`
    // instead of an interpreted per-row zip_with/aggregate lambda (the
    // ~100× HOF penalty — this projection is the near-dup hot path).
    // Planes are sized MaxLshDim: every row folds over its OWN length,
    // exactly like the oracle's per-row sum (rows beyond MaxLshDim would
    // truncate — assert-free by contract, documented on MaxLshDim).
    val bits = (0 until numPlanes).map { p =>
      when(dot(asDouble(col("embedding")), lit(lshPlaneTable(p))) > 0,
        lit("1")).otherwise(lit("0"))
    }
    embs.select(col("vec_id"), concat(bits: _*).as("bucket"))
  }

  /** Distributed near-dup: hyperplane-LSH blocking + exact per-pair scoring.
    *
    * Candidate generation: each vector probes its home bucket AND every
    * Hamming-1 neighbor bucket; a pair (a < b) is a candidate iff one of
    * a's probes hits b's home bucket — covering all pairs whose bucket ids
    * differ in ≤ 1 bit. Exact duplicates always share a bucket (the bucket
    * is sign-invariant under positive scaling), so recall on true copies is
    * 1; near-misses get the Hamming-1 net.
    *
    * Scale: candidates are a shuffle equi-join on the bucket string —
    * O(n × (numPlanes+1)) probe rows, never all-pairs; scoring is the
    * codegen'd `vec_dot` over only the surviving pairs; no driver
    * materialization anywhere (contrast `pairwiseCosine`).
    *
    * Numeric contract (oracle parity): dots accumulate left-to-right in
    * double with the smaller vec_id as the left operand; norms are
    * `sqrt(self-dot)`; zero-norm vectors are excluded (their cosine is
    * NaN, which engines compare against the threshold differently).
    */
  def bucketedNearDup(embs: DataFrame, threshold: Double,
      numPlanes: Int = 16): DataFrame = {
    // 16 planes = 65k buckets: bucket occupancy — and the per-bucket
    // self-join — stays ~flat as the corpus grows (8 planes = 256 buckets
    // went quadratic by 20k vectors: 27.5 s vs 1.5 s at 2k in the 10×-docs
    // probe). Exact duplicates share a bucket at ANY plane count.
    // `numPlanes` is the scale knob: residual random-collision candidates
    // grow as n²/2^numPlanes, so hold planes ≈ log2(n) + 4 as the corpus
    // grows (every +1 halves collision pairs; cost is one more dot per row
    // and one more Hamming-1 probe). Exact-copy recall is plane-count
    // invariant (sign buckets are scale-invariant); the Hamming-1 net for
    // near-misses is the documented LSH trade-off either way.
    val e = nonZeroVecs(embs)
    // Persist: the bucket projection (numPlanes dots per row) feeds BOTH
    // self-join sides with different keys, so ReuseExchange can't dedupe
    // it — same rationale as the simhashPairs persist; released after the
    // scored pairs materialize (see the try/finally below — cached blocks
    // are never left registered past the operator). (`e` is left to
    // recompute: one dot per row straight off the columnar scan is cheaper
    // than caching every vector.)
    val bucketed = lshBuckets(embs, numPlanes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = hammingProbes(bucketed, numPlanes)
    val cand = probes.as("pa")
      .join(bucketed.as("hb"),
        col("pa.pb") === col("hb.bucket") && col("pa.vec_id") < col("hb.vec_id"))
      .select(col("pa.vec_id").as("vec_a"), col("hb.vec_id").as("vec_b"))
      .distinct()
    val scored = cand
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("selfdot").as("da")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("selfdot").as("db")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        (dot(col("va"), col("vb")) / (sqrt(col("da")) * sqrt(col("db")))).as("sim"))
      .where(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 6).as("sim"))
    // Eagerly materialize the (output-scale) scored pairs into GC-reclaimable
    // checkpoint blocks, then drop the bucket cache — leaving it registered
    // would accumulate storage blocks for the life of the session (one leak
    // per call in an incremental-dedup driver loop). `graft.eagerRelease=
    // false` opts out for plan inspection (see Dedup.materializeThenRelease).
    Dedup.materializeThenRelease(scored, bucketed)
  }

  /** The shared scoring projection: doubled vectors with their self-dot,
    * zero-norm rows EXCLUDED (their cosine is NaN, which engines compare
    * against the threshold differently) — one definition so the self and
    * cross operators' numeric contracts cannot diverge. */
  private def nonZeroVecs(embs: DataFrame): DataFrame =
    embs
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("selfdot", dot(col("v"), col("v")))
      .where(col("selfdot") > 0)

  /** Per-vector nearest-centroid CELL labels — the embedding-space
    * histogram the drift monitor bins (`sim_drift`): every non-zero
    * vector of `embs` labeled with its nearest centroid from `cents`
    * (pass the STANDING corpus's [[centroidsOf]] — occupancy histograms
    * are only comparable against one shared centroid set). The codegen'd
    * argmax assignment ([[cellAssignExpr]]) — no join, no window, no
    * shuffle; one narrow pass. Returns `(vec_id, cell)`. */
  def cellOccupancy(embs: DataFrame,
      cents: Array[(Long, Array[Double])]): DataFrame = {
    require(cents.nonEmpty, "cellOccupancy needs at least one centroid")
    nonZeroVecs(embs)
      .withColumn("cell", cellAssignExpr(cents))
      .select(col("vec_id"), col("cell"))
  }

  /** Home bucket + every Hamming-1 flip per row — the probe set of the
    * near-dup candidate generators (self and cross). */
  private def hammingProbes(bucketed: DataFrame, numPlanes: Int): DataFrame = {
    val flips = (0 until numPlanes).map { p =>
      concat(
        substring(col("bucket"), 1, p),
        when(substring(col("bucket"), p + 1, 1) === "1", lit("0")).otherwise(lit("1")),
        substring(col("bucket"), p + 2, numPlanes - p - 1))
    }
    bucketed.select(col("vec_id"),
      explode(array(col("bucket") +: flips: _*)).as("pb"))
  }

  /** Cross-corpus embedding near-dup — the vector analogue of
    * `Dedup.crossNearDup`: every (batch, corpus) vector pair with cosine ≥
    * `threshold`, sides never self-pair (id spaces independent). The BATCH
    * side probes home + Hamming-1 buckets against the corpus's home
    * buckets only — ONE cross equi-join on the bucket string, batch side
    * broadcast-able when small (AQE sizes it); within-side pairs are never
    * generated, vs re-running `bucketedNearDup` over corpus ∪ batch, which
    * would re-pair the standing corpus against itself every increment.
    * Exact scoring on survivors only; same numeric contract as
    * `bucketedNearDup` (left-to-right double accumulation, zero-norm rows
    * excluded on both sides). Exact-copy recall is 1 (identical vectors
    * share a bucket at any plane count); near-misses get the Hamming-1
    * net — the documented LSH trade-off. */
  def crossNearDup(corpus: DataFrame, batch: DataFrame, threshold: Double,
      numPlanes: Int = 16): DataFrame = {
    // No persists here: unlike the self-join (where one bucket table feeds
    // both join sides with different keys), each side's bucket projection
    // has exactly ONE consumer — caching would be pure churn in a
    // per-batch ingest loop.
    val cand = hammingProbes(lshBuckets(batch, numPlanes), numPlanes).as("pb")
      .join(lshBuckets(corpus, numPlanes).as("hc"), col("pb.pb") === col("hc.bucket"))
      .select(col("pb.vec_id").as("batch_vec"), col("hc.vec_id").as("corpus_vec"))
      .distinct()
    val scored = cand
      .join(nonZeroVecs(batch).select(col("vec_id").as("batch_vec"),
        col("v").as("vb"), col("selfdot").as("db")), "batch_vec")
      .join(nonZeroVecs(corpus).select(col("vec_id").as("corpus_vec"),
        col("v").as("vc"), col("selfdot").as("dc")), "corpus_vec")
      .select(col("batch_vec"), col("corpus_vec"),
        (dot(col("vc"), col("vb")) / (sqrt(col("dc")) * sqrt(col("db")))).as("sim"))
      .where(col("sim") >= threshold)
      .select(col("batch_vec"), col("corpus_vec"), round(col("sim"), 6).as("sim"))
    Dedup.materializeThenRelease(scored)
  }

  /** SemDeDup-style semantic deduplication (the published embedding-space
    * curation pattern: cluster, then drop near-identical vectors WITHIN
    * clusters — Abbas et al. 2023, arXiv:2303.09540): every non-zero-norm
    * vector is assigned to its nearest of `nCells` deterministic seed
    * centroids (the IVF cell argmax — no shuffle), and within each cell a
    * vector is DROPPED when a smaller-id cell-mate sits at cosine ≥
    * `threshold` (greedy keep-first: deterministic, order-free, and equal
    * to keep-one-per-duplicate-group on exact copies). Returns
    * `(vec_id, cell, kept 0/1)` for every assignable vector.
    *
    * Scale contract vs [[bucketedNearDup]]: LSH blocking finds PAIRS at
    * any similarity; SemDeDup's point is the cluster structure — the
    * quadratic kernel is confined within cells, total pair work
    * ≈ Σ|cell|² ≈ n²/nCells, so nCells grows with the corpus (the paper
    * runs ~10⁵ cells at 10⁹ docs) and each cell's self-join stays bounded.
    * Plan: one cell-keyed shuffle of (id, vector) for the self-join, the
    * assignment itself is a codegen'd argmax over broadcast-literal
    * centroids. The assigned projection feeds three consumers (two join
    * sides + the labeling), so it persists for the job and releases after
    * materialization. */
  def semanticDedup(embs: DataFrame, threshold: Double,
      nCells: Int = 16): DataFrame = {
    // Dedup-first prelude (the text chain's mega-group cap, in vector
    // space): EXACT-duplicate vectors always drop for any τ ≤ 1 (cosine
    // exactly 1.0 against a smaller-id copy), so group them by content
    // hash and run the quadratic kernel over distinct REPRESENTATIVES
    // only. Semantics-preserving, provably: a vector r has a smaller-id
    // neighbor at ≥ τ iff some duplicate-group g with cos(g, r) ≥ τ has
    // min_id(g) < r — and min_id(g) is its representative's id. Without
    // this, a 100k-times-repeated vector (the SkewProbe scenario) would
    // put 5×10⁹ pairs through its cell's self-join; with it, the copies
    // cost one map-side-combined groupBy and the self-join sees each
    // distinct vector once. The content hash is md5 of the canonical
    // string form — 128-bit, the same collision posture as the text
    // chain's md5 keys (xxhash64's 64 bits would make merged-group wrong
    // drops plausible at 10⁹ vectors).
    val assigned = nonZeroVecs(embs)
      .withColumn("cell", cellAssignExpr(centroidsOf(embs, nCells)))
      .withColumn("vh", md5(col("v").cast("string")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reps = assigned
      .groupBy(col("vh")).agg(min(col("vec_id")).as("rep_id"))
    val repRows = assigned
      .join(reps, Seq("vh"))
      .where(col("vec_id") === col("rep_id"))
      .select(col("vec_id"), col("v"), col("selfdot"), col("cell"))
    val droppedReps = repRows.as("a")
      .join(repRows.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id") &&
          dot(col("a.v"), col("b.v")) /
            (sqrt(col("a.selfdot")) * sqrt(col("b.selfdot"))) >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    val labeled = assigned
      // non-representative copies: kept = 0 by construction
      .join(reps, Seq("vh"))
      .join(droppedReps.withColumn("_drop", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(col("vec_id") =!= col("rep_id"), lit(0))
          .when(col("_drop").isNotNull, lit(0))
          .otherwise(lit(1)).as("kept"))
    Dedup.materializeThenRelease(labeled, assigned)
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
  private def sdot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Deterministic centroid seed: the first `nCells` NON-ZERO-NORM vectors
    * by vec_id — metadata-scale, collected once to become plan literals.
    * A zero-norm seed would make every row's csim against it NaN and
    * capture the whole corpus in the argmax (knnJoin's zero-norm contract,
    * applied to the centroid side). */
  private[graft] def centroidsOf(embs: DataFrame, nCells: Int): Array[(Long, Array[Double])] = {
    val spark = embs.sparkSession
    import spark.implicits._
    embs
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .where(dot(col("v"), col("v")) > 0)
      .orderBy(col("vec_id")).limit(nCells)
      .as[(Long, Array[Double])].collect()
  }

  /** Probe-cell selection: nCells scalar cosines, driver-side, the
    * identical left-to-right IEEE sequence as the distributed kernel; qsim
    * DESC with NaN greatest (java.lang.Double.compare — the same total
    * order both SQL engines use), ties by cell ASC. */
  private def probeCellsFor(cents: Array[(Long, Array[Double])],
      qArr: Array[Double], nProbe: Int): Seq[Long] = {
    val qNorm = math.sqrt(sdot(qArr, qArr))
    val probeOrd: Ordering[(Long, Double)] = new Ordering[(Long, Double)] {
      def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    }
    cents
      .map { case (cell, cv) => (cell, sdot(cv, qArr) / (math.sqrt(sdot(cv, cv)) * qNorm)) }
      .sorted(probeOrd)
      .take(nProbe).map(_._1).toSeq
  }

  /** Per-row nearest-centroid assignment over a `v ARRAY<DOUBLE>` column as
    * ONE codegen'd expression: array_max over (csim, -cell) structs = max
    * cosine, ties to the smallest cell — same order as `row_number() OVER
    * (ORDER BY csim DESC, cell)` picking rank 1, with no join, no window,
    * no shuffle. */
  private def cellAssignExpr(cents: Array[(Long, Array[Double])]): Column = {
    val selfNorm = sqrt(dot(col("v"), col("v")))
    val centStructs = cents.map { case (cell, cv) =>
      struct(
        (dot(col("v"), lit(cv)) / (selfNorm * lit(math.sqrt(sdot(cv, cv))))).as("csim"),
        lit(-cell).as("negcell"))
    }
    -array_max(array(centStructs.toIndexedSeq: _*)).getField("negcell")
  }

  /** Shared IVF probe tail: assign (no-shuffle argmax), prune to probe
    * cells, exact-score, top-k — one definition for every centroid source
    * (seed, trained) so the scoring/tie-break contract can't fork. */
  private[graft] def searchWithCents(embs: DataFrame, cents: Array[(Long, Array[Double])],
      qArr: Array[Double], k: Int, nProbe: Int): DataFrame = {
    if (cents.isEmpty)
      return embs.sparkSession.emptyDataFrame
        .select(lit(0L).as("vec_id"), lit(0.0d).as("sim")).limit(0)
    val probeCells = probeCellsFor(cents, qArr, nProbe)
    embs
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      // zero-norm rows have NaN csim against EVERY centroid (garbage cell)
      // and NaN final sim, which descending sort ranks above real scores —
      // exclude them, matching the knnJoin/bucketedNearDup contract.
      .where(dot(col("v"), col("v")) > 0)
      .withColumn("cell", cellAssignExpr(cents))
      .where(col("cell").isin(probeCells: _*))
      .select(col("vec_id"), round(cosine(col("v"), lit(qArr)), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  def ivfTopK(embs: DataFrame, query: Seq[Double], k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame =
    // Centroids are metadata-scale (nCells rows): collect once and embed
    // them as plan literals — the expression-level equivalent of a
    // broadcast, but with ZERO joins/shuffles on the big side. (The
    // previous shape — cross-join × nCells + row_number window — shuffled
    // a 16×-inflated table to pick a per-row max.)
    searchWithCents(embs, centroidsOf(embs, nCells), query.toArray, k, nProbe)

  /** One Lloyd refinement step: assign every vector to its nearest current
    * centroid (the codegen'd argmax, no shuffle), then element-wise mean
    * per cell via posexplode → (cell, j) grouped avg — a map-side-combined
    * aggregate whose result is nCells×dim driver metadata. Cells that lost
    * all members keep their previous centroid. Iterating this turns the
    * deterministic seed centroids into trained IVF centroids; means are
    * float-sum order-dependent, so refined search is a quality tool, not
    * an oracle-checked path. */
  def refineCentroids(embs: DataFrame,
      cents: Array[(Long, Array[Double])]): Array[(Long, Array[Double])] = {
    if (cents.isEmpty) return cents
    val spark = embs.sparkSession
    import spark.implicits._
    val means = embs
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      // a zero-norm row's NaN csim would both garbage its assignment and
      // poison the cell mean — exclude, as in searchWithCents
      .where(dot(col("v"), col("v")) > 0)
      .withColumn("cell", cellAssignExpr(cents))
      .select(col("cell"), posexplode(col("v")).as(Seq("j", "x")))
      .groupBy(col("cell"), col("j"))
      .agg(avg(col("x")).as("m"))
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1)
      .map { case (cell, xs) =>
        cell -> xs.sortBy(_._2).map(_._3)
      }
    cents.map { case (cell, cv) =>
      cell -> means.get(cell).map(_.toArray).getOrElse(cv)
    }
  }

  /** IVF top-k with `iters` Lloyd refinements of the seed centroids —
    * better-balanced cells → better recall at the same nProbe. */
  def ivfTopKTrained(embs: DataFrame, query: Seq[Double], k: Int,
      nCells: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    var cents = centroidsOf(embs, nCells)
    if (cents.nonEmpty)
      (0 until iters).foreach(_ => cents = refineCentroids(embs, cents))
    searchWithCents(embs, cents, query.toArray, k, nProbe)
  }

  /** Batch k-NN retrieval (k-NN join): for EVERY row of `queries(query_id,
    * embedding)`, the exact top-k rows of `corpus(vec_id, embedding)` by
    * cosine — the production retrieval workload (nearest-neighbor mining,
    * cross-dataset contamination checks, retrieval-pair generation).
    *
    * Shape: ONE corpus scan × a broadcast of the query batch (queries are
    * the small side by contract), cosine scored by the codegen'd `vec_dot`,
    * then per-query top-k through the `TopK` Aggregator — partial top-k
    * heaps are map-side combined, so the shuffle is O(queries × k), never
    * O(corpus). At 100 TB the corpus is scanned once regardless of the
    * query-batch size; for query batches too big to broadcast, block BOTH
    * sides (`lshBuckets` / IVF cells) and run this kernel per block.
    *
    * Zero-norm vectors (no direction ⇒ cosine NaN) are excluded on both
    * sides; ordering is on the ROUNDED sim, ties by vec_id — stable across
    * engines (`bruteForceTopK` contract, per query).
    */
  def knnJoin(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = queries
      .select(col("query_id"), asDouble(col("embedding")).as("qv"))
      .withColumn("qd", dot(col("qv"), col("qv")))
      .where(col("qd") > 0)
    val c = corpus
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("vd", dot(col("v"), col("v")))
      .where(col("vd") > 0)
    c.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("v"), col("qv")) / (sqrt(col("vd")) * sqrt(col("qd"))), 6).as("sim"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new graft.functions.TopK(k).toColumn.name("top"))
      .toDF("query_id", "top")
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e._1").as("vec_id"), col("e._2").as("sim"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  /** The 100 TB storage layout for IVF: materialize the table PARTITIONED
    * BY cell id (plus the centroid metadata alongside), so a probe prunes
    * FILE READS — `nProbe/nCells` of the bytes ever touch an executor,
    * enforced by partition pruning at the scan, not by a post-scan filter.
    */
  def buildIvfIndex(embs: DataFrame, indexDir: String, nCells: Int = 16): Unit = {
    val spark = embs.sparkSession
    import spark.implicits._
    val cents = centroidsOf(embs, nCells)
    embs
      .select(col("vec_id"), col("embedding"), asDouble(col("embedding")).as("v"))
      // zero-norm rows would land in a NaN-garbage cell; keep the index to
      // rows that can ever appear in a cosine top-k (searchWithCents
      // contract, applied at write time so probes never scan them).
      .where(dot(col("v"), col("v")) > 0)
      .withColumn("cell", cellAssignExpr(cents))
      .select(col("vec_id"), col("embedding"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$indexDir/data")
    cents.toSeq.toDF("cell", "cv")
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
  }

  /** Grow a `buildIvfIndex` layout with NEW vectors — the ANN analogue of
    * the dedup index's append path: assignment uses the INDEX's own stored
    * centroids (never recomputed), so probes see one consistent cell
    * geometry across increments and growth is a file append inside
    * existing cell partitions. An index grown this way is IDENTICAL to one
    * rebuilt from scratch with the same centroids (spec-asserted at the
    * LAYOUT level — per-vector cell assignments compared, not just one
    * probe), and a retried append converges: probes collapse duplicate
    * rows, so a replayed increment cannot seat one vec_id in two top-k
    * slots (also spec-asserted).
    * Operating discipline: cell balance degrades only as the data
    * distribution drifts from the build-time centroids — monitor recall on
    * a held-out probe set (the `sim_recall` gate pattern) and rebuild on
    * drift, the standard IVF trade. */
  def appendToIvfIndex(embs: DataFrame, indexDir: String): Unit = {
    val spark = embs.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$indexDir/centroids")
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    embs
      .select(col("vec_id"), col("embedding"), asDouble(col("embedding")).as("v"))
      .where(dot(col("v"), col("v")) > 0)
      .withColumn("cell", cellAssignExpr(cents))
      .select(col("vec_id"), col("embedding"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$indexDir/data")
  }

  /** Probe a `buildIvfIndex` layout: the `cell IN (...)` predicate lands in
    * the scan's PartitionFilters (directory-level pruning — unprobed cells'
    * files are never opened), then exact scoring + TakeOrderedAndProject. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      query: Seq[Double], k: Int, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$indexDir/centroids")
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val qArr = query.toArray
    val probeCells = probeCellsFor(cents, qArr, nProbe)
    spark.read.parquet(s"$indexDir/data")
      .where(col("cell").isin(probeCells: _*))
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      // indexes written by buildIvfIndex exclude zero-norm rows already;
      // re-assert here so hand-built layouts can't leak NaN sims into top-k
      .where(dot(col("v"), col("v")) > 0)
      // collapse duplicate rows from a replayed append (the dedup index's
      // probe-side discipline) — a duplicated vec_id must not occupy two
      // top-k slots. Aggregate cost is bounded by the PROBED fraction.
      .dropDuplicates("vec_id")
      .select(col("vec_id"), round(cosine(col("v"), lit(qArr)), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-PQ — the industry-standard billion-vector layout (the
    * IndexIVFPQ composition of Jégou et al. 2011): a COARSE quantizer
    * (the IVF cells) partitions the CODES table, so a probe prunes file
    * reads to ~nProbe/nCells of the index, and within the probed cells
    * candidates rank by the PQ ADC score over byte codes — the candidate
    * scan is simultaneously partition-pruned AND ~byte-compressed (the
    * two savings multiply: at nProbe/nCells = 1/4 and codes 40× under
    * floats, the ranking stage reads ~1% of the corpus bytes). Only the
    * `rescoreK` ADC survivors touch full vectors, by id-pruned IN filter
    * on the ORIGINAL embeddings table.
    *
    * Layout under `indexDir`: `codes/` (vec_id, codes — PARTITIONED BY
    * cell), `centroids/` (coarse), `codebook/` (fine, per-subspace
    * flattened). Both quantizers use the deterministic seed recipe, and
    * probes always use the BUILD-time geometry (the buildIvfIndex
    * discipline). Exactness contract (spec-asserted): with `rescoreK` ≥
    * the probed-cell population, ADC ranking is a permutation of the
    * probed candidates, so the result EQUALS `ivfTopKIndexed` at the same
    * nProbe; smaller rescoreK trades recall for rescore work exactly as
    * in [[pqTopKIndexed]]. */
  def buildIvfPqIndex(embs: DataFrame, indexDir: String, nCells: Int = 16,
      numSubs: Int = 4, numCents: Int = 16): Unit = {
    val spark = embs.sparkSession
    import spark.implicits._
    val coarse = centroidsOf(embs, nCells)
    val fine = centroidsOf(embs, numCents)
    require(fine.nonEmpty, "buildIvfPqIndex: no non-zero-norm vectors to seed the codebook")
    val dim = fine.head._2.length
    require(dim % numSubs == 0, s"buildIvfPqIndex: dim $dim not divisible into $numSubs subspaces")
    val subLen = dim / numSubs
    val codeCols = (0 until numSubs).map(j =>
      pqCodeExpr(pqSubCodebook(fine, j, subLen), j, subLen).cast("int"))
    nonZeroVecs(embs)
      .withColumn("v", when(size(col("v")) =!= lit(dim),
          raise_error(concat(lit(s"buildIvfPqIndex: codebook dim $dim != embedding dim "),
            size(col("v")).cast("string"), lit(" at vec_id "),
            col("vec_id").cast("string"))))
        .otherwise(col("v")))
      .withColumn("cell", cellAssignExpr(coarse))
      .select(col("vec_id"), array(codeCols: _*).as("codes"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$indexDir/codes")
    coarse.toSeq.toDF("cell", "cv")
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
    fine.zipWithIndex
      .map { case ((_, cv), pos) => (pos.toLong, cv) }.toSeq
      .toDF("pos", "cv")
      .write.mode("overwrite").parquet(s"$indexDir/codebook")
  }

  /** Grow a [[buildIvfPqIndex]] layout with NEW vectors — the last leg of
    * the index-append family, and the one that matters most at 100 TB
    * (IVF-PQ is the billion-vector layout): cell assignment uses the
    * index's stored COARSE centroids and encoding its stored FINE
    * codebook, neither recomputed, so an arriving batch appends byte
    * codes INTO existing cell partitions (`cell=N/` directories) — the
    * partition-pruning and compression contracts hold unchanged across
    * increments, and a grown index is IDENTICAL to one rebuilt from
    * scratch with the same quantizers (spec-asserted at the codes level).
    * Replayed appends converge via [[ivfPqTopK]]'s probe-side duplicate
    * collapse. Same drift discipline as [[appendToPqIndex]]. */
  def appendToIvfPqIndex(embs: DataFrame, indexDir: String): Unit = {
    val spark = embs.sparkSession
    import spark.implicits._
    val coarse = spark.read.parquet(s"$indexDir/centroids")
      .select(col("cell"), col("cv"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val fine = spark.read.parquet(s"$indexDir/codebook")
      .select(col("pos"), col("cv"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    require(coarse.nonEmpty && fine.nonEmpty,
      s"appendToIvfPqIndex: empty centroids/codebook at $indexDir")
    val dim = fine.head._2.length
    val numSubs = spark.read.parquet(s"$indexDir/codes")
      .select(size(col("codes"))).head().getInt(0)
    val subLen = dim / numSubs
    val codeCols = (0 until numSubs).map(j =>
      pqCodeExpr(pqSubCodebook(fine, j, subLen), j, subLen).cast("int"))
    nonZeroVecs(embs)
      .withColumn("v", when(size(col("v")) =!= lit(dim),
          raise_error(concat(lit(s"appendToIvfPqIndex: codebook dim $dim != embedding dim "),
            size(col("v")).cast("string"), lit(" at vec_id "),
            col("vec_id").cast("string"))))
        .otherwise(col("v")))
      .withColumn("cell", cellAssignExpr(coarse))
      .select(col("vec_id"), array(codeCols: _*).as("codes"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$indexDir/codes")
  }

  /** Remove a vec-id set from a [[buildIvfIndex]] layout — the takedown
    * path of the IVF append ladder ([[Purge]] module overview): one
    * narrow id-column scan of the index finds the TOUCHED cell
    * partitions, each is rewritten minus the purged ids under
    * [[Purge.rewritePartitions]]'s two-phase commit, and untouched cells
    * are never read or listed. Probes are unchanged — the layout, cell
    * geometry and partition pruning are exactly those of an index built
    * without the docs (PurgeSpec asserts layout-level identity).
    * Ids absent from the index are a no-op (the build already excludes
    * zero-norm vectors, so absence is not an error); a purge that
    * empties a cell DROPs its partition. Owner-only, like every
    * two-phase rewrite here. */
  def purgeFromIvfIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, vecIds: DataFrame): Unit =
    purgePartitioned(spark, s"$indexDir/data", "cell", vecIds)

  /** Remove a vec-id set from a [[buildIvfPqIndex]] layout: identical
    * discipline to [[purgeFromIvfIndex]], over the cell-partitioned CODES
    * table (bytes per vector, so even a purge touching every cell
    * rewrites ~1/40th of the float bytes a raw-vector rewrite would). The
    * codebook/centroids are untouched — quantizer geometry is exactly the
    * build's, as appends require. */
  def purgeFromIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, vecIds: DataFrame): Unit =
    purgePartitioned(spark, s"$indexDir/codes", "cell", vecIds)

  /** Remove a vec-id set from a [[buildPqIndex]] layout. The flat-PQ
    * codes table is UNPARTITIONED (one dir), so the rewrite is the whole
    * codes table minus the ids — still byte-codes, never the float
    * vectors, and still under the two-phase commit (the `codes` child of
    * the index root swaps atomically). For purge-heavy workloads prefer
    * the IVF-PQ layout, whose cell partitioning confines each purge to
    * the touched cells. */
  def purgeFromPqIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, vecIds: DataFrame): Unit = {
    val ids = broadcast(vecIds.select(col("vec_id")).distinct())
    val remaining = spark.read.parquet(s"$indexDir/codes")
      .join(ids, Seq("vec_id"), "left_anti")
      .localCheckpoint(true) // the swap deletes the dir this plan reads
    Purge.rewritePartitions(spark, indexDir, Seq("codes" -> Some(remaining)))
  }

  /** Shared cell-partitioned purge body: find touched partitions from the
    * index's own id column (one narrow scan — never the corpus), then
    * anti-join-rewrite exactly those under the two-phase commit. */
  private def purgePartitioned(spark: org.apache.spark.sql.SparkSession,
      root: String, partCol: String, vecIds: DataFrame): Unit =
    Purge.purgePartitionedIndex(spark, root, partCol, "vec_id", vecIds)

  /** ANN top-k over a [[buildIvfPqIndex]] layout: partition-pruned ADC
    * ranking over byte codes, exact rescore of the survivors from the
    * original `embs` table. */
  def ivfPqTopK(embs: DataFrame, indexDir: String, query: Seq[Double],
      k: Int, nProbe: Int = 4, rescoreK: Int = 40): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val coarse = spark.read.parquet(s"$indexDir/centroids")
      .select(col("cell"), col("cv"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val fine = spark.read.parquet(s"$indexDir/codebook")
      .select(col("pos"), col("cv"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    require(coarse.nonEmpty && fine.nonEmpty,
      s"ivfPqTopK: empty centroids/codebook at $indexDir")
    val dim = fine.head._2.length
    require(dim == query.length,
      s"ivfPqTopK: query dim ${query.length} != index dim $dim")
    val qArr = query.toArray
    val probeCells = probeCellsFor(coarse, qArr, nProbe)
    val codes = spark.read.parquet(s"$indexDir/codes")
      .where(col("cell").isin(probeCells: _*))
      // replayed appends must not seat one vec_id in two slots
      // (ivfTopKIndexed's probe-side discipline)
      .dropDuplicates("vec_id")
    val numSubs = codes.select(size(col("codes"))).head().getInt(0)
    val subLen = dim / numSubs
    val adcTerms = (0 until numSubs).map { j =>
      val lut = pqLut(pqSubCodebook(fine, j, subLen), qArr, j, subLen)
      element_at(lit(lut), element_at(col("codes"), j + 1) + 1)
    }
    val candIds = codes
      .select(col("vec_id"), adcTerms.reduceLeft(_ + _).as("approx"))
      .orderBy(col("approx").desc, col("vec_id"))
      .limit(rescoreK)
      .select(col("vec_id"))
      .as[Long].collect().toSeq
    nonZeroVecs(embs)
      .where(col("vec_id").isin(candIds: _*))
      .select(col("vec_id"), round(cosine(col("v"), lit(qArr)), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
