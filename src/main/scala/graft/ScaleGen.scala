package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-probe data generator: write an N× copy of a testdata dir by
  * unioning key-shifted copies of the FACT tables (orders/lineitem keep a
  * consistent o_orderkey↔l_orderkey shift; events shift event_id/user_id).
  * Dimension tables and the dedup/similarity corpora copy through 1× —
  * dims because that's what dims do at scale, documents/embeddings because
  * their brute-force DuckDB oracles are O(n²) and the probe must stay
  * checkable. `tools/check.py` understands the resulting dataset dirs.
  *
  * Usage: runMain graft.ScaleGen <srcDir> <outDir> <factor> [scale-docs]
  *
  * `scale-docs` additionally key-shifts documents/embeddings — a
  * BENCH-ONLY corpus (the brute-force dedup oracles are O(n²), so the
  * driver's correctness gate must not run against it).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || (args.length == 4 && args(3) == "scale-docs"),
      s"usage: ScaleGen <srcDir> <outDir> <factor> [scale-docs]; got ${args.mkString(" ")}")
    val (srcDir, outDir, factorS) = (args(0), args(1), args(2))
    val scaleDocs = args.length == 4
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val keyOff = 10000000L
    // Fail loudly if the source key space reaches the shift (e.g. re-scaling
    // an already-shifted outDir): colliding keys would silently change join
    // fan-out in the probe instead of erroring.
    val shiftedKeys = Seq("orders" -> "o_orderkey", "lineitem" -> "l_orderkey",
      "events" -> "event_id", "events" -> "user_id") ++
      (if (scaleDocs) Seq("documents" -> "doc_id", "embeddings" -> "vec_id") else Nil)
    shiftedKeys.foreach { case (t, k) =>
      val mx = Tables(spark, srcDir, t).agg(max(col(k))).collect()(0).getLong(0)
      require(mx < keyOff, s"$t.$k max $mx >= key shift $keyOff — refusing to generate colliding copies")
    }
    def copies(table: String, shift: Map[String, Long => org.apache.spark.sql.Column]) = {
      val base = Tables(spark, srcDir, table)
      (0 until factor).map { i =>
        shift.foldLeft(base) { case (df, (c, f)) => df.withColumn(c, f(i.toLong)) }
      }.reduce(_ unionByName _)
    }

    def write(table: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
      println(s"[scalegen] $table -> ${spark.read.parquet(s"$outDir/$table.parquet").count()} rows")
    }

    write("orders", copies("orders",
      Map("o_orderkey" -> (i => col("o_orderkey") + lit(i * keyOff)))))
    write("lineitem", copies("lineitem",
      Map("l_orderkey" -> (i => col("l_orderkey") + lit(i * keyOff)))))
    write("events", copies("events", Map(
      "event_id" -> (i => col("event_id") + lit(i * keyOff)),
      "user_id" -> (i => col("user_id") + lit(i * keyOff)))))
    if (scaleDocs) {
      write("documents", copies("documents",
        Map("doc_id" -> (i => col("doc_id") + lit(i * keyOff)))))
      write("embeddings", copies("embeddings",
        Map("vec_id" -> (i => col("vec_id") + lit(i * keyOff)))))
      // machine-readable bench-only marker — tools/check.py refuses this
      // dir, enforcing (not just documenting) the no-n²-oracle contract
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, "BENCH_ONLY"),
        "scale-docs corpus: brute-force dedup oracles are O(n^2); bench only\n")
    }
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(t, Tables(spark, srcDir, t))
    }
    if (!scaleDocs) Seq("documents", "embeddings").foreach { t =>
      write(t, Tables(spark, srcDir, t))
    }
    spark.stop()
  }
}
