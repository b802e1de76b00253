package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every declared query at the given scale factor,
  * fully evaluated through the `noop` sink (a bare `count()` would let
  * Spark prune projections and undercount scan/compute cost). Prints ONE
  * JSON line; the driver archives it as `BENCH_r{N}.json`. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warmup: prime codegen/JIT and the page cache so the first timed query
    // doesn't absorb session startup.
    Tables.names.foreach(t => Tables(spark, sfDir, t).count())
    // Optional args: bench only the named queries (local iteration; the
    // driver always runs the full catalog).
    val only = args.toSet
    val results = SparkEntry.catalog
      .filter(q => only.isEmpty || only(q.name))
      .map { q =>
      val t0 = System.nanoTime()
      val ok =
        try { q.build(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          false
        }
      // -1 sentinel: a failed query must not pass off its near-zero elapsed
      // time as a perf win in the archived JSON
      q.name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Locale.ROOT formatting: the f-interpolator uses the JVM default
    // locale — a comma-decimal locale would emit invalid JSON.
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
