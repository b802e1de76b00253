package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: `runMain graft.Explain <sfDir> <query...>` prints each
  * query's formatted physical plan (pushdown, pruning, join strategy,
  * codegen spans) — the per-operator perf review loop. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Keep operator plans LAZY for inspection: with the default eager
    // release, dedup/similarity operators checkpoint their results and the
    // dump would show only a checkpoint-RDD scan instead of the real chain.
    spark.conf.set("graft.eagerRelease", "false")
    SparkEntry.catalog
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        println(s"\n========== ${q.name} ==========")
        try q.build(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"  failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
