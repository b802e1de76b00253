package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the dedup chain (not part of the library
  * surface; run via `sbt "Test/runMain graft.tools.ProfileDD"`). */
object ProfileDD {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val d = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val corpus = d.unionAll(d.where(col("doc_id") < 20)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text")))

    t("corpus count")(corpus.count())
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val keyed = corpus.select(col("doc_id"), md5(col("text")).as("th")).persist(sl)
    t("keyed count")(keyed.count())
    val bigGroups = keyed.groupBy(col("th")).agg(count(lit(1)).as("k"))
      .where(col("k") > 1000).select(col("th"))
    val capped = keyed.join(broadcast(bigGroups), Seq("th"), "left_anti")
    val rep = capped.groupBy(col("th")).agg(min(col("doc_id")).as("rep"))
    val repDocs = corpus.join(rep.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
    t("repDocs count")(repDocs.count())
    val sh = t("shingles build")(Dedup.shingles(repDocs, 3).persist(sl))
    t("shingles count")(sh.count())
    val repPairs = t("lsh pairs build")(
      Dedup.lshCandidatePairsFromShingles(sh, 8, 2, 1000))
    t("lsh pairs count")(repPairs.count())
    val stats = t("pairOverlapStats")(Dedup.pairOverlapStats(sh, repPairs))
    t("stats count")(stats.count())
    val out = t("full nearDupScores")(Dedup.nearDupScores(corpus))
    t("full count")(out.count())
    spark.stop()
  }
}
