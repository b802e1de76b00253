package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered line-oriented input: every domain reader consumes a
  * `DataFrame(idx BIGINT, line STRING)` where `idx` is the 0-based position
  * of the line within its input, so file-backed and in-memory fixtures share
  * one parse path and input order is an explicit column rather than an
  * accident of partitioning.
  *
  * The reference streams each file single-threaded
  * (`LASERInputCheckMapper.java:114`); here order is captured once at read
  * time (`zipWithIndex` — one extra job to count partition sizes, no
  * shuffle) and every downstream operator is free to parallelize. At 100 TB
  * the gzip inputs are the bottleneck either way: the runbook step is
  * re-encode to parquet/zstd at the ingest boundary, after which `idx`
  * comes for free from the row group order.
  */
object Lines {

  val schema: StructType = StructType(Seq(
    StructField("idx", LongType, nullable = false),
    StructField("line", StringType, nullable = false)))

  /** Read a text file (gzip transparent) preserving line order. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rdd = spark.read.textFile(path).rdd.zipWithIndex.map {
      case (l, i) => org.apache.spark.sql.Row(i, l)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** In-memory fixture variant (tests, VALUES-oracle queries). */
  def of(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = lines.zipWithIndex.map { case (l, i) =>
      org.apache.spark.sql.Row(i.toLong, l)
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Gzip magic-byte sniff (R1, `LASERInputCheckMapper.java:33-51`): Spark
    * decompresses transparently, but "is actually gzip" is itself a declared
    * validation with its own error codes. */
  def isGzip(spark: SparkSession, path: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    try {
      val b0 = in.read(); val b1 = in.read()
      b0 == 0x1f && b1 == 0x8b
    } finally in.close()
  }

  private[graft] def tokens(sep: String) = split(col("line"), sep)
}
