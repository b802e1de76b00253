package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (`TESTDATA.md`).
  *
  * All engine queries take a scale-factor directory and read the parquet
  * tables lazily; Catalyst handles column pruning / predicate pushdown at the
  * scan, so loaders never cache or materialize. At 100 TB the same code path
  * works unchanged: `dir` becomes an object-store prefix and the parquet
  * footer statistics drive partition pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Engine functions ride along with table access so every query sees
    // them regardless of how the session was built.
    graft.functions.GraftFunctions.ensure(spark)
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized reader
    // rejects; read nanos as long and convert to a microsecond timestamp
    // (the generated data is µs-granular, so this is lossless).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Only rewrite when the file actually carries nanos-as-long — an events
    // table with a real TIMESTAMP column passes through untouched.
    // INTEGER division: epoch-ns values (~1.7e18) exceed double's exact
    // integer range, so `/ 1000.0` rounds ~12% of timestamps up 1µs vs the
    // truncation DuckDB applies reading the same parquet.
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // Regenerated data writes plain timestamp[us] with no UTC flag, which
      // Spark infers as TIMESTAMP_NTZ. The session timezone is pinned UTC,
      // so reinterpreting NTZ micros as instant micros is lossless and
      // byte-identical to what DuckDB reads from the same file.
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view (used by tests and SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
