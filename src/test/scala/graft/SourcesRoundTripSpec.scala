package graft

import org.apache.spark.sql.functions._

/** §2.2 scans/sources/sinks claims: parquet + orc + csv/tsv(+gzip) + json +
  * text writers/readers round-trip with schema fidelity. */
class SourcesRoundTripSpec extends TestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-rt").toString

  private lazy val nation = Tables(spark, sf(), "nation")

  test("csv (tsv + gzip) round-trip with explicit schema") {
    val out = s"${tmp()}/nation_tsv"
    nation.write.option("sep", "\t").option("header", "true")
      .option("compression", "gzip").csv(out)
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".csv.gz")), s"expected gzip parts, got ${files.toSeq}")
    val back = spark.read.option("sep", "\t").option("header", "true")
      .schema(nation.schema).csv(out)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("json round-trip with explicit schema") {
    val out = s"${tmp()}/nation_json"
    nation.write.json(out)
    val back = spark.read.schema(nation.schema).json(out)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("single-column text round-trip preserves lines") {
    val out = s"${tmp()}/lines_text"
    nation.select(concat_ws("|", col("n_nationkey"), col("n_name")).as("value"))
      .write.text(out)
    assert(spark.read.text(out).count() == nation.count())
  }

  test("parquet round-trip preserves nested array types (embeddings)") {
    val e = Tables(spark, sf(), "embeddings")
    val out = s"${tmp()}/emb_pq"
    e.write.parquet(out)
    val back = spark.read.parquet(out)
    assert(back.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true))
    assert(back.count() == e.count())
  }

  test("orc round-trip: values identical to parquet, filters pushed to the scan") {
    // ORC is the second columnar format Spark ships natively — the engine
    // must read/write it with the same fidelity (array columns included)
    // and keep predicate pushdown at the scan.
    val e = Tables(spark, sf(), "embeddings")
    val out = s"${tmp()}/emb_orc"
    e.write.orc(out)
    val back = spark.read.orc(out)
    assert(back.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true))
    assert(back.exceptAll(e).isEmpty && e.exceptAll(back).isEmpty,
      "orc round-trip must be value-identical")
    val plan = back.where(col("vec_id") < 10).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,10)]"),
      s"orc scan must carry the pushed filter:\n$plan")
  }

  test("date-partitioned time-series layout: ts predicate prunes partitions at the scan") {
    // The standard 100 TB event-log layout: write partitioned by event date
    // so time-bounded queries read only their days' directories — pruning
    // happens at file listing (PartitionFilters), not post-scan.
    import org.apache.spark.sql.execution.ExplainMode
    val out = s"${tmp()}/events_by_day"
    Tables(spark, sf(), "events")
      .withColumn("dt", to_date(col("ts")))
      .write.partitionBy("dt").parquet(out)
    val days = new java.io.File(out).listFiles().count(_.getName.startsWith("dt="))
    assert(days > 1, s"fixture must span multiple days, got $days")
    val probe = spark.read.parquet(out)
      .where(col("dt") === (Tables(spark, sf(), "events")
        .select(to_date(min(col("ts")))).head().getDate(0)))
    val plan = probe.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert("PartitionFilters: \\[[^\\]]*dt".r.findFirstIn(plan).isDefined, plan.take(2000))
    // pruned scan reads strictly fewer rows than the full table
    assert(probe.count() > 0 &&
      probe.count() < Tables(spark, sf(), "events").count())
  }

  test("approximate sketches land within tolerance of exact (percentile, HLL)") {
    val orders = Tables(spark, sf(), "orders")
    val approxMedian = orders
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .collect()(0).getDouble(0)
    val exactMedian = orders.stat.approxQuantile("o_totalprice", Array(0.5), 0.0)(0)
    assert(math.abs(approxMedian - exactMedian) / exactMedian < 0.05,
      s"approx=$approxMedian exact=$exactMedian")
  }
}
