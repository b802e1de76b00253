package graft

import graft.operators.{BloomJoin, SkewJoin}
import org.apache.spark.sql.functions._

/** The engine's SQL face: registered views + `spark.sql` produce the same
  * results as the DataFrame programs, and the skew/approx utilities behave. */
class SqlSurfaceSpec extends TestBase {

  private lazy val dir = sf()

  test("spark.sql over registered views matches the DataFrame catalog") {
    Tables.registerAll(spark, dir)
    val byName = SparkEntry.catalog.map(q => q.name -> q).toMap
    // Queries whose oracle SQL is dialect-portable enough to run verbatim
    // on Spark SQL too (the engine's user-facing SQL surface).
    val portable = Seq("q01_scan_project", "q02_filter", "q03_join_inner",
      "q09_agg_group", "q11_agg_countdistinct", "q18_sort_limit", "q19a_intersect")
    portable.foreach { name =>
      val q = byName(name)
      val viaSql = spark.sql(q.oracle.get)
      val viaDf = q.build(spark, dir)
      assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty,
        s"$name: SQL surface diverged from DataFrame program")
    }
  }

  test("salted join result == plain join result (salt is partitioning-only)") {
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
    val salted = SkewJoin.saltedEquiJoin(orders, customer, "o_custkey", nSalts = 4)
      .select("o_orderkey", "c_name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() == plain.count())
  }

  test("bloom-pruned join == plain join (pre-filter is lossless)") {
    import spark.implicits._
    val orders = Tables(spark, dir, "orders")
    val urgent = orders.where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("b_key"), col("o_orderstatus"))
    val lineitem = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val plain = lineitem.join(urgent, col("l_orderkey") === col("b_key"))
    val pruned = BloomJoin.bloomPrunedJoin(lineitem, urgent,
      "l_orderkey", "b_key", expectedItems = 10000)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)

    // Null probe keys must be dropped by the pre-filter, not crash the UDF.
    val probeWithNulls = Seq[(java.lang.Long, String)](
      (1L, "a"), (null, "b")).toDF("l_orderkey", "tag")
    val r = BloomJoin.bloomPrunedJoin(probeWithNulls, urgent,
      "l_orderkey", "b_key", expectedItems = 100)
    assert(r.where(col("tag") === "b").count() == 0)

    // The filter genuinely prunes: keys far outside the build set are
    // rejected at ~the configured fpp, not passed through.
    val bloom = urgent.stat.bloomFilter("b_key", 10000, 0.01)
    val misses = (1000000L to 1001000L).count(k => !bloom.mightContainLong(k))
    assert(misses > 950, s"bloom rejected only ${misses}/1001 disjoint keys")

    // Empty build side → empty result (no crash, no spurious rows).
    val emptyBuild = urgent.where(lit(false))
    assert(BloomJoin.bloomPrunedJoin(lineitem, emptyBuild,
      "l_orderkey", "b_key", expectedItems = 10).count() == 0)

    // NON-empty build side whose keys are ALL null hits the same null-buffer
    // NPE inside stat.bloomFilter — it must short-circuit to the correct
    // empty join (null never matches an equi-join), not rethrow.
    val allNullBuild = Seq[(java.lang.Long, String)]((null, "x"), (null, "y"))
      .toDF("b_key", "o_orderstatus")
    assert(BloomJoin.bloomPrunedJoin(lineitem, allNullBuild,
      "l_orderkey", "b_key", expectedItems = 10).count() == 0)

    // Non-integral keys fail at plan time with a clear message — on EITHER
    // side (a string build key would populate the filter in a different
    // hash space than mightContainLong probes, silently dropping matches).
    val err = intercept[IllegalArgumentException] {
      BloomJoin.bloomPrunedJoin(
        probeWithNulls.withColumn("l_orderkey", col("l_orderkey").cast("string")),
        urgent, "l_orderkey", "b_key", expectedItems = 10)
    }
    assert(err.getMessage.contains("integral probe key"))
    val err2 = intercept[IllegalArgumentException] {
      BloomJoin.bloomPrunedJoin(probeWithNulls,
        urgent.withColumn("b_key", col("b_key").cast("string")),
        "l_orderkey", "b_key", expectedItems = 10)
    }
    assert(err2.getMessage.contains("integral build key"))
  }

  test("events.props parses to MapType via from_json (§1.3 surface)") {
    val events = Tables(spark, dir, "events")
    val parsed = events.select(col("event_id"),
      from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.IntegerType)).as("m"))
    val r = parsed.select(col("m").getItem("k").as("k")).agg(
      count(col("k")).as("nonnull"), sum(col("k")).as("total")).collect()(0)
    assert(r.getLong(0) == events.count(), "every props row carries key k")
    assert(r.getLong(1) > 0)
  }

  test("approx_count_distinct within rsd of exact (§2.2 agg surface)") {
    val orders = Tables(spark, dir, "orders")
    val exact = orders.agg(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    val approx = orders.agg(approx_count_distinct(col("o_custkey"), rsd = 0.05))
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }
}
