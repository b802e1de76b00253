package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates: accuracy bounds and — the 100 TB property — sketch
  * MERGEABILITY: per-group sketches union to the global answer, so daily/
  * partition-level sketches can be pre-aggregated and merged at query time
  * without re-reading raw data. */
class SketchSpec extends TestBase {

  private lazy val li = Tables(spark, sf(), "lineitem")

  test("approx_count_distinct (rsd 0.01) within 3% of exact") {
    val r = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.01).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.03,
      s"exact=$exact approx=$approx")
  }

  test("HLL datasketches merge: union of per-group sketches ≈ global distinct") {
    val perGroup = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
    val merged = perGroup
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val exact = li.select("l_orderkey").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"exact=$exact merged=$merged")
  }

  test("percentile_approx brackets the exact median") {
    val r = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact"),
      expr("percentile_approx(l_quantity, 0.5, 10000)").as("approx")).head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact <= 0.05, s"exact=$exact approx=$approx")
  }
}
