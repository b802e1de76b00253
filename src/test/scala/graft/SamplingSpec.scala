package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends TestBase {

  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("id")

  test("hashSample: deterministic, invariant under repartitioning, ~pct sized") {
    val d = ids(2000)
    val a = Sampling.hashSample(d, col("id"), 10).as[Long].collect().toSet
    val b = Sampling.hashSample(d.repartition(13), col("id"), 10)
      .as[Long].collect().toSet
    assert(a == b, "sample membership must be a pure row property")
    // ~10% with slack for hash variance
    assert(a.size > 120 && a.size < 280, s"got ${a.size} of 2000 at pct=10")
    // monotone: a 10% sample is a subset of a 20% sample (same buckets)
    val c = Sampling.hashSample(d, col("id"), 20).as[Long].collect().toSet
    assert(a.subsetOf(c))
  }

  test("stratifiedSample: per-stratum rates, absent strata dropped") {
    val d = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "grp")
    val got = Sampling.stratifiedSample(d, col("grp"), col("id"),
        Map("s0" -> 100, "s1" -> 30))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(got("s0") == 100L)            // rate 100 of 100 → everything kept
    assert(got.get("s2").isEmpty)        // not in the map → dropped
    assert(got("s1") > 10 && got("s1") < 60) // ~30%
    // rates outside [0, buckets] fail loudly
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(d, col("grp"), col("id"), Map("s0" -> 101))
    }
  }
}
