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

  test("mixtureSample: output approximates target proportions; binding stratum whole") {
    // 6000 a / 2000 b / 400 c; targets a .4 / b .4 / c .2 → caps 15000 /
    // 5000 / 2000 → N = 2000 (c binding, kept whole): a→800, b→800, c→400.
    val d = ((0L until 6000L).map(i => (i, "a")) ++
        (6000L until 8000L).map(i => (i, "b")) ++
        (8000L until 8400L).map(i => (i, "c")))
      .toDF("id", "grp")
    val got = Sampling.mixtureSample(d, col("grp"), col("id"),
        Map("a" -> 0.4, "b" -> 0.4, "c" -> 0.2))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(got("c") == 400L, s"binding stratum must be kept whole: $got")
    // hash sampling: expect within ±20% of the derived 800
    assert(got("a") > 640 && got("a") < 960, s"a out of band: $got")
    assert(got("b") > 640 && got("b") < 960, s"b out of band: $got")
    // membership is a pure row property (stable under repartitioning)
    val a1 = Sampling.mixtureSample(d, col("grp"), col("id"),
        Map("a" -> 0.4, "b" -> 0.4, "c" -> 0.2)).select("id").as[Long].collect().toSet
    val a2 = Sampling.mixtureSample(d.repartition(7), col("grp"), col("id"),
        Map("a" -> 0.4, "b" -> 0.4, "c" -> 0.2)).select("id").as[Long].collect().toSet
    assert(a1 == a2)
    // strata absent from the target mixture drop
    val e = Sampling.mixtureSample(d, col("grp"), col("id"), Map("a" -> 1.0))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(e.keySet == Set("a"))
    // invalid targets fail loudly
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(d, col("grp"), col("id"), Map("a" -> 0.7, "b" -> 0.7))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(d, col("grp"), col("id"), Map("a" -> 0.0))
    }
  }
}
