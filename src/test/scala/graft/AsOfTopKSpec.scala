package graft

import graft.functions.TopK
import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._

class AsOfTopKSpec extends TestBase {

  import spark.implicits._

  test("rangeJoin: bucketed == brute force, inclusive bounds, multi-bucket intervals") {
    // intervals of varied length: shorter, equal, and 3× the bucket width
    val iv = Seq((1L, 0L, 5L), (2L, 8L, 18L), (3L, 20L, 50L), (4L, 90L, 91L))
      .toDF("iv_id", "lo", "hi")
    val pts = (0L until 100L).map(p => p -> s"p$p").toDF("pt", "tag")
    val got = RangeJoin.pointInInterval(pts, iv, "pt", "lo", "hi", bucketWidth = 10L)
      .select("iv_id", "pt").as[(Long, Long)].collect().toSet
    val brute = (for {
      (id, lo, hi) <- Seq((1L, 0L, 5L), (2L, 8L, 18L), (3L, 20L, 50L), (4L, 90L, 91L))
      p <- 0L until 100L if p >= lo && p <= hi
    } yield (id, p)).toSet
    assert(got == brute)
    // inclusive at both ends
    assert(got.contains((1L, 0L)) && got.contains((1L, 5L)))
    // each pair appears exactly once (no per-bucket duplicates)
    val all = RangeJoin.pointInInterval(pts, iv, "pt", "lo", "hi", 10L)
      .select("iv_id", "pt").as[(Long, Long)].collect()
    assert(all.length == all.toSet.size)
    // result is bucket-width invariant (width is purely a physical knob)
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.pointInInterval(pts, iv, "pt", "lo", "hi", w)
        .select("iv_id", "pt").as[(Long, Long)].collect()
      assert(got.toSet == brute && got.length == brute.size, s"width=$w")
    }
    // inverted interval (start > end) matches nothing — and must not
    // explode a descending bucket sequence
    val inverted = Seq((9L, 90L, 10L)).toDF("iv_id", "lo", "hi")
    assert(RangeJoin.pointInInterval(pts, inverted, "pt", "lo", "hi", 10L).count() == 0)
  }

  test("asOf: most recent prior value, inclusive tie, null before first") {
    val left = Seq((1L, 5L, "l1"), (1L, 10L, "l2"), (1L, 20L, "l3"), (2L, 7L, "l4"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 4L, 100.0), (1L, 10L, 200.0), (1L, 15L, 300.0), (3L, 1L, 999.0))
      .toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, "k", "ts", "v")
      .select("tag", "asof_value").as[(String, Option[Double])].collect().toMap
    assert(got("l1").contains(100.0)) // prior row at ts=4
    assert(got("l2").contains(200.0)) // INCLUSIVE: right at exactly ts=10 wins
    assert(got("l3").contains(300.0)) // latest prior among several
    assert(got("l4").isEmpty)         // key 2 has no right rows at all
  }

  test("asOf: a matched right row with NULL value yields NULL, not an older value") {
    val left = Seq((1L, 25L, "l1")).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, Some(5.0)), (1L, 20L, None))
      .toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, "k", "ts", "v")
      .select("tag", "asof_value").as[(String, Option[Double])].collect().toMap
    assert(got("l1").isEmpty, "latest matched row has NULL value → NULL (ASOF semantics)")
  }

  test("asOf matches naive join+rank formulation on real events") {
    val events = Tables(spark, sf(), "events")
    val clicks = events.where($"event_type" === "click").select("event_id", "user_id", "ts")
    val purchases = events.where($"event_type" === "purchase").select("user_id", "ts", "value")
    val fast = AsOfJoin.asOf(clicks, purchases, "user_id", "ts", "value")
      .select("event_id", "asof_value")
    val naive = clicks.as("l")
      .join(purchases.as("r"),
        $"l.user_id" === $"r.user_id" && $"r.ts" <= $"l.ts", "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"event_id").orderBy($"r.ts".desc_nulls_last)))
      .where($"rk" === 1)
      .select($"event_id", $"value".as("asof_value"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("TopK aggregator: exact, deterministic, merge-safe") {
    val topk = new TopK(3)
    // reduce path honors (score desc, id asc) with a full floor
    val buf = Seq((1L, 5.0), (2L, 9.0), (3L, 7.0))
      .foldLeft(topk.zero)(topk.reduce)
    assert(topk.reduce(buf, (4L, 1.0)) == Seq((2L, 9.0), (3L, 7.0), (1L, 5.0)))
    assert(topk.reduce(buf, (4L, 8.0)) == Seq((2L, 9.0), (4L, 8.0), (3L, 7.0)))
    // tie on score → lower id first
    assert(topk.reduce(buf, (0L, 7.0)) == Seq((2L, 9.0), (0L, 7.0), (3L, 7.0)))
    // merge of partials == reduce over the union
    val all = Seq((1L, 5.0), (2L, 9.0), (3L, 7.0), (4L, 8.0), (5L, 2.0))
    val (p1, p2) = all.splitAt(2)
    val merged = topk.merge(
      p1.foldLeft(topk.zero)(topk.reduce), p2.foldLeft(topk.zero)(topk.reduce))
    assert(merged == all.foldLeft(topk.zero)(topk.reduce))
  }

  test("TopK aggregator query matches the window-rank plan") {
    val byName = SparkEntry.catalog.map(q => q.name -> q).toMap
    val agg = byName("q30_topk_agg").build(spark, sf())
    val window = byName("q17_topk_group").build(spark, sf())
      .withColumnRenamed("rk", "rk2")
    // same (custkey, orderkey) pairs survive both plans
    val a = agg.select("o_custkey", "o_orderkey")
    val w = window.select("o_custkey", "o_orderkey")
    assert(a.exceptAll(w).isEmpty && w.exceptAll(a).isEmpty)
  }
}
