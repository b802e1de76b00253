package graft

import java.sql.Timestamp

import graft.operators.SnapshotDiff
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends TestBase {

  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  // (event_id, ts, user_id, event_type, value)
  private def log = Seq(
    (1L, ts(10), 1L, "click", 1.0),    // user 1: state at t0 = (click, 1.0)
    (2L, ts(30), 1L, "view", 2.0),     //   …updated after t0
    (3L, ts(10), 2L, "view", 5.0),     // user 2: unchanged across the span
    (4L, ts(30), 3L, "signup", 1.0),   // user 3: first event after t0 → insert
    (5L, ts(10), 4L, "click", 1.0),    // user 4: tombstoned after t0 → delete
    (6L, ts(30), 4L, "gone", 0.0),
    (7L, ts(10), 5L, "gone", 0.0),     // user 5: dead at BOTH bounds → absent
    (8L, ts(10), 6L, "click", 7.0),    // user 6: same type, new VALUE → update
    (9L, ts(30), 6L, "click", 8.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("diff: insert/update/unchanged/delete classification with tombstones") {
    val got = SnapshotDiff.diff(log, col("user_id"),
        lit(20L * 1000000L), lit(40L * 1000000L), tombstone = Some("gone"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(got(1L) == (("update", "click", "view")))
    assert(got(2L) == (("unchanged", "view", "view")))
    assert(got(3L) == (("insert", null, "signup")))
    assert(got(4L) == (("delete", "click", null)))
    assert(!got.contains(5L), "a key dead on both sides is not a change")
    assert(got(6L) == (("update", "click", "click")))
  }

  test("diff: without a tombstone type nothing deletes; result is partition-stable") {
    val a = SnapshotDiff.diff(log, col("user_id"),
      lit(20L * 1000000L), lit(40L * 1000000L)).collect()
    assert(!a.exists(_.getString(1) == "delete"))
    // "gone" is then an ordinary type: user 4 updates, user 5 is unchanged
    val m = a.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(4L) == "update" && m(5L) == "unchanged")
    val b = SnapshotDiff.diff(log.repartition(7), col("user_id"),
      lit(20L * 1000000L), lit(40L * 1000000L)).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }

  test("diffAuto: derived bounds split the real events log non-degenerately") {
    val events = Tables(spark, sf(), "events")
    val counts = SnapshotDiff.diffAuto(events, col("user_id"))
      .groupBy("change").count().as[(String, Long)].collect().toMap
    // every user has events before 60% of the span and none can delete
    assert(counts.getOrElse("delete", 0L) == 0L)
    assert(counts.values.sum == events.select("user_id").distinct().count())
    assert(counts.getOrElse("update", 0L) > 0L, s"degenerate split: $counts")
  }

  test("diff plans as ONE aggregate over one scan (no join, no window sort)") {
    val plan = SnapshotDiff.diff(log, col("user_id"),
      lit(20L * 1000000L), lit(40L * 1000000L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"snapshot diff must not join:\n$plan")
    assert(!plan.contains("Window"), s"snapshot diff must not window-sort:\n$plan")
  }
}
