package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture over an append-only event log: materialize the
  * latest-state-per-key snapshot at two as-of points and classify every key
  * as insert / update / unchanged / delete between them — the
  * snapshot-reconciliation step a training-data pipeline runs when a
  * curated corpus is rebuilt against a grown upstream log (LLM-pipeline
  * surface; no reference precedent — the reference's closest analogue is
  * the LASER cross-count equality gate, `LASERInputValidator.java:167-171`,
  * which compares two derived counts rather than two states).
  *
  * Declared semantics (what the oracle replays): a key's state at time `T`
  * is the `(event_type, value)` of its event with the greatest
  * `(ts, event_id)` among events with `ts < T`; keys whose latest event is
  * the optional `tombstone` type have NO state (deleted). Classification
  * between `t0 < t1`: no old state → `insert`, no new state → `delete`,
  * differing `(event_type, value)` → `update`, else `unchanged`.
  *
  * Plan shape for 100 TB: ONE key-partitioned aggregate over one scan —
  * both as-of states come from conditional `max_by` aggregates (map-side
  * combined), so the operator costs a single shuffle of per-key state, not
  * the two windowed sorts + full-outer self-join the declared SQL form
  * writes. No driver collect; the `(ts, event_id)` tie order makes the
  * aggregate deterministic under any partitioning (the generator
  * guarantees no duplicate `(user_id, ts)`, and `event_id` breaks even
  * hypothetical ties).
  */
object SnapshotDiff {

  /** Per-key `(key, change, old_type, new_type)` between the two as-of
    * points (microsecond epochs, exclusive bounds). `t0Us`/`t1Us` must be
    * resolvable against `events` — literals, or data-derived bounds
    * cross-joined on by the caller (see [[diffAuto]]). */
  def diff(events: DataFrame, key: Column, t0Us: Column, t1Us: Column,
      tombstone: Option[String] = None): DataFrame = {
    val us = unix_micros(col("ts"))
    val ord = struct(col("ts"), col("event_id"))
    val st = struct(col("event_type"), col("value"))
    // max_by ignores rows whose ordering expression is null → the `when`
    // with no otherwise is the filter.
    def stateAt(bound: Column): Column = max_by(st, when(us < bound, ord))
    val raw = events.groupBy(key.as("key"))
      .agg(stateAt(t0Us).as("_old"), stateAt(t1Us).as("_new"))
    // A tombstoned latest event erases the state AFTER selection (the
    // tombstone still wins the max_by race, as it must). Null-safe
    // compare: an event with a NULL type is live — `=!=` would evaluate
    // NULL and silently kill the key, diverging from the streaming twin's
    // `tombstone.contains(...)` (false for null).
    def live(c: Column): Column = tombstone match {
      case Some(t) => when(c.isNotNull && !(c.getField("event_type") <=> lit(t)), c)
      case None    => c
    }
    raw.select(col("key"), live(col("_old")).as("_old"), live(col("_new")).as("_new"))
      .withColumn("change",
        when(col("_old").isNull && col("_new").isNull, lit(null).cast("string"))
          .when(col("_old").isNull, lit("insert"))
          .when(col("_new").isNull, lit("delete"))
          .when(col("_old") =!= col("_new"), lit("update"))
          .otherwise(lit("unchanged")))
      .where(col("change").isNotNull) // key dead on both sides: not a change
      .select(col("key"),
        col("change"),
        col("_old").getField("event_type").as("old_type"),
        col("_new").getField("event_type").as("new_type"))
  }

  /** The as-of bounds used by the declared `evt_cdc` query: `t0` at 60% of
    * the log's microsecond span, `t1` just past the end. The 60% point is
    * `floor()`ed EXPLICITLY: a bare long cast truncates in Spark but
    * rounds-to-nearest in DuckDB (`CAST(4.6 AS BIGINT)` = 5 there), so
    * without the floor the two engines can derive bounds 1 µs apart and
    * flip the classification of any key whose event sits exactly on the
    * boundary. The double arithmetic itself is exact (spans ≪ 2⁵³).
    * 1-row result — broadcast onto the log by [[diffAuto]]. */
  def defaultBounds(events: DataFrame): DataFrame =
    events.agg(min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx"))
      .select(
        (col("mn") + floor(((col("mx") - col("mn")) * 6) / 10).cast("long")).as("t0"),
        (col("mx") + 1).as("t1"))

  /** [[diff]] with data-derived default bounds (one metadata-scale
    * aggregate, broadcast cross join — no driver collect). */
  def diffAuto(events: DataFrame, key: Column,
      tombstone: Option[String] = None): DataFrame =
    diff(events.crossJoin(broadcast(defaultBounds(events))),
      key, col("t0"), col("t1"), tombstone)
}
