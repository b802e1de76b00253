package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — extension surface beyond the reference
  * (SURVEY §2.2 lists range/as-of joins as engine extensions with no
  * reference precedent; `AsOfJoin` covers the temporal-latest case, this
  * covers interval containment).
  *
  * Spark-first plan: a bare `p.join(iv, pt between start and end)` has no
  * equi-key, so Catalyst plans BroadcastNestedLoopJoin — O(|P|·|I|) and a
  * driver OOM once the interval side outgrows the broadcast cap. Instead,
  * bucketize: points key to `floor(pt / w)`, intervals explode to every
  * bucket they overlap, equi-join on the bucket, then apply the exact
  * containment as a residual filter. Each (point, interval) pair meets in
  * EXACTLY one bucket (the point's), so no distinct pass is needed.
  *
  * Choose `bucketWidth` ≈ the typical interval length: intervals then
  * explode into ~2 rows each, and the join is an ordinary shuffled (or
  * broadcast, if small) hash join — the shape that survives 100 TB.
  */
object RangeJoin {

  /** Join `points` to `intervals` where `start <= pt <= end` (inclusive
    * both ends). `pt`/`start`/`end` must cast to LONG (epoch seconds,
    * numeric keys, ...); buckets are `value DIV bucketWidth`. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pt: String, start: String, end: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val taken = (points.columns ++ intervals.columns).toSet
    val b = Iterator.iterate("__bucket")(_ + "_").dropWhile(taken.contains).next()
    def bucketOf(c: Column): Column = floor(c.cast("long") / bucketWidth).cast("long")
    val pb = points.withColumn(b, bucketOf(col(pt)))
    // Inverted (start > end) intervals match nothing under BETWEEN
    // semantics — drop them BEFORE the explode, where sequence(a, b) with
    // a > b would otherwise auto-step DOWNWARD into a huge bucket array.
    val ib = intervals
      .where(col(start) <= col(end))
      .withColumn(b, explode(sequence(bucketOf(col(start)), bucketOf(col(end)))))
    pb.join(ib, Seq(b))
      .where(col(pt) >= col(start) && col(pt) <= col(end))
      .drop(b)
  }
}
