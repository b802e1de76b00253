package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — extension surface beyond the reference
  * (SURVEY §2.2 lists range/as-of joins as engine extensions with no
  * reference precedent).
  *
  * `asOf(left, right, key, ts, value)` attaches to every left row the
  * `value` of the latest right row with the same `key` and `right.ts <=
  * left.ts` (inclusive, like DuckDB/QuestDB ASOF).
  *
  * Spark-first plan: instead of the naive join + per-pair filter + rank
  * (which explodes to O(|L|·|R|) per key before pruning), tag and UNION the
  * two sides, then take a running `last(value) ignore nulls` over one
  * (key)-partitioned window ordered by (ts, right-first). ONE shuffle total,
  * linear in |L| + |R| — the shape that survives 100 TB. Ties: a right row
  * at exactly left.ts wins (ordered before the left row); multiple right
  * rows at the same (key, ts) are resolved arbitrarily (callers needing
  * stronger guarantees should pre-dedup the right side).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      value: String, as: String = "asof_value"): DataFrame = {
    // Internal tag/value columns must not collide with caller columns —
    // a left frame already holding "__isr"/"__v" would silently corrupt
    // results; derive fresh names from the input schemas instead.
    require(!left.columns.contains(as),
      s"asOf: output column '$as' already exists in the left frame")
    val taken = (left.columns ++ right.columns).toSet + as
    def fresh(base: String): String =
      Iterator.iterate(base)(_ + "_").dropWhile(taken.contains).next()
    val isr = fresh("__isr")
    val v = fresh("__v")
    val vType = right.schema(value).dataType
    val lTagged = left
      .withColumn(isr, lit(0))
      .withColumn(v, lit(null).cast(vType))
    val rTagged = right.select(
      col(key), col(ts), lit(1).as(isr), col(value).as(v))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col(isr).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Track the last right ROW, not the last non-null VALUE: wrapping the
    // value in a struct makes a matched row with a NULL value still count
    // as the match (ASOF semantics), instead of falling back to an older
    // row's value.
    val marker = when(col(isr) === 1, struct(col(v).as(v)))
    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn(as, last(marker, ignoreNulls = true).over(w).getField(v))
      .where(col(isr) === 0)
      .drop(isr, v)
  }
}
