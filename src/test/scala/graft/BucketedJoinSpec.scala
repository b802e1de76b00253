package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** The co-located join story (SURVEY scale notes): writing both fact
  * tables bucketed on the join key lets Spark join AND aggregate on that
  * key with ZERO exchanges — the storage-level answer to the biggest
  * 100 TB shuffle. */
class BucketedJoinSpec extends TestBase {

  test("identically bucketed tables join + aggregate with zero shuffles") {
    val o = Tables(spark, sf(), "orders")
    val l = Tables(spark, sf(), "lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 6).as("q"))
      val got = j.collect()
      // plan after AQE finalization: bucketed scans satisfy both the join
      // and the same-key aggregate distribution — no Exchange anywhere
      val plan = j.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"),
        "bucketed join/agg must not shuffle:\n" + plan.take(3000))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "scan must actually read bucketed:\n" + plan.take(3000))

      // results equal the unbucketed plan
      val expect = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 6).as("q"))
        .collect()
      assert(got.map(_.toString).sorted.toSeq == expect.map(_.toString).sorted.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("incremental dedup over bucketed keep-set and batch plans with zero exchanges") {
    import spark.implicits._
    import graft.operators.Dedup
    // keep-set holds texts A,B; batch re-sends B (dup: must drop) and
    // introduces C twice (must aggregate to one keep row, min doc_id)
    val existing = Seq((1L, "text A"), (2L, "text B")).toDF("doc_id", "text")
    val batch = Seq((10L, "text B"), (11L, "text C"), (12L, "text C"))
      .toDF("doc_id", "text")
    Dedup.exact(existing).select(col("h"), col("keep_id"))
      .write.mode("overwrite").bucketBy(8, "h").sortBy("h").saveAsTable("keeps_b")
    batch.select(md5(col("text")).as("h"), col("doc_id"))
      .write.mode("overwrite").bucketBy(8, "h").sortBy("h").saveAsTable("batch_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val inc = Dedup.exactIncrementHashed(
        spark.table("keeps_b"), spark.table("batch_b"))
      val got = inc.select(col("keep_id")).as[Long].collect().toSet
      assert(got == Set(11L), "only text C's min doc_id extends the keep-set")
      // both the batch min-aggregate and the anti-join must be satisfied
      // by the bucketed scans — the whole increment shuffles NOTHING
      val plan = inc.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"),
        "bucketed incremental dedup must not shuffle:\n" + plan.take(3000))
      // and it agrees with the shuffled (unbucketed) production form
      val shuffled = Dedup.exactIncrement(Dedup.exact(existing), batch)
        .select(col("keep_id")).as[Long].collect().toSet
      assert(got == shuffled)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS keeps_b")
      spark.sql("DROP TABLE IF EXISTS batch_b")
    }
  }
}
