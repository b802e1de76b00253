package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R25: split individuals `1..n` into consecutive `[start, end]` windows of
  * `batchSize` (`TRACEJobGenerator.java:52-93`). Batch ids are zero-padded
  * `%05d` inside the descriptor JSON but unpadded in the filename (`:65,71`).
  *
  * Metadata-scale (descriptor counts, not data), but expressed as a
  * DataFrame over `spark.range` so the same operator covers a billion-row
  * id space without driver materialization.
  */
object RangeBatch {

  /** → (batch BIGINT, batch_id "%05d" STRING, start BIGINT, end BIGINT). */
  def batches(spark: SparkSession, nIndividuals: Long, batchSize: Int): DataFrame = {
    val nBatches = (nIndividuals + batchSize - 1) / batchSize
    spark.range(nBatches).select(
      col("id").as("batch"),
      format_string("%05d", col("id")).as("batch_id"),
      (col("id") * batchSize + 1).as("start"),
      least(((col("id") + 1) * batchSize), lit(nIndividuals)).as("end"))
  }
}
