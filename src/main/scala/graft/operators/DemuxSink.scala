package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R26: route each (key, value) text row into one of two output files by the
  * value's tab-field arity (`ReferencePCAOutputFormat.java:8-16`): `<= 2`
  * fields → `reference_pc_var.txt`, else `reference_pc.txt`.
  *
  * Spark-native: a derived routing column and two filtered text writes over
  * one cached scan — no custom OutputFormat. The exact single-file names in
  * the contract mean a coalesce(1) per side; the inputs at this point are
  * PCA coordinate tables (metadata-scale), not the 100 TB fact data.
  */
object DemuxSink {

  /** kv(key, value) → kv + route (the pure, testable part). */
  def route(kv: DataFrame): DataFrame =
    kv.withColumn("route",
      when(size(split(col("value"), "\t")) <= 2, lit("reference_pc_var.txt"))
        .otherwise(lit("reference_pc.txt")))

  def write(kv: DataFrame, outDir: String): Unit = {
    val routed = route(kv).withColumn("row", concat_ws("\t", col("key"), col("value"))).cache()
    try {
      Seq("reference_pc_var.txt", "reference_pc.txt").foreach { name =>
        val part = routed.where(col("route") === name).select("row")
        val tmp = s"$outDir/.tmp_$name"
        part.coalesce(1).write.mode("overwrite").text(tmp)
        val conf = kv.sparkSession.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.Path(outDir).getFileSystem(conf)
        val written = fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/part-*"))
        if (written.nonEmpty) {
          // HDFS rename does NOT overwrite: remove any stale destination
          // first and fail loudly if the move itself fails, otherwise a
          // re-run would silently keep old data and delete the new.
          val dst = new org.apache.hadoop.fs.Path(outDir, name)
          if (fs.exists(dst)) fs.delete(dst, false)
          if (!fs.rename(written.head.getPath, dst))
            throw new java.io.IOException(s"demux rename failed: ${written.head.getPath} -> $dst")
        }
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
    } finally routed.unpersist()
  }
}
