package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.io.{BufferedWriter, OutputStreamWriter}
import java.util.zip.GZIPOutputStream

/** R19: fixed-size, input-ordered chunking into exactly-named gzip files
  * `<i>.chunk.seq.gz` of `chunkSize` rows (writer rotation
  * `LASERInputCheckMapper.java:148-168`, `chunkSize = 100`
  * `LASERInputValidator.java:18`, naming `:149`).
  *
  * Chunk identity is a pure function of the captured line index
  * (`chunk = idx / chunkSize`), so assignment is embarrassingly parallel:
  * one hash shuffle on `chunk` co-locates each chunk's rows, a
  * within-partition sort restores input order, and each task writes its
  * chunks' files directly (exact names rule out `df.write`, which owns its
  * file naming). No global sort, no driver materialization — the shape that
  * holds at 1000 chunks or 10⁷.
  */
object ChunkSink {

  /** lines(idx, line) + chunkSize → lines(idx, line, chunk). */
  def assign(lines: DataFrame, chunkSize: Int): DataFrame =
    lines.withColumn("chunk", (col("idx") / chunkSize).cast("long"))

  /** Write chunk files under `outDir`; returns the chunk count (the CHUNKS
    * counter — number of files actually written including the trailing
    * partial chunk, `LASERInputCheckMapper.java:156-168`). */
  def write(lines: DataFrame, outDir: String, chunkSize: Int = 100): Long = {
    val assigned = assign(lines, chunkSize)
    import org.apache.spark.sql.functions.{coalesce, lit, sum}
    // session Hadoop conf, not executor-default (see HadoopConf)
    val hconf = graft.sources.HadoopConf.of(lines)
    assigned
      .repartition(col("chunk"))
      .sortWithinPartitions("chunk", "idx")
      .select("chunk", "line")
      .mapPartitions { it =>
        val conf = hconf.value
        var current = -1L
        var writer: BufferedWriter = null
        var written = 0L
        def close(): Unit = if (writer != null) { writer.close(); writer = null }
        for (row <- it) {
          val chunk = row.getLong(0)
          if (chunk != current) {
            close()
            val path = new org.apache.hadoop.fs.Path(outDir, s"$chunk.chunk.seq.gz")
            val fs = path.getFileSystem(conf)
            writer = new BufferedWriter(new OutputStreamWriter(
              new GZIPOutputStream(fs.create(path, true)), "UTF-8"))
            current = chunk
            written += 1
          }
          writer.write(row.getString(1)); writer.write('\n')
        }
        close()
        Iterator.single(written)
      }(org.apache.spark.sql.Encoders.scalaLong)
      // agg, not reduce: an empty input (zero partitions after AQE) must
      // yield 0 chunks, not an empty-collection error
      .agg(coalesce(sum(col("value")), lit(0L)))
      .collect()(0).getLong(0)
  }

  /** R29: chunk, then delete the ORIGINAL seq file — but only after the
    * chunk write completed (`LASERInputValidator.java:186`: `hdfs.delete(
    * seqFile, false)` runs strictly after job success; a failed write must
    * leave the original in place, or a re-run has nothing to process).
    * Non-recursive delete, exactly like the reference. */
  def writeAndDeleteSource(lines: DataFrame, seqPath: String, outDir: String,
      chunkSize: Int = 100): Long = {
    val n = write(lines, outDir, chunkSize)
    val p = new org.apache.hadoop.fs.Path(seqPath)
    p.getFileSystem(lines.sparkSession.sparkContext.hadoopConfiguration)
      .delete(p, false)
    n
  }
}
