package graft

import graft.operators.ChunkSink
import graft.sources.Lines
import scala.jdk.CollectionConverters._

/** R19 boundary cases (SURVEY §5.3): 0 rows, exactly chunkSize, chunkSize+1,
  * trailing partial; exact names, exact contents, gzip framing, input order. */
class ChunkSinkSpec extends TestBase {

  private def readGz(f: java.io.File): Seq[String] = {
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f)), "UTF-8"))
    try Iterator.continually(in.readLine()).takeWhile(_ != null).toList
    finally in.close()
  }

  private def write(n: Int, chunkSize: Int): (Long, java.io.File) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-chunks").toFile
    val lines = Lines.of(spark, (0 until n).map(i => s"row$i"))
    val count = ChunkSink.write(lines, dir.getAbsolutePath, chunkSize)
    (count, dir)
  }

  test("empty input: zero chunks, zero files") {
    val (count, dir) = write(0, 100)
    assert(count == 0L)
    assert(dir.listFiles().count(_.getName.endsWith(".chunk.seq.gz")) == 0)
  }

  test("exactly one full chunk") {
    val (count, dir) = write(100, 100)
    assert(count == 1L)
    val files = dir.listFiles().filter(_.getName.endsWith(".chunk.seq.gz"))
    assert(files.map(_.getName).toSet == Set("0.chunk.seq.gz"))
    assert(readGz(files.head) == (0 until 100).map(i => s"row$i"))
  }

  test("trailing partial chunk gets its own file (`LASERInputCheckMapper.java:156-168`)") {
    val (count, dir) = write(101, 100)
    assert(count == 2L)
    val byName = dir.listFiles().filter(_.getName.endsWith(".chunk.seq.gz"))
      .map(f => f.getName -> f).toMap
    assert(byName.keySet == Set("0.chunk.seq.gz", "1.chunk.seq.gz"))
    assert(readGz(byName("1.chunk.seq.gz")) == Seq("row100"))
  }

  test("property: all rows present, each chunk <= chunkSize, order preserved") {
    for (n <- Seq(1, 7, 10, 23); chunkSize <- Seq(1, 3, 10)) {
      val (count, dir) = write(n, chunkSize)
      val expectChunks = (n + chunkSize - 1) / chunkSize
      assert(count == expectChunks, s"n=$n cs=$chunkSize")
      val all = (0L until count).flatMap { c =>
        val rows = readGz(new java.io.File(dir, s"$c.chunk.seq.gz"))
        assert(rows.size <= chunkSize)
        assert(rows.size == chunkSize || c == count - 1, "only the last chunk may be partial")
        rows
      }
      assert(all == (0 until n).map(i => s"row$i"), s"n=$n cs=$chunkSize order/content")
    }
  }
}
