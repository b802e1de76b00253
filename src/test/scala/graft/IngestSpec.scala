package graft

import graft.operators.DemuxSink
import graft.sources.Ingest

class IngestSpec extends TestBase {

  import spark.implicits._

  test("sftp url parse (R31)") {
    assert(Ingest.parseSftpUrl("sftp://host.edu/data/in;bob;pw") ==
      Some(("host.edu", "/data/in", "bob", "pw")))
    assert(Ingest.parseSftpUrl("http://x/y;a;b").isEmpty)
    assert(Ingest.parseSftpUrl("sftp://nohostpath;a;b").isEmpty)
    assert(Ingest.parseSftpUrl("sftp://h/p").isEmpty)
  }

  test("staging: glob select, single-file select, empty error (R8, R9)") {
    val src = java.nio.file.Files.createTempDirectory("graft-ingest-src")
    val dst = java.nio.file.Files.createTempDirectory("graft-ingest-dst")
    Seq("a.vcf.gz", "b.vcf.gz", "c.txt").foreach(n =>
      java.nio.file.Files.writeString(src.resolve(n), s"content-$n"))
    val t = new Ingest.LocalFs

    val staged = Ingest.stage(t, s"$src/*.vcf.gz", dst.toString)
    assert(staged.map(_.map(p => java.nio.file.Paths.get(p).getFileName.toString)) ==
      Right(Seq("a.vcf.gz", "b.vcf.gz")))

    val single = Ingest.stage(t, s"$src/c.txt", dst.toString)
    assert(single.exists(_.size == 1))

    val none = Ingest.stage(t, s"$src/*.nope", dst.toString)
    assert(none.isLeft)
  }

  test("gzip -> parquet re-encode preserves lines, order, and provenance") {
    val src = java.nio.file.Files.createTempDirectory("graft-reencode")
    def gz(name: String, lines: Seq[String]): String = {
      val f = src.resolve(name)
      val out = new java.io.PrintWriter(new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(f.toFile)))
      lines.foreach(out.println); out.close()
      f.toString
    }
    val f1 = gz("x.seq.gz", (0 until 50).map(i => s"x$i"))
    val f2 = gz("y.seq.gz", (0 until 30).map(i => s"y$i"))
    val out = src.resolve("parquet").toString
    val df = Ingest.gzipToParquet(spark, Seq(f1, f2), out)
    assert(df.count() == 80)
    val xs = df.where($"src" === f1).orderBy("idx")
      .select("line").as[String].collect()
    assert(xs.toSeq == (0 until 50).map(i => s"x$i"))
  }

  test("demux write: exact file names and routed contents (R26)") {
    val out = java.nio.file.Files.createTempDirectory("graft-demux").toString
    val kv = Seq(("1", "a\tb"), ("2", "a\tb\tc"), ("3", "x")).toDF("key", "value")
    DemuxSink.write(kv, out)
    def read(n: String) = {
      val f = java.nio.file.Paths.get(out, n)
      if (java.nio.file.Files.exists(f))
        scala.io.Source.fromFile(f.toFile).getLines().toSeq.sorted
      else Seq.empty
    }
    assert(read("reference_pc_var.txt") == Seq("1\ta\tb", "3\tx"))
    assert(read("reference_pc.txt") == Seq("2\ta\tb\tc"))
  }
}
