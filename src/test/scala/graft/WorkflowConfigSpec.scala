package graft

import graft.domain.Fixtures
import graft.laser.LaserPipeline
import graft.operators.ChunkSink
import graft.sources.{Lines, WorkflowConfig}

/** R28 (yaml `version:` scan + panel path derivation) and R29 (post-chunk
  * delete of the original seq file, gated on success). */
class WorkflowConfigSpec extends TestBase {

  test("R28: version scan matches the reference's line-by-line semantics") {
    // plain match
    assert(WorkflowConfig.parseVersion(Seq("name: laser", "version: 1.2.3")) == Some("1.2.3"))
    // whitespace around the value is trimmed (split on trimmed line + trim)
    assert(WorkflowConfig.parseVersion(Seq("version:   v4  ")) == Some("v4"))
    // LAST matching line wins (reference loop keeps overwriting)
    assert(WorkflowConfig.parseVersion(Seq("version: a", "version: b")) == Some("b"))
    // a 3-part split is skipped, but an EARLIER match survives
    assert(WorkflowConfig.parseVersion(Seq("version: a", "version:1:0")) == Some("a"))
    // leading whitespace defeats startsWith (untrimmed check in reference)
    assert(WorkflowConfig.parseVersion(Seq("  version: x")) == None)
    // nothing matched → None (reference errors out)
    assert(WorkflowConfig.parseVersion(Seq("name: laser")) == None)
    assert(WorkflowConfig.parseVersion(Seq("version:")) == None)
  }

  test("R28: references dir + panel site path derivation") {
    // Hadoop Path resolves the ../../../ hops (same class the reference
    // uses): three levels up from the job temp dir, into apps/.
    val dir = WorkflowConfig.referencesDir("/tmp/jobs/j1/temp", "laser", "1.0.1")
    assert(dir == "/tmp/apps/laser@1.0.1/1.0.1/references")
    assert(WorkflowConfig.panelSitePath(dir, "HGDP") == s"$dir/HGDP.site.gz")
    val tdir = WorkflowConfig.referencesDir("/t", "trace", "2")
    assert(tdir.contains("apps/trace@2/2/references"))
  }

  test("R29: writeAndDeleteSource deletes the original only after a successful write") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-r29").toFile
    val seq = new java.io.File(tmp, "study.seq.gz")
    java.nio.file.Files.writeString(seq.toPath, "placeholder")
    val lines = Lines.of(spark, Seq("l0", "l1", "l2"))

    // success: chunks written, original gone
    val outDir = new java.io.File(tmp, "chunks").getAbsolutePath
    val n = ChunkSink.writeAndDeleteSource(lines, seq.getAbsolutePath, outDir, chunkSize = 2)
    assert(n == 2)
    assert(new java.io.File(outDir, "0.chunk.seq.gz").exists())
    assert(!seq.exists(), "original seq file must be deleted after successful chunking")

    // failure: out dir nested under a regular FILE → write throws → original kept
    val seq2 = new java.io.File(tmp, "study2.seq.gz")
    java.nio.file.Files.writeString(seq2.toPath, "placeholder")
    val blocker = new java.io.File(tmp, "blocker.txt")
    java.nio.file.Files.writeString(blocker.toPath, "i am a file")
    intercept[Exception] {
      ChunkSink.writeAndDeleteSource(lines, seq2.getAbsolutePath,
        new java.io.File(blocker, "chunks").getAbsolutePath, chunkSize = 2)
    }
    assert(seq2.exists(), "a failed chunk write must leave the original in place")
  }

  test("R24: distributed descriptor write — exact names, key-TSV-JSON framing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-desc").toString
    graft.domain.Descriptors.writeKeyed(
      graft.domain.Descriptors.laserStudyPca(spark, chunks = 3, "/chunks",
        "study.site.gz", "HGDP", "HGDP.pc", 4, 20), dir)
    val f1 = java.nio.file.Paths.get(dir, "1.batch")
    assert(java.nio.file.Files.exists(f1), "each descriptor writes its exact file name")
    val content = java.nio.file.Files.readString(f1)
    assert(content == "1\t" + """{"reference":"HGDP","reference_pc":"HGDP.pc","seq":"/chunks/1.chunk.seq.gz","site":"study.site.gz","dim":4,"dim_high":20}""" + "\n")
    assert((0 until 3).forall(i =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, s"$i.batch"))))
  }

  test("writeKeyed commits via temp+rename: no temp residue, re-run overwrites") {
    val dir = java.nio.file.Files.createTempDirectory("graft-desc-commit").toString
    val df = graft.domain.Descriptors.laserStudyPca(spark, chunks = 2, "/chunks",
      "s.site.gz", "REF", "REF.pc", 4, 20)
    graft.domain.Descriptors.writeKeyed(df, dir)
    // second run renames onto EXISTING exact names — the retried/speculative
    // attempt path; must replace, not fail, and must leave no .tmp behind
    graft.domain.Descriptors.writeKeyed(df, dir)
    // ignore Hadoop LocalFileSystem's .crc checksum sidecars (present with
    // the pre-fix direct-create writer too); what matters is that the exact
    // names exist and no .tmp intermediate survives the commit
    val names = new java.io.File(dir).list().toSet.filterNot(_.endsWith(".crc"))
    assert(names == Set("0.batch", "1.batch"), s"unexpected files: $names")
    val content = java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "0.batch"))
    assert(content.startsWith("0\t") && content.endsWith("\n"))
  }

  test("R29: runFiles deletes the seq file only when every gate passes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-r29-e2e").toFile
    def gzWrite(name: String, content: Seq[String]): String = {
      val f = new java.io.File(tmp, name)
      val out = new java.io.PrintWriter(new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(f)))
      content.foreach(out.println); out.close()
      f.getAbsolutePath
    }
    // >100 shared loci so the informative-PCA gate passes (R23)
    val nLoci = 150
    val siteRows = (0 until nLoci).map(i => s"1\t${100 + i}\tr$i\tG\tA")
    val seqLine = "POP1 ind_001 " + Seq.fill(nLoci)("1 1 0.5").mkString(" ")
    val seqGz = gzWrite("study.seq.gz", Seq(seqLine))
    val siteGz = gzWrite("study.site.gz", "CHR\tPOS\tID\tREF\tALT" +: siteRows)
    val panelGz = gzWrite("panel.site.gz", "CHR\tPOS\tID\tREF\tALT" +: siteRows)

    val chunks = new java.io.File(tmp, "chunks").getAbsolutePath
    val r = LaserPipeline.runFiles(spark, seqGz, siteGz, panelGz, None,
      Some(chunks), chunkSize = 100, deleteSeqAfterChunks = true)
    assert(r.ok, s"expected clean run, got ${r.firstError} / ${r.gateMessages}")
    assert(r.sharedLoci == nLoci)
    assert(!new java.io.File(seqGz).exists(),
      "seq file must be deleted after a fully successful run")

    // post-gate descriptor emission (reference-PCA + one study-PCA per chunk)
    val refJobs = new java.io.File(tmp, "refjobs").getAbsolutePath
    val studyJobs = new java.io.File(tmp, "studyjobs").getAbsolutePath
    assert(LaserPipeline.emitJobs(spark, r, chunks, siteGz, "HGDP", "HGDP.pc",
      4, 20, refJobs, studyJobs))
    assert(new java.io.File(refJobs, "reference_pca_job.batch").exists())
    assert((0L until r.chunks).forall(i =>
      new java.io.File(studyJobs, s"$i.batch").exists()))
    // gated: a not-ok result writes nothing
    val gatedDir = new java.io.File(tmp, "gated").getAbsolutePath
    assert(!LaserPipeline.emitJobs(spark, r.copy(sharedLoci = 0), chunks, siteGz,
      "HGDP", "HGDP.pc", 4, 20, gatedDir, gatedDir))
    assert(!new java.io.File(gatedDir).exists())

    // gated run (shared loci <= 100 on the small fixtures) → seq kept
    val seqGz2 = gzWrite("study2.seq.gz", Fixtures.seqLines)
    val siteGz2 = gzWrite("study2.site.gz", Fixtures.siteLines)
    val panelGz2 = gzWrite("panel2.site.gz", Fixtures.slPanelLines)
    val r2 = LaserPipeline.runFiles(spark, seqGz2, siteGz2, panelGz2, None,
      Some(new java.io.File(tmp, "chunks2").getAbsolutePath),
      deleteSeqAfterChunks = true)
    assert(!r2.ok)
    assert(new java.io.File(seqGz2).exists(),
      "a gated (not-ok) run must NOT delete the seq file")
  }
}
