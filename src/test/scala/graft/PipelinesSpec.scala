package graft

import graft.domain.Fixtures
import graft.laser.LaserPipeline
import graft.sources.Lines
import graft.trace.TracePipeline

/** End-to-end workflow parity (SURVEY §3): error precedence, threshold
  * gates, counters, chunk side effects, format dispatch. */
class PipelinesSpec extends TestBase {

  private def lines(s: Seq[String]) = Lines.of(spark, s)

  test("laser: clean run reports counters, no error; gate fires on low shared loci") {
    val r = LaserPipeline.run(
      lines(Fixtures.seqLines), lines(Fixtures.siteLines),
      lines(Fixtures.slPanelLines), Some(lines(Fixtures.groupsLines)))
    assert(r.firstError.isEmpty)
    assert(r.individuals == 3 && r.totalLoci == 3 && r.chunks == 1)
    // 3 shared loci <= 100 → informative-PCA gate fires (R23)
    assert(r.gateMessages.exists(_.contains("Too few loci")))
    assert(!r.ok)
  }

  test("laser: error precedence — groups error outranks seq and site errors (R22)") {
    val r = LaserPipeline.run(
      lines(Fixtures.badSeqLines :+ "POP1"), lines(Fixtures.badSiteLines),
      lines(Fixtures.slPanelLines), Some(lines(Fixtures.badGroupsLines)))
    assert(r.firstError.map(_.name).contains("GROUPS_FILE_TOO_MANY_COLUMNS"))
    assert(r.firstError.map(_.message)
      .contains("Study groups file has line(s) with more than two columns!"))
  }

  test("laser: cross-file count check SITE_FILE_LOCI_NOT_IN_SEQ (R20)") {
    val shortSite = Seq("CHR\tPOS\tID\tREF\tALT", "1\t100\tr1\tG\tA")
    val r = LaserPipeline.run(
      lines(Fixtures.seqLines), lines(shortSite),
      lines(Fixtures.slPanelLines), None)
    assert(r.firstError.map(_.name).contains("SITE_FILE_LOCI_NOT_IN_SEQ"))
  }

  test("laser file run: gzip sniff precedes parsing (R1) and chunks are written (R19)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-laser").toFile
    def gzWrite(name: String, content: Seq[String]): String = {
      val f = new java.io.File(tmp, name)
      val out = new java.io.PrintWriter(new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(f)))
      content.foreach(out.println); out.close()
      f.getAbsolutePath
    }
    val seqGz = gzWrite("study.seq.gz", Fixtures.seqLines)
    val siteGz = gzWrite("study.site.gz", Fixtures.siteLines)
    val panelGz = gzWrite("panel.site.gz", Fixtures.slPanelLines)
    val notGz = new java.io.File(tmp, "plain.seq.gz")
    java.nio.file.Files.writeString(notGz.toPath, "POP1 ind_001 1 1 0.5")

    val bad = LaserPipeline.runFiles(spark, notGz.getAbsolutePath, siteGz, panelGz, None, None)
    assert(bad.firstError.map(_.name).contains("SEQ_FILE_IS_NOT_GZIP"))

    val chunksDir = new java.io.File(tmp, "chunks").getAbsolutePath
    val ok = LaserPipeline.runFiles(spark, seqGz, siteGz, panelGz, None,
      Some(chunksDir), chunkSize = 2)
    assert(ok.firstError.isEmpty)
    assert(ok.chunks == 2) // 3 rows, chunkSize 2 → full + partial
    assert(new java.io.File(chunksDir, "0.chunk.seq.gz").exists())
    assert(new java.io.File(chunksDir, "1.chunk.seq.gz").exists())
  }

  test("laser: pathological input — counts complete, samples bounded (no full collect)") {
    // 10k broken seq rows (1 column each) + 5k group-membership misses: the
    // driver-side Result must carry the COMPLETE per-code tally but only a
    // capped sample list — the 100 TB contract for the error channel.
    val badSeq = (0 until 10000).map(i => s"only_one_col_$i") ++
      (0 until 5000).map(i => s"POP1\tghost_$i\t1\t1\t0.5")
    val groups = Seq("ind_001\tPOP1")
    val r = LaserPipeline.run(
      lines(badSeq), lines(Fixtures.siteLines),
      lines(Fixtures.slPanelLines), Some(lines(groups)))
    assert(r.errorCounts("SEQ_FILE_TOO_FEW_COLUMNS") == 10000L)
    assert(r.errorCounts("SEQ_SAMPLE_NOT_IN_GROUP") == 5000L)
    assert(r.firstError.map(_.name).contains("SEQ_FILE_TOO_FEW_COLUMNS"))
    // bounded: ≤ 10 samples per code, not 15k findings
    assert(r.errors.size <= 10 * r.errorCounts.size,
      s"expected bounded samples, got ${r.errors.size}")
    assert(r.errors.count(_.code == "SEQ_FILE_TOO_FEW_COLUMNS") == 10)
    assert(r.errors.count(_.code == "SEQ_SAMPLE_NOT_IN_GROUP") == 10)
    // sample list is deterministically ordered (collect_list arrival order
    // is not) — the bit-reproducibility contract extends to Result.errors
    val key = (e: graft.domain.ValidationError) => (e.ordinal, e.file, e.line, e.detail)
    assert(r.errors.map(key) == r.errors.map(key).sorted)
  }

  test("trace: per-file stats, cross-file individual agreement gate (R23)") {
    val vcf2 = Seq(
      "##fileformat=VCFv4.2",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tonly_one",
      "1\t100\trs1\tG\tA\t90\tPASS\t.\tGT\t0/1")
    val r = TracePipeline.run(
      Seq("f1.vcf.gz" -> lines(Fixtures.vcfLines), "f2.vcf.gz" -> lines(vcf2)),
      lines(Fixtures.slPanelLines), None)
    assert(r.firstError.isEmpty)
    assert(r.perFile.map(_.individuals) == Seq(2L, 1L))
    assert(r.gateMessages.exists(_.contains("different number of individuals")))
  }

  test("trace: one-pass multi-file — errored, clean, and empty-body files coexist") {
    val clean = Fixtures.vcfLines
    val emptyBody = Seq(
      "##fileformat=VCFv4.2",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tind_001\tind_002")
    val badHeader = Seq("##meta only, no header at all")
    val r = TracePipeline.run(
      Seq("ok.vcf.gz" -> lines(clean), "empty.vcf.gz" -> lines(emptyBody),
        "bad.vcf.gz" -> lines(badHeader)),
      lines(Fixtures.slPanelLines), None)
    assert(r.firstError.map(_.name).contains("VCF_NO_HEADER"))
    assert(r.errors.exists(e => e.code == "VCF_NO_HEADER" && e.file == "bad.vcf.gz"))
    val byId = r.perFile.map(s => s.fileId -> s).toMap
    // clean file: counted; empty-body file: header-derived individuals,
    // zero loci; errored file: all zero
    assert(byId("ok.vcf.gz").individuals == 2 && byId("ok.vcf.gz").totalLoci == 2)
    assert(byId("empty.vcf.gz").individuals == 2 && byId("empty.vcf.gz").totalLoci == 0)
    assert(byId("bad.vcf.gz") == TracePipeline.FileStats("bad.vcf.gz", 0, 0, 0))
    // order preserved from the input file list
    assert(r.perFile.map(_.fileId) == Seq("ok.vcf.gz", "empty.vcf.gz", "bad.vcf.gz"))
  }

  test("trace: empty file list yields a clean gated Result, not a crash") {
    val r = TracePipeline.run(Seq.empty, lines(Fixtures.slPanelLines), None)
    assert(r.firstError.isEmpty && r.perFile.isEmpty)
    assert(r.gateMessages.exists(_.contains("Too few loci")))
    assert(!r.ok)
  }

  test("trace: format dispatch — stubs accepted, unknown rejected (R7)") {
    val ok = TracePipeline.run(Seq("a" -> lines(Fixtures.vcfLines)),
      lines(Fixtures.slPanelLines), None, format = "23andMe")
    assert(ok.firstError.isEmpty) // honest stub: accepted without validation
    val bad = TracePipeline.run(Seq("a" -> lines(Fixtures.vcfLines)),
      lines(Fixtures.slPanelLines), None, format = "plink")
    assert(bad.firstError.map(_.name).contains("FILE_FORMAT_NOT_SUPPORTED"))
  }

  test("trace: VCF header validation precedence (R11)") {
    val noSamples = Seq("##x", "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT")
    val r = TracePipeline.run(Seq("f" -> lines(noSamples)),
      lines(Fixtures.slPanelLines), None)
    assert(r.firstError.map(_.name).contains("VCF_HEADER_NO_SAMPLES"))
    val noHeader = Seq("##only meta")
    val r2 = TracePipeline.run(Seq("f" -> lines(noHeader)),
      lines(Fixtures.slPanelLines), None)
    assert(r2.firstError.map(_.name).contains("VCF_NO_HEADER"))
  }

  test("trace job generation: batch descriptor pairs (R25)") {
    val jobs = TracePipeline.generateJobs(spark, nIndividuals = 250, batchSize = 100,
      "HGDP", "HGDP.pc", "study.vcf.gz", "study.geno", 4, 20)
    val rows = jobs.orderBy("key").collect()
    assert(rows.length == 3) // 3 batches, each carrying a vcf2geno + study-PCA pair
    val last = rows.last
    assert(last.getAs[String]("vcf2geno_json").contains("\"start\":201"))
    assert(last.getAs[String]("study_pca_json").contains("\"end\":250"))
    assert(last.getAs[String]("study_pca_json").contains("\"batch\":\"00002\""))
  }
}
