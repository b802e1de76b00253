package graft

import graft.domain.Fixtures
import graft.operators.SharedLoci
import graft.sources._
import org.apache.spark.sql.functions._

/** Readers + validation rules (SURVEY §5.3) and the R15 allele-match
  * property battery (SURVEY §5.4 — exhaustive over the allele alphabet
  * rather than sampled, since the space is tiny). */
class LaserSourcesSpec extends TestBase {

  test("seq parse: tab-or-space tokenizer, loci array (R2, §1.2.1)") {
    val parsed = SeqReader.parse(Lines.of(spark, Fixtures.seqLines))
      .orderBy("idx").collect()
    assert(parsed.length == 3)
    assert(parsed.map(_.getString(1)).toSeq == Seq("POP1", "POP1", "POP2"))
    assert(parsed.map(_.getString(2)).toSeq == Seq("ind_001", "ind_002", "ind_003"))
    assert(parsed.forall(_.getLong(3) == 3L))
    val loci = parsed(0).getSeq[org.apache.spark.sql.Row](4)
    assert(loci.head.getDouble(0) == 2.0 && loci.head.getDouble(2) == 0.99)
  }

  test("seq validate: arity rules and group membership (R12, R13, R14)") {
    val groups = Lines.of(spark, Fixtures.groupsLines)
    val errs = SeqReader.validate(Lines.of(spark, Fixtures.badSeqLines),
      Some(GroupsReader.parse(groups))).collect().map(_.code).toSet
    assert(errs == Set("SEQ_FILE_TOO_FEW_COLUMNS", "SEQ_FILE_MISSING_COLUMNS",
      "SEQ_FILE_INCONSISTENT_COLUMNS", "SEQ_SAMPLE_NOT_IN_GROUP"))
    // a clean file yields no errors
    assert(SeqReader.validate(Lines.of(spark, Fixtures.seqLines),
      Some(GroupsReader.parse(groups))).isEmpty)
  }

  test("site header validation: positional, one code per column (R10)") {
    assert(SiteReader.validateHeader("CHR\tPOS\tID\tREF\tALT").isEmpty)
    assert(SiteReader.validateHeader("CHR\tPOS").map(_.code) ==
      Seq("SITE_FILE_TOO_FEW_COLUMNS"))
    assert(SiteReader.validateHeader("CHR\tPOS\tIDX\tREF\tALT").map(_.code) ==
      Seq("SITE_FILE_HEADER_NO_ID"))
    // first mismatching column wins
    assert(SiteReader.validateHeader("X\tY\tZ\tW\tV").map(_.code) ==
      Seq("SITE_FILE_HEADER_NO_CHR"))
  }

  test("groups validate: exactly two columns (R5)") {
    val errs = GroupsReader.validate(Lines.of(spark, Fixtures.badGroupsLines))
      .collect().map(e => (e.code, e.line)).toSet
    assert(errs == Set(("GROUPS_FILE_MISSING_COLUMNS", 2L), ("GROUPS_FILE_TOO_MANY_COLUMNS", 3L)))
  }

  test("panel parse: last occurrence wins on duplicate chr:pos (R4)") {
    val panel = PanelReader.parse(Lines.of(spark, Fixtures.slPanelLines))
      .orderBy("pos").collect().map(r => (r.getString(1), r.getString(2)))
    assert(panel.toMap.get("500").contains("T/T")) // A/C overwritten
    assert(panel.toMap.get("600").contains("g/C")) // T/T overwritten
  }

  test("shared loci: case-insensitive, order-sensitive (R15-R17)") {
    val row = SharedLoci.counts(
      SiteReader.parse(Lines.of(spark, Fixtures.slSiteLines)),
      PanelReader.parse(Lines.of(spark, Fixtures.slPanelLines))).collect()(0)
    assert(row.getLong(0) == 6L && row.getLong(1) == 3L)
  }

  test("property: allele match is case-insensitive, swap never matches (R15)") {
    // One Spark job over the full cross product instead of a job per case.
    val alleles = Seq("A", "C", "G", "T", "a", "c", "g", "t")
    val cases = for {
      ref <- alleles; alt <- alleles if !ref.equalsIgnoreCase(alt)
    } yield (ref, alt)
    val site = Lines.of(spark, "CHR\tPOS\tID\tREF\tALT" +: cases.zipWithIndex.map {
      case ((ref, alt), i) => s"1\t$i\tr\t$ref\t$alt" })
    val panelSame = Lines.of(spark, "CHR\tPOS\tID\tREF\tALT" +: cases.zipWithIndex.map {
      case ((ref, alt), i) => s"1\t$i\tx\t${ref.toUpperCase}\t${alt.toLowerCase}" })
    val panelSwap = Lines.of(spark, "CHR\tPOS\tID\tREF\tALT" +: cases.zipWithIndex.map {
      case ((ref, alt), i) => s"1\t$i\tx\t$alt\t$ref" })
    val same = SharedLoci.counts(SiteReader.parse(site), PanelReader.parse(panelSame)).collect()(0)
    val swap = SharedLoci.counts(SiteReader.parse(site), PanelReader.parse(panelSwap)).collect()(0)
    assert(same.getLong(1) == cases.size.toLong, "case-folded matches must all count as shared")
    assert(swap.getLong(1) == 0L, "swapped alleles must NOT count as shared")
  }

  test("vcf parse: meta/comment skip, 9 fixed fields, dynamic samples (R6)") {
    val parsed = VcfReader.parse(Lines.of(spark, Fixtures.vcfLines))
    assert(parsed.samples == Seq("ind_001", "ind_002"))
    val body = parsed.body.orderBy("chrom").collect()
    assert(body.length == 2) // '##' meta and '#stray' comment skipped
    assert(body(0).getSeq[String](body(0).fieldIndex("genotypes")) == Seq("0/1", "0/0"))
    // truncated body row: empty genotype array, not a negative-slice crash
    val truncated = VcfReader.parse(Lines.of(spark, Seq(
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1",
      "1\t10583\trs1\tG\tA")))
    val row = truncated.body.collect()(0)
    assert(row.getSeq[String](row.fieldIndex("genotypes")).isEmpty)
  }

  test("lines reader preserves file order and gzip sniff works (R1)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-lines").toFile
    val gz = new java.io.File(tmp, "t.seq.gz")
    val out = new java.io.PrintWriter(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gz)))
    (0 until 500).foreach(i => out.println(s"row$i"))
    out.close()
    val plain = new java.io.File(tmp, "t.txt")
    java.nio.file.Files.writeString(plain.toPath, "not gzip")
    assert(Lines.isGzip(spark, gz.getAbsolutePath))
    assert(!Lines.isGzip(spark, plain.getAbsolutePath))
    val lines = Lines.read(spark, gz.getAbsolutePath).orderBy("idx").collect()
    assert(lines.length == 500)
    assert(lines.zipWithIndex.forall { case (r, i) =>
      r.getLong(0) == i && r.getString(1) == s"row$i" })
  }
}
