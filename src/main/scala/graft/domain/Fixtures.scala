package graft.domain

/** Inline domain fixtures (mirrors `FIXTURES.md §A`): tiny, deterministic,
  * and embedded in both the Spark programs and the DuckDB oracle SQL so the
  * driver's hash gate checks the *semantics* of the domain readers and
  * operators without needing domain files at the scale-factor dir.
  */
object Fixtures {

  /** A1: tab-OR-space separated, 3 loci per row. */
  val seqLines: Seq[String] = Seq(
    "POP1 ind_001 2 1 0.99 0 0 0.00 1 1 0.50",
    "POP1\tind_002\t2 2 1.00\t1 0 0.25\t0 1 0.75",
    "POP2 ind_003 1 1 0.10 2 0 0.80 0 0 0.30")

  /** A2: site with valid header, 3 rows = seq locus count. */
  val siteLines: Seq[String] = Seq(
    "CHR\tPOS\tID\tREF\tALT",
    "1\t10583\trs58108140\tG\tA",
    "1\t10611\trs189107123\tC\tG",
    "22\t16050075\trs587697622\tA\tG")

  /** A4: groups covering the seq individuals. */
  val groupsLines: Seq[String] = Seq(
    "ind_001\tCEU", "ind_002\tYRI", "ind_003\tCEU")

  /** Shared-loci scenario (A3 semantics): exact match, case-insensitive
    * match, swapped alleles (NOT shared), absent locus, and two duplicated
    * panel keys exercising last-wins in both directions. Expected:
    * total = 6, shared = 3. */
  val slSiteLines: Seq[String] = Seq(
    "CHR\tPOS\tID\tREF\tALT",
    "1\t100\tr1\tG\tA", //  panel G/A       → shared (exact)
    "1\t200\tr2\tC\tG", //  panel c/g       → shared (case-insensitive)
    "1\t300\tr3\tA\tG", //  panel G/A       → NOT shared (order-sensitive)
    "1\t400\tr4\tT\tC", //  absent          → NOT shared
    "1\t500\tr5\tA\tC", //  dup: A/C then T/T → last wins → NOT shared
    "1\t600\tr6\tG\tC") //  dup: T/T then g/C → last wins → shared

  val slPanelLines: Seq[String] = Seq(
    "CHR\tPOS\tID\tREF\tALT",
    "1\t100\tx\tG\tA",
    "1\t200\tx\tc\tg",
    "1\t300\tx\tG\tA",
    "1\t500\tx\tA\tC",
    "1\t500\ty\tT\tT",
    "1\t600\tx\tT\tT",
    "1\t600\ty\tg\tC",
    "1\t700\tx\tG\tG")

  /** DuckDB VALUES mirror of slSiteLines / slPanelLines for the semantic
    * (not golden) shared-loci oracle. */
  val slSiteValues: String =
    "('1','100','G','A'),('1','200','C','G'),('1','300','A','G')," +
      "('1','400','T','C'),('1','500','A','C'),('1','600','G','C')"
  val slPanelValues: String =
    "(1,'1','100','G','A'),(2,'1','200','c','g'),(3,'1','300','G','A')," +
      "(4,'1','500','A','C'),(5,'1','500','T','T'),(6,'1','600','T','T')," +
      "(7,'1','600','g','C'),(8,'1','700','G','G')"

  /** Broken inputs — one per wired LASER validation rule. */
  val badGroupsLines: Seq[String] = Seq(
    "ind_001\tCEU", "ind_005\tCEU", "orphan", "a\tb\tc")
  val badSeqLines: Seq[String] = Seq(
    "POP1 ind_001 2 1 0.99",        // valid, 1 locus
    "POP1 ind_404 1 0 0.5",         // valid arity, not in groups
    "POP1 bad 1 2",                 // 4 cols → TOO_FEW
    "POP1 bad2 1 2 3 4",            // (6-2)%3 ≠ 0 → MISSING
    "POP1 ind_005 1 1 0.5 2 2 0.5") // 2 loci → INCONSISTENT (vs 1)
  val badSiteLines: Seq[String] = Seq(
    "CHR\tPOS\tIDX\tREF\tALT", // wrong 3rd column → HEADER_NO_ID
    "1\t100\tr1\tG\tA")

  /** A5: VCF with meta lines, header, a mid-body comment line. */
  val vcfLines: Seq[String] = Seq(
    "##fileformat=VCFv4.2",
    "##source=fixture",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tind_001\tind_002",
    "1\t10583\trs58108140\tG\tA\t100\tPASS\t.\tGT\t0/1\t0/0",
    "#stray comment line",
    "22\t16050075\trs587697622\tA\tG\t95\tPASS\t.\tGT\t1/1\t0/1")

  /** R26 demux rows. */
  val demuxRows: Seq[(String, String)] = Seq(
    ("1", "a\tb"), ("2", "a\tb\tc"), ("3", "x"))
}
