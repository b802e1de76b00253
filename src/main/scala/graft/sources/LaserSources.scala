package graft.sources

import graft.domain.{Errors, ValidationError}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Readers + validators for the LASER input formats (`SURVEY.md §1.2`).
  *
  * Each reader splits into `parse` (lines → typed DataFrame) and `validate`
  * (lines → `Dataset[ValidationError]`). Validation is computed
  * set-at-a-time over one scan — the reference's row-at-a-time
  * short-circuiting (`LASERInputCheckMapper.java:121-144`) is reproduced at
  * the *reporting* layer by min-ordinal precedence (`Errors.firstError`).
  */
object SeqReader {

  /** Tab-OR-space tokenizer — unique to the seq format
    * (`LASERInputCheckMapper.java:105`); all other formats are tab-only. */
  private val sep = "[\t ]"

  private def toks: Column = split(col("line"), sep)

  /** lines(idx, line) → (idx, pop, indiv_id, n_loci, loci ARRAY<STRUCT<a,b,c>>).
    *
    * The variable-width "3 numeric fields per locus" convention
    * (`LASERInputCheckMapper.java:130-136`) becomes one ArrayType column:
    * locus i = tokens[2+3i .. 4+3i].
    */
  def parse(lines: DataFrame): DataFrame =
    // Arity-broken rows parse to NULL loci / n_loci instead of throwing
    // (ANSI element_at): validate() is the reporting channel for them, and
    // parse-derived aggregates must stay computable on mixed input.
    lines.select(
      col("idx"),
      expr("try_element_at(split(line, '[\\t ]'), 1)").as("pop"),
      expr("try_element_at(split(line, '[\\t ]'), 2)").as("indiv_id"),
      expr(
        """CASE WHEN size(split(line, '[\t ]')) >= 5
          |       AND (size(split(line, '[\t ]')) - 2) % 3 = 0
          |  THEN CAST((size(split(line, '[\t ]')) - 2) / 3 AS BIGINT) END""".stripMargin)
        .as("n_loci"),
      expr(
        """CASE WHEN size(split(line, '[\t ]')) >= 5
          |       AND (size(split(line, '[\t ]')) - 2) % 3 = 0
          |  THEN transform(sequence(0, CAST((size(split(line, '[\t ]')) - 2) / 3 AS INT) - 1),
          |    i -> named_struct(
          |      'a', CAST(element_at(split(line, '[\t ]'), 3 + i * 3) AS DOUBLE),
          |      'b', CAST(element_at(split(line, '[\t ]'), 4 + i * 3) AS DOUBLE),
          |      'c', CAST(element_at(split(line, '[\t ]'), 5 + i * 3) AS DOUBLE))) END""".stripMargin)
        .as("loci"))

  /** All seq-file rules (R12, R13, R14) over one scan + one small anti-join.
    *
    * - `< 5` columns → SEQ_FILE_TOO_FEW_COLUMNS (`:124-128`)
    * - `(n-2) % 3 != 0` → SEQ_FILE_MISSING_COLUMNS (`:130-134`)
    * - locus-count cardinality > 1 → SEQ_FILE_INCONSISTENT_COLUMNS (`:170-174`)
    * - individual ∉ groups → SEQ_SAMPLE_NOT_IN_GROUP (`:138-144`)
    */
  def validate(lines: DataFrame, groups: Option[DataFrame]): Dataset[ValidationError] = {
    val spark = lines.sparkSession
    import spark.implicits._

    val sized = lines.select(col("idx"), size(toks).as("n"),
      get(toks, lit(1)).as("indiv_id"))

    val arity = sized.flatMap { r =>
      val (idx, n) = (r.getLong(0), r.getInt(1))
      if (n < 5)
        Some(ValidationError("SEQ_FILE_TOO_FEW_COLUMNS", line = idx, detail = s"$n columns"))
      else if ((n - 2) % 3 != 0)
        Some(ValidationError("SEQ_FILE_MISSING_COLUMNS", line = idx, detail = s"$n columns"))
      else None
    }

    // Cardinality check only over rows that passed arity (the reference
    // records the locus count before failing mod-3 rows, but a failed row
    // aborts the scan, so only valid rows ever coexist in the TreeSet).
    val inconsistent = sized
      .where(col("n") >= 5 && (col("n") - 2) % 3 === 0)
      .agg(countDistinct(((col("n") - 2) / 3).cast("long")).as("k"))
      .as[Long]
      .flatMap(k => if (k > 1) Some(ValidationError("SEQ_FILE_INCONSISTENT_COLUMNS",
        detail = s"$k distinct locus counts")) else None)

    // Membership only over arity-valid rows (an arity-broken row aborts the
    // reference's scan before the group lookup, `:124-144`).
    val membership = groups match {
      case Some(g) =>
        sized.where(col("n") >= 5 && (col("n") - 2) % 3 === 0)
          .select("idx", "indiv_id")
          .join(broadcast(g.select(col("sample"))), col("indiv_id") === col("sample"), "left_anti")
          .select(col("idx"), col("indiv_id"))
          .map(r => ValidationError("SEQ_SAMPLE_NOT_IN_GROUP", line = r.getLong(0),
            detail = r.getString(1)))
      case None => spark.emptyDataset[ValidationError]
    }

    arity.union(inconsistent).union(membership)
  }

  /** Distinct individuals (INDIVIDUALS counter, `LASERInputCheckMapper.java:146,176`). */
  def individuals(lines: DataFrame): DataFrame =
    parse(lines).select(col("indiv_id")).distinct()
}

/** Study site file: gzip TSV with mandatory positional header
  * `CHR POS ID REF ALT` (`LASERInputCheckMapper.java:21-23,203-235`). */
object SiteReader {

  val header: Seq[String] = Seq("CHR", "POS", "ID", "REF", "ALT")

  /** Every code `validate` can emit — lets a merged multi-validator
    * summary answer "did the SITE file fail" without a separate job. */
  val codes: Set[String] =
    Set("SITE_FILE_TOO_FEW_COLUMNS") ++ header.map(h => s"SITE_FILE_HEADER_NO_$h")

  /** lines → (chr, pos, id, ref, alt); header row (idx 0) dropped; `pos`
    * stays STRING (the reference only ever string-concats `chr:pos`, `:243`). */
  def parse(lines: DataFrame): DataFrame = {
    val t = split(col("line"), "\t")
    lines.where(col("idx") > 0).select(
      t.getItem(0).as("chr"), get(t, lit(1)).as("pos"), get(t, lit(2)).as("id"),
      get(t, lit(3)).as("ref"), get(t, lit(4)).as("alt"))
  }

  /** Header rules (R10): `>= 5` columns then positional name equality, one
    * distinct error code per column, first mismatch wins (`:206-234`). */
  def validateHeader(headerLine: String): Seq[ValidationError] = {
    val fields = headerLine.split("\t", -1)
    if (fields.length < 5)
      Seq(ValidationError("SITE_FILE_TOO_FEW_COLUMNS", detail = s"${fields.length} columns"))
    else header.zipWithIndex.collectFirst {
      case (want, i) if fields(i) != want =>
        ValidationError(s"SITE_FILE_HEADER_NO_$want", detail = s"found '${fields(i)}'")
    }.toSeq
  }

  def validate(lines: DataFrame): Dataset[ValidationError] = {
    val spark = lines.sparkSession
    import spark.implicits._
    val head = lines.where(col("idx") === 0).select("line").as[String].collect()
    val errs = head.toSeq.flatMap(validateHeader)
    spark.createDataset(errs)
  }
}

/** Optional groups file: exactly two tab-separated columns, sample → group
  * (`LASERInputCheckMapper.java:74-98`). */
object GroupsReader {

  def parse(lines: DataFrame): DataFrame = {
    // get() not getItem(): a malformed 1-column line must surface through
    // validate() as GROUPS_FILE_MISSING_COLUMNS, not as an ANSI
    // INVALID_ARRAY_INDEX crash in whatever query touches the parse.
    val t = split(col("line"), "\t")
    lines.select(t.getItem(0).as("sample"), get(t, lit(1)).as("grp"))
  }

  def validate(lines: DataFrame): Dataset[ValidationError] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.select(col("idx"), size(split(col("line"), "\t")).as("n")).flatMap { r =>
      val (idx, n) = (r.getLong(0), r.getInt(1))
      if (n > 2) Some(ValidationError("GROUPS_FILE_TOO_MANY_COLUMNS", line = idx))
      else if (n < 2) Some(ValidationError("GROUPS_FILE_MISSING_COLUMNS", line = idx))
      else None
    }
  }
}

/** Reference ancestry panel: site layout, header skipped blindly
  * (`LASERInputCheckMapper.java:64`), duplicate `chr:pos` keys resolved
  * last-occurrence-wins (HashMap.put overwrite, `:66-69`).
  *
  * The reference ships the whole panel to every task's heap via the
  * distributed cache; the Spark-native equivalent is a deduped DataFrame
  * under a `broadcast()` hint — same data movement, but spillable and
  * planned (`SURVEY.md §4.2`).
  */
object PanelReader {

  /** lines → (chr, pos, alleles "REF/ALT"), last-wins deduped. */
  def parse(lines: DataFrame): DataFrame = {
    val t = split(col("line"), "\t")
    lines.where(col("idx") > 0)
      .select(col("idx"), t.getItem(0).as("chr"), get(t, lit(1)).as("pos"),
        concat_ws("/", get(t, lit(3)), get(t, lit(4))).as("alleles"))
      .groupBy("chr", "pos")
      .agg(max_by(col("alleles"), col("idx")).as("alleles"))
  }
}
