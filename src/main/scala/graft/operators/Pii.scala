package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed PII detection and redaction over `documents(doc_id, text, ...)` —
  * the pre-release scrubbing stage every published training-data pipeline
  * runs (Dolma, FineWeb, ROOTS all mask emails / IP addresses / phone
  * numbers with typed placeholder tokens before packing). [[TextAnalysis]]'s
  * `txt_scrub` is the untyped digit-mask form; this is the typed form that
  * (a) counts findings per category so curation can gate on PII density and
  * (b) replaces each span with a category token so downstream tokenizers
  * see a stable vocabulary item instead of a hole.
  *
  * Every operator is a narrow per-row codegen'd projection (regexp over one
  * column — no shuffle, no UDF) followed by at most one aggregation: the
  * shape that scales linearly to 100 TB. The patterns avoid lookaround and
  * backreferences so Java util.regex (Spark) and RE2 (the DuckDB oracle)
  * parse them identically — the same cross-engine regex discipline as
  * [[Bpe]]'s pre-tokenizer.
  */
object Pii {

  /** One pattern per category, in REDACTION ORDER (emails first so an
    * address's host part can never be half-eaten by the IP rule — the
    * `1.2.3.4@mail.com` case, spec-pinned). All alternatives are
    * lookaround-free and backreference-free (the Java-regex/RE2
    * portability discipline); grouping is non-capturing `(?:…)` so both
    * engines' extract-all return the full match.
    *
    * `phone` covers three published shapes: international
    * `+D DDD DDD[D] DDDD`, US parenthesized `(DDD) DDD-DDDD`, and dashed
    * `DDD-DDD-DDDD` (disjoint from `ssn`'s 3-2-4 grouping — a dashed
    * phone can never half-match the SSN rule and vice versa).
    *
    * `ipv6` (r18) covers the full 8-group form PLUS the compressed `::`
    * forms as a BOUNDED enumeration over the compression point: k groups
    * before the `::` and at most `7 − k` after (k + m ≤ 7, so a >8-group
    * shape is never accepted — the trap of a naive greedy
    * `H(:H)*::H(:H)*`), plus the leading-`::` and trailing-`::` edges
    * (`::1`, `fe80::`). The text's own single-colon group count picks
    * exactly one k-alternative, and the edge forms sit LAST so the
    * longer both-sides match wins under first-match alternation
    * (identical preference order in Java regex and RE2). Bare `::` is
    * intentionally out (it would redact every C++ scope operator).
    * Single-colon shapes — times `12:30`, ratios `3:2` — can never
    * match (every alternative requires a `::`); spec-pinned.
    *
    * Known OVER-redaction edge (r18 ADVICE, documented + spec-pinned,
    * not fixed): the trailing-`::` alternative can match the
    * 7-group-plus-`::` PREFIX of an INVALID >8-group shape —
    * `1:2:3:4:5:6:7::8` redacts to `<IPV6>8`. An exact guard needs a
    * negative lookahead ("`::` not followed by a hex group when the
    * prefix already has 7"), and lookaround is exactly what the
    * cross-engine discipline forbids (RE2 has none). The failure mode
    * is over-redaction of a non-address — the safe direction for a
    * scrubber — and both engines match identically, so no oracle
    * asymmetry exists. */
  val patterns: Seq[(String, String)] = Seq(
    "email" -> """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
    "phone" -> ("""\+\d{1,2} \d{3} \d{3,4} \d{4}""" +
      """|\(\d{3}\) \d{3}-\d{4}""" +
      """|\b\d{3}-\d{3}-\d{4}\b"""),
    "ipv6" -> {
      val h = """[0-9a-fA-F]{1,4}"""
      val full = s"""\\b$h(?::$h){7}\\b"""
      val both = (1 to 6).map { k =>
        val pre = if (k == 1) s"\\b$h" else s"\\b$h(?::$h){${k - 1}}"
        val post = if (k == 6) h else s"$h(?::$h){0,${6 - k}}"
        s"$pre::$post\\b"
      }
      val lead = s"""::$h(?::$h){0,6}\\b"""
      val trail = s"""\\b$h(?::$h){0,6}::"""
      (full +: both :+ lead :+ trail).mkString("|")
    },
    "ip" -> """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""",
    "ssn" -> """\b\d{3}-\d{2}-\d{4}\b""",
    // card-number SHAPE (4-4-4-4 with uniform space/dash/none separators);
    // checksum validation is a scoring concern, not a redaction one —
    // published scrubbers mask on shape. Group lengths keep it disjoint
    // from every phone/ssn shape (3-x-y groupings).
    "cc" -> ("""\b\d{4} \d{4} \d{4} \d{4}\b""" +
      """|\b\d{4}-\d{4}-\d{4}-\d{4}\b""" +
      """|\b\d{16}\b"""))

  private def token(cat: String): String = s"<${cat.toUpperCase}>"

  private def countOf(pat: String): Column =
    size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")

  /** Column form of the typed redaction — for compositions that fold it
    * into an existing projection instead of a join ([[Curation.release]]). */
  def redactText(c: Column): Column =
    patterns.foldLeft(c) { case (e, (cat, pat)) =>
      regexp_replace(e, pat, token(cat))
    }

  /** Column form of the any-finding flag (0/1). */
  def anyPii(c: Column): Column =
    (patterns.map { case (_, pat) =>
      size(regexp_extract_all(c, lit(pat), lit(0))).cast("long")
    }.reduce(_ + _) > 0).cast("int")

  /** Per-document typed finding counts + an any-PII flag. */
  def detect(docs: DataFrame): DataFrame = {
    val counts = patterns.map { case (cat, pat) =>
      countOf(pat).as(s"n_$cat")
    }
    docs.select((col("doc_id") +: counts): _*)
      .withColumn("has_pii",
        (patterns.map(p => col(s"n_${p._1}")).reduce(_ + _) > 0).cast("int"))
  }

  /** Typed redaction: each category's spans replaced by its placeholder
    * token, applied in [[patterns]] order (deterministic — both engines
    * scan leftmost-first). */
  def redact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), redactText(col("text")).as("redacted"))

  /** Corpus-level PII prevalence by a grouping column — the report a
    * release gate reads (documents with PII per source, findings per
    * category, rate rounded to the contract's 6 decimals). */
  def stats(docs: DataFrame, by: String): DataFrame = {
    val perCat = patterns.map { case (cat, _) =>
      sum(col(s"n_$cat")).as(s"n_$cat")
    }
    detect(docs).join(docs.select(col("doc_id"), col(by)), Seq("doc_id"))
      .groupBy(col(by)).agg(
        count(lit(1)).as("n_docs"),
        (sum(col("has_pii").cast("long")).as("n_docs_pii") +:
          perCat :+
          round(sum(col("has_pii").cast("double")) / count(lit(1)), 6)
            .as("pii_rate")): _*)
  }

  // ---- oracle SQL builders ------------------------------------------------

  /** DuckDB rendering of [[detect]] over `corpusSql` (a parenthesized
    * (doc_id, text) SELECT). Single-quoted DuckDB literals pass
    * backslashes through to RE2 untouched. */
  def detectSql(corpusSql: String): String = {
    val counts = patterns.map { case (cat, pat) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$cat"
    }.mkString(",\n|   ")
    val any = patterns.map(p => s"n_${p._1}").mkString(" + ")
    s"""SELECT doc_id, $counts,
       |   CAST(($any) > 0 AS INT) AS has_pii
       | FROM $corpusSql""".stripMargin
  }

  /** DuckDB expression for the typed redaction of a text column —
    * exposed so composition oracles ([[Curation.releaseSql]]) can inline
    * it without re-deriving the pattern order. */
  def redactExprSql(textCol: String = "text"): String =
    patterns.foldLeft(textCol) { case (e, (cat, pat)) =>
      s"regexp_replace($e, '$pat', '${token(cat)}', 'g')"
    }

  /** DuckDB expression: 1 iff the text column holds any typed finding. */
  def anyPiiExprSql(textCol: String = "text"): String = {
    val counts = patterns
      .map { case (_, pat) => s"len(regexp_extract_all($textCol, '$pat'))" }
      .mkString(" + ")
    s"CASE WHEN ($counts) > 0 THEN 1 ELSE 0 END"
  }

  /** DuckDB rendering of [[redact]] over `corpusSql`. */
  def redactSql(corpusSql: String): String =
    s"""SELECT doc_id, ${redactExprSql()} AS redacted
       | FROM $corpusSql""".stripMargin

  /** DuckDB rendering of [[stats]] over `corpusSql` (must also carry the
    * `by` column). */
  def statsSql(corpusSql: String, by: String): String = {
    val perCat = patterns.map { case (cat, _) =>
      s"CAST(sum(det.n_$cat) AS BIGINT) AS n_$cat"
    }.mkString(",\n|   ")
    s"""WITH det AS (${detectSql(s"(SELECT doc_id, text FROM $corpusSql d)")})
       | SELECT c.$by, CAST(count(*) AS BIGINT) AS n_docs,
       |   CAST(sum(det.has_pii) AS BIGINT) AS n_docs_pii,
       |   $perCat,
       |   round(sum(det.has_pii) * 1.0 / count(*), 6) AS pii_rate
       | FROM $corpusSql c JOIN det ON c.doc_id = det.doc_id
       | GROUP BY 1""".stripMargin
  }
}
