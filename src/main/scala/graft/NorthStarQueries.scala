package graft

import graft.operators.{Bpe, Dedup, Multimodal, Retrieval, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** North-star extension queries (`BASELINE.json:6`): dedup, similarity
  * search, text analysis, multimodal — over the driver's `documents` /
  * `embeddings` tables.
  *
  * Dedup queries *plant* deterministic duplicates inside the query — the
  * identical planting appears in the oracle SQL, keeping the checked
  * result non-degenerate while exercising the real operator. The planting
  * does NOT assume the corpus is dup-free: any natural duplicates flow
  * through the same operator and the same oracle SQL, so results stay
  * hash-equal either way. Measured against the 2026-08 regenerated
  * testdata: sf0.001/sf0.01 have 0 natural exact-dup groups; sf0.1 has 8
  * (4,992/5,000 distinct texts) and is heavily template-overlapped (mean
  * word-3-gram shingle shared by ~9.6 docs, hottest by 25) — the
  * dup-dense candidate regime the dedup-first compositions were built
  * for. Max cross-pair embedding cosine ≈ 0.51 at sf0.01.
  *
  * Documented corpus assumptions the oracles rely on (re-verified against
  * the regenerated generator output): document text is ASCII at all three
  * SFs (mm_* oracles count characters where the engine counts payload
  * bytes — equal only for ASCII); vec_ids are dense from 0 (sim_ivf
  * centroids/query selection; 0..499 at sf0.01, 0..1999 at sf0.1);
  * events have no duplicate (user_id, ts) pairs (q29 tie resolution).
  */
object NorthStarQueries {

  /** documents ∪ exact copies of doc_id < 20 (shifted ids). */
  private def plantedExact(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionAll(d.where(col("doc_id") < 20)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }
  private val plantedExactSql =
    """corpus AS (SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 20)""".stripMargin

  /** documents ∪ near-copies (one appended token) of doc_id < 20. */
  private def plantedNear(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionAll(d.where(col("doc_id") < 20)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text")))
  }
  private val plantedNearSql =
    """corpus AS (SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 100000, text || ' extra' FROM documents WHERE doc_id < 20)""".stripMargin

  /** Shared dHash oracle chain, `f(id, key, delta, spot)` → `bt(id, gy,
    * byte)`: replays `Multimodal.syntheticImageVariants`' pixel formula
    * (`(key·31 + x·7 + y·13 + c·5 + spot@origin) % 255 + delta`), the 9×8
    * nearest-neighbor downsample (`(g·dim)//grid`), integer grayscale
    * ((R+G+B)//3) and the per-row gradient byte (bit gx set iff
    * gray(gx) < gray(gx+1)) — the full dHash, byte-exact by formula. */
  private val phashByteSql =
    """ g AS (SELECT id, key, delta, spot, key % 13 + 3 AS w, key % 7 + 2 AS h FROM f),
      | px AS (SELECT g.id, g.key, g.delta, g.spot,
      |          gx.gx AS gx, gy.gy AS gy,
      |          (gx.gx * g.w) // 9 AS sx, (gy.gy * g.h) // 8 AS sy
      |        FROM g JOIN range(0, 9) gx(gx) ON true JOIN range(0, 8) gy(gy) ON true),
      | gr AS (SELECT id, gx, gy,
      |          (  ((key*31 + sx*7 + sy*13 + 0  + CASE WHEN sx = 0 AND sy = 0 THEN spot ELSE 0 END) % 255) + delta
      |           + ((key*31 + sx*7 + sy*13 + 5  + CASE WHEN sx = 0 AND sy = 0 THEN spot ELSE 0 END) % 255) + delta
      |           + ((key*31 + sx*7 + sy*13 + 10 + CASE WHEN sx = 0 AND sy = 0 THEN spot ELSE 0 END) % 255) + delta) // 3 AS gray
      |        FROM px),
      | bt AS (SELECT a.id, a.gy, sum(CASE WHEN a.gray < b.gray THEN 1 << a.gx ELSE 0 END) AS byte
      |        FROM gr a JOIN gr b ON a.id = b.id AND a.gy = b.gy AND b.gx = a.gx + 1
      |        WHERE a.gx < 8 GROUP BY 1, 2)""".stripMargin

  /** The audio-dedup fixture corpus: 24 originals + 12 gain-×2 twins +
    * one single-sample DROPOUT of key 7 (index 25 zeroed — inside key 7's
    * 34 interleaved samples; it empties one energy window and flips
    * exactly one gradient bit), all through the real
    * WAV codec. Mirrors the `fa` CTE of the mm_audio_* oracles. */
  private def audioVariantCorpus(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[graft.operators.MediaRow] = {
    val d = Tables(s, dir, "documents")
    Multimodal.syntheticAudioVariants(
      d.where(col("doc_id") < 24)
        .select(col("doc_id"), col("doc_id").as("key"),
          lit(1).as("gain"), lit(0).as("retouch"))
        .unionAll(d.where(col("doc_id") < 12)
          .select((col("doc_id") + 100000).as("doc_id"),
            col("doc_id").as("key"), lit(2).as("gain"), lit(0).as("retouch")))
        .unionAll(d.where(col("doc_id") === 7)
          .select(lit(200007L).as("doc_id"), col("doc_id").as("key"),
            lit(1).as("gain"), lit(25).as("retouch"))))
  }

  /** Shared DuckDB CTE chain recomputing `Multimodal.audioFingerprint64`
    * from the `syntheticAudioVariants` sample formula (the phashByteSql
    * treatment for the audio modality): geometry from `key`, samples
    * `base·gain (+5000 at `retouch`)`, 65 window energies by the
    * `idx·65 // n` assignment, gradient bits packed 8 per byte (bit
    * `b%8` within byte `b//8` — the engine's `1L << w` order, so hex is
    * string_agg ORDER BY g DESC). Expects `fa(id, key, gain, retouch)`. */
  private val afpByteSql =
    """ ga AS (SELECT id, key, gain, retouch,
      |          CAST(key % 2 + 1 AS BIGINT) AS ch,
      |          CAST(key % 50 + 10 AS BIGINT) AS frames FROM fa),
      | sm AS (SELECT g.id, s.s AS idx, g.ch * g.frames AS n,
      |          CASE WHEN g.retouch > 0 AND s.s = g.retouch THEN 0
      |            ELSE (((g.key*31 + (s.s // g.ch)*7 + (s.s % g.ch)*13) % 16000) - 8000) * g.gain
      |          END AS v
      |        FROM ga g JOIN range(0, 120) s(s) ON s.s < g.ch * g.frames),
      | ea AS (SELECT id, (idx * 65) // n AS w, sum(CAST(v AS BIGINT) * v) AS e
      |        FROM sm GROUP BY 1, 2),
      | eg AS (SELECT g.id, w.w AS w, coalesce(ea.e, 0) AS e
      |        FROM ga g CROSS JOIN range(0, 65) w(w)
      |        LEFT JOIN ea ON ea.id = g.id AND ea.w = w.w),
      | abit AS (SELECT a.id, a.w AS b, CASE WHEN nx.e > a.e THEN 1 ELSE 0 END AS bit
      |          FROM eg a JOIN eg nx ON nx.id = a.id AND nx.w = a.w + 1
      |          WHERE a.w < 64),
      | abt AS (SELECT id, b // 8 AS g, sum(bit << (b % 8)) AS byte
      |         FROM abit GROUP BY 1, 2)""".stripMargin

  /** `afpByteSql` for the MULTI-DROPOUT generator
    * (`Multimodal.syntheticAudioDropouts`): the sample at interleaved
    * index `(j·n)//(nd+1)` is zeroed for each j in 1..nd (n = ch·frames);
    * everything else is the variant formula verbatim. Expects
    * `fa(id, key, gain, nd)`. */
  private val afpDropByteSql =
    """ ga AS (SELECT id, key, gain, nd,
      |          CAST(key % 2 + 1 AS BIGINT) AS ch,
      |          CAST(key % 50 + 10 AS BIGINT) AS frames FROM fa),
      | sm AS (SELECT g.id, s.s AS idx, g.ch * g.frames AS n,
      |          CASE WHEN EXISTS (SELECT 1 FROM range(1, 17) j(j)
      |                 WHERE j <= g.nd
      |                   AND s.s = (j * g.ch * g.frames) // (g.nd + 1)) THEN 0
      |            ELSE (((g.key*31 + (s.s // g.ch)*7 + (s.s % g.ch)*13) % 16000) - 8000) * g.gain
      |          END AS v
      |        FROM ga g JOIN range(0, 120) s(s) ON s.s < g.ch * g.frames),
      | ea AS (SELECT id, (idx * 65) // n AS w, sum(CAST(v AS BIGINT) * v) AS e
      |        FROM sm GROUP BY 1, 2),
      | eg AS (SELECT g.id, w.w AS w, coalesce(ea.e, 0) AS e
      |        FROM ga g CROSS JOIN range(0, 65) w(w)
      |        LEFT JOIN ea ON ea.id = g.id AND ea.w = w.w),
      | abit AS (SELECT a.id, a.w AS b, CASE WHEN nx.e > a.e THEN 1 ELSE 0 END AS bit
      |          FROM eg a JOIN eg nx ON nx.id = a.id AND nx.w = a.w + 1
      |          WHERE a.w < 64),
      | abt AS (SELECT id, b // 8 AS g, sum(bit << (b % 8)) AS byte
      |         FROM abit GROUP BY 1, 2)""".stripMargin

  /** The `phashByteSql` treatment for the MULTI-SPOT generator
    * (`Multimodal.syntheticImageMultiSpot`): source pixel (x, y) takes
    * `+spot` (inside the mod-255 wrap, per channel; no delta) iff some
    * j < nd has `x = (j·w)//9 ∧ y = ((j·8//nd)·h)//8` — EXISTS, not
    * additive, matching the engine's set semantics on colliding grid
    * cells. Expects `f(id, key, spot, nd)`; emits `bt(id, gy, byte)`. */
  private val phashMultiSpotSql =
    """ g AS (SELECT id, key, spot, nd, key % 13 + 3 AS w, key % 7 + 2 AS h FROM f),
      | px AS (SELECT g.id, g.key, g.spot, g.nd, g.w AS w, g.h AS h,
      |          gx.gx AS gx, gy.gy AS gy,
      |          (gx.gx * g.w) // 9 AS sx, (gy.gy * g.h) // 8 AS sy
      |        FROM g JOIN range(0, 9) gx(gx) ON true JOIN range(0, 8) gy(gy) ON true),
      | spx AS (SELECT px.*, CASE WHEN EXISTS (SELECT 1 FROM range(0, 8) j(j)
      |            WHERE j < px.nd
      |              AND px.sx = (j * px.w) // 9
      |              AND px.sy = (((j * 8) // px.nd) * px.h) // 8)
      |          THEN px.spot ELSE 0 END AS s FROM px),
      | gr AS (SELECT id, gx, gy,
      |          (  ((key*31 + sx*7 + sy*13 + 0  + s) % 255)
      |           + ((key*31 + sx*7 + sy*13 + 5  + s) % 255)
      |           + ((key*31 + sx*7 + sy*13 + 10 + s) % 255)) // 3 AS gray
      |        FROM spx),
      | bt AS (SELECT a.id, a.gy, sum(CASE WHEN a.gray < b.gray THEN 1 << a.gx ELSE 0 END) AS byte
      |        FROM gr a JOIN gr b ON a.id = b.id AND a.gy = b.gy AND b.gx = a.gx + 1
      |        WHERE a.gx < 8 GROUP BY 1, 2)""".stripMargin

  /** Shared tail of the blocking-miss recall oracles: 16-bit bands from
    * the per-id byte table (band p = bytes 2p, 2p+1 — the engine's
    * `shiftright(sig, (3-q)·16) & 65535` blocks, p = 3−q; only the SET of
    * bands matters for the existence test), brute Hamming over all id
    * pairs, banded candidates, cumulative counts per H ∈ [0, 8].
    * `bytesCte(id, $gCol, byte)` must carry all 8 byte groups per id. */
  private def blockRecallTailSql(bytesCte: String, gCol: String): String =
    s""" blks AS (SELECT id, $gCol // 2 AS p, sum(byte << (8 * ($gCol % 2))) AS blk
       |         FROM $bytesCte GROUP BY 1, 2),
       | hm AS (SELECT a.id AS doc_a, b.id AS doc_b,
       |          sum(bit_count(xor(a.byte, b.byte))) AS hamming
       |        FROM $bytesCte a JOIN $bytesCte b
       |          ON a.$gCol = b.$gCol AND a.id < b.id
       |        GROUP BY 1, 2),
       | blocked AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
       |             FROM blks a JOIN blks b
       |               ON a.p = b.p AND a.blk = b.blk AND a.id < b.id),
       | fb AS (SELECT hm.doc_a, hm.doc_b, hm.hamming FROM hm
       |        JOIN blocked ON blocked.doc_a = hm.doc_a AND blocked.doc_b = hm.doc_b),
       | hs AS (SELECT h FROM range(0, 9) h(h)),
       | tc AS (SELECT hs.h, count(hm.doc_a) AS n_truth FROM hs
       |        LEFT JOIN hm ON hm.hamming <= hs.h GROUP BY 1),
       | fc AS (SELECT hs.h, count(fb.doc_a) AS n_found FROM hs
       |        LEFT JOIN fb ON fb.hamming <= hs.h GROUP BY 1)
       | SELECT CAST(tc.h AS BIGINT) AS max_hamming,
       |   CAST(tc.n_truth AS BIGINT) AS n_truth,
       |   CAST(fc.n_found AS BIGINT) AS n_found,
       |   round(fc.n_found * 1.0 / tc.n_truth, 6) AS recall
       | FROM tc JOIN fc ON fc.h = tc.h ORDER BY max_hamming""".stripMargin

  /** Shared DuckDB CTE chain: shingles → minhash → bands → candidate pairs
    * (mirrors `Dedup.shingles/minhashSignatures/lshCandidatePairs` with
    * numHashes=8, bandSize=2, n=3; docs here always have ≥ 3 tokens).
    * The min-wise family is `Dedup.MinhashP`'s — one md5 per shingle
    * reduced to a ~2³¹ universe (15 hex chars mod p, `Dedup.shingleBaseHash`),
    * per-seed universal hashes by integer arithmetic; the constants
    * interpolate from the SAME Scala definitions the engine uses, so the
    * two sides cannot drift. */
  /** Shared SQL fragments of the exact-substring oracles (r11): the
    * lag-window islands merge over a marked-(doc_id, pos) CTE, emitting
    * the final span rows. Every exact-substring oracle ends on this
    * fragment so the merge rule lives in ONE place. */
  private def islandSpanTailSql(markedCte: String): String =
    s"""xb AS (SELECT doc_id, pos,
       |         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
       |              OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 40
       |              THEN 1 ELSE 0 END AS brk FROM $markedCte),
       | xs AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM xb)
       | SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       |   CAST(max(pos) + 40 AS BIGINT) AS span_end
       | FROM xs GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin

  private val lshPairsSql =
    // One source of SQL truth for the chain: the empty prefix yields the
    // historical CTE names (toks/sh/mh/bands/capped), so the self-pair and
    // cross-corpus oracles cannot drift from each other.
    s"""${lshCappedBandsSql("corpus", "")},
      | pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |           FROM capped a JOIN capped b
      |             ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  /** Prefixed variant of the `lshPairsSql` chain up through CAPPED band
    * buckets (no pair join) — reads from CTE `$src`, emits
    * `${p}toks/${p}sh/${p}bands/${p}capped` — so two independent corpora
    * can carry the chain side by side in one query (`dd_cross_neardup`).
    * Same engine-interpolated minhash constants as `lshPairsSql`. */
  private def lshCappedBandsSql(src: String, p: String): String = {
    import graft.operators.Dedup.{MinhashP, minhashA, minhashB}
    val seedTable = (0 until 8)
      .map(s => s"($s, ${minhashA(s)}, ${minhashB(s)})").mkString(", ")
    s"""${p}toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
      | ${p}sh AS (SELECT DISTINCT doc_id, array_to_string(w[i.i:i.i+2], ' ') AS shingle
      |        FROM ${p}toks JOIN range(1, 100000) i(i) ON i.i <= len(w) - 2
      |        UNION ALL SELECT doc_id, array_to_string(w, ' ')
      |        FROM ${p}toks WHERE len(w) < 3),
      | ${p}mh AS (SELECT doc_id, s.seed,
      |          min(((('0x' || substr(md5(shingle), 1, 15))::BIGINT % $MinhashP) * s.a + s.b) % $MinhashP) AS h
      |        FROM ${p}sh CROSS JOIN (VALUES $seedTable) s(seed, a, b) GROUP BY 1, 2),
      | ${p}bands AS (SELECT doc_id, seed // 2 AS band, string_agg(h::VARCHAR, '|' ORDER BY seed) AS sig
      |           FROM ${p}mh GROUP BY 1, 2),
      | ${p}capped AS (SELECT doc_id, band, sig FROM
      |              (SELECT b.*, count(*) OVER (PARTITION BY band, sig) AS bn FROM ${p}bands b)
      |            WHERE bn <= 1000)""".stripMargin
  }

  /** documents ∪ two generations of near-copies of doc_id < 20 — a CHAIN
    * per base doc (base ≈ gen1 ≈ gen2), so cluster formation has to do real
    * transitive work rather than collapsing isolated pairs. */
  private def plantedChain(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val g = d.where(col("doc_id") < 20)
    d.unionAll(g.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text")))
      .unionAll(g.select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" extra extra")).as("text")))
  }
  private val plantedChainSql =
    """corpus AS (SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 100000, text || ' extra' FROM documents WHERE doc_id < 20
      |  UNION ALL SELECT doc_id + 200000, text || ' extra extra' FROM documents WHERE doc_id < 20)""".stripMargin

  /** documents ∪ junk twins (stopword-spam prefix — the SEO-spam shape,
    * shifting the stopword-ratio feature from ~0.06 to ~0.26 with per-doc
    * variation) — the planted quality-vs-junk label `txt_lr_eval` /
    * `txt_lr_calibrate` train and evaluate the gate on. Label: original
    * ids are quality (`doc_id < 1000000`), twins junk. */
  private val junkSpam = "the a of to and the a of to and the a of to and "
  private def junkPlant(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionAll(d.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(lit(junkSpam), col("text")).as("text")))
  }
  private val junkPlantSql =
    s"""(SELECT doc_id, text FROM documents
      | UNION ALL SELECT doc_id + 1000000, '$junkSpam' || text FROM documents)""".stripMargin

  /** `plantedChain` carrying the language column through (dd_pipeline needs
    * it for the final per-language report). */
  private def plantedChainLang(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
    val g = d.where(col("doc_id") < 20)
    d.unionAll(g.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" extra")).as("text"), col("lang")))
      .unionAll(g.select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" extra extra")).as("text"), col("lang")))
  }
  private val plantedChainLangSql =
    """corpus AS (SELECT doc_id, text, lang FROM documents
      |  UNION ALL SELECT doc_id + 100000, text || ' extra', lang FROM documents WHERE doc_id < 20
      |  UNION ALL SELECT doc_id + 200000, text || ' extra extra', lang FROM documents WHERE doc_id < 20)""".stripMargin

  /** Shared DuckDB 64-bit simhash CTE (mirrors `Dedup.simhash64` over
    * `corpus`, as a 64-char bit string with bit 0 = engine sigint's MSB —
    * positional hamming over the string equals `bit_count(xor)` over the
    * BIGINT). */
  private val simhash64Sql =
    """tok64 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus),
      | votes64 AS (SELECT doc_id, j.j,
      |     sum(CASE WHEN (((strpos('0123456789abcdef',
      |                             substr(md5(tok), CAST(j.j // 4 AS INT) + 1, 1)) - 1)
      |                     >> (3 - CAST(j.j % 4 AS INT))) & 1) = 1
      |         THEN 1 ELSE -1 END) AS s
      |   FROM tok64 CROSS JOIN range(0, 64) j(j) GROUP BY 1, 2),
      | sig64 AS (SELECT doc_id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS sig
      |           FROM votes64 GROUP BY doc_id)""".stripMargin

  /** Shared DuckDB simhash CTE (mirrors `Dedup.simhash` over `corpus`). */
  private val simhashSql =
    """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus),
      | votes AS (SELECT doc_id, j.j,
      |             sum(CASE WHEN substr(md5(tok), CAST(j.j AS INT) + 1, 1)
      |                   IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s
      |           FROM tok CROSS JOIN range(0, 16) j(j) GROUP BY 1, 2),
      | sig AS (SELECT doc_id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS sig
      |         FROM votes GROUP BY doc_id)""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a,$b) / (sqrt(list_dot_product($a,$a)) * sqrt(list_dot_product($b,$b)))"

  /** Fingerprint-guarded build-once/reuse-many of a persisted artifact
    * under /tmp, keyed by the data directory. The fingerprint — (row
    * count, sum of doc_id, sum of text length, sum of each text's
    * 15-hex md5 prefix as a 60-bit integer), one metadata-scale
    * aggregate over `corpus` — guards reuse: the driver regenerates
    * testdata between rounds, and probing a stale artifact would return
    * confidently wrong results. The md5-prefix term makes the
    * fingerprint sensitive to ANY byte change in any text (a
    * regeneration that preserves counts/ids/lengths — e.g. a case-only
    * rewrite — still flips it); summing as decimal(38,0) keeps the
    * aggregate overflow-free and deterministic under ANSI mode.
    * Build-once/probe-many is the operational contract these queries
    * exist to measure; the first run pays the build, later runs (bench
    * retries, repeated sessions) measure the probe/increment alone.
    * Each build's wall-clock is recorded in [[buildSecs]] so the bench
    * archive can separate cold build cost from warm probe cost. */
  private[graft] def cachedArtifact(dir: String, name: String, corpus: DataFrame)
      (build: String => Unit): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val outDir = s"/tmp/graft-$name-$key"
    val fp = corpus.agg(
        count(lit(1)), sum(col("doc_id")), sum(length(col("text"))),
        sum(expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as decimal(38,0))")))
      .collect()(0).toSeq.mkString(":")
    // Per-artifact JVM lock (r20): overlapped Verify dumps (§2.6) can hit
    // the same shared artifact from two queries at once — the freshness
    // check and the build must be one atomic unit or both threads build
    // into outDir concurrently. The fingerprint aggregate above stays
    // outside the lock (read-only Spark work, safe to duplicate).
    val lock = artifactLocks.computeIfAbsent(outDir, _ => new Object)
    lock.synchronized {
      val marker = java.nio.file.Paths.get(outDir, "FINGERPRINT")
      val fresh = java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == fp
      if (!fresh) {
        val t0 = System.nanoTime()
        build(outDir)
        java.nio.file.Files.write(marker, fp.getBytes("UTF-8"))
        buildSecs.put(name, (System.nanoTime() - t0) / 1e9)
      }
    }
    outDir
  }

  private val artifactLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Wall-clock seconds of each cachedArtifact build executed in this
    * JVM, keyed by artifact name. Bench drains this after each query so
    * BENCH_DETAIL.json can attribute cold-start build cost separately
    * from the warm probe the increment queries are designed to measure.
    * ONE-TIME costs only (paid in a query's first run, then
    * fingerprint-cached): Bench subtracts them from the first run before
    * the run-spread contention test, so a driver cold run doesn't read
    * as contention. Per-run fixture costs go in [[fixtureSecs]]. */
  val buildSecs = new java.util.concurrent.ConcurrentHashMap[String, Double]()

  /** Wall-clock seconds of PER-RUN fixture work inside a query (fresh
    * temp-dir index builds, stream state seeding, loop/batch splits) —
    * informational attribution for the bench archive. Unlike
    * [[buildSecs]], these are paid on EVERY run, so they cannot create
    * run-to-run spread and are never subtracted by the contention test. */
  val fixtureSecs = new java.util.concurrent.ConcurrentHashMap[String, Double]()

  private def cachedCrossIndex(
      s: SparkSession, dir: String, corpus: DataFrame): String =
    cachedArtifact(dir, "cross-index", corpus)(
      Dedup.buildCrossNearDupIndex(corpus, _))

  private def cachedWindowIndex(dir: String, corpus: DataFrame): String =
    cachedArtifact(dir, "exact-window-index-p1", corpus)(
      Dedup.buildExactWindowIndex(corpus, _))

  /** The one oracle text both cross-batch rows share (identical result
    * contract: recompute vs indexed probe). */
  private val exactCrossOracleSql: String =
    s"""WITH corpus AS (SELECT doc_id, text FROM documents),
       | batch AS (SELECT doc_id + 500000 AS doc_id,
       |             'fresh lead-in words ' || substr(text, 5, 150) || ' fresh tail words' AS text
       |             FROM documents WHERE doc_id < 10
       |           UNION ALL SELECT doc_id + 600000, upper(text)
       |             FROM documents WHERE doc_id >= 10 AND doc_id < 20
       |           UNION ALL SELECT doc_id + 700000, text
       |             FROM documents WHERE doc_id >= 20 AND doc_id < 25),
       | sw AS (SELECT DISTINCT ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 40)), 1, 15))::BIGINT AS m
       |        FROM corpus JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39),
       | bw AS (SELECT doc_id, i.i AS pos,
       |          ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 40)), 1, 15))::BIGINT AS m
       |        FROM batch JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39),
       | mk AS (SELECT bw.doc_id, bw.pos FROM bw JOIN sw USING (m)),
       | ${islandSpanTailSql("mk")}""".stripMargin

  private def cachedBm25Index(dir: String, corpus: DataFrame): String =
    // v2: versioned df/stats side tables (growable index) — the name bump
    // invalidates any pre-r12 cached artifact with the old layout
    cachedArtifact(dir, "bm25-index-v2", corpus)(
      Retrieval.buildBm25Index(corpus, _))

  /** Shared arriving-batch fixture of the dd_exact_cross/indexed rows:
    * embedded corpus passages (spans), casing-broken docs (no spans),
    * and exact whole-doc copies (full-doc spans). */
  private def exactCrossBatch(d: DataFrame): DataFrame =
    d.where(col("doc_id") < 10)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(lit("fresh lead-in words "), substring(col("text"), 5, 150),
          lit(" fresh tail words")).as("text"))
      .unionAll(d.where(col("doc_id") >= 10 && col("doc_id") < 20)
        .select((col("doc_id") + 600000).as("doc_id"), upper(col("text")).as("text")))
      .unionAll(d.where(col("doc_id") >= 20 && col("doc_id") < 25)
        .select((col("doc_id") + 700000).as("doc_id"), col("text")))

  /** Stage `df` as ONE flat parquet file named `name` in `dir` — the
    * file-stream source lists files, not Spark output directories, so
    * streaming queries' deterministic drops are staged this way (same
    * pattern as StreamingSpec). */
  /** Deterministic micro-batch ORDER for parallel-staged stream inputs —
    * see ModelQueries.orderStaged: the file-stream source orders batches
    * by file mtime; re-stamp in declared order after overlapped staging. */
  private def orderStaged(dir: java.nio.file.Path, names: String*): Unit = {
    val base = names.map(n =>
      java.nio.file.Files.getLastModifiedTime(dir.resolve(n)).toMillis).max
    names.zipWithIndex.foreach { case (n, i) =>
      java.nio.file.Files.setLastModifiedTime(dir.resolve(n),
        java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L))
    }
  }

  private def stageAsFile(df: DataFrame,
      dir: java.nio.file.Path, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stage")
    // repartition(1), NOT coalesce(1) — see ModelQueries.stageAsFile:
    // keep the fixture compute parallel, single-task only for the write
    df.repartition(1).write.parquet(tmp.resolve("d").toString)
    val ls = java.nio.file.Files.list(tmp.resolve("d"))
    val part =
      try ls.filter(p => p.toString.endsWith(".parquet")).findFirst.get
      finally ls.close()
    java.nio.file.Files.copy(part, dir.resolve(name))
    deleteRecursively(tmp)
  }

  /** Recursive file copy — the per-run instantiation step for MUTABLE
    * standing state seeded from a fingerprint-cached artifact (r20): the
    * curation/purge stream loops grow and purge their state, so each run
    * works on a cheap filesystem copy while the cached seed stays
    * pristine. Copy cost is metadata+bytes of a fixture-scale index —
    * milliseconds against the multi-second Spark seed chain it replaces
    * on every run. */
  private[graft] def copyRecursively(src: java.nio.file.Path,
      dst: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    val walk = Files.walk(src)
    try walk.forEach { p =>
      val t: Path = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else {
        Files.createDirectories(t.getParent)
        Files.copy(p, t)
      }
    } finally walk.close()
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  val all: Seq[QueryDef] = Seq(

    // ---- dedup -----------------------------------------------------------
    QueryDef("dd_exact")(
      s"""WITH $plantedExactSql
         | SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS keep_id,
         |        CAST(count(*) AS BIGINT) AS n_copies
         | FROM corpus GROUP BY 1 HAVING count(*) > 1 ORDER BY keep_id""".stripMargin
    ) { (s, dir) =>
      Dedup.exact(plantedExact(s, dir))
        .where(col("n_copies") > 1).orderBy(col("keep_id"))
    },

    // Operational incremental dedup: even docs are the existing keep-set;
    // the arriving batch = odd docs ∪ re-deliveries of keep-set texts ∪
    // in-batch duplicates. Only genuinely-new texts extend the keep-set.
    QueryDef("dd_incremental")(
      """WITH keeps AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
        | batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        |   UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 40),
        | newkeep AS (SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS keep_id
        |             FROM batch GROUP BY 1)
        | SELECT n.h, n.keep_id FROM newkeep n
        | WHERE n.h NOT IN (SELECT h FROM keeps)
        | ORDER BY keep_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val keeps = d.where(col("doc_id") % 2 === 0).select(md5(col("text")).as("h")).distinct()
      val batch = d.where(col("doc_id") % 2 === 1)
        .unionAll(d.where(col("doc_id") < 40)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      Dedup.exactIncrement(keeps, batch).orderBy(col("keep_id"))
    },

    // Benchmark decontamination: corpus docs (doc_id >= 5) sharing any word
    // 3-gram with the eval set (doc_id < 5), with distinct-shingle hit
    // counts. The eval shingle set is benchmark-scale → broadcast semi-join;
    // the corpus never shuffles.
    QueryDef("dd_decontaminate")(
      """WITH tokc AS (SELECT doc_id, string_split(text, ' ') AS w
        |              FROM documents WHERE doc_id >= 5),
        | toke AS (SELECT doc_id, string_split(text, ' ') AS w
        |          FROM documents WHERE doc_id < 5),
        | shc AS (SELECT DISTINCT doc_id, array_to_string(w[i.i:i.i+2], ' ') AS shingle
        |         FROM tokc JOIN range(1, 100000) i(i) ON i.i <= len(w) - 2
        |         UNION ALL SELECT doc_id, array_to_string(w, ' ')
        |         FROM tokc WHERE len(w) < 3),
        | she AS (SELECT DISTINCT shingle FROM (
        |           SELECT array_to_string(w[i.i:i.i+2], ' ') AS shingle
        |           FROM toke JOIN range(1, 100000) i(i) ON i.i <= len(w) - 2
        |           UNION ALL SELECT array_to_string(w, ' ')
        |           FROM toke WHERE len(w) < 3))
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        | FROM shc JOIN she USING (shingle)
        | GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.contaminationHits(d.where(col("doc_id") >= 5), d.where(col("doc_id") < 5))
        .orderBy(col("doc_id"))
    },

    // Cross-corpus near-dedup: dedupe an arriving batch against the
    // standing corpus — near-copies (appended token), exact re-deliveries,
    // and genuinely-new texts (upper-cased: disjoint shingles) — emitting
    // candidate cross pairs with Jaccard ≥ 0.5. Sides never self-pair.
    QueryDef("dd_cross_neardup")(
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         | batch AS (SELECT doc_id + 200000 AS doc_id, text || ' extra' AS text
         |             FROM documents WHERE doc_id < 30
         |           UNION ALL SELECT doc_id + 300000, text
         |             FROM documents WHERE doc_id >= 30 AND doc_id < 40
         |           UNION ALL SELECT doc_id + 400000, upper(text)
         |             FROM documents WHERE doc_id >= 40 AND doc_id < 60),
         | ${lshCappedBandsSql("corpus", "c")},
         | ${lshCappedBandsSql("batch", "b")},
         | cand AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
         |          FROM bcapped b JOIN ccapped c
         |            ON b.band = c.band AND b.sig = c.sig),
         | inter AS (SELECT cd.batch_id, cd.corpus_id, count(*) AS n_inter
         |           FROM cand cd
         |           JOIN bsh sb ON sb.doc_id = cd.batch_id
         |           JOIN csh sc ON sc.doc_id = cd.corpus_id
         |             AND ('0x' || substr(md5(sc.shingle), 1, 15))::BIGINT
         |               = ('0x' || substr(md5(sb.shingle), 1, 15))::BIGINT
         |           GROUP BY 1, 2),
         | nb AS (SELECT doc_id, count(*) AS n_b FROM bsh GROUP BY 1),
         | nc AS (SELECT doc_id, count(*) AS n_c FROM csh GROUP BY 1)
         | SELECT * FROM (
         |   SELECT i.batch_id, i.corpus_id,
         |     round(i.n_inter / (b.n_b + c.n_c - i.n_inter), 6) AS jaccard
         |   FROM inter i
         |   JOIN nb b ON b.doc_id = i.batch_id
         |   JOIN nc c ON c.doc_id = i.corpus_id)
         | WHERE jaccard >= 0.5
         | ORDER BY batch_id, corpus_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = d.where(col("doc_id") < 30)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
        .unionAll(d.where(col("doc_id") >= 30 && col("doc_id") < 40)
          .select((col("doc_id") + 300000).as("doc_id"), col("text")))
        .unionAll(d.where(col("doc_id") >= 40 && col("doc_id") < 60)
          .select((col("doc_id") + 400000).as("doc_id"), upper(col("text")).as("text")))
      Dedup.crossNearDup(d, batch, threshold = 0.5)
        .orderBy(col("batch_id"), col("corpus_id"))
    },

    // The same cross-dedup through the PERSISTED index — the "index once,
    // probe per batch" shape a production ingest loop runs (the recompute
    // form above re-reads every corpus byte per batch; this one loads
    // candidate corpus docs' rows only). Result contract is identical, so
    // the oracle SQL is identical; the index is built once per testdata
    // fingerprint and reused across runs, making the benched number the
    // PROBE cost — the number that matters operationally.
    QueryDef("dd_cross_indexed")(
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
         | batch AS (SELECT doc_id + 200000 AS doc_id, text || ' extra' AS text
         |             FROM documents WHERE doc_id < 30
         |           UNION ALL SELECT doc_id + 300000, text
         |             FROM documents WHERE doc_id >= 30 AND doc_id < 40
         |           UNION ALL SELECT doc_id + 400000, upper(text)
         |             FROM documents WHERE doc_id >= 40 AND doc_id < 60),
         | ${lshCappedBandsSql("corpus", "c")},
         | ${lshCappedBandsSql("batch", "b")},
         | cand AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
         |          FROM bcapped b JOIN ccapped c
         |            ON b.band = c.band AND b.sig = c.sig),
         | inter AS (SELECT cd.batch_id, cd.corpus_id, count(*) AS n_inter
         |           FROM cand cd
         |           JOIN bsh sb ON sb.doc_id = cd.batch_id
         |           JOIN csh sc ON sc.doc_id = cd.corpus_id
         |             AND ('0x' || substr(md5(sc.shingle), 1, 15))::BIGINT
         |               = ('0x' || substr(md5(sb.shingle), 1, 15))::BIGINT
         |           GROUP BY 1, 2),
         | nb AS (SELECT doc_id, count(*) AS n_b FROM bsh GROUP BY 1),
         | nc AS (SELECT doc_id, count(*) AS n_c FROM csh GROUP BY 1)
         | SELECT * FROM (
         |   SELECT i.batch_id, i.corpus_id,
         |     round(i.n_inter / (b.n_b + c.n_c - i.n_inter), 6) AS jaccard
         |   FROM inter i
         |   JOIN nb b ON b.doc_id = i.batch_id
         |   JOIN nc c ON c.doc_id = i.corpus_id)
         | WHERE jaccard >= 0.5
         | ORDER BY batch_id, corpus_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = d.where(col("doc_id") < 30)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
        .unionAll(d.where(col("doc_id") >= 30 && col("doc_id") < 40)
          .select((col("doc_id") + 300000).as("doc_id"), col("text")))
        .unionAll(d.where(col("doc_id") >= 40 && col("doc_id") < 60)
          .select((col("doc_id") + 400000).as("doc_id"), upper(col("text")).as("text")))
      Dedup.crossNearDupIndexed(s, cachedCrossIndex(s, dir, d), batch, threshold = 0.5)
        .orderBy(col("batch_id"), col("corpus_id"))
    },

    // Cross-corpus EXACT substring spans: an arriving batch is cut
    // against what the standing corpus already contains — every batch
    // position whose 40-char window occurs anywhere in the corpus is
    // marked and merged. Planted: ten docs embedding a 150-char corpus
    // passage inside fresh filler (one mid-doc span each), five exact
    // whole-doc copies (full-doc span), ten upper-cased docs (no 40-char
    // window survives casing — no spans). The oracle replays the
    // engine's 60-bit md5 window universe verbatim.
    QueryDef("dd_exact_cross")(
     exactCrossOracleSql) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.exactCrossDupSpans(d, exactCrossBatch(d), L = 40)
        .orderBy(col("doc_id"), col("span_start"))
    },

    // The same cut through the PERSISTED window index ("index once,
    // probe per batch"): the index is the corpus's distinct 60-bit
    // window keys — 8 bytes per distinct window, streamed (never
    // shuffled) through a broadcast of the batch's windows. Identical
    // result contract, identical oracle; the index is fingerprint-cached
    // so the benched number is the PROBE.
    QueryDef("dd_exact_indexed")(
     exactCrossOracleSql) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.exactCrossDupIndexed(s, cachedWindowIndex(dir, d), exactCrossBatch(d))
        .orderBy(col("doc_id"), col("span_start"))
    },

    // Append-side COMPACTION of the window index (r16): build on the
    // corpus's first half, append the rest in two batches (three
    // ingest_batch partitions), FOLD them into one distinct base
    // (compactExactWindowIndex — from the index itself, no corpus
    // rescan), then probe. Identical oracle as dd_exact_cross: a hash
    // match proves the folded index probes exactly as the grown one,
    // and the in-row require pins the partition collapse itself.
    QueryDef("dd_window_compacted")(
     exactCrossOracleSql) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val n = d.count()
      val idx = java.nio.file.Files.createTempDirectory("graft-win-compact-q")
      val tB = System.nanoTime()
      // Pre-compaction standing state (build + two appends) fingerprint-
      // cached (r20); compaction MUTATES, so each run compacts a COPY.
      val built = cachedArtifact(dir, "win-built-3batch", d) { out =>
        Dedup.buildExactWindowIndex(d.where(col("doc_id") < n / 2), s"$out/idx")
        Dedup.appendToExactWindowIndex(
          d.where(col("doc_id") >= n / 2 && col("doc_id") < 3 * n / 4), s"$out/idx")
        Dedup.appendToExactWindowIndex(
          d.where(col("doc_id") >= 3 * n / 4), s"$out/idx")
      }
      copyRecursively(java.nio.file.Paths.get(built, "idx"), idx)
      Dedup.compactExactWindowIndex(s, idx.toString)
      fixtureSecs.put("win-compact-build", (System.nanoTime() - tB) / 1e9)
      val parts = new java.io.File(s"$idx/windows").listFiles()
        .count(_.getName.startsWith("ingest_batch="))
      require(parts == 1,
        s"compaction must fold to one base partition, got $parts")
      val out = Dedup.exactCrossDupIndexed(s, idx.toString, exactCrossBatch(d))
        .orderBy(col("doc_id"), col("span_start")).localCheckpoint(true)
      deleteRecursively(idx)
      out
    },

    // Per-doc window novelty vs the standing corpus — the dedup-aware
    // value signal a sampling stage filters on (0 = verbatim corpus
    // content, 1 = entirely new text). Same fixture as dd_exact_cross:
    // embedded passages score mid-range, upper-cased docs 1.0, exact
    // copies 0.0.
    QueryDef("dd_exact_novelty")(
      """WITH corpus AS (SELECT doc_id, text FROM documents),
        | batch AS (SELECT doc_id + 500000 AS doc_id,
        |             'fresh lead-in words ' || substr(text, 5, 150) || ' fresh tail words' AS text
        |             FROM documents WHERE doc_id < 10
        |           UNION ALL SELECT doc_id + 600000, upper(text)
        |             FROM documents WHERE doc_id >= 10 AND doc_id < 20
        |           UNION ALL SELECT doc_id + 700000, text
        |             FROM documents WHERE doc_id >= 20 AND doc_id < 25),
        | sw AS (SELECT DISTINCT ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 40)), 1, 15))::BIGINT AS m
        |        FROM corpus JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39),
        | bw AS (SELECT doc_id, i.i AS pos,
        |          ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 40)), 1, 15))::BIGINT AS m
        |        FROM batch JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39),
        | st AS (SELECT bw.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |          CAST(count(*) FILTER (WHERE sw.m IS NOT NULL) AS BIGINT) AS n_matched
        |        FROM bw LEFT JOIN sw ON bw.m = sw.m GROUP BY 1)
        | SELECT doc_id, n_windows, n_matched,
        |   round(1.0 - n_matched / n_windows, 6) AS novelty
        | FROM st ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.windowNovelty(d, exactCrossBatch(d), L = 40).orderBy(col("doc_id"))
    },

    // The STREAMING exact-substring ingest loop run END TO END inside
    // the oracle row: seed index from the standing corpus, stream two
    // file-dropped micro-batches through `Streams.exactDedupIngest`
    // (probe → cut → append index), and hash-check the union of cleaned
    // outputs against a from-scratch SEQUENTIAL recomputation — batch 1
    // cut against the corpus, batch 2 against corpus ∪ batch 1. A match
    // proves arrival-order precedence and mid-stream index growth,
    // driver-checked. Planted: embedded corpus passages (cut), novel
    // upper-cased docs (kept, indexed), batch-2 docs embedding a BATCH-1
    // passage (cut only because the index grew), exact standing copies
    // (cut to empty).
    QueryDef("dd_exact_stream")(
      """WITH corpus AS (SELECT doc_id, text FROM documents),
        | b1 AS (SELECT doc_id + 800000 AS doc_id,
        |          'stream one lead ' || substr(text, 7, 120) || ' stream one tail' AS text
        |        FROM documents WHERE doc_id < 8
        |        UNION ALL SELECT doc_id + 810000, upper(text)
        |        FROM documents WHERE doc_id >= 8 AND doc_id < 10),
        | b2 AS (SELECT doc_id + 820000 AS doc_id,
        |          'stream two lead ' || substr(upper(text), 3, 100) || ' stream two tail' AS text
        |        FROM documents WHERE doc_id >= 8 AND doc_id < 10
        |        UNION ALL SELECT doc_id + 830000, text
        |        FROM documents WHERE doc_id >= 30 AND doc_id < 33),
        | sk1 AS (SELECT DISTINCT ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 40)), 1, 15))::BIGINT AS m
        |         FROM corpus JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39),
        | b1w AS (SELECT doc_id, i.i AS pos,
        |           ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 40)), 1, 15))::BIGINT AS m
        |         FROM b1 JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39),
        | sk2 AS (SELECT m FROM sk1 UNION SELECT m FROM b1w),
        | b2w AS (SELECT doc_id, i.i AS pos,
        |           ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 40)), 1, 15))::BIGINT AS m
        |         FROM b2 JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39),
        | mk AS (SELECT b1w.doc_id, b1w.pos FROM b1w JOIN sk1 USING (m)
        |        UNION ALL SELECT b2w.doc_id, b2w.pos FROM b2w JOIN sk2 USING (m)),
        | br AS (SELECT doc_id, pos,
        |          CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
        |               OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 40
        |               THEN 1 ELSE 0 END AS brk FROM mk),
        | sg AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM br),
        | sp AS (SELECT doc_id, min(pos) AS ss, max(pos) + 40 AS se FROM sg GROUP BY doc_id, grp),
        | ba AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
        | gaps AS (
        |   SELECT doc_id,
        |     coalesce(lag(se) OVER (PARTITION BY doc_id ORDER BY ss), 1) AS gs,
        |     ss AS ge
        |   FROM sp
        |   UNION ALL
        |   SELECT sp.doc_id, max(sp.se), max(len(ba.text)) + 1
        |   FROM sp JOIN ba USING (doc_id) GROUP BY sp.doc_id),
        | cleaned AS (SELECT doc_id,
        |     string_agg(substr(text, CAST(gs AS INT), CAST(ge - gs AS INT)), '' ORDER BY gs) AS clean_text
        |   FROM gaps JOIN ba USING (doc_id) GROUP BY doc_id)
        | SELECT ba.doc_id, coalesce(c.clean_text, ba.text) AS clean_text
        | FROM ba LEFT JOIN cleaned c USING (doc_id)
        | ORDER BY ba.doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val b1 = d.where(col("doc_id") < 8)
        .select((col("doc_id") + 800000).as("doc_id"),
          concat(lit("stream one lead "), substring(col("text"), 7, 120),
            lit(" stream one tail")).as("text"))
        .unionAll(d.where(col("doc_id") >= 8 && col("doc_id") < 10)
          .select((col("doc_id") + 810000).as("doc_id"), upper(col("text")).as("text")))
      val b2 = d.where(col("doc_id") >= 8 && col("doc_id") < 10)
        .select((col("doc_id") + 820000).as("doc_id"),
          concat(lit("stream two lead "), substring(upper(col("text")), 3, 100),
            lit(" stream two tail")).as("text"))
        .unionAll(d.where(col("doc_id") >= 30 && col("doc_id") < 33)
          .select((col("doc_id") + 830000).as("doc_id"), col("text")))
      // Fresh state per call; replay machinery is StreamingSpec's job —
      // this row checks the converged result. Fixture vs loop timings
      // split the same way as dd_curation_stream.
      val st = java.nio.file.Files.createTempDirectory("graft-xstream-q")
      val (idxDir, keepDir) = (s"$st/index", s"$st/keeps")
      val tSeed = System.nanoTime()
      val inDir = java.nio.file.Files.createTempDirectory("graft-xstream-q-in")
      // Seed index = the SHARED exact-window artifact (same full-corpus
      // build dd_exact_indexed probes, fingerprint-cached); the ingest
      // GROWS it, so each run works on a filesystem COPY — copy and the
      // two stagings overlap (guide §2.6, r20).
      graft.operators.Par.runUnit(Seq(
        () => {
          copyRecursively(
            java.nio.file.Paths.get(cachedWindowIndex(dir, d)),
            java.nio.file.Paths.get(idxDir))
          // the artifact root doubles as the index root here — drop the
          // fingerprint marker from the mutable copy
          java.nio.file.Files.deleteIfExists(
            java.nio.file.Paths.get(idxDir, "FINGERPRINT")); ()
        },
        () => stageAsFile(b1, inDir, "b1.parquet"),
        () => stageAsFile(b2, inDir, "b2.parquet")))
      orderStaged(inDir, "b1.parquet", "b2.parquet")
      fixtureSecs.put("exact-stream-fixture", (System.nanoTime() - tSeed) / 1e9)
      val tLoop = System.nanoTime()
      val q = graft.streaming.Streams.exactDedupIngest(
        graft.streaming.Streams.documentsStream(s, inDir.toString, maxFilesPerTrigger = 1),
        idxDir, keepDir, s"$st/ckpt")
      q.awaitTermination()
      fixtureSecs.put("exact-stream-loop", (System.nanoTime() - tLoop) / 1e9)
      val batchMs = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toDouble))
      if (batchMs.nonEmpty)
        fixtureSecs.put("exact-stream-batch-max", batchMs.max / 1e3)
      val out = s.read.parquet(keepDir)
        .select(col("doc_id"), col("clean_text"))
        .orderBy(col("doc_id")).localCheckpoint(true)
      deleteRecursively(st)
      deleteRecursively(inDir)
      out
    },

    QueryDef("dd_minhash_lsh")(
      s"""WITH $plantedNearSql,
         | $lshPairsSql
         | SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b""".stripMargin
    ) { (s, dir) =>
      Dedup.lshCandidatePairs(plantedNear(s, dir)).orderBy(col("doc_a"), col("doc_b"))
    },

    QueryDef("dd_ngram_jaccard")(
      s"""WITH $plantedNearSql,
         | $lshPairsSql,
         | inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter
         |           FROM pairs p
         |           JOIN sh sa ON sa.doc_id = p.doc_a
         |           JOIN sh sb ON sb.doc_id = p.doc_b AND ('0x' || substr(md5(sb.shingle), 1, 15))::BIGINT = ('0x' || substr(md5(sa.shingle), 1, 15))::BIGINT
         |           GROUP BY 1, 2),
         | sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1)
         | SELECT p.doc_a, p.doc_b,
         |   round(coalesce(i.n_inter, 0) / (na.n_sh + nb.n_sh - coalesce(i.n_inter, 0)), 6) AS jaccard
         | FROM pairs p
         | LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         | JOIN sizes na ON na.doc_id = p.doc_a
         | JOIN sizes nb ON nb.doc_id = p.doc_b
         | ORDER BY p.doc_a, p.doc_b""".stripMargin
    ) { (s, dir) =>
      // Dedup-first: the whole shingle → LSH → Jaccard chain runs at
      // distinct-text scale and expands back to doc pairs (equal-text
      // pairs are identity-scored 1.0, no band/shingle work).
      Dedup.nearDupScores(plantedNear(s, dir))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // MEASURED LSH recall — the dedup-side sim_recall: the banded chain's
    // J ≥ 0.5 pairs against the EXACT ground truth (every pair sharing a
    // shingle, scored — complete, since J > 0 requires a shared shingle;
    // same hashed-shingle space as the chain's scorer, so the comparison
    // can't fork on a collision). Precision is 1.0 by construction (the
    // chain scores candidates with the exact metric before thresholding);
    // recall quantifies what 4-band×2-hash banding loses near the
    // threshold. Truth is eval-corpus-only brute force, like sim_recall's
    // baseline.
    QueryDef("dd_recall")(
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 34
         |       OR doc_id < 40
         |  UNION ALL SELECT doc_id + 100000, text || ' extra'
         |    FROM documents WHERE doc_id < 20
         |  UNION ALL SELECT doc_id + 300000,
         |    substr(text, 1, CAST(FLOOR(length(text)*3/5) AS INT)) || ' y' || doc_id
         |    FROM documents WHERE doc_id < 40),
         | $lshPairsSql,
         | shk AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS sk FROM sh),
         | sz AS (SELECT doc_id, count(*) AS n_sh FROM shk GROUP BY 1),
         | t_inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
         |             FROM shk a JOIN shk b ON a.sk = b.sk AND a.doc_id < b.doc_id
         |             GROUP BY 1, 2),
         | truth AS (SELECT doc_a, doc_b FROM t_inter
         |           JOIN sz na ON na.doc_id = doc_a
         |           JOIN sz nb ON nb.doc_id = doc_b
         |           WHERE n_inter / (na.n_sh + nb.n_sh - n_inter) >= 0.5),
         | f_inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter
         |             FROM pairs p
         |             JOIN shk sa ON sa.doc_id = p.doc_a
         |             JOIN shk sb ON sb.doc_id = p.doc_b AND sb.sk = sa.sk
         |             GROUP BY 1, 2),
         | found AS (SELECT p.doc_a, p.doc_b FROM pairs p
         |           LEFT JOIN f_inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         |           JOIN sz na ON na.doc_id = p.doc_a
         |           JOIN sz nb ON nb.doc_id = p.doc_b
         |           WHERE round(coalesce(i.n_inter, 0)
         |             / (na.n_sh + nb.n_sh - coalesce(i.n_inter, 0)), 6) >= 0.5),
         | hit AS (SELECT f.doc_a FROM found f JOIN truth t
         |         ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b)
         | SELECT (SELECT count(*) FROM truth) AS n_truth,
         |   (SELECT count(*) FROM found) AS n_found,
         |   (SELECT count(*) FROM hit) AS n_correct,
         |   round((SELECT count(*) FROM hit) * 1.0
         |     / (SELECT count(*) FROM found), 6) AS prec,
         |   round((SELECT count(*) FROM hit) * 1.0
         |     / (SELECT count(*) FROM truth), 6) AS rec
         | ORDER BY n_truth""".stripMargin
    ) { (s, dir) =>
      // high-J suffix twins (banding always catches) + mid-J 60%-prefix
      // twins (J ≈ 0.45–0.6 — the band where 4-band×2-hash banding
      // actually loses pairs), so the measured recall is informative.
      // Base corpus is a deterministic md5-bucket THIRD of documents
      // (twin bases kept — they carry the planted truth pairs): exact
      // truth is output-quadratic, and this row exists to pin the exact
      // estimator's CORRECTNESS, not to pay full-corpus truth in every
      // bench run — dd_recall_sampled is the operational form, and
      // TruthProbe/RecallProbe carry the scale evidence (r16, VERDICT
      // r15 #5: this was the chronically contended bench row).
      val dRaw = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val d = dRaw
        .where(graft.operators.Sampling.hashBucket(col("doc_id"), 100) < 34 ||
          col("doc_id") < 40)
      // Twins derive from doc_id < 40, which the OR branch keeps verbatim —
      // so derive them from the UNfiltered scan: the doc_id predicate pushes
      // to the parquet row groups, instead of riding the unpushable md5
      // disjunction through a full table scan per branch.
      val corpus = d
        .unionAll(dRaw.where(col("doc_id") < 20)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" extra")).as("text")))
        .unionAll(dRaw.where(col("doc_id") < 40)
          .select((col("doc_id") + 300000).as("doc_id"),
            concat(
              expr("substring(text, 1, CAST(FLOOR(length(text)*3/5) AS INT))"),
              lit(" y"), col("doc_id").cast("string")).as("text")))
      val truth = Dedup.exactNearDupTruth(corpus, 0.5)
        .select(col("doc_a"), col("doc_b"))
      val found = Dedup.nearDupScores(corpus)
        .where(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"))
      val correct = found.join(truth, Seq("doc_a", "doc_b"))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(found.agg(count(lit(1)).as("n_found")))
        .crossJoin(correct.agg(count(lit(1)).as("n_correct")))
        .select(col("n_truth"), col("n_found"), col("n_correct"),
          round(col("n_correct").cast("double") / col("n_found"), 6).as("prec"),
          round(col("n_correct").cast("double") / col("n_truth"), 6).as("rec"))
        .orderBy(col("n_truth"))
    },

    // SAMPLED recall estimation (r15) — the operational form of dd_recall:
    // full-corpus exact truth is output-bounded-QUADRATIC (a corpus of
    // mutual near-dups has a quadratic true pair set), so at 100 TB the
    // recall monitor runs on a deterministic md5-bucket doc sample (the
    // smp_hash discipline): truth = exactNearDupTruth over the SAMPLED
    // sub-corpus (≡ the full truth restricted to pairs with BOTH ends
    // sampled — a pair's Jaccard doesn't depend on other docs), found =
    // the PRODUCTION chain over the full corpus restricted to the same
    // both-ends-sampled pairs (a pure-row-property filter, no join), so
    // the estimator measures the chain as it actually runs. Each true
    // pair survives with probability p², and the hit/truth ratio is a
    // consistent estimator of recall; truth cost scales by ~p². The
    // EXPLAIN.md note compares estimate vs dd_recall's full number on
    // this fixture (binomial agreement).
    QueryDef("dd_recall_sampled")({
      val smp = (c: String) =>
        s"('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 8))::BIGINT % 100 < 50"
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 100000, text || ' extra'
         |    FROM documents WHERE doc_id < 20
         |  UNION ALL SELECT doc_id + 300000,
         |    substr(text, 1, CAST(FLOOR(length(text)*3/5) AS INT)) || ' y' || doc_id
         |    FROM documents WHERE doc_id < 40),
         | $lshPairsSql,
         | shk AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS sk FROM sh),
         | sz AS (SELECT doc_id, count(*) AS n_sh FROM shk GROUP BY 1),
         | shks AS (SELECT * FROM shk WHERE ${smp("doc_id")}),
         | t_inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
         |             FROM shks a JOIN shks b ON a.sk = b.sk AND a.doc_id < b.doc_id
         |             GROUP BY 1, 2),
         | truth AS (SELECT doc_a, doc_b FROM t_inter
         |           JOIN sz na ON na.doc_id = doc_a
         |           JOIN sz nb ON nb.doc_id = doc_b
         |           WHERE n_inter / (na.n_sh + nb.n_sh - n_inter) >= 0.5),
         | f_inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter
         |             FROM pairs p
         |             JOIN shk sa ON sa.doc_id = p.doc_a
         |             JOIN shk sb ON sb.doc_id = p.doc_b AND sb.sk = sa.sk
         |             GROUP BY 1, 2),
         | found AS (SELECT p.doc_a, p.doc_b FROM pairs p
         |           LEFT JOIN f_inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         |           JOIN sz na ON na.doc_id = p.doc_a
         |           JOIN sz nb ON nb.doc_id = p.doc_b
         |           WHERE round(coalesce(i.n_inter, 0)
         |             / (na.n_sh + nb.n_sh - coalesce(i.n_inter, 0)), 6) >= 0.5
         |             AND ${smp("p.doc_a")} AND ${smp("p.doc_b")}),
         | hit AS (SELECT f.doc_a FROM found f JOIN truth t
         |         ON t.doc_a = f.doc_a AND t.doc_b = f.doc_b)
         | SELECT (SELECT count(*) FROM truth) AS n_truth,
         |   (SELECT count(*) FROM found) AS n_found,
         |   (SELECT count(*) FROM hit) AS n_correct,
         |   round((SELECT count(*) FROM hit) * 1.0
         |     / (SELECT count(*) FROM found), 6) AS prec,
         |   round((SELECT count(*) FROM hit) * 1.0
         |     / (SELECT count(*) FROM truth), 6) AS rec
         | ORDER BY n_truth""".stripMargin
    }) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d
        .unionAll(d.where(col("doc_id") < 20)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(col("text"), lit(" extra")).as("text")))
        .unionAll(d.where(col("doc_id") < 40)
          .select((col("doc_id") + 300000).as("doc_id"),
            concat(
              expr("substring(text, 1, CAST(FLOOR(length(text)*3/5) AS INT))"),
              lit(" y"), col("doc_id").cast("string")).as("text")))
      def sampled(c: org.apache.spark.sql.Column) =
        graft.operators.Sampling.hashBucket(c, 100) < 50
      // truth at SAMPLE scale (the ~p² cost cut); found = the production
      // chain over the FULL corpus, pure-row-property restricted
      val truth = Dedup.exactNearDupTruth(corpus.where(sampled(col("doc_id"))), 0.5)
        .select(col("doc_a"), col("doc_b"))
      val found = Dedup.nearDupScores(corpus)
        .where(col("jaccard") >= 0.5)
        .where(sampled(col("doc_a")) && sampled(col("doc_b")))
        .select(col("doc_a"), col("doc_b"))
      val correct = found.join(truth, Seq("doc_a", "doc_b"))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(found.agg(count(lit(1)).as("n_found")))
        .crossJoin(correct.agg(count(lit(1)).as("n_correct")))
        .select(col("n_truth"), col("n_found"), col("n_correct"),
          round(col("n_correct").cast("double") / col("n_found"), 6).as("prec"),
          round(col("n_correct").cast("double") / col("n_truth"), 6).as("rec"))
        .orderBy(col("n_truth"))
    },

    // Asymmetric containment: n_inter/n_a ≈ 1 flags doc_a as (near-)subset
    // of doc_b — quote inclusion / boilerplate subsumption that symmetric
    // Jaccard under-scores. Same candidate-only cost model; one shared
    // overlap-stats pass serves both directions.
    QueryDef("dd_containment")(
      s"""WITH $plantedNearSql,
         | $lshPairsSql,
         | inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter
         |           FROM pairs p
         |           JOIN sh sa ON sa.doc_id = p.doc_a
         |           JOIN sh sb ON sb.doc_id = p.doc_b AND ('0x' || substr(md5(sb.shingle), 1, 15))::BIGINT = ('0x' || substr(md5(sa.shingle), 1, 15))::BIGINT
         |           GROUP BY 1, 2),
         | sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1)
         | SELECT p.doc_a, p.doc_b,
         |   round(coalesce(i.n_inter, 0) / na.n_sh, 6) AS cont_a,
         |   round(coalesce(i.n_inter, 0) / nb.n_sh, 6) AS cont_b
         | FROM pairs p
         | LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         | JOIN sizes na ON na.doc_id = p.doc_a
         | JOIN sizes nb ON nb.doc_id = p.doc_b
         | ORDER BY p.doc_a, p.doc_b""".stripMargin
    ) { (s, dir) =>
      // Dedup-first with orientation-aware expansion: the asymmetric
      // (cont_a, cont_b) swap with the member-pair re-canonicalization.
      // Same pair set + scores as the doc-level chain (oracle is doc-level),
      // at distinct-text cost — the dup-dense 10×-docs probe measured the
      // doc-level wiring at 15.3 s vs 2.9 s dedup-first.
      Dedup.containmentDedup(plantedNear(s, dir))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Containment with the dd_edit_gated recipe (VERDICT r13 #6): the
    // minhash seed-agreement floor (≥ 4 of 8 — estimated Jaccard ≥ 0.5,
    // values already in hand from the banding aggregate) cuts the pair
    // spine BEFORE the overlap-stats intersection join — the ungated
    // row's cost center — and a max(cont_a, cont_b) ≥ 0.5 output floor
    // shrinks the expansion. The oracle mirrors both gates verbatim
    // (agreement from the same mh CTE, the floor as a WHERE on rounded
    // scores). Contract boundary: agreement estimates JACCARD, so an
    // extreme-asymmetry subset pair (high containment, low Jaccard) can
    // fail the floor — that regime belongs to the ungated dd_containment;
    // ContainGateProbe measures the empirical identity + the cost A/B.
    QueryDef("dd_containment_gated")(
      s"""WITH $plantedNearSql,
         | $lshPairsSql,
         | agree AS (SELECT p.doc_a, p.doc_b FROM pairs p
         |           JOIN mh a ON a.doc_id = p.doc_a
         |           JOIN mh b ON b.doc_id = p.doc_b AND b.seed = a.seed AND b.h = a.h
         |           GROUP BY 1, 2 HAVING count(*) >= 4),
         | inter AS (SELECT g.doc_a, g.doc_b, count(*) AS n_inter
         |           FROM agree g
         |           JOIN sh sa ON sa.doc_id = g.doc_a
         |           JOIN sh sb ON sb.doc_id = g.doc_b AND ('0x' || substr(md5(sb.shingle), 1, 15))::BIGINT = ('0x' || substr(md5(sa.shingle), 1, 15))::BIGINT
         |           GROUP BY 1, 2),
         | sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         | scored AS (SELECT g.doc_a, g.doc_b,
         |     round(coalesce(i.n_inter, 0) / na.n_sh, 6) AS cont_a,
         |     round(coalesce(i.n_inter, 0) / nb.n_sh, 6) AS cont_b
         |   FROM agree g
         |   LEFT JOIN inter i ON i.doc_a = g.doc_a AND i.doc_b = g.doc_b
         |   JOIN sizes na ON na.doc_id = g.doc_a
         |   JOIN sizes nb ON nb.doc_id = g.doc_b)
         | SELECT doc_a, doc_b, cont_a, cont_b FROM scored
         | WHERE greatest(cont_a, cont_b) >= 0.5
         | ORDER BY doc_a, doc_b""".stripMargin
    ) { (s, dir) =>
      Dedup.containmentDedupGated(plantedNear(s, dir), minCont = 0.5, minAgree = 4)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    QueryDef("dd_simhash")(
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
         | $simhashSql
         | SELECT doc_id, sig FROM sig ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Dedup.simhash(Tables(s, dir, "documents").where(col("doc_id") < 50))
        .orderBy(col("doc_id"))
    },

    // Oracle is brute-force Hamming ≤ 3 over all pairs of 64-bit signatures
    // — blocking-agnostic, so it stays equivalent to the engine's
    // 16-bit-band shuffle join by the pigeonhole completeness argument on
    // `Dedup.simhashPairs`.
    QueryDef("dd_simhash_pairs")(
      s"""WITH $plantedExactSql,
         | $simhash64Sql,
         | ham AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |           sum(CASE WHEN substr(a.sig, CAST(k.k AS INT), 1)
         |                      <> substr(b.sig, CAST(k.k AS INT), 1) THEN 1 ELSE 0 END) AS h
         |         FROM sig64 a JOIN sig64 b ON a.doc_id < b.doc_id
         |         CROSS JOIN range(1, 65) k(k) GROUP BY 1, 2)
         | SELECT doc_a, doc_b, CAST(h AS BIGINT) AS hamming
         | FROM ham WHERE h <= 3 ORDER BY doc_a, doc_b""".stripMargin
    ) { (s, dir) =>
      Dedup.simhashPairs(Dedup.simhash64(plantedExact(s, dir)))
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Character-level complement to shingle Jaccard: Levenshtein over the
    // SAME LSH candidate set (never all-pairs — per-pair cost is
    // quadratic in text length by contract).
    QueryDef("dd_edit")(
      s"""WITH $plantedNearSql,
         | $lshPairsSql
         | SELECT p.doc_a, p.doc_b,
         |   CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
         |   round(1.0 - levenshtein(a.text, b.text) / greatest(length(a.text), length(b.text)), 6) AS edit_sim
         | FROM pairs p
         | JOIN corpus a ON a.doc_id = p.doc_a
         | JOIN corpus b ON b.doc_id = p.doc_b
         | ORDER BY p.doc_a, p.doc_b""".stripMargin
    ) { (s, dir) =>
      val corpus = plantedNear(s, dir)
      Dedup.editSimilarity(corpus, Dedup.lshCandidatePairsDedup(corpus))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // The dup-dense-corpus composition: BOTH cheap pre-DP gates in front
    // of the quadratic kernel — a minhash seed-agreement floor (≥ 4 of 8
    // seed minima equal ⇒ estimated Jaccard ≥ 0.5; template-collision
    // pairs sharing one lucky band fail it with no text I/O) and the
    // length-difference Levenshtein bound against the 0.5 output floor.
    // The oracle mirrors both gates verbatim: agreement from the SAME mh
    // CTE, the output floor as a WHERE on the rounded score (the length
    // bound is invisible to results by construction — it only skips DPs
    // that cannot reach the floor).
    QueryDef("dd_edit_gated")(
      s"""WITH $plantedNearSql,
         | $lshPairsSql,
         | agree AS (SELECT p.doc_a, p.doc_b FROM pairs p
         |           JOIN mh a ON a.doc_id = p.doc_a
         |           JOIN mh b ON b.doc_id = p.doc_b AND b.seed = a.seed AND b.h = a.h
         |           GROUP BY 1, 2 HAVING count(*) >= 4)
         | SELECT g.doc_a, g.doc_b,
         |   CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
         |   round(1.0 - levenshtein(a.text, b.text) / greatest(length(a.text), length(b.text)), 6) AS edit_sim
         | FROM agree g
         | JOIN corpus a ON a.doc_id = g.doc_a
         | JOIN corpus b ON b.doc_id = g.doc_b
         | WHERE round(1.0 - levenshtein(a.text, b.text) / greatest(length(a.text), length(b.text)), 6) >= 0.5
         | ORDER BY g.doc_a, g.doc_b""".stripMargin
    ) { (s, dir) =>
      Dedup.editSimilarityGated(plantedNear(s, dir), minSim = 0.5, minAgree = 4)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Substring-level duplication via robust winnowing (Schleimer et al.
    // 2003): char-32-gram hashes, window-16 minima, docs sharing >= 3
    // fingerprints — catches verbatim copied PASSAGES that word-shingle
    // Jaccard under-scores in otherwise-different docs (the scalable
    // approximation of suffix-array substring dedup). Planted: docs < 20
    // re-emitted as (180-char prefix of the base) + a distinct tail, so
    // each planted doc shares a long passage with its base and nothing
    // else. The oracle replays the ENGINE's dedup-first semantics
    // verbatim — mega text groups (> 1000 copies) excluded wholesale,
    // fingerprints at representative (distinct-text) scale, the fp-bucket
    // cap counted over REPS (the rep-scale pair join is what the cap
    // budgets), within-group pairs carrying the rep's UNCAPPED fp count
    // (a doc always shares its own boilerplate with its own copies) —
    // so engine and oracle agree AT the cap boundary, not just below it.
    QueryDef("dd_substring")(
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |   UNION ALL SELECT doc_id + 100000,
         |     substr(text, 1, 180) || ' tail marker ' || CAST(doc_id AS VARCHAR)
         |   FROM documents WHERE doc_id < 20),
         | keyed AS (SELECT doc_id, md5(text) AS th FROM corpus),
         | okg AS (SELECT th FROM keyed GROUP BY th HAVING count(*) <= 1000),
         | members AS (SELECT k.doc_id, k.th FROM keyed k JOIN okg USING (th)),
         | rep AS (SELECT th, min(doc_id) AS rep FROM members GROUP BY 1),
         | rtexts AS (SELECT r.rep AS doc_id, c.text
         |            FROM rep r JOIN corpus c ON c.doc_id = r.rep),
         | grams AS (SELECT doc_id, i.i AS i,
         |     ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 32)), 1, 15))::BIGINT AS h,
         |     greatest(length(text) - 31, 1) AS n
         |   FROM rtexts JOIN range(1, 100000) i(i)
         |     ON i.i <= greatest(length(text) - 31, 1)),
         | wins AS (SELECT doc_id, i, n,
         |     min(h) OVER (PARTITION BY doc_id ORDER BY i
         |                  ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
         |   FROM grams),
         | fps AS (SELECT DISTINCT doc_id, fp FROM wins
         |         WHERE i <= greatest(n - 15, 1)),
         | cappedfps AS (SELECT f.doc_id, f.fp FROM fps f JOIN
         |                 (SELECT fp FROM fps GROUP BY fp
         |                  HAVING count(DISTINCT doc_id) <= 1000) ok
         |               USING (fp)),
         | reppairs AS (SELECT a.doc_id AS ra, b.doc_id AS rb,
         |     CAST(count(*) AS BIGINT) AS n_shared
         |   FROM cappedfps a JOIN cappedfps b
         |     ON a.fp = b.fp AND a.doc_id < b.doc_id
         |   GROUP BY 1, 2 HAVING count(*) >= 3),
         | crossp AS (SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
         |     greatest(ma.doc_id, mb.doc_id) AS doc_b, p.n_shared
         |   FROM reppairs p
         |   JOIN rep r1 ON r1.rep = p.ra
         |   JOIN rep r2 ON r2.rep = p.rb
         |   JOIN members ma ON ma.th = r1.th
         |   JOIN members mb ON mb.th = r2.th),
         | fpcnt AS (SELECT doc_id AS rep, CAST(count(*) AS BIGINT) AS n_shared
         |           FROM fps GROUP BY 1 HAVING count(*) >= 3),
         | withinp AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, fc.n_shared
         |   FROM members x JOIN members y
         |     ON x.th = y.th AND x.doc_id < y.doc_id
         |   JOIN rep r ON r.th = x.th
         |   JOIN fpcnt fc ON fc.rep = r.rep)
         | SELECT doc_a, doc_b, n_shared FROM
         |   (SELECT * FROM crossp UNION ALL SELECT * FROM withinp)
         | ORDER BY doc_a, doc_b""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.unionAll(d.where(col("doc_id") < 20)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(substring(col("text"), 1, 180), lit(" tail marker "),
            col("doc_id").cast("string")).as("text")))
      Dedup.substringDupPairs(corpus, k = 32, w = 16, minShared = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Substring-level decontamination: corpus docs carrying a VERBATIM
    // eval passage (>= k+w-1 = 47 chars), robust to the tokenization/
    // whitespace edits that shred word shingles. Planted: five corpus
    // docs embed an 80-char eval excerpt mid-text. Eval fingerprints
    // broadcast (benchmark-scale) into a LeftSemi; the corpus never
    // shuffles — dd_decontaminate's plan shape at the character level.
    QueryDef("dd_substring_decon")(
      s"""WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id < 5),
         | corpus AS (SELECT doc_id, text FROM documents WHERE doc_id >= 5
         |   UNION ALL SELECT doc_id + 100000,
         |     'leading filler words ' || substr(text, 1, 80) || ' trailing filler'
         |   FROM documents WHERE doc_id < 5),
         | cg AS (SELECT doc_id, i.i AS i,
         |     ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 32)), 1, 15))::BIGINT AS h,
         |     greatest(length(text) - 31, 1) AS n
         |   FROM corpus JOIN range(1, 100000) i(i)
         |     ON i.i <= greatest(length(text) - 31, 1)),
         | cw AS (SELECT doc_id, i, n,
         |     min(h) OVER (PARTITION BY doc_id ORDER BY i
         |                  ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
         |   FROM cg),
         | cf AS (SELECT DISTINCT doc_id, fp FROM cw WHERE i <= greatest(n - 15, 1)),
         | eg AS (SELECT doc_id, i.i AS i,
         |     ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 32)), 1, 15))::BIGINT AS h,
         |     greatest(length(text) - 31, 1) AS n
         |   FROM ev JOIN range(1, 100000) i(i)
         |     ON i.i <= greatest(length(text) - 31, 1)),
         | ew AS (SELECT doc_id, i, n,
         |     min(h) OVER (PARTITION BY doc_id ORDER BY i
         |                  ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
         |   FROM eg),
         | ef AS (SELECT DISTINCT fp FROM ew WHERE i <= greatest(n - 15, 1))
         | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
         | FROM cf JOIN ef USING (fp)
         | GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val ev = d.where(col("doc_id") < 5)
      val corpus = d.where(col("doc_id") >= 5)
        .unionAll(ev.select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("leading filler words "), substring(col("text"), 1, 80),
            lit(" trailing filler")).as("text")))
      Dedup.substringContamination(corpus, ev).orderBy(col("doc_id"))
    },

    // EXACT duplicated-substring spans (Lee et al. 2021's ExactSubstr
    // semantics, here hash-prefilter + exact-substring grouping instead
    // of a suffix array): every 40-char window occurring at 2+ positions
    // corpus-wide marks all its occurrences except the globally-first
    // (min (doc_id, pos)); marked positions merge per doc into maximal
    // half-open spans. The oracle replays all-windows, first-occurrence
    // election, and the lag-window island merge verbatim. Linear in
    // corpus chars — the exact complement of winnowing's sampled
    // fingerprints (dd_substring).
    QueryDef("dd_exact_substring")(
      s"""WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents WHERE len(text) >= 40),
        | w AS (SELECT doc_id, i.i AS pos, substr(text, CAST(i.i AS INT), 40) AS win
        |       FROM d JOIN range(1, 100000) i(i) ON i.i <= n - 39),
        | g AS (SELECT win, count(*) AS c, min(doc_id * 10000000 + pos) AS fkey FROM w GROUP BY 1),
        | m AS (SELECT w.doc_id, w.pos FROM w JOIN g USING (win)
        |       WHERE g.c > 1 AND w.doc_id * 10000000 + w.pos <> g.fkey),
        | ${islandSpanTailSql("m")}""".stripMargin
    ) { (s, dir) =>
      Dedup.exactSubstringSpans(Tables(s, dir, "documents"), L = 40)
        .orderBy(col("doc_id"), col("span_start"))
    },

    // The cut itself: every doc's kept text is the ordered concatenation
    // of the gaps between its merged duplicated spans (docs without spans
    // pass through). The oracle rebuilds gaps with a lag window + ordered
    // string_agg; the engine folds each doc's own span list in one
    // nested-HOF aggregate — candidate-scale per row, no corpus shuffle
    // beyond the doc_id join.
    QueryDef("dd_exact_clean")(
      """WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents WHERE len(text) >= 40),
        | w AS (SELECT doc_id, i.i AS pos, substr(text, CAST(i.i AS INT), 40) AS win
        |       FROM d JOIN range(1, 100000) i(i) ON i.i <= n - 39),
        | g AS (SELECT win, count(*) AS c, min(doc_id * 10000000 + pos) AS fkey FROM w GROUP BY 1),
        | m AS (SELECT w.doc_id, w.pos FROM w JOIN g USING (win)
        |       WHERE g.c > 1 AND w.doc_id * 10000000 + w.pos <> g.fkey),
        | b AS (SELECT doc_id, pos,
        |         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
        |              OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 40
        |              THEN 1 ELSE 0 END AS brk FROM m),
        | s AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM b),
        | sp AS (SELECT doc_id, min(pos) AS ss, max(pos) + 40 AS se FROM s GROUP BY doc_id, grp),
        | gaps AS (
        |   SELECT doc_id,
        |     coalesce(lag(se) OVER (PARTITION BY doc_id ORDER BY ss), 1) AS gs,
        |     ss AS ge
        |   FROM sp
        |   UNION ALL
        |   SELECT sp.doc_id, max(sp.se), max(dd.n) + 1
        |   FROM sp JOIN (SELECT doc_id, len(text) AS n FROM documents) dd USING (doc_id)
        |   GROUP BY sp.doc_id),
        | cleaned AS (SELECT doc_id,
        |     string_agg(substr(text, CAST(gs AS INT), CAST(ge - gs AS INT)), '' ORDER BY gs) AS clean_text
        |   FROM gaps JOIN documents USING (doc_id) GROUP BY doc_id)
        | SELECT dd.doc_id, coalesce(c.clean_text, dd.text) AS clean_text
        | FROM documents dd LEFT JOIN cleaned c USING (doc_id)
        | ORDER BY dd.doc_id""".stripMargin
    ) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      Dedup.removeSpans(docs, Dedup.exactSubstringSpans(docs, L = 40))
        .orderBy(col("doc_id"))
    },

    // EXACT substring decontamination: corpus spans that verbatim-match
    // ANY eval-set 40-char window (every occurrence marked — leakage has
    // no "first keeps"), merged per doc, ready for removeSpans. Planted:
    // five corpus docs embed a 120-char eval passage inside filler; the
    // span must land exactly on the embedded passage. Eval hashes and
    // window texts broadcast; the corpus never shuffles by hash.
    QueryDef("dd_exact_decon")(
      s"""WITH ev AS (SELECT text FROM documents WHERE doc_id < 5),
        | corpus AS (SELECT doc_id, text FROM documents WHERE doc_id >= 5
        |   UNION ALL SELECT doc_id + 100000,
        |     'prefix filler block ' || substr(text, 10, 120) || ' suffix filler block'
        |   FROM documents WHERE doc_id < 5),
        | ew AS (SELECT DISTINCT substr(text, CAST(i.i AS INT), 40) AS win
        |        FROM ev JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39),
        | cw AS (SELECT doc_id, i.i AS pos, substr(text, CAST(i.i AS INT), 40) AS win
        |        FROM corpus JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39),
        | m AS (SELECT cw.doc_id, cw.pos FROM cw JOIN ew USING (win)),
        | ${islandSpanTailSql("m")}""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val ev = d.where(col("doc_id") < 5)
      val corpus = d.where(col("doc_id") >= 5)
        .unionAll(ev.select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("prefix filler block "), substring(col("text"), 10, 120),
            lit(" suffix filler block")).as("text")))
      Dedup.exactContaminationSpans(corpus, ev, L = 40)
        .orderBy(col("doc_id"), col("span_start"))
    },

    // Cluster formation: LSH candidate pairs → connected components →
    // (doc_id, cluster_id = component min). The engine runs alternating
    // large-star/small-star rounds (O(log² n), chain-safe); the oracle is a
    // blocking-agnostic recursive-CTE label propagation over the SAME pair
    // set — any correct CC algorithm agrees, so the check pins transitive
    // closure semantics without pinning the iteration strategy.
    QueryDef("dd_cluster")(
      s"""WITH RECURSIVE $plantedChainSql,
         | $lshPairsSql,
         | und AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |         UNION SELECT doc_b, doc_a FROM pairs),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v)
         | SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
         | FROM reach GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      // Rep-level CC + member label inheritance: identical labels to CC
      // over the expanded pair graph, with the edge set at distinct-text
      // scale instead of Σk² duplicate cliques.
      Dedup.clusterDedupFirst(plantedChain(s, dir))
        .orderBy(col("doc_id"))
    },

    // Quality-aware canonical selection: within each near-dup cluster the
    // surviving member is the QUALITY argmax (score DESC, doc_id ASC) —
    // the published keep-the-best-representative policy — not the id
    // accident dd_* keep-first rows use. The planted chain's generations
    // differ in length, so the pick is frequently NOT the min id and the
    // oracle (recursive-CTE CC + the same lrQuality arithmetic + a
    // row_number window) hash-checks which member actually survives.
    QueryDef("dd_canonical")(
      s"""WITH RECURSIVE $plantedChainSql,
         | $lshPairsSql,
         | und AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |         UNION SELECT doc_b, doc_a FROM pairs),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v),
         | lbl AS (SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
         |         FROM reach GROUP BY 1),
         | sc AS (SELECT doc_id, round(1.0 / (1.0 + exp(-(-3.0
         |       + 0.4 * ((length(text) - (len(string_split(text,' ')) - 1)) / len(string_split(text,' ')))
         |       + 6.0 * (len(list_filter(string_split(text,' '), t -> t IN ('the','a','and','of','to'))) / len(string_split(text,' ')))
         |       + 0.35 * ln(1.0 + len(string_split(text,' ')))))), 6) AS score
         |     FROM corpus)
         | SELECT l.doc_id, l.cluster_id, s.score,
         |   CAST(row_number() OVER (PARTITION BY cluster_id
         |     ORDER BY score DESC, l.doc_id) = 1 AS INT) AS keep
         | FROM lbl l JOIN sc s ON l.doc_id = s.doc_id
         | ORDER BY l.doc_id""".stripMargin
    ) { (s, dir) =>
      val chain = plantedChain(s, dir)
      val labels = Dedup.clusterDedupFirst(chain)
      val scores = TextAnalysis.lrQuality(chain)
        .select(col("doc_id"), col("lr_score").as("score"))
      Dedup.canonicalByQuality(labels, scores).orderBy(col("doc_id"))
    },

    // PURGE from a standing labeling — the takedown capstone (r15): a
    // doc-id set leaves the clustering, and because a purged doc may be
    // the only bridge between two near-dup groups (a cut vertex), the
    // touched components re-solve from the standing PAIR evidence minus
    // purged-incident edges while untouched labels pass through. The
    // oracle recomputes connected components FROM SCRATCH over the
    // filtered pair set — a hash match is the purged==rebuilt-without
    // theorem on this fixture. The planted chain makes the middle
    // generation (+100000) a real bridge candidate, so the purge set
    // (two originals + three middles) exercises both split and shrink.
    QueryDef("dd_purge")(
      s"""WITH RECURSIVE $plantedChainSql,
         | $lshPairsSql,
         | pp AS (SELECT doc_a, doc_b FROM pairs
         |        WHERE doc_a NOT IN (3, 14, 100005, 100006, 100007)
         |          AND doc_b NOT IN (3, 14, 100005, 100006, 100007)),
         | und AS (SELECT doc_a AS u, doc_b AS v FROM pp
         |         UNION SELECT doc_b, doc_a FROM pp),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v)
         | SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
         | FROM reach GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val corpus = plantedChain(s, dir)
      // Standing labeling + standing pair evidence persisted once per
      // testdata fingerprint (r20): a takedown purges STANDING state — in
      // production both artifacts exist long before the erasure request.
      // The labeling artifact is the same `cluster-labels` the increment
      // rows probe; purgeFromClusters only reads them (the purged
      // labeling is its return value), so no per-run copy is needed.
      val lblDir = cachedArtifact(dir, "cluster-labels", corpus)(out =>
        Dedup.clusterDedupFirst(corpus)
          .write.mode("overwrite").parquet(s"$out/data"))
      val labels = s.read.schema("doc_id LONG, cluster_id LONG")
        .parquet(s"$lblDir/data")
      val prDir = cachedArtifact(dir, "cluster-pairs", corpus)(out =>
        Dedup.lshCandidatePairsDedup(corpus)
          .write.mode("overwrite").parquet(s"$out/data"))
      val pairs = s.read.schema("doc_a LONG, doc_b LONG")
        .parquet(s"$prDir/data")
      val purged = corpus
        .where(col("doc_id").isin(3L, 14L, 100005L, 100006L, 100007L))
        .select(col("doc_id"))
      graft.operators.Purge.purgeFromClusters(labels, pairs, purged)
        .orderBy(col("doc_id"))
    },

    // PURGE from the persisted cross-near-dup LSH index (r15), BOTH
    // stages driver-checked (the BM25 split): the LOGICAL purge
    // tombstones every doc_id % 7 == 2 (O(purge-set) — probes mask the
    // ids BEFORE the read-time bucket cap, so cap boundaries re-derive
    // over the surviving union), then COMPACTION rewrites shingle_keys
    // and buckets under the two-phase staged swap. The oracle runs the
    // identical chain over the SURVIVING corpus from scratch, duplicated
    // per stage — a hash match proves probe-identity with a
    // never-built-in index before AND after the bytes leave.
    QueryDef("dd_purge_indexed")(
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 2),
         | batch AS (SELECT doc_id + 200000 AS doc_id, text || ' extra' AS text
         |             FROM documents WHERE doc_id < 30
         |           UNION ALL SELECT doc_id + 300000, text
         |             FROM documents WHERE doc_id >= 30 AND doc_id < 40
         |           UNION ALL SELECT doc_id + 400000, upper(text)
         |             FROM documents WHERE doc_id >= 40 AND doc_id < 60),
         | ${lshCappedBandsSql("corpus", "c")},
         | ${lshCappedBandsSql("batch", "b")},
         | cand AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
         |          FROM bcapped b JOIN ccapped c
         |            ON b.band = c.band AND b.sig = c.sig),
         | inter AS (SELECT cd.batch_id, cd.corpus_id, count(*) AS n_inter
         |           FROM cand cd
         |           JOIN bsh sb ON sb.doc_id = cd.batch_id
         |           JOIN csh sc ON sc.doc_id = cd.corpus_id
         |             AND ('0x' || substr(md5(sc.shingle), 1, 15))::BIGINT
         |               = ('0x' || substr(md5(sb.shingle), 1, 15))::BIGINT
         |           GROUP BY 1, 2),
         | nb AS (SELECT doc_id, count(*) AS n_b FROM bsh GROUP BY 1),
         | nc AS (SELECT doc_id, count(*) AS n_c FROM csh GROUP BY 1),
         | probe AS (SELECT * FROM (
         |   SELECT i.batch_id, i.corpus_id,
         |     round(i.n_inter / (b.n_b + c.n_c - i.n_inter), 6) AS jaccard
         |   FROM inter i
         |   JOIN nb b ON b.doc_id = i.batch_id
         |   JOIN nc c ON c.doc_id = i.corpus_id)
         |  WHERE jaccard >= 0.5)
         | SELECT CAST(0 AS BIGINT) AS stage, batch_id, corpus_id, jaccard FROM probe
         | UNION ALL SELECT CAST(1 AS BIGINT), batch_id, corpus_id, jaccard FROM probe
         | ORDER BY stage, batch_id, corpus_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = d.where(col("doc_id") < 30)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
        .unionAll(d.where(col("doc_id") >= 30 && col("doc_id") < 40)
          .select((col("doc_id") + 300000).as("doc_id"), col("text")))
        .unionAll(d.where(col("doc_id") >= 40 && col("doc_id") < 60)
          .select((col("doc_id") + 400000).as("doc_id"), upper(col("text")).as("text")))
      val st = java.nio.file.Files.createTempDirectory("graft-xpurge-q")
      val idx = s"$st/index"
      val tB = System.nanoTime()
      // Standing cross index persisted once per testdata fingerprint; the
      // purge/compact verbs MUTATE it, so each run works on a filesystem
      // COPY (r20 — the txt_bm25_purged treatment). NOTE this index is
      // over the FULL corpus `d` (purge removes ids afterwards), unlike
      // the `cross-index` artifact (same corpus, different consumer
      // population is fine — the artifact key is (name, data dir)).
      val built = cachedArtifact(dir, "xpurge-cross-index", d) { out =>
        Dedup.buildCrossNearDupIndex(d, s"$out/idx")
      }
      copyRecursively(java.nio.file.Paths.get(built, "idx"),
        java.nio.file.Paths.get(idx))
      fixtureSecs.put("xpurge-build", (System.nanoTime() - tB) / 1e9)
      Dedup.purgeFromCrossNearDupIndex(s, idx,
        d.where(col("doc_id") % 7 === 2).select(col("doc_id")))
      val logical = Dedup.crossNearDupIndexed(s, idx, batch, threshold = 0.5)
        .select(lit(0L).as("stage"), col("batch_id"), col("corpus_id"),
          col("jaccard"))
        .localCheckpoint(true)
      Dedup.compactCrossNearDupIndex(s, idx)
      val compacted = Dedup.crossNearDupIndexed(s, idx, batch, threshold = 0.5)
        .select(lit(1L).as("stage"), col("batch_id"), col("corpus_id"),
          col("jaccard"))
        .localCheckpoint(true)
      val out = logical.unionAll(compacted)
        .orderBy(col("stage"), col("batch_id"), col("corpus_id"))
      deleteRecursively(st)
      out
    },

    // ONE-CALL takedown orchestration (r16): a real PII erasure is one
    // doc-id set against EVERY standing artifact. This row stands up
    // ten artifact families over the same corpus (BM25, LSH cross
    // index, exact-window index, IVF-PQ codes, dHash + audio signature
    // indexes, drift histograms, the n-gram LM model, a keyed Z-order
    // layout, and a seeded curation-loop state), runs
    // Takedown.purgeEverywhere over one
    // literal id set, and outputs the AUDIT MANIFEST — (family,
    // ids_found), the "we looked here, found these, removed them" trail.
    // The oracle recomputes every family's found-count from the same
    // tables; in-row requires additionally pin the post-purge absence of
    // the ids from each id-bearing artifact (each family's
    // purged==rebuilt-without theorem is its own oracle row's job).
    QueryDef("dd_purge_everywhere")(
      """WITH p(id) AS (VALUES (3),(13),(23),(33),(43),(53))
        | SELECT family, ids_found FROM (
        |   SELECT 'audio_fp' AS family,
        |     (SELECT CAST(count(*) AS BIGINT) FROM p WHERE id < 24) AS ids_found
        |   UNION ALL SELECT 'bm25',
        |     (SELECT CAST(count(*) AS BIGINT) FROM documents
        |      WHERE doc_id IN (SELECT id FROM p))
        |   UNION ALL SELECT 'cross_neardup',
        |     (SELECT CAST(count(*) AS BIGINT) FROM documents
        |      WHERE doc_id IN (SELECT id FROM p))
        |   UNION ALL SELECT 'curation_loop',
        |     (SELECT CAST(count(*) AS BIGINT) FROM documents
        |      WHERE doc_id < 40 AND doc_id IN (SELECT id FROM p))
        |   UNION ALL SELECT 'dhash',
        |     (SELECT CAST(count(*) AS BIGINT) FROM p WHERE id < 24)
        |   UNION ALL SELECT 'drift',
        |     (SELECT CAST(count(*) AS BIGINT) FROM documents
        |      WHERE doc_id IN (SELECT id FROM p))
        |   UNION ALL SELECT 'exact_window', CAST(-1 AS BIGINT)
        |   UNION ALL SELECT 'ivfpq',
        |     (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        |      WHERE vec_id IN (SELECT id FROM p))
        |   UNION ALL SELECT 'keyed_layout',
        |     (SELECT CAST(count(*) AS BIGINT) FROM documents
        |      WHERE doc_id IN (SELECT id FROM p))
        |   UNION ALL SELECT 'lm_model',
        |     (SELECT CAST(count(*) AS BIGINT) FROM documents
        |      WHERE doc_id IN (SELECT id FROM p))
        | ) ORDER BY family""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      import graft.operators.Takedown
      val d = Tables(s, dir, "documents")
      val dt = d.select(col("doc_id"), col("text"))
      val e = Tables(s, dir, "embeddings")
      val ids = Seq(3L, 13L, 23L, 33L, 43L, 53L).toDF("doc_id")
      val media = Multimodal.syntheticImageVariants(
        s.range(0, 24).select(col("id").as("doc_id"), col("id").as("key"),
          lit(0).as("delta"), lit(0).as("spot")))
      val clips = Multimodal.syntheticAudioVariants(
        s.range(0, 24).select(col("id").as("doc_id"), col("id").as("key"),
          lit(1).as("gain"), lit(0).as("retouch")))
      val features = Seq(
        "chars" -> floor(length(col("text")) / lit(256)),
        "lang" -> col("lang"))
      val st = java.nio.file.Files.createTempDirectory("graft-purge-all-q")
      val tB = System.nanoTime()
      // The ten standing artifacts persist once per testdata fingerprint
      // (r20, the dd_cluster_increment treatment — this row measures the
      // TAKEDOWN, which by definition mutates every artifact, so each run
      // purges a filesystem COPY of the pristine bundle). The fingerprint
      // frame folds in every input the builds read: documents' text, lang
      // and n_chars (drift bins, keyed layout) and the embeddings
      // (IVF-PQ); the media/clip fixtures derive from constants. Cold
      // build (ten independent builds, overlapped per guide §2.6) lands
      // in build_sec; fixture_sec now records the per-run copy.
      val fpFrame = d.select(col("doc_id"),
          concat_ws("␞", col("text"), col("lang"),
            col("n_chars").cast("string")).as("text"))
        .unionAll(e.select(col("vec_id").as("doc_id"),
          col("embedding").cast("string").as("text")))
      val built = cachedArtifact(dir, "purge-all-artifacts", fpFrame) { out =>
        graft.operators.Par.runUnit(Seq(
          () => Retrieval.buildBm25Index(dt, s"$out/a/bm25"),
          () => Dedup.buildCrossNearDupIndex(dt, s"$out/a/cross"),
          () => Dedup.buildExactWindowIndex(dt, s"$out/a/win"),
          () => Similarity.buildIvfPqIndex(e, s"$out/a/ivfpq"),
          () => Multimodal.buildDHashIndex(media, s"$out/a/dhash"),
          () => Multimodal.buildAudioFpIndex(clips, s"$out/a/afp"),
          () => graft.operators.Curation.buildDriftIndex(d, features,
            s"$out/a/drift"),
          () => graft.operators.LangModel.buildLmIndex(dt, s"$out/a/lm"),
          () => graft.operators.Layout.initKeyedLayout(
            d.select(col("doc_id"), col("n_chars")),
            Seq("doc_id", "n_chars"), s"$out/a/layout", files = 2),
          () => graft.streaming.Streams.seedCurationState(
            dt.where(col("doc_id") < 40), s"$out/a/loop-idx",
            s"$out/a/loop-lbl", threshold = 0.8)))
      }
      copyRecursively(java.nio.file.Paths.get(built, "a"), st)
      fixtureSecs.put("purge-all-build", (System.nanoTime() - tB) / 1e9)
      // deploymentRoot engages the completeness guard: every artifact the
      // fixture stood up must be covered by a declared target, or the
      // takedown fails loudly BEFORE purging anything (r17)
      val audit = Takedown.purgeEverywhere(s, ids, deploymentRoot = Some(st.toString), targets = Seq(
          Takedown.Bm25(s"$st/bm25", compact = true),
          Takedown.CrossNearDup(s"$st/cross", compact = true),
          Takedown.ExactWindow(s"$st/win", ingestBatch = -1L,
            survivors = dt.join(ids, Seq("doc_id"), "left_anti")),
          Takedown.IvfPq(s"$st/ivfpq"),
          Takedown.DHash(s"$st/dhash"),
          Takedown.AudioFp(s"$st/afp"),
          Takedown.Drift(s"$st/drift", features,
            purgedRows = d.join(ids, Seq("doc_id"), "left_semi"), purgeId = 0L),
          Takedown.LmModel(s"$st/lm",
            purgedRows = dt.join(ids, Seq("doc_id"), "left_semi"), purgeId = 0L),
          Takedown.KeyedLayout(s"$st/layout", "doc_id", files = 2),
          Takedown.CurationLoop(s"$st/loop-idx", s"$st/loop-lbl")))
        .localCheckpoint(true)
      // per-FAMILY purge walls into fixture_sec (r19): this is the
      // catalog's most expensive row and its scope grows with every new
      // persisted family — the audit manifest already times each
      // family's purge, so surface the split for the bench archive
      // (k rows, already checkpointed — driver-side metadata)
      audit.select(col("family"), col("sec")).collect().foreach(r =>
        fixtureSecs.put(s"purge-${r.getString(0)}", r.getDouble(1)))
      // erasure post-conditions, fail-loud in-row: no id-bearing
      // artifact still holds any requested id
      def none(df: org.apache.spark.sql.DataFrame, idCol: String,
          what: String): Unit =
        require(df.select(col(idCol).as("doc_id"))
          .join(ids, Seq("doc_id"), "left_semi").isEmpty,
          s"$what still holds purged ids after purgeEverywhere")
      // seven independent absence probes — overlapped like the builds
      graft.operators.Par.runUnit(Seq(
        () => none(s.read.parquet(s"$st/bm25/postings"), "doc_id",
          "bm25 postings"),
        () => none(s.read.schema("doc_id LONG, sk LONG")
          .parquet(s"$st/cross/shingle_keys"), "doc_id", "cross index"),
        () => none(s.read.parquet(s"$st/ivfpq/codes"), "vec_id", "ivfpq codes"),
        () => none(Multimodal.standingDHashes(s, s"$st/dhash"), "doc_id",
          "dhash"),
        () => none(Multimodal.standingAudioFps(s, s"$st/afp"), "doc_id",
          "audio fp"),
        () => none(s.read.parquet(s"$st/layout"), "doc_id", "keyed layout"),
        () => none(s.read.schema("doc_id LONG, sk LONG")
          .parquet(s"$st/loop-idx/shingle_keys"), "doc_id", "loop index")))
      val out = audit.select(col("family"), col("ids_found"))
        .orderBy(col("family")).localCheckpoint(true)
      deleteRecursively(st)
      out
    },

    // Incremental cluster maintenance: a batch of near-copies arrives, its
    // cross candidates against the standing corpus become new edges, and
    // the existing dd_cluster labeling is UPDATED in place of a full
    // re-cluster. The engine takes the incremental path (touched
    // components re-solved from star edges + new pairs, untouched labels
    // passed through); the ORACLE recomputes connected components from
    // scratch over the unioned edge sets — a hash match IS the
    // incremental-equals-full theorem on this fixture.
    QueryDef("dd_cluster_increment")(
      s"""WITH RECURSIVE $plantedChainSql,
         | $lshPairsSql,
         | batch AS (SELECT doc_id + 300000 AS doc_id, text || ' extra' AS text
         |           FROM documents WHERE doc_id < 10),
         | ${lshCappedBandsSql("batch", "b")},
         | cross_cand AS (SELECT DISTINCT b.doc_id AS doc_a, c.doc_id AS doc_b
         |                FROM bcapped b JOIN capped c
         |                  ON b.band = c.band AND b.sig = c.sig),
         | all_e AS (SELECT doc_a, doc_b FROM pairs
         |           UNION SELECT doc_a, doc_b FROM cross_cand),
         | und AS (SELECT doc_a AS u, doc_b AS v FROM all_e
         |         UNION SELECT doc_b, doc_a FROM all_e),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v)
         | SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
         | FROM reach GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val corpus = plantedChain(s, dir)
      val batch = Tables(s, dir, "documents")
        .where(col("doc_id") < 10)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
      // Standing state persisted once per testdata fingerprint (the
      // dd_pipeline_increment treatment): warm runs measure the increment,
      // not the fixture rebuild. The UNGATED labeling is its own artifact;
      // the corpus band/shingle index is byte-identical to the pipeline
      // one (same planted chain, same (doc_id, text) projection), so the
      // two increment queries share it.
      val lblDir = cachedArtifact(dir, "cluster-labels", corpus)(out =>
        Dedup.clusterDedupFirst(corpus)
          .write.mode("overwrite").parquet(s"$out/data"))
      val labels0 = s.read.schema("doc_id LONG, cluster_id LONG")
        .parquet(s"$lblDir/data")
      val idx = cachedArtifact(dir, "pipeline-cross-index", corpus)(out =>
        Dedup.buildCrossNearDupIndex(corpus.select(col("doc_id"), col("text")), out))
      // threshold 0.0 emits every LSH candidate cross pair (left-join
      // convention) — the same ungated edge semantics dd_cluster uses.
      val newEdges = Dedup.crossNearDupIndexed(s, idx, batch, threshold = 0.0)
        .select(col("batch_id").as("doc_a"), col("corpus_id").as("doc_b"))
      Dedup.incrementalClusters(labels0, newEdges)
        .orderBy(col("doc_id"), col("cluster_id"))
    },

    // Oracle is exact all-pairs cosine; the engine is LSH-blocked. The
    // equivalence rests on a VERIFIED corpus property: the only pairs at
    // cosine ≥ 0.9 are the planted EXACT copies (max natural cross-pair
    // cosine ≈ 0.51 across all SFs), and exact copies always share a
    // bucket (hyperplane signs are scale-invariant) — so blocking loses
    // nothing here. On a corpus with organic near-misses, the hash gate
    // would legitimately flag recall < 1; that is the documented LSH
    // trade-off, not an engine bug.
    QueryDef("dd_embed_neardup")(
      s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings
         |   UNION ALL SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 10),
         | d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM corpus
         |       WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0)
         | SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |        round(${cosSql("a.v", "b.v")}, 6) AS sim
         | FROM d a JOIN d b ON a.vec_id < b.vec_id
         | WHERE ${cosSql("a.v", "b.v")} >= 0.9
         | ORDER BY vec_a, vec_b""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val planted = e.select(col("vec_id"), col("embedding")).unionAll(
        e.where(col("vec_id") < 10)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Dedup.embeddingNearDup(planted, 0.9).orderBy(col("vec_a"), col("vec_b"))
    },

    // SemDeDup-style semantic dedup: IVF-cell clustering (the sim_ivf
    // assignment chain verbatim) then greedy keep-first within cells at
    // cosine ≥ 0.9 over the corpus ∪ 10 planted exact copies. Natural
    // pairwise cosine tops out ≈ 0.51 (verified corpus property, see
    // dd_embed_cross), so exactly the planted copies drop — but only if
    // copies land in their original's cell AND the within-cell scorer
    // fires; the oracle replays assignment + greedy drop in full.
    QueryDef("dd_semantic")(
      s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings
         |   UNION ALL SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 10),
         | d AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM corpus
         |       WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
         | c AS (SELECT vec_id AS cell, v AS cv FROM d WHERE vec_id < 16),
         | asgr AS (SELECT d.vec_id, d.v, c.cell, ${cosSql("d.v", "c.cv")} AS cs
         |          FROM d CROSS JOIN c),
         | asg AS (SELECT vec_id, v, cell FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |            FROM asgr) WHERE rn = 1),
         | drp AS (SELECT DISTINCT b.vec_id
         |         FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |         WHERE ${cosSql("a.v", "b.v")} >= 0.9)
         | SELECT g.vec_id, g.cell,
         |   CAST(CASE WHEN drp.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
         | FROM asg g LEFT JOIN drp ON g.vec_id = drp.vec_id
         | ORDER BY g.vec_id""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val planted = e.select(col("vec_id"), col("embedding")).unionAll(
        e.where(col("vec_id") < 10)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Dedup.semanticDedup(planted, 0.9).orderBy(col("vec_id"))
    },

    // Cross-corpus embedding near-dup: an arriving batch of vectors —
    // exact re-uploads of corpus vectors (shifted ids) plus negated
    // vectors (cosine −1 to their source: match nothing) — deduped
    // against the standing corpus. Oracle is the brute-force cross
    // cosine join; engine recall is exact because true matches are
    // exact copies (shared LSH bucket at any plane count). VERIFIED
    // corpus property, BOTH signs: natural pairwise cosine spans only
    // [−0.549, +0.513] across sf0.001/sf0.01 (measured brute-force), so
    // neither a natural pair nor a negated vector can reach ±0.9 — the
    // oracle can only ever emit the planted exact copies.
    QueryDef("dd_embed_cross")(
      s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
         | batch AS (SELECT vec_id + 100000 AS vec_id, embedding
         |             FROM embeddings WHERE vec_id < 10
         |           UNION ALL SELECT vec_id + 200000,
         |             list_transform(embedding, x -> -x)
         |             FROM embeddings WHERE vec_id >= 10 AND vec_id < 20),
         | c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM corpus
         |       WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
         | b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM batch
         |       WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0)
         | SELECT b.vec_id AS batch_vec, c.vec_id AS corpus_vec,
         |        round(${cosSql("c.v", "b.v")}, 6) AS sim
         | FROM b JOIN c ON ${cosSql("c.v", "b.v")} >= 0.9
         | ORDER BY batch_vec, corpus_vec""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val corpus = e.select(col("vec_id"), col("embedding"))
      val batch = e.where(col("vec_id") < 10)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
        .unionAll(e.where(col("vec_id") >= 10 && col("vec_id") < 20)
          .select((col("vec_id") + 200000).as("vec_id"),
            expr("transform(embedding, x -> -x)").as("embedding")))
      Dedup.crossEmbedNearDup(corpus, batch, 0.9)
        .orderBy(col("batch_vec"), col("corpus_vec"))
    },

    // THE end-to-end near-dedup pipeline (the MinHash-dedup flow of
    // production training-data curation): one persisted shingle scan →
    // LSH candidates → exact Jaccard gate (≥ 0.8) → connected components →
    // purge everything but each cluster's representative → per-language
    // survivor counts. Every stage is the declared operator; the oracle
    // replays the identical chain with a recursive-CTE CC.
    QueryDef("dd_pipeline")(
      s"""WITH RECURSIVE $plantedChainLangSql,
         | $lshPairsSql,
         | inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter
         |           FROM pairs p
         |           JOIN sh sa ON sa.doc_id = p.doc_a
         |           JOIN sh sb ON sb.doc_id = p.doc_b AND ('0x' || substr(md5(sb.shingle), 1, 15))::BIGINT = ('0x' || substr(md5(sa.shingle), 1, 15))::BIGINT
         |           GROUP BY 1, 2),
         | sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         | dup AS (SELECT p.doc_a, p.doc_b FROM pairs p
         |         LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         |         JOIN sizes na ON na.doc_id = p.doc_a
         |         JOIN sizes nb ON nb.doc_id = p.doc_b
         |         WHERE round(coalesce(i.n_inter, 0) / (na.n_sh + nb.n_sh - coalesce(i.n_inter, 0)), 6) >= 0.8),
         | und AS (SELECT doc_a AS u, doc_b AS v FROM dup
         |         UNION SELECT doc_b, doc_a FROM dup),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v),
         | purge AS (SELECT node AS doc_id FROM reach
         |           GROUP BY 1 HAVING min(lbl) <> node)
         | SELECT lang, CAST(count(*) AS BIGINT) AS n
         | FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM purge)
         | GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val corpus = plantedChainLang(s, dir)
      // Gate + cluster at rep level (scores are text-level, so the rep
      // gate equals the doc gate); members inherit labels — the expanded
      // score set never materializes.
      val purge = Dedup.clusterDedupFirst(corpus, minJaccard = Some(0.8))
        .where(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id"))
      corpus.join(purge, Seq("doc_id"), "left_anti")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"))
    },

    // THE operational increment, end to end: a batch arrives against the
    // dd_pipeline standing corpus; its cross matches (≥ 0.8) and
    // within-batch dups become new edges; the standing labeling updates
    // INCREMENTALLY; survivors re-count per language. The engine never
    // re-pairs or re-clusters the standing corpus — the oracle recomputes
    // the whole dd_pipeline chain from scratch over corpus ∪ batch, so the
    // hash match proves the incremental composition equals the batch
    // pipeline. (Bucket caps are per-side in the engine's composed
    // generators vs union-wide in the oracle — equal while caps don't
    // bind, which this fixture's ≤ 5-copy groups guarantee.)
    QueryDef("dd_pipeline_increment")(
      s"""WITH RECURSIVE corpus AS (SELECT doc_id, text, lang FROM documents
         |  UNION ALL SELECT doc_id + 100000, text || ' extra', lang FROM documents WHERE doc_id < 20
         |  UNION ALL SELECT doc_id + 200000, text || ' extra extra', lang FROM documents WHERE doc_id < 20
         |  UNION ALL SELECT doc_id + 300000, text || ' extra', lang FROM documents WHERE doc_id < 10
         |  UNION ALL SELECT doc_id + 400000, text || ' extra', lang FROM documents WHERE doc_id < 5
         |  UNION ALL SELECT doc_id + 500000, upper(text), lang FROM documents WHERE doc_id >= 30 AND doc_id < 40),
         | $lshPairsSql,
         | inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter
         |           FROM pairs p
         |           JOIN sh sa ON sa.doc_id = p.doc_a
         |           JOIN sh sb ON sb.doc_id = p.doc_b AND ('0x' || substr(md5(sb.shingle), 1, 15))::BIGINT = ('0x' || substr(md5(sa.shingle), 1, 15))::BIGINT
         |           GROUP BY 1, 2),
         | sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         | dup AS (SELECT p.doc_a, p.doc_b FROM pairs p
         |         LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         |         JOIN sizes na ON na.doc_id = p.doc_a
         |         JOIN sizes nb ON nb.doc_id = p.doc_b
         |         WHERE round(coalesce(i.n_inter, 0) / (na.n_sh + nb.n_sh - coalesce(i.n_inter, 0)), 6) >= 0.8),
         | und AS (SELECT doc_a AS u, doc_b AS v FROM dup
         |         UNION SELECT doc_b, doc_a FROM dup),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v),
         | purge AS (SELECT node AS doc_id FROM reach
         |           GROUP BY 1 HAVING min(lbl) <> node)
         | SELECT lang, CAST(count(*) AS BIGINT) AS n
         | FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM purge)
         | GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val corpus = plantedChainLang(s, dir)
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
      val batch = d.where(col("doc_id") < 10)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"), col("lang"))
        .unionAll(d.where(col("doc_id") < 5)
          .select((col("doc_id") + 400000).as("doc_id"),
            concat(col("text"), lit(" extra")).as("text"), col("lang")))
        .unionAll(d.where(col("doc_id") >= 30 && col("doc_id") < 40)
          .select((col("doc_id") + 500000).as("doc_id"),
            upper(col("text")).as("text"), col("lang")))
      // Standing state: the dd_pipeline labeling of the corpus alone —
      // PERSISTED once per testdata fingerprint and loaded thereafter, the
      // operational shape ("the engine never re-pairs or re-clusters the
      // standing corpus") and the r8 variance fix: rebuilding this fixture
      // per run made the benched number (fixture + increment) swing
      // 28–112 s, because the fixture is the whole dd_pipeline chain and
      // dominated whatever the increment did. Warm runs now measure the
      // increment alone; the first run pays one labeling build.
      val labelsDir = cachedArtifact(dir, "pipeline-labels", corpus)(out =>
        Dedup.clusterDedupFirst(corpus, minJaccard = Some(0.8))
          .write.mode("overwrite").parquet(s"$out/data"))
      val labels0 = s.read.schema("doc_id LONG, cluster_id LONG")
        .parquet(s"$labelsDir/data")
      // Increment edges: gated cross matches + gated within-batch dups —
      // the standing corpus is never re-paired. The corpus side probes the
      // SAME persisted band-bucket/shingle-key index the standing labeling
      // lives next to (result-identical to the recompute form, spec-pinned
      // by DedupSpec's crossNearDupIndexed tests): per-increment cost is
      // the 25-doc batch's own chain + candidate-pruned index reads, not a
      // fresh LSH pass over every standing byte.
      val idx = cachedArtifact(dir, "pipeline-cross-index", corpus)(out =>
        Dedup.buildCrossNearDupIndex(corpus.select(col("doc_id"), col("text")), out))
      val cross = Dedup.crossNearDupIndexed(
          s, idx, batch.select(col("doc_id"), col("text")), threshold = 0.8)
        .select(col("batch_id").as("doc_a"), col("corpus_id").as("doc_b"))
      val within = Dedup.nearDupScores(batch.select(col("doc_id"), col("text")))
        .where(col("jaccard") >= 0.8).select(col("doc_a"), col("doc_b"))
      val labels1 = Dedup.incrementalClusters(labels0, cross.unionAll(within))
      val purge = labels1.where(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id"))
      corpus.unionAll(batch).join(purge, Seq("doc_id"), "left_anti")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"))
    },

    // The streaming curation loop, driver-checked end to end: seed standing
    // state from the corpus, stream two deterministic document drops
    // through `Streams.curationLoop` (availableNow, one file per
    // micro-batch), and emit the FINAL committed labels snapshot. The
    // oracle recomputes the accumulated labeling from scratch (doc-level
    // LSH chain → 0.8 Jaccard gate → recursive-CTE CC), so the hash match
    // IS the increments-equal-batch theorem for the round's most complex
    // streaming artifact — previously spec-asserted only.
    QueryDef("dd_curation_stream")(
      s"""WITH RECURSIVE corpus AS (
         |   SELECT doc_id, text FROM documents WHERE doc_id < 40
         |   UNION ALL SELECT doc_id + 1000, text || ' extra' FROM documents WHERE doc_id < 10
         |   UNION ALL SELECT doc_id + 2000, text || ' extra' FROM documents WHERE doc_id < 5
         |   UNION ALL SELECT doc_id + 3000, upper(text) FROM documents WHERE doc_id >= 10 AND doc_id < 20),
         | $lshPairsSql,
         | inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter
         |           FROM pairs p
         |           JOIN sh sa ON sa.doc_id = p.doc_a
         |           JOIN sh sb ON sb.doc_id = p.doc_b AND ('0x' || substr(md5(sb.shingle), 1, 15))::BIGINT = ('0x' || substr(md5(sa.shingle), 1, 15))::BIGINT
         |           GROUP BY 1, 2),
         | sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         | dup AS (SELECT p.doc_a, p.doc_b FROM pairs p
         |         LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         |         JOIN sizes na ON na.doc_id = p.doc_a
         |         JOIN sizes nb ON nb.doc_id = p.doc_b
         |         WHERE round(coalesce(i.n_inter, 0) / (na.n_sh + nb.n_sh - coalesce(i.n_inter, 0)), 6) >= 0.8),
         | und AS (SELECT doc_a AS u, doc_b AS v FROM dup
         |         UNION SELECT doc_b, doc_a FROM dup),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v)
         | SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
         | FROM reach GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.where(col("doc_id") < 40)
      val b1 = d.where(col("doc_id") < 10)
        .select((col("doc_id") + 1000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
      val b2 = d.where(col("doc_id") < 5)
        .select((col("doc_id") + 2000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
        .unionAll(d.where(col("doc_id") >= 10 && col("doc_id") < 20)
          .select((col("doc_id") + 3000).as("doc_id"), upper(col("text")).as("text")))
      // Fresh state per call: the loop's own crash/replay machinery is
      // exercised by StreamingSpec; this row checks the converged result.
      // Stage timings land in `buildSecs` so the bench archive splits
      // FIXTURE cost (state seed + file staging, paid once per standing
      // corpus in production) from the LOOP itself, and the loop total
      // from the steady-state per-micro-batch cost — the number that
      // actually scales with arriving data (VERDICT r9 #4).
      val st = java.nio.file.Files.createTempDirectory("graft-curation-q")
      val (idxDir, lblDir) = (s"$st/index", s"$st/labels")
      val tSeed = System.nanoTime()
      val inDir = java.nio.file.Files.createTempDirectory("graft-curation-q-in")
      // Standing-state SEED persisted once per testdata fingerprint (r20,
      // VERDICT r19 #3 — the dd_cluster_increment / dd_pipeline_increment
      // treatment extended to the loop rows): the seed is a pure function
      // of the standing corpus, exactly the state a production deployment
      // builds once and then streams against. The loop MUTATES its state
      // (grows per batch; dd_purge_stream also purges), so each run works
      // on a filesystem COPY and the cached seed stays pristine. Build
      // cost lands in buildSecs (cold runs only); warm runs pay the copy
      // + stagings, overlapped (guide §2.6).
      val seed = cachedArtifact(dir, "curation-seed-t08", corpus) { out =>
        graft.streaming.Streams.seedCurationState(corpus, s"$out/index",
          s"$out/labels", threshold = 0.8)
      }
      graft.operators.Par.runUnit(Seq(
        () => {
          copyRecursively(java.nio.file.Paths.get(seed, "index"),
            java.nio.file.Paths.get(idxDir))
          copyRecursively(java.nio.file.Paths.get(seed, "labels"),
            java.nio.file.Paths.get(lblDir))
        },
        () => stageAsFile(b1, inDir, "b1.parquet"),
        () => stageAsFile(b2, inDir, "b2.parquet")))
      orderStaged(inDir, "b1.parquet", "b2.parquet")
      fixtureSecs.put("curation-fixture", (System.nanoTime() - tSeed) / 1e9)
      val tLoop = System.nanoTime()
      val q = graft.streaming.Streams.curationLoop(
        graft.streaming.Streams.documentsStream(s, inDir.toString, maxFilesPerTrigger = 1),
        idxDir, lblDir, threshold = 0.8, s"$st/ckpt")
      q.awaitTermination()
      fixtureSecs.put("curation-loop", (System.nanoTime() - tLoop) / 1e9)
      // Steady-state per-micro-batch cost from the stream's own progress
      // events (triggerExecution of data-carrying batches): the
      // corpus-size-cancelling number a production loop pays per arrival.
      val batchMs = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toDouble))
      if (batchMs.nonEmpty)
        fixtureSecs.put("curation-batch-max", batchMs.max / 1e3)
      // Materialize eagerly (labels are output-scale) so the per-run temp
      // state/staging/checkpoint dirs can be deleted — repeated bench runs
      // must not accumulate snapshots and checkpoints under /tmp.
      val out = s.read.schema("doc_id LONG, cluster_id LONG").parquet(s"$lblDir/v1")
        .orderBy(col("doc_id")).localCheckpoint(true)
      deleteRecursively(st)
      deleteRecursively(inDir)
      out
    },

    // ---- similarity search ----------------------------------------------
    // q28 (SURVEY §2.3): brute-force cosine top-k — the exact baseline.
    QueryDef("sim_topk_brute")(
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         | SELECT vec_id, round(${cosSql("v", "qe")}, 6) AS sim
         | FROM e CROSS JOIN q
         | ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .head().getSeq[Double](0)
      Similarity.bruteForceTopK(e, q, 10)
    },

    // Embedding-space DRIFT — the monitor's third modality (text
    // cur_drift, image mm_drift, vectors here): PSI of an arriving
    // batch's IVF cell-occupancy histogram against the standing corpus's,
    // both assigned against the STANDING centroids (occupancy is only
    // comparable on one shared cell set). The planted batch is every
    // standing vector shifted +0.5 per coordinate — a systematic encoder
    // bias (the "model update without re-embedding the corpus" accident),
    // which concentrates assignments toward diagonal-aligned cells. One
    // codegen'd argmax pass per side, then the metadata-scale PSI tail.
    QueryDef("sim_drift")(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |      WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
         | b0 AS (SELECT vec_id, list_transform(embedding::DOUBLE[], x -> x + 0.5) AS v
         |        FROM embeddings),
         | b AS (SELECT * FROM b0 WHERE list_dot_product(v, v) > 0),
         | c AS (SELECT vec_id AS cell, v AS cv FROM
         |        (SELECT *, row_number() OVER (ORDER BY vec_id) AS rn FROM e)
         |       WHERE rn <= 16),
         | a0r AS (SELECT e.vec_id, c.cell, ${cosSql("e.v", "c.cv")} AS cs
         |         FROM e CROSS JOIN c),
         | a0 AS (SELECT vec_id, cell FROM (SELECT *, row_number()
         |          OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |         FROM a0r) WHERE rn = 1),
         | a1r AS (SELECT b.vec_id, c.cell, ${cosSql("b.v", "c.cv")} AS cs
         |         FROM b CROSS JOIN c),
         | a1 AS (SELECT vec_id, cell FROM (SELECT *, row_number()
         |          OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |         FROM a1r) WHERE rn = 1)
         | ${graft.operators.Curation.driftFeatureSql("cell", "cell", "a0", "a1")}
         | ORDER BY feature""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val cents = Similarity.centroidsOf(e, 16)
      val shifted = e.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE) + 0.5D)")
          .as("embedding"))
      graft.operators.Curation.drift(
        Similarity.cellOccupancy(e, cents),
        Similarity.cellOccupancy(shifted, cents),
        Seq("cell" -> col("cell")))
    },

    // Scalar-quantized ANN: int-[−64,64] quantized-dot candidate ranking +
    // exact rescore of the top 40 — the byte-compression scale path. Both
    // engines quantize with floor (bit-identical; round differs at halves)
    // and tie-break both top-k boundaries on vec_id.
    QueryDef("sim_sq_topk")(
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe,
         |             list_transform(embedding::DOUBLE[],
         |               x -> CAST(floor(greatest(least(x, 1.0), -1.0) * 64) AS BIGINT)) AS qq
         |           FROM embeddings WHERE vec_id = 0),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |         list_transform(embedding::DOUBLE[],
         |           x -> CAST(floor(greatest(least(x, 1.0), -1.0) * 64) AS BIGINT)) AS qv
         |       FROM embeddings),
         | cand AS (SELECT e.vec_id, e.v, CAST(list_dot_product(e.qv, q.qq) AS BIGINT) AS qdot
         |          FROM e CROSS JOIN q
         |          ORDER BY qdot DESC, vec_id LIMIT 40)
         | SELECT c.vec_id, round(${cosSql("c.v", "q.qe")}, 6) AS sim, c.qdot
         | FROM cand c CROSS JOIN q
         | ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .head().getSeq[Double](0)
      Similarity.sqTopK(e, q, 10, rescoreK = 40)
    },

    // Product-quantized ANN (Jégou et al. 2011): per-subspace nearest-
    // codebook encoding, ADC lookup-table candidate ranking, exact rescore
    // of the top-40 — the byte-compressed scale path next to sim_sq_topk.
    // The oracle replays encoding, LUT, the fixed-order 4-term ADC sum,
    // and both top-k boundaries in full.
    QueryDef("sim_pq_topk")(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |     WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
         | c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
         | q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         | cs AS (SELECT s.sub, c.cid, list_slice(c.cv, s.sub*16+1, s.sub*16+16) AS csub
         |        FROM c CROSS JOIN range(0, 4) s(sub)),
         | scored AS (SELECT e.vec_id, cs.sub, cs.cid,
         |     list_dot_product(cs.csub, cs.csub)
         |       - 2 * list_dot_product(list_slice(e.v, cs.sub*16+1, cs.sub*16+16), cs.csub) AS s2
         |   FROM e CROSS JOIN cs),
         | code AS (SELECT vec_id, sub, cid FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY s2, cid) AS rn
         |            FROM scored) WHERE rn = 1),
         | lut AS (SELECT cs.sub, cs.cid,
         |     list_dot_product(list_slice(q.qv, cs.sub*16+1, cs.sub*16+16), cs.csub) AS lv
         |   FROM cs CROSS JOIN q),
         | adc AS (SELECT code.vec_id,
         |       max(CASE WHEN code.sub = 0 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 1 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 2 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 3 THEN lut.lv END) AS approx
         |   FROM code JOIN lut ON code.sub = lut.sub AND code.cid = lut.cid
         |   GROUP BY code.vec_id),
         | cand AS (SELECT vec_id FROM adc ORDER BY approx DESC, vec_id LIMIT 40)
         | SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
         | FROM e JOIN cand USING (vec_id) CROSS JOIN q
         | ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .head().getSeq[Double](0)
      Similarity.pqTopK(e, q, 10)
    },

    // GROWN-index probe: build the PQ index on the first half of the
    // corpus, append the second half with `appendToPqIndex` (encoding via
    // the index's STORED codebook, never recomputed), then answer from the
    // grown layout. The oracle is sim_pq_topk's SQL verbatim: the codebook
    // (first 16 non-zero vectors) lives entirely in the first half, so
    // grown == rebuilt == inline — the hash match IS the append-equals-
    // rebuild theorem, driver-checked (previously spec-asserted only).
    // At 100 TB this is the operational path: an arriving batch appends
    // byte codes, the corpus is never re-encoded.
    QueryDef("sim_pq_grown")(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |     WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
         | c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
         | q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         | cs AS (SELECT s.sub, c.cid, list_slice(c.cv, s.sub*16+1, s.sub*16+16) AS csub
         |        FROM c CROSS JOIN range(0, 4) s(sub)),
         | scored AS (SELECT e.vec_id, cs.sub, cs.cid,
         |     list_dot_product(cs.csub, cs.csub)
         |       - 2 * list_dot_product(list_slice(e.v, cs.sub*16+1, cs.sub*16+16), cs.csub) AS s2
         |   FROM e CROSS JOIN cs),
         | code AS (SELECT vec_id, sub, cid FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY s2, cid) AS rn
         |            FROM scored) WHERE rn = 1),
         | lut AS (SELECT cs.sub, cs.cid,
         |     list_dot_product(list_slice(q.qv, cs.sub*16+1, cs.sub*16+16), cs.csub) AS lv
         |   FROM cs CROSS JOIN q),
         | adc AS (SELECT code.vec_id,
         |       max(CASE WHEN code.sub = 0 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 1 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 2 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 3 THEN lut.lv END) AS approx
         |   FROM code JOIN lut ON code.sub = lut.sub AND code.cid = lut.cid
         |   GROUP BY code.vec_id),
         | cand AS (SELECT vec_id FROM adc ORDER BY approx DESC, vec_id LIMIT 40)
         | SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
         | FROM e JOIN cand USING (vec_id) CROSS JOIN q
         | ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val n = e.count()
      val q = e.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .head().getSeq[Double](0)
      val idx = java.nio.file.Files.createTempDirectory("graft-pq-grown-q")
      val tB = System.nanoTime()
      Similarity.buildPqIndex(e.where(col("vec_id") < n / 2), idx.toString)
      Similarity.appendToPqIndex(e.where(col("vec_id") >= n / 2), idx.toString)
      fixtureSecs.put("pq-grown-build", (System.nanoTime() - tB) / 1e9)
      val out = Similarity.pqTopKIndexed(e, idx.toString, q, 10).localCheckpoint(true)
      deleteRecursively(idx)
      out
    },

    // GROWN IVF-PQ probe — the billion-vector layout's append path,
    // driver-checked: coarse cells AND fine codebook both come from the
    // index built on the first half (both quantizer seeds live in
    // vec_id < 16), the second half appends INTO existing cell
    // partitions, and the probe ranks partition-pruned ADC over the
    // grown codes table. The oracle replays coarse assignment, probe-cell
    // selection, PQ encoding, ADC ranking within probed cells, and the
    // exact rescore — the full IVF-PQ probe semantics in SQL.
    QueryDef("sim_ivfpq_grown")(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |     WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
         | c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
         | q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         | asgr AS (SELECT e.vec_id, c.cell, ${cosSql("e.v", "c.cv")} AS cs
         |          FROM e CROSS JOIN c),
         | asg AS (SELECT vec_id, cell FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |            FROM asgr) WHERE rn = 1),
         | probe AS (SELECT cell FROM
         |             (SELECT c.cell, ${cosSql("c.cv", "q.qv")} AS qs FROM c CROSS JOIN q)
         |           ORDER BY qs DESC, cell LIMIT 4),
         | cs AS (SELECT s.sub, c.cell AS cid, list_slice(c.cv, s.sub*16+1, s.sub*16+16) AS csub
         |        FROM c CROSS JOIN range(0, 4) s(sub)),
         | scored AS (SELECT e.vec_id, cs.sub, cs.cid,
         |     list_dot_product(cs.csub, cs.csub)
         |       - 2 * list_dot_product(list_slice(e.v, cs.sub*16+1, cs.sub*16+16), cs.csub) AS s2
         |   FROM e CROSS JOIN cs),
         | code AS (SELECT vec_id, sub, cid FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY s2, cid) AS rn
         |            FROM scored) WHERE rn = 1),
         | lut AS (SELECT cs.sub, cs.cid,
         |     list_dot_product(list_slice(q.qv, cs.sub*16+1, cs.sub*16+16), cs.csub) AS lv
         |   FROM cs CROSS JOIN q),
         | adc AS (SELECT code.vec_id,
         |       max(CASE WHEN code.sub = 0 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 1 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 2 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 3 THEN lut.lv END) AS approx
         |   FROM code JOIN lut ON code.sub = lut.sub AND code.cid = lut.cid
         |   JOIN asg ON asg.vec_id = code.vec_id
         |   JOIN probe ON probe.cell = asg.cell
         |   GROUP BY code.vec_id),
         | cand AS (SELECT vec_id FROM adc ORDER BY approx DESC, vec_id LIMIT 40)
         | SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
         | FROM e JOIN cand USING (vec_id) CROSS JOIN q
         | ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val n = e.count()
      val q = e.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .head().getSeq[Double](0)
      val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-grown-q")
      val tB = System.nanoTime()
      // The BASE index is pre-existing standing state (fingerprint-cached,
      // r20); the APPEND is the measured grow verb, run per run on a COPY.
      val base = cachedArtifact(dir, "ivfpq-half",
        e.select(col("vec_id").as("doc_id"),
          col("embedding").cast("string").as("text"))) { out =>
        Similarity.buildIvfPqIndex(e.where(col("vec_id") < n / 2), s"$out/idx")
      }
      copyRecursively(java.nio.file.Paths.get(base, "idx"), idx)
      Similarity.appendToIvfPqIndex(e.where(col("vec_id") >= n / 2), idx.toString)
      fixtureSecs.put("ivfpq-grown-build", (System.nanoTime() - tB) / 1e9)
      val out = Similarity.ivfPqTopK(e, idx.toString, q, 10).localCheckpoint(true)
      deleteRecursively(idx)
      out
    },

    // The IVF-PQ TAKEDOWN path (r15): build on the full corpus, purge
    // every vec_id % 9 == 4 (anti-join rewrite of exactly the touched
    // cell partitions under the two-phase marker — quantizer geometry
    // untouched, partition pruning unchanged), then probe with the
    // surviving corpus as the rescore source. The oracle replays the
    // FULL-corpus quantizers (seed centroids/codebook are build-time
    // state and survive the purge) but restricts candidates and rescore
    // to survivors — a hash match proves purged == an index that never
    // coded the docs, at the standard billion-vector layout.
    QueryDef("sim_purge")(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |     WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
         | surv AS (SELECT * FROM e WHERE vec_id % 9 <> 4),
         | c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
         | q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         | asgr AS (SELECT surv.vec_id, c.cell, ${cosSql("surv.v", "c.cv")} AS cs
         |          FROM surv CROSS JOIN c),
         | asg AS (SELECT vec_id, cell FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |            FROM asgr) WHERE rn = 1),
         | probe AS (SELECT cell FROM
         |             (SELECT c.cell, ${cosSql("c.cv", "q.qv")} AS qs FROM c CROSS JOIN q)
         |           ORDER BY qs DESC, cell LIMIT 4),
         | cs AS (SELECT s.sub, c.cell AS cid, list_slice(c.cv, s.sub*16+1, s.sub*16+16) AS csub
         |        FROM c CROSS JOIN range(0, 4) s(sub)),
         | scored AS (SELECT surv.vec_id, cs.sub, cs.cid,
         |     list_dot_product(cs.csub, cs.csub)
         |       - 2 * list_dot_product(list_slice(surv.v, cs.sub*16+1, cs.sub*16+16), cs.csub) AS s2
         |   FROM surv CROSS JOIN cs),
         | code AS (SELECT vec_id, sub, cid FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY s2, cid) AS rn
         |            FROM scored) WHERE rn = 1),
         | lut AS (SELECT cs.sub, cs.cid,
         |     list_dot_product(list_slice(q.qv, cs.sub*16+1, cs.sub*16+16), cs.csub) AS lv
         |   FROM cs CROSS JOIN q),
         | adc AS (SELECT code.vec_id,
         |       max(CASE WHEN code.sub = 0 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 1 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 2 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 3 THEN lut.lv END) AS approx
         |   FROM code JOIN lut ON code.sub = lut.sub AND code.cid = lut.cid
         |   JOIN asg ON asg.vec_id = code.vec_id
         |   JOIN probe ON probe.cell = asg.cell
         |   GROUP BY code.vec_id),
         | cand AS (SELECT vec_id FROM adc ORDER BY approx DESC, vec_id LIMIT 40)
         | SELECT surv.vec_id, round(${cosSql("surv.v", "qv")}, 6) AS sim
         | FROM surv JOIN cand USING (vec_id) CROSS JOIN q
         | ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .head().getSeq[Double](0)
      val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq-purge-q")
      val tB = System.nanoTime()
      // Standing IVF-PQ layout fingerprint-cached (r20); the purge
      // MUTATES it, so each run purges a filesystem COPY. Fingerprint
      // frame renders the embeddings through the (doc_id, text) shape
      // cachedArtifact fingerprints.
      val fpFrame = e.select(col("vec_id").as("doc_id"),
        col("embedding").cast("string").as("text"))
      val built = cachedArtifact(dir, "ivfpq-full", fpFrame) { out =>
        Similarity.buildIvfPqIndex(e, s"$out/idx")
      }
      copyRecursively(java.nio.file.Paths.get(built, "idx"), idx)
      fixtureSecs.put("ivfpq-purge-build", (System.nanoTime() - tB) / 1e9)
      Similarity.purgeFromIvfPqIndex(s, idx.toString,
        e.where(col("vec_id") % 9 === 4).select(col("vec_id")))
      val out = Similarity.ivfPqTopK(
          e.where(col("vec_id") % 9 =!= 4), idx.toString, q, 10)
        .localCheckpoint(true)
      deleteRecursively(idx)
      out
    },

    QueryDef("sim_lsh_buckets")(
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, len(embedding) AS dim FROM embeddings),
        | x AS (SELECT vec_id, p.p,
        |         sum(v[CAST(j.j AS INT)] *
        |             ((('0x' || substr(md5(p.p::VARCHAR || ':' || (j.j - 1)::VARCHAR), 1, 2))::INT % 7) - 3)) AS s
        |       FROM e CROSS JOIN range(0, 8) p(p) JOIN range(1, 10000) j(j) ON j.j <= dim
        |       GROUP BY 1, 2),
        | b AS (SELECT vec_id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
        |       FROM x GROUP BY 1)
        | SELECT bucket, CAST(count(*) AS BIGINT) AS n
        | FROM b GROUP BY 1 ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      Similarity.lshBuckets(Tables(s, dir, "embeddings"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n")).orderBy(col("bucket"))
    },

    QueryDef("sim_ivf_topk")(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
         | q AS (SELECT v AS qe FROM e WHERE vec_id = 0),
         | asgr AS (SELECT e.vec_id, c.cell, ${cosSql("e.v", "c.cv")} AS cs
         |          FROM e CROSS JOIN c),
         | asg AS (SELECT vec_id, cell FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |            FROM asgr) WHERE rn = 1),
         | probe AS (SELECT cell FROM
         |             (SELECT c.cell, ${cosSql("c.cv", "q.qe")} AS qs FROM c CROSS JOIN q)
         |           ORDER BY qs DESC, cell LIMIT 4)
         | SELECT e.vec_id, round(${cosSql("e.v", "qe")}, 6) AS sim
         | FROM e JOIN asg USING (vec_id) JOIN probe USING (cell) CROSS JOIN q
         | ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .head().getSeq[Double](0)
      Similarity.ivfTopK(e, q, 10)
    },

    // Cross-domain similarity: per-user behavior profiles (event-type count
    // vectors) ranked by cosine against user 0 — the similarity kernel
    // (`vec_dot`) composing over DERIVED vectors, not just the embeddings
    // table. Profile build is one map-side-combined aggregate; the query
    // vector is a plan literal (sim_topk_brute shape).
    QueryDef("sim_user_topk")(
      """WITH prof AS (SELECT user_id, [
        |     sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::DOUBLE,
        |     sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::DOUBLE,
        |     sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::DOUBLE,
        |     sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::DOUBLE,
        |     sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::DOUBLE] AS v
        |   FROM events GROUP BY 1),
        | q AS (SELECT v AS qv FROM prof WHERE user_id = 0)
        | SELECT user_id,
        |   round(list_dot_product(v, qv) /
        |         (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS sim
        | FROM prof CROSS JOIN q
        | ORDER BY sim DESC, user_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cnts = types.map(tp =>
        sum(when(col("event_type") === tp, 1).otherwise(0)).cast("double").as(tp))
      val prof = Tables(s, dir, "events")
        .groupBy(col("user_id")).agg(cnts.head, cnts.tail: _*)
        .select(col("user_id"), array(types.map(col): _*).as("v"))
      val q = prof.where(col("user_id") === 0).select(col("v"))
        .head().getSeq[Double](0)
      prof.select(col("user_id"),
          round(Similarity.cosine(col("v"), lit(q.toArray)), 6).as("sim"))
        .orderBy(col("sim").desc, col("user_id"))
        .limit(10)
    },

    // ANN quality evaluation as a first-class query: recall@10 of the IVF
    // path against the exact brute-force baseline — the metric that gates
    // any ANN rollout. Both arms are the declared operators; the oracle
    // replays both SQL chains and intersects.
    QueryDef("sim_recall")(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
         | q AS (SELECT v AS qe FROM e WHERE vec_id = 0),
         | asgr AS (SELECT e.vec_id, c.cell, ${cosSql("e.v", "c.cv")} AS cs
         |          FROM e CROSS JOIN c),
         | asg AS (SELECT vec_id, cell FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |            FROM asgr) WHERE rn = 1),
         | probe AS (SELECT cell FROM
         |             (SELECT c.cell, ${cosSql("c.cv", "q.qe")} AS qs FROM c CROSS JOIN q)
         |           ORDER BY qs DESC, cell LIMIT 4),
         | ivf AS (SELECT e.vec_id
         |         FROM e JOIN asg USING (vec_id) JOIN probe USING (cell) CROSS JOIN q
         |         ORDER BY round(${cosSql("e.v", "qe")}, 6) DESC, vec_id LIMIT 10),
         | brute AS (SELECT vec_id FROM e CROSS JOIN q
         |           ORDER BY round(${cosSql("e.v", "qe")}, 6) DESC, vec_id LIMIT 10)
         | SELECT round(count(*) / 10.0, 6) AS recall_at_10
         | FROM ivf JOIN brute USING (vec_id)""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .head().getSeq[Double](0)
      Similarity.bruteForceTopK(e, q, 10).select(col("vec_id"))
        .join(Similarity.ivfTopK(e, q, 10).select(col("vec_id")), "vec_id")
        .agg(round(count(lit(1)) / 10.0, 6).as("recall_at_10"))
    },

    // Trained-IVF quality gate: Lloyd-refined centroids are float-sum
    // order-dependent, so the trained path can't be hash-checked row-wise —
    // instead the ORACLE enforces a recall floor. The Spark side computes
    // seed recall (deterministic, replayed by the oracle's SQL chain) and
    // the boolean "trained recall@10 >= 0.8"; the oracle claims TRUE, so a
    // training regression below the floor hash-mismatches and goes red.
    //
    // Why a FIXED floor and not "trained >= seed": measured (RecallProbe,
    // both SFs) — training is not monotone in recall at fixed nProbe. At
    // sf0.01 the seed centroids already give recall 1.0 and one Lloyd step
    // drops it to 0.9 (rebalancing moves a true neighbor's cell out of the
    // probe set — a known IVF property); at sf0.001 training raises 0.7 →
    // 0.8 (nProbe=2) and 0.9 → 1.0 (nProbe=6). A seed-relative gate would
    // red on the sf where the seed is unbeatable; the 0.8 floor holds with
    // one-neighbor margin at every measured (sf, nProbe, iters).
    QueryDef("sim_recall_trained")(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
         | q AS (SELECT v AS qe FROM e WHERE vec_id = 0),
         | asgr AS (SELECT e.vec_id, c.cell, ${cosSql("e.v", "c.cv")} AS cs
         |          FROM e CROSS JOIN c),
         | asg AS (SELECT vec_id, cell FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |            FROM asgr) WHERE rn = 1),
         | probe AS (SELECT cell FROM
         |             (SELECT c.cell, ${cosSql("c.cv", "q.qe")} AS qs FROM c CROSS JOIN q)
         |           ORDER BY qs DESC, cell LIMIT 4),
         | ivf AS (SELECT e.vec_id
         |         FROM e JOIN asg USING (vec_id) JOIN probe USING (cell) CROSS JOIN q
         |         ORDER BY round(${cosSql("e.v", "qe")}, 6) DESC, vec_id LIMIT 10),
         | brute AS (SELECT vec_id FROM e CROSS JOIN q
         |           ORDER BY round(${cosSql("e.v", "qe")}, 6) DESC, vec_id LIMIT 10)
         | SELECT round(count(*) / 10.0, 6) AS seed_recall,
         |   CAST(1 AS BOOLEAN) AS trained_ge_floor
         | FROM ivf JOIN brute USING (vec_id)""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .head().getSeq[Double](0)
      val brute = Similarity.bruteForceTopK(e, q, 10).select(col("vec_id"))
      // Driver-side counts are metadata-scale (k row ids each): this is a
      // quality-evaluation query, not a data-path operator.
      val seedR = brute.join(
        Similarity.ivfTopK(e, q, 10).select(col("vec_id")), "vec_id").count() / 10.0
      val trainedR = brute.join(
        Similarity.ivfTopKTrained(e, q, 10).select(col("vec_id")), "vec_id").count() / 10.0
      Tables(s, dir, "embeddings").limit(1)
        .select(round(lit(seedR), 6).as("seed_recall"),
          lit(trainedR >= 0.8).as("trained_ge_floor"))
    },

    // Batch k-NN retrieval (k-NN JOIN): top-k corpus neighbors for EVERY
    // query vector in one pass — one corpus scan × broadcast query batch,
    // per-query top-k via the TopK Aggregator (shuffle O(queries × k)).
    // The oracle is the blocking-agnostic window form over the full cross
    // score — any exact k-NN join agrees.
    QueryDef("sim_knn_join")(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |           WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
         | q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
         | scored AS (SELECT query_id, e.vec_id,
         |              round(${cosSql("e.v", "qv")}, 6) AS sim
         |            FROM e CROSS JOIN q),
         | ranked AS (SELECT *, row_number() OVER
         |              (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rk
         |            FROM scored)
         | SELECT query_id, vec_id, sim, CAST(rk AS BIGINT) AS rk
         | FROM ranked WHERE rk <= 5
         | ORDER BY query_id, rk""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val qs = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.knnJoin(qs, e, 5).orderBy("query_id", "rk")
    },

    // Hybrid retrieval: BM25 lexical top-50 + brute cosine top-50 over
    // the aligned embeddings (vec_id ≡ doc_id in this corpus), fused by
    // reciprocal-rank fusion (Cormack et al. 2009, c = 60). Ranks are
    // INTEGERS assigned over each list's total order, so the fusion is
    // bit-reproducible across engines; both engines replay both top-k
    // boundaries and the fused top-10 with doc_id tie-breaks.
    QueryDef("sim_hybrid_rrf")(
      s"""WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         | dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
         | stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         | tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
         |        WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2),
         | tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         | sc AS (SELECT tf.doc_id,
         |     sum( ln(1 + (s.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
         |        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
         |   FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
         |   GROUP BY 1),
         | bm AS (SELECT doc_id, round(score, 6) AS score FROM sc
         |        ORDER BY score DESC, doc_id LIMIT 50),
         | bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_0 FROM bm),
         | q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
         | e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | sim AS (SELECT vec_id AS doc_id, round(${cosSql("v", "qe")}, 6) AS sim
         |         FROM e CROSS JOIN q ORDER BY sim DESC, doc_id LIMIT 50),
         | simr AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS rank_1 FROM sim),
         | j AS (SELECT coalesce(bmr.doc_id, simr.doc_id) AS doc_id, bmr.rank_0, simr.rank_1
         |       FROM bmr FULL OUTER JOIN simr ON bmr.doc_id = simr.doc_id)
         | SELECT doc_id,
         |   round(coalesce(1.0/(60 + rank_0), 0) + coalesce(1.0/(60 + rank_1), 0), 6) AS rrf,
         |   CAST(rank_0 AS BIGINT) AS rank_0, CAST(rank_1 AS BIGINT) AS rank_1
         | FROM j ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .head().getSeq[Double](0)
      val bm = Retrieval.bm25TopK(Tables(s, dir, "documents"),
        Seq("spark", "window", "merge"), 50)
      val sim = Similarity.bruteForceTopK(e, q, 50)
        .withColumnRenamed("vec_id", "doc_id")
      Retrieval.rrfFuse(Seq(
          (bm, Seq(col("score").desc, col("doc_id"))),
          (sim, Seq(col("sim").desc, col("doc_id")))),
        idCol = "doc_id", k = 10)
    },

    // Hybrid retrieval over PERSISTED indexes — the operational form of
    // sim_hybrid_rrf, i.e. what a retrieval service actually runs at
    // 100 TB: lexical top-20 from the BM25 postings index (term isin
    // pushed to row groups, no corpus text scan, no tokenization) fused
    // with ANN top-20 from the IVF-PQ index (partition-pruned ADC over
    // probed cells; only the bounded rescore candidate set touches the
    // embeddings table, as a pushed IN filter). The oracle replays BOTH
    // index probes from scratch — BM25 scoring, coarse assignment, PQ
    // encoding, ADC ranking, exact rescore — and the same integer-rank
    // RRF. PlanShapeSpec locks the index-only plan shape.
    QueryDef("sim_hybrid_indexed")(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |     WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
         | c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
         | q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         | asgr AS (SELECT e.vec_id, c.cell, ${cosSql("e.v", "c.cv")} AS cs
         |          FROM e CROSS JOIN c),
         | asg AS (SELECT vec_id, cell FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |            FROM asgr) WHERE rn = 1),
         | probe AS (SELECT cell FROM
         |             (SELECT c.cell, ${cosSql("c.cv", "q.qv")} AS qs FROM c CROSS JOIN q)
         |           ORDER BY qs DESC, cell LIMIT 4),
         | cs AS (SELECT s.sub, c.cell AS cid, list_slice(c.cv, s.sub*16+1, s.sub*16+16) AS csub
         |        FROM c CROSS JOIN range(0, 4) s(sub)),
         | scored AS (SELECT e.vec_id, cs.sub, cs.cid,
         |     list_dot_product(cs.csub, cs.csub)
         |       - 2 * list_dot_product(list_slice(e.v, cs.sub*16+1, cs.sub*16+16), cs.csub) AS s2
         |   FROM e CROSS JOIN cs),
         | code AS (SELECT vec_id, sub, cid FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY s2, cid) AS rn
         |            FROM scored) WHERE rn = 1),
         | lut AS (SELECT cs.sub, cs.cid,
         |     list_dot_product(list_slice(q.qv, cs.sub*16+1, cs.sub*16+16), cs.csub) AS lv
         |   FROM cs CROSS JOIN q),
         | adc AS (SELECT code.vec_id,
         |       max(CASE WHEN code.sub = 0 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 1 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 2 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 3 THEN lut.lv END) AS approx
         |   FROM code JOIN lut ON code.sub = lut.sub AND code.cid = lut.cid
         |   JOIN asg ON asg.vec_id = code.vec_id
         |   JOIN probe ON probe.cell = asg.cell
         |   GROUP BY code.vec_id),
         | cand AS (SELECT vec_id FROM adc ORDER BY approx DESC, vec_id LIMIT 40),
         | ann AS (SELECT e.vec_id AS doc_id, round(${cosSql("e.v", "qv")}, 6) AS sim
         |         FROM e JOIN cand USING (vec_id) CROSS JOIN q
         |         ORDER BY sim DESC, doc_id LIMIT 20),
         | annr AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS rank_1 FROM ann),
         | terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         | dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
         | stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         | tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
         |        WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2),
         | tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         | sc AS (SELECT tf.doc_id,
         |     sum( ln(1 + (s.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
         |        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
         |   FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
         |   GROUP BY 1),
         | bm AS (SELECT doc_id, round(score, 6) AS score FROM sc
         |        ORDER BY score DESC, doc_id LIMIT 20),
         | bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_0 FROM bm),
         | j AS (SELECT coalesce(bmr.doc_id, annr.doc_id) AS doc_id, bmr.rank_0, annr.rank_1
         |       FROM bmr FULL OUTER JOIN annr ON bmr.doc_id = annr.doc_id)
         | SELECT doc_id,
         |   round(coalesce(1.0/(60 + rank_0), 0) + coalesce(1.0/(60 + rank_1), 0), 6) AS rrf,
         |   CAST(rank_0 AS BIGINT) AS rank_0, CAST(rank_1 AS BIGINT) AS rank_1
         | FROM j ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .head().getSeq[Double](0)
      val idx = java.nio.file.Files.createTempDirectory("graft-hybrid-idx-q")
      val tB = System.nanoTime()
      Similarity.buildIvfPqIndex(e, idx.toString)
      fixtureSecs.put("hybrid-ivfpq-build", (System.nanoTime() - tB) / 1e9)
      val bm = Retrieval.bm25IndexedTopK(s,
        cachedBm25Index(dir, Tables(s, dir, "documents")),
        Seq("spark", "window", "merge"), 20)
      val ann = Similarity.ivfPqTopK(e, idx.toString, q, 20)
        .withColumnRenamed("vec_id", "doc_id")
      val out = Retrieval.rrfFuse(Seq(
          (bm, Seq(col("score").desc, col("doc_id"))),
          (ann, Seq(col("sim").desc, col("doc_id")))),
        idCol = "doc_id", k = 10).localCheckpoint(true)
      deleteRecursively(idx)
      out
    },

    // Hybrid retrieval after INDEX GROWTH — the serving continuity
    // guarantee (VERDICT r12 #6): BOTH standing indexes are built on the
    // first half of the corpus and grown by append (BM25: postings
    // partition + df/stats version roll; IVF-PQ: appended codes into
    // existing cell partitions — both quantizer seeds live in
    // vec_id < 16, inside the build half), then fused exactly like
    // sim_hybrid_indexed. The oracle is the full-corpus replay — a hash
    // match proves grown-index hybrid == rebuilt-index hybrid end to
    // end, not just per index.
    QueryDef("sim_hybrid_grown")(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |     WHERE list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
         | c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
         | q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         | asgr AS (SELECT e.vec_id, c.cell, ${cosSql("e.v", "c.cv")} AS cs
         |          FROM e CROSS JOIN c),
         | asg AS (SELECT vec_id, cell FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |            FROM asgr) WHERE rn = 1),
         | probe AS (SELECT cell FROM
         |             (SELECT c.cell, ${cosSql("c.cv", "q.qv")} AS qs FROM c CROSS JOIN q)
         |           ORDER BY qs DESC, cell LIMIT 4),
         | cs AS (SELECT s.sub, c.cell AS cid, list_slice(c.cv, s.sub*16+1, s.sub*16+16) AS csub
         |        FROM c CROSS JOIN range(0, 4) s(sub)),
         | scored AS (SELECT e.vec_id, cs.sub, cs.cid,
         |     list_dot_product(cs.csub, cs.csub)
         |       - 2 * list_dot_product(list_slice(e.v, cs.sub*16+1, cs.sub*16+16), cs.csub) AS s2
         |   FROM e CROSS JOIN cs),
         | code AS (SELECT vec_id, sub, cid FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY s2, cid) AS rn
         |            FROM scored) WHERE rn = 1),
         | lut AS (SELECT cs.sub, cs.cid,
         |     list_dot_product(list_slice(q.qv, cs.sub*16+1, cs.sub*16+16), cs.csub) AS lv
         |   FROM cs CROSS JOIN q),
         | adc AS (SELECT code.vec_id,
         |       max(CASE WHEN code.sub = 0 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 1 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 2 THEN lut.lv END)
         |     + max(CASE WHEN code.sub = 3 THEN lut.lv END) AS approx
         |   FROM code JOIN lut ON code.sub = lut.sub AND code.cid = lut.cid
         |   JOIN asg ON asg.vec_id = code.vec_id
         |   JOIN probe ON probe.cell = asg.cell
         |   GROUP BY code.vec_id),
         | cand AS (SELECT vec_id FROM adc ORDER BY approx DESC, vec_id LIMIT 40),
         | ann AS (SELECT e.vec_id AS doc_id, round(${cosSql("e.v", "qv")}, 6) AS sim
         |         FROM e JOIN cand USING (vec_id) CROSS JOIN q
         |         ORDER BY sim DESC, doc_id LIMIT 20),
         | annr AS (SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id) AS rank_1 FROM ann),
         | terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         | dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
         | stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         | tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
         |        WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2),
         | tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         | sc AS (SELECT tf.doc_id,
         |     sum( ln(1 + (s.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
         |        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
         |   FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
         |   GROUP BY 1),
         | bm AS (SELECT doc_id, round(score, 6) AS score FROM sc
         |        ORDER BY score DESC, doc_id LIMIT 20),
         | bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_0 FROM bm),
         | j AS (SELECT coalesce(bmr.doc_id, annr.doc_id) AS doc_id, bmr.rank_0, annr.rank_1
         |       FROM bmr FULL OUTER JOIN annr ON bmr.doc_id = annr.doc_id)
         | SELECT doc_id,
         |   round(coalesce(1.0/(60 + rank_0), 0) + coalesce(1.0/(60 + rank_1), 0), 6) AS rrf,
         |   CAST(rank_0 AS BIGINT) AS rank_0, CAST(rank_1 AS BIGINT) AS rank_1
         | FROM j ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
    ) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val nE = e.count()
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val nD = d.count()
      val q = e.where(col("vec_id") === 0)
        .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .head().getSeq[Double](0)
      val st = java.nio.file.Files.createTempDirectory("graft-hybrid-grown-q")
      val (annIdx, bmIdx) = (s"$st/ivfpq", s"$st/bm25")
      val tB = System.nanoTime()
      // Both BASE indexes are pre-existing standing state (fingerprint-
      // cached, r20 — ivfpq-half is shared with sim_ivfpq_grown); the
      // APPENDS are the measured grow verbs, per run on copies. The two
      // independent copy→append chains overlap (guide §2.6).
      graft.operators.Par.runUnit(Seq(
        () => {
          val base = cachedArtifact(dir, "ivfpq-half",
            e.select(col("vec_id").as("doc_id"),
              col("embedding").cast("string").as("text"))) { out =>
            Similarity.buildIvfPqIndex(e.where(col("vec_id") < nE / 2),
              s"$out/idx")
          }
          copyRecursively(java.nio.file.Paths.get(base, "idx"),
            java.nio.file.Paths.get(annIdx))
          Similarity.appendToIvfPqIndex(e.where(col("vec_id") >= nE / 2), annIdx)
        },
        () => {
          val base = cachedArtifact(dir, "bm25-built-half", d) { out =>
            Retrieval.buildBm25Index(d.where(col("doc_id") < nD / 2),
              s"$out/idx")
          }
          copyRecursively(java.nio.file.Paths.get(base, "idx"),
            java.nio.file.Paths.get(bmIdx))
          Retrieval.appendToBm25Index(d.where(col("doc_id") >= nD / 2), bmIdx)
        }))
      fixtureSecs.put("hybrid-grown-build", (System.nanoTime() - tB) / 1e9)
      val bm = Retrieval.bm25IndexedTopK(s, bmIdx,
        Seq("spark", "window", "merge"), 20)
      val ann = Similarity.ivfPqTopK(e, annIdx, q, 20)
        .withColumnRenamed("vec_id", "doc_id")
      val out = Retrieval.rrfFuse(Seq(
          (bm, Seq(col("score").desc, col("doc_id"))),
          (ann, Seq(col("sim").desc, col("doc_id")))),
        idCol = "doc_id", k = 10).localCheckpoint(true)
      deleteRecursively(st)
      out
    },

    // ---- text analysis ---------------------------------------------------
    QueryDef("txt_langid")(
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        | sc AS (
        |   SELECT doc_id, 'de' AS code, len(list_filter(ws, t -> t IN ('table','join','merge','group'))) AS score FROM w
        |   UNION ALL SELECT doc_id, 'en', len(list_filter(ws, t -> t IN ('the','a','fast','slow'))) FROM w
        |   UNION ALL SELECT doc_id, 'es', len(list_filter(ws, t -> t IN ('data','row','stream','big'))) FROM w
        |   UNION ALL SELECT doc_id, 'fr', len(list_filter(ws, t -> t IN ('window','query','agg','line'))) FROM w),
        | p AS (SELECT doc_id, code FROM
        |         (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, code DESC) AS rn
        |          FROM sc) WHERE rn = 1)
        | SELECT code AS pred_lang, CAST(count(*) AS BIGINT) AS n
        | FROM p GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.langId(Tables(s, dir, "documents"))
        .groupBy(col("pred_lang")).agg(count(lit(1)).as("n")).orderBy(col("pred_lang"))
    },

    QueryDef("txt_quality")(
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |   round((length(text) - (len(string_split(text, ' ')) - 1)) / len(string_split(text, ' ')), 6) AS mean_tok_len,
        |   round(len(list_filter(string_split(text, ' '), t -> t IN ('the','a','and','of','to')))
        |         / len(string_split(text, ' ')), 6) AS stopword_ratio,
        |   round(least(len(string_split(text, ' ')) / 50.0, 1.0) * 0.5
        |       + least(len(list_filter(string_split(text, ' '), t -> t IN ('the','a','and','of','to')))
        |               / len(string_split(text, ' ')) * 10.0, 1.0) * 0.5, 6) AS quality_score
        | FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.quality(Tables(s, dir, "documents").where(col("doc_id") < 100))
        .withColumn("n_chars", col("n_chars").cast("long"))
        .orderBy(col("doc_id"))
    },

    // Model-based quality gate (the CCNet/FineWeb pattern): logistic
    // regression over the declared quality features with fixed offline
    // weights; inference is a pure per-row projection. The pass gate
    // compares the ROUNDED score so both engines gate on the same number
    // (verified: no corpus score within 1e-4 of the 0.5 boundary).
    QueryDef("txt_lr_score")(
      """WITH f AS (SELECT doc_id,
        |    (length(text) - (len(string_split(text,' ')) - 1)) / len(string_split(text,' ')) AS mtl,
        |    len(list_filter(string_split(text,' '), t -> t IN ('the','a','and','of','to'))) / len(string_split(text,' ')) AS sr,
        |    ln(1.0 + len(string_split(text,' '))) AS lt
        |  FROM documents),
        | sc AS (SELECT doc_id,
        |    round(1.0 / (1.0 + exp(-(-3.0 + 0.4 * mtl + 6.0 * sr + 0.35 * lt))), 6) AS lr_score
        |  FROM f)
        | SELECT doc_id, lr_score, CAST(lr_score >= 0.5 AS INT) AS pass
        | FROM sc ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.lrQuality(Tables(s, dir, "documents")).orderBy(col("doc_id"))
    },

    // TRAIN the quality gate (VERDICT r13 #4): fixed-iteration full-batch
    // gradient descent over the declared LR features — each iteration one
    // map-side-combined gradient aggregate; the label is a deterministic
    // row property (lang = 'en' — separable via the English-stopword
    // ratio feature, so the learned weights are meaningful, not noise).
    // Determinism: per-row sigmoids round to 6 decimals, per-row gradient
    // contributions quantize to integers (×10⁶) so the SUM is order-free,
    // weights round to 9 decimals per update — the oracle replays all 5
    // iterations as chained CTEs and the TRAJECTORY itself is
    // hash-checked (the learnMerges proof pattern applied to learning a
    // model).
    QueryDef("txt_lr_train")(TextAnalysis.lrTrainSql(5)) { (s, dir) =>
      import s.implicits._
      TextAnalysis.lrTrain(Tables(s, dir, "documents"),
          col("lang") === "en", iters = 5)
        .zipWithIndex
        .map { case (w, i) => (i + 1L, w(0), w(1), w(2), w(3)) }
        .toDF("iter", "w0", "w_mtl", "w_stop", "w_ltok")
        .orderBy(col("iter"))
    },

    // The learned gate APPLIED: the corpus scored under its own trained
    // weights (train → score end to end through lrQuality — the learned
    // model scores with exactly the features it trained on). Hash
    // equality covers every gradient step AND the final inference
    // projection.
    QueryDef("txt_lr_trained")(TextAnalysis.lrTrainedScoreSql(5)) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val w = TextAnalysis.lrTrain(d, col("lang") === "en", iters = 5).last
      TextAnalysis.lrQuality(d, w(0), w(1), w(2), w(3)).orderBy(col("doc_id"))
    },

    // HELD-OUT evaluation of the trained gate — the rung between training
    // and serving that txt_lr_train/txt_lr_trained left open: md5-bucket
    // fold split (the engine-standard pure-row-property split, so the
    // folds are reproducible on any engine), train on the 80% standing
    // fold, score the 20% held-out fold, and hash-check the EVALUATION
    // METRICS themselves — exact Mann–Whitney AUC (ties by average rank,
    // computed over the bounded score-distinct table, never a global
    // row-rank window) and accuracy at the serving threshold. A model
    // whose training replays but whose held-out discrimination silently
    // regressed now fails the oracle, not just its loss curve.
    //
    // The labeled corpus is the gate's true production task, PLANTED the
    // way dedup rows plant duplicates: quality originals vs stopword-spam
    // junk twins (deterministic, engine-portable, per-doc-varying). The
    // synthetic corpus's own columns (lang/source) are homogeneous in the
    // quality features by construction (measured: AUC 0.512 on lang), so
    // a real label would only prove the metric arithmetic on a useless
    // model; the planted label proves it on a model that genuinely
    // discriminates (held-out AUC 0.73).
    QueryDef("txt_lr_eval")(
      TextAnalysis.lrEvalSql(10, corpusSql = junkPlantSql,
        labelExpr = "CAST(doc_id < 1000000 AS INT)")) { (s, dir) =>
      TextAnalysis.lrEval(junkPlant(s, dir),
        col("doc_id") < 1000000L, iters = 10)
    },

    // CALIBRATE the serving threshold on the held-out fold: the lowest
    // threshold whose held-out precision clears the floor (recall argmax
    // under the precision constraint — the operating point a junk-gate
    // deploys with, rather than the default 0.5). The oracle replays the
    // training chain, the cumulative TP/FP sweep over the score-distinct
    // table, and the qualifying-threshold pick; precision/recall round
    // BEFORE the filter so both engines choose from identical values.
    // Same planted junk corpus as txt_lr_eval.
    QueryDef("txt_lr_calibrate")(
      TextAnalysis.lrCalibrateSql(10, 0.9, corpusSql = junkPlantSql,
        labelExpr = "CAST(doc_id < 1000000 AS INT)")) { (s, dir) =>
      TextAnalysis.lrCalibrate(junkPlant(s, dir),
        col("doc_id") < 1000000L, targetPrecision = 0.9, iters = 10)
    },

    QueryDef("txt_tokens")(
      """SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        |   CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS sub_tokens
        | FROM documents GROUP BY 1 ORDER BY source""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      TextAnalysis.tokenCounts(d)
        .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(sum(col("ws_tokens")).as("ws_tokens"), sum(col("sub_tokens")).as("sub_tokens"))
        .orderBy(col("source"))
    },

    // Percentile-gated outlier filtering (quality-floor curation): drop docs
    // whose char length sits below the corpus p10. The threshold is ONE
    // distributed exact-percentile aggregate (object buffer — kept clear of
    // any DISTINCT agg per the q37 Expand lesson) cross-joined as a 1-row
    // scalar; the survivor count is a second plain aggregate. Both engines
    // interpolate percentiles with the same type-7 rule (position
    // 1 + p·(n−1)), so the threshold itself hash-matches.
    QueryDef("txt_outliers")(
      """WITH thr AS (SELECT quantile_cont(length(text), 0.1) AS p10 FROM documents)
        | SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
        |   round(any_value(p10), 6) AS p10
        | FROM documents CROSS JOIN thr
        | WHERE length(text) >= p10
        | GROUP BY lang ORDER BY lang""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val thr = d.agg(expr("percentile(length(text), 0.1)").as("p10"))
      d.crossJoin(thr)
        .where(length(col("text")) >= col("p10"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), round(any_value(col("p10")), 6).as("p10"))
        .orderBy(col("lang"))
    },

    // Token-budget sequence packing: assign docs (in id order, per lang) to
    // consecutive fixed-budget training bins — the batch-construction step
    // of a training pipeline (the weighted cousin of the LASER 100-row
    // chunker, `LASERInputValidator.java:137-165`). One keyed running
    // window + one aggregate; langs pack in parallel.
    QueryDef("txt_pack")(
      """WITH t AS (SELECT lang, doc_id, len(string_split(text, ' ')) AS tok
        |           FROM documents),
        | c AS (SELECT lang, doc_id, tok,
        |         sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |       FROM t)
        | SELECT lang, CAST((cum - tok) // 2000 AS BIGINT) AS bin,
        |   CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tok) AS BIGINT) AS toks
        | FROM c GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin
    ) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Long.MinValue, 0)
      Tables(s, dir, "documents")
        .select(col("lang"), col("doc_id"), size(split(col("text"), " ")).as("tok"))
        .withColumn("cum", sum(col("tok")).over(w))
        .select(col("lang"), floor((col("cum") - col("tok")) / lit(2000)).as("bin"), col("tok"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("toks"))
        .orderBy(col("lang"), col("bin"))
    },

    // TOKEN-ACCURATE counting: the production BPE kernel (mapPartitions,
    // iterate-lowest-rank merge loop + per-partition word memo) against an
    // oracle that replays the SAME merge list as a literal replace chain
    // (generated from one Scala Seq — the two engines cannot drift). The
    // hash match proves kernel ≡ chain ≡ SQL on every corpus word; packing
    // and batch manifests below budget on THESE counts, not whitespace.
    QueryDef("txt_bpe")(
      s"""SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
         |   CAST(${Bpe.tokenCountSql("text")} AS BIGINT) AS bpe_tokens
         | FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Bpe.encodeDocs(Tables(s, dir, "documents")).orderBy(col("doc_id"))
    },

    // txt_pack re-based on REAL token budgets: same consecutive-bin packing
    // shape, but the running window sums BPE tokens (the codegen'd chain —
    // whole-stage codegen, no kernel handoff in the hot path).
    QueryDef("txt_pack_bpe")(
      s"""WITH t AS (SELECT lang, doc_id,
         |             ${Bpe.tokenCountSql("text")} AS tok FROM documents),
         | c AS (SELECT lang, doc_id, tok,
         |         sum(tok) OVER (PARTITION BY lang ORDER BY doc_id
         |                        ROWS UNBOUNDED PRECEDING) AS cum
         |       FROM t)
         | SELECT lang, CAST((cum - tok) // 1500 AS BIGINT) AS bin,
         |   CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tok) AS BIGINT) AS toks
         | FROM c GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin
    ) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Long.MinValue, 0)
      Tables(s, dir, "documents")
        .select(col("lang"), col("doc_id"), Bpe.tokenCount(col("text")).as("tok"))
        .withColumn("cum", sum(col("tok")).over(w))
        .select(col("lang"), floor((col("cum") - col("tok")) / lit(1500)).as("bin"), col("tok"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("toks"))
        .orderBy(col("lang"), col("bin"))
    },

    // The token SEQUENCES a dataloader materializes — not just counts:
    // the production kernel (merge loop + word memo, mapPartitions) emits
    // per-doc token arrays and vocab ids; the oracle replays the replace
    // chain to the rendered string, splits it back into tokens, and maps
    // ids through the SAME Scala-generated vocab CASE. Spaces are tokens
    // (concat(tokens) == text — BpeSpec pins the round trip), bpe_tokens
    // excludes them so it matches txt_bpe's budgets exactly.
    QueryDef("txt_bpe_ids")(
      s"""WITH tl AS (SELECT doc_id, ${Bpe.tokensSql("text")} AS l
         |            FROM documents WHERE doc_id < 200)
         | SELECT doc_id,
         |   array_to_string(l, '|') AS tokens_str,
         |   array_to_string(list_transform(l,
         |     t -> CAST((${Bpe.tokenIdCaseSql("t")}) AS VARCHAR)), ',') AS ids_str,
         |   CAST(len(list_filter(l, t -> t <> ' ')) AS BIGINT) AS bpe_tokens
         | FROM tl ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Bpe.encodeDocsIds(Tables(s, dir, "documents").where(col("doc_id") < 200))
        .select(col("doc_id"),
          array_join(col("tokens"), "|").as("tokens_str"),
          array_join(expr("transform(ids, x -> cast(x as string))"), ",").as("ids_str"),
          col("bpe_tokens"))
        .orderBy(col("doc_id"))
    },

    // BPE merge LEARNING (Sennrich 2016 §3.2): the corpus reduces to the
    // word-frequency table (the one distributed pass), learning runs
    // driver-side over it — the subword-nmt architecture, not a per-merge
    // Spark job. The oracle replays all 8 steps as chained CTEs (pair
    // counts over rendered words → argmax with the deterministic
    // (count DESC, x, y) tie-break → leftmost-non-overlap replace), both
    // sides generated from one contract, so the learned list itself is
    // hash-checked, not just its downstream effects.
    QueryDef("txt_bpe_learn")(Bpe.learnSql(8)) { (s, dir) =>
      import s.implicits._
      Bpe.learnMerges(Tables(s, dir, "documents").select(col("doc_id"), col("text")),
          n = 8, minCount = 1)
        .zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("rank", "x", "y")
        .orderBy(col("rank"))
    },

    // The learned list APPLIED: corpus re-tokenized under its own learned
    // merges (learning feeding the production kernel end to end). The
    // oracle derives per-word token counts from the final merged word
    // table and rolls them up per doc — hash equality proves the engine's
    // learn → encode chain equals the SQL replay's, including every
    // argmax tie-break along the way.
    QueryDef("txt_bpe_learned")(
      s"${Bpe.learnedCountSql(8)} ORDER BY doc_id"
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      Bpe.encodeDocs(d, Bpe.learnMerges(d, n = 8, minCount = 1))
        .select(col("doc_id"), col("bpe_tokens"))
        .orderBy(col("doc_id"))
    },

    // The PRE-TOKENIZED learn→encode chain (the production word contract):
    // a GPT-2-style regex pre-tokenizer — letter runs / digit runs /
    // punctuation runs, whitespace never a token — replaces the bare
    // single-space split ahead of BOTH merge learning and the encode
    // kernel, so punctuation stops gluing to words (`word,` and `word`
    // share statistics) and no-space text stops degrading into one giant
    // word. Two adversarial docs are planted (same literals in both
    // engines): a punctuation/digit-dense one and a no-space one — under
    // the space-split contract each is 1–7 giant words; pre-tokenized
    // they split into runs the merge loop handles at normal cost. The
    // oracle replays the full pre-tokenized learn (8 argmax steps, same
    // CTE chain as txt_bpe_learn but over pretokens) and the per-doc
    // (n_pretok, bpe_tokens) roll-up.
    QueryDef("txt_bpe_pretok")(
      s"""${Bpe.learnedPretokCountSql(8,
             """(SELECT doc_id, text FROM documents WHERE doc_id < 300
               | UNION ALL SELECT 900001, 'end.of.sentence,and then:more!words 42x7 code(x1,y2)'
               | UNION ALL SELECT 900002, 'nospacetexthereatall...nospacetexthereatall!!!42')"""
               .stripMargin)}
         | ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
        .where(col("doc_id") < 300)
        .unionAll(s.range(1).select(lit(900001L).as("doc_id"),
          lit("end.of.sentence,and then:more!words 42x7 code(x1,y2)").as("text")))
        .unionAll(s.range(1).select(lit(900002L).as("doc_id"),
          lit("nospacetexthereatall...nospacetexthereatall!!!42").as("text")))
      Bpe.encodeDocsPretok(d, Bpe.learnMerges(d, n = 8, minCount = 1, pretok = true))
        .orderBy(col("doc_id"))
    },

    // Intra-doc repetition filter (duplicate word-3-gram fraction + hottest
    // n-gram count) — the natural corpus has near-zero repetition, so one
    // degenerate boilerplate doc is planted (both engines build it with
    // repeat()) to keep the checked result non-degenerate.
    QueryDef("txt_repetition")(
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 100
        |   UNION ALL SELECT 100000, trim(repeat('spam ham eggs ', 40))),
        | toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
        | sh AS (SELECT doc_id, array_to_string(w[i.i:i.i+2], ' ') AS shingle
        |        FROM toks JOIN range(1, 100000) i(i) ON i.i <= len(w) - 2
        |        UNION ALL SELECT doc_id, array_to_string(w, ' ')
        |        FROM toks WHERE len(w) < 3),
        | cnt AS (SELECT doc_id, shingle, count(*) AS c FROM sh GROUP BY 1, 2)
        | SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
        |   CAST(count(*) AS BIGINT) AS n_distinct,
        |   round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 6) AS dup_frac,
        |   CAST(max(c) AS BIGINT) AS top_ngram_count
        | FROM cnt GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")).where(col("doc_id") < 100)
        .unionAll(s.range(1).select(lit(100000L).as("doc_id"),
          expr("trim(repeat('spam ham eggs ', 40))").as("text")))
      TextAnalysis.repetition(d).orderBy(col("doc_id"))
    },

    QueryDef("txt_fingerprint")(
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 100),
        | sh AS (SELECT DISTINCT doc_id, array_to_string(w[i.i:i.i+3], ' ') AS shingle
        |        FROM toks JOIN range(1, 100000) i(i) ON i.i <= len(w) - 3
        |        UNION ALL SELECT doc_id, array_to_string(w, ' ')
        |        FROM toks WHERE len(w) < 4)
        | SELECT doc_id, min(md5(shingle)) AS fingerprint
        | FROM sh GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.fingerprint(Tables(s, dir, "documents").where(col("doc_id") < 100))
        .orderBy(col("doc_id"))
    },

    // TF-IDF term weighting: df/N computed over the FULL corpus, output
    // pruned to doc_id < 20 (the filter applies after the global stats —
    // pruning before would change every idf).
    QueryDef("txt_tfidf")(
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        | dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
        | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
        | SELECT t.doc_id, t.term, CAST(t.tf AS BIGINT) AS tf,
        |   round((t.tf / dl.dl) * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
        | FROM tf t JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN n
        | WHERE t.doc_id < 20 ORDER BY doc_id, term""".stripMargin
    ) { (s, dir) =>
      TextAnalysis.tfidf(Tables(s, dir, "documents"))
        .where(col("doc_id") < 20)
        .orderBy(col("doc_id"), col("term"))
    },

    // Okapi BM25 scoring for a literal term query (Lucene's non-negative
    // idf form) — sparse retrieval without an inverted index: the term
    // filter is an `isin` literal evaluated inside the scan, (N, avgdl)
    // and per-term df are metadata-scale broadcasts, the top-k is a
    // TakeOrderedAndProject. Both engines total-order on (rounded score,
    // doc_id).
    QueryDef("txt_bm25")(
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
        | stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
        |        WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2),
        | tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | sc AS (SELECT tf.doc_id,
        |     sum( ln(1 + (s.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
        |        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
        |   FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
        |   GROUP BY 1)
        | SELECT doc_id, round(score, 6) AS score FROM sc
        | ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    ) { (s, dir) =>
      Retrieval.bm25TopK(Tables(s, dir, "documents"),
        Seq("spark", "window", "merge"), 20)
    },

    // The same query through the PERSISTED postings index ("index once,
    // query many"): one term-pruned postings scan (filter pushed to
    // parquet row-group level on the sorted term column), the 1-row
    // stats broadcast, zero joins, TakeOrderedAndProject. Identical
    // result contract, identical oracle; the index is
    // fingerprint-cached so the benched number is the QUERY.
    QueryDef("txt_bm25_indexed")(
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
        | stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
        |        WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2),
        | tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | sc AS (SELECT tf.doc_id,
        |     sum( ln(1 + (s.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
        |        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
        |   FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
        |   GROUP BY 1)
        | SELECT doc_id, round(score, 6) AS score FROM sc
        | ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    ) { (s, dir) =>
      Retrieval.bm25IndexedTopK(s,
        cachedBm25Index(dir, Tables(s, dir, "documents")),
        Seq("spark", "window", "merge"), 20)
    },

    // The GROWN index — BM25's append path, driver-checked: build on the
    // first half of the corpus, append the rest in TWO batches (auto ids
    // -2, -3; two version rolls of the global df/stats side tables), and
    // probe the grown index. The oracle scores the FULL corpus from
    // scratch — a hash match proves grown == rebuilt: per-term df
    // re-aggregated exactly, (n_docs, sum_dl) rolled forward as integer
    // sums, no standing posting re-tokenized or rewritten.
    QueryDef("txt_bm25_grown")(
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
        | stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
        |        WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2),
        | tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | sc AS (SELECT tf.doc_id,
        |     sum( ln(1 + (s.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
        |        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
        |   FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
        |   GROUP BY 1)
        | SELECT doc_id, round(score, 6) AS score FROM sc
        | ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val n = d.count()
      val idx = java.nio.file.Files.createTempDirectory("graft-bm25-grown-q")
      val tB = System.nanoTime()
      // The BASE index is pre-existing standing state (fingerprint-cached,
      // r20); the two APPENDS are the measured grow verb and run per run
      // on a filesystem COPY.
      val base = cachedArtifact(dir, "bm25-built-half", d) { out =>
        Retrieval.buildBm25Index(d.where(col("doc_id") < n / 2), s"$out/idx")
      }
      copyRecursively(java.nio.file.Paths.get(base, "idx"), idx)
      Retrieval.appendToBm25Index(
        d.where(col("doc_id") >= n / 2 && col("doc_id") < 3 * n / 4), idx.toString)
      Retrieval.appendToBm25Index(
        d.where(col("doc_id") >= 3 * n / 4), idx.toString)
      fixtureSecs.put("bm25-grown-build", (System.nanoTime() - tB) / 1e9)
      val out = Retrieval.bm25IndexedTopK(s, idx.toString,
        Seq("spark", "window", "merge"), 20).localCheckpoint(true)
      deleteRecursively(idx)
      out
    },

    // The STREAMING ingest loop run end to end inside the oracle row:
    // seed the index from a standing partial corpus, stream the rest as
    // two file-dropped micro-batches through Streams.bm25Ingest
    // (postings partition + df/stats version roll per batch), then probe
    // the final index. The oracle scores the full corpus from scratch —
    // a hash match proves the stream-grown index equals a one-shot
    // build, driver-checked.
    QueryDef("txt_bm25_stream")(
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
        | stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
        |        WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2),
        | tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | sc AS (SELECT tf.doc_id,
        |     sum( ln(1 + (s.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
        |        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
        |   FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
        |   GROUP BY 1)
        | SELECT doc_id, round(score, 6) AS score FROM sc
        | ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val st = java.nio.file.Files.createTempDirectory("graft-bm25-stream-q")
      val idxDir = s"$st/index"
      val tSeed = System.nanoTime()
      val inDir = java.nio.file.Files.createTempDirectory("graft-bm25-stream-in")
      // Seed index fingerprint-cached (r20); bm25Ingest GROWS it, so each
      // run works on a filesystem COPY — copy ∥ stagings (guide §2.6).
      graft.operators.Par.runUnit(Seq(
        () => {
          val seed = cachedArtifact(dir, "bm25-seed-b100", d) { out =>
            Retrieval.buildBm25Index(d.where(col("doc_id") >= 100),
              s"$out/idx")
          }
          copyRecursively(java.nio.file.Paths.get(seed, "idx"),
            java.nio.file.Paths.get(idxDir))
        },
        () => stageAsFile(d.where(col("doc_id") < 50), inDir, "b1.parquet"),
        () => stageAsFile(d.where(col("doc_id") >= 50 && col("doc_id") < 100),
          inDir, "b2.parquet")))
      orderStaged(inDir, "b1.parquet", "b2.parquet")
      fixtureSecs.put("bm25-stream-fixture", (System.nanoTime() - tSeed) / 1e9)
      val tLoop = System.nanoTime()
      val q = graft.streaming.Streams.bm25Ingest(
        graft.streaming.Streams.documentsStream(s, inDir.toString, maxFilesPerTrigger = 1),
        idxDir, s"$st/ckpt")
      q.awaitTermination()
      fixtureSecs.put("bm25-stream-loop", (System.nanoTime() - tLoop) / 1e9)
      val out = Retrieval.bm25IndexedTopK(s, idxDir,
        Seq("spark", "window", "merge"), 20).localCheckpoint(true)
      deleteRecursively(st)
      deleteRecursively(inDir)
      out
    },

    // Append-side COMPACTION of the BM25 index (r16): build on the first
    // half, append the rest in two batches (three postings partitions,
    // two version rolls), FOLD the partitions into one re-based bulk
    // partition (compactBm25Batches — term-range sort preserved, so
    // pushed term filters keep pruning row groups), and probe. The
    // oracle scores the full corpus from scratch — a hash match proves
    // folded == grown == rebuilt; the in-row require pins the partition
    // collapse itself.
    QueryDef("txt_bm25_compacted")(
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
        | stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
        |        WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2),
        | tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | sc AS (SELECT tf.doc_id,
        |     sum( ln(1 + (s.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
        |        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
        |   FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
        |   GROUP BY 1)
        | SELECT doc_id, round(score, 6) AS score FROM sc
        | ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val n = d.count()
      val idx = java.nio.file.Files.createTempDirectory("graft-bm25-compact-q")
      val tB = System.nanoTime()
      // Pre-compaction standing state (build + two appends) persisted once
      // per testdata fingerprint (r20, the dd_cluster_increment treatment);
      // compaction MUTATES the index, so each run compacts a filesystem
      // COPY. The row measures the compaction verb + probe identity, not
      // the index rebuild.
      val built = cachedArtifact(dir, "bm25-built-3batch", d) { out =>
        Retrieval.buildBm25Index(d.where(col("doc_id") < n / 2), s"$out/idx")
        Retrieval.appendToBm25Index(
          d.where(col("doc_id") >= n / 2 && col("doc_id") < 3 * n / 4), s"$out/idx")
        Retrieval.appendToBm25Index(
          d.where(col("doc_id") >= 3 * n / 4), s"$out/idx")
      }
      copyRecursively(java.nio.file.Paths.get(built, "idx"), idx)
      Retrieval.compactBm25Batches(s, idx.toString)
      fixtureSecs.put("bm25-compact-build", (System.nanoTime() - tB) / 1e9)
      val parts = new java.io.File(s"$idx/postings").listFiles()
        .count(_.getName.startsWith("batch="))
      require(parts == 1,
        s"compaction must fold to one postings partition, got $parts")
      val out = Retrieval.bm25IndexedTopK(s, idx.toString,
        Seq("spark", "window", "merge"), 20).localCheckpoint(true)
      deleteRecursively(idx)
      out
    },

    // Batch BM25: top-10 per query for a 3-query request batch in ONE
    // corpus pass (the lexical sibling of sim_knn_join) — per-query
    // top-k via the TopK Aggregator, O(queries × k) shuffle. Scores
    // round before the cut; rk is row_number on (score DESC, doc_id).
    QueryDef("txt_bm25_batch")(
      """WITH q(query_id, term) AS (VALUES (0, 'spark'), (0, 'merge'),
        |     (1, 'window'), (1, 'stream'), (2, 'vector')),
        | terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
        | stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
        |        WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
        | tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | sc AS (SELECT q.query_id, tf.doc_id,
        |     round(sum( ln(1 + (s.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
        |        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ), 6) AS score
        |   FROM tf JOIN q USING (term) JOIN tdf USING (term)
        |   JOIN dl USING (doc_id) CROSS JOIN stats s
        |   GROUP BY 1, 2),
        | r AS (SELECT query_id, doc_id, score,
        |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
        |       FROM sc)
        | SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
        |   CAST(rk AS BIGINT) AS rk
        | FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val queries = Seq(
        (0L, Seq("spark", "merge")),
        (1L, Seq("window", "stream")),
        (2L, Seq("vector"))).toDF("query_id", "terms")
      Retrieval.bm25Join(Tables(s, dir, "documents"), queries, k = 10)
        .orderBy(col("query_id"), col("rk"))
    },

    // The BM25 TAKEDOWN path, driver-checked at both stages (r15): build
    // half + append half, LOGICALLY purge every doc_id % 5 == 2 (exact
    // integer df/n_docs/sum_dl roll-back derived from the index's own
    // postings; probes mask the ids with a candidate-scale anti-join),
    // then COMPACT (touched partitions rewritten under the two-phase
    // marker; probes drop the mask). The oracle scores the SURVIVING
    // corpus from scratch and expects both stages identical — a hash
    // match proves purged == rebuilt-without before AND after the bytes
    // physically leave the postings.
    QueryDef("txt_bm25_purged")(
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |               FROM documents WHERE doc_id % 5 <> 2),
        | dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
        | stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        | tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
        |        WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2),
        | tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        | sc AS (SELECT tf.doc_id,
        |     sum( ln(1 + (s.n_docs - tdf.df + 0.5) / (tdf.df + 0.5))
        |        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) ) AS score
        |   FROM tf JOIN tdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
        |   GROUP BY 1),
        | topk AS (SELECT doc_id, round(score, 6) AS score FROM sc
        |          ORDER BY score DESC, doc_id LIMIT 20)
        | SELECT CAST(0 AS BIGINT) AS stage, doc_id, score FROM topk
        | UNION ALL SELECT CAST(1 AS BIGINT), doc_id, score FROM topk
        | ORDER BY stage, score DESC, doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val n = d.count()
      val idx = java.nio.file.Files.createTempDirectory("graft-bm25-purge-q")
      val tB = System.nanoTime()
      // Pre-takedown standing state (build + append) persisted once per
      // testdata fingerprint; the purge/compact verbs MUTATE, so each run
      // works on a filesystem COPY (r20 — see txt_bm25_compacted).
      val built = cachedArtifact(dir, "bm25-built-2batch", d) { out =>
        Retrieval.buildBm25Index(d.where(col("doc_id") < n / 2), s"$out/idx")
        Retrieval.appendToBm25Index(d.where(col("doc_id") >= n / 2), s"$out/idx")
      }
      copyRecursively(java.nio.file.Paths.get(built, "idx"), idx)
      fixtureSecs.put("bm25-purge-build", (System.nanoTime() - tB) / 1e9)
      Retrieval.purgeFromBm25Index(s, idx.toString,
        d.where(col("doc_id") % 5 === 2).select(col("doc_id")))
      val logical = Retrieval.bm25IndexedTopK(s, idx.toString,
          Seq("spark", "window", "merge"), 20)
        .select(lit(0L).as("stage"), col("doc_id"), col("score"))
        .localCheckpoint(true)
      Retrieval.compactBm25Postings(s, idx.toString)
      val compacted = Retrieval.bm25IndexedTopK(s, idx.toString,
          Seq("spark", "window", "merge"), 20)
        .select(lit(1L).as("stage"), col("doc_id"), col("score"))
        .localCheckpoint(true)
      deleteRecursively(idx)
      logical.unionAll(compacted)
        .orderBy(col("stage"), col("score").desc, col("doc_id"))
    },

    // End-to-end corpus-curation pipeline: quality gate → exact dedup →
    // per-language counts. The canonical composition of the operators above
    // — every stage is the declared operator, not a reimplementation.
    QueryDef("txt_pipeline")(
      s"""WITH corpus AS (SELECT doc_id, text, lang FROM documents
         |   UNION ALL SELECT doc_id + 100000, text, lang FROM documents WHERE doc_id < 20),
         | q AS (SELECT doc_id,
         |         round(least(len(string_split(text, ' ')) / 50.0, 1.0) * 0.5
         |             + least(len(list_filter(string_split(text, ' '), t -> t IN ('the','a','and','of','to')))
         |                     / len(string_split(text, ' ')) * 10.0, 1.0) * 0.5, 6) AS score
         |       FROM corpus),
         | kept AS (SELECT c.doc_id, c.text, c.lang FROM corpus c
         |          JOIN q ON c.doc_id = q.doc_id WHERE q.score >= 0.5),
         | keeps AS (SELECT CAST(min(doc_id) AS BIGINT) AS keep_id
         |           FROM kept GROUP BY md5(text)),
         | fin AS (SELECT k.lang FROM kept k JOIN keeps d ON k.doc_id = d.keep_id)
         | SELECT lang, CAST(count(*) AS BIGINT) AS n
         | FROM fin GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
      val corpus = d.unionAll(d.where(col("doc_id") < 20)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"), col("lang")))
      val kept = corpus.join(
        TextAnalysis.quality(corpus).where(col("quality_score") >= 0.5).select("doc_id"),
        Seq("doc_id"))
      val keeps = Dedup.exact(kept).select(col("keep_id").as("doc_id"))
      kept.join(keeps, Seq("doc_id"), "left_semi")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .orderBy("lang")
    },

    // Text scrub/normalize (PII-style masking + whitespace collapse) — a
    // per-row codegen'd projection, the standard pre-tokenization cleanup.
    QueryDef("txt_scrub")(
      """SELECT doc_id,
        |   regexp_replace(regexp_replace(lower(text), '[0-9]', '#', 'g'), ' +', ' ', 'g') AS scrubbed
        | FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "documents").where(col("doc_id") < 50)
        .select(col("doc_id"),
          regexp_replace(regexp_replace(lower(col("text")), "[0-9]", "#"), " +", " ")
            .as("scrubbed"))
        .orderBy("doc_id")
    },

    // Line-level boilerplate removal (TextAnalysis.stripBoilerplate): the
    // CCNet-style cleanup that deletes corpus-wide chrome BEFORE dedup —
    // the upstream defense for the LSH saturation regime CapProbe
    // measured. Planted: a footer on every doc (case-varied, so the
    // normalized match is exercised), a line shared by 3 docs (under the
    // 5% fraction → kept), and per-doc unique markers (kept). Both sides
    // rebuild surviving lines in original order.
    QueryDef("txt_strip_boiler")(
      """WITH corpus AS (
        |   SELECT doc_id, text || chr(10) ||
        |     CASE WHEN doc_id % 2 = 0 THEN 'STANDARD FOOTER LINE'
        |          ELSE 'standard footer line' END ||
        |     CASE WHEN doc_id < 3 THEN chr(10) || 'rare shared line' ELSE '' END ||
        |     CASE WHEN doc_id < 10 THEN chr(10) || 'unique marker ' || CAST(doc_id AS VARCHAR)
        |          ELSE '' END AS text
        |   FROM documents),
        | sp AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM corpus),
        | lines AS (SELECT doc_id, i.i AS pos, parts[CAST(i.i AS INT)] AS line
        |           FROM sp JOIN range(1, 10000) i(i) ON i.i <= len(parts)),
        | nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM corpus),
        | freq AS (SELECT nl, CAST(count(*) AS DOUBLE) AS df FROM
        |            (SELECT DISTINCT doc_id, lower(trim(line)) AS nl
        |             FROM lines WHERE length(trim(line)) > 0)
        |          GROUP BY 1),
        | boiler AS (SELECT nl FROM freq, nd
        |            WHERE df >= greatest(2.0, n_docs * 0.05)),
        | kept AS (SELECT l.doc_id, l.pos, l.line FROM lines l
        |          LEFT JOIN boiler b ON lower(trim(l.line)) = b.nl
        |          WHERE b.nl IS NULL)
        | SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        | FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val corpus = Tables(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit("\n"),
          when(col("doc_id") % 2 === 0, lit("STANDARD FOOTER LINE"))
            .otherwise(lit("standard footer line")),
          when(col("doc_id") < 3, lit("\nrare shared line")).otherwise(lit("")),
          when(col("doc_id") < 10,
            concat(lit("\nunique marker "), col("doc_id").cast("string")))
            .otherwise(lit(""))).as("text"))
      graft.operators.TextAnalysis.stripBoilerplate(corpus).orderBy("doc_id")
    },

    // ---- deterministic sampling -----------------------------------------
    // Hash-mod sampling (operators/Sampling): reproducible across engines,
    // runs and cluster sizes — df.sample() is seed×partitioning dependent,
    // a hash bucket is a pure row property.
    QueryDef("smp_hash")(
      """SELECT doc_id,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
        | FROM documents
        | WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
        | ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      graft.operators.Sampling.hashSample(d, col("doc_id"), 10)
        .select(col("doc_id"),
          graft.operators.Sampling.hashBucket(col("doc_id")).as("bucket"))
        .orderBy("doc_id")
    },

    // Weighted deterministic retention (r16, the FineWeb-Edu pattern):
    // keep each doc with probability equal to its QUALITY SCORE — a
    // per-row rate instead of a hard gate, still a pure row property
    // (stable 32-bit md5 draw, exact in double on both engines). The
    // draw compares against the already-rounded score so both engines
    // reach the same verdict; the kept set's per-doc draw and weight
    // are hash-checked.
    QueryDef("smp_weighted")(
      """WITH q AS (SELECT doc_id,
        |   round(least(len(string_split(text, ' ')) / 50.0, 1.0) * 0.5
        |       + least(len(list_filter(string_split(text, ' '), t -> t IN ('the','a','and','of','to')))
        |               / len(string_split(text, ' ')) * 10.0, 1.0) * 0.5, 6) AS quality_score
        | FROM documents),
        | dr AS (SELECT doc_id, quality_score,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS draw
        | FROM q)
        | SELECT doc_id, round(draw, 6) AS draw, quality_score
        | FROM dr WHERE draw < quality_score ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val w = d.join(graft.operators.TextAnalysis.quality(d)
        .select(col("doc_id"), col("quality_score")), Seq("doc_id"))
      graft.operators.Sampling
        .weightedSample(w, col("doc_id"), col("quality_score"))
        .select(col("doc_id"),
          round(graft.operators.Sampling.hashUnit(col("doc_id")), 6).as("draw"),
          col("quality_score"))
        .orderBy("doc_id")
    },

    // Stratified: downsample the dominant language, keep the tail — the
    // canonical corpus-rebalancing step. Strata outside the map drop.
    QueryDef("smp_stratified")(
      """WITH s AS (SELECT lang,
        |             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        |           FROM documents)
        | SELECT lang, CAST(count(*) AS BIGINT) AS n FROM s
        | WHERE (lang = 'en' AND b < 10) OR (lang = 'de' AND b < 50)
        |    OR (lang = 'zh' AND b < 100)
        | GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      graft.operators.Sampling.stratifiedSample(d, col("lang"), col("doc_id"),
          Map("en" -> 10, "de" -> 50, "zh" -> 100))
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .orderBy("lang")
    },

    // Target-mixture rebalancing: the output proportions are specified a
    // priori (the training-mixture spec) and per-stratum keep rates are
    // DERIVED — achievable size N = min_s floor(n_s/p_s) (binding stratum
    // kept whole), stratum s keeps floor(p_s·N·buckets/n_s) hash slots.
    // The oracle replays the identical derivation; thresholds are integer
    // compares so there is no epsilon boundary.
    QueryDef("smp_mixture")(
      """WITH t(lang, p) AS (VALUES ('en', 0.3), ('de', 0.2), ('es', 0.2),
        |                           ('fr', 0.15), ('zh', 0.15)),
        | c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        | j AS (SELECT c.lang, c.n, t.p FROM c JOIN t USING (lang)),
        | a AS (SELECT min(CAST(floor(n / p) AS BIGINT)) AS nach FROM j),
        | thr AS (SELECT lang, CAST(floor(p * nach * 10000.0 / n) AS BIGINT) AS th
        |         FROM j CROSS JOIN a)
        | SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
        | FROM documents d JOIN thr USING (lang)
        | WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < th
        | GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      graft.operators.Sampling.mixtureSample(
          Tables(s, dir, "documents"), col("lang"), col("doc_id"),
          Map("en" -> 0.3, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.15, "zh" -> 0.15))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
        .orderBy(col("lang"))
    },

    // Mixture on TOKEN budgets (smp_mixture's DoReMi-shaped sibling):
    // weights allocate token mass, not doc counts — zh's short docs get
    // MORE docs per budget share than en's long ones. Realized budget =
    // min(asked, min_s floor(T_s/w_s)); per-stratum keep-rate =
    // B·w_s/T_s through the same md5 gate. toks_kept per lang lands
    // ≈ B·w_s (the hash sampler's expectation contract; the oracle
    // replays the exact threshold arithmetic so the row is hash-exact).
    QueryDef("smp_token_mixture")(
      s"""WITH t(lang, w) AS (VALUES ('en', 0.4), ('de', 0.2), ('es', 0.2),
        |                           ('fr', 0.1), ('zh', 0.1)),
        | k AS (SELECT doc_id, lang, ${Bpe.tokenCountSql("text")} AS tok FROM documents),
        | c AS (SELECT lang, sum(tok) AS tt FROM k GROUP BY 1),
        | j AS (SELECT c.lang, c.tt, t.w FROM c JOIN t USING (lang)),
        | a AS (SELECT least(10000, min(CAST(floor(tt / w) AS BIGINT))) AS bach FROM j),
        | thr AS (SELECT lang, CAST(floor(w * bach * 10000.0 / tt) AS BIGINT) AS th
        |         FROM j CROSS JOIN a)
        | SELECT k.lang, CAST(count(*) AS BIGINT) AS n_kept,
        |   CAST(sum(k.tok) AS BIGINT) AS toks_kept
        | FROM k JOIN thr USING (lang)
        | WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < th
        | GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      graft.operators.Sampling.tokenMixtureSample(d, col("lang"), col("doc_id"),
          Bpe.tokenCount(col("text")),
          Map("en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.1, "zh" -> 0.1),
          budget = 10000L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(Bpe.tokenCount(col("text"))).as("toks_kept"))
        .orderBy(col("lang"))
    },

    // Temperature flattening (the multilingual α-sampling rule): sampled
    // sizes m_s = n_min^(1−α)·n_s^α keep the smallest stratum whole and
    // pull larger ones toward it. α = 0.5 → floor(B·sqrt(dbl(n_min)·n)/n):
    // double product (long·long would wrap at 2⁶³-scale strata), then
    // correctly-rounded sqrt and one division — every step identical IEEE
    // across engines, no epsilon boundary.
    QueryDef("smp_temperature")(
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        | mn AS (SELECT min(n) AS nmin FROM c),
        | thr AS (SELECT lang,
        |     CAST(floor(10000.0 * sqrt(CAST(nmin AS DOUBLE) * n) / n) AS BIGINT) AS th
        |         FROM c CROSS JOIN mn)
        | SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
        | FROM documents d JOIN thr USING (lang)
        | WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < th
        | GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      graft.operators.Sampling.temperatureSample(
          Tables(s, dir, "documents"), col("lang"), col("doc_id"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
        .orderBy(col("lang"))
    },

    // Mixture resampling WITH upsampling (the repeat-factor form of real
    // training recipes): same targeted-total output, redistributed to the
    // declared proportions — under-represented langs repeat for ⌊f⌋ full
    // epochs plus a hash-gated fractional epoch, over-represented ones
    // downsample through the same formula (⌊f⌋ = 0). fr is deliberately
    // absent → drops. The oracle replays factors, epochs and the gate
    // (DuckDB's range() can't take lateral column bounds, so the oracle
    // uses a fixed 0..7 epoch range — ample: max factor here is ~1.6 —
    // with the ep = full_ep conjunct making it equivalent to the engine's
    // sequence(0, full)).
    QueryDef("smp_epochs")(
      """WITH t(lang, p) AS (VALUES ('en', 0.25), ('de', 0.25), ('es', 0.25),
        |                           ('zh', 0.25)),
        | c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        | j AS (SELECT c.lang, c.n, t.p FROM c JOIN t USING (lang)),
        | tot AS (SELECT sum(n) AS nt FROM j),
        | f AS (SELECT lang, n, CAST(floor(p * nt / n) AS BIGINT) AS full_ep,
        |         CAST(floor((p * nt / n - floor(p * nt / n)) * 10000.0) AS BIGINT) AS th
        |       FROM j CROSS JOIN tot),
        | outp AS (SELECT d.lang, d.doc_id, r.ep FROM documents d JOIN f USING (lang)
        |          CROSS JOIN range(0, 8) r(ep)
        |          WHERE r.ep < f.full_ep
        |             OR (r.ep = f.full_ep AND
        |                 ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < f.th))
        | SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
        |   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |   CAST(max(ep) AS BIGINT) AS max_epoch
        | FROM outp GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      graft.operators.Sampling.mixtureResample(
          Tables(s, dir, "documents"), col("lang"), col("doc_id"),
          Map("en" -> 0.25, "de" -> 0.25, "es" -> 0.25, "zh" -> 0.25))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          max(col("epoch")).as("max_epoch"))
        .orderBy(col("lang"))
    },

    // TOKEN-budget epochs (smp_epochs' DoReMi-shaped sibling, VERDICT r13
    // #5): repeat factors computed on TOKEN mass, not doc counts —
    // f_s = p_s·T/T_s, ⌊f⌋ full epochs + a hash-gated fractional epoch.
    // A doc-count factor misallocates whenever per-stratum lengths
    // differ (zh's short docs would repeat by doc share and under-carry
    // token mass); SamplingSpec pins the asymmetry on a controlled
    // fixture. The oracle replays the factor arithmetic, the epoch
    // explosion and the gate; toks_kept makes the allocation itself part
    // of the hash check.
    QueryDef("smp_token_epochs")(
      s"""WITH t(lang, p) AS (VALUES ('en', 0.25), ('de', 0.25), ('es', 0.25),
        |                           ('zh', 0.25)),
        | k AS (SELECT doc_id, lang, ${Bpe.tokenCountSql("text")} AS tok FROM documents),
        | c AS (SELECT lang, sum(tok) AS tt FROM k GROUP BY 1),
        | j AS (SELECT c.lang, c.tt, t.p FROM c JOIN t USING (lang)),
        | tot AS (SELECT sum(tt) AS gt FROM j),
        | f AS (SELECT lang, CAST(floor(p * gt / tt) AS BIGINT) AS full_ep,
        |         CAST(floor((p * gt / tt - floor(p * gt / tt)) * 10000.0) AS BIGINT) AS th
        |       FROM j CROSS JOIN tot),
        | outp AS (SELECT k.lang, k.doc_id, k.tok, r.ep FROM k JOIN f USING (lang)
        |          CROSS JOIN range(0, 32) r(ep)
        |          WHERE r.ep < f.full_ep
        |             OR (r.ep = f.full_ep AND
        |                 ('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < f.th))
        | SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
        |   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |   CAST(max(ep) AS BIGINT) AS max_epoch,
        |   CAST(sum(tok) AS BIGINT) AS toks_kept
        | FROM outp GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      graft.operators.Sampling.tokenMixtureResample(
          Tables(s, dir, "documents"), col("lang"), col("doc_id"),
          Bpe.tokenCount(col("text")),
          Map("en" -> 0.25, "de" -> 0.25, "es" -> 0.25, "zh" -> 0.25))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          max(col("epoch")).as("max_epoch"),
          sum(Bpe.tokenCount(col("text"))).as("toks_kept"))
        .orderBy(col("lang"))
    },

    // Leakage-safe split: every member of a near-dup cluster lands in the
    // SAME fold (split on the cluster, not the doc — a per-doc hash split
    // would let a near-copy of a training doc straddle into test). The
    // engine probes the PERSISTED standing labeling (the dd_cluster
    // artifact, shared with dd_cluster_increment); the oracle recomputes
    // connected components from scratch and replays the
    // coalesce(cluster, doc) → md5-bucket → threshold chain, so the hash
    // match covers both the labeling reuse and the fold arithmetic.
    QueryDef("smp_cluster_split")(
      s"""WITH RECURSIVE $plantedChainSql,
         | $lshPairsSql,
         | und AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |         UNION SELECT doc_b, doc_a FROM pairs),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v),
         | labels AS (SELECT node AS doc_id, min(lbl) AS cluster_id
         |            FROM reach GROUP BY 1),
         | keyed AS (SELECT c.doc_id, coalesce(l.cluster_id, c.doc_id) AS split_key
         |           FROM corpus c LEFT JOIN labels l USING (doc_id)),
         | b AS (SELECT doc_id, split_key,
         |         ('0x' || substr(md5(CAST(split_key AS VARCHAR)), 1, 8))::BIGINT % 100 AS bk
         |       FROM keyed)
         | SELECT doc_id, CAST(split_key AS BIGINT) AS split_key,
         |   CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
         |        ELSE 'test' END AS fold
         | FROM b ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val corpus = plantedChain(s, dir)
      val lblDir = cachedArtifact(dir, "cluster-labels", corpus)(out =>
        Dedup.clusterDedupFirst(corpus)
          .write.mode("overwrite").parquet(s"$out/data"))
      val labels = s.read.schema("doc_id LONG, cluster_id LONG")
        .parquet(s"$lblDir/data")
      graft.operators.Sampling.clusterSplit(corpus, labels,
          Seq(("train", 80), ("val", 90), ("test", 100)))
        .select(col("doc_id"), col("split_key").cast("long").as("split_key"),
          col("fold"))
        .orderBy(col("doc_id"))
    },

    // Deterministic global training order: shard + in-shard position are
    // pure functions of (seed, doc_id) — reproducible on any cluster
    // size, exact to resume from, re-permuted by a new seed. The window
    // is partitioned BY SHARD (parallel across shards, no global sort
    // bottleneck); the oracle replays the identical md5 ordering.
    QueryDef("smp_shard_order")(
      """WITH k AS (SELECT doc_id,
        |     ('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard
        |   FROM documents)
        | SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |   CAST(row_number() OVER (PARTITION BY shard
        |        ORDER BY md5('s42:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
        | FROM k ORDER BY shard, pos""".stripMargin
    ) { (s, dir) =>
      graft.operators.Sampling.shardOrder(
          Tables(s, dir, "documents").select(col("doc_id")), col("doc_id"), 8)
        .select(col("doc_id"), col("shard").cast("long").as("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    },

    // The corpus-to-batches CAPSTONE: near-dup labeling (persisted
    // standing artifact) → model quality gate → leakage-safe TRAIN fold
    // → temperature rebalancing over the surviving strata → deterministic
    // shard/position training order. Every stage is its own declared
    // operator with its own oracle row; this row proves the COMPOSITION
    // — thresholds derived from post-gate/post-split counts, folds from
    // cluster keys, order from the seeded permutation — hash-matches a
    // from-scratch SQL replay of the whole chain.
    QueryDef("pipe_training_order")(
      s"""WITH RECURSIVE $plantedChainLangSql,
         | $lshPairsSql,
         | und AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |         UNION SELECT doc_b, doc_a FROM pairs),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v),
         | labels AS (SELECT node AS doc_id, min(lbl) AS cluster_id
         |            FROM reach GROUP BY 1),
         | gate AS (SELECT doc_id FROM (SELECT doc_id,
         |     round(1.0 / (1.0 + exp(-(-3.0
         |       + 0.4 * ((length(text) - (len(string_split(text,' ')) - 1)) / len(string_split(text,' ')))
         |       + 6.0 * (len(list_filter(string_split(text,' '), t -> t IN ('the','a','and','of','to'))) / len(string_split(text,' ')))
         |       + 0.35 * ln(1.0 + len(string_split(text,' ')))))), 6) AS sc
         |   FROM corpus) WHERE sc >= 0.5),
         | keyed AS (SELECT c.doc_id, c.lang, coalesce(l.cluster_id, c.doc_id) AS sk
         |           FROM corpus c JOIN gate USING (doc_id)
         |           LEFT JOIN labels l USING (doc_id)),
         | train AS (SELECT doc_id, lang FROM keyed
         |           WHERE ('0x' || substr(md5(CAST(sk AS VARCHAR)), 1, 8))::BIGINT % 100 < 80),
         | c AS (SELECT lang, count(*) AS n FROM train GROUP BY 1),
         | mn AS (SELECT min(n) AS nmin FROM c),
         | thr AS (SELECT lang,
         |     CAST(floor(10000.0 * sqrt(CAST(nmin AS DOUBLE) * n) / n) AS BIGINT) AS th
         |   FROM c CROSS JOIN mn),
         | samp AS (SELECT t.doc_id, t.lang FROM train t JOIN thr USING (lang)
         |          WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < th),
         | k AS (SELECT doc_id, lang,
         |         ('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4 AS shard
         |       FROM samp)
         | SELECT doc_id, lang, CAST(shard AS BIGINT) AS shard,
         |   CAST(row_number() OVER (PARTITION BY shard
         |        ORDER BY md5('s42:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
         | FROM k ORDER BY shard, pos""".stripMargin
    ) { (s, dir) =>
      import graft.operators.{Sampling, TextAnalysis}
      val corpus = plantedChainLang(s, dir)
      val flat = corpus.select(col("doc_id"), col("text"))
      val lblDir = cachedArtifact(dir, "cluster-labels", flat)(out =>
        Dedup.clusterDedupFirst(flat)
          .write.mode("overwrite").parquet(s"$out/data"))
      val labels = s.read.schema("doc_id LONG, cluster_id LONG")
        .parquet(s"$lblDir/data")
      val gated = corpus.join(
        TextAnalysis.lrQuality(corpus).where(col("pass") === 1)
          .select(col("doc_id")), Seq("doc_id"))
      val train = Sampling.clusterSplit(gated, labels,
          Seq(("train", 80), ("val", 90), ("test", 100)))
        .where(col("fold") === "train")
      val sampled = Sampling.temperatureSample(train, col("lang"), col("doc_id"))
      Sampling.shardOrder(sampled.select(col("doc_id"), col("lang")),
          col("doc_id"), 4)
        .select(col("doc_id"), col("lang"),
          col("shard").cast("long").as("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    },

    // The dataloader's batch MANIFEST: seeded deterministic order
    // (smp_shard_order's permutation) → running token budget within each
    // shard → batch ids — what a training job actually consumes. Batches
    // are reproducible on any cluster size, resumable from (shard,
    // batch), and shard-parallel (one window per shard, no global
    // state); the oracle replays the identical permutation + running-sum
    // packing from scratch. Budgets count BPE tokens (the `txt_bpe`
    // chain, r12) — whitespace counts misestimate real batch sizes 2–4×
    // on CJK/code, which silently breaks every manifest downstream.
    QueryDef("pipe_packed_batches")(
      s"""WITH k AS (SELECT doc_id, ${Bpe.tokenCountSql("text")} AS tok,
        |     ('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
        |     md5('s42:' || CAST(doc_id AS VARCHAR)) AS ord
        |   FROM documents),
        | c AS (SELECT shard, tok,
        |         sum(tok) OVER (PARTITION BY shard ORDER BY ord, doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |       FROM k)
        | SELECT CAST(shard AS BIGINT) AS shard,
        |   CAST((cum - tok) // 1000 AS BIGINT) AS batch,
        |   CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tok) AS BIGINT) AS toks
        | FROM c GROUP BY 1, 2 ORDER BY shard, batch""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), Bpe.tokenCount(col("text")).as("tok"))
      val ordered = graft.operators.Sampling.shardOrder(d, col("doc_id"), 8)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("pos").rowsBetween(Long.MinValue, 0)
      ordered.withColumn("cum", sum(col("tok")).over(w))
        .select(col("shard").cast("long").as("shard"),
          floor((col("cum") - col("tok")) / lit(1000)).as("batch"), col("tok"))
        .groupBy(col("shard"), col("batch"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("toks"))
        .orderBy(col("shard"), col("batch"))
    },

    // The batches MATERIALIZED, not just manifested: pipe_packed_batches'
    // running-budget assignment joined back to the token-id sequences
    // (txt_bpe_ids' kernel), each batch one row carrying the concatenated
    // ids of its member docs in permutation order, a -2 boundary id after
    // each doc (the EOS analogue; -2 is outside both the vocab space and
    // the -1 unk marker). `toks` counts non-space BPE tokens — identical
    // to the manifest's budget basis, so manifest and materialization can
    // never disagree on batch membership. Scale: one row per batch,
    // bounded by the budget (the collect_list is budget-bounded, never
    // corpus-bounded); the permutation window is shard-parallel.
    QueryDef("pipe_token_batches")(
      s"""WITH tl AS (SELECT doc_id, ${Bpe.tokensSql("text")} AS l FROM documents),
        | k AS (SELECT doc_id,
        |     CAST(len(list_filter(l, t -> t <> ' ')) AS BIGINT) AS tok,
        |     list_append(list_transform(l, t -> (${Bpe.tokenIdCaseSql("t")})), -2) AS ids,
        |     ('0x' || substr(md5('s42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
        |     md5('s42:' || CAST(doc_id AS VARCHAR)) AS ord
        |   FROM tl),
        | c AS (SELECT shard, doc_id, ord, tok, ids,
        |         sum(tok) OVER (PARTITION BY shard ORDER BY ord, doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |       FROM k)
        | SELECT CAST(shard AS BIGINT) AS shard,
        |   CAST((cum - tok) // 1000 AS BIGINT) AS batch,
        |   CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tok) AS BIGINT) AS toks,
        |   array_to_string(flatten(list(ids ORDER BY ord, doc_id)), ',') AS ids_str
        | FROM c GROUP BY 1, 2 ORDER BY shard, batch""".stripMargin
    ) { (s, dir) =>
      val ids = Bpe.encodeDocsIds(Tables(s, dir, "documents"))
        .select(col("doc_id"),
          concat(col("ids"), array(lit(-2))).as("ids"),
          col("bpe_tokens").as("tok"))
      val ordered = graft.operators.Sampling.shardOrder(ids, col("doc_id"), 8)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("pos").rowsBetween(Long.MinValue, 0)
      ordered.withColumn("cum", sum(col("tok")).over(w))
        .select(col("shard").cast("long").as("shard"),
          floor((col("cum") - col("tok")) / lit(1000)).as("batch"),
          col("pos"), col("tok"), col("ids"))
        .groupBy(col("shard"), col("batch"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("toks"),
          array_join(expr(
            "transform(flatten(transform(array_sort(collect_list(struct(pos, ids))), x -> x.ids)), i -> cast(i as string))"),
            ",").as("ids_str"))
        .orderBy(col("shard"), col("batch"))
    },

    // THE round-9 composed pipeline (the embedding-space sibling of
    // dd_pipeline's minhash chain): LR quality gate → SemDeDup over the
    // survivors (centroids seeded from the SURVIVOR set — the oracle's
    // row_number ≤ 16 = the engine's centroidsOf on the gated frame) →
    // temperature flattening; per-lang funnel counts. Planted text+vector
    // copies of doc 0–9 gate identically to their originals and then drop
    // in the semantic stage; every stage is its own declared operator.
    QueryDef("cur_pipeline")(
      s"""WITH corpus AS (SELECT doc_id, lang, text FROM documents
         |   UNION ALL SELECT doc_id + 100000, lang, text FROM documents WHERE doc_id < 10),
         | vecs AS (SELECT vec_id, embedding FROM embeddings
         |   UNION ALL SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 10),
         | gate AS (SELECT doc_id, lang FROM (SELECT doc_id, lang,
         |     round(1.0 / (1.0 + exp(-(-3.0
         |       + 0.4 * ((length(text) - (len(string_split(text,' ')) - 1)) / len(string_split(text,' ')))
         |       + 6.0 * (len(list_filter(string_split(text,' '), t -> t IN ('the','a','and','of','to'))) / len(string_split(text,' ')))
         |       + 0.35 * ln(1.0 + len(string_split(text,' ')))))), 6) AS s
         |   FROM corpus) WHERE s >= 0.5),
         | d AS (SELECT g.doc_id AS vec_id, g.lang, v.embedding::DOUBLE[] AS v
         |       FROM gate g JOIN vecs v ON g.doc_id = v.vec_id
         |       WHERE list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[]) > 0),
         | c AS (SELECT vec_id AS cell, v AS cv FROM
         |         (SELECT *, row_number() OVER (ORDER BY vec_id) AS rn FROM d) WHERE rn <= 16),
         | asgr AS (SELECT d.vec_id, d.lang, d.v, c.cell, ${cosSql("d.v", "c.cv")} AS cs
         |          FROM d CROSS JOIN c),
         | asg AS (SELECT vec_id, lang, v, cell FROM
         |           (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |            FROM asgr) WHERE rn = 1),
         | drp AS (SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
         |         ON a.cell = b.cell AND a.vec_id < b.vec_id WHERE ${cosSql("a.v", "b.v")} >= 0.9),
         | sem AS (SELECT g.vec_id, g.lang FROM asg g LEFT JOIN drp ON g.vec_id = drp.vec_id
         |         WHERE drp.vec_id IS NULL),
         | tc AS (SELECT lang, count(*) AS n FROM sem GROUP BY 1),
         | mn AS (SELECT min(n) AS nmin FROM tc),
         | thr AS (SELECT lang, CAST(floor(10000.0 * sqrt(CAST(nmin AS DOUBLE) * n) / n) AS BIGINT) AS th
         |         FROM tc CROSS JOIN mn),
         | fin AS (SELECT s.lang FROM sem s JOIN thr USING (lang)
         |         WHERE ('0x' || substr(md5(CAST(s.vec_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < th)
         | SELECT g.lang, CAST(count(*) AS BIGINT) AS n_gated,
         |   CAST((SELECT count(*) FROM sem s WHERE s.lang = g.lang) AS BIGINT) AS n_semantic,
         |   CAST((SELECT count(*) FROM fin f WHERE f.lang = g.lang) AS BIGINT) AS n_final
         | FROM gate g GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val e = Tables(s, dir, "embeddings")
      val docs = d.select(col("doc_id"), col("lang"), col("text")).unionAll(
        d.where(col("doc_id") < 10)
          .select((col("doc_id") + 100000).as("doc_id"), col("lang"), col("text")))
      val vecs = e.select(col("vec_id"), col("embedding")).unionAll(
        e.where(col("vec_id") < 10)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      graft.operators.Curation.funnel(docs, vecs).orderBy(col("lang"))
    },

    // Novelty-weighted curation — dd_exact_novelty's value signal finally
    // CONSUMED by a sampling stage: LR quality gate → window-novelty
    // floor vs the standing corpus → temperature rebalance, per-lang
    // funnel counts. Planted: wrapper-spam around copied passages scores
    // ~0.25 novelty and drops at the 0.5 floor, exact corpus copies drop
    // at 0.0, upper-cased (genuinely new byte-wise) docs score 1.0 and
    // survive to the mixture stage. The oracle replays gate features,
    // the full rolling-window novelty chain, and the sqrt-temperature
    // thresholds from scratch.
    QueryDef("cur_novelty")(
      """WITH corpus AS (SELECT doc_id, text FROM documents),
        | batch AS (SELECT doc_id + 500000 AS doc_id, lang,
        |             'fresh lead-in words ' || substr(text, 5, 150) || ' fresh tail words' AS text
        |             FROM documents WHERE doc_id < 10
        |           UNION ALL SELECT doc_id + 600000, lang, upper(text)
        |             FROM documents WHERE doc_id >= 10 AND doc_id < 20
        |           UNION ALL SELECT doc_id + 700000, lang, text
        |             FROM documents WHERE doc_id >= 20 AND doc_id < 25),
        | gate AS (SELECT doc_id, lang, text FROM (SELECT doc_id, lang, text,
        |     round(1.0 / (1.0 + exp(-(-3.0
        |       + 0.4 * ((length(text) - (len(string_split(text,' ')) - 1)) / len(string_split(text,' ')))
        |       + 6.0 * (len(list_filter(string_split(text,' '), t -> t IN ('the','a','and','of','to'))) / len(string_split(text,' ')))
        |       + 0.35 * ln(1.0 + len(string_split(text,' ')))))), 6) AS s
        |   FROM batch) WHERE s >= 0.5),
        | sw AS (SELECT DISTINCT ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 40)), 1, 15))::BIGINT AS m
        |        FROM corpus JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39),
        | bw AS (SELECT doc_id, i.i AS pos,
        |          ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 40)), 1, 15))::BIGINT AS m
        |        FROM gate JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39),
        | st AS (SELECT bw.doc_id, count(*) AS n_windows,
        |          count(*) FILTER (WHERE sw.m IS NOT NULL) AS n_matched
        |        FROM bw LEFT JOIN sw ON bw.m = sw.m GROUP BY 1),
        | novel AS (SELECT g.doc_id, g.lang FROM st JOIN gate g USING (doc_id)
        |           WHERE round(1.0 - n_matched / n_windows, 6) >= 0.5),
        | tc AS (SELECT lang, count(*) AS n FROM novel GROUP BY 1),
        | mn AS (SELECT min(n) AS nmin FROM tc),
        | thr AS (SELECT lang, CAST(floor(10000.0 * sqrt(CAST(nmin AS DOUBLE) * n) / n) AS BIGINT) AS th
        |         FROM tc CROSS JOIN mn),
        | fin AS (SELECT nv.lang FROM novel nv JOIN thr USING (lang)
        |         WHERE ('0x' || substr(md5(CAST(nv.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < th)
        | SELECT g.lang, CAST(count(*) AS BIGINT) AS n_gated,
        |   CAST((SELECT count(*) FROM novel nv WHERE nv.lang = g.lang) AS BIGINT) AS n_novel,
        |   CAST((SELECT count(*) FROM fin f WHERE f.lang = g.lang) AS BIGINT) AS n_final
        | FROM gate g GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val standing = d.select(col("doc_id"), col("text"))
      val batch = d.where(col("doc_id") < 10)
        .select((col("doc_id") + 500000).as("doc_id"), col("lang"),
          concat(lit("fresh lead-in words "), substring(col("text"), 5, 150),
            lit(" fresh tail words")).as("text"))
        .unionAll(d.where(col("doc_id") >= 10 && col("doc_id") < 20)
          .select((col("doc_id") + 600000).as("doc_id"), col("lang"),
            upper(col("text")).as("text")))
        .unionAll(d.where(col("doc_id") >= 20 && col("doc_id") < 25)
          .select((col("doc_id") + 700000).as("doc_id"), col("lang"), col("text")))
      graft.operators.Curation.noveltyFunnel(standing, batch)
        .orderBy(col("lang"))
    },

    // The STREAMING novelty-curation loop, driver-checked end to end:
    // seed the exact-window index from the standing corpus, stream two
    // document drops through Streams.noveltyIngest (per batch: indexed
    // novelty funnel, then index growth with the batch's own windows),
    // and emit every batch's per-lang funnel. Batch 1 plants all three
    // regimes: verbatim corpus text (novelty 0 vs the SEED), exact
    // copies of batch 0's upper-cased docs (novelty 0 ONLY because
    // batch 0 grew the index — the cross-batch growth proof), and
    // genuinely new upper-cased text (novelty 1, survives). The oracle
    // replays the sequential computation from scratch: each batch's
    // windows matched against corpus ∪ strictly-earlier batches, then
    // the per-batch temperature thresholds — a hash match IS the
    // stream-equals-sequential theorem for the funnel.
    QueryDef("cur_novelty_stream")(
      """WITH corpus AS (SELECT doc_id, text FROM documents),
        | b AS (SELECT 0 AS mb, doc_id + 500000 AS doc_id, lang,
        |         'fresh lead-in words ' || substr(text, 5, 150) || ' fresh tail words' AS text
        |         FROM documents WHERE doc_id < 10
        |       UNION ALL SELECT 0, doc_id + 600000, lang, upper(text)
        |         FROM documents WHERE doc_id >= 10 AND doc_id < 20
        |       UNION ALL SELECT 0, doc_id + 700000, lang, text
        |         FROM documents WHERE doc_id >= 20 AND doc_id < 25
        |       UNION ALL SELECT 1, doc_id + 800000, lang, text
        |         FROM documents WHERE doc_id >= 25 AND doc_id < 30
        |       UNION ALL SELECT 1, doc_id + 900000, lang, upper(text)
        |         FROM documents WHERE doc_id >= 10 AND doc_id < 15
        |       UNION ALL SELECT 1, doc_id + 950000, lang, upper(text)
        |         FROM documents WHERE doc_id >= 40 AND doc_id < 50),
        | gate AS (SELECT mb, doc_id, lang, text FROM (SELECT mb, doc_id, lang, text,
        |     round(1.0 / (1.0 + exp(-(-3.0
        |       + 0.4 * ((length(text) - (len(string_split(text,' ')) - 1)) / len(string_split(text,' ')))
        |       + 6.0 * (len(list_filter(string_split(text,' '), t -> t IN ('the','a','and','of','to'))) / len(string_split(text,' ')))
        |       + 0.35 * ln(1.0 + len(string_split(text,' ')))))), 6) AS s
        |   FROM b) WHERE s >= 0.5),
        | avail AS (SELECT m, min(src) AS minmb FROM (
        |     SELECT ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 40)), 1, 15))::BIGINT AS m, 0 AS src
        |     FROM corpus JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39
        |   UNION ALL
        |     SELECT ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 40)), 1, 15))::BIGINT, mb + 1
        |     FROM b JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39 AND b.mb = 0
        |   ) GROUP BY m),
        | bw AS (SELECT mb, doc_id, i.i AS pos,
        |          ('0x' || substr(md5(substr(text, CAST(i.i AS INT), 40)), 1, 15))::BIGINT AS m
        |        FROM gate JOIN range(1, 100000) i(i) ON i.i <= len(text) - 39),
        | st AS (SELECT bw.mb, bw.doc_id, count(*) AS n_windows,
        |          count(*) FILTER (WHERE a.m IS NOT NULL AND a.minmb <= bw.mb) AS n_matched
        |        FROM bw LEFT JOIN avail a ON bw.m = a.m GROUP BY 1, 2),
        | novel AS (SELECT g.mb, g.doc_id, g.lang FROM st
        |           JOIN gate g ON g.mb = st.mb AND g.doc_id = st.doc_id
        |           WHERE round(1.0 - n_matched / n_windows, 6) >= 0.5),
        | tc AS (SELECT mb, lang, count(*) AS n FROM novel GROUP BY 1, 2),
        | mn AS (SELECT mb, min(n) AS nmin FROM tc GROUP BY 1),
        | thr AS (SELECT tc.mb, tc.lang,
        |           CAST(floor(10000.0 * sqrt(CAST(mn.nmin AS DOUBLE) * tc.n) / tc.n) AS BIGINT) AS th
        |         FROM tc JOIN mn ON mn.mb = tc.mb),
        | fin AS (SELECT nv.mb, nv.lang FROM novel nv
        |         JOIN thr ON thr.mb = nv.mb AND thr.lang = nv.lang
        |         WHERE ('0x' || substr(md5(CAST(nv.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < th)
        | SELECT CAST(g.mb AS BIGINT) AS micro_batch, g.lang,
        |   CAST(count(*) AS BIGINT) AS n_gated,
        |   CAST((SELECT count(*) FROM novel nv WHERE nv.mb = g.mb AND nv.lang = g.lang) AS BIGINT) AS n_novel,
        |   CAST((SELECT count(*) FROM fin f WHERE f.mb = g.mb AND f.lang = g.lang) AS BIGINT) AS n_final
        | FROM gate g GROUP BY g.mb, g.lang ORDER BY micro_batch, lang""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val standing = d.select(col("doc_id"), col("text"))
      val b1 = d.where(col("doc_id") < 10)
        .select((col("doc_id") + 500000).as("doc_id"), col("lang"),
          concat(lit("fresh lead-in words "), substring(col("text"), 5, 150),
            lit(" fresh tail words")).as("text"))
        .unionAll(d.where(col("doc_id") >= 10 && col("doc_id") < 20)
          .select((col("doc_id") + 600000).as("doc_id"), col("lang"),
            upper(col("text")).as("text")))
        .unionAll(d.where(col("doc_id") >= 20 && col("doc_id") < 25)
          .select((col("doc_id") + 700000).as("doc_id"), col("lang"), col("text")))
      val b2 = d.where(col("doc_id") >= 25 && col("doc_id") < 30)
        .select((col("doc_id") + 800000).as("doc_id"), col("lang"), col("text"))
        .unionAll(d.where(col("doc_id") >= 10 && col("doc_id") < 15)
          .select((col("doc_id") + 900000).as("doc_id"), col("lang"),
            upper(col("text")).as("text")))
        .unionAll(d.where(col("doc_id") >= 40 && col("doc_id") < 50)
          .select((col("doc_id") + 950000).as("doc_id"), col("lang"),
            upper(col("text")).as("text")))
      // Fresh state per call (the dd_curation_stream treatment): the
      // loop's replay machinery is StreamingSpec's job; this row checks
      // the converged funnels. Fixture/loop splits land in fixtureSecs.
      val st = java.nio.file.Files.createTempDirectory("graft-novelty-stream-q")
      val idxDir = s"$st/index"
      val tSeed = System.nanoTime()
      val inDir = java.nio.file.Files.createTempDirectory("graft-novelty-stream-in")
      // Seed index = the SHARED exact-window artifact (identical build:
      // full corpus, default L = 40); noveltyIngest GROWS it, so each
      // run works on a filesystem COPY — copy ∥ stagings (§2.6, r20).
      graft.operators.Par.runUnit(Seq(
        () => {
          copyRecursively(
            java.nio.file.Paths.get(cachedWindowIndex(dir, standing)),
            java.nio.file.Paths.get(idxDir))
          java.nio.file.Files.deleteIfExists(
            java.nio.file.Paths.get(idxDir, "FINGERPRINT")); ()
        },
        () => stageAsFile(b1, inDir, "b1.parquet"),
        () => stageAsFile(b2, inDir, "b2.parquet")))
      orderStaged(inDir, "b1.parquet", "b2.parquet")
      fixtureSecs.put("novelty-stream-fixture", (System.nanoTime() - tSeed) / 1e9)
      val tLoop = System.nanoTime()
      val q = graft.streaming.Streams.noveltyIngest(
        graft.streaming.Streams.documentsStream(s, inDir.toString, maxFilesPerTrigger = 1),
        idxDir, s"$st/funnel", s"$st/ckpt")
      q.awaitTermination()
      fixtureSecs.put("novelty-stream-loop", (System.nanoTime() - tLoop) / 1e9)
      val out = s.read.parquet(s"$st/funnel")
        .select(col("micro_batch").cast("long").as("micro_batch"), col("lang"),
          col("n_gated"), col("n_novel"), col("n_final"))
        .orderBy(col("micro_batch"), col("lang")).localCheckpoint(true)
      deleteRecursively(st)
      deleteRecursively(inDir)
      out
    },

    // TAKEDOWN of the STREAMING curation state (r15): run the full loop
    // (seed + two micro-batches), then purge a doc set from its standing
    // state — LSH index rows, per-batch fold-edge evidence, BOTH
    // retained label snapshots (cut-vertex-exact re-solve), and the
    // registry. The oracle recomputes connected components from scratch
    // over the union corpus's gated pairs MINUS purged-incident edges —
    // a hash match proves the purged streaming state equals one seeded
    // and grown without the docs.
    QueryDef("dd_purge_stream")(
      s"""WITH RECURSIVE corpus AS (
         |   SELECT doc_id, text FROM documents WHERE doc_id < 40
         |   UNION ALL SELECT doc_id + 1000, text || ' extra' FROM documents WHERE doc_id < 10
         |   UNION ALL SELECT doc_id + 2000, text || ' extra' FROM documents WHERE doc_id < 5
         |   UNION ALL SELECT doc_id + 3000, upper(text) FROM documents WHERE doc_id >= 10 AND doc_id < 20),
         | $lshPairsSql,
         | inter AS (SELECT p.doc_a, p.doc_b, count(*) AS n_inter
         |           FROM pairs p
         |           JOIN sh sa ON sa.doc_id = p.doc_a
         |           JOIN sh sb ON sb.doc_id = p.doc_b AND ('0x' || substr(md5(sb.shingle), 1, 15))::BIGINT = ('0x' || substr(md5(sa.shingle), 1, 15))::BIGINT
         |           GROUP BY 1, 2),
         | sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         | dup AS (SELECT p.doc_a, p.doc_b FROM pairs p
         |         LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
         |         JOIN sizes na ON na.doc_id = p.doc_a
         |         JOIN sizes nb ON nb.doc_id = p.doc_b
         |         WHERE round(coalesce(i.n_inter, 0) / (na.n_sh + nb.n_sh - coalesce(i.n_inter, 0)), 6) >= 0.8
         |           AND p.doc_a NOT IN (3, 1003, 15, 3012)
         |           AND p.doc_b NOT IN (3, 1003, 15, 3012)),
         | und AS (SELECT doc_a AS u, doc_b AS v FROM dup
         |         UNION SELECT doc_b, doc_a FROM dup),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v)
         | SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
         | FROM reach GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      import s.implicits._
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = d.where(col("doc_id") < 40)
      val b1 = d.where(col("doc_id") < 10)
        .select((col("doc_id") + 1000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
      val b2 = d.where(col("doc_id") < 5)
        .select((col("doc_id") + 2000).as("doc_id"),
          concat(col("text"), lit(" extra")).as("text"))
        .unionAll(d.where(col("doc_id") >= 10 && col("doc_id") < 20)
          .select((col("doc_id") + 3000).as("doc_id"), upper(col("text")).as("text")))
      val st = java.nio.file.Files.createTempDirectory("graft-curation-purge-q")
      val (idxDir, lblDir) = (s"$st/index", s"$st/labels")
      val tSeed = System.nanoTime()
      val inDir = java.nio.file.Files.createTempDirectory("graft-curation-purge-q-in")
      // Fingerprint-cached seed, per-run COPY (same corpus and threshold
      // as dd_curation_stream, so the artifact is shared) — see the
      // dd_curation_stream comment for the contract argument (r20).
      val seed = cachedArtifact(dir, "curation-seed-t08", corpus) { out =>
        graft.streaming.Streams.seedCurationState(corpus, s"$out/index",
          s"$out/labels", threshold = 0.8)
      }
      graft.operators.Par.runUnit(Seq(
        () => {
          copyRecursively(java.nio.file.Paths.get(seed, "index"),
            java.nio.file.Paths.get(idxDir))
          copyRecursively(java.nio.file.Paths.get(seed, "labels"),
            java.nio.file.Paths.get(lblDir))
        },
        () => stageAsFile(b1, inDir, "b1.parquet"),
        () => stageAsFile(b2, inDir, "b2.parquet")))
      orderStaged(inDir, "b1.parquet", "b2.parquet")
      fixtureSecs.put("curation-purge-fixture", (System.nanoTime() - tSeed) / 1e9)
      val tLoop = System.nanoTime()
      val q = graft.streaming.Streams.curationLoop(
        graft.streaming.Streams.documentsStream(s, inDir.toString, maxFilesPerTrigger = 1),
        idxDir, lblDir, threshold = 0.8, s"$st/ckpt")
      q.awaitTermination()
      fixtureSecs.put("curation-purge-loop", (System.nanoTime() - tLoop) / 1e9)
      // r17 (VERDICT #2): the same per-micro-batch attribution the
      // curation row carries, so the archive splits this row's loop
      // total into data-batch cost vs stream start/stop overhead.
      val batchMs = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toDouble))
      if (batchMs.nonEmpty)
        fixtureSecs.put("curation-purge-batch-max", batchMs.max / 1e3)
      val tPurge = System.nanoTime()
      graft.streaming.Streams.purgeCurationState(s, idxDir, lblDir,
        Seq(3L, 1003L, 15L, 3012L).toDF("doc_id"))
      fixtureSecs.put("curation-purge-purge", (System.nanoTime() - tPurge) / 1e9)
      val out = s.read.schema("doc_id LONG, cluster_id LONG")
        .parquet(s"$lblDir/v1")
        .orderBy(col("doc_id")).localCheckpoint(true)
      deleteRecursively(st)
      deleteRecursively(inDir)
      out
    },

    // Distribution-DRIFT monitoring — the observability rung the growing-
    // corpus operators (cross-corpus dedup, BM25 append, streaming
    // novelty) all feed but nothing measured: Population Stability Index
    // of an arriving batch's feature distributions against the standing
    // corpus, per feature, with add-one smoothing over the union-bin
    // table. The md5-bucket split (the smp_hash convention) stands in for
    // standing-vs-arriving; in production the two sides are the index and
    // the micro-batch. Per-bin contributions quantize to integers (×10⁶)
    // before summing, so the PSI arithmetic hash-matches bit-for-bit.
    QueryDef("cur_drift")({
      val bkt =
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"
      val st = s"(SELECT * FROM documents WHERE $bkt >= 20)"
      val ba = s"(SELECT * FROM documents WHERE $bkt < 20)"
      Seq(
        graft.operators.Curation.driftFeatureSql("chars",
          "FLOOR(length(text)/256)", st, ba),
        graft.operators.Curation.driftFeatureSql("lang", "lang", st, ba),
        graft.operators.Curation.driftFeatureSql("tokens",
          "FLOOR(len(string_split(text,' '))/64)", st, ba))
        .mkString("", "\n UNION ALL\n", "\n ORDER BY feature")
    }) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val bucket = graft.operators.Sampling.hashBucket(col("doc_id"), 100)
      graft.operators.Curation.drift(
        d.where(bucket >= 20), d.where(bucket < 20), Seq(
          "chars" -> floor(length(col("text")) / lit(256)),
          "lang" -> col("lang"),
          "tokens" -> floor(size(split(col("text"), " ")) / lit(64))))
    },

    // The drift monitor's OPERATIONAL form: standing histograms persisted
    // once (Curation.buildDriftIndex — the standing corpus is never
    // rescanned), then a foreachBatch loop scores each arriving
    // micro-batch against that metadata-scale index and lands
    // batchId-keyed PSI rows (replay-exact: the monitor only observes, so
    // the sole replay concern is the output overwrite itself). The oracle
    // replays each micro-batch's PSI from the raw table — hash equality
    // proves index-probed == recomputed per batch.
    QueryDef("cur_drift_stream")({
      val bkt =
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"
      val st = s"(SELECT * FROM documents WHERE $bkt >= 20)"
      def feats(ba: String) = Seq(
        graft.operators.Curation.driftFeatureSql("chars",
          "FLOOR(length(text)/256)", st, ba),
        graft.operators.Curation.driftFeatureSql("lang", "lang", st, ba),
        graft.operators.Curation.driftFeatureSql("tokens",
          "FLOOR(len(string_split(text,' '))/64)", st, ba))
      val b0 = s"(SELECT * FROM documents WHERE $bkt < 10)"
      val b1 = s"(SELECT * FROM documents WHERE $bkt >= 10 AND $bkt < 20)"
      (feats(b0).map(q =>
          s"SELECT CAST(0 AS BIGINT) AS micro_batch, * FROM ($q)") ++
        feats(b1).map(q =>
          s"SELECT CAST(1 AS BIGINT) AS micro_batch, * FROM ($q)"))
        .mkString("", "\n UNION ALL\n", "\n ORDER BY micro_batch, feature")
    }) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val bucket = graft.operators.Sampling.hashBucket(col("doc_id"), 100)
      val features = Seq(
        "chars" -> floor(length(col("text")) / lit(256)),
        "lang" -> col("lang"),
        "tokens" -> floor(size(split(col("text"), " ")) / lit(64)))
      val stDir = java.nio.file.Files.createTempDirectory("graft-drift-stream-q")
      val inDir = java.nio.file.Files.createTempDirectory("graft-drift-stream-in")
      val t0 = System.nanoTime()
      // index build and stagings are independent — overlap (guide §2.6)
      graft.operators.Par.runUnit(Seq(
        () => graft.operators.Curation.buildDriftIndex(
          d.where(bucket >= 20), features, s"$stDir/index"),
        () => stageAsFile(d.where(bucket < 10), inDir, "b0.parquet"),
        () => stageAsFile(d.where(bucket >= 10 && bucket < 20), inDir,
          "b1.parquet")))
      orderStaged(inDir, "b0.parquet", "b1.parquet")
      fixtureSecs.put("drift-stream-fixture", (System.nanoTime() - t0) / 1e9)
      val q = graft.streaming.Streams.driftMonitor(
        graft.streaming.Streams.documentsStream(s, inDir.toString,
          maxFilesPerTrigger = 1),
        s"$stDir/index", s"$stDir/drift", s"$stDir/ckpt", features)
      q.awaitTermination()
      val out = s.read.parquet(s"$stDir/drift")
        .select(col("micro_batch").cast("long").as("micro_batch"),
          col("feature"), col("n_bins"), col("psi"))
        .orderBy(col("micro_batch"), col("feature")).localCheckpoint(true)
      deleteRecursively(stDir)
      deleteRecursively(inDir)
      out
    },

    // The drift index GROWN by an arriving batch — histograms are
    // count-additive, so growth is one batch scan + a bin-scale
    // batchId-keyed partition write (appendToDriftIndex; the standing
    // corpus is never rescanned, existing partitions never rewritten —
    // the append ladder every other index here has). The probe scores a
    // second batch against the grown index; the oracle recomputes the
    // same PSI from (standing ∪ batch-0) raw — hash equality proves
    // grown == recomputed.
    QueryDef("cur_drift_grown")({
      val bkt =
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"
      val grown = s"(SELECT * FROM documents WHERE $bkt >= 20 OR $bkt < 10)"
      val b1 = s"(SELECT * FROM documents WHERE $bkt >= 10 AND $bkt < 20)"
      Seq(
        graft.operators.Curation.driftFeatureSql("chars",
          "FLOOR(length(text)/256)", grown, b1),
        graft.operators.Curation.driftFeatureSql("lang", "lang", grown, b1),
        graft.operators.Curation.driftFeatureSql("tokens",
          "FLOOR(len(string_split(text,' '))/64)", grown, b1))
        .mkString("", "\n UNION ALL\n", "\n ORDER BY feature")
    }) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val bucket = graft.operators.Sampling.hashBucket(col("doc_id"), 100)
      val features = Seq(
        "chars" -> floor(length(col("text")) / lit(256)),
        "lang" -> col("lang"),
        "tokens" -> floor(size(split(col("text"), " ")) / lit(64)))
      val stDir = java.nio.file.Files.createTempDirectory("graft-drift-grow-q")
      val idx = s"$stDir/index"
      graft.operators.Curation.buildDriftIndex(
        d.where(bucket >= 20), features, idx)
      graft.operators.Curation.appendToDriftIndex(
        d.where(bucket < 10), features, idx, ingestBatch = 0L)
      val out = graft.operators.Curation.driftAgainstIndex(
        idx, d.where(bucket >= 10 && bucket < 20), features)
        .localCheckpoint(true)
      deleteRecursively(stDir)
      out
    },

    // Drift-index TAKEDOWN (r15): histograms are count-additive, so a
    // purge is one scan of the departing rows and a bin-scale NEGATED
    // delta partition — the standing partitions are never rescanned or
    // rewritten, and probes sum across partitions unchanged. The oracle
    // recomputes PSI from (grown corpus MINUS the purged rows) raw —
    // hash equality proves subtracted == recounted-without.
    QueryDef("cur_drift_purge")({
      val bkt =
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"
      val kept =
        s"(SELECT * FROM documents WHERE ($bkt >= 20 AND $bkt < 80) OR $bkt < 10)"
      val b1 = s"(SELECT * FROM documents WHERE $bkt >= 10 AND $bkt < 20)"
      Seq(
        graft.operators.Curation.driftFeatureSql("chars",
          "FLOOR(length(text)/256)", kept, b1),
        graft.operators.Curation.driftFeatureSql("lang", "lang", kept, b1),
        graft.operators.Curation.driftFeatureSql("tokens",
          "FLOOR(len(string_split(text,' '))/64)", kept, b1))
        .mkString("", "\n UNION ALL\n", "\n ORDER BY feature")
    }) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val bucket = graft.operators.Sampling.hashBucket(col("doc_id"), 100)
      val features = Seq(
        "chars" -> floor(length(col("text")) / lit(256)),
        "lang" -> col("lang"),
        "tokens" -> floor(size(split(col("text"), " ")) / lit(64)))
      val stDir = java.nio.file.Files.createTempDirectory("graft-drift-purge-q")
      val idx = s"$stDir/index"
      graft.operators.Curation.buildDriftIndex(
        d.where(bucket >= 20), features, idx)
      graft.operators.Curation.appendToDriftIndex(
        d.where(bucket < 10), features, idx, ingestBatch = 0L)
      // takedown: the bucket>=80 slice of the SEED corpus departs — the
      // same rows the corpus store would delete are subtracted here
      graft.operators.Curation.purgeFromDriftIndex(
        d.where(bucket >= 80), features, idx, purgeId = 0L)
      val out = graft.operators.Curation.driftAgainstIndex(
        idx, d.where(bucket >= 10 && bucket < 20), features)
        .localCheckpoint(true)
      deleteRecursively(stDir)
      out
    },

    // Append-side COMPACTION of the drift index (r16): the cur_drift_purge
    // fixture exactly — build, grow by one batch, purge a slice — then
    // FOLD the three delta partitions (seed, grown, NEGATED purge delta)
    // into one re-summed seed before probing. Same oracle as
    // cur_drift_purge: a hash match proves the fold preserved every bin
    // total, including dropping the zero-total bins the purge emptied;
    // the in-row require pins the partition collapse.
    QueryDef("cur_drift_compacted")({
      val bkt =
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"
      val kept =
        s"(SELECT * FROM documents WHERE ($bkt >= 20 AND $bkt < 80) OR $bkt < 10)"
      val b1 = s"(SELECT * FROM documents WHERE $bkt >= 10 AND $bkt < 20)"
      Seq(
        graft.operators.Curation.driftFeatureSql("chars",
          "FLOOR(length(text)/256)", kept, b1),
        graft.operators.Curation.driftFeatureSql("lang", "lang", kept, b1),
        graft.operators.Curation.driftFeatureSql("tokens",
          "FLOOR(len(string_split(text,' '))/64)", kept, b1))
        .mkString("", "\n UNION ALL\n", "\n ORDER BY feature")
    }) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val bucket = graft.operators.Sampling.hashBucket(col("doc_id"), 100)
      val features = Seq(
        "chars" -> floor(length(col("text")) / lit(256)),
        "lang" -> col("lang"),
        "tokens" -> floor(size(split(col("text"), " ")) / lit(64)))
      val stDir = java.nio.file.Files.createTempDirectory("graft-drift-compact-q")
      val idx = s"$stDir/index"
      val tB = System.nanoTime()
      graft.operators.Curation.buildDriftIndex(
        d.where(bucket >= 20), features, idx)
      graft.operators.Curation.appendToDriftIndex(
        d.where(bucket < 10), features, idx, ingestBatch = 0L)
      graft.operators.Curation.purgeFromDriftIndex(
        d.where(bucket >= 80), features, idx, purgeId = 0L)
      graft.operators.Curation.compactDriftIndex(s, idx)
      fixtureSecs.put("drift-compact-build", (System.nanoTime() - tB) / 1e9)
      val parts = new java.io.File(idx).listFiles()
        .count(_.getName.startsWith("ingest="))
      require(parts == 1,
        s"compaction must fold to one seed partition, got $parts")
      val out = graft.operators.Curation.driftAgainstIndex(
        idx, d.where(bucket >= 10 && bucket < 20), features)
        .localCheckpoint(true)
      deleteRecursively(stDir)
      out
    },

    // The drift monitor's ACTIONABLE output (r15): raw PSI banded into
    // stable / drifting / shifted against calibrated thresholds (0.1 /
    // 0.25 folklore defaults, per-feature overrides for features whose
    // bin cardinality warrants different tolerance). The fixture plants
    // real drift — the batch's texts are DOUBLED, shifting the chars and
    // tokens histograms wholesale while lang stays put — and overrides
    // the tokens thresholds, so the output exercises all three bands and
    // the override path in one row.
    QueryDef("cur_drift_gate")({
      val bkt =
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"
      val st = s"(SELECT * FROM documents WHERE $bkt >= 20)"
      val ba = s"(SELECT doc_id, text || ' ' || text AS text, lang " +
        s"FROM documents WHERE $bkt < 20)"
      val psi = Seq(
        graft.operators.Curation.driftFeatureSql("chars",
          "FLOOR(length(text)/256)", st, ba),
        graft.operators.Curation.driftFeatureSql("lang", "lang", st, ba),
        graft.operators.Curation.driftFeatureSql("tokens",
          "FLOOR(len(string_split(text,' '))/64)", st, ba))
        .mkString("", "\n UNION ALL\n", "")
      graft.operators.Curation.driftGateSql(psi,
        thresholds = Map("tokens" -> (0.05, 5.0))) + "\n ORDER BY feature"
    }) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val bucket = graft.operators.Sampling.hashBucket(col("doc_id"), 100)
      val features = Seq(
        "chars" -> floor(length(col("text")) / lit(256)),
        "lang" -> col("lang"),
        "tokens" -> floor(size(split(col("text"), " ")) / lit(64)))
      val batch = d.where(bucket < 20)
        .select(col("doc_id"),
          concat(col("text"), lit(" "), col("text")).as("text"), col("lang"))
      graft.operators.Curation.driftGate(
          graft.operators.Curation.drift(d.where(bucket >= 20), batch, features),
          thresholds = Map("tokens" -> (0.05, 5.0)))
        .orderBy(col("feature"))
    },

    // ---- multimodal ------------------------------------------------------
    // The production decode kernel over NON-image payloads: every row
    // sniffs as raw and takes the documented deterministic fallback branch
    // (the REAL-image branch of the same kernel is oracle-checked
    // pixel-exactly by mm_decode_real below).
    QueryDef("mm_decode")(
      """SELECT doc_id, 'application/x-fake-' || source AS mime,
        |   CAST(length(text) AS BIGINT) AS byte_len, sha256(text) AS digest,
        |   CAST(length(text) % 640 AS INT) AS width,
        |   CAST(length(text) % 480 AS INT) AS height,
        |   CAST(length(text) % 24 + 1 AS INT) AS n_frames
        | FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.decode(Multimodal.mediaTable(
        Tables(s, dir, "documents").where(col("doc_id") < 100)))
        .toDF()
        .select(col("doc_id"), col("mime"), col("byte_len"), col("digest"),
          col("width"), col("height"), col("n_frames"))
        .orderBy(col("doc_id"))
    },

    // REAL codec round-trip: deterministic-pixel RGB fixtures are encoded
    // through javax.imageio (PNG for even ids, BMP for odd — both
    // lossless), then decoded by the production kernel; the oracle
    // recomputes dims AND the full pixel checksum by formula, so a
    // header-only or faked decode cannot pass.
    QueryDef("mm_decode_real")(
      """WITH d AS (SELECT doc_id, doc_id % 13 + 3 AS w, doc_id % 7 + 2 AS h
        |           FROM documents WHERE doc_id < 24),
        | px AS (SELECT d.doc_id, (p.i // 3) % d.w AS x, p.i // (d.w * 3) AS y, p.i % 3 AS c
        |        FROM d JOIN range(0, 400) p(i) ON p.i < d.w * d.h * 3),
        | s AS (SELECT doc_id, sum((doc_id * 31 + x * 7 + y * 13 + c * 5) % 256) AS px_sum
        |       FROM px GROUP BY 1)
        | SELECT d.doc_id,
        |   CASE WHEN d.doc_id % 2 = 0 THEN 'image/png' ELSE 'image/bmp' END AS mime,
        |   CASE WHEN d.doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
        |   CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |   CAST(3 AS INT) AS channels, CAST(s.px_sum AS BIGINT) AS px_sum
        | FROM d JOIN s ON s.doc_id = d.doc_id ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.decode(Multimodal.syntheticImages(
        Tables(s, dir, "documents").where(col("doc_id") < 24)))
        .toDF()
        .select(col("doc_id"), col("mime"), col("format"),
          col("width"), col("height"), col("channels"), col("px_sum"))
        .orderBy(col("doc_id"))
    },

    // REAL resize: decode → nearest-neighbor resample to 4×4 → re-encode
    // PNG → re-decode → pixel checksum; the oracle computes the same NN
    // source-pixel mapping ((x·w)//4, (y·h)//4) by formula.
    QueryDef("mm_resize_real")(
      """WITH d AS (SELECT doc_id, doc_id % 13 + 3 AS w, doc_id % 7 + 2 AS h
        |           FROM documents WHERE doc_id < 24),
        | px AS (SELECT d.doc_id, (p.i // 3) % 4 AS x, p.i // 12 AS y, p.i % 3 AS c, d.w, d.h
        |        FROM d JOIN range(0, 48) p(i) ON p.i < 48)
        | SELECT doc_id, CAST(4 AS INT) AS out_w, CAST(4 AS INT) AS out_h,
        |   CAST(sum((doc_id * 31 + ((x * w) // 4) * 7 + ((y * h) // 4) * 13 + c * 5) % 256) AS BIGINT) AS px_sum
        | FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.resizeImages(Multimodal.syntheticImages(
        Tables(s, dir, "documents").where(col("doc_id") < 24)), 4, 4)
        .select(col("doc_id"), col("out_w"), col("out_h"), col("px_sum"))
        .orderBy(col("doc_id"))
    },

    // REAL audio codec round-trip: deterministic 16-bit PCM fixtures are
    // encoded through javax.sound.sampled as WAV (lossless), then decoded
    // by the production audio kernel; the oracle recomputes the header
    // fields AND the full sample sum by formula (sample j of id's stream =
    // ((id·31 + (j//ch)·7 + (j%ch)·13) mod 65536) − 32768), so a
    // header-only or faked parse cannot pass — syntheticImages' trick
    // applied to the audio modality.
    QueryDef("mm_audio")(
      """WITH d AS (SELECT doc_id, 8000 * (doc_id % 3 + 1) AS rate,
        |             doc_id % 2 + 1 AS ch, doc_id % 50 + 10 AS n
        |           FROM documents WHERE doc_id < 24),
        | s AS (SELECT d.doc_id,
        |         sum((d.doc_id * 31 + (p.i // d.ch) * 7 + (p.i % d.ch) * 13) % 65536 - 32768) AS sample_sum
        |       FROM d JOIN range(0, 256) p(i) ON p.i < d.n * d.ch
        |       GROUP BY 1)
        | SELECT d.doc_id, 'audio/wav' AS mime, 'wav' AS format,
        |   CAST(d.rate AS INT) AS sample_rate, CAST(d.ch AS INT) AS channels,
        |   CAST(16 AS INT) AS bits, CAST(d.n AS BIGINT) AS n_samples,
        |   CAST(s.sample_sum AS BIGINT) AS sample_sum
        | FROM d JOIN s ON s.doc_id = d.doc_id ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.decodeAudio(Multimodal.syntheticAudio(
        Tables(s, dir, "documents").where(col("doc_id") < 24)))
        .toDF()
        .select(col("doc_id"), col("mime"), col("format"), col("sample_rate"),
          col("channels"), col("bits"), col("n_samples"), col("sample_sum"))
        .orderBy(col("doc_id"))
    },

    // AUDIO fingerprints (r15) — the third modality joins the dedup
    // ladder: 64-bit energy-gradient signature over REAL-decoded PCM
    // (the dHash recipe applied to samples — 65 windows, bit w =
    // e(w+1) > e(w)). The oracle recomputes every window energy from
    // the sample FORMULA, so a header-only decode cannot pass; gain ×2
    // twins must land byte-identical fingerprints (energies scale
    // uniformly — the brightness-invariance analogue, here EXACT).
    QueryDef("mm_audio_fp")(
      s"""WITH fa AS (SELECT doc_id AS id, doc_id AS key, 1 AS gain, 0 AS retouch
         |              FROM documents WHERE doc_id < 24
         |            UNION ALL SELECT doc_id + 100000, doc_id, 2, 0
         |              FROM documents WHERE doc_id < 12
         |            UNION ALL SELECT 200007, 7, 1, 25),
         |$afpByteSql
         | SELECT id AS doc_id,
         |   string_agg(printf('%02x', CAST(byte AS INT)), '' ORDER BY g DESC) AS afp_hex
         | FROM abt GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.audioFingerprint64(audioVariantCorpus(s, dir))
        .select(col("doc_id"), col("afp_hex"))
        .orderBy(col("doc_id"))
    },

    // Audio near-dup PAIRS: the simhash 16-bit-band pigeonhole blocking
    // verbatim on afp signatures — gain twins pair with their originals
    // at Hamming 0, the single-sample dropout at Hamming 1 (its emptied
    // window flips one gradient bit). The oracle recomputes fingerprints by formula
    // and all-pairs Hammings at fixture scale.
    // Blocking-miss eval, AUDIO (r16, VERDICT r15 #6): what does the
    // 16-bit-band pigeonhole blocking MISS once the Hamming threshold
    // loosens past its completeness bound (≤ 3)? Fixture: 16 originals,
    // 8 gain twins (hamming 0 — anchors n_truth ≥ 1 at every H), and
    // multi-dropout variants at nd ∈ {2, 4, 5} — evenly-spread dropouts
    // land flips across all four bands from nd = 4 up, exactly the
    // PCM-edit regime where banding starts losing pairs. Truth is brute
    // 64-bit Hamming (fixture-scale BY DESIGN — the measuring stick);
    // found is the production banding sans its ≤ 3 gate. Recall is 1.0
    // through H = 3 (pigeonhole, the row proves its own anchor) and
    // drops to ~0.56 by H = 8 on this fixture.
    QueryDef("mm_audio_block_recall")(
      s"""WITH fa AS (SELECT doc_id AS id, doc_id AS key, 1 AS gain, 0 AS nd
         |              FROM documents WHERE doc_id < 16
         |            UNION ALL SELECT doc_id + 100000, doc_id, 2, 0
         |              FROM documents WHERE doc_id < 8
         |            UNION ALL SELECT doc_id + 200000, doc_id, 1, 2
         |              FROM documents WHERE doc_id < 16
         |            UNION ALL SELECT doc_id + 400000, doc_id, 1, 4
         |              FROM documents WHERE doc_id < 16
         |            UNION ALL SELECT doc_id + 500000, doc_id, 1, 5
         |              FROM documents WHERE doc_id < 8),
         |$afpDropByteSql,
         |${blockRecallTailSql("abt", "g")}""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      def arm(shift: Long, n: Int, gain: Int, nd: Int) =
        d.where(col("doc_id") < n)
          .select((col("doc_id") + shift).as("doc_id"),
            col("doc_id").as("key"), lit(gain).as("gain"), lit(nd).as("n_drops"))
      val fa = arm(0L, 16, 1, 0)
        .unionAll(arm(100000L, 8, 2, 0))
        .unionAll(arm(200000L, 16, 1, 2))
        .unionAll(arm(400000L, 16, 1, 4))
        .unionAll(arm(500000L, 8, 1, 5))
      Dedup.simhashBlockingRecall(
        Multimodal.audioFingerprint64(Multimodal.syntheticAudioDropouts(fa))
          .select(col("doc_id"), col("afp").as("sigint")))
    },

    // Blocking-miss eval, IMAGE — the same measurement over dHash with
    // multi-spot variants (spots spread across all 8 grid rows so the
    // flips reach all four bands from n_spots = 4 up; the
    // JPEG-quality-shift stand-in for the codec-less env). Recall 1.0
    // through H = 4, ~0.70 by H = 8 on this fixture — together with
    // mm_audio_block_recall this closes the "matrix claims symmetry the
    // eval doesn't have" gap: text recall (dd_recall), image and audio
    // blocking recall are all measured.
    QueryDef("mm_block_recall")(
      s"""WITH f AS (SELECT doc_id AS id, doc_id AS key, 0 AS spot, 0 AS nd
         |             FROM documents WHERE doc_id < 16
         |           UNION ALL SELECT doc_id + 100000, doc_id, 0, 0
         |             FROM documents WHERE doc_id < 8
         |           UNION ALL SELECT doc_id + 200000, doc_id, 90, 2
         |             FROM documents WHERE doc_id < 16
         |           UNION ALL SELECT doc_id + 400000, doc_id, 90, 4
         |             FROM documents WHERE doc_id < 16
         |           UNION ALL SELECT doc_id + 600000, doc_id, 90, 6
         |             FROM documents WHERE doc_id < 8),
         |$phashMultiSpotSql,
         |${blockRecallTailSql("bt", "gy")}""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      def arm(shift: Long, n: Int, spot: Int, ns: Int) =
        d.where(col("doc_id") < n)
          .select((col("doc_id") + shift).as("doc_id"),
            col("doc_id").as("key"), lit(spot).as("spot"), lit(ns).as("n_spots"))
      val f = arm(0L, 16, 0, 0)
        .unionAll(arm(100000L, 8, 0, 0))
        .unionAll(arm(200000L, 16, 90, 2))
        .unionAll(arm(400000L, 16, 90, 4))
        .unionAll(arm(600000L, 8, 90, 6))
      Dedup.simhashBlockingRecall(
        Multimodal.dHash64(Multimodal.syntheticImageMultiSpot(f))
          .select(col("doc_id"), col("phash").as("sigint")))
    },

    QueryDef("mm_audio_neardup")(
      s"""WITH fa AS (SELECT doc_id AS id, doc_id AS key, 1 AS gain, 0 AS retouch
         |              FROM documents WHERE doc_id < 24
         |            UNION ALL SELECT doc_id + 100000, doc_id, 2, 0
         |              FROM documents WHERE doc_id < 12
         |            UNION ALL SELECT 200007, 7, 1, 25),
         |$afpByteSql,
         | hm AS (SELECT a.id AS doc_a, b.id AS doc_b,
         |          CAST(sum(bit_count(xor(a.byte, b.byte))) AS BIGINT) AS hamming
         |        FROM abt a JOIN abt b ON a.g = b.g AND a.id < b.id
         |        GROUP BY 1, 2)
         | SELECT doc_a, doc_b, hamming FROM hm WHERE hamming <= 3
         | ORDER BY doc_a, doc_b""".stripMargin
    ) { (s, dir) =>
      Multimodal.nearDupAudio(audioVariantCorpus(s, dir))
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // CROSS-corpus audio near-dedup — the dd_cross_neardup shape on the
    // third modality: arriving gain twins + one retouch probe the 24
    // standing originals through one banded equi-join; within-side
    // pairs never generated.
    QueryDef("mm_audio_cross")(
      s"""WITH fa AS (SELECT doc_id AS id, doc_id AS key, 1 AS gain, 0 AS retouch
         |              FROM documents WHERE doc_id < 24
         |            UNION ALL SELECT doc_id + 100000, doc_id, 2, 0
         |              FROM documents WHERE doc_id < 12
         |            UNION ALL SELECT 200007, 7, 1, 25),
         |$afpByteSql,
         | hm AS (SELECT a.id AS batch_id, b.id AS corpus_id,
         |          CAST(sum(bit_count(xor(a.byte, b.byte))) AS BIGINT) AS hamming
         |        FROM abt a JOIN abt b ON a.g = b.g
         |          AND a.id >= 100000 AND b.id < 100000
         |        GROUP BY 1, 2)
         | SELECT batch_id, corpus_id, hamming FROM hm WHERE hamming <= 3
         | ORDER BY batch_id, corpus_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val standing = Multimodal.syntheticAudioVariants(
        d.where(col("doc_id") < 24)
          .select(col("doc_id"), col("doc_id").as("key"),
            lit(1).as("gain"), lit(0).as("retouch")))
      val batch = Multimodal.syntheticAudioVariants(
        d.where(col("doc_id") < 12)
          .select((col("doc_id") + 100000).as("doc_id"),
            col("doc_id").as("key"), lit(2).as("gain"), lit(0).as("retouch"))
          .unionAll(d.where(col("doc_id") === 7)
            .select(lit(200007L).as("doc_id"), col("doc_id").as("key"),
              lit(1).as("gain"), lit(25).as("retouch"))))
      Multimodal.crossNearDupAudio(standing, batch)
        .select(col("batch_id"), col("corpus_id"), col("hamming").cast("long"))
        .orderBy(col("batch_id"), col("corpus_id"))
    },

    // The audio cross probe through the PERSISTED fingerprint index
    // (built on 16 originals, grown by the rest as ingest 0) — zero
    // standing-clip decodes at probe time; the oracle is the SAME
    // formula recompute as mm_audio_cross, so hash equality proves
    // indexed == recompute, the image ladder's operational contract on
    // the third modality.
    QueryDef("mm_audio_indexed")(
      s"""WITH fa AS (SELECT doc_id AS id, doc_id AS key, 1 AS gain, 0 AS retouch
         |              FROM documents WHERE doc_id < 24
         |            UNION ALL SELECT doc_id + 100000, doc_id, 2, 0
         |              FROM documents WHERE doc_id < 12
         |            UNION ALL SELECT 200007, 7, 1, 25),
         |$afpByteSql,
         | hm AS (SELECT a.id AS batch_id, b.id AS corpus_id,
         |          CAST(sum(bit_count(xor(a.byte, b.byte))) AS BIGINT) AS hamming
         |        FROM abt a JOIN abt b ON a.g = b.g
         |          AND a.id >= 100000 AND b.id < 100000
         |        GROUP BY 1, 2)
         | SELECT batch_id, corpus_id, hamming FROM hm WHERE hamming <= 3
         | ORDER BY batch_id, corpus_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      def standingRows(pred: org.apache.spark.sql.Column) =
        Multimodal.syntheticAudioVariants(
          d.where(col("doc_id") < 24 && pred)
            .select(col("doc_id"), col("doc_id").as("key"),
              lit(1).as("gain"), lit(0).as("retouch")))
      val batch = Multimodal.syntheticAudioVariants(
        d.where(col("doc_id") < 12)
          .select((col("doc_id") + 100000).as("doc_id"),
            col("doc_id").as("key"), lit(2).as("gain"), lit(0).as("retouch"))
          .unionAll(d.where(col("doc_id") === 7)
            .select(lit(200007L).as("doc_id"), col("doc_id").as("key"),
              lit(1).as("gain"), lit(25).as("retouch"))))
      val st = java.nio.file.Files.createTempDirectory("graft-audiofp-q")
      val idx = s"$st/index"
      Multimodal.buildAudioFpIndex(standingRows(col("doc_id") < 16), idx)
      Multimodal.appendToAudioFpIndex(standingRows(col("doc_id") >= 16), idx,
        ingestBatch = 0L)
      val out = Multimodal.crossNearDupAudioIndexed(s, idx, batch)
        .select(col("batch_id"), col("corpus_id"), col("hamming").cast("long"))
        .orderBy(col("batch_id"), col("corpus_id"))
        .localCheckpoint(true)
      deleteRecursively(st)
      out
    },

    // Append-side COMPACTION of the signature index (r16, shared by the
    // dHash and audio families): build on a third of the standing set,
    // append the rest as two ingest partitions, FOLD everything into the
    // base (compactSigIndex under the two-phase marker), and probe. Same
    // oracle as mm_audio_indexed — a hash match proves the folded index
    // probes exactly as the grown one; the in-row require pins the
    // partition collapse.
    QueryDef("mm_compact")(
      s"""WITH fa AS (SELECT doc_id AS id, doc_id AS key, 1 AS gain, 0 AS retouch
         |              FROM documents WHERE doc_id < 24
         |            UNION ALL SELECT doc_id + 100000, doc_id, 2, 0
         |              FROM documents WHERE doc_id < 12
         |            UNION ALL SELECT 200007, 7, 1, 25),
         |$afpByteSql,
         | hm AS (SELECT a.id AS batch_id, b.id AS corpus_id,
         |          CAST(sum(bit_count(xor(a.byte, b.byte))) AS BIGINT) AS hamming
         |        FROM abt a JOIN abt b ON a.g = b.g
         |          AND a.id >= 100000 AND b.id < 100000
         |        GROUP BY 1, 2)
         | SELECT batch_id, corpus_id, hamming FROM hm WHERE hamming <= 3
         | ORDER BY batch_id, corpus_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      def standingRows(pred: org.apache.spark.sql.Column) =
        Multimodal.syntheticAudioVariants(
          d.where(col("doc_id") < 24 && pred)
            .select(col("doc_id"), col("doc_id").as("key"),
              lit(1).as("gain"), lit(0).as("retouch")))
      val batch = Multimodal.syntheticAudioVariants(
        d.where(col("doc_id") < 12)
          .select((col("doc_id") + 100000).as("doc_id"),
            col("doc_id").as("key"), lit(2).as("gain"), lit(0).as("retouch"))
          .unionAll(d.where(col("doc_id") === 7)
            .select(lit(200007L).as("doc_id"), col("doc_id").as("key"),
              lit(1).as("gain"), lit(25).as("retouch"))))
      val st = java.nio.file.Files.createTempDirectory("graft-audiofp-compact-q")
      val idx = s"$st/index"
      val tB = System.nanoTime()
      Multimodal.buildAudioFpIndex(standingRows(col("doc_id") < 8), idx)
      Multimodal.appendToAudioFpIndex(
        standingRows(col("doc_id") >= 8 && col("doc_id") < 16), idx,
        ingestBatch = 0L)
      Multimodal.appendToAudioFpIndex(standingRows(col("doc_id") >= 16), idx,
        ingestBatch = 1L)
      Multimodal.compactAudioFpIndex(s, idx)
      fixtureSecs.put("sig-compact-build", (System.nanoTime() - tB) / 1e9)
      val parts = new java.io.File(s"$idx/hashes").listFiles()
        .count(_.getName.startsWith("ingest_batch="))
      require(parts == 1,
        s"compaction must fold to one base partition, got $parts")
      val out = Multimodal.crossNearDupAudioIndexed(s, idx, batch)
        .select(col("batch_id"), col("corpus_id"), col("hamming").cast("long"))
        .orderBy(col("batch_id"), col("corpus_id"))
        .localCheckpoint(true)
      deleteRecursively(st)
      out
    },

    // TEXT↔IMAGE PAIR curation (r15) — the LAION-style joint filter a
    // VLM corpus actually is: (caption, image) pairs gate on embedding
    // cosine ≥ 0.9 (every 3rd image is planted mis-captioned — its
    // vector belongs to the NEXT doc, and the verified corpus property
    // that natural cross-pair cosine ≤ ~0.51 makes the gate decisive),
    // then drop any pair whose side lost its modality's dedup: caption
    // copies to exact-dedup (keep-min), image delta-twins to the dHash
    // cluster labeling (keep-first). The oracle replays cosine, the
    // md5-group text dedup, and the recursive-CTE image CC end to end.
    QueryDef("mm_pair_filter")(
      s"""WITH RECURSIVE p0 AS (
         |   SELECT doc_id AS text_id, doc_id AS image_id, lang
         |     FROM documents WHERE doc_id < 200
         |   UNION ALL SELECT doc_id + 100000, doc_id, lang
         |     FROM documents WHERE doc_id < 10
         |   UNION ALL SELECT doc_id, doc_id + 100000, lang
         |     FROM documents WHERE doc_id < 12),
         | ed AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         | te AS (SELECT vec_id AS id, v FROM ed WHERE vec_id < 200
         |        UNION ALL SELECT vec_id + 100000, v FROM ed WHERE vec_id < 10),
         | im AS (SELECT doc_id AS img,
         |          CASE WHEN doc_id % 3 = 0 THEN doc_id + 1 ELSE doc_id END AS src
         |        FROM documents WHERE doc_id < 200
         |        UNION ALL SELECT doc_id + 100000, doc_id
         |          FROM documents WHERE doc_id < 12),
         | ie AS (SELECT im.img AS id, ed.v FROM im JOIN ed ON ed.vec_id = im.src),
         | sc AS (SELECT p0.text_id, p0.image_id, p0.lang,
         |          round(${cosSql("te.v", "ie.v")}, 6) AS cos
         |        FROM p0 JOIN te ON te.id = p0.text_id
         |                JOIN ie ON ie.id = p0.image_id),
         | al AS (SELECT * FROM sc WHERE cos >= 0.9),
         | tcorp AS (SELECT doc_id, text FROM documents
         |           UNION ALL SELECT doc_id + 100000, text
         |             FROM documents WHERE doc_id < 10),
         | tkeep AS (SELECT min(doc_id) AS kid FROM tcorp GROUP BY md5(text)),
         | tdrop AS (SELECT doc_id FROM tcorp
         |           WHERE doc_id NOT IN (SELECT kid FROM tkeep)),
         | f AS (SELECT doc_id AS id, doc_id AS key, 0 AS delta, 0 AS spot
         |         FROM documents WHERE doc_id < 24
         |       UNION ALL SELECT doc_id + 100000, doc_id, 1, 0
         |         FROM documents WHERE doc_id < 12),
         |$phashByteSql,
         | hm AS (SELECT a.id AS doc_a, b.id AS doc_b,
         |          sum(bit_count(xor(a.byte, b.byte))) AS h
         |        FROM bt a JOIN bt b ON a.gy = b.gy AND a.id < b.id
         |        GROUP BY 1, 2),
         | pr AS (SELECT doc_a, doc_b FROM hm WHERE h <= 3),
         | und AS (SELECT doc_a AS u, doc_b AS v FROM pr
         |         UNION SELECT doc_b, doc_a FROM pr),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v),
         | lbl AS (SELECT node AS doc_id, min(lbl) AS cid FROM reach GROUP BY 1),
         | idrop AS (SELECT doc_id FROM lbl WHERE doc_id <> cid),
         | fin AS (SELECT * FROM al
         |         WHERE text_id NOT IN (SELECT doc_id FROM tdrop)
         |           AND image_id NOT IN (SELECT doc_id FROM idrop))
         | SELECT np.lang, np.n_pairs,
         |   coalesce(na.n, 0) AS n_aligned, coalesce(nf.n, 0) AS n_final
         | FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n_pairs
         |       FROM p0 GROUP BY 1) np
         | LEFT JOIN (SELECT lang, CAST(count(*) AS BIGINT) AS n
         |            FROM al GROUP BY 1) na USING (lang)
         | LEFT JOIN (SELECT lang, CAST(count(*) AS BIGINT) AS n
         |            FROM fin GROUP BY 1) nf USING (lang)
         | ORDER BY lang""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
      val pairs = d.where(col("doc_id") < 200)
        .select(col("doc_id").as("text_id"), col("doc_id").as("image_id"), col("lang"))
        .unionAll(d.where(col("doc_id") < 10)
          .select((col("doc_id") + 100000).as("text_id"),
            col("doc_id").as("image_id"), col("lang")))
        .unionAll(d.where(col("doc_id") < 12)
          .select(col("doc_id").as("text_id"),
            (col("doc_id") + 100000).as("image_id"), col("lang")))
      // caption embeddings: copies share their original's vector
      val textEmb = e.where(col("vec_id") < 200)
        .unionAll(e.where(col("vec_id") < 10)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      // image embeddings: every 3rd image mis-captioned (next doc's
      // vector); delta twins share their original's
      val imgMap = d.where(col("doc_id") < 200)
        .select(col("doc_id").as("img"),
          when(col("doc_id") % 3 === 0, col("doc_id") + 1)
            .otherwise(col("doc_id")).as("src"))
        .unionAll(d.where(col("doc_id") < 12)
          .select((col("doc_id") + 100000).as("img"), col("doc_id").as("src")))
      val imageEmb = imgMap.join(e, col("src") === col("vec_id"))
        .select(col("img").as("vec_id"), col("embedding"))
      // dropped sets from each modality's own dedup
      val tcorp = d.select(col("doc_id"), col("text"))
        .unionAll(d.where(col("doc_id") < 10)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      val textDropped = tcorp.select(col("doc_id"))
        .join(Dedup.exact(tcorp).select(col("keep_id").as("doc_id")),
          Seq("doc_id"), "left_anti")
      val images = Multimodal.syntheticImageVariants(
        d.where(col("doc_id") < 24)
          .select(col("doc_id"), col("doc_id").as("key"),
            lit(0).as("delta"), lit(0).as("spot"))
          .unionAll(d.where(col("doc_id") < 12)
            .select((col("doc_id") + 100000).as("doc_id"),
              col("doc_id").as("key"), lit(1).as("delta"), lit(0).as("spot"))))
      val imageDropped = Multimodal.clusterImages(images)
        .where(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))
      Multimodal.pairFilter(pairs, textEmb, imageEmb,
          textDropped, imageDropped, minCosine = 0.9)
        .orderBy(col("lang"))
    },

    // REAL video-container metadata: structurally-valid AVI fixtures built
    // by formula (RIFF/LIST/avih/strl/movi, '00db' raw frames — no codec
    // involved, none exists in this env), walked back by the production
    // RIFF chunk walker; the oracle recomputes dims/rate/frame-count AND
    // the full frame-payload byte checksum by formula, so a header-only
    // parse cannot pass. Frame count is COUNTED from movi chunks, not
    // trusted from the avih header.
    QueryDef("mm_video_meta")(
      """WITH d AS (SELECT doc_id, 16 + doc_id % 8 AS w, 8 + doc_id % 4 AS h,
        |             doc_id % 6 + 2 AS nf, 33333 + (doc_id % 5) * 1000 AS usec
        |           FROM documents WHERE doc_id < 16),
        | s AS (SELECT d.doc_id,
        |         sum((d.doc_id * 7 + (p.i // (d.w * d.h)) * 11 + (p.i % (d.w * d.h)) * 3) % 256) AS fsum
        |       FROM d JOIN range(0, 2048) p(i) ON p.i < d.nf * d.w * d.h
        |       GROUP BY 1)
        | SELECT d.doc_id, 'video/x-msvideo' AS mime, 'avi' AS format,
        |   CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |   CAST(d.nf AS BIGINT) AS n_frames, CAST(d.usec AS BIGINT) AS usec_per_frame,
        |   CAST(d.nf * d.w * d.h AS BIGINT) AS frame_bytes,
        |   CAST(s.fsum AS BIGINT) AS frame_sum
        | FROM d JOIN s ON s.doc_id = d.doc_id ORDER BY d.doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.parseVideoMeta(Multimodal.syntheticAvi(
        Tables(s, dir, "documents").where(col("doc_id") < 16)))
        .toDF()
        .select(col("doc_id"), col("mime"), col("format"), col("width"),
          col("height"), col("n_frames"), col("usec_per_frame"),
          col("frame_bytes"), col("frame_sum"))
        .orderBy(col("doc_id"))
    },

    // REAL byte-level feature extraction (primitive loop over the payload);
    // oracle counts the same classes via regexp on the ASCII text (see the
    // documented corpus assumption above: payload bytes == characters).
    QueryDef("mm_features")(
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS byte_len,
        |   CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) AS n_alpha,
        |   CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
        |   CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS n_space,
        |   CAST(length(text) - len(regexp_extract_all(text, '[a-zA-Z0-9 ]')) AS BIGINT) AS n_other
        | FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.extractFeatures(Multimodal.mediaTable(
        Tables(s, dir, "documents").where(col("doc_id") < 100)))
        .toDF().orderBy("doc_id")
    },

    // Resize stub: fixed-size normalized payload + fingerprint (truncate /
    // '.'-pad — deterministic in both engines via rpad on the ASCII twin).
    QueryDef("mm_resize")(
      """SELECT doc_id, CAST(16 AS BIGINT) AS out_len,
        |   md5(rpad(substr(text, 1, 16), 16, '.')) AS resized_md5
        | FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.resizeStub(Multimodal.mediaTable(
        Tables(s, dir, "documents").where(col("doc_id") < 100)))
        .orderBy("doc_id")
    },

    // REAL multi-frame sampling: deterministic animated GIFs (id%5+2 full
    // 4x3 frames, <=12 colors each — inside the GIF palette, lossless)
    // encoded through the real codec, every 2nd stored frame decoded back
    // through ONE reader pass; the oracle recomputes each sampled frame's
    // pixel checksum by formula, so a frame-count-only parse cannot pass.
    QueryDef("mm_frames_real")(
      """WITH d AS (SELECT doc_id, doc_id % 5 + 2 AS nf
        |           FROM documents WHERE doc_id < 16),
        | fr AS (SELECT d.doc_id, f.f AS frame_idx FROM d
        |        JOIN range(0, 8) f(f) ON f.f < d.nf AND f.f % 2 = 0),
        | px AS (SELECT doc_id, frame_idx, (p.i // 3) % 4 AS x, p.i // 12 AS y, p.i % 3 AS c
        |        FROM fr JOIN range(0, 36) p(i) ON true)
        | SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |   CAST(4 AS INT) AS frame_w, CAST(3 AS INT) AS frame_h,
        |   CAST(sum((doc_id * 31 + frame_idx * 17 + x * 7 + y * 13 + c * 5) % 256) AS BIGINT) AS px_sum
        | FROM px GROUP BY 1, 2 ORDER BY doc_id, frame_idx""".stripMargin
    ) { (s, dir) =>
      Multimodal.sampleFramesReal(Multimodal.syntheticAnimatedGifs(
        Tables(s, dir, "documents").where(col("doc_id") < 16)), 2)
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // REAL perceptual hash: deterministic fixtures (plus controlled
    // brightness/spot perturbations) encode through the real codec, the
    // production kernel decodes and dHashes the true pixels, and the
    // oracle recomputes every hash by formula — grayscale, 9×8 NN
    // downsample, per-row gradient byte, hex roll-up. A header-only or
    // faked decode cannot pass.
    QueryDef("mm_phash")(
      s"""WITH f AS (SELECT doc_id AS id, doc_id AS key, 0 AS delta, 0 AS spot
         |           FROM documents WHERE doc_id < 24),
         |$phashByteSql
         | SELECT id AS doc_id,
         |   string_agg(printf('%02x', CAST(byte AS INT)), '' ORDER BY gy DESC) AS phash_hex
         | FROM bt GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      Multimodal.dHash64(Multimodal.syntheticImageVariants(
        Tables(s, dir, "documents").where(col("doc_id") < 24)
          .select(col("doc_id"), col("doc_id").as("key"),
            lit(0).as("delta"), lit(0).as("spot"))))
        .select(col("doc_id"), col("phash_hex"))
        .orderBy(col("doc_id"))
    },

    // Image NEAR-dedup — what exact dedup cannot see: delta twins
    // (uniform +1 brightness; different bytes, digest and px_sum, SAME
    // gradient hash → Hamming 0) and a single-pixel spot retouch on the
    // one id whose 9×8 grid samples pixel (0,0) exactly once (w=9, h=8 →
    // Hamming 1). The engine blocks candidates on simhashPairs' 16-bit
    // bands (pigeonhole-complete ≤ 3); the oracle all-pairs the
    // formula-derived hashes at fixture scale. Both engines emit the
    // same pairs with the same distances.
    QueryDef("mm_neardup")(
      s"""WITH f AS (SELECT doc_id AS id, doc_id AS key, 0 AS delta, 0 AS spot
         |             FROM documents WHERE doc_id < 24
         |           UNION ALL SELECT doc_id + 100000, doc_id, 1, 0
         |             FROM documents WHERE doc_id < 12
         |           UNION ALL SELECT 200006, 6, 0, 50),
         |$phashByteSql,
         | hm AS (SELECT a.id AS doc_a, b.id AS doc_b,
         |          CAST(sum(bit_count(xor(a.byte, b.byte))) AS BIGINT) AS hamming
         |        FROM bt a JOIN bt b ON a.gy = b.gy AND a.id < b.id
         |        GROUP BY 1, 2)
         | SELECT doc_a, doc_b, hamming FROM hm WHERE hamming <= 3
         | ORDER BY doc_a, doc_b""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val fixture = d.where(col("doc_id") < 24)
        .select(col("doc_id"), col("doc_id").as("key"),
          lit(0).as("delta"), lit(0).as("spot"))
        .unionAll(d.where(col("doc_id") < 12)
          .select((col("doc_id") + 100000).as("doc_id"), col("doc_id").as("key"),
            lit(1).as("delta"), lit(0).as("spot")))
        .unionAll(d.where(col("doc_id") === 6)
          .select(lit(200006L).as("doc_id"), col("doc_id").as("key"),
            lit(0).as("delta"), lit(50).as("spot")))
      Multimodal.nearDupImages(Multimodal.syntheticImageVariants(fixture))
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Image near-dup pairs COMPOSED into decisions — the missing last
    // step of the media dedup story (VERDICT r12 #3): mm_neardup's pairs
    // through connectedComponents (cluster labels), a keep-first purge
    // (keep = the component minimum; delta twins and the spot retouch
    // drop), and clusterSplit (leakage-safe folds — a near-dup image
    // pair can never straddle train/test). The text chain dd_cluster →
    // smp_cluster_split applied verbatim to the image modality; the
    // oracle recomputes every dHash by pixel formula, all-pairs the
    // Hamming graph, recursive-CTE CCs it, and replays the md5 fold
    // bucketing.
    QueryDef("mm_cluster")(
      s"""WITH RECURSIVE f AS (SELECT doc_id AS id, doc_id AS key, 0 AS delta, 0 AS spot
         |             FROM documents WHERE doc_id < 24
         |           UNION ALL SELECT doc_id + 100000, doc_id, 1, 0
         |             FROM documents WHERE doc_id < 12
         |           UNION ALL SELECT 200006, 6, 0, 50),
         |$phashByteSql,
         | hm AS (SELECT a.id AS doc_a, b.id AS doc_b,
         |          sum(bit_count(xor(a.byte, b.byte))) AS hamming
         |        FROM bt a JOIN bt b ON a.gy = b.gy AND a.id < b.id
         |        GROUP BY 1, 2),
         | pr AS (SELECT doc_a, doc_b FROM hm WHERE hamming <= 3),
         | und AS (SELECT doc_a AS u, doc_b AS v FROM pr
         |         UNION SELECT doc_b, doc_a FROM pr),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v),
         | labels AS (SELECT node AS doc_id, min(lbl) AS cluster_id
         |            FROM reach GROUP BY 1),
         | keyed AS (SELECT f.id AS doc_id, coalesce(l.cluster_id, f.id) AS sk
         |           FROM f LEFT JOIN labels l ON l.doc_id = f.id),
         | b AS (SELECT doc_id, sk,
         |         ('0x' || substr(md5(CAST(sk AS VARCHAR)), 1, 8))::BIGINT % 100 AS bk
         |       FROM keyed)
         | SELECT doc_id, CAST(sk AS BIGINT) AS cluster_id, doc_id = sk AS keep,
         |   CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val'
         |        ELSE 'test' END AS fold
         | FROM b ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val fixture = d.where(col("doc_id") < 24)
        .select(col("doc_id"), col("doc_id").as("key"),
          lit(0).as("delta"), lit(0).as("spot"))
        .unionAll(d.where(col("doc_id") < 12)
          .select((col("doc_id") + 100000).as("doc_id"), col("doc_id").as("key"),
            lit(1).as("delta"), lit(0).as("spot")))
        .unionAll(d.where(col("doc_id") === 6)
          .select(lit(200006L).as("doc_id"), col("doc_id").as("key"),
            lit(0).as("delta"), lit(50).as("spot")))
      val labels = Multimodal.clusterImages(Multimodal.syntheticImageVariants(fixture))
      graft.operators.Sampling.clusterSplit(fixture.select(col("doc_id")), labels,
          Seq(("train", 80), ("val", 90), ("test", 100)))
        .select(col("doc_id"),
          col("split_key").cast("long").as("cluster_id"),
          (col("doc_id") === col("split_key")).as("keep"),
          col("fold"))
        .orderBy(col("doc_id"))
    },

    // Image-modality DRIFT — the monitoring rung on the image ladder
    // (parity with cur_drift on text): PSI of an arriving image batch's
    // feature distributions (format / mean gray / width, from REAL
    // decoded pixels via Multimodal.imageStats) against the standing
    // corpus. The batch is the standing images re-uploaded brightness-
    // shifted (delta=1 — the re-encode wave a dedup-only monitor would
    // miss entirely): gray drifts hard while format and width read
    // exactly 0.0, in one output. The oracle replays every pixel from
    // the synthetic-variant formula and the PSI quantization.
    QueryDef("mm_drift")({
      val grayCte =
        """sz AS (SELECT doc_id AS id, doc_id AS key, d.delta,
          |        doc_id % 13 + 3 AS w, doc_id % 7 + 2 AS h
          |      FROM documents JOIN (VALUES (0), (1)) d(delta) ON true
          |      WHERE doc_id < 24),
          | gr AS (SELECT id, key, delta, w, h,
          |        (((key*31 + x.x*7 + y.y*13) % 255 + delta)
          |       + ((key*31 + x.x*7 + y.y*13 + 5) % 255 + delta)
          |       + ((key*31 + x.x*7 + y.y*13 + 10) % 255 + delta)) // 3 AS gray
          |      FROM sz JOIN range(0, 16) x(x) ON x.x < w
          |        JOIN range(0, 9) y(y) ON y.y < h),
          | st AS (SELECT id, delta,
          |        CASE WHEN key % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt,
          |        w, sum(gray) // (w*h) AS mg
          |      FROM gr GROUP BY id, delta, key, w, h),
          | s0 AS (SELECT * FROM st WHERE delta = 0),
          | s1 AS (SELECT * FROM st WHERE delta = 1)""".stripMargin
      s"""WITH $grayCte,
         | p0 AS (${graft.operators.Curation.driftFeatureSql("fmt", "fmt", "s0", "s1")}),
         | p1 AS (${graft.operators.Curation.driftFeatureSql("gray", "mg", "s0", "s1")}),
         | p2 AS (${graft.operators.Curation.driftFeatureSql("w", "w", "s0", "s1")})
         | SELECT * FROM p0 UNION ALL SELECT * FROM p1 UNION ALL SELECT * FROM p2
         | ORDER BY feature""".stripMargin
    }) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      def side(delta: Int, shift: Long) = Multimodal.imageStats(
        Multimodal.syntheticImageVariants(d.where(col("doc_id") < 24)
          .select((col("doc_id") + shift).as("doc_id"),
            col("doc_id").as("key"), lit(delta).as("delta"),
            lit(0).as("spot"))))
      graft.operators.Curation.drift(side(0, 0L), side(1, 100000L), Seq(
        "fmt" -> col("format"),
        "gray" -> col("mean_gray"),
        "w" -> col("width")))
    },

    // CROSS-corpus image near-dedup — the text ladder's dd_cross_neardup
    // on the image modality: an ARRIVING batch (delta twins + the spot
    // retouch) probes the STANDING corpus (the 24 originals) through one
    // banded equi-join; within-side pairs are never generated and the
    // standing corpus is never re-paired. The oracle recomputes every
    // dHash by pixel formula and all-pairs ONLY across sides at fixture
    // scale — both engines emit the same (batch, standing) pairs with
    // the same Hamming distances.
    QueryDef("mm_cross")(
      s"""WITH f AS (SELECT doc_id AS id, doc_id AS key, 0 AS delta, 0 AS spot
         |             FROM documents WHERE doc_id < 24
         |           UNION ALL SELECT doc_id + 100000, doc_id, 1, 0
         |             FROM documents WHERE doc_id < 12
         |           UNION ALL SELECT 200006, 6, 0, 50),
         |$phashByteSql,
         | hm AS (SELECT a.id AS batch_id, b.id AS corpus_id,
         |          CAST(sum(bit_count(xor(a.byte, b.byte))) AS BIGINT) AS hamming
         |        FROM bt a JOIN bt b ON a.gy = b.gy
         |          AND a.id >= 100000 AND b.id < 100000
         |        GROUP BY 1, 2)
         | SELECT batch_id, corpus_id, hamming FROM hm WHERE hamming <= 3
         | ORDER BY batch_id, corpus_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val standing = Multimodal.syntheticImageVariants(d.where(col("doc_id") < 24)
        .select(col("doc_id"), col("doc_id").as("key"),
          lit(0).as("delta"), lit(0).as("spot")))
      val batch = Multimodal.syntheticImageVariants(d.where(col("doc_id") < 12)
        .select((col("doc_id") + 100000).as("doc_id"), col("doc_id").as("key"),
          lit(1).as("delta"), lit(0).as("spot"))
        .unionAll(d.where(col("doc_id") === 6)
          .select(lit(200006L).as("doc_id"), col("doc_id").as("key"),
            lit(0).as("delta"), lit(50).as("spot"))))
      Multimodal.crossNearDupImages(standing, batch)
        .select(col("batch_id"), col("corpus_id"), col("hamming").cast("long"))
        .orderBy(col("batch_id"), col("corpus_id"))
    },

    // IMAGE takedown (r15): purge ids from the persisted dHash index
    // (anti-join rewrite of the touched ingest partitions only — 8
    // bytes/image, never a decode) and probe the arriving batch against
    // what remains. The oracle recomputes formula dHashes across sides
    // with the purged ids EXCLUDED from the standing side — hash match
    // proves the purged index pairs exactly like one built without the
    // docs (doc 3 and 7 lose their delta-twin pairs; 20, pairless,
    // just leaves the table).
    QueryDef("mm_purge")(
      s"""WITH f AS (SELECT doc_id AS id, doc_id AS key, 0 AS delta, 0 AS spot
         |             FROM documents WHERE doc_id < 24
         |           UNION ALL SELECT doc_id + 100000, doc_id, 1, 0
         |             FROM documents WHERE doc_id < 12
         |           UNION ALL SELECT 200006, 6, 0, 50),
         |$phashByteSql,
         | hm AS (SELECT a.id AS batch_id, b.id AS corpus_id,
         |          CAST(sum(bit_count(xor(a.byte, b.byte))) AS BIGINT) AS hamming
         |        FROM bt a JOIN bt b ON a.gy = b.gy
         |          AND a.id >= 100000 AND b.id < 100000
         |          AND b.id NOT IN (3, 7, 20)
         |        GROUP BY 1, 2)
         | SELECT batch_id, corpus_id, hamming FROM hm WHERE hamming <= 3
         | ORDER BY batch_id, corpus_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      def standingRows(pred: org.apache.spark.sql.Column) = Multimodal.syntheticImageVariants(
        d.where(col("doc_id") < 24 && pred)
          .select(col("doc_id"), col("doc_id").as("key"),
            lit(0).as("delta"), lit(0).as("spot")))
      val batch = Multimodal.syntheticImageVariants(d.where(col("doc_id") < 12)
        .select((col("doc_id") + 100000).as("doc_id"), col("doc_id").as("key"),
          lit(1).as("delta"), lit(0).as("spot"))
        .unionAll(d.where(col("doc_id") === 6)
          .select(lit(200006L).as("doc_id"), col("doc_id").as("key"),
            lit(0).as("delta"), lit(50).as("spot"))))
      val st = java.nio.file.Files.createTempDirectory("graft-dhash-purge-q")
      val idx = s"$st/index"
      Multimodal.buildDHashIndex(standingRows(col("doc_id") < 16), idx)
      Multimodal.appendToDHashIndex(standingRows(col("doc_id") >= 16), idx,
        ingestBatch = 0L)
      Multimodal.purgeFromDHashIndex(s, idx,
        d.where(col("doc_id").isin(3L, 7L, 20L)).select(col("doc_id")))
      val out = Multimodal.crossNearDupImagesIndexed(s, idx, batch)
        .select(col("batch_id"), col("corpus_id"), col("hamming").cast("long"))
        .orderBy(col("batch_id"), col("corpus_id"))
        .localCheckpoint(true)
      deleteRecursively(st)
      out
    },

    // INCREMENTAL image cluster labels — the arriving batch's Hamming
    // edges (cross via one banded join + within-batch self pairs) folded
    // into the STANDING labeling with incrementalClusters: untouched
    // components never move, and the grown labeling equals the
    // from-scratch one (CC over star edges ∪ new pairs = CC over the
    // union pair set — the oracle recomputes the union from formula
    // hashes and recursive-CTE CCs it). MultimodalSpec additionally pins
    // grown == clusterImages(standing ∪ batch) in-engine.
    QueryDef("mm_cluster_increment")(
      s"""WITH RECURSIVE f AS (SELECT doc_id AS id, doc_id AS key, 0 AS delta, 0 AS spot
         |             FROM documents WHERE doc_id < 24
         |           UNION ALL SELECT doc_id + 100000, doc_id, 1, 0
         |             FROM documents WHERE doc_id < 12
         |           UNION ALL SELECT 200006, 6, 0, 50),
         |$phashByteSql,
         | hm AS (SELECT a.id AS doc_a, b.id AS doc_b,
         |          sum(bit_count(xor(a.byte, b.byte))) AS hamming
         |        FROM bt a JOIN bt b ON a.gy = b.gy AND a.id < b.id
         |        GROUP BY 1, 2),
         | pr AS (SELECT doc_a, doc_b FROM hm WHERE hamming <= 3),
         | und AS (SELECT doc_a AS u, doc_b AS v FROM pr
         |         UNION SELECT doc_b, doc_a FROM pr),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v)
         | SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
         | FROM reach GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val standing = Multimodal.syntheticImageVariants(d.where(col("doc_id") < 24)
        .select(col("doc_id"), col("doc_id").as("key"),
          lit(0).as("delta"), lit(0).as("spot")))
      val batch = Multimodal.syntheticImageVariants(d.where(col("doc_id") < 12)
        .select((col("doc_id") + 100000).as("doc_id"), col("doc_id").as("key"),
          lit(1).as("delta"), lit(0).as("spot"))
        .unionAll(d.where(col("doc_id") === 6)
          .select(lit(200006L).as("doc_id"), col("doc_id").as("key"),
            lit(0).as("delta"), lit(50).as("spot"))))
      val labels = Multimodal.clusterImages(standing)
      val cross = Multimodal.crossNearDupImages(standing, batch)
        .select(col("batch_id").as("doc_a"), col("corpus_id").as("doc_b"))
      val within = Multimodal.nearDupImages(batch)
        .select(col("doc_a"), col("doc_b"))
      Dedup.incrementalClusters(labels, cross.unionAll(within))
        .orderBy(col("doc_id"))
    },

    // The STREAMING image-dedup ingest loop run end to end inside the
    // row: seed the dHash index + labeling from the standing corpus,
    // stream two file-dropped image micro-batches through imageDedupLoop
    // (probe index → fold labels → grow index), and hash-check the FINAL
    // labeling against the from-scratch recursive-CTE CC over the whole
    // fixture. The spot retouch (batch 2) pairs with a DELTA TWIN that
    // arrived in batch 1 — a pair that exists only because batch 1's
    // hashes were appended to the index before batch 2 arrived, so the
    // match proves mid-stream index growth, not just per-batch probing.
    QueryDef("mm_neardup_stream")(
      s"""WITH RECURSIVE f AS (SELECT doc_id AS id, doc_id AS key, 0 AS delta, 0 AS spot
         |             FROM documents WHERE doc_id < 24
         |           UNION ALL SELECT doc_id + 100000, doc_id, 1, 0
         |             FROM documents WHERE doc_id < 12
         |           UNION ALL SELECT 200006, 6, 0, 50),
         |$phashByteSql,
         | hm AS (SELECT a.id AS doc_a, b.id AS doc_b,
         |          sum(bit_count(xor(a.byte, b.byte))) AS hamming
         |        FROM bt a JOIN bt b ON a.gy = b.gy AND a.id < b.id
         |        GROUP BY 1, 2),
         | pr AS (SELECT doc_a, doc_b FROM hm WHERE hamming <= 3),
         | und AS (SELECT doc_a AS u, doc_b AS v FROM pr
         |         UNION SELECT doc_b, doc_a FROM pr),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v)
         | SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
         | FROM reach GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val standing = Multimodal.syntheticImageVariants(d.where(col("doc_id") < 24)
        .select(col("doc_id"), col("doc_id").as("key"),
          lit(0).as("delta"), lit(0).as("spot")))
      val b1 = Multimodal.syntheticImageVariants(d.where(col("doc_id") < 8)
        .select((col("doc_id") + 100000).as("doc_id"), col("doc_id").as("key"),
          lit(1).as("delta"), lit(0).as("spot")))
      val b2 = Multimodal.syntheticImageVariants(
        d.where(col("doc_id") >= 8 && col("doc_id") < 12)
          .select((col("doc_id") + 100000).as("doc_id"), col("doc_id").as("key"),
            lit(1).as("delta"), lit(0).as("spot"))
          .unionAll(d.where(col("doc_id") === 6)
            .select(lit(200006L).as("doc_id"), col("doc_id").as("key"),
              lit(0).as("delta"), lit(50).as("spot"))))
      val st = java.nio.file.Files.createTempDirectory("graft-imgstream-q")
      val (idxDir, lblDir) = (s"$st/index", s"$st/labels")
      val tSeed = System.nanoTime()
      val inDir = java.nio.file.Files.createTempDirectory("graft-imgstream-q-in")
      // Seed state fingerprint-cached (r20, the dd_curation_stream
      // treatment; the loop MUTATES it, so each run works on a COPY) —
      // copy ∥ stagings (guide §2.6). Fingerprint = the originating doc
      // rows (the synthetic variants derive from their ids alone).
      graft.operators.Par.runUnit(Seq(
        () => {
          val seed = cachedArtifact(dir, "img-dedup-seed",
            d.where(col("doc_id") < 24).select(col("doc_id"), col("text"))) {
            out => graft.streaming.Streams.seedImageDedupState(standing,
              s"$out/index", s"$out/labels")
          }
          copyRecursively(java.nio.file.Paths.get(seed, "index"),
            java.nio.file.Paths.get(idxDir))
          copyRecursively(java.nio.file.Paths.get(seed, "labels"),
            java.nio.file.Paths.get(lblDir))
        },
        () => stageAsFile(b1.toDF(), inDir, "b1.parquet"),
        () => stageAsFile(b2.toDF(), inDir, "b2.parquet")))
      orderStaged(inDir, "b1.parquet", "b2.parquet")
      fixtureSecs.put("img-stream-fixture", (System.nanoTime() - tSeed) / 1e9)
      val tLoop = System.nanoTime()
      val q = graft.streaming.Streams.imageDedupLoop(
        graft.streaming.Streams.mediaStream(s, inDir.toString, maxFilesPerTrigger = 1),
        idxDir, lblDir, s"$st/ckpt")
      q.awaitTermination()
      fixtureSecs.put("img-stream-loop", (System.nanoTime() - tLoop) / 1e9)
      val out = s.read.schema("doc_id LONG, cluster_id LONG")
        .parquet(s"$lblDir/v1")
        .orderBy(col("doc_id")).localCheckpoint(true)
      deleteRecursively(st)
      deleteRecursively(inDir)
      out
    },

    QueryDef("mm_frames")(
      """WITH d AS (SELECT doc_id, text, CAST(ceil(length(text) / 32.0) AS INT) AS nf
        |           FROM documents WHERE doc_id < 10)
        | SELECT doc_id, CAST(i.i AS INT) AS frame_idx,
        |        md5(substr(text, CAST(i.i AS INT) * 32 + 1, 32)) AS frame_md5
        | FROM d JOIN range(0, 10000) i(i) ON i.i < nf AND i.i % 4 = 0
        | ORDER BY doc_id, frame_idx""".stripMargin
    ) { (s, dir) =>
      Multimodal.sampleFrames(Multimodal.mediaTable(
        Tables(s, dir, "documents").where(col("doc_id") < 10)))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // The STREAMING audio-dedup ingest loop (r15) — the image loop's
    // generic signature machinery on the third modality, run end to end
    // inside the row: seed the fp index + labeling from the 24 standing
    // originals, stream two file-dropped micro-batches (gain twins, then
    // the dropout + a second twin of key 7) through audioDedupLoop, and
    // hash-check the FINAL labeling against the from-scratch
    // recursive-CTE CC over the whole fixture. The dropout (batch 2)
    // pairs with a GAIN TWIN that arrived in batch 1 — a pair that
    // exists only because batch 1's fingerprints were appended before
    // batch 2 arrived, so the match proves mid-stream index growth.
    QueryDef("mm_audio_stream")(
      s"""WITH RECURSIVE fa AS (SELECT doc_id AS id, doc_id AS key, 1 AS gain, 0 AS retouch
         |              FROM documents WHERE doc_id < 24
         |            UNION ALL SELECT doc_id + 100000, doc_id, 2, 0
         |              FROM documents WHERE doc_id < 12
         |            UNION ALL SELECT 200007, 7, 1, 25),
         |$afpByteSql,
         | hm AS (SELECT a.id AS doc_a, b.id AS doc_b,
         |          sum(bit_count(xor(a.byte, b.byte))) AS hamming
         |        FROM abt a JOIN abt b ON a.g = b.g AND a.id < b.id
         |        GROUP BY 1, 2),
         | pr AS (SELECT doc_a, doc_b FROM hm WHERE hamming <= 3),
         | und AS (SELECT doc_a AS u, doc_b AS v FROM pr
         |         UNION SELECT doc_b, doc_a FROM pr),
         | reach AS (SELECT u AS node, u AS lbl FROM und
         |           UNION
         |           SELECT e.u AS node, r.lbl FROM und e JOIN reach r ON r.node = e.v)
         | SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
         | FROM reach GROUP BY 1 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val standing = Multimodal.syntheticAudioVariants(
        d.where(col("doc_id") < 24)
          .select(col("doc_id"), col("doc_id").as("key"),
            lit(1).as("gain"), lit(0).as("retouch")))
      val b1 = Multimodal.syntheticAudioVariants(
        d.where(col("doc_id") < 12)
          .select((col("doc_id") + 100000).as("doc_id"),
            col("doc_id").as("key"), lit(2).as("gain"), lit(0).as("retouch")))
      val b2 = Multimodal.syntheticAudioVariants(
        d.where(col("doc_id") === 7)
          .select(lit(200007L).as("doc_id"), col("doc_id").as("key"),
            lit(1).as("gain"), lit(25).as("retouch")))
      val st = java.nio.file.Files.createTempDirectory("graft-audiostream-q")
      val (idxDir, lblDir) = (s"$st/index", s"$st/labels")
      val tSeed = System.nanoTime()
      val inDir = java.nio.file.Files.createTempDirectory("graft-audiostream-q-in")
      // Seed state fingerprint-cached, per-run COPY (r20 — see
      // mm_neardup_stream); copy ∥ stagings (guide §2.6).
      graft.operators.Par.runUnit(Seq(
        () => {
          val seed = cachedArtifact(dir, "audio-dedup-seed",
            d.where(col("doc_id") < 24).select(col("doc_id"), col("text"))) {
            out => graft.streaming.Streams.seedAudioDedupState(standing,
              s"$out/index", s"$out/labels")
          }
          copyRecursively(java.nio.file.Paths.get(seed, "index"),
            java.nio.file.Paths.get(idxDir))
          copyRecursively(java.nio.file.Paths.get(seed, "labels"),
            java.nio.file.Paths.get(lblDir))
        },
        () => stageAsFile(b1.toDF(), inDir, "b1.parquet"),
        () => stageAsFile(b2.toDF(), inDir, "b2.parquet")))
      orderStaged(inDir, "b1.parquet", "b2.parquet")
      fixtureSecs.put("audio-stream-fixture", (System.nanoTime() - tSeed) / 1e9)
      val tLoop = System.nanoTime()
      val q = graft.streaming.Streams.audioDedupLoop(
        graft.streaming.Streams.mediaStream(s, inDir.toString, maxFilesPerTrigger = 1),
        idxDir, lblDir, s"$st/ckpt")
      q.awaitTermination()
      fixtureSecs.put("audio-stream-loop", (System.nanoTime() - tLoop) / 1e9)
      val out = s.read.schema("doc_id LONG, cluster_id LONG")
        .parquet(s"$lblDir/v1")
        .orderBy(col("doc_id")).localCheckpoint(true)
      deleteRecursively(st)
      deleteRecursively(inDir)
      out
    },
  )
}
