package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ONE-CALL takedown orchestration (r16): a real PII erasure is one
  * doc-id set against EVERY standing artifact, not eight purge entry
  * points the caller must know and sequence. [[purgeEverywhere]] takes
  * the id set plus a declaration of the deployment's standing artifacts
  * ([[Takedown.Target]]s), runs each family's own purge verb in a safe
  * order, and returns the AUDIT MANIFEST an erasure process files:
  * one row per artifact — `(family, target, ids_found, sec)` — where
  * `ids_found` is the number of requested ids that were actually present
  * in that artifact before the purge (the number the audit trail needs:
  * "we looked here, found these, removed them").
  *
  * Each family's own invariants hold unchanged (purged == built-without,
  * probe identity, two-phase crash safety — all spec/oracle-pinned on
  * the individual verbs); this module adds only sequencing and the
  * manifest. Streaming-loop targets carry the loop verbs' owner-only,
  * stream-stopped contract. Purge verbs are idempotent per family, so a
  * crashed orchestration is safely re-run end to end.
  *
  * `ids_found` is −1 for the one family whose artifact stores no ids at
  * all (the exact-window index holds only window hashes; its purge verb
  * takes the surviving rows of the touched ingest partition instead). */
object Takedown {

  sealed trait Target {
    /** Audit family label (unique per artifact kind). */
    def family: String
    /** The artifact's root path, echoed in the manifest. */
    def path: String
  }

  /** BM25 index ([[Retrieval.purgeFromBm25Index]]); `compact = true`
    * additionally runs the physical [[Retrieval.compactBm25Postings]] —
    * leave false to ride the cheap logical commit (the legal deadline)
    * and compact later. */
  case class Bm25(path: String, compact: Boolean = false) extends Target {
    val family = "bm25"
  }

  /** Cross-near-dup LSH index ([[Dedup.purgeFromCrossNearDupIndex]]);
    * `compact` as in [[Bm25]]. */
  case class CrossNearDup(path: String, compact: Boolean = false) extends Target {
    val family = "cross_neardup"
  }

  /** Exact-window index partition rewrite
    * ([[Dedup.purgeFromExactWindowIndex]]): windows carry no doc ids, so
    * the caller supplies the SURVIVING rows of the ingest partition the
    * purged docs arrived in. `ids_found` reports −1 (not id-attributable). */
  case class ExactWindow(path: String, ingestBatch: Long,
      survivors: DataFrame) extends Target {
    val family = "exact_window"
  }

  /** IVF cell layout ([[Similarity.purgeFromIvfIndex]]) — ids are
    * `vec_id`s. */
  case class Ivf(path: String) extends Target { val family = "ivf" }

  /** IVF-PQ codes layout ([[Similarity.purgeFromIvfPqIndex]]). */
  case class IvfPq(path: String) extends Target { val family = "ivfpq" }

  /** Flat-PQ codes layout ([[Similarity.purgeFromPqIndex]]). */
  case class Pq(path: String) extends Target { val family = "pq" }

  /** dHash image signature index ([[Multimodal.purgeFromDHashIndex]]). */
  case class DHash(path: String) extends Target { val family = "dhash" }

  /** Audio fingerprint index ([[Multimodal.purgeFromAudioFpIndex]]). */
  case class AudioFp(path: String) extends Target { val family = "audio_fp" }

  /** Drift histogram index ([[Curation.purgeFromDriftIndex]]):
    * histograms hold no per-doc state, so the caller supplies the purged
    * docs' ROWS (with feature columns) — the same rows the corpus store
    * deletes. `ids_found` is the claimed row count. */
  case class Drift(path: String, features: Seq[(String, Column)],
      purgedRows: DataFrame, purgeId: Long) extends Target {
    val family = "drift"
  }

  /** Keyed Z-order/Hilbert layout ([[Layout.purgeFromKeyedLayout]]). */
  case class KeyedLayout(path: String, idCol: String, files: Int)
      extends Target { val family = "keyed_layout" }

  /** Persisted n-gram LM model ([[LangModel.purgeFromLmIndex]]): count
    * tables hold no per-doc state, so the caller supplies the purged
    * docs' ROWS (doc_id, text) — the [[Drift]] convention. `ids_found`
    * is the claimed row count. */
  case class LmModel(path: String, purgedRows: DataFrame, purgeId: Long)
      extends Target { val family = "lm_model" }

  /** Text curation loop state ([[graft.streaming.Streams
    * .purgeCurationState]]): LSH index + edge evidence + labelings +
    * registry, owner-only while the stream is stopped. */
  case class CurationLoop(indexDir: String, labelsDir: String)
      extends Target {
    val family = "curation_loop"; val path = labelsDir
  }

  /** Image dedup loop state ([[graft.streaming.Streams
    * .purgeImageDedupState]]). */
  case class ImageLoop(indexDir: String, labelsDir: String) extends Target {
    val family = "image_loop"; val path = labelsDir
  }

  /** Audio dedup loop state ([[graft.streaming.Streams
    * .purgeAudioDedupState]]). */
  case class AudioLoop(indexDir: String, labelsDir: String) extends Target {
    val family = "audio_loop"; val path = labelsDir
  }

  /** COMPLETENESS GUARD (r17): [[purgeEverywhere]] trusts the caller's
    * target list — a standing artifact nobody declared would be silently
    * skipped while the audit manifest still reads "complete". This scan
    * walks a deployment root and recognizes every directory that IS an
    * engine artifact by the layout's own identifying files (format
    * markers, version `_COMMIT`s, manifests, the signature/layout
    * metadata files) — all metadata-scale fs listings, no data read.
    * Returns `(kind, path)` rows; [[requireDeclaredComplete]] fails
    * LOUDLY if any recognized artifact is covered by no declared target.
    *
    * Recognizers (one per persisted layout family):
    *   - `_GRAFT_LM_FORMAT` file          → lm_model
    *   - `_GRAFT_DRIFT_FORMAT` file       → drift
    *   - `v<k>/_COMMIT` child             → bm25 (versioned index root)
    *   - `manifest` + `shingle_keys` dirs → cross_neardup (also the
    *     curation loop's index half)
    *   - `manifest` + `windows` dirs      → exact_window
    *   - `data` + `centroids` dirs        → ivf
    *   - `codes` + `centroids` + `codebook` → ivfpq
    *   - `codes` + `codebook` (no centroids) → pq
    *   - `hashes/ingest_batch=…` children → sig_index (dHash OR audio
    *     fingerprint — byte-identical layouts; either target kind covers)
    *   - `edges` + `registry`-bearing dir → loop_labels
    *   - `_graft_zmeta` at root or under `batch=…` → keyed_layout */
  def discoverArtifacts(spark: SparkSession, root: String,
      maxDepth: Int = 5): Seq[(String, String)] = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rp)) return Seq.empty
    def ls(p: org.apache.hadoop.fs.Path) =
      try fs.listStatus(p).toSeq catch { case _: java.io.IOException => Seq.empty }
    def kindOf(p: org.apache.hadoop.fs.Path): Option[String] = {
      val children = ls(p)
      val dirs = children.filter(_.isDirectory).map(_.getPath.getName).toSet
      val files = children.filter(!_.isDirectory).map(_.getPath.getName).toSet
      def versioned = children.exists(c => c.isDirectory &&
        c.getPath.getName.matches("v-?\\d+") &&
        fs.exists(new org.apache.hadoop.fs.Path(c.getPath, "_COMMIT")))
      if (files.contains("_GRAFT_LM_FORMAT")) Some("lm_model")
      else if (files.contains("_GRAFT_DRIFT_FORMAT")) Some("drift")
      // ANY batch=* child bearing the layout's meta file marks the ROOT
      // as the keyed layout (r17 ADVICE: hardcoding batch=0 misread a
      // layout whose first batch was purged/compacted away or whose ids
      // start past 0 — the walker then classified each batch=N child as
      // a separate artifact at the wrong path, failing the completeness
      // guard spuriously even when the root was declared)
      else if (files.contains("_graft_zmeta") ||
        dirs.exists(b => b.startsWith("batch=") && fs.exists(
          new org.apache.hadoop.fs.Path(p, s"$b/_graft_zmeta"))))
        Some("keyed_layout")
      else if (dirs.contains("manifest") && dirs.contains("shingle_keys"))
        Some("cross_neardup")
      else if (dirs.contains("manifest") && dirs.contains("windows"))
        Some("exact_window")
      else if (dirs.contains("data") && dirs.contains("centroids")) Some("ivf")
      else if (dirs.contains("codes") && dirs.contains("centroids") &&
        dirs.contains("codebook")) Some("ivfpq")
      else if (dirs.contains("codes") && dirs.contains("codebook")) Some("pq")
      else if (dirs.contains("hashes") && ls(new org.apache.hadoop.fs.Path(p,
        "hashes")).exists(_.getPath.getName.startsWith("ingest_batch=")))
        Some("sig_index")
      else if (dirs.contains("edges")) Some("loop_labels")
      else if (versioned) Some("bm25")
      else None
    }
    def walk(p: org.apache.hadoop.fs.Path, depth: Int): Seq[(String, String)] =
      kindOf(p) match {
        case Some(kind) => Seq(kind -> p.toUri.getPath) // don't descend INTO one
        case None if depth < maxDepth =>
          ls(p).filter(_.isDirectory)
            .flatMap(c => walk(c.getPath, depth + 1))
        case None => Seq.empty
      }
    walk(rp, 0).sortBy(identity)
  }

  /** Fail loudly if `root` holds a recognized engine artifact that no
    * declared target covers. Coverage is by path: every Target's
    * artifact path(s) — loop targets cover BOTH their index and labels
    * dirs — normalized and compared to the discovered roots. */
  def requireDeclaredComplete(spark: SparkSession, root: String,
      targets: Seq[Target]): Unit = {
    def norm(s: String) =
      new org.apache.hadoop.fs.Path(s).toUri.getPath.stripSuffix("/")
    val covered: Set[String] = targets.flatMap {
      case CurationLoop(i, l) => Seq(i, l)
      case ImageLoop(i, l) => Seq(i, l)
      case AudioLoop(i, l) => Seq(i, l)
      case t => Seq(t.path)
    }.map(norm).toSet
    val undeclared = discoverArtifacts(spark, root)
      .filterNot { case (_, p) => covered.contains(norm(p)) }
    require(undeclared.isEmpty,
      s"purgeEverywhere: deployment root $root holds engine artifacts no " +
        s"declared target covers — a takedown run now would SKIP them while " +
        s"the audit reads complete: " +
        undeclared.map { case (k, p) => s"$k at $p" }.mkString("; "))
  }

  /** How many requested ids an id-bearing table actually holds — one
    * narrow column scan + broadcast semi-join per family, the audit
    * number, measured BEFORE the purge. */
  private def foundIn(table: DataFrame, idColName: String,
      ids: DataFrame): Long =
    table.select(col(idColName).as("doc_id")).distinct()
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
      .count()

  /** Run the takedown of `ids` (a `doc_id` column; vec-id families read
    * the same values as `vec_id`) across every declared target, in this
    * order: streaming-loop states first (they own + purge their own LSH
    * index internally), then every standalone index family, then data
    * layouts. Returns the audit manifest `(family, target, ids_found,
    * sec)` sorted by family — `sec` is wall-clock of that family's purge
    * (informational; exclude it from any hash-checked comparison). */
  def purgeEverywhere(spark: SparkSession, ids: DataFrame,
      targets: Seq[Target], deploymentRoot: Option[String] = None): DataFrame = {
    require(targets.nonEmpty, "purgeEverywhere: no targets declared")
    // completeness guard: when the caller names the deployment root, a
    // recognized-but-undeclared artifact fails the whole takedown BEFORE
    // any family purges (an audit that silently skipped a standing index
    // is worse than no audit)
    deploymentRoot.foreach(r => requireDeclaredComplete(spark, r, targets))
    // duplicate key includes the ingest batch for the one per-PARTITION
    // verb: a doc set that arrived across several micro-batches
    // legitimately declares one ExactWindow target per touched partition
    // of the SAME window index
    val dup = targets.groupBy {
        case ExactWindow(p, b, _) => ("exact_window", s"$p#batch=$b")
        case t => (t.family, t.path)
      }
      .collect { case (k, ts) if ts.size > 1 => k }
    require(dup.isEmpty, s"duplicate takedown targets: ${dup.mkString(", ")}")
    val idSet = ids.select(col("doc_id")).distinct().localCheckpoint(true)
    val vecIds = idSet.select(col("doc_id").as("vec_id"))
    // loops first: they purge their own index + evidence + labels +
    // registry as one unit; standalone families after; layouts last
    def rank(t: Target): Int = t match {
      case _: CurationLoop | _: ImageLoop | _: AudioLoop => 0
      case _: KeyedLayout => 2
      case _ => 1
    }
    // Targets are independent artifacts (disjoint paths — the duplicate
    // guard above enforces it; none of the purge verbs mutate session
    // conf), so within each rank tier the audits + purges overlap from a
    // small pool (guide §2.6) instead of serializing ten family purges'
    // job tails. The rank BARRIERS stay: loops first, layouts last —
    // the documented safe order. `sec` stays each family's own wall
    // (measured inside its thunk); the manifest sort keeps output
    // deterministic.
    def runTarget(t: Target): (String, String, Long, Double) = {
      val found: Long = t match {
        case Bm25(dir, _) =>
          foundIn(spark.read.parquet(s"$dir/postings"), "doc_id", idSet)
        case CrossNearDup(dir, _) =>
          foundIn(spark.read.schema("doc_id LONG, sk LONG")
            .parquet(s"$dir/shingle_keys"), "doc_id", idSet)
        case ExactWindow(_, _, _) => -1L
        case Ivf(dir) =>
          foundIn(spark.read.parquet(s"$dir/data"), "vec_id", idSet)
        case IvfPq(dir) =>
          foundIn(spark.read.parquet(s"$dir/codes"), "vec_id", idSet)
        case Pq(dir) =>
          foundIn(spark.read.parquet(s"$dir/codes"), "vec_id", idSet)
        case DHash(dir) =>
          foundIn(Multimodal.standingDHashes(spark, dir), "doc_id", idSet)
        case AudioFp(dir) =>
          foundIn(Multimodal.standingAudioFps(spark, dir), "doc_id", idSet)
        case Drift(_, _, purgedRows, _) => purgedRows.count()
        case LmModel(_, purgedRows, _) => purgedRows.count()
        case KeyedLayout(dir, idCol, _) =>
          foundIn(spark.read.parquet(dir), idCol, idSet)
        case CurationLoop(indexDir, _) =>
          foundIn(spark.read.schema("doc_id LONG, sk LONG")
            .parquet(s"$indexDir/shingle_keys"), "doc_id", idSet)
        case ImageLoop(indexDir, _) =>
          foundIn(Multimodal.standingDHashes(spark, indexDir), "doc_id", idSet)
        case AudioLoop(indexDir, _) =>
          foundIn(Multimodal.standingAudioFps(spark, indexDir), "doc_id", idSet)
      }
      val t0 = System.nanoTime()
      t match {
        case Bm25(dir, compact) =>
          Retrieval.purgeFromBm25Index(spark, dir, idSet)
          if (compact) Retrieval.compactBm25Postings(spark, dir)
        case CrossNearDup(dir, compact) =>
          Dedup.purgeFromCrossNearDupIndex(spark, dir, idSet)
          if (compact) Dedup.compactCrossNearDupIndex(spark, dir)
        case ExactWindow(dir, batchId, survivors) =>
          Dedup.purgeFromExactWindowIndex(survivors, dir, batchId)
        case Ivf(dir) => Similarity.purgeFromIvfIndex(spark, dir, vecIds)
        case IvfPq(dir) => Similarity.purgeFromIvfPqIndex(spark, dir, vecIds)
        case Pq(dir) => Similarity.purgeFromPqIndex(spark, dir, vecIds)
        case DHash(dir) => Multimodal.purgeFromDHashIndex(spark, dir, idSet)
        case AudioFp(dir) => Multimodal.purgeFromAudioFpIndex(spark, dir, idSet)
        case Drift(dir, features, purgedRows, purgeId) =>
          Curation.purgeFromDriftIndex(purgedRows, features, dir, purgeId)
        case LmModel(dir, purgedRows, purgeId) =>
          LangModel.purgeFromLmIndex(purgedRows, dir, purgeId)
        case KeyedLayout(dir, idCol, files) =>
          Layout.purgeFromKeyedLayout(spark, dir, idCol,
            idSet.select(col("doc_id").as(idCol)), files)
        case CurationLoop(indexDir, labelsDir) =>
          graft.streaming.Streams.purgeCurationState(
            spark, indexDir, labelsDir, idSet)
        case ImageLoop(indexDir, labelsDir) =>
          graft.streaming.Streams.purgeImageDedupState(
            spark, indexDir, labelsDir, idSet)
        case AudioLoop(indexDir, labelsDir) =>
          graft.streaming.Streams.purgeAudioDedupState(
            spark, indexDir, labelsDir, idSet)
      }
      // the manifest target echoes the dup key's per-partition suffix for
      // the one per-partition verb, so a multi-batch erasure's rows stay
      // attributable ("we covered partitions 0 AND 1", not two identical
      // lines) and the (family, target) sort is total
      val auditTarget = t match {
        case ExactWindow(p, b, _) => s"$p#batch=$b"
        case _ => t.path
      }
      (t.family, auditTarget, found, (System.nanoTime() - t0) / 1e9)
    }
    // EVERY directory a target touches (loop targets rewrite BOTH their
    // index root and their labels root) — the overlap-safety key. Keying
    // only on t.path (r19) let two loop targets sharing an index dir but
    // declaring different labels dirs rewrite that index concurrently
    // within the rank-0 tier (ADVICE r19).
    def dirsOf(t: Target): Seq[String] = t match {
      case CurationLoop(i, l) => Seq(i, l)
      case ImageLoop(i, l) => Seq(i, l)
      case AudioLoop(i, l) => Seq(i, l)
      case other => Seq(other.path)
    }
    val sorted = targets.sortBy(t => (rank(t), t.family))
    val rows = sorted.map(rank).distinct.sorted.flatMap { r =>
      val tier = sorted.filter(t => rank(t) == r)
      // Targets whose touched dirs overlap — transitively — run as ONE
      // sequential thunk (several ExactWindow partitions of one window
      // index; loop targets chained through a shared index or labels
      // root); only disjoint artifacts overlap. Union-find over the dir
      // strings; output order is free (the manifest sorts below).
      val parent = scala.collection.mutable.Map.empty[String, String]
      def findRoot(x: String): String = {
        val p = parent.getOrElse(x, x)
        if (p == x) x
        else { val root = findRoot(p); parent.update(x, root); root }
      }
      tier.foreach { t =>
        val ds = dirsOf(t)
        ds.tail.foreach(d => parent.update(findRoot(d), findRoot(ds.head)))
      }
      val groups = tier.groupBy(t => findRoot(dirsOf(t).head)).toSeq
        .sortBy(_._1).map(_._2)
      Par.run(groups.map(g => () => g.map(runTarget))).flatten
    }
    import spark.implicits._
    rows.toDF("family", "target", "ids_found", "sec")
      .orderBy(col("family"), col("target"))
  }
}
