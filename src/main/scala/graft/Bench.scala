package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every declared query at the given scale factor,
  * fully evaluated through the `noop` sink (a bare `count()` would let
  * Spark prune projections and undercount scan/compute cost).
  *
  * Isolation: `spark.catalog.clearCache()` runs between queries so no
  * query's persisted blocks bleed into the next measurement — without it a
  * 110-query session accumulates storage blocks until eviction/recompute
  * cascades make later queries' numbers order-dependent (the r4 bench
  * reported 2–6× on byte-identical code for exactly this reason; the
  * operators now release their own caches, this is defense in depth).
  *
  * Output: stdout carries ONE compact JSON line — total seconds plus the
  * headline per-query map — sized well under the driver's 2000-char tail
  * window so it archives as parseable JSON (the full 110-query map is
  * ~3 KB and was getting head-truncated in r2–r4). The complete per-query
  * map is written to `BENCH_DETAIL.json` in the working directory.
  *
  * Noise hardening (round 6): queries whose first run exceeds
  * `SPARK_GRAFT_RETRY_SEC` (default 3 s) run once more and report the MIN —
  * one retry strips the first-in-JVM cold-JIT penalty and a single unlucky
  * host-contention window (this guest's vCPUs contend with invisible host
  * neighbors; identical-code queries measured 3× apart minutes apart). The
  * JSON carries `probe_sec`, a deterministic CPU burn timed at run
  * start/end, so archived numbers are read with environment quality
  * attached (quiet ≈ 0.2 s; ≥ 0.5 s = contended run, numbers read high).
  *
  * Noise attribution (round 8): endpoint probes proved too coarse — the r7
  * driver run (145.3 s) and a committed same-code archive (121.1 s)
  * disagreed by 24 s while all four endpoint probes read quiet, because
  * contention windows open and close MID-run. Two fixes:
  *   1. a half-length burn now runs AFTER EVERY QUERY and is archived per
  *      query (`probe_by_query` in BENCH_DETAIL.json; quiet ≈ 0.08 s,
  *      ≥ 0.2 s = that query's window was contended and its number reads
  *      high). The stdout line carries the max and the contended count.
  *   2. retried queries whose first two runs disagree by more than
  *      `SPARK_GRAFT_SPREAD` (default 1.5×) run a THIRD time and archive
  *      the min-of-3 — two runs that disagree 1.5× mean at least one raced
  *      contention, and a tie-breaker resolves which.
  * Probe burns are timed outside query timing, so they add wall clock but
  * never inflate the archived per-query or total numbers.
  */
object Bench {

  /** The headline subset for the stdout JSON line: the dedup/similarity
    * chain (the cost centers), both domain pipelines, and one
    * representative per relational family. Full numbers: BENCH_DETAIL.json. */
  private val headline: Set[String] = Set(
    "dd_exact", "dd_incremental", "dd_decontaminate", "dd_minhash_lsh",
    "dd_ngram_jaccard", "dd_containment", "dd_simhash", "dd_simhash_pairs",
    "dd_edit", "dd_edit_gated", "dd_cluster", "dd_embed_neardup", "dd_pipeline",
    "dd_cross_neardup", "dd_cross_indexed", "dd_embed_cross", "dd_cluster_increment",
    "dd_pipeline_increment", "dd_semantic", "dd_substring",
    "sim_topk_brute", "sim_ivf_topk", "sim_knn_join", "sim_pq_topk",
    "laser_pipeline_e2e", "trace_pipeline_e2e",
    "q09_agg_group", "q14_window_chunk", "q37_sketches", "q42_recursive_cte",
    "q46_bloom_join", "txt_tfidf", "txt_pipeline", "txt_repetition",
    "mm_decode_real", "evt_sliding")

  /** FROZEN cross-round comparison subset: the r7-era 27-query headline,
    * never to be edited again. The full-catalog total grows with coverage
    * (122 → 130 → 135 queries) and is incomparable across rounds; this
    * fixed subset's sum (`subset_r7_sec`) is the like-for-like number —
    * r7 measured it at 90.7 s, the r9 builder archive at 59.6 s. */
  private val r7Subset: Set[String] = Set(
    "dd_exact", "dd_incremental", "dd_decontaminate", "dd_minhash_lsh",
    "dd_ngram_jaccard", "dd_containment", "dd_simhash", "dd_simhash_pairs",
    "dd_edit", "dd_cluster", "dd_embed_neardup", "dd_pipeline",
    "sim_topk_brute", "sim_ivf_topk", "sim_knn_join",
    "laser_pipeline_e2e", "trace_pipeline_e2e",
    "q09_agg_group", "q14_window_chunk", "q37_sketches", "q42_recursive_cte",
    "q46_bloom_join", "txt_tfidf", "txt_pipeline", "txt_repetition",
    "mm_decode_real", "evt_sliding")

  /** Deterministic single-thread arithmetic burn, timed — a host-CPU-noise
    * probe. This guest's vCPUs contend with invisible host neighbors
    * (virtualized, zero reported steal): identical-code queries measured
    * 3× apart within minutes while an equivalent burn swung ~2.5× in step.
    * Emitting the probe alongside the numbers lets any archived run be
    * read with its environment quality attached. */
  private def noiseProbe(iters: Long = 300000000L): Double = {
    val t0 = System.nanoTime()
    var s = 0L
    var i = 0L
    while (i < iters) { s += i * i; i += 1 }
    if (s == 42L) System.err.println("") // keep the loop live (stdout stays one JSON line)
    (System.nanoTime() - t0) / 1e9
  }

  /** Per-query probe: half the endpoint burn so 114 back-to-back probes
    * cost ~10 s wall on a quiet host instead of ~20. Quiet ≈ 0.08 s;
    * readings at or above this threshold mean the query that just finished
    * raced host contention and its archived time reads high. */
  private val perQueryProbeIters = 150000000L
  private val probeContendedSec = 0.2

  /** PARALLEL noise probe: the same burn on every vCPU at once, reporting
    * the SLOWEST thread's seconds. Round-9 lesson: the r8 driver bench
    * archived the dd chain at ~10× its quiet-host cost (dd_edit 77.5 s vs
    * 8.0 s on identical code+data+settings re-run later) while every
    * SINGLE-thread probe read quiet (max 0.185) — contention that steals
    * whole cores or memory bandwidth leaves a lone arithmetic thread
    * untouched and only shows up when all vCPUs demand cycles at once,
    * exactly what a 32-thread Spark stage does. Quiet ≈ the single-thread
    * reading (~0.15 s for the half burn); a multiple of it means the
    * measured queries ran against a host that could not actually deliver
    * `cpus` cores, and the archived numbers read high by roughly that
    * factor. */
  private def parallelNoiseProbe(threads: Int, iters: Long = 150000000L): Double = {
    val times = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val pool = (0 until threads).map { _ =>
      new Thread(() => {
        val t0 = System.nanoTime()
        var s = 0L
        var i = 0L
        while (i < iters) { s += i * i; i += 1 }
        if (s == 42L) System.err.println("")
        times.add((System.nanoTime() - t0) / 1e9); ()
      })
    }
    pool.foreach(_.start())
    pool.foreach(_.join())
    var mx = 0.0
    times.forEach(t => mx = math.max(mx, t))
    mx
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Queries whose first run exceeds this re-run once and report the MIN:
    // one retry strips both the first-in-JVM cold-JIT/codegen penalty and a
    // single unlucky host-contention window, while sub-threshold queries
    // (the bulk of the catalog) stay single-shot so the full run's wall
    // time grows only by the handful of heavy queries.
    val retrySec = sys.env.getOrElse("SPARK_GRAFT_RETRY_SEC", "3.0").toDouble
    // First two runs of a retried query disagreeing by more than this ratio
    // trigger a third run (archived value = min of all runs): a 1.5× spread
    // on identical code means at least one run raced host contention.
    val spreadRatio = sys.env.getOrElse("SPARK_GRAFT_SPREAD", "1.5").toDouble
    // Round-9 lesson: the r9 driver archive carried `contended: []` and
    // quiet per-query probes next to 8× spreads on back-to-back identical
    // runs (dd_edit_gated 9.7/78.1/28.4) — bursty starvation opens and
    // closes INSIDE a query run, between probes. The runs themselves are
    // the most direct contention sensor we have: identical code+data
    // disagreeing by more than this ratio means at least one run raced
    // contention, so the query is flagged contended regardless of what the
    // probes read.
    val contendedSpread = sys.env.getOrElse("SPARK_GRAFT_RUNSPREAD", "2.0").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warmup: prime codegen/JIT and the page cache so the first timed query
    // doesn't absorb session startup.
    Tables.names.foreach(t => Tables(spark, sfDir, t).count())
    // Optional args: bench only the named queries (local iteration; the
    // driver always runs the full catalog).
    val only = args.toSet
    val probeStart = noiseProbe()
    val parProbeStart = parallelNoiseProbe(cpus.toInt)
    def once(q: QueryDef): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { q.build(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // Per-query isolation: drop anything a query left registered in the
      // cache manager before the next measurement starts. clearCache only
      // covers cache-manager entries — localCheckpoint RDD blocks and
      // broadcast variables are reclaimed by ContextCleaner ONLY once GC
      // collects their references, so without the explicit GC a 110-query
      // session accumulates storage blocks and broadcasts between GC
      // cycles and later queries inflate nondeterministically (r5 measured
      // the dd chain 2.5x its isolated cost in-session).
      spark.catalog.clearCache()
      System.gc()
      // -1 sentinel: a failed query must not pass off its near-zero elapsed
      // time as a perf win in the archived JSON
      if (ok) sec else -1.0
    }
    // (name, archived sec, all runs when retried, post-query probe) — the
    // full run list is archived alongside the min so cross-round
    // comparisons can separate operator gains from retry-policy effects,
    // and the probe attaches environment quality to each measurement.
    case class QueryResult(name: String, sec: Double, runs: Seq[Double],
      probe: Double, probePar: Double, builds: Map[String, Double],
      fixtures: Map[String, Double])
    NorthStarQueries.buildSecs.clear()
    NorthStarQueries.fixtureSecs.clear()
    val results: Seq[QueryResult] = SparkEntry.catalog
      .filter(q => only.isEmpty || only(q.name))
      .map { q =>
        val first = once(q)
        // Drain one-time cachedArtifact builds NOW: they land inside the
        // FIRST run by design (fingerprint-cached thereafter), so both the
        // retry decision and the third-run spread test must compare the
        // build-adjusted first run — otherwise a driver cold run pays a
        // wasted multi-second tie-breaker per artifact-building query
        // (r9 cold 12.2 s vs warm 4.2 s reads as a 2.9x "spread").
        val buildsFirst = {
          import scala.jdk.CollectionConverters._
          val m = NorthStarQueries.buildSecs.asScala.toMap
          NorthStarQueries.buildSecs.clear()
          m
        }
        val firstAdj =
          if (first >= 0) math.max(first - buildsFirst.values.sum, 0.0) else first
        val runs: Seq[Double] =
          if (firstAdj > retrySec) {
            val second = once(q)
            val both = Seq(first, second)
            val cmp = Seq(firstAdj, second).filter(_ >= 0)
            // Third run only when the two VALID runs disagree by more
            // than the spread ratio — agreement means either number is
            // trustworthy and a tie-breaker would be wasted wall clock.
            if (cmp.size == 2 && cmp.max / math.max(cmp.min, 1e-9) > spreadRatio)
              both :+ once(q)
            else both
          } else Seq(first)
        val valid = runs.filter(_ >= 0)
        val sec = if (valid.isEmpty) -1.0 else valid.min
        // Any builds recorded by later runs (none in the normal fingerprint
        // flow) merge into the same attribution map archived as build_sec.
        val builds = buildsFirst ++ {
          import scala.jdk.CollectionConverters._
          val m = NorthStarQueries.buildSecs.asScala.toMap
          NorthStarQueries.buildSecs.clear()
          m
        }
        // Per-run fixture splits (paid on EVERY run — can't create spread).
        val fixtures = {
          import scala.jdk.CollectionConverters._
          val m = NorthStarQueries.fixtureSecs.asScala.toMap
          NorthStarQueries.fixtureSecs.clear()
          m
        }
        QueryResult(q.name, sec, runs, noiseProbe(perQueryProbeIters),
          parallelNoiseProbe(cpus.toInt, perQueryProbeIters), builds, fixtures)
      }
    val probeEnd = noiseProbe()
    val parProbeEnd = parallelNoiseProbe(cpus.toInt)
    // Locale.ROOT formatting: the f-interpolator uses the JVM default
    // locale — a comma-decimal locale would emit invalid JSON.
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    val timings = results.map(r => (r.name, r.sec))
    val total = timings.map(_._2).filter(_ >= 0).sum
    // probe_sec: the host-noise burn at run start/end (see noiseProbe) —
    // quiet ≈ 0.2 s on this guest; readings ≥ 0.5 s mean the run raced
    // invisible host contention and its numbers read high.
    // probe_par_sec: the all-vCPU burn at run start/end (slowest thread).
    // Quiet ≈ the single-thread half-burn (~0.15 s); a large multiple
    // means the host could not deliver `cpus` cores during this run and
    // every archived number reads high by roughly that factor — the
    // contention mode the single-thread probes missed in r8.
    val probes = s""""probe_sec":[${num(probeStart)},${num(probeEnd)}],"probe_par_sec":[${num(parProbeStart)},${num(parProbeEnd)}]"""
    // first_sec: the pre-retry first-run time of every retried query, so
    // the retry policy's effect is visible per query in the archive.
    val firsts = qmap(results.collect { case r if r.runs.size > 1 => r.name -> r.runs.head })
    // runs_sec: the complete run list of every retried query (2 or 3
    // entries; -1 marks a failed run) — min-of-3 decisions stay auditable.
    def arr(vs: Seq[Double]): String = vs.map(num).mkString("[", ",", "]")
    val runsJson = results.collect { case r if r.runs.size > 1 => "\"" + r.name + "\":" + arr(r.runs) }
      .mkString("{", ",", "}")
    // probe_by_query: the half-burn reading taken immediately after each
    // query's runs (quiet ≈ 0.08 s; ≥ 0.2 s = contended window, that
    // query's number reads high). This is what the endpoint probes missed:
    // contention opening and closing mid-run.
    val probeByQuery = qmap(results.map(r => (r.name, r.probe)))
    // probe_par_by_query: the all-vCPU burn after each query (slowest
    // thread). The r8 contention mode — whole cores / memory bandwidth
    // stolen while a lone arithmetic thread reads quiet — shows up HERE.
    // Quiet tracks the single-thread probe; a multiple of it means that
    // query's archived time reads high by roughly that factor.
    val probeParByQuery = qmap(results.map(r => (r.name, r.probePar)))
    // Contended = probe-flagged (the burn raced contention right after the
    // query) OR run-spread-flagged (the query's own identical reruns
    // disagreed > contendedSpread — the r9 mode where starvation lived
    // entirely inside runs and every probe read quiet). Either way the
    // archived min may still read high; the flag says "distrust this row".
    def runSpreadFlag(r: QueryResult): Boolean = {
      // One-time cachedArtifact builds land inside the FIRST run by design
      // (fingerprint-cached thereafter); subtract them before the spread
      // test so a driver cold run's build cost doesn't read as contention —
      // it's archived separately in build_sec.
      val adjusted = r.runs match {
        case first +: tail if first >= 0 =>
          math.max(first - r.builds.values.sum, 0.0) +: tail
        case other => other
      }
      val valid = adjusted.filter(_ >= 0)
      valid.size >= 2 && valid.max / math.max(valid.min, 1e-9) > contendedSpread
    }
    val contended = results
      .filter(r => r.probe >= probeContendedSec || r.probePar >= 3 * probeContendedSec ||
        runSpreadFlag(r))
      .map(_.name)
    val contendedJson = contended.map("\"" + _ + "\"").mkString("[", ",", "]")
    val probeMax = if (results.isEmpty) 0.0 else results.map(_.probe).max
    val probeParMax = if (results.isEmpty) 0.0 else results.map(_.probePar).max
    // Fixed-subset total: the frozen r7-era 27-query headline, the ONLY
    // total comparable across rounds as the catalog grows (r7: 90.7 s).
    val subsetR7 = timings.filter(t => r7Subset(t._1) && t._2 >= 0).map(_._2).sum
    // build_sec: per-query fixture/artifact build cost paid inside benched
    // runs this session (cold-container builds of fingerprint-cached
    // artifacts, curation-loop stage splits) — warm-probe numbers stay the
    // headline; this map explains cold-run asymmetry.
    val buildJson = results.filter(_.builds.nonEmpty)
      .map(r => "\"" + r.name + "\":" +
        qmap(r.builds.toSeq.sortBy(_._1)))
      .mkString("{", ",", "}")
    // fixture_sec: PER-RUN fixture splits (stream state seeding, temp index
    // builds, loop/batch attribution) — e.g. dd_curation_stream's row is
    // fixture + loop; `curation-batch-max` is its steady-state per-batch
    // cost, the number that actually scales with arriving data.
    val fixtureJson = results.filter(_.fixtures.nonEmpty)
      .map(r => "\"" + r.name + "\":" +
        qmap(r.fixtures.toSeq.sortBy(_._1)))
      .mkString("{", ",", "}")
    val detail =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","subset_r7_sec":${num(subsetR7)},"queries":${qmap(timings)},"first_sec":$firsts,"runs_sec":$runsJson,"build_sec":$buildJson,"fixture_sec":$fixtureJson,"probe_by_query":$probeByQuery,"probe_par_by_query":$probeParByQuery,"contended":$contendedJson,$probes,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (detail + "\n").getBytes("UTF-8"))
    val head = timings.filter(r => headline(r._1))
    // Stdout stays one compact line: endpoint probes plus a two-number
    // summary of the per-query probes (max + contended-count) — the full
    // per-query probe map lives in BENCH_DETAIL.json.
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","subset_r7_sec":${num(subsetR7)},"queries":${qmap(head)},$probes,"probe_q_max":${num(probeMax)},"probe_par_q_max":${num(probeParMax)},"probe_q_contended":${contended.size},"detail":"BENCH_DETAIL.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
