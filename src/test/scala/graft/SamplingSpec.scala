package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends TestBase {

  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("id")

  test("hashSample: deterministic, invariant under repartitioning, ~pct sized") {
    val d = ids(2000)
    val a = Sampling.hashSample(d, col("id"), 10).as[Long].collect().toSet
    val b = Sampling.hashSample(d.repartition(13), col("id"), 10)
      .as[Long].collect().toSet
    assert(a == b, "sample membership must be a pure row property")
    // ~10% with slack for hash variance
    assert(a.size > 120 && a.size < 280, s"got ${a.size} of 2000 at pct=10")
    // monotone: a 10% sample is a subset of a 20% sample (same buckets)
    val c = Sampling.hashSample(d, col("id"), 20).as[Long].collect().toSet
    assert(a.subsetOf(c))
  }

  test("stratifiedSample: per-stratum rates, absent strata dropped") {
    val d = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "grp")
    val got = Sampling.stratifiedSample(d, col("grp"), col("id"),
        Map("s0" -> 100, "s1" -> 30))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(got("s0") == 100L)            // rate 100 of 100 → everything kept
    assert(got.get("s2").isEmpty)        // not in the map → dropped
    assert(got("s1") > 10 && got("s1") < 60) // ~30%
    // rates outside [0, buckets] fail loudly
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(d, col("grp"), col("id"), Map("s0" -> 101))
    }
  }

  test("tokenMixtureSample: token shares track weights; short-doc strata get more docs") {
    // a: 1000 docs x 100 tok; b: 1000 docs x 10 tok — equal doc counts,
    // 10x token skew. Weights .5/.5, budget 20k → rates a 10%/b 100%:
    // b keeps ~10x MORE DOCS than a for the same token share (the thing
    // a doc-count mixture gets wrong by that same 10x).
    val d = ((0L until 1000L).map(i => (i, "a", 100L)) ++
        (1000L until 2000L).map(i => (i, "b", 10L)))
      .toDF("id", "grp", "tok")
    val got = Sampling.tokenMixtureSample(d, col("grp"), col("id"), col("tok"),
        Map("a" -> 0.5, "b" -> 0.5), budget = 20000L)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("tok")).as("t"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("b") == ((1000L, 10000L)), s"binding stratum kept whole: $got")
    val (na, ta) = got("a")
    assert(ta > 8000 && ta < 12000, s"a's token share ~10k: $got")
    assert(na * 5 < got("b")._1, s"a must keep far fewer docs than b: $got")
    // achievability scale-down: weight 0.9 on b (9k tokens available per
    // 0.9 → B = floor(10000/0.9) = 11111 < 20000 asked)
    val sc = Sampling.tokenMixtureSample(d, col("grp"), col("id"), col("tok"),
        Map("a" -> 0.1, "b" -> 0.9), budget = 20000L)
      .agg(sum(col("tok"))).as[Long].head()
    assert(sc < 13000, s"realized budget must scale down to achievability: $sc")
    // pure row property: stable under repartitioning
    val s1 = Sampling.tokenMixtureSample(d, col("grp"), col("id"), col("tok"),
        Map("a" -> 0.5, "b" -> 0.5), budget = 5000L).select("id").as[Long].collect().toSet
    val s2 = Sampling.tokenMixtureSample(d.repartition(7), col("grp"), col("id"),
        col("tok"), Map("a" -> 0.5, "b" -> 0.5), budget = 5000L)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2)
    intercept[IllegalArgumentException] {
      Sampling.tokenMixtureSample(d, col("grp"), col("id"), col("tok"),
        Map("a" -> 0.7, "b" -> 0.7), budget = 1000L)
    }
  }

  test("mixtureSample: output approximates target proportions; binding stratum whole") {
    // 6000 a / 2000 b / 400 c; targets a .4 / b .4 / c .2 → caps 15000 /
    // 5000 / 2000 → N = 2000 (c binding, kept whole): a→800, b→800, c→400.
    val d = ((0L until 6000L).map(i => (i, "a")) ++
        (6000L until 8000L).map(i => (i, "b")) ++
        (8000L until 8400L).map(i => (i, "c")))
      .toDF("id", "grp")
    val got = Sampling.mixtureSample(d, col("grp"), col("id"),
        Map("a" -> 0.4, "b" -> 0.4, "c" -> 0.2))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(got("c") == 400L, s"binding stratum must be kept whole: $got")
    // hash sampling: expect within ±20% of the derived 800
    assert(got("a") > 640 && got("a") < 960, s"a out of band: $got")
    assert(got("b") > 640 && got("b") < 960, s"b out of band: $got")
    // membership is a pure row property (stable under repartitioning)
    val a1 = Sampling.mixtureSample(d, col("grp"), col("id"),
        Map("a" -> 0.4, "b" -> 0.4, "c" -> 0.2)).select("id").as[Long].collect().toSet
    val a2 = Sampling.mixtureSample(d.repartition(7), col("grp"), col("id"),
        Map("a" -> 0.4, "b" -> 0.4, "c" -> 0.2)).select("id").as[Long].collect().toSet
    assert(a1 == a2)
    // strata absent from the target mixture drop
    val e = Sampling.mixtureSample(d, col("grp"), col("id"), Map("a" -> 1.0))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(e.keySet == Set("a"))
    // invalid targets fail loudly
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(d, col("grp"), col("id"), Map("a" -> 0.7, "b" -> 0.7))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(d, col("grp"), col("id"), Map("a" -> 0.0))
    }
  }

  test("temperatureSample: smallest stratum whole, larger ones flatten toward it") {
    // 6400 a / 400 b / 100 c at α=0.5: m = sqrt(100·n) → a 800, b 200, c 100
    val d = ((0L until 6400L).map(i => (i, "a")) ++
        (6400L until 6800L).map(i => (i, "b")) ++
        (6800L until 6900L).map(i => (i, "c")))
      .toDF("id", "grp")
    val got = Sampling.temperatureSample(d, col("grp"), col("id"))
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(got("c") == 100L, s"smallest stratum must be kept whole: $got")
    assert(got("a") > 640 && got("a") < 960, s"a ~800 of 6400: $got")
    assert(got("b") > 160 && got("b") < 240, s"b ~200 of 400: $got")
    // α = 1 is a no-op (threshold = buckets for every stratum)
    assert(Sampling.temperatureSample(d, col("grp"), col("id"), alpha = 1.0)
      .count() == 6900L)
    // flattening is monotone in α: lower α keeps less of the big stratum
    val cold = Sampling.temperatureSample(d, col("grp"), col("id"), alpha = 0.25)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(cold("a") < got("a") && cold("c") == 100L)
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(d, col("grp"), col("id"), alpha = 0.0)
    }
  }

  test("mixtureResample: upsampling epochs + fractional gate hit the target mixture") {
    // 900 a / 100 b, targets 50/50 over the same total (1000): a needs
    // f = 500/900 ≈ 0.556 (downsample, epoch 0 only); b needs f = 5.0
    // (exactly 5 full epochs 0..4, empty fractional epoch).
    val d = ((0L until 900L).map(i => (i, "a")) ++
        (900L until 1000L).map(i => (i, "b"))).toDF("id", "grp")
    val out = Sampling.mixtureResample(d, col("grp"), col("id"),
      Map("a" -> 0.5, "b" -> 0.5))
    val agg = out.groupBy("grp")
      .agg(count(lit(1)).as("rows"), countDistinct(col("id")).as("ids"),
        max(col("epoch")).as("maxep"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(agg("b") == ((500L, 100L, 4L)), s"b must repeat exactly 5 epochs: $agg")
    val (aRows, aIds, aMax) = agg("a")
    assert(aMax == 0L && aRows == aIds, "a only downsamples — no duplicates")
    assert(aRows > 400 && aRows < 600, s"a ~500 of 900: $aRows")
    // epochs of an upsampled row are contiguous from 0 (interleavable)
    val epochsOfOneB = out.where(col("id") === 950L).select("epoch")
      .as[Long].collect().sorted.toSeq
    assert(epochsOfOneB == Seq(0L, 1L, 2L, 3L, 4L))
    // strata absent from the mixture drop
    assert(Sampling.mixtureResample(d, col("grp"), col("id"), Map("a" -> 1.0))
      .where(col("grp") === "b").count() == 0)
    // amplification guard: a mixture demanding > maxEpochs repeats of a
    // tiny stratum fails fast instead of exploding the output
    val tiny = ((0L until 999L).map(i => (i, "a")) :+ ((999L, "c")))
      .toDF("id", "grp")
    val ex = intercept[Exception] {
      Sampling.mixtureResample(tiny, col("grp"), col("id"),
        Map("a" -> 0.5, "c" -> 0.5), maxEpochs = 100).count()
    }
    assert(ex.getMessage.contains("mixtureResample") ||
      Option(ex.getCause).exists(_.getMessage.contains("mixtureResample")))
  }

  test("tokenMixtureSample: a weight key naming an absent stratum fails fast") {
    val d = ((0L until 50L).map(i => (i, "a", "w w w")) ++
        (50L until 100L).map(i => (i, "b", "w w")))
      .toDF("id", "grp", "text")
    val tok = size(split(col("text"), " ")).cast("long")
    // all keys present: fine
    Sampling.tokenMixtureSample(d, col("grp"), col("id"), tok,
      Map("a" -> 0.5, "b" -> 0.5), budget = 100L).count()
    // typo'd stratum name: its budget share must not silently vanish
    val ex = intercept[Exception] {
      Sampling.tokenMixtureSample(d, col("grp"), col("id"), tok,
        Map("a" -> 0.5, "c" -> 0.5), budget = 100L).count()
    }
    assert(ex.getMessage.contains("tokenMixtureSample") ||
      Option(ex.getCause).exists(_.getMessage.contains("tokenMixtureSample")))
    // ZERO matching keys (the r14 ADVICE hole): the pre-r15 guard rode the
    // data-side relation, which is EMPTY here, so it never evaluated and
    // the operator silently returned empty — the exact typo'd-name mode
    // it claimed to close. The weight-list-driven guard must raise.
    val ex0 = intercept[Exception] {
      Sampling.tokenMixtureSample(d, col("grp"), col("id"), tok,
        Map("x" -> 0.5, "y" -> 0.5), budget = 100L).count()
    }
    assert(ex0.getMessage.contains("tokenMixtureSample") ||
      Option(ex0.getCause).exists(_.getMessage.contains("tokenMixtureSample")))
  }

  test("mixtureSample / mixtureResample: typo'd target keys fail fast (keyedMixture parity)") {
    val d = (0L until 100L).map(i => (i, if (i < 50) "a" else "b"))
      .toDF("id", "grp")
    // all keys present: fine
    Sampling.mixtureSample(d, col("grp"), col("id"),
      Map("a" -> 0.5, "b" -> 0.5)).count()
    Sampling.mixtureResample(d, col("grp"), col("id"),
      Map("a" -> 0.5, "b" -> 0.5)).count()
    val e1 = intercept[Exception] {
      Sampling.mixtureSample(d, col("grp"), col("id"),
        Map("a" -> 0.5, "c" -> 0.5)).count()
    }
    assert(e1.getMessage.contains("mixtureSample") ||
      Option(e1.getCause).exists(_.getMessage.contains("mixtureSample")))
    val e2 = intercept[Exception] {
      Sampling.mixtureResample(d, col("grp"), col("id"),
        Map("a" -> 0.5, "c" -> 0.5)).count()
    }
    assert(e2.getMessage.contains("mixtureResample") ||
      Option(e2.getCause).exists(_.getMessage.contains("mixtureResample")))
  }

  test("tokenMixtureResample: a target key naming an absent stratum fails fast") {
    val d = ((0L until 50L).map(i => (i, "a", "w w w")) ++
        (50L until 100L).map(i => (i, "b", "w w")))
      .toDF("id", "grp", "text")
    val tok = size(split(col("text"), " ")).cast("long")
    Sampling.tokenMixtureResample(d, col("grp"), col("id"), tok,
      Map("a" -> 0.5, "b" -> 0.5)).count()
    // a typo'd key previously dropped out of withP silently, shrinking the
    // targeted total T — inconsistent with tokenMixtureSample's posture
    val ex = intercept[Exception] {
      Sampling.tokenMixtureResample(d, col("grp"), col("id"), tok,
        Map("a" -> 0.5, "c" -> 0.5)).count()
    }
    assert(ex.getMessage.contains("tokenMixtureResample") ||
      Option(ex.getCause).exists(_.getMessage.contains("tokenMixtureResample")))
  }

  test("tokenMixtureResample: factors on token mass; doc-count factors misallocate") {
    // stratum a: 10 docs × 100 tokens (1,000 tokens); stratum b: 100 docs
    // × 10 tokens (1,000 tokens). Targets 50/50 are ALREADY met in token
    // mass — the token form leaves both strata at exactly one epoch-0
    // copy (f = 0.5·2000/1000 = 1.0 exactly: one full epoch, empty
    // fractional). The doc-count form computes f_a = 0.5·110/10 = 5.5
    // from doc share and over-repeats a's token mass ~5× — the
    // misallocation the token form exists to prevent.
    val d = ((0L until 10L).map(i => (i, "a", Seq.fill(100)("w").mkString(" "))) ++
        (100L until 200L).map(i => (i, "b", Seq.fill(10)("w").mkString(" "))))
      .toDF("id", "grp", "text")
    val tok = size(split(col("text"), " ")).cast("long")
    val out = Sampling.tokenMixtureResample(d, col("grp"), col("id"), tok,
      Map("a" -> 0.5, "b" -> 0.5))
    val agg = out.groupBy("grp")
      .agg(count(lit(1)).as("rows"), sum(tok).as("toks"), max(col("epoch")).as("maxep"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(agg("a") == ((10L, 1000L, 0L)), s"a exactly once: $agg")
    assert(agg("b") == ((100L, 1000L, 0L)), s"b exactly once: $agg")
    // the doc-count form on the same data: a repeats ⌊5.5⌋+fraction
    // epochs — token mass ~5×500-tokens-worth over-allocated
    val docForm = Sampling.mixtureResample(d, col("grp"), col("id"),
      Map("a" -> 0.5, "b" -> 0.5))
    val aToks = docForm.where(col("grp") === "a").agg(sum(tok)).as[Long].collect().head
    assert(aToks >= 5000L, s"doc-count factors over-repeat the long stratum: $aToks")
    // determinism under repartitioning (pure row property + broadcast factors)
    val again = Sampling.tokenMixtureResample(d.repartition(7), col("grp"),
        col("id"), tok, Map("a" -> 0.5, "b" -> 0.5))
      .select(col("id"), col("epoch")).as[(Long, Long)].collect().toSet
    assert(again == out.select(col("id"), col("epoch"))
      .as[(Long, Long)].collect().toSet)
  }

  test("clusterSplit: no cluster ever spans folds; singletons split on their id") {
    // 300 docs; docs 0..29 form 10 clusters of 3 (labels point at the min)
    val docs = (0L until 300L).toDF("doc_id")
    val labels = (0L until 30L).map(i => (i, i / 3 * 3)).toDF("doc_id", "cluster_id")
    val out = Sampling.clusterSplit(docs, labels,
      Seq(("train", 80), ("val", 90), ("test", 100)))
    assert(out.count() == 300, "split must assign every doc exactly once")
    // leak-freedom: each cluster maps to exactly one fold
    val perCluster = out.join(labels, "doc_id")
      .groupBy("cluster_id").agg(countDistinct(col("fold")).as("nf"))
      .select("nf").as[Long].collect()
    assert(perCluster.nonEmpty && perCluster.forall(_ == 1L),
      "a near-dup cluster must land whole in one fold")
    // singletons use their own id as split key
    val single = out.where(col("doc_id") === 200L)
      .select("split_key").as[Long].head()
    assert(single == 200L)
    // pure row property: fold of a doc is unchanged when other docs arrive
    val fewer = Sampling.clusterSplit(docs.where(col("doc_id") < 100),
      labels, Seq(("train", 80), ("val", 90), ("test", 100)))
    val a = out.where(col("doc_id") < 100).select("doc_id", "fold")
    assert(a.except(fewer.select("doc_id", "fold")).isEmpty)
    // ~80/10/10 with hash slack
    val sizes = out.groupBy("fold").count().as[(String, Long)].collect().toMap
    assert(sizes("train") > 200 && sizes("test") > 10 && sizes("val") > 10, s"$sizes")
  }

  test("clusterSplit: rejects non-exhaustive or unordered folds") {
    val docs = (0L until 10L).toDF("doc_id")
    val labels = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    intercept[IllegalArgumentException] {
      Sampling.clusterSplit(docs, labels, Seq(("train", 80), ("val", 90)))
    }
    intercept[IllegalArgumentException] {
      Sampling.clusterSplit(docs, labels, Seq(("train", 90), ("val", 80), ("t", 100)))
    }
  }

  test("shardOrder: deterministic permutation, dense per-shard positions") {
    val d = (0L until 500L).toDF("doc_id")
    val out = Sampling.shardOrder(d, col("doc_id"), 8).cache()
    // positions are dense 1..n_shard within every shard
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min(col("pos")).as("mn"), max(col("pos")).as("mx"))
      .where(col("mn") =!= 1L || col("mx") =!= col("n"))
    assert(bad.isEmpty, "per-shard positions must be dense 1..n")
    // invariant under repartitioning (cluster-size independence)
    val out2 = Sampling.shardOrder(d.repartition(13), col("doc_id"), 8)
    assert(out.except(out2).isEmpty && out2.except(out).isEmpty)
    // a different seed is a genuinely different permutation
    val reseeded = Sampling.shardOrder(d, col("doc_id"), 8, seed = "s43")
    assert(out.join(reseeded, Seq("doc_id", "shard", "pos"), "inner").count() < 100,
      "new seed must re-permute")
    out.unpersist()
  }

  test("weightedSample: keeps exactly the rows whose stable draw beats the weight") {
    import spark.implicits._
    val d = (0L until 500L).map(i => (i, (i % 10) / 10.0)).toDF("doc_id", "w")
    val kept = Sampling.weightedSample(d, col("doc_id"), col("w"))
      .select("doc_id").as[Long].collect().toSet
    // brute replication of the draw
    val brute = (0L until 500L).filter { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) / 4294967296.0 < (i % 10) / 10.0
    }.toSet
    assert(kept == brute)
    // weight 0 keeps nothing; weight 1 keeps everything (draw < 1 always)
    assert(Sampling.weightedSample(d, col("doc_id"), lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(d, col("doc_id"), lit(1.0)).count() == 500)
    // pure row property: invariant under repartitioning
    val kept2 = Sampling.weightedSample(d.repartition(7), col("doc_id"), col("w"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == kept)
  }
}
