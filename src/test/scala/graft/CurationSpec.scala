package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Curation, TextPipeline}

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("normalize round-trips the dirtied corpus back to the original") {
    val rows = Curation.normalize(spark, d)
      .as[(Long, Int, Int, Boolean, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._4), "normalize(mess(text)) != text for some doc")
    // messy adds padding + punctuation that normalization must remove
    assert(rows.forall(r => r._3 < r._2), "norm_len must shrink")
  }

  test("lmScore conserves the corpus bigram mass") {
    val scored = Curation.lmScore(spark, d)
    // every document bigram occurrence exists in the corpus LM by
    // construction, so the per-doc n_bigrams must sum to the corpus total
    val perDoc = scored.agg(sum("n_bigrams")).as[Long].head()
    val corpus = TextPipeline.bigramCounts(Tables.documents(spark, d))
      .agg(sum("cnt")).as[Long].head()
    assert(perDoc === corpus)
    // ppb quantization: every doc average is inside the LM's ppb range
    val (lo, hi) = (0L, 1000000000L)
    val avgs = scored.select("avg_ppb").as[Long].collect()
    assert(avgs.forall(a => a >= lo && a <= hi))
  }

  test("stratified sample respects per-stratum rates and is deterministic") {
    val s1 = Curation.stratifiedSample(spark, d)
      .as[(Long, String, Long)].collect()
    val s2 = Curation.stratifiedSample(spark, d)
      .as[(Long, String, Long)].collect()
    assert(s1.toSeq === s2.toSeq, "sampling must be reproducible")
    val rates = Curation.SampleRates.toMap
    s1.foreach { case (id, t, b) =>
      assert(b < rates(t), s"event $id bucket $b >= rate for stratum $t")
    }
    // empirical fraction should be near the configured rate per stratum
    val total = Tables.events(spark, d)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    s1.groupBy(_._2).foreach { case (t, rs) =>
      val frac = rs.length.toDouble / total(t)
      val want = rates(t) / 100.0
      assert(math.abs(frac - want) < 0.1 + want * 0.5,
        f"stratum $t sampled $frac%.3f, wanted ~$want%.3f")
    }
  }

  test("outliers: exact BigInt re-derivation of the 3-sigma test") {
    val got = Curation.outliers(spark, d)
      .as[(Long, String, Double)].collect().map(_._1).toSet
    val ev = Tables.events(spark, d)
      .select("event_id", "event_type", "value")
      .as[(Long, String, Double)].collect()
    def v6(x: Double): BigInt =
      (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(1000000)).toBigInt
    val want = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val vs = rows.map(r => v6(r._3))
      val n = BigInt(rows.length)
      val s = vs.sum
      val q = vs.map(v => v * v).sum
      rows.zip(vs).collect {
        case ((id, _, _), v) if (n * v - s).pow(2) > 9 * (n * q - s * s) => id
      }
    }.toSet
    assert(got === want)
    assert(got.nonEmpty, "fixture should surface some 3-sigma tail")
  }

  test("priority sample: exact size, estimator floor, near-unbiased total") {
    val s1 = Curation.prioritySample(spark, d)
      .as[(Long, String, Double, Double, Double)].collect()
    val s2 = Curation.prioritySample(spark, d)
      .as[(Long, String, Double, Double, Double)].collect()
    assert(s1.toSeq === s2.toSeq, "sampling must be reproducible")
    assert(s1.length === Curation.PriorityK)
    // est_weight = max(w, τ) ≥ w, with one shared τ: every below-τ row
    // reports exactly τ and every above-τ row reports its own weight
    val taus = s1.collect { case (_, _, w, _, est) if est > w => est }.toSet
    assert(taus.size <= 1, s"multiple thresholds: $taus")
    s1.foreach { case (id, _, w, pri, est) =>
      assert(est >= w, s"event $id est $est < weight $w")
      assert(pri >= est, s"event $id priority $pri below threshold $est")
    }
    // DLT unbiasedness: Σ est_weight over the sample estimates the
    // population Σ value with relative sd ≈ 1/√(K−1) ≈ 10%; 40% is
    // 4× headroom on the fixed fixture
    val total = Tables.events(spark, d).agg(sum("value"))
      .as[Double].collect().head
    val estTotal = s1.map(_._5).sum
    assert(math.abs(estTotal - total) / total < 0.4,
      f"estimated $estTotal%.1f vs true $total%.1f")
  }

  test("quality observation reports metrics from the same single pass") {
    val docs = Tables.documents(spark, d)
    val (observed, obs) = Curation.withQualityObservation(docs)
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_rows") === docs.count())
    assert(m("n_empty") === 0L)
    val meanLen = docs.agg(avg(length(col("text")))).as[Double].head()
    assert(math.abs(m("mean_len").asInstanceOf[Double] - meanLen) < 1e-9)
  }

  test("curation pipeline output is deduped, quality-filtered, split-labeled") {
    val out = Curation.curationPipeline(spark, d)
      .as[(Long, Double, String)].collect()
    assert(out.nonEmpty)
    val keepIds = graft.operators.Dedup.exact(spark, d)
      .select("keep_id").as[Long].collect().toSet
    assert(out.forall(r => keepIds.contains(r._1)), "non-survivor leaked")
    assert(out.forall(_._2 >= Curation.PipelineQualityMin))
    assert(out.forall(r => Set("train", "val", "test").contains(r._3)))
    // split assignment matches the standalone splitAssign operator
    val splits = Curation.splitAssign(spark, d)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.forall(r => splits(r._1) === r._3))
  }

  test("contamination counts cross-split shingle overlap per test doc") {
    val splits = Curation.splitAssign(spark, d)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val rows = Curation.contamination(spark, d)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    // exactly one output row per TEST doc, none for train/val
    assert(rows.map(_._1).toSet === splits.filter(_._2 == "test").keySet)
    rows.foreach { case (id, nSh, nOv, ratio, flag) =>
      assert(nOv <= nSh, s"doc $id: overlap $nOv exceeds shingle count $nSh")
      assert(math.abs(ratio - nOv.toDouble / nSh) < 1e-6)
      assert(flag === (nOv >= Curation.ContaminationMinShingles))
    }
    // brute-force cross-check: recompute overlap from raw shingles
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        explode(graft.functions.WordShingles(col("text"), 3)).as("s"))
      .distinct().as[(Long, String)].collect()
    val trainSh = docs.collect {
      case (id, s2) if splits(id) == "train" => s2 }.toSet
    val byDoc = docs.groupBy(_._1)
    rows.take(5).foreach { case (id, nSh, nOv, _, _) =>
      val mine = byDoc(id).map(_._2).toSet
      assert(nSh === mine.size)
      assert(nOv === mine.count(trainSh))
    }
  }

  test("domainRebalance: every source downsampled toward the minority") {
    val rows = Curation.domainRebalance(spark, d)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val minN = rows.map(_._2).min
    rows.foreach { case (src, nDocs, ratePct, nSampled) =>
      assert(ratePct === minN * 100 / nDocs, s"$src rate")
      assert(nSampled <= nDocs)
      // md5 buckets are ~uniform; sampled size must be in the right
      // ballpark of the target (loose: within [0, 2*minN + 5])
      assert(nSampled <= 2 * minN + 5, s"$src oversampled: $nSampled")
    }
    // the minority source keeps everything (rate 100)
    val m = rows.find(_._2 == minN).get
    assert(m._3 === 100L && m._4 === m._2)
  }

  test("qualityPropagation stays within its component's base-score range") {
    import graft.operators.Dedup
    val prop = Curation.qualityPropagation(spark, d)
      .as[(Long, Long, Long)].collect()
    val clusters = Dedup.nearDupClusters(spark, d)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    // exactly the graph members, i.e. the same doc set as the clusters
    assert(prop.map(_._1).toSet === clusters.keySet)
    val q0ByCluster = prop.groupBy(r => clusters(r._1))
      .view.mapValues(rs => (rs.map(_._2).min, rs.map(_._2).max)).toMap
    prop.foreach { case (id, q0, qp) =>
      val (lo, hi) = q0ByCluster(clusters(id))
      // each round is a damped convex combination of neighbor average
      // and own base (with integer truncation, allow 1-unit slack)
      assert(qp >= lo - 1 && qp <= hi + 1,
        s"doc $id: q_prop $qp outside component base range [$lo, $hi]")
      assert(q0 >= 0 && qp >= 0)
    }
  }

  test("redactPii scrubs exactly the salted PII from every doc") {
    val rows = Curation.redactPii(spark, d)
      .as[(Long, Int, Int, Int, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nEmail, nPhone, redLen, clean) =>
      assert(nEmail === 1, s"doc $id: expected 1 salted email")
      assert(nPhone === 1, s"doc $id: expected 1 salted phone")
      assert(redLen > 0)
      assert(clean, s"doc $id: PII survived redaction or text corrupted")
    }
  }

  test("chunkDocs partitions every doc's tokens exactly") {
    val toks = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.functions.WordShingles(col("text"), 1).as("ws"))
      .as[(Long, Seq[String])].collect().toMap
    val chunks = Curation.chunkDocs(spark, d)
      .as[(Long, Int, Int, String)].collect()
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // contiguous indices, sizes sum to the token count, only the last
      // chunk is ragged, each first_tok matches the token array
      assert(sorted.map(_._2) === (0 until cs.length))
      assert(sorted.map(_._3).sum === toks(id).length)
      sorted.init.foreach(c => assert(c._3 === Curation.ChunkTokens))
      sorted.foreach { case (_, idx, _, ft) =>
        assert(ft === toks(id)(idx * Curation.ChunkTokens))
      }
    }
  }

  test("quality selection keeps exactly the top scores above the sketch threshold") {
    import spark.implicits._
    val selected = Curation.selectTopQuality(spark, d)
      .as[(Long, Double, Double)].collect()
    val all = graft.operators.TextAnalysis.quality(spark, d)
      .select("doc_id", "quality").as[(Long, Double)].collect()
    assert(selected.nonEmpty && selected.length < all.length)
    val thr = selected.head._3
    assert(selected.forall(_._3 === thr), "one global threshold")
    // the selected set is exactly the docs at-or-above the threshold:
    // nothing below it selected, nothing at/above it left out
    val selIds = selected.map(_._1).toSet
    all.foreach { case (id, q) =>
      assert(selIds.contains(id) === (q >= thr), s"doc $id at q=$q thr=$thr")
    }
    // and the fraction lands near 1 − SelectQuantile (bin error + ties)
    val frac = selected.length.toDouble / all.length
    assert(frac > 0.1 && frac < 0.35, s"selected fraction $frac")
  }

  test("chunk dedup flags aligned boilerplate across and within docs") {
    import spark.implicits._
    val ct = Curation.ChunkTokens
    val boiler = (0 until 2 * ct).map(i => s"b$i") // 2 full aligned chunks
    // docs 1-3 open with the same 64-token boilerplate, then unique
    // tails; doc 4 repeats ITS OWN first chunk at an aligned offset;
    // doc 5 contains the boilerplate UNALIGNED (off by one token) —
    // exact chunk dedup must not see it (that's the shingle ops' job)
    val docs = Seq(
      (1L, (boiler ++ (0 until 10).map(i => s"t1x$i")).mkString(" ")),
      (2L, (boiler ++ (0 until 10).map(i => s"t2x$i")).mkString(" ")),
      (3L, (boiler ++ (0 until 10).map(i => s"t3x$i")).mkString(" ")),
      (4L, (boiler.take(ct) ++ boiler.take(ct)).mkString(" ")),
      (5L, ("pad" +: boiler).mkString(" "))
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-chunkdd").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val out = Curation.chunkDedup(spark, dir)
        .as[(Long, Long, Long, Long)].collect()
      // chunk 0 of the boilerplate: docs 1,2,3 + TWICE in doc 4 → 5
      // occurrences over 4 docs; chunk 1: docs 1,2,3 → 3 over 3.
      // doc 5's shifted copy contributes to neither.
      assert(out.length === 2)
      val byOcc = out.sortBy(-_._2)
      assert(byOcc(0)._2 === 5L && byOcc(0)._3 === 4L && byOcc(0)._4 === 1L)
      assert(byOcc(1)._2 === 3L && byOcc(1)._3 === 3L && byOcc(1)._4 === 1L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("sequencePack: per-shard offsets are the exact running token sums") {
    val got = Curation.sequencePack(spark, d)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    val L = Curation.PackSeqLen
    // every doc appears exactly once
    assert(got.map(_._1).distinct.length === got.length)
    got.groupBy(_._2).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach {
        case (id, _, seqId, seqOff, nTok, crosses) =>
          assert(seqId === cum / L, s"doc $id seq_id")
          assert(seqOff === cum % L, s"doc $id seq_offset")
          assert(crosses === (cum % L + nTok > L), s"doc $id crosses")
          cum += nTok
      }
    }
    // the fixture packs multiple docs per sequence AND splits some doc
    // across a boundary — both packing regimes exercised
    assert(got.count(_._6) > 0)
    assert(got.groupBy(t => (t._2, t._3)).exists(_._2.length > 1))
  }

  test("outliersMad flags exactly |v - med| > cut * mad under the sketch") {
    import Curation.{MadHistLo, MadHistHi, MadHistBins, MadCut}
    val ev = graft.Tables.events(spark, d)
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    // independent replication of HistQuantileAgg's median: fixed bins,
    // rank = max(ceil(q*tot), 1), within-bin linear interpolation
    def histMedian(xs: Seq[Double]): Double = {
      val w = (MadHistHi - MadHistLo) / MadHistBins
      val cnt = new Array[Long](MadHistBins)
      xs.foreach { x =>
        val b = math.min(math.max(
          math.floor((x - MadHistLo) / w).toLong, 0L), MadHistBins - 1L)
        cnt(b.toInt) += 1
      }
      val r = math.max(math.ceil(0.5 * xs.size).toLong, 1L)
      var cum = 0L; var i = 0
      while (cum + cnt(i) < r) { cum += cnt(i); i += 1 }
      val est = MadHistLo + w * i + w * ((r - cum).toDouble / cnt(i).toDouble)
      BigDecimal(est).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byType = ev.groupBy(_._2)
    val med = byType.map { case (t, xs) => t -> histMedian(xs.toSeq.map(_._3)) }
    val mad = byType.map { case (t, xs) =>
      t -> histMedian(xs.toSeq.map(e => math.abs(e._3 - med(t))))
    }
    val expected = ev.filter { case (_, t, v) =>
      math.abs(v - med(t)) > MadCut * mad(t)
    }.map(_._1).toSet
    val got = Curation.outliersMad(spark, d)
      .select($"event_id").as[Long].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("transitions: counts equal a direct per-user pairing; rows sum to total") {
    val events = graft.Tables.events(spark, d)
      .select($"user_id", $"event_id", $"ts".cast("long").as("tl"),
        $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val expected = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._3, e._2)).sliding(2).collect {
        case Array(a, b) => (a._4, b._4)
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Curation.transitions(spark, d)
      .as[(String, String, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2) -> r._3).toMap === expected)
    got.foreach { case (f, t, n, ppb) =>
      val tot = got.filter(_._1 == f).map(_._3).sum
      assert(ppb === n * 1000000000L / tot, s"$f->$t ppb")
    }
    // each from-row's ppb column sums to ~1e9 (short only by truncation)
    got.groupBy(_._1).foreach { case (f, rows) =>
      val s = rows.map(_._4).sum
      assert(s <= 1000000000L && s > 1000000000L - rows.length,
        s"$f ppb mass $s")
    }
  }

  test("abTest decision equals an exact BigInt z-squared recompute") {
    val events = graft.Tables.events(spark, d)
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    def bucket(uid: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(uid.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md5.take(4).map("%02x".format(_)).mkString, 16) % 100
    }
    val users = events.map(_._1).distinct
    val inA = users.map(u => u -> (bucket(u) < 50)).toMap
    val nA = BigInt(users.count(inA))
    val nB = BigInt(users.size) - nA
    val got = Curation.abTest(spark, d)
      .select($"event_type", $"k_a", $"k_b", $"significant")
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.length === events.map(_._2).distinct.length)
    got.foreach { case (t, ka, kb, sig) =>
      val conv = events.filter(_._2 == t).map(_._1).distinct
      assert(BigInt(conv.count(inA)) === BigInt(ka), s"$t k_a")
      assert(BigInt(conv.count(u => !inA(u))) === BigInt(kb), s"$t k_b")
      val (bKa, bKb) = (BigInt(ka), BigInt(kb))
      val diff = bKa * nB - bKb * nA
      val n = nA + nB
      val k = bKa + bKb
      val expectSig = 625 * diff * diff * n > 2401 * nA * nB * k * (n - k)
      assert(sig === expectSig, s"$t significance")
    }
  }

  test("cusum equals the sequential max(0, S+d) recurrence per user") {
    // independent recompute: run Page's recurrence directly over the
    // per-user (ts, event_id)-ordered stream — the operator's
    // prefix-sum-minus-running-min form must agree exactly
    val events = graft.Tables.events(spark, d)
      .select($"user_id", $"event_id", $"ts".cast("long").as("tl"), $"value")
      .as[(Long, Long, Long, Double)].collect()
    val expected = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      var s = 0L
      es.sortBy(e => (e._3, e._2)).toSeq.flatMap { case (_, id, _, v) =>
        val d6 = math.floor(v * 1000000.0).toLong - Curation.CusumDriftScaled
        s = math.max(0L, s + d6)
        if (s > Curation.CusumThresholdScaled) Some((u, id, s)) else None
      }
    }.toSet
    val got = Curation.cusum(spark, d)
      .select($"user_id", $"event_id", $"cusum_scaled")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty) // fixture actually exercises the alarm path
  }

  test("interarrival: exact log2 histogram of per-user gaps") {
    val ev = Tables.events(spark, d)
      .select($"user_id", unix_micros($"ts"), $"event_id")
      .as[(Long, Long, Long)].collect()
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ts = es.sortBy(e => (e._2, e._3)).map(_._2)
      ts.zip(ts.drop(1)).map { case (a, b) =>
        java.lang.Long.toBinaryString(b - a + 1).length - 1
      }
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Curation.interarrival(spark, d)
      .as[(Int, Long, Long)].collect()
    assert(got.map(r => r._1 -> r._3).toMap === expected)
    got.foreach { case (b, lo, _) => assert(lo === (1L << b) - 1) }
    assert(got.length > 3, "fixture gaps should span several octaves")
  }

  test("diurnal: counts conserve event volume, ppm is the exact share") {
    val rows = Curation.diurnal(spark, d)
      .as[(Int, String, Long, Long)].collect()
    val total = Tables.events(spark, d).count()
    assert(rows.map(_._3).sum === total)
    rows.foreach { case (h, _, n, ppm) =>
      assert(h >= 0 && h <= 23)
      assert(ppm === n * 1000000L / total)
    }
    // truncation loss only: shares sum to within #rows of 1e6
    val ppmSum = rows.map(_._4).sum
    assert(ppmSum <= 1000000L && ppmSum > 1000000L - rows.length)
  }

  test("pathTrigrams = sliding-window recount with deterministic cut") {
    val ev = Tables.events(spark, d)
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(3)
        .filter(_.length == 3).map(w => (w(0), w(1), w(2))).toSeq
    }.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy { case (a, b, c, n) => (-n, a, b, c) }
      .take(Curation.PathTrigramTopN)
    val got = Curation.pathTrigrams(spark, d)
      .as[(String, String, String, Long)].collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("throttle: stacked-count quota audit matches a direct recount") {
    val ev = Tables.events(spark, d)
      .select($"user_id", date_trunc("day", $"ts").cast("long"))
      .as[(Long, Long)].collect()
    val expected = ev.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.groupBy(_._1._1).map { case (u, hrs) =>
        val tot = hrs.map(_._2).sum
        val kept = hrs.map(h => math.min(h._2, Curation.ThrottleMaxPerDay))
          .sum
        u -> ((tot, kept, tot - kept))
      }
    val got = Curation.throttle(spark, d)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === expected)
    // the cap actually bites on the fixture (otherwise the spec is vacuous)
    assert(got.values.exists(_._3 > 0L))
  }

  test("ewma: constant series is its constant, head is bias-corrected") {
    import org.apache.spark.sql.functions._
    // constant per-user series → EWMA equals the constant at EVERY row,
    // including the partial-window head (renormalized denominator)
    val const = spark.range(20)
      .select($"id".as("event_id"), lit(7L).as("user_id"),
        lit(3.5).as("value"))
    val got = Curation.ewmaOn(const).select("ewma").as[Double].collect()
    assert(got.forall(_ === 3.5), got.mkString(","))
    // a single-event user smooths to exactly its own value
    val single = spark.range(1)
      .select($"id".as("event_id"), lit(1L).as("user_id"),
        lit(12.31).as("value"))
    assert(Curation.ewmaOn(single).select("ewma").as[Double].head() === 12.31)
    // recent events dominate: a step 0→100 pulls EWMA above the
    // unweighted trailing mean at the step point
    val step = spark.range(16)
      .select($"id".as("event_id"), lit(2L).as("user_id"),
        when($"id" < 8, 0.0).otherwise(100.0).as("value"))
    val at15 = Curation.ewmaOn(step)
      .filter($"event_id" === 15).select("ewma").as[Double].head()
    assert(at15 === 100.0) // 8 trailing taps are all post-step
    val at8 = Curation.ewmaOn(step)
      .filter($"event_id" === 8).select("ewma").as[Double].head()
    assert(at8 > 50.0 && at8 < 100.0, s"step head $at8")
    // plan: the window is partitioned by user (never global)
    val plan = Curation.ewma(spark, d).queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(,"), plan)
  }

  test("independence: ppm mass model and deviant flags recompute") {
    import org.apache.spark.sql.functions._
    val rows = Curation.independence(spark, d)
      .select("n_obs", "n_hour", "n_type", "ratio_ppm", "deviant")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val total = rows.map(_._1).sum
    rows.foreach { case (obs, nh, nt, ppm, dev) =>
      assert(ppm === obs * total * 1000000L / (nh * nt))
      assert(dev === (ppm < Curation.IndepLowPpm ||
        ppm > Curation.IndepHighPpm))
    }
    // row totals really are row sums of the cell frame
    val byHour = rows.groupBy(_._2).keySet
    assert(byHour.nonEmpty)
  }

  test("forecastEval: mass conserved, pred is the truncating train mean") {
    import org.apache.spark.sql.functions._
    val rows = Curation.forecastEval(spark, d)
      .as[(Int, String, Long, Long, Long, Long, Long)].collect()
    val total = Tables.events(spark, d).count()
    assert(rows.map(r => r._3 + r._6).sum === total,
      "train + held-out must partition the corpus")
    rows.foreach { case (_, _, nTrain, nDays, pred, actual, err) =>
      assert(pred === nTrain / nDays)
      assert(err === math.abs(actual - pred))
    }
    // the backtest is non-trivial: some cells must miss
    assert(rows.exists(_._7 > 0))
  }

  test("basketPairs: lift recomputes from exact counts, bounds hold") {
    import graft.operators.Relational
    val rows = Relational.basketPairs(spark, d)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, nab, na, nb, lift) =>
      assert(a < b)
      assert(nab <= math.min(na, nb), s"$a,$b")
    }
    // lift is centered near 1 for the synthetic independent generator
    val lifts = rows.map(_._6)
    assert(lifts.exists(_ > 0.8) && lifts.exists(_ < 1.2))
  }

  test("lateness: histogram conserves events, planner flag is unique") {
    val rows = Curation.lateness(spark, d)
      .as[(Int, Long, Long, Long, Boolean)].collect()
    val total = Tables.events(spark, d).count()
    assert(rows.map(_._3).sum === total, "buckets must partition events")
    // cum_ppm is monotone and ends at exactly 1e6
    val cums = rows.sortBy(_._1).map(_._4)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last === 1000000L)
    // exactly one recommended bucket, and it is the first ≥ 99.9%
    val rec = rows.filter(_._5)
    assert(rec.length === 1)
    assert(rec.head._4 >= Curation.LatenessCoverPpm)
    assert(rows.filter(_._1 < rec.head._1).forall(
      _._4 < Curation.LatenessCoverPpm))
    // the salt planted SOME late events (or the audit proves nothing)
    assert(rows.exists(r => r._1 >= 0 && r._3 > 0))
  }

  test("outlierAgreement: set arithmetic consistent with both detectors") {
    val rows = Curation.outlierAgreement(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Option[Long])].collect()
    val nSigma = Curation.outliers(spark, d).count()
    val nMad = Curation.outliersMad(spark, d).count()
    assert(rows.map(_._3).sum === nSigma)
    assert(rows.map(_._4).sum === nMad)
    rows.foreach { case (t, n, s, m, both, either, jac) =>
      assert(both <= math.min(s, m), t)
      assert(either === s + m - both, t)
      assert(either <= n, t)
      jac.foreach(j => assert(j === both * 1000000L / either, t))
      assert(jac.isDefined === (either > 0), t)
    }
  }

  test("stateAudit peaks match a brute trailing-window recount") {
    val rows = Curation.stateAudit(spark, d)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    val ev = Tables.events(spark, d)
    val us = ev.select(expr("unix_micros(ts)")).as[Long].collect().sorted
    def brutePeak(ts: Array[Long], h: Long): Long =
      ts.map(t => ts.count(c => c > t - h && c <= t).toLong).max
    assert(rows("stream_dedup")._1 === ev.count())
    assert(rows("stream_dedup")._2 === brutePeak(us, 1800000000L))
    val cus = ev.filter($"event_type" === "click")
      .select(expr("unix_micros(ts)")).as[Long].collect().sorted
    assert(rows("interval_join") === ((cus.length.toLong,
      brutePeak(cus, 600000000L))))
    // one open session per user: keys = peak = #users
    assert(rows("sessionize")._1 === rows("sessionize")._2)
  }

  test("timeToConvert: conversion mass matches a direct recount") {
    val rows = Curation.timeToConvert(spark, d)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    // direct recount of converting users
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val fc = ev.filter($"event_type" === "click")
      .groupBy("user_id").agg(min("us").as("c0"))
    val conv = ev.filter($"event_type" === "purchase")
      .join(fc, "user_id").filter($"us" >= $"c0")
      .select("user_id").distinct().count()
    assert(rows.map(_._3).sum === conv)
    val cums = rows.map(_._4)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last === 1000000L)
  }

  test("mixtureSchedule: tempered shares flatten toward uniform, mass conserved") {
    val rows = Curation.mixtureSchedule(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length > 1, "fixture needs >1 source to temper")
    // ppm shares sum to 1e6 up to one integer-floor ulp per source
    val natSum = rows.map(_._3).sum
    val wSum = rows.map(_._4).sum
    assert(natSum <= 1000000L && natSum > 1000000L - rows.length)
    assert(wSum <= 1000000L && wSum > 1000000L - rows.length)
    // τ=1/2 flattens: the largest domain's tempered share is below its
    // natural share, the smallest domain's is above (strict unless the
    // distribution is already uniform)
    val big = rows.maxBy(_._2); val small = rows.minBy(_._2)
    if (big._2 != small._2) {
      assert(big._4 < big._3, s"largest source not down-weighted: $big")
      assert(small._4 > small._3, s"smallest source not up-weighted: $small")
    }
    // allocation exhausts the budget up to flooring, epochs consistent
    val alloc = rows.map(_._5).sum
    assert(alloc <= Curation.MixtureTokenBudget &&
      alloc > Curation.MixtureTokenBudget - rows.length)
    rows.foreach { r =>
      assert(r._6 === r._5 * 1000000L / r._2, s"epochs_ppm inconsistent: $r")
    }
  }

  test("mixtureDedupShift: conservation and consistency with exact dedup") {
    val rows = Curation.mixtureDedupShift(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._3 <= r._2, s"after > before: $r")
      assert(r._4 === r._2 - r._3)
      assert(r._7 === r._6 - r._5)
    }
    // shifts are zero-sum up to the per-source flooring ulps
    assert(math.abs(rows.map(_._7).sum) <= rows.length)
    // total removed token mass equals the duplicated-copy mass from
    // the exact-dedup report's own numbers
    val docs = Tables.documents(spark, d).select(
      col("doc_id"), col("text"),
      size(graft.functions.WordShingles(col("text"), 1)).cast("long").as("t"))
    val dupMass = docs.groupBy("text")
      .agg((sum("t") - first("t")).as("extra"))
      .agg(sum("extra")).as[Long].head()
    assert(rows.map(_._4).sum === dupMass)
  }

  test("boilerplateStrip removes exactly the planted shared chunk") {
    // three docs share one identical 32-token leading chunk (the planted
    // boilerplate); their tails and the control docs are unique
    val boiler = (1 to Curation.ChunkTokens).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, boiler + " tail one"),
      (2L, boiler + " tail two is longer"),
      (3L, boiler + " tail three"),
      (4L, "a lone control document with few words"),
      (5L, boiler.replace("b1", "x1") + " near miss")) // differs in tok 1
      .toDF("doc_id", "text")
    val rows = Curation.boilerplateStripOn(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
    val byId = rows.map(r => r._1 -> r).toMap
    assert(rows.map(_._1).sorted === Seq(1L, 2L, 3L, 4L, 5L))
    // planted chunk counted once per sharer, 32 tokens removed each
    Seq(1L, 2L, 3L).foreach { id =>
      val (_, n, nb, kept, ppm) = byId(id)
      assert(nb === 1L, s"doc $id boiler chunks")
      assert(kept === n - Curation.ChunkTokens)
      assert(ppm === Curation.ChunkTokens * 1000000L / n)
    }
    // control and near-miss docs keep everything
    Seq(4L, 5L).foreach { id =>
      val (_, n, nb, kept, ppm) = byId(id)
      assert(nb === 0L && kept === n && ppm === 0L, s"doc $id")
    }
  }
}
