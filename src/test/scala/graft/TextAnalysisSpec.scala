package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Invariant checks for text-analysis ops (value-level correctness is the
  * DuckDB oracle's job). */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("qualityBySource: conserves docs, means bounded by min and 1e6") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.qualityBySource(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum === Tables.documents(spark, d).count())
    rows.foreach { case (src, n, mean, mn, low) =>
      assert(n > 0)
      assert(mn <= mean && mean <= 1000000L, s"$src mean $mean vs min $mn")
      assert(low >= 0 && low <= 1000000L)
      if (mn >= TextAnalysis.LowQualityPpm) assert(low === 0L, src)
    }
  }

  test("lengthProfile: buckets conserve docs and tokens, bounds hold") {
    import org.apache.spark.sql.functions._
    val rows = TextAnalysis.lengthProfile(spark, d)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, d)
    assert(rows.map(_._3).sum === docs.count())
    val totTokens = docs.select(
        size(graft.functions.WordShingles(col("text"), 1)).cast("long"))
      .as[Long].collect().sum
    assert(rows.map(_._4).sum === totTokens)
    rows.foreach { case (b, lo, n, t, _, _) =>
      assert(lo === (1L << b))
      // bucket b holds token counts in [2^b, 2^(b+1)) (plus 0 in b=0),
      // so the bucket's token mass is bounded by n * (2^(b+1) - 1)
      assert(t <= n * ((lo << 1) - 1), s"bucket $b mass $t exceeds bound")
      if (b > 0) assert(t >= n * lo, s"bucket $b mass $t below 2^$b floor")
    }
    assert(math.abs(rows.map(_._5).sum - 1000000L) < rows.length + 1)
    assert(math.abs(rows.map(_._6).sum - 1000000L) < rows.length + 1)
  }

  test("bpePairStats: full re-derivation from raw text in plain Scala") {
    val got = TextAnalysis.bpePairStats(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    // independent re-derivation: word freqs over the corpus, adjacent
    // char pairs per distinct word, weighted counts, top-K
    val texts = Tables.documents(spark, d)
      .select("text").as[String].collect()
    val wf = texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      .filter(_._1.length >= 2)
    val pairs = scala.collection.mutable.Map.empty[String, (Long, Long)]
    wf.foreach { case (w, f) =>
      val inWord = (0 until w.length - 1).map(i => w.substring(i, i + 2))
      inWord.groupBy(identity).foreach { case (p, os) =>
        val (occ, words) = pairs.getOrElse(p, (0L, 0L))
        pairs(p) = (occ + f * os.length, words + 1)
      }
    }
    val want = pairs.toSeq.map { case (p, (o, nw)) => (p, o, nw) }
      .sortBy { case (p, o, _) => (-o, p) }.take(TextAnalysis.BpeTopPairs)
    assert(got === want)
  }

  test("token counts: ws tokens <= bpe tokens, every doc covered") {
    val rows = TextAnalysis.tokenCounts(spark, d)
      .as[(Long, Int, Int, Int)].collect()
    assert(rows.length === Tables.documents(spark, d).count())
    rows.foreach { case (id, ws, bpe, chars) =>
      assert(ws > 0 && bpe >= ws, s"doc $id: ws=$ws bpe=$bpe")
      assert(chars > 0)
    }
  }

  test("langid: scores in [0,1], predicted language has the max score") {
    val langs = TextAnalysis.Stopwords.map(_._1)
    TextAnalysis.langId(spark, d).collect().foreach { r =>
      val pred = r.getString(1)
      val scores = langs.indices.map(i => r.getDouble(2 + i))
      scores.foreach(sc => assert(sc >= 0 && sc <= 1))
      val predScore = scores(langs.indexOf(pred))
      assert(predScore === scores.max, s"doc ${r.getLong(0)}")
    }
  }

  test("fingerprint: doc_md5 matches MessageDigest md5 of the text") {
    val doc = Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(doc._2.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 16)
    val got = TextAnalysis.fingerprint(spark, d)
      .filter($"doc_id" === doc._1).select("doc_md5").as[String].head()
    assert(got === expected)
  }

  test("quality: score bounded by construction") {
    val qs = TextAnalysis.quality(spark, d).select("quality").as[Double].collect()
    qs.foreach(q => assert(q >= 0.0 && q <= 1.0))
  }

  test("langIdConfusion: totals cover the corpus, labels are valid") {
    val langs = TextAnalysis.Stopwords.map(_._1).toSet
    val rows = TextAnalysis.langIdConfusion(spark, d)
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, p, n) =>
      // truth labels come from the fixture (may include langs the
      // stopword model doesn't know, e.g. zh); predictions must come
      // from the model's own label set
      assert(t.nonEmpty && langs(p))
      assert(n > 0)
    }
    val total = rows.map(_._3).sum
    assert(total === graft.Tables.documents(spark, d).count())
  }

  test("oovRate: recomputed exactly from raw tokens") {
    val toks = graft.Tables.documents(spark, d)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.explode(
          graft.functions.WordShingles(
            org.apache.spark.sql.functions.col("text"), 1)).as("w"))
      .as[(Long, String)].collect()
    val vocab = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (w, c) => (-c, w) }
      .take(TextAnalysis.OovVocabSize).map(_._1).toSet
    val expected = toks.groupBy(_._1).view.mapValues { ws =>
      (ws.length.toLong, ws.count(t => !vocab(t._2)).toLong)
    }.toMap
    val rows = TextAnalysis.oovRate(spark, d)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length === expected.size)
    rows.foreach { case (id, nTok, nOov, rate) =>
      assert((nTok, nOov) === expected(id), s"doc $id mismatch")
      assert(math.abs(rate - nOov.toDouble / nTok) < 1e-6)
    }
  }

  test("bpeVocab: merge loop matches a plain Scala greedy BPE trainer") {
    // corpus engineered to exercise every semantic corner: an a=a merge
    // with overlapping runs ("aaaa" → [aa, aa]), multi-char-token
    // merges in later rounds, and an (n_occ, a, b) tie at round 4
    val docs = Seq(
      (1L, "aaaa aaaa banana"),
      (2L, "banana band bandana"),
      (3L, "aaaa ab")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bpeVocabOn(docs)
      .as[(Int, String, String, String, Long)].collect().toSeq

    // reference trainer: word multiset → char tokens → greedy merges
    val wordFreq = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    var vocab: Seq[(Vector[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    def applyMerge(toks: Vector[String], a: String, b: String) = {
      val out = Vector.newBuilder[String]
      var k = 0
      while (k < toks.length) {
        if (k + 1 < toks.length && toks(k) == a && toks(k + 1) == b) {
          out += (a + b); k += 2
        } else { out += toks(k); k += 1 }
      }
      out.result()
    }
    val want = (1 to TextAnalysis.BpeMerges).map { i =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for ((toks, f) <- vocab; k <- 0 until toks.length - 1)
        counts((toks(k), toks(k + 1))) += f
      val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      vocab = vocab.map { case (toks, f) => (applyMerge(toks, a, b), f) }
      (i, a + b, a, b, n)
    }
    // round 1 must be the a=a parity case, round 4 the tie-break
    assert(want.head._3 === want.head._4, "fixture lost its a=a case")
    assert(got === want)
  }

  test("ngramNovelty ≡ an independent Scala first-occurrence recompute") {
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
      .as[(Long, String)].collect()
    def h60(sx: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(sx.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val w = TextAnalysis.NoveltyShingleWords
    val docSh: Map[Long, Set[Long]] = docs.map { case (id, t) =>
      val ws = t.split(" +").filter(_.nonEmpty)
      id -> (if (ws.length < w) Set.empty[Long]
             else ws.sliding(w).map(_.mkString(" ")).map(h60).toSet)
    }.toMap
    val firstDoc = docSh.toSeq
      .flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupMapReduce(_._1)(_._2)(math.min)
    val got = TextAnalysis.ngramNovelty(spark, d)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSet === docSh.filter(_._2.nonEmpty).keySet)
    got.foreach { case (id, nSh, nNov, nov) =>
      val ss = docSh(id)
      assert(nSh === ss.size.toLong, s"doc $id shingle count")
      val novel = ss.count(h => firstDoc(h) == id)
      assert(nNov === novel.toLong, s"doc $id novel count")
      assert(math.abs(nov - novel.toDouble / ss.size) < 5e-7, s"doc $id")
    }
    // every distinct shingle is attributed to exactly one doc
    assert(got.map(_._3).sum === firstDoc.size.toLong)
  }

  test("repetition: bigram multiset invariants hold against tokenCounts") {
    val nTok = TextAnalysis.tokenCounts(spark, d)
      .select("doc_id", "n_ws_tokens").as[(Long, Int)].collect().toMap
    val rows = TextAnalysis.repetition(spark, d)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(rows.length === nTok.size)
    rows.foreach { case (id, nBg, top, ratio, flag) =>
      assert(nBg === nTok(id) - 1L, s"doc $id: bigrams != tokens-1")
      assert(top >= 1L && top <= nBg)
      assert(math.abs(ratio - top.toDouble / nBg) < 1e-6)
      assert(flag === (top.toDouble / nBg >= TextAnalysis.RepetitionMaxRatio))
    }
  }

  test("typoPairsOn finds exactly the planted ed-1 pairs (SymSpell recall)") {
    import spark.implicits._
    // planted: substitution, deletion/insertion, and a transposition
    // (ed 2 — must NOT match); plus unrelated words and an ed-2 sub pair
    val vocab = Seq(
      "spark", "sparc",          // substitution   → pair
      "stream", "streams",       // insertion      → pair
      "castle", "castel",        // transposition  → ed 2, no pair
      "window", "widnow",        // transposition  → ed 2, no pair
      "shuffle", "shuffle",      // duplicate input collapses
      "catalyst", "tungsten",    // unrelated
      "edits", "audit")          // ed > 1
    val got = TextAnalysis.typoPairsOn(vocab.toDF("w"))
      .as[(String, String)].collect().toSet
    assert(got === Set(("sparc", "spark"), ("stream", "streams")))

    // brute-force agreement on the customer-name corpus slice
    val names = Tables.load(spark, d, "customer")
      .select($"c_name").as[String].collect().distinct
    def ed1(a: String, b: String): Boolean = {
      if (a == b) false
      else if (a.length == b.length) a.zip(b).count(t => t._1 != t._2) == 1
      else {
        val (s, l) = if (a.length < b.length) (a, b) else (b, a)
        l.length - s.length == 1 && (0 to s.length).exists(i =>
          l.substring(0, i) + l.substring(i + 1) == s)
      }
    }
    val expected = (for {
      x <- names; y <- names if x < y && ed1(x, y)
    } yield (x, y)).toSet
    val gotNames = TextAnalysis.typoPairsOn(
      Tables.load(spark, d, "customer").select($"c_name".as("w")))
      .as[(String, String)].collect().toSet
    assert(gotNames === expected)
    assert(gotNames.nonEmpty)
  }

  test("collocations = staged-lift recompute over raw token streams") {
    val texts = Tables.documents(spark, d)
      .select($"text").as[String].collect()
    val docs = texts.map(_.split(" +").filter(_.nonEmpty).toSeq)
    val toks = docs.flatten
    val uni = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tu = toks.length.toLong
    val bgs = docs.flatMap(ws => ws.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val tb = bgs.length.toLong
    val expected = bgs.groupBy(identity).view
      .mapValues(_.length.toLong).toSeq
      .collect { case ((x, y), n) if n >= TextAnalysis.CollocMinCount =>
        val lift = n * tu / uni(x).toDouble * tu / uni(y) / tb
        (x, y, n, BigDecimal(lift)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (x, y, _, l) => (-l, x, y) }
      .take(TextAnalysis.CollocTopN)
    val got = TextAnalysis.collocations(spark, d)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    // lift really re-ranks: the frequency order and lift order differ
    val byFreq = expected.sortBy { case (x, y, n, _) => (-n, x, y) }
    assert(byFreq.map(e => (e._1, e._2)) !== expected.map(e => (e._1, e._2)))
  }

  test("featureHash matches an independent JVM-md5 recompute") {
    import org.apache.spark.sql.functions._
    // independent reimplementation: JVM MessageDigest md5 over the same
    // whitespace tokens, same 60-bit slice, bucket and sign-parity rule
    def h60(w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val B = TextAnalysis.FhBuckets
    val docs = Tables.documents(spark, d)
      .filter($"doc_id" % TextAnalysis.FhSampleMod === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expected = docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).map { w =>
        val h = h60(w)
        ((id, h % B), if ((h / B) % 2 == 0) 1L else -1L)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 != 0L)
      .map { case ((id, b), v) => (id, b, v) }.toSeq.sorted
    val got = TextAnalysis.featureHash(spark, d)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === expected)
    assert(got.nonEmpty)
    assert(got.forall(r => r._2 >= 0 && r._2 < B))
  }

  test("zipfSpectrum: planted 1/r corpus halves word counts per bucket") {
    // word of rank r appears 256/r times (Zipf s = 1, 200 ranks)
    val freqs = (1 to 200).map(r => s"w$r" -> (256 / r)).filter(_._2 >= 1)
    val text = freqs.flatMap { case (w, f) => Seq.fill(f)(w) }.mkString(" ")
    val got = graft.operators.TextAnalysis
      .zipfSpectrumOn(Seq((1L, text)).toDF("doc_id", "text"))
      .as[(Int, Long, Long, Long, Long, Option[Long])].collect()
    // independent recompute of the exact spectrum
    val byB = freqs.groupBy { case (_, f) =>
      63 - java.lang.Long.numberOfLeadingZeros(f.toLong) }
    val exp = byB.map { case (b, ws) =>
      b -> ((ws.size.toLong, ws.map(_._2.toLong).sum)) }
    got.foreach { case (b, lo, nw, nt, nwn, decay) =>
      assert(lo === (1L << b))
      assert((nw, nt) === exp(b), s"bucket $b")
      val next = exp.get(b + 1).map(_._1).getOrElse(0L)
      assert(nwn === next)
      assert(decay === (if (exp.contains(b + 1)) Some(next * 1000000L / nw)
        else None))
    }
    // the Zipf signature: mid-spectrum decay is near 500000 ppm
    val mid = got.filter(r => r._1 >= 1 && r._1 <= 5).flatMap(_._6)
    assert(mid.nonEmpty && mid.forall(d => d > 300000L && d < 700000L),
      got.mkString("; "))
    // the 1/r law spans many buckets (unlike the flat driver fixture)
    assert(got.length >= 8)
  }
}
