package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Boilerplate-heavy corpus stress for the dedup join strategies
  * (VERDICT r4 item 8): one hyper-frequent shingle with document
  * frequency in the thousands — the real-world "every page carries the
  * same footer" shape that makes the naive inverted-index self-join
  * quadratic (df² fan-out regardless of the Jaccard threshold).
  *
  * Pins BOTH halves of the contract at hostile skew, not fixture-benign
  * skew (fixture max df is 25):
  *  - [[Dedup.jaccardAll]] REFUSES (guard, not detonation);
  *  - [[Dedup.prefixCandidates]] stays df-bounded: the boilerplate
  *    shingle is the most frequent, so the df-ascending prefix order
  *    evicts it from every index prefix and candidates come only from
  *    genuinely co-rare shingles. */
class DedupSkewStressSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val NDocs = 1500 // boilerplate df = 1500 > MaxNaiveShingleDf

  /** Synthetic shingle index: every doc carries the shared boilerplate
    * shingle plus two doc-unique shingles; the last [[Pairs]] docs are
    * planted as identical twins of docs 0..Pairs-1 (all three shingles
    * shared), the only true near-dups. */
  private val Pairs = 10
  private lazy val sh = {
    import spark.implicits._
    (0 until NDocs).flatMap { i =>
      val base = if (i >= NDocs - Pairs) i - (NDocs - Pairs) else i
      Seq((i.toLong, "the same footer boilerplate"),
        (i.toLong, s"unique content alpha $base"),
        (i.toLong, s"unique content beta $base"))
    }.toDF("doc_id", "s")
  }

  test("naive jaccard join refuses a df=1500 boilerplate shingle") {
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardAll(sh, Dedup.JaccardThreshold).count()
    }
    assert(e.getMessage.contains("use jaccardPrefixPairs"))
    assert(e.getMessage.contains("1500"))
  }

  test("containment flags a short doc embedded in a long one; jaccard does not") {
    import spark.implicits._
    // doc 1 = 30 words, doc 2 = those same 30 words + 170 more:
    // every shingle of doc 1 appears in doc 2 → containment = 1.0,
    // while jaccard = 28/198 ≈ 0.14 — far below the 0.8 pair threshold.
    val words = (0 until 200).map(i => s"w$i")
    val docs = Seq(
      (1L, words.take(30).mkString(" ")),
      (2L, words.mkString(" "))).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-containment").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val cont = Dedup.containmentPairs(spark, dir).collect()
      assert(cont.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq === Seq((1L, 2L, 1.0)))
      assert(Dedup.jaccardPairs(spark, dir).count() === 0L)
    } finally {
      spark.catalog.clearCache() // drop the per-dir shingle persist
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("containment-LSH candidates stay bucket-bounded under boilerplate skew") {
    import spark.implicits._
    // Realistic doc shape for banding: every doc carries the shared
    // boilerplate shingle plus 15 unique ones (the naive containment
    // join would still pay the df=1500 boilerplate fan-out — 1.1M rows;
    // this is exactly the corpus its guard refuses). The last 10 docs
    // are full twins of docs 0..9 — the only true containment pairs.
    val n = NDocs
    val shLsh = (0 until n).flatMap { i =>
      val base = if (i >= n - Pairs) i - (n - Pairs) else i
      ("the same footer boilerplate on every page" +:
        (0 until 15).map(k => s"unique content $base token $k")).map(s =>
        (i.toLong, s))
    }.toDF("doc_id", "s")
    val cands = Dedup.minhashCandidatesOn(shLsh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nc = cands.count()
      val quad = n.toLong * (n - 1) / 2
      info(s"band candidates: $nc of $quad possible pairs")
      // bucket-bounded: the boilerplate shingle influences a band key
      // only when it minhashes BOTH rows of the band, so candidates stay
      // orders of magnitude below the df² fan-out the naive join pays
      assert(nc < quad / 20, s"candidate set not bucket-bounded: $nc")
      // and the verify stage returns exactly the planted twins at 1.0 —
      // identical shingle sets band-collide with certainty
      val cont = Dedup.verifyContainmentPairs(shLsh, cands)
        .as[(Long, Long, Double)].collect().toSeq.sorted
      assert(cont === (0 until Pairs)
        .map(b => (b.toLong, (n - Pairs + b).toLong, 1.0)))
    } finally cands.unpersist()
  }

  test("simhash band join refuses a hot 12-bit band bucket") {
    import spark.implicits._
    // 1100 docs with one shared simhash: every 12-bit band bucket holds
    // all 1100 — the linear-occupancy shape a 100x corpus forces on a
    // 4096-bucket band space (occupancy² join fan-out; VERDICT r5)
    val sig = (0 until 1100).map(i => (i.toLong, 0x123456789ABCDEL))
      .toDF("doc_id", "simhash")
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashPairsOn(sig).count()
    }
    assert(e.getMessage.contains("1100"))
    assert(e.getMessage.contains("minhashLsh"))
  }

  test("containment prefix candidates stay df-bounded under boilerplate skew") {
    // sz = 3, t = 3/5 → prefix length = 3 − ⌈1.8⌉ + 1 = 2: each doc
    // indexes its two unique shingles; the boilerplate shingle (most
    // frequent) is evicted from EVERY prefix, so probing the full
    // inverted index — which still contains the df=1500 hot key — emits
    // candidates only where a unique shingle collides: exactly the
    // planted twins. Recall stays complete (pigeonhole on the smaller
    // doc), where the naive containment join refuses this corpus.
    val cands = Dedup.containmentPrefixCandidates(sh, 3, 5)
    assert(cands.count() === Pairs.toLong)
    val pairs = Dedup.verifyContainmentPairs(sh, cands)
    assert(pairs.count() === Pairs.toLong)
    assert(pairs.agg(min("containment")).head().getDouble(0) === 1.0)
  }

  test("prefix candidates stay df-bounded under boilerplate skew") {
    // sz = 3, t = 4/5 → prefix length = 3 − ⌈0.8·3⌉ + 1 = 1: each doc
    // indexes ONLY its rarest shingle. The boilerplate shingle (df 1500,
    // the most frequent) is never indexed, so its 1500²/2 ≈ 1.1M-row
    // fan-out never materializes; candidates are exactly the planted
    // twins colliding on their shared rare shingle.
    val cands = Dedup.prefixCandidates(sh, 4, 5)
    assert(cands.count() === Pairs.toLong)
    // and recall is still complete: the verify stage scores exactly the
    // planted twins at Jaccard 1.0
    val pairs = Dedup.verifyJaccardPairs(sh, cands)
    assert(pairs.count() === Pairs.toLong)
    assert(pairs.agg(min("jaccard")).head().getDouble(0) === 1.0)
  }
}
