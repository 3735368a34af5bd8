package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Invariants + a full Scala re-derivation for the multimodal ops
  * (value-level correctness is the DuckDB oracle's job). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("phashPairs: full average-hash re-derivation in plain Scala") {
    import Multimodal.{PhashSamples => S, PhashMaxHamming}
    val got = Multimodal.phashPairs(spark, d)
      .as[(Long, Long, Int)].collect().toSeq
    // re-derive: image rows are doc_id % 3 == 0 (kind round-robin),
    // payload is the text bytes; 32-sample nearest-neighbor grid, mean
    // threshold by exact integer compare, pack, all-pairs hamming
    val imgs = Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter { case (id, t) => id % 3 == 0 && t.nonEmpty }
    val sigs = imgs.map { case (id, t) =>
      val b = t.getBytes("UTF-8")
      val sv = (0 until S).map(j => b(((j.toLong * (b.length - 1)) / (S - 1)).toInt) & 0xFF)
      val tot = sv.map(_.toLong).sum
      id -> (0 until S).map(j => if (sv(j).toLong * S >= tot) 1L << j else 0L).sum
    }
    val want = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= PhashMaxHamming
    } yield (a, b, h)).sortBy(p => (p._1, p._2))
    assert(got === want)
  }

  test("phash band join refuses a hot 8-bit band bucket") {
    // 1100 identical signatures: every 8-bit band bucket holds all 1100
    // — the linear-occupancy shape a 100x catalog forces on a
    // 256-bucket band space (same hazard class as the text SimHash)
    val sig = (0 until 1100).map(i => (i.toLong, 0x12345678L))
      .toDF("media_id", "sig")
    val e = intercept[IllegalArgumentException] {
      Multimodal.phashPairsOnSigs(sig).count()
    }
    assert(e.getMessage.contains("1100"))
    assert(e.getMessage.contains("widen the bands"))
    // the refusal must name an EXECUTABLE escape (VERDICT r6 item 5)
    assert(e.getMessage.contains("phashPairsWide"))
  }

  test("wide 4 x 15-bit banding is complete at hamming <= 3") {
    // worst case for the pigeonhole: 3 flipped bits spread across 3
    // DIFFERENT bands — the 4th band must still collide; and a 4-bit
    // difference (one flip per band) must be excluded
    val base = 0x0F0F0F0F0F0F0FL
    val three = base ^ (1L << 0) ^ (1L << 15) ^ (1L << 30)
    val four = three ^ (1L << 45)
    val sig = Seq((1L, base), (2L, three), (3L, four))
      .toDF("media_id", "sig")
    val got = Multimodal.phashPairsOnSigs(sig, nBands = 4, bandBits = 15)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 3), (2L, 3L, 1)))
  }

  test("wide phash band join refuses a hot 15-bit band bucket too") {
    // identical 60-bit signatures saturate every 15-bit bucket as well —
    // the guard covers the escape hatch, not just the narrow bands
    val sig = (0 until 1100).map(i => (i.toLong, 0xABCDEF987654321L))
      .toDF("media_id", "sig")
    val e = intercept[IllegalArgumentException] {
      Multimodal.phashPairsOnSigs(sig, nBands = 4, bandBits = 15).count()
    }
    assert(e.getMessage.contains("1100"))
    assert(e.getMessage.contains("15-bit"))
  }

  test("phashPairs: identical payloads of image kind always pair at hamming 0") {
    // exact text copies that both land on the image kind must collide
    val copies = Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter { case (id, t) => id % 3 == 0 && t.nonEmpty }
      .groupBy(_._2).values.filter(_.length >= 2)
    val got = Multimodal.phashPairs(spark, d)
      .as[(Long, Long, Int)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    copies.foreach { g =>
      val ids = g.map(_._1).sorted
      for (a <- ids; b <- ids if a < b)
        assert(got.get((a, b)).contains(0), s"copies $a,$b must pair at 0")
    }
  }

  test("audioVad: planted silence/speech pattern segments exactly") {
    import org.apache.spark.sql.functions._
    // '~' (126) → sample −2, frame energy 80 — silence;
    // ' ' (32)  → sample −96, frame energy 184320 — voiced.
    // Pattern (6 frames): quiet, quiet, VOICED, quiet, VOICED, VOICED
    // → 3 voiced frames in 2 segments, longest 2; a 7-byte tail is
    // dropped (full frames only).
    val F = Multimodal.VadFrameLen
    val pcm = "~" * (2 * F) + " " * F + "~" * F + " " * (2 * F) + "~" * 7
    val cat = Seq((1L, "audio", pcm), (2L, "video", pcm))
      .toDF("media_id", "kind", "payload")
      .select($"media_id", $"kind", $"payload".cast("binary").as("bytes"))
    val got = Multimodal.audioVadOn(cat)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 1, "non-audio kinds are filtered out")
    val (id, nf, nv, ns, lr, te) = got.head
    assert(id === 1L)
    assert(nf === 6L)
    assert(nv === 3L)
    assert(ns === 2L)
    assert(lr === 2L)
    assert(te === 3L * 96 * 96 * F + 3L * 2 * 2 * F)
    // all-silence payload: zero segments, zero voiced
    val quiet = Seq((1L, "audio", "~" * (3 * F)))
      .toDF("media_id", "kind", "payload")
      .select($"media_id", $"kind", $"payload".cast("binary").as("bytes"))
    val q = Multimodal.audioVadOn(quiet)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(q._2 === 3L && q._3 === 0L && q._4 === 0L && q._5 === 0L)
  }

  test("sceneCuts: planted byte pattern cuts exactly where deltas spike") {
    import org.apache.spark.sql.functions._
    // Sampled frame bytes (stride 16): ~ ~ sp sp ~ ~  → |126−32| = 94
    // crosses the 70 threshold at f=2 and f=4 → 2 cuts, 3 scenes of
    // length 2 each.
    val S = Multimodal.SceneStride
    val payload = Seq("~", "~", " ", " ", "~", "~").map(_ * S).mkString
    val cat = Seq((2L, "video", payload), (3L, "image", payload))
      .toDF("media_id", "kind", "payload")
      .select($"media_id", $"kind", $"payload".cast("binary").as("bytes"))
    val got = Multimodal.sceneCutsOn(cat)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length === 1, "non-video kinds are filtered out")
    val (id, nf, nc, ns, ls) = got.head
    assert(id === 2L)
    assert(nf === 6L)
    assert(nc === 2L)
    assert(ns === 3L)
    assert(ls === 2L)
    // a constant payload has one scene spanning every frame
    val flat = Seq((2L, "video", "x" * (S * 10)))
      .toDF("media_id", "kind", "payload")
      .select($"media_id", $"kind", $"payload".cast("binary").as("bytes"))
    val f = Multimodal.sceneCutsOn(flat)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(f._2 === 10L && f._3 === 0L && f._4 === 1L && f._5 === 10L)
  }

  test("per-row HOF phash signature equals the batch groupBy signature") {
    // mm_ingest_stream computes the average hash per ROW (array HOFs —
    // no streaming aggregation); its oracle equivalence rests on the
    // per-row formulation producing the IDENTICAL (media_id, sig) as
    // the batch posexplode+groupBy pipeline — pin on the full catalog.
    import org.apache.spark.sql.functions._
    val S = Multimodal.PhashSamples
    val d = "/root/testdata/sf0.001"
    val batch = Multimodal.phashSigs(spark, d, S)
      .as[(Long, Long)].collect().toSet
    val perRow = Multimodal.catalog(spark, d)
      .filter(col("kind") === "image")
      .withColumn("nb", length(col("bytes")))
      .filter(col("nb") > 0)
      .withColumn("bstr", col("bytes").cast("string"))
      .withColumn("svs", expr(
        s"transform(sequence(0, ${S - 1}), j -> ascii(substring(bstr, " +
          s"cast(floor(j * (nb - 1) / ${S - 1}) as int) + 1, 1)))"))
      .withColumn("tot", expr(
        "aggregate(svs, cast(0 as bigint), (acc, x) -> acc + x)"))
      .select(col("media_id"), expr(
        s"aggregate(transform(svs, (sv, j) -> if(sv * $S >= tot, " +
          "shiftleft(cast(1 as bigint), j), cast(0 as bigint))), " +
          "cast(0 as bigint), (acc, x) -> acc + x)").as("sig"))
      .as[(Long, Long)].collect().toSet
    assert(perRow.nonEmpty)
    assert(perRow === batch)
  }
}
