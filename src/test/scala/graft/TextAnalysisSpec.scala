package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Invariant checks for text-analysis ops (value-level correctness is the
  * DuckDB oracle's job). */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

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
}
