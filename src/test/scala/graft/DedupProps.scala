package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck property for the winnowing GUARANTEE (Schleimer et al.
  * §2): any two documents sharing a run of ≥ k + 2W − 1 words built
  * from run-unique vocabulary must surface as a
  * [[graft.operators.Dedup.winnowingPairsOn]] pair — the run contains
  * two DISJOINT winnowing windows whose minima are run-shingles, so
  * ≥ [[graft.operators.Dedup.MinSharedFps]] distinct fingerprints are
  * shared no matter where the run lands in either document. */
object DedupProps extends Properties("Dedup") {

  private lazy val spark = TestSpark.spark

  import graft.operators.Dedup.{SpanShingleWords => K, WinnowW => W}

  // namespaces disjoint by construction: run words can never form a
  // shingle equal to a padding shingle
  private def words(pfx: String, g: Gen[Int]): Gen[List[String]] =
    g.flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(0, 25).map(i => s"$pfx$i")))

  private val runLen = K + 2 * W - 1 // 12: two disjoint interior windows
  private val run: Gen[List[String]] =
    Gen.const((1 to runLen).map(i => s"run$i").toList)
  private val pad: Gen[List[String]] = words("p", Gen.chooseNum(0, 15))

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10) // each sample runs a Spark job

  property("shared >= k+2W-1 run always yields a winnowing pair") =
    Prop.forAll(pad, pad, pad, pad, run) { (a1, a2, b1, b2, r) =>
      import spark.implicits._
      val docs = Seq(
        (1L, (a1 ++ r ++ a2).mkString(" ")),
        (2L, (b1 ++ r ++ b2).mkString(" ")))
        .toDF("doc_id", "text")
      val pairs = graft.operators.Dedup.winnowingPairsOn(docs)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      Prop(pairs.contains((1L, 2L))) :| s"pairs=$pairs a1=$a1 b1=$b1"
    }
}
