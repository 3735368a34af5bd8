package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Scaling.plantedTwinRecall]] — the quality column of the
  * synthetic composite-cap-crossing row (VERDICT r12 item 3) — at
  * fixture scale, on the SAME corpus construction the harness uses
  * (xxhash64 iid components, every stride-th vector twinned with one
  * component negated, ids offset by the base count). The 5 M-vector
  * measurement and this spec share one recall definition, so the
  * committed `recall_x2517` number is backed by a unit-pinned
  * counter, not ad-hoc arithmetic. */
class ScalingRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The harness's synthetic corpus at a small n (Scaling.main builds
    * the same shape at SynthCapCrossVectors). */
  private def synthCorpus(n: Long) = {
    val baseVec = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), j -> " +
        "cast(pmod(xxhash64(id, j), 1048576) / 524288.0 - 1.0 as float))")
        .as("embedding"))
    val plants = baseVec
      .filter(col("vec_id") % operators.Dedup.CompositePlantStride === 0)
      .select((col("vec_id") + lit(n)).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "IF(i = cast(vec_id % 64 as int), -x, x))").as("embedding"))
    baseVec.unionByName(plants)
  }

  test("recall over the production dial meets the declared floor on " +
      "the harness's synthetic corpus shape") {
    val n = 4096L
    val corpus = synthCorpus(n)
    val total = corpus.count()
    val pairs = operators.Dedup.embeddingLshPairsScaledOn(corpus, total)
    val (recovered, eligible, recall) =
      Scaling.plantedTwinRecall(corpus, pairs, n)
    // one flipped component of 64 iid components keeps the twin cosine
    // ~1 - 2x^2/S; most plants sit in the >=0.9 declared-floor regime
    assert(eligible > n / operators.Dedup.CompositePlantStride / 2,
      s"implausibly few eligible twins ($eligible) - corpus shape drifted")
    assert(recovered <= eligible)
    info(f"synthetic recall at n=$total: $recall%.3f ($recovered/$eligible)")
    assert(recall >= operators.Dedup.CompositeRecallFloor,
      f"recall $recall%.3f below declared floor " +
        f"${operators.Dedup.CompositeRecallFloor} on the synthetic shape")
  }

  test("counter counts exactly the planted twins, in the floor regime " +
      "only") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array.fill(4)(1.0f)),       // base, twin below the floor
      (1L, Array.fill(4)(1.0f)),       // base, twin in the floor regime
      (2L, Array.fill(4)(1.0f))        // base, no twin
    ).toDF("vec_id", "embedding").unionByName(Seq(
      (10L, Array(-1.0f, 1.0f, 1.0f, 1.0f)),  // twin of 0: cos = 0.5
      (11L, Array(0.9f, 1.0f, 1.0f, 1.0f))    // twin of 1: cos ~ 0.9996
    ).toDF("vec_id", "embedding"))
    // pairs frame: the true twin of 1 recovered, plus a non-twin pair
    // and a twin-of-0 pair (below floor) that must NOT count
    val pairs = Seq(
      (1L, 11L, 0.9996), (0L, 10L, 0.5), (0L, 2L, 1.0))
      .toDF("vec_a", "vec_b", "cosine")
    val (recovered, eligible, recall) =
      Scaling.plantedTwinRecall(corpus, pairs, 10L)
    assert(eligible === 1L, "only vec 1's twin is in the >=0.9 regime")
    assert(recovered === 1L)
    assert(recall === 1.0)
    // empty floor regime -> recall is -1 (nothing to measure), not NaN
    val loneBase = Seq((0L, Array.fill(4)(1.0f))).toDF("vec_id", "embedding")
      .unionByName(Seq((10L, Array(-1.0f, 1.0f, 1.0f, 1.0f)))
        .toDF("vec_id", "embedding"))
    val (_, e2, r2) = Scaling.plantedTwinRecall(
      loneBase, pairs.limit(0), 10L)
    assert(e2 === 0L)
    assert(r2 === -1.0)
  }
}
