package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Scaling harness's failure classification (VERDICT r9 item
  * 6 / r10 item 1): a guarded operator declining oversized input BY
  * DESIGN must record −2 in SCALING.json — distinguished from a real
  * error's −1 by the [[GraftRefusal]] TYPE anywhere on the cause
  * chain, never by message text. The former
  * `getMessage.contains("refus")` sniff recorded `dedup_clusters` ×64
  * as −1 (Spark had wrapped the refusal, and the WRAPPER's message was
  * matched) while ×16's unwrapped throw recorded −2 — the same guard,
  * two codes. */
class ScalingClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a guarded op at oversized input throws a typed refusal that " +
      "classifies as -2") {
    import spark.implicits._
    // 20001 signatures in ONE (t, bucket) cell — past the occupancy
    // guard's ceiling, the condition the ×64 corpus triggers for real
    val oversized = spark.range(graft.operators.Dedup.MaxLshBucketOccupancy + 1)
      .select(col("id").as("vec_id"), lit(0).as("t"), lit(7L).as("bucket"))
    val e = intercept[Throwable] {
      graft.operators.Dedup
        .lshCandidatesOnBuckets(oversized, "spec geometry").count()
    }
    assert(GraftRefusal.isRefusal(e), s"guard threw untyped: $e")
    assert(Scaling.failureCode(e) === -2.0)
    assert(Scaling.errString(e).startsWith("GraftRefusal: "))
  }

  test("a Spark-WRAPPED refusal still classifies as -2 (by type, " +
      "not message)") {
    // the r9 misclassification shape: executor/driver wrapping puts a
    // non-"refus" message OUTERMOST; only the cause chain carries the type
    val wrapped = new SparkException("Job aborted due to stage failure",
      new SparkException("Task failed while writing rows",
        new GraftRefusal("dedup_clusters refused: 2^32 id space")))
    assert(GraftRefusal.isRefusal(wrapped))
    assert(Scaling.failureCode(wrapped) === -2.0)
  }

  test("a real error classifies as -1 even when its MESSAGE says " +
      "'refused'") {
    // the sniff's other failure mode: message-matching would record an
    // iteration-limit bug as by-design
    val err = new IllegalStateException(
      "kcore refused to converge (not a scale guard)")
    assert(!GraftRefusal.isRefusal(err))
    assert(Scaling.failureCode(err) === -1.0)
  }

  test("isRefusal terminates on a cyclic cause chain") {
    val a = new RuntimeException("a")
    val b = new RuntimeException("b")
    a.initCause(b); b.initCause(a)
    assert(!GraftRefusal.isRefusal(a))
    val c = new SparkException("outer", new GraftRefusal("inner refusal"))
    assert(GraftRefusal.isRefusal(c))
  }

  test("errString is bounded and single-line") {
    val long = new RuntimeException(("x" * 300) + "\nsecond line")
    val s = Scaling.errString(long)
    assert(s.length <= 160)
    assert(!s.contains("\n"))
    assert(s.startsWith("RuntimeException: xxx"))
    val noMsg = Scaling.errString(new NullPointerException())
    assert(noMsg === "NullPointerException: ")
  }

  test("synthSkipReason: the cap-crossing gate and the notch skip " +
      "warning share one predicate (ADVICE r14: requested notches " +
      "that cannot run must be SAID, not silently skipped)") {
    // runs: synth corpus sized, default panel or one including the key
    assert(Scaling.synthSkipReason(5030000L, None).isEmpty)
    assert(Scaling.synthSkipReason(1L,
      Some(Seq("composite_cap_crossing", "x"))).isEmpty)
    // skipped: no synth corpus (factors.max < 64 and no env override)
    assert(Scaling.synthSkipReason(0L, None)
      .exists(_.contains("SPARK_GRAFT_SCALING_SYNTH")))
    // skipped: explicit panel excludes the cap-crossing row
    assert(Scaling.synthSkipReason(5030000L, Some(Seq("rel_pricing_summary")))
      .exists(_.contains("composite_cap_crossing")))
  }
}
