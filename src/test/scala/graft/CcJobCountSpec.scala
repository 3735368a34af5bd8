package graft

import org.apache.spark.scheduler.SparkListener
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins the connected-components action budget: the convergence count is
  * observed DURING each round's checkpoint action (Observation API), so
  * a CC round is ONE Spark action — not the former checkpoint + separate
  * filter/count pair (VERDICT r4 item 5).
  *
  * Raw job counts are AQE-noisy (each action materializes several query
  * stages, each a job), so the spec counts SQL executions (actions):
  * 2 setup checkpoints (symmetrized edges, initial labels) + 1 per round
  * + 1 final collect. The pre-Observation shape cost 2 per round and
  * fails the bound below. */
class CcJobCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("connectedComponents runs ONE action per round") {
    import spark.implicits._
    // path 1..8 (diameter 7, exercises the jump rounds) + a separate pair
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (10L, 11L)).toDF("a", "b")

    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent)
          : Unit = e match {
        case _: SparkListenerSQLExecutionStart => execs.incrementAndGet()
        case _ => ()
      }
    }
    // listener events are async (listenerBus is private[spark]): poll
    // until the counter is stable for 500 ms
    def stableCount(): Int = {
      var n = execs.get()
      var stableSince = System.nanoTime()
      while (System.nanoTime() - stableSince < 500L * 1000 * 1000) {
        Thread.sleep(50)
        val cur = execs.get()
        if (cur != n) { n = cur; stableSince = System.nanoTime() }
      }
      n
    }
    // register BEFORE the warmup and snapshot-subtract: registering
    // after it would still receive the warmup's queued async events and
    // inflate the measured count
    spark.sparkContext.addSparkListener(listener)
    try {
      // warm once: JIT/codegen and any lazy Spark init outside the count
      Dedup.connectedComponents(edges).count()
      val before = stableCount()
      val labels = Dedup.connectedComponents(edges)
      val rows = labels.collect()
      val n = stableCount() - before

      // correctness: one component {1..8} labeled 1, one {10,11} labeled 10
      assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
        ((1L to 8L).map(_ -> 1L) ++ Seq(10L -> 10L, 11L -> 10L)).toMap)

      // diameter 7 converges in <= 4 changed rounds + 1 fixpoint round:
      // 2 setup + 5 rounds + 1 collect = 8. The old two-actions-per-round
      // shape would need ~13.
      info(s"connectedComponents SQL executions: $n")
      assert(n <= 8, s"CC took $n actions — convergence count no longer " +
        "rides the checkpoint action?")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
