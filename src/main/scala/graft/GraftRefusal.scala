package graft

/** Typed refusal thrown by every scale guard in the library — the
  * occupancy/domain/cardinality bounds under which a guarded baseline
  * declines oversized input and names its scale dial instead of
  * detonating (the [[operators.Dedup.MaxNaiveShingleDf]] convention).
  *
  * A TYPE, not a message: the Scaling harness previously classified
  * refusals by sniffing `getMessage.contains("refus")`, which
  * misclassified `dedup_clusters` ×64 as an error (-1) while ×16
  * recorded the refusal (-2) — VERDICT r9 item 6. Harness code matches
  * on the type (via [[GraftRefusal.isRefusal]], which walks the cause
  * chain because Spark may wrap driver-side exceptions); extending
  * `IllegalArgumentException` keeps every existing `require`-era
  * catch/spec surface working unchanged. */
class GraftRefusal(message: String) extends IllegalArgumentException(message)

object GraftRefusal {
  /** `require`-shaped guard: refusal guards call this instead of
    * `require` so the thrown refusal is typed. */
  def check(cond: Boolean, msg: => String): Unit =
    if (!cond) throw new GraftRefusal(msg)

  /** True when `e` or any link of its cause chain is a refusal. */
  @annotation.tailrec
  def isRefusal(e: Throwable): Boolean = e match {
    case null => false
    case _: GraftRefusal => true
    case _ => isRefusal(e.getCause)
  }
}
