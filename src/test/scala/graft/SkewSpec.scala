package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins SCALE.md's claim that AQE handles moderate join skew at
  * runtime: a deliberately hot-keyed sort-merge join, with the skew
  * thresholds scaled down to fixture size, must come out of adaptive
  * execution with `SortMergeJoin(skew=true)` over an `AQEShuffleRead
  * … skewed` (the hot partition split into subpartitions) — the runtime complement to the planned-ahead
  * salting that `rel_salted_join` demonstrates.
  *
  * Runs on `spark.newSession()` so the lowered thresholds never leak
  * into the shared test session's SQLConf. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AQE splits the hot key of a skewed sort-merge join") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // fixture-sized skew thresholds (defaults are 256 MB-scale)
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.shuffle.partitions", "8")

    import s.implicits._
    // 200k rows on ONE key + a uniform tail; dim side uniform
    val fact = s.range(220000)
      .select(when($"id" < 200000, 0L).otherwise($"id" % 97).as("k"),
        $"id".as("v"))
    val dim = s.range(97).select($"id".as("k"), ($"id" * 2).as("w"))
    // no aggregate above the join: a downstream hash-partitioning
    // requirement makes OptimizeSkewedJoin decline the split (it would
    // reintroduce a shuffle) unless forceOptimizeSkewedJoin is set —
    // the spec pins the default behavior on the join itself
    val j = fact.join(dim, "k").select($"k", ($"v" + $"w").as("s"))
    // drive THIS QueryExecution (a write plans its own one, leaving
    // j's adaptive plan un-finalized)
    assert(j.collect().length === 220000)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not mark the join skewed:\n$plan")
    assert(plan.contains("skewed"), // the AQEShuffleRead split the hot key
      s"AQE shuffle read did not split the skewed partition:\n$plan")
  }
}
