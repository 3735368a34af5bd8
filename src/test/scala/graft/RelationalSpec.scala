package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Result sanity + physical-plan quality checks for the relational suite.
  * Value-level correctness is covered by the DuckDB oracle gate
  * (tools/check_oracle.py); these tests pin the plan shapes that matter
  * at scale: filter pushdown into the parquet scan, broadcast joins for
  * small dims, partial aggregation before the exchange. */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan") {
    val plan = planOf(Relational.filterPushdownScan(spark, d))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("IsNotNull(l_shipdate)") ||
      plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
    // column pruning: scan must not read all 11 lineitem columns
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int"), plan)
  }

  test("dim join is planned as a broadcast hash join") {
    val plan = planOf(Relational.dimBroadcastJoin(spark, d))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("region revenue: small dims broadcast, partial agg before exchange") {
    val plan = planOf(Relational.regionRevenue(spark, d))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("partial_sum"), plan)
  }

  test("pricing summary has map-side partial aggregation") {
    val plan = planOf(Relational.pricingSummary(spark, d))
    assert(plan.contains("partial_sum"), plan)
    assert(plan.contains("partial_count") || plan.contains("count"), plan)
  }

  test("top-k is planned as TakeOrderedAndProject, not a global sort") {
    val plan = planOf(Relational.topkOrders(spark, d))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("rollup emits base, per-status, and grand-total rows") {
    val rows = Relational.ordersRollup(spark, d).collect()
    val statuses = rows.map(_.getString(0)).distinct
    assert(statuses.contains("ALL"))
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1)
    val n = Tables.orders(spark, d).count()
    assert(grand.head.getLong(2) === n)
  }

  test("window top-3 returns at most 3 rows per customer, rn contiguous") {
    val rows = Relational.windowTopOrders(spark, d).collect()
    val byCust = rows.groupBy(_.getLong(0))
    byCust.foreach { case (ck, rs) =>
      assert(rs.length <= 3, s"cust $ck")
      assert(rs.map(_.getInt(3)).sorted.toSeq === (1 to rs.length), s"cust $ck")
    }
  }

  test("set ops are consistent: union size = intersect + symmetric parts") {
    val cust = Tables.customer(spark, d).select("c_custkey").distinct().count()
    val union = Relational.keysUnion(spark, d).count()
    val inter = Relational.keysIntersect(spark, d).count()
    val orderKeys = Tables.orders(spark, d)
      .select("o_custkey").distinct().count()
    assert(union === cust + orderKeys - inter)
  }

  test("event time windows cover all events exactly once") {
    val total = Relational.eventTimeWindows(spark, d)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(total === Tables.events(spark, d).count())
  }
}
