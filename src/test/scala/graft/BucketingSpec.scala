package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"

  test("co-bucketed tables sort-merge join with no shuffle exchange") {
    // force the join shape under test: no broadcast
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, d).select("o_orderkey", "o_orderpriority"),
        "orders_b", "o_orderkey", 8)
      Bucketing.writeBucketed(
        Tables.lineitem(spark, d).select("l_orderkey", "l_extendedprice"),
        "lineitem_b", "l_orderkey", 8)

      val j = spark.table("lineitem_b").join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      val n = j.count()
      val plan = j.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$plan")

      // identical result to the plain (shuffled) join
      val plain = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n === plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned layout prunes directories via PartitionFilters") {
    val path = "/tmp/graft-test-warehouse/orders_by_year"
    Bucketing.writePartitioned(
      Tables.orders(spark, d)
        .withColumn("o_year", year(col("o_orderdate"))),
      path, "o_year")
    val filtered = spark.read.parquet(path).filter(col("o_year") === 1997)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.matches("(?s).*PartitionFilters: \\[[^\\]]*o_year[^\\]]*\\].*"),
      s"partition predicate must prune at directory level:\n$scan")
    // pruned read returns exactly the 1997 orders
    val want = Tables.orders(spark, d)
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(filtered.count() === want)
    assert(want > 0)
  }
}
