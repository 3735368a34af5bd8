package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** The SQL entry surface (r7 VERDICT item 7): the engine's analogs are
  * equally expressible as `spark.sql` TEXT over [[Graft.registerTables]]
  * temp views — including through the GraftExtensions-registered native
  * functions — and the text plans to the SAME optimized plan as the
  * DataFrame twin (temp views resolve to the same LogicalRelation, so
  * Catalyst canonicalizes both to one plan; where hint bookkeeping
  * makes canonical equality too strict, the spec pins the physical
  * properties instead). */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"

  private def registered(): Unit = {
    Graft.install(spark)
    Graft.registerTables(spark, d)
  }

  private def sameRows(sqlDf: DataFrame, df: DataFrame): Unit = {
    val a = sqlDf.collect().map(_.toString).toSeq
    val b = df.collect().map(_.toString).toSeq
    assert(a === b)
  }

  private def samePlan(sqlDf: DataFrame, df: DataFrame): Unit =
    assert(sqlDf.queryExecution.optimizedPlan.canonicalized ===
      df.queryExecution.optimizedPlan.canonicalized)

  test("Q1 pricing summary: SQL text == DataFrame twin, same optimized plan") {
    registered()
    // the operator reads lineitem behind the r21 scan-parallelism
    // floor (Tables.lineitemSpread); point THIS test's view at the
    // same input layout so the twins still canonicalize identically —
    // other tests re-call registered(), restoring the raw view
    Tables.lineitemSpread(spark, d).createOrReplaceTempView("lineitem")
    // the derived avg sits in an OUTER select, mirroring the DataFrame
    // twin's withColumn-above-agg shape — the same structure optimizes
    // to the same plan
    val sql = spark.sql(
      """SELECT *, round(sum_qty / count_order, 6) AS avg_qty
        |FROM (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_base_price,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |    count(1) AS count_order
        |  FROM lineitem WHERE l_shipdate <= '2001-01-01'
        |  GROUP BY l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    val df = Relational.pricingSummary(spark, d)
    sameRows(sql, df)
    samePlan(sql, df)
  }

  test("pushdown scan: SQL text == DataFrame twin, same optimized plan") {
    registered()
    val sql = spark.sql(
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= '1999-01-01' AND l_shipdate < '1999-02-01'
        |  AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    val df = Relational.filterPushdownScan(spark, d)
    sameRows(sql, df)
    samePlan(sql, df)
  }

  test("dim broadcast join: SQL hint == DataFrame broadcast(), same rows and join") {
    registered()
    val sql = spark.sql(
      """SELECT /*+ BROADCAST(region) */ n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin)
    val df = Relational.dimBroadcastJoin(spark, d)
    sameRows(sql, df)
    // hint bookkeeping (ResolvedHint vs Column-API join hint) differs in
    // the logical plan; the property that matters is physical: both must
    // broadcast-hash-join
    for (q <- Seq(sql, df))
      assert(q.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"), q.queryExecution.executedPlan)
  }

  test("Q5 regional revenue: SQL text == DataFrame twin rows") {
    registered()
    val sql = spark.sql(
      """SELECT /*+ BROADCAST(supplier), BROADCAST(nation), BROADCAST(region) */
        |  n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1999-01-01'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)
    sameRows(sql, Relational.regionRevenue(spark, d))
  }

  test("native functions from SQL text: shingle top-k == DataFrame twin") {
    registered()
    // the GraftExtensions surface end-to-end in one statement: a native
    // codegen'd expression (word_shingles) exploded in SQL, aggregated,
    // and ranked through the native bounded-heap aggregate (topk_agg)
    val sql = spark.sql(
      """SELECT t.id AS doc_id, CAST(t.score AS BIGINT) AS n_shingles
        |FROM (
        |  SELECT topk_agg(doc_id, CAST(n AS DOUBLE), 5) AS topk
        |  FROM (
        |    SELECT doc_id, count(1) AS n
        |    FROM (SELECT doc_id, explode(word_shingles(text, 2)) AS sh
        |          FROM documents)
        |    GROUP BY doc_id))
        |LATERAL VIEW explode(topk) AS t
        |ORDER BY n_shingles DESC, doc_id""".stripMargin)
    val df = Tables.documents(spark, d)
      .select(col("doc_id"),
        explode(graft.functions.WordShingles(col("text"), 2)).as("sh"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .agg(graft.functions.TopKAgg(col("doc_id"),
        col("n").cast("double"), 5).as("topk"))
      .select(explode(col("topk")).as("t"))
      .select(col("t.id").as("doc_id"),
        col("t.score").cast("long").as("n_shingles"))
      .orderBy(desc("n_shingles"), asc("doc_id"))
    sameRows(sql, df)
  }
}
