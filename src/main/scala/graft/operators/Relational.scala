package graft.operators

import graft.GraftRefusal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator suite over the driver's star schema (TESTDATA.md) —
  * exercises the same Spark surface the counting pipeline uses and fills
  * the SURVEY.md §2 category checklist: scan/filter/project, hash +
  * broadcast equi-joins, partial+final aggregation, rollup grouping sets,
  * window functions, sort/limit/top-k, set ops, scalar string/date/math
  * functions, JSON extraction, event-time windows (SURVEY.md §7 step 3-4).
  *
  * Determinism discipline (the driver hash-compares against DuckDB):
  *  - money aggregates go through DECIMAL casts so the sum is exact and
  *    order-insensitive, then back to DOUBLE for a stable output type;
  *  - every query ends in a total ORDER BY;
  *  - ratio columns are rounded to fixed decimals on both sides.
  *
  * Scale notes: only genuinely small dimensions (region 5 rows, nation 25,
  * supplier ~sf×1k) get `broadcast()` hints; fact-fact joins stay shuffle
  * hash/sort-merge so AQE can pick and handle skew. Filters sit directly
  * on scans so Catalyst pushes them into the parquet reader.
  */
object Relational {

  private val dec18 = DecimalType(18, 2)
  private val dec28 = DecimalType(28, 4)

  /** Exact, order-insensitive money sum: double → decimal → sum → double. */
  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(c.cast(dec28)).cast("double")

  /** Scan→filter→project with predicate pushdown (SURVEY.md §2 #3 analog). */
  def filterPushdownScan(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1999-01-01") &&
        col("l_shipdate") < lit("1999-02-01") && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** TPC-H Q1-style pricing summary: partial+final hash aggregation. */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitemSpread(s, d)
      .filter(col("l_shipdate") <= lit("2001-01-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(dec18)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec18)).cast("double").as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", round(col("sum_qty") / col("count_order"), 6))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style shipping priority: fact⋈fact⋈dim join + agg + top-k. */
  def shippingPriority(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-07-01"))
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-07-01"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style regional revenue: 6-way join, small dims broadcast. */
  def regionRevenue(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1999-01-01"))
    Tables.lineitem(s, d)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** Small-dimension broadcast equi-join (nation ⋈ region). */
  def dimBroadcastJoin(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name", "r_name")
      .orderBy("n_nationkey")

  /** ROLLUP grouping sets over orders (status × priority hierarchy). */
  def ordersRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(dec18)).cast("double").as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  /** Window functions: per-customer top-3 orders by price + running sum. */
  def windowTopOrders(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        sum(col("o_totalprice").cast(dec18))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("run_total"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Global sort + limit (top-k) over orders. */
  def topkOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** Set op: EXCEPT — customers with no order in 2001 (every customer has
    * SOME order in the synthetic data, so the unfiltered variant is empty). */
  def customersWithoutOrders(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select("c_custkey")
      .except(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01"))
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** TPC-H Q13-style customer distribution — the COUNT-OF-COUNTS
    * histogram: orders per customer (LEFT join, so zero-order customers
    * land in the 0 bin), then customers per order-count. The classic
    * two-level aggregation whose first key (customer) is fine and whose
    * second (the count) is tiny — both stages partial-aggregate
    * map-side; nothing is ever windowed or sorted until the final
    * #distinct-counts-sized result. */
  def custDist(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    Tables.customer(s, d).select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** [[largeOrders]] keeps orders whose total quantity exceeds this. */
  val LargeOrderMinQty = 300

  /** TPC-H Q18-style large-volume orders: a GROUP-BY → HAVING over the
    * fact table, then the qualifying keys join BACK to the order and
    * customer detail — the canonical "aggregate filter then recover
    * detail" shape. Quantities sum in DECIMAL(18,2) (exact, association
    * -free), so the HAVING boundary is deterministic cross-engine.
    *
    * Scale: the heavy side is one partial+final sum by order key; the
    * HAVING survivor set is tiny (top ~0.3% of orders), so the
    * detail-recovery joins run survivor-sized against orders/customer —
    * with AQE they plan as broadcast probes of the two dimension-ish
    * sides, never a second fact shuffle. */
  def largeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitemSpread(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(dec18)).as("dq"))
      .filter(col("dq") > lit(LargeOrderMinQty))
      .select(col("l_orderkey"), col("dq").cast("double").as("sum_qty"))
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(desc("sum_qty"), asc("o_orderkey"))
  }

  /** Set op: distinct UNION of customer keys and order-placing keys. */
  def keysUnion(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey").as("k"))
      .union(Tables.orders(s, d).select(col("o_custkey").as("k")))
      .distinct()
      .orderBy("k")

  /** Set op: INTERSECT — customer keys that do appear in orders. */
  /** JOIN-CARDINALITY estimator audit — the System-R selectivity
    * formula every cost-based planner runs before committing to a join
    * order at 100 TB: |A ⋈ B| ≈ |A|·|B| / max(ndv(A.k), ndv(B.k)),
    * compared against the exact join count, per audited join. The FK
    * join (orders⋈lineitem) satisfies the containment+uniformity
    * assumptions, so the estimate lands exact (err_ppm 0) — the
    * baseline; the filtered join (customer⋈urgent orders) shows the
    * real estimation error a planner lives with when the uniformity
    * assumption bends. DECIMAL(38,0) products, integer div — both
    * engines truncate toward zero, so the signed err_ppm matches.
    *
    * Scale: per join, two 1-row stat aggregates + the exact count (the
    * audit cost — production uses the estimate INSTEAD of the join);
    * at scale the exact NDVs swap for the engine's own KMV/HLL
    * sketches ([[kmvSketch]], [[hllPortable]]). */
  def joinCardinality(s: SparkSession, d: String): DataFrame = {
    def audit(name: String, a: DataFrame, ka: String,
        b: DataFrame, kb: String): DataFrame = {
      val sa = a.agg(count(lit(1)).as("rows_a"),
        countDistinct(col(ka)).as("ndv_a"))
      val sb = b.agg(count(lit(1)).as("rows_b"),
        countDistinct(col(kb)).as("ndv_b"))
      val exact = a.select(col(ka).as("k"))
        .join(b.select(col(kb).as("k")), "k")
        .agg(count(lit(1)).as("exact_rows"))
      sa.crossJoin(broadcast(sb)).crossJoin(broadcast(exact))
        .select(lit(name).as("join_name"),
          col("rows_a"), col("ndv_a"), col("rows_b"), col("ndv_b"),
          expr("cast((cast(rows_a as decimal(38,0)) * rows_b) " +
            "div nullif(greatest(ndv_a, ndv_b), 0) as bigint)").as("est_rows"),
          col("exact_rows"))
        .withColumn("err_ppm", expr(
          "cast(((est_rows - exact_rows) * cast(1000000 as decimal(38,0))) " +
            "div nullif(exact_rows, 0) as bigint)"))
    }
    audit("orders_lineitem",
        Tables.orders(s, d), "o_orderkey",
        Tables.lineitem(s, d), "l_orderkey")
      .unionByName(audit("customer_urgent_orders",
        Tables.customer(s, d), "c_custkey",
        Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        "o_custkey"))
      .orderBy("join_name")
  }

  /** [[joinCardinality]] with the NDVs from KMV bottom-k sketches — the
    * form that actually runs at 100 TB: exact `countDistinct` pays an
    * Expand over every row, while the k=[[KmvK]] order statistic is a
    * 64-row frame per side regardless of corpus size (the
    * [[kmvSketch]] machinery, here in INTEGER arithmetic:
    * ndv ≈ (k−1)·2^60 div h_(k), DECIMAL(38,0) product, exact `cnt`
    * when the side has fewer than k distinct keys). exact_rows stays
    * for the audit; production uses est_rows INSTEAD of joining. */
  def joinCardinalitySketch(s: SparkSession, d: String): DataFrame = {
    val k = KmvK
    def side(df: DataFrame, key: String, suf: String): DataFrame = {
      val rows = df.agg(count(lit(1)).as(s"rows_$suf"))
      val ndv = df.select(
          Dedup.md5hash60(col(key).cast("string")).as("h")).distinct()
        .orderBy("h").limit(k)
        .agg(count(lit(1)).as("cnt"), max("h").as("hk"))
        .select(expr(
          s"case when cnt < $k then cnt else " +
            s"cast((cast(${k - 1} as decimal(38,0)) * 1152921504606846976) " +
            "div hk as bigint) end").as(s"ndv_est_$suf"))
      rows.crossJoin(broadcast(ndv))
    }
    def audit(name: String, a: DataFrame, ka: String,
        b: DataFrame, kb: String): DataFrame = {
      val exact = a.select(col(ka).as("k"))
        .join(b.select(col(kb).as("k")), "k")
        .agg(count(lit(1)).as("exact_rows"))
      side(a, ka, "a").crossJoin(broadcast(side(b, kb, "b")))
        .crossJoin(broadcast(exact))
        .select(lit(name).as("join_name"),
          col("rows_a"), col("ndv_est_a"), col("rows_b"), col("ndv_est_b"),
          expr("cast((cast(rows_a as decimal(38,0)) * rows_b) " +
            "div nullif(greatest(ndv_est_a, ndv_est_b), 0) as bigint)").as("est_rows"),
          col("exact_rows"))
        .withColumn("err_ppm", expr(
          "cast(((est_rows - exact_rows) * cast(1000000 as decimal(38,0))) " +
            "div nullif(exact_rows, 0) as bigint)"))
    }
    audit("orders_lineitem",
        Tables.orders(s, d), "o_orderkey",
        Tables.lineitemSpread(s, d), "l_orderkey")
      .unionByName(audit("customer_urgent_orders",
        Tables.customer(s, d), "c_custkey",
        Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        "o_custkey"))
      .orderBy("join_name")
  }

  /** DuckDB twin of [[joinCardinalitySketch]]. */
  private[graft] def joinCardinalitySketchOracle: String = {
    val k = KmvK
    def sideSql(rel: String, key: String, suf: String): String =
      s"""h$suf AS (
         |  SELECT DISTINCT ('0x' || substr(md5($key::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM $rel
         |),
         |sk$suf AS (SELECT count(*)::BIGINT AS cnt, max(h)::BIGINT AS hk
         |  FROM (SELECT h FROM h$suf ORDER BY h LIMIT $k)),
         |n$suf AS (SELECT CASE WHEN cnt < $k THEN cnt
         |  ELSE ((${k - 1}::HUGEINT * 1152921504606846976) // hk)::BIGINT
         |  END AS ndv_est FROM sk$suf),
         |r$suf AS (SELECT count(*)::BIGINT AS rows_n FROM $rel)""".stripMargin
    s"""WITH u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
       |${sideSql("orders", "o_orderkey", "1a")},
       |${sideSql("lineitem", "l_orderkey", "1b")},
       |${sideSql("customer", "c_custkey", "2a")},
       |${sideSql("u", "o_custkey", "2b")},
       |e1 AS (SELECT count(*)::BIGINT AS exact_rows
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |e2 AS (SELECT count(*)::BIGINT AS exact_rows
       |  FROM customer c JOIN u ON c.c_custkey = u.o_custkey),
       |r AS (
       |  SELECT 'orders_lineitem' AS join_name,
       |    r1a.rows_n AS rows_a, n1a.ndv_est AS ndv_est_a,
       |    r1b.rows_n AS rows_b, n1b.ndv_est AS ndv_est_b,
       |    ((r1a.rows_n::HUGEINT * r1b.rows_n)
       |      // nullif(greatest(n1a.ndv_est, n1b.ndv_est), 0))::BIGINT AS est_rows,
       |    e1.exact_rows
       |  FROM r1a, n1a, r1b, n1b, e1
       |  UNION ALL
       |  SELECT 'customer_urgent_orders',
       |    r2a.rows_n, n2a.ndv_est, r2b.rows_n, n2b.ndv_est,
       |    ((r2a.rows_n::HUGEINT * r2b.rows_n)
       |      // nullif(greatest(n2a.ndv_est, n2b.ndv_est), 0))::BIGINT,
       |    e2.exact_rows
       |  FROM r2a, n2a, r2b, n2b, e2
       |)
       |SELECT join_name, rows_a, ndv_est_a, rows_b, ndv_est_b,
       |  est_rows, exact_rows,
       |  (((est_rows::HUGEINT - exact_rows) * 1000000) // nullif(exact_rows, 0))::BIGINT AS err_ppm
       |FROM r ORDER BY join_name""".stripMargin
  }

  /** DuckDB twin of [[joinCardinality]] — HUGEINT products mirroring the
    * DECIMAL(38,0) route, `//` truncation matching Spark's `div`. */
  private[graft] def joinCardinalityOracle: String =
    """WITH a1 AS (SELECT count(*)::BIGINT AS rows_a,
      |    count(DISTINCT o_orderkey)::BIGINT AS ndv_a FROM orders),
      |b1 AS (SELECT count(*)::BIGINT AS rows_b,
      |    count(DISTINCT l_orderkey)::BIGINT AS ndv_b FROM lineitem),
      |e1 AS (SELECT count(*)::BIGINT AS exact_rows
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |a2 AS (SELECT count(*)::BIGINT AS rows_a,
      |    count(DISTINCT c_custkey)::BIGINT AS ndv_a FROM customer),
      |b2 AS (SELECT count(*)::BIGINT AS rows_b,
      |    count(DISTINCT o_custkey)::BIGINT AS ndv_b FROM u),
      |e2 AS (SELECT count(*)::BIGINT AS exact_rows
      |  FROM customer c JOIN u ON c.c_custkey = u.o_custkey),
      |r AS (
      |  SELECT 'orders_lineitem' AS join_name, rows_a, ndv_a, rows_b, ndv_b,
      |    ((rows_a::HUGEINT * rows_b) // nullif(greatest(ndv_a, ndv_b), 0))::BIGINT AS est_rows,
      |    exact_rows
      |  FROM a1, b1, e1
      |  UNION ALL
      |  SELECT 'customer_urgent_orders', rows_a, ndv_a, rows_b, ndv_b,
      |    ((rows_a::HUGEINT * rows_b) // nullif(greatest(ndv_a, ndv_b), 0))::BIGINT,
      |    exact_rows
      |  FROM a2, b2, e2
      |)
      |SELECT join_name, rows_a, ndv_a, rows_b, ndv_b, est_rows, exact_rows,
      |  (((est_rows::HUGEINT - exact_rows) * 1000000) // nullif(exact_rows, 0))::BIGINT AS err_ppm
      |FROM r ORDER BY join_name""".stripMargin

  def keysIntersect(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey").as("k"))
      .intersect(Tables.orders(s, d).select(col("o_custkey").as("k")))
      .orderBy("k")

  /** Semi + anti joins: customers partitioned by whether they have an
    * urgent order (left_semi) or not (left_anti) — emitted as one table
    * with a flag so a single query covers both join types. */
  def semiAntiJoin(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    val withU = c.join(urgent, col("c_custkey") === col("o_custkey"),
      "left_semi").withColumn("has_urgent", lit(true))
    val withoutU = c.join(urgent, col("c_custkey") === col("o_custkey"),
      "left_anti").withColumn("has_urgent", lit(false))
    withU.unionAll(withoutU).orderBy("c_custkey")
  }

  /** Descriptive statistics with cross-engine determinism: stddev is
    * computed from exact DECIMAL sums (sqrt((Σx² − (Σx)²/n)/(n−1))), not
    * the engine's float accumulator. */
  def statsSummary(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity").cast(DecimalType(18, 2))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        sum(x).cast("double").as("sum_qty"),
        sum((x * x).cast(DecimalType(28, 4))).cast("double").as("sumsq_qty"))
      .select(
        col("l_returnflag"), col("n"), col("min_qty"), col("max_qty"),
        round(col("sum_qty") / col("n"), 6).as("avg_qty"),
        round(sqrt((col("sumsq_qty") - col("sum_qty") * col("sum_qty") /
          col("n")) / (col("n") - 1)), 6).as("stddev_qty"))
      .orderBy("l_returnflag")
  }

  /** Exact percentiles (linear interpolation — same definition as
    * DuckDB's quantile_cont; l_quantity is integer-valued so the
    * interpolated doubles are exact). */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr("percentile(l_quantity, 0.99)").as("p99"))
      .orderBy("l_returnflag")

  /** Salted two-stage aggregation — the skew-mitigation pattern: spread
    * each hot group over 16 salt buckets for the first (heavy) partial
    * aggregation, then combine the per-salt partials. Result is exactly
    * the plain groupBy (decimal sums are associative), demonstrated
    * against the unsalted oracle. */
  def saltedAgg(s: SparkSession, d: String): DataFrame = {
    val salted = Tables.lineitem(s, d)
      .withColumn("_salt", pmod(col("l_orderkey"), lit(16)))
      .groupBy("l_returnflag", "_salt")
      .agg(count(lit(1)).as("pn"),
        sum(col("l_extendedprice").cast(dec18)).as("psum"))
    salted.groupBy("l_returnflag")
      .agg(sum("pn").as("n"),
        sum("psum").cast("double").as("sum_price"))
      .orderBy("l_returnflag")
  }

  /** Scalar string/math functions over part. */
  def scalarFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      length(col("p_name")).as("name_len"),
      substring(col("p_type"), 1, 5).as("type5"),
      concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
      round(col("p_retailprice") * 1.1, 2).as("bumped"),
      abs(col("p_size") - 25).as("size_dist"),
      floor(col("p_retailprice")).cast("long").as("floor_price"),
      (col("p_size") % 7).as("size_mod"))
      .orderBy("p_partkey")

  /** Scalar date functions over orders. */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dom"),
      dayofweek(col("o_orderdate")).as("dow"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"),
      datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long")
        .as("days_since"))
      .orderBy("o_orderkey")

  /** JSON extraction over events.props + aggregation. */
  def jsonExtractEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      .orderBy("event_type")

  /** The full analytic-window function surface in one query:
    * lag/lead/ntile over a TOTAL order (deterministic offsets), and
    * rank/dense_rank/percent_rank/cume_dist over a TIES-allowed order
    * (rank families are deterministic under ties; offset functions are
    * not — hence the two windows). */
  def windowFuncs(s: SparkSession, d: String): DataFrame = {
    val wTotal = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val wYear = Window.partitionBy("o_custkey")
      .orderBy(year(col("o_orderdate")))
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      lag("o_totalprice", 1).over(wTotal).as("prev_price"),
      lead("o_totalprice", 1).over(wTotal).as("next_price"),
      ntile(4).over(wTotal).as("quartile"),
      first("o_totalprice")
        .over(wTotal.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("top_price"),
      rank().over(wYear).as("yr_rank"),
      dense_rank().over(wYear).as("yr_dense_rank"),
      round(percent_rank().over(wYear), 12).as("yr_pct_rank"),
      round(cume_dist().over(wYear), 12).as("yr_cume"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Arbitrary GROUPING SETS (beyond ROLLUP/CUBE): status-only,
    * priority-only, and grand-total aggregates in one pass, disambiguated
    * with grouping() flags (computed explicitly as grouping(a)*2 +
    * grouping(b) so the bit order can't differ across engines). */
  def groupingSetsAgg(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  cast(grouping(o_orderstatus) AS INT) * 2 +
        |    cast(grouping(o_orderpriority) AS INT) AS gid,
        |  count(*) AS n,
        |  cast(sum(cast(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, status, priority""".stripMargin)
  }

  /** Array/vector function surface over the embeddings table: size,
    * min/max, element access, distinct count, plus the native codegen'd
    * [[graft.functions.VectorNorm]] (the built-in `aggregate()` lambda
    * formulation evaluates interpreted — see the NGramArray hazard). */
  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      round(array_min(col("embedding")).cast("double"), 6).as("v_min"),
      round(array_max(col("embedding")).cast("double"), 6).as("v_max"),
      round(element_at(col("embedding"), 1).cast("double"), 6).as("v_first"),
      round(element_at(col("embedding"), -1).cast("double"), 6).as("v_last"),
      size(array_distinct(col("embedding"))).as("n_distinct"),
      round(graft.functions.VectorNorm(col("embedding")), 6).as("l2_norm"))
      .orderBy("vec_id")

  /** Event-time HOPPING (sliding) windows: 1-hour windows every 30
    * minutes — every event lands in exactly two overlapping windows.
    * Same partial-agg shape as the tumbling form; the explode-to-hops is
    * inside Spark's `window()` expression. */
  def hoppingWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
        .as("hop_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("hop_start", "event_type")

  /** Salted JOIN — the skew-mitigation pattern for a hot-keyed join:
    * the (conceptually skewed) fact side derives a salt from its own
    * rows, the other side is replicated across all salt values, and the
    * join key becomes (key, salt) so one hot key spreads over
    * [[SaltedJoinSalts]] partitions. Exactly equal to the unsalted join
    * (the oracle IS the plain-join SQL). AQE's skew-join split is the
    * runtime alternative; salting remains the planned-ahead option when
    * a key is known-pathological. */
  val SaltedJoinSalts = 8
  def saltedJoin(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitemSpread(s, d)
      .withColumn("_lsalt", pmod(col("l_linenumber"), lit(SaltedJoinSalts)))
    val o = Tables.orders(s, d)
      .withColumn("_osalt",
        explode(sequence(lit(0), lit(SaltedJoinSalts - 1))))
    l.join(o, col("l_orderkey") === col("o_orderkey") &&
        col("_lsalt") === col("_osalt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Correlated subquery surface: EXISTS and a correlated scalar
    * aggregate subquery (Catalyst decorrelates both into joins). */
  def existsSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_sq")
    Tables.orders(s, d).createOrReplaceTempView("orders_sq")
    s.sql(
      """SELECT c_custkey,
        |  EXISTS(SELECT 1 FROM orders_sq o WHERE o.o_custkey = c.c_custkey
        |         AND o.o_totalprice > 300000) AS has_big_order,
        |  (SELECT count(*) FROM orders_sq o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer_sq c ORDER BY c_custkey""".stripMargin)
  }

  /** arg-min/arg-max aggregates (min_by/max_by) with a collision-free
    * integer ordering value — exact cents × 10^10 + orderkey — so the
    * winning row is unique and the result engine-independent. Bounds:
    * prices < 10^6 currency units (10^8 cents) and orderkeys < 10^10
    * keep u < 10^18 < 2^63; both hold for this schema's generator at
    * any SF (TPC-H prices cap at ~10^5; keys are dense). */
  def minMaxBy(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("_u",
        round(col("l_extendedprice") * 100, 0).cast("long") * 10000000000L +
          col("l_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        expr("max_by(l_orderkey, _u)").as("max_price_order"),
        expr("min_by(l_orderkey, _u)").as("min_price_order"),
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_extendedprice")).as("min_price"))
      .orderBy("l_returnflag")

  /** FULL OUTER join over two partially-overlapping keyed sets, with a
    * provenance tag — fills the outer-join row of the join-type matrix
    * (inner/semi/anti/left-via-asof are covered elsewhere; right outer
    * is the mirror). */
  def outerJoins(s: SparkSession, d: String): DataFrame = {
    val a = Tables.customer(s, d)
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("ak"), col("c_mktsegment"))
    val b = Tables.orders(s, d)
      .filter(col("o_custkey") % 2 === 0)
      .groupBy(col("o_custkey").as("bk"))
      .agg(count(lit(1)).as("n_orders"))
    a.join(b, col("ak") === col("bk"), "full_outer")
      .select(
        coalesce(col("ak"), col("bk")).as("k"),
        col("c_mktsegment"),
        col("n_orders"),
        when(col("ak").isNotNull && col("bk").isNotNull, "both")
          .when(col("ak").isNotNull, "left_only")
          .otherwise("right_only").as("side"))
      .orderBy("k")
  }

  /** Bag-semantics set operations (UNION ALL / INTERSECT ALL /
    * EXCEPT ALL), emitted as per-value multiplicity tables under an op
    * tag — the multiset counterpart of the distinct set-op queries. */
  def setOpsAll(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderpriority").as("x"))
    val b = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
      .select(col("o_orderpriority").as("x"))
    def tally(df: DataFrame, op: String) =
      df.groupBy("x").agg(count(lit(1)).as("n"))
        .select(lit(op).as("op"), col("x"), col("n"))
    tally(a.unionAll(b), "union_all")
      .unionAll(tally(a.intersectAll(b), "intersect_all"))
      .unionAll(tally(a.exceptAll(b), "except_all"))
      .orderBy("op", "x")
  }

  val PivotEventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** UNPIVOT (melt) — the inverse of the pivot query: widen per-user
    * event counts to columns, then unpivot back to long form. Dropping
    * the zero-count rows recovers exactly the plain groupBy, which is
    * the oracle. */
  def unpivotUserEvents(s: SparkSession, d: String): DataFrame = {
    val wide = Tables.events(s, d).groupBy("user_id")
      .pivot("event_type", PivotEventTypes).agg(count(lit(1)))
    val long = wide.unpivot(
      Array(col("user_id")),
      PivotEventTypes.map(col).toArray,
      "event_type", "n")
    long.filter(col("n").isNotNull && col("n") > 0)
      .orderBy("user_id", "event_type")
  }

  /** Schema-based JSON parsing (`from_json` into a typed struct —
    * the typed counterpart of the path-based get_json_object query),
    * aggregated by the parsed value's decile. */
  def jsonParseTyped(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"), lit("k INT")).getField("k").as("k"))
      .groupBy(col("event_type"), expr("k div 10").as("k_decile"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "k_decile")

  /** Second scalar string batch: pad/translate/reverse/repeat/
    * split_part/instr/left — all codegen'd built-ins with DuckDB
    * equivalents. */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      lpad(col("p_brand"), 12, "*").as("brand_lpad"),
      rpad(col("p_brand"), 12, ".").as("brand_rpad"),
      translate(col("p_type"), "ae", "AE").as("type_tr"),
      reverse(col("p_brand")).as("brand_rev"),
      repeat(lit("ab"), (col("p_size") % 3).cast("int") + 1).as("ab_rep"),
      expr("split_part(p_type, ' ', 1)").as("type_first"),
      instr(col("p_name"), "a").as("a_pos"),
      expr("left(p_name, 5)").as("name5"))
      .orderBy("p_partkey")

  /** Range-join bucket width: 10 minutes in microseconds. */
  val RangeJoinWindowUs = 600000000L

  /** RANGE (interval) join, bucketized — for each purchase, the count of
    * the same user's clicks in the preceding 10 minutes and the smallest
    * gap. A naive range join is an equi-join on user with an O(n·m)
    * range predicate per user; the scalable form buckets time by the
    * range width W: a click at c falls in bucket c div W, a purchase at
    * p probes buckets {p div W − 1, p div W} (they fully cover
    * [p−W, p]), so the join is a plain (user, bucket) EQUI-join — 2×
    * row replication on the probe side — with the exact range predicate
    * applied as a post-filter. LEFT join keeps zero-click purchases. */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val W = RangeJoinWindowUs
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("p_us"))
      .withColumn("bucket",
        explode(array(expr(s"p_us div $W - 1"), expr(s"p_us div $W"))))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"))
      .withColumn("c_bucket", expr(s"c_us div $W"))
    p.join(c,
        col("user_id") === col("c_user") && col("bucket") === col("c_bucket") &&
          col("c_us") >= col("p_us") - W && col("c_us") <= col("p_us"),
        "left")
      .groupBy("event_id", "user_id")
      .agg(count(col("c_us")).as("n_clicks_10m"),
        min(col("p_us") - col("c_us")).as("min_gap_us"))
      .orderBy("event_id")
  }

  /** Deterministic bucket fan-out for [[skyline]]'s local pre-filter. */
  val SkylineBuckets = 64
  /** Refusal bound on the candidate set feeding [[skyline]]'s exact
    * final dominance pass. */
  val MaxSkylineCandidates = 100000L

  /** SKYLINE (Pareto frontier, Börzsönyi et al. ICDE'01): the parts no
    * other part beats on BOTH dimensions — cheaper-or-equal price AND
    * larger-or-equal size, strictly better in one. The OLAP
    * "best trade-offs" operator (price/quality, latency/cost, …).
    *
    * Two phases. (1) LOCAL pre-filter: parts bucket by partkey mod
    * [[SkylineBuckets]]; within each bucket a window ordered by
    * (price ASC, size DESC) keeps rows whose size equals the running
    * max — every preceding row has price ≤ current, so a larger earlier
    * size proves dominance. SOUND: a globally non-dominated row is
    * never dropped (its dominator would have to sort before it in its
    * own bucket); ties survive to keep duplicates-both-undominated
    * semantics. (2) EXACT final pass: a dominance LEFT ANTI self-join
    * over the pre-filtered candidates — quadratic, so it runs behind an
    * eager guard ([[MaxSkylineCandidates]]): for uniform data local
    * skylines are ~O(log rows/bucket), collapsing even 100 TB inputs to
    * a broadcastable candidate set; adversarially correlated data
    * (price rising with size) refuses with the bound named rather than
    * detonating — the [[Dedup.jaccardPairs]] convention.
    *
    * The window is PARTITIONED (never one global sort) and the anti-join
    * broadcasts the guarded-small candidate set (expected BNLJ,
    * PlanLint-listed). */
  def skyline(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"),
        pmod(col("p_partkey"), lit(SkylineBuckets)).as("bkt"))
    val w = Window.partitionBy("bkt")
      .orderBy(col("p_retailprice").asc, col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cand = p.withColumn("mx", max("p_size").over(w))
      .filter(col("p_size") >= col("mx"))
      .select("p_partkey", "p_retailprice", "p_size")
      .localCheckpoint() // both sides of the final pass reuse one build
    val nCand = cand.agg(count(lit(1))).head().getLong(0)
    GraftRefusal.check(nCand <= MaxSkylineCandidates,
      s"skyline refused: $nCand pre-filtered candidates exceed " +
        s"$MaxSkylineCandidates - the exact dominance pass is quadratic; " +
        "raise SkylineBuckets or add a second pre-filter round " +
        "(skyline(skyline(x)) is idempotent) before the final join")
    val q = cand.select(col("p_partkey").as("q_key"),
      col("p_retailprice").as("q_price"), col("p_size").as("q_size"))
    cand.join(broadcast(q),
        col("q_price") <= col("p_retailprice") &&
          col("q_size") >= col("p_size") &&
          (col("q_price") < col("p_retailprice") ||
            col("q_size") > col("p_size")),
        "left_anti")
      .orderBy("p_partkey")
  }

  /** Bits per dimension in the [[zorderLayout]] interleave. */
  val ZOrderBits = 16
  /** Low bits dropped when bucketing z-values: 12 → 6 bits per dim, so
    * any bucket spans < 2⁶ distinct values of EACH dimension. */
  val ZOrderBucketShift = 12

  /** The Morton/z-value bit-interleave as a SQL expression, generated
    * from one loop per engine so the arithmetic is shared by
    * construction. Spark spells shifts as functions, DuckDB as
    * operators; both sum the same 2·[[ZOrderBits]] single-bit terms. */
  private def zvalSpark(x: String, y: String): String =
    (0 until ZOrderBits).map(i =>
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})")
      .mkString(" + ")
  private[graft] def zvalDuck(x: String, y: String): String =
    (0 until ZOrderBits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  /** Z-ORDER layout audit — the data-layout side of 100 TB scan
    * performance: interleaving the bits of two filter dimensions
    * (customer, order day) into one Morton key and sorting/bucketing by
    * it bounds BOTH dimensions inside every contiguous key range. A
    * table laid out in z-order gets tight parquet row-group min/max
    * stats on both columns at once, so `WHERE o_custkey = … AND
    * o_orderdate BETWEEN …` prunes row groups on either predicate —
    * single-column sort gives that for one dimension only. This query
    * REPORTS exactly those would-be row-group stats: per z-bucket
    * (low [[ZOrderBucketShift]] bits dropped), the row count and each
    * dimension's min/max — every bucket provably spans < 2⁶ values per
    * dimension (pinned by spec).
    *
    * Scale: the z-value is 32 codegen'd shift/mask terms, map-only;
    * the report is one partial+final agg by bucket. Writing the layout
    * itself is `df.repartitionByRange(zval).sortWithinPartitions(zval)`
    * — same expression, no new machinery. */
  def zorderLayout(s: SparkSession, d: String): DataFrame = {
    val b = Tables.orders(s, d).select(
      pmod(col("o_custkey"), lit(65536L)).as("x"),
      pmod(expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"),
        lit(65536L)).as("y"))
    b.withColumn("zval", expr(zvalSpark("x", "y")))
      .groupBy(expr(s"zval div ${1 << ZOrderBucketShift}").as("zbucket"))
      .agg(count(lit(1)).as("n_orders"),
        min("x").as("min_cust"), max("x").as("max_cust"),
        min("y").as("min_day"), max("y").as("max_day"))
      .orderBy("zbucket")
  }

  /** DuckDB twin of [[zorderLayout]] — same generated interleave. */
  private[graft] def zorderLayoutOracle: String =
    s"""WITH b AS (
       |  SELECT o_custkey % 65536 AS x,
       |    (epoch_us(o_orderdate) // 86400000000) % 65536 AS y
       |  FROM orders
       |),
       |z AS (SELECT x, y, ${zvalDuck("x", "y")} AS zval FROM b)
       |SELECT zval // ${1 << ZOrderBucketShift} AS zbucket,
       |  count(*) AS n_orders,
       |  min(x) AS min_cust, max(x) AS max_cust,
       |  min(y) AS min_day, max(y) AS max_day
       |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin

  /** The (table, key column) pairs [[skewReport]] audits — the shuffle
    * keys every big join/agg in the suite partitions by. */
  val SkewAuditKeys: Seq[(String, String)] = Seq(
    "lineitem" -> "l_suppkey", "lineitem" -> "l_partkey",
    "orders" -> "o_custkey", "events" -> "user_id")

  /** SHUFFLE-KEY SKEW AUDIT — the operational pre-flight for every
    * repartition/join in this engine: per audited key column, the row
    * count, distinct-key count, the heaviest key and its frequency, and
    * `skew_ppm` = (max_freq · n_distinct · 10⁶) div n_rows — exactly
    * 10⁶ for a perfectly uniform key, growing linearly with the hottest
    * partition's overload. At 100 TB this is the number that decides
    * between a plain shuffle join, AQE skew splitting, and the salting
    * operators ([[saltedJoin]]/[[saltedAgg]]) — measured, not guessed.
    *
    * All integer arithmetic (ppm via truncating div); the heavy hitter
    * is the min key among those at max frequency — a deterministic
    * tie-break computed as a second bounded agg (composite argmin isn't
    * portable to the oracle engine).
    *
    * Scale: one partial+final count per key column (the key-frequency
    * frame, checkpointed and reused), then two 1-row bounded aggs per
    * column — never a sort of the frequency frame. */
  def skewReport(s: SparkSession, d: String): DataFrame = {
    val per = SkewAuditKeys.map { case (t, k) =>
      val freq = Tables.load(s, d, t).groupBy(col(k).as("key"))
        .agg(count(lit(1)).as("f"))
        .localCheckpoint() // stats + hot-key probe share one build
      val stats = freq.agg(
        sum("f").as("n_rows"),
        count(lit(1)).as("n_distinct"),
        max("f").as("max_freq"))
      freq.crossJoin(broadcast(stats))
        .filter(col("f") === col("max_freq"))
        .groupBy("n_rows", "n_distinct", "max_freq")
        .agg(min("key").cast("long").as("hot_key"))
        .select(lit(s"$t.$k").as("key_col"), col("n_rows"),
          col("n_distinct"), col("max_freq"), col("hot_key"),
          expr("(max_freq * n_distinct * 1000000) div n_rows")
            .as("skew_ppm"))
    }
    per.reduce(_.union(_)).orderBy("key_col")
  }

  /** DuckDB twin of [[skewReport]] — same per-column frequency frame,
    * same min-key-at-max-freq tie-break, same integer ppm. */
  private[graft] def skewReportOracle: String = {
    val blocks = SkewAuditKeys.map { case (t, k) =>
      s"""SELECT '$t.$k' AS key_col, m.n_rows, m.n_distinct, m.max_freq,
         |  (SELECT CAST(min(key) AS BIGINT) FROM
         |    (SELECT $k AS key, count(*) AS f FROM $t GROUP BY 1) f2
         |   WHERE f2.f = m.max_freq) AS hot_key,
         |  (m.max_freq * m.n_distinct * 1000000) // m.n_rows AS skew_ppm
         |FROM (
         |  SELECT CAST(sum(f) AS BIGINT) AS n_rows,
         |    count(*) AS n_distinct, CAST(max(f) AS BIGINT) AS max_freq
         |  FROM (SELECT $k AS key, count(*) AS f FROM $t GROUP BY 1) f1
         |) m""".stripMargin
    }
    blocks.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY key_col")
  }

  /** Portable-HLL register count (2⁸ buckets, σ ≈ 1.04/√m ≈ 6.5%). */
  val HllM = 256

  /** α·m² for m = 256, computed once and embedded as the SAME decimal
    * literal in both engines (17 significant digits round-trips a
    * double exactly), so the raw-estimate arithmetic cannot diverge. */
  private val hllAlphaM2 = {
    val alpha = 0.7213 / (1.0 + 1.079 / HllM)
    // Double.toString round-trips exactly and string→double casts are
    // correctly rounded in both engines, so this is the same double bit
    // pattern everywhere — a BARE decimal literal would parse as
    // DECIMAL in both engines (the rel_rfm trap)
    s"cast('${alpha * HllM * HllM}' as double)"
  }

  /** PORTABLE HyperLogLog — the cross-engine-EXACT counterpart to
    * [[SparkEntry]]'s engine-native `hll_sketch_agg` query (which can
    * only be bounds-checked): registers derive from the md5-60 hash —
    * bucket = h mod 256, ρ = leading zeros of the remaining 52 bits + 1
    * (via `length(bin(x))`, exact integer arithmetic in both engines) —
    * and the harmonic mean Σ2^(−Mⱼ) sums DYADIC RATIONALS with bounded
    * exponents, so every partial sum is exactly representable and the
    * double total is ASSOCIATION-ORDER-FREE. One fixed literal αm² and
    * one division later, the estimate is bit-identical cross-engine —
    * an approximate operator whose approximation is hash-checked, like
    * the minhash/PQ pipelines. Small-range linear counting included
    * (same branch condition both engines; fixture scales take the raw
    * branch).
    *
    * Scale: ONE (group, bucket)-keyed max aggregation over a mapped
    * scan (the sketch build — map-side combine, ≤ #groups·256 rows
    * out), then constant-sized arithmetic. This is the whole point of
    * HLL at 100 TB: the shuffle carries registers, not keys. */
  def hllPortable(s: SparkSession, d: String): DataFrame = {
    val m = HllM
    val reg = Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        Dedup.md5hash60(col("l_partkey").cast("string")).as("h"))
      .select(col("l_returnflag"), (col("h") % m).as("bucket"),
        expr(s"h div $m").as("rest"))
      .select(col("l_returnflag"), col("bucket"),
        when(col("rest") === 0L, lit(53))
          .otherwise(lit(53) - length(bin(col("rest")))).as("rho"))
      .groupBy("l_returnflag", "bucket").agg(max("rho").as("mj"))
    val z = reg.groupBy("l_returnflag")
      .agg(count(lit(1)).as("nb"),
        expr("sum(1.0 / shiftleft(cast(1 as bigint), mj))").as("zp"))
      .select(col("l_returnflag"), (lit(m) - col("nb")).as("v"),
        expr(s"$hllAlphaM2 / (zp + cast($m - nb as double))").as("raw"))
    val exact = Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n_exact"))
    z.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n_exact"),
        round(when(col("raw") <= lit(2.5 * m) && col("v") > 0,
            expr(s"$m * ln(cast($m as double) / v)"))
          .otherwise(col("raw")), 6).as("hll_est"),
        round(expr("abs(raw / n_exact - 1.0) * 100.0"), 6).as("raw_err_pct"))
      .orderBy("l_returnflag")
  }

  /** DuckDB twin of [[hllPortable]] — same hash, registers, dyadic
    * harmonic sum, αm² literal, and correction branch. */
  private[graft] def hllPortableOracle: String =
    s"""WITH h AS (
       |  SELECT l_returnflag,
       |    ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT AS h
       |  FROM lineitem
       |),
       |reg AS (
       |  SELECT l_returnflag, h % $HllM AS bucket,
       |    max(CASE WHEN h // $HllM = 0 THEN 53
       |        ELSE 53 - length(bin(h // $HllM)) END) AS mj
       |  FROM h GROUP BY 1, 2
       |),
       |z AS (
       |  SELECT l_returnflag, $HllM - count(*) AS v,
       |    $hllAlphaM2 /
       |      (sum(1.0 / (1::BIGINT << mj)) + CAST($HllM - count(*) AS DOUBLE))
       |      AS raw
       |  FROM reg GROUP BY 1
       |),
       |ex AS (
       |  SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact
       |  FROM lineitem GROUP BY 1
       |)
       |SELECT z.l_returnflag, ex.n_exact,
       |  round(CASE WHEN z.raw <= ${2.5 * HllM} AND z.v > 0
       |    THEN $HllM * ln(CAST($HllM AS DOUBLE) / z.v) ELSE z.raw END, 6)
       |    AS hll_est,
       |  round(abs(z.raw / ex.n_exact - 1.0) * 100.0, 6) AS raw_err_pct
       |FROM z JOIN ex USING (l_returnflag)
       |ORDER BY l_returnflag""".stripMargin

  /** KMV sketch size. */
  val KmvK = 64

  /** KMV (k-minimum-values / bottom-k) DISTINCT sketch with UNION and
    * INTERSECTION estimation — the mergeable set-cardinality sketch
    * complementing [[hllPortable]]: keep the [[KmvK]] smallest md5-60
    * hash values of each key set; n̂ = (k−1)·2⁶⁰/h₍ₖ₎, the union sketch
    * is the bottom-k of the merged hash sets, and intersection follows
    * Beyer et al. (SIGMOD'07): ρ = |union-sketch ∩ Sᴬ ∩ Sᴮ| / k scaled
    * by the union estimate. Every sketch value is a deterministic hash
    * ORDER STATISTIC — no randomness, no engine RNG — so both engines
    * build byte-identical sketches and the estimates are hash-exact
    * (score arithmetic is one multiply + one divide in fixed order).
    * Audited here: customers (set A) vs order-placing custkeys (set B).
    *
    * Scale: per set, DISTINCT hash → per-partition bottom-k via
    * sort+limit (TakeOrdered — bounded heaps, no full sort) and the
    * k-row frames drive everything downstream; exact counterparts are
    * one distinct-agg each (they're the audit — a production pipeline
    * drops them and keeps only k-row state per set). */
  def kmvSketch(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val k = KmvK
    def hashes(df: DataFrame, c: String): DataFrame =
      df.select(Dedup.md5hash60(col(c).cast("string")).as("h")).distinct()
    // ha/hb each feed exactly one bottomK (itself localCheckpoint'd):
    // the former persists here were pure SQL-cache residue with no
    // reuse to pay for them (r7 VERDICT cache-leak class) — dropped
    val ha = hashes(Tables.customer(s, d), "c_custkey")
    val hb = hashes(Tables.orders(s, d), "o_custkey")
    def bottomK(h: DataFrame): DataFrame = h.orderBy("h").limit(k)
    val (ska, skb) = (bottomK(ha).localCheckpoint(),
      bottomK(hb).localCheckpoint())
    val sku = bottomK(ska.union(skb).distinct()).localCheckpoint()
    def est(sk: DataFrame, name: String): DataFrame =
      sk.agg(max("h").as("hk"))
        .select(expr(s"round((${k - 1}e0 * 1152921504606846976) / hk, 6)")
          .as(name))
    val inter = sku
      .join(ska.toDF("h2"), col("h") === col("h2"), "left_semi")
      .join(skb.toDF("h3"), col("h") === col("h3"), "left_semi")
      .agg(count(lit(1)).as("n_common"))
    val exacts = Tables.customer(s, d).agg(
        countDistinct("c_custkey").as("exact_a")).crossJoin(
      Tables.orders(s, d).agg(countDistinct("o_custkey").as("exact_b")))
    exacts
      .crossJoin(broadcast(est(ska, "est_a")))
      .crossJoin(broadcast(est(skb, "est_b")))
      .crossJoin(broadcast(est(sku, "est_union")))
      .crossJoin(broadcast(inter))
      .select(lit(k).as("k"), col("exact_a"), col("est_a"),
        col("exact_b"), col("est_b"), col("est_union"),
        expr("round((n_common * est_union) / 64e0, 6)").as("est_inter"),
        col("n_common"))
  }

  /** DuckDB twin of [[kmvSketch]] — same hashes, bottom-k order
    * statistics, and fixed-order estimate arithmetic. */
  private[graft] def kmvSketchOracle: String = {
    val k = KmvK
    s"""WITH ha AS (
       |  SELECT DISTINCT ('0x' || substr(md5(c_custkey::VARCHAR), 1, 15))::BIGINT AS h
       |  FROM customer
       |),
       |hb AS (
       |  SELECT DISTINCT ('0x' || substr(md5(o_custkey::VARCHAR), 1, 15))::BIGINT AS h
       |  FROM orders
       |),
       |ska AS (SELECT h FROM ha ORDER BY h LIMIT $k),
       |skb AS (SELECT h FROM hb ORDER BY h LIMIT $k),
       |sku AS (SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb)
       |        ORDER BY h LIMIT $k),
       |ea AS (SELECT round((${k - 1}e0 * 1152921504606846976) / max(h), 6) AS est_a FROM ska),
       |eb AS (SELECT round((${k - 1}e0 * 1152921504606846976) / max(h), 6) AS est_b FROM skb),
       |eu AS (SELECT round((${k - 1}e0 * 1152921504606846976) / max(h), 6) AS est_union FROM sku),
       |ic AS (
       |  SELECT count(*) AS n_common FROM sku
       |  WHERE EXISTS (SELECT 1 FROM ska WHERE ska.h = sku.h)
       |    AND EXISTS (SELECT 1 FROM skb WHERE skb.h = sku.h)
       |),
       |ex AS (
       |  SELECT (SELECT count(DISTINCT c_custkey) FROM customer) AS exact_a,
       |         (SELECT count(DISTINCT o_custkey) FROM orders) AS exact_b
       |)
       |SELECT $k AS k, ex.exact_a, ea.est_a, ex.exact_b, eb.est_b,
       |  eu.est_union, round((ic.n_common * eu.est_union) / 64e0, 6) AS est_inter,
       |  ic.n_common
       |FROM ex, ea, eb, eu, ic""".stripMargin
  }

  /** The numeric lineitem columns [[columnStats]] profiles. */
  val StatsColumns = Seq("l_quantity", "l_extendedprice", "l_discount",
    "l_tax")

  /** ANALYZE-style COLUMN STATISTICS — per numeric fact column: row and
    * null counts, exact NDV, min/max, and the DECIMAL-exact sum. These
    * are the statistics a cost-based optimizer (and a pipeline-health
    * dashboard) feeds on; computing them is the canonical
    * many-aggregates-one-pass shape.
    *
    * Scale: ONE scan computes every aggregate — but the four DISTINCT
    * aggregates make Catalyst plan an Expand (each input row is
    * replicated once per distinct column + once for the plain
    * aggregates, ×5 here) feeding the partial agg; still a single
    * pass with map-side combine, and the measured local cost (~4.7 s
    * at sf0.1 vs ~0.5 s single-agg queries) is exactly that
    * replication. At 100 TB, trade exact NDV for [[hllPortable]]'s
    * register sketch per column — the Expand disappears and the
    * shuffle carries registers. The 1×N result unpivots via `stack`. */
  def columnStats(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // One TWO-LEVEL aggregation branch per column instead of one
    // 4-distinct aggregate (r21, guide §2.3 "aggregate before you
    // shuffle"): the multi-distinct plan replicates every row once per
    // distinct column + once for the plain aggregates (Expand ×5 — 3M
    // rows through a single hash aggregate at sf0.1, measured 3.5 s)
    // whereas group-by-value first dedupes map-side, so each branch
    // shuffles at most the per-partition distinct values of ONE column
    // and the weighted second level is group-count-sized. The branches
    // are independent subtrees of one union — Spark runs their stages
    // concurrently, and each scan prunes to its single column.
    // Identical output: n = per-value multiplicity, so sum(n) = count,
    // sum(v·n) in DECIMAL = the exact row-wise DECIMAL sum, and
    // count(v IS NOT NULL groups) = exact NDV (countDistinct skips
    // nulls; the null group is excluded the same way).
    val branches = StatsColumns.map { c =>
      li.select(col(c).as("v"))
        .groupBy("v").agg(count(lit(1)).as("n"))
        .agg(
          coalesce(sum("n"), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("n")).otherwise(0L)),
            lit(0L)).as("n_nulls"),
          count(when(col("v").isNotNull, 1)).as("n_distinct"),
          min(col("v")).cast("double").as("min_val"),
          max(col("v")).cast("double").as("max_val"),
          sum(col("v").cast(DecimalType(18, 6)) * col("n")).cast("double")
            .as("sum_val"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"), col("sum_val"))
    }
    branches.reduce(_ unionByName _).orderBy("column_name")
  }

  /** SKETCH twin of [[columnStats]] — the documented 100 TB default
    * (r7 VERDICT item 6): the same per-column profile with the exact
    * NDV (the Expand ×5 the exact twin pays) replaced by the
    * [[hllPortable]] register sketch per column. The plan has NO
    * Expand and ONE pass: the columns unpivot through one `stack`
    * projection (map-side Generate), and counts, min/max/sum AND the
    * register sketch ([[graft.functions.HllRegAgg]], an m-int
    * elementwise-max buffer) ride the SAME partial+final aggregation —
    * the shuffle carries 4 stat rows with their register arrays, not
    * distinct values (exact NDV) and not a second register
    * aggregation + join-back (the first r8 formulation; fusing removed
    * its extra scan and its broadcast join). The exact variant stays
    * as the audit.
    *
    * Parity: HLL hashes the value QUANTIZED to 1e-6 grain
    * (`floor(v·10⁶)` as BIGINT → string → md5-60) — integer strings
    * render identically in both engines, sidestepping double→VARCHAR
    * formatting divergence; the source columns carry ≤ 2 decimal
    * places, so quantization is NDV-lossless. The estimate itself is
    * the [[hllPortable]] dyadic-rational arithmetic — bit-identical
    * cross-engine, so `ndv_est` is hash-checked, not bounds-checked. */
  def columnStatsSketch(s: SparkSession, d: String): DataFrame = {
    val m = HllM
    // DEDUPE-BEFORE-HASH, one branch per column (r21, guide §1.2 step 2
    // — per-task work): the md5-60 chain (bigint → string → md5 →
    // conv) dominated the fused single-pass formulation at 4 hashes
    // per row (2.4M evaluations at sf0.1, measured 3.9 s). Registers
    // are an elementwise MAX, so hashing each DISTINCT value once
    // yields bit-identical registers to hashing every occurrence —
    // group by value first (map-side combine, narrow shuffle), then
    // hash the ~NDV survivors (583k vs 2.4M here; the null group's
    // hash is null and HllRegAgg skips it, matching the relational
    // formulation's WHERE v IS NOT NULL). counts/min/max/sum ride the
    // same second level in weighted form — sum(v·n) in DECIMAL is the
    // exact row-wise sum; see columnStats for the equivalence notes.
    val branches = StatsColumns.map { c =>
      Tables.lineitem(s, d).select(col(c).as("v"))
        .groupBy("v").agg(count(lit(1)).as("n"))
        .agg(
          coalesce(sum("n"), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("n")).otherwise(0L)),
            lit(0L)).as("n_nulls"),
          min(col("v")).cast("double").as("min_val"),
          max(col("v")).cast("double").as("max_val"),
          sum(col("v").cast(DecimalType(18, 6)) * col("n")).cast("double")
            .as("sum_val"),
          graft.functions.HllRegAgg(
            Dedup.md5hash60(
              expr("cast(floor(v * 1000000.0) as bigint)").cast("string")),
            m).as("regs"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("min_val"), col("max_val"), col("sum_val"), col("regs"))
    }
    val one = branches.reduce(_ unionByName _)
    // estimate arithmetic per 4-row result: occupied registers, the
    // dyadic-rational harmonic sum (explicit DOUBLE division — exact
    // powers of two, association-order-free, replicated by the oracle's
    // GROUP BY formulation), the shared αm² literal, correction branch.
    // All-null column degenerate case: zero registers → nb = 0 →
    // linear counting gives m·ln(m/m) = 0.0, the oracle's coalesce.
    one
      .withColumn("nb", expr("size(filter(regs, x -> x > 0))"))
      .withColumn("zp", expr(
        "aggregate(filter(regs, x -> x > 0), cast(0.0 as double), " +
          "(acc, x) -> acc + cast(1.0 as double) / " +
          "cast(shiftleft(cast(1 as bigint), x) as double))"))
      .withColumn("raw", expr(s"$hllAlphaM2 / (zp + cast($m - nb as double))"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        round(when(col("raw") <= lit(2.5 * m) && col("nb") < m,
            expr(s"$m * ln(cast($m as double) / cast($m - nb as double))"))
          .otherwise(col("raw")), 6).as("ndv_est"),
        col("min_val"), col("max_val"), col("sum_val"))
      .orderBy("column_name")
  }

  /** DuckDB twin of [[columnStatsSketch]] — same unpivot, quantized
    * hash, registers, dyadic sum and correction branch. */
  private[graft] def columnStatsSketchOracle: String = {
    val unions = StatsColumns.map(c =>
      s"SELECT '$c' AS column_name, $c AS v FROM lineitem")
      .mkString("\n  UNION ALL ")
    s"""WITH st AS MATERIALIZED (
       |  $unions
       |),
       |stats AS (
       |  SELECT column_name, count(*) AS n_rows,
       |    CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_nulls,
       |    CAST(min(v) AS DOUBLE) AS min_val,
       |    CAST(max(v) AS DOUBLE) AS max_val,
       |    CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS sum_val
       |  FROM st GROUP BY 1
       |),
       |h AS (
       |  SELECT column_name,
       |    ('0x' || substr(md5(CAST(floor(v * 1000000.0) AS BIGINT)::VARCHAR),
       |      1, 15))::BIGINT AS h
       |  FROM st WHERE v IS NOT NULL
       |),
       |reg AS (
       |  SELECT column_name, h % $HllM AS bucket,
       |    max(CASE WHEN h // $HllM = 0 THEN 53
       |        ELSE 53 - length(bin(h // $HllM)) END) AS mj
       |  FROM h GROUP BY 1, 2
       |),
       |z AS (
       |  SELECT column_name, $HllM - count(*) AS v,
       |    $hllAlphaM2 /
       |      (sum(1.0 / (1::BIGINT << mj)) + CAST($HllM - count(*) AS DOUBLE))
       |      AS raw
       |  FROM reg GROUP BY 1
       |),
       |est AS (
       |  SELECT column_name,
       |    round(CASE WHEN raw <= ${2.5 * HllM} AND v > 0
       |      THEN $HllM * ln(CAST($HllM AS DOUBLE) / v) ELSE raw END, 6)
       |      AS ndv_est
       |  FROM z
       |)
       |SELECT s.column_name, s.n_rows, s.n_nulls,
       |  coalesce(e.ndv_est, 0.0e0) AS ndv_est,
       |  s.min_val, s.max_val, s.sum_val
       |FROM stats s LEFT JOIN est e USING (column_name)
       |ORDER BY column_name""".stripMargin
  }

  /** DuckDB twin of [[columnStats]] — one SELECT per column, unioned. */
  private[graft] def columnStatsOracle: String = {
    val blocks = StatsColumns.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_val,
         |  CAST(max($c) AS DOUBLE) AS max_val,
         |  CAST(sum(CAST($c AS DECIMAL(18,6))) AS DOUBLE) AS sum_val
         |FROM lineitem""".stripMargin
    }
    blocks.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY column_name")
  }

  /** RFM tercile cutpoints — written with an `e0` exponent in the oracle
    * so DuckDB parses them as DOUBLE (a bare 0.33 literal is DECIMAL
    * there, and ceil(q·tot) in decimal vs double arithmetic can pick
    * adjacent ranks). */
  val RfmQ1 = 0.33
  val RfmQ2 = 0.67
  /** Histogram-sketch declared ranges per metric (value clamps into the
    * edge bins outside them): recency days [0, 4096]@1/bin, order count
    * [0, 64]@1/bin, monetary [0, 2^24]@4096/bin. */
  val RfmRecencyHi = 4096.0
  val RfmRecencyBins = 4096
  val RfmFreqHi = 64.0
  val RfmFreqBins = 64
  val RfmMonetaryHi = 16777216.0
  val RfmMonetaryBins = 4096

  /** RFM SEGMENTATION — the classic customer-value cube: per customer,
    * Recency (days since last order), Frequency (order count), Monetary
    * (lifetime spend), each scored 1-3 against corpus tercile cutpoints
    * and concatenated into a segment label (R3F3M3 = recent frequent
    * big-spender). The cutpoints come from the deterministic mergeable
    * histogram sketch ([[graft.functions.HistQuantileAgg]]) — exactly
    * replicable in SQL, partitioning-independent — so scores are
    * bit-identical cross-engine; monetary sums in DECIMAL (exact,
    * order-free) and casts to double once.
    *
    * Scale: one partial+final agg by customer builds the metric frame
    * (#customers rows); cutpoints are ONE 6-column sketch aggregate
    * broadcast back; scoring is map-only. The global-max day attaches
    * via a 1-row broadcast, never a driver scalar. */
  def rfm(s: SparkSession, d: String): DataFrame = {
    import graft.functions.HistQuantileAgg
    val o = Tables.orders(s, d).select(col("o_custkey"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("day"),
      col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
    val m = o.groupBy("o_custkey").agg(
      max("day").as("last_day"),
      count(lit(1)).as("n_orders"),
      sum("price").cast("double").as("monetary"))
    val gmax = m.agg(max("last_day").as("gday"))
    val met = m.crossJoin(broadcast(gmax))
      .select(col("o_custkey").as("c_custkey"),
        (col("gday") - col("last_day")).as("recency_days"),
        col("n_orders"), col("monetary"))
      .localCheckpoint() // consumed by the cutpoint agg AND the scoring
    def hq(x: org.apache.spark.sql.Column, hi: Double, bins: Int, q: Double) =
      round(HistQuantileAgg(x, 0.0, hi, bins, q), 9)
    val thr = met.agg(
      hq(col("recency_days").cast("double"), RfmRecencyHi, RfmRecencyBins,
        RfmQ1).as("r1"),
      hq(col("recency_days").cast("double"), RfmRecencyHi, RfmRecencyBins,
        RfmQ2).as("r2"),
      hq(col("n_orders").cast("double"), RfmFreqHi, RfmFreqBins, RfmQ1)
        .as("f1"),
      hq(col("n_orders").cast("double"), RfmFreqHi, RfmFreqBins, RfmQ2)
        .as("f2"),
      hq(col("monetary"), RfmMonetaryHi, RfmMonetaryBins, RfmQ1).as("m1"),
      hq(col("monetary"), RfmMonetaryHi, RfmMonetaryBins, RfmQ2).as("m2"))
    met.crossJoin(broadcast(thr))
      .withColumn("r_score", (lit(3)
        - (col("recency_days") > col("r1")).cast("int")
        - (col("recency_days") > col("r2")).cast("int")))
      .withColumn("f_score", (lit(1)
        + (col("n_orders") > col("f1")).cast("int")
        + (col("n_orders") > col("f2")).cast("int")))
      .withColumn("m_score", (lit(1)
        + (col("monetary") > col("m1")).cast("int")
        + (col("monetary") > col("m2")).cast("int")))
      .select(col("c_custkey"), col("recency_days"), col("n_orders"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        concat(lit("R"), col("r_score"), lit("F"), col("f_score"),
          lit("M"), col("m_score")).as("segment"))
      .orderBy("c_custkey")
  }

  /** One GLOBAL hist-sketch block for the [[rfm]] oracle: two tercile
    * estimates of `valExpr` over `met`, emitted as a 1-row CTE
    * `est_<name>(<name>1, <name>2)` — the same binning/rank/interpolation
    * as HistQuantileAgg. */
  private def rfmHistCtes(valExpr: String, hi: Double, bins: Int,
      name: String): String = {
    val w = hi / bins
    s"""b_$name AS (
       |  SELECT least(greatest(floor(($valExpr::DOUBLE - 0.0) / $w)::BIGINT, 0),
       |    ${bins - 1}) AS bin
       |  FROM met
       |),
       |c_$name AS (SELECT bin, count(*) AS n FROM b_$name GROUP BY 1),
       |cum_$name AS (
       |  SELECT bin, n, sum(n) OVER (ORDER BY bin) AS cum,
       |    sum(n) OVER () AS tot
       |  FROM c_$name
       |),
       |pick_$name AS (
       |  SELECT qq.q, bin, n, cum - n AS cumbefore,
       |    greatest(ceil(qq.q * tot)::BIGINT, 1) AS r,
       |    row_number() OVER (PARTITION BY qq.q ORDER BY bin) AS rn
       |  FROM cum_$name, (VALUES (${RfmQ1}e0), (${RfmQ2}e0)) qq(q)
       |  WHERE cum >= greatest(ceil(qq.q * tot)::BIGINT, 1)
       |),
       |est_$name AS (
       |  SELECT
       |    max(CASE WHEN q = ${RfmQ1}e0 THEN
       |      round(0.0 + $w * bin + $w * ((r - cumbefore)::DOUBLE / n::DOUBLE), 9)
       |    END) AS ${name}1,
       |    max(CASE WHEN q = ${RfmQ2}e0 THEN
       |      round(0.0 + $w * bin + $w * ((r - cumbefore)::DOUBLE / n::DOUBLE), 9)
       |    END) AS ${name}2
       |  FROM pick_$name WHERE rn = 1
       |)""".stripMargin
  }

  /** DuckDB twin of [[rfm]] — exact DECIMAL monetary, the same three
    * sketch blocks, the same strict-greater scoring. */
  private[graft] def rfmOracle: String =
    s"""WITH m0 AS (
       |  SELECT o_custkey,
       |    max(epoch_us(o_orderdate) // 86400000000) AS last_day,
       |    count(*) AS n_orders,
       |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
       |  FROM orders GROUP BY 1
       |),
       |g AS (SELECT max(last_day) AS gday FROM m0),
       |met AS (
       |  SELECT o_custkey AS c_custkey, gday - last_day AS recency_days,
       |    n_orders, monetary
       |  FROM m0, g
       |),
       |${rfmHistCtes("recency_days", RfmRecencyHi, RfmRecencyBins, "r")},
       |${rfmHistCtes("n_orders", RfmFreqHi, RfmFreqBins, "f")},
       |${rfmHistCtes("monetary", RfmMonetaryHi, RfmMonetaryBins, "m")}
       |SELECT c_custkey, recency_days, n_orders, monetary,
       |  3 - (recency_days > r1)::INTEGER - (recency_days > r2)::INTEGER
       |    AS r_score,
       |  1 + (n_orders > f1)::INTEGER + (n_orders > f2)::INTEGER AS f_score,
       |  1 + (monetary > m1)::INTEGER + (monetary > m2)::INTEGER AS m_score,
       |  'R' || (3 - (recency_days > r1)::INTEGER - (recency_days > r2)::INTEGER)
       |    || 'F' || (1 + (n_orders > f1)::INTEGER + (n_orders > f2)::INTEGER)
       |    || 'M' || (1 + (monetary > m1)::INTEGER + (monetary > m2)::INTEGER)
       |    AS segment
       |FROM met, est_r, est_f, est_m
       |ORDER BY c_custkey""".stripMargin

  /** Event-time tumbling windows (batch `window()`; streaming variant in
    * graft.streaming uses the same expression). */
  /** The ordered step sequence [[funnel]] audits. */
  val FunnelSteps = Seq("signup", "click", "purchase")

  /** FUNNEL analysis — ordered-sequence conversion: how many users
    * performed signup → click → purchase IN ORDER (each step strictly
    * after the previous step's FIRST occurrence — the standard
    * first-touch funnel). One row per step with the users reaching it
    * and the conversion rate from the previous step.
    *
    * Each stage is an equi-join on user_id of the (user, first-ts)
    * frame from the previous stage against one event-type slice,
    * followed by a min aggregate — #users-sized frames throughout, no
    * windows, no self-join of the full event table against itself.
    * At 100 TB the per-stage frames stay #users rows and every join
    * partitions by user_id. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    // stage 0: every active user, with a sentinel "first ts" before time
    val all = ev.groupBy("user_id").agg((min("us") - 1).as("prev_us"))
    val stages = FunnelSteps.scanLeft(all) { (prev, step) =>
      ev.filter(col("event_type") === step)
        .join(prev, "user_id")
        .filter(col("us") > col("prev_us"))
        .groupBy("user_id").agg(min("us").as("prev_us"))
    }
    val counts = stages.zip("any" +: FunnelSteps).map { case (df, name) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(name).as("step"), col("n_users"))
    }
    val numbered = counts.zipWithIndex.map { case (df, i) =>
      df.select(lit(i).as("step_idx"), col("step"), col("n_users"))
    }.reduce(_ union _)
    // conversion vs the previous step: a tiny (#steps-row) self-join
    val prevs = numbered.select((col("step_idx") + 1).as("step_idx"),
      col("n_users").as("prev_users"))
    numbered.join(prevs, Seq("step_idx"), "left")
      .select(col("step_idx"), col("step"), col("n_users"),
        round(col("n_users").cast("double") /
          coalesce(col("prev_users"), col("n_users")), 6).as("conv_rate"))
      .orderBy("step_idx")
  }

  /** COHORT RETENTION — the other half of the product-analytics pair
    * with [[funnel]]: users cohorted by their FIRST active day, with
    * day-1 and day-7 return rates per cohort. The distinct
    * (user, active-day) frame collapses the event volume first (one
    * partial+final distinct — the only corpus-sized work), the cohort
    * frame is #users rows, and the report is #days rows. Conditional
    * `countDistinct(when(age = k))` folds both retention horizons into
    * ONE aggregation pass instead of one self-join per horizon. */
  /** EXACT per-group MEDIAN over a BOUNDED value domain — the third
    * point of the quantile trade-off triangle the suite documents:
    * `rel_percentiles` (engine sketches, tolerance-checked),
    * `rel_hist_quantiles` (portable fixed-bin sketch, cross-engine
    * exact), and THIS — when the value domain is small (l_quantity ∈
    * 1..50), the exact median costs one (group × value) count plus a
    * ≤|domain|² triangle join, beating any sketch on both accuracy and
    * cost. Lower/upper medians are rank-selected on cumulative counts
    * (2·cum ≥ n / 2·cum ≥ n+1 — integer arithmetic, no interpolation
    * ambiguity); the midpoint is one IEEE add/divide, identical both
    * engines. The same shape computes ANY exact percentile on bounded
    * domains (status codes, star ratings, bucketed latencies).
    *
    * Scale: one partial+final (group, value) count — map-side combined,
    * the only corpus-sized stage — then group×|domain| frames. No
    * window, no global sort before the output ORDER BY. */
  /** Domain-size refusal bound for [[exactMedian]]: the cumulative
    * triangle join is |distinct values|² per group. Past this, the
    * domain isn't "bounded" and the sketches are the right tool. */
  val MaxMedianDomain = 10000L

  def exactMedian(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"),
        col("l_quantity").cast("long").as("v"))
      .groupBy("grp", "v").agg(count(lit(1)).as("c"))
      .localCheckpoint() // guard + three consumers
    val domRow = counts.groupBy("grp").agg(count(lit(1)).as("nv"))
      .agg(max("nv")).head()
    val dom = if (domRow.isNullAt(0)) 0L else domRow.getLong(0)
    GraftRefusal.check(dom <= MaxMedianDomain,
      s"exactMedian refused: a group has $dom distinct values " +
        s"(> $MaxMedianDomain) - the cumulative triangle join is " +
        "domain^2; use histQuantiles (portable sketch) or percentiles " +
        "(engine sketch) for unbounded domains")
    val cum = counts
      .join(counts.select(col("grp"), col("v").as("v2"), col("c").as("c2")),
        Seq("grp"))
      .filter(col("v2") <= col("v"))
      .groupBy("grp", "v").agg(sum("c2").as("cum"))
    val tot = counts.groupBy("grp").agg(sum("c").as("n"))
    val lo = cum.join(tot, "grp")
      .filter(col("cum") * 2 >= col("n"))
      .groupBy("grp").agg(min("v").as("median_lo"))
    val hi = cum.join(tot, "grp")
      .filter(col("cum") * 2 >= col("n") + 1)
      .groupBy("grp").agg(min("v").as("median_hi"))
    tot.join(lo, "grp").join(hi, "grp")
      .select(col("grp").as("l_returnflag"), col("n"),
        col("median_lo"), col("median_hi"),
        ((col("median_lo") + col("median_hi")) / lit(2.0)).as("median"))
      .orderBy("l_returnflag")
  }

  /** DuckDB twin of [[exactMedian]] — identical rank selection. */
  private[graft] def exactMedianOracle: String =
    s"""WITH counts AS (
       |  SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS v,
       |    count(*) AS c
       |  FROM lineitem GROUP BY 1, 2
       |),
       |cum AS (
       |  SELECT a.grp, a.v, CAST(sum(b.c) AS BIGINT) AS cum
       |  FROM counts a JOIN counts b ON b.grp = a.grp AND b.v <= a.v
       |  GROUP BY 1, 2
       |),
       |tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1),
       |lo AS (
       |  SELECT cum.grp, min(v) AS median_lo FROM cum JOIN tot USING (grp)
       |  WHERE cum * 2 >= n GROUP BY 1),
       |hi AS (
       |  SELECT cum.grp, min(v) AS median_hi FROM cum JOIN tot USING (grp)
       |  WHERE cum * 2 >= n + 1 GROUP BY 1)
       |SELECT tot.grp AS l_returnflag, tot.n, lo.median_lo, hi.median_hi,
       |  (lo.median_lo + hi.median_hi) / 2.0 AS median
       |FROM tot JOIN lo USING (grp) JOIN hi USING (grp)
       |ORDER BY l_returnflag""".stripMargin

  /** BALANCE↔ACTIVITY correlation — exact-moment Pearson r between a
    * customer's account balance (floor dollars — BIGINT-safe moment
    * bound: n·Σy² ≤ 2.3e16 at sf0.1) and their order count: the "is my
    * segmentation signal just wealth?" diagnostic, and the template
    * for any exact two-variable correlation in the engine. All five
    * moments (Σx, Σy, Σxy, Σx², Σy²) are exact BIGINT sums —
    * association-order-free, so both engines agree bit-for-bit — and r
    * is ONE fixed IEEE expression
    * `(n·sxy − sx·sy) / (sqrt(n·sxx − sx²) · sqrt(n·syy − sy²))`
    * written identically in both engines (the
    * [[graft.operators.Similarity]] prototype-cosine rule). Customers
    * with no orders count with x = 0 — they are exactly the mass a
    * wealth-only signal misclassifies.
    *
    * Scale: one custkey-keyed count, one broadcast-joinable per-customer
    * frame, one partial+final 5-moment aggregate → a single row. */
  def balanceActivityCorr(s: SparkSession, d: String): DataFrame = {
    val oc = Tables.orders(s, d).groupBy("o_custkey")
      .agg(count(lit(1)).as("x"))
    val xy = Tables.customer(s, d)
      .join(oc, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("x"), lit(0L)).as("x"),
        floor(col("c_acctbal")).cast("long").as("y"))
    xy.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy"))
      .select(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"),
        col("syy"),
        // zero-variance guard: r is undefined when either column is
        // constant — emit NULL in BOTH engines rather than letting
        // Spark produce NaN/Infinity where DuckDB's 0-divisor rules
        // differ (the lshEval degenerate-input class, ADVICE r6)
        when(expr("n * sxx - sx * sx") === 0 ||
            expr("n * syy - sy * sy") === 0, lit(null).cast("double"))
          .otherwise(round(expr(
            "(n * sxy - sx * sy) / (sqrt(cast(n * sxx - sx * sx as double))" +
              " * sqrt(cast(n * syy - sy * sy as double)))"), 9)).as("r"))
  }

  /** DuckDB twin of [[balanceActivityCorr]] — identical moments and
    * the identical single IEEE expression for r. */
  private[graft] def balanceActivityCorrOracle: String =
    s"""WITH oc AS (
       |  SELECT o_custkey, count(*) AS x FROM orders GROUP BY 1
       |),
       |xy AS (
       |  SELECT COALESCE(oc.x, 0) AS x,
       |    CAST(floor(c_acctbal) AS BIGINT) AS y
       |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey
       |)
       |SELECT n, sx, sy, sxy, sxx, syy,
       |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
       |       THEN NULL
       |       ELSE round((n * sxy - sx * sy)
       |         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       |          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 9)
       |  END AS r
       |FROM (
       |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM xy
       |)""".stripMargin

  /** WEEK-OVER-WEEK revenue deltas — the BI trend shape: per integer
    * week number (epoch-day div 7 — no ISO-week ambiguity), order count
    * and revenue in EXACT cents (double → DECIMAL(18,2) → ×100 BIGINT,
    * the suite's standard money path), the previous week's revenue, and
    * the delta in integer ppm. The week-to-previous attach is a
    * self-join on week − 1 — a week-dimension-sized frame, deliberately
    * NOT a global lag window (unpartitioned windows are banned by
    * PlanLint at any size; the join costs the same here and stays
    * shuffle-partitionable if weeks ever stop being dimension-sized).
    *
    * Scale: one week-keyed partial+final agg over orders, then
    * dimension-sized join/project. */
  def weekOverWeek(s: SparkSession, d: String): DataFrame = {
    val wk = Tables.orders(s, d)
      // o_orderdate reads as TIMESTAMP_NTZ; the cast is identity under
      // the suite's fixed UTC session
      .select(expr(
          "unix_micros(cast(o_orderdate as timestamp)) div 604800000000")
          .as("week"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
          .as("cents"))
      .groupBy("week")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("rev_cents"))
    wk.join(wk.select((col("week") + 1).as("week"),
        col("rev_cents").as("prev_rev_cents")), Seq("week"), "left")
      .select(col("week"),
        date_format((col("week") * 604800).cast("timestamp"), "yyyy-MM-dd")
          .as("week_start"),
        col("n_orders"), col("rev_cents"), col("prev_rev_cents"),
        when(col("prev_rev_cents").isNull, lit(null).cast("long"))
          .otherwise(expr(
            "(rev_cents - prev_rev_cents) * 1000000 div prev_rev_cents"))
          .as("delta_ppm"))
      .orderBy("week")
  }

  /** PER-KEY OLS TREND — the regression sibling of [[weekOverWeek]]'s
    * deltas and [[balanceCorr]]'s Pearson r: per supplier nation, the
    * least-squares fit of monthly 1997 revenue (exact cents) on the
    * month index, ENTIRELY in integer/decimal arithmetic. Moments
    * (Σx, Σx², Σy, Σxy, Σy²) are exact sums (cents BIGINT, y² through
    * DECIMAL), and each reported coefficient is ONE integer division of
    * exact products — slope and intercept in micro-cents/month, fit
    * quality as r²·10⁶ ppm — so no float summation or divide-then-
    * round parity risk exists anywhere (the closed-form ratios
    * (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) etc., cross-multiplied instead of
    * evaluated in doubles). Degenerate slopes (a nation shipping in
    * one month only) NULL via nullif in both engines.
    *
    * Scale: fact scan with a pushed date filter, broadcast
    * supplier→nation dim, a (nation × month)-keyed partial+final agg,
    * then a 25-row closed-form projection — no window, no second scan. */
  def revenueTrend(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val monthly = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("n_name"), expr("cast(month(l_shipdate) as bigint)").as("m"),
        // the suite's PROVEN parity path for the computed discounted
        // price is DECIMAL(28,4) (pricing summary Q1); (18,2) would
        // round real sub-cent fractions with engine-specific ties.
        // Sum exactly at (28,4), then floor to whole cents.
        expr("cast(l_extendedprice * (1 - l_discount) as decimal(28,4))")
          .as("dp"))
      .groupBy("n_name", "m")
      .agg(expr("cast(floor(sum(dp) * 100) as bigint)").as("y"))
    monthly.groupBy("n_name").agg(
        count(lit(1)).as("n_months"),
        sum("m").as("sx"), sum(expr("m * m")).as("sxx"),
        sum("y").as("sy"), sum(expr("m * y")).as("sxy"),
        sum(expr("cast(y as decimal(38,0)) * y")).as("syy"))
      // every product goes through DECIMAL BEFORE multiplying (the
      // eager-DECIMAL overflow discipline): at 100 TB n·Σxy would
      // overflow a BIGINT product, exactly like the oracle's
      // HUGEINT-first casts
      .withColumn("sn", expr("cast(n_months as decimal(38,0)) * sxy - " +
        "cast(sx as decimal(38,0)) * sy"))
      .withColumn("sd", expr("cast(n_months as decimal(38,0)) * sxx - " +
        "cast(sx as decimal(38,0)) * sx"))
      .select(col("n_name"), col("n_months"),
        expr("cast((sn * 1000000) div nullif(sd, 0) as bigint)")
          .as("slope_micro_cents"),
        expr("cast(((cast(sy as decimal(38,0)) * sxx - " +
          "cast(sx as decimal(38,0)) * sxy) * 1000000) " +
          "div nullif(sd, 0) as bigint)").as("intercept_micro_cents"),
        expr("cast((sn * sn * 1000000) div nullif(sd * " +
          "(cast(n_months as decimal(38,0)) * syy - " +
          "cast(sy as decimal(38,0)) * sy), 0) as bigint)").as("r2_ppm"))
      .orderBy("n_name")
  }

  /** DuckDB twin of [[revenueTrend]]. */
  private[graft] def revenueTrendOracle: String =
    """WITH sup AS (
      |  SELECT s_suppkey, n_name FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |),
      |mo AS (
      |  SELECT n_name, month(l_shipdate)::BIGINT AS m,
      |    CAST(floor(sum(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(28,4))) * 100) AS BIGINT) AS y
      |  FROM lineitem JOIN sup ON l_suppkey = s_suppkey
      |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      |  GROUP BY 1, 2
      |),
      |f AS (
      |  SELECT n_name, count(*)::BIGINT AS n_months,
      |    sum(m)::BIGINT AS sx, sum(m * m)::BIGINT AS sxx,
      |    sum(y)::BIGINT AS sy, sum(m * y)::BIGINT AS sxy,
      |    sum(y::HUGEINT * y) AS syy
      |  FROM mo GROUP BY 1
      |)
      |SELECT n_name, n_months,
      |  (((n_months::HUGEINT * sxy - sx::HUGEINT * sy) * 1000000)
      |    // nullif(n_months::HUGEINT * sxx - sx::HUGEINT * sx, 0))::BIGINT
      |    AS slope_micro_cents,
      |  (((sy::HUGEINT * sxx - sx::HUGEINT * sxy) * 1000000)
      |    // nullif(n_months::HUGEINT * sxx - sx::HUGEINT * sx, 0))::BIGINT
      |    AS intercept_micro_cents,
      |  (((n_months::HUGEINT * sxy - sx::HUGEINT * sy)
      |    * (n_months::HUGEINT * sxy - sx::HUGEINT * sy) * 1000000)
      |    // nullif((n_months::HUGEINT * sxx - sx::HUGEINT * sx)
      |      * (n_months::HUGEINT * syy - sy::HUGEINT * sy), 0))::BIGINT
      |    AS r2_ppm
      |FROM f ORDER BY n_name""".stripMargin

  /** MARKET-CONCENTRATION indices — the antitrust/portfolio lens on the
    * same revenue census [[revenueTrend]] fits: per supplier nation over
    * its suppliers' 1997 revenue, the Herfindahl–Hirschman index
    * Σ(shareᵢ)², the Gini coefficient via the sorted-rank identity
    * (2·Σ i·yᵢ − (n+1)·Y) / (n·Y), and the largest single-supplier
    * share — each ONE integer division of exact DECIMAL
    * cross-products (ppm), ranks from a per-nation window with the
    * (y, suppkey) total order so ties are deterministic rather than
    * midrank-averaged (documented choice; both engines rank
    * identically).
    *
    * Scale: same pushed-filter fact scan + broadcast dim as the trend;
    * the window partitions by nation over supplier-sized groups
    * (bounded, never a global sort); the final frame is 25 rows. */
  def marketConcentration(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("n_name"), col("s_suppkey"),
        expr("cast(l_extendedprice * (1 - l_discount) as decimal(28,4))")
          .as("dp"))
      .groupBy("n_name", "s_suppkey")
      .agg(expr("cast(floor(sum(dp) * 100) as bigint)").as("y"))
    rev.withColumn("i", row_number().over(
        Window.partitionBy("n_name").orderBy(col("y"), col("s_suppkey"))))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        sum("y").as("total_cents"), max("y").as("max_cents"),
        sum(expr("cast(cast(i as decimal(38,0)) * y as decimal(38,0))"))
          .as("siy"),
        sum(expr("cast(y as decimal(38,0)) * y")).as("syy"))
      .select(col("n_name"), col("n_suppliers"), col("total_cents"),
        expr("cast((cast(max_cents as decimal(38,0)) * 1000000) " +
          "div nullif(total_cents, 0) as bigint)").as("top_share_ppm"),
        expr("cast((syy * 1000000) div nullif(" +
          "cast(total_cents as decimal(38,0)) * total_cents, 0) as bigint)")
          .as("hhi_ppm"),
        expr("cast(((2 * siy - (cast(n_suppliers as decimal(38,0)) + 1) " +
          "* total_cents) * 1000000) div nullif(" +
          "cast(n_suppliers as decimal(38,0)) * total_cents, 0) as bigint)")
          .as("gini_ppm"))
      .orderBy("n_name")
  }

  /** PARETO COVERAGE — [[marketConcentration]]'s actionable sibling: per
    * nation, the smallest number of top suppliers covering ≥80% of 1997
    * revenue (the "how many vendors until four-fifths" consolidation
    * question), plus that count as a ppm share of the supplier base.
    * Descending running sums come from a per-nation window (bounded
    * partitions); the 80% test is the integer cross-multiplication
    * `100·cum ≥ 80·total` — no percentage floats anywhere.
    *
    * Scale: identical scan/dim shape to the concentration query; the
    * windows partition by nation; result is 25 rows. */
  def paretoCoverage(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("n_name"), col("s_suppkey"),
        expr("cast(l_extendedprice * (1 - l_discount) as decimal(28,4))")
          .as("dp"))
      .groupBy("n_name", "s_suppkey")
      .agg(expr("cast(floor(sum(dp) * 100) as bigint)").as("y"))
    val w = Window.partitionBy("n_name")
      .orderBy(col("y").desc, col("s_suppkey"))
    rev.withColumn("i", row_number().over(w))
      .withColumn("cum", sum("y").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum("y").over(Window.partitionBy("n_name")))
      .groupBy("n_name")
      .agg(max("i").as("n_suppliers"), max("tot").as("total_cents"),
        min(when(expr("cum * 100 >= tot * 80"), col("i")))
          .cast("long").as("k_80"))
      .withColumn("k_80_share_ppm",
        expr("k_80 * 1000000 div nullif(n_suppliers, 0)"))
      .select(col("n_name"), col("n_suppliers").cast("long").as("n_suppliers"),
        col("total_cents"), col("k_80"), col("k_80_share_ppm"))
      .orderBy("n_name")
  }

  /** DuckDB twin of [[paretoCoverage]]. */
  private[graft] def paretoCoverageOracle: String =
    """WITH sup AS (
      |  SELECT s_suppkey, n_name FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |),
      |rev AS (
      |  SELECT n_name, s_suppkey,
      |    CAST(floor(sum(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(28,4))) * 100) AS BIGINT) AS y
      |  FROM lineitem JOIN sup ON l_suppkey = s_suppkey
      |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      |  GROUP BY 1, 2
      |),
      |rk AS (
      |  SELECT n_name, y,
      |    row_number() OVER (PARTITION BY n_name ORDER BY y DESC, s_suppkey)
      |      ::BIGINT AS i,
      |    sum(y) OVER (PARTITION BY n_name ORDER BY y DESC, s_suppkey
      |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
      |    sum(y) OVER (PARTITION BY n_name)::BIGINT AS tot
      |  FROM rev
      |)
      |SELECT n_name, max(i)::BIGINT AS n_suppliers,
      |  max(tot)::BIGINT AS total_cents,
      |  min(CASE WHEN cum * 100 >= tot * 80 THEN i END)::BIGINT AS k_80,
      |  (min(CASE WHEN cum * 100 >= tot * 80 THEN i END) * 1000000
      |    // nullif(max(i), 0))::BIGINT AS k_80_share_ppm
      |FROM rk GROUP BY 1 ORDER BY n_name""".stripMargin

  /** DuckDB twin of [[marketConcentration]]. */
  private[graft] def marketConcentrationOracle: String =
    """WITH sup AS (
      |  SELECT s_suppkey, n_name FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |),
      |rev AS (
      |  SELECT n_name, s_suppkey,
      |    CAST(floor(sum(CAST(l_extendedprice * (1 - l_discount)
      |      AS DECIMAL(28,4))) * 100) AS BIGINT) AS y
      |  FROM lineitem JOIN sup ON l_suppkey = s_suppkey
      |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
      |  GROUP BY 1, 2
      |),
      |rk AS (
      |  SELECT n_name, y,
      |    row_number() OVER (PARTITION BY n_name ORDER BY y, s_suppkey)
      |      ::BIGINT AS i
      |  FROM rev
      |),
      |f AS (
      |  SELECT n_name, count(*)::BIGINT AS n_suppliers,
      |    sum(y)::BIGINT AS total_cents, max(y)::BIGINT AS max_cents,
      |    sum(i::HUGEINT * y) AS siy, sum(y::HUGEINT * y) AS syy
      |  FROM rk GROUP BY 1
      |)
      |SELECT n_name, n_suppliers, total_cents,
      |  ((max_cents::HUGEINT * 1000000) // nullif(total_cents, 0))::BIGINT
      |    AS top_share_ppm,
      |  ((syy * 1000000) // nullif(total_cents::HUGEINT * total_cents, 0))
      |    ::BIGINT AS hhi_ppm,
      |  (((2 * siy - (n_suppliers::HUGEINT + 1) * total_cents) * 1000000)
      |    // nullif(n_suppliers::HUGEINT * total_cents, 0))::BIGINT
      |    AS gini_ppm
      |FROM f ORDER BY n_name""".stripMargin

  /** DuckDB twin of [[weekOverWeek]]. */
  private[graft] def weekOverWeekOracle: String =
    s"""WITH wk AS (
       |  SELECT epoch_us(o_orderdate) // 604800000000 AS week,
       |    count(*) AS n_orders,
       |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
       |      AS BIGINT) AS rev_cents
       |  FROM orders GROUP BY 1
       |)
       |SELECT a.week,
       |  strftime(epoch_ms(a.week * 604800000), '%Y-%m-%d') AS week_start,
       |  a.n_orders, a.rev_cents, p.rev_cents AS prev_rev_cents,
       |  CASE WHEN p.rev_cents IS NULL THEN NULL
       |       ELSE CAST((a.rev_cents - p.rev_cents) * 1000000
       |         // p.rev_cents AS BIGINT) END AS delta_ppm
       |FROM wk a LEFT JOIN wk p ON p.week = a.week - 1
       |ORDER BY a.week""".stripMargin

  /** Inactivity horizon (days) separating a "returning" user from a
    * "resurrected" one, and defining churn. Shared with the oracle. */
  val ChurnDays = 7L

  /** USER-LIFECYCLE growth accounting — the standard DAU decomposition
    * ([[retention]] tracks cohorts forward; this classifies each active
    * day): per day, active users split into `new` (first day ever),
    * `retained` (active yesterday), `returning` (gap 2..[[ChurnDays]]),
    * `resurrected` (gap > [[ChurnDays]]), plus `n_churning` — users for
    * whom this is the last active day within the horizon (lookahead
    * `lead`), the churn mass growth accounting subtracts. All classes
    * are exact day-number arithmetic (`unix_micros div 86400000000` —
    * no timezone or DST ambiguity), so the split is bit-deterministic
    * and n_new + n_retained + n_returning + n_resurrected = n_active by
    * construction.
    *
    * Scale: distinct (user, day) is a partial+final dedup; the
    * classification windows are PARTITIONED BY user (keyed lag/lead, no
    * funnel); the day rollup is dimension-sized. */
  def lifecycle(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val classed = ud
      .withColumn("prev", lag("day", 1).over(w))
      .withColumn("nxt", lead("day", 1).over(w))
      .select(col("day"),
        when(col("prev").isNull, "new")
          .when(col("day") - col("prev") === 1, "retained")
          .when(col("day") - col("prev") <= ChurnDays, "returning")
          .otherwise("resurrected").as("cls"),
        (col("nxt").isNull || col("nxt") - col("day") > ChurnDays)
          .as("lastd"))
    classed.groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        count(when(col("cls") === "new", 1)).as("n_new"),
        count(when(col("cls") === "retained", 1)).as("n_retained"),
        count(when(col("cls") === "returning", 1)).as("n_returning"),
        count(when(col("cls") === "resurrected", 1)).as("n_resurrected"),
        count(when(col("lastd"), 1)).as("n_churning"))
      .select(date_format((col("day") * 86400).cast("timestamp"),
          "yyyy-MM-dd").as("day"),
        col("n_active"), col("n_new"), col("n_retained"),
        col("n_returning"), col("n_resurrected"), col("n_churning"))
      .orderBy("day")
  }

  /** DuckDB twin of [[lifecycle]] — same day numbers, windows, classes. */
  private[graft] def lifecycleOracle: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
       |  FROM events
       |),
       |lg AS (
       |  SELECT day, user_id,
       |    lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
       |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt
       |  FROM ud
       |),
       |cl AS (
       |  SELECT day,
       |    CASE WHEN prev IS NULL THEN 'new'
       |         WHEN day - prev = 1 THEN 'retained'
       |         WHEN day - prev <= $ChurnDays THEN 'returning'
       |         ELSE 'resurrected' END AS cls,
       |    (nxt IS NULL OR nxt - day > $ChurnDays) AS lastd
       |  FROM lg
       |)
       |SELECT strftime(epoch_ms(day * 86400000), '%Y-%m-%d') AS day,
       |  count(*) AS n_active,
       |  count(CASE WHEN cls = 'new' THEN 1 END) AS n_new,
       |  count(CASE WHEN cls = 'retained' THEN 1 END) AS n_retained,
       |  count(CASE WHEN cls = 'returning' THEN 1 END) AS n_returning,
       |  count(CASE WHEN cls = 'resurrected' THEN 1 END) AS n_resurrected,
       |  count(CASE WHEN lastd THEN 1 END) AS n_churning
       |FROM cl GROUP BY cl.day ORDER BY 1""".stripMargin

  /** MAU horizon (days) for [[stickiness]]. */
  val MauDays = 30L

  /** DAU/MAU STICKINESS — the growth metric [[lifecycle]]'s class
    * split feeds: per active day, the exact distinct-user count that
    * day (DAU), in the trailing [[MauDays]]-day window (MAU), and
    * their ratio in integer ppm (the "how often do monthly users show
    * up daily" dial; 1e6/30 ≈ 33333 is the pure-churn floor). The
    * trailing distinct is computed by fanning each (user, day) row out
    * to the ≤ [[MauDays]] active days it can serve — a BOUNDED ×30
    * row multiplier (just the band-join trade written as a constant),
    * then one exact distinct count per day; no sliding-window distinct
    * state, no window function at all.
    *
    * Scale: distinct (user, day) is a partial+final dedup; the fan-out
    * is 30× that frame with map-side combine into a day-dimension
    * result. At 100 TB the 30× multiplier is the explicit, fixed price
    * of EXACT trailing distincts — swap in the portable HLL sketch
    * (`rel_hll_portable`) when ±2% MAU is acceptable. */
  def stickiness(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
      .localCheckpoint() // DAU + fan-out + day scaffold
    val days = ud.select("day").distinct()
    val dau = ud.groupBy("day").agg(countDistinct("user_id").as("dau"))
    // (user, day) serves every scaffold day in [day, day + 29] that is
    // itself an active day — join via the fan-out then distinct-count
    val mau = ud
      .select(col("user_id"),
        explode(expr(s"sequence(day, day + ${MauDays - 1})")).as("day"))
      .join(days, Seq("day"), "left_semi")
      .groupBy("day").agg(countDistinct("user_id").as("mau"))
    dau.join(mau, "day")
      .select(
        date_format((col("day") * 86400).cast("timestamp"), "yyyy-MM-dd")
          .as("day"),
        col("dau"), col("mau"),
        expr("dau * 1000000 div mau").as("stickiness_ppm"))
      .orderBy("day")
  }

  /** DuckDB twin of [[stickiness]] — identical fan-out and day gate. */
  private[graft] def stickinessOracle: String =
    s"""WITH ud AS MATERIALIZED (
       |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
       |  FROM events
       |),
       |days AS (SELECT DISTINCT day FROM ud),
       |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
       |fan AS (
       |  SELECT ud.user_id, t.d AS day
       |  FROM ud, unnest(generate_series(ud.day, ud.day + ${MauDays - 1})) t(d)
       |),
       |mau AS (
       |  SELECT f.day, count(DISTINCT f.user_id) AS mau
       |  FROM fan f JOIN days ON f.day = days.day GROUP BY 1
       |)
       |SELECT strftime(epoch_ms(dau.day * 86400000), '%Y-%m-%d') AS day,
       |  dau.dau, mau.mau,
       |  CAST((dau.dau * 1000000) // mau.mau AS BIGINT) AS stickiness_ppm
       |FROM dau JOIN mau ON dau.day = mau.day
       |ORDER BY day""".stripMargin

  def retention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val first = ev.groupBy("user_id").agg(min("day").as("cohort"))
    ev.join(first, "user_id")
      .select(col("cohort"), col("user_id"),
        datediff(col("day"), col("cohort")).as("age"))
      .groupBy("cohort").agg(
        countDistinct("user_id").as("n_users"),
        countDistinct(when(col("age") === 1, col("user_id"))).as("n_d1"),
        countDistinct(when(col("age") === 7, col("user_id"))).as("n_d7"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("n_users"), col("n_d1"), col("n_d7"),
        round(col("n_d1").cast("double") / col("n_users"), 6).as("rate_d1"),
        round(col("n_d7").cast("double") / col("n_users"), 6).as("rate_d7"))
      .orderBy("cohort_day")
  }

  /** TIME-RANGE window frames — the per-row trailing aggregate surface
    * (`RANGE BETWEEN <interval> PRECEDING AND CURRENT ROW`): for every
    * event, the same user's event count and value sum over the
    * preceding 10 minutes INCLUDING peers at the same timestamp (RANGE
    * frames close over ties identically in both engines, so the result
    * is deterministic without a within-timestamp tiebreak). The value
    * sum runs in DECIMAL(18,6) — a double sum would be
    * association-order-sensitive across engines.
    *
    * Scale: one window partitioned by user_id (hash-partitioned
    * Exchange + partition-local sort); state per partition is the
    * 10-minute frame buffer, independent of history length. This is
    * the batch twin of what the watermarked streaming interval join
    * bounds with eviction. */
  def trailingWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-600000000L, 0L)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("value").cast(DecimalType(18, 6)).as("dv"))
      .select(col("event_id"), col("user_id"), col("us"),
        count(lit(1)).over(w).as("n_10m"),
        sum(col("dv")).over(w).cast("double").as("sum_10m"))
      .orderBy("event_id")
  }

  def eventTimeWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
        .as("hour_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")

  /** TYPE-2 SLOWLY-CHANGING DIMENSION build — collapse each user's
    * event history into versioned validity intervals of the tracked
    * attribute (`event_type` here): a new version opens whenever the
    * attribute CHANGES (run-length encoding of the ordered history),
    * `valid_from`/`valid_to` bound it half-open, the last version per
    * user is current (`valid_to` NULL). This is the standard
    * changelog→dimension materialization every warehouse load runs.
    *
    * Scale: both windows partition by user_id — per-user bounded state,
    * embarrassingly parallel across users; the emitted SCD frame is
    * #changes rows, far below event volume. Ordering is (us, event_id)
    * so ties are total and both engines agree. */
  def scd2(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(wOrd))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .select(col("user_id"),
        row_number().over(wOrd).cast("int").as("version"),
        col("event_type"), col("us").as("valid_from"),
        lead(col("us"), 1).over(wOrd).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("user_id", "version")
  }

  /** k for [[kAnonymity]] — groups below this size are re-identifiable. */
  val KAnonymityK = 8L

  /** K-ANONYMITY audit over the customer dimension's quasi-identifiers
    * (nation × market segment) — the privacy gate a dataset passes
    * before release/training: every quasi-identifier combination
    * shared by fewer than k individuals is a re-identification risk.
    * Emits one row per equivalence class below k (the violation list a
    * reviewer works through) plus an `ALL`-rollup summary row with the
    * global minimum class size and at-risk row count — `k_anonymous`
    * says whether the release bar is met.
    *
    * Scale: one partial+final count by the quasi-identifier key, a
    * ≤|classes| filter, and a 1-row rollup; the violation list is by
    * definition small (each row < k members). Suppression/
    * generalization (the fix) is a follow-up filter join on this
    * operator's keys. */
  def kAnonymity(s: SparkSession, d: String): DataFrame = {
    val classes = Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("nationkey"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("class_size"))
    val viol = classes.filter(col("class_size") < KAnonymityK)
      .select(lit("class").as("row_type"), col("nationkey"),
        col("segment"), col("class_size"),
        col("class_size").as("n_at_risk"),
        lit(false).as("k_anonymous"))
    val summary = classes.agg(min("class_size").as("min_class"),
        sum(when(col("class_size") < KAnonymityK, col("class_size"))
          .otherwise(0L)).as("n_at_risk"))
      .select(lit("summary").as("row_type"),
        lit(null).cast("long").as("nationkey"),
        lit("ALL").as("segment"), col("min_class").as("class_size"),
        col("n_at_risk"),
        (col("min_class") >= KAnonymityK).as("k_anonymous"))
    viol.union(summary)
      .orderBy(col("row_type"), col("nationkey"), col("segment"))
  }

  /** DuckDB twin of [[kAnonymity]]. */
  private[graft] def kAnonymityOracle: String =
    s"""WITH cls AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       |    c_mktsegment AS segment, count(*) AS class_size
       |  FROM customer GROUP BY 1, 2
       |),
       |viol AS (
       |  SELECT 'class' AS row_type, nationkey, segment, class_size,
       |    class_size AS n_at_risk, false AS k_anonymous
       |  FROM cls WHERE class_size < $KAnonymityK
       |),
       |summ AS (
       |  SELECT 'summary' AS row_type, CAST(NULL AS BIGINT) AS nationkey,
       |    'ALL' AS segment, CAST(min(class_size) AS BIGINT) AS class_size,
       |    CAST(sum(CASE WHEN class_size < $KAnonymityK
       |      THEN class_size ELSE 0 END) AS BIGINT) AS n_at_risk,
       |    min(class_size) >= $KAnonymityK AS k_anonymous
       |  FROM cls
       |)
       |SELECT * FROM (SELECT * FROM viol UNION ALL SELECT * FROM summ)
       |ORDER BY row_type, nationkey NULLS FIRST, segment""".stripMargin

  /** l for [[lDiversity]] — classes whose members' sensitive values
    * span fewer than this many distinct values are homogeneity-attack
    * targets even when k-anonymous. */
  val LDiversityL = 3L

  /** L-DIVERSITY audit (Machanavajjhala et al., ICDE'06) — the
    * homogeneity-attack gate k-anonymity misses: a quasi-identifier
    * class can be large yet reveal everyone's sensitive value if that
    * value is CONSTANT within the class. Per (nation × segment) class,
    * the sensitive attribute is the member customers' order-priority
    * behavior; a class is l-diverse when its members' orders span ≥
    * [[LDiversityL]] distinct priorities (distinct l-diversity — the
    * entropy variant swaps the count for an entropy threshold on the
    * same frame). Customers with no orders contribute no sensitive
    * values, so an order-less class reports 0 and fails — the
    * conservative reading.
    *
    * Scale: one customer⋈orders equi-join shuffled on custkey, then a
    * class-keyed partial+final distinct-count; violation list and the
    * ALL-rollup are class-dimension-sized. Composes with
    * [[kAnonymity]]: a release must pass BOTH gates. */
  def lDiversity(s: SparkSession, d: String): DataFrame =
    lDiversityOn(Tables.customer(s, d), Tables.orders(s, d))

  /** [[lDiversity]] over any customer/orders-shaped pair of frames. */
  private[graft] def lDiversityOn(customer: DataFrame,
      orders: DataFrame): DataFrame = {
    val joined = customer
      .select(col("c_custkey"), col("c_nationkey").cast("long")
        .as("nationkey"), col("c_mktsegment").as("segment"))
      .join(orders.select("o_custkey", "o_orderpriority"),
        col("c_custkey") === col("o_custkey"), "left")
    val classes = joined.groupBy("nationkey", "segment")
      .agg(countDistinct(col("c_custkey")).as("class_size"),
        countDistinct(col("o_orderpriority")).as("n_sensitive"))
    val viol = classes.filter(col("n_sensitive") < LDiversityL)
      .select(lit("class").as("row_type"), col("nationkey"),
        col("segment"), col("class_size"), col("n_sensitive"),
        lit(false).as("l_diverse"))
    val summary = classes.agg(min("n_sensitive").as("min_div"),
        count(when(col("n_sensitive") < LDiversityL, lit(1)))
          .as("n_at_risk"),
        sum("class_size").as("n_rows"))
      .select(lit("summary").as("row_type"),
        lit(null).cast("long").as("nationkey"), lit("ALL").as("segment"),
        col("n_rows").as("class_size"), col("min_div").as("n_sensitive"),
        (col("min_div") >= LDiversityL).as("l_diverse"))
    viol.union(summary)
      .orderBy(col("row_type"), col("nationkey"), col("segment"))
  }

  /** DuckDB twin of [[lDiversity]]. */
  private[graft] def lDiversityOracle: String =
    s"""WITH cls AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       |    c_mktsegment AS segment,
       |    count(DISTINCT c_custkey) AS class_size,
       |    count(DISTINCT o_orderpriority) AS n_sensitive
       |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |  GROUP BY 1, 2
       |),
       |viol AS (
       |  SELECT 'class' AS row_type, nationkey, segment, class_size,
       |    n_sensitive, false AS l_diverse
       |  FROM cls WHERE n_sensitive < $LDiversityL
       |),
       |summ AS (
       |  SELECT 'summary' AS row_type, CAST(NULL AS BIGINT) AS nationkey,
       |    'ALL' AS segment, CAST(sum(class_size) AS BIGINT) AS class_size,
       |    CAST(min(n_sensitive) AS BIGINT) AS n_sensitive,
       |    min(n_sensitive) >= $LDiversityL AS l_diverse
       |  FROM cls
       |)
       |SELECT * FROM (SELECT * FROM viol UNION ALL SELECT * FROM summ)
       |ORDER BY row_type, nationkey NULLS FIRST, segment""".stripMargin

  /** t for [[tCloseness]], in exact ppm (0.1 — the strict end of the
    * 0.1-0.2 working range Li et al. discuss; the fixture's class
    * distributions top out near 0.15, so the strict setting exercises
    * the violation list a release owner actually reviews). */
  val TClosenessT = 100000L

  /** T-CLOSENESS audit (Li, Li & Venkatasubramanian, ICDE'07) — the
    * skewness-attack gate l-diversity misses: a class can span many
    * DISTINCT sensitive values yet still leak if its value DISTRIBUTION
    * differs sharply from the release's global distribution (e.g. 90%
    * URGENT in one class vs 20% globally). Per (nation × segment)
    * class, the Earth Mover's Distance between the class's
    * order-priority distribution and the global one; for categorical
    * attributes under the uniform ground metric EMD is exactly half the
    * L1 distance — computed here in EXACT integer ppm (truncating
    * `div`, identical both engines), so the audit is bit-deterministic.
    * Classes whose members placed NO orders have no distribution and
    * report the conservative maximum (1,000,000 ppm). Composes with
    * [[kAnonymity]] and [[lDiversity]]: a release must pass all three.
    *
    * Scale: one customer⋈orders equi-join shuffled on custkey, two
    * class-keyed partial+final counts, and a class × |values| scaffold
    * (|values| = 5 priorities — broadcast); everything after the join
    * is class-dimension-sized. */
  def tCloseness(s: SparkSession, d: String): DataFrame =
    tClosenessOn(Tables.customer(s, d), Tables.orders(s, d))

  /** [[tCloseness]] over any customer/orders-shaped pair of frames. */
  private[graft] def tClosenessOn(customer: DataFrame,
      orders: DataFrame): DataFrame = {
    val cust = customer.select(col("c_custkey"),
      col("c_nationkey").cast("long").as("nationkey"),
      col("c_mktsegment").as("segment"))
    val j = cust.join(
        orders.select(col("o_custkey"), col("o_orderpriority").as("v")),
        col("c_custkey") === col("o_custkey"))
      .localCheckpoint() // four consumers below
    val classCnt = j.groupBy("nationkey", "segment", "v")
      .agg(count(lit(1)).as("nv"))
    val classTot = j.groupBy("nationkey", "segment")
      .agg(count(lit(1)).as("nt"))
    val glob = j.groupBy("v").agg(count(lit(1)).as("gv"))
    val gtot = j.agg(count(lit(1)).as("gt"))
    val classes = cust.select("nationkey", "segment").distinct()
    val perClass = classes
      .crossJoin(broadcast(glob.crossJoin(gtot)))
      .join(classTot, Seq("nationkey", "segment"), "left")
      .join(classCnt, Seq("nationkey", "segment", "v"), "left")
      .select(col("nationkey"), col("segment"),
        coalesce(col("nt"), lit(0L)).as("nt"),
        when(coalesce(col("nt"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("coalesce(nv, 0) * 1000000 div nt")).as("pc"),
        expr("gv * 1000000 div gt").as("pg"))
      .groupBy("nationkey", "segment")
      .agg(max("nt").as("n_orders"),
        expr("sum(abs(pc - pg)) div 2").as("l1half"))
      .select(col("nationkey"), col("segment"), col("n_orders"),
        when(col("n_orders") === 0, lit(1000000L)).otherwise(col("l1half"))
          .as("tvd_ppm"))
    val viol = perClass.filter(col("tvd_ppm") > TClosenessT)
      .select(lit("class").as("row_type"), col("nationkey"),
        col("segment"), col("n_orders"), col("tvd_ppm"),
        lit(false).as("t_close"))
    val summary = perClass.agg(sum("n_orders").as("n_orders"),
        max("tvd_ppm").as("max_tvd"),
        count(when(col("tvd_ppm") > TClosenessT, lit(1))).as("n_viol"))
      .select(lit("summary").as("row_type"),
        lit(null).cast("long").as("nationkey"), lit("ALL").as("segment"),
        col("n_orders"), col("max_tvd").as("tvd_ppm"),
        (col("n_viol") === 0).as("t_close"))
    viol.union(summary)
      .orderBy(col("row_type"), col("nationkey"), col("segment"))
  }

  /** DuckDB twin of [[tCloseness]] — identical integer-ppm EMD. */
  private[graft] def tClosenessOracle: String =
    s"""WITH j AS MATERIALIZED (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       |    c_mktsegment AS segment, o_orderpriority AS v
       |  FROM customer JOIN orders ON c_custkey = o_custkey
       |),
       |ccnt AS (SELECT nationkey, segment, v, count(*) AS nv
       |  FROM j GROUP BY 1, 2, 3),
       |ctot AS (SELECT nationkey, segment, count(*) AS nt
       |  FROM j GROUP BY 1, 2),
       |gdist AS (SELECT v, count(*) AS gv FROM j GROUP BY 1),
       |gtot AS (SELECT count(*) AS gt FROM j),
       |cls AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey,
       |  c_mktsegment AS segment FROM customer),
       |per AS MATERIALIZED (
       |  SELECT nationkey, segment,
       |    CAST(max(nt) AS BIGINT) AS n_orders,
       |    CASE WHEN max(nt) = 0 THEN 1000000
       |         ELSE CAST(sum(abs(pc - pg)) // 2 AS BIGINT) END AS tvd_ppm
       |  FROM (
       |    SELECT cls.nationkey, cls.segment,
       |      COALESCE(ctot.nt, 0) AS nt,
       |      CASE WHEN COALESCE(ctot.nt, 0) = 0 THEN 0
       |           ELSE (COALESCE(ccnt.nv, 0) * 1000000) // ctot.nt
       |      END AS pc,
       |      (gdist.gv * 1000000) // gtot.gt AS pg
       |    FROM cls CROSS JOIN gdist CROSS JOIN gtot
       |    LEFT JOIN ctot ON ctot.nationkey = cls.nationkey
       |      AND ctot.segment = cls.segment
       |    LEFT JOIN ccnt ON ccnt.nationkey = cls.nationkey
       |      AND ccnt.segment = cls.segment AND ccnt.v = gdist.v
       |  ) GROUP BY 1, 2
       |),
       |viol AS (
       |  SELECT 'class' AS row_type, nationkey, segment, n_orders,
       |    tvd_ppm, false AS t_close
       |  FROM per WHERE tvd_ppm > $TClosenessT
       |),
       |summ AS (
       |  SELECT 'summary' AS row_type, CAST(NULL AS BIGINT) AS nationkey,
       |    'ALL' AS segment, CAST(sum(n_orders) AS BIGINT) AS n_orders,
       |    CAST(max(tvd_ppm) AS BIGINT) AS tvd_ppm,
       |    count(CASE WHEN tvd_ppm > $TClosenessT THEN 1 END) = 0 AS t_close
       |  FROM per
       |)
       |SELECT * FROM (SELECT * FROM viol UNION ALL SELECT * FROM summ)
       |ORDER BY row_type, nationkey NULLS FIRST, segment""".stripMargin

  /** Benford expected first-digit shares in ppm — round(log₁₀(1+1/d)·10⁶)
    * precomputed so neither engine evaluates a log; they sum to exactly
    * 10⁶. */
  val BenfordPpm: Seq[(Int, Long)] = Seq(1 -> 301030L, 2 -> 176091L,
    3 -> 124939L, 4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
    8 -> 51153L, 9 -> 45757L)

  /** BENFORD'S-LAW first-digit audit of the monetary column — the
    * classic fabricated-data screen: naturally-arising amounts follow
    * P(d) = log₁₀(1+1/d); synthetic or tampered ones usually don't.
    * The first digit is extracted ARITHMETICALLY from integer cents
    * (`substr` of a BIGINT's decimal string — double→string formatting
    * differs between engines, integer strings don't), observed shares
    * are truncating-integer ppm, and the expected shares are the
    * [[BenfordPpm]] constants — so the whole report, deviations
    * included, is BIGINT-exact cross-engine. (The fixture's generated
    * uniform-ish prices should FAIL Benford — that's the point: the
    * audit detects non-natural distributions, and a synthetic
    * benchmark table is one.)
    *
    * Scale: one scan → 9-key partial+final count; the expected table
    * is a 9-row literal frame broadcast onto it. */
  def benford(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val obs = Tables.orders(s, d)
      .select(substring(expr(
        "cast(cast(floor(o_totalprice * 100) as bigint) as string)"),
        1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = obs.agg(sum("n").as("total"))
    val exp = BenfordPpm.toDF("digit", "exp_ppm")
    obs.crossJoin(broadcast(tot))
      .join(broadcast(exp), "digit")
      .select(col("digit"), col("n"),
        expr("(n * 1000000) div total").as("obs_ppm"), col("exp_ppm"),
        expr("abs((n * 1000000) div total - exp_ppm)").as("abs_dev_ppm"))
      .orderBy("digit")
  }

  /** DuckDB twin of [[benford]] — same integer-cents digit extraction,
    * truncating ppm, and constant expected table. */
  private[graft] def benfordOracle: String = {
    val expRows = BenfordPpm.map { case (dg, p) => s"($dg, $p)" }
      .mkString(", ")
    s"""WITH obs AS (
       |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
       |      AS VARCHAR), 1, 1) AS INTEGER) AS digit,
       |    count(*) AS n
       |  FROM orders GROUP BY 1
       |),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs),
       |exp AS (SELECT * FROM (VALUES $expRows) t(digit, exp_ppm))
       |SELECT obs.digit, obs.n, (obs.n * 1000000) // tot.total AS obs_ppm,
       |  CAST(exp.exp_ppm AS BIGINT) AS exp_ppm,
       |  abs((obs.n * 1000000) // tot.total - exp.exp_ppm) AS abs_dev_ppm
       |FROM obs CROSS JOIN tot JOIN exp USING (digit)
       |ORDER BY digit""".stripMargin
  }

  /** Lookback for [[scd2Lookup]] — "state 5 minutes before". */
  val Scd2LookbackUs = 300000000L

  /** POINT-IN-TIME (as-of-time) dimension lookup against the [[scd2]]
    * history — the LEAKAGE-SAFE feature join: for every purchase event,
    * the user-state version that was valid [[Scd2LookbackUs]] BEFORE
    * the purchase (half-open `valid_from ≤ t < valid_to` containment,
    * `valid_to` NULL = current). Joining features "as of" event time
    * instead of "latest" is the difference between a training set and
    * a target-leaking one — the same correctness property the AS-OF
    * join family enforces, here via versioned validity intervals.
    * Purchases predating the user's first version drop (no history =
    * no features; documented INNER semantics).
    *
    * Scale: the SCD frame is #changes rows ≪ events; the join is EQUI
    * on user_id with the interval containment as a residual condition —
    * one hash shuffle each side, per-user probe lists bounded by
    * version counts. Each t hits exactly ONE version (the intervals
    * partition the timeline), so output ≤ #purchases rows. */
  def scd2Lookup(s: SparkSession, d: String): DataFrame = {
    val dim = scd2(s, d).select(col("user_id"), col("version"),
      col("event_type").as("state_type"), col("valid_from"),
      col("valid_to"))
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - Scd2LookbackUs).as("t_us"))
    p.join(dim, p("user_id") === dim("user_id") &&
        col("valid_from") <= col("t_us") &&
        (col("valid_to").isNull || col("t_us") < col("valid_to")))
      .select(col("event_id"), p("user_id").as("user_id"), col("t_us"),
        col("version"), col("state_type"))
      .orderBy("event_id")
  }

  /** Period boundaries for [[snapshotDiff]] (orders span 1995–2001). */
  val DiffPeriodSplit = "1998-01-01"
  val DiffPeriodEnd   = "2001-01-01"

  /** SNAPSHOT DIFF — per-customer order activity compared across two
    * ingest periods (before/after [[DiffPeriodSplit]], bounded by
    * [[DiffPeriodEnd]]), labeling each changed customer `added` (new
    * in the later period), `removed` (went silent), or `changed`
    * (different volume); unchanged customers are suppressed. The diff
    * shape every incremental pipeline audits between loads — "what
    * moved since the last snapshot" without replaying either period.
    *
    * Scale: two predicate-pushed scans (the date filters reach the
    * parquet reader), partial+final aggs by custkey, one full-outer
    * equi-join of two #customers-sized frames partitioned the same
    * way. Money stays DECIMAL(18,2) until the final cast so the
    * deltas are exact in both engines. */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    def period(lo: Option[String], hi: String) = {
      val base = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit(hi).cast("timestamp"))
      lo.fold(base)(v =>
          base.filter(col("o_orderdate") >= lit(v).cast("timestamp")))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total"))
    }
    val zero = lit(0).cast(DecimalType(18, 2))
    val old = period(None, DiffPeriodSplit)
      .select(col("o_custkey"), col("n_orders").as("n_old"),
        col("total").as("t_old"))
    val nw = period(Some(DiffPeriodSplit), DiffPeriodEnd)
      .select(col("o_custkey"), col("n_orders").as("n_new"),
        col("total").as("t_new"))
    old.join(nw, Seq("o_custkey"), "full_outer")
      .withColumn("status",
        when(col("n_old").isNull, "added")
          .when(col("n_new").isNull, "removed")
          .otherwise("changed"))
      .filter(col("n_old").isNull || col("n_new").isNull ||
        col("n_old") =!= col("n_new") || col("t_old") =!= col("t_new"))
      .select(col("o_custkey"), col("status"),
        coalesce(col("n_new"), lit(0L)).as("n_orders"),
        (coalesce(col("n_new"), lit(0L)) - coalesce(col("n_old"), lit(0L)))
          .as("delta_orders"),
        coalesce(col("t_new"), zero).cast("double").as("total"),
        (coalesce(col("t_new"), zero) - coalesce(col("t_old"), zero))
          .cast("double").as("delta_total"))
      .orderBy("o_custkey")
  }

  /** TPC-H Q7-style volume shipping: revenue flowing between every
    * (supplier nation → customer nation) pair by ship year. The classic
    * two-role dimension join — nation enters TWICE under different
    * aliases, once through the supplier and once through the customer
    * (TPC-H Q7 fixes one pair; we keep all pairs so the synthetic
    * 25-nation fixture exercises the full matrix, ≤25×25×2 output rows).
    *
    * Scale: lineitem⋈orders is the one fact-fact shuffle; supplier,
    * customer-slim, and both nation roles broadcast. The group-by key
    * (two names + year) is tiny, so partial aggs collapse map-side. */
  def volumeShipping(s: SparkSession, d: String): DataFrame = {
    val sn = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cn = Tables.nation(s, d)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-01-01") &&
        col("l_shipdate") < lit("2000-01-01"))
    l.join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** [[marketShare]] measures this supplier nation's share. */
  val MktShareNation = "NATION_3"

  /** TPC-H Q8-style national market share: of all STANDARD-part revenue
    * sold into ASIA-region customers, the fraction supplied by
    * [[MktShareNation]], per order year. Numerator and denominator both
    * accumulate in DECIMAL (exact, order-free); the single share
    * division happens once per year-row in double, rounded to 6 dp —
    * the same one-division discipline as `bigram_probs`.
    *
    * Scale: part is the selective filter and joins the fact first
    * (broadcast at dimension size); orders⋈lineitem is the only
    * fact-fact shuffle; the conditional numerator is a `sum(CASE …)`
    * inside the SAME aggregate pass — no second scan, no self-join. */
  def marketShare(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).filter(col("p_type") === "STANDARD")
      .select("p_partkey")
    val asiaCust = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val supp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("sn_key"), col("n_name"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val vol = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(dec28)
    Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === MktShareNation, vol)
          .otherwise(lit(0).cast(dec28))).as("nation_vol"),
        sum(vol).as("total_vol"))
      .select(col("o_year"),
        col("nation_vol").cast("double").as("nation_revenue"),
        col("total_vol").cast("double").as("total_revenue"),
        round(col("nation_vol").cast("double") /
          col("total_vol").cast("double"), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q10-style returned-item reporting: the 20 customers who
    * returned the most revenue in a two-quarter window — the standard
    * "who is hurting us" churn report. Revenue is exact DECIMAL until
    * the final cast; top-k plans as TakeOrderedAndProject, never a
    * global sort of the customer frame.
    *
    * Scale: the returnflag+date predicates push into the lineitem scan;
    * one fact-fact shuffle (lineitem⋈orders); the per-customer agg frame
    * is #customers-sized, and customer/nation recovery joins run at
    * that size with nation broadcast. */
  def returnedItems(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1999-01-01") &&
        col("o_orderdate") < lit("1999-07-01"))
      .select("o_orderkey", "o_custkey")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_returned"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("c_acctbal"), col("revenue"), col("n_returned"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14-style promotion effect: the share of each month's gross
    * revenue coming from PROMO-type parts, over one order year. The
    * conditional-numerator / same-pass-denominator ratio shape again —
    * exact DECIMAL sums, one double division per month, 6-dp rounded.
    *
    * Scale: part joins broadcast; the month key is 12-wide so the agg
    * collapses map-side; date predicate pushes into the lineitem scan. */
  def promoRevenue(s: SparkSession, d: String): DataFrame = {
    val vol = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(dec28)
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1999-01-01") &&
        col("l_shipdate") < lit("2000-01-01"))
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(month(col("l_shipdate")).as("ship_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", vol)
          .otherwise(lit(0).cast(dec28))).as("promo_vol"),
        sum(vol).as("total_vol"))
      .select(col("ship_month"),
        col("promo_vol").cast("double").as("promo_revenue"),
        col("total_vol").cast("double").as("total_revenue"),
        round(lit(100.0) * col("promo_vol").cast("double") /
          col("total_vol").cast("double"), 6).as("promo_pct"))
      .orderBy("ship_month")
  }

  /** TPC-H Q15-style top supplier: per-supplier revenue over one
    * quarter, keeping every supplier whose revenue EQUALS the maximum
    * (Q15's view + scalar-subquery shape). The max is a 1-row aggregate
    * broadcast back against the per-supplier frame — the `bigram_probs`
    * denominator pattern; equality compares the exact DECIMAL values,
    * never doubles, so the tie boundary is deterministic cross-engine.
    *
    * Scale: one predicate-pushed lineitem scan → #suppliers-sized agg;
    * the max probe is a broadcast of one row; supplier detail recovery
    * is dimension-sized. */
  def topSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1999-01-01") &&
        col("l_shipdate") < lit("1999-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(dec28)).as("rev"))
    val mx = rev.agg(max(col("rev")).as("max_rev"))
    rev.join(broadcast(mx), col("rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** [[smallQtyRevenue]] keeps lineitems below avg·(numerator/denominator). */
  val SmallQtyNum = 1
  val SmallQtyDen = 2

  /** TPC-H Q17-style small-quantity revenue: total revenue of lineitems
    * whose quantity is below half that part's average quantity — the
    * canonical correlated-scalar-subquery shape, decorrelated into a
    * per-part aggregate joined back to the fact. The threshold compare
    * stays EXACT: `qty · n_part · den < num · sum_qty_part` in DECIMAL
    * — no division ever happens, so the boundary cannot straddle a
    * float rounding difference between engines.
    *
    * Scale: two passes over lineitem (one agg by partkey, one join) —
    * the same-key join means AQE can co-partition; per-part stats are
    * #parts-sized and broadcast-eligible. */
  def smallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val perPart = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("pp_key"))
      .agg(sum(col("l_quantity").cast(dec18)).as("sum_qty"),
        count(lit(1)).as("n_part"))
    Tables.lineitem(s, d)
      .join(broadcast(perPart), col("l_partkey") === col("pp_key"))
      .filter(col("l_quantity").cast(dec18) * col("n_part") *
        lit(SmallQtyDen) < lit(SmallQtyNum) * col("sum_qty"))
      .agg(moneySum(col("l_extendedprice")).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .select(col("total_revenue"), col("n_items"))
  }

  /** TPC-H Q19-style discounted revenue: one scalar revenue over an
    * OR-of-ANDs predicate (three brand × size × quantity envelopes) —
    * the shape that stresses predicate normalization. Spark's optimizer
    * factors the common `l_quantity`/`p_size` bounds and pushes what it
    * can into the scans; the residual disjunction evaluates in one
    * codegen stage, never three scans unioned.
    *
    * Scale: part (brand/size) broadcasts; single lineitem pass. */
  def discRevenue(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
    val q = col("l_quantity")
    val pred =
      (col("p_brand") === "Brand#13" && col("p_size").between(1, 15) &&
        q.between(1, 11)) ||
      (col("p_brand") === "Brand#20" && col("p_size").between(1, 25) &&
        q.between(10, 20)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 50) &&
        q.between(20, 30))
    Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(pred)
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_items"))
      .select(col("revenue"), col("n_items"))
  }

  /** Ship-lag (days) beyond which [[lateSuppliers]] calls a lineitem late.
    * The fixture has no commit/receipt dates (TESTDATA.md), so lateness
    * is shipdate − orderdate > this, keeping Q21's join topology. */
  val LateLagDays = 400

  /** TPC-H Q21-style waiting suppliers: suppliers who were the ONLY
    * late shipper in a multi-supplier order — Q21's EXISTS/NOT-EXISTS
    * pair, decorrelated into ONE aggregation pass: per order, count
    * distinct suppliers and distinct LATE suppliers; per (order,
    * supplier), flag lateness. A supplier "kept the order waiting" when
    * it is late, the order has ≥2 suppliers, and late-supplier-count is
    * exactly 1. No self-join of the fact table ever happens — the two
    * EXISTS collapse into grouped counters, the Spark-native plan.
    *
    * Scale: one lineitem⋈orders shuffle, then two aggs over the same
    * (orderkey) partitioning — AQE reuses the exchange; the final
    * per-supplier count is dimension-sized. */
  def lateSuppliers(s: SparkSession, d: String): DataFrame = {
    val lagUs = expr(s"INTERVAL $LateLagDays DAYS")
    val base = Tables.lineitemSpread(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + lagUs).as("late"))
    val perSupp = base.groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("late")).as("was_late"))
    // per-order distinct-supplier counters FROM perSupp (r21): one row
    // per (order, supplier) already exists there, so n_supp is a plain
    // count and n_late counts the was_late rows — replaces the
    // two-countDistinct aggregate over the full joined fact (Expand ×3
    // row replication) with a group-count-sized reaggregation; AQE
    // reuses perSupp's exchange for both consumers
    val perOrder = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        count(when(col("was_late"), 1)).as("n_late"))
    perSupp.filter(col("was_late"))
      .join(perOrder, Seq("l_orderkey"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), asc("s_suppkey"))
      .limit(10)
  }

  /** Nation buckets [[salesOpportunity]] restricts to (Q22's country-code
    * IN-list; the fixture's analog is the nation key itself). */
  val OppNations = Seq(1, 5, 9, 13, 17, 21)

  /** TPC-H Q22-style global sales opportunity: dormant-but-rich
    * customers — above-average positive account balance, no orders in
    * the trailing window — counted per nation bucket. The average is a
    * 1-row broadcast (computed over positive balances only, as Q22
    * does); dormancy is a LEFT ANTI join against the recent-orders key
    * set; balances sum in DECIMAL for exactness.
    *
    * Scale: the anti join's build side is the distinct recent-customer
    * key set (#customers-bounded, broadcast-eligible); everything else
    * is dimension-sized. The balance threshold compares double-to-
    * double on both engines via the same avg expression, rounded into
    * the comparison-safe exact DECIMAL space first. */
  def salesOpportunity(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .filter(col("c_nationkey").isin(OppNations: _*))
    // Exact threshold: bal · n_pos > sum_pos, all in DECIMAL — the same
    // no-division trick as smallQtyRevenue, so no float boundary.
    val avgPos = c.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast(dec18)).as("sum_pos"),
        count(lit(1)).as("n_pos"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1999-01-01"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgPos))
      .filter(col("c_acctbal").cast(dec18) * col("n_pos") > col("sum_pos"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(dec18)).cast("double").as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** DATA-QUALITY RULE ENGINE — the declarative audit every ingestion
    * pipeline runs before promoting a load: per rule, how many rows were
    * checked and how many violate, with a pass flag. Ten rules across
    * the star schema: positivity/range/domain checks, key uniqueness,
    * and the four foreign keys.
    *
    * Scale: same-table rules FUSE into one scan — lineitem is read once
    * for its two range rules AND its two dimension FKs (part/supplier
    * key sets broadcast as existence markers), orders once for
    * range+domain+customer-FK, customer once (the uniqueness groupBy
    * doubles as the null-name pass). Only lineitem→orders needs a
    * second fact pass, pre-shrunk to distinct order keys before the
    * join so the probe is #orders-sized. Every rule ends in a scalar
    * counter — `stack` unpivots the fused aggregates into rule rows, so
    * nothing row-sized ever leaves the executors. */
  def dqRules(s: SparkSession, d: String): DataFrame = {
    // lineitem pass: two range rules + two broadcast-FK existence probes
    val pk = broadcast(Tables.part(s, d)
      .select(col("p_partkey").as("fk_pk"), lit(1).as("p_seen")))
    val sk = broadcast(Tables.supplier(s, d)
      .select(col("s_suppkey").as("fk_sk"), lit(1).as("s_seen")))
    val liRules = Tables.lineitem(s, d)
      .join(pk, col("l_partkey") === col("fk_pk"), "left")
      .join(sk, col("l_suppkey") === col("fk_sk"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_quantity") <= 0.0 || col("l_quantity").isNull, 1L)
          .otherwise(0L)).as("v_qty"),
        sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.5 ||
          col("l_discount").isNull, 1L).otherwise(0L)).as("v_disc"),
        sum(when(col("p_seen").isNull, 1L).otherwise(0L)).as("v_pfk"),
        sum(when(col("s_seen").isNull, 1L).otherwise(0L)).as("v_sfk"))
      .select(expr(
        """stack(4,
          |  'lineitem_quantity_positive', 'lineitem', n, v_qty,
          |  'lineitem_discount_range',    'lineitem', n, v_disc,
          |  'lineitem_partkey_fk',        'lineitem', n, v_pfk,
          |  'lineitem_suppkey_fk',        'lineitem', n, v_sfk
          |) AS (rule, tbl, n_checked, n_violations)""".stripMargin))
    // lineitem→orders FK: pre-aggregate to distinct order keys so the
    // probe is #orders-sized, then weight violations by group count
    val loFk = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("grp_n"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey").as("fk_ok"), lit(1).as("o_seen")),
        col("l_orderkey") === col("fk_ok"), "left")
      .agg(sum(col("grp_n")).as("n"),
        sum(when(col("o_seen").isNull, col("grp_n")).otherwise(0L))
          .as("v_ofk"))
      .select(lit("lineitem_orderkey_fk").as("rule"),
        lit("lineitem").as("tbl"), col("n").as("n_checked"),
        col("v_ofk").as("n_violations"))
    // orders pass: price positivity + status domain + customer FK
    val ck = broadcast(Tables.customer(s, d)
      .select(col("c_custkey").as("fk_ck"), lit(1).as("c_seen")))
    val orRules = Tables.orders(s, d)
      .join(ck, col("o_custkey") === col("fk_ck"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_totalprice") <= 0.0 || col("o_totalprice").isNull,
          1L).otherwise(0L)).as("v_price"),
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L)
          .otherwise(0L)).as("v_status"),
        sum(when(col("c_seen").isNull, 1L).otherwise(0L)).as("v_cfk"))
      .select(expr(
        """stack(3,
          |  'orders_totalprice_positive', 'orders', n, v_price,
          |  'orders_status_domain',       'orders', n, v_status,
          |  'orders_custkey_fk',          'orders', n, v_cfk
          |) AS (rule, tbl, n_checked, n_violations)""".stripMargin))
    // customer pass: the uniqueness groupBy doubles as the name pass
    val cuRules = Tables.customer(s, d)
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("grp_n"),
        sum(when(col("c_name").isNull || length(col("c_name")) === 0, 1L)
          .otherwise(0L)).as("name_bad"))
      .agg(sum(col("grp_n")).as("n"),
        sum(when(col("grp_n") > 1, col("grp_n")).otherwise(0L)).as("v_dup"),
        sum(col("name_bad")).as("v_name"))
      .select(expr(
        """stack(2,
          |  'customer_custkey_unique', 'customer', n, v_dup,
          |  'customer_name_present',   'customer', n, v_name
          |) AS (rule, tbl, n_checked, n_violations)""".stripMargin))
    liRules.unionByName(loFk).unionByName(orRules).unionByName(cuRules)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("rule")
  }

  /** Date from which [[mergeUpsert]]'s change batch is derived. */
  val MergeChangesFrom = "2001-01-01"
  /** Key shift marking a change row as a new entity (no base match). */
  val MergeInsertShift = 100000L

  /** MERGE / CDC-APPLY — the upsert shape every incremental load runs:
    * a change batch (derived here from recent order activity; `%11`
    * keys shift to [[MergeInsertShift]]+key to model new entities, `%7`
    * keys carry a delete marker) applied to the customer base with the
    * standard four-way outcome — `update` (matched, balance += change
    * total), `delete` (matched + marker), `insert` (change with no base
    * row), `keep` (untouched base row). Balances stay DECIMAL(18,2)
    * end-to-end so the merged values are exact cross-engine.
    *
    * Scale: ONE full-outer equi-join on the entity key — base and
    * changes hash-partition the same way, and AQE handles the
    * (typically tiny-batch) change side by broadcasting it; the action
    * column is a projection. No window, no driver loop — MERGE at
    * 100 TB is exactly this join. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val changes = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(MergeChangesFrom))
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(dec18)).as("chg_total"),
        count(lit(1)).as("chg_n"))
      .select(
        when(col("o_custkey") % 11 === 0,
          col("o_custkey") + MergeInsertShift)
          .otherwise(col("o_custkey")).as("chg_key"),
        col("chg_total"), col("chg_n"),
        (col("o_custkey") % 7 === 0).as("is_delete"))
    val base = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal").cast(dec18).as("bal"))
    base.join(changes, col("c_custkey") === col("chg_key"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("chg_key")).as("entity_key"),
        when(col("chg_key").isNull, "keep")
          .when(col("c_custkey").isNull, "insert")
          .when(col("is_delete"), "delete")
          .otherwise("update").as("action"),
        when(col("chg_key").isNull, col("bal"))
          .when(col("c_custkey").isNull, col("chg_total"))
          .when(col("is_delete"), lit(null).cast(dec18))
          .otherwise(col("bal") + col("chg_total"))
          .cast("double").as("new_bal"),
        coalesce(col("chg_n"), lit(0L)).as("n_changes"))
      .orderBy("entity_key")
  }

  /** History/delta split point for [[incrementalAgg]]. */
  val IncrSplit = "2000-01-01"

  /** INCREMENTAL AGGREGATE MAINTENANCE — the restartable-rollup
    * contract: a frozen history aggregate (orders before [[IncrSplit]])
    * merged with a fresh delta-batch aggregate via partial-state
    * ADDITION (counts add, DECIMAL totals add), checked in the same
    * query against the full recompute. The merge is exactly Spark's own
    * partial+final aggregation split lifted to the warehouse level:
    * at 100 TB the history side is a stored ~#groups-row state, so each
    * load aggregates ONLY the delta — the `consistent` flag proves the
    * algebra is lossless (sums in DECIMAL, never doubles).
    *
    * Scale: two predicate-pushed scans (history build is one-time in
    * production), each collapsing map-side to #status rows; the merge
    * and the audit join are #groups-sized. */
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    def slice(pred: org.apache.spark.sql.Column) =
      Tables.orders(s, d).filter(pred)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec18)).as("total"))
    val hist = slice(col("o_orderdate") < lit(IncrSplit))
      .select(col("o_orderstatus"), col("n").as("n_hist"),
        col("total").as("t_hist"))
    val delta = slice(col("o_orderdate") >= lit(IncrSplit))
      .select(col("o_orderstatus").as("d_status"), col("n").as("n_delta"),
        col("total").as("t_delta"))
    val zero = lit(0).cast(dec18)
    val merged = hist
      .join(delta, col("o_orderstatus") === col("d_status"), "full_outer")
      .select(
        coalesce(col("o_orderstatus"), col("d_status")).as("status"),
        (coalesce(col("n_hist"), lit(0L)) + coalesce(col("n_delta"), lit(0L)))
          .as("n_merged"),
        (coalesce(col("t_hist"), zero) + coalesce(col("t_delta"), zero))
          .as("t_merged"))
    val full = slice(lit(true))
      .select(col("o_orderstatus").as("f_status"), col("n").as("n_full"),
        col("total").as("t_full"))
    merged.join(full, col("status") === col("f_status"), "full_outer")
      .select(coalesce(col("status"), col("f_status")).as("status"),
        col("n_merged"), col("t_merged").cast("double").as("total_merged"),
        col("n_full"), col("t_full").cast("double").as("total_full"),
        (col("n_merged") <=> col("n_full") &&
          col("t_merged") <=> col("t_full")).as("consistent"))
      .orderBy("status")
  }

  // ——— TPC-H shape completion, final batch: Q2/Q4/Q6/Q9/Q11/Q12/Q16/Q20
  // analogs (the schema has no partsupp/shipmode/commitdate, so each
  // keeps the QUERY SHAPE — correlated argmin, EXISTS-decorrelation,
  // scalar-fraction HAVING, nested dominance semijoin — on the columns
  // the generator does emit).

  /** TPC-H Q2-style minimum-cost supplier: for every small STANDARD
    * part, the EUROPE supplier offering it cheapest. The reference Q2's
    * correlated `ps_supplycost = (SELECT min…)` subquery is decorrelated
    * into one grouped argmin: per (part, supplier) the minimum observed
    * sale price in exact cents, then per part `min_by` over the
    * collision-free ordering cents·10¹⁰ + suppkey (prices < 10⁶ units
    * and dense keys keep it < 2⁶³ at any SF, the [[minMaxBy]] bound) —
    * ties break toward the smallest supplier key deterministically.
    *
    * Scale: the part filter broadcasts (selectivity ~1/300), EUROPE
    * suppliers broadcast (dimension-sized), so lineitem is pruned by two
    * broadcast joins before its single shuffle on the (part, supplier)
    * group key; the per-part argmin reuses that exchange (same prefix).
    * Supplier attributes rejoin AFTER the argmin on a part-sized frame. */
  def minCostSupplier(s: SparkSession, d: String): DataFrame = {
    val eur = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val parts = Tables.part(s, d)
      .filter(col("p_size") <= 5 && col("p_type") === "STANDARD")
      .select("p_partkey", "p_name")
    val perSupp = Tables.lineitem(s, d)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(eur.select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(round(col("l_extendedprice") * 100, 0).cast("long"))
        .as("cost_cents"))
    perSupp
      .withColumn("_u", col("cost_cents") * 10000000000L + col("l_suppkey"))
      .groupBy("p_partkey", "p_name")
      .agg(expr("min_by(l_suppkey, _u)").as("s_suppkey"),
        min(col("cost_cents")).as("cc"))
      .join(broadcast(eur), Seq("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("n_name"), col("s_acctbal"),
        (col("cc") / lit(100.0)).as("min_cost"))
      .orderBy("p_partkey")
  }

  /** How late a lineitem must ship past its order date to count as
    * "late" in [[priorityOrders]] / [[lateSuppliers]]-adjacent checks. */
  val PriorityLagDays = 30

  /** TPC-H Q4-style order-priority checking: orders from one quarter
    * with at least one late lineitem (shipped > [[PriorityLagDays]] days
    * after the order date), counted by priority. Q4's correlated EXISTS
    * is a LEFT SEMI join whose non-equi half (the lateness comparison)
    * rides on the equi-join key — Spark keeps it a hash semi-join with
    * the residual predicate evaluated post-probe, never a BNL.
    *
    * Scale: the quarter filter prunes orders at the scan; lineitem
    * projects two columns. One shuffle each side on orderkey; the semi
    * join short-circuits per probe row at the first late match, and the
    * final agg is 5 rows. */
  def priorityOrders(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1998-01-01") &&
        col("o_orderdate") < lit("1998-04-01"))
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    o.join(l,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr(s"INTERVAL $PriorityLagDays DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6-style forecast-revenue change: one scalar — the revenue
    * that would have been gained by eliminating small discounts on
    * low-quantity 1998 lineitems. Pure scan→filter→aggregate: every
    * predicate reaches the parquet reader (PushedFilters), the sum is
    * exact DECIMAL, and nothing shuffles but one 1-row partial-agg
    * merge. The simplest possible 100 TB query — and the one where scan
    * pruning (here: shipdate min/max row-group stats) pays the most. */
  def forecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-01-01") &&
        col("l_shipdate") < lit("1999-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(moneySum(col("l_extendedprice") * col("l_discount"))
          .as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q9-style product-type profit: per supplier nation × order
    * year, profit over "gear" parts — revenue minus a cost proxy of
    * half the retail price per unit (the schema has no ps_supplycost).
    * The profit expression is ONE double expression written identically
    * in both engines, then cast to DECIMAL(28,4) for the
    * order-insensitive sum.
    *
    * Scale: part filter broadcasts and prunes lineitem first; orders
    * joins on the fact key (shuffle), nation broadcasts onto the
    * supplier key. Group count is #nations × #years — tiny. */
  def productProfit(s: SparkSession, d: String): DataFrame = {
    val gear = Tables.part(s, d).filter(col("p_name").contains("gear"))
      .select("p_partkey", "p_retailprice")
    Tables.lineitem(s, d)
      .join(broadcast(gear), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "n_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity") * lit(0.5)).cast(dec28))
        .cast("double").as("profit"))
      .orderBy("n_name", "o_year")
  }

  /** [[importantParts]] keeps parts above this multiple of the MEAN
    * per-part value — Q11's fraction scales 1/SF for exactly this
    * reason (a fixed share empties as the part count grows; measured:
    * 91 → 0 survivors sf0.01 → sf0.1 at a fixed 1/1000). Relative to
    * the mean, the survivor set stays non-trivial at every SF. */
  val ImportantPartMeanMult = 2L

  /** TPC-H Q11-style important stock: parts whose revenue from
    * low-nation suppliers exceeds [[ImportantPartMeanMult]]× the mean
    * per-part revenue of that group. Q11's `HAVING sum > (SELECT
    * sum·f)` scalar subquery is a 1-row broadcast; the comparison runs
    * in BIGINT deci-milli-cents cross-multiplied by the part count
    * (value·n_parts > mult·total — exact, never a float boundary;
    * products stay < 2⁶³ through ~10⁷ parts × 10¹¹ deci-milli-cents —
    * rescale to cents beyond that).
    *
    * Scale: one shuffle on partkey; the total/count is a second pass
    * over the SAME pre-aggregated per-part frame (part-dimension-sized,
    * not fact-sized), so the fact table is read once. */
  def importantParts(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)
          .filter(col("s_nationkey") < 5).select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 10000, 0).cast("long")).as("value_i"))
    val tot = rev.agg(sum(col("value_i")).as("total_i"),
      count(lit(1)).as("n_parts"))
    rev.crossJoin(broadcast(tot))
      .filter(col("value_i") * col("n_parts") >
        col("total_i") * ImportantPartMeanMult)
      .select(col("l_partkey").as("p_partkey"),
        (col("value_i") / lit(10000.0)).as("value"))
      .orderBy(desc("value"), asc("p_partkey"))
  }

  /** Ship-delay cutoff (days) splitting [[shipDelayMix]]'s SLOW bucket
    * from FAST — the schema's stand-in for Q12's ship-mode classes. */
  val SlowShipDays = 60

  /** TPC-H Q12-style shipping-mode priority mix: 1999 lineitems
    * bucketed by ship delay (> [[SlowShipDays]] days = SLOW), counting
    * critical (1-URGENT / 2-HIGH) vs other order priorities per bucket
    * — Q12's two conditional sums, unchanged. One fact-fact join on
    * orderkey, then a 2-row conditional aggregate. */
  def shipDelayMix(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1999-01-01") &&
        col("l_shipdate") < lit("2000-01-01"))
      .select("l_orderkey", "l_shipdate")
      .join(Tables.orders(s, d)
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("ship_bucket",
        when(col("l_shipdate") > col("o_orderdate") +
          expr(s"INTERVAL $SlowShipDays DAYS"), "SLOW").otherwise("FAST"))
      .groupBy("ship_bucket")
      .agg(
        count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
          lit(1))).as("high_line_count"),
        count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
          lit(1))).as("low_line_count"))
      .orderBy("ship_bucket")

  /** TPC-H Q16-style part/supplier relationship: how many qualified
    * suppliers have actually shipped each (brand, type, size) combo —
    * Q16's `NOT IN (complaints)` becomes a LEFT ANTI join against the
    * negative-balance supplier keys (the schema's complaint analog),
    * and partsupp is stood in by the shipped-lineitem relation.
    *
    * Scale: both dimension filters broadcast; the distinct count runs
    * partial (the Expand is per-group, not fact-wide) after one shuffle
    * on the 3-column group key. Anti-join build side is
    * supplier-dimension-sized. */
  def partSupplierCounts(s: SparkSession, d: String): DataFrame = {
    val excl = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("x_suppkey"))
    val p = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#5" &&
        col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excl), col("l_suppkey") === col("x_suppkey"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
        asc("p_size"))
  }

  /** TPC-H Q20-style dominant suppliers: suppliers who shipped MORE
    * THAN 3× THE AVERAGE supplier share of some "small …" part's total
    * quantity — Q20's nested `ps_availqty > 0.5·sum(l_quantity)`
    * correlated subquery, decorrelated into two aggregations over the
    * same (part, supplier) frame plus an exact-integer dominance test
    * (sqty·n_supp > 3·total; the generator's quantities are whole
    * numbers, floored identically in both engines before summing). The
    * threshold is RELATIVE to the part's supplier count, so the
    * survivor set stays non-trivial as per-part supplier fan-out grows
    * with SF (an absolute >50% share empties at sf0.1 already).
    *
    * Scale: the part-name filter broadcasts; one shuffle on (partkey,
    * suppkey); the per-part total aggregates the ALREADY-GROUPED frame
    * (part-dimension-sized). The dominant key set is distinct-small and
    * drives a semi join against the supplier dimension. */
  def dominantSuppliers(s: SparkSession, d: String): DataFrame = {
    val sm = Tables.part(s, d).filter(col("p_name").startsWith("small"))
      .select("p_partkey")
    val ps = Tables.lineitem(s, d)
      .join(broadcast(sm), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("sqty"))
    val tot = ps.groupBy(col("l_partkey"))
      .agg(sum(col("sqty")).as("tqty"), count(lit(1)).as("n_supp"))
    val dom = ps.join(tot, Seq("l_partkey"))
      .filter(col("sqty") * col("n_supp") > col("tqty") * 3)
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(dom, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  /** MARKET-BASKET association mining at brand granularity: for every
    * brand pair, how often both appear in one order, with the LIFT
    * (observed co-rate over the independence expectation) — the
    * association-rule primitive (Agrawal/Srikant's support-confidence
    * frame, reported as lift). Brand granularity keeps the itemset
    * vocabulary FIXED (~25) as the corpus grows, so the pair output is
    * bounded at any SF — part-granularity pairs go support-sparse at
    * 10× already (measured: 63 → 2 survivors sf0.01 → sf0.1).
    *
    * Counts are exact BIGINT; lift is ONE fixed IEEE expression
    * `n_ab · 1.0 · n_orders / (n_a · n_b)` (integer products < 2⁵³,
    * then a single divide) written identically in both engines.
    *
    * Scale: the basket frame (order, brand) DISTINCT shuffles once on
    * its group key; the pair self-join re-shuffles both sides on
    * orderkey with per-order fan-out bounded by the brand vocabulary
    * (≤ C(25,2) pairs per order); singles and the order count broadcast
    * back onto the 300-row pair frame. Nothing fact-sized crosses a
    * broadcast. */
  def basketPairs(s: SparkSession, d: String): DataFrame = {
    val dp = Tables.lineitemSpread(s, d).select("l_orderkey", "l_partkey")
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
    val nOrders = dp.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    val singles = dp.groupBy("p_brand").agg(count(lit(1)).as("n"))
    val pairs = dp.select(col("l_orderkey"), col("p_brand").as("brand_a"))
      .join(dp.select(col("l_orderkey").as("ok2"),
          col("p_brand").as("brand_b")),
        col("l_orderkey") === col("ok2") && col("brand_a") < col("brand_b"))
      .groupBy("brand_a", "brand_b")
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(singles.select(col("p_brand").as("brand_a"),
        col("n").as("n_a"))), Seq("brand_a"))
      .join(broadcast(singles.select(col("p_brand").as("brand_b"),
        col("n").as("n_b"))), Seq("brand_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        round(col("n_ab") * lit(1.0) * col("n_orders") /
          (col("n_a") * col("n_b")), 6).as("lift"))
      .orderBy("brand_a", "brand_b")
  }
}
