package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  test("as-of join: latest at-or-before match, ties take the right row") {
    val left = Seq(
      (1L, ts(10), "p1"), // matches r at ts(5)
      (1L, ts(3), "p2"),  // before any right row -> null
      (1L, ts(5), "p3"),  // tie with right at ts(5) -> >= matches
      (2L, ts(10), "p4")  // key with no right rows -> null
    ).toDF("k", "ts", "name")
    val right = Seq(
      (1L, ts(5), 100L),
      (1L, ts(9), 200L)
    ).toDF("k", "ts", "rv")

    val got = AsOfJoin.joinAsOf(left, right, "k", "ts", Seq("rv"))
      .select($"name", $"_matched.rv")
      .as[(String, Option[Long])].collect().toMap
    assert(got === Map(
      "p1" -> Some(200L), // ts(9) is the latest <= ts(10)
      "p2" -> None,
      "p3" -> Some(100L), // equal timestamps match
      "p4" -> None))
  }

  test("native as-of join: edge cases match the spec") {
    // longs directly (the native operator's portable-integer-time contract)
    val left = Seq(
      (1L, 10L, "p1"), // matches r at 9
      (1L, 3L, "p2"),  // before any right row -> null
      (1L, 5L, "p3"),  // tie -> >= matches
      (2L, 10L, "p4"), // key with no right rows -> null
      (3L, 7L, "p5")   // key after right-only key 2? (no rows for 3) -> null
    ).toDF("k", "lts", "name")
    val right = Seq(
      (1L, 5L, 100L),
      (1L, 9L, 200L),
      (9L, 1L, 999L)   // right-only key, must be skipped cleanly
    ).toDF("rk", "rts", "rv")

    val got = graft.plans.NativeAsOf.joinAsOf(left, right,
        "k", "rk", "lts", "rts")
      .select($"name", $"rv")
      .as[(String, Option[Long])].collect().toMap
    assert(got === Map(
      "p1" -> Some(200L),
      "p2" -> None,
      "p3" -> Some(100L),
      "p4" -> None,
      "p5" -> None))
  }

  test("native as-of tolerance nulls stale matches, keeps fresh ones") {
    val left = Seq(
      (1L, 10L, "p1"),  // latest right at 9, gap 1 ≤ tol 3 → match
      (1L, 20L, "p2"),  // latest right at 9, gap 11 > 3 → null
      (1L, 12L, "p3"),  // gap 3 = tol, inclusive → match
      (2L, 10L, "p4")   // no right rows → null either way
    ).toDF("k", "lts", "name")
    val right = Seq((1L, 5L, 100L), (1L, 9L, 200L)).toDF("rk", "rts", "rv")
    val got = graft.plans.NativeAsOf.joinAsOf(left, right,
        "k", "rk", "lts", "rts", 3L)
      .select($"name", $"rv").as[(String, Option[Long])].collect().toMap
    assert(got === Map(
      "p1" -> Some(200L), "p2" -> None, "p3" -> Some(200L), "p4" -> None))
    // tolerance −1 (disabled) must reproduce the plain native join
    val plain = graft.plans.NativeAsOf.joinAsOf(left, right,
        "k", "rk", "lts", "rts")
      .select($"name", $"rv").as[(String, Option[Long])].collect().toMap
    assert(plain("p2") === Some(200L))
  }

  test("forward as-of (negation reduction) picks the first row >= ts") {
    val got = graft.operators.AsOfJoin.clickToNextPurchase(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
    assert(got.nonEmpty)
    // independent recompute: earliest purchase at-or-after each click
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type",
        org.apache.spark.sql.functions.expr("unix_micros(ts)").as("us"))
      .as[(Long, Long, String, Long)].collect()
    val purchByUser = ev.filter(_._3 == "purchase")
      .groupBy(_._2).view.mapValues(_.map(_._4).sorted).toMap
    val clicks = ev.filter(_._3 == "click")
      .map(e => e._1 -> ((e._2, e._4))).toMap
    got.foreach { case (id, _, cus, pus, gap) =>
      val (u, cu) = clicks(id)
      assert(cu === cus)
      val expected = purchByUser.get(u).flatMap(_.find(_ >= cu))
      assert(pus === expected, s"click $id")
      assert(gap === expected.map(_ - cu), s"click $id gap")
    }
    // both outcomes exercised
    assert(got.exists(_._4.isDefined) && got.exists(_._4.isEmpty))
  }

  test("nearest as-of keeps the closer direction, ties go backward") {
    val got = graft.operators.AsOfJoin.clickToNearestPurchase(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type",
        org.apache.spark.sql.functions.expr("unix_micros(ts)").as("us"))
      .as[(Long, Long, String, Long)].collect()
    val purch = ev.filter(_._3 == "purchase")
      .groupBy(_._2).view.mapValues(_.map(_._4).sorted).toMap
    got.foreach { case (id, u, cus, pus, gap) =>
      val b = purch.get(u).flatMap(_.reverseIterator.find(_ <= cus))
      val f = purch.get(u).flatMap(_.find(_ >= cus))
      val expected = (b, f) match {
        case (None, x) => x
        case (x, None) => x
        case (Some(bb), Some(ff)) =>
          if (cus - bb <= ff - cus) Some(bb) else Some(ff)
      }
      assert(pus === expected, s"click $id")
      assert(gap === expected.map(_ - cus), s"click $id")
    }
    // both directions must win somewhere, or the composition is moot
    val wins = got.flatMap(r => r._5.map(g => g <= 0L))
    assert(wins.contains(true) && wins.contains(false))
  }

  test("native as-of join ≡ composed as-of join on the events fixture") {
    val composed = AsOfJoin.clickToPurchase(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    val native = AsOfJoin.clickToPurchaseNative(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("native as-of join plans a single co-partitioned merge (no window)") {
    val df = AsOfJoin.clickToPurchaseNative(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), s"custom operator missing:\n$plan")
    assert(!plan.contains("Window"), "native path must not fall back to window")
  }

  test("optimizer prunes unused columns through the native as-of join") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    // left side deliberately carries a wide unused column (props)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("props"),
        unix_micros(col("ts")).as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user"), unix_micros(col("ts")).as("c_us"))
    val narrow = graft.plans.NativeAsOf
      .joinAsOf(purchases, clicks, "user_id", "r_user", "p_us", "c_us")
      .select("event_id", "c_us")
    narrow.collect()
    val plan = narrow.queryExecution.executedPlan.toString
    assert(!plan.contains("props"),
      s"unused wide column must be pruned out of the scan:\n$plan")
  }

  test("native as-of declares (key, ts) output ordering: downstream sort elided") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user"), unix_micros(col("ts")).as("c_us"))
    val joined = graft.plans.NativeAsOf
      .joinAsOf(purchases, clicks, "user_id", "r_user", "p_us", "c_us")
    def nSorts(df: org.apache.spark.sql.DataFrame): Int =
      "\\bSort\\b".r.findAllIn(df.queryExecution.executedPlan.toString).length
    // a partition-local sort on exactly the join's (key, ts) must be
    // satisfied by the exec's declared outputOrdering — no new Sort node
    val resorted = joined.sortWithinPartitions("user_id", "p_us")
    assert(nSorts(resorted) === nSorts(joined),
      s"redundant Sort above AsOfJoinExec:\n${resorted.queryExecution.executedPlan}")
  }

  test("native as-of exec reports SQL metrics") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.functions.{col, unix_micros}
    // raw join, no trailing orderBy: a global sort's range partitioner
    // SAMPLES its child RDD, executing the exec twice and double-counting
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user"), unix_micros(col("ts")).as("c_us"))
    val df = graft.plans.NativeAsOf
      .joinAsOf(purchases, clicks, "user_id", "r_user", "p_us", "c_us")
    // drive THIS QueryExecution (count() would plan a separate one whose
    // exec instance owns the populated metrics)
    val n = df.collect().length.toLong
    // descend through AQE wrappers: query stages hold their subtree as a
    // member, not a child, so a plain collectFirst never sees the exec
    def findExec(p: SparkPlan): Option[graft.plans.AsOfJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => findExec(a.executedPlan)
      case q: QueryStageExec => findExec(q.plan)
      case a: graft.plans.AsOfJoinExec => Some(a)
      case other => other.children.view.flatMap(findExec(_)).headOption
    }
    val exec = findExec(df.queryExecution.executedPlan)
    assert(exec.isDefined, "AsOfJoinExec not found in final plan")
    assert(exec.get.metrics("numOutputRows").value === n)
    val matched = exec.get.metrics("numMatchedRows").value
    assert(matched > 0 && matched <= n)
  }

  test("chained as-of joins: one shuffle+sort per INPUT, not per join") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("v_us"))
    val j1 = graft.plans.NativeAsOf.joinAsOf(purchases, clicks,
      "user_id", "c_user", "p_us", "c_us")
    val j2 = graft.plans.NativeAsOf.joinAsOf(j1, views,
      "user_id", "v_user", "p_us", "v_us")
    j2.collect()
    // the adaptive plan's toString appends the pre-AQE "Initial Plan"
    // section — count nodes in the final plan only
    val plan = j2.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    def count(token: String) = token.r.findAllIn(plan).length
    assert(count("AsOfJoin ") === 2, s"expected 2 execs:\n$plan")
    // 3 inputs -> 3 hash exchanges and 3 sorts; the second join's left
    // side rides the first exec's declared partitioning + ordering
    assert(count("Exchange hashpartitioning") === 3,
      s"second join's left must not re-shuffle:\n$plan")
    assert(count(" Sort \\[") === 3,
      s"second join's left must not re-sort:\n$plan")
  }

  test("depth-3 as-of chain: 4 inputs cost exactly 4 shuffles+sorts") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    def side(t: String, user: String, us: String) =
      ev.filter(col("event_type") === t)
        .select(col("user_id").as(user), unix_micros(col("ts")).as(us))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("p_us"))
    val j1 = graft.plans.NativeAsOf.joinAsOf(purchases,
      side("click", "c_user", "c_us"), "user_id", "c_user", "p_us", "c_us")
    val j2 = graft.plans.NativeAsOf.joinAsOf(j1,
      side("view", "v_user", "v_us"), "user_id", "v_user", "p_us", "v_us")
    val j3 = graft.plans.NativeAsOf.joinAsOf(j2,
      side("signup", "s_user", "s_us"), "user_id", "s_user", "p_us", "s_us")
    val rows = j3.select("event_id", "user_id", "p_us", "c_us", "v_us", "s_us")
      .collect()
    val plan = j3.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    def count(token: String) = token.r.findAllIn(plan).length
    assert(count("AsOfJoin ") === 3, s"expected 3 chained execs:\n$plan")
    // each INPUT shuffles+sorts once; every chained left side rides the
    // previous exec's declared outputPartitioning + outputOrdering
    assert(count("Exchange hashpartitioning") === 4,
      s"chained left sides must not re-shuffle:\n$plan")
    assert(count(" Sort \\[") === 4,
      s"chained left sides must not re-sort:\n$plan")

    // correctness: every hop independently recomputed in memory
    val byType = ev.select("event_type", "user_id", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 +
          (r.getTimestamp(2).getNanos / 1000) % 1000))
      .groupBy(_._1)
    def latestAtOrBefore(t: String, uid: Long, us: Long): Option[Long] =
      byType.getOrElse(t, Array.empty)
        .collect { case (_, u, ts2) if u == uid && ts2 <= us => ts2 }
        .maxOption
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (uid, pUs) = (r.getLong(1), r.getLong(2))
      def got(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      assert(got(3) === latestAtOrBefore("click", uid, pUs))
      assert(got(4) === latestAtOrBefore("view", uid, pUs))
      assert(got(5) === latestAtOrBefore("signup", uid, pUs))
    }
  }

  test("purchase->click as-of: gaps are non-negative, schema complete") {
    val rows = AsOfJoin.clickToPurchase(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(4)) assert(r.getLong(4) >= 0L,
        s"negative gap for event ${r.getLong(0)}")
    }
    // at least one purchase precedes all clicks for some user OR all match;
    // either way matched rows must dominate on this fixture
    val matched = rows.count(!_.isNullAt(3))
    assert(matched > rows.length / 2)
  }
}
