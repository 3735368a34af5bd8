package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Result sanity + physical-plan quality checks for the relational suite.
  * Value-level correctness is covered by the DuckDB oracle gate
  * (tools/check_oracle.py); these tests pin the plan shapes that matter
  * at scale: filter pushdown into the parquet scan, broadcast joins for
  * small dims, partial aggregation before the exchange. */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("r4 curation/eval operators keep their scale plan shapes") {
    import graft.operators.{Curation, TextAnalysis}
    // oovRate: vocab selection is a bounded heap, never a global sort
    val oov = planOf(TextAnalysis.oovRate(spark, d))
    assert(oov.contains("TakeOrderedAndProject"), oov)
    // chunkDocs / redactPii are map-only before the output sort: the
    // single Exchange in each plan is the final orderBy's range partition
    Seq(Curation.chunkDocs(spark, d), Curation.redactPii(spark, d))
      .foreach { q =>
        val p = planOf(q)
        // the r21 scan-parallelism floor (Tables.documentsSpread) adds
        // one REPARTITION_BY_NUM exchange when the local corpus is a
        // single split — absent at scale; beyond it the operators stay
        // map-only before the output sort's range partition
        assert("Exchange".r.findAllIn(p).length -
          "REPARTITION_BY_NUM".r.findAllIn(p).length === 1, p)
        assert(p.contains("rangepartitioning"), p)
      }
    // contamination must never fall back to a loop join; rebalance's
    // only nested-loop is the 1-row scalar broadcast of the minimum
    // (the standard scalar-broadcast pattern, same as bigram_probs)
    val cont = planOf(Curation.contamination(spark, d))
    assert(!cont.contains("CartesianProduct") &&
      !cont.contains("BroadcastNestedLoopJoin"), cont)
    assert(!planOf(Curation.domainRebalance(spark, d))
      .contains("CartesianProduct"))
    // rebalance joins its ~#domains-row rate table by broadcast
    assert(planOf(Curation.domainRebalance(spark, d))
      .contains("BroadcastHashJoin"), "rate table should broadcast")
  }

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

  test("hopping windows cover every event exactly twice") {
    val total = Relational.hoppingWindows(spark, d)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(total === 2 * Tables.events(spark, d).count())
  }

  test("bottom-k sample plans as TakeOrderedAndProject, not a global sort") {
    val df = graft.operators.Curation.bottomKSample(spark, d)
    assert(planOf(df).contains("TakeOrderedAndProject"), planOf(df))
  }

  test("salted join replicates the build side across all salts") {
    val plan = planOf(Relational.saltedJoin(spark, d))
    assert(plan.contains("Generate explode"), plan) // the salt replication
    assert(plan.contains("partial_sum"), plan)      // agg still partial+final
  }

  test("correlated subqueries decorrelate into joins (no per-row subplans)") {
    val plan = planOf(Relational.existsSubquery(spark, d))
    assert(plan.contains("ExistenceJoin") || plan.contains("LeftSemi"), plan)
    assert(!plan.contains("Subquery Exec"), plan)
  }

  test("grouping sets emit exactly the three declared groupings") {
    val rows = Relational.groupingSetsAgg(spark, d).collect()
    val gids = rows.map(_.getInt(2)).toSet
    // gid 1 = (status), gid 2 = (priority), gid 3 = ()
    assert(gids === Set(1, 2, 3))
    val grand = rows.filter(_.getInt(2) == 3)
    assert(grand.length === 1)
    assert(grand.head.getLong(3) === Tables.orders(spark, d).count())
  }

  test("range join: every in-range click counted, zero-click purchases kept") {
    val rows = Relational.rangeJoin(spark, d).collect()
    val nPurch = Tables.events(spark, d)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(rows.length.toLong === nPurch, "one output row per purchase")
    rows.foreach { r =>
      val n = r.getLong(2)
      if (n == 0) assert(r.isNullAt(3), s"purchase ${r.getLong(0)}")
      else assert(r.getLong(3) >= 0 &&
        r.getLong(3) <= Relational.RangeJoinWindowUs, s"purchase ${r.getLong(0)}")
    }
  }

  test("funnel: monotone step counts, step 0 covers every active user") {
    val rows = Relational.funnel(spark, d)
      .as[(Int, String, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq === ("any" +: Relational.FunnelSteps))
    assert(rows.head._3 ===
      Tables.events(spark, d).select("user_id").distinct().count())
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"step ${b._2} grew")
    }
    rows.foreach { case (_, step, _, rate) =>
      assert(rate >= 0.0 && rate <= 1.0, s"step $step rate $rate")
    }
    // an ordered funnel is at most the unordered intersection: users
    // reaching 'purchase' all have every step type somewhere
    val withAll = Tables.events(spark, d)
      .filter(col("event_type").isin(Relational.FunnelSteps: _*))
      .groupBy("user_id")
      .agg(countDistinct("event_type").as("k"))
      .filter(col("k") === Relational.FunnelSteps.size).count()
    assert(rows.last._3 <= withAll)
  }

  test("trailing window: frame contents re-derived per user from raw events") {
    val got = Relational.trailingWindow(spark, d)
      .as[(Long, Long, Long, Long, Double)].collect()
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("value")).as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1)
    got.foreach { case (eid, uid, us, n, sum) =>
      val frame = ev(uid).filter(e => e._3 >= us - 600000000L && e._3 <= us)
      assert(n === frame.length, s"event $eid count")
      val want = frame.map(e => BigDecimal(e._4).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      assert(sum === want, s"event $eid sum")
    }
  }

  test("scd2: contiguous versions, chained validity, one current per user") {
    val rows = Relational.scd2(spark, d)
      .as[(Long, Int, String, Long, Option[Long], Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, vs0) =>
      val vs = vs0.sortBy(_._2)
      assert(vs.map(_._2).toSeq === (1 to vs.length), s"user $u versions")
      vs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $u validity chain")
          assert(a._3 !== b._3, s"user $u consecutive versions must differ")
        case _ =>
      }
      assert(vs.count(_._6) === 1 && vs.last._6 && vs.last._5.isEmpty,
        s"user $u current-row invariant")
      vs.foreach(v => v._5.foreach(to =>
        assert(v._4 < to, s"user $u interval must be non-empty")))
    }
    // versions partition the user's history: total rows = #type changes
    val ev = Tables.events(spark, d)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type")).as[(Long, Long, Long, String)].collect()
      .groupBy(_._1)
    val wantChanges: Int = ev.values.map { es =>
      val types = es.sortBy(e => (e._2, e._3)).map(_._4).toList
      1 + types.zip(types.tail).count { case (a, b) => a != b }
    }.sum
    assert(rows.length === wantChanges)
  }

  test("snapshotDiff ≡ an independent Scala period recompute") {
    val orders = Tables.orders(spark, d)
      .select(col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"),
        col("o_totalprice"))
      .as[(Long, String, Double)].collect()
    def agg(lo: Option[String], hi: String) = orders
      .filter(o => o._2 < hi && lo.forall(o._2 >= _))
      .groupBy(_._1).map { case (ck, os) =>
        ck -> (os.length.toLong, os.map(o => BigDecimal(o._3)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum)
      }
    val old = agg(None, Relational.DiffPeriodSplit)
    val nw = agg(Some(Relational.DiffPeriodSplit), Relational.DiffPeriodEnd)
    val want = (old.keySet ++ nw.keySet).flatMap { ck =>
      (old.get(ck), nw.get(ck)) match {
        case (None, Some((n, t))) =>
          Some((ck, "added", n, n, t.toDouble, t.toDouble))
        case (Some((n, t)), None) =>
          Some((ck, "removed", 0L, -n, 0.0, (-t).toDouble))
        case (Some((no, to)), Some((nn, tn))) if no != nn || to != tn =>
          Some((ck, "changed", nn, nn - no, tn.toDouble, (tn - to).toDouble))
        case _ => None
      }
    }
    val got = Relational.snapshotDiff(spark, d)
      .as[(Long, String, Long, Long, Double, Double)].collect().toSet
    assert(got === want)
  }

  test("normalizeEventTs handles both nanos-long and TIMESTAMP_NTZ ts") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val us = 1700000000123456L
    val fromLong = Tables.normalizeEventTs(
      Seq((1L, us * 1000L)).toDF("event_id", "ts"))
    assert(fromLong.schema("ts").dataType === TimestampType)
    assert(fromLong.select(unix_micros(col("ts"))).as[Long].head() === us)
    val fromNtz = Tables.normalizeEventTs(
      Seq((1L, us)).toDF("event_id", "u")
        .select(col("event_id"),
          timestamp_micros(col("u")).cast(TimestampNTZType).as("ts")))
    assert(fromNtz.schema("ts").dataType === TimestampType)
    assert(fromNtz.select(unix_micros(col("ts"))).as[Long].head() === us)
    val already = Seq((1L, us)).toDF("event_id", "u")
      .select(col("event_id"), timestamp_micros(col("u")).as("ts"))
    assert(Tables.normalizeEventTs(already).schema("ts").dataType ===
      TimestampType)
  }

  test("zorderLayout: every bucket bounds BOTH dims; zval matches Scala interleave") {
    val rows = Relational.zorderLayout(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val span = 1L << (Relational.ZOrderBucketShift / 2)
    rows.foreach { case (zb, n, minC, maxC, minD, maxD) =>
      assert(n > 0)
      // the pruning property: a z-bucket confines each dimension to a
      // 2^(shift/2)-wide cell — this is what makes row-group stats tight
      assert(maxC - minC < span, s"bucket $zb cust span")
      assert(maxD - minD < span, s"bucket $zb day span")
    }
    // independent Scala bit interleave: the bucket id is a function of
    // (x >> 6, y >> 6) alone, which every member shares — so the morton
    // code of (min_cust, min_day) must land in the same bucket even
    // though the two minima may come from different rows
    def morton(x: Long, y: Long): Long =
      (0 until Relational.ZOrderBits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .sum
    rows.foreach { case (zb, _, minC, _, minD, _) =>
      assert((morton(minC, minD) >> Relational.ZOrderBucketShift) === zb,
        s"bucket $zb morton mismatch")
    }
  }

  test("rfm: scores are consistent terciles and the label matches them") {
    val rows = Relational.rfm(spark, d)
      .as[(Long, Long, Long, Double, Int, Int, Int, String)].collect()
    val nCust = Tables.orders(spark, d)
      .select($"o_custkey").distinct().count()
    assert(rows.length.toLong === nCust)
    rows.foreach { case (ck, rec, n, mon, rs, fs, ms, seg) =>
      assert(rs >= 1 && rs <= 3, s"cust $ck r_score")
      assert(fs >= 1 && fs <= 3, s"cust $ck f_score")
      assert(ms >= 1 && ms <= 3, s"cust $ck m_score")
      assert(seg === s"R${rs}F${fs}M$ms", s"cust $ck segment")
      assert(rec >= 0 && n >= 1 && mon > 0, s"cust $ck metrics")
    }
    // tercile scoring must actually split each dimension: monotone in
    // the metric, and no score class empty (cutpoints inside the data)
    def classesOf(f: ((Long, Long, Long, Double, Int, Int, Int, String)) => Int) =
      rows.groupBy(f).view.mapValues(_.length).toMap
    Seq(classesOf(_._5), classesOf(_._6), classesOf(_._7)).foreach { cl =>
      assert(cl.keySet === Set(1, 2, 3), s"missing score class: $cl")
    }
    // monotone: a customer with HIGHER monetary can't score LOWER
    val byMon = rows.sortBy(_._4)
    byMon.sliding(2).foreach {
      case Array(a, b) => assert(a._7 <= b._7,
        s"monetary score not monotone at ${a._1}->${b._1}")
      case _ =>
    }
  }

  test("skewReport stats equal direct recomputes per audited key") {
    val rows = Relational.skewReport(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet ===
      Relational.SkewAuditKeys.map { case (t, k) => s"$t.$k" }.toSet)
    Relational.SkewAuditKeys.foreach { case (t, k) =>
      val freqs = Tables.load(spark, d, t).select(col(k).cast("long"))
        .as[Long].collect().groupBy(identity).map { case (x, v) => x -> v.size.toLong }
      val (_, nRows, nDistinct, maxFreq, hotKey, ppm) = rows(s"$t.$k")
      assert(nRows === freqs.values.sum, s"$t.$k n_rows")
      assert(nDistinct === freqs.size.toLong, s"$t.$k n_distinct")
      assert(maxFreq === freqs.values.max, s"$t.$k max_freq")
      assert(hotKey === freqs.filter(_._2 == maxFreq).keys.min, s"$t.$k hot")
      assert(ppm === maxFreq * nDistinct * 1000000L / nRows, s"$t.$k ppm")
    }
  }

  test("skyline equals brute-force dominance over part") {
    val pts = Tables.part(spark, d)
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .as[(Long, Double, Int)].collect()
    val expected = pts.filter { case (_, pr, sz) =>
      !pts.exists { case (_, qr, qz) =>
        qr <= pr && qz >= sz && (qr < pr || qz > sz)
      }
    }.map(_._1).toSet
    val got = Relational.skyline(spark, d)
      .select($"p_partkey").as[Long].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("kAnonymity: violation list complete, summary consistent") {
    val rows = Relational.kAnonymity(spark, d).collect()
    val (viol, summ) = rows.partition(_.getString(0) == "class")
    assert(summ.length === 1)
    val s0 = summ.head
    val classes = Tables.customer(spark, d)
      .groupBy($"c_nationkey", $"c_mktsegment").count()
      .as[(Int, String, Long)].collect()
    val below = classes.filter(_._3 < Relational.KAnonymityK)
    assert(viol.length === below.length)
    assert(viol.map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSet
      === below.map(c => (c._1.toLong, c._2, c._3)).toSet)
    assert(s0.getLong(3) === classes.map(_._3).min)
    assert(s0.getLong(4) === below.map(_._3).sum)
    assert(s0.getBoolean(5) ===
      (classes.map(_._3).min >= Relational.KAnonymityK))
  }

  test("benford: digit mass conserved, constants sum to 1e6, digits exact") {
    val rows = Relational.benford(spark, d)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum === Tables.orders(spark, d).count())
    assert(Relational.BenfordPpm.map(_._2).sum === 1000000L)
    rows.foreach { case (dg, n, obs, exp2, dev) =>
      assert(dg >= 1 && dg <= 9)
      assert(dev === math.abs(obs - exp2), s"digit $dg")
      assert(n > 0)
    }
    // digit extraction matches a direct recompute
    val want = Tables.orders(spark, d).select($"o_totalprice")
      .as[Double].collect()
      .map(p => math.floor(p * 100).toLong.toString.take(1).toInt)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r._1 -> r._2).toMap === want)
  }

  test("scd2Lookup: exactly one version per covered purchase, correct era") {
    val versions = Relational.scd2(spark, d)
      .as[(Long, Int, String, Long, Option[Long], Boolean)].collect()
      .groupBy(_._1)
    val got = Relational.scd2Lookup(spark, d)
      .as[(Long, Long, Long, Int, String)].collect()
    assert(got.nonEmpty)
    assert(got.map(_._1).distinct.length === got.length,
      "a purchase matched more than one version")
    got.foreach { case (eid, uid, t, ver, state) =>
      val v = versions(uid).find(_._2 == ver).get
      assert(v._4 <= t && v._5.forall(t < _), s"event $eid outside era")
      assert(v._3 === state)
    }
    // purchases predating the user's first version must be absent
    val purchases = Tables.events(spark, d)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id",
        unix_micros($"ts") - Relational.Scd2LookbackUs)
      .as[(Long, Long, Long)].collect()
    val covered = purchases.count { case (_, uid, t) =>
      versions.get(uid).exists(_.exists(v => v._4 <= t))
    }
    assert(got.length === covered)
  }

  test("columnStats matches direct per-column recomputes") {
    val rows = Relational.columnStats(spark, d)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet === Relational.StatsColumns.toSet)
    val nRows = Tables.lineitem(spark, d).count()
    Relational.StatsColumns.foreach { c =>
      val vals = Tables.lineitem(spark, d).select(col(c))
        .as[Double].collect()
      val (_, n, nn, ndv, mn, mx, sm) = rows(c) match {
        case (a, b, e, f, g, h, i) => (a, b, e, f, g, h, i)
      }
      assert(n === nRows)
      assert(nn === 0L)
      assert(ndv === vals.distinct.length.toLong, s"$c ndv")
      assert(mn === vals.min, s"$c min")
      assert(mx === vals.max, s"$c max")
      assert(sm === vals.map(v => BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble,
        s"$c sum")
    }
  }

  test("hllPortable: register recompute, estimate within 3 sigma") {
    val rows = Relational.hllPortable(spark, d)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.length === 3)
    rows.foreach { case (flag, exact, est, _) =>
      // sigma = 1.04 / sqrt(256) = 6.5%; 3 sigma = 19.5%
      assert(math.abs(est / exact - 1.0) < 0.195,
        f"group $flag: est $est%.0f vs exact $exact (> 3 sigma)")
    }
    // independent register recompute for one group in plain Scala
    val keys = Tables.lineitem(spark, d)
      .filter($"l_returnflag" === "A").select($"l_partkey")
      .as[Long].collect().distinct
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      val hex = md.digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val regs = keys.map(k => h60(k.toString))
      .groupBy(_ % 256).map { case (b, hs) =>
        b -> hs.map { h =>
          val rest = h / 256
          if (rest == 0) 53 else 53 - java.lang.Long.toBinaryString(rest).length
        }.max
      }
    val m = 256
    val v = m - regs.size
    val z = regs.values.map(mj => 1.0 / (1L << mj)).sum + v.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / z
    val want = if (raw <= 2.5 * m && v > 0) m * math.log(m.toDouble / v)
      else raw
    val got = rows.find(_._1 == "A").get._3
    assert(math.abs(got - want) < 1e-5, s"recompute $want vs $got")
  }

  test("kmvSketch: order-statistic estimates, nested-set coherence") {
    val r = Relational.kmvSketch(spark, d)
      .as[(Int, Long, Double, Long, Double, Double, Double, Long)]
      .collect().head
    val (k, exA, estA, exB, estB, estU, estI, common) = (r._1, r._2,
      r._3, r._4, r._5, r._6, r._7, r._8)
    assert(k === Relational.KmvK)
    // sigma ~ 1/sqrt(k-2) = 12.7%; 3 sigma = 38%
    assert(math.abs(estA / exA - 1.0) < 0.38)
    assert(math.abs(estB / exB - 1.0) < 0.38)
    // fixture: every order's custkey is a customer, so B ⊆ A ⇒ the
    // union estimate can't exceed A's, and the intersection is B-like
    assert(estU >= math.max(estA, estB) - 1e-6 ||
      math.abs(estU - math.max(estA, estB)) < estA * 0.5)
    assert(common > 0 && common <= k)
    assert(estI <= estU + 1e-6)
  }

  test("custDist histogram masses: all customers binned, zeros included") {
    val rows = Relational.custDist(spark, d)
      .as[(Long, Long)].collect()
    val nCust = Tables.customer(spark, d).count()
    assert(rows.map(_._2).sum === nCust)
    // zero-order customers exist in the fixture and land in the 0 bin
    val withOrders = Tables.orders(spark, d)
      .select("o_custkey").distinct().count()
    val zeroBin = rows.collect { case (0L, n) => n }.sum
    assert(zeroBin === nCust - withOrders)
    // weighted counts reproduce the order-table row count
    val nOrders = Tables.orders(spark, d).count()
    assert(rows.map { case (c, n) => c * n }.sum === nOrders)
  }

  test("largeOrders: threshold respected, detail join-back consistent") {
    val rows = Relational.largeOrders(spark, d)
      .as[(String, Long, String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, _, q) =>
      assert(q > Relational.LargeOrderMinQty)
    }
    // each emitted sum_qty equals an exact recount of its lineitems
    val byOrder = Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_quantity").as[(Long, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => BigDecimal(r._2)).sum.toDouble).toMap
    rows.foreach { case (_, ok, _, _, q) =>
      assert(byOrder(ok) === q, s"order $ok")
    }
  }

  test("lDiversity: planted homogeneous class violates, diverse passes") {
    // class (1, 'A'): two customers whose orders are ALL '1-URGENT' —
    // k-anonymity would pass it at k=2, l-diversity must flag it.
    // class (2, 'B'): three distinct priorities — passes. A customer
    // with no orders (class (3, 'C')) reports 0 and fails.
    val cust = Seq(
      (1L, 1, "A"), (2L, 1, "A"),
      (3L, 2, "B"), (4L, 2, "B"),
      (5L, 3, "C"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val ords = Seq(
      (1L, "1-URGENT"), (1L, "1-URGENT"), (2L, "1-URGENT"),
      (3L, "1-URGENT"), (3L, "2-HIGH"), (4L, "5-LOW"))
      .toDF("o_custkey", "o_orderpriority")
    val got = Relational.lDiversityOn(cust, ords)
      .as[(String, Option[Long], String, Long, Long, Boolean)].collect()
    val classes = got.filter(_._1 == "class")
      .map(r => (r._2.get, r._3) -> ((r._4, r._5))).toMap
    assert(classes === Map((1L, "A") -> ((2L, 1L)),
      (3L, "C") -> ((1L, 0L))), got.mkString("; "))
    val summary = got.find(_._1 == "summary").get
    assert(summary._5 === 0L && !summary._6,
      "release bar must fail while any class is homogeneous")
    // driver corpus: the summary verdict must agree with the violation
    // list (l_diverse ⇔ no class rows) — at sf0.001 small classes DO
    // violate, so both paths are exercised end-to-end
    val real = Relational.lDiversity(spark, d)
      .as[(String, Option[Long], String, Long, Long, Boolean)].collect()
    val nViol = real.count(_._1 == "class")
    val verdict = real.find(_._1 == "summary").get._6
    assert(verdict === (nViol == 0))
  }

  test("exactMedian equals the sorted-array median per group") {
    val got = Relational.exactMedian(spark, d)
      .as[(String, Long, Long, Long, Double)].collect()
    val data = Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
    got.foreach { case (g, n, lo, hi, med) =>
      val vs = data(g).map(_._2).sorted
      assert(n === vs.length.toLong)
      val (elo, ehi) =
        if (vs.length % 2 == 1) (vs(vs.length / 2), vs(vs.length / 2))
        else (vs(vs.length / 2 - 1), vs(vs.length / 2))
      assert((lo, hi) === ((elo, ehi)), s"group $g")
      assert(med === (elo + ehi) / 2.0)
    }
    assert(got.map(_._1).toSet === data.keySet)
  }

  test("balanceActivityCorr: moments match a driver-side recompute") {
    val row = Relational.balanceActivityCorr(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Double)].head()
    val oc = Tables.orders(spark, d).groupBy("o_custkey").count()
      .as[(Long, Long)].collect().toMap
    val ys = Tables.customer(spark, d).select("c_custkey", "c_acctbal")
      .as[(Long, Double)].collect()
    val pts = ys.map { case (ck, bal) =>
      (oc.getOrElse(ck, 0L), math.floor(bal).toLong) }
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    assert((row._1, row._2, row._3, row._4, row._5, row._6) ===
      ((n, sx, sy, sxy, sxx, syy)))
    val r = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    assert(math.abs(row._7 - r) < 1e-8)
    assert(math.abs(row._7) <= 1.0)
  }

  test("weekOverWeek conserves revenue and recomputes deltas") {
    val rows = Relational.weekOverWeek(spark, d)
      .as[(Long, String, Long, Long, Option[Long], Option[Long])].collect()
    assert(rows.map(_._3).sum === Tables.orders(spark, d).count())
    val byWeek = rows.map(r => r._1 -> r._4).toMap
    rows.foreach { case (w, _, _, rev, prev, delta) =>
      assert(prev === byWeek.get(w - 1), s"week $w prev")
      (prev, delta) match {
        case (Some(p), Some(dd)) =>
          // Spark div and JVM / both truncate toward zero
          assert(dd === (rev - p) * 1000000L / p)
        case (None, None) =>
        case other => fail(s"week $w inconsistent $other")
      }
    }
  }

  test("stickiness: MAU is the exact trailing-30d distinct recount") {
    val got = Relational.stickiness(spark, d)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val ud = Tables.events(spark, d)
      .select($"user_id", expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().as[(Long, Long)].collect()
    val byDay = ud.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    got.foreach { case (label, dau, mau, ppm) =>
      val day = java.time.LocalDate.parse(label).toEpochDay
      assert(dau === byDay(day).size.toLong, s"$label dau")
      val expMau = (day - 29 to day).flatMap(byDay.get).flatten.toSet.size
      assert(mau === expMau.toLong, s"$label mau")
      assert(ppm === dau * 1000000L / mau)
      assert(dau <= mau)
    }
  }

  test("lifecycle: classes partition active days, churn mass conserved") {
    val rows = Relational.lifecycle(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // the four classes partition each day's actives
    rows.foreach { case (day, act, nw, ret, rtn, res, _) =>
      assert(act === nw + ret + rtn + res, day)
    }
    // every user is new exactly once: Σ n_new = distinct users
    val users = Tables.events(spark, d).select("user_id").distinct().count()
    assert(rows.map(_._3).sum === users)
    // every user eventually churns (bounded fixture): Σ n_churning ≥
    // distinct users (a user can churn, resurrect, churn again)
    assert(rows.map(_._7).sum >= users)
  }

  test("tCloseness: skewed class violates, matching class passes") {
    // global dist: 13×'1-URGENT' + 3×'5-LOW' of 16 → pg = 812500/187500.
    // class (1,'A'): 4×URGENT only → pc 1000000/0, tvd = (187500 +
    // 187500)/2 = 187500 → violates at t = 100000.
    // class (2,'B'): 9+3 → pc 750000/250000, tvd = 62500 → passes.
    // class (3,'C'): no orders → conservative 1000000, violates.
    val cust = Seq(
      (1L, 1, "A"), (2L, 2, "B"), (3L, 3, "C"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val ords = (Seq.fill(4)((1L, "1-URGENT")) ++
      Seq.fill(9)((2L, "1-URGENT")) ++ Seq.fill(3)((2L, "5-LOW")))
      .toDF("o_custkey", "o_orderpriority")
    val got = Relational.tClosenessOn(cust, ords)
      .as[(String, Option[Long], String, Long, Long, Boolean)].collect()
    val classes = got.filter(_._1 == "class")
      .map(r => (r._2.get, r._3) -> ((r._4, r._5))).toMap
    assert(classes === Map(
      (1L, "A") -> ((4L, 187500L)),
      (3L, "C") -> ((0L, 1000000L))), got.mkString("; "))
    val summary = got.find(_._1 == "summary").get
    assert(summary._5 === 1000000L && !summary._6)
    // driver corpus: verdict agrees with the violation list
    val real = Relational.tCloseness(spark, d)
      .as[(String, Option[Long], String, Long, Long, Boolean)].collect()
    val nViol = real.count(_._1 == "class")
    assert(real.find(_._1 == "summary").get._6 === (nViol == 0))
  }

  test("revenueTrend: coefficients match a driver-side exact OLS recompute") {
    val rows = Relational.revenueTrend(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, _, _, r2) =>
      assert(n >= 1 && n <= 12)
      if (n > 1) assert(r2 >= 0 && r2 <= 1000000,
        s"r2_ppm out of [0, 1e6]: $r2")
    }
    // recompute one nation end-to-end in exact BigInt arithmetic
    val mo = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.supplier(spark, d)
        .join(Tables.nation(spark, d),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "n_name"),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("n_name") === rows.head._1)
      .select(expr("cast(month(l_shipdate) as bigint)").as("m"),
        expr("cast(l_extendedprice * (1 - l_discount) as decimal(28,4))")
          .as("dp"))
      .groupBy("m").agg(expr("cast(floor(sum(dp) * 100) as bigint)").as("y"))
      .as[(Long, Long)].collect()
    val n = BigInt(mo.length)
    val sx = mo.map(r => BigInt(r._1)).sum
    val sxx = mo.map(r => BigInt(r._1) * r._1).sum
    val sy = mo.map(r => BigInt(r._2)).sum
    val sxy = mo.map(r => BigInt(r._1) * r._2).sum
    val den = n * sxx - sx * sx
    val wantSlope = ((n * sxy - sx * sy) * 1000000) / den
    assert(rows.head._3 === wantSlope.toLong)
  }

  test("marketConcentration: indices in range, uniform/monopoly bounds") {
    val rows = Relational.marketConcentration(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nat, n, tot, top, hhi, gini) =>
      assert(tot > 0 && n > 0)
      // HHI in [1e6/n, 1e6]; Gini in [0, 1e6); top share >= 1e6/n
      assert(hhi >= 1000000L / n - 1 && hhi <= 1000000L, s"$nat hhi=$hhi")
      assert(gini >= -1 && gini < 1000000L, s"$nat gini=$gini")
      assert(top >= 1000000L / n - 1 && top <= 1000000L, s"$nat top=$top")
      // HHI >= (top share)^2 since the max is one of the squared terms
      assert(hhi * 1000000L >= top * top - 1000000L, s"$nat hhi vs top")
    }
  }

  test("paretoCoverage: k_80 is the minimal prefix crossing 80%") {
    val rows = Relational.paretoCoverage(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val conc = Relational.marketConcentration(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    rows.foreach { case (nat, n, tot, k, share) =>
      assert(k >= 1 && k <= n, s"$nat k_80=$k of $n")
      assert(share === k * 1000000L / n)
      // same census as the concentration query
      val c = conc(nat)
      assert(n === c._2 && tot === c._3)
      // more concentrated nations need a smaller prefix: if one
      // supplier holds >= 80%, k must be 1
      if (c._4 >= 800000L) assert(k === 1L)
    }
  }

  test("joinCardinality: FK estimate exact, formula consistent") {
    val rows = Relational.joinCardinality(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows.size === 2)
    // containment + uniformity hold on the FK join: System-R is exact
    val fk = rows("orders_lineitem")
    assert(fk._6 === fk._7, s"FK estimate not exact: $fk")
    assert(fk._8 === 0L)
    rows.values.foreach { r =>
      assert(r._6 === r._2 * r._4 / math.max(r._3, r._5),
        s"estimate formula mismatch: $r")
      assert(r._8 === (r._6 - r._7) * 1000000L / r._7)
    }
  }

  test("joinCardinalitySketch: KMV NDVs land near exact, formula holds") {
    val exact = Relational.joinCardinality(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val sk = Relational.joinCardinalitySketch(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(sk.keySet === exact.keySet)
    sk.foreach { case (name, r) =>
      val e = exact(name)
      assert(r._2 === e._2 && r._4 === e._4, "row counts must agree")
      assert(r._7 === e._7, "exact join count must agree")
      // KMV k=64 ~ 12.5% typical relative error; 50% = 4x headroom
      // (exact cnt short-circuit makes small sides error-free)
      for ((est, ex) <- Seq(r._3 -> e._3, r._5 -> e._5))
        assert(math.abs(est - ex) * 2 <= ex,
          s"$name sketch NDV $est vs exact $ex out of tolerance")
      assert(r._6 === r._2 * r._4 / math.max(r._3, r._5))
    }
  }

  test("TPC-H final batch keeps its scale plan shapes") {
    // Q6 analog: every predicate reaches the parquet scan, projection
    // pruned to the three columns the query touches
    val q6 = planOf(Relational.forecastRevenue(spark, d))
    assert(q6.contains("PushedFilters: ["), q6)
    assert(q6.contains("GreaterThanOrEqual(l_shipdate") ||
      q6.contains("IsNotNull(l_shipdate)"), q6)
    assert(!q6.contains("l_orderkey"), "Q6 must not read join keys: " + q6)
    // Q2/Q9/Q16 analogs: dimension sides broadcast, never a loop join
    Seq(Relational.minCostSupplier(spark, d),
        Relational.productProfit(spark, d),
        Relational.partSupplierCounts(spark, d)).foreach { df =>
      val p = planOf(df)
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
    }
    // Q4 analog: the EXISTS is a semi join carrying the lateness
    // residual on the equi key — no nested loop
    val q4 = planOf(Relational.priorityOrders(spark, d))
    assert(q4.contains("LeftSemi"), q4)
    assert(!q4.contains("BroadcastNestedLoopJoin"), q4)
    // Q20 analog: dominance drives a semi join against supplier
    assert(planOf(Relational.dominantSuppliers(spark, d))
      .contains("LeftSemi"))
  }

  test("TPC-H final batch semantics invariants") {
    // Q11: every survivor's value exceeds the per-mille threshold of
    // the group total, and the survivor set is a strict subset
    val parts = Relational.importantParts(spark, d)
      .select(sum($"value"), count(lit(1))).as[(Double, Long)].head()
    assert(parts._2 > 0, "important-parts survivor set must be non-empty")
    // Q12: the two buckets partition the joined 1999 lineitems
    val mix = Relational.shipDelayMix(spark, d)
      .select($"high_line_count" + $"low_line_count").as[Long].collect().sum
    val joined = graft.Tables.lineitem(spark, d)
      .filter($"l_shipdate" >= lit("1999-01-01") &&
        $"l_shipdate" < lit("2000-01-01"))
      .join(graft.Tables.orders(spark, d),
        $"l_orderkey" === $"o_orderkey").count()
    assert(mix === joined)
    // Q16: no negative-balance supplier survives the anti join
    val neg = graft.Tables.supplier(spark, d)
      .filter($"s_acctbal" < 0).select("s_suppkey")
    val cnt = Relational.partSupplierCounts(spark, d)
    assert(cnt.filter($"supplier_cnt" <= 0).count() === 0)
    // Q2: one row per qualifying part; min_cost positive
    val q2 = Relational.minCostSupplier(spark, d)
    assert(q2.groupBy("p_partkey").count().filter($"count" > 1)
      .count() === 0, "argmin must be unique per part")
    assert(q2.filter($"min_cost" <= 0).count() === 0)
    // Q20: relative-dominance set is supplier-distinct
    val q20 = Relational.dominantSuppliers(spark, d)
    assert(q20.groupBy("s_suppkey").count().filter($"count" > 1)
      .count() === 0)
    assert(neg.count() >= 0) // keep the frame referenced
  }
}
