package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CountMinAgg, HistQuantileAgg}

/** Specs for the deterministic mergeable sketches (histogram quantile,
  * count-min). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hq(df: org.apache.spark.sql.DataFrame, q: Double,
      lo: Double = 0.0, hi: Double = 100.0, bins: Int = 1000): Option[Double] =
    Option(df.agg(HistQuantileAgg(col("x").cast("double"), lo, hi, bins, q))
      .head().get(0)).map(_.asInstanceOf[Double])

  test("estimate is within one bin width of the exact percentile") {
    val rnd = new scala.util.Random(41)
    val xs = Seq.fill(5000)(rnd.nextDouble() * 100.0)
    val df = xs.toDF("x")
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val exact = df.agg(expr(s"percentile(x, $q)")).head().getDouble(0)
      val est = hq(df, q).get
      assert(math.abs(est - exact) <= 0.1 + 1e-9,
        s"q=$q est=$est exact=$exact") // bin width = 100/1000
    }
  }

  test("merge-order invariance: estimate identical across partitionings") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(5000)(rnd.nextDouble() * 100.0)
    val base = hq(xs.toDF("x"), 0.9)
    for (parts <- Seq(1, 7, 32)) {
      val got = hq(xs.toDF("x").repartition(parts), 0.9)
      assert(got === base, s"partitioning $parts changed the estimate")
    }
  }

  test("out-of-range values clamp into edge bins; empty input is null") {
    // everything below lo lands in bin 0 → estimate = within first bin
    val low = hq(Seq(-5.0, -3.0).toDF("x"), 0.5)
    assert(low.get >= 0.0 && low.get <= 0.1)
    val high = hq(Seq(500.0).toDF("x"), 0.5)
    assert(high.get >= 99.9 && high.get <= 100.0)
    assert(hq(spark.emptyDataset[Double].toDF("x"), 0.5) === None)
  }

  test("rank semantics match ceil(q*n) on a tiny explicit input") {
    // 4 values, q=0.5 → rank 2; bins of width 1 → value ≈ the 2nd value's
    // bin, interpolated by rank fraction within the bin
    val df = Seq(1.5, 2.5, 3.5, 4.5).toDF("x")
    val est = hq(df, 0.5, lo = 0.0, hi = 10.0, bins = 10).get
    // rank 2 → bin [2,3) holds one value, frac = 1/1 → lo + w*2 + w*1 = 3.0
    assert(est === 3.0)
  }

  // ---- count-min sketch ----

  private def cmsOf(df: org.apache.spark.sql.DataFrame,
      depth: Int = 4, width: Int = 64): Seq[Long] =
    df.agg(CountMinAgg(col("k"), depth, width)).head()
      .getSeq[Long](0)

  test("cms: scala bucket hash matches the Spark SQL portable md5 hash") {
    // CountMinAgg.bucket must equal conv(substr(md5('i:s'),1,15),16,10) % w
    // — the cross-engine contract the oracle and the probe side rely on
    val keys = Seq("0", "42", "149", "hello world", "ä-unicode")
    val rows = for (i <- 0 until 4; s <- keys) yield (i, s)
    val got = rows.toDF("i", "s")
      .select(col("i"), col("s"),
        (conv(substring(md5(concat(col("i").cast("string"), lit(":"),
          col("s"))), 1, 15), 16, 10).cast("long") % 64).as("bucket"))
      .collect()
    got.foreach { r =>
      assert(CountMinAgg.bucket(r.getInt(0), r.getString(1), 64) ===
        r.getLong(2).toInt, s"i=${r.getInt(0)} s=${r.getString(1)}")
    }
  }

  test("cms: sketch is identical across partitionings") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").cast("string").as("k"))
    val base = cmsOf(ev)
    for (parts <- Seq(1, 7, 32)) {
      assert(cmsOf(ev.repartition(parts)) === base,
        s"partitioning $parts changed the sketch")
    }
  }

  test("cms: union of per-group sketches = elementwise sum = global sketch") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("user_id").cast("string").as("k"))
    val global = cmsOf(ev)
    // sketches as DATA: union per-type sketches in plain relational
    // algebra (posexplode + groupBy(pos) + sum) — no second UDAF needed
    val merged = ev.groupBy("event_type")
      .agg(CountMinAgg(col("k"), 4, 64).as("sk"))
      .select(posexplode(col("sk")).as(Seq("pos", "c")))
      .groupBy("pos").agg(sum("c").as("c"))
      .orderBy("pos").select("c").as[Long].collect().toSeq
    assert(merged === global)
  }

  test("cms: estimates overestimate exact counts, never under") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id").isNotNull)
      .select(col("user_id").cast("string").as("k"))
    // width 8 << distinct keys at sf0.001, so collisions are guaranteed
    // to be exercised (the sf0.01 query gets them at 64 from 150 users)
    val sk = cmsOf(ev, width = 8)
    val exact = ev.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var over = 0L
    exact.foreach { case (k, n) =>
      val est = (0 until 4)
        .map(i => sk(i * 8 + CountMinAgg.bucket(i, k, 8))).min
      assert(est >= n, s"cms UNDERestimated key $k: $est < $n")
      over += est - n
    }
    // fixture + hashes are deterministic: overestimates must occur
    assert(over > 0, "no collisions at 4x8 — sketch not exercised")
  }

  test("cms: SQL-registered cms_agg builds the same sketch") {
    GraftFunctions.register(spark)
    Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").cast("string").as("k"))
      .createOrReplaceTempView("cms_in")
    val viaSql = spark.sql("SELECT cms_agg(k, 4, 64) FROM cms_in")
      .head().getSeq[Long](0)
    val direct = cmsOf(
      spark.table("cms_in"))
    assert(viaSql === direct)
  }

  private def bloomOf(df: org.apache.spark.sql.DataFrame,
      bits: Int = 256, k: Int = 3): Seq[Long] =
    df.agg(graft.functions.BloomAgg(col("k"), bits, k))
      .head().getSeq[Long](0)

  test("bloom: no false negatives, partitioning-independent, OR-merge") {
    val keys = (1 to 200).map(i => s"key$i")
    val df = keys.toDF("k")
    val sk = bloomOf(df)
    // bit-identical under any partitioning (OR is commutative/assoc/idem)
    assert(bloomOf(df.repartition(7)) === sk)
    assert(bloomOf(df.union(df)) === sk) // idempotent under duplicates
    def member(s: String): Boolean = (0 until 3).forall { i =>
      val p = CountMinAgg.bucket(i, s, 256)
      ((sk(p >>> 6) >>> (p & 63)) & 1L) == 1L
    }
    // every inserted key MUST test positive
    keys.foreach(s => assert(member(s), s"false negative for $s"))
    // 256 bits over 200 keys is saturated enough that some absent keys
    // collide — and far from all: the filter must discriminate
    val absent = (1 to 200).map(i => s"other$i")
    val fp = absent.count(member)
    assert(fp > 0, "no false positives at 256 bits — filter not exercised")
    assert(fp < absent.size, "filter passes everything — useless")
  }

  test("bloom: SQL-registered bloom_agg builds the same filter") {
    GraftFunctions.register(spark)
    (1 to 50).map(i => s"k$i").toDF("k").createOrReplaceTempView("bloom_in")
    val viaSql = spark.sql("SELECT bloom_agg(k, 256, 3) FROM bloom_in")
      .head().getSeq[Long](0)
    assert(viaSql === bloomOf(spark.table("bloom_in")))
  }

  test("HllRegAgg registers equal the relational GROUP BY formulation") {
    // rel_column_stats_sketch fuses the register sketch into the stats
    // aggregation via HllRegAgg; its correctness contract is exact
    // register equality with the hllPortable-style relational
    // formulation over the same md5-60 hashes — pin it per column on
    // the sf0.001 lineitem, registers AND the buckets they imply.
    import graft.functions.HllRegAgg
    import graft.operators.Dedup
    val m = graft.operators.Relational.HllM
    val d = "/root/testdata/sf0.001"
    val hashed = Tables.lineitem(spark, d)
      .select(col("l_returnflag").as("g"),
        Dedup.md5hash60(
          expr("cast(floor(l_quantity * 1000000.0) as bigint)")
            .cast("string")).as("h"))
    val fused = hashed.groupBy("g")
      .agg(HllRegAgg(col("h"), m).as("regs"))
      .select(col("g"), posexplode(col("regs")).as(Seq("bucket", "mj")))
      .filter(col("mj") > 0)
      .as[(String, Int, Int)].collect().toSet
    val relational = hashed
      .select(col("g"), (col("h") % m).as("bucket"),
        expr(s"h div $m").as("rest"))
      .select(col("g"), col("bucket"),
        when(col("rest") === 0L, lit(53))
          .otherwise(lit(53) - length(bin(col("rest")))).as("rho"))
      .groupBy("g", "bucket").agg(max("rho").cast("int").as("mj"))
      .select(col("g"), col("bucket").cast("int"), col("mj"))
      .as[(String, Int, Int)].collect().toSet
    assert(fused.nonEmpty)
    assert(fused === relational)
  }
}
