package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

import graft.streaming.EventStream
import graft.streaming.EventStream.{Ev, SessionOut}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("stateful aggregation is identical under the RocksDB state store") {
    // The 100 TB state path: HDFS-backed state (the default, fine for
    // the bounded fixtures) holds each partition's state in executor
    // memory; production large-state deployments swap in the RocksDB
    // provider via ONE conf. Pin that the swap is semantics-preserving:
    // the same windowed aggregation over the same rows produces the
    // identical result, and the progress metrics prove RocksDB was
    // actually engaged (session-isolated conf, as streamSession does).
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    implicit val sqlCtx = ss.sqlContext
    val batchDf = Tables.events(spark, d)
      .select(col("ts"), col("event_type"), col("value"))
    val rows = batchDf.as[(Timestamp, String, Double)].collect().toSeq
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = EventStream.windowedCounts(
        mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("rocksdb_win_out").start()
    try {
      mem.addData(rows)
      q.processAllAvailable()
      val stateOps = q.lastProgress.stateOperators
      assert(stateOps.nonEmpty)
      assert(stateOps.head.customMetrics.keySet.asScala
        .exists(_.toLowerCase.contains("rocksdb")),
        s"state metrics show no rocksdb keys: ${stateOps.head.customMetrics}")
      val got = ss.table("rocksdb_win_out")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
          .as("w"), col("event_type"), col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      val want = EventStream.windowedCounts(batchDf)
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
          .as("w"), col("event_type"), col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("streaming restart resumes from checkpoint with exactly-once sink") {
    // The production recovery contract: a streaming query stopped
    // mid-run and restarted on the SAME checkpoint + sink must emit
    // every input row exactly once — the offset log replays the
    // in-flight batch and the file-sink metadata log excludes files
    // from uncommitted batches, so neither gaps nor duplicates appear.
    val tmp = java.nio.file.Files.createTempDirectory("graft-restart")
    val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val events = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    events.repartition(8).write.parquet(src) // 8 files → 8 micro-batches
    val sch = spark.read.parquet(src).schema
    def start() = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      val q1 = start()
      // stop as soon as ≥2 data batches committed (mid-run, more remain)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (q1.isActive &&
          q1.recentProgress.count(_.numInputRows > 0) < 2 &&
          System.nanoTime() < deadline) Thread.sleep(50)
      q1.stop()
      val batches1 = q1.recentProgress.count(_.numInputRows > 0)
      val q2 = start() // resume from the same checkpoint
      q2.awaitTermination()
      info(s"run1 committed $batches1 data batches before stop; " +
        s"run2 resumed ${q2.recentProgress.count(_.numInputRows > 0)}")
      val got = spark.read.parquet(out).groupBy("event_id")
        .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = events.select("event_id").as[Long].collect().toSet
      assert(got.keySet === want)           // no gaps
      assert(got.values.forall(_ == 1L))    // no duplicates
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }

  test("streaming dedup stays exactly-once across multiple micro-batches") {
    // The driver-surface dedup query asserts its single-batch premise;
    // the interesting state-store semantics are MULTI-batch (VERDICT r5
    // item 6): duplicates split across micro-batches must still dedup,
    // which exercises cross-batch keyed state rather than within-batch
    // distinct. Doubled load scattered over 8 files + maxFilesPerTrigger=1
    // puts an id's two copies in different batches with near-certainty;
    // the watermark is sized past the fixture's ~30-day event-time span,
    // so no id's state can be evicted before its duplicate arrives and
    // exactly-once must hold across the WHOLE run.
    val tmp = java.nio.file.Files.createTempDirectory("graft-dedup-mb")
    val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val ev = Tables.events(spark, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    ev.union(ev).repartition(8).write.parquet(src)
    val sch = spark.read.parquet(src).schema
    val q = EventStream.dedupEventsStream(
        spark.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(src),
        "45000 minutes") // 31.25 days > fixture span
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      info(s"dedup ran across $dataBatches data micro-batches")
      assert(dataBatches >= 2,
        s"expected >= 2 data batches, got $dataBatches — the multi-batch " +
          "claim needs maxFilesPerTrigger to actually split the source")
      val got = spark.read.parquet(out).groupBy("event_id").count()
        .as[(Long, Long)].collect().toMap
      val want = ev.select("event_id").as[Long].collect().toSet
      assert(got.keySet === want)        // no gaps
      assert(got.values.forall(_ == 1L)) // no duplicates across batches
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
  }

  test("no fixture gap sits exactly on the 10-minute session boundary") {
    // events_sessionized_native shares the gaps-and-islands oracle even
    // though session_window's boundary convention differs: the built-in
    // EXTENDS a session when the next event is strictly inside
    // last_ts + gap, while the window SQL BREAKS on gap > 10 min — they
    // diverge only for a gap of exactly 10 minutes to the microsecond.
    // The shared-oracle assumption must be CHECKED, not assumed (ADVICE
    // r4): pin that no fixture the driver runs against contains such a
    // gap, so a regenerated fixture that violates it fails loudly here
    // instead of spuriously in the oracle compare.
    val gapUs = EventStream.SessionGapMinutes * 60L * 1000000L
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val boundaryGaps = Tables.events(spark, dir)
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("gap_us") === gapUs)
        .count()
      assert(boundaryGaps === 0L,
        s"$dir has $boundaryGaps exact-10-min gaps: events_sessionized_" +
          "native and the gaps-and-islands oracle would disagree there")
    }
  }

  test("stateful sessionization (batch mode) ≡ gaps-and-islands SQL") {
    val evs = Tables.events(spark, d)
      .select(col("user_id"), col("ts"), col("value")).as[Ev]
    val stateful = EventStream.sessionizeStateful(evs, closeTrailing = true)
      .collect().map(s => (s.user_id, s.session_idx, s.start_us, s.end_us,
        s.n_events)).toSet
    val sql = EventStream.sessionizeBatch(spark, d)
      .select("user_id", "session_idx", "start_us", "end_us", "n_events")
      .as[(Long, Int, Long, Long, Int)].collect().toSet
    assert(sql.nonEmpty)
    assert(stateful === sql)
  }

  test("streaming windowed counts (complete mode) ≡ batch on same data") {
    implicit val sqlCtx = spark.sqlContext
    val batchDf = Tables.events(spark, d)
      .select(col("ts"), col("event_type"), col("value"))
    val rows = batchDf.as[(Timestamp, String, Double)].collect().toSeq

    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.windowedCounts(streamDf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      mem.addData(rows)
      q.processAllAvailable()
      val got = spark.table("win_out")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
          .as("w"), col("event_type"), col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      val want = EventStream.windowedCounts(batchDf)
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
          .as("w"), col("event_type"), col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("file-source event stream (nanos parquet) ≡ batch windowed counts") {
    val stream = EventStream.readEventStream(spark, d)
    val q = EventStream.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("file_win_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_win_out")
        .agg(org.apache.spark.sql.functions.sum("n")).as[Long].head()
      assert(got === Tables.events(spark, d).count())
    } finally q.stop()
  }

  test("streaming per-window quantiles ≡ batch percentile on finalized windows") {
    val got = EventStream.quantileStreamVerified(spark, d)
      .as[(String, String, Long, Double, Double)].collect().toSeq.sorted
    // batch twin with the identical ms-precision watermark cutoff
    val ev = Tables.events(spark, d)
    val wmMs = ev.agg(max(unix_micros(col("ts")))).as[Long].head() / 1000 - 1800000
    val want = ev
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        (unix_micros(date_trunc("hour", min(col("ts"))) + expr("INTERVAL 1 HOUR"))
          / lit(1000)).as("wend_ms"))
      .filter(col("wend_ms") <= wmMs)
      .select("hour_start", "event_type", "n", "p50", "p95")
      .as[(String, String, Long, Double, Double)].collect().toSeq.sorted
    assert(got.nonEmpty && got === want)
  }

  test("csv and json streaming sources ≡ batch windowed counts") {
    import org.apache.spark.sql.functions.col
    val batch = Tables.events(spark, d)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val want = EventStream.windowedCounts(batch)
      .orderBy("window_start", "event_type").collect().toSeq

    for (fmt <- Seq("csv", "json")) {
      val dir = s"/tmp/graft-test-warehouse/stream_src_$fmt"
      val w = batch.write.mode("overwrite")
      (if (fmt == "csv") w.option("header", "true") else w).format(fmt).save(dir)
      val stream =
        if (fmt == "csv") EventStream.readCsvStream(spark, dir, batch.schema)
        else EventStream.readJsonStream(spark, dir, batch.schema)
      val q = EventStream.windowedCounts(stream)
        .writeStream.outputMode("complete")
        .format("memory").queryName(s"${fmt}_win_out").start()
      try {
        q.processAllAvailable()
        val got = spark.table(s"${fmt}_win_out")
          .orderBy("window_start", "event_type").collect().toSeq
        assert(got === want, s"$fmt streaming source diverged from batch")
      } finally q.stop()
    }
  }

  test("streaming dedup drops within-watermark duplicate event ids") {
    implicit val sqlCtx = spark.sqlContext
    def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)

    val mem = MemoryStream[(Long, Timestamp, String)]
    val deduped = EventStream.dedupEventsStream(
      mem.toDF().toDF("event_id", "ts", "payload"), "30 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData((1L, ts(0), "a"), (1L, ts(1), "a-dup"), (2L, ts(2), "b"))
      q.processAllAvailable()
      mem.addData((1L, ts(3), "a-dup-2"), (3L, ts(4), "c"))
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(got === Seq(1L, 2L, 3L), "within-watermark duplicates must drop")
    } finally q.stop()
  }

  test("watermarked stream-stream interval join attributes purchases to clicks") {
    implicit val sqlCtx = spark.sqlContext
    def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)

    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, String)]
    val joined = EventStream.clickAttributionStream(
      purchases.toDF().toDF("user_id", "pts", "p_name"),
      clicks.toDF().toDF("c_user", "cts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      clicks.addData((1L, ts(0)), (2L, ts(1)))
      purchases.addData(
        (1L, ts(5), "in-range"),     // 5 min after user 1's click
        (1L, ts(20), "out-of-range"), // 20 min after -> no match
        (3L, ts(6), "no-click"))     // user with no clicks -> no match
      q.processAllAvailable()
      // advance both watermarks far enough to finalize results
      clicks.addData((9L, ts(120)))
      purchases.addData((9L, ts(121), "late-driver"))
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .select("p_name").as[String].collect().toSet
      assert(got.contains("in-range"))
      assert(!got.contains("out-of-range") && !got.contains("no-click"))
    } finally q.stop()

    // the same transform on batch inputs behaves as a plain interval join
    val bp = Seq((1L, ts(5), "in"), (1L, ts(20), "out"))
      .toDF("user_id", "pts", "p_name")
    val bc = Seq((1L, ts(0))).toDF("c_user", "cts")
    val batch = EventStream.clickAttributionStream(bp, bc)
      .select("p_name").as[String].collect().toSeq
    assert(batch === Seq("in"))
  }

  test("stream-stream SEMI join: one emission per matched purchase; state evicts") {
    implicit val sqlCtx = spark.sqlContext
    def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)
    def semi(p: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame) =
      p.withWatermark("pts", "10 minutes")
        .join(c.withWatermark("cts", "10 minutes"),
          expr("""user_id = c_user AND
                  cts >= pts - interval 10 minutes AND cts <= pts"""),
          "left_semi")
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, String)]
    val q = semi(purchases.toDF().toDF("user_id", "pts", "p_name"),
        clicks.toDF().toDF("c_user", "cts"))
      .writeStream.outputMode("append")
      .format("memory").queryName("semi_out").start()
    try {
      // user 1 has TWO in-range clicks: the semi join must emit the
      // purchase ONCE, not once per match (that's the inner join)
      clicks.addData((1L, ts(0)), (1L, ts(2)), (2L, ts(1)))
      purchases.addData(
        (1L, ts(5), "two-clicks"),
        (2L, ts(20), "out-of-range"),
        (3L, ts(6), "no-click"))
      q.processAllAvailable()
      clicks.addData((9L, ts(120)))
      purchases.addData((9L, ts(121), "wm-driver"))
      q.processAllAvailable()
      val got = spark.table("semi_out").select("p_name")
        .as[String].collect().toSeq
      assert(got.count(_ == "two-clicks") === 1, s"got $got")
      assert(!got.contains("out-of-range") && !got.contains("no-click"))
      // watermark-bounded buffers: the final watermark (~ts 111) must
      // have evicted every batch-1 row from the join state — of the 8
      // rows fed in, only the recent pair can remain buffered
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty)
      assert(state.map(_.numRowsTotal).sum <= 3,
        s"join state not evicted: ${state.map(_.numRowsTotal).mkString(",")}")
    } finally q.stop()

    // the same transform on batch inputs = a plain EXISTS interval filter
    val bp = Seq((1L, ts(5), "in"), (1L, ts(20), "out"))
      .toDF("user_id", "pts", "p_name")
    val bc = Seq((1L, ts(0))).toDF("c_user", "cts")
    assert(semi(bp, bc).select("p_name").as[String].collect().toSeq === Seq("in"))
  }

  test("stream-stream LEFT OUTER join: null rows emit exactly when the watermark proves no match") {
    implicit val sqlCtx = spark.sqlContext
    def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, String)]
    val q = purchases.toDF().toDF("user_id", "pts", "p_name")
      .withWatermark("pts", "10 minutes")
      .join(clicks.toDF().toDF("c_user", "cts")
          .withWatermark("cts", "10 minutes"),
        expr("""user_id = c_user AND
                cts >= pts - interval 10 minutes AND cts <= pts"""),
        "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("outer_out").start()
    try {
      clicks.addData((1L, ts(0)), (9L, ts(100)))
      purchases.addData(
        (1L, ts(5), "matched"),
        (3L, ts(6), "null-early"),
        (2L, ts(95), "null-mid"),
        (9L, ts(101), "matched-late"))
      q.processAllAvailable()
      // watermark after batch 1 = min(101, 100) − 10 = 90: "null-mid"
      // (95) must still be buffered, whatever else has emitted
      val after1 = spark.table("outer_out")
        .select("p_name", "c_user").as[(String, Option[Long])].collect()
      assert(!after1.exists(r => r._1 == "null-mid" && r._2.isEmpty))
      // advance both sides: wm = min(201, 200) − 10 = 190 > both
      // unmatched purchases → they flush with nulls; "tail-buffered"
      // (199 > wm, no matching click) must NOT emit — the honest
      // outer-join tail the driver-surface oracle models with its
      // watermark cutoff
      clicks.addData((8L, ts(200)))
      purchases.addData((8L, ts(201), "wm-driver"),
        (7L, ts(199), "tail-buffered"))
      q.processAllAvailable()
      val rows = spark.table("outer_out")
        .select("p_name", "c_user").as[(String, Option[Long])].collect()
      assert(rows.count(_ == (("matched", Some(1L)))) === 1)
      assert(rows.count(_ == (("matched-late", Some(9L)))) === 1)
      assert(rows.count(_ == (("wm-driver", Some(8L)))) === 1)
      assert(rows.count(_ == (("null-early", None))) === 1)
      assert(rows.count(_ == (("null-mid", None))) === 1)
      // matched rows never also emit a null-padded duplicate; the
      // inside-watermark unmatched tail stays buffered
      assert(!rows.contains(("matched", None)) &&
        !rows.contains(("matched-late", None)) &&
        !rows.exists(_._1 == "tail-buffered"))
    } finally q.stop()
  }

  test("FULL OUTER stream-stream join: asymmetric eviction cutoffs per side") {
    implicit val sqlCtx = spark.sqlContext
    def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]
    val q = purchases.toDF().toDF("p_user", "pts")
      .withWatermark("pts", "10 minutes")
      .join(clicks.toDF().toDF("c_user", "cts")
          .withWatermark("cts", "10 minutes"),
        expr("""p_user = c_user AND
                cts >= pts - interval 10 minutes AND cts <= pts"""),
        "full_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("fouter_out").start()
    try {
      clicks.addData((1L, ts(0)), (3L, ts(0)), (9L, ts(100)),
        (7L, ts(185))) // no purchase; inside its reach window at the end
      purchases.addData((1L, ts(5)), (2L, ts(6)), (9L, ts(101)),
        (6L, ts(195))) // no click; inside the left cutoff at the end
      q.processAllAvailable()
      // advance both sides → final wm = min(201, 200) − 10 = 190
      clicks.addData((8L, ts(200)))
      purchases.addData((8L, ts(201)))
      q.processAllAvailable()
      val rows = spark.table("fouter_out")
        .select("p_user", "c_user").as[(Option[Long], Option[Long])].collect()
      // matches emit once, both sides populated
      Seq(1L, 9L, 8L).foreach { u =>
        assert(rows.count(_ == ((Some(u), Some(u)))) === 1, s"user $u")
      }
      // LEFT null: unmatched purchase 2 (pts 6 < 190)
      assert(rows.count(_ == ((Some(2L), None))) === 1)
      // RIGHT null: unmatched click 3 (cts 0; 0 + 10 < 190)
      assert(rows.count(_ == ((None, Some(3L)))) === 1)
      // THE ASYMMETRY: click 7 (cts 185 < wm 190!) can still match a
      // purchase at pts ∈ [185, 195], so it must NOT have emitted;
      // purchase 6 (pts 195 > wm) is inside the left cutoff likewise
      assert(!rows.contains((None, Some(7L))), "click inside reach window leaked")
      assert(!rows.contains((Some(6L), None)), "purchase inside cutoff leaked")
    } finally q.stop()
  }

  test("streaming sessionization emits a session once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    def ts(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)

    val mem = MemoryStream[Ev]
    val sessions = EventStream.sessionizeStateful(
      mem.toDS().withWatermark("ts", "0 seconds"), closeTrailing = false)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // batch 1: user 7, two events 1 minute apart -> one open session
      mem.addData(Ev(7, ts(0), 1.0), Ev(7, ts(1), 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 0) // still open

      // batch 2: an event far past the gap advances the watermark beyond
      // end + 10 min AND starts a new session for the user
      mem.addData(Ev(7, ts(60), 5.0))
      q.processAllAvailable()
      // batch 3: push watermark further so the timeout for session 0 fires
      mem.addData(Ev(8, ts(120), 1.0))
      q.processAllAvailable()

      // session 0 closed by its timeout; session 1 (the lone ts(60) event)
      // also timed out once the watermark hit ts(120)
      val got = spark.table("sess_out").as[SessionOut].collect()
        .filter(_.user_id == 7).map(s => (s.session_idx, s.n_events, s.sum_value))
      assert(got.toSet === Set((0, 2, 3.0), (1, 1, 5.0)))
    } finally q.stop()
  }

  test("foreachBatch sink: batchId keys make replays idempotent") {
    // the production exactly-once pattern for sinks without
    // transactional commit: key writes by (batchId), so a micro-batch
    // replayed after a failure overwrites instead of double-counting
    implicit val sqlCtx = spark.sqlContext
    import java.util.concurrent.ConcurrentHashMap
    val store = new ConcurrentHashMap[Long, Map[String, Long]]()
    def commit(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      val counts = df.groupBy("event_type").count()
        .as[(String, Long)](org.apache.spark.sql.Encoders.product)
        .collect().toMap
      store.put(batchId, counts) // idempotent: same key overwrites
    }
    val mem = MemoryStream[(String, Double)]
    val q = mem.toDF().toDF("event_type", "value")
      .writeStream.foreachBatch(commit _).start()
    try {
      mem.addData(("click", 1.0), ("click", 2.0), ("view", 3.0))
      q.processAllAvailable()
      mem.addData(("view", 4.0))
      q.processAllAvailable()
      val firstTotal = store.values.stream.mapToLong(
        m => m.values.sum).sum
      assert(firstTotal === 4L)
      // simulate a replay of batch 0 (failure recovery re-delivers it):
      // the keyed put must leave totals unchanged
      commit(Seq(("click", 1.0), ("click", 2.0), ("view", 3.0))
        .toDF("event_type", "value"), 0L)
      val afterReplay = store.values.stream.mapToLong(
        m => m.values.sum).sum
      assert(afterReplay === firstTotal,
        "replayed micro-batch double-counted — sink not idempotent")
    } finally q.stop()
  }

  test("streaming cusum carries S across micro-batches and matches batch") {
    import graft.streaming.EventStream.{CusumEv, CusumOut}
    import graft.operators.Curation
    // split one user's time-ordered stream across TWO micro-batches in
    // the middle of an elevated run: the statistic S must persist in
    // keyed state so alarms continue seamlessly in batch 2
    val base = 1700000000000L
    def ev(id: Long, v: Double) =
      CusumEv(7L, id, new Timestamp(base + id * 1000), v)
    val all = Seq(ev(1, 300.0), ev(2, 250.0), ev(3, 10.0), ev(4, 400.0),
      ev(5, 20.0), ev(6, 350.0))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CusumEv]
    val q = EventStream.cusumStateful(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_out").start()
    try {
      mem.addData(all.take(3))
      q.processAllAvailable()
      mem.addData(all.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cusum_out").as[CusumOut].collect()
      .map(o => o.event_id -> o.cusum_scaled).toMap
    // independent sequential recompute over the UNSPLIT stream
    var s = 0L
    val expected = all.flatMap { e =>
      val d6 = math.floor(e.value * 1000000.0).toLong - Curation.CusumDriftScaled
      s = math.max(0L, s + d6)
      if (s > Curation.CusumThresholdScaled) Some(e.event_id -> s) else None
    }.toMap
    assert(got === expected)
    // the alarm set must span both micro-batches, or the split proved
    // nothing
    assert(expected.keySet.exists(_ <= 3) && expected.keySet.exists(_ > 3))
  }

  test("streaming ewma carries the tap ring across micro-batches") {
    import graft.streaming.EventStream.{EwmaEv, EwmaOut}
    import graft.operators.Curation.EwmaLags
    // 12 events for one user split mid-stream: the 7-slot cent ring
    // must persist so batch-2 heads smooth over batch-1 tails
    val all = (1 to 12).map(i => EwmaEv(3L, i.toLong, i * 1.11))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EwmaEv]
    val q = EventStream.ewmaStateful(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_out").start()
    try {
      mem.addData(all.take(5))
      q.processAllAvailable()
      mem.addData(all.drop(5))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ewma_out").as[EwmaOut].collect()
      .map(o => o.event_id -> ((o.wsum, o.wden))).toMap
    // independent recompute over the UNSPLIT stream
    var hist = Seq.empty[Long]
    val expected = all.map { e =>
      val cents = math.floor(e.value * 100.0 + 0.5).toLong
      val taps = (cents +: hist).take(EwmaLags)
      hist = taps.take(EwmaLags - 1)
      val ws = taps.zipWithIndex
        .map { case (c, k) => c * (1L << (EwmaLags - 1 - k)) }.sum
      val wd = taps.zipWithIndex
        .map { case (_, k) => 1L << (EwmaLags - 1 - k) }.sum
      e.event_id -> ((ws, wd))
    }.toMap
    assert(got === expected)
    // event 6 (the first of batch 2) must already see batch-1 taps
    assert(got(6L)._2 === (1L to 6L)
      .map(k => 1L << (EwmaLags - k).toInt).sum)
  }

  test("streaming anomaly carries exact running stats across batches") {
    import graft.streaming.EventStream.{AnomEv, AnomOut}
    // 35 quiet events (values 10.00 ± 0.02), then a spike, then quiet:
    // the spike (event 36) must alarm against predecessor stats; the
    // split lands right before it, so the stats crossed state. BigInt
    // sums are recomputed independently over the unsplit stream.
    val quiet = (1 to 40).map(i =>
      AnomEv("click", i.toLong, 10.0 + 0.02 * (i % 3 - 1)))
    val all = quiet.take(35) ++ Seq(AnomEv("click", 36L, 500.0)) ++
      quiet.drop(35).map(e => e.copy(event_id = e.event_id + 1))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[AnomEv]
    val q = EventStream.anomalyStateful(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    try {
      mem.addData(all.take(35))
      q.processAllAvailable()
      mem.addData(all.drop(35))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("anom_out").as[AnomOut].collect()
      .map(_.event_id).toSet
    var n = 0L; var s6 = BigInt(0); var q6 = BigInt(0)
    val expected = all.flatMap { e =>
      val v6 = BigInt(java.math.BigDecimal.valueOf(e.value)
        .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue())
      val f = n >= EventStream.AnomMinPriorN && {
        val dev = BigInt(n) * v6 - s6
        dev * dev > 9 * (BigInt(n) * q6 - s6 * s6)
      }
      n += 1; s6 += v6; q6 += v6 * v6
      if (f) Some(e.event_id) else None
    }.toSet
    assert(got === expected)
    assert(expected.contains(36L), "the spike must alarm")
    assert(!expected.exists(_ <= 35L), "quiet prefix must not alarm")
  }

  test("sessionQuantiles conserves sessions; quantile ordering holds") {
    val rows = EventStream.sessionQuantiles(spark, d)
      .as[(Long, String, Long, Double, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum === EventStream.sessionizeBatch(spark, d).count())
    rows.foreach { r =>
      assert(r._4 >= 0 && r._4 <= r._5, s"p50 > p95 on day ${r._1}")
      assert(r._6 >= 1.0, s"median events < 1 on day ${r._1}")
      assert(r._7 >= 1000000L, s"mean events < 1 on day ${r._1}")
    }
  }

  test("sessionStats conserves sessions, events, and durations") {
    val d = "/root/testdata/sf0.001"
    val sess = EventStream.sessionizeBatch(spark, d)
      .select($"n_events", ($"end_us" - $"start_us").as("dur"))
      .as[(Int, Long)].collect()
    val got = EventStream.sessionStats(spark, d)
      .as[(Int, Long, Long, Long)].collect()
    assert(got.map(_._2).sum === sess.length.toLong)
    assert(got.map(r => r._1 * r._2).sum === sess.map(_._1.toLong).sum)
    assert(got.map(_._3).sum === sess.map(_._2).sum)
    got.foreach { case (len, n, tot, avg) =>
      assert(avg === tot / n, s"len $len")
      if (len == 1) assert(tot === 0L, "bounces have zero duration")
    }
    assert(got.map(_._1).contains(1), "fixture should contain bounces")
  }

  test("streaming lateness carries the running max across batches") {
    import graft.streaming.EventStream.{LateEv, LateOut}
    // the running max set in batch 1 must still gate batch 2
    val evs = Seq(
      LateEv(5L, 1, 1000L), LateEv(5L, 2, 5000L), LateEv(5L, 3, 4000L),
      LateEv(5L, 4, 9000L), LateEv(5L, 5, 2000L), LateEv(5L, 6, 9500L))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[LateEv]
    val q = EventStream.latenessStateful(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      mem.addData(evs.take(3))
      q.processAllAvailable()
      mem.addData(evs.drop(3))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("late_out").as[LateOut].collect()
      .map(o => o.event_id -> o.late_us).toMap
    // sequential recompute over the unsplit stream
    var m = Long.MinValue
    val exp = evs.map { e =>
      val l = if (m == Long.MinValue) 0L else math.max(0L, m - e.ets)
      m = math.max(m, e.ets)
      e.event_id -> l
    }.toMap
    assert(got === exp)
    // event 3 (batch 1) lags in-batch max 5000; event 5 (batch 2) lags
    // the carried-forward max raised to 9000 by event 4
    assert(got(3L) === 1000L && got(5L) === 7000L)
  }

  test("streaming topk merges counts across batches, emits on timeout") {
    import graft.streaming.EventStream.{TopkEv, TopkOut}
    // one hour window split across two micro-batches; a third batch far
    // in the future advances the watermark past window end, firing the
    // event-time timeout that emits the leaderboard
    val h0 = 1700000000000L / 3600000L * 3600000L // aligned hour start
    def ev(offMin: Int, uid: Long) =
      TopkEv(new Timestamp(h0 + offMin * 60000L), uid)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TopkEv]
    val q = EventStream.topkStateful(
        mem.toDS().withWatermark("ts", "30 minutes"))
      .writeStream.outputMode("append")
      .format("memory").queryName("topk_out").start()
    try {
      mem.addData(Seq(ev(1, 1L), ev(2, 1L), ev(3, 2L)))
      q.processAllAvailable()
      mem.addData(Seq(ev(10, 1L), ev(11, 2L), ev(12, 3L)))
      q.processAllAvailable()
      // 3 hours later: watermark → h0+180−30 min, strictly past h0+60
      mem.addData(Seq(ev(180, 9L)))
      q.processAllAvailable()
      mem.addData(Seq(ev(181, 9L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("topk_out").as[TopkOut].collect()
      .filter(_.window_h === h0 / 3600000L)
    // counts merged across the split: user 1 ×3, user 2 ×2, user 3 ×1
    assert(got.map(o => (o.rank, o.user_id, o.n_events)).sorted.toSeq ===
      Seq((1, 1L, 3L), (2, 2L, 2L), (3, 3L, 1L)))
    assert(got.forall(_.n_users === 3L))
  }

  test("streaming throttle carries the day counter across micro-batches") {
    import graft.streaming.EventStream.{ThrottleEv, ThrottleOut}
    import graft.operators.Curation
    // one user, five events on day D (cap 3 → events 4, 5 rejected) and
    // two on day D+1 (counter must RESET → both admitted); the batch
    // split lands mid-day-D so the admission count crosses state
    val dayUs = 86400000000L
    val base = (20000L * dayUs) / 1000 // ms, midnight UTC of day 20000
    def ev(id: Long, offMs: Long) =
      ThrottleEv(9L, id, new Timestamp(base + offMs))
    val all = Seq(ev(1, 1000), ev(2, 2000), ev(3, 3000), ev(4, 4000),
      ev(5, 5000), ev(6, dayUs / 1000 + 1000), ev(7, dayUs / 1000 + 2000))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ThrottleEv]
    val q = EventStream.throttleStateful(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("throttle_out").start()
    try {
      mem.addData(all.take(2)) // day D events 1-2: under cap
      q.processAllAvailable()
      mem.addData(all.drop(2)) // 3 admitted, 4-5 rejected, day flips
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("throttle_out").as[ThrottleOut].collect()
      .map(_.event_id).toSet
    assert(Curation.ThrottleMaxPerDay === 3L, "spec assumes cap 3")
    assert(got === Set(4L, 5L))
  }

  test("per-row stream banding computes minhashBandsOn's exact band keys") {
    // incrementalDedupStreamVerified bands arrivals MAP-ONLY (array
    // higher-order functions over WordShingles) because a streaming
    // groupBy-per-doc signature would demand stateful aggregation. The
    // whole stream-vs-oracle equivalence rests on the per-row
    // formulation producing the IDENTICAL (doc, band, bkey) set as the
    // batch groupBy pipeline over the same distinct-shingle sets — pin
    // that on the full sf0.001 documents table.
    import graft.operators.Dedup
    import graft.operators.Dedup.MinHashParams
    import graft.functions.WordShingles
    val P = Dedup.P
    val docs = Tables.documents(spark, d)
    val batch = Dedup.minhashBandsOn(
      docs.select(col("doc_id"),
          explode(WordShingles(col("text"), 3)).as("s")).distinct())
      .as[(Long, Int, Long)].collect().toSet
    val sig = (0 until MinHashParams.K).map(i =>
      aggregate(col("hv"), lit(P), (acc, x) =>
        least(acc,
          (lit(MinHashParams.A(i)) * x + lit(MinHashParams.B(i))) % P))
        .as(s"mh$i"))
    val perRow = docs
      .select(col("doc_id"),
        array_distinct(WordShingles(col("text"), 3)).as("nsh"))
      .filter(size(col("nsh")) > 0)
      .withColumn("hv", transform(col("nsh"), x => Dedup.md5hash60(x) % P))
      .select(col("doc_id") +: sig: _*)
      .select(col("doc_id"),
        posexplode(array((0 until MinHashParams.Bands).map(b =>
          col(s"mh${2 * b}") * P + col(s"mh${2 * b + 1}")): _*))
          .as(Seq("band", "bkey")))
      .as[(Long, Int, Long)].collect().toSet
    assert(perRow.nonEmpty)
    assert(perRow === batch)
  }

  test("streaming band-geometry dial: fixture resolves to default; wide keys agree") {
    // the n-adaptive dial (r8 VERDICT item 8): fixture corpora must
    // resolve to the default (8, 2) — that is what keeps every committed
    // stream oracle byte-identical — and rows double at the documented
    // power-of-ten thresholds
    import graft.operators.Dedup
    import graft.operators.Dedup.MinHashParams
    import graft.functions.WordShingles
    assert(Dedup.scaledBandGeometry(3000L) === (8, 2))
    assert(Dedup.scaledBandGeometry(1000000L) === (8, 2))
    assert(Dedup.scaledBandGeometry(1000001L) === (4, 4))
    assert(Dedup.scaledBandGeometry(100000000L) === (4, 4))
    assert(Dedup.scaledBandGeometry(100000001L) === (2, 8))

    // wide-geometry key equality: at a forced (4, 4) the per-row stream
    // formulation must still compute minhashBandsGeomOn's exact keys
    // (the md5-packed wide-row path, not the legacy r=2 arithmetic)
    val P = Dedup.P
    val docs = Tables.documents(spark, d)
    val batch = Dedup.minhashBandsGeomOn(
      docs.select(col("doc_id"),
          explode(WordShingles(col("text"), 3)).as("s")).distinct(), 4, 4)
      .as[(Long, Int, Long)].collect().toSet
    val sig = (0 until MinHashParams.K).map(i =>
      aggregate(col("hv"), lit(P), (acc, x) =>
        least(acc,
          (lit(MinHashParams.A(i)) * x + lit(MinHashParams.B(i))) % P))
        .as(s"mh$i"))
    val perRow = docs
      .select(col("doc_id"),
        array_distinct(WordShingles(col("text"), 3)).as("nsh"))
      .filter(size(col("nsh")) > 0)
      .withColumn("hv", transform(col("nsh"), x => Dedup.md5hash60(x) % P))
      .select(col("doc_id") +: sig: _*)
      .select(col("doc_id"),
        posexplode(array(Dedup.bandKeyCols(4, 4, i => col(s"mh$i")): _*))
          .as(Seq("band", "bkey")))
      .as[(Long, Int, Long)].collect().toSet
    assert(perRow.nonEmpty)
    assert(perRow === batch)
  }

  test("media ingest dial: past MediaIngestWideMinImages the stream " +
      "runs the wide geometry and matches the lossless batch join") {
    import graft.operators.Multimodal
    // a corpus big enough to cross the dial (>10k even-id image docs):
    // the first ×32 scaling measurement of the un-dialed stream blew
    // up to 79.6M dropDuplicates state rows because the default
    // 4×8-bit bands have only 256 buckets per band — this pins that
    // the wide branch (60-sample sigs, 4×15-bit bands) engages AND
    // still equals the lossless parity join it bounds
    val dir = "/tmp/graft_media_dial_fixture"
    val n = 10500 // even-id images = doc_ids 0,6,12,... (parity+kind)
    val docs = spark.range(0, n * 6, 1)
      .select(col("id").as("doc_id"),
        // deterministic pseudo-random payloads; a planted twin pair:
        // arrival doc 3 copies corpus doc 6's bytes (hamming 0)
        when(col("id") === 3, concat(lit("twin-"), md5(lit(6L).cast("string"))))
          .otherwise(when(col("id") === 6,
            concat(lit("twin-"), md5(lit(6L).cast("string"))))
            .otherwise(md5(col("id").cast("string")))).as("text"),
        lit("en").as("lang"), lit("synth").as("source"),
        lit(32L).as("n_chars"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val nImages = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 2 === 0 && col("doc_id") % 3 === 0).count()
      assert(nImages > EventStream.MediaIngestWideMinImages,
        "fixture must cross the dial")
      val got = EventStream.mediaIngestStreamVerified(spark, dir)
        .as[(Long, Long, Int)].collect().toSet
      // lossless expected set: the SAME wide signatures in batch, plain
      // parity join, hamming <= PhashMaxHamming (banding is candidate
      // generation only — completeness at <= 3 is the pigeonhole bound)
      val sigs = graft.operators.Multimodal
        .phashSigs(spark, dir, Multimodal.PhashSamplesWide)
        .as[(Long, Long)].collect()
      val corpus = sigs.filter { case (id, _) => id % 2 == 0 && id % 3 == 0 }
      val arrivals = sigs.filter { case (id, _) => id % 2 == 1 && id % 3 == 0 }
      val expected = (for {
        (a, sa) <- arrivals.iterator
        (o, so) <- corpus.iterator
        h = java.lang.Long.bitCount(sa ^ so)
        if h <= Multimodal.PhashMaxHamming
      } yield (a, o, h)).toSet
      assert(got === expected)
      assert(got.contains((3L, 6L, 0)), "planted twin must surface")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
