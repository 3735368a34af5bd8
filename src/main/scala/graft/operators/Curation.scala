package graft.operators

import graft.GraftRefusal
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Training-data curation operators layered over the reference's counting
  * substrate: text normalization, corpus-LM fluency scoring, deterministic
  * stratified sampling, and a composed dedup→quality→split pipeline.
  *
  * Determinism discipline (every query has an exact DuckDB oracle):
  *  - the LM score is pure BIGINT arithmetic — per-bigram frequency is
  *    quantized to parts-per-billion with integer division before any
  *    aggregation, so summation order can't matter;
  *  - sampling buckets derive from md5 (bit-identical across engines);
  *  - normalization uses per-row regexp_replace (codegen'd, NOT a
  *    higher-order-function lambda — see the NGramArray hazard note).
  *
  * Scale notes: the bigram LM is bounded at 26² rows regardless of corpus
  * size, so scoring is a broadcast join — each document is scored in a
  * single scan with no shuffle beyond the per-doc aggregation.
  * Normalization and sampling are embarrassingly parallel projections. */
object Curation {

  /** Normalization chain: lowercase → strip non-[a-z0-9 ] → collapse
    * space runs → trim. Input text is deliberately dirtied first
    * (padding, uppercasing, punctuation) so the test corpus — which is
    * already clean — actually exercises every step; `roundtrip_ok`
    * asserts normalize(mess(text)) == text. */
  def normalize(s: SparkSession, d: String): DataFrame = {
    val messy = concat(lit("  "), upper(col("text")), lit(" !!! "))
    val norm = trim(regexp_replace(
      regexp_replace(lower(messy), "[^a-z0-9 ]", ""), " +", " "))
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), messy.as("messy"), norm.as("norm"))
      .select(
        col("doc_id"),
        length(col("messy")).as("messy_len"),
        length(col("norm")).as("norm_len"),
        (col("norm") === col("text")).as("roundtrip_ok"),
        substring(md5(col("norm").cast("binary")), 1, 16).as("norm_md5"))
      .orderBy("doc_id")
  }

  /** Corpus-bigram-LM fluency score: build the reference pipeline's
    * bigram table over the whole corpus, quantize each bigram's relative
    * frequency to integer parts-per-billion, then score every document by
    * the mean ppb of its own bigrams. A cheap "does this document look
    * like the corpus" signal (the integer-arithmetic analog of mean
    * log-likelihood under a unigram-of-bigrams model).
    *
    * The LM table is ≤ 26² rows no matter the corpus size → broadcast. */
  def lmScore(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = TextPipeline.bigramCounts(docs) // bigram, cnt (≤ 676 rows)
    val total = counts.agg(sum("cnt").as("_total"))
    val lm = counts.crossJoin(broadcast(total))
      .select(col("bigram"), expr("cnt * 1000000000L div _total").as("ppb"))
    val grams = TextPipeline.mainFilter(
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w")))
      .select(col("doc_id"),
        explode(TextPipeline.ngramsCol(col("w"), 2)).as("bigram"))
    grams.join(broadcast(lm), "bigram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("ppb").as("sum_ppb"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_ppb"),
        expr("sum_ppb div n_bigrams").as("avg_ppb"))
      .orderBy("doc_id")
  }

  /** md5-derived percent bucket in [0, 100) for any key column —
    * deterministic, engine-portable (`('0x'||substr(md5(k),1,8))::BIGINT
    * % 100` in DuckDB). */
  def pctBucket(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100

  /** Per-stratum sampling rates (percent) for [[stratifiedSample]]. */
  val SampleRates: Seq[(String, Int)] = Seq(
    "click" -> 5, "error" -> 20, "purchase" -> 50, "signup" -> 50,
    "view" -> 2)

  /** Deterministic stratified sampling over events: each event_type keeps
    * its own md5-bucket fraction. Reproducible across runs/engines (no
    * RNG), embarrassingly parallel (no shuffle before the output sort). */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val rate = SampleRates.foldRight(lit(0): Column) {
      case ((t, r), elseCol) =>
        when(col("event_type") === t, lit(r)).otherwise(elseCol)
    }
    Tables.events(s, d)
      .withColumn("bucket", pctBucket(col("event_id")))
      .filter(col("bucket") < rate)
      .select("event_id", "event_type", "bucket")
      .orderBy("event_id")
  }

  val BottomK = 200

  /** Deterministic uniform sample via bottom-k hashing: the [[BottomK]]
    * events with the smallest md5(event_id) — a reproducible "random"
    * sample with an exact size, no RNG state. Plans as
    * TakeOrderedAndProject (per-partition heap of k, driver merges k
    * rows) — never a global sort, so it scales to any input size. */
  def bottomKSample(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        substring(md5(col("event_id").cast("string").cast("binary")), 1, 16)
          .as("h"))
      .orderBy("h", "event_id")
      .limit(BottomK)
      .orderBy("event_id")

  /** STATISTICAL OUTLIER detection — events whose value sits more than
    * 3 population standard deviations from their event-type mean: the
    * classic numeric-column cleaning pass before training-data use.
    *
    * The whole test runs in EXACT integer arithmetic: values scale to
    * millionths through the proven DECIMAL(18,6) cast, and
    * |v − μ| > 3σ is cross-multiplied into
    * (n·v₆ − Σv₆)² > 9·(n·Σv₆² − (Σv₆)²) — no division, no square
    * root, no float accumulation, so both engines make bit-identical
    * keep/flag decisions (Spark carries DECIMAL(38,0) ≈ int128, the
    * oracle HUGEINT; magnitudes stay under 10³⁴ even at 10⁶ rows per
    * group). Per-type stats are one partial+final aggregation; the
    * 5-row stats frame broadcasts back — the event table itself never
    * shuffles. */
  /** [[outliers]] refusal bound on max-per-group n·max|v₆|: the largest
    * product the cross-multiplied test forms is 9·(n·Σv₆² − (Σv₆)²) ≤
    * 9·(n·max|v₆|)², so keeping n·max|v₆| ≤ 10¹⁸ bounds every
    * intermediate at 9·10³⁶ < 10³⁸ — inside DECIMAL(38,0), where
    * non-ANSI Spark would otherwise return NULL on overflow and
    * silently DROP rows from the filter while the DuckDB HUGEINT side
    * errors (ADVICE r6). Refuse-rather-than-detonate, like
    * [[graft.operators.Dedup.MaxNaiveShingleDf]]; the escape at real
    * scale is coarser value quantization (fewer fractional digits) or
    * per-group Welford-style DOUBLE stats with an epsilon band instead
    * of exact integer flags. */
  val MaxOutlierGroupScale = 1e18

  def outliers(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"),
        (col("value").cast(DecimalType(18, 6)) * lit(1000000))
          .cast(DecimalType(38, 0)).as("v6"))
    // stats: tiny (#event-type rows); localCheckpoint so the eager
    // overflow guard below and the broadcast join share one events pass
    val stats = ev.groupBy("event_type").agg(
      count(lit(1)).cast(DecimalType(38, 0)).as("n"),
      sum(col("v6")).cast(DecimalType(38, 0)).as("s6"),
      sum(col("v6") * col("v6")).cast(DecimalType(38, 0)).as("q6"),
      max(abs(col("v6"))).as("m6"))
      .localCheckpoint()
    // guard in DOUBLE: 16 significant digits against a 10^18 bound with
    // 10x headroom in the 9·x² analysis — precision loss is irrelevant
    val worstRow = stats.agg(
      max(col("n").cast("double") * col("m6").cast("double"))).head()
    if (!worstRow.isNullAt(0))
      GraftRefusal.check(worstRow.getDouble(0) <= MaxOutlierGroupScale,
        f"outliers refused: max per-group n*max|v6| = ${worstRow.getDouble(0)}%.3g " +
          f"exceeds $MaxOutlierGroupScale%.1g - the DECIMAL(38,0) " +
          "cross-multiplied test could overflow to NULL and drop rows; " +
          "quantize values more coarsely or use double stats with an " +
          "epsilon band")
    val dev = col("n") * col("v6") - col("s6")
    ev.join(broadcast(stats.drop("m6")), "event_type")
      .filter(dev * dev >
        lit(9) * (col("n") * col("q6") - col("s6") * col("s6")))
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** Sample size for [[prioritySample]]. */
  val PriorityK = 100

  /** WEIGHTED sampling without replacement via PRIORITY SAMPLING
    * (Duffield, Lund & Thorup, JACM '07): each event draws a
    * deterministic md5-uniform u ∈ (0, 1] and gets priority
    * q = w / u; the K largest priorities are the sample, and with
    * τ = the (K+1)-th priority, est_weight = max(w, τ) is the unbiased
    * subset-sum estimator (Σ est_weight over the sample estimates
    * Σ w over the population within 1/(K−1) relative variance). This
    * is the principled "keep high-value rows but stay unbiased" dial a
    * training-data pipeline uses to downsample by quality score.
    *
    * Deterministic (no RNG state): u = (md5₄₈(event_id) + 1) / 2⁴⁸, so
    * runs and engines agree bit-for-bit — the priority arithmetic is
    * written in the exact operation order the oracle uses (one IEEE
    * multiply then one divide), keeping doubles identical.
    *
    * Scale: both top-(K+1) selections plan as TakeOrderedAndProject
    * (per-partition bounded heap + driver merge of K+1 rows — never a
    * global sort); τ is an aggregate of that K+1-row frame broadcast
    * back. No window, no shuffle of the input. */
  def prioritySample(s: SparkSession, d: String): DataFrame = {
    val hv = conv(substring(md5(col("event_id").cast("string")
      .cast("binary")), 1, 12), 16, 10).cast("long")
    val pr = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"),
        (col("value") * lit(281474976710656.0) / (hv + lit(1L)))
          .as("priority"))
    // K+1 rows: tiny — localCheckpoint so tau and the K-row re-sort
    // share one TakeOrdered pass over the input instead of scanning
    // events twice, with nothing left in the SQL cache afterwards
    val top = pr.orderBy(desc("priority"), asc("event_id"))
      .limit(PriorityK + 1)
      .localCheckpoint()
    val tau = top.agg(min("priority").as("tau"))
    top.orderBy(desc("priority"), asc("event_id")).limit(PriorityK)
      .crossJoin(broadcast(tau))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("priority"), 6).as("priority"),
        round(greatest(col("value"), col("tau")), 6).as("est_weight"))
      .orderBy("event_id")
  }

  /** MARKOV TRANSITION MATRIX of the event stream — session-flow
    * analytics: per user (ordered by ts, event_id), count each
    * consecutive (from → to) event-type pair and emit the empirical
    * next-step distribution as integer parts-per-billion ((n·10⁹) div
    * row-total — the [[lmScore]] quantization, so probabilities are
    * division-order-free and bit-identical cross-engine).
    *
    * Scale: one lead() window PARTITIONED BY user (per-key state after
    * a single hash shuffle), then a #types²-sized partial+final count
    * and a #types-row totals join — the output is the transition
    * matrix, constant-sized regardless of corpus. */
  def transitions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
    val cnt = pairs
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("from_type").agg(sum("n").as("tot"))
    cnt.join(tot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000000) div tot").as("ppb"))
      .orderBy("from_type", "to_type")
  }

  /** Guard for [[abTest]]'s DECIMAL(38,0)/HUGEINT z² cross-product:
    * 625·diff²·N ≤ 39·N⁵ must stay under 10³⁸, so N (total users in
    * the experiment) is refused past 2×10⁷ — at that point scale the
    * counts down by a common factor or test on a user sample. */
  val MaxAbTestUsers = 20000000L

  /** A/B TEST significance — the two-proportion pooled z-test every
    * experimentation pipeline runs, in EXACT integer arithmetic: users
    * split 50/50 by the deterministic md5 bucket ([[pctBucket]] < 50),
    * "conversion" = the user emitted ≥ 1 event of each type, and the
    * z² > 1.96² decision is cross-multiplied into one integer
    * comparison — 625·(k_a·n_b − k_b·n_a)²·N > 2401·n_a·n_b·K·(N−K)
    * (1.96² = 2401/625 exactly) — so both engines flag the identical
    * types with no division, no sqrt, no float (the [[outliers]]
    * discipline applied to inference).
    *
    * Scale: the user frame collapses to one row per user immediately
    * (distinct), conversions to one row per (user, type); counts are
    * partial+final aggs; the 1-row totals attach by broadcast. The
    * DECIMAL(38,0) envelope is enforced by an eager guard
    * ([[MaxAbTestUsers]]) rather than silently nulling on overflow. */
  def abTest(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d).select(col("user_id")).distinct()
      .withColumn("va", pctBucket(col("user_id")) < 50)
      .localCheckpoint() // totals + per-type conversions share one build
    val totals = users.agg(
      sum(when(col("va"), 1).otherwise(0)).cast(DecimalType(38, 0)).as("n_a"),
      sum(when(!col("va"), 1).otherwise(0)).cast(DecimalType(38, 0)).as("n_b"))
    val nRow = totals.head()
    val nTotal = nRow.getDecimal(0).longValueExact() +
      nRow.getDecimal(1).longValueExact()
    GraftRefusal.check(nTotal <= MaxAbTestUsers,
      s"abTest refused: $nTotal users exceed $MaxAbTestUsers - the " +
        "cross-multiplied z-squared comparison could overflow " +
        "DECIMAL(38,0); scale counts down by a common factor or sample " +
        "users first")
    val conv = Tables.events(s, d).select("user_id", "event_type").distinct()
      .join(users, "user_id")
      .groupBy("event_type").agg(
        sum(when(col("va"), 1).otherwise(0)).cast(DecimalType(38, 0))
          .as("k_a"),
        sum(when(!col("va"), 1).otherwise(0)).cast(DecimalType(38, 0))
          .as("k_b"))
    val diff = col("k_a") * col("n_b") - col("k_b") * col("n_a")
    val bigN = col("n_a") + col("n_b")
    val bigK = col("k_a") + col("k_b")
    conv.crossJoin(broadcast(totals))
      .select(col("event_type"),
        col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        col("k_a").cast("long").as("k_a"),
        col("k_b").cast("long").as("k_b"),
        round(col("k_a").cast("double") / col("n_a").cast("double"), 6)
          .as("conv_a"),
        round(col("k_b").cast("double") / col("n_b").cast("double"), 6)
          .as("conv_b"),
        (lit(625) * diff * diff * bigN >
          lit(2401) * col("n_a") * col("n_b") * bigK * (bigN - bigK))
          .as("significant"))
      .orderBy("event_type")
  }

  /** Histogram-sketch range for [[outliersMad]]'s medians: value ∈
    * (0, 490] → [0, 512] over 2048 bins, 0.25-wide. Shared with the
    * generated oracle. */
  val MadHistLo = 0.0
  val MadHistHi = 512.0
  val MadHistBins = 2048
  /** Flag when |value − med| exceeds this many MADs (≈ 4σ-equivalent
    * under normality via the 1.4826 consistency factor; the driver
    * fixture's value tail is heavy, so 6 keeps flags selective). */
  val MadCut = 6.0

  /** ROBUST outlier detection via MAD (median absolute deviation) —
    * the breakdown-resistant twin of [[outliers]]' 3σ test: mean and
    * σ are themselves dragged by the outliers they hunt (masking),
    * while the median shrugs off up to 50% contamination. Flag events
    * with |value − med| > [[MadCut]] · MAD per event type.
    *
    * Both medians come from the deterministic mergeable histogram
    * sketch ([[graft.functions.HistQuantileAgg]] — merge-order
    * independent, so partitioning can't shift an estimate), rounded to
    * 9 dp; the deviation test is then one IEEE subtract/multiply/compare
    * written identically in both engines. Two aggregate passes + two
    * #type-row broadcasts back — events never shuffle.
    *
    * Scale: each pass is a partial+final agg by event_type over a
    * fixed 2048-bin buffer; the probe side is map-only. Same shape as
    * [[outliers]], one extra pass for the deviation median. */
  def outliersMad(s: SparkSession, d: String): DataFrame = {
    import graft.functions.HistQuantileAgg
    def hq(x: Column) = round(
      HistQuantileAgg(x, MadHistLo, MadHistHi, MadHistBins, 0.5), 9)
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
    val med = ev.groupBy("event_type").agg(hq(col("value")).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type").agg(hq(col("adev")).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("adev") > lit(MadCut) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"))
      .orderBy("event_id")
  }

  /** OUTLIER-DETECTOR AGREEMENT — the [[Dedup.modalityCheck]] move
    * applied to anomaly detection: per event type, the 2×2 confusion
    * between the parametric 3σ detector ([[outliers]]) and the robust
    * MAD detector ([[outliersMad]]), with their flagged-set Jaccard in
    * exact integer ppm (NULL when neither flags — both engines via the
    * zero guard). Disagreement is the signal: 3σ-only flags suggest the
    * variance is inflated by the outliers themselves (the masking
    * effect MAD resists); MAD-only flags suggest a heavy-tailed type
    * where 3σ is too loose. Composes two independently oracle-verified
    * detectors.
    *
    * Scale: two flagged-id frames (small) left-joined onto events, one
    * type-keyed agg — linear, broadcast-friendly. */
  def outlierAgreement(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_id"), col("event_type"))
    val sig = outliers(s, d).select(col("event_id"))
      .withColumn("f_sigma", lit(true))
    val mad = outliersMad(s, d).select(col("event_id"))
      .withColumn("f_mad", lit(true))
    ev.join(sig, Seq("event_id"), "left")
      .join(mad, Seq("event_id"), "left")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("f_sigma"), 1)).as("n_sigma"),
        count(when(col("f_mad"), 1)).as("n_mad"),
        count(when(col("f_sigma") && col("f_mad"), 1)).as("n_both"),
        count(when(coalesce(col("f_sigma"), lit(false)) ||
          coalesce(col("f_mad"), lit(false)), 1)).as("n_either"))
      .select(col("event_type"), col("n_events"), col("n_sigma"),
        col("n_mad"), col("n_both"), col("n_either"),
        when(col("n_either") === 0, lit(null).cast("long"))
          .otherwise(expr("n_both * 1000000 div n_either"))
          .as("jaccard_ppm"))
      .orderBy("event_type")
  }

  /** CUSUM drift term, scaled ×10⁶: the "acceptable mean" k. Values
    * average ≈ 50, so k = 80 keeps the statistic near zero until a
    * genuinely elevated run arrives. */
  val CusumDriftScaled = 80000000L
  /** CUSUM alarm threshold h (×10⁶): flag when S exceeds 200. */
  val CusumThresholdScaled = 200000000L

  /** One-sided CUSUM changepoint detection per user (Page 1954) — the
    * classic "has this metric drifted upward" sequential test: S_i =
    * max(0, S_{i−1} + x_i − k), alarm while S_i > h. The recurrence
    * looks inherently sequential, but unrolls to prefix sums:
    * S_i = P_i − min(0, min_{j≤i} P_j) with P the running sum of
    * (x − k) — two stacked running windows BOTH engines support, so the
    * oracle is plain window SQL (no recursion). Values are floor-scaled
    * to ×10⁶ BIGINTs first: window sums are exact integers, flags
    * bit-identical cross-engine.
    *
    * Scale: both windows PARTITION BY user_id — per-key state,
    * embarrassingly parallel after one hash shuffle; nothing global.
    * The same shape as [[Relational.trailingWindow]]'s RANGE frames. */
  def cusum(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        (floor(col("value") * lit(1000000.0)).cast("long")
          - lit(CusumDriftScaled)).as("d"))
    e.withColumn("p", sum("d").over(w))
      .withColumn("cusum_scaled",
        col("p") - least(min("p").over(w), lit(0L)))
      .filter(col("cusum_scaled") > CusumThresholdScaled)
      .select(col("user_id"), col("event_id"), col("cusum_scaled"),
        round(col("cusum_scaled") / lit(1000000.0), 6).as("cusum"))
      .orderBy("user_id", "event_id")
  }

  /** Result width of [[pathTrigrams]] — top paths by frequency. */
  val PathTrigramTopN = 25

  /** TOP SEQUENTIAL 3-STEP PATHS through the event stream — the
    * length-3 extension of [[transitions]]' Markov matrix: per user
    * (ordered by ts, event_id), every three CONSECUTIVE event types
    * form a path; the [[PathTrigramTopN]] most frequent paths with
    * counts are the classic "common user journeys" mining shape
    * (second-order structure a first-order transition matrix cannot
    * see — e.g. whether view→click is followed by purchase or bounce).
    *
    * Scale: one lead() window PARTITIONED BY user (per-key state after
    * a single hash shuffle — never a global sort), a #types³-bounded
    * partial+final count, and the top-N plans as TakeOrderedAndProject
    * (per-partition bounded heaps, no full sort). Total tie-break
    * (n DESC, then the three steps) keeps the LIMIT boundary
    * deterministic cross-engine. */
  def pathTrigrams(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
        col("t3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("step1"), asc("step2"), asc("step3"))
      .limit(PathTrigramTopN)
  }

  /** INTER-ARRIVAL-TIME histogram — the latency-distribution profile of
    * the event stream on LOG₂ buckets: per user, the gap to the
    * previous event (ts, event_id order), bucketed by
    * `floor(log₂(gap_µs + 1))` computed EXACTLY as
    * `length(bin(gap + 1)) − 1` (binary-string length — pure integer,
    * no float log, bit-identical cross-engine). Powers-of-two buckets
    * are the standard latency-histogram shape (HdrHistogram-style):
    * they resolve both the millisecond burst end and the multi-day
    * idle tail in one ~40-row result. Feeds session-gap tuning
    * ([[graft.streaming.EventStream.SessionGapMinutes]] should sit in
    * the histogram's valley) and bot detection (a spike at tiny gaps).
    *
    * Scale: one lag() window partitioned by user (single hash shuffle,
    * per-key state), then a ≤64-bucket partial+final count — output is
    * constant-sized regardless of corpus. */
  def interarrival(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .withColumn("prev", lag("us", 1).over(w))
      .filter(col("prev").isNotNull)
      .select((length(bin(col("us") - col("prev") + 1)) - 1)
        .as("log2_bucket"))
      .groupBy("log2_bucket").agg(count(lit(1)).as("n"))
      .select(col("log2_bucket"),
        expr("shiftleft(cast(1 as bigint), log2_bucket) - 1")
          .as("gap_lo_us"), col("n"))
      .orderBy("log2_bucket")
  }

  /** 1-in-N salting rate for [[lateness]]' planted late arrivals. */
  val LatenessSaltMod = 20L
  /** Max planted delay, µs (30 minutes — the suite's watermark). */
  val LatenessMaxDelayUs = 1800000000L
  /** Coverage target for the recommended watermark delay (99.9%). */
  val LatenessCoverPpm = 999000L

  /** EVENT-LATENESS histogram + WATERMARK PLANNER — the measurement
    * that justifies a watermark delay instead of guessing it: per user
    * stream, an event's lateness is how far it arrives behind the
    * running max event time of its predecessors (arrival = event_id
    * order — exactly the quantity a Spark watermark must cover for the
    * event not to be dropped). Lateness is bucketed on exact log₂ µs
    * buckets ([[interarrival]]'s `length(bin(x)) − 1` rule; bucket −1 =
    * in-order), with cumulative coverage in integer ppm and a
    * `recommended` flag on the FIRST bucket reaching
    * [[LatenessCoverPpm]] — "a watermark of 2^(b+1) µs keeps ≥ 99.9% of
    * events" read directly off the row.
    *
    * The driver fixture arrives perfectly ordered (0 late events), so —
    * the [[normalize]]/[[redactPii]] dirty-first pattern — a
    * deterministic 1-in-[[LatenessSaltMod]] md5 subset is SALTED with
    * an md5-derived delay < [[LatenessMaxDelayUs]] before measurement;
    * the operator must then recover that planted lateness distribution
    * exactly (both engines salt identically).
    *
    * Scale: one running-max window PARTITIONED BY user (keyed, no
    * funnel), a ≤64-bucket count, and the cumulative step is a tiny
    * bucket×bucket triangle join — never a global window. The grand
    * total rides a 1-row broadcast. */
  def lateness(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    latenessHistogramOn(saltedEventTimes(Tables.events(s, d))
      .withColumn("runmax", max("ets").over(w))
      .select(greatest(lit(0L),
        coalesce(col("runmax") - col("ets"), lit(0L))).as("late_us")))
  }

  /** The salted (user_id, event_id, ets) frame [[lateness]] and its
    * streaming twin share — the dirty-first disorder plant. */
  private[graft] def saltedEventTimes(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .select(col("user_id"), col("event_id"),
        (col("us") - when(
          Dedup.md5hash60(concat(lit("late_"), col("event_id").cast("string")))
            % LatenessSaltMod === 0,
          Dedup.md5hash60(concat(lit("lat2_"), col("event_id").cast("string")))
            % LatenessMaxDelayUs).otherwise(lit(0L))).as("ets"))

  /** The histogram/planner tail shared by batch and streaming lateness:
    * a (late_us) frame → log2 buckets, cumulative ppm (triangle join,
    * never an unpartitioned window), and the coverage recommendation. */
  private[graft] def latenessHistogramOn(late: DataFrame): DataFrame = {
    val hist = late
      .select(when(col("late_us") === 0, lit(-1))
        .otherwise(length(bin(col("late_us"))) - 1).as("b"))
      .groupBy("b").agg(count(lit(1)).as("n"))
    val tot = hist.agg(sum("n").as("tot"))
    hist.select(col("b"), col("n"))
      .join(hist.select(col("b").as("b2"), col("n").as("n2")),
        col("b2") <= col("b"))
      .groupBy("b", "n").agg(sum("n2").as("cum"))
      .crossJoin(broadcast(tot))
      .select(col("b").as("log2_bucket"),
        when(col("b") === -1, lit(0L))
          .otherwise(expr("shiftleft(cast(1 as bigint), b)")).as("late_lo_us"),
        col("n"),
        expr("cum * 1000000 div tot").as("cum_ppm"),
        (expr("cum * 1000000 div tot") >= LatenessCoverPpm &&
          expr("(cum - n) * 1000000 div tot") < LatenessCoverPpm)
          .as("recommended"))
      .orderBy("log2_bucket")
  }

  /** DuckDB twin of [[lateness]] — identical salt, running max,
    * buckets, triangle-join cumulative and ppm arithmetic. */
  private[graft] def latenessOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |    epoch_us(ts) - CASE WHEN
       |      ('0x' || substr(md5('late_' || event_id), 1, 15))::BIGINT
       |        % $LatenessSaltMod = 0
       |      THEN ('0x' || substr(md5('lat2_' || event_id), 1, 15))::BIGINT
       |        % $LatenessMaxDelayUs
       |      ELSE 0 END AS ets
       |  FROM events
       |),
       |lat AS (
       |  SELECT greatest(0, COALESCE(max(ets) OVER (PARTITION BY user_id
       |    ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |    - ets, 0)) AS late_us
       |  FROM ev
       |),
       |hist AS (
       |  SELECT CASE WHEN late_us = 0 THEN -1
       |    ELSE CAST(length(bin(late_us)) - 1 AS INTEGER) END AS b,
       |    count(*) AS n
       |  FROM lat GROUP BY 1
       |),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM hist),
       |cum AS (
       |  SELECT a.b, a.n, CAST(sum(c.n) AS BIGINT) AS cum
       |  FROM hist a JOIN hist c ON c.b <= a.b
       |  GROUP BY a.b, a.n
       |)
       |SELECT cum.b AS log2_bucket,
       |  CASE WHEN cum.b = -1 THEN 0 ELSE (1::BIGINT << cum.b) END
       |    AS late_lo_us,
       |  cum.n, (cum.cum * 1000000) // tot.tot AS cum_ppm,
       |  ((cum.cum * 1000000) // tot.tot >= $LatenessCoverPpm AND
       |   ((cum.cum - cum.n) * 1000000) // tot.tot < $LatenessCoverPpm)
       |    AS recommended
       |FROM cum, tot
       |ORDER BY log2_bucket""".stripMargin

  /** STREAMING STATE-CAPACITY audit — the sizing table a platform owner
    * computes from batch history BEFORE deploying the streaming suite:
    * for each stateful-operator family, the TOTAL distinct state keys
    * the store will cycle through on this corpus and the PEAK
    * concurrent load (busiest window / trailing horizon). Peaks are
    * EXACT trailing-window counts via the bucketed band-join (each
    * event joins its own and the previous bucket — the
    * [[graft.operators.Relational.rangeJoin]] pattern, never an
    * event×event scan):
    *
    *  - `windowed_agg`: (hour × type) keys; peak = busiest hour's types
    *  - `distinct_users`: (hour × user) keys; peak = busiest hour's users
    *  - `sessionize`: one open session per user — keys = peak = #users
    *  - `stream_dedup`: event-id keys; peak = events in the busiest
    *    trailing 30-min watermark horizon
    *  - `interval_join`: buffered click rows; peak = clicks in the
    *    busiest trailing 10-min join range
    *
    * Scale: hour/bucket aggregates are dimension-sized. The trailing
    * peaks are EXACT via the 2-bucket band join, whose fan-out is
    * occupancy² per bucket — quadratic in the EVENT RATE, so (the
    * [[graft.operators.Dedup.MaxNaiveShingleDf]] convention) the
    * operator refuses when any horizon bucket holds more than
    * [[MaxPeakBucketOccupancy]] events rather than detonating; at
    * higher rates run the audit on a time-slice, or replace the exact
    * peak with the sorted-sweep formulation (sort by time, concurrency
    * = rank(t) − rank(first event > t − h) — one total sort, no pair
    * join). */
  /** Hot-bucket refusal bound for [[stateAudit]]'s exact peaks: the
    * band join emits occupancy² rows per bucket. 20k² = 4·10⁸ worst
    * case — the ceiling of tolerable; beyond it, slice or sweep. */
  val MaxPeakBucketOccupancy = 20000L

  def stateAudit(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .localCheckpoint() // five consumers
    // `frame` carries (event_id, us): the per-event candidate count is
    // keyed on EVENT IDENTITY, not raw `us` — n co-timestamped events
    // grouped by `us` alone would merge into one group counting n× the
    // true trailing-window occupancy, silently inflating peak_keys
    // relative to its documented meaning (ADVICE r7)
    def trailingPeak(frame: DataFrame, horizonUs: Long): DataFrame = {
      val b = frame.select(col("event_id"), col("us"),
        expr(s"us div $horizonUs").as("bucket"))
      val occRow = b.groupBy("bucket").agg(count(lit(1)).as("n"))
        .agg(max("n")).head()
      val occ = if (occRow.isNullAt(0)) 0L else occRow.getLong(0)
      GraftRefusal.check(occ <= MaxPeakBucketOccupancy,
        s"stateAudit refused: a $horizonUs-us bucket holds $occ events " +
          s"(> $MaxPeakBucketOccupancy) - the exact-peak band join is " +
          "occupancy^2; audit a time-slice, or use the sorted-sweep " +
          "formulation (rank(t) - rank(first event > t - h))")
      // events in (t − horizon, t]: candidates from bucket and bucket−1
      b.select(col("event_id"), col("us"),
          explode(array(col("bucket") - 1, col("bucket"))).as("cb"))
        .join(b.select(col("us").as("c_us"),
          col("bucket").as("cb")), Seq("cb"))
        .filter(col("c_us") > col("us") - horizonUs && col("c_us") <= col("us"))
        .groupBy("event_id").agg(count(lit(1)).as("n"))
        .agg(max("n").as("peak"))
    }
    val winAgg = ev
      .select(expr("us div 3600000000").as("h"), col("event_type")).distinct()
    val winRow = winAgg.agg(count(lit(1)).as("total_keys"))
      .crossJoin(winAgg.groupBy("h").agg(count(lit(1)).as("n"))
        .agg(max("n").as("peak_keys")))
      .select(lit("windowed_agg").as("operator"), col("total_keys"),
        col("peak_keys"))
    val du = ev.select(expr("us div 3600000000").as("h"), col("user_id"))
      .distinct()
    val duRow = du.agg(count(lit(1)).as("total_keys"))
      .crossJoin(du.groupBy("h").agg(count(lit(1)).as("n"))
        .agg(max("n").as("peak_keys")))
      .select(lit("distinct_users").as("operator"), col("total_keys"),
        col("peak_keys"))
    val users = ev.select("user_id").distinct()
      .agg(count(lit(1)).as("total_keys"))
    val sessRow = users
      .select(lit("sessionize").as("operator"), col("total_keys"),
        col("total_keys").as("peak_keys"))
    val dedupRow = ev.agg(count(lit(1)).as("total_keys"))
      .crossJoin(trailingPeak(ev.select("event_id", "us"), 1800000000L)
        .select(col("peak").as("peak_keys")))
      .select(lit("stream_dedup").as("operator"), col("total_keys"),
        col("peak_keys"))
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "us")
    val joinRow = clicks.agg(count(lit(1)).as("total_keys"))
      .crossJoin(trailingPeak(clicks, 600000000L)
        .select(col("peak").as("peak_keys")))
      .select(lit("interval_join").as("operator"), col("total_keys"),
        col("peak_keys"))
    winRow.union(duRow).union(sessRow).union(dedupRow).union(joinRow)
      .orderBy("operator")
  }

  /** DuckDB twin of [[stateAudit]] — identical buckets and peaks. */
  private[graft] def stateAuditOracle: String = {
    // keyed on event_id, not us — see trailingPeak (ADVICE r7)
    def peak(src: String, horizon: Long): String =
      s"""SELECT max(n) FROM (
         |  SELECT a.event_id, count(*) AS n
         |  FROM (SELECT event_id, us,
         |               unnest([us // $horizon - 1, us // $horizon]) AS cb
         |        FROM $src) a
         |  JOIN (SELECT us AS c_us, us // $horizon AS cb FROM $src) c
         |    USING (cb)
         |  WHERE c.c_us > a.us - $horizon AND c.c_us <= a.us
         |  GROUP BY a.event_id)""".stripMargin
    s"""WITH ev AS MATERIALIZED (
       |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
       |  FROM events
       |),
       |clicks AS MATERIALIZED (
       |  SELECT event_id, us FROM ev WHERE event_type = 'click'),
       |wa AS (SELECT DISTINCT us // 3600000000 AS h, event_type FROM ev),
       |du AS (SELECT DISTINCT us // 3600000000 AS h, user_id FROM ev)
       |SELECT * FROM (
       |  SELECT 'windowed_agg' AS operator,
       |    (SELECT count(*) FROM wa) AS total_keys,
       |    (SELECT max(n) FROM (SELECT count(*) AS n FROM wa GROUP BY h))
       |      AS peak_keys
       |  UNION ALL
       |  SELECT 'distinct_users',
       |    (SELECT count(*) FROM du),
       |    (SELECT max(n) FROM (SELECT count(*) AS n FROM du GROUP BY h))
       |  UNION ALL
       |  SELECT 'sessionize',
       |    (SELECT count(DISTINCT user_id) FROM ev),
       |    (SELECT count(DISTINCT user_id) FROM ev)
       |  UNION ALL
       |  SELECT 'stream_dedup', (SELECT count(*) FROM ev),
       |    (${peak("ev", 1800000000L)})
       |  UNION ALL
       |  SELECT 'interval_join', (SELECT count(*) FROM clicks),
       |    (${peak("clicks", 600000000L)})
       |) ORDER BY operator""".stripMargin
  }

  /** TIME-TO-CONVERT histogram — the funnel-latency distribution
    * [[graft.operators.Relational.funnel]]'s stage counts don't show:
    * per converting user, the gap from their FIRST click to their
    * FIRST purchase at-or-after it, on exact log₂ µs buckets with
    * cumulative coverage in integer ppm. The marketing/SLA readout
    * ("90% of conversions land within 2^b µs") and the
    * attribution-window tuner (the [[graft.streaming.EventStream]]
    * interval joins' 10-minute range should cover the histogram's
    * mass — this measures whether it does).
    *
    * Scale: two user-keyed min-aggregates (partial+final; the purchase
    * side filters on the broadcast-joined first-click time before its
    * min), a ≤64-bucket histogram, triangle-join cumulative, 1-row
    * grand-total broadcast — nothing user-unbounded. */
  def timeToConvert(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val firstClick = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(min("us").as("c0"))
    val firstPurch = ev.filter(col("event_type") === "purchase")
      .join(firstClick, "user_id")
      .filter(col("us") >= col("c0"))
      .groupBy("user_id", "c0").agg(min("us").as("p0"))
    val hist = firstPurch
      .select((col("p0") - col("c0")).as("lat"))
      .select(when(col("lat") === 0, lit(-1))
        .otherwise(length(bin(col("lat"))) - 1).as("b"))
      .groupBy("b").agg(count(lit(1)).as("n_users"))
    val tot = hist.agg(sum("n_users").as("tot"))
    hist.select(col("b"), col("n_users"))
      .join(hist.select(col("b").as("b2"), col("n_users").as("n2")),
        col("b2") <= col("b"))
      .groupBy("b", "n_users").agg(sum("n2").as("cum"))
      .crossJoin(broadcast(tot))
      .select(col("b").as("log2_bucket"),
        when(col("b") === -1, lit(0L))
          .otherwise(expr("shiftleft(cast(1 as bigint), b)")).as("lat_lo_us"),
        col("n_users"),
        expr("cum * 1000000 div tot").as("cum_ppm"))
      .orderBy("log2_bucket")
  }

  /** DuckDB twin of [[timeToConvert]]. */
  private[graft] def timeToConvertOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
       |),
       |fc AS (
       |  SELECT user_id, min(us) AS c0 FROM ev
       |  WHERE event_type = 'click' GROUP BY 1
       |),
       |fp AS (
       |  SELECT ev.user_id, fc.c0, min(ev.us) AS p0
       |  FROM ev JOIN fc USING (user_id)
       |  WHERE ev.event_type = 'purchase' AND ev.us >= fc.c0
       |  GROUP BY 1, 2
       |),
       |hist AS (
       |  SELECT CASE WHEN p0 - c0 = 0 THEN -1
       |    ELSE CAST(length(bin(p0 - c0)) - 1 AS INTEGER) END AS b,
       |    count(*) AS n_users
       |  FROM fp GROUP BY 1
       |),
       |tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS tot FROM hist),
       |cum AS (
       |  SELECT a.b, a.n_users, CAST(sum(c.n_users) AS BIGINT) AS cum
       |  FROM hist a JOIN hist c ON c.b <= a.b
       |  GROUP BY a.b, a.n_users
       |)
       |SELECT cum.b AS log2_bucket,
       |  CASE WHEN cum.b = -1 THEN 0 ELSE (1::BIGINT << cum.b) END
       |    AS lat_lo_us,
       |  cum.n_users, (cum.cum * 1000000) // tot.tot AS cum_ppm
       |FROM cum, tot
       |ORDER BY log2_bucket""".stripMargin

  /** Per-(user, day) admission quota for [[throttle]]. */
  val ThrottleMaxPerDay = 3L

  /** RATE-LIMIT / QUOTA audit — how much of each user's event volume
    * survives a per-(user, day) admission cap of
    * [[ThrottleMaxPerDay]] (the collection-side throttle every
    * ingestion pipeline applies against runaway clients and replay
    * storms). Emits per user the total, admitted, and dropped counts.
    * Which events are admitted (the first N per day) doesn't change
    * the COUNTS, so the audit needs no ordering at all.
    *
    * Scale: two stacked partial+final count aggregations — (user, day)
    * then user — with `least(n, cap)` between them; no window, no
    * row_number, nothing per-event survives the first combine. The
    * (user, day) key is finer than user, so the first agg also
    * pre-shrinks any hot-user skew before the per-user rollup. */
  def throttle(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("dy"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(sum("n").as("n_events"),
        sum(least(col("n"), lit(ThrottleMaxPerDay))).as("n_kept"))
      .select(col("user_id"), col("n_events"), col("n_kept"),
        (col("n_events") - col("n_kept")).as("n_dropped"))
      .orderBy("user_id")

  /** DIURNAL PROFILE of the event stream — events per (hour-of-day,
    * type) with an exact parts-per-million share of total volume: the
    * seasonality fingerprint that tells a collection pipeline when its
    * clients are active (and an anomaly-detection baseline for
    * [[cusum]]-style monitors — a spike is only a spike relative to
    * the hour's norm).
    *
    * Scale: one partial+final count by a 24×#types-bounded key, the
    * grand total attached as a 1-row broadcast; the ppm share is
    * truncating integer arithmetic, bit-identical cross-engine. */
  def diurnal(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.events(s, d)
      .groupBy(hour(col("ts")).as("hour_of_day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.agg(sum("n").as("total"))
    cnt.crossJoin(broadcast(tot))
      .select(col("hour_of_day"), col("event_type"), col("n"),
        expr("(n * 1000000) div total").as("ppm"))
      .orderBy("hour_of_day", "event_type")
  }

  /** The train/val/test split label for a bucket column (80/10/10). */
  def splitCol(bucket: Column): Column =
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")

  /** Deterministic md5 train/val/test split over documents. */
  def splitAssign(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), pctBucket(col("doc_id")).as("bucket"))
      .withColumn("split", splitCol(col("bucket")))
      .orderBy("doc_id")

  /** A test doc sharing at least this many distinct word-3-shingles with
    * the train corpus is flagged contaminated. Fixture overlap spans
    * 4..81 shingles (median 26), so 30 splits it non-trivially. */
  val ContaminationMinShingles = 30L

  /** Train/test DECONTAMINATION — the canonical LLM-pipeline check that
    * evaluation data does not leak from the training set: for every test
    * doc (per [[splitAssign]]'s deterministic md5 split), count its
    * distinct word-3-shingles that occur anywhere in the train split, and
    * flag docs at ≥ [[ContaminationMinShingles]].
    *
    * Scale: the train side collapses to a DISTINCT shingle SET before the
    * join, so the probe is test-shingles ⋈ train-shingle-set — an
    * equi-join whose fan-out per shingle is the number of TEST docs
    * containing it (linear), never the train-df × test-df product. Both
    * sides partition by shingle; output is one aggregated row per test
    * doc. At 100 TB this is the shape you want: no window, no all-pairs,
    * and the train set is reusable across evaluation suites. */
  def contamination(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documentsSpread(s, d)
    val sh = docs.select(col("doc_id"),
        explode(array_distinct(
          graft.functions.WordShingles(col("text"), 3))).as("s"))
    val split = docs.select(col("doc_id"),
      splitCol(pctBucket(col("doc_id"))).as("split"))
    val shSplit = sh.join(split, "doc_id")
    val trainSet = shSplit.filter(col("split") === "train")
      .select("s").distinct()
    val testSh = shSplit.filter(col("split") === "test")
    val sizes = testSh.groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"))
    val overlap = testSh.join(trainSet, "s")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    sizes.join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_ratio",
        round(col("n_overlap").cast("double") / col("n_shingles"), 6))
      .withColumn("contaminated",
        col("n_overlap") >= ContaminationMinShingles)
      .orderBy("doc_id")
  }

  /** PII regexes shared with the oracle — deliberately restricted to
    * syntax RE2 (DuckDB) and java.util.regex (Spark) treat identically:
    * character classes, +, bounded repeats; no lookaround/backrefs. */
  val EmailRegex = "[a-z0-9.]+@[a-z0-9.]+[a-z]"
  val PhoneRegex = "555-[0-9]{4}"

  /** PII REDACTION — scrub emails/phone numbers from text, reporting the
    * redaction counts. The fixture corpus is clean, so (mirroring
    * [[normalize]]'s dirty-first pattern) each doc is first salted with
    * deterministic doc_id-derived PII; the operator then must find and
    * remove EXACTLY that: `clean` asserts the redacted text has zero
    * remaining matches and the salted tail collapsed to the placeholder
    * form. Pure per-row projection — embarrassingly parallel, no
    * shuffle before the output sort, and regexp_replace/count are
    * codegen'd (per-row regex, NOT a higher-order-function lambda — the
    * NGramArray hazard). */
  def redactPii(s: SparkSession, d: String): DataFrame = {
    val salted = concat(col("text"),
      lit(" contact u"), col("doc_id").cast("string"),
      lit("@mail.example.com or call 555-"),
      (col("doc_id") % 9000 + 1000).cast("string"), lit(" now"))
    val redacted = regexp_replace(
      regexp_replace(salted, PhoneRegex, "[PHONE]"),
      EmailRegex, "[EMAIL]")
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), salted.as("salted"),
        redacted.as("redacted"))
      .select(col("doc_id"),
        regexp_count(col("salted"), lit(EmailRegex)).as("n_emails"),
        regexp_count(col("salted"), lit(PhoneRegex)).as("n_phones"),
        length(col("redacted")).as("redacted_len"),
        (regexp_count(col("redacted"), lit(EmailRegex)) === 0 &&
          regexp_count(col("redacted"), lit(PhoneRegex)) === 0 &&
          col("redacted") === concat(col("text"),
            lit(" contact [EMAIL] or call [PHONE] now"))).as("clean"))
      .orderBy("doc_id")
  }

  /** Tokens per training chunk for [[chunkDocs]] (fixture docs hold
    * 10–99 tokens → 1–4 chunks each). */
  val ChunkTokens = 32

  /** Fixed-size SEQUENCE CHUNKING — split each document into consecutive
    * [[ChunkTokens]]-token windows (the pre-tokenization packing step of
    * a training pipeline), emitting per chunk its index, token count
    * (last chunk ragged) and first token (content spot-check).
    *
    * Scale: explode of ⌈n/32⌉ per doc with all values derived from the
    * in-row token array — no shuffle before the output sort; at 100 TB
    * this is a map-only stage feeding the tokenizer. */
  def chunkDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.WordShingles(col("text"), 1).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("n_tokens"), col("ws"))
      // zero-token docs yield ZERO chunks: without this filter Spark's
      // (0-1) div 32 = 0 emits a phantom sequence(0,0) chunk whose
      // element_at on the empty array throws under ANSI mode, while
      // DuckDB's (0-1)//32 floors to -1 and emits nothing (ADVICE r4).
      // Fixture docs are 10-99 tokens, so results are unchanged there.
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        // `div` (integer), not `/` (Column./ is double division)
        explode(expr(s"sequence(0, (n_tokens - 1) div $ChunkTokens)"))
          .as("chunk_idx"),
        col("ws"))
      .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
        least(lit(ChunkTokens),
          col("n_tokens") - col("chunk_idx") * ChunkTokens).cast("int")
          .as("chunk_tokens"),
        element_at(col("ws"), (col("chunk_idx") * ChunkTokens + 1).cast("int"))
          .as("first_tok"))
      .orderBy("doc_id", "chunk_idx")

  /** CHUNK-LEVEL exact dedup — the repeated-boilerplate detector run at
    * [[ChunkTokens]]-token granularity: chunk contents that recur
    * anywhere in the corpus (page footers, navigation bars, license
    * blocks render as repeated chunks even when their parent documents
    * differ, which document-level dedup cannot see). One row per
    * DUPLICATED chunk content: its portable 60-bit md5 fingerprint,
    * total occurrences, distinct parent docs (separates intra-doc
    * repetition from cross-doc boilerplate) and the minimum containing
    * doc. Singleton chunks are omitted — at corpus scale they are ~all
    * chunks. Detects EXACT chunk-ALIGNED repeats only (the inherent
    * fixed-window trade; unaligned/near overlap is the shingle and
    * minhash operators' job).
    *
    * Scale: map-only chunk hashing (a slice of the in-row token array —
    * the chunk text itself never shuffles, only 60-bit hashes) into a
    * partial+final hash aggregate: [[Dedup.exact]]'s shape at chunk
    * granularity. */
  def chunkDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.WordShingles(col("text"), 1).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("n_tokens"), col("ws"))
      .filter(col("n_tokens") > 0) // zero-token docs: see chunkDocs
      .select(col("doc_id"),
        explode(expr(s"sequence(0, (n_tokens - 1) div $ChunkTokens)"))
          .as("chunk_idx"),
        col("ws"))
      .select(col("doc_id"), Dedup.md5hash60(
          expr(s"array_join(slice(ws, chunk_idx * $ChunkTokens + 1, " +
            s"$ChunkTokens), ' ')")).as("chunk_hash"))
      .groupBy("chunk_hash")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("doc_id").as("n_docs"),
        min("doc_id").as("keep_doc"))
      .filter(col("n_occurrences") > 1)
      .orderBy("chunk_hash")

  /** A chunk content present in at least this many DISTINCT documents
    * counts as boilerplate for [[boilerplateStrip]] (C4 removes lines
    * repeated 3+ times corpus-wide; shared with the generated oracle). */
  val BoilerplateMinDocs = 3L

  /** BOILERPLATE STRIPPING report — the C4/CCNet cleanup step one level
    * up from [[chunkDedup]]'s detector: chunk contents recurring in ≥
    * [[BoilerplateMinDocs]] DISTINCT documents (page footers, license
    * blocks, navigation bars) are marked boilerplate, and each document
    * reports how much of it would survive the strip — kept tokens and
    * the removed fraction in exact integer parts-per-million (`div`, no
    * float division, so both engines agree bit-exactly). Documents made
    * EMPTY by the strip (`kept_tokens = 0`) are the docs a pipeline
    * drops outright; the ppm column is the corpus-health dial.
    *
    * Scale: map-only chunk hashing (only 60-bit hashes shuffle, never
    * chunk text), a partial+final distinct-doc count per hash, one
    * hash equi-join of the chunk frame against the (much smaller)
    * boilerplate-hash frame, then a per-doc partial+final aggregate —
    * linear end to end, no all-pairs stage, no window. The frequency
    * side is the exact shape of [[chunkDedup]], so at 100 TB the two
    * share one intermediate. */
  def boilerplateStrip(s: SparkSession, d: String): DataFrame =
    boilerplateStripOn(Tables.documents(s, d))

  /** [[boilerplateStrip]] over any (doc_id, text) DataFrame. */
  private[graft] def boilerplateStripOn(docs: DataFrame): DataFrame = {
    val chunks = docs
      .select(col("doc_id"), graft.functions.WordShingles(col("text"), 1)
        .as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"),
        col("ws"))
      .filter(col("n_tokens") > 0) // zero-token docs: see chunkDocs
      .select(col("doc_id"), col("n_tokens"),
        explode(expr(s"sequence(0, (n_tokens - 1) div $ChunkTokens)"))
          .as("chunk_idx"),
        col("ws"))
      .select(col("doc_id"), col("n_tokens"),
        least(lit(ChunkTokens),
          col("n_tokens") - col("chunk_idx") * ChunkTokens).cast("long")
          .as("chunk_tokens"),
        Dedup.md5hash60(
          expr(s"array_join(slice(ws, chunk_idx * $ChunkTokens + 1, " +
            s"$ChunkTokens), ' ')")).as("chunk_hash"))
    val boiler = chunks
      .groupBy("chunk_hash")
      .agg(countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") >= BoilerplateMinDocs)
      .select("chunk_hash")
    chunks.join(boiler, Seq("chunk_hash"), "left_semi")
      .groupBy("doc_id")
      .agg(sum("chunk_tokens").as("removed_tokens"),
        count(lit(1)).as("n_boiler_chunks"))
      .join(chunks.select("doc_id", "n_tokens").distinct(),
        Seq("doc_id"), "right")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_boiler_chunks"), lit(0L)).as("n_boiler_chunks"),
        coalesce(col("removed_tokens"), lit(0L)).as("removed_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_boiler_chunks"),
        (col("n_tokens") - col("removed_tokens")).as("kept_tokens"),
        expr("removed_tokens * 1000000 div n_tokens").as("removed_ppm"))
      .orderBy("doc_id")
  }

  /** Token budget of one packed training sequence (shared with the
    * generated oracle). Real pipelines use the model context (2k-8k);
    * 256 exercises multi-doc packing on the 10-100-word fixture docs. */
  val PackSeqLen = 256L

  /** Pack shards: documents are md5-bucketed into this many independent
    * packing streams. At cluster scale this is the parallelism dial —
    * one shard ≈ one output file / task; raise it with the corpus so
    * each shard's window stays executor-sized. */
  val PackShards = 16L

  /** SEQUENCE PACKING — the concat-then-split step that turns variable
    * -length documents into fixed-[[PackSeqLen]] training rows: docs are
    * deterministically md5-sharded, concatenated in doc_id order within
    * their shard, and the running token offset places each doc at
    * (seq_id, seq_offset) of the packed stream. `crosses_boundary` marks
    * docs split across two training sequences — the packing-loss metric
    * a pipeline owner tracks when choosing padding vs splitting.
    *
    * Scale: one map-only projection (token count + shard), then a
    * cumulative-sum window PARTITIONED BY shard — no global order, no
    * funnel; shard count scales with the corpus ([[PackShards]] is the
    * dial), and each shard's pack is a single streaming pass. This is
    * the reference's static 26-way letter partitioner
    * (`mapreduce.erl:156-170`) re-aimed at token budgets: a fixed
    * deterministic key routes work to independent streams. */
  def sequencePack(s: SparkSession, d: String): DataFrame =
    sequencePackOn(Tables.documents(s, d))

  /** [[sequencePack]] over any (doc_id, text) DataFrame. */
  def sequencePackOn(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = docs.select(col("doc_id"),
      size(graft.functions.WordShingles(col("text"), 1)).cast("long")
        .as("n_tokens"),
      (Dedup.md5hash60(col("doc_id").cast("string")) % PackShards)
        .as("shard"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("shard"),
        expr(s"cum_before div $PackSeqLen").as("seq_id"),
        (col("cum_before") % PackSeqLen).as("seq_offset"),
        col("n_tokens"),
        (col("cum_before") % PackSeqLen + col("n_tokens") > PackSeqLen)
          .as("crosses_boundary"))
      .orderBy("doc_id")
  }

  /** Selection quantile for [[selectTopQuality]]: keep the top 20% of
    * documents by quality score. Shared with the generated oracle. */
  val SelectQuantile = 0.8
  /** Histogram bins for the selection threshold sketch — quality ∈
    * [0, 1], so value error ≤ 0.001. */
  val SelectBins = 1000

  /** SCORE-BASED DATA SELECTION — keep the documents whose quality
    * score clears the corpus's [[SelectQuantile]] percentile: the
    * standard post-scoring selection step of a training pipeline
    * (score → threshold → filter). The threshold comes from the
    * deterministic histogram quantile sketch
    * ([[graft.functions.HistQuantileAgg]]): merge-order-independent,
    * so the estimate is stable under any partitioning AND replicated
    * bit-exactly by the oracle — the filter comparison uses the
    * UNROUNDED threshold on both engines, which is safe because the
    * interpolation arithmetic is identical double operation order
    * (pinned hash-exact by rel_hist_quantiles).
    *
    * Scale: the quality pipeline is one token aggregate; the sketch is
    * a partial+final aggregate carrying a bins-long buffer; the
    * threshold joins back as a 1-row broadcast (the grand-total move)
    * and the filter is map-only. A production pipeline materializes the
    * score table once and reuses it; here it is persisted for the two
    * consumers (sketch + filter) within the query. */
  def selectTopQuality(s: SparkSession, d: String): DataFrame = {
    val q = TextAnalysis.quality(s, d).select(col("doc_id"), col("quality"))
      .localCheckpoint() // doc_id-sized; two consumers, zero cache residue
    val thr = q.agg(graft.functions.HistQuantileAgg(
      col("quality"), 0.0, 1.0, SelectBins, SelectQuantile).as("thr"))
    q.crossJoin(broadcast(thr))
      .filter(col("quality") >= col("thr"))
      .select(col("doc_id"), col("quality"),
        round(col("thr"), 9).as("threshold"))
      .orderBy("doc_id")
  }

  /** DOMAIN-MIXTURE REBALANCING — downsample every `source` domain to
    * the minority domain's size, the standard way a training mixture is
    * flattened: per-source md5-deterministic sampling at rate
    * `⌊minN·100/nᵢ⌋` percent (exact integer division, identical on both
    * engines). Emits the per-source audit summary (target rate, achieved
    * sample size); the sampled doc set itself is the same filter without
    * the final aggregate.
    *
    * Scale: one hash aggregate for the per-source counts, a broadcast
    * scalar for the minimum, a broadcast rate-table join, then a
    * map-only filter — the corpus is scanned twice but never shuffled
    * (both aggregations are partial+final over source, ~#domains rows). */
  def domainRebalance(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val minN = counts.agg(min("n_docs").as("min_n"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("source"), col("n_docs"),
        expr("(min_n * 100) div n_docs").as("rate_pct"))
    docs.join(broadcast(rates), "source")
      .filter(pctBucket(col("doc_id")) < col("rate_pct"))
      .groupBy("source")
      .agg(first(col("n_docs")).as("n_docs"),
        first(col("rate_pct")).as("rate_pct"),
        count(lit(1)).as("n_sampled"))
      .orderBy("source")
  }

  /** Quantization scale (2^20) for the temperature-sampling weights of
    * [[mixtureSchedule]]. Determinism: IEEE-754 `sqrt` is CORRECTLY
    * ROUNDED in both engines (unlike log/exp/pow, which libm only
    * approximates — the reason τ is fixed at ½ instead of a free
    * exponent), and multiplying by a power of two only shifts the
    * exponent (exact), so `floor(sqrt(n)·2^20)` is a cross-engine
    * deterministic BIGINT for any n < 2^53. */
  val MixtureQuantScale = 1048576L

  /** Token budget the [[mixtureSchedule]] allocates across sources —
    * sized for the fixture (≈ a few × the corpus), shared with the
    * oracle; the allocation arithmetic is budget-agnostic DECIMAL. */
  val MixtureTokenBudget = 10000000L

  /** Temperature-sampling MIXTURE SCHEDULE over sources (XLM-R/mT5-style
    * multinomial domain weighting at τ = ½): sampling weight
    * w_d ∝ n_d^τ = sqrt(tokens_d) flattens the natural token
    * distribution toward uniform — high-resource domains are
    * down-weighted, low-resource ones up-weighted — without
    * [[domainRebalance]]'s full inversion to the minimum. Emits, per
    * source: whitespace-token mass, its natural share, the tempered
    * sampling share, the token allocation from a [[MixtureTokenBudget]],
    * and the implied epoch count (ppm; > 10⁶ ⇒ the domain is repeated —
    * the low-resource upsampling signal a data-mixing pipeline watches).
    *
    * Scale: one map-side token count per doc feeding a |sources|-row
    * aggregate, then scalar broadcasts — no shuffle beyond the per-source
    * agg at any corpus size. Products route through DECIMAL(38,0) so a
    * 100 TB token census cannot overflow the ppm arithmetic (the eager
    * DECIMAL discipline of the exact cross-multiplied tests). */
  def mixtureSchedule(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"),
        size(graft.functions.WordShingles(col("text"), 1)).cast("long").as("t"))
      .groupBy("source").agg(sum("t").as("n_tokens"))
      // a source of only empty docs has no token mass to schedule, and
      // its epochs_ppm division differs cross-engine (Spark div 0 →
      // NULL, DuckDB // 0 → error) — excluded in BOTH engines
      .filter(col("n_tokens") > 0)
      .withColumn("w_q", expr(
        s"cast(floor(sqrt(cast(n_tokens as double)) * $MixtureQuantScale) as bigint)"))
    val tot = toks.agg(sum("w_q").as("w_tot"), sum("n_tokens").as("tok_tot"))
    toks.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        expr("cast((cast(n_tokens as decimal(38,0)) * 1000000) div tok_tot as bigint)")
          .as("natural_ppm"),
        expr("cast((cast(w_q as decimal(38,0)) * 1000000) div w_tot as bigint)")
          .as("weight_ppm"),
        expr(s"cast((cast(w_q as decimal(38,0)) * $MixtureTokenBudget) div w_tot as bigint)")
          .as("alloc_tokens"))
      .withColumn("epochs_ppm", expr(
        "cast((cast(alloc_tokens as decimal(38,0)) * 1000000) div n_tokens as bigint)"))
      .orderBy("source")
  }

  /** DEDUP × MIXTURE interaction audit: exact dedup does not remove
    * tokens uniformly — boilerplate-heavy sources lose more — so the
    * post-dedup domain mixture DIFFERS from the one the sampler was
    * tuned on. Per source: token mass before and after exact dedup
    * (min-doc_id survivor per distinct text, [[Dedup.exact]]'s rule),
    * both shares in ppm, the signed share shift, and the duplicated
    * token mass removed. A data-mixing pipeline re-runs
    * [[mixtureSchedule]] AFTER dedup; this query is the report that
    * says by how much that re-run matters.
    *
    * Scale: the survivor set is the exact-dedup hash aggregate (never
    * a pair join) joined back as a semi-join on doc_id; token counting
    * is the same map-side projection as [[mixtureSchedule]]; everything
    * downstream is |sources|-sized with 1-row broadcasts. */
  def mixtureDedupShift(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(graft.functions.WordShingles(col("text"), 1)).cast("long").as("t"),
        col("text"))
    val keep = docs.groupBy("text").agg(min("doc_id").as("keep_id"))
      .select(col("keep_id").as("doc_id"))
    val before = docs.groupBy("source").agg(sum("t").as("tokens_before"))
    val after = docs.join(keep, "doc_id")
      .groupBy("source").agg(sum("t").as("tokens_after"))
    val joined = before.join(after, Seq("source"), "left")
      .na.fill(0L, Seq("tokens_after"))
    val tot = joined.agg(sum("tokens_before").as("tb"),
      sum("tokens_after").as("ta"))
    joined.crossJoin(broadcast(tot))
      // nullif: an all-empty corpus zeroes the totals — NULL shares in
      // BOTH engines instead of a DuckDB division error (the suite's
      // zero-guarded-ratio convention)
      .select(col("source"), col("tokens_before"), col("tokens_after"),
        (col("tokens_before") - col("tokens_after")).as("dup_tokens"),
        expr("cast((cast(tokens_before as decimal(38,0)) * 1000000) " +
          "div nullif(tb, 0) as bigint)").as("share_before_ppm"),
        expr("cast((cast(tokens_after as decimal(38,0)) * 1000000) " +
          "div nullif(ta, 0) as bigint)").as("share_after_ppm"))
      .withColumn("shift_ppm",
        col("share_after_ppm") - col("share_before_ppm"))
      .orderBy("source")
  }

  /** Damping (percent) and iteration count for [[qualityPropagation]],
    * shared with the generated oracle (which unrolls the iterations). */
  val PropagationDampPct = 85
  val PropagationIters = 2

  /** QUALITY PROPAGATION over the near-dup graph — PageRank-style
    * smoothing of per-doc quality across near-duplicates: a document
    * surrounded by low-quality near-copies is itself suspect even if its
    * own heuristics score well (and vice versa). Fixed
    * [[PropagationIters]] damped rounds over
    * [[Dedup.nearDupEdges]]'s graph:
    *
    *   q′(v) = (85 · ⌊Σ_{u∈N(v)} q(u) / deg(v)⌋ + 15 · q₀(v)) div 100
    *
    * in EXACT integer micro-units (quality floor-quantized ×10⁶, integer
    * division throughout — Spark `div` ≡ DuckDB `//`), so the oracle
    * replicates every round bit-for-bit. Output covers graph members
    * (isolated docs keep their base score by definition).
    *
    * Scale: per round one equi-join of the edge list against the 1-row-
    * per-node score frame + a hash aggregate — the CC cost model
    * ([[Dedup.connectedComponents]]); `localCheckpoint` truncates the
    * per-round lineage. */
  def qualityPropagation(s: SparkSession, d: String): DataFrame =
    qualityPropagationOn(s, d, Dedup.nearDupEdgesShared(s, d))

  /** [[qualityPropagation]] over a CALLER-SUPPLIED edge frame (columns
    * `a`, `b`) — propagation conceptually takes the graph as input, and
    * the default entry point feeds it [[Dedup.nearDupEdgesShared]] so the
    * edge pipeline is materialized once per session+corpus and shared
    * with the clustering operator instead of being rebuilt from raw text
    * by each consumer (VERDICT r4 item 1). */
  def qualityPropagationOn(
      s: SparkSession, d: String, edges: DataFrame): DataFrame = {
    val und = edges
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    val nodes = und.select(col("a").as("doc_id")).distinct()
    val q0 = TextAnalysis.quality(s, d)
      .select(col("doc_id"),
        floor(col("quality") * 1000000).cast("long").as("q0"))
    var scores = q0.join(nodes, "doc_id")
      .select(col("doc_id"), col("q0"), col("q0").as("q"))
      .localCheckpoint()
    for (_ <- 1 to PropagationIters) {
      // every graph node has ≥1 neighbor (und holds both directions),
      // so the neighbor aggregate inner-joins back without loss
      val nbr = und
        .join(scores.select(col("doc_id").as("nb"), col("q")),
          col("b") === col("nb"))
        .groupBy(col("a"))
        .agg(expr("sum(q) div count(1)").as("avgq"))
      scores = scores.drop("q")
        .join(nbr, col("doc_id") === col("a"))
        .select(col("doc_id"), col("q0"),
          expr(s"($PropagationDampPct * avgq + " +
            s"${100 - PropagationDampPct} * q0) div 100").as("q"))
        .localCheckpoint()
    }
    scores.select(col("doc_id"), col("q0"), col("q").as("q_prop"))
      .orderBy("doc_id")
  }

  /** Attach one-pass data-quality metrics to a documents-shaped frame
    * via the Observation API — row count, empty-text count, mean text
    * length are computed as a side effect of whatever action the caller
    * runs (no second scan, works identically under streaming
    * `observe`). The production pattern for monitoring a curation
    * pipeline without paying for separate audit queries. */
  def withQualityObservation(df: DataFrame)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1)
        .otherwise(0)).as("n_empty"),
      avg(length(col("text"))).as("mean_len"))
    (observed, obs)
  }

  val PipelineQualityMin = 0.5

  /** Composed curation pass — the operators chained the way a real
    * training-data pipeline runs them: exact dedup (keep the min doc_id
    * per distinct text) → quality filter (score ≥ 0.5) → deterministic
    * split assignment. One DataFrame, one Catalyst plan: the dedup
    * aggregation and the quality aggregation share the documents scan. */
  def curationPipeline(s: SparkSession, d: String): DataFrame = {
    val keep = Dedup.exact(s, d).select(col("keep_id").as("doc_id"))
    TextAnalysis.quality(s, d)
      .join(keep, "doc_id")
      .filter(col("quality") >= PipelineQualityMin)
      .select(col("doc_id"), col("quality"),
        splitCol(pctBucket(col("doc_id"))).as("split"))
      .orderBy("doc_id")
  }

  /** MARKETING ATTRIBUTION — for each converting user (first `purchase`
    * event), the first-touch and last-touch event types among everything
    * the user did STRICTLY BEFORE converting, plus the touch count. The
    * standard first/last-touch attribution report, done without ever
    * sorting the event table: the conversion instant is a
    * `min(struct(ts, event_id))` per user (partial-aggregating), and
    * both touches are min/max over (ts, event_id, type) structs —
    * the unique (ts, event_id) prefix decides, the type rides along
    * (the `min_by`-via-struct idiom, not a row_number window).
    *
    * Scale: two hash aggregations and one equi-join, all partitioned by
    * user_id — one shuffle shape reused end-to-end; no window funnel,
    * no event-table self-join beyond the user-keyed probe. */
  def attribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
    val conv = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(struct(col("us"), col("event_id"))).as("c"))
      .select(col("user_id"), col("c.us").as("conv_us"),
        col("c.event_id").as("conv_event_id"))
    val prior = conv.join(ev, Seq("user_id"))
      .filter(col("us") < col("conv_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_prior"),
        min(struct(col("us"), col("event_id"), col("event_type"))).as("ft"),
        max(struct(col("us"), col("event_id"), col("event_type"))).as("lt"))
    conv.join(prior, Seq("user_id"), "left")
      .select(col("user_id"), col("conv_us"), col("conv_event_id"),
        coalesce(col("n_prior"), lit(0L)).as("n_prior"),
        col("ft.event_type").as("first_touch"),
        col("lt.event_type").as("last_touch"))
      .orderBy("user_id")
  }

  /** Width (µs) of the activity interval each event opens. */
  val CoverageWindowUs = 10L * 60L * 1000000L

  /** INTERVAL-UNION COVERAGE — per user, the total UNION length of the
    * [[CoverageWindowUs]]-wide activity intervals their events open:
    * the classic gaps-and-islands sweep (overlapping intervals merge;
    * `covered ≤ span`). Distinct from gap-based sessionization: this is
    * the measure-of-union shape (uptime from heartbeats, audited
    * listening time, sensor coverage). Islands form with ONE window
    * pass: an interval starts a new island iff its start exceeds the
    * running max end of everything before it; the island id is the
    * running sum of those flags — all integer µs arithmetic, exact in
    * both engines.
    *
    * Scale: two windows and one aggregation, all partitioned by
    * user_id — per-key linear state, one shuffle shape end-to-end, no
    * self-join of the event table (the naive interval-overlap join is
    * quadratic per user). */
  def intervalCoverage(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val prevMaxEnd = max(col("end_us"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val ivs = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .withColumn("end_us", col("us") + CoverageWindowUs)
      .withColumn("new_island",
        when(prevMaxEnd.isNull || col("us") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ivs.groupBy(col("user_id"), col("island"))
      .agg(min(col("us")).as("i_start"), max(col("end_us")).as("i_end"),
        count(lit(1)).as("i_n"))
      .groupBy(col("user_id"))
      .agg(sum(col("i_n")).as("n_events"),
        count(lit(1)).as("n_islands"),
        sum(col("i_end") - col("i_start")).as("covered_us"),
        (max(col("i_end")) - min(col("i_start"))).as("span_us"))
      .select(col("user_id"), col("n_events"), col("n_islands"),
        col("covered_us"), col("span_us"),
        round(col("covered_us").cast("double") /
          col("span_us").cast("double"), 6).as("coverage_ratio"))
      .orderBy("user_id")
  }

  /** Trailing window of [[ewma]]: the current event plus 7 predecessors,
    * halving weights (2⁷ … 2⁰) — the discrete EWMA every metrics
    * pipeline smooths with. */
  val EwmaLags = 8

  /** Per-user trailing exponentially-weighted moving average of the
    * event value — sequential smoothing, the missing time-series
    * primitive next to [[Relational.trailingWindow]]'s RANGE frames and
    * [[Relational.cusum]]'s changepoint scan. The recurrence
    * s_i = (x_i + 2·s_{i−1})/… is unrolled into [[EwmaLags]] `lag()`
    * taps with power-of-two weights over exact cents, so the weighted
    * sum is pure BIGINT (order-free) and the ONLY float op is one final
    * division written identically in both engines. Partial windows
    * renormalize by the weights actually present (the standard
    * bias-corrected EWMA head).
    *
    * Scale: one window per user ordered by the arrival key — state is 8
    * lag slots per partition, no RANGE scan, no self-join; output is
    * event-sized, map-emitted per partition after one shuffle on
    * user_id. */
  def ewma(s: SparkSession, d: String): DataFrame =
    ewmaOn(Tables.events(s, d))

  /** [[ewma]] over any (event_id, user_id, value) frame. */
  private[graft] def ewmaOn(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val base = events
      .select(col("event_id"), col("user_id"), col("value"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val withLags = (0 until EwmaLags).foldLeft(base) { (df, k) =>
      df.withColumn(s"_l$k", lag(col("cents"), k).over(w))
    }
    val wsum = (0 until EwmaLags).map { k =>
      val wt = 1L << (EwmaLags - 1 - k)
      when(col(s"_l$k").isNotNull, col(s"_l$k") * wt).otherwise(lit(0L))
    }.reduce(_ + _)
    val wden = (0 until EwmaLags).map { k =>
      val wt = 1L << (EwmaLags - 1 - k)
      when(col(s"_l$k").isNotNull, lit(wt)).otherwise(lit(0L))
    }.reduce(_ + _)
    withLags
      .select(col("event_id"), col("user_id"), col("value"),
        round(wsum / (wden * lit(100.0)), 6).as("ewma"))
      .orderBy("event_id")
  }

  /** SEASONAL-NAIVE FORECAST BACKTEST — the evaluation loop every
    * capacity/traffic forecast starts from: hold out the LAST day,
    * predict each (hour-of-day × event-type) cell as the truncating
    * integer mean of the training days' counts (the seasonal-naive
    * baseline any fancier model must beat), and report the held-out
    * actual with the absolute error. All arithmetic is BIGINT
    * (train-total `div` day count), so both engines agree exactly.
    *
    * Scale: ONE fact scan feeds both the train and held-out counters
    * (conditional aggregation against the broadcast last-day scalar);
    * the day count aggregates a #days-sized distinct frame. Output is
    * the 24×#types cell grid. */
  def forecastEval(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(date_trunc("day", col("ts")).as("day"),
        hour(col("ts")).as("hour_of_day"), col("event_type"))
    val last = ev.agg(max("day").as("last_day"))
    val tagged = ev.crossJoin(broadcast(last))
    val cells = tagged.groupBy("hour_of_day", "event_type")
      .agg(count(when(col("day") < col("last_day"), lit(1))).as("n_train"),
        count(when(col("day") === col("last_day"), lit(1))).as("actual"))
    val nDays = tagged.filter(col("day") < col("last_day"))
      .agg(countDistinct(col("day")).as("n_days"))
    cells.crossJoin(broadcast(nDays))
      .select(col("hour_of_day"), col("event_type"), col("n_train"),
        col("n_days"), expr("n_train div n_days").as("pred"),
        col("actual"),
        abs(col("actual") - expr("n_train div n_days")).as("abs_err"))
      .orderBy("hour_of_day", "event_type")
  }

  /** [[independence]] flags cells whose observed/expected ratio leaves
    * [1/2, 2] — i.e. ppm outside [[IndepLowPpm]]..[[IndepHighPpm]]. */
  val IndepLowPpm = 500000L
  val IndepHighPpm = 2000000L

  /** Hour-of-day × event-type INDEPENDENCE audit — the contingency-table
    * check behind every "is traffic mix shifting by time of day?"
    * question: observed cell count vs the independence expectation
    * (row-total × col-total / grand-total), kept EXACT by
    * cross-multiplying into integer parts-per-million
    * (obs·total·10⁶ div (row·col)) — no division by an expectation
    * float, no chi-square rounding; both engines produce bit-identical
    * ppm. Cells off by more than 2× either way are flagged.
    *
    * Scale: one partial+final agg to the 24×#types cell frame; row/col
    * totals re-aggregate THAT frame (cell-sized, not fact-sized) and
    * broadcast back. The integer product obs·total·10⁶ stays < 2⁶³ for
    * corpora up to ~10⁹ events per busiest cell-pair (obs ≤ total);
    * beyond that, drop to per-mille scaling. */
  def independence(s: SparkSession, d: String): DataFrame = {
    val cell = Tables.events(s, d)
      .groupBy(hour(col("ts")).as("hour_of_day"), col("event_type"))
      .agg(count(lit(1)).as("n_obs"))
    val rowT = cell.groupBy("hour_of_day").agg(sum("n_obs").as("n_hour"))
    val colT = cell.groupBy("event_type").agg(sum("n_obs").as("n_type"))
    val tot = cell.agg(sum("n_obs").as("n_total"))
    cell
      .join(broadcast(rowT), Seq("hour_of_day"))
      .join(broadcast(colT), Seq("event_type"))
      .crossJoin(broadcast(tot))
      .select(col("hour_of_day"), col("event_type"), col("n_obs"),
        col("n_hour"), col("n_type"),
        expr("(n_obs * n_total * 1000000) div (n_hour * n_type)")
          .as("ratio_ppm"))
      .withColumn("deviant",
        col("ratio_ppm") < IndepLowPpm || col("ratio_ppm") > IndepHighPpm)
      .orderBy("hour_of_day", "event_type")
  }

  /** SNAPSHOT DIFF — crawl-over-crawl change accounting by CONTENT, the
    * ingestion-side audit every recurring crawl needs: which exact
    * contents appeared, vanished, or changed multiplicity between the
    * previous snapshot (even doc_ids — the suite's incremental-batch
    * convention, standing in for "yesterday's partition") and the new
    * one (odd doc_ids). Keyed by the md5-60 content hash so renamed /
    * re-crawled copies of the same text compare equal; emits one row
    * per distinct content with its old/new multiplicities and status
    * (`added` / `removed` / `retained`).
    *
    * Scale: one map-side hash projection, one (hash)-keyed count
    * aggregation (partial+final), a status CASE — no joins, no text
    * shuffled (the 60-bit hash travels, not the document). In a real
    * pipeline the two sides are two date partitions of the same table;
    * the parity predicate is this fixture's stand-in, exactly like
    * [[graft.operators.Dedup.incrementalDedupOn]]'s. */
  def snapshotDiff(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(Dedup.md5hash60(col("text")).as("content_key"),
        (col("doc_id") % 2 === 0).as("is_old"))
      .groupBy("content_key")
      .agg(sum(when(col("is_old"), 1L).otherwise(0L)).as("n_old"),
        sum(when(!col("is_old"), 1L).otherwise(0L)).as("n_new"))
      .select(col("content_key"),
        when(col("n_old") === 0, lit("added"))
          .when(col("n_new") === 0, lit("removed"))
          .otherwise(lit("retained")).as("status"),
        col("n_old"), col("n_new"))
      .orderBy("content_key")

  /** DuckDB twin of [[snapshotDiff]]. */
  private[graft] def snapshotDiffOracle: String =
    """SELECT ('0x' || substr(md5(text), 1, 15))::BIGINT AS content_key,
      |  CASE WHEN sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) = 0
      |         THEN 'added'
      |       WHEN sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) = 0
      |         THEN 'removed'
      |       ELSE 'retained' END AS status,
      |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_old,
      |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_new
      |FROM documents
      |GROUP BY 1 ORDER BY content_key""".stripMargin

  /** Deterministic stand-in for a right-to-be-forgotten deletion list:
    * every 13th user id. A real pipeline broadcast-joins the actual
    * list; the modulus keeps the fixture self-contained (the
    * [[snapshotDiff]] parity convention). */
  val ForgetUserModulus = 13L

  /** RIGHT-TO-BE-FORGOTTEN audit — the pre-deletion impact report a
    * data-governance pass runs before purging users: per event type,
    * how many events the deletion list touches, how many distinct
    * listed users actually appear, and the integer-ppm share of the
    * table that will disappear. Complements the privacy trio
    * (k-anonymity / l-diversity / t-closeness): those measure
    * re-identification risk, this measures erasure blast radius.
    *
    * Scale: map-only membership predicate (a broadcast semi-join
    * against the real list at scale), one (event_type)-keyed
    * aggregation, a 1-row total broadcast for the ppm — never a
    * user×event shuffle. */
  def forgetAudit(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        (col("user_id") % ForgetUserModulus === 0).as("hit"))
    val per = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_forget"),
        countDistinct(when(col("hit"), col("user_id"))).as("n_forget_users"))
    val tot = per.agg(sum("n_events").as("n_total"))
    per.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_events"), col("n_forget"),
        col("n_forget_users"),
        expr("n_forget * 1000000 div n_events").as("forget_ppm"),
        expr("n_forget * 1000000 div n_total").as("table_share_ppm"))
      .orderBy("event_type")
  }

  /** INCREMENTAL AGGREGATE MAINTENANCE — the nightly-cube-refresh
    * algebra, audited: a materialized per-(type, hour) aggregate built
    * from the EXISTING partition (even event_ids — the suite's arrival
    * convention) is merged with the DELTA partition's partial aggregate
    * (odd ids) by pure addition, and the merged cube is checked cell by
    * cell against a full recompute. `consistent` is computed by EACH
    * engine over its own merge, so the mergeability property itself —
    * counts and DECIMAL-exact sums are associative, the reason
    * map-side partial aggregation works at all — is what the gate
    * hash-checks, not just the final numbers.
    *
    * Scale: two (type, hour)-keyed aggregations (each reads only its
    * partition — at 100 TB the old side is the stored cube, not a
    * rescan), a cube-sized full-outer merge, and the audit recompute
    * (production drops the audit; it's the point of this operator). */
  def deltaMaintenance(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("h"),
        col("value").cast(DecimalType(18, 6)).as("v"))
    def cube(df: DataFrame) = df.groupBy("event_type", "h")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val old = cube(ev.filter(col("event_id") % 2 === 0))
      .select(col("event_type"), col("h"),
        col("n").as("n_old"), col("sv").as("sv_old"))
    val delta = cube(ev.filter(col("event_id") % 2 === 1))
      .select(col("event_type"), col("h"),
        col("n").as("n_delta"), col("sv").as("sv_delta"))
    val zero = lit(0).cast(DecimalType(18, 6))
    val merged = old.join(delta, Seq("event_type", "h"), "full_outer")
      .select(col("event_type"), col("h"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"),
        (coalesce(col("n_old"), lit(0L)) + coalesce(col("n_delta"), lit(0L)))
          .as("n_merged"),
        (coalesce(col("sv_old"), zero) + coalesce(col("sv_delta"), zero))
          .as("sv_merged"))
    val full = cube(ev).select(col("event_type"), col("h"),
      col("n").as("n_full"), col("sv").as("sv_full"))
    merged.join(full, Seq("event_type", "h"))
      .select(col("event_type"), col("h").as("hour"),
        col("n_old"), col("n_delta"), col("n_merged"),
        col("sv_merged").cast("double").as("sum_merged"),
        (col("n_merged") === col("n_full") &&
          col("sv_merged") === col("sv_full")).as("consistent"))
      .orderBy("event_type", "hour")
  }

  /** DuckDB twin of [[deltaMaintenance]]. */
  private[graft] def deltaMaintenanceOracle: String =
    """WITH ev AS MATERIALIZED (
      |  SELECT event_id, event_type, epoch_us(ts) // 3600000000 AS h,
      |    CAST(value AS DECIMAL(18,6)) AS v
      |  FROM events
      |),
      |old AS (
      |  SELECT event_type, h, count(*) AS n_old, sum(v) AS sv_old
      |  FROM ev WHERE event_id % 2 = 0 GROUP BY 1, 2
      |),
      |delta AS (
      |  SELECT event_type, h, count(*) AS n_delta, sum(v) AS sv_delta
      |  FROM ev WHERE event_id % 2 = 1 GROUP BY 1, 2
      |),
      |merged AS (
      |  SELECT coalesce(old.event_type, delta.event_type) AS event_type,
      |    coalesce(old.h, delta.h) AS h,
      |    coalesce(n_old, 0) AS n_old,
      |    coalesce(n_delta, 0) AS n_delta,
      |    coalesce(n_old, 0) + coalesce(n_delta, 0) AS n_merged,
      |    coalesce(sv_old, 0::DECIMAL(18,6))
      |      + coalesce(sv_delta, 0::DECIMAL(18,6)) AS sv_merged
      |  FROM old FULL OUTER JOIN delta
      |    ON old.event_type = delta.event_type AND old.h = delta.h
      |),
      |f AS (
      |  SELECT event_type, h, count(*) AS n_full, sum(v) AS sv_full
      |  FROM ev GROUP BY 1, 2
      |)
      |SELECT m.event_type, m.h AS hour,
      |  CAST(m.n_old AS BIGINT) AS n_old,
      |  CAST(m.n_delta AS BIGINT) AS n_delta,
      |  CAST(m.n_merged AS BIGINT) AS n_merged,
      |  CAST(m.sv_merged AS DOUBLE) AS sum_merged,
      |  (m.n_merged = f.n_full AND m.sv_merged = f.sv_full) AS consistent
      |FROM merged m JOIN f ON m.event_type = f.event_type AND m.h = f.h
      |ORDER BY 1, 2""".stripMargin

  /** DuckDB twin of [[forgetAudit]]. */
  private[graft] def forgetAuditOracle: String =
    s"""WITH per AS (
       |  SELECT event_type, count(*) AS n_events,
       |    CAST(sum(CASE WHEN user_id % $ForgetUserModulus = 0
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_forget,
       |    count(DISTINCT CASE WHEN user_id % $ForgetUserModulus = 0
       |      THEN user_id END) AS n_forget_users
       |  FROM events GROUP BY 1
       |),
       |tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS n_total FROM per)
       |SELECT event_type, n_events, n_forget, n_forget_users,
       |  (n_forget * 1000000) // n_events AS forget_ppm,
       |  (n_forget * 1000000) // tot.n_total AS table_share_ppm
       |FROM per, tot
       |ORDER BY event_type""".stripMargin
}

/** DuckDB oracles for [[Curation]], generated from the same constants. */
object CurationOracles {

  /** `('0x'||substr(md5(k),1,8))::BIGINT % 100` — DuckDB twin of
    * [[Curation.pctBucket]]. */
  private[operators] def pctBucketSql(key: String): String =
    s"('0x' || substr(md5($key), 1, 8))::BIGINT % 100"

  val normalize: String =
    """WITH n AS (
      |  SELECT doc_id, text,
      |    '  ' || upper(text) || ' !!! ' AS messy,
      |    trim(regexp_replace(regexp_replace(
      |      lower('  ' || upper(text) || ' !!! '),
      |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(length(messy) AS INTEGER) AS messy_len,
      |  CAST(length(norm) AS INTEGER) AS norm_len,
      |  (norm = text) AS roundtrip_ok,
      |  substr(md5(norm), 1, 16) AS norm_md5
      |FROM n ORDER BY doc_id""".stripMargin

  val lmScore: String =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      |),
      |kept AS (
      |  SELECT doc_id, w FROM words
      |  WHERE length(w) >= 2 AND substring(w, 1, 1) BETWEEN 'a' AND 'z'
      |),
      |grams AS (
      |  SELECT doc_id, substring(w, i, 2) AS bigram
      |  FROM kept, unnest(generate_series(1, length(w) - 1)) t(i)
      |  WHERE regexp_matches(substring(w, i, 2), '^[a-z]{2}$')
      |),
      |counts AS (SELECT bigram, count(*) AS cnt FROM grams GROUP BY 1),
      |lm AS (
      |  SELECT bigram,
      |    (cnt * 1000000000) // (SELECT sum(cnt)::BIGINT FROM counts) AS ppb
      |  FROM counts
      |)
      |SELECT g.doc_id, count(*) AS n_bigrams,
      |  sum(l.ppb)::BIGINT AS sum_ppb,
      |  sum(l.ppb)::BIGINT // count(*) AS avg_ppb
      |FROM grams g JOIN lm l USING (bigram)
      |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin

  val stratifiedSample: String = {
    val rateCase = Curation.SampleRates
      .map { case (t, r) => s"WHEN '$t' THEN $r" }.mkString(" ")
    s"""SELECT event_id, event_type,
       |  ${pctBucketSql("event_id::VARCHAR")} AS bucket
       |FROM events
       |WHERE ${pctBucketSql("event_id::VARCHAR")} <
       |  CASE event_type $rateCase ELSE 0 END
       |ORDER BY event_id""".stripMargin
  }

  val bottomKSample: String =
    s"""SELECT event_id, event_type, h FROM (
       |  SELECT event_id, event_type,
       |    substr(md5(event_id::VARCHAR), 1, 16) AS h
       |  FROM events ORDER BY h, event_id LIMIT ${Curation.BottomK}
       |) ORDER BY event_id""".stripMargin

  /** 3σ outliers via the same cross-multiplied exact-integer test —
    * HUGEINT here, DECIMAL(38,0) on the Spark side; both exact, so the
    * flag decisions are identical. */
  val outliers: String =
    """WITH ev AS (
      |  SELECT event_id, event_type, value,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS v6
      |  FROM events
      |),
      |st AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(v6) AS HUGEINT) AS s6,
      |    CAST(sum(v6 * v6) AS HUGEINT) AS q6
      |  FROM ev GROUP BY 1
      |)
      |SELECT e.event_id, e.event_type, e.value
      |FROM ev e JOIN st ON e.event_type = st.event_type
      |WHERE (st.n * e.v6 - st.s6) * (st.n * e.v6 - st.s6)
      |      > 9 * (st.n * st.q6 - st.s6 * st.s6)
      |ORDER BY event_id""".stripMargin

  /** Transition matrix: same lead() pairing, same integer-ppb
    * quantization (HUGEINT sums cast back). */
  val transitions: String =
    """WITH p AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events
      |),
      |cnt AS (
      |  SELECT from_type, to_type, count(*) AS n FROM p
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2
      |),
      |tot AS (
      |  SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
      |  FROM cnt GROUP BY 1
      |)
      |SELECT cnt.from_type, cnt.to_type, cnt.n,
      |  (cnt.n * 1000000000) // tot.tot AS ppb
      |FROM cnt JOIN tot USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  /** Same lag() gaps and exact binary-length log₂ bucketing. */
  val interarrival: String =
    """WITH g AS (
      |  SELECT epoch_us(ts) -
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events
      |),
      |b AS (
      |  SELECT CAST(length(bin(gap + 1)) - 1 AS INTEGER) AS log2_bucket,
      |    count(*) AS n
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1
      |)
      |SELECT log2_bucket, (1::BIGINT << log2_bucket) - 1 AS gap_lo_us, n
      |FROM b ORDER BY log2_bucket""".stripMargin

  /** Same 24×#types counting, 1-row total, truncating ppm share. */
  val diurnal: String =
    """WITH cnt AS (
      |  SELECT CAST(date_part('hour', ts) AS INTEGER) AS hour_of_day,
      |    event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt)
      |SELECT hour_of_day, event_type, n, (n * 1000000) // total AS ppm
      |FROM cnt CROSS JOIN tot
      |ORDER BY hour_of_day, event_type""".stripMargin

  /** Same double-lead pairing, count, and deterministic top-N cut. */
  val pathTrigrams: String =
    s"""WITH p AS (
       |  SELECT event_type AS step1,
       |    lead(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS step2,
       |    lead(event_type, 2) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS step3
       |  FROM events
       |)
       |SELECT step1, step2, step3, count(*) AS n FROM p
       |WHERE step3 IS NOT NULL
       |GROUP BY 1, 2, 3
       |ORDER BY n DESC, step1, step2, step3
       |LIMIT ${Curation.PathTrigramTopN}""".stripMargin

  /** Same stacked (user, day) → user counting with the least() cap. */
  val throttle: String =
    s"""WITH h AS (
       |  SELECT user_id, date_trunc('day', ts) AS dy, count(*) AS n
       |  FROM events GROUP BY 1, 2
       |)
       |SELECT user_id,
       |  CAST(sum(n) AS BIGINT) AS n_events,
       |  CAST(sum(least(n, ${Curation.ThrottleMaxPerDay})) AS BIGINT)
       |    AS n_kept,
       |  CAST(sum(n) - sum(least(n, ${Curation.ThrottleMaxPerDay}))
       |    AS BIGINT) AS n_dropped
       |FROM h GROUP BY 1 ORDER BY user_id""".stripMargin

  /** A/B test: same md5 split, same cross-multiplied z² decision in
    * HUGEINT (DECIMAL(38,0) on the Spark side — both exact). */
  val abTest: String =
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |v AS (
       |  SELECT user_id,
       |    (${pctBucketSql("user_id::VARCHAR")}) < 50 AS va
       |  FROM u
       |),
       |tot AS (
       |  SELECT CAST(sum(CASE WHEN va THEN 1 ELSE 0 END) AS HUGEINT) AS n_a,
       |         CAST(sum(CASE WHEN NOT va THEN 1 ELSE 0 END) AS HUGEINT) AS n_b
       |  FROM v
       |),
       |ut AS (SELECT DISTINCT user_id, event_type FROM events),
       |conv AS (
       |  SELECT event_type,
       |    CAST(sum(CASE WHEN va THEN 1 ELSE 0 END) AS HUGEINT) AS k_a,
       |    CAST(sum(CASE WHEN NOT va THEN 1 ELSE 0 END) AS HUGEINT) AS k_b
       |  FROM ut JOIN v USING (user_id) GROUP BY 1
       |)
       |SELECT event_type,
       |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       |  CAST(k_a AS BIGINT) AS k_a, CAST(k_b AS BIGINT) AS k_b,
       |  round(k_a::DOUBLE / n_a::DOUBLE, 6) AS conv_a,
       |  round(k_b::DOUBLE / n_b::DOUBLE, 6) AS conv_b,
       |  625 * (k_a * n_b - k_b * n_a) * (k_a * n_b - k_b * n_a)
       |      * (n_a + n_b)
       |    > 2401 * n_a * n_b * (k_a + k_b)
       |      * ((n_a + n_b) - (k_a + k_b)) AS significant
       |FROM conv, tot
       |ORDER BY event_type""".stripMargin

  /** One hist-sketch median block ([[graft.functions.HistQuantileAgg]]
    * replicated in SQL — same binning, rank pick, and interpolation as
    * the rel_hist_quantiles oracle), emitting `est_<out>(<grp>, <out>)`.
    * Chained twice by [[outliersMad]]. */
  private def madHistCtes(src: String, grp: String, valExpr: String,
      out: String): String = {
    import Curation.{MadHistLo => Lo, MadHistHi => Hi, MadHistBins => Bins}
    val w = (Hi - Lo) / Bins
    s"""b_$out AS (
       |  SELECT $grp,
       |    least(greatest(floor(($valExpr::DOUBLE - $Lo) / $w)::BIGINT, 0),
       |      ${Bins - 1}) AS bin
       |  FROM $src WHERE $valExpr IS NOT NULL
       |),
       |c_$out AS (SELECT $grp, bin, count(*) AS n FROM b_$out GROUP BY 1, 2),
       |cum_$out AS (
       |  SELECT $grp, bin, n,
       |    sum(n) OVER (PARTITION BY $grp ORDER BY bin) AS cum,
       |    sum(n) OVER (PARTITION BY $grp) AS tot
       |  FROM c_$out
       |),
       |pick_$out AS (
       |  SELECT $grp, bin, n, cum - n AS cumbefore,
       |    greatest(ceil(0.5 * tot)::BIGINT, 1) AS r,
       |    row_number() OVER (PARTITION BY $grp ORDER BY bin) AS rn
       |  FROM cum_$out
       |  WHERE cum >= greatest(ceil(0.5 * tot)::BIGINT, 1)
       |),
       |est_$out AS (
       |  SELECT $grp,
       |    round($Lo + $w * bin + $w * ((r - cumbefore)::DOUBLE / n::DOUBLE), 9)
       |      AS $out
       |  FROM pick_$out WHERE rn = 1
       |)""".stripMargin
  }

  /** MAD outliers: two chained hist-median blocks (value, then
    * |value − med|), then the identical one-multiply compare. */
  lazy val outliersMad: String =
    s"""WITH ev AS (SELECT event_id, event_type, value FROM events),
       |${madHistCtes("ev", "event_type", "value", "med")},
       |dev AS (
       |  SELECT e.event_id, e.event_type, e.value, m.med,
       |    abs(e.value - m.med) AS adev
       |  FROM ev e JOIN est_med m USING (event_type)
       |),
       |${madHistCtes("dev", "event_type", "adev", "mad")}
       |SELECT event_id, event_type, value, med, mad
       |FROM dev JOIN est_mad USING (event_type)
       |WHERE adev > ${Curation.MadCut} * mad
       |ORDER BY event_id""".stripMargin

  /** Replicates [[Curation.outlierAgreement]]: both detector oracles
    * as MATERIALIZED CTEs (each wraps a full pipeline), identical
    * confusion counts and the NULLIF-guarded integer-ppm Jaccard. */
  lazy val outlierAgreement: String =
    s"""WITH sig AS MATERIALIZED (SELECT event_id FROM ($outliers) ts),
       |madf AS MATERIALIZED (SELECT event_id FROM ($outliersMad) tm),
       |ev AS (SELECT event_id, event_type FROM events),
       |base AS (
       |  SELECT ev.event_type, count(*) AS n_events,
       |    count(s.event_id) AS n_sigma, count(m.event_id) AS n_mad,
       |    count(CASE WHEN s.event_id IS NOT NULL
       |      AND m.event_id IS NOT NULL THEN 1 END) AS n_both,
       |    count(CASE WHEN s.event_id IS NOT NULL
       |      OR m.event_id IS NOT NULL THEN 1 END) AS n_either
       |  FROM ev LEFT JOIN sig s USING (event_id)
       |  LEFT JOIN madf m USING (event_id)
       |  GROUP BY 1
       |)
       |SELECT event_type, n_events, n_sigma, n_mad, n_both, n_either,
       |  CAST((n_both * 1000000) // NULLIF(n_either, 0) AS BIGINT)
       |    AS jaccard_ppm
       |FROM base ORDER BY event_type""".stripMargin

  /** CUSUM via the same prefix-sum unrolling as `Curation.cusum`:
    * running sum + running min per user, exact ×10⁶ BIGINTs (window
    * HUGEINT sums cast back), identical (ts, event_id) total order. */
  val cusum: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, ts,
       |    CAST(floor(value * 1000000.0) AS BIGINT)
       |      - ${Curation.CusumDriftScaled} AS d
       |  FROM events
       |),
       |p AS (
       |  SELECT user_id, event_id, ts,
       |    CAST(sum(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
       |  FROM e
       |),
       |c AS (
       |  SELECT user_id, event_id,
       |    p - least(min(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cusum_scaled
       |  FROM p
       |)
       |SELECT user_id, event_id, cusum_scaled,
       |  round(cusum_scaled / 1000000.0, 6) AS cusum
       |FROM c WHERE cusum_scaled > ${Curation.CusumThresholdScaled}
       |ORDER BY user_id, event_id""".stripMargin

  /** Priority sampling: same u = (md5₄₈+1)/2⁴⁸ draw, same IEEE
    * operation order (multiply, then divide), same (K+1)-row τ —
    * replicates `Curation.prioritySample` exactly. */
  val prioritySample: String =
    s"""WITH pr AS (
       |  SELECT event_id, event_type, value,
       |    value * 281474976710656.0 /
       |      (('0x' || substr(md5(event_id::VARCHAR), 1, 12))::BIGINT + 1)
       |      AS priority
       |  FROM events
       |),
       |top1 AS (SELECT * FROM pr
       |         ORDER BY priority DESC, event_id LIMIT ${Curation.PriorityK + 1}),
       |tau AS (SELECT min(priority) AS tau FROM top1),
       |sel AS (SELECT * FROM top1
       |        ORDER BY priority DESC, event_id LIMIT ${Curation.PriorityK})
       |SELECT event_id, event_type, value,
       |  round(priority, 6) AS priority,
       |  round(greatest(value, tau.tau), 6) AS est_weight
       |FROM sel, tau ORDER BY event_id""".stripMargin

  val splitAssign: String =
    s"""SELECT doc_id,
       |  ${pctBucketSql("doc_id::VARCHAR")} AS bucket,
       |  CASE WHEN ${pctBucketSql("doc_id::VARCHAR")} < 80 THEN 'train'
       |       WHEN ${pctBucketSql("doc_id::VARCHAR")} < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  val contamination: String =
    s"""WITH wl AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM documents
       |),
       |sh AS (
       |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       |  FROM wl, unnest(generate_series(1, len(ws) - 2)) t(i)
       |),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN ${pctBucketSql("doc_id::VARCHAR")} < 80 THEN 'train'
       |         WHEN ${pctBucketSql("doc_id::VARCHAR")} < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |),
       |tr AS (SELECT DISTINCT s FROM sh JOIN sp USING (doc_id) WHERE split = 'train'),
       |te AS (SELECT sh.doc_id, sh.s FROM sh JOIN sp USING (doc_id) WHERE split = 'test'),
       |sz AS (SELECT doc_id, count(*) AS n_shingles FROM te GROUP BY 1),
       |ov AS (SELECT doc_id, count(*) AS n_overlap FROM te JOIN tr USING (s) GROUP BY 1)
       |SELECT sz.doc_id, sz.n_shingles,
       |  coalesce(ov.n_overlap, 0) AS n_overlap,
       |  round(coalesce(ov.n_overlap, 0) * 1.0 / sz.n_shingles, 6) AS overlap_ratio,
       |  coalesce(ov.n_overlap, 0) >= ${Curation.ContaminationMinShingles} AS contaminated
       |FROM sz LEFT JOIN ov USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  val domainRebalance: String =
    s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
       |r AS (
       |  SELECT source, n_docs,
       |    ((SELECT min(n_docs) FROM c) * 100) // n_docs AS rate_pct
       |  FROM c
       |)
       |SELECT r.source, r.n_docs, r.rate_pct,
       |  count(*) AS n_sampled
       |FROM documents d JOIN r ON d.source = r.source
       |WHERE ${pctBucketSql("d.doc_id::VARCHAR")} < r.rate_pct
       |GROUP BY r.source, r.n_docs, r.rate_pct ORDER BY r.source""".stripMargin

  /** Replicates [[Curation.mixtureSchedule]]: whitespace-token census per
    * source, the τ=½ weight `floor(sqrt(n)·2^20)` (IEEE sqrt is
    * correctly rounded in both engines; ×2^20 is an exact exponent
    * shift), then HUGEINT products mirroring Spark's DECIMAL(38,0)
    * route, integer-divided to ppm/allocation. */
  val mixtureSchedule: String =
    s"""WITH toks AS (
       |  SELECT source,
       |    sum(len(list_filter(string_split(text, ' '), x -> x <> '')))::BIGINT AS n_tokens
       |  FROM documents GROUP BY 1
       |  HAVING n_tokens > 0
       |),
       |q AS (
       |  SELECT source, n_tokens,
       |    floor(sqrt(n_tokens::DOUBLE) * ${Curation.MixtureQuantScale})::BIGINT AS w_q
       |  FROM toks
       |),
       |tot AS (
       |  SELECT sum(w_q)::HUGEINT AS w_tot, sum(n_tokens)::HUGEINT AS tok_tot FROM q
       |)
       |SELECT source, n_tokens,
       |  ((n_tokens::HUGEINT * 1000000) // tok_tot)::BIGINT AS natural_ppm,
       |  ((w_q::HUGEINT * 1000000) // w_tot)::BIGINT AS weight_ppm,
       |  ((w_q::HUGEINT * ${Curation.MixtureTokenBudget}) // w_tot)::BIGINT AS alloc_tokens,
       |  ((((w_q::HUGEINT * ${Curation.MixtureTokenBudget}) // w_tot) * 1000000)
       |    // n_tokens)::BIGINT AS epochs_ppm
       |FROM q, tot
       |ORDER BY source""".stripMargin

  /** Replicates [[Curation.mixtureDedupShift]] — same survivor rule,
    * token census, and HUGEINT ppm arithmetic. */
  val mixtureDedupShift: String =
    """WITH docs AS MATERIALIZED (
      |  SELECT doc_id, source,
      |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS t,
      |    text
      |  FROM documents
      |),
      |keep AS (SELECT min(doc_id) AS doc_id FROM docs GROUP BY text),
      |b AS (SELECT source, sum(t)::BIGINT AS tokens_before FROM docs GROUP BY 1),
      |a AS (
      |  SELECT source, sum(t)::BIGINT AS tokens_after
      |  FROM docs JOIN keep USING (doc_id) GROUP BY 1
      |),
      |j AS (
      |  SELECT b.source, b.tokens_before,
      |    coalesce(a.tokens_after, 0)::BIGINT AS tokens_after
      |  FROM b LEFT JOIN a ON b.source = a.source
      |),
      |tot AS (
      |  SELECT sum(tokens_before)::HUGEINT AS tb, sum(tokens_after)::HUGEINT AS ta
      |  FROM j
      |)
      |SELECT source, tokens_before, tokens_after,
      |  tokens_before - tokens_after AS dup_tokens,
      |  ((tokens_before::HUGEINT * 1000000) // nullif(tb, 0))::BIGINT AS share_before_ppm,
      |  ((tokens_after::HUGEINT * 1000000) // nullif(ta, 0))::BIGINT AS share_after_ppm,
      |  ((tokens_after::HUGEINT * 1000000) // nullif(ta, 0))::BIGINT
      |    - ((tokens_before::HUGEINT * 1000000) // nullif(tb, 0))::BIGINT AS shift_ppm
      |FROM j, tot
      |ORDER BY source""".stripMargin

  val redactPii: String = {
    val e = Curation.EmailRegex
    val p = Curation.PhoneRegex
    s"""WITH s AS (
       |  SELECT doc_id, text,
       |    text || ' contact u' || doc_id || '@mail.example.com or call 555-'
       |      || (doc_id % 9000 + 1000) || ' now' AS salted
       |  FROM documents
       |),
       |r AS (
       |  SELECT doc_id, text, salted,
       |    regexp_replace(regexp_replace(salted, '$p', '[PHONE]', 'g'),
       |      '$e', '[EMAIL]', 'g') AS redacted
       |  FROM s
       |)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(salted, '$e')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(salted, '$p')) AS INTEGER) AS n_phones,
       |  CAST(length(redacted) AS INTEGER) AS redacted_len,
       |  len(regexp_extract_all(redacted, '$e')) = 0 AND
       |  len(regexp_extract_all(redacted, '$p')) = 0 AND
       |  redacted = text || ' contact [EMAIL] or call [PHONE] now' AS clean
       |FROM r ORDER BY doc_id""".stripMargin
  }

  val chunkDocs: String = {
    val ct = Curation.ChunkTokens
    s"""WITH wl AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws,
       |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
       |  FROM documents
       |)
       |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       |  CAST(least($ct, n_tokens - i * $ct) AS INTEGER) AS chunk_tokens,
       |  ws[i * $ct + 1] AS first_tok
       |FROM wl, unnest(generate_series(0, (n_tokens - 1) // $ct)) t(i)
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** Replicates the histogram-threshold selection end-to-end: the
    * quality CTE, the same uniform bins / cumulative ranks / linear
    * interpolation as the rel_hist_quantiles oracle (identical double
    * operation order → the unrounded threshold is bit-equal), then the
    * filter. */
  val selectTopQuality: String = {
    val bins = Curation.SelectBins
    val sq = Curation.SelectQuantile
    val w = 1.0 / bins
    s"""WITH q AS (
       |  SELECT doc_id, quality FROM (${TextAnalysisOracles.qualityCore}) t
       |),
       |b AS (
       |  SELECT least(greatest(floor((quality - 0.0) / $w)::BIGINT, 0),
       |    ${bins - 1}) AS bin
       |  FROM q
       |),
       |c AS (SELECT bin, count(*) AS n FROM b GROUP BY 1),
       |cum AS (
       |  SELECT bin, n, sum(n) OVER (ORDER BY bin) AS cum,
       |    sum(n) OVER () AS tot
       |  FROM c
       |),
       |pick AS (
       |  SELECT bin, n, cum - n AS cumbefore,
       |    greatest(ceil($sq * tot)::BIGINT, 1) AS r,
       |    row_number() OVER (ORDER BY bin) AS rn
       |  FROM cum WHERE cum >= greatest(ceil($sq * tot)::BIGINT, 1)
       |),
       |thr AS (
       |  SELECT 0.0 + $w * bin + $w * ((r - cumbefore)::DOUBLE / n::DOUBLE)
       |    AS thrv
       |  FROM pick WHERE rn = 1
       |)
       |SELECT doc_id, quality, round(thrv, 9) AS threshold
       |FROM q, thr WHERE quality >= thrv
       |ORDER BY doc_id""".stripMargin
  }

  /** Replicates the chunk construction (same slicing arithmetic as
    * [[chunkDocs]]) and the portable md5 chunk fingerprint, then the
    * same duplicate-only aggregate. */
  val chunkDedup: String = {
    val ct = Curation.ChunkTokens
    s"""WITH wl AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws,
       |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
       |  FROM documents
       |),
       |ch AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(array_to_string(
       |       ws[i * $ct + 1 : least(n_tokens, (i + 1) * $ct)], ' ')), 1, 15))::BIGINT
       |      AS chunk_hash
       |  FROM wl, unnest(generate_series(0, (n_tokens - 1) // $ct)) t(i)
       |  WHERE n_tokens > 0
       |)
       |SELECT chunk_hash, count(*) AS n_occurrences,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  min(doc_id) AS keep_doc
       |FROM ch GROUP BY 1 HAVING count(*) > 1
       |ORDER BY chunk_hash""".stripMargin
  }

  val boilerplateStrip: String = {
    val ct = Curation.ChunkTokens
    val mind = Curation.BoilerplateMinDocs
    s"""WITH wl AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws,
       |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
       |  FROM documents
       |),
       |ch AS (
       |  SELECT doc_id, n_tokens,
       |    least($ct, n_tokens - i * $ct)::BIGINT AS chunk_tokens,
       |    ('0x' || substr(md5(array_to_string(
       |       ws[i * $ct + 1 : least(n_tokens, (i + 1) * $ct)], ' ')), 1, 15))::BIGINT
       |      AS chunk_hash
       |  FROM wl, unnest(generate_series(0, (n_tokens - 1) // $ct)) t(i)
       |  WHERE n_tokens > 0
       |),
       |boiler AS (
       |  SELECT chunk_hash FROM ch
       |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= $mind
       |),
       |rem AS (
       |  SELECT doc_id, CAST(sum(chunk_tokens) AS BIGINT) AS removed_tokens,
       |    count(*) AS n_boiler_chunks
       |  FROM ch WHERE chunk_hash IN (SELECT chunk_hash FROM boiler)
       |  GROUP BY 1
       |),
       |dt AS (SELECT DISTINCT doc_id, n_tokens FROM ch)
       |SELECT dt.doc_id, dt.n_tokens,
       |  COALESCE(rem.n_boiler_chunks, 0)::BIGINT AS n_boiler_chunks,
       |  (dt.n_tokens - COALESCE(rem.removed_tokens, 0))::BIGINT AS kept_tokens,
       |  CAST((COALESCE(rem.removed_tokens, 0) * 1000000) // dt.n_tokens AS BIGINT)
       |    AS removed_ppm
       |FROM dt LEFT JOIN rem USING (doc_id)
       |ORDER BY dt.doc_id""".stripMargin
  }

  /** Replicates [[Curation.sequencePackOn]]: md5 doc shard, per-shard
    * doc_id-ordered running token sum (exclusive), integer div/mod
    * placement — all BIGINT, bit-identical. */
  val sequencePack: String = {
    import Curation.{PackSeqLen => L, PackShards => S}
    s"""WITH t AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
       |      AS n_tokens,
       |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % $S AS shard
       |  FROM documents
       |),
       |c AS (
       |  SELECT doc_id, shard, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
       |      AS cum_before
       |  FROM t
       |)
       |SELECT doc_id, shard, cum_before // $L AS seq_id,
       |  cum_before % $L AS seq_offset, n_tokens,
       |  (cum_before % $L + n_tokens > $L) AS crosses_boundary
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** Unrolls [[Curation.qualityPropagation]]'s damped integer rounds in
    * SQL (same move as the k-means oracle): the edge CTEs mirror the
    * dedup_clusters oracle, the base score reuses the quality oracle. */
  val qualityPropagation: String = {
    val damp = Curation.PropagationDampPct
    val rest = 100 - damp
    val iters = (1 to Curation.PropagationIters).map { i =>
      s"""n$i AS (
         |  SELECT u.a AS doc_id,
         |    (sum(s${i - 1}.q) // count(*))::BIGINT AS avgq
         |  FROM und u JOIN s${i - 1} ON u.b = s${i - 1}.doc_id
         |  GROUP BY 1
         |),
         |s$i AS (
         |  SELECT s${i - 1}.doc_id, s${i - 1}.q0,
         |    (($damp * n$i.avgq + $rest * s${i - 1}.q0) // 100)::BIGINT AS q
         |  FROM s${i - 1} JOIN n$i USING (doc_id)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH wl AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM documents
       |),
       |sh AS (
       |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       |  FROM wl, unnest(generate_series(1, len(ws) - 2)) t(i)
       |),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |edges AS (
       |  SELECT i, j FROM inter
       |  JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= ${graft.operators.Dedup.ClusterJaccardThreshold}
       |),
       |und AS (SELECT i AS a, j AS b FROM edges UNION SELECT j, i FROM edges),
       |qq AS (${TextAnalysisOracles.qualityCore}),
       |s0 AS (
       |  SELECT qq.doc_id, floor(qq.quality * 1000000)::BIGINT AS q0,
       |    floor(qq.quality * 1000000)::BIGINT AS q
       |  FROM qq JOIN (SELECT DISTINCT a FROM und) g ON qq.doc_id = g.a
       |),
       |$iters
       |SELECT doc_id, q0, q AS q_prop
       |FROM s${Curation.PropagationIters}
       |ORDER BY doc_id""".stripMargin
  }

  val curationPipeline: String =
    s"""WITH keep AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
       |),
       |q AS (${TextAnalysisOracles.qualityCore})
       |SELECT q.doc_id, q.quality,
       |  CASE WHEN ${pctBucketSql("q.doc_id::VARCHAR")} < 80 THEN 'train'
       |       WHEN ${pctBucketSql("q.doc_id::VARCHAR")} < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM q JOIN keep USING (doc_id)
       |WHERE q.quality >= ${Curation.PipelineQualityMin}
       |ORDER BY doc_id""".stripMargin

  val attribution: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type
      |  FROM events
      |),
      |conv AS (
      |  SELECT user_id, us AS conv_us, event_id AS conv_event_id FROM (
      |    SELECT *, row_number()
      |      OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
      |    FROM ev WHERE event_type = 'purchase'
      |  ) WHERE rn = 1
      |),
      |pri AS (
      |  SELECT c.user_id, e.event_type,
      |    row_number() OVER (PARTITION BY c.user_id
      |      ORDER BY e.us, e.event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY c.user_id
      |      ORDER BY e.us DESC, e.event_id DESC) AS rn_d
      |  FROM conv c JOIN ev e ON c.user_id = e.user_id AND e.us < c.conv_us
      |),
      |agg AS (
      |  SELECT user_id, max(rn_a) AS n_prior,
      |    max(CASE WHEN rn_a = 1 THEN event_type END) AS first_touch,
      |    max(CASE WHEN rn_d = 1 THEN event_type END) AS last_touch
      |  FROM pri GROUP BY 1
      |)
      |SELECT c.user_id, c.conv_us, c.conv_event_id,
      |  coalesce(a.n_prior, 0) AS n_prior, a.first_touch, a.last_touch
      |FROM conv c LEFT JOIN agg a USING (user_id)
      |ORDER BY user_id""".stripMargin

  val intervalCoverage: String =
    s"""WITH iv AS (
       |  SELECT user_id, epoch_us(ts) AS us, event_id,
       |    epoch_us(ts) + ${Curation.CoverageWindowUs} AS end_us
       |  FROM events
       |),
       |fl AS (
       |  SELECT *, CASE WHEN max(end_us) OVER (PARTITION BY user_id
       |      ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |    OR us > max(end_us) OVER (PARTITION BY user_id
       |      ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |    THEN 1 ELSE 0 END AS new_island
       |  FROM iv
       |),
       |isl AS (
       |  SELECT *, sum(new_island) OVER (PARTITION BY user_id
       |    ORDER BY us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM fl
       |),
       |per_isl AS (
       |  SELECT user_id, island, min(us) AS i_start, max(end_us) AS i_end,
       |    count(*) AS i_n
       |  FROM isl GROUP BY 1, 2
       |)
       |SELECT user_id, sum(i_n)::BIGINT AS n_events,
       |  count(*) AS n_islands,
       |  sum(i_end - i_start)::BIGINT AS covered_us,
       |  (max(i_end) - min(i_start))::BIGINT AS span_us,
       |  round(sum(i_end - i_start)::BIGINT::DOUBLE /
       |    (max(i_end) - min(i_start))::BIGINT::DOUBLE, 6) AS coverage_ratio
       |FROM per_isl GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Replicates [[Curation.ewma]]: the same 8 lag taps, power-of-two
    * BIGINT weights, presence-renormalized denominator, and the single
    * final double division. */
  val ewma: String = {
    import Curation.EwmaLags
    val lags = (0 until EwmaLags).map { k =>
      s"lag(cents, $k) OVER (PARTITION BY user_id ORDER BY event_id) AS l$k"
    }.mkString(",\n    ")
    val wsum = (0 until EwmaLags).map { k =>
      val wt = 1L << (EwmaLags - 1 - k)
      s"CASE WHEN l$k IS NOT NULL THEN l$k * $wt ELSE 0 END"
    }.mkString(" + ")
    val wden = (0 until EwmaLags).map { k =>
      val wt = 1L << (EwmaLags - 1 - k)
      s"CASE WHEN l$k IS NOT NULL THEN $wt ELSE 0 END"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT event_id, user_id, value,
       |    CAST(round(value * 100, 0) AS BIGINT) AS cents
       |  FROM events
       |),
       |lagged AS (
       |  SELECT event_id, user_id, value,
       |    $lags
       |  FROM base
       |)
       |SELECT event_id, user_id, value,
       |  round(($wsum) / (($wden) * 100.0e0), 6) AS ewma
       |FROM lagged ORDER BY event_id""".stripMargin
  }

  /** Replicates [[Curation.forecastEval]] — same held-out last day,
    * conditional train/actual counters, truncating integer mean. */
  val forecastEval: String =
    """WITH ev AS (
      |  SELECT date_trunc('day', ts) AS day,
      |    CAST(hour(ts) AS INTEGER) AS hour_of_day, event_type
      |  FROM events
      |),
      |last AS (SELECT max(day) AS last_day FROM ev),
      |cells AS (
      |  SELECT hour_of_day, event_type,
      |    count(CASE WHEN day < last_day THEN 1 END) AS n_train,
      |    count(CASE WHEN day = last_day THEN 1 END) AS actual
      |  FROM ev CROSS JOIN last GROUP BY 1, 2
      |),
      |nd AS (
      |  SELECT count(DISTINCT day) AS n_days
      |  FROM ev CROSS JOIN last WHERE day < last_day
      |)
      |SELECT hour_of_day, event_type, n_train, n_days,
      |  n_train // n_days AS pred, actual,
      |  abs(actual - n_train // n_days) AS abs_err
      |FROM cells CROSS JOIN nd
      |ORDER BY hour_of_day, event_type""".stripMargin

  /** Replicates [[Curation.independence]] — identical integer ppm
    * cross-multiplication (`div` ≡ `//`, both truncating). */
  val independence: String = {
    import Curation.{IndepHighPpm, IndepLowPpm}
    s"""WITH cell AS (
       |  SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day, event_type,
       |    count(*) AS n_obs
       |  FROM events GROUP BY 1, 2
       |),
       |row_t AS (SELECT hour_of_day, sum(n_obs)::BIGINT AS n_hour
       |          FROM cell GROUP BY 1),
       |col_t AS (SELECT event_type, sum(n_obs)::BIGINT AS n_type
       |          FROM cell GROUP BY 1),
       |tot AS (SELECT sum(n_obs)::BIGINT AS n_total FROM cell)
       |SELECT hour_of_day, event_type, n_obs, n_hour, n_type,
       |  (n_obs * n_total * 1000000) // (n_hour * n_type) AS ratio_ppm,
       |  ((n_obs * n_total * 1000000) // (n_hour * n_type) < $IndepLowPpm
       |   OR (n_obs * n_total * 1000000) // (n_hour * n_type) > $IndepHighPpm)
       |    AS deviant
       |FROM cell
       |JOIN row_t USING (hour_of_day)
       |JOIN col_t USING (event_type)
       |CROSS JOIN tot
       |ORDER BY hour_of_day, event_type""".stripMargin
  }
}
