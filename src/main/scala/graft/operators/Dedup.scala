package graft.operators

import graft.GraftRefusal
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Checkpoints, Tables}
import graft.functions.{CosineSimilarity, WordShingles}

/** Document deduplication suite — the LLM-data-pipeline operators layered
  * over the reference's counting substrate (BASELINE.json north star).
  *
  * Five escalating strategies, each a `SparkEntry` query with a DuckDB
  * oracle (the MinHash and SimHash oracles replicate the full portable
  * pipeline in SQL, so even the "approximate" operators are checked
  * exactly):
  *
  *  1. exact       — hash groupBy on the full text
  *  2. jaccard     — exact word-shingle Jaccard via inverted-index join
  *                   (shingle equi-join, NOT an O(n²) cross join)
  *  3. minhash+LSH — 16 portable minhashes, 8 bands × r=2, band-bucket
  *                   join for candidates, exact-Jaccard verification
  *  4. simhash     — 60-bit fingerprint, 5 × 12-bit pigeonhole bands
  *                   (complete recall for hamming ≤ 4), bit_count verify
  *  5. embedding   — cosine over `embeddings` (brute pair join at test
  *                   scale; the 100 TB path is the LSH/IVF ANN operator
  *                   in [[Similarity]])
  *
  * Portability note: every hash derives from `md5` (identical in Spark
  * and DuckDB) — `('0x' || hex)::BIGINT` on the oracle side matches
  * `conv(hex, 16, 10)::long` on the Spark side, so signatures are
  * bit-identical across engines.
  *
  * Scale notes: all joins are key-equi joins on shingle/band/bucket —
  * shuffle-partitionable, AQE-skew-splittable. The only driver-side data
  * is the final result. Shingle→doc inverted lists for stopword-like
  * hyper-frequent shingles are the skew risk at 100 TB; LSH banding (3)
  * bounds that by joining on narrow band keys instead of raw shingles.
  */
object Dedup {

  val P = 2147483647L // 2^31 - 1 (Mersenne prime): mod base for minhash

  /** Fixed minhash parameters, shared by the Spark pipeline and the
    * generated oracle SQL. Seeded → identical on every JVM. */
  object MinHashParams {
    val K = 16          // signature length
    val Bands = 8       // LSH bands of r = K/Bands = 2 rows
    private val rnd = new scala.util.Random(7)
    val A: IndexedSeq[Long] = IndexedSeq.fill(K)(1L + rnd.nextInt(P.toInt - 1))
    val B: IndexedSeq[Long] = IndexedSeq.fill(K)(rnd.nextInt(P.toInt).toLong)
  }

  val SimHashBits = 60       // md5-derived 60-bit fingerprints
  val SimHashBands = 5       // 12-bit chunks; complete for hamming <= 4
  val SimHashMaxHamming = 4
  val JaccardThreshold = 0.8
  val CosineThreshold = 0.45
  /** Operating threshold for the LSH pair variant: lower than the brute
    * baseline's so the fixture (near-orthogonal embeddings, max cosine
    * ~0.51) yields a non-trivial bucketed result set; at this range the
    * 4x8-bit bucketing surfaces a meaningful candidate slice. */
  val CosineLshThreshold = 0.35

  /** Portable 60-bit hash of a string column: first 15 hex chars of md5.
    * DuckDB equivalent: `('0x' || substr(md5(x), 1, 15))::BIGINT`. */
  def md5hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  // ------------------------------------------------------------------
  // 1. exact dedup
  // ------------------------------------------------------------------

  /** Exact dedup: one surviving doc_id (the minimum) per distinct text,
    * with the multiplicity. Plain hash aggregation — partial+final. */
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  // ------------------------------------------------------------------
  // 2. exact n-gram (word-shingle) Jaccard pairs
  // ------------------------------------------------------------------

  /** doc_id → (distinct word-3-shingle, per-doc set size) — the
    * inverted-index input.
    *
    * Two r21 map-side moves (guide §2.4 — remove shuffles outright):
    *  - per-doc dedup via `array_distinct` BEFORE the explode: the old
    *    row-level `.distinct()` hashed the full (doc_id, shingle)
    *    frame — the heaviest frame in the dedup family — through an
    *    Exchange purely to drop within-document repeats, which the
    *    array form drops for free inside the scan stage. distinct was
    *    keyed by (doc_id, s), so the result set is identical.
    *  - `sz` = |doc's shingle set| rides along from the scan
    *    (`size` of the SAME deduped array, one WordShingles eval):
    *    every verify stage previously re-derived it with a
    *    groupBy(doc_id) aggregate (one more Exchange of the shingle
    *    frame) plus TWO join-backs onto the pair frame; now it is a
    *    grouping-key passenger ([[guardedIntersection]] /
    *    [[candidateIntersection]]). Same value by construction —
    *    count of distinct shingles ≡ size of the distinct array.
    *    Consumers that don't use `sz` (minhash signatures, band
    *    joins) lose nothing: Catalyst's column pruning drops the
    *    unused `size()` projection. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    Tables.documentsSpread(s, d)
      .select(col("doc_id"),
        array_distinct(WordShingles(col("text"), 3)).as("arr"))
      .select(col("doc_id"), explode(col("arr")).as("s"),
        size(col("arr")).cast("long").as("sz"))

  /** [[shingles]], persisted. The Jaccard pair queries branch off the
    * shingle frame 4-6 times in one plan (candidates, sizes, both sides
    * of the intersection join), and Catalyst's exchange reuse does not
    * always unify the branches (asymmetric pushed filters change the
    * canonical subtree) — caching materializes the explode+distinct once.
    * Measured: helps the many-consumer Jaccard plans (~2×), HURTS the
    * minhash plan (the cache barrier stalls its fused aggregation), so
    * only the Jaccard variants use it. Bench/Verify clear the cache
    * between queries, keeping timings and memory honest. */
  private def shinglesCached(s: SparkSession, d: String): DataFrame =
    shingles(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Hot-shingle guard for [[jaccardPairs]]: the naive co-shingle
    * self-join emits df² rows per shingle, so any hyper-frequent shingle
    * (a stopword run, boilerplate) makes it quadratic. Rather than
    * silently detonating at scale, the operator refuses inputs whose max
    * per-shingle document frequency exceeds this cap and points at
    * [[jaccardPrefixPairs]] (same results, prefix-filtered index, df-
    * bounded fan-out). Fixture max df is 25 at sf0.1 — 40× headroom. */
  val MaxNaiveShingleDf = 1000L

  /** All (i < j) pairs with exact shingle Jaccard ≥ t, via the naive
    * inverted-index self-join. Guarded by [[MaxNaiveShingleDf]] — the
    * join emits df² rows per shingle regardless of t (the threshold only
    * post-filters). Shared by [[jaccardPairs]] and the cluster-edge
    * generator in [[nearDupClusters]]. */
  /** Guarded co-shingle intersection — the shared core of every naive
    * inverted-index strategy: refuses hyper-frequent shingles
    * ([[MaxNaiveShingleDf]], `hint` names the caller's scale path), then
    * returns (i, j, c, sz_i, sz_j) — intersection count + both doc
    * sizes — for the caller's similarity arithmetic.
    * The eager guard is one aggregate over the (persisted) shingle
    * frame; its materialization is reused by every branch below. */
  /** Attach the per-doc shingle-set size when the caller's frame does
    * not already carry it: [[shingles]] computes `sz` MAP-SIDE from the
    * scan (free), so every production path is a no-op here; ad-hoc
    * 2-column (doc_id, s) frames (tests, external callers) fall back to
    * the window derivation — same value, one extra exchange. */
  private[graft] def withDocSetSize(sh: DataFrame): DataFrame =
    if (sh.columns.contains("sz")) sh
    else sh.withColumn("sz",
      count(lit(1)).over(Window.partitionBy("doc_id")))

  private def guardedIntersection(sh0: DataFrame,
      what: String, hint: String): DataFrame = {
    val sh = withDocSetSize(sh0)
    val maxDf = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .agg(max("df")).head().getLong(0)
    GraftRefusal.check(maxDf <= MaxNaiveShingleDf,
      s"$what refused: max per-shingle df $maxDf > " +
        s"$MaxNaiveShingleDf (quadratic fan-out); $hint")
    // sz_i/sz_j ride the co-shingle join as grouping-key passengers
    // (r21): [[shingles]] computes them map-side, so the old
    // groupBy(doc_id) size aggregate + two join-backs are gone — the
    // partial agg reduces (i, j) groups map-side exactly as before,
    // the exchange just carries two extra longs per GROUP. sz is
    // functionally determined by the id, so the group set is identical.
    sh.select(col("doc_id").as("i"), col("s").as("sa"),
        col("sz").as("sz_i"))
      .join(sh.select(col("doc_id").as("j"), col("s").as("sb"),
          col("sz").as("sz_j")),
        col("sa") === col("sb") && col("i") < col("j"))
      .groupBy("i", "j", "sz_i", "sz_j").agg(count(lit(1)).as("c"))
  }

  private[graft] def jaccardAll(sh: DataFrame, t: Double): DataFrame =
    guardedIntersection(sh, "naive jaccard join", "use jaccardPrefixPairs")
      .withColumn("jaccard",
        col("c").cast("double") / (col("sz_i") + col("sz_j") - col("c")))
      .filter(col("jaccard") >= t)

  /** Exact Jaccard ≥ 0.8 pairs via inverted-index self-join on shingles:
    * |A∩B| from the equi-join, |A∪B| = |A|+|B|−|A∩B|. */
  def jaccardPairs(s: SparkSession, d: String): DataFrame =
    jaccardAll(shinglesCached(s, d), JaccardThreshold)
      .select(col("i").as("doc_a"), col("j").as("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** Containment threshold for [[containmentPairs]] — |A∩B| / min(|A|,|B|)
    * ≥ 0.6 flags a pair where the smaller doc is mostly embedded in the
    * larger one. Shared with the generated oracle. */
  val ContainmentThreshold = 0.6

  /** Asymmetric CONTAINMENT pairs — |A∩B| / min(|A|,|B|): the
    * subset-duplication detector. Jaccard misses the classic curation
    * case of a short document wholly quoted inside a much longer one
    * (|A∩B|/|A∪B| is diluted by the long doc's size; containment is
    * not), which is exactly how boilerplate, quoted articles and
    * scraped-page wrappers show up in a training corpus.
    *
    * Same guarded inverted-index shape as [[jaccardPairs]] (the
    * [[MaxNaiveShingleDf]] hot-shingle guard applies). TWO scale paths
    * replace it beyond the guard: [[containmentPrefixPairs]] (asymmetric
    * prefix filtering — LOSSLESS at the operating threshold) and
    * [[containmentLshPairs]] (minhash banding — cheaper candidates,
    * banding-bounded recall). */
  def containmentPairs(s: SparkSession, d: String): DataFrame =
    guardedIntersection(shinglesCached(s, d), "containment join",
        "use containmentPrefixPairs (lossless) or containmentLshPairs " +
          "(banding + containment verify)")
      .withColumn("containment",
        col("c").cast("double") / least(col("sz_i"), col("sz_j")))
      .filter(col("containment") >= ContainmentThreshold)
      .select(col("i").as("doc_a"), col("j").as("doc_b"),
        round(col("containment"), 6).as("containment"))
      .orderBy("doc_a", "doc_b")

  // ------------------------------------------------------------------
  // 3. MinHash + LSH
  // ------------------------------------------------------------------

  /** doc_id → K minhash columns mh0..mhK-1 over word-3-shingles. */
  def minhashSignatures(s: SparkSession, d: String): DataFrame =
    minhashSignaturesOn(shingles(s, d))

  /** [[minhashSignatures]] over any (doc_id, s) shingle frame. */
  private[graft] def minhashSignaturesOn(sh: DataFrame): DataFrame = {
    import MinHashParams._
    val h = sh.select(col("doc_id"), (md5hash60(col("s")) % P).as("hv"))
    val mins = (0 until K).map(i =>
      min((lit(A(i)) * col("hv") + lit(B(i))) % P).as(s"mh$i"))
    h.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** Band-collision candidate (i < j) pairs from the minhash signatures
    * — the shared candidate generator for every banding-first strategy:
    * [[minhashLsh]] (Jaccard verify), [[containmentLshPairs]]
    * (containment verify) and the shared cluster edge graph. Candidates
    * come from a band/bkey equi-join, so the fan-out is bounded by LSH
    * bucket occupancy, never all-pairs. */
  def minhashCandidates(s: SparkSession, d: String): DataFrame =
    minhashCandidatesOn(shingles(s, d))

  /** The default-geometry band frame over the corpus — stage 2 of
    * [[minhashLsh]], exposed for the Scaling stage decomposition
    * (the `minhash_stage_*` rows). */
  private[graft] def minhashBands(s: SparkSession, d: String): DataFrame =
    minhashBandsOn(shingles(s, d))

  /** doc_id → (band, bkey) LSH band keys from the minhash signatures —
    * the shared band frame for the symmetric ([[minhashCandidatesOn]])
    * and asymmetric ([[incrementalDedup]]) band joins. Default
    * [[MinHashParams]] geometry; [[minhashBandsGeomOn]] is the
    * dialable form. */
  private[graft] def minhashBandsOn(sh: DataFrame): DataFrame =
    minhashBandsGeomOn(sh, MinHashParams.Bands,
      MinHashParams.K / MinHashParams.Bands)

  /** [[minhashBandsOn]] at an explicit (bands, rowsPerBand) geometry
    * (bands·rows ≤ [[MinHashParams.K]]). */
  private[graft] def minhashBandsGeomOn(
      sh: DataFrame, bands: Int, rows: Int): DataFrame = {
    val sig = minhashSignaturesOn(sh)
    sig.select(col("doc_id"),
      posexplode(array(bandKeyCols(bands, rows, i => col(s"mh$i")): _*))
        .as(Seq("band", "bkey")))
  }

  /** The per-band key expressions for a (bands, rowsPerBand) geometry
    * over minhash columns `mh(0..bands·rows−1)` — shared between the
    * batch band frames and the per-row STREAMING formulation
    * (`EventStream.incrementalDedupStreamVerified`), so both sides of a
    * stream-static band join always compute identical keys. r = 2 keeps
    * the legacy exact arithmetic (`mh·P + mh` — the form every
    * committed oracle replicates); wider rows pack the r values through
    * [[md5hash60]] over a `_`-joined string (the `P`-base positional
    * encoding would overflow BIGINT at r ≥ 3), whose DuckDB twin is the
    * standard `('0x' || substr(md5(mh0 || '_' || …), 1, 15))::BIGINT`. */
  private[graft] def bandKeyCols(
      bands: Int, rows: Int, mh: Int => Column): Seq[Column] = {
    require(bands > 0 && rows > 0 && bands * rows <= MinHashParams.K,
      s"band geometry $bands x $rows exceeds the ${MinHashParams.K}-value " +
        "signature")
    (0 until bands).map { b =>
      if (rows == 2) mh(rows * b) * P + mh(rows * b + 1)
      else md5hash60(concat_ws("_",
        (0 until rows).map(i => mh(rows * b + i).cast("string")): _*))
    }
  }

  /** n-ADAPTIVE MinHash band geometry — the streaming analog of
    * [[scaledLshGeometry]] (VERDICT r8 item 8): (bands, rowsPerBand)
    * with bands·rows = [[MinHashParams.K]], rows DOUBLING as the corpus
    * grows. Cost side: a band bucket holding o docs fans out o (stream)
    * — or o² (symmetric) — verify candidates, and at the default r = 2
    * a pair of mere 0.5-Jaccard docs still collides in some band with
    * probability 1 − (1 − 0.5²)⁸ ≈ 0.90 — at dup-heavy crawl scale
    * nearly every moderately-similar pair becomes a candidate. Raising
    * r sharpens the S-curve (j^r per band): at r = 4 the same j = 0.5
    * pair collides with probability ≈ 0.23, bounding bucket occupancy
    * where it actually detonates. Recall at the J = 0.8 operating
    * threshold stays high (r2: 0.9997, r4: 0.88, r8: 0.31 — the r8 leg
    * is the documented last resort before sharding). Thresholds are
    * powers of ten so the dial is trivially oracle-replicable; fixture
    * corpora resolve to the default (8, 2), keeping every committed
    * oracle byte-identical. */
  def scaledBandGeometry(n: Long): (Int, Int) =
    if (n <= BandDialSmallMaxDocs)
      (MinHashParams.Bands, MinHashParams.K / MinHashParams.Bands)
    else if (n <= BandDialMidMaxDocs) (4, MinHashParams.K / 4)
    else (2, MinHashParams.K / 2)

  /** The banding dial's corpus-size thresholds — ONE definition shared
    * by [[scaledBandGeometry]], the [[bandGeometry]] audit's when-chain,
    * and the oracle CASE ([[DedupOracles.bandGeometry]]); three literal
    * copies silently desynced the audit from the dial if one was edited
    * (ADVICE r9). Powers of ten so both engines' literals are exact. */
  val BandDialSmallMaxDocs = 1000000L
  val BandDialMidMaxDocs = 100000000L

  /** Corpus sizes [[bandGeometry]] projects the dial across (besides
    * the actual count) — covers all three rows-per-band branches. */
  val BandGeometryProjectedSizes: Seq[Long] = Seq(1000L, 10000L,
    100000L, 1000000L, 10000000L, 100000000L, 1000000000L, 10000000000L)

  /** The J = 0.8 operating threshold and the j = 0.5 "moderately
    * similar" false-candidate driver, in ppm — the two points the
    * [[bandGeometry]] audit evaluates each geometry's S-curve at. */
  val BandJaccardPpm = 800000L
  val BandModeratePpm = 500000L

  /** (per-band collision, any-band candidate) probability in ppm for a
    * pair of Jaccard `jPpm` docs under a (bands, rows) geometry —
    * j^r and 1 − (1−j^r)^b by ITERATED integer floor (each step stays
    * under 10¹², so the arithmetic is pure BIGINT and, precomputed
    * here, shared as literals with the oracle — the co-located
    * constants rule). Floor error compounds a few ppm downward per
    * step, identically on both sides of the compare. */
  private[graft] def bandPpm(jPpm: Long, bands: Int, rows: Int): (Long, Long) = {
    var c = 1000000L
    for (_ <- 0 until rows) c = c * jPpm / 1000000L
    var miss = 1000000L
    for (_ <- 0 until bands) miss = miss * (1000000L - c) / 1000000L
    (c, 1000000L - miss)
  }

  /** The three dial geometries with their ppm stats — the literal rows
    * BOTH the Spark plan and the DuckDB oracle join against. */
  private[graft] def bandGeometryRows: Seq[(Int, Int, Long, Long, Long, Long)] =
    Seq(2, 4, 8).map { r =>
      val b = MinHashParams.K / r
      val (ct, recall) = bandPpm(BandJaccardPpm, b, r)
      val (cf, fpCand) = bandPpm(BandModeratePpm, b, r)
      (r, b, ct, recall, cf, fpCand)
    }

  /** Band-geometry dial audit — the [[lshGeometry]] twin for the
    * MINHASH banding dial (r8 VERDICT item 8's streaming geometry):
    * one row per corpus size (actual + [[BandGeometryProjectedSizes]])
    * with the (bands, rows) [[scaledBandGeometry]] selects and the
    * geometry's S-curve evaluated in integer ppm at the J = 0.8
    * operating threshold (per-band collision + recall) and at j = 0.5
    * (the false-candidate driver the dial exists to suppress: 900 k ppm
    * of moderate pairs become candidates at (8, 2), 228 k at (4, 4),
    * 7.8 k at (2, 8)). All BIGINT arithmetic, literals shared with the
    * oracle — the streaming dial's scale story is itself hash-checked,
    * like `dedup_lsh_geometry` is for the SRP dial. */
  def bandGeometry(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val actual = Tables.documents(s, d)
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .withColumn("scope", lit("corpus"))
    // the streaming dial keys off the INDEXED corpus — the even-id half
    // [[graft.streaming.EventStream.incrementalDedupStreamVerified]]
    // builds its static band index over — not the full table; near the
    // dial thresholds the two can select different geometries, so the
    // audit reports the stream's operative count as its own row
    // (ADVICE r9)
    val streamCorpus = Tables.documents(s, d)
      .filter(col("doc_id") % 2 === 0)
      .agg(count(lit(1)).cast("long").as("n_docs"))
      .withColumn("scope", lit("stream_corpus"))
    val projected = BandGeometryProjectedSizes.toDF("n_docs")
      .withColumn("scope", lit("projected"))
    val geoms = bandGeometryRows.toDF("rows_per_band", "bands",
      "collide_ppm", "recall_ppm", "fp_band_ppm", "fp_cand_ppm")
    actual.select("scope", "n_docs")
      .unionByName(streamCorpus.select("scope", "n_docs"))
      .unionByName(projected.select("scope", "n_docs"))
      .withColumn("rows_per_band",
        when(col("n_docs") <= BandDialSmallMaxDocs, 2)
          .when(col("n_docs") <= BandDialMidMaxDocs, 4)
          .otherwise(8).cast("int"))
      .join(broadcast(geoms), "rows_per_band")
      .select(col("scope"), col("n_docs"), col("bands").cast("int"),
        col("rows_per_band"), col("collide_ppm"), col("recall_ppm"),
        col("fp_band_ppm"), col("fp_cand_ppm"))
      .orderBy("n_docs", "scope")
  }

  /** [[minhashCandidates]] over any (doc_id, s) shingle frame. */
  private[graft] def minhashCandidatesOn(sh: DataFrame): DataFrame = {
    // the two legs' identical signature pipelines are unified at
    // runtime by AQE's stage reuse (one ReusedExchange — measured r21;
    // an explicit localCheckpoint here measured SLOWER, its
    // materialization barrier beats the reuse it duplicates)
    val bands = minhashBandsOn(sh)
    bands.toDF("i", "band", "bkey")
      .join(bands.toDF("j", "band2", "bkey2"),
        col("band") === col("band2") && col("bkey") === col("bkey2") &&
          col("i") < col("j"))
      .select("i", "j").distinct()
  }

  /** INCREMENTAL dedup — a NEW batch of documents deduplicated AGAINST
    * the existing corpus: the production arrival shape ("dedup today's
    * crawl against the 100 TB corpus") that none of the symmetric
    * operators express. The batch membership is a caller-supplied
    * predicate column ([[incrementalDedupOn]] — ingestion date, source,
    * anything over the input's columns); the driver query instantiates
    * it with doc_id parity (odd = new batch, even = existing corpus) so
    * the fixture exercises a mixed split. Candidates come from an
    * ASYMMETRIC band join — new-batch bands against corpus bands only,
    * so within-batch and within-corpus pairs are never generated
    * (within-batch dedup is the symmetric [[minhashLsh]]); verification
    * is the shared candidate-restricted exact Jaccard; each matched new
    * doc keeps its BEST corpus match (highest Jaccard, smallest corpus
    * id on ties — a total order over the 6-dp values both engines
    * round to).
    *
    * Scale: the new batch is tiny next to the corpus, so the band
    * join's probe side is small and bucket-bounded; the corpus-side
    * signatures/bands are precomputable ONCE and stored as a parquet
    * intermediate (the [[edgeScratchDir]] pattern) rather than
    * re-derived per arriving batch — only the new batch's shingling and
    * signatures are per-batch work. */
  def incrementalDedup(s: SparkSession, d: String): DataFrame =
    incrementalDedupOn(Tables.documents(s, d), col("doc_id") % 2 === 1)

  /** [[incrementalDedup]] over any (doc_id, text, …) frame with an
    * ARBITRARY batch predicate (VERDICT r6 item 4): `isNew` is any
    * Column over the input's columns — `col("source") === "crawl_0813"`,
    * `col("ingested_at") >= yesterday`, the driver query's doc_id
    * parity. Docs where it holds are the arriving batch; all others are
    * the corpus being deduped against. The flag rides a doc-keyed
    * equi-join onto the band and verified-pair frames (one row per doc
    * — never a data-sized shuffle beyond the joins already there). */
  def incrementalDedupOn(docs: DataFrame, isNew: Column): DataFrame = {
    val flags = docs.select(col("doc_id"), isNew.as("is_new"))
    // localCheckpoint: FIVE consumers in one plan (two band-join legs,
    // the verify restriction, both intersection legs) — the removed
    // row-level distinct()'s Exchange used to give them a reusable
    // materialization point; the checkpoint restores that without the
    // shuffle (r21)
    val sh = docs
      .select(col("doc_id"),
        array_distinct(WordShingles(col("text"), 3)).as("arr"))
      .select(col("doc_id"), explode(col("arr")).as("s"),
        size(col("arr")).cast("long").as("sz"))
      .localCheckpoint()
    val bands = minhashBandsOn(sh).join(flags, "doc_id")
    val cands = bands.filter(col("is_new"))
      .select(col("doc_id").as("n"), col("band"), col("bkey"))
      .join(bands.filter(!col("is_new"))
          .select(col("doc_id").as("o"), col("band").as("band2"),
            col("bkey").as("bkey2")),
        col("band") === col("band2") && col("bkey") === col("bkey2"))
      .select(least(col("n"), col("o")).as("i"),
        greatest(col("n"), col("o")).as("j"))
      .distinct()
    val best = Window.partitionBy("doc_id")
      .orderBy(desc("jaccard"), asc("dup_of"))
    verifyJaccardPairs(sh, cands)
      .join(flags.toDF("doc_a", "a_new"), "doc_a")
      .select(
        when(col("a_new"), col("doc_a")).otherwise(col("doc_b"))
          .as("doc_id"),
        when(col("a_new"), col("doc_b")).otherwise(col("doc_a"))
          .as("dup_of"),
        col("jaccard"))
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select("doc_id", "dup_of", "jaccard")
      .orderBy("doc_id")
  }

  /** Candidate pairs whose exact Jaccard ≥ 0.8, found via LSH banding
    * (8 bands × 2 rows) then verified with the true shingle Jaccard.
    * The shingle intersection is computed ONLY for candidate docs
    * (semi-join first): at scale the unrestricted co-shingle self-join
    * is quadratic in shingle document frequency, while candidates are
    * bounded by the LSH bucket sizes. */
  def minhashLsh(s: SparkSession, d: String): DataFrame =
    verifyJaccardPairs(shingles(s, d), minhashCandidates(s, d))

  /** Candidate-restricted intersection counts — the shared verify core:
    * restrict the inverted index to candidate docs, compute |A∩B| by
    * co-shingle join, and return (i, j, c, sz_i, sz_j) for the caller's
    * similarity arithmetic ([[verifyJaccardPairs]] /
    * [[verifyContainmentPairs]]). */
  /** Broadcast cap for the verify-stage support frames (candidate
    * pairs, candidate doc ids, per-candidate-doc sizes — all bounded by
    * the candidate count): pairs under this count broadcast-join
    * (16-byte rows → ≲ 100 MB hash relations with overhead, well under
    * the 8 GB broadcast ceiling); past it the joins stay shuffles — the
    * same measured-demotion discipline as [[VerifyBroadcastMaxVectors]].
    * A checkpointed `cands.count()` is one metadata-cheap job. */
  val VerifyBroadcastMaxCandidates: Long = 2L * 1024 * 1024

  private def candidateIntersection(
      sh0: DataFrame, cands0: DataFrame): DataFrame = {
    val sh = withDocSetSize(sh0)
    // cands is consumed three times (both legs of the doc restriction and
    // the final join); without materialization each consumer re-evaluates
    // the whole candidate-generation subtree (bands/windows/self-join).
    // The candidate set itself is tiny — bounded by the LSH bucket /
    // prefix collision counts — so eager localCheckpoint is nearly free,
    // and unlike persist() it leaves nothing in the SQL cache for callers
    // that never clearCache() (r7 VERDICT cache-leak class; the
    // [[simhashPairs]] discipline)
    val cands = cands0.localCheckpoint()
    // EXPLICIT broadcast of candDocs under
    // [[VerifyBroadcastMaxCandidates]] (r21, guide §3.1): a
    // localCheckpoint's size estimate inherits the pre-checkpoint
    // JOIN-subtree estimate (wildly high), so the planner demoted the
    // restriction join to SortMergeJoin — the one join here whose
    // PROBE side is the corpus-wide shingle frame. AQE converts it
    // back to broadcast at runtime, but only after the frame's
    // shuffle-write map stage has run — exactly the r11
    // demotion-trap bytes curve — so the hint is load-bearing at
    // scale. The OTHER verify joins (cands⋈inter, the two size
    // attaches) are candidate-bounded on BOTH sides at any corpus
    // size; hinting them too measured SLOWER locally (three more
    // sequential driver-side broadcast builds), so they stay with
    // AQE. Past the cap the join stays a shuffle by design.
    val small = cands.count() <= VerifyBroadcastMaxCandidates
    val candDocs0 = cands.select(col("i").as("doc_id"))
      .union(cands.select(col("j").as("doc_id"))).distinct()
    val candDocs = if (small) broadcast(candDocs0) else candDocs0
    val shCand = sh.join(candDocs, "doc_id").localCheckpoint()
    // |A|/|B| ride the co-shingle join as grouping-key passengers: the
    // shingle frame carries its per-doc set size map-side from the
    // scan ([[shingles]], r21), so the former RESTRICTED-frame size
    // aggregate and its two join-backs are gone — the partial agg
    // still reduces (i, j) groups map-side; the exchange carries two
    // extra longs per group. sz is functionally determined by the
    // doc id, so the group set is identical.
    val inter = shCand.select(col("doc_id").as("i"), col("s").as("sa"),
        col("sz").as("sz_i"))
      .join(shCand.select(col("doc_id").as("j"), col("s").as("sb"),
          col("sz").as("sz_j")),
        col("sa") === col("sb") && col("i") < col("j"))
      .groupBy("i", "j", "sz_i", "sz_j").agg(count(lit(1)).as("c"))
    cands.join(inter, Seq("i", "j"))
  }

  /** Exact-Jaccard verification of candidate (i, j) pairs: shared tail of
    * every candidate-generation strategy (LSH banding, prefix filtering). */
  private[graft] def verifyJaccardPairs(
      sh: DataFrame, cands0: DataFrame,
      t: Double = JaccardThreshold): DataFrame =
    candidateIntersection(sh, cands0)
      .withColumn("jaccard",
        col("c").cast("double") / (col("sz_i") + col("sz_j") - col("c")))
      .filter(col("jaccard") >= t)
      .select(col("i").as("doc_a"), col("j").as("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** Exact-containment verification of candidate (i, j) pairs — the
    * |A∩B| / min(|A|, |B|) twin of [[verifyJaccardPairs]] over the same
    * candidate-restricted intersection core. */
  private[graft] def verifyContainmentPairs(
      sh: DataFrame, cands0: DataFrame,
      t: Double = ContainmentThreshold): DataFrame =
    candidateIntersection(sh, cands0)
      .withColumn("containment",
        col("c").cast("double") / least(col("sz_i"), col("sz_j")))
      .filter(col("containment") >= t)
      .select(col("i").as("doc_a"), col("j").as("doc_b"),
        round(col("containment"), 6).as("containment"))
      .orderBy("doc_a", "doc_b")

  /** Containment pairs at scale — MinHash banding first, then
    * containment-verify the candidates: the executable scale path that
    * [[containmentPairs]]' guard points at (VERDICT r5 item 2). The
    * candidate join is bounded by LSH bucket occupancy; the verify stage
    * touches only candidate docs' shingles.
    *
    * Recall caveat, stated honestly: the banding is tuned for Jaccard ≥
    * [[JaccardThreshold]], and a SHORT doc quoted inside a much longer
    * one has high containment but LOW Jaccard, so its minhash signatures
    * collide with reduced probability — asymmetric pairs can be missed.
    * That is the standard recall/cost dial of banding-first containment
    * (production knobs: more bands / shorter rows, or banding partial
    * signatures of the small side). The DuckDB oracle replicates banding
    * + containment verify end-to-end, so the approximation itself is
    * cross-engine-checked exactly. */
  def containmentLshPairs(s: SparkSession, d: String): DataFrame =
    verifyContainmentPairs(shingles(s, d), minhashCandidates(s, d))

  /** LOSSLESS containment at scale — asymmetric prefix filtering
    * ([[containmentPrefixCandidates]]: each doc's df-rarest
    * `sz − ⌈t·sz⌉ + 1` shingles probed against the FULL inverted index;
    * pigeonhole on the smaller doc makes recall COMPLETE at
    * t = [[ContainmentThreshold]]), then the same candidate-restricted
    * containment verify. Result equals [[containmentPairs]] exactly, so
    * the oracle is literally the plain containment SQL — the same
    * strongest-form losslessness check as [[jaccardPrefixPairs]]. Use
    * this when recall matters (boilerplate/quote auditing);
    * [[containmentLshPairs]] when banding-bounded recall is acceptable
    * and candidates must be cheapest. */
  def containmentPrefixPairs(s: SparkSession, d: String): DataFrame = {
    assert(ContainmentThreshold == 3.0 / 5,
      "constants drifted: containment prefix arithmetic assumes t = 3/5")
    val sh = shinglesCached(s, d)
    verifyContainmentPairs(sh, containmentPrefixCandidates(sh, 3, 5))
  }

  /** Prefix-filtered candidate pairs for a RATIONAL Jaccard threshold
    * t = num/den — the generalization of the t = 4/5 arithmetic that
    * [[jaccardPrefixPairs]] shipped with (VERDICT r3 item 2).
    *
    * Shingles are totally ordered by (global document frequency, shingle)
    * — rarest first; each document indexes only its first
    * `sz − ⌈t·sz⌉ + 1` shingles. Pigeonhole (Bayardo et al., WWW'07 /
    * Xiao et al. PPJoin): two docs with J ≥ t must collide on an indexed
    * shingle, so recall is COMPLETE at any rational t. The ceiling is
    * exact-integer: ⌈num·sz/den⌉ = (num·sz + den − 1) div den for
    * positive sz — a float `t * sz` would round the prefix down at exact
    * multiples of den and silently lose pairs.
    *
    * Low thresholds necessarily index long prefixes (t = 3/100 keeps
    * ~97% of each doc) — that is the inherent recall/pruning dial of
    * prefix filtering, but the df-ASCENDING order still evicts exactly
    * the hyper-frequent shingles whose df² fan-out kills the naive join,
    * so the candidate join stays bounded where [[jaccardAll]] detonates. */
  /** The df-ascending prefix index shared by the prefix-filtered
    * candidate generators: each doc's first `sz − ⌈t·sz⌉ + 1` shingles
    * in (global document frequency, shingle) order — t = num/den in
    * exact integer arithmetic (see [[prefixCandidates]]). */
  private def prefixIndex(sh0: DataFrame, num: Int, den: Int): DataFrame = {
    require(num > 0 && num < den, s"threshold $num/$den not in (0,1)")
    val sh = withDocSetSize(sh0)
    // df via an unordered window over s instead of groupBy(s) + join
    // back (r21, guide §2.4): the join formulation paid Exchange(s) on
    // BOTH join legs plus the aggregate's own exchange; the window is
    // one Exchange(s) + sort over the same frame, same values.
    val wDoc = Window.partitionBy("doc_id").orderBy(asc("df"), asc("s"))
    // sz arrives map-side from the scan ([[shingles]], r21) — the
    // former unordered count window over doc_id shared the rank's
    // Exchange + Sort but still evaluated a second window function
    val ranked = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy("s")))
      .withColumn("pos", row_number().over(wDoc))
    ranked
      .filter(col("pos") <=
        expr(s"sz - (($num * sz + ${den - 1}) div $den) + 1"))
      .select("doc_id", "s")
  }

  private[graft] def prefixCandidates(sh: DataFrame, num: Int, den: Int): DataFrame = {
    // the self-join legs' identical window subtrees are unified at
    // runtime by AQE stage reuse (measured r21: an explicit
    // localCheckpoint here was ~equal-to-slower — the barrier costs
    // what the reuse already saves)
    val prefix = prefixIndex(sh, num, den)
    prefix.toDF("i", "sa")
      .join(prefix.toDF("j", "sb"),
        col("sa") === col("sb") && col("i") < col("j"))
      .select("i", "j").distinct()
  }

  /** ASYMMETRIC prefix-filtered candidates for CONTAINMENT ≥ num/den —
    * complete recall, unlike banding. Pigeonhole on the SMALLER doc S of
    * a qualifying pair: containment ≥ t means at most
    * |S| − ⌈t·|S|⌉ of S's shingles miss the other doc, so among any
    * |S| − ⌈t·|S|⌉ + 1 of them at least one is shared — S's df-rarest
    * prefix must collide with the other doc's FULL shingle set. Joining
    * every doc's prefix against the full inverted index (both roles, so
    * whichever side is smaller is covered) therefore finds every
    * qualifying pair. The df-ascending order keeps hyper-frequent
    * shingles out of every prefix, so the join's OUTPUT fan-out per
    * shingle is prefix_df(s) × df(s) — zero for the boilerplate
    * shingles that detonate the naive join (they are never the rarest);
    * the full side still shuffles hot keys, but scanning unmatched rows
    * is linear, not quadratic. At LOW thresholds the prefix approaches
    * the whole doc and this degrades toward the naive join — the same
    * inherent dial as Jaccard prefix filtering. */
  private[graft] def containmentPrefixCandidates(
      sh: DataFrame, num: Int, den: Int): DataFrame =
    prefixIndex(sh, num, den).toDF("x", "sa")
      .join(sh.select(col("doc_id").as("y"), col("s").as("sb")),
        col("sa") === col("sb") && col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("i"),
        greatest(col("x"), col("y")).as("j"))
      .distinct()

  /** Exact Jaccard ≥ 0.8 pairs via PREFIX FILTERING — the 100 TB path
    * for exact near-dup joins (the plain inverted-index join in
    * [[jaccardPairs]] is quadratic in per-shingle document frequency).
    *
    * Shingles are totally ordered by (global document frequency, shingle)
    * — rarest first; each document indexes only its first
    * `sz − ⌈t·sz⌉ + 1` shingles. Pigeonhole: two docs with J ≥ t must
    * share an indexed shingle, so recall is COMPLETE and the result
    * equals [[jaccardPairs]] exactly (the oracle is literally the same
    * SQL — the strongest possible losslessness check). Joining on rare
    * prefix shingles also caps join fan-out per shingle.
    *
    * The ⌈t·sz⌉ is computed in exact integer arithmetic via
    * [[prefixCandidates]] with t = 4/5 (= [[JaccardThreshold]]). */
  def jaccardPrefixPairs(s: SparkSession, d: String): DataFrame = {
    assert(JaccardThreshold == 4.0 / 5, "constants drifted: t must be 4/5")
    val sh = shinglesCached(s, d)
    verifyJaccardPairs(sh, prefixCandidates(sh, 4, 5))
  }

  /** Banding-quality AUDIT — the dedup twin of
    * [[Similarity.recallAtK]]: measures how much of the EXACT
    * near-dup pair set the MinHash band join actually surfaces, and how
    * selective its candidates are. Ground truth is the LOSSLESS
    * prefix-filtered Jaccard join (provably equal to the naive join, so
    * the truth side itself scales); candidates are the same band
    * collisions [[minhashLsh]] verifies. One summary row:
    * `pair_recall` = found/true (the banding miss rate is 1 − this) and
    * `cand_precision` = true/candidate (how much verify work the
    * banding wastes). This is the number a pipeline owner watches when
    * tuning bands×rows — recall too low means missed duplicates leak
    * into training; precision too low means the verify stage pays for
    * the banding's false positives.
    *
    * All three inputs are pair-set aggregates of scale-safe joins; the
    * combine is three singleton frames broadcast-joined — no data-sized
    * shuffle beyond the underlying joins themselves. */
  /** The lossless t=4/5 truth pair set as a shared materialized frame —
    * [[lshEval]] and [[bandingSweep]] audit against the SAME ground
    * truth, so it builds once per (session, corpus) exactly like the
    * cluster edge graphs (and lands in the parquet intermediate dir
    * when `SPARK_GRAFT_EDGE_DIR` is set). [[jaccardPrefixPairs]] stays
    * UNMEMOIZED on purpose: it is the canonical prefix-join operator
    * whose measured cost must reflect the real pipeline. */
  def truthPairsShared(s: SparkSession, d: String): DataFrame =
    sharedEdges(s, d, "truth") {
      val sh = shinglesCached(s, d)
      verifyJaccardPairs(sh, prefixCandidates(sh, 4, 5))
    }

  def lshEval(s: SparkSession, d: String): DataFrame = {
    val sh = shinglesCached(s, d)
    val truth = truthPairsShared(s, d)
      .select(col("doc_a").as("i"), col("doc_b").as("j"))
    val cands = minhashCandidatesOn(sh)
    val t = truth.agg(count(lit(1)).as("n_true"))
    val c = cands.agg(count(lit(1)).as("n_cand"))
    val h = truth.join(cands, Seq("i", "j"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    // degenerate-corpus guard (ADVICE r6): 0/0 is NaN in Spark but NULL
    // in DuckDB — an empty pair set must yield NULL ratios on BOTH
    // engines (the oracle wraps its denominators in NULLIF)
    t.crossJoin(broadcast(c)).crossJoin(broadcast(h))
      .select(col("n_true"), col("n_cand"), col("n_hit"),
        round(when(col("n_true") === 0, lit(null))
          .otherwise(col("n_hit").cast("double") / col("n_true")), 6)
          .as("pair_recall"),
        round(when(col("n_cand") === 0, lit(null))
          .otherwise(col("n_hit").cast("double") / col("n_cand")), 6)
          .as("cand_precision"))
  }

  /** Band counts [[bandingSweep]] evaluates (rows/band = K / bands). */
  val BandingConfigs: Seq[Int] = Seq(2, 4, 8, 16)

  /** BANDING-PARAMETER SWEEP — the LSH S-curve tuning table: for each
    * (bands × rows-per-band) factorization of the 16-hash signature,
    * the candidate volume and recall/precision against the SAME
    * lossless prefix-filtered truth set [[lshEval]] audits the
    * production config with. Few wide bands (2×8) collide only
    * near-identical docs (high precision, low recall); many narrow
    * bands (16×1) collide everything sharing ONE minhash (high recall,
    * candidate explosion) — this table is how a pipeline owner picks
    * the operating point before a 100 TB run, not after.
    *
    * Band keys for r > 2 rows are md5-60 of the '_'-joined minhash
    * values (the polynomial packing the 8×2 config uses would overflow
    * BIGINT at P³) — portable string arithmetic, replicated exactly in
    * the oracle.
    *
    * Scale: ONE signature build (per-doc agg over the shared shingle
    * frame) feeds all four configs; each config is a band/bkey
    * equi-join bounded by bucket occupancy; the truth set builds once
    * (lossless prefix filtering). Everything after is 1-row count
    * broadcasts. */
  def bandingSweep(s: SparkSession, d: String): DataFrame = {
    import MinHashParams.K
    val sh = shinglesCached(s, d)
    val sig = minhashSignaturesOn(sh).localCheckpoint()
    val truth = truthPairsShared(s, d)
      .select(col("doc_a").as("i"), col("doc_b").as("j"))
    val t = truth.agg(count(lit(1)).as("n_true"))
    val perConfig = BandingConfigs.map { nb =>
      val r = K / nb
      val keys = (0 until nb).map { b =>
        md5hash60(concat_ws("_",
          (0 until r).map(i => col(s"mh${b * r + i}")): _*))
      }
      val bands = sig.select(col("doc_id"),
        posexplode(array(keys: _*)).as(Seq("band", "bkey")))
      val cands = bands.toDF("i", "band", "bkey")
        .join(bands.toDF("j", "band2", "bkey2"),
          col("band") === col("band2") && col("bkey") === col("bkey2") &&
            col("i") < col("j"))
        .select("i", "j").distinct()
      val c = cands.agg(count(lit(1)).as("n_cand"))
      val h = truth.join(cands, Seq("i", "j"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      c.crossJoin(broadcast(h))
        .select(lit(nb).as("n_bands"), lit(r).as("rows_per_band"),
          col("n_cand"), col("n_hit"))
    }.reduce(_ union _)
    perConfig.crossJoin(broadcast(t))
      .select(col("n_bands"), col("rows_per_band"), col("n_cand"),
        col("n_hit"), col("n_true"),
        round(when(col("n_true") === 0, lit(null))
          .otherwise(col("n_hit").cast("double") / col("n_true")), 6)
          .as("pair_recall"),
        round(when(col("n_cand") === 0, lit(null))
          .otherwise(col("n_hit").cast("double") / col("n_cand")), 6)
          .as("cand_precision"))
      .orderBy("n_bands")
  }

  // ------------------------------------------------------------------
  // 4. SimHash
  // ------------------------------------------------------------------

  /** doc_id → 60-bit simhash over the token multiset (frequency-weighted:
    * every occurrence votes ±1 per bit). Uses the int[60]-buffer
    * [[graft.functions.SimHashAgg]] — the equivalent 60-column
    * `sum(when(...))` formulation overflows codegen method limits and
    * falls back to interpreted evaluation (5-28s vs sub-second at sf0.1). */
  def simhashSignatures(s: SparkSession, d: String): DataFrame =
    simhashSignaturesOn(Tables.documentsSpread(s, d))

  /** [[simhashSignatures]] over any (doc_id, text) frame. */
  private[graft] def simhashSignaturesOn(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(WordShingles(col("text"), 1)).as("w"))
    val h = toks.select(col("doc_id"), md5hash60(col("w")).as("hv"))
    h.groupBy("doc_id")
      .agg(graft.functions.SimHashAgg(col("hv")).as("simhash"))
  }

  /** Band-bucket occupancy guard for [[simhashPairs]]: each 12-bit band
    * has only 4096 buckets, so bucket occupancy grows LINEARLY with the
    * corpus and the band self-join emits occ² pairs per bucket — the
    * SimHash twin of the [[MaxNaiveShingleDf]] hazard (VERDICT r5).
    * Refuse rather than detonate. Production dials: WIDER bands (e.g.
    * 4 × 15-bit — still complete for hamming ≤ 3, 32k buckets per band),
    * pre-splitting hot buckets on extra signature bits, or switching to
    * [[minhashLsh]] whose band keys are drawn from the full shingle
    * space rather than a fixed 4096-bucket range. */
  val MaxSimHashBandBucket = 1000L

  /** Near-dup pairs with hamming(simhash) ≤ 4. Candidates from 5 × 12-bit
    * pigeonhole bands (≤ 4 differing bits can't touch all 5 bands, so
    * recall is COMPLETE, not probabilistic), then exact bit_count verify.
    * Guarded by [[MaxSimHashBandBucket]]. */
  def simhashPairs(s: SparkSession, d: String): DataFrame =
    simhashPairsOn(simhashSignaturesOn(Tables.documentsSpread(s, d)))

  /** [[simhashPairs]] over a precomputed (doc_id, simhash) frame. */
  private[graft] def simhashPairsOn(sig0: DataFrame): DataFrame = {
    // the signature frame feeds the occupancy guard plus both legs of the
    // band self-join; one row per doc, so materializing it is nearly
    // free. localCheckpoint, NOT persist: a persist entry would outlive
    // the call in the SQL cache for any library caller that never
    // clearCache()s (ADVICE r6) — checkpoint blocks are released with
    // the frame by the context cleaner
    val sig = sig0.localCheckpoint()
    val chunks = (0 until SimHashBands).map(b =>
      shiftright(col("simhash"), 12 * b).bitwiseAND(0xFFF))
    val bands = sig.select(col("doc_id"), col("simhash"),
      posexplode(array(chunks: _*)).as(Seq("band", "bkey")))
    val maxOcc = bands.groupBy("band", "bkey").agg(count(lit(1)).as("occ"))
      .agg(max("occ")).head().getLong(0)
    GraftRefusal.check(maxOcc <= MaxSimHashBandBucket,
      s"simhashPairs refused: max band-bucket occupancy $maxOcc > " +
        s"$MaxSimHashBandBucket (occupancy² fan-out per bucket); widen the " +
        "bands (4 x 15-bit) or use minhashLsh, whose band keys are not " +
        "confined to 4096 buckets")
    bands.toDF("i", "sim_i", "band", "bkey")
      .join(bands.toDF("j", "sim_j", "band2", "bkey2"),
        col("band") === col("band2") && col("bkey") === col("bkey2") &&
          col("i") < col("j"))
      .select(col("i"), col("j"),
        bit_count(col("sim_i").bitwiseXOR(col("sim_j"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= SimHashMaxHamming)
      .select(col("i").as("doc_a"), col("j").as("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------------------
  // 5. embedding cosine near-dup
  // ------------------------------------------------------------------

  /** Size guard for [[embeddingPairs]]: the brute pair join scores
    * n(n−1)/2 cosines — fine for a verification corpus, quadratic death
    * beyond it. Refuse rather than detonate; the scale paths are
    * [[embeddingLshPairs]] and [[Similarity]]'s bucketed ANN. */
  val MaxBrutePairVectors = 100000L

  /** Embedding pairs with cosine ≥ 0.45 — brute pair join (i < j).
    * Correctness baseline for [[embeddingLshPairs]] and [[Similarity]]'s
    * bucketed ANN; guarded by [[MaxBrutePairVectors]]. */
  def embeddingPairs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddingsSpread(s, d)
    val n = embeddingCorpusCount(s, d) // memoized metadata-only count
    GraftRefusal.check(n <= MaxBrutePairVectors,
      s"brute embeddingPairs refused: $n vectors > $MaxBrutePairVectors " +
        "(quadratic pair join); use embeddingLshPairs / Similarity ANN")
    val a = e.select(col("vec_id").as("i"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("j"), col("embedding").as("vb"))
    a.join(b, col("i") < col("j"))
      .withColumn("cos", CosineSimilarity(col("va"), col("vb")))
      .filter(col("cos") >= CosineThreshold)
      .select(col("i").as("vec_a"), col("j").as("vec_b"),
        round(col("cos"), 6).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** Embedding near-dup pairs, LSH-bucketed — the 100 TB path. Candidate
    * pairs share a sign-random-projection bucket in at least one of the
    * [[graft.functions.LshBuckets]] tables (bucket equi-join, never an
    * all-pairs join); candidates are then verified with the exact cosine.
    *
    * Recall is bounded by the bucketing, NOT complete — near-threshold
    * pairs that collide in no table are missed (the standard LSH
    * recall/cost dial: more tables/fewer bits → higher recall). The
    * bucketing is integer-quantized and deterministic, so the oracle
    * replicates the ENTIRE pipeline — candidates and verification — in
    * SQL: the approximation itself is cross-engine-checked exactly,
    * rather than pretending the operator equals the brute baseline. */
  def embeddingLshPairs(s: SparkSession, d: String): DataFrame =
    embeddingLshPairsOn(Tables.embeddings(s, d),
      graft.functions.LshBuckets.Tables, graft.functions.LshBuckets.Bits)

  /** Occupancy guard for the LSH candidate join (r8 — added after
    * `SCALING.json` MEASURED the fixed-geometry build superlinear, exp
    * 1.25 at ×16/×64): the in-bucket pair join emits occupancy² rows
    * per bucket, and with fixed `bits` occupancy grows linearly in n.
    * 20000² per bucket marks the tolerable ceiling (the
    * [[graft.operators.Curation.MaxPeakBucketOccupancy]] convention);
    * the refusal names the executable dial. At the measured ×64 corpus
    * (128 k vectors / 256 buckets ≈ 500 occupancy) the guard is nowhere
    * near firing — it exists for the ~5 M-vector zone where the
    * quadratic term detonates. */
  val MaxLshBucketOccupancy = 20000L

  /** The widened SRP geometry [[embeddingLshPairsWide]] runs: more
    * tables recover the recall the extra bits split away; plane
    * weights for a given (t, b, d) are shared with the default
    * geometry, so widening only SPLITS buckets. */
  val WideLshTables = 8
  val WideLshBits = 10

  /** [[embeddingLshPairs]] at the [[WideLshTables]]×[[WideLshBits]]
    * geometry — the executable form of the scale dial the default
    * geometry's guard points at (bucket count 2^10 per table bounds
    * occupancy at n/1024; grow `bits` with log₂(n)). Same verify, same
    * threshold; the oracle replicates the widened bucketing
    * end-to-end, so the different (deterministic) recall set is
    * hash-checked, not assumed. */
  def embeddingLshPairsWide(s: SparkSession, d: String): DataFrame =
    embeddingLshPairsOn(Tables.embeddings(s, d), WideLshTables, WideLshBits)

  private def embeddingLshPairsOn(
      e: DataFrame, tables: Int, bits: Int,
      broadcastVerify: Boolean = false): DataFrame =
    embeddingLshPairsOnBuckets(e,
      e.select(col("vec_id"),
        posexplode(graft.functions.LshBuckets(col("embedding"), tables, bits))
          .as(Seq("t", "bucket"))),
      s"$tables x $bits", broadcastVerify)

  /** Candidate-join + exact-cosine verify over a prepared
    * `(vec_id, t, bucket)` frame — shared by the per-table
    * ([[embeddingLshPairsOn]]) and AND-composed
    * ([[embeddingLshPairsCompositeOn]]) bucketings. The occupancy
    * guard is a scalar pre-aggregate (one row to the driver), never a
    * data-path collect. */
  /** Guarded candidate stage of [[embeddingLshPairsOnBuckets]] —
    * exposed (private[graft]) so the Scaling harness can measure the
    * candidate join's shuffle bytes SEPARATELY from the signature
    * explode and the verify join (VERDICT r9 item 2: the composite
    * build's ×64 bytes need a per-stage decomposition, not one
    * end-to-end number). */
  private[graft] def lshCandidatesOnBuckets(
      b: DataFrame, geomDesc: String): DataFrame = {
    val occRow = b.groupBy("t", "bucket").agg(count(lit(1)).as("n"))
      .agg(max("n")).head()
    val occ = if (occRow.isNullAt(0)) 0L else occRow.getLong(0)
    GraftRefusal.check(occ <= MaxLshBucketOccupancy,
      s"embeddingLshPairs refused: max bucket occupancy $occ > " +
        s"$MaxLshBucketOccupancy at $geomDesc (occupancy^2 pair " +
        "fan-out; SCALING.json measured this superlinear) - raise bits " +
        "toward log2(n) (embeddingLshPairsWide is the " +
        s"$WideLshTables x $WideLshBits form), or past the bits cap " +
        "AND-compose tables (embeddingLshPairsComposite)")
    b.toDF("i", "t", "bucket")
      .join(b.toDF("j", "t2", "bucket2"),
        col("t") === col("t2") && col("bucket") === col("bucket2") &&
          col("i") < col("j"))
      .select("i", "j").distinct()
  }

  /** Vector-side cap for BROADCASTING the verify join. The verify holds
    * TWO broadcast hash relations at once (both rename-projections of
    * the embedding table — the `a`/candidate side and the `b` side), so
    * the sizing budgets both: at 2 M vectors × 64 float dims each
    * relation is ~0.5 GiB raw, ~1.5 GiB as a built hash relation
    * (row objects + hash index ≈ 3× raw), ~3 GiB concurrent peak —
    * inside executor memory with headroom, and each relation far under
    * Spark's 8 GB broadcast hard limit. (The cap was 4 M in r11; the
    * scaladoc then budgeted ONE ~1 GiB relation, but the production
    * path ships two — near-cap corpora risked executor/driver OOM, so
    * the cap is halved to keep the documented math honest — ADVICE
    * r11.) The r11 stage decomposition
    * measured the ENTIRE superlinear byte curve of the shared
    * embedding-edge build in the verify stage — candidates grew
    * linearly (45→121→258 MiB across ×16/×32/×64) while the full
    * pairs jumped 47→2168→4528 MiB, because at ×32 the vector table
    * (64 k rows ≈ 20 MB) outgrew the 10 MB auto-broadcast threshold
    * and both verify joins demoted to shuffle joins, putting every
    * candidate row plus two embedding payloads on the wire. Under
    * this cap the verify side broadcasts by hint instead, so verify
    * bytes stay ~0 and total bytes track the candidate join's linear
    * curve; past it the shuffle join IS the design (bytes ∝
    * candidates · vec_size, linear in n) — a hint there would OOM
    * the driver, not help. Only the PRODUCTION paths (scaled dial +
    * composite) take the hint; the fixed/wide audit variants stay
    * un-hinted so the artifact keeps measuring the naive curves they
    * exist to demonstrate. */
  val VerifyBroadcastMaxVectors: Long = 2L * 1024 * 1024

  private def embeddingLshPairsOnBuckets(
      e: DataFrame, b: DataFrame, geomDesc: String,
      broadcastVerify: Boolean = false): DataFrame = {
    val cands = lshCandidatesOnBuckets(b, geomDesc)
    val a0 = e.select(col("vec_id").as("i"), col("embedding").as("va"))
    val c0 = e.select(col("vec_id").as("j"), col("embedding").as("vb"))
    val (a, c) =
      if (broadcastVerify) (broadcast(a0), broadcast(c0)) else (a0, c0)
    cands.join(a, "i").join(c, "j")
      .withColumn("cos", CosineSimilarity(col("va"), col("vb")))
      .filter(col("cos") >= CosineLshThreshold)
      .select(col("i").as("vec_a"), col("j").as("vec_b"),
        round(col("cos"), 6).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** Target EXPECTED bucket occupancy for [[scaledLshGeometry]]: the
    * in-bucket pair join does ~occupancy²/2 cosine verifies per bucket,
    * so bounding expected occupancy at a constant keeps total candidate
    * work ~linear in n (buckets ∝ n, occupancy² constant). 32 keeps the
    * verify fan-out per bucket ≈ 500 pairs — far under the
    * [[MaxLshBucketOccupancy]] refusal ceiling, which remains the
    * backstop for skewed (non-expected) occupancy. */
  val ScaledLshTargetOccupancy = 32L

  /** Corpus sizes the [[lshGeometry]] audit projects the dial across, in
    * addition to the actual corpus count — exercises every branch
    * (default floor, the growth zone, the [[graft.functions.LshBuckets.MaxBits]]
    * cap where sharding takes over) regardless of fixture size. */
  val LshGeometryProjectedSizes: Seq[Long] =
    Seq(1000L, 10000L, 100000L, 1000000L, 10000000L, 100000000L, 1000000000L)

  /** The n-ADAPTIVE SRP geometry — the executable form of the scale dial
    * the fixed-geometry guard points at, now applied automatically:
    * smallest `bits` in [[graft.functions.LshBuckets.Bits]]..
    * [[graft.functions.LshBuckets.MaxBits]] with
    * n ≤ [[ScaledLshTargetOccupancy]]·2^bits (i.e. bits grows with
    * log₂(n)); `tables` widens to the maximum once bits exceed the
    * default, recovering the recall the extra bits split away (the
    * [[WideLshTables]] rationale). Past the cap
    * ([[LshCompositeCapVectors]], n > 32·2^16 ≈ 2M) this per-table
    * geometry is exhausted and [[embeddingLshPairsScaled]] switches to
    * the AND-composed bucketing ([[embeddingLshPairsComposite]], r9 —
    * formerly the occupancy guard's "shard the corpus" refusal
    * branch). Pure integer arithmetic, shared with the
    * `dedup_lsh_geometry` oracle. */
  def scaledLshGeometry(n: Long): (Int, Int) = {
    import graft.functions.LshBuckets.{Bits, MaxBits, Tables}
    val bits = (Bits to MaxBits)
      .find(b => n <= (ScaledLshTargetOccupancy << b)).getOrElse(MaxBits)
    // widen to WideLshTables (the per-table ceiling — r13: no longer
    // LshBuckets.MaxTables, which grew to host the composite branch's
    // 16 base signatures; the per-table geometry keeps its measured 8)
    (if (bits > Bits) WideLshTables else Tables, bits)
  }

  /** AND-composition arity for the PAST-CAP branch of the geometry
    * dial: pairs of [[graft.functions.LshBuckets.MaxBits]]-bit tables
    * are concatenated into one composite key of 2×16 = 32 effective
    * bits, so bucket count jumps from 2^16 to 2^32 without any new
    * plane machinery (the composite key of a pair is bit-identical
    * across engines because each half is). The standard LSH AND/OR
    * trade: per-composite-table collision probability is p² instead
    * of p (lower recall per table — measured by the `composite` leg of
    * `dedup_lsh_geometry_eval`), in exchange for occupancy bounded by
    * n/2^32 (capacity to ~32·2^32 ≈ 137 G vectors per corpus). */
  val CompositeLshArity = 2

  /** Number of AND-composed tables the past-cap branch draws — the
    * OR-amplification dial the recall floor's scaladoc names, widened
    * 4 → 8 in r13 on a MEASURED miss: the first 5 M-vector
    * cap-crossing run (SCALING.json `recall_x2517`) recovered only
    * 0.414 of the ≥0.9-cosine planted twins with 4 composite tables —
    * below the declared [[CompositeRecallFloor]] of 0.5. Each
    * composite table is an independent 1−(1−p^32) draw (p = 1−θ/π per
    * plane), so recall_T = E[1−(1−p^32)^T] over the twin-cosine
    * distribution: numerically 0.447/0.521/0.574 at T = 4/6/8 for the
    * synthetic corpus shape, i.e. T = 6 lands ON the floor and T = 8
    * clears it with margin (measured after the change: 0.5336 at
    * 5.03 M — SCALING.json `recall_x2517`; the ~0.04 gap to the
    * continuous-plane expectation matches the T = 4 calibration, the
    * quantized integer planes' discreteness). The
    * per-composite-key cost is unchanged (same
    * 2×16-bit key space, same occupancy bound n/2^32); signature and
    * candidate volume scale linearly with T — the documented trade.
    * Draws [[CompositeLshArity]]·this base tables, which
    * [[graft.functions.LshBuckets.MaxTables]] must accommodate. */
  val CompositeLshTables = 8

  /** Corpus size beyond which [[scaledLshGeometry]]'s bits cap is
    * exceeded (expected occupancy at the widest per-table geometry
    * passes [[ScaledLshTargetOccupancy]]) and the dial switches to the
    * AND-composed bucketing: 32·2^16 ≈ 2.1 M vectors. NOT reachable by
    * the inflation fixtures (the ×64 corpus is 2000·64 = 128 k vectors
    * — an earlier revision of this doc claimed 4.2 M, off by the 65 k
    * base count of a different table), so SCALING.json measures the
    * composite branch through its own first-class rows
    * (`dedup_embedding_lsh_composite` + the `composite_stage_*`
    * prefixes), never through the shared build. */
  val LshCompositeCapVectors: Long =
    ScaledLshTargetOccupancy << graft.functions.LshBuckets.MaxBits

  /** [[embeddingLshPairs]] at the AND-composed bucketing — the
    * executable form of the occupancy guard's former "shard the
    * corpus" refusal branch: [[CompositeLshTables]]·[[CompositeLshArity]]
    * base tables at the bits cap, composed pairwise into
    * [[CompositeLshTables]] composite tables whose key is
    * `(bucket[2k] << MaxBits) | bucket[2k+1]`. Same candidate
    * equi-join, same exact-cosine verify, same threshold; the oracle
    * replicates the composition in SQL, so the (deterministically)
    * different recall set is hash-checked, not assumed. */
  def embeddingLshPairsComposite(s: SparkSession, d: String): DataFrame =
    embeddingLshPairsCompositeOn(Tables.embeddings(s, d),
      broadcastVerify =
        embeddingCorpusCount(s, d) <= VerifyBroadcastMaxVectors)

  /** Every [[CompositePlantStride]]-th vector gets a planted
    * near-identical twin in [[plantedNearDupCorpus]], id-shifted by
    * this offset. */
  val CompositePlantStride = 5L
  val CompositePlantIdOffset = 1000000L

  /** DECLARED recall floor for the AND-composed bucketing in its
    * target regime (VERDICT r10 item 8): of the planted twins whose
    * true cosine is at least [[CompositeRecallFloorCosine]], the
    * [[CompositeLshTables]] composite tables must recover at
    * least this fraction (asserted by `SimilaritySpec` at fixture
    * scale AND measured at 5 M vectors by the Scaling harness's
    * `recall_x{F}` column, which caught the 4-table geometry at 0.414
    * — the r13 widening to 8). The recovery dial is
    * OR-amplification: each extra composite table is an independent
    * 1−(1−p²) draw, so T tables recover 1−(1−p²)^T of pairs at
    * per-plane agreement p — more tables buy recall at linear
    * signature cost without touching the 2×[[graft.functions.LshBuckets.MaxBits]]-bit
    * occupancy bound. */
  val CompositeRecallFloor = 0.5
  val CompositeRecallFloorCosine = 0.9

  /** The corpus augmented with DETERMINISTIC near-identical twins:
    * every [[CompositePlantStride]]-th vector is copied with component
    * `vec_id % dims` negated. IEEE-754 negation is exact, so the
    * derived corpus — and everything downstream of its quantization —
    * is bit-identical across engines; the resulting twin cosines span
    * ~0.76–1.0 (one flipped component of a 64-dim vector), i.e. the
    * near-identical regime the composite bucketing exists for. */
  private[graft] def plantedNearDupCorpus(e: DataFrame): DataFrame =
    e.select("vec_id", "embedding").unionByName(
      e.filter(col("vec_id") % CompositePlantStride === 0)
        .select((col("vec_id") + CompositePlantIdOffset).as("vec_id"),
          expr("transform(embedding, (x, i) -> " +
            "IF(i = cast(vec_id % size(embedding) as int), -x, x))")
            .as("embedding")))

  /** [[embeddingLshPairsComposite]] over the plant-augmented corpus —
    * the ORACLE-FACING recall harness for the composite branch. The
    * raw fixture corpus has no near-identical pairs (max cosine 0.449
    * at sf0.01), so composite keys legitimately find nothing there
    * (that zero is itself hash-checked by the `composite` leg of
    * `dedup_lsh_geometry_eval`); THIS query plants twins in the regime
    * the composition is for and hash-checks exactly which of them the
    * 32-bit AND keys recover (52 of 100 at sf0.01). Same operator
    * code path, derived input — the [[dupSnapshotDiff]] pattern. */
  def embeddingLshPairsCompositePlanted(
      s: SparkSession, d: String): DataFrame = {
    // the plant adds n/stride twins; keep the broadcast decision on
    // the AUGMENTED count so the hint can never overshoot the cap
    val n = embeddingCorpusCount(s, d)
    embeddingLshPairsCompositeOn(plantedNearDupCorpus(Tables.embeddings(s, d)),
      broadcastVerify =
        n + n / CompositePlantStride <= VerifyBroadcastMaxVectors)
  }

  /** The AND-composed (vec_id, t, bucket) signature frame — stage 1 of
    * [[embeddingLshPairsCompositeOn]], exposed for the Scaling stage
    * decomposition (VERDICT r9 item 2). */
  private[graft] def compositeBuckets(e: DataFrame): DataFrame =
    compositeBucketsAt(e, CompositeLshTables)

  /** [[compositeBuckets]] at an arbitrary composite-table count — the
    * OR-amplification dial as a parameter, for the Scaling harness's
    * recall/cost trade-off rows (VERDICT r13 item 4: the shipped
    * T = 8 operating point measured 0.5336 recall against the 0.5
    * floor with a 6.7% margin; T = 12/16 are the next notches,
    * expected ~0.66/~0.74 by 1−(1−p^32)^T). Plane weights are
    * index-determined (md5 of (t, b, d) — [[graft.functions.LshBuckets]]),
    * so table k's planes are IDENTICAL at every T: widening only adds
    * tables, never perturbs existing buckets — the same property the
    * r13 4→8 widening relied on to keep every oracle result
    * byte-identical. Production paths always pass
    * [[CompositeLshTables]]. */
  private[graft] def compositeBucketsAt(e: DataFrame, tables: Int): DataFrame = {
    import graft.functions.LshBuckets.MaxBits
    val baseTables = tables * CompositeLshArity
    e.withColumn("bkts",
        graft.functions.LshBuckets(col("embedding"), baseTables, MaxBits))
      .select(col("vec_id"),
        posexplode(array((0 until tables).map { k =>
          expr(s"shiftleft(element_at(bkts, ${2 * k + 1}), $MaxBits) + " +
            s"element_at(bkts, ${2 * k + 2})")
        }: _*)).as(Seq("t", "bucket")))
  }

  private[graft] def compositeGeomDesc: String =
    compositeGeomDescAt(CompositeLshTables)

  private[graft] def compositeGeomDescAt(tables: Int): String = {
    import graft.functions.LshBuckets.MaxBits
    s"$tables composite tables of ${CompositeLshArity}x$MaxBits bits"
  }

  private def embeddingLshPairsCompositeOn(e: DataFrame,
      broadcastVerify: Boolean = false): DataFrame =
    embeddingLshPairsCompositeAtOn(e, CompositeLshTables, broadcastVerify)

  /** The composite pipeline at an arbitrary table count — Scaling
    * trade-off rows only (see [[compositeBucketsAt]]). */
  private[graft] def embeddingLshPairsCompositeAtOn(e: DataFrame,
      tables: Int, broadcastVerify: Boolean): DataFrame =
    embeddingLshPairsOnBuckets(e, compositeBucketsAt(e, tables),
      compositeGeomDescAt(tables), broadcastVerify)

  /** The per-table `(vec_id, t, bucket)` signature frame at the
    * corpus' [[scaledLshGeometry]] — stage 1 of
    * [[embeddingLshPairsScaled]] BELOW the composite cap, exposed for
    * the Scaling stage decomposition. The r9-r10 scaling artifacts
    * fitted `shared_embedding_edges`' shuffle bytes superlinear
    * (exp 2.0-2.3) with a single end-to-end number per factor; these
    * stage prefixes split that volume into signature explode vs
    * candidate join vs verify so the regime step (the candidate join's
    * broadcast→shuffle demotion as the signature frame outgrows the
    * 10 MB threshold) is measured, not conjectured. */
  private[graft] def scaledBuckets(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val (t, b) = scaledLshGeometry(embeddingCorpusCount(s, d))
    e.select(col("vec_id"),
      posexplode(graft.functions.LshBuckets(col("embedding"), t, b))
        .as(Seq("t", "bucket")))
  }

  private[graft] def scaledGeomDesc(s: SparkSession, d: String): String =
    scaledGeomDescFor(embeddingCorpusCount(s, d))

  private[graft] def scaledGeomDescFor(n: Long): String = {
    val (t, b) = scaledLshGeometry(n)
    s"scaled $t x $b"
  }

  /** [[embeddingLshPairs]] at the [[scaledLshGeometry]] for the corpus'
    * actual size — the production default (and since r9 what
    * [[embeddingEdgesShared]] builds): geometry tracks the corpus so
    * candidate work stays linear (SCALING.json measured the FIXED
    * geometry superlinear, exp 1.12 at ×64; this build measured 0.76 in
    * the same artifact — `shared_embedding_edges` vs the
    * `shared_embedding_edges_fixed` audit variant). At fixture sizes
    * (n ≤ 8192) the dial resolves to the default geometry, so this is
    * oracle-covered by `dedup_embedding_lsh` + the `dedup_lsh_geometry`
    * audit. */
  def embeddingLshPairsScaled(s: SparkSession, d: String): DataFrame =
    // memoized parquet row-count metadata — one job per (session, corpus)
    embeddingLshPairsScaledOn(Tables.embeddings(s, d),
      embeddingCorpusCount(s, d))

  /** [[embeddingLshPairsScaled]] over an arbitrary (vec_id, embedding)
    * frame of known size n — the dial itself, split from the
    * corpus-dir loader so the Scaling harness can drive the past-cap
    * branch on a synthetic corpus LARGER than any inflation fixture
    * reaches (the ×64 fixture tops out at 128 k vectors; the composite
    * cap sits at ~2.1 M — VERDICT r11 item 4). Every branch decision
    * (composite switch, verify-broadcast hint) fires on the PASSED n,
    * exactly as the production entry point. */
  private[graft] def embeddingLshPairsScaledOn(
      e: DataFrame, n: Long): DataFrame =
    if (n > LshCompositeCapVectors)
      embeddingLshPairsCompositeOn(e,
        broadcastVerify = n <= VerifyBroadcastMaxVectors)
    else {
      // the composite cap (32·2^16) and the broadcast cap (2·2^20)
      // happen to coincide at exactly 2,097,152 vectors, so every
      // per-table corpus is broadcastable today — but the gate is
      // explicit rather than a hardcoded `true` so retuning EITHER
      // constant can never silently hint an over-cap broadcast
      val (t, b) = scaledLshGeometry(n)
      embeddingLshPairsOn(e, t, b,
        broadcastVerify = n <= VerifyBroadcastMaxVectors)
    }

  /** RECALL SIDE of the geometry dial — SCALING.json measures what the
    * widened geometry SAVES (exp 1.12 → 0.76); this measures what it
    * COSTS: for the default, wide, and AND-composed SRP geometries,
    * the bucket-join candidate count (the work), the verified pair
    * count, and recall
    * vs the brute-force truth set at the same threshold (pairs the
    * bucketing never collides are the loss; precision is 1 by
    * construction since every candidate is exact-cosine verified).
    * Guarded by [[MaxBrutePairVectors]] — the truth set is the
    * quadratic audit baseline, so this is an AUDIT-SLICE query, never
    * the production path.
    *
    * Scale note: run it on a bounded sample of the corpus (the
    * standard recall-estimation move); the audited quantities
    * themselves are corpus-size-free ratios. */
  def lshGeometryEval(s: SparkSession, d: String): DataFrame = {
    import graft.functions.LshBuckets
    val e = Tables.embeddings(s, d)
    val n = embeddingCorpusCount(s, d) // memoized metadata-only count
    GraftRefusal.check(n <= MaxBrutePairVectors,
      s"lshGeometryEval refused: $n vectors > $MaxBrutePairVectors " +
        "(the truth set is a brute pair join); run on an audit sample")
    val a = e.select(col("vec_id").as("i"), col("embedding").as("va"))
    val b2 = e.select(col("vec_id").as("j"), col("embedding").as("vb"))
    val truth = a.join(b2, col("i") < col("j"))
      .filter(CosineSimilarity(col("va"), col("vb")) >= CosineLshThreshold)
      .agg(count(lit(1)).as("n_truth"))
    def legOn(bkt: DataFrame, tables: Int, bits: Int,
        name: String): DataFrame = {
      val cands = bkt.toDF("i", "t", "bucket")
        .join(bkt.toDF("j", "t2", "bucket2"),
          col("t") === col("t2") && col("bucket") === col("bucket2") &&
            col("i") < col("j"))
        .select("i", "j").distinct()
      val verified = cands.join(a, "i").join(b2, "j")
        .filter(CosineSimilarity(col("va"), col("vb")) >= CosineLshThreshold)
      cands.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(broadcast(verified.agg(count(lit(1)).as("n_pairs"))))
        .select(lit(name).as("geometry"),
          lit(tables).cast("int").as("lsh_tables"),
          lit(bits).cast("int").as("lsh_bits"),
          col("n_candidates"), col("n_pairs"))
    }
    def leg(tables: Int, bits: Int, name: String): DataFrame =
      legOn(e.select(col("vec_id"),
        posexplode(LshBuckets(col("embedding"), tables, bits))
          .as(Seq("t", "bucket"))), tables, bits, name)
    // the past-cap AND-composed bucketing: what composition COSTS in
    // recall (p^2 per composite table) is a measured leg, not prose —
    // reported at its EFFECTIVE geometry (CompositeLshTables tables of
    // arity*MaxBits-bit keys)
    val compositeLeg = {
      import LshBuckets.MaxBits
      val baseTables = CompositeLshTables * CompositeLshArity
      legOn(e.withColumn("bkts",
          LshBuckets(col("embedding"), baseTables, MaxBits))
        .select(col("vec_id"),
          posexplode(array((0 until CompositeLshTables).map {
            k => expr(s"shiftleft(element_at(bkts, ${2 * k + 1}), $MaxBits) " +
              s"+ element_at(bkts, ${2 * k + 2})")
          }: _*)).as(Seq("t", "bucket"))),
        CompositeLshTables, CompositeLshArity * MaxBits, "composite")
    }
    leg(LshBuckets.Tables, LshBuckets.Bits, "default")
      .unionByName(leg(WideLshTables, WideLshBits, "wide"))
      .unionByName(compositeLeg)
      .crossJoin(broadcast(truth))
      .withColumn("recall_ppm",
        expr("n_pairs * 1000000 div nullif(n_truth, 0)"))
      .orderBy("geometry")
  }

  /** Geometry-dial audit: one row per corpus size (the actual count plus
    * [[LshGeometryProjectedSizes]]) with the [[scaledLshGeometry]] the
    * dial selects, the resulting per-table occupancy ceiling, and
    * whether that clears the [[MaxLshBucketOccupancy]] guard. All
    * integer arithmetic (shiftleft / integer div), replicated exactly by
    * the DuckDB oracle — this makes the SCALE story itself a
    * hash-checked first-class result rather than scaladoc prose. */
  def lshGeometry(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.LshBuckets.{Bits, MaxBits, Tables => DefTables}
    val actual = Tables.embeddings(s, d)
      .agg(count(lit(1)).cast("long").as("n_vectors"))
      .withColumn("scope", lit("corpus"))
    val projected = LshGeometryProjectedSizes.toDF("n_vectors")
      .withColumn("scope", lit("projected"))
    actual.select("scope", "n_vectors")
      .unionByName(projected.select("scope", "n_vectors"))
      .withColumn("lsh_bits", expr(
        s"cast(coalesce(array_min(filter(sequence($Bits, $MaxBits), " +
          s"b -> n_vectors <= shiftleft(cast($ScaledLshTargetOccupancy as bigint), b))), " +
          s"$MaxBits) as int)"))
      // past LshCompositeCapVectors the per-table dial is exhausted and
      // the shipped build is the AND-composed bucketing (r9): pairs of
      // MaxBits tables concatenate into arity*MaxBits-bit keys
      .withColumn("composite_arity",
        when(col("n_vectors") > LshCompositeCapVectors, CompositeLshArity)
          .otherwise(1).cast("int"))
      .withColumn("lsh_tables",
        when(col("composite_arity") > 1, CompositeLshTables)
          .when(col("lsh_bits") > Bits, WideLshTables)
          .otherwise(DefTables).cast("int"))
      .withColumn("effective_bits",
        (col("composite_arity") * col("lsh_bits")).cast("int"))
      .withColumn("occupancy_bound", expr(
        "cast((n_vectors + shiftleft(cast(1 as bigint), effective_bits) - 1) " +
          "div shiftleft(cast(1 as bigint), effective_bits) as bigint)"))
      .withColumn("within_guard",
        (col("occupancy_bound") <= MaxLshBucketOccupancy).cast("int"))
      .select("scope", "n_vectors", "lsh_tables", "lsh_bits",
        "composite_arity", "effective_bits", "occupancy_bound",
        "within_guard")
      .orderBy("n_vectors", "scope")
  }

  // ------------------------------------------------------------------
  // 6. near-dup clustering (connected components over the pair graph)
  // ------------------------------------------------------------------

  /** Edge threshold for [[nearDupClusters]]: low enough that background
    * inter-document similarity (≤0.07 between non-planted fixture docs)
    * chains pairs into multi-hop components — at sf0.01 the graph has a
    * 6-node component — so the TRANSITIVE closure is actually exercised,
    * not just echoed pairs. Shared with the oracle SQL. */
  val ClusterJaccardThreshold = 0.03

  /** Convergence backstop for [[connectedComponents]]. Hook+jump halves
    * pointer-chain depth per round (O(log diameter)); 50 rounds covers a
    * diameter beyond 2^49 — hitting this is a bug, not a big graph. */
  val MaxCcIterations = 50

  /** Connected components over an undirected edge list (columns `a`, `b`)
    * → one row per node: (`v`, `cluster_id` = min node id reachable).
    *
    * Algorithm: alternating min-label HOOK and pointer-JUMP rounds —
    * the MapReduce-style iterative CC (cf. Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14):
    *
    *  - hook: lbl(v) ← min(lbl over v's closed neighborhood) — one
    *    shuffle on edge dst + one hash aggregate on src;
    *  - jump: lbl(v) ← lbl(lbl(v)) — path halving via a labels
    *    self-join, so convergence needs O(log diameter) rounds, not
    *    O(diameter) as plain propagation would.
    *
    * Fixpoint = correct: when no label changes, hook implies
    * lbl(u) ≤ lbl(v) for every edge both ways, so labels are constant
    * per component and the component min labels itself.
    *
    * Scale: state is ONE row per node (far smaller than the pair/shingle
    * frames feeding it); each round is two key-equi joins + an aggregate,
    * all shuffle-partitionable. `localCheckpoint()` per round truncates
    * the lineage (the plan otherwise doubles per iteration — SCALE.md).
    * The per-round driver scalar is the convergence count only. */
  def connectedComponents(
      edges: DataFrame, maxIters: Int = MaxCcIterations): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .transform(Checkpoints.iter) // consumed once per round: cut off the
                         // (possibly expensive) candidate-gen lineage
    val nodes = und.select(col("a").as("v")).distinct()
    var labels = nodes.select(col("v"), col("v").as("lbl"))
      .transform(Checkpoints.iter)
    var changed = 1L
    var iter = 0
    while (changed > 0) {
      require(iter < maxIters,
        s"connectedComponents did not converge in $maxIters rounds")
      val nbrMin = und.join(labels, col("b") === col("v"))
        .groupBy(col("a")).agg(min("lbl").as("nmin"))
        .toDF("hv", "nmin")
      // the start-of-round label rides along as `prev`, so the
      // convergence count can be observed DURING the checkpoint action
      // below instead of needing a separate job (see `obs`)
      val hooked = labels.join(nbrMin, col("v") === col("hv"), "left")
        .select(col("v"), col("lbl").as("prev"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
      // jump: labels only ever point to SMALLER ids in the same
      // component, so lbl(lbl(v)) is a valid (≤) label for v
      // convergence count via the Observation API: the side-effect
      // aggregate rides the SAME checkpoint action that materializes the
      // round, so each round is ONE Spark job — the previous
      // filter+count over the checkpointed frame was a second job per
      // round (VERDICT r4 item 5; job count pinned by CcJobCountSpec)
      val obs = org.apache.spark.sql.Observation()
      val jumped = hooked.join(
          hooked.select(col("v").as("jv"), col("lbl").as("jlbl")),
          col("lbl") === col("jv"), "left")
        .select(col("v"), col("prev"),
          coalesce(col("jlbl"), col("lbl")).as("lbl"))
        .observe(obs, count(when(col("lbl") =!= col("prev"), 1)).as("chg"))
        .transform(Checkpoints.iter)
      changed = obs.get("chg").asInstanceOf[Long]
      labels = jumped.select("v", "lbl")
      iter += 1
    }
    labels.select(col("v"), col("lbl").as("cluster_id"))
  }

  /** Near-dup clusters: connected components over the Jaccard pair graph
    * at [[ClusterJaccardThreshold]], with the component min as the
    * canonical `cluster_id`, the component size, and the representative
    * flag (`keep` = this doc survives dedup) — the standard
    * "collapse each near-dup cluster to one document" curation step.
    * Docs with no near-dup edge are implicitly their own singleton
    * cluster and are omitted (at corpus scale they are ~all rows). */
  /** The near-dup edge list at [[ClusterJaccardThreshold]], generated
    * through the SCALE path (r4): prefix-filtered candidates at rational
    * t = 3/100 + candidate-restricted verify, replacing the guarded
    * naive jaccardAll whose df-guard would refuse corpus-scale inputs.
    * Prefix filtering is lossless (complete recall), so oracles that
    * threshold exact Jaccard — blind to candidate generation — see the
    * identical graph. Shared by [[nearDupClusters]] and the
    * quality-propagation operator. */
  def nearDupEdges(s: SparkSession, d: String): DataFrame = {
    assert(ClusterJaccardThreshold == 3.0 / 100,
      "constants drifted: cluster edge prefix arithmetic assumes t = 3/100")
    val sh = shinglesCached(s, d)
    verifyJaccardPairs(sh, prefixCandidates(sh, 3, 100),
        ClusterJaccardThreshold)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
  }

  /** [[nearDupEdges]], MATERIALIZED ONCE per (session, corpus dir) and
    * shared by every consumer — the repo's two most expensive queries
    * (exact clustering and quality propagation) both consume this exact
    * graph, and a real pipeline builds a shared intermediate once rather
    * than re-deriving it from raw text per downstream job (VERDICT r4
    * item 1). `localCheckpoint` pins the tiny edge list (hundreds of
    * rows at fixture scale; ≪ corpus at any scale) in the block manager,
    * outside the SQL cache, so consumers see a scan of materialized
    * blocks instead of the full shingle→prefix→verify pipeline. On a
    * cluster the same role is played by writing the edge frame to a
    * parquet intermediate ([[graft.sources.Bucketing]]-style) — the
    * memoization here is the single-JVM analog. */
  private val sharedEdgeCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Memo of the embeddings corpus row count per (session, dir) — the
    * geometry-aware entry points ([[embeddingLshPairsScaled]],
    * [[lshGeometryEval]], [[embeddingPairs]]'s guard) each need n, and
    * the count, while metadata-only over parquet, is still one Spark
    * job per call; memoizing mirrors [[sharedEdgeCache]]'s contract so
    * a session pays ONE count job per corpus, not one per geometry
    * lookup (VERDICT r8 item 5). Keyed by a data-file fingerprint
    * ([[embeddingsFingerprint]]) so a corpus dir rewritten mid-session
    * is a NEW key — the refusal guards always see the current corpus'
    * count, never a stale smaller one (ADVICE r9). */
  private val corpusCountCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), java.lang.Long]()

  /** Metadata fingerprint of the corpus' embeddings data files (length +
    * mtime of every file under the parquet path, FNV-1a-combined) — keys
    * the count memo so a corpus dir REWRITTEN mid-session gets a fresh
    * count instead of serving [[embeddingPairs]]' refusal guard a stale,
    * possibly smaller n (ADVICE r9). Driver-side FileSystem metadata
    * only, never a Spark job, so the memo's one-action contract
    * ([[CorpusCountMemoSpec]]) holds unchanged; superseded entries leak
    * one Long each, the [[sharedEdgeCache]] staleness trade. */
  private def embeddingsFingerprint(s: SparkSession, d: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      var h = 0xcbf29ce484222325L
      def mix(v: Long): Unit = { h ^= v; h *= 0x100000001b3L }
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) {
        val st = it.next()
        mix(st.getLen); mix(st.getModificationTime); n += 1
      }
      mix(n)
      java.lang.Long.toHexString(h)
    }
  }

  private[graft] def embeddingCorpusCount(s: SparkSession, d: String): Long =
    corpusCountCache.computeIfAbsent((s, d, embeddingsFingerprint(s, d)),
      _ => Tables.embeddings(s, d).count())

  /** When set (env `SPARK_GRAFT_EDGE_DIR`; overridable for tests), the
    * shared edge graphs are materialized as PARQUET INTERMEDIATES under
    * this directory instead of localCheckpoint blocks: the first builder
    * writes `edges_<kind>_<md5(corpusDir)>/`, every consumer — including
    * consumers in OTHER sessions or later JVMs — reads the parquet back.
    * This is the cluster-grade form the memo scaladoc promised (VERDICT
    * r5 item 5): on a real cluster the edge graph is a job output that
    * downstream jobs scan, not driver-pinned blocks. Path is keyed by
    * corpus dir, so two corpora never collide; a REWRITTEN corpus dir
    * requires clearing the scratch dir (same contract as any derived
    * dataset). */
  @volatile private[graft] var edgeScratchDir: Option[String] =
    sys.env.get("SPARK_GRAFT_EDGE_DIR")

  /** Memoization contract: the edge frame is bound to the (session, dir)
    * that built it — a frame cached for a STOPPED session references
    * dead block-manager RDDs (a restarted session is a new key, so the
    * stale entry is only a few-hundred-row leak, never served), and a
    * corpus dir REWRITTEN mid-session would serve pre-rewrite edges.
    * Both are non-events for the driver harnesses (one session per JVM,
    * immutable fixture dirs); a long-lived application should set
    * [[edgeScratchDir]] and treat the materialized edge parquet, not
    * this memo, as the shared artifact. */
  private def sharedEdges(s: SparkSession, d: String, kind: String)
      (build: => DataFrame): DataFrame =
    sharedEdgeCache.computeIfAbsent((s, d, kind), _ =>
      edgeScratchDir match {
        case Some(root) => readEdges(s, root, d, kind)(build)
        case None       => build.localCheckpoint()
      })

  /** Drops one (session, corpus, kind) edge memo AND its materialized
    * parquet intermediate (when [[edgeScratchDir]] is set), so the next
    * [[sharedEdges]] call pays the FULL build again. Measurement
    * harness hook (VERDICT r11 item 3): shared builds run exactly once
    * per factor and memoize, so a single JIT-deopt storm becomes the
    * committed number with no min-of-N escape — the Scaling harness
    * invalidates and rebuilds at the big factors and keeps the min.
    * Never a production call: consumers WANT the memo. */
  private[graft] def invalidateSharedEdges(
      s: SparkSession, d: String, kind: String): Unit = {
    // unpersist the dropped memo's localCheckpoint blocks (no-op for
    // the parquet-reader memo of EDGE_DIR mode): without this, the
    // first build's blocks stay resident through the deliberately
    // memory-heavy rebuild until the ContextCleaner's next sweep
    Option(sharedEdgeCache.remove((s, d, kind)))
      .foreach(org.apache.spark.sql.graftshim.unpersistLocalCheckpoint(_))
    edgeScratchDir.foreach { root =>
      val p = new org.apache.hadoop.fs.Path(edgePath(root, d, kind))
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  /** Parquet-intermediate path for one (corpus, kind) edge graph. */
  private def edgePath(root: String, d: String, kind: String): String = {
    val dirHash = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"$root/edges_${kind}_$dirHash"
  }

  /** Write-once/read-many edge intermediate: build + write the edge
    * parquet if absent, then return a reader over it. The existence
    * check and write go through the Hadoop FileSystem API, so the same
    * code addresses HDFS/S3A scratch roots on a cluster.
    *
    * Completeness protocol (ADVICE r6): a bare `exists(dir)` cannot
    * tell a finished write from the debris of a crashed or concurrent
    * writer, so the gate is the `_SUCCESS` marker Spark's committer
    * drops only after ALL part files land — and the write goes to a
    * temp sibling first, renamed into place, so the final path only
    * ever appears in its complete form. If a concurrent writer wins
    * the rename race we serve its (equally complete) output. */
  private def readEdges(s: SparkSession, root: String, d: String,
      kind: String)(build: => DataFrame): DataFrame = {
    val path = edgePath(root, d, kind)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val done = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
    if (!fs.exists(done)) {
      val tmp = new org.apache.hadoop.fs.Path(
        path + ".inprogress-" +
          java.util.UUID.randomUUID().toString.take(8))
      build.write.mode("overwrite").parquet(tmp.toString)
      if (fs.exists(p)) fs.delete(p, true) // partial debris: no _SUCCESS
      if (!fs.rename(tmp, p)) {
        // lost a rename race — a concurrent writer just published; use
        // theirs, but only if it carries the completeness marker
        fs.delete(tmp, true)
        require(fs.exists(done),
          s"edge intermediate $path exists without _SUCCESS after " +
            "rename race — clear the scratch dir and retry")
      }
    }
    s.read.parquet(path)
  }

  def nearDupEdgesShared(s: SparkSession, d: String): DataFrame =
    sharedEdges(s, d, "prefix")(nearDupEdges(s, d))

  /** BFS horizon for [[contaminationBlast]]. */
  val BlastMaxHops = 3

  /** CONTAMINATION BLAST RADIUS — when an eval doc leaks into training
    * data, its NEAR-DUPLICATES are leaked too: multi-source BFS from
    * the contaminated test docs ([[Curation.contamination]]'s flag)
    * over the exact t=0.03 near-dup graph, up to [[BlastMaxHops]] hops,
    * each reached doc tagged with its hop distance and train/val/test
    * split — hop ≥ 1 docs in TRAIN are the indirect leak surface a
    * seed-only decontamination pass misses (the reason Dolma/RefinedWeb
    * style pipelines decontaminate AFTER near-dup clustering, not
    * before).
    *
    * Scale: the edge graph is the shared materialized intermediate
    * (built once per session/corpus); each BFS round is one frontier ⋈
    * edges equi-join + an anti-join against the reached set, with
    * `localCheckpoint` flattening lineage per round ([[kmeansCentroids]]
    * rule). Frontiers only shrink relative to the edge frame; rounds
    * are bounded by the fixed horizon, and the reached set is
    * node-sized, never edge-sized. */
  def contaminationBlast(s: SparkSession, d: String): DataFrame = {
    val seeds = Curation.contamination(s, d)
      .filter(col("contaminated")).select(col("doc_id"))
    val split = Tables.documents(s, d).select(col("doc_id"),
      Curation.splitCol(Curation.pctBucket(col("doc_id"))).as("split"))
    contaminationBlastOn(seeds, nearDupEdgesShared(s, d))
      .join(split, "doc_id")
      .select("doc_id", "hop", "split")
      .orderBy("doc_id")
  }

  /** The BFS core of [[contaminationBlast]] over any seed set and
    * undirected (a, b) edge frame: (doc_id, hop ∈ 0..[[BlastMaxHops]]). */
  private[graft] def contaminationBlastOn(seeds: DataFrame,
      edges: DataFrame): DataFrame = {
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint()
    var reached = seeds.select(col("doc_id"), lit(0).as("hop"))
      .localCheckpoint()
    for (h <- 1 to BlastMaxHops) {
      val frontier = reached.filter(col("hop") === h - 1)
        .select(col("doc_id").as("u"))
      val next = frontier.join(und, "u")
        .select(col("v").as("doc_id")).distinct()
        .join(reached.select(col("doc_id").as("r")),
          col("doc_id") === col("r"), "left_anti")
        .select(col("doc_id"), lit(h).as("hop"))
      reached = reached.unionByName(next).transform(Checkpoints.iter)
    }
    reached
  }

  /** The MinHash-LSH pair graph as a shared materialized edge frame —
    * same move as [[nearDupEdgesShared]] for the production clustering
    * path: the band-join pipeline runs once per (session, corpus); the
    * clustering consumer sees materialized blocks. */
  def minhashEdgesShared(s: SparkSession, d: String): DataFrame =
    sharedEdges(s, d, "minhash")(
      minhashLsh(s, d).select(col("doc_a").as("a"), col("doc_b").as("b")))

  /** The embedding-LSH pair graph, shared — feeds [[semanticClusters]].
    * Built at the n-adaptive [[scaledLshGeometry]] (r8 VERDICT item 1:
    * SCALING.json measured the FIXED geometry superlinear, exp 1.12 at
    * ×64, and the dial at 0.76 — the measured-better plan is the
    * default now, not a parallel variant). At fixture sizes the dial
    * resolves to the default geometry, so every downstream consumer
    * stays oracle-identical. */
  def embeddingEdgesShared(s: SparkSession, d: String): DataFrame =
    sharedEdges(s, d, "embedding")(
      embeddingLshPairsScaled(s, d).select(col("vec_a").as("a"),
        col("vec_b").as("b")))

  /** [[embeddingEdgesShared]] at the FIXED default geometry — retained
    * as the AUDIT variant the Scaling harness measures against the
    * dial (the pair SCALING.json compares: fixed exp 1.12 vs scaled
    * 0.76 at ×64). Never on a production path. */
  def embeddingEdgesFixedShared(s: SparkSession, d: String): DataFrame =
    sharedEdges(s, d, "embedding_fixed")(
      embeddingLshPairs(s, d).select(col("vec_a").as("a"),
        col("vec_b").as("b")))

  /** Corpus-size guard for [[nearDupClusters]]: EXACT clustering at the
    * low [[ClusterJaccardThreshold]] forces the prefix index to keep
    * ~97% of each doc's shingles (see [[prefixCandidates]]), so its
    * candidate join approaches the full co-occurrence join — exact
    * recall at a 3% threshold is intrinsically quadratic-ish no matter
    * how candidates are generated. Mirroring the [[MaxNaiveShingleDf]]
    * pattern, the operator refuses corpora beyond this cap and points at
    * [[nearDupClustersLsh]], the production path whose band-join edge
    * cost is bounded by bucket sizes. Fixture corpora are 500-5000 docs;
    * an audit slice fits well under the cap. */
  val MaxExactClusterDocs = 50000L

  /** EXACT near-dup clustering — the guarded AUDIT variant (the
    * canonical at-scale operator is [[nearDupClustersLsh]]; VERDICT r4
    * item 2). Use this on bounded audit slices to measure the LSH
    * variant's recall; use the LSH variant for production corpora. */
  def nearDupClusters(s: SparkSession, d: String): DataFrame = {
    val nDocs = Tables.documents(s, d).count() // parquet row-count metadata
    GraftRefusal.check(nDocs <= MaxExactClusterDocs,
      s"exact nearDupClusters refused: $nDocs docs > $MaxExactClusterDocs " +
        "(exact recall at t=0.03 approaches the full co-occurrence join); " +
        "use nearDupClustersLsh — the bounded production clustering path")
    clustersFromEdges(nearDupEdgesShared(s, d))
  }

  /** Near-dup clusters over the MinHash-LSH pair graph — the production
    * 100 TB clustering path. [[nearDupClusters]] is EXACT (lossless
    * prefix edges at t = 3/100) but pays full intersection counts for
    * every co-occurring pair, which at a 3% threshold approaches the
    * all-co-occurrence join no matter how candidates are generated —
    * exact recall at very low thresholds is intrinsically expensive.
    * The at-scale default inverts the trade: band-bucket equi-join
    * edges at the HIGH threshold ([[JaccardThreshold]] = 0.8, LSH
    * recall bounded by the banding), then the same O(log d) CC. The
    * oracle replicates the full LSH edge pipeline + transitive closure,
    * so the approximation itself is checked exactly. */
  def nearDupClustersLsh(s: SparkSession, d: String): DataFrame =
    clustersFromEdges(minhashEdgesShared(s, d))

  /** DUPLICATION RATE BY SOURCE — the crawl-triage report: per source,
    * how much of its volume is EXACT-duplicated (member of a multi-copy
    * text group) and how much is NEAR-duplicated (member of the
    * production LSH cluster graph, [[nearDupClustersLsh]]) — in ppm,
    * so the crawl scheduler can deprioritize the template-heavy feeds
    * and the mixture sampler can anticipate the post-dedup shift
    * (`text_mixture_dedup_shift` reports the realized shift; this
    * report names the sources CAUSING it).
    *
    * Scale: exact side is one windowed count partitioned by text
    * (group-sized partitions); near side rides the memoized shared
    * minhash edge graph; the roll-up is |sources|-sized. */
  def dupRateBySource(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documentsSpread(s, d).select("doc_id", "source", "text")
      .withColumn("n_copies", count(lit(1)).over(Window.partitionBy("text")))
    val near = nearDupClustersLsh(s, d).select(col("doc_id").as("nd_id"))
    docs.join(near, col("doc_id") === col("nd_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("n_copies") > 1, lit(1))).as("n_exact_dup"),
        count(col("nd_id")).as("n_near_dup"))
      .select(col("source"), col("n_docs"), col("n_exact_dup"),
        col("n_near_dup"),
        expr("cast((cast(n_exact_dup as decimal(38,0)) * 1000000) " +
          "div nullif(n_docs, 0) as bigint)").as("exact_dup_ppm"),
        expr("cast((cast(n_near_dup as decimal(38,0)) * 1000000) " +
          "div nullif(n_docs, 0) as bigint)").as("near_dup_ppm"))
      .orderBy("source")
  }

  /** CLUSTER-SIZE DISTRIBUTION of the production LSH clustering — the
    * one-line health report a dedup pipeline owner reads before
    * collapsing: for each cluster size, how many clusters, how many
    * docs they hold, and how many would be REMOVED by keep-one-per-
    * cluster (size − 1 each). A sudden mass shift toward large sizes
    * means a boilerplate template or a banding regression; the removal
    * column is the pipeline's projected deletion volume.
    *
    * Scale: one count-by-cluster over [[nearDupClustersLsh]]'s labels
    * (itself bounded by the shared edge graph) and a second
    * #distinct-sizes-sized rollup — the [[Relational.custDist]]
    * count-of-counts shape on the clustering. */
  def clusterStats(s: SparkSession, d: String): DataFrame =
    nearDupClustersLsh(s, d)
      .groupBy("cluster_size")
      .agg(countDistinct("cluster_id").as("n_clusters"),
        count(lit(1)).as("n_docs"))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        (col("n_docs") - col("n_clusters")).as("n_removable"))
      .orderBy("cluster_size")

  /** CROSS-MODAL consistency audit — every LEXICAL near-dup pair
    * ([[minhashLsh]]'s verified Jaccard ≥ 0.8 pairs) scored with its
    * EMBEDDING cosine and flagged `agree` when the vector space also
    * sees the pair as related (cosine ≥ [[CosineLshThreshold]]). Two
    * texts that are 80 %+ shingle-identical but embed far apart mean
    * the embedding pipeline is broken for those rows (truncation,
    * encoding bugs, stale vectors) — exactly the defect you want
    * surfaced before vectors drive semantic dedup or retrieval over
    * the corpus. The id spaces are shared (embeddings.vec_id IS
    * documents.doc_id).
    *
    * Scale: the pair set is LSH-bounded; attaching vectors is two id
    * equi-joins; one cosine per pair. */
  def modalityCheck(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    minhashLsh(s, d)
      .join(e.select(col("vec_id").as("doc_a"), col("embedding").as("ea")),
        "doc_a")
      .join(e.select(col("vec_id").as("doc_b"), col("embedding").as("eb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        round(CosineSimilarity(col("ea"), col("eb")), 6).as("cosine"),
        (CosineSimilarity(col("ea"), col("eb")) >= CosineLshThreshold)
          .as("agree"))
      .orderBy("doc_a", "doc_b")
  }

  /** Rational threshold (num/den) the sweep audits down to. */
  val SweepNum = 1
  val SweepDen = 2

  /** THRESHOLD SWEEP — the similarity histogram a pipeline owner reads
    * to PICK the dedup threshold: every pair with exact Jaccard ≥ 1/2,
    * binned by first decimal ([0.5,0.6) … [0.9,1.0]). A threshold is a
    * recall/precision dial; this shows where the pair mass sits before
    * committing to one. Candidates come from the LOSSLESS prefix
    * filter at t = [[SweepNum]]/[[SweepDen]] ([[prefixCandidates]]'s
    * pigeonhole holds at any rational t), so the histogram is exact —
    * never banding-biased. Low thresholds index longer prefixes (the
    * inherent prefix-filtering dial); the df-ascending order still
    * keeps hyper-frequent shingles out of every prefix, which is what
    * makes this runnable where the naive join detonates. */
  def thresholdSweep(s: SparkSession, d: String): DataFrame = {
    val sh = shinglesCached(s, d)
    val t = SweepNum.toDouble / SweepDen
    verifyJaccardPairs(sh, prefixCandidates(sh, SweepNum, SweepDen), t)
      .select((least(floor(col("jaccard") * 10), lit(9)) / 10.0)
        .as("bin_lo"))
      .groupBy("bin_lo").agg(count(lit(1)).as("n_pairs"))
      .orderBy("bin_lo")
  }

  /** CORPUS DEDUP AUDIT — the per-source report a pipeline owner reads
    * before a training run: how many documents each source contributes,
    * how many are non-surviving EXACT copies (same text, higher
    * doc_id), how many more fall to NEAR-dup clustering (non-keeper
    * members of the LSH cluster graph that are not already exact
    * copies), and the resulting dup rate. Categories are disjoint by
    * construction — exact wins, near-dup counts only the remainder —
    * so n_kept = n_docs − n_exact_dup − n_near_dup.
    *
    * Composes the two production paths ([[exact]]'s hash-agg and
    * [[nearDupClustersLsh]]'s banded edge graph + CC) — both
    * scale-safe, both independently oracle-checked; the per-doc flags
    * are equi-joins on doc_id and the report is one partial+final
    * aggregation by source. */
  def dedupReport(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documentsSpread(s, d).select("doc_id", "source", "text")
    val exactLosers = docs
      .join(docs.groupBy("text").agg(min("doc_id").as("keep_id")), "text")
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), lit(1).as("is_exact"))
    val nearLosers = nearDupClustersLsh(s, d)
      .filter(!col("keep"))
      .select(col("doc_id"), lit(1).as("is_near"))
    docs.join(exactLosers, Seq("doc_id"), "left")
      .join(nearLosers, Seq("doc_id"), "left")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        count(col("is_exact")).as("n_exact_dup"),
        count(when(col("is_near").isNotNull && col("is_exact").isNull, 1))
          .as("n_near_dup"))
      .select(col("source"), col("n_docs"), col("n_exact_dup"),
        col("n_near_dup"),
        (col("n_docs") - col("n_exact_dup") - col("n_near_dup"))
          .as("n_kept"),
        round((col("n_exact_dup") + col("n_near_dup")).cast("double") /
          col("n_docs"), 6).as("dup_rate"))
      .orderBy("source")
  }

  /** SEMANTIC dedup clusters — connected components over the
    * EMBEDDING-space near-dup graph ([[embeddingLshPairs]]'s
    * sign-random-projection bucketed edges at cosine ≥
    * [[CosineLshThreshold]]): collapses paraphrase/translation-style
    * duplicate groups that share no lexical shingles at all, the
    * semantic complement to [[nearDupClustersLsh]]'s lexical clustering.
    * Same O(log d) CC; the whole pipeline (bucketing, cosine verify,
    * transitive closure) is deterministic, so the oracle replicates it
    * end-to-end. */
  def semanticClusters(s: SparkSession, d: String): DataFrame =
    clustersFromEdges(embeddingEdgesShared(s, d), idCol = "vec_id")

  /** Shared tail: CC labels → cluster sizes → representative flag. */
  private def clustersFromEdges(
      edges: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val labels = connectedComponents(edges)
    val sizes = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(col("v").as(idCol), col("cluster_id"), col("cluster_size"),
        (col("v") === col("cluster_id")).as("keep"))
      .orderBy(idCol)
  }

  /** CLUSTER-REPRESENTATIVE selection — for every lexical near-dup
    * cluster ([[nearDupClustersLsh]]'s production graph), pick the
    * member a pipeline should KEEP by content quality rather than by
    * arrival order: the longest document (max `n_chars`), minimum
    * doc_id on ties. The CC tail's `keep` flag marks the min-id member
    * — fine for exact copies, but near-dup clusters usually hold one
    * full page plus truncated/boilerplate variants, and min-id keeps
    * whichever crawled first. This operator is the quality-aware
    * replacement: per cluster, the keeper, its length, and how many
    * members are dropped.
    *
    * Scale: membership is one equi-join of the cluster frame with the
    * (doc_id, n_chars) projection; the argmax is two bounded
    * partial+final aggs by cluster_id (max length, then min id among
    * ties) — no window over members, no text shuffled. Deterministic
    * by the (n_chars, doc_id) total order, so the oracle replicates it
    * with plain SQL over the same cluster pipeline. */
  def keepBest(s: SparkSession, d: String): DataFrame = {
    val members = nearDupClustersLsh(s, d)
      .select("doc_id", "cluster_id", "cluster_size")
      .join(Tables.documents(s, d).select("doc_id", "n_chars"), "doc_id")
    val best = members.groupBy("cluster_id")
      .agg(max("n_chars").as("keep_chars"))
    members.join(best, "cluster_id")
      .filter(col("n_chars") === col("keep_chars"))
      .groupBy("cluster_id", "cluster_size", "keep_chars")
      .agg(min("doc_id").as("keep_id"))
      .select(col("cluster_id"), col("keep_id"), col("cluster_size"),
        col("keep_chars"), (col("cluster_size") - 1).as("n_dropped"))
      .orderBy("cluster_id")
  }

  // ------------------------------------------------------------------
  // 10. duplicated-span extraction (exact-substring dedup)
  // ------------------------------------------------------------------

  /** Width (words) of the positional shingles that seed span detection. */
  val SpanShingleWords = 5

  /** Minimum merged-span length (words) worth reporting: islands of
    * ≥ 4 consecutive duplicated 5-shingles, i.e. ≥ 8 shared words. */
  val MinDupSpanWords = 8

  /** Duplicated-SPAN extraction — the exact-substring flavor of training
    * -data dedup (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL'22): document-level dedup misses long
    * verbatim passages embedded in otherwise-distinct pages (quotes,
    * licenses, syndicated paragraphs). For every doc, find word
    * positions whose [[SpanShingleWords]]-shingle occurs in ≥ 2 DISTINCT
    * docs, merge consecutive positions into maximal islands
    * (gaps-and-islands: `pos − row_number` is constant within a run) and
    * report spans of ≥ [[MinDupSpanWords]] words with how many docs
    * share their widest shingle. Downstream, these spans are what a
    * pipeline CUTS from kept documents — the remove-substring
    * counterpart to dropping whole near-dup docs.
    *
    * Scale: positional shingles are map-only (only 60-bit hashes + an
    * int position shuffle — never shingle text); the duplicated-shingle
    * set is one partial+final agg by hash; the membership probe is a
    * hash equi-join; the island merge is a window PARTITIONED BY doc_id
    * — per-doc state, embarrassingly parallel. The reference's analog is
    * the shared-key shuffle of `countCombos` pairs
    * (`mapreduce.erl:275-282`); here the "key" is the span shingle. */
  def dupSpans(s: SparkSession, d: String): DataFrame =
    dupSpansOn(Tables.documentsSpread(s, d))

  /** [[dupSpans]] over any (doc_id, text) DataFrame. */
  def dupSpansOn(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"),
        posexplode(graft.functions.WordShingles(col("text"), SpanShingleWords))
          .as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), md5hash60(col("s")).as("h"))
    val dup = sh.groupBy("h")
      .agg(countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") >= 2)
    sh.join(dup, "h")
      .withColumn("rn",
        row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
      .groupBy(col("doc_id"), (col("pos") - col("rn")).as("isl"))
      .agg(min("pos").as("span_start"),
        (max(col("pos")) - min(col("pos")) + lit(SpanShingleWords))
          .as("span_words"),
        count(lit(1)).as("n_shingles"),
        max("n_docs").as("max_docs"))
      .filter(col("span_words") >= MinDupSpanWords)
      .select(col("doc_id"), col("span_start"), col("span_words"),
        col("n_shingles"), col("max_docs"))
      .orderBy("doc_id", "span_start")
  }

  /** KEEP-CENTRAL canonical selection — [[keepBest]]'s authority-aware
    * sibling, closing the gap its own scaladoc concedes: length picks
    * the longest cluster member, but the CANONICAL version of a
    * syndicated/near-dup family is the one most connected to the other
    * copies — exactly what [[pageRank]] over the same LSH graph scores
    * (VERDICT r6 called this signal out as invisible to the length
    * heuristic). Per cluster: the member with the highest PageRank
    * (ties → smallest doc_id), the kept rank, and the drop count.
    * Composes two independently oracle-verified pipelines over the ONE
    * shared edge graph.
    *
    * Scale: both inputs are node-sized frames derived from the shared
    * materialized edge graph (built once per session); the selection is
    * an equi-join + per-cluster argmax — partial-aggregating, no
    * window. */
  def keepCentral(s: SparkSession, d: String): DataFrame = {
    val members = nearDupClustersLsh(s, d)
      .select("doc_id", "cluster_id", "cluster_size")
    val pr = pageRank(s, d).select(col("doc_id"), col("pr_scaled"))
    val m = members.join(pr, "doc_id")
    val best = m.groupBy("cluster_id").agg(max("pr_scaled").as("keep_pr"))
    m.join(best, "cluster_id")
      .filter(col("pr_scaled") === col("keep_pr"))
      .groupBy("cluster_id", "cluster_size", "keep_pr")
      .agg(min("doc_id").as("keep_id"))
      .select(col("cluster_id"), col("keep_id"), col("cluster_size"),
        col("keep_pr"), (col("cluster_size") - 1).as("n_dropped"))
      .orderBy("cluster_id")
  }

  /** SHINGLE-DF PROFILE — the observability twin of the
    * [[MaxNaiveShingleDf]] refusal guards: the document-frequency
    * spectrum of the 3-word shingle index on exact log₂ buckets
    * (shingle count, posting mass, exact max df per bucket) with an
    * `over_guard` flag where any shingle's df exceeds the naive-join
    * cap. The guards REFUSE when a hot shingle would make the
    * inverted-index self-join quadratic; this report is what a
    * pipeline owner looks at to see the margin shrinking (boilerplate
    * creep fattens the high-df tail) BEFORE a refusal fires, and to
    * size the prefix-filtered path's candidate bounds.
    *
    * Scale: one explode→distinct→df count (partial+final) and a
    * ≤64-bucket rollup — strictly cheaper than any consumer of the
    * shingle index. */
  def shingleDfProfile(s: SparkSession, d: String): DataFrame =
    Tables.documentsSpread(s, d)
      .select(col("doc_id"), explode(
        graft.functions.WordShingles(col("text"), 3)).as("s"))
      .distinct()
      .groupBy("s").agg(count(lit(1)).as("df"))
      .select((length(bin(col("df"))) - 1).as("log2_bucket"), col("df"))
      .groupBy("log2_bucket")
      .agg(count(lit(1)).as("n_shingles"), sum("df").as("n_postings"),
        max("df").as("max_df"))
      .select(col("log2_bucket"),
        expr("shiftleft(cast(1 as bigint), log2_bucket)").as("df_lo"),
        col("n_shingles"), col("n_postings"), col("max_df"),
        (col("max_df") > MaxNaiveShingleDf).as("over_guard"))
      .orderBy("log2_bucket")

  /** Window width for [[winnowingPairs]] — any shared run of
    * ≥ W + k − 1 = 8 words is GUARANTEED to share a fingerprint (the
    * winnowing guarantee), matching [[MinDupSpanWords]]. */
  val WinnowW = 4

  /** Fingerprints present in more than this many distinct docs are the
    * index's stop-words (boilerplate) and are excluded from pairing —
    * the standard density cap of a fingerprint index; [[chunkDedup]] /
    * [[boilerplateStrip]] are the operators that AUDIT such content. */
  val MaxFpDocs = 50L

  /** Minimum shared fingerprints for a [[winnowingPairs]] row — one
    * shared fingerprint ≈ one 8-word run, the noise floor. */
  val MinSharedFps = 2L

  /** WINNOWING fingerprint near-dup candidates (Schleimer, Wilkerson &
    * Aiken, SIGMOD'03 — the MOSS algorithm): each document keeps, from
    * every [[WinnowW]]-wide window of consecutive
    * [[SpanShingleWords]]-shingle hashes, the window's MINIMUM hash.
    * The selected set is position-robust (unlike [[chunkDedup]]'s
    * aligned chunks) and ~1/W the density of full shingling, with the
    * GUARANTEE that any shared run of ≥ W+k−1 words yields a shared
    * fingerprint — the local-fingerprinting property MinHash lacks
    * (MinHash bounds whole-document resemblance; winnowing localizes
    * partial overlap). Emits doc pairs sharing ≥ [[MinSharedFps]]
    * fingerprint hashes with both docs' fingerprint counts and the
    * containment-style overlap in exact integer ppm.
    *
    * Only the fingerprint HASH SET feeds pairing, so the tie rule for
    * the selected position (classic winnowing: rightmost minimum) is
    * moot — `min(h)` per window is the whole selection, and the DuckDB
    * oracle replicates it with the identical `min() OVER` frame.
    *
    * Scale: the window min runs PARTITIONED BY doc (no funnel; frame is
    * 4 rows); fingerprints are ~n_tokens/W per doc; the pair join is an
    * equi-join on fingerprint hash with the [[MaxFpDocs]] stop-word cap
    * bounding per-hash fan-out (the same occupancy defense as
    * [[simhashPairsOn]], but as a documented index rule rather than a
    * refusal: a hash in > MaxFpDocs docs is boilerplate, not evidence
    * of duplication). */
  def winnowingPairs(s: SparkSession, d: String): DataFrame =
    winnowingPairsOn(Tables.documentsSpread(s, d))

  /** [[winnowingPairs]] over any (doc_id, text) frame. */
  private[graft] def winnowingPairsOn(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"),
        posexplode(graft.functions.WordShingles(col("text"), SpanShingleWords))
          .as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), md5hash60(col("s")).as("h"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(WinnowW - 1), 0)
    val fps = sh
      .withColumn("minh", min("h").over(win))
      // only full windows select (the first W−1 positions are covered
      // by the window ENDING at pos W−1)
      .filter(col("pos") >= WinnowW - 1)
      .select(col("doc_id"), col("minh").as("h"))
      .distinct()
      .localCheckpoint() // counts + stop-word scan + pair join
    val perDoc = fps.groupBy("doc_id").agg(count(lit(1)).as("n_fps"))
    val keep = fps.groupBy("h").agg(countDistinct("doc_id").as("df"))
      .filter(col("df") <= MaxFpDocs)
      .select("h")
    val kept = fps.join(keep, "h")
    val pairs = kept.select(col("doc_id").as("doc_a"), col("h"))
      .join(kept.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFps)
    pairs
      .join(perDoc.toDF("doc_a", "fp_a"), "doc_a")
      .join(perDoc.toDF("doc_b", "fp_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("fp_a"), col("fp_b"),
        expr("n_shared * 1000000 div least(fp_a, fp_b)")
          .as("overlap_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------------------
  // 11. PageRank authority over the near-dup graph
  // ------------------------------------------------------------------

  /** Power-iteration rounds — FIXED so the oracle can unroll them. */
  val PageRankIters = 5

  /** Rank fixed point: ranks live in [0, PageRankScale] as BIGINTs, so
    * every per-iteration sum is exact integer arithmetic — additions
    * commute, partition order can't change a bit, and the DuckDB oracle
    * reproduces the ranks exactly (the same move as `kmeansCentroids`'
    * integer means and `events_outliers`' cross-multiplied sigma test).
    * Headroom: damp·sum(contrib) ≤ 85 × 1e12 ≪ 2^63. */
  val PageRankScale = 1000000000000L // 1e12

  /** Damping 0.85 as a rational, so each step stays in BIGINT. */
  val PageRankDampNum = 85L
  val PageRankDampDen = 100L

  /** PageRank over the MinHash-LSH near-dup graph — duplicate-cluster
    * AUTHORITY scoring: within a near-dup cluster the doc most connected
    * to other copies (the canonical/most-syndicated version) ranks
    * highest, a quality signal [[keepBest]]'s length heuristic can't
    * see. The classic power iteration (Page et al. 1999), restricted to
    * nodes with ≥1 edge (isolated docs keep the uniform teleport rank by
    * definition and are omitted, like [[nearDupClusters]]' singleton
    * convention).
    *
    * r_{k+1}(v) = base + damp · Σ_{u~v} (r_k(u) div deg(u)), with base =
    * (1−damp)·(S div n) — all BIGINT with truncating `div`, so both
    * engines compute bit-identical ranks (Spark `div` and DuckDB `//`
    * truncate alike). The node count attaches via a 1-row broadcast
    * (never a driver scalar); n is the EDGE-BEARING node count, matching
    * the restricted graph.
    *
    * Scale: state per round is ONE row per node; each round = one
    * equi-join (edges × ranks) + one partial+final sum by destination +
    * a map — shuffle-partitionable, the [[connectedComponents]] shape.
    * `localCheckpoint` per round truncates the doubling lineage. The
    * edge frame is the shared materialized LSH graph
    * ([[minhashEdgesShared]]), built once per session. Reference analog:
    * iterated shared-key shuffles of `countCombos` pairs
    * (`mapreduce.erl:275-282`). */
  def pageRank(s: SparkSession, d: String): DataFrame =
    pageRankOn(minhashEdgesShared(s, d))

  /** Triangle counting + local clustering coefficient over the LSH
    * near-dup graph — the graph-motif audit of a dedup pipeline: a
    * near-dup relation should be near-transitive, so nodes whose
    * neighborhoods DON'T close into triangles (low coefficient) mark
    * borderline/chained similarity (A~B~C with A≁C) — exactly the
    * clusters a single-linkage collapse ([[nearDupClusters]]) merges
    * most aggressively and a reviewer should eyeball first.
    *
    * Algorithm: DEGREE ORIENTATION (Suri & Vassilvitskii, WWW'11) —
    * orient every edge from the ((deg, id)-)smaller endpoint to the
    * larger, count each triangle once at its smallest vertex via a
    * wedge equi-join closed by one oriented-edge probe. Out-degrees
    * under this orientation are O(√m) for ANY graph, so wedge fan-out
    * is bounded by m^1.5 total — the "curse of the last reducer"
    * mitigation; all joins are key-equi on node ids.
    *
    * Coefficient = 2·T_v / (deg_v·(deg_v−1)), one IEEE multiply+divide
    * in both engines (NULL for deg-1 nodes). */
  def triangles(s: SparkSession, d: String): DataFrame =
    trianglesOn(minhashEdgesShared(s, d))

  /** [[triangles]] over any (a, b) undirected edge list (a < b). */
  private[graft] def trianglesOn(edges: DataFrame): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .select(col("a").as("v"), col("deg"))
    val e = edges.select(col("a"), col("b"))
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val fwd = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = e.select(
        when(fwd, col("a")).otherwise(col("b")).as("src"),
        when(fwd, col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint() // consumed three times below
    val wedges = oriented.select(col("src"), col("dst").as("x"))
      .join(oriented.select(col("src"), col("dst").as("y")), Seq("src"))
      .filter(col("x") =!= col("y"))
    val tri = wedges.join(
      oriented.select(col("src").as("x"), col("dst").as("y")),
      Seq("x", "y"))
    val perNode = tri.select(col("src").as("node"))
      .union(tri.select(col("x").as("node")))
      .union(tri.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("t"))
    deg.join(perNode, col("v") === col("node"), "left")
      .select(col("v").as("doc_id"), col("deg"),
        coalesce(col("t"), lit(0L)).as("n_triangles"),
        when(col("deg") > 1,
          round(lit(2.0) * coalesce(col("t"), lit(0L)) /
            (col("deg") * (col("deg") - 1)), 6)).as("clustering_coeff"))
      .orderBy("doc_id")
  }

  /** [[pageRank]] over any (a, b) undirected edge list (a < b, no dups). */
  private[graft] def pageRankOn(edges: DataFrame): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .select(col("a").as("v"), col("deg"))
    // (source, dest, deg(source)) — the join scaffold every round reuses;
    // checkpointed once so candidate generation never re-runs
    val undeg = und.join(deg, und("a") === deg("v"))
      .select(col("a"), col("b"), col("deg"))
      .localCheckpoint()
    val nOne = deg.agg(count(lit(1)).as("n"))
    // per-node constants: initial rank S div n and the teleport base,
    // attached via a 1-row broadcast cross join
    val nodeStat = deg.crossJoin(broadcast(nOne))
      .select(col("v"), col("deg"),
        expr(s"$PageRankScale div n").as("r0"),
        expr(s"((${PageRankDampDen - PageRankDampNum}) * " +
          s"($PageRankScale div n)) div $PageRankDampDen").as("base"))
      .localCheckpoint()
    var ranks = nodeStat.select(col("v"), col("r0").as("r"))
    for (_ <- 1 to PageRankIters) {
      val contribs = undeg
        .join(ranks.select(col("v").as("src"), col("r")),
          col("a") === col("src"))
        .select(col("b"), expr("r div deg").as("c"))
        .groupBy(col("b")).agg(sum("c").as("cs"))
      // every node has deg ≥ 1 in an undirected edge-bearing graph, so
      // the inner join drops nothing
      ranks = nodeStat.select(col("v"), col("base"))
        .join(contribs, col("v") === col("b"))
        .select(col("v"),
          expr(s"base + ($PageRankDampNum * cs) div $PageRankDampDen")
            .as("r"))
        .localCheckpoint()
    }
    ranks.join(nodeStat.select(col("v"), col("deg")), Seq("v"))
      .select(col("v").as("doc_id"), col("deg"),
        col("r").as("pr_scaled"),
        round(col("r") / lit(PageRankScale.toDouble), 12).as("pr"))
      .orderBy("doc_id")
  }

  /** Synchronous rounds [[lpaCommunities]] runs — fixed so the oracle
    * unrolls the same count (LPA converges in a handful of rounds on
    * near-dup graphs, whose communities are small and dense). */
  val LpaIters = 4

  /** LABEL-PROPAGATION community detection (Raghavan et al. 2007) over
    * the MinHash-LSH near-dup graph — the middle ground between
    * [[nearDupClusters]]' single-linkage collapse (one bridge edge merges
    * two dup families) and [[trianglesOn]]' purely local audit: each node
    * repeatedly adopts the most common label among its neighbors, so
    * DENSE dup families converge to one community while a single
    * borderline bridge edge is outvoted and the families stay separate —
    * exactly the split a reviewer wants when single-linkage
    * over-merges.
    *
    * Determinism (the classic LPA pitfalls are random order and random
    * tie-breaks): synchronous rounds, a self-vote (each node counts its
    * own current label once — damping the 2-coloring oscillation sync
    * updates can fall into), and total tie-break toward the SMALLEST
    * label via one BIGINT `min_by` key `−n·2³² + lbl` (exact while
    * n < 2³¹ and labels < 2³², both guaranteed — labels are doc ids and
    * n is bounded by degree+1). Both engines replicate every round
    * bit-identically.
    *
    * Scale: state is ONE (node, label) row per node; each round = one
    * edge×labels equi-join, a (node, label)-keyed partial+final count,
    * and a map-side `min_by` argmax — the [[connectedComponents]]
    * shuffle shape, no window, no all-pairs. `localCheckpoint` per round
    * truncates the doubling lineage. Reference analog: iterated
    * shared-key shuffles (`mapreduce.erl:275-282`). */
  def lpaCommunities(s: SparkSession, d: String): DataFrame =
    lpaCommunitiesOn(minhashEdgesShared(s, d))

  /** [[lpaCommunities]] over any (a, b) undirected edge list (a < b). */
  private[graft] def lpaCommunitiesOn(edges: DataFrame): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .transform(Checkpoints.iter) // consumed once per round
    // The single-BIGINT tie key below (−n·2³² + lbl) is exact only
    // while labels < 2³² and vote counts n < 2³¹. Labels are doc ids
    // and n ≤ degree+1 ≤ directed-edge count, so both hold on any
    // real corpus slice — but an out-of-range doc_id would corrupt
    // tie-breaking SILENTLY (identically in both engines, invisible to
    // the parity gate), so guard at runtime like the suite's other
    // refusal guards (ADVICE r7). One scalar agg over the already-
    // materialized edge frame.
    val bounds = und.agg(max("a"), count(lit(1))).head()
    if (!bounds.isNullAt(0)) {
      val (maxId, nEdges) = (bounds.getLong(0), bounds.getLong(1))
      GraftRefusal.check(maxId < (1L << 32) && nEdges + 1 < (1L << 31),
        s"lpaCommunities refused: max node id $maxId or vote bound " +
          s"${nEdges + 1} exceeds the exact range of the BIGINT tie key " +
          "(labels < 2^32, counts < 2^31) - renumber doc ids densely " +
          "(e.g. zipWithIndex over sorted ids) before LPA")
    }
    var labels = und.select(col("a").as("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
    for (_ <- 1 to LpaIters) {
      val votes = und
        .join(labels.select(col("v").as("b"), col("lbl")), "b")
        .select(col("a").as("v"), col("lbl"))
        .union(labels) // self-vote: damps synchronous oscillation
        .groupBy("v", "lbl").agg(count(lit(1)).as("n"))
      labels = votes.groupBy("v")
        .agg(expr("min_by(lbl, -n * 4294967296 + lbl)").as("lbl"))
        .transform(Checkpoints.iter)
    }
    val sizes = labels.groupBy("lbl").agg(count(lit(1)).as("comm_size"))
    labels.join(sizes, "lbl")
      .select(col("v").as("doc_id"), col("lbl").as("community"),
        col("comm_size"))
      .orderBy("doc_id")
  }

  /** k for [[kcore]]: the 2-core strips every tree/pendant chain and
    * keeps only cyclically-connected duplication structure. */
  val KcoreK = 2

  /** Peel-round cap — FIXED so the oracle can unroll exactly this many
    * rounds; the operator refuses (rather than emitting a non-fixpoint
    * frame) if peeling hasn't converged by then. Each peel removes at
    * least one node, and near-dup graphs are shallow (component
    * diameter bounded by the clustering that built them), so 8 covers
    * fixtures and any real corpus slice; raise both constants together. */
  val KcoreMaxRounds = 8

  /** k-CORE decomposition (k = [[KcoreK]]) of the exact near-dup graph —
    * the density audit complementing [[triangles]]: iteratively peel
    * nodes of degree < k until a fixpoint; what survives is the maximal
    * subgraph where EVERY doc has ≥ k near-dup partners. Pendant edges
    * and chains (A~B~C with no closure) peel away; what remains is
    * genuinely redundant content — template farms, syndication rings,
    * boilerplate families — the clusters worth a hard-dedup pass rather
    * than pairwise review. Emits each surviving doc with its degree
    * inside the core.
    *
    * Scale: each peel round is one degree aggregation + two node-keyed
    * semi-join-shaped equi-joins over the CURRENT edge frame (shrinking
    * monotonically), all shuffle-partitionable on node id — the
    * [[connectedComponents]] shape. The convergence count rides the
    * round's own `localCheckpoint` action via `Observation` (one Spark
    * job per round, the CcJobCountSpec discipline). Reference analog:
    * iterated key-grouped passes over `countCombos` pairs
    * (`mapreduce.erl:275-282`). */
  def kcore(s: SparkSession, d: String): DataFrame =
    kcoreOn(nearDupEdgesShared(s, d))

  /** [[kcore]] over any (a, b) undirected edge list (a < b, no dups). */
  private[graft] def kcoreOn(edges: DataFrame): DataFrame = {
    var und = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .transform(Checkpoints.iter)
    var prevEdges = -1L
    var curEdges = und.count()
    var rounds = 0
    while (curEdges != prevEdges) {
      // a plain require, NOT a GraftRefusal: non-convergence is an
      // algorithmic iteration-limit failure, not an input-size scale
      // guard — typing it as a refusal would let the Scaling harness
      // record a real scaling regression as by-design (-2) instead of
      // error (-1) (ADVICE r10). GraftRefusal stays reserved for the
      // documented occupancy/domain/cardinality guards.
      require(rounds < KcoreMaxRounds,
        s"kcore did not converge in $KcoreMaxRounds peel rounds - raise " +
          "KcoreMaxRounds (and unroll the oracle to match)")
      val keep = und.groupBy("a").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= KcoreK).select(col("a").as("v"))
      val obs = org.apache.spark.sql.Observation()
      val next = und
        .join(keep.select(col("v").as("a")), "a")
        .join(keep.select(col("v").as("b")), "b")
        .observe(obs, count(lit(1)).as("m"))
        .transform(Checkpoints.iter)
      prevEdges = curEdges
      curEdges = obs.get("m").asInstanceOf[Long]
      und = next
      rounds += 1
    }
    und.groupBy("a").agg(count(lit(1)).as("core_degree"))
      .select(col("a").as("doc_id"), col("core_degree"))
      .orderBy("doc_id")
  }

  /** CROSS-SPLIT LEAKAGE audit — near-duplicate pairs that STRADDLE the
    * train/val/test boundary ([[Curation.splitAssign]]'s deterministic
    * md5 split): a val/test doc with a near-dup twin in train is
    * memorization leakage that [[Curation.contamination]]'s
    * shingle-overlap check approaches from the n-gram side; this
    * operator approaches it from the production near-dup graph
    * ([[minhashEdgesShared]], Jaccard ≥ [[JaccardThreshold]]), the
    * standard "dedup ACROSS splits, not just within" pipeline gate.
    * One row per straddling split pair: how many leaked doc pairs, and
    * how many distinct docs are involved.
    *
    * Scale: the edge graph is the shared materialized LSH intermediate
    * (built once per corpus); attaching splits is two doc_id equi-joins
    * against a (doc_id, split) projection — the split derives from md5,
    * so it costs a map, never a shuffle of documents; both aggregations
    * run over the (tiny) leaked-pair frame. */
  def splitLeakage(s: SparkSession, d: String): DataFrame = {
    val edges = minhashEdgesShared(s, d)
    val split = Tables.documents(s, d).select(col("doc_id"),
      Curation.splitCol(Curation.pctBucket(col("doc_id"))).as("split"))
    val leaked = edges
      .join(split.select(col("doc_id").as("a"), col("split").as("split_a")),
        "a")
      .join(split.select(col("doc_id").as("b"), col("split").as("split_b")),
        "b")
      .filter(col("split_a") =!= col("split_b"))
      .select(least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"),
        col("a"), col("b"))
      .localCheckpoint() // tiny; consumed by both aggregations below
    val pairAgg = leaked.groupBy("split_lo", "split_hi")
      .agg(count(lit(1)).as("n_pairs"))
    val docAgg = leaked
      .select(col("split_lo"), col("split_hi"),
        explode(array(col("a"), col("b"))).as("doc"))
      .groupBy("split_lo", "split_hi")
      .agg(countDistinct("doc").as("n_docs"))
    pairAgg.join(docAgg, Seq("split_lo", "split_hi"))
      .orderBy("split_lo", "split_hi")
  }
}
