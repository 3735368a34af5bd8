package graft.operators

import graft.GraftRefusal
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Checkpoints, Tables}
import graft.functions.WordShingles

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * deterministic column arithmetic (fixed operation order, explicit
  * rounding) so every query has an exact DuckDB oracle.
  *
  * Scale notes: everything is a single scan + one hash aggregation per
  * document (the explodes feed straight into partial aggregation); no
  * self-joins, no windows, no collect. */
object TextAnalysis {

  /** Tiny public stopword lists — enough signal for a heuristic n-gram/
    * stopword language scorer. Order matters only for tie-breaking
    * (alphabetical language wins a tie). */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "and", "a", "of", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "los", "en", "un", "es"),
    "fr" -> Seq("le", "les", "des", "est", "une", "dans", "et", "du"))

  private def docsWithTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        explode(WordShingles(col("text"), 1)).as("w"))

  /** Minimum word length for [[typoPairs]] — short fragments generate
    * hyper-shared deletion keys and near-anagram noise. */
  val TypoMinWordLen = 5
  /** Hot-bucket refusal bound on words per deletion key. */
  val MaxTypoKeyBucket = 500L

  /** TYPO/VARIANT pair mining via SymSpell deletion neighborhoods
    * (Garbe's symmetric-delete algorithm): two words are at edit
    * distance ≤ 1 IFF their {word} ∪ {all 1-deletions} key sets
    * intersect — substitutions meet at the deleted position, and an
    * insertion's deletion IS the shorter word. So candidate generation
    * is a plain equi-join on deletion keys (complete recall for ed = 1,
    * never an all-pairs scan), and `levenshtein(a, b) = 1` — the same
    * built-in DP in Spark and DuckDB — verifies the survivors. Corpus
    * frequencies ride along: the rare-spelled twin of a frequent word
    * is the classic OCR/typo signature a cleaning pipeline rewrites.
    *
    * Scale: keys are vocab-sized ((len+1) keys per DISTINCT word, not
    * per token); the join is shuffle-partitionable on the key; an
    * occupancy guard ([[MaxTypoKeyBucket]]) refuses degenerate key
    * buckets the way [[Dedup.simhashPairsOn]] does, naming the dial. */
  /** The SymSpell pair core over any 1-column (`w`) frame of DISTINCT
    * strings (length ≥ [[TypoMinWordLen]] enforced here): emits
    * (word_a, word_b) at edit distance EXACTLY 1, complete recall.
    *
    * POSITIONAL keys make the pairs exact by construction — no
    * levenshtein verify stage at all: two distinct words sharing the
    * same deletion STRING at the same POSITION are `prefix+c₁+suffix`
    * vs `prefix+c₂+suffix` (a substitution, ed = 1 exactly), and a word
    * that IS another's deletion is one insertion away. Positionless
    * keys (plain SymSpell) put every word of a dense cluster in one
    * bucket and need a verify pass — measured 6.7 s on the sequential
    * customer names; positional buckets hold at most |alphabet| words
    * (3.7 s → sub-second here). Transpositions (ed 2) can't collide:
    * they never share a deletion at the same position. */
  private[graft] def typoPairsOn(wordsIn: DataFrame): DataFrame = {
    val words = wordsIn.select(col("w"))
      .filter(length(col("w")) >= TypoMinWordLen).distinct()
      .localCheckpoint() // deletion build + insertion probe share it
    // length ≥ 5 guards the sequence's lower bound (no downward ramp)
    val dels = words
      .select(col("w"), explode(expr("sequence(1, length(w))")).as("p"))
      .select(col("w"),
        expr("concat(substr(w, 1, p - 1), substr(w, p + 1))").as("k"),
        col("p"))
      .localCheckpoint() // guard + both joins reuse one build
    val occ = dels.groupBy("k", "p").agg(count(lit(1)).as("n"))
      .agg(max("n")).head()
    val maxOcc = if (occ.isNullAt(0)) 0L else occ.getLong(0)
    GraftRefusal.check(maxOcc <= MaxTypoKeyBucket,
      s"typoPairs refused: a positional deletion key is shared by " +
        s"$maxOcc words (> $MaxTypoKeyBucket) - candidate fan-out is " +
        s"occupancy^2; raise TypoMinWordLen or restrict the alphabet")
    val subs = dels.select(col("w").as("word_a"), col("k"), col("p"))
      .join(dels.select(col("w").as("word_b"), col("k"), col("p")),
        Seq("k", "p"))
      .filter(col("word_a") < col("word_b"))
      .select("word_a", "word_b")
    val ins = dels.select(col("w").as("longer"), col("k"))
      .join(words.select(col("w").as("shorter")),
        col("k") === col("shorter"))
      .select(least(col("shorter"), col("longer")).as("word_a"),
        greatest(col("shorter"), col("longer")).as("word_b"))
    subs.union(ins).distinct()
  }

  /** Corpus-vocabulary typo pairs (spec surface: the driver fixture's
    * vocabulary is generator-clean, so this is exercised by a
    * planted-typo spec rather than a guaranteed-empty driver query). */
  private[graft] def typoPairs(s: SparkSession, d: String): DataFrame =
    typoPairsOn(docsWithTokens(s, d).select(col("w")))
      .orderBy("word_a", "word_b")

  /** FUZZY ENTITY-NAME matching over the customer dimension — record
    * linkage's blocking+verify step: for every customer name, how many
    * other names sit ONE edit away (`n_neighbors`) and the
    * lexicographic nearest (`nearest`). Near-identical entity names are
    * the classic dirty-dimension signature (typo'd re-registrations,
    * OCR'd imports) that inflates per-customer aggregates. Candidate
    * generation is [[typoPairsOn]]'s SymSpell deletion-key equi-join —
    * complete for ed = 1, never all-pairs — then a symmetric per-name
    * count. */
  def fuzzyNames(s: SparkSession, d: String): DataFrame = {
    val pairs = typoPairsOn(
      Tables.load(s, d, "customer").select(col("c_name").as("w")))
    pairs.select(col("word_a").as("name"), col("word_b").as("nb"))
      .union(pairs.select(col("word_b").as("name"), col("word_a").as("nb")))
      .groupBy("name")
      .agg(count(lit(1)).as("n_neighbors"), min("nb").as("nearest"))
      .orderBy("name")
  }

  /** Heuristic language ID: per-language stopword hit-ratio, argmax with
    * alphabetical tie-break. Emits the predicted language and each score. */
  def langId(s: SparkSession, d: String): DataFrame = {
    val toks = docsWithTokens(s, d)
    val scoreCols = Stopwords.map { case (lang, words) =>
      (sum(when(col("w").isin(words: _*), 1).otherwise(0)).cast("double") /
        count(lit(1))).as(s"raw_$lang")
    }
    val agg = toks.groupBy("doc_id").agg(scoreCols.head, scoreCols.tail: _*)
    val langs = Stopwords.map(_._1)
    // argmax, earliest-alphabetical language wins ties
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((lang, i), elseCol) =>
        val geAll = langs.drop(i + 1)
          .map(other => col(s"raw_$lang") >= col(s"raw_$other"))
          .reduce(_ && _)
        when(geAll, lit(lang)).otherwise(elseCol)
    }
    val scores = langs.map(l => round(col(s"raw_$l"), 6).as(s"score_$l"))
    agg.select(col("doc_id") +: pred.as("pred_lang") +: scores: _*)
      .orderBy("doc_id")
  }

  /** Per-document quality metrics + a fixed-weight score:
    *  - n_tokens, mean token length
    *  - punct_ratio: share of chars outside [a-z0-9 ]
    *  - stop_ratio: share of tokens that are English stopwords
    *  - score = 0.35·min(1, n_tokens/50) + 0.35·(1 − punct_ratio)
    *          + 0.3·min(1, 4·stop_ratio)                           */
  def quality(s: SparkSession, d: String): DataFrame = {
    val en = Stopwords.toMap.apply("en")
    val toks = docsWithTokens(s, d)
    val agg = toks.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      (sum(when(col("w").isin(en: _*), 1).otherwise(0)).cast("double") /
        count(lit(1))).as("stop_ratio_raw"),
      first(col("text")).as("text"))
    agg.select(
      col("doc_id"),
      col("n_tokens"),
      round(length(regexp_replace(col("text"), " ", "")).cast("double") /
        col("n_tokens"), 6).as("mean_tok_len"),
      round(length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double") /
        length(col("text")), 6).as("punct_ratio"),
      round(col("stop_ratio_raw"), 6).as("stop_ratio"),
      round(
        lit(0.35) * least(lit(1.0), col("n_tokens").cast("double") / lit(50.0)) +
          lit(0.35) * (lit(1.0) -
            length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double") /
              length(col("text"))) +
          lit(0.3) * least(lit(1.0), lit(4.0) * col("stop_ratio_raw")),
        6).as("quality"))
      .orderBy("doc_id")
  }

  /** Low-quality threshold for [[qualityBySource]] in quality·10⁶
    * units (score < 0.5). Shared with the oracle. */
  val LowQualityPpm = 500000L

  /** QUALITY TRIAGE BY SOURCE — the third leg of the by-source report
    * family (`dedup_rate_by_source` names the duplicated feeds,
    * `text_mixture_dedup_shift` the mixture consequences; this names
    * the LOW-QUALITY feeds a filtering pass would cut): per source,
    * mean/min document quality and the share under [[LowQualityPpm]].
    * Each doc's 6-dp [[quality]] score is rounded to an exact ×10⁶
    * integer BEFORE aggregating, so the per-source means are integer
    * sums — no float summation order (per-doc scores themselves are
    * the hash-checked `text_quality` values).
    *
    * Scale: the quality projection is per-doc map-side work; the
    * roll-up is |sources|-sized. */
  def qualityBySource(s: SparkSession, d: String): DataFrame = {
    val q = quality(s, d).select(col("doc_id"),
      round(col("quality") * 1000000).cast("long").as("q"))
    q.join(Tables.documents(s, d).select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("cast(sum(cast(q as decimal(38,0))) div count(1) as bigint)")
          .as("mean_quality_ppm"),
        min("q").as("min_quality_ppm"),
        expr(s"count(case when q < $LowQualityPpm then 1 end) " +
          "* 1000000 div count(1)").as("low_quality_ppm"))
      .orderBy("source")
  }

  /** Whitespace token count + a BPE-ish regex token count (letter runs,
    * digit runs, single other non-space chars) + char count. */
  /** DOC-LENGTH PROFILE in log₂ token buckets — the planning input for
    * sequence packing (`text_sequence_pack`): how much of the corpus is
    * short enough to pack many-per-context, how much needs chunking.
    * Per bucket (floor(log₂ tokens) via the `length(bin(x))−1` integer
    * trick, bucket 0 holding 0- and 1-token docs): doc count, token
    * mass, and both as ppm shares of the corpus (1-row total
    * broadcast). Map-side token counting, ≤64-row result at any
    * corpus size. */
  def lengthProfile(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(size(WordShingles(col("text"), 1)).cast("long").as("t"))
      .select((length(bin(col("t"))) - 1).as("log2_bucket"), col("t"))
      .groupBy("log2_bucket")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("total_tokens"))
    val tot = docs.agg(sum("n_docs").as("nd"), sum("total_tokens").as("nt"))
    docs.crossJoin(broadcast(tot))
      .select(col("log2_bucket").cast("int").as("log2_bucket"),
        expr("shiftleft(cast(1 as bigint), log2_bucket)").as("tokens_lo"),
        col("n_docs"), col("total_tokens"),
        expr("cast((cast(n_docs as decimal(38,0)) * 1000000) " +
          "div nullif(nd, 0) as bigint)").as("docs_ppm"),
        expr("cast((cast(total_tokens as decimal(38,0)) * 1000000) " +
          "div nullif(nt, 0) as bigint)").as("tokens_ppm"))
      .orderBy("log2_bucket")
  }

  def tokenCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(WordShingles(col("text"), 1)).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("n_bpe_tokens"),
      length(col("text")).as("n_chars"))
      .orderBy("doc_id")

  /** Content fingerprints: whole-text md5 (exact-dup key), minimum
    * 2-shingle md5 (a 1-hash MinHash — stable under small edits), and the
    * distinct-shingle count. Shingles are de-duplicated BEFORE the
    * aggregation (one distinct instead of countDistinct's expand — min
    * over the distinct set is the same min). */
  val TopTermsK = 3
  val IdfScale = 1000L

  /** Integer tf-idf weight: the rational N/df idf, scaled by
    * [[IdfScale]] and floored, instead of a float log — cross-engine
    * exact (`//` on the DuckDB side). */
  private val tfIdfExpr = s"tf * ((n_docs * $IdfScale) div df)"

  /** Per-(doc, term) frequency joined with per-term document frequency
    * and the 1-row corpus count — the shared statistics behind
    * [[topTerms]] and [[docSimilarity]]. The df join is a vocab-sized
    * shuffle join (NOT broadcast: at corpus scale the vocabulary
    * outgrows the driver); only the corpus count is broadcast. */
  private def termStats(s: SparkSession, d: String): DataFrame = {
    val toks = docsWithTokens(s, d).select("doc_id", "w")
    val tf = toks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = toks.distinct().groupBy("w").agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "w").crossJoin(broadcast(nDocs))
  }

  /** Top-[[TopTermsK]] characteristic terms per document by the integer
    * tf-idf weight. */
  /** Result width / minimum pair support for [[collocations]]. */
  val CollocTopN = 30
  val CollocMinCount = 5L

  /** Corpus-size guard: lift staging multiplies a pair count by the
    * token total in BIGINT; capping tokens at 2·10⁹ bounds the product
    * by ~4·10¹⁸ < 2⁶³. Beyond it, shard the corpus or move the first
    * multiply into log space. */
  val MaxCollocTokens = 2000000000L

  /** COLLOCATION EXTRACTION — multiword expressions mined by LIFT
    * (exponentiated PMI): for each adjacent word pair,
    * `lift = P(xy) / (P(x)·P(y))` — how much more often the pair
    * co-occurs than independent unigram draws predict. High-lift pairs
    * are the fixed phrases a tokenizer should learn whole and a
    * dedup/shingle pipeline over-weights (the same statistic BPE's
    * merge counts approach from the frequency side; [[bpePairStats]]).
    * Top [[CollocTopN]] pairs at support ≥ [[CollocMinCount]].
    *
    * Cross-engine determinism: lift is staged as
    * `(((n·Tu) / n₁) · Tu / n₂) / Tb` — one BIGINT product (guarded by
    * [[MaxCollocTokens]]), then three IEEE double ops in a FIXED order,
    * so both engines produce bit-identical doubles; ordering ties break
    * on the words. Scale: two vocab-sized count aggs (map-side combine)
    * + two vocab-keyed equi-joins; totals attach as 1-row broadcasts;
    * the top-N plans as TakeOrderedAndProject. Reference analog: the
    * bigram `countCombos` frequency core (`mapreduce.erl:275-282`)
    * extended with the independence baseline. */
  def collocations(s: SparkSession, d: String): DataFrame = {
    val toks = docsWithTokens(s, d).select(col("w"))
    val uni = toks.groupBy("w").agg(count(lit(1)).as("nw"))
      .localCheckpoint() // consumed for both pair endpoints + the total
    val tuVal = uni.agg(sum("nw")).head().getLong(0)
    GraftRefusal.check(tuVal <= MaxCollocTokens,
      s"collocations refused: $tuVal tokens > $MaxCollocTokens - the " +
        "BIGINT lift staging (n*Tu) could overflow; shard the corpus " +
        "or restage the first multiply in log space")
    val bgs = Tables.documents(s, d)
      .select(explode(graft.functions.WordShingles(col("text"), 2))
        .as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
    val tb = bgs.agg(count(lit(1)).as("tb"))
    val bg = bgs.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .filter(col("n") >= CollocMinCount)
    bg.join(uni.select(col("w").as("w1"), col("nw").as("n1")), "w1")
      .join(uni.select(col("w").as("w2"), col("nw").as("n2")), "w2")
      .crossJoin(broadcast(tb))
      .select(col("w1"), col("w2"), col("n"),
        expr(s"round((((n * ${tuVal}L) / n1) * ${tuVal}L / n2) / tb, 6)")
          .as("lift"))
      .orderBy(desc("lift"), asc("w1"), asc("w2"))
      .limit(CollocTopN)
  }

  def topTerms(s: SparkSession, d: String): DataFrame = {
    val scored = termStats(s, d).withColumn("score", expr(tfIdfExpr))
    val wDoc = Window.partitionBy("doc_id").orderBy(desc("score"), asc("w"))
    scored.withColumn("rank", row_number().over(wDoc))
      .filter(col("rank") <= TopTermsK)
      .select(col("doc_id"), col("rank"), col("w").as("term"), col("score"))
      .orderBy("doc_id", "rank")
  }

  val DocSimThreshold = 0.6

  /** Sparse TF-IDF cosine similarity between documents — text-side
    * similarity search without embeddings, over the inverted index:
    * `cos(a,b) = Σ_t w_a(t)·w_b(t) / (|a|·|b|)` summed over SHARED
    * terms only (the term equi-join), never a dense pair join.
    *
    * Scale discipline:
    *  - df-CAP: terms with df > n_docs/10 (stopword-frequent) are pruned
    *    from weights AND norms — the inverted-index join is quadratic in
    *    df per term, and hyper-frequent terms carry ~zero idf signal
    *    anyway. The cap is relative to corpus size, computed on both
    *    engines from the same integers.
    *  - weights are pure integers (tf × rational scaled idf, like
    *    [[topTerms]]); only the final norm/cosine touches doubles, so
    *    sums are order-free and the oracle is exact. */
  def docSimilarity(s: SparkSession, d: String): DataFrame = {
    // weights feed norms + both sides of the pair join (3 consumers) —
    // localCheckpoint: one eager materialization of the vocab-bounded
    // weight frame, zero SQL-cache residue for library callers
    val weights = termStats(s, d)
      .filter(col("df") <= expr("n_docs div 10"))
      .select(col("doc_id"), col("w"), expr(tfIdfExpr).as("wt"))
      .localCheckpoint()
    val norms = weights.groupBy("doc_id").agg(sum(expr("wt * wt")).as("sq"))
    val dots = weights.toDF("a", "w", "wa")
      .join(weights.toDF("b", "w2", "wb"),
        col("w") === col("w2") && col("a") < col("b"))
      .groupBy("a", "b").agg(sum(expr("wa * wb")).as("dot"))
    dots.join(norms.toDF("a", "sqa"), "a").join(norms.toDF("b", "sqb"), "b")
      .withColumn("cosine",
        round(col("dot") / (sqrt(col("sqa")) * sqrt(col("sqb"))), 6))
      .filter(col("cosine") >= DocSimThreshold)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("cosine"))
      .orderBy("doc_a", "doc_b")
  }

  val Bm25K = 20
  val Bm25QueryTerms = 3

  /** BM25 document retrieval in EXACT integer arithmetic — the classic
    * probabilistic ranking function, cross-engine-checkable because the
    * standard constants are rationals that fold into integers:
    * with k1 = 6/5, b = 3/4 (and idf as [[tfIdfExpr]]'s scaled-integer
    * rational, not a float log),
    *
    *   score = idf · tf·(k1+1) / (tf + k1·(1−b) + k1·b·len·N/Σlen)
    *
    * multiplied through by 10·Σlen becomes
    *
    *   (idf·22·tf·Σlen) div (10·tf·Σlen + 3·Σlen + 9·len·N)
    *
    * — pure BIGINT ops, truncating division identical on both engines.
    * Overflow envelope: idf ≤ N·IdfScale; the numerator stays under
    * 2^63 while N·IdfScale·22·tf·Σlen does (≈3·10^16 at sf0.1; re-scale
    * IdfScale down for corpora beyond ~10^9 tokens).
    *
    * The "query" is self-derived (top-[[Bm25QueryTerms]] terms by df,
    * ties alphabetical) so the operator is deterministic per dataset.
    * Scale: tf/df/len are hash aggregations; query terms broadcast; the
    * scalar Σlen broadcast; ranking ends in TakeOrderedAndProject. */
  def bm25Retrieval(s: SparkSession, d: String): DataFrame = {
    val toks = docsWithTokens(s, d).select("doc_id", "w")
    val lens = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val sums = toks.agg(count(lit(1)).as("sumlen"))
    val stats = termStats(s, d) // (doc_id, w, tf, df, n_docs)
    val qterms = stats.select("w", "df").distinct()
      .orderBy(desc("df"), asc("w")).limit(Bm25QueryTerms)
      .select("w")
    stats.join(broadcast(qterms), "w")
      .join(lens, "doc_id")
      .crossJoin(broadcast(sums))
      .withColumn("idf_i", expr(s"(n_docs * $IdfScale) div df"))
      .withColumn("s_i", expr(
        "(idf_i * 22 * tf * sumlen) div " +
          "(10 * tf * sumlen + 3 * sumlen + 9 * len * n_docs)"))
      .groupBy("doc_id").agg(sum("s_i").as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id")).limit(Bm25K)
  }

  def fingerprint(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documentsSpread(s, d).select(
      col("doc_id"),
      substring(md5(col("text").cast("binary")), 1, 16).as("doc_md5"),
      explode(WordShingles(col("text"), 2)).as("s"))
      .distinct() // (doc_id, doc_md5, s): doc_md5 is functionally dependent
    sh.groupBy("doc_id").agg(
      min(col("doc_md5")).as("doc_md5"),
      min(substring(md5(col("s").cast("binary")), 1, 16)).as("shingle_min"),
      count(lit(1)).as("n_shingles"))
      .orderBy("doc_id")
  }

  /** Language-ID EVALUATION — confusion counts of [[langId]]'s
    * prediction against the corpus's labeled `lang` column (the fixture
    * carries ground truth; a production pipeline runs this over a
    * labeled audit sample). One row per (true, predicted) pair.
    *
    * Scale: the prediction is a per-doc aggregate, the truth a
    * projection of the same table; the doc_id equi-join shuffles one
    * row per doc, then the confusion aggregate is 25 cells max. */
  def langIdConfusion(s: SparkSession, d: String): DataFrame = {
    val pred = langId(s, d).select(col("doc_id"), col("pred_lang"))
    val truth = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    truth.join(pred, "doc_id")
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")
  }

  /** Vocabulary size for [[oovRate]] — the fixture corpus draws from a
    * ~31-word list, so a top-20 vocab leaves the rarest tail OOV. */
  val OovVocabSize = 20

  /** OUT-OF-VOCABULARY rate — the tokenizer-coverage signal of a
    * training pipeline: the corpus top-[[OovVocabSize]] terms by
    * frequency (ties broken by term, so the boundary is deterministic)
    * form the vocabulary; each doc reports the fraction of its token
    * OCCURRENCES outside it.
    *
    * Scale: vocab selection is a hash aggregate + TakeOrderedAndProject
    * (per-partition heap of V, driver merges V rows — never a global
    * sort); the membership probe is a broadcast left join at this V. A
    * BPE-scale vocabulary (10⁵–10⁶ rows) still broadcasts fine; beyond
    * that the probe becomes a shuffle equi-join on the term — same plan
    * shape as [[termStats]]' df join. */
  def oovRate(s: SparkSession, d: String): DataFrame = {
    val toks = docsWithTokens(s, d).select("doc_id", "w")
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w")).limit(OovVocabSize)
      .select(col("w"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6)
          .as("oov_rate"))
      .orderBy("doc_id")
  }

  /** Repetition flag threshold: random-word fixture docs land near
    * 1/(n_tokens−1) ≈ 0.01–0.1; a top bigram covering ≥ 5% of a doc's
    * bigram positions marks template/boilerplate-like repetition. */
  val RepetitionMaxRatio = 0.05

  /** Gopher-style REPETITION quality signal: the fraction of a doc's
    * bigram positions occupied by its single most frequent bigram
    * (duplicate-heavy boilerplate scores high; natural text low). Bigrams
    * keep duplicates (the multiset, NOT the distinct shingle set used by
    * the dedup operators — repetition is precisely the duplication).
    *
    * Scale: one explode + one (doc, bigram) hash aggregate + one per-doc
    * max — all partial-aggregatable, no joins, no windows. */
  /** Top pairs returned by [[bpePairStats]]. */
  val BpeTopPairs = 50

  /** TOKENIZER INDUCTION statistics — the merge-candidate table that
    * drives a BPE (byte-pair encoding) training step: for every
    * adjacent character pair inside every distinct word, the
    * frequency-weighted corpus occurrence count (`n_occ` — what BPE
    * maximizes when picking the next merge) and the distinct-word
    * support (`n_words`). The top row IS the first BPE merge; re-running
    * after applying a merge yields the next, so this operator is the
    * per-iteration workhorse of vocab induction over a corpus.
    *
    * Scale: pair generation runs over the DISTINCT-word frame (vocab),
    * not the corpus — the corpus-sized work is one word-count
    * aggregation with map-side combine; the pair explosion is
    * vocab × word-length, aggregated again with partial combine, and
    * the top-[[BpeTopPairs]] plans as TakeOrderedAndProject (bounded
    * heap, no global sort). This is exactly how production BPE trainers
    * structure the count step. Words shorter than 2 chars are dropped
    * BEFORE the position explode — Spark's `sequence(1, 0)` counts
    * DOWN ([1, 0]) where DuckDB's `generate_series(1, 0)` is empty, so
    * the guard is also a cross-engine parity requirement. */
  def bpePairStats(s: SparkSession, d: String): DataFrame = {
    val wf = Tables.documents(s, d)
      .select(explode(WordShingles(col("text"), 1)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .filter(length(col("w")) >= 2)
    wf.select(col("w"), col("f"),
        explode(expr("sequence(1, length(w) - 1)")).as("i"))
      .select(col("w"), col("f"), expr("substr(w, i, 2)").as("pair"))
      .groupBy("pair")
      .agg(sum("f").as("n_occ"), countDistinct("w").as("n_words"))
      .orderBy(desc("n_occ"), asc("pair")).limit(BpeTopPairs)
      .orderBy(desc("n_occ"), asc("pair"))
  }

  /** Number of merges [[bpeVocab]] performs (shared with the oracle,
    * which unrolls the same count). */
  val BpeMerges = 4

  /** BPE VOCABULARY INDUCTION — the iterative merge loop on top of
    * [[bpePairStats]]' counting step (VERDICT r6 item 6): each round
    * picks the highest-frequency adjacent token pair (ties to the
    * lexicographically smallest (a, b)), applies it to every word with
    * GREEDY LEFT-TO-RIGHT semantics (overlapping occurrences — only
    * possible when a = b, e.g. "aaaa" under (a,a) → [aa, aa] — resolve
    * by run parity), and recounts over the merged token sequences. The
    * first row reproduces [[bpePairStats]]' top row by construction.
    *
    * Everything is window arithmetic over the (word, pos, token) frame,
    * partitioned by word — so the greedy-overlap rule is expressible
    * identically in DuckDB and the oracle unrolls all [[BpeMerges]]
    * rounds exactly.
    *
    * Scale: the corpus-sized work is ONE word-frequency aggregation
    * (map-side combine); every merge round runs over the DISTINCT-word
    * frame (vocab × word-length rows, millions at web scale — not
    * corpus-sized), with per-word windows (vocab-many tiny partitions,
    * never a funnel). The chosen pair is a 1-row broadcast; the token
    * frame is localCheckpoint-ed per round ([[Similarity.kmeansCentroids]]
    * pattern) so the plan stays flat. Production BPE trainers iterate
    * this exact shape thousands of times; the driver query pins the
    * first [[BpeMerges]] rounds cross-engine. */
  def bpeVocab(s: SparkSession, d: String): DataFrame =
    bpeVocabOn(Tables.documentsSpread(s, d))

  /** [[bpeVocab]] over any (doc_id, text, ...) frame. */
  private[graft] def bpeVocabOn(docs: DataFrame): DataFrame =
    bpeMergeLoop(docs)._1

  /** Tokens [[bpeEncode]] reports (shared with the oracle). */
  val BpeEncodeTopN = 25

  /** BPE ENCODING — the vocabulary-usage report after applying the
    * [[BpeMerges]] trained merges to the distinct-word frame: per final
    * token, its length, total corpus occurrences (weighted by word
    * frequency) and the distinct words containing it, top
    * [[BpeEncodeTopN]]. This is the APPLY side of [[bpeVocab]]'s TRAIN
    * side — the operator a tokenization pipeline runs over every
    * incoming corpus once the merge table is frozen — and the merged
    * tokens (not the raw characters) are what surfaces: after 4 merges
    * the top rows are multi-char tokens.
    *
    * Scale: identical to [[bpeVocab]] (the loop IS the shared code
    * path) plus one vocab-sized partial+final aggregation; top-N plans
    * as TakeOrderedAndProject. */
  def bpeEncode(s: SparkSession, d: String): DataFrame =
    bpeEncodeOn(Tables.documents(s, d))

  /** [[bpeEncode]] over any (doc_id, text, ...) frame. */
  private[graft] def bpeEncodeOn(docs: DataFrame): DataFrame =
    bpeMergeLoop(docs)._2
      .groupBy(col("tok"))
      .agg(sum("f").as("n_occ"), countDistinct("w").as("n_words"))
      .select(col("tok"), length(col("tok")).cast("int").as("tok_len"),
        col("n_occ"), col("n_words"))
      .orderBy(desc("n_occ"), asc("tok")).limit(BpeEncodeTopN)
      .orderBy(desc("n_occ"), asc("tok"))

  /** The [[BpeMerges]]-round merge loop shared by [[bpeVocabOn]] (which
    * reads the per-round chosen pairs) and [[bpeEncodeOn]] (which reads
    * the final token frame). */
  private def bpeMergeLoop(docs: DataFrame): (DataFrame, DataFrame) = {
    val wf = docs
      .select(explode(WordShingles(col("text"), 1)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .filter(length(col("w")) >= 2)
    var toks = wf
      .select(col("w"), col("f"),
        explode(expr("sequence(1, length(w))")).as("pos"))
      .select(col("w"), col("f"), col("pos"),
        expr("substr(w, pos, 1)").as("tok"))
      .transform(Checkpoints.iter)
    val wOrd = Window.partitionBy("w").orderBy("pos")
    var merges = Seq.empty[DataFrame]
    for (i <- 1 to BpeMerges) {
      val pairs = toks.withColumn("nxt", lead(col("tok"), 1).over(wOrd))
      val top = pairs.filter(col("nxt").isNotNull)
        .groupBy("tok", "nxt").agg(sum("f").as("n_occ"))
        .orderBy(desc("n_occ"), asc("tok"), asc("nxt")).limit(1)
        .select(col("tok").as("a"), col("nxt").as("b"), col("n_occ"))
        .localCheckpoint() // 1 row: feeds the merge AND the output
      merges :+= top.select(lit(i).as("merge_idx"),
        concat(col("a"), col("b")).as("pair"),
        col("a"), col("b"), col("n_occ"))
      // apply the merge: flag match starts, keep alternate starts inside
      // equal-token runs (greedy), drop consumed successors, renumber
      val cand = pairs.crossJoin(broadcast(top.drop("n_occ")))
        .withColumn("cand",
          col("tok") === col("a") && col("nxt") <=> col("b"))
      val rnA = row_number().over(
        Window.partitionBy(col("w"), col("tok") === col("a"))
          .orderBy("pos"))
      val isl = cand.withColumn("isl",
        when(col("tok") === col("a"), col("pos") - rnA))
      val minPos = min(col("pos")).over(
        Window.partitionBy(col("w"), col("isl")))
      val kept = isl.withColumn("kept",
        col("cand") && (col("a") =!= col("b") ||
          (col("pos") - minPos) % 2 === 0))
      toks = kept
        .withColumn("consumed",
          coalesce(lag(col("kept"), 1).over(wOrd), lit(false)))
        .filter(!col("consumed"))
        .select(col("w"), col("f"),
          row_number().over(wOrd).as("pos"),
          when(col("kept"), concat(col("a"), col("b")))
            .otherwise(col("tok")).as("tok"))
        .transform(Checkpoints.iter)
    }
    (merges.reduce(_ union _).orderBy("merge_idx"), toks)
  }

  /** Width (words) of the shingles that carry novelty attribution. */
  val NoveltyShingleWords = 3

  /** N-GRAM NOVELTY — per-document fraction of its distinct
    * [[NoveltyShingleWords]]-shingles whose GLOBAL first occurrence
    * (minimum doc_id over the corpus) is this document. In arrival
    * order, novelty ≈ how much genuinely new text a document adds
    * beyond everything already ingested — the marginal-contribution
    * metric a pipeline owner reads when deciding whether a source is
    * still worth crawling (dedup tells you what to DROP; novelty tells
    * you what a source still BUYS). Docs shorter than the shingle
    * width carry no shingles and are naturally absent.
    *
    * Scale: shingles are hashed to 60-bit ids at the mapper
    * ([[Dedup.md5hash60]]) so the shuffle carries (hash, doc_id) longs,
    * never shingle text; first-occurrence is one partial+final min-agg
    * by hash; attribution is a hash equi-join back to the per-doc
    * shingle frame and one count-agg by doc — two shuffles total,
    * both on bounded-width keys. The reference analog is the shared-key
    * routing of `countCombos` pairs (`mapreduce.erl:216-229`). */
  def ngramNovelty(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documentsSpread(s, d)
      .select(col("doc_id"),
        explode(WordShingles(col("text"), NoveltyShingleWords)).as("sg"))
      .select(col("doc_id"), Dedup.md5hash60(col("sg")).as("h"))
      .distinct()
    val first = sh.groupBy("h").agg(min("doc_id").as("first_doc"))
    sh.join(first, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles"), 6)
          .as("novelty"))
      .orderBy("doc_id")
  }

  def repetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(WordShingles(col("text"), 2)).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), max("c").as("top_bigram_cnt"))
      .select(col("doc_id"), col("n_bigrams"), col("top_bigram_cnt"),
        round(col("top_bigram_cnt").cast("double") / col("n_bigrams"), 6)
          .as("rep_ratio"),
        (col("top_bigram_cnt").cast("double") / col("n_bigrams") >=
          RepetitionMaxRatio).as("repetitive"))
      .orderBy("doc_id")

  /** Hashed feature-vector width for [[featureHash]]. */
  val FhBuckets = 64L

  /** Audit-slice modulus: [[featureHash]] vectorizes doc_id ≡ 0
    * (mod [[FhSampleMod]]) — the driver-gate slice; production runs
    * drop the filter. */
  val FhSampleMod = 20

  /** THE HASHING TRICK (Weinberger et al., ICML'09): bag-of-words term
    * frequencies hashed into a fixed [[FhBuckets]]-wide signed feature
    * vector — the stateless, vocabulary-free featurization linear
    * models and hashed n-gram baselines train on. Bucket = md5-60 of
    * the token mod width; sign = parity of the next hash bits (the
    * unbiased ±1 estimator); per-doc bucket values are signed token
    * counts, emitted sparse (zero-sum buckets dropped).
    *
    * Scale: explode → one (doc, bucket) partial+final agg; no
    * vocabulary state, no dictionary broadcast, no shuffle wider than
    * the output. The md5 hash is the engine-portable one everywhere
    * else in this repo ([[Dedup.md5hash60]]). */
  def featureHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") % FhSampleMod === 0)
      .select(col("doc_id"), explode(WordShingles(col("text"), 1)).as("w"))
      .withColumn("h", Dedup.md5hash60(col("w")))
      .select(col("doc_id"), (col("h") % FhBuckets).as("bucket"),
        when(expr(s"(h div $FhBuckets) % 2") === 0, lit(1L))
          .otherwise(lit(-1L)).as("sign"))
      .groupBy("doc_id", "bucket")
      .agg(sum(col("sign")).as("fval"))
      .filter(col("fval") =!= 0)
      .orderBy("doc_id", "bucket")

  /** TOKENIZER FERTILITY by language — tokens-per-word, the metric a
    * multilingual pipeline tracks to spot languages a tokenizer
    * over-fragments (fertility ≫ 1 ⇒ more compute per word, worse
    * downstream quality). Reuses [[tokenCounts]]'s two tokenizations
    * (whitespace words vs the BPE-ish regex) aggregated per `lang` in
    * exact integers; the fertility ratio is integer parts-per-thousand
    * (bpe·1000 div ws — `div` ≡ `//`).
    *
    * Scale: one scan, two codegen'd per-row counters, a #langs-sized
    * partial+final agg. */
  def tokenFertility(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"),
        size(WordShingles(col("text"), 1)).cast("long").as("ws"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("bpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("ws").as("n_words"),
        sum("bpe").as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        expr("(n_tokens * 1000) div n_words").as("fertility_ppk"))
      .orderBy("lang")

  /** ZIPF FREQUENCY-SPECTRUM audit — the corpus-health check that a
    * vocabulary's rank-frequency curve looks natural-language-shaped:
    * per power-of-two frequency bucket (`⌊log2 f⌋` via `length(bin(f))`
    * — exact integer, no float log), the number of DISTINCT words and
    * total token mass, plus the word-count ratio to the next-higher
    * bucket in exact ppm. Under Zipf's law with exponent s, the count
    * of words in bucket b scales as 2^(−b·(1−1/s))·…; for s = 1 each
    * doubling of frequency roughly HALVES the word count (ratio ≈
    * 500000 ppm in the mid-spectrum) — machine-generated or template
    * spam shows up as a spectrum collapsed into few buckets or a flat
    * ratio — the driver fixture (uniform-vocabulary generator text)
    * collapses to TWO buckets, which is precisely the machine-text
    * signature this audit exists to flag; the planted-Zipf spec shows
    * the natural-language shape. The spectrum formulation deliberately
    * avoids ranking: a
    * global `row_number` over the vocabulary is a single-partition
    * funnel at 100 TB, while the log2 histogram is one partial+final
    * aggregate over the word-count frame.
    *
    * Scale: one token explode → word-keyed count (map-side combine),
    * then a ≤ 64-bucket aggregate and a self-join on bucket+1 over
    * ≤ 64 rows. */
  def zipfSpectrum(s: SparkSession, d: String): DataFrame =
    zipfSpectrumOn(Tables.documents(s, d))

  /** [[zipfSpectrum]] over any (doc_id, text) frame. */
  private[graft] def zipfSpectrumOn(docs: DataFrame): DataFrame = {
    val freq = docs
      .select(explode(WordShingles(col("text"), 1)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val buckets = freq
      .select((length(bin(col("f"))) - 1).as("b"), col("f"))
      .groupBy("b")
      .agg(count(lit(1)).as("n_words"), sum("f").as("n_tokens"))
    buckets
      .join(buckets.select((col("b") - 1).as("b"),
        col("n_words").as("n_words_next")), Seq("b"), "left")
      .select(col("b").as("log2_bucket"),
        expr("shiftleft(cast(1 as bigint), log2_bucket)").as("freq_lo"),
        col("n_words"), col("n_tokens"),
        coalesce(col("n_words_next"), lit(0L)).as("n_words_next"),
        when(col("n_words_next").isNull, lit(null).cast("long"))
          .otherwise(expr("n_words_next * 1000000 div n_words"))
          .as("decay_ppm"))
      .orderBy("log2_bucket")
  }
}

/** DuckDB oracles for [[TextAnalysis]], generated from the same lists
  * and formulas. */
object TextAnalysisOracles {
  import TextAnalysis.Stopwords

  private val toksCte =
    """toks AS (
      |  SELECT doc_id, text,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |  FROM documents
      |)""".stripMargin

  private def inList(words: Seq[String]) =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** SymSpell positional deletion-neighborhood joins over customer
    * names, replicated: substitutions meet at the same (deletion
    * string, position); insertions where a word IS another's deletion —
    * both exact by construction (no verify stage), same symmetric
    * per-name aggregate. */
  val fuzzyNames: String =
    s"""WITH words AS (
       |  SELECT DISTINCT c_name AS w FROM customer
       |  WHERE length(c_name) >= ${TextAnalysis.TypoMinWordLen}
       |),
       |dels AS (
       |  SELECT w, substr(w, 1, i - 1) || substr(w, i + 1) AS k, i AS p
       |  FROM words, unnest(generate_series(1, length(w))) t(i)
       |),
       |subs AS (
       |  SELECT a.w AS word_a, b.w AS word_b
       |  FROM dels a JOIN dels b ON a.k = b.k AND a.p = b.p AND a.w < b.w
       |),
       |ins AS (
       |  SELECT least(d.w, ws.w) AS word_a, greatest(d.w, ws.w) AS word_b
       |  FROM dels d JOIN words ws ON d.k = ws.w
       |),
       |pairs AS (
       |  SELECT DISTINCT word_a, word_b FROM (
       |    SELECT word_a, word_b FROM subs
       |    UNION ALL SELECT word_a, word_b FROM ins
       |  )
       |),
       |und AS (
       |  SELECT word_a AS name, word_b AS nb FROM pairs
       |  UNION ALL
       |  SELECT word_b AS name, word_a AS nb FROM pairs
       |)
       |SELECT name, count(*) AS n_neighbors, min(nb) AS nearest
       |FROM und GROUP BY 1 ORDER BY name""".stripMargin

  /** Replicates [[TextAnalysis.ngramNovelty]]: distinct hashed
    * 3-word shingles per doc, global first-occurrence min-agg, per-doc
    * novel fraction — the same 60-bit md5 hash on both engines. */
  val ngramNovelty: String = {
    val W = TextAnalysis.NoveltyShingleWords
    val shingle = (0 until W).map(k => s"ws[i+$k]").mkString(" || ' ' || ")
    s"""WITH wl AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM documents
       |),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |    ('0x' || substr(md5($shingle), 1, 15))::BIGINT AS h
       |  FROM wl, unnest(generate_series(1, len(ws) - ${W - 1})) t(i)
       |),
       |fo AS (SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY 1)
       |SELECT s.doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN fo.first_doc = s.doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_novel,
       |  round(sum(CASE WHEN fo.first_doc = s.doc_id THEN 1 ELSE 0 END)
       |    * 1.0 / count(*), 6) AS novelty
       |FROM sh s JOIN fo USING (h)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val langId: String = {
    val langs = Stopwords.map(_._1)
    val scoreExprs = Stopwords.map { case (lang, words) =>
      s"sum(CASE WHEN w IN ${inList(words)} THEN 1 ELSE 0 END)::DOUBLE / count(*) AS raw_$lang"
    }.mkString(",\n    ")
    val pred = {
      val cases = langs.init.zipWithIndex.map { case (lang, i) =>
        val conds = langs.drop(i + 1).map(o => s"raw_$lang >= raw_$o")
          .mkString(" AND ")
        s"WHEN $conds THEN '$lang'"
      }.mkString(" ")
      s"CASE $cases ELSE '${langs.last}' END"
    }
    val scores = langs.map(l => s"round(raw_$l, 6) AS score_$l").mkString(", ")
    s"""WITH $toksCte,
       |agg AS (
       |  SELECT doc_id,
       |    $scoreExprs
       |  FROM toks GROUP BY doc_id
       |)
       |SELECT doc_id, $pred AS pred_lang, $scores
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** [[quality]] without the final ORDER BY — embeddable as a CTE body
    * (used by the composed curation-pipeline oracle). */
  val qualityCore: String = {
    val en = inList(Stopwords.toMap.apply("en"))
    s"""WITH $toksCte,
       |agg AS (
       |  SELECT doc_id, any_value(text) AS text, count(*) AS n_tokens,
       |    sum(CASE WHEN w IN $en THEN 1 ELSE 0 END)::DOUBLE / count(*) AS stop_ratio_raw
       |  FROM toks GROUP BY doc_id
       |)
       |SELECT doc_id, n_tokens,
       |  round(length(regexp_replace(text, ' ', '', 'g'))::DOUBLE / n_tokens, 6) AS mean_tok_len,
       |  round(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE / length(text), 6) AS punct_ratio,
       |  round(stop_ratio_raw, 6) AS stop_ratio,
       |  round(
       |    0.35 * least(1.0, n_tokens::DOUBLE / 50.0) +
       |    0.35 * (1.0 - length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE / length(text)) +
       |    0.3 * least(1.0, 4.0 * stop_ratio_raw), 6) AS quality
       |FROM agg""".stripMargin
  }

  val quality: String = s"$qualityCore ORDER BY doc_id"

  /** Replicates [[TextAnalysis.qualityBySource]] — the [[qualityCore]]
    * pipeline as a derived table, per-doc ×10⁶ integerization, HUGEINT
    * roll-up. */
  val qualityBySource: String =
    s"""WITH qx AS (SELECT doc_id, quality FROM ($qualityCore) t),
       |j AS (
       |  SELECT d.source, round(q.quality * 1000000)::BIGINT AS q
       |  FROM qx q JOIN documents d USING (doc_id)
       |)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |  (sum(q)::HUGEINT // count(*))::BIGINT AS mean_quality_ppm,
       |  min(q)::BIGINT AS min_quality_ppm,
       |  (count(CASE WHEN q < ${TextAnalysis.LowQualityPpm} THEN 1 END)
       |    * 1000000 // count(*))::BIGINT AS low_quality_ppm
       |FROM j GROUP BY 1 ORDER BY source""".stripMargin

  val docSimilarity: String =
    s"""WITH $toksCte,
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dfq AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |wts AS (
       |  SELECT tf.doc_id, tf.w,
       |    tf.tf * ((n.n_docs * ${TextAnalysis.IdfScale}) // dfq.df) AS wt
       |  FROM tf JOIN dfq USING (w), n
       |  WHERE dfq.df <= n.n_docs // 10
       |),
       |norms AS (SELECT doc_id, sum(wt * wt)::BIGINT AS sq FROM wts GROUP BY 1),
       |dots AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, sum(a.wt * b.wt)::BIGINT AS dot
       |  FROM wts a JOIN wts b ON a.w = b.w AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT da AS doc_a, db AS doc_b,
       |  round(dot / (sqrt(na.sq) * sqrt(nb.sq)), 6) AS cosine
       |FROM dots JOIN norms na ON da = na.doc_id JOIN norms nb ON db = nb.doc_id
       |WHERE round(dot / (sqrt(na.sq) * sqrt(nb.sq)), 6) >= ${TextAnalysis.DocSimThreshold}
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Replicates the integer BM25 exactly: same scaled-integer idf, same
    * folded rational constants (22/10/3/9 from k1=6/5, b=3/4), same
    * truncating divisions. */
  val bm25Retrieval: String =
    s"""WITH $toksCte,
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dfq AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |lens AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
       |tot AS (SELECT count(*) AS sumlen FROM toks),
       |q AS (SELECT w FROM dfq ORDER BY df DESC, w LIMIT ${TextAnalysis.Bm25QueryTerms}),
       |sc AS (
       |  SELECT tf.doc_id,
       |    (((n.n_docs * ${TextAnalysis.IdfScale}) // dfq.df) * 22 * tf.tf * tot.sumlen)
       |      // (10 * tf.tf * tot.sumlen + 3 * tot.sumlen + 9 * lens.len * n.n_docs) AS s
       |  FROM tf JOIN q USING (w) JOIN dfq USING (w) JOIN lens USING (doc_id), n, tot
       |)
       |SELECT doc_id, sum(s)::BIGINT AS bm25 FROM sc GROUP BY 1
       |ORDER BY bm25 DESC, doc_id LIMIT ${TextAnalysis.Bm25K}""".stripMargin

  /** Same counts, same staged `(((n·Tu)/n₁)·Tu/n₂)/Tb` lift (one BIGINT
    * product then three fixed-order IEEE double ops — bit-identical),
    * same rounded-lift ordering and top-N cut. */
  val collocations: String =
    s"""WITH wl AS (
       |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM documents
       |),
       |toks AS (SELECT unnest(ws) AS w FROM wl),
       |uni AS (SELECT w, count(*) AS nw FROM toks GROUP BY 1),
       |tu AS (SELECT CAST(sum(nw) AS BIGINT) AS tu FROM uni),
       |bgs AS (
       |  SELECT ws[i] AS w1, ws[i + 1] AS w2
       |  FROM wl, unnest(generate_series(1, len(ws) - 1)) t(i)
       |  WHERE len(ws) >= 2
       |),
       |tb AS (SELECT count(*) AS tb FROM bgs),
       |bg AS (
       |  SELECT w1, w2, count(*) AS n FROM bgs GROUP BY 1, 2
       |  HAVING count(*) >= ${TextAnalysis.CollocMinCount}
       |)
       |SELECT bg.w1, bg.w2, bg.n,
       |  round((((bg.n * tu.tu) / u1.nw) * tu.tu / u2.nw) / tb.tb, 6)
       |    AS lift
       |FROM bg
       |JOIN uni u1 ON u1.w = bg.w1
       |JOIN uni u2 ON u2.w = bg.w2
       |CROSS JOIN tu CROSS JOIN tb
       |ORDER BY lift DESC, w1, w2
       |LIMIT ${TextAnalysis.CollocTopN}""".stripMargin

  val topTerms: String =
    s"""WITH $toksCte,
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dfq AS (SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.w,
       |    tf.tf * ((n.n_docs * ${TextAnalysis.IdfScale}) // dfq.df) AS score
       |  FROM tf JOIN dfq USING (w), n
       |),
       |ranked AS (
       |  SELECT doc_id, w, score,
       |    CAST(row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, w) AS INTEGER) AS rank
       |  FROM scored
       |)
       |SELECT doc_id, rank, w AS term, score FROM ranked
       |WHERE rank <= ${TextAnalysis.TopTermsK}
       |ORDER BY doc_id, rank""".stripMargin

  /** Replicates [[TextAnalysis.lengthProfile]] — same bin-length bucket,
    * HUGEINT ppm arithmetic. */
  val lengthProfile: String =
    """WITH dl AS (
      |  SELECT len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS t
      |  FROM documents
      |),
      |b AS (
      |  SELECT CAST(length(bin(t)) - 1 AS INTEGER) AS log2_bucket,
      |    count(*)::BIGINT AS n_docs, sum(t)::BIGINT AS total_tokens
      |  FROM dl GROUP BY 1
      |),
      |tot AS (
      |  SELECT sum(n_docs)::HUGEINT AS nd, sum(total_tokens)::HUGEINT AS nt FROM b
      |)
      |SELECT log2_bucket, (1::BIGINT << log2_bucket) AS tokens_lo,
      |  n_docs, total_tokens,
      |  ((n_docs::HUGEINT * 1000000) // nullif(nd, 0))::BIGINT AS docs_ppm,
      |  ((total_tokens::HUGEINT * 1000000) // nullif(nt, 0))::BIGINT AS tokens_ppm
      |FROM b, tot
      |ORDER BY log2_bucket""".stripMargin

  val tokenCounts: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INTEGER) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpe_tokens,
      |  CAST(length(text) AS INTEGER) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  val fingerprint: String =
    """WITH wl AS (
      |  SELECT doc_id, substr(md5(text), 1, 16) AS doc_md5,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents
      |),
      |sh AS (
      |  SELECT doc_id, doc_md5, ws[i] || ' ' || ws[i+1] AS s
      |  FROM wl, unnest(generate_series(1, len(ws) - 1)) t(i)
      |)
      |SELECT doc_id, min(doc_md5) AS doc_md5,
      |  min(substr(md5(s), 1, 16)) AS shingle_min,
      |  count(DISTINCT s) AS n_shingles
      |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val langIdConfusion: String =
    s"""WITH p AS ($langId)
       |SELECT d.lang, p.pred_lang, count(*) AS n
       |FROM p JOIN documents d USING (doc_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val oovRate: String =
    s"""WITH $toksCte,
       |vc AS (SELECT w, count(*) AS cnt FROM toks GROUP BY 1),
       |v AS (SELECT w, 1 AS in_vocab FROM vc
       |      ORDER BY cnt DESC, w LIMIT ${TextAnalysis.OovVocabSize})
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  round(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS oov_rate
       |FROM toks LEFT JOIN v USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** BPE merge-candidate stats: distinct-word frequencies, adjacent
    * char pairs by position, frequency-weighted counts — replicates
    * [[TextAnalysis.bpePairStats]] (DuckDB's empty `generate_series(1,0)`
    * matches the Spark side's explicit length ≥ 2 guard). */
  val bpePairStats: String =
    s"""WITH $toksCte,
       |wf AS (
       |  SELECT w, count(*) AS f FROM toks GROUP BY w HAVING length(w) >= 2
       |),
       |prs AS (
       |  SELECT substr(w, i, 2) AS pair, w, f
       |  FROM wf, unnest(generate_series(1, length(w) - 1)) t(i)
       |)
       |SELECT pair, CAST(sum(f) AS BIGINT) AS n_occ,
       |  count(DISTINCT w) AS n_words
       |FROM prs GROUP BY pair
       |ORDER BY n_occ DESC, pair LIMIT ${TextAnalysis.BpeTopPairs}""".stripMargin

  /** Unrolls all [[TextAnalysis.BpeMerges]] merge rounds of
    * [[TextAnalysis.bpeVocab]]: per round, pick the top pair (same
    * (n_occ DESC, a, b) total order), mark greedy-left-to-right match
    * starts (run-parity for a = b), drop consumed successors, renumber,
    * recount. Pure window arithmetic — both engines compute the
    * identical token sequences. */
  /** The shared WITH-body for [[bpeVocab]] and [[bpeEncode]]: the
    * char-token frame t0 plus all unrolled merge rounds (t1..tN and
    * their top-pair CTEs). */
  private def bpeRoundsCtes: String = {
    val n = TextAnalysis.BpeMerges
    val iters = (1 to n).map { i =>
      s"""p$i AS (
         |  SELECT w, f, pos, tok,
         |    lead(tok) OVER (PARTITION BY w ORDER BY pos) AS nxt
         |  FROM t${i - 1}
         |),
         |top$i AS (
         |  SELECT tok AS a, nxt AS b, CAST(sum(f) AS BIGINT) AS n_occ
         |  FROM p$i WHERE nxt IS NOT NULL
         |  GROUP BY 1, 2 ORDER BY n_occ DESC, a, b LIMIT 1
         |),
         |c$i AS (
         |  SELECT p.*, t.a, t.b,
         |    CASE WHEN p.tok = t.a AND p.nxt = t.b THEN 1 ELSE 0 END AS cand,
         |    CASE WHEN p.tok = t.a THEN p.pos - row_number()
         |      OVER (PARTITION BY p.w, (p.tok = t.a) ORDER BY p.pos) END AS isl
         |  FROM p$i p CROSS JOIN top$i t
         |),
         |k$i AS (
         |  SELECT *, CASE WHEN cand = 1 AND (a <> b OR
         |      (pos - min(pos) OVER (PARTITION BY w, isl)) % 2 = 0)
         |    THEN 1 ELSE 0 END AS kept
         |  FROM c$i
         |),
         |g$i AS (
         |  SELECT *, coalesce(lag(kept)
         |    OVER (PARTITION BY w ORDER BY pos), 0) AS consumed
         |  FROM k$i
         |),
         |t$i AS (
         |  SELECT w, f, row_number() OVER (PARTITION BY w ORDER BY pos) AS pos,
         |    CASE WHEN kept = 1 THEN tok || nxt ELSE tok END AS tok
         |  FROM g$i WHERE consumed = 0
         |)""".stripMargin
    }.mkString(",\n")
    s"""$toksCte,
       |wf AS (
       |  SELECT w, count(*) AS f FROM toks GROUP BY w HAVING length(w) >= 2
       |),
       |t0 AS (
       |  SELECT w, f, i AS pos, substr(w, i, 1) AS tok
       |  FROM wf, unnest(generate_series(1, length(w))) t(i)
       |),
       |$iters""".stripMargin
  }

  val bpeVocab: String = {
    val n = TextAnalysis.BpeMerges
    val out = (1 to n).map(i =>
      s"SELECT CAST($i AS INTEGER) AS merge_idx, a || b AS pair, a, b, n_occ FROM top$i")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH $bpeRoundsCtes
       |SELECT * FROM (
       |  $out
       |) ORDER BY merge_idx""".stripMargin
  }

  /** Final-token usage table of [[TextAnalysis.bpeEncode]]: aggregate
    * the last merge round's token frame. */
  val bpeEncode: String =
    s"""WITH $bpeRoundsCtes
       |SELECT * FROM (
       |  SELECT tok, CAST(length(tok) AS INTEGER) AS tok_len,
       |    CAST(sum(f) AS BIGINT) AS n_occ,
       |    count(DISTINCT w) AS n_words
       |  FROM t${TextAnalysis.BpeMerges} GROUP BY tok
       |  ORDER BY n_occ DESC, tok LIMIT ${TextAnalysis.BpeEncodeTopN}
       |) ORDER BY n_occ DESC, tok""".stripMargin

  val repetition: String =
    s"""WITH wl AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM documents
       |),
       |bg AS (
       |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b
       |  FROM wl, unnest(generate_series(1, len(ws) - 1)) t(i)
       |),
       |c AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
       |agg AS (
       |  SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_cnt
       |  FROM c GROUP BY 1
       |)
       |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       |  CAST(top_bigram_cnt AS BIGINT) AS top_bigram_cnt,
       |  round(top_bigram_cnt * 1.0 / n_bigrams, 6) AS rep_ratio,
       |  top_bigram_cnt * 1.0 / n_bigrams >=
       |    ${TextAnalysis.RepetitionMaxRatio} AS repetitive
       |FROM agg ORDER BY doc_id""".stripMargin

  /** Replicates [[TextAnalysis.featureHash]] — same md5-60 bucket and
    * sign-parity arithmetic, sparse non-zero output. */
  val featureHash: String = {
    import TextAnalysis.{FhBuckets => B, FhSampleMod => M}
    s"""WITH w AS (
       |  SELECT doc_id,
       |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
       |  FROM documents WHERE doc_id % $M = 0
       |),
       |h AS (
       |  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
       |  FROM w
       |)
       |SELECT doc_id, h % $B AS bucket,
       |  sum(CASE WHEN (h // $B) % 2 = 0 THEN 1 ELSE -1 END)::BIGINT
       |    AS fval
       |FROM h GROUP BY 1, 2
       |HAVING sum(CASE WHEN (h // $B) % 2 = 0 THEN 1 ELSE -1 END) <> 0
       |ORDER BY doc_id, bucket""".stripMargin
  }

  /** Replicates [[TextAnalysis.tokenFertility]] — same two token
    * counters, integer parts-per-thousand ratio. */
  val tokenFertility: String =
    """WITH t AS (
      |  SELECT lang,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS BIGINT) AS ws,
      |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
      |      AS BIGINT) AS bpe
      |  FROM documents
      |)
      |SELECT lang, count(*) AS n_docs, sum(ws)::BIGINT AS n_words,
      |  sum(bpe)::BIGINT AS n_tokens,
      |  (sum(bpe)::BIGINT * 1000) // sum(ws)::BIGINT AS fertility_ppk
      |FROM t GROUP BY 1 ORDER BY lang""".stripMargin

  /** Replicates [[TextAnalysis.zipfSpectrumOn]]: the identical
    * `length(bin(f)) − 1` exact log2 bucketing and bucket+1 decay
    * ratio in truncating integer ppm. */
  val zipfSpectrum: String =
    s"""WITH $toksCte,
       |freq AS (SELECT w, count(*) AS f FROM toks GROUP BY 1),
       |bkt AS (
       |  SELECT CAST(length(bin(f)) - 1 AS INTEGER) AS b,
       |    count(*) AS n_words, CAST(sum(f) AS BIGINT) AS n_tokens
       |  FROM freq GROUP BY 1)
       |SELECT a.b AS log2_bucket, (1::BIGINT << a.b) AS freq_lo,
       |  a.n_words, a.n_tokens,
       |  COALESCE(n2.n_words, 0) AS n_words_next,
       |  CASE WHEN n2.n_words IS NULL THEN NULL
       |       ELSE CAST((n2.n_words * 1000000) // a.n_words AS BIGINT)
       |  END AS decay_ppm
       |FROM bkt a LEFT JOIN bkt n2 ON n2.b = a.b + 1
       |ORDER BY log2_bucket""".stripMargin
}
