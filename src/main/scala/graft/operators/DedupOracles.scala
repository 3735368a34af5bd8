package graft.operators

/** DuckDB oracle SQL for the [[Dedup]] suite, generated from the SAME
  * constants as the Spark pipeline (minhash coefficients, band layout,
  * thresholds) so the approximate operators are checked exactly —
  * the oracle replicates the full portable md5-based pipeline in SQL. */
object DedupOracles {

  private val wordsCtes =
    """wl AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents
      |)""".stripMargin

  private val shinglesCte =
    """sh AS (
      |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      |  FROM wl, unnest(generate_series(1, len(ws) - 2)) t(i)
      |)""".stripMargin

  private val sizesCte = "sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1)"

  private val interCte =
    """inter AS (
      |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)""".stripMargin

  val exact: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  val jaccardPairs: String =
    s"""WITH $wordsCtes, $shinglesCte, $sizesCte, $interCte
       |SELECT i AS doc_a, j AS doc_b,
       |  round(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
       |FROM inter JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
       |WHERE c * 1.0 / (sa.sz + sb.sz - c) >= ${Dedup.JaccardThreshold}
       |ORDER BY doc_a, doc_b""".stripMargin

  val containmentPairs: String =
    s"""WITH $wordsCtes, $shinglesCte, $sizesCte, $interCte
       |SELECT i AS doc_a, j AS doc_b,
       |  round(c * 1.0 / least(sa.sz, sb.sz), 6) AS containment
       |FROM inter JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
       |WHERE c * 1.0 / least(sa.sz, sb.sz) >= ${Dedup.ContainmentThreshold}
       |ORDER BY doc_a, doc_b""".stripMargin

  /** The minhash band CTE chain (h → sig → bands), generated from the
    * SAME coefficients as the Spark pipeline — shared by every
    * banding-first oracle; each appends its own `cand` CTE (symmetric
    * for [[minhashLsh]]/[[containmentLsh]], parity-asymmetric for
    * [[incrementalDedup]]), mirroring `Dedup.minhashBandsOn`. */
  private val minhashBandCtes: String = {
    import Dedup.MinHashParams._
    val P = Dedup.P
    val minExprs = (0 until K).map(i =>
      s"min((${A(i)} * hv + ${B(i)}) % $P) AS mh$i").mkString(",\n    ")
    val bandSelects = (0 until Bands).map(b =>
      s"SELECT doc_id, $b AS band, mh${2 * b} * $P + mh${2 * b + 1} AS bkey FROM sig")
      .mkString("\n  UNION ALL ")
    s"""h AS (
       |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % $P AS hv FROM sh
       |),
       |sig AS (
       |  SELECT doc_id,
       |    $minExprs
       |  FROM h GROUP BY doc_id
       |),
       |bands AS (
       |  $bandSelects
       |)""".stripMargin
  }

  private val minhashCandCtes: String =
    s"""$minhashBandCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |)""".stripMargin

  val minhashLsh: String =
    s"""WITH $wordsCtes, $shinglesCte,
       |$minhashCandCtes,
       |$sizesCte, $interCte
       |SELECT cand.i AS doc_a, cand.j AS doc_b,
       |  round(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
       |FROM cand
       |JOIN inter ON cand.i = inter.i AND cand.j = inter.j
       |JOIN sizes sa ON cand.i = sa.doc_id JOIN sizes sb ON cand.j = sb.doc_id
       |WHERE c * 1.0 / (sa.sz + sb.sz - c) >= ${Dedup.JaccardThreshold}
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Asymmetric banding (new batch × existing corpus on doc_id parity)
    * + exact-Jaccard verify + best-match window — replicates
    * `Dedup.incrementalDedup` end-to-end, including the rank over the
    * 6-dp-rounded jaccard both engines compute. */
  val incrementalDedup: String =
    s"""WITH $wordsCtes, $shinglesCte,
       |$minhashBandCtes,
       |cand AS (
       |  SELECT DISTINCT least(a.doc_id, b.doc_id) AS i,
       |                  greatest(a.doc_id, b.doc_id) AS j
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
       |),
       |$sizesCte, $interCte,
       |matched AS (
       |  SELECT CASE WHEN cand.i % 2 = 1 THEN cand.i ELSE cand.j END AS doc_id,
       |         CASE WHEN cand.i % 2 = 1 THEN cand.j ELSE cand.i END AS dup_of,
       |         round(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jaccard
       |  FROM cand
       |  JOIN inter ON cand.i = inter.i AND cand.j = inter.j
       |  JOIN sizes sa ON cand.i = sa.doc_id JOIN sizes sb ON cand.j = sb.doc_id
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= ${Dedup.JaccardThreshold}
       |),
       |ranked AS (
       |  SELECT doc_id, dup_of, jaccard,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY jaccard DESC, dup_of) AS rn
       |  FROM matched
       |)
       |SELECT doc_id, dup_of, jaccard FROM ranked WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  /** [[incrementalDedup]] minus the best-match rank — every confirmed
    * (new doc, corpus doc) match ≥ threshold, in stream orientation:
    * replicates `EventStream.incrementalDedupStreamVerified` (the
    * stream's per-row banding computes the identical band keys, so the
    * batch-shaped SQL is the exact twin). */
  val incrementalDedupStream: String =
    s"""WITH $wordsCtes, $shinglesCte,
       |$minhashBandCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS n, b.doc_id AS o
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
       |),
       |$sizesCte, $interCte
       |SELECT cand.n AS doc_id, cand.o AS dup_of,
       |  round(c * 1.0 / (sn.sz + so.sz - c), 6) AS jaccard
       |FROM cand
       |JOIN inter ON least(cand.n, cand.o) = inter.i
       |          AND greatest(cand.n, cand.o) = inter.j
       |JOIN sizes sn ON cand.n = sn.doc_id
       |JOIN sizes so ON cand.o = so.doc_id
       |WHERE c * 1.0 / (sn.sz + so.sz - c) >= ${Dedup.JaccardThreshold}
       |ORDER BY doc_id, dup_of""".stripMargin

  /** Banding-first containment: the same band-candidate CTEs as
    * [[minhashLsh]], with the |A∩B| / min(|A|,|B|) verify — replicates
    * `Dedup.containmentLshPairs` end-to-end. */
  val containmentLsh: String =
    s"""WITH $wordsCtes, $shinglesCte,
       |$minhashCandCtes,
       |$sizesCte, $interCte
       |SELECT cand.i AS doc_a, cand.j AS doc_b,
       |  round(c * 1.0 / least(sa.sz, sb.sz), 6) AS containment
       |FROM cand
       |JOIN inter ON cand.i = inter.i AND cand.j = inter.j
       |JOIN sizes sa ON cand.i = sa.doc_id JOIN sizes sb ON cand.j = sb.doc_id
       |WHERE c * 1.0 / least(sa.sz, sb.sz) >= ${Dedup.ContainmentThreshold}
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Banding-quality audit: exact-Jaccard truth pairs (the plain
    * inverted-index SQL — provably equal to the Spark side's lossless
    * prefix-filtered join) vs the band-collision candidate set, reduced
    * to one recall/precision row — replicates `Dedup.lshEval`. */
  val lshEval: String =
    s"""WITH $wordsCtes, $shinglesCte,
       |$minhashCandCtes,
       |$sizesCte, $interCte,
       |truth AS (
       |  SELECT i, j FROM inter
       |  JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= ${Dedup.JaccardThreshold}
       |),
       |t AS (SELECT count(*) AS n_true FROM truth),
       |m AS (SELECT count(*) AS n_cand FROM cand),
       |hits AS (
       |  SELECT count(*) AS n_hit FROM truth
       |  WHERE EXISTS (SELECT 1 FROM cand
       |                WHERE cand.i = truth.i AND cand.j = truth.j)
       |)
       |SELECT n_true, n_cand, n_hit,
       |  round(n_hit * 1.0 / NULLIF(n_true, 0), 6) AS pair_recall,
       |  round(n_hit * 1.0 / NULLIF(n_cand, 0), 6) AS cand_precision
       |FROM t, m, hits""".stripMargin

  val simhashPairs: String = {
    val bits = Dedup.SimHashBits
    val bitSums = (0 until bits).map(j =>
      s"sum(CASE WHEN (hv >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n    ")
    val comb = (0 until bits).map(j =>
      s"(CASE WHEN s$j > 0 THEN (1::BIGINT << $j) ELSE 0 END)").mkString(" + ")
    s"""WITH $wordsCtes,
       |toksm AS (SELECT doc_id, unnest(ws) AS w FROM wl),
       |h AS (
       |  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS hv FROM toksm
       |),
       |bitsums AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM h GROUP BY doc_id
       |),
       |sig AS (SELECT doc_id, $comb AS simhash FROM bitsums)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= ${Dedup.SimHashMaxHamming}
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // embeddings are float32; cast to DOUBLE[] so DuckDB accumulates in
  // doubles exactly like the Spark-side CosineSimilarity expression
  val embeddingPairs: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= ${Dedup.CosineThreshold}
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Connected components by transitive closure: a recursive CTE
    * saturates (node, reachable) over the symmetrized edge set, then
    * labels every node with its minimum reachable id — the declarative
    * mirror of the hook+jump iteration in `Dedup.connectedComponents`
    * (fine at oracle scale; the Spark side is the O(log d)-round
    * iterative form that survives 100 TB graphs). */
  val clusters: String =
    s"""WITH RECURSIVE $wordsCtes, $shinglesCte, $sizesCte, $interCte,
       |edges AS (
       |  SELECT i, j FROM inter
       |  JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= ${Dedup.ClusterJaccardThreshold}
       |),
       |und AS (SELECT i AS a, j AS b FROM edges UNION SELECT j, i FROM edges),
       |reach AS (
       |  SELECT a AS node, a AS r FROM und
       |  UNION
       |  SELECT u.a, re.r FROM und u JOIN reach re ON u.b = re.node
       |),
       |lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
       |csz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, csz.cluster_size,
       |  l.doc_id = l.cluster_id AS keep
       |FROM lab l JOIN csz USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** Clusters over the MinHash-LSH pair graph: the full LSH edge
    * pipeline ([[minhashLsh]]'s oracle verbatim, as a CTE) followed by
    * the same transitive-closure labeling as [[clusters]]. */
  val clustersLsh: String =
    s"""WITH RECURSIVE lshp AS ($minhashLsh),
       |und AS (
       |  SELECT doc_a AS a, doc_b AS b FROM lshp
       |  UNION SELECT doc_b, doc_a FROM lshp
       |),
       |reach AS (
       |  SELECT a AS node, a AS r FROM und
       |  UNION
       |  SELECT u.a, re.r FROM und u JOIN reach re ON u.b = re.node
       |),
       |lab AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
       |csz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
       |SELECT l.doc_id, l.cluster_id, csz.cluster_size,
       |  l.doc_id = l.cluster_id AS keep
       |FROM lab l JOIN csz USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** Replicates [[Dedup.dupRateBySource]] — the [[clustersLsh]]
    * transitive-closure pipeline for the near-dup membership set, a
    * windowed copy count for the exact side, HUGEINT ppm roll-up. */
  val dupRateBySource: String =
    s"""WITH RECURSIVE lshp AS ($minhashLsh),
       |und AS (
       |  SELECT doc_a AS a, doc_b AS b FROM lshp
       |  UNION SELECT doc_b, doc_a FROM lshp
       |),
       |reach AS (
       |  SELECT a AS node, a AS r FROM und
       |  UNION
       |  SELECT u.a, re.r FROM und u JOIN reach re ON u.b = re.node
       |),
       |lab AS (SELECT node AS doc_id FROM reach GROUP BY 1),
       |dup AS (
       |  SELECT doc_id, source,
       |    count(*) OVER (PARTITION BY text) AS n_copies
       |  FROM documents
       |)
       |SELECT dup.source, count(*)::BIGINT AS n_docs,
       |  count(CASE WHEN dup.n_copies > 1 THEN 1 END)::BIGINT AS n_exact_dup,
       |  count(lab.doc_id)::BIGINT AS n_near_dup,
       |  ((count(CASE WHEN dup.n_copies > 1 THEN 1 END)::HUGEINT * 1000000)
       |    // nullif(count(*), 0))::BIGINT AS exact_dup_ppm,
       |  ((count(lab.doc_id)::HUGEINT * 1000000)
       |    // nullif(count(*), 0))::BIGINT AS near_dup_ppm
       |FROM dup LEFT JOIN lab ON lab.doc_id = dup.doc_id
       |GROUP BY 1 ORDER BY dup.source""".stripMargin

  /** Cross-modal audit: the full [[minhashLsh]] pipeline as a derived
    * table, each pair scored with the exact embedding cosine and the
    * same unrounded-threshold agree flag — replicates
    * `Dedup.modalityCheck`. */
  lazy val modalityCheck: String =
    s"""WITH pairs AS (SELECT * FROM ($minhashLsh) t)
       |SELECT p.doc_a, p.doc_b, p.jaccard,
       |  round(list_cosine_similarity(a.embedding::DOUBLE[],
       |    b.embedding::DOUBLE[]), 6) AS cosine,
       |  list_cosine_similarity(a.embedding::DOUBLE[],
       |    b.embedding::DOUBLE[]) >= ${Dedup.CosineLshThreshold} AS agree
       |FROM pairs p
       |JOIN embeddings a ON a.vec_id = p.doc_a
       |JOIN embeddings b ON b.vec_id = p.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Threshold-sweep histogram: the plain inverted-index Jaccard at
    * t = 1/2 (≡ the Spark side's lossless prefix-filtered join),
    * binned on the shared 6-dp rounding — replicates
    * `Dedup.thresholdSweep`. */
  val thresholdSweep: String = {
    val t = s"${Dedup.SweepNum} * 1.0 / ${Dedup.SweepDen}"
    s"""WITH $wordsCtes, $shinglesCte, $sizesCte, $interCte,
       |p AS (
       |  SELECT round(c * 1.0 / (sa.sz + sb.sz - c), 6) AS jac
       |  FROM inter JOIN sizes sa ON i = sa.doc_id
       |  JOIN sizes sb ON j = sb.doc_id
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= $t
       |)
       |SELECT least(floor(jac * 10), 9) / 10.0 AS bin_lo,
       |  count(*) AS n_pairs
       |FROM p GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Per-source dedup audit: exact-copy losers from the text hash-agg,
    * near-dup losers from the full [[clustersLsh]] pipeline (embedded
    * as a derived table), disjoint categories with exact precedence —
    * replicates `Dedup.dedupReport`. */
  lazy val dedupReport: String =
    s"""WITH clus AS (SELECT * FROM ($clustersLsh) t),
       |exact_losers AS (
       |  SELECT d.doc_id FROM documents d
       |  JOIN (SELECT text, min(doc_id) AS keep_id
       |        FROM documents GROUP BY text) g ON d.text = g.text
       |  WHERE d.doc_id <> g.keep_id
       |),
       |near_losers AS (SELECT doc_id FROM clus WHERE NOT keep),
       |base AS (
       |  SELECT d.source,
       |    (el.doc_id IS NOT NULL) AS is_exact,
       |    (nl.doc_id IS NOT NULL) AS is_near
       |  FROM documents d
       |  LEFT JOIN exact_losers el ON el.doc_id = d.doc_id
       |  LEFT JOIN near_losers nl ON nl.doc_id = d.doc_id
       |)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN is_exact THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_exact_dup,
       |  CAST(sum(CASE WHEN is_near AND NOT is_exact THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_near_dup,
       |  CAST(count(*)
       |    - sum(CASE WHEN is_exact THEN 1 ELSE 0 END)
       |    - sum(CASE WHEN is_near AND NOT is_exact THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_kept,
       |  round((sum(CASE WHEN is_exact THEN 1 ELSE 0 END)
       |    + sum(CASE WHEN is_near AND NOT is_exact THEN 1 ELSE 0 END))
       |    * 1.0 / count(*), 6) AS dup_rate
       |FROM base GROUP BY source ORDER BY source""".stripMargin

  /** Quality-aware cluster representative: the full [[clustersLsh]]
    * pipeline as a derived table, each cluster reduced to its longest
    * member (min doc_id on ties) — replicates `Dedup.keepBest`'s
    * two-step argmax exactly. */
  lazy val keepBest: String =
    s"""WITH clus AS (SELECT * FROM ($clustersLsh) t),
       |m AS (
       |  SELECT c.cluster_id, c.cluster_size, c.doc_id, d.n_chars
       |  FROM clus c JOIN documents d USING (doc_id)
       |),
       |best AS (SELECT cluster_id, max(n_chars) AS keep_chars FROM m GROUP BY 1)
       |SELECT m.cluster_id, min(m.doc_id) AS keep_id,
       |  m.cluster_size, best.keep_chars,
       |  m.cluster_size - 1 AS n_dropped
       |FROM m JOIN best ON m.cluster_id = best.cluster_id
       |  AND m.n_chars = best.keep_chars
       |GROUP BY m.cluster_id, m.cluster_size, best.keep_chars
       |ORDER BY m.cluster_id""".stripMargin

  /** Transitive closure over the embedding-LSH pair graph — the FULL
    * [[embeddingLshPairs]] pipeline as a CTE (bucketing replicated
    * bit-for-bit), then the same recursive-CTE labeling as [[clusters]],
    * keyed by vec_id. */
  lazy val semanticClusters: String =
    s"""WITH RECURSIVE ep AS ($embeddingLshPairs),
       |und AS (
       |  SELECT vec_a AS a, vec_b AS b FROM ep
       |  UNION SELECT vec_b, vec_a FROM ep
       |),
       |reach AS (
       |  SELECT a AS node, a AS r FROM und
       |  UNION
       |  SELECT u.a, re.r FROM und u JOIN reach re ON u.b = re.node
       |),
       |lab AS (SELECT node AS vec_id, min(r) AS cluster_id FROM reach GROUP BY 1),
       |csz AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
       |SELECT l.vec_id, l.cluster_id, csz.cluster_size,
       |  l.vec_id = l.cluster_id AS keep
       |FROM lab l JOIN csz USING (cluster_id)
       |ORDER BY vec_id""".stripMargin

  /** Replicates the FULL LSH pair pipeline: the same integer-quantized
    * sign-random-projection bucketing as `graft.functions.LshBuckets`
    * (md5 plane weights, floor quantization, bit packing — identical to
    * the `ann_topk_lsh` oracle's CTEs), bucket-collision candidates with
    * i < j, then the exact-cosine threshold verify. */
  val embeddingLshPairs: String = {
    import graft.functions.LshBuckets.{Bits, Tables => NT}
    embeddingLshPairsAt(NT, Bits)
  }

  /** [[embeddingLshPairs]] at the widened `Dedup.WideLshTables` ×
    * `Dedup.WideLshBits` geometry — same CTEs, wider generate_series. */
  val embeddingLshPairsWide: String =
    embeddingLshPairsAt(Dedup.WideLshTables, Dedup.WideLshBits)

  /** Replicates [[Dedup.embeddingLshPairsCompositePlanted]]: the
    * plant-augmented corpus (every Stride-th vector twinned with
    * component `vec_id % dims` negated — IEEE-exact, so bit-identical
    * across engines), per-table buckets over the composite branch's
    * CompositeLshTables·arity base tables at MaxBits (same
    * dims/planes/dots CTEs), then pairwise AND-composition
    * `(bucket[2k] << MaxBits) | bucket[2k+1]` — each half is
    * bit-identical across engines, so the concatenated key is too —
    * then the usual collision candidates and exact-cosine verify. */
  val embeddingLshPairsComposite: String = {
    import graft.functions.LshBuckets.{MaxBits, QuantScale}
    val baseTables = Dedup.CompositeLshTables * Dedup.CompositeLshArity
    s"""WITH corpus AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + ${Dedup.CompositePlantIdOffset},
       |    [CASE WHEN i = (vec_id % len(embedding)) + 1
       |          THEN -embedding[i] ELSE embedding[i] END
       |     FOR i IN range(1, len(embedding) + 1)]::FLOAT[]
       |  FROM embeddings WHERE vec_id % ${Dedup.CompositePlantStride} = 0
       |),
       |dims AS (
       |  SELECT vec_id, d, floor(embedding[d]::DOUBLE * $QuantScale)::BIGINT AS qv
       |  FROM corpus, unnest(generate_series(1, len(embedding))) t(d)
       |),
       |planes AS (
       |  SELECT t, b, d,
       |    ('0x' || substr(md5('p_' || t || '_' || b || '_' || d), 1, 15))::BIGINT % 2001 - 1000 AS w
       |  FROM unnest(generate_series(0, ${baseTables - 1})) tt(t),
       |       unnest(generate_series(0, ${MaxBits - 1})) bb(b),
       |       unnest(generate_series(1,
       |         (SELECT max(len(embedding)) FROM corpus))) dd(d)
       |),
       |dots AS (
       |  SELECT vec_id, t, b, sum(qv * w) AS dot
       |  FROM dims JOIN planes USING (d) GROUP BY 1, 2, 3
       |),
       |buckets AS (
       |  SELECT vec_id, t,
       |    sum(CASE WHEN dot >= 0 THEN (1::BIGINT << b) ELSE 0 END) AS bucket
       |  FROM dots GROUP BY 1, 2
       |),
       |comp AS (
       |  SELECT a.vec_id, a.t // ${Dedup.CompositeLshArity} AS t,
       |    (a.bucket << $MaxBits) + b.bucket AS bucket
       |  FROM buckets a JOIN buckets b
       |    ON b.vec_id = a.vec_id AND b.t = a.t + 1
       |  WHERE a.t % ${Dedup.CompositeLshArity} = 0
       |),
       |cands AS (
       |  SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
       |  FROM comp a JOIN comp b
       |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |)
       |SELECT i AS vec_a, j AS vec_b,
       |  round(list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]), 6) AS cosine
       |FROM cands
       |JOIN corpus va ON va.vec_id = i
       |JOIN corpus vb ON vb.vec_id = j
       |WHERE list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]) >= ${Dedup.CosineLshThreshold}
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** Replicates [[Dedup.lshGeometry]]: for the actual corpus count plus
    * the projected sizes, the smallest bits with
    * n ≤ target·2^bits (list_filter over the same integer range the
    * Spark plan filters), the table widening rule, the ceil-div
    * occupancy bound, and the guard flag — all BIGINT shifts and
    * integer division, no floats anywhere. */
  val lshGeometry: String = {
    import graft.functions.LshBuckets.{Bits, MaxBits, Tables => DefTables}
    val target = Dedup.ScaledLshTargetOccupancy
    val sizes = Dedup.LshGeometryProjectedSizes.mkString(", ")
    s"""WITH sizes AS (
       |  SELECT 'corpus' AS scope, count(*)::BIGINT AS n_vectors FROM embeddings
       |  UNION ALL
       |  SELECT 'projected' AS scope, unnest([$sizes])::BIGINT AS n_vectors
       |),
       |geo AS (
       |  SELECT scope, n_vectors,
       |    COALESCE(list_min(list_filter(range($Bits, ${MaxBits + 1}),
       |      b -> n_vectors <= (${target}::BIGINT << b))), $MaxBits)::INTEGER AS lsh_bits,
       |    (CASE WHEN n_vectors > ${Dedup.LshCompositeCapVectors}
       |          THEN ${Dedup.CompositeLshArity} ELSE 1 END)::INTEGER AS composite_arity
       |  FROM sizes
       |),
       |geo2 AS (
       |  SELECT scope, n_vectors,
       |    (CASE WHEN composite_arity > 1 THEN ${Dedup.CompositeLshTables}
       |          WHEN lsh_bits > $Bits THEN ${Dedup.WideLshTables}
       |          ELSE $DefTables END)::INTEGER AS lsh_tables,
       |    lsh_bits, composite_arity,
       |    (composite_arity * lsh_bits)::INTEGER AS effective_bits
       |  FROM geo
       |)
       |SELECT scope, n_vectors, lsh_tables, lsh_bits, composite_arity,
       |  effective_bits,
       |  ((n_vectors + (1::BIGINT << effective_bits) - 1) // (1::BIGINT << effective_bits))::BIGINT AS occupancy_bound,
       |  (CASE WHEN (n_vectors + (1::BIGINT << effective_bits) - 1) // (1::BIGINT << effective_bits)
       |        <= ${Dedup.MaxLshBucketOccupancy} THEN 1 ELSE 0 END)::INTEGER AS within_guard
       |FROM geo2
       |ORDER BY n_vectors, scope""".stripMargin
  }

  /** Replicates [[Dedup.bandGeometry]]: the same dial thresholds and
    * the SAME precomputed ppm literals ([[Dedup.bandGeometryRows]] —
    * iterated-floor integer arithmetic evaluated once in Scala and
    * emitted into both plans, the co-located-constants rule). */
  val bandGeometry: String = {
    val sizes = Dedup.BandGeometryProjectedSizes.mkString(", ")
    val geomValues = Dedup.bandGeometryRows.map {
      case (r, b, ct, recall, cf, fp) => s"($r, $b, $ct, $recall, $cf, $fp)"
    }.mkString(", ")
    s"""WITH sizes AS (
       |  SELECT 'corpus' AS scope, count(*)::BIGINT AS n_docs FROM documents
       |  UNION ALL
       |  SELECT 'stream_corpus' AS scope, count(*)::BIGINT AS n_docs
       |  FROM documents WHERE doc_id % 2 = 0
       |  UNION ALL
       |  SELECT 'projected' AS scope, unnest([$sizes])::BIGINT AS n_docs
       |),
       |geoms(rows_per_band, bands, collide_ppm, recall_ppm, fp_band_ppm,
       |      fp_cand_ppm) AS (VALUES $geomValues)
       |SELECT s.scope, s.n_docs, g.bands::INTEGER AS bands,
       |  g.rows_per_band::INTEGER AS rows_per_band,
       |  g.collide_ppm::BIGINT AS collide_ppm,
       |  g.recall_ppm::BIGINT AS recall_ppm,
       |  g.fp_band_ppm::BIGINT AS fp_band_ppm,
       |  g.fp_cand_ppm::BIGINT AS fp_cand_ppm
       |FROM sizes s
       |JOIN geoms g ON g.rows_per_band =
       |  (CASE WHEN s.n_docs <= ${Dedup.BandDialSmallMaxDocs} THEN 2
       |        WHEN s.n_docs <= ${Dedup.BandDialMidMaxDocs} THEN 4 ELSE 8 END)
       |ORDER BY n_docs, scope""".stripMargin
  }

  /** Replicates [[Dedup.lshGeometryEval]]: shared quantized dims +
    * plane table generated to the WIDE maxima (plane (t,b,d) is
    * geometry-independent), per-geometry bucket keys as bit-subset
    * sums, candidate/verified counts per geometry, brute truth at the
    * same threshold. dims/planes MATERIALIZED (referenced by both
    * geometry legs — the CTE-inlining explosion hazard). */
  val lshGeometryEval: String = {
    import graft.functions.LshBuckets.{Bits, Tables => NT, MaxBits, QuantScale}
    val (wt, wb) = (Dedup.WideLshTables, Dedup.WideLshBits)
    val arity = Dedup.CompositeLshArity
    // widest plane demand across the three legs: the composite branch's
    // base-table count (16 since r13) exceeds the per-table legs
    val baseTables = Dedup.CompositeLshTables * arity
    def legSql(t: Int, b: Int, name: String): String =
      s"""SELECT '$name' AS geometry, $t::INTEGER AS lsh_tables,
         |  $b::INTEGER AS lsh_bits,
         |  (SELECT count(*) FROM cand_$name)::BIGINT AS n_candidates,
         |  (SELECT count(*) FROM ver_$name)::BIGINT AS n_pairs""".stripMargin
    def candVerCtes(name: String): String =
      s"""cand_$name AS (
         |  SELECT DISTINCT a.vec_id AS i, bb.vec_id AS j
         |  FROM buckets_$name a JOIN buckets_$name bb
         |    ON a.t = bb.t AND a.bucket = bb.bucket AND a.vec_id < bb.vec_id
         |),
         |ver_$name AS (
         |  SELECT i, j FROM cand_$name
         |  JOIN embeddings va ON va.vec_id = i
         |  JOIN embeddings vb ON vb.vec_id = j
         |  WHERE list_cosine_similarity(va.embedding::DOUBLE[],
         |    vb.embedding::DOUBLE[]) >= ${Dedup.CosineLshThreshold}
         |)""".stripMargin
    def legCtes(t: Int, b: Int, name: String): String =
      s"""buckets_$name AS (
         |  SELECT vec_id, t,
         |    sum(CASE WHEN dot >= 0 THEN (1::BIGINT << b) ELSE 0 END) AS bucket
         |  FROM dots WHERE t < $t AND b < $b GROUP BY 1, 2
         |),
         |${candVerCtes(name)}""".stripMargin
    // the AND-composed bucketing: per-table keys over the composite
    // branch's baseTables at MaxBits, then pairwise concatenation —
    // same composition rule as Dedup.embeddingLshPairsComposite
    val compositeCtes =
      s"""buckets_composite_base AS (
         |  SELECT vec_id, t,
         |    sum(CASE WHEN dot >= 0 THEN (1::BIGINT << b) ELSE 0 END) AS bucket
         |  FROM dots WHERE t < $baseTables AND b < $MaxBits GROUP BY 1, 2
         |),
         |buckets_composite AS (
         |  SELECT a.vec_id, a.t // $arity AS t,
         |    (a.bucket << $MaxBits) + b.bucket AS bucket
         |  FROM buckets_composite_base a JOIN buckets_composite_base b
         |    ON b.vec_id = a.vec_id AND b.t = a.t + 1
         |  WHERE a.t % $arity = 0
         |),
         |${candVerCtes("composite")}""".stripMargin
    s"""WITH dims AS MATERIALIZED (
       |  SELECT vec_id, d, floor(embedding[d]::DOUBLE * $QuantScale)::BIGINT AS qv
       |  FROM embeddings, unnest(generate_series(1, len(embedding))) t(d)
       |),
       |planes AS MATERIALIZED (
       |  SELECT t, b, d,
       |    ('0x' || substr(md5('p_' || t || '_' || b || '_' || d), 1, 15))::BIGINT % 2001 - 1000 AS w
       |  FROM unnest(generate_series(0, ${baseTables - 1})) tt(t),
       |       unnest(generate_series(0, ${MaxBits - 1})) bb(b),
       |       unnest(generate_series(1,
       |         (SELECT max(len(embedding)) FROM embeddings))) dd(d)
       |),
       |dots AS MATERIALIZED (
       |  SELECT vec_id, t, b, sum(qv * w) AS dot
       |  FROM dims JOIN planes USING (d) GROUP BY 1, 2, 3
       |),
       |${legCtes(NT, Bits, "default")},
       |${legCtes(wt, wb, "wide")},
       |$compositeCtes,
       |truth AS (
       |  SELECT count(*)::BIGINT AS n_truth
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |  WHERE list_cosine_similarity(a.embedding::DOUBLE[],
       |    b.embedding::DOUBLE[]) >= ${Dedup.CosineLshThreshold}
       |),
       |legs AS (
       |  ${legSql(NT, Bits, "default")}
       |  UNION ALL
       |  ${legSql(wt, wb, "wide")}
       |  UNION ALL
       |  ${legSql(Dedup.CompositeLshTables, arity * MaxBits, "composite")}
       |)
       |SELECT geometry, lsh_tables, lsh_bits, n_candidates, n_pairs, n_truth,
       |  (n_pairs * 1000000 // nullif(n_truth, 0))::BIGINT AS recall_ppm
       |FROM legs, truth
       |ORDER BY geometry""".stripMargin
  }

  private def embeddingLshPairsAt(NT: Int, Bits: Int): String = {
    import graft.functions.LshBuckets.QuantScale
    s"""WITH dims AS (
       |  SELECT vec_id, d, floor(embedding[d]::DOUBLE * $QuantScale)::BIGINT AS qv
       |  FROM embeddings, unnest(generate_series(1, len(embedding))) t(d)
       |),
       |planes AS (
       |  SELECT t, b, d,
       |    ('0x' || substr(md5('p_' || t || '_' || b || '_' || d), 1, 15))::BIGINT % 2001 - 1000 AS w
       |  FROM unnest(generate_series(0, ${NT - 1})) tt(t),
       |       unnest(generate_series(0, ${Bits - 1})) bb(b),
       |       unnest(generate_series(1,
       |         (SELECT max(len(embedding)) FROM embeddings))) dd(d)
       |),
       |dots AS (
       |  SELECT vec_id, t, b, sum(qv * w) AS dot
       |  FROM dims JOIN planes USING (d) GROUP BY 1, 2, 3
       |),
       |buckets AS (
       |  SELECT vec_id, t,
       |    sum(CASE WHEN dot >= 0 THEN (1::BIGINT << b) ELSE 0 END) AS bucket
       |  FROM dots GROUP BY 1, 2
       |),
       |cands AS (
       |  SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
       |  FROM buckets a JOIN buckets b
       |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |)
       |SELECT i AS vec_a, j AS vec_b,
       |  round(list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]), 6) AS cosine
       |FROM cands
       |JOIN embeddings va ON va.vec_id = i
       |JOIN embeddings vb ON vb.vec_id = j
       |WHERE list_cosine_similarity(va.embedding::DOUBLE[], vb.embedding::DOUBLE[]) >= ${Dedup.CosineLshThreshold}
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** Replicates [[Dedup.dupSpansOn]]: positional 5-word shingles hashed
    * with the portable 60-bit md5, cross-doc duplicated set, membership
    * probe, gaps-and-islands merge (`pos − row_number` run key), span
    * length filter — all integer arithmetic, so the island boundaries
    * are bit-identical. */
  val dupSpans: String = {
    import Dedup.{SpanShingleWords => W, MinDupSpanWords => MinW}
    val shingle = (1 to W).map(k => s"ws[i+${k - 1}]").mkString(" || ' ' || ")
    s"""WITH $wordsCtes,
       |psh AS (
       |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       |    ('0x' || substr(md5($shingle), 1, 15))::BIGINT AS h
       |  FROM wl, unnest(generate_series(1, len(ws) - ${W - 1})) t(i)
       |),
       |dup AS (
       |  SELECT h, count(DISTINCT doc_id) AS n_docs
       |  FROM psh GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
       |),
       |marked AS (
       |  SELECT p.doc_id, p.pos, d.n_docs,
       |    row_number() OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS rn
       |  FROM psh p JOIN dup d USING (h)
       |),
       |isl AS (
       |  SELECT doc_id,
       |    CAST(min(pos) AS INTEGER) AS span_start,
       |    CAST(max(pos) - min(pos) + $W AS INTEGER) AS span_words,
       |    count(*) AS n_shingles, max(n_docs) AS max_docs
       |  FROM marked GROUP BY doc_id, pos - rn
       |)
       |SELECT doc_id, span_start, span_words, n_shingles, max_docs
       |FROM isl WHERE span_words >= $MinW
       |ORDER BY doc_id, span_start""".stripMargin
  }

  /** Degree-oriented triangle counting over the LSH pair graph — the
    * same orientation, wedge join, and single-probe closure as
    * `Dedup.trianglesOn`; coefficient division written in the identical
    * IEEE order (one multiply, one divide). */
  lazy val triangles: String =
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT doc_a AS a, doc_b AS b FROM ($minhashLsh) t),
       |und AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
       |deg AS MATERIALIZED (SELECT a AS v, count(*) AS deg FROM und GROUP BY 1),
       |orient AS MATERIALIZED (
       |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
       |              THEN e.a ELSE e.b END AS src,
       |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
       |              THEN e.b ELSE e.a END AS dst
       |  FROM pairs e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
       |),
       |tri AS (
       |  SELECT o1.src AS u, o1.dst AS x, o2.dst AS y
       |  FROM orient o1
       |  JOIN orient o2 ON o1.src = o2.src AND o1.dst <> o2.dst
       |  JOIN orient o3 ON o3.src = o1.dst AND o3.dst = o2.dst
       |),
       |tn AS (
       |  SELECT node, count(*) AS t FROM (
       |    SELECT u AS node FROM tri
       |    UNION ALL SELECT x AS node FROM tri
       |    UNION ALL SELECT y AS node FROM tri
       |  ) GROUP BY 1
       |)
       |SELECT deg.v AS doc_id, deg.deg,
       |  COALESCE(tn.t, 0) AS n_triangles,
       |  CASE WHEN deg.deg > 1
       |       THEN round(2.0 * COALESCE(tn.t, 0) / (deg.deg * (deg.deg - 1)), 6)
       |  END AS clustering_coeff
       |FROM deg LEFT JOIN tn ON deg.v = tn.node
       |ORDER BY doc_id""".stripMargin

  /** PageRank over the LSH pair graph — the FULL [[minhashLsh]] pipeline
    * as a CTE, then `Dedup.PageRankIters` unrolled power-iteration
    * rounds in the same truncating BIGINT arithmetic as
    * `Dedup.pageRankOn` (DuckDB `//` and Spark `div` both truncate
    * toward zero; all values non-negative). HUGEINT sums are cast back
    * to BIGINT at each round. */
  lazy val pageRank: String = {
    import Dedup.{PageRankIters, PageRankScale => S,
      PageRankDampNum => DN, PageRankDampDen => DD}
    val rounds = (1 to PageRankIters).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT ns.v, CAST(ns.base + ($DN * c.cs) // $DD AS BIGINT) AS r
         |  FROM ns JOIN (
         |    SELECT u.b, sum(p.r // u.deg) AS cs
         |    FROM undeg u JOIN r${k - 1} p ON u.a = p.v
         |    GROUP BY u.b
         |  ) c ON ns.v = c.b
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT doc_a AS a, doc_b AS b FROM ($minhashLsh) t),
       |und AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
       |deg AS MATERIALIZED (SELECT a AS v, count(*) AS deg FROM und GROUP BY 1),
       |undeg AS MATERIALIZED (
       |  SELECT und.a, und.b, deg.deg FROM und JOIN deg ON und.a = deg.v),
       |nn AS (SELECT count(*) AS n FROM deg),
       |ns AS MATERIALIZED (
       |  SELECT v, deg, CAST($S // n AS BIGINT) AS r,
       |    CAST(((${DD - DN}) * ($S // n)) // $DD AS BIGINT) AS base
       |  FROM deg, nn
       |),
       |r0 AS (SELECT v, r FROM ns),
       |$rounds
       |SELECT ns.v AS doc_id, ns.deg, r$PageRankIters.r AS pr_scaled,
       |  round(r$PageRankIters.r / $S.0, 12) AS pr
       |FROM r$PageRankIters JOIN ns ON r$PageRankIters.v = ns.v
       |ORDER BY doc_id""".stripMargin
  }

  /** Replicates [[Dedup.keepCentral]]: the LSH clustering and PageRank
    * oracles composed over the same pair graph, per-cluster max-rank
    * argmax with min-id ties. Both pipeline CTEs MATERIALIZED (each
    * wraps the full minhash edge pipeline). */
  lazy val keepCentral: String =
    s"""WITH clus AS MATERIALIZED (SELECT * FROM ($clustersLsh) t),
       |pr AS MATERIALIZED (SELECT doc_id, pr_scaled FROM ($pageRank) t2),
       |m AS (
       |  SELECT c.cluster_id, c.cluster_size, c.doc_id, p.pr_scaled
       |  FROM clus c JOIN pr p USING (doc_id)
       |),
       |best AS (SELECT cluster_id, max(pr_scaled) AS keep_pr FROM m GROUP BY 1)
       |SELECT m.cluster_id, min(m.doc_id) AS keep_id, m.cluster_size,
       |  best.keep_pr, m.cluster_size - 1 AS n_dropped
       |FROM m JOIN best ON m.cluster_id = best.cluster_id
       |  AND m.pr_scaled = best.keep_pr
       |GROUP BY m.cluster_id, m.cluster_size, best.keep_pr
       |ORDER BY m.cluster_id""".stripMargin

  /** Replicates [[Dedup.shingleDfProfile]]: distinct 3-shingle df,
    * exact log2 buckets, per-bucket exact max df and the guard flag. */
  lazy val shingleDfProfile: String =
    s"""WITH $wordsCtes, $shinglesCte,
       |dfs AS (SELECT s, count(*) AS df FROM sh GROUP BY 1)
       |SELECT CAST(length(bin(df)) - 1 AS INTEGER) AS log2_bucket,
       |  (1::BIGINT << CAST(length(bin(df)) - 1 AS INTEGER)) AS df_lo,
       |  count(*) AS n_shingles, CAST(sum(df) AS BIGINT) AS n_postings,
       |  CAST(max(df) AS BIGINT) AS max_df,
       |  max(df) > ${Dedup.MaxNaiveShingleDf} AS over_guard
       |FROM dfs GROUP BY 1, 2 ORDER BY log2_bucket""".stripMargin

  /** Replicates [[Dedup.winnowingPairsOn]]: positional 5-word shingle
    * hashes, the identical 4-row `min() OVER` winnowing window,
    * stop-word cap, shared-fingerprint pair counts and integer-ppm
    * overlap. */
  lazy val winnowingPairs: String = {
    import Dedup.{SpanShingleWords => W, WinnowW, MaxFpDocs, MinSharedFps}
    val shingle = (1 to W).map(k => s"ws[i+${k - 1}]").mkString(" || ' ' || ")
    s"""WITH $wordsCtes,
       |psh AS (
       |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
       |    ('0x' || substr(md5($shingle), 1, 15))::BIGINT AS h
       |  FROM wl, unnest(generate_series(1, len(ws) - ${W - 1})) t(i)
       |),
       |fps AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, minh AS h FROM (
       |    SELECT doc_id, pos,
       |      min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN ${WinnowW - 1} PRECEDING AND CURRENT ROW) AS minh
       |    FROM psh
       |  ) WHERE pos >= ${WinnowW - 1}
       |),
       |perdoc AS (SELECT doc_id, count(*) AS n_fps FROM fps GROUP BY 1),
       |keep AS (
       |  SELECT h FROM fps GROUP BY h
       |  HAVING count(DISTINCT doc_id) <= $MaxFpDocs),
       |kept AS MATERIALIZED (
       |  SELECT f.doc_id, f.h FROM fps f JOIN keep USING (h)),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |  FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $MinSharedFps
       |)
       |SELECT p.doc_a, p.doc_b, p.n_shared,
       |  pa.n_fps AS fp_a, pb.n_fps AS fp_b,
       |  (p.n_shared * 1000000) // least(pa.n_fps, pb.n_fps) AS overlap_ppm
       |FROM pairs p
       |JOIN perdoc pa ON pa.doc_id = p.doc_a
       |JOIN perdoc pb ON pb.doc_id = p.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Label propagation over the LSH pair graph — [[Dedup.LpaIters]]
    * unrolled synchronous rounds with the identical self-vote and the
    * same single-BIGINT `min_by` tie key `−n·2³² + lbl` as
    * `Dedup.lpaCommunitiesOn`, so every round's argmax decisions are
    * bit-identical. */
  lazy val lpaCommunities: String = {
    val rounds = (1 to Dedup.LpaIters).map { k =>
      s"""l$k AS MATERIALIZED (
         |  SELECT v, min_by(lbl, -n * 4294967296 + lbl) AS lbl FROM (
         |    SELECT x.v, x.lbl, count(*) AS n FROM (
         |      SELECT u.a AS v, p.lbl FROM und u JOIN l${k - 1} p ON u.b = p.v
         |      UNION ALL SELECT v, lbl FROM l${k - 1}
         |    ) x GROUP BY 1, 2
         |  ) GROUP BY v
         |)""".stripMargin
    }.mkString(",\n")
    val last = s"l${Dedup.LpaIters}"
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT doc_a AS a, doc_b AS b FROM ($minhashLsh) t),
       |und AS MATERIALIZED (
       |  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
       |l0 AS (SELECT DISTINCT a AS v, a AS lbl FROM und),
       |$rounds
       |SELECT $last.v AS doc_id, $last.lbl AS community, s.comm_size
       |FROM $last JOIN (
       |  SELECT lbl, count(*) AS comm_size FROM $last GROUP BY 1
       |) s ON $last.lbl = s.lbl
       |ORDER BY doc_id""".stripMargin
  }

  /** Replicates `Dedup.bandingSweep`: one signature CTE, four
    * band-config candidate sets (md5-of-joined-minhash band keys), all
    * audited against the lossless inverted-index truth at the
    * production threshold. Heavy CTEs are MATERIALIZED (each config
    * self-joins its band frame). */
  lazy val bandingSweep: String = {
    import Dedup.MinHashParams._
    val P = Dedup.P
    val minExprs = (0 until K).map(i =>
      s"min((${A(i)} * hv + ${B(i)}) % $P) AS mh$i").mkString(",\n    ")
    val cfg = Dedup.BandingConfigs.map { nb =>
      val r = K / nb
      val bandSelects = (0 until nb).map { b =>
        val cat = (0 until r).map(i => s"mh${b * r + i}::VARCHAR")
          .mkString(" || '_' || ")
        s"SELECT doc_id, $b AS band, " +
          s"('0x' || substr(md5($cat), 1, 15))::BIGINT AS bkey FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""bands$nb AS MATERIALIZED (
         |  $bandSelects
         |),
         |cand$nb AS MATERIALIZED (
         |  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
         |  FROM bands$nb a JOIN bands$nb b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |),
         |row$nb AS (
         |  SELECT $nb AS n_bands, $r AS rows_per_band,
         |    (SELECT count(*) FROM cand$nb) AS n_cand,
         |    (SELECT count(*) FROM truth t WHERE EXISTS (
         |       SELECT 1 FROM cand$nb c WHERE c.i = t.i AND c.j = t.j))
         |      AS n_hit
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $wordsCtes, $shinglesCte, $sizesCte, $interCte,
       |h AS MATERIALIZED (
       |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % $P AS hv
       |  FROM sh
       |),
       |sig AS MATERIALIZED (
       |  SELECT doc_id,
       |    $minExprs
       |  FROM h GROUP BY doc_id
       |),
       |truth AS MATERIALIZED (
       |  SELECT i, j FROM inter
       |  JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= ${Dedup.JaccardThreshold}
       |),
       |tt AS (SELECT count(*) AS n_true FROM truth),
       |$cfg
       |SELECT u.n_bands, u.rows_per_band, u.n_cand, u.n_hit, tt.n_true,
       |  round(u.n_hit * 1.0 / NULLIF(tt.n_true, 0), 6) AS pair_recall,
       |  round(u.n_hit * 1.0 / NULLIF(u.n_cand, 0), 6) AS cand_precision
       |FROM (SELECT * FROM row2 UNION ALL SELECT * FROM row4
       |      UNION ALL SELECT * FROM row8 UNION ALL SELECT * FROM row16) u,
       |  tt
       |ORDER BY n_bands""".stripMargin
  }

  /** Replicates `Dedup.clusterStats`: the [[clustersLsh]] pipeline as a
    * derived table, rolled up to the size distribution. */
  lazy val clusterStats: String =
    s"""SELECT cluster_size,
       |  count(DISTINCT cluster_id) AS n_clusters,
       |  count(*) AS n_docs,
       |  count(*) - count(DISTINCT cluster_id) AS n_removable
       |FROM ($clustersLsh) t
       |GROUP BY 1 ORDER BY cluster_size""".stripMargin

  /** Replicates `Dedup.kcore`: the exact prefix-edge graph at
    * `ClusterJaccardThreshold` (the same edge CTE as [[clusters]]),
    * then `KcoreMaxRounds` unrolled peel rounds — drop nodes of degree
    * < k, restrict edges to survivors, repeat. The Spark side refuses
    * if its peel hasn't reached a fixpoint within the same round cap,
    * so both engines land on the identical core. */
  lazy val kcore: String = {
    val k = Dedup.KcoreK
    // each round references the previous round TWICE (degree filter +
    // edge restriction): without MATERIALIZED DuckDB inlines CTEs, so
    // the plan doubles per unrolled round (2^8 copies of the shingle
    // pipeline — observed as a "too many open files" scan explosion)
    val rounds = (1 to Dedup.KcoreMaxRounds).map { i =>
      s"""k$i AS MATERIALIZED (SELECT a AS v FROM e${i - 1} GROUP BY a
         |        HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e${i - 1} e
         |  JOIN k$i x ON e.a = x.v JOIN k$i y ON e.b = y.v
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $wordsCtes, $shinglesCte, $sizesCte, $interCte,
       |edges AS (
       |  SELECT i, j FROM inter
       |  JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >= ${Dedup.ClusterJaccardThreshold}
       |),
       |e0 AS MATERIALIZED (SELECT i AS a, j AS b FROM edges
       |       UNION ALL SELECT j, i FROM edges),
       |$rounds
       |SELECT a AS doc_id, count(*) AS core_degree
       |FROM e${Dedup.KcoreMaxRounds} GROUP BY 1 ORDER BY doc_id""".stripMargin
  }

  /** Replicates [[Dedup.contaminationBlast]] — same t=0.03 edge graph,
    * same contamination seeds, BFS rounds unrolled with MATERIALIZED
    * reached-set CTEs (each round references the previous twice:
    * frontier expansion + the anti-join). */
  lazy val contaminationBlast: String = {
    val pct = CurationOracles.pctBucketSql("doc_id::VARCHAR")
    val rounds = (1 to Dedup.BlastMaxHops).map { h =>
      s"""f$h AS (
         |  SELECT DISTINCT u.v AS doc_id
         |  FROM r${h - 1} r JOIN und u ON r.doc_id = u.u
         |  WHERE r.hop = ${h - 1}
         |),
         |r$h AS MATERIALIZED (
         |  SELECT doc_id, hop FROM r${h - 1}
         |  UNION ALL
         |  SELECT doc_id, $h AS hop FROM f$h
         |  WHERE doc_id NOT IN (SELECT doc_id FROM r${h - 1})
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $wordsCtes, $shinglesCte, $sizesCte, $interCte,
       |edges AS MATERIALIZED (
       |  SELECT i, j FROM inter
       |  JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
       |  WHERE c * 1.0 / (sa.sz + sb.sz - c) >=
       |    ${Dedup.ClusterJaccardThreshold}
       |),
       |und AS (SELECT i AS u, j AS v FROM edges
       |        UNION ALL SELECT j, i FROM edges),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN $pct < 80 THEN 'train'
       |         WHEN $pct < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |),
       |tr AS (SELECT DISTINCT s FROM sh JOIN sp USING (doc_id)
       |       WHERE split = 'train'),
       |te AS (SELECT sh.doc_id, sh.s FROM sh JOIN sp USING (doc_id)
       |       WHERE split = 'test'),
       |ov AS (SELECT doc_id, count(*) AS n_ov FROM te JOIN tr USING (s)
       |       GROUP BY 1),
       |r0 AS MATERIALIZED (
       |  SELECT doc_id, 0 AS hop FROM ov
       |  WHERE n_ov >= ${graft.operators.Curation.ContaminationMinShingles}
       |),
       |$rounds
       |SELECT r.doc_id, CAST(r.hop AS INTEGER) AS hop, sp.split
       |FROM r${Dedup.BlastMaxHops} r JOIN sp USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Replicates `Dedup.splitLeakage`: the full MinHash-LSH near-dup
    * pair pipeline ([[minhashLsh]] as a derived table), each endpoint
    * tagged with its md5 train/val/test split, straddling pairs
    * aggregated per (split_lo, split_hi). */
  lazy val splitLeakage: String = {
    val pct = CurationOracles.pctBucketSql("doc_id::VARCHAR")
    s"""WITH sp AS (
       |  SELECT doc_id,
       |    CASE WHEN $pct < 80 THEN 'train'
       |         WHEN $pct < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |),
       |lk AS (
       |  SELECT least(sa.split, sb.split) AS split_lo,
       |         greatest(sa.split, sb.split) AS split_hi,
       |         e.doc_a AS a, e.doc_b AS b
       |  FROM ($minhashLsh) e
       |  JOIN sp sa ON sa.doc_id = e.doc_a
       |  JOIN sp sb ON sb.doc_id = e.doc_b
       |  WHERE sa.split <> sb.split
       |),
       |docs AS (
       |  SELECT split_lo, split_hi, unnest([a, b]) AS doc FROM lk
       |),
       |pa AS (SELECT split_lo, split_hi, count(*) AS n_pairs
       |       FROM lk GROUP BY 1, 2),
       |da AS (SELECT split_lo, split_hi, count(DISTINCT doc) AS n_docs
       |       FROM docs GROUP BY 1, 2)
       |SELECT pa.split_lo, pa.split_hi, pa.n_pairs, da.n_docs
       |FROM pa JOIN da USING (split_lo, split_hi)
       |ORDER BY 1, 2""".stripMargin
  }
}
