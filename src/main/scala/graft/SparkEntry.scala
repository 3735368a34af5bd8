package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * (same column names, same row order, floats rounded identically) unless
  * the operator is genuinely non-SQL-expressible, in which case the driver
  * records a rows-only check.
  */
object SparkEntry {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's full `main`-mode output: sorted bigram → count →
    * probability over the word corpus (SURVEY.md §7 step 1). */
  def entry(spark: SparkSession): DataFrame =
    TextPipeline.bigramProbabilities(docs(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- core text pipeline (reference parity; SURVEY.md §2 #1-#14) ---
    "bigram_counts" -> ((s, d) =>
      TextPipeline.bigramCounts(docs(s, d)).orderBy("bigram")),
    "bigram_probs" -> ((s, d) =>
      TextPipeline.bigramProbabilities(docs(s, d))),
    "bigram_probs_onlyone" -> ((s, d) =>
      TextPipeline.onlyOneProbabilities(docs(s, d))),
    "trigram_counts" -> ((s, d) =>
      TextPipeline.ngramCounts(docs(s, d), 3).orderBy("gram3")),
    "bigram_topk" -> ((s, d) =>
      TextPipeline.bigramCounts(docs(s, d))
        .orderBy(desc("cnt"), asc("bigram")).limit(20)),
  )

  // Shared oracle-SQL fragments (DuckDB dialect), mirroring TextPipeline.
  private val wordsCte =
    "words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents)"
  private val keptMainCte =
    "kept AS (SELECT w FROM words WHERE length(w) >= 2 AND substring(w, 1, 1) BETWEEN 'a' AND 'z')"
  private val keptOnlyOneCte =
    "kept AS (SELECT w FROM words WHERE length(w) >= 2)"
  private def gramsCte(n: Int) =
    s"grams AS (SELECT substring(w, i, $n) AS g FROM kept, unnest(generate_series(1, length(w) - ${n - 1})) AS t(i) " +
      s"WHERE regexp_matches(substring(w, i, $n), '^[a-z]{$n}$$'))"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "bigram_counts" ->
      s"""WITH $wordsCte, $keptMainCte, ${gramsCte(2)}
         |SELECT g AS bigram, count(*) AS cnt FROM grams
         |GROUP BY 1 ORDER BY bigram""".stripMargin,
    "bigram_probs" ->
      s"""WITH $wordsCte, $keptMainCte, ${gramsCte(2)},
         |counts AS (SELECT g AS bigram, count(*) AS cnt FROM grams GROUP BY 1)
         |SELECT bigram, cnt,
         |  round(cnt::DOUBLE / (SELECT sum(cnt)::DOUBLE FROM counts), 12) AS p
         |FROM counts ORDER BY bigram""".stripMargin,
    "bigram_probs_onlyone" ->
      s"""WITH $wordsCte, $keptOnlyOneCte, ${gramsCte(2)},
         |counts AS (
         |  SELECT g AS bigram, count(*) AS cnt FROM grams GROUP BY 1
         |  UNION ALL
         |  SELECT 'totalCount' AS bigram, count(*) AS cnt FROM kept
         |  WHERE regexp_matches(substring(w, length(w) - 1, 2), '^[a-z]{2}$$')
         |)
         |SELECT bigram, cnt,
         |  round(cnt::DOUBLE / (SELECT sum(cnt)::DOUBLE FROM counts), 12) AS p
         |FROM counts ORDER BY bigram""".stripMargin,
    "trigram_counts" ->
      s"""WITH $wordsCte, $keptMainCte, ${gramsCte(3)}
         |SELECT g AS gram3, count(*) AS cnt FROM grams
         |GROUP BY 1 ORDER BY gram3""".stripMargin,
    "bigram_topk" ->
      s"""WITH $wordsCte, $keptMainCte, ${gramsCte(2)}
         |SELECT g AS bigram, count(*) AS cnt FROM grams
         |GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin,
  )
}
