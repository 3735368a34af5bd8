package graft

import org.apache.spark.sql.graftshim.sqlCacheIsEmpty
import org.scalatest.funsuite.AnyFunSuite

/** Cache-hygiene gate (r7 VERDICT item 5): a LIBRARY caller that runs
  * one graft operator and never calls `clearCache()` must not inherit
  * SQL-cache residue — Bench/Verify clear the cache between queries,
  * but a real embedding application won't. Every batch query runs at
  * sf0.001 and the session's CacheManager must be empty afterwards,
  * except for the DOCUMENTED shared cache ([[operators.Dedup]]'s
  * `shinglesCached`, whose consumers are enumerated below with an
  * explicit release contract: callers running many dedup queries in one
  * session keep the shingle index hot and drop it with `clearCache()`
  * when done).
  *
  * Streaming-sink queries are excluded (they run the streaming engine,
  * never `persist()` — their state lives in checkpoints, not the SQL
  * cache) to keep the sweep inside the test budget. */
class CacheHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"

  /** Consumers of the documented `shinglesCached` shared cache — the
    * ONLY queries allowed to leave a cache entry, and only that one. */
  private val sharedShingleCache = Set(
    "dedup_jaccard_pairs", "dedup_containment_pairs",
    "dedup_jaccard_prefix", "dedup_containment_prefix",
    "dedup_threshold_sweep", "dedup_lsh_eval", "dedup_banding_sweep",
    "dedup_shingle_df")

  test("every batch query leaves the SQL cache empty (documented shared cache excepted)") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.endsWith("_stream"))
    // Pre-materialize the shared edge graphs (Bench's policy): the
    // FIRST consumer pays the build, and the build itself goes through
    // the shared shingle cache — without this, whichever edge-consuming
    // query happens to run first would be flagged for the build's
    // residue rather than its own.
    operators.Dedup.nearDupEdgesShared(spark, d)
    operators.Dedup.minhashEdgesShared(spark, d)
    operators.Dedup.embeddingEdgesShared(spark, d)
    operators.Dedup.truthPairsShared(spark, d)
    spark.catalog.clearCache()
    val leaked = scala.collection.mutable.ListBuffer[String]()
    val missingAllowance = scala.collection.mutable.ListBuffer[String]()
    for (name <- names) {
      try SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      catch { case _: IllegalArgumentException => () } // refusal guards
      val empty = sqlCacheIsEmpty(spark)
      if (!empty && !sharedShingleCache(name)) leaked += name
      // keep the allowlist honest in BOTH directions: an entry that no
      // longer caches anything is stale documentation
      if (empty && sharedShingleCache(name)) missingAllowance += name
      spark.catalog.clearCache()
    }
    assert(leaked.isEmpty,
      s"queries leaving undocumented SQL-cache entries: ${leaked.mkString(", ")}")
    assert(missingAllowance.isEmpty,
      "allowlisted queries that no longer cache (stale allowlist): " +
        missingAllowance.mkString(", "))
  }
}
