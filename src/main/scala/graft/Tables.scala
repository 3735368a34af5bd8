package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic star schema (TESTDATA.md).
  * Columnar parquet scans — Catalyst pushes predicates and prunes columns
  * into these reads (`PushedFilters`/`ReadSchema` in `.explain`). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** [[lineitem]] behind the [[spread]] scan-parallelism floor — used
    * by the fact-table aggregations whose per-row map work (decimal
    * pricing math, md5 sketch hashing, pair explosion) dominates a
    * single-split scan. NOT the default lineitem loader: for cheap
    * single-agg queries and multi-branch plans that would each pay the
    * exchange, the raw scan measured faster (see OPTIMIZATION_r21.md). */
  def lineitemSpread(s: SparkSession, d: String): DataFrame =
    spread(load(s, d, "lineitem"), "l_orderkey")
  /** Conf that lets Spark read parquet TIMESTAMP(NANOS) columns as long.
    * SESSION-WIDE: it changes how every int64-nanos parquet column in the
    * session is read. Preferred setup is at session build time
    * (`.config(NanosConf, "true")` — all graft mains and tests do this);
    * [[events]] falls back to setting it lazily, once, for sessions built
    * elsewhere (e.g. the external driver harness). */
  val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and plain TIMESTAMP(MICROS) in others — normalize both
    * to one session-tz TIMESTAMP column so every operator downstream
    * sees a single type. Nanos arrive as long (legacy conf, see
    * [[NanosConf]]) and convert with integer division (a double
    * division would lose precision — epoch-nanos exceed 2^53; source
    * data is micro-resolution, so the conversion is exact). Micros
    * arrive as TIMESTAMP_NTZ; the session timezone is pinned to UTC by
    * every graft main/test, so the NTZ→LTZ cast preserves the epoch
    * value and `unix_micros` equals DuckDB's `epoch_us`. */
  def events(s: SparkSession, d: String): DataFrame = {
    if (!s.conf.getOption(NanosConf).contains("true"))
      s.conf.set(NanosConf, "true")
    normalizeEventTs(load(s, d, "events"))
  }

  /** See [[events]]; shared with the streaming file source, which reads
    * with the batch loader's schema and needs the same conversion. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** [[documents]] with a FLOOR on scan parallelism (r21, guide §2.5
    * input skew / §2.4): the corpus parquet can be a single small file
    * (594 KB at sf0.1 → ONE scan split), and the text-heavy consumers
    * (shingling, minhash signatures) fan each doc out ~200× map-side —
    * with the old explode+`.distinct()` shape the distinct's Exchange
    * incidentally re-spread that work across the cluster; after the
    * r21 map-side dedup removed it, every downstream exchange's map
    * side ran single-task. Repartitioning the DOCS (1× text bytes)
    * by doc_id is strictly cheaper than the removed shuffle of the
    * ~3× larger exploded shingle frame, deterministic (hash of a
    * stable key — guide §2.5's retry rule), and SCALE-ADAPTIVE: the
    * explicit partition count pins the exchange at the session's
    * default parallelism (cores, any master), and at real corpus
    * sizes the scan already exceeds it, so no exchange is added at
    * all. */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    spread(documents(s, d), "doc_id")

  /** The generic scan-parallelism floor behind [[documentsSpread]] /
    * [[embeddingsSpread]]: hash-repartition `df` by a stable key to the
    * session's default parallelism, ONLY when its current layout is
    * narrower — a structural no-op once the input outgrows one split. */
  def spread(df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, col(key))
    else df
  }
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** [[embeddings]] behind the same scan-parallelism floor as
    * [[documentsSpread]] — the vector corpus is the other single-small-
    * file input whose consumers do heavy per-row map work (64-dim
    * cosine/quantize/posexplode chains) before their first exchange. */
  def embeddingsSpread(s: SparkSession, d: String): DataFrame =
    spread(embeddings(s, d), "vec_id")
}
