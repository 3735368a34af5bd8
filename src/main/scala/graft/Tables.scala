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
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
