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

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects.
    * Read nanos as long (legacy conf, see [[NanosConf]]) and convert to a
    * micros timestamp with integer division (a double division would lose
    * precision — epoch-nanos exceed 2^53). Source data is
    * micro-resolution, so the conversion is exact. */
  def events(s: SparkSession, d: String): DataFrame = {
    if (!s.conf.getOption(NanosConf).contains("true"))
      s.conf.set(NanosConf, "true")
    load(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
