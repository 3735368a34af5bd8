package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Sink/source round-trips beyond parquet: CSV and JSON writes of a
  * real query result re-read losslessly (Java's shortest-round-trip
  * double formatting makes even float columns exact). */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val d = "/root/testdata/sf0.001"

  test("query results round-trip through csv and json sinks") {
    val df = Relational.pricingSummary(spark, d) // strings, doubles, longs
    val want = df.collect().toSet

    val csvPath = "/tmp/graft-test-warehouse/rt_csv"
    df.write.mode("overwrite").option("header", "true").csv(csvPath)
    val csvBack = spark.read.schema(df.schema)
      .option("header", "true").csv(csvPath).collect().toSet
    assert(csvBack === want, "csv round-trip")

    val jsonPath = "/tmp/graft-test-warehouse/rt_json"
    df.write.mode("overwrite").json(jsonPath)
    val jsonBack = spark.read.schema(df.schema)
      .json(jsonPath).collect().toSet
    assert(jsonBack === want, "json round-trip")
  }

  test("query results round-trip through the orc sink, schema preserved") {
    val df = Relational.pricingSummary(spark, d)
    val want = df.collect().toSet
    val orcPath = "/tmp/graft-test-warehouse/rt_orc"
    df.write.mode("overwrite").orc(orcPath)
    val back = spark.read.orc(orcPath)
    // names + types survive (ORC reads every column as nullable)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)), "orc carries its own schema")
    assert(back.collect().toSet === want, "orc round-trip")
    // columnar format: predicate + column pruning reach the ORC scan
    val pruned = back.select("l_returnflag").filter(
      org.apache.spark.sql.functions.col("l_returnflag") === "A")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_returnflag:string>"),
      s"orc scan must prune columns:\n$scan")
  }
}
