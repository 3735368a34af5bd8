package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{IntVecDot, IntVecSqDist}

/** The r21 native integer-vector kernels must replicate the
  * `aggregate(zip_with(...), 0L, _ + _)` formulations they replaced on
  * the PQ/IVF hot paths EXACTLY — including the null semantics
  * (unequal lengths / null elements → NULL), since every oracle value
  * downstream is a function of these sums. */
class IntVecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def refDot = (a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)
  private def refSq = (a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  test("dot and sqdist match the zip_with formulation on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 64).map { i =>
      (i.toLong,
        Seq.fill(16)((rnd.nextInt(1 << 21) - (1 << 20)).toLong),
        Seq.fill(16)((rnd.nextInt(1 << 21) - (1 << 20)).toLong))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      IntVecDot(col("a"), col("b")).as("d"),
      refDot(col("a"), col("b")).as("dr"),
      IntVecSqDist(col("a"), col("b")).as("q"),
      refSq(col("a"), col("b")).as("qr"))
    assert(out.filter(col("d") =!= col("dr") || col("q") =!= col("qr"))
      .count() === 0L)
    // and both evaluate non-null on well-formed input
    assert(out.filter(col("d").isNull || col("q").isNull).count() === 0L)
  }

  test("unequal lengths and null elements yield NULL, like zip_with") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L), Seq(1L, 2L, 3L)),         // unequal
      (Seq(1L, 2L, 3L), Seq(1L, 2L))          // unequal, other side
    ).toDF("a", "b")
    val out = df.select(
      IntVecDot(col("a"), col("b")).as("d"),
      refDot(col("a"), col("b")).as("dr"),
      IntVecSqDist(col("a"), col("b")).as("q"),
      refSq(col("a"), col("b")).as("qr")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    }
    // null element → NULL (construct via SQL to get a nullable array)
    GraftFunctions.register(spark)
    val n = spark.sql(
      """SELECT intvec_dot(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        |                  array(CAST(1 AS BIGINT), CAST(2 AS BIGINT))) AS d,
        |       intvec_sqdist(array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT)),
        |                     array(CAST(1 AS BIGINT), CAST(2 AS BIGINT))) AS q
        |""".stripMargin).collect()(0)
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("SQL registration works and computes the 3-4-5 example") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT intvec_dot(array(CAST(3 AS BIGINT), CAST(4 AS BIGINT)),
        |                  array(CAST(3 AS BIGINT), CAST(4 AS BIGINT))) AS n2,
        |       intvec_sqdist(array(CAST(3 AS BIGINT), CAST(4 AS BIGINT)),
        |                     array(CAST(0 AS BIGINT), CAST(0 AS BIGINT))) AS d2
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) === 25L)
    assert(r.getLong(1) === 25L)
  }
}
