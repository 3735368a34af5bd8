package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HistQuantileAgg

/** Specs for the deterministic histogram quantile sketch. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hq(df: org.apache.spark.sql.DataFrame, q: Double,
      lo: Double = 0.0, hi: Double = 100.0, bins: Int = 1000): Option[Double] =
    Option(df.agg(HistQuantileAgg(col("x").cast("double"), lo, hi, bins, q))
      .head().get(0)).map(_.asInstanceOf[Double])

  test("estimate is within one bin width of the exact percentile") {
    val rnd = new scala.util.Random(41)
    val xs = Seq.fill(5000)(rnd.nextDouble() * 100.0)
    val df = xs.toDF("x")
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val exact = df.agg(expr(s"percentile(x, $q)")).head().getDouble(0)
      val est = hq(df, q).get
      assert(math.abs(est - exact) <= 0.1 + 1e-9,
        s"q=$q est=$est exact=$exact") // bin width = 100/1000
    }
  }

  test("merge-order invariance: estimate identical across partitionings") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(5000)(rnd.nextDouble() * 100.0)
    val base = hq(xs.toDF("x"), 0.9)
    for (parts <- Seq(1, 7, 32)) {
      val got = hq(xs.toDF("x").repartition(parts), 0.9)
      assert(got === base, s"partitioning $parts changed the estimate")
    }
  }

  test("out-of-range values clamp into edge bins; empty input is null") {
    // everything below lo lands in bin 0 → estimate = within first bin
    val low = hq(Seq(-5.0, -3.0).toDF("x"), 0.5)
    assert(low.get >= 0.0 && low.get <= 0.1)
    val high = hq(Seq(500.0).toDF("x"), 0.5)
    assert(high.get >= 99.9 && high.get <= 100.0)
    assert(hq(spark.emptyDataset[Double].toDF("x"), 0.5) === None)
  }

  test("rank semantics match ceil(q*n) on a tiny explicit input") {
    // 4 values, q=0.5 → rank 2; bins of width 1 → value ≈ the 2nd value's
    // bin, interpolated by rank fraction within the bin
    val df = Seq(1.5, 2.5, 3.5, 4.5).toDF("x")
    val est = hq(df, 0.5, lo = 0.0, hi = 10.0, bins = 10).get
    // rank 2 → bin [2,3) holds one value, frac = 1/1 → lo + w*2 + w*1 = 3.0
    assert(est === 3.0)
  }
}
