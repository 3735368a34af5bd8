package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Deterministic mergeable quantile sketch: a fixed uniform histogram
  * over a caller-declared value range.
  *
  * Why this shape instead of t-digest/KLL: those sketches are
  * merge-order-sensitive (the compaction sequence depends on which
  * partials meet first), so their estimates change run to run under
  * Spark's nondeterministic partial-aggregation order, and can never be
  * cross-engine-verified exactly. A histogram's merge is elementwise
  * addition — commutative and associative — so the sketch is
  * bit-identical regardless of partitioning, and the estimate can be
  * replicated exactly in plain SQL (the DuckDB oracle recomputes the
  * same bins, cumulative ranks, and interpolation — a sketch operator
  * with a hash-exact oracle, not just a bounds check).
  *
  * Error contract: rank-exact within a bin; value error ≤ bin width
  * = (hi − lo) / bins. Out-of-range values clamp into the edge bins
  * (declared-range sketches; pick [lo, hi] from domain knowledge).
  *
  * Estimate: target rank r = ⌈q·n⌉ (1-based); find the first bin whose
  * cumulative count reaches r; interpolate linearly within the bin by
  * the rank fraction (r − cumBefore) / count(bin).
  *
  * Scale: the buffer is `bins` longs (8 KiB at 1024 bins), partial+final
  * like any hash aggregate — shuffles carry one buffer per
  * (partition, group) regardless of input size. */
case class HistQuantileAgg(
    child: Expression,
    lo: Double,
    hi: Double,
    bins: Int,
    q: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bins > 0 && hi > lo && q >= 0.0 && q <= 1.0,
    s"hist_quantile misconfigured: bins=$bins range=[$lo,$hi] q=$q")

  private val width = (hi - lo) / bins

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true // empty group → null
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hist_quantile expects a double column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      var b = math.floor((x - lo) / width).toInt
      if (b < 0) b = 0 else if (b >= bins) b = bins - 1
      buf(b) += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < bins) { n += buf(i); i += 1 }
    if (n == 0L) null
    else {
      val r = math.ceil(q * n).toLong.max(1L) // 1-based target rank
      var cum = 0L
      var b = 0
      while (cum + buf(b) < r) { cum += buf(b); b += 1 }
      // same operation order as the SQL oracle: lo + w*bin + w*frac
      lo + width * b + width * ((r - cum).toDouble / buf(b).toDouble)
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bins * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bins)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): HistQuantileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistQuantileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistQuantileAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "hist_quantile"
}

object HistQuantileAgg {
  import org.apache.spark.sql.graftshim

  def apply(x: Column, lo: Double, hi: Double, bins: Int, q: Double): Column =
    graftshim.toColumn(
      HistQuantileAgg(graftshim.toExpression(x), lo, hi, bins, q)
        .toAggregateExpression())
}
