package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score, id) entries per
  * group, ordered by (score DESC, id ASC) — a total order, so results
  * are reproducible across engines and partitionings.
  *
  * Why not `row_number() OVER (PARTITION BY query_id ...)`: a window
  * funnels EVERY corpus row into one partition per query_id — with 10
  * queries that is 10 partitions holding n×10 rows, a driver-adjacent
  * bottleneck at 100 TB. This aggregate is partial+final like any hash
  * agg: each of the input partitions reduces its slice to a k-entry
  * buffer map-side, and the shuffle carries only
  * #partitions × #queries × k entries — constant per partition,
  * independent of corpus size.
  *
  * The buffer is a pair of primitive arrays with insertion sort — k is
  * user-query-sized (top-5/top-100), so insertion beats a heap on
  * constant factors and keeps the buffer allocation-free per row.
  *
  * Output: array<struct<id: bigint, score: double>> in rank order
  * (ranks = position + 1 after `posexplode`). */
case class TopKAgg(
    id: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] {

  require(k > 0, "top-k aggregate needs k > 0")

  override def children: Seq[Expression] = id :: score :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType == LongType && score.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_agg expects (bigint id, double score), got " +
        s"(${id.dataType}, ${score.dataType})")

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val iv = id.eval(input)
    val sv = score.eval(input)
    if (iv != null && sv != null)
      buf.insert(iv.asInstanceOf[Long], sv.asInstanceOf[Double])
    buf
  }

  override def merge(b1: TopKAgg.Buffer, b2: TopKAgg.Buffer): TopKAgg.Buffer = {
    var i = 0
    while (i < b2.n) { b1.insert(b2.ids(i), b2.scores(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKAgg.Buffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = InternalRow(buf.ids(i), buf.scores(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKAgg.Buffer(k)
    var i = 0
    // entries arrive already rank-ordered; insert preserves that
    while (i < n) { buf.insert(bb.getLong(), bb.getDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(id = newChildren(0), score = newChildren(1))

  override def prettyName: String = "topk_agg"
}

object TopKAgg {
  import org.apache.spark.sql.graftshim

  /** k-bounded rank-ordered buffer: parallel primitive arrays, entries
    * kept sorted by (score DESC, id ASC). */
  final class Buffer(val k: Int) {
    val ids = new Array[Long](k)
    val scores = new Array[Double](k)
    var n = 0

    /** True when (s1, i1) ranks strictly better than (s2, i2). */
    @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)

    def insert(id: Long, score: Double): Unit = {
      if (n == k && !beats(score, id, scores(n - 1), ids(n - 1))) return
      // find insertion point from the tail, shifting worse entries down
      var i = math.min(n, k - 1)
      while (i > 0 && beats(score, id, scores(i - 1), ids(i - 1))) {
        ids(i) = ids(i - 1); scores(i) = scores(i - 1); i -= 1
      }
      ids(i) = id; scores(i) = score
      if (n < k) n += 1
    }
  }

  def apply(id: Column, score: Column, k: Int): Column =
    graftshim.toColumn(
      TopKAgg(graftshim.toExpression(id), graftshim.toExpression(score), k)
        .toAggregateExpression())
}
