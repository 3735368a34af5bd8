package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count-min sketch aggregate: a `depth × width` counter matrix over a
  * string key, returned as one flat `array<bigint>` (row-major,
  * counter (i, b) at index `i*width + b`).
  *
  * Point-frequency estimate for key x: `min_i M[i][h_i(x)]` — always an
  * OVERestimate (counters only collide upward), error ≤ n·e/width with
  * probability 1−e^−depth. The reference has no sketches; this is the
  * heavy-hitters primitive a training-data pipeline uses to find
  * hot documents/URLs/users without a full distinct aggregation.
  *
  * Determinism contract (same reasoning as [[HistQuantileAgg]]): the
  * merge is elementwise addition — commutative and associative — so the
  * sketch is bit-identical regardless of partitioning, and because the
  * row hashes are md5-derived (not seeded JVM hashing) the ENTIRE sketch
  * is replicable in DuckDB SQL: `h_i(x) = ('0x' || substr(md5(i || ':' ||
  * x), 1, 15))::BIGINT % width`, counters = GROUP BY (i, bucket). The
  * oracle is hash-exact, not a bounds check.
  *
  * Scale: the buffer is `depth*width` longs (2 KiB at 4×64) carried once
  * per (partition, group) through partial aggregation — the input never
  * shuffles. Sketches are DATA: union two sketches by elementwise sum
  * (posexplode + groupBy(pos) in plain relational algebra — see
  * `CountMinSpec`), the same reaggregation move as `rel_hll_sketch_union`.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, s"cms_agg misconfigured: $depth x $width")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false // empty group → zero matrix
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_agg expects a string key column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var i = 0
      while (i < depth) {
        buf(i * width + CountMinAgg.bucket(i, s, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "cms_agg"
}

object CountMinAgg {
  import org.apache.spark.sql.graftshim

  private val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Row-i bucket of key s: the first 15 hex digits of md5("i:s") as a
    * 60-bit non-negative integer, mod width. Equals Spark SQL
    * `conv(substr(md5(concat(i, ':', s)), 1, 15), 16, 10)::long % width`
    * and DuckDB `('0x' || substr(md5(i || ':' || s), 1, 15))::BIGINT
    * % width` — the portable cross-engine hash (SCALE.md). */
  def bucket(i: Int, s: String, width: Int): Int = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest((i.toString + ":" + s).getBytes("UTF-8"))
    // first 15 hex digits = bytes 0..6 plus the high nibble of byte 7
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (bytes(k) & 0xffL); k += 1 }
    v = (v << 4) | ((bytes(7) & 0xf0L) >>> 4)
    (v % width).toInt
  }

  def apply(key: Column, depth: Int, width: Int): Column =
    graftshim.toColumn(
      CountMinAgg(graftshim.toExpression(key), depth, width)
        .toAggregateExpression())
}
