package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Bloom-filter aggregate over a string key: `bits` bits set by `k`
  * md5-derived hash functions, returned as one `array<bigint>` of
  * `bits/64` words (bit p lives at word `p div 64`, position `p mod 64`).
  *
  * The 100 TB use is the SEMI-JOIN PRE-FILTER: build the filter over a
  * selective dimension key set (a few KB), broadcast it, and drop fact
  * rows that cannot join BEFORE the shuffle — Spark's own runtime row
  * filtering does this opportunistically, but an explicit deterministic
  * filter is storable, reusable across queries, and cross-engine
  * checkable. Membership says "maybe present" (false positives only,
  * never false negatives): a passing row may still fail the real join,
  * a failing row never joins.
  *
  * Determinism contract (same as [[CountMinAgg]]): merge is bitwise OR —
  * commutative, associative, idempotent — so the filter is bit-identical
  * under any partitioning, and the bit positions reuse
  * [[CountMinAgg.bucket]]'s portable md5 hash, so the ENTIRE filter and
  * its membership test replicate in DuckDB SQL (the oracle carries the
  * set of bit positions instead of packed words — provably the same
  * predicate). Scale: the buffer is `bits/64` longs (512 B at 4096 bits)
  * through partial aggregation; the build side never shuffles. */
case class BloomAgg(
    child: Expression,
    bits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bits > 0 && bits % 64 == 0 && k > 0,
    s"bloom_agg misconfigured: bits=$bits k=$k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false // empty group → all-zero filter
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a string key column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](bits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var i = 0
      while (i < k) {
        val pos = CountMinAgg.bucket(i, s, bits)
        buf(pos >>> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
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
    Array.fill(bits / 64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "bloom_agg"
}

object BloomAgg {
  import org.apache.spark.sql.graftshim

  def apply(key: Column, bits: Int, k: Int): Column =
    graftshim.toColumn(
      BloomAgg(graftshim.toExpression(key), bits, k)
        .toAggregateExpression())
}
