package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Portable-HLL register aggregate over a precomputed 60-bit hash
  * column (`Dedup.md5hash60` — the hash stays a codegen'd expression;
  * this aggregate only does bucket/ρ/max): register j holds
  * `max(53 − bitlen(h div m))` over rows with `h mod m = j`, the exact
  * integers the relational formulation `GROUP BY bucket → max(rho)`
  * produces (`graft.operators.Relational.hllPortable`), returned as one
  * `array<int>` of length m (0 = empty bucket; real ρ ≥ 1).
  *
  * Why an aggregate and not the groupBy: it FUSES the sketch into the
  * same `groupBy(group)` pass as ordinary stats — one scan, one partial
  * aggregation, and the shuffle carries an m-int register array per
  * (partition, group) instead of either distinct values (exact NDV) or
  * a separate (group × bucket) aggregation requiring its own shuffle
  * and join-back. `rel_column_stats_sketch` is the consumer: the whole
  * ANALYZE report — counts, min/max/sum AND the NDV sketch — becomes
  * ONE partial+final aggregation.
  *
  * Determinism contract (the [[CountMinAgg]]/[[HistQuantileAgg]]
  * reasoning): merge is elementwise max — commutative, associative,
  * idempotent — so the register array is bit-identical under any
  * partitioning, and downstream estimate arithmetic (dyadic-rational
  * harmonic sum, the shared αm² literal) stays cross-engine exact; the
  * DuckDB oracle keeps the relational GROUP BY formulation and
  * hash-matches. */
case class HllRegAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  require(m > 0, s"hll_reg_agg misconfigured: m=$m")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false // empty group → zero registers
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_reg_agg expects a bigint hash column, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // the SQL surface (`hll_reg_agg` via GraftFunctions) accepts any
      // bigint column, so enforce the nonnegative 60-bit contract
      // (md5hash60 convention) with a named error instead of the
      // ArrayIndexOutOfBounds a negative `h % m` would throw — a
      // silent floorMod remap would diverge from the DuckDB oracle's
      // `h % m` bucket arithmetic (ADVICE r8)
      require(h >= 0L,
        s"hll_reg_agg requires a nonnegative hash (md5hash60-style " +
          s"60-bit convention); got $h")
      val bucket = (h % m).toInt
      val rest = h / m
      // ρ = 53 − bitlen(rest); Spark SQL's length(bin(rest)) ≡
      // 64 − numberOfLeadingZeros for rest > 0
      val rho =
        if (rest == 0L) 53
        else 53 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < b1.length) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(m)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(o: Int): HllRegAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "hll_reg_agg"
}

object HllRegAgg {
  import org.apache.spark.sql.graftshim

  def apply(hash: Column, m: Int): Column =
    graftshim.toColumn(
      HllRegAgg(graftshim.toExpression(hash), m).toAggregateExpression())
}
