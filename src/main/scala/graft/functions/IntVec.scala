package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared scaffolding for the integer-vector kernels: elementwise
  * BIGINT combine + sum over two equal-length arrays.
  *
  * These replace the `aggregate(zip_with(a, b, f), 0L, _ + _)`
  * formulations on the PQ/IVF hot paths (r21, guide §4.1 / the
  * NGramArray hazard): higher-order-function lambdas evaluate on the
  * INTERPRETED path with per-element boxing and an allocated
  * intermediate array per row — and the encode/LUT stages evaluate one
  * such kernel per (row × codebook entry), the single hottest loop in
  * the ANN suite. Here the whole loop is one fused pass inside
  * whole-stage codegen.
  *
  * Semantics replicate the built-in formulation exactly so every
  * oracle value is untouched: integer sums are association-order-free;
  * unequal lengths (zip_with pads with null → null sum) and null
  * elements return NULL. */
sealed trait IntVecKernel extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint> inputs, " +
          s"got ${left.dataType} / ${right.dataType}")

  /** Scala combine for the interpreted path. */
  protected def combine(x: Long, y: Long): Long
  /** Java source combine for codegen; `x`/`y` are long variables. */
  protected def combineJava(x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += combine(x.getLong(i), y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
      int $n = $a.numElements();
      if ($n != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          long $xi = $a.getLong($i);
          long $yi = $b.getLong($i);
          $acc += ${combineJava(xi, yi)};
        }
        if (!${ev.isNull}) ${ev.value} = $acc;
      }
      """
    })
}

/** Σ aᵢ·bᵢ over two BIGINT arrays — the quantized-integer dot product
  * (ADC lookup tables, integer-cosine numerators/norms). */
case class IntVecDot(left: Expression, right: Expression)
    extends IntVecKernel {
  override protected def combine(x: Long, y: Long): Long = x * y
  override protected def combineJava(x: String, y: String): String =
    s"$x * $y"
  override def prettyName: String = "intvec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntVecDot =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over two BIGINT arrays — the quantized-integer squared
  * L2 distance (PQ encode argmin, residual LUTs, k-center radii). */
case class IntVecSqDist(left: Expression, right: Expression)
    extends IntVecKernel {
  override protected def combine(x: Long, y: Long): Long = {
    val d = x - y; d * d
  }
  override protected def combineJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override def prettyName: String = "intvec_sqdist"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntVecSqDist =
    copy(left = newLeft, right = newRight)
}

object IntVecDot {
  import org.apache.spark.sql.graftshim
  def apply(a: Column, b: Column): Column =
    graftshim.toColumn(
      IntVecDot(graftshim.toExpression(a), graftshim.toExpression(b)))
}

object IntVecSqDist {
  import org.apache.spark.sql.graftshim
  def apply(a: Column, b: Column): Column =
    graftshim.toColumn(
      IntVecSqDist(graftshim.toExpression(a), graftshim.toExpression(b)))
}
