package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** L2 norm of a float vector, accumulated in doubles in element order —
  * companion kernel to [[CosineSimilarity]] (same parity rules: the
  * DuckDB oracle reproduces it with
  * `sqrt(list_sum(list_transform(v::DOUBLE[], x -> x * x)))`).
  *
  * Native codegen'd expression for the same reason as [[CosineSimilarity]]:
  * the built-in `aggregate(v, 0d, (a, x) -> a + x * x)` formulation runs
  * its lambda interpreted with per-element boxing.
  *
  * Returns NULL for an empty vector (matches CosineSimilarity's
  * malformed-input stance). */
case class VectorNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_norm expects array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n == 0) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
      int $n = $v.numElements();
      if ($n == 0) {
        ${ev.isNull} = true;
      } else {
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $v.getFloat($i);
          $acc += $x * $x;
        }
        ${ev.value} = java.lang.Math.sqrt($acc);
      }
      """
    })

  override def prettyName: String = "vector_norm"
  override protected def withNewChildInternal(newChild: Expression): VectorNorm =
    copy(child = newChild)
}

object VectorNorm {
  import org.apache.spark.sql.graftshim

  def apply(vec: Column): Column =
    graftshim.toColumn(VectorNorm(graftshim.toExpression(vec)))
}
