package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All overlapping stride-1 character n-grams of a string whose bytes are
  * all in [a-z] — the reference's `countCombos/2` scan
  * (`/root/reference/mapreduce.erl:260-295`) as a native Catalyst
  * expression.
  *
  * Why a custom expression: the built-in formulation
  * (`sequence`+`transform`+`filter`+`rlike`) evaluates the lambda on the
  * INTERPRETED expression path — a fresh `java.util.regex.Matcher` per
  * array element and heavy boxing, which measured 10-100× slower than
  * codegen and suffered JIT deoptimization storms. This expression
  * implements `doGenCode`, so the whole scan→explode→partial-aggregate
  * stage stays inside one whole-stage-codegen span: a tight byte loop,
  * no regex, no per-element allocation beyond the output grams.
  *
  * Byte semantics match the reference (SURVEY.md §1: bytes, not code
  * points; validity = byte in [97,122]). Multi-byte UTF-8 chars have all
  * bytes outside [97,122], so they simply gate out their windows.
  */
case class NGramArray(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngram_array expects a string column, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](
      math.max(0, bytes.length - n + 1))
    var i = 0
    while (i + n <= bytes.length) {
      // skip-ahead: jump past the last invalid byte in the window,
      // mirroring the reference's scan (`mapreduce.erl:266-273`)
      var lastBad = -1
      var j = i + n - 1
      while (j >= i && lastBad < 0) {
        val b = bytes(j)
        if (b < 97 || b > 122) lastBad = j
        j -= 1
      }
      if (lastBad < 0) {
        out += UTF8String.fromBytes(bytes, i, n)
        i += 1
      } else i = lastBad + 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w => {
      val bytes = ctx.freshName("bytes")
      val tmp = ctx.freshName("tmp")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("cnt")
      val lastBad = ctx.freshName("lastBad")
      val b = ctx.freshName("b")
      s"""
      byte[] $bytes = $w.getBytes();
      UTF8String[] $tmp = new UTF8String[java.lang.Math.max(0, $bytes.length - ${n - 1})];
      int $k = 0;
      int $i = 0;
      while ($i + $n <= $bytes.length) {
        int $lastBad = -1;
        for (int $j = $i + ${n - 1}; $j >= $i; $j--) {
          byte $b = $bytes[$j];
          if ($b < 97 || $b > 122) { $lastBad = $j; break; }
        }
        if ($lastBad < 0) {
          $tmp[$k++] = UTF8String.fromBytes($bytes, $i, $n);
          $i++;
        } else {
          $i = $lastBad + 1;
        }
      }
      Object[] ${tmp}_out = new Object[$k];
      System.arraycopy($tmp, 0, ${tmp}_out, 0, $k);
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${tmp}_out);
      """
    })

  override def prettyName: String = "ngram_array"
  override protected def withNewChildInternal(newChild: Expression): NGramArray =
    copy(child = newChild)
}

object NGramArray {
  import org.apache.spark.sql.graftshim

  /** Column API: `NGramArray($"w", 2)`. */
  def apply(word: Column, n: Int): Column =
    graftshim.toColumn(NGramArray(graftshim.toExpression(word), n))
}
