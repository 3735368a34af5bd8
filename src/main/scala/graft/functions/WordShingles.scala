package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k-word shingles of a single-space-separated text: split on the
  * ASCII space byte, drop empty tokens, emit each run of k consecutive
  * words re-joined with one space. `k = 1` yields the token array itself.
  *
  * The document-dedup substrate (MinHash / SimHash / Jaccard shingling)
  * runs this over every document, so it is a native codegen'd expression
  * rather than `transform(sequence(...), i -> concat_ws(' ', slice(...)))`
  * — higher-order-function lambdas evaluate on the interpreted path (see
  * [[NGramArray]]'s Scaladoc for the measured cost).
  *
  * Byte-level splitting is correct for any UTF-8 input: 0x20 never occurs
  * inside a multi-byte sequence. */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // word boundaries: starts(i)..ends(i) of the i-th non-empty token
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) != ' ') {
        val s = i
        while (i < bytes.length && bytes(i) != ' ') i += 1
        starts.add(s); ends.add(i)
      } else i += 1
    }
    val nWords = starts.size()
    val nOut = math.max(0, nWords - k + 1)
    val out = new Array[Any](nOut)
    var w = 0
    while (w < nOut) {
      // shingle = bytes from starts(w) to ends(w+k-1) with inner gaps
      // collapsed to single spaces; tokens are space-separated runs, so
      // the source bytes between them are 1+ spaces — rebuild explicitly.
      val sb = new java.lang.StringBuilder()
      var t = w
      while (t < w + k) {
        if (t > w) sb.append(' ')
        sb.append(UTF8String.fromBytes(bytes, starts.get(t),
          ends.get(t) - starts.get(t)).toString)
        t += 1
      }
      out(w) = UTF8String.fromString(sb.toString)
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val bytes = ctx.freshName("bytes")
      val starts = ctx.freshName("starts")
      val ends = ctx.freshName("ends")
      val nw = ctx.freshName("nw")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      val ti = ctx.freshName("ti")
      val sb = ctx.freshName("sb")
      val out = ctx.freshName("out")
      s"""
      byte[] $bytes = $t.getBytes();
      int[] $starts = new int[$bytes.length / 2 + 1];
      int[] $ends = new int[$bytes.length / 2 + 1];
      int $nw = 0;
      int $i = 0;
      while ($i < $bytes.length) {
        if ($bytes[$i] != 32) {
          $starts[$nw] = $i;
          while ($i < $bytes.length && $bytes[$i] != 32) $i++;
          $ends[$nw] = $i;
          $nw++;
        } else $i++;
      }
      int ${out}_n = java.lang.Math.max(0, $nw - ${k - 1});
      Object[] $out = new Object[${out}_n];
      for (int $w = 0; $w < ${out}_n; $w++) {
        java.lang.StringBuilder $sb = new java.lang.StringBuilder();
        for (int $ti = $w; $ti < $w + $k; $ti++) {
          if ($ti > $w) $sb.append(' ');
          $sb.append(UTF8String.fromBytes($bytes, $starts[$ti], $ends[$ti] - $starts[$ti]).toString());
        }
        $out[$w] = UTF8String.fromString($sb.toString());
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })

  override def prettyName: String = "word_shingles"
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  import org.apache.spark.sql.graftshim

  def apply(text: Column, k: Int): Column =
    graftshim.toColumn(WordShingles(graftshim.toExpression(text), k))
}
