package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: 1-based start positions of an exact
  * token-phrase inside a token array, as `array<int>`.
  *
  * The composed HOF form (`filter(sequence(...), i -> element_at
  * conjunction)`, TextOps.phrasePositionsHof) is a codegen fallback —
  * interpreted per position per row, the measured hot spot of
  * `phrase_search` (~4.3 s of a 36 s bench round at sf0.1). This
  * expression emits one fused Java scan per row, the same pattern as
  * [[CosineSimilarity]].
  *
  * Semantics are IDENTICAL to the HOF form: positions are 1-based,
  * a phrase longer than the token array (or an empty phrase) yields an
  * empty array, and null elements never match.
  */
case class PhrasePositions(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"phrase_positions expects two string arrays, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(t: Any, p: Any): Any = {
    val toks = t.asInstanceOf[ArrayData]
    val ph = p.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = ph.numElements()
    if (m == 0 || n < m) {
      UnsafeArrayData.fromPrimitiveArray(Array.emptyIntArray)
    } else {
      val buf = new Array[Int](n - m + 1)
      var cnt = 0
      var i = 0
      while (i + m <= n) {
        var ok = true
        var j = 0
        while (ok && j < m) {
          if (toks.isNullAt(i + j) || ph.isNullAt(j) ||
            !toks.getUTF8String(i + j).equals(ph.getUTF8String(j))) ok = false
          j += 1
        }
        if (ok) { buf(cnt) = i + 1; cnt += 1 }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(buf, cnt))
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val buf = ctx.freshName("buf")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ok = ctx.freshName("ok")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int[] $buf = new int[($m > 0 && $n >= $m) ? ($n - $m + 1) : 0];
         |int $cnt = 0;
         |if ($m > 0) {
         |  for (int $i = 0; $i + $m <= $n; $i++) {
         |    boolean $ok = true;
         |    for (int $j = 0; $ok && $j < $m; $j++) {
         |      if ($a.isNullAt($i + $j) || $b.isNullAt($j) ||
         |          !$a.getUTF8String($i + $j).equals($b.getUTF8String($j))) $ok = false;
         |    }
         |    if ($ok) $buf[$cnt++] = $i + 1;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $cnt));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
