package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: sign-bit pack of vector dims
  * [word·64, min(dim, word·64+64)) into one long — bit (i mod 64) set
  * iff element i > 0 (strict: zeros, NaNs, nulls and out-of-range
  * indexes pack as 0, matching the element_at/when chain it replaces
  * and the DuckDB twin's direct sign test).
  *
  * Why native and not 64 `when(element_at(...))` terms: the chain is
  * correct and plans in microseconds, but fused into a stage that also
  * carries the IVF assignment ([[NearestCentroid]] over √N centroids),
  * the generated `processNext` blows past HotSpot's ~8 KB JIT bytecode
  * ceiling and the WHOLE stage — including the 64k-flop-per-row
  * assignment loop — runs in the bytecode interpreter. Measured on the
  * round-11 structured-recall study: `Bq.writeIvfBq` at 1M vectors /
  * nlist=1000 sat at 30 cores for >25 min (vs ~30 s for the same-shape
  * SQ write whose quantize is two small HOF loops); with this
  * expression the write is seconds. Invisible at the 500-vector
  * correctness scale — plan SIZE is a scale axis (the round-8 ADC and
  * round-10 CASE-assignment lesson, third sighting, new path).
  */
case class PackSignBits(child: Expression, word: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pack_sign_bits expects array<float|double>, got $t")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHaveNullElements: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => false
  }

  private def lo: Int = word * 64
  private def hi: Int = math.min(dim, word * 64 + 64)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(hi, v.numElements())
    var bits = 0L
    var i = lo
    while (i < n) {
      val positive =
        if (mayHaveNullElements && v.isNullAt(i)) false
        else if (isFloat) v.getFloat(i) > 0f
        else v.getDouble(i) > 0d
      if (positive) bits |= 1L << (i % 64)
      i += 1
    }
    bits
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bits = ctx.freshName("bits")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val pos = ctx.freshName("pos")
      val test =
        if (isFloat) s"$a.getFloat($i) > 0f"
        else s"$a.getDouble($i) > 0d"
      val posExpr =
        if (mayHaveNullElements) s"!$a.isNullAt($i) && ($test)"
        else test
      s"""
         |long $bits = 0L;
         |int $n = java.lang.Math.min($hi, $a.numElements());
         |for (int $i = $lo; $i < $n; $i++) {
         |  boolean $pos = $posExpr;
         |  if ($pos) $bits |= 1L << ($i % 64);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
