package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: dense matrix × vector — out[i] =
  * Σ_j M[i][j]·x[j], sequential left-to-right accumulation in doubles
  * (bit-compatible with DuckDB's `list_dot_product` row by row, so a
  * twin can recompute the rotation exactly).
  *
  * Used for the seeded random-rotation pre-step in front of sign-bit
  * quantization ([[graft.operators.Bq.rotationMatrix]]): a random
  * orthogonal rotation spreads axis-concentrated variance across every
  * sign bit while preserving all angles — measured 0.0 -> 0.9 recall
  * on an axis-aligned low-rank corpus (BqSpec), the standard
  * production pre-transform (FAISS OPQ/rotation family).
  *
  * The matrix rides as one codegen reference object (dim² doubles —
  * 32 KB at dim 64); the composable `transform`/`aggregate` form would
  * either inline dim² literal nodes or re-evaluate whole-row folds per
  * element (both measured plan hazards — see PLANS.md round-8/9/11).
  */
case class MatVec(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  private def rows: Int = matrix.length
  private def cols: Int = matrix.head.length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"mat_vec expects array<float|double>, got $t")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(cols, v.numElements())
    val out = new Array[Double](rows)
    var i = 0
    while (i < rows) {
      val row = matrix(i)
      var acc = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        acc += row(j) * x
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("matVecMatrix", matrix, "double[][]")
      val out = ctx.freshName("out")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val getX = if (isFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      s"""
         |int $n = java.lang.Math.min($cols, $a.numElements());
         |double[] $out = new double[$rows];
         |for (int $i = 0; $i < $rows; $i++) {
         |  double[] $row = $m[$i];
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += $row[$j] * ($getX);
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  // structural equality over array contents (see [[ExprArrayEq]])
  override def equals(other: Any): Boolean = other match {
    case o: MatVec => o.child == child && ExprArrayEq.deq(o.matrix, matrix) && o.productArity == productArity
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child, ExprArrayEq.dhash(matrix): Integer)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
