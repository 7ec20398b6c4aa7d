package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: hyperplane-LSH bucket signature — one
  * '0'/'1' char per plane, bit i = sign of the sequential dot product
  * of the vector with integer plane i.
  *
  * The plane matrix rides along as a codegen reference object; the
  * generated code is one fused two-level loop per row. Replaces
  * nPlanes separate interpreted `aggregate(zip_with(...))` HOF passes
  * (each a codegen fallback) — the form that matters when bucketing
  * every vector of a 100 TB corpus.
  *
  * Numerics are IDENTICAL to the HOF form and to the DuckDB twin
  * (OracleSql.lshSig): per-element double promotion, left-to-right
  * accumulation from 0.0, sign test `>= 0`. A null element makes the
  * projection NaN (sign false → '0'), matching the HOF's null-poisoned
  * `when().otherwise("0")` rendering.
  */
case class HyperplaneSig(child: Expression, planes: Array[Array[Int]])
    extends UnaryExpression {

  private def dim: Int = planes.head.length

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hyperplane_sig expects array<float|double>, got $t")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHaveNullElements: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val chars = new Array[Char](planes.length)
    var i = 0
    while (i < planes.length) {
      val w = planes(i)
      var dot = 0.0
      var d = 0
      while (d < n) {
        val x =
          if (mayHaveNullElements && v.isNullAt(d)) Double.NaN
          else if (isFloat) v.getFloat(d).toDouble
          else v.getDouble(d)
        dot += x * w(d)
        d += 1
      }
      chars(i) = if (dot >= 0) '1' else '0'
      i += 1
    }
    UTF8String.fromString(new String(chars))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("lshPlanes", planes, "int[][]")
      val chars = ctx.freshName("chars")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val w = ctx.freshName("w")
      val x = ctx.freshName("x")
      val getX =
        if (mayHaveNullElements)
          s"double $x = $a.isNullAt($d) ? Double.NaN : ${if (isFloat) s"(double) $a.getFloat($d)" else s"$a.getDouble($d)"};"
        else
          s"double $x = ${if (isFloat) s"(double) $a.getFloat($d)" else s"$a.getDouble($d)"};"
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |char[] $chars = new char[${planes.length}];
         |for (int $i = 0; $i < ${planes.length}; $i++) {
         |  int[] $w = $pl[$i];
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $getX
         |    $dot += $x * $w[$d];
         |  }
         |  $chars[$i] = ($dot >= 0) ? '1' : '0';
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(new String($chars));
       """.stripMargin
    })

  // structural equality over array contents (see [[ExprArrayEq]])
  override def equals(other: Any): Boolean = other match {
    case o: HyperplaneSig => o.child == child && ExprArrayEq.deq(o.planes, planes) && o.productArity == productArity
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child, ExprArrayEq.dhash(planes): Integer)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
