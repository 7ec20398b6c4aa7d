package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the IVF RESIDUAL of a vector —
  * `normalize(v) − centroids[cluster]` — with the centroid table as a
  * codegen reference object.
  *
  * This is the encode-side half of residual quantization (FAISS's
  * IVF,PQ / IVF,SQ residual forms): quantizers see the within-cell
  * offset instead of the absolute position, which is what keeps their
  * code budget spent on NEIGHBORHOOD structure when the corpus lives in
  * an anisotropic cone (the round-11 structured study measured
  * global-codebook PQ-ADC at recall 0.075 in that regime — the codes
  * were spanning the cone's offset, not its interior).
  *
  * Why native: the composable form is `zip_with(normalize(v),
  * element_at(<centroid literal array>, cluster+1), -)`, which inlines
  * nlist × dim literal nodes into the plan — fine at the 10-cell
  * correctness scale, a round-8-class plan-size blowup at the √N cells
  * a 10⁹-vector layout needs. Here the table rides along as one
  * reference object and the generated code is a two-line loop.
  *
  * Numerics match the composable form and the DuckDB twin exactly:
  * norm = sqrt of the sequential left-to-right Σx² in doubles, each
  * element x/norm − cent[i] (zero-norm vectors yield NaN residuals,
  * like `VectorOps.normalize`). A cluster id outside the table is an
  * error by construction (assignment produced it from the same table).
  */
case class CentroidResidual(
    vec: Expression,
    cluster: Expression,
    centroids: Array[Array[Double]])
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cluster

  private def dim: Int = centroids.head.length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, cluster.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), IntegerType | LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case (a, c) =>
      TypeCheckResult.TypeCheckFailure(
        s"centroid_residual expects (array<float|double>, int cluster), got ($a, $c)")
  }

  private def isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def isLongCluster: Boolean = cluster.dataType == LongType

  override def nullSafeEval(v0: Any, c0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    val c = if (isLongCluster) c0.asInstanceOf[Long].toInt else c0.asInstanceOf[Int]
    val cent = centroids(c)
    val n = math.min(dim, v.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      s += x * x
      i += 1
    }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = x / norm - cent(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, cl) => {
      val tbl = ctx.addReferenceObj("residualCentroids", centroids, "double[][]")
      val cent = ctx.freshName("cent")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      val getX = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |double[] $cent = $tbl[(int) $cl];
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getX;
         |  $s += $x * $x;
         |}
         |double $norm = java.lang.Math.sqrt($s);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getX;
         |  $out[$i] = $x / $norm - $cent[$i];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  // structural equality over array contents (see [[ExprArrayEq]])
  override def equals(other: Any): Boolean = other match {
    case o: CentroidResidual => o.vec == vec && o.cluster == cluster && ExprArrayEq.deq(o.centroids, centroids) && o.productArity == productArity
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(vec, cluster, ExprArrayEq.dhash(centroids): Integer)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, cluster = newRight)
}
