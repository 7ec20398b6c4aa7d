package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native k-shingle production: tokens → the n−k+1 space-joined
  * k-grams, as one compiled loop.
  *
  * Drop-in for the HOF form `transform(sequence(1, n−k+1), i →
  * concat_ws(" ", element_at(ts, i), …, element_at(ts, i+k−1)))` that
  * [[graft.functions.TextOps.rawShingles]] used through round 11 —
  * bit-identical output (UTF8String.concatWs skips null elements
  * exactly like ConcatWs; n < k yields the empty array), so every
  * md5-of-shingle downstream (contamination, bloom, span dedup,
  * minhash/LSH, n-gram census/diversity) is unchanged and the DuckDB
  * twins hold. A NULL token array yields the EMPTY shingle array, not
  * null — the HOF form's behavior (its when() fell through to the
  * empty-array otherwise on a null size), pinned in TextOpsSpec.
  *
  * Why native: the HOF lambda is interpreted per SHINGLE (k element_at
  * lookups + a ConcatWs eval through the interpreted-expression path),
  * sitting on the hottest path in the text suite — every token of the
  * corpus passes through it k times. A compiled loop over the
  * ArrayData also shrinks the enclosing generated stage (the
  * first-execution/JIT-exposure axis PLANS.md round 12 dissected).
  * Measured at sf0.1 steady-state: contamination_check 0.92 → 0.74 s,
  * bloom_decontaminate 1.10 → 0.89 s, dup_ngrams 0.85 → 0.62 s,
  * ngram_diversity 0.46 → 0.26 s (join/md5-bound consumers flat).
  */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingles need k >= 1 (got $k)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingles expects array<string>, got $t")
  }

  private val sep = UTF8String.fromString(" ")

  /** The compiled loop — public so the generated code is one call. */
  def shingle(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < k) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](n - k + 1)
      val window = new Array[UTF8String](k)
      var i = 0
      while (i <= n - k) {
        var j = 0
        while (j < k) {
          window(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
          j += 1
        }
        // concatWs skips nulls — the ConcatWs contract the HOF form had
        out(i) = UTF8String.concatWs(sep, window: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullable: Boolean = false

  private val emptyArr: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Public for the generated code's null branch. */
  def empty: ArrayData = emptyArr

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptyArr else shingle(v.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("shingler", this, classOf[Shingles].getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $ref.empty() : $ref.shingle(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
