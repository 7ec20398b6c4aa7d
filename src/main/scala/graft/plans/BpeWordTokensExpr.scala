package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: BPE token count of one pre-token under a fixed
  * merge table (reference: chunker.py:24 `_get_tokenizer` — token
  * budgets come from a real tokenizer, not whitespace counts).
  *
  * The merge table rides along as a codegen reference object (same
  * pattern as [[PqEncode]]); the generated code is a single static call,
  * so the projection stays inside whole-stage codegen. Merges apply in
  * rank order with left-to-right non-overlapping passes — semantics
  * shared exactly with [[graft.operators.Bpe.encodeWord]] and the DuckDB
  * twin's `replace()` chain (see Bpe's scaladoc for the equivalence with
  * best-rank-first encoding).
  */
case class BpeWordTokens(child: Expression, merges: Array[Array[String]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t          => TypeCheckResult.TypeCheckFailure(s"bpe_word_tokens expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    BpeWordTokens.count(input.asInstanceOf[UTF8String], merges)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.addReferenceObj("bpeMerges", merges, "java.lang.String[][]")
      s"${ev.value} = graft.plans.BpeWordTokens$$.MODULE$$.count($c, $m);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeWordTokens {

  /** Static worker shared by eval and generated code. */
  def count(word: UTF8String, merges: Array[Array[String]]): Int = {
    var syms = graft.operators.Bpe.codePointSyms(word.toString)
    var m = 0
    while (m < merges.length && syms.length >= 2) {
      val l = merges(m)(0)
      val r = merges(m)(1)
      var has = false; var i = 0
      while (!has && i < syms.length - 1) {
        if (syms(i) == l && syms(i + 1) == r) has = true
        i += 1
      }
      if (has) syms = graft.operators.Bpe.mergePair(syms, l, r)
      m += 1
    }
    syms.length
  }
}
