package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native corpus tokenizer: lowercase, then maximal `[a-z0-9]` runs —
  * one compiled pass over the lowered UTF-8 bytes.
  *
  * Drop-in for `filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")`
  * ([[graft.functions.TextOps.tokenize]] through round 12), proved
  * equivalent rather than assumed:
  *  - lowercasing is Spark's OWN `UTF8String.toLowerCase` (full Unicode
  *    mapping — e.g. KELVIN SIGN U+212A lowers to ASCII 'k' and must
  *    tokenize, which a lowercase-free byte scan would miss);
  *  - after a true lowercase, every codepoint outside ASCII `[a-z0-9]`
  *    is a separator under the regex, and every UTF-8 byte of a
  *    multi-byte codepoint has the high bit set, so maximal
  *    `[a-z0-9]`-byte runs ARE the regex-split tokens; the `+` merges
  *    separator runs and the non-empty filter drops the leading empty —
  *    both fall out of run-scanning naturally.
  * Property-pinned against the HOF form on adversarial inputs
  * (ExpressionPropertySpec); every tokenize consumer is hash-gated.
  *
  * Why native: tokenize is the single most-used function in the suite
  * (every text operator starts with it). The replaced chain paid a
  * regex `Pattern` walk per row plus an INTERPRETED filter-lambda
  * evaluation per token, and its generated-code footprint landed in
  * every text stage (the first-execution exposure axis, PLANS.md
  * round 12). NULL propagates (split(lower(null)) was null).
  */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"tokenize expects string, got $t")
  }

  /** The compiled scan — public, one call from generated code. */
  def tok(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes // materialized UTF-8 (copy only if offset slice)
    val n = bytes.length
    val out = new java.util.ArrayList[Any](8)
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        val start = i
        i += 1
        while (i < n && {
          val c = bytes(i)
          (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) i += 1
        out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i)))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any = tok(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenizer", this, classOf[Tokenize].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.tok($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
