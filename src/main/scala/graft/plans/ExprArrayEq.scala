package graft.plans

/** Structural equality helpers for Catalyst expressions carrying Array
  * reference-object params (round-11 ADVICE: a case class with an Array
  * field falls back to reference identity in equals/hashCode, so two
  * semantically identical expressions built from distinct array
  * instances never canonicalize equal — missed common-subexpression
  * elimination and plan-cache churn, silently).
  */
private[plans] object ExprArrayEq {
  /** Deep content equality for (possibly nested) array values. */
  def deq(a: AnyRef, b: AnyRef): Boolean =
    java.util.Arrays.deepEquals(Array(a), Array(b))

  /** Deep content hash for a (possibly nested) array value. */
  def dhash(a: AnyRef): Int =
    java.util.Arrays.deepHashCode(Array(a))
}
