package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Event-table temporal operators. */
object Events {

  /** As-of lookup within one table: for every row, the most recent
    * value of `markerValue` at rows satisfying `markerPred`, looking
    * backward in (timeCol, tieCol) order per key. The classic as-of
    * join expressed as a running `max` window — one shuffle on the key,
    * no self-join, no point-in-time probe per row (which is what makes
    * naive as-of joins explode at scale).
    */
  def asOfLastMarker(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tieCol: String,
      markerPred: Column,
      markerValue: Column,
      outName: String
  ): DataFrame = {
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_marker", when(markerPred, markerValue))
      .withColumn(outName, max(col("_marker")).over(w))
      .drop("_marker")
  }

  /** General two-table as-of join (trades/quotes style): for every left
    * row, the `rightVal` of the most recent right row with the same key
    * and time ≤ the left row's time. Expressed as union + one running
    * window — ONE shuffle on the key, never a per-row point-in-time
    * probe or a range self-join (the shapes that explode at scale).
    *
    * Tie semantics: a right row at exactly the left row's time IS
    * visible (right rows sort before left rows at equal times).
    * `rightVal` must be max-monotone-encodable (the running max carries
    * a (time, value) struct so the LATEST — not largest — value wins).
    */
  def asOfJoin(
      left: DataFrame,   // (keyCol, timeCol, ...payload)
      right: DataFrame,  // (keyCol, timeCol, rightVal)
      keyCol: String,
      timeCol: String,
      rightVal: String,
      outName: String
  ): DataFrame = {
    val l = left.withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(right.schema(rightVal).dataType))
    val r = right
      .select(col(keyCol), col(timeCol), col(rightVal).as("_rv"))
      .withColumn("_side", lit(0))
    val all = l.unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal times → visible
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry (time, value): max over structs picks the latest right row
    val carried = max(when(col("_side") === 0, struct(col(timeCol), col("_rv")))).over(w)
    all
      .withColumn(outName, carried.getField("_rv"))
      .filter(col("_side") === 1)
      .drop("_side", "_rv")
  }
}
