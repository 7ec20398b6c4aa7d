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
}
