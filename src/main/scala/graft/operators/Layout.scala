package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * A time-sorted table prunes time predicates but scatters every other
  * column across all files; a Z-ordered table interleaves the bits of
  * two dimensions so each file covers a small RECTANGLE of (a, b)
  * space. Parquet footer min/max on BOTH columns then prune files and
  * row groups for 2-D box predicates — at 100 TB this is the
  * difference between scanning a slice and scanning the table
  * (Delta/Iceberg `OPTIMIZE ZORDER BY` is this exact move).
  *
  * Everything is plain long bit arithmetic on codegen'd built-ins
  * (shiftleft / bitwise and-or) — no UDF, no shuffle beyond the one
  * range-repartition that any layout rewrite needs.
  */
object Layout {

  /** Spread the low 16 bits of `x`: bit i moves to position 2i
    * (the classic Morton shift-or-mask chain, all 64-bit ops).
    */
  private def spread16(x: Column): Column = {
    val v0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Z-value interleaving the low 16 bits of `a` (even bit
    * positions) and `b` (odd positions). Inputs must already be
    * bucketed to 16-bit range by the caller (e.g. id, minute index).
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Rewrite `df` as `nFiles` parquet files clustered by the Z-order of
    * (dimA, dimB). Raw values are first scaled to equal-width 8-bit
    * buckets — interleaving RAW values lets the wider dimension's high
    * bits dominate the curve and the narrow dimension never prunes
    * (Delta's OPTIMIZE ZORDER interleaves range-partition ids for the
    * same reason). Scaling here is (x−min)·256/(max−min+1) in exact
    * long arithmetic from one min/max aggregation; for heavily skewed
    * dims substitute approxQuantile boundaries — the interleave and
    * write are unchanged. Then: range-repartition on the z-value
    * (equal-size files, contiguous z-ranges) and sort within each
    * partition so row groups inside a file are tight rectangles too.
    */
  def zorderWrite(df: DataFrame, dimA: String, dimB: String, nFiles: Int, path: String): Unit = {
    val mm = df.agg(
      min(col(dimA)).cast("long"), max(col(dimA)).cast("long"),
      min(col(dimB)).cast("long"), max(col(dimB)).cast("long")).head()
    def bucket(c: Column, lo: Long, hi: Long): Column =
      ((c.cast("long") - lo) * 256L / (hi - lo + 1L)).cast("long")
    df.withColumn("_z", zValue(
        bucket(col(dimA), mm.getLong(0), mm.getLong(1)),
        bucket(col(dimB), mm.getLong(2), mm.getLong(3))))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
