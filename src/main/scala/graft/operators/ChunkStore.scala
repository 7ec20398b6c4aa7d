package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental parquet chunk store: merge-on-read deltas + tombstones +
  * compaction — the maintenance loop of the reference store
  * (store.py:180 `upsert_chunks`, :237 `delete_document`) re-expressed
  * for immutable columnar storage.
  *
  * Layout: `<root>/delta=NNNNN/` parquet dirs, monotonically numbered;
  * delta 0 is the base. A row is live if it carries the highest delta
  * number for its key and is not a tombstone. Readers resolve
  * latest-wins with one window over the key — no driver-side state; a
  * periodic [[compact]] folds everything back into a single delta so
  * read amplification stays bounded (exactly the LSM/Delta pattern).
  *
  * All store maintenance goes through the Hadoop FileSystem API
  * resolved from the root path's scheme, so the same code runs against
  * local disk, HDFS or S3A — the 100 TB deployment target. Crash
  * safety: the compaction temp dir is invisible to readers (no
  * `delta=` prefix), the compacted delta supersedes the old ones via
  * latest-wins the moment it lands, and leftover old deltas or temp
  * dirs from a crash are cleaned by the next compact.
  */
class ChunkStore(val root: String, val keyCol: String) {

  private def spark0(df: DataFrame) = df.sparkSession

  private val rootPath = new Path(root)

  private def fs(spark: SparkSession): FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def deltaDirs(spark: SparkSession): Seq[(Int, Path)] = {
    val f = fs(spark)
    if (!f.exists(rootPath)) Seq.empty
    else
      f.listStatus(rootPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("delta="))
        .map(s => s.getPath.getName.stripPrefix("delta=").toInt -> s.getPath)
        .sortBy(_._1)
  }

  private def nextDelta(spark: SparkSession): Int =
    deltaDirs(spark).lastOption.map(_._1 + 1).getOrElse(0)

  /** Append an upsert batch (latest delta wins per key on read). */
  def upsert(rows: DataFrame): Unit = {
    val n = nextDelta(spark0(rows))
    rows
      .withColumn("_tombstone", lit(false))
      .write.mode("errorifexists").parquet(s"$root/delta=$n")
  }

  /** Append tombstones for a set of keys. Deleting from an empty store
    * writes a tombstone-only delta 0 (a later upsert of the same key
    * still wins by delta order).
    */
  def delete(keys: DataFrame): Unit = {
    val spark = spark0(keys)
    val dirs = deltaDirs(spark)
    val n = dirs.lastOption.map(_._1 + 1).getOrElse(0)
    val withPayload =
      if (dirs.isEmpty) keys.select(col(keyCol))
      else {
        val template = read(spark).limit(0).drop("_tombstone")
        keys.select(col(keyCol)).join(template, Seq(keyCol), "left_outer") // null-fill payload columns
      }
    withPayload
      .withColumn("_tombstone", lit(true))
      .write.mode("errorifexists").parquet(s"$root/delta=$n")
  }

  /** Merge-on-read view: latest version per key, tombstones dropped.
    * Internal bookkeeping columns never leak to callers.
    */
  def read(spark: SparkSession): DataFrame = {
    val dirs = deltaDirs(spark)
    require(dirs.nonEmpty, s"empty store at $root")
    val all = dirs.map { case (n, path) =>
      spark.read.parquet(path.toString).withColumn("_delta", lit(n))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("_delta").desc)
    all
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_tombstone"))
      .drop("_rn", "_delta", "_tombstone")
  }

  /** Fold all deltas into a fresh single delta (bounded read
    * amplification); old deltas are removed only after the rewrite
    * lands, so a crash at any point leaves a readable store.
    */
  def compact(spark: SparkSession): Unit = {
    val f = fs(spark)
    val resolved = read(spark).withColumn("_tombstone", lit(false))
    val tmp = s"$root/_compact_tmp"
    resolved.write.mode("overwrite").parquet(tmp)
    val old = deltaDirs(spark)
    val n = old.lastOption.map(_._1 + 1).getOrElse(0)
    // land the compacted delta, then drop the superseded ones
    spark.read.parquet(tmp).write.mode("errorifexists").parquet(s"$root/delta=$n")
    old.foreach { case (_, p) => f.delete(p, true) }
    f.delete(new Path(tmp), true): Unit
  }

  def fileCount(spark: SparkSession): Int = {
    val f = fs(spark)
    deltaDirs(spark).map { case (_, p) =>
      f.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    }.sum
  }

  def deltaCount(spark: SparkSession): Int = deltaDirs(spark).size

  final case class MaintenanceReport(deltasBefore: Int, deltasAfter: Int, compacted: Boolean)

  /** Threshold-triggered compaction policy: fold the chain only once
    * read amplification (delta count ≈ files merged per read) exceeds
    * `maxDeltas` — the size-tiered-compaction trade: ingest pays
    * nothing per batch, and the occasional full fold keeps every read
    * bounded at ≤ maxDeltas merge inputs. Reuses [[compact]]'s
    * crash-safe order (new delta lands before old ones are removed),
    * which is why the policy folds the WHOLE chain rather than a
    * prefix: a prefix fold would have to re-number a delta in place,
    * opening a window where a crash loses the folded rows. At 100 TB
    * the refinement is leveled compaction with a manifest (atomic
    * pointer swap, e.g. Delta/Iceberg's log) — the policy seam here
    * stays the same.
    */
  def maintain(spark: SparkSession, maxDeltas: Int = 8): MaintenanceReport = {
    val before = deltaCount(spark)
    if (before > maxDeltas) {
      compact(spark)
      MaintenanceReport(before, deltaCount(spark), compacted = true)
    } else MaintenanceReport(before, before, compacted = false)
  }
}
