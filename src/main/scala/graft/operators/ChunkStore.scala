package graft.operators

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
  */
class ChunkStore(val root: String, val keyCol: String) {

  private def spark0(df: DataFrame) = df.sparkSession

  private def deltaDirs(spark: SparkSession): Seq[(Int, String)] = {
    val dir = new java.io.File(root)
    if (!dir.exists) Seq.empty
    else
      dir.listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("delta="))
        .map(f => f.getName.stripPrefix("delta=").toInt -> f.getAbsolutePath)
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

  /** Append tombstones for a set of keys. */
  def delete(keys: DataFrame): Unit = {
    val spark = spark0(keys)
    val n = nextDelta(spark)
    val template = read(spark).limit(0).drop("_tombstone")
    keys
      .select(col(keyCol))
      .join(template, Seq(keyCol), "left_outer") // null-fill payload columns
      .withColumn("_tombstone", lit(true))
      .write.mode("errorifexists").parquet(s"$root/delta=$n")
  }

  /** Merge-on-read view: latest version per key, tombstones dropped. */
  def read(spark: SparkSession): DataFrame = {
    val dirs = deltaDirs(spark)
    require(dirs.nonEmpty, s"empty store at $root")
    val all = dirs.map { case (n, path) =>
      spark.read.parquet(path).withColumn("_delta", lit(n))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("_delta").desc)
    all
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_tombstone"))
      .drop("_rn", "_delta")
  }

  /** Fold all deltas into a fresh single delta (bounded read
    * amplification); old deltas are removed after the rewrite lands.
    */
  def compact(spark: SparkSession): Unit = {
    val resolved = read(spark).withColumn("_tombstone", lit(false))
    val tmp = s"$root/_compact_tmp"
    resolved.write.mode("overwrite").parquet(tmp)
    val old = deltaDirs(spark)
    val n = old.lastOption.map(_._1 + 1).getOrElse(0)
    // land the compacted delta, then drop the superseded ones
    spark.read.parquet(tmp).write.mode("errorifexists").parquet(s"$root/delta=$n")
    old.foreach { case (_, p) => deleteRecursively(new java.io.File(p)) }
    deleteRecursively(new java.io.File(tmp))
  }

  def fileCount(spark: SparkSession): Int =
    deltaDirs(spark).map { case (_, p) =>
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    }.sum

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }
}
