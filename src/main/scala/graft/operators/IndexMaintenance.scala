package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared maintenance contract of every persisted index family —
  * IVF vector layouts ([[Ann]], and the [[Pq]]/[[Sq]]/[[Bq]]/
  * [[Matryoshka]] compressed sidecars) and the BM25 postings layout
  * ([[Fts]]). One lifecycle, four verbs, implemented ONCE:
  *
  *  - '''write/append''' of a cluster-partitioned layout goes through
  *    [[writeClustered]]: a cluster-hash exchange BEFORE the
  *    partitioned write, so a write adds O(k) files, not
  *    O(writing-tasks × k) — without it a 32-task batch lands up to
  *    task×k files, and small-file accumulation (plus the commit/list
  *    cost per file) is what kills a continuously-maintained layout at
  *    scale. Raising spark.sql.shuffle.partitions on bigger corpora
  *    keeps each cluster in its own directory, just across more files.
  *  - '''delete''' lands as an append-only TOMBSTONE sidecar
  *    ([[appendTombstones]] under `_tombstones` — the underscore prefix
  *    keeps it invisible to the data scan), never a partition rewrite:
  *    merge-on-read applied to the index, the only delete shape that
  *    works on a continuously-probed 100 TB layout. [[freshIds]] is the
  *    idempotency filter for families that maintain driver-side stats
  *    (re-deleting an id must be a no-op, not silent stat drift).
  *  - '''read''' goes through the LIVE face ([[liveFace]]): the
  *    tombstone set (small next to the corpus — deletes are rare)
  *    broadcast-ANTI-joins inside the pruned scan, BEFORE any top-k
  *    heap, so results are all live; delete-free layouts have no
  *    sidecar and skip the join instead of failing the listing.
  *  - '''compact''' rewrites the live face into a FRESH directory
  *    ([[requireSeparateDir]] — mode(overwrite) over a directory
  *    concurrently read as input corrupts the index), from the index
  *    itself, never a corpus re-read.
  *
  * Reference behavior being re-expressed: store.py:197 rebuilds its
  * whole index on every upsert/delete — at Spark scale the equivalent
  * is delta segments + tombstones + periodic compaction, and every new
  * index family gets that lifecycle by mixing in this trait.
  */
trait IndexMaintenance {

  /** Sidecar directory name; underscore-prefixed so Spark's file index
    * ignores it when scanning the layout's data partitions.
    */
  final val TombstonesSub = "_tombstones"

  final def tombstonePath(dir: String): String =
    dir.stripSuffix("/") + "/" + TombstonesSub

  /** Sidecar existence through the Hadoop FileSystem API — the layout
    * dir decides which filesystem answers (file:/HDFS/S3), so the
    * live-face anti-join and the idempotent-delete guard hold on
    * cluster storage, not only on java.io-visible local paths (where a
    * silent `false` would serve tombstoned rows as live).
    */
  final def hasTombstones(dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(tombstonePath(dir))
    val conf = SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    p.getFileSystem(conf).exists(p)
  }

  final def tombstones(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(tombstonePath(dir))

  /** The layout's LIVE face: `df` (a scan or pruned scan of `dir`)
    * anti-joined against the tombstone sidecar when one exists.
    */
  final def liveFace(spark: SparkSession, dir: String, df: DataFrame, idCol: String): DataFrame =
    if (hasTombstones(dir))
      df.join(broadcast(tombstones(spark, dir)), Seq(idCol), "left_anti")
    else df

  /** Ids from `ids` NOT yet tombstoned — the idempotent-delete filter
    * (repeat calls and overlapping batches must not double-decrement a
    * family's driver-side stats).
    */
  final def freshIds(spark: SparkSession, dir: String, ids: DataFrame, idCol: String): DataFrame = {
    val requested = ids.select(idCol).distinct()
    if (hasTombstones(dir))
      requested.join(broadcast(tombstones(spark, dir)), Seq(idCol), "left_anti")
    else requested
  }

  /** Append a (deduplicated) id batch to the tombstone sidecar — one
    * small file per delete batch, O(deletes) bytes.
    */
  final def appendTombstones(ids: DataFrame, dir: String): Unit =
    ids.coalesce(1).write.mode("append").parquet(tombstonePath(dir))

  /** Cluster-partitioned layout write with the mandatory pre-write
    * cluster-hash exchange (see trait doc). `mode` is `overwrite` for
    * build/compact, `append` for delta maintenance.
    */
  final def writeClustered(df: DataFrame, path: String, mode: String): Unit =
    df.repartition(col("cluster"))
      .write.partitionBy("cluster").mode(mode).parquet(path)

  final def requireSeparateDir(family: String, srcDir: String, outDir: String): Unit =
    require(outDir != srcDir,
      s"$family compaction: output dir must differ from the source layout ($srcDir) — " +
        "mode(overwrite) over a directory concurrently read as input corrupts the index")
}
