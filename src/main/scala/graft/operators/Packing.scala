package graft.operators

import graft.functions.TextOps
import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sequence packing: lay a corpus out as fixed-token-budget training
  * sequences, GPT-style — concatenate documents in a deterministic
  * order and cut every `budget` tokens. The core primitive is a GLOBAL
  * prefix sum over token counts, and the whole point of this
  * implementation is that it never materializes a single-partition
  * window: Spark executes `Window.orderBy` with no partition key on ONE
  * task, which is exactly the 100 TB failure mode. Instead it does the
  * classic two-phase scan:
  *
  *   1. range-partition by the order key and locally cumsum each
  *      partition (one pass, no shuffle beyond the range exchange);
  *   2. collect ONE subtotal per partition (a few KB even on a
  *      1000-executor cluster), prefix them on the driver, and
  *      broadcast-join the per-partition offsets back.
  *
  * Reference anchor: chunker.py:49 counts tokens per chunk but the
  * reference has no cross-document packing; this is the training-data
  * layout step its corpus would need next.
  */
object Packing {

  /** Per-document global token offsets and sequence assignment.
    *
    * Output: `(doc_id, n_tokens, start_offset, seq_id, spans)` ordered
    * by the order key — `start_offset` is the document's first token's
    * position in the concatenated corpus stream, `seq_id =
    * start_offset / budget` the fixed-size training sequence that token
    * lands in, and `spans` whether the document crosses a sequence
    * boundary (packing-aware loaders mask attention there).
    *
    * Equivalent to `floor(sum(n) OVER (ORDER BY id ROWS UNBOUNDED
    * PRECEDING) - n) / budget` — the DuckDB twin runs literally that —
    * but distributed: the only driver-side state is one `Long` per
    * partition.
    */
  def packSequences(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      budget: Long
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counted = docs
      .select(col(idCol).cast("long"), TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    // Range exchange + local sort gives global order across partition
    // boundaries; the local cumsum then only needs a per-partition
    // starting offset to become global.
    val localCum = counted
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(idCol)
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var run = 0L
        it.map { case (id, n) => run += n; (pid, id, n, run) }
      }
      .toDF("pid", idCol, "n_tokens", "local_cum")
      // Materialize ONCE: the subtotal collect and the offset join must
      // see the same rows (a recompute could legally re-sample range
      // bounds and shift partition membership between passes).
      .localCheckpoint()
    val totals = localCum.groupBy("pid").agg(max("local_cum").as("tot"))
      .orderBy("pid").as[(Int, Long)].collect() // one row PER PARTITION — O(cluster), not O(data)
    val offsets = totals.scanLeft((Int.MinValue, 0L)) { case ((_, acc), (pid, tot)) => (pid, acc + tot) }
    val exclusive = totals.map(_._1).zip(offsets.map(_._2)).toSeq // pid -> sum of all earlier partitions
    val offsetDf = spark.createDataFrame(exclusive).toDF("pid", "part_offset")
    localCum
      .join(broadcast(offsetDf), "pid")
      .withColumn("start_offset", col("part_offset") + col("local_cum") - col("n_tokens"))
      .withColumn("seq_id", expr(s"start_offset DIV $budget")) // long DIV: exact past 2^53 where double floor() is not
      .withColumn("spans", pmod(col("start_offset"), lit(budget)) + col("n_tokens") > budget)
      .select(idCol, "n_tokens", "start_offset", "seq_id", "spans")
      .orderBy(idCol)
  }

  /** Per-sequence packing report over [[packSequences]]: how many
    * documents START in each fixed-budget sequence and how many of
    * their tokens it anchors. One extra hash aggregation on `seq_id` —
    * map-side combinable, shuffles one row per sequence.
    */
  def packStats(packed: DataFrame, idCol: String): DataFrame =
    packed
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("seq_tokens"),
        min(idCol).as("first_doc"),
        max(idCol).as("last_doc"),
        sum(when(col("spans"), 1L).otherwise(0L)).as("n_spanning")
      )
      .orderBy("seq_id")
}
