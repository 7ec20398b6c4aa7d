package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Training-mix construction operators: deterministic stratified
  * sampling and token-budget sharding — the two data-layout steps
  * between a cleaned corpus and a training run.
  *
  * Both are pure window/projection pipelines: one shuffle on the
  * stratum (or doc) key, no driver state, no RNG (order comes from md5
  * of the id, so the same corpus always yields the same mix — the
  * reproducibility property a training pipeline needs).
  */
object Sampling {

  /** Deterministic stratified take: up to `quota` rows per stratum,
    * chosen by md5-hash order of the id (a uniform, seedable-by-prefix
    * permutation that both Spark and any SQL engine reproduce exactly).
    * One hash-partitioned window per stratum — at 100 TB this is a
    * single shuffle keyed by the stratum column.
    */
  def stratified(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      quota: Int,
      seed: String = ""
  ): DataFrame = {
    val order = md5(concat(lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(order, col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= quota)
  }

  /** Token-budget sharding: assign contiguous chunks (ordered by
    * `orderCols` within each group) to shards of ≈`budget` tokens —
    * shard_id = floor(previous cumulative tokens / budget). A chunk
    * straddling a boundary goes to the earlier shard (its tokens were
    * counted from the pre-boundary total), so every shard holds at
    * least `budget - max_chunk + 1` and at most `budget + max_chunk - 1`
    * tokens: the standard packing tolerance. Pure running-sum window —
    * one shuffle on the group key.
    */
  def tokenShards(
      df: DataFrame,
      groupCol: String,
      tokensCol: String,
      budget: Long,
      orderCols: Seq[String]
  ): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col(tokensCol)).over(w)
    df.withColumn("shard_id", floor((cum - col(tokensCol)) / lit(budget)).cast("long"))
      .withColumn("cum_tokens", cum.cast("long"))
  }

  /** Per-shard packing report: chunk count and token total per shard. */
  def shardStats(sharded: DataFrame, groupCol: String, tokensCol: String): DataFrame =
    sharded
      .groupBy(col(groupCol), col("shard_id"))
      .agg(count("*").as("n_chunks"), sum(col(tokensCol)).cast("long").as("shard_tokens"))
}
