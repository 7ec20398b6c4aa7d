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

  /** Temperature-flattened mixture resampling (the mT5 §3.2 / CC
    * multilingual-mix move, α = 0.5): group g of size n_g keeps
    * `floor(sqrt(n_g · n_min))` rows — i.e. a keep RATE of
    * sqrt(n_min/n_g), so the smallest group keeps ~everything and
    * high-resource groups are downsampled toward balance. Anchoring the
    * q ∝ p^α normalization at n_min (instead of Σ p^α) keeps every
    * number an exact integer under ONE `sqrt` — sqrt is IEEE
    * correctly-rounded where `pow` is not, so any engine reproduces the
    * quotas bit-for-bit; a Σ-of-doubles would be summation-order-
    * dependent. Selection within a group is the same deterministic
    * md5-order permutation as [[stratified]].
    *
    * Shape at scale: one count aggregation, a two-row broadcast, one
    * window shuffle keyed by the group column.
    */
  def temperatureMix(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      seed: String = ""
  ): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
    val nMin = counts.agg(min(col("n_g")).as("n_min"))
    val quotas = counts
      .crossJoin(broadcast(nMin))
      .withColumn("keep_g",
        least(col("n_g"), floor(sqrt((col("n_g") * col("n_min")).cast("double"))).cast("long")))
      .select(col(groupCol), col("n_g"), col("keep_g"))
    val order = md5(concat(lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol)).orderBy(order, col(idCol))
    df.select(col(groupCol), col(idCol))
      .withColumn("mix_rank", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq(groupCol))
      .filter(col("mix_rank") <= col("keep_g"))
      .orderBy(col(groupCol), col("mix_rank"))
  }

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
