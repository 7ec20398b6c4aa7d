package graft.operators

import graft.functions.TextOps
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
  /** DoReMi-style domain reweighting (Xie et al. 2023,
    * arXiv:2305.10429): domain weights from a proxy model's
    * per-domain EXCESS loss via exponentiated-gradient ascent,
    * smoothed toward the uniform mixture — the published method for
    * choosing the pretraining data MIXTURE, the step [[temperatureMix]]
    * (a heuristic) and [[dsirResample]] (per-example) sit either side
    * of. The proxy scorer here is the checked-in bigram LM
    * ([[Lm.model]] — the CCNet filter model), the reference loss the
    * cross-domain mean, so excess_i = max(0, L_i − mean_j L_j). The
    * losses are constant across EG steps (no retraining inside one
    * operator call), which collapses the k-step update
    * w_i ← w_i·exp(η·excess_i) to its closed form
    * w_i ∝ exp(k·η·excess_i) — computed directly, documented here.
    *
    * Determinism: per-doc NLL enters as ln of the ROUNDED ppl and the
    * domain means round before differencing, so both engines
    * difference identical doubles (the perplexity-twin contract).
    * Shape at scale: the corpus-sized work is [[Lm.perplexity]]'s
    * linear pass — run ONCE: the cross-domain reference and the
    * normalizer are all-rows window aggregates over the O(domains)
    * per-domain table instead of separate re-aggregations (Spark does
    * not share common subtrees within one plan, so the previous
    * `dom.agg` / `ex.agg` legs each re-ran the whole corpus pass —
    * three scans at 100 TB for arithmetic over a handful of rows).
    * The partition-less windows are bounded by construction: they see
    * one row per DOMAIN, never corpus rows.
    */
  def doremiWeights(
      df: DataFrame,
      textCol: String,
      domainCol: String,
      idCol: String,
      eta: Double = 0.5,
      steps: Int = 5,
      eps: Double = 0.2
  ): DataFrame = {
    val nll = Lm.perplexity(df, textCol, idCol)
      .join(df.select(col(idCol), col(domainCol)), idCol)
      .filter(col("ppl").isNotNull)
      .select(col(domainCol), log(col("ppl")).as("_nll"))
    val dom = nll.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("_nll")), 5).as("mean_nll"))
    val all = Window.partitionBy()
    // The cross-domain reference is computed in EXACT integer
    // arithmetic: the domain means are 5-dp grid points, so their mean
    // lands on a .5 rounding boundary with high probability (measured:
    // at sf0.01 it sits EXACTLY on one — avg·1e5 = 338655.5 — and a
    // double `round(avg(...), 5)` flips with summation order in any
    // engine, Spark and DuckDB alike). Scale to exact longs, sum
    // (associative), and round half-up on the exact rational
    // (2S + n) div (2n) — valid since nll = ln(ppl) ≥ 0 (ppl ≥ 1 by
    // construction: ppl = exp(mean(−log p)), log p ≤ 0). The final
    // /1e5 double divide is IEEE-exactly-rounded on both engines.
    val ex = dom
      .withColumn("_k", round(col("mean_nll") * lit(100000.0)).cast("long"))
      .withColumn("_ref",
        (expr("(2 * sum(_k) over () + count(1) over ()) div (2 * count(1) over ())")
          .cast("double") / lit(100000.0)))
      .drop("_k")
      .withColumn("_nd", count(lit(1)).over(all))
      .withColumn("_excess", greatest(lit(0.0), col("mean_nll") - col("_ref")))
      .withColumn("_raw", exp(lit(eta * steps) * col("_excess")))
    ex.withColumn("_tot", sum(col("_raw")).over(all))
      .select(col(domainCol), col("n_docs"), col("mean_nll"),
        round(col("_excess"), 5).as("excess"),
        round(lit(1 - eps) * col("_raw") / col("_tot") +
          lit(eps) / col("_nd"), 5).as("weight"))
      .orderBy(col(domainCol))
  }

  /** UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151):
    * spread a total token budget as uniformly as possible across
    * domains, capping each domain at `epochCap` epochs of its own
    * data — the published alternative to temperature mixing that
    * bounds repetition of low-resource domains explicitly. The
    * solution is classic water-filling: sort domains by cap
    * ascending; a domain is CAPPED iff granting its cap to itself and
    * every later domain still fits the budget
    * (S_{i−1} + c_i·(n−i+1) ≤ T); all uncapped domains share the
    * leftover equally (the water level L = (T − Σ_capped c_j)/(n−k)).
    *
    * Determinism: token counts, caps, prefix sums and the capped test
    * are EXACT long arithmetic; only the final level division is a
    * double, rounded to 5 dp before the epochs ratio (also 5 dp) —
    * both engines divide identical longs.
    *
    * Shape at scale: the corpus-sized work is one tokenize+count
    * aggregation; the water-filling runs on the O(domains) table via a
    * bounded self-join (domains² rows — no partition-less window) and
    * two one-row broadcasts.
    */
  def unimaxWeights(
      df: DataFrame,
      textCol: String,
      domainCol: String,
      epochCap: Long = 2L,
      budgetFrac: Double = 0.5
  ): DataFrame = {
    val dom = df
      .select(col(domainCol).as("domain"),
        size(TextOps.tokenize(col(textCol))).cast("long").as("_n"))
      .groupBy(col("domain"))
      .agg(sum(col("_n")).as("n_tokens"))
      .withColumn("cap", col("n_tokens") * epochCap)
    // The whole water-fill is window arithmetic over the O(domains)
    // aggregate — one corpus tokenize pass total. (The previous
    // tot/self-join/kAgg legs each re-referenced `dom`, and Spark does
    // not share common subtrees in one plan, so the corpus pass ran
    // 5×.) The partition-less windows see one row per DOMAIN, never
    // corpus rows; all values are the same exact longs as before —
    // row_number/running-sum in (cap, domain) order is exactly the
    // bounded self-join's strictly-before count/sum.
    val all = Window.partitionBy()
    val ord = Window.partitionBy().orderBy(col("cap"), col("domain"))
    val flagged = dom
      .withColumn("_total", sum(col("n_tokens")).over(all))
      .withColumn("_nd", count(lit(1)).over(all))
      .withColumn("_budget",
        floor(col("_total").cast("double") * budgetFrac).cast("long"))
      .withColumn("_rk",
        row_number().over(ord).cast("long"))
      .withColumn("_s_before", coalesce(
        sum(col("cap")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("capped",
        col("cap") * (col("_nd") - col("_rk") + 1) + col("_s_before") <= col("_budget"))
    flagged
      .withColumn("_sk", sum(when(col("capped"), col("cap")).otherwise(0L)).over(all))
      .withColumn("_k", sum(when(col("capped"), 1L).otherwise(0L)).over(all))
      .withColumn("alloc_tokens",
        round(when(col("capped"), col("cap").cast("double"))
          .otherwise((col("_budget") - col("_sk")).cast("double") /
            (col("_nd") - col("_k")).cast("double")), 5))
      .select(col("domain"), col("n_tokens"), col("cap"), col("capped"),
        col("alloc_tokens"),
        round(col("alloc_tokens") / col("n_tokens").cast("double"), 5).as("epochs"))
      .orderBy(col("domain"))
  }

  def temperatureMix(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      seed: String = ""
  ): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
    // n_min via an all-rows window over the O(groups) aggregate — the
    // separate `counts.agg` leg re-ran the corpus count pass (common
    // subtrees are not shared within a plan); the window sees one row
    // per group, never corpus rows.
    val quotas = counts
      .withColumn("n_min", min(col("n_g")).over(Window.partitionBy()))
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
  /** LEAKAGE-SAFE train/val/test split: the assignment key is the
    * GROUP (source / domain / url host), never the document, so
    * near-duplicates and template siblings — which overwhelmingly live
    * within one source — cannot straddle the split boundary (the
    * classic train-on-eval leak that per-document random splits
    * produce). Deterministic and engine-portable: bucket = first 4 md5
    * hex chars of (seed, group) mod 100, split by cumulative integer
    * weights. A pure projection — every doc of a group gets the same
    * split by construction, no shuffle at all.
    */
  def groupSplit(
      df: DataFrame,
      groupCol: String,
      seed: String,
      trainPct: Int = 90,
      valPct: Int = 5
  ): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"invalid split weights: $trainPct/$valPct")
    val bucket = (conv(
      substring(md5(concat_ws(":", lit(seed), col(groupCol).cast("string"))), 1, 4),
      16, 10).cast("long") % 100).cast("long")
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

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

  /** Deterministic GLOBAL training-order shuffle + round-robin shard
    * assignment — the last layout step before a training run: examples
    * must arrive in a fixed pseudo-random order, reproducible across
    * reruns and engines, split into `nShards` equal streams for the
    * data-parallel loader.
    *
    * The permutation key is md5(seed:id) (seedable, uniform, no RNG
    * state); the GLOBAL position in that order comes from the same
    * two-phase scan as [[Packing.packSequences]] — range-partition by
    * the key, index each partition locally, collect ONE count per
    * partition and broadcast the prefix offsets back — never a
    * partition-less `row_number` window (the single-task trap at
    * 100 TB). `shard = pos % nShards` deals positions round-robin, so
    * shard sizes differ by at most one and every shard sees the global
    * order's interleaving (no locality bias from contiguous blocks).
    */
  /** Range-exchange on (_sk, _id) with a uniform per-row salt as the
    * final sort dimension — the skew-proof exchange [[shuffleShards]]
    * rides on, factored out so the partition-balance property is
    * directly testable. Equal (_sk, _id) rows may split across adjacent
    * range partitions; the partitioner still guarantees inter-partition
    * ordering on the leading keys, which is all the two-phase global
    * indexing needs.
    */
  private[graft] def saltedRangeExchange(
      keyed: DataFrame,
      parts: Int,
      seed: String
  ): DataFrame =
    keyed
      .withColumn("_salt", rand(seed.hashCode.toLong))
      .repartitionByRange(parts, col("_sk"), col("_id"), col("_salt"))

  def shuffleShards(
      df: DataFrame,
      idCol: String,
      seed: String,
      nShards: Int
  ): DataFrame = {
    require(nShards > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val origType = df.schema(idCol).dataType
    val keyed = df.select(
      col(idCol).cast("string").as("_id"),
      md5(concat_ws(":", lit(seed), col(idCol).cast("string"))).as("_sk"))
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    // SALTED range exchange: md5 keys are uniform over distinct ids, but
    // a pathologically duplicated id maps every copy to ONE range key and
    // the whole run lands on one task. The salt only tie-breaks equal
    // (_sk, _id) pairs — rows that are identical in this projection and
    // therefore interchangeable — so the OUTPUT (the id → positions
    // multiset) is unchanged while the largest partition stays ~n/parts
    // whatever the id distribution (spec plants a 70%-hot key and checks
    // the bound).
    val local = saltedRangeExchange(keyed, parts, seed)
      .sortWithinPartitions("_sk", "_id")
      .select("_id", "_sk")
      .as[(String, String)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var i = 0L
        it.map { case (id, _) => val r = (pid, id, i); i += 1; r }
      }
      .toDF("pid", idCol, "local_idx")
      .localCheckpoint() // counts and the offset join must see identical partitioning
    val counts = local.groupBy("pid").agg(count(lit(1)).as("n"))
      .orderBy("pid").as[(Int, Long)].collect() // one row PER PARTITION
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).dropRight(1)).toSeq
    val offsetDf = spark.createDataFrame(offsets).toDF("pid", "part_offset")
    local
      .join(broadcast(offsetDf), "pid")
      .withColumn("pos", col("part_offset") + col("local_idx"))
      .withColumn("shard", pmod(col("pos"), lit(nShards.toLong)))
      .withColumn("pos_in_shard", expr(s"pos DIV ${nShards}"))
      .select(col(idCol).cast(origType).as(idCol), col("pos"), col("shard"), col("pos_in_shard"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): select raw examples whose hashed-n-gram profile
    * looks like a TARGET distribution. Per the paper: (1) hash tokens
    * into `buckets` features; (2) fit bag-of-words models p̂ (target
    * rows, `targetCol`) and q̂ (all rows), add-one smoothed; (3) score
    * each doc log w(x) = Σ_b n_b(x)·(ln p̂_b − ln q̂_b); (4) Gumbel
    * top-k — rank by log w + g where g = −ln(−ln u) and u is a
    * deterministic md5-derived uniform per id (hash noise instead of an
    * RNG keeps the sample reproducible run-to-run, the property a
    * training pipeline needs).
    *
    * Scale shape: the fitted model is `buckets` doubles — a token-level
    * aggregation down to O(buckets) rows, broadcast back; doc scoring is
    * one (id, bucket) partial-agg then a broadcast join; the final
    * top-k is a sort-limit (Spark's TakeOrdered — never a full sort at
    * the driver). No shuffle carries text. Scores are rounded to 4 dp
    * before ranking so the order is summation-order- and libm-portable.
    */
  def dsirResample(
      df: DataFrame,
      textCol: String,
      idCol: String,
      targetCol: Column,
      buckets: Int,
      topK: Int
  ): DataFrame = {
    val tok = df
      .select(col(idCol), targetCol.as("_is_t"), explode(TextOps.tokenize(col(textCol))).as("_term"))
      .withColumn("_b", TextOps.hashedBowDim(col("_term"), buckets))
    val perDoc = tok.groupBy(col(idCol), col("_b")).agg(count(lit(1)).as("_cnt"))
    val rawCnt = tok.groupBy(col("_b")).agg(count(lit(1)).as("_rc"))
    val tgtCnt = tok.filter(col("_is_t")).groupBy(col("_b")).agg(count(lit(1)).as("_tc"))
    val totals = tok.agg(
      count(lit(1)).as("_R"),
      sum(when(col("_is_t"), 1L).otherwise(0L)).as("_T"))
    val model = rawCnt
      .join(tgtCnt, Seq("_b"), "left")
      .na.fill(0L, Seq("_tc"))
      .crossJoin(broadcast(totals))
      .withColumn("_lr",
        log((col("_tc").cast("double") + 1.0) / (col("_T").cast("double") + buckets.toDouble))
          - log((col("_rc").cast("double") + 1.0) / (col("_R").cast("double") + buckets.toDouble)))
      .select(col("_b"), col("_lr"))
    val logw = perDoc
      .join(broadcast(model), Seq("_b"))
      .groupBy(col(idCol))
      .agg(round(sum(col("_cnt").cast("double") * col("_lr")), 4).as("log_weight"))
    // deterministic uniform in (0,1) from the first 6 md5 hex chars
    val u = (conv(substring(md5(concat(lit("dsir:"), col(idCol).cast("string"))), 1, 6), 16, 10)
      .cast("double") + 0.5) / 16777216.0
    logw
      .withColumn("sample_key", round(col("log_weight") - log(-log(u)), 4))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(topK)
  }
}
