package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Skew mitigation: salted equi-join.
  *
  * When a join key is heavily skewed (one hot key lands a whole
  * partition on one task), salt the fact side into `saltFactor`
  * sub-keys and replicate the other side once per salt. Each hot key's
  * rows spread over `saltFactor` tasks; results are identical to the
  * plain join. AQE's skew-join handles many cases at runtime — explicit
  * salting is for the pathological keys AQE can't split (e.g. a single
  * giant key inside one shuffle block).
  */
object Skew {

  /** Equi-join `fact` (possibly skewed on `key`) with `other`,
    * spreading each key over `saltFactor` partitions. The fact side's
    * salt is derived deterministically from a uniformly-distributed
    * column (`spreadCol`, e.g. a row id) so the same input always joins
    * identically.
    */
  def saltedJoin(
      fact: DataFrame,
      other: DataFrame,
      key: String,
      spreadCol: String,
      saltFactor: Int
  ): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(hash(col(spreadCol)), lit(saltFactor)))
    val replicated = other
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Key-skew diagnostic for a prospective shuffle key: one row of
    * n_rows, n_keys, the hot key's count and share, the top-10 keys'
    * combined share, and the coefficient of variation of per-key
    * counts — the numbers that decide BETWEEN the mitigation levers
    * (max_share ≈ 1/parallelism or worse → salt that key; heavy tail
    * but no single monster → AQE skew split; cv ≈ 0 → plain shuffle
    * is fine). Two aggregation passes over the per-key count table
    * (one total, one top-10 TakeOrdered) + one-row broadcasts — the
    * diagnostic never shuffles more than the key-count table itself.
    *
    * Determinism: counts, Σc and Σc² are exact longs; the three
    * ratios are single double divisions from exact longs (cv via
    * sqrt(n·Σc² − (Σc)²)/Σc — no incremental variance), rounded to
    * 5 dp on both engines.
    */
  def keyStats(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("c"))
    val tot = counts.agg(
      sum(col("c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("max_count"),
      sum(col("c") * col("c")).as("_sumsq"))
    val top = counts.orderBy(col("c").desc, col(key)).limit(topK)
      .agg(coalesce(sum(col("c")), lit(0L)).as("_topk"))
    tot.crossJoin(broadcast(top))
      .select(
        col("n_rows"), col("n_keys"), col("max_count"),
        round(col("max_count").cast("double") / col("n_rows"), 5).as("max_share"),
        round(col("_topk").cast("double") / col("n_rows"), 5).as("top10_share"),
        // n_keys·Σc² − (Σc)² computed in DOUBLES: in long arithmetic the
        // product wraps silently past 2^63 at large scale (negative →
        // sqrt → NaN) while the DuckDB twin would raise on BIGINT
        // overflow — divergent exactly at the scale this diagnostic
        // targets. Doubles are exact below 2^53 and degrade gracefully
        // (monotone, no wrap) above; the twin casts identically.
        round(
          sqrt(col("n_keys").cast("double") * col("_sumsq").cast("double") -
            col("n_rows").cast("double") * col("n_rows").cast("double")) /
            col("n_rows").cast("double"), 5).as("cv"))
  }
}
