package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Deterministic text featurization — the Spark-side stand-in for the
  * reference's batch embedder (embedder.py:41 `embed_documents`).
  *
  * Feature hashing (md5-bucketed bag of words) is vocabulary-free and
  * embarrassingly parallel: per-row token hashing, no fitted state, no
  * driver round-trip — at 100 TB it is a pure map stage. A real model
  * embedder slots into the same column contract (`embedding:
  * array<double>`), e.g. an ONNX scorer in mapPartitions.
  */
object Featurize {

  /** Pure-projection hashed-BoW embedding: one fold over the token
    * array builds the dense vector — no explode, no shuffle, no state.
    * Works identically on batch and streaming DataFrames (a plain map
    * stage), at O(dims) per token. One md5 per token.
    */
  def hashedBowInline(textCol: org.apache.spark.sql.Column, dims: Int): org.apache.spark.sql.Column = {
    val toks = TextOps.tokenize(textCol)
    val zero = array_repeat(lit(0.0), dims)
    val counts = aggregate(
      toks,
      zero,
      (acc, t) => {
        val d = TextOps.hashedBowDim(t, dims)
        zip_with(acc, sequence(lit(0), lit(dims - 1)),
          (x, i) => x + when(i.cast("long") === d, 1.0).otherwise(0.0))
      }
    )
    val norm = sqrt(aggregate(counts, lit(0.0), (acc, x) => acc + x * x))
    when(norm > 0, transform(counts, x => x / norm)).otherwise(counts)
  }

  /** Append an L2-normalized `embedding: array<double>` hashed-BoW
    * column; rows whose text has no tokens get the zero vector.
    */
  def hashedBow(df: DataFrame, textCol: String, dims: Int, keep: Seq[String]): DataFrame = {
    val counts = df
      .select(keep.map(col) :+ TextOps.tokenize(col(textCol)).as("_toks"): _*)
      .select(keep.map(col) :+ explode_outer(col("_toks")).as("_term"): _*)
      .withColumn("_dim", when(col("_term").isNotNull, TextOps.hashedBowDim(col("_term"), dims)))
    // two-level partial agg: (row, dim) counts, then dim->count map per row
    val perDim = counts
      .filter(col("_dim").isNotNull)
      .groupBy((keep.map(col) :+ col("_dim")): _*)
      .agg(count("*").as("_cnt"))
      .groupBy(keep.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("_dim"), col("_cnt")))).as("_m"))
    val rowsAll = df.select(keep.map(col): _*).distinct()
    val dense = rowsAll
      .join(perDim, keep, "left_outer")
      .withColumn(
        "_raw",
        transform(
          sequence(lit(0), lit(dims - 1)),
          i => coalesce(element_at(col("_m"), i.cast("long")), lit(0L)).cast("double")
        )
      )
    val norm = sqrt(aggregate(col("_raw"), lit(0.0), (acc, x) => acc + x * x))
    dense
      .withColumn(
        "embedding",
        when(norm > 0, transform(col("_raw"), x => x / norm))
          .otherwise(col("_raw"))
      )
      .drop("_m", "_raw")
  }
}
