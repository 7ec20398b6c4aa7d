package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary quantization (1 bit per dimension) for embedding columns —
  * the compression tier BELOW SQ8 (C7): each dimension collapses to
  * its sign bit, a 64-dim vector packs into ONE long, and the
  * candidate scan is pure integer bit work (XOR + popcount), the
  * cheapest distance a vector index can compute. Sign agreement on
  * the unit sphere is the hyperplane-LSH argument (Charikar '02,
  * axis-aligned planes): hamming distance is a monotone-enough proxy
  * for angle that a bounded exact re-rank recovers the true top-k —
  * the same refine contract as [[Sq.probe]]/[[Pca.probe]].
  *
  * Scale shape: the packed column is 8 bytes/vector — 32× smaller
  * than the float32 embeddings — so the exhaustive candidate scan
  * reads ~3% of the raw bytes, XOR+popcount stays inside whole-stage
  * codegen with no branches, and only `refine` rows per query touch
  * full vectors (served from the base table by id; a cluster layout
  * co-locates them exactly as the SQ path does). Everything is
  * deterministic integer/IEEE arithmetic, so the whole probe has an
  * exact DuckDB twin with NO fitted constants.
  *
  * Reference anchor: store.py:274 (index hint) — binary quantization
  * is the third standard ANN memory lever next to IVF (A15), PQ (C6)
  * and SQ8 (C7).
  */
object Bq {

  /** Sign-bit pack: bit i set iff v[i+1] > 0 (strict — zeros pack as
    * 0, matching the twin). A 64-term codegen'd integer sum, no HOFs
    * on the corpus side — the [[Pq.batchProbe]] lesson says giant
    * trees hurt, but 64 flat terms plan in microseconds and the
    * per-row evaluation is branch-free selects.
    */
  def packExpr(v: Column, dim: Int = 64): Column =
    (0 until dim)
      .map(i => when(element_at(v, i + 1) > lit(0f), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Add the packed-code column — a narrow projection; at scale this
    * is the persisted index artifact (id, code, cluster).
    */
  def pack(df: DataFrame, vecCol: String, codeCol: String = "bq_code"): DataFrame =
    df.withColumn(codeCol, packExpr(col(vecCol)))

  /** Persisted IVF+BQ layout: (id, cluster, bq_code) partitioned by
    * cluster — the index artifact is 8 bytes/vector plus the
    * partition key, and the probe compounds partition pruning with
    * the popcount scan. Full vectors stay in the base table.
    */
  def writeIvfBq(
      path: String,
      df: DataFrame,
      vecCol: String,
      idCol: String,
      centroids: Array[Array[Double]]): Unit =
    pack(Ann.assign(df, vecCol, centroids), vecCol)
      .select(col(idCol), col("cluster"), col("bq_code"))
      .write.partitionBy("cluster").mode("overwrite").parquet(path)

  /** Probe the persisted IVF+BQ layout: nProbe-cell partition-pruned
    * scan of the 8-byte codes, hamming cut to `refine` (ties by id),
    * exact cosine re-rank against the full-precision base joined back
    * by id — the two memory levers compounded: scan nProbe/k of the
    * corpus, at 1/32 of the float32 bytes.
    */
  def probeIvf(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      centroids: Array[Array[Double]],
      base: DataFrame,
      queryDf: DataFrame,
      queryVec: String,
      idCol: String,
      vecCol: String,
      nProbe: Int = 3,
      k: Int = 10,
      refine: Int = 40): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val cells = Ann.nearestCells(centroids, Ann.queryVector(queryDf, queryVec), nProbe)
    val candidates = spark.read.parquet(path)
      .filter(col("cluster").isInCollection(cells))
      .crossJoin(broadcast(pack(queryDf, queryVec, "_qcode")))
      .withColumn("hamming",
        bit_count(col("bq_code").bitwiseXOR(col("_qcode"))).cast("long"))
      .select(col(idCol), col("cluster").cast("long").as("cluster"), col("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(refine)
    base
      .join(broadcast(candidates), idCol)
      .crossJoin(broadcast(queryDf))
      .withColumn("cos_sim", VectorOps.cosineFastRounded(col(vecCol), col(queryVec)))
      .select(col(idCol), col("cluster"), col("hamming"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Exact top-k via hamming-candidate scan + cosine re-rank: scan
    * the packed codes for the `refine` hamming-nearest candidates
    * (ties broken by id — deterministic cut), then exact cosine over
    * that bounded set. Output (id, hamming, cos_sim) ranked by the
    * exact score.
    */
  def probe(
      corpus: DataFrame,
      queryDf: DataFrame,
      vecCol: String,
      queryVec: String,
      idCol: String,
      k: Int = 10,
      refine: Int = 40
  ): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val cand = pack(corpus, vecCol)
      .crossJoin(broadcast(pack(queryDf, queryVec, "_qcode")))
      .withColumn("hamming",
        bit_count(col("bq_code").bitwiseXOR(col("_qcode"))).cast("long"))
      .orderBy(col("hamming"), col(idCol))
      .limit(refine)
    cand
      .withColumn("cos_sim", VectorOps.cosineFastRounded(col(vecCol), col(queryVec)))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("hamming"), col("cos_sim"))
  }
}
