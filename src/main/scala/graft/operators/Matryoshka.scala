package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Matryoshka-representation probe (MRL, Kusupati et al. 2022,
  * arXiv:2205.13147): rank candidates on the FIRST `dPrefix`
  * dimensions of the embedding, then exact-rerank the bounded
  * candidate set on the full vector.
  *
  * MRL-trained encoders pack coarse semantics into the leading
  * coordinates, so a dim-prefix is itself a usable embedding — the
  * adaptive-retrieval deployment in the paper is exactly this
  * two-stage shape (low-dim shortlist, full-dim re-rank). Next to the
  * repo's other compression levers the trade is: SQ8 ([[Sq]]) keeps
  * all dims at 1/4 the bytes, BQ ([[Bq]]) keeps sign bits at 1/32,
  * MRL keeps `dPrefix`/dim of the dims exactly (here 16/64 = 1/4) —
  * but unlike codes a prefix IS a vector, so the shortlist column
  * needs no decode, composes with every downstream vector op, and the
  * same stored column serves several precision tiers (any d' ≤
  * dPrefix is one `slice` away; no re-encode to change operating
  * point).
  *
  * At 100 TB the prefix is what you persist and scan as the candidate
  * sidecar (optionally cluster-partitioned like [[Sq.writeIvfSq]] /
  * [[Bq.writeIvfBq]] — the layout pattern is identical, `slice` in
  * place of the encode expression); full vectors are touched only for
  * the `refine`-bounded re-rank. Everything is deterministic `slice` +
  * fold arithmetic, so the whole probe has an exact DuckDB twin with
  * no fitted constants.
  *
  * Reference anchor: store.py:313 (vector query leg) — the serving
  * shape this accelerates.
  */
object Matryoshka extends IndexMaintenance {

  /** Persisted IVF+MRL layout: (id, cluster, mrl_prefix) partitioned by
    * cluster — the C20 doc's own scale note made real: the dim-prefix
    * IS the persisted candidate sidecar at 100 TB (dPrefix/dim of the
    * bytes, 16/64 = 1/4 here), and unlike PQ/SQ/BQ codes the stored
    * column is itself a vector, so any d' ≤ dPrefix precision tier is
    * one further `slice` away with no re-encode. Lifecycle (append /
    * tombstone delete / compact) comes from [[IndexMaintenance]] —
    * the write shares [[writeClustered]]'s cluster-hash exchange, a
    * delta is `writeClustered(assign+slice, path, "append")`, exactly
    * the [[Ann.appendToIndex]] shape. Full-precision vectors stay in
    * the base table; the refine re-rank fetches them by id.
    */
  /** `inlineVectors = true` stores the full vector next to the prefix —
    * the bytes-vs-jobs dial (see [[Sq.writeIvfSq]]): layout grows from
    * dPrefix/dim to 1 + dPrefix/dim of the vector bytes; the batch
    * probe drops the base-table refine join (single scan, ≤4 warm
    * jobs — ProbeJobCountSpec).
    */
  def writeIvfMrl(
      path: String,
      df: DataFrame,
      vecCol: String,
      idCol: String,
      centroids: Array[Array[Double]],
      dPrefix: Int = 16,
      inlineVectors: Boolean = false): Unit =
    writeClustered(
      Ann.assign(df, vecCol, centroids)
        .select(Seq(col(idCol), col("cluster"),
          slice(col(vecCol), 1, dPrefix).as("mrl_prefix")) ++
          (if (inlineVectors) Seq(col(vecCol)) else Nil): _*),
      path, "overwrite")

  /** Incremental maintenance — the [[Ann.appendToIndex]] shape for the
    * prefix sidecar: assign ONLY the arriving batch to the existing
    * centroids, slice its prefixes, append into the partitioned layout
    * through the shared cluster-exchanged write. No rebuild; probes see
    * the delta at the next read.
    */
  def appendToIndex(
      path: String,
      delta: DataFrame,
      vecCol: String,
      idCol: String,
      centroids: Array[Array[Double]],
      dPrefix: Int = 16): Unit =
    writeClustered(
      Ann.assign(delta, vecCol, centroids)
        .select(col(idCol), col("cluster"),
          slice(col(vecCol), 1, dPrefix).as("mrl_prefix")),
      path, "append")

  /** Compaction — rewrite the LIVE face (tombstones dropped, delta
    * files folded back to O(nlist), sidecar cleared) into a fresh
    * directory, from the index itself. Entirely the inherited
    * [[IndexMaintenance]] verbs.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      outPath: String,
      idCol: String): Unit = {
    requireSeparateDir("Matryoshka", path, outPath)
    fencedCompact(spark, "Matryoshka", path) {
      writeClustered(liveFace(spark, path, spark.read.parquet(path), idCol),
        outPath, "overwrite")
    }
  }

  /** Probe the persisted IVF+MRL layout: nProbe-cell partition-pruned
    * scan of the PREFIX sidecar, prefix-cosine prune to `refine`
    * candidates, exact full-dim re-rank against the base table joined
    * back by id — IVF pruning compounded with the prefix's 4× byte
    * reduction, the same two-lever shape as [[Sq.probeIvfSq]] /
    * [[Bq.probeIvf]]. The stored prefix elements are bit-identical to
    * `slice(vec, 1, dPrefix)` of the base vector (no quantization), so
    * the whole probe stays exactly DuckDB-twinnable given the fitted
    * IVF centroids.
    */
  def probeIvfMrl(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      centroids: Array[Array[Double]],
      base: DataFrame,
      queryDf: DataFrame,
      queryVec: String,
      idCol: String,
      vecCol: String,
      dPrefix: Int = 16,
      nProbe: Int = 3,
      k: Int = 10,
      refine: Int = 40,
      cellsPre: Option[Seq[Int]] = None): DataFrame = {
    val cells = cellsPre.getOrElse(
      Ann.nearestCells(centroids, Ann.queryVector(queryDf, queryVec), nProbe))
    val pruned = LayoutCache.readCached(spark, path)
      .filter(col("cluster").isInCollection(cells))
    val candidates = liveFace(spark, path, pruned, idCol)
      .crossJoin(broadcast(queryDf))
      .withColumn("approx_sim",
        VectorOps.cosineRounded(col("mrl_prefix"), slice(col(queryVec), 1, dPrefix)))
      .select(col(idCol), col("cluster").cast("long").as("cluster"), col("approx_sim"))
      .orderBy(col("approx_sim").desc, col(idCol))
      .limit(refine)
    base
      .join(broadcast(candidates), idCol)
      .crossJoin(broadcast(queryDf))
      .withColumn("cos_sim", VectorOps.cosineRounded(col(vecCol), col(queryVec)))
      .select(col(idCol), col("cluster"), col("approx_sim"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Batch probe over the persisted IVF+MRL layout — the
    * [[Sq.probeBatchIvfSq]] serving shape with the prefix sidecar in
    * place of the int8 codes: each query's nProbe nearest cells are
    * ranked in-plan ([[Ann.queryCells]]), the cells join the
    * partition-pruned prefix scan, the prefix cosine prunes per query
    * to `refine` candidates with a bounded heap
    * ([[graft.plans.TopK.perKey]] — no full sort), and only k·refine
    * candidates per query touch the full-precision base for the exact
    * re-rank. Closes the batch-probe matrix (plain/PQ/SQ/MRL): the
    * prefix is stored floats, so approx_sim is bit-identical to a
    * `slice`-then-cosine of the base vector and the whole probe keeps
    * an exact DuckDB twin given the fitted centroids.
    */
  def probeBatchIvfMrl(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      centroids: Array[Array[Double]],
      base: DataFrame,
      queries: DataFrame,
      queryVec: String,
      queryId: String,
      idCol: String,
      vecCol: String,
      dPrefix: Int = 16,
      nProbe: Int = 3,
      k: Int = 10,
      refine: Int = 40,
      qCellsPre: Option[DataFrame] = None,
      vecInLayout: Boolean = false): DataFrame = {
    val qCells = qCellsPre.getOrElse(
      Ann.queryCells(queries, queryVec, queryId, centroids, nProbe))
    val carry = if (vecInLayout) Seq(col(vecCol), col(queryVec)) else Nil
    val approx = liveFace(spark, path,
        Ann.pruneToCells(LayoutCache.readCached(spark, path), qCells), idCol)
      .join(broadcast(qCells), "cluster")
      .withColumn("approx_sim",
        VectorOps.cosineRounded(col("mrl_prefix"), slice(col(queryVec), 1, dPrefix)))
      .select(Seq(col(queryId), col(idCol), col("cluster").cast("long").as("cluster")) ++
        carry :+ col("approx_sim"): _*)
    val candidates = graft.plans.TopK
      .perKey(approx, Seq(queryId), Seq(("approx_sim", false), (idCol, true)), refine)
      .drop("rk")
    val refined =
      if (vecInLayout) candidates // vector rode the scan (inlineVectors layout)
      else base
        .join(broadcast(candidates), idCol)
        .join(broadcast(queries.select(col(queryId), col(queryVec))), queryId)
    refined
      .withColumn("cos_sim", VectorOps.cosineRounded(col(vecCol), col(queryVec)))
      .select(col(queryId), col(idCol), col("cluster"), col("approx_sim"), col("cos_sim"))
      .transform(df => graft.plans.TopK
        .perKey(df, Seq(queryId), Seq(("cos_sim", false), (idCol, true)), k))
      .select(col(queryId), col(idCol), col("cluster"), col("approx_sim"),
        col("cos_sim"), col("rk"))
  }

  /** Two-stage probe: prefix-cosine prune to `refine` candidates
    * (TakeOrderedAndProject — no full sort), exact full-dim cosine
    * re-rank to top `k`. Output carries both scores so the prefix
    * approximation error is observable per hit.
    */
  def probe(
      corpus: DataFrame,
      queryDf: DataFrame,
      corpusVec: String,
      queryVec: String,
      idCol: String,
      dPrefix: Int = 16,
      k: Int = 10,
      refine: Int = 40): DataFrame = {
    val approx = corpus
      .crossJoin(broadcast(queryDf))
      .withColumn("approx_sim",
        VectorOps.cosineRounded(
          slice(col(corpusVec), 1, dPrefix), slice(col(queryVec), 1, dPrefix)))
      .select(col(idCol), col(corpusVec), col(queryVec), col("approx_sim"))
      .orderBy(col("approx_sim").desc, col(idCol))
      .limit(refine)
    approx
      .withColumn("cos_sim", VectorOps.cosineRounded(col(corpusVec), col(queryVec)))
      .select(col(idCol), col("approx_sim"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
