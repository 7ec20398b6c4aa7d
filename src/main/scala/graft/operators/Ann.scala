package graft.operators

import graft.functions.VectorOps
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** IVF-style ANN index: KMeans coarse quantizer + cluster-pruned probe
  * (reference: the IVF-PQ hint at store.py:274; here as a batch index
  * build, the Spark-appropriate piece of a vector store).
  *
  * Build: distributed MLlib KMeans (fixed seed) → every vector gets a
  * cluster id; at scale the assigned table is written partitioned by
  * cluster id so a probe prunes partitions at the scan.
  *
  * Probe: centroids are O(k·dim) — inspected on the driver (they already
  * live there post-fit) to pick the nProbe nearest cells, then a single
  * pruned scan + cosine top-k over ~nProbe/k of the corpus.
  */
object Ann {

  final case class Index(model: KMeansModel, assigned: DataFrame, vecCol: String, idCol: String)

  // An IVF index is an offline artifact: built once, probed many times
  // (at scale: persisted partitioned-by-cluster). Memoize per build key
  // so repeated probes in one session don't refit.
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String, Int, Long), Index]()

  /** Memoizing build keyed on (data key, columns, k, seed). `dataKey`
    * identifies the source (e.g. the parquet dir).
    */
  def buildCached(dataKey: String, df: DataFrame, vecCol: String, idCol: String, k: Int, seed: Long): Index =
    indexCache.computeIfAbsent(
      (dataKey, vecCol, idCol, k, seed),
      _ => {
        val idx = build(df, vecCol, idCol, k, seed)
        idx.assigned.cache().count() // materialize assignments once
        idx
      }
    )

  def build(df: DataFrame, vecCol: String, idCol: String, k: Int, seed: Long): Index = {
    // Cluster on L2-normalized vectors: euclidean cells on the unit
    // sphere are cosine cells, so a cosine probe's neighbors
    // concentrate in few cells.
    val featurized = df
      .withColumn("_features", array_to_vector(VectorOps.normalize(col(vecCol))))
      .cache() // KMeans re-reads its input every iteration
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(10)
      // keep the default kmeans|| init: random init was measured to drop
      // probe recall 0.9 → 0.4 on this corpus — the extra init passes
      // are what place centroids well at coarse-quantizer granularity
      .setFeaturesCol("_features").setPredictionCol("cluster")
      .fit(featurized)
    Index(model, model.transform(featurized).drop("_features"), vecCol, idCol)
  }

  /** Cluster-pruned cosine top-k for a one-row query DataFrame. */
  def probe(index: Index, queryDf: DataFrame, queryVec: String, nProbe: Int, topK: Int): DataFrame = {
    val qRaw = queryDf.select(queryVec).head().getSeq[Float](0).map(_.toDouble).toArray
    val qNorm = math.sqrt(qRaw.map(x => x * x).sum)
    val q = qRaw.map(_ / qNorm)
    val nearestCells = index.model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, math.sqrt(c.toArray.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)) }
      .sortBy(_._2).take(nProbe).map(_._1)
    Search
      .knnTopK(
        index.assigned.filter(col("cluster").isInCollection(nearestCells.toSeq)),
        queryDf, index.vecCol, queryVec, index.idCol, topK
      )
      .select(col(index.idCol), col("cluster"), col("cos_sim"))
  }

  /** Persist the index partitioned by cluster id — the at-scale layout:
    * a probe's nProbe-cluster filter prunes whole partitions at the
    * file listing, so a probe scans ~nProbe/k of the corpus bytes.
    */
  def writeIndex(index: Index, path: String): Unit =
    index.assigned.write.partitionBy("cluster").mode("overwrite").parquet(path)

  /** Probe a persisted index directory: cluster pruning happens at the
    * parquet partition level (visible as PartitionFilters in explain).
    */
  def probePersisted(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      centroids: Array[org.apache.spark.ml.linalg.Vector],
      queryDf: DataFrame,
      queryVec: String,
      vecCol: String,
      idCol: String,
      nProbe: Int,
      topK: Int
  ): DataFrame = {
    val qRaw = queryDf.select(queryVec).head().getSeq[Float](0).map(_.toDouble).toArray
    val qNorm = math.sqrt(qRaw.map(x => x * x).sum)
    val q = qRaw.map(_ / qNorm)
    val nearestCells = centroids.zipWithIndex
      .map { case (c, i) => (i, math.sqrt(c.toArray.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)) }
      .sortBy(_._2).take(nProbe).map(_._1)
    val pruned = spark.read.parquet(path).filter(col("cluster").isInCollection(nearestCells.toSeq))
    Search
      .knnTopK(pruned, queryDf, vecCol, queryVec, idCol, topK)
      .select(col(idCol), col("cluster"), col("cos_sim"))
  }

  /** Exact top-k baseline for recall measurement. */
  def exact(df: DataFrame, queryDf: DataFrame, vecCol: String, queryVec: String, idCol: String, topK: Int): DataFrame =
    Search.knnTopK(df, queryDf, vecCol, queryVec, idCol, topK).select(idCol, "cos_sim")
}
