package graft.operators

import graft.functions.VectorOps
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** PCA dimensionality reduction for embedding columns — the classic
  * variance-preserving compression lever next to SQ8 (C7) and PQ (C6):
  * project 64-dim vectors onto the top-`r` principal components, run
  * the (4×-cheaper at r=16) approximate search in the reduced space,
  * and re-rank the small candidate set at full dimension.
  *
  * The FIT is offline (MLlib `ml.feature.PCA`, memoized per corpus key
  * — the same build-once-probe-many shape as the IVF fit); after the
  * fit the components are driver-side constants. The PROJECTION is
  * implemented manually as `zip_with`/`aggregate` HOFs over component
  * literals (matching MLlib's uncentered `pc^T v` transform) so the
  * arithmetic is engine-replicable: the DuckDB twin inlines the same
  * component lists and `list_dot_product`s them in the same element
  * order.
  */
object Pca {

  /** components(j) = j-th principal axis (length = input dim). */
  final case class Model(components: Array[Array[Double]])

  private val cache = Caches.lru[(String, String, Int), Model](64)

  /** Memoizing MLlib PCA fit (uncentered transform semantics — MLlib's
    * `PCAModel.transform` projects without subtracting the mean, and
    * the manual projection below matches that).
    */
  def fitCached(dataKey: String, df: DataFrame, vecCol: String, r: Int): Model =
    cache.computeIfAbsent((dataKey, vecCol, r), _ => fit(df, vecCol, r))

  def fit(df: DataFrame, vecCol: String, r: Int): Model = {
    val m = new org.apache.spark.ml.feature.PCA()
      .setK(r).setInputCol("_features").setOutputCol("_pca")
      .fit(df.select(array_to_vector(VectorOps.toDouble(col(vecCol))).as("_features")))
    // pc is column-major (dim x r): column j holds component j
    val pc = m.pc
    Model(Array.tabulate(r)(j => Array.tabulate(pc.numRows)(i => pc(i, j))))
  }

  /** Projection of `vecCol` onto the fitted components as a plain
    * array<double> column: element j = sequential-fold dot(v, pc_j) —
    * one narrow codegen-friendly expression, no UDF, no shuffle.
    */
  def projectExpr(vecCol: String, model: Model): Column =
    array(model.components.map { comp =>
      VectorOps.dot(col(vecCol), array(comp.map(lit): _*))
    }: _*)

  /** Reduced-space cosine probe with full-dimension re-rank: approx
    * cosine in r dims prunes the corpus to `refine` candidates
    * (TakeOrderedAndProject), then the exact 64-dim cosine re-ranks to
    * top `k`. Both scores in the output, like [[Sq.probe]].
    */
  def probe(
      corpus: DataFrame,
      queryDf: DataFrame,
      model: Model,
      corpusVec: String,
      queryVec: String,
      idCol: String,
      k: Int = 10,
      refine: Int = 40): DataFrame = {
    val approx = corpus
      .withColumn("_pv", projectExpr(corpusVec, model))
      .crossJoin(broadcast(queryDf.withColumn("_qpv", projectExpr(queryVec, model))))
      .withColumn("approx_sim", VectorOps.cosineRounded(col("_pv"), col("_qpv")))
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
