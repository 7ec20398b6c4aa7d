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
object Matryoshka {

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
