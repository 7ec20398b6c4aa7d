package graft

import graft.operators.{Pca, Search}
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  private def embs = Tables.embeddings(spark, sf)

  test("fitted components are orthonormal (fit sanity)") {
    val m = Pca.fitCached(sf, embs, "embedding", r = 16)
    assert(m.components.length == 16)
    assert(m.components.forall(_.length == 64))
    for (i <- m.components.indices; j <- i until m.components.length) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"pc$i · pc$j = $dot, expected $expect")
    }
  }

  test("manual projection matches MLlib's transform") {
    import org.apache.spark.ml.functions.array_to_vector
    val m = Pca.fitCached(sf, embs, "embedding", r = 16)
    val mllib = new org.apache.spark.ml.feature.PCA()
      .setK(16).setInputCol("_features").setOutputCol("_pca")
      .fit(embs.select(array_to_vector(
        graft.functions.VectorOps.toDouble(col("embedding"))).as("_features")))
    val sample = embs.limit(20)
    val manual = sample
      .select(col("vec_id"), Pca.projectExpr("embedding", m).as("pv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaMllib = mllib
      .transform(sample.select(col("vec_id"), array_to_vector(
        graft.functions.VectorOps.toDouble(col("embedding"))).as("_features")))
      .select(col("vec_id"), col("_pca"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray.toSeq).toMap
    manual.foreach { case (id, pv) =>
      pv.zip(viaMllib(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"vec $id: manual $a vs mllib $b")
      }
    }
  }

  test("reduced-space probe recall@10 is high and re-ranked scores are exact") {
    val corpus = embs.filter(col("vec_id") =!= 0).select("vec_id", "embedding")
    val queryDf = embs.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
    val m = Pca.fitCached(sf, embs, "embedding", r = 16)
    val got = Pca.probe(corpus, queryDf, m, "embedding", "q_vec", "vec_id",
      refine = 100).collect()
    assert(got.length == 10)
    val exact = Search.knnTopK(corpus, queryDf, "embedding", "q_vec", "vec_id", k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("cos_sim"))).toMap
    val hit = got.count(r => exact.contains(r.getLong(0)))
    assert(hit >= 8, s"PCA-16 recall@10 $hit/10 < 8")
    got.filter(r => exact.contains(r.getLong(0))).foreach { r =>
      assert(r.getDouble(2) == exact(r.getLong(0)), "re-ranked score must be the exact cosine")
    }
  }
}
