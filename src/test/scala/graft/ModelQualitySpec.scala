package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class ModelQualitySpec extends SparkSpec {

  test("checked-in weights load: 64 coefficients + intercept, not all zero") {
    val (w, b) = TextAnalysis.qualityWeights
    assert(w.length == 64)
    assert(w.exists(_ != 0.0), "degenerate all-zero model")
    assert(b != 0.0)
  }

  test("model score agrees with the heuristic it distills on most documents") {
    val docs = Tables.documents(spark, sf)
    val heur = TextAnalysis.qualityScore(docs, "text", "doc_id")
      .select(col("doc_id"), col("quality"))
    val median = heur.stat.approxQuantile("quality", Array(0.5), 0.0).head
    val model = TextAnalysis.modelQuality(docs, "text", "doc_id")
    val agree = model.join(heur, "doc_id")
      .select(avg((col("keep") === (col("quality") >= median)).cast("double")))
      .head().getDouble(0)
    assert(agree > 0.8, f"distillation agreement $agree%.3f <= 0.8 — weights stale? retrain via graft.tools.TrainQuality")
  }

  test("scores are valid probabilities and deterministic") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.modelQuality(docs, "text", "doc_id").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
    val again = TextAnalysis.modelQuality(docs, "text", "doc_id").collect()
    assert(out.toSeq == again.toSeq)
  }
}
