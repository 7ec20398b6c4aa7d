package graft

import graft.operators.{Featurize, Search}
import graft.functions.{OnnxFixture, OnnxMini}
import org.apache.spark.sql.functions._

/** Cross-encoder rerank: the rows-only class's contract is
  * INDEPENDENT RECOMPUTATION — the operator's scores must equal a
  * driver-side model evaluation over the same joint id sequence, the
  * joint encoding must actually mix query and document (swapping the
  * document changes the score), and the two-stage shape must hold
  * (pool from BM25, ranked by the model).
  */
class CrossRerankSpec extends SparkSpec {
  import spark.implicits._

  private def driverScore(query: String, doc: String): Double = {
    val scorer = Featurize.crossEncoderScorer()()
    scorer(query, doc)
  }

  test("operator scores equal a driver-side model recomputation") {
    val docs = Seq(
      (1L, "spark filter join stream table"),
      (2L, "filter join value key row"),
      (3L, "totally unrelated words here now"),
      (4L, "join join join filter filter")
    ).toDF("doc_id", "text")
    val terms = Seq("filter", "join")
    val out = Search.crossEncoderRerank(docs, "text", "doc_id", terms, k = 4, pool = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, got) =>
      val expect = BigDecimal(driverScore(terms.mkString(" "), texts(id)))
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got == expect, s"doc $id: $got != $expect")
    }
    // ranked by the model, ties by id
    val ranked = Search.crossEncoderRerank(docs, "text", "doc_id", terms, k = 4, pool = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(ranked.map(_._2).toSeq == ranked.map(_._2).sortBy(-_).toSeq)
  }

  test("joint encoding mixes query and document: both sides move the score") {
    val q = "filter join"
    val s1 = driverScore(q, "spark filter join stream")
    val s2 = driverScore(q, "stream join filter spark") // same bag, different order
    val s3 = driverScore("stream table", "spark filter join stream")
    assert(s1 != s3, "changing the QUERY must change the joint score")
    assert(s1 != s2, "the encoder is position-sensitive, not a bag of words")
    assert(driverScore(q, q) == driverScore(q, q), "deterministic")
  }

  test("empty document scores the query-only sequence; both-empty short-circuits") {
    val q = "filter join"
    assert(driverScore("", "") == 0.0)
    // query-only: still a valid sequence (ids ++ SEP)
    val qOnly = driverScore(q, "")
    assert(!qOnly.isNaN)
    // the model output equals a direct run over query ids + SEP
    val session = OnnxMini.load("/graft/cross_encoder.onnx")
    val merges = graft.operators.Bpe.merges
    val pretoken = java.util.regex.Pattern.compile(graft.operators.Bpe.PretokenRegex)
    val ids = Array.newBuilder[Double]
    val m = pretoken.matcher(q.toLowerCase)
    while (m.find()) {
      graft.operators.Bpe.encodeWord(m.group(), merges).foreach(s =>
        ids += java.lang.Math.floorMod(s.hashCode, OnnxFixture.VocabSize - 1).toDouble)
    }
    val seq = ids.result() :+ OnnxFixture.SepId.toDouble
    val direct = OnnxMini.run2d(session, OnnxMini.Mat(seq.length, 1, seq)).data(0)
    assert(qOnly == direct)
  }

  test("rerank on the corpus: k rows, pool-bounded, model order differs from bm25") {
    val out = Queries.rerankCross(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 10)
    assert(out.map(_._3).toSeq == out.map(_._3).sortBy(-_).toSeq, "model-ordered")
    // the model ordering is genuinely different from the bm25 ordering
    assert(out.map(_._2).toSeq != out.map(_._2).sortBy(-_).toSeq,
      "with arbitrary weights the reranker should not coincide with bm25 order")
  }
}
