package graft

import graft.operators.{Packing, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("packSequences: distributed two-phase prefix sum equals the single-partition window") {
    val docs = Tables.documents(spark, sf)
    val got = Packing.packSequences(docs, "text", "doc_id", budget = 2048L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))

    // the naive (100 TB-unsafe) formulation — correct at test scale
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = docs
      .select(col("doc_id"), graft.functions.TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("start_offset", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("seq_id", expr("start_offset DIV 2048"))
      .withColumn("spans", pmod(col("start_offset"), lit(2048L)) + col("n_tokens") > 2048L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))

    assert(got.toSeq == expected.toSeq)
    assert(got.map(_._4).distinct.length > 1, "corpus must span multiple sequences")
    assert(got.exists(_._5), "some doc must cross a sequence boundary")
  }

  test("packSequences: offsets are contiguous — each doc starts where the previous ended") {
    val got = Packing.packSequences(Tables.documents(spark, sf), "text", "doc_id", 2048L)
      .collect()
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) == a.getLong(2) + a.getLong(1),
          s"doc ${b.getLong(0)} offset gap")
      case _ => ()
    }
    assert(got.head.getLong(2) == 0L, "first doc starts at offset 0")
  }

  test("packSequences plan contains no partition-less window") {
    val plan = Packing.packSequences(Tables.documents(spark, sf), "text", "doc_id", 2048L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window leaked into the packing plan:\n$plan")
  }

  test("packStats: rollup conserves docs and tokens") {
    val docs = Tables.documents(spark, sf)
    val packed = Packing.packSequences(docs, "text", "doc_id", 2048L)
    val stats = Packing.packStats(packed, "doc_id").collect()
    assert(stats.map(_.getLong(1)).sum == docs.count(), "every doc anchored exactly once")
    val totalTokens = packed.agg(sum("n_tokens")).head.getLong(0)
    assert(stats.map(_.getLong(2)).sum == totalTokens)
    // full sequences anchor ≤ budget+max_doc tokens; seq ids are dense from 0
    val ids = stats.map(_.getLong(0)).toSeq
    assert(ids == (0L until ids.length).toSeq, "sequence ids must be dense")
  }

  test("duplicatedNgrams finds planted repeats with exact counts") {
    val docs = Tables.documents(spark, sf)
    val got = TextAnalysis.duplicatedNgrams(docs, "text", "doc_id", k = 5, minCount = 2, topK = 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "synthetic corpus must repeat some 5-gram")
    assert(got.forall(_._2 >= 2))
    assert(got.forall { case (_, cnt, nDocs) => nDocs <= cnt && nDocs >= 1 })
    // counts are exact: recompute the top ngram's count by brute force
    val (top, cnt, _) = got.head
    val brute = docs
      .select(explode(graft.functions.TextOps.rawShingles(
        graft.functions.TextOps.tokenize(col("text")), 5)).as("ngram"))
      .filter(col("ngram") === top).count()
    assert(brute == cnt)
    // descending count order with ngram tie-break — deterministic
    assert(got.sliding(2).forall(p => p.head._2 > p.last._2 ||
      (p.head._2 == p.last._2 && p.head._1 < p.last._1)))
  }

  test("duplicatedNgrams binds the token array before the shingle generator") {
    // Generate's child runs INTERPRETED: with tokenize inlined, every
    // element_at in the shingle lambda re-tokenizes the document —
    // measured 32x slower at sf0.1. The tokenizer must stay behind a
    // projection so the lambda reads a bound attribute.
    val plan = TextAnalysis.duplicatedNgrams(
      Tables.documents(spark, sf), "text", "doc_id", 5, 2, 50)
      .queryExecution.optimizedPlan.toString
    val gen = plan.linesIterator.filter(_.contains("Generate")).mkString("\n")
    assert(gen.nonEmpty)
    assert(!gen.contains("split("),
      s"tokenizer leaked into the generator expression:\n$gen")
  }
}
