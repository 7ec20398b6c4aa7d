package graft

import graft.operators.TextAnalysis

class C4FiltersSpec extends SparkSpec {

  test("each C4 rule fires on its canonical violation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A good sentence. Another one here! And a third?\nAll lines end well."),
      (2L, "no punctuation at the end\nanother bare line\nmore"),
      (3L, "Lorem Ipsum dolor sit amet. Two sentences. Three now."),
      (4L, "Some code follows. val x = { 1 }. Three sentences here."),
      (5L, "Please enable JavaScript to view this page. Second sentence. Third sentence."),
      (6L, "Too short."),
      (7L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4Filters(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getBoolean(7), "clean doc must keep")
    assert(!out(2L).getBoolean(7) && out(2L).getDouble(2) == 0.0, "unterminated lines")
    assert(out(3L).getBoolean(4) && !out(3L).getBoolean(7), "lorem ipsum tripwire")
    assert(out(4L).getBoolean(5) && !out(4L).getBoolean(7), "curly brace tripwire")
    assert(out(5L).getBoolean(6) && !out(5L).getBoolean(7), "javascript token tripwire")
    assert(out(6L).getLong(3) < 3 && !out(6L).getBoolean(7), "sentence floor")
    assert(out(7L).getLong(1) == 0L && !out(7L).getBoolean(7), "empty doc")
  }

  test("flags are pure per-row functions: no shuffle in the plan") {
    val docs = Tables.documents(spark, sf)
    val plan = TextAnalysis.c4Filters(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    // only the output orderBy may exchange; the scoring itself is a projection
    assert(plan.split("Exchange").length - 1 <= 1, s"unexpected shuffles:\n$plan")
    val out = TextAnalysis.c4Filters(docs, "text", "doc_id").collect()
    assert(out.length == docs.count())
  }
}
