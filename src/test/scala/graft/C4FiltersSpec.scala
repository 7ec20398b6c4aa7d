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

    // columns: doc_id, n_lines, kept_lines, js_lines, kept_sent_marks,
    //          has_lorem, has_brace, keep
    assert(out(1L).getBoolean(7), "clean doc must keep")
    assert(out(1L).getLong(1) == 2L && out(1L).getLong(2) == 1L,
      "the 4-word line fails the 5-word floor; the 9-word line stays")
    assert(!out(2L).getBoolean(7) && out(2L).getLong(2) == 0L, "unterminated lines all dropped")
    assert(out(3L).getBoolean(5) && !out(3L).getBoolean(7), "lorem ipsum tripwire")
    assert(out(4L).getBoolean(6) && !out(4L).getBoolean(7), "curly brace tripwire")
    assert(out(5L).getLong(3) == 1L && out(5L).getLong(2) == 0L && !out(5L).getBoolean(7),
      "the javascript line is dropped at line level")
    assert(out(6L).getLong(4) < 3 && !out(6L).getBoolean(7), "sentence floor")
    assert(out(7L).getLong(1) == 0L && !out(7L).getBoolean(7), "empty doc")
  }

  test("gopher unicode forms count: … as ellipsis, • as bullet") {
    import spark.implicits._
    val filler = Seq.fill(60)("the plain words flow and that is of be have with text").mkString(" ")
    val docs = Seq(
      (1L, filler + "\n" + Seq.fill(40)("trailing dots…\n").mkString + "more dots…"),
      (2L, filler + "\n" + Seq.fill(40)("• unicode bullet\n").mkString + "• b")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getBoolean(8) && out(1L).getDouble(5) > 0.3,
      s"unicode ellipsis lines must fire the ellipsis rule: ${out(1L)}")
    assert(!out(2L).getBoolean(8) && out(2L).getDouble(4) > 0.9,
      s"unicode bullet lines must fire the bullet rule: ${out(2L)}")
  }

  test("gopher quality rules fire on their canonical violations") {
    import spark.implicits._
    val filler = Seq.fill(60)("the plain words flow and that is of be have with text").mkString(" ")
    val docs = Seq(
      (1L, filler),                                                 // clean: all rules pass
      (2L, "the of and that " * 5),                                 // < 50 words
      (3L, filler + " " + Seq.fill(30)("####### ########").mkString(" ")), // symbol ratio
      (4L, filler + "\n" + Seq.fill(40)("- bullet line\n").mkString + "- b"), // bullets (>0.9 of lines)
      (5L, filler.replaceAll("\\w+", "12345")),                     // no alpha words, no stopwords
      (6L, Seq.fill(60)("a b").mkString(" ") + " the of")           // mean word len < 3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(8), s"clean doc must keep: ${out(1L)}")
    assert(!out(2L).getBoolean(8) && out(2L).getLong(1) < 50)
    assert(!out(3L).getBoolean(8) && out(3L).getDouble(3) > 0.1, "symbol ratio rule")
    assert(!out(4L).getBoolean(8) && out(4L).getDouble(4) > 0.9, "bullet fraction rule")
    assert(!out(5L).getBoolean(8) && out(5L).getDouble(6) == 0.0 && out(5L).getLong(7) == 0L)
    assert(!out(6L).getBoolean(8) && out(6L).getDouble(2) < 3.0, "mean word length rule")
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
