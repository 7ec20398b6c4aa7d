package graft

import graft.operators.Dedup

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("token positions under a cross-doc 10-gram are dropped; sequences rebuilt in order") {
    val shared = "a b c d e f g h i j" // the duplicated 10-token span
    val docs = Seq(
      (1L, s"$shared x y z"),
      (2L, s"p q $shared r"),
      (3L, "completely different words here nothing shared at all between docs")
    ).toDF("doc_id", "text")

    val out = Dedup.duplicatedSpanRemoval(docs, "text", "doc_id").collect()
    val byId = out.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    assert(byId(1L) == ((13L, 10L, "x y z")))
    assert(byId(2L) == ((13L, 10L, "p q r")), "span dropped mid-sequence, flanks keep their order")
    assert(byId(3L)._2 == 0L, "a unique 10-gram drops nothing")
    assert(byId(3L)._3 == "completely different words here nothing shared at all between docs")
  }

  test("decontaminateSpans removes exactly the benchmark-covered positions") {
    val leaked = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10" // a benchmark 10-gram
    val benchmark = Seq((100L, s"intro $leaked outro")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"clean words $leaked more clean words after that one two"),
      (2L, "entirely clean document sharing nothing with the benchmark at all")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminateSpans(corpus, benchmark, "text", "doc_id").collect()
    val byId = out.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(byId(1L) == ((19L, 10L, "clean words more clean words after that one two")))
    assert(byId(2L)._2 == 0L, "no benchmark overlap drops nothing")
    // the corpus's own internal duplication is NOT touched — only
    // benchmark grams count (contrast with duplicatedSpanRemoval)
    val selfDup = Seq(
      (1L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 and x1 x2 x3 x4 x5 x6 x7 x8 x9 x10")
    ).toDF("doc_id", "text")
    val out2 = Dedup.decontaminateSpans(selfDup,
      Seq((9L, "too short to shingle")).toDF("doc_id", "text"), "text", "doc_id").collect()
    assert(out2.head.getLong(2) == 0L,
      "self-duplication without benchmark overlap must survive decontamination")
  }

  test("overlapping duplicated grams cover the union of their positions, not double-drop") {
    // an 11-token shared run yields two overlapping duplicated 10-grams;
    // covered positions must be the 11-token union
    val run = "a b c d e f g h i j k"
    val docs = Seq(
      (1L, s"$run tail1 tail2"),
      (2L, s"head $run")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanRemoval(docs, "text", "doc_id").collect()
    val byId = out.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(byId(1L) == ((13L, 11L, "tail1 tail2")))
    assert(byId(2L) == ((12L, 11L, "head")))
  }
}
