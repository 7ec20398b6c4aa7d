package graft

import graft.operators.TextAnalysis

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("lines shared by >= minDocs docs are dropped; text rebuilt in order") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nreal content one\nFOOTER"),
      (2L, "COOKIE BANNER\nreal content two\n FOOTER "), // padded: trim-keyed match
      (3L, "COOKIE BANNER\ndifferent text\nFOOTER"),
      (4L, "no boilerplate here\n\nblank line kept"),
      (5L, "COOKIE BANNER\nFOOTER")
    ).toDF("doc_id", "text")

    val out = TextAnalysis.lineDedup(docs, "text", "doc_id", minDocs = 3).collect()
    val byId = out.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    assert(byId(1L) == ((3L, 2L, "real content one")))
    assert(byId(2L) == ((3L, 2L, "real content two")), "padded FOOTER must still match by trimmed hash")
    assert(byId(3L) == ((3L, 2L, "different text")))
    assert(byId(4L) == ((3L, 0L, "no boilerplate here\n\nblank line kept")),
      "blank lines are never boilerplate and survive reconstruction")
    assert(byId(5L) == ((2L, 2L, "")), "all-boilerplate doc reduces to empty text, not a missing row")
  }

  test("below the doc-frequency threshold nothing is dropped") {
    val docs = Seq(
      (1L, "shared line\nunique a"),
      (2L, "shared line\nunique b")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lineDedup(docs, "text", "doc_id", minDocs = 3).collect()
    assert(out.forall(_.getLong(2) == 0L), "2 < minDocs: no line qualifies")
  }
}
