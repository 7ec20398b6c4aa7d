package graft

import graft.operators.TextAnalysis

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetition stats match hand-computed Gopher fractions") {
    val docs = Seq(
      // 3 lines, one duplicated; "the cat"/"cat sat" each twice in 8 tokens
      (1L, "the cat sat\nthe cat sat\nunique line"),
      // degenerate: top 2-gram overlaps past 1.0 (3 occurrences x 2 / 4 tokens)
      (2L, "a a a a"),
      // clean doc: all grams unique, passes every threshold
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")
    ).toDF("doc_id", "text")

    val out = TextAnalysis.repetitionStats(docs, "text", "doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap

    val d1 = byId(1L)
    assert(d1.getLong(1) == 8 && d1.getLong(2) == 3)
    assert(d1.getDouble(3) == 0.33333, "1 dup line of 3")
    assert(d1.getDouble(4) == 0.5, "max 2-gram count 2 -> 4/8 tokens")
    assert(d1.getDouble(5) == 0.0, "all 5-grams distinct")
    assert(!d1.getBoolean(6), "dup_line_frac 0.33 > 0.3 fails keep")

    val d2 = byId(2L)
    assert(d2.getDouble(4) == 1.5, "overlapping 'a a' x3 over 4 tokens, unclamped")
    assert(d2.getDouble(5) == 0.0, "no 5-grams at 4 tokens")
    assert(!d2.getBoolean(6))

    val d3 = byId(3L)
    assert(d3.getDouble(3) == 0.0 && d3.getDouble(5) == 0.0)
    assert(d3.getDouble(4) == 0.16667, "unique 2-grams: 2/12")
    assert(d3.getBoolean(6), "clean doc passes all thresholds")
  }

  test("duplicated 5-gram raises dup_5gram_frac") {
    val docs = Seq(
      // "one two three four five" appears twice among the 5-grams
      (1L, "one two three four five six one two three four five")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "text", "doc_id").collect().head
    // 11 tokens -> 7 five-grams; "one two three four five" occurs twice
    assert(r.getDouble(5) == 0.28571, "2 duplicate occurrences of 7 5-grams")
  }
}
