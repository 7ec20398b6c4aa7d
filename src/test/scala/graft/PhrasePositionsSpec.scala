package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._

class PhrasePositionsSpec extends SparkSpec {
  import spark.implicits._

  test("native phrase_positions matches the HOF form over the whole corpus") {
    val toksDf = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokenize(col("text")).as("toks"))
    val both = toksDf.select(
      col("doc_id"),
      TextOps.phrasePositions(col("toks"), Seq("filter", "join")).as("nat"),
      TextOps.phrasePositionsHof(col("toks"), Seq("filter", "join")).as("hof")
    )
    assert(both.filter(not(col("nat") <=> col("hof"))).count() == 0)
    // sanity: the corpus actually contains the phrase somewhere
    assert(both.filter(size(col("nat")) > 0).count() > 0)
  }

  test("overlapping matches, empty tokens and too-short arrays") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "b", "a")),
      (2L, Seq.empty[String]),
      (3L, Seq("a"))
    ).toDF("id", "toks")
    val out = df
      .select(col("id"), TextOps.phrasePositions(col("toks"), Seq("a", "b", "a")).as("pos"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L) == Seq(1, 3), "overlapping occurrences must both be found")
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("expression is codegen (no CodegenFallback) and callable from SQL") {
    graft.plans.GraftFunctions.register(spark)
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.plans.PhrasePositions]))
    val row = spark.sql("SELECT phrase_positions(array('x','y','x','y'), array('x','y')) AS p")
      .as[Seq[Int]].head()
    assert(row == Seq(1, 3))
  }
}
