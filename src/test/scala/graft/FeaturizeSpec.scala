package graft

import graft.operators.Featurize
import org.apache.spark.sql.functions._

class FeaturizeSpec extends SparkSpec {
  import spark.implicits._

  test("inline and aggregated hashed-BoW produce the same embedding") {
    val df = Seq(
      (1L, "spark filter join filter spark spark"),
      (2L, "completely different words here"),
      (3L, "")
    ).toDF("doc_id", "text")
    val inline = df
      .select(col("doc_id"), Featurize.hashedBowInline(col("text"), 64).as("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val grouped = Featurize.hashedBow(df, "text", 64, keep = Seq("doc_id"))
      .select("doc_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(inline.keySet == grouped.keySet)
    for (k <- inline.keySet) {
      val (a, b) = (inline(k), grouped(k))
      assert(a.length == 64 && b.length == 64)
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12, s"doc $k differs") }
    }
    // empty doc -> zero vector, not null/NaN
    assert(inline(3L).forall(_ == 0.0))
  }

  test("embedding is L2-normalized for non-empty docs") {
    val df = Seq(Tuple1("some words to embed right here")).toDF("text")
    val v = df.select(Featurize.hashedBowInline(col("text"), 64)).head.getSeq[Double](0)
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
  }
}
