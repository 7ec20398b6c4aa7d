package graft

import graft.operators.Lsh
import org.apache.spark.sql.functions._

class LshSpec extends SparkSpec {
  import spark.implicits._

  test("near-identical vectors land in the same bucket; pairs recovered") {
    val base = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.001f
    val far = Array.tabulate(64)(i => math.cos(i * 2.3 + 1).toFloat)
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val pairs = Lsh.nearDupPairs(df, "embedding", "vec_id", dim = 64, nPlanes = 8, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("multi-probe query retrieves planted true near-neighbors through bucket pruning") {
    // Hyperplane LSH guarantees recall for genuinely close vectors
    // (collision prob 1 - theta/pi per plane); uniform random corpora
    // have no close neighbors, so the planted-neighbor test is the
    // honest contract check.
    val embs = Tables.embeddings(spark, sf)
    val qVec = embs.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val near1 = qVec.clone(); near1(1) = near1(1) + 0.01f
    val near2 = qVec.clone(); near2(2) = near2(2) - 0.01f
    val corpus = embs.filter(col("vec_id") =!= 0).select("vec_id", "embedding")
      .unionByName(Seq((9001L, near1), (9002L, near2)).toDF("vec_id", "embedding"))
    val queryDf = embs.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
    val hits = Lsh.query(corpus, queryDf,
      "embedding", "q_vec", "vec_id", dim = 64, nPlanes = 8, k = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(Set(9001L, 9002L).subsetOf(hits), s"planted neighbors missed: $hits")
  }

  test("hyperplane family: 32 pairwise-distinct planes, bits informative and uncorrelated") {
    val planes = (0 until 32).map(i => Lsh.plane(i, 64))
    assert(planes.distinct.size == 32, "planes must be pairwise distinct")
    // weights should use the full [-3, 3] range in every plane
    planes.foreach(p => assert(p.toSet.size >= 5, s"degenerate weight spread: ${p.toSet}"))
    val sigs = Tables.embeddings(spark, sf).limit(200)
      .select(Lsh.bucket(col("embedding"), 64, 32)).as[String].collect()
    val informative = (0 until 32).count(i => sigs.map(_.charAt(i)).toSet.size == 2)
    assert(informative >= 32, s"only $informative of 32 bits informative")
    // no two bit positions may be copies (or complements) of each other
    for (i <- 0 until 32; j <- (i + 1) until 32) {
      val same = sigs.count(s => s(i) == s(j))
      assert(same != 0 && same != sigs.length, s"bits $i and $j are degenerate copies")
    }
  }

  test("native bucket signature matches the HOF form over the corpus") {
    val df = Tables.embeddings(spark, sf)
    val cmp = df.select(
      Lsh.bucket(col("embedding"), 64, 16).as("nat"),
      Lsh.bucketHof(col("embedding"), 64, 16).as("hof")
    )
    assert(cmp.filter(col("nat") =!= col("hof")).count() == 0)
  }

  test("bucket signatures are deterministic and nPlanes chars long") {
    val df = Tables.embeddings(spark, sf).limit(50)
    val b1 = df.select(Lsh.bucket(col("embedding"), 64, 10)).as[String].collect()
    val b2 = df.select(Lsh.bucket(col("embedding"), 64, 10)).as[String].collect()
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(s => s.length == 10 && s.forall(c => c == '0' || c == '1')))
  }
}
