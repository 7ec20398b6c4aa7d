package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._

/** Two-level (hierarchical) coarse-quantizer fit — the 10⁹-vector path
  * (PLANS.md: the flat fit's Lloyd work is 256·N, measured to 35 min
  * single-box at 5M vectors; the hierarchy cuts it to ~512·N^{3/4}).
  * Pins: codebook totals/offsets, the hierarchical ASSIGNMENT against a
  * driver recompute (nearest super by the NearestCentroid arithmetic,
  * then nearest sub within that super, flat id = offset + sub), probes
  * working unchanged over the flat concatenated codebook, and recall vs
  * exact at matched nProbe.
  */
class TwoLevelSpec extends SparkSpec {
  import spark.implicits._

  private val k = 16

  test("codebook structure: k total cells, consistent offsets, every row assigned in range") {
    val embs = Tables.embeddings(spark, sf)
    val (index, two) = Ann.buildTwoLevel(embs, "embedding", "vec_id", k, seed = 42)
    assert(two.flat.length == k, s"flat codebook must have $k cells, got ${two.flat.length}")
    assert(two.subCents.map(_.length).sum == k)
    assert(two.offsets.toSeq == two.subCents.scanLeft(0)(_ + _.length).init.toSeq)
    assert(index.centroids.length == k)
    val clusters = index.assigned.select("cluster").as[Int].collect()
    assert(clusters.length == 500 && clusters.forall(c => c >= 0 && c < k))
    assert(clusters.distinct.length > 1)
  }

  test("hierarchical assignment equals the driver recompute (super then sub, first-min ties)") {
    val embs = Tables.embeddings(spark, sf).limit(200)
    val (index, two) = Ann.buildTwoLevel(
      Tables.embeddings(spark, sf), "embedding", "vec_id", k, seed = 42)
    def sq(u: Array[Double], c: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < u.length) { val t = u(i) - c(i); d += t * t; i += 1 }
      d
    }
    def nearestOf(u: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bd = Double.MaxValue; var c = 0
      while (c < cs.length) { val d = sq(u, cs(c)); if (d < bd) { bd = d; best = c }; c += 1 }
      best
    }
    val got = index.assigned.select(col("vec_id"), col("cluster"))
      .as[(Long, Int)].collect().toMap
    embs.select(col("vec_id"), col("embedding")).collect().foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val nrm = math.sqrt(v.map(x => x * x).sum)
      val u = v.map(_ / nrm)
      val s = nearestOf(u, two.superCents)
      val expect = two.offsets(s) + nearestOf(u, two.subCents(s))
      assert(got(id) == expect, s"vec $id: got ${got(id)}, recompute $expect (super $s)")
    }
  }

  test("probes work unchanged over the flat codebook; recall behaves") {
    val embs = Tables.embeddings(spark, sf)
    val (index, _) = Ann.buildTwoLevel(embs, "embedding", "vec_id", k, seed = 42)
    def qDf(id: Long) =
      embs.filter(col("vec_id") === id).select(col("embedding").as("q_vec"))
    def recallAt(id: Long, nProbe: Int): Double = {
      val exact = Ann.exact(embs, qDf(id), "embedding", "q_vec", "vec_id", topK = 10)
        .select("vec_id").as[Long].collect().toSet
      val probe = Ann.probe(index, qDf(id), "q_vec", nProbe = nProbe, topK = 10)
        .select("vec_id").as[Long].collect().toSet
      (probe & exact).size.toDouble / exact.size
    }
    // Full depth probes every cell = brute force over all rows — MUST
    // be exact regardless of how vectors were assigned (the structural
    // invariant that the flat-codebook probe machinery is intact).
    assert(recallAt(0L, k) == 1.0, "full-depth probe must equal exact")
    // Matched-budget recall on this 500-point NEAR-ISOTROPIC corpus is
    // the hierarchy's worst regime (boundary vectors land in neighbor
    // supers' sub-cells — the documented IMI trade vs the flat fit,
    // which is why flat stays the default below ~10M vectors). A
    // single query's recall at half depth swings ±0.1 with the fitted
    // codebook (now DETERMINISTIC — mapGroups sample sorted before
    // Lloyd — so a one-query bar would pin one arbitrary draw);
    // average over 8 queries instead, which is what the operator
    // contract is about. Real-scale recall lives in the 1M/5M
    // structured studies (PLANS.md).
    // the deterministic fit measures 0.8125 here; the bar sits just
    // under it so any fit/probe change that costs recall fails loudly
    val ids = Seq(0L, 7L, 63L, 127L, 201L, 303L, 404L, 499L)
    val avg = ids.map(recallAt(_, 8)).sum / ids.size
    assert(avg >= 0.8, s"mean recall@nProbe=8 over ${ids.size} queries = $avg")
  }

  test("k = 1 and an empty fit input are rejected up front") {
    val embs = Tables.embeddings(spark, sf)
    intercept[IllegalArgumentException] {
      Ann.buildTwoLevel(embs, "embedding", "vec_id", k = 1, seed = 42)
    }
    intercept[IllegalArgumentException] {
      Ann.buildTwoLevel(embs.filter(col("vec_id") < 0), "embedding", "vec_id",
        k = 4, seed = 42)
    }
  }

  test("two-level append assigns deltas exactly as the base corpus (base+delta == rebuild)") {
    val embs = Tables.embeddings(spark, sf)
    val (index, two) = Ann.buildTwoLevel(embs, "embedding", "vec_id", k, seed = 42)
    val dir = java.nio.file.Files.createTempDirectory("twolevelappend").toString + "/idx"
    Ann.writeIndex(index, dir)
    // re-append 40 vectors that already exist in the base layout under
    // shifted ids: with the hierarchical router each copy MUST land in
    // its original's cluster (the flat appendToIndex can disagree on
    // boundary vectors — the drift the two-level-aware verb closes)
    val delta = embs.filter(col("vec_id") < 40)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    Ann.appendToIndexTwoLevel(dir, delta, "embedding", two)
    val stored = spark.read.parquet(dir)
      .select(col("vec_id"), col("cluster").cast("int"))
      .as[(Long, Int)].collect().toMap
    (0L until 40L).foreach { id =>
      assert(stored(id + 100000L) == stored(id),
        s"appended copy of vec $id landed in ${stored(id + 100000L)}, base is in ${stored(id)}")
    }
  }

  test("sub-cell allocation: proportional-ish, every super >= 1, sums to k") {
    val (_, two) = Ann.buildTwoLevel(
      Tables.embeddings(spark, sf), "embedding", "vec_id", k, seed = 42)
    val alloc = two.subCents.map(_.length)
    assert(alloc.sum == k && alloc.forall(_ >= 1), alloc.toSeq.toString)
  }
}
