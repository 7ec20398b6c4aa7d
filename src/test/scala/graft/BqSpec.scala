package graft

import graft.operators.Bq
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Binary quantization: sign-bit packing must be exact, the hamming
  * candidate scan must equal a brute-force sign-disagreement count,
  * and the bounded re-rank must recover (most of) the exact top-k.
  */
class BqSpec extends SparkSpec {
  import spark.implicits._

  test("packExpr sets exactly the strictly-positive sign bits") {
    val v = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else if (i % 3 == 1) -1.0f else 0.0f)
    val expected = (0 until 64).filter(_ % 3 == 0).map(1L << _).sum
    val got = Seq(Tuple1(v)).toDF("v").select(Bq.packExpr(col("v")).as("c"))
      .head().getLong(0)
    assert(got == expected, s"$got != $expected")
    // high bit (dim 63 positive) packs into the sign bit of the long
    val hi = Array.tabulate(64)(i => if (i == 63) 2.0f else -1.0f)
    val gotHi = Seq(Tuple1(hi)).toDF("v").select(Bq.packExpr(col("v")).as("c"))
      .head().getLong(0)
    assert(gotHi == Long.MinValue, s"$gotHi")
  }

  test("hamming ranking equals brute-force sign disagreement; re-rank is exact cosine") {
    val rnd = new scala.util.Random(4242)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val corpus = df.filter(col("vec_id") =!= 0)
    val qv = rows.head._2
    val q = Seq(Tuple1(qv)).toDF("q_vec")
    val got = Bq.probe(corpus, q, "embedding", "q_vec", "vec_id", k = 10, refine = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    def ham(a: Array[Float], b: Array[Float]): Long =
      (0 until 64).count(i => (a(i) > 0) != (b(i) > 0)).toLong
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = (0 until 64).map(i => a(i).toDouble * b(i).toDouble).sum
      val na = math.sqrt((0 until 64).map(i => a(i).toDouble * a(i).toDouble).sum)
      val nb = math.sqrt((0 until 64).map(i => b(i).toDouble * b(i).toDouble).sum)
      dot / (na * nb)
    }
    val cand = rows.tail.map { case (id, v) => (id, ham(v, qv), v) }
      .sortBy { case (id, h, _) => (h, id) }.take(40)
    val expect = cand
      .map { case (id, h, v) =>
        (id, h, BigDecimal(cos(v, qv)).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, _, c) => (-c, id) }.take(10)
    assert(got.map(g => (g._1, g._2)) == expect.map(e => (e._1, e._2)),
      s"candidate/rank mismatch:\n$got\n$expect")
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-9, s"cosine mismatch at ${g._1}")
    }
  }

  test("refine recovers most of the exact top-10 on the real embeddings") {
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = df.filter(col("vec_id") =!= 0).select("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
    val approx = Bq.probe(corpus, q, "embedding", "q_vec", "vec_id", k = 10, refine = 40)
      .select("vec_id").as[Long].collect().toSet
    val exact = corpus.crossJoin(broadcast(q))
      .withColumn("c", VectorOps.cosineFastRounded(col("embedding"), col("q_vec")))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet
    val recall = (approx & exact).size / 10.0
    assert(recall >= 0.5, s"recall@10 with refine=40 too low: $recall")
  }

  test("multi-word packing: 128-dim probe equals brute force across the word boundary") {
    val rnd = new scala.util.Random(515)
    val dim = 128
    val rows = (0 until 150).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding").filter(col("vec_id") =!= 0)
    val qv = rows.head._2
    val q = Seq(Tuple1(qv)).toDF("q_vec")
    val got = Bq.probe(corpus, q, "embedding", "q_vec", "vec_id",
      k = 10, refine = 40, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def ham(a: Array[Float], b: Array[Float]): Long =
      (0 until dim).count(i => (a(i) > 0) != (b(i) > 0)).toLong
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = (0 until dim).map(i => a(i).toDouble * b(i).toDouble).sum
      dot / (math.sqrt((0 until dim).map(i => a(i).toDouble * a(i).toDouble).sum) *
        math.sqrt((0 until dim).map(i => b(i).toDouble * b(i).toDouble).sum))
    }
    val expect = rows.tail.map { case (id, v) => (id, ham(v, qv), cos(v, qv)) }
      .sortBy { case (id, h, _) => (h, id) }.take(40)
      .sortBy { case (id, _, c) => (-c, id) }.take(10)
      .map(e => (e._1, e._2))
    assert(got == expect, s"\n$got\n$expect")
    // word boundary: dim 63 vs 64 land in different words
    val a = Array.tabulate(dim)(i => if (i == 63 || i == 64) 1.0f else -1.0f)
    val b = Array.tabulate(dim)(i => if (i == 63) 1.0f else -1.0f)
    val packed = Seq((1L, a), (2L, b)).toDF("id", "v")
    val words = Bq.pack(packed, "v", dim = dim)
      .select("id", "bq_w0", "bq_w1").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(words(1L)._1 == Long.MinValue && words(1L)._2 == 1L)
    assert(words(2L)._1 == Long.MinValue && words(2L)._2 == 0L)
  }

  test("probe plan: candidate scan is codegen'd integer work, no raw-vector read before refine") {
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
    val corpus = df.filter(col("vec_id") =!= 0).select("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
    val plan = Bq.probe(corpus, q, "embedding", "q_vec", "vec_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bit_count"), "hamming must be bit_count over packed longs")
    assert(!plan.contains("CartesianProduct"), "broadcast, not cartesian")
  }

  test("rotation matrix is orthogonal and deterministic; MatVec matches a driver recompute") {
    import spark.implicits._
    val r = Bq.rotationMatrix(64, seed = 7L)
    assert(r.sameElements(Bq.rotationMatrix(64, seed = 7L).map(_.toSeq).map(_.toArray)) ||
      r.zip(Bq.rotationMatrix(64, seed = 7L)).forall { case (a, b) => a.sameElements(b) })
    // R·Rᵀ ≈ I
    for (i <- 0 until 64; j <- 0 until 64) {
      val dot = (0 until 64).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"R R^T [$i][$j] = $dot")
    }
    val rnd = new scala.util.Random(11)
    val v = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val got = Seq(Tuple1(v.toSeq)).toDF("v")
      .select(Bq.rotateCol(col("v"), r).as("rv"))
      .head().getSeq[Double](0)
    val want = r.map { row =>
      var acc = 0.0; var j = 0
      while (j < 64) { acc += row(j) * v(j).toDouble; j += 1 }
      acc
    }.toSeq
    assert(got == want)
  }

  test("rotated probe: rotation preserves angles (re-rank identical), restores sign diversity on a cone") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // anisotropic cone: all vectors = base direction + small noise ->
    // plain sign bits nearly constant corpus-wide
    // noise 0.5 on a ~1.3/dim base: ~15-20 degrees of angular spread —
    // wide enough that 64 sign bits can rank it once rotated, while
    // plain sign bits stay nearly constant (every dim's mean >> noise)
    val base = Array.fill(64)(math.abs(rnd.nextGaussian()) + 0.5)
    val rows = (0 until 400).map { i =>
      (i.toLong, base.map(b => (b + 0.5 * rnd.nextGaussian()).toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding").filter(col("vec_id") =!= 0)
    val qv = rows.head._2
    val q = Seq(Tuple1(qv.toSeq)).toDF("q_vec")
    val rot = Bq.rotationMatrix(64, seed = 7L)
    // plain sign bits: almost every corpus vector packs identically
    val plainWords = Bq.pack(corpus, "embedding").select("bq_w0").as[Long].collect()
    val rotWords = Bq.pack(corpus.withColumn("_rv", Bq.rotateCol(col("embedding"), rot)), "_rv")
      .select("bq_w0").as[Long].collect()
    assert(rotWords.distinct.length > plainWords.distinct.length,
      s"rotation must diversify sign patterns: plain ${plainWords.distinct.length} vs rotated ${rotWords.distinct.length}")
    // recall vs exact: rotated >= plain on this cone
    val exact = graft.operators.Ann.exact(corpus, q, "embedding", "q_vec", "vec_id", 10)
      .select("vec_id").as[Long].collect().toSet
    val plain = Bq.probe(corpus, q, "embedding", "q_vec", "vec_id", k = 10, refine = 80)
      .select("vec_id").as[Long].collect().toSet
    val rotated = Bq.probeRotated(corpus, q, "embedding", "q_vec", "vec_id", rot,
        k = 10, refine = 80)
      .select("vec_id").as[Long].collect().toSet
    val rPlain = (plain & exact).size / 10.0
    val rRot = (rotated & exact).size / 10.0
    info(f"cone: plain recall $rPlain%.1f -> rotated $rRot%.1f; distinct sign words " +
      s"${plainWords.distinct.length} -> ${rotWords.distinct.length} of ${plainWords.length}")
    assert(rRot >= rPlain, s"rotated recall $rRot < plain $rPlain")
    assert(rRot >= 0.5, s"rotated recall $rRot on the cone (plain $rPlain)")
  }

  test("axis-aligned low-rank corpus: rotation spreads 4 informative dims across all 64 bits") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    // signal lives in dims 0..3; dims 4..63 are near-zero jitter whose
    // signs are coin flips — plain BQ spends 60 of its 64 bits on that
    // noise and the hamming ranking drowns; a rotation mixes the 4-dim
    // signal into every bit (the OPQ variance-balancing argument)
    val rows = (0 until 400).map { i =>
      val v = new Array[Float](64)
      (0 until 4).foreach(j => v(j) = rnd.nextGaussian().toFloat)
      (4 until 64).foreach(j => v(j) = (0.01 * rnd.nextGaussian()).toFloat)
      (i.toLong, v)
    }
    val corpus = rows.toDF("vec_id", "embedding").filter(col("vec_id") =!= 0)
    val q = Seq(Tuple1(rows.head._2.toSeq)).toDF("q_vec")
    val rot = Bq.rotationMatrix(64, seed = 7L)
    val exact = graft.operators.Ann.exact(corpus, q, "embedding", "q_vec", "vec_id", 10)
      .select("vec_id").as[Long].collect().toSet
    def recallOf(ids: Set[Long]) = (ids & exact).size / 10.0
    val rPlain = recallOf(Bq.probe(corpus, q, "embedding", "q_vec", "vec_id",
      k = 10, refine = 40).select("vec_id").as[Long].collect().toSet)
    val rRot = recallOf(Bq.probeRotated(corpus, q, "embedding", "q_vec", "vec_id", rot,
      k = 10, refine = 40).select("vec_id").as[Long].collect().toSet)
    info(f"axis-aligned: plain recall $rPlain%.1f -> rotated $rRot%.1f")
    assert(rRot > rPlain, s"rotation must win on axis-aligned low-rank data: $rPlain vs $rRot")
    assert(rRot >= 0.6, s"rotated recall $rRot")
  }
}
