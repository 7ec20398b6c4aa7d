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
}
