package graft

import graft.operators.Matryoshka
import org.apache.spark.sql.functions._

/** Matryoshka prefix probe: the approximate stage must rank by cosine
  * over exactly the first dPrefix dims, the re-rank must be the exact
  * full-dim cosine over only the bounded candidate set.
  */
class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
    val dot = (0 until d).map(i => a(i).toDouble * b(i).toDouble).sum
    val na = math.sqrt((0 until d).map(i => a(i).toDouble * a(i).toDouble).sum)
    val nb = math.sqrt((0 until d).map(i => b(i).toDouble * b(i).toDouble).sum)
    dot / (na * nb)
  }
  private def r5(x: Double): Double =
    BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("prefix ranking + bounded exact re-rank equal brute force") {
    val rnd = new scala.util.Random(777)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding").filter(col("vec_id") =!= 0)
    val qv = rows.head._2
    val q = Seq(Tuple1(qv)).toDF("q_vec")

    val got = Matryoshka.probe(corpus, q, "embedding", "q_vec", "vec_id",
        dPrefix = 16, k = 10, refine = 40)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq

    val cand = rows.tail.map { case (id, v) => (id, r5(cos(v, qv, 16)), v) }
      .sortBy { case (id, a, _) => (-a, id) }.take(40)
    val expect = cand.map { case (id, a, v) => (id, a, r5(cos(v, qv, dim))) }
      .sortBy { case (id, _, c) => (-c, id) }.take(10)

    assert(got.map(_._1) == expect.map(_._1), s"ids:\n$got\n$expect")
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._2 - e._2) < 1e-9 && math.abs(g._3 - e._3) < 1e-9,
        s"score mismatch at ${g._1}: $g vs $e")
    }
  }

  test("probe at full dPrefix degenerates to exact knn") {
    val rnd = new scala.util.Random(778)
    val rows = (0 until 120).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding").filter(col("vec_id") =!= 0)
    val qv = rows.head._2
    val q = Seq(Tuple1(qv)).toDF("q_vec")
    val got = Matryoshka.probe(corpus, q, "embedding", "q_vec", "vec_id",
        dPrefix = dim, k = 5, refine = 40)
      .collect().map(_.getLong(0)).toSeq
    val expect = rows.tail.map { case (id, v) => (id, r5(cos(v, qv, dim))) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    assert(got == expect)
  }

  test("candidate stage plans as TakeOrderedAndProject (no full sort)") {
    val rows = (0 until 50).map(i => (i.toLong, Array.fill(dim)(i.toFloat + 1)))
    val corpus = rows.toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array.fill(dim)(1.0f))).toDF("q_vec")
    val plan = Matryoshka.probe(corpus, q, "embedding", "q_vec", "vec_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
