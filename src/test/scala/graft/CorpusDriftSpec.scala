package graft

import graft.operators.TextAnalysis

/** Drift monitor: JS divergence must hit its closed-form endpoints
  * (0 for identical distributions, ln 2 for disjoint supports), OOV
  * must be exact token mass, and shape stats exact.
  */
class CorpusDriftSpec extends SparkSpec {
  import spark.implicits._

  private def drift(a: Seq[String], b: Seq[String]) =
    TextAnalysis.corpusDrift(
      a.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
      b.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
      "text").head()

  test("identical corpora: zero divergence, zero OOV") {
    val c = Seq("spark filter join stream", "the quick brown fox")
    val r = drift(c, c)
    assert(r.getAs[Double]("js_divergence") == 0.0)
    assert(r.getAs[Double]("oov_rate_b") == 0.0)
    assert(r.getAs[Long]("n_docs_a") == 2L && r.getAs[Long]("n_docs_b") == 2L)
    assert(r.getAs[Double]("mean_len_a") == 4.0)
  }

  test("disjoint vocabularies: divergence = ln 2, OOV = 1") {
    val r = drift(Seq("alpha beta gamma delta"), Seq("uno dos tres cuatro"))
    assert(math.abs(r.getAs[Double]("js_divergence") - math.log(2.0)) < 5e-4,
      r.toString) // rounded to 4 dp
    assert(r.getAs[Double]("oov_rate_b") == 1.0)
  }

  test("partial drift: OOV is the exact novel token mass") {
    // B: 8 tokens, 2 of them ("new", "word") unseen in A -> oov 0.25
    val r = drift(
      Seq("one two three four five six"),
      Seq("one two three four five six new word"))
    assert(r.getAs[Double]("oov_rate_b") == 0.25, r.toString)
    assert(r.getAs[Double]("js_divergence") > 0.0)
    assert(r.getAs[Double]("mean_len_b") == 8.0)
  }

  test("zipfFit: planted power law recovers its exponent; uniform corpus fits slope 0") {
    // freq(rank r) = round(10000 / r) for 60 terms — slope should fit ≈ -1
    val zipfDocs = (1 to 60).flatMap { r =>
      val f = math.max(1, math.round(10000.0 / r).toInt)
      Seq.fill(f)(s"w$r")
    }
    val zipf = Seq((1L, zipfDocs.mkString(" "))).toDF("id", "text")
    val zr = TextAnalysis.zipfFit(zipf, "text", topN = 60).head()
    assert(zr.getAs[Long]("n_terms") == 60L)
    assert(math.abs(zr.getAs[Double]("slope") + 1.0) < 0.02, zr.toString)
    assert(zr.getAs[Double]("r2") > 0.999, zr.toString)
    // uniform frequencies: flat line, slope ~ 0
    val flat = Seq((1L, (1 to 50).flatMap(i => Seq.fill(20)(s"u$i")).mkString(" ")))
      .toDF("id", "text")
    val fr = TextAnalysis.zipfFit(flat, "text", topN = 50).head()
    assert(math.abs(fr.getAs[Double]("slope")) < 1e-9, fr.toString)
  }

  test("drift is symmetric in the JS term (swap only flips the OOV side)") {
    val a = Seq("aa bb cc dd", "aa bb")
    val b = Seq("aa bb ee", "ee ff")
    val ab = drift(a, b)
    val ba = drift(b, a)
    assert(ab.getAs[Double]("js_divergence") == ba.getAs[Double]("js_divergence"))
  }
}
