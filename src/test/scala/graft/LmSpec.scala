package graft

import graft.operators.Lm
import org.apache.spark.sql.functions._

class LmSpec extends SparkSpec {

  test("checked-in LM artifact loads and is well-formed") {
    val m = Lm.model
    assert(m.uni.nonEmpty && m.bi.nonEmpty)
    assert(m.uni.forall(_._2 < 0.0), "unigram log-probs must be negative")
    assert(m.oovLp < m.uni.map(_._2).min, "OOV must be rarer than any seen token")
    assert(m.backoffLp < 0.0)
    assert(m.tHead < m.tTail, "bucket thresholds must be ordered")
    // unigram probabilities (seen + the implicit OOV mass) stay under 1
    val mass = m.uni.map(p => math.exp(p._2)).sum + math.exp(m.oovLp)
    assert(mass > 0.9 && mass <= 1.0 + 1e-9, s"unigram mass $mass out of range")
  }

  test("perplexity matches a driver-side reference computation on real docs") {
    val m = Lm.model
    val uni = m.uni.toMap
    val bi = m.bi.toMap
    val docs = Tables.documents(spark, sf).limit(50)
    val expected = docs
      .select(col("doc_id"), graft.functions.TextOps.tokenize(col("text")).as("t"))
      .collect()
      .map { r =>
        val ts = r.getSeq[String](1)
        val lps = uni.getOrElse(ts.head, m.oovLp) +:
          ts.sliding(2).filter(_.size == 2).map { p =>
            bi.getOrElse(s"${p(0)} ${p(1)}", m.backoffLp + uni.getOrElse(p(1), m.oovLp))
          }.toSeq
        r.getLong(0) -> BigDecimal(math.exp(-lps.sum / lps.size))
          .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    val got = Lm.perplexity(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, ppl) =>
      assert(math.abs(ppl - expected(id)) <= 1e-5, s"doc $id: $ppl vs ${expected(id)}")
    }
  }

  test("buckets split the corpus and OOV-heavy text lands in the tail") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val out = Lm.perplexity(docs, "text", "doc_id")
    val buckets = out.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(buckets.getOrElse("head", 0L) > 0, s"no head bucket: $buckets")
    assert(buckets.getOrElse("tail", 0L) > 0, s"no tail bucket: $buckets")
    // gibberish the training corpus never saw must be worse than any
    // real doc, and the empty doc gets the sentinel bucket
    val weird = Seq(
      (1L, "zzqx vvkw jjrr zzqx vvkw"),
      (2L, "")).toDF("doc_id", "text")
    val w = Lm.perplexity(weird, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)), r.getString(3))).toMap
    assert(w(1L)._2 == "tail")
    assert(w(2L) == (None, "empty"))
    val maxReal = out.agg(max("ppl")).head().getDouble(0)
    assert(w(1L)._1.get.asInstanceOf[Double] > maxReal)
  }

  test("trainBigrams: exact counts on a hand corpus; conditionals sum to 1 per context") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "a cat"),
      (4L, "solo")           // < 2 tokens: contributes nothing
    ).toDF("doc_id", "text")
    val got = Lm.trainBigrams(corpus, "text")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(("the", "cat")) == ((2L, 2L, 1.0)))
    // "cat" is a CONTEXT twice (doc 3's cat is sentence-final)
    assert(got(("cat", "sat")) == ((1L, 2L, 0.5)))
    assert(got(("cat", "ran")) == ((1L, 2L, 0.5)))
    assert(got(("a", "cat")) == ((1L, 1L, 1.0)))
    assert(!got.keySet.exists(_._1 == "solo"), "1-token docs must not contribute")
    // MLE property: per-context conditionals sum to 1 (before rounding)
    val byCtx = got.toSeq.groupBy(_._1._1)
    byCtx.foreach { case (w1, rows) =>
      val mass = rows.map { case (_, (np, nw1, _)) => np.toDouble / nw1 }.sum
      assert(math.abs(mass - 1.0) < 1e-12, s"context '$w1' mass $mass")
    }
    // the registered query is the fitted table's top slice
    val q = Queries.lmTrain(spark, sf).collect()
    assert(q.length == 100)
    val counts = q.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y }, "ordered by count")
  }
}
