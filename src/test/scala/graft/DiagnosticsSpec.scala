package graft

import org.apache.spark.sql.functions._

/** Corpus/embedding diagnostics: quantile_digest's self-check,
  * context_truncation arithmetic, embedding_stats' linear-pass
  * pairwise-cosine identity vs brute force.
  */
class DiagnosticsSpec extends SparkSpec {

  test("quantileDigest: sketch passes its own rank bound; exact values match a driver recompute") {
    val out = Queries.quantileDigest(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(3)), "approx_percentile outside its rank bound")
    // independently recompute the p50 for one source with interpolation
    val src = out.head.getString(0)
    val vals = Tables.documents(spark, sf).filter(col("source") === src)
      .select(col("n_chars").cast("double")).collect().map(_.getDouble(0)).sorted
    val pos = 0.5 * (vals.length - 1)
    val (lo, hi) = (vals(pos.toInt), vals(math.ceil(pos).toInt))
    val exact = lo + (pos - pos.toInt) * (hi - lo)
    val got = out.filter(r => r.getString(0) == src && r.getDouble(1) == 0.5).head.getDouble(2)
    assert(math.abs(got - exact) < 1e-4, s"p50 $got vs $exact")
  }

  test("contextTruncation: loss figures match a driver recompute; monotone in ctx") {
    val toks = Tables.documents(spark, sf)
      .select(graft.functions.TextOps.tokenCount(col("text")).cast("long"))
      .collect().map(_.getLong(0))
    val out = Queries.contextTruncation(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(512L, 2048L, 8192L))
    out.foreach { r =>
      val l = r.getLong(0)
      assert(r.getLong(1) == toks.length)
      assert(r.getLong(2) == toks.sum)
      assert(r.getLong(3) == toks.count(_ > l).toLong, s"docs_over at $l")
      assert(r.getLong(4) == toks.map(t => math.max(0L, t - l)).sum, s"lost at $l")
    }
    val lost = out.map(_.getLong(4))
    assert(lost(0) >= lost(1) && lost(1) >= lost(2), "loss must shrink as ctx grows")
  }

  test("embeddingStats: identity-based mean pairwise cosine equals brute force") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val out = Queries.embeddingStats(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val byLabel = vecs.groupBy(_._1)
    assert(out.keySet == byLabel.keySet)
    byLabel.foreach { case (lbl, rows) =>
      val us = rows.map { case (_, v) =>
        val n = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / n)
      }
      val n = us.length
      assert(out(lbl)._1 == n.toLong)
      val meanNorm = rows.map { case (_, v) => math.sqrt(v.map(x => x * x).sum) }.sum / n
      assert(math.abs(out(lbl)._2 - meanNorm) < 1e-4, s"mean_norm label $lbl")
      if (n > 1) {
        var acc = 0.0
        for (i <- 0 until n; j <- 0 until n if i != j)
          acc += us(i).zip(us(j)).map { case (a, b) => a * b }.sum
        val brute = acc / (n.toLong * (n - 1))
        assert(math.abs(out(lbl)._3 - brute) < 1e-3,
          s"pairwise cos label $lbl: ${out(lbl)._3} vs $brute")
      }
    }
  }
}
