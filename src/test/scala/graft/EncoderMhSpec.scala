package graft

import graft.functions.{OnnxFixture => F, OnnxMini}
import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** The multi-head encoder's correctness pin (the rows-only honest
  * class, like CrossRerankSpec): the checked-in
  * `embed_encoder_mh.onnx` artifact's forward pass — 2 pre-LN layers
  * of 4-head attention with exact-erf GELU FFNs — is recomputed in
  * plain Scala directly from the [[OnnxFixture]] weight formulas
  * (never through the OnnxMini executor), and the FULL registered
  * `embed_encoder_mh` query output is checked against the same
  * recomputation through the real tokenizer. Erf itself is the one
  * shared primitive (commons-math3, a published special function —
  * the same standing as math.exp in the softmax recompute).
  */
class EncoderMhSpec extends SparkSpec {
  import spark.implicits._

  type M = Vector[Vector[Double]]
  private def mm(a: M, b: M): M =
    a.map(r => b.transpose.map(c => r.lazyZip(c).map(_ * _).sum))
  private def mat(rows: Int, cols: Int, f: (Int, Int) => Float): M =
    Vector.tabulate(rows, cols)((i, j) => f(i, j).toDouble)
  private def layerNorm(x: M, g: Int => Float, b: Int => Float): M = {
    val eps = 1e-5f.toDouble
    x.map { r =>
      val mean = r.sum / r.length
      val va = r.map(z => (z - mean) * (z - mean)).sum / r.length
      val inv = 1.0 / math.sqrt(va + eps)
      r.zipWithIndex.map { case (z, j) => (z - mean) * inv * g(j) + b(j) }
    }
  }
  private def gelu(x: Double): Double = {
    val invSqrt2 = (1.0 / math.sqrt(2.0)).toFloat.toDouble // float32 constant in the artifact
    x * 0.5 * (1.0 + org.apache.commons.math3.special.Erf.erf(x * invSqrt2))
  }

  /** Plain-Scala forward of the 2-layer 4-head encoder from the weight
    * formulas: ids → table rows → per layer [LN → packed QKV → 4 column
    * blocks → per-head softmax((Qh·Khᵀ)/√32)·Vh → concat → Wo →
    * residual → LN → GELU FFN → residual] → final LN → mean-pool.
    */
  private def forward(ids: Seq[Int]): Vector[Double] = {
    val invSqrtDh = (1.0 / math.sqrt(F.MhHeadDims)).toFloat.toDouble
    var x: M = ids.toVector.map(id =>
      Vector.tabulate(F.MhModelDims)(j => F.mhEmb(id, j).toDouble))
    (0 until F.MhLayers).foreach { l =>
      val a = layerNorm(x, F.mhGamma(l, 0, _), F.mhBeta(l, 0, _))
      val Seq(q, k, v) = Seq(0, 1, 2).map(m =>
        mm(a, mat(F.MhModelDims, F.MhModelDims, F.mhW(l, m, _, _))))
      val heads = (0 until F.MhHeads).map { h =>
        def slice(z: M): M = z.map(_.slice(h * F.MhHeadDims, (h + 1) * F.MhHeadDims))
        val (qh, kh, vh) = (slice(q), slice(k), slice(v))
        val s = mm(qh, kh.transpose).map(_.map(_ * invSqrtDh))
        val att = s.map { r =>
          val mx = r.max; val e = r.map(z => math.exp(z - mx)); val su = e.sum
          e.map(_ / su)
        }
        mm(att, vh)
      }
      val cc: M = x.indices.toVector.map(r => heads.flatMap(_(r)).toVector)
      val proj = mm(cc, mat(F.MhModelDims, F.MhModelDims, F.mhW(l, 3, _, _)))
      val r1 = x.lazyZip(proj).map((p, q2) => p.lazyZip(q2).map(_ + _))
      val n2 = layerNorm(r1, F.mhGamma(l, 1, _), F.mhBeta(l, 1, _))
      val f1 = mm(n2, mat(F.MhModelDims, F.MhFfnDims, F.mhW(l, 4, _, _)))
        .map(_.zipWithIndex.map { case (z, j) => z + F.mhB(l, 0, j) })
      val g4 = f1.map(_.map(gelu))
      val f4 = mm(g4, mat(F.MhFfnDims, F.MhModelDims, F.mhW(l, 5, _, _)))
        .map(_.zipWithIndex.map { case (z, j) => z + F.mhB(l, 1, j) })
      x = r1.lazyZip(f4).map((p, q2) => p.lazyZip(q2).map(_ + _))
    }
    val nf = layerNorm(x, F.mhGamma(F.MhLayers, 0, _), F.mhBeta(F.MhLayers, 0, _))
    Vector.tabulate(F.MhModelDims)(j => nf.map(_(j)).sum / ids.length)
  }

  test("checked-in multi-head artifact matches the independent recomputation at three lengths") {
    val g = OnnxMini.load("/graft/embed_encoder_mh.onnx")
    assert(g.nodes.count(_.opType == "Split") == 6 &&
      g.nodes.count(_.opType == "Concat") == 2 &&
      g.nodes.count(_.opType == "Erf") == 2 &&
      g.nodes.count(_.opType == "LayerNormalization") == 5)
    assert(g.nodes.find(_.opType == "Split").get.attrs("axis").i.contains(1L))
    for (ids <- Seq(
        Seq(3, 250, 3, 17, 99, 0, 123, 42, 200),
        Seq(42),
        Seq(7, 7, 7, 130, 9))) {
      val got = OnnxMini.run2d(g,
        OnnxMini.Mat(ids.length, 1, ids.map(_.toDouble).toArray))
      assert(got.rows == 1 && got.cols == F.MhModelDims)
      val expected = forward(ids)
      got.data.toSeq.lazyZip(expected).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-9, s"L=${ids.length} dim $i: $a vs $b")
      }
    }
    // Attention + mean-pool WITHOUT positional embeddings is
    // permutation-invariant by construction (a permuted sequence
    // permutes the attention outputs, and the pool erases order) —
    // so the honest sensitivity check is on the token MULTISET:
    val p1 = OnnxMini.run2d(g, OnnxMini.Mat(3, 1, Array(5.0, 9.0, 200.0))).data
    val p2 = OnnxMini.run2d(g, OnnxMini.Mat(3, 1, Array(200.0, 9.0, 5.0))).data
    assert(p1.toSeq == p2.toSeq, "no positions -> permutation-invariant pool")
    val p3 = OnnxMini.run2d(g, OnnxMini.Mat(4, 1, Array(5.0, 5.0, 9.0, 200.0))).data
    assert(p1.toSeq != p3.toSeq, "a repeated token must change the pool")
  }

  test("embed_encoder_mh query: registered output matches the recomputation through the real tokenizer") {
    val out = Queries.embedEncoderMh(spark, sf).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getDouble(2)).toVector).toMap
    assert(out.nonEmpty && out.values.forall(_.length == F.MhModelDims))
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").orderBy("doc_id").limit(5)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val merges = Bpe.merges
    val pretoken = java.util.regex.Pattern.compile(Bpe.PretokenRegex)
    docs.foreach { case (id, text) =>
      val ids = Seq.newBuilder[Int]
      var n = 0
      val m = pretoken.matcher(text.toLowerCase)
      while (m.find() && n < 64) {
        Bpe.encodeWord(m.group(), merges).foreach { s =>
          if (n < 64) { ids += java.lang.Math.floorMod(s.hashCode, F.VocabSize); n += 1 }
        }
      }
      val raw = forward(ids.result())
      val norm = math.sqrt(raw.map(z => z * z).sum)
      val expected = raw.map(z =>
        BigDecimal(z / norm).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val got = out(id)
      got.lazyZip(expected).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 2e-5, s"doc $id dim $i: $a vs $b")
      }
    }
  }
}
