package graft

import graft.functions.{OnnxFixture, QuantEncoder}

/** The quantized encoder's own contract pins (the cross-engine
  * bit-exactness itself is pinned by the driver gate: embed_encoder_q
  * is hash-compared against the DuckDB twin, which was additionally
  * validated against a third independent implementation of the
  * contract during development).
  */
class QuantEncoderSpec extends SparkSpec {

  private lazy val w = QuantEncoder.loadFromOnnx("/graft/embed_encoder.onnx")

  private def idsOf(text: String): Array[Int] = {
    val merges = graft.operators.Bpe.merges
    val m = java.util.regex.Pattern.compile(graft.operators.Bpe.PretokenRegex)
      .matcher(text.toLowerCase)
    val b = Array.newBuilder[Int]
    var n = 0
    while (m.find() && n < 64) {
      graft.operators.Bpe.encodeWord(m.group(), merges).foreach { s =>
        if (n < 64) { b += java.lang.Math.floorMod(s.hashCode, OnnxFixture.VocabSize); n += 1 }
      }
    }
    b.result()
  }

  test("artifact weights load as exact integers; a float-weight artifact fails loudly") {
    assert(w.emb.length == 256 && w.emb.head.length == 16)
    assert(w.wq.flatten.forall(v => v >= -2 && v <= 2))
    // a float-weight model (one Wq entry nudged off the integer grid)
    // must be refused by the integrality gate — silently truncating it
    // would void the bit-exactness claim
    val g0 = OnnxFixture.encoderGraph
    val wq0 = g0.initializers("Wq")
    val broken = g0.copy(initializers = g0.initializers +
      ("Wq" -> wq0.copy(data = wq0.data.updated(0, 0.5f))))
    val e = intercept[IllegalArgumentException](QuantEncoder.fromGraph(broken))
    assert(e.getMessage.contains("not quantizable"))
    // a wrong-shape artifact (the 128-dim multi-head encoder) is also
    // refused, at the dims gate
    val e2 = intercept[IllegalArgumentException] {
      QuantEncoder.loadFromOnnx("/graft/embed_encoder_mh.onnx")
    }
    assert(e2.getMessage.contains("dims"))
  }

  test("empty sequence short-circuits to the zero vector; nonempty output is unit-norm") {
    assert(QuantEncoder.encode(w, Array.empty).forall(_ == 0.0))
    val out = QuantEncoder.encode(w, idsOf("spark filter join stream"))
    val norm = math.sqrt(out.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9, s"norm $norm")
  }

  test("isqrt is exact floor sqrt across the magnitude range incl. perfect-square edges") {
    val xs = Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L, (1L << 26) * ((1L << 26) - 1),
      1234567890123L, (1L << 25) * (1L << 25), (1L << 25) * (1L << 25) - 1) ++
      (0 until 1000).map(i => (i.toLong * 2654435761L) % (1L << 52))
    xs.foreach { x =>
      val s = QuantEncoder.isqrt(x)
      assert(s * s <= x && (s + 1) * (s + 1) > x, s"isqrt($x) = $s")
    }
  }

  test("expNeg is monotone non-increasing, exact at 0, continuous at the exponent boundary") {
    assert(QuantEncoder.expNeg(0L) == QuantEncoder.F)
    // p(F) = F/2 exactly — the quadratic's fitted endpoint means the
    // value just below u2=F and the shifted value just above agree
    var prev = QuantEncoder.F
    (0L to (17L * QuantEncoder.F) by 64L).foreach { u =>
      val e = QuantEncoder.expNeg(u)
      assert(e <= prev, s"expNeg not monotone at u=$u: $e > $prev")
      assert(e >= 0L)
      prev = e
    }
    // mid-range relative accuracy ~1%: quality, not parity, but a
    // broken polynomial would silently destroy the embedding space
    Seq(0.25, 0.5, 1.0, 2.0, 4.0).foreach { t =>
      val got = QuantEncoder.expNeg((t * QuantEncoder.F).toLong).toDouble / QuantEncoder.F
      val want = math.exp(-t)
      assert(math.abs(got - want) < 0.015, s"expNeg($t): $got vs $want")
    }
  }

  test("quantized embedding tracks the float encoder (same model, ~1% activation error)") {
    val floatEnc = graft.operators.Featurize.encoderEmbedder()()
    val texts = Seq(
      "spark filter join stream",
      "the quick brown fox jumps over the lazy dog",
      "distributed query engines shuffle partitioned data",
      "a",
      "tokenize embed attend pool normalize")
    texts.foreach { t =>
      val qv = QuantEncoder.encode(w, idsOf(t))
      val fv = floatEnc(t)
      val cos = qv.zip(fv).map { case (a, b) => a * b }.sum
      assert(cos > 0.98, s"quant/float cosine $cos for '$t' — quantization drifted")
    }
  }

  test("quantized cross scorer: joint mixing, permutation invariance, exact dyadic scores") {
    val scorer = graft.operators.Featurize.quantCrossScorer()()
    val q = "spark filter join stream"
    val doc = "spark filters a joined stream of rows"
    val a = scorer(q, doc)
    // joint mixing: the SAME document scores differently under a
    // different query — the query tokens participate in attention
    assert(scorer("cooking recipes", doc) != a, "query must move the joint score")
    // content sensitivity: a different token multiset moves the score
    assert(scorer(q, "completely unrelated text about cooking") != a)
    // permutation INVARIANCE is a property of this topology (no
    // positional encoding + mean pool: attention is permutation-
    // equivariant, pooling erases the order) — shared with the float
    // model, pinned here so a future positional-encoding change is a
    // conscious contract change on both engines at once
    assert(scorer(q, "rows of stream joined a filters spark") == a)
    // exactness: score * 4096 must be an integer (the dyadic contract
    // the no-rounding twin relies on)
    Seq(a, scorer(q, "completely unrelated text about cooking")).foreach { s =>
      assert((s * 4096.0) == math.rint(s * 4096.0), s"score $s is not an exact /4096 dyadic")
    }
    assert(scorer("", "") == 0.0)
    // determinism across a fresh session (fresh weight load + memo)
    val scorer2 = graft.operators.Featurize.quantCrossScorer()()
    assert(scorer2(q, doc) == a)
  }

  test("worst-case intermediates stay far inside 64-bit (the DuckDB checked-BIGINT bound)") {
    // adversarial id sequence: the ids whose embedding rows have the
    // largest L1 mass, repeated to the 64-token cap — if this cannot
    // overflow, no real sequence can (every intermediate's bound is
    // monotone in the embedding magnitudes; the audit constants live in
    // QuantEncoder's doc)
    val byMass = (0 until 256).sortBy(v => -w.emb(v).map(math.abs).sum)
    val ids = Array.fill(64)(0).zipWithIndex.map { case (_, i) => byMass(i % 8) }
    val out = QuantEncoder.encode(w, ids)
    assert(out.forall(x => !x.isNaN && !x.isInfinite))
    val norm = math.sqrt(out.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
  }
}
