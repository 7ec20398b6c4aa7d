package graft.functions

/** INTEGER-EXACT (fixed-point) forward pass of the checked-in
  * token-sequence encoder (`graft/embed_encoder.onnx`,
  * [[OnnxFixture.encoderGraph]]) — the quantized-inference variant that
  * makes a transformer forward BIT-EXACTLY reproducible across engines.
  *
  * Why this exists: the float encoder (`embed_encoder`) is honest
  * rows-only in the oracle gate — softmax's `exp`, GELU's `erf` and
  * layer-norm's reciprocal-sqrt go through libm, whose last-ulp
  * rounding differs between the JVM and any other engine, and matmul
  * reassociation moves float sums further. Production serving stacks
  * answer the same reproducibility problem with INTEGER-ONLY inference
  * (I-BERT, Kim et al. 2021: integer polynomial softmax/GELU/sqrt;
  * ONNX Runtime's QLinear ops): integer adds and multiplies are
  * associative, so the result is independent of execution order and
  * identical on every conforming engine. This object is that variant
  * for the checked-in encoder: same artifact file, same weights (the
  * fixture's weights are already integers), activations in Q·2^12
  * fixed point, and every nonlinearity a fixed integer algorithm.
  *
  * THE CONTRACT (shared verbatim by the DuckDB twin in
  * [[graft.OracleSql]] — any change here must change the SQL too):
  *  - scale `F = 4096` (2^12); an activation `a` represents `a / F`;
  *  - ALL divisions are 64-bit TRUNCATING divisions (Scala `Long./`,
  *    DuckDB `//` — verified identical on negatives: −7/2 = −3);
  *  - weights are plain integers (no scale); a product
  *    `activation × weight` keeps scale F, `activation × activation`
  *    has scale F² and is rescaled by one `/F` AFTER the full sum;
  *  - softmax: row max subtracted in integers, `exp(−u/F)` via the
  *    base-2 decomposition `u2 = u·Log2eF/F`, `z = u2/F`,
  *    `r = u2 − z·F`, `p = F − r·Ln2F/F + ((r²/F)·P2F)/F`, result
  *    `p >> z` (u clamped to 16·F first; the quadratic hits
  *    `p(F) = F/2` exactly, so the approximation is continuous across
  *    the integer-exponent boundary); weights `att = e·F / Σe`;
  *  - layer norm (16 columns): `c_j = 16·res_j − Σres`,
  *    `x̂_j = 4·c_j·F / (isqrt(Σc²) + 1)` — algebraically
  *    `(res−mean)/√var` at D = 16, `+1` the epsilon analog —
  *    then `γ_j·x̂_j + β_j·F`;
  *  - `isqrt` is floor-sqrt: `s0 = ⌊sqrt(toDouble(x))⌋` corrected by
  *    one step up then one down (exact for x < 2^52; our Σc² ≤ ~2^52);
  *  - mean-pool `p_j = (Σ_i res2_ij) / L`, then ONE float step at the
  *    very end: `out_j = p_j / √(Σp²)` in IEEE doubles (a cast, one
  *    `sqrt`, one divide — each correctly rounded and identical on
  *    both engines), rounded to the repo-wide 5 dp.
  *
  * Every intermediate is bounded well inside 2^63 (worst-case audit in
  * QuantEncoderSpec), so DuckDB's checked BIGINT arithmetic and Scala's
  * Long agree everywhere.
  *
  * Reference: embedder.py:21-60 is the float pipeline being quantized;
  * store.py persists float vectors, so the reference has no
  * reproducibility story at all — this variant is what a 100 TB corpus
  * re-embedding wants anyway (integer SIMD, engine-portable results).
  */
object QuantEncoder {

  val F = 4096L
  val Log2eF = 5909L // round(log2(e)·F)
  val Ln2F = 2839L // round(ln 2·F)
  val P2F = 791L // fitted so F − Ln2F + P2F = F/2 exactly (continuity at z+1)
  val UClamp: Long = 16L * F
  val Dims = 16

  final case class Weights(
      emb: Array[Array[Long]], // 256 × 16
      wq: Array[Array[Long]],
      wk: Array[Array[Long]],
      wv: Array[Array[Long]],
      lnG: Array[Long],
      lnB: Array[Long],
      wf1: Array[Array[Long]],
      bf1: Array[Long],
      wf2: Array[Array[Long]],
      bf2: Array[Long])

  /** Load the encoder artifact and REQUIRE integrality: the quantized
    * contract is only exact because every weight is a small integer
    * (float32 holds them exactly). A retrained float artifact fails
    * here loudly instead of silently losing the bit-exactness claim.
    */
  def loadFromOnnx(resource: String): Weights =
    fromGraph(OnnxMini.load(resource))

  /** Load the CROSS-ENCODER artifact (`cross_encoder.onnx` =
    * [[OnnxFixture.crossEncoderGraph]] — the same encoder weights plus
    * a [16×1] integer score head) for quantized joint scoring.
    */
  def loadCrossFromOnnx(resource: String): (Weights, Array[Long]) = {
    val g = OnnxMini.load(resource)
    val w = fromGraph(g)
    val t = g.initializers.getOrElse("w_score", sys.error("quant-encoder: no w_score head"))
    require(t.dims == Seq(Dims, 1), s"quant-encoder: w_score dims ${t.dims}")
    val head = t.data.map { f =>
      require(f == math.rint(f) && math.abs(f) <= 1024,
        s"quant-encoder: non-integer weight $f in w_score — artifact not quantizable")
      f.toLong
    }
    (w, head)
  }

  /** Quantized JOINT score: the [[pooled]] vector (scale F, no
    * normalization — matching the float cross-encoder, which scores
    * the raw pooled vector) through the integer score head, reported
    * as the EXACT double `Σ p_j·w_j / F` (an integer divided by a
    * power of two — no rounding needed, both engines land the same
    * bits). Empty joint sequence scores 0.0, as the float scorer does.
    */
  def scoreJoint(w: Weights, head: Array[Long], ids: Array[Int]): Double = {
    if (ids.isEmpty) return 0.0
    val p = pooled(w, ids)
    var s = 0L
    var j = 0
    while (j < Dims) { s += p(j) * head(j); j += 1 }
    s.toDouble / F
  }

  private[graft] def fromGraph(g: OnnxMini.Graph): Weights = {
    def tensor(name: String, rows: Int, cols: Int): Array[Array[Long]] = {
      val t = g.initializers.getOrElse(name, sys.error(s"quant-encoder: no tensor $name"))
      require(t.dims == Seq(rows, cols) || (rows == 1 && t.dims == Seq(cols)),
        s"quant-encoder: $name dims ${t.dims} != ${rows}x$cols")
      Array.tabulate(rows, cols) { (i, j) =>
        val f = t.data(i * cols + j)
        require(f == math.rint(f) && math.abs(f) <= 1024,
          s"quant-encoder: non-integer weight $f in $name — artifact not quantizable")
        f.toLong
      }
    }
    def vec(name: String, n: Int): Array[Long] = tensor(name, 1, n)(0)
    Weights(
      emb = tensor("emb_table", OnnxFixture.VocabSize, Dims),
      wq = tensor("Wq", Dims, Dims),
      wk = tensor("Wk", Dims, Dims),
      wv = tensor("Wv", Dims, Dims),
      lnG = vec("ln_g", Dims),
      lnB = vec("ln_b", Dims),
      wf1 = tensor("Wf1", Dims, Dims),
      bf1 = vec("bf1", Dims),
      wf2 = tensor("Wf2", Dims, Dims),
      bf2 = vec("bf2", Dims))
  }

  /** Floor integer square root, exact for x < 2^52: double sqrt is
    * within 1 ulp, one up-step and one down-step correct it.
    */
  def isqrt(x: Long): Long = {
    val s0 = math.sqrt(x.toDouble).toLong
    val s1 = if ((s0 + 1) * (s0 + 1) <= x) s0 + 1 else s0
    if (s1 * s1 > x) s1 - 1 else s1
  }

  /** Fixed-point `exp(−u/F)` at scale F (u ≥ 0), per the contract. */
  def expNeg(u0: Long): Long = {
    val u = math.min(u0, UClamp)
    val u2 = u * Log2eF / F
    val z = u2 / F
    val r = u2 - z * F
    val p = F - r * Ln2F / F + (r * r / F) * P2F / F
    p >> z.toInt
  }

  /** The forward pass: ids → Gather·F → QKV → scaled scores → integer
    * softmax → context → residual → integer LN → ReLU FFN → residual →
    * mean-pool → one-float-step L2 normalize. Mirrors
    * [[OnnxFixture.encoderGraph]] node for node with the float ops
    * replaced per the contract.
    */
  def encode(w: Weights, ids: Array[Int]): Array[Double] = {
    val d = Dims
    if (ids.isEmpty) return new Array[Double](d)
    val p = pooled(w, ids)
    var nsq = 0L
    var j = 0
    while (j < d) { nsq += p(j) * p(j); j += 1 }
    if (nsq == 0L) new Array[Double](d)
    else {
      val n = math.sqrt(nsq.toDouble)
      p.map(_.toDouble / n)
    }
  }

  /** The integer forward up to (and including) the mean-pool — the
    * scale-F pooled vector [[encode]] normalizes and [[scoreJoint]]
    * projects. Requires a nonempty id sequence.
    */
  def pooled(w: Weights, ids: Array[Int]): Array[Long] = {
    val l = ids.length
    val d = Dims
    require(l > 0, "quant-encoder: pooled over an empty sequence")
    val x = Array.tabulate(l, d)((i, j) => w.emb(ids(i))(j) * F)
    def proj(m: Array[Array[Long]]): Array[Array[Long]] =
      Array.tabulate(l, d) { (i, j) =>
        var s = 0L; var c = 0
        while (c < d) { s += x(i)(c) * m(c)(j); c += 1 }
        s
      }
    val q = proj(w.wq); val k = proj(w.wk); val v = proj(w.wv)
    val att = Array.ofDim[Long](l, l)
    var i = 0
    while (i < l) {
      val s = Array.tabulate(l) { t =>
        var acc = 0L; var j = 0
        while (j < d) { acc += q(i)(j) * k(t)(j); j += 1 }
        acc / (4L * F) // ×(1/√16), rescale F² → F
      }
      var mx = Long.MinValue
      var t = 0
      while (t < l) { if (s(t) > mx) mx = s(t); t += 1 }
      val e = Array.tabulate(l)(t => expNeg(mx - s(t)))
      var den = 0L
      t = 0
      while (t < l) { den += e(t); t += 1 }
      t = 0
      while (t < l) { att(i)(t) = e(t) * F / den; t += 1 }
      i += 1
    }
    val res2 = Array.ofDim[Long](l, d)
    i = 0
    while (i < l) {
      val ctx = Array.tabulate(d) { j =>
        var acc = 0L; var t = 0
        while (t < l) { acc += att(i)(t) * v(t)(j); t += 1 }
        acc / F
      }
      val res = Array.tabulate(d)(j => ctx(j) + x(i)(j))
      var sm = 0L
      var j = 0
      while (j < d) { sm += res(j); j += 1 }
      val c = Array.tabulate(d)(j => d.toLong * res(j) - sm)
      var ss = 0L
      j = 0
      while (j < d) { ss += c(j) * c(j); j += 1 }
      val sq = isqrt(ss) + 1
      val ln = Array.tabulate(d)(j => w.lnG(j) * (4L * c(j) * F / sq) + w.lnB(j) * F)
      val f1 = Array.tabulate(d) { j2 =>
        var acc = 0L; var c2 = 0
        while (c2 < d) { acc += ln(c2) * w.wf1(c2)(j2); c2 += 1 }
        acc + w.bf1(j2) * F
      }
      val f2 = f1.map(a => if (a > 0) a else 0L)
      val f3 = Array.tabulate(d) { j2 =>
        var acc = 0L; var c2 = 0
        while (c2 < d) { acc += f2(c2) * w.wf2(c2)(j2); c2 += 1 }
        acc + w.bf2(j2) * F
      }
      j = 0
      while (j < d) { res2(i)(j) = f3(j) + ln(j); j += 1 }
      i += 1
    }
    Array.tabulate(d) { j =>
      var acc = 0L; var r = 0
      while (r < l) { acc += res2(r)(j); r += 1 }
      acc / l
    }
  }
}
