package graft.functions

/** The checked-in embedding MLP's weight CONTRACT: small-integer
  * weights from closed-form formulas, shared by three independent
  * parties — the artifact generator ([[graft.tools.MakeOnnx]] writes
  * them into `graft/embed_mlp.onnx`), the DuckDB oracle twin (inlines
  * the same values as SQL literals), and FeaturizeSpec (recomputes
  * scores from the formulas and checks the FILE-driven path against
  * them). Score time never touches these formulas — executors load the
  * .onnx artifact, which is the point of the seam.
  *
  * Integer weights + integer bag-of-words counts + ReLU keep every
  * pre-normalization value EXACT in double arithmetic, so the only
  * float-parity surface is the final L2 divide — the same single-
  * division convention every other twin in this repo uses.
  */
object OnnxFixture {

  val InputDims = 64
  val HiddenDims = 16

  /** W1: [InputDims x HiddenDims], entries in [-3, 3]. */
  def w1(i: Int, j: Int): Int = ((i * 31 + j * 17) % 7) - 3

  /** b1: [HiddenDims], entries in [-2, 2]. */
  def b1(j: Int): Int = (j % 5) - 2

  /** W2: [HiddenDims x InputDims], entries in [-2, 2]. */
  def w2(j: Int, k: Int): Int = ((j * 13 + k * 7) % 5) - 2

  /** b2: [InputDims], entries in [-1, 1]. */
  def b2(k: Int): Int = (k % 3) - 1

  // ── single-head transformer block (graft/embed_attn.onnx) ──────────

  /** The attention model views the 64-dim BoW input as a SeqLen ×
    * HeadDims matrix: 4 "token slots" of 16 dims each.
    */
  val SeqLen = 4
  val HeadDims = 16

  /** Q/K/V projections [16×16], entries in [-2, 2]. */
  def wq(i: Int, j: Int): Int = ((i * 19 + j * 7) % 5) - 2
  def wk(i: Int, j: Int): Int = ((i * 11 + j * 23) % 5) - 2
  def wv(i: Int, j: Int): Int = ((i * 29 + j * 13) % 5) - 2

  /** LayerNorm scale (positive, in 1..3) and bias (in [-1, 1]). */
  def gamma(j: Int): Int = (j % 3) + 1
  def beta(j: Int): Int = (j % 3) - 1

  /** FFN weights [16×16] / biases, entries in [-2, 2] / [-1, 1]. */
  def wf1(i: Int, j: Int): Int = ((i * 17 + j * 3) % 5) - 2
  def bf1(j: Int): Int = (j % 3) - 1
  def wf2(i: Int, j: Int): Int = ((i * 5 + j * 31) % 5) - 2
  def bf2(j: Int): Int = (j % 3) - 1

  private def m16(f: (Int, Int) => Int): OnnxMini.Tensor =
    OnnxMini.Tensor(Seq(HeadDims, HeadDims),
      Array.tabulate(HeadDims * HeadDims)(x => f(x / HeadDims, x % HeadDims).toFloat))
  private def v16(f: Int => Int): OnnxMini.Tensor =
    OnnxMini.Tensor(Seq(HeadDims), Array.tabulate(HeadDims)(f(_).toFloat))

  /** A SINGLE-HEAD TRANSFORMER BLOCK over the reshaped input —
    * QKV projections → scaled scores (1/√16 = 0.25, exact in binary) →
    * softmax → context → residual + LayerNorm → ReLU FFN → second
    * residual → flatten. Every op the executor gained for this model
    * (MatMul act×act, Transpose, Mul, Softmax, LayerNormalization,
    * Reshape) is on the path, so the spec's independent recomputation
    * exercises all of them. An externally-trained small encoder with
    * this topology would run through the same
    * [[graft.operators.Featurize.embedWithModel]] seam unchanged
    * (reference: embedder.py:21-60).
    */
  def attentionGraph: OnnxMini.Graph = OnnxMini.Graph(
    nodes = Seq(
      OnnxMini.Node("Reshape", Seq("bow", "shape_sd"), Seq("x")),
      OnnxMini.Node("MatMul", Seq("x", "Wq"), Seq("q")),
      OnnxMini.Node("MatMul", Seq("x", "Wk"), Seq("k")),
      OnnxMini.Node("MatMul", Seq("x", "Wv"), Seq("v")),
      OnnxMini.Node("Transpose", Seq("k"), Seq("kt")),
      OnnxMini.Node("MatMul", Seq("q", "kt"), Seq("s0")),
      OnnxMini.Node("Mul", Seq("s0", "inv_sqrt_d"), Seq("s1")),
      OnnxMini.Node("Softmax", Seq("s1"), Seq("att")),
      OnnxMini.Node("MatMul", Seq("att", "v"), Seq("ctx")),
      OnnxMini.Node("Add", Seq("ctx", "x"), Seq("res")),
      OnnxMini.Node("LayerNormalization", Seq("res", "ln_g", "ln_b"), Seq("ln")),
      OnnxMini.Node("MatMul", Seq("ln", "Wf1"), Seq("f0")),
      OnnxMini.Node("Add", Seq("f0", "bf1"), Seq("f1")),
      OnnxMini.Node("Relu", Seq("f1"), Seq("f2")),
      OnnxMini.Node("MatMul", Seq("f2", "Wf2"), Seq("f3")),
      OnnxMini.Node("Add", Seq("f3", "bf2"), Seq("f4")),
      OnnxMini.Node("Add", Seq("f4", "ln"), Seq("res2")),
      OnnxMini.Node("Reshape", Seq("res2", "shape_flat"), Seq("out"))),
    initializers = Map(
      "shape_sd" -> OnnxMini.Tensor(Seq(2), Array(SeqLen.toFloat, HeadDims.toFloat), dtype = 7),
      "shape_flat" -> OnnxMini.Tensor(Seq(2), Array(1f, -1f), dtype = 7),
      "inv_sqrt_d" -> OnnxMini.Tensor(Seq(1), Array(0.25f)),
      "Wq" -> m16(wq), "Wk" -> m16(wk), "Wv" -> m16(wv),
      "ln_g" -> v16(gamma), "ln_b" -> v16(beta),
      "Wf1" -> m16(wf1), "bf1" -> v16(bf1),
      "Wf2" -> m16(wf2), "bf2" -> v16(bf2)),
    inputName = "bow",
    outputName = "out")

  // ── token-sequence encoder (graft/embed_encoder.onnx) ──────────────

  /** Hashed vocab size for the encoder's embedding table. */
  val VocabSize = 256

  /** Embedding table [256×16], entries in [-3, 3]. */
  def embTable(v: Int, j: Int): Int = ((v * 37 + j * 11) % 7) - 3

  /** A token-sequence ENCODER: a rank-1 id list (length L varies per
    * document) → Gather rows of the embedding table → the same
    * single-head attention block as [[attentionGraph]], now over a
    * DYNAMIC L×16 activation → ReduceMean over the sequence axis →
    * a pooled 16-dim vector. This is the reference embedder's actual
    * shape (embedder.py:21-60: tokenize → embed → transformer →
    * mean-pool → normalize); normalization happens Scala-side in
    * [[graft.operators.Featurize.encoderEmbedder]] where the empty
    * sequence is also short-circuited. Attribute round-trips on the
    * wire are exercised here (Gather axis, ReduceMean axes, Softmax
    * axis, LayerNormalization epsilon, Transpose perm).
    */
  def encoderGraph: OnnxMini.Graph = OnnxMini.Graph(
    nodes = Seq(
      OnnxMini.Node("Gather", Seq("emb_table", "ids"), Seq("x"),
        Map("axis" -> OnnxMini.Attr(i = Some(0L)))),
      OnnxMini.Node("MatMul", Seq("x", "Wq"), Seq("q")),
      OnnxMini.Node("MatMul", Seq("x", "Wk"), Seq("k")),
      OnnxMini.Node("MatMul", Seq("x", "Wv"), Seq("v")),
      OnnxMini.Node("Transpose", Seq("k"), Seq("kt"),
        Map("perm" -> OnnxMini.Attr(ints = Seq(1L, 0L)))),
      OnnxMini.Node("MatMul", Seq("q", "kt"), Seq("s0")),
      OnnxMini.Node("Mul", Seq("s0", "inv_sqrt_d"), Seq("s1")),
      OnnxMini.Node("Softmax", Seq("s1"), Seq("att"),
        Map("axis" -> OnnxMini.Attr(i = Some(-1L)))),
      OnnxMini.Node("MatMul", Seq("att", "v"), Seq("ctx")),
      OnnxMini.Node("Add", Seq("ctx", "x"), Seq("res")),
      OnnxMini.Node("LayerNormalization", Seq("res", "ln_g", "ln_b"), Seq("ln"),
        Map("epsilon" -> OnnxMini.Attr(f = Some(1e-5f)))),
      OnnxMini.Node("MatMul", Seq("ln", "Wf1"), Seq("f0")),
      OnnxMini.Node("Add", Seq("f0", "bf1"), Seq("f1")),
      OnnxMini.Node("Relu", Seq("f1"), Seq("f2")),
      OnnxMini.Node("MatMul", Seq("f2", "Wf2"), Seq("f3")),
      OnnxMini.Node("Add", Seq("f3", "bf2"), Seq("f4")),
      OnnxMini.Node("Add", Seq("f4", "ln"), Seq("res2")),
      OnnxMini.Node("ReduceMean", Seq("res2"), Seq("out"),
        Map("axes" -> OnnxMini.Attr(ints = Seq(0L))))),
    initializers = Map(
      "emb_table" -> OnnxMini.Tensor(Seq(VocabSize, HeadDims),
        Array.tabulate(VocabSize * HeadDims)(x =>
          embTable(x / HeadDims, x % HeadDims).toFloat)),
      "inv_sqrt_d" -> OnnxMini.Tensor(Seq(1), Array(0.25f)),
      "Wq" -> m16(wq), "Wk" -> m16(wk), "Wv" -> m16(wv),
      "ln_g" -> v16(gamma), "ln_b" -> v16(beta),
      "Wf1" -> m16(wf1), "bf1" -> v16(bf1),
      "Wf2" -> m16(wf2), "bf2" -> v16(bf2)),
    inputName = "ids",
    outputName = "out")

  // ── multi-head 2-layer encoder (graft/embed_encoder_mh.onnx) ───────

  /** The pretrained-CLASS encoder shape (embedder.py:38 runs
    * nomic-embed; MiniLM-class distillations are 2-6 layers, 4-12
    * heads, 128-384 dims): 2 pre-LN transformer layers, 4 heads of 32
    * dims over a 128-dim model width, GELU FFN with the standard 2×
    * expansion (256), final LayerNorm, mean-pool. Weights are
    * synthetic closed-form floats (scaled so post-LN activations keep
    * softmax/GELU in their informative range) — the topology, not the
    * training, is what the seam demonstrates: an externally-trained
    * artifact with this graph runs through
    * [[graft.operators.Featurize.encoderEmbedder]] unchanged.
    */
  val MhModelDims = 128
  val MhHeads = 4
  val MhHeadDims: Int = MhModelDims / MhHeads // 32
  val MhFfnDims = 256
  val MhLayers = 2

  /** Embedding table [256×128], entries in [-0.75, 0.75] on a 1/8 grid. */
  def mhEmb(v: Int, j: Int): Float = (((v * 37 + j * 11) % 13) - 6) / 8.0f

  /** Projection/FFN weights, entries in [-0.0625, 0.0625] on a 1/96
    * grid — sized so a 128-term row dot over post-LN (unit-variance)
    * activations lands O(1). `m` indexes the matrix kind within a
    * layer: 0=Wq 1=Wk 2=Wv 3=Wo 4=Wf1 5=Wf2.
    */
  def mhW(l: Int, m: Int, i: Int, j: Int): Float =
    (((l * 101 + m * 53 + i * 31 + j * 17) % 13) - 6) / 96.0f

  /** FFN biases, entries in [-0.1875, 0.1875]. `m`: 0=bf1 1=bf2. */
  def mhB(l: Int, m: Int, j: Int): Float =
    (((l * 71 + m * 41 + j * 13) % 7) - 3) / 16.0f

  /** LayerNorm scales in [1, 1.5] and biases in [-0.25, 0.25].
    * `m`: 0=pre-attention 1=pre-FFN (2=final uses l=MhLayers, m=0).
    */
  def mhGamma(l: Int, m: Int, j: Int): Float = 1.0f + ((l * 5 + m * 3 + j) % 5) / 8.0f
  def mhBeta(l: Int, m: Int, j: Int): Float = (((l * 7 + m * 11 + j * 3) % 5) - 2) / 8.0f

  private def mhMat(rows: Int, cols: Int, f: (Int, Int) => Float): OnnxMini.Tensor =
    OnnxMini.Tensor(Seq(rows, cols), Array.tabulate(rows * cols)(x => f(x / cols, x % cols)))
  private def mhVec(n: Int, f: Int => Float): OnnxMini.Tensor =
    OnnxMini.Tensor(Seq(n), Array.tabulate(n)(f))
  private def scalar(x: Float): OnnxMini.Tensor = OnnxMini.Tensor(Seq(1), Array(x))

  /** The multi-head graph: ids → Gather → 2 × [pre-LN MHA (packed QKV
    * MatMul → Split into 4 heads → per-head scaled softmax attention →
    * Concat → Wo projection → residual) + pre-LN GELU FFN (exact-erf
    * form: x·½·(1+erf(x/√2)) as Mul/Erf/Add/Mul/Mul nodes — how
    * opset-13 exporters serialize non-approximate GELU) + residual] →
    * final LayerNorm → ReduceMean pool. Exercises the executor's
    * multi-output Split path, Concat re-merge and Erf.
    */
  def encoderMhGraph: OnnxMini.Graph = {
    val nodes = Seq.newBuilder[OnnxMini.Node]
    val inits = Map.newBuilder[String, OnnxMini.Tensor]
    inits += "emb_table" -> mhMat(VocabSize, MhModelDims, mhEmb)
    inits += "inv_sqrt_dh" -> scalar((1.0 / math.sqrt(MhHeadDims)).toFloat)
    inits += "inv_sqrt2" -> scalar((1.0 / math.sqrt(2.0)).toFloat)
    inits += "one" -> scalar(1.0f)
    inits += "half" -> scalar(0.5f)
    nodes += OnnxMini.Node("Gather", Seq("emb_table", "ids"), Seq("x0"),
      Map("axis" -> OnnxMini.Attr(i = Some(0L))))
    (0 until MhLayers).foreach { l =>
      val x = s"x$l"
      inits += s"ln1_g$l" -> mhVec(MhModelDims, mhGamma(l, 0, _))
      inits += s"ln1_b$l" -> mhVec(MhModelDims, mhBeta(l, 0, _))
      inits += s"Wq$l" -> mhMat(MhModelDims, MhModelDims, mhW(l, 0, _, _))
      inits += s"Wk$l" -> mhMat(MhModelDims, MhModelDims, mhW(l, 1, _, _))
      inits += s"Wv$l" -> mhMat(MhModelDims, MhModelDims, mhW(l, 2, _, _))
      inits += s"Wo$l" -> mhMat(MhModelDims, MhModelDims, mhW(l, 3, _, _))
      inits += s"ln2_g$l" -> mhVec(MhModelDims, mhGamma(l, 1, _))
      inits += s"ln2_b$l" -> mhVec(MhModelDims, mhBeta(l, 1, _))
      inits += s"Wf1$l" -> mhMat(MhModelDims, MhFfnDims, mhW(l, 4, _, _))
      inits += s"bf1$l" -> mhVec(MhFfnDims, mhB(l, 0, _))
      inits += s"Wf2$l" -> mhMat(MhFfnDims, MhModelDims, mhW(l, 5, _, _))
      inits += s"bf2$l" -> mhVec(MhModelDims, mhB(l, 1, _))
      nodes += OnnxMini.Node("LayerNormalization", Seq(x, s"ln1_g$l", s"ln1_b$l"), Seq(s"a$l"),
        Map("epsilon" -> OnnxMini.Attr(f = Some(1e-5f))))
      Seq("q", "k", "v").zipWithIndex.foreach { case (p, _) =>
        nodes += OnnxMini.Node("MatMul", Seq(s"a$l", s"W$p$l"), Seq(s"$p$l"))
        nodes += OnnxMini.Node("Split", Seq(s"$p$l"),
          (0 until MhHeads).map(h => s"$p${l}_$h"),
          Map("axis" -> OnnxMini.Attr(i = Some(1L))))
      }
      (0 until MhHeads).foreach { h =>
        nodes += OnnxMini.Node("Transpose", Seq(s"k${l}_$h"), Seq(s"kt${l}_$h"),
          Map("perm" -> OnnxMini.Attr(ints = Seq(1L, 0L))))
        nodes += OnnxMini.Node("MatMul", Seq(s"q${l}_$h", s"kt${l}_$h"), Seq(s"s0_${l}_$h"))
        nodes += OnnxMini.Node("Mul", Seq(s"s0_${l}_$h", "inv_sqrt_dh"), Seq(s"s1_${l}_$h"))
        nodes += OnnxMini.Node("Softmax", Seq(s"s1_${l}_$h"), Seq(s"att${l}_$h"),
          Map("axis" -> OnnxMini.Attr(i = Some(-1L))))
        nodes += OnnxMini.Node("MatMul", Seq(s"att${l}_$h", s"v${l}_$h"), Seq(s"ctx${l}_$h"))
      }
      nodes += OnnxMini.Node("Concat", (0 until MhHeads).map(h => s"ctx${l}_$h"), Seq(s"cc$l"),
        Map("axis" -> OnnxMini.Attr(i = Some(1L))))
      nodes += OnnxMini.Node("MatMul", Seq(s"cc$l", s"Wo$l"), Seq(s"proj$l"))
      nodes += OnnxMini.Node("Add", Seq(x, s"proj$l"), Seq(s"r1_$l"))
      nodes += OnnxMini.Node("LayerNormalization", Seq(s"r1_$l", s"ln2_g$l", s"ln2_b$l"), Seq(s"n2_$l"),
        Map("epsilon" -> OnnxMini.Attr(f = Some(1e-5f))))
      nodes += OnnxMini.Node("MatMul", Seq(s"n2_$l", s"Wf1$l"), Seq(s"f0_$l"))
      nodes += OnnxMini.Node("Add", Seq(s"f0_$l", s"bf1$l"), Seq(s"f1_$l"))
      nodes += OnnxMini.Node("Mul", Seq(s"f1_$l", "inv_sqrt2"), Seq(s"g0_$l"))
      nodes += OnnxMini.Node("Erf", Seq(s"g0_$l"), Seq(s"g1_$l"))
      nodes += OnnxMini.Node("Add", Seq(s"g1_$l", "one"), Seq(s"g2_$l"))
      nodes += OnnxMini.Node("Mul", Seq(s"f1_$l", s"g2_$l"), Seq(s"g3_$l"))
      nodes += OnnxMini.Node("Mul", Seq(s"g3_$l", "half"), Seq(s"g4_$l"))
      nodes += OnnxMini.Node("MatMul", Seq(s"g4_$l", s"Wf2$l"), Seq(s"f3_$l"))
      nodes += OnnxMini.Node("Add", Seq(s"f3_$l", s"bf2$l"), Seq(s"f4_$l"))
      nodes += OnnxMini.Node("Add", Seq(s"r1_$l", s"f4_$l"), Seq(s"x${l + 1}"))
    }
    inits += "lnf_g" -> mhVec(MhModelDims, mhGamma(MhLayers, 0, _))
    inits += "lnf_b" -> mhVec(MhModelDims, mhBeta(MhLayers, 0, _))
    nodes += OnnxMini.Node("LayerNormalization", Seq(s"x$MhLayers", "lnf_g", "lnf_b"), Seq("nf"),
      Map("epsilon" -> OnnxMini.Attr(f = Some(1e-5f))))
    nodes += OnnxMini.Node("ReduceMean", Seq("nf"), Seq("out"),
      Map("axes" -> OnnxMini.Attr(ints = Seq(0L))))
    OnnxMini.Graph(nodes.result(), inits.result(), inputName = "ids", outputName = "out")
  }

  /** Score head [16×1] for the cross-encoder, entries in [-2, 2]. */
  def wScore(j: Int): Int = ((j * 23) % 5) - 2

  /** The id reserved as the query/document SEPARATOR in the joint
    * cross-encoder sequence (BERT's [SEP] analog): the top of the
    * vocabulary, which the subword hasher never emits (it floorMods
    * into [0, VocabSize−1) — see
    * [[graft.operators.Featurize.encoderEmbedder]]).
    */
  val SepId: Int = VocabSize - 1

  /** A CROSS-ENCODER reranker: the [[encoderGraph]] transformer over
    * the JOINT `query ⊕ [SEP] ⊕ document` id sequence — attention
    * mixes query and document tokens in one pass, which is exactly
    * what a bi-encoder (two independent towers + cosine) structurally
    * cannot do — then the pooled vector projects through a [16×1]
    * score head to ONE scalar. The standard two-stage serving shape:
    * cheap retrieval finds candidates, this scores each (query, doc)
    * pair jointly (reference: embedder.py's model seam; the head is
    * the only topology difference from `embed_encoder.onnx`).
    */
  def crossEncoderGraph: OnnxMini.Graph = {
    val base = encoderGraph
    OnnxMini.Graph(
      nodes = base.nodes.map(n =>
        if (n.outputs == Seq("out")) n.copy(outputs = Seq("pooled")) else n) :+
        OnnxMini.Node("MatMul", Seq("pooled", "w_score"), Seq("out")),
      initializers = base.initializers +
        ("w_score" -> OnnxMini.Tensor(Seq(HeadDims, 1),
          Array.tabulate(HeadDims)(wScore(_).toFloat))),
      inputName = "ids",
      outputName = "out")
  }

  /** The graph MakeOnnx serializes: bow[1,64] → MatMul W1 → Add b1 →
    * Relu → MatMul W2 → Add b2 → out.
    */
  def graph: OnnxMini.Graph = OnnxMini.Graph(
    nodes = Seq(
      OnnxMini.Node("MatMul", Seq("bow", "W1"), Seq("h0")),
      OnnxMini.Node("Add", Seq("h0", "b1"), Seq("h1")),
      OnnxMini.Node("Relu", Seq("h1"), Seq("h")),
      OnnxMini.Node("MatMul", Seq("h", "W2"), Seq("o0")),
      OnnxMini.Node("Add", Seq("o0", "b2"), Seq("out"))),
    initializers = Map(
      "W1" -> OnnxMini.Tensor(Seq(InputDims, HiddenDims),
        Array.tabulate(InputDims * HiddenDims)(x => w1(x / HiddenDims, x % HiddenDims).toFloat)),
      "b1" -> OnnxMini.Tensor(Seq(HiddenDims), Array.tabulate(HiddenDims)(b1(_).toFloat)),
      "W2" -> OnnxMini.Tensor(Seq(HiddenDims, InputDims),
        Array.tabulate(HiddenDims * InputDims)(x => w2(x / InputDims, x % InputDims).toFloat)),
      "b2" -> OnnxMini.Tensor(Seq(InputDims), Array.tabulate(InputDims)(b2(_).toFloat))),
    inputName = "bow",
    outputName = "out")
}
