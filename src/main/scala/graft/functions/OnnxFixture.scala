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
