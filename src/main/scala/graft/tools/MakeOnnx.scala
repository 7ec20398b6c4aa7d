package graft.tools

import graft.functions.{OnnxFixture, OnnxMini}

/** One-off generator for the checked-in embedding-model artifact
  * `src/main/resources/graft/embed_mlp.onnx` consumed by
  * [[graft.operators.Featurize.onnxEmbedder]]:
  *
  *   sbt "runMain graft.tools.MakeOnnx src/main/resources/graft/embed_mlp.onnx"
  *
  * The weights come from [[OnnxFixture]]'s closed-form integer
  * formulas (training decoupled from scoring, same pattern as the LM
  * and quality-classifier artifacts); the serialized file is a real
  * ONNX ModelProto a stock onnxruntime would also load.
  */
object MakeOnnx {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/main/resources/graft/embed_mlp.onnx")
    val bytes = OnnxMini.write(OnnxFixture.graph)
    java.nio.file.Files.write(java.nio.file.Paths.get(out), bytes)
    // round-trip sanity before anything is committed
    val g = OnnxMini.parse(bytes)
    require(g.nodes.map(_.opType) == Seq("MatMul", "Add", "Relu", "MatMul", "Add"))
    val probe = OnnxMini.run(g, Array.tabulate(OnnxFixture.InputDims)(i => (i % 3).toDouble))
    println(s"[make-onnx] ${bytes.length} bytes, ${g.initializers.size} initializers, " +
      s"probe out[0..3] = ${probe.take(4).mkString(", ")} -> $out")

    // second artifact: the single-head transformer block
    val attnOut = out.replace("embed_mlp.onnx", "embed_attn.onnx")
    val attnBytes = OnnxMini.write(OnnxFixture.attentionGraph)
    java.nio.file.Files.write(java.nio.file.Paths.get(attnOut), attnBytes)
    val ga = OnnxMini.parse(attnBytes)
    require(ga.nodes.map(_.opType).toSet ==
      Set("Reshape", "MatMul", "Transpose", "Mul", "Softmax", "Add",
        "LayerNormalization", "Relu"))
    val aProbe = OnnxMini.run(ga, Array.tabulate(OnnxFixture.InputDims)(i => (i % 3).toDouble))
    require(aProbe.length == OnnxFixture.InputDims)
    println(s"[make-onnx] ${attnBytes.length} bytes, ${ga.initializers.size} initializers, " +
      s"attn out[0..3] = ${aProbe.take(4).mkString(", ")} -> $attnOut")
  }
}
