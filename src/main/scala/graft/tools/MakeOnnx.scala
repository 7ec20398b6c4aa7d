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

    // third artifact: the token-sequence encoder
    val encOut = out.replace("embed_mlp.onnx", "embed_encoder.onnx")
    val encBytes = OnnxMini.write(OnnxFixture.encoderGraph)
    java.nio.file.Files.write(java.nio.file.Paths.get(encOut), encBytes)
    val ge = OnnxMini.parse(encBytes)
    require(ge.nodes.head.opType == "Gather" &&
      ge.nodes.head.attrs("axis").i.contains(0L) &&
      ge.nodes.last.attrs("axes").ints == Seq(0L),
      "encoder attributes must survive the wire round-trip")
    // a 7-token and a 1-token probe (dynamic sequence length)
    val e7 = OnnxMini.run2d(ge, OnnxMini.Mat(7, 1, Array.tabulate(7)(i => (i * 31 % 256).toDouble)))
    val e1 = OnnxMini.run2d(ge, OnnxMini.Mat(1, 1, Array(5.0)))
    require(e7.cols == OnnxFixture.HeadDims && e1.cols == OnnxFixture.HeadDims)
    println(s"[make-onnx] ${encBytes.length} bytes, ${ge.initializers.size} initializers, " +
      s"enc out[0..3] = ${e7.data.take(4).mkString(", ")} -> $encOut")

    // fifth artifact: the multi-head 2-layer pre-LN GELU encoder
    val mhOut = out.replace("embed_mlp.onnx", "embed_encoder_mh.onnx")
    val mhBytes = OnnxMini.write(OnnxFixture.encoderMhGraph)
    java.nio.file.Files.write(java.nio.file.Paths.get(mhOut), mhBytes)
    val gm = OnnxMini.parse(mhBytes)
    require(gm.nodes.count(_.opType == "Split") == 3 * OnnxFixture.MhLayers &&
      gm.nodes.count(_.opType == "Erf") == OnnxFixture.MhLayers &&
      gm.nodes.count(_.opType == "Concat") == OnnxFixture.MhLayers,
      "multi-head encoder ops must survive the wire round-trip")
    val m9 = OnnxMini.run2d(gm, OnnxMini.Mat(9, 1, Array.tabulate(9)(i => (i * 53 % 256).toDouble)))
    val m1 = OnnxMini.run2d(gm, OnnxMini.Mat(1, 1, Array(17.0)))
    require(m9.cols == OnnxFixture.MhModelDims && m1.cols == OnnxFixture.MhModelDims)
    println(s"[make-onnx] ${mhBytes.length} bytes, ${gm.initializers.size} initializers, " +
      s"mh out[0..3] = ${m9.data.take(4).mkString(", ")} -> $mhOut")

    // fourth artifact: the cross-encoder reranker (encoder + score head)
    val ceOut = out.replace("embed_mlp.onnx", "cross_encoder.onnx")
    val ceBytes = OnnxMini.write(OnnxFixture.crossEncoderGraph)
    java.nio.file.Files.write(java.nio.file.Paths.get(ceOut), ceBytes)
    val gc = OnnxMini.parse(ceBytes)
    require(gc.nodes.last.opType == "MatMul" && gc.initializers.contains("w_score"))
    val c1 = OnnxMini.run2d(gc, OnnxMini.Mat(5, 1,
      Array(3.0, 9.0, OnnxFixture.SepId.toDouble, 11.0, 40.0)))
    require(c1.rows == 1 && c1.cols == 1, s"cross-encoder must emit one scalar, got ${c1.rows}x${c1.cols}")
    println(s"[make-onnx] ${ceBytes.length} bytes, ${gc.initializers.size} initializers, " +
      s"ce score = ${c1.data(0)} -> $ceOut")
  }
}
