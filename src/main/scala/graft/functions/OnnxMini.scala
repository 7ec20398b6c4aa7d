package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM ONNX reader/writer/executor for small feed-forward
  * models — enough to drive a REAL serialized-model artifact through
  * [[graft.operators.Featurize.embedWithModel]]'s per-partition session
  * lifecycle in a container with no onnxruntime jar.
  *
  * Everything here is public knowledge: the protobuf wire format
  * (varint / length-delimited fields) and the onnx.proto schema
  * (ModelProto field 7 = GraphProto; GraphProto 1 = node,
  * 5 = initializer, 11/12 = input/output; NodeProto 1/2/4 =
  * inputs/outputs/op_type; TensorProto 1/2/8/9 =
  * dims/data_type/name/raw_data). Supported ops: MatMul, Add, Relu —
  * the 2-layer MLP surface; anything else fails loudly.
  *
  * This is NOT a general ONNX runtime and does not pretend to be one:
  * it exists so the embedding seam exercises a genuine model FILE
  * (load once per partition, score row after row) rather than a Scala
  * closure, with the swap to a real runtime being a one-line factory
  * change (reference: embedder.py:21-60, fastembed/ONNX).
  */
object OnnxMini {

  final case class Tensor(dims: Seq[Int], data: Array[Float])
  final case class Node(opType: String, inputs: Seq[String], outputs: Seq[String])
  final case class Graph(
      nodes: Seq[Node],
      initializers: Map[String, Tensor],
      inputName: String,
      outputName: String)

  // ---------------------------------------------------------------- wire

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
        (b & 0x80) != 0
      }) ()
      v
    }
    /** Returns (fieldNumber, wireType). */
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    def lenDelimited(): (Int, Int) = { // (start, end) of the payload
      val len = varint().toInt
      val s = pos; pos += len; (s, s + len)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(): Unit
      case 1 => pos += 8
      case 2 => lenDelimited(): Unit
      case 5 => pos += 4
      case w => sys.error(s"onnx-mini: unsupported wire type $w")
    }
    def str(s: Int, e: Int): String = new String(buf, s, e - s, "UTF-8")
  }

  def parse(bytes: Array[Byte]): Graph = {
    var graph: Option[Graph] = None
    val r = new Reader(bytes, 0, bytes.length)
    while (r.hasNext) r.tag() match {
      case (7, 2) => val (s, e) = r.lenDelimited(); graph = Some(parseGraph(bytes, s, e))
      case (_, w) => r.skip(w)
    }
    graph.getOrElse(sys.error("onnx-mini: no GraphProto in model"))
  }

  private def parseGraph(buf: Array[Byte], start: Int, end: Int): Graph = {
    val nodes = Seq.newBuilder[Node]
    val inits = Map.newBuilder[String, Tensor]
    var input: Option[String] = None
    var output: Option[String] = None
    val r = new Reader(buf, start, end)
    while (r.hasNext) r.tag() match {
      case (1, 2)  => val (s, e) = r.lenDelimited(); nodes += parseNode(buf, s, e)
      case (5, 2)  => val (s, e) = r.lenDelimited(); val t = parseTensor(buf, s, e); inits += t
      case (11, 2) => val (s, e) = r.lenDelimited(); input = input.orElse(Some(valueInfoName(buf, s, e)))
      case (12, 2) => val (s, e) = r.lenDelimited(); output = Some(valueInfoName(buf, s, e))
      case (_, w)  => r.skip(w)
    }
    Graph(nodes.result(), inits.result(),
      input.getOrElse(sys.error("onnx-mini: graph has no input")),
      output.getOrElse(sys.error("onnx-mini: graph has no output")))
  }

  private def parseNode(buf: Array[Byte], start: Int, end: Int): Node = {
    val ins = Seq.newBuilder[String]; val outs = Seq.newBuilder[String]
    var op = ""
    val r = new Reader(buf, start, end)
    while (r.hasNext) r.tag() match {
      case (1, 2) => val (s, e) = r.lenDelimited(); ins += r.str(s, e)
      case (2, 2) => val (s, e) = r.lenDelimited(); outs += r.str(s, e)
      case (4, 2) => val (s, e) = r.lenDelimited(); op = r.str(s, e)
      case (_, w) => r.skip(w)
    }
    Node(op, ins.result(), outs.result())
  }

  private def parseTensor(buf: Array[Byte], start: Int, end: Int): (String, Tensor) = {
    val dims = Seq.newBuilder[Int]
    var name = ""; var dataType = 0L; var raw: Array[Float] = Array.empty
    val r = new Reader(buf, start, end)
    while (r.hasNext) r.tag() match {
      case (1, 0) => dims += r.varint().toInt
      case (2, 0) => dataType = r.varint()
      case (8, 2) => val (s, e) = r.lenDelimited(); name = r.str(s, e)
      case (9, 2) => // raw_data: packed little-endian float32
        val (s, e) = r.lenDelimited()
        val bb = ByteBuffer.wrap(buf, s, e - s).order(ByteOrder.LITTLE_ENDIAN)
        raw = Array.fill((e - s) / 4)(bb.getFloat)
      case (4, 2) => // packed float_data
        val (s, e) = r.lenDelimited()
        val bb = ByteBuffer.wrap(buf, s, e - s).order(ByteOrder.LITTLE_ENDIAN)
        raw = Array.fill((e - s) / 4)(bb.getFloat)
      case (_, w) => r.skip(w)
    }
    require(dataType == 1, s"onnx-mini: tensor $name is not FLOAT (type $dataType)")
    name -> Tensor(dims.result(), raw)
  }

  private def valueInfoName(buf: Array[Byte], start: Int, end: Int): String = {
    val r = new Reader(buf, start, end)
    var name = ""
    while (r.hasNext) r.tag() match {
      case (1, 2) => val (s, e) = r.lenDelimited(); name = r.str(s, e)
      case (_, w) => r.skip(w)
    }
    name
  }

  // ---------------------------------------------------------------- exec

  /** Execute the graph on a single row vector bound to the graph input.
    * Nodes are evaluated in file order (ONNX graphs are topologically
    * sorted by spec). All math in double.
    */
  def run(g: Graph, input: Array[Double]): Array[Double] = {
    val env = scala.collection.mutable.Map[String, Array[Double]](g.inputName -> input)
    def tensorOf(name: String): Array[Double] =
      env.getOrElse(name, g.initializers(name).data.map(_.toDouble))
    g.nodes.foreach { n =>
      val out = n.opType match {
        case "MatMul" =>
          val a = tensorOf(n.inputs(0))
          val w = g.initializers(n.inputs(1))
          val rows = w.dims(0); val cols = w.dims(1)
          require(a.length == rows, s"onnx-mini: MatMul ${a.length} vs $rows x $cols")
          val o = new Array[Double](cols)
          var i = 0
          while (i < rows) {
            val ai = a(i)
            if (ai != 0.0) {
              var j = 0
              while (j < cols) { o(j) += ai * w.data(i * cols + j); j += 1 }
            }
            i += 1
          }
          o
        case "Add" =>
          val a = tensorOf(n.inputs(0)); val b = tensorOf(n.inputs(1))
          require(a.length == b.length, "onnx-mini: Add shape mismatch")
          Array.tabulate(a.length)(i => a(i) + b(i))
        case "Relu" =>
          tensorOf(n.inputs(0)).map(x => if (x > 0) x else 0.0)
        case other => sys.error(s"onnx-mini: unsupported op $other")
      }
      env(n.outputs.head) = out
    }
    env.getOrElse(g.outputName, sys.error(s"onnx-mini: output ${g.outputName} never produced"))
  }

  /** Load + parse a classpath resource (the per-partition "session"). */
  def load(resource: String): Graph = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"onnx-mini: resource $resource missing — run graft.tools.MakeOnnx")
    try parse(in.readAllBytes()) finally in.close()
  }

  // ---------------------------------------------------------------- write

  private final class Writer {
    private val out = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field.toLong << 3) | wire)
    def bytesField(field: Int, b: Array[Byte]): Unit = { tag(field, 2); varint(b.length); out.write(b) }
    def strField(field: Int, s: String): Unit = bytesField(field, s.getBytes("UTF-8"))
    def varintField(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def toBytes: Array[Byte] = out.toByteArray
  }

  private def tensorBytes(name: String, t: Tensor): Array[Byte] = {
    val w = new Writer
    t.dims.foreach(d => w.varintField(1, d.toLong))
    w.varintField(2, 1L) // FLOAT
    w.strField(8, name)
    val bb = ByteBuffer.allocate(4 * t.data.length).order(ByteOrder.LITTLE_ENDIAN)
    t.data.foreach(bb.putFloat)
    w.bytesField(9, bb.array())
    w.toBytes
  }

  private def nodeBytes(n: Node): Array[Byte] = {
    val w = new Writer
    n.inputs.foreach(w.strField(1, _))
    n.outputs.foreach(w.strField(2, _))
    w.strField(4, n.opType)
    w.toBytes
  }

  private def valueInfoBytes(name: String): Array[Byte] = {
    val w = new Writer
    w.strField(1, name)
    w.toBytes
  }

  /** Serialize a [[Graph]] as a ModelProto (ir_version 8, opset 13). */
  def write(g: Graph): Array[Byte] = {
    val gw = new Writer
    g.nodes.foreach(n => gw.bytesField(1, nodeBytes(n)))
    gw.strField(2, "graft-embed-mlp")
    g.initializers.toSeq.sortBy(_._1).foreach { case (n, t) => gw.bytesField(5, tensorBytes(n, t)) }
    gw.bytesField(11, valueInfoBytes(g.inputName))
    gw.bytesField(12, valueInfoBytes(g.outputName))
    val mw = new Writer
    mw.varintField(1, 8L) // ir_version
    val op = new Writer
    op.strField(1, "") // default domain
    op.varintField(2, 13L)
    mw.bytesField(8, op.toBytes) // opset_import
    mw.bytesField(7, gw.toBytes) // graph
    mw.toBytes
  }
}
