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
  * dims/data_type/name/raw_data; NodeProto 5 = AttributeProto with
  * name=1/f=2/i=3/ints=8). Supported ops: MatMul (activation ×
  * weight AND activation × activation), Add (same-shape residual,
  * row-broadcast bias, or scalar), Mul (same-shape or scalar), Relu,
  * Erf (the exact-GELU primitive: GELU(x) = x·½·(1+erf(x/√2)) is
  * expressed as Mul/Erf/Add nodes, exactly how exporters serialize
  * non-approximate GELU in opset 13), Transpose, Softmax (rows, the
  * opset-13 axis=-1 default), LayerNormalization (opset-17 form:
  * X/scale/bias, epsilon attribute), Reshape (INT64 shape tensor, one
  * -1 wildcard), Gather (axis-0 embedding-table lookup by a rank-1 id
  * list), ReduceMean (axes attribute), Split (axis 1 into equal
  * column blocks — the MULTI-HEAD slicing path; the executor's one
  * multi-output op) and Concat (axis 1 — head re-merge) — enough for
  * an MLP, a MULTI-HEAD multi-layer pre-LN TRANSFORMER encoder (QKV
  * projections → per-head scaled scores → softmax → context → concat
  * → output projection → residual, GELU FFN), or a token-sequence
  * ENCODER (id list → Gather embeddings → attention blocks →
  * mean-pool); anything else fails loudly.
  *
  * This is NOT a general ONNX runtime and does not pretend to be one:
  * it exists so the embedding seam exercises a genuine model FILE
  * (load once per partition, score row after row) rather than a Scala
  * closure, with the swap to a real runtime being a one-line factory
  * change (reference: embedder.py:21-60, fastembed/ONNX).
  */
object OnnxMini {

  /** dtype: 1 = FLOAT (the default), 7 = INT64 (Reshape shape tensors —
    * values held as floats, exact for the small shape ints involved).
    */
  final case class Tensor(dims: Seq[Int], data: Array[Float], dtype: Int = 1)

  /** The AttributeProto subset these models use: single int (`i`),
    * single float (`f`), int list (`ints`). Field numbers from the
    * public onnx.proto: name=1, f=2, i=3, ints=8, type=20.
    */
  final case class Attr(
      i: Option[Long] = None,
      f: Option[Float] = None,
      ints: Seq[Long] = Nil)

  final case class Node(
      opType: String,
      inputs: Seq[String],
      outputs: Seq[String],
      attrs: Map[String, Attr] = Map.empty) {
    def attrInt(name: String, default: Long): Long =
      attrs.get(name).flatMap(_.i).getOrElse(default)
    def attrFloat(name: String, default: Float): Float =
      attrs.get(name).flatMap(_.f).getOrElse(default)
    def attrInts(name: String): Option[Seq[Long]] = attrs.get(name).map(_.ints)
  }
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
    val attrs = Map.newBuilder[String, Attr]
    var op = ""
    val r = new Reader(buf, start, end)
    while (r.hasNext) r.tag() match {
      case (1, 2) => val (s, e) = r.lenDelimited(); ins += r.str(s, e)
      case (2, 2) => val (s, e) = r.lenDelimited(); outs += r.str(s, e)
      case (4, 2) => val (s, e) = r.lenDelimited(); op = r.str(s, e)
      case (5, 2) => val (s, e) = r.lenDelimited(); attrs += parseAttr(buf, s, e)
      case (_, w) => r.skip(w)
    }
    Node(op, ins.result(), outs.result(), attrs.result())
  }

  private def parseAttr(buf: Array[Byte], start: Int, end: Int): (String, Attr) = {
    var name = ""; var i: Option[Long] = None; var f: Option[Float] = None
    val ints = Seq.newBuilder[Long]
    val r = new Reader(buf, start, end)
    while (r.hasNext) r.tag() match {
      case (1, 2) => val (s, e) = r.lenDelimited(); name = r.str(s, e)
      case (2, 5) => // f: fixed32 float
        f = Some(java.lang.Float.intBitsToFloat(
          ByteBuffer.wrap(buf, r.pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt))
        r.pos += 4
      case (3, 0) => i = Some(r.varint())
      case (8, 0) => ints += r.varint() // repeated int64, unpacked
      case (8, 2) => // repeated int64, packed
        val (s, e) = r.lenDelimited()
        val rr = new Reader(buf, s, e)
        while (rr.hasNext) ints += rr.varint()
      case (_, w) => r.skip(w)
    }
    name -> Attr(i, f, ints.result())
  }

  private def parseTensor(buf: Array[Byte], start: Int, end: Int): (String, Tensor) = {
    val dims = Seq.newBuilder[Int]
    var name = ""; var dataType = 0L; var raw: Array[Float] = Array.empty
    var rawBytes: (Array[Byte], Int, Int) = null // kept for INT64 re-decode
    val r = new Reader(buf, start, end)
    while (r.hasNext) r.tag() match {
      case (1, 0) => dims += r.varint().toInt
      case (2, 0) => dataType = r.varint()
      case (8, 2) => val (s, e) = r.lenDelimited(); name = r.str(s, e)
      case (9, 2) => // raw_data: packed little-endian (float32 or int64)
        val (s, e) = r.lenDelimited()
        rawBytes = (buf, s, e - s)
        val bb = ByteBuffer.wrap(buf, s, e - s).order(ByteOrder.LITTLE_ENDIAN)
        raw = Array.fill((e - s) / 4)(bb.getFloat)
      case (4, 2) => // packed float_data
        val (s, e) = r.lenDelimited()
        val bb = ByteBuffer.wrap(buf, s, e - s).order(ByteOrder.LITTLE_ENDIAN)
        raw = Array.fill((e - s) / 4)(bb.getFloat)
      case (_, w) => r.skip(w)
    }
    dataType match {
      case 1 => // FLOAT — raw already decoded above
      case 7 => // INT64 (Reshape shape tensors): re-decode raw_data as longs
        if (rawBytes != null) {
          val bb = ByteBuffer.wrap(rawBytes._1, rawBytes._2, rawBytes._3)
            .order(ByteOrder.LITTLE_ENDIAN)
          raw = Array.fill(rawBytes._3 / 8)(bb.getLong.toFloat)
        }
      case t => sys.error(s"onnx-mini: tensor $name has unsupported type $t")
    }
    name -> Tensor(dims.result(), raw, dataType.toInt)
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

  /** 2-D activation: `data` is row-major `rows × cols`. A vector is a
    * 1×n matrix; [[run]] flattens the final output back to a vector.
    */
  final case class Mat(rows: Int, cols: Int, data: Array[Double])

  /** Execute the graph on a single row vector bound to the graph input.
    * Nodes are evaluated in file order (ONNX graphs are topologically
    * sorted by spec). All math in double.
    */
  def run(g: Graph, input: Array[Double]): Array[Double] =
    run2d(g, Mat(1, input.length, input)).data

  def run2d(g: Graph, input: Mat): Mat = {
    val env = scala.collection.mutable.Map[String, Mat](g.inputName -> input)
    def mat(name: String): Mat =
      env.getOrElse(name, {
        val t = g.initializers(name)
        val (r, c) = t.dims match {
          case Seq(n)    => (1, n)
          case Seq(r, c) => (r, c)
          case d         => sys.error(s"onnx-mini: tensor $name has rank ${d.size} > 2")
        }
        Mat(r, c, t.data.map(_.toDouble))
      })
    def matmul(a: Mat, b: Mat): Mat = {
      require(a.cols == b.rows, s"onnx-mini: MatMul ${a.rows}x${a.cols} vs ${b.rows}x${b.cols}")
      val o = new Array[Double](a.rows * b.cols)
      var r = 0
      while (r < a.rows) {
        var i = 0
        while (i < a.cols) {
          val ai = a.data(r * a.cols + i)
          if (ai != 0.0) {
            var j = 0
            while (j < b.cols) { o(r * b.cols + j) += ai * b.data(i * b.cols + j); j += 1 }
          }
          i += 1
        }
        r += 1
      }
      Mat(a.rows, b.cols, o)
    }
    g.nodes.foreach { n =>
      // Split is the one multi-output op: equal column blocks along
      // axis 1 — the multi-head slicing path (head h reads columns
      // [h·dh, (h+1)·dh) of the packed QKV projection).
      if (n.opType == "Split") {
        require(n.attrInt("axis", 1L) == 1L, "onnx-mini: Split supports only axis 1")
        val a = mat(n.inputs(0))
        val h = n.outputs.length
        require(h > 0 && a.cols % h == 0,
          s"onnx-mini: Split ${a.cols} cols into $h equal parts")
        val dh = a.cols / h
        n.outputs.zipWithIndex.foreach { case (name, part) =>
          val o = new Array[Double](a.rows * dh)
          var r = 0
          while (r < a.rows) {
            System.arraycopy(a.data, r * a.cols + part * dh, o, r * dh, dh)
            r += 1
          }
          env(name) = Mat(a.rows, dh, o)
        }
      } else {
      val out = n.opType match {
        case "MatMul" => matmul(mat(n.inputs(0)), mat(n.inputs(1)))
        case "Add" =>
          val a = mat(n.inputs(0)); val b = mat(n.inputs(1))
          if (b.data.length == 1) // scalar broadcast (the GELU "+1")
            Mat(a.rows, a.cols, a.data.map(_ + b.data(0)))
          else if (a.rows == b.rows && a.cols == b.cols)
            Mat(a.rows, a.cols, Array.tabulate(a.data.length)(i => a.data(i) + b.data(i)))
          else if (b.rows == 1 && b.cols == a.cols) // bias broadcast over rows
            Mat(a.rows, a.cols,
              Array.tabulate(a.data.length)(i => a.data(i) + b.data(i % a.cols)))
          else sys.error(s"onnx-mini: Add ${a.rows}x${a.cols} vs ${b.rows}x${b.cols}")
        case "Mul" =>
          val a = mat(n.inputs(0)); val b = mat(n.inputs(1))
          if (b.data.length == 1)
            Mat(a.rows, a.cols, a.data.map(_ * b.data(0)))
          else {
            require(a.rows == b.rows && a.cols == b.cols, "onnx-mini: Mul shape mismatch")
            Mat(a.rows, a.cols, Array.tabulate(a.data.length)(i => a.data(i) * b.data(i)))
          }
        case "Relu" =>
          val a = mat(n.inputs(0))
          Mat(a.rows, a.cols, a.data.map(x => if (x > 0) x else 0.0))
        case "Erf" => // element-wise; with Mul/Add this is exact GELU
          val a = mat(n.inputs(0))
          Mat(a.rows, a.cols,
            a.data.map(org.apache.commons.math3.special.Erf.erf))
        case "Concat" => // axis 1: column-wise head re-merge
          require(n.attrInt("axis", 1L) == 1L, "onnx-mini: Concat supports only axis 1")
          val parts = n.inputs.map(mat)
          val rows = parts.head.rows
          require(parts.forall(_.rows == rows), "onnx-mini: Concat row mismatch")
          val cols = parts.map(_.cols).sum
          val o = new Array[Double](rows * cols)
          var off = 0
          parts.foreach { p =>
            var r = 0
            while (r < rows) {
              System.arraycopy(p.data, r * p.cols, o, r * cols + off, p.cols)
              r += 1
            }
            off += p.cols
          }
          Mat(rows, cols, o)
        case "Transpose" => // 2-D only: perm defaults to reverse
          require(n.attrInts("perm").forall(_ == Seq(1L, 0L)),
            "onnx-mini: Transpose supports only the 2-D swap perm")
          val a = mat(n.inputs(0))
          Mat(a.cols, a.rows,
            Array.tabulate(a.data.length)(i => a.data((i % a.rows) * a.cols + i / a.rows)))
        case "Gather" => // axis-0 table lookup: data[V×C] indexed by a rank-1 id list
          require(n.attrInt("axis", 0L) == 0L, "onnx-mini: Gather supports only axis 0")
          val table = mat(n.inputs(0))
          val ids = mat(n.inputs(1)).data
          val o = new Array[Double](ids.length * table.cols)
          var r = 0
          while (r < ids.length) {
            val v = ids(r)
            require(v == math.rint(v) && v >= 0 && v < table.rows,
              s"onnx-mini: Gather index $v out of [0, ${table.rows})")
            System.arraycopy(table.data, v.toInt * table.cols, o, r * table.cols, table.cols)
            r += 1
          }
          Mat(ids.length, table.cols, o)
        case "ReduceMean" => // opset-13 axes attribute; keepdims default 1
          val a = mat(n.inputs(0))
          val axes = n.attrInts("axes").getOrElse(Seq(0L, 1L)).map(x => if (x < 0) x + 2 else x)
          require(a.rows > 0 && a.cols > 0, "onnx-mini: ReduceMean over an empty tensor")
          axes.sorted match {
            case Seq(0L) => // column means over rows → 1×C
              val o = new Array[Double](a.cols)
              var i = 0
              while (i < a.data.length) { o(i % a.cols) += a.data(i); i += 1 }
              Mat(1, a.cols, o.map(_ / a.rows))
            case Seq(1L) => // row means → R×1
              Mat(a.rows, 1, Array.tabulate(a.rows) { r =>
                var s = 0.0; var j = 0
                while (j < a.cols) { s += a.data(r * a.cols + j); j += 1 }
                s / a.cols
              })
            case Seq(0L, 1L) =>
              Mat(1, 1, Array(a.data.sum / a.data.length))
            case other => sys.error(s"onnx-mini: ReduceMean axes $other unsupported")
          }
        case "Softmax" => // default axis=-1 (opset 13): per row
          require(Seq(-1L, 1L).contains(n.attrInt("axis", -1L)),
            "onnx-mini: Softmax supports only the last axis of a 2-D tensor")
          val a = mat(n.inputs(0))
          val o = new Array[Double](a.data.length)
          var r = 0
          while (r < a.rows) {
            var mx = Double.NegativeInfinity
            var j = 0
            while (j < a.cols) { mx = math.max(mx, a.data(r * a.cols + j)); j += 1 }
            var s = 0.0
            j = 0
            while (j < a.cols) {
              val e = math.exp(a.data(r * a.cols + j) - mx)
              o(r * a.cols + j) = e; s += e; j += 1
            }
            j = 0
            while (j < a.cols) { o(r * a.cols + j) /= s; j += 1 }
            r += 1
          }
          Mat(a.rows, a.cols, o)
        case "LayerNormalization" => // opset-17: X, scale, bias
          val a = mat(n.inputs(0))
          val scale = mat(n.inputs(1)); val bias = mat(n.inputs(2))
          require(scale.data.length == a.cols && bias.data.length == a.cols,
            "onnx-mini: LayerNormalization scale/bias must match the last axis")
          val eps = n.attrFloat("epsilon", 1e-5f).toDouble
          val o = new Array[Double](a.data.length)
          var r = 0
          while (r < a.rows) {
            var mean = 0.0
            var j = 0
            while (j < a.cols) { mean += a.data(r * a.cols + j); j += 1 }
            mean /= a.cols
            var v = 0.0
            j = 0
            while (j < a.cols) { val d = a.data(r * a.cols + j) - mean; v += d * d; j += 1 }
            val inv = 1.0 / math.sqrt(v / a.cols + eps)
            j = 0
            while (j < a.cols) {
              o(r * a.cols + j) =
                (a.data(r * a.cols + j) - mean) * inv * scale.data(j) + bias.data(j)
              j += 1
            }
            r += 1
          }
          Mat(a.rows, a.cols, o)
        case "Reshape" => // shape from an INT64 initializer; one -1 wildcard
          val a = mat(n.inputs(0))
          val shape = g.initializers(n.inputs(1)).data.map(_.toLong)
          require(shape.length <= 2, "onnx-mini: Reshape beyond rank 2")
          val known = shape.filter(_ != -1L).product
          val resolved = shape.map(d => if (d == -1L) a.data.length / known else d)
          val (r2, c2) =
            if (resolved.length == 1) (1L, resolved(0)) else (resolved(0), resolved(1))
          require(r2 * c2 == a.data.length,
            s"onnx-mini: Reshape ${a.data.length} elems to ${resolved.mkString("x")}")
          Mat(r2.toInt, c2.toInt, a.data)
        case other => sys.error(s"onnx-mini: unsupported op $other")
      }
      env(n.outputs.head) = out
      }
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
    def raw(b: Array[Byte]): Unit = out.write(b)
    def toBytes: Array[Byte] = out.toByteArray
  }

  private def tensorBytes(name: String, t: Tensor): Array[Byte] = {
    val w = new Writer
    t.dims.foreach(d => w.varintField(1, d.toLong))
    w.varintField(2, t.dtype.toLong)
    w.strField(8, name)
    val bb =
      if (t.dtype == 7) {
        val b = ByteBuffer.allocate(8 * t.data.length).order(ByteOrder.LITTLE_ENDIAN)
        t.data.foreach(f => b.putLong(f.toLong)); b
      } else {
        val b = ByteBuffer.allocate(4 * t.data.length).order(ByteOrder.LITTLE_ENDIAN)
        t.data.foreach(b.putFloat); b
      }
    w.bytesField(9, bb.array())
    w.toBytes
  }

  private def attrBytes(name: String, a: Attr): Array[Byte] = {
    val w = new Writer
    w.strField(1, name)
    a.f.foreach { f =>
      w.tag(2, 5)
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      bb.putFloat(f)
      w.raw(bb.array())
    }
    a.i.foreach(w.varintField(3, _))
    a.ints.foreach(w.varintField(8, _)) // unpacked repeated int64
    // AttributeProto.type (field 20): FLOAT=1, INT=2, INTS=7
    val t = if (a.f.isDefined) 1L else if (a.i.isDefined) 2L else 7L
    w.varintField(20, t)
    w.toBytes
  }

  private def nodeBytes(n: Node): Array[Byte] = {
    val w = new Writer
    n.inputs.foreach(w.strField(1, _))
    n.outputs.foreach(w.strField(2, _))
    w.strField(4, n.opType)
    n.attrs.toSeq.sortBy(_._1).foreach { case (name, a) => w.bytesField(5, attrBytes(name, a)) }
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
