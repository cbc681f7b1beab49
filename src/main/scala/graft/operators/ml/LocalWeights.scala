package graft.operators.ml

import graft.operators.image.BatchInference
import org.apache.spark.sql.SparkSession

/** The REAL-WEIGHTS loading seam for the embedding towers — the honest
  * gap behind A13 made as small as a zero-egress build allows: the
  * reference loads pretrained OpenCLIP weights at operator init
  * (operators/refiners/image_clip_embedding.py:12-25); here a
  * production user drops a weights FILE next to the job and the batched
  * [[BatchInference]] slot serves it — no recompile, no new jar. The
  * in-repo trained PCA ([[TrainedEmbedding.projection]]) stays the
  * default/test path and is itself expressible in (and round-trips
  * through) this format, which is what the spec gates.
  *
  * Format — `graft-weights` v1, plain text, whitespace-separated,
  * `#` comments, doubles via `Double.toString` (lossless round-trip):
  * {{{
  * graft-weights 1
  * input <dim>
  * standardize            # z = (x - m)/s, s <= 1e-9 guards to 0
  * m <dim doubles>
  * s <dim doubles>
  * dense <out> <linear|relu|tanh>
  * w <in doubles>         # one line per OUTPUT unit, in declared order
  * ... (<out> w lines)
  * b <out doubles>
  * l2norm                 # optional, once, last
  * }}}
  *
  * Deliberately NOT a tensor zoo: a flat MLP head (standardize/dense/
  * activation/l2norm) is what sits between a frozen encoder's features
  * and an embedding, and every number is inspectable text. A real CLIP
  * tower swaps the FEATURE function (the JNI/ONNX forward) and keeps
  * this head format for its projection — the seam's boundary is the
  * [[BatchInference.Kernel]] type either way.
  *
  * Files load through the Hadoop filesystem, so the same path works on
  * file://, hdfs:// or s3a://; the parsed model is a small serializable
  * value captured by the kernel closure (broadcast-by-closure — weights
  * are head-sized, not corpus-sized). */
object LocalWeights {

  sealed trait Layer extends Serializable {
    def forward(x: Array[Double]): Array[Double]
  }

  /** z = (x − m)/s with the [[EmbeddingProjection]] zero-variance
    * guard — kept a DISTINCT layer kind (not folded into an affine
    * dense) so a projection exported to a file reproduces the in-repo
    * arithmetic bit-for-bit: (x−m)/s and x/s − m/s differ in floating
    * point. */
  final case class Standardize(m: Array[Double], s: Array[Double])
      extends Layer {
    require(m.length == s.length, "standardize: |m| != |s|")
    def forward(x: Array[Double]): Array[Double] =
      Array.tabulate(m.length)(j =>
        if (s(j) > 1e-9) (x(j) - m(j)) / s(j) else 0.0)
  }

  final case class Dense(w: Array[Array[Double]], b: Array[Double],
      act: String) extends Layer {
    require(w.length == b.length, "dense: |w rows| != |b|")
    require(Set("linear", "relu", "tanh").contains(act),
      s"dense: unknown activation '$act'")
    def forward(x: Array[Double]): Array[Double] =
      Array.tabulate(w.length) { i =>
        val row = w(i)
        var acc = 0.0
        var j = 0
        while (j < row.length) { acc += row(j) * x(j); j += 1 }
        acc += b(i)
        act match {
          case "relu" => math.max(acc, 0.0)
          case "tanh" => math.tanh(acc)
          case _ => acc
        }
      }
  }

  final case class Mlp(input: Int, layers: Seq[Layer], l2: Boolean)
      extends Serializable {
    def forward(f: Array[Double]): Array[Float] = {
      val out = layers.foldLeft(f)((x, l) => l.forward(x))
      if (!l2) out.map(_.toFloat)
      else {
        val nrm = math.sqrt(out.map(x => x * x).sum)
        (if (nrm == 0.0) out else out.map(_ / nrm)).map(_.toFloat)
      }
    }
  }

  /** The in-repo PCA as an [[Mlp]] — the format provably covers the
    * default model (standardize → linear dense → l2norm). */
  def fromProjection(p: EmbeddingProjection): Mlp =
    Mlp(p.mean.length, Seq(
      Standardize(p.mean, p.std),
      Dense(p.components, new Array[Double](p.components.length), "linear")),
      l2 = true)

  /** The canonical text form — also the structural-equality proxy
    * (the case classes hold Arrays, which compare by reference). */
  def render(mlp: Mlp): String = {
    val sb = new StringBuilder
    sb.append("graft-weights 1\n")
    sb.append(s"input ${mlp.input}\n")
    mlp.layers.foreach {
      case Standardize(m, s) =>
        sb.append("standardize\n")
        sb.append("m ").append(m.mkString(" ")).append('\n')
        sb.append("s ").append(s.mkString(" ")).append('\n')
      case Dense(w, b, act) =>
        sb.append(s"dense ${w.length} $act\n")
        w.foreach(row => sb.append("w ").append(row.mkString(" ")).append('\n'))
        sb.append("b ").append(b.mkString(" ")).append('\n')
    }
    if (mlp.l2) sb.append("l2norm\n")
    sb.toString
  }

  def write(spark: SparkSession, path: String, mlp: Mlp): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(render(mlp).getBytes("UTF-8")) finally out.close()
  }

  def load(spark: SparkSession, path: String): Mlp = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toString("UTF-8")
    } finally in.close()
    parse(text, path)
  }

  private[graft] def parse(text: String, what: String): Mlp = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"weights file $what: $msg")
    val lines = text.linesIterator
      .map(_.replaceAll("#.*$", "").trim).filter(_.nonEmpty).toSeq
    if (lines.isEmpty || lines.head != "graft-weights 1")
      fail("missing 'graft-weights 1' header")
    def doubles(l: String, tag: String): Array[Double] = {
      val t = l.split("\\s+")
      if (t.head != tag) fail(s"expected '$tag ...' line, got: $l")
      t.tail.map(_.toDouble)
    }
    var i = 1
    if (i >= lines.size || !lines(i).startsWith("input "))
      fail("missing 'input <dim>' line")
    val input = lines(i).split("\\s+")(1).toInt
    i += 1
    var width = input
    val layers = Seq.newBuilder[Layer]
    var l2 = false
    while (i < lines.size) {
      val t = lines(i).split("\\s+")
      t(0) match {
        case "standardize" =>
          val m = doubles(lines(i + 1), "m")
          val s = doubles(lines(i + 2), "s")
          if (m.length != width || s.length != width)
            fail(s"standardize width ${m.length}/${s.length}, expected $width")
          layers += Standardize(m, s)
          i += 3
        case "dense" =>
          if (t.length != 3) fail(s"dense needs '<out> <activation>': ${lines(i)}")
          val out = t(1).toInt
          val w = (0 until out).map(r => doubles(lines(i + 1 + r), "w")).toArray
          w.foreach(row => if (row.length != width)
            fail(s"dense row width ${row.length}, expected $width"))
          val b = doubles(lines(i + 1 + out), "b")
          if (b.length != out) fail(s"bias width ${b.length}, expected $out")
          layers += Dense(w, b, t(2))
          width = out
          i += out + 2
        case "l2norm" =>
          l2 = true
          i += 1
          if (i != lines.size) fail("l2norm must be the last directive")
        case other => fail(s"unknown directive '$other'")
      }
    }
    val mlp = Mlp(input, layers.result(), l2)
    if (mlp.layers.isEmpty) fail("no layers")
    mlp
  }

  /** Batched kernel serving a loaded head over the shared feature
    * extractor — the slot a GPU/ONNX forward occupies. */
  def kernel(mlp: Mlp,
      features: Array[Byte] => Array[Double] = EmbeddingFeatures.fromAny)
      : BatchInference.Kernel =
    batch => batch.map(bytes => mlp.forward(features(bytes)))
}
