package graft

import graft.operators.{Lm, Pca, Sq}
import org.apache.spark.sql.functions._

/** Randomized (seeded, deterministic) properties for the round-5c
  * numeric operators: SQ8 quantization invariants on adversarial
  * vectors, PCA projection vs a driver-side matrix multiply, and LM
  * perplexity range laws.
  */
class SqPcaPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(4321)

  test("SQ8 invariants on random/adversarial vectors: bounds, max-code, half-step error") {
    val vecs = Seq.fill(200)(Array.fill(16)((rnd.nextGaussian() * rnd.nextInt(100)).toFloat)) ++
      Seq(
        Array.fill(16)(0.0f),                    // all-zero → zero codes
        Array.fill(16)(Float.MinPositiveValue),  // denormal scale
        Array(1e30f) ++ Array.fill(15)(1e-30f))  // extreme dynamic range
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Sq.quantize(df, "v").orderBy("id").collect()
    out.zip(vecs).foreach { case (r, v) =>
      val s = r.getDouble(2)
      val codes = r.getSeq[Int](3)
      assert(codes.forall(c => c >= -127 && c <= 127))
      if (v.exists(_ != 0.0f)) {
        // the max-|x| element always quantizes to ±127 (scale definition)
        assert(codes.map(math.abs).max == 127, s"row ${r.getLong(0)}: no full-scale code")
        v.map(_.toDouble).zip(codes).foreach { case (x, c) =>
          assert(math.abs(x - c * s) <= s / 2 * (1 + 1e-12), s"err > half-step at x=$x c=$c s=$s")
        }
      } else assert(s == 0.0 && codes.forall(_ == 0))
    }
  }

  test("PCA projection equals the driver-side matrix multiply on random vectors") {
    val m = Pca.fitCached(sf, Tables.embeddings(spark, sf), "embedding", r = 16)
    val vecs = Seq.fill(100)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = df.select(col("id"), Pca.projectExpr("v", m).as("pv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val expect = m.components.map(_.zip(v.map(_.toDouble)).map { case (c, x) => c * x }.sum)
      got(i.toLong).zip(expect).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"row $i: $a vs $b")
      }
    }
  }

  test("LM perplexity laws: ppl >= 1, monotone under OOV corruption, empty is null") {
    val texts = Seq.tabulate(50) { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(20))(s"tok${rnd.nextInt(40)}").mkString(" "))
    }
    val df = texts.toDF("doc_id", "text")
    val out = Lm.perplexity(df, "text", "doc_id").collect()
    out.foreach { r =>
      val ppl = r.getDouble(2)
      assert(ppl >= 1.0 && !ppl.isInfinite, s"ppl $ppl out of range")
    }
    // replacing every token with gibberish can only raise perplexity
    val corrupted = texts.map { case (id, t) =>
      (id, t.split(" ").map(w => s"zz${w}qx").mkString(" "))
    }.toDF("doc_id", "text")
    val base = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    Lm.perplexity(corrupted, "text", "doc_id").collect().foreach { r =>
      assert(r.getDouble(2) >= base(r.getLong(0)) - 1e-9,
        s"OOV corruption lowered ppl for doc ${r.getLong(0)}")
    }
  }
}
