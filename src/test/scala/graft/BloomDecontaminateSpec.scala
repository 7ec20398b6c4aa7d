package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The Bloom-prefiltered decontamination path must be EXACTLY the
  * broadcast-join path: no false negatives by Bloom construction, and
  * every false positive must die in the confirmation join — across
  * normal, adversarially-undersized, and empty-filter regimes.
  */
class BloomDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = spark.read.parquet(s"$sf/documents.parquet")

  test("bloom path equals the exact broadcast path on the real corpus") {
    val corpus = docsDf.filter(col("doc_id") >= 10)
    val bench  = docsDf.filter(col("doc_id") < 10)
    val exact = TextAnalysis.contamination(corpus, bench, "text", "doc_id")
      .orderBy("doc_id").collect()
    val bloom = TextAnalysis.bloomDecontaminate(corpus, bench, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(bloom.toSeq == exact.toSeq)
  }

  test("undersized filter (high FP rate) still yields the exact report") {
    val corpus = docsDf.filter(col("doc_id") >= 10)
    val bench  = docsDf.filter(col("doc_id") < 10)
    val exact = TextAnalysis.contamination(corpus, bench, "text", "doc_id")
      .orderBy("doc_id").collect()
    // minBits=64 forces m ~ 16n with k clamped high — FP-heavy prefilter;
    // the confirm join must still kill every impostor.
    val bloom = TextAnalysis
      .bloomDecontaminate(corpus, bench, "text", "doc_id", minBits = 64)
      .orderBy("doc_id").collect()
    assert(bloom.toSeq == exact.toSeq)
  }

  test("disjoint vocabularies report zero contamination; planted overlap reports the exact ratio") {
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "eta theta iota kappa lambda mu"),
      // planted: 6 tokens -> 4 distinct shingles, 2 of them benchmark 3-grams
      (102L, "one two three four nu xi")
    ).toDF("doc_id", "text")
    val bench = Seq((0L, "one two three four")).toDF("doc_id", "text")
    val out = TextAnalysis.bloomDecontaminate(corpus, bench, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((100L, 0L), (101L, 0L), (102L, 2L)))
    val planted = out.find(_.getLong(0) == 102L).get
    assert(planted.getLong(1) == 4L && planted.getDouble(3) == 0.5)
  }

  test("randomized fuzz vs the exact path (seeded, overlapping vocabularies)") {
    val rnd = new scala.util.Random(2025)
    val vocab = (0 until 15).map(i => s"w$i")
    def doc(id: Long) =
      (id, (0 until (5 + rnd.nextInt(25))).map(_ => vocab(rnd.nextInt(15))).mkString(" "))
    val corpus = (100L until 200L).map(doc).toDF("doc_id", "text")
    val bench = (0L until 8L).map(doc).toDF("doc_id", "text")
    val exact = TextAnalysis.contamination(corpus, bench, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val bloom = TextAnalysis.bloomDecontaminate(corpus, bench, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(bloom == exact)
    // dense overlap regime: the report must actually be non-trivial
    assert(exact.exists(_.getLong(2) > 0))
  }

  test("whole pipeline survives CODEGEN_ONLY (no silent interpreted fallback)") {
    // Round-11 driver cold flag (58x / 163 s first-execution CPU): one
    // kill-hypothesis was a silent interpreted fallback of the generated
    // stage. Pinning the factory to CODEGEN_ONLY and disabling the
    // whole-stage fallback makes any fallback FAIL this test instead of
    // silently interpreting — so the class regresses loudly.
    val conf = spark.conf
    val oldMode = conf.getOption("spark.sql.codegen.factoryMode")
    val oldFb = conf.getOption("spark.sql.codegen.fallback")
    try {
      conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      conf.set("spark.sql.codegen.fallback", "false")
      val corpus = docsDf.filter(col("doc_id") >= 10)
      val bench = docsDf.filter(col("doc_id") < 10)
      val out = TextAnalysis.bloomDecontaminate(corpus, bench, "text", "doc_id").collect()
      assert(out.nonEmpty)
    } finally {
      oldMode.fold(conf.unset("spark.sql.codegen.factoryMode"))(v =>
        conf.set("spark.sql.codegen.factoryMode", v))
      oldFb.fold(conf.unset("spark.sql.codegen.fallback"))(v =>
        conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("native bit test agrees with a reference scalar reimplementation") {
    // Pin the mask/probe hash contract independently of the operator:
    // positions from the shared helper, bits OR'd by hand, tested via
    // the expression's own eval.
    val keys = Seq("alpha beta gamma", "one two three", "x y z")
    val mBits = 1L << 10
    val k = 4
    val words = (mBits / 64).toInt
    val mask = new Array[Long](words)
    keys.take(2).foreach { s =>
      graft.plans.BloomMightContain
        .positions(s.getBytes("UTF-8"), k, mBits)
        .foreach(p => mask((p >>> 6).toInt) |= 1L << (p & 63))
    }
    val expr = graft.plans.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal("ignored"), mask, mBits, k)
    def hit(s: String): Boolean =
      expr.test(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(hit(keys(0)) && hit(keys(1)))
    // no false negatives is structural; the un-inserted key is a miss
    // under this mask (verified — not guaranteed by Bloom, but fixed by
    // the deterministic hash family and these constants)
    assert(!hit(keys(2)))
  }

  test("empty benchmark produces an all-zero mask and an all-zero report") {
    val corpus = Seq((1L, "some words to shingle here now")).toDF("doc_id", "text")
    val bench  = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = TextAnalysis.bloomDecontaminate(corpus, bench, "text", "doc_id").collect()
    assert(out.length == 1 && out.head.getLong(2) == 0L)
  }
}
