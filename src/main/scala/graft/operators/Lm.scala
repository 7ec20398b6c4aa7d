package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style LM-perplexity quality bucketing (Wenzek et al. 2019,
  * §4.3): score every document with a language-model perplexity and
  * split the corpus into head / middle / tail buckets at fixed
  * thresholds. CCNet uses a KenLM 5-gram model; the engine-side shape
  * is identical for any n — here a bigram model with stupid backoff
  * (Brants et al. 2007) whose parameters are trained offline ONCE by
  * `graft.tools.TrainLm` and CHECKED IN (like the BPE merges and the
  * quality-classifier weights), so distributed scoring is pure joins —
  * no model runtime on the executors.
  *
  * Log-probabilities are precomputed in the artifact (the only libm
  * call left at score time is the final `exp`, absorbed by rounding),
  * which keeps the DuckDB twin exact: the same doubles are inlined as
  * literals there.
  *
  * Shape at scale: one explode into (first-token | bigram) scoring rows
  * carrying only token text; TWO broadcast joins (unigram table =
  * |vocab| rows, bigram table = |seen bigrams| rows — both model
  * constants, tiny by construction); one partial-agg groupBy(doc). No
  * windows, no skew beyond doc length.
  */
object Lm {

  /** Distributed n-gram LM TRAINING — the step `graft.tools.TrainLm`
    * runs offline, expressed as the corpus-scale operator it really is
    * (CCNet trains its KenLM filter on a reference corpus; at 100 TB
    * that training pass is itself a distributed job): one tokenize +
    * bigram explode, one map-side-combined count per bigram, the
    * context totals derived FROM the bigram counts (no second corpus
    * pass), and the MLE conditional probability as an exact rational
    * before the single rounding. Returns one row per observed bigram:
    * (w1, w2, n_pair, n_w1, cond_p).
    *
    * Shape at scale: groupBy(bigram) is the canonical partial-agg
    * shuffle; the context-total join runs on the already-aggregated
    * bigram table (|vocab²∩corpus| rows, not corpus rows), so stopword
    * contexts skew the join input only as far as their distinct
    * continuation count — bounded by |vocab|, not corpus size.
    */
  def trainBigrams(df: DataFrame, textCol: String): DataFrame = {
    val toks = df
      .select(TextOps.tokenize(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
    // tokens are [a-z0-9]+ by construction, so ' ' is a safe separator;
    // bigram building IS rawShingles(toks, 2) — reuse it for the
    // substitution-proof token binding + outer-explode (see its doc)
    val pairs = TextOps.explodeShingles(
      toks, TextOps.rawShingles(col("toks"), 2), "pair")
    val pc = pairs.groupBy("pair").agg(count(lit(1)).as("n_pair"))
    val withW1 = pc
      .withColumn("w1", split(col("pair"), " ").getItem(0))
      .withColumn("w2", split(col("pair"), " ").getItem(1))
    val w1c = withW1.groupBy("w1").agg(sum("n_pair").as("n_w1"))
    withW1
      .join(w1c, "w1")
      .select(col("w1"), col("w2"),
        col("n_pair").cast("long").as("n_pair"),
        col("n_w1").cast("long").as("n_w1"),
        round(col("n_pair").cast("double") / col("n_w1"), 6).as("cond_p"))
  }

  /** Bigram LM with precomputed log-probs.
    *
    * @param uni     token -> ln P_uni(token)  (add-one smoothed)
    * @param bi      "w1 w2" -> ln P(w2 | w1)  (maximum likelihood)
    * @param oovLp   ln P_uni(unseen token)
    * @param backoffLp ln 0.4 stupid-backoff penalty
    * @param tHead   head/middle ppl threshold (33rd training pctile)
    * @param tTail   middle/tail ppl threshold (67th training pctile)
    */
  case class Model(
      uni: Seq[(String, Double)],
      bi: Seq[(String, Double)],
      oovLp: Double,
      backoffLp: Double,
      tHead: Double,
      tTail: Double)

  /** The checked-in artifact (`graft/lm_bigram.txt`), parsed once. */
  lazy val model: Model = {
    val in = getClass.getResourceAsStream("/graft/lm_bigram.txt")
    require(in != null, "resource graft/lm_bigram.txt missing — run graft.tools.TrainLm")
    val lines = scala.io.Source.fromInputStream(in)(scala.io.Codec.UTF8)
      .getLines().map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    val uni = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    val bi = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    var oov = Double.NaN; var back = Double.NaN
    var tHead = Double.NaN; var tTail = Double.NaN
    lines.foreach { l =>
      l.split("\\s+") match {
        case Array("O", v)         => oov = v.toDouble
        case Array("K", v)         => back = v.toDouble
        case Array("T", h, t)      => tHead = h.toDouble; tTail = t.toDouble
        case Array("U", w, v)      => uni += ((w, v.toDouble))
        case Array("B", w1, w2, v) => bi += ((s"$w1 $w2", v.toDouble))
        case other => sys.error(s"bad lm_bigram.txt line: ${other.mkString(" ")}")
      }
    }
    require(!oov.isNaN && !back.isNaN && !tHead.isNaN && !tTail.isNaN && uni.nonEmpty,
      "lm_bigram.txt incomplete — retrain via graft.tools.TrainLm")
    Model(uni.toSeq, bi.toSeq, oov, back, tHead, tTail)
  }

  /** Per-document perplexity + head/middle/tail bucket.
    *
    * Token 1 scores by the unigram model; token i>1 by
    * P(w_i | w_{i-1}) when the bigram was seen in training, else
    * 0.4 * P_uni(w_i) (stupid backoff). ppl = exp(-mean log-prob),
    * rounded to 5 dp BEFORE bucketing so the bucket edges are
    * engine-portable. Documents with no tokens get ppl NULL and
    * bucket 'empty'.
    */
  def perplexity(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = model
    val uniDf = m.uni.toDF("w", "ulp")
    val biDf = m.bi.toDF("bg", "blp")

    val toksCol = TextOps.tokenize(col(textCol))
    val base = df.select(col(idCol), toksCol.as("_toks"))
    // one array of scoring rows: the first token (bg NULL, unigram
    // path) then one struct per adjacent pair (bigram path)
    val rows = concat(
      when(size(col("_toks")) >= 1,
        array(struct(
          lit(null).cast("string").as("bg"),
          element_at(col("_toks"), 1).as("w"))))
        .otherwise(array().cast("array<struct<bg:string,w:string>>")),
      when(size(col("_toks")) >= 2,
        transform(
          sequence(lit(1), size(col("_toks")) - 1),
          i => struct(
            concat_ws(" ", element_at(col("_toks"), i), element_at(col("_toks"), i + 1)).as("bg"),
            element_at(col("_toks"), i + 1).as("w"))))
        .otherwise(array().cast("array<struct<bg:string,w:string>>")))
    // explode_OUTER keeps token-less documents as one null scoring row
    // (lp guarded to NULL) — no second corpus scan + join to re-attach
    // them, which would shuffle the whole table twice at 100 TB
    base
      .select(col(idCol), explode_outer(rows).as("r"))
      .select(col(idCol), col("r.bg").as("bg"), col("r.w").as("w"))
      .join(broadcast(uniDf), Seq("w"), "left")
      .join(broadcast(biDf), Seq("bg"), "left")
      .withColumn("ulp_or_oov", coalesce(col("ulp"), lit(m.oovLp)))
      .withColumn("lp",
        when(col("w").isNull, lit(null).cast("double"))
          .when(col("bg").isNull, col("ulp_or_oov"))
          .otherwise(coalesce(col("blp"), lit(m.backoffLp) + col("ulp_or_oov"))))
      .groupBy(col(idCol))
      .agg(
        count(col("w")).as("n_tokens"),
        round(exp(-sum(col("lp")) / count(col("w"))), 5).as("ppl"))
      .select(
        col(idCol),
        col("n_tokens"),
        col("ppl"),
        when(col("ppl").isNull, "empty")
          .when(col("ppl") <= m.tHead, "head")
          .when(col("ppl") <= m.tTail, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(idCol)
  }
}
