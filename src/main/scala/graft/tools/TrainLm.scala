package graft.tools

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off generator for the checked-in bigram-LM artifact
  * `src/main/resources/graft/lm_bigram.txt` consumed by
  * [[graft.operators.Lm]] (the CCNet §4.3 perplexity-bucketing
  * pattern, training decoupled from distributed scoring):
  *
  *   sbt "runMain graft.tools.TrainLm /root/testdata/sf0.01 src/main/resources/graft/lm_bigram.txt"
  *
  * Model: add-one-smoothed unigram ln-probs, maximum-likelihood bigram
  * conditionals ln(cnt(w1 w2)/cnt(w1 as history)), stupid-backoff ln(0.4), OOV =
  * ln(1/(total+V+1)). Log-probs are precomputed here so score-time
  * arithmetic is pure +/× — that is what makes the DuckDB twin exact.
  * Head/tail thresholds are the 33rd/67th percentiles of the TRAINING
  * corpus's own (rounded) perplexities, CCNet's head/middle/tail split.
  */
object TrainLm {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"), TextOps.tokenize(col("text")).as("toks"))

    val uniCnt = toks
      .select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = uniCnt.values.sum
    val v = uniCnt.size

    val biCnt = TextOps.explodeShingles(
        toks.filter(size(col("toks")) >= 2),
        TextOps.rawShingles(col("toks"), 2), "bg")
      .groupBy("bg").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val denom = (total + v + 1).toDouble
    val uniLp = uniCnt.map { case (w, c) => w -> math.log((c + 1).toDouble / denom) }
    val oovLp = math.log(1.0 / denom)
    val backoffLp = math.log(0.4)
    // condition on the HISTORY count (number of bigram occurrences
    // starting with w1), not w1's unigram count — a w1 that ends a
    // document is no bigram history, and dividing by the unigram count
    // would leave P(.|w1) deficient for every document-final token
    val histCnt = biCnt.toSeq
      .groupBy { case (bg, _) => bg.split(' ').head }
      .map { case (w1, xs) => w1 -> xs.map(_._2).sum }
    val biLp = biCnt.map { case (bg, c) =>
      bg -> math.log(c.toDouble / histCnt(bg.split(' ').head).toDouble)
    }

    // training-corpus perplexities under the model just built (driver
    // side, exact same arithmetic as Lm.perplexity), for the bucket
    // thresholds
    val ppls = toks.collect().flatMap { r =>
      val ts = r.getSeq[String](1)
      if (ts.isEmpty) None
      else {
        val lps = ts.head.pipe(w => uniLp.getOrElse(w, oovLp)) +:
          ts.sliding(2).filter(_.size == 2).map { p =>
            biLp.getOrElse(s"${p(0)} ${p(1)}", backoffLp + uniLp.getOrElse(p(1), oovLp))
          }.toSeq
        Some(BigDecimal(math.exp(-lps.sum / lps.size))
          .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.sorted
    val tHead = ppls((ppls.length * 33) / 100)
    val tTail = ppls((ppls.length * 67) / 100)

    val sb = new StringBuilder
    sb ++= "# bigram LM artifact (graft.tools.TrainLm): O oovLp / K backoffLp / T tHead tTail / U w lp / B w1 w2 lp\n"
    sb ++= s"O $oovLp\nK $backoffLp\nT $tHead $tTail\n"
    uniLp.toSeq.sortBy(_._1).foreach { case (w, lp) => sb ++= s"U $w $lp\n" }
    biLp.toSeq.sortBy(_._1).foreach { case (bg, lp) => sb ++= s"B $bg $lp\n" }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[train-lm] vocab=$v bigrams=${biLp.size} total=$total tHead=$tHead tTail=$tTail -> $outPath")
    spark.stop()
  }

  private implicit class Pipe[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}
