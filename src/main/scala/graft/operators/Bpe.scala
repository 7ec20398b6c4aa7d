package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Byte-pair-encoding tokenizer: a fixed, checked-in merge table applied
  * distributively — true token budgets for training-data pipelines
  * (reference: chunker.py:24 `_get_tokenizer`; token-aware sizing is the
  * reference's core chunking primitive; this is the Spark-scale
  * equivalent of shipping a tokenizer's merges.txt).
  *
  * Training follows Sennrich et al. 2016: iteratively merge the most
  * frequent adjacent symbol pair. It runs on a WORD-FREQUENCY table, not
  * the corpus — the distributed part is one `groupBy(word).count()`
  * (exactly how production tokenizer trainers consume corpora); the
  * driver-side loop then touches only the O(vocab) distinct words.
  *
  * Encoding applies merges IN RANK ORDER, each as one left-to-right
  * non-overlapping pass. For merge tables produced by BPE training this
  * is equivalent to the classic best-rank-first encode loop, because a
  * merge's two parts always have strictly lower rank than the merge
  * itself — so once rank i is processed, no later merge can create a
  * rank-≤i pair. (BpeSpec proves the equivalence against a
  * priority-queue encoder and checks the rank property of the shipped
  * table.) The rank-order form is what makes the DuckDB oracle twin a
  * flat `replace()` chain over the same inlined merge table.
  */
object Bpe {

  /** GPT-style pre-tokenization over lowered text: letter runs, digit
    * runs, single other symbols (spaces never match). Shared literally
    * with the DuckDB twin and [[graft.Queries.tokenCounts]].
    */
  val PretokenRegex: String = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** One (left, right) merge per line, rank = position. */
  lazy val merges: Array[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "resource graft/bpe_merges.txt missing — run graft.tools.TrainBpe")
    scala.io.Source.fromInputStream(in)(scala.io.Codec.UTF8).getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val Array(a, b) = l.split(" ", 2); (a, b) }.toArray
  }

  /** Java-friendly form for the codegen reference object. */
  lazy val mergesArray: Array[Array[String]] = merges.map { case (l, r) => Array(l, r) }

  /** Split into code-point symbols (UTF-16-surrogate safe). */
  def codePointSyms(w: String): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      buf += w.substring(i, i + n)
      i += n
    }
    buf.toArray
  }

  /** One left-to-right non-overlapping merge pass. */
  def mergePair(syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += l + r; i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one word: merges applied in rank order. */
  def encodeWord(w: String, merges: Array[(String, String)]): Array[String] = {
    var syms = codePointSyms(w)
    var m = 0
    while (m < merges.length && syms.length >= 2) {
      val (l, r) = merges(m)
      var has = false; var i = 0
      while (!has && i < syms.length - 1) {
        if (syms(i) == l && syms(i + 1) == r) has = true
        i += 1
      }
      if (has) syms = mergePair(syms, l, r)
      m += 1
    }
    syms
  }

  /** Deterministic BPE training over a word-frequency table: most
    * frequent pair first, ties broken lexicographically on (left,
    * right); stops when no pair occurs at least `minCount` times.
    */
  def train(
      wordFreqs: Seq[(String, Long)],
      numMerges: Int,
      minCount: Long = 2L
  ): Seq[(String, String)] = {
    var words = wordFreqs.map { case (w, f) => (codePointSyms(w), f) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (go && merges.size < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts.update(k, counts.getOrElse(k, 0L) + f)
      }
      val best = if (counts.isEmpty) None
      else Some(counts.minBy { case ((l, r), c) => (-c, l, r) })
      best match {
        case Some(((l, r), c)) if c >= minCount =>
          merges += ((l, r))
          words = words.map { case (syms, f) => (mergePair(syms, l, r), f) }
        case _ => go = false
      }
    }
    merges.toSeq
  }

  /** Distributed word-frequency pass + driver-side training loop —
    * the at-scale shape: the corpus is touched exactly once (one
    * map-side-combined aggregation); the training loop sees only the
    * top-`maxWords` distinct words.
    */
  def trainFromCorpus(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 1 << 16
  ): Seq[(String, String)] = {
    val wf = df
      .select(explode(regexp_extract_all(lower(col(textCol)), lit(PretokenRegex), lit(0))).as("w"))
      .groupBy("w").agg(count("*").as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    train(wf, numMerges)
  }
}
