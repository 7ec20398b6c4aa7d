package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Document chunking (reference: chunker.py).
  *
  * Two implementations:
  *
  *  1. [[fixedSize]] — sliding token windows via `sequence`/`slice`/
  *     `posexplode`: pure built-in expressions, whole-stage-codegen'd,
  *     SQL-oracle-able, and the right shape for 100 TB (one narrow
  *     projection + explode, no UDF, no state).
  *
  *  2. [[recursiveChunks]] — a faithful Scala port of the reference's
  *     recursive split-and-merge semantics (chunker.py:55 `_merge_splits`,
  *     :81 `_split_recursive`, :107 `chunk`) with a whitespace-token
  *     proxy for the HF tokenizer. Applied per-row through a map on a
  *     Dataset — still distributed (no driver loop), used where exact
  *     reference semantics matter more than codegen.
  */
object Chunker {

  /** Explode `textCol` into fixed-size token-window chunks.
    *
    * Chunk i covers tokens [i*(size-overlap), i*(size-overlap)+size).
    * Output columns: all of `keep`, then chunk_index (long), chunk
    * (string), chunk_tokens (long).
    */
  def fixedSize(
      df: DataFrame,
      textCol: String,
      chunkSize: Int,
      overlap: Int,
      keep: Seq[String]
  ): DataFrame = {
    require(chunkSize > overlap && overlap >= 0, s"need chunkSize > overlap >= 0")
    val step = chunkSize - overlap
    val toks = df
      .withColumn("_toks", TextOps.tokenize(col(textCol)))
      .withColumn("_n", size(col("_toks")))
      .filter(col("_n") > 0)
    toks
      .select(
        keep.map(col) :+
          posexplode(sequence(lit(0), col("_n") - 1, lit(step))).as(Seq("_ci", "_start")) :+
          col("_toks") :+ col("_n"): _*
      )
      .select(
        keep.map(col) :+
          col("_ci").cast("long").as("chunk_index") :+
          array_join(slice(col("_toks"), col("_start") + 1, lit(chunkSize)), " ").as("chunk") :+
          least(lit(chunkSize), col("_n") - col("_start")).cast("long").as("chunk_tokens"): _*
      )
  }

  // ── Faithful recursive semantics (reference: chunker.py) ────────────────

  private val Separators = Seq("\n\n", "\n", " ", "")

  /** Whitespace-token length — the default proxy for the reference's
    * HF-tokenizer `len`.
    */
  private val wsTokenPattern = java.util.regex.Pattern.compile("[^a-z0-9]+")

  def wsTokenLen(s: String): Int =
    wsTokenPattern.split(s.toLowerCase).count(_.nonEmpty)

  /** REAL tokenizer length: BPE token count under the checked-in merge
    * table — the faithful analogue of chunker.py:24's `_get_tokenizer`
    * sizing (chunk budgets in actual tokens, not words).
    */
  private lazy val pretokenPattern = java.util.regex.Pattern.compile(Bpe.PretokenRegex)

  def bpeTokenLen(s: String): Int = {
    val m = pretokenPattern.matcher(s.toLowerCase)
    var total = 0
    while (m.find()) total += Bpe.encodeWord(m.group(), Bpe.merges).length
    total
  }

  /** chunker.py:55 `_merge_splits` — greedy merge with overlap carry. */
  private[graft] def mergeSplits(
      splits: Seq[String],
      separator: String,
      chunkSize: Int,
      overlap: Int,
      lenFn: String => Int = wsTokenLen
  ): Seq[String] = {
    val chunks = scala.collection.mutable.ArrayBuffer.empty[String]
    var current = scala.collection.mutable.ArrayBuffer.empty[String]
    // lengths carried alongside so the overlap drain never re-tokenizes
    // a split it already measured
    var currentLens = scala.collection.mutable.ArrayBuffer.empty[Int]
    var currentLen = 0
    for (split <- splits) {
      val splitLen = lenFn(split)
      if (currentLen + splitLen > chunkSize && current.nonEmpty) {
        chunks += current.mkString(separator)
        while (current.nonEmpty && currentLen > overlap) {
          current.remove(0)
          currentLen -= currentLens.remove(0)
        }
      }
      current += split
      currentLens += splitLen
      currentLen += splitLen
    }
    if (current.nonEmpty) chunks += current.mkString(separator)
    chunks.toSeq
  }

  // split patterns compiled ONCE per separator — splitRecursive runs per
  // (row x separator x recursion level); String.split would recompile the
  // regex on every call, a pure constant-factor tax on the hot path
  private val separatorPatterns: Map[String, java.util.regex.Pattern] =
    Separators.filter(_.nonEmpty)
      .map(s => s -> java.util.regex.Pattern.compile(java.util.regex.Pattern.quote(s)))
      .toMap

  /** chunker.py:81 `_split_recursive`. */
  private[graft] def splitRecursive(
      text: String,
      separators: Seq[String],
      chunkSize: Int,
      overlap: Int,
      lenFn: String => Int = wsTokenLen
  ): Seq[String] = {
    if (separators.isEmpty) return Seq(text)
    val sep = separators.head
    val remaining = separators.tail
    val splits =
      if (sep.isEmpty) text.map(_.toString)
      else separatorPatterns.getOrElse(sep,
        java.util.regex.Pattern.compile(java.util.regex.Pattern.quote(sep)))
        .split(text, -1).toSeq
    val all = splits.filter(_.nonEmpty).flatMap { s =>
      if (lenFn(s) > chunkSize) splitRecursive(s, remaining, chunkSize, overlap, lenFn)
      else Seq(s)
    }
    mergeSplits(all, sep, chunkSize, overlap, lenFn)
  }

  /** chunker.py:107 `chunk` — with the min-token floor fallback. */
  def recursiveChunks(
      text: String,
      chunkSize: Int = 512,
      overlap: Int = 64,
      minTokens: Int = 50,
      lenFn: String => Int = wsTokenLen
  ): Seq[String] = {
    if (text.trim.isEmpty) return Seq.empty
    val raw = splitRecursive(text, Separators, chunkSize, overlap, lenFn)
    val filtered = raw.filter(lenFn(_) >= minTokens)
    if (filtered.isEmpty && raw.nonEmpty) Seq(text.trim) else filtered
  }
}
