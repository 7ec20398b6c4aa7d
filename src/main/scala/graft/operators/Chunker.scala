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

  private def tokenLen(s: String): Int =
    s.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty)

  /** chunker.py:55 `_merge_splits` — greedy merge with overlap carry. */
  private[graft] def mergeSplits(
      splits: Seq[String],
      separator: String,
      chunkSize: Int,
      overlap: Int
  ): Seq[String] = {
    val chunks = scala.collection.mutable.ArrayBuffer.empty[String]
    var current = scala.collection.mutable.ArrayBuffer.empty[String]
    var currentLen = 0
    for (split <- splits) {
      val splitLen = tokenLen(split)
      if (currentLen + splitLen > chunkSize && current.nonEmpty) {
        chunks += current.mkString(separator)
        while (current.nonEmpty && currentLen > overlap) {
          val removed = current.remove(0)
          currentLen -= tokenLen(removed)
        }
      }
      current += split
      currentLen += splitLen
    }
    if (current.nonEmpty) chunks += current.mkString(separator)
    chunks.toSeq
  }

  /** chunker.py:81 `_split_recursive`. */
  private[graft] def splitRecursive(
      text: String,
      separators: Seq[String],
      chunkSize: Int,
      overlap: Int
  ): Seq[String] = {
    if (separators.isEmpty) return Seq(text)
    val sep = separators.head
    val remaining = separators.tail
    val splits =
      if (sep.isEmpty) text.map(_.toString)
      else text.split(java.util.regex.Pattern.quote(sep), -1).toSeq
    val all = splits.filter(_.nonEmpty).flatMap { s =>
      if (tokenLen(s) > chunkSize) splitRecursive(s, remaining, chunkSize, overlap)
      else Seq(s)
    }
    mergeSplits(all, sep, chunkSize, overlap)
  }

  /** chunker.py:107 `chunk` — with the min-token floor fallback. */
  def recursiveChunks(
      text: String,
      chunkSize: Int = 512,
      overlap: Int = 64,
      minTokens: Int = 50
  ): Seq[String] = {
    if (text.trim.isEmpty) return Seq.empty
    val raw = splitRecursive(text, Separators, chunkSize, overlap)
    val filtered = raw.filter(tokenLen(_) >= minTokens)
    if (filtered.isEmpty && raw.nonEmpty) Seq(text.trim) else filtered
  }
}
