package graft

import graft.operators.Chunker
import org.scalatest.funsuite.AnyFunSuite

/** Property-style invariants for the pure-Scala operator kernels,
  * sampled over a seeded generator (the scalatest/scalacheck bridge
  * artifact isn't in the offline cache, so sampling is hand-rolled and
  * fully deterministic).
  */
class PropertySpec extends AnyFunSuite {

  private def cases[A](n: Int)(gen: scala.util.Random => A): Seq[A] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(n)(gen(rnd))
  }

  private def randWords(rnd: scala.util.Random): List[String] =
    List.fill(rnd.nextInt(60))(
      List.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(26)).toChar).mkString)

  test("recursiveChunks never invents tokens and never drops a non-empty doc") {
    for (words <- cases(100)(randWords)) {
      val text = words.mkString(" ")
      val size = 5 + (words.length % 46)
      val overlap = words.length % 5
      if (size > overlap) {
        val inputTokens = words.toSet
        val chunks = Chunker.recursiveChunks(text, size, overlap, minTokens = 1)
        val chunkTokens = chunks.flatMap(_.split("[^a-z0-9]+")).filter(_.nonEmpty).toSet
        assert(chunkTokens.subsetOf(inputTokens), s"invented tokens for '$text'")
        if (words.nonEmpty) assert(chunks.nonEmpty, s"dropped doc '$text'")
      }
    }
  }

  test("mergeSplits with zero overlap concatenates to the original sequence") {
    for (words <- cases(100)(randWords)) {
      val size = 1 + (words.length % 20)
      val merged = Chunker.mergeSplits(words, " ", size, overlap = 0)
      assert(merged.flatMap(_.split(" ")).filter(_.nonEmpty) == words)
    }
  }

  test("mergeSplits never exceeds chunk_size when individual splits fit") {
    for (words <- cases(100)(randWords)) {
      val size = 2 + (words.length % 20)
      val overlap = words.length % 2
      val merged = Chunker.mergeSplits(words, " ", size, overlap)
      merged.foreach { c =>
        val n = c.split("[^a-z0-9]+").count(_.nonEmpty)
        assert(n <= size, s"chunk '$c' has $n tokens > $size")
      }
    }
  }
}
