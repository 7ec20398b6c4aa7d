package graft

import graft.operators.Chunker

/** Reference-semantics tests for the recursive chunker
  * (reference: tests/test_chunker.py shapes; chunker.py:55-141).
  */
class ChunkerSpec extends SparkSpec {

  test("empty and whitespace-only text produce no chunks") {
    assert(Chunker.recursiveChunks("") == Seq.empty)
    assert(Chunker.recursiveChunks("   \n\n  ") == Seq.empty)
  }

  test("short text below min-token floor is indexed as a single chunk") {
    val out = Chunker.recursiveChunks("tiny doc", chunkSize = 512, overlap = 64, minTokens = 50)
    assert(out == Seq("tiny doc"))
  }

  test("text under chunk_size stays one chunk") {
    val text = (1 to 60).map(i => s"tok$i").mkString(" ")
    val out = Chunker.recursiveChunks(text, chunkSize = 512, overlap = 64, minTokens = 50)
    assert(out == Seq(text))
  }

  test("long text splits on paragraphs first and respects chunk_size") {
    val para = (1 to 40).map(i => s"w$i").mkString(" ")
    val text = Seq.fill(5)(para).mkString("\n\n")
    val out = Chunker.recursiveChunks(text, chunkSize = 100, overlap = 10, minTokens = 5)
    assert(out.length > 1)
    // every chunk respects the token bound (paragraphs of 40 merge 2-per-chunk)
    val tokenCounts = out.map(_.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty))
    assert(tokenCounts.forall(_ <= 100), s"oversized chunk: $tokenCounts")
  }

  test("overlap carries trailing splits into the next chunk") {
    val words = (1 to 30).map(i => s"w$i")
    val out = Chunker.mergeSplits(words.map(_.toString), " ", chunkSize = 10, overlap = 3)
    // consecutive chunks share the overlap words
    assert(out.length > 1)
    val first = out(0).split(" ").toSeq
    val second = out(1).split(" ").toSeq
    assert(second.take(3) == first.takeRight(3).take(3) || second.head == first.takeRight(3).head,
      s"no overlap between '$first' and '$second'")
  }

  test("oversized single token falls through to character split without loss") {
    val long = "x" * 50 // one 50-char token
    val out = Chunker.splitRecursive(long, Seq("\n\n", "\n", " ", ""), chunkSize = 10, overlap = 2)
    assert(out.nonEmpty)
    assert(out.mkString("").length >= 10) // characters preserved across splits
  }

  test("unicode text survives chunking (non-ascii counts zero proxy tokens)") {
    // (reference: test_chunker.py unicode_text — the HF tokenizer counts
    //  CJK tokens; our whitespace proxy counts ascii-alphanumeric runs,
    //  so pure-CJK text falls below the min floor and is indexed whole.)
    val cjk = "数据 处理 管道 质量 评分"
    val out = Chunker.recursiveChunks(cjk, chunkSize = 512, overlap = 64, minTokens = 5)
    assert(out == Seq(cjk))
    val mixed = "spark 数据 pipeline 处理 engine quality scoring tokens here now"
    val outMixed = Chunker.recursiveChunks(mixed, chunkSize = 512, overlap = 64, minTokens = 5)
    assert(outMixed.nonEmpty && outMixed.head.contains("数据"))
  }

  test("recursive chunking keeps reference invariants on adversarial separator inputs") {
    val rnd = new scala.util.Random(7)
    val seps = Seq("\n\n", "\n", " ")
    def tl(s: String): Int = s.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty)
    (1 to 80).foreach { _ =>
      // adversarial mix: bare separator runs, empty pieces, oversized
      // single tokens, normal word runs — joined by random separators
      val pieces = (0 to rnd.nextInt(30)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => "w" * (rnd.nextInt(40) + 1)
          case 1 => (0 to rnd.nextInt(20)).map(_ => s"t${rnd.nextInt(100)}").mkString(" ")
          case 2 => seps(rnd.nextInt(seps.size)) * (rnd.nextInt(3) + 1)
          case _ => ""
        }
      }
      val text = pieces.mkString(seps(rnd.nextInt(seps.size)))
      val out = Chunker.recursiveChunks(text, chunkSize = 16, overlap = 4, minTokens = 2)
      assert(out == Chunker.recursiveChunks(text, chunkSize = 16, overlap = 4, minTokens = 2),
        "chunking must be deterministic")
      assert(out.forall(_.nonEmpty), s"empty chunk from: ${text.take(80)}")
      // reference floor semantics (chunker.py:107): every surviving chunk
      // meets minTokens, or the whole doc fell back to a single chunk
      assert(out.forall(tl(_) >= 2) || out == Seq(text.trim) || out.isEmpty,
        s"floor violated: ${out.map(tl)}")
    }
  }

  test("chunk_recursive query equals driver-side reference application per doc") {
    val got = Queries.chunkRecursive(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val expected = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .flatMap { r =>
        Chunker.recursiveChunks(r.getString(1), chunkSize = 64, overlap = 16, minTokens = 8)
          .zipWithIndex.map { case (c, i) => (r.getLong(0), i.toLong, c) }
      }.sortBy(t => (t._1, t._2)).toSeq
    assert(got == expected)
  }

  test("fixed-size chunker covers every token and respects bounds") {
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq((1L, (1 to 75).map(i => s"t$i").mkString(" ")))).toDF("doc_id", "text")
    val out = Chunker.fixedSize(df, "text", chunkSize = 32, overlap = 8, keep = Seq("doc_id"))
      .orderBy("chunk_index").collect()
    // starts at 0, 24, 48, 72 → 4 chunks; last has 3 tokens
    assert(out.length == 4)
    assert(out.map(_.getAs[Long]("chunk_tokens")).toSeq == Seq(32L, 32L, 27L, 3L))
    assert(out.head.getAs[String]("chunk").startsWith("t1 "))
  }
}
