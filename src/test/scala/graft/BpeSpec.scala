package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE tokenizer: training determinism, the rank property that justifies
  * rank-order encoding, equivalence with the classic best-rank-first
  * encoder, expression parity, and the registered query's semantics.
  */
class BpeSpec extends SparkSpec {

  test("training merges most frequent pair first, deterministically") {
    // 'aa' pair dominates; then 'aaaa' (pairs of merged symbol); ties lexicographic
    val wf = Seq(("aaaab", 10L), ("aaaac", 5L), ("xy", 3L))
    val m1 = Bpe.train(wf, numMerges = 3)
    val m2 = Bpe.train(wf, numMerges = 3)
    assert(m1 == m2, "training must be deterministic")
    assert(m1.head == ("a", "a"), s"most frequent pair first, got ${m1.head}")
    assert(Bpe.encodeWord("aaaab", m1.toArray).length < 5)
  }

  test("shipped merge table satisfies the parts-before-whole rank property") {
    val merges = Bpe.merges
    assert(merges.nonEmpty, "checked-in merge table must not be empty")
    val seen = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (l, r) =>
      assert(l.length == 1 || seen.contains(l), s"left part '$l' not produced by an earlier merge")
      assert(r.length == 1 || seen.contains(r), s"right part '$r' not produced by an earlier merge")
      seen += (l + r)
    }
  }

  /** Classic best-rank-first BPE encode (the standard tokenizer loop):
    * repeatedly merge all occurrences of the lowest-rank pair present.
    */
  private def priorityEncode(w: String, merges: Array[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = Bpe.codePointSyms(w).toSeq
    var done = false
    while (!done && syms.length >= 2) {
      val present = syms.zip(syms.tail).flatMap(p => rank.get(p).map(p -> _))
      if (present.isEmpty) done = true
      else {
        val (l, r) = present.minBy(_._2)._1
        syms = Bpe.mergePair(syms.toArray, l, r).toSeq
      }
    }
    syms
  }

  test("rank-order encoding equals best-rank-first encoding on every corpus word") {
    val merges = Bpe.merges
    val corpus = Tables.documents(spark, sf)
      .select(explode(regexp_extract_all(lower(col("text")), lit(Bpe.PretokenRegex), lit(0))).as("w"))
      .distinct().collect().map(_.getString(0))
    assert(corpus.length > 20, s"expected a nontrivial corpus vocab, got ${corpus.length}")
    // adversarial extras: repeated merge targets, overlaps, off-vocab
    val words = corpus ++ Seq("aaaa", "scanscan", "windowwindow", "columncolumn",
      "partitionpartition", "anan", "erer", "stst", "xyzzy", "colucolu")
    words.foreach { w =>
      val a = Bpe.encodeWord(w, merges).toSeq
      val b = priorityEncode(w, merges)
      assert(a == b, s"encodings diverge for '$w': $a vs $b")
    }
  }

  test("BpeWordTokens expression matches driver-side encode length") {
    import org.apache.spark.sql.GraftBridge
    val words = Seq("window", "scanner", "aaaa", "x", "数", "def", "partition")
    val df = spark.createDataFrame(words.map(Tuple1(_))).toDF("w")
    val got = df.select(
      col("w"),
      GraftBridge.column(graft.plans.BpeWordTokens(
        GraftBridge.expression(col("w")), Bpe.mergesArray)).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    words.foreach { w =>
      assert(got(w) == Bpe.encodeWord(w, Bpe.merges).length, s"mismatch for '$w'")
    }
  }

  test("BpeTextTokens (whole-text, no explode) equals the exploded per-pre-token sum") {
    val viaText = Queries.tokenCounts(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val viaExplode = Queries.bpeTokens(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    viaExplode.foreach { case (id, n) =>
      assert(viaText(id) == n, s"doc $id: text-expr ${viaText(id)} vs exploded $n")
    }
    // docs with no pre-tokens (none in this corpus, but contract): 0 not null
    assert(viaText.values.forall(_ > 0))
  }

  test("chunk_token_budget: lossless in-order packing, budget respected pre-token-greedily") {
    val budget = 32
    val chunks = Queries.chunkTokenBudget(spark, sf, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val byDoc = chunks.groupBy(_._1)
    val totals = Queries.bpeTokens(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    byDoc.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk indices are contiguous from 0
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq, s"doc $id gaps")
      // packing is lossless: pre-token and token sums match the doc totals
      assert(sorted.map(_._3).sum == totals(id)._1, s"doc $id pre-token count")
      assert(sorted.map(_._4).sum == totals(id)._2, s"doc $id token count")
      // greedy bound: a chunk only exceeds the budget by its final
      // pre-token (no pre-token is split), so tokens-before-last < budget
      sorted.foreach { case (_, ci, _, toks, text) =>
        val words = text.split(" ").filter(_.nonEmpty)
        val lastN = Bpe.encodeWord(words.last, Bpe.merges).length
        assert(toks - lastN < budget, s"doc $id chunk $ci overfull before its last pre-token")
      }
      // in-order reconstruction: concatenated chunks = the pre-token stream
      val joined = sorted.map(_._5).mkString(" ")
      val docText = Tables.documents(spark, sf).where(col("doc_id") === id)
        .select("text").collect().head.getString(0)
      val pre = s"(?:${Bpe.PretokenRegex})".r.findAllIn(docText.toLowerCase).mkString(" ")
      assert(joined == pre, s"doc $id chunk concatenation diverges from pre-token stream")
    }
  }

  test("recursiveChunks with bpeTokenLen: budgets hold in real tokens") {
    import graft.operators.Chunker
    val texts = Tables.documents(spark, sf).select("text").limit(10).collect().map(_.getString(0))
    texts.foreach { t =>
      val chunkSize = 64
      val chunks = Chunker.recursiveChunks(t, chunkSize, overlap = 8, minTokens = 4,
        lenFn = Chunker.bpeTokenLen)
      assert(chunks.nonEmpty)
      chunks.foreach { c =>
        // a merged chunk respects the budget unless it is a single
        // unsplittable atom (no separator left to split on)
        assert(Chunker.bpeTokenLen(c) <= chunkSize || !c.exists(" \n".contains(_)),
          s"chunk exceeds BPE budget and is splittable: '${c.take(60)}...'")
      }
      // BPE budgets produce >= as many chunks as ws budgets at equal size
      // on this corpus (BPE count >= 1 per word, > 1 for off-vocab words)
      val ws = Chunker.recursiveChunks(t, chunkSize, overlap = 8, minTokens = 4)
      assert(chunks.length >= ws.length)
    }
  }

  test("bpe_tokens query: per-doc counts equal driver-side reference, and compress vs chars") {
    val got = Queries.bpeTokens(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
    assert(got.size == docs.length)
    docs.take(25).foreach { r =>
      val pre = s"(?:${Bpe.PretokenRegex})".r.findAllIn(r.getString(1).toLowerCase).toSeq
      val exp = (pre.size.toLong, pre.map(Bpe.encodeWord(_, Bpe.merges).length.toLong).sum)
      assert(got(r.getLong(0)) == exp, s"doc ${r.getLong(0)}: ${got(r.getLong(0))} vs $exp")
      // merges learned on this corpus must actually compress letter runs
      assert(exp._2 < pre.map(_.length.toLong).sum)
    }
  }
}
