package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratified takes at most quota per stratum, deterministically") {
    val df = Tables.documents(spark, sf).select("doc_id", "lang")
    val s1 = Sampling.stratified(df, "lang", "doc_id", quota = 7)
    val perLang = s1.groupBy("lang").count().collect().map(_.getLong(1))
    assert(perLang.forall(_ <= 7))
    val ids1 = s1.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Sampling.stratified(df, "lang", "doc_id", quota = 7)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2, "same corpus must yield the same sample")
    // a different seed yields a different (but equally sized) mix
    val ids3 = Sampling.stratified(df, "lang", "doc_id", quota = 7, seed = "v2")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids3.size == ids1.size && ids3 != ids1)
  }

  test("tokenShards packs contiguous chunks within the standard tolerance") {
    val chunks = Seq(
      // doc 1: 10 chunks of 30 tokens, budget 64 → shards of ~2-3 chunks
      (1 to 10).map(i => (1L, i.toLong, 30L)),
      Seq((2L, 1L, 100L)) // oversize chunk still gets a shard
    ).flatten.toDF("doc_id", "chunk_index", "chunk_tokens")
    val sharded = Sampling.tokenShards(chunks, "doc_id", "chunk_tokens", budget = 64,
      orderCols = Seq("chunk_index"))
    // contiguity: shard_id is non-decreasing in chunk order
    val doc1 = sharded.filter(col("doc_id") === 1).orderBy("chunk_index")
      .select("shard_id").as[Long].collect().toSeq
    assert(doc1 == doc1.sorted)
    val stats = Sampling.shardStats(sharded, "doc_id", "chunk_tokens")
      .filter(col("doc_id") === 1).select("shard_tokens").as[Long].collect()
    // tolerance: every shard in [budget - max_chunk + 1, budget + max_chunk - 1]
    assert(stats.dropRight(1).forall(t => t >= 64 - 30 + 1 && t <= 64 + 30 - 1),
      s"shard sizes out of tolerance: ${stats.toSeq}")
    assert(sharded.filter(col("doc_id") === 2).select("shard_id").as[Long].head() == 0L)
  }

  test("temperatureMix keeps floor(sqrt(n_g*n_min)) per group — sqrt-flattened, smallest kept whole") {
    val df = (
      (1 to 16).map(i => (s"big", i.toLong)) ++
      (17 to 20).map(i => (s"mid", i.toLong)) ++
      Seq(("tiny", 21L))
    ).toDF("lang", "doc_id")
    val out = Sampling.temperatureMix(df, "lang", "doc_id")
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // n_min=1: big 16 -> floor(sqrt(16))=4, mid 4 -> 2, tiny 1 -> 1
    assert(kept == Map("big" -> 4L, "mid" -> 2L, "tiny" -> 1L))
    // keep RATE falls with group size (downsample-only flattening)
    assert(kept("big") / 16.0 < kept("mid") / 4.0)
    assert(kept("tiny") == 1L, "smallest group is never downsampled")
    // deterministic: same corpus, same mix
    assert(out.collect().toSeq == Sampling.temperatureMix(df, "lang", "doc_id").collect().toSeq)
  }

  test("dsirResample upweights docs matching the target token distribution") {
    import org.apache.spark.sql.functions.col
    // target docs speak 'alpha'; raw pool has alpha-like and beta-like docs
    val tgt = (1 to 10).map(i => (i.toLong, "alpha bravo charlie delta echo", true))
    val rawAlpha = (11 to 15).map(i => (i.toLong, "alpha bravo charlie foxtrot golf", false))
    val rawBeta = (16 to 20).map(i => (i.toLong, "zulu yankee xray whiskey victor", false))
    val df = (tgt ++ rawAlpha ++ rawBeta).toDF("doc_id", "text", "is_t")
    val out = Sampling.dsirResample(df, "text", "doc_id", col("is_t"), buckets = 64, topK = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val alphaW = rawAlpha.map(r => out(r._1)).sum / rawAlpha.size
    val betaW = rawBeta.map(r => out(r._1)).sum / rawBeta.size
    assert(alphaW > betaW,
      s"target-like docs must carry higher importance weight: alpha=$alphaW beta=$betaW")
    // deterministic: hash noise, not an RNG
    val again = Sampling.dsirResample(df, "text", "doc_id", col("is_t"), buckets = 64, topK = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == again)
  }

  test("shuffleShards: a permutation in global md5 order, round-robin balanced, window-free") {
    val df = (0L until 103L).toList.map(Tuple1(_)).toDF("doc_id")
    val out = Sampling.shuffleShards(df, "doc_id", seed = "s1", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the id column keeps its input type (long), positions are a permutation
    assert(out.map(_._2).sorted.toSeq == (0L until 103L))
    // position order equals lexicographic md5 order
    val byPos = out.sortBy(_._2).map(_._1)
    val expected = (0L until 103L).sortBy(id =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(s"s1:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString, id.toString))
    assert(byPos.toSeq == expected)
    // round-robin: shard sizes within one; pos_in_shard dense per shard
    val sizes = out.groupBy(_._3).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: $sizes")
    out.groupBy(_._3).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq == (0L until g.length))
    }
    // different seed ⇒ different permutation; same seed ⇒ identical
    val again = Sampling.shuffleShards(df, "doc_id", seed = "s1", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val other = Sampling.shuffleShards(df, "doc_id", seed = "s2", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.exists { case (id, pos, _, _) => other(id) != pos })
    // the plan must not contain a partition-less window
    val plan = Sampling.shuffleShards(df, "doc_id", "s1", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window leaked into the shuffle plan:\n$plan")
  }

  test("groupSplit: leakage-safe — a group's docs can never straddle the boundary") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    // 40 sources x 25 docs; each source holds planted near-dup pairs
    // (docs i and i+1 share text) that a per-DOC split would separate
    val rows = for (s <- 0 until 40; i <- 0 until 25)
      yield (s.toLong * 100 + i, s"src_$s", s"shared text of source $s pair ${i / 2}")
    val df = rows.toDF("doc_id", "source", "text")
    val split = Sampling.groupSplit(df, "source", seed = "s")
    // every source appears in exactly one split
    val perSource = split.groupBy("source")
      .agg(countDistinct("split").as("n")).collect()
    assert(perSource.forall(_.getLong(1) == 1L))
    // so no near-dup pair straddles: both members inherit the source's split
    val pairSplits = split
      .groupBy("text").agg(countDistinct("split").as("n")).collect()
    assert(pairSplits.forall(_.getLong(1) == 1L),
      "near-dup pairs must land on one side of the split")
    // all three splits are populated at 40 groups and 90/5/5 is roughly honored
    val sizes = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("train", "val", "test"), sizes.toString)
    assert(sizes("train") > sizes("val") && sizes("train") > sizes("test"))
    // deterministic: same seed -> identical assignment; new seed -> different
    val again = Sampling.groupSplit(df, "source", seed = "s")
      .select("doc_id", "split").collect().toSet
    assert(again == split.select("doc_id", "split").collect().toSet)
    val other = Sampling.groupSplit(df, "source", seed = "different")
      .select("doc_id", "split").collect().toSet
    assert(other != again, "a different seed must move some group")
  }

  test("shuffleShards: salted exchange bounds partitions under a planted hot key") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, md5, spark_partition_id, count}
    // 70% of rows share ONE id — the distribution that collapses an
    // unsalted (_sk, _id) range exchange onto a single task
    val n = 20000
    val rows = (0 until n).map(i => if (i % 10 < 7) 42L else i.toLong)
    val df = rows.map(Tuple1(_)).toDF("doc_id")
    val keyed = df.select(
      col("doc_id").cast("string").as("_id"),
      md5(concat_ws(":", lit("s1"), col("doc_id").cast("string"))).as("_sk"))
    val parts = spark.sparkContext.defaultParallelism
    val sizes = Sampling.saltedRangeExchange(keyed, parts, "s1")
      .groupBy(spark_partition_id().as("p")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(sizes.max <= 2L * n / parts + 64,
      s"hot key must spread across partitions: max ${sizes.max} of $n rows, $parts parts")
    assert(sizes.count(_ > 0) > parts / 2,
      s"most partitions should carry rows: ${sizes.toSeq.sorted.reverse.take(8)}")

    // the hot-key output is still a valid permutation with dense
    // consecutive positions for the duplicated id (interchangeable rows)
    val out = Sampling.shuffleShards(df, "doc_id", seed = "s1", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == n)
    assert(out.map(_._2).sorted.toSeq == (0L until n.toLong))
    val hotPositions = out.filter(_._1 == 42L).map(_._2).sorted
    assert(hotPositions.length == 7 * n / 10)
    assert(hotPositions.last - hotPositions.head == hotPositions.length - 1,
      "equal-key rows must occupy one contiguous run of the global order")
  }

  test("doremiWeights upweights the domain the proxy LM fits worst") {
    // domain 'ood' is gibberish (all-OOV under the checked-in LM →
    // max NLL); 'common' reuses frequent corpus words (low NLL)
    val rows =
      (0 until 30).map(i => (i.toLong, "common", "the a value table part row key")) ++
        (100 until 130).map(i => (i.toLong, "ood", s"zzqx$i wvvk$i qqje$i xxoo$i ppra$i"))
    val df = rows.toDF("doc_id", "source", "text")
    val out = Sampling.doremiWeights(df, "text", "source", "doc_id")
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (nllC, exC, wC) = out("common")
    val (nllO, exO, wO) = out("ood")
    assert(nllO > nllC, "gibberish must score a higher proxy loss")
    assert(exC == 0.0 && exO > 0.0, s"only the worse-than-mean domain has excess: $out")
    assert(wO > wC, "the high-excess domain must be upweighted")
    assert(math.abs(wO + wC - 1.0) < 1e-4, "weights sum to 1 (within rounding)")
    // closed form: w = 0.8 * exp(2.5*excess)/Z + 0.2/2
    val rawC = math.exp(2.5 * exC); val rawO = math.exp(2.5 * exO)
    val z = rawC + rawO
    assert(math.abs(wO - (0.8 * rawO / z + 0.1)) < 1e-4, s"closed form mismatch: $wO")
  }

  test("unimaxWeights: capped domains keep epochCap epochs, the rest share the level, budget exhausted") {
    // tokens per doc = 4; domains sized 2/6/40 docs → 8/24/160 tokens
    val rows =
      (0 until 2).map(i => (s"tiny", "one two three four")) ++
        (0 until 6).map(i => (s"small", "one two three four")) ++
        (0 until 40).map(i => (s"big", "one two three four"))
    val df = rows.toDF("source", "text")
    val out = Sampling.unimaxWeights(df, "text", "source", epochCap = 2L, budgetFrac = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getDouble(4), r.getDouble(5))).toMap
    // total = 192, budget = 96; caps = 16/48/320 sorted (tiny, small, big)
    //   tiny:  16*3 + 0  = 48  <= 96 → capped at 16 (2 epochs)
    //   small: 48*2 + 16 = 112 > 96  → level = (96-16)/2 = 40
    //   big:   uncapped → 40 tokens = 0.25 epochs
    assert(out("tiny") == ((8L, 16L, true, 16.0, 2.0)), out.toString)
    assert(out("small") == ((24L, 48L, false, 40.0, 1.66667)), out.toString)
    assert(out("big")._3 == false && out("big")._4 == 40.0 && out("big")._5 == 0.25)
    // allocations exhaust the budget exactly
    assert(out.values.map(_._4).sum == 96.0)
    // no domain exceeds its epoch cap
    assert(out.values.forall { case (n, cap, _, a, _) => a <= cap && cap == 2 * n })
  }

  test("unimaxWeights: budget above the epoch-capped supply caps every domain") {
    val rows = (0 until 4).map(_ => ("a", "w x y z")) ++ (0 until 8).map(_ => ("b", "w x y z"))
    val out = Sampling.unimaxWeights(rows.toDF("source", "text"), "text", "source",
        epochCap = 1L, budgetFrac = 1.0)
      .collect().map(r => r.getString(0) -> (r.getBoolean(3), r.getDouble(5))).toMap
    assert(out("a") == ((true, 1.0)) && out("b") == ((true, 1.0)), out.toString)
  }
}
