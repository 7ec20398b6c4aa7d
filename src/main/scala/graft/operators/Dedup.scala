package graft.operators

import graft.functions.{TextOps, VectorOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Deduplication suite for LLM training-data pipelines.
  *
  * Reference anchors: content-hash dedup ingestor.py:182-205 (sha256 +
  * skip-if-unchanged) and store.py:206 `find_existing`. Everything else
  * (MinHash/LSH, n-gram Jaccard, SimHash, embedding near-dup) extends
  * the surface for corpus-scale cleaning.
  *
  * Scale design: no operator ever forms a global cross join. Candidate
  * pairs come only from hash-bucket joins (LSH bands) or explicit blocks;
  * the expensive verify step (exact Jaccard / cosine) runs on candidates
  * only. All joins key on fixed-width hashes, so shuffles carry 16-byte
  * keys rather than document text.
  */
object Dedup {

  /** Exact dedup groups: one row per content hash that occurs more than
    * once, with the kept (minimum) id and the duplicate count.
    * Hash-partitioned groupBy — embarrassingly scalable.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(
        min(col(idCol)).as(s"keeper_$idCol"),
        count("*").as("dup_count")
      )
      .filter(col("dup_count") > 1)

  /** Exact dedup keep-first: drop all but the min-id row per hash. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** MinHash + banded-LSH near-duplicate pairs with exact-Jaccard verify.
    *
    * Pipeline: tokens → k-shingles (md5) → `numHashes` min-hashes →
    * bands of 2 → candidate pairs share ≥1 band key → verified Jaccard
    * over distinct shingle sets, keep pairs ≥ threshold.
    *
    * The band join is the only shuffle of pair-like data and its
    * cardinality is |bucket|² summed over buckets — at 100 TB the band
    * keys keep buckets tiny, so the all-pairs blow-up never happens.
    */
  def minHashLshPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 8,
      shingleK: Int = 3,
      threshold: Double = 0.3
  ): DataFrame = {
    require(numHashes % 2 == 0, "bands of 2 need an even numHashes")
    // One row per (doc, distinct shingle): md5 runs as a top-level
    // codegen'd projection, once per shingle — never inside a lambda.
    // Tokens are bound to an attribute before the explode (GenerateExec
    // has no CSE — an inlined tokenize would re-run per element_at).
    val shRows = df
      .select(col(idCol), TextOps.tokenize(col(textCol)).as("_toks"))
      .select(
        col(idCol),
        explode(array_distinct(TextOps.rawShingles(col("_toks"), shingleK))).as("raw")
      )
      .select(col(idCol), md5(col("raw")).as("shm"))

    // Signature + the shingle set in ONE hash-partitioned aggregation:
    // each min-hash is a partial-agg min — the 100 TB-safe shape.
    val minCols = (0 until numHashes).map { seed =>
      min(md5(concat(lit(s"$seed:"), col("shm")))).as(s"h$seed")
    }
    val aggCols = minCols :+ collect_set(col("shm")).as("sh")
    val sig = shRows
      .groupBy(col(idCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .cache() // read 3x below (bands + both verify sides); O(docs) rows

    val bandCols = (0 until numHashes by 2).map { i =>
      md5(concat(col(s"h$i"), col(s"h${i + 1}")))
    }
    val banded = sig.select(col(idCol), posexplode(array(bandCols: _*)).as(Seq("band", "key")))

    // Candidate pairs: same (band, key), ordered ids, distinct.
    val a = banded.select(col("band"), col("key"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("key"), col(idCol).as("id_b"))
    val candidates = a
      .join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()

    verifyJaccard(candidates, sig.select(col(idCol), col("sh")), idCol, threshold)
  }

  /** Exact Jaccard over md5-shingle sets for given candidate pairs. */
  private def verifyJaccard(
      candidates: DataFrame,
      withShingles: DataFrame, // (idCol, sh: array<string> distinct)
      idCol: String,
      threshold: Double
  ): DataFrame = {
    val sa = withShingles.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val sb = withShingles.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    candidates
      .join(sa, "id_a")
      .join(sb, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", (size(col("sh_a")) + size(col("sh_b"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Blocked pairwise n-gram Jaccard: all pairs *within a block* only.
    * Pass a small blocking predicate/projection; never run unblocked at
    * scale (that is what [[minHashLshPairs]] is for).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleK: Int = 3
  ): DataFrame = {
    val s = df
      .select(col(idCol), TextOps.tokenize(col(textCol)).as("_toks"))
      .select(col(idCol), array_distinct(TextOps.shingles(col("_toks"), shingleK)).as("sh"))
    val sa = s.select(col(idCol).as("id_a"), col("sh").as("sh_a"))
    val sb = s.select(col(idCol).as("id_b"), col("sh").as("sh_b"))
    sa.crossJoin(sb)
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", (size(col("sh_a")) + size(col("sh_b"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 4))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash signature per row, rendered as a 64-char '0'/'1'
    * string, computed with ONE md5 per token: explode → md5 as a
    * top-level codegen'd column → 16 hex-digit values → 64 bit-sums in
    * a single partial-agg-friendly hash aggregation. Bit j is the sign
    * of Σ_tokens (±1), i.e. set when more than half the token hashes
    * have bit j set. Rows with zero tokens produce no signature (the
    * explode drops them) — identical on the DuckDB side.
    */
  def simHash64(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val hashed = df
      .select(col(idCol), TextOps.tokenize(col(textCol)).as("_toks"))
      .select(col(idCol), explode(col("_toks")).as("_t"))
      .select(col(idCol), md5(col("_t")).as("_h"))
    // 16 hex digits of the first 16 chars = 64 bits, shared via CSE.
    val digits = hashed.select(
      col(idCol) +: (1 to 16).map(p =>
        conv(substring(col("_h"), p, 1), 16, 10).cast("int").as(s"_v$p")): _*
    )
    val bitSums = (0 until 64).map { j =>
      val p = j / 4 + 1
      val k = 3 - j % 4
      sum(shiftright(col(s"_v$p"), k).bitwiseAND(lit(1))).as(s"_c$j")
    }
    val aggd = digits.groupBy(col(idCol)).agg(count(lit(1)).as("_n"), bitSums: _*)
    val sig = concat((0 until 64).map(j =>
      when(col(s"_c$j") * 2 > col("_n"), lit("1")).otherwise(lit("0"))): _*)
    aggd.select(col(idCol), sig.as("simhash64"))
  }

  /** SimHash near-dup pairs via hamming-band bucketing: the 64-bit
    * signature splits into `bands` equal substrings; docs sharing any
    * band become candidates (pigeonhole: every pair within hamming
    * `bands - 1` shares at least one clean band), then the exact
    * hamming distance filters to ≤ maxHamming. Candidate generation is
    * a hash join on short band keys — never all-pairs.
    */
  def simHashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bands: Int = 8,
      maxHamming: Int = 7
  ): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(maxHamming < bands, "band guarantee needs maxHamming < bands")
    val width = 64 / bands
    val sig = simHash64(df, textCol, idCol).cache() // O(docs) fixed-width rows
    val banded = sig.select(
      col(idCol), col("simhash64"),
      posexplode(array((0 until bands).map(b =>
        substring(col("simhash64"), b * width + 1, width)): _*)).as(Seq("band", "key"))
    )
    val a = banded.select(col("band"), col("key"), col(idCol).as("id_a"), col("simhash64").as("sig_a"))
    val b = banded.select(col("band"), col("key"), col(idCol).as("id_b"), col("simhash64").as("sig_b"))
    val candidates = a
      .join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .distinct()
    // O(candidates) verify — 64 char compares per surviving pair.
    val ham = size(filter(
      sequence(lit(1), lit(64)),
      i => substr(col("sig_a"), i, lit(1)) =!= substr(col("sig_b"), i, lit(1))
    )).cast("long")
    candidates
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding near-duplicate pairs, blocked by a partition column
    * (label locally; an LSH bucket or coarse-quantizer cell at scale).
    * Cosine is computed only within blocks.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      blockCol: String,
      threshold: Double
  ): DataFrame = {
    // O(pairs) hot path: the native codegen'd cosine_sim expression —
    // one fused loop per pair, no interpreted HOF fallback.
    graft.plans.GraftFunctions.register(df.sparkSession)
    val a = df.select(col(blockCol), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(blockCol), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", VectorOps.cosineFastRounded(col("v_a"), col("v_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col(blockCol), col("id_a"), col("id_b"), col("cos_sim"))
  }
}
