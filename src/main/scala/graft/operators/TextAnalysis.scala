package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus text analytics for training-data pipelines: language ID,
  * quality scoring, token statistics, fingerprinting.
  *
  * All pure built-in expressions (codegen) over a documents DataFrame;
  * aggregations are partial-agg friendly. The heuristics are
  * intentionally simple and deterministic — the point at 100 TB is the
  * *shape* (per-row scoring then hash-partitioned aggregation), not
  * model quality.
  */
object TextAnalysis {

  /** Stopword lists used by the language-ID heuristic. Order of the
    * CASE evaluation below is the tie-break (first wins).
    */
  val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "and", "of", "is", "to"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "le", "he", "zai")
  )

  /** Per-doc language prediction by stopword-hit argmax; 'und' when no
    * list matches. Deterministic tie-break: list order above.
    */
  def langId(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = TextOps.tokenize(col(textCol))
    val counts = StopwordsByLang.map { case (lang, words) =>
      lang -> TextOps.stopwordCount(toks, words)
    }
    val maxCount = greatest(counts.map(_._2): _*)
    // CASE chain in list order: the first language reaching the max wins.
    val cases = counts.foldRight(lit("und")) { case ((lang, c), els) =>
      when(c === maxCount && maxCount > 0, lang).otherwise(els)
    }
    df.select(
      col(idCol),
      col("lang").as("claimed_lang"),
      cases.as("predicted_lang")
    ).withColumn("agree", col("claimed_lang") === col("predicted_lang"))
  }

  /** Per-language corpus stats from a pre-exploded token table. */
  def corpusStats(tokens: DataFrame, groupCol: String, idCol: String): DataFrame =
    tokens
      .groupBy(col(groupCol))
      .agg(
        countDistinct(col(idCol)).as("docs"),
        count("*").as("total_tokens"),
        countDistinct(col("term")).as("distinct_terms")
      )
      .orderBy(col(groupCol))

  /** Top-k terms per group via window row_number (never a self-join). */
  def topTermsPerGroup(tokens: DataFrame, groupCol: String, k: Int): DataFrame = {
    val counted = tokens.groupBy(col(groupCol), col("term")).agg(count("*").as("cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("cnt").desc, col("term"))
    counted
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col(groupCol), col("rk"))
  }

  /** Deterministic quality score in [0,1]:
    * 0.5 * min(1, n_tokens/64) + 0.5 * min(1, 5 * stopword_ratio).
    * Length and stopword density are the standard cheap proxies. The
    * weights are binary-exact (0.5) and the length denominator a power
    * of two, so the common paths produce exactly-representable doubles —
    * no round-boundary divergence between engines.
    */
  def qualityScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = TextOps.tokenize(col(textCol))
    val n = size(toks).cast("double")
    val stops = TextOps
      .stopwordCount(toks, StopwordsByLang.toMap.apply("en"))
      .cast("double")
    val stopRatio = when(n > 0, stops / n).otherwise(lit(0.0))
    val score =
      least(lit(1.0), n / 64.0) * 0.5 + least(lit(1.0), stopRatio * 5.0) * 0.5
    df.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      round(stopRatio, 4).as("stop_ratio"),
      round(score, 4).as("quality")
    )
  }

  /** Corpus curation cut: keep rows whose score sits at or above the
    * `minQuantile` percentile WITHIN their group (per-language quality
    * thresholds, not one global cut — the shape quality filtering takes
    * in a multilingual training corpus). percent_rank over one window —
    * a single shuffle on the group key; the rank is rounded so the cut
    * is reproducible cross-engine.
    */
  def quantileFilter(
      scored: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      minQuantile: Double
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(scoreCol), col(idCol))
    scored
      .withColumn("q_rank", round(percent_rank().over(w), 6))
      .filter(col("q_rank") >= minQuantile)
  }

  /** Min-shingle-hash fingerprint per document — a 1-permutation MinHash
    * usable as a cheap near-dup blocking key at corpus scale.
    * Explode + partial-agg min/count: md5 runs codegen'd once per
    * shingle, and the aggregation shape is 100 TB-safe.
    */
  def fingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), TextOps.tokenize(col(textCol)).as("toks"))
      // tokens bound to an attribute BEFORE the generator: GenerateExec
      // has no subexpression elimination, so an inlined tokenize would
      // re-run inside every element_at of the shingle lambda.
      .select(col(idCol), explode(array_distinct(TextOps.rawShingles(col("toks")))).as("raw"))
      .select(col(idCol), md5(col("raw")).as("shm"))
      .groupBy(col(idCol))
      .agg(
        min(col("shm")).as("fingerprint"),
        count("*").cast("long").as("n_shingles")
      )

  /** PII patterns shared with the oracle (kept to constructs with
    * identical Java-regex / RE2 semantics: explicit classes, no
    * lookaround).
    */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Redact emails/phones, reporting counts — the training-data PII
    * scrub pass (pure codegen'd regexp expressions, one map stage).
    */
  def piiScrub(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      regexp_count(col(textCol), lit(EmailPattern)).cast("long").as("emails"),
      regexp_count(col(textCol), lit(PhonePattern)).cast("long").as("phones"),
      md5(
        regexp_replace(
          regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>")
      ).as("scrubbed_hash")
    )

  /** Benchmark-contamination check: per corpus doc, the fraction of its
    * distinct 3-token shingles that appear anywhere in the benchmark
    * set. The benchmark shingle set is distinct + broadcast (tiny
    * relative to the corpus); the corpus streams once.
    */
  def contamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      idCol: String
  ): DataFrame = {
    def shingleRows(df: DataFrame, keep: Seq[org.apache.spark.sql.Column]) =
      df.select(keep :+ TextOps.tokenize(col(textCol)).as("_toks"): _*)
        .select(keep :+ explode(array_distinct(TextOps.rawShingles(col("_toks")))).as("raw"): _*)
        .withColumn("shm", md5(col("raw"))).drop("raw")
    val bench = shingleRows(benchmark, Seq.empty).select("shm").distinct()
    shingleRows(corpus, Seq(col(idCol)))
      .join(broadcast(bench.withColumn("_hit", lit(1L))), Seq("shm"), "left_outer")
      .groupBy(col(idCol))
      .agg(
        count("*").as("n_shingles"),
        count(col("_hit")).as("n_contaminated")
      )
      .withColumn("ratio",
        round(col("n_contaminated").cast("double") / col("n_shingles").cast("double"), 4))
  }

  /** Explode a documents DataFrame to one row per token occurrence,
    * keeping `keep` columns — the shared input for corpusStats /
    * topTermsPerGroup / BM25.
    */
  def tokenTable(df: DataFrame, textCol: String, keep: Seq[String]): DataFrame =
    df.select(keep.map(col) :+ explode(TextOps.tokenize(col(textCol))).as("term"): _*)
}
