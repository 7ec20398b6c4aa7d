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

  /** Gopher-style per-document repetition signals (Rae et al. 2021,
    * §A1.1 repetition filters; same family as C4's heuristics): the
    * fraction of repeated (non-empty, trimmed) lines, the share of
    * tokens covered by the single most frequent 2-gram (overlaps can
    * push it past 1.0 on degenerate docs — kept unclamped, as in the
    * paper), and the share of 5-gram occurrences that are duplicates.
    * `keep` applies the Gopher-ish thresholds (0.3 / 0.2 / 0.15) to the
    * ROUNDED fractions so the flag is engine-portable.
    *
    * Shape at scale: line stats are a pure projection; both gram sizes
    * ride ONE tagged explode (gram text md5'd at top level — the
    * shuffle carries 16-byte hashes, never raw text) into two
    * partial-agg shuffles on (doc, n, gram) then (doc, n). Linear work,
    * no windows, no skew exposure beyond doc length itself.
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lines = filter(transform(split(col(textCol), "\n"), l => trim(l)), l => l =!= "")
    val base = df.select(
      col(idCol),
      TextOps.tokenize(col(textCol)).as("_toks"),
      lines.as("_lines"))
    val lineStats = base.select(
      col(idCol),
      size(col("_toks")).cast("long").as("n_tokens"),
      size(col("_lines")).cast("long").as("n_lines"),
      (size(col("_lines")) - size(array_distinct(col("_lines")))).cast("long").as("dup_lines"))
    // one explode for both gram sizes: the array must be a BOUND column
    // (GenerateExec has no CSE — see PLANS.md codegen notes)
    val tagged = base.select(
      col(idCol),
      concat(
        transform(TextOps.rawShingles(col("_toks"), 2), g => struct(lit(2L).as("n"), g.as("g"))),
        transform(TextOps.rawShingles(col("_toks"), 5), g => struct(lit(5L).as("n"), g.as("g")))
      ).as("_ngrams"))
    val grams = tagged
      .select(col(idCol), explode(col("_ngrams")).as("ng"))
      .select(col(idCol), col("ng.n").as("n"), md5(col("ng.g")).as("g"))
    val perN = grams
      .groupBy(col(idCol), col("n"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol), col("n")).agg(
        max(col("c")).as("maxc"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dupc"),
        sum(col("c")).as("totc"))
    val pivoted = perN.groupBy(col(idCol)).agg(
      max(when(col("n") === 2, col("maxc"))).as("max2"),
      max(when(col("n") === 5, col("dupc"))).as("dup5"),
      max(when(col("n") === 5, col("totc"))).as("tot5"))
    lineStats
      .join(pivoted, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_tokens"),
        col("n_lines"),
        round(when(col("n_lines") > 0,
          col("dup_lines").cast("double") / col("n_lines")).otherwise(lit(0.0)), 5)
          .as("dup_line_frac"),
        round(when(col("n_tokens") > 0,
          (coalesce(col("max2"), lit(0L)) * 2).cast("double") / col("n_tokens")).otherwise(lit(0.0)), 5)
          .as("top_2gram_frac"),
        round(when(coalesce(col("tot5"), lit(0L)) > 0,
          col("dup5").cast("double") / col("tot5")).otherwise(lit(0.0)), 5)
          .as("dup_5gram_frac"))
      .withColumn("keep",
        col("dup_line_frac") <= 0.3 && col("top_2gram_frac") <= 0.2 &&
          col("dup_5gram_frac") <= 0.15)
      .orderBy(idCol)
  }

  /** Checked-in linear quality-classifier weights (64 hashed-BoW
    * coefficients + intercept), trained offline by
    * `graft.tools.TrainQuality` — the DCLM/fastText model-based-quality
    * pattern with training decoupled from distributed scoring.
    */
  lazy val qualityWeights: (Array[Double], Double) = {
    val in = getClass.getResourceAsStream("/graft/quality_weights.txt")
    require(in != null, "resource graft/quality_weights.txt missing — run graft.tools.TrainQuality")
    val vals = scala.io.Source.fromInputStream(in)(scala.io.Codec.UTF8)
      .getLines().map(_.trim).filter(_.nonEmpty).map(_.toDouble).toArray
    (vals.init, vals.last)
  }

  /** Model-based quality filter (Li'24 DCLM §4.2 / fastText classifier
    * filtering): sigmoid(w · hashedBoW(text) + b) per document with the
    * CHECKED-IN weights — scoring is one explode + two partial-agg
    * shuffles + a 64-row broadcast join, no model runtime on the
    * executors. Any linear model retrained offline (e.g. on human
    * labels) drops into the same artifact file.
    */
  def modelQuality(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val (w, b) = qualityWeights
    import spark.implicits._
    val weights = w.zipWithIndex.map { case (wt, d) => (d.toLong, wt) }
      .toSeq.toDF("dim", "w")
    df.select(col(idCol), explode(TextOps.tokenize(col(textCol))).as("term"))
      .select(col(idCol), TextOps.hashedBowDim(col("term")).as("dim"))
      .groupBy(col(idCol), col("dim")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(weights), Seq("dim"))
      .groupBy(col(idCol))
      .agg(sum(col("w") * col("cnt")).as("z"))
      .select(
        col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-(col("z") + lit(b)))), 5).as("quality_prob"),
        // logit sign, not rounded-prob >= 0.5: sigmoid-monotone and
        // exactly portable (no round-boundary coupling to exp())
        ((col("z") + lit(b)) >= 0).as("keep"))
      .orderBy(idCol)
  }

  /** CCNet-style line-level corpus dedup (Wenzek'19 §4.1 — the
    * boilerplate pass C4/CCNet run before doc-level dedup): a non-blank
    * line appearing in >= minDocs DISTINCT documents is boilerplate
    * (nav bars, cookie banners, footers); drop those lines and
    * reconstruct each document from what remains.
    *
    * Shape at scale: lines explode once, keyed by md5(trim(line)) so
    * every shuffle carries 16-byte hashes; doc-frequency is two
    * partial-agg shuffles ((h,doc) dedup, then h); the boilerplate set
    * is SMALL by construction (only lines repeated across >= minDocs
    * docs survive the filter) so it broadcasts to mark lines — no
    * corpus-sized join. Reconstruction is one groupBy(doc) with a
    * sorted collect_list, bounded by single-doc size.
    */
  def lineDedup(df: DataFrame, textCol: String, idCol: String, minDocs: Int = 3): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .select(col(idCol), col("pos"), col("line"),
        md5(trim(col("line"))).as("h"), (trim(col("line")) === "").as("blank"))
    val boilerplate = lines
      .filter(!col("blank"))
      .select(col(idCol), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("docs_with_line"))
      .filter(col("docs_with_line") >= minDocs)
      .select(col("h"), lit(true).as("bp"))
    lines
      .join(broadcast(boilerplate), Seq("h"), "left")
      .withColumn("drop", coalesce(col("bp"), lit(false)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("drop"), 1L).otherwise(0L)).as("dropped_lines"),
        concat_ws("\n",
          transform(
            sort_array(collect_list(when(!col("drop"), struct(col("pos"), col("line"))))),
            s => s.getField("line"))).as("clean_text"))
      .orderBy(idCol)
  }

  /** The eight Gopher stopwords for the "≥2 distinct hits" rule. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style QUALITY filters (Rae et al. 2021, §A1.1 — the
    * non-repetition half; [[repetitionStats]] covers the other):
    * word-count window, mean word length window, symbol-to-word ratio
    * ('#' and '…'-as-'...'), bullet-line and ellipsis-line fractions,
    * fraction of words containing an alphabetic character, and the
    * ≥2-distinct-stopwords floor. `keep` applies the paper's default
    * thresholds to the ROUNDED ratios (engine-portable).
    *
    * Words here are WHITESPACE tokens (punctuation kept) — the paper's
    * notion, distinct from the canonical alnum tokenizer — so the
    * alphabetic-fraction and word-length rules see real symbols.
    * Shape at scale: one pure codegen'd projection, no shuffle.
    */
  def gopherQuality(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = filter(split(col(textCol), "\\s+"), w => w =!= "")
    val nWords = size(words).cast("long")
    val sumLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val lines = filter(transform(split(col(textCol), "\n"), l => trim(l)), l => l =!= "")
    val nLines = size(lines).cast("long")
    val symbolHits =
      regexp_count(col(textCol), lit("#")) + regexp_count(col(textCol), lit("\\.\\.\\."))
    def frac(num: Column, den: Column): Column =
      round(when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0)), 5)
    df.select(
      col(idCol),
      nWords.as("n_words"),
      frac(sumLen, nWords).as("mean_word_len"),
      frac(symbolHits, nWords).as("symbol_ratio"),
      frac(size(filter(lines, l => l.rlike("^[-*]"))), nLines).as("bullet_frac"),
      frac(size(filter(lines, l => l.rlike("\\.\\.\\.$"))), nLines).as("ellipsis_frac"),
      frac(size(filter(words, w => w.rlike("[A-Za-z]"))), nWords).as("alpha_frac"),
      size(array_intersect(
        array_distinct(TextOps.tokenize(col(textCol))),
        array(GopherStopwords.map(lit): _*))).cast("long").as("stop_hits"))
      .withColumn("keep",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_frac") <= 0.9 && col("ellipsis_frac") <= 0.3 &&
          col("alpha_frac") >= 0.8 && col("stop_hits") >= 2)
      .orderBy(idCol)
  }

  /** C4-style heuristic cleanup flags (Raffel et al. 2020, §2.2 — the
    * published rules behind the C4 corpus): fraction of lines ending in
    * terminal punctuation (C4 keeps punct-terminated lines), a sentence
    * floor (C4 drops pages under 3 sentences), and the three content
    * tripwires — "lorem ipsum", curly braces (code), the token
    * "javascript" (boilerplate warnings). Emitted per rule so a
    * curation pipeline can tune the combination; `keep` applies the
    * C4 defaults on the ROUNDED fraction (engine-portable).
    *
    * Shape at scale: one pure codegen'd projection per row — string
    * predicates + one HOF over the split lines; no explode, no
    * shuffle, no state.
    */
  def c4Filters(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lines = filter(transform(split(col(textCol), "\n"), l => trim(l)), l => l =!= "")
    val nLines = size(lines).cast("long")
    val terminalLines = size(filter(lines, l => l.rlike("[.!?\"]$"))).cast("long")
    val sentMarks = regexp_count(col(textCol), lit("[.!?]")).cast("long")
    df.select(
      col(idCol),
      nLines.as("n_lines"),
      round(when(nLines > 0, terminalLines.cast("double") / nLines.cast("double"))
        .otherwise(lit(0.0)), 5).as("terminal_line_frac"),
      sentMarks.as("sent_marks"),
      contains(lower(col(textCol)), lit("lorem ipsum")).as("has_lorem"),
      contains(col(textCol), lit("{")).as("has_brace"),
      array_contains(TextOps.tokenize(col(textCol)), "javascript").as("has_js"))
      .withColumn("keep",
        col("terminal_line_frac") >= 0.5 && col("sent_marks") >= 3 &&
          !col("has_lorem") && !col("has_brace") && !col("has_js"))
      .orderBy(idCol)
  }

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
