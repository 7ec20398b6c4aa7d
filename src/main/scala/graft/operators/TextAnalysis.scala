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

  /** Max run length over a SORTED string array — i.e. the count of the
    * most frequent element — as one per-row `aggregate` fold. The
    * `run > 0` guard makes the "" zero-value sentinel inert on the
    * first element.
    */
  private def maxRunLen(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("run") > 0 && x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Number of elements occurring EXACTLY once in a sorted string
    * array: a run of length 1 closes whenever the element changes (or
    * at the end of the fold).
    */
  private def singletonRuns(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("singles")),
      (acc, x) => {
        val closesSingle = acc.getField("run") === 1 && x =!= acc.getField("prev")
        val run = when(acc.getField("run") > 0 && x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          (acc.getField("singles") + when(closesSingle, 1L).otherwise(0L)).as("singles"))
      },
      acc => acc.getField("singles") +
        when(acc.getField("run") === 1, 1L).otherwise(0L))

  /** Gopher repetition signals (Rae et al. 2021, §A1.1 repetition
    * filters) as ONE struct column — a pure per-row projection: the
    * fraction of repeated (non-empty, trimmed) lines, the share of
    * tokens covered by the single most frequent 2-gram (overlaps can
    * push it past 1.0 on degenerate docs — kept unclamped, as in the
    * paper), and the share of 5-gram occurrences that are duplicates.
    * `keep` applies the Gopher-ish thresholds (0.3 / 0.2 / 0.15) to the
    * ROUNDED fractions so the flag is engine-portable.
    *
    * Shape at scale: gram frequencies come from a per-row sort + run
    * fold over the shingle arrays (O(n log n) in DOC length, bounded by
    * the longest document) — no explode, no shuffle, so the scorer
    * composes with other per-row scorers in a single corpus scan
    * ([[graft.Queries.curationReport]] relies on exactly that).
    */
  def repetitionStruct(text: Column): Column = {
    val toks = TextOps.tokenize(text)
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")
    val nTokens = size(toks).cast("long")
    val nLines = size(lines).cast("long")
    val dupLines = (size(lines) - size(array_distinct(lines))).cast("long")
    // raw gram strings, not md5: per-row equality is exact and skips a
    // hash per gram (nothing shuffles here, so payload width is moot)
    val max2 = maxRunLen(sort_array(TextOps.rawShingles(toks, 2)))
    val g5 = sort_array(TextOps.rawShingles(toks, 5))
    val tot5 = size(g5).cast("long")
    val dup5 = tot5 - singletonRuns(g5)
    val dupLineFrac = round(
      when(nLines > 0, dupLines.cast("double") / nLines).otherwise(lit(0.0)), 5)
    val top2Frac = round(
      when(nTokens > 0, (max2 * 2).cast("double") / nTokens).otherwise(lit(0.0)), 5)
    val dup5Frac = round(
      when(tot5 > 0, dup5.cast("double") / tot5).otherwise(lit(0.0)), 5)
    struct(
      nTokens.as("n_tokens"),
      nLines.as("n_lines"),
      dupLineFrac.as("dup_line_frac"),
      top2Frac.as("top_2gram_frac"),
      dup5Frac.as("dup_5gram_frac"),
      (dupLineFrac <= 0.3 && top2Frac <= 0.2 && dup5Frac <= 0.15).as("keep"))
  }

  /** [[repetitionStruct]] expanded to a per-document DataFrame. */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), repetitionStruct(col(textCol)).as("s"))
      .select(idCol, "s.*")
      .orderBy(idCol)

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
  def gopherQuality(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), gopherStruct(col(textCol)).as("s"))
      .select(idCol, "s.*")
      .orderBy(idCol)

  /** The [[gopherQuality]] signals as ONE struct column (pure per-row
    * projection — composable into a single corpus scan). The symbol and
    * ellipsis rules match both the ASCII `...` and the Unicode `…`
    * form; the bullet class covers `-`, `*` and `•` (Rae'21 lists the
    * bullet/ellipsis symbols, not their encodings).
    */
  def gopherStruct(text: Column): Column = {
    val words = filter(split(text, "\\s+"), w => w =!= "")
    val nWords = size(words).cast("long")
    val sumLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")
    val nLines = size(lines).cast("long")
    val symbolHits =
      regexp_count(text, lit("#")) + regexp_count(text, lit("(\\.\\.\\.|…)"))
    def frac(num: Column, den: Column): Column =
      round(when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0)), 5)
    val meanWordLen = frac(sumLen, nWords)
    val symbolRatio = frac(symbolHits, nWords)
    val bulletFrac = frac(size(filter(lines, l => l.rlike("^[-*•]"))), nLines)
    val ellipsisFrac = frac(size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))), nLines)
    val alphaFrac = frac(size(filter(words, w => w.rlike("[A-Za-z]"))), nWords)
    val stopHits = size(array_intersect(
      array_distinct(TextOps.tokenize(text)),
      array(GopherStopwords.map(lit): _*))).cast("long")
    struct(
      nWords.as("n_words"),
      meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"),
      alphaFrac.as("alpha_frac"),
      stopHits.as("stop_hits"),
      (nWords >= 50 && nWords <= 100000 &&
        meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
        symbolRatio <= 0.1 &&
        bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
        alphaFrac >= 0.8 && stopHits >= 2).as("keep"))
  }

  /** C4 heuristic cleanup (Raffel et al. 2020, §2.2 — the published
    * rules behind the C4 corpus), LINE-LEVEL as published: a line is
    * retained iff it ends in a terminal punctuation mark, has >= 5
    * whitespace words, and does not mention "javascript"; the page is
    * then dropped when the RETAINED text has fewer than 3 sentence
    * marks (the [.!?] proxy for C4's sentence count) or the original
    * page trips "lorem ipsum" / curly-brace. Per-rule counts are
    * emitted so a curation pipeline can tune the combination.
    *
    * Shape at scale: one pure per-row projection — string predicates +
    * HOFs over the split lines; no explode, no shuffle, no state.
    */
  def c4Filters(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), c4Struct(col(textCol)).as("s"))
      .select(idCol, "s.*")
      .orderBy(idCol)

  /** The [[c4Filters]] signals as ONE struct column (pure per-row
    * projection — composable into a single corpus scan).
    */
  def c4Struct(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]$") &&
        size(filter(split(l, "\\s+"), w => w =!= "")) >= 5 &&
        !contains(lower(l), lit("javascript")))
    val jsLines = size(filter(lines, l => contains(lower(l), lit("javascript")))).cast("long")
    val keptSentMarks = regexp_count(array_join(kept, "\n"), lit("[.!?]")).cast("long")
    val hasLorem = contains(lower(text), lit("lorem ipsum"))
    val hasBrace = contains(text, lit("{"))
    struct(
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("kept_lines"),
      jsLines.as("js_lines"),
      keptSentMarks.as("kept_sent_marks"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      (keptSentMarks >= 3 && !hasLorem && !hasBrace).as("keep"))
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

  /** Corpus DRIFT monitor between two snapshots — the health check a
    * continuously-crawling pipeline runs before mixing a new batch
    * into training data: has the term distribution moved, how much of
    * the new mass is out-of-vocabulary, did document shape change?
    *
    *   - `js_divergence`: Jensen-Shannon divergence between the two
    *     term distributions (symmetric, bounded [0, ln 2], defined
    *     even where supports differ — the reason it beats raw KL for
    *     monitoring);
    *   - `oov_rate_b`: share of B's token MASS on terms A never saw;
    *   - `mean_len_a/b`: per-snapshot mean token counts.
    *
    * Scale shape: one token aggregation per snapshot (the corpus-sized
    * work, term-hash partitioned), one full-outer term join, then the
    * cross-term totals as partition-less WINDOW sums over the
    * vocab-sized joined table — sub-linear in the corpus (Heaps'
    * law), so the single-partition window pass is strictly cheaper
    * than the extra corpus tokenize the broadcast-totals shape paid
    * (the mix_doremi/mix_unimax precedent). The doc counts come from
    * one tokenize-free count-star per snapshot. No persist, no
    * checkpoint — nothing for a warm pass to reuse. Sums of ln-terms
    * are order-dependent in the last ulps, so the divergence is
    * ROUNDed like every score in this repo (the BM25 precedent).
    */
  def corpusDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame =
    driftCore(
      driftTermCounts(a, textCol, "ca"), driftTermCounts(b, textCol, "cb"),
      a.agg(count(lit(1)).as("n")), b.agg(count(lit(1)).as("n")))

  /** (term, cnt) table for one snapshot — the MONOID half of the
    * drift computation: partial counts from any split of the corpus
    * merge by summation (`groupBy(term).sum`), which is what lets a
    * STREAMED snapshot accumulate per-micro-batch partials and drain
    * to the exact batch answer ([[graft.streaming.StreamPipeline]]).
    */
  def driftTermCounts(df: DataFrame, textCol: String, cntName: String): DataFrame = df
    .select(explode(TextOps.tokenize(col(textCol))).as("term"))
    .groupBy("term").agg(count(lit(1)).as(cntName))

  /** (doc count, token-length sum) partials — the other monoid. */
  def driftShapePartials(df: DataFrame, textCol: String): DataFrame = df
    .select(size(TextOps.tokenize(col(textCol))).cast("long").as("_len"))
    .agg(count(lit(1)).as("n"), sum(col("_len")).as("len_sum"))

  /** Merge shape partials → (n docs, mean length): the division
    * happens ONCE after the exact integer sums merge, so streamed
    * partials reproduce the batch mean bit-for-bit.
    */
  def shapeFromPartials(partials: DataFrame): DataFrame = partials
    .agg(sum("n").as("_n"), sum("len_sum").as("_s"))
    .select(col("_n").as("n"),
      round(col("_s").cast("double") / col("_n").cast("double"), 4).as("len"))

  /** [[corpusDrift]] from pre-aggregated counts — shared by the batch
    * and streamed faces. `shapeA`/`shapeB` are one-row (n, len); only
    * `n` is consumed — the mean lengths re-derive exactly from the
    * term-count masses (Σcnt == Σ size(tokenize) by construction), so
    * each counts subtree is referenced ONCE (no second corpus pass for
    * the totals, no cache needed to prevent one).
    */
  def corpusDriftFromCounts(
      ta: DataFrame, tb: DataFrame, shapeA: DataFrame, shapeB: DataFrame): DataFrame =
    driftCore(ta, tb, shapeA.select(col("n")), shapeB.select(col("n")))

  /** Shared drift arithmetic over (term, ca) / (term, cb) count tables
    * and one-row doc-count tables. The cross-term totals are
    * partition-less window sums over the vocab-sized joined table —
    * exact BIGINT sums, cast to double only at the division, so every
    * value is bit-identical to the former broadcast-totals shape.
    */
  private def driftCore(
      ta: DataFrame, tb: DataFrame, nA: DataFrame, nB: DataFrame): DataFrame = {
    val w = Window.partitionBy()
    val joined = ta.join(tb, Seq("term"), "full_outer")
      .na.fill(0L, Seq("ca", "cb"))
      .select(col("ca"), col("cb")) // the window pass carries two longs per term
      .withColumn("tot_a", sum(col("ca")).over(w).cast("double"))
      .withColumn("tot_b", sum(col("cb")).over(w).cast("double"))
    val p = col("ca").cast("double") / col("tot_a")
    val q = col("cb").cast("double") / col("tot_b")
    val m = (p + q) / 2.0
    val jsTerm =
      when(p > 0, p * log(p / m) * 0.5).otherwise(0.0) +
        when(q > 0, q * log(q / m) * 0.5).otherwise(0.0)
    val divergence = joined.agg(
      round(sum(jsTerm), 4).as("js_divergence"),
      round(sum(when(col("ca") === 0, q).otherwise(0.0)), 4).as("oov_rate_b"),
      sum(col("ca")).as("_suma"),
      sum(col("cb")).as("_sumb"))
    nA.select(col("n").as("n_docs_a"))
      .crossJoin(nB.select(col("n").as("n_docs_b")))
      .crossJoin(divergence)
      .select(col("n_docs_a"), col("n_docs_b"),
        round(col("_suma").cast("double") / col("n_docs_a").cast("double"), 4)
          .as("mean_len_a"),
        round(col("_sumb").cast("double") / col("n_docs_b").cast("double"), 4)
          .as("mean_len_b"),
        col("oov_rate_b"), col("js_divergence"))
  }

  /** Zipf power-law fit over the term-frequency distribution — the
    * corpus-health check next to [[corpusDrift]]: natural text follows
    * freq ∝ rank^s with s ≈ −1; a synthetic, template-generated or
    * boilerplate-flooded corpus bends the log-log line (|s| far from
    * 1, low R²), which this surfaces as three numbers. OLS fit of
    * ln(freq) on ln(rank) over the top-`topN` terms via the explicit
    * moment sums (slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²)) so the twin
    * reproduces the arithmetic without engine-specific regression
    * functions.
    *
    * Scale shape: one token aggregation (term-hash partitioned), a
    * bounded top-N cut, and a window over ONLY those `topN` rows (the
    * rrfFuse provably-small-global-window class) — the corpus-sized
    * work never sorts globally.
    */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 1000): DataFrame = {
    val counted = df
      .select(explode(TextOps.tokenize(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(topN)
    val w = Window.orderBy(col("cnt").desc, col("term"))
    val xy = counted
      .withColumn("x", log(row_number().over(w).cast("double")))
      .withColumn("y", log(col("cnt").cast("double")))
    xy.agg(
      count(lit(1)).as("_n"),
      sum("x").as("_sx"), sum("y").as("_sy"),
      sum(col("x") * col("y")).as("_sxy"),
      sum(col("x") * col("x")).as("_sxx"),
      sum(col("y") * col("y")).as("_syy"))
      .select(
        col("_n").as("n_terms"),
        round((col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
          (col("_n") * col("_sxx") - col("_sx") * col("_sx")), 5).as("slope"),
        round((col("_sy") - (col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
          (col("_n") * col("_sxx") - col("_sx") * col("_sx")) * col("_sx")) / col("_n"), 5)
          .as("intercept"),
        round(pow(col("_n") * col("_sxy") - col("_sx") * col("_sy"), 2) /
          ((col("_n") * col("_sxx") - col("_sx") * col("_sx")) *
            (col("_n") * col("_syy") - col("_sy") * col("_sy"))), 5).as("r2"))
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

  /** Per-document KEYWORD extraction: top-k terms by TF-IDF
    * (tfidf = tf · ln(1 + N/df)) — the doc-tagging/faceting step a
    * document store runs at ingest. Shape at scale: tf and df are two
    * partial-agg shuffles over the token table; the VOCAB-sized df
    * table joins by term (co-partitioned equi-join — a vocabulary does
    * NOT broadcast at web scale); N is a one-row broadcast; per-doc
    * top-k is the bounded-heap TopKPerKey operator. Scores round to
    * 5 dp (cross-engine ln parity).
    */
  def keywordsPerDoc(tokens: DataFrame, idCol: String, k: Int): DataFrame = {
    val tf = tokens.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val n = tokens.select(col(idCol)).distinct().agg(count(lit(1)).cast("double").as("n"))
    val scored = tf
      .join(dfT, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        round(col("tf").cast("double") * log(lit(1.0) + col("n") / col("df")), 5).as("tfidf"))
    graft.plans.TopK
      .perKey(scored, Seq(idCol), Seq(("tfidf", false), ("term", true)), k)
      .select(col(idCol), col("term"), col("tfidf"), col("rk"))
      .orderBy(col(idCol), col("rk"))
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
    TextOps.explodeShingles(
        df.select(col(idCol), TextOps.tokenize(col(textCol)).as("toks")),
        array_distinct(TextOps.rawShingles(col("toks"))), "raw", col(idCol))
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
      distinctShingleRows(df, textCol, keep)
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

  /** One row per DISTINCT 3-token shingle per document: (keep…, shm)
    * with `shm = md5(shingle text)` — the shared shingle stream for
    * [[contamination]] and [[bloomDecontaminate]].
    */
  private def distinctShingleRows(
      df: DataFrame,
      textCol: String,
      keep: Seq[org.apache.spark.sql.Column]
  ): DataFrame =
    TextOps.explodeShingles(
        df.select(keep :+ TextOps.tokenize(col(textCol)).as("_toks"): _*),
        array_distinct(TextOps.rawShingles(col("_toks"))), "raw", keep: _*)
      .withColumn("shm", md5(col("raw"))).drop("raw")

  /** Bloom-prefiltered benchmark decontamination — the shape
    * [[contamination]] takes at crawl scale when the benchmark shingle
    * set is too large to broadcast (a multi-benchmark eval suite is
    * easily 10^8+ shingles). A Bloom BITMASK over the benchmark
    * shingles (m bits, k hashes — ~1-2 bytes/shingle instead of the
    * 16-byte md5s plus hash-map overhead a broadcast join ships) is
    * built distributively and broadcast as a plan literal; the corpus
    * shingle stream is prefiltered by pure-codegen bit tests, and only
    * the survivors — true hits plus the ~(1-e^(-kn/m))^k false-positive
    * residue — reach the exact confirmation join. Bloom filters have no
    * false negatives, so the result is EXACTLY [[contamination]]'s:
    * the filter moves work, never answers.
    *
    * The confirm join is deliberately NOT broadcast (shuffle-hash
    * hint): in the regime this operator exists for, the benchmark side
    * can't broadcast — the prefilter is what makes the shuffle small.
    *
    * Filter sizing is measured, not guessed: m = next power of two
    * >= 16n bits (>= `minBits`), k = round(ln 2 · m/n) clamped to
    * [1,6] — ~0.046% FP rate at the 16 bits/key design point. The
    * driver-side artifact is the m-bit mask itself (32 KiB at the
    * floor), built by a per-partition OR `treeAggregate` — O(m), never
    * O(benchmark).
    *
    * The bit test is the native [[graft.plans.BloomMightContain]]
    * expression (mask as a codegen reference, hash loop in precompiled
    * Scala). The round-11 form — k `element_at(typedLit(mask))`
    * conjuncts — was this round's top cold flag (58×, 163 s of real
    * first-execution CPU on the driver box): pushdown substituted the
    * `shm = md5(raw)` projection into every conjunct (k md5 + 2k
    * xxhash64 per shingle row) and the resulting generated stage was
    * big enough that a first pass executed before the JIT catches up
    * runs at the bytecode-interpreter ceiling — measured at 107 s on
    * the builder box with the JIT pinned off, exactly the driver box's
    * cold burn. See the expression's doc for the full dissection.
    *
    * Reference: mcpvectordb has no decontamination tooling; this is
    * the scale path for the pipeline's [[contamination]] check
    * (Bloom 1970; same contract as `BloomFilterMightContain` in
    * Spark's own injected runtime filters).
    */
  def bloomDecontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      idCol: String,
      minBits: Int = 1 << 18
  ): DataFrame = {
    val bench = distinctShingleRows(benchmark, textCol, Seq.empty)
      .select("shm").distinct()
    val n = math.max(1L, bench.count())
    val mBits: Long = {
      val want = 16L * n
      var m = minBits.toLong
      while (m < want) m <<= 1
      m
    }
    val k = math.max(1, math.min(6, math.round(0.6931 * mBits / n).toInt))
    val words = (mBits / 64).toInt

    // Distributed build: per-partition bitmask OR, merged up a tree.
    // The zero value makes an empty benchmark a valid (all-miss) mask.
    // Positions come from the SAME helper the probe expression uses
    // (build and probe cannot disagree).
    val mask: Array[Long] = bench
      .select(encode(col("shm"), "UTF-8").as("b"))
      .rdd.treeAggregate(new Array[Long](words))(
        (a, r) => {
          val ps = graft.plans.BloomMightContain.positions(
            r.getAs[Array[Byte]](0), k, mBits)
          var i = 0
          while (i < ps.length) { val p = ps(i); a((p >>> 6).toInt) |= 1L << (p & 63); i += 1 }
          a
        },
        (x, y) => { var i = 0; while (i < words) { x(i) |= y(i); i += 1 }; x })

    def mightContain(shm: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      org.apache.spark.sql.GraftBridge.column(
        graft.plans.BloomMightContain(
          org.apache.spark.sql.GraftBridge.expression(shm), mask, mBits, k))

    val corpusSh = distinctShingleRows(corpus, textCol, Seq(col(idCol)))
    val totals = corpusSh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val confirmed = corpusSh
      .filter(mightContain(col("shm")))
      .join(bench.hint("shuffle_hash"), Seq("shm"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
    totals.join(confirmed, Seq(idCol), "left_outer")
      .select(
        col(idCol),
        col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("ratio",
        round(col("n_contaminated").cast("double") / col("n_shingles").cast("double"), 4))
  }

  /** Explode a documents DataFrame to one row per token occurrence,
    * keeping `keep` columns — the shared input for corpusStats /
    * topTermsPerGroup / BM25.
    */
  def tokenTable(df: DataFrame, textCol: String, keep: Seq[String]): DataFrame =
    df.select(keep.map(col) :+ explode(TextOps.tokenize(col(textCol))).as("term"): _*)

  /** Corpus-wide duplicated n-gram census — the diagnostic Lee'21 §4
    * runs before span dedup: which exact k-grams repeat, how often, and
    * across how many documents. One explode, one hash aggregation on
    * the n-gram (partial map-side combine bounds the shuffle to the
    * DISTINCT n-grams per task, not occurrences), then a TakeOrdered
    * top-k — no windows, no driver state. The shuffle key is raw
    * n-gram text because the census's OUTPUT is the text; a pipeline
    * that only needs counts should group on `md5(ngram)` instead
    * (fixed 16-byte keys — see [[graft.functions.TextOps.shingles]]).
    */
  def duplicatedNgrams(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 5,
      minCount: Long = 2,
      topK: Int = 50
  ): DataFrame =
    // tokenize BOUND through a projection before the shingle lambda:
    // inlining it makes the interpreted HOF re-tokenize the document
    // per element_at — measured 32x slower (see PLANS.md)
    TextOps.explodeShingles(
        df.select(col(idCol), TextOps.tokenize(col(textCol)).as("_toks")),
        TextOps.rawShingles(col("_toks"), k), "ngram", col(idCol))
      .groupBy("ngram")
      .agg(count(lit(1)).as("cnt"), count_distinct(col(idCol)).as("n_docs"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(topK)

  /** Character-distribution quality signals — the information-theoretic
    * curation cut (RefinedWeb / DCLM filter low-entropy gibberish and
    * keyboard-mash; Gopher's repetition rules catch the same failure at
    * the n-gram level, this catches it at the char level): Shannon
    * entropy and the max-char ratio over the tokenizer alphabet
    * ([a-z0-9] of the lowercased text — the restriction that makes the
    * statistic identically computable in both engines, since splitting
    * arbitrary unicode into chars differs between Java UTF-16 units and
    * DuckDB graphemes).
    *
    * No explode, no HOF, no custom expression: each char's count is
    * `length(s) - length(translate(s, c, ""))` — 36 codegen'd string
    * scans per row, embarrassingly parallel, O(36·len) per doc. English
    * text sits near 4.1 bits; uniform random alnum at log2(36) ≈ 5.17;
    * `aaaa…` at 0.0 with max_char_ratio 1.0. Entropy rounded to 4 dp
    * (log2 is transcendental — same cross-engine rounding contract as
    * the BM25 ln terms).
    */
  def charEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val alphabet = ('a' to 'z') ++ ('0' to '9')
    val s = regexp_replace(lower(col(textCol)), "[^a-z0-9]", "")
    val df2 = df.select(col(idCol), s.as("_s"))
      .withColumn("_n", length(col("_s")).cast("double"))
    val counts = alphabet.map { c =>
      (col("_n") - length(translate(col("_s"), c.toString, ""))).as(s"_c_$c")
    }
    val withCounts = df2.select(col(idCol) +: col("_n") +: counts: _*)
    val entropyTerms = alphabet.map { c =>
      val p = col(s"_c_$c") / col("_n")
      when(col(s"_c_$c") > 0, -p * log2(p)).otherwise(lit(0.0))
    }
    val maxCount = greatest(alphabet.map(c => col(s"_c_$c")): _*)
    withCounts.select(
      col(idCol),
      col("_n").cast("long").as("n_alnum"),
      when(col("_n") > 0, round(entropyTerms.reduce(_ + _), 4)).otherwise(lit(0.0))
        .as("entropy"),
      when(col("_n") > 0, round(maxCount / col("_n"), 4)).otherwise(lit(0.0))
        .as("max_char_ratio"))
  }
}
