package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by search, dedup and analysis
  * operators. All pure built-in expressions (codegen-friendly, no UDFs),
  * and each has an exact DuckDB-SQL twin in [[graft.OracleSql]] — the
  * tokenizer definition below IS the cross-engine contract.
  *
  * Reference anchors: chunker.py:49 `_token_length` (token counting),
  * store.py:197 FTS tokenization (BM25 leg).
  */
object TextOps {

  /** Canonical tokenizer: lowercase, split on runs of non-alphanumerics,
    * drop empties. DuckDB twin:
    * `list_filter(regexp_split_to_array(lower(x), '[^a-z0-9]+'), t -> t <> '')`.
    */
  def tokenize(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Number of tokens (the whitespace-proxy for reference token counts). */
  def tokenCount(text: Column): Column = size(tokenize(text))

  /** Latin a-z paired 1:1 with a Cyrillic transliteration alphabet —
    * the contract for [[scriptFold]] and for test fixtures that PLANT
    * cross-script contamination ([[latinToCyrillic]]). A 1:1 char map
    * keeps both directions expressible as `translate` in Spark and
    * DuckDB alike (codegen'd, no UDF).
    */
  val LatinAlphabet = "abcdefghijklmnopqrstuvwxyz"

  /** Cyrillic letters positionally paired with [[LatinAlphabet]]. */
  val CyrillicAlphabet = "абцдефгхижклмнопярстувшщыз"

  /** Common Latin diacritics paired 1:1 with [[DiacriticTo]]. */
  val DiacriticFrom = "àáâãäåèéêëìíîïòóôõöùúûüñçýÿ"
  val DiacriticTo = "aaaaaaeeeeiiiiooooouuuuncyy"

  /** Script-fold normalization for cross-lingual gram matching
    * (decontamination across transliterated copies): lowercase, fold
    * Latin diacritics to ASCII, transliterate Cyrillic to Latin. The
    * n-gram machinery then sees one script, so a benchmark span hidden
    * in another alphabet still collides. Pure `translate` chains —
    * 1:1 char maps, identical in the DuckDB twin.
    */
  def scriptFold(text: Column): Column =
    translate(
      translate(lower(text), DiacriticFrom, DiacriticTo),
      CyrillicAlphabet, LatinAlphabet)

  /** Inverse direction of [[scriptFold]]'s Cyrillic leg — used by test
    * fixtures to plant cross-script contamination deterministically.
    */
  def latinToCyrillic(text: Column): Column =
    translate(text, LatinAlphabet, CyrillicAlphabet)

  /** md5-hashed k-token shingles of a token array: element i covers
    * tokens [i, i+k). Hashing keeps shingle payloads fixed-width (16
    * bytes hex) — at 100 TB the shuffle carries hashes, never raw text.
    */
  def shingles(tokens: Column, k: Int = 3): Column =
    when(
      size(tokens) >= k,
      transform(rawShingles(tokens, k), s => md5(s))
    ).otherwise(array().cast("array<string>"))

  /** Un-hashed k-token shingle strings. Callers that feed aggregations
    * should `explode` this and apply `md5` as a top-level column — md5
    * inside a lambda runs interpreted (HOFs are codegen fallbacks),
    * md5 over exploded rows is whole-stage-codegen'd.
    */
  def rawShingles(tokens: Column, k: Int = 3): Column =
    when(
      size(tokens) >= k,
      transform(
        sequence(lit(1), size(tokens) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(tokens, i + j)): _*)
      )
    ).otherwise(array().cast("array<string>"))

  /** One min-hash value: lexicographic min over `md5(seed:shingle)`.
    * md5 re-keyed per seed is a valid min-wise independent family and —
    * crucially — computes identically in DuckDB for the oracle.
    */
  def minHash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(s"$seed:"), s))))

  /** LSH band keys from 2-row bands over `numHashes` min-hashes. */
  def bandKeys(shingleArr: Column, numHashes: Int): Seq[Column] = {
    require(numHashes % 2 == 0, "bands of 2 need an even numHashes")
    (0 until numHashes by 2).map { i =>
      md5(concat(minHash(shingleArr, i), minHash(shingleArr, i + 1)))
    }
  }

  /** Hashed bag-of-words dimension for a term: 6 bits of md5 → [0, 64).
    * Twin of a feature-hashing embedder (reference: embedder.py:41) —
    * deterministic, vocabulary-free, and cheap at any scale.
    */
  def hashedBowDim(term: Column, dims: Int = 64): Column =
    (conv(substring(md5(term), 1, 2), 16, 10).cast("long") % dims)

  /** First-markdown-heading title with source-basename fallback
    * (reference: ingestor.py:482 `_extract_title`).
    */
  def extractTitle(text: Column, source: Column): Column = {
    val heads = filter(split(text, "\n"), l => trim(l).startsWith("#"))
    val fromHead = substring(trim(ltrim(trim(element_at(heads, 1)), "#")), 1, 200)
    val basename = substring(element_at(split(element_at(split(source, "/"), -1), "\\\\"), -1), 1, 200)
    when(size(heads) > 0, fromHead).otherwise(basename)
  }

  /** Positions (1-based) where the exact token phrase starts inside a
    * bound token-array column — one fused codegen'd scan per row via
    * the native [[graft.plans.PhrasePositions]] expression; no
    * positional self-join (the classic phrase-query plan killer at
    * scale) and no interpreted HOF fallback.
    */
  def phrasePositions(tokens: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty)
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.PhrasePositions(
      GraftBridge.expression(tokens),
      GraftBridge.expression(array(phrase.map(lit): _*))
    ))
  }

  /** The composed-HOF twin of [[phrasePositions]] — interpreted
    * (codegen fallback), kept as the cross-check reference for specs.
    */
  def phrasePositionsHof(tokens: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty)
    val n = size(tokens)
    val span = phrase.length - 1
    when(
      n >= phrase.length,
      filter(
        sequence(lit(1), n - span),
        i => phrase.zipWithIndex
          .map { case (w, j) => element_at(tokens, i + j) === w }
          .reduce(_ && _)
      )
    ).otherwise(array().cast("array<int>"))
  }

  /** Stopword membership count (used by language-ID and quality score). */
  def stopwordCount(tokens: Column, stopwords: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(stopwords)))
}
