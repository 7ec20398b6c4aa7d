package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

/** RM3 query expansion: the relevance model must pick the right
  * expansion terms, interpolate correctly, and degrade gracefully —
  * pinned against hand-computed corpora and the α=1 identity.
  */
class QueryExpandSpec extends SparkSpec {
  import spark.implicits._

  private def tok(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))

  test("expansion terms come from feedback docs and lift co-occurring docs") {
    // "apple" retrieves docs 1,2; both also say "cider", so "cider"
    // dominates RM1 and doc 3 (cider-only) must enter the expanded
    // results even though it never mentions the query term.
    val t = tok(Seq(
      1L -> "apple cider apple press",
      2L -> "apple cider orchard",
      3L -> "cider barrel cellar",
      4L -> "database index btree"
    ))
    val out = Search.rm3ExpandTopK(t, "doc_id", Seq("apple"), k = 4,
      fbDocs = 2, fbTerms = 2, alpha = 0.5).collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(ids.contains(3L), s"cider-only doc must be recalled, got ${ids.mkString(",")}")
    assert(!ids.contains(4L), "unrelated doc must not appear")
  }

  test("alpha = 1 reduces to the original BM25 ranking (scaled scores)") {
    val t = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(graft.functions.TextOps.tokenize(col("text"))).as("term"))
    val bm25 = Search.bm25TopK(t, "doc_id", Queries.QueryTerms, 10)
      .collect().map(_.getLong(0)).toSeq
    val rm3 = Search.rm3ExpandTopK(t, "doc_id", Queries.QueryTerms, 10, alpha = 1.0)
      .collect().map(_.getLong(0)).toSeq
    assert(rm3 == bm25)
  }

  test("degenerate feedback (docs contain only query terms) falls back without dividing by zero") {
    val t = tok(Seq(1L -> "apple apple", 2L -> "apple", 3L -> "pear plum"))
    val out = Search.rm3ExpandTopK(t, "doc_id", Seq("apple"), k = 3,
      fbDocs = 2, fbTerms = 3, alpha = 0.5).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("interpolated weights match an independent driver-side recomputation") {
    val rows = Seq(
      1L -> "apple cider apple press",
      2L -> "apple cider orchard",
      3L -> "cider barrel cellar",
      4L -> "database index btree"
    )
    val t = tok(rows)
    val out = Search.rm3ExpandTopK(t, "doc_id", Seq("apple"), k = 4,
      fbDocs = 2, fbTerms = 1, alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // Independent recomputation (plain Scala, no Spark): round 1 BM25,
    // rm1 over the two feedback docs, single expansion term, weighted
    // rescoring with the operator's documented rounding contract.
    val docs = rows.map { case (id, s) => id -> s.split(" ").toSeq }.toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum / n
    def bm25(terms: Map[String, Double]): Map[Long, Double] = {
      val dfm = terms.keys.map(w => w -> docs.values.count(_.contains(w)).toDouble).toMap
      docs.flatMap { case (id, toks) =>
        val dl = toks.size.toDouble
        val s = terms.map { case (w, wt) =>
          val tf = toks.count(_ == w).toDouble
          if (tf == 0) 0.0
          else wt * math.log(1.0 + (n - dfm(w) + 0.5) / (dfm(w) + 0.5)) *
            tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        }.sum
        if (terms.keys.exists(w => toks.contains(w))) Some(id -> s) else None
      }
    }
    val r1 = bm25(Map("apple" -> 1.0)).toSeq
      .map { case (id, s) => id -> BigDecimal(s).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble }
      .sortBy { case (id, s) => (-s, id) }.take(2)
    val sSum = r1.map(_._2).sum
    val rm1 = r1.flatMap { case (id, s) =>
      val toks = docs(id); val dl = toks.size.toDouble
      toks.distinct.filterNot(_ == "apple").map(w => w -> toks.count(_ == w) / dl * s)
    }.groupBy(_._1).map { case (w, xs) =>
      w -> BigDecimal(xs.map(_._2).sum / sSum).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toSeq.sortBy { case (w, x) => (-x, w) }.take(1)
    val wq = Map("apple" -> 0.5) ++ rm1.map { case (w, x) => w -> 0.5 * x / rm1.map(_._2).sum }
    val want = bm25(wq)
      .map { case (id, s) => id -> BigDecimal(s).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble }
    assert(out == want)
  }
}
