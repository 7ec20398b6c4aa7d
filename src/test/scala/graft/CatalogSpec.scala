package graft

import graft.operators.Catalog
import org.apache.spark.sql.functions._

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def chunkFixture = Seq(
    // (doc_id, library, chunk_index, chunk)
    (10L, "libA", 0L, "first chunk"),
    (10L, "libA", 1L, "second chunk"),
    (10L, "libA", 2L, "third chunk"),
    (20L, "libA", 0L, "solo chunk"),
    (30L, "libB", 0L, "b zero"),
    (30L, "libB", 1L, "b one")
  ).toDF("doc_id", "library", "chunk_index", "chunk")

  test("filterFor rejects injection-shaped keys (reference store.py:146)") {
    val bad = intercept[IllegalArgumentException] {
      Catalog.filterFor(Map("lang' OR 1=1 --" -> "x"))
    }
    assert(bad.getMessage.contains("Invalid filter key"))
    // valid keys build a usable predicate; values are literals, so a
    // quote in the VALUE is data, not SQL.
    val df = Seq((1L, "en'), delete --")).toDF("id", "lang")
    assert(df.filter(Catalog.filterFor(Map("lang" -> "en'), delete --"))).count() == 1)
  }

  test("expandContext pulls ±radius neighbors, clamps at doc boundaries, joins by key") {
    val ch = chunkFixture.select("doc_id", "chunk_index", "chunk")
    val hits = Seq((10L, 1L), (10L, 2L), (20L, 0L), (30L, 0L)).toDF("doc_id", "hit_index")
    val out = Catalog.expandContext(ch, "doc_id", "chunk_index", "chunk", hits, "hit_index", radius = 1)
      .orderBy("doc_id", "hit_index")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(out.toSeq == Seq(
      (10L, 1L, 3L, 0L, 2L, "first chunk second chunk third chunk"), // full window
      (10L, 2L, 2L, 1L, 2L, "second chunk third chunk"),             // clamped at doc end
      (20L, 0L, 1L, 0L, 0L, "solo chunk"),                           // single-chunk doc
      (30L, 0L, 2L, 0L, 1L, "b zero b one")                          // clamped at doc start
    ), s"got ${out.toSeq}")
    // neighbor fetch is an equi-join on (doc, index) — no range predicate
    // surviving as a join condition, no cross product
    val plan = Catalog.expandContext(ch, "doc_id", "chunk_index", "chunk", hits, "hit_index", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"neighbor fetch must stay an equi-join:\n$plan")
  }

  test("listDocuments groups chunks per doc with pagination") {
    val out = Catalog.listDocuments(chunkFixture, "doc_id", Seq("library"), limit = 2, offset = 1)
      .collect()
    // doc order desc: 30, 20, 10 → offset 1 → 20, 10
    assert(out.map(_.getLong(0)).toSeq == Seq(20L, 10L))
    assert(out.map(_.getAs[Long]("chunk_count")).toSeq == Seq(1L, 3L))
  }

  test("listLibraries counts distinct docs and chunks per library") {
    val out = Catalog.listLibraries(chunkFixture, "library", "doc_id").collect()
    val byLib = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byLib("libA") == (2L, 4L))
    assert(byLib("libB") == (1L, 2L))
  }

  test("getDocument reassembles content in chunk_index order") {
    val out = Catalog.getDocument(
      chunkFixture.filter(col("doc_id") === 10), "doc_id", "chunk_index", "chunk", Seq("library")
    ).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("content") == "first chunk\n\nsecond chunk\n\nthird chunk")
    assert(out.head.getAs[Long]("chunk_count") == 3L)
  }

  test("deleteDocuments drops exactly the doomed doc's chunks") {
    val doomed = Seq(Tuple1(10L)).toDF("doc_id")
    val remaining = Catalog.deleteDocuments(chunkFixture, doomed, "doc_id")
    assert(remaining.count() == 3)
    assert(remaining.filter(col("doc_id") === 10).count() == 0)
  }

  test("deleting a nonexistent doc changes nothing; getDocument missing is empty") {
    // (reference: test_store.py delete_nonexistent_doc_returns_zero /
    //  get_document_missing_returns_empty)
    val doomed = Seq(Tuple1(999L)).toDF("doc_id")
    assert(Catalog.deleteDocuments(chunkFixture, doomed, "doc_id").count() == chunkFixture.count())
    val missing = Catalog.getDocument(
      chunkFixture.filter(col("doc_id") === 999), "doc_id", "chunk_index", "chunk", Seq("library"))
    assert(missing.count() == 0)
  }

  test("ingestStatus classifies indexed/skipped/replaced like the reference") {
    val existing = Seq((1L, "unchanged"), (2L, "old content")).toDF("id", "text")
    val incoming = Seq((1L, "unchanged"), (2L, "new content"), (3L, "brand new")).toDF("id", "text")
    val out = Catalog.ingestStatus(incoming, existing, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "skipped", 2L -> "replaced", 3L -> "indexed"))
  }

  test("serverInfo reports environment and path readability (reference server_info)") {
    graft.plans.GraftFunctions.register(spark)
    val row = graft.operators.Info
      .serverInfo(spark, Some("/root/testdata/sf0.001/documents.parquet")).head()
    assert(row.getAs[String]("spark_version").startsWith("4."))
    assert(row.getAs[Boolean]("cosine_sim_registered"))
    assert(row.getAs[String]("path_check").startsWith("exists"))
    val missing = graft.operators.Info.serverInfo(spark, Some("/no/such/file")).head()
    assert(missing.getAs[String]("path_check") == "missing")
  }

  test("upsertByKey: incoming wins, old survives only when key absent") {
    val oldRows = Seq((1L, "old-1"), (2L, "old-2"), (3L, "old-3")).toDF("id", "text")
    val incoming = Seq((2L, "new-2"), (4L, "new-4")).toDF("id", "text")
    val out = Catalog.upsertByKey(oldRows, incoming, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "old-1"), (2L, "new-2"), (3L, "old-3"), (4L, "new-4")))
  }

  test("upsertLike null-fills columns missing on either side") {
    val oldRows = Seq((1L, "srcA")).toDF("id", "source")
    val newRows = Seq((2L, "srcB", "en")).toDF("id", "source", "lang")
    val out = Catalog.upsertLike(oldRows, newRows).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(out(0).fieldIndex("lang")))
    assert(out(1).getAs[String]("lang") == "en")
  }
}
