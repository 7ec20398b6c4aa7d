package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Catalog / management operators over a chunk store
  * (reference: store.py:329 `get_document`, :354 `list_documents`,
  * :405 `list_libraries`, :237 `delete_document`, :122
  * `_build_where_clause`; ingest statuses ingestor.py:182-205).
  *
  * A "chunk store" here is any DataFrame with one row per chunk carrying
  * (docId, library, chunkIndex, chunk) columns. All operators are
  * partial-agg friendly groupBys or anti-joins — no driver-side grouping
  * (the reference iterates rows in Python; at 100 TB these must be
  * shuffles on doc_id/library, which is what Spark's groupBy gives us).
  */
object Catalog {

  private val SafeKey = "^[a-zA-Z_][a-zA-Z0-9_]*$".r

  /** Validated equality-filter predicate (reference: store.py:122).
    * Keys must be identifier-shaped; values are bound as literals (no
    * string interpolation — injection-safe by construction).
    */
  def filterFor(filters: Map[String, Any]): Column = {
    filters.foldLeft(lit(true)) { case (acc, (k, v)) =>
      require(SafeKey.matches(k), s"Invalid filter key: '$k'")
      acc && (col(k) === lit(v))
    }
  }

  /** One row per document: metadata + chunk_count, newest-id first with
    * limit/offset pagination (reference: store.py:354).
    */
  def listDocuments(
      chunks: DataFrame,
      docId: String,
      metaCols: Seq[String],
      limit: Int,
      offset: Int
  ): DataFrame = {
    val aggCols = metaCols.map(c => min(col(c)).as(c)) :+ count("*").as("chunk_count")
    val grouped = chunks
      .groupBy(col(docId))
      .agg(aggCols.head, aggCols.tail: _*)
      .orderBy(col(docId).desc)
    // offset+limit via a ranked window keeps the operation declarative;
    // Spark's offset() also works but ranks make ties explicit.
    grouped.limit(limit + offset).offset(offset)
  }

  /** Per-library distinct-document and chunk counts
    * (reference: store.py:405). Plain partial-aggregating groupBy.
    */
  def listLibraries(chunks: DataFrame, library: String, docId: String): DataFrame =
    chunks
      .groupBy(col(library))
      .agg(
        countDistinct(col(docId)).as("document_count"),
        count("*").as("chunk_count")
      )
      .orderBy(col(library))

  /** Reassemble one document's text from its chunks in chunk_index order
    * (reference: store.py:329 + server.py get_document "\n\n" join).
    * sort_array over collected (index, chunk) structs keeps the operation
    * a single aggregation without a per-group sort shuffle.
    */
  /** RAG context expansion: for every retrieval hit (a chunk the search
    * leg surfaced), pull its ±`radius` neighbor chunks from the same
    * document and reassemble them in order — the "return the chunk with
    * surrounding context" serving step a retrieval store performs after
    * top-k (the chunk-level face of [[getDocument]]'s reassembly). The
    * neighbor fetch is a pure EQUI-join: hits explode into their
    * (doc, index±offset) wants and join the chunk table on both keys,
    * so only the needed chunks move — never all chunks of a hit
    * document, never a range predicate after a doc-only join. Hits are
    * top-k-sized; at 100 TB the chunk table is the only large side and
    * it is probed by key.
    */
  def expandContext(
      chunks: DataFrame,
      docId: String,
      chunkIndex: String,
      chunkCol: String,
      hits: DataFrame,
      hitIndexCol: String,
      radius: Int
  ): DataFrame = {
    require(radius >= 0)
    val offsets = array((-radius to radius).map(o => lit(o.toLong)): _*)
    val wanted = hits
      .select(col(docId), col(hitIndexCol), explode(offsets).as("_off"))
      .withColumn(chunkIndex, col(hitIndexCol) + col("_off"))
      .drop("_off")
    wanted
      .join(chunks.select(col(docId), col(chunkIndex), col(chunkCol)), Seq(docId, chunkIndex))
      .groupBy(col(docId), col(hitIndexCol))
      .agg(
        count(lit(1)).as("n_ctx"),
        min(col(chunkIndex)).as("ctx_start"),
        max(col(chunkIndex)).as("ctx_end"),
        array_join(
          transform(
            sort_array(collect_list(struct(col(chunkIndex), col(chunkCol)))),
            s => s.getField(chunkCol)),
          " ").as("context"))
  }

  def getDocument(
      chunks: DataFrame,
      docId: String,
      chunkIndex: String,
      chunkCol: String,
      metaCols: Seq[String]
  ): DataFrame = {
    val aggCols = metaCols.map(c => min(col(c)).as(c)) :+
      array_join(
        transform(
          sort_array(collect_list(struct(col(chunkIndex), col(chunkCol)))),
          s => s.getField(chunkCol)
        ),
        "\n\n"
      ).as("content") :+
      count("*").as("chunk_count")
    chunks
      .groupBy(col(docId))
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** Anti-join delete: rows of `chunks` whose docId is NOT in `doomed`.
    * (reference: store.py:237 delete-by-doc_id).
    */
  def deleteDocuments(chunks: DataFrame, doomed: DataFrame, docId: String): DataFrame =
    chunks.join(broadcast(doomed), Seq(docId), "left_anti")

  /** Per-library delete report: total/deleted/remaining chunk counts for
    * a delete predicate — the audit view of a bulk delete.
    */
  def deleteReport(
      chunks: DataFrame,
      library: String,
      deletePred: Column
  ): DataFrame =
    chunks
      .groupBy(col(library))
      .agg(
        count("*").as("total_chunks"),
        count(when(deletePred, true)).as("deleted_chunks"),
        count(when(!deletePred, true)).as("remaining_chunks")
      )
      .orderBy(col(library))

  /** Idempotent re-ingest statuses (reference: ingestor.py:182-205):
    * incoming rows vs existing rows on the same id —
    * 'indexed' (new), 'skipped' (hash unchanged), 'replaced' (changed).
    */
  def ingestStatus(
      incoming: DataFrame, // (id, textCol)
      existing: DataFrame, // (id, textCol)
      idCol: String,
      textCol: String
  ): DataFrame = {
    val e = existing.select(col(idCol), sha2(col(textCol), 256).as("_old_hash"))
    incoming
      .withColumn("content_hash", sha2(col(textCol), 256))
      .join(e, Seq(idCol), "left_outer")
      .withColumn(
        "status",
        when(col("_old_hash").isNull, "indexed")
          .when(col("content_hash") === col("_old_hash"), "skipped")
          .otherwise("replaced")
      )
      .select(col(idCol), col("status"), col("content_hash"))
  }

  /** Schema-evolving upsert-union: union by name, null-filling columns
    * missing on either side (reference: store.py:96 `_migrate_table`,
    * :180 `upsert_chunks`).
    */
  def upsertLike(oldRows: DataFrame, newRows: DataFrame): DataFrame =
    oldRows.unionByName(newRows, allowMissingColumns = true)

  /** Replace-by-key upsert: incoming rows win, old rows survive only if
    * their key is absent from incoming — the reference's replace path
    * (delete_document + upsert_chunks, ingestor.py:205). An anti-join +
    * union: both sides shuffle once on the key, no row-at-a-time logic.
    */
  def upsertByKey(oldRows: DataFrame, incoming: DataFrame, key: String): DataFrame =
    incoming.unionByName(
      oldRows.join(incoming.select(key).distinct(), Seq(key), "left_anti"),
      allowMissingColumns = true
    )
}
