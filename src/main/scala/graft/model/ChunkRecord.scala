package graft.model

/** Typed row mirroring the reference's chunk-store schema
  * (reference: store.py:18 `ChunkRecord`) — one embedded chunk per row.
  * Used with case-class Encoders where type safety helps
  * (`Dataset[ChunkRecord]`); the DataFrame operators accept any
  * conforming schema.
  */
final case class ChunkRecord(
    id: String,
    doc_id: String,
    library: String,
    source: String,
    content_hash: String,
    title: String,
    content: String,
    embedding: Seq[Double],
    chunk_index: Long,
    created_at: String,
    metadata: String,
    file_type: String,
    last_modified: String,
    page: Int
)
