package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch ingest pipeline: folder → convert → chunk → featurize
  * (reference: ingestor.py:62 `ingest_folder`, :133 `ingest`,
  * converter.py:13 SUPPORTED_EXTENSIONS / :44 `convert`).
  *
  * Reads whole folders through Spark's `binaryFile` source — the
  * distributed analog of the reference's asyncio folder walk: listing,
  * reading and conversion all run on executors, partitioned by file.
  * Text formats are decoded for real; rich formats (pdf/docx/media)
  * go through [[convertStub]] — a clearly-marked deterministic stand-in
  * for a MarkItDown-style converter (those libs aren't in this
  * container). Swapping the stub for a real converter UDF changes no
  * plan shape.
  */
object Ingest {

  /** converter.py:13 SUPPORTED_EXTENSIONS. */
  val SupportedExtensions: Set[String] = Set(
    "pdf", "docx", "doc", "pptx", "ppt", "xlsx", "xls", "html", "htm",
    "txt", "md", "csv", "json", "xml", "jpg", "jpeg", "png", "gif",
    "bmp", "webp", "mp3", "wav", "ogg", "m4a", "zip"
  )

  private val TextDecodable = Set("txt", "md", "csv", "json", "xml", "html", "htm")

  /** Scan a folder (recursively) for supported files: one row per file
    * with path/source, file_type, last_modified, raw bytes and the
    * sha256 content hash used by the dedup gate (ingestor.py:182).
    */
  def folder(spark: SparkSession, path: String, recursive: Boolean = true): DataFrame =
    spark.read
      .format("binaryFile")
      .option("recursiveFileLookup", recursive.toString)
      .load(path)
      .withColumn("file_type", lower(element_at(split(col("path"), "\\."), -1)))
      .filter(col("file_type").isInCollection(SupportedExtensions))
      .select(
        col("path").as("source"),
        col("file_type"),
        date_format(col("modificationTime"), "yyyy-MM-dd'T'HH:mm:ssXXX").as("last_modified"),
        col("length").as("n_bytes"),
        col("content"),
        sha2(col("content"), 256).as("content_hash")
      )

  /** Convert raw bytes to markdown-ish text. Text formats decode as
    * UTF-8 (real); rich formats produce a deterministic STUB payload —
    * the seam where a real converter (MarkItDown/tika equivalent)
    * plugs in.
    */
  def convertStub(df: DataFrame): DataFrame =
    df.withColumn(
      "text",
      when(
        col("file_type").isInCollection(TextDecodable),
        decode(col("content"), "UTF-8")
      ).otherwise(
        // STUB: a real implementation would parse the binary format.
        concat(
          lit("# "), regexp_extract(col("source"), "([^/\\\\]+)$", 1),
          lit("\n[stub-converted "), col("file_type"),
          lit(" "), col("n_bytes").cast("string"), lit(" bytes]")
        )
      )
    )

  /** Full pipeline to a chunk-store table shaped like the reference's
    * ChunkRecord (store.py:18): doc identity, title, chunks with
    * indexes, hashed-BoW featurization per chunk.
    */
  def pipeline(spark: SparkSession, path: String, library: String): DataFrame = {
    val converted = convertStub(folder(spark, path))
      .withColumn("doc_id", sha2(col("source"), 256))
      .withColumn("title", TextOps.extractTitle(col("text"), col("source")))
    val chunks = Chunker.fixedSize(
      converted, "text", chunkSize = 512, overlap = 64,
      keep = Seq("doc_id", "source", "title", "file_type", "last_modified", "content_hash")
    )
    Featurize
      .hashedBow(
        chunks.withColumn("library", lit(library)),
        "chunk", dims = 64,
        keep = Seq("doc_id", "library", "source", "title", "file_type",
          "last_modified", "content_hash", "chunk_index", "chunk")
      )
  }

  /** Typed pipeline: the same dataflow surfaced as
    * `Dataset[graft.model.ChunkRecord]` — the reference's row type
    * (store.py:18) with a stable composite chunk id.
    */
  def pipelineTyped(
      spark: SparkSession,
      path: String,
      library: String
  ): org.apache.spark.sql.Dataset[graft.model.ChunkRecord] = {
    import spark.implicits._
    pipeline(spark, path, library)
      .select(
        concat(col("doc_id"), lit(":"), col("chunk_index").cast("string")).as("id"),
        col("doc_id"), col("library"), col("source"), col("content_hash"),
        col("title"), col("chunk").as("content"), col("embedding"),
        col("chunk_index"), col("last_modified").as("created_at"),
        lit("{}").as("metadata"), col("file_type"), col("last_modified"),
        lit(0).as("page")
      )
      .as[graft.model.ChunkRecord]
  }

  /** Re-ingest statuses against an existing store, keyed on
    * (source, library) with hash-skip (ingestor.py:182-205,
    * store.py:206 `find_existing`).
    */
  def statuses(incoming: DataFrame, existing: DataFrame): DataFrame = {
    val e = existing
      .select(col("source"), col("library"), col("content_hash").as("_old_hash"))
      .distinct()
    incoming
      .join(e, Seq("source", "library"), "left_outer")
      .withColumn(
        "status",
        when(col("_old_hash").isNull, "indexed")
          .when(col("content_hash") === col("_old_hash"), "skipped")
          .otherwise("replaced")
      )
      .drop("_old_hash")
  }
}
