package graft.operators

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.hadoop.mapreduce.lib.output.FileOutputFormat
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Avro container-file source/sink for the corpus round-trip family
  * (G6). The cluster's Spark distribution does not ship the
  * `spark-avro` connector module, so this goes through the Hadoop
  * `AvroKey{Input,Output}Format` pair from `avro-mapred` — the same
  * splittable container read the connector wraps. Two scale
  * properties make Avro a first-class corpus container next to
  * ORC/parquet:
  *
  *  - the object-container format is block-structured with sync
  *    markers, so a single large file splits across tasks EVEN WHEN
  *    COMPRESSED (deflate/snappy compress per-block) — unlike
  *    gzip JSONL (one task per file) or multiLine CSV (serial parse);
  *  - the writer schema travels in the file header, so the reader
  *    needs no inference pass, and schema evolution is resolved by
  *    Avro's reader/writer schema matching, not by Spark column
  *    re-projection.
  *
  * `_corrupt` has no meaning for a binary container (a framing error
  * is fatal to the block, not a row-level parse miss), so like ORC
  * the corrupt-record column reads all-null and the shared DuckDB
  * twin applies unchanged.
  *
  * Reference scope: mcpvectordb ingests documents from files
  * (ingestor.py); corpus containers are our scale-path superset.
  */
object Avro {

  /** Writer schema for the decorated corpus projection. Kept as a JSON
    * literal so executors can re-parse it locally — avro `Schema` is
    * not serializable, shipping the string is the standard pattern.
    */
  private val SchemaJson: String =
    """{"type":"record","name":"Doc","namespace":"graft","fields":[
      |  {"name":"doc_id","type":"long"},
      |  {"name":"lang","type":["null","string"],"default":null},
      |  {"name":"source","type":["null","string"],"default":null},
      |  {"name":"text","type":["null","string"],"default":null}
      |]}""".stripMargin

  private val FieldDefs: Seq[(String, String)] = Seq(
    "doc_id" -> """{"name":"doc_id","type":"long"}""",
    "lang"   -> """{"name":"lang","type":["null","string"],"default":null}""",
    "source" -> """{"name":"source","type":["null","string"],"default":null}""",
    "text"   -> """{"name":"text","type":["null","string"],"default":null}""")

  /** READER schema projected to `dataFields` — the column-pruning seam
    * of the connector-less read path: Avro's reader/writer resolution
    * (ResolvingDecoder) SKIPS writer fields absent from the reader
    * schema, so a pruned read never UTF-8-decodes or allocates the
    * dropped string fields (for corpus docs, `text` is ~all the bytes —
    * a metadata-only scan skips nearly all decode work). The bytes are
    * still read off the container blocks (row-oriented format), so the
    * saving is decode CPU + allocation, not I/O — the remaining honest
    * gap vs a columnar source is filter pushdown (see [[read]]).
    */
  private[graft] def readerSchemaJson(dataFields: Seq[String]): String = {
    val known = FieldDefs.map(_._1).toSet
    val unknown = dataFields.filterNot(known)
    require(unknown.isEmpty, s"unknown avro corpus fields: ${unknown.mkString(", ")}")
    val fields = FieldDefs.collect { case (n, d) if dataFields.contains(n) => d }
    s"""{"type":"record","name":"Doc","namespace":"graft","fields":[${fields.mkString(",")}]}"""
  }

  /** Write `df` (doc_id, lang, source, text) as deflate-compressed
    * Avro container files, one per input partition. Per-block
    * compression keeps the output splittable — the property that makes
    * this the recommended container for text corpora that need
    * compression AND parallel re-reads.
    */
  def write(df: DataFrame, path: String): Unit = {
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(SchemaJson))
    FileOutputFormat.setCompressOutput(job, true)
    job.getConfiguration.set("avro.output.codec", "deflate")
    val schemaJson = SchemaJson
    df.select("doc_id", "lang", "source", "text").rdd
      .mapPartitions { rows =>
        val schema = new Schema.Parser().parse(schemaJson)
        rows.map { r =>
          val rec = new GenericData.Record(schema)
          rec.put("doc_id", r.getLong(0))
          rec.put("lang", if (r.isNullAt(1)) null else r.getString(1))
          rec.put("source", if (r.isNullAt(2)) null else r.getString(2))
          rec.put("text", if (r.isNullAt(3)) null else r.getString(3))
          (new AvroKey[GenericRecord](rec), NullWritable.get())
        }
      }
      .saveAsNewAPIHadoopFile(
        path,
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
  }

  /** Read Avro container files back as a DataFrame with `readSchema` —
    * which is also the PROJECTION: the reader schema installed on the
    * input format carries only `readSchema`'s data fields (everything
    * but the `_corrupt` pseudo-column, all-null here — binary-container
    * semantics, like ORC), so Avro's reader/writer resolution skips
    * decoding every other field ([[readerSchemaJson]]). Callers prune
    * by passing a subset schema — the manual analog of the column
    * pruning Catalyst cannot push through the `newAPIHadoopFile`
    * boundary. Field values are copied out of the Hadoop record inside
    * the same map (the record reader reuses its datum buffer; Utf8 →
    * String is the copy).
    *
    * Remaining honest scale limitation of the RDD-backed read: filter
    * PUSHDOWN still cannot cross the RDD boundary (and row-oriented
    * Avro has no row-group min/max stats to prune with anyway), so a
    * selective scan reads all container bytes. On a distribution that
    * ships the spark-avro connector, swap this method for
    * `spark.read.format("avro")`; the container files written above
    * are standard and splittable either way.
    */
  def read(spark: SparkSession, path: String, readSchema: StructType): DataFrame = {
    val dataFields = readSchema.fields.map(_.name).filter(_ != "_corrupt").toSeq
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setDataModelClass(job, classOf[GenericData])
    AvroJob.setInputKeySchema(job, new Schema.Parser().parse(readerSchemaJson(dataFields)))
    val outFields = readSchema.fields.map(_.name)
    val rdd = spark.sparkContext
      .newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      .map { case (k, _) =>
        val r = k.datum()
        Row.fromSeq(outFields.toSeq.map {
          case "_corrupt" => null
          case "doc_id"   => r.get("doc_id").asInstanceOf[Long]
          case f          => val v = r.get(f); if (v == null) null else v.toString
        })
      }
    spark.createDataFrame(rdd, readSchema)
  }
}
