package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal columns: opaque binary payloads + typed metadata
  * (reference: converter.py:44 MarkItDown ingest of pdf/image/audio —
  * re-expressed as binary columns with a decode stage).
  *
  * The actual decoders (image/audio libs) are NOT in this container, so
  * [[decodeStub]] is a clearly-marked deterministic fake. The Spark-side
  * plumbing — schema, batch shape (mapPartitions, one iterator pass,
  * nothing materialized per-partition), partition-preserving layout — is
  * real and tested; swapping the stub for a JNI/ONNX decoder changes no
  * plan shape.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)
  ))

  /** Cheap, fully-expression-based features over a binary column —
    * byte length, digest, and the deterministic fake decode dims.
    */
  def features(df: DataFrame, binCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).cast("long").as("n_bytes"),
      md5(col(binCol)).as("digest"),
      (length(col(binCol)).cast("long") % 640).as("fake_w"),
      (length(col(binCol)).cast("long") % 480).as("fake_h")
    )

  /** STUB resize: computes target dimensions preserving aspect ratio
    * from the decoded meta (a real implementation would transform
    * pixels; the dimension math and column contract are real).
    */
  def resizeStub(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      .withColumn("_scale",
        when(greatest(col("meta.width"), col("meta.height")) > maxSide,
          lit(maxSide.toDouble) / greatest(col("meta.width"), col("meta.height")).cast("double"))
          .otherwise(lit(1.0)))
      .withColumn("resized_w", ceil(col("meta.width") * col("_scale")).cast("int"))
      .withColumn("resized_h", ceil(col("meta.height") * col("_scale")).cast("int"))
      .drop("_scale")

  /** STUB frame sampler: one row per sampled frame index with a
    * deterministic per-frame digest (a real video decoder would emit
    * frame bytes). The explode shape — row-per-frame with bounded
    * frames per row — is the real contract a downstream embedder sees.
    */
  def frameSampleStub(decoded: DataFrame, binCol: String, everyN: Int): DataFrame =
    decoded
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("meta.n_frames") - 1, lit(0)), lit(everyN))))
      .withColumn("frame_digest",
        md5(concat(md5(col(binCol)), lit(":"), col("frame_idx").cast("string"))))

  /** STUB decoder: a real implementation would parse image/audio headers
    * and decode frames here. Deterministic fake: dimensions derived from
    * the payload length, format from the first byte. Runs as a single
    * mapPartitions pass so a real (expensive, batch-friendly) decoder
    * drops in without changing the plan.
    */
  def decodeStub(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("meta", MetaSchema, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val meta =
          if (bytes == null || bytes.isEmpty) Row(0, 0, "empty", 0)
          else {
            val h = java.util.Arrays.hashCode(bytes)
            Row(
              1 + java.lang.Math.floorMod(h, 640),
              1 + java.lang.Math.floorMod(h * 31, 480),
              f"fmt${bytes(0) & 0x07}",
              1 + (bytes.length % 30)
            )
          }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc).toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }
}
