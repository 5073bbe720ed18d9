package thrivespark.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star requirement): media as opaque
  * BINARY columns + typed metadata, with decode/feature-extract implemented
  * as a distributed mapPartitions stage.
  *
  * The actual codec is STUBBED (no image/audio libraries ship in this
  * container — see the task brief): `decodeStub` produces a deterministic
  * fake feature vector from the bytes. Everything Spark-side — schema,
  * batch shape, partition-parallel execution, null passthrough — is real
  * and tested in MultimodalSpec. Swap `decodeStub` for a real codec on a
  * cluster with the native libs installed. */
object Multimodal {

  /** Canonical multimodal record schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("payload", BinaryType, nullable = true),    // opaque bytes
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Deterministic fake decode: 8 features derived from payload bytes.
    * STUB — replace with a real image/audio decode on a real cluster. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    if (payload == null) return null
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Distributed feature extraction: partition-parallel decode of the binary
    * payload column into a feature vector column. mapPartitions keeps any
    * per-partition codec initialization amortized (the pattern a real decoder
    * needs); rows with null payloads pass through with null features. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights, …)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feats = decodeStub(payload)
        Row.fromSeq(r.toSeq :+ (if (feats == null) null else feats.toSeq))
      }
    }(enc)
  }

  /** Deterministic fake resize: maps payload bytes onto a w×h grid by
    * modular sampling. STUB — a real implementation decodes, resamples and
    * re-encodes; the Spark-side contract (binary→binary, null-safe,
    * partition-parallel) is what this exercises. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty) return payload
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < out.length) { out(i) = payload(i % payload.length); i += 1 }
    out
  }

  /** Deterministic fake frame sampling: every nth chunk of the payload as a
    * "frame". STUB for video decode; real codecs slot into the same
    * signature (binary → array<binary>). */
  def frameSampleStub(payload: Array[Byte], frameSize: Int, everyNth: Int): Seq[Array[Byte]] = {
    if (payload == null) return null
    payload.grouped(frameSize).zipWithIndex
      .collect { case (chunk, idx) if idx % everyNth == 0 => chunk }
      .toSeq
  }

  /** Column-level surface for the stubs (registered as UDFs by callers):
    * media.withColumn("thumb", resizeUdf(col("payload"), lit(8), lit(8))). */
  def resizeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(resizeStub _)
  def frameSampleUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(frameSampleStub _)

  /** Build a media frame from the documents table (text bytes standing in
    * for an opaque payload — deterministic, no external data needed). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      col("text").cast("binary").as("payload"),
      lit(64).as("width"), lit(64).as("height"),
      lit(null).cast("long").as("duration_ms"))
}
