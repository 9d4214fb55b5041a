package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct, with batch-shaped
  * decode/feature/resize stages over `mapPartitions`.
  *
  * The decode kernels themselves are STUBBED (no media libraries in this
  * container) with deterministic fakes — the Spark-side contract is the
  * real deliverable: schema, batch iteration, partitioning, and the
  * rule that binary payloads never pass through a shuffle wider than
  * their metadata (filter on metadata first, decode last).
  */
object Multimodal {

  /** media metadata carried next to every binary payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a source column as (payload binary, meta struct). The fixture
    * tables carry no real media, so payloads come from text bytes and
    * metadata is derived deterministically — the schema and plan shape
    * are what downstream stages program against. */
  def asMedia(df: DataFrame, srcCol: String, mime: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast(BinaryType))
      .withColumn("media_meta", struct(
        lit(mime).as("mime"),
        (length(col(srcCol)) % 1920).cast(IntegerType).as("width"),
        (length(col(srcCol)) % 1080).cast(IntegerType).as("height"),
        (length(col(srcCol)).cast(LongType) * 33).as("duration_ms")))

  /** Cheap metadata-level features — pure expressions, no decode:
    * byte length and content hash. This is the stage that should do all
    * filtering/dedup before any expensive decode runs. */
  def byteFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("byte_len", octet_length(col(payloadCol)))
      .withColumn("content_sha", sha2(col(payloadCol), 256))

  /** Batch decode stage: mapPartitions with a per-batch kernel — the
    * Scala analogue of a pandas-UDF `mapInPandas` stage. The kernel here
    * is a deterministic FAKE (mean byte value + simple byte histogram);
    * a real deployment swaps `decodeKernel` for an image/audio library
    * call with the identical batch contract. */
  val FeatureDim = 8

  private[functions] def decodeKernel(payload: Array[Byte]): Array[Float] = {
    // STUB: stands in for e.g. JPEG decode + model featurization.
    val out = new Array[Float](FeatureDim)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < FeatureDim) { out(j) /= payload.length; j += 1 }
    out
  }

  /** Decode/feature-extract over batches. Output: input columns plus
    * `features array<float>`. Partition-parallel, constant memory per
    * batch, no driver involvement. */
  def decodeFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.get(idx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq :+ decodeKernel(payload).toSeq)
      }
    }(enc)
  }

  /** Frame sampling stub: pick every `stride`-th chunk of the payload —
    * stands in for video frame extraction; the plan shape (explode to
    * one row per frame, carrying metadata) is the real contract. */
  def sampleFrames(df: DataFrame, stride: Int,
                   payloadCol: String = "payload"): DataFrame = {
    val nFrames = greatest(lit(1),
      (octet_length(col(payloadCol)) / lit(stride)).cast(IntegerType))
    df.withColumn("frame_idx",
        explode(sequence(lit(0), nFrames - 1)))
      .withColumn("frame",
        col(payloadCol).substr(col("frame_idx") * stride + 1, lit(stride)))
  }
}
