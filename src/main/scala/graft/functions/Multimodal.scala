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

  /** Content-type sniffing from magic bytes (the public file-signature
    * table: JPEG FFD8FF, PNG 89504E47…, RIFF containers, ISO-BMFF
    * `ftyp`, …) — what a mixed media crawl runs FIRST, before trusting
    * any declared mime or paying for a decode. Pure hex-prefix
    * comparisons on the binary column: whole-stage codegen, scan
    * speed, no UDFs. Unknown signatures map to
    * `application/octet-stream`. */
  def mimeSniff(payload: Column): Column = {
    def at(off: Int, n: Int) = hex(substring(payload, off + 1, n))
    def pfx(n: Int) = at(0, n)
    when(pfx(3) === "FFD8FF", "image/jpeg")
      .when(pfx(8) === "89504E470D0A1A0A", "image/png")
      .when(pfx(6).isin("474946383761", "474946383961"), "image/gif")
      // RIFF containers discriminate on the format tag at offset 8
      .when(pfx(4) === "52494646" && at(8, 4) === "57415645", "audio/wav")
      .when(pfx(4) === "52494646" && at(8, 4) === "57454250", "image/webp")
      .when(pfx(4) === "52494646" && at(8, 4) === "41564920", "video/avi")
      // ISO-BMFF: box size (4 bytes) then 'ftyp'
      .when(at(4, 4) === "66747970", "video/mp4")
      .when(pfx(4) === "4F676753", "audio/ogg")
      .when(pfx(4) === "664C6143", "audio/flac")
      .when(pfx(3) === "494433", "audio/mpeg")
      .when(pfx(4) === "25504446", "application/pdf")
      .when(pfx(4) === "504B0304", "application/zip")
      .otherwise("application/octet-stream")
  }

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
