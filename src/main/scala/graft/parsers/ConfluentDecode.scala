package graft.parsers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Confluent schema-registry Avro decode (reference:
  * pkg/parsers/registry/confluentschemaregistry — wire framing + per-id
  * schema resolution + Avro payload decode; pkg/schemaregistry client).
  *
  * Composes with [[ConfluentFraming]] (magic byte + big-endian schema id
  * split). Schema resolution is pluggable behind [[FileRegistry]] — a
  * directory of `<id>.avsc` files, the sandbox-safe stand-in for the
  * HTTP registry (same contract: id → writer schema; the reference's
  * client caches by id exactly like [[schemaCache]] here). Decoding uses
  * Avro schema RESOLUTION: each message is read with its own writer
  * schema against the pipeline's declared reader schema, so mixed-schema
  * topics (producer upgrades mid-stream) decode to one frame — added
  * fields backfill their defaults, dropped fields are ignored.
  *
  * The decoded record lands as JSON text and is parsed by `from_json`
  * into the declared StructType — keeping the whole pipeline in
  * DataFrame-land (a cluster deployment would swap the JSON hop for
  * spark-avro's `from_avro` once that package is on the classpath; the
  * registry, framing and resolution logic stay identical).
  */
object ConfluentDecode {

  /** id → writer schema from a directory of `<id>.avsc` files. The dir
    * must be visible to executors (local FS here; ship via
    * `spark.files` or a shared FS on a cluster). */
  final case class FileRegistry(dir: String) {
    def schemaJson(id: Int): Option[String] = {
      val p = java.nio.file.Paths.get(dir, s"$id.avsc")
      if (java.nio.file.Files.exists(p))
        Some(java.nio.file.Files.readString(p))
      else None
    }
  }

  // per-JVM schema caches (executor-side; keyed by dir/id and by text)
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), org.apache.avro.Schema]()
  private val readerCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.avro.Schema]()

  private def writerSchema(dir: String, id: Int): org.apache.avro.Schema =
    schemaCache.computeIfAbsent((dir, id), { _ =>
      val json = FileRegistry(dir).schemaJson(id).getOrElse(
        throw new IllegalArgumentException(s"schema id $id not in registry $dir"))
      new org.apache.avro.Schema.Parser().parse(json)
    })

  private def readerSchema(json: String): org.apache.avro.Schema =
    readerCache.computeIfAbsent(json,
      j => new org.apache.avro.Schema.Parser().parse(j))

  /** Decode one framed payload to the record's JSON rendering. */
  def decodeToJson(registryDir: String, readerJson: String, id: Int,
                   payload: Array[Byte]): String = {
    val r = new org.apache.avro.generic.GenericDatumReader[
      org.apache.avro.generic.GenericRecord](
      writerSchema(registryDir, id), readerSchema(readerJson))
    val dec = org.apache.avro.io.DecoderFactory.get()
      .binaryDecoder(payload, null)
    r.read(null, dec).toString
  }

  /** Encode values into the Confluent wire format (magic 0x00 + BE id +
    * Avro binary) — the emit direction, also used to build fixtures. */
  def encode(schemaJson: String, schemaId: Int,
             values: Map[String, Any]): Array[Byte] = {
    val schema = readerSchema(schemaJson)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    values.foreach { case (k, v) => rec.put(k, v) }
    val out = new java.io.ByteArrayOutputStream()
    out.write(0)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(schemaId).array())
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
    new org.apache.avro.generic.GenericDatumWriter[
      org.apache.avro.generic.GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Full receive path: framing split → per-id Avro decode against the
    * reader schema → typed columns. Unframed rows (bad magic) surface
    * with null fields and `framing_ok = false` for quarantine routing. */
  def receive(df: DataFrame, rawCol: String, registryDir: String,
              readerJson: String, target: StructType): DataFrame = {
    val framed = ConfluentFraming.parse(df, rawCol)
    val dec = udf { (payload: Array[Byte], id: Integer) =>
      if (payload == null || id == null) null
      else decodeToJson(registryDir, readerJson, id, payload)
    }
    framed
      .withColumn("__json", dec(col("payload"), col("schema_id")))
      .withColumn("__rec", from_json(col("__json"), target))
      .select((target.fieldNames.toSeq.map(f => col(s"__rec.$f").as(f)) ++
        Seq(col("schema_id"), col("framing_ok"))): _*)
  }
}
