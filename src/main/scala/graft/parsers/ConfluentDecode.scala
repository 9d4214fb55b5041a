package graft.parsers

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Confluent schema-registry Avro decode (reference:
  * pkg/parsers/registry/confluentschemaregistry — wire framing + per-id
  * schema resolution + Avro payload decode; pkg/schemaregistry client).
  *
  * Composes with [[ConfluentFraming]] (magic byte + big-endian schema id
  * split). Schema resolution accepts two locator forms: an `http(s)://`
  * base URL → [[HttpRegistry]], the live REST client
  * (`GET /schemas/ids/{id}`), or a directory of `<id>.avsc` files →
  * [[FileRegistry]] (shared-FS deployments and fixtures). Both cache by
  * id per JVM exactly like the reference's client. Decoding uses
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

  /** id → writer schema over the Confluent REST contract
    * (`GET {base}/schemas/ids/{id}` → `{"schema":"…"}`) — the HTTP
    * registry client itself (reference: pkg/schemaregistry). Executors
    * fetch lazily and cache per JVM in [[schemaCache]], so each executor
    * hits the registry once per schema id regardless of row count —
    * the same amortization the reference's client does. 404 → None
    * (unknown id), other non-200s raise. */
  final case class HttpRegistry(baseUrl: String) {
    def schemaJson(id: Int): Option[String] = {
      val uri = java.net.URI.create(
        s"${baseUrl.stripSuffix("/")}/schemas/ids/$id")
      val req = java.net.http.HttpRequest.newBuilder(uri)
        .timeout(java.time.Duration.ofSeconds(10)).GET().build()
      val resp = HttpRegistry.client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 404) None
      else if (resp.statusCode() != 200)
        throw new java.io.IOException(
          s"schema registry $uri -> HTTP ${resp.statusCode()}")
      else Option(HttpRegistry.mapper.readTree(resp.body()).get("schema"))
        .map(_.asText())
    }
  }

  object HttpRegistry {
    private val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    private[parsers] val mapper =
      new com.fasterxml.jackson.databind.ObjectMapper()
  }

  /** Handle on an in-process registry server (test/fixture transport for
    * the HTTP client when no real registry service is reachable). */
  final class RegistryServer(
      server: com.sun.net.httpserver.HttpServer,
      val hits: java.util.concurrent.atomic.AtomicInteger) {
    def baseUrl: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  /** Serve `schemas` over the Confluent REST contract on an ephemeral
    * 127.0.0.1 port (JDK HttpServer — no extra dependency). Counts
    * requests so callers can assert the per-id cache amortizes
    * fetches. */
  def serveRegistry(schemas: Map[Int, String]): RegistryServer = {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schemas/ids/",
      (exchange: com.sun.net.httpserver.HttpExchange) => {
        hits.incrementAndGet()
        val id = exchange.getRequestURI.getPath.split("/").last.toInt
        schemas.get(id) match {
          case Some(schema) =>
            val body = ("{\"schema\":" +
              HttpRegistry.mapper.writeValueAsString(schema) + "}")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            exchange.getResponseHeaders.add("Content-Type",
              "application/vnd.schemaregistry.v1+json")
            exchange.sendResponseHeaders(200, body.length.toLong)
            exchange.getResponseBody.write(body)
          case None => exchange.sendResponseHeaders(404, -1L)
        }
        exchange.close()
      })
    server.start()
    new RegistryServer(server, hits)
  }

  // per-JVM schema caches (executor-side; keyed by dir/id and by text)
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), org.apache.avro.Schema]()
  private val readerCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.avro.Schema]()

  /** Registry locator dispatch: `http(s)://…` → live REST client,
    * anything else → `<id>.avsc` directory. One string flows through
    * configs and cache keys either way. */
  private def lookupSchema(locator: String, id: Int): Option[String] =
    if (locator.startsWith("http://") || locator.startsWith("https://"))
      HttpRegistry(locator).schemaJson(id)
    else FileRegistry(locator).schemaJson(id)

  private def writerSchema(locator: String, id: Int): org.apache.avro.Schema =
    schemaCache.computeIfAbsent((locator, id), { _ =>
      val json = lookupSchema(locator, id).getOrElse(
        throw new IllegalArgumentException(
          s"schema id $id not in registry $locator"))
      new org.apache.avro.Schema.Parser().parse(json)
    })

  private def readerSchema(json: String): org.apache.avro.Schema =
    readerCache.computeIfAbsent(json,
      j => new org.apache.avro.Schema.Parser().parse(j))

  /** Decode one framed payload to the record's JSON rendering. */
  def decodeToJson(registry: String, readerJson: String, id: Int,
                   payload: Array[Byte]): String = {
    val r = new org.apache.avro.generic.GenericDatumReader[
      org.apache.avro.generic.GenericRecord](
      writerSchema(registry, id), readerSchema(readerJson))
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
  def receive(df: DataFrame, rawCol: String, registry: String,
              readerJson: String, target: StructType): DataFrame = {
    val framed = ConfluentFraming.parse(df, rawCol)
    val dec = udf { (payload: Array[Byte], id: Integer) =>
      if (payload == null || id == null) null
      else decodeToJson(registry, readerJson, id, payload)
    }
    framed
      .withColumn("__json", dec(col("payload"), col("schema_id")))
      .withColumn("__rec", from_json(col("__json"), target))
      .select((target.fieldNames.toSeq.map(f => col(s"__rec.$f").as(f)) ++
        Seq(col("schema_id"), col("framing_ok"))): _*)
  }
}
