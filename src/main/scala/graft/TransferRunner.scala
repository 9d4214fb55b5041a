package graft

import graft.config._
import graft.operators.TransformerChain
import graft.sinks.Sinks
import graft.sources.{Readers, SampleSource}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine driver: activate/upload/replicate for a [[Transfer]]
  * (reference: cmd/trcli activate/upload/replicate entry points, §3 of
  * SURVEY.md). The reference's hand-built machinery — sharded part
  * queues, goroutine pools, coordinator state, middleware chain assembly
  * (worker/tasks/load_snapshot.go, pkg/sink_factory/sink_factory.go) —
  * collapses to: build the source plan, fold the transformer chain,
  * write. Spark's scheduler IS the coordinator; partitions ARE the
  * table parts; task retry IS the retrier middleware.
  */
object TransferRunner {

  def source(spark: SparkSession, cfg: SourceConfig): DataFrame = cfg match {
    case SourceConfig.Parquet(path) => spark.read.parquet(path)
    case SourceConfig.Csv(path, d, h) => Readers.csv(spark, path, d, h)
    case SourceConfig.JsonLines(path) => Readers.jsonLines(spark, path)
    case SourceConfig.Text(path) => Readers.lines(spark, path)
    case SourceConfig.Jdbc(url, table, part, lo, hi, n, props) =>
      val r = spark.read.format("jdbc")
        .option("url", url).option("dbtable", table)
      val sharded = part match {
        case Some(c) => r.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", n)
        case None => r
      }
      props.foldLeft(sharded) { case (x, (k, v)) => x.option(k, v) }.load()
    case SourceConfig.Kafka(bootstrap, topic, offsets) =>
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", offsets).load()
    case SourceConfig.Sample(rows) => SampleSource.iot(spark, rows)
    case SourceConfig.TextStream(dir) => spark.readStream.text(dir)
  }

  private def wireFormat(name: String): sinks.KafkaSink.WireFormat =
    name match {
      case "debezium" => sinks.KafkaSink.DebeziumWire
      case "csv" => sinks.KafkaSink.CsvWire()
      case _ => sinks.KafkaSink.JsonWire
    }

  def write(df: DataFrame, cfg: SinkConfig, cleanup: Sinks.CleanupPolicy): Unit =
    cfg match {
      case SinkConfig.Parquet(path, parts) =>
        Sinks.parquet(df, path, cleanup, parts)
      case SinkConfig.Csv(path, d) => Sinks.csv(df, path, d, policy = cleanup)
      case SinkConfig.JsonLines(path) => Sinks.jsonLines(df, path, cleanup)
      case SinkConfig.Console => Sinks.console(df)
      case SinkConfig.Merge(path, pks) =>
        streaming.CdcStream.mergeBatch(df, path, pks)
      case SinkConfig.Kafka(bootstrap, topic, fmt, keyCols) =>
        sinks.KafkaSink.writeBatch(df, bootstrap, topic, keyCols,
          wireFormat(fmt))
      case SinkConfig.FileQueue(dir, topic, fmt, keyCols) =>
        sinks.KafkaSink.writeFileQueue(df, dir, topic, keyCols,
          wireFormat(fmt))
      case SinkConfig.Jdbc(url, table, props) =>
        sinks.JdbcSink.write(df, url, table, cleanup, props)
      case SinkConfig.Delta(path) =>
        sources.DeltaLite.write(df, path,
          overwrite = cleanup != Sinks.Disabled)
        ()
    }

  /** `trcli check`: validate that the source is reachable and readable,
    * returning its schema (reference: cmd/trcli check/describe — the
    * activation preflight). Batch sources are probed with a 1-row scan;
    * streaming sources are validated by plan construction (schema
    * resolution) since a probe would require starting a query. */
  def check(spark: SparkSession, cfg: SourceConfig): Either[String, org.apache.spark.sql.types.StructType] =
    try {
      val df = source(spark, cfg)
      if (!df.isStreaming) { df.limit(1).collect(); () }
      Right(df.schema)
    } catch {
      case e: Exception =>
        Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
    }

  /** `trcli describe`: per-source column listing in the engine's
    * canonical (YT-lattice) spellings. */
  def describe(spark: SparkSession, cfg: SourceConfig): Either[String, Seq[(String, String)]] =
    check(spark, cfg).map(_.fields.toSeq.map(f =>
      f.name -> graft.model.TypeMapping.sparkToYt(f)))

  /** Snapshot upload: `trcli activate/upload` for SNAPSHOT_ONLY
    * (reference: worker/tasks/load_snapshot.go:88 LoadSnapshot). Applies
    * the transformer chain, routes quarantine rows, writes the sink. */
  def runSnapshot(spark: SparkSession, t: Transfer, table: String = ""): Unit = {
    val src = source(spark, t.source)
    val chain = TransformerChain(t.transformers)
    val out = chain(src, table)
    t.errorsOutput match {
      case ErrorsOutput.ToPath(p) =>
        chain.errors(src, table).foreach(Sinks.parquet(_, p, Sinks.Disabled))
      case ErrorsOutput.DevNull => ()
    }
    write(out, t.sink, t.cleanup)
  }

  /** Replication: `trcli replicate` for INCREMENT_ONLY (reference:
    * runtime/local/replication.go:83). The source must be streaming; the
    * sink is either a Merge target (warehouse direction) or a queue
    * (Kafka / file-queue mirror direction — the reference's db→queue
    * transfers). Returns the started query. */
  def runReplication(spark: SparkSession, t: Transfer,
                     pks: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery = {
    val src = source(spark, t.source)
    require(src.isStreaming, "replication requires a streaming source")
    val chain = TransformerChain(t.transformers)
    val out = chain(src)
    t.sink match {
      // dead-letter routing in the stream: transformers apply per
      // micro-batch so quarantine rows land next to the state (the
      // reference's ErrorsOutput=sink behavior during replication)
      case SinkConfig.Merge(path, _)
          if t.errorsOutput.isInstanceOf[ErrorsOutput.ToPath] =>
        val ErrorsOutput.ToPath(errPath) = t.errorsOutput: @unchecked
        val ckpt = t.checkpointDir.getOrElse(path + "_checkpoint")
        src.writeStream
          .option("checkpointLocation", ckpt)
          .trigger(streaming.CdcStream.Bufferer().trigger)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            chain.errors(batch).foreach(
              sinks.Sinks.parquet(_, errPath, sinks.Sinks.Disabled))
            streaming.CdcStream.mergeBatch(chain(batch), path, pks)
          }.start()
      case SinkConfig.Merge(path, _) =>
        val ckpt = t.checkpointDir.getOrElse(path + "_checkpoint")
        streaming.CdcStream.replicate(out, path, ckpt, pks,
          streaming.CdcStream.Bufferer()).start()
      case SinkConfig.Kafka(bootstrap, topic, fmt, keyCols) =>
        val ckpt = t.checkpointDir.getOrElse(s"/tmp/graft_ckpt_$topic")
        sinks.KafkaSink.streamWriter(out, bootstrap, topic, ckpt,
          if (keyCols.nonEmpty) keyCols else pks, wireFormat(fmt)).start()
      case SinkConfig.FileQueue(dir, topic, fmt, keyCols) =>
        val ckpt = t.checkpointDir.getOrElse(s"$dir/${topic}_checkpoint")
        val keys = if (keyCols.nonEmpty) keyCols else pks
        out.writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            sinks.KafkaSink.appendFileQueue(batch, dir, topic, keys,
              wireFormat(fmt))
          }.start()
      case other => throw new IllegalArgumentException(
        s"replication requires a Merge or queue sink, got $other")
    }
  }

  /** SNAPSHOT_AND_INCREMENT: snapshot first, then hand off to the
    * stream (reference: worker/tasks/start_job.go transition). The
    * snapshot lands through the same Merge sink so replication resumes
    * idempotently on top of it. */
  def runBoth(spark: SparkSession, t: Transfer, pks: Seq[String],
              stream: DataFrame): org.apache.spark.sql.streaming.StreamingQuery = {
    val snapCfg = t.copy(transferType = TransferType.SnapshotOnly)
    runSnapshot(spark, snapCfg)
    val ckpt = t.checkpointDir.getOrElse("/tmp/graft_ckpt")
    val stateDir = t.sink match {
      case SinkConfig.Merge(path, _) => path
      case other => throw new IllegalArgumentException(s"need Merge sink, got $other")
    }
    streaming.CdcStream.replicate(
      TransformerChain(t.transformers)(stream), stateDir, ckpt, pks,
      streaming.CdcStream.Bufferer()).start()
  }
}
