package graft

import graft.config._
import graft.model.Fallbacks
import graft.operators.{ProblemItemDetector, Transformers => T}
import graft.sinks.Rotator
import graft.sources.{Catalog, DbLog}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TransferRunnerSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_tr").toString

  test("snapshot transfer: parquet -> transform chain -> parquet with cleanup") {
    val out = tmp() + "/dst"
    val t = Transfer(
      TransferType.SnapshotOnly,
      SourceConfig.Parquet(sf() + "/region.parquet"),
      SinkConfig.Parquet(out),
      transformers = Seq(T.FilterRows(Seq("r_regionkey >= 2"))),
      cleanup = graft.sinks.Sinks.Drop)
    TransferRunner.runSnapshot(spark, t)
    TransferRunner.runSnapshot(spark, t) // Drop policy: idempotent rerun
    assert(spark.read.parquet(out).count() == 3)
  }

  test("snapshot transfer with quarantine error output") {
    val errDir = tmp() + "/errs"
    val srcDir = tmp() + "/src"
    Seq((1L, """{"k": 1}"""), (2L, "{bad")).toDF("id", "raw")
      .write.parquet(srcDir)
    val t = Transfer(
      TransferType.SnapshotOnly,
      SourceConfig.Parquet(srcDir),
      SinkConfig.Parquet(tmp() + "/dst"),
      transformers = Seq(T.JsonParser("raw", org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType))))),
      errorsOutput = ErrorsOutput.ToPath(errDir))
    TransferRunner.runSnapshot(spark, t)
    assert(spark.read.parquet(errDir).select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("sample source transfer and merge sink") {
    val state = tmp() + "/merged"
    val t = Transfer(
      TransferType.SnapshotOnly,
      SourceConfig.Sample(50),
      SinkConfig.Merge(state, Seq("event_id")))
    TransferRunner.runSnapshot(spark, t)
    assert(spark.read.parquet(state).count() == 50)
  }

  test("catalog lists tables with schema and sane row estimates") {
    val infos = Catalog.tableList(spark, sf(), Seq("region", "nation"))
    assert(infos.map(_.name) == Seq("region", "nation"))
    assert(infos.head.schema.fieldNames.contains("r_name"))
    assert(infos.forall(_.estimatedRows > 0))
    val region = spark.read.parquet(sf() + "/region.parquet")
    assert(Catalog.exactRows(region) == 5)
  }

  test("dblog reconcile: snapshot + newer changelog merge to final state") {
    val snapshot = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changelog = Seq(
      (2L, "b2", "update", 10L), (3L, null.asInstanceOf[String], "delete", 11L),
      (4L, "d", "insert", 12L), (1L, "old", "update", 1L))
      .toDF("id", "v", "__kind", "__lsn").withColumn("__counter", lit(0))
    // snapshot taken at lsn 5: the lsn-1 event is already inside it
    val out = DbLog.reconcile(snapshot, changelog, Seq("id"), snapshotLsn = 5L)
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, "a"), (2L, "b2"), (4L, "d")))
  }

  test("fallbacks: downgrade chain applies only versions beyond the endpoint") {
    val df = Seq((java.sql.Timestamp.valueOf("2024-01-01 01:02:03.456789"), "x"))
      .toDF("ts", "v")
    val fb = Seq(
      Fallbacks.timestampAsDatetime(Seq("ts"), since = 5),
      Fallbacks.Fallback(3, "drop_v", _.drop("v")))
    val v4 = Fallbacks.applyFor(df, endpointVersion = 4, fb)
    assert(v4.columns.contains("v")) // since=3 not applied for v4 endpoint
    assert(v4.select("ts").collect().head.getTimestamp(0).toString
      == "2024-01-01 01:02:03.0")
    val v2 = Fallbacks.applyFor(df, endpointVersion = 2, fb)
    assert(!v2.columns.contains("v"))
  }

  test("rotator: tag, partitioned write, expiry") {
    val path = tmp() + "/rot"
    val df = Seq(
      ("2024-01-01 10:00:00", 1), ("2024-01-02 11:00:00", 2),
      ("2024-01-03 12:00:00", 3))
      .toDF("ts", "v").withColumn("ts", to_timestamp(col("ts")))
    Rotator.write(df, "ts", Rotator.Daily, path)
    assert(Rotator.periods(spark, path) ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    val expired = Rotator.expire(spark, path, keep = 2)
    assert(expired == Seq("2024-01-01"))
    assert(Rotator.periods(spark, path) == Seq("2024-01-02", "2024-01-03"))
  }

  test("problem item detector isolates poison rows by bisection") {
    val df = spark.range(1, 33).toDF("id")
    val poison = Set(7L, 21L)
    def attempt(d: org.apache.spark.sql.DataFrame): Unit = {
      val ids = d.select("id").as[Long].collect().toSet
      if (ids.intersect(poison).nonEmpty)
        throw new RuntimeException("sink rejected batch")
    }
    val found = ProblemItemDetector.detect(df, "id", attempt)
    assert(found.map(_._2).toSet == poison)
    assert(found.forall { case (lo, hi) => hi - lo == 1 })
  }

  test("streamed replication routes quarantine rows to the dead-letter path") {
    import org.apache.spark.sql.types._
    val dir = tmp()
    val in = dir + "/in"
    Files.createDirectories(java.nio.file.Paths.get(in))
    Files.writeString(java.nio.file.Paths.get(in, "b1.jsonl"),
      """{"id": 1, "v": "a"}""" + "\n{bad\n" + """{"id": 2, "v": "b"}""")
    val t = Transfer(
      TransferType.IncrementOnly,
      SourceConfig.TextStream(in),
      SinkConfig.Merge(dir + "/state", Seq("id")),
      transformers = Seq(T.JsonParser("value", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))),
      errorsOutput = ErrorsOutput.ToPath(dir + "/errs"),
      checkpointDir = Some(dir + "/ckpt"))
    val q = TransferRunner.runReplication(spark, t, Seq("id"))
    try q.processAllAvailable() finally q.stop()
    val state = graft.streaming.CdcStream.readState(spark, dir + "/state")
      .select("id", "v").as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(state == Seq((1L, "a"), (2L, "b")))
    val errs = spark.read.parquet(dir + "/errs")
      .select("value").as[String].collect().toSeq
    assert(errs == Seq("{bad"))
  }

  test("check/describe validate sources and report canonical types") {
    val ok = TransferRunner.check(spark,
      SourceConfig.Parquet(sf() + "/region.parquet"))
    assert(ok.isRight && ok.toOption.get.fieldNames.contains("r_regionkey"))
    val desc = TransferRunner.describe(spark,
      SourceConfig.Parquet(sf() + "/region.parquet"))
    assert(desc.toOption.get.toMap.apply("r_name") == "string")
    val bad = TransferRunner.check(spark,
      SourceConfig.Parquet("/nope/missing.parquet"))
    assert(bad.isLeft)
    // streaming source: schema resolution without starting a query
    val stream = TransferRunner.check(spark,
      SourceConfig.TextStream(tmp()))
    assert(stream.isRight && stream.toOption.get.fieldNames.sameElements(Array("value")))
  }

  test("jdbc dialect maps unsigned and tiny types both directions") {
    import graft.sources.GraftJdbcDialect
    import java.sql.Types
    import org.apache.spark.sql.types._
    assert(GraftJdbcDialect.canHandle("jdbc:graft:postgresql://x"))
    assert(!GraftJdbcDialect.canHandle("jdbc:postgresql://x"))
    val md = new MetadataBuilder()
    assert(GraftJdbcDialect.getCatalystType(Types.BIGINT, "BIGINT UNSIGNED", 20, md)
      .contains(DecimalType(20, 0)))
    assert(GraftJdbcDialect.getCatalystType(Types.TINYINT, "TINYINT", 3, md)
      .contains(ByteType))
    assert(GraftJdbcDialect.getJDBCType(DecimalType(20, 0)).map(_.databaseTypeDefinition)
      .contains("NUMERIC(20)"))
  }
}
