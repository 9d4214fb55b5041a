package graft.streaming

import graft.SparkSpec
import graft.model.{CdcEnvelope => E}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_stream").toString

  private def batch(rows: (Long, String, String, Long)*) =
    rows.toSeq.toDF("id", "v", E.Kind, E.Lsn)
      .withColumn(E.Counter, lit(0))

  test("mergeBatch applies upsert semantics into the state dir") {
    val state = tmp() + "/t1"
    CdcStream.mergeBatch(
      batch((1L, "a", "insert", 0L), (2L, "b", "insert", 1L)), state, Seq("id"))
    CdcStream.mergeBatch(
      batch((1L, "a2", "update", 2L), (3L, "c", "insert", 3L),
        (2L, "b", "delete", 4L)), state, Seq("id"))
    val out = spark.read.parquet(state).select("id", "v")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, "a2"), (3L, "c")))
  }

  test("mergeBatch is idempotent under replay (exactly-once on restart)") {
    val state = tmp() + "/t2"
    val b = batch((1L, "x", "insert", 0L), (1L, "y", "update", 1L))
    CdcStream.mergeBatch(b, state, Seq("id"))
    val once = spark.read.parquet(state).collect().toSeq
    CdcStream.mergeBatch(b, state, Seq("id"))   // replay the same batch
    val twice = spark.read.parquet(state).collect().toSeq
    assert(once == twice)
    assert(once.size == 1)
  }

  test("mergeBatch rewrites only buckets containing batch keys") {
    val state = tmp() + "/tb"
    // 1000-key snapshot spread over all buckets
    val snap = spark.range(0, 1000)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
    CdcStream.mergeBatch(snap, state, Seq("id"))
    def listing(): Map[String, Set[(String, Long, Long)]] = {
      val root = java.nio.file.Paths.get(state)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(root).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith(CdcStream.BucketCol))
        .map { b =>
          b.getFileName.toString ->
            java.nio.file.Files.list(b).iterator().asScala.map(f =>
              (f.getFileName.toString, java.nio.file.Files.size(f),
                java.nio.file.Files.getLastModifiedTime(f).toMillis)).toSet
        }.toMap
    }
    val before = listing()
    assert(before.size > 8, "snapshot should populate many buckets")
    // a 1-key batch must rewrite exactly one bucket
    CdcStream.mergeBatch(batch((5L, "v5b", "update", 1L)), state, Seq("id"))
    val after = listing()
    val changed = (before.keySet ++ after.keySet).filter(k =>
      before.get(k) != after.get(k))
    assert(changed.size == 1,
      s"expected exactly one rewritten bucket, got $changed")
    val out = CdcStream.readState(spark, state)
    assert(out.count() == 1000)
    assert(out.filter(col("id") === 5).select("v").as[String].head() == "v5b")
  }

  test("property: a random batch sequence merged into bucketed state " +
    "equals the naive map replay") {
    val rnd = new scala.util.Random(20260812)
    for (round <- 1 to 3) {
      val state = tmp() + s"/prop$round"
      val table = scala.collection.mutable.Map[Long, String]()
      var lsn = 0L
      for (_ <- 1 to 4) {  // 4 micro-batches
        val events = (1 to 30).map { _ =>
          lsn += 1
          val k = rnd.nextInt(12).toLong
          rnd.nextInt(3) match {
            case 0 => (k, s"v$lsn", "insert", lsn)
            case 1 => (k, s"v$lsn", "update", lsn)
            case _ => (k, null: String, "delete", lsn)
          }
        }
        // reference: apply collapsed semantics event by event
        events.foreach {
          case (k, _, "delete", _) => table.remove(k)
          case (k, v, _, _) => table(k) = v
        }
        CdcStream.mergeBatch(batch(events: _*), state, Seq("id"),
          numBuckets = 8)
      }
      val got = CdcStream.readState(spark, state)
        .select("id", "v").as[(Long, String)].collect().toMap
      assert(got == table.toMap, s"round $round diverged")
    }
  }

  test("lookup reads only the key's bucket") {
    val state = tmp() + "/tl"
    val snap = spark.range(0, 500)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
    CdcStream.mergeBatch(snap, state, Seq("id"), numBuckets = 16)
    val hit = CdcStream.lookup(spark, state, Seq("id"), Seq(42L))
    assert(hit.select("v").as[String].collect().toSeq == Seq("v42"))
    // the plan touches exactly one bucket dir's files
    val dirs = hit.inputFiles.map(f =>
      f.split("/").find(_.startsWith(CdcStream.BucketCol)).get).toSet
    assert(dirs.size == 1, s"lookup scanned $dirs")
    // driver-side bucket matches the layout's bucket expression
    val expected = spark.range(42, 43).select(
      CdcStream.bucketOf(Seq("id"), 16)).first().getInt(0)
    assert(dirs.head == s"${CdcStream.BucketCol}=$expected")
  }

  test("lookup agrees with the layout for composite keys") {
    val state = tmp() + "/tk"
    val snap = spark.range(0, 100).select(
      col("id"), (col("id") % 7).as("k2"),
      concat(lit("v"), col("id")).as("v"))
    CdcStream.mergeBatch(snap, state, Seq("id", "k2"), numBuckets = 8)
    val hit = CdcStream.lookup(spark, state, Seq("id", "k2"), Seq(13L, 6L))
    assert(hit.select("v").as[String].collect().toSeq == Seq("v13"))
    // key rendering ambiguity check: ("1","23") must not alias ("12","3")
    val miss = CdcStream.lookup(spark, state, Seq("id", "k2"), Seq(136L, 0L))
    assert(miss.count() == 0)
  }

  test("mergeBatch recovers a crashed swap from the .bak dir") {
    val state = tmp() + "/tc"
    val snap = spark.range(0, 200)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
    CdcStream.mergeBatch(snap, state, Seq("id"), numBuckets = 8)
    // simulate a swap that died between backup and move-in: one live
    // bucket sits in .bak, missing from the state dir
    val root = java.nio.file.Paths.get(state)
    import scala.jdk.CollectionConverters._
    val bucket = java.nio.file.Files.list(root).iterator().asScala
      .filter(_.getFileName.toString.startsWith(CdcStream.BucketCol))
      .toSeq.head
    val bak = java.nio.file.Paths.get(state + ".bak")
    java.nio.file.Files.createDirectories(bak)
    java.nio.file.Files.move(bucket, bak.resolve(bucket.getFileName))
    // next merge must first restore the backed-up bucket, then apply
    CdcStream.mergeBatch(batch((5L, "v5c", "update", 9L)), state, Seq("id"))
    val out = CdcStream.readState(spark, state)
    assert(out.count() == 200, "rows lost across crash recovery")
    assert(out.filter(col("id") === 5).select("v").as[String].head() == "v5c")
    assert(!java.nio.file.Files.exists(bak))
  }

  test("legacy flat state migrates into buckets on first contact") {
    val state = tmp() + "/tlg"
    spark.range(0, 50)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
      .write.parquet(state)                       // pre-bucketed layout
    CdcStream.mergeBatch(batch((5L, "v5x", "update", 1L)), state, Seq("id"))
    val out = CdcStream.readState(spark, state)
    assert(out.count() == 50)
    assert(out.filter(col("id") === 5).select("v").as[String].head() == "v5x")
    // flat files are gone, bucket dirs exist
    val names = new java.io.File(state).listFiles().map(_.getName).toSeq
    assert(!names.exists(_.startsWith("part-")), s"flat files remain: $names")
    assert(names.exists(_.startsWith(CdcStream.BucketCol)))
  }

  test("crash mid-legacy-migration leaves the flat snapshot recoverable") {
    val state = tmp() + "/tlc"
    spark.range(0, 50)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
      .write.parquet(state)
    // simulate a crash inside the swap window: the flat part-* files are
    // staged in .bak, and one rewritten bucket already landed in root
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(state)
    val bak = java.nio.file.Paths.get(state + ".bak")
    java.nio.file.Files.createDirectories(bak)
    java.nio.file.Files.list(root).iterator().asScala.toSeq
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .foreach(p => java.nio.file.Files.move(p, bak.resolve(p.getFileName)))
    val debris = tmp() + "/debris"
    Seq((999L, "zz")).toDF("id", "v").write.parquet(debris)
    java.nio.file.Files.move(java.nio.file.Paths.get(debris),
      root.resolve(s"${CdcStream.BucketCol}=0"))
    // replay: recovery must restore the flat snapshot, discard the
    // half-swapped bucket, then run the migration + merge
    CdcStream.mergeBatch(batch((5L, "v5c", "update", 9L)), state, Seq("id"))
    val out = CdcStream.readState(spark, state)
    assert(out.count() == 50, "pre-batch snapshot lost across crash")
    assert(out.filter(col("id") === 999).count() == 0, "debris row survived")
    assert(out.filter(col("id") === 5).select("v").as[String].head() == "v5c")
    assert(!java.nio.file.Files.exists(bak))
  }

  test("null PK components bucket where lookup probes") {
    val state = tmp() + "/tnull"
    val snap = Seq((Option(1L), "a"), (Option(2L), "b"),
      (None: Option[Long], "nullkey"))
      .toDF("id", "v")
    CdcStream.mergeBatch(snap, state, Seq("id"), numBuckets = 16)
    assert(CdcStream.readState(spark, state).count() == 3)
    // the null-keyed row is findable: lookup probes the bucket the row
    // actually landed in (concat_ws would have dropped the null)
    val hit = CdcStream.lookup(spark, state, Seq("id"), Seq(null))
    assert(hit.select("v").as[String].collect().toSeq == Seq("nullkey"))
    val hit1 = CdcStream.lookup(spark, state, Seq("id"), Seq(1L))
    assert(hit1.select("v").as[String].collect().toSeq == Seq("a"))
  }

  test("mergeBatch pins numBuckets from the state meta across batches") {
    val state = tmp() + "/tm"
    CdcStream.mergeBatch(batch((1L, "a", "insert", 0L)), state, Seq("id"),
      numBuckets = 4)
    // later caller passes a different numBuckets: the meta wins
    CdcStream.mergeBatch(batch((2L, "b", "insert", 1L)), state, Seq("id"),
      numBuckets = 64)
    val dirs = new java.io.File(state).listFiles()
      .filter(_.getName.startsWith(CdcStream.BucketCol))
      .map(_.getName).toSeq
    val buckets = dirs.map(_.stripPrefix(CdcStream.BucketCol + "=").toInt)
    assert(buckets.forall(_ < 4), s"bucket ids $buckets exceed pinned count 4")
    assert(CdcStream.readState(spark, state).count() == 2)
  }

  test("mergeBatch schema drift migrates buckets and keeps them homogeneous") {
    val state = tmp() + "/td"
    CdcStream.mergeBatch(
      batch((1L, "a", "insert", 0L), (2L, "b", "insert", 1L)), state, Seq("id"))
    // DDL adds a column: lazily migrated, schema-merging read
    val b2 = Seq((3L, "c", 7L)).toDF("id", "v", "extra")
      .withColumn(E.Kind, lit("insert")).withColumn(E.Lsn, lit(2L))
      .withColumn(E.Counter, lit(0))
    CdcStream.mergeBatch(b2, state, Seq("id"))
    val out = CdcStream.readState(spark, state)
      .select("id", "v", "extra").as[(Long, String, Option[Long])]
      .collect().toSeq.sortBy(_._1)
    assert(out == Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(7L))))
  }

  test("DDL drift mid-stream migrates lazily: only touched buckets " +
    "rewritten, untouched bucket files byte-identical") {
    val state = tmp() + "/tl"
    // 1000-key snapshot spread over all buckets
    CdcStream.mergeBatch(
      spark.range(0, 1000)
        .select(col("id"), concat(lit("v"), col("id")).as("v")),
      state, Seq("id"))
    def listing(): Map[String, Set[(String, Long, Long)]] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(state))
        .iterator().asScala
        .filter(_.getFileName.toString.startsWith(CdcStream.BucketCol))
        .map { b =>
          b.getFileName.toString ->
            java.nio.file.Files.list(b).iterator().asScala.map(f =>
              (f.getFileName.toString, java.nio.file.Files.size(f),
                java.nio.file.Files.getLastModifiedTime(f).toMillis)).toSet
        }.toMap
    }
    val before = listing()
    assert(before.size > 8, "snapshot should populate many buckets")
    // DDL drift: a 1-key batch adds a column — the stop-the-world
    // spelling rewrote every bucket here; lazy migration must rewrite
    // exactly the one bucket the key hashes to
    val drifting = Seq((5L, "v5b", 42L)).toDF("id", "v", "extra")
      .withColumn(E.Kind, lit("update")).withColumn(E.Lsn, lit(1L))
      .withColumn(E.Counter, lit(0))
    CdcStream.mergeBatch(drifting, state, Seq("id"))
    val after = listing()
    val changed = (before.keySet ++ after.keySet).filter(k =>
      before.get(k) != after.get(k))
    assert(changed.size == 1,
      s"drift must rewrite exactly the touched bucket, got $changed")
    // untouched buckets: same files, same sizes, same mtimes
    (before.keySet - changed.head).foreach { k =>
      assert(before(k) == after(k), s"untouched bucket $k was rewritten")
    }
    // merged read surfaces the union schema: null extra outside the
    // migrated bucket, the new value inside it
    val out = CdcStream.readState(spark, state)
    assert(out.count() == 1000)
    assert(out.filter(col("id") === 5)
      .select("v", "extra").as[(String, Option[Long])].head() ==
      (("v5b", Some(42L))))
    assert(out.filter(col("extra").isNotNull).count() == 1)
    // a later batch touching a lagging bucket converges it: key 5's
    // neighbor bucket gets rewritten with the union schema on contact
    CdcStream.mergeBatch(
      batch((700L, "v700b", "update", 2L)), state, Seq("id"))
    val out2 = CdcStream.readState(spark, state)
    assert(out2.filter(col("id") === 700)
      .select("v").as[String].head() == "v700b")
    assert(out2.columns.contains("extra"))
  }

  test("replicate runs a memory-source stream through checkpointed merge") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Long)]
    val stream = mem.toDF().toDF("id", "v", E.Kind, E.Lsn)
      .withColumn(E.Counter, lit(0))
    val state = tmp() + "/t3"
    val ckpt = tmp() + "/ckpt"
    val q = CdcStream.replicate(stream, state, ckpt, Seq("id"),
      CdcStream.Bufferer(availableNow = false, interval = None)).start()
    try {
      mem.addData((1L, "a", "insert", 0L), (2L, "b", "insert", 1L))
      q.processAllAvailable()
      mem.addData((1L, "a9", "update", 2L))
      q.processAllAvailable()
      val out = spark.read.parquet(state).select("id", "v")
        .as[(Long, String)].collect().toSeq.sortBy(_._1)
      assert(out == Seq((1L, "a9"), (2L, "b")))
    } finally q.stop()
  }

  test("bufferer maps to streaming triggers") {
    assert(CdcStream.Bufferer(availableNow = true).trigger ==
      Trigger.AvailableNow())
    assert(CdcStream.Bufferer(interval = Some("5 seconds")).trigger ==
      Trigger.ProcessingTime("5 seconds"))
  }

  test("watermark dedup drops replayed keys inside the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = CdcStream.watermarkDedup(
      mem.toDF().toDF("id", "ts"), "ts", "10 minutes", Seq("id"))
    val q = deduped.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      mem.addData((1L, t0), (1L, t0), (2L, t0))  // 1 replayed
      q.processAllAvailable()
      val n = spark.table("wm_out").count()
      assert(n == 2)
    } finally q.stop()
  }

  test("sample stream has the generator schema") {
    val df = CdcStream.sampleStream(spark, 10)
    assert(df.isStreaming)
    assert(df.columns.toSeq == Seq("event_id", "device_id", "ts", "value"))
  }

  test("event-time tumbling window aggregation with watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(sum("v").as("total"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("update").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData((t("2024-01-01 00:01:00"), 1L), (t("2024-01-01 00:02:00"), 2L),
        (t("2024-01-01 00:11:00"), 10L))
      q.processAllAvailable()
      val out = spark.table("win_out")
        .select(col("window.start").cast("string"), col("total"))
        .as[(String, Long)].collect().toMap
      assert(out("2024-01-01 00:00:00") == 3L)
      assert(out("2024-01-01 00:10:00") == 10L)
    } finally q.stop()
  }

  test("file queue reader exposes queue metadata with stable offsets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fq").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "p0.txt"), "a\nb\nc")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "p1.txt"), "x\ny")
    val q = graft.sources.Readers.fileQueue(spark, dir, "t0")
    val rows = q.select("topic", "partition", "offset", "value")
      .as[(String, Int, Long, String)].collect().toSeq
    assert(rows.forall(_._1 == "t0"))
    assert(rows.map(_._2).distinct.size == 2)        // one partition per file
    val byPart = rows.groupBy(_._2).values
    byPart.foreach { p =>                            // contiguous offsets from 0
      assert(p.map(_._3).sorted == (0L until p.size))
    }
    assert(rows.map(_._4).sorted == Seq("a", "b", "c", "x", "y"))
  }

  test("session windows group events separated by gaps") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val agg = mem.toDF().toDF("user", "ts")
      .withWatermark("ts", "1 hour")
      .groupBy(col("user"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData(("u1", t("2024-01-01 00:00:00")), ("u1", t("2024-01-01 00:02:00")),
        ("u1", t("2024-01-01 00:30:00")))  // >5 min gap: second session
      q.processAllAvailable()
      val sessions = spark.table("sess_out").filter(col("user") === "u1")
        .select("n").as[Long].collect().toSeq.sorted
      assert(sessions == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join: inclusive bounds, per-key, state-expiring plan") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val memL = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memR = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = CdcStream.intervalJoin(
      memL.toDF().toDF("user_id", "view_id", "view_ts"),
      memR.toDF().toDF("user_id", "click_id", "click_ts"),
      Seq("user_id"), "view_ts", "click_ts", "10 minutes", "30 minutes")
      .select("user_id", "view_id", "click_id")
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      memL.addData((1L, 100L, t("2024-01-01 10:00:00")),
        (2L, 200L, t("2024-01-01 10:00:00")))
      memR.addData(
        (1L, 7L, t("2024-01-01 10:00:00")),  // same instant: inclusive
        (1L, 8L, t("2024-01-01 10:30:00")),  // exactly +30min: inclusive
        (1L, 9L, t("2024-01-01 10:30:01")),  // past the lag: dropped
        (1L, 10L, t("2024-01-01 09:59:59")), // before the view: dropped
        (2L, 11L, t("2024-01-01 10:05:00")), // other user's view only
        (3L, 12L, t("2024-01-01 10:05:00"))) // keyless: dropped
      q.processAllAvailable()
      val out = spark.table("ij_out")
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(out == Seq((1L, 100L, 7L), (1L, 100L, 8L), (2L, 200L, 11L)))
      // both sides carry event-time watermarks in the plan — the
      // condition Spark needs to expire buffered join state
      val analyzed = joined.queryExecution.analyzed.toString
      assert("(?i)eventtimewatermark".r.findAllIn(analyzed).size == 2)
    } finally q.stop()
  }

  test("bufferer count/size limits map to per-source rate options") {
    val b = CdcStream.Bufferer(maxRecordsPerBatch = Some(1000),
      maxBytesPerBatch = Some(1 << 20))
    assert(b.sourceOptions("kafka") == Map("maxOffsetsPerTrigger" -> "1000"))
    assert(b.sourceOptions("file") ==
      Map("maxBytesPerTrigger" -> "1048576", "maxFilesPerTrigger" -> "1000"))
    assert(b.sourceOptions("rate").isEmpty)
  }
}
