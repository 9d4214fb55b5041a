package graft.streaming

import graft.model.{CdcEnvelope => E}
import graft.operators.Collapse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming replication: the Spark Structured Streaming re-expression of
  * the reference's replication loop (reference:
  * runtime/local/replication.go:210-234 `Source.Run(AsyncSink)` with
  * retry/backoff; pkg/middlewares/synchronizer/bufferer/bufferer.go:16-32
  * flush triggers; retrier + PK-upsert idempotence sink.go:14-20).
  *
  * Mapping: source offsets/acks -> checkpointed offsets; bufferer
  * count/size/interval -> micro-batch triggers; at-least-once + PK upsert
  * -> exactly-once via checkpoint + idempotent per-batch MERGE.
  */
object CdcStream {

  /** Bufferer flush-trigger config (reference: bufferer.go:16-32
    * TriggingCount/TriggingSize/TriggingInterval). Count/size triggers
    * map to source rate limits (`maxOffsetsPerTrigger` etc.) which are
    * source options; the interval maps to the processing trigger. */
  final case class Bufferer(interval: Option[String] = Some("10 seconds"),
                            availableNow: Boolean = false,
                            maxRecordsPerBatch: Option[Long] = None,
                            maxBytesPerBatch: Option[Long] = None) {
    def trigger: Trigger =
      if (availableNow) Trigger.AvailableNow()
      else interval.map(Trigger.ProcessingTime(_)).getOrElse(
        Trigger.ProcessingTime(0L))

    /** Count/size flush limits become source rate options (the trigger
      * point is source-specific: Kafka uses maxOffsetsPerTrigger, file
      * sources maxFilesPerTrigger/maxBytesPerTrigger). */
    def sourceOptions(sourceKind: String): Map[String, String] =
      sourceKind match {
        case "kafka" =>
          maxRecordsPerBatch.map("maxOffsetsPerTrigger" -> _.toString).toMap
        case "file" =>
          maxBytesPerBatch.map("maxBytesPerTrigger" -> _.toString).toMap ++
            maxRecordsPerBatch.map("maxFilesPerTrigger" -> _.toString).toMap
        case _ => Map.empty
      }
  }

  /** PK-hash bucket column of the incremental state layout. */
  val BucketCol = "__bucket"
  /** Default bucket count for new state dirs. At warehouse scale this is
    * the unit of rewrite I/O — size it so one bucket fits a rewrite job
    * (e.g. 1024 buckets over 100 TB = ~100 GB per bucket). */
  val DefaultBuckets = 32

  /** Sentinel for a NULL PK component in the rendered key tuple:
    * concat_ws silently DROPS nulls, which would land null-keyed rows in
    * a different bucket than [[lookup]] probes and let composite keys
    * with nulls collide with distinct keys. The NUL prefix cannot appear
    * in a cast-to-string value. */
  private[streaming] val NullKey = "\u0000null"

  /** Stable bucket of a row: md5-derived hash of the rendered PK tuple
    * (engine-stable, skew-free — see [[graft.functions.Hashing]]). NULL
    * components render as [[NullKey]] — identically here and in the
    * driver-side [[lookup]] rendering, so null-keyed rows bucket where
    * lookup probes. */
  def bucketOf(pks: Seq[String], n: Int): org.apache.spark.sql.Column =
    pmod(graft.functions.Hashing.hex8ToLong(
      concat_ws("\u0001",
        pks.map(c => coalesce(col(c).cast("string"), lit(NullKey))): _*)),
      lit(n.toLong)).cast("int")

  /** State-dir metadata pinning the bucket count and column set so every
    * batch agrees on the layout and bucket schemas stay homogeneous.
    * `schema` (r18) is the TYPED union across drifts: with it, state
    * reads pass an explicit schema instead of mergeSchema, skipping the
    * per-batch footer-inference job over every affected bucket — at
    * lake scale a mergeSchema read sweeps EVERY file footer of the
    * affected buckets before the real read even starts, and at
    * streaming cadence that job recurs per micro-batch. Lagging buckets
    * (lazy DDL migration) read identically either way: the parquet
    * reader surfaces null for schema columns a file predates — the
    * exact semantics mergeSchema produced. Absent on metas written
    * before r18 (readers fall back to mergeSchema). */
  private final case class StateMeta(numBuckets: Int, columns: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None)

  private def fsOf(spark: SparkSession): org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def metaPath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_graft_meta.json")

  private def readMeta(fs: org.apache.hadoop.fs.FileSystem,
                       dir: String): Option[StateMeta] = {
    val p = metaPath(dir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val nb = """"numBuckets"\s*:\s*(\d+)""".r.findFirstMatchIn(raw)
        .map(_.group(1).toInt)
      val cols = """"columns"\s*:\s*\[(.*?)\]""".r.findFirstMatchIn(raw)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"")
          .stripSuffix("\"")).filter(_.nonEmpty).toSeq)
      // typed schema, base64 of StructType.json — base64 keeps the
      // regex-parsed meta file free of nested quotes/braces. Any parse
      // failure degrades to None (mergeSchema fallback), never an error.
      val schema = """"schemaB64"\s*:\s*"([A-Za-z0-9+/=]*)"""".r
        .findFirstMatchIn(raw).map(_.group(1)).flatMap { b64 =>
          scala.util.Try {
            org.apache.spark.sql.types.DataType.fromJson(new String(
              java.util.Base64.getDecoder.decode(b64), "UTF-8"))
              .asInstanceOf[org.apache.spark.sql.types.StructType]
          }.toOption
        }
      nb.map(StateMeta(_, cols.getOrElse(Nil), schema))
    }
  }

  private def writeMeta(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                        meta: StateMeta): Unit = {
    val out = fs.create(metaPath(dir), true)
    val schemaField = meta.schema.map { s =>
      s""","schemaB64":"${java.util.Base64.getEncoder
        .encodeToString(s.json.getBytes("UTF-8"))}""""
    }.getOrElse("")
    val json = s"""{"numBuckets":${meta.numBuckets},"columns":[""" +
      meta.columns.map("\"" + _ + "\"").mkString(",") + s"]$schemaField}"
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Read the merged state back without the layout's bucket column.
    * Schema-merging: under lazy DDL migration bucket dirs may sit at
    * different drift generations; the union schema surfaces null for
    * columns a lagging bucket predates. */
  def readState(spark: SparkSession, stateDir: String): DataFrame = {
    // typed meta schema (r18): skip the footer-inference/mergeSchema
    // job — the union schema is already known; lagging buckets surface
    // null for columns they predate either way (see [[StateMeta]])
    val schema = readMeta(fsOf(spark), stateDir).flatMap(_.schema)
    val df = schema match {
      case Some(s) => spark.read.schema(s).parquet(stateDir)
      case None => spark.read.option("mergeSchema", "true").parquet(stateDir)
    }
    if (df.columns.contains(BucketCol)) df.drop(BucketCol) else df
  }

  /** Point lookup: compute the key's bucket on the DRIVER (same md5
    * hash as [[bucketOf]]) and scan ONLY that bucket dir — I/O is
    * state/numBuckets, and the PK-sorted files prune further via
    * parquet min/max stats. Key values must render like Spark's
    * string cast (integral/string keys do). Under lazy DDL migration
    * the result carries the BUCKET's schema generation (a bucket dir
    * is always internally homogeneous — rewrites replace it whole);
    * a lagging bucket simply lacks columns it predates, the same
    * contract as a pre-drift read of the whole state. */
  def lookup(spark: SparkSession, stateDir: String, pks: Seq[String],
             key: Seq[Any]): DataFrame = {
    require(pks.length == key.length, "one value per key column")
    val fs = fsOf(spark)
    val n = readMeta(fs, stateDir).map(_.numBuckets).getOrElse(
      throw new IllegalArgumentException(s"$stateDir is not a bucketed state"))
    val rendered = key
      .map(v => if (v == null) NullKey else String.valueOf(v))
      .mkString("\u0001")
    val b = math.floorMod(graft.functions.Hashing.hex8ToLongJvm(rendered), n.toLong)
    val bucketDir = new org.apache.hadoop.fs.Path(stateDir, s"$BucketCol=$b")
    // an absent bucket dir means no rows hash there: an empty result in
    // the state schema, not an error
    val df =
      if (fs.exists(bucketDir)) spark.read.parquet(bucketDir.toString)
      else readState(spark, stateDir).limit(0)
    // null-safe equality: a null key value must MATCH null cells, not
    // filter everything (=== with null is null)
    pks.zip(key).foldLeft(df) { case (d, (k, v)) => d.filter(col(k) <=> lit(v)) }
  }

  /** Upsert-MERGE a collapsed micro-batch into a PK-hash-bucketed parquet
    * state dir. Idempotent: replaying a batch converges to the same state
    * (PK last-write-wins by (__lsn, __counter)), which is what makes
    * checkpoint-replay exactly-once.
    *
    * Incremental by construction: the state is laid out as
    * `stateDir/__bucket=i/` dirs keyed by a stable PK hash, and a batch
    * rewrites ONLY the buckets containing its keys — rewrite I/O scales
    * with the batch's key spread, not total state size (the flat-layout
    * predecessor rewrote the whole state every batch). Per-batch plan:
    * one read over the affected buckets + one partitioned write; the swap
    * is per-bucket rename, and replaying after a mid-swap crash converges
    * because the merge itself is idempotent. At warehouse scale the same
    * batch function lands on a Delta/Iceberg MERGE INTO — the collapse
    * step, key discipline and bucket-pruned rewrite are identical
    * (reference semantics: pkg/sink_factory/sink_factory.go:100-133
    * middleware ordering, Collapse before write change_item_collapse.go:48).
    *
    * Schema drift (DDL adding columns, change_item.go DDL kinds) migrates
    * LAZILY, per bucket: a drifting batch rewrites only the buckets its
    * keys touch (each bucket dir is homogeneous — it is replaced whole on
    * every rewrite), untouched buckets keep their pre-drift files
    * byte-identical, and converge to the new schema when a later batch
    * CARRYING the drifted columns touches them — directly, or via the
    * schema-union affected-bucket read. Untouched buckets may lag the
    * meta's union indefinitely, by design: reads stay correct (the
    * union schema null-backfills columns a file predates) without the
    * stop-the-world rewrite that at 100 TB of state would be an
    * unbounded pause inside one micro-batch. Since r18 the meta
    * carries the TYPED union schema, so (a) state reads pass it
    * explicitly instead of paying a mergeSchema footer sweep per
    * batch, and (b) any rewrite a batch does perform projects the
    * touched buckets to the union (null-filled drifted columns) —
    * observable results are identical either way, convergence is just
    * faster. Metas written before r18 lack the typed schema and fall
    * back to mergeSchema reads. The meta's column set records the
    * logical union across drifts. A legacy flat-layout dir is still
    * migrated whole on first contact (its layout, not just its
    * schema, changes). */
  def mergeBatch(batch0: DataFrame, stateDir: String, pks: Seq[String],
                 numBuckets: Int = DefaultBuckets): Unit = {
    // plain (non-enveloped) frames merge as snapshot inserts
    val batch =
      if (batch0.columns.contains(E.Kind)) batch0
      else E.fromSnapshot(batch0, lit(0L))
    val spark = batch.sparkSession
    val fs = fsOf(spark)
    val root = new org.apache.hadoop.fs.Path(stateDir)
    // crash recovery: a leftover .bak dir means a previous swap died
    // mid-flight (the batch never committed to the checkpoint, so it
    // WILL be replayed) — restore the pre-batch buckets first, making
    // the swap-then-replay sequence exact, not just per-bucket-atomic
    val bak = new org.apache.hadoop.fs.Path(stateDir + ".bak")
    if (fs.exists(bak)) {
      val entries = fs.listStatus(bak)
      // interrupted LEGACY migration: .bak holds the flat-layout part-*
      // snapshot — it is the authoritative pre-batch state, so any
      // half-swapped bucket dirs in the root are replay debris and must
      // go before the flat files come back (otherwise the re-detected
      // legacy read would see old rows twice)
      if (entries.exists(_.getPath.getName.startsWith("part-")) &&
          fs.exists(root))
        fs.listStatus(root).filter(_.getPath.getName.startsWith(BucketCol))
          .foreach(st => fs.delete(st.getPath, true))
      entries.filter(st => st.getPath.getName.startsWith(BucketCol) ||
          st.getPath.getName.startsWith("part-"))
        .foreach { st =>
          val dst = new org.apache.hadoop.fs.Path(stateDir, st.getPath.getName)
          if (fs.exists(dst)) fs.delete(dst, true)
          fs.rename(st.getPath, dst)
        }
      fs.delete(bak, true)
    }
    val meta = readMeta(fs, stateDir)
    val n = meta.map(_.numBuckets).getOrElse(numBuckets)

    val collapsed = Collapse.lastWriteWins(
      batch.filter(E.isRowEvent(col(E.Kind))), pks).persist()
    val dataCols = E.dataCols(collapsed)

    // legacy flat layout: state exists but predates the bucketed meta —
    // the only full migration left (the LAYOUT changes, not just the
    // schema; DDL drift migrates lazily per touched bucket instead)
    val legacy = meta.isEmpty && fs.exists(root) &&
      fs.listStatus(root).exists(s => s.isFile &&
        s.getPath.getName.startsWith("part-"))

    val affected: Seq[Int] =
      if (legacy) 0 until n
      else collapsed.select(bucketOf(pks, n).as(BucketCol))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted

    val existing: Option[DataFrame] =
      if (legacy) Some(spark.read.parquet(stateDir))
      else {
        val paths = affected
          .map(i => new org.apache.hadoop.fs.Path(stateDir, s"$BucketCol=$i"))
          .filter(fs.exists(_)).map(_.toString)
        if (paths.isEmpty) None
        // affected buckets may sit at different drift generations
        // (lazy migration) — the read must union their schemas, not
        // inherit whichever file the reader samples first. With a
        // typed meta schema (r18) that union is KNOWN: pass it
        // explicitly and skip the per-batch mergeSchema footer sweep
        // (the parquet reader nulls out columns a lagging file
        // predates — identical semantics, one fewer job per batch).
        else {
          val rd = spark.read.option("basePath", stateDir)
          val rd2 = meta.flatMap(_.schema) match {
            case Some(s) => rd.schema(s)
            case None => rd.option("mergeSchema", "true")
          }
          Some(rd2.parquet(paths: _*).drop(BucketCol))
        }
      }

    val merged = existing match {
      case None => collapsed
      case Some(cur) =>
        // current state re-enters as older-than-everything inserts.
        // unionByName with allowMissingColumns absorbs mid-stream schema
        // drift (DDL adding/dropping columns): new columns backfill null
        // in old state, dropped columns null out in new events —
        // Delta-style mergeSchema semantics (SURVEY §1.4 DDL mapping).
        val asEvents = cur.withColumn(E.Kind, lit(E.Insert))
          .withColumn(E.Lsn, lit(Long.MinValue))
          .withColumn(E.Counter, lit(0))
        val projected = collapsed.select(
          (dataCols.map(col) :+ col(E.Kind) :+ col(E.Lsn) :+ col(E.Counter)): _*)
        Collapse.lastWriteWins(
          asEvents.unionByName(projected, allowMissingColumns = true), pks)
    }
    // union of old-state and new-batch data columns (schema drift)
    val outCols = E.dataCols(merged)
    val out = merged.filter(col(E.Kind) =!= E.Delete)
      .select(outCols.map(col): _*)
      .withColumn(BucketCol, bucketOf(pks, n))

    // write-then-swap: rewritten buckets land in a temp dir, then each
    // affected bucket dir is swapped by rename — untouched buckets are
    // never read or written
    val tmp = new org.apache.hadoop.fs.Path(stateDir + ".tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // repartition on the bucket BEFORE partitionBy: otherwise every
    // shuffle task writes a file into every bucket dir (tasks x buckets
    // files per batch — a small-file explosion at cluster scale)
    out.repartition(math.min(n, out.sparkSession.sessionState.conf.numShufflePartitions),
        col(BucketCol))
      // PK-sorted files: parquet min/max stats become selective, so a
      // point lookup inside a bucket prunes to one row group
      .sortWithinPartitions((col(BucketCol) +: pks.map(col)): _*)
      .write.partitionBy(BucketCol).parquet(tmp.toString)
    if (!fs.exists(root)) fs.mkdirs(root)
    // two-phase swap: move every affected live bucket aside into .bak,
    // then move the rewritten buckets in, then drop .bak. A crash at any
    // point leaves either a recoverable .bak (see recovery above) or the
    // completed new state — never a half-lost bucket.
    fs.mkdirs(bak)
    if (legacy)
      // legacy flat layout: STAGE the part-* snapshot into .bak rather
      // than deleting the root — a crash anywhere in the swap window
      // leaves the pre-batch snapshot recoverable (the recovery path
      // above restores flat files and discards half-swapped buckets)
      fs.listStatus(root).filter(_.isFile).foreach { st =>
        fs.rename(st.getPath,
          new org.apache.hadoop.fs.Path(bak, st.getPath.getName))
      }
    affected.foreach { i =>
      val dst = new org.apache.hadoop.fs.Path(stateDir, s"$BucketCol=$i")
      if (fs.exists(dst)) {
        fs.rename(dst, new org.apache.hadoop.fs.Path(bak, s"$BucketCol=$i"))
        ()
      }
    }
    affected.foreach { i =>
      val src = new org.apache.hadoop.fs.Path(tmp, s"$BucketCol=$i")
      val dst = new org.apache.hadoop.fs.Path(stateDir, s"$BucketCol=$i")
      if (fs.exists(src)) { fs.rename(src, dst); () }
    }
    fs.delete(bak, true)
    fs.delete(tmp, true)
    // the meta column set is the LOGICAL union across drifts: untouched
    // buckets may lag it on disk until a batch touches them
    val logicalCols =
      meta.map(_.columns).getOrElse(Nil) ++
        outCols.filterNot(meta.map(_.columns).getOrElse(Nil).contains)
    // typed union schema (r18): this write's data schema wins for the
    // columns it carries (it already absorbed every affected bucket's
    // drift via the schema-union read above); columns only PREVIOUS
    // metas knew — dropped by DDL but still present in lagging buckets
    // — are retained so reads keep surfacing them as null
    val outSchema = org.apache.spark.sql.types.StructType(
      out.schema.filter(_.name != BucketCol).map(_.copy(nullable = true)))
    val unionSchema = meta.flatMap(_.schema) match {
      case Some(prev) =>
        val names = outSchema.fieldNames.toSet
        org.apache.spark.sql.types.StructType(
          outSchema.fields ++ prev.fields.filterNot(f => names(f.name)))
      case None => outSchema
    }
    writeMeta(fs, stateDir, StateMeta(n, logicalCols, Some(unionSchema)))
    collapsed.unpersist()
    ()
  }

  /** Multi-table batch routing: split an enveloped batch on its
    * `__table` column and MERGE each group into its own state directory
    * (reference: SplitByTableID + per-table sink pipelines,
    * load_snapshot.go builds one sink per table part; table_splitter/
    * rename_tables feed this column). Table names may contain '/'
    * (table_splitter routes) — sanitized into the directory name.
    * The distinct-table list is tiny (tables, not rows); each per-table
    * merge is a full distributed job. */
  def mergeMultiTable(batch0: DataFrame, baseDir: String,
                      pks: Seq[String]): Seq[String] = {
    require(batch0.columns.contains(E.Table), s"missing ${E.Table}")
    // one materialization feeds the table listing AND every per-table
    // merge — without it the batch lineage (often a multi-source
    // union) recomputes once per table plus once for the listing
    val batch = batch0.persist()
    try {
      val tables = batch.select(E.Table).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      tables.foreach { t =>
        val safe = t.replaceAll("[^A-Za-z0-9_.-]", "_")
        mergeBatch(batch.filter(col(E.Table) === t).drop(E.Table),
          s"$baseDir/$safe", pks)
      }
      tables
    } finally { batch.unpersist() }
  }

  /** The replication loop: stream -> transform -> checkpointed
    * foreachBatch MERGE (reference: §3.2 RunReplication). Restart policy
    * is the streaming query restart; offsets live in the checkpoint. */
  def replicate(stream: DataFrame, stateDir: String, checkpointDir: String,
                pks: Seq[String],
                bufferer: Bufferer = Bufferer()): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(bufferer.trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, stateDir, pks)
      }

  /** Per-key LSN monotonicity guard: drops events at or below the
    * highest LSN already seen for their key — the "idempotent MERGE
    * keyed on PK + lsn monotonicity" discipline for exactly-once
    * delivery to non-transactional sinks (SURVEY §7.4; reference:
    * at-least-once source + PK-upsert sink, retrier.go + sink.go).
    *
    * Built on flatMapGroupsWithState: the state is ONE long per key
    * (bounded, partitioned by the shuffle), late replays and duplicate
    * redeliveries are filtered before they reach the sink. The key is a
    * single string-rendered column (compose upstream for composite
    * keys).
    *
    * At billions of PKs even one long per key is tens of GB of state,
    * which the default HDFS-backed store keeps in executor heap —
    * cluster deployments should switch the store to RocksDB (off-heap,
    * spill-to-disk): [[graft.GraftSession.scaleStreamingState]].
    * `idleTimeout` bounds state
    * LIFETIME too: a key idle longer than the duration (set it past the
    * source's replay horizon, e.g. the queue retention) has its state
    * dropped, so the guard's footprint tracks the active key set
    * instead of every key ever seen. A replay older than the horizon
    * arriving after the drop is no longer filtered — by contract such
    * replays cannot occur (the source has already compacted them
    * away). See docs/state-layout.md. */
  def monotonicGuard(stream: DataFrame, keyCol: String,
                     idleTimeout: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoders, Row}
    val spark = stream.sparkSession
    val schema = stream.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val lsnIdx = schema.fieldIndex(E.Lsn)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    implicit val strEnc = Encoders.STRING
    implicit val longEnc = Encoders.scalaLong
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    stream.as[Row](rowEnc)
      .groupByKey((r: Row) => String.valueOf(r.get(keyIdx)))(strEnc)
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[Row], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var maxSeen = state.getOption.getOrElse(Long.MinValue)
            val out = rows.filter { r =>
              val lsn = r.getLong(lsnIdx)
              if (lsn > maxSeen) { maxSeen = lsn; true } else false
            }.toVector
            state.update(maxSeen)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }(longEnc, rowEnc)
  }

  /** Watermarked duplicate suppression for replayed queue events
    * (reference: late/duplicate replays collapsed by PK at the sink —
    * SURVEY §2.7): event-time watermark + per-key dedup inside the
    * watermark window. */
  def watermarkDedup(df: DataFrame, eventTimeCol: String, delay: String,
                     keys: Seq[String]): DataFrame =
    df.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream interval join (event correlation): a right-side
    * event matches a left-side event with the same keys when it arrives
    * within `[leftTime, leftTime + maxLag]`. Both sides are
    * watermarked, and the time-range predicate is what lets Spark
    * EXPIRE join state: a buffered left row stops waiting once the
    * right watermark passes `leftTime + maxLag`, so state is bounded by
    * event rate × (delay + maxLag) — never by stream length. That
    * bound is the scale condition for an unbounded correlation join
    * (SURVEY §2.7; the reference correlates queue events downstream of
    * the transfer — Structured Streaming makes it an engine operator).
    * Key columns must share names across sides; the duplicate right
    * copies are dropped from the output. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   delay: String, maxLag: String): DataFrame = {
    val l = left.withWatermark(leftTime, delay)
    val r = right.withWatermark(rightTime, delay)
    val keyCond = keys.map(k => l(k) === r(k)).reduceLeft(_ && _)
    val timeCond = r(rightTime) >= l(leftTime) &&
      r(rightTime) <= l(leftTime) + expr(s"INTERVAL $maxLag")
    keys.foldLeft(l.join(r, keyCond && timeCond))((d, k) => d.drop(r(k)))
  }

  /** Deterministic rate-limited sample stream (reference: the `sample`
    * provider used for replication tests): rate source mapped to the
    * same IoT shape as [[graft.sources.SampleSource]]. */
  def sampleStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(
        col("value").as("event_id"),
        pmod(col("value") * 2654435761L, lit(100)).as("device_id"),
        col("timestamp").as("ts"),
        (pmod(col("value") * 1103515245L + 12345L, lit(100000L))
          .cast("double") / 100.0).as("value"))
}
