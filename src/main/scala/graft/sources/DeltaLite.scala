package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal Delta Lake table reader (reference: the `delta` source
  * provider, pkg/providers/delta — reads Delta tables without the
  * warehouse runtime; the table protocol is public:
  * https://github.com/delta-io/delta/blob/master/PROTOCOL.md).
  *
  * Reads `_delta_log/` JSON commits (and the latest parquet checkpoint
  * if present), replays add/remove actions to the current active file
  * set, and scans those parquet files. Enough for append/overwrite
  * tables — the common lake layout; column mapping/DVs are out of scope
  * and rejected loudly rather than misread.
  */
object DeltaLite {

  private case class LogState(adds: Map[String, Unit])

  def read(spark: SparkSession, tablePath: String): DataFrame = {
    val files = activeFiles(spark, tablePath)
    require(files.nonEmpty, s"Delta table at $tablePath has no active files")
    // mergeSchema: commits may carry evolved schemas (added columns)
    spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => s"$tablePath/$f"): _*)
  }

  /** Time travel: the table exactly as of commit `version` (the public
    * protocol's `versionAsOf`). Same log replay as [[read]], truncated
    * at `version` — data files are immutable and removes are logical
    * log entries, so every historical state stays reconstructible until
    * a vacuum physically deletes files. */
  def readAt(spark: SparkSession, tablePath: String, version: Long): DataFrame = {
    val files = activeFilesAt(spark, tablePath, Some(version))
    if (files.nonEmpty)
      spark.read.option("mergeSchema", "true")
        .parquet(files.map(f => s"$tablePath/$f"): _*)
    else {
      // legitimately-empty historical version (e.g. an empty
      // overwrite). Schema comes from whatever data files exist
      // anywhere in the table history — an empty version recorded no
      // schema of its own in this minimal log; if the table never had
      // a file, there is no schema to give
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(tablePath), spark.sparkContext.hadoopConfiguration)
      val anyData = fs.listStatus(new org.apache.hadoop.fs.Path(tablePath))
        .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      if (anyData.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(anyData.head.toString).limit(0)
    }
  }

  /** Active data files after replaying the log. Starts from the latest
    * parquet checkpoint when `_last_checkpoint` points at one (the
    * public protocol's log-compaction mechanism), then replays only the
    * JSON commits AFTER it — without this, a 10k-commit table costs a
    * driver-side O(n) JSON replay on every read. */
  def activeFiles(spark: SparkSession, tablePath: String): Seq[String] =
    activeFilesAt(spark, tablePath, None)

  /** As [[activeFiles]], optionally truncating the replay at `asOf`:
    * the checkpoint shortcut applies only when the checkpoint is not
    * newer than `asOf` (a newer one already folds commits that must be
    * excluded), and the requested version must actually be committed. */
  def activeFilesAt(spark: SparkSession, tablePath: String,
                    asOf: Option[Long]): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tablePath), spark.sparkContext.hadoopConfiguration)
    val logDir = new org.apache.hadoop.fs.Path(s"$tablePath/_delta_log")
    require(fs.exists(logDir), s"not a Delta table: no _delta_log at $tablePath")

    val ckptVersion: Option[Long] = {
      val p = new org.apache.hadoop.fs.Path(logDir, "_last_checkpoint")
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(raw)
          .map(_.group(1).toLong)
          .filter(v => asOf.forall(v <= _))
      }
    }
    asOf.foreach { v =>
      val committed = ckptVersion.contains(v) || fs.exists(
        new org.apache.hadoop.fs.Path(logDir, f"$v%020d.json"))
      require(committed, s"version $v was never committed at $tablePath")
    }
    val adds = scala.collection.mutable.LinkedHashMap[String, Unit]()
    ckptVersion.foreach { v =>
      val ckpt = new org.apache.hadoop.fs.Path(logDir, f"$v%020d.checkpoint.parquet")
      require(fs.exists(ckpt), s"_last_checkpoint points at missing $ckpt")
      spark.read.parquet(ckpt.toString)
        .where(org.apache.spark.sql.functions.col("add").isNotNull)
        .select("add.path").collect()
        .foreach(r => adds(r.getString(0)) = ())
    }

    val entries = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .filter(n => ckptVersion.forall(n.stripSuffix(".json").toLong > _))
      .filter(n => asOf.forall(n.stripSuffix(".json").toLong <= _))
      .sorted
    entries.foreach { name =>
      val p = new org.apache.hadoop.fs.Path(logDir, name)
      val in = fs.open(p)
      val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      content.linesIterator.filter(_.nonEmpty).foreach { line =>
        parseAction(line) match {
          case Some(Right(path)) => adds(path) = ()
          case Some(Left(path)) => adds.remove(path)
          case None => () // metaData / protocol / commitInfo
        }
      }
    }
    adds.keys.toSeq
  }

  /** Physical cleanup (the protocol's VACUUM): delete data files not
    * referenced by the active set of any of the newest
    * `retainVersions` commits. Removes are LOGICAL until this runs —
    * that is what makes time travel free — so storage only shrinks
    * here. After a vacuum, [[readAt]] older than the retention horizon
    * fails on missing files, exactly like real Delta.
    *
    * Concurrent-writer safety: a writer stages files under `.stage-*`
    * before committing — those are never touched here. `minAgeMs`
    * additionally protects data files moved into place but whose
    * commit json is not yet written (the rename-then-commit window):
    * real Delta's retention-hours check exists for exactly this race.
    * The default 0 is for single-writer tables; set it above your
    * longest write duration when writers run concurrently.
    * Returns the deleted file count. */
  def vacuum(spark: SparkSession, tablePath: String,
             retainVersions: Int = 1, minAgeMs: Long = 0L): Int = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tablePath), spark.sparkContext.hadoopConfiguration)
    val logDir = new org.apache.hadoop.fs.Path(s"$tablePath/_delta_log")
    val versions = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json").toLong).sorted
    require(versions.nonEmpty, s"no commits at $tablePath")
    val retained = versions.takeRight(retainVersions)
    val referenced: Set[String] = retained.flatMap(v =>
      activeFilesAt(spark, tablePath, Some(v))).toSet

    val root = new org.apache.hadoop.fs.Path(tablePath)
    val it = fs.listFiles(root, true)
    var deleted = 0
    val rootUri = root.toUri.getPath.stripSuffix("/")
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(rootUri)
        .stripPrefix("/")
      val isData = rel.endsWith(".parquet") &&
        !rel.startsWith("_delta_log") && !rel.contains(".stage-") &&
        !rel.contains(".ckpt-")
      val oldEnough = minAgeMs <= 0L ||
        st.getModificationTime < System.currentTimeMillis() - minAgeMs
      if (isData && oldEnough && !referenced.contains(rel)) {
        fs.delete(st.getPath, false)
        deleted += 1
      }
    }
    deleted
  }

  /** Minimal Delta-protocol WRITER (the emit direction of the same
    * public protocol): stages parquet data files into the table dir
    * under version-tagged names, then commits one
    * `_delta_log/<version>.json` — protocol+metaData on the first
    * commit, `remove` actions for the previous active set on overwrite,
    * one `add` per data file. The commit file is created with
    * create-exclusive semantics, so two racing writers cannot both claim
    * a version (optimistic concurrency per the protocol). Readable by
    * [[read]] and by any Delta reader of reader-version 1.
    * Returns the committed version. */
  def write(df: DataFrame, tablePath: String,
            overwrite: Boolean = false,
            checkpointInterval: Int = 10): Long = {
    val spark = df.sparkSession
    val fs = tableFs(spark, tablePath)
    val version = nextVersion(fs, tablePath)
    val removed: Seq[String] =
      if (overwrite && version > 0) activeFiles(spark, tablePath) else Nil
    val moved = stageIn(df, fs, tablePath, version)
    writeCommit(spark, tablePath, version, df.schema, moved, removed,
      checkpointInterval)
    version
  }

  private def tableFs(spark: SparkSession, tablePath: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tablePath), spark.sparkContext.hadoopConfiguration)

  /** Next version = max(committed json, checkpointed) + 1 — json
    * commits at or below a checkpoint may have been cleaned up. */
  private def nextVersion(fs: org.apache.hadoop.fs.FileSystem,
                          tablePath: String): Long = {
    val logDir = new org.apache.hadoop.fs.Path(s"$tablePath/_delta_log")
    if (!fs.exists(logDir)) 0L
    else {
      val jsons = fs.listStatus(logDir).map(_.getPath.getName)
        .filter(_.endsWith(".json")).map(_.stripSuffix(".json").toLong)
      val ckpts = fs.listStatus(logDir).map(_.getPath.getName)
        .filter(_.endsWith(".checkpoint.parquet"))
        .map(_.stripSuffix(".checkpoint.parquet").toLong)
      (jsons ++ ckpts).maxOption.map(_ + 1).getOrElse(0L)
    }
  }

  /** Stage `df`'s part files, then move them in under version-tagged
    * names (`tag` keeps two stagings of one commit distinct). */
  private def stageIn(df: DataFrame, fs: org.apache.hadoop.fs.FileSystem,
                      tablePath: String, version: Long,
                      tag: String = ""): Seq[(String, Long)] = {
    val staging =
      new org.apache.hadoop.fs.Path(s"$tablePath/.stage-$version$tag")
    df.write.mode("overwrite").parquet(staging.toString)
    val moved = fs.listStatus(staging)
      .filter(_.getPath.getName.startsWith("part-")).toSeq.map { st =>
        val name =
          s"part-$version$tag-${st.getPath.getName.stripPrefix("part-")}"
        fs.rename(st.getPath, new org.apache.hadoop.fs.Path(tablePath, name))
        (name, st.getLen)
      }
    fs.delete(staging, true)
    moved
  }

  /** Emit one commit of add+remove actions at `version`
    * (create-exclusive: racing writers lose), then checkpoint on the
    * configured cadence. */
  private def writeCommit(spark: SparkSession, tablePath: String,
                          version: Long, schema: StructType,
                          adds: Seq[(String, Long)], removes: Seq[String],
                          checkpointInterval: Int): Unit = {
    val fs = tableFs(spark, tablePath)
    val logDir = new org.apache.hadoop.fs.Path(s"$tablePath/_delta_log")
    def js(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    } + "\""
    val now = System.currentTimeMillis()
    val actions = Seq.newBuilder[String]
    if (version == 0L)
      actions += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    // metaData rides on every commit (protocol-legal replacement), so the
    // log stays self-describing across schema evolution
    actions += s"""{"metaData":{"id":${js(java.util.UUID.randomUUID().toString)},""" +
      s""""format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${js(schema.json)},""" +
      s""""partitionColumns":[],"configuration":{},"createdTime":$now}}"""
    removes.foreach { p =>
      actions += s"""{"remove":{"path":${js(p)},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    adds.foreach { case (name, len) =>
      actions += s"""{"add":{"path":${js(name)},"partitionValues":{},""" +
        s""""size":$len,"modificationTime":$now,"dataChange":true}}"""
    }
    if (!fs.exists(logDir)) fs.mkdirs(logDir)
    val commit = new org.apache.hadoop.fs.Path(logDir, f"$version%020d.json")
    // create-exclusive: racing writers lose with FileAlreadyExistsException
    val out = fs.create(commit, false)
    try out.write((actions.result().mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (checkpointInterval > 0 && version > 0 &&
        version % checkpointInterval == 0)
      checkpoint(spark, tablePath, version, schema)
  }

  /** Copy-on-write DELETE (row-level delete under the public protocol,
    * without deletion vectors): only files CONTAINING matching rows are
    * rewritten — on a lake clustered by the predicate column (time,
    * z-order) a retention delete rewrites a sliver of the table, never
    * the whole of it. The touched-file probe is one scan carrying
    * input_file_name; driver state is ≤ one string per file. Returns
    * the committed version, or -1 when no row matched (no commit
    * written — the delete is a no-op, not an empty commit). */
  def deleteWhere(spark: SparkSession, tablePath: String,
                  predicate: org.apache.spark.sql.Column,
                  checkpointInterval: Int = 10): Long = {
    val files = activeFiles(spark, tablePath)
    require(files.nonEmpty, s"Delta table at $tablePath has no active files")
    val full = files.map(f => s"$tablePath/$f")
    val cur = spark.read.option("mergeSchema", "true").parquet(full: _*)
    val touchedUris = cur
      .withColumn("__file", org.apache.spark.sql.functions.input_file_name())
      .filter(predicate).select("__file").distinct()
      .collect().map(_.getString(0)).toSeq
    if (touchedUris.isEmpty) return -1L
    // input_file_name yields a URI; data files live flat in the table
    // dir, so the table-relative name is the last path segment
    val touchedNames =
      touchedUris.map(u => u.substring(u.lastIndexOf('/') + 1))
    val fs = tableFs(spark, tablePath)
    val version = nextVersion(fs, tablePath)
    val keep = spark.read.option("mergeSchema", "true")
      .parquet(touchedUris: _*)
      .filter(org.apache.spark.sql.functions.not(predicate))
    val moved = stageIn(keep, fs, tablePath, version)
    writeCommit(spark, tablePath, version, cur.schema, moved, touchedNames,
      checkpointInterval)
    version
  }

  /** Copy-on-write MERGE (PK upsert): files holding rows whose key
    * matches an update are rewritten without those rows; the update
    * batch itself lands as new files, so unmatched keys become inserts
    * by construction. Untouched files are never rewritten — cost ∝
    * touched files + batch size, not table size. `updates` must be
    * PK-unique (collapse the changelog first,
    * [[graft.operators.Collapse]]). */
  def upsert(spark: SparkSession, tablePath: String, updates: DataFrame,
             pks: Seq[String], checkpointInterval: Int = 10): Long = {
    require(pks.nonEmpty, "upsert requires primary keys")
    val fs = tableFs(spark, tablePath)
    if (nextVersion(fs, tablePath) == 0L)
      return write(updates, tablePath, checkpointInterval = checkpointInterval)
    val files = activeFiles(spark, tablePath)
    val full = files.map(f => s"$tablePath/$f")
    val cur = spark.read.option("mergeSchema", "true").parquet(full: _*)
    val keyFrame = updates
      .select(pks.map(org.apache.spark.sql.functions.col): _*).distinct()
    val touchedUris = cur
      .withColumn("__file", org.apache.spark.sql.functions.input_file_name())
      .join(keyFrame, pks, "left_semi")
      .select("__file").distinct().collect().map(_.getString(0)).toSeq
    val touchedNames =
      touchedUris.map(u => u.substring(u.lastIndexOf('/') + 1))
    val version = nextVersion(fs, tablePath)
    val survivors =
      if (touchedUris.isEmpty) Nil
      else stageIn(spark.read.option("mergeSchema", "true")
        .parquet(touchedUris: _*).join(keyFrame, pks, "left_anti"),
        fs, tablePath, version, tag = "k")
    val added = stageIn(updates, fs, tablePath, version, tag = "u")
    writeCommit(spark, tablePath, version, updates.schema,
      survivors ++ added, touchedNames, checkpointInterval)
    version
  }

  /** Protocol-committed small-file compaction (the lakehouse OPTIMIZE):
    * bin-packs active files smaller than `targetBytes` into
    * ~target-sized rewrites and commits add+remove in one version — a
    * logical no-op (same rows), so readers never see a torn table and
    * time travel still reconstructs every pre-compaction version.
    * Returns the committed version, or -1 when fewer than two small
    * files exist (nothing to gain — no empty commit). Complements the
    * layout-preserving compactor in [[graft.sinks.Sinks]], which
    * targets plain (log-less) lakes. */
  def optimize(spark: SparkSession, tablePath: String,
               targetBytes: Long = 128L * 1024 * 1024,
               checkpointInterval: Int = 10): Long = {
    val fs = tableFs(spark, tablePath)
    val files = activeFiles(spark, tablePath)
    val small = files.filter { f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$tablePath/$f"))
        .getLen < targetBytes
    }
    if (small.size < 2) return -1L
    val totalBytes = small.map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$tablePath/$f"))
        .getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val version = nextVersion(fs, tablePath)
    val packed = spark.read.option("mergeSchema", "true")
      .parquet(small.map(f => s"$tablePath/$f"): _*).coalesce(nOut)
    val moved = stageIn(packed, fs, tablePath, version)
    writeCommit(spark, tablePath, version, packed.schema, moved, small,
      checkpointInterval)
    version
  }

  /** Change data feed by snapshot diff: the row-level changes between
    * two committed versions, keyed on `pks` — right-only keys emit as
    * inserts, left-only as deletes, changed payloads as updates with
    * BOTH images. Output shape is exactly
    * [[graft.operators.Rollup.retractions]]' input (`before`/`after`
    * structs + kind/lsn/counter), so a lake diff folds straight into a
    * maintained aggregate. Cost is one full-outer join of the two
    * version snapshots (this minimal log stores no per-commit change
    * files; the diff is computed, not replayed — the DBLog
    * snapshot-reconcile tradeoff, reference pkg/dblog). Unchanged rows
    * are dropped via null-safe struct comparison. */
  def changesBetween(spark: SparkSession, tablePath: String,
                     fromV: Long, toV: Long,
                     pks: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(pks.nonEmpty, "changesBetween requires primary keys")
    val E = graft.model.CdcEnvelope
    val a = readAt(spark, tablePath, fromV)
    val b = readAt(spark, tablePath, toV)
    val l = a.select(pks.map(col) :+
      struct(a.columns.map(col).toIndexedSeq: _*).as("before"): _*)
    val r = b.select(pks.map(col) :+
      struct(b.columns.map(col).toIndexedSeq: _*).as("after"): _*)
    val kind = when(col("before").isNull, E.Insert)
      .when(col("after").isNull, E.Delete)
      .when(not(col("before") <=> col("after")), E.Update)
    l.join(r, pks, "full_outer")
      .select(col("before"), col("after"), kind.as(E.Kind),
        lit(toV).as(E.Lsn), lit(0).as(E.Counter))
      .filter(col(E.Kind).isNotNull)
  }

  private val ckptSchema = StructType(Seq(
    StructField("protocol", StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))),
    StructField("metaData", StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("createdTime", LongType)))),
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType))))))

  /** Write a protocol checkpoint at `version`: one parquet file
    * `_delta_log/<version>.checkpoint.parquet` holding the full replayed
    * state (protocol + metaData + one `add` row per active file), then
    * point `_last_checkpoint` at it. Readers start from the newest
    * checkpoint and replay only later JSON commits; JSON commits at or
    * below the checkpoint become prunable (log cleanup). Single-file
    * checkpoint naming per the public protocol. */
  def checkpoint(spark: SparkSession, tablePath: String, version: Long,
                 schema: StructType): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tablePath), spark.sparkContext.hadoopConfiguration)
    val logDir = new org.apache.hadoop.fs.Path(s"$tablePath/_delta_log")
    val active = activeFiles(spark, tablePath)
    val now = System.currentTimeMillis()
    val rows: Seq[Row] =
      Row(Row(1, 2), null, null) +:
      Row(null, Row(java.util.UUID.randomUUID().toString, Row("parquet"),
        schema.json, Seq.empty[String], now), null) +:
      active.map { p =>
        val len = fs.getFileStatus(
          new org.apache.hadoop.fs.Path(tablePath, p)).getLen
        Row(null, null, Row(p, Map.empty[String, String], len, now, true))
      }
    import scala.jdk.CollectionConverters._
    val staging = new org.apache.hadoop.fs.Path(s"$tablePath/.ckpt-$version")
    spark.createDataFrame(rows.asJava, ckptSchema).coalesce(1)
      .write.mode("overwrite").parquet(staging.toString)
    val part = fs.listStatus(staging)
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException("checkpoint write lost"))
    val dst = new org.apache.hadoop.fs.Path(logDir, f"$version%020d.checkpoint.parquet")
    if (fs.exists(dst)) fs.delete(dst, false)
    fs.rename(part, dst)
    fs.delete(staging, true)
    // _last_checkpoint LAST: a crash before this line leaves the old
    // pointer valid; the orphan checkpoint file is harmless
    val lc = fs.create(new org.apache.hadoop.fs.Path(logDir, "_last_checkpoint"), true)
    try lc.write(s"""{"version":$version,"size":${rows.length}}""".getBytes("UTF-8"))
    finally lc.close()
  }

  /** One log action: Right(path)=add, Left(path)=remove, None=other.
    * Field extraction via a targeted scan instead of a JSON library —
    * add/remove `path` is always a top-level string field. Protocol
    * features we do not implement (deletionVectors, columnMapping) are
    * detected and rejected. */
  private[sources] def parseAction(line: String): Option[Either[String, String]] = {
    require(!line.contains("deletionVector"),
      "DeltaLite does not support deletion vectors")
    def pathOf(obj: String): Option[String] = {
      val i = line.indexOf(s""""$obj"""")
      if (i < 0) return None
      val pi = line.indexOf("\"path\"", i)
      if (pi < 0) return None
      val start = line.indexOf('"', line.indexOf(':', pi) + 1) + 1
      val end = line.indexOf('"', start)
      Some(line.substring(start, end))
    }
    pathOf("add").map(Right(_)).orElse(pathOf("remove").map(Left(_)))
  }
}
