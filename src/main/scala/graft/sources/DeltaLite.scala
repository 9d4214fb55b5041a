package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Active data files after replaying the log. */
  def activeFiles(spark: SparkSession, tablePath: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tablePath), spark.sparkContext.hadoopConfiguration)
    val logDir = new org.apache.hadoop.fs.Path(s"$tablePath/_delta_log")
    require(fs.exists(logDir), s"not a Delta table: no _delta_log at $tablePath")
    val entries = fs.listStatus(logDir).map(_.getPath.getName)
      .filter(_.endsWith(".json")).sorted

    val adds = scala.collection.mutable.LinkedHashMap[String, Unit]()
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
            overwrite: Boolean = false): Long = {
    val spark = df.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tablePath), spark.sparkContext.hadoopConfiguration)
    val logDir = new org.apache.hadoop.fs.Path(s"$tablePath/_delta_log")
    val version: Long =
      if (!fs.exists(logDir)) 0L
      else fs.listStatus(logDir).map(_.getPath.getName)
        .filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json").toLong).sorted.lastOption
        .map(_ + 1).getOrElse(0L)
    val removed: Seq[String] =
      if (overwrite && version > 0) activeFiles(spark, tablePath) else Nil

    // stage data files, then move them in under version-tagged names
    val staging = new org.apache.hadoop.fs.Path(s"$tablePath/.stage-$version")
    df.write.mode("overwrite").parquet(staging.toString)
    val moved = fs.listStatus(staging)
      .filter(_.getPath.getName.startsWith("part-")).toSeq.map { st =>
        val name = s"part-$version-${st.getPath.getName.stripPrefix("part-")}"
        fs.rename(st.getPath, new org.apache.hadoop.fs.Path(tablePath, name))
        (name, st.getLen)
      }
    fs.delete(staging, true)

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
      s""""schemaString":${js(df.schema.json)},""" +
      s""""partitionColumns":[],"configuration":{},"createdTime":$now}}"""
    removed.foreach { p =>
      actions += s"""{"remove":{"path":${js(p)},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    moved.foreach { case (name, len) =>
      actions += s"""{"add":{"path":${js(name)},"partitionValues":{},""" +
        s""""size":$len,"modificationTime":$now,"dataChange":true}}"""
    }
    if (!fs.exists(logDir)) fs.mkdirs(logDir)
    val commit = new org.apache.hadoop.fs.Path(logDir, f"$version%020d.json")
    // create-exclusive: racing writers lose with FileAlreadyExistsException
    val out = fs.create(commit, false)
    try out.write((actions.result().mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    version
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
