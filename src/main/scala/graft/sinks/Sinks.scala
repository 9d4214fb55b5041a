package graft.sinks

import graft.model.{CdcEnvelope => E}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink registry + serializers (reference: pkg/abstract/sink.go Sinker
  * contract; serializer formats pkg/abstract/model/serialization.go:12-18
  * and pkg/serializer/{csv,json,parquet,raw}.go; cleanup policies
  * pkg/abstract/model/endpoint_cleanup_type.go).
  */
object Sinks {

  /** Cleanup policy applied on (re)activation. */
  sealed trait CleanupPolicy
  case object Drop extends CleanupPolicy      // remove target, full rewrite
  case object Truncate extends CleanupPolicy  // clear rows, keep target
  case object Disabled extends CleanupPolicy  // append-only

  private def mode(p: CleanupPolicy): String = p match {
    case Drop | Truncate => "overwrite" // on files both clear the prefix
    case Disabled => "append"
  }

  /** File sinks. partitionCols ≙ the table_splitter/rotator write layout
    * (per-value directories). */
  def parquet(df: DataFrame, path: String,
              policy: CleanupPolicy = Disabled,
              partitionCols: Seq[String] = Nil): Unit = {
    // repartition on the partition columns BEFORE partitionBy: otherwise
    // every shuffle task writes a file into every value dir
    // (tasks x dirs small files — the cluster-scale write killer)
    val src =
      if (partitionCols.isEmpty) df
      else df.repartition(partitionCols.map(col): _*)
    val w = src.write.mode(mode(policy))
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Range-partitioned, internally-sorted parquet write: rows are
    * globally range-split on `sortCols` and sorted within each file, so
    * every file covers a disjoint key range. At lake scale this is what
    * makes parquet min/max statistics selective — a point/range query
    * prunes to one file instead of scanning all of them (the write-side
    * analogue of the reference's PK-ordered `OrderedRead`,
    * postgres/storage.go:250-291). */
  def sortedParquet(df: DataFrame, path: String, sortCols: Seq[String],
                    policy: CleanupPolicy = Disabled,
                    partitions: Option[Int] = None): Unit = {
    val cols = sortCols.map(org.apache.spark.sql.functions.col)
    val ranged = partitions match {
      case Some(n) => df.repartitionByRange(n, cols: _*)
      case None => df.repartitionByRange(cols: _*)
    }
    ranged.sortWithinPartitions(cols: _*)
      .write.mode(mode(policy)).parquet(path)
  }

  def csv(df: DataFrame, path: String, delimiter: String = ",",
          header: Boolean = true, policy: CleanupPolicy = Disabled): Unit =
    df.write.mode(mode(policy))
      .option("sep", delimiter).option("header", header).csv(path)

  def jsonLines(df: DataFrame, path: String,
                policy: CleanupPolicy = Disabled): Unit =
    df.write.mode(mode(policy)).json(path)

  def console(df: DataFrame, rows: Int = 20): Unit = df.show(rows, false)

  // ---------------- queue serializers ----------------

  /** JSON serializer: one JSON object per row over the data columns
    * (serialization format `JSON`, pkg/serializer/queue/json.go). */
  def serializeJson(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val use = if (cols.nonEmpty) cols else E.dataCols(df)
    df.select(to_json(struct(use.map(col): _*)).as("value"))
  }

  /** CSV-line serializer (pkg/serializer/csv.go). */
  def serializeCsv(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val use = if (cols.nonEmpty) cols else E.dataCols(df)
    df.select(concat_ws(",", use.map(c => col(c).cast("string")): _*).as("value"))
  }

  /** Debezium envelope serializer — see [[graft.parsers.Debezium.emit]]. */
  def serializeDebezium(df: DataFrame): DataFrame =
    graft.parsers.Debezium.emit(df, E.dataCols(df))

  /** Mirror/raw serializer: pass the raw payload column through
    * (format `Mirror`/`RawColumn`). */
  def serializeRaw(df: DataFrame, rawCol: String): DataFrame =
    df.select(col(rawCol).cast("binary").as("value"))
}
