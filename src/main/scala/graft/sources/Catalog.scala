package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Catalog / storage-introspection surface: the Spark rendering of the
  * reference's `Storage` metadata contract (reference:
  * pkg/abstract/storage.go — `TableList` :292, `TableSchema` :291,
  * `ExactTableRowsCount` :294, `EstimateTableRowsCount` :295).
  */
object Catalog {

  final case class TableInfo(name: String, schema: StructType,
                             estimatedRows: Long)

  /** List tables in a fixture directory with schemas and row estimates
    * (≙ TableList -> TableMap). The estimate comes from file statistics
    * (parquet footer row counts surface through Spark's stats), not a
    * scan. */
  def tableList(spark: SparkSession, dir: String,
                names: Seq[String]): Seq[TableInfo] =
    names.map { n =>
      val df = spark.read.parquet(s"$dir/$n.parquet")
      TableInfo(n, df.schema, estimateRows(df))
    }

  /** Estimated row count from plan statistics — O(metadata), the
    * analogue of EstimateTableRowsCount's `reltuples` read. */
  def estimateRows(df: DataFrame): Long = {
    val stats = df.queryExecution.optimizedPlan.stats
    stats.rowCount.map(_.toLong).getOrElse {
      // fall back to sizeInBytes / average row width estimate
      val width = math.max(1, df.schema.fields.length * 8)
      (BigInt(stats.sizeInBytes.toLong) / width).toLong
    }
  }

  /** Exact count (≙ ExactTableRowsCount) — a full scan, Spark-side
    * metadata-only for parquet (footer row counts). */
  def exactRows(df: DataFrame): Long = df.count()

  /** Schema for a single table (≙ Storage.TableSchema). */
  def tableSchema(spark: SparkSession, dir: String, name: String): StructType =
    spark.read.parquet(s"$dir/$name.parquet").schema
}
