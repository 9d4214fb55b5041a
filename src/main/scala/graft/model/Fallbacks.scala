package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typesystem version fallbacks: downgrade adapters applied between the
  * engine's canonical output and an older endpoint contract (reference:
  * pkg/abstract/typesystem/fallback.go:17-29, applied as sink middleware
  * in pkg/middlewares/fallback.go:16-38; concrete example
  * pkg/providers/clickhouse/fallback_timestamp_as_datetime.go).
  *
  * A fallback is (sinceVersion, transform). Applying "as of version N"
  * folds every fallback with version > N, newest first — exactly the
  * reference's downgrade chain, as plain DataFrame transforms.
  */
object Fallbacks {

  final case class Fallback(sinceVersion: Int, name: String,
                            apply: DataFrame => DataFrame)

  /** Downgrade a frame to what an endpoint pinned at `version` expects. */
  def applyFor(df: DataFrame, endpointVersion: Int,
               fallbacks: Seq[Fallback]): DataFrame =
    fallbacks.filter(_.sinceVersion > endpointVersion)
      .sortBy(-_.sinceVersion)
      .foldLeft(df)((d, f) => f.apply(d))

  /** Example fallback mirroring the ClickHouse timestamp->datetime
    * downgrade: truncate microsecond timestamps to second precision. */
  def timestampAsDatetime(cols: Seq[String], since: Int): Fallback =
    Fallback(since, "timestamp_as_datetime", df =>
      cols.foldLeft(df)((d, c) =>
        d.withColumn(c, date_trunc("second", col(c)))))

  /** Downgrade unsigned-64 decimals to strings for sinks without
    * decimal support. */
  def uint64AsString(since: Int): Fallback =
    Fallback(since, "uint64_as_string", df => {
      val targets = df.schema.fields.collect {
        case f if f.dataType == DecimalType(20, 0) => f.name
      }
      targets.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(StringType)))
    })
}
