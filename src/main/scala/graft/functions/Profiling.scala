package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-shape profiling for transfer planning and monitoring
  * (reference: the per-table statistics the coordinator samples before
  * sharded upload, pkg/worker upload planning): key-skew profiles feed
  * salting/bucketing decisions, snapshot statistics feed drift
  * monitoring between loads. All-aggregation operators: corpus-sized
  * input, key-domain-sized output, map-side combined.
  */
object Profiling {

  /** Top-k heaviest keys with integer-exact load shares (basis
    * points). The groupBy is the only corpus shuffle; the sort runs on
    * the aggregated key-domain-sized frame. A key with share_bp ≥
    * ~100/numPartitions·100 is a salting candidate — the skew-join
    * threshold the salted-join operator consumes. */
  def skewProfile(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    val total = df.count() // scalar
    df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("share_bp", expr(s"(cnt * 10000) div ${total}L"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(k)
  }

  /** Per-column snapshot statistics over numeric columns: row/null/
    * distinct counts, 6-decimal-rounded min/max/mean (mean summed as
    * DECIMAL so engines agree bit-for-bit). One aggregation pass per
    * column, each map-side combined; output is |cols| rows. */
  def snapshotStats(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        count_distinct(col(c)).as("n_distinct"),
        round(min(col(c).cast("double")), 6).as("vmin"),
        round(max(col(c).cast("double")), 6).as("vmax"),
        round(sum(round(col(c).cast("double"), 6).cast("decimal(18,6)"))
          .cast("double") / count(col(c)), 6).as("vmean"))
        .withColumn("column", lit(c))
        .select("column", "n_rows", "n_nulls", "n_distinct",
          "vmin", "vmax", "vmean")
    }.reduce(_ unionByName _)

  /** Drift report between two snapshots: both snapshots' stats side by
    * side per column, tagged — the monitoring view a scheduled
    * transfer publishes after each load. */
  def driftReport(before: DataFrame, after: DataFrame,
                  cols: Seq[String]): DataFrame =
    snapshotStats(before, cols).withColumn("snapshot", lit("before"))
      .unionByName(
        snapshotStats(after, cols).withColumn("snapshot", lit("after")))
      .select("snapshot", "column", "n_rows", "n_nulls", "n_distinct",
        "vmin", "vmax", "vmean")
}
