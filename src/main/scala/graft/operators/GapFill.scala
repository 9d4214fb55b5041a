package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resample with forward fill (last observation carried
  * forward) — the time-series normalization step in front of windowed
  * feature extraction: sensor/event streams observe at irregular
  * instants, training pipelines want one row per (key, tick).
  *
  * Spelling: per-key [min, max] bounds (one map-side-combined agg),
  * a `sequence`-explode grid off those bounds (span/step rows per key,
  * never a driver loop), then ONE window pass over grid ∪ observations
  * ordered by (ts, source) where `last(value, ignoreNulls)` carries
  * the newest at-or-before observation onto each grid row — the same
  * running-frame trick as [[AsofJoin]], O(1) state per row, no
  * point×observation join. Total cost: two shuffles keyed on the
  * group (bounds agg + window), both balanced by key.
  *
  * Observations must be unique per (key, ts) — pre-aggregate ties
  * upstream, or the carried value is order-dependent. Grid rows at or
  * after the first observation are always filled (the grid starts at
  * the per-key min, which IS an observation).
  */
object GapFill {

  def fill(df: DataFrame, keys: Seq[String], tsCol: String, step: Long,
           valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && step > 0 && valueCols.nonEmpty)
    val k = keys.map(col)
    val grid = df.groupBy(k: _*)
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
      .select(k :+
        explode(sequence(col("__lo"), col("__hi"), lit(step))).as(tsCol): _*)
      .select(k ++ Seq(col(tsCol), lit(0).as("__src")) ++
        valueCols.map(v =>
          lit(null).cast(df.schema(v).dataType).as(v)): _*)
    val obs = df.select(k ++ Seq(col(tsCol), lit(1).as("__src")) ++
      valueCols.map(col): _*)
    // at equal ts the observation (src=1) sorts first, so the grid row
    // picks it up through the running last()
    val w = Window.partitionBy(k: _*)
      .orderBy(col(tsCol).asc, col("__src").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.unionByName(obs)
      .select(k ++ Seq(col(tsCol), col("__src")) ++
        valueCols.map(v => last(col(v), ignoreNulls = true).over(w).as(v)): _*)
      .filter(col("__src") === 0).drop("__src")
  }
}
