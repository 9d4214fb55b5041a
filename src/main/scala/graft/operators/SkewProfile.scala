package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-weight skew diagnostics — the measurement step in front of every
  * 100-TB partitioning decision (salt factor, bucket count, AQE skew
  * thresholds). The reference meters per-table row flow
  * (pkg/stats, problem items); this profiles per-KEY weight, which is
  * what actually breaks a shuffle: one hot key = one straggler task no
  * matter how many partitions exist.
  *
  * Shapes: per-key counts collapse map-side (first shuffle is balanced
  * by key by construction); the histogram then aggregates the
  * KEY-COUNT frame (≤ |distinct keys| rows) into ≤64 magnitude rows.
  * The magnitude bucket is `length(bin(count))-1` = floor(log2) by
  * integer/string ops only — engine-exact, no float log whose last-ulp
  * rounding could flip a bucket between engines.
  */
object SkewProfile {

  /** Histogram of key weights by power-of-two magnitude: one row per
    * magnitude with the key count, total rows, and the heaviest key's
    * rows. A healthy uniform distribution occupies 1-2 adjacent
    * magnitudes; heavy-tail skew shows as a lonely high magnitude. */
  def histogram(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty)
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .select((length(bin(col("c"))) - 1).cast("int").as("magnitude"),
        col("c"))
      .groupBy("magnitude")
      .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
        max(col("c")).as("max_key_rows"))
  }

  /** Keys whose weight exceeds `targetPerTask`, with the salt factor
    * that would level them: ceil(weight / targetPerTask) splits. Feed
    * the result to [[Joins.salted]] (or use it to size buckets). */
  def heavyKeys(df: DataFrame, keys: Seq[String],
                targetPerTask: Long): DataFrame = {
    require(keys.nonEmpty && targetPerTask > 0)
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("key_rows"))
      .filter(col("key_rows") > targetPerTask)
      .withColumn("salt_factor",
        ceil(col("key_rows") / lit(targetPerTask.toDouble)).cast("int"))
  }
}
