package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for scale — the pieces a 100 TB deployment reaches
  * for when the default shuffle join hurts:
  *
  *   - [[Bucketing]]: co-located joins. Write both sides bucketed by the
  *     join key; subsequent joins read bucket-aligned and skip the
  *     Exchange entirely. This is the Spark equivalent of the
  *     reference's "shard both ends the same way" pattern (its sharded
  *     upload keyed on PK, sharding_storage.go) — except the co-location
  *     persists and every later join benefits.
  *   - [[SaltedJoin]]: skew mitigation. A handful of hot keys put an
  *     entire shuffle partition on one executor; salting fans each hot
  *     key into `salt` sub-keys, replicating the small side to match.
  *     AQE's skew-join handles moderate skew automatically; explicit
  *     salting is for the pathological keys AQE cannot split (single
  *     key > executor memory).
  */
object Bucketing {

  /** Persist a frame bucketed+sorted by `keys` as a managed table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a prior session's managed-table dir can survive in the warehouse
    // with no catalog entry — saveAsTable refuses the stale location
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")),
      table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two identically-bucketed tables on their bucket keys — with
    * matching bucket counts the planner emits a SortMergeJoin with NO
    * Exchange on either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}

object SaltedJoin {

  /** Inner-join `big` with `small` on `key`, fanning the big side's hot
    * keys across `salt` sub-partitions. The small side is replicated
    * `salt` times (explode) — acceptable because it is small; the big
    * side only gains a salt column, no replication.
    *
    * Salt derivation, two modes:
    *   - default (`saltCol = None`): `monotonically_increasing_id` —
    *     perfectly even spread, but PARTITION-LAYOUT-DEPENDENT: replaying
    *     the same data with different partitioning re-salts rows. Join
    *     RESULTS are identical either way (the salt cancels out); only
    *     row->sub-partition placement changes. Fine for load-spreading.
    *   - `saltCol = Some(c)`: salt from the engine-stable md5 hash of a
    *     designated column (a PK or any high-cardinality column) —
    *     placement is reproducible across runs, partitionings and
    *     engines. Prefer this when placement feeds anything observable
    *     (file layout, per-bucket metrics). Spread quality follows the
    *     column's cardinality within each hot key. */
  def join(big: DataFrame, small: DataFrame, key: String,
           salt: Int, saltCol: Option[String] = None): DataFrame = {
    val saltExpr = saltCol match {
      case Some(c) => pmod(graft.functions.Hashing.hex8ToLong(
        col(c).cast("string")), lit(salt.toLong)).cast("int")
      case None => pmod(monotonically_increasing_id(), lit(salt)).cast("int")
    }
    val bigSalted = big.withColumn("__salt", saltExpr)
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigSalted.join(smallExploded, Seq(key, "__salt")).drop("__salt")
  }
}
