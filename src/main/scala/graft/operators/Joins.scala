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

/** As-of join: for each left row, attach the single right row with the
  * largest `rightTime <= leftTime` (backward, the default) or smallest
  * `rightTime >= leftTime` (forward) within the same key group — the
  * point-in-time lookup every CDC/state pipeline needs (reference models
  * this implicitly: its replication sink always applies "latest state as
  * of the event's LSN", pkg/abstract/changeitem ordering contract).
  *
  * Scale shape: ONE hash shuffle of each side on the key columns (the
  * union is partitioned once), then a per-key sort — no broadcast, no
  * range-nested-loop, no per-row probe. At 100 TB this is the same cost
  * as a single sort-merge join; state per task is one row of carried
  * right-side values, so arbitrarily long key histories stream through.
  *
  * Equal timestamps match (inclusive), like DuckDB/pandas `merge_asof`.
  * Right-side value columns ride in ONE struct so a legitimately-NULL
  * value column cannot "tear" and pick up an older row's value.
  */
object AsofJoin {

  /** @param keys       equi-join key columns (present on both sides)
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param direction  "backward" (right.t <= left.t, default) or
    *                   "forward" (right.t >= left.t)
    * @param tolerance  max |leftTime - rightTime| to accept, e.g.
    *                   `expr("interval 1 hour")`; matches farther away
    *                   yield NULLs (left row is kept — left-outer
    *                   semantics, again matching merge_asof)
    * @param rightPrefix prefix for right value columns in the output
    *                   (rightTime surfaces as `<prefix><rightTime>`)
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           direction: String = "backward",
           tolerance: Option[Column] = None,
           rightPrefix: String = "r_"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val rightVals = right.columns.filterNot(c => keys.contains(c)).toSeq
    val leftVals = left.columns
      .filterNot(c => keys.contains(c) || c == leftTime).toSeq

    // right rows carry their payload (incl. the right timestamp) in one
    // nullable struct; left rows carry a typed NULL of the same struct.
    // NULL-key right rows are dropped up front: SQL equi-join semantics
    // (and DuckDB ASOF, and the broadcast spelling) never match on
    // NULL, but Window.partitionBy would happily group them — a left
    // row with a NULL key must find nothing, not the NULL-key "group".
    // NULL-TIME right rows go too: a NULL timestamp never satisfies
    // `rightTime <= leftTime` (or >=) under SQL comparison, but the
    // window sort would park them at one end of the partition where
    // last(ignoreNulls) can pick their (non-null) payload struct
    val rightKeyed = keys.foldLeft(
      right.filter(right(rightTime).isNotNull))(
      (d, k) => d.filter(d(k).isNotNull))
    val rv = struct(rightVals.map(rightKeyed(_)): _*)
    val rSide = rightKeyed.select(
      keys.map(rightKeyed(_)) ++ Seq(
        rightKeyed(rightTime).as("__t"), lit(0).as("__side"),
        rv.as("__rv")) ++
        leftVals.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val rvType = rSide.schema("__rv").dataType
    val lSide = left.select(
      keys.map(left(_)) ++ Seq(
        left(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(rvType).as("__rv")) ++
        leftVals.map(left(_)): _*)

    import org.apache.spark.sql.expressions.Window
    val w0 = Window.partitionBy(keys.map(col): _*)
    // backward: latest right at or before the left row — right (side 0)
    // sorts before left (side 1) at equal __t, last() looks back.
    // forward: earliest right at or after — flip the sort so "look back"
    // in the flipped order is "look forward" in time; side order flips
    // too so an equal-time right row still falls inside the frame.
    val w =
      if (direction == "backward")
        w0.orderBy(col("__t").asc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        w0.orderBy(col("__t").desc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // a left row with a NULL time compares UNKNOWN against every right
    // time — no match, like DuckDB ASOF / merge_asof. The guard is
    // explicit because the sort alone gets only one direction right:
    // backward's NULLS-FIRST puts them before every right row (empty
    // frame, correct), but forward's desc NULLS-LAST parks them after
    // the whole partition, where the frame holds every right row
    val matchedRaw = when(col("__t").isNotNull,
      last(col("__rv"), ignoreNulls = true).over(w))
    val matched = tolerance match {
      case Some(tol) =>
        val rt = matchedRaw.getField(rightTime)
        val ok =
          if (direction == "backward") rt >= col("__t") - tol
          else rt <= col("__t") + tol
        when(ok, matchedRaw)
      case None => matchedRaw
    }

    rSide.unionByName(lSide)
      .withColumn("__m", matched)
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++
          Seq(col("__t").as(leftTime)) ++ leftVals.map(col) ++
          rightVals.map(c => col("__m").getField(c).as(rightPrefix + c)): _*)
  }
}

object AsofJoinBroadcast {

  /** As-of join for a SMALL right side: the reason to prefer this over
    * [[AsofJoin.join]] is WHICH SIDE SHUFFLES. The union spelling
    * shuffles both sides on the key — at 100 TB of left events against
    * a GB of state, repartitioning the events is the entire job cost.
    * Here the right side collapses to one sorted array per key
    * (bounded by that key's history — the caller asserts it fits a
    * broadcast), the join broadcasts, and the left side is NEVER
    * shuffled: the probe is a per-row scan of the key's array inside a
    * codegen'd higher-order function.
    *
    * The per-row probe is a BINARY SEARCH of the key's sorted history
    * ([[org.apache.spark.sql.graft.SortedAsofPickExpr]]) — O(log h),
    * so a skewed key whose history is a large fraction of the state
    * table costs log, not linear, per event (the HOF filter spelling
    * it replaced scanned O(h) boxed structs per row: 83.7 s vs
    * sub-second on the Zipf fresh-sf1 fixture). Semantics match
    * [[AsofJoin.join]] backward-inclusive exactly (spec-asserted).
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightPrefix: String = "r_"): DataFrame = {
    val rightVals = right.columns.filterNot(c => keys.contains(c)).toSeq
    val rightAgg = right.groupBy(keys.map(right(_)): _*)
      .agg(sort_array(collect_list(struct(
        (right(rightTime).as("__rt") +:
          rightVals.map(c => right(c).as(c))): _*))).as("__hist"))
    val probed = left.join(broadcast(rightAgg), keys, "left")
    // latest history entry at-or-before the left time: one binary
    // search per row (rightmost __rt <= t; null __rt never matches)
    val m = org.apache.spark.sql.graft.bridge.column(
      org.apache.spark.sql.graft.SortedAsofPickExpr(
        org.apache.spark.sql.graft.bridge.expression(col("__hist")),
        org.apache.spark.sql.graft.bridge.expression(col(leftTime))))
    probed.select(
      left.columns.map(col) ++
        rightVals.map(c => m.getField(c).as(rightPrefix + c)): _*)
  }
}

object AsofJoinNative {

  /** Backward as-of join through the engine's CUSTOM PHYSICAL OPERATOR
    * ([[org.apache.spark.sql.graft.AsOfJoinExec]]): logical node +
    * planner strategy + a streaming merge exec that holds ONE candidate
    * row of state per partition. Same semantics and same shuffle count
    * as [[AsofJoin.join]]'s union+window spelling, but each input row
    * is touched once — no padded-schema union, no window frame buffer,
    * no struct boxing. The composed spellings remain for the forward /
    * tolerance variants.
    *
    * The strategy self-registers on the DataFrame's session (idempotent)
    * so any session can call this; SQL-configured sessions get it from
    * GraftExtensions. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightPrefix: String = "r_"): DataFrame = {
    import org.apache.spark.sql.graft.{bridge, AsOfJoinPlan, AsOfJoinStrategy}
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    // re-alias the right side so a self-join (both frames derived from
    // one scan) cannot carry colliding expression ids into the plan
    val r2 = right.select(right.columns.toIndexedSeq.map(c => right(c).as(c)): _*)
    val plan = AsOfJoinPlan(
      bridge.logicalPlan(left), bridge.logicalPlan(r2),
      keys.map(k => bridge.expression(left(k))),
      keys.map(k => bridge.expression(r2(k))),
      bridge.expression(left(leftTime)),
      bridge.expression(r2(rightTime)))
    val joined = bridge.ofRows(spark, plan)
      .toDF((left.columns.toSeq ++ right.columns.map(rightPrefix + _)): _*)
    val rightVals = right.columns.filterNot(keys.contains).toSeq
    val leftVals = left.columns
      .filterNot(c => keys.contains(c) || c == leftTime).toSeq
    joined.select((keys ++ Seq(leftTime) ++ leftVals ++
      rightVals.map(rightPrefix + _)).map(col): _*)
  }
}

/** Range (interval-containment) join: points to the intervals that
  * contain them, `lo <= p < hi`, optionally within equi-key groups.
  * Spark's planner turns a bare inequality join into a nested-loop over
  * every (point, interval) pair — quadratic, a non-starter at scale.
  *
  * Bucketization makes it an equi-join: each interval is replicated to
  * every `granularity`-sized bucket it overlaps; each point belongs to
  * exactly ONE bucket, so the equi-join on (keys, bucket) finds every
  * containing interval exactly once (no post-join dedup needed), and the
  * trailing `lo <= p < hi` filter discards same-bucket near-misses.
  *
  * Cost: one shuffle keyed on (keys, bucket); interval replication
  * factor is `ceil(span / granularity) + 1`, so pick `granularity` near
  * the typical interval span. Degenerate granularity (everything in one
  * bucket) degrades to the quadratic join — the guard rails against a
  * granularity more than ~1000x smaller than the widest span are on the
  * caller.
  */
object RangeJoin {

  /** @param granularity bucket width in the native units of `pointCol`
    *                    (numeric columns; timestamps should be cast to
    *                    epoch seconds by the caller) */
  def pointInterval(points: DataFrame, pointCol: String,
                    intervals: DataFrame, loCol: String, hiCol: String,
                    granularity: Double, keys: Seq[String] = Nil): DataFrame = {
    require(granularity > 0, "granularity must be positive")
    val b = lit(granularity)
    val iv = intervals.withColumn("__b",
      explode(sequence(floor(col(loCol) / b).cast("long"),
        floor(col(hiCol) / b).cast("long"))))
    val pt = points.withColumn("__b",
      floor(col(pointCol) / b).cast("long"))
    pt.join(iv, keys :+ "__b")
      .filter(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("__b")
  }
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
