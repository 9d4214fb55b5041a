package graft.operators

import graft.model.{CdcEnvelope => E}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate (rollup) maintenance over a CDC changelog.
  *
  * At 100 TB a `GROUP BY` you keep fresh must never be recomputed from
  * base history: the changelog batch is folded into the existing
  * aggregate state as SIGNED deltas (the public retract-stream design,
  * cf. Flink's retraction semantics and the reference's ClickHouse
  * collapsing-sink family, pkg/providers/clickhouse — where a -1/+1
  * sign column makes aggregates maintainable by merge alone).
  *
  * Contract: the changelog is first rewritten as retractions — updates
  * become a delete(before-image) + insert(after-image) pair
  * ([[retractions]], from a Debezium-style before/after frame). A
  * retraction stream makes every additive aggregate maintainable:
  *   count  += sign
  *   sum(m) += sign * m
  * and avg derives as sum/count at read time. MIN/MAX are deliberately
  * NOT offered — they are not retractable (dropping the current min
  * needs the runner-up, i.e. base history); use a re-aggregate of the
  * affected groups for those.
  *
  * Scale shape: [[delta]] is one map-side-combined aggregation of the
  * BATCH (state never scanned); [[merge]] is one keyed shuffle of
  * state ∪ delta, so the cost is ∝ |state| + |batch|, independent of
  * the base table size. Groups whose count reaches zero leave the
  * state; a negative count raises (inconsistent changelog) rather than
  * corrupting silently.
  */
object Rollup {

  /** Rewrite a before/after changelog (Debezium envelope shape:
    * struct columns holding the full pre/post row images, plus the
    * engine's kind/lsn) as a retraction stream: insert → +after,
    * delete → −before, update → −before then +after. The pair keeps
    * the update's LSN; counters are doubled so retract orders before
    * add within the event. Unknown kinds fail loudly — folding an
    * unsplit update would corrupt every downstream aggregate. */
  def retractions(changes: DataFrame, beforeCol: String = "before",
                  afterCol: String = "after"): DataFrame = {
    val b = col(beforeCol)
    val a = col(afterCol)
    val pair = when(col(E.Kind) === E.Insert,
        array(struct(lit(E.Insert).as("k"), a.as("img"))))
      .when(col(E.Kind) === E.Delete,
        array(struct(lit(E.Delete).as("k"), b.as("img"))))
      .when(col(E.Kind) === E.Update,
        array(struct(lit(E.Delete).as("k"), b.as("img")),
              struct(lit(E.Insert).as("k"), a.as("img"))))
      .otherwise(raise_error(concat(
        lit("rollup: unfoldable change kind "), col(E.Kind))))
    val exploded = changes
      .withColumn("__ev", explode(pair))
      .withColumn("__off",
        when(col("__ev.k") === E.Delete && col(E.Kind) === E.Update, 0)
          .otherwise(1))
    val dataFields = changes.schema(afterCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toIndexedSeq
    exploded.select(
      (dataFields.map(f => col(s"__ev.img.$f").as(f)) ++ Seq(
        col("__ev.k").as(E.Kind),
        col(E.Lsn),
        (col(E.Counter) * 2 + col("__off")).as(E.Counter))): _*)
  }

  private def sign = when(col(E.Kind) === E.Insert, lit(1L))
    .when(col(E.Kind) === E.Delete, lit(-1L))
    .otherwise(raise_error(concat(
      lit("rollup: delta expects a retraction stream, got kind "),
      col(E.Kind))))

  /** Aggregate state of a plain snapshot — the initial rollup.
    * Output schema: groupKeys, n_rows, sum_<metric>... */
  def init(snapshot: DataFrame, groupKeys: Seq[String],
           metrics: Seq[String]): DataFrame =
    snapshot.groupBy(groupKeys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        metrics.map(m => sum(col(m)).as(s"sum_$m")): _*)

  /** Signed per-group delta of a retraction-stream batch. One
    * aggregation of the BATCH only; negation (not multiplication)
    * keeps each metric's native numeric type so sums line up with
    * [[init]]'s for the merge union. */
  def delta(retractionBatch: DataFrame, groupKeys: Seq[String],
            metrics: Seq[String]): DataFrame = {
    val s = sign
    retractionBatch.groupBy(groupKeys.map(col): _*)
      .agg(sum(s).as("n_rows"),
        metrics.map(m =>
          sum(when(s > 0, col(m)).otherwise(-col(m))).as(s"sum_$m")): _*)
  }

  /** Fold a delta into the state: one keyed shuffle of state ∪ delta.
    * Emptied groups drop out; a group driven negative raises. Sum
    * columns are cast back to the state's own types so chained merges
    * cannot walk decimal precision upward generation by generation. */
  def merge(state: DataFrame, deltaDf: DataFrame,
            groupKeys: Seq[String], metrics: Seq[String]): DataFrame = {
    val sumTypes = metrics.map(m =>
      m -> state.schema(s"sum_$m").dataType).toMap
    val merged = state.unionByName(deltaDf)
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        metrics.map(m => sum(col(s"sum_$m")).as(s"sum_$m")): _*)
    val checked = merged.withColumn("n_rows",
      when(col("n_rows") < 0, raise_error(concat(
        lit("rollup: group count went negative — changelog retracts "),
        lit("rows absent from the state")))).otherwise(col("n_rows")))
    checked.filter(col("n_rows") > 0)
      .select((groupKeys.map(col) :+ col("n_rows")) ++
        metrics.map(m =>
          col(s"sum_$m").cast(sumTypes(m)).as(s"sum_$m")): _*)
  }

  /** Aggregate state WITH extrema — [[init]]'s additive columns plus
    * `min_<m>`/`max_<m>` per metric. Pair with [[foldWithExtrema]]. */
  def initWithExtrema(snapshot: DataFrame, groupKeys: Seq[String],
                      metrics: Seq[String]): DataFrame =
    snapshot.groupBy(groupKeys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        metrics.flatMap(m => Seq(sum(col(m)).as(s"sum_$m"),
          min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m"))): _*)

  /** Fold a retraction batch into extrema-carrying state. MIN/MAX are
    * not retractable from the state alone — dropping the current min
    * needs the runner-up, which only base history knows — so the fold
    * splits the work (the standard complement to the retract-stream
    * design):
    *
    *   - additive columns (count, sums) fold exactly as [[merge]];
    *   - INSERTS extend extrema in-state (`least`/`greatest` — an
    *     insert can only push an extremum outward);
    *   - DELETES (and update before-images) that TOUCH a current
    *     extremum mark the group for repair, and ONLY those groups are
    *     re-aggregated from `base` — the post-batch table — via a
    *     key-pruned semi join (partition-pruned further when the lake
    *     is laid out on a group-key prefix).
    *
    * Cost: |state| + |batch| for the fold, plus one scan of base
    * RESTRICTED to repair groups — the groups whose extremum was
    * deleted, typically a sliver. `base` must reflect the table AFTER
    * this batch applied (the caller owns that contract: repair reads
    * current truth, exactly like the reference's ClickHouse
    * collapsing-sink re-SELECT path). */
  def foldWithExtrema(state: DataFrame, retractionBatch: DataFrame,
                      base: DataFrame, groupKeys: Seq[String],
                      metrics: Seq[String]): DataFrame = {
    val additiveState = state.select(
      (groupKeys.map(col) :+ col("n_rows")) ++
        metrics.map(m => col(s"sum_$m")): _*)
    val additive = merge(additiveState,
      delta(retractionBatch, groupKeys, metrics), groupKeys, metrics)

    val s = sign
    val extAggs = metrics.flatMap(m => Seq(
      min(when(s > 0, col(m))).as(s"ins_min_$m"),
      max(when(s > 0, col(m))).as(s"ins_max_$m"),
      min(when(s < 0, col(m))).as(s"del_min_$m"),
      max(when(s < 0, col(m))).as(s"del_max_$m")))
    val batchExt = retractionBatch.groupBy(groupKeys.map(col): _*)
      .agg(extAggs.head, extAggs.tail: _*)

    val stateExt = state.select(
      groupKeys.map(col) ++
        metrics.flatMap(m => Seq(col(s"min_$m"), col(s"max_$m"))): _*)
    val joined = stateExt.join(batchExt, groupKeys, "full_outer")
    // a deleted value can only EQUAL an extremum when the changelog is
    // consistent; <=/>= keeps the guard safe under any drift. A group
    // with deletes but NO state extrema (created and retracted within
    // one batch — e.g. insert then update) must also repair: its
    // ins_min/ins_max include the retracted before-images.
    val needsRepair = metrics.map(m =>
      col(s"del_min_$m").isNotNull && (col(s"min_$m").isNull ||
        col(s"del_min_$m") <= col(s"min_$m") ||
        col(s"del_max_$m") >= col(s"max_$m")))
      .reduce(_ || _)

    val repairKeys = joined.filter(needsRepair)
      .select(groupKeys.map(col): _*)
    val mmAggs = metrics.flatMap(m => Seq(min(col(m)).as(s"min_$m"),
      max(col(m)).as(s"max_$m")))
    val repaired = base.join(repairKeys, groupKeys, "left_semi")
      .groupBy(groupKeys.map(col): _*)
      .agg(mmAggs.head, mmAggs.tail: _*)
    // least/greatest skip NULL: a new group takes the insert extrema, an
    // untouched group keeps the state's
    val folded = joined.filter(!needsRepair).select(
      groupKeys.map(col) ++ metrics.flatMap(m => Seq(
        least(col(s"min_$m"), col(s"ins_min_$m")).as(s"min_$m"),
        greatest(col(s"max_$m"), col(s"ins_max_$m")).as(s"max_$m"))): _*)

    additive.join(folded.unionByName(repaired), groupKeys, "left")
      .select((groupKeys.map(col) :+ col("n_rows")) ++
        metrics.flatMap(m => Seq(col(s"sum_$m"), col(s"min_$m"),
          col(s"max_$m"))): _*)
  }

  /** Continuously-maintained aggregate: fold one changelog batch into
    * a parquet-persisted state — the `foreachBatch` body of a streaming
    * rollup. The state is group-cardinality-sized, so it is rewritten
    * whole each fold behind a two-phase swap (write .tmp → move live
    * aside to .bak → move .tmp in → drop .bak); a crash at any point
    * leaves either the old state or a recoverable .bak, never a torn
    * directory. Pass foreachBatch's `batchId` for exactly-once under
    * replay: the id is written INSIDE the new state dir before the
    * swap, so it travels atomically with the rename — a replayed batch
    * that already folded (crash after swap, before the streaming
    * checkpoint committed) is detected and skipped, never applied
    * twice. Returns the post-fold state. */
  def fold(spark: org.apache.spark.sql.SparkSession, statePath: String,
           retractionBatch: DataFrame, groupKeys: Seq[String],
           metrics: Seq[String], batchId: Long = -1L): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(statePath)
    val fs = live.getFileSystem(conf)
    val bak = new org.apache.hadoop.fs.Path(statePath + ".bak")
    val tmp = new org.apache.hadoop.fs.Path(statePath + ".tmp")
    // crash recovery: a .bak with no live state means the previous
    // fold died between its two moves — restore the pre-fold state
    if (fs.exists(bak) && !fs.exists(live)) fs.rename(bak, live)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // replay detection: the live state already carries this batch id
    val marker = new org.apache.hadoop.fs.Path(live, "_graft_batch")
    if (batchId >= 0 && fs.exists(marker)) {
      val in = fs.open(marker)
      val folded =
        try new String(in.readAllBytes(), "UTF-8").trim.toLong
        finally in.close()
      if (folded == batchId) return spark.read.parquet(statePath)
    }

    val d = delta(retractionBatch, groupKeys, metrics)
    val next =
      if (fs.exists(live)) merge(spark.read.parquet(statePath), d,
        groupKeys, metrics)
      else // bootstrap: the delta IS the state (negative counts raise)
        d.withColumn("n_rows", when(col("n_rows") < 0, raise_error(
            lit("rollup: bootstrap batch retracts rows absent from " +
              "the (empty) state"))).otherwise(col("n_rows")))
          .filter(col("n_rows") > 0)
    next.write.mode("overwrite").parquet(tmp.toString)
    if (batchId >= 0) {
      // underscore-prefixed, so parquet readers ignore it like _SUCCESS
      val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_graft_batch"))
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    }
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(live)) fs.rename(live, bak)
    fs.rename(tmp, live)
    fs.delete(bak, true)
    spark.read.parquet(statePath)
  }

  private val BucketCol = graft.streaming.CdcStream.BucketCol
  private val Marker = "_graft_batch"
  private val FreshManifest = "_graft_fresh"
  private val ManifestEnd = "#end"
  private val CommitSentinel = "_graft_done"

  private def readSmallFile(fs: org.apache.hadoop.fs.FileSystem,
                            p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Parse the fresh-item manifest: `batch=<id>`, one fresh name per
    * line, `#end` terminator. A file missing the terminator or the
    * header is a torn direct-write (only possible on stores without
    * atomic rename, and only while the manifest itself was being
    * written — i.e. before ANY rename happened) and is treated as
    * absent, so recovery never acts on a truncated name list. */
  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                           bak: org.apache.hadoop.fs.Path)
      : Option[(Long, Seq[String])] = {
    val p = new org.apache.hadoop.fs.Path(bak, FreshManifest)
    if (!fs.exists(p)) None
    else {
      val lines = readSmallFile(fs, p).split("\n")
        .map(_.trim).filter(_.nonEmpty).toSeq
      if (lines.isEmpty || lines.last != ManifestEnd ||
          !lines.head.startsWith("batch=")) None
      else scala.util.Try(lines.head.stripPrefix("batch=").toLong)
        .toOption.map(b => (b, lines.slice(1, lines.length - 1)))
    }
  }

  /** Tear down `.bak` in an order recovery can always interpret:
    * bucket backups first, then the manifest, then the commit sentinel
    * LAST, then the dir itself. The sentinel (written at the commit
    * point, before any backup is deleted) outlives everything else, so
    * a crash anywhere mid-teardown leaves a `.bak` recovery recognises
    * as committed and resumes tearing down — never a live manifest over
    * already-deleted backups that a rollback would misread, deleting
    * committed fresh buckets it can no longer restore. The id-based
    * commit check covers marked folds; the sentinel covers
    * `batchId = -1` folds, whose manifest header can never match a
    * root marker. */
  private def deleteBakOrdered(fs: org.apache.hadoop.fs.FileSystem,
                               bak: org.apache.hadoop.fs.Path): Unit =
    if (fs.exists(bak)) {
      fs.listStatus(bak).foreach { st =>
        val n = st.getPath.getName
        if (!n.startsWith(FreshManifest) && n != CommitSentinel)
          fs.delete(st.getPath, true)
      }
      fs.delete(new org.apache.hadoop.fs.Path(bak, FreshManifest), false)
      fs.delete(new org.apache.hadoop.fs.Path(bak, CommitSentinel), false)
      fs.delete(bak, true)
      ()
    }

  /** [[fold]] for HIGH-cardinality rollups (per-user, per-document):
    * the flat fold rewrites the whole group-cardinality-sized state
    * every batch, which stops being acceptable once groups number in
    * the billions. This variant lays the state out as
    * `statePath/__bucket=i/` dirs keyed by a stable group-key hash
    * (the same md5 layout [[graft.streaming.CdcStream.mergeBatch]]
    * uses for replication state) and a fold
    *
    *   - aggregates the BATCH into a signed delta (map-side combined),
    *   - reads ONLY the buckets its delta touches,
    *   - merges and rewrites ONLY those buckets behind a two-phase
    *     bucket swap —
    *
    * so rewrite I/O scales with the batch's key spread, never total
    * group cardinality. Unlike the replication MERGE (last-write-wins,
    * idempotent under replay) an aggregate fold is NOT idempotent, so
    * the replay marker swaps WITH the buckets: it moves into `.bak`
    * beside the displaced state and is rewritten only after the new
    * buckets land. Affected items with NO pre-fold state (every bucket
    * on the bootstrap fold, any new-key bucket later, the marker on the
    * first marked fold) are named in a fresh-item manifest written into
    * `.bak` before any rename, so recovery can delete their folded
    * copies from the root. The manifest header records this fold's
    * batch id: recovery compares it with the root marker to tell a
    * crash mid-swap (roll back, batch replays and folds once) from a
    * crash mid-cleanup after the marker committed (resume the
    * teardown, replay detected and skipped) — so a crash anywhere
    * leaves either the pre-fold state + pre-fold marker or the
    * post-fold state + post-fold marker, never a mix. */
  def foldBucketed(spark: org.apache.spark.sql.SparkSession,
                   statePath: String, retractionBatch: DataFrame,
                   groupKeys: Seq[String], metrics: Seq[String],
                   numBuckets: Int = 64, batchId: Long = -1L): DataFrame = {
    val d = delta(retractionBatch, groupKeys, metrics)
      .withColumn(BucketCol,
        graft.streaming.CdcStream.bucketOf(groupKeys, numBuckets))
    foldBucketedCore(spark, statePath, groupKeys, numBuckets, batchId,
      delta(retractionBatch, groupKeys, metrics).schema, d) {
      case None =>
        d.drop(BucketCol)
          .withColumn("n_rows", when(col("n_rows") < 0, raise_error(
              lit("rollup: batch retracts rows absent from the state")))
            .otherwise(col("n_rows")))
          .filter(col("n_rows") > 0)
      case Some(existing) =>
        merge(existing, d.drop(BucketCol), groupKeys, metrics)
    }
  }

  /** [[foldBucketed]] with extrema maintenance — the bucketed-state
    * composition of [[foldWithExtrema]]: count/sum fold as signed
    * deltas, inserts extend min/max in-state, groups whose delete
    * touched a current extremum re-aggregate min/max from `base` (the
    * post-batch table) via a key-pruned semi join — and the state swap
    * reads/rewrites ONLY the buckets the batch touches, so rewrite I/O
    * follows the batch's key spread while repair I/O follows the
    * deleted-extremum sliver. State schema: groupKeys, n_rows,
    * sum_/min_/max_ per metric. */
  def foldBucketedWithExtrema(spark: org.apache.spark.sql.SparkSession,
                              statePath: String, retractionBatch: DataFrame,
                              base: DataFrame,
                              groupKeys: Seq[String], metrics: Seq[String],
                              numBuckets: Int = 64,
                              batchId: Long = -1L): DataFrame = {
    // aggregation of a zero-row frame: schema-only empty state, the
    // bootstrap stand-in (foldWithExtrema handles an empty state —
    // created-and-retracted groups go through base repair)
    val emptyState = initWithExtrema(base.limit(0), groupKeys, metrics)
    val batchKeyed = retractionBatch.withColumn(BucketCol,
      graft.streaming.CdcStream.bucketOf(groupKeys, numBuckets))
    foldBucketedCore(spark, statePath, groupKeys, numBuckets, batchId,
      emptyState.schema, batchKeyed) { existing =>
      // batchKeyed (the core's persisted probe) minus the layout column
      // IS the retraction batch — reuse the cache instead of rescanning
      foldWithExtrema(existing.getOrElse(emptyState),
        batchKeyed.drop(BucketCol), base, groupKeys, metrics)
    }
  }

  /** The shared bucketed-state fold machinery: crash recovery, replay
    * detection, touched-bucket discovery from `probe` (any frame
    * carrying [[BucketCol]] for every touched group), the
    * `next(existingAffectedState)` computation, and the two-phase
    * bucket swap. `next` receives None on bootstrap (no affected
    * bucket exists yet), otherwise the affected buckets' state without
    * the layout column, and returns the replacement rows for exactly
    * those buckets' groups. */
  private def foldBucketedCore(spark: org.apache.spark.sql.SparkSession,
                               statePath: String, groupKeys: Seq[String],
                               numBuckets: Int, batchId: Long,
                               stateSchema: org.apache.spark.sql.types.StructType,
                               probe: DataFrame)
                              (next: Option[DataFrame] => DataFrame)
      : DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(conf)
    val bak = new org.apache.hadoop.fs.Path(statePath + ".bak")
    val tmp = new org.apache.hadoop.fs.Path(statePath + ".tmp")
    val marker = new org.apache.hadoop.fs.Path(root, Marker)

    // crash recovery: a leftover .bak means a previous swap died
    // mid-flight. The .bak restore alone only covers buckets that
    // EXISTED pre-fold; an affected bucket with no pre-fold state (every
    // bucket on the bootstrap fold, any new group-key bucket later) has
    // no .bak counterpart, so a folded copy left in the root would
    // survive restore and double-count on replay. The fresh-item
    // manifest (written into .bak before any rename) names exactly
    // those: delete them from the root first — any root copy can only
    // be a post-fold rename, since the item did not exist pre-fold —
    // then restore everything .bak holds. Either way the state is
    // exactly pre-fold; the unfinished batch never reached its
    // checkpoint and will replay.
    if (fs.exists(bak)) {
      // Did the interrupted fold reach its commit point (root marker
      // written with ITS batch id, recorded in the manifest header)?
      // If so only the .bak teardown crashed: resume the teardown —
      // rolling back here would restore pre-fold state under a
      // post-fold marker and the replayed batch would be skipped,
      // silently losing it.
      val manifest = readManifest(fs, bak)
      val rootBatch =
        if (fs.exists(marker))
          scala.util.Try(readSmallFile(fs, marker).trim.toLong).toOption
        else None
      // committed = the id check (marked folds) OR the commit sentinel
      // (covers batchId = -1, where the header can never match a marker)
      val committed = ((manifest, rootBatch) match {
        case (Some((b, _)), Some(rb)) => b >= 0 && b == rb
        case _ => false
      }) || fs.exists(new org.apache.hadoop.fs.Path(bak, CommitSentinel))
      if (committed) deleteBakOrdered(fs, bak)
      else {
        manifest.foreach { case (_, fresh) =>
          fresh.foreach { name =>
            val p = new org.apache.hadoop.fs.Path(root, name)
            if (fs.exists(p)) fs.delete(p, true)
          }
        }
        fs.listStatus(bak).foreach { st =>
          if (!st.getPath.getName.startsWith(FreshManifest)) {
            val dst = new org.apache.hadoop.fs.Path(root, st.getPath.getName)
            if (fs.exists(dst)) fs.delete(dst, true)
            fs.rename(st.getPath, dst)
            ()
          }
        }
        deleteBakOrdered(fs, bak)
      }
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // stateSchema is analysis-only (no job): lets the two internal
    // reads below return a typed empty frame when a fold has retracted
    // the entire state (marker present, no buckets)
    val expectedSchema = Some(stateSchema)
    if (batchId >= 0 && fs.exists(marker)) {
      val folded =
        scala.util.Try(readSmallFile(fs, marker).trim.toLong)
          .getOrElse(-1L)
      if (folded == batchId)
        return readBucketed(spark, statePath, expectedSchema)
    }

    val d = probe.persist()
    // the touched-bucket set is <= numBuckets rows — driver-cheap
    val affected = d.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val existingPaths = affected
      .map(i => new org.apache.hadoop.fs.Path(root, s"$BucketCol=$i"))
      .filter(fs.exists(_)).map(_.toString)
    val nextState = next(
      if (existingPaths.isEmpty) None
      else Some(spark.read.option("basePath", statePath)
        .parquet(existingPaths: _*).drop(BucketCol)))
    // repartition on the bucket BEFORE partitionBy (tasks x buckets
    // small-file explosion otherwise), keys sorted within for stats
    val out = nextState.withColumn(BucketCol,
      graft.streaming.CdcStream.bucketOf(groupKeys, numBuckets))
    out.repartition(
        math.min(numBuckets,
          spark.sessionState.conf.numShufflePartitions),
        col(BucketCol))
      .sortWithinPartitions((col(BucketCol) +: groupKeys.map(col)): _*)
      .write.partitionBy(BucketCol).parquet(tmp.toString)
    d.unpersist()

    if (!fs.exists(root)) fs.mkdirs(root)
    fs.mkdirs(bak)
    // fresh-item manifest FIRST, before any rename: names every
    // affected item with no pre-fold state (recovery must delete those
    // from the root — they cannot be restored from .bak)
    val freshNames =
      affected.map(i => s"$BucketCol=$i")
        .filterNot(n => fs.exists(new org.apache.hadoop.fs.Path(root, n))) ++
      (if (fs.exists(marker)) Nil else Seq(Marker))
    // header carries THIS fold's batch id (recovery's commit check);
    // temp-create + rename makes the manifest appear atomically, and
    // the #end terminator guards stores whose rename is copy+delete
    val manifestTmp =
      new org.apache.hadoop.fs.Path(bak, FreshManifest + ".tmp")
    val fo = fs.create(manifestTmp)
    try fo.write((s"batch=$batchId" +: freshNames :+ ManifestEnd)
      .mkString("\n").getBytes("UTF-8"))
    finally fo.close()
    fs.rename(manifestTmp,
      new org.apache.hadoop.fs.Path(bak, FreshManifest))
    affected.foreach { i =>
      val dst = new org.apache.hadoop.fs.Path(root, s"$BucketCol=$i")
      if (fs.exists(dst)) {
        fs.rename(dst, new org.apache.hadoop.fs.Path(bak, s"$BucketCol=$i"))
        ()
      }
    }
    // the marker swaps WITH the buckets: pre-fold marker rides in .bak
    if (fs.exists(marker)) {
      fs.rename(marker, new org.apache.hadoop.fs.Path(bak, Marker)); ()
    }
    affected.foreach { i =>
      val src = new org.apache.hadoop.fs.Path(tmp, s"$BucketCol=$i")
      val dst = new org.apache.hadoop.fs.Path(root, s"$BucketCol=$i")
      if (fs.exists(src)) { fs.rename(src, dst); () }
    }
    if (batchId >= 0) {
      val o = fs.create(marker)
      try o.write(batchId.toString.getBytes("UTF-8")) finally o.close()
    }
    // commit point reached (post-fold buckets + marker live in root):
    // stamp the sentinel BEFORE any backup is deleted, so a crash
    // anywhere in the teardown below is recognised as committed and
    // resumed, never rolled back over partially-deleted backups
    fs.create(new org.apache.hadoop.fs.Path(bak, CommitSentinel)).close()
    deleteBakOrdered(fs, bak)
    fs.delete(tmp, true)
    readBucketed(spark, statePath, expectedSchema)
  }

  /** Read a bucketed rollup state without its layout column. An absent
    * or empty dir is an empty state (bootstrap not yet run): when
    * `schema` gives the expected post-read shape (group keys + n_rows +
    * sum columns) an empty frame with that schema is returned;
    * without it a pre-bootstrap probe fails loudly rather than letting
    * `spark.read.parquet` throw its opaque path/infer error. */
  def readBucketed(spark: org.apache.spark.sql.SparkSession,
                   statePath: String,
                   schema: Option[org.apache.spark.sql.types.StructType] =
                     None): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBuckets = fs.exists(root) && fs.listStatus(root)
      .exists(_.getPath.getName.startsWith(s"$BucketCol="))
    if (hasBuckets) spark.read.parquet(statePath).drop(BucketCol)
    else schema match {
      case Some(s) =>
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], s)
      case None => throw new IllegalStateException(
        s"rollup: no bucketed state at $statePath (bootstrap not yet " +
          "run) — pass the expected schema to read it as empty")
    }
  }
}
