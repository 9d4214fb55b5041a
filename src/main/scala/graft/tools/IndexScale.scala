package graft.tools

import org.apache.spark.sql.functions._

/** Fresh-sf ladder driver for the standing-index operators (r13
  * verdict task 5): the bench rows `containment_incremental` /
  * `embed_near_dups_incremental` are fixture-pinned for their exact
  * DuckDB oracles (the containment row uses a 150-doc corpus so the
  * naive all-pairs oracle stays computable), so their sfN wall is all
  * fixed overhead and says nothing about scale. This probe drives the
  * OPERATORS over the full corpus of a scale dir — the documents /
  * embeddings tables, split into `batches` incremental updates against
  * a fresh index lake — and prints one JSON line per run:
  * total seconds, per-update seconds, and the cumulative pair count.
  *
  * Usage:
  *   runMain graft.tools.IndexScale <sfDir> containment [batches] [group] [limit]
  *   runMain graft.tools.IndexScale <sfDir> embedding   [batches] [group] [limit]
  *
  * `limit` (default: all): stop after this many UPDATES — a ladder
  * SEGMENT at contract batch sizes (batch size is corpus/batches, so a
  * 60-update segment at 300 staged batches keeps the 1.67k-doc
  * contract batch without paying the full-corpus run).
  *
  * `group` (containment only, default 1): feed the index `group`
  * arrived batches per update via
  * [[graft.functions.Dedup.containmentIndexUpdateMany]] — the
  * micro-batch amortization of the update's one full-lake probe scan
  * (r15). Same arrival stream, same cumulative pair set (law-tested);
  * the ladder's k-vs-1 total ratio is the measured amortization.
  *
  * Run once at sf0.1 and once at a ScaleUp fresh-sf10 dir; the ratio
  * of totals is the ladder entry (100x data → the sub-linear bar).
  */
object IndexScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val op = args(1)
    val batches = if (args.length > 2) args(2).toInt else 3
    val group = if (args.length > 3) args(3).toInt else 1
    require(group == 1 || op == "containment",
      "group > 1 is the containment updateMany knob")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors()))
    val spark = graft.GraftSession.init(graft.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      // the containment update BROADCASTS the batch's postings (the
      // ingest-batch-sized-by-contract side); a 16k-doc batch's
      // postings serialize past the 1g default collect limit, which is
      // a driver-memory budget, not a plan smell — a 48g ladder driver
      // carries a 4g build the same way real fat executors would
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // scratch root keyed by (op, sfDir): two ladder runs at different
    // scale factors must not share a feed/index tree — a concurrent
    // sf0.1 base run once deleted a live sf10 run's lake mid-flight
    // and both appended to one index (679 "pairs" from a 512-pair
    // corpus — a corrupted-measurement foot-gun, not an operator bug)
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val gTag = if (group > 1) s"_g$group" else ""
    val base = s"/tmp/graft_idxscale_${op}_$sfTag$gTag"
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    // stage the feed ONCE, partitioned by batch id — the continuous-
    // crawl contract: each timed update reads only ITS batch directory
    // (a per-update pmod over the full corpus would charge every
    // update a whole-corpus scan, 300x at sf10, and measure the
    // probe's own waste instead of the operator)
    val (table, idCol) = op match {
      case "containment" => ("documents", "doc_id")
      case "embedding" => ("embeddings", "vec_id")
      case other => sys.error(s"unknown op: $other")
    }
    graft.Tables.load(spark, sfDir, table)
      .withColumn("__b", pmod(col(idCol), lit(batches)))
      .write.partitionBy("__b").parquet(s"$base/feed")
    var pairs = 0L
    val limit = if (args.length > 4) args(4).toInt else Int.MaxValue
    val nUpdates = math.min((batches + group - 1) / group, limit)
    val updateSecs = (0 until nUpdates).map { m =>
      val batchIds = (m * group until math.min((m + 1) * group, batches))
      val batch = spark.read.parquet(s"$base/feed/__b=${batchIds.head}")
      // snapshot what was deliberately cached BEFORE the update so the
      // residue sweep below can unpersist only the update's own
      // localCheckpoint leavings — a blanket sweep would silently evict
      // any future cross-update cached frame and recompute it inside
      // the next timed region, skewing the ladder (ADVICE r15)
      val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val found = op match {
        case "containment" if group > 1 =>
          graft.functions.Dedup.containmentIndexUpdateMany(
            s"$base/idx",
            batchIds.map(b => spark.read.parquet(s"$base/feed/__b=$b")
              .select(col(idCol), col("text"))),
            "text", idCol, shingleN = 3, theta = 0.8,
            // group-scaled postings cap: the union is what broadcasts
            maxBatchPostings = 10000000L * group)
        case "containment" =>
          graft.functions.Dedup.containmentIndexUpdate(
            s"$base/idx", batch.select(col(idCol), col("text")),
            "text", idCol, shingleN = 3, theta = 0.8)
        case "embedding" =>
          // explicit large cap (as Stress.scala's sfN runs use): with
          // the r14 fail-fast over-cap behavior the DEFAULT 10k cap
          // would abort the whole ladder on one hot sign-LSH bucket at
          // larger scale factors, losing the partial trajectory this
          // tool exists to collect (ADVICE r14)
          graft.functions.Dedup.embeddingIndexUpdate(
            s"$base/idx", batch, "embedding", idCol,
            planes = 8, minCos = 0.95, maxBucketSize = 1000000)
      }
      pairs += found.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // between-update hygiene, OUTSIDE the timer (the Bench.scala r14
      // discipline applied to the ladder): every update's found-pairs
      // frame is an eager localCheckpoint — a PERSISTENT RDD that
      // clearCache never drops — so a 40-update segment pins 40 of
      // them in the storage pool. Unpersist after the count so each
      // update is measured against a clean pool, the way a real
      // per-batch ingest JVM would run. NOTE this is residue hygiene,
      // not a spike fix: the r15 A/B's 60-300 s outlier updates
      // appear with and without it, and /proc/stat shows ~100%-idle
      // zero-iowait windows during them — the sandbox host parks the
      // whole VM. Ladder conclusions must therefore read the
      // per-decile MEDIANS, never single-update walls or raw totals.
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (rddId, _) => pinnedBefore(rddId) }
        .values.foreach(_.unpersist(blocking = false))
      System.gc()
      // incremental emission: a trajectory is readable even from a
      // truncated run (per-update cost vs lake size IS the ladder
      // signal for a scan-probed standing index)
      println(f"update=$m sec=$sec%.2f cum_pairs=$pairs")
      // the documented operational discipline, exercised: every 10
      // updates run the index's maintenance compaction OFF the update
      // path (timed separately) — without it the per-update probe
      // reads turn listing-bound (measured: 4.5 -> ~25 s by update 24
      // at ~50 MB of actual bytes, growth tracking FILE COUNT)
      if (m % 10 == 9) {
        val c0 = System.nanoTime()
        op match {
          case "containment" =>
            graft.functions.Dedup.containmentIndexCompact(spark, s"$base/idx")
          case "embedding" =>
            graft.functions.Dedup.embeddingIndexCompact(spark, s"$base/idx")
        }
        println(f"compact_after=$m sec=${(System.nanoTime() - c0) / 1e9}%.2f")
      }
      sec
    }
    def r3(v: Double) = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def dec(xs: Seq[Double]) = r3(xs.sum / xs.length)
    val (firstDec, lastDec) = (updateSecs.take(math.max(1, nUpdates / 10)),
      updateSecs.takeRight(math.max(1, nUpdates / 10)))
    println(s"""{"op":"$op","sf":"$sfDir","batches":$batches,""" +
      s""""group":$group,""" +
      s""""total_sec":${r3(updateSecs.sum)},""" +
      s""""first_decile_avg":${dec(firstDec)},""" +
      s""""last_decile_avg":${dec(lastDec)},""" +
      s""""update_secs":[${updateSecs.map(r3).mkString(",")}],""" +
      s""""pairs":$pairs}""")
    spark.stop()
    sys.exit(0)
  }
}
