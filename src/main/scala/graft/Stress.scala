package graft

import org.apache.spark.sql.functions._

/** Scale stress harness for the paths reworked this round — synthetic
  * data well beyond the fixtures (the fixtures cap at 5k documents), so
  * the quadratic/shuffle behavior is actually exercised. Prints one
  * timing line per case. Usage: `sbt "runMain graft.Stress"`.
  */
object Stress {
  private def timed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. hot-shingle cap: 100k docs ALL sharing one stop-shingle prefix.
    // Uncapped, that one shingle alone is 5e9 pairs; the df cap must
    // keep the job linear.
    val docs = spark.range(100000).select(col("id").as("doc_id"),
      concat(lit("the quick brown fox jumps over "),
        col("id").cast("string"), lit(" unique tail words here")).as("text"))
    val nPairs = timed("ngramJaccardPairs 100k docs + universal stop-shingle (maxDf=1000)") {
      functions.Dedup.ngramJaccardPairs(docs, "text", "doc_id").count()
    }
    println(s"[stress]   pairs=$nPairs (bounded; uncapped would be ~5e9)")

    // 2. IVF cell assignment as pure projection: 500k x 64-dim corpus,
    // 16 cells — zero shuffle on the corpus path.
    val vecs = spark.range(500000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(col("id") * (i + 17L) * 2654435761L, lit(997L)) + 1)
          .cast("float")).as("embedding"))
    val cents = timed("fitCentroids 500k x 64d, k=16, 1 iter") {
      val c = functions.Similarity.fitCentroids(vecs, "embedding", "vec_id",
        k = 16, iterations = 1)
      c.count(); c
    }
    val assignPlan = functions.Similarity
      .ivfAssign(vecs, cents, "embedding", "vec_id")
      .queryExecution.executedPlan.toString
    require(!assignPlan.contains("Exchange"),
      "ivfAssign must stay a pure projection")
    timed("ivfAssign 500k x 64d -> 16 cells (pure projection)") {
      functions.Similarity.ivfAssign(vecs, cents, "embedding", "vec_id")
        .write.format("noop").mode("overwrite").save()
    }
    timed("ivfTopK 100 queries vs 500k corpus, k=10, nprobe=2") {
      functions.Similarity.ivfTopK(vecs.filter(col("vec_id") < 100), vecs,
        cents, "embedding", "vec_id", k = 10, nprobe = 2)
        .write.format("noop").mode("overwrite").save()
    }

    // 3. SQ8 disk-ANN composition: quantize the 500k corpus (pure
    // projection), reconstruct, probe. The quantize+dequant plan must
    // stay Exchange-free like ivfAssign.
    val qz = functions.Similarity.quantizeInt8(vecs, "embedding", "vec_id")
    require(!qz.queryExecution.executedPlan.toString.contains("Exchange"),
      "quantizeInt8 must stay a pure projection")
    timed("quantizeInt8 500k x 64d (pure projection)") {
      qz.write.format("noop").mode("overwrite").save()
    }
    timed("ivfTopK over SQ8-reconstructed 500k corpus, 100 queries") {
      // MATERIALIZE the reconstruction before assignment (a real
      // pipeline reads reconstructed vectors back from the SQ8 store).
      // Feeding the dequant EXPRESSION straight into ivfTopK is a
      // measured scale trap: Catalyst's projection collapse inlines it
      // into bestCell's per-centroid expressions — k=16 interpreted
      // re-evaluations per row (higher-order array lambdas never enter
      // whole-stage codegen) — turning a ~30s probe into >10 minutes.
      val corpus = qz.select(col("vec_id"),
        functions.Similarity.dequantInt8(col("codes"), col("q_lo"),
          col("q_scale")).as("embedding")).localCheckpoint()
      functions.Similarity.ivfTopK(vecs.filter(col("vec_id") < 100), corpus,
        cents, "embedding", "vec_id", k = 10, nprobe = 2)
        .write.format("noop").mode("overwrite").save()
    }

    // 4. Compaction: a 2000-file lake directory (the shape a month of
    // micro-batches leaves behind) packed to target size.
    val lake = java.nio.file.Files.createTempDirectory("graft_stress_lake")
      .toString + "/lake"
    timed("write 2000-file lake (5M rows)") {
      spark.range(5000000L).select(col("id"),
        (col("id") % 1000).as("k"), md5(col("id").cast("string")).as("payload"))
        .repartition(2000).write.parquet(lake)
    }
    val stats = timed("compact 2000 files -> 64MB targets") {
      sinks.Sinks.compact(spark, lake, targetBytes = 64L << 20)
    }
    println(s"[stress]   $stats")
    require(stats.filesAfter < 64, s"compaction left ${stats.filesAfter} files")

    // 5. Line dedup with a UNIVERSAL boilerplate line: 200k docs, every
    // one sharing the same 10-token header — the hottest possible fp.
    // The min-struct groupBy must reduce the 200k occurrences map-side
    // (a row_number window would sort them all inside one task).
    val ldocs = spark.range(200000).select(col("id").as("doc_id"),
      concat(lit("shared header line one two three four five six seven "),
        lit("unique body "), col("id").cast("string"),
        lit(" tail words for this document only padding out the line"))
        .as("text"))
    timed("lineDedup 200k docs, one universal boilerplate line") {
      val out = functions.TextAnalysis.lineDedup(ldocs, "text", "doc_id")
      out.write.format("noop").mode("overwrite").save()
    }

    // 6. Semantic dedup at 50k vectors / 16 cells (~156M within-cell
    // pairs — the n^2/k quadratic term this operator deliberately
    // bounds by cell). The synthetic corpus has EXACT twins by
    // construction (ids congruent mod 997 repeat the embedding), so a
    // near-1.0 threshold must drop all-but-one per twin class.
    val svecs = vecs.filter(col("vec_id") < 50000)
    val nDropped = timed("semanticDedup 50k x 64d, 16 cells (~156M in-cell pairs)") {
      functions.Dedup.semanticDedup(svecs, cents,
        "embedding", "vec_id", minCos = 0.999999)
        .filter(!col("kept")).count()
    }
    println(s"[stress]   dropped=$nDropped of 50000 (mod-997 twin classes)")
    require(nDropped >= 49003, // 50000 ids - 997 twin classes
      s"expected >= 49003 twin drops, got $nDropped")

    // 7. Token-budget mixture over 2M docs x 20 strata: two scans, two
    // map-side-combined aggs, zero corpus shuffles.
    val bdocs = spark.range(2000000).select(col("id").as("doc_id"),
      concat(lit("s"), (col("id") % 20).cast("string")).as("lang"),
      concat(lit("alpha beta gamma delta epsilon zeta "),
        col("id").cast("string")).as("text"))
    timed("tokenBudgetSummary 2M docs, 20 strata, 30% budget") {
      functions.Sampling.tokenBudgetSummary(bdocs, "text", "lang",
          "doc_id", budgetNum = 3, budgetDen = 10)
        .write.format("noop").mode("overwrite").save()
    }

    // 8. Bigram LM scoring at 200k docs: model "training" (bigram +
    // unigram counts) and scoring joins must all stay map-side-combined
    // key shuffles — no driver model, no corpus broadcast.
    val lmDocs = spark.range(200000).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma "), col("id").cast("string"),
        lit(" delta epsilon "), (col("id") % 97).cast("string"),
        lit(" zeta eta theta iota kappa")).as("text"))
    timed("bigramLmScore 200k docs (~2M bigrams, ~400k distinct)") {
      functions.TextAnalysis.bigramLmScore(lmDocs, "text", "doc_id")
        .write.format("noop").mode("overwrite").save()
    }

    // 9. Cross-snapshot dedup: 1M-doc batch against 2M-doc history with
    // a 50% planted overlap. Join inputs must reduce to fingerprints
    // before the anti-join shuffle.
    val hist = spark.range(2000000).select(col("id").as("doc_id"),
      concat(lit("document body number "), col("id").cast("string")).as("text"))
    val batch = spark.range(1000000).select(
      (col("id") + 10000000L).as("doc_id"),
      concat(lit("document body number "),
        (col("id") + 1500000L).cast("string")).as("text"))
    val kept = timed("crossSnapshotDedup 1M batch vs 2M history (50% dups)") {
      functions.Dedup.crossSnapshotDedup(batch, hist, "text", "doc_id").count()
    }
    require(kept == 500000L, s"expected 500000 survivors, got $kept")

    // 10. HTML extraction at 200k planted pages: the whole strip chain
    // is per-row regex work — must run at scan speed, zero shuffles.
    val pages = spark.range(200000).select(col("id").as("doc_id"),
      concat(lit("<html><head><title>T"), col("id").cast("string"),
        lit("</title><style>p{x}</style></head><body><nav>N</nav>"),
        lit("<script>var x=1;</script><p>body text &amp; entity "),
        col("id").cast("string"), lit("</p><!-- c --></body></html>"))
        .as("html"))
    timed("Html.text 200k pages (regex chain, shuffle-free)") {
      pages.select(col("doc_id"),
        functions.Html.text(col("html")).as("text"))
        .write.format("noop").mode("overwrite").save()
    }

    // 11. Delta checkpoint: 200-commit table — read cost through the
    // checkpoint vs full JSON replay.
    val table = java.nio.file.Files.createTempDirectory("graft_stress_delta")
      .toString + "/t"
    timed("DeltaLite 200 tiny commits (checkpoint every 10)") {
      for (i <- 0 until 200)
        sources.DeltaLite.write(Seq((i.toLong, s"v$i")).toDF("id", "v"), table)
    }
    timed("activeFiles via checkpoint (replays 200->10 json commits)") {
      require(sources.DeltaLite.activeFiles(spark, table).size == 200)
    }

    // 12. As-of join at 5M events vs 500k state rows over 100k keys:
    // one union + one keyed shuffle + per-key sort, state carried is
    // one struct per task — must be sort-merge-join-priced, not
    // nested-loop-priced.
    val evts = spark.range(5000000).select(
      (col("id") % 100000L).as("k"), (col("id") * 7L % 1000000L).as("t"),
      col("id").as("eid"))
    val states = spark.range(500000).select(
      (col("id") % 100000L).as("k"), (col("id") * 13L % 1000000L).as("t"),
      (col("id") % 997L).as("sv"))
      .groupBy("k", "t").agg(max("sv").as("sv"))
    val asofN = timed("AsofJoin 5M x 500k over 100k keys") {
      operators.AsofJoin.join(evts, states, Seq("k"), "t", "t").count()
    }
    require(asofN == 5000000L, s"as-of must keep every left row, got $asofN")

    // 13. Range join: 2M points vs 20k intervals — naive is 4e10
    // pair-evaluations via nested loop; bucketization must keep it to
    // one equi-join shuffle with ~interval-span replication.
    val rpts = spark.range(2000000).select(
      (col("id") % 16L).as("g"),
      (col("id") * 2654435761L % 1000000L).cast("double").as("p"))
    val rivs = spark.range(20000).select(
      (col("id") % 16L).as("g"), col("id").as("iv_id"),
      (col("id") * 48271L % 990000L).cast("double").as("lo"))
      .withColumn("hi", col("lo") + 500.0)
    val rjN = timed("RangeJoin 2M points x 20k intervals (gran=1000)") {
      operators.RangeJoin.pointInterval(rpts, "p", rivs, "lo", "hi",
        granularity = 1000.0, keys = Seq("g")).count()
    }
    println(s"[stress]   contained pairs=$rjN")

    // 14. Checksum at 2M rows with ~0.1% planted defects: one
    // full-outer join; the two-level sample cap keeps the report path
    // skew-proof even though one error class holds 2k keys.
    val csrc = spark.range(2000000).select(col("id"),
      (col("id") % 1009L).cast("double").as("v"),
      concat(lit("s"), (col("id") % 31L).cast("string")).as("s"))
    val cdst = csrc.filter(col("id") % 2003L =!= 0)
      .withColumn("v", when(col("id") % 997L === 0, col("v") + 1.0)
        .otherwise(col("v")))
    val crep = timed("Checksum 2M rows full-outer compare") {
      operators.Checksum.compare(csrc, cdst, Seq("id")).collect()
    }
    require(crep.exists(r => r.getString(0) == "missed key" && r.getLong(2) == 999L),
      crep.mkString("; "))

    // 15. Sketches at 10M rows: fixed-size shuffle state means these
    // must run at scan speed; HLL estimate must land within 3% of the
    // true 1M distincts.
    val wide = spark.range(10000000).select(
      (col("id") % 1000000L).cast("string").as("v"))
    val hllEst = timed("HLL registers over 10M rows (1M distinct)") {
      functions.Sketches.hllEstimate(
        functions.Sketches.hllRegisters(wide, "v"))
    }
    require(math.abs(hllEst - 1e6) / 1e6 < 0.10, s"hll estimate $hllEst")
    timed("KMV sketch over 10M rows") {
      functions.Sketches.kmvSketch(wide, "v").count()
    }

    // 16. Z-order at 2M rows into 64 files: the write is one range
    // shuffle; a 1/16-wide predicate on EITHER dimension must prune
    // most files via the manifest.
    val zdf = spark.range(2000000).select(
      (functions.Hashing.hex8ToLong(concat(lit("zx"), col("id").cast("string"))) % 4096L).as("x"),
      (functions.Hashing.hex8ToLong(concat(lit("zy"), col("id").cast("string"))) % 4096L).as("y"),
      col("id"))
    val zpath = java.nio.file.Files.createTempDirectory("graft_stress_z")
      .toString + "/lake"
    val zman = timed("Z-order write 2M rows -> 64 files + manifest") {
      sinks.ZOrderLake.writeZOrdered(zdf, zpath, Seq("x", "y"), files = 64,
        bits = 12)
    }
    val zcand = sinks.ZOrderLake.candidateFiles(spark, zman, "y", 0, 255).size
    println(s"[stress]   y-slice candidate files: $zcand of 64")
    require(zcand <= 24, s"z-order manifest should prune most files, got $zcand")

    // 17. Bloom file index on the same 2M-row lake: a point probe on
    // the 2M-cardinality id column (min/max manifests prune nothing
    // here) must open a handful of the 64 files.
    val bman = timed("bloomManifest 2M rows, 64 files, 256k bits") {
      sinks.ZOrderLake.bloomManifest(spark, zpath, "id", bits = 262144)
    }
    val bcand = sinks.ZOrderLake.bloomCandidateFiles(
      spark, bman, "123456", bits = 262144).size
    println(s"[stress]   point-probe candidate files: $bcand of 64")
    require(bcand <= 16, s"bloom index should prune most files, got $bcand")
    val brow = sinks.ZOrderLake.bloomPointRead(
      spark, zpath, bman, "id", "123456", bits = 262144).count()
    require(brow == 1L, s"probe must find exactly its row, got $brow")

    // 17b. Trigram bloom: index 200k ~100-char docs (one |text|-row
    // explode, map-side combined), then a rare-marker probe must open
    // few of the 64 files.
    val tdocs = spark.range(200000).select(col("id"),
      concat(lit("synthetic corpus line with shared vocabulary item "),
        col("id").cast("string"),
        when(col("id") % 50000L === 17L, lit(" xylophoneQuartz"))
          .otherwise(lit(""))).as("text"))
    val tpath = java.nio.file.Files.createTempDirectory("graft_stress_trgm")
      .toString + "/docs"
    tdocs.repartition(64, col("id")).write.mode("overwrite").parquet(tpath)
    val tman = timed("trigramBloomManifest 200k docs x 64 files") {
      sinks.ZOrderLake.trigramBloomManifest(spark, tpath, "text")
    }
    val tcand = sinks.ZOrderLake.trigramCandidateFiles(
      spark, tman, "xylophoneQuartz").size
    println(s"[stress]   substring-probe candidate files: $tcand of 64")
    require(tcand <= 16, s"trigram index should prune most files, got $tcand")
    require(sinks.ZOrderLake.trigramRead(
      spark, tpath, tman, "text", "xylophoneQuartz").count() == 4L)

    // 18. Global index over 10M rows: one range shuffle + zipWithIndex;
    // the single-task window spelling would funnel 10M rows through one
    // core.
    val gidx = timed("GlobalIndex 10M rows") {
      operators.GlobalIndex.byOrder(
        spark.range(10000000).select(
          (col("id") * 2654435761L % 999999937L).as("k")),
        Seq("k"), partitions = 32)
    }
    val gStats = gidx.agg(count(lit(1)), min("global_idx"),
      max("global_idx"), count_distinct(col("global_idx"))).collect().head
    require(gStats.getLong(0) == 10000000L && gStats.getLong(1) == 0L &&
      gStats.getLong(2) == 9999999L && gStats.getLong(3) == 10000000L,
      s"index must be dense 0..N-1: $gStats")

    // 19. Broadcast as-of: 5M events probe a 50k-row state table
    // (500 keys x 100 history entries) with ZERO shuffle of the event
    // side — compare wall-clock with the double-shuffle spelling above.
    val bevts = spark.range(5000000).select(
      (col("id") % 500L).as("k"), (col("id") * 7L % 1000000L).as("t"),
      col("id").as("eid"))
    val bstates = spark.range(50000).select(
      (col("id") % 500L).as("k"), (col("id") * 13L % 1000000L).as("t"),
      (col("id") % 997L).as("sv"))
      .groupBy("k", "t").agg(max("sv").as("sv"))
    val bN = timed("AsofJoinBroadcast 5M x 50k (500 keys, no left shuffle)") {
      operators.AsofJoinBroadcast.join(bevts, bstates, Seq("k"), "t", "t")
        .count()
    }
    require(bN == 5000000L, s"broadcast as-of must keep every left row, got $bN")
    // same inputs through the CUSTOM merge operator: co-partition +
    // sort, then one streaming pass with one candidate row of state
    val bNn = timed("AsOfJoinExec native merge 5M x 50k (single pass)") {
      operators.AsofJoinNative.join(bevts, bstates, Seq("k"), "t", "t")
        .count()
    }
    require(bNn == 5000000L, s"native as-of must keep every left row, got $bNn")

    // 20. Incremental rollup: fold a 1M-row update changelog into a
    // 100k-group state built from 5M rows — the fold's cost is
    // ∝ |state| + |batch|, never the 5M base; recompute cross-check.
    val rbase = spark.range(5000000).select(
      (col("id") % 100000L).as("g"), (col("id") % 1000L).as("v"))
    val rs0 = operators.Rollup.init(rbase, Seq("g"), Seq("v"))
      .persist()
    require(rs0.count() == 100000L)
    val rimg = struct(col("g"), col("v"))
    val rchg = spark.range(1000000).select(
      (col("id") % 100000L).as("g"), (col("id") % 1000L).as("v"))
      .select(rimg.as("before"),
        struct(col("g"), (col("v") + 1L).as("v")).as("after"),
        lit("update").as(graft.model.CdcEnvelope.Kind),
        col("g").as(graft.model.CdcEnvelope.Lsn),
        lit(0).as(graft.model.CdcEnvelope.Counter))
    val rs1 = {
      val d = operators.Rollup.delta(
        operators.Rollup.retractions(rchg), Seq("g"), Seq("v"))
      operators.Rollup.merge(rs0, d, Seq("g"), Seq("v")).persist()
    }
    val rn = timed("Rollup fold 1M updates into 100k-group state") {
      rs1.count() // materializes the fold (persist above is lazy)
    }
    require(rn == 100000L)
    val rexp = operators.Rollup.init(
      spark.range(5000000).select((col("id") % 100000L).as("g"),
        (when(col("id") < 1000000L, col("id") % 1000L + 1L)
          .otherwise(col("id") % 1000L)).as("v")), Seq("g"), Seq("v"))
    require(rs1.except(rexp).count() == 0L &&
      rexp.except(rs1).count() == 0L,
      "incremental fold must equal recompute")
    rs0.unpersist(); rs1.unpersist()

    // 21. Gap fill: 2M irregular observations over 5k keys resampled
    // onto a ~10M-row grid — the sequence-explode grid and the single
    // window pass must both stay key-balanced.
    val gobs = spark.range(2000000).select(
      (col("id") % 5000L).as("k"),
      // `div`, not `/`: Column `/` is double division and a double ts
      // cannot feed sequence()
      expr("(id div 5000) * 10 + (id div 5000) % 3").as("ts"),
      (col("id") % 97L).as("v"))
    val gfill = operators.GapFill.fill(gobs, Seq("k"), "ts",
      step = 2L, Seq("v")).persist()
    val gn = timed("GapFill 2M obs x 5k keys -> ~10M grid rows") {
      gfill.count() // materializes the fill (persist above is lazy)
    }
    require(gn > 9000000L && gn < 11000000L, s"grid size off: $gn")
    require(gfill.filter(col("v").isNull).count() == 0L,
      "every tick at/after the first observation must be filled")
    gfill.unpersist()

    // 22. Bucketed rollup state: 2M groups across 64 bucket dirs; a
    // 1000-group batch must rewrite ONLY the buckets its keys hash to —
    // rewrite I/O ∝ batch key spread, never group cardinality.
    val bkState = "/tmp/graft_stress_rollup_bk/state"
    val bkFs = new org.apache.hadoop.fs.Path(bkState)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    bkFs.delete(new org.apache.hadoop.fs.Path("/tmp/graft_stress_rollup_bk"), true)
    val bImg = struct(col("g"), col("v"))
    val bNullImg = lit(null).cast("struct<g:bigint,v:bigint>")
    def bInserts(df: org.apache.spark.sql.DataFrame) = df.select(
      bNullImg.as("before"), bImg.as("after"),
      lit("insert").as(graft.model.CdcEnvelope.Kind),
      col("g").as(graft.model.CdcEnvelope.Lsn),
      lit(0).as(graft.model.CdcEnvelope.Counter))
    val bBase = spark.range(4000000).select(
      (col("id") % 2000000L).as("g"), (col("id") % 1000L).as("v"))
    timed("foldBucketed bootstrap 4M rows -> 2M groups / 64 buckets") {
      operators.Rollup.foldBucketed(spark, bkState,
        operators.Rollup.retractions(bInserts(bBase)),
        Seq("g"), Seq("v"), numBuckets = 64, batchId = 0L).count()
    }
    def bkMtimes(): Map[String, Long] =
      bkFs.listStatus(new org.apache.hadoop.fs.Path(bkState))
        .filter(_.getPath.getName.startsWith("__bucket"))
        .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val bkBefore = bkMtimes()
    // 30 keys over 64 buckets: a genuinely partial rewrite (~25 dirs);
    // a 1000-key batch would coupon-collect all 64 and prove nothing
    val bBatch = spark.range(30).select(col("id").as("g"), lit(1L).as("v"))
    timed("foldBucketed 30-group batch into 2M-group state") {
      operators.Rollup.foldBucketed(spark, bkState,
        operators.Rollup.retractions(bInserts(bBatch)),
        Seq("g"), Seq("v"), numBuckets = 64, batchId = 1L).count()
    }
    val rewritten = bkMtimes().filter { case (d, t) => bkBefore(d) != t }
    val expectedBk = (0L until 30L).map(g => math.floorMod(
      functions.Hashing.hex8ToLongJvm(String.valueOf(g)), 64L)).toSet
    require(rewritten.keySet ==
      expectedBk.map(b => s"__bucket=$b"),
      s"rewrote ${rewritten.size} buckets, expected ${expectedBk.size}")
    val bkCount = operators.Rollup.readBucketed(spark, bkState).count()
    require(bkCount == 2000000L, s"group count off: $bkCount")
    println(s"[stress]   rewrote ${rewritten.size}/64 buckets for the 30-key batch")

    // 12. product quantization at corpus scale: encode must stay a pure
    // projection (like ivfAssign); ADC search touches only codes on the
    // corpus side — 500k x 8 code lookups, zero corpus float math.
    val pqPlan = functions.Similarity
      .pqEncode(vecs, "embedding", "vec_id")
      .queryExecution.executedPlan.toString
    require(!pqPlan.contains("Exchange"),
      "pqEncode must stay a pure projection")
    timed("pqEncode 500k x 64d -> 8 sub-codes (pure projection)") {
      functions.Similarity.pqEncode(vecs, "embedding", "vec_id")
        .write.format("noop").mode("overwrite").save()
    }
    timed("pqTopK ADC: 100 queries vs 500k coded corpus, k=10") {
      functions.Similarity.pqTopK(vecs.filter(col("vec_id") < 100), vecs,
        "embedding", "vec_id", k = 10)
        .write.format("noop").mode("overwrite").save()
    }

    // 13. Avro OCF: 5M rows through executor-side container writers,
    // read back over sync-marker byte-range splits; then one big
    // coalesced file re-read with small splits to prove intra-file
    // fan-out (the 100 TB shape: few huge files, many tasks).
    val avroDir = "/tmp/graft_stress/avro5m"
    val fiveM = spark.range(5000000).select(col("id"),
      concat(lit("payload-"), col("id").cast("string")).as("s"))
    timed("AvroIO.write 5M rows (32 container files, zstd)") {
      sources.AvroIO.write(fiveM, avroDir)
    }
    timed("AvroIO.read 5M rows back (split-planned)") {
      val back = sources.AvroIO.read(spark, avroDir)
      require(back.count() == 5000000L, "row count drift")
    }
    val avroOne = "/tmp/graft_stress/avro_one"
    timed("AvroIO single-file: write 2M rows as ONE container") {
      sources.AvroIO.write(fiveM.limit(2000000).coalesce(1), avroOne,
        codec = "null")
    }
    timed("AvroIO single-file read with 4MB splits (intra-file fan-out)") {
      val back = sources.AvroIO.read(spark, avroOne,
        maxSplitBytes = 4L * 1024 * 1024)
      require(back.rdd.getNumPartitions > 4, "expected many splits")
      require(back.count() == 2000000L, "split tiling dropped/doubled rows")
    }

    // 14. DSIR weights on 2M docs: the two "models" stay 256-row
    // tables; one (doc, bucket) shuffle + broadcast weight join.
    val dsirDocs = spark.range(2000000).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma delta token"),
        (col("id") % 1000L).cast("string")).as("text"),
      when(col("id") % 10 === 0, "en").otherwise("xx").as("lang"))
    timed("dsirWeights 2M docs, 256 hashed buckets") {
      functions.Sampling.dsirWeights(dsirDocs, "text", "doc_id",
        col("lang") === "en")
        .write.format("noop").mode("overwrite").save()
    }

    // 15. Image dHash near-dup at 2M hashes: band buckets are 16-bit
    // random, so candidates stay ~pair-scale; a planted 100k-copy
    // degenerate image must die at the bucket cap, not explode into
    // 5e9 pairs. Hashes are synthesized directly (the decode kernel is
    // per-row constant work — the LSH join is the scale surface).
    val imgHashes = spark.range(1000000).select(col("id").as("doc_id"),
      // ~95k 10-doc clusters share a hash; 50k rows share ONE value
      when(col("id") < 50000, lit(7))
        .otherwise(pmod(expr("id div 10") * 2654435761L, lit(65536L)))
        .cast("int").as("b0"),
      when(col("id") < 50000, lit(7))
        .otherwise(pmod(expr("id div 10") * 40503L, lit(65536L)))
        .cast("int").as("b1"),
      when(col("id") < 50000, lit(7))
        .otherwise(pmod(expr("id div 10") * 2654435761L + 13L, lit(65536L)))
        .cast("int").as("b2"),
      when(col("id") < 50000, lit(7))
        .otherwise(pmod(expr("id div 10") * 40503L + 29L, lit(65536L)))
        .cast("int").as("b3"))
    val imgPairs = timed("ImageDedup.nearDupPairs 1M hashes + 50k-copy hot image (cap=1000)") {
      functions.ImageDedup.nearDupPairs(imgHashes, maxHamming = 6).count()
    }
    println(s"[stress]   pairs=$imgPairs (hot bucket capped; uncapped would be ~1.2e9)")

    // 16. Incremental band index: 1M-doc corpus arriving as a 900k
    // bootstrap + 100k increment. The increment's probe must broadcast
    // (index side never shuffles) and cost ~batch-scale, not
    // corpus-scale.
    val idxRoot = "/tmp/graft_stress/bandidx"
    new java.io.File(idxRoot).getParentFile.mkdirs()
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(idxRoot), true)
    val corpus1m = spark.range(1000000).select(col("id").as("doc_id"),
      concat(lit("document body token "), (col("id") / 3L).cast("string"),
        lit(" trailing words vary "), col("id").cast("string")).as("text"))
    timed("bandIndexUpdate bootstrap 900k docs") {
      functions.Dedup.bandIndexUpdate(idxRoot,
        corpus1m.filter(col("doc_id") < 900000), "text", "doc_id").count()
    }
    timed("bandIndexUpdate increment 100k docs vs 900k-doc index") {
      functions.Dedup.bandIndexUpdate(idxRoot,
        corpus1m.filter(col("doc_id") >= 900000), "text", "doc_id").count()
    }

    // 17. Bitext mining at corpus x corpus scale: 200k x 200k sides.
    // Exact scoring would be 4e10 pairs; the LSH spelling must (a)
    // never materialize A x B — no nested-loop/cartesian join in the
    // plan — and (b) join bucket-to-bucket WITHOUT broadcasting either
    // corpus-scale side.
    val side = (lo: Long, hi: Long) => spark.range(lo, hi)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => (pmod(col("id") * (i + 17L) * 2654435761L, lit(997L))
            - 498).cast("float")).as("embedding"))
    val mined = functions.Similarity.bitextMineLsh(
      side(0L, 200000L), side(1000000L, 1200000L),
      "embedding", "vec_id", marginFloor = 1.0, planes = 14)
    val minedPlan = mined.queryExecution.executedPlan.toString
    require(!minedPlan.contains("CartesianProduct") &&
      !minedPlan.contains("BroadcastNestedLoopJoin"),
      "bitextMineLsh must never materialize A x B")
    val nMined = timed("bitextMineLsh 200k x 200k (14-plane multiprobe, no broadcast)") {
      mined.count()
    }
    println(s"[stress]   pairs=$nMined (exact spelling would score 4e10 pairs)")

    prefixStress(spark)

    spark.stop()
  }

  /** 18. Prefix-filtered similarity join at 100k docs with a
    * UNIVERSAL hot shingle. The grouped-combinations verify would put
    * the hot shingle's 5e9-pair group through the quadratic explode
    * (it OOM'd exactly there before the candidate-keyed verify); the
    * prefix filter must exclude it from every doc's rarity-ordered
    * prefix, keeping candidates ~linear, while the result stays EXACT
    * at theta (planted near-dup pairs 2i/2i+1 must all surface).
    * Runnable alone: `runMain graft.StressPrefix`. */
  def prefixStress(spark: org.apache.spark.sql.SparkSession): Unit = {
    val pfxDocs = spark.range(50000).select(col("id").as("pair"),
        explode(array(lit(0), lit(1))).as("side"))
      .select((col("pair") * 2 + col("side")).as("doc_id"),
        // 4 universal header tokens (hot shingles), 6 pair-specific
        // body tokens (rare shingles, enough to fill the theta=0.5
        // prefix), one differing tail token per side (J = 0.8)
        concat(lit("the common header shares"),
          concat_ws("", (Seq("alpha", "beta", "gamma", "delta", "eps",
            "zeta").map(w => concat(lit(s" $w"), col("pair").cast("string"))
              .asInstanceOf[org.apache.spark.sql.Column])): _*),
          lit(" tail"), col("side").cast("string")).as("text"))
    val nPfx = timed("prefixJaccardPairs 100k docs, universal hot shingle, theta=0.5") {
      functions.Dedup.prefixJaccardPairs(pfxDocs, "text", "doc_id",
        shingleN = 3, theta = 0.5).count()
    }
    println(s"[stress]   pairs=$nPfx (expect 50000 planted near-dup pairs, exact)")
    require(nPfx == 50000L, s"prefix join lost exactness: $nPfx")
  }
}

/** Standalone entry for the prefix-join stress (Stress case 18). */
object StressPrefix {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    Stress.prefixStress(spark)
    spark.stop()
  }
}

/** Round-11 scale-cliff closures, runnable alone:
  * `sbt "runMain graft.StressR11"`.
  *
  * 23. Percentiles over a 10^7-distinct-value domain: the broadcast
  * spelling would ship the whole permille map to the driver and every
  * executor and run the cumulative in ONE window partition; the
  * adaptive path must take the two-level bucketed cumulative + shuffle
  * join and finish without driver pressure. Exactness is closed-form:
  * value v = 2i+1 appears once, so permille(v) = (i+1)*1000 div N.
  *
  * 24. Mixture at a 10^7-row budget with emitPos=false: corpus-side
  * work stays the bounded-heap draw; the plan must contain no
  * SinglePartition exchange; composed trainOrder gives the shard-local
  * serving order. */
object StressR11 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // 23. percentiles, 10^7 distinct values (1.05x duplication)
    val n = 10000000L
    val big = spark.range(n).select(col("id"),
      (col("id") * 2 + 1).as("v"))
    val pct = functions.Quantiles.percentiles(big, "v",
      smallDomainLimit = 1000000L, buckets = 256)
    val plan = pct.queryExecution.executedPlan.toString
    require(!plan.contains("Exchange SinglePartition"),
      "high-cardinality percentiles must not single-partition")
    require(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      "high-cardinality percentiles must shuffle-join, not broadcast")
    timed(s"percentiles over $n rows, $n distinct values (two-level path)") {
      pct.write.format("noop").mode("overwrite").save()
    }
    // closed-form spot check: v = 2i+1 once each => permille = (i+1)*1000 div n
    val probe = pct.filter(col("id").isin(0L, n / 2, n - 1))
      .select(col("id"), col("permille"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    require(probe(0L) == 0L && probe(n / 2) == (n / 2 + 1) * 1000 / n
      && probe(n - 1) == 1000L, s"permille mismatch: $probe")
    println(s"[stress]   closed-form permilles verified: $probe")

    // 25. the threshold family over the same 10^7-distinct domain:
    // cumHist must take the two-level path (never one window partition
    // over the domain); thresholds are closed-form — v = 2i+1 once
    // each, so lo(100‰) = 2*(n/10-1)+1, hi(900‰) = 2*(9n/10-1)+1 and
    // the gate keeps 8n/10 + 1 rows exactly
    val kept = timed(s"gate [100,900]permille over $n distinct values") {
      functions.Quantiles.gate(big, "v", loPermille = 100,
        hiPermille = 900).count()
    }
    require(kept == n * 8 / 10 + 1, s"gate kept $kept, expected ${n * 8 / 10 + 1}")

    // 26. deletion-neighborhood entity match at 10^6 structured names
    // (constant prefix + padded digits — the exact shape that
    // degenerated the q-gram segment blocker to all-pairs, 869 s at
    // 15k rows): the masked blocker's candidates are true near-dups
    // only, so 10^6 rows must link in seconds, every dirty row to its
    // master (+ digit-neighbor multi-links), never all-pairs
    val names = spark.range(1000000L).select(col("id").as("c_custkey"),
      concat(lit("User#"), lpad(col("id").cast("string"), 9, "0"))
        .as("c_name"))
    val pPos = (pmod(functions.Hashing.hex8ToLong(
      col("c_custkey").cast("string")), lit(14L)) + 1).cast("int")
    val dirtyNames = names.select((col("c_custkey") + 10000000L).as("d_key"),
      concat(col("c_name").substr(lit(1), pPos - 1), lit("X"),
        col("c_name").substr(pPos + 1, length(col("c_name")))).as("d_name"))
    val linked = timed("entity match (masked blocker) 10^6 x 10^6 names") {
      functions.EntityMatch.link(dirtyNames, "d_key", "d_name",
        names, "c_custkey", "c_name",
        functions.EntityMatch.maskBlocker, maxDist = 1).count()
    }
    // every dirty row links at least its own master
    require(linked >= 1000000L, s"expected >= 10^6 links, got $linked")
    println(s"[stress]   links found: $linked (diagonal + digit neighbors)")

    // 27. no-straddle greedy packing at 10^6 docs: per-bucket fold is
    // O(idsPerBucket^2) element copies, so total work is
    // O(N * idsPerBucket) — linear in the corpus at the fixed default
    // knob; every doc must land in exactly one bin, fills capped
    val bigDocs = spark.range(1000000L).select(col("id").as("doc_id"),
      // 50-550 token docs (hash-derived): realistic fill mix vs S=2048
      concat_ws(" ", transform(sequence(lit(1),
        (pmod(functions.Hashing.hex8ToLong(col("id").cast("string")),
          lit(500L)) + 50).cast("int")), _ => lit("tok"))).as("text"))
    val binned = timed("packBinsGreedy 10^6 docs, S=2048, 512-doc buckets") {
      val out = functions.TextAnalysis.packBinsGreedy(
        bigDocs, "text", "doc_id", seqTokens = 2048)
      out.groupBy("bin_id").agg(sum("n_tokens").as("fill"),
          count(lit(1)).as("nd"))
        .agg(count(lit(1)), max("fill"), min("fill")).first()
    }
    require(binned.getLong(1) <= 2048L,
      s"a bin overfilled: ${binned.getLong(1)}")
    println(s"[stress]   bins=${binned.getLong(0)} maxFill=${binned.getLong(1)}")

    // 24. mixture at a 10^7 budget, key-only output
    val corpus = spark.range(2000000).select(col("id").as("doc_id"),
      concat(lit("d"), (col("id") % 16).cast("string")).as("dom"))
    val w = (0 until 16).map(i => s"d$i" -> (1.0 + i)).toMap
    val mixed = functions.Sampling.mixture(corpus, "dom", "doc_id", w,
      total = 10000000L, seed = 7, emitPos = false)
    val mPlan = mixed.queryExecution.executedPlan.toString
    require(!mPlan.contains("Exchange SinglePartition"),
      "mixture emitPos=false must not single-partition")
    val drawn = timed("mixture 2M corpus, 10^7 budget, 16 domains (key-only)") {
      mixed.count()
    }
    // each domain holds 125k rows; low-weight domains get quotas below
    // that (10^7/136 ~ 73.5k for d0), so the expected draw is the
    // apportioned quota clipped at availability, per domain
    val expected = functions.Sampling.apportion(w, 10000000L)
      .values.map(q => math.min(q, 125000L)).sum
    require(drawn == expected, s"expected $expected drawn, got $drawn")
    timed("trainOrder composition: 64 shards over the mixture draw") {
      functions.Sampling.trainOrder(mixed, "doc_id", shards = 64, seed = 8)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

/** Round-12 scale-cliff closure, runnable alone:
  * `sbt "runMain graft.StressR12"`.
  *
  * 28. The GROUPED histogram family under one hot group with a
  * 10^7-distinct-value domain (a length-per-source histogram where one
  * source dominates — trivially real at corpus scale). The r11 spelling
  * broadcast the (group × domain) cumulative frame (driver OOM) and ran
  * one group's whole domain through a single group-partitioned window;
  * the adaptive branch must take the grouped two-level bucketed
  * cumulative + (group, value)-keyed shuffle joins: no broadcast
  * exchange anywhere, no SinglePartition, and a window partition never
  * holds more than ~domain/buckets rows of one group. Exactness is
  * closed-form on the hot group (v = 2i+1 once each) and on the planted
  * small group. */
object StressR12 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // one hot group holding a 10^7-distinct domain + one 1000-row group
    val n = 10000000L
    val big = spark.range(n + 1000).select(col("id"),
      when(col("id") < n, lit("hot")).otherwise(lit("cold")).as("g"),
      when(col("id") < n, col("id") * 2 + 1)
        .otherwise((col("id") - n) * 2).as("v"))

    val pct = functions.Quantiles.groupedPercentiles(big, "g", "v",
      smallDomainLimit = 1000000L, buckets = 256)
    val plan = pct.queryExecution.executedPlan.toString
    require(!plan.contains("Exchange SinglePartition"),
      "hot-group groupedPercentiles must not single-partition")
    require(!plan.contains("BroadcastExchange"),
      "hot-group groupedPercentiles must not broadcast the cumulative frame")
    timed(s"groupedPercentiles: hot group $n distinct + cold 1000") {
      pct.write.format("noop").mode("overwrite").save()
    }
    // closed-form: hot v=2i+1 once each => permille=(i+1)*1000 div n;
    // cold v=2j once each over 1000 rows => permille=(j+1)*1000 div 1000
    val probe = pct.filter(col("id").isin(0L, n / 2, n - 1, n + 499))
      .select(col("id"), col("permille"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    require(probe(0L) == 0L && probe(n / 2) == (n / 2 + 1) * 1000 / n
      && probe(n - 1) == 1000L && probe(n + 499) == 500L,
      s"grouped permille mismatch: $probe")
    println(s"[stress]   closed-form grouped permilles verified: $probe")

    // the grouped threshold over the same frame: hot median =
    // 2*(ceil(n/2)-1)+1, cold median = 2*(500-1)
    val th = functions.Quantiles.groupedThreshold(big, "g", "v",
      permille = 500, smallDomainLimit = 1000000L, buckets = 256)
    val thPlan = th.queryExecution.executedPlan.toString
    require(!thPlan.contains("Exchange SinglePartition") &&
      !thPlan.contains("BroadcastExchange"),
      "hot-group groupedThreshold must not broadcast nor single-partition")
    val thMap = timed("groupedThreshold: median per group over the same frame") {
      th.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    }
    require(thMap("hot") == 2 * (n / 2 - 1) + 1 && thMap("cold") == 998L,
      s"grouped threshold mismatch: $thMap")
    println(s"[stress]   closed-form grouped thresholds verified: $thMap")

    // 29. deletion-neighborhood (indel) entity match at 10^6 structured
    // names — the r12 blocker covering the whole edit-distance-1 ball:
    // per-row hash picks INSERT or DELETE corruption at a hash position
    // (the class where the masked blocker's recall is zero by
    // contract). Same constant-prefix name shape that degenerated
    // q-gram blocking; block occupancy stays true-near-dup-sized, so
    // 10^6 x 10^6 must link in seconds, every dirty row to its master.
    val names = spark.range(1000000L).select(col("id").as("c_custkey"),
      concat(lit("User#"), lpad(col("id").cast("string"), 9, "0"))
        .as("c_name"))
    val h = functions.Hashing.hex8ToLong(col("c_custkey").cast("string"))
    val nameLen = length(col("c_name"))
    val pPos = (pmod(shiftright(h, 1), nameLen.cast("long")) + 1).cast("int")
    val deleted = concat(col("c_name").substr(lit(1), pPos - 1),
      col("c_name").substr(pPos + 1, nameLen))
    val inserted = concat(col("c_name").substr(lit(1), pPos - 1), lit("X"),
      col("c_name").substr(pPos, nameLen))
    val dirtyNames = names.select((col("c_custkey") + 10000000L).as("d_key"),
      when(pmod(h, lit(2)) === 0, deleted).otherwise(inserted).as("d_name"))
    val linked = timed("entity match (deletion blocker, indel) 10^6 x 10^6") {
      functions.EntityMatch.link(dirtyNames, "d_key", "d_name",
        names, "c_custkey", "c_name",
        functions.EntityMatch.deletionBlocker, maxDist = 1).count()
    }
    require(linked >= 1000000L, s"expected >= 10^6 indel links, got $linked")
    println(s"[stress]   indel links found: $linked (diagonal + neighbors)")

    // 30. containment join at 100k docs with a UNIVERSAL hot shingle:
    // every doc opens with the same 3 common tokens (one shingle with
    // df = corpus — the B-side posts it in full), and every 10th doc
    // has a planted quote of its 6 RARE tokens. The asymmetric prefix
    // filter must stay bounded — prefixes are rarity-ordered, so the
    // universal shingle never enters any prefix and its corpus-length
    // posting list meets zero candidates — and recover EXACTLY the
    // 10^4 (quote -> source) pairs at containment 1.0 (sources do not
    // link back: 4 of 7 shingles < θ).
    val cdocs = spark.range(100000L).select(col("id").as("doc_id"),
      concat_ws(" ", lit("common0"), lit("common1"), lit("common2"),
        concat(lit("r"), col("id"), lit("x0")),
        concat(lit("r"), col("id"), lit("x1")),
        concat(lit("r"), col("id"), lit("x2")),
        concat(lit("r"), col("id"), lit("x3")),
        concat(lit("r"), col("id"), lit("x4")),
        concat(lit("r"), col("id"), lit("x5"))).as("text"))
    val quotes = cdocs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ",
          concat(lit("r"), col("doc_id"), lit("x0")),
          concat(lit("r"), col("doc_id"), lit("x1")),
          concat(lit("r"), col("doc_id"), lit("x2")),
          concat(lit("r"), col("doc_id"), lit("x3")),
          concat(lit("r"), col("doc_id"), lit("x4")),
          concat(lit("r"), col("doc_id"), lit("x5"))).as("text"))
    val contained = timed("containment join 110k docs, universal hot shingle") {
      functions.Dedup.prefixContainmentPairs(
        cdocs.unionByName(quotes), "text", "doc_id",
        shingleN = 3, theta = 0.8)
        .filter(col("id_a") >= 1000000L).count()
    }
    require(contained == 10000L,
      s"expected exactly 10^4 quote links, got $contained")
    println(s"[stress]   containment links: $contained (exact planted set)")
    spark.stop()
  }
}

/** Round-13 stress cases: the incremental containment index at 110k
  * docs with a universal hot shingle (case 31), the depth-2
  * deletion blocker at 10^5 x 10^5 double-indel names (case 32), and
  * the incremental embedding index at 110k vectors with 10^4 planted
  * twins across 3 appends (case 33).
  * `sbt "runMain graft.StressR13"` */
object StressR13 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // 31. INCREMENTAL containment over the case-30 corpus (universal
    // hot shingle, 10^4 planted quotes), arriving in three batches
    // against the persisted postings index: the cumulative union must
    // recover EXACTLY the planted quote links — quotes and sources
    // split across batches, so both probe directions (batch-as-A
    // against the standing index and index-as-A against the batch) and
    // the within-batch class all carry load; the hot shingle's
    // corpus-length posting list must still meet zero prefixes.
    val cdocs = spark.range(100000L).select(col("id").as("doc_id"),
      concat_ws(" ", lit("common0"), lit("common1"), lit("common2"),
        concat(lit("r"), col("id"), lit("x0")),
        concat(lit("r"), col("id"), lit("x1")),
        concat(lit("r"), col("id"), lit("x2")),
        concat(lit("r"), col("id"), lit("x3")),
        concat(lit("r"), col("id"), lit("x4")),
        concat(lit("r"), col("id"), lit("x5"))).as("text"))
    val quotes = cdocs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ",
          concat(lit("r"), col("doc_id"), lit("x0")),
          concat(lit("r"), col("doc_id"), lit("x1")),
          concat(lit("r"), col("doc_id"), lit("x2")),
          concat(lit("r"), col("doc_id"), lit("x3")),
          concat(lit("r"), col("doc_id"), lit("x4")),
          concat(lit("r"), col("doc_id"), lit("x5"))).as("text"))
    val corpus = cdocs.unionByName(quotes)
    val idxPath = "/tmp/graft_stress_cont_idx"
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(idxPath), true)
    val found = timed("incremental containment 110k docs, 3 appends") {
      (0 to 2).map(m => functions.Dedup.containmentIndexUpdate(idxPath,
          corpus.filter(pmod(col("doc_id"), lit(3)) === m),
          "text", "doc_id", shingleN = 3, theta = 0.8)
        .filter(col("id_a") >= 1000000L).count()).sum
    }
    require(found == 10000L,
      s"expected exactly 10^4 incremental quote links, got $found")
    println(s"[stress]   incremental containment links: $found (exact)")

    // 32. depth-2 deletion blocker at 10^5 x 10^5 structured names with
    // TWO hash-driven indel edits per dirty row (the ed<=2 class depth 1
    // cannot block when both edits are deletions/insertions on one
    // side). ~len^2/2 keys per row is the documented cost; the join
    // must stay block-occupancy-bounded, every dirty row must link.
    val names = spark.range(100000L).select(col("id").as("c_custkey"),
      concat(lit("User#"), lpad(col("id").cast("string"), 9, "0"))
        .as("c_name"))
    val h = functions.Hashing.hex8ToLong(col("c_custkey").cast("string"))
    val nameLen = length(col("c_name"))
    val pPos = (pmod(shiftright(h, 1), nameLen.cast("long")) + 1).cast("int")
    val r1 = when(pmod(h, lit(2)) === 0,
      concat(col("c_name").substr(lit(1), pPos - 1),
        col("c_name").substr(pPos + 1, nameLen)))
      .otherwise(concat(col("c_name").substr(lit(1), pPos - 1), lit("X"),
        col("c_name").substr(pPos, nameLen)))
    val step1 = names.select(col("c_custkey"), r1.as("r1"), h.as("__h"))
    val len1 = length(col("r1"))
    val qPos = (pmod(shiftright(col("__h"), 3), len1.cast("long")) + 1)
      .cast("int")
    val dirty2 = step1.select((col("c_custkey") + 10000000L).as("d_key"),
      when(pmod(shiftright(col("__h"), 2), lit(2)) === 0,
        concat(col("r1").substr(lit(1), qPos - 1),
          col("r1").substr(qPos + 1, len1)))
        .otherwise(concat(col("r1").substr(lit(1), qPos - 1), lit("Y"),
          col("r1").substr(qPos, len1))).as("d_name"))
    val linked2 = timed("entity match (depth-2 deletion blocker) 10^5 x 10^5") {
      functions.EntityMatch.link(dirty2, "d_key", "d_name",
        names, "c_custkey", "c_name",
        functions.EntityMatch.deletionBlocker2, maxDist = 2)
        .select("d_key").distinct().count()
    }
    require(linked2 == 100000L,
      s"expected every dirty row linked (10^5), got $linked2")
    println(s"[stress]   depth-2 linked dirty rows: $linked2 (complete)")

    // 33. incremental EMBEDDING index at 110k vectors / 3 appends:
    // 100k hash-derived 64-dim vectors (independent components — no
    // accidental near-dups at cos 0.95, which sits ~7 sigma above the
    // uniform-pair cosine) plus 10^4 planted twins (identical vector,
    // id + 10^7: cos exactly 1.0, same bucket by construction). The
    // cumulative cross-pair count (source, twin) must be exactly the
    // planted set; sources and twins split across batches, so the
    // index↔batch and within-batch discovery classes both carry load.
    val dim = 64
    val vecExpr = array((0 until dim).map(i =>
      (pmod(xxhash64(col("vid"), lit(i)), lit(2001L)).cast("double")
        / 1000.0 - 1.0)): _*)
    val baseVecs = spark.range(100000L).select(col("id").as("vid"))
      .select(col("vid"), vecExpr.as("emb"))
    // offset 10^7 ≡ 1 (mod 3) puts a twin in the NEXT batch after its
    // source (index↔batch discovery); offset 10^7+2 ≡ 0 keeps it in
    // the SAME batch (within-batch discovery) — both classes loaded
    val twins = baseVecs.filter(col("vid") % 10 === 0)
      .select((col("vid") + 10000000L +
        when(col("vid") % 20 === 0, 2L).otherwise(0L)).as("vid"),
        col("emb"))
    val vcorpus = baseVecs.unionByName(twins)
    val embIdx = "/tmp/graft_stress_emb_idx"
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(embIdx), true)
    val embFound = timed("incremental embedding index 110k vecs, 3 appends") {
      (0 to 2).map(m => functions.Dedup.embeddingIndexUpdate(embIdx,
          vcorpus.filter(pmod(col("vid"), lit(3)) === m), "emb", "vid",
          planes = 8, minCos = 0.95, maxBucketSize = 1000000)
        .filter(col("id_b") >= 10000000L).count()).sum
    }
    require(embFound == 10000L,
      s"expected exactly 10^4 planted twin pairs, got $embFound")
    println(s"[stress]   incremental embedding pairs: $embFound (exact)")
    spark.stop()
  }
}

/** Recall probe for the LSH bitext spelling on a corpus with REAL
  * neighbor structure: corpus B is corpus A jittered ±0.05 per
  * component (cosine ≈ 0.995 to its source — the translation-pair
  * regime the CCMatrix recipe assumes), so exact mining recovers the
  * planted diagonal and the probe measures how much of it the
  * sign-LSH multiprobe retrieval keeps. (On the UNIFORM synthetic
  * fixture the oracles run on, recall reads ~15% — uniform vectors
  * have no neighbor structure, so within-bucket top-2 diverges from
  * global top-2; that number measures the fixture, not the machinery.)
  * `sbt "runMain graft.BitextRecallR11 [sfDir]"` */
object BitextRecallR11 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val a = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val jit = zip_with(col("embedding"),
      sequence(lit(0), size(col("embedding")) - 1),
      (x, p) => (x.cast("double") +
        (functions.Hashing.hex8ToLong(concat_ws(":", lit("r"),
          col("vec_id").cast("string"), p.cast("string"))).cast("double")
          / 4294967296.0 - 0.5) * 0.1).cast("float"))
    val b = a.select((col("vec_id") + 1000000L).as("vec_id"),
      jit.as("embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = pairs(functions.Similarity.bitextMine(a, b, "embedding",
      "vec_id", marginFloor = 1.0))
    val l = pairs(functions.Similarity.bitextMineLsh(a, b, "embedding",
      "vec_id", marginFloor = 1.0, planes = 8))
    val n = a.count()
    val planted = e.count { case (x, y) => y == x + 1000000L }
    val inter = (e & l).size
    println(f"[recall] corpus=$n exact=${e.size} (planted diagonal " +
      f"recovered: $planted) lsh=${l.size} inter=$inter " +
      f"recall=${inter.toDouble / e.size}%.3f")
    spark.stop()
  }
}
