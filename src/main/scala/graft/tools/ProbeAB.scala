package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Hashing}

/** INTERLEAVED A/B for the containment probe (r16): one JVM, one
  * staged feed, TWO independent index trees; every update runs the
  * r15 two-scan probe and the r16 one-scan probe back-to-back on
  * identical state. The r15-style A/B (two sequential 40-update runs)
  * is unreadable on this sandbox's parking host — whole-VM stalls of
  * 100-560 s land in DIFFERENT session phases for each arm and
  * swamp the ~10 s signal (both r16 sequential arms' decile-3/4 fits
  * came out park-dominated, with contradictory slopes). Interleaving
  * pairs the arms in time: a park inflates one update PAIR, and the
  * per-update ratio distribution stays readable.
  *
  * The OLD arm is the r15 probe body (Dedup.scala@35b74f3:768-886)
  * copied verbatim below as measurement scaffolding — kept here, not
  * in Dedup, so the shipped operator has exactly one spelling.
  *
  * Usage: runMain graft.tools.ProbeAB <sfDir> [batches] [limit]
  *        [bulk] [groupK]
  */
object ProbeAB {
  /** r15 two-scan probe, verbatim except for the index-path plumbing:
    * candidates from ONE merged lake scan keyed (s, direction),
    * verify from a SECOND lake scan restricted to candidate ids +
    * batch vocab. */
  private def oldUpdate(indexPath: String, newDocs: DataFrame,
                        textCol: String, idCol: String,
                        shingleN: Int, theta: Double): DataFrame = {
    val spark = newDocs.sparkSession
    val W = org.apache.spark.sql.expressions.Window
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val postingsPath = s"$indexPath/postings"
    val dfordPath = s"$indexPath/dford"
    val hasIdx = fs.exists(new org.apache.hadoop.fs.Path(postingsPath))
    val sh = newDocs.select(col(idCol).as("id"),
      explode(array_distinct(Dedup.shingles(col(textCol), shingleN)))
        .as("s"))
    if (!hasIdx)
      sh.groupBy("s").agg(count(lit(1)).as("__df"))
        .write.mode("overwrite").parquet(dfordPath)
    val dford = spark.read.parquet(dfordPath)
      .join(broadcast(sh.select("s").distinct()), Seq("s"))
    val ranked = sh
      .join(broadcast(dford), Seq("s"), "left")
      .withColumn("__df", coalesce(col("__df"), lit(0L)))
      .withColumn("__rk", row_number().over(
        W.partitionBy("id").orderBy(col("__df"),
          Hashing.hex8ToLong(col("s")), col("s"))))
      .withColumn("__n", count(lit(1)).over(W.partitionBy("id")))
      .drop("__df")
      .persist()
    try {
      ranked.count()
      val idx =
        if (hasIdx) spark.read.parquet(postingsPath)
        else ranked.limit(0)
      val pl = prefixLen(theta)
      val newPref = ranked.filter(col("__rk") <= pl)
      val bside = newPref.select(col("s"), lit(0).as("__want"),
          col("id").as("__bid"))
        .unionByName(ranked.select(col("s"), lit(1).as("__want"),
          col("id").as("__bid")))
      val probes = idx.select(col("id").as("__lid"), col("s"),
        explode(when(col("__rk") <= pl, array(lit(0), lit(1)))
          .otherwise(array(lit(0)))).as("__want"))
      val candLake = probes.join(broadcast(bside), Seq("s", "__want"))
        .select(
          when(col("__want") === 0, col("__bid")).otherwise(col("__lid"))
            .as("id_a"),
          when(col("__want") === 0, col("__lid")).otherwise(col("__bid"))
            .as("id_b"),
          col("__want"))
        .distinct()
      val candNO = candLake.filter(col("__want") === 0).drop("__want")
      val candON = candLake.filter(col("__want") === 1).drop("__want")
      val candNN = newPref.select(col("id").as("id_a"), col("s"))
        .join(ranked.select(col("id").as("id_b"), col("s")), Seq("s"))
        .filter(col("id_a") =!= col("id_b"))
        .select("id_a", "id_b").distinct()
      val batchArr = ranked.groupBy("id")
        .agg(sort_array(collect_list(col("s"))).as("arr"),
          first(col("__n")).as("n"))
      val oldIds = candNO.select(col("id_b").as("id"))
        .unionByName(candON.select(col("id_a").as("id"))).distinct()
      val oldArr = idx.join(broadcast(oldIds), Seq("id"))
        .join(broadcast(sh.select("s").distinct()), Seq("s"))
        .groupBy("id")
        .agg(sort_array(collect_list(col("s"))).as("arr"),
          first(col("__n")).as("n"))
      def contain(c: DataFrame, aArr: DataFrame, bArr: DataFrame,
                  aBc: Boolean, bBc: Boolean): DataFrame = {
        val aSide = aArr.select(col("id").as("id_a"),
          col("arr").as("__arr_a"), col("n").as("n_a"))
        val bSide = bArr.select(col("id").as("id_b"),
          col("arr").as("__arr_b"))
        c.join(if (aBc) broadcast(aSide) else aSide, Seq("id_a"))
          .join(if (bBc) broadcast(bSide) else bSide, Seq("id_b"))
          .withColumn("containment",
            size(array_intersect(col("__arr_a"), col("__arr_b")))
              .cast("double") / col("n_a"))
          .select("id_a", "id_b", "containment")
      }
      val interNO = contain(candNO, batchArr, oldArr,
        aBc = true, bBc = false)
      val interON = contain(candON, oldArr, batchArr,
        aBc = false, bBc = true)
      val interNN = contain(candNN, batchArr, batchArr,
        aBc = true, bBc = true)
      val found = interNO.unionByName(interON).unionByName(interNN)
        .filter(col("containment") >= theta)
        .localCheckpoint(true)
      ranked.write.mode("append").parquet(postingsPath)
      found
    } finally ranked.unpersist()
  }

  // same exact-integer prefix bound as Dedup.prefixLen (private there)
  private def prefixLen(theta: Double): org.apache.spark.sql.Column = {
    val thetaPm = math.floor(theta * 1000).toLong
    expr(s"__n - ((__n * ${thetaPm}L + 999L) div 1000L) + 1L")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batches = if (args.length > 1) args(1).toInt else 300
    val limit = if (args.length > 2) args(2).toInt else 40
    // bulk > 0: pre-append this many batches to BOTH index trees
    // WITHOUT probing (identical postings + shared dford), then run
    // the interleaved probe updates on batches [bulk, bulk+limit).
    // This measures the probe A/B at a LAKE SIZE the interleaved
    // segment alone cannot reach in-session — the scan-term regime
    // where the spellings should diverge.
    val bulk = if (args.length > 3) args(3).toInt else 0
    // groupK > 0: after the interleaved segment, run groupK MORE
    // batches twice from identical state — sequentially on idxNew vs
    // one containmentIndexUpdateMany group on a byte-copy — to price
    // the kx lake-scan amortization at this lake size (verdict r16 #3)
    val groupK = if (args.length > 4) args(4).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors()))
    val spark = graft.GraftSession.init(graft.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val base = "/tmp/graft_probe_ab"
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    graft.Tables.load(spark, sfDir, "documents")
      .withColumn("__b", pmod(col("doc_id"), lit(batches)))
      .write.partitionBy("__b").parquet(s"$base/feed")
    if (bulk > 0) {
      val W = org.apache.spark.sql.expressions.Window
      val u = spark.read.parquet(s"$base/feed")
        .filter(col("__b") < bulk).select(col("doc_id"), col("text"))
      val sh = u.select(col("doc_id").as("id"),
        explode(array_distinct(Dedup.shingles(col("text"), 3))).as("s"))
      val dford = sh.groupBy("s").agg(count(lit(1)).as("__df"))
        .localCheckpoint()
      val ranked = sh
        .join(dford, Seq("s"), "left")
        .withColumn("__df", coalesce(col("__df"), lit(0L)))
        .withColumn("__rk", row_number().over(
          W.partitionBy("id").orderBy(col("__df"),
            Hashing.hex8ToLong(col("s")), col("s"))))
        .withColumn("__n", count(lit(1)).over(W.partitionBy("id")))
        .drop("__df")
        .localCheckpoint()
      for (tree <- Seq("idxOld", "idxNew")) {
        dford.write.parquet(s"$base/$tree/dford")
        ranked.write.parquet(s"$base/$tree/postings")
      }
      println(s"bulk_loaded batches=$bulk docs=${u.count()} " +
        s"postings=${ranked.count()}")
    }
    // park annotation (r17): each arm's window carries its measured
    // stall overlap so a park-inflated pair is visible in the line
    // itself instead of inferred from the ratio distribution
    val meter = new graft.ParkMeter()
    var pairsOld = 0L
    var pairsNew = 0L
    for (m <- bulk until bulk + limit) {
      val batch = spark.read.parquet(s"$base/feed/__b=$m")
        .select(col("doc_id"), col("text"))
      val pinned = spark.sparkContext.getPersistentRDDs.keySet
      def runOld(): (Double, Double) = {
        val t0 = System.nanoTime()
        pairsOld += oldUpdate(s"$base/idxOld", batch, "text", "doc_id",
          3, 0.8).count()
        val t1 = System.nanoTime()
        ((t1 - t0) / 1e9, meter.overlapSecs(t0, t1))
      }
      def runNew(): (Double, Double) = {
        val t0 = System.nanoTime()
        pairsNew += Dedup.containmentIndexUpdate(s"$base/idxNew", batch,
          "text", "doc_id", 3, 0.8).count()
        val t1 = System.nanoTime()
        ((t1 - t0) / 1e9, meter.overlapSecs(t0, t1))
      }
      // alternate arm ORDER per update: the second arm re-reads a
      // warmer feed batch and inherits the first's page cache — the
      // alternation cancels that bias across the segment
      val ((tOld, pOld), (tNew, pNew)) =
        if (m % 2 == 0) { val a = runOld(); val b = runNew(); (a, b) }
        else { val b = runNew(); val a = runOld(); (a, b) }
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => pinned(id) }
        .values.foreach(_.unpersist(blocking = false))
      System.gc()
      println(f"update=$m old=$tOld%.2f new=$tNew%.2f " +
        f"park_old=$pOld%.2f park_new=$pNew%.2f " +
        f"ratio=${tOld / tNew}%.2f pairs_old=$pairsOld pairs_new=$pairsNew")
      if (m % 10 == 9) {
        Dedup.containmentIndexCompact(spark, s"$base/idxOld")
        Dedup.containmentIndexCompact(spark, s"$base/idxNew")
      }
    }
    println(s"""{"metric":"probe_ab","pairs_old":$pairsOld,""" +
      s""""pairs_new":$pairsNew,"match":${pairsOld == pairsNew}}""")
    // Grouped-update arm (r16 verdict task 3): measure
    // containmentIndexUpdateMany's kx scan amortization ON TOP of the
    // merged one-scan probe, at this lake size, in this session.
    // idxGrp starts as a byte-copy of idxNew's current state; the
    // SAME groupK batches then run sequentially on idxNew (k probes,
    // k lake scans) and as ONE grouped update on idxGrp (one probe,
    // one lake scan) — cumulative pairs must match exactly (the
    // grouping==sequential law), walls are the amortization number.
    if (groupK > 0) {
      val grpBase = s"$base/idxGrp"
      fs.delete(new org.apache.hadoop.fs.Path(grpBase), true)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$base/idxNew"), fs,
        new org.apache.hadoop.fs.Path(grpBase), false,
        spark.sparkContext.hadoopConfiguration)
      val gBatches = (bulk + limit until bulk + limit + groupK).map(m =>
        spark.read.parquet(s"$base/feed/__b=$m")
          .select(col("doc_id"), col("text")))
      var seqPairs = 0L
      val (tSeq, pSeq) = {
        val t0 = System.nanoTime()
        gBatches.foreach { b =>
          seqPairs += Dedup.containmentIndexUpdate(s"$base/idxNew", b,
            "text", "doc_id", 3, 0.8).count()
        }
        val t1 = System.nanoTime()
        ((t1 - t0) / 1e9, meter.overlapSecs(t0, t1))
      }
      var grpPairs = 0L
      val (tGrp, pGrp) = {
        val t0 = System.nanoTime()
        grpPairs = Dedup.containmentIndexUpdateMany(grpBase, gBatches,
          "text", "doc_id", 3, 0.8).count()
        val t1 = System.nanoTime()
        ((t1 - t0) / 1e9, meter.overlapSecs(t0, t1))
      }
      println(f"""{"metric":"group_ab","k":$groupK,""" +
        f""""seq_secs":$tSeq%.1f,"grp_secs":$tGrp%.1f,""" +
        f""""park_seq":$pSeq%.1f,"park_grp":$pGrp%.1f,""" +
        f""""ratio":${tSeq / tGrp}%.2f,"pairs_seq":$seqPairs,""" +
        f""""pairs_grp":$grpPairs,"match":${seqPairs == grpPairs}}""")
    }
    spark.stop()
    sys.exit(0)
  }
}
