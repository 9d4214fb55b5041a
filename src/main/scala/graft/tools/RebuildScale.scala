package graft.tools

import org.apache.spark.sql.functions._

/** Cost-vs-lake-size ladder for the two OFFLINE index rebuild entry
  * points (r15 verdict task 4): `embeddingIndexRebuild` and
  * `containmentIndexRebuild` are corpus-scale by design (the documented
  * recovery paths — over-cap bucket split, post-bootstrap hot-shingle
  * re-rank), but their cost curve was unmeasured, so operators had no
  * cadence guidance. This drives the standing index through a growing
  * update stream and, at geometric lake checkpoints (×1/×2/×4 of the
  * first point), times (a) the rebuild wall and (b) the FIRST update
  * after the rebuild (the post-rebuild probe cost — must stay on the
  * ladder's trajectory, since rebuilds are answer-preserving by law).
  *
  * Usage:
  *   runMain graft.tools.RebuildScale <sfDir> containment [batches] [firstPoint]
  *   runMain graft.tools.RebuildScale <sfDir> embedding   [batches] [firstPoint]
  *
  * Points are at `firstPoint`, 2×, 4× updates (default 5 → 5/10/20).
  */
object RebuildScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val op = args(1)
    val batches = if (args.length > 2) args(2).toInt else 300
    val firstPoint = if (args.length > 3) args(3).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors()))
    val spark = graft.GraftSession.init(graft.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val base = s"/tmp/graft_rebuildscale_${op}_$sfTag"
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val (table, idCol) = op match {
      case "containment" => ("documents", "doc_id")
      case "embedding" => ("embeddings", "vec_id")
      case other => sys.error(s"unknown op: $other")
    }
    graft.Tables.load(spark, sfDir, table)
      .withColumn("__b", pmod(col(idCol), lit(batches)))
      .write.partitionBy("__b").parquet(s"$base/feed")
    val points = Seq(firstPoint, 2 * firstPoint, 4 * firstPoint)
    val lastUpdate = points.last + 1
    // park annotation (r16 verdict #4: the embedding ladder's numbers
    // were park-floor minima read by hand; now every line carries its
    // measured stall overlap so a contaminated point is visible in the
    // artifact, not inferred from repeats)
    val meter = new graft.ParkMeter()
    var pairs = 0L
    def update(m: Int): (Double, Double) = {
      val batch = spark.read.parquet(s"$base/feed/__b=$m")
      val pinned = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      val found = op match {
        case "containment" =>
          graft.functions.Dedup.containmentIndexUpdate(
            s"$base/idx", batch.select(col(idCol), col("text")),
            "text", idCol, shingleN = 3, theta = 0.8)
        case "embedding" =>
          graft.functions.Dedup.embeddingIndexUpdate(
            s"$base/idx", batch, "embedding", idCol,
            planes = 8, minCos = 0.95, maxBucketSize = 1000000)
      }
      pairs += found.count()
      val t1 = System.nanoTime()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => pinned(id) }
        .values.foreach(_.unpersist(blocking = false))
      System.gc()
      ((t1 - t0) / 1e9, meter.overlapSecs(t0, t1))
    }
    def rebuild(): (Double, Double) = {
      val t0 = System.nanoTime()
      op match {
        case "containment" =>
          graft.functions.Dedup.containmentIndexRebuild(spark, s"$base/idx")
        case "embedding" =>
          // same planes: the pure over-cap/re-partition recovery shape
          // (changed-planes cost is plane-count-independent — the lake
          // rewrite dominates either way)
          graft.functions.Dedup.embeddingIndexRebuild(spark, s"$base/idx",
            planes = 8, minCos = 0.95, maxBucketSize = 1000000).count()
      }
      val t1 = System.nanoTime()
      ((t1 - t0) / 1e9, meter.overlapSecs(t0, t1))
    }
    def lakeDocs(): Long =
      (if (op == "containment")
        spark.read.parquet(s"$base/idx/postings")
      else
        spark.read.option("basePath", s"$base/idx").parquet(s"$base/idx"))
        .select("id").distinct().count()
    for (m <- 0 until lastUpdate) {
      val (sec, park) = update(m)
      println(f"update=$m sec=$sec%.2f park=$park%.2f cum_pairs=$pairs")
      if (points.contains(m + 1)) {
        val docs = lakeDocs()
        val (rsec, rpark) = rebuild()
        println(f"rebuild_at_updates=${m + 1} lake_docs=$docs " +
          f"sec=$rsec%.2f park=$rpark%.2f")
        // the post-rebuild probe cost: the NEXT loop iteration's
        // update= line, read it against the pre-rebuild trajectory
      }
    }
    println(s"""{"metric":"rebuild_ladder","op":"$op","points":""" +
      s"""[${points.mkString(",")}],"cum_pairs":$pairs}""")
    spark.stop()
    sys.exit(0)
  }
}
