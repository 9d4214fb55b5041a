package graft.tools

/** Executed-plan scan census over the registered queries (r16
  * session 2): counts FileScan / Generate(explode) / ReusedExchange
  * nodes in each query's final adaptive plan. The diamond finding —
  * plan-level exchange reuse NEVER deduplicates a derived-aggregate
  * branch (analyzer re-aliasing breaks exchange identity), so every
  * extra consumer of a derived frame re-runs its corpus pass — makes
  * scan count a structural signal: a query whose scan/explode count
  * exceeds its input-table count is paying a hidden multi-pass tax
  * that localCheckpointing its smallest bounded frame removes.
  *
  * GATED since r17 (r16 verdict #6), the PlanAudit discipline: a
  * flagged row (scans+generates >= 5, zero reuse) must carry a
  * reviewed justification in [[graft.ScanCensusExceptions]] or the
  * run exits 1 — so the diamond class of regression cannot silently
  * return. Run it in the round-close checklist alongside PlanAudit.
  *
  * Usage: runMain graft.tools.ScanCensus [sfDir] [all|core]
  */
object ScanCensus {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scope = if (args.length > 1) args(1) else "core"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors()))
    val spark = graft.GraftSession.init(graft.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => scope == "all" || !graft.Queries.lifecycle(n))
    var reviewedFlags = 0
    var newFlags = 0
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val s = df.queryExecution.executedPlan.toString
        val scans = "FileScan".r.findAllIn(s).length
        val gens = "Generate".r.findAllIn(s).length
        val reused = "ReusedExchange".r.findAllIn(s).length
        // the flag line: lots of scans or explodes with zero reuse is
        // where hidden multi-pass diamonds live
        val flag =
          if (scans + gens >= 5 && reused == 0)
            graft.ScanCensusExceptions.reviewed.get(name) match {
              case Some(why) => reviewedFlags += 1; s" << OK ($why)"
              case None => newFlags += 1; " << NEW (unreviewed)"
            }
          else ""
        println(f"[census] $name%-38s scans=$scans%-3d generates=$gens%-3d reused=$reused$flag")
      } catch {
        case e: Throwable =>
          println(s"[census] $name ERR ${e.getClass.getSimpleName}")
      }
      try spark.streams.active.foreach(_.stop()) catch { case _: Throwable => }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      try org.apache.spark.sql.graft.bridge.unloadStateStores()
      catch { case _: Throwable => }
    }
    println(s"[census] done: ${names.length} rows, " +
      s"$reviewedFlags reviewed flags, $newFlags NEW")
    spark.stop()
    sys.exit(if (newFlags > 0) 1 else 0)
  }
}
