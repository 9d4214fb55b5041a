package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-guard audit: build every registered query's physical plan and
  * flag the shapes that do not survive a 100x scale-up —
  * CartesianProduct, BroadcastNestedLoopJoin, and SinglePartition
  * exchanges. Some hits are INTENTIONAL (exact ANN baselines broadcast
  * a small query side through a BNLJ; budget-sized schedule windows
  * use one partition by construction) — the audit prints every hit so
  * the exception list stays explicit and reviewed, instead of silent.
  * Usage: `sbt "runMain graft.tools.PlanAudit [sfDir]"`.
  */
object PlanAudit {
  private val Flags = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
    "Exchange SinglePartition")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark: SparkSession = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hits = Flags.filter(plan.contains)
        if (hits.nonEmpty) {
          flagged += 1
          println(s"[audit] $name: ${hits.mkString(", ")}")
        }
      } catch { case e: Throwable =>
        println(s"[audit] $name: PLAN-ERROR ${e.getClass.getSimpleName}")
      }
      try spark.streams.active.foreach(_.stop()) catch { case _: Throwable => }
    }
    println(s"[audit] done: $flagged of ${graft.SparkEntry.queries.size} " +
      "queries carry a flagged shape (each must be an explicit, " +
      "documented exception)")
    spark.stop()
  }
}
