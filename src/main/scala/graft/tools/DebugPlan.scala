package graft.tools

/** Throwaway: print one query's physical plan for audit triage. */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("grouped_mad_outliers")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.executedPlan.toString)
    println("AUDIT HITS: " + PlanAudit.audit(df).mkString(", "))
    spark.stop()
  }
}
