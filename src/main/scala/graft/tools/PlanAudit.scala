package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.execution.{CollectLimitExec, LocalTableScanExec, RangeExec, SparkPlan, GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Scale-guard audit: build every registered query's physical plan and
  * flag the shapes that do not survive a 100x scale-up:
  *
  *   1. `CartesianProduct` / `BroadcastNestedLoopJoin` /
  *      `Exchange SinglePartition` (string-level, as before);
  *   2. WINDOWS WITH AN EMPTY PARTITION SPEC — a corpus through one
  *      window partition is the cliff class round 10's verdict found
  *      twice by hand. Deliberately-bounded frames are spelled with
  *      [[graft.functions.WindowKeys.onePartition]], which survives as
  *      a non-empty spec, so any empty spec left is an unreviewed hit;
  *   3. BROADCAST BUILDS NOT PROVABLY BOUNDED — a broadcast whose
  *      build subtree reaches a file scan without passing an
  *      aggregate/limit grows with the corpus and OOMs the driver at
  *      scale. Build sides bounded by construction (aggregates, limits,
  *      local relations, small ranges) pass silently.
  *
  * Some hits are INTENTIONAL (exact ANN baselines broadcast a
  * filter-selected query side; fixture-fed parsers broadcast a local
  * relation) — every such site lives in [[reviewed]] with its bound
  * justification. A hit NOT in the list prints as `NEW (unreviewed)`
  * and the audit exits nonzero: new cliffs fail review instead of
  * scrolling past. Usage: `sbt "runMain graft.tools.PlanAudit [sfDir]"`.
  */
object PlanAudit {
  private val Flags = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
    "Exchange SinglePartition")

  /** query-name -> (hit-kind -> justification). Kinds are the strings
    * printed by the audit: one of [[Flags]], `unpartitioned-window`, or
    * `unbounded-broadcast(<leaf>)`. */
  private def reviewed: Map[String, Map[String, String]] = Map.empty ++
    graft.SparkEntry.planAuditExceptions

  /** Physical nodes under which a broadcast build is bounded regardless
    * of corpus size. */
  private def bounding(p: SparkPlan): Boolean = p match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
         _: SortAggregateExec | _: GlobalLimitExec | _: LocalLimitExec |
         _: TakeOrderedAndProjectExec | _: CollectLimitExec |
         _: LocalTableScanExec => true
    case r: RangeExec => r.numElements.isValidLong &&
      r.numElements.toLong <= 1000000L
    case _ => false
  }

  /** True when every root-to-leaf path in the build subtree passes a
    * bounding node before reaching a data source. */
  private def boundedBuild(p: SparkPlan): Boolean =
    bounding(p) || (p.children.nonEmpty && p.children.forall(boundedBuild))

  /** Flatten the physical tree including the AQE wrapper's input plan
    * and (nested) subquery plans. */
  private def physNodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => physNodes(a.inputPlan)
      case other => other +: other.children.flatMap(physNodes)
    }
    here ++ p.subqueries.flatMap(physNodes)
  }

  private[tools] def audit(df: DataFrame): Seq[String] = {
    val qe = df.queryExecution
    val planStr = qe.executedPlan.toString
    val stringHits = Flags.filter(planStr.contains)
    val windowHits = qe.optimizedPlan.collectWithSubqueries {
      case w: logical.Window if w.partitionSpec.isEmpty =>
        "unpartitioned-window"
      case w: logical.WindowGroupLimit if w.partitionSpec.isEmpty =>
        "unpartitioned-window"
    }.distinct
    val broadcastHits = physNodes(qe.executedPlan).collect {
      case b: BroadcastExchangeExec if !boundedBuild(b.child) =>
        val leaves = b.child.collectLeaves().map(_.nodeName).distinct
        s"unbounded-broadcast(${leaves.mkString("+")})"
    }.distinct
    stringHits ++ windowHits ++ broadcastHits
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark: SparkSession = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    var newHits = 0
    var reviewedHits = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val hits = audit(fn(spark, sfDir))
        hits.foreach { h =>
          reviewed.get(name).flatMap(_.get(h)) match {
            case Some(why) =>
              reviewedHits += 1
              println(s"[audit] $name: $h — OK ($why)")
            case None =>
              newHits += 1
              println(s"[audit] $name: $h — NEW (unreviewed)")
          }
        }
      } catch { case e: Throwable =>
        println(s"[audit] $name: PLAN-ERROR ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("").take(120)}")
      }
      try spark.streams.active.foreach(_.stop()) catch { case _: Throwable => }
    }
    println(s"[audit] done: $reviewedHits reviewed hits, $newHits NEW — " +
      s"over ${graft.SparkEntry.queries.size} queries")
    spark.stop()
    if (newHits > 0) sys.exit(1)
  }
}
