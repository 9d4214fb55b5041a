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
  *   3. HINT-FORCED broadcast builds not provably bounded — a
  *      `broadcast()` hint whose build subtree reaches a data source
  *      without passing a bounding node grows with the corpus and OOMs
  *      the driver at scale, and the hint BYPASSES the planner's size
  *      check, so nothing re-plans it. (Un-hinted broadcasts are
  *      chosen FROM size estimates and re-chosen at scale — AQE
  *      replaces them with shuffle joins when the build outgrows the
  *      threshold — so they are definitionally not forced cliffs and
  *      are not flagged; flagging them at audit SF would drown the
  *      signal in every small-side join the planner rightly
  *      broadcasts at 60k rows.) Build sides bounded by construction
  *      (ONE-ROW aggregates, limits, local relations, small ranges)
  *      pass silently; a build bounded only by a GROUPED aggregate is
  *      a separate hit kind (`grouped-agg-broadcast`) because a
  *      corpus-cardinality grouping key makes the frame corpus-sized —
  *      each such site must state why its key's cardinality is
  *      feature-sized or runtime-measured.
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
    * printed by the audit: one of [[Flags]], `unpartitioned-window`,
    * `unbounded-broadcast(<leaf>)`, or `grouped-agg-broadcast(<leaf>)`. */
  private def reviewed: Map[String, Map[String, String]] = Map.empty ++
    graft.SparkEntry.planAuditExceptions

  /** Bound class of a broadcast build subtree. A GROUPED aggregate does
    * NOT bound a build regardless of corpus size — a groupBy on a
    * corpus-cardinality key (distinct doc ids, raw values) produces a
    * corpus-sized frame, exactly the cliff class this check exists for.
    * Only one-row aggregates (empty grouping list) are hard bounds;
    * grouped-aggregate builds surface as their own hit kind so each
    * site must carry a reviewed statement of WHY its grouping key's
    * cardinality is feature-sized, not corpus-sized. */
  private sealed trait Bound
  private case object Hard extends Bound
  private case object GroupedAgg extends Bound
  private case object Unbounded extends Bound

  private def nodeBound(p: SparkPlan): Option[Bound] = p match {
    case a: HashAggregateExec =>
      Some(if (a.groupingExpressions.isEmpty) Hard else GroupedAgg)
    case a: ObjectHashAggregateExec =>
      Some(if (a.groupingExpressions.isEmpty) Hard else GroupedAgg)
    case a: SortAggregateExec =>
      Some(if (a.groupingExpressions.isEmpty) Hard else GroupedAgg)
    case _: GlobalLimitExec | _: LocalLimitExec |
         _: TakeOrderedAndProjectExec | _: CollectLimitExec |
         _: LocalTableScanExec => Some(Hard)
    case r: RangeExec => Some(
      if (r.numElements.isValidLong && r.numElements.toLong <= 1000000L) Hard
      else Unbounded)
    case _ => None
  }

  /** Worst bound along any root-to-leaf path of a PHYSICAL build
    * subtree: a path reaching a data source with no bounding node is
    * Unbounded; a path whose first bound is a grouped aggregate is
    * GroupedAgg. Descends AQE wrappers, query stages, and cached
    * relations (the scale-adaptive operators persist their histogram
    * frames, which buries the producing subtree behind an
    * InMemoryTableScan leaf). */
  private def buildBound(p: SparkPlan): Bound = p match {
    case a: AdaptiveSparkPlanExec => buildBound(a.initialPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      buildBound(q.plan)
    case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      buildBound(c.relation.cachedPlan)
    case _ => nodeBound(p) match {
      case Some(b) => b
      case None =>
        if (p.children.isEmpty) Unbounded
        else {
          val cs = p.children.map(buildBound)
          if (cs.contains(Unbounded)) Unbounded
          else if (cs.contains(GroupedAgg)) GroupedAgg
          else Hard
        }
    }
  }

  /** [[buildBound]] for the LOGICAL side of a hinted join: same bound
    * classes over logical nodes, descending into cached-relation
    * physical plans where the optimizer spliced one in. */
  private def logicalBound(p: logical.LogicalPlan): Bound = p match {
    case a: logical.Aggregate =>
      if (a.groupingExpressions.isEmpty) Hard else GroupedAgg
    case _: logical.Deduplicate => GroupedAgg
    case _: logical.GlobalLimit | _: logical.LocalLimit |
         _: logical.LocalRelation | _: logical.OneRowRelation => Hard
    case r: logical.Range =>
      if (r.numElements.isValidLong && r.numElements.toLong <= 1000000L)
        Hard
      else Unbounded
    case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
      buildBound(m.cachedPlan)
    case _ =>
      if (p.children.isEmpty) Unbounded
      else {
        val cs = p.children.map(logicalBound)
        if (cs.contains(Unbounded)) Unbounded
        else if (cs.contains(GroupedAgg)) GroupedAgg
        else Hard
      }
  }

  private[tools] def audit(df: DataFrame): Seq[String] = {
    val qe = df.queryExecution
    val planStr = qe.executedPlan.toString
    val stringHits = Flags.filter(planStr.contains)
    // windows inside CACHED subplans hide behind InMemoryRelation
    // leaves of the logical plan — walk their physical cachedPlan too
    // (WindowExec there), or a persisted operator could smuggle an
    // unpartitioned window past the audit
    val cachedWindowHits = qe.optimizedPlan.collectWithSubqueries {
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        m.cachedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => "unpartitioned-window"
        }
    }.flatten
    val windowHits = (qe.optimizedPlan.collectWithSubqueries {
      case w: logical.Window if w.partitionSpec.isEmpty =>
        "unpartitioned-window"
      case w: logical.WindowGroupLimit if w.partitionSpec.isEmpty =>
        "unpartitioned-window"
    } ++ cachedWindowHits).distinct
    // hint-FORCED broadcasts only: the optimizer folds broadcast()
    // hints into the owning Join's JoinHint, so the logical plan is
    // where forced-vs-chosen is decidable. (An earlier spelling walked
    // the physical tree for BroadcastExchangeExec under the AQE
    // wrapper's inputPlan — which predates EnsureRequirements and
    // contains no exchanges at all, an audit-wide false negative; and
    // the post-EnsureRequirements tree cannot distinguish a forced
    // broadcast from a size-chosen one AQE would re-plan at scale.)
    val broadcastHits = qe.optimizedPlan.collectWithSubqueries {
      case j: logical.Join =>
        Seq((j.hint.leftHint, j.left), (j.hint.rightHint, j.right))
          .flatMap {
            case (Some(h), side) if h.strategy.contains(logical.BROADCAST) =>
              val leafNames = side.collectLeaves().map(_.nodeName).distinct
                .mkString("+")
              // LogicalRDD leaves (checkpointed frames) are anonymous —
              // the nodeName alone would let any FUTURE broadcast over
              // any checkpointed frame in the same query ride a stale
              // justification (ADVICE r16). Append the broadcast
              // side's output schema so the exception key names WHICH
              // frame was reviewed; a new frame = a new key = NEW hit.
              val leaves =
                if (leafNames.contains("LogicalRDD"))
                  leafNames +
                    side.output.map(_.name).mkString("[", ",", "]")
                else leafNames
              logicalBound(side) match {
                case Hard => Nil
                case GroupedAgg => Seq(s"grouped-agg-broadcast($leaves)")
                case Unbounded => Seq(s"unbounded-broadcast($leaves)")
              }
            case _ => Nil
          }
    }.flatten.distinct
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
