package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Catalyst optimizer rule: rewrite interval-containment joins into the
  * bucketized equi-join shape of [[graft.operators.RangeJoin]] —
  * automatically, inside the optimizer, so plain Spark SQL like
  *
  *   SELECT ... FROM points p JOIN intervals i
  *   ON p.x >= i.lo AND p.x < i.hi
  *
  * stops planning as a nested loop over every (point, interval) pair.
  * This is the SparkSessionExtensions layer of the engine (SURVEY §2.8
  * applied to plans, not scalar functions): the rewrite the DataFrame
  * API offers as an explicit operator becomes transparent for the SQL
  * surface, the way commercial engines ship range-join optimization.
  *
  * Enabled by setting `spark.graft.rangejoin.bucketWidth` (native units
  * of the point column) — granularity is a physical-design choice near
  * the typical interval span, so it is an explicit knob, not a guess.
  *
  * Rewrite (correct for ANY conjunction containing the range pair):
  *   J = join(P, I, lo <= p AND p < hi AND rest)
  *     => project(J.output,
  *          join(P + [b = floor(p/w)],
  *               explode(I, b in [floor(lo/w) .. floor(hi/w)]),
  *               P.b = I.b AND lo <= p AND p < hi AND rest))
  * Each point holds exactly ONE bucket, so no pair is found twice; the
  * original predicates stay in the join condition, so near-misses
  * sharing a bucket are still filtered. Replication of an interval is
  * ceil(span/w)+1 rows — bounded, shuffle-keyed, skew-free for spans
  * ~ w, where the nested loop was |P|x|I|.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private val Marker = "__rj_b"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val widthStr = conf.getConfString("spark.graft.rangejoin.bucketWidth", "")
    if (widthStr.isEmpty) return plan
    val width = widthStr.toDouble
    require(width > 0, s"spark.graft.rangejoin.bucketWidth must be > 0")

    plan transformUp {
      // streaming joins are excluded: their range conditions carry
      // watermark/state-cleanup semantics the rewrite would detach
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !j.isStreaming && !alreadyRewritten(cond) =>
        findRangePair(cond, left, right) match {
          case Some((p, lo, hi, pointsLeft)) =>
            val (points, intervals) = if (pointsLeft) (left, right) else (right, left)

            def bucketOf(e: Expression): Expression =
              Cast(Floor(Divide(Cast(e, DoubleType), Literal(width))), LongType)

            val pB = Alias(bucketOf(p), Marker)()
            val pPlan = Project(points.output :+ pB, points)

            val iB = AttributeReference(Marker, LongType, nullable = false)()
            // Sequence is TimeZoneAwareExpression: the analyzer's
            // ResolveTimeZone already ran, so set the zone explicitly
            // or the new node stays unresolved
            val bLo = bucketOf(lo)
            val bHi = bucketOf(hi)
            val span = Subtract(bHi, bLo)
            val rawSeq = Sequence(bLo, bHi,
              Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
            // per-row guards — the un-rewritten join tolerates dirty
            // interval rows, so the rewrite must too:
            //  - inverted (lo > hi): unsatisfiable -> no buckets (the
            //    raw Sequence would throw on start > stop with step 1)
            //  - span > 10M buckets (incl. +Inf bounds, whose cast
            //    lands at Long.MaxValue, and subtraction wrap-around
            //    seen as span < 0 with bLo <= bHi): bucketWidth is
            //    wrong for this data by 7 orders of magnitude — fail
            //    with a diagnosis instead of an opaque Sequence error
            val maxSpan = Literal(10000000L)
            val emptyBuckets = Literal.create(Seq.empty[Long],
              org.apache.spark.sql.types.ArrayType(LongType, false))
            val seq = CaseWhen(Seq(
              (GreaterThan(bLo, bHi), emptyBuckets),
              (Or(GreaterThan(span, maxSpan), LessThan(span, Literal(0L))),
                Cast(new RaiseError(Literal("graft range-join rewrite: " +
                  "interval spans more than 10M buckets — raise spark.graft." +
                  "rangejoin.bucketWidth toward the typical interval span " +
                  "or unset it to disable the rewrite")),
                  emptyBuckets.dataType))),
              Some(rawSeq))
            val gen = Generate(Explode(seq),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(iB), child = intervals)

            val newCond = And(EqualTo(pB.toAttribute, iB), cond)
            val (nl, nr) = if (pointsLeft) (pPlan, gen) else (gen, pPlan)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }

  private def alreadyRewritten(cond: Expression): Boolean =
    cond.exists {
      case a: Attribute => a.name == Marker
      case _ => false
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Find (point, lo, hi, pointOnLeft): a conjunct pair `lo <= p` and
    * `p < hi` (either spelling/orientation, < or <=) where `p` resolves
    * from one join side and BOTH bounds from the other. */
  private def findRangePair(cond: Expression, left: LogicalPlan,
                            right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjuncts(cond)

    def side(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    def numeric(e: Expression): Boolean =
      e.dataType.isInstanceOf[NumericType]

    // normalize every comparison conjunct to (smaller, larger)
    val ordered: Seq[(Expression, Expression)] = conjuncts.flatMap {
      case LessThanOrEqual(a, b) => Some((a, b))
      case LessThan(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case GreaterThan(a, b) => Some((b, a))
      case _ => None
    }.filter { case (a, b) =>
      numeric(a) && numeric(b) && side(a).isDefined && side(b).isDefined &&
        side(a) != side(b)
    }

    // lower bound: (lo, p); upper bound: (p, hi) — match on the same p
    (for {
      (lo, p1) <- ordered
      (p2, hi) <- ordered
      if p1.semanticEquals(p2) && !lo.semanticEquals(p2)
      pSide <- side(p1)
      loSide <- side(lo)
      hiSide <- side(hi)
      if loSide != pSide && hiSide != pSide
    } yield (p1, lo, hi, pSide)).headOption
  }
}
