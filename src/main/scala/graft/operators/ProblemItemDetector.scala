package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Problem-item detector: find which rows of a failing batch poison a
  * sink by bisection (reference:
  * pkg/transformer/registry/problem_item_detector/transformer.go:41 —
  * binary-searches the batch around a failing push).
  *
  * `writeAttempt` is the sink action under test; the detector
  * recursively halves the id-range until single poison rows are
  * isolated. Driver-side control loop by design — this is an error-
  * triage harness, not a data-path operator; each probe is still a
  * distributed action.
  */
object ProblemItemDetector {

  /** Returns the minimal failing single-row ranges found, as (lo, hi]
    * boundaries on `idCol`. `maxProbes` bounds sink attempts. */
  def detect(df: DataFrame, idCol: String,
             writeAttempt: DataFrame => Unit,
             maxProbes: Int = 64): Seq[(Long, Long)] = {
    // the bisection probes the SAME failing batch O(poison · log n)
    // times; pin it for the triage so each probe filters cached rows
    // instead of re-executing the batch's upstream pipeline (a failing
    // batch is micro-batch-sized, so this holds at scale too)
    val batch = df.persist()
    try {
      val bounds = batch.agg(min(col(idCol)).cast("long"),
        max(col(idCol)).cast("long")).collect()(0)
      if (bounds.isNullAt(0)) return Nil
      var probes = 0
      def ok(lo: Long, hi: Long): Boolean = {
        probes += 1
        try {
          writeAttempt(batch.filter(col(idCol) > lo && col(idCol) <= hi))
          true
        } catch { case _: Exception => false }
      }
      def search(lo: Long, hi: Long): Seq[(Long, Long)] = {
        if (probes >= maxProbes) return Seq((lo, hi))
        if (ok(lo, hi)) return Nil
        if (hi - lo <= 1) return Seq((lo, hi)) // single item isolated
        val mid = lo + (hi - lo) / 2
        search(lo, mid) ++ search(mid, hi)
      }
      search(bounds.getLong(0) - 1, bounds.getLong(1))
    } finally { batch.unpersist(); () }
  }
}
