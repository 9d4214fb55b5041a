package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Explicit single-partition spelling for BOUNDED window frames.
  *
  * The repo has several windows that deliberately run in one
  * partition because their frame is domain/planning-sized (a
  * histogram's distinct values, bucket totals, k centroids — never
  * the corpus). Leaving the partition spec empty works but WindowExec
  * logs "No Partition Defined" on every run, burying real signals in
  * the bench tail; and `partitionBy(lit(1))` does NOT fix it — the
  * optimizer's EliminateWindowPartitions rule prunes foldable
  * partition keys, silently restoring the empty spec (and an
  * `Exchange SinglePartition` node plan-level asserts then trip on).
  */
object WindowKeys {

  /** All-rows-equal, NON-FOLDABLE partition key derived from a column
    * of the frame: `Window.partitionBy(onePartition(col))` pins the
    * frame into one explicit partition — identical execution shape to
    * an empty spec, but survives optimization and keeps plans free of
    * `Exchange SinglePartition`, so scale asserts can treat any
    * SinglePartition exchange as a genuine corpus-sized cliff.
    *
    * Spelled `coalesce(pmod(hash(c) as long, 1), 0)`: always 0, yet no
    * optimizer rule simplifies a pmod-by-one (unlike `c * 0`, which IS
    * folded to 0 for non-nullable c and then pruned from the spec).
    * `hash` is TOTAL — defined for every type and value including
    * NULL, NaN, and out-of-long-range doubles (a plain `cast(c as
    * long)` THROWS on overflow under ANSI mode — caught by
    * WindowKeysSpec), so the key can never fail at runtime. */
  def onePartition(c: Column): Column =
    coalesce(pmod(hash(c).cast("long"), lit(1L)), lit(0L))
}
