package graft.sources

import graft.model.{CdcEnvelope => E}
import graft.operators.Collapse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBLog-style consistent snapshot + stream reconciliation (reference:
  * pkg/dblog — incremental_iterator.go:71-111 interleaves snapshot
  * chunks with the CDC stream using watermark writes to a signal table).
  *
  * Spark needs no watermark protocol: the snapshot is one immutable
  * read, and consistency comes from MERGE semantics — every snapshot
  * row enters as an insert OLDER than any CDC event (lsn = -inf), so a
  * concurrent change replayed from the log always wins. The reconcile
  * is a per-key last-write-wins collapse; chunking is Spark partitioning.
  */
object DbLog {

  /** Reconcile a snapshot frame with a CDC changelog into final state.
    * `snapshotLsn` is the log position the snapshot was taken at
    * (≙ PositionalStorage.Position, storage.go:300-309): only events
    * beyond it need applying; older ones are already inside the
    * snapshot image. */
  def reconcile(snapshot: DataFrame, changelog: DataFrame,
                pks: Seq[String], snapshotLsn: Long = Long.MinValue): DataFrame = {
    val snapEvents = E.fromSnapshot(snapshot, lit(Long.MinValue))
    val newer = changelog.filter(col(E.Lsn) > snapshotLsn)
    val cols = (E.dataCols(snapEvents) ++ Seq(E.Kind, E.Lsn, E.Counter))
    def proj(d: DataFrame) = d.select(cols.map(col).toIndexedSeq: _*)
    val merged = Collapse.lastWriteWins(
      proj(snapEvents).unionByName(proj(newer)), pks)
    merged.filter(col(E.Kind) =!= E.Delete)
      .select(E.dataCols(snapshot).map(col): _*)
  }
}
