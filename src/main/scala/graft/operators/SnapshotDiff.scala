package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — classify every key across two table
  * snapshots as `added` / `removed` / `changed` / `unchanged`.
  *
  * The everyday question behind incremental pipeline runs ("what do I
  * actually have to reprocess?") and behind the reference's
  * snapshot-vs-snapshot consistency tooling (cf. the checksum task,
  * pkg/worker/tasks/checksum.go — that one compares values in place;
  * this one classifies set membership and content drift between two
  * table states).
  *
  * Scale shape: each side is reduced IN THE SCAN STAGE to
  * `(key, md5(payload))` — 16 bytes of content per row cross the wire,
  * never the payload (for a 100 TB document corpus the join moves
  * ~key+16B per doc, a few hundred GB instead of the corpus). One
  * hash-partitioned full-outer join on the key; both sides co-partition
  * on it, and downstream consumers usually aggregate the result
  * immediately (see [[summary]]), which map-side combines.
  */
object SnapshotDiff {

  /** Per-key classification. `payloadCols` define content identity;
    * columns are length-prefixed before hashing so ("ab","c") never
    * collides with ("a","bc"), and each cell is null-coalesced to a
    * marker no length-prefixed value can produce (a bare space — real
    * cells always start with a length digit) so
    * a NULL cell never nulls the whole fingerprint — without the
    * coalesce, any NULL payload column makes `concat` NULL and a key
    * present in both snapshots would be misclassified as `added`. */
  def diff(a: DataFrame, b: DataFrame, keyCol: String,
           payloadCols: Seq[String]): DataFrame = {
    def fp(df: DataFrame) = df.select(col(keyCol),
      md5(concat(payloadCols.flatMap(c =>
        Seq(coalesce(
          concat(length(col(c).cast("string")).cast("string"), lit(":"),
            col(c).cast("string")), lit(" ")), lit("|"))): _*)).as("__fp"))
    val fa = fp(a).withColumnRenamed("__fp", "__fp_a")
    val fb = fp(b).withColumnRenamed("__fp", "__fp_b")
    fa.join(fb, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("__fp_a").isNull, lit("added"))
          .when(col("__fp_b").isNull, lit("removed"))
          .when(col("__fp_a") =!= col("__fp_b"), lit("changed"))
          .otherwise(lit("unchanged")))
      .select(col(keyCol), col("status"))
  }

  /** Count per class — the one-line run report. */
  def summary(a: DataFrame, b: DataFrame, keyCol: String,
              payloadCols: Seq[String]): DataFrame =
    diff(a, b, keyCol, payloadCols)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
