package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SnapshotDiff]]: set/content classification between two snapshots. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def statuses(rows: Seq[(Long, String)]) = rows.toMap

  test("classifies added / removed / changed / unchanged") {
    val a = Seq((1L, "x", "p"), (2L, "y", "q"), (3L, "z", "r"))
      .toDF("id", "t", "u")
    val b = Seq((1L, "x", "p"), (2L, "Y2", "q"), (4L, "w", "s"))
      .toDF("id", "t", "u")
    val got = SnapshotDiff.diff(a, b, "id", Seq("t", "u"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("length prefix: (ab,c) vs (a,bc) is changed, not unchanged") {
    val a = Seq((1L, "ab", "c")).toDF("id", "t", "u")
    val b = Seq((1L, "a", "bc")).toDF("id", "t", "u")
    val got = SnapshotDiff.diff(a, b, "id", Seq("t", "u"))
      .as[(Long, String)].head()
    assert(got == (1L, "changed"))
  }

  test("NULL payload cells fingerprint stably (regression: a both-sides " +
    "key with a NULL column must not classify as added)") {
    val a = Seq((1L, Option.empty[String], "p"),
      (2L, Some("x"), "q")).toDF("id", "t", "u")
    val bSame = a
    val got = SnapshotDiff.diff(a, bSame, "id", Seq("t", "u"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "unchanged"))
    // NULL -> value transition is a content change
    val b2 = Seq((1L, Some("now"), "p"), (2L, Some("x"), "q"))
      .toDF("id", "t", "u")
    val got2 = SnapshotDiff.diff(a, b2, "id", Seq("t", "u"))
      .as[(Long, String)].collect().toMap
    assert(got2(1L) == "changed" && got2(2L) == "unchanged")
  }

  test("summary counts per class") {
    val a = spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"))
    val b = spark.range(10, 110).select(col("id"),
      when(col("id") % 10 === 0, col("id") * 3)
        .otherwise(col("id") * 2).as("v"))
    val m = SnapshotDiff.summary(a, b, "id", Seq("v"))
      .as[(String, Long)].collect().toMap
    assert(m("added") == 10 && m("removed") == 10)
    assert(m("changed") == 9 && m("unchanged") == 81)
  }
}
