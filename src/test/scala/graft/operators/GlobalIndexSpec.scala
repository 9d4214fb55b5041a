package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GlobalIndexSpec extends SparkSpec {
  import spark.implicits._

  test("global index is dense, 0-based, and follows the sort order") {
    val df = (1 to 10000).map(i => (i * 37 % 99991, s"v$i")).toDF("k", "v")
      .distinct()
    val n = df.count()
    val idx = GlobalIndex.byOrder(df, Seq("k"), partitions = 8)
    val rows = idx.select("k", "global_idx").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.map(_._2).sorted.toSeq == (0L until n))
    // index order == key order
    assert(rows.sortBy(_._2).map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }

  test("matches single-task row_number on a small frame") {
    val df = Seq((5L, "e"), (1L, "a"), (9L, "z"), (3L, "c")).toDF("k", "v")
    val got = GlobalIndex.byOrder(df, Seq("k"), partitions = 3)
      .select("k", "global_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (3L, 1L), (5L, 2L), (9L, 3L)))
  }

  test("plan has no single-partition window exchange") {
    val df = spark.range(100000).select(col("id").as("k"))
    val plan = GlobalIndex.byOrder(df, Seq("k"), partitions = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no WindowExec expected:\n" + plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("empty frame yields empty result, not error") {
    val df = spark.range(0).select(col("id").as("k"))
    assert(GlobalIndex.byOrder(df, Seq("k")).count() == 0)
  }
}
