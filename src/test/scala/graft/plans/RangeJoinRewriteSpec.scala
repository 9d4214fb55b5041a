package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val W = "spark.graft.rangejoin.bucketWidth"

  private def fixtures() = {
    val pts = (1 to 2000).map(i => (i.toLong % 5, i.toDouble)).toDF("pg", "p")
    val ivs = Seq((0L, 100.0, 180.0, "a"), (2L, 500.0, 501.0, "tiny"),
      (3L, 0.0, 2000.0, "wide"), (4L, 3000.0, 4000.0, "empty"))
      .toDF("ig", "lo", "hi", "name")
    pts.createOrReplaceTempView("rj_pts")
    ivs.createOrReplaceTempView("rj_ivs")
    (pts, ivs)
  }

  test("SQL range join rewrites to a bucketized equi-join when enabled") {
    fixtures()
    val sql = """SELECT pg, p, name FROM rj_pts JOIN rj_ivs
                 ON pg = ig AND p >= lo AND p < hi"""
    spark.conf.unset(W)
    val naive = spark.sql(sql)
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct") ||
      // with the pg=ig equi conjunct Spark can hash-join; drop it below
      naivePlan.contains("Join"), naivePlan)
    val expected = naive.collect().map(_.toString).sorted

    try {
      spark.conf.set(W, "100")
      val rewritten = spark.sql(sql)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("__rj_b"), "rewrite did not fire:\n" + plan)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(rewritten.collect().map(_.toString).sorted.sameElements(expected))
    } finally spark.conf.unset(W)
  }

  test("pure inequality join (no equi conjunct) stops being a nested loop") {
    fixtures()
    val sql = "SELECT p, name FROM rj_pts JOIN rj_ivs ON p >= lo AND p < hi"
    spark.conf.unset(W)
    val naive = spark.sql(sql)
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val expected = naive.collect().map(_.toString).sorted
    try {
      spark.conf.set(W, "100")
      val fast = spark.sql(sql)
      val plan = fast.queryExecution.executedPlan.toString
      assert(plan.contains("__rj_b") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(fast.collect().map(_.toString).sorted.sameElements(expected))
    } finally spark.conf.unset(W)
  }

  test("orientation and spelling variants all rewrite to the same result") {
    fixtures()
    val variants = Seq(
      "SELECT p, name FROM rj_pts JOIN rj_ivs ON lo <= p AND p < hi",
      "SELECT p, name FROM rj_pts JOIN rj_ivs ON p < hi AND p >= lo",
      "SELECT p, name FROM rj_pts JOIN rj_ivs ON hi > p AND lo <= p",
      // intervals on the LEFT, points on the RIGHT
      "SELECT p, name FROM rj_ivs JOIN rj_pts ON p >= lo AND p < hi")
    spark.conf.unset(W)
    val expected = spark.sql(variants.head).collect().map(_.toString).sorted
    try {
      spark.conf.set(W, "100")
      for (v <- variants) {
        val df = spark.sql(v)
        assert(df.queryExecution.executedPlan.toString.contains("__rj_b"),
          s"no rewrite for: $v")
        assert(df.collect().map(_.toString).sorted.sameElements(expected), v)
      }
    } finally spark.conf.unset(W)
  }

  test("dirty interval rows: inverted matches nothing, huge span diagnoses") {
    val pts = (1 to 100).map(i => i.toDouble).toDF("p")
    pts.createOrReplaceTempView("rj_dirty_pts")
    try {
      spark.conf.set(W, "100")
      // inverted interval (lo > hi): unsatisfiable, must yield zero
      // rows — not crash (the naive plan also yields zero rows)
      Seq((500.0, 200.0, "inv"), (10.0, 50.0, "ok"))
        .toDF("lo", "hi", "name").createOrReplaceTempView("rj_dirty_ivs")
      val df = spark.sql("""SELECT p, name FROM rj_dirty_pts
        JOIN rj_dirty_ivs ON p >= lo AND p < hi""")
      assert(df.queryExecution.executedPlan.toString.contains("__rj_b"))
      assert(df.collect().map(_.getString(1)).forall(_ == "ok"))
      // open-ended interval: span overflows the bucket cap — must fail
      // with the diagnostic message, not an opaque Sequence error
      Seq((10.0, Double.PositiveInfinity, "open"))
        .toDF("lo", "hi", "name").createOrReplaceTempView("rj_dirty_ivs")
      val e = intercept[Exception] {
        spark.sql("""SELECT p, name FROM rj_dirty_pts
          JOIN rj_dirty_ivs ON p >= lo AND p < hi""").collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("rangejoin.bucketWidth")),
        messages(e).mkString(" | "))
    } finally spark.conf.unset(W)
  }

  test("non-range joins and outer joins are left untouched") {
    fixtures()
    try {
      spark.conf.set(W, "100")
      val equi = spark.sql(
        "SELECT p, name FROM rj_pts JOIN rj_ivs ON pg = ig")
      assert(!equi.queryExecution.executedPlan.toString.contains("__rj_b"))
      val outer = spark.sql(
        """SELECT p, name FROM rj_pts LEFT JOIN rj_ivs
           ON p >= lo AND p < hi""")
      assert(!outer.queryExecution.executedPlan.toString.contains("__rj_b"))
      // one-sided bound only
      val half = spark.sql(
        "SELECT p, name FROM rj_pts JOIN rj_ivs ON p >= lo AND pg = ig")
      assert(!half.queryExecution.executedPlan.toString.contains("__rj_b"))
    } finally spark.conf.unset(W)
  }
}
