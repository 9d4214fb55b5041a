package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("intThresholds: ceil-rank semantics, exact at boundaries") {
    // values 1..10, one each: cum(v) = v, n = 10
    val df = (1L to 10L).toDF("v")
    val th = Quantiles.intThresholds(df, "v", Seq(500, 501, 1000, 100))
      .as[(Int, Long)].collect().toMap
    assert(th(500) == 5L)   // ceil(10*0.500) = 5 -> first v with cum>=5
    assert(th(501) == 6L)   // ceil(10*0.501) = 6 (the boundary flips)
    assert(th(1000) == 10L) // max
    assert(th(100) == 1L)   // ceil(1) = 1
    // skewed histogram: repeated values share a threshold
    val skew = (Seq.fill(90)(7L) ++ Seq(1L, 2L) ++ Seq.fill(8)(9L)).toDF("v")
    val t2 = Quantiles.intThresholds(skew, "v", Seq(500, 950))
      .as[(Int, Long)].collect().toMap
    assert(t2(500) == 7L && t2(950) == 9L)
  }

  test("gate keeps exactly the in-band rows") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val out = Quantiles.gate(df, "v", 50, 950)
      .select("id").as[Long].collect().toSeq.sorted
    assert(out == (5L to 95L)) // thresholds 5 and 95, inclusive band
    // degenerate: single distinct value -> everything in band
    val const = Seq.fill(20)(42L).toDF("v")
    assert(Quantiles.gate(const, "v", 50, 950).count() == 20)
  }

  test("LAW: a caller-supplied domain hint only picks the plan branch — " +
    "gate/winsorize/intThresholds answers identical under any hint") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val base = Quantiles.gate(df, "v", 50, 950)
      .select("id").as[Long].collect().toSet
    // a small hint (windowed branch) and an over-limit hint (bucketed
    // two-level branch) must both reproduce the unhinted answer —
    // a gate→winsorize chain threads ONE estimate through both stages
    for (hint <- Seq(Some(100L), Some(2000000L))) {
      assert(Quantiles.gate(df, "v", 50, 950, domainHint = hint)
        .select("id").as[Long].collect().toSet == base, s"hint=$hint")
      assert(Quantiles.winsorize(df, "v", 50, 950, domainHint = hint)
          .agg(sum("v")).as[Long].head() ==
        Quantiles.winsorize(df, "v", 50, 950)
          .agg(sum("v")).as[Long].head(), s"hint=$hint")
      assert(Quantiles.intThresholds(df, "v", Seq(250, 500),
          domainHint = hint)
          .collect().map(_.toSeq).toSet ==
        Quantiles.intThresholds(df, "v", Seq(250, 500))
          .collect().map(_.toSeq).toSet, s"hint=$hint")
    }
  }

  test("MAD outlier gate is robust where mean±3σ is not") {
    // 98 values near 100, one moderate outlier (3000), one extreme
    // corruption (1e6): the extreme inflates σ so badly that mean±3σ
    // MISSES the moderate outlier; median/MAD don't move, so the MAD
    // gate flags both
    val vals = ((1L to 98L).map(i => 95L + (i % 11))
        ++ Seq(3000L, 1000000L))
      .zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
    val df = vals.toDF("id", "g", "v")
    val out = Quantiles.groupedMadOutliers(df, "g", "v", k = 3)
    val flagged = out.filter(col("is_outlier"))
      .select("id").as[Long].collect().toSeq.sorted
    assert(flagged == Seq(98L, 99L), s"flagged=$flagged")
    // the stats the gate used: median and MAD from the CLEAN mass
    val r = out.select("med", "mad").head()
    assert(r.getLong(0) >= 95L && r.getLong(0) <= 106L)
    assert(r.getLong(1) <= 11L)
    // mean±3σ on the same data keeps the MODERATE outlier inside its
    // band (σ is inflated by the extreme point)
    val stats = df.agg(avg(col("v")), stddev_pop(col("v"))).head()
    assert(3000.0 < stats.getDouble(0) + 3 * stats.getDouble(1))
  }

  test("percentiles: the high-cardinality path equals the broadcast " +
    "path exactly and never single-partitions or broadcasts the domain") {
    // 50k distinct values, duplicated irregularly (id%7+1 copies)
    val df = spark.range(50000).select(col("id").as("doc"),
        (col("id") * 3 + 1).as("v"),
        explode(sequence(lit(1), (col("id") % 7 + 1).cast("int"))).as("__d"))
      .drop("__d")
    val small = Quantiles.percentiles(df, "v")
      .select("doc", "v", "permille")
    // force the large-domain path on the same data
    val large = Quantiles.percentiles(df, "v",
      smallDomainLimit = 10L, buckets = 8)
      .select("doc", "v", "permille")
    assert(small.count() == df.count())
    assert(small.exceptAll(large).isEmpty && large.exceptAll(small).isEmpty)
    // the large path must not move the domain through one partition
    // nor broadcast it to the corpus join
    val plan = large.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      plan)
    // spot-check exactness on the large path: every value appears
    // id%7+1 times; cum is a closed form the test recomputes
    val n = df.count()
    val got = large.filter(col("v") === lit(3L * 49999 + 1))
      .select("permille").distinct().as[Long].collect()
    assert(got.toSeq == Seq(1000L))
  }

  test("null metrics are excluded from n and cum identically in BOTH " +
    "plan branches (windowed sorts nulls first, bucketed routed them " +
    "last — the answer must not depend on the branch cutoff)") {
    // 5k distinct values ×2 copies, plus 1k null-metric rows
    val df = spark.range(5000).select(col("id").as("doc"),
        (col("id") * 2 + 1).as("v"),
        explode(sequence(lit(1), lit(2))).as("__d")).drop("__d")
      .unionByName(spark.range(1000).select(
        (col("id") + 100000).as("doc"), lit(null).cast("long").as("v")))
    val small = Quantiles.percentiles(df, "v")
      .select("doc", "v", "permille")
    val large = Quantiles.percentiles(df, "v",
      smallDomainLimit = 10L, buckets = 8)
      .select("doc", "v", "permille")
    // null rows have no percentile and drop out of both branches
    assert(small.count() == 10000L && large.count() == 10000L)
    assert(small.exceptAll(large).isEmpty && large.exceptAll(small).isEmpty)
    // n excludes nulls: the max value must sit at permille 1000
    assert(small.filter(col("v") === lit(9999L)).select("permille")
      .distinct().as[Long].collect().toSeq == Seq(1000L))

    // grouped twin: threshold family, nulls concentrated in one group
    val g = df.withColumn("g",
      concat(lit("g"), (col("doc") % 3).cast("string")))
    val tSmall = Quantiles.groupedThreshold(g, "g", "v", permille = 500)
    val tLarge = Quantiles.groupedThreshold(g, "g", "v", permille = 500,
      smallDomainLimit = 10L, buckets = 8)
    assert(tSmall.exceptAll(tLarge).isEmpty &&
      tLarge.exceptAll(tSmall).isEmpty)
    val pSmall = Quantiles.groupedPercentiles(g, "g", "v")
      .select("doc", "g", "v", "permille")
    val pLarge = Quantiles.groupedPercentiles(g, "g", "v",
      smallDomainLimit = 10L, buckets = 8)
      .select("doc", "g", "v", "permille")
    assert(pSmall.exceptAll(pLarge).isEmpty &&
      pLarge.exceptAll(pSmall).isEmpty)
  }

  test("percentiles: empty input returns the empty frame with the " +
    "permille column instead of tripping on the null total") {
    val empty = spark.range(10).select(col("id").as("doc"),
      (col("id") * 2).as("v")).filter(col("v") < 0)
    val out = Quantiles.percentiles(empty, "v")
    assert(out.columns.contains("permille"))
    assert(out.count() == 0L)
  }

  test("grouped family: the high-cardinality path equals the grouped-" +
    "window path exactly and never broadcasts nor single-partitions") {
    // two groups with different value scales, irregular duplication
    val df = spark.range(20000).select(col("id").as("doc"),
        concat(lit("g"), (col("id") % 3).cast("string")).as("g"),
        (col("id") * 3 + col("id") % 3).as("v"),
        explode(sequence(lit(1), (col("id") % 5 + 1).cast("int"))).as("__d"))
      .drop("__d")
    val small = Quantiles.groupedPercentiles(df, "g", "v")
      .select("doc", "g", "v", "permille")
    val large = Quantiles.groupedPercentiles(df, "g", "v",
      smallDomainLimit = 10L, buckets = 8)
      .select("doc", "g", "v", "permille")
    assert(small.count() == df.count())
    assert(small.exceptAll(large).isEmpty && large.exceptAll(small).isEmpty)
    val plan = large.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("BroadcastExchange"), plan)

    val tSmall = Quantiles.groupedThreshold(df, "g", "v", permille = 500)
    val tLarge = Quantiles.groupedThreshold(df, "g", "v", permille = 500,
      smallDomainLimit = 10L, buckets = 8)
    assert(tSmall.exceptAll(tLarge).isEmpty &&
      tLarge.exceptAll(tSmall).isEmpty)
    val tPlan = tLarge.queryExecution.executedPlan.toString
    assert(!tPlan.contains("Exchange SinglePartition"), tPlan)
    assert(!tPlan.contains("BroadcastExchange"), tPlan)
  }
}
