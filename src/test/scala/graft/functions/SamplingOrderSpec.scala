package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sampling.reservoirPerGroup]] and [[Sampling.trainOrder]]:
  * determinism, bounds, and the two-level-shuffle invariants. */
class SamplingOrderSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.range(0, 400)
    .select(col("id").as("doc_id"),
      concat(lit("g"), (col("id") % 7).cast("string")).as("grp"))

  test("reservoirPerGroup: exactly k per group, ranks 1..k") {
    val got = Sampling.reservoirPerGroup(docs, Seq("grp"), "doc_id",
      k = 5, seed = 1)
    val perGroup = got.groupBy("grp").agg(count(lit(1)).as("n"),
      min("draw_rank").as("lo"), max("draw_rank").as("hi"))
      .as[(String, Long, Int, Int)].collect()
    assert(perGroup.length == 7)
    assert(perGroup.forall(g => g._2 == 5 && g._3 == 1 && g._4 == 5))
  }

  test("reservoirPerGroup: k >= group size returns the whole group") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "grp")
    val got = Sampling.reservoirPerGroup(tiny, Seq("grp"), "doc_id",
      k = 10, seed = 9)
    assert(got.count() == 3)
    assert(got.groupBy("grp").count().as[(String, Long)].collect()
      .toMap == Map("a" -> 2, "b" -> 1))
  }

  test("reservoirPerGroup: deterministic across partitioning and runs") {
    def draw(df: org.apache.spark.sql.DataFrame) =
      Sampling.reservoirPerGroup(df, Seq("grp"), "doc_id", k = 4, seed = 42)
        .as[(String, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(draw(docs) == draw(docs.repartition(13)))
    // different seed draws a different sample
    val other = Sampling.reservoirPerGroup(docs, Seq("grp"), "doc_id",
      k = 4, seed = 43).as[(String, Long, Int)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(draw(docs) != other)
  }

  test("trainOrder: bijective (shard,pos) over the input, pos dense per shard") {
    val got = Sampling.trainOrder(docs.select("doc_id"), "doc_id",
      shards = 8, seed = 5)
    assert(got.count() == 400)
    // every row lands in [0,8) with a unique (shard, pos)
    assert(got.filter(col("shard") < 0 || col("shard") >= 8).count() == 0)
    assert(got.select("shard", "pos").distinct().count() == 400)
    // pos is 1..|shard| dense within each shard
    val dense = got.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .as[(Long, Long, Int, Int)].collect()
    assert(dense.forall(s => s._3 == 1 && s._4 == s._2))
    // the hash-rank is not the identity order: some shard's pos order
    // differs from doc_id order
    val monotone = got.withColumn("prev", lag("doc_id", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("pos")))
      .filter(col("prev").isNotNull && col("prev") > col("doc_id"))
    assert(monotone.count() > 0)
  }

  test("trainOrder: reruns regenerate byte-identical order") {
    def order() = Sampling.trainOrder(docs.select("doc_id"), "doc_id",
        shards = 4, seed = 11)
      .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(order() == order())
  }

  test("apportion: floors + largest remainders, deterministic ties") {
    assert(Sampling.apportion(Map("a" -> 0.5, "b" -> 0.5), 10) ==
      Map("a" -> 5L, "b" -> 5L))
    // 97 * (.45,.25,.2,.1) = 43.65/24.25/19.4/9.7 -> bump zh then en
    assert(Sampling.apportion(Map("en" -> 0.45, "de" -> 0.25,
      "fr" -> 0.2, "zh" -> 0.1), 97) ==
      Map("en" -> 44L, "de" -> 24L, "fr" -> 19L, "zh" -> 10L))
    // equal remainders break on domain name ascending
    assert(Sampling.apportion(Map("x" -> 1.0, "y" -> 1.0, "z" -> 1.0), 4) ==
      Map("x" -> 2L, "y" -> 1L, "z" -> 1L))
    // weights need not be normalized
    assert(Sampling.apportion(Map("a" -> 3.0, "b" -> 1.0), 8) ==
      Map("a" -> 6L, "b" -> 2L))
  }

  test("mixture: quotas met, dense positions, proportional interleave") {
    val m = Sampling.mixture(docs.withColumn("dom",
        concat(lit("d"), (col("doc_id") % 3).cast("string")))
        .select(col("doc_id"), col("dom")),
      "dom", "doc_id",
      weights = Map("d0" -> 0.5, "d1" -> 0.3, "d2" -> 0.2),
      total = 20L, seed = 5).cache()
    val byDom = m.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom == Map("d0" -> 10L, "d1" -> 6L, "d2" -> 4L))
    val pos = m.select("pos").as[Int].collect().sorted
    assert(pos.toSeq == (1 to 20))
    // stride scheduling: the first half of the schedule already holds
    // about half of each domain's quota (no domain-block ordering)
    val firstHalf = m.filter(col("pos") <= 10).groupBy("dom").count()
      .as[(String, Long)].collect().toMap
    assert(firstHalf.getOrElse("d0", 0L) >= 4 &&
      firstHalf.getOrElse("d1", 0L) >= 2 &&
      firstHalf.getOrElse("d2", 0L) >= 1)
    // deterministic across reruns
    val again = Sampling.mixture(docs.withColumn("dom",
        concat(lit("d"), (col("doc_id") % 3).cast("string")))
        .select(col("doc_id"), col("dom")),
      "dom", "doc_id",
      weights = Map("d0" -> 0.5, "d1" -> 0.3, "d2" -> 0.2),
      total = 20L, seed = 5)
    assert(m.collect().toSeq.sortBy(_.getAs[Int]("pos")) ==
      again.collect().toSeq.sortBy(_.getAs[Int]("pos")))
  }

  test("mixture: a domain smaller than its quota contributes all it has") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "dom")
    val m = Sampling.mixture(tiny, "dom", "doc_id",
      weights = Map("a" -> 0.5, "b" -> 0.5), total = 6L, seed = 1)
    val byDom = m.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom == Map("a" -> 2L, "b" -> 1L))
  }

  test("mixture: budgets past maxGlobalPos refuse a global pos window " +
    "loudly; emitPos=false plans without a SinglePartition exchange") {
    val docs4 = docs.withColumn("dom",
      concat(lit("d"), (col("doc_id") % 4).cast("string")))
      .select(col("doc_id"), col("dom"))
    val w = Map("d0" -> 0.4, "d1" -> 0.3, "d2" -> 0.2, "d3" -> 0.1)
    // the gate: a past-the-bound budget with a global pos would
    // single-partition the selection — the API must refuse, not
    // silently plan it (maxGlobalPos defaults to 10^7, inclusive)
    val e = intercept[IllegalArgumentException] {
      Sampling.mixture(docs4, "dom", "doc_id", w,
        total = 20000000L, seed = 3)
    }
    assert(e.getMessage.contains("emitPos=false"))
    // the scale spelling: same budget, key-only output — no pos column,
    // no SinglePartition anywhere in the plan
    val m = Sampling.mixture(docs4, "dom", "doc_id", w,
      total = 20000000L, seed = 3, emitPos = false)
    assert(!m.columns.contains("pos") && m.columns.contains("sched_key"))
    val plan = m.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
    // quotas beyond the corpus: every row drawn, keys strictly follow
    // the stride fractions — composing with trainOrder gives shard-
    // local order without any global window
    assert(m.count() == docs4.count())
    val ordered = Sampling.trainOrder(m, "doc_id", shards = 4, seed = 9)
    assert(ordered.count() == docs4.count())
  }

  test("mixture: fixed-point sched_key preserves the stride order the " +
    "lcm spelling defined (lcm-free at any quota)") {
    // quotas 3 and 5 (lcm path would scale by 15): interleave order of
    // the stride fractions (2r-1)/(2q) is a/b alternating by value —
    // recompute the expected order from exact rationals driver-side
    val tiny = (1L to 20L).map(i => (i, if (i <= 10) "a" else "b"))
      .toDF("doc_id", "dom")
    val m = Sampling.mixture(tiny, "dom", "doc_id",
        weights = Map("a" -> 0.375, "b" -> 0.625), total = 8L, seed = 2)
      .select("dom", "draw_rank", "pos")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    val expected = m.map { case (d, r, _) =>
      val q = if (d == "a") 3L else 5L
      (BigDecimal(2 * r - 1) / BigDecimal(2 * q), d, r)
    }.sortBy { case (f, d, _) => (f, d) }
      .zipWithIndex.map { case ((_, d, r), i) => (d, r, i + 1) }
    assert(m.sortBy(_._3).toSeq == expected.toSeq)
  }

  test("weightedSample: heavy weights dominate, no replacement, k cap") {
    // ids 0-999: weight 1000 for ids < 100, weight 1 otherwise — the
    // A-ES draw of 100 must be overwhelmingly from the heavy tier
    val df = spark.range(0, 1000).select(col("id").as("doc_id"),
      when(col("id") < 100, 1000).otherwise(1).as("w"))
    val out = Sampling.weightedSample(df, "doc_id", "w", k = 100, seed = 3)
      .collect()
    assert(out.length == 100)
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == 100) // without replacement
    val heavy = ids.count(_ < 100)
    assert(heavy >= 80, s"heavy-tier draws: $heavy/100")
  }

  test("weightedSample equals the window re-rank and survives repartition") {
    val df = spark.range(0, 500).select(col("id").as("doc_id"),
      (pmod(col("id") * 7, lit(13)) + 1).as("w"))
    val viaHeap = Sampling.weightedSample(df, "doc_id", "w", 50, seed = 9)
      .orderBy("draw_rank").collect().map(_.toSeq).toSeq
    val viaHeapRep = Sampling.weightedSample(
        df.repartition(11), "doc_id", "w", 50, seed = 9)
      .orderBy("draw_rank").collect().map(_.toSeq).toSeq
    assert(viaHeap == viaHeapRep)
    import org.apache.spark.sql.expressions.Window
    val u = (graft.functions.Hashing.seeded(col("doc_id").cast("string"), 9)
      .cast("double") + 1.0) / 4294967296.0
    val viaWindow = df.filter(col("w") > 0)
      .select(col("doc_id"), pow(u, lit(1.0) / col("w").cast("double")).as("pr"))
      .withColumn("draw_rank", row_number().over(
        Window.orderBy(col("pr").desc, col("doc_id"))).cast("int"))
      .filter(col("draw_rank") <= 50)
      .select("doc_id", "draw_rank")
      .orderBy("draw_rank").collect().map(_.toSeq).toSeq
    assert(viaHeap == viaWindow)
  }

  test("weightedSample with k >= population returns everyone, ranked") {
    val df = spark.range(0, 20).select(col("id").as("doc_id"), lit(5).as("w"))
    val out = Sampling.weightedSample(df, "doc_id", "w", 100, seed = 1)
    assert(out.count() == 20)
  }
}
