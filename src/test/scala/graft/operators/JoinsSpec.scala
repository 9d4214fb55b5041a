package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plan has no shuffle exchange on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = graft.Tables.load(spark, sf(), "orders")
      val l = graft.Tables.load(spark, sf(), "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      Bucketing.writeBucketed(o, "b_orders", 4, Seq("o_orderkey"))
      Bucketing.writeBucketed(l, "b_lineitem", 4, Seq("o_orderkey"))
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == l.count()) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted join returns exactly the unsalted join's rows") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v") // key 1 is hot
    val small = Seq((1L, "one"), (2L, "two"), (500L, "x")).toDF("k", "name")
    val expected = big.join(small, "k").select("k", "v", "name")
      .collect().toSet
    val got = SaltedJoin.join(big, small, "k", salt = 8)
      .select("k", "v", "name").collect().toSet
    assert(got == expected)
    // stable-hash salt: same results, and the salt of any row is a pure
    // function of the salt column — reproducible across partitionings
    val stable = SaltedJoin.join(big, small, "k", salt = 8,
      saltCol = Some("v"))
    assert(stable.select("k", "v", "name").collect().toSet == expected)
    val s1 = SaltedJoin.join(big.repartition(3), small, "k", salt = 8,
      saltCol = Some("v")).withColumn("__s",
        pmod(graft.functions.Hashing.hex8ToLong(col("v").cast("string")), lit(8L)))
    assert(s1.select("__s").distinct().count() <= 8)
  }

  test("asof join backward picks latest right at-or-before each left time") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "early"),
      (2L, 15L, "c"), (3L, 50L, "nokey")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 18L, 200.0), (2L, 15L, 300.0),
      (2L, 99L, 999.0)).toDF("k", "t", "price")
    val out = AsofJoin.join(left, right, Seq("k"), "t", "t")
      .select("k", "t", "tag", "r_price", "r_t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(out == Set(
      (1L, 10L, "a", Some(100.0), Some(10L)),     // equal time matches
      (1L, 20L, "b", Some(200.0), Some(18L)),
      (1L, 5L, "early", None, None),              // nothing at-or-before
      (2L, 15L, "c", Some(300.0), Some(15L)),     // later right row ignored
      (3L, 50L, "nokey", None, None)))            // left-outer on no key
  }

  test("asof join never matches on NULL keys (SQL equi-join semantics)") {
    val left = Seq((Option(1L), 10L), (None: Option[Long], 10L))
      .toDF("k", "t")
    val right = Seq((Option(1L), 5L, "v1"), (None: Option[Long], 5L, "vnull"))
      .toDF("k", "t", "v")
    val out = AsofJoin.join(left, right, Seq("k"), "t", "t")
      .select("k", "r_v").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    // the NULL-key left row finds nothing, like DuckDB ASOF and the
    // broadcast spelling; the real key still matches
    assert(out == Set((Some(1L), Some("v1")), (None, None)))
  }

  test("asof join never matches on NULL times (either side, either direction)") {
    // DuckDB ASOF / merge_asof: a NULL timestamp compares UNKNOWN, so a
    // NULL-time right row is never a candidate and a NULL-time left row
    // matches nothing. Unguarded, the window sort parks NULLs at one end
    // of the partition where last(ignoreNulls) CAN see them: backward
    // asc-NULLS-FIRST feeds NULL-time right rows to every left row with
    // no earlier match; forward desc-NULLS-LAST gives a NULL-time left
    // row the entire partition as its frame.
    val left = Seq((1L, Option(3L), "early"), (1L, None: Option[Long], "lnull"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, Option(5L), "v5"), (1L, None: Option[Long], "vnull"))
      .toDF("k", "t", "v")
    for (dir <- Seq("backward", "forward")) {
      val out = AsofJoin.join(left, right, Seq("k"), "t", "t", direction = dir)
        .select("tag", "r_v").collect()
        .map(r => (r.getString(0), Option(r.get(1)))).toMap
      assert(out("lnull").isEmpty, s"$dir: NULL-time left row matched")
      val early = out("early")
      if (dir == "backward") assert(early.isEmpty,
        "backward: t=3 has no right row at-or-before, NULL must not fill in")
      else assert(early.contains("v5"),
        "forward: t=3 must match t=5, not the NULL-time row")
    }
  }

  test("asof join forward + tolerance") {
    val left = Seq((1L, 10L), (1L, 40L)).toDF("k", "t")
    val right = Seq((1L, 12L, "near"), (1L, 90L, "far")).toDF("k", "t", "v")
    val fwd = AsofJoin.join(left, right, Seq("k"), "t", "t",
        direction = "forward")
      .select("t", "r_v").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(fwd == Set((10L, Some("near")), (40L, Some("far"))))
    val tol = AsofJoin.join(left, right, Seq("k"), "t", "t",
        direction = "forward", tolerance = Some(lit(10L)))
      .select("t", "r_v").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(tol == Set((10L, Some("near")), (40L, None))) // 90 is 50 away
  }

  test("asof join does not tear null right value columns") {
    // right row at t=20 has a NULL v; a torn (per-column ignoreNulls)
    // implementation would surface t=10's v with t=20's w
    val left = Seq((1L, 30L)).toDF("k", "t")
    val right = Seq((1L, 10L, Option("old"), Option("ow")),
      (1L, 20L, None: Option[String], Option("nw"))).toDF("k", "t", "v", "w")
    val row = AsofJoin.join(left, right, Seq("k"), "t", "t")
      .select("r_t", "r_v", "r_w").collect().head
    assert(row.getLong(0) == 20L && row.isNullAt(1) && row.getString(2) == "nw")
  }

  test("asof join matches DuckDB-style windowed reference on real tables") {
    // independent re-derivation: per (user, left-time) the max right time
    // <= left time via a plain SQL correlated aggregate
    val ev = graft.Tables.load(spark, sf(), "events")
    val leftE = ev.filter(col("event_id") % 5 =!= 0)
      .select(col("user_id"), col("ts"), col("event_id"))
    val rightE = ev.filter(col("event_id") % 5 === 0)
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("state"))
    val got = AsofJoin.join(leftE, rightE, Seq("user_id"), "ts", "ts")
    leftE.createOrReplaceTempView("aj_l"); rightE.createOrReplaceTempView("aj_r")
    val ref = spark.sql("""
      SELECT l.user_id, l.ts, l.event_id,
             (SELECT MAX(r.ts) FROM aj_r r
               WHERE r.user_id = l.user_id AND r.ts <= l.ts) AS r_ts
      FROM aj_l l""")
    val a = got.select(col("user_id"), col("ts"), col("event_id"),
      col("r_ts")).collect().toSet
    val b = ref.collect().toSet
    assert(a == b)
  }

  test("native asof merge operator matches the window spelling exactly") {
    val left = graft.Tables.load(spark, sf(), "events")
      .filter(col("event_id") % 5 =!= 0)
      .select("user_id", "ts", "event_id")
    val right = graft.Tables.load(spark, sf(), "events")
      .filter(col("event_id") % 5 === 0)
      .groupBy("user_id", "ts").agg(max(col("value")).as("state"))
    val native = AsofJoinNative.join(left, right, Seq("user_id"), "ts", "ts")
    // the physical plan must carry the custom exec, co-partitioned
    // (Exchange inserted by EnsureRequirements) and per-key sorted
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(600))
    assert(plan.contains("Exchange hashpartitioning(user_id"), plan.take(1200))
    val a = native.select("event_id", "r_state", "r_ts").collect()
      .map(_.toString).sorted.toSeq
    val b = AsofJoin.join(left, right, Seq("user_id"), "ts", "ts")
      .select("event_id", "r_state", "r_ts").collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("native asof merge operator: null keys/times and empty-side behavior") {
    val left = Seq(
      (Some(1L), Some(10L), "a"), (Some(1L), Some(30L), "b"),
      (None: Option[Long], Some(10L), "nk"), (Some(1L), None: Option[Long], "nt"),
      (Some(9L), Some(10L), "nomatch"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (Some(1L), Some(10L), 1.0), (Some(1L), Some(20L), 2.0),
      (None: Option[Long], Some(5L), 99.0), (Some(1L), None: Option[Long], 98.0))
      .toDF("k", "t", "v")
    val out = AsofJoinNative.join(left, right, Seq("k"), "t", "t")
      .select(col("tag"), col("r_v")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a") == Some(1.0))   // equal time matches (inclusive)
    assert(out("b") == Some(2.0))   // latest at-or-before
    assert(out("nk").isEmpty)       // NULL left key never matches
    assert(out("nt").isEmpty)       // NULL left time never matches
    assert(out("nomatch").isEmpty)  // key with no right rows
  }

  test("broadcast asof join matches the shuffle spelling exactly") {
    val left = graft.Tables.load(spark, sf(), "events")
      .filter(col("event_id") % 5 =!= 0)
      .select("user_id", "ts", "event_id")
    val right = graft.Tables.load(spark, sf(), "events")
      .filter(col("event_id") % 5 === 0)
      .groupBy("user_id", "ts").agg(max(col("value")).as("state"))
    val viaShuffle = AsofJoin.join(left, right, Seq("user_id"), "ts", "ts")
      .select("event_id", "r_state", "r_ts").collect()
      .map(_.toString).sorted.toSeq
    val viaBroadcast = AsofJoinBroadcast.join(
        left, right, Seq("user_id"), "ts", "ts")
      .select("event_id", "r_state", "r_ts").collect()
      .map(_.toString).sorted.toSeq
    assert(viaBroadcast == viaShuffle)
  }

  test("broadcast asof probe: tie times pick the last sorted entry, " +
    "null right times never match, before-history probes yield null") {
    val left = Seq((1L, 10L, "at-tie"), (1L, 3L, "before-all"),
      (1L, 99L, "after-all")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, Some(10L), 1.0), (1L, Some(10L), 2.0),  // tie at t=10
      (1L, Some(50L), 3.0),
      (1L, None: Option[Long], 99.0))              // null rt: no match
      .toDF("k", "t", "v")
    val out = AsofJoinBroadcast.join(left, right, Seq("k"), "t", "t")
      .select(col("tag"), col("r_v")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("at-tie") == Some(2.0))   // last sorted tie wins
    assert(out("before-all").isEmpty)    // only the null-rt entry earlier
    assert(out("after-all") == Some(3.0))
  }

  test("broadcast asof join never shuffles the left side") {
    val left = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "t", "v")
    val plan = AsofJoinBroadcast.join(left, right, Seq("k"), "t", "t")
      .queryExecution.executedPlan.toString
    // only the tiny right aggregation may exchange; the probe side must
    // go straight into a BroadcastHashJoin
    assert(plan.contains("BroadcastHashJoin"), plan)
    val streamSide = plan.split("BroadcastHashJoin")(1)
      .split("BroadcastExchange")(0)
    assert(!streamSide.contains("Exchange"),
      "left side must not shuffle:\n" + plan)
  }

  test("broadcast asof probe is GENERATED code: compiles with codegen " +
    "fallback disabled, stays in whole-stage codegen, and the generated " +
    "binary search agrees with the interpreted eval") {
    val left = graft.Tables.load(spark, sf(), "events")
      .filter(col("event_id") % 5 =!= 0)
      .select("user_id", "ts", "event_id")
    val right = graft.Tables.load(spark, sf(), "events")
      .filter(col("event_id") % 5 === 0)
      .groupBy("user_id", "ts").agg(max(col("value")).as("state"))
    def run() = AsofJoinBroadcast.join(left, right, Seq("user_id"),
        "ts", "ts")
      .select("event_id", "r_state", "r_ts").collect()
      .map(_.toString).sorted.toSeq
    // fallback OFF: a doGenCode that fails janino compilation would
    // throw here instead of silently running interpreted
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val generated = try run()
    finally spark.conf.set("spark.sql.codegen.fallback", "true")
    // the probe projection must sit INSIDE a WholeStageCodegen span
    // (its plan line carries the `*(n)` codegen marker) — on the FINAL
    // AQE plan: codegen spans only appear once stages have run
    val df = AsofJoinBroadcast.join(left, right, Seq("user_id"),
      "ts", "ts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val probeLine = plan.linesIterator
      .find(_.contains("graft_asof_pick")).getOrElse("")
    assert("""\*\(\d+\) Project""".r.findFirstIn(probeLine).nonEmpty,
      "probe projection fell out of whole-stage codegen:\n" + plan)
    // interpreted twin (whole-stage codegen off => nullSafeEval path)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interpreted = try run()
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(generated == interpreted)
  }

  test("range join bucketization equals the naive inequality join") {
    val pts = (1 to 500).map(i => (i.toLong % 7, i.toDouble)).toDF("g", "p")
    val ivs = Seq((0L, 10.0, 40.0, "A"), (0L, 35.0, 36.0, "tiny"),
      (3L, 100.0, 400.0, "wide"), (5L, 480.0, 600.0, "edge"),
      (6L, 700.0, 800.0, "empty")).toDF("g", "lo", "hi", "name")
    val naive = pts.join(ivs, Seq("g")).filter(col("lo") <= col("p") &&
      col("p") < col("hi")).select("g", "p", "name").collect().toSet
    for (gran <- Seq(5.0, 50.0, 1000.0)) {
      val got = RangeJoin.pointInterval(pts, "p", ivs, "lo", "hi", gran,
        keys = Seq("g")).select("g", "p", "name").collect().toSet
      assert(got == naive, s"granularity $gran")
    }
    // no duplicate pairs even when an interval spans many buckets
    val dup = RangeJoin.pointInterval(pts, "p", ivs, "lo", "hi", 5.0,
      keys = Seq("g")).groupBy("g", "p", "name").count()
      .filter(col("count") > 1).count()
    assert(dup == 0)
  }
}
