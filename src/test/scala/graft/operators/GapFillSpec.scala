package graft.operators

import graft.SparkSpec

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  test("fills gaps forward per key on the step grid") {
    val obs = Seq(
      ("a", 0L, 10.0), ("a", 2L, 20.0), ("a", 5L, 50.0),
      ("b", 10L, 1.0), ("b", 11L, 2.0)).toDF("k", "ts", "v")
    val out = GapFill.fill(obs, Seq("k"), "ts", step = 1, Seq("v"))
      .as[(String, Long, Double)].collect().toSeq.sorted
    assert(out == Seq(
      ("a", 0L, 10.0), ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 20.0),
      ("a", 4L, 20.0), ("a", 5L, 50.0),
      ("b", 10L, 1.0), ("b", 11L, 2.0)))
  }

  test("step > 1 aligns the grid to each key's min; off-grid obs still carry") {
    val obs = Seq(("k", 100L, 1L), ("k", 103L, 2L), ("k", 110L, 3L))
      .toDF("g", "ts", "n")
    val out = GapFill.fill(obs, Seq("g"), "ts", step = 5, Seq("n"))
      .as[(String, Long, Long)].collect().toSeq.sorted
    // grid 100,105,110: the 103 observation is carried onto 105
    assert(out == Seq(("k", 100L, 1L), ("k", 105L, 2L), ("k", 110L, 3L)))
  }

  test("multiple value columns fill independently") {
    val obs = Seq((1L, 0L, Some(1.0), None: Option[String]),
      (1L, 2L, None: Option[Double], Some("x")))
      .toDF("k", "ts", "a", "b")
    val out = GapFill.fill(obs, Seq("k"), "ts", 1, Seq("a", "b"))
      .orderBy("ts").collect()
    // a carries 1.0 across all ticks; b is null until its first obs
    assert(out.map(r => (r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((0L, 1.0), (1L, 1.0), (2L, 1.0)))
    assert(out.map(_.isNullAt(3)).toSeq == Seq(true, true, false))
  }
}
