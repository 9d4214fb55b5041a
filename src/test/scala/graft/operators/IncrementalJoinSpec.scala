package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[IncrementalJoin]]: maintained view == full recompute under
  * arbitrary insert/delete batches on both sides. */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def rel(rows: Seq[(Long, String)], cols: (String, String)) =
    rows.toDF(cols._1, cols._2)

  private def viewOf(a: DataFrame, b: DataFrame) =
    IncrementalJoin.joinRel(IncrementalJoin.lift(a),
      IncrementalJoin.lift(b), Seq("k"))

  private def rows(df: DataFrame) =
    df.select("k", "av", "bv", IncrementalJoin.MultCol)
      .as[(Long, String, String, Long)].collect().toSet

  test("maintained view equals recompute; prev x prev never re-joined") {
    val aPrev = rel(Seq((1L, "a1"), (2L, "a2"), (3L, "a3")), ("k", "av"))
    val bPrev = rel(Seq((1L, "b1"), (2L, "b2"), (2L, "b2x")), ("k", "bv"))
    // insert a4 (new key 4 matches nothing yet), delete a2;
    // insert b4 (matches the just-inserted a4: the dA x dB term),
    // delete one of key-2's two b rows
    val dA = IncrementalJoin.delta(
      rel(Seq((4L, "a4")), ("k", "av")),
      rel(Seq((2L, "a2")), ("k", "av")))
    val dB = IncrementalJoin.delta(
      rel(Seq((4L, "b4")), ("k", "bv")),
      rel(Seq((2L, "b2")), ("k", "bv")))
    val maintained = IncrementalJoin.step(
      viewOf(aPrev, bPrev), IncrementalJoin.lift(aPrev), dA,
      IncrementalJoin.lift(bPrev), dB, Seq("k"))
    val aFinal = rel(Seq((1L, "a1"), (3L, "a3"), (4L, "a4")), ("k", "av"))
    val bFinal = rel(Seq((1L, "b1"), (2L, "b2x"), (4L, "b4")), ("k", "bv"))
    assert(rows(maintained) == rows(viewOf(aFinal, bFinal)))
    // a2's deletion retracted BOTH of key 2's joined rows, and the
    // b-side deletion then nets to nothing extra
    assert(!rows(maintained).exists(_._2 == "a2"))
  }

  test("duplicate rows carry multiplicity and deletes retract one copy") {
    val a = rel(Seq((1L, "x"), (1L, "x")), ("k", "av")) // mult 2
    val b = rel(Seq((1L, "y")), ("k", "bv"))
    val v0 = viewOf(a, b)
    assert(rows(v0) == Set((1L, "x", "y", 2L)))
    // delete one copy of the duplicated a row
    val dA = IncrementalJoin.delta(rel(Nil, ("k", "av")),
      rel(Seq((1L, "x")), ("k", "av")))
    val v1 = IncrementalJoin.step(v0, IncrementalJoin.lift(a), dA,
      IncrementalJoin.lift(b),
      IncrementalJoin.lift(rel(Nil, ("k", "bv")))
        .withColumn(IncrementalJoin.MultCol, lit(0L)), Seq("k"))
    assert(rows(v1) == Set((1L, "x", "y", 1L)))
  }

  test("delete-everything nets the view to empty (zeros dropped)") {
    val a = rel(Seq((1L, "x")), ("k", "av"))
    val b = rel(Seq((1L, "y")), ("k", "bv"))
    val dA = IncrementalJoin.delta(rel(Nil, ("k", "av")),
      rel(Seq((1L, "x")), ("k", "av")))
    val empty = IncrementalJoin.delta(rel(Nil, ("k", "bv")),
      rel(Nil, ("k", "bv")))
    val v1 = IncrementalJoin.step(viewOf(a, b),
      IncrementalJoin.lift(a), dA, IncrementalJoin.lift(b), empty, Seq("k"))
    assert(v1.count() == 0)
  }

  test("multi-step maintenance stays consistent (random-ish batches)") {
    // base universes; apply 3 batches per side, check against recompute
    def aRows(p: Long => Boolean) =
      (0L until 40L).filter(p).map(i => (i % 10, s"a$i"))
    def bRows(p: Long => Boolean) =
      (0L until 60L).filter(p).map(i => (i % 10, s"b$i"))
    var aCur = aRows(_ % 3 != 0); var bCur = bRows(_ % 4 != 0)
    var view = viewOf(rel(aCur, ("k", "av")), rel(bCur, ("k", "bv")))
    val steps = Seq[(Long => Boolean, Long => Boolean)](
      (i => i % 3 == 0 && i < 20, i => i % 4 == 0 && i < 30),
      (i => i % 5 == 0, i => i % 7 == 0),
      (i => i % 2 == 1 && i > 30, i => i % 2 == 0 && i > 40))
    for (((insA, insB), step) <- steps.zipWithIndex) {
      val aIns = aRows(insA).filterNot(aCur.contains)
      val bIns = bRows(insB).filterNot(bCur.contains)
      // also delete a sliver each round
      val aDel = aCur.filter(_._2.endsWith(s"${step + 1}"))
      val bDel = bCur.filter(_._2.endsWith(s"${step + 2}"))
      val dA = IncrementalJoin.delta(rel(aIns, ("k", "av")),
        rel(aDel, ("k", "av")))
      val dB = IncrementalJoin.delta(rel(bIns, ("k", "bv")),
        rel(bDel, ("k", "bv")))
      view = IncrementalJoin.step(view,
        IncrementalJoin.lift(rel(aCur, ("k", "av"))), dA,
        IncrementalJoin.lift(rel(bCur, ("k", "bv"))), dB, Seq("k"))
        .localCheckpoint()
      aCur = (aCur ++ aIns).filterNot(aDel.contains)
      bCur = (bCur ++ bIns).filterNot(bDel.contains)
      assert(rows(view) ==
        rows(viewOf(rel(aCur, ("k", "av")), rel(bCur, ("k", "bv")))),
        s"diverged at step $step")
    }
  }
}
