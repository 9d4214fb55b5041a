package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Regression]]: exact-recovery and orthogonality laws of the
  * closed-form ridge solve, shrinkage direction, and determinism
  * across partitioning (the sums are exact integers, so the fitted
  * model must be bit-identical however the corpus is laid out). */
class RegressionSpec extends SparkSpec {

  // integer features with planted structure; x2 deliberately NOT a
  // multiple of x1 so the normal matrix is well-conditioned
  private def planted = spark.range(0, 500).select(col("id"),
    pmod(col("id") * 37, lit(211)).as("x1"),
    pmod(col("id") * 53, lit(97)).as("x2"))

  test("lambda=0 recovers an exactly-linear target EXACTLY") {
    // y = 3 + 2*x1 - x2: Cramer gives detI = wI * det in integers,
    // so the double division is exact, not approximate
    val df = planted.withColumn("y", lit(3) + col("x1") * 2 - col("x2"))
    val m = Regression.solveRidge3(
      Regression.moments3(df, col("x1"), col("x2"), col("y")), BigInt(0))
    assert(m.w0 == 3.0 && m.w1 == 2.0 && m.w2 == -1.0)
    assert(m.n == 500L)
  }

  test("lambda=0 residuals are orthogonal to the design") {
    // noisy target: exact solve must still zero X'r up to fp error
    val df = planted.withColumn("y",
      lit(5) + col("x1") * 3 + pmod(col("id") * 17, lit(13)) - 6)
    val m = Regression.solveRidge3(
      Regression.moments3(df, col("x1"), col("x2"), col("y")), BigInt(0))
    val r = df.select(
        (col("y").cast("double") - (lit(m.w0) + lit(m.w1) * col("x1")
          + lit(m.w2) * col("x2"))).as("r"),
        col("x1").cast("double"), col("x2").cast("double"))
      .agg(sum(col("r")), sum(col("r") * col("x1")),
        sum(col("r") * col("x2")))
      .head()
    // scale-relative tolerance: moments are O(1e9)
    (0 until 3).foreach(i => assert(math.abs(r.getDouble(i)) < 1e-4))
  }

  test("ridge shrinks the slope coefficients toward zero") {
    val df = planted.withColumn("y",
      lit(5) + col("x1") * 3 + pmod(col("id") * 17, lit(13)) - 6)
    val s = Regression.moments3(df, col("x1"), col("x2"), col("y"))
    val ols = Regression.solveRidge3(s, BigInt(0))
    val ridge = Regression.solveRidge3(s, BigInt(100000000L))
    // the lawful invariant: the PENALIZED coefficient L2 norm is
    // monotone non-increasing in lambda (individual coordinates may
    // trade against each other when features correlate)
    def norm2(m: Regression.Model3) = m.w1 * m.w1 + m.w2 * m.w2
    assert(norm2(ridge) < norm2(ols))
    assert(math.abs(ridge.w1) < math.abs(ols.w1))
  }

  test("fitted model is bit-identical across repartitioning") {
    val df = planted.withColumn("y",
      lit(7) + col("x1") + pmod(col("id") * 29, lit(19)))
    def fit(d: org.apache.spark.sql.DataFrame) = Regression.solveRidge3(
      Regression.moments3(d, col("x1"), col("x2"), col("y")), BigInt(2500))
    val a = fit(df)
    val b = fit(df.repartition(17, col("id")))
    assert(a.w0 == b.w0 && a.w1 == b.w1 && a.w2 == b.w2 && a.det == b.det)
  }

  test("collinear features are rejected, not silently solved") {
    val df = planted.withColumn("x2", col("x1") * 2)
      .withColumn("y", col("x1") * 3)
    intercept[IllegalArgumentException] {
      Regression.solveRidge3(
        Regression.moments3(df, col("x1"), col("x2"), col("y")), BigInt(0))
    }
  }

  test("fitScore3 appends a pure projection (no extra shuffle)") {
    val df = planted.withColumn("y", lit(3) + col("x1") * 2 - col("x2"))
    val (scored, m) = Regression.fitScore3(df, col("x1"), col("x2"),
      col("y"), BigInt(0), "pred")
    // exact model => predictions equal the target exactly
    val bad = scored.filter(col("pred") =!= col("y").cast("double")).count()
    assert(bad == 0L)
    assert(m.w1 == 2.0)
    // scoring plan: no Exchange below the projection
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || {
      // the moment scan already ran at fit time; scoring itself is
      // df -> project, which on a fresh range source has no shuffle
      val scoreOnly = df.withColumn("pred",
        lit(m.w0) + lit(m.w1) * col("x1") + lit(m.w2) * col("x2"))
      !scoreOnly.queryExecution.executedPlan.toString.contains("Exchange")
    })
  }
}
