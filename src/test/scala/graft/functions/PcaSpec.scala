package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Pca]]: Jacobi correctness, fitted-model laws (orthonormality,
  * eigen equation, variance ordering), projection + whitening, and
  * determinism across partitioning. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // planted 4-dim data with dominant variance along (1,1,0,0)/sqrt(2)
  // and secondary along (0,0,1,-1)/sqrt(2)
  private def planted = spark.range(0, 600).select(col("id"),
    array(
      (pmod(col("id") * 37, lit(101)).cast("double") - 50) / 10
        + (pmod(col("id") * 53, lit(7)).cast("double") - 3) / 30,
      (pmod(col("id") * 37, lit(101)).cast("double") - 50) / 10
        - (pmod(col("id") * 53, lit(7)).cast("double") - 3) / 30,
      (pmod(col("id") * 11, lit(31)).cast("double") - 15) / 40,
      (lit(15) - pmod(col("id") * 11, lit(31)).cast("double")) / 40
    ).as("v"))

  test("jacobi solves a known symmetric matrix") {
    // eigenvalues of [[2,1],[1,2]] are 3 and 1
    val (vals, vecs) = Pca.jacobi(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals.sorted.zip(Array(1.0, 3.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // columns are orthonormal
    val dot = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    assert(math.abs(dot) < 1e-9)
  }

  test("fit: components orthonormal, eigenvalues descending, " +
    "first component is the planted dominant direction") {
    val m = Pca.fit(planted, "v", k = 3)
    assert(m.eigenvalues.length == 3)
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    for (a <- m.components; b <- m.components) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val want = if (a eq b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-6, s"dot=$dot want=$want")
    }
    val c0 = m.components(0)
    val r2 = 1.0 / math.sqrt(2)
    assert(math.abs(math.abs(c0(0)) - r2) < 0.05 &&
      math.abs(math.abs(c0(1)) - r2) < 0.05 &&
      math.abs(c0(2)) < 0.05 && math.abs(c0(3)) < 0.05,
      c0.mkString(","))
  }

  test("projection variance matches eigenvalues; whitening normalizes") {
    val m = Pca.fit(planted, "v", k = 2)
    val proj = Pca.project(planted, "v", m, roundTo = 9)
      .select(element_at(col("proj"), 1).as("p1"),
        element_at(col("proj"), 2).as("p2"))
    val stats = proj.agg(
      variance(col("p1")).as("v1"), variance(col("p2")).as("v2"),
      avg(col("p1")).as("m1")).head()
    // sample variance vs population eigenvalue: within 1%
    assert(math.abs(stats.getDouble(0) - m.eigenvalues(0))
      / m.eigenvalues(0) < 0.01)
    assert(math.abs(stats.getDouble(2)) < 1e-6) // centered
    val white = Pca.project(planted, "v", m, whiten = true, roundTo = 9)
      .select(element_at(col("proj"), 1).as("w1"))
      .agg(variance(col("w1"))).as[Double].head()
    assert(math.abs(white - 1.0) < 0.02)
  }

  test("gram + fit are deterministic across partitioning") {
    val g1 = Pca.gram(planted, "v").orderBy("i", "j")
      .as[(Int, Int, Double)].collect().toSeq
    val g2 = Pca.gram(planted.repartition(13), "v").orderBy("i", "j")
      .as[(Int, Int, Double)].collect().toSeq
    assert(g1 == g2) // decimal sums: bit-identical under any layout
    val m1 = Pca.fit(planted, "v", 2)
    val m2 = Pca.fit(planted.repartition(7), "v", 2)
    assert(m1.components.map(_.toSeq).toSeq ==
      m2.components.map(_.toSeq).toSeq)
  }
}
