package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Model-based quality scoring via EXACT closed-form ridge
  * regression — the "fit a tiny linear scorer on cheap features,
  * score the whole corpus" recipe of web-scale data curation (the
  * classifier stage of the public CCNet/FineWeb-style pipelines,
  * linear flavor).
  *
  * Why closed-form: at 100 TB the only regression you can make
  * deterministic AND cheap is one whose sufficient statistics are a
  * handful of corpus sums. For d features the normal-equation matrix
  * `X'X` is d(d+1)/2 numbers — ONE scan with map-side partial
  * aggregation, a shuffle that carries ~d^2 rows per task total, and
  * a driver-side solve on planning-scale data (same bounded-collect
  * discipline as [[Pca.fit]] and the IVF centroid snapshot). No
  * gradient loop, no per-iteration pass.
  *
  * Why integer features: with integer-valued features and target the
  * moment sums are exact integers, the Cramer determinants are exact
  * BigInt arithmetic, and the final weights are a SINGLE double
  * division of two exactly-known values — byte-identical across
  * engines (the DuckDB oracle replays the same HUGEINT determinants).
  * This is the regression flavor of the repo-wide decimal-sum
  * discipline.
  *
  * Scoring is a pure literal-weight projection: codegen'd, zero
  * shuffle, inline in any downstream filter.
  */
object Regression {

  /** Exact integer moment sums; DECIMAL(38,0) holds corpus sums of
    * long-sized per-row products to ~10^38. */
  private val MomType = DecimalType(38, 0)

  /** Fitted 2-feature-plus-intercept model `y ~ w0 + w1 x1 + w2 x2`.
    * Determinants are kept so callers (and tests) can check the
    * exactness invariants; weights are the only thing scoring needs. */
  final case class Model3(w0: Double, w1: Double, w2: Double,
      det: BigInt, n: Long)

  /** One-scan sufficient statistics for the 3x3 normal equations:
    * `n, Σx1, Σx2, Σx1², Σx1x2, Σx2², Σy, Σx1y, Σx2y` as exact
    * DECIMAL(38,0) sums (order-independent, map-side combinable —
    * the aggregate ships 9 numbers per task regardless of corpus
    * size). `x1, x2, y` MUST be integer-valued expressions. */
  def moments3(df: DataFrame, x1: Column, x2: Column, y: Column)
      : Array[BigInt] = {
    def m(c: Column) = sum(c.cast("long").cast(MomType))
    val row = df.select(x1.cast("long").as("x1"), x2.cast("long").as("x2"),
        y.cast("long").as("y"))
      .agg(count(lit(1)).cast(MomType).as("n"),
        m(col("x1")).as("s1"), m(col("x2")).as("s2"),
        m(col("x1") * col("x1")).as("s11"),
        m(col("x1") * col("x2")).as("s12"),
        m(col("x2") * col("x2")).as("s22"),
        m(col("y")).as("sy"),
        m(col("x1") * col("y")).as("s1y"),
        m(col("x2") * col("y")).as("s2y"))
      .head()
    Array.tabulate(9)(i => BigInt(row.getDecimal(i).toBigInteger))
  }

  /** det of the symmetric 3x3 [[a b c] [b d e] [c e f]] — exact. */
  private def det3(a: BigInt, b: BigInt, c: BigInt,
      d: BigInt, e: BigInt, f: BigInt): BigInt =
    a * (d * f - e * e) - b * (b * f - c * e) + c * (b * e - c * d)

  /** Cramer solve of the ridge normal equations `(X'X + λ diag(0,1,1))
    * w = X'y` — λ is an integer so every determinant stays exact; the
    * intercept is not penalized (standard ridge). When y is EXACTLY
    * linear in (1, x1, x2) and λ=0, Cramer yields `detI = wI * det`
    * in integers and the double division is exact — the recovery law
    * RegressionSpec pins. */
  def solveRidge3(s: Array[BigInt], lambda: BigInt): Model3 = {
    val Array(n, s1, s2, s11, s12, s22, sy, s1y, s2y) = s
    // A = [[n s1 s2] [s1 s11+λ s12] [s2 s12 s22+λ]], b = [sy s1y s2y]
    val (d11, d22) = (s11 + lambda, s22 + lambda)
    val det = det3(n, s1, s2, d11, s12, d22)
    require(det != 0, "singular normal matrix (collinear features)")
    // replace column i by b; expand along the replaced column
    val det0 = sy * (d11 * d22 - s12 * s12) -
      s1 * (s1y * d22 - s12 * s2y) + s2 * (s1y * s12 - d11 * s2y)
    val det1 = n * (s1y * d22 - s12 * s2y) -
      sy * (s1 * d22 - s2 * s12) + s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (d11 * s2y - s1y * s12) -
      s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - d11 * s2)
    Model3(det0.toDouble / det.toDouble, det1.toDouble / det.toDouble,
      det2.toDouble / det.toDouble, det, n.toLong)
  }

  /** Fit + score in the canonical shape: one moment scan, driver
    * Cramer, then a literal-weight codegen projection appended as
    * `predCol` (w0 + w1·x1 + w2·x2 as double, the engine-portable
    * left-to-right IEEE order). */
  def fitScore3(df: DataFrame, x1: Column, x2: Column, y: Column,
      lambda: BigInt, predCol: String): (DataFrame, Model3) = {
    val m = solveRidge3(moments3(df, x1, x2, y), lambda)
    val pred = lit(m.w0) + lit(m.w1) * x1.cast("double") +
      lit(m.w2) * x2.cast("double")
    (df.withColumn(predCol, pred), m)
  }
}
