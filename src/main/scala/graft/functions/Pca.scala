package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact distributed PCA / whitening over an embedding column — the
  * standard pre-pass of embedding-space pipelines (whitening before
  * cosine dedup/retrieval, dimensionality reduction before
  * clustering; cf. the public SemDeDup/retrieval literature).
  *
  * Split by where each piece of math belongs:
  *   - the d x d second-moment (Gram) matrix and the d mean sums are
  *     CORPUS-side: one pass, exploded to (i, j, product) with
  *     map-side partial aggregation, so the shuffle carries ~d^2 rows
  *     per task regardless of corpus size (the N·d^2 multiply work is
  *     inherent to a Gram matrix; it runs inside the scan stage).
  *     Products are cast to DECIMAL before summing — corpus sums must
  *     be order-independent to reproduce across engines and layouts
  *     (the repo-wide decimal discipline);
  *   - the eigendecomposition is DRIVER-side: a d x d symmetric
  *     matrix is planning-scale data (64 x 64 here — the same
  *     bounded-collect rule as the IVF centroid snapshot), solved
  *     with a deterministic cyclic Jacobi sweep;
  *   - the projection is CORPUS-side again: k literal component
  *     vectors folded into k dot products per row, pure codegen
  *     projection, zero shuffle.
  */
object Pca {

  /** Decimal scale for corpus sums: products of unit-scale floats at
    * 12 fractional digits; DECIMAL(27,12) holds corpora to ~10^13
    * rows of unit-magnitude products. */
  private val SumType = DecimalType(27, 12)

  /** Upper-triangle second-moment sums `(i, j, m2)` (0-based, i <= j)
    * plus per-dimension sums — everything [[fit]] needs, in one
    * corpus pass each. `m2 = Σ v_i·v_j` as exact DECIMAL cast to
    * double at the boundary. */
  def gram(df: DataFrame, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast(DoubleType))
    df.select(v.as("__v"))
      .select(posexplode(col("__v")).as(Seq("i", "x")), col("__v"))
      .select(col("i"), col("x"), posexplode(col("__v")).as(Seq("j", "y")))
      .filter(col("j") >= col("i"))
      .select(col("i"), col("j"),
        (col("x") * col("y")).cast(SumType).as("__p"))
      .groupBy("i", "j")
      .agg(sum(col("__p")).cast(SumType).cast(DoubleType).as("m2"))
  }

  /** Per-dimension sums and the row count: `(i, s, n)`. */
  def dimSums(df: DataFrame, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast(DoubleType))
    df.select(posexplode(v).as(Seq("i", "x")))
      .groupBy("i")
      .agg(sum(col("x").cast(SumType)).cast(SumType).cast(DoubleType).as("s"),
        count(lit(1)).as("n"))
  }

  /** Fitted components: `components(c)(dim)`, eigenvalues desc, and
    * the mean vector. Deterministic: covariance from the exact
    * decimal sums, cyclic Jacobi, eigenvalue-desc order (ties by
    * first-dimension magnitude), sign fixed so each component's
    * largest-|entry| coordinate is positive. */
  final case class Model(components: Array[Array[Double]],
                         eigenvalues: Array[Double],
                         mean: Array[Double])

  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    val m2 = gram(df, vecCol).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val sums = dimSums(df, vecCol).collect()
      .map(r => (r.getInt(0), (r.getDouble(1), r.getLong(2)))).toMap
    val d = sums.size
    // ragged vectors or null entries give per-dimension counts that
    // disagree and would silently skew mean/covariance — fail loudly
    require((0 until d).forall(sums.contains),
      s"embedding dimensions not contiguous 0..${d - 1}: " +
        s"got ${sums.keys.toSeq.sorted.take(8).mkString(",")}...")
    val counts = sums.values.map(_._2).toSet
    require(counts.size == 1,
      s"ragged embeddings: per-dimension counts disagree ($counts); " +
        "every vector must have the same length with no null entries")
    val n = sums.values.head._2.toDouble
    val mean = Array.tabulate(d)(i => sums(i)._1 / n)
    // covariance = M2/n - mean outer mean
    val a = Array.tabulate(d, d) { (i, j) =>
      val key = if (i <= j) (i, j) else (j, i)
      m2(key) / n - mean(i) * mean(j)
    }
    val (vals, vecs) = jacobi(a)
    val order = vals.indices.sortBy(c => (-vals(c), c))
    val top = order.take(k)
    val comps = top.map { c =>
      val comp = Array.tabulate(d)(i => vecs(i)(c))
      // sign convention: the largest-|entry| coordinate is positive
      val pivot = comp.indices.maxBy(i => (math.abs(comp(i)), -i))
      if (comp(pivot) < 0) comp.map(-_) else comp
    }.toArray
    Model(comps, top.map(vals(_)).toArray, mean)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * deterministic sweep order (row-major upper triangle), fixed
    * convergence threshold. Returns (eigenvalues, eigenvector matrix
    * with vectors in COLUMNS). d is planning-scale (<= a few hundred),
    * so the O(d^3) driver cost is microseconds-to-millis. */
  private[functions] def jacobi(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 64 && offDiag(a) > 1e-12) {
      for (p <- 0 until d; q <- (p + 1) until d if math.abs(a(p)(q)) > 1e-15) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) match {
          case 0.0 => 1.0
          case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** Project each vector onto the model's components: `(.., proj)`
    * where proj(c) = (v - mean) · component_c, optionally whitened by
    * 1/sqrt(eigenvalue). Components enter as literal arrays — k·d
    * multiply-adds per row inside codegen, zero shuffle (the
    * [[Similarity.hyperplaneBucket]] discipline). */
  def project(df: DataFrame, vecCol: String, model: Model,
              whiten: Boolean = false, roundTo: Int = 6): DataFrame = {
    val v = transform(col(vecCol), x => x.cast(DoubleType))
    val meanArr = array(model.mean.map(lit(_)).toIndexedSeq: _*)
    val centered = zip_with(v, meanArr, (x, m) => x - m)
    val proj = array(model.components.zipWithIndex.map { case (comp, c) =>
      val scale = if (whiten && model.eigenvalues(c) > 1e-12)
        1.0 / math.sqrt(model.eigenvalues(c)) else 1.0
      val compArr = array(comp.map(lit(_)).toIndexedSeq: _*)
      round(aggregate(zip_with(centered, compArr, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x) * scale, roundTo)
    }.toIndexedSeq: _*)
    df.withColumn("proj", proj)
  }
}
