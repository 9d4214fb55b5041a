package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Mergeable cardinality / frequency sketches with ENGINE-EXACT state.
  *
  * Classic sketch libraries hash with engine-private functions, so two
  * engines agree only approximately. Here every register value derives
  * from md5 + integer comparisons — bit-identical in any engine — so
  * the DuckDB oracle recomputes the *exact* sketch state, and the
  * correctness gate hash-matches it like any exact query.
  *
  * Scale shape (the reason sketches exist): both sketches are ONE
  * aggregation whose partial states merge associatively (HLL registers
  * merge via max, CMS cells via sum), so Spark's map-side combine
  * reduces each input partition to a fixed-size state — a few KB
  * crossing the shuffle per partition regardless of input size. At
  * 100 TB that is the difference between counting distincts with a
  * terabyte-wide shuffle and with a 4 KB one.
  *
  * Reference ground: the reference meters row/byte flows with exact
  * counters (pkg/stats); a 100-TB deployment of the same pipeline needs
  * sublinear equivalents, which is this module.
  */
object Sketches {

  /** Leading-zero rank of a 32-bit value (rho in the HLL paper,
    * Flajolet et al. 2007): 1 + count of leading zeros, 33 for zero.
    * A chain of integer comparisons — exact in any engine, and the
    * DuckDB twin below is generated from the same loop. */
  private[graft] def rho32(h: Column): Column =
    (1 to 32).foldLeft(when(h >= (1L << 31), 1)) { (acc, i) =>
      if (i == 1) acc else acc.when(h >= (1L << (32 - i)), i)
    }.otherwise(33)

  private[graft] def rho32Sql(h: String): String =
    "CASE " + (1 to 32).map(i =>
      s"WHEN $h >= ${1L << (32 - i)} THEN $i").mkString(" ") +
      " ELSE 33 END"

  /** 8-bit bucket + 32-bit suffix hash, both md5-derived. */
  private def bucket8(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 2), 16, 10).cast(LongType)
  private def suffix32(v: Column): Column =
    conv(substring(md5(v.cast("string")), 3, 8), 16, 10).cast(LongType)

  /** HyperLogLog register table for a column: 256 rows (bucket, r) where
    * r is the max leading-zero rank seen in the bucket. Registers from
    * disjoint data merge with max — union two register tables and
    * re-aggregate to combine sketches (e.g. per-day sketches folding
    * into a month without touching the raw data). */
  def hllRegisters(df: DataFrame, colName: String): DataFrame = {
    val v = col(colName)
    df.filter(v.isNotNull)
      .select(bucket8(v).as("bucket"), rho32(suffix32(v)).as("rho"))
      .groupBy("bucket").agg(max("rho").as("r"))
  }

  /** Merge several register tables (sketch union = per-bucket max). */
  def hllMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _).groupBy("bucket").agg(max("r").as("r"))

  /** Cardinality estimate from a register table (driver-side — the
    * input is <= 256 rows by construction). Standard HLL bias-corrected
    * harmonic mean with the small-range linear-counting fallback. */
  def hllEstimate(registers: DataFrame): Double = {
    val m = 256
    val regs = registers.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val zeros = m - regs.size
    val sum = (0 until m).map(b =>
      math.pow(2.0, -regs.getOrElse(b.toLong, 0).toDouble)).sum
    val alpha = 0.7213 / (1 + 1.079 / m)
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** Count-Min sketch table: `depth` md5-salted hash rows x `width`
    * columns, each cell the count of rows hashing into it. Cells from
    * disjoint data merge with sum. Output (j, c, cnt), at most
    * depth*width rows. */
  def cmsTable(df: DataFrame, colName: String,
               depth: Int = 4, width: Int = 1024): DataFrame = {
    val v = col(colName).cast("string")
    df.filter(col(colName).isNotNull)
      .select(explode(array((0 until depth).map(lit(_)): _*)).as("j"), v.as("v"))
      .select(col("j"),
        pmod(conv(substring(md5(concat(col("j").cast("string"), lit(":"),
          col("v"))), 1, 8), 16, 10).cast(LongType), lit(width.toLong)).as("c"))
      .groupBy("j", "c").agg(count(lit(1)).as("cnt"))
  }

  /** KMV (k-minimum-values / bottom-k theta) sketch: the k smallest
    * DISTINCT 48-bit md5-derived hash values of a column. Where HLL
    * only answers cardinality, KMV also answers set INTERSECTION:
    * because every engine keeps the same k smallest hashes, two
    * sketches can be compared value-by-value (Jaccard over the union
    * sketch — Beyer et al., SIGMOD'07). 48 bits keeps every hash exact
    * in a BIGINT on both engines.
    *
    * Scale shape: distinct-then-take-k-smallest is a map-side-combined
    * aggregate plus a TakeOrdered — per-partition state is k values. */
  def kmvHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast(LongType)

  def kmvSketch(df: DataFrame, colName: String, k: Int = 256): DataFrame =
    df.filter(col(colName).isNotNull)
      .select(kmvHash(col(colName)).as("h")).distinct()
      .orderBy("h").limit(k)

  /** Union of KMV sketches = k smallest of the merged value sets. */
  def kmvUnion(sketches: Seq[DataFrame], k: Int = 256): DataFrame =
    sketches.reduce(_ unionByName _).distinct().orderBy("h").limit(k)

  /** Distinct-count estimate: exact when the sketch is not full (it
    * then holds every distinct hash), else (k-1) * 2^48 / h_k. */
  def kmvEstimate(sketch: DataFrame, k: Int = 256): Double = {
    val hs = sketch.orderBy("h").collect().map(_.getLong(0))
    if (hs.length < k) hs.length.toDouble
    else (k - 1).toDouble * math.pow(2.0, 48) / hs.last.toDouble
  }

  /** Jaccard + intersection estimate of two columns via their sketches:
    * the union sketch's values are membership-tested against each side.
    * Returns (jaccard, unionEstimate, intersectionEstimate). */
  def kmvJaccard(a: DataFrame, b: DataFrame, k: Int = 256): (Double, Double, Double) = {
    val u = kmvUnion(Seq(a, b), k)
    val inBoth = u.join(a, "h").join(b, "h").count()
    val uCount = u.count()
    val j = if (uCount == 0) 0.0 else inBoth.toDouble / uCount
    val uEst = kmvEstimate(u, k)
    (j, uEst, j * uEst)
  }

  /** Per-group distinct-count estimation through the native bounded
    * KMV aggregate ([[org.apache.spark.sql.graft.KmvExpr]]): at most
    * k longs per group per map task ship, whatever the group's
    * distinct cardinality — the sketch-grade alternative to
    * `groupBy(g).agg(countDistinct(v))`, whose distinct pre-shuffle
    * is corpus-sized. Returns `(groupCols..., k_eff, kth,
    * distinct_est_x100)`; the estimate is exact while the sketch is
    * not full, else `(k-1)·2^48 / h_k` (48-bit hashes keep every
    * value exact in a BIGINT on every engine), floored at cents so
    * the cross-engine compare never rides a float tie. */
  def kmvPerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 256): DataFrame = {
    import org.apache.spark.sql.graft.{bridge, KmvExpr}
    val agg = bridge.column(KmvExpr(
      bridge.expression(kmvHash(col(valueCol))), k).toAggregateExpression())
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*).agg(agg.as("__kmv"))
      .select(groupCols.map(col) ++ Seq(
        size(col("__kmv")).cast("long").as("k_eff"),
        element_at(col("__kmv"), -1).as("kth"),
        floor(when(size(col("__kmv")) < k,
            size(col("__kmv")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(281474976710656.0) /
            element_at(col("__kmv"), -1).cast("double")) * 100)
          .as("distinct_est_x100")): _*)
  }

  /** Merge CMS tables from disjoint data (cell-wise sum). */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("j", "c").agg(sum("cnt").as("cnt"))

  /** Estimated frequency of each candidate value: probe the sketch at
    * the candidate's cells, take the min over rows. Candidates is a
    * small frame (broadcast); the sketch is at most depth*width rows. */
  def cmsQuery(sketch: DataFrame, candidates: DataFrame, colName: String,
               depth: Int = 4, width: Int = 1024): DataFrame = {
    val v = col(colName).cast("string")
    val probes = candidates
      .select(col(colName), explode(array((0 until depth).map(lit(_)): _*)).as("j"))
      .select(col(colName), col("j"),
        pmod(conv(substring(md5(concat(col("j").cast("string"), lit(":"),
          v)), 1, 8), 16, 10).cast(LongType), lit(width.toLong)).as("c"))
    probes.join(broadcast(sketch), Seq("j", "c"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(colName).agg(min("cnt").as("est"))
  }
}
