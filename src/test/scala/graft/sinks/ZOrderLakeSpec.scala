package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderLakeSpec extends SparkSpec {
  import spark.implicits._

  private def jvmZ(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    (for {
      i <- 0 until bits
      (v, d) <- vals.zipWithIndex
    } yield ((v >> i) & 1L) << (i * n + d)).reduce(_ | _)
  }

  test("zValue interleaves bits like the driver-side reference") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 511L),
      (12345L % 1024, 54321L % 1024)).toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      ZOrderLake.zValue(Seq(col("x"), col("y")), 10).as("z")).collect()
    for (r <- got)
      assert(r.getLong(2) == jvmZ(Seq(r.getLong(0), r.getLong(1)), 10))
    // 3D sanity
    val d3 = Seq((1L, 2L, 4L)).toDF("a", "b", "c")
      .select(ZOrderLake.zValue(Seq(col("a"), col("b"), col("c")), 4))
      .collect().head.getLong(0)
    assert(d3 == jvmZ(Seq(1L, 2L, 4L), 4))
  }

  test("z-ordered layout prunes on BOTH dimensions; x-sorted only on x") {
    val n = 100000
    val df = spark.range(n.toLong).select(
      (graft.functions.Hashing.hex8ToLong(concat(lit("x"),
        col("id").cast("string"))) % 1024).as("x"),
      (graft.functions.Hashing.hex8ToLong(concat(lit("y"),
        col("id").cast("string"))) % 1024).as("y"),
      col("id"))
    val zpath = "/tmp/graft_zorder/lake"
    val man = ZOrderLake.writeZOrdered(df, zpath, Seq("x", "y"),
      files = 16, bits = 10)
    // x-sorted baseline layout, same file count, manifest over both dims
    val xpath = "/tmp/graft_zorder/xsorted"
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xpath)
    val xman = ZOrderLake.buildManifest(spark, xpath, Seq("x", "y"))

    val zOnY = ZOrderLake.candidateFiles(spark, man, "y", 0, 63).size
    val xOnY = ZOrderLake.candidateFiles(spark, xman, "y", 0, 63).size
    val zOnX = ZOrderLake.candidateFiles(spark, man, "x", 0, 63).size
    assert(xOnY == 16, s"x-sorted layout cannot prune on y, got $xOnY")
    assert(zOnY <= 8, s"z-order must prune on y: $zOnY of 16 files")
    assert(zOnX <= 8, s"z-order must prune on x: $zOnX of 16 files")

    // pruned read is result-identical to full scan + filter
    val pruned = ZOrderLake.prunedRead(spark, zpath, man, "y", 0, 63)
      .agg(count(lit(1)), sum("id")).collect().head
    val full = spark.read.parquet(zpath).filter(col("y") <= 63)
      .agg(count(lit(1)), sum("id")).collect().head
    assert(pruned == full)
    assert(pruned.getLong(0) > 0)
  }

  test("prunedRead with no intersecting files returns empty, not error") {
    val df = Seq((1L, 2L, 10L)).toDF("x", "y", "id")
    val p = "/tmp/graft_zorder/tiny"
    val man = ZOrderLake.writeZOrdered(df, p, Seq("x", "y"), 1, 10)
    assert(ZOrderLake.prunedRead(spark, p, man, "y", 500, 600).count() == 0)
  }
}
