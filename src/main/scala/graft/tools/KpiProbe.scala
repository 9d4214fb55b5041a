package graft.tools

import graft.Tables

/** One-off KPI anatomy probe: times the lineitem transfer encode under
  * different parquet codecs and parallelism spellings, steady-state
  * (median of 5 after warm-up), to decide the sink default with data
  * rather than folklore. */
object KpiProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.create("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.load(spark, sfDir, "lineitem")
    val n = li.count()
    def time(tag: String)(body: => Unit): Unit = {
      body // warm
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = runs(runs.length / 2)
      println(f"PROBE $tag%-28s ${med}%.3fs  ${(n / med).toLong} rows/s")
    }
    for (codec <- Seq("snappy", "lz4", "zstd")) {
      spark.conf.set("spark.sql.parquet.compression.codec", codec)
      time(s"codec=$codec") {
        li.write.mode("overwrite").parquet(s"/tmp/kpi_probe_$codec")
      }
    }
    spark.stop()
  }
}
