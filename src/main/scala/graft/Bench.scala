package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. The benched action is a
  * noop-sink write, which executes the FULL physical plan (projections,
  * casts, hashes included) — `count()` would let Catalyst prune all
  * column-producing work. Failing queries report an `err` marker and are
  * excluded from the total instead of poisoning it. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors()))
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen path once so the first measured query isn't
    // charged several seconds of one-time initialization
    spark.range(100000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    val results: Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val r =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Right((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              Left(e.getClass.getSimpleName)
          }
        name -> r
      }
    val qs = results.map {
      case (k, Right(v)) => s""""$k":$v"""
      case (k, Left(err)) => s""""$k":{"err":"$err"}"""
    }.mkString("{", ",", "}")
    val ok = results.collect { case (_, Right(v)) => v }
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val nErr = results.count(_._2.isLeft)
    // The reference's primary KPI is transfer rows/sec (docs/benchmarks.md:
    // 26-36): measure an end-to-end snapshot transfer of lineitem through
    // the engine (read -> envelope -> sink write).
    val rowsPerSec = try {
      val li = Tables.load(spark, sfDir, "lineitem")
      val n = li.count()
      val t0 = System.nanoTime()
      graft.sinks.Sinks.parquet(li, "/tmp/graft_bench_transfer",
        graft.sinks.Sinks.Drop)
      n / ((System.nanoTime() - t0) / 1e9)
    } catch { case _: Throwable => -1.0 }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_ok":${ok.size},"n_err":$nErr,"transfer_rows_per_sec":${rowsPerSec.round},"sf":"$sfDir"}""")
    spark.stop()
  }
}
