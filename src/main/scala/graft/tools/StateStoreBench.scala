package graft.tools

import graft.model.{CdcEnvelope => E}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** State-store crossover measurement for the replication loop's
  * per-key guard state ([[graft.streaming.CdcStream.monotonicGuard]]):
  * HDFS-backed (executor-heap maps, the Spark default) vs RocksDB +
  * changelog checkpointing ([[graft.GraftSession.scaleStreamingState]])
  * at several key counts, on the exact monotonic-guard shape the bench
  * runs — batch 1 inserts every key (state build), batch 2 redelivers
  * every key (stale for even keys, fresh for odd — state READ + update
  * over the full key set, the commit cost that read 89 s at sf10 on
  * the default store).
  *
  * The feed is a parquet file-source stream over `spark.range`
  * synthetics (nothing driver-side, no fixture dependency), one fresh
  * checkpoint per (provider, keys) cell. Output: one JSON line per
  * cell — b1/b2 wall seconds + output rows — for PLANS.md's crossover
  * table; the default stays whatever the data says.
  *
  * Usage: `sbt "runMain graft.tools.StateStoreBench [k1,k2,...]"`
  * (default 100000,1000000,3000000,10000000). The provider is a
  * per-query SQL conf, so both providers run in ONE session —
  * re-set before every start, read once at stream start. */
object StateStoreBench {
  private val RocksCls =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val HdfsCls =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val keyCounts = args.headOption
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(100000L, 1000000L, 3000000L, 10000000L))
    val spark = graft.GraftSession.create(master = "local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    for (n <- keyCounts; rocks <- Seq(false, true)) {
      val provider = if (rocks) "rocksdb" else "hdfs"
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        if (rocks) RocksCls else HdfsCls)
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        rocks.toString)
      val base = s"/tmp/graft_ssbench/${provider}_$n"
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val b1 = spark.range(n).select(col("id").as("k"),
        (col("id") % 1000).cast("double").as("val"),
        (col("id") * 10).as(E.Lsn))
      val b2 = spark.range(n).select(col("id").as("k"),
        (col("id") % 1000 + 7777).cast("double").as("val"),
        when(col("id") % 2 === 0, col("id") * 10)
          .otherwise(col("id") * 10 + 5).as(E.Lsn))
      b1.write.parquet(s"$base/in")
      def run(): Double = {
        val stream = spark.readStream.schema(b1.schema).parquet(s"$base/in")
          .withColumn("__key", col("k").cast(StringType))
        val guarded = graft.streaming.CdcStream
          .monotonicGuard(stream, "__key").drop("__key")
        val q = guarded.writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append").start()
        val t0 = System.nanoTime()
        try q.processAllAvailable() finally q.stop()
        (System.nanoTime() - t0) / 1e9
      }
      val t1 = run()
      b2.write.mode("append").parquet(s"$base/in")
      val t2 = run()
      val outRows = spark.read.parquet(s"$base/out").count()
      println(f"""{"provider":"$provider","keys":$n,""" +
        f""""b1_sec":$t1%.2f,"b2_sec":$t2%.2f,"out_rows":$outRows}""")
      Console.out.flush()
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    }
    spark.stop()
  }
}
