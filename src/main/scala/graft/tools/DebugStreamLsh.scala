package graft.tools

import org.apache.spark.sql.functions._

/** Phase-timing probe for the stream_dedup_lsh bench row: runs the
  * exact query shape with a wall clock around each phase, so a
  * regression localizes to bootstrap vs increment vs harness overhead
  * (stream startup, input writes, final distinct read). */
object DebugStreamLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.create()
    s.sparkContext.setLogLevel("ERROR")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lsh] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"[lsh] --- pass $round ---")
      val base = "/tmp/graft_streamlsh_dbg"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val docs = graft.Tables.load(s, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      timed("write input half 1") {
        docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$base/in")
      }
      def run(tag: String): Unit = {
        val q = s.readStream.schema(docs.schema).parquet(s"$base/in")
          .writeStream
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], _: Long) =>
            timed(s"  bandIndexUpdate ($tag)") {
              graft.functions.Dedup.bandIndexUpdate(
                  s"$base/idx", batch.toDF(), "text", "doc_id")
                .write.mode("append").parquet(s"$base/pairs")
            }
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      timed("stream run 1 (bootstrap)") { run("bootstrap") }
      timed("write input half 2") {
        docs.filter(col("doc_id") % 2 =!= 0).write.mode("append")
          .parquet(s"$base/in")
      }
      timed("stream run 2 (increment)") { run("increment") }
      timed("pairs distinct read + noop") {
        s.read.parquet(s"$base/pairs").distinct().orderBy("id_a", "id_b")
          .write.format("noop").mode("overwrite").save()
      }
    }
    s.stop()
  }
}
