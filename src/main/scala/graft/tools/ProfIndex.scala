package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.functions._

/** Job-level decomposition of the standing-index lifecycle rows — the
  * r17 top honest costs (embed_near_dups_compact 26 s, embedding_rebuild
  * 19.5 s, containment_compact 11.7 s on 2k vectors / 150 docs: pure
  * fixed overhead). Prints every Spark job's wall and description so
  * the per-update action count and the per-action cost are numbers,
  * not guesses.
  *
  * Usage: runMain graft.tools.ProfIndex [sfDir] [family]
  */
object ProfIndex {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val family = if (args.length > 1) args(1) else "embed"
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, (e.time,
          Option(e.properties.getProperty("spark.job.description"))
            .getOrElse("")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val (t0, d) = jobs.getOrDefault(e.jobId, (e.time, "?"))
        println(f"[job ${e.jobId}%4d] ${(e.time - t0) / 1e3}%7.2f s  $d")
      }
    })
    def phase[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

    if (family == "embed") {
      val base = "/tmp/graft_prof_embidx"
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val e = graft.Tables.load(spark, dir, "embeddings")
      val us = Seq(0, 1, 2).map { m =>
        val u = phase(s"update $m")(
          Dedup.embeddingIndexUpdate(s"$base/idx",
            e.filter(pmod(col("vec_id"), lit(3)) === m), "embedding",
            "vec_id", planes = 8, minCos = 0.35))
        if (m == 1)
          phase("compact")(
            Dedup.embeddingIndexCompact(spark, s"$base/idx"))
        u
      }
      phase("union+sort+noop")(
        us.reduce(_ unionByName _)
          .withColumn("cos", round(col("cos"), 6))
          .orderBy("id_a", "id_b")
          .write.format("noop").mode("overwrite").save())
      phase("rebuild")(
        Dedup.embeddingIndexRebuild(spark, s"$base/idx",
            planes = 8, minCos = 0.35, maxBucketSize = 1000000)
          .withColumn("cos", round(col("cos"), 6))
          .orderBy("id_a", "id_b")
          .write.format("noop").mode("overwrite").save())
    }

    if (family == "containment") {
      val base = "/tmp/graft_prof_contidx"
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val d = graft.Tables.load(spark, dir, "documents")
        .filter(col("doc_id") < 150).select(col("doc_id"), col("text"))
      val tk = TextAnalysis.tokens(col("text"))
      val quotes = d.select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(tk, lit(1),
          floor((size(tk) + lit(2)) / lit(3)).cast("int")), " ").as("text"))
      val corpus = d.unionByName(quotes)
      val us = (0 to 2).map { m =>
        val u = phase(s"update $m")(
          Dedup.containmentIndexUpdate(base,
            corpus.filter(pmod(col("doc_id"), lit(3)) === m),
            "text", "doc_id", shingleN = 3, theta = 0.8))
        if (m == 1)
          phase("compact")(Dedup.containmentIndexCompact(spark, base))
        u
      }
      phase("union+sort+noop")(
        us.reduce(_ unionByName _)
          .withColumn("containment", round(col("containment"), 6))
          .orderBy("id_a", "id_b")
          .write.format("noop").mode("overwrite").save())
    }

    if (family == "compactsteps") {
      val base = "/tmp/graft_prof_embidx2"
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val e = graft.Tables.load(spark, dir, "embeddings")
      println("batch partitions: " + e.filter(pmod(col("vec_id"), lit(3)) === 0).rdd.getNumPartitions)
      Seq(0, 1).foreach { m =>
        phase(s"update $m")(
          Dedup.embeddingIndexUpdate(s"$base/idx",
            e.filter(pmod(col("vec_id"), lit(3)) === m), "embedding",
            "vec_id", planes = 8, minCos = 0.35))
      }
      // replicate Sinks.compact(partitioned) step by step
      val path = s"$base/idx"
      val hPath = new org.apache.hadoop.fs.Path(path)
      val tmp = new org.apache.hadoop.fs.Path(path + ".__compact_tmp")
      val bak = new org.apache.hadoop.fs.Path(path + ".__compact_bak")
      val files = phase("list before") {
        val it = fs.listFiles(hPath, true)
        var n = 0
        while (it.hasNext) { it.next(); n += 1 }
        n
      }
      println(s"files before: $files")
      val df0 = phase("read.parquet")(spark.read.parquet(path))
      phase("repartition+write tmp")(
        df0.repartition(col("bucket"))
          .write.partitionBy("bucket").parquet(tmp.toString))
      phase("swap renames") {
        fs.rename(hPath, bak); fs.rename(tmp, hPath)
      }
      phase("delete bak")(fs.delete(bak, true))
      val after = phase("list after") {
        val it = fs.listFiles(hPath, true)
        var n = 0
        while (it.hasNext) { it.next(); n += 1 }
        n
      }
      println(s"files after: $after")
    }

    if (family == "merge") {
      val base = "/tmp/graft_prof_merge"
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val state = s"$base/state/orders"
      val o = graft.Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast("double").as("val"))
      import graft.model.{CdcEnvelope => E}
      def env(df: org.apache.spark.sql.DataFrame, kind: String,
              lsnOff: Long): org.apache.spark.sql.DataFrame =
        df.select(col("k"), col("val"), lit(kind).as(E.Kind),
          (col("k") * 10 + lsnOff).as(E.Lsn), lit(0).as(E.Counter))
      val b1 = env(o, "insert", 0)
      val b2 = env(o.filter(col("k") % 3 === 0)
        .withColumn("val", col("val") + 5000.0), "update", 1)
      val b3 = env(o.filter(col("k") % 7 === 0), "delete", 2)
      Seq(("batch1 insert", b1), ("batch2 update", b2),
          ("batch3 delete", b3)).foreach { case (n, b) =>
        phase(n)(graft.streaming.CdcStream.mergeBatch(b, state, Seq("k")))
      }
      phase("readState")(
        graft.streaming.CdcStream.readState(spark, state).orderBy("k")
          .write.format("noop").mode("overwrite").save())
    }

    if (family == "band") {
      val base = "/tmp/graft_prof_band"
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val docs = graft.Tables.load(spark, dir, "documents")
      phase("lshBands alone (noop)")(
        Dedup.lshBands(docs.filter(pmod(col("doc_id"), lit(3)) === 0),
            "text", "doc_id")
          .write.format("noop").mode("overwrite").save())
      val us = Seq(0, 1, 2).map { m =>
        val u = phase(s"update $m")(
          Dedup.bandIndexUpdate(s"$base/idx",
            docs.filter(pmod(col("doc_id"), lit(3)) === m), "text",
            "doc_id"))
        if (m == 1)
          phase("compact")(Dedup.bandIndexCompact(spark, s"$base/idx"))
        u
      }
      phase("union+sort+noop")(
        us.reduce(_ unionByName _).orderBy("id_a", "id_b")
          .write.format("noop").mode("overwrite").save())
    }

    if (family == "nodata") {
      // does the replicate loop pay no-data micro-batches, and what do
      // they cost? run the replicate_stream body twice: default conf vs
      // noDataMicroBatches disabled, counting progress events.
      import org.apache.spark.sql.streaming.StreamingQueryListener
      val batches = new java.util.concurrent.atomic.AtomicInteger(0)
      val busyMs = new java.util.concurrent.atomic.AtomicLong(0)
      spark.streams.addListener(new StreamingQueryListener {
        import StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          batches.incrementAndGet()
          val d = e.progress.durationMs
          if (d != null && d.containsKey("triggerExecution"))
            busyMs.addAndGet(d.get("triggerExecution").longValue())
          println(s"[progress] rows=${e.progress.numInputRows} " +
            s"trigger=${if (d == null) -1 else d.get("triggerExecution")}ms")
        }
      })
      Seq("true", "false").foreach { nd =>
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", nd)
        batches.set(0); busyMs.set(0)
        val t0 = System.nanoTime()
        graft.Queries.all("replicate_stream")(spark, dir)
          .write.format("noop").mode("overwrite").save()
        org.apache.spark.sql.graft.bridge.drainListenerBus(spark, 2000L)
        println(f"[nodata=$nd] wall=${(System.nanoTime()-t0)/1e9}%.2f s " +
          s"batches=${batches.get()} busyMs=${busyMs.get()}")
      }
    }
    spark.stop()
  }
}
