package graft

import org.apache.spark.sql.functions._

/** Scale stress harness for the paths reworked this round — synthetic
  * data well beyond the fixtures (the fixtures cap at 5k documents), so
  * the quadratic/shuffle behavior is actually exercised. Prints one
  * timing line per case. Usage: `sbt "runMain graft.Stress"`.
  */
object Stress {
  private def timed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. hot-shingle cap: 100k docs ALL sharing one stop-shingle prefix.
    // Uncapped, that one shingle alone is 5e9 pairs; the df cap must
    // keep the job linear.
    val docs = spark.range(100000).select(col("id").as("doc_id"),
      concat(lit("the quick brown fox jumps over "),
        col("id").cast("string"), lit(" unique tail words here")).as("text"))
    val nPairs = timed("ngramJaccardPairs 100k docs + universal stop-shingle (maxDf=1000)") {
      functions.Dedup.ngramJaccardPairs(docs, "text", "doc_id").count()
    }
    println(s"[stress]   pairs=$nPairs (bounded; uncapped would be ~5e9)")

    // 2. IVF cell assignment as pure projection: 500k x 64-dim corpus,
    // 16 cells — zero shuffle on the corpus path.
    val vecs = spark.range(500000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(col("id") * (i + 17L) * 2654435761L, lit(997L)) + 1)
          .cast("float")).as("embedding"))
    val cents = timed("fitCentroids 500k x 64d, k=16, 1 iter") {
      val c = functions.Similarity.fitCentroids(vecs, "embedding", "vec_id",
        k = 16, iterations = 1)
      c.count(); c
    }
    val assignPlan = functions.Similarity
      .ivfAssign(vecs, cents, "embedding", "vec_id")
      .queryExecution.executedPlan.toString
    require(!assignPlan.contains("Exchange"),
      "ivfAssign must stay a pure projection")
    timed("ivfAssign 500k x 64d -> 16 cells (pure projection)") {
      functions.Similarity.ivfAssign(vecs, cents, "embedding", "vec_id")
        .write.format("noop").mode("overwrite").save()
    }
    timed("ivfTopK 100 queries vs 500k corpus, k=10, nprobe=2") {
      functions.Similarity.ivfTopK(vecs.filter(col("vec_id") < 100), vecs,
        cents, "embedding", "vec_id", k = 10, nprobe = 2)
        .write.format("noop").mode("overwrite").save()
    }

    // 3. SQ8 disk-ANN composition: quantize the 500k corpus (pure
    // projection), reconstruct, probe. The quantize+dequant plan must
    // stay Exchange-free like ivfAssign.
    val qz = functions.Similarity.quantizeInt8(vecs, "embedding", "vec_id")
    require(!qz.queryExecution.executedPlan.toString.contains("Exchange"),
      "quantizeInt8 must stay a pure projection")
    timed("quantizeInt8 500k x 64d (pure projection)") {
      qz.write.format("noop").mode("overwrite").save()
    }
    timed("ivfTopK over SQ8-reconstructed 500k corpus, 100 queries") {
      val corpus = qz.select(col("vec_id"),
        functions.Similarity.dequantInt8(col("codes"), col("q_lo"),
          col("q_scale")).as("embedding"))
      functions.Similarity.ivfTopK(vecs.filter(col("vec_id") < 100), corpus,
        cents, "embedding", "vec_id", k = 10, nprobe = 2)
        .write.format("noop").mode("overwrite").save()
    }

    // 4. Compaction: a 2000-file lake directory (the shape a month of
    // micro-batches leaves behind) packed to target size.
    val lake = java.nio.file.Files.createTempDirectory("graft_stress_lake")
      .toString + "/lake"
    timed("write 2000-file lake (5M rows)") {
      spark.range(5000000L).select(col("id"),
        (col("id") % 1000).as("k"), md5(col("id").cast("string")).as("payload"))
        .repartition(2000).write.parquet(lake)
    }
    val stats = timed("compact 2000 files -> 64MB targets") {
      sinks.Sinks.compact(spark, lake, targetBytes = 64L << 20)
    }
    println(s"[stress]   $stats")
    require(stats.filesAfter < 64, s"compaction left ${stats.filesAfter} files")

    // 5. Delta checkpoint: 200-commit table — read cost through the
    // checkpoint vs full JSON replay.
    val table = java.nio.file.Files.createTempDirectory("graft_stress_delta")
      .toString + "/t"
    timed("DeltaLite 200 tiny commits (checkpoint every 10)") {
      for (i <- 0 until 200)
        sources.DeltaLite.write(Seq((i.toLong, s"v$i")).toDF("id", "v"), table)
    }
    timed("activeFiles via checkpoint (replays 200->10 json commits)") {
      require(sources.DeltaLite.activeFiles(spark, table).size == 200)
    }
    spark.stop()
  }
}
