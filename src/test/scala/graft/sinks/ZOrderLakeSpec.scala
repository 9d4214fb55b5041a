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

  test("bloom index prunes point lookups, never loses rows") {
    // 200k rows hash-partitioned into 32 files: each key lives in ONE
    // file, so a probe should open ~1 file + false positives
    val df = spark.range(200000).select(
      concat(lit("key"), col("id").cast("string")).as("k"), col("id"))
    val p = "/tmp/graft_zorder/bloom"
    df.repartition(32, col("k")).write.mode("overwrite").parquet(p)
    val man = ZOrderLake.bloomManifest(spark, p, "k", bits = 65536)

    val present = ZOrderLake.bloomCandidateFiles(spark, man, "key123456", bits = 65536).size
    assert(present >= 1 && present <= 8,
      s"probe should open few files, got $present of 32")
    val got = ZOrderLake.bloomPointRead(spark, p, man, "k", "key123456", bits = 65536)
      .collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(123456L))

    // min/max manifest is useless for this probe — every file spans
    // nearly the whole value range (the reason the bloom index exists)
    val mm = ZOrderLake.buildManifest(spark, p, Seq("id"))
    val mmCand = ZOrderLake.candidateFiles(spark, mm, "id", 123456, 123456)
    assert(mmCand.size == 32, s"min/max cannot prune here: ${mmCand.size}")

    // absent key: typically zero candidates, never a wrong row
    val absent = ZOrderLake.bloomPointRead(spark, p, man, "k", "nosuchkey", bits = 65536)
    assert(absent.count() == 0)
  }

  test("updateManifest scans only new files, drops vanished ones") {
    val p = "/tmp/graft_zorder/incr"
    val fsPath = new org.apache.hadoop.fs.Path(p)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fsPath, true)
    fs.delete(new org.apache.hadoop.fs.Path(p + "_manifest"), true)

    Seq((1L, 10L)).toDF("x", "id").coalesce(1)
      .write.mode("append").parquet(p)
    val man = ZOrderLake.updateManifest(spark, p, Seq("x")) // builds fresh
    val before = spark.read.parquet(man).collect()
    assert(before.length == 1)

    // append a second file: only it should be (re)scanned; the old
    // row must survive BYTE-identical (same stats, same file name)
    Seq((5L, 20L), (7L, 30L)).toDF("x", "id").coalesce(1)
      .write.mode("append").parquet(p)
    ZOrderLake.updateManifest(spark, p, Seq("x"))
    val after = spark.read.parquet(man).collect()
    assert(after.length == 2)
    assert(after.map(_.toString).toSet.contains(before.head.toString))
    val newRow = after.filter(_.toString != before.head.toString).head
    assert(newRow.getLong(newRow.fieldIndex("min_x")) == 5L)
    assert(newRow.getLong(newRow.fieldIndex("max_x")) == 7L)

    // no changes -> untouched (same modification time)
    val mt0 = fs.getFileStatus(new org.apache.hadoop.fs.Path(man))
      .getModificationTime
    ZOrderLake.updateManifest(spark, p, Seq("x"))
    assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(man))
      .getModificationTime == mt0)

    // delete the first file -> its manifest row disappears
    val firstFile = new org.apache.hadoop.fs.Path(
      new java.net.URI(before.head.getString(before.head.fieldIndex("file"))))
    fs.delete(firstFile, false)
    ZOrderLake.updateManifest(spark, p, Seq("x"))
    val pruned = spark.read.parquet(man).collect()
    assert(pruned.length == 1)
    assert(pruned.head.getLong(pruned.head.fieldIndex("min_x")) == 5L)
  }

  private def posOf(v: String, bits: Int): Int = math.floorMod(
    graft.functions.Hashing.hex8ToLongJvm(v), bits.toLong).toInt

  // replace the bytes behind `fileUri` with a different one-column
  // parquet file of the SAME name — a spy: any code path that rescans
  // the file now sees different values
  private def tamper(fileUri: String, replacement: org.apache.spark.sql.DataFrame): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(new java.net.URI(fileUri))
    val fs = target.getFileSystem(conf)
    val tmp = "/tmp/graft_zorder/tamper_src"
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    replacement.coalesce(1).write.mode("overwrite").parquet(tmp)
    val src = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.delete(target, false)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, target, false, conf)
  }

  test("updateBloomManifest: an append indexes ONLY the new file") {
    val p = "/tmp/graft_zorder/bloom_incr"
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    fs.delete(new org.apache.hadoop.fs.Path(p + "_bloom_k"), true)

    Seq(1L, 2L).toDF("k").coalesce(1).write.mode("append").parquet(p)
    val man = ZOrderLake.updateBloomManifest(spark, p, "k") // builds fresh
    val before = spark.read.parquet(man).collect()
    assert(before.length == 1)
    val fileA = before.head.getString(before.head.fieldIndex("file"))
    val posA = before.head.getSeq[Int](before.head.fieldIndex("positions"))
    assert(posA.toSet == Set(posOf("1", 4096), posOf("2", 4096)))

    // spy: swap file A's bytes for different values, then append B —
    // if the update rescans A, its row changes; it must not
    tamper(fileA, Seq(999L).toDF("k"))
    Seq(5L).toDF("k").coalesce(1).write.mode("append").parquet(p)
    ZOrderLake.updateBloomManifest(spark, p, "k")
    val after = spark.read.parquet(man).collect()
    assert(after.length == 2)
    val rowA = after.find(_.getString(after.head.fieldIndex("file")) == fileA).get
    assert(rowA.getSeq[Int](rowA.fieldIndex("positions")).toSet ==
      posA.toSet, "known file was rescanned")
    val rowB = after.find(_.getString(after.head.fieldIndex("file")) != fileA).get
    assert(rowB.getSeq[Int](rowB.fieldIndex("positions")).toSet ==
      Set(posOf("5", 4096)))

    // no changes -> untouched manifest (same modification time)
    val mt0 = fs.getFileStatus(new org.apache.hadoop.fs.Path(man))
      .getModificationTime
    ZOrderLake.updateBloomManifest(spark, p, "k")
    assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(man))
      .getModificationTime == mt0)

    // delete file A -> its manifest row disappears
    fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(fileA)), false)
    ZOrderLake.updateBloomManifest(spark, p, "k")
    val pruned = spark.read.parquet(man).collect()
    assert(pruned.length == 1)
    assert(pruned.head.getSeq[Int](pruned.head.fieldIndex("positions"))
      .toSet == Set(posOf("5", 4096)))
  }

  test("updateTrigramManifest: an append indexes ONLY the new file") {
    val p = "/tmp/graft_zorder/trgm_incr"
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    fs.delete(new org.apache.hadoop.fs.Path(p + "_trgm_text"), true)

    Seq("abcd").toDF("text").coalesce(1).write.mode("append").parquet(p)
    val man = ZOrderLake.updateTrigramManifest(spark, p, "text")
    val before = spark.read.parquet(man).collect()
    assert(before.length == 1)
    val fileA = before.head.getString(before.head.fieldIndex("file"))
    val posA = before.head.getSeq[Int](before.head.fieldIndex("positions"))
    assert(posA.toSet == Set(posOf("abc", 65536), posOf("bcd", 65536)))

    tamper(fileA, Seq("zzzz").toDF("text"))
    Seq("wxyz").toDF("text").coalesce(1).write.mode("append").parquet(p)
    ZOrderLake.updateTrigramManifest(spark, p, "text")
    val after = spark.read.parquet(man).collect()
    assert(after.length == 2)
    val rowA = after.find(_.getString(after.head.fieldIndex("file")) == fileA).get
    assert(rowA.getSeq[Int](rowA.fieldIndex("positions")).toSet ==
      posA.toSet, "known file was rescanned")
    val rowB = after.find(_.getString(after.head.fieldIndex("file")) != fileA).get
    assert(rowB.getSeq[Int](rowB.fieldIndex("positions")).toSet ==
      Set(posOf("wxy", 65536), posOf("xyz", 65536)))

    // the maintained index still answers searches over the new file
    val cand = ZOrderLake.trigramCandidateFiles(spark, man, "wxy")
    assert(cand.contains(rowB.getString(rowB.fieldIndex("file"))))
    assert(!cand.contains(fileA))
  }

  test("trigram bloom prunes substring search, never loses rows") {
    // 64 files; a rare marker string lives in exactly 3 documents
    val df = spark.range(20000).select(col("id"),
      concat(lit("common filler text block number "),
        col("id").cast("string"),
        when(col("id").isin(111L, 7777L, 19999L),
          lit(" zebraQuartz rare marker")).otherwise(lit(""))).as("text"))
    val p = "/tmp/graft_zorder/trgm"
    df.repartition(64, col("id")).write.mode("overwrite").parquet(p)
    val man = ZOrderLake.trigramBloomManifest(spark, p, "text")

    val cand = ZOrderLake.trigramCandidateFiles(spark, man, "zebraQuartz")
    assert(cand.size >= 1 && cand.size <= 16,
      s"rare needle should prune most of 64 files, got ${cand.size}")
    val got = ZOrderLake.trigramRead(spark, p, man, "text", "zebraQuartz")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(111L, 7777L, 19999L))

    // common needle: may hit everything, but never loses rows
    val common = ZOrderLake.trigramRead(spark, p, man, "text", "filler")
      .count()
    assert(common == 20000L)
    // absent needle with plausible trigrams
    assert(ZOrderLake.trigramRead(spark, p, man, "text", "quartzZebra")
      .count() == 0)
    // sub-trigram needle falls back to a correct full scan
    assert(ZOrderLake.trigramRead(spark, p, man, "text", "ze").count() == 3)
  }

  test("prunedRead with no intersecting files returns empty, not error") {
    val df = Seq((1L, 2L, 10L)).toDF("x", "y", "id")
    val p = "/tmp/graft_zorder/tiny"
    val man = ZOrderLake.writeZOrdered(df, p, Seq("x", "y"), 1, 10)
    assert(ZOrderLake.prunedRead(spark, p, man, "y", 500, 600).count() == 0)
  }

  test("manifest maintenance at 100k entries stays distributed and " +
      "correct") {
    // the 100-TB shape: a manifest with 100k rows for files that no
    // longer exist (a lake after heavy compaction). The update must
    // drop every one of them, keep the surviving row byte-identical,
    // and index the appended file — all without paging manifest rows
    // through the driver (the old collect-and-parallelize here was a
    // driver OOM at 1M+ fat bloom/trigram rows).
    val p = "/tmp/graft_zorder/stress"
    val fsPath = new org.apache.hadoop.fs.Path(p)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fsPath, true)
    fs.delete(new org.apache.hadoop.fs.Path(p + "_manifest"), true)
    fs.delete(new org.apache.hadoop.fs.Path(p + "_manifest_infl"), true)

    Seq((1L, 1L)).toDF("x", "id").coalesce(1)
      .write.mode("append").parquet(p)
    val man = ZOrderLake.updateManifest(spark, p, Seq("x"))
    val real = spark.read.parquet(man).collect()
    assert(real.length == 1)

    val fakes = spark.range(100000).select(
      concat(lit(s"file:$p/gone-"), col("id"), lit(".parquet")).as("file"),
      col("id").as("min_x"), col("id").as("max_x"))
    spark.read.parquet(man)
      .select("file", "min_x", "max_x").unionByName(fakes)
      .write.mode("overwrite").parquet(p + "_manifest_infl")
    fs.delete(new org.apache.hadoop.fs.Path(man), true)
    fs.rename(new org.apache.hadoop.fs.Path(p + "_manifest_infl"),
      new org.apache.hadoop.fs.Path(man))
    assert(spark.read.parquet(man).count() == 100001L)

    Seq((5L, 2L)).toDF("x", "id").coalesce(1)
      .write.mode("append").parquet(p)
    ZOrderLake.updateManifest(spark, p, Seq("x"))
    val after = spark.read.parquet(man).collect()
    assert(after.length == 2)
    assert(after.map(_.toString).toSet.contains(real.head.toString))
    val fresh = after.filter(_.toString != real.head.toString).head
    assert(fresh.getLong(fresh.fieldIndex("min_x")) == 5L)
  }
}
