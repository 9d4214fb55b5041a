package graft.tools

import org.apache.spark.sql.functions._
import graft.functions._

/** Stage-by-stage profiler for the shingle/minhash kernel — the
  * decomposition that located the r15 hot spot: the composed
  * transform/sequence/slice/concat_ws shingle spelling ran the
  * interpreted higher-order path per shingle (4.3 s of the 5.0 s
  * sf0.1 kernel; md5 and the banded aggregation nearly free), and the
  * native [[org.apache.spark.sql.graft.ShinglesExpr]] replacing it
  * reads 0.19 s on the same stage (22x) / 0.29 s on full lshBands
  * (12x). Each stage is warmed twice and timed on the third run.
  *
  * Usage: runMain graft.tools.ProfMinhash [sfDir] */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").cache()
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      f; f
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    time("tokens explode")(
      docs.select(explode(TextAnalysis.tokens(col("text")))).count())
    time("shingles explode")(
      docs.select(explode(Dedup.shingles(col("text"), 3))).count())
    time("distinct shingles explode")(
      docs.select(explode(array_distinct(Dedup.shingles(col("text"), 3))))
        .count())
    time("+ md5 hash sum")(
      docs.select(explode(array_distinct(Dedup.shingles(col("text"), 3)))
          .as("s"))
        .select(Hashing.hex8ToLong(col("s")).as("h"))
        .agg(sum("h")).count())
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(Dedup.shingles(col("text"), 3))).as("__s"))
    time("+16 perms + groupBy min") {
      val h = Hashing.hex8ToLong(col("__s"))
      val hashed = sh.select((col("doc_id") +:
        (0 until 16).map(j => Dedup.permute(h, j).as(s"__h$j"))): _*)
      val aggs = (0 until 16).map(j => min(col(s"__h$j")).as(s"__m$j"))
      hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count()
    }
    time("full lshBands")(
      Dedup.lshBands(docs, "text", "doc_id").count())
    time("full minhashCandidates")(
      Dedup.minhashCandidates(docs, "text", "doc_id").count())
    time("canonicalize on candidates") {
      val c = Dedup.canonicalize(docs,
        Dedup.minhashCandidates(docs, "text", "doc_id"), "doc_id")
      c.count()
    }
    spark.stop()
    sys.exit(0)
  }
}
