package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a larger scale factor from an existing fixture dir by
  * replicating each table `factor` times with consistent key offsets,
  * preserving referential integrity (replica i shifts every key domain
  * by i * that domain's span, so orders still join their customers and
  * lineitems their orders/parts/suppliers). Dimension tables (region,
  * nation) are copied as-is. Used for scale sweeps (e.g. a /tmp sf1
  * derived from sf0.1) — NOT a fixture generator for correctness runs,
  * which always read the driver's own parquet.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {
  // key columns per table, each tagged with its key domain
  private val keyDomains: Map[String, Seq[(String, String)]] = Map(
    "customer" -> Seq("c_custkey" -> "cust"),
    "orders" -> Seq("o_orderkey" -> "order", "o_custkey" -> "cust"),
    "lineitem" -> Seq("l_orderkey" -> "order", "l_partkey" -> "part",
      "l_suppkey" -> "supp"),
    "part" -> Seq("p_partkey" -> "part"),
    "supplier" -> Seq("s_suppkey" -> "supp"),
    "events" -> Seq("event_id" -> "event", "user_id" -> "user"),
    "documents" -> Seq("doc_id" -> "doc"),
    "embeddings" -> Seq("vec_id" -> "vec"))

  def main(args: Array[String]): Unit = {
    val (src, dst, factor) = (args(0), args(1), args(2).toInt)
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.GraftSession.init(graft.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus)
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    // span per key domain = 1 + max over every table using it, so
    // shifted replicas can never collide across tables
    val spans: Map[String, Long] = keyDomains.toSeq
      .flatMap { case (t, keys) =>
        val df = spark.read.parquet(s"$src/$t.parquet")
        val maxes = df.agg(
          keys.map { case (c, _) => max(col(c).cast("long")).as(c) }.head,
          keys.map { case (c, _) => max(col(c).cast("long")).as(c) }.tail: _*)
          .collect().head
        keys.zipWithIndex.map { case ((_, dom), i) => dom -> maxes.getLong(i) }
      }
      .groupBy(_._1).map { case (d, vs) => d -> (vs.map(_._2).max + 1L) }

    for (t <- graft.Tables.all) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = keyDomains.get(t) match {
        case None => df // dimension table: copy
        case Some(keys) =>
          val replicas: Seq[DataFrame] = (0 until factor).map { i =>
            keys.foldLeft(df) { case (acc, (c, dom)) =>
              val dt = df.schema(c).dataType
              acc.withColumn(c,
                (col(c).cast("long") + lit(i * spans(dom))).cast(dt))
            }
          }
          replicas.reduce(_ unionByName _)
      }
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"scaled $t -> $dst/$t.parquet")
    }
    spark.stop()
  }
}
