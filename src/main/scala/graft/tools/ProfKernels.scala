package graft.tools

import org.apache.spark.sql.functions._
import graft.functions._

/** Stage-by-stage profiler for the top remaining value_core rows
  * (r15 verdict task 3 — the ProfMinhash discipline applied to
  * `incremental_join_view`, `embedding_gram`, `dsir_select`,
  * `dedup_clusters`): decompose each row into its pipeline stages,
  * warm twice, time the third run, and either convert the found
  * cliff to a native/structural rewrite or record a "no cliff — cost
  * is X by construction" note per row (PLANS.md r16 carries the
  * conclusions).
  *
  * Usage: runMain graft.tools.ProfKernels [sfDir] [rowFilter] */
object ProfKernels {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rowFilter = if (args.length > 1) args(1) else ""
    def on(row: String): Boolean =
      rowFilter.isEmpty || rowFilter.split(",").contains(row)
    def time(name: String)(f: => Long): Unit = {
      f; f
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      // no blanket RDD sweep here: the ijv/cc sections hold their own
      // localCheckpoints ACROSS stages, and unpersisting a local
      // checkpoint kills its blocks (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND)
      spark.catalog.clearCache()
    }
    def sweep(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))

    if (on("dsir")) {
      val docs = graft.Tables.load(spark, dir, "documents")
        .select("doc_id", "text", "lang")
      time("dsir: tokens explode")(
        docs.select(explode(TextAnalysis.tokens(col("text")))).count())
      time("dsir: + md5 bucket")(
        docs.select(explode(TextAnalysis.tokens(col("text"))).as("__tok"))
          .select(pmod(conv(substring(md5(col("__tok")), 1, 4), 16, 10)
            .cast("long"), lit(256L)).as("__b"))
          .groupBy("__b").count().count())
      time("dsir: full dsirWeights")(
        Sampling.dsirWeights(docs, "text", "doc_id",
          col("lang") === "en").count())
      time("dsir: dsir_select (weights + gate)") {
        val w = Sampling.dsirWeights(docs, "text", "doc_id",
            col("lang") === "en")
          .withColumn("logw_micro",
            round(col("logw") * 1000000d, 0).cast("long"))
        Quantiles.gate(w, "logw_micro", loPermille = 750,
          hiPermille = 1000).count()
      }
    }

    sweep()

    if (on("gram")) {
      val emb = graft.Tables.load(spark, dir, "embeddings")
      time("gram: vector count")(emb.count())
      time("gram: single posexplode")(
        emb.select(posexplode(col("embedding"))).count())
      time("gram: double posexplode (pair rows, no agg)")(
        emb.select(transform(col("embedding"),
            x => x.cast("double")).as("__v"))
          .select(posexplode(col("__v")).as(Seq("i", "x")), col("__v"))
          .select(col("i"), col("x"),
            posexplode(col("__v")).as(Seq("j", "y")))
          .filter(col("j") >= col("i"))
          .select(count(lit(1))).head().getLong(0))
      time("gram: pairs + DOUBLE sum (diagnostic only)")(
        emb.select(transform(col("embedding"),
            x => x.cast("double")).as("__v"))
          .select(posexplode(col("__v")).as(Seq("i", "x")), col("__v"))
          .select(col("i"), col("x"),
            posexplode(col("__v")).as(Seq("j", "y")))
          .filter(col("j") >= col("i"))
          .groupBy("i", "j").agg(sum(col("x") * col("y")))
          .count())
      time("gram: full (decimal sums)")(
        Pca.gram(emb, "embedding").count())
    }

    sweep()

    if (on("ijv")) {
      import graft.operators.IncrementalJoin
      val o = graft.Tables.load(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      val l = graft.Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
          col("l_quantity"))
      val aPrev = o.filter(col("o_orderkey") % 31 =!= 0)
      val bPrev = l.filter(col("l_linenumber") =!= 7)
      time("ijv: lift(bPrev) checkpoint")(
        IncrementalJoin.lift(bPrev).localCheckpoint().count())
      val bRel = IncrementalJoin.lift(bPrev).localCheckpoint()
      val aRel = IncrementalJoin.asRel(aPrev)
      time("ijv: joinRel(prev) checkpoint")(
        IncrementalJoin.joinRel(aRel, bRel, Seq("o_orderkey"))
          .localCheckpoint().count())
      val viewPrev = IncrementalJoin.joinRel(aRel, bRel, Seq("o_orderkey"))
        .localCheckpoint()
      val dA = IncrementalJoin.delta(
        o.filter(col("o_orderkey") % 31 === 0),
        aPrev.filter(col("o_orderkey") % 37 === 0))
      val dB = IncrementalJoin.delta(
        l.filter(col("l_linenumber") === 7), l.limit(0))
      time("ijv: step (delta expansion only)")(
        IncrementalJoin.step(viewPrev, aRel, dA, bRel, dB,
          Seq("o_orderkey")).count())
    }

    sweep()

    if (on("cc")) {
      val d = graft.Tables.load(spark, dir, "documents").select("doc_id")
      def times(m: Int) = d.as("a").join(d.as("b"),
          col("b.doc_id") === col("a.doc_id") * m && col("a.doc_id") > 0)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      time("cc: pair construction")(
        times(2).union(times(3)).count())
      val pairs = times(2).union(times(3)).localCheckpoint()
      time("cc: resolveClusters on checkpointed pairs")(
        Dedup.resolveClusters(pairs, "id_a", "id_b").count())
      time("cc: full dedup_clusters row")(
        Dedup.resolveClusters(times(2).union(times(3)), "id_a", "id_b")
          .count())
    }

    spark.stop()
    sys.exit(0)
  }
}
