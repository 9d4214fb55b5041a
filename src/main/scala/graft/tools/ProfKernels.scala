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

    sweep()

    if (on("nb")) {
      val docs = graft.Tables.load(spark, dir, "documents")
        .select("doc_id", "text", "lang")
      time("nb: tokens explode")(
        docs.select(explode(TextAnalysis.tokens(col("text")))).count())
      time("nb: perDocTok (id,cls,token) counts")(
        docs.select(col("doc_id"), col("lang"),
            explode(TextAnalysis.tokens(col("text"))).as("token"))
          .groupBy("doc_id", "lang", "token").count().count())
      time("nb: full nbClassify")(
        TextAnalysis.nbClassify(docs, "text", "lang", "doc_id").count())
      time("nb: classifier_eval row (classify + eval)") {
        val pred = TextAnalysis.nbClassify(docs, "text", "lang", "doc_id")
          .filter(col("rank") === 1)
          .select(col("doc_id"), col("cls").as("pred"))
        TextAnalysis.classifierEval(
          docs.select(col("doc_id"), col("lang")).join(pred, Seq("doc_id")),
          "lang", "pred").count()
      }
    }

    sweep()

    if (on("queue")) {
      import graft.model.{CdcEnvelope => E}
      import org.apache.spark.sql.types._
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val src = graft.Tables.load(spark, dir, "orders")
        .withColumn(E.Kind,
          when(col("o_orderkey") % 7 === 0, E.Delete)
            .when(col("o_orderkey") % 3 === 0, E.Update)
            .otherwise(E.Insert))
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("val"),
          col(E.Kind), col("o_orderkey").as(E.Lsn))
      time("queue: spool write (CDC->JSON wire->files)") {
        fs.delete(new org.apache.hadoop.fs.Path("/tmp/graft_prof_queue"), true)
        graft.sinks.KafkaSink.writeFileQueue(src, "/tmp/graft_prof_queue",
          "orders", keyCols = Seq("k"))
        0L
      }
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("val", DoubleType),
        StructField(E.Kind, StringType), StructField(E.Lsn, LongType)))
      time("queue: read spool (raw)")(
        graft.sources.Readers.fileQueue(spark,
          "/tmp/graft_prof_queue/orders", "orders").count())
      def parsed = graft.sources.Readers.fileQueue(spark,
          "/tmp/graft_prof_queue/orders", "orders")
        .select(from_json(col("value"), schema).as("__p"))
        .select(col("__p.k").as("k"), col("__p.val").as("val"),
          col(s"__p.${E.Kind}").as(E.Kind), col(s"__p.${E.Lsn}").as(E.Lsn))
        .withColumn(E.Counter, lit(0))
      time("queue: read + from_json parse")(parsed.count())
      time("queue: mergeBatch into bucketed state") {
        fs.delete(new org.apache.hadoop.fs.Path("/tmp/graft_prof_qstate"),
          true)
        graft.streaming.CdcStream.mergeBatch(parsed,
          "/tmp/graft_prof_qstate/orders", Seq("k"))
        0L
      }
      time("queue: readState")(
        graft.streaming.CdcStream.readState(spark,
          "/tmp/graft_prof_qstate/orders").count())
    }

    sweep()

    if (on("jdbc")) {
      import org.apache.spark.sql.types._
      val url = "jdbc:derby:memory:graftprof;create=true"
      val li = graft.Tables.load(spark, dir, "lineitem")
        .filter(col("l_orderkey") % 20 === 3)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(DoubleType).as("qty"),
          (lit(new java.math.BigDecimal("18000000000000000000"))
            .cast(DecimalType(20, 0)) +
            col("l_orderkey").cast(DecimalType(20, 0)))
            .cast(DecimalType(20, 0)).as("big_id"),
          col("l_shipdate"), col("l_returnflag"))
      time("jdbc: source frame (scan+decimal)")(li.count())
      time("jdbc: Derby DDL+insert write") {
        graft.sinks.JdbcSink.write(li, url, "graft_prof_li",
          graft.sinks.Sinks.Drop)
        0L
      }
      time("jdbc: read back through spark.read.jdbc")(
        spark.read.jdbc(url, "graft_prof_li",
          new java.util.Properties()).count())
    }

    sweep()

    if (on("video")) {
      val mkAvi = udf { (hex: String) =>
        val frames = (0 until 4).map { i =>
          val v = Integer.parseInt(hex.substring(i * 2, i * 2 + 2), 16)
          val gray = Array.fill[Byte](256)(v.toByte)
          graft.functions.Jpeg.encodeGray(16, 16, gray)
        }
        graft.functions.MediaCodecs.encodeAviMjpeg(frames, 16, 16)
      }
      val docs = graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          mkAvi(substring(md5(col("text")), 1, 8)).as("payload"))
      time("video: fixture ENCODE only (mkAvi UDF)")(
        docs.select(sum(length(col("payload")))).count())
      time("video: full frameSampleStats (encode + decode)")(
        Multimodal.frameSampleStats(docs, every = 2).count())
    }

    sweep()

    if (on("mergeb")) {
      import graft.model.{CdcEnvelope => E}
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val state = "/tmp/graft_prof_mergeb/orders"
      val snap = graft.Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("val"))
      val changes = graft.Tables.load(spark, dir, "orders")
        .filter(col("o_orderkey") % 3 === 0 || col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("k"),
          (col("o_totalprice") + 5000.0).as("val"),
          when(col("o_orderkey") % 7 === 0, E.Delete).otherwise(E.Update)
            .as(E.Kind),
          lit(10L).as(E.Lsn), lit(0).as(E.Counter))
      time("mergeb: snapshot mergeBatch (16 buckets)") {
        fs.delete(new org.apache.hadoop.fs.Path("/tmp/graft_prof_mergeb"),
          true)
        graft.streaming.CdcStream.mergeBatch(snap, state, Seq("k"),
          numBuckets = 16)
        0L
      }
      // changes merge must re-seed the snapshot each run or state drifts
      time("mergeb: snapshot + changes merge") {
        fs.delete(new org.apache.hadoop.fs.Path("/tmp/graft_prof_mergeb"),
          true)
        graft.streaming.CdcStream.mergeBatch(snap, state, Seq("k"),
          numBuckets = 16)
        graft.streaming.CdcStream.mergeBatch(changes, state, Seq("k"))
        0L
      }
      time("mergeb: readState")(
        graft.streaming.CdcStream.readState(spark, state).count())
    }

    spark.stop()
    sys.exit(0)
  }
}
