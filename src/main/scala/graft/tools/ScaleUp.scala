package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derive a larger scale factor from an existing fixture dir.
  *
  * Two modes:
  *
  * **replicate** (default) — each table is copied `factor` times with
  * consistent key offsets, preserving referential integrity (replica i
  * shifts every key domain by i * that domain's span, so orders still
  * join their customers and lineitems their orders/parts/suppliers).
  * Fast, but the result preserves the source's key-cardinality
  * STRUCTURE: every replica is a self-contained clone, join fan-outs
  * and value distributions repeat exactly, and content-addressed
  * operators (dedup) see `factor` exact copies of every document.
  *
  * **fresh** (4th arg `fresh`) — a true larger scale factor, not a
  * tiling: unique keys still shift (fresh ids by construction, the key
  * domains are dense [0, N) so integrity is exact), but
  *   - many-to-one FOREIGN keys (o_custkey, l_partkey, l_suppkey,
  *     events.user_id) are redrawn Zipf-skewed over the ENTIRE widened
  *     parent domain: rank = floor(fullN^u) with u an md5-derived
  *     uniform per (table, column, row, replica) — pmf ∝ 1/rank, so
  *     replicas share genuinely hot keys instead of tiling the source
  *     skew, and cross-replica joins exist (the thing the tiled
  *     spelling can never produce);
  *   - non-key numeric measures jitter by ±10% (hash-derived, so runs
  *     are reproducible);
  *   - document text is token-mutated (~10% of tokens replaced with
  *     hash-fresh tokens per replica) — replicas become NEAR-dups with
  *     fresh shingle sets, not byte-identical copies, so dedup/LSH
  *     benchmarks measure real candidate structure;
  *   - embedding components jitter by ±0.05, keeping replicas inside
  *     near-dup cosine range without being identical vectors.
  * Replica 0 is always the untouched source.
  *
  * Dimension tables (region, nation) are copied as-is in both modes.
  * Used for scale sweeps (e.g. a /tmp sf1 derived from sf0.1) — NOT a
  * fixture generator for correctness runs, which always read the
  * driver's own parquet.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor> [fresh]
  */
object ScaleUp {
  // key columns per table: (column, key domain, isForeign) — foreign
  // keys are the many-to-one edges that fresh mode redraws Zipf-skewed.
  // l_orderkey is NOT foreign here: lines must follow their order's
  // shifted key or the order->lineitem fan-out structure dissolves.
  private val keyDomains: Map[String, Seq[(String, String, Boolean)]] = Map(
    "customer" -> Seq(("c_custkey", "cust", false)),
    "orders" -> Seq(("o_orderkey", "order", false), ("o_custkey", "cust", true)),
    "lineitem" -> Seq(("l_orderkey", "order", false),
      ("l_partkey", "part", true), ("l_suppkey", "supp", true)),
    "part" -> Seq(("p_partkey", "part", false)),
    "supplier" -> Seq(("s_suppkey", "supp", false)),
    "events" -> Seq(("event_id", "event", false), ("user_id", "user", true)),
    "documents" -> Seq(("doc_id", "doc", false)),
    "embeddings" -> Seq(("vec_id", "vec", false)))

  // non-key numeric measures jittered in fresh mode (schema-typed)
  private val measures: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_acctbal"),
    "orders" -> Seq("o_totalprice"),
    "lineitem" -> Seq("l_quantity", "l_extendedprice"),
    "part" -> Seq("p_retailprice"),
    "supplier" -> Seq("s_acctbal"),
    "events" -> Seq("value"))

  /** md5-derived uniform in [0, 1) from a seed column — engine-stable,
    * reproducible across runs (the [[graft.functions.Hashing]] value). */
  private def unif(seed: Column): Column =
    graft.functions.Hashing.hex8ToLong(seed).cast("double") / lit(4294967296.0)

  /** Zipf(s≈1) rank over [0, n): floor(n^u) - 1 — pmf ∝ 1/rank, exact
    * integrity over a dense key domain. */
  private def zipfKey(u: Column, n: Long): Column =
    least(floor(pow(lit(n.toDouble), u)).cast("long") - 1, lit(n - 1))

  def main(args: Array[String]): Unit = {
    val (src, dst, factor) = (args(0), args(1), args(2).toInt)
    val freshMode = args.length > 3 && args(3) == "fresh"
    // optional 5th arg: comma-separated table subset — ladder harnesses
    // that only need one table (e.g. the embedding rebuild ladder's
    // 200k-vector feed) shouldn't pay a full 60M-row lineitem rewrite.
    // Key spans still come from the FULL fixture, so a subset-staged
    // table is bit-identical to the same table from a full staging.
    val tableFilter: Option[Set[String]] =
      if (args.length > 4) Some(args(4).split(",").map(_.trim).toSet)
      else None
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
          keys.map { case (c, _, _) => max(col(c).cast("long")).as(c) }.head,
          keys.map { case (c, _, _) => max(col(c).cast("long")).as(c) }.tail: _*)
          .collect().head
        keys.zipWithIndex.map { case ((_, dom, _), i) => dom -> maxes.getLong(i) }
      }
      .groupBy(_._1).map { case (d, vs) => d -> (vs.map(_._2).max + 1L) }

    for (t <- graft.Tables.all if tableFilter.forall(_.contains(t))) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = keyDomains.get(t) match {
        case None => df // dimension table: copy
        case Some(keys) =>
          val replicas: Seq[DataFrame] = (0 until factor).map { i =>
            val shifted = keys.foldLeft(df) { case (acc, (c, dom, isFk)) =>
              val dt = df.schema(c).dataType
              if (freshMode && isFk && i > 0) {
                // Zipf redraw over the full widened parent domain: hot
                // keys shared across replicas, fan-in genuinely skewed
                val u = unif(concat_ws(":", lit(t), lit(c), lit(i),
                  col(c).cast("string"),
                  keys.head._1 match { case pk => col(pk).cast("string") }))
                acc.withColumn(c,
                  zipfKey(u, spans(dom) * factor).cast(dt))
              } else
                acc.withColumn(c,
                  (col(c).cast("long") + lit(i * spans(dom))).cast(dt))
            }
            if (!freshMode || i == 0) shifted else perturb(shifted, t, i)
          }
          replicas.reduce(_ unionByName _)
      }
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"scaled $t -> $dst/$t.parquet" +
        (if (freshMode) " (fresh)" else ""))
    }
    spark.stop()
  }

  /** Fresh-mode value perturbation for replica i > 0 (deterministic,
    * schema-preserving). */
  private def perturb(df: DataFrame, table: String, i: Int): DataFrame = {
    val pk = keyDomains(table).head._1
    val withMeasures = measures.getOrElse(table, Nil)
      .foldLeft(df) { (acc, m) =>
        val dt = df.schema(m).dataType
        val u = unif(concat_ws(":", lit("j"), lit(table), lit(m), lit(i),
          col(pk).cast("string")))
        acc.withColumn(m,
          (round(col(m).cast("double") * (lit(0.9) + u * 0.2), 2)).cast(dt))
      }
    table match {
      case "documents" =>
        // ~10% of tokens swapped for hash-fresh tokens: replicas are
        // near-dups with fresh shingles, not byte-identical copies
        val toks = split(col("text"), " ")
        val mutated = array_join(
          zip_with(toks, sequence(lit(0), size(toks) - 1), (tok, pos) => {
            val u = unif(concat_ws(":", lit("m"), lit(i),
              col(pk).cast("string"), pos.cast("string")))
            when(u < 0.1,
              concat(lit("tk"), substring(md5(concat_ws(":", lit(i),
                col(pk).cast("string"), pos.cast("string"))), 1, 6)))
              .otherwise(tok)
          }), " ")
        withMeasures.withColumn("text", mutated)
          .withColumn("n_chars", length(col("text")))
      case "embeddings" =>
        // component jitter ±0.05: near-dup cosine range, fresh bytes
        val jittered = zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1), (x, pos) => {
            val u = unif(concat_ws(":", lit("e"), lit(i),
              col(pk).cast("string"), pos.cast("string")))
            (x.cast("double") + (u - 0.5) * 0.1).cast("float")
          })
        withMeasures.withColumn("embedding", jittered)
      case _ => withMeasures
    }
  }
}
