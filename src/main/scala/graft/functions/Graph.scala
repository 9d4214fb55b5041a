package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for corpus curation (the Common Crawl recipe:
  * harvest-rank pages, weight documents by their host/page rank).
  * Iterative like [[Dedup.connectedComponents]]: one balanced
  * edge-keyed shuffle per iteration, lineage truncated per round,
  * nothing driver-side but scalars.
  */
object Graph {

  /** Simplified PageRank (no dangling-mass redistribution): fixed
    * `iters` rounds of r' = (1-d)/N + d·Σ r(u)/outdeg(u). Engine-exact
    * determinism: per-edge contributions are rounded to 9 decimals
    * then summed as DECIMAL(18,9) (order-independent), and each new
    * rank is rounded to 9 decimals — the BM25 discipline, so any
    * engine replaying the same rounds lands on identical doubles.
    *
    * Scale shape: per iteration ONE shuffle of the edge list keyed on
    * dst (map-side combined), plus a broadcast-sized outdegree join on
    * src. Ranks live with the nodes; nothing corpus-sized crosses the
    * driver (N is a scalar count). */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    // raw IEEE double, rounded only inside the per-node expression —
    // the SQL oracle computes (1 - d)/N at runtime and divisions are
    // exactly rounded, so both engines hold the identical double
    val base = (1.0 - damping) / n
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", round(lit(1.0) / n, 9))
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, col("src") === col("node"))
        .join(outdeg, "src")
        .select(col("dst").as("node"),
          round(col("rank") / col("outdeg"), 9).cast("decimal(18,9)")
            .as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit(base) + lit(damping) *
            coalesce(col("__in").cast("double"), lit(0.0)), 9).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Synchronous label propagation (Raghavan et al. 2007) for
    * community detection — the graph-clustering step between
    * connected components (too coarse: one bridge edge merges two
    * communities) and modularity methods (not shuffle-shaped). Fixed
    * `iters` SYNCHRONOUS rounds make it deterministic: every node
    * simultaneously adopts the most frequent label among its
    * neighbors, ties broken by smallest label; isolated nodes keep
    * their own. Labels start as node ids.
    *
    * Scale shape per round: one edge-keyed shuffle (neighbor-label
    * counts, map-side combined) and a struct-max argmax per node — no
    * window sort, no driver state; lineage truncated per round like
    * [[pagerank]]. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int = 3): DataFrame = {
    val dir = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // undirected, self-loop-free, deduplicated adjacency
    val e = dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node")).distinct().localCheckpoint()
    var labels = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      val counts = e.join(labels, col("src") === col("node"))
        .select(col("dst").as("n2"), col("label"))
        .groupBy("n2", "label").agg(count(lit(1)).as("cnt"))
      // argmax by (cnt DESC, label ASC) as a struct max — an
      // aggregate, not a per-node window sort
      val next = counts.groupBy("n2")
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("n2").as("node"), (-col("m.nl")).as("label"))
      labels = nodes.join(next, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("label"), col("node")).as("label"))
        .localCheckpoint()
    }
    labels
  }
}
