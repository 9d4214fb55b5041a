package graft

/** The reviewed exception list for [[tools.PlanAudit]]: every query
  * whose physical plan deliberately carries a flagged scale shape, with
  * the justification that bounds it at 100 TB. Keep justifications
  * specific — "small" is not a bound; "k rows by construction" is.
  * Populated by running the audit and reviewing each hit; a hit not
  * listed here fails the audit run (exit 1).
  *
  * The four categories (PLANS.md "Plan audit" reviews, r10-r11):
  *   1. one-row broadcast stat frames through BNLJ — the canonical
  *      corpus-constant attach, scale-invariant;
  *   2. exact ANN/bitext oracle baselines — each has a banded/celled
  *      scale path (lshTopK / ivfTopK / bitextMineLsh);
  *   3. one-row global aggregates — aggregation TO one row necessarily
  *      ends in one partition;
  *   4. bounded-frame shapes (k-heap entries, budget-sized schedules).
  */
object PlanAuditExceptions {
  private val Bnlj = "BroadcastNestedLoopJoin"
  private val SinglePart = "Exchange SinglePartition"

  private val statFrame =
    "one-row broadcast stat frame (corpus-level constant attach, " +
      "scale-invariant)"
  private val statFrameAgg =
    "the 1-row global aggregate feeding the broadcast stat frame"
  private val oneRowAgg =
    "aggregation to one row necessarily ends in one partition"

  /** C1: crossJoin(broadcast(one-row stats)) + the 1-row aggregate
    * that produces it. */
  private val oneRowStatQueries = Seq("apply_truncates", "bm25_search",
    "class_terms", "classifier_eval", "collocations", "curriculum_shards",
    "doc_tfidf", "dsir_select", "dsir_weights", "funnel_windowed",
    "hybrid_rrf", "lm_score", "nb_classify", "quantile_gate",
    "temperature_sample", "time_decay_score", "token_budget_sample",
    "winsorize_chars")

  /** C2: exact spellings kept oracle-checkable; the scale path is the
    * named banded/celled variant. */
  private val exactBaselines = Map(
    "ann_cosine_topk" -> "exact brute-force oracle baseline; scale path lshTopK/ivfTopK",
    "ann_ivf_topk" -> "exact rescore leg over probed cells; cell lists are k-bounded",
    "ann_matryoshka" -> "coarse leg over prefix dims, exact by contract; scale path ivfTopK",
    "ann_pq_topk" -> "query-table leg: k codebook tables per query, corpus ships codes only",
    "ann_quantized" -> "exact rescore over SQ8 codes, oracle baseline",
    "bitext_mine" -> "exact oracle baseline; scale path bitextMineLsh (oracle-gated r11)",
    "contrastive_pairs" -> "8-query fixture side broadcast; positives/negatives are k-bounded")

  /** C3: one-row global aggregates. */
  private val oneRowAggQueries =
    Seq("dbt_run", "drift_report", "funnel", "not_in_subquery",
      "row_counts", "scalar_subquery")

  def all: Map[String, Map[String, String]] =
    oneRowStatQueries.map(q =>
      q -> Map(Bnlj -> statFrame, SinglePart -> statFrameAgg)).toMap ++
    exactBaselines.map { case (q, why) => q -> Map(Bnlj -> why) } ++
    oneRowAggQueries.map(q => q -> Map(SinglePart -> oneRowAgg)).toMap ++
    Map(
      // sketch_kmv attaches the corpus-wide KMV struct (k=256 entries)
      "sketch_kmv" -> Map(Bnlj ->
        "one-row KMV sketch frame broadcast (<=k entries by construction)"),
      // global bounded-heap top-k: only k heap entries per task reach
      // the final single partition
      "weighted_sample" -> Map(SinglePart ->
        "global bounded-heap aggregate: k entries per task, never the corpus"))
}
