package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable rule-based quality filtering with per-rule rejection
  * accounting, plus the hashing-trick featurizer — the two workhorses
  * of a rule-gated training-data intake (the Gopher/C4 recipe family
  * from the public literature).
  *
  * [[ruleStats]] answers the question a 100 TB intake run actually
  * asks: not just "how many docs survived" but "WHICH rule is eating
  * my corpus" — per-rule fail counts in ONE scan (the per-doc rule
  * vector is built as an array of structs and exploded into a
  * domain-sized aggregate; no per-rule re-scan, no corpus shuffle:
  * the only exchange carries |rules| partial counts per task).
  *
  * Every rule is a pure deterministic SQL expression (codegen'd,
  * engine-portable), so the same verdicts are reproducible in any
  * engine — the property the DuckDB oracle checks.
  */
object QualityRules {

  /** token array of `text` (whitespace split of the trimmed text). */
  private def toks(text: Column): Column =
    split(trim(text), "\\s+")

  /** The rule set: name -> fail predicate. Thresholds follow the
    * public web-corpus recipes (doc length bounds, word count, mean
    * word length band, stopword floor); tuned to the fixture's length
    * distribution so both pass and fail populations are non-empty. */
  def rules(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val words = size(toks(text))
    val meanWl = length(regexp_replace(text, "\\s+", ""))
      .cast("double") / words
    val stopHits = size(filter(toks(text),
      t => lower(t).isin("the", "a", "an", "of", "to", "in", "and")))
    Seq(
      "min_chars" -> (nChars < 100),
      "max_chars" -> (nChars > 450),
      "min_words" -> (words < 20),
      "mean_word_len" -> (meanWl < 3.4 || meanWl > 8.0),
      "stopword_floor" -> (stopHits.cast("double") / words < 0.05))
  }

  /** Per-rule rejection breakdown in one corpus scan:
    * `(rule, n_fail, fail_pct)`. */
  def ruleStats(df: DataFrame, textCol: String): DataFrame = {
    val rs = rules(col(textCol))
    val vec = array(rs.map { case (name, fail) =>
      struct(lit(name).as("rule"), fail.cast("int").as("fail"))
    }: _*)
    df.select(explode(vec).as("r"))
      .groupBy(col("r.rule").as("rule"))
      .agg(sum(col("r.fail")).as("n_fail"), count(lit(1)).as("n_docs"))
      .withColumn("fail_pct",
        round(col("n_fail").cast("double") / col("n_docs"), 6))
      .select("rule", "n_fail", "fail_pct")
  }

  /** Docs passing EVERY rule (the intake gate itself). */
  def passing(df: DataFrame, textCol: String): DataFrame =
    df.filter(!rules(col(textCol)).map(_._2).reduce(_ || _))

  /** Hashing-trick featurizer: tokens -> `(id, bucket, tf)` sparse
    * term-frequency rows over a fixed `dims`-bucket space (Weinberger
    * et al. 2009 — no vocabulary pass, no dictionary broadcast, which
    * is what makes it viable on an unbounded token stream). Bucket =
    * stable md5-derived hash of the lowercased token mod `dims`, so
    * features are reproducible across engines and runs. One explode +
    * one map-side-combined count; the shuffle carries at most
    * |docs| x dims partial rows. */
  def featureHash(df: DataFrame, idCol: String, textCol: String,
                  dims: Int): DataFrame =
    df.select(col(idCol),
        explode(toks(lower(col(textCol)))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col(idCol),
        pmod(Hashing.hex8ToLong(col("tok")), lit(dims.toLong)).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"))
}
