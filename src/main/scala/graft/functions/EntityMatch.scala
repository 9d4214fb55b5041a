package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked record linkage (entity matching / resolution) for data
  * integration: link each dirty record to its master by small edit
  * distance WITHOUT the all-pairs product — candidates come from a
  * pluggable BLOCKER, a pure projection mapping the match column to an
  * array of block keys; only pairs sharing a block key are scored.
  * (Reference semantics: the dirty-reimport linkage fixture; blocking
  * follows the standard record-linkage recipe, e.g. Christen 2012.)
  *
  * Scale shape: both sides explode to (block, row) — output size
  * rows x blocksPerRow — then a block-keyed equi-join; block
  * CARDINALITY grows with the corpus, so per-block occupancy stays
  * ~constant at any scale (a fixed block count would go quadratic).
  * Multi-block blockers produce duplicate candidate pairs (a true pair
  * shares several blocks); pairs are deduped by a (pair)-keyed
  * aggregate before scoring output. Nothing driver-side, no window
  * sorts.
  */
object EntityMatch {

  /** Single-block suffix blocker: the name's last `len` chars. Cheap
    * (one block per row) but FIXTURE-TUNED: recall requires the
    * corruption to stay OUT of the suffix. Use [[qgramBlocker]] when
    * the corrupted position is unknown. */
  def suffixBlocker(len: Int): Column => Column =
    name => array(substring(name, -len, len))

  /** Positional q-gram blocker, recall-COMPLETE for up to `maxSubs`
    * substitutions on equal-length strings: the name splits into
    * `segments` contiguous positional segments, and a pair within
    * `maxSubs` substitutions differs in at most `maxSubs` segments, so
    * it shares at least `segments - maxSubs` block keys — blocking on
    * every (segmentIndex, segmentValue) finds every such pair as long
    * as `segments > maxSubs`. Insert/delete edits shift positions and
    * need shingle blockers instead; substitution corruption (OCR,
    * fat-finger, field truncation-free reimports) is the dominant
    * dirty-data case this covers. */
  def qgramBlocker(segments: Int): Column => Column =
    name => {
      val l = length(name)
      array((0 until segments).map { i =>
        val start = floor(l * i / segments).cast("int") + 1
        val end = floor(l * (i + 1) / segments).cast("int")
        concat_ws("|", lit(i), name.substr(start, end - start + 1))
      }: _*)
    }

  /** Link every dirty row to the master rows within `maxDist`
    * Levenshtein distance, candidates restricted to pairs sharing a
    * block key. Output: (dKeyCol, master key, dist), one row per
    * linked pair, deduped across shared blocks. */
  def link(dirty: DataFrame, dKey: String, dName: String,
           master: DataFrame, mKey: String, mName: String,
           blocker: Column => Column, maxDist: Int): DataFrame = {
    val d = dirty.select(col(dKey), col(dName),
      explode(blocker(col(dName))).as("__block"))
    val m = master.select(col(mKey), col(mName),
      explode(blocker(col(mName))).as("__block"))
    d.join(m, "__block")
      .filter(levenshtein(col(dName), col(mName)) <= maxDist)
      // multi-block blockers emit a pair once per shared block: dedup
      // with a pair-keyed aggregate (dist is a function of the pair, so
      // min == the value)
      .groupBy(col(dKey), col(mKey))
      .agg(min(levenshtein(col(dName), col(mName))).cast("int").as("dist"))
  }
}
