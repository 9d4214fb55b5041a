package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Rates are enforced by a stable md5-derived hash threshold on a key
  * column — NOT an RNG — so a sample is:
  *   - reproducible across runs, engines and cluster layouts;
  *   - join-stable: the same key draws the same verdict everywhere, so
  *     independently sampled tables still join (consistent sampling);
  *   - restart-safe: re-running a failed stage cannot change membership.
  * All pure per-row expressions — no shuffle, fully pushed into the scan
  * stage, linear at any corpus size.
  */
object Sampling {

  private val Denom = 10000L

  /** Keep ~`rate` of rows, decided by the stable hash of `key`. */
  def keep(key: Column, rate: Double): Column =
    pmod(Hashing.hex8ToLong(key.cast("string")), lit(Denom)) <
      lit((rate * Denom).toLong)

  /** Uniform deterministic sample on a key column. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(keep(col(keyCol), rate))

  /** Stratified deterministic sample: per-stratum rates (e.g. rebalance
    * languages or sources in a training corpus), `defaultRate` for
    * strata not listed. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 rates: Map[String, Double],
                 defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(
      lit((defaultRate * Denom).toLong)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit((r * Denom).toLong)).otherwise(acc)
    }
    df.filter(
      pmod(Hashing.hex8ToLong(col(keyCol).cast("string")), lit(Denom)) <
        threshold)
  }
}
