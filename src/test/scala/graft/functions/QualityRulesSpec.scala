package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[QualityRules]]: rule boundaries, one-scan accounting, the intake
  * gate conjunction, and the hashing-trick featurizer. */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  // 30 words x 5 chars = 179 chars, mean word len 5, stopword-rich
  private val good = (("the quick brown fox likes " * 6).trim + " and so on")
  private def verdicts(text: String): Map[String, Boolean] = {
    val df = Seq(text).toDF("text")
    QualityRules.rules(col("text")).map { case (name, fail) =>
      name -> df.select(fail).as[Boolean].head()
    }.toMap
  }

  test("a normal doc passes every rule") {
    assert(verdicts(good).forall(!_._2))
  }

  test("boundary cases per rule") {
    assert(verdicts("tiny doc")("min_chars"))
    assert(verdicts(("word " * 120).trim)("max_chars"))
    assert(verdicts("just a few little words here")("min_words"))
    // 20 single-char words -> mean word length 1 < 3.4
    assert(verdicts(("a " * 20).trim)("mean_word_len"))
    // 20 long words, zero stopwords
    assert(verdicts(("generalization " * 20).trim)("stopword_floor"))
  }

  test("stopword match is case-insensitive (sentence-initial 'The')") {
    // 20 words, exactly one stopword and it is capitalized: 1/20 = 0.05
    // clears the 0.05 floor only if 'The' counts
    val t = "The " + ("wordy " * 19).trim
    assert(!verdicts(t)("stopword_floor"))
  }

  test("ruleStats counts one row per rule over the corpus") {
    val df = Seq(good, "tiny", ("verylongword " * 40).trim).toDF("text")
    val rows = QualityRules.ruleStats(df, "text")
      .as[(String, Long, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("max_chars", "mean_word_len",
      "min_chars", "min_words", "stopword_floor"))
    val m = rows.map(r => r._1 -> r._2).toMap
    assert(m("min_chars") == 1)   // "tiny"
    assert(m("max_chars") == 1)   // the 40-word doc (519 chars)
    assert(m("mean_word_len") == 1) // the longword doc: 520/40 = 13 > 8
    assert(m("stopword_floor") == 2) // "tiny" and the longword doc
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
  }

  test("passing() is the conjunction of all rules") {
    val df = Seq(good, "tiny", ("verylongword " * 40).trim).toDF("text")
    val kept = QualityRules.passing(df, "text").as[String].collect()
    assert(kept.toSeq == Seq(good))
  }

  test("featureHash: deterministic buckets, tf sums to token count") {
    val df = Seq((1L, "Alpha beta alpha  beta gamma"))
      .toDF("doc_id", "text")
    val rows = QualityRules.featureHash(df, "doc_id", "text", dims = 16)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._2, r._3))
    assert(rows.map(_._3).sum == 5)            // five tokens
    assert(rows.forall(r => r._2 >= 0 && r._2 < 16))
    // case-folding: Alpha and alpha share a bucket with tf >= 2
    assert(rows.exists(_._3 >= 2))
    // stable across runs / partitioning
    val again = QualityRules.featureHash(df.repartition(3), "doc_id",
      "text", dims = 16).as[(Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._3))
    assert(rows.toSeq == again.toSeq)
  }
}
