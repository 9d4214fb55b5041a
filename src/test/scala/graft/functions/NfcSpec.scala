package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Nfc]] / graft_nfc: Unicode NFC laws — composed/decomposed
  * convergence, idempotence, ASCII passthrough, null propagation,
  * and the SQL registration. */
class NfcSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "café"       // é as U+00E9
  private val decomposed = "café"    // e + combining acute

  test("composed and decomposed forms normalize to the same bytes") {
    val df = Seq(("a", composed), ("b", decomposed), ("c", "cafe"))
      .toDF("id", "s")
      .select(col("id"), Nfc(col("s")).as("n"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("a") == m("b"))
    assert(m("a") == composed) // NFC composes, never decomposes here
    assert(m("c") == "cafe")   // ASCII untouched
  }

  test("nfc is idempotent and null-propagating") {
    val df = Seq(Some(decomposed), None).toDF("s")
      .select(Nfc(Nfc(col("s"))).as("twice"), Nfc(col("s")).as("once"))
    val rows = df.collect()
    assert(rows(0).getString(0) == rows(0).getString(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("registered as SQL function graft_nfc") {
    val out = spark.sql(s"SELECT graft_nfc('$decomposed') AS n")
      .head().getString(0)
    assert(out == composed)
  }

  test("normalization collapses dedup keys that bytes alone split") {
    val docs = Seq((1L, composed), (2L, decomposed), (3L, "cafe"))
      .toDF("doc_id", "k")
    val rawGroups = docs.groupBy("k").count().count()
    val nfcGroups = docs.groupBy(Nfc(col("k"))).count().count()
    assert(rawGroups == 3 && nfcGroups == 2)
  }

  test("format-preserving mask: shape survives, values do not") {
    val in = "Customer#000000042 (VIP-a1)"
    val df = Seq(in).toDF("s").select(Mask(col("s"), 7).as("m"))
    val out = df.head().getString(0)
    assert(out.length == in.length)
    assert(out != in)
    in.zip(out).foreach { case (a, b) =>
      if (a.isDigit) assert(b.isDigit)
      else if (a >= 'A' && a <= 'Z') assert(b >= 'A' && b <= 'Z')
      else if (a >= 'a' && a <= 'z') assert(b >= 'a' && b <= 'z')
      else assert(a == b) // separators untouched: '#', ' ', '(', '-', ')'
    }
    // deterministic; seed changes the draw
    val again = Seq(in).toDF("s").select(Mask(col("s"), 7)).head().getString(0)
    val other = Seq(in).toDF("s").select(Mask(col("s"), 8)).head().getString(0)
    assert(again == out && other != out)
    // SQL registration
    val viaSql = spark.sql(s"SELECT graft_mask('$in', 7)").head().getString(0)
    assert(viaSql == out)
  }
}
