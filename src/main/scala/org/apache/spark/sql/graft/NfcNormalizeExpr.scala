package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — the canonicalization pass text
  * dedup and exact-match joins need before hashing: "é" composed
  * (U+00E9) and decomposed (e + U+0301) are DIFFERENT byte strings
  * that render identically, so an un-normalized exact dedup misses
  * them and an un-normalized join drops matches (cf. the W3C "early
  * uniform normalization" guidance; same rationale as the reference's
  * utf8-cleanup in its text pipelines).
  *
  * NFC (canonical composition) is the right default for dedup keys:
  * it is idempotent, preserves rendering (unlike NFKC, which folds
  * compatibility characters and CHANGES text), and matches what
  * utf8proc-based engines (DuckDB `nfc_normalize`, Postgres
  * `normalize()`) produce — the Unicode standard pins the output
  * byte-exactly, which is what makes a cross-engine oracle possible.
  *
  * Codegen emits one static call; the fast path (already-NFC ASCII or
  * quick-check-passing text, i.e. almost every real document) is a
  * scan without allocation inside `Normalizer.isNormalized`.
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(v: Any): Any =
    NfcNormalizeExpr.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NfcNormalizeExpr.nfc($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr =
    copy(c)
}

object NfcNormalizeExpr {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
