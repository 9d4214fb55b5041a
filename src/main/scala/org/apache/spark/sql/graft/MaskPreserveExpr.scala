package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Format-preserving masking: every ASCII digit maps to a digit,
  * upper to upper, lower to lower; everything else (punctuation,
  * separators, non-ASCII) passes through — so masked values keep
  * their SHAPE (lengths, dashes, checksum-field positions) and
  * downstream parsers, regexes, and layout-sensitive tests keep
  * working while the values are gone (the reference's masking
  * transformer family, hash flavor; cf. its mask_field rows).
  *
  * Deterministic and seeded: each character's substitute is
  * `class_base + md5("<seed>:<pos>:<char>") % class_size` — a pure
  * per-position substitution any engine can replay (the DuckDB
  * oracle re-derives every character), equal inputs mask equally,
  * but equal CHARACTERS at different positions do not (no frequency
  * leak within a value). Not reversible; use vault-style tokenization
  * when reversibility is required.
  */
case class MaskPreserveExpr(child: Expression, seed: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_mask"

  override def nullSafeEval(v: Any): Any =
    MaskPreserveExpr.mask(v.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MaskPreserveExpr.mask($c, $seed)")

  override protected def withNewChildInternal(c: Expression): MaskPreserveExpr =
    copy(child = c)
}

object MaskPreserveExpr {
  /** One MD5 instance per executor thread: masking a corpus column
    * evaluates draw() once per character, and MessageDigest
    * construction (provider lookup + state alloc) would otherwise
    * dominate the codegen hot path. reset() is implicit in digest().
    * Output bytes are identical to a fresh instance. */
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 32-bit md5 prefix of "<seed>:<pos>:<char>" — the repo's hex8
    * discipline, so any engine reproduces the draw. */
  private def draw(seed: Int, pos: Int, ch: Char): Long = {
    val d = md5.get().digest(s"$seed:$pos:$ch".getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def mask(s: UTF8String, seed: Int): UTF8String = {
    val str = s.toString
    val out = new StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val ch = str.charAt(i)
      out.append(
        if (ch >= '0' && ch <= '9') ('0' + (draw(seed, i, ch) % 10)).toChar
        else if (ch >= 'A' && ch <= 'Z') ('A' + (draw(seed, i, ch) % 26)).toChar
        else if (ch >= 'a' && ch <= 'z') ('a' + (draw(seed, i, ch) % 26)).toChar
        else ch)
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}
