package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{bridge, MaskPreserveExpr}

/** `graft_mask(str, seed)`: format-preserving masking as a native
  * codegen Expression ([[org.apache.spark.sql.graft.MaskPreserveExpr]])
  * — digit→digit, upper→upper, lower→lower, everything else
  * unchanged, each character drawn from a seeded per-position md5.
  * The shape-preserving counterpart of the redaction-style
  * transformers (mask_field): masked values still parse. */
object Mask {
  def apply(c: Column, seed: Int): Column =
    bridge.column(MaskPreserveExpr(bridge.expression(c), seed))
}
