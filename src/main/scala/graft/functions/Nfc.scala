package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{bridge, NfcNormalizeExpr}

/** `graft_nfc(str)`: Unicode NFC canonicalization as a native codegen
  * Expression ([[org.apache.spark.sql.graft.NfcNormalizeExpr]]) — the
  * pre-hash normalization pass for text dedup keys and join keys
  * (composed vs decomposed accents are different bytes, identical
  * text). Registered as SQL function `graft_nfc` alongside the other
  * engine UDx; DuckDB's `nfc_normalize` / Postgres `normalize()`
  * produce byte-identical output (the Unicode standard pins NFC), so
  * normalized keys stay portable across engines.
  */
object Nfc {
  def apply(c: Column): Column =
    bridge.column(NfcNormalizeExpr(bridge.expression(c)))
}
