package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation (the de-facto public
  * recipe: URL-level dedup runs on a NORMALIZED url, or near-identical
  * pages survive as distinct keys). Pure RE2-compatible regexp chains —
  * codegen'd, scan-speed, and the identical patterns run in any
  * RE2-family engine, so the oracle re-derives them verbatim.
  *
  * Normalization: drop the fragment; drop tracking params (utm_*,
  * ref=); lowercase ONLY scheme+authority (paths are case-sensitive by
  * spec); strip a leading www.; strip any trailing /, ? or &.
  * Deliberately conservative — no path re-encoding, no param
  * reordering — false distinctions over false merges. */
object UrlOps {

  def normalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // tracking params are matched from their [?&] delimiter so a SUFFIX
    // collision cannot fire (`?href=x` / `?pref=1` / `?xutm_source=1`
    // are distinct params and must survive — an unanchored strip merged
    // distinct pages into one dedup key). A run of consecutive tracking
    // params collapses in one match — the `(&|$)` unit terminator keeps
    // the scan position on the next param's delimiter, where a consumed
    // trailing `&` would hide it from the single-pass replace.
    val noTrack = regexp_replace(noFrag,
      "([?&])((utm_[A-Za-z0-9_]*|ref)=[^&#]*(&|$))+", "$1")
    val clean = regexp_replace(noTrack, "[?&]+$", "")
    val lowered = concat(
      lower(regexp_extract(clean, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
      regexp_extract(clean, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1))
    val noWww = regexp_replace(lowered, "://www\\.", "://")
    regexp_replace(noWww, "/+$", "")
  }

  /** Registrable host of a normalized url. */
  def host(u: Column): Column =
    regexp_extract(u, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
}
