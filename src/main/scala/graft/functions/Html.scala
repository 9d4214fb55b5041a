package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for web-crawl corpora: the boilerplate-strip
  * step every Common-Crawl-style pipeline runs before quality
  * filtering and dedup (public recipe shape — jusText/trafilatura
  * family: drop non-content blocks, drop tags, decode entities,
  * collapse whitespace).
  *
  * Pure `regexp_replace`/`replace` Column chains — whole-stage
  * codegen, scan-speed, no UDFs, linear in input size. Every pattern
  * is RE2-compatible (non-greedy + inline flags, NO backreferences),
  * so the identical chain runs under java.util.regex here and under
  * RE2-based engines (the oracle re-derives it in DuckDB), and block
  * strips are per-tag rather than a `</\1>` backreference.
  */
object Html {

  /** Non-content block elements removed wholesale (scripts, styling,
    * navigation chrome). */
  val BlockTags: Seq[String] = Seq("script", "style", "nav")

  private def stripBlock(c: Column, tag: String): Column =
    regexp_replace(c, s"(?is)<$tag[^>]*>.*?</$tag>", " ")

  /** First <title> content (raw — entities decoded via [[decode]]). */
  def title(c: Column): Column =
    decode_(regexp_extract(c, "(?is)<title[^>]*>(.*?)</title>", 1))

  /** The common named/numeric entities, decoded in one determinate
    * pass order: specific entities first, `&amp;` LAST so an escaped
    * entity (`&amp;lt;`) decodes to its literal text (`&lt;`) and is
    * not double-decoded. */
  private def decode_(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (e, r)) => replace(acc, lit(e), lit(r)) }

  /** Visible text: strip block elements and comments, drop remaining
    * tags, decode entities, collapse whitespace. */
  def text(c: Column): Column = {
    val noBlocks = BlockTags.foldLeft(c)(stripBlock)
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]+>", " ")
    trim(regexp_replace(decode_(noTags), "\\s+", " "))
  }
}
