package graft.operators

/** ClickHouse-SQL → Spark-SQL translation for the `sql` transformer
  * (reference: pkg/transformer/registry/clickhouse/clickhouse_local.go
  * runs batch SQL through an embedded clickhouse-local; graft runs Spark
  * SQL). This translates the documented scalar/aggregate namespace
  * (docs/sql-dialect.md) so reference transformer configs can be pasted
  * as-is. Best-effort TEXT rewrite of the regular subset:
  *   - name-for-name swaps (arity and argument order preserved);
  *   - parametric rewrites (quantile(q)(x), toStartOfX, toString/toIntN
  *     casts, JSONExtract*, splitByChar argument swap);
  *   - hash functions route to the engine-stable md5 family, not CH's
  *     city/sip hashes (values differ across engines by construction).
  * Constructs without a regular rewrite (match, array length) are left
  * untouched for Spark to reject loudly rather than silently change
  * semantics.
  */
object ChSql {

  private val nameSwaps: Seq[(String, String)] = Seq(
    "parseDateTimeBestEffortOrNull" -> "try_to_timestamp",
    "parseDateTime32BestEffort" -> "to_timestamp",
    "parseDateTimeBestEffort" -> "to_timestamp",
    "formatDateTime" -> "date_format",
    "toUnixTimestamp" -> "unix_timestamp",
    "toDateTime" -> "timestamp_seconds",
    "toDate" -> "to_date",
    "dateDiff" -> "timestampdiff",
    "arrayJoin" -> "explode",
    "arrayMap" -> "transform",
    "arrayFilter" -> "filter",
    "arraySort" -> "array_sort",
    "arrayDistinct" -> "array_distinct",
    "has" -> "array_contains",
    "groupArray" -> "collect_list",
    "argMax" -> "max_by",
    "argMin" -> "min_by",
    "countIf" -> "count_if",
    "uniqCombined" -> "approx_count_distinct",
    "uniq" -> "approx_count_distinct",
    "any" -> "any_value",
    "ifNull" -> "nvl",
    "replaceRegexpAll" -> "regexp_replace",
    "replaceAll" -> "replace",
    "position" -> "instr",
    "cityHash64" -> "graft_stable_hash64",
    "sipHash64" -> "graft_stable_hash64",
    "halfMD5" -> "md5",
    "MD5" -> "md5",
    "now" -> "current_timestamp",
    "today" -> "current_date")

  private val castTypes: Seq[(String, String)] = Seq(
    "toString" -> "STRING",
    "toInt8" -> "TINYINT",
    "toInt16" -> "SMALLINT",
    "toInt32" -> "INT",
    "toInt64" -> "BIGINT",
    "toUInt8" -> "SMALLINT",
    "toUInt16" -> "INT",
    "toUInt32" -> "BIGINT",
    "toUInt64" -> "DECIMAL(20,0)",
    "toFloat32" -> "FLOAT",
    "toFloat64" -> "DOUBLE")

  // string-literal masking delimiters (cannot occur in SQL text)
  private val M = "\u0001"
  private val ME = "\u0002"

  /** Replace every single-quoted literal's CONTENT with an indexed
    * placeholder ('<M>i<ME>') so no rewrite can match function-like text
    * inside string data (e.g. WHERE msg = 'has(x)'). The surrounding
    * quotes stay, so quote-aware scanning and the literal-consuming
    * rewrites (JSONExtract paths, splitByChar) still see a literal.
    * A doubled quote ('') is CH's escape and stays inside one literal. */
  private def maskLiterals(sql: String): (String, Vector[String]) = {
    val lits = Vector.newBuilder[String]
    val out = new StringBuilder
    var i = 0; var n = 0
    while (i < sql.length) {
      if (sql(i) == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done && i < sql.length) {
          if (sql(i) == '\'' && i + 1 < sql.length && sql(i + 1) == '\'') {
            sb.append("''"); i += 2
          } else if (sql(i) == '\'') { done = true; i += 1 }
          else { sb.append(sql(i)); i += 1 }
        }
        lits += sb.toString
        out.append('\'').append(M).append(n).append(ME).append('\'')
        n += 1
      } else { out.append(sql(i)); i += 1 }
    }
    (out.toString, lits.result())
  }

  private def unmaskLiterals(sql: String, lits: Vector[String]): String =
    (M + """(\d+)""" + ME).r.replaceAllIn(sql,
      m => java.util.regex.Matcher.quoteReplacement(lits(m.group(1).toInt)))

  /** Split an argument list on top-level commas (parens and single
    * quotes respected). */
  private def splitArgs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inStr = false; val sb = new StringBuilder
    s.foreach {
      case '\'' => inStr = !inStr; sb += '\''
      case '(' if !inStr => depth += 1; sb += '('
      case ')' if !inStr => depth -= 1; sb += ')'
      case ',' if !inStr && depth == 0 => out += sb.toString.trim; sb.clear()
      case c => sb += c
    }
    out += sb.toString.trim
    out.result()
  }

  /** Rewrite every call of `fn` (balanced parens, quote-aware) via
    * `build` over its top-level argument list. */
  private def rewriteCall(sql: String, fn: String)
                         (build: Seq[String] => String): String = {
    val idx = sql.indexOf(fn + "(")
    if (idx < 0) sql
    else if (idx > 0 && (sql(idx - 1).isLetterOrDigit || sql(idx - 1) == '_'))
      // not a word boundary: leave and continue past it
      sql.take(idx + fn.length) +
        rewriteCall(sql.drop(idx + fn.length), fn)(build)
    else {
      var depth = 0; var inStr = false
      var end = -1; var i = idx + fn.length
      while (end < 0 && i < sql.length) {
        sql(i) match {
          case '\'' => inStr = !inStr
          case '(' if !inStr => depth += 1
          case ')' if !inStr => depth -= 1; if (depth == 0) end = i
          case _ => ()
        }
        i += 1
      }
      if (end < 0) sql // unbalanced: leave for Spark to reject
      else {
        val args = splitArgs(sql.substring(idx + fn.length + 1, end))
        sql.take(idx) + build(args) +
          rewriteCall(sql.substring(end + 1), fn)(build)
      }
    }
  }

  /** [[rewriteCall]] to fixpoint: a call nested inside another call of
    * the SAME function lands untranslated in the built output (the scan
    * recurses past the call, not into it) — re-running until stable
    * translates arbitrarily nested multiIf-in-multiIf. Terminates: every
    * pass removes at least one `fn(` occurrence. */
  private def rewriteFix(sql: String, fn: String)
                        (build: Seq[String] => String): String = {
    val out = rewriteCall(sql, fn)(build)
    if (out == sql) out else rewriteFix(out, fn)(build)
  }

  def translate(sql: String): String = {
    // literals out first: no rewrite below can touch string data
    val (masked, lits) = maskLiterals(sql)
    var s = masked
    // multiIf(c1,v1,c2,v2,…,else) -> CASE WHEN … END. Arity must be odd
    // (pairs + else) — CH rejects even arity, and a silent grouped(2)
    // pass would DROP the unpaired argument: fail fast instead.
    s = rewriteFix(s, "multiIf") { args =>
      require(args.length >= 3 && args.length % 2 == 1,
        s"multiIf requires an odd argument count (cond/value pairs + else), got ${args.length}")
      val whens = args.dropRight(1).grouped(2).collect {
        case Seq(c, v) => s"WHEN $c THEN $v"
      }.mkString(" ")
      s"CASE $whens ELSE ${args.last} END"
    }
    // sumIf/avgIf/minIf/maxIf(x, p) -> agg(CASE WHEN p THEN x END)
    for (agg <- Seq("sum", "avg", "min", "max"))
      s = rewriteFix(s, agg + "If") { args =>
        s"$agg(CASE WHEN ${args(1)} THEN ${args(0)} END)"
      }
    // uniqExact(x) -> count(DISTINCT x)
    s = """uniqExact\(([^()]+)\)""".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"count(DISTINCT ${m.group(1)})"))
    // quantile(q)(x) -> percentile_approx(x, q)
    s = """quantile\(([^()]+)\)\(([^()]+)\)""".r
      .replaceAllIn(s, m => s"percentile_approx(${m.group(2)}, ${m.group(1)})")
    // toStartOfDay/Hour/Minute/Month/Year(t) -> date_trunc('day', t)
    s = """toStartOf(Day|Hour|Minute|Month|Year)\(""".r
      .replaceAllIn(s, m => s"date_trunc('${m.group(1).toLowerCase}', ")
    // JSONExtract<T>(j, 'path') -> typed get_json_object
    def jsonPath(p: String) = "'$." + p.stripPrefix("'").stripSuffix("'") + "'"
    s = """JSONExtractString\(([^,]+),\s*('[^']*')\)""".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"get_json_object(${m.group(1)}, ${jsonPath(m.group(2))})"))
    for ((fn, t) <- Seq("JSONExtractInt" -> "BIGINT",
        "JSONExtractFloat" -> "DOUBLE", "JSONExtractBool" -> "BOOLEAN"))
      s = (fn + """\(([^,]+),\s*('[^']*')\)""").r
        .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
          s"CAST(get_json_object(${m.group(1)}, ${jsonPath(m.group(2))}) AS $t)"))
    s = """JSONHas\(([^,]+),\s*('[^']*')\)""".r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"(get_json_object(${m.group(1)}, ${jsonPath(m.group(2))}) IS NOT NULL)"))
    // splitByChar('c', s) -> split(s, 'c') with the regex char escaped
    // (the char literal is masked at this point — match the placeholder)
    s = ("""splitByChar\('(""" + M + """\d+""" + ME + """)',\s*([^()]+)\)""").r
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        s"split(${m.group(2)}, '\\\\Q${m.group(1)}\\\\E')"))
    // toString/toIntN/... single-argument casts (args may nest one
    // paren level, e.g. toString(min(x)))
    for ((fn, t) <- castTypes)
      s = ("""\b""" + fn + """\(((?:[^()]|\([^()]*\))*)\)""").r
        .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
          s"CAST(${m.group(1)} AS $t)"))
    // plain name-for-name function swaps (word boundary + open paren)
    for ((ch, sp) <- nameSwaps)
      s = ("""\b""" + ch + """\s*\(""").r.replaceAllIn(s, sp + "(")
    unmaskLiterals(s, lits)
  }
}
