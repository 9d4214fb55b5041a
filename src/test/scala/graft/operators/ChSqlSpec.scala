package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChSqlSpec extends SparkSpec {
  import spark.implicits._

  test("translate rewrites the documented clickhouse namespace") {
    assert(ChSql.translate("SELECT toDate(ts), toDateTime(n) FROM table")
      == "SELECT to_date(ts), timestamp_seconds(n) FROM table")
    assert(ChSql.translate("quantile(0.9)(x)") == "percentile_approx(x, 0.9)")
    assert(ChSql.translate("toStartOfDay(ts)") == "date_trunc('day', ts)")
    assert(ChSql.translate("JSONExtractString(j, 'a')")
      == "get_json_object(j, '$.a')")
    assert(ChSql.translate("JSONExtractInt(j, 'n')")
      == "CAST(get_json_object(j, '$.n') AS BIGINT)")
    assert(ChSql.translate("uniqExact(u)") == "count(DISTINCT u)")
    assert(ChSql.translate("countIf(x > 1), argMax(a, b), groupArray(c)")
      == "count_if(x > 1), max_by(a, b), collect_list(c)")
    assert(ChSql.translate("toString(x)") == "CAST(x AS STRING)")
    assert(ChSql.translate("toString(min(x))") == "CAST(min(x) AS STRING)")
    assert(ChSql.translate("toUInt64(x)") == "CAST(x AS DECIMAL(20,0))")
    assert(ChSql.translate("splitByChar(',', s)")
      == """split(s, '\\Q,\\E')""")
    assert(ChSql.translate("cityHash64(k)") == "graft_stable_hash64(k)")
    // conditional family: balanced-paren rewrites
    assert(ChSql.translate("multiIf(a > 1, 'x', a > 0, 'y', 'z')")
      == "CASE WHEN a > 1 THEN 'x' WHEN a > 0 THEN 'y' ELSE 'z' END")
    assert(ChSql.translate("sumIf(f(x, y), p > 0)")
      == "sum(CASE WHEN p > 0 THEN f(x, y) END)")
    assert(ChSql.translate("avgIf(x, has(a, 'k,v'))")
      == "avg(CASE WHEN array_contains(a, 'k,v') THEN x END)")
    // constructs without a regular rewrite pass through untouched
    assert(ChSql.translate("match(s, p)") == "match(s, p)")
  }

  test("translate never rewrites inside string literals") {
    // function-like text in data stays data
    assert(ChSql.translate("SELECT x FROM t WHERE msg = 'has(x)'")
      == "SELECT x FROM t WHERE msg = 'has(x)'")
    assert(ChSql.translate("SELECT 'toString(a)', toString(b)")
      == "SELECT 'toString(a)', CAST(b AS STRING)")
    assert(ChSql.translate("SELECT 'uniqExact(u)' AS label, uniqExact(u)")
      == "SELECT 'uniqExact(u)' AS label, count(DISTINCT u)")
    // doubled-quote escape stays one literal
    assert(ChSql.translate("SELECT 'it''s multiIf(a,b,c)'")
      == "SELECT 'it''s multiIf(a,b,c)'")
    // literal arguments still translate around the literal
    assert(ChSql.translate("countIf(s = 'countIf(x)')")
      == "count_if(s = 'countIf(x)')")
  }

  test("translate recurses into nested same-function calls") {
    assert(ChSql.translate("multiIf(a, multiIf(b, 1, 2), 3)")
      == "CASE WHEN a THEN CASE WHEN b THEN 1 ELSE 2 END ELSE 3 END")
    assert(ChSql.translate("multiIf(a, 1, multiIf(b, 2, multiIf(c, 3, 4)))")
      == "CASE WHEN a THEN 1 ELSE CASE WHEN b THEN 2 ELSE " +
         "CASE WHEN c THEN 3 ELSE 4 END END END")
  }

  test("literal masking survives parametric and nested rewrites together") {
    // quantile rewrite fires while a literal holding quantile-like text
    // stays data
    assert(ChSql.translate(
      "SELECT quantile(0.5)(x) AS med, 'quantile(0.9)(y)' AS label FROM t")
      == "SELECT percentile_approx(x, 0.5) AS med, 'quantile(0.9)(y)' AS label FROM t")
    // nested multiIf whose branch VALUES are function-like literals:
    // the branches translate, the literals do not
    assert(ChSql.translate(
      "multiIf(a, 'multiIf(x,y,z)', b, multiIf(c, 'has(q)', 'uniq(u)'), 'end')")
      == "CASE WHEN a THEN 'multiIf(x,y,z)' WHEN b THEN " +
         "CASE WHEN c THEN 'has(q)' ELSE 'uniq(u)' END ELSE 'end' END")
    // malformed even arity fails fast instead of silently dropping an arg
    intercept[IllegalArgumentException] {
      ChSql.translate("multiIf(a, 1, b, 2)")
    }
    // aggregate-If calls nested inside multiIf branches, with literal
    // operands that name the very functions being rewritten
    assert(ChSql.translate(
      "multiIf(s = 'sumIf(v, p)', sumIf(v, p > 0), p < 0, avgIf(v, s != 'avgIf'), 0)")
      == "CASE WHEN s = 'sumIf(v, p)' THEN sum(CASE WHEN p > 0 THEN v END) " +
         "WHEN p < 0 THEN avg(CASE WHEN s != 'avgIf' THEN v END) ELSE 0 END")
    // JSONExtract whose sibling literal looks like a JSON call; the path
    // literal itself is consumed by the rewrite, the label is not
    assert(ChSql.translate(
      "SELECT JSONExtractString(j, 'name'), 'JSONExtractString(j, ''x'')' AS raw")
      == "SELECT get_json_object(j, '$.name'), 'JSONExtractString(j, ''x'')' AS raw")
    // splitByChar's masked char argument + a comma-bearing data literal
    assert(ChSql.translate(
      "SELECT splitByChar(',', s), 'a,b,c' AS keep FROM t")
      == """SELECT split(s, '\\Q,\\E'), 'a,b,c' AS keep FROM t""")
    // cast rewrite around a literal that names the cast
    assert(ChSql.translate("SELECT toInt64(v) AS n, 'toInt64(v)' AS how")
      == "SELECT CAST(v AS BIGINT) AS n, 'toInt64(v)' AS how")
  }

  test("translated clickhouse sql executes on spark") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (1L, "a,b", """{"k": 7}""", 10.0),
      (2L, "c", """{"k": 8}""", 30.0),
      (3L, "c,d,e", """{"k": 9}""", 20.0))
      .toDF("id", "csv", "j", "score")
    val out = Transformers.SqlTransform(ChSql.translate(
      "SELECT uniqExact(id) AS n, " +
        "argMax(id, score) AS best, " +
        "countIf(score > 15.0) AS big, " +
        "JSONExtractInt(j, 'k') AS k0 " +
        "FROM table GROUP BY JSONExtractInt(j, 'k') ORDER BY k0"))
      .apply(df)
    val rows = out.as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 1L, 0L, 7L), (1L, 2L, 1L, 8L), (1L, 3L, 1L, 9L)))
    // array path: splitByChar + arrayJoin
    val arr = Transformers.SqlTransform(ChSql.translate(
      "SELECT id, explode(splitByChar(',', csv)) AS part FROM table"))
      .apply(df)
    assert(arr.filter(col("id") === 3).count() == 3)
  }
}
