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
