package graft.operators

import graft.SparkSpec
import graft.operators.FilterGrammar._

class FilterGrammarSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "alpha", 10.5, true),
    (2L, "beta", 20.0, false),
    (3L, "gamma", 30.5, true),
    (4L, null.asInstanceOf[String], 40.0, false),
  ).toDF("id", "name", "score", "flag")

  private def ids(filter: String): Seq[Long] =
    df.filter(compile(filter)).select("id").as[Long].collect().toSeq.sorted

  test("comparison operators") {
    assert(ids("id = 2") == Seq(2L))
    assert(ids("id != 2") == Seq(1L, 3L, 4L))
    assert(ids("score < 20.0") == Seq(1L))
    assert(ids("score <= 20.0") == Seq(1L, 2L))
    assert(ids("score > 30") == Seq(3L, 4L))
    assert(ids("score >= 30.5") == Seq(3L, 4L))
  }

  test("IN / NOT IN with list literals") {
    assert(ids("id IN (1, 3)") == Seq(1L, 3L))
    assert(ids("id NOT IN (1, 3)") == Seq(2L, 4L))
    assert(ids("name IN ('alpha', 'beta')") == Seq(1L, 2L))
  }

  test("regex match and negation") {
    assert(ids("name ~ '^a'") == Seq(1L))
    assert(ids("name !~ '^g'") == Seq(1L, 2L)) // gamma excluded; null drops
  }

  test("AND conjunction of terms") {
    assert(ids("score > 10 AND flag = TRUE") == Seq(1L, 3L))
    assert(ids("id >= 2 AND id <= 3 AND name != 'beta'") == Seq(3L))
  }

  test("quoting: single, double, escapes; case-insensitive keywords") {
    assert(ids("""name = "beta"""") == Seq(2L))
    assert(ids("name in ('beta')") == Seq(2L))
    assert(ids("flag = false and id not in (2)") == Seq(4L))
  }

  test("NULL semantics") {
    assert(ids("name = NULL") == Seq(4L))
    assert(ids("name != NULL") == Seq(1L, 2L, 3L))
  }

  test("multiple filters OR together (compileAny)") {
    val got = df.filter(compileAny(Seq("id = 1", "name = 'beta'")))
      .select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 2L))
  }

  test("parse errors are rejected") {
    intercept[IllegalArgumentException](parse("id ="))
    intercept[IllegalArgumentException](parse("= 3"))
    intercept[IllegalArgumentException](parse("id = 'unterminated"))
    intercept[IllegalArgumentException](parse("id = 1 garbage"))
    intercept[IllegalArgumentException](parse("id NOT 5"))
  }

  test("parsed term structure") {
    assert(parse("a >= 3 AND b IN ('x', 'y')") == Seq(
      Term("a", ">=", SNum(3.0, isInt = true)),
      Term("b", "IN", SList(Seq(SStr("x"), SStr("y"))))))
  }

  test("property: rendered random terms parse back to the same AST") {
    val rnd = new scala.util.Random(99)
    def renderValue(v: Value): String = v match {
      case SStr(x) => s"'$x'"
      case SNum(d, true) => d.toLong.toString
      case SNum(d, false) => d.toString
      case SBool(b) => if (b) "TRUE" else "FALSE"
      case SNull => "NULL"
      case SList(vs) => vs.map(renderValue).mkString("(", ", ", ")")
    }
    def genValue(forIn: Boolean): Value =
      if (forIn) SList((1 to 1 + rnd.nextInt(3)).map(_ => genScalar()))
      else genScalar()
    def genScalar(): Value = rnd.nextInt(4) match {
      case 0 => SStr(rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
      case 1 => SNum(rnd.nextInt(1000), isInt = true)
      case 2 => SNum(math.round(rnd.nextDouble() * 1000) / 4.0, isInt = false)
      case 3 => SBool(rnd.nextBoolean())
    }
    val ops = Seq("=", "!=", "<", "<=", ">", ">=", "~", "!~", "IN", "NOT IN")
    for (_ <- 1 to 50) {
      val terms = (1 to 1 + rnd.nextInt(3)).map { _ =>
        val op = ops(rnd.nextInt(ops.length))
        val v = op match {
          case "IN" | "NOT IN" => genValue(forIn = true)
          case "~" | "!~" => SStr(rnd.alphanumeric.take(4).mkString)
          case _ => genValue(forIn = false)
        }
        Term("c" + rnd.nextInt(5), op, v)
      }
      val rendered = terms.map(t =>
        s"${t.attr} ${t.op} ${renderValue(t.value)}").mkString(" AND ")
      assert(parse(rendered) == terms, s"round-trip failed for: $rendered")
    }
  }
}
