package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.bridge

/** Engine SQL-function registration (the UDx surface, SURVEY §2.8).
  *
  * Two entry points:
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *     build (the SparkSessionExtensions path);
  *   - `GraftFunctions.register(spark)` on a live session (tests, REPL).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // plan-level extension: transparent range-join bucketization for
    // the SQL surface (gated on spark.graft.rangejoin.bucketWidth)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // whole-operator extension: the native as-of merge join
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
  }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  val all: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_stable_hash64",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.StableHash64Expr].getName,
        "graft_stable_hash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_stable_hash64 takes one argument")
        org.apache.spark.sql.graft.StableHash64Expr(args.head)
      }),
    ("graft_dot",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.DotProductExpr].getName,
        "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes two arguments")
        org.apache.spark.sql.graft.DotProductExpr(args(0), args(1))
      }),
    ("graft_topk",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.TopKExpr].getName,
        "graft_topk"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_topk(score, id, k) takes three arguments")
        val k = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk k must be an integer literal, got $other")
        }
        org.apache.spark.sql.graft.TopKExpr(args(0), args(1), k)
          .toAggregateExpression()
      }),
    ("graft_shingles",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.ShinglesExpr].getName,
        "graft_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "graft_shingles(text, n) takes two arguments")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingles n must be an integer literal, got $other")
        }
        org.apache.spark.sql.graft.ShinglesExpr(args.head, n)
      }),
    ("graft_nfc",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.NfcNormalizeExpr].getName,
        "graft_nfc"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_nfc takes one argument")
        org.apache.spark.sql.graft.NfcNormalizeExpr(args.head)
      }),
    ("graft_mask",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.MaskPreserveExpr].getName,
        "graft_mask"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_mask(str, seed) takes two arguments")
        val seed = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_mask seed must be an integer literal, got $other")
        }
        org.apache.spark.sql.graft.MaskPreserveExpr(args.head, seed)
      }))

  /** Register on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      bridge.functionRegistry(spark)
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
