package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class WindowKeysSpec extends SparkSpec {
  import spark.implicits._

  test("onePartition is 0 for every input, including null and NaN") {
    val df = Seq[java.lang.Double](1.0, -7.5, 0.0, Double.NaN, null,
        Double.MaxValue, Double.MinPositiveValue)
      .toDF("v").select(WindowKeys.onePartition(col("v")).as("k"))
    assert(df.distinct().as[Long].collect().toSeq == Seq(0L))
  }

  test("a WindowKeys-partitioned window survives optimization with a " +
    "non-empty spec and no SinglePartition exchange") {
    val df = spark.range(1000).select(col("id"),
        sum(col("id")).over(
          Window.partitionBy(WindowKeys.onePartition(col("id")))
            .orderBy("id")).as("cum"))
    // the optimizer must NOT prune the partition key (lit(1) would be
    // folded and pruned by EliminateWindowPartitions, reintroducing
    // both the WindowExec warning and an Exchange SinglePartition)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
    assert(!df.queryExecution.executedPlan.toString
      .contains("Exchange SinglePartition"))
    // and the values are the plain running sum — one partition in fact
    val got = df.orderBy("id").limit(4).select("cum")
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 3L, 6L))
  }

  test("the foldable spelling IS pruned — the hazard onePartition avoids") {
    val pruned = spark.range(10).select(
      sum(col("id")).over(
        Window.partitionBy(lit(1)).orderBy("id")).as("cum"))
    val windows = pruned.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // lit(1) folds away: empty partition spec — documents WHY the
    // non-foldable key exists
    assert(windows.forall(_.partitionSpec.isEmpty))
  }
}
