package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewProfileSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (0 -> 1000 rows), 100 uniform keys (10 rows each)
  private def skewed = spark.range(2000).select(
    when(col("id") < 1000, lit(0L)).otherwise((col("id") % 100) + 1).as("k"))

  test("histogram separates the hot key's magnitude from the uniform band") {
    val h = SkewProfile.histogram(skewed, Seq("k"))
      .orderBy("magnitude")
      .as[(Int, Long, Long, Long)].collect().toSeq
    // 100 keys of weight 10 -> magnitude 3; 1 key of weight 1000 -> 9
    assert(h == Seq((3, 100L, 1000L, 10L), (9, 1L, 1000L, 1000L)))
  }

  test("heavyKeys returns only outliers with a ceil salt factor") {
    val heavy = SkewProfile.heavyKeys(skewed, Seq("k"), targetPerTask = 64)
      .as[(Long, Long, Int)].collect().toSeq
    assert(heavy == Seq((0L, 1000L, 16)))
    // uniform data -> no heavy keys
    assert(SkewProfile.heavyKeys(skewed.filter(col("k") > 0), Seq("k"),
      64).count() == 0)
  }
}
