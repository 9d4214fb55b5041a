package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("intThresholds: ceil-rank semantics, exact at boundaries") {
    // values 1..10, one each: cum(v) = v, n = 10
    val df = (1L to 10L).toDF("v")
    val th = Quantiles.intThresholds(df, "v", Seq(500, 501, 1000, 100))
      .as[(Int, Long)].collect().toMap
    assert(th(500) == 5L)   // ceil(10*0.500) = 5 -> first v with cum>=5
    assert(th(501) == 6L)   // ceil(10*0.501) = 6 (the boundary flips)
    assert(th(1000) == 10L) // max
    assert(th(100) == 1L)   // ceil(1) = 1
    // skewed histogram: repeated values share a threshold
    val skew = (Seq.fill(90)(7L) ++ Seq(1L, 2L) ++ Seq.fill(8)(9L)).toDF("v")
    val t2 = Quantiles.intThresholds(skew, "v", Seq(500, 950))
      .as[(Int, Long)].collect().toMap
    assert(t2(500) == 7L && t2(950) == 9L)
  }

  test("gate keeps exactly the in-band rows") {
    val df = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val out = Quantiles.gate(df, "v", 50, 950)
      .select("id").as[Long].collect().toSeq.sorted
    assert(out == (5L to 95L)) // thresholds 5 and 95, inclusive band
    // degenerate: single distinct value -> everything in band
    val const = Seq.fill(20)(42L).toDF("v")
    assert(Quantiles.gate(const, "v", 50, 950).count() == 20)
  }
}
