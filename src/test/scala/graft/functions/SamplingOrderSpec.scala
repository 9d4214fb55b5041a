package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sampling.reservoirPerGroup]] and [[Sampling.trainOrder]]:
  * determinism, bounds, and the two-level-shuffle invariants. */
class SamplingOrderSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.range(0, 400)
    .select(col("id").as("doc_id"),
      concat(lit("g"), (col("id") % 7).cast("string")).as("grp"))

  test("reservoirPerGroup: exactly k per group, ranks 1..k") {
    val got = Sampling.reservoirPerGroup(docs, Seq("grp"), "doc_id",
      k = 5, seed = 1)
    val perGroup = got.groupBy("grp").agg(count(lit(1)).as("n"),
      min("draw_rank").as("lo"), max("draw_rank").as("hi"))
      .as[(String, Long, Int, Int)].collect()
    assert(perGroup.length == 7)
    assert(perGroup.forall(g => g._2 == 5 && g._3 == 1 && g._4 == 5))
  }

  test("reservoirPerGroup: k >= group size returns the whole group") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "grp")
    val got = Sampling.reservoirPerGroup(tiny, Seq("grp"), "doc_id",
      k = 10, seed = 9)
    assert(got.count() == 3)
    assert(got.groupBy("grp").count().as[(String, Long)].collect()
      .toMap == Map("a" -> 2, "b" -> 1))
  }

  test("reservoirPerGroup: deterministic across partitioning and runs") {
    def draw(df: org.apache.spark.sql.DataFrame) =
      Sampling.reservoirPerGroup(df, Seq("grp"), "doc_id", k = 4, seed = 42)
        .as[(String, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(draw(docs) == draw(docs.repartition(13)))
    // different seed draws a different sample
    val other = Sampling.reservoirPerGroup(docs, Seq("grp"), "doc_id",
      k = 4, seed = 43).as[(String, Long, Int)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(draw(docs) != other)
  }

  test("trainOrder: bijective (shard,pos) over the input, pos dense per shard") {
    val got = Sampling.trainOrder(docs.select("doc_id"), "doc_id",
      shards = 8, seed = 5)
    assert(got.count() == 400)
    // every row lands in [0,8) with a unique (shard, pos)
    assert(got.filter(col("shard") < 0 || col("shard") >= 8).count() == 0)
    assert(got.select("shard", "pos").distinct().count() == 400)
    // pos is 1..|shard| dense within each shard
    val dense = got.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .as[(Long, Long, Int, Int)].collect()
    assert(dense.forall(s => s._3 == 1 && s._4 == s._2))
    // the hash-rank is not the identity order: some shard's pos order
    // differs from doc_id order
    val monotone = got.withColumn("prev", lag("doc_id", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("pos")))
      .filter(col("prev").isNotNull && col("prev") > col("doc_id"))
    assert(monotone.count() > 0)
  }

  test("trainOrder: reruns regenerate byte-identical order") {
    def order() = Sampling.trainOrder(docs.select("doc_id"), "doc_id",
        shards = 4, seed = 11)
      .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
    assert(order() == order())
  }
}
