package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plan has no shuffle exchange on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = graft.Tables.load(spark, sf(), "orders")
      val l = graft.Tables.load(spark, sf(), "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      Bucketing.writeBucketed(o, "b_orders", 4, Seq("o_orderkey"))
      Bucketing.writeBucketed(l, "b_lineitem", 4, Seq("o_orderkey"))
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == l.count()) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted join returns exactly the unsalted join's rows") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v") // key 1 is hot
    val small = Seq((1L, "one"), (2L, "two"), (500L, "x")).toDF("k", "name")
    val expected = big.join(small, "k").select("k", "v", "name")
      .collect().toSet
    val got = SaltedJoin.join(big, small, "k", salt = 8)
      .select("k", "v", "name").collect().toSet
    assert(got == expected)
    // stable-hash salt: same results, and the salt of any row is a pure
    // function of the salt column — reproducible across partitionings
    val stable = SaltedJoin.join(big, small, "k", salt = 8,
      saltCol = Some("v"))
    assert(stable.select("k", "v", "name").collect().toSet == expected)
    val s1 = SaltedJoin.join(big.repartition(3), small, "k", salt = 8,
      saltCol = Some("v")).withColumn("__s",
        pmod(graft.functions.Hashing.hex8ToLong(col("v").cast("string")), lit(8L)))
    assert(s1.select("__s").distinct().count() <= 8)
  }
}
