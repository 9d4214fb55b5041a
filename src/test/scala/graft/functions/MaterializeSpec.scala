package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  test("default: corpus() local-checkpoints eagerly — result detached " +
    "from lineage, values identical") {
    val df = (1L to 100L).toDF("v").withColumn("d", col("v") * 2)
    val out = Materialize.corpus(df)
    // eager + truncated: the materialized plan bottoms out in an RDD
    // leaf, not the original LocalRelation
    assert(out.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.nodeName.contains("LogicalRDD")))
    assert(out.as[(Long, Long)].collect().toSet ==
      (1L to 100L).map(v => (v, v * 2)).toSet)
  }

  test("spark.graft.checkpointDir routes through RELIABLE checkpoint " +
    "(survives executor loss by contract), same values") {
    val dir = "/tmp/graft_materialize_spec_ckpt"
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val df = (1L to 50L).toDF("v")
      val out = Materialize.corpus(df)
      assert(out.as[Long].collect().toSet == (1L to 50L).toSet)
      // the reliable checkpoint actually wrote to the configured dir
      val fs = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(new org.apache.hadoop.fs.Path(dir)) &&
        fs.listStatus(new org.apache.hadoop.fs.Path(dir)).nonEmpty)
      // an operator routed through the knob produces the same answer:
      // tfidfKeywords' tf table is a Materialize.corpus site
      val docs = Seq((1L, "alpha beta beta"), (2L, "alpha gamma"))
        .toDF("doc_id", "text")
      val withKnob = TextAnalysis
        .tfidfKeywords(docs, "text", "doc_id", k = 2)
        .collect().map(_.toSeq).toSet
      spark.conf.unset("spark.graft.checkpointDir")
      val without = TextAnalysis
        .tfidfKeywords(docs, "text", "doc_id", k = 2)
        .collect().map(_.toSeq).toSet
      assert(withKnob == without)
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }
}
