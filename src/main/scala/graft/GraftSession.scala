package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession builder for the engine: the configuration a
  * 1000-executor deployment wants, applied consistently in local mode
  * too so plans exercised in tests are the plans that run at scale.
  *
  *   - AQE on (runtime re-planning replaces the reference's hand-rolled
  *     part sizing, sharding_storage.go DesiredTableSize);
  *   - AQE coalescing + skew-join handling (≙ salting for hot keys);
  *   - UTC session time, nanos-as-long for ns parquet, engine SQL
  *     functions registered.
  *
  * `spark.sql.shuffle.partitions` stays a small explicit number in
  * local mode; under AQE it is only the pre-coalesce upper bound, and a
  * cluster deployment should raise it to ~2-3x total cores.
  */
object GraftSession {
  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")

  def create(master: String = s"local[${Runtime.getRuntime.availableProcessors()}]")
      : SparkSession = {
    val spark = builder(master).getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    graft.sources.GraftJdbcDialect.register()
    spark
  }
}
