package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution
import java.util.concurrent.ConcurrentHashMap

/** Dataflow metering: the Spark rendering of the reference's
  * InputDataMetering / OutputDataMetering / Statistician middlewares
  * (reference: pkg/sink_factory/sink_factory.go:100-133,
  * middlewares/statistician.go:13).
  *
  * `tap` attaches named row/byte counters to a frame via `observe` —
  * they piggyback on whatever action executes the plan (no extra pass).
  * [[MeteringListener]] collects observed metrics per query through the
  * public QueryExecutionListener API.
  */
object Metering {

  /** Observe rows and approximate bytes flowing through this point of
    * the plan under `name`. */
  def tap(df: DataFrame, name: String): DataFrame = {
    val bytes = df.columns.map(c => coalesce(octet_length(col(c).cast("string")),
      lit(0)).cast("long")).reduceOption(_ + _).getOrElse(lit(0L))
    df.observe(name, count(lit(1)).as("rows"), sum(bytes).as("bytes"))
  }

  final class MeteringListener extends QueryExecutionListener {
    val metrics = new ConcurrentHashMap[String, Map[String, Long]]()

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        val m = row.schema.fieldNames.zipWithIndex.collect {
          case (f, i) if !row.isNullAt(i) && row.get(i).isInstanceOf[Long] =>
            f -> row.getLong(i)
        }.toMap
        metrics.put(name, m)
      }

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
  }

  /** Register a listener; returns it for metric retrieval. */
  def listen(spark: SparkSession): MeteringListener = {
    val l = new MeteringListener
    spark.listenerManager.register(l)
    l
  }
}
