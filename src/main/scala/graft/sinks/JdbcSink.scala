package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** JDBC sink (reference: the pg/mysql/greenplum write directions —
  * pkg/providers/postgres/sink.go, mysql sink; snapshot upload is
  * bidirectional in the reference, so an engine without a JDBC write
  * path only covers half the matrix).
  *
  * Built on `df.write.jdbc` with [[graft.sources.GraftJdbcDialect]]
  * registered, so the engine's canonical lattice survives the boundary
  * (uint64 ≙ Decimal(20,0) → NUMERIC(20), int8 → TINYINT). Cleanup
  * policies map onto SaveMode/truncate exactly like the reference's
  * Drop/Truncate/Disabled activation semantics.
  */
object JdbcSink {

  /** Column DDL the sink issues for a schema on a given URL — the
    * dialect-resolution path `df.write.jdbc` uses, exposed for tests and
    * dry-run inspection (no server needed). */
  def columnDdl(schema: StructType, url: String): Seq[(String, String)] = {
    graft.sources.GraftJdbcDialect.register()
    val dialect = JdbcDialects.get(url)
    schema.fields.toSeq.map { f =>
      val jt = dialect.getJDBCType(f.dataType).orElse(
        org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
          .getCommonJDBCType(f.dataType))
        .getOrElse(throw new IllegalArgumentException(
          s"no JDBC type for ${f.dataType} (${f.name})"))
      f.name -> jt.databaseTypeDefinition
    }
  }

  def createTableDdl(schema: StructType, table: String, url: String): String =
    columnDdl(schema, url)
      .map { case (n, t) => s""""$n" $t""" }
      .mkString(s"CREATE TABLE $table (", ", ", ")")

  /** Write a frame into a JDBC table. Drop → overwrite (re-create),
    * Truncate → overwrite keeping the table (TRUNCATE + reload),
    * Disabled → append. */
  def write(df: DataFrame, url: String, table: String,
            policy: Sinks.CleanupPolicy = Sinks.Disabled,
            properties: Map[String, String] = Map.empty): Unit = {
    graft.sources.GraftJdbcDialect.register()
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    val w = df.write
    val configured = policy match {
      case Sinks.Drop => w.mode("overwrite")
      case Sinks.Truncate => w.mode("overwrite").option("truncate", "true")
      case Sinks.Disabled => w.mode("append")
    }
    configured.jdbc(url, table, props)
  }
}
