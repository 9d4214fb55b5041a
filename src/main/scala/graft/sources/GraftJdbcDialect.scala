package graft.sources

import graft.model.TypeMapping
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._
import java.sql.Types

/** JDBC dialect preserving the engine's canonical type lattice across a
  * JDBC boundary (reference: per-provider typesystem rules,
  * pkg/abstract/typesystem/schema.go:35-46 SourceRules/TargetRule; e.g.
  * pkg/providers/postgres/typesystem.go). The two mappings Spark's stock
  * dialects get wrong for our lattice:
  *
  *   - unsigned BIGINT (uint64): read as Decimal(20,0), never silently
  *     overflow into Long (TypeMapping's uint64 decision);
  *   - write Decimal(20,0) back as an unsigned/NUMERIC(20) column.
  *
  * Register with `JdbcDialects.registerDialect(GraftJdbcDialect)` before
  * opening JDBC sources; `canHandle` claims the graft-tagged JDBC URLs
  * (jdbc:graft:<real-url> passthrough) so stock dialects stay untouched
  * elsewhere.
  */
object GraftJdbcDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:graft:")

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] = {
    val unsigned = typeName.toUpperCase.contains("UNSIGNED")
    (sqlType, unsigned) match {
      case (Types.BIGINT, true) =>
        md.putString(TypeMapping.OriginalTypeMeta, s"jdbc:$typeName")
        Some(DecimalType(20, 0))                     // uint64
      case (Types.INTEGER, true) => Some(LongType)   // uint32
      case (Types.SMALLINT, true) => Some(IntegerType) // uint16
      case (Types.TINYINT, true) => Some(ShortType)  // uint8
      case (Types.TINYINT, false) => Some(ByteType)  // int8 (stock maps to Int)
      case _ => None
    }
  }

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case d: DecimalType if d.precision == 20 && d.scale == 0 =>
      Some(JdbcType("NUMERIC(20)", Types.NUMERIC))
    case ByteType => Some(JdbcType("TINYINT", Types.TINYINT))
    case _ => None
  }

  def register(): Unit = JdbcDialects.registerDialect(this)
}
