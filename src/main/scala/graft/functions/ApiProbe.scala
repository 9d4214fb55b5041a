package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Compile-time probe of the Spark 4.1 Column <-> Expression API surface. */
object ApiProbe {
  case class ProbeHash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(v.toString.hashCode.toLong)
    override protected def withNewChildInternal(c: Expression): ProbeHash = copy(c)
  }

  def probeHash(c: Column): Column =
    bridge.column(ProbeHash(bridge.expression(c)))
}
