package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{bridge, StableHash64Expr}

/** `graft_stable_hash64(str)`: the engine's cross-engine-stable 32-bit
  * hash (first 8 hex chars of md5 as a Long — see [[Hashing]]) as a
  * native Catalyst expression with whole-stage codegen
  * ([[org.apache.spark.sql.graft.StableHash64Expr]]).
  *
  * The Column-function spelling `conv(substring(md5(x),1,8),16,10)`
  * allocates two intermediate UTF8Strings per row; the native form goes
  * bytes -> MD5 -> long directly. Demonstrates the custom-Expression
  * UDx path (SURVEY §2.8): prefer built-ins, then a native Expression
  * with doGenCode, then (last) a Scala UDF.
  */
object StableHash64 {
  def apply(c: Column): Column =
    bridge.column(StableHash64Expr(bridge.expression(c)))
}
