package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, LiteralValue}
import org.apache.spark.sql.types.DataType

/** Minimal bridge to `private[sql]` connector constructors the engine
  * offers no public factory for: a typed V2 literal (Expressions.literal
  * INFERS the type from a Scala value and cannot carry internal
  * representations like UTF8String). Used by LakeSinkTable.columns() to
  * surface stored column DEFAULTs through the V2 Column API. */
object ConnectorBridge {
  def literal(value: Any, dt: DataType): V2Literal[_] = LiteralValue(value, dt)
}
