package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-level and SQL-level surface for graft's custom Catalyst
  * expressions. */
object GraftFunctions {

  /** Codegen'd exact dot product of two array<bigint> columns. */
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register `graft_dot` for the SQL surface (spark.sql("... graft_dot(a,b)")). */
  def register(spark: SparkSession): Unit =
    ColumnBridge.functionRegistry(spark)
      .createOrReplaceTempFunction("graft_dot",
        exprs => LongArrayDot(exprs.head, exprs(1)), "built-in")
}
