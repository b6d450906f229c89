package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftx.{bridge, FloatVectorDot}

/** Column/SQL facade over graft's native Catalyst vector expressions
  * (see org.apache.spark.sql.graftx.FloatVectorDot).
  */
object VectorFns {
  /** Column API: dot product of two ArrayType(FloatType) columns. */
  def vec_dot(a: Column, b: Column): Column =
    bridge.column(FloatVectorDot(bridge.expression(a), bridge.expression(b)))

  /** SQL registration: SELECT vec_dot(a, b) ... */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVectorDot(exprs(0), exprs(1)), "scala_udf")
}
