package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** Column ⇄ Expression bridge. Spark 4 made these converters `private[sql]`
  * (Connect refactor), so extensions host a shim inside an `org.apache.spark.sql`
  * subpackage — the standard pattern for libraries that define native Catalyst
  * expressions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** InternalRow-level DataFrame constructor (`private[sql]` on the classic
    * session): lets per-partition folds run below the external Row codec —
    * the Row encoder's per-element array conversion costs ~4× on wide
    * token-array tables. */
  def internalCreateDataFrame(
      spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
