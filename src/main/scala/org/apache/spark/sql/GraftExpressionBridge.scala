package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the Column <-> catalyst Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) private[sql]; custom
  * codegen'd expressions (graft.util.StateMap) still need the bridge, so
  * this one-file shim re-exports the two converters. No behavior — pure
  * visibility. */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap an InternalRow RDD as a DataFrame with NO row conversion and NO
    * origin statistics (`internalCreateDataFrame` is private[sql]; same
    * pure-visibility role as the expression converters above). Used by
    * graft.io.Iterate: re-wrapping a localCheckpoint cache through the
    * public `createDataFrame(c.rdd, schema)` deserializes every cached
    * InternalRow into a boxed Row and re-encodes it in EVERY consumer
    * scan — a per-pass tax on all pinned tables. The LogicalRDD built
    * here keeps the flat default stats, so the Iterate stats barrier is
    * unchanged. */
  def internalDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
