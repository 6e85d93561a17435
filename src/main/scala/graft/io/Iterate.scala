package graft.io

import org.apache.spark.sql.DataFrame

/** Lineage + statistics barrier for iterative dataflows.
  *
  * `df.localCheckpoint(true)` alone is NOT enough for a superstep loop on
  * Spark 4: the resulting LogicalRDD PRESERVES the origin plan's estimated
  * statistics, and a hedonic/PageRank/CC round joins the previous state
  * back in k times, so sizeInBytes estimates multiply ~k^superstep. After
  * ~10 rounds the SizeInBytesOnlyStatsPlanVisitor is multiplying BigInts
  * with millions of digits and the DRIVER becomes the bottleneck (observed:
  * main thread pegged in BigInteger.multiplyToomCook3).
  *
  * `pin` materializes the state (eager localCheckpoint — cached, RDD
  * lineage truncated) and then re-wraps the cached RDD via
  * `createDataFrame(rdd, schema)`, whose LogicalRDD carries NO origin
  * stats — the estimate resets to the flat default every round. The extra
  * cost is one InternalRow<->Row conversion over the (small, V-row) state
  * per downstream job — noise next to a superstep's shuffles.
  */
object Iterate {
  def pin(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint(true)
    c.sparkSession.createDataFrame(c.rdd, c.schema)
  }
}
