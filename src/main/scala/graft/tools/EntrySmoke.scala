package graft.tools

import org.apache.spark.sql.SparkSession

/** Flagship smoke (the driver's rows>0 check on SparkEntry.entry),
  * runnable locally: `sbt -batch "runMain graft.tools.EntrySmoke"`. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.SparkEntry.entry(spark).count()
    println(s"""{"entry_rows":$rows}""")
    spark.stop()
    if (rows <= 0) sys.exit(1)
  }
}
