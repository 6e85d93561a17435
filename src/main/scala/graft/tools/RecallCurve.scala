package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** Recall-vs-probe curve for the IVF ANN path (VERDICT r4 next-round #4:
  * report recall as a number, not just a test property): mean recall@k of
  * `ivfTopK` against the exact baseline over a query sample, swept over
  * nProbe at fixed nCells. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.RecallCurve"
  */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_RECALL_K", "10").toInt
    val nCells = sys.env.getOrElse("SPARK_GRAFT_RECALL_CELLS", "32").toInt
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_RECALL_QUERIES", "50").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("recall-curve")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val queries = e.filter(col("vec_id") < nQueries)
    val probes = Seq(1, 2, 4, 8, 16).filter(_ <= nCells)
    val rows = probes.map { p =>
      val t0 = System.nanoTime()
      val r = Similarity.annRecall(e, queries, k, nCells, p)
        .agg(avg(col("recall"))).head().getDouble(0)
      // annRecall's result pin is caller-owned (see its scaladoc); a sweep
      // would otherwise hold one dead cached result per probe point.
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
      val sec = (System.nanoTime() - t0) / 1e9
      f""""p$p":{"nProbe":$p,"mean_recall":$r%.4f,"sec":$sec%.2f}"""
    }
    println(s"""{"corpus":$n,"k":$k,"nCells":$nCells,"queries":$nQueries,""" +
      rows.mkString(",") + "}")
    spark.stop()
  }
}
