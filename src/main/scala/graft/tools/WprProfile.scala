package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.PageRank
import graft.ingest.EdgeExtraction

/** A/B profile for the round-3 q_wpagerank3 anomaly (VERDICT r3 "what's
  * wrong" #1): weighted vs unweighted 3-iteration PageRank on the sf
  * supplier x part co-occurrence graph, hash-probe kernels vs dense-index
  * kernels, build and iteration phases timed separately. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.WprProfile"
  */
object WprProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("wpr-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    for {
      weighted <- Seq(false, true)
      indexed <- Seq(true, false)
    } {
      val edges = graft.io.Iterate.pin(
        EdgeExtraction.cooccurrence(li, "l_suppkey", "l_partkey",
          maxPathFanout = 1000).toDF()).as[graft.model.Edge](
        org.apache.spark.sql.Encoders.product[graft.model.Edge])
      val t0 = System.nanoTime()
      val (ranks, iterMs) = PageRank.runTimed(edges,
        PageRank.Config(fixedIter = Some(3), weighted = weighted,
          indexedState = indexed))
      ranks.count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"WPR weighted=$weighted%-5s indexed=$indexed%-5s " +
        f"total=$total%7.2fs iters=${iterMs.map(_ / 1000.0).mkString("[", ", ", "]")} " +
        f"build=${total - iterMs.sum / 1000.0}%7.2fs")
      edges.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
