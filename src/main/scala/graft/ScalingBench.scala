package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.{Hedonic, PageRank}
import graft.graph.GraphOps
import graft.ingest.EdgeExtraction

/** Scaling-evidence bench (BASELINE.json north rule): run the SAME job —
  * co-occurrence edge extraction + hedonic to convergence + PageRank to
  * convergence — at two parallelism levels (local[N] vs local[4N], the
  * sandbox proxy for N vs 4N executors) and report supersteps/sec and
  * edges-processed/sec at each. The driver of the comparison is
  * tools/scaling.sh; this main runs ONE level, selected by SPARK_GRAFT_CPUS.
  *
  * Output: one JSON line with the throughput metrics.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Build the co-occurrence graph from the largest available fan-in:
    // lineitem (l_suppkey linked via shared l_partkey) — same shape as the
    // repo/path extraction, at the driver's data scale.
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val t0 = System.nanoTime()
    val edges = EdgeExtraction.cooccurrence(li, "l_suppkey", "l_partkey",
      maxPathFanout = 1000).persist()
    val edgeCount = edges.count()
    val tExtract = (System.nanoTime() - t0) / 1e9

    val verts = GraphOps.vertices(edges)
    val vCount = verts.count()
    val init = verts.select(col("id"), col("id").as("community"))

    // Hedonic to convergence.
    val t1 = System.nanoTime()
    val (_, metrics) = Hedonic.run(edges, init, Hedonic.Config(maxSupersteps = 30))
    val tHed = (System.nanoTime() - t1) / 1e9
    val supersteps = metrics.size
    // each superstep gathers over the symmetrized edge table (2E rows)
    val hedEdgesProcessed = 2L * edgeCount * supersteps

    // PageRank to convergence (tol loop counts iterations via rank deltas).
    val t2 = System.nanoTime()
    val pr = PageRank.run(edges, PageRank.Config(tol = 1e-9, maxIter = 50))
    pr.count()
    val tPr = (System.nanoTime() - t2) / 1e9
    // PageRank iterations aren't surfaced; use fixed 50-cap conservative
    // estimate from a second fixed-iteration timing instead:
    val t3 = System.nanoTime()
    PageRank.run(edges, PageRank.Config(fixedIter = Some(10))).count()
    val tPr10 = (System.nanoTime() - t3) / 1e9
    val prEdgesPerSec = 2.0 * edgeCount * 10 / tPr10

    val json =
      s"""{"cpus":$cpus,"sf":"$sfDir","vertices":$vCount,"edges":$edgeCount,""" +
      s""""extract_sec":${f"$tExtract%.3f"},""" +
      s""""hedonic_sec":${f"$tHed%.3f"},"hedonic_supersteps":$supersteps,""" +
      s""""hedonic_supersteps_per_sec":${f"${supersteps / tHed}%.4f"},""" +
      s""""hedonic_edges_per_sec":${f"${hedEdgesProcessed / tHed}%.1f"},""" +
      s""""pagerank_sec":${f"$tPr%.3f"},""" +
      s""""pagerank10_sec":${f"$tPr10%.3f"},""" +
      s""""pagerank_edges_per_sec":${f"$prEdgesPerSec%.1f"}}"""
    println(json)
    edges.unpersist()
    spark.stop()
  }
}
