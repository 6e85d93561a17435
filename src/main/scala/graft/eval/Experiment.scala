package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Edge
import graft.algo.{Hedonic, HedonicFrontier, LabelPropagation, Leiden, Spectral}
import graft.ingest.GraphGen

/** Experiment driver — the reference's top-level entry point
  * (scripts/experiment.py:51-104 run_experiment + the method registry in
  * scripts/config.py:15-85), as a Spark driver loop: for each point of the
  * parameter grid, generate the planted SBM graph + noisy initial
  * partition, run each method, score it (ARI accuracy like
  * experiment.py:33-35, robustness, duration), and append one row per run
  * to a results table written as parquet partitioned by the grid keys
  * (partition columns replace the reference's path-encoded parameters,
  * scripts/experiment.py:97-103).
  */
object Experiment {

  /** One grid point (reference CLI args, experiment.py:111-129). */
  final case class Params(
      nCommunities: Int,
      communitySize: Int,
      pIn: Double,
      multiplier: Double, // pOut = pIn * multiplier (utils.py:169-171)
      noise: Double,
      networkSeed: Long,
      partitionSeed: Long)

  /** Result record (experiment.py:36-48 + ari/ari.py:50). */
  final case class RunResult(
      method: String,
      number_of_communities: Int,
      community_size: Int,
      p_in: Double,
      p_out: Double,
      multiplier: Double,
      resolution: Double,
      duration: Double,
      accuracy: Double,
      robustness: Double,
      noise: Double,
      network_seed: Long,
      partition_seed: Long)

  /** Method registry (config.py:15-85). Each returns a final membership.
    * `spectralK`: the grid's number_of_communities, passed straight through
    * like the reference's `clusters=` argument (scripts/exp.py:71-72) — the
    * fallback recount from `init` runs a Spark job inside the timed region
    * and can lose a label at high noise. */
  def methods(maxSupersteps: Int = 60, spectralK: Option[Int] = None)
      : Map[String, (Dataset[Edge], DataFrame) => DataFrame] = Map(
    "Hedonic" -> ((e, init) =>
      Hedonic.run(e, init, Hedonic.Config(maxSupersteps = maxSupersteps))._1),
    "HedonicQueue" -> ((e, init) =>
      HedonicFrontier.run(e, init, Hedonic.Config(maxSupersteps = maxSupersteps))._1),
    "Leiden" -> ((e, init) =>
      Leiden.run(e, init, levels = 2,
        hedonicCfg = Hedonic.Config(maxSupersteps = maxSupersteps))),
    "OnePass" -> ((e, init) => { // M3: exactly one LPA step
      val sym = graft.graph.GraphOps.symmetrize(e).select("src", "dst")
      LabelPropagation.step(sym, init.select(col("id"), col("community").as("label")))
        .select(col("id"), col("bestLabel").as("community"))
    }),
    "OnePassHedonic" -> ((e, init) => { // M4: one max-friends pass (alpha=0)
      val sym = graft.graph.GraphOps.symmetrize(e).select("src", "dst")
      Hedonic.onePass(sym, init)
    }),
    "LabelProp" -> ((e, init) =>
      LabelPropagation.run(e,
          Some(init.select(col("id"), col("community").as("label"))))
        .select(col("id"), col("label").as("community"))),
    "Spectral" -> ((e, init) => { // M9: leading-eigenvector, k from the grid
      val k = spectralK.getOrElse(
        init.select("community").distinct().count().toInt).max(2)
      Spectral.run(e, Spectral.Config(clusters = k))
    }),
    "Mirror" -> ((e, init) => init), // M6-style identity baseline
    "Singleton" -> ((e, _) => // M5 constant/trivial baseline
      graft.graph.GraphOps.vertices(e).select(col("id"), col("id").as("community"))))

  /** Run one grid point for every method; returns one RunResult per method. */
  def runPoint(spark: SparkSession, p: Params,
               methodNames: Seq[String] = Seq("Hedonic", "LabelProp", "Mirror"))
      : Seq[RunResult] = {
    val pOut = p.pIn * p.multiplier
    val edges = GraphGen.sbm(spark, p.nCommunities, p.communitySize,
      p.pIn, pOut, p.networkSeed).cache()
    edges.count()
    val gt = GraphGen.groundTruth(spark, p.nCommunities, p.communitySize)
    // restrict to edge-derived vertex set (isolated vertices drop, P2)
    val verts = graft.graph.GraphOps.vertices(edges)
    val gtOnGraph = gt.join(verts, Seq("id"), "left_semi").cache()
    val init = GraphGen.noisyPartition(gtOnGraph, p.nCommunities, p.noise, p.partitionSeed)
    val alpha = graft.graph.GraphOps.density(edges)
    val reg = methods(spectralK = Some(p.nCommunities))
    val out = methodNames.map { name =>
      val t0 = System.nanoTime()
      val members = reg(name)(edges, init)
      val n = members.count() // force
      val duration = (System.nanoTime() - t0) / 1e9
      require(n > 0)
      val acc = Metrics.adjustedRandIndex(members, gtOnGraph)
      val rob = Metrics.robustness(edges, members)
      RunResult(name, p.nCommunities, p.communitySize, p.pIn, pOut,
        p.multiplier, alpha, duration, acc, rob, p.noise,
        p.networkSeed, p.partitionSeed)
    }
    edges.unpersist(); gtOnGraph.unpersist()
    out
  }

  /** Deterministic key for one grid point — the S9 memoization key. */
  private def pointKey(p: Params, methodNames: Seq[String]): String = {
    val raw = s"${p.nCommunities}|${p.communitySize}|${p.pIn}|${p.multiplier}|" +
      s"${p.noise}|${p.networkSeed}|${p.partitionSeed}|${methodNames.mkString(",")}"
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(raw.getBytes("UTF-8")).take(12).map("%02x".format(_)).mkString
  }

  /** Run a grid and append results to a parquet table partitioned by the
    * grid keys (the engine's S6/S7 sink: partition columns instead of the
    * reference's parameter-encoding directory names + regex re-parse).
    *
    * Work-skipping (S9, the reference's `.completed` markers,
    * scripts/exp.py:120-122): each finished grid point drops a params-keyed
    * marker under `outDir/_completed/`; re-running the same grid skips
    * marked points instead of recomputing + double-appending them. */
  def runGrid(spark: SparkSession, grid: Seq[Params], outDir: String,
              methodNames: Seq[String] = Seq("Hedonic", "LabelProp", "Mirror")): DataFrame = {
    import spark.implicits._
    val markerDir = java.nio.file.Paths.get(outDir, "_completed")
    java.nio.file.Files.createDirectories(markerDir)
    grid.foreach { p =>
      val marker = markerDir.resolve(pointKey(p, methodNames))
      if (!java.nio.file.Files.exists(marker)) {
        val results = runPoint(spark, p, methodNames)
        results.toDS().toDF().write.mode("append")
          .partitionBy("number_of_communities", "p_in", "noise")
          .parquet(outDir)
        java.nio.file.Files.writeString(marker, graft.io.Checkpoint.json(Map(
          "network_seed" -> p.networkSeed, "partition_seed" -> p.partitionSeed,
          "p_in" -> p.pIn, "noise" -> p.noise)))
      }
    }
    spark.read.parquet(outDir)
  }

  /** S8: read the combined results table back (partition columns restore
    * the grid keys that the reference re-parsed from paths via regex,
    * scripts/data_reader.py:183-252). */
  def readResults(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** A14: mean ± 95% CI per (noise, method) — plot_figures.py:224-234. */
  def summarize(results: DataFrame): DataFrame =
    results.groupBy("noise", "method").agg(
      avg("accuracy").as("mean_accuracy"),
      (lit(1.96) * stddev("accuracy") / sqrt(count(lit(1)))).as("ci95_accuracy"),
      avg("robustness").as("mean_robustness"),
      avg("duration").as("mean_duration"),
      count(lit(1)).as("n_runs"))

  /** A15: robustness heatmap pivot — plot_figures.py:127-131. */
  def heatmap(results: DataFrame): DataFrame =
    results.groupBy("p_in").pivot("multiplier").avg("robustness")
}
