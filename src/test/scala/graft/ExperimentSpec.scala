package graft

import org.apache.spark.sql.functions._
import graft.eval.Experiment
import graft.eval.Experiment.Params

class ExperimentSpec extends SparkSpec {

  test("grid run writes a partitioned results table; Hedonic beats Mirror on easy SBM") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp").toString + "/results"
    // networkSeed picks an instance where local moving fully recovers the
    // planted blocks (seeds 2-6 all do; seed 1 stalls in a valid 3-community
    // local equilibrium at ARI 0.74 — local moving is a heuristic and any
    // single run may stall; the schedule-independent guarantee is pinned by
    // RobustnessGroundTruthSpec, not by this recovery spot-check).
    val grid = Seq(
      Params(nCommunities = 2, communitySize = 20, pIn = 0.6, multiplier = 0.05,
        noise = 1.5, networkSeed = 2L, partitionSeed = 2L))
    val results = Experiment.runGrid(spark, grid, dir,
      methodNames = Seq("Hedonic", "OnePass", "Mirror"))
    assert(results.count() == 3)
    // partition columns survive the round-trip
    assert(results.columns.toSet.contains("p_in"))
    val acc = results.select("method", "accuracy").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // noise > 1 => singleton init (reference convention); Mirror returns it
    // unchanged => ARI ~ 0, while hedonic should recover the 2 planted
    // blocks on this easy instance.
    assert(acc("Hedonic") > 0.8, s"Hedonic ARI ${acc("Hedonic")}")
    assert(acc("Hedonic") > acc("Mirror"))
    // summaries run
    val summary = Experiment.summarize(results).collect()
    assert(summary.nonEmpty)
    assert(Experiment.heatmap(results).collect().nonEmpty)
  }

  test("appending a second grid point accumulates rows (S6/S8 sink+scan)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp2").toString + "/results"
    val p = Params(2, 15, 0.6, 0.05, 0.2, 3L, 4L)
    Experiment.runGrid(spark, Seq(p), dir, methodNames = Seq("Mirror"))
    val r2 = Experiment.runGrid(spark, Seq(p.copy(networkSeed = 5L)), dir,
      methodNames = Seq("Mirror"))
    assert(r2.count() == 2)
    assert(Experiment.readResults(spark, dir).select("network_seed")
      .distinct().count() == 2)
  }
}
