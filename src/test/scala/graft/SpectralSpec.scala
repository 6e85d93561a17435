package graft

import org.apache.spark.sql.functions._
import graft.algo.Spectral
import graft.eval.Metrics
import graft.graph.GraphOps
import graft.ingest.GraphGen

/** M9 spectral (leading-eigenvector) — reference baseline
  * `community_leading_eigenvector` (scripts/config.py:34-41). The engine
  * re-expresses it as shifted power iteration; these specs pin the method's
  * defining behaviors rather than igraph's ARPACK internals (different
  * eigen-solvers legitimately differ on degenerate spectra).
  */
class SpectralSpec extends SparkSpec {

  /** Two 5-cliques joined by a single bridge edge. */
  private def twoCliques: Seq[(Long, Long)] = {
    val a = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val b = for (i <- 5L to 9L; j <- (i + 1) to 9L) yield (i, j)
    a ++ b ++ Seq((4L, 5L))
  }

  test("bipartition recovers two bridged cliques") {
    val m = Spectral.run(edgesOf(twoCliques),
      Spectral.Config(clusters = 2, powerIters = 40))
    val groups = m.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.values.toSet.size === 2)
    assert((0L to 4L).map(groups).toSet.size === 1)
    assert((5L to 9L).map(groups).toSet.size === 1)
    assert(groups(0L) !== groups(9L))
  }

  test("a single clique never splits (no positive-gain bipartition)") {
    val k6 = for (i <- 0L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val m = Spectral.run(edgesOf(k6), Spectral.Config(clusters = 4, powerIters = 40))
    assert(m.select("community").distinct().count() === 1)
  }

  test("whole-graph leading vector separates the cliques by sign") {
    val x = Spectral.wholeGraphVector(edgesOf(twoCliques), iters = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sA = (0L to 4L).map(i => math.signum(x(i))).toSet
    val sB = (5L to 9L).map(i => math.signum(x(i))).toSet
    assert(sA.size === 1 && sB.size === 1 && sA != sB)
  }

  test("community budget caps the split count") {
    // 3 planted blocks but clusters=2: exactly one split is allowed.
    val e = GraphGen.sbm(spark, 3, 12, 0.9, 0.02, 7L)
    val m = Spectral.run(e, Spectral.Config(clusters = 2, powerIters = 60))
    assert(m.select("community").distinct().count() <= 2)
  }

  test("recovers a strong 3-block planted partition (ARI vs ground truth)") {
    // seed 5 recovers exactly under the portable-md5 draw family (seed 3's
    // instance leaves one ambiguous vertex: ARI 0.93).
    val e = GraphGen.sbm(spark, 3, 15, 0.9, 0.02, 5L)
    val gt = GraphGen.groundTruth(spark, 3, 15)
    val m = Spectral.run(e, Spectral.Config(clusters = 3, powerIters = 40))
    assert(m.select("community").distinct().count() === 3)
    val ari = Metrics.adjustedRandIndex(m, gt)
    assert(ari > 0.95, s"ARI $ari")
  }

  test("deterministic: identical labels across runs") {
    val e = edgesOf(twoCliques)
    val cfg = Spectral.Config(clusters = 2, powerIters = 40)
    val a = Spectral.run(e, cfg).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Spectral.run(e, cfg).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("labels are min-id canonical (permutation-stable)") {
    val m = Spectral.run(edgesOf(twoCliques),
      Spectral.Config(clusters = 2, powerIters = 40))
    val groups = m.collect().groupBy(_.getLong(1))
    groups.foreach { case (label, rows) =>
      assert(label === rows.map(_.getLong(0)).min)
    }
  }
}
