package graft

import graft.algo.Hedonic
import graft.graph.GraphOps

/** Closed-form toy equilibria (FIXTURES.md §3; reference
  * scripts/plot/paper_plots/toy_example.py). The reference script only
  * DRAWS these figures — it computes nothing and its node colors are
  * decorative — so the intervals asserted here are derived by hand from the
  * engine's (= reference Game's) payoff semantics:
  *   payoff(v, C) = friends*(1-a) - strangers*a, strangers exclude self,
  *   candidates = {current} ∪ neighbor communities (no new clusters).
  *
  * Worked example (T-graph, partition {1,2,3},{4},{5,6}): the binding node
  * is 4 (singleton, neighbors 2 and 5): joining {1,2,3} pays 1-3a, joining
  * {5,6} pays 1-2a, staying pays 0 — so it stays iff 1-2a <= 0, i.e. the
  * partition is an equilibrium exactly on [1/2, 1] (tie at a=1/2 keeps the
  * current community).
  */
class ToyFixtureSpec extends SparkSpec {

  private val tGraph = Seq((1L, 2L), (2L, 3L), (2L, 4L), (4L, 5L), (5L, 6L))
  private val path5 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
  private val cycle8 = (1L to 8L).map(i => (i, if (i == 8) 1L else i + 1))

  private def eqFrac(edges: Seq[(Long, Long)], parts: Map[Long, Long], a: Double): Double =
    Hedonic.equilibriumFraction(edgesOf(edges), membersOf(parts.toSeq), a)

  test("T-graph: bar {1,2,3} / arm {4,5,6} is an equilibrium on all of [0,1]") {
    val p = Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 1L)
    for (a <- Seq(0.0, 0.25, 0.5, 0.75, 1.0))
      assert(eqFrac(tGraph, p, a) == 1.0, s"alpha=$a")
  }

  test("T-graph: {1,2,3},{4},{5,6} is an equilibrium exactly for alpha >= 1/2") {
    val p = Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L, 6L -> 2L)
    assert(eqFrac(tGraph, p, 0.6) == 1.0)
    assert(eqFrac(tGraph, p, 0.5) == 1.0) // tie: current community wins
    assert(eqFrac(tGraph, p, 0.4) < 1.0) // node 4 defects to {5,6}
    assert(eqFrac(tGraph, p, 0.2) < 1.0)
  }

  test("T-graph: alternating 2-coloring is NOT an equilibrium under Game payoffs") {
    // (The figure's color pattern; under the executable payoff semantics
    // node 5 always gains by joining {2,4,6} — documented divergence from
    // the paper-figure caption, which uses a non-executable notion.)
    val p = Map(1L -> 0L, 3L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 6L -> 1L)
    for (a <- Seq(0.0, 0.5, 1.0)) assert(eqFrac(tGraph, p, a) < 1.0, s"alpha=$a")
  }

  test("5-path: {1,2,3} / {4,5} is an equilibrium on all of [0,1]") {
    val p = Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L)
    for (a <- Seq(0.0, 0.25, 0.5, 0.75, 1.0))
      assert(eqFrac(path5, p, a) == 1.0, s"alpha=$a")
  }

  test("5-path: one whole-graph community is an equilibrium (no-new-clusters semantics)") {
    // Leaving to a fresh singleton is NOT a candidate move
    // (can_create_new_clusters=False, reference config.py:67; P4), so the
    // grand coalition is stable at every alpha even though a singleton
    // deviation would pay at small alpha.
    val p = (1L to 5L).map(_ -> 0L).toMap
    for (a <- Seq(0.0, 0.5, 1.0)) assert(eqFrac(path5, p, a) == 1.0, s"alpha=$a")
  }

  test("8-cycle: adjacent pairs are an equilibrium; alternating 2-coloring is not") {
    val pairs = (1L to 8L).map(i => i -> ((i - 1) / 2)).toMap
    for (a <- Seq(0.0, 0.5, 1.0)) assert(eqFrac(cycle8, pairs, a) == 1.0, s"alpha=$a")
    val alt = (1L to 8L).map(i => i -> (i % 2)).toMap
    for (a <- Seq(0.0, 0.5, 1.0)) assert(eqFrac(cycle8, alt, a) < 1.0, s"alpha=$a")
  }
}
