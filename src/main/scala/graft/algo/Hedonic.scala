package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{Edge, RunMetrics}
import graft.graph.GraphOps
import graft.io.Checkpoint

/** Hedonic-game community detection — the reference's core
  * (`community_hedonic_traversal`, hedonic/__init__.py:214-228), distributed
  * as synchronous supersteps: gather -> payoff -> argmax -> apply.
  *
  * Semantics preserved from the reference:
  *  - payoff(node, community C) = friends*(1-alpha) - strangers*alpha, where
  *    friends = neighbors of node inside C, strangers = |C| - friends, minus
  *    1 more when C is node's own community (self excluded,
  *    hedonic/__init__.py:39-42,345).
  *  - candidate communities = {current} U {communities holding >=1 neighbor}
  *    (hedonic/__init__.py:81) — "no new clusters" holds for free because
  *    move targets only come from the gather.
  *  - a node moves only on STRICT improvement (hedonic/__init__.py:84).
  *  - default alpha = graph density (hedonic/__init__.py:78,215).
  *
  * Documented divergence (SURVEY.md §7.4.1-2): the reference sweeps vertices
  * asynchronously in index order; a distributed engine moves in rounds, so it
  * may reach a *different, equally valid* equilibrium. Tie-breaks are
  * canonicalized (current community wins payoff ties, then smallest label)
  * instead of Python dict order. Correctness oracle = the schedule-independent
  * equilibrium post-condition (every vertex's current community is payoff-
  * maximal at convergence), not label-for-label parity with the sweep.
  *
  * Oscillation control: hedonic games are potential games under unilateral
  * moves, but simultaneous moves can cycle. Each superstep only nodes with
  * xxhash64(id, superstep) % 2 == 0 may move — a DIFFERENT deterministic
  * half each round, so any two nodes locked in a simultaneous-swap cycle are
  * eventually separated and the survivor's move is unilateral = strictly
  * potential-increasing (fixed id-parity classes were observed to oscillate
  * forever on multi-label inits: the same adjacent pair stays co-gated every
  * round). Convergence is declared when a full superstep finds ZERO nodes
  * wanting to move (checked before gating, so it is gate-independent).
  */
object Hedonic {

  final case class Config(
      alpha: Option[Double] = None, // None => graph density
      maxSupersteps: Int = 200,
      parityGating: Boolean = true,
      checkpointEvery: Int = 8,
      checkpointDir: Option[String] = None,
      trackPotential: Boolean = false)

  /** friends per (id, candidate community): one equi-join of the symmetrized
    * edges with membership on the neighbor endpoint, then a hash aggregate
    * (partial+final map-side combine for free). The current community is
    * union'd in with 0 friends so every node always has its own row
    * (reference pre-initializes it, hedonic/__init__.py:58-59,342-343). */
  def gather(sym: DataFrame, members: DataFrame): DataFrame = {
    val nbrComm = members.select(col("id").as("dst"), col("community"))
    val friendRows = sym.select("src", "dst")
      .join(nbrComm, Seq("dst"))
      .select(col("src").as("id"), col("community"), lit(1L).as("friends"))
    friendRows
      .unionByName(members.select(col("id"), col("community"), lit(0L).as("friends")))
      .groupBy("id", "community").agg(sum("friends").as("friends"))
  }

  /** Full candidate table with strangers + payoff columns.
    * Community sizes are broadcast (C << V). */
  def payoffs(sym: DataFrame, members: DataFrame, alpha: Double): DataFrame = {
    val sizes = members.groupBy("community").agg(count(lit(1)).as("csize"))
    val cur = members.select(col("id"), col("community").as("curComm"))
    gather(sym, members)
      .join(broadcast(sizes), Seq("community"))
      .join(cur, Seq("id"))
      .withColumn("isCur", col("community") === col("curComm"))
      .withColumn("strangers",
        col("csize") - col("friends") - when(col("isCur"), 1L).otherwise(0L))
      .withColumn("payoff",
        col("friends") * (1.0 - alpha) - col("strangers") * alpha)
  }

  /** One synchronous superstep. Returns (newMembers, wantedToMove, moved).
    * `gate` restricts which improving nodes actually move this round.
    *
    * `materialize` controls how the new state is pinned. Default:
    * Iterate.pin — eager localCheckpoint (cache + RDD-lineage cut) PLUS a
    * stats barrier. Do not substitute a lazy variant (plans grow ~3^k and
    * OOM) or a bare localCheckpoint (origin-stats preservation makes
    * sizeInBytes estimates grow ~3^k into million-digit BigInts that pin
    * the driver — see graft.io.Iterate). */
  def step(
      sym: DataFrame,
      members: DataFrame,
      alpha: Double,
      gate: org.apache.spark.sql.Column,
      materialize: DataFrame => DataFrame = graft.io.Iterate.pin): (DataFrame, Long, Long) = {
    val p = payoffs(sym, members, alpha)
    // argmax with canonical tie-break: highest payoff, then current community,
    // then smallest label. struct max orders lexicographically.
    val best = p.groupBy("id").agg(
      max(struct(
        col("payoff"),
        col("isCur").cast("int").as("ic"),
        (-col("community")).as("negc"),
        col("community").as("comm"))).as("b"),
      max(when(col("isCur"), col("payoff"))).as("curPayoff"),
      first(col("curComm")).as("curComm"))
    val decided = best.select(
      col("id"),
      col("curComm"),
      (col("b.payoff") > col("curPayoff")).as("wants"),
      col("b.comm").as("bestComm"))
    val applied0 = decided
      .withColumn("doMove", col("wants") && gate)
      .select(
        col("id"),
        when(col("doMove"), col("bestComm")).otherwise(col("curComm")).as("community"),
        col("wants"),
        col("doMove"))
    val applied = materialize(applied0)
    val agg = applied.agg(
      sum(col("wants").cast("long")).as("w"),
      sum(col("doMove").cast("long")).as("m")).collect()(0)
    val wanted = if (agg.isNullAt(0)) 0L else agg.getLong(0)
    val moved = if (agg.isNullAt(1)) 0L else agg.getLong(1)
    val next = applied.select("id", "community")
    (next, wanted, moved)
  }

  /** Global potential: sum over communities of
    * e_in*(1-a) - (C(n,2) - e_in)*a (intended semantics of
    * hedonic/__init__.py:164-173; the reference's own body is dormant-buggy —
    * `total_possible_edges` undefined — see SURVEY.md §7.5). */
  def potential(edges: Dataset[Edge], members: DataFrame, alpha: Double): Double = {
    val m1 = members.select(col("id").as("src"), col("community").as("c1"))
    val m2 = members.select(col("id").as("dst"), col("community").as("c2"))
    val eIn = edges.toDF().join(m1, Seq("src")).join(m2, Seq("dst"))
      .filter(col("c1") === col("c2"))
      .groupBy(col("c1").as("community")).agg(count(lit(1)).as("ein"))
    val sizes = members.groupBy("community").agg(count(lit(1)).as("n"))
    val row = sizes.join(eIn, Seq("community"), "left")
      .select(sum(
        coalesce(col("ein"), lit(0L)) * (1.0 - alpha)
          - (col("n") * (col("n") - 1) / 2 - coalesce(col("ein"), lit(0L))) * alpha))
      .collect()(0)
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** Run to equilibrium. Returns (final members, per-superstep metrics). */
  def run(
      edges: Dataset[Edge],
      init: DataFrame,
      cfg: Config = Config()): (DataFrame, Seq[RunMetrics]) = {
    val spark = edges.sparkSession
    val a = cfg.alpha.getOrElse(GraphOps.density(edges))
    val sym = GraphOps.symmetrize(edges).select("src", "dst").persist()
    val edgeCount = sym.count() // also materializes the persist
    val ckpt = cfg.checkpointDir.map(d => new Checkpoint(spark, d, cfg.checkpointEvery))

    // Resume from the latest durable snapshot when a checkpoint dir is reused.
    val (startStep, startMembers) = ckpt.flatMap(_.latest()) match {
      case Some((k, df)) => (k + 1, df)
      case None          => (0, init.select("id", "community"))
    }

    var members = startMembers
    var metrics = Vector.empty[RunMetrics]
    var superstep = startStep
    var converged = false
    while (!converged && superstep < cfg.maxSupersteps) {
      val t0 = System.nanoTime()
      val gate =
        if (cfg.parityGating) pmod(xxhash64(col("id"), lit(superstep)), lit(2)) === lit(0)
        else lit(true)
      // Eager localCheckpoint EVERY superstep: `members` is referenced three
      // times per round (gather + sizes + current-community join), so any
      // lazy/deferred truncation lets the logical plan grow ~3^k between
      // cuts — observed as an OOM in TreeNode.treeString. One extra tiny
      // job per superstep is the right trade at every scale.
      val cut = superstep % cfg.checkpointEvery == 0
      val (next, wanted, moved) = step(sym, members, a, gate)
      val pot = if (cfg.trackPotential) potential(edges, next, a) else Double.NaN
      val wallMs = (System.nanoTime() - t0) / 1000000
      val m = RunMetrics(superstep, moved, pot, wanted, edgeCount, wallMs)
      metrics :+= m
      val metricsJson =
        s"""{"moved":$moved,"wanted":$wanted,"potential":${if (pot.isNaN) "null" else pot},"wallMs":$wallMs}"""
      members = ckpt match {
        case Some(c) if cut => c.truncate(next, superstep, metricsJson)
        case _              => next
      }
      converged = wanted == 0L
      superstep += 1
    }
    sym.unpersist()
    (members, metrics)
  }

  /** Equilibrium post-condition (reference in_equilibrium,
    * hedonic/__init__.py:89-94): fraction of nodes whose current payoff is
    * within numpy-isclose tolerance of their max candidate payoff
    * (rtol 1e-5, atol 1e-8 — hedonic/__init__.py:646). */
  def equilibriumFraction(edges: Dataset[Edge], members: DataFrame, alpha: Double): Double = {
    val sym = GraphOps.symmetrize(edges)
    val p = payoffs(sym, members, alpha)
    val perNode = p.groupBy("id").agg(
      max(col("payoff")).as("maxP"),
      max(when(col("isCur"), col("payoff"))).as("curP"))
    val row = perNode.select(
      avg((abs(col("curP") - col("maxP")) <=
        lit(1e-8) + lit(1e-5) * abs(col("maxP"))).cast("double")))
      .collect()(0)
    if (row.isNullAt(0)) 1.0 else row.getDouble(0)
  }
}
