package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{Edge, RunMetrics}
import graft.graph.GraphOps

/** Frontier-based hedonic executor — the reference's queue variant
  * (`community_hedonic_queue`, hedonic/__init__.py:230-259; note the
  * reference's own body is dead on stock igraph via the `in_equibrium` typo
  * at :234 — semantics taken from `in_equilibrium` at :89, SURVEY.md §7.5).
  *
  * Work per superstep is proportional to the ACTIVE frontier, not V: the
  * gather join is restricted by a semi-join on the active set, and the new
  * frontier = movers' neighbors outside the mover's new community (the
  * reference re-enqueues exactly those, :247-252) plus the movers
  * themselves. On graphs where convergence is local (most of a 100 TB
  * graph settles in a few rounds) this is the superstep cost model that
  * survives the scale-up.
  *
  * Community sizes remain global (C << V, one cheap aggregate per round).
  * Gating/tie-breaks are identical to the synchronous executor. Like the
  * reference queue, reactivation is NEIGHBOR-based: a non-neighbor member of
  * a shrunk/grown community is not re-enqueued even though its stranger
  * count shifted — the documented approximation both implementations share
  * (reference :247-252 re-enqueues neighbors only). The synchronous executor
  * is the exact-fixpoint path; tests cross-check the two.
  */
object HedonicFrontier {

  def run(edges: Dataset[Edge], init: DataFrame,
          cfg: Hedonic.Config = Hedonic.Config()): (DataFrame, Seq[RunMetrics]) = {
    val a = cfg.alpha.getOrElse(GraphOps.density(edges))
    // cached pre-partitioned on src: the per-superstep frontier semi-join
    // (on src) reuses the cached layout; only the frontier side shuffles,
    // and the dst-side gather join then exchanges just the ACTIVE slice.
    val sym = GraphOps.pinnedSym(edges, "src")
    val edgeCount = sym.count()

    // Three ONE-JOB pins per superstep (was five jobs: the mover count and
    // frontier count each ran their own scalar-aggregate job; they now ride
    // the pinning pass as accumulators — Iterate.pinSums), and each round
    // releases the previous round's caches once the new state is
    // materialized (the block manager holds O(1) state copies, not
    // O(supersteps)).
    import graft.io.Iterate
    var membersPin = Iterate.pinSums(init.select("id", "community"), Nil)
    var members = membersPin.df
    var frontierPin = Iterate.pinSums(
      members.select("id").withColumn("act", lit(true)), Seq("act")) // all active at start
    var frontier = frontierPin.df
    var metrics = Vector.empty[RunMetrics]
    var superstep = 0
    var frontierSize = frontierPin.sums(0).toLong

    while (frontierSize > 0 && superstep < cfg.maxSupersteps) {
      val t0 = System.nanoTime()
      // gather restricted to active nodes: only their candidate payoffs.
      val activeSym = sym.join(frontier.select(col("id").as("src")), Seq("src"), "left_semi")
      val nbrComm = members.select(col("id").as("dst"), col("community"))
      val friendRows = activeSym.join(nbrComm, Seq("dst"))
        .select(col("src").as("id"), col("community"), lit(1L).as("friends"))
      val ownRows = members.join(frontier, Seq("id"), "left_semi")
        .select(col("id"), col("community"), lit(0L).as("friends"))
      val gathered = friendRows.unionByName(ownRows)
        .groupBy("id", "community").agg(sum("friends").as("friends"))
      val sizes = members.groupBy("community").agg(count(lit(1)).as("csize"))
      val cur = members.select(col("id"), col("community").as("curComm"))
      val p = gathered
        .join(broadcast(sizes), Seq("community"))
        .join(cur, Seq("id"))
        .withColumn("isCur", col("community") === col("curComm"))
        .withColumn("strangers",
          col("csize") - col("friends") - when(col("isCur"), 1L).otherwise(0L))
        .withColumn("payoff",
          col("friends") * (1.0 - a) - col("strangers") * a)
      val gate =
        if (cfg.parityGating) graft.util.Portable.parityGate(col("id"), superstep)
        else lit(true)
      // ONE materialization of the whole gather->argmax chain per superstep;
      // movers / gated stragglers / membership update / new frontier all
      // derive from this cached table instead of recomputing the chain.
      // The mover count rides the pin as an accumulator (isMover sum).
      val decidedPin = Iterate.pinSums(
        p.groupBy("id").agg(
            max(struct(col("payoff"), col("isCur").cast("int").as("ic"),
              (-col("community")).as("negc"), col("community").as("comm"))).as("b"),
            max(when(col("isCur"), col("payoff"))).as("curPayoff"))
          .select(col("id"), col("b.comm").as("newComm"),
            (col("b.payoff") > col("curPayoff")).as("wants"), gate.as("gated"))
          .withColumn("isMover", col("wants") && col("gated")),
        Seq("isMover"))
      val decided = decidedPin.df
      val movers = decided.filter(col("wants") && col("gated"))
        .select(col("id"), col("newComm"))
      val nMoved = decidedPin.sums(0).toLong
      // stragglers that wanted to move but were gated stay active
      val gatedWanters = decided.filter(col("wants") && !col("gated")).select("id")

      val newMembersPin = Iterate.pinSums(
        members.join(movers, Seq("id"), "left")
          .select(col("id"), coalesce(col("newComm"), col("community")).as("community")),
        Nil)
      members = newMembersPin.df

      // new frontier: movers' neighbors not in the mover's NEW community,
      // plus movers themselves (their own optimum may shift), plus gated
      // wanters. Its count rides the pin.
      val nbrOfMovers = sym
        .join(movers.select(col("id").as("src"), col("newComm")), Seq("src"))
        .join(members.select(col("id").as("dst"), col("community").as("nbrComm")), Seq("dst"))
        .filter(col("nbrComm") =!= col("newComm"))
        .select(col("dst").as("id"))
      val newFrontierPin = Iterate.pinSums(
        nbrOfMovers
          .unionByName(movers.select("id"))
          .unionByName(gatedWanters)
          .distinct()
          .withColumn("act", lit(true)),
        Seq("act"))
      frontier = newFrontierPin.df
      frontierSize = newFrontierPin.sums(0).toLong
      // everything downstream is materialized; the previous round's caches
      // (and this round's decided scratch) are dead
      membersPin.release(); frontierPin.release(); decidedPin.release()
      membersPin = newMembersPin; frontierPin = newFrontierPin
      val wallMs = (System.nanoTime() - t0) / 1000000
      metrics :+= RunMetrics(superstep, nMoved, Double.NaN, frontierSize, edgeCount, wallMs)
      superstep += 1
    }
    sym.unpersist()
    frontierPin.release() // final members stay pinned for the caller
    (members, metrics)
  }
}
