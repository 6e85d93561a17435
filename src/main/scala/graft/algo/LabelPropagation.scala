package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Edge
import graft.graph.GraphOps
import graft.io.Iterate

/** Label propagation — north-rule addition N3. One synchronous step IS the
  * reference's `community_onepass_improvement` (hedonic/__init__.py:266-280,
  * operator M3/A18): each node adopts the majority label among its
  * neighbors; iterated to convergence here.
  *
  * Tie-break: the reference's is Python-set iteration order (unspecified,
  * hedonic/__init__.py:273); the engine canonicalizes to highest count, then
  * SMALLEST label — deterministic (documented divergence, SURVEY.md §7.4.2).
  *
  * Oscillation: synchronous LPA two-colors bipartite-ish graphs. Standard
  * fix applied: hash-parity gating — only nodes passing the portable md5
  * parity gate (graft.util.Portable.parityGate; DuckDB-replicable, so
  * q_lpa_full is oracled end to end) may change each round. Convergence = a
  * superstep where no node (gated or not) would change.
  *
  * Cost model: ONE job per iteration — the new labels are pinned while the
  * would-change counter rides the materialization pass as an accumulator
  * (Iterate.pinSums); the previous round's cache is released immediately.
  */
object LabelPropagation {

  /** One synchronous step from `labels(id, label)`; returns new labels with
    * a `wants` column (true when the majority label differs from current).
    * `weighted = true` weighs each neighbor vote by edge weight (`sym` must
    * carry a `weight` column). `bcastState = true` broadcasts the V-row
    * label side into the gather — with `sym` cached pre-partitioned on src
    * (the grouping key) the whole step then runs exchange-free on the
    * cached layout (see Hedonic.stepPinnedB for the strategy rationale). */
  def step(sym: DataFrame, labels: DataFrame, weighted: Boolean = false,
           bcastState: Boolean = false): DataFrame = {
    val labSide = labels.select(col("id").as("dst"), col("label").as("nbrLabel"))
    val nbrLabels = sym.join(
      if (bcastState) broadcast(labSide) else labSide, Seq("dst"))
    val vote = if (weighted) sum(col("weight").cast("double")) else count(lit(1)).cast("double")
    val counts = nbrLabels.groupBy(col("src").as("id"), col("nbrLabel"))
      .agg(vote.as("cnt"))
    val best = counts.groupBy("id").agg(
      max(struct(col("cnt"), (-col("nbrLabel")).as("neg"), col("nbrLabel").as("lab"))).as("b"))
    labels.join(if (bcastState) broadcast(best) else best, Seq("id"), "left")
      .select(col("id"), col("label"),
        coalesce(col("b.lab"), col("label")).as("bestLabel"))
      .withColumn("wants", col("bestLabel") =!= col("label"))
  }

  def run(edges: Dataset[Edge], initOpt: Option[DataFrame] = None,
          maxIter: Int = 30, parityGating: Boolean = true,
          weighted: Boolean = false,
          broadcastStateMaxRows: Long = 4000000L): DataFrame = {
    val init = initOpt
      .map(_.select(col("id"), col("label")))
      .getOrElse(GraphOps.vertices(edges).select(col("id"), col("id").as("label")))
    val bcast = init.count() <= broadcastStateMaxRows
    // Cached pre-partitioned on src (the grouping key) when the state is
    // broadcast — each iteration is then exchange-free on the cached
    // layout — or dst (the join key) on the shuffle path, where only the
    // V-row label side re-exchanges per round.
    val sym = GraphOps.pinnedSym(edges, if (bcast) "src" else "dst", weighted,
      sorted = !bcast)
    var labels = Iterate.pin(init)
    var prevPin: Option[Iterate.Pinned] = None
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val stepped = step(sym, labels, weighted, bcastState = bcast)
      val gate =
        if (parityGating) graft.util.Portable.parityGate(col("id"), iter)
        else lit(true)
      val next = stepped
        .select(col("id"),
          when(col("wants") && gate, col("bestLabel")).otherwise(col("label")).as("label"),
          col("wants"))
      val pinned = Iterate.pinSums(next, Seq("wants"))
      done = pinned.sums(0) == 0.0
      labels = pinned.df.select("id", "label")
      prevPin.foreach(_.release())
      prevPin = Some(pinned)
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
