package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Edge
import graft.graph.GraphOps
import graft.io.Iterate

/** PageRank over the (undirected, symmetrized) co-occurrence graph —
  * north-rule addition N1 (SURVEY.md §2.9); no direct reference
  * implementation exists, so semantics follow the standard formulation:
  *
  *   r'(v) = (1-d)/V + d * ( sum_{u->v} r(u)/outdeg(u) + danglingMass/V )
  *
  * Ranks sum to 1 at every iteration. On a symmetrized graph whose vertex
  * set is edge-derived there are no dangling vertices, so the per-iteration
  * dangling-mass job is SKIPPED entirely in that case (it is pure fixed
  * driver cost in exactly the loop where scaling efficiency is measured);
  * it runs only when a caller passes an explicit vertex table, which may
  * contain isolated vertices.
  *
  * `weighted = true` splits rank proportionally to edge weight
  * (contribution = r(u) * w(u,v) / strength(u), strength = sum of incident
  * weights) — the natural semantics for the engine's weighted co-occurrence
  * graph.
  *
  * Scale shape per iteration — two physical strategies, chosen by state
  * size (the same decision Spark itself makes between broadcast-hash and
  * sort-merge joins):
  *
  *  - broadcast-state (V <= broadcastStateMaxRows, no explicit vertex
  *    table): the edge table is cached pre-partitioned on dst — the
  *    GROUPING key — and the V-row rank state is broadcast into the
  *    contribution join. The join is map-side, and the groupBy(dst) is
  *    satisfied by the cached partitioning, so an iteration moves ZERO
  *    edge-scale rows through the shuffle: it is a pure scan of the cached
  *    adjacency + in-place hash aggregate. This is what makes per-iteration
  *    cost scale with cores (the N->4N efficiency target): the E-row
  *    exchange that saturates single-host shuffle bandwidth is gone.
  *  - co-partitioned shuffle (large V): edges cached partitioned on src
  *    (the join key); only the V-row state shuffles into the join, and the
  *    E-row contribution aggregate exchanges on dst. This is the 1e9-vertex
  *    path where broadcasting the state would be worse than the shuffle
  *    (replicating V rows to every executor).
  *
  * Either way, ONE materializing job pins the new state and (in tol mode)
  * accumulates sum|delta| in the same pass — no separate convergence job.
  * The edge table is persisted once across all iterations; the previous
  * iteration's cache is released as soon as the new one is live.
  */
object PageRank {

  final case class Config(
      damping: Double = 0.85,
      tol: Double = 1e-9, // on sum(|delta|); comfortably below 1e-6 fixture parity
      maxIter: Int = 100,
      fixedIter: Option[Int] = None, // exactly-n iterations (oracle parity mode)
      weighted: Boolean = false,
      // Max state rows to run the broadcast-state strategy. ~24 B/row:
      // the default ~100 MB broadcast trades against an E-row shuffle per
      // iteration; 0 forces the co-partitioned shuffle path (tests use
      // this to pin both strategies to the same fixtures).
      broadcastStateMaxRows: Long = 4000000L)

  def run(edges: Dataset[Edge], cfg: Config = Config(),
          verticesOpt: Option[DataFrame] = None): DataFrame = {
    val verts = verticesOpt.getOrElse(GraphOps.vertices(edges)).select("id").persist()
    val v = verts.count().toDouble
    // Explicit vertex tables may contain dangling vertices, whose left-join
    // handling needs the co-partitioned path; broadcast-state covers the
    // engine's common case (edge-derived vertex set, min degree 1).
    val bcast = verticesOpt.isEmpty && v <= cfg.broadcastStateMaxRows
    // Cached pre-partitioned on the per-iteration NON-broadcast key: the
    // grouping key (dst) when the state is broadcast — the aggregate then
    // reuses the cached layout and the iteration is exchange-free — or the
    // join key (src) on the shuffle path, where only ranks re-exchange.
    val sym = GraphOps.pinnedSym(edges, if (bcast) "dst" else "src", cfg.weighted,
      sorted = !bcast)
    // outdeg / out-strength per vertex.
    val deg =
      if (cfg.weighted)
        sym.groupBy(col("src").as("id")).agg(sum(col("weight").cast("double")).as("deg"))
      else
        sym.groupBy(col("src").as("id")).agg(count(lit(1)).cast("double").as("deg"))
    // edge-derived vertex sets have min degree 1 by construction — the
    // dangling machinery only wakes up for explicit vertex tables.
    val mayDangle = verticesOpt.isDefined
    val vdeg = verts.join(deg, Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0.0)).as("deg")).persist()
    vdeg.count()

    var ranks = vdeg.select(col("id"), lit(1.0 / v).as("rank"), col("deg"))
      .transform(Iterate.pin)
    var prevPin: Option[Iterate.Pinned] = None
    var iter = 0
    var done = false
    val nIter = cfg.fixedIter.getOrElse(cfg.maxIter)
    while (!done && iter < nIter) {
      val dangling =
        if (mayDangle)
          ranks.filter(col("deg") === 0.0)
            .agg(coalesce(sum("rank"), lit(0.0))).collect()(0).getDouble(0)
        else 0.0
      val plan = iterPlan(sym, ranks, vdeg, v, dangling, bcast,
        withDelta = cfg.fixedIter.isEmpty, cfg)
      if (cfg.fixedIter.isEmpty) {
        // tol mode: |delta| vs the previous ranks rides the SAME plan; the
        // pin job below both materializes and sums it (zero extra jobs).
        val pinned = Iterate.pinSums(plan, Seq("delta"))
        done = pinned.sums(0) < cfg.tol
        ranks = pinned.df.select("id", "rank", "deg")
        prevPin.foreach(_.release())
        prevPin = Some(pinned)
      } else {
        val pinned = Iterate.pinSums(plan, Seq.empty)
        ranks = pinned.df
        prevPin.foreach(_.release())
        prevPin = Some(pinned)
      }
      iter += 1
    }
    sym.unpersist(); verts.unpersist(); vdeg.unpersist()
    ranks.select("id", "rank")
  }

  /** One iteration's (unpinned) next-state plan — exposed so StrategySpec
    * can assert the broadcast-state variant stays free of shuffle
    * exchanges. On the broadcast path the inner deg re-attach visits
    * exactly the rows the shuffle path's left join does, because a
    * symmetrized min-degree-1 graph delivers at least one contribution to
    * every vertex. */
  private[graft] def iterPlan(sym: DataFrame, ranks: DataFrame, vdeg: DataFrame,
      v: Double, dangling: Double, bcast: Boolean, withDelta: Boolean,
      cfg: Config): DataFrame = {
    val contribCol =
      if (cfg.weighted) col("rank") * col("weight") / col("deg")
      else col("rank") / col("deg")
    val rankSide = ranks.filter(col("deg") > 0.0)
      .select(col("id").as("src"), col("rank"), col("deg"))
    val contribs = sym
      .join(if (bcast) broadcast(rankSide) else rankSide, Seq("src"))
      .select(col("dst"), contribCol.as("c"))
      .groupBy(col("dst").as("id")).agg(sum("c").as("s"))
    val newRank =
      lit((1.0 - cfg.damping) / v) +
        lit(cfg.damping) * (coalesce(col("s"), lit(0.0)) + lit(dangling / v))
    val base =
      if (bcast) contribs.join(broadcast(vdeg), Seq("id"))
      else vdeg.join(contribs, Seq("id"), "left")
    if (withDelta) {
      val oldSide = ranks.select(col("id"), col("rank").as("old"))
      base.join(if (bcast) broadcast(oldSide) else oldSide, Seq("id"))
        .select(col("id"), newRank.as("rank"), col("deg"),
          abs(newRank - col("old")).as("delta"))
    } else base.select(col("id"), newRank.as("rank"), col("deg"))
  }

  /** Top-k vertices by rank (SURVEY.md §2.6 addition). */
  def topK(ranks: DataFrame, k: Int): DataFrame =
    ranks.orderBy(desc("rank"), asc("id")).limit(k)
}
