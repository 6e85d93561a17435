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
  * Scale shape per iteration: one equi-join (ranks -> edges on src, ranks
  * is the small side) + one hash aggregate on dst, then ONE materializing
  * job that pins the new state and (in tol mode) accumulates sum|delta| in
  * the same pass — no separate convergence job. The edge table is
  * persisted once across all iterations; the previous iteration's cache is
  * released as soon as the new one is live.
  */
object PageRank {

  final case class Config(
      damping: Double = 0.85,
      tol: Double = 1e-9, // on sum(|delta|); comfortably below 1e-6 fixture parity
      maxIter: Int = 100,
      fixedIter: Option[Int] = None, // exactly-n iterations (oracle parity mode)
      weighted: Boolean = false)

  def run(edges: Dataset[Edge], cfg: Config = Config(),
          verticesOpt: Option[DataFrame] = None): DataFrame = {
    // cached pre-partitioned on src (the per-iteration join key): the edge
    // side never re-exchanges inside the loop — only ranks shuffle.
    val sym = GraphOps.pinnedSym(edges, "src", cfg.weighted)
    val verts = verticesOpt.getOrElse(GraphOps.vertices(edges)).select("id").persist()
    val v = verts.count().toDouble
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
      val contribCol =
        if (cfg.weighted) col("rank") * col("weight") / col("deg")
        else col("rank") / col("deg")
      val contribs = sym
        .join(ranks.filter(col("deg") > 0.0).select(col("id").as("src"), col("rank"), col("deg")),
          Seq("src"))
        .select(col("dst"), contribCol.as("c"))
        .groupBy(col("dst").as("id")).agg(sum("c").as("s"))
      val newRank =
        lit((1.0 - cfg.damping) / v) +
          lit(cfg.damping) * (coalesce(col("s"), lit(0.0)) + lit(dangling / v))
      val base = vdeg.join(contribs, Seq("id"), "left")
      if (cfg.fixedIter.isEmpty) {
        // tol mode: |delta| vs the previous ranks rides the SAME plan; the
        // pin job below both materializes and sums it (zero extra jobs).
        val withDelta = base
          .join(ranks.select(col("id"), col("rank").as("old")), Seq("id"))
          .select(col("id"), newRank.as("rank"), col("deg"),
            abs(newRank - col("old")).as("delta"))
        val pinned = Iterate.pinSums(withDelta, Seq("delta"))
        done = pinned.sums(0) < cfg.tol
        ranks = pinned.df.select("id", "rank", "deg")
        prevPin.foreach(_.release())
        prevPin = Some(pinned)
      } else {
        val pinned = Iterate.pinSums(
          base.select(col("id"), newRank.as("rank"), col("deg")), Seq.empty)
        ranks = pinned.df
        prevPin.foreach(_.release())
        prevPin = Some(pinned)
      }
      iter += 1
    }
    sym.unpersist(); verts.unpersist(); vdeg.unpersist()
    ranks.select("id", "rank")
  }

  /** Top-k vertices by rank (SURVEY.md §2.6 addition). */
  def topK(ranks: DataFrame, k: Int): DataFrame =
    ranks.orderBy(desc("rank"), asc("id")).limit(k)
}
