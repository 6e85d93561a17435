package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Edge
import graft.graph.GraphOps

/** PageRank over the (undirected, symmetrized) co-occurrence graph —
  * north-rule addition N1 (SURVEY.md §2.9); no direct reference
  * implementation exists, so semantics follow the standard formulation:
  *
  *   r'(v) = (1-d)/V + d * ( sum_{u->v} r(u)/outdeg(u) + danglingMass/V )
  *
  * Ranks sum to 1 at every iteration. On a symmetrized graph whose vertex
  * set is edge-derived there are no dangling vertices, but the dangling
  * term is kept for callers that pass an explicit vertex table with
  * isolated vertices.
  *
  * Scale shape per iteration: one equi-join (ranks -> edges on src, ranks
  * is the small, repartitioned side) + one hash aggregate on dst. Lineage
  * is truncated every iteration via localCheckpoint (ranks is V rows —
  * cheap); the edge table is persisted once across all iterations.
  */
object PageRank {

  final case class Config(
      damping: Double = 0.85,
      tol: Double = 1e-9, // on sum(|delta|); comfortably below 1e-6 fixture parity
      maxIter: Int = 100,
      fixedIter: Option[Int] = None) // exactly-n iterations (oracle parity mode)

  def run(edges: Dataset[Edge], cfg: Config = Config(),
          verticesOpt: Option[DataFrame] = None): DataFrame = {
    val sym = GraphOps.symmetrize(edges).select("src", "dst").persist()
    sym.count()
    val verts = verticesOpt.getOrElse(GraphOps.vertices(edges)).select("id").persist()
    val v = verts.count().toDouble
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    // outDeg per vertex; isolated vertices keep deg 0 => dangling.
    val vdeg = verts.join(deg, Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg")).persist()
    vdeg.count()

    var ranks = vdeg.select(col("id"), lit(1.0 / v).as("rank"), col("deg"))
      .transform(graft.io.Iterate.pin)
    var iter = 0
    var done = false
    val nIter = cfg.fixedIter.getOrElse(cfg.maxIter)
    while (!done && iter < nIter) {
      val dangling = ranks.filter(col("deg") === 0L)
        .agg(coalesce(sum("rank"), lit(0.0))).collect()(0).getDouble(0)
      val contribs = sym
        .join(ranks.filter(col("deg") > 0L).select(col("id").as("src"),
          (col("rank") / col("deg")).as("c")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum("c").as("s"))
      val newRanks = vdeg
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - cfg.damping) / v) +
            lit(cfg.damping) * (coalesce(col("s"), lit(0.0)) + lit(dangling / v))).as("rank"),
          col("deg"))
        .transform(graft.io.Iterate.pin)
      if (cfg.fixedIter.isEmpty) {
        val delta = newRanks.join(ranks.select(col("id"), col("rank").as("old")), Seq("id"))
          .agg(sum(abs(col("rank") - col("old")))).collect()(0).getDouble(0)
        done = delta < cfg.tol
      }
      ranks = newRanks
      iter += 1
    }
    sym.unpersist(); verts.unpersist(); vdeg.unpersist()
    ranks.select("id", "rank")
  }

  /** Top-k vertices by rank (SURVEY.md §2.6 addition). */
  def topK(ranks: DataFrame, k: Int): DataFrame =
    ranks.orderBy(desc("rank"), asc("id")).limit(k)
}
