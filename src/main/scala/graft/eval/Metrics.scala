package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Edge
import graft.graph.GraphOps
import graft.algo.Hedonic

/** Scoring / analytics over partitions (SURVEY.md §2.4):
  * ARI accuracy (A8, hedonic/__init__.py:114-118 — the reference's
  * `accuracy` early-returns igraph's adjusted_rand), robustness (A9,
  * hedonic/__init__.py:372-394), satisfaction classes (A10, :354-370),
  * equilibrium fraction (A13, :451-456) and the resolution spectrum
  * (:432-449) — all as pure DataFrame aggregations.
  */
object Metrics {

  /** Contingency table of two partitions: (c1, c2, n) — join J5. */
  def contingency(p1: DataFrame, p2: DataFrame): DataFrame =
    p1.select(col("id"), col("community").as("c1"))
      .join(p2.select(col("id"), col("community").as("c2")), Seq("id"))
      .groupBy("c1", "c2").agg(count(lit(1)).as("n"))

  /** Adjusted Rand Index, closed form over the contingency counts.
    * ONE job (round 6; was four, then two): a single GROUPING SETS
    * aggregate straight off the id-join computes the cells and BOTH
    * marginals (grouping() flags tell the slices apart — cell t's are the
    * contingency n's, marginal t's their per-side sums, exactly the values
    * the old cached-table passes produced), and a final single-row
    * aggregate folds the four sums. Identical arithmetic per term
    * (same c2 formula on the same longs) — only the job count changed. */
  def adjustedRandIndex(p1: DataFrame, p2: DataFrame): Double = {
    def c2(c: org.apache.spark.sql.Column) = c * (c - 1) / lit(2.0)
    val joined = p1.select(col("id"), col("community").as("c1"))
      .join(p2.select(col("id"), col("community").as("c2")), Seq("id"))
    val cell = col("g1") === 0 && col("g2") === 0
    val margA = col("g1") === 0 && col("g2") === 1 // c1 kept, c2 rolled up
    val margB = col("g1") === 1 && col("g2") === 0
    val r = joined
      .groupingSets(
        Seq(Seq(col("c1"), col("c2")), Seq(col("c1")), Seq(col("c2"))),
        col("c1"), col("c2"))
      .agg(count(lit(1)).as("t"),
        grouping(col("c1")).as("g1"), grouping(col("c2")).as("g2"))
      .agg(
        coalesce(sum(when(cell, c2(col("t")))), lit(0.0)),
        coalesce(sum(when(cell, col("t"))), lit(0L)),
        coalesce(sum(when(margA, c2(col("t")))), lit(0.0)),
        coalesce(sum(when(margB, c2(col("t")))), lit(0.0)))
      .collect()(0)
    val sumIj = r.getDouble(0)
    val n = r.getLong(1).toDouble
    val sumA = r.getDouble(2)
    val sumB = r.getDouble(3)
    val totalPairs = n * (n - 1) / 2.0
    if (totalPairs == 0) return 1.0
    val expected = sumA * sumB / totalPairs
    val maxIdx = (sumA + sumB) / 2.0
    if (maxIdx == expected) 1.0 else (sumIj - expected) / (maxIdx - expected)
  }

  /** Per-node satisfaction classes (A10): a node is
    *  - always_satisfied: own community has max friends AND min strangers,
    *  - never_satisfied: own community in neither set,
    *  - relatively_satisfied otherwise (alpha-dependent).
    * Returns (id, class). */
  def satisfaction(edges: Dataset[Edge], members: DataFrame): DataFrame = {
    val sym = GraphOps.symmetrize(edges)
    // alpha only scales payoffs; friends/strangers suffice. alpha=0 keeps
    // the columns exact.
    val p = Hedonic.payoffs(sym, members, 0.0)
    p.groupBy("id").agg(
      max("friends").as("maxF"),
      min("strangers").as("minS"),
      max(when(col("isCur"), col("friends"))).as("curF"),
      max(when(col("isCur"), col("strangers"))).as("curS"))
      .select(col("id"),
        when(col("curF") === col("maxF") && col("curS") === col("minS"), "always_satisfied")
          .when(col("curF") =!= col("maxF") && col("curS") =!= col("minS"), "never_satisfied")
          .otherwise("relatively_satisfied").as("cls"))
  }

  /** Robustness (A9): fraction of nodes whose community is optimal at BOTH
    * alpha=0 (max friends) and alpha=1 (min strangers). */
  def robustness(edges: Dataset[Edge], members: DataFrame): Double = {
    val row = satisfaction(edges, members)
      .select(avg((col("cls") === "always_satisfied").cast("double")))
      .collect()(0)
    if (row.isNullAt(0)) 1.0 else row.getDouble(0)
  }

  /** A20 within-cluster degree-distribution fingerprint (reference
    * verify_cluster_degree_distributions, scripts/robustness/robust.py:48-76):
    * per community, the histogram of SAME-COMMUNITY degrees, vertices with
    * no internal edge counted at degree 0. One row per
    * (community, degree) with the number of such vertices. */
  def clusterDegreeFingerprint(edges: Dataset[Edge], members: DataFrame): DataFrame = {
    val m1 = members.select(col("id").as("src"), col("community").as("c1"))
    val m2 = members.select(col("id").as("dst"), col("community").as("c2"))
    val within = edges.toDF().join(m1, Seq("src")).join(m2, Seq("dst"))
      .filter(col("c1") === col("c2"))
    val deg = within.select(col("src").as("id"))
      .unionByName(within.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    members.join(deg, Seq("id"), "left")
      .select(col("community"), coalesce(col("d"), lit(0L)).as("degree"))
      .groupBy("community", "degree").agg(count(lit(1)).as("n_nodes"))
  }

  /** Fraction of nodes in equilibrium at each resolution in `alphas` —
    * the resolution spectrum (hedonic/__init__.py:432-449). The alpha axis
    * is DATA (explode), not plan replication; always/never-satisfied nodes
    * are constant across alpha (work pruning, :439-446) but are kept in the
    * aggregate for exactness. Equilibrium tolerance = numpy isclose
    * (rtol 1e-5, atol 1e-8, hedonic/__init__.py:646). */
  def resolutionSpectrum(edges: Dataset[Edge], members: DataFrame,
                         alphas: Seq[Double]): DataFrame = {
    val sym = GraphOps.symmetrize(edges)
    val base = Hedonic.payoffs(sym, members, 0.0)
      .select("id", "community", "friends", "strangers", "isCur")
    val alphaDf = base.sparkSession.range(1)
      .select(explode(array(alphas.map(lit): _*)).as("alpha"))
    val withAlpha = base.crossJoin(broadcast(alphaDf))
    withAlpha
      .withColumn("payoff",
        col("friends") * (lit(1.0) - col("alpha")) - col("strangers") * col("alpha"))
      .groupBy("alpha", "id").agg(
        max("payoff").as("maxP"),
        max(when(col("isCur"), col("payoff"))).as("curP"))
      .groupBy("alpha").agg(
        avg((abs(col("curP") - col("maxP")) <=
          lit(1e-8) + lit(1e-5) * abs(col("maxP"))).cast("double")).as("equilibrium_fraction"))
      .orderBy("alpha")
  }
}
