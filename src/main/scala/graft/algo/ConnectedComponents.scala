package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Edge
import graft.graph.GraphOps

/** Connected components — north-rule addition N2. Serial analog in the
  * reference: BFS reachability in scripts/robustness/edges.py:8-28.
  *
  * Primary algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond") — O(log^2 V) rounds on
  * pathological chains vs O(diameter) for naive min-propagation, which is
  * the difference between ~10 and ~10,000 shuffles on a 100 TB path-shaped
  * graph. `runNaive` (diameter-bound) is kept as the in-repo cross-check
  * oracle; a property test asserts both agree on random graphs.
  *
  * Labels are canonical: comp = min vertex id of the component, so the
  * "exact up to permutation" bar is met exactly.
  */
object ConnectedComponents {

  /** large-star: for every node u with neighborhood N(u),
    * m = min(N(u) + {u}); link every strictly larger neighbor to m. */
  private def largeStar(pairs: DataFrame): DataFrame = {
    val sym = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    sym.groupBy("src")
      .agg(collect_set(col("dst")).as("nbrs"))
      .select(col("src"),
        least(col("src"), array_min(col("nbrs"))).as("m"),
        col("nbrs"))
      .select(col("src"), col("m"), explode(col("nbrs")).as("v"))
      .filter(col("v") > col("src"))
      .select(col("v").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** small-star: store each pair at its larger endpoint; with
    * N-(u) = smaller neighbors and m = min(N-(u)), link N-(u) + {u} minus m
    * to m. */
  private def smallStar(pairs: DataFrame): DataFrame = {
    val directed = pairs.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    directed.groupBy("src")
      .agg(collect_set(col("dst")).as("nbrs"))
      .select(col("src"), array_min(col("nbrs")).as("m"), col("nbrs"))
      .select(col("m"),
        explode(array_union(col("nbrs"), array(col("src")))).as("v"))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("src"), col("m").as("dst"))
      .distinct()
  }

  def run(edges: Dataset[Edge], maxIter: Int = 50): DataFrame = {
    var pairs = edges.select(col("src"), col("dst")).distinct().transform(graft.io.Iterate.pin)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val next = smallStar(largeStar(pairs)).transform(graft.io.Iterate.pin)
      // Set-equality convergence: |A| == |B| == |A union B|.
      val nNext = next.count()
      val nPrev = pairs.count()
      done = nNext == nPrev &&
        next.unionByName(pairs).distinct().count() == nPrev
      pairs = next
      iter += 1
    }
    // Fixpoint is a star forest: every pair is (v, componentMin).
    val labels = pairs.groupBy(col("src").as("id")).agg(min(col("dst")).as("comp"))
    val roots = GraphOps.vertices(edges)
      .join(labels, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    labels.unionByName(roots)
  }

  /** Naive min-label propagation — O(diameter) supersteps; the in-repo
    * oracle for `run` on small/random graphs. */
  def runNaive(edges: Dataset[Edge], maxIter: Int = 200): DataFrame = {
    val sym = GraphOps.symmetrize(edges).select("src", "dst").persist()
    sym.count()
    var labels = GraphOps.vertices(edges).select(col("id"), col("id").as("comp"))
      .transform(graft.io.Iterate.pin)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nbrMin = sym.join(labels.select(col("id").as("src"), col("comp")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min("comp").as("nmin"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          (coalesce(col("nmin"), col("comp")) < col("comp")).as("chg"))
        .transform(graft.io.Iterate.pin)
      done = next.filter(col("chg")).limit(1).count() == 0
      labels = next.select("id", "comp")
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
