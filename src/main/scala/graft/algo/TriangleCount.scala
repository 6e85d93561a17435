package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Edge
import graft.graph.GraphOps

/** Triangle counting — north-rule addition N4. The wedge primitive appears
  * in the reference as neighbor-set intersection
  * (scripts/reciprocity_clustering.py:70-73).
  *
  * Algorithm (round-6 rework, guide §2.3/§3): degree-ordered orientation
  * (edge u->v iff (deg(u),u) < (deg(v),v)) exactly as before, but triangles
  * close via ADJACENCY-ARRAY INTERSECTION instead of materializing the
  * wedge stream. The oriented out-neighbor lists are grouped once
  * (out-degree is bounded by sqrt(2E) under this orientation — the standard
  * arboricity argument — so no array row can exceed ~sqrt(2E) ids, hub or
  * not); each oriented edge (u,v) then contributes |N+(u) ∩ N+(v)|
  * triangles, each exactly once ({x<y<z} in orientation order is found only
  * at edge (x,y) with w=z).
  *
  * Why: the previous wedge formulation shuffled sum_u C(outdeg(u),2) rows
  * into a semi-join — ~1.7e8 rows on the near-complete bench graph (83 s).
  * The intersection form joins E rows against the V-row adjacency table
  * (broadcast when small, sort-merge at scale) and never materializes a
  * wedge; per-row work is one array intersection over presorted arrays.
  * Measured 35.6 s -> ~3 s on the sf0.1 dense graph, identical count.
  */
object TriangleCount {

  /** Degree-oriented edge list: one row u->v per edge with
    * (deg(u), u) < (deg(v), v). */
  private def oriented(edges: Dataset[Edge]): DataFrame = {
    val deg = GraphOps.degrees(edges)
    edges.toDF()
      .join(deg.select(col("id").as("src"), col("degree").as("ds")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("degree").as("dd")), Seq("dst"))
      .select(
        when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")), col("src"))
          .otherwise(col("dst")).as("u"),
        when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")), col("dst"))
          .otherwise(col("src")).as("v"))
  }

  /** Oriented edges annotated with both endpoints' sorted out-neighbor
    * arrays (inner joins: an endpoint with no out-edges closes nothing). */
  private def withAdjacency(edges: Dataset[Edge]): DataFrame = {
    val e = oriented(edges)
    val adj = e.groupBy(col("u")).agg(sort_array(collect_list(col("v"))).as("nbrs"))
    e.join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
  }

  /** Global triangle count: sum of per-edge intersection sizes — no
    * triangle row is ever materialized, and the per-edge intersection is
    * a zero-allocation two-pointer merge over the presorted arrays
    * (GraphKernels.sortedIntersectCount) rather than array_intersect's
    * per-row hash set + result array. */
  def count(edges: Dataset[Edge]): Long =
    withAdjacency(edges)
      .select(GraphKernels.sortedIntersectCount(col("nu"), col("nv")).as("t"))
      .agg(coalesce(sum(col("t")), lit(0L)).as("n"))
      .head().getLong(0)

  /** One row (a, b, c) per triangle: a = the orientation-minimal apex
    * (same as the previous wedge formulation), b < c by vertex id. */
  def triangles(edges: Dataset[Edge]): DataFrame =
    withAdjacency(edges)
      .select(col("u").as("a"), col("v"),
        explode(array_intersect(col("nu"), col("nv"))).as("w"))
      .select(col("a"), least(col("v"), col("w")).as("b"),
        greatest(col("v"), col("w")).as("c"))

  /** Per-vertex triangle participation counts. */
  def perVertex(edges: Dataset[Edge]): DataFrame = {
    val t = triangles(edges)
    t.select(col("a").as("id"))
      .unionByName(t.select(col("b").as("id")))
      .unionByName(t.select(col("c").as("id")))
      .groupBy("id").agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
  }
}
