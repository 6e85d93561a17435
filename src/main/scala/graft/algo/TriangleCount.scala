package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Edge
import graft.graph.GraphOps

/** Triangle counting — north-rule addition N4. The wedge primitive appears
  * in the reference as neighbor-set intersection
  * (scripts/reciprocity_clustering.py:70-73).
  *
  * Algorithm: canonical src < dst edge table; wedges (a<b<c) from the
  * self-join e1(a,b) x e2(b,c); closed by a semi-join-shaped inner join on
  * the (a,c) edge. Each triangle is produced exactly once. All three scans
  * are of the same deduped edge table — Catalyst reuses the exchange.
  *
  * Scale note: the wedge stream is sum over vertices of C(deg,2), dominated
  * by hub vertices. At 100 TB the standard mitigation (applied here) is
  * degree-ordered orientation: orient each edge from lower-degree to
  * higher-degree endpoint, which bounds per-vertex wedge fanout by
  * arboricity (sqrt(E)) instead of max degree.
  */
object TriangleCount {

  /** Global triangle count. */
  def count(edges: Dataset[Edge]): Long =
    triangles(edges).count()

  /** One row (a, b, c) per triangle, a < b < c under the degree ordering's
    * inverse mapping back to ids. */
  def triangles(edges: Dataset[Edge]): DataFrame = {
    // Degree-based orientation: edge u->v iff (deg(u), u) < (deg(v), v).
    val deg = GraphOps.degrees(edges)
    val e = edges.toDF()
      .join(deg.select(col("id").as("src"), col("degree").as("ds")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("degree").as("dd")), Seq("dst"))
      .select(
        when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")), col("src"))
          .otherwise(col("dst")).as("u"),
        when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")), col("dst"))
          .otherwise(col("src")).as("v"))
    val e1 = e.select(col("u").as("a"), col("v").as("b"))
    val e2 = e.select(col("u").as("b2"), col("v").as("c"))
    // wedges at the low-degree apex: a->b, a->c with b < c...
    // orientation makes both wedge legs outgoing from the apex.
    val wedges = e1.join(e2, col("a") === col("b2") && col("b") < col("c"))
      .select(col("a"), col("b"), col("c"))
    // close the wedge: edge between b and c in EITHER orientation.
    val closing = e.select(col("u").as("b"), col("v").as("c"))
      .unionByName(e.select(col("v").as("b"), col("u").as("c")))
    wedges.join(closing, Seq("b", "c"), "left_semi")
  }

  /** Per-vertex triangle participation counts. */
  def perVertex(edges: Dataset[Edge]): DataFrame = {
    val t = triangles(edges)
    t.select(col("a").as("id"))
      .unionByName(t.select(col("b").as("id")))
      .unionByName(t.select(col("c").as("id")))
      .groupBy("id").agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
  }
}
