package graft

import org.apache.spark.sql.functions._
import graft.algo.{ConnectedComponents, Hedonic, LabelPropagation, PageRank}
import graft.eval.Metrics
import graft.graph.GraphOps
import graft.ingest.EdgeExtraction
import graft.io.Checkpoint
import graft.model.Edge

/** Round-2 operator specs: P3 induction, M4/A11/A12 game ops, A20
  * fingerprint, weighted algorithm variants, the hub-safe CC rewrite, the
  * bucketed dense-id assignment, and the JSON manifest encoder. */
class NewOpsSpec extends SparkSpec {

  import spark.implicits._

  private def wEdges(es: Seq[(Long, Long, Double)]) =
    es.map { case (u, v, w) => Edge(math.min(u, v), math.max(u, v), w) }.toDS()

  // ------------------------------------------------------------ P3

  test("inducedSubgraph keeps only both-endpoint edges") {
    val e = edgesOf(Fixtures.threeComponents)
    val vset = Seq(0L, 1L, 2L, 10L).toDF("id")
    val got = GraphOps.inducedSubgraph(e, vset).collect()
      .map(x => (x.src, x.dst)).toSet
    assert(got == Set((0L, 1L), (1L, 2L), (0L, 2L)))
  }

  test("communityWithNeighbors = members ∪ direct neighbors") {
    val e = edgesOf(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
    val m = membersOf(Seq(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    val got = GraphOps.communityWithNeighbors(e, m, 0L)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L, 2L)) // members {0,1} + neighbor 2
  }

  test("per-community pipeline: hedonic on an induced subgraph converges") {
    val e = edgesOf(Fixtures.zachary)
    val m = membersOf((0 until 34).map(i => i.toLong -> (i % 2).toLong))
    val sub = GraphOps.inducedSubgraph(e, GraphOps.communityWithNeighbors(e, m, 0L))
    assert(sub.count() > 0)
    val init = GraphOps.vertices(sub).select(col("id"), col("id").as("community"))
    val (members, metrics) = Hedonic.run(sub, init, Hedonic.Config(maxSupersteps = 40))
    assert(metrics.last.frontier == 0) // converged: zero wanted moves
    assert(members.count() == GraphOps.vertices(sub).count())
  }

  // ------------------------------------------------------------ M4 / A11 / A12

  test("onePass (alpha=0) moves every node to its max-friends community, sync") {
    // path 0-1-2, m0 = id: each to a distinct community
    val e = edgesOf(Seq((0L, 1L), (1L, 2L)))
    val m = membersOf(Seq(0L -> 0L, 1L -> 1L, 2L -> 2L))
    val sym = GraphOps.symmetrize(e).select("src", "dst")
    val got = toMap(Hedonic.onePass(sym, m))
    // 0: friends {c1:1} > own 0 -> 1; 1: tie c0/c2 (1 each) -> smallest 0;
    // 2: c1 has 1 friend -> 1
    assert(got == Map(0L -> 1L, 1L -> 0L, 2L -> 1L))
  }

  test("wantingToMove counts alpha=0 preferences per target community") {
    val e = edgesOf(Seq((0L, 1L), (1L, 2L)))
    val m = membersOf(Seq(0L -> 0L, 1L -> 1L, 2L -> 2L))
    val sym = GraphOps.symmetrize(e).select("src", "dst")
    val got = Hedonic.wantingToMove(sym, m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 0L -> 1L)) // 0&2 prefer c1; 1 prefers c0
  }

  test("communityStability: triangle, community {0,1} vs outside {2}") {
    val e = edgesOf(Seq((0L, 1L), (0L, 2L), (1L, 2L)))
    val m = membersOf(Seq(0L -> 0L, 1L -> 0L, 2L -> 1L))
    val sym = GraphOps.symmetrize(e).select("src", "dst")
    val row = Hedonic.communityStability(sym, m, 0L).collect()(0)
    // inside nodes: 1 friend in, 1 friend out -> tie -> stay (leave = 0)
    assert(row.getDouble(0) == 0.0)
    // node 2: both friends inside -> wants to join (join = 1)
    assert(row.getDouble(1) == 1.0)
  }

  // ------------------------------------------------------------ A20

  test("clusterDegreeFingerprint: within-cluster degree histogram incl. zero") {
    val e = edgesOf(Fixtures.threeComponents)
    val m = membersOf(Seq(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 1L, 11L -> 1L, 12L -> 1L, 20L -> 2L, 21L -> 3L))
    val got = Metrics.clusterDegreeFingerprint(e, m).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // triangles: all members degree 2; the split pair has no internal edges
    assert(got == Map((0L, 2L) -> 3L, (1L, 2L) -> 3L, (2L, 0L) -> 1L, (3L, 0L) -> 1L))
  }

  // ------------------------------------------------------------ weighted

  test("strengths sums incident weights") {
    val e = wEdges(Seq((0L, 1L, 2.0), (1L, 2L, 3.0)))
    val got = GraphOps.strengths(e).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(0L -> 2.0, 1L -> 5.0, 2L -> 3.0))
  }

  test("weighted LPA vote beats unweighted count") {
    val e = wEdges(Seq((0L, 1L, 5.0), (0L, 2L, 1.0), (0L, 3L, 1.0)))
    val labels = Seq((0L, 0L), (1L, 7L), (2L, 8L), (3L, 8L)).toDF("id", "label")
    val symW = GraphOps.symmetrize(e)
    val w = LabelPropagation.step(symW, labels, weighted = true)
      .filter(col("id") === 0).collect()(0).getAs[Long]("bestLabel")
    assert(w == 7L) // weight 5 beats 2 votes of weight 1
    val u = LabelPropagation.step(symW.select("src", "dst"), labels)
      .filter(col("id") === 0).collect()(0).getAs[Long]("bestLabel")
    assert(u == 8L) // two votes beat one
  }

  test("weighted gather sums edge weights as friendship strength") {
    val e = wEdges(Seq((0L, 1L, 2.5), (0L, 2L, 1.0)))
    val m = membersOf(Seq(0L -> 0L, 1L -> 1L, 2L -> 1L))
    val g = Hedonic.gather(GraphOps.symmetrize(e), m, weighted = true)
      .filter(col("id") === 0 && col("community") === 1).collect()(0)
    assert(g.getDouble(2) == 3.5)
  }

  test("weighted PageRank with uniform weights equals unweighted") {
    val es = Fixtures.kite.map { case (u, v) => (u, v, 2.0) }
    val e = wEdges(es)
    val uw = PageRank.run(e, PageRank.Config(fixedIter = Some(5)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = PageRank.run(e, PageRank.Config(fixedIter = Some(5), weighted = true))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    uw.foreach { case (id, r) => assert(math.abs(w(id) - r) < 1e-12) }
  }

  test("weighted PageRank favors the heavy edge") {
    // star: 0-1 heavy, 0-2 light => 1 outranks 2
    val e = wEdges(Seq((0L, 1L, 10.0), (0L, 2L, 1.0)))
    val r = PageRank.run(e, PageRank.Config(fixedIter = Some(10), weighted = true))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) > r(2L))
  }

  // ------------------------------------------------------------ CC hub safety

  test("CC handles a 50k-degree hub star plus a separate component") {
    val leaves = (1L to 50000L).map(i => (0L, i))
    val e = edgesOf(leaves ++ Seq((100001L, 100002L)))
    val got = toMap(ConnectedComponents.run(e).withColumnRenamed("comp", "community"))
    assert(got.size == 50003)
    assert((1L to 50000L).forall(got(_) == 0L) && got(0L) == 0L)
    assert(got(100001L) == 100001L && got(100002L) == 100001L)
  }

  // ------------------------------------------------------------ dense ids

  test("denseVertexIds: ids are exactly 0..V-1, deterministic, no global sort") {
    val repos = (0 until 500).map(i => s"org/repo$i").toDF("repo")
    val a = EdgeExtraction.denseVertexIds(repos, nBuckets = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.values.toSeq.sorted == (0L until 500L))
    val b = EdgeExtraction.denseVertexIds(repos, nBuckets = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  // ------------------------------------------------------------ manifests

  test("Checkpoint.json escapes hostile strings and embeds raw JSON") {
    val line = Checkpoint.json(Map(
      "s" -> "he said \"hi\"\nand\tleft \\ done",
      "n" -> 42L, "d" -> 1.5, "b" -> true, "z" -> null,
      "m" -> Checkpoint.Raw("""{"inner":1}""")))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("s").asText() == "he said \"hi\"\nand\tleft \\ done")
    assert(node.get("n").asLong() == 42L)
    assert(node.get("m").get("inner").asInt() == 1)
    assert(node.get("z").isNull)
  }

  test("grid work-skipping: second runGrid call recomputes nothing") {
    val out = java.nio.file.Files.createTempDirectory("graft-grid").toString
    val grid = Seq(graft.eval.Experiment.Params(2, 8, 0.8, 0.05, 0.2, 1L, 2L))
    val r1 = graft.eval.Experiment.runGrid(spark, grid, out, Seq("Mirror", "OnePassHedonic"))
    val n1 = r1.count()
    assert(n1 == 2)
    val r2 = graft.eval.Experiment.runGrid(spark, grid, out, Seq("Mirror", "OnePassHedonic"))
    assert(r2.count() == n1) // no double-append
  }
}
