package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphOps
import graft.ingest.{EdgeExtraction, RepoTable}

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalize: swaps, drops self-loops, merges duplicates") {
    val raw = Seq((2L, 1L, 1.0), (1L, 2L, 2.0), (3L, 3L, 1.0), (1L, 4L, 1.0))
      .toDF("src", "dst", "weight")
    val e = GraphOps.canonicalize(raw).collect().sortBy(x => (x.src, x.dst))
    assert(e.map(x => (x.src, x.dst, x.weight)).toSeq ==
      Seq((1L, 2L, 3.0), (1L, 4L, 1.0)))
  }

  test("degrees and density on a triangle + pendant") {
    val e = edgesOf(Seq((0, 1), (1, 2), (0, 2), (2, 3)))
    val deg = GraphOps.degrees(e).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg == Map(0L -> 2, 1L -> 2, 2L -> 3, 3L -> 1))
    // V=4, E=4 => density = 2*4/(4*3) = 2/3
    assert(math.abs(GraphOps.density(e) - 2.0 / 3.0) < 1e-12)
  }

  test("symmetrize doubles rows; vertices are edge-derived") {
    val e = edgesOf(Seq((0, 1), (1, 2)))
    assert(GraphOps.symmetrize(e).count() == 4)
    assert(toMap(GraphOps.vertices(e).select(col("id"), col("id"))).keySet == Set(0L, 1L, 2L))
  }

  test("adjacency packs sorted neighbor arrays") {
    val e = edgesOf(Seq((0, 1), (0, 2), (1, 2)))
    val adj = GraphOps.adjacency(e).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(adj(0L) == Seq(1L, 2L) && adj(1L) == Seq(0L, 2L) && adj(2L) == Seq(0L, 1L))
  }
}

class EdgeExtractionSpec extends SparkSpec {
  import spark.implicits._

  test("co-occurrence: weight = number of shared paths, canonical src<dst") {
    // repos 1,2 share paths a,b; repos 2,3 share c; repo 4 alone.
    val files = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (2L, "c"), (3L, "c"), (4L, "z")
    ).toDF("id", "pk")
    val e = EdgeExtraction.cooccurrence(files, "id", "pk")
      .collect().map(x => (x.src, x.dst) -> x.weight).toMap
    assert(e == Map((1L, 2L) -> 2.0, (2L, 3L) -> 1.0))
  }

  test("hub-path fanout cap drops stopword-like paths, observable via hubPathCount") {
    // path "hub" shared by 5 repos, path "p" by 2.
    val rows = (1L to 5L).map(i => (i, "hub")) :+ (1L, "p") :+ (2L, "p")
    val files = rows.toDF("id", "pk")
    assert(EdgeExtraction.hubPathCount(
      files.select(col("id").as("repo"), col("pk").as("path")), 3) == 1L)
    val e = EdgeExtraction.cooccurrence(files, "id", "pk", maxPathFanout = 3)
      .collect().map(x => (x.src, x.dst)).toSet
    assert(e == Set((1L, 2L))) // only the non-hub path contributes
  }

  test("sha256 invariant: stamped per row, preserved through edge extraction") {
    val cfg = RepoTable.Config(nBlocks = 2, reposPerBlock = 5, pathsPerBlock = 5,
      pIn = 0.9, pOut = 0.1, seed = 7L)
    val files = RepoTable.withSha(RepoTable.generate(spark, cfg)).cache()
    // invariant: sha == sha2(content,256) on every row
    assert(files.filter(col("sha") =!= sha2(col("content"), 256)).count() == 0)
    val (verts, edges) = EdgeExtraction.extract(files, dense = true)
    assert(edges.count() > 0)
    // extraction must not mutate the file table: same row count, same sha set
    val before = files.select("sha").as[String].collect().sorted.toSeq
    val after = RepoTable.withSha(files.drop("sha")).select("sha").as[String]
      .collect().sorted.toSeq
    assert(before == after)
    // dense ids are 0..V-1
    val ids = verts.select("id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until ids.length).toSeq)
    files.unpersist()
  }

  test("sparse generator: deterministic, planted structure, calibrated cross density") {
    val cfg = RepoTable.Config(nBlocks = 4, reposPerBlock = 25, pathsPerBlock = 20,
      pIn = 0.5, pOut = 0.02, seed = 3L)
    val a = RepoTable.generateSparse(spark, cfg, foreignSample = 16)
    val b = RepoTable.generateSparse(spark, cfg, foreignSample = 16)
    assert(a.orderBy("repo", "path").collect().toSeq ==
      b.orderBy("repo", "path").collect().toSeq)
    // planted structure: same-block (repo, path) cells dominate
    val withBlocks = a.select(
      regexp_extract(col("repo"), "^org(\\d+)/", 1).cast("long").as("rb"),
      regexp_extract(col("path"), "^src/b(\\d+)/", 1).cast("long").as("pb"))
    val intra = withBlocks.filter(col("rb") === col("pb")).count()
    val cross = withBlocks.filter(col("rb") =!= col("pb")).count()
    // E[intra] = 100*20*0.5 = 1000; E[cross] = 100*80*0.02 = 160
    assert(intra > 700 && intra < 1300, s"intra=$intra")
    assert(cross > 60 && cross < 320, s"cross=$cross")
    // the sparse and dense generators agree on schema
    assert(a.schema == RepoTable.generate(spark, cfg).schema)
  }

  test("generator is deterministic and plants block structure") {
    val cfg = RepoTable.Config(nBlocks = 2, reposPerBlock = 10, pathsPerBlock = 10,
      pIn = 0.7, pOut = 0.05, seed = 11L)
    val a = RepoTable.generate(spark, cfg).orderBy("repo", "path").collect()
    val b = RepoTable.generate(spark, cfg).orderBy("repo", "path").collect()
    assert(a.toSeq == b.toSeq)
    val gt = RepoTable.groundTruth(RepoTable.generate(spark, cfg), cfg)
    assert(toMap(gt).values.toSet == Set(0L, 1L))
  }
}
