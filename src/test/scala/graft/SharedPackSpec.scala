package graft

import graft.algo.{Hedonic, LabelPropagation, PageRank}
import graft.graph.{GraphOps, PackedAdjacency}

/** Pack-once, run-many: a caller-built CSR pack of the symmetrized edges is
  * honored by Hedonic.run and PageRank.runTimed on the broadcast-state path
  * (src- and dst-packs of a symmetric edge set are identical), with results
  * bitwise equal to each algorithm building its own pack, and the CACHE
  * LIFETIME owned by the caller — the runs must neither unpersist the
  * shared pack mid-pipeline nor leak their own reindexed caches. */
class SharedPackSpec extends SparkSpec {

  private val pairs = Seq[(Long, Long)](
    (0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3), (5, 6), (6, 7))

  test("hedonic + pagerank on one shared pack match own-pack runs bitwise") {
    val e = edgesOf(pairs)
    val init = membersOf((0L to 7L).map(i => (i, i)))
    val cfgH = Hedonic.Config(maxSupersteps = 40)
    val cfgP = PageRank.Config(fixedIter = Some(20))
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet

    val (ownH, ownMet) = Hedonic.run(e, init, cfgH)
    val ownHM = toMap(ownH)
    val ownP = PageRank.run(e, cfgP)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ownL = toMap(LabelPropagation.run(e)) // toMap is positional (id, label)

    // The own-pack runs above must precede the shared build: Spark's
    // CacheManager keys entries by canonicalized plan, so an own-pack run
    // over the identical plan would evict the shared entry on ITS
    // unpersist. (Real pipelines share the PackedAdj instance instead of
    // rebuilding an identical plan, so this aliasing is test-only.)
    val pack = PackedAdjacency.build(
      GraphOps.symmetrize(e).select("src", "dst"), "src")
    val (shH, shMet) = Hedonic.run(e, init, cfgH, packedOpt = Some(pack))
    // the pipeline contract: hedonic must NOT have released the shared pack
    assert(pack.df.storageLevel.useMemory,
      "shared pack was unpersisted by Hedonic.run")
    val (shPdf, _) = PageRank.runTimed(e, cfgP, None, packedOpt = Some(pack))
    val shP = shPdf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pack.df.storageLevel.useMemory,
      "shared pack was unpersisted by PageRank.runTimed")
    val shL = toMap(LabelPropagation.run(e, packedOpt = Some(pack)))
    assert(pack.df.storageLevel.useMemory,
      "shared pack was unpersisted by LabelPropagation.run")
    assert(shL == ownL)

    assert(toMap(shH) == ownHM)
    assert(shMet.map(m => (m.superstep, m.moved, m.frontier)) ==
      ownMet.map(m => (m.superstep, m.moved, m.frontier)))
    assert(shP.keySet == ownP.keySet)
    // same kernels, same per-vertex sorted accumulation order -> bitwise
    shP.foreach { case (id, r) => assert(r == ownP(id), s"rank mismatch at $id") }

    pack.unpersist()
    // no leaked reindexed caches from either run (delta vs suite entry —
    // the session is shared across suites)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty, s"persistent RDDs leaked: $leaked")
  }

  test("weighted hedonic honors a weighted shared pack") {
    import spark.implicits._
    val wedges = pairs.map { case (u, v) =>
      graft.model.Edge(u, v, ((u * 3 + v) % 4 + 1).toDouble)
    }.toDS()
    val init = membersOf((0L to 7L).map(i => (i, i % 3)))
    val cfg = Hedonic.Config(maxSupersteps = 40, weighted = true)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val (own, _) = Hedonic.run(wedges, init, cfg)
    val pack = PackedAdjacency.build(
      GraphOps.symmetrize(wedges).select("src", "dst", "weight"), "src",
      weighted = true)
    val (sh, _) = Hedonic.run(wedges, init, cfg, packedOpt = Some(pack))
    assert(toMap(sh) == toMap(own))
    pack.unpersist()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty, s"persistent RDDs leaked: $leaked")
  }

  test("mismatched weighted flag on a prebuilt pack is rejected") {
    val e = edgesOf(pairs)
    val init = membersOf((0L to 7L).map(i => (i, i)))
    val pack = PackedAdjacency.build(
      GraphOps.symmetrize(e).select("src", "dst"), "src")
    intercept[IllegalArgumentException] {
      Hedonic.run(e, init, Hedonic.Config(weighted = true), Some(pack))
    }
    intercept[IllegalArgumentException] {
      PageRank.runTimed(e, PageRank.Config(weighted = true), None, Some(pack))
    }
    pack.unpersist()
  }
}
