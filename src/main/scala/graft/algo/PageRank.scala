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
  *    table): the rank vector lives in DRIVER arrays between iterations;
  *    each round it re-enters the plan as a broadcast id -> rank primitive
  *    map read through codegen'd lookups (graft.util.StateMap) inside a
  *    scan of the edge table cached pre-partitioned on dst — the GROUPING
  *    key — so the aggregate runs in place and the single job ends in a
  *    V-row collect. An
  *    iteration moves ZERO edge-scale rows through the shuffle and runs
  *    zero auxiliary jobs. This is what makes per-iteration cost scale
  *    with cores (the N->4N efficiency target): both the E-row exchange
  *    that saturates single-host shuffle bandwidth and the serial
  *    per-iteration driver cost (broadcast-build jobs, pins) are gone.
  *  - co-partitioned shuffle (large V): edges cached partitioned on src
  *    (the join key); only the V-row state shuffles into the join, and the
  *    E-row contribution aggregate exchanges on dst. This is the 1e9-vertex
  *    path where broadcasting the state would be worse than the shuffle
  *    (replicating V rows to every executor). ONE materializing job pins
  *    the new state and (in tol mode) accumulates sum|delta| in the same
  *    pass — no separate convergence job; the previous iteration's cache
  *    is released as soon as the new one is live.
  *
  * The edge table is persisted once across all iterations.
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
      broadcastStateMaxRows: Long = 4000000L,
      // Dense-index kernels on the broadcast-state path (hub-free graphs;
      // see Hedonic.Config.indexedState): unweighted iterations broadcast
      // one PRE-DIVIDED rank/deg array per round (one read per edge
      // instead of two hash probes), weighted ones a rank array against a
      // once-broadcast strength array. Bitwise-identical sums.
      indexedState: Boolean = true,
      // Pack-shuffle partition count (None = session shuffle partitions);
      // see Hedonic.Config.packPartitions.
      packPartitions: Option[Int] = None,
      // Iteration-cache partition count (see Hedonic.Config.cachePartitions).
      cachePartitions: Option[Int] = None)

  def run(edges: Dataset[Edge], cfg: Config = Config(),
          verticesOpt: Option[DataFrame] = None): DataFrame =
    runTimed(edges, cfg, verticesOpt)._1

  /** run() plus per-iteration wall-clock millis, so benchmarks can report
    * setup (vertex/degree/adjacency build) and iteration throughput as
    * separate phases — the build is one-time and amortizes over
    * iterations; lumping it into the rate hides what actually scales.
    *
    * `packedOpt`: a caller-built CSR pack of the SYMMETRIZED edges (see
    * Hedonic.run — src- and dst-packs are identical on a symmetric edge
    * set), honored on the broadcast-state path. Pack once, run hedonic +
    * PageRank + LPA: the degree table is then derived from the cached
    * V-row pack (size(nbrs) / sum(wts)) instead of a second E-row
    * aggregate. Caller owns the pack's cache lifetime; its `weighted`
    * flag must match cfg.weighted. */
  def runTimed(edges: Dataset[Edge], cfg: Config = Config(),
          verticesOpt: Option[DataFrame] = None,
          packedOpt: Option[graft.graph.PackedAdj] = None): (DataFrame, Seq[Long]) = {
    // Round-6 setup dedup for the COMMON case (edge-derived vertex set, no
    // prebuilt pack): ONE E-row degree aggregate yields the vertex count
    // (the strategy decision), the pack build's segmentation degrees, and
    // the rank-degree table. The old path made three separate passes over
    // the symmetrized edges (a 2E-row vertices().distinct(), the build's
    // own degree aggregate, and the rank-degree aggregate).
    if (verticesOpt.isEmpty && packedOpt.isEmpty) {
      val spark = edges.sparkSession
      val symCols = if (cfg.weighted) Seq("src", "dst", "weight") else Seq("src", "dst")
      val symDf = GraphOps.symmetrize(edges).select(symCols.map(col): _*)
      val degAgg =
        (if (cfg.weighted)
          symDf.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"),
            sum(col("weight").cast("double")).as("deg"))
        else
          symDf.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))).persist()
      val v = degAgg.count().toDouble
      val deg =
        if (cfg.weighted) degAgg.select(col("id"), col("deg"))
        else degAgg.select(col("id"), col("d").cast("double").as("deg"))
      if (v <= cfg.broadcastStateMaxRows) {
        val packed = graft.graph.PackedAdjacency.build(symDf, "dst", cfg.weighted,
          deferCacheIfHubFree = cfg.indexedState, partitions = cfg.packPartitions,
          cachePartitions = cfg.cachePartitions,
          degOpt = Some(degAgg.select(col("id").as("dst"), col("d"))))
        val out = runDriverState(spark, packed, deg, v, cfg, ownsPack = true)
        packed.unpersist()
        degAgg.unpersist()
        return out
      }
      // over-budget V: co-partitioned shuffle path, no dangling (min deg 1)
      val out = runShuffle(edges, cfg, deg, v, mayDangle = false)
      degAgg.unpersist()
      return out
    }
    // With a prebuilt pack the vertex count comes off the cached V-row
    // pack (distinct over ids — multi-segment hubs repeat) instead of a
    // 2E-row distinct over the raw edges.
    val vertsOpt = packedOpt match {
      case Some(_) if verticesOpt.isEmpty => None
      case _ =>
        val vt = verticesOpt.getOrElse(GraphOps.vertices(edges)).select("id").persist()
        Some(vt)
    }
    val v = vertsOpt match {
      case Some(vt) => vt.count().toDouble
      case None     => packedOpt.get.df.select("id").distinct().count().toDouble
    }
    // Explicit vertex tables may contain dangling vertices, whose left-join
    // handling needs the co-partitioned path; broadcast-state covers the
    // engine's common case (edge-derived vertex set, min degree 1).
    val bcast = verticesOpt.isEmpty && v <= cfg.broadcastStateMaxRows

    if (bcast) {
      // Broadcast-state strategy iterates over the CSR-packed in-neighbor
      // lists (one build-time shuffle, then V-row iterations — see
      // PackedAdjacency / iterPlanPacked).
      packedOpt.foreach(p => require(p.weighted == cfg.weighted,
        s"prebuilt pack weighted=${p.weighted} but cfg.weighted=${cfg.weighted}"))
      val (packed, deg) = packedOpt match {
        case Some(p) =>
          // Degrees off the cached V-row pack (multi-segment hub vertices
          // contribute one row per segment, hence the groupBy).
          val d =
            if (cfg.weighted)
              p.df.groupBy(col("id")).agg(
                sum(aggregate(col("wts"), lit(0.0),
                  (acc, x) => acc + x)).as("deg"))
            else
              p.df.groupBy(col("id")).agg(
                sum(size(col("nbrs"))).cast("double").as("deg"))
          (p, d)
        case None =>
          val symCols = if (cfg.weighted) Seq("src", "dst", "weight") else Seq("src", "dst")
          val symDf = GraphOps.symmetrize(edges).select(symCols.map(col): _*)
          val d =
            if (cfg.weighted)
              symDf.groupBy(col("src").as("id")).agg(sum(col("weight").cast("double")).as("deg"))
            else
              symDf.groupBy(col("src").as("id")).agg(count(lit(1)).cast("double").as("deg"))
          (graft.graph.PackedAdjacency.build(symDf, "dst", cfg.weighted,
            deferCacheIfHubFree = cfg.indexedState, partitions = cfg.packPartitions,
            cachePartitions = cfg.cachePartitions), d)
      }
      val out = runDriverState(edges.sparkSession, packed, deg, v, cfg,
        ownsPack = packedOpt.isEmpty)
      if (packedOpt.isEmpty) packed.unpersist()
      vertsOpt.foreach(_.unpersist())
      return out
    }
    // Over-budget V with a prebuilt pack: the shuffle path ignores the
    // pack, so the vertex table is derived here after all.
    val verts = vertsOpt.getOrElse {
      val vt = GraphOps.vertices(edges).select("id").persist(); vt.count(); vt
    }
    val symForDeg = GraphOps.symmetrize(edges)
    val deg =
      if (cfg.weighted)
        symForDeg.groupBy(col("src").as("id"))
          .agg(sum(col("weight").cast("double")).as("deg"))
      else
        symForDeg.groupBy(col("src").as("id"))
          .agg(count(lit(1)).cast("double").as("deg"))
    // edge-derived vertex sets have min degree 1 by construction — the
    // dangling machinery only wakes up for explicit vertex tables.
    val vdegIn = verts.join(deg, Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0.0)).as("deg"))
    val out = runShuffle(edges, cfg, vdegIn, v, mayDangle = verticesOpt.isDefined)
    verts.unpersist()
    out
  }

  /** Co-partitioned shuffle loop (over-budget V or explicit vertex table).
    * `vdegIn` is the (id, deg) table — precomputed by the caller so the
    * common path shares one degree aggregate across setup consumers. */
  private def runShuffle(edges: Dataset[Edge], cfg: Config, vdegIn: DataFrame,
      v: Double, mayDangle: Boolean): (DataFrame, Seq[Long]) = {
    val iterMs = scala.collection.mutable.ArrayBuffer.empty[Long]
    // Shuffle path: cached pre-partitioned on src (the join key); only the
    // V-row rank side re-exchanges per iteration.
    val sym = GraphOps.pinnedSym(edges, "src", cfg.weighted, sorted = true)
    val vdeg = vdegIn.persist()
    vdeg.count()

    var ranks = vdeg.select(col("id"), lit(1.0 / v).as("rank"), col("deg"))
      .transform(Iterate.pin)
    var prevPin: Option[Iterate.Pinned] = None
    var iter = 0
    var done = false
    val nIter = cfg.fixedIter.getOrElse(cfg.maxIter)
    while (!done && iter < nIter) {
      val t0 = System.nanoTime()
      val dangling =
        if (mayDangle)
          ranks.filter(col("deg") === 0.0)
            .agg(coalesce(sum("rank"), lit(0.0))).collect()(0).getDouble(0)
        else 0.0
      val plan = iterPlan(sym, ranks, vdeg, v, dangling,
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
      iterMs += (System.nanoTime() - t0) / 1000000
      iter += 1
    }
    sym.unpersist(); vdeg.unpersist()
    (ranks.select("id", "rank"), iterMs.toSeq)
  }

  /** Broadcast-strategy loop with DRIVER-RESIDENT ranks (V fits the
    * broadcast budget, hence the driver). The iteration plan is built
    * ONCE over mutable Ref cells (rank map per round; degree map set
    * once — degrees never change) and re-collected every round
    * (StateMap.Ref): no per-round planning, codegen, or broadcast
    * churn. An iteration is exactly ONE single-stage job: packed-
    * adjacency scan, per-vertex contribution kernel, V-row collect;
    * nothing is pinned. The rank update stays IN-PLAN,
    * same arithmetic shape as the shuffle path's expression (rank/deg per
    * contribution row); only the tol-mode |delta| sum moves to the driver
    * (same values, different summation order — a stopping heuristic, not a
    * result). No dangling term: this path requires an edge-derived vertex
    * set (min degree 1). */
  private def runDriverState(spark: org.apache.spark.sql.SparkSession,
      packed: graft.graph.PackedAdj, deg: DataFrame, v: Double,
      cfg: Config, ownsPack: Boolean = true): (DataFrame, Seq[Long]) = {
    import spark.implicits._
    val iterMs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val vd = deg.collect()
    val n = vd.length
    val ids = new Array[Long](n)
    val degs = new Array[Double](n)
    val idx = new scala.collection.mutable.LongMap[Int](n * 2)
    var i = 0
    while (i < n) {
      ids(i) = vd(i).getLong(0); degs(i) = vd(i).getDouble(1)
      idx(ids(i)) = i; i += 1
    }
    // Plan built once; the rank Ref carries a per-round broadcast handle,
    // the degree broadcast is set once — degrees never change (see
    // StateMap.Ref and Hedonic.runDriverState).
    import graft.util.StateMap
    val sc = spark.sparkContext
    // Dense-index path (hub-free graphs): remap neighbors to state-array
    // positions once; per round broadcast ONE bare double[] — pre-divided
    // rank/deg when unweighted (kernel: one read per edge), rank alone when
    // weighted (strength array broadcast once). Hash path kept for hub
    // graphs and the scaling A/B (Config.indexedState).
    val useIdx = cfg.indexedState && packed.maxSegs == 1
    val qR = new StateMap.Ref[org.apache.spark.broadcast.Broadcast[Array[Double]]](null)
    val degArrROpt =
      if (useIdx && cfg.weighted) Some(new StateMap.Ref(sc.broadcast(degs.clone())))
      else None
    val degR = new StateMap.Ref[org.apache.spark.broadcast.Broadcast[
      StateMap.LongDoubleMap]](
      if (useIdx) null else sc.broadcast(StateMap.longDouble(ids, degs, n)))
    val rankR = new StateMap.Ref[org.apache.spark.broadcast.Broadcast[
      StateMap.LongDoubleMap]](null)
    val pidxOpt =
      if (useIdx) {
        val idxB = sc.broadcast(StateMap.longLong(ids, Array.tabulate(n)(_.toLong), n))
        val pidx = graft.graph.PackedAdjacency.reindex(packed, idxB)
        idxB.unpersist()
        // shared packs stay cached for the caller's other algorithms
        if (ownsPack) packed.unpersist()
        Some(pidx)
      } else None
    val iterDf = pidxOpt match {
      case Some(pidx) => iterPlanPackedIdx(pidx, qR, degArrROpt, v, cfg, emitPos = true)
      case None       => iterPlanPacked(packed, rankR, degR, v, cfg)
    }
    // Indexed path: V rows come back per iteration — collect them as
    // per-partition PRIMITIVE (position, rank) arrays straight off the
    // codegen'd InternalRow iterator instead of boxed Rows (the Row
    // decode is driver-serial and does not shrink with cluster size).
    // Built once; each collect() re-serializes the closure so the
    // Ref-carried broadcast handles are fresh per round.
    val fastRdd =
      if (useIdx) Some(iterDf.queryExecution.toRdd.mapPartitions { it =>
        val pb = new scala.collection.mutable.ArrayBuilder.ofInt
        val rb = new scala.collection.mutable.ArrayBuilder.ofDouble
        while (it.hasNext) {
          val r = it.next()
          pb += r.getInt(0); rb += r.getDouble(1)
        }
        Iterator.single((pb.result(), rb.result()))
      })
      else None
    var ranks = Array.fill(n)(1.0 / v)
    val nIter = cfg.fixedIter.getOrElse(cfg.maxIter)
    val timing = sys.env.get("SPARK_GRAFT_STEP_TIMING").exists(_.toBoolean)
    var iter = 0
    var done = false
    while (!done && iter < nIter) {
      val t0 = System.nanoTime()
      if (useIdx) {
        val q =
          if (cfg.weighted) ranks.clone()
          else {
            // same IEEE division the hash kernel did per edge — bitwise-
            // identical contributions, computed once per vertex instead.
            val a = new Array[Double](n)
            var z = 0
            while (z < n) { a(z) = ranks(z) / degs(z); z += 1 }
            a
          }
        qR.value = sc.broadcast(q)
      } else rankR.value = sc.broadcast(StateMap.longDouble(ids, ranks, n))
      val tLocal = System.nanoTime()
      val next = ranks.clone() // min-degree-1: every vertex receives a row
      var delta = 0.0
      var nRows = 0L
      var tJob = 0L
      fastRdd match {
        case Some(rdd) =>
          val parts = rdd.collect()
          qR.value.destroy()
          tJob = System.nanoTime()
          var p = 0
          while (p < parts.length) {
            val (pos, rs) = parts(p)
            nRows += pos.length
            var k = 0
            while (k < pos.length) {
              val at = pos(k)
              delta += math.abs(rs(k) - ranks(at))
              next(at) = rs(k)
              k += 1
            }
            p += 1
          }
        case None =>
          val rows = iterDf.collect()
          rankR.value.destroy()
          tJob = System.nanoTime()
          nRows = rows.length
          var k = 0
          while (k < rows.length) {
            val at = idx(rows(k).getLong(0))
            val nr = rows(k).getDouble(1)
            delta += math.abs(nr - ranks(at))
            next(at) = nr
            k += 1
          }
      }
      ranks = next
      if (timing) System.err.println(
        f"prIterTiming it=$iter local=${(tLocal - t0) / 1e6}%.0f " +
        f"job=${(tJob - tLocal) / 1e6}%.0f " +
        f"merge=${(System.nanoTime() - tJob) / 1e6}%.0f rows=$nRows")
      if (cfg.fixedIter.isEmpty) done = delta < cfg.tol
      iterMs += (System.nanoTime() - t0) / 1000000
      iter += 1
    }
    if (degR.value != null) degR.value.destroy()
    degArrROpt.foreach(_.value.destroy())
    pidxOpt.foreach(_.unpersist())
    ((0 until n).map(k => (ids(k), ranks(k))).toDF("id", "rank"), iterMs.toSeq)
  }

  /** One co-partitioned-shuffle iteration's (unpinned) next-state plan —
    * exposed so StrategySpec can inspect the physical shape. */
  private[graft] def iterPlan(sym: DataFrame, ranks: DataFrame, vdeg: DataFrame,
      v: Double, dangling: Double, withDelta: Boolean,
      cfg: Config): DataFrame = {
    val contribCol =
      if (cfg.weighted) col("rank") * col("weight") / col("deg")
      else col("rank") / col("deg")
    val rankSide = ranks.filter(col("deg") > 0.0)
      .select(col("id").as("src"), col("rank"), col("deg"))
    val contribs = sym
      .join(rankSide, Seq("src"))
      .select(col("dst"), contribCol.as("c"))
      .groupBy(col("dst").as("id")).agg(sum("c").as("s"))
    val newRank =
      lit((1.0 - cfg.damping) / v) +
        lit(cfg.damping) * (coalesce(col("s"), lit(0.0)) + lit(dangling / v))
    val base = vdeg.join(contribs, Seq("id"), "left")
    if (withDelta) {
      val oldSide = ranks.select(col("id"), col("rank").as("old"))
      base.join(oldSide, Seq("id"))
        .select(col("id"), newRank.as("rank"), col("deg"),
          abs(newRank - col("old")).as("delta"))
    } else base.select(col("id"), newRank.as("rank"), col("deg"))
  }

  /** The driver-state iteration's plan over broadcast rank/degree maps —
    * exposed so StrategySpec can assert it stays free of shuffle
    * exchanges. Same per-row arithmetic shape as iterPlan (rank/deg, or
    * rank*weight/deg when weighted) so results agree with the shuffle path
    * to summation order. The isNotNull filter mirrors the inner join's
    * drop of src outside the rank state (never hit for edge-derived
    * vertex sets, where deg covers every src). */
  private[graft] def iterPlanMap(sym: DataFrame,
      rankOf: graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[graft.util.StateMap.LongDoubleMap]],
      degOf: graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[graft.util.StateMap.LongDoubleMap]],
      v: Double, cfg: Config): DataFrame = {
    import graft.util.StateMap
    val rank = StateMap.lookup(rankOf, col("src"))
    val dg = StateMap.lookup(degOf, col("src"))
    val contribCol =
      if (cfg.weighted) rank * col("weight") / dg
      else rank / dg
    val newRank =
      lit((1.0 - cfg.damping) / v) +
        lit(cfg.damping) * (coalesce(col("s"), lit(0.0)) + lit(0.0))
    sym
      .select(col("dst"), contribCol.as("c"))
      .filter(col("c").isNotNull)
      .groupBy(col("dst").as("id")).agg(sum("c").as("s"))
      .select(col("id"), newRank.as("rank"))
  }

  /** CSR-packed iteration plan (the production broadcast-state path): a
    * V-row scan of the packed in-neighbor lists where a codegen'd kernel
    * (PackedKernels.prContrib) sums rank(u)/deg(u) over each vertex's
    * in-neighbors in one pass — no aggregate operator at all unless the
    * build saw hub vertices (maxSegs > 1), in which case per-segment
    * partial sums are combined by a regular V-row aggregate. Same per-
    * contribution arithmetic as iterPlan/iterPlanMap; per-vertex
    * accumulation order is the sorted neighbor array (deterministic across
    * runs). */
  private[graft] def iterPlanPacked(packed: graft.graph.PackedAdj,
      rankOf: graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[graft.util.StateMap.LongDoubleMap]],
      degOf: graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[graft.util.StateMap.LongDoubleMap]],
      v: Double, cfg: Config): DataFrame = {
    val newRank =
      lit((1.0 - cfg.damping) / v) +
        lit(cfg.damping) * (coalesce(col("s"), lit(0.0)) + lit(0.0))
    val wcol = if (packed.weighted) Some(col("wts")) else None
    val contrib = packed.df
      .select(col("id"), PackedKernels.prContrib(col("nbrs"), wcol, rankOf, degOf).as("c"))
      .filter(col("c").isNotNull)
    val s =
      if (packed.maxSegs > 1) contrib.groupBy("id").agg(sum("c").as("s"))
      else contrib.withColumnRenamed("c", "s")
    s.select(col("id"), newRank.as("rank"))
  }

  /** Dense-index iteration plan (hub-free production path; see
    * PackedKernels.kContribIdx). No hub branch — reindex requires
    * maxSegs == 1. */
  private[graft] def iterPlanPackedIdx(pidx: graft.graph.PackedIdxAdj,
      qR: graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[Array[Double]]],
      degArrR: Option[graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[Array[Double]]]],
      v: Double, cfg: Config, emitPos: Boolean = false): DataFrame = {
    val newRank =
      lit((1.0 - cfg.damping) / v) +
        lit(cfg.damping) * (coalesce(col("s"), lit(0.0)) + lit(0.0))
    val wcol = if (pidx.weighted) Some(col("wts")) else None
    // emitPos: the driver-state loop keys its merge on the dense state
    // POSITION (myIdx) — no id->index probe, primitive-array collect.
    pidx.df
      .select(col("id"), col("myIdx"),
        PackedKernels.prContribIdx(col("nbrs"), wcol, qR, degArrR).as("s"))
      .filter(col("s").isNotNull)
      .select(if (emitPos) col("myIdx") else col("id"), newRank.as("rank"))
  }

  /** Top-k vertices by rank (SURVEY.md §2.6 addition). */
  def topK(ranks: DataFrame, k: Int): DataFrame =
    ranks.orderBy(desc("rank"), asc("id")).limit(k)
}
