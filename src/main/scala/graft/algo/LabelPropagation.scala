package graft.algo

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Edge
import graft.graph.GraphOps
import graft.io.Iterate

/** Label propagation — north-rule addition N3. One synchronous step IS the
  * reference's `community_onepass_improvement` (hedonic/__init__.py:266-280,
  * operator M3/A18): each node adopts the majority label among its
  * neighbors; iterated to convergence here.
  *
  * Tie-break: the reference's is Python-set iteration order (unspecified,
  * hedonic/__init__.py:273); the engine canonicalizes to highest count, then
  * SMALLEST label — deterministic (documented divergence, SURVEY.md §7.4.2).
  *
  * Oscillation: synchronous LPA two-colors bipartite-ish graphs. Standard
  * fix applied: hash-parity gating — only nodes passing the portable md5
  * parity gate (graft.util.Portable.parityGate; DuckDB-replicable, so
  * q_lpa_full is oracled end to end) may change each round. Convergence = a
  * superstep where no node (gated or not) would change.
  *
  * Cost model: ONE job per iteration on both strategies. Broadcast-state
  * (small V): labels live in DRIVER arrays between rounds and re-enter the
  * plan as a broadcast id -> label primitive map read through codegen'd
  * lookups (graft.util.StateMap); the single-stage job ends in a
  * changer-row collect and nothing is pinned (see Hedonic.runDriverState
  * for the rationale and the measured serial-cost motivation). Shuffle path: the
  * new labels are pinned while the would-change counter rides the
  * materialization pass as an accumulator (Iterate.pinSums); the previous
  * round's cache is released immediately.
  */
object LabelPropagation {

  /** One synchronous step from `labels(id, label)`; returns new labels with
    * a `wants` column (true when the majority label differs from current).
    * `weighted = true` weighs each neighbor vote by edge weight (`sym` must
    * carry a `weight` column). `bcastState = true` broadcasts the V-row
    * label side into the gather — with `sym` cached pre-partitioned on src
    * (the grouping key) the whole step then runs exchange-free on the
    * cached layout (see Hedonic.stepPlanMap for the strategy rationale). */
  def step(sym: DataFrame, labels: DataFrame, weighted: Boolean = false,
           bcastState: Boolean = false): DataFrame = {
    val labSide = labels.select(col("id").as("dst"), col("label").as("nbrLabel"))
    val nbrLabels = sym.join(
      if (bcastState) broadcast(labSide) else labSide, Seq("dst"))
    val vote = if (weighted) sum(col("weight").cast("double")) else count(lit(1)).cast("double")
    val counts = nbrLabels.groupBy(col("src").as("id"), col("nbrLabel"))
      .agg(vote.as("cnt"))
    val best = counts.groupBy("id").agg(
      max(struct(col("cnt"), (-col("nbrLabel")).as("neg"), col("nbrLabel").as("lab"))).as("b"))
    labels.join(if (bcastState) broadcast(best) else best, Seq("id"), "left")
      .select(col("id"), col("label"),
        coalesce(col("b.lab"), col("label")).as("bestLabel"))
      .withColumn("wants", col("bestLabel") =!= col("label"))
  }

  /** `packedOpt`: a caller-built CSR pack of the symmetrized edges (see
    * Hedonic.run — pack once, run hedonic + PageRank + LPA), honored on
    * the broadcast-state path; caller owns the cache lifetime and the
    * `weighted` flags must match. */
  def run(edges: Dataset[Edge], initOpt: Option[DataFrame] = None,
          maxIter: Int = 30, parityGating: Boolean = true,
          weighted: Boolean = false,
          broadcastStateMaxRows: Long = 4000000L,
          indexedState: Boolean = true,
          packedOpt: Option[graft.graph.PackedAdj] = None): DataFrame = {
    val init = initOpt
      .map(_.select(col("id"), col("label")))
      .getOrElse(GraphOps.vertices(edges).select(col("id"), col("id").as("label")))
    // one capped materialization = strategy decision + driver-state collect
    // (see Hedonic.run)
    val cap = math.min(broadcastStateMaxRows, Int.MaxValue - 2L).toInt
    val initCap = init.limit(cap + 1).collect()
    val bcast = initCap.length <= broadcastStateMaxRows
    if (bcast) {
      // Broadcast-state strategy iterates over the CSR-packed adjacency
      // (see PackedAdjacency / stepPlanPacked).
      packedOpt.foreach(p => require(p.weighted == weighted,
        s"prebuilt pack weighted=${p.weighted} but weighted=$weighted"))
      val packed = packedOpt.getOrElse {
        val symCols = if (weighted) Seq("src", "dst", "weight") else Seq("src", "dst")
        val symDf = GraphOps.symmetrize(edges).select(symCols.map(col): _*)
        graft.graph.PackedAdjacency.build(symDf, "src", weighted,
          deferCacheIfHubFree = indexedState)
      }
      return runDriverState(edges.sparkSession, packed, initCap, maxIter,
        parityGating, weighted, indexedState, ownsPack = packedOpt.isEmpty)
    }
    // Shuffle path: cached pre-partitioned on dst (the join key); only the
    // V-row label side re-exchanges per round.
    val sym = GraphOps.pinnedSym(edges, "dst", weighted, sorted = true)

    var labels = Iterate.pin(init)
    var prevPin: Option[Iterate.Pinned] = None
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val stepped = step(sym, labels, weighted, bcastState = false)
      val gate =
        if (parityGating) graft.util.Portable.parityGate(col("id"), iter)
        else lit(true)
      val next = stepped
        .select(col("id"),
          when(col("wants") && gate, col("bestLabel")).otherwise(col("label")).as("label"),
          col("wants"))
      val pinned = Iterate.pinSums(next, Seq("wants"))
      done = pinned.sums(0) == 0.0
      labels = pinned.df.select("id", "label")
      prevPin.foreach(_.release())
      prevPin = Some(pinned)
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** One-shot majority vote (the q_lpa1 / q_wlpa1 shape) with the same
    * scale-gated strategy split as run(): a label state within the
    * broadcast budget executes stepPlanMap straight over the symmetrized
    * rows — state enters as a broadcast primitive map, so the E-row
    * gather JOIN of step() (and the pack build run() would pay — measured
    * a net loss for one step in the first round-6 session) both
    * disappear; only changer rows come back and the driver merge keeps
    * everyone else's label. Larger states fall back to the plan-side
    * step(). Output (id, bestLabel) per label row — value-identical to
    * step(sym, labels, weighted).select(id, bestLabel) (StrategySpec). */
  def bestLabels(sym: DataFrame, labels: DataFrame, weighted: Boolean = false,
                 broadcastStateMaxRows: Long = 4000000L): DataFrame = {
    val spark = labels.sparkSession
    val cap = math.min(broadcastStateMaxRows, Int.MaxValue - 2L).toInt
    val lab0 = labels.select("id", "label").limit(cap + 1).collect()
    if (lab0.length > broadcastStateMaxRows)
      return step(sym, labels, weighted).select(col("id"), col("bestLabel"))
    import graft.util.StateMap
    val n = lab0.length
    val ids = new Array[Long](n)
    val labs = new Array[Long](n)
    val idx = new scala.collection.mutable.LongMap[Int](n * 2)
    var i = 0
    while (i < n) {
      ids(i) = lab0(i).getLong(0); labs(i) = lab0(i).getLong(1)
      idx(ids(i)) = i; i += 1
    }
    val sc = spark.sparkContext
    val labB = sc.broadcast(StateMap.longLong(ids, labs, n))
    val rows = stepPlanMap(sym, new StateMap.Ref(labB), weighted, lit(true)).collect()
    labB.destroy()
    var k = 0
    while (k < rows.length) {
      val r = rows(k)
      idx.get(r.getLong(0)).foreach(at => labs(at) = r.getLong(1))
      k += 1
    }
    // same parallelize shape as the driver-state loops' stateDF (no
    // LocalRelation — see Hedonic.runDriverState)
    val idsL = ids; val labsL = labs
    val slices = math.max(1, math.min(sc.defaultParallelism, n / 65536 + 1))
    val rdd = sc.parallelize(0 until n, slices)
      .map(j => org.apache.spark.sql.Row(idsL(j), labsL(j)))
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("bestLabel",
        org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** The driver-state iteration's plan over a broadcast id -> label map
    * (graft.util.StateMap lookup expressions — see Hedonic.stepPlanMap for
    * why this beats LocalRelation + broadcast join): gather votes over the
    * cached layout, per-node argmax, gate evaluated in-plan (portable md5
    * parity — DuckDB-replicable). One single-stage job, zero exchanges.
    * Only CHANGER rows (majority label differs from current) are returned
    * — non-changers change nothing and are counted nowhere, mirroring the
    * old driver merge's `best != labs(at)` guard; the isNotNull filters
    * mirror the inner join's drop of dst/id outside the label state. */
  private[graft] def stepPlanMap(sym: DataFrame,
      labOf: graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[graft.util.StateMap.LongLongMap]],
      weighted: Boolean, gate: org.apache.spark.sql.Column): DataFrame = {
    import graft.util.StateMap
    val vote = if (weighted) sum(col("weight").cast("double")) else count(lit(1)).cast("double")
    val votes = sym
      .select(col("src").as("id"), StateMap.lookup(labOf, col("dst")).as("nbrLabel"),
        (if (weighted) col("weight") else lit(1L)).as("weight"))
      .filter(col("nbrLabel").isNotNull)
      .groupBy("id", "nbrLabel")
      .agg(vote.as("cnt"))
    decideFromVotes(votes, labOf)
      .select(col("id"), col("bestLabel"), gate.as("g"))
  }

  /** Shared decide tail over per-(id, label) vote sums: canonical argmax
    * (count desc, smallest label) + changed-only filter. Feeds both the
    * row-based stepPlanMap and stepPlanPacked's multi-segment (hub)
    * branch. */
  private[graft] def decideFromVotes(votes: DataFrame,
      labOf: graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[graft.util.StateMap.LongLongMap]])
      : DataFrame = {
    import graft.util.StateMap
    votes
      .groupBy("id").agg(
        max(struct(col("cnt"), (-col("nbrLabel")).as("neg"), col("nbrLabel").as("lab"))).as("b"))
      .withColumn("cur", StateMap.lookup(labOf, col("id")))
      .filter(col("cur").isNotNull && col("b.lab") =!= col("cur"))
      .select(col("id"), col("b.lab").as("bestLabel"))
  }

  /** CSR-packed step plan (the production broadcast-state path): a V-row
    * scan of the packed adjacency where a codegen'd per-vertex kernel
    * (PackedKernels.labelDecide) tallies neighbor labels and argmaxes in
    * one pass — no aggregate operator on the common path. Multi-segment
    * (hub) vertices flow through per-segment partial votes + a regular sum
    * into the shared decide tail; the branch is elided when the build saw
    * no hubs. Decision-identical to stepPlanMap (PackedSpec). */
  private[graft] def stepPlanPacked(packed: graft.graph.PackedAdj,
      labOf: graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[graft.util.StateMap.LongLongMap]],
      gate: org.apache.spark.sql.Column): DataFrame = {
    val wcol = if (packed.weighted) Some(col("wts")) else None
    val dec1 = packed.df.filter(col("nsegs") === 1)
      .select(col("id"),
        PackedKernels.labelDecide(col("id"), col("nbrs"), wcol, labOf).as("bestLabel"))
      .filter(col("bestLabel").isNotNull)
    val dec =
      if (packed.maxSegs > 1) {
        val votes = packed.df.filter(col("nsegs") > 1)
          .select(col("id"), explode(PackedKernels.labelVotes(col("nbrs"), wcol, labOf)).as("lv"))
          .select(col("id"), col("lv.nbrLabel").as("nbrLabel"), col("lv.cnt").as("cnt"))
          .groupBy("id", "nbrLabel").agg(sum("cnt").as("cnt"))
        dec1.unionByName(decideFromVotes(votes, labOf))
      } else dec1
    dec.select(col("id"), col("bestLabel"), gate.as("g"))
  }

  /** Broadcast-strategy loop with DRIVER-RESIDENT labels; exactly one
    * Spark job (ending in a V-row collect) per iteration. Decision
    * semantics identical to the shuffle loop: `wants` = majority label
    * differs (counted BEFORE gating, so convergence is gate-independent);
    * a node absent from the vote table keeps its label. */
  /** Dense-index step plan (hub-free production path; see
    * Hedonic.stepPlanPackedIdx). */
  private[graft] def stepPlanPackedIdx(pidx: graft.graph.PackedIdxAdj,
      labArr: graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[Array[Long]]],
      gate: org.apache.spark.sql.Column): DataFrame = {
    val wcol = if (pidx.weighted) Some(col("wts")) else None
    pidx.df
      .select(col("id"),
        PackedKernels.labelDecideIdx(col("myIdx"), col("nbrs"), wcol, labArr)
          .as("bestLabel"))
      .filter(col("bestLabel").isNotNull)
      .select(col("id"), col("bestLabel"), gate.as("g"))
  }

  /** Delta-transport twin (see Hedonic.stepPlanPackedIdxDelta /
    * DeltaState): labels ride the Payload's comms lane; decisions use the
    * same kLabelIdx tail, so results are identical (PackedSpec pins). */
  private[graft] def stepPlanPackedIdxDelta(pidx: graft.graph.PackedIdxAdj,
      stateR: graft.util.StateMap.Ref[org.apache.spark.broadcast.Broadcast[graft.util.DeltaState.Payload]],
      gate: org.apache.spark.sql.Column): DataFrame = {
    val wcol = if (pidx.weighted) Some(col("wts")) else None
    pidx.df
      .select(col("id"),
        PackedKernels.labelDecideIdxDelta(col("myIdx"), col("nbrs"), wcol, stateR)
          .as("bestLabel"))
      .filter(col("bestLabel").isNotNull)
      .select(col("id"), col("bestLabel"), gate.as("g"))
  }

  private def runDriverState(spark: org.apache.spark.sql.SparkSession,
      packed: graft.graph.PackedAdj, init0: Array[org.apache.spark.sql.Row],
      maxIter: Int, parityGating: Boolean, weighted: Boolean,
      indexedState: Boolean = true, ownsPack: Boolean = true): DataFrame = {
    import spark.implicits._
    val n = init0.length
    val ids = new Array[Long](n)
    val labs = new Array[Long](n)
    val idx = new scala.collection.mutable.LongMap[Int](n * 2)
    var i = 0
    while (i < n) {
      ids(i) = init0(i).getLong(0); labs(i) = init0(i).getLong(1)
      idx(ids(i)) = i; i += 1
    }
    // Plan built once; Refs carry per-round broadcast handles (see
    // StateMap.Ref and Hedonic.runDriverState).
    import graft.util.StateMap
    val sc = spark.sparkContext
    val labR = new StateMap.Ref[org.apache.spark.broadcast.Broadcast[
      StateMap.LongLongMap]](null)
    val roundR = new StateMap.Ref[Integer](Integer.valueOf(0))
    val gate =
      if (parityGating) graft.util.Portable.parityGate(col("id"), StateMap.intRef(roundR))
      else lit(true)
    // Dense-index path (hub-free graphs; see Hedonic.runDriverState).
    val useIdx = indexedState && packed.maxSegs == 1
    val pidxOpt =
      if (useIdx) {
        val idxB = sc.broadcast(StateMap.longLong(ids, Array.tabulate(n)(_.toLong), n))
        val pidx = graft.graph.PackedAdjacency.reindex(packed, idxB)
        idxB.unpersist()
        // shared packs stay cached for the caller's other algorithms
        if (ownsPack) packed.unpersist()
        Some(pidx)
      } else None
    // Delta transport (indexed path; labels in the Payload's comms lane,
    // size lane empty) — see DeltaState and Hedonic.runDriverState.
    val stateR = new StateMap.Ref[org.apache.spark.broadcast.Broadcast[
      graft.util.DeltaState.Payload]](null)
    val stepDf = pidxOpt match {
      case Some(pidx) => stepPlanPackedIdxDelta(pidx, stateR, gate)
      case None       => stepPlanPacked(packed, labR, gate)
    }
    val runId = graft.util.DeltaState.newRunId()
    var baseBcast: org.apache.spark.broadcast.Broadcast[
      graft.util.DeltaState.FullState] = null
    var baseEpoch = 0
    val cumPos = new scala.collection.mutable.LongMap[Long]() // pos -> label
    val emptyL = Array.empty[Long]
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      if (useIdx) {
        if (baseBcast == null || cumPos.size > n / 4) {
          val nb = sc.broadcast(new graft.util.DeltaState.FullState(
            labs.clone(), emptyL, emptyL))
          if (baseBcast != null) baseBcast.destroy()
          baseBcast = nb; baseEpoch = iter; cumPos.clear()
        }
        val dp = new Array[Int](cumPos.size)
        val dc = new Array[Long](cumPos.size)
        var j = 0
        cumPos.foreachEntry { (p, c) => dp(j) = p.toInt; dc(j) = c; j += 1 }
        stateR.value = sc.broadcast(new graft.util.DeltaState.Payload(
          runId, iter, baseEpoch, baseBcast, dp, dc, emptyL, emptyL))
      } else labR.value = sc.broadcast(StateMap.longLong(ids, labs, n))
      roundR.value = Integer.valueOf(iter)
      val rows = stepDf.collect()
      if (useIdx) stateR.value.destroy() else labR.value.destroy()
      // Every collected row is a changer (best != current, filtered
      // in-plan) — identical counters and state to the old full collect.
      var wanted = 0L
      var k = 0
      while (k < rows.length) {
        val r = rows(k)
        idx.get(r.getLong(0)) match {
          case Some(at) =>
            wanted += 1
            if (r.getBoolean(2)) {
              labs(at) = r.getLong(1)
              if (useIdx) cumPos(at.toLong) = r.getLong(1)
            }
          case None => ()
        }
        k += 1
      }
      done = wanted == 0L
      iter += 1
    }
    if (baseBcast != null) baseBcast.destroy()
    pidxOpt match {
      case Some(pidx) => pidx.unpersist()
      case None       => if (ownsPack) packed.unpersist()
    }
    (0 until n).map(k => (ids(k), labs(k))).toDF("id", "label")
  }
}
