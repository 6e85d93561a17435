package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Harness-side operators the reference scatters across its experiment
  * scripts (SURVEY.md §2.6-2.8: O2, O4, U3, F6, A19). Each is small by
  * design — they exist so a reference user finds every workflow op in the
  * engine, not because they are algorithmically deep.
  */
object Harness {

  /** O2 percentage slicing of a sorted work list (reference
    * real_nets.py:147-164: first/last/ignore_* percent of the
    * path-sorted experiment shards). Keeps rows with fractional rank in
    * [fromPct, toPct) under the given ordering.
    *
    * Ranked WITHOUT a global sort (the round-3 version's bare
    * `Window.orderBy` pulled the whole table through one WindowExec
    * task — the anti-pattern `denseVertexIds`/`readCommunitiesPerLine`
    * already purged): range-repartition on the order keys, rank within
    * each (already range-ordered) partition, add driver-side cumulative
    * partition offsets. One tiny count-by-partition job; every task
    * sorts only its slice. */
  def slicePct(df: DataFrame, orderCols: Seq[String],
               fromPct: Double, toPct: Double, nBuckets: Int = 256): DataFrame = {
    require(fromPct >= 0 && toPct <= 1 && fromPct <= toPct)
    val n = df.count()
    val lo = (fromPct * n).toLong
    val hi = (toPct * n).toLong
    val ranged = df.repartitionByRange(nBuckets, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nBuckets).scanLeft(0L) {
      case (acc, p) => acc + counts.getOrElse(p, 0L)
    }.toArray
    val offsetCol = element_at(
      array(offsets.take(nBuckets).map(lit(_)): _*), col("__pid") + 1)
    val rk = offsetCol +
      row_number().over(Window.partitionBy(col("__pid"))
        .orderBy(orderCols.map(col): _*)).cast("long") - 1
    ranged.withColumn("__rk", rk)
      .filter(col("__rk") >= lo && col("__rk") < hi)
      .drop("__rk", "__pid")
  }

  /** O4 deterministic subsample of k rows (reference plot_figures.py:396-397
    * samples 10k before KDE): portable-hash-ordered head — stable under
    * repartitioning, unlike df.sample.
    *
    * The hash order makes the global sort free to avoid: bucket = top 8
    * bits of the u32 hash IS the range partitioning of the ordering, so
    * rank-within-bucket + driver bucket offsets (the denseVertexIds
    * shape) replaces round 3's single-task `Window.orderBy(__h, ...)`.
    * Buckets past the k-th ranked row are filtered before their sort. */
  def sampleDeterministic(df: DataFrame, k: Int, keyCols: Seq[String]): DataFrame = {
    val nBuckets = 256
    val h = graft.util.Portable.u32(
      graft.util.Portable.key((lit("smp") +: keyCols.map(col)): _*))
    val hashed = df.withColumn("__h", h)
      .withColumn("__b", shiftright(col("__h"), 24).cast("int"))
    val counts = hashed.groupBy("__b").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until nBuckets).scanLeft(0L) {
      case (acc, b) => acc + counts.getOrElse(b, 0L)
    }.toArray
    // First bucket whose offset already reaches k: later buckets cannot
    // contribute to the top-k head — drop them before the window sorts.
    val lastBucket = offsets.indexWhere(_ >= k.toLong) match {
      case -1 => nBuckets - 1
      case i  => math.min(i, nBuckets - 1)
    }
    val offsetCol = element_at(
      array(offsets.take(nBuckets).map(lit(_)): _*), col("__b") + 1)
    val rk = offsetCol +
      row_number().over(Window.partitionBy(col("__b"))
        .orderBy((col("__h") +: keyCols.map(col)): _*)).cast("long")
    hashed.filter(col("__b") <= lastBucket)
      .withColumn("__rk", rk)
      .filter(col("__rk") <= k.toLong)
      .drop("__h", "__b", "__rk")
  }

  /** U3 canonical partition key (reference exp.py:82,97-99 dedups repeated
    * stochastic runs by partition tuple): label-permutation-invariant
    * signature of a membership — each community is renamed to its minimum
    * member id, then the sorted (id, canonicalLabel) list is hashed. Two
    * memberships get equal keys iff they are the same partition up to label
    * permutation. One row: (partition_key). */
  def canonicalPartitionKey(members: DataFrame): DataFrame = {
    val canon = members
      .withColumn("clabel", min(col("id")).over(Window.partitionBy(col("community"))))
      .select(col("id"), col("clabel"))
    canon.orderBy("id")
      .select(concat_ws(",", col("id"), col("clabel")).as("pair"))
      .agg(sha2(concat_ws(";", collect_list(col("pair"))), 256).as("partition_key"))
  }

  /** U3 applied: keep one row per distinct partition (up to label
    * permutation) from a results table carrying a membership STRING column
    * already canonicalized by canonicalPartitionKey. */
  def dedupRuns(results: DataFrame, keyCol: String = "partition_key"): DataFrame =
    results.dropDuplicates(keyCol)

  /** F6 midpoint grid refinement around a target resolution (reference
    * utils.py:240-250 generate_sequence): seed [num, 0, 1], then repeatedly
    * append midpoints between the last two values and num; sorted first n.
    * Driver-side, mirrors the reference exactly (including its quirk of
    * midpointing against the rolling last-two window). */
  def midpointGrid(num: Double, n: Int): Seq[Double] = {
    require(n >= 3, "n must be at least 3")
    val seq = scala.collection.mutable.ArrayBuffer(num, 0.0, 1.0)
    while (seq.length < n) {
      val lastTwo = seq.takeRight(2)
      seq += (lastTwo(0) + num) / 2
      seq += (lastTwo(1) + num) / 2
    }
    seq.take(n).sorted.toSeq
  }

  /** A19 SPRT-style sequential mean (reference backup.py:8-19): draw
    * deterministic batches of a Bernoulli-ish metric until the z-CI of the
    * running mean drops below `error`. `draw(i)` returns batch i's samples
    * (the reference draws one sample per loop; batching only amortizes job
    * launches — the stopping rule is identical on the flattened stream). */
  def sequentialMean(draw: Int => Seq[Double], error: Double = 0.01,
                     z: Double = 1.96, maxBatches: Int = 1000): (Double, Int) = {
    var samples = Vector.empty[Double]
    var i = 0
    var mean = 0.0
    var stop = false
    while (!stop && i < maxBatches) {
      samples ++= draw(i)
      i += 1
      val n = samples.length
      mean = samples.sum / n
      val se = math.sqrt(mean * (1 - mean) / n)
      stop = z * se < error
    }
    (mean, samples.length)
  }
}
