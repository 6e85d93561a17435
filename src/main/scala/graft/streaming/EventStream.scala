package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming surface. The reference processes static snapshots
  * only (SURVEY.md §2.10 — no watermarks/event-time anywhere in it), so
  * the engine's batch supersteps stay batch; this module covers the
  * streaming INGEST shape a production deployment of the same pipeline
  * needs: events/files arriving continuously, windowed aggregation with
  * late-data handling, and incremental co-occurrence pair extraction.
  *
  * Both transforms are pure DataFrame -> DataFrame functions, so the same
  * code runs over `spark.read` (batch, DuckDB-oracled via q_events_window)
  * and `spark.readStream` (tested with MemoryStream in EventStreamSpec).
  */
object EventStream {

  /** 5-minute tumbling-window counts/sums with a watermark for late data.
    * Batch-equivalent of SparkEntry q_events_window (same aggregation). */
  def windowedStats(events: DataFrame,
                    windowLen: String = "5 minutes",
                    watermark: String = "10 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Incremental edge extraction over a stream of (repo, path) file rows:
    * join arriving rows against the static repo-id map and emit
    * per-micro-batch co-occurrence pairs via foreachBatch-style append.
    * (The heavy pairing joins stay in the batch layer; streaming emits the
    * per-batch delta that a compaction job folds into the edge table —
    * the standard lambda shape for a 10^12-row ingest.) */
  def filesToPairDeltas(files: DataFrame, maxPathFanout: Int = 1000): DataFrame = {
    // within a micro-batch: same equi-join-on-path pairing as the batch
    // extractor, INCLUDING its hub cap — a hot path appearing in n rows of
    // one micro-batch would otherwise emit C(n,2) pairs (the same skew
    // point EdgeExtraction.cooccurrence guards).
    val rp = files.select(col("repo"), col("path"))
    val kept = rp.groupBy("path").agg(count(lit(1)).as("k"))
      .filter(col("k") <= maxPathFanout).select("path")
    val capped = rp.join(kept, Seq("path"))
    val a = capped.select(col("path"), col("repo").as("ra"))
    val b = capped.select(col("path"), col("repo").as("rb"))
    a.join(b, Seq("path")).filter(col("ra") < col("rb"))
      .select(col("ra"), col("rb"), col("path"))
  }

  /** DEMO-ONLY runner: memory sink in `complete` mode re-emits the whole
    * result every batch and — because complete mode never drops state —
    * the watermark set in windowedStats is inert here; state grows with
    * the number of open windows. Use `runToParquet` for the production
    * shape. */
  def runToMemory(spark: SparkSession, stream: DataFrame, queryName: String) = {
    windowedStats(stream)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .start()
  }

  /** Streaming exact dedup on content hash — the ingest-side twin of
    * `Dedup.exact` (batch). Emits only the FIRST document seen per
    * sha256(text); repeats arriving within the watermark horizon are
    * dropped with BOUNDED state: `dropDuplicatesWithinWatermark` evicts a
    * key's state once the watermark passes its event time, so state is
    * O(docs per horizon), not O(all docs ever) — the property that keeps a
    * continuous 100 TB/day ingest feasible where plain `dropDuplicates`
    * (streaming) would grow state forever. Exactness contract: a repeat
    * arriving AFTER its original's state was evicted passes through; the
    * downstream batch `Dedup.exact` compaction catches those stragglers
    * (standard lambda split, same as filesToPairDeltas).
    *
    * On a batch frame this degrades to hash-group + min — semantics
    * identical to `Dedup.exactSurvivors` modulo the keep rule (first by
    * event time here, min id there). */
  def dedupStream(docs: DataFrame, watermark: String = "10 minutes",
                  textCol: String = "text", tsCol: String = "ts"): DataFrame = {
    val keyed = docs.withColumn("content_sha", sha2(col(textCol), 256))
    if (docs.isStreaming)
      keyed.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("content_sha")
    else {
      // batch fallback: earliest-ts row per hash (deterministic tie-break
      // on the remaining columns via min(struct)).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("content_sha")
        .orderBy(col(tsCol), col(textCol))
      keyed.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }
  }

  /** Streaming quality gate: TextOps.qualityVerdict applied per
    * micro-batch — the whole rule set (length/word-length/symbol/
    * stopword/repetition/langId) is stateless columnar projection, so it
    * lifts to a stream with no state store, no watermark, and identical
    * verdicts to the batch path (EventStreamSpec pins batch ≡ stream).
    * The ingest-side corpus filter: run it BEFORE the stateful dedup so
    * junk never occupies dedup state. */
  def qualityFilterStream(docs: DataFrame,
                          cfg: graft.text.TextOps.QualityConfig =
                            graft.text.TextOps.QualityConfig(),
                          textCol: String = "text"): DataFrame =
    graft.text.TextOps.qualityVerdict(docs, cfg, textCol)
      .filter(col("keep"))

  /** Running per-key stats via mapGroupsWithState — the custom-state
    * primitive (KeyValueGroupedDataset) for accumulators Spark's built-in
    * windowed aggs can't express: here a cumulative (count, sum) per
    * event_type that survives across micro-batches and emits its running
    * value every batch the key appears in (update output mode).
    *
    * State is one 16-byte tuple per distinct key — safe at any event
    * volume as long as the KEY cardinality is bounded (event types,
    * tenants, shards...). For unbounded keys use a timeout
    * (GroupStateTimeout.ProcessingTimeTimeout) or the watermarked dedup
    * above; this operator deliberately keeps NoTimeout because its
    * intended keys are low-cardinality dimensions. */
  def runningTypeStats(events: Dataset[(String, Double)]): Dataset[(String, Long, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], st: GroupState[(Long, Double)]) =>
          val (n0, s0) = st.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { r => n += 1; s += r._2 }
          st.update((n, s))
          (key, n, s)
      }
  }

  /** Production-shaped runner: append mode + watermark, so window state is
    * EVICTED once the watermark passes (bounded state at 100 TB/day rates);
    * each window is emitted exactly once, on finalization, to a parquet
    * sink that a downstream compaction folds in. */
  def runToParquet(stream: DataFrame, outDir: String, checkpointDir: String,
                   windowLen: String = "5 minutes",
                   watermark: String = "10 minutes") = {
    windowedStats(stream, windowLen, watermark)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }
}
