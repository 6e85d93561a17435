package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
