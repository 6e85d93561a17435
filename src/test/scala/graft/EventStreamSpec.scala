package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import java.sql.Timestamp

class EventStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowed stats: identical results on batch and MemoryStream input") {
    
    import spark.implicits._
    val rows = Seq(
      (ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(2), "view", 5.0),
      (ts(6), "click", 3.0), (ts(7), "view", 1.0))

    // batch
    val batch = EventStream.windowedStats(rows.toDF("ts", "event_type", "value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    // streaming (memory sink, complete mode)
    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    val stream = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.runToMemory(spark, stream, "evt_test")
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("evt_test")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    q.stop()

    assert(batch == streamed)
    // window math: 10:00-10:05 has 2 clicks (sum 3.0) and 1 view
    val w0 = java.time.LocalDateTime.parse("2026-01-01T10:00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    assert(batch((w0, "click")) == ((2L, 3.0)))
    assert(batch((w0, "view")) == ((1L, 5.0)))
  }

  test("late data beyond the watermark is still aggregated in complete mode") {
    
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    val q = EventStream.runToMemory(spark, mem.toDF().toDF("ts", "event_type", "value"),
      "evt_late")
    mem.addData((ts(30), "click", 1.0))
    q.processAllAvailable()
    mem.addData((ts(0), "click", 9.0)) // 30 min late
    q.processAllAvailable()
    val n = spark.table("evt_late").agg(sum("n")).collect()(0).getLong(0)
    q.stop()
    assert(n == 2L) // complete mode keeps all windows; watermark bounds state for append sinks
  }

  test("streaming pair-delta extraction emits canonical per-batch pairs") {
    import spark.implicits._
    val files = Seq(("r2", "a"), ("r1", "a"), ("r3", "b")).toDF("repo", "path")
    val pairs = EventStream.filesToPairDeltas(files).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSeq == Seq(("r1", "r2")))
  }

  test("streaming dedup keeps the first doc per content hash within the watermark") {
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String)](spark)
    val q = EventStream.dedupStream(mem.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    // batch 1: two distinct texts plus an in-batch repeat
    mem.addData((ts(0), "aaa"), (ts(1), "bbb"), (ts(2), "aaa"))
    q.processAllAvailable()
    // batch 2: a cross-batch repeat (within watermark) and one new text
    mem.addData((ts(3), "bbb"), (ts(4), "ccc"))
    q.processAllAvailable()
    val out = spark.table("dedup_test").select("text").as[String].collect().sorted
    q.stop()
    assert(out.toSeq == Seq("aaa", "bbb", "ccc"))
  }

  test("streaming quality gate: stream verdicts match batch; junk dropped at ingest") {
    import spark.implicits._
    import graft.text.TextOps
    val docs = TextOps.plantedBadDocs // 4 bad + 1 good, each rule covered
    val batchKept = EventStream.qualityFilterStream(docs.toDF("doc_id", "text"))
      .select("doc_id").as[Long].collect().toSet
    val mem = MemoryStream[(Long, String)](spark)
    val q = EventStream.qualityFilterStream(mem.toDF().toDF("doc_id", "text"))
      .select("doc_id")
      .writeStream.format("memory").queryName("quality_test")
      .outputMode("append").start()
    mem.addData(docs.take(2): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(2): _*)
    q.processAllAvailable()
    val streamKept = spark.table("quality_test").as[Long].collect().toSet
    q.stop()
    assert(streamKept == batchKept)
    assert(streamKept == Set(1000000005L)) // only the good doc survives
  }

  test("batch dedupStream keeps the earliest row per hash") {
    import spark.implicits._
    val docs = Seq((ts(5), "x"), (ts(1), "x"), (ts(2), "y")).toDF("ts", "text")
    val kept = EventStream.dedupStream(docs)
      .select("ts", "text").as[(Timestamp, String)].collect().toSet
    assert(kept == Set((ts(1), "x"), (ts(2), "y")))
  }

  test("mapGroupsWithState running stats accumulate across micro-batches") {
    import spark.implicits._
    val mem = MemoryStream[(String, Double)](spark)
    val q = EventStream.runningTypeStats(mem.toDS())
      .toDF("event_type", "n", "total")
      .writeStream.format("memory").queryName("running_test")
      .outputMode("update").start()
    mem.addData(("click", 1.0), ("click", 2.0), ("view", 5.0))
    q.processAllAvailable()
    mem.addData(("click", 4.0))
    q.processAllAvailable()
    // update mode appends one row per key per batch it changed in; the
    // LAST row per key is the cumulative state.
    val last = spark.table("running_test")
      .groupBy("event_type").agg(max(struct(col("n"), col("total"))).as("b"))
      .select(col("event_type"), col("b.n"), col("b.total"))
      .as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(last == Set(("click", 3L, 7.0), ("view", 1L, 5.0)))
  }
}
