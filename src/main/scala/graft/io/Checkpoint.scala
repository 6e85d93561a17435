package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Lineage truncation + resumable snapshots for iterative jobs
  * (SURVEY.md §4.3.3 and north rule "resumable from checkpoint with
  * per-partition lineage + metrics").
  *
  * Layout under `dir`:
  *   superstep=K/            state parquet snapshot at superstep K
  *   manifest.jsonl          one line per checkpoint: superstep + metrics
  *
  * Parquet-backed (no Iceberg jar ships in /opt/spark/jars); the layout is
  * Iceberg-shaped: immutable snapshots + an append-only manifest.
  */
final class Checkpoint(spark: SparkSession, dir: String, every: Int = 5) {
  Files.createDirectories(Paths.get(dir))
  private val manifest: Path = Paths.get(dir, "manifest.jsonl")

  /** Truncate lineage: every `every` supersteps write + re-read the state
    * (also serving resume); otherwise localCheckpoint (cheap, non-durable).
    */
  def truncate(df: DataFrame, superstep: Int, metricsJson: String = "{}"): DataFrame = {
    if (superstep % every == 0) {
      val snap = s"$dir/superstep=$superstep"
      df.write.mode("overwrite").parquet(snap)
      val line = s"""{"superstep":$superstep,"path":"$snap","metrics":$metricsJson}""" + "\n"
      Files.writeString(manifest, line,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      spark.read.parquet(snap)
    } else df.transform(graft.io.Iterate.pin)
  }

  /** Latest durable snapshot (superstep, state) if any — the resume point. */
  def latest(): Option[(Int, DataFrame)] = {
    if (!Files.exists(manifest)) return None
    val lines = Files.readAllLines(manifest).asScala
    if (lines.isEmpty) return None
    val steps = lines.flatMap { l =>
      "\"superstep\":(\\d+)".r.findFirstMatchIn(l).map(_.group(1).toInt)
    }
    if (steps.isEmpty) None
    else {
      val k = steps.max
      Some((k, spark.read.parquet(s"$dir/superstep=$k")))
    }
  }
}

object Checkpoint {
  /** No-op variant for tests / one-shot runs: localCheckpoint only. */
  def inMemory(df: DataFrame, superstep: Int, every: Int = 5): DataFrame =
    if (superstep % every == 0) df.transform(graft.io.Iterate.pin) else df
}
