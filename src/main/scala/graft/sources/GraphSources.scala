package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Edge
import graft.graph.GraphOps

/** Text graph sources the reference reads (SURVEY.md §2.1 S1/S2/S5):
  * SNAP-style edge lists and community files. gz decompression is native to
  * spark.read.text; the scans are line-parallel and schema-pruned.
  */
object GraphSources {

  /** SNAP edge list: lines `u<whitespace>v`, `#` comments skipped
    * (reference scripts/utils.py:88-103). Returns the canonical undirected
    * simple edge table. */
  def readEdgeList(spark: SparkSession, path: String): Dataset[Edge] = {
    val lines = spark.read.text(path)
      .filter(!col("value").startsWith("#") && trim(col("value")) =!= "")
    val pairs = lines.select(split(trim(col("value")), "\\s+").as("f"))
      .select(element_at(col("f"), 1).cast("long").as("src"),
        element_at(col("f"), 2).cast("long").as("dst"))
      .withColumn("weight", lit(1.0))
    GraphOps.canonicalize(pairs)
  }

  /** SNAP community file, one community per line (node ids separated by
    * whitespace) — returns (id, community) with community ids dense 0..k-1
    * (reference scripts/utils.py:105-122 "per-line" mode; consumers — ARI,
    * induction — need label identity, not the reference's line order).
    *
    * Ids are assigned WITHOUT a global sort (the round-3 version's
    * `row_number() OVER (ORDER BY nodes)` pulled every line through one
    * WindowExec task): rank within `nBuckets` hash buckets + driver-side
    * cumulative bucket offsets — the same shape as
    * `EdgeExtraction.denseVertexIds`. Deterministic (bucket = xxhash64 of
    * the node list, sorted by node list within bucket), scales to community
    * files of any size. */
  def readCommunitiesPerLine(spark: SparkSession, path: String,
                             nBuckets: Int = 256): DataFrame = {
    val lines = spark.read.text(path)
      .filter(!col("value").startsWith("#") && trim(col("value")) =!= "")
      .select(split(trim(col("value")), "\\s+").cast("array<long>").as("nodes"))
      .withColumn("bucket", pmod(xxhash64(col("nodes")), lit(nBuckets.toLong)))
    val counts = lines.groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = (0 until nBuckets).scanLeft(0L) {
      case (acc, b) => acc + counts.getOrElse(b.toLong, 0L)
    }.toArray
    val offsetCol = element_at(
      array(offsets.take(nBuckets).map(lit(_)): _*), (col("bucket") + 1).cast("int"))
    import org.apache.spark.sql.expressions.Window
    lines
      .withColumn("r", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("nodes"))).cast("long"))
      .select((offsetCol + col("r") - 1).as("community"),
        explode(col("nodes")).as("id"))
      .select("id", "community")
  }

  /** `node<whitespace>community` pair file (reference utils.py "pairs"
    * mode). */
  def readCommunitiesPairs(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(!col("value").startsWith("#") && trim(col("value")) =!= "")
      .select(split(trim(col("value")), "\\s+").as("f"))
      .select(element_at(col("f"), 1).cast("long").as("id"),
        element_at(col("f"), 2).cast("long").as("community"))

  /** Single-row CSV membership (reference utils.py:33-35): `m0,m1,...` —
    * position i is vertex i's community. */
  def readCsvMembership(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).limit(1)
      .select(posexplode(split(trim(col("value")), ","))) // (pos, col)
      .select(col("pos").cast("long").as("id"), col("col").cast("long").as("community"))

  /** Edge-table sink/scan round-trip format: parquet is the engine's
    * native cached graph form (replaces the reference's pickle cache,
    * scripts/real_nets.py:124-134). */
  def writeEdges(edges: Dataset[Edge], path: String): Unit =
    edges.write.mode("overwrite").parquet(path)

  def readEdges(spark: SparkSession, path: String): Dataset[Edge] = {
    import spark.implicits._
    spark.read.parquet(path).as[Edge]
  }
}
