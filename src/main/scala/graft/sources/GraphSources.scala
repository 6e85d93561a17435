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
    * whitespace) — returns (id, community) with community = 0-based line
    * rank (reference scripts/utils.py:105-122 "per-line" mode).
    * Line order is made deterministic by sorting on the parsed node list.
    */
  def readCommunitiesPerLine(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .filter(!col("value").startsWith("#") && trim(col("value")) =!= "")
      .select(split(trim(col("value")), "\\s+").cast("array<long>").as("nodes"))
    import org.apache.spark.sql.expressions.Window
    lines
      .withColumn("community",
        row_number().over(Window.orderBy(col("nodes"))).cast("long") - 1)
      .select(col("community"), explode(col("nodes")).as("id"))
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
