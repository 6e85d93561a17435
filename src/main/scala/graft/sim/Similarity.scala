package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`), for the
  * `embeddings(vec_id, embedding, label)` table.
  *
  * Two tiers:
  *  - brute-force cosine top-k: exact baseline. Queries are broadcast, so
  *    the corpus is scanned once with no shuffle of the big side.
  *  - LSH-bucketed (random hyperplane signs): the 100 TB path. Hyperplanes
  *    are derived from seeded hashes (deterministic, no rand()); candidates
  *    share a signature prefix bucket, exact cosine re-ranks within bucket.
  */
object Similarity {

  /** Cosine similarity of two double arrays as a pure fold expression. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(a, lit(0.0), (s, v) => s + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (s, v) => s + v * v))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact cosine near-duplicate pairs >= threshold. All-pairs product —
    * only for modest corpus sizes / verification; the scale path is
    * `lshPairs`. */
  def cosinePairs(vecs: DataFrame, threshold: Double,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = vecs.select(col(idCol).as("ida"), asDouble(col(vecCol)).as("va"))
    val b = vecs.select(col(idCol).as("idb"), asDouble(col(vecCol)).as("vb"))
    a.crossJoin(b).filter(col("ida") < col("idb"))
      .withColumn("craw", cosine(col("va"), col("vb")))
      .filter(col("craw") >= threshold)
      .select(col("ida"), col("idb"), round(col("craw"), 6).as("cos"))
  }

  /** Deterministic pseudo-random hyperplane component: ~U(-1,1) from a
    * seeded hash of (plane, dim). */
  private def planeComponent(plane: Column, dim: Column, seed: Long): Column =
    (pmod(xxhash64(plane, dim, lit(seed)), lit(2000001L)) - 1000000L).cast("double") / 1000000.0

  /** Sign signature under `numPlanes` hyperplanes, as a bit-packed long. */
  def hyperplaneSignature(vecCol: Column, numPlanes: Int = 16, seed: Long = 7L): Column = {
    val v = asDouble(vecCol)
    val signs = transform(sequence(lit(0), lit(numPlanes - 1)), p => {
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1).cast("array<double>"),
          (x, i) => x * planeComponent(p, i, seed)),
        lit(0.0), (s, x) => s + x)
      when(dot >= 0, 1L).otherwise(0L)
    })
    aggregate(signs, lit(0L), (acc, s) => acc * 2 + s)
  }

  /** LSH near-dup pairs: bucket on `bands` sub-signatures (multi-probe via
    * banding), verify exact cosine within bucket. */
  def lshPairs(vecs: DataFrame, threshold: Double,
               numPlanes: Int = 16, bands: Int = 4, seed: Long = 7L,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(numPlanes % bands == 0)
    val r = numPlanes / bands
    val mask = (1L << r) - 1
    val sig = vecs.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
      hyperplaneSignature(col(vecCol), numPlanes, seed).as("sig"))
    val bandKeys = array((0 until bands).map(b =>
      shiftrightunsigned(col("sig"), b * r).bitwiseAND(mask)): _*)
    val banded = sig.select(col("id"), col("v"), posexplode(bandKeys))
      .select(col("id"), col("v"), col("pos").as("band"), col("col").as("bucket"))
    banded.select(col("band"), col("bucket"), col("id").as("ida"), col("v").as("va"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("idb"), col("v").as("vb")),
        Seq("band", "bucket"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb", "va", "vb").distinct()
      .withColumn("craw", cosine(col("va"), col("vb")))
      .filter(col("craw") >= threshold)
      .select(col("ida"), col("idb"), round(col("craw"), 6).as("cos"))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Queries are broadcast. Deterministic
    * tie-break: higher cosine, then smaller neighbor id. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
    val scored = c.join(q, col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("nid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), round(col("cos"), 6).as("cos"), col("rk"))
  }
}
