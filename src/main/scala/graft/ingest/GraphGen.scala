package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Edge

/** Synthetic graph + partition generators mirroring the reference's
  * experiment inputs (SURVEY.md §2.1 S10-S12), fully deterministic:
  * every random draw is a seeded-hash Bernoulli/choice, never `rand()`,
  * so results are identical under any repartitioning — the property
  * fixtures and resume tests rely on. Draws use the portable md5 family
  * (graft.util.Portable), so DuckDB can replay the generators bit-for-bit
  * and fully-synthetic queries (q_sbm_recover) get exact oracles.
  */
object GraphGen {
  import graft.util.Portable

  private val M = 1000000L

  /** Stochastic block model (reference scripts/utils.py:162-177):
    * `nCommunities` blocks of `communitySize` vertices; edge (u,v) exists
    * with prob pIn when same block else pOut = pIn * multiplier.
    *
    * This is the DENSE path: the V x V candidate cross product is
    * enumerated (as two narrow `spark.range`s, filtered before any wide
    * column exists) — O(V^2) candidates, intended for the reference's
    * small experiment graphs (V <= ~10^4). For large planted graphs use
    * RepoTable.generateSparse, which samples candidates blockwise
    * (own-block dense + a calibrated foreign sample) in O(V * k).
    */
  def sbm(spark: SparkSession, nCommunities: Int, communitySize: Int,
          pIn: Double, pOut: Double, seed: Long): Dataset[Edge] = {
    import spark.implicits._
    val v = nCommunities.toLong * communitySize
    val left = spark.range(v).select(col("id").as("src"),
      (col("id") / communitySize).cast("long").as("bs"))
    val right = spark.range(v).select(col("id").as("dst"),
      (col("id") / communitySize).cast("long").as("bd"))
    // DuckDB mirror: ('0x'||substr(md5('sbm:'||seed||':'||src||':'||dst),1,8))::BIGINT % 1000000
    val draw = pmod(Portable.u32(Portable.key(lit("sbm"), lit(seed), col("src"), col("dst"))), lit(M))
    val keep = when(col("bs") === col("bd"), draw < (pIn * M).toLong)
      .otherwise(draw < (pOut * M).toLong)
    left.crossJoin(right)
      .filter(col("src") < col("dst"))
      .filter(keep)
      .select(col("src"), col("dst"), lit(1.0).as("weight"))
      .as[Edge]
  }

  /** Planted ground truth: community = id / communitySize (reference
    * scripts/utils.py:179-184). */
  def groundTruth(spark: SparkSession, nCommunities: Int, communitySize: Int): DataFrame =
    spark.range(nCommunities.toLong * communitySize)
      .select(col("id"), (col("id") / communitySize).cast("long").as("community"))

  /** Noisy initial partition (reference shuffle_with_noise /
    * get_initial_membership, scripts/utils.py:186-227): a hash-selected
    * `noise` fraction of vertices is reassigned to a hash-random community;
    * noise > 1 degenerates to the singleton partition — exactly the
    * reference's convention. Deterministic divergence from the reference's
    * in-place shuffle is documented in SURVEY.md §7.4.2. */
  def noisyPartition(groundTruth: DataFrame, nCommunities: Int,
                     noise: Double, seed: Long): DataFrame = {
    if (noise > 1.0)
      return groundTruth.select(col("id"), col("id").as("community"))
    // DuckDB mirrors: 'nz:'/'nc:' keys, same md5-u32 modulus scheme as sbm.
    val flip = pmod(Portable.u32(Portable.key(lit("nz"), lit(seed), col("id"))), lit(M)) <
      (noise * M).toLong
    val randComm = pmod(Portable.u32(Portable.key(lit("nc"), lit(seed), col("id"))),
      lit(nCommunities.toLong))
    groundTruth.select(col("id"),
      when(flip, randComm).otherwise(col("community")).cast("long").as("community"))
  }
}
