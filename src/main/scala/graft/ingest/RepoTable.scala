package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic generator for the Iceberg-shaped repo-file table
  * `(repo, path, commit, lang, content)` (BASELINE.json input_hint), with a
  * planted block structure mirroring the reference's SBM generator
  * (reference scripts/utils.py:162-177): repos within a block share many
  * paths (p_in), across blocks few (p_out = p_in * multiplier).
  *
  * All randomness is seeded-hash Bernoulli (`xxhash64(repoIdx, pathIdx, seed)`),
  * never `rand()` — reproducible under any repartitioning, which is what makes
  * fixtures and resume-from-checkpoint bitwise-stable.
  */
object RepoTable {

  final case class Config(
      nBlocks: Int = 4,
      reposPerBlock: Int = 50,
      pathsPerBlock: Int = 40,
      pIn: Double = 0.5,
      pOut: Double = 0.02,
      seed: Long = 42L)

  private val langs = Seq("scala", "py", "java", "md", "sql", "sh")

  /** Generate the repo-file table. Row = one file (repo, path) that "exists".
    *
    * Candidate space is repos x paths; existence is a hash-Bernoulli draw at
    * p_in for same-block (repo, path) and p_out otherwise. At very large
    * scale the cross product is generated lazily from two `spark.range`s and
    * filtered before any wide column is materialized, so the scan stays
    * narrow (two longs) until the filter has run.
    */
  def generate(spark: SparkSession, cfg: Config): DataFrame = {
    val nRepos = cfg.nBlocks.toLong * cfg.reposPerBlock
    val nPaths = cfg.nBlocks.toLong * cfg.pathsPerBlock
    val repos = spark.range(nRepos).select(
      col("id").as("repoIdx"),
      (col("id") / cfg.reposPerBlock).cast("long").as("repoBlock"))
    val paths = spark.range(nPaths).select(
      col("id").as("pathIdx"),
      (col("id") / cfg.pathsPerBlock).cast("long").as("pathBlock"))

    val m = 1000000L
    val pInT = (cfg.pIn * m).toLong
    val pOutT = (cfg.pOut * m).toLong
    val draw = pmod(xxhash64(col("repoIdx"), col("pathIdx"), lit(cfg.seed)), lit(m))
    val keepCond = when(col("repoBlock") === col("pathBlock"), draw < pInT)
      .otherwise(draw < pOutT)

    val cells = repos.crossJoin(paths).filter(keepCond)
    decorate(cells, cfg)
  }

  /** Sparse generation for large scale. The dense path enumerates the full
    * repos x paths cross product — O(R*P) candidate cells, untenable past
    * ~1e9. Here each repo draws from (a) every path of its OWN block at
    * p_in and (b) `foreignSample` hash-chosen foreign paths at a rate
    * calibrated so the EFFECTIVE cross-block density equals cfg.pOut
    * (drawP = pOut * nPaths / foreignSample). Generation is
    * O(R * (pathsPerBlock + foreignSample)), planted structure and hub
    * paths preserved, fully deterministic (seeded hashes).
    */
  def generateSparse(spark: SparkSession, cfg: Config, foreignSample: Int = 64): DataFrame = {
    val nRepos = cfg.nBlocks.toLong * cfg.reposPerBlock
    val nPaths = cfg.nBlocks.toLong * cfg.pathsPerBlock
    val m = 1000000L
    val repos = spark.range(nRepos).select(
      col("id").as("repoIdx"),
      (col("id") / cfg.reposPerBlock).cast("long").as("repoBlock"))

    // (a) own-block candidates: every path of the repo's block at p_in.
    val own = repos
      .select(col("repoIdx"), col("repoBlock"),
        explode(sequence(lit(0), lit(cfg.pathsPerBlock - 1))).as("j"))
      .select(col("repoIdx"), col("repoBlock"),
        (col("repoBlock") * cfg.pathsPerBlock + col("j")).cast("long").as("pathIdx"))
      .filter(pmod(xxhash64(col("repoIdx"), col("pathIdx"), lit(cfg.seed)), lit(m))
        < (cfg.pIn * m).toLong)

    // (b) foreign candidates: `foreignSample` hash-chosen paths per repo,
    // kept at drawP so that E[cross cells] matches the dense pOut.
    val drawP = math.min(1.0, cfg.pOut * nPaths / foreignSample)
    // No silent caps (repo policy): when pOut*nPaths > foreignSample the
    // requested cross density is NOT representable with this sample size —
    // every sampled path survives and the effective pOut is
    // foreignSample/nPaths. At 5000 blocks the default pOut=5e-4 caps here
    // (effective 6.4e-5) and yields a 1.17e9-edge graph; scaling runs pass
    // an explicit SPARK_GRAFT_BENCH_POUT small enough not to cap.
    if (cfg.pOut * nPaths / foreignSample > 1.0)
      System.err.println(f"WARN RepoTable.generateSparse: drawP capped at 1 — " +
        f"effective pOut = ${foreignSample.toDouble / nPaths}%.2e " +
        f"(requested ${cfg.pOut}%.2e); raise foreignSample or lower pOut")
    val foreign = repos
      .select(col("repoIdx"), col("repoBlock"),
        explode(sequence(lit(0), lit(foreignSample - 1))).as("s"))
      .select(col("repoIdx"), col("repoBlock"),
        pmod(xxhash64(col("repoIdx"), col("s"), lit(cfg.seed + 3)), lit(nPaths)).as("pathIdx"),
        col("s"))
      .filter((col("pathIdx") / cfg.pathsPerBlock).cast("long") =!= col("repoBlock"))
      .filter(pmod(xxhash64(col("repoIdx"), col("pathIdx"), col("s"), lit(cfg.seed + 4)), lit(m))
        < (drawP * m).toLong)
      .drop("s")

    val cells = own.unionByName(foreign)
      .withColumn("pathBlock", (col("pathIdx") / cfg.pathsPerBlock).cast("long"))
      .dropDuplicates("repoIdx", "pathIdx")
    decorate(cells, cfg)
  }

  /** Wide (string) columns, applied only after the Bernoulli filter so the
    * candidate stream stays narrow (two longs) until selection has run. */
  private def decorate(cells: DataFrame, cfg: Config): DataFrame = {
    val langIdx = pmod(xxhash64(col("pathIdx"), lit(cfg.seed + 1)), lit(langs.size))
    val langCol = element_at(
      array(langs.map(lit): _*), (langIdx + 1).cast("int"))
    cells.select(
      concat(lit("org"), col("repoBlock"), lit("/repo"), col("repoIdx")).as("repo"),
      concat(lit("src/b"), col("pathBlock"), lit("/file"), col("pathIdx"), lit(".txt")).as("path"),
      // 40-hex deterministic "commit": sha2 truncated
      substring(sha2(concat_ws(":", col("repoIdx"), col("pathIdx"), lit(cfg.seed)), 256), 1, 40).as("commit"),
      langCol.as("lang"),
      concat_ws(" ",
        lit("content of"), col("repoIdx"), col("pathIdx"),
        hex(xxhash64(col("repoIdx"), col("pathIdx"), lit(cfg.seed + 2)))).as("content"))
  }

  /** Stamp the per-row invariant: sha = sha2(content, 256) (BASELINE.json:15).
    * Built-in `sha2` — codegen'd, no UDF. */
  def withSha(files: DataFrame): DataFrame =
    files.withColumn("sha", sha2(col("content"), 256))

  /** Ground-truth block membership for the planted structure, keyed by the
    * same repoIdx embedded in the repo name (reference utils.py:179-184). */
  def groundTruth(files: DataFrame, cfg: Config): DataFrame =
    files.select(regexp_extract(col("repo"), "repo(\\d+)$", 1).cast("long").as("id"))
      .distinct()
      .select(col("id"), (col("id") / cfg.reposPerBlock).cast("long").as("community"))
}
