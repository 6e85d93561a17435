package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic pseudo-randomness.
  *
  * Every stochastic choice in the engine that affects RESULTS — superstep
  * parity gates, MinHash permutations, SimHash token bits, LSH hyperplane
  * components — derives from `md5`, which has identical semantics in Spark
  * and DuckDB, so the driver's DuckDB correctness oracle can replicate the
  * randomized paths bit-for-bit. (Round 1 used `xxhash64`, which DuckDB
  * lacks; exactly the scale paths — banded MinHash, SimHash chunk-pair
  * blocking, hyperplane LSH, full gated iterative runs — were therefore the
  * unverifiable ones.)
  *
  * Key discipline: seeds/ids are concatenated with ':' and a short domain
  * tag (`concat_ws`), e.g. `mh:<shingle>:<perm>`; the DuckDB mirror is
  * `'mh:' || sh || ':' || i`. BIGINT-to-string rendering agrees between the
  * engines for non-negative integers.
  *
  * Cost: md5 is a few times slower than xxhash64 per call but still a
  * codegen'd map-side expression — no shuffle, no plan-shape change at
  * 100 TB. Paths where randomness never reaches results (e.g. synthetic
  * fixture content) keep xxhash64.
  */
object Portable {

  /** Portable seeded key: parts joined with ':' after string-casting.
    * DuckDB mirror: `p0 || ':' || p1 || ':' || ...`. */
  def key(parts: Column*): Column = concat_ws(":", parts.map(_.cast("string")): _*)

  /** Uniform 32-bit value from the first 8 hex chars of md5(s).
    * DuckDB mirror: `('0x' || substr(md5(s), 1, 8))::BIGINT`. */
  def u32(s: Column): Column = conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Nibble j (0-based) of md5(s) as 0..15.
    * DuckDB mirror: `('0x' || substr(md5(s), j+1, 1))::BIGINT`. */
  def nibble(h: Column, j: Column): Column =
    conv(h.substr(j + 1, lit(1)), 16, 10).cast("long")

  /** Superstep parity gate: keep the vertex when u32('g:'+id+':'+round) is
    * even — a deterministic half of the vertices, a DIFFERENT half each
    * round. DuckDB mirror:
    * `('0x'||substr(md5('g:'||id||':'||round),1,8))::BIGINT % 2 = 0`. */
  def parityGate(id: Column, round: Int): Column =
    parityGate(id, lit(round))

  /** Column-round variant: superstep loops pass StateMap.intRef(round) so
    * the round number rides the codegen references array and the generated
    * source stays byte-identical across rounds (Janino cache hit) — the
    * VALUE is identical to the literal form, so DuckDB replay is
    * unaffected. */
  def parityGate(id: Column, round: Column): Column =
    pmod(u32(key(lit("g"), id, round)), lit(2L)) === lit(0L)

  /** ~U(-1, 1) at 1e-6 resolution from a seeded key (hyperplane components).
    * DuckDB mirror: `(u32 % 2000001 - 1000000) / 1000000.0`. */
  def uniformSym(s: Column): Column =
    (pmod(u32(s), lit(2000001L)) - 1000000L).cast("double") / 1000000.0
}
