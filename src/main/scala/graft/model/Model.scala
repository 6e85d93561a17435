package graft.model

/** Core row types of the engine (SURVEY.md §1.3).
  *
  * All algorithm state is relational: flat rows keyed by (node) or
  * (node, community), never nested maps — the reference's dict-of-dict
  * structures (reference hedonic/__init__.py:346-350) are consumed by full
  * iteration, so rows are the natural Spark shape.
  */

/** Input table shape mandated by BASELINE.json input_hint:
  * an Iceberg-shaped table of source-code repository files.
  */
case class RepoFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** RepoFile + the per-row invariant sha = sha2(content, 256). */
case class RepoFileHashed(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    sha: String)

/** Undirected co-occurrence edge, canonical src < dst, deduped, no
  * self-loops (reference graphs are simple undirected, scripts/utils.py:102).
  * weight = number of shared paths for the repo co-occurrence graph.
  */
case class Edge(src: Long, dst: Long, weight: Double)

/** Partition state: the central mutable table of every superstep
  * (reference membership list, hedonic/__init__.py:109-110).
  */
case class Member(id: Long, community: Long)

/** Gather output: per (node, candidate community) friend/stranger counts
  * (reference nodes_info, hedonic/__init__.py:294-352).
  */
case class NodeComm(id: Long, community: Long, friends: Long, strangers: Long)

/** Per-vertex score (PageRank rank, hedonic payoff, ...). */
case class Scored(id: Long, score: Double)

/** Convergence log row, one per superstep — checkpoint manifest payload. */
case class RunMetrics(
    superstep: Int,
    moved: Long,
    potential: Double,
    frontier: Long,
    edgesProcessed: Long,
    wallMs: Long)
