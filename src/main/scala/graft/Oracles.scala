package graft

/** DuckDB oracle SQL for every SQL-expressible query in SparkEntry.queries.
  *
  * Conventions keeping the driver's hash-compare stable:
  *  - every computed column is aliased identically to the Spark side;
  *  - doubles are round(x, 6) in BOTH engines (summation-order last-ulp
  *    differences vanish at 6 dp);
  *  - counts/sums cast to BIGINT (DuckDB sum(int) is HUGEINT otherwise);
  *  - identical arithmetic formulas, so comparisons (payoff >, thresholds)
  *    see bit-identical doubles on both sides.
  *
  * The graph under test is the supplier co-occurrence graph derived from
  * lineitem: vertices = suppliers, two suppliers linked iff they supply a
  * shared part (same shape as the repo/path co-occurrence mandated by
  * BASELINE.json, with (l_suppkey, l_partkey) standing in for (repo, path)).
  */
object Oracles {

  /** DuckDB 1.x INLINES single-referenced CTEs; a chained iteration pyramid
    * (q_pagerank_full's 20 rank CTEs) then re-expands the whole extraction
    * prologue per level — measured 15+ min at sf0.01 vs 0.3 s materialized.
    * Force `AS MATERIALIZED` on every named CTE; the recursive CC CTE
    * `r(n, l)` must stay inline (recursion cannot be materialized). */
  def materialize(sql: String): String = {
    val guard = "RECURSIVE_CTE"
    sql.replace("r(n, l) AS (", guard)
      .replaceAll("""(\w+) AS \(""", "$1 AS MATERIALIZED (")
      .replace(guard, "r(n, l) AS (")
  }

  /** Shared CTE prologue: co-occurrence edges + symmetrized views (plain
    * and weighted) + vertices + hub-fanout cap (mirrors
    * EdgeExtraction.cooccurrence maxPathFanout). `pathKey` picks the
    * co-occurrence dimension: l_partkey = the dense "shared part" graph
    * (near-complete at driver SFs), l_orderkey = the sparse "shared order"
    * graph (non-trivial components/communities). */
  def graphCtesOn(pathKey: String, where: String = ""): String = s"""
    sp AS (SELECT DISTINCT l_suppkey AS id, $pathKey AS pk FROM lineitem $where),
    keep AS (SELECT pk FROM sp GROUP BY pk HAVING count(*) <= 1000),
    spk AS (SELECT sp.id, sp.pk FROM sp JOIN keep USING (pk)),
    edges AS (
      SELECT a.id AS src, b.id AS dst, CAST(count(*) AS DOUBLE) AS weight
      FROM spk a JOIN spk b ON a.pk = b.pk AND a.id < b.id
      GROUP BY a.id, b.id),
    sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
    symw AS (SELECT src, dst, weight FROM edges
             UNION ALL SELECT dst AS src, src AS dst, weight FROM edges),
    verts AS (SELECT DISTINCT src AS id FROM sym),
    m0 AS (SELECT id, id % 3 AS community FROM verts)"""

  val graphCtes: String = graphCtesOn("l_partkey")
  val sparseCtes: String = graphCtesOn("l_orderkey")

  /** THIN graph (SparkEntry.graphThin): deterministic sparsifier — only
    * l_quantity <= 1 rows participate. The part/order graphs are complete
    * at driver SFs; this one has real iterative dynamics. */
  val thinCtes: String = graphCtesOn("l_partkey", "WHERE l_quantity <= 1")

  /** Portable parity gate mirror (graft.util.Portable.parityGate): node
    * `idExpr` may act in round `round` iff the md5-derived u32 is even. */
  private def gateSql(idExpr: String, round: Int): String =
    s"(('0x' || substr(md5('g:' || $idExpr || ':' || $round), 1, 8))::BIGINT % 2 = 0)"

  val edges: String =
    s"WITH $graphCtes SELECT src, dst, weight FROM edges"

  val degrees: String =
    s"WITH $graphCtes SELECT src AS id, CAST(count(*) AS BIGINT) AS degree FROM sym GROUP BY src"

  val density: String = s"""WITH $graphCtes
    SELECT CAST((SELECT count(*) FROM verts) AS BIGINT) AS v,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS e,
           round(2.0 * (SELECT count(*) FROM edges) /
             ((SELECT count(*) FROM verts) * ((SELECT count(*) FROM verts) - 1.0)), 6) AS density"""

  /** friends per (node, candidate community), own community always present
    * (union with a zero row) — mirrors Hedonic.gather. */
  val gather: String = s"""WITH $graphCtes
    SELECT id, community, CAST(sum(friends) AS BIGINT) AS friends FROM (
      SELECT s.src AS id, m.community, 1 AS friends FROM sym s JOIN m0 m ON s.dst = m.id
      UNION ALL
      SELECT id, community, 0 AS friends FROM m0
    ) GROUP BY id, community"""

  /** alpha = graph density (scalar subquery, same rational as Spark). */
  private val alphaCte = """
    alpha AS (SELECT 2.0 * (SELECT count(*) FROM edges) /
      ((SELECT count(*) FROM verts) * ((SELECT count(*) FROM verts) - 1.0)) AS a)"""

  private val payoffCtes = s"""$graphCtes, $alphaCte,
    cand AS (
      SELECT id, community, CAST(sum(friends) AS BIGINT) AS friends FROM (
        SELECT s.src AS id, m.community, 1 AS friends FROM sym s JOIN m0 m ON s.dst = m.id
        UNION ALL
        SELECT id, community, 0 AS friends FROM m0
      ) GROUP BY id, community),
    sizes AS (SELECT community, CAST(count(*) AS BIGINT) AS csize FROM m0 GROUP BY community),
    pay AS (
      SELECT c.id, c.community, c.friends,
             CAST(s.csize - c.friends - (CASE WHEN c.community = m.community THEN 1 ELSE 0 END) AS BIGINT) AS strangers,
             (c.community = m.community) AS iscur,
             c.friends * (1.0 - (SELECT a FROM alpha)) -
               (s.csize - c.friends - (CASE WHEN c.community = m.community THEN 1 ELSE 0 END)) * (SELECT a FROM alpha) AS payoff
      FROM cand c JOIN sizes s ON c.community = s.community JOIN m0 m ON c.id = m.id)"""

  val payoff: String = s"""WITH $payoffCtes
    SELECT id, community, friends, strangers, round(payoff, 6) AS payoff FROM pay"""

  /** One synchronous hedonic move step (argmax with canonical tie-break:
    * payoff desc, current community wins ties, then smallest label; move
    * only on strict improvement) — mirrors Hedonic.step with gate=true. */
  val move1: String = s"""WITH $payoffCtes,
    ranked AS (
      SELECT id, community, payoff, iscur,
             row_number() OVER (PARTITION BY id
               ORDER BY payoff DESC, iscur DESC, community ASC) AS rn,
             max(CASE WHEN iscur THEN payoff END) OVER (PARTITION BY id) AS curp,
             max(CASE WHEN iscur THEN community END) OVER (PARTITION BY id) AS curc
      FROM pay)
    SELECT id,
           CAST(CASE WHEN payoff > curp THEN community ELSE curc END AS BIGINT) AS community
    FROM ranked WHERE rn = 1"""

  /** n fixed PageRank iterations (damping .85, no dangling: the symmetrized
    * edge-derived graph has min degree 1). Chained CTEs, one per iteration. */
  def pagerank(n: Int): String = {
    val iters = (1 to n).map { i =>
      s"""r$i AS (
        SELECT v.id,
               (0.15 / (SELECT count(*) FROM verts)) + 0.85 * coalesce(s.c, 0.0) AS rank
        FROM verts v LEFT JOIN (
          SELECT e.dst AS id, sum(r.rank / d.degree) AS c
          FROM sym e
          JOIN r${i - 1} r ON e.src = r.id
          JOIN deg d ON e.src = d.id
          GROUP BY e.dst) s ON v.id = s.id)"""
    }.mkString(",\n")
    s"""WITH $graphCtes,
      deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS degree FROM sym GROUP BY src),
      r0 AS (SELECT id, 1.0 / (SELECT count(*) FROM verts) AS rank FROM verts),
      $iters
      SELECT id, round(rank, 6) AS rank FROM r$n"""
  }

  /** Connected components: comp = min reachable vertex id, via recursive
    * min-label closure. */
  val cc: String = s"""WITH RECURSIVE $graphCtes,
    r(n, l) AS (
      SELECT id, id FROM verts
      UNION
      SELECT s.dst, r.l FROM r JOIN sym s ON r.n = s.src WHERE r.l < s.dst
    )
    SELECT n AS id, CAST(min(l) AS BIGINT) AS comp FROM r GROUP BY n"""

  val triangles: String = s"""WITH $graphCtes
    SELECT CAST(count(*) AS BIGINT) AS triangles
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst"""

  /** Triangle count on the THIN graph (q_triangles_sparse — the
    * algorithmic-throughput tracker next to the complete-graph stress
    * case). */
  val trianglesSparse: String = s"""WITH $thinCtes
    SELECT CAST(count(*) AS BIGINT) AS triangles
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst"""

  /** One WEIGHTED hedonic move step on the thin graph (q_wmove1 — mirrors
    * Hedonic.step with weighted=true and gate=true): friendship mass = the
    * weight sum into the candidate community, strangers stay count-based,
    * payoff = wfriends*(1-a) - strangers*a. Weights are integral shared-path
    * counts, so the double sums are exact and comparisons bitwise match. */
  val wmove1: String = s"""WITH $thinCtes, $alphaCte,
    cand AS (
      SELECT id, community, CAST(sum(f1) AS BIGINT) AS friends,
             sum(fw) AS wfriends FROM (
        SELECT s.src AS id, m.community, 1 AS f1, s.weight AS fw
        FROM symw s JOIN m0 m ON s.dst = m.id
        UNION ALL
        SELECT id, community, 0 AS f1, 0.0 AS fw FROM m0
      ) GROUP BY id, community),
    sizes AS (SELECT community, CAST(count(*) AS BIGINT) AS csize FROM m0 GROUP BY community),
    pay AS (
      SELECT c.id, c.community,
             (c.community = m.community) AS iscur,
             c.wfriends * (1.0 - (SELECT a FROM alpha)) -
               (s.csize - c.friends - (CASE WHEN c.community = m.community THEN 1 ELSE 0 END)) * (SELECT a FROM alpha) AS payoff
      FROM cand c JOIN sizes s ON c.community = s.community JOIN m0 m ON c.id = m.id),
    ranked AS (
      SELECT id, community, payoff, iscur,
             row_number() OVER (PARTITION BY id
               ORDER BY payoff DESC, iscur DESC, community ASC) AS rn,
             max(CASE WHEN iscur THEN payoff END) OVER (PARTITION BY id) AS curp,
             max(CASE WHEN iscur THEN community END) OVER (PARTITION BY id) AS curc
      FROM pay)
    SELECT id,
           CAST(CASE WHEN payoff > curp THEN community ELSE curc END AS BIGINT) AS community
    FROM ranked WHERE rn = 1"""

  /** One synchronous LPA step from labels id%3: adopt the majority neighbor
    * label, ties to the smallest label — mirrors LabelPropagation.step. */
  val lpa1: String = s"""WITH $graphCtes,
    l0 AS (SELECT id, id % 3 AS label FROM verts),
    cnts AS (
      SELECT s.src AS id, l.label AS nbrlabel, count(*) AS cnt
      FROM sym s JOIN l0 l ON s.dst = l.id GROUP BY s.src, l.label),
    best AS (
      SELECT id, nbrlabel,
             row_number() OVER (PARTITION BY id ORDER BY cnt DESC, nbrlabel ASC) AS rn
      FROM cnts)
    SELECT l0.id, CAST(coalesce(b.nbrlabel, l0.label) AS BIGINT) AS label
    FROM l0 LEFT JOIN (SELECT id, nbrlabel FROM best WHERE rn = 1) b ON l0.id = b.id"""

  /** Adjusted Rand Index between partition id%3 and the supplier's nation —
    * full closed form over the contingency table. */
  val ari: String = s"""WITH $graphCtes,
    p1 AS (SELECT id, id % 3 AS c1 FROM verts),
    p2 AS (SELECT s_suppkey AS id, s_nationkey AS c2 FROM supplier),
    ct AS (SELECT c1, c2, CAST(count(*) AS BIGINT) AS n
           FROM p1 JOIN p2 USING (id) GROUP BY c1, c2),
    terms AS (
      SELECT
        (SELECT sum(n * (n - 1) / 2.0) FROM ct) AS sumij,
        (SELECT sum(a * (a - 1) / 2.0) FROM (SELECT sum(n) AS a FROM ct GROUP BY c1)) AS suma,
        (SELECT sum(b * (b - 1) / 2.0) FROM (SELECT sum(n) AS b FROM ct GROUP BY c2)) AS sumb,
        (SELECT sum(n) FROM ct) AS total)
    SELECT round(
      CASE WHEN (suma + sumb) / 2.0 = suma * sumb / (total * (total - 1) / 2.0) THEN 1.0
           ELSE (sumij - suma * sumb / (total * (total - 1) / 2.0)) /
                ((suma + sumb) / 2.0 - suma * sumb / (total * (total - 1) / 2.0))
      END, 6) AS ari
    FROM terms"""

  /** Satisfaction classes per node (A10): own community vs max-friends /
    * min-strangers sets — mirrors Metrics.satisfaction. */
  val satisfaction: String = s"""WITH $graphCtes,
    cand AS (
      SELECT id, community, CAST(sum(friends) AS BIGINT) AS friends FROM (
        SELECT s.src AS id, m.community, 1 AS friends FROM sym s JOIN m0 m ON s.dst = m.id
        UNION ALL
        SELECT id, community, 0 AS friends FROM m0
      ) GROUP BY id, community),
    sizes AS (SELECT community, CAST(count(*) AS BIGINT) AS csize FROM m0 GROUP BY community),
    pay AS (
      SELECT c.id, c.community, c.friends,
             s.csize - c.friends - (CASE WHEN c.community = m.community THEN 1 ELSE 0 END) AS strangers,
             (c.community = m.community) AS iscur
      FROM cand c JOIN sizes s ON c.community = s.community JOIN m0 m ON c.id = m.id),
    agg AS (
      SELECT id, max(friends) AS maxf, min(strangers) AS mins,
             max(CASE WHEN iscur THEN friends END) AS curf,
             max(CASE WHEN iscur THEN strangers END) AS curs
      FROM pay GROUP BY id)
    SELECT id,
           CASE WHEN curf = maxf AND curs = mins THEN 'always_satisfied'
                WHEN curf <> maxf AND curs <> mins THEN 'never_satisfied'
                ELSE 'relatively_satisfied' END AS cls
    FROM agg"""

  /** Merge-gain table under m0 (Leiden.mergeGains): per touching community
    * pair, between-edge count and gain = between - alpha*na*nb. */
  val mergeGain: String = s"""WITH $graphCtes, $alphaCte,
    lifted AS (
      SELECT m1.community AS c1, m2.community AS c2
      FROM edges e JOIN m0 m1 ON e.src = m1.id JOIN m0 m2 ON e.dst = m2.id),
    meta AS (
      SELECT least(c1, c2) AS ca, greatest(c1, c2) AS cb,
             CAST(count(*) AS BIGINT) AS between
      FROM lifted WHERE c1 <> c2 GROUP BY 1, 2),
    sizes AS (SELECT community, CAST(count(*) AS BIGINT) AS n FROM m0 GROUP BY community)
    SELECT ca, cb, between,
           round(between - (SELECT a FROM alpha) * x.n * y.n, 6) AS gain
    FROM meta JOIN sizes x ON ca = x.community JOIN sizes y ON cb = y.community"""

  /** Robustness scalar = fraction always-satisfied (A9). */
  val robustness: String = s"""WITH $graphCtes,
    cand AS (
      SELECT id, community, CAST(sum(friends) AS BIGINT) AS friends FROM (
        SELECT s.src AS id, m.community, 1 AS friends FROM sym s JOIN m0 m ON s.dst = m.id
        UNION ALL
        SELECT id, community, 0 AS friends FROM m0
      ) GROUP BY id, community),
    sizes AS (SELECT community, CAST(count(*) AS BIGINT) AS csize FROM m0 GROUP BY community),
    pay AS (
      SELECT c.id, c.friends,
             s.csize - c.friends - (CASE WHEN c.community = m.community THEN 1 ELSE 0 END) AS strangers,
             (c.community = m.community) AS iscur
      FROM cand c JOIN sizes s ON c.community = s.community JOIN m0 m ON c.id = m.id),
    agg AS (
      SELECT id, max(friends) AS maxf, min(strangers) AS mins,
             max(CASE WHEN iscur THEN friends END) AS curf,
             max(CASE WHEN iscur THEN strangers END) AS curs
      FROM pay GROUP BY id)
    SELECT round(avg(CASE WHEN curf = maxf AND curs = mins THEN 1.0 ELSE 0.0 END), 6) AS robustness
    FROM agg"""

  /** Degree histogram (A16). */
  val degreeHist: String = s"""WITH $graphCtes,
    deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY src)
    SELECT CAST(degree AS BIGINT) AS degree, CAST(count(*) AS BIGINT) AS n_vertices
    FROM deg GROUP BY degree"""

  /** Top-10 by 3-iteration PageRank; ordered on the ROUNDED rank + id so
    * both engines cut the same set. */
  val topkPagerank: String = {
    val base = pagerank(3)
    s"""WITH ranked AS ($base)
    SELECT id, rank FROM ranked ORDER BY rank DESC, id ASC LIMIT 10"""
  }

  /** Mean ± 95% CI per group (A14). */
  val statsCi: String = """
    SELECT l_returnflag,
           round(avg(l_quantity), 6) AS mean_qty,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           CAST(count(*) AS BIGINT) AS n,
           round(1.96 * stddev_samp(l_quantity) / sqrt(count(*)), 6) AS ci95
    FROM lineitem GROUP BY l_returnflag"""

  /** Pivot heatmap (A15): avg quantity by returnflag x linestatus. */
  val pivot: String = """
    SELECT l_returnflag,
           round(avg(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 6) AS F,
           round(avg(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 6) AS O
    FROM lineitem GROUP BY l_returnflag"""

  /** Distinct counts (A17). */
  val distinctCounts: String = """
    SELECT CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem"""

  // ------------------------------------------------- documents/embeddings

  /** Per-row content sha256 — THE per-row invariant (BASELINE.json). */
  val sha: String =
    "SELECT doc_id, sha256(text) AS sha FROM documents"

  val dedupExact: String = """
    SELECT sha256(text) AS content_sha,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS dup_count
    FROM documents GROUP BY sha256(text)"""

  /** Shared tokenizer, mirroring TextOps.tokens. */
  private val toksCte = """
    toks AS (
      SELECT doc_id,
             list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' '),
                         x -> x <> '') AS t
      FROM documents)"""

  private val stopwords =
    "['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','be','this','that','from']"

  /** Real BPE token count: mirrors Bpe.bpeCount — the same delimiter-wrapped
    * symbol string and the same ordered one-replace-per-merge chain, with
    * the learned merges embedded as literals (the shipped-tokenizer
    * artifact). Built-in `replace` is leftmost non-overlapping in both
    * engines, which IS one-pass-per-merge BPE application. */
  def bpeCount(merges: Seq[(String, String)]): String = {
    val base = "regexp_replace(coalesce(list_aggregate(t, 'string_agg', ' '), '')," +
      " '([a-z0-9])', '_\\1_', 'g')"
    val chain = merges.foldLeft(base) { case (s, (a, b)) =>
      s"replace($s, '_${a}__${b}_', '_$a$b" + "_')"
    }
    s"""WITH $toksCte,
    sym AS (SELECT doc_id, $chain AS s FROM toks)
    SELECT doc_id,
           CAST((length(s) - length(replace(s, '_', ''))) // 2 AS BIGINT) AS bpe_tokens
    FROM sym"""
  }

  /** BPE subword pieces in document order (mirrors Bpe.bpeEncode): same
    * replace chain as bpeCount, then every `_piece_` extracted. */
  def bpeEncode(merges: Seq[(String, String)]): String = {
    val base = "regexp_replace(coalesce(list_aggregate(t, 'string_agg', ' '), '')," +
      " '([a-z0-9])', '_\\1_', 'g')"
    val chain = merges.foldLeft(base) { case (s, (a, b)) =>
      s"replace($s, '_${a}__${b}_', '_$a$b" + "_')"
    }
    s"""WITH $toksCte,
    sym AS (SELECT doc_id, regexp_extract_all($chain, '_([a-z0-9]+)_', 1) AS p FROM toks)
    SELECT doc_id, CAST(generate_subscripts(p, 1) AS BIGINT) AS pos, unnest(p) AS piece
    FROM sym"""
  }

  /** C4-style line cleaning stats over documents + planted multiline docs
    * — mirrors TextOps.c4LineStats (keep = trimmed line matches both
    * '[.!?]$' and '^\\S+(\\s+\\S+){2}'; both engines use partial-match
    * regex semantics). */
  def c4Clean(planted: Seq[(Long, String)]): String = {
    val values = planted.map { case (id, t) =>
      val lit = t.split("\n", -1).map(l => s"'${l.replace("'", "''")}'")
        .mkString(" || chr(10) || ")
      s"(CAST($id AS BIGINT), $lit)"
    }.mkString(",\n      ")
    s"""WITH alldocs AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT * FROM (VALUES $values) v(doc_id, text)),
    l AS (
      SELECT doc_id, string_split(text, chr(10)) AS lines FROM alldocs),
    k AS (
      SELECT doc_id, lines,
             list_filter(lines, x -> regexp_matches(trim(x), '[.!?]$$')
                                 AND regexp_matches(trim(x), '^\\S+(\\s+\\S+){2}')) AS kept
      FROM l)
    SELECT doc_id,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CASE WHEN len(lines) > 0
                THEN round(1.0 - len(list_distinct(lines)) * 1.0 / len(lines), 6)
                ELSE 0.0 END AS dup_line_frac,
           sha256(coalesce(list_aggregate(kept, 'string_agg', chr(10)), '')) AS cleaned_sha
    FROM k"""
  }

  /** Top-bigram repetition signal — mirrors TextOps.topBigramStats
    * (tie-break: highest count, then lexicographically smallest bigram). */
  val topBigram: String = s"""WITH $toksCte,
    tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
    big AS (
      SELECT a.doc_id, a.w || ' ' || b.w AS bg, count(*) AS cnt
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      GROUP BY 1, 2),
    top AS (
      SELECT doc_id, bg, cnt,
             row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bg ASC) AS rn
      FROM big),
    n AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
    SELECT n.doc_id, n.n_tokens,
           coalesce(t.bg, '') AS top_bigram,
           CAST(coalesce(t.cnt, 0) AS BIGINT) AS top_cnt,
           CASE WHEN n.n_tokens > 0
                THEN round(coalesce(t.cnt, 0) * 2.0 / n.n_tokens, 6)
                ELSE 0.0 END AS top_bigram_frac
    FROM n LEFT JOIN top t ON n.doc_id = t.doc_id AND t.rn = 1"""

  val textStats: String = s"""WITH $toksCte,
    base AS (
      SELECT d.doc_id, d.text, t.t,
             CAST(len(t.t) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(t.t)) AS BIGINT) AS n_distinct_tokens
      FROM documents d JOIN toks t USING (doc_id)),
    stats AS (
      SELECT doc_id, n_tokens, n_distinct_tokens,
        CASE WHEN n_tokens > 0
             THEN len(list_filter(t, x -> list_contains($stopwords, x))) * 1.0 / n_tokens
             ELSE 0.0 END AS stopword_ratio,
        CASE WHEN length(text) > 0
             THEN (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))) * 1.0 / length(text)
             ELSE 0.0 END AS punct_ratio,
        CASE WHEN n_tokens > 0
             THEN list_aggregate(list_transform(t, x -> length(x)), 'sum') * 1.0 / n_tokens
             ELSE 0.0 END AS mean_word_len,
        CASE WHEN n_tokens > 0
             THEN 1.0 - n_distinct_tokens * 1.0 / n_tokens
             ELSE 0.0 END AS repetition_ratio
      FROM base)
    SELECT doc_id, n_tokens, n_distinct_tokens,
           round(stopword_ratio, 6) AS stopword_ratio,
           round(punct_ratio, 6) AS punct_ratio,
           round(mean_word_len, 6) AS mean_word_len,
           round(repetition_ratio, 6) AS repetition_ratio,
           round(greatest(0.0, least(1.0,
             0.25 * (CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END)
             + 0.25 * (CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.6 THEN 1.0 ELSE 0.0 END)
             + 0.25 * (CASE WHEN punct_ratio < 0.2 THEN 1.0 ELSE 0.0 END)
             + 0.25 * (1.0 - repetition_ratio))), 6) AS quality_score
    FROM stats"""

  /** Quality keep/drop verdict over documents + planted bad rows — mirrors
    * TextOps.qualityVerdict with the QualityConfig DEFAULT thresholds
    * (minTokens 10, maxTokens 100000, mean word len [2,12], punct > 0.2,
    * stopword < 0.05, repetition > 0.5, allowed langs en/und). Thresholds
    * compare UNROUNDED ratios on both sides. */
  def quality(planted: Seq[(Long, String)]): String = {
    val values = planted.map { case (id, t) =>
      s"(CAST($id AS BIGINT), '${t.replace("'", "''")}')"
    }.mkString(",\n      ")
    val scoreSelects = langMarkers.map { case (code, arr) =>
      s"SELECT doc_id, '$code' AS code, len(list_filter(t, x -> list_contains($arr, x))) AS score FROM toks"
    }.mkString("\n      UNION ALL ")
    s"""WITH alldocs AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT * FROM (VALUES $values) v(doc_id, text)),
    toks AS (
      SELECT doc_id,
             list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' '),
                         x -> x <> '') AS t
      FROM alldocs),
    base AS (
      SELECT d.doc_id, d.text, t.t,
             CAST(len(t.t) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(t.t)) AS BIGINT) AS n_distinct_tokens
      FROM alldocs d JOIN toks t USING (doc_id)),
    stats AS (
      SELECT doc_id, n_tokens,
        CASE WHEN n_tokens > 0
             THEN len(list_filter(t, x -> list_contains($stopwords, x))) * 1.0 / n_tokens
             ELSE 0.0 END AS stopword_ratio,
        CASE WHEN length(text) > 0
             THEN (length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g'))) * 1.0 / length(text)
             ELSE 0.0 END AS punct_ratio,
        CASE WHEN n_tokens > 0
             THEN list_aggregate(list_transform(t, x -> length(x)), 'sum') * 1.0 / n_tokens
             ELSE 0.0 END AS mean_word_len,
        CASE WHEN n_tokens > 0
             THEN 1.0 - n_distinct_tokens * 1.0 / n_tokens
             ELSE 0.0 END AS repetition_ratio
      FROM base),
    scores AS ($scoreSelects),
    best AS (
      SELECT doc_id, code, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, code ASC) AS rn
      FROM scores),
    lang AS (
      SELECT doc_id, CASE WHEN score > 0 THEN code ELSE 'und' END AS lang_guess
      FROM best WHERE rn = 1),
    verdict AS (
      SELECT s.doc_id, l.lang_guess,
        concat_ws(',',
          CASE WHEN n_tokens < 10 THEN 'too_short' END,
          CASE WHEN n_tokens > 100000 THEN 'too_long' END,
          CASE WHEN n_tokens > 0 AND (mean_word_len < 2.0 OR mean_word_len > 12.0)
               THEN 'word_len_out_of_range' END,
          CASE WHEN punct_ratio > 0.2 THEN 'symbol_heavy' END,
          CASE WHEN stopword_ratio < 0.05 THEN 'low_stopword' END,
          CASE WHEN repetition_ratio > 0.5 THEN 'repetitious' END,
          CASE WHEN l.lang_guess NOT IN ('en', 'und') THEN 'non_target_lang' END) AS drop_reason
      FROM stats s JOIN lang l USING (doc_id))
    SELECT doc_id, lang_guess, drop_reason, (drop_reason = '') AS keep FROM verdict"""
  }

  private val langMarkers: Seq[(String, String)] = Seq(
    "de" -> "['der','die','und','das','von','ist','den','mit','nicht','ein']",
    "en" -> "['the','and','of','to','in','is','that','it','was','for']",
    "es" -> "['el','la','de','que','y','en','los','del','las','por']",
    "fr" -> "['le','la','de','et','les','des','est','une','dans','que']",
    "pt" -> "['o','a','de','que','e','do','da','em','um','para']")

  val langId: String = {
    val scoreSelects = langMarkers.map { case (code, arr) =>
      s"SELECT doc_id, '$code' AS code, len(list_filter(t, x -> list_contains($arr, x))) AS score FROM toks"
    }.mkString("\n      UNION ALL ")
    s"""WITH $toksCte,
    scores AS ($scoreSelects),
    best AS (
      SELECT doc_id, code, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, code ASC) AS rn
      FROM scores)
    SELECT doc_id, CASE WHEN score > 0 THEN code ELSE 'und' END AS lang_guess
    FROM best WHERE rn = 1"""
  }

  /** Word-trigram shingle CTE mirroring Dedup.shingles(n=3): distinct
    * trigrams; docs with < 3 tokens contribute one whole-text shingle.
    * `shk` mirrors the engine's document-frequency cap (maxShingleDF=1000):
    * hub shingles are dropped BEFORE the candidate self-join and doc sizes
    * are counted over the kept universe. */
  private val shingleBase = s"""$toksCte,
    tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
    sh0 AS (
      SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
      FROM tok a
      JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2
      UNION
      SELECT doc_id, coalesce(list_aggregate(t, 'string_agg', ' '), '') AS sh
      FROM toks WHERE len(t) < 3)"""

  private val shingleCte = s"""$shingleBase,
    shk AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 1000),
    sh AS (SELECT s.doc_id, s.sh FROM sh0 s JOIN shk USING (sh))"""

  /** Exact word-trigram Jaccard pairs >= 0.4 over the capped shingle
    * universe — mirrors Dedup.jaccardPairs. */
  val jaccardPairs: String = s"""WITH $shingleCte,
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT ida, idb, round(i * 1.0 / (x.sz + y.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes x ON ida = x.doc_id
    JOIN sizes y ON idb = y.doc_id
    WHERE i * 1.0 / (x.sz + y.sz - i) >= 0.4"""

  /** Dedup survivorship (Dedup.dedupSurvivors over jaccardPairs >= 0.4):
    * documents UNION 5 planted exact dups (doc_id + 1e6, same text — the
    * q_stream_dedup plant, guaranteeing nontrivial clusters at every sf);
    * duplicate clusters = connected components of the pair graph via the
    * recursive min-label CTE (the q_cc pattern); cluster = component min,
    * keep = (doc_id = cluster). */
  val dupSurvivors: String = {
    // Loud guard on the textual retarget: if toksCte's shape ever changes
    // so the marker stops matching, fail at construction instead of
    // silently shingling `documents` while the engine includes the plants.
    require(shingleCte.contains("FROM documents)"),
      "dupSurvivors: toksCte no longer matches the 'FROM documents)' retarget marker")
    val shingleOverAll = shingleCte.replace("FROM documents)", "FROM alldocs)")
    s"""WITH RECURSIVE alldocs AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 5),
    $shingleOverAll,
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT ida, idb FROM inter
      JOIN sizes x ON ida = x.doc_id
      JOIN sizes y ON idb = y.doc_id
      WHERE i * 1.0 / (x.sz + y.sz - i) >= 0.4),
    dsym AS (SELECT ida AS src, idb AS dst FROM pairs
             UNION ALL SELECT idb, ida FROM pairs),
    r(n, l) AS (
      SELECT doc_id, doc_id FROM alldocs
      UNION
      SELECT s.dst, r.l FROM r JOIN dsym s ON r.n = s.src WHERE r.l < s.dst
    )
    SELECT n AS doc_id, CAST(min(l) AS BIGINT) AS cluster,
           (min(l) = n) AS keep
    FROM r GROUP BY n"""
  }

  /** Directed containment pairs |A∩B|/|A| >= 0.6 over the capped shingle
    * universe — mirrors Dedup.containmentPairs (both directions, a <> b). */
  val containmentPairs: String = s"""WITH $shingleCte,
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT ida, idb, round(i * 1.0 / x.sz, 6) AS containment
    FROM inter
    JOIN sizes x ON ida = x.doc_id
    WHERE i * 1.0 / x.sz >= 0.6"""

  /** Winnowing fingerprints (k=3, w=4) — mirrors Dedup.winnowFingerprints:
    * positional trigrams, 40-bit portable md5 gram hashes, min per 4-hash
    * window, distinct minima; docs with fewer than 4 grams keep the global
    * minimum. */
  val winnowFp: String = s"""WITH $toksCte,
    tok AS (SELECT doc_id, unnest(t) AS w, generate_subscripts(t, 1) AS i FROM toks),
    gram AS (
      SELECT a.doc_id, a.i AS pos, a.w || ' ' || b.w || ' ' || c.w AS g
      FROM tok a
      JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2
      UNION ALL
      SELECT doc_id, 1 AS pos, coalesce(list_aggregate(t, 'string_agg', ' '), '') AS g
      FROM toks WHERE len(t) < 3),
    gh AS (SELECT doc_id, pos,
                  ('0x' || substr(md5('wn:' || g), 1, 10))::BIGINT AS h FROM gram),
    cnt AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY doc_id),
    wins AS (
      SELECT a.doc_id, a.pos, min(b.h) AS fp
      FROM gh a
      JOIN cnt c ON a.doc_id = c.doc_id AND a.pos <= c.n - 3
      JOIN gh b ON a.doc_id = b.doc_id AND b.pos BETWEEN a.pos AND a.pos + 3
      WHERE c.n >= 4
      GROUP BY a.doc_id, a.pos),
    small AS (
      SELECT g.doc_id, min(g.h) AS fp
      FROM gh g JOIN cnt c ON g.doc_id = c.doc_id
      WHERE c.n < 4 GROUP BY g.doc_id)
    SELECT DISTINCT doc_id, fp FROM (
      SELECT doc_id, fp FROM wins
      UNION ALL SELECT doc_id, fp FROM small) u"""

  /** Winnow-overlap pairs (>= 2 shared df-capped fingerprints) — mirrors
    * Dedup.winnowOverlapPairs over the winnowFp fingerprint set. */
  val winnowOverlapPairs: String = s"""WITH fps AS ($winnowFp),
    keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 1000),
    kf AS (SELECT f.doc_id, f.fp FROM fps f JOIN keep USING (fp))
    SELECT a.doc_id AS ida, b.doc_id AS idb,
           CAST(count(*) AS BIGINT) AS shared_fps
    FROM kf a JOIN kf b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 2"""

  /** Exact cosine near-dup pairs >= 0.4 over the DETERMINISTIC 1/5 sample
    * of embeddings (double math). The exact all-pairs product is a
    * verification baseline only; the full corpus runs through the LSH path. */
  val embedPairs: String = """
    WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0)
    SELECT a.vec_id AS ida, b.vec_id AS idb,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
    FROM s a JOIN s b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4"""

  /** Brute-force top-3 cosine neighbors for query vectors vec_id < 5. */
  val annTopK: String = """
    WITH scored AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
             list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 5),
    ranked AS (
      SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rk
      FROM scored)
    SELECT qid, nid, round(cos, 6) AS cos, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3"""

  /** 5-minute tumbling window over events (batch equivalent of the
    * streaming path). */
  val eventsWindow: String = """
    SELECT CAST(epoch(time_bucket(INTERVAL '5 minutes', ts)) AS BIGINT) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 6) AS total_value
    FROM events GROUP BY 1, 2"""

  /** Batch-degenerate streaming dedup (EventStream.dedupStream): earliest
    * synthetic event time per sha256(text) — ts = timestamp_seconds(doc_id)
    * is monotone in doc_id, so ORDER BY doc_id replays the tie-break
    * exactly. The 5 planted repeats (doc_id + 1e6, same text, later ts)
    * mirror the Spark query's union. */
  val streamDedup: String = """
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 5
    )
    SELECT doc_id, content_sha
    FROM (SELECT doc_id, sha256(text) AS content_sha,
                 row_number() OVER (PARTITION BY sha256(text)
                                    ORDER BY doc_id) AS rn
          FROM all_docs) t
    WHERE rn = 1"""

  // ------------------------------------------------------ round-2 oracles

  /** Resolution spectrum (Metrics.resolutionSpectrum): equilibrium fraction
    * per alpha in 0.0..1.0 step 0.1 under m0, numpy-isclose tolerance.
    * Alphas are CAST to DOUBLE (DuckDB numeric literals are DECIMAL) so the
    * payoff arithmetic is bit-identical to Spark's. */
  val spectrum: String = s"""WITH $graphCtes,
    cand AS (
      SELECT id, community, CAST(sum(friends) AS BIGINT) AS friends FROM (
        SELECT s.src AS id, m.community, 1 AS friends FROM sym s JOIN m0 m ON s.dst = m.id
        UNION ALL
        SELECT id, community, 0 AS friends FROM m0
      ) GROUP BY id, community),
    sizes AS (SELECT community, CAST(count(*) AS BIGINT) AS csize FROM m0 GROUP BY community),
    pay AS (
      SELECT c.id, c.friends,
             CAST(s.csize - c.friends - (CASE WHEN c.community = m.community THEN 1 ELSE 0 END) AS BIGINT) AS strangers,
             (c.community = m.community) AS iscur
      FROM cand c JOIN sizes s ON c.community = s.community JOIN m0 m ON c.id = m.id),
    alphas AS (SELECT CAST(unnest([0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0]) AS DOUBLE) AS alpha),
    pa AS (
      SELECT a.alpha, p.id,
             p.friends * (1.0 - a.alpha) - p.strangers * a.alpha AS payoff,
             p.iscur
      FROM pay p CROSS JOIN alphas a),
    agg AS (
      SELECT alpha, id, max(payoff) AS maxp,
             max(CASE WHEN iscur THEN payoff END) AS curp
      FROM pa GROUP BY alpha, id)
    SELECT alpha,
           round(avg(CASE WHEN abs(curp - maxp) <= 1e-8 + 1e-5 * abs(maxp)
                          THEN 1.0 ELSE 0.0 END), 6) AS equilibrium_fraction
    FROM agg GROUP BY alpha"""

  /** Decode-stub features over documents-derived media: dim d value = byte
    * d of sha256(text), recovered from the hex digest (mirrors
    * Multimodal.fromDocuments + decodeBatch). */
  val mediaFeatures: String = """
    WITH m AS (
      SELECT doc_id AS media_id,
             (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
             sha256(text) AS hx
      FROM documents)
    SELECT m.media_id, m.kind, CAST(d.dim AS INT) AS dim,
           CAST((strpos('0123456789abcdef', substr(m.hx, CAST(2 * d.dim + 1 AS INT), 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(m.hx, CAST(2 * d.dim + 2 AS INT), 1)) - 1)
             AS DOUBLE) AS value
    FROM m CROSS JOIN generate_series(0, 7) AS d(dim)"""

  /** REAL image decode oracle: the engine PNG-encodes a deterministic
    * pixel law (Multimodal.chR/chG/chB over imgWidth x imgHeight) with
    * javax.imageio, decodes it back, and aggregates channel means. PNG is
    * lossless and the law is closed-form, so DuckDB recomputes the
    * expected means from arithmetic alone — a green hash verifies the
    * entire encode -> decode -> aggregate roundtrip, not a stub. */
  val mediaReal: String = """
    WITH img AS (
      SELECT CAST(doc_id AS BIGINT) AS media_id,
             CAST(8 + doc_id % 16 AS INT) AS width,
             CAST(8 + (doc_id*3) % 16 AS INT) AS height
      FROM documents),
    px AS (
      SELECT media_id, width, height,
             CAST(xs.x AS BIGINT) AS x, CAST(ys.y AS BIGINT) AS y
      FROM img, LATERAL (SELECT unnest(range(0, width)) AS x) xs,
                LATERAL (SELECT unnest(range(0, height)) AS y) ys)
    SELECT media_id, 'png' AS codec, width, height,
      round(CAST(sum((x*31 + y*17 + media_id*7) % 256) AS DOUBLE) / (width*height), 6) AS mean_r,
      round(CAST(sum((x*13 + y*29 + media_id*3) % 256) AS DOUBLE) / (width*height), 6) AS mean_g,
      round(CAST(sum((x*11 + y*23 + media_id*5) % 256) AS DOUBLE) / (width*height), 6) AS mean_b
    FROM px GROUP BY 1,2,3,4"""

  /** Frame-sample plan for the video rows of documents-derived media:
    * one row per 60 s tick of durationMs = (doc_id*7919) % 600000 + 1. */
  val framePlan: String = """
    WITH v AS (
      SELECT doc_id AS media_id, (doc_id * 7919) % 600000 + 1 AS dur
      FROM documents WHERE doc_id % 3 = 2)
    SELECT media_id,
           CAST(unnest(generate_series(0, dur, 60000)) AS BIGINT) AS frame_ts_ms
    FROM v"""

  /** Connected components on the SPARSE (shared-order) supplier graph. */
  val ccSparse: String = s"""WITH RECURSIVE $sparseCtes,
    r(n, l) AS (
      SELECT id, id FROM verts
      UNION
      SELECT s.dst, r.l FROM r JOIN sym s ON r.n = s.src WHERE r.l < s.dst
    )
    SELECT n AS id, CAST(min(l) AS BIGINT) AS comp FROM r GROUP BY n"""

  /** P3 induced subgraph: community 0 of m0 ∪ its neighbors, both-endpoint
    * semi-join (mirrors GraphOps.communityWithNeighbors + inducedSubgraph). */
  val induced: String = s"""WITH $sparseCtes,
    inside AS (SELECT id FROM m0 WHERE community = 0),
    nbrs AS (SELECT DISTINCT s.dst AS id FROM sym s JOIN inside i ON s.src = i.id),
    vset AS (SELECT id FROM inside UNION SELECT id FROM nbrs)
    SELECT e.src, e.dst, e.weight
    FROM edges e JOIN vset a ON e.src = a.id JOIN vset b ON e.dst = b.id"""

  /** Shared alpha=0 preference CTE chunk over the sparse graph: per node
    * the max-friends candidate, own community winning ties, then smallest
    * label (mirrors Hedonic.preferred). */
  private def prefCtes(membershipCte: String): String = s"""
    cand AS (
      SELECT id, community, CAST(sum(friends) AS BIGINT) AS friends FROM (
        SELECT s.src AS id, m.community, 1 AS friends FROM sym s JOIN $membershipCte m ON s.dst = m.id
        UNION ALL
        SELECT id, community, 0 AS friends FROM $membershipCte
      ) GROUP BY id, community),
    ranked AS (
      SELECT c.id, c.community,
             row_number() OVER (PARTITION BY c.id
               ORDER BY c.friends DESC,
                        (c.community = m.community) DESC,
                        c.community ASC) AS rn
      FROM cand c JOIN $membershipCte m ON c.id = m.id),
    prefs AS (SELECT id, community AS pref FROM ranked WHERE rn = 1)"""

  /** M4 one-pass hedonic at alpha = 0 (Hedonic.onePass). */
  val onePass: String = s"""WITH $sparseCtes, ${prefCtes("m0")}
    SELECT id, CAST(pref AS BIGINT) AS community FROM prefs"""

  /** A11 per-community count of nodes preferring it (Hedonic.wantingToMove). */
  val wanting: String = s"""WITH $sparseCtes, ${prefCtes("m0")}
    SELECT CAST(pref AS BIGINT) AS community,
           CAST(count(*) AS BIGINT) AS n_preferring
    FROM prefs GROUP BY pref"""

  /** A12 stability of community 0 under the binary collapse
    * (Hedonic.communityStability). */
  val stability: String = s"""WITH $sparseCtes,
    mb AS (SELECT id, CASE WHEN community = 0 THEN 1 ELSE 0 END AS community FROM m0),
    ${prefCtes("mb")},
    inside AS (SELECT id FROM m0 WHERE community = 0),
    outern AS (
      SELECT DISTINCT s.dst AS id FROM sym s JOIN inside i ON s.src = i.id
      WHERE s.dst NOT IN (SELECT id FROM inside))
    SELECT
      (SELECT round(coalesce(avg(CASE WHEN p.pref = 0 THEN 1.0 ELSE 0.0 END), 0.0), 6)
         FROM prefs p JOIN inside i ON p.id = i.id) AS fraction_want_to_leave,
      (SELECT round(coalesce(avg(CASE WHEN p.pref = 1 THEN 1.0 ELSE 0.0 END), 0.0), 6)
         FROM prefs p JOIN outern o ON p.id = o.id) AS fraction_want_to_join"""

  /** A20 within-cluster degree-distribution fingerprint under m0
    * (Metrics.clusterDegreeFingerprint). */
  val clusterDegreeFp: String = s"""WITH $sparseCtes,
    within AS (
      SELECT e.src, e.dst FROM edges e
      JOIN m0 a ON e.src = a.id JOIN m0 b ON e.dst = b.id
      WHERE a.community = b.community),
    deg AS (
      SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT src AS id FROM within UNION ALL SELECT dst AS id FROM within)
      GROUP BY id)
    SELECT m.community, coalesce(d.d, 0) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM m0 m LEFT JOIN deg d ON m.id = d.id
    GROUP BY 1, 2"""

  /** Weighted degrees (strengths) on the part graph. */
  val wdegrees: String =
    s"WITH $graphCtes SELECT src AS id, sum(weight) AS strength FROM symw GROUP BY src"

  /** One weighted-majority LPA step (LabelPropagation.step weighted). */
  val wlpa1: String = s"""WITH $graphCtes,
    l0 AS (SELECT id, id % 3 AS label FROM verts),
    cnts AS (
      SELECT s.src AS id, l.label AS nbrlabel, sum(s.weight) AS cnt
      FROM symw s JOIN l0 l ON s.dst = l.id GROUP BY s.src, l.label),
    best AS (
      SELECT id, nbrlabel,
             row_number() OVER (PARTITION BY id ORDER BY cnt DESC, nbrlabel ASC) AS rn
      FROM cnts)
    SELECT l0.id, CAST(coalesce(b.nbrlabel, l0.label) AS BIGINT) AS label
    FROM l0 LEFT JOIN (SELECT id, nbrlabel FROM best WHERE rn = 1) b ON l0.id = b.id"""

  /** n fixed WEIGHTED PageRank iterations: contribution = rank * w / strength. */
  def wpagerank(n: Int): String = {
    val iters = (1 to n).map { i =>
      s"""r$i AS (
        SELECT v.id,
               (0.15 / (SELECT count(*) FROM verts)) + 0.85 * coalesce(s.c, 0.0) AS rank
        FROM verts v LEFT JOIN (
          SELECT e.dst AS id, sum(r.rank * e.weight / d.degree) AS c
          FROM symw e
          JOIN r${i - 1} r ON e.src = r.id
          JOIN wdeg d ON e.src = d.id
          GROUP BY e.dst) s ON v.id = s.id)"""
    }.mkString(",\n")
    s"""WITH $graphCtes,
      wdeg AS (SELECT src AS id, sum(weight) AS degree FROM symw GROUP BY src),
      r0 AS (SELECT id, 1.0 / (SELECT count(*) FROM verts) AS rank FROM verts),
      $iters
      SELECT id, round(rank, 6) AS rank FROM r$n"""
  }

  // -------------------------------------- round-3 oracles (portable hashes)

  /** Full gated hedonic run, replayed as `k` chained superstep levels on the
    * THIN graph from the singleton partition (mirrors q_hedonic_full:
    * Hedonic.run with the portable md5 parity gate). Levels past the
    * engine's convergence point are identity (no node strictly improves),
    * so any k >= the convergence superstep count reproduces the fixpoint —
    * 23 supersteps at sf0.01, 15 at sf0.001; k=32 carries margin. */
  def hedonicFull(k: Int): String =
    s"""WITH $thinCtes, $alphaCte,
    ms0 AS (SELECT id, id AS community FROM verts),
    ${hedonicLevelCtes(k, "")}
    SELECT id, community FROM ms$k"""

  /** `k` gated hedonic superstep levels `{p}ms1..{p}ms{k}` chaining from a
    * caller-provided `{p}ms0`, over caller-provided `sym` + `alpha` CTEs
    * (mirrors Hedonic.stepPinned / stepPlanMap — StrategySpec pins the two
    * physical strategies to identical decisions, so one SQL mirror serves
    * both). Each Hedonic.run call restarts its superstep counter at 0, so
    * the parity-gate round is always `i - 1` within a level group. */
  private def hedonicLevelCtes(k: Int, p: String): String = {
    def level(i: Int): String = {
      val prev = s"${p}ms${i - 1}"
      s"""
    ${p}cand$i AS (
      SELECT id, community, CAST(sum(friends) AS BIGINT) AS friends FROM (
        SELECT s.src AS id, m.community, 1 AS friends FROM sym s JOIN $prev m ON s.dst = m.id
        UNION ALL
        SELECT id, community, 0 AS friends FROM $prev
      ) GROUP BY id, community),
    ${p}size$i AS (SELECT community, CAST(count(*) AS BIGINT) AS csize FROM $prev GROUP BY community),
    ${p}pay$i AS (
      SELECT c.id, c.community,
             c.friends * (1.0 - (SELECT a FROM alpha)) -
               (s.csize - c.friends - (CASE WHEN c.community = m.community THEN 1 ELSE 0 END)) * (SELECT a FROM alpha) AS payoff,
             (c.community = m.community) AS iscur
      FROM ${p}cand$i c JOIN ${p}size$i s ON c.community = s.community JOIN $prev m ON c.id = m.id),
    ${p}rk$i AS (
      SELECT id, community, payoff, iscur,
             row_number() OVER (PARTITION BY id
               ORDER BY payoff DESC, iscur DESC, community ASC) AS rn,
             max(CASE WHEN iscur THEN payoff END) OVER (PARTITION BY id) AS curp,
             max(CASE WHEN iscur THEN community END) OVER (PARTITION BY id) AS curc
      FROM ${p}pay$i),
    ${p}ms$i AS (
      SELECT id,
             CAST(CASE WHEN payoff > curp AND ${gateSql("id", i - 1)}
                       THEN community ELSE curc END AS BIGINT) AS community
      FROM ${p}rk$i WHERE rn = 1)"""
    }
    (1 to k).map(level).mkString(",\n")
  }

  /** q_whedonic_full: full gated WEIGHTED hedonic run from the singleton
    * partition on the thin graph — the engine's mandated co-occurrence
    * graph is weighted, so the weighted path earns the same end-to-end
    * replay as the unweighted one (q_hedonic_full). Mirrors
    * Hedonic.Config.weighted: friendship mass = sum of edge weights (symw),
    * strangers stay COUNT-based; same argmax tie-break and parity gate.
    * Levels past convergence are identity, so any k at or above the
    * engine's stopping round matches exactly. */
  def whedonicFull(k: Int): String =
    s"""WITH $thinCtes, $alphaCte,
    wms0 AS (SELECT id, id AS community FROM verts),
    ${whedonicLevelCtes(k, "w")}
    SELECT id, community FROM wms$k"""

  /** Weighted analog of hedonicLevelCtes: candidate mass from symw (wfriends)
    * drives the payoff; friends counts still size the stranger term. */
  private def whedonicLevelCtes(k: Int, p: String): String = {
    def level(i: Int): String = {
      val prev = s"${p}ms${i - 1}"
      s"""
    ${p}cand$i AS (
      SELECT id, community, CAST(sum(f1) AS BIGINT) AS friends, sum(fw) AS wfriends FROM (
        SELECT s.src AS id, m.community, 1 AS f1, s.weight AS fw
        FROM symw s JOIN $prev m ON s.dst = m.id
        UNION ALL
        SELECT id, community, 0 AS f1, 0.0 AS fw FROM $prev
      ) GROUP BY id, community),
    ${p}size$i AS (SELECT community, CAST(count(*) AS BIGINT) AS csize FROM $prev GROUP BY community),
    ${p}pay$i AS (
      SELECT c.id, c.community,
             c.wfriends * (1.0 - (SELECT a FROM alpha)) -
               (s.csize - c.friends - (CASE WHEN c.community = m.community THEN 1 ELSE 0 END)) * (SELECT a FROM alpha) AS payoff,
             (c.community = m.community) AS iscur
      FROM ${p}cand$i c JOIN ${p}size$i s ON c.community = s.community JOIN $prev m ON c.id = m.id),
    ${p}rk$i AS (
      SELECT id, community, payoff, iscur,
             row_number() OVER (PARTITION BY id
               ORDER BY payoff DESC, iscur DESC, community ASC) AS rn,
             max(CASE WHEN iscur THEN payoff END) OVER (PARTITION BY id) AS curp,
             max(CASE WHEN iscur THEN community END) OVER (PARTITION BY id) AS curc
      FROM ${p}pay$i),
    ${p}ms$i AS (
      SELECT id,
             CAST(CASE WHEN payoff > curp AND ${gateSql("id", i - 1)}
                       THEN community ELSE curc END AS BIGINT) AS community
      FROM ${p}rk$i WHERE rn = 1)"""
    }
    (1 to k).map(level).mkString(",\n")
  }

  /** q_sbm_recover: EXACT generator-replay oracle. GraphGen.sbm /
    * groundTruth / noisyPartition draw from the portable md5 family, so
    * the 3x20 planted graph (pIn .5, pOut .02, seed 11) and the 30%-noisy
    * init (seed 12) are reproduced in SQL, then k = the engine's
    * maxSupersteps gated hedonic levels replay the run — equal caps make
    * the match exact whether or not the run converges. alpha = density
    * over the EDGE-DERIVED vertex set (GraphOps.density), while the
    * membership state covers all 60 generated ids. */
  def sbmRecover(k: Int): String = {
    val m = 1000000L
    val draw = "(('0x' || substr(md5('sbm:11:' || a.id || ':' || b.id), 1, 8))::BIGINT % " + m + ")"
    s"""WITH
    ids AS (SELECT range AS id FROM range(60)),
    edges AS (
      SELECT a.id AS src, b.id AS dst FROM ids a JOIN ids b ON a.id < b.id
      WHERE $draw < (CASE WHEN a.id // 20 = b.id // 20 THEN ${(0.5 * m).toLong} ELSE ${(0.02 * m).toLong} END)),
    sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
    verts AS (SELECT DISTINCT src AS id FROM sym),
    $alphaCte,
    ms0 AS (
      SELECT id,
             CAST(CASE WHEN (('0x' || substr(md5('nz:12:' || id), 1, 8))::BIGINT % $m) < ${(0.3 * m).toLong}
                  THEN (('0x' || substr(md5('nc:12:' || id), 1, 8))::BIGINT % 3)
                  ELSE id // 20 END AS BIGINT) AS community
      FROM ids),
    ${hedonicLevelCtes(k, "")}
    SELECT id, community FROM ms$k"""
  }

  /** q_hedonic_frontier: the queue-variant executor replayed as `k` levels
    * with explicit frontier tracking (mirrors HedonicFrontier.run — gather
    * restricted to the active set, new frontier = movers' outside-community
    * neighbors + movers + gated wanters). k = the engine's maxSupersteps,
    * so the match is exact whether the frontier empties early (levels past
    * that are identity: empty frontier -> no candidates -> no movers) or
    * the cap is hit. */
  def hedonicFrontier(k: Int): String = {
    def level(i: Int): String = {
      val prev = s"ms${i - 1}"
      val prevF = s"fr${i - 1}"
      s"""
    fcand$i AS (
      SELECT id, community, CAST(sum(friends) AS BIGINT) AS friends FROM (
        SELECT s.src AS id, m.community, 1 AS friends
        FROM sym s JOIN $prevF fa ON s.src = fa.id JOIN $prev m ON s.dst = m.id
        UNION ALL
        SELECT m.id, m.community, 0 AS friends FROM $prev m JOIN $prevF f ON m.id = f.id
      ) GROUP BY id, community),
    fsize$i AS (SELECT community, CAST(count(*) AS BIGINT) AS csize FROM $prev GROUP BY community),
    fpay$i AS (
      SELECT c.id, c.community,
             c.friends * (1.0 - (SELECT a FROM alpha)) -
               (s.csize - c.friends - (CASE WHEN c.community = m.community THEN 1 ELSE 0 END)) * (SELECT a FROM alpha) AS payoff,
             (c.community = m.community) AS iscur
      FROM fcand$i c JOIN fsize$i s ON c.community = s.community JOIN $prev m ON c.id = m.id),
    fdec$i AS (
      SELECT id, community AS newcomm, payoff > curp AS wants,
             ${gateSql("id", i - 1)} AS gated
      FROM (
        SELECT id, community, payoff,
               row_number() OVER (PARTITION BY id
                 ORDER BY payoff DESC, iscur DESC, community ASC) AS rn,
               max(CASE WHEN iscur THEN payoff END) OVER (PARTITION BY id) AS curp
        FROM fpay$i) WHERE rn = 1),
    fmv$i AS (SELECT id, newcomm FROM fdec$i WHERE wants AND gated),
    ms$i AS (
      SELECT p.id, CAST(coalesce(v.newcomm, p.community) AS BIGINT) AS community
      FROM $prev p LEFT JOIN fmv$i v ON p.id = v.id),
    fr$i AS (
      SELECT DISTINCT id FROM (
        SELECT s.dst AS id
        FROM sym s JOIN fmv$i v ON s.src = v.id JOIN ms$i m ON s.dst = m.id
        WHERE m.community <> v.newcomm
        UNION ALL SELECT id FROM fmv$i
        UNION ALL SELECT id FROM fdec$i WHERE wants AND NOT gated))"""
    }
    s"""WITH $thinCtes, $alphaCte,
    ms0 AS (SELECT id, community FROM m0),
    fr0 AS (SELECT id FROM m0),
    ${(1 to k).map(level).mkString(",\n")}
    SELECT id, community FROM ms$k"""
  }

  /** `k` merge rounds `{p}mm1..{p}mm{k}` chaining from `{p}mm0` (mirrors
    * Leiden.mergeRound: mutual-best-partner matching over positive-gain
    * meta-edges, gain = e_between - alpha*nA*nB, absorbed side -> smaller
    * id). Rounds past the fixpoint are identity (no positive mutual pair). */
  private def mergeRoundCtes(k: Int, p: String): String = {
    def round(r: Int): String = {
      val prev = s"${p}mm${r - 1}"
      s"""
    ${p}mt$r AS (
      SELECT least(m1.community, m2.community) AS ca,
             greatest(m1.community, m2.community) AS cb,
             CAST(count(*) AS BIGINT) AS btw
      FROM edges e JOIN $prev m1 ON e.src = m1.id JOIN $prev m2 ON e.dst = m2.id
      WHERE m1.community <> m2.community GROUP BY 1, 2),
    ${p}mst$r AS (
      SELECT s.community, s.n, coalesce(i.ein, 0) AS ein FROM
        (SELECT community, CAST(count(*) AS BIGINT) AS n FROM $prev GROUP BY community) s
        LEFT JOIN
        (SELECT m1.community, CAST(count(*) AS BIGINT) AS ein
         FROM edges e JOIN $prev m1 ON e.src = m1.id JOIN $prev m2 ON e.dst = m2.id
         WHERE m1.community = m2.community GROUP BY m1.community) i
        USING (community)),
    ${p}mbd$r AS (
      SELECT ca AS c, cb AS pt, g.btw - (SELECT a FROM alpha) * na.n * nb.n AS gain
      FROM ${p}mt$r g
        JOIN ${p}mst$r na ON g.ca = na.community JOIN ${p}mst$r nb ON g.cb = nb.community
      UNION ALL
      SELECT cb AS c, ca AS pt, g.btw - (SELECT a FROM alpha) * na.n * nb.n AS gain
      FROM ${p}mt$r g
        JOIN ${p}mst$r na ON g.ca = na.community JOIN ${p}mst$r nb ON g.cb = nb.community),
    ${p}mbs$r AS (
      SELECT c, pt FROM (
        SELECT c, pt, row_number() OVER (PARTITION BY c ORDER BY gain DESC, pt ASC) AS rn
        FROM ${p}mbd$r WHERE gain > 0) WHERE rn = 1),
    ${p}mmu$r AS (
      SELECT x.c AS community, least(x.c, x.pt) AS newcomm
      FROM ${p}mbs$r x JOIN ${p}mbs$r y ON x.pt = y.c AND y.pt = x.c
      WHERE x.c <> least(x.c, x.pt)),
    ${p}mm$r AS (
      SELECT m.id, CAST(coalesce(u.newcomm, m.community) AS BIGINT) AS community
      FROM $prev m LEFT JOIN ${p}mmu$r u ON m.community = u.community)"""
    }
    (1 to k).map(round).mkString(",\n")
  }

  /** Potential scalar CTE over a members CTE (mirrors Hedonic.potential:
    * sum over communities of ein*(1-a) - (C(n,2) - ein)*a; 0 when empty). */
  private def potentialCte(name: String, membersCte: String): String = s"""
    $name AS (
      SELECT coalesce(sum(ein * (1.0 - (SELECT a FROM alpha)) -
               (n * (n - 1) / 2 - ein) * (SELECT a FROM alpha)), 0.0) AS pot FROM (
        SELECT s.n, coalesce(i.ein, 0) AS ein FROM
          (SELECT community, CAST(count(*) AS BIGINT) AS n FROM $membersCte GROUP BY community) s
          LEFT JOIN
          (SELECT m1.community, CAST(count(*) AS BIGINT) AS ein
           FROM edges e JOIN $membersCte m1 ON e.src = m1.id JOIN $membersCte m2 ON e.dst = m2.id
           WHERE m1.community = m2.community GROUP BY m1.community) i
          USING (community)))"""

  /** q_leiden_full: 2 Leiden levels replayed exactly — each level is
    * `hk` gated hedonic supersteps then `mk` merge rounds, with level 2
    * applied only when level 1's merge phase improved the global potential
    * by > 1e-12 (Leiden.run's `changed` guard). Caps equal the engine
    * query's caps, so the replay is exact with or without early
    * convergence (post-fixpoint levels/rounds are identity). */
  def leidenFull(hk: Int, mk: Int): String = {
    s"""WITH $thinCtes, $alphaCte,
    ams0 AS (SELECT id, community FROM m0),
    ${hedonicLevelCtes(hk, "a")},
    amm0 AS (SELECT id, community FROM ams$hk),
    ${mergeRoundCtes(mk, "a")},
    ${potentialCte("apotb", s"ams$hk")},
    ${potentialCte("apota", s"amm$mk")},
    chg AS (SELECT (SELECT pot FROM apota) > (SELECT pot FROM apotb) + 1e-12 AS c),
    bms0 AS (SELECT id, community FROM amm$mk),
    ${hedonicLevelCtes(hk, "b")},
    bmm0 AS (SELECT id, community FROM bms$hk),
    ${mergeRoundCtes(mk, "b")}
    SELECT id, community FROM bmm$mk WHERE (SELECT c FROM chg)
    UNION ALL
    SELECT id, community FROM amm$mk WHERE NOT (SELECT c FROM chg)"""
  }

  /** Full gated LPA replayed as `k` chained levels on the THIN graph from
    * labels = id (mirrors q_lpa_full: LabelPropagation.run, portable gate,
    * maxIter = k; levels past convergence are identity). */
  def lpaFull(k: Int): String = {
    def level(i: Int): String = {
      val prev = if (i == 1) "lb0" else s"lb${i - 1}"
      s"""
    cnt$i AS (
      SELECT s.src AS id, l.label AS nbrlabel, count(*) AS cnt
      FROM sym s JOIN $prev l ON s.dst = l.id GROUP BY s.src, l.label),
    bst$i AS (
      SELECT id, nbrlabel FROM (
        SELECT id, nbrlabel,
               row_number() OVER (PARTITION BY id ORDER BY cnt DESC, nbrlabel ASC) AS rn
        FROM cnt$i) WHERE rn = 1),
    lb$i AS (
      SELECT p.id,
             CAST(CASE WHEN b.nbrlabel IS NOT NULL AND b.nbrlabel <> p.label
                        AND ${gateSql("p.id", i - 1)}
                       THEN b.nbrlabel ELSE p.label END AS BIGINT) AS label
      FROM $prev p LEFT JOIN bst$i b ON p.id = b.id)"""
    }
    s"""WITH $thinCtes,
    lb0 AS (SELECT id, id AS label FROM verts),
    ${(1 to k).map(level).mkString(",\n")}
    SELECT id, label FROM lb$k"""
  }

  /** Banded MinHash near-dup pairs (mirrors Dedup.minhashPairs: ONE portable
    * md5 per shingle over the UNCAPPED distinct-shingle table, h1/h2 from
    * hex substrings, 64 Kirsch-Mitzenmacher permutations
    * (h1 + i*h2) mod 2^40, 16 bands of 4, bucket = md5 of the comma-joined
    * band slice, estimate = agreeing components / 64). */
  val minhashPairs: String = {
    val n = 64; val bands = 16; val r = 4; val thr = 0.35
    val m = 1L << 40
    val sigCols = (0 until n).map(i =>
      s"min((h1 + $i * h2) % $m) AS h$i").mkString(",\n        ")
    val bandSel = (0 until bands).map { b =>
      val parts = (0 until r).map(j => s"h${b * r + j}::VARCHAR").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS bucket FROM sigs"
    }.mkString("\n      UNION ALL ")
    val agree = (0 until n).map(i =>
      s"CASE WHEN x.h$i = y.h$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $shingleBase,
    shh AS (
      SELECT doc_id,
             ('0x' || substr(md5('mh:' || sh), 1, 10))::BIGINT AS h1,
             ('0x' || substr(md5('mh:' || sh), 11, 10))::BIGINT AS h2
      FROM sh0),
    sigs AS (SELECT doc_id, $sigCols FROM shh GROUP BY doc_id),
    bnd AS ($bandSel),
    cand AS (
      SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
      FROM bnd a JOIN bnd b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    est AS (
      SELECT ida, idb, ($agree) / 64.0 AS eraw
      FROM cand JOIN sigs x ON ida = x.doc_id JOIN sigs y ON idb = y.doc_id)
    SELECT ida, idb, round(eraw, 6) AS est_jaccard FROM est WHERE eraw >= $thr"""
  }

  /** SimHash chunk-pair near-dup pairs (mirrors Dedup.simhashPairs: token
    * bit k = md5 nibble k/4 >> (k%4) & 1, signs of the +/-1 sums, 5-chunk
    * choose-2 blocking, exact hamming <= 3 verify). Docs with zero tokens
    * hash to 0 (the 3-branch CASE keeps the LEFT-JOIN null row neutral). */
  val simhashPairs: String = {
    val sums = (0 until 64).map { k =>
      s"coalesce(sum(CASE WHEN h IS NULL THEN NULL WHEN (('0x' || substr(h, ${k / 4 + 1}, 1))::BIGINT >> ${k % 4}) & 1 = 1 THEN 1 ELSE -1 END), 0) AS s$k"
    }.mkString(",\n        ")
    val bits = (0 until 64).map(k =>
      s"CASE WHEN s$k > 0 THEN 1 ELSE 0 END AS b$k").mkString(",\n        ")
    val starts = Array(0, 13, 26, 39, 52); val lens = Array(13, 13, 13, 13, 12)
    val chunks = (0 until 5).map { c =>
      val terms = (0 until lens(c)).map(t => s"b${starts(c) + t} * ${1L << t}").mkString(" + ")
      s"($terms) AS c$c"
    }.mkString(",\n        ")
    val combos = for (i <- 0 until 5; j <- (i + 1) until 5) yield (i, j)
    val keySel = combos.zipWithIndex.map { case ((i, j), cid) =>
      s"SELECT doc_id, ${cid.toLong * (1L << 26)} + c$i * ${1L << 13} + c$j AS key FROM ch"
    }.mkString("\n      UNION ALL ")
    val ham = (0 until 64).map(k =>
      s"CASE WHEN x.b$k <> y.b$k THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $toksCte,
    tok2 AS (SELECT doc_id, unnest(t) AS w FROM toks),
    hw AS (SELECT doc_id, md5('sb:' || w) AS h FROM tok2),
    sms AS (
      SELECT d.doc_id,
        $sums
      FROM documents d LEFT JOIN hw ON d.doc_id = hw.doc_id
      GROUP BY d.doc_id),
    bv AS (SELECT doc_id,
        $bits
      FROM sms),
    ch AS (SELECT doc_id,
        $chunks
      FROM bv),
    keys AS ($keySel),
    cand AS (
      SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
      FROM keys a JOIN keys b ON a.key = b.key AND a.doc_id < b.doc_id),
    hout AS (
      SELECT ida, idb, CAST(($ham) AS INT) AS hamming
      FROM cand JOIN bv x ON ida = x.doc_id JOIN bv y ON idb = y.doc_id)
    SELECT ida, idb, hamming FROM hout WHERE hamming <= 3"""
  }

  /** Hyperplane-LSH cosine near-dup pairs (mirrors Similarity.lshPairs:
    * 64 portable md5 hyperplanes, 4 bands of 16 sign bits MSB-first,
    * exact cosine >= 0.4 verify within bucket). */
  val lshEmbedPairs: String = {
    def comp(p: String, d: String): String =
      s"((('0x' || substr(md5('pl:' || $p || ':' || $d || ':7'), 1, 8))::BIGINT % 2000001) - 1000000) / 1000000.0"
    val bandSel = (0 until 4).map { b =>
      val terms = (0 until 16).map(t => s"s[${16 * b + t + 1}] * ${1L << (15 - t)}").mkString(" + ")
      s"SELECT vec_id, $b AS band, $terms AS bucket FROM sgn"
    }.mkString("\n      UNION ALL ")
    s"""WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id < 3),
    sgn AS (
      SELECT vec_id,
             list_transform(range(64), p ->
               CASE WHEN list_sum(list_transform(range(len(v)), d ->
                 v[d + 1] * (${comp("p", "d")}))) >= 0 THEN 1 ELSE 0 END) AS s
      FROM emb),
    bnd AS ($bandSel),
    cand AS (
      SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb
      FROM bnd a JOIN bnd b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
    ver AS (
      SELECT ida, idb, list_cosine_similarity(x.v, y.v) AS craw
      FROM cand JOIN emb x ON ida = x.vec_id JOIN emb y ON idb = y.vec_id)
    SELECT ida, idb, round(craw, 6) AS cos FROM ver WHERE craw >= 0.4"""
  }

  /** Leiden refinement pass on the THIN graph under m0 (mirrors
    * Leiden.refine): connected components over intra-community edges via
    * recursive min-label closure; members with no intra-community edge
    * keep their own id as a singleton label. */
  val leidenRefine: String = s"""WITH RECURSIVE $thinCtes,
    intra AS (
      SELECT e.src, e.dst FROM edges e
      JOIN m0 a ON e.src = a.id JOIN m0 b ON e.dst = b.id
      WHERE a.community = b.community),
    isym AS (SELECT src, dst FROM intra
             UNION ALL SELECT dst AS src, src AS dst FROM intra),
    r(n, l) AS (
      SELECT id, id FROM verts
      UNION
      SELECT s.dst, r.l FROM r JOIN isym s ON r.n = s.src WHERE r.l < s.dst
    ),
    comp AS (SELECT n AS id, min(l) AS c FROM r GROUP BY n)
    SELECT m.id, CAST(coalesce(c.c, m.id) AS BIGINT) AS community
    FROM m0 m LEFT JOIN comp c ON m.id = c.id"""

  /** M11 one reciprocal-invitation round from singletons on the THIN graph
    * (mirrors Reciprocity.mutualPairs weighted): each node invites the
    * neighbor community with max weighted friends (own wins ties, then
    * smallest label); output = distinct community pairs with a mutual
    * invitation across some edge. */
  val reciprocity1: String = s"""WITH $thinCtes,
    msr AS (SELECT id, id AS community FROM verts),
    candr AS (
      SELECT id, community, sum(w) AS friends FROM (
        SELECT s.src AS id, m.community, s.weight AS w FROM symw s JOIN msr m ON s.dst = m.id
        UNION ALL
        SELECT id, community, 0.0 AS w FROM msr
      ) GROUP BY id, community),
    rkr AS (
      SELECT c.id, c.community,
             row_number() OVER (PARTITION BY c.id
               ORDER BY c.friends DESC, (c.community = m.community) DESC, c.community ASC) AS rn
      FROM candr c JOIN msr m ON c.id = m.id),
    prefr AS (SELECT id, community AS pref FROM rkr WHERE rn = 1)
    SELECT DISTINCT least(mu.community, mv.community) AS ca,
                    greatest(mu.community, mv.community) AS cb
    FROM sym s
    JOIN prefr pu ON s.src = pu.id
    JOIN prefr pv ON s.dst = pv.id
    JOIN msr mu ON s.src = mu.id
    JOIN msr mv ON s.dst = mv.id
    WHERE pu.pref = mv.community AND pv.pref = mu.community
      AND mu.community <> mv.community"""

  /** F3 resolution thresholds (mirrors Reciprocity.resolutionThresholds on
    * the THIN graph under m0): per node and candidate-community pair a < b,
    * (friends_a - friends_b) / (strangers_a + strangers_b), NULL on zero
    * denominator (Spark try_divide; DuckDB would return inf). */
  val resThreshold: String = s"""WITH $thinCtes,
    cand AS (
      SELECT id, community, CAST(sum(friends) AS BIGINT) AS friends FROM (
        SELECT s.src AS id, m.community, 1 AS friends FROM sym s JOIN m0 m ON s.dst = m.id
        UNION ALL
        SELECT id, community, 0 AS friends FROM m0
      ) GROUP BY id, community),
    sizes AS (SELECT community, CAST(count(*) AS BIGINT) AS csize FROM m0 GROUP BY community),
    str AS (
      SELECT c.id, c.community, c.friends,
             CAST(s.csize - c.friends -
               (CASE WHEN c.community = m.community THEN 1 ELSE 0 END) AS BIGINT) AS strangers
      FROM cand c JOIN sizes s ON c.community = s.community JOIN m0 m ON c.id = m.id)
    SELECT a.id, a.community AS ca, b.community AS cb,
           a.friends AS fa, b.friends AS fb,
           a.strangers AS sa, b.strangers AS sb,
           round(CASE WHEN a.strangers + b.strangers = 0 THEN NULL
                      ELSE CAST(a.friends - b.friends AS DOUBLE) /
                           CAST(a.strangers + b.strangers AS DOUBLE)
                 END, 6) AS threshold
    FROM str a JOIN str b ON a.id = b.id AND a.community < b.community"""

  /** IVF ANN top-k (mirrors Similarity.ivfTopK, nCells=8, nProbe=2, k=3,
    * queries = vec_id < 5): centroids are the 8 vectors with the smallest
    * portable md5 sample key; every vector lives in its nearest centroid's
    * cell (tie: smaller centroid id); queries probe their 2 nearest cells
    * and re-rank exactly inside them. */
  /** Hashed text embeddings as rows (TextEmbed.embeddingRows, dim 16):
    * one md5 per token, bucket = h mod 16, sign = bit 8, L2-normalized
    * signed counts; zero-filled grid, empty docs all-zero. */
  val textEmbed: String = s"""WITH $toksCte,
    tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
    hsh AS (SELECT doc_id, ('0x' || substr(md5('eb:' || w), 1, 8))::BIGINT AS h FROM tok),
    comp AS (
      SELECT doc_id, h % 16 AS dim,
             sum(CASE WHEN (h // 256) % 2 = 0 THEN 1 ELSE -1 END) AS raw
      FROM hsh GROUP BY 1, 2),
    nrm AS (SELECT doc_id, sqrt(sum(raw * raw)) AS nrm FROM comp GROUP BY doc_id),
    grid AS (
      SELECT d.doc_id, g.dim
      FROM documents d CROSS JOIN (SELECT unnest(range(0, 16)) AS dim) g)
    SELECT g.doc_id, CAST(g.dim AS INT) AS dim,
           round(CASE WHEN n.nrm > 0 THEN coalesce(c.raw, 0) / n.nrm ELSE 0.0 END, 6) AS value
    FROM grid g
    LEFT JOIN comp c ON g.doc_id = c.doc_id AND g.dim = c.dim
    LEFT JOIN nrm n ON g.doc_id = n.doc_id"""

  /** Recall@3 of the IVF path vs the exact baseline (Similarity.annRecall
    * with the q_ann_topk / q_ivf_topk parameters: queries vec_id < 5,
    * nCells 8, nProbe 2). Set membership compares ids from UNROUNDED
    * rankings on both sides, mirroring both existing oracles. */
  val annRecall: String = """
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ex_scored AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
             list_cosine_similarity(q.v, c.v) AS cos
      FROM emb q JOIN emb c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 5),
    ex_rk AS (
      SELECT qid, nid,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rk
      FROM ex_scored),
    exact AS (SELECT qid, nid FROM ex_rk WHERE rk <= 3),
    cent AS (
      SELECT vec_id AS cid, v AS cv FROM emb
      ORDER BY ('0x' || substr(md5('ivf:' || vec_id), 1, 8))::BIGINT ASC, vec_id ASC
      LIMIT 8),
    asgn AS (
      SELECT e.vec_id, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid ASC) AS rn
      FROM emb e CROSS JOIN cent c),
    corp AS (SELECT vec_id AS nid, cid AS cell FROM asgn WHERE rn = 1),
    qry AS (SELECT vec_id AS qid, cid AS cell FROM asgn
            WHERE vec_id < 5 AND rn <= 2),
    iv_scored AS (
      SELECT q.qid, c.nid, list_cosine_similarity(x.v, y.v) AS cos
      FROM qry q JOIN corp c ON q.cell = c.cell AND c.nid <> q.qid
      JOIN emb x ON q.qid = x.vec_id JOIN emb y ON c.nid = y.vec_id),
    iv_rk AS (
      SELECT qid, nid,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rk
      FROM iv_scored),
    approx AS (SELECT qid, nid FROM iv_rk WHERE rk <= 3),
    ex_n AS (SELECT qid, count(*) AS n_exact FROM exact GROUP BY qid),
    ht AS (SELECT e.qid, count(*) AS n_hit
           FROM exact e JOIN approx a ON e.qid = a.qid AND e.nid = a.nid
           GROUP BY e.qid)
    SELECT x.qid, CAST(x.n_exact AS BIGINT) AS n_exact,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / x.n_exact, 6) AS recall
    FROM ex_n x LEFT JOIN ht h ON x.qid = h.qid"""

  val ivfTopK: String = """
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (
      SELECT vec_id AS cid, v AS cv FROM emb
      ORDER BY ('0x' || substr(md5('ivf:' || vec_id), 1, 8))::BIGINT ASC, vec_id ASC
      LIMIT 8),
    asgn AS (
      SELECT e.vec_id, c.cid,
             list_cosine_similarity(e.v, c.cv) AS craw,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid ASC) AS rn
      FROM emb e CROSS JOIN cent c),
    corp AS (SELECT vec_id AS nid, cid AS cell FROM asgn WHERE rn = 1),
    qry AS (SELECT vec_id AS qid, cid AS cell FROM asgn
            WHERE vec_id < 5 AND rn <= 2),
    scored AS (
      SELECT q.qid, c.nid,
             list_cosine_similarity(x.v, y.v) AS cos
      FROM qry q JOIN corp c ON q.cell = c.cell AND c.nid <> q.qid
      JOIN emb x ON q.qid = x.vec_id JOIN emb y ON c.nid = y.vec_id),
    ranked AS (
      SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rk
      FROM scored)
    SELECT qid, nid, round(cos, 6) AS cos, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3"""

  /** M9 spectral: `k` fixed shifted power-iteration steps of the modularity
    * matrix B = A - d d^T/2m on the THIN graph as one community (mirrors
    * Spectral.wholeGraphVector: md5-seeded start vector, sigma = 3*dmax+1,
    * each level divides the linear form by the previous iterate's norm).
    * diag_i = kin_i - d_i*Dg/2m is exactly 0 for the whole graph (kin = deg,
    * Dg = 2m, and deg*2m/2m is exact); the term is kept for structural
    * identity with the Spark expression. */
  def spectral1(k: Int): String = {
    def level(i: Int): String = {
      val prev = s"x${i - 1}"
      s"""
    sc$i AS (
      SELECT sum(d.deg * x.x) AS s1, sqrt(sum(x.x * x.x)) AS nrm
      FROM $prev x JOIN deg d ON x.id = d.id),
    g$i AS (
      SELECT e.src AS id, sum(x.x) AS y
      FROM sym e JOIN $prev x ON e.dst = x.id GROUP BY e.src),
    x$i AS (
      SELECT d.id,
             ((coalesce(g.y, 0.0) - d.deg / (SELECT m2 FROM mm) * (SELECT s1 FROM sc$i)
               - x.x * di.diag) + (SELECT sigma FROM mm) * x.x) /
             (CASE WHEN (SELECT nrm FROM sc$i) > 0 THEN (SELECT nrm FROM sc$i) ELSE 1.0 END) AS x
      FROM deg d JOIN $prev x ON d.id = x.id JOIN dia di ON d.id = di.id
      LEFT JOIN g$i g ON d.id = g.id)"""
    }
    s"""WITH $thinCtes,
    deg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS deg FROM sym GROUP BY src),
    mm AS (SELECT sum(deg) AS m2, 3 * max(deg) + 1 AS sigma FROM deg),
    dia AS (SELECT d.id,
                   d.deg - d.deg * (SELECT sum(deg) FROM deg) / (SELECT m2 FROM mm) AS diag
            FROM deg d),
    x0 AS (SELECT id,
                  ((('0x' || substr(md5('sp:' || id), 1, 8))::BIGINT % 2000001) - 1000000)
                    / 1000000.0 AS x
           FROM verts),
    ${(1 to k).map(level).mkString(",\n")}
    SELECT id, round(x, 5) AS x FROM x$k"""
  }
}
