package graft

import org.apache.spark.sql.functions._
import graft.algo.Reciprocity
import graft.eval.Harness
import graft.graph.GraphOps
import graft.model.Edge

/** M11 reciprocity clustering + the harness-side ops it closed alongside
  * (F3, F6, O2, O4, U3, A19 — SURVEY.md §2.6-2.9 leftovers). */
class ReciprocitySpec extends SparkSpec {

  test("reciprocity fixpoint on the kite terminates, is deterministic, and groups mutual inviters") {
    val e = edgesOf(Fixtures.kite)
    val m1 = Reciprocity.run(e).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m2 = Reciprocity.run(e).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m1 == m2, "rerun must be bitwise identical (deterministic engine)")
    assert(m1.keySet == (0L to 9L).toSet)
    val nComm = m1.values.toSet.size
    assert(nComm > 1 && nComm < 10, s"expected a non-trivial merge, got $nComm communities")
    // fixpoint post-condition: no mutual invitation remains
    val sym = GraphOps.symmetrize(e).select("src", "dst")
    val members = { import spark.implicits._; m1.toSeq.toDF("id", "community") }
    assert(Reciprocity.mutualPairs(sym, members).isEmpty)
  }

  test("mutualPairs from singletons = mutual best-neighbor pairs (hand-checked)") {
    // path 0-1-2-3 with a heavy middle edge: 1 and 2 invite each other;
    // 0 invites 1 (its only neighbor) but 1 prefers 2 => only (1,2) mutual.
    import spark.implicits._
    val e = Seq(Edge(0, 1, 1.0), Edge(1, 2, 5.0), Edge(2, 3, 1.0)).toDS()
    val sym = GraphOps.symmetrize(e).select("src", "dst", "weight")
    val singles = GraphOps.vertices(e).select(col("id"), col("id").as("community"))
    val got = Reciprocity.mutualPairs(sym, singles, weighted = true).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("resolutionThresholds matches the reference formula; zero denominator is null") {
    // triangle 0-1-2 plus pendant 3 on 1; membership 0 -> A(=0), {1,2,3} -> B(=1).
    import spark.implicits._
    val e = Seq(Edge(0, 1, 1.0), Edge(0, 2, 1.0), Edge(1, 2, 1.0), Edge(1, 3, 1.0)).toDS()
    val sym = GraphOps.symmetrize(e).select("src", "dst")
    val members = Seq((0L, 0L), (1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "community")
    val rows = Reciprocity.resolutionThresholds(sym, members).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (if (r.isNullAt(7)) None else Some(r.getDouble(7)))).toMap
    // node 0: A: f=0, s=0; B: f=2, s=3-2-0=1 => (0-2)/(0+1) = -2.0
    assert(rows((0L, 0L, 1L)).contains(-2.0))
    // node 2: A: f=1, s=0; B: f=1, s=3-1-1=1 => (1-1)/(0+1) = 0.0
    assert(rows((2L, 0L, 1L)).contains(0.0))
    // node 1: A: f=1, s=0; B: f=2, s=3-2-1=0 => denominator 0 => null
    assert(rows((1L, 0L, 1L)).isEmpty)
    // node 3 has no community-A neighbor => no (A,B) pair row at all
    assert(!rows.contains((3L, 0L, 1L)))
  }

  test("F6 midpointGrid mirrors the reference generate_sequence exactly") {
    // generate_sequence(0.3, 6): [0.3,0,1] -> +0.15,+0.65 -> +0.225,+0.475
    // -> take 6 sorted. (0.15+0.3)/2 carries the same IEEE-double
    // representation the reference's Python float math produces.
    assert(Harness.midpointGrid(0.3, 6) ==
      Seq(0.0, 0.15, (0.15 + 0.3) / 2, 0.3, 0.65, 1.0))
    intercept[IllegalArgumentException](Harness.midpointGrid(0.5, 2))
  }

  test("A19 sequentialMean stops once the CI tightens and is close to the true mean") {
    // deterministic Bernoulli stream with mean 0.5 (alternating samples)
    val (mean, n) = Harness.sequentialMean(
      i => Seq.tabulate(50)(j => ((i * 50 + j) % 2).toDouble), error = 0.02)
    assert(math.abs(mean - 0.5) < 0.05, s"mean $mean")
    assert(n >= 100 && n <= 50000, s"n $n")
  }

  test("O2 slicePct takes the right fractional window of the sort order") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    val got = Harness.slicePct(df, Seq("k"), 0.2, 0.5).select("k").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(3L, 4L, 5L))
  }

  test("O4 sampleDeterministic is stable under repartitioning") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i * 2)).toDF("k", "v")
    val a = Harness.sampleDeterministic(df, 10, Seq("k")).collect().map(_.getLong(0)).toSet
    val b = Harness.sampleDeterministic(df.repartition(7), 10, Seq("k")).collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 10)
  }

  test("U3 canonicalPartitionKey is label-permutation invariant and partition-sensitive") {
    import spark.implicits._
    val p1 = Seq((0L, 5L), (1L, 5L), (2L, 9L)).toDF("id", "community")
    val p2 = Seq((0L, 1L), (1L, 1L), (2L, 0L)).toDF("id", "community") // same partition
    val p3 = Seq((0L, 1L), (1L, 0L), (2L, 0L)).toDF("id", "community") // different
    def key(df: org.apache.spark.sql.DataFrame) =
      Harness.canonicalPartitionKey(df).collect()(0).getString(0)
    assert(key(p1) == key(p2))
    assert(key(p1) != key(p3))
    assert(Harness.dedupRuns(
      Seq(("a", key(p1)), ("b", key(p2))).toDF("run", "partition_key")).count() == 1)
  }
}
