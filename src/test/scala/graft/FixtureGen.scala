package graft

import java.nio.file.{Files, Paths}

/** One-shot generator for the committed golden fixtures under
  * src/test/resources/fixtures/ (FIXTURES.md §3). Values come from the
  * SERIAL oracles (plain Scala, no Spark), so the goldens are independent
  * of the distributed engine they gate. Run via:
  *   sbt "Test/runMain graft.FixtureGen"
  * Regenerate only when the serial semantics change intentionally.
  */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/test/resources/fixtures")
    Files.createDirectories(dir)

    // Zachary PageRank, damping .85, exactly 20 iterations.
    val pr = SerialOracle.pageRank(Fixtures.zachary, 0.85, 20)
    val prJson = pr.toSeq.sortBy(_._1)
      .map { case (id, r) => s""""$id": $r""" }.mkString("{", ", ", "}")
    Files.writeString(dir.resolve("zachary_pagerank20.json"), prJson)

    // Zachary connected components (single component) + threeComponents.
    val cc = SerialOracle.components(Fixtures.threeComponents)
    val ccJson = cc.toSeq.sortBy(_._1)
      .map { case (id, c) => s""""$id": $c""" }.mkString("{", ", ", "}")
    Files.writeString(dir.resolve("three_components.json"), ccJson)

    // Kite hedonic payoffs at alpha = density, membership id % 3:
    // rows "id,community,friends,strangers,payoff" (serial recomputation).
    val edges = Fixtures.kite
    val nbrs = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val ids = nbrs.keys.toSeq.sorted
    val m = ids.map(id => id -> (id % 3)).toMap
    val v = ids.size
    val alpha = 2.0 * edges.size / (v.toDouble * (v - 1))
    val sizes = m.values.groupBy(identity).map { case (c, xs) => c -> xs.size }
    val rows = for {
      id <- ids
      c <- (nbrs(id).map(m(_)) + m(id)).toSeq.sorted
    } yield {
      val friends = nbrs(id).count(m(_) == c)
      val own = if (m(id) == c) 1 else 0
      val strangers = sizes(c) - friends - own
      val payoff = friends * (1 - alpha) - strangers * alpha
      s"$id,$c,$friends,$strangers,$payoff"
    }
    Files.writeString(dir.resolve("kite_payoffs_m3.csv"),
      "id,community,friends,strangers,payoff\n" + rows.mkString("\n") + "\n")

    // Exhaustive best-response sinks of the two-triangle 6-vertex graph
    // (game move set, alpha = density) — one normalized partition per line,
    // communities ';'-separated, members ','-separated.
    val tt = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    val aTT = 2.0 * tt.size / (6 * 5)
    val sinkLines = ExhaustiveGroundTruth.sinks(tt, 6, aTT)
      .map(_.map(_.mkString(",")).mkString(";")).toSeq.sorted
    Files.writeString(dir.resolve("two_triangles_sinks.txt"),
      sinkLines.mkString("\n") + "\n")

    println(s"wrote ${dir.toAbsolutePath}: zachary_pagerank20.json, " +
      "three_components.json, kite_payoffs_m3.csv, two_triangles_sinks.txt " +
      s"(kite alpha=$alpha, ${sinkLines.size} sinks)")
  }
}
