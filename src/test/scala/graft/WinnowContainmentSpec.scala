package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Containment pairs + winnowing fingerprints (the round-4 additions to
  * the dedup family). Containment is pinned against a naive exact
  * computation and against the failure mode it exists for (subset docs
  * Jaccard misses); winnowing against a from-scratch JVM reference
  * implementation (same 'wn:' md5 hash) and the SWA shared-substring
  * guarantee. */
class WinnowContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "the quick brown fox jumps over the lazy dog again"
  private val corpus = Seq(
    (1L, boiler), // short doc = pure boilerplate
    (2L, s"$boiler alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten eleven twelve"),
    (3L, "completely different text with no overlap whatsoever in any token " +
      "stream here at all nothing shared"),
    (4L, boiler) // exact dup of 1
  ).toDF("doc_id", "text")

  test("containment finds the embedded boilerplate Jaccard misses") {
    val cont = Dedup.containmentPairs(corpus, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // doc 1 fully inside doc 2: containment 1.0 in the 1->2 direction
    assert(cont.exists { case (a, b, c) => a == 1L && b == 2L && c >= 0.999 })
    // but NOT 2->1 (2 is much bigger than 1)
    assert(!cont.exists { case (a, b, _) => a == 2L && b == 1L })
    // exact dups contain each other, both directions
    assert(cont.exists { case (a, b, c) => a == 1L && b == 4L && c >= 0.999 })
    assert(cont.exists { case (a, b, c) => a == 4L && b == 1L && c >= 0.999 })
    // symmetric Jaccard at the same bar misses the 1-in-2 embedding
    val jac = Dedup.jaccardPairs(corpus, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)))
  }

  test("containment matches the naive exact computation") {
    def shingleSet(t: String): Set[String] = {
      val toks = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .split(" ").filter(_.nonEmpty).toSeq
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    val sets = corpus.collect().map(r => r.getLong(0) -> shingleSet(r.getString(1))).toMap
    val expect = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      c = (sa & sb).size.toDouble / sa.size if c >= 0.6
    } yield (a, b, math.rint(c * 1e6) / 1e6)).toSet
    val got = Dedup.containmentPairs(corpus, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect)
  }

  /** JVM reference winnowing: same tokenizer, same 'wn:' md5 40-bit hash,
    * k=3 grams, w=4 windows, distinct minima. */
  private def winnowRef(t: String, k: Int = 3, w: Int = 4): Set[Long] = {
    val toks = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .split(" ").filter(_.nonEmpty).toSeq
    val grams = if (toks.length >= k) toks.sliding(k).map(_.mkString(" ")).toSeq
                else Seq(toks.mkString(" "))
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = grams.map { g =>
      val hex = md.digest(s"wn:$g".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 10), 16)
    }
    if (hs.length >= w) hs.sliding(w).map(_.min).toSet else Set(hs.min)
  }

  test("winnowing matches the JVM reference implementation") {
    val got = Dedup.winnowFingerprints(corpus).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val expect = corpus.collect().map(r => r.getLong(0) -> winnowRef(r.getString(1))).toMap
    assert(got == expect)
  }

  test("SWA guarantee: docs sharing a >= w+k-1 token run share a fingerprint") {
    // docs 1 and 2 share the 10-token boilerplate run (>= 4+3-1 = 6)
    val fps = Dedup.winnowFingerprints(corpus).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty)
    // disjoint docs share nothing
    assert((fps(1L) & fps(3L)).isEmpty)
    // exact dups have identical fingerprint sets
    assert(fps(1L) == fps(4L))
  }

  test("winnowOverlapPairs finds the boilerplate-sharing pairs, not the disjoint ones") {
    val pairs = Dedup.winnowOverlapPairs(corpus, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L))) // shared boilerplate run
    assert(pairs.contains((1L, 4L))) // exact dups
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L }) // disjoint doc
    // exact dups share their whole (identical) fingerprint set
    val fps1 = winnowRef(boiler).size
    assert(pairs((1L, 4L)) == fps1)
  }

  test("dedupSurvivors: transitive clusters, min-id survivor, singletons kept") {
    val docs = Seq(1L, 2L, 3L, 7L, 9L).toDF("doc_id")
    // chain 1-2, 2-3 (near-dup is not transitive; the cluster policy is) + 7-9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("ida", "idb")
    val got = Dedup.dedupSurvivors(docs, pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(1L) == ((1L, true)))
    assert(got(2L) == ((1L, false)))
    assert(got(3L) == ((1L, false)))
    assert(got(7L) == ((7L, true)))
    assert(got(9L) == ((7L, false)))
    // a doc in no pair is its own surviving singleton
    val solo = Seq(42L).toDF("doc_id")
    val s = Dedup.dedupSurvivors(solo, pairs.limit(0)).collect().head
    assert(s.getLong(1) == 42L && s.getBoolean(2))
  }

  test("hub-cap observability: hook counts exactly what the df caps drop") {
    // 6 docs share one boilerplate sentence -> its shingles/fingerprints
    // have df >= 6; two unique docs stay under any cap
    val hubText = "the shared boilerplate sentence repeated across many documents here"
    val docs = ((0L until 6L).map(i => (i, s"$hubText unique$i word$i extra$i")) ++
      Seq((10L, "entirely different content one"), (11L, "entirely different content two")))
      .toDF("doc_id", "text")
    val capped = Dedup.hubShingleCount(docs, maxShingleDF = 5)
    val uncapped = Dedup.hubShingleCount(docs, maxShingleDF = 1000)
    // exactly the shingles fully inside the shared sentence exceed df=5
    val expected = Dedup.shingleTable(docs, "doc_id", "text", 3)
      .groupBy("sh").agg(count(lit(1)).as("df")).filter(col("df") > 5).count()
    assert(capped == expected && capped > 0)
    assert(uncapped == 0)
    val fpCapped = Dedup.hubFingerprintCount(docs, maxFpDF = 5)
    val fpUncapped = Dedup.hubFingerprintCount(docs, maxFpDF = 1000)
    assert(fpCapped > 0 && fpUncapped == 0)
  }

  test("short docs (< w grams) emit exactly the global-min fingerprint") {
    val tiny = Seq((9L, "only two")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(tiny).collect()
    assert(fps.length == 1)
    assert(fps(0).getLong(1) == winnowRef("only two").head)
  }
}
