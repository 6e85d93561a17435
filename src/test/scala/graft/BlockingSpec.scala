package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sim.Similarity

/** Property tests for the sub-quadratic blocking schemes (VERDICT r1 #2):
  * each scheme's candidate generation must be (a) sound — output ⊆ the
  * exact-metric pairs at the same threshold, (b) complete where the scheme
  * guarantees it (simhash pigeonhole), or high-recall where probabilistic
  * (hyperplane LSH on seeded near-dup corpora), and (c) skew-guarded
  * (shingle document-frequency cap). */
class BlockingSpec extends SparkSpec {

  // ------------------------------------------------- hyperplane LSH

  /** Deterministic corpus: `nBase` seeded random unit-ish vectors plus one
    * tiny-perturbation near-duplicate per base vector (cos >= ~0.999). */
  private def vecCorpus(nBase: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until nBase).flatMap { i =>
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val dup = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      Seq((i.toLong * 2, v.toSeq), (i.toLong * 2 + 1, dup.toSeq))
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("pairs operators release their corpus-scale caches (pin the result only)") {
    import spark.implicits._
    val docs = (0 until 30).map { i =>
      (i.toLong, s"alpha beta gamma delta epsilon token$i tail${i % 7} extra${i % 5}")
    }.toDF("doc_id", "text")
    val vecs = vecCorpus(10, 8, 31L)
    // Each call may leave exactly ONE new persistent RDD — its own pinned
    // (tiny) result — never the corpus-scale shingle/signature/vector cache
    // (VERDICT r3 "What's wrong" #4: jaccard/minhash/simhash leaked theirs).
    def newPins(f: => org.apache.spark.sql.DataFrame): Int = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      f.count()
      (spark.sparkContext.getPersistentRDDs.keySet -- before).size
    }
    assert(newPins(Dedup.jaccardPairs(docs, 0.4)) <= 1)
    assert(newPins(Dedup.minhashPairs(docs, 0.35)) <= 1)
    assert(newPins(Dedup.simhashPairs(docs)) <= 1)
    assert(newPins(Similarity.lshPairs(vecs, 0.4)) <= 1)
    assert(newPins(Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") < 2), 3)) <= 1)
  }

  test("lshPairs is sound (⊆ exact cosine at the same threshold)") {
    val vecs = vecCorpus(40, 16, seed = 3L)
    val exact = Similarity.cosinePairs(vecs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshPairs(vecs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH emitted non-exact pairs: ${lsh -- exact}")
  }

  test("lshPairs recall >= 0.8 on seeded near-duplicates (cos >= 0.995)") {
    val vecs = vecCorpus(60, 16, seed = 7L)
    val exactHigh = Similarity.cosinePairs(vecs, 0.995).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactHigh.size >= 40, s"fixture produced only ${exactHigh.size} near-dups")
    val lsh = Similarity.lshPairs(vecs, 0.995).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (lsh & exactHigh).size.toDouble / exactHigh.size
    assert(recall >= 0.8, s"recall $recall (${(lsh & exactHigh).size}/${exactHigh.size})")
  }

  test("lshPairs band keys are 16-bit (not the round-1 4-bit degenerate)") {
    // 64 planes / 4 bands: two random (non-near-dup) vectors should rarely
    // share a band. With 4-bit keys nearly ALL pairs collided.
    val rnd = new scala.util.Random(11L)
    import spark.implicits._
    val vecs = (0 until 80).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    // threshold -1 keeps every candidate that shares a bucket
    val cands = Similarity.lshPairs(vecs, -1.0).count()
    val allPairs = 80L * 79 / 2
    assert(cands < allPairs / 4,
      s"$cands of $allPairs random pairs collide — band keys too narrow")
  }

  // ------------------------------------------------- simhash chunk pairs

  test("simhashPairs is EXACTLY the brute-force hamming<=3 pair set (pigeonhole completeness)") {
    import spark.implicits._
    // clusters of near-identical token streams => some close simhashes
    val base = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine ten",
      "lorem ipsum dolor sit amet consectetur adipiscing elit")
    val docs = (0 until 45).map { i =>
      val b = base(i % 3)
      val tweak = if (i < 30) "" else s" extra${i} token${i}"
      (i.toLong, b + " " + b + tweak)
    }.toDF("doc_id", "text")
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sh.keys; b <- sh.keys if a < b
      if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 3
    } yield (a, b)).toSet
    assert(brute.nonEmpty, "fixture produced no hamming<=3 pairs")
    val got = Dedup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"missing: ${brute -- got}; spurious: ${got -- brute}")
  }

  // ------------------------------------------------- shingle DF cap

  test("jaccardPairs: hub shingle shared by all docs is dropped; true dups still found") {
    import spark.implicits._
    val hub = "common common common" // one trigram every doc shares
    val docs = ((0 until 50).map { i =>
      (i.toLong, s"$hub unique${i}a unique${i}b unique${i}c unique${i}d")
    } ++ Seq(
      (100L, s"$hub same same same tail tail"),
      (101L, s"$hub same same same tail tail"))).toDF("doc_id", "text")
    // cap 10 < 52 docs sharing the hub trigram => hub shingle dropped
    val pairs = Dedup.jaccardPairs(docs, 0.5, maxShingleDF = 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // identical docs remain jaccard 1.0 over the capped universe
    assert(pairs.get((100L, 101L)).contains(1.0), s"got $pairs")
    // the 50 hub-only docs share nothing after the cap
    assert(pairs.keys.forall { case (a, b) => a == 100L && b == 101L })
  }

  test("jaccardPairs: prefix-filtered join is EXACT vs the naive all-sharing-pairs form") {
    import spark.implicits._
    // seeded corpus with overlapping vocabulary: many docs share shingles
    // at varying rates, so prefixes, length filter, and verification all
    // get exercised; thresholds include one where t*sz is integral (the
    // float-ceil hazard the 1e-9 slack guards).
    val rnd = new scala.util.Random(17L)
    val vocab = (0 until 30).map(i => s"w$i")
    val docs = (0 until 60).map { i =>
      val len = 6 + rnd.nextInt(10)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.25, 0.4, 0.5)) {
      val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
      val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
      val naive = sh.select(col("sh"), col("id").as("ida"))
        .join(sh.select(col("sh"), col("id").as("idb")), Seq("sh"))
        .filter(col("ida") < col("idb"))
        .groupBy("ida", "idb").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("id").as("ida"), col("sz").as("sza")), Seq("ida"))
        .join(sizes.select(col("id").as("idb"), col("sz").as("szb")), Seq("idb"))
        .withColumn("j", col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
        .filter(col("j") >= t)
        .collect().map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb")) ->
          math.rint(r.getAs[Double]("j") * 1e6) / 1e6).toMap
      val prefix = Dedup.jaccardPairs(docs, t).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(prefix == naive,
        s"t=$t missing=${naive.keySet -- prefix.keySet} spurious=${prefix.keySet -- naive.keySet}")
    }
  }

  test("jaccardPairs: capped result equals uncapped when no shingle exceeds the cap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words appear here instead now")).toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(docs, 0.3, maxShingleDF = 1000).collect().toSeq
    val loose = Dedup.jaccardPairs(docs, 0.3, maxShingleDF = 1000000).collect().toSeq
    assert(capped.map(_.toString).sorted == loose.map(_.toString).sorted)
  }

  // ------------------------------------------------- minhash estimate

  test("minhashPairs candidates carry ids only; estimates still agree with signatures") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "mu nu xi omicron pi rho sigma tau upsilon phi")).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  // ------------------------------------------------- IVF ANN

  test("ivfTopK: results are sound, self-free, and ranked like topK within probed cells") {
    val vecs = vecCorpus(20, 16, 5L)
    val queries = vecs.filter(col("vec_id") < 6)
    val res = Similarity.ivfTopK(vecs, queries, k = 3, nCells = 4, nProbe = 2).collect()
    // shape: no self matches, rk in 1..3, at most 3 per query
    assert(res.forall(r => r.getLong(0) != r.getLong(1)))
    assert(res.forall(r => r.getInt(3) >= 1 && r.getInt(3) <= 3))
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      // ranks are dense and ordered by descending cosine
      assert(rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq ==
        rows.map(_.getDouble(2)).toSeq.sorted.reverse)
    }
  }

  test("ivfTopK finds each near-duplicate twin when probing most cells") {
    // twins have cos ~0.999: with nProbe close to nCells the probed cells
    // must contain the twin, so it ranks first.
    val vecs = vecCorpus(15, 16, 9L)
    val queries = vecs.filter(col("vec_id") % 2 === 0 && col("vec_id") < 16)
    val res = Similarity.ivfTopK(vecs, queries, k = 1, nCells = 4, nProbe = 4).collect()
    val top1 = res.filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap
    top1.foreach { case (q, n) => assert(n == q + 1, s"query $q top-1 was $n") }
  }

  test("ivfTopK recall vs brute force is high at full probe depth") {
    val vecs = vecCorpus(12, 16, 13L)
    val queries = vecs.filter(col("vec_id") < 8)
    val exact = Similarity.topK(vecs, queries, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(vecs, queries, k = 3, nCells = 3, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // full probe depth = exhaustive: IVF must equal brute force exactly
    assert(ivf == exact)
  }

  test("every corpus vector lands in exactly one IVF cell") {
    val vecs = vecCorpus(10, 8, 21L)
    val base = vecs.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
    val cent = Similarity.ivfCentroids(base, 4)
    val asgn = Similarity.ivfAssign(base, cent)
    assert(asgn.count() === 20)
    assert(asgn.select("id").distinct().count() === 20)
  }
}
