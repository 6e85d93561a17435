package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.dedup.Dedup
import graft.sim.Similarity

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenizer lowercases, strips punctuation, drops empties") {
    val df = Seq((1L, "Hello, World!  foo-bar 42")).toDF("doc_id", "text")
    val toks = df.select(TextOps.tokens(col("text"))).as[Seq[String]].head()
    assert(toks == Seq("hello", "world", "foo", "bar", "42"))
  }

  test("whitespace token count") {
    val df = Seq((1L, "a,b c")).toDF("doc_id", "text")
    assert(df.select(TextOps.tokenCount(col("text"))).head().getInt(0) == 3)
  }

  test("BPE trainer learns the classic merges in order") {
    import graft.text.Bpe
    // hand-computable corpus: pair (l,o) freq 7+4=11? no: low*5 lower*2 ->
    // (l,o)=7, (o,w)=7, (w,e)=2+6=8... compute: newest*6 widest*3 share (e,s),(s,t)=9
    val freqs = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = Bpe.train(freqs, 4)
    // (e,s)=9 and (s,t)=9 tie -> lexicographic: (e,s) first; then (es,t)=9;
    // then (l,o)=(o,w)=7 tie -> (l,o); then (lo,w)=7
    assert(m == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    // reference application after those merges
    assert(Bpe.applyMerges("lowest", m) == Vector("low", "est"))
    assert(Bpe.applyMerges("newest", m) == Vector("n", "e", "w", "est"))
  }

  test("columnar BPE count equals the JVM reference on tricky inputs") {
    import graft.text.Bpe
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "aa"), ("t", "h"), ("th", "e"))
    val docs = Seq(
      (1L, "aaaa abab xabc"),    // repeat overlap: one-pass-per-merge semantics
      (2L, "aaaaaaaa"),          // (a,a) then (aa,aa) cascades
      (3L, "the theory breathes"),
      (4L, ""),                  // empty doc -> 0
      (5L, "Z!?"),               // punctuation-only -> 0 tokens -> 0
      (6L, "ab aab aaab aaaab")) // boundary: merged symbol then fresh pair
    val df = docs.toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Bpe.bpeCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, text) <- docs) {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ").split(" ").filter(_.nonEmpty)
      val want = toks.map(w => Bpe.applyMerges(w, merges).length.toLong).sum
      assert(got(id) == want, s"doc $id: got ${got(id)}, reference $want")
    }
    // spot-check the hand value: aaaa->[aa,aa]->[aaaa]; abab->[ab,ab]; xabc->[x,ab,c]
    assert(got(1L) == 1 + 2 + 3)
  }

  test("bpeEncode emits the reference piece stream; size equals bpeCount") {
    import graft.text.Bpe
    val merges = Seq(("a", "a"), ("a", "b"), ("t", "h"), ("th", "e"))
    val docs = Seq((1L, "the aaab cat!"), (2L, ""), (3L, "aaaa")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Bpe.bpeEncode(col("text"), merges).as("p"),
        Bpe.bpeCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getLong(2)))).toMap
    for ((id, text) <- Seq((1L, "the aaab cat!"), (2L, ""), (3L, "aaaa"))) {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ").split(" ").filter(_.nonEmpty)
      val want = toks.toSeq.flatMap(w => Bpe.applyMerges(w, merges))
      assert(got(id)._1 == want, s"doc $id")
      assert(got(id)._2 == want.length.toLong)
    }
    assert(got(1L)._1 == Seq("the", "aa", "ab", "c", "a", "t"))
  }

  test("trainOnCorpus is deterministic and its merges compress the corpus") {
    import graft.text.Bpe
    val df = (0L until 50L).map(i => (i, Bpe.seedCorpus)).toDF("doc_id", "text")
    val m1 = Bpe.trainOnCorpus(df, numMerges = 16)
    val m2 = Bpe.trainOnCorpus(df, numMerges = 16)
    assert(m1 == m2 && m1.length == 16)
    val charCount = df.select(sum(length(regexp_replace(
      array_join(TextOps.tokens(col("text")), ""), " ", "")))).head().getLong(0)
    val bpeTotal = df.select(sum(Bpe.bpeCount(col("text"), m1))).head().getLong(0)
    assert(bpeTotal < charCount, "BPE must compress below character count")
    assert(bpeTotal > 0)
  }

  test("quality stats on a hand-computed doc") {
    val text = "the cat sat on the mat" // 6 tokens, 5 distinct
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextOps.qualityStats(df).head()
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Int]("n_distinct_tokens") == 5)
    // stopwords: the, on, the -> 3/6
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("repetition_ratio") - (1 - 5.0 / 6)) < 1e-9)
    assert(r.getAs[Double]("punct_ratio") == 0.0)
    // mean word len: (3+3+3+2+3+3)/6
    assert(math.abs(r.getAs[Double]("mean_word_len") - 17.0 / 6) < 1e-9)
  }

  test("quality verdict: each planted bad doc rejected for its reason; good doc kept") {
    val df = TextOps.plantedBadDocs.toDF("doc_id", "text")
    val v = TextOps.qualityVerdict(df)
      .select(col("doc_id"), col("drop_reason"), col("keep"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    def reasons(id: Long): Set[String] = v(id)._1.split(",").filter(_.nonEmpty).toSet
    assert(reasons(1000000001L).contains("too_short") && !v(1000000001L)._2)
    assert(reasons(1000000002L).contains("symbol_heavy") && !v(1000000002L)._2)
    assert(reasons(1000000003L) == Set("repetitious"))
    assert(reasons(1000000004L).contains("non_target_lang") && !v(1000000004L)._2)
    assert(v(1000000005L) == (("", true)), s"good doc got ${v(1000000005L)}")
  }

  test("top-bigram repetition: counts, tie-break, overlap-run ratio, empty doc") {
    val df = Seq(
      (1L, "the cat the cat the dog"),     // "the cat" and "cat the" both x2; lex -> "cat the"
      (2L, "b a b a a b"),                 // counts: "b a"=2,"a b"=2,"a a"=1 -> tie, "a b" wins lex
      (3L, "a a a"),                       // overlapping run: cnt 2, frac 4/3
      (4L, "")).toDF("doc_id", "text")
    val got = TextOps.topBigramStats(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == (("cat the", 2L, math.rint(4.0 / 6 * 1e6) / 1e6)))
    assert(got(2L)._1 == "a b" && got(2L)._2 == 2L)
    assert(got(3L) == (("a a", 2L, 1.333333)))
    assert(got(4L) == (("", 0L, 0.0)))
  }

  test("C4 line cleaning: rule-by-rule on the planted multiline docs") {
    val df = TextOps.plantedMultilineDocs.toDF("doc_id", "text")
    val got = TextOps.c4LineStats(df)
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("dup_line_frac"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: 7 lines; keep = proper sentence / ends-here! / Bad? yes ok.
    assert(got(2000000001L) == ((7L, 3L, 0.0)))
    // doc 2: 3 identical kept lines; dup fraction 2/3
    assert(got(2000000002L)._1 == 3L && got(2000000002L)._2 == 3L)
    assert(math.abs(got(2000000002L)._3 - (1.0 - 1.0 / 3)) < 1e-6)
    // doc 3: "One good question to keep?" kept; ""/""/"tiny."/"" dropped
    // (split keeps trailing empties: 5 lines, two distinct empties collapse)
    assert(got(2000000003L)._2 == 1L)
  }

  test("language ID picks the profile with most markers; und when none") {
    val df = Seq(
      (1L, "the cat and the dog was in that house for it"),
      (2L, "el perro y la casa de los gatos en que vivo"),
      (3L, "zzz qqq xxx")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextOps.langId(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("fingerprint is order-insensitive over the token set") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta alpha"),
      (3L, "alpha beta delta")).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"), TextOps.fingerprint(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"), // near dup
    (4L, "completely different content about spark engines"),
    (5L, "")).toDF("doc_id", "text")

  test("exact dedup groups by content hash; survivors keep min id") {
    val groups = Dedup.exact(docs).collect()
    assert(groups.length == 4)
    val keep = Dedup.exactSurvivors(docs).select("doc_id").as[Long].collect().toSet
    assert(keep == Set(1L, 3L, 4L, 5L))
  }

  test("shingles: distinct word 3-grams; short docs fall back to whole text") {
    val sh = Seq((1L, "a b c d")).toDF("doc_id", "text")
      .select(Dedup.shingles(col("text"), 3)).as[Seq[String]].head()
    assert(sh.toSet == Set("a b c", "b c d"))
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
      .select(Dedup.shingles(col("text"), 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("exact jaccard pairs: hand-computed threshold behavior") {
    val pairs = Dedup.jaccardPairs(docs, 0.4).collect()
      .map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb")) -> r.getAs[Double]("jaccard"))
      .toMap
    // docs 1,2 identical -> jaccard 1.0
    assert(pairs((1L, 2L)) == 1.0)
    // docs 1,3 share 4 of 7+7 3-shingles: |A∩B|=4? compute: tokens differ at
    // position 4 (jumps/leaps) -> shingles containing it differ (3 of 7).
    // A∩B = 4, A∪B = 10 -> 0.4
    assert(math.abs(pairs((1L, 3L)) - 0.4) < 1e-9)
    assert(!pairs.contains((1L, 4L)))
  }

  test("minhash estimates jaccard within banding tolerance on dups") {
    // High-similarity corpus: banding with r=4 rows catches pairs with
    // jaccard ~0.8 w.p. ~1-(1-0.8^4)^16 ≈ 1; a 0.4-jaccard pair would be
    // missed ~2/3 of the time (that's the LSH design point, not a bug).
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra tango"
    val near = base.replace("tango", "zulu") // 3 of 18 trigrams differ
    val docs2 = Seq((1L, base), (2L, base), (3L, near),
      (4L, "completely different content about spark engines at scale"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs2, threshold = 0.3).collect()
      .map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb")) -> r.getAs[Double]("est_jaccard"))
      .toMap
    assert(pairs((1L, 2L)) == 1.0) // identical docs hash identically
    assert(pairs.contains((1L, 3L))) // near-dup lands in a shared band
    assert(!pairs.contains((1L, 4L)))
  }

  test("simhash: identical docs distance 0; near-dups small; distinct docs not paired") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("ida"), r.getAs[Long]("idb")) -> r.getAs[Int]("hamming"))
      .toMap
    assert(pairs((1L, 2L)) == 0)
    assert(!pairs.contains((1L, 4L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(1.0f, 0.0f, 0.0f)),  // identical to 0
    (2L, Seq(0.8f, 0.6f, 0.0f)),  // cos with 0 = 0.8
    (3L, Seq(0.0f, 0.0f, 1.0f))   // orthogonal to 0
  ).toDF("vec_id", "embedding")

  test("cosine: hand values (identical=1, orthogonal=0, 0.8 case)") {
    val pairs = Similarity.cosinePairs(vecs, -1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 3L)) == 0.0)
    assert(math.abs(pairs((0L, 2L)) - 0.8) < 1e-9)
  }

  test("brute-force topK ranks by cosine with deterministic tie-break") {
    val top = Similarity.topK(vecs, vecs.filter(col("vec_id") === 0L), 2)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"), r.getAs[Int]("rk")))
    assert(top.toSeq == Seq((0L, 1L, 1), (0L, 2L, 2)))
  }

  test("LSH pairs ⊆ exact pairs at the same threshold, and catches identicals") {
    val exact = Similarity.cosinePairs(vecs, 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshPairs(vecs, 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((0L, 1L))) // identical vectors always share buckets
  }

  test("annRecall: full probe depth gives recall 1.0; values stay in [0,1]") {
    val corpus = (0L until 24L).map(i =>
      (i, Seq.tabulate(8)(d => (math.sin(i * 8 + d) * 100).toFloat))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 4)
    val full = Similarity.annRecall(corpus, queries, k = 3, nCells = 4, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_hit"), r.getAs[Double]("recall")))
    assert(full.length == 4)
    // probing every cell IS the exact search: recall must be 1 for all
    assert(full.forall { case (_, ne, nh, rec) => ne == 3 && nh == 3 && rec == 1.0 })
    val partial = Similarity.annRecall(corpus, queries, k = 3, nCells = 8, nProbe = 1)
      .collect().map(_.getAs[Double]("recall"))
    assert(partial.forall(r => r >= 0.0 && r <= 1.0))
  }
}

class TextEmbedSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.TextEmbed

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact duplicate
    (3L, "completely different words about spark engines and partitions"),
    (4L, "")).toDF("doc_id", "text")

  test("identical texts give identical embeddings; empty doc gives zeros") {
    val e = TextEmbed.embeddings(docs, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(e(1L) == e(2L))
    assert(e(1L) != e(3L))
    assert(e(4L).forall(_ == 0.0) && e(4L).length == 16)
    // non-empty embeddings are L2-normalized
    val n1 = math.sqrt(e(1L).map(x => x * x).sum)
    assert(math.abs(n1 - 1.0) < 1e-12)
  }

  test("array form agrees with rows form at every dim") {
    val rows = TextEmbed.embeddingRows(docs, dim = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val arrs = TextEmbed.embeddings(docs, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for (id <- Seq(1L, 2L, 3L, 4L); d <- 0 until 16)
      assert(arrs(id)(d) == rows((id, d)), s"doc $id dim $d")
  }

  test("lshPairs over derived embeddings finds planted duplicate texts") {
    val e = TextEmbed.embeddings(docs.filter(col("doc_id") =!= 4L), dim = 16)
    val pairs = Similarity.lshPairs(e, 0.99, idCol = "vec_id", vecCol = "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }
}
