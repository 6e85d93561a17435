package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication operators for a training-data pipeline, over
  * `documents(doc_id, text, ...)`.
  *
  * Scale design: every variant is blocking-based — candidates come from an
  * equi-join on a compact key (hash, band bucket, simhash chunk), never from
  * an all-pairs product. The only O(n^2) path is the exact-Jaccard verify
  * *within* candidate groups, whose size is bounded by the band width.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact duplicate groups by content hash: one row per distinct text,
    * keep_id = min doc_id, dup_count = group size. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact-dedup survivors: drops all but the min-id doc of each group. */
  def exactSurvivors(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val keep = exact(docs, idCol, textCol).select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingle array from raw text (shared tokenizer). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (1 to n).map(k => element_at(toks, i + k)): _*)))
        .otherwise(array(array_join(toks, " "))))
  }

  /** Exploded (id, shingle) table — the base relation for exact Jaccard
    * and MinHash. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("sh"))

  /** Exact n-gram Jaccard pairs >= threshold. Candidates = pairs sharing at
    * least one shingle (equi-join on shingle), so disjoint docs never meet. */
  def jaccardPairs(docs: DataFrame, threshold: Double, n: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, n)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("sh"), col("id").as("ida"))
      .join(sh.select(col("sh"), col("id").as("idb")), Seq("sh"))
      .filter(col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("ida"), col("sz").as("sza")), Seq("ida"))
      .join(sizes.select(col("id").as("idb"), col("sz").as("szb")), Seq("idb"))
      // filter on the UNROUNDED value (oracle SQL does the same), round
      // only for output — keeps threshold semantics engine-identical.
      .withColumn("jraw",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jraw") >= threshold)
      .select(col("ida"), col("idb"), round(col("jraw"), 6).as("jaccard"))
  }

  // -------------------------------------------------------------- minhash

  /** MinHash signatures: numHashes independent min-aggregates over the
    * exploded shingle table — one shuffle (groupBy id), partial aggregation
    * map-side. Hash family: xxhash64(shingle, seed=i). */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 64, n: Int = 3,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, n)
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(col("sh"), lit(i))).as(s"h$i"))
    val sig = sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
    sig.select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash + LSH near-dup pairs: band the signature (bands x rowsPerBand),
    * bucket-join on (band, hash(band slice)), then estimate Jaccard as the
    * fraction of agreeing signature components; keep pairs >= threshold.
    * Collision probability of a pair with Jaccard j: 1-(1-j^r)^b. */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.5,
                   numHashes: Int = 64, bands: Int = 16, n: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = minhashSignatures(docs, numHashes, n, idCol, textCol).persist()
    val bandHashes = array((0 until bands).map(b =>
      xxhash64(concat_ws(",",
        slice(col("sig"), b * r + 1, r).cast("array<string>")), lit(b))): _*)
    val banded = sig.select(col("id"), col("sig"), posexplode(bandHashes))
      .select(col("id"), col("sig"), col("pos").as("band"), col("col").as("bucket"))
    val cands = banded.select(col("band"), col("bucket"), col("id").as("ida"), col("sig").as("siga"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("idb"), col("sig").as("sigb")),
        Seq("band", "bucket"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb", "siga", "sigb").distinct()
    val out = cands.withColumn("eraw",
      size(filter(zip_with(col("siga"), col("sigb"), (a, b) => a === b),
        x => x)).cast("double") / numHashes)
      .filter(col("eraw") >= threshold)
      .select(col("ida"), col("idb"), round(col("eraw"), 6).as("est_jaccard"))
    out
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over tokens: sum +/-1 per bit of each token hash, take
    * signs. Entirely a per-row fold (aggregate + zip_with) — zero shuffle,
    * whole-stage codegen'd, so it runs at scan speed over 100 TB. */
  def simhash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val zeros = array((0 until 64).map(_ => lit(0L)): _*)
    def bitVec(t: Column): Column = {
      val h = xxhash64(t)
      array((0 until 64).map(k =>
        when(shiftright(h, k).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)): _*)
    }
    val sums = aggregate(TextOps.tokens(col(textCol)), zeros,
      (acc, t) => zip_with(acc, bitVec(t), (a, b) => a + b))
    // Compose the 64-bit value with shift+OR (never overflows, unlike
    // acc*2+bit which trips ANSI overflow on the sign bit).
    val packed = (0 until 64).map(k =>
      when(element_at(col("sums"), k + 1) > 0, shiftleft(lit(1L), k)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))
    docs.select(col(idCol).as("id"), sums.as("sums"))
      .select(col("id"), packed.as("simhash"))
  }

  /** SimHash near-dup pairs: block on 4 x 16-bit chunks (pairs within
    * hamming distance 3 of a 64-bit hash share at least one chunk by
    * pigeonhole), verify exact hamming distance <= maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = simhash(docs, idCol, textCol).persist()
    val chunks = array((0 until 4).map(c =>
      shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)
    val chunked = sh.select(col("id"), col("simhash"), posexplode(chunks))
      .select(col("id"), col("simhash"), col("pos").as("chunk"), col("col").as("key"))
    val hamming = {
      val x = col("sha").bitwiseXOR(col("shb"))
      bit_count(x)
    }
    chunked.select(col("chunk"), col("key"), col("id").as("ida"), col("simhash").as("sha"))
      .join(chunked.select(col("chunk"), col("key"), col("id").as("idb"), col("simhash").as("shb")),
        Seq("chunk", "key"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb", "sha", "shb").distinct()
      .withColumn("hamming", hamming.cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("ida", "idb", "hamming")
  }
}
