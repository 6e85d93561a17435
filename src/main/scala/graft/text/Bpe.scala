package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real byte-pair-encoding token counting.
  *
  * Training is classic BPE (Sennrich-style): start from characters, repeatedly
  * merge the most frequent adjacent symbol pair, one left-to-right
  * non-overlapping pass per learned merge, merges never cross word
  * boundaries. It runs DRIVER-SIDE over a word-frequency table (bounded:
  * `maxWords` most frequent words) — the learned merges table is tiny and
  * ships to executors as expression literals, the way a production pipeline
  * ships a trained tokenizer artifact.
  *
  * Application is PURE COLUMNAR — no UDF, no higher-order function (HOFs run
  * interpreted; see SURVEY §11.8). Each word's symbol sequence is encoded as
  * a string with every symbol delimited on both sides: "ab cd" ->
  * "_a__b_ _c__d_". A merge (a,b)->ab is then exactly
  * `replace(s, "_a__b_", "_ab_")`: the double delimiter means a match can
  * only be two complete adjacent symbols (never a symbol suffix/prefix), and
  * adjacent matches share no characters, so built-in leftmost
  * non-overlapping `replace` IS the one-pass-per-merge BPE application.
  * Token count = delimiters/2. The whole chain is string built-ins —
  * whole-stage-codegen'd in Spark and mirrored verbatim by the DuckDB
  * oracle (Oracles.bpeCount).
  *
  * Symbols stay within [a-z0-9] (the shared TextOps.tokens alphabet), so the
  * "_" delimiter and " " word separator can never collide with symbol text.
  */
object Bpe {

  /** One left-to-right non-overlapping pass of merge (a,b) over a word's
    * symbol vector — the reference (and training-side) application. */
  private[graft] def mergePass(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else {
        out += syms(i); i += 1
      }
    }
    out.result()
  }

  /** Reference JVM tokenizer: apply learned merges in order to one word.
    * Used by training (to re-symbolize between merge picks) and by the spec
    * as the independent oracle for the columnar path. */
  private[graft] def applyMerges(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) { case (syms, (a, b)) =>
      if (syms.length < 2) syms else mergePass(syms, a, b)
    }

  /** Train `numMerges` merges from a word-frequency table. Deterministic:
    * best pair = highest summed frequency, ties broken by lexicographically
    * smallest (a, b). */
  def train(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words = wordFreq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) done = true
      else {
        val (a, b) = counts.toSeq.minBy { case ((a, b), f) => (-f, a, b) }._1
        merges += ((a, b))
        words = words.map { case (syms, f) => (mergePass(syms, a, b), f) }
        k += 1
      }
    }
    merges.result()
  }

  /** Train on a corpus sample: word frequencies over the `maxWords` most
    * frequent words of `docs` (deterministic tie-break: frequency desc,
    * word asc). The aggregation is distributed; only the bounded
    * word-frequency table is collected — the 100 TB shape is "sample, agg,
    * collect a capped table", never "collect text". */
  def trainOnCorpus(docs: DataFrame, textCol: String = "text", numMerges: Int = 64,
                    maxWords: Int = 4096): Seq[(String, String)] = {
    val freqs = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    train(freqs, numMerges)
  }

  /** Fixed seed corpus for the shipped default merges table — a plain
    * English-plus-code sample written for this engine. Training over it is
    * deterministic, so `defaultMerges` is a stable artifact both the Spark
    * expression chain and the DuckDB oracle embed as literals. */
  private[graft] val seedCorpus: String =
    """the quick brown fox jumps over the lazy dog while the other dogs watch
      |the training data pipeline reads documents and counts tokens in each
      |document before the filters remove the low quality documents from the
      |set for every run of the engine the numbers 0 1 2 3 42 100 repeat and
      |repeat in the logs the spark engine partitions the data and shuffles
      |the partitions between the executors then aggregates the counts the
      |community detection pass assigns each node to the community with the
      |highest payoff and iterates until the partition reaches equilibrium
      |def count_tokens(text): return len(tokenize(text)) for doc in docs:
      |total += count_tokens(doc.text) print(total) the end of the sample
      |""".stripMargin

  /** The shipped tokenizer artifact: 64 merges trained on `seedCorpus`. */
  lazy val defaultMerges: Seq[(String, String)] = {
    val words = seedCorpus.toLowerCase.replaceAll("[^a-z0-9 \n]", " ")
      .split("\\s+").filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }.toSeq
    train(words, 64)
  }

  /** Symbol-string encoding of a document: tokens joined by spaces, every
    * [a-z0-9] character wrapped as _c_. */
  private def symbolString(text: Column): Column =
    regexp_replace(array_join(TextOps.tokens(text), " "), "([a-z0-9])", "_$1_")

  private def mergedString(text: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbolString(text)) { case (s, (a, b)) =>
      replace(s, lit(s"_${a}__${b}_"), lit(s"_${a}${b}_"))
    }

  /** BPE token count as one codegen'd column: nested replace chain (one
    * `replace` per learned merge, in order) then delimiters/2. */
  def bpeCount(text: Column, merges: Seq[(String, String)] = defaultMerges): Column = {
    val merged = mergedString(text, merges)
    ((length(merged) - length(replace(merged, lit("_"), lit("")))) / 2).cast("long")
  }

  /** The actual subword pieces, in document order, as array<string> —
    * every `_piece_` in the merged symbol string (word boundaries carry no
    * delimiters, so extraction order IS token order). Same codegen'd
    * replace chain as the count; `bpeCount == size(bpeEncode)` by
    * construction. */
  def bpeEncode(text: Column, merges: Seq[(String, String)] = defaultMerges): Column =
    regexp_extract_all(mergedString(text, merges), lit("_([a-z0-9]+)_"), lit(1))
}
