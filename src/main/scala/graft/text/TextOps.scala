package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, run
  * over the `documents` table (doc_id, text, lang, source, n_chars).
  * Everything is built-in Catalyst expressions — whole-stage codegen'd, no
  * UDFs — so these run at scan speed at 100 TB.
  */
object TextOps {

  /** Normalized whitespace token array: lowercase, non-alphanumerics to
    * spaces, empty tokens dropped. The shared tokenizer for dedup /
    * fingerprint / quality ops (keep one definition so oracles agree). */
  def tokens(text: Column): Column =
    filter(split(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " "), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Subword (BPE) token count — real trained-merges BPE, see [[Bpe]]. */
  def bpeCount(text: Column): Column = Bpe.bpeCount(text)

  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "from")

  /** Per-document quality statistics + a composite score in [0,1].
    * Signals follow the usual pretraining-filter recipe (length, stopword
    * ratio, punctuation density, mean word length, repetition). */
  def qualityStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val stopArr = array(stopwords.map(lit): _*)
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("n_distinct_tokens", size(array_distinct(toks)))
      .withColumn("stopword_ratio",
        when(nTok > 0,
          size(filter(toks, tk => array_contains(stopArr, tk))).cast("double") / nTok)
          .otherwise(0.0))
      .withColumn("punct_ratio",
        when(length(t) > 0,
          (length(t) - length(regexp_replace(t, "[^A-Za-z0-9 ]", ""))).cast("double")
            / length(t)).otherwise(0.0))
      .withColumn("mean_word_len",
        when(nTok > 0,
          aggregate(toks, lit(0L), (acc, tk) => acc + length(tk)).cast("double") / nTok)
          .otherwise(0.0))
      .withColumn("repetition_ratio",
        when(nTok > 0,
          lit(1.0) - col("n_distinct_tokens").cast("double") / nTok).otherwise(0.0))
      .withColumn("quality_score",
        round(greatest(lit(0.0), least(lit(1.0),
          lit(0.25) * when(col("n_tokens").between(10, 10000), 1.0).otherwise(0.0)
            + lit(0.25) * when(col("stopword_ratio").between(0.05, 0.6), 1.0).otherwise(0.0)
            + lit(0.25) * when(col("punct_ratio") < 0.2, 1.0).otherwise(0.0)
            + lit(0.25) * (lit(1.0) - col("repetition_ratio")))), 6))
  }

  private val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "une", "dans", "que"),
    "de" -> Seq("der", "die", "und", "das", "von", "ist", "den", "mit", "nicht", "ein"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em", "um", "para"))

  /** Heuristic language ID: score = number of language-marker tokens present;
    * argmax with deterministic tie-break (language code ascending), "und"
    * when nothing matches. N-gram/stopword-profile approach — pure columnar. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val codes = langProfiles.keys.toSeq.sorted
    // Argmax as array_max over (score, negRank) structs — a LINEAR
    // expression tree. The previous when()-fold duplicated its whole
    // accumulated subtree at every level (condition + else branch), so 5
    // languages compiled ~2^5 copies of the tokenize+filter pipeline into
    // one generated method: a flat ~10 s of Janino/JIT cost per plan at
    // any data size. Struct comparison is field-ordered, so max = highest
    // score, then highest negRank = smallest code index — the same
    // ascending-code tie-break the fold had.
    val scored = array(codes.zipWithIndex.map { case (code, i) =>
      val arr = array(langProfiles(code).map(lit): _*)
      struct(
        size(filter(toks, tk => array_contains(arr, tk))).as("score"),
        lit(-i).as("negRank"))
    }: _*)
    val best = array_max(scored)
    val codeArr = array(codes.map(lit): _*)
    when(best.getField("score") > 0,
      element_at(codeArr, -best.getField("negRank") + 1)).otherwise(lit("und"))
  }

  /** Gopher/C4-style quality-filter thresholds. Ratio thresholds compare
    * UNROUNDED values (the oracle mirrors that; rounding only happens at
    * output columns). */
  case class QualityConfig(
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 12.0,
      maxPunctRatio: Double = 0.2,
      minStopwordRatio: Double = 0.05,
      maxRepetitionRatio: Double = 0.5,
      allowedLangs: Seq[String] = Seq("en", "und"))

  /** Keep/drop verdict composing the qualityStats signals + langId: the
    * switch a corpus builder actually flips. `drop_reason` lists every
    * failing rule comma-joined in fixed rule order (concat_ws skips the
    * non-firing NULLs); keep = no rule fired. One projection over the
    * stats — columnar, codegen'd, no extra pass over the text. */
  def qualityVerdict(docs: DataFrame, cfg: QualityConfig = QualityConfig(),
                     textCol: String = "text"): DataFrame = {
    val st = qualityStats(docs, textCol)
      .withColumn("lang_guess", langId(col(textCol)))
    val checks: Seq[(String, Column)] = Seq(
      "too_short" -> (col("n_tokens") < cfg.minTokens),
      "too_long" -> (col("n_tokens") > cfg.maxTokens),
      "word_len_out_of_range" -> (col("n_tokens") > 0 &&
        (col("mean_word_len") < cfg.minMeanWordLen ||
         col("mean_word_len") > cfg.maxMeanWordLen)),
      "symbol_heavy" -> (col("punct_ratio") > cfg.maxPunctRatio),
      "low_stopword" -> (col("stopword_ratio") < cfg.minStopwordRatio),
      "repetitious" -> (col("repetition_ratio") > cfg.maxRepetitionRatio),
      "non_target_lang" -> !col("lang_guess").isInCollection(cfg.allowedLangs))
    st.withColumn("drop_reason",
        concat_ws(",", checks.map { case (r, c) => when(c, lit(r)) }: _*))
      .withColumn("keep", col("drop_reason") === "")
  }

  /** Planted documents exercising each drop rule (ids far above any real
    * doc_id). Used by q_quality on BOTH the Spark and oracle side so the
    * correctness row proves each bad document is rejected for the right
    * reason, whatever the organic corpus happens to contain. */
  val plantedBadDocs: Seq[(Long, String)] = Seq(
    (1000000001L, "too short"),
    (1000000002L, "the cat and the dog ran to the big red barn with $$$$$ %%%%% ##### @@@@@ *****"),
    (1000000003L, Seq.fill(30)("the cat").mkString(" ")),
    (1000000004L, "el perro y el gato que viven en la casa de los vecinos juegan por las tardes del verano"),
    (1000000005L, "the quick brown fox jumps over the lazy dog and then it runs back to the barn in the morning"))

  /** C4-style line-level cleaning stats: split on newlines, retain lines
    * that end in terminal punctuation AND have >= 3 whitespace words (the
    * C4 recipe's line rules), report per-doc line counts, the duplicate-
    * line fraction (Gopher's repetition signal at line granularity), and
    * the sha256 of the cleaned reassembly (compact content witness). Pure
    * columnar; the per-line predicates are two regexes inside one filter
    * lambda over a bound lines array (no re-evaluated subtrees — SURVEY
    * §11.8 trap 1 does not apply to the HOF's input argument). */
  def c4LineStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l =>
      trim(l).rlike("[.!?]$") && trim(l).rlike("^\\S+(\\s+\\S+){2}"))
    docs
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("dup_line_frac",
        when(size(lines) > 0,
          round(lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines), 6))
          .otherwise(0.0))
      .withColumn("cleaned_sha", sha2(array_join(kept, "\n"), 256))
  }

  /** Planted multiline docs for q_c4_clean (organic testdata documents are
    * single-line with no terminal punctuation, so these carry the
    * nontrivial line-rule structure at every sf). */
  val plantedMultilineDocs: Seq[(Long, String)] = Seq(
    (2000000001L,
      "This is a proper sentence line.\nshort line\nAnother good line ends here!\n" +
      "no punctuation line three words\nBad? yes ok.\n{ code }\nword"),
    (2000000002L, "Same line here today.\nSame line here today.\nSame line here today."),
    (2000000003L, "One good question to keep?\n\n\ntiny.\n"))

  /** Gopher-style n-gram repetition signal: the most frequent bigram per
    * document (ties: lexicographically smallest) and the ratio of tokens
    * its occurrences span (2·count/n_tokens; can exceed 1 on overlapping
    * runs like "a a a" — reported raw, a filter thresholds it). Rows
    * shape: posexplode + a per-doc window lead — the bigram stream never
    * materializes as per-doc arrays, so a 10^9-token document is ordinary
    * shuffle rows. */
  def topBigramStats(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val big = tok
      .withColumn("nxt", lead(col("w"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("nxt")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(min(struct((-col("cnt")).as("negCnt"), col("bg"))).as("b"))
      .select(col("doc_id"), col("b.bg").as("top_bigram"),
        (-col("b.negCnt")).as("top_cnt"))
    docs.select(col(idCol).as("doc_id"), size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(big, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        coalesce(col("top_cnt"), lit(0L)).as("top_cnt"),
        when(col("n_tokens") > 0,
          round(coalesce(col("top_cnt"), lit(0L)) * 2.0 / col("n_tokens"), 6))
          .otherwise(0.0).as("top_bigram_frac"))
  }

  /** Order-insensitive document fingerprint: sha256 of the sorted distinct
    * token set. Identical token-set docs collide — the cheap canonical
    * fingerprint for near-dup blocking (rolling-hash winnowing lives in
    * Dedup.simhash). */
  def fingerprint(text: Column): Column =
    sha2(array_join(array_sort(array_distinct(tokens(text))), " "), 256)
}
