package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All operators are narrow projections built from codegen'd built-in
  * expressions — no UDFs, no shuffles — so they stream through a 100 TB
  * corpus at scan speed. Each has a DuckDB-expressible twin registered in
  * [[graft.SparkEntry.oracleSql]].
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text (empty text → [""], matching
    * DuckDB `string_split_regex`).
    */
  def tokensCol(text: Column): Column = split(trim(text), "\\s+")

  /** Token statistics per document: char count, token count, distinct
    * token count, type-token ratio.
    */
  def tokens(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokensCol(col("text")))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_m"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        (size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double")).as("type_token_ratio")
      )

  /** Stopword list used by quality scoring and language ID. Kept small and
    * alphabetic so the DuckDB oracle can embed the same literal list.
    */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Quality heuristics: length, punctuation ratio, whitespace ratio,
    * stopword ratio, and a blended score. Single-pass, codegen-friendly.
    */
  def quality(docs: DataFrame): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val punct  = (length(col("text")) -
      length(regexp_replace(col("text"), "\\p{Punct}", ""))).cast("double")
    val spaces = (length(col("text")) -
      length(regexp_replace(col("text"), "\\s", ""))).cast("double")
    val stopHits = size(expr(
      s"filter(toks, x -> x in (${EnglishStopwords.map("'" + _ + "'").mkString(",")}))"
    )).cast("double")
    val nToks = size(col("toks")).cast("double")
    docs
      .withColumn("toks", tokensCol(col("text")))
      .select(
        col("doc_id"),
        nChars.cast("long").as("n_chars_m"),
        (punct / nChars).as("punct_ratio"),
        (spaces / nChars).as("space_ratio"),
        (stopHits / nToks).as("stopword_ratio"),
        // Blend: long-enough docs with some stopwords and low punctuation
        // score higher. Same arithmetic in the oracle.
        (least(nChars / lit(500.0), lit(1.0)) * lit(0.5)
          + least(stopHits / nToks * lit(5.0), lit(1.0)) * lit(0.3)
          + (lit(1.0) - least(punct / nChars * lit(10.0), lit(1.0))) * lit(0.2)
        ).as("quality_score")
      )
  }

  /** Tiny per-language stopword sets for the language-ID heuristic.
    * Order matters: ties resolve to the earlier entry.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "es" -> Seq("el", "los", "que", "es", "una"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2")
  )

  private def markerHits(lang: String): Column = {
    val lits = LangMarkers.toMap.apply(lang).map("'" + _ + "'").mkString(",")
    size(expr(s"filter(toks, x -> x in ($lits))")).cast("long")
  }

  /** Language ID by marker-token voting with a fixed tiebreak order
    * (en > de > es > fr > zh, then "und" when no marker hits at all).
    */
  def langId(docs: DataFrame): DataFrame = {
    val hits = LangMarkers.map { case (l, _) => l -> markerHits(l) }
    val best = hits.tail.foldLeft(hits.head._2)((acc, h) => greatest(acc, h._2))
    val predicted = hits
      .foldRight(lit("und"): Column) { case ((l, h), els) =>
        when(h === best && best > 0, lit(l)).otherwise(els)
      }
    docs
      .withColumn("toks", tokensCol(col("text")))
      .select(
        (col("doc_id") +: hits.map { case (l, h) => h.as(s"hits_$l") }) :+
          predicted.as("predicted_lang"): _*
      )
  }

  /** Corpus-wide n-gram document frequencies: how many documents contain
    * each word n-gram (set semantics per doc via the shingle expression).
    * One explode + one partially-aggregated count; top-k with a
    * deterministic tiebreak.
    */
  def ngramFreq(docs: DataFrame, n: Int = 2, topK: Int = 100): DataFrame =
    docs
      .select(explode(expr(s"graft_shingles(text, $n)")).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(desc("doc_freq"), asc("ngram"))
      .limit(topK)

  /** Repetition statistics (Gopher-style quality filter): fraction of all
    * word bigrams taken by the single most-repeated bigram, and the
    * distinct-bigram ratio. Highly repetitive documents (boilerplate,
    * generation loops) score high top_ngram_frac / low distinct ratio.
    *
    * Single-pass narrow projection via the native `graft_repstats`
    * expression — the explode + two-level aggregation it replaced
    * shuffled every gram occurrence (measured 8x slower at sf0.1).
    * Documents with < n tokens have no n-grams and drop out (null stats).
    */
  def repetition(docs: DataFrame, n: Int = 2): DataFrame =
    docs
      .select(col("doc_id"), expr(s"graft_repstats(text, $n)").as("st"))
      .filter(col("st").isNotNull)
      .select(
        col("doc_id"),
        col("st.n_ngrams").as("n_ngrams"),
        (col("st.top_count").cast("double") / col("st.n_ngrams").cast("double"))
          .as("top_ngram_frac"),
        (col("st.n_distinct").cast("double") / col("st.n_ngrams").cast("double"))
          .as("distinct_ngram_ratio"))

  /** Winnowing fingerprints (Schleimer et al.) — the locality-preserving
    * document fingerprint family the reference era used rolling hashes
    * for; exploded to (doc_id, fingerprint) rows for index-building or
    * shared-fingerprint near-dup joins.
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    docs.select(col("doc_id"),
      explode(expr(s"graft_winnow(text, $k, $w)")).as("fp"))

  /** BPE-style pre-tokenization counts: letter runs, digit runs, and
    * single other-symbols — the unit count a BPE tokenizer would start
    * from (identical regex classes in Java and RE2 for the oracle).
    */
  def bpeTokens(docs: DataFrame): DataFrame = {
    val word = "\\p{L}+"
    val num = "\\p{N}+"
    val other = "[^\\s\\p{L}\\p{N}]"
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(word)).cast("long").as("n_word_toks"),
      regexp_count(col("text"), lit(num)).cast("long").as("n_num_toks"),
      regexp_count(col("text"), lit(other)).cast("long").as("n_other_toks"),
      (regexp_count(col("text"), lit(word)) + regexp_count(col("text"), lit(num))
        + regexp_count(col("text"), lit(other))).cast("long").as("n_bpe_toks"))
  }

  /** Benchmark-contamination check: the fraction of each document's
    * distinct word n-grams that also appear in a benchmark (eval-set)
    * corpus — the standard pre-training decontamination measurement.
    *
    * Scale shape: the benchmark gram set is tiny relative to the corpus
    * (eval sets are MBs against 100 TB), so it is broadcast and the whole
    * check is one corpus scan + explode + broadcast-hash left join + one
    * partial-aggregated rollup on doc_id. Documents shorter than n tokens
    * have no n-grams and drop out (mirrored by the oracle).
    */
  def contamination(docs: DataFrame, benchmark: DataFrame, n: Int = 3): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(expr(s"graft_shingles(text, $n)")).as("gram"))
    val benchGrams = benchmark
      .select(explode(expr(s"graft_shingles(text, $n)")).as("gram"))
      .distinct()
      .withColumn("hit", lit(1L))
    grams.join(broadcast(benchGrams), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .select(col("doc_id"),
        col("n_grams").cast("long").as("n_grams"),
        col("n_contaminated").cast("long").as("n_contaminated"),
        (col("n_contaminated").cast("double") / col("n_grams").cast("double"))
          .as("contamination"))
  }

  /** Gopher-style quality filter: one keep/drop decision per document with
    * the first failing rule as the reason. Rules, in precedence order:
    * token count in [minTokens, maxTokens], stopword ratio >= minStopword,
    * top-bigram fraction <= maxTopNgram, type-token ratio >= minTtr.
    *
    * The whole filter is one narrow single-pass projection — no shuffle
    * at any scale (the bigram stats come from the native `graft_repstats`
    * expression; documents with < 2 tokens have no bigrams and default
    * to 0).
    */
  def qualityFilter(docs: DataFrame,
                    minTokens: Long = 10L, maxTokens: Long = 1000L,
                    minStopword: Double = 0.02, maxTopNgram: Double = 0.20,
                    minTtr: Double = 0.30): DataFrame = {
    val stopList = EnglishStopwords.map("'" + _ + "'").mkString(",")
    docs
      .withColumn("toks", tokensCol(col("text")))
      .withColumn("st", expr("graft_repstats(text, 2)"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(expr(s"filter(toks, x -> x in ($stopList))")).cast("double") /
          size(col("toks")).cast("double")).as("stopword_ratio"),
        (size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")).cast("double")).as("type_token_ratio"),
        coalesce(
          col("st.top_count").cast("double") / col("st.n_ngrams").cast("double"),
          lit(0.0)).as("top_ngram_frac"))
      .withColumn("reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("n_tokens") > maxTokens, "too_long")
          .when(col("stopword_ratio") < minStopword, "low_stopword")
          .when(col("top_ngram_frac") > maxTopNgram, "repetitive")
          .when(col("type_token_ratio") < minTtr, "low_diversity")
          .otherwise("ok"))
      .withColumn("keep", col("reason") === "ok")
      .select("doc_id", "n_tokens", "stopword_ratio", "type_token_ratio",
        "top_ngram_frac", "keep", "reason")
  }

  /** PII detection + redaction: count and replace emails, phone-like
    * numbers, and IPv4 addresses with typed placeholders — the scrubbing
    * pass every published-corpus pipeline runs. Pure narrow projection
    * (three codegen'd regex passes); patterns are RE2-compatible so the
    * DuckDB oracle applies the identical expressions.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def redactPii(docs: DataFrame): DataFrame = {
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ips"),
      md5(redacted).as("redacted_md5"))
  }

  /** Document fingerprint: md5 of lowercase, whitespace-collapsed text —
    * a deterministic canonical-form hash (the scalable stand-in for the
    * reference-era rolling hash; identical in DuckDB's `md5`).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp")
    )
}
