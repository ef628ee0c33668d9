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
    * token count, type-token ratio. One `graft_tokstats` pass per doc
    * (alias the struct once, extract fields in the next select — the
    * CollapseProject-safe shape).
    */
  def tokens(docs: DataFrame): DataFrame =
    docs
      .withColumn("st", expr("graft_tokstats(text, '')"))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_m"),
        col("st.n_tokens").as("n_tokens"),
        col("st.n_distinct").as("n_distinct"),
        (col("st.n_distinct").cast("double") /
          col("st.n_tokens").cast("double")).as("type_token_ratio")
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
    val stopHits = col("st.n_stop").cast("double")
    val nToks = col("st.n_tokens").cast("double")
    docs
      .withColumn("st",
        expr(s"graft_tokstats(text, '${EnglishStopwords.mkString(",")}')"))
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
    val csv = LangMarkers.toMap.apply(lang).mkString(",")
    expr(s"graft_tokstats(text, '$csv')").getField("n_stop")
  }

  /** Language ID by marker-token voting with a fixed tiebreak order
    * (en > de > es > fr > zh, then "und" when no marker hits at all).
    * One native token pass per language set — no interpreted lambdas.
    */
  def langId(docs: DataFrame): DataFrame = {
    // alias each native pass once; the vote/tiebreak expressions below
    // reference the aliased columns (CollapseProject keeps non-cheap
    // producers un-duplicated, so each language set scans the doc once)
    val withHits = docs.select(
      col("doc_id") +:
        LangMarkers.map { case (l, _) => markerHits(l).as(s"hits_$l") }: _*)
    val hits = LangMarkers.map { case (l, _) => l -> col(s"hits_$l") }
    val best = hits.tail.foldLeft(hits.head._2)((acc, h) => greatest(acc, h._2))
    val predicted = hits
      .foldRight(lit("und"): Column) { case ((l, h), els) =>
        when(h === best && best > 0, lit(l)).otherwise(els)
      }
    withHits.select(
      (col("doc_id") +: hits.map { case (l, h) => h.as(s"hits_$l") }) :+
        predicted.as("predicted_lang"): _*
    )
  }

  /** Train/eval vocabulary-overlap card: type Jaccard, OOV type rate,
    * and OOV TOKEN-OCCURRENCE rate of an eval corpus against a training
    * corpus — the coverage check before trusting perplexity or any
    * token-level eval (a 2% OOV-type rate can still be a 20%
    * OOV-occurrence rate when the misses are frequent terms). All
    * exact integer ppm. Scale shape: two vocab DISTINCTs (token-keyed
    * shuffles), one inner + one LEFT ANTI join against the train vocab
    * (checkpointed — it feeds three branches), and five one-row
    * aggregates crossed at the close.
    */
  def vocabOverlap(trainDocs: DataFrame, evalDocs: DataFrame): DataFrame = {
    def toks(d: DataFrame) =
      d.select(explode(tokensCol(lower(col("text")))).as("token"))
        .filter(length(col("token")) > 0)
    val va = toks(trainDocs).distinct().localCheckpoint()
    val vb = toks(evalDocs).distinct()
    val evalToks = toks(evalDocs)
    va.agg(count(lit(1)).as("n_train_types"))
      .crossJoin(vb.agg(count(lit(1)).as("n_eval_types")))
      .crossJoin(vb.join(va, "token").agg(count(lit(1)).as("n_shared_types")))
      .crossJoin(evalToks.agg(count(lit(1)).as("n_eval_tokens")))
      .crossJoin(evalToks.join(va, Seq("token"), "left_anti")
        .agg(count(lit(1)).as("n_oov_tokens")))
      .select(col("n_train_types"), col("n_eval_types"),
        col("n_shared_types"), col("n_eval_tokens"), col("n_oov_tokens"),
        expr("1000000L * n_shared_types div greatest(1L," +
          " n_train_types + n_eval_types - n_shared_types)")
          .as("type_jaccard_ppm"),
        expr("1000000L * (n_eval_types - n_shared_types)" +
          " div greatest(1L, n_eval_types)").as("oov_type_ppm"),
        expr("1000000L * n_oov_tokens div greatest(1L, n_eval_tokens)")
          .as("oov_token_ppm"))
  }

  /** Language-ID evaluation against the corpus's labeled `lang` column:
    * the confusion matrix (truth × prediction counts) plus per-truth
    * recall in exact ppm — the eval card that turns [[langId]] from a
    * heuristic into a measured component (and catches drift when the
    * marker lists or the corpus mix change). One doc-keyed join of the
    * prediction frame back to the labels, one partial agg to the
    * bounded |langs|² cell table, and a window over THAT frame only.
    */
  def langIdEval(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    langId(docs).select(col("doc_id"), col("predicted_lang"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lang_total", sum("n").over(Window.partitionBy("lang")))
      .withColumn("cell_ppm", expr("1000000L * n div lang_total"))
  }

  /** Unicode-script/charset profile per document — the writing-system
    * card that complements [[langId]]'s marker voting (lang-id models
    * assume a script; a mixed-script or script-less doc is a spam /
    * mojibake / OCR-noise signal BEFORE language is even meaningful).
    * Counts characters in the Latin (incl. the Latin-1/Extended
    * accented block), Cyrillic, CJK (Han + kana + Hangul), and digit
    * classes via `length(text) − length(regexp_replace(class, ''))` —
    * one regex pass per class, no tokenization, no shuffle — then
    * elects the dominant script with a fixed tie order (latin >
    * cyrillic > cjk > none) and flags multi-script docs. Counts are by
    * codepoint in BOTH engines (Spark UTF8String chars == DuckDB
    * codepoints, supplementary chars count 1); class ranges are plain
    * codepoint intervals, so Java-regex and RE2 agree exactly despite
    * the different escape spelling.
    */
  def scriptProfile(docs: DataFrame): DataFrame = {
    def cnt(pat: String): Column =
      (length(col("text")) -
        length(regexp_replace(col("text"), pat, ""))).cast("long")
    docs.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      cnt("[A-Za-z\\u00C0-\\u024F]").as("n_latin"),
      cnt("[\\u0400-\\u04FF]").as("n_cyrillic"),
      cnt("[\\u4E00-\\u9FFF\\u3040-\\u30FF\\uAC00-\\uD7AF]").as("n_cjk"),
      cnt("[0-9]").as("n_digit"))
      .withColumn("script",
        when(col("n_latin") >= col("n_cyrillic") &&
          col("n_latin") >= col("n_cjk") && col("n_latin") > 0, "latin")
          .when(col("n_cyrillic") >= col("n_cjk") &&
            col("n_cyrillic") > 0, "cyrillic")
          .when(col("n_cjk") > 0, "cjk")
          .otherwise("none"))
      .withColumn("n_scripts",
        (when(col("n_latin") > 0, 1L).otherwise(0L) +
          when(col("n_cyrillic") > 0, 1L).otherwise(0L) +
          when(col("n_cjk") > 0, 1L).otherwise(0L)))
      .withColumn("mixed", col("n_scripts") > 1)
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

  /** n-gram novelty card — the memorization/generalization readout: what
    * share of the test side's distinct n-grams never appear in train?
    * High novelty = the eval text is genuinely out-of-corpus; novelty
    * ~0 = the "held-out" set is paraphrase-level contaminated even when
    * exact-match decontamination passed (the complement of the
    * contamination check: that one flags overlaps, this one quantifies
    * the remaining novelty mass). Grams via the native
    * `graft_shingles` single pass; one distinct per side, one keyed
    * anti-join, three one-row counts crossed (whitelisted).
    */
  def ngramNovelty(docs: DataFrame, trainSide: Column,
                   n: Int = 2): DataFrame = {
    val grams = docs.select(trainSide.as("train"),
      explode(expr(s"graft_shingles(text, $n)")).as("g"))
    val train = grams.filter(col("train")).select(col("g")).distinct()
      .localCheckpoint()               // feeds the count AND the anti-join
    val test = grams.filter(!col("train")).select(col("g")).distinct()
      .localCheckpoint()
    val novel = test.join(train, Seq("g"), "left_anti")
      .agg(count(lit(1)).as("n_novel"))
    train.agg(count(lit(1)).as("n_train_grams"))
      .crossJoin(broadcast(test.agg(count(lit(1)).as("n_test_grams"))))
      .crossJoin(broadcast(novel))
      .select(col("n_train_grams"), col("n_test_grams"), col("n_novel"),
        expr("1000000L * n_novel div n_test_grams").as("novelty_ppm"))
  }

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

  /** Tokenizer compression card: bytes-per-token by source — the
    * standard tokenizer-efficiency metric (a tokenizer that spends 6
    * bytes/token on code but 3.2 on prose changes the EFFECTIVE mix of
    * a byte-budgeted corpus, and a source whose ratio shifts between
    * snapshots has a charset/format regression). Tokens are the
    * [[bpeTokens]] regex classes; bytes are octet length (UTF-8), so
    * multibyte-script sources read honestly. One narrow pass +
    * one partial-aggregated shuffle on the bounded source key; the
    * ratio is an exact integer ppm.
    */
  def compressionCard(docs: DataFrame): DataFrame = {
    val toks = expr("regexp_count(text, '\\\\p{L}+') + " +
      "regexp_count(text, '\\\\p{N}+') + " +
      "regexp_count(text, '[^\\\\s\\\\p{L}\\\\p{N}]')")
    docs
      .select(col("source"), octet_length(col("text")).cast("long").as("b"),
        toks.cast("long").as("t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("b")).as("n_bytes"),
        sum(col("t")).as("n_tokens"),
        expr("1000000L * sum(b) div greatest(1L, sum(t))")
          .as("bytes_per_token_ppm"))
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
    * The whole filter is two native single-pass expressions inside one
    * narrow projection — no shuffle, no interpreted lambdas, at any scale
    * (token stats from `graft_tokstats`, bigram stats from
    * `graft_repstats`; documents with < 2 tokens have no bigrams and
    * default to 0).
    */
  def qualityFilter(docs: DataFrame,
                    minTokens: Long = 10L, maxTokens: Long = 1000L,
                    minStopword: Double = 0.02, maxTopNgram: Double = 0.20,
                    minTtr: Double = 0.30,
                    carry: Seq[String] = Nil): DataFrame = {
    // `carry` appends pass-through columns (e.g. text for a downstream
    // streaming stage that cannot join back) without changing the
    // default output the oracle hashes
    docs
      .withColumn("ts",
        expr(s"graft_tokstats(text, '${EnglishStopwords.mkString(",")}')"))
      .withColumn("st", expr("graft_repstats(text, 2)"))
      .select(Seq(
        col("doc_id"),
        col("ts.n_tokens").as("n_tokens"),
        (col("ts.n_stop").cast("double") /
          col("ts.n_tokens").cast("double")).as("stopword_ratio"),
        (col("ts.n_distinct").cast("double") /
          col("ts.n_tokens").cast("double")).as("type_token_ratio"),
        coalesce(
          col("st.top_count").cast("double") / col("st.n_ngrams").cast("double"),
          lit(0.0)).as("top_ngram_frac")) ++ carry.map(col): _*)
      .withColumn("reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("n_tokens") > maxTokens, "too_long")
          .when(col("stopword_ratio") < minStopword, "low_stopword")
          .when(col("top_ngram_frac") > maxTopNgram, "repetitive")
          .when(col("type_token_ratio") < minTtr, "low_diversity")
          .otherwise("ok"))
      .withColumn("keep", col("reason") === "ok")
      .select(Seq("doc_id", "n_tokens", "stopword_ratio",
        "type_token_ratio", "top_ngram_frac", "keep", "reason")
        .map(col) ++ carry.map(col): _*)
  }

  /** PII detection + redaction: count and replace emails, phone-like
    * numbers, and IPv4 addresses with typed placeholders — the scrubbing
    * pass every published-corpus pipeline runs. Pure narrow projection
    * (three codegen'd regex passes).
    *
    * The patterns deliberately avoid `\b`: Java's word boundary is
    * Unicode-aware while RE2's (DuckDB's) is ASCII-only, so a digit
    * adjacent to a non-ASCII letter would make the two engines disagree.
    * Character classes alone behave identically in both, at the cost of
    * occasionally over-matching inside longer digit runs — the right
    * trade for an engine-exact redaction hash.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\d{3}[-.]\\d{4}"
  val Ipv4Re = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

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

  /** Unigram-frequency document scoring (the CCNet-style LM-filter signal
    * in exact arithmetic): per document, the corpus-frequency profile of
    * its tokens — total and mean occurrence count, and the count of its
    * rarest token. Boilerplate scores high (all-common tokens), gibberish
    * scores low (singleton tokens); rank-equivalent to unigram-LM mean
    * log-prob without the `ln`, whose libm-vs-StrictMath last-ulp drift
    * would break cross-engine exactness (the monotone map to -mean ln p
    * is a driver-side afterthought if a calibrated score is wanted).
    *
    * Plan shape: explode tokens → count-over-window partitioned by token
    * (the jaccard df trick: ONE shuffle computes the corpus frequency and
    * leaves postings token-partitioned — no vocab-table join) → per-doc
    * aggregation. Two keyed shuffles total at any scale; integer sums are
    * exact, and the mean is a single IEEE division (deterministic, unlike
    * a float accumulation order).
    */
  /** Characteristic-term extraction: the top-k tokens of each document
    * ranked by tf/df — term frequency over corpus document frequency,
    * the tf-idf ranking with the constant-N scale (and the `ln`) removed
    * so the score stays a single engine-exact IEEE division while the
    * ORDER is identical to tf·idf for any fixed corpus. Ties break on
    * the token string.
    *
    * Plan: explode → (doc, token) tf aggregation → df via
    * count-over-window partitioned by token (postings stay
    * token-partitioned, no vocab join) → per-doc top-k window. Shuffles
    * are keyed on (doc, token), token, doc — never all-pairs.
    */
  def topTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    tf
      .withColumn("df", count(lit(1)).over(w.partitionBy("token")))
      .withColumn("score",
        col("tf").cast("double") / col("df").cast("double"))
      .withColumn("term_rank", row_number().over(
        w.partitionBy("doc_id")
          .orderBy(desc("score"), asc("token"))))
      .filter(col("term_rank") <= k)
      .select(col("doc_id"), col("term_rank").cast("long").as("term_rank"),
        col("token"), col("tf"), col("df"), col("score"))
  }

  def tokenRarity(docs: DataFrame): DataFrame = {
    val posting = docs.select(col("doc_id"),
      explode(tokensCol(col("text"))).as("token"))
    posting
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("token")))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("cnt")).as("sum_cnt"),
        min(col("cnt")).as("min_cnt"))
      .withColumn("mean_cnt",
        col("sum_cnt").cast("double") / col("n_tokens").cast("double"))
  }

  /** Two-level exact top-k for text retrieval — the BIGINT-score twin of
    * [[Similarity.topKPerQuery]]. Level 1 keeps a k-heap per query per
    * partition (narrow mapPartitions, zero shuffle on the scored slice);
    * level 2 ranks the ≤ k·P survivors per query, so the only
    * per-query window runs over |Q|·k·P rows — never the matched-doc
    * slice, which for a common query term is corpus-sized. Scores stay
    * Long end to end (no double round-trip: BM25 numerators can pass
    * 2^53 at large L where a double cast would lose exactness). The
    * heap's (score desc, doc_id asc) comparator is the same total order
    * as the final rank window, so the result is row-identical to the
    * single-window formulation. Input: (query_id, doc_id, score, n_terms)
    * all castable to long; |Q| bounded (the callers' broadcast-query-set
    * contract — heap state is |Q|·k per partition).
    */
  private[graft] def topKDocs(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
    // worst-first: PriorityQueue dequeues its max, so "greater" = "worse"
    // under (score desc, doc_id asc) — lower score or, on ties, larger id
    val worstFirst: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    val partial = scored
      .select(col("query_id").cast("long"), col("doc_id").cast("long"),
        col("score").cast("long"), col("n_terms").cast("long"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        val heaps = new java.util.HashMap[
          Long, scala.collection.mutable.PriorityQueue[(Long, Long, Long)]]()
        val ord: Ordering[(Long, Long, Long)] =
          Ordering.by[(Long, Long, Long), (Long, Long)](t => (t._1, t._2))(worstFirst)
        it.foreach { case (qid, did, score, nt) =>
          var h = heaps.get(qid)
          if (h == null) {
            h = scala.collection.mutable.PriorityQueue.empty(ord)
            heaps.put(qid, h)
          }
          if (h.size < k) h.enqueue((score, did, nt))
          else if (ord.compare((score, did, nt), h.head) < 0) {
            h.dequeue(); h.enqueue((score, did, nt))
          }
        }
        val out =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        heaps.forEach((qid, h) =>
          h.foreach { case (s, d, nt) => out += ((qid, d, s, nt)) })
        out.iterator
      }
      .toDF("query_id", "doc_id", "score", "n_terms")
    partial
      .withColumn("rank", row_number().over(
        w.partitionBy("query_id").orderBy(desc("score"), asc("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score"), col("n_terms"))
  }

  /** Keyword retrieval: top-k documents per query, scored by idf-weighted
    * term frequency over an inverted index — the full-text-search query a
    * corpus tool runs ("which documents mention these terms"), and the
    * lexical half of hybrid (BM25 + vector) retrieval next to
    * [[Similarity.bruteTopK]]. Scoring is
    * `Σ_terms tf(term,doc) · (10^6 div df(term))` — BM25's shape with the
    * log and length norm dropped so every score is an exact BIGINT
    * (reduction-order-free, engine-portable; ranking quality at this
    * corpus scale is driven by the idf ordering, which integer division
    * preserves).
    *
    * Scale shape: the broadcast query-token filter sits DIRECTLY under the
    * posting explode, so only postings whose token appears in some query
    * ever shuffle — tf's partial agg on (doc, token) and df's
    * count-over-window on the token key both run on the matched slice,
    * not the corpus (df(term) only needs counting for query terms;
    * reordering the filter below the window changes nothing semantically
    * and cuts the shuffled volume by ~|vocab|/|query terms|). The close
    * is [[topKDocs]]'s two-level top-k: per-partition k-heaps, then a
    * rank over |Q|·k·P survivors — a single per-query window over the
    * matched-doc slice would funnel every doc containing a common query
    * term into one reducer.
    */
  def searchTopK(docs: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val qTerms = queries
      .select(col("query_id"), explode(tokensCol(col("query_text"))).as("token"))
      .distinct()
    val qTokens = qTerms.select(col("token")).distinct()
    val tf = docs
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("token"))
      .join(broadcast(qTokens), Seq("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(w.partitionBy("token")))
    val scored = tf.join(broadcast(qTerms), Seq("token"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr("tf * (1000000 div df)")).as("score"),
        count(lit(1)).as("n_terms"))
    topKDocs(scored, k)
  }

  /** BM25 retrieval: top-k documents per query with the two behaviors
    * [[searchTopK]]'s flat tf·idf lacks — term-frequency SATURATION
    * (k1 = 1.2: the 100th occurrence adds almost nothing) and
    * DOC-LENGTH NORMALIZATION (b = 0.75: long documents stop winning on
    * bulk alone). Per-term score
    * `idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))` is computed as ONE
    * exact integer division: with k1 = 6/5, b = 3/4 and avgdl = L/N
    * (L = corpus token count, N = doc count) the denominator scaled by
    * 10·L is `10·L·tf + 3·L + 9·dl·N` — all BIGINT — so
    * `score_term = (idf · 2200·L·tf) div that`, a floor at 3 decimal
    * places, and the per-doc sum is reduction-order-free. The ln-idf is
    * replaced by [[searchTopK]]'s rank-preserving `10^6 div df` (ln is
    * not portable across libm implementations; 1/df orders terms exactly
    * as ln(N/df) does for fixed N). Magnitudes: idf ≤ 10^6, tf ≤ 10^4,
    * the numerator tops out near 2·10^17 at L = 10^6 — at a 100 TB
    * corpus (L ~ 10^13) move the numerator to DECIMAL(38,0); the plan is
    * unchanged.
    *
    * Scale shape: identical to [[searchTopK]] — the broadcast query-token
    * filter sits under the posting explode so only matched postings
    * shuffle — plus one narrow per-doc length projection (`size(tokens)`,
    * no explode, no shuffle) joined onto the matched slice and one
    * all-corpus single-row total (L, N) cross-joined as a broadcast
    * literal. [[topKDocs]]'s two-level top-k closes it out (partial
    * k-heaps per partition, rank over |Q|·k·P survivors).
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val qTerms = queries
      .select(col("query_id"), explode(tokensCol(col("query_text"))).as("token"))
      .distinct()
    val qTokens = qTerms.select(col("token")).distinct()
    val lens = docs.select(col("doc_id"), size(tokensCol(col("text"))).cast("long").as("dl"))
    val totals = lens.agg(sum(col("dl")).as("corpus_len"), count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("token"))
      .join(broadcast(qTokens), Seq("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(w.partitionBy("token")))
    val scored = tf.join(broadcast(qTerms), Seq("token"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .withColumn("term_score", expr(
        """((1000000 div df) * 2200 * corpus_len * tf)
           div (10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs)"""))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score"), count(lit(1)).as("n_terms"))
    topKDocs(scored, k)
  }

  /** Pseudo-relevance-feedback query expansion (RM1/Rocchio lexical
    * form) — the classic recall-recovery stage: take each query's
    * [[bm25TopK]] feedback docs, rank THEIR terms by exact tf·idf
    * (`fb_tf · (10⁶ div df)`, the library's rank-preserving integer
    * idf), drop the original query terms, and emit the top `mTerms`
    * expansion terms per query with a deterministic (weight desc, term
    * asc) order.
    *
    * Scale shape: the feedback set is |Q|·kDocs doc ids (broadcast);
    * its term frame is feedback-sized, so the global-df pass filters
    * the full posting stream through a broadcast vocabulary semi-join
    * (only feedback-vocab postings ever aggregate — the bm25 qTokens
    * pattern one level up), and the rank window partitions per query
    * over feedback-bounded frames, never the corpus.
    */
  def prfExpandTerms(docs: DataFrame, queries: DataFrame,
                     kDocs: Int = 5, mTerms: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(kDocs >= 1 && mTerms >= 1)
    val fb = bm25TopK(docs, queries, kDocs)
      .select(col("query_id"), col("doc_id"))
    val ftf = docs.join(broadcast(fb), "doc_id")
      .select(col("query_id"), explode(tokensCol(col("text"))).as("token"))
      .groupBy(col("query_id"), col("token"))
      .agg(count(lit(1)).as("fb_tf"))
    val vocab = ftf.select(col("token")).distinct()
    val df = docs
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("token"))
      .join(broadcast(vocab), Seq("token"))
      .groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val qTerms = queries
      .select(col("query_id"),
        explode(tokensCol(col("query_text"))).as("token"))
      .distinct()
    ftf.join(qTerms, Seq("query_id", "token"), "left_anti")
      .join(df, "token")
      .withColumn("weight", expr("fb_tf * (1000000L div df)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(desc("weight"), col("token"))).cast("long"))
      .filter(col("rank") <= mTerms)
      .select(col("query_id"), col("rank"), col("token"), col("fb_tf"),
        col("df"), col("weight"))
  }

  /** Late-interaction passage retrieval (the BERT-MaxP / ColBERT
    * max-pooling shape, lexical form): each query term matches the BEST
    * fixed-size passage of each document — `max` over chunk-level tf —
    * before summing idf-weighted term scores, so one on-topic passage
    * inside a long document wins where document-level tf dilutes it
    * (the long-doc failure mode flat [[bm25TopK]] carries). All-integer
    * scoring: `Σ_t (1e6 div df_t) · max_chunk tf(t, chunk)` — exact,
    * order-free, engine-portable.
    *
    * Scale shape mirrors bm25: the broadcast query-token filter sits
    * directly under the posting explode (only matching postings ever
    * shuffle), chunk ids derive from token positions (`pos div C` — no
    * second tokenization), max-pooling is one more partial agg on
    * (doc, token) over the already-matched slice, df is the
    * count-over-window on the token key, and the close is [[topKDocs]]'s
    * two-level top-k.
    */
  def maxSimTopK(docs: DataFrame, queries: DataFrame, k: Int = 5,
                 chunkTokens: Int = 32): DataFrame = {
    require(chunkTokens >= 1)
    val w = org.apache.spark.sql.expressions.Window
    val qTerms = queries
      .select(col("query_id"),
        explode(tokensCol(col("query_text"))).as("token"))
      .distinct()
    val qTokens = qTerms.select(col("token")).distinct()
    val best = docs
      .select(col("doc_id"),
        posexplode(tokensCol(col("text"))).as(Seq("pos", "token")))
      .join(broadcast(qTokens), Seq("token"))
      .select(col("doc_id"), expr(s"pos div $chunkTokens").as("chunk"),
        col("token"))
      .groupBy(col("doc_id"), col("chunk"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"), col("token"))
      .agg(max(col("tf")).as("max_tf"))
      .withColumn("df", count(lit(1)).over(w.partitionBy("token")))
    val scored = best.join(broadcast(qTerms), Seq("token"))
      .withColumn("term_score", expr("(1000000L div df) * max_tf"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score"), count(lit(1)).as("n_terms"))
    topKDocs(scored, k)
  }

  /** Stopwords used by [[keyphrases]] — inlined so the DuckDB oracle
    * carries the identical list. */
  val RakeStops: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "on", "for", "with", "as", "at", "by", "from",
    "it", "this", "that", "are", "was", "be")

  /** RAKE keyphrase extraction: candidate phrases are the maximal runs
    * of non-stopword tokens (gaps-and-islands over the token stream),
    * each word scores `degree/frequency` within its document (degree =
    * summed length of phrases containing it — words living in longer
    * phrases rank up), and a phrase scores the sum of its words. The
    * per-word ratio is integer-scaled `deg·1e6 div freq`, so phrase
    * scores are exact BIGINTs and ranking is engine-deterministic
    * (score desc, phrase asc over per-doc DISTINCT phrases).
    *
    * Scale shape: everything is keyed on doc_id — the island window,
    * the phrase-length window, and the final rank all partition per
    * document (bounded by doc length); word stats are one
    * partial-aggregated (doc, word) shuffle. No corpus-wide state.
    */
  def keyphrases(docs: DataFrame, topK: Int = 5,
                 maxLen: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+"))
          .as(Seq("p", "raw")))
      .withColumn("w", regexp_replace(col("raw"), "[^a-z0-9]", ""))
      .withColumn("is_stop",
        col("w") === "" || col("w").isin(RakeStops: _*))
    val wIdx = Window.partitionBy("doc_id").orderBy("p")
    val islands = toks
      .withColumn("grp", sum(when(col("is_stop"), 1L).otherwise(0L)).over(
        wIdx.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(!col("is_stop"))
      .select(col("doc_id"), col("grp"), col("p"), col("w"))
    val ph = islands
      .withColumn("len",
        count(lit(1)).over(Window.partitionBy("doc_id", "grp")))
      .filter(col("len") <= maxLen)
    val wscore = ph.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
      .select(col("doc_id"), col("w"),
        expr("deg * 1000000L div freq").as("wscore"))
    val scored = ph.join(wscore, Seq("doc_id", "w"))
      .groupBy(col("doc_id"), col("grp"))
      .agg(sum(col("wscore")).as("score_scaled"),
        expr("array_join(transform(array_sort(collect_list(" +
          "struct(p, w))), x -> x.w), ' ')").as("phrase"))
    // identical phrase text => identical word multiset => same score,
    // so the dedup's max() is a no-op and ranking ties resolve on text
    scored.groupBy(col("doc_id"), col("phrase"))
      .agg(max(col("score_scaled")).as("score_scaled"),
        count(lit(1)).as("n_occurrences"))
      .withColumn("rank", row_number().over(Window.partitionBy("doc_id")
        .orderBy(desc("score_scaled"), col("phrase"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("phrase"),
        col("score_scaled"), col("n_occurrences"))
  }

  /** Two-stage retrieval: BM25 shortlist → exact embedding-cosine
    * re-rank — the retrieve-then-rerank composite every RAG serving
    * stack runs (cheap lexical recall over the corpus, expensive exact
    * similarity only over the shortlist). Stage 1 is [[bm25TopK]] with
    * its two-level top-k close (the only corpus-sized work); stage 2
    * joins the ≤ |Q|·kRetrieve shortlist rows to their embeddings and
    * re-ranks by [[graft.ops.Similarity.cosineCol]] — the rank window
    * runs over the BOUNDED shortlist, never the corpus, so the
    * single-window form is safe by construction here. Cosine parity is
    * the ann_brute recipe: sequential-fold `graft_dot` matches DuckDB's
    * `list_dot_product` bit for bit, sqrt is IEEE-correctly rounded.
    * `docEmb` maps doc_id → embedding; `queryEmb` is |Q|-sized and
    * broadcast.
    */
  def retrieveRerank(docs: DataFrame, queries: DataFrame,
                     docEmb: DataFrame, queryEmb: DataFrame,
                     kRetrieve: Int = 10, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shortlist = bm25TopK(docs, queries, kRetrieve)
      .select(col("query_id"), col("doc_id"))
    shortlist
      .join(docEmb.select(col("doc_id"), col("embedding").as("d_emb")),
        Seq("doc_id"))
      .join(broadcast(queryEmb.select(col("query_id"),
        col("q_emb"))), Seq("query_id"))
      .withColumn("cosine",
        graft.ops.Similarity.cosineCol(col("d_emb"), col("q_emb")))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(desc("cosine"), asc("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"))
  }

  /** Hard-negative mining for contrastive retrieval training: per query,
    * the documents that score HIGH lexically (BM25 shortlist — they look
    * relevant) but LOW semantically (embedding cosine under `maxCos` —
    * they aren't) — exactly the negatives an embedding model learns the
    * most from, and the standard companion op to [[retrieveRerank]] in a
    * training-data pipeline. Same scale shape as the re-ranker: the BM25
    * stage is the only corpus-sized work, the cosine gate runs over the
    * bounded shortlist. Output `(query_id, doc_id, bm25_rank)` keeps the
    * lexical rank (negatives are usually consumed hardest-first) and no
    * float columns — the cosine participates only in the comparison, the
    * decidable part of the float recipe.
    */
  def hardNegatives(docs: DataFrame, queries: DataFrame,
                    docEmb: DataFrame, queryEmb: DataFrame,
                    kRetrieve: Int = 10, maxCos: Double = 0.5): DataFrame =
    bm25TopK(docs, queries, kRetrieve)
      .select(col("query_id"), col("doc_id"), col("rank").as("bm25_rank"))
      .join(docEmb.select(col("doc_id"), col("embedding").as("d_emb")),
        Seq("doc_id"))
      .join(broadcast(queryEmb.select(col("query_id"), col("q_emb"))),
        Seq("query_id"))
      .filter(graft.ops.Similarity.cosineCol(col("d_emb"), col("q_emb")) <
        lit(maxCos))
      .select(col("query_id"), col("doc_id"), col("bm25_rank"))

  /** Reciprocal-rank fusion — the standard hybrid-search combiner: each
    * input ranking contributes `1/(kRrf + rank)` per (query, doc), the
    * sums re-rank. The score is integer-scaled `1e9 div (kRrf + rank)`
    * (floor division both engines share), so fusion of exactly-ranked
    * inputs stays exactly ranked — no float accumulation between
    * rankers. RRF needs no score calibration between the fused systems
    * (only ranks), which is why it's the default way to merge lexical
    * BM25 with embedding ANN.
    *
    * Scale shape: each ranking is already top-k-per-query (bounded); the
    * union, per-(query,doc) rollup, and final re-rank window all operate
    * on ≤ Σ k_i rows per query — never corpus-sized. Inputs need
    * `(query_id, doc_id, rank)`.
    */
  def rrfFuse(rankings: Seq[DataFrame], kRrf: Int = 60,
              topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    import org.apache.spark.sql.expressions.Window
    rankings
      .map(_.select(col("query_id"), col("doc_id"),
        expr(s"1000000000L div (${kRrf}L + rank)").as("c")))
      .reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("rrf_scaled"), count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(desc("rrf_scaled"), col("doc_id"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_scaled"), col("n_lists"))
  }

  /** Bigram language-model training: conditional continuation
    * probabilities P(w2 | w1) = c(w1 w2) / c(w1 ·), kept to the top
    * `topK` continuations per head token — the tiny in-corpus LM behind
    * next-token baselines and domain-drift checks. Counts come from two
    * partial-agg shuffles (bigram, then head-token rollup via a window
    * on the same key); the probability is one exact-integer division.
    * Output is vocabulary-bounded, never corpus-sized.
    */
  def bigramLm(docs: DataFrame, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), tokensCol(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val bigrams = toks
      .select(col("t"), posexplode(col("t")).as(Seq("p", "w1")))
      .filter(col("p") < size(col("t")) - 1)
      .select(col("w1"), element_at(col("t"), col("p") + 2).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val w = Window.partitionBy("w1")
    val rk = Window.partitionBy("w1").orderBy(desc("c12"), col("w2"))
    bigrams
      .withColumn("c1", sum(col("c12")).over(w))
      .withColumn("rank", row_number().over(rk))
      .filter(col("rank") <= topK)
      .select(col("w1"), col("rank").cast("long").as("rank"), col("w2"),
        col("c12"), col("c1"),
        (col("c12").cast("double") / col("c1").cast("double")).as("p"))
  }

  /** Interpolated Kneser–Ney smoothed bigram LM — the n-gram smoothing
    * that actually works for language data ([[bigramLm]]'s MLE gives
    * unseen continuations zero mass; KN discounts every observed bigram
    * by d=3/4 and redistributes to a CONTINUATION prior — "how many
    * contexts does w2 complete?" — the reason 'Francisco' scores low
    * despite high frequency). With T = bigram types, n1l(w1) = distinct
    * continuations of w1, n1r(w2) = distinct left contexts of w2:
    *
    *   P_KN(w2|w1) = max(c12 − 3/4, 0)/c1 + (3/4)·n1l(w1)/c1 · n1r(w2)/T
    *
    * Engine-exact via one common denominator: p_num = max(4·c12−3,0)·T +
    * 3·n1l·n1r over p_den = 4·c1·T, all BIGINT, ONE final double
    * division. (At petabyte counts p_num approaches Long range — swap the
    * scaled pair to DECIMAL(38,0) there; the sf ladder stays exact.)
    *
    * Scale shape: one (w1,w2) partial-agg shuffle builds the type table;
    * c1/n1l ride a w1 window that the top-k rank window REUSES (one
    * exchange, the twap key-reuse rule); n1r is a w2-keyed groupBy joined
    * back; T broadcasts as a one-row total. Output bounded to topK rows
    * per context — vocabulary-sized, never corpus-sized.
    */
  def kneserNey(docs: DataFrame, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), tokensCol(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val bigrams = toks
      .select(col("t"), posexplode(col("t")).as(Seq("p", "w1")))
      .filter(col("p") < size(col("t")) - 1)
      .select(col("w1"), element_at(col("t"), col("p") + 2).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val n1r = bigrams.groupBy(col("w2")).agg(count(lit(1)).as("n1r"))
    val total = bigrams.select(count(lit(1)).as("tt"))
    val w = Window.partitionBy("w1")
    val rk = Window.partitionBy("w1").orderBy(desc("p_num"), col("w2"))
    bigrams
      .join(n1r, "w2")
      .crossJoin(broadcast(total))
      .withColumn("c1", sum(col("c12")).over(w))
      .withColumn("n1l", count(lit(1)).over(w))
      .withColumn("p_num",
        greatest(lit(0L), col("c12") * 4L - 3L) * col("tt")
          + lit(3L) * col("n1l") * col("n1r"))
      .withColumn("p_den", lit(4L) * col("c1") * col("tt"))
      .withColumn("rank", row_number().over(rk))
      .filter(col("rank") <= topK)
      .select(col("w1"), col("rank").cast("long").as("rank"), col("w2"),
        col("c12"), col("n1l"), col("n1r"), col("p_num"), col("p_den"),
        (col("p_num").cast("double") / col("p_den").cast("double"))
          .as("p_kn"))
  }

  /** Distributed BPE tokenizer training: learn the top `merges` byte-pair
    * merges from corpus word frequencies — the tokenizer-fitting step of
    * a training-data pipeline. Classic BPE with deterministic tie-break
    * (highest pair count, then lexicographic pair), greedy leftmost
    * non-overlapping application per word.
    *
    * Everything is relational, so the DuckDB oracle unrolls the SAME
    * rounds and hash-matches: adjacency via `lead` over (word, pos);
    * greedy leftmost application via gaps-and-islands parity (within a
    * run of consecutive flagged pairs, every odd-indexed pair merges —
    * exactly the sequential greedy result, e.g. "aaaa" → [aa, aa]);
    * rebuild drops the absorbed position and renumbers.
    *
    * Scale shape: state is the WORD VOCABULARY exploded to symbols (never
    * the corpus — word frequencies are aggregated up front), shuffles are
    * keyed on word/pair, and each round's argmax collects ONE row to the
    * driver. State is referenced several times per round → per-round
    * localCheckpoint. Stops early if the vocabulary runs out of pairs.
    *
    * Output: `(round, a, b, cnt)`, one row per learned merge.
    */
  def bpeTrain(docs: DataFrame, merges: Int = 10): DataFrame = {
    val (found, _) = bpeTrainLoop(docs, merges)
    val sp = docs.sparkSession
    import sp.implicits._
    found.toDF("round", "a", "b", "cnt")
  }

  /** The [[bpeTrain]] loop, also returning the FINAL merged vocabulary
    * state `(word, freq, pos, sym)` — training's last round already
    * holds every corpus word fully encoded, so an encode pass over the
    * SAME corpus can reuse it instead of re-applying all merge rounds
    * ([[bpeTrainEncode]]); re-application is only needed for words the
    * training corpus never saw ([[bpeEncode]]).
    */
  private def bpeTrainLoop(docs: DataFrame, merges: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    require(merges >= 1)
    // drop empty tokens: Spark's sequence(1, 0) DESCENDS ([1, 0]) where
    // DuckDB's generate_series(1, 0) is empty — a zero-length word would
    // desync the engines
    val words = docs.select(explode(tokensCol(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    var state = words
      .select(col("word"), col("freq"),
        explode(expr("sequence(1, length(word))")).as("pos"))
      .withColumn("sym", expr("substring(word, pos, 1)"))
      .localCheckpoint(true)
    val w = Window.partitionBy("word").orderBy("pos")
    val found = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var r = 0
    var exhausted = false
    while (r < merges && !exhausted) {
      val paired = state.withColumn("nxt", lead(col("sym"), 1).over(w))
      val best = paired.filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt")).agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("sym"), asc("nxt")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        found += ((r.toLong, a, b, cnt))
        state = bpeApplyMerge(paired, a, b, Seq("freq")).localCheckpoint(true)
        r += 1
      }
    }
    (found.toSeq, state)
  }

  /** Train-then-encode over ONE corpus without duplicated rounds: the
    * final training state already carries every word fully merged, so
    * encode is just the vocab→corpus join ([[bpeEncode]]'s tail) with
    * zero extra merge rounds. Halves the train+encode pipeline (the
    * registered `text_bpe_encode` shape); output is row-identical to
    * `bpeEncode(docs, bpeTrain(docs, merges))`.
    */
  def bpeTrainEncode(docs: DataFrame, merges: Int = 10): DataFrame = {
    val (_, state) = bpeTrainLoop(docs, merges)
    val toks = docs.select(col("doc_id"),
      posexplode(tokensCol(col("text"))).as(Seq("tpos", "word")))
      .filter(length(col("word")) > 0)
    bpeEncodeVocabJoin(toks, state)
  }

  /** The shared encode tail: collapse a merged `(word, pos, sym)` state
    * to per-word subword strings, join the corpus tokens, roll up per
    * doc with an order-preserving md5 of the subword stream.
    */
  private def bpeEncodeVocabJoin(toks: DataFrame, state: DataFrame): DataFrame = {
    val enc = state.groupBy(col("word"))
      .agg(count(lit(1)).as("n_sub"),
        array_join(expr(
          "transform(sort_array(collect_list(struct(pos, sym))), x -> x.sym)"),
          " ").as("enc"))
    toks.join(enc, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("n_sub")).as("n_subwords"),
        md5(array_join(expr(
          "transform(sort_array(collect_list(struct(tpos, enc))), x -> x.enc)"),
          " ")).as("enc_hash"))
  }

  /** One greedy-leftmost merge application over a
    * `(word, carry*, pos, sym, nxt)` frame — the relational merge step
    * shared by [[bpeTrain]] and [[bpeEncode]] (flag → islands parity →
    * drop absorbed → renumber).
    */
  private def bpeApplyMerge(paired: DataFrame, a: String, b: String,
                            carry: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("word").orderBy("pos")
    paired
      .withColumn("m",
        when(col("sym") === a && col("nxt") === b, 1).otherwise(0))
      .withColumn("grp", col("pos") -
        row_number().over(Window.partitionBy("word", "m").orderBy("pos")))
      .withColumn("sel", when(col("m") === 1 &&
        row_number().over(
          Window.partitionBy("word", "m", "grp").orderBy("pos")) % 2 === 1,
        1).otherwise(0))
      .withColumn("prev_sel", lag(col("sel"), 1).over(w))
      .filter(coalesce(col("prev_sel"), lit(0)) === 0)
      .withColumn("sym2", when(col("sel") === 1,
        concat(col("sym"), col("nxt"))).otherwise(col("sym")))
      .withColumn("npos", row_number().over(w))
      .select((col("word") +: carry.map(col)) ++
        Seq(col("npos").as("pos"), col("sym2").as("sym")): _*)
  }

  /** Tokenize the corpus with a learned merge list (the [[bpeTrain]]
    * output): the encode half of the tokenizer. Merges apply to the
    * word VOCABULARY (each distinct word encoded once, corpus joins the
    * result) — at 100 TB the per-round relational work stays vocab-sized
    * and the only corpus-scale operations are one token explode and one
    * keyed join. Output per document: token count, subword count, and an
    * md5 of the full subword sequence in order (the compact
    * equality-checkable form of the encoding).
    */
  def bpeEncode(docs: DataFrame,
                merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      posexplode(tokensCol(col("text"))).as(Seq("tpos", "word")))
      .filter(length(col("word")) > 0)
    var state = toks.select(col("word")).distinct()
      .select(col("word"),
        explode(expr("sequence(1, length(word))")).as("pos"))
      .withColumn("sym", expr("substring(word, pos, 1)"))
      .localCheckpoint(true)
    val w = Window.partitionBy("word").orderBy("pos")
    merges.foreach { case (a, b) =>
      val paired = state.withColumn("nxt", lead(col("sym"), 1).over(w))
      state = bpeApplyMerge(paired, a, b, Seq.empty).localCheckpoint(true)
    }
    bpeEncodeVocabJoin(toks, state)
  }

  /** Train-then-DECODE round trip: run the same `merges` training rounds
    * as [[bpeTrainEncode]], then decode every vocabulary word by
    * concatenating its subwords back in position order — the
    * encode∘decode == identity audit a tokenizer release gate runs.
    * BPE merges only ever CONCATENATE adjacent symbols, so the decode is
    * lossless by construction; `roundtrip_ok` makes the identity a
    * checkable column (and the oracle re-derives it independently).
    *
    * Output per distinct corpus word: `(word, n_sub, decoded,
    * roundtrip_ok)`. Scale shape: identical to training (vocabulary-
    * sized state, never corpus-sized); the decode itself is one
    * vocab-keyed aggregation.
    */
  def bpeTrainDecode(docs: DataFrame, merges: Int = 10): DataFrame = {
    val (_, state) = bpeTrainLoop(docs, merges)
    state.groupBy(col("word"))
      .agg(count(lit(1)).as("n_sub"),
        array_join(expr(
          "transform(sort_array(collect_list(struct(pos, sym))), x -> x.sym)"),
          "").as("decoded"))
      .withColumn("roundtrip_ok", col("decoded") === col("word"))
  }

  /** ROUGE-N overlap card — the summarization/compression eval metric,
    * exactly: clipped n-gram matches between a candidate and its
    * reference, match = Σ_g min(count_cand(g), count_ref(g)), with
    * precision/recall/F1 in floored ppm (F1 folds to the division-free
    * identity 2·match/(n_cand + n_ref), so ONE div covers it). BLEU's
    * geometric mean needs logs (not engine-portable); ROUGE is pure
    * count algebra and serves the same regression-gate role.
    *
    * Input: `(pair_id, cand, ref)` — one row per candidate/reference
    * pair. Output per pair: `(pair_id, n, n_cand, n_ref, n_match,
    * precision_ppm, recall_ppm, f1_ppm)`; a side shorter than n grams
    * surfaces NULL metrics, never a throw.
    *
    * Scale shape: each side explodes to multiset n-grams (the native
    * `graft_ngrams` single pass), collapses to (pair, gram) counts in
    * one partial-aggregated groupBy, and the clip is an equi-join on
    * (pair, gram) — 1:1 pairing, never a pair-of-pairs blowup.
    */
  def rougeN(pairs: DataFrame, n: Int): DataFrame = {
    require(n >= 1)
    def grams(side: String) = pairs
      .select(col("pair_id"),
        explode(expr(s"graft_ngrams($side, $n)")).as("g"))
      .groupBy(col("pair_id"), col("g"))
      .agg(count(lit(1)).as(s"c_$side"))
    val cg = grams("cand")
    val rg = grams("ref")
    val matched = cg.join(rg, Seq("pair_id", "g"))
      .groupBy(col("pair_id"))
      .agg(sum(least(col("c_cand"), col("c_ref"))).as("n_match"))
    cg.groupBy(col("pair_id")).agg(sum(col("c_cand")).as("n_cand"))
      .join(rg.groupBy(col("pair_id")).agg(sum(col("c_ref")).as("n_ref")),
        Seq("pair_id"), "full")
      .join(matched, Seq("pair_id"), "left")
      .withColumn("n_match",
        when(col("n_cand").isNull || col("n_ref").isNull, lit(null))
          .otherwise(coalesce(col("n_match"), lit(0L))))
      .withColumn("n", lit(n.toLong))
      .withColumn("precision_ppm",
        expr("1000000L * n_match div n_cand"))
      .withColumn("recall_ppm", expr("1000000L * n_match div n_ref"))
      .withColumn("f1_ppm",
        expr("2000000L * n_match div (n_cand + n_ref)"))
      .select(col("pair_id"), col("n"), col("n_cand"), col("n_ref"),
        col("n_match"), col("precision_ppm"), col("recall_ppm"),
        col("f1_ppm"))
  }

  /** BLEU-2 card — the precision side of the generation-eval pair
    * ([[rougeN]] is the recall side): per candidate/reference pair,
    * CLIPPED unigram and bigram precisions in floored ppm, their
    * product `bleu2_sq_e12 = p1_ppm·p2_ppm` (the exp-free monotone
    * transform of BLEU-2's geometric mean — (10⁶·BLEU₂)², same ranking,
    * pure integers; logs are not engine-portable, the ROUGE lesson),
    * and the brevity-penalty OPERANDS (`len_ratio_ppm = 10⁶·c div r`,
    * `bp_applied = c < r`) rather than exp(1−r/c). Clipped-count
    * algebra is the rougeN machinery verbatim: multiset n-grams via the
    * native `graft_ngrams` pass, (pair, gram) partial-agg counts,
    * min-clip on the 1:1 gram equi-join — never a pair-of-pairs
    * blowup. A single-token candidate has no bigrams: p2 reports NULL
    * (guarded div), never an ANSI throw. Candidates/references are
    * expected non-empty (the summarization contract upstream).
    */
  def bleuCard(pairs: DataFrame): DataFrame = {
    def grams(side: String, n: Int) = pairs
      .select(col("pair_id"),
        explode(expr(s"graft_ngrams($side, $n)")).as("g"))
      .groupBy(col("pair_id"), col("g"))
      .agg(count(lit(1)).as("c_side"))
    def stats(n: Int) = {
      val cg = grams("cand", n)
      val rg = grams("ref", n).withColumnRenamed("c_side", "c_ref")
      val m = cg.join(rg, Seq("pair_id", "g"))
        .groupBy(col("pair_id"))
        .agg(sum(least(col("c_side"), col("c_ref"))).as(s"m$n"))
      cg.groupBy(col("pair_id")).agg(sum(col("c_side")).as(s"c$n"))
        .join(m, Seq("pair_id"), "left")
        .withColumn(s"m$n", coalesce(col(s"m$n"), lit(0L)))
    }
    val refLen = grams("ref", 1).groupBy(col("pair_id"))
      .agg(sum(col("c_side")).as("n_ref"))
    stats(1)
      .join(stats(2), Seq("pair_id"), "left")
      .join(refLen, Seq("pair_id"))
      .withColumn("p1_ppm", expr("1000000L * m1 div c1"))
      .withColumn("p2_ppm",
        when(col("c2").isNotNull && col("c2") > 0L,
          expr("1000000L * m2 div c2")))
      .withColumn("bleu2_sq_e12", col("p1_ppm") * col("p2_ppm"))
      .withColumn("len_ratio_ppm", expr("1000000L * c1 div n_ref"))
      .withColumn("bp_applied", col("c1") < col("n_ref"))
      .select(col("pair_id"), col("c1").as("n_cand"), col("n_ref"),
        col("m1"), col("m2"), col("p1_ppm"), col("p2_ppm"),
        col("bleu2_sq_e12"), col("len_ratio_ppm"), col("bp_applied"))
  }

  /** Pairwise total-variation distance between per-source unigram
    * distributions — the exact, libm-free corpus-divergence card
    * (KL/JSD need logs, which are not engine-portable; TVD = ½·Σ|p−q|
    * is pure count algebra and bounds every f-divergence-derived
    * decision the mixture planner makes). For each source pair (a, b):
    * tvd = ½(Σ_common |p_w − q_w| + mass_a_only + mass_b_only), and the
    * one-sided tails fold in WITHOUT a full-outer join:
    * Σ_a-only p_w = 1 − Σ_common p_w — so an INNER vocab join suffices.
    * (Corollary: a pair sharing ZERO words emits no row — its TVD is
    * trivially 1; callers wanting those rows cross-join the source list
    * and coalesce.)
    *
    * Scale shape: the corpus collapses to (source, word) counts in one
    * partial-aggregated groupBy (vocabulary-sized, never corpus-sized);
    * the pair frame is a vocab self-join on word (source count is
    * small, so fanout per word is |sources|²/2) and one groupBy to
    * |source pairs| rows. All numerators are exact integers —
    * DECIMAL(38,0) before the cross-products (cnt·N nears 10³⁸ only
    * past yottascale).
    */
  def sourceTvd(docs: DataFrame): DataFrame = {
    val wc = docs
      .select(col("source"), explode(tokensCol(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("c"))
    val totals = wc.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val a = wc.as("a").join(broadcast(totals.as("ta")),
      col("a.source") === col("ta.source"))
    val b = wc.as("b").join(broadcast(totals.as("tb")),
      col("b.source") === col("tb.source"))
    a.join(b, col("a.word") === col("b.word") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(
        max(col("ta.n")).as("n_a"), max(col("tb.n")).as("n_b"),
        sum(expr("abs(CAST(a.c AS DECIMAL(38,0)) * tb.n" +
          " - CAST(b.c AS DECIMAL(38,0)) * ta.n)")).as("diff_common"),
        sum(col("a.c")).as("common_a"), sum(col("b.c")).as("common_b"),
        count(lit(1)).as("n_common_words"))
      .withColumn("tvd_ppm", expr(
        """CAST((diff_common
                 + (CAST(n_a AS DECIMAL(38,0)) - common_a) * n_b
                 + (CAST(n_b AS DECIMAL(38,0)) - common_b) * n_a) * 500000
                div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"""))
      .select(col("source_a"), col("source_b"), col("n_common_words"),
        col("tvd_ppm"))
  }

  /** Domain-affinity scoring against a trained [[bigramLm]]: the mean
    * in-model bigram probability of each document — the `ln`-free
    * selection signal for "keep documents that look like the target
    * domain" (a perplexity stand-in that stays engine-exact: each
    * matched bigram contributes the exact integer floor(10⁶·c12/c1),
    * unmatched bigrams contribute 0, and the mean is two IEEE
    * divisions). Documents with fewer than two tokens are skipped (no
    * bigrams to score) — mirror the filter when joining back.
    *
    * Scale shape: the LM is vocabulary-bounded (topK continuations per
    * head) and broadcasts; the corpus side explodes to bigrams and
    * partial-aggregates per doc — one keyed shuffle, never all-pairs.
    */
  def scoreBigramLm(docs: DataFrame, lm: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), tokensCol(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val pairs = toks
      .select(col("doc_id"), col("t"), posexplode(col("t")).as(Seq("p", "w1")))
      .filter(col("p") < size(col("t")) - 1)
      .select(col("doc_id"), col("w1"),
        element_at(col("t"), col("p") + 2).as("w2"))
    pairs
      .join(broadcast(lm.select(col("w1"), col("w2"), col("c12"),
        col("c1"))), Seq("w1", "w2"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("c12").isNotNull, lit(1L)).otherwise(lit(0L)))
          .as("n_matched"),
        sum(coalesce(floor(col("c12").cast("double")
          / col("c1").cast("double") * lit(1e6)), lit(0L)))
          .cast("long").as("score_scaled"))
      .withColumn("score", col("score_scaled").cast("double")
        / col("n_bigrams").cast("double") / lit(1e6))
  }

  /** Feature-hashing TF vectorization (the hashing trick): every token
    * maps to `bucket = int(md5[0:8]) mod dim`, with a sign bit from the
    * next hex digit so the signed sum stays unbiased under collisions —
    * the classic fixed-dimension text vectorizer that needs NO vocabulary
    * pass, emitted in sparse long form (doc_id, bucket, tf, signed_tf).
    *
    * md5 is bit-identical in every engine, so the SAME vectors come out
    * of Spark, DuckDB, or anything else — unlike murmur-based hashingTF
    * implementations whose buckets are library-private. Shape: one
    * explode + one partial-agg shuffle keyed on (doc, bucket); no
    * vocabulary join, no driver state, output ≤ min(tokens, dim) rows
    * per doc.
    */
  def hashTf(docs: DataFrame, dim: Int = 64): DataFrame = {
    require(dim >= 1)
    docs
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
          % dim).as("bucket"),
        when(conv(substring(md5(col("tok")), 9, 1), 16, 10)
          .cast("long") < 8, 1L).otherwise(-1L).as("sign"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("tf"), sum(col("sign")).as("signed_tf"))
  }

  /** Vocabulary construction: the top-`maxVocab` tokens by corpus
    * frequency with rank and cumulative coverage — what a tokenizer
    * training run starts from and what an OOV-rate estimate reads.
    * Corpus rows reduce through ONE partial-aggregated shuffle on the
    * token; the rank/coverage windows then run over AGGREGATED
    * vocabulary-cardinality rows only (the `sales_pareto` pattern — the
    * unpartitioned window never sees corpus-sized input). Coverage is an
    * exact-integer cumsum with one final IEEE division.
    */
  def buildVocab(docs: DataFrame, maxVocab: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.orderBy(desc("freq"), asc("token"))
    docs.select(explode(tokensCol(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum", sum("freq").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum("freq").over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("rank") <= maxVocab)
      .select(col("rank"), col("token"), col("freq"),
        (col("cum").cast("double") / col("total").cast("double"))
          .as("coverage"))
  }

  /** Prefix-autocomplete index — the typeahead table a search box
    * reads: every 1..maxPrefix-char prefix of the vocabulary maps to
    * its top-k completions under the fully pinned (freq DESC, token)
    * order. Build = one vocab aggregation + a ≤ maxPrefix-way prefix
    * explode + per-prefix rank windows (each prefix bucket is bounded
    * by the vocab, and the index is built ONCE — queries are point
    * lookups on the materialized table). Exact integers throughout.
    */
  def autocompleteIndex(docs: DataFrame, maxPrefix: Int = 4,
                        topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxPrefix >= 1 && topK >= 1)
    val vocab = docs.select(explode(tokensCol(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    vocab
      // empty/whitespace-only docs tokenize to [''] whose length-0
      // token would make sequence(1, 0) infer step -1 and emit
      // phantom [1, 0] prefix rows — gate the explode
      .filter(length(col("token")) >= 1)
      .select(col("token"), col("freq"),
        explode(expr(s"sequence(1, least($maxPrefix, length(token)))"))
          .as("l"))
      .select(expr("substring(token, 1, l)").as("prefix"),
        col("token"), col("freq"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("prefix").orderBy(desc("freq"), asc("token")))
        .cast("long"))
      .filter(col("rank") <= topK)
      .select(col("prefix"), col("rank"), col("token"), col("freq"))
  }

  /** Text normalization — the canonicalization pass upstream of hashing /
    * dedup / tokenization: lowercase, strip characters outside
    * [a-z0-9 ], collapse whitespace runs, trim. Pure narrow projection of
    * codegen'd built-ins (ASCII regex classes behave identically in Java
    * and RE2/DuckDB); zero shuffles at any scale.
    */
  def normalize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      // whitespace → space BEFORE stripping symbols, so a tab between
      // tokens separates them instead of gluing them together
      trim(regexp_replace(
        regexp_replace(
          regexp_replace(lower(col("text")), "\\s", " "),
          "[^a-z0-9 ]", ""),
        " +", " ")).as("norm_text"))

  /** Linear-model scoring over hashed features — the at-scale shape of
    * "run the trained quality classifier over the corpus": features from
    * [[hashTf]], the weight vector (tiny: one row per bucket) BROADCAST,
    * one partial-aggregated rollup per doc. The corpus shuffles once on
    * (doc_id, bucket) inside hashTf and once on doc_id for the rollup —
    * the model side never shuffles, so any linear model (quality filter,
    * language scorer, topic gate) scores 100 TB at scan cost. Integer
    * weights keep the score an exact BIGINT (engine-portable; a float
    * model ships its weights the same way, scaled).
    *
    * Output: (doc_id, score_milli = Σ_buckets tf · w).
    */
  def scoreLinear(docs: DataFrame, weights: DataFrame,
                  dim: Int = 64): DataFrame =
    hashTf(docs, dim)
      .join(broadcast(weights), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("w")).as("score_milli"))

  /** Distributed linear-classifier TRAINING — closes the [[scoreLinear]]
    * loop: full-batch perceptron over [[hashTf]] features, pure integer
    * arithmetic, `rounds` fixed passes (the pageRank fixed-round recipe,
    * so an unrolled SQL oracle matches bit-for-bit and extra rounds past
    * convergence are no-ops).
    *
    * Per round: margin_d = Σ_b tf·w_b via a broadcast join against the
    * dim-row weight vector and one per-doc partial-agg rollup; docs with
    * `label · margin <= 0` (all of them at w=0, making round 1 the
    * deterministic Σ label·tf initializer) contribute `Σ label·tf` per
    * bucket — the classic batch perceptron update with learning rate 1,
    * which keeps every weight an exact BIGINT (no float order
    * sensitivity, no division at all).
    *
    * Scale shape: the corpus collapses to hashed features ONCE (cached;
    * two scan-cost passes per round — margin + update, both keyed
    * partial aggregations). The model is `dim` rows: it broadcasts out
    * and the per-round update collect is a bounded `<= dim`-row driver
    * pull (the k-means-centroid class of driver state), which also
    * truncates the per-round lineage — no checkpoints needed.
    *
    * Input: docs with a `label` column in {+1, -1}. Output: (bucket, w)
    * — feed straight back to [[scoreLinear]].
    */
  def trainPerceptron(docs: DataFrame, dim: Int = 64,
                      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && dim >= 1)
    val sp = docs.sparkSession
    import sp.implicits._
    val feats = hashTf(docs, dim)
      .join(docs.select(col("doc_id"), col("label").cast("long").as("label")),
        Seq("doc_id"))
      .select(col("doc_id"), col("bucket"), col("tf"), col("label"))
      .cache()
    feats.count()
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to rounds) {
      val wDf = (0L until dim.toLong).map(b => (b, w(b))).toDF("bucket", "w")
      val misclassified = feats
        .join(broadcast(wDf), Seq("bucket"))
        .groupBy(col("doc_id"), col("label"))
        .agg(sum(col("tf") * col("w")).as("margin"))
        .filter(col("label") * col("margin") <= 0L)
        .select(col("doc_id"))
      val updates = feats
        .join(misclassified, Seq("doc_id"), "left_semi")
        .groupBy(col("bucket"))
        .agg(sum(col("label") * col("tf")).as("delta"))
        .collect() // bounded: <= dim rows (the model, not the data)
      w = updates.foldLeft(w) { (acc, r) =>
        val b = r.getLong(0)
        acc.updated(b, acc(b) + r.getLong(1))
      }
    }
    feats.unpersist(blocking = false)
    (0L until dim.toLong).map(b => (b, w(b))).toDF("bucket", "w")
  }

  /** Importance weights for domain-targeted data selection (the DSIR
    * recipe shape: score raw documents by how target-like their hashed
    * n-gram features are, then sample by score). Per bucket the weight
    * is the add-1-smoothed target/raw frequency ratio in integer parts
    * per million — `(tgt+1)·1e6 div (raw+1)` — truncation DuckDB's `//`
    * shares, so scores are engine-exact. The true DSIR weight is the
    * log-ratio (so products become sums); with `ln` banned from oracled
    * outputs (libm drift), the scaled plain ratio is the monotone
    * stand-in: per-token mean ratio instead of the log-likelihood sum.
    *
    * Both corpora collapse to `dim` bucket totals via partial
    * aggregation before the tiny three-way bucket join — the output is
    * dim rows, broadcastable everywhere.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        dim: Int = 64): DataFrame = {
    val rawC = hashTf(raw, dim).groupBy(col("bucket"))
      .agg(sum(col("tf")).as("n_raw"))
    val tgtC = hashTf(target, dim).groupBy(col("bucket"))
      .agg(sum(col("tf")).as("n_tgt"))
    raw.sparkSession.range(dim).select(col("id").as("bucket"))
      .join(rawC, Seq("bucket"), "left")
      .join(tgtC, Seq("bucket"), "left")
      .select(col("bucket"),
        expr("(coalesce(n_tgt, 0L) + 1L) * 1000000L" +
          " div (coalesce(n_raw, 0L) + 1L)").as("w"))
  }

  /** Score documents by [[importanceWeights]]: summed per-token bucket
    * weight plus the length-normalized per-token mean (`div` — exact).
    * Same scan-cost shape as [[scoreLinear]]: the dim-row weight table
    * broadcasts, the corpus shuffles only inside hashTf and the per-doc
    * rollup. Downstream selection keeps the top importance_ppm slice
    * (or samples proportionally), completing measure → weigh → select.
    */
  def importanceScore(docs: DataFrame, weights: DataFrame,
                      dim: Int = 64): DataFrame =
    hashTf(docs, dim)
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("w")).as("importance_scaled"))
      .select(col("doc_id"), col("n_tokens"), col("importance_scaled"),
        expr("importance_scaled div n_tokens").as("importance_ppm"))

  /** Fixed-size token chunking with overlap — the splitter that turns
    * long documents into embedding/context-window-sized pieces. Chunk `i`
    * covers tokens `[i·step, i·step + chunkTokens)` with
    * `step = chunkTokens − overlap`; the final chunk is short rather than
    * padded, and every token belongs to at least one chunk.
    *
    * Scale shape: pure narrow projection + per-row explode — ZERO
    * shuffles; output volume is input·(1 + overlap/step) and the whole
    * plan is one codegen stage (`sequence`/`slice`/`array_join` are
    * built-in expressions, no UDF). This is the op that feeds
    * [[graft.ops.Similarity]]'s embedding pipeline at corpus scale, so it
    * must never cost more than the scan it wraps.
    */
  def chunk(docs: DataFrame, chunkTokens: Int = 64,
            overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlap vs $chunkTokens")
    val step = chunkTokens - overlap
    docs
      .select(col("doc_id"), tokensCol(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L),
          expr(s"(size(toks) - 1) div $step"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * step).as("chunk_start"),
        least(lit(chunkTokens.toLong),
          size(col("toks")) - col("chunk_id") * step).as("n_chunk_tokens"),
        array_join(slice(col("toks"),
          (col("chunk_id") * step + 1).cast("int"), lit(chunkTokens)),
          " ").as("chunk_text"))
  }

  /** Flesch-style readability per document — the classic ease score from
    * three integer counts: words (`[A-Za-z0-9]+` runs), sentences
    * (`[.!?]+` runs, floored at 1 so headline-only docs don't divide by
    * zero), and a syllable proxy (vowel-group runs `[aeiouy]+` over the
    * lowercased text — the standard dictionary-free estimate).
    *
    *   score = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    *
    * Engine-exact: the three counts are exact integers, each ratio is
    * one IEEE division, and the constants are double literals on both
    * sides (DuckDB gets `CAST('…' AS DOUBLE)` — a bare decimal literal
    * would parse as DECIMAL and round differently). Narrow single-pass
    * projection, codegen-friendly; regexes are RE2-safe (no `\b`, no
    * lookaround).
    */
  def readability(docs: DataFrame): DataFrame = {
    val words = greatest(lit(1L),
      size(expr("regexp_extract_all(text, '[A-Za-z0-9]+', 0)")).cast("long"))
    val sents = greatest(lit(1L),
      size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long"))
    val sylls = size(expr(
      "regexp_extract_all(lower(text), '[aeiouy]+', 0)")).cast("long")
    docs.select(col("doc_id"),
      words.as("n_words"), sents.as("n_sentences"), sylls.as("n_syllables"),
      (lit(206.835)
        - lit(1.015) * (words.cast("double") / sents.cast("double"))
        - lit(84.6) * (sylls.cast("double") / words.cast("double")))
        .as("flesch"))
  }

  /** T5-style span-corruption pair generation — the denoising-objective
    * data-gen step: ~`ratePct`% of tokens are masked, consecutive masked
    * runs collapse to ONE numbered sentinel in the input, and the targets
    * sequence lists each sentinel followed by the tokens it hid, closed
    * by a final sentinel. Mask selection is the md5-prefix hash of
    * `doc_id:pos` — deterministic per token across runs, partitionings,
    * and engines (RNG sampling would tie the corpus to task placement).
    *
    * Scale shape: posexplode → three windows and a final groupBy ALL
    * keyed on doc_id, so the whole operator is ONE doc-keyed shuffle
    * (Spark reuses the window's hash partitioning for the groupBy — the
    * twap/runs plan rule); reassembly is the array_sort(collect_list
    * (struct))+array_join recipe evaluated once per doc. collect_list
    * skips NULL pieces, which is exactly the run-collapse: masked
    * non-start tokens contribute no input piece.
    */
  def spanMask(docs: DataFrame, ratePct: Int = 15): DataFrame = {
    require(ratePct >= 1 && ratePct <= 99, "ratePct must be in [1,99]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val sentinel = (k: org.apache.spark.sql.Column) =>
      concat(lit("<extra_id_"), k.cast("string"), lit(">"))
    val pieces = docs
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .withColumn("m",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("pos").cast("string"))), 1, 8), 16, 10).cast("long")
          % 100 < ratePct)
      .withColumn("rs",
        col("m") && !coalesce(lag(col("m"), 1).over(w), lit(false)))
      .withColumn("k",
        sum(when(col("rs"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1L)
      .withColumn("inp",
        when(!col("m"), col("tok")).when(col("rs"), sentinel(col("k"))))
      .withColumn("tgt",
        when(col("rs"), concat(sentinel(col("k")), lit(" "), col("tok")))
          .when(col("m"), col("tok")))
    val joined = (c: String) => array_join(transform(array_sort(
      collect_list(when(col(c).isNotNull, struct(col("pos"), col(c))))),
      s => s.getField(c)), " ")
    pieces.groupBy("doc_id")
      .agg(joined("inp").as("input_text"), joined("tgt").as("tgt0"),
        sum(when(col("rs"), 1L).otherwise(0L)).as("n_spans"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_masked"))
      .select(col("doc_id"), col("input_text"),
        when(col("n_spans") > 0,
          concat(col("tgt0"), lit(" "), sentinel(col("n_spans"))))
          .otherwise(lit("")).as("targets"),
        col("n_spans"), col("n_masked"))
  }

  /** Code-vs-prose detection — the corpus-routing signal a code-filter
    * (or code-UPsampler) keys on. Four pure-integer structural counts
    * per document: code punctuation (`{}[]();`), code-specific keywords
    * (token-set membership over a non-alphanumeric split — NOT a `\b`
    * regex, which is Unicode-aware in Java but ASCII in RE2/DuckDB; the
    * set deliberately excludes if/for/while/return, which are ordinary
    * English and would tax prose),
    * semicolon-terminated lines, and indented lines. Combined into one
    * weighted `code_score_ppm` (integer div by char count — order-free,
    * engine-exact) with a fixed 2% decision threshold.
    *
    * Zero shuffles: a narrow per-row projection that reads only
    * (doc_id, text). The line/token lambdas are interpreted HOFs, which
    * is fine off the hot aggregate path — each runs once per row on
    * bounded arrays (the block-op recipe).
    */
  def codeDetect(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .filter(col("n_chars") > 0)
      .withColumn("n_punct", (length(col("text")) -
        length(regexp_replace(col("text"), "[{}\\[\\]();]", "")))
        .cast("long"))
      .withColumn("n_kw", expr(
        """size(filter(split(text, '[^A-Za-z0-9_]+'),
          t -> t IN ('def', 'function', 'var', 'const', 'void', 'elif',
                     'lambda', 'struct', 'enum', 'printf', 'self',
                     'typedef')))""").cast("long"))
      .withColumn("n_semi_lines", expr(
        "size(filter(split(text, chr(10)), l -> endswith(rtrim(l), ';')))")
        .cast("long"))
      .withColumn("n_indent_lines", expr(
        """size(filter(split(text, chr(10)),
          l -> startswith(l, '  ') OR startswith(l, chr(9))))""")
        .cast("long"))
      .withColumn("code_score_ppm", expr(
        """(3 * n_punct + 10 * n_kw + 4 * n_semi_lines + n_indent_lines)
           * 1000000L div n_chars"""))
      .withColumn("is_code",
        (col("code_score_ppm") >= 20000L).cast("long"))
      .drop("text")

  /** Mojibake repair table: UTF-8 bytes mis-decoded as Latin-1/cp1252
    * once — the single most common encoding corruption in web crawls
    * ("cafÃ©" for "café"). Longest sequences first so a
    * 3-byte punctuation ghost is never half-eaten by a 2-byte rule;
    * the families start on distinct lead bytes (â/Ã/Â)
    * so the chain order within a family is the only constraint.
    */
  private[graft] val mojibakePairs: Seq[(String, String)] = Seq(
    "â€™" -> "’", // right single quote
    "â€œ" -> "“", // left double quote
    "â€" -> "”", // right double quote
    "â€“" -> "–", // en dash
    "â€”" -> "—", // em dash
    "â€¦" -> "…", // ellipsis
    "Ã©" -> "é", "Ã¨" -> "è",
    "Ã¡" -> "á", "Ã³" -> "ó",
    "Ãº" -> "ú", "Ã±" -> "ñ",
    "Ã¼" -> "ü", "Ã¶" -> "ö",
    "Ã¤" -> "ä", "Ã§" -> "ç",
    "Â " -> " ") // stray NBSP ghost

  /** Mojibake detection + repair — ftfy's core fix as a plain replace
    * chain (exact in any engine; no regex, no encoding round-trip).
    * Emits a compact audit row per document: whether anything changed,
    * the repaired length, and the repaired text's md5 (so downstream
    * can re-key without carrying the text). Zero shuffles, narrow
    * projection; the replace chain is codegen'd string work per row.
    */
  def mojibakeRepair(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // plain replace() chain — no regex semantics on either engine
    val fixed = expr(mojibakePairs.foldLeft(textCol) {
      case (acc, (bad, good)) => s"replace($acc, '$bad', '$good')"
    })
    docs
      .withColumn("fixed", fixed)
      .select(col("doc_id"),
        (col(textCol) =!= col("fixed")).cast("long").as("changed"),
        length(col("fixed")).cast("long").as("n_chars_fixed"),
        md5(col("fixed")).as("fixed_md5"))
  }

  /** Chat-transcript turn parser — the SFT-ingest front door. A
    * conversation is `role: content` lines (roles system/user/
    * assistant); any line NOT starting with a role prefix is a
    * continuation of the current turn (multi-line answers, code blocks)
    * — so turn boundaries are a gaps-and-islands running sum over the
    * role-line flag, not a naive per-line split. Lines before the first
    * role line are preamble and dropped. One doc-keyed shuffle: the
    * line explode, the boundary window, and the per-turn reassembly all
    * share the doc_id partitioning.
    *
    * Output: one row per (doc_id, turn_idx) with the role and the exact
    * reassembled content length (pieces rejoined with the newline that
    * split them).
    */
  def parseChatTurns(convs: DataFrame, idCol: String = "doc_id",
      textCol: String = "conv"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    convs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("role",
        when(col("line").startsWith("system: "), "system")
          .when(col("line").startsWith("user: "), "user")
          .when(col("line").startsWith("assistant: "), "assistant"))
      .withColumn("piece",
        when(col("role") === "system", expr("substring(line, 9)"))
          .when(col("role") === "user", expr("substring(line, 7)"))
          .when(col("role") === "assistant", expr("substring(line, 12)"))
          .otherwise(col("line")))
      .withColumn("turn_idx",
        sum(when(col("role").isNotNull, 1L).otherwise(0L)).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("turn_idx") > 0L)
      .groupBy(col("doc_id"), col("turn_idx"))
      .agg(
        max(col("role")).as("role"), // exactly one role line per turn
        length(expr("""array_join(transform(
          array_sort(collect_list(struct(pos, piece))), s -> s.piece),
          chr(10))""")).cast("long").as("n_chars"))
  }

  /** SFT-transcript quality gate over [[parseChatTurns]] output — the
    * structural lint an instruction-tuning pipeline runs before a
    * transcript may enter training: strict user/assistant alternation
    * (a leading system turn allowed), the dialogue must END on an
    * assistant turn, and no assistant turn may be trivially short.
    * Violations are COUNTED per transcript (not just flagged) so the
    * report ranks fix-worthiness; `keep` is the conjunction gate.
    *
    * Scale shape: one doc-keyed window (lag over turn_idx) for
    * adjacency + one doc-keyed rollup — both ride a single shuffle on
    * doc_id. Input: `(doc_id, turn_idx, role, n_chars)`.
    */
  def sftQuality(turns: DataFrame, minAssistantChars: Long = 10L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("turn_idx")
    turns
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .withColumn("is_last",
        col("turn_idx") === max(col("turn_idx")).over(
          Window.partitionBy("doc_id")))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L))
          .as("n_assistant"),
        // same non-system role twice in a row = alternation violation;
        // a system turn anywhere past turn 1 is also a violation
        sum(when(col("role") =!= "system" &&
          col("prev_role") === col("role"), 1L).otherwise(0L))
          .as("n_alternation_violations"),
        sum(when(col("role") === "system" && col("turn_idx") > 1L, 1L)
          .otherwise(0L)).as("n_misplaced_system"),
        max(when(col("is_last"), col("role"))).as("last_role"),
        min(when(col("role") === "assistant", col("n_chars")))
          .as("min_assistant_chars"))
      .withColumn("keep",
        col("n_alternation_violations") === 0L &&
          col("n_misplaced_system") === 0L &&
          col("last_role") === "assistant" &&
          col("n_assistant") >= 1L &&
          coalesce(col("min_assistant_chars"), lit(0L))
            >= minAssistantChars)
  }

  /** Heaps-law vocabulary growth: cumulative distinct token types vs
    * cumulative token count as the corpus is consumed in doc_id order,
    * one row per `bucketWidth`-doc checkpoint. The naive "count distinct
    * over a growing prefix" is shuffle-hostile (one distinct per
    * checkpoint); the equivalent first-occurrence formulation is two
    * keyed aggregations — a type is NEW exactly at the bucket of its
    * minimum doc_id (div is monotone, so min(doc) determines the
    * bucket) — and the only ordered window runs over the BOUNDED
    * checkpoint frame, never the token stream.
    */
  /** Sentence segmentation: split on terminal punctuation `[.!?]`
    * followed by whitespace, via marker insertion — a capture-group
    * replace plants a sentinel, then a literal split. Lookbehind is
    * unavailable in RE2-class engines, so the marker form is the one
    * that stays portable (and `\\s` is ASCII in both engines; `\\b`
    * would not be). Zero shuffles — a narrow projection + generator.
    * Blank segments are dropped but keep their position numbering.
    * Output: `(doc_id, sent_idx, sentence, n_chars)`.
    */
  def sentences(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(split(
        regexp_replace(col("text"), "([.!?])\\s+", "$1\u0001"),
        "\u0001")).as(Seq("pos", "sentence")))
      .filter(length(trim(col("sentence"))) > 0)
      .select(col("doc_id"), col("pos").cast("long").as("sent_idx"),
        col("sentence"), length(col("sentence")).cast("long").as("n_chars"))

  /** Extractive summarization — the compression step an LLM-data
    * pipeline runs to distill long documents (and the cheap baseline
    * every learned summarizer is graded against): rank each document's
    * sentences by the summed inverse-document-frequency weight of
    * their DISTINCT tokens (`10⁶·N div df` — the log-free idf twin,
    * the PMI-ratio recipe), keep the top `topK` with deterministic
    * ties (score desc, earlier sentence wins). Rare-term-dense
    * sentences carry the document's specific content; boilerplate
    * scores low because its tokens are everywhere.
    *
    * Scale shape: sentences and tokens are narrow explodes; df is ONE
    * vocabulary-sized partial agg joined back token-keyed (never
    * broadcast — vocab grows with the corpus); the rank window
    * partitions per doc over per-doc-bounded sentence counts. N is a
    * one-scalar driver pull (the skipgramStats precedent).
    */
  def extractiveSummary(docs: DataFrame, topK: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1)
    val sent = sentences(docs)
    val tok = sent.select(col("doc_id"), col("sent_idx"),
        explode(array_distinct(tokensCol(lower(col("sentence")))))
          .as("token"))
      .filter(length(col("token")) > 0)
    val dfTab = docs.select(col("doc_id"),
        explode(array_distinct(tokensCol(lower(col("text"))))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = docs.count() // bounded: one scalar
    val scored = tok.join(dfTab, "token")
      .groupBy(col("doc_id"), col("sent_idx"))
      .agg(sum(expr(s"1000000L * ${nDocs}L div df")).as("score"),
        count(lit(1)).as("n_terms"))
    sent
      .join(scored, Seq("doc_id", "sent_idx"), "left")
      .withColumn("score", coalesce(col("score"), lit(0L)))
      .withColumn("n_terms", coalesce(col("n_terms"), lit(0L)))
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(desc("score"), asc("sent_idx"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("sent_idx"),
        col("n_terms"), col("score"), col("n_chars"))
  }

  /** Skip-gram co-occurrence association (the word2vec/PMI statistic):
    * for ordered token pairs within `window` positions, the ratio
    * `n_pair·N·10⁶ div (n_a·n_b)` — a monotone exact-integer twin of
    * PMI (its log, divided by 1e6) kept log-free for engine parity
    * (`ln` is the one libm call with last-ulp drift between engines).
    * Support floors (`minPair`, `minTok`) drop the hapax pairs whose
    * ratio is maximal but meaningless. Longs hold the product up to
    * N ≈ 3·10⁹ tokens; beyond that, lift to decimal(38,0).
    *
    * Scale shape: pair generation is `window` self-EQUI-joins of the
    * position table on `(doc_id, pos + k)` — linear in corpus size,
    * never the per-doc position cross product — and both count sides
    * partial-aggregate before their joins. N is a 1-row driver pull.
    * The final global top-k is a TakeOrdered, not a sort.
    */
  def skipgramStats(docs: DataFrame, window: Int = 2, topK: Int = 40,
                    minPair: Long = 3L, minTok: Long = 5L): DataFrame = {
    require(window >= 1)
    val tok = docs
      .select(col("doc_id"),
        posexplode(tokensCol(lower(col("text")))).as(Seq("pos", "token")))
      .filter(length(col("token")) > 0)
    val nTotal = tok.count()
    val uni = tok.groupBy(col("token")).agg(count(lit(1)).as("n_tok"))
    val pairs = (1 to window).map { k =>
      tok.as("a").join(tok.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") === col("a.pos") + k)
        .select(col("a.token").as("tok_a"), col("b.token").as("tok_b"))
    }.reduce(_ unionByName _)
    pairs.groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPair)
      .join(uni.select(col("token").as("tok_a"), col("n_tok").as("n_a")),
        Seq("tok_a"))
      .join(uni.select(col("token").as("tok_b"), col("n_tok").as("n_b")),
        Seq("tok_b"))
      .filter(col("n_a") >= minTok && col("n_b") >= minTok)
      .withColumn("ratio_ppm",
        expr(s"n_pair * ${nTotal}L * 1000000L div (n_a * n_b)"))
      .select(col("tok_a"), col("tok_b"), col("n_pair"), col("n_a"),
        col("n_b"), col("ratio_ppm"))
      .orderBy(desc("ratio_ppm"), asc("tok_a"), asc("tok_b"))
      .limit(topK)
  }

  /** TextRank corpus keywords (Mihalcea & Tarau): PageRank over the
    * word co-occurrence graph — two words are linked when they appear
    * within `window` positions in any document — surfaces the terms
    * most central to the corpus's phrase structure, which frequency
    * rankings ([[buildVocab]]) and tf-idf ([[topTerms]]) both miss
    * (a term can be rare yet sit on every high-traffic phrase path).
    *
    * Entirely compositional: pair generation is [[skipgramStats]]'s
    * per-offset equi-join chain (never a positional range join), the
    * graph walk is [[Graph.pageRank]]'s fixed-point BIGINT arithmetic
    * verbatim (rounds chain lazily — linear lineage), so the oracle is
    * the same unrolled-CTE recipe over the SQL-derived edge list. The
    * token self-join runs over corpus positions (one doc_id-keyed
    * shuffle reused across offsets); everything after the edge DISTINCT
    * is vocabulary-sized — Heaps-sublinear in the corpus — and the
    * final top-k is a TakeOrdered (the [[skipgramStats]] close), with
    * rank numbers minted over the k survivors only.
    */
  def textRank(docs: DataFrame, window: Int = 2, iters: Int = 3,
               topK: Int = 20): DataFrame = {
    require(window >= 1)
    val tok = docs
      .select(col("doc_id"),
        posexplode(tokensCol(lower(col("text")))).as(Seq("pos", "token")))
      .filter(length(col("token")) > 0)
    val co = (1 to window).map { k =>
      tok.as("a").join(tok.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") === col("a.pos") + k)
        .select(col("a.token").as("src"), col("b.token").as("dst"))
    }.reduce(_ unionByName _)
      .filter(col("src") =!= col("dst"))
    val edges = co
      .unionByName(co.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    // global top-k as a TakeOrdered (per-partition heads + one k-row
    // merge), NEVER a vocab-wide rank window — at 100x the vocabulary
    // that window funnels every term into one reducer for a top-20.
    // The rank number is then minted over the k survivors only.
    Graph.pageRank(edges, iters)
      .orderBy(desc("rank_scaled"), asc("id"))
      .limit(topK)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("rank_scaled"), asc("id"))).cast("long"))
      .select(col("rk"), col("id").as("term"), col("rank_scaled"))
  }

  def heapsGrowth(docs: DataFrame, bucketWidth: Long = 10L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tok = docs
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
    val perBucket = tok
      .groupBy(expr(s"doc_id div ${bucketWidth}L").as("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
    val newTypes = tok
      .groupBy(col("token")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(expr(s"first_doc div ${bucketWidth}L").as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    perBucket.join(newTypes, Seq("bucket"), "left")
      .na.fill(0L, Seq("new_types"))
      .select(col("bucket"), col("n_tokens"), col("new_types"),
        sum(col("n_tokens")).over(w).as("cum_tokens"),
        sum(col("new_types")).over(w).as("cum_types"))
  }

  /** Zipf rank-frequency profile + log-log slope — the companion
    * diagnostic to [[heapsGrowth]]: a natural corpus follows
    * freq ∝ rank^(-s) with s ≈ 1; a strongly non-Zipfian profile flags
    * synthetic, templated, or truncated text. One corpus scan builds the
    * vocabulary frequency table (token-keyed partial agg); ranking and
    * everything after run over the VOCABULARY, which is Heaps-sublinear
    * in corpus size, so the single rank window is vocab-bounded (the
    * [[buildVocab]] shape), not corpus-bounded.
    *
    * Engine-exact log-log regression without logs: both axes quantize to
    * their integer log2 via portable bit-length
    * (`length(ltrim(bin(x), '0'))` — identical unpadded form in Spark
    * and DuckDB), and the least-squares slope over the per-term
    * (log2 rank, log2 freq) points folds from four order-free integer
    * sums; only the final slope division runs in double (one IEEE
    * divide; integer `div` would hit the truncate-vs-floor divergence on
    * the negative numerator). Output: one row per log2-rank bucket
    * (n_terms, sum_freq, max_freq, min_freq) with the corpus-level
    * slope repeated — the whole card is ~log2(vocab) rows.
    */
  def zipfProfile(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def log2i(c: Column): Column =
      length(ltrim(bin(c), "0")).cast("long")
    val ranked = docs
      .select(explode(tokensCol(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("freq"), asc("token")))
          .cast("long"))
      .select(log2i(col("rank")).as("lr"), log2i(col("freq")).as("lf"),
        col("freq"))
    val slope = ranked.agg(
      count(lit(1)).as("nt"), sum(col("lr")).as("sx"),
      sum(col("lf")).as("sy"), sum(col("lr") * col("lf")).as("sxy"),
      sum(col("lr") * col("lr")).as("sxx"))
      .select(((col("nt") * col("sxy") - col("sx") * col("sy"))
        .cast("double") /
        (col("nt") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("zipf_slope"))
    ranked
      .groupBy(col("lr").as("rank_bucket"))
      .agg(count(lit(1)).as("n_terms"), sum(col("freq")).as("sum_freq"),
        max(col("freq")).as("max_freq"), min(col("freq")).as("min_freq"))
      .crossJoin(broadcast(slope))
  }

  /** Positional phrase search — exact n-gram lookup over a positional
    * inverted index (the retrieval primitive tf-idf/BM25 bag-of-words
    * scoring cannot express): documents containing the query tokens at
    * CONSECUTIVE positions, with occurrence counts. Tokenization is the
    * corpus-standard lowercase whitespace split, positions 1-indexed.
    *
    * Scale shape: the posting stream is filtered to the query's own
    * tokens BEFORE any shuffle (for a k-term phrase the selectivity is
    * that of its rarest term), then checkpointed ONCE — each additional
    * phrase term is an equi-join on (doc, aligned position) against that
    * bounded slice, never a re-tokenization of the corpus (the
    * reuses-exchanges rule: k references otherwise re-derive the
    * explode k times). Adjacency is position arithmetic on the join key
    * — no windows, no per-doc state.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
                   textCol: String = "text"): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two tokens")
    val pos = docs
      .select(col("doc_id"),
        posexplode(split(trim(lower(col(textCol))), "\\s+"))
          .as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("tok"))
      .filter(col("tok").isin(phrase.distinct: _*))
      .localCheckpoint()
    val base = pos.filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.tail.zipWithIndex.foldLeft(base) { case (acc, (w, i)) =>
      acc.join(pos.filter(col("tok") === w)
        .select(col("doc_id"), (col("pos") - (i + 1)).as("pos")),
        Seq("doc_id", "pos"))
    }
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matches"))
      .orderBy("doc_id")
  }

  /** Retrieval-quality card: precision/recall@k and MRR of [[bm25TopK]]
    * against an ALL-TERMS-PRESENT gold set (a document is relevant to a
    * query iff every query term occurs in it — the strictest lexical
    * relevance, itself exactly computable). Everything is integer ppm:
    * MRR's reciprocal is the floor-quantized `1e6 div first_gold_rank`
    * (0 when no gold doc is retrieved), so the whole eval —
    * ranking INCLUDED — is hash-oracled, not approximately checked.
    *
    * Scale shape: the gold set reuses the bm25 skeleton (broadcast
    * query-term filter directly under the posting explode — only
    * matching postings shuffle), relevance is one (query, doc) partial
    * agg checked against the per-query term count, and the metric close
    * joins k·|Q| predicted rows against the gold set keyed on
    * (query, doc).
    */
  def retrievalEval(docs: DataFrame, queries: DataFrame,
                    k: Int = 5): DataFrame = {
    val qTerms = queries
      .select(col("query_id"), explode(tokensCol(col("query_text")))
        .as("token"))
      .distinct()
    val nTerms = qTerms.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_q_terms"))
    val gold = docs
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("token"))
      .distinct()
      .join(broadcast(qTerms), Seq("token"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matched"))
      .join(broadcast(nTerms), Seq("query_id"))
      .filter(col("n_matched") === col("n_q_terms"))
      .select(col("query_id"), col("doc_id"))
      .localCheckpoint() // feeds the per-query total AND the hit join
    val pred = bm25TopK(docs, queries, k)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val hits = pred.join(gold, Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("rank")).as("first_rank"))
    gold.groupBy(col("query_id")).agg(count(lit(1)).as("n_gold"))
      .join(hits, Seq("query_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("precision_ppm", expr(s"1000000L * n_hits div ${k}L"))
      .withColumn("recall_ppm", expr("1000000L * n_hits div n_gold"))
      .withColumn("mrr_ppm", expr(
        "CASE WHEN first_rank IS NULL THEN 0L" +
          " ELSE 1000000L div first_rank END"))
      .select(col("query_id"), col("n_gold"), col("n_hits"),
        col("precision_ppm"), col("recall_ppm"), col("mrr_ppm"))
      .orderBy("query_id")
  }

  /** NDCG@k over the same BM25-vs-gold framing as [[retrievalEval]] —
    * the position-weighted retrieval metric (precision@k treats rank 1
    * and rank k alike; NDCG pays log-discounted credit per position).
    * The log2 discount table is folded at BUILD time into ppm integer
    * literals (`w_i = floor(10⁶/log2(i+1))`, i = 1..k) shared verbatim
    * with the DuckDB twin, so both the DCG sum (Σ over hit ranks of
    * w_i) and the ideal DCG (prefix sums of the same table, cut at
    * min(n_gold, k)) are order-free BIGINT sums — no runtime log
    * anywhere. `ndcg_ppm = 10⁶·DCG div IDCG` exact.
    */
  def ndcgCard(docs: DataFrame, queries: DataFrame,
               k: Int = 5): DataFrame = {
    val wPpm: Seq[Long] = (1 to k).map(i =>
      math.floor(1e6 / (math.log(i + 1) / math.log(2))).toLong)
    val cumW: Seq[Long] = wPpm.scanLeft(0L)(_ + _).tail
    val qTerms = queries
      .select(col("query_id"), explode(tokensCol(col("query_text")))
        .as("token"))
      .distinct()
    val nTerms = qTerms.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_q_terms"))
    val gold = docs
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("token"))
      .distinct()
      .join(broadcast(qTerms), Seq("token"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matched"))
      .join(broadcast(nTerms), Seq("query_id"))
      .filter(col("n_matched") === col("n_q_terms"))
      .select(col("query_id"), col("doc_id"))
      .localCheckpoint() // feeds the per-query total AND the hit join
    val pred = bm25TopK(docs, queries, k)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val dcg = pred.join(gold, Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(sum(element_at(
        array(wPpm.map(lit): _*), col("rank").cast("int")))
        .as("dcg_ppm"))
    gold.groupBy(col("query_id")).agg(count(lit(1)).as("n_gold"))
      .join(dcg, Seq("query_id"), "left")
      .withColumn("dcg_ppm", coalesce(col("dcg_ppm"), lit(0L)))
      .withColumn("idcg_ppm", element_at(
        array(cumW.map(lit): _*),
        least(col("n_gold"), lit(k.toLong)).cast("int")))
      .withColumn("ndcg_ppm",
        expr("1000000L * dcg_ppm div idcg_ppm"))
      .select(col("query_id"), col("n_gold"), col("dcg_ppm"),
        col("idcg_ppm"), col("ndcg_ppm"))
      .orderBy("query_id")
  }

  /** Persisted inverted index — the [[Similarity]] IVF pattern applied
    * to text retrieval: postings (token, doc_id, tf, df) written
    * PARTITIONED BY an md5 token bucket, plus doc lengths and the
    * one-row corpus totals. Build once (the df window is the one heavy
    * pass — index time, not query time); every query after reads ONLY
    * the partitions its terms hash to.
    */
  def writeSearchIndex(docs: DataFrame, dir: String,
                       buckets: Int = 16): Unit = {
    require(buckets >= 1)
    val w = org.apache.spark.sql.expressions.Window
    val lens = docs.select(col("doc_id"),
      size(tokensCol(col("text"))).cast("long").as("dl"))
    docs.select(col("doc_id"), explode(tokensCol(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(w.partitionBy("token")))
      .withColumn("bucket", expr(
        s"CAST(conv(substring(md5(token), 1, 8), 16, 10) AS BIGINT)" +
          s" % $buckets"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings")
    lens.write.mode("overwrite").parquet(s"$dir/docs")
    lens.agg(sum(col("dl")).as("corpus_len"), count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$dir/totals")
  }

  /** BM25 top-k over a [[writeSearchIndex]] index — identical scores to
    * [[bm25TopK]] (df is a property of the token, not of the query
    * filter, so the index-time df equals the on-the-fly one), but the
    * corpus is NEVER re-read: the bounded query vocabulary collapses to
    * literal bucket/token filters, so the postings scan is
    * partition-pruned to the terms' buckets (PartitionFilters — the
    * ann_ivf contract, spec-asserted) and row-filtered inside them.
    * The close is [[topKDocs]]'s two-level top-k.
    */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession,
                      dir: String, queries: DataFrame, k: Int = 5,
                      buckets: Int = 16): DataFrame = {
    val qTerms = queries
      .select(col("query_id"),
        explode(tokensCol(col("query_text"))).as("token"))
      .distinct().localCheckpoint()
    // bounded: the query vocabulary — it becomes pruning literals
    val toks = qTerms.select(col("token")).distinct()
      .collect().map(_.getString(0)).toSeq
    val bks = toks.map { t =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16) % buckets
    }.distinct
    val postings = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(bks: _*) && col("token").isin(toks: _*))
    val lens = spark.read.parquet(s"$dir/docs")
    val totals = spark.read.parquet(s"$dir/totals")
    val scored = postings.join(broadcast(qTerms), Seq("token"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .withColumn("term_score", expr(
        """((1000000 div df) * 2200 * corpus_len * tf)
           div (10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs)"""))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score"), count(lit(1)).as("n_terms"))
    topKDocs(scored, k)
  }

  /** Append a document batch to an INCREMENTAL inverted index — the
    * LSM-segment answer to "the index bakes df into every posting row,
    * so new docs invalidate the whole layout" ([[writeSearchIndex]]'s
    * one weakness; the ivfAppend lesson applied to text). Everything is
    * APPEND-ONLY because every statistic BM25 needs is additive over
    * disjoint batches: postings carry only (token, doc_id, tf) in the
    * same md5-bucket partitioning, per-batch token df segments sum to
    * the true df, per-batch (corpus_len, n_docs) rows sum to the true
    * totals. Daily ingest costs O(batch) at ANY index size — nothing
    * already written is ever read, moved, or rewritten.
    *
    * Caller contract: batches are doc-disjoint (dedup/delta upstream —
    * [[graft.sources.Shards.delta]] is the seam).
    */
  def appendSearchIndex(docs: DataFrame, dir: String,
                        buckets: Int = 16): Unit = {
    require(buckets >= 1)
    val lens = docs.select(col("doc_id"),
      size(tokensCol(col("text"))).cast("long").as("dl"))
    val tf = docs
      .select(col("doc_id"), explode(tokensCol(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds postings AND the df segment
    tf.withColumn("bucket", expr(
        s"CAST(conv(substring(md5(token), 1, 8), 16, 10) AS BIGINT)" +
          s" % $buckets"))
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$dir/postings")
    tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .write.mode("append").parquet(s"$dir/tokenstats")
    lens.write.mode("append").parquet(s"$dir/docs")
    lens.agg(sum(col("dl")).as("corpus_len"), count(lit(1)).as("n_docs"))
      .write.mode("append").parquet(s"$dir/totals")
  }

  /** BM25 top-k over an [[appendSearchIndex]] index — score-identical
    * to [[bm25TopK]]/[[bm25TopKIndexed]]: df sums the query terms' rows
    * across segment parts (query-vocabulary-sized, broadcast), totals
    * sum the per-batch rows (one row per batch), and the postings scan
    * is partition-pruned to the terms' buckets exactly like the baked
    * layout — appending never degraded the read path.
    */
  def bm25TopKIndexedInc(spark: org.apache.spark.sql.SparkSession,
                         dir: String, queries: DataFrame, k: Int = 5,
                         buckets: Int = 16): DataFrame = {
    val qTerms = queries
      .select(col("query_id"),
        explode(tokensCol(col("query_text"))).as("token"))
      .distinct().localCheckpoint()
    // bounded: the query vocabulary — it becomes pruning literals
    val toks = qTerms.select(col("token")).distinct()
      .collect().map(_.getString(0)).toSeq
    val bks = toks.map { t =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16) % buckets
    }.distinct
    val postings = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(bks: _*) && col("token").isin(toks: _*))
    val stats = spark.read.parquet(s"$dir/tokenstats")
      .filter(col("token").isin(toks: _*))
      .groupBy(col("token")).agg(sum(col("df")).as("df"))
    val lens = spark.read.parquet(s"$dir/docs")
    val totals = spark.read.parquet(s"$dir/totals")
      .agg(sum(col("corpus_len")).as("corpus_len"),
        sum(col("n_docs")).as("n_docs"))
    val scored = postings.join(broadcast(qTerms), Seq("token"))
      .join(broadcast(stats), Seq("token"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .withColumn("term_score", expr(
        """((1000000 div df) * 2200 * corpus_len * tf)
           div (10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs)"""))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score"), count(lit(1)).as("n_terms"))
    topKDocs(scored, k)
  }

  /** Gazetteer / dictionary phrase tagger — the multi-pattern matcher a
    * curation pipeline runs for blocklist phrases, PII term lists, and
    * taxonomy tagging (the Aho–Corasick job, done relationally): every
    * occurrence of every dictionary phrase (multi-word, overlapping
    * occurrences included) is counted per phrase, with per-phrase doc
    * reach. Zero-hit phrases stay in the report (a blocklist audit that
    * silently drops unmatched terms is how terms rot).
    *
    * Scale shape: the corpus tokenizes ONCE; the posting explode joins
    * the BROADCAST first-token index (dictionary is bounded by
    * construction), so only first-token hits survive; each candidate is
    * then verified with one codegen'd array-slice compare against the
    * doc's own token array carried alongside the explode — the
    * jaccard_prefix rule: never re-join the posting stream per
    * candidate. Aggregation is (phrase)-keyed, output = |dictionary|.
    */
  def gazetteerMatch(docs: DataFrame, phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.trim.nonEmpty))
    val spark = docs.sparkSession
    import spark.implicits._
    val dict = phrases.map { p =>
      val t = p.trim.toLowerCase.split("\\s+").toSeq
      (p, t.head, t, t.size.toLong)
    }.toDF("phrase", "first_tok", "ptoks", "plen")
    val posting = docs
      .select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
    val hits = posting
      .join(broadcast(dict), col("tok") === col("first_tok"))
      .filter(col("pos") + col("plen") <= size(col("toks")) &&
        slice(col("toks"), col("pos") + lit(1), col("plen")) ===
          col("ptoks"))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_matches"),
        countDistinct(col("doc_id")).as("n_docs"))
    dict.select(col("phrase"), col("plen"))
      .join(hits, Seq("phrase"), "left")
      .select(col("phrase"), col("plen"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy("phrase")
  }
}
