package graft.ops

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox naps under the old tree"),
    (2L, "spark shuffles partitions 42 times; always!")
  ).toDF("doc_id", "text")

  test("kneserNey matches hand-computed discounted + continuation mass") {
    // corpus "a b a c": bigrams (a,b):1 (b,a):1 (a,c):1 -> T=3
    // c1(a)=2 n1l(a)=2; n1r(a)=n1r(b)=n1r(c)=1
    // P(b|a) = max(4*1-3,0)*3 + 3*2*1 = 9 over 4*2*3 = 24
    val d = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val rows = TextAnalysis.kneserNey(d, topK = 5).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        (r.getAs[Long]("p_num"), r.getAs[Long]("p_den"))).toMap
    assert(rows(("a", "b")) == (9L, 24L))
    assert(rows(("a", "c")) == (9L, 24L))
    // P(a|b) = max(4-3,0)*3 + 3*1*1 = 6 over 4*1*3 = 12
    assert(rows(("b", "a")) == (6L, 12L))
    // discounted mass within a context stays below 1; the discount
    // bought mass for unseen continuations
    assert(9.0 / 24 + 9.0 / 24 < 1.0)
  }

  test("spanMask collapses masked runs to numbered sentinels with a closing target sentinel") {
    def masked(doc: Long, pos: Int, rate: Int): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$doc:$pos".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100 < rate
    }
    // rate=50 so the tiny doc reliably gets at least one masked run
    val rate = 50
    val d = Seq((7L, "a b c d e f g h")).toDF("doc_id", "text")
    val r = TextAnalysis.spanMask(d, ratePct = rate).collect().head
    val toks = "a b c d e f g h".split(" ")
    val flags = toks.indices.map(i => masked(7L, i, rate))
    // reference simulation of the collapse
    var k = -1
    val inp = new StringBuilder; val tgt = new StringBuilder
    toks.indices.foreach { i =>
      val rs = flags(i) && (i == 0 || !flags(i - 1))
      if (rs) { k += 1
        if (inp.nonEmpty) inp += ' '
        inp ++= s"<extra_id_$k>"
        if (tgt.nonEmpty) tgt += ' '
        tgt ++= s"<extra_id_$k> ${toks(i)}"
      } else if (flags(i)) { tgt += ' '; tgt ++= toks(i) }
      else { if (inp.nonEmpty) inp += ' '; inp ++= toks(i) }
    }
    val nSpans = k + 1
    assert(nSpans > 0, "fixture must mask at least one run")
    assert(r.getAs[String]("input_text") == inp.toString)
    assert(r.getAs[String]("targets") ==
      s"${tgt.toString} <extra_id_$nSpans>")
    assert(r.getAs[Long]("n_spans") == nSpans)
    assert(r.getAs[Long]("n_masked") == flags.count(identity))
    // an unmasked doc round-trips verbatim with empty targets
    val quiet = Seq((3L, "alpha beta")).toDF("doc_id", "text")
    val allFlags = (0 to 1).map(i => masked(3L, i, 1))
    if (!allFlags.exists(identity)) {
      val q = TextAnalysis.spanMask(quiet, ratePct = 1).collect().head
      assert(q.getAs[String]("input_text") == "alpha beta")
      assert(q.getAs[String]("targets") == "")
      assert(q.getAs[Long]("n_spans") == 0L)
    }
  }

  test("ngramFreq counts document frequency of bigrams with set semantics") {
    val rows = TextAnalysis.ngramFreq(docs, n = 2, topK = 100).collect()
    val byGram = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGram("the quick") == 2L)
    assert(byGram("quick brown") == 2L)
    // "the" appears twice in doc 0 but bigram df is per-document
    assert(byGram.get("over the").contains(1L))
    assert(rows.map(_.getLong(1)).toSeq == rows.map(_.getLong(1)).sorted.reverse.toSeq)
  }

  test("ngramNovelty: unseen test bigrams counted exactly") {
    import spark.implicits._
    // train (even id): "a b c" -> {a b, b c}; test (odd id):
    // "a b x y" -> {a b, b x, x y} -> 2 of 3 novel
    val df = Seq((0L, "a b c"), (1L, "a b x y")).toDF("doc_id", "text")
    val r = TextAnalysis.ngramNovelty(df,
      org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
      .collect().head
    assert(r.getAs[Long]("n_train_grams") == 2L)
    assert(r.getAs[Long]("n_test_grams") == 3L)
    assert(r.getAs[Long]("n_novel") == 2L)
    assert(r.getAs[Long]("novelty_ppm") == 666666L)
  }

  test("winnowFingerprints: identical docs share all, near docs share some") {
    val trio = Seq(
      (0L, "a b c d e f g h i j k l m n o p"),
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g zz i j k l m n o p"),
      (3L, "z y x w v u t s r q p o n m l k")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(trio).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // the winnowing GUARANTEE is only about shared runs >= w+k-1 tokens;
    // whether a specific edit changes a SELECTED fingerprint depends on
    // the hash values, so the edit here sits mid-document (verified to
    // perturb a window minimum under the md5-prefix hash family)
    assert(fps(0L) == fps(1L), "identical docs must share all fingerprints")
    assert((fps(0L) & fps(2L)).nonEmpty, "one-token edit must share fingerprints")
    assert(fps(0L) != fps(2L), "edit must change at least one fingerprint")
    assert((fps(0L) & fps(3L)).isEmpty, "no shared 3-gram run, no shared fingerprint")
  }

  test("buildVocab ranks by frequency with exact cumulative coverage") {
    val d = Seq((0L, "b b b a a c"), (1L, "a d")).toDF("doc_id", "text")
    val out = TextAnalysis.buildVocab(d, 3).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // freqs: a=3, b=3, c=1, d=1 → ties break by token asc
    assert(out.toSeq == Seq(
      (1L, "a", 3L, 3.0 / 8), (2L, "b", 3L, 6.0 / 8), (3L, "c", 1L, 7.0 / 8)))
  }

  test("normalize lowercases, strips symbols, collapses whitespace") {
    val d = Seq((0L, "  Hello,  WORLD!\t42 ")).toDF("doc_id", "text")
    val out = TextAnalysis.normalize(d).collect()
    assert(out(0).getString(1) == "hello world 42")
  }

  test("scoreLinear sums tf x weight exactly over hashed buckets") {
    import org.apache.spark.sql.functions.{col, lit}
    val d = Seq((0L, "a b c d e"), (1L, "a a a")).toDF("doc_id", "text")
    // all-ones model: the score is exactly the token count, regardless of
    // which bucket each token hashes into
    val ones = spark.range(64).select(col("id").as("bucket"), lit(1L).as("w"))
    val out = TextAnalysis.scoreLinear(d, ones).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 5L), (1L, 3L)))
  }

  test("keyphrases extracts stopword-delimited runs and ranks by deg/freq") {
    import org.apache.spark.sql.functions.col
    // "deep learning" appears twice (multi-word, high degree); "model"
    // appears alone; stopwords split the candidates
    val d = Seq((1L,
      "deep learning is the model of deep learning and model"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.keyphrases(d, topK = 5).orderBy("rank").collect()
      .map(x => (x.getAs[Long]("rank"), x.getAs[String]("phrase"),
        x.getAs[Long]("score_scaled"), x.getAs[Long]("n_occurrences")))
    // words: deep freq 2 deg 4 (two phrases of len 2) -> 2e6
    //        learning freq 2 deg 4 -> 2e6; model freq 2 deg 2 -> 1e6
    // phrase "deep learning" = 4e6 (x2 occurrences), "model" = 1e6
    assert(r(0) == (1L, "deep learning", 4000000L, 2L))
    assert(r(1) == (2L, "model", 1000000L, 2L))
    assert(r.length == 2)
  }

  test("rrfFuse merges rankings by reciprocal rank with exact ties") {
    // doc 10 is rank 1 lexically and rank 2 semantically; doc 20 the
    // reverse -> identical fused scores, tie broken by doc_id
    val lex = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val sem = Seq((1L, 20L, 1L), (1L, 10L, 2L), (1L, 40L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val out = TextAnalysis.rrfFuse(Seq(lex, sem), kRrf = 60, topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rrf_scaled"), r.getAs[Long]("n_lists")))
    val c1 = 1000000000L / 61
    val c2 = 1000000000L / 62
    val c3 = 1000000000L / 63
    assert(out(0) == (1L, 10L, c1 + c2, 2L)) // tie -> lower doc_id first
    assert(out(1) == (2L, 20L, c1 + c2, 2L))
    // single-list docs rank below the consensus docs
    assert(out(2) == (3L, 30L, c3, 1L) && out(3) == (4L, 40L, c3, 1L))
  }

  test("importanceWeights ranks target-domain tokens above raw-common ones") {
    import org.apache.spark.sql.functions.col
    // raw corpus: 'common' everywhere, 'rare' only in the target docs
    val raw = Seq((0L, "common common common"), (1L, "common common"),
      (2L, "rare common"), (3L, "rare rare")).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") >= 2L)
    val w = TextAnalysis.importanceWeights(raw, target)
    assert(w.count() == 64L) // every bucket present, absent ones smoothed
    val scored = TextAnalysis.importanceScore(raw, w)
      .orderBy("doc_id").collect()
    // 'common': raw 6, tgt 1 -> w = 2e6/7 = 285714
    // 'rare':   raw 3, tgt 3 -> w = 4e6/4 = 1000000
    val byDoc = scored.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_tokens"), r.getAs[Long]("importance_ppm"))).toSeq
    assert(byDoc(0) == (0L, 3L, 285714L))           // pure raw-common
    assert(byDoc(3) == (3L, 2L, 1000000L))          // pure target-like
    // mixed doc lands strictly between
    assert(byDoc(2)._3 > byDoc(0)._3 && byDoc(2)._3 < byDoc(3)._3)
    // untouched buckets get the 1/1 smoothed weight, not 0 or null
    val untouched = w.filter(col("w") === 1000000L).count()
    assert(untouched >= 62L)
  }

  test("bpeTokens splits letter runs, digit runs, and symbols") {
    val rows = TextAnalysis.bpeTokens(docs).orderBy("doc_id").collect()
    val d2 = rows(2)
    assert(d2.getAs[Long]("n_word_toks") == 5L)
    assert(d2.getAs[Long]("n_num_toks") == 1L)   // 42
    assert(d2.getAs[Long]("n_other_toks") == 2L) // ; !
    assert(d2.getAs[Long]("n_bpe_toks") == 8L)
  }

  test("repetition flags looped text, passes varied text") {
    val df = Seq(
      (1L, "spam ham spam ham spam ham spam ham spam ham"), // one bigram loop
      (2L, "all these words appear exactly once in here")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.repetition(df).orderBy("doc_id").collect()
    assert(rows(0).getAs[Double]("top_ngram_frac") > 0.5, "loop not flagged")
    assert(rows(1).getAs[Double]("top_ngram_frac") < 0.2)
    assert(rows(1).getAs[Double]("distinct_ngram_ratio") == 1.0)
  }

  test("contamination measures benchmark n-gram overlap") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon"),        // benchmark doc
      (1L, "alpha beta gamma delta epsilon"),        // full copy → 1.0
      (2L, "alpha beta gamma zeta eta theta iota"),  // shares "alpha beta gamma"
      (3L, "one two three four five six"),           // disjoint → 0.0
      (4L, "xy zz")                                  // < 3 tokens → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus,
      corpus.filter($"doc_id" === 0L)).orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_contaminated"), r.getAs[Double]("contamination"))).toMap
    assert(out.map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 3L))
    assert(byId(1L)._2 == 1.0, "verbatim copy must be fully contaminated")
    assert(byId(2L)._1 == 1L, "one shared trigram")
    assert(byId(3L)._2 == 0.0, "disjoint doc must be clean")
  }

  test("qualityFilter applies rules in precedence order") {
    val df = Seq(
      (0L, "too short"),                                           // < 10 tokens
      (1L, "the cat sat on a mat and it was that simple story"),   // ok
      (2L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do xx"), // no stopwords... but 'sit'? none of list
      (3L, "the spam ham spam ham spam ham spam ham spam ham it"), // repetitive
      (4L, "the the the the the the the the the the the it")       // short-circuit: repetitive checked before diversity
    ).toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(df).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("reason") == "too_short")
    assert(!out(0).getAs[Boolean]("keep"))
    assert(out(1).getAs[String]("reason") == "ok")
    assert(out(1).getAs[Boolean]("keep"))
    assert(out(2).getAs[String]("reason") == "low_stopword")
    assert(out(3).getAs[String]("reason") == "repetitive")
    assert(out(4).getAs[String]("reason") == "repetitive",
      "top-ngram rule precedes type-token rule")
  }

  test("redactPii counts and scrubs emails, phones, and IPs") {
    val df = Seq(
      (1L, "mail alice@corp.example.org or bob.smith@site.io, call 555-1234, host 192.168.0.1"),
      (2L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_emails") == 2L)
    assert(out(0).getAs[Long]("n_phones") == 1L)
    assert(out(0).getAs[Long]("n_ips") == 1L)
    assert(out(1).getAs[Long]("n_emails") == 0L)
    // hash of the scrubbed text equals hashing the expected redaction
    val expected = df.sparkSession.sql(
      "SELECT md5('mail [EMAIL] or [EMAIL], call [PHONE], host [IP]') AS m")
      .head.getString(0)
    assert(out(0).getAs[String]("redacted_md5") == expected)
  }

  test("topTerms ranks document-characteristic tokens by tf/df") {
    val docs = Seq(
      (0L, "apple apple banana shared"),
      (1L, "cherry shared shared")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.topTerms(docs, k = 2).orderBy("doc_id", "term_rank")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token"),
        r.getAs[Double]("score")))
    // doc 0: apple tf=2 df=1 -> 2.0 beats banana 1.0; shared tf=1 df=2 -> 0.5
    assert(rows(0) == ((0L, "apple", 2.0)))
    assert(rows(1) == ((0L, "banana", 1.0)))
    // doc 1: shared tf=2 df=2 -> 1.0, cherry tf=1 df=1 -> 1.0; tie -> "cherry" first
    assert(rows(2) == ((1L, "cherry", 1.0)))
    assert(rows(3) == ((1L, "shared", 1.0)))
  }

  test("tokenRarity scores docs by corpus token frequency") {
    val docs = Seq(
      (0L, "the the the"),     // 'the' appears 4x in corpus
      (1L, "the unique"),      // one common + one singleton token
      (2L, "alone")            // singleton only
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenRarity(docs).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_cnt"),
        r.getAs[Long]("min_cnt"), r.getAs[Double]("mean_cnt")))
    assert(out(0) == ((3L, 12L, 4L, 4.0)))  // all 'the': cnt 4 each
    assert(out(1) == ((2L, 5L, 1L, 2.5)))   // 4 + 1
    assert(out(2) == ((1L, 1L, 1L, 1.0)))
  }

  test("langId votes marker tokens with fixed tiebreak") {
    val multilang = Seq(
      (0L, "the cat and the dog is here"),
      (1L, "der hund und die katze ist da"),
      (2L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(multilang).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("predicted_lang") == "en")
    assert(out(1).getAs[String]("predicted_lang") == "de")
    assert(out(2).getAs[String]("predicted_lang") == "und")
  }

  test("searchTopK ranks by idf-weighted tf with deterministic ties") {
    val docs = Seq(
      (0L, "rare common common"),   // tf(rare)=1
      (1L, "rare rare common"),     // tf(rare)=2 -> outranks doc 0
      (2L, "common common common"), // matches only the low-idf term
      (3L, "nothing here")
    ).toDF("doc_id", "text")
    val qs = Seq((100L, "rare common")).toDF("query_id", "query_text")
    val out = TextAnalysis.searchTopK(docs, qs, k = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // df(rare)=2, df(common)=3 -> idf 500000 vs 333333
    assert(out.toSeq == Seq(
      (1L, 1L, 2L * 500000L + 333333L, 2L),  // rank 1: doc 1
      (2L, 0L, 500000L + 2L * 333333L, 2L),  // rank 2: doc 0
      (3L, 2L, 3L * 333333L, 1L)))           // rank 3: doc 2; doc 3 absent
  }

  test("searchTopK query join broadcasts — no cross product") {
    val docs = Seq((0L, "a b"), (1L, "b c")).toDF("doc_id", "text")
    val qs = Seq((9L, "b")).toDF("query_id", "query_text")
    assertNoCrossProduct(TextAnalysis.searchTopK(docs, qs), "searchTopK")
  }

  test("retrieveRerank reorders the lexical shortlist by embedding cosine") {
    // docs 0 and 1 both match the query lexically; doc 1's embedding is
    // aligned with the query's, doc 0's is orthogonal — the re-rank must
    // put 1 first regardless of the bm25 order. Doc 2 never matches
    // lexically, so a perfect embedding cannot rescue it (shortlist
    // gate).
    val ds = Seq(
      (0L, "quick brown fox jumps high"),
      (1L, "quick brown fox sleeps low"),
      (2L, "completely unrelated words here entirely")).toDF("doc_id", "text")
    val qs = Seq((9L, "quick brown fox")).toDF("query_id", "query_text")
    val docEmb = Seq(
      (0L, Seq(0.0, 1.0, 0.0)),
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.0))).toDF("doc_id", "embedding")
    val qEmb = Seq((9L, Seq(1.0, 0.0, 0.0))).toDF("query_id", "q_emb")
    val out = TextAnalysis.retrieveRerank(ds, qs, docEmb, qEmb,
      kRetrieve = 2, k = 2).orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id")))
    assert(out.toSeq == Seq((1L, 1L), (2L, 0L)),
      s"expected embedding-aligned doc first, got ${out.toSeq}")
  }

  test("hardNegatives keeps lexical matches that fail the semantic gate") {
    val ds = Seq(
      (0L, "quick brown fox jumps high"),
      (1L, "quick brown fox sleeps low"),
      (2L, "completely unrelated words here entirely")).toDF("doc_id", "text")
    val qs = Seq((9L, "quick brown fox")).toDF("query_id", "query_text")
    // doc 1 is semantically aligned (cos = 1) -> NOT a negative;
    // doc 0 is orthogonal (cos = 0) -> the hard negative
    val docEmb = Seq(
      (0L, Seq(0.0, 1.0, 0.0)),
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.0))).toDF("doc_id", "embedding")
    val qEmb = Seq((9L, Seq(1.0, 0.0, 0.0))).toDF("query_id", "q_emb")
    val out = TextAnalysis.hardNegatives(ds, qs, docEmb, qEmb,
      kRetrieve = 2, maxCos = 0.5).collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    assert(out == Set(0L),
      s"expected only the orthogonal lexical match, got $out")
  }

  test("bm25TopK normalizes by doc length: short doc beats long at equal tf") {
    val docs = Seq(
      (0L, "rare x x x x x x x x x x x x x x x x x x x"), // tf=1, dl=20
      (1L, "rare y"),                                     // tf=1, dl=2
      (2L, "zz zz")                                       // no match
    ).toDF("doc_id", "text")
    val qs = Seq((7L, "rare")).toDF("query_id", "query_text")
    val out = TextAnalysis.bm25TopK(docs, qs, k = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L), (2L, 0L)),
      "equal tf must rank the shorter document first")
  }

  test("bm25TopK saturates tf: 50 repeats score < 4x a single occurrence") {
    val docs = Seq(
      (0L, Seq.fill(50)("t").mkString(" ")), // tf=50, dl=50
      (1L, "t " + Seq.fill(49)("u").mkString(" "))  // tf=1, dl=50
    ).toDF("doc_id", "text")
    val qs = Seq((7L, "t")).toDF("query_id", "query_text")
    val byDoc = TextAnalysis.bm25TopK(docs, qs, k = 2).collect()
      .map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(byDoc(0L) > byDoc(1L), "higher tf must still score higher")
    assert(byDoc(0L) < 4L * byDoc(1L),
      s"k1 saturation must cap the 50x-tf gain (got ${byDoc(0L)} vs ${byDoc(1L)})")
  }

  test("bm25TopK query join broadcasts — no cross product beyond the one-row totals") {
    val docs = Seq((0L, "a b"), (1L, "b c")).toDF("doc_id", "text")
    val qs = Seq((9L, "b")).toDF("query_id", "query_text")
    val plan = TextAnalysis.bm25TopK(docs, qs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "bm25TopK must not build a cartesian product")
  }

  test("bigramLm ranks continuations by count with exact conditionals") {
    val docs = Seq(
      (1L, "a b a b a c"),
      (2L, "x")  // single token: no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLm(docs, topK = 2)
      .orderBy("w1", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // bigrams: a->b x2, a->c x1, b->a x2
    assert(out.toSeq == Seq(
      ("a", 1L, "b", 2L, 3L, 2.0 / 3.0),
      ("a", 2L, "c", 1L, 3L, 1.0 / 3.0),
      ("b", 1L, "a", 2L, 2L, 1.0)))
  }

  test("hashTf buckets deterministically, preserves token mass, bounds dim") {
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "alpha beta alpha gamma"), // identical text -> identical vector
      (3L, "delta")).toDF("doc_id", "text")
    val out = TextAnalysis.hashTf(docs, dim = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // buckets inside [0, dim)
    assert(out.forall(t => t._2 >= 0 && t._2 < 8))
    // token mass preserved: sum(tf) per doc == token count
    val mass = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(mass == Map(1L -> 4L, 2L -> 4L, 3L -> 1L))
    // identical docs produce identical sparse vectors
    val v1 = out.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).sortBy(_._1)
    val v2 = out.filter(_._1 == 2L).map(t => (t._2, t._3, t._4)).sortBy(_._1)
    assert(v1.toSeq == v2.toSeq)
    // signs are ±1 per token, so |signed_tf| <= tf with matching parity
    assert(out.forall(t => math.abs(t._4) <= t._3 && (t._4 - t._3) % 2 == 0))
  }

  test("chunk slides overlapping fixed-size windows; tail chunk is short") {
    val docs = Seq(
      (1L, (0 until 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, chunkTokens = 4, overlap = 2)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // step = 2: starts 0,2,4,6,8; last chunk holds only tokens 8-9
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 2L, 4L, "t2 t3 t4 t5"),
      (1L, 2L, 4L, 4L, "t4 t5 t6 t7"),
      (1L, 3L, 6L, 4L, "t6 t7 t8 t9"),
      (1L, 4L, 8L, 2L, "t8 t9"),
      (2L, 0L, 0L, 1L, "solo")))
    // every token of every doc appears in at least one chunk
    assert(out.filter(_._1 == 1L).flatMap(_._5.split(" ")).toSet.size == 10)
  }

  test("bpeTrain learns merges in frequency order and stops when exhausted") {
    // words: ab (freq 2), abc (freq 1) -> (a,b):3 then (ab,c):1, done
    val docs = Seq((1L, "ab ab abc")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, merges = 5)
      .collect().map(r => (r.getAs[Long]("round"), r.getAs[String]("a"),
        r.getAs[String]("b"), r.getAs[Long]("cnt"))).toSeq
    assert(got == Seq((0L, "a", "b", 3L), (1L, "ab", "c", 1L)))
  }

  test("bpeTrain applies merges greedy-leftmost within same-symbol runs") {
    // aaaa (freq 2): 3 (a,a) pairs; aaa (freq 1): 2 -> cnt 8
    val docs = Seq((1L, "aaaa aaaa aaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, merges = 2)
      .collect().map(r => (r.getAs[Long]("round"), r.getAs[String]("a"),
        r.getAs[String]("b"), r.getAs[Long]("cnt"))).toSeq
    assert(got.head == ((0L, "a", "a", 8L)))
    // greedy leftmost: aaaa -> [aa, aa], aaa -> [aa, a]
    // round 1 pairs: (aa,aa): 2, (aa,a): 1
    assert(got(1) == ((1L, "aa", "aa", 2L)))
  }

  test("bpeEncode applies merges in order and counts subwords") {
    val docs = Seq((1L, "ab ab abc"), (2L, "xyz")).toDF("doc_id", "text")
    // merges learned above: (a,b) then (ab,c)
    val out = TextAnalysis.bpeEncode(docs, Seq(("a", "b"), ("ab", "c")))
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_subwords")))
    // doc 1: [ab] [ab] [abc] -> 3 subwords; doc 2: x y z untouched
    assert(out.toSeq == Seq((1L, 3L, 3L), (2L, 1L, 3L)))
    // encoding hash is deterministic across runs
    val h1 = TextAnalysis.bpeEncode(docs, Seq(("a", "b")))
      .orderBy("doc_id").collect().map(_.getAs[String]("enc_hash")).toSeq
    val h2 = TextAnalysis.bpeEncode(docs, Seq(("a", "b")))
      .orderBy("doc_id").collect().map(_.getAs[String]("enc_hash")).toSeq
    assert(h1 == h2)
  }

  test("bpeTrainEncode matches train-then-encode row for row") {
    val docs = Seq((1L, "ab ab abc abc low lower"), (2L, "xyz ab low"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, 3).orderBy("round").collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSeq
    val viaEncode = TextAnalysis.bpeEncode(docs, merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_subwords"), r.getAs[String]("enc_hash"))).toSeq
    val viaState = TextAnalysis.bpeTrainEncode(docs, 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_subwords"), r.getAs[String]("enc_hash"))).toSeq
    assert(viaState == viaEncode)
  }

  test("scoreBigramLm ranks in-domain docs above out-of-domain") {
    // target domain: "a b" dominates; LM gives P(b|a)=1, P(c|b)=1 etc.
    val target = Seq((1L, "a b c a b c"), (2L, "a b c a b")).toDF("doc_id", "text")
    val lm = TextAnalysis.bigramLm(target, 5)
    val docs = Seq(
      (10L, "a b c a b"),  // pure in-domain
      (11L, "x y z x y"),  // fully out-of-domain
      (12L, "a b x y"))    // mixed
      .toDF("doc_id", "text")
    val got = TextAnalysis.scoreBigramLm(docs, lm)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_matched"),
          r.getAs[Double]("score"))).toMap
    assert(got(10L)._1 == 4L && got(10L)._2 == 4L)
    assert(got(11L)._2 == 0L && got(11L)._3 == 0.0)
    assert(got(10L)._3 > got(12L)._3 && got(12L)._3 > got(11L)._3)
    // doc 10's bigrams all have conditional prob 1 -> mean exactly 1
    assert(got(10L)._3 == 1.0)
  }

  test("trainPerceptron learns weights that separate planted domains") {
    import org.apache.spark.sql.functions.col
    // two vocab-disjoint domains; +1 docs speak finance, -1 docs cooking
    val pos = (0 until 30).map(i => (i.toLong,
      s"market equity dividend portfolio yield bond asset ticker v$i", 1L))
    val neg = (0 until 30).map(i => (100L + i,
      s"recipe butter flour oven simmer garlic onion saute w$i", -1L))
    val docs = (pos ++ neg).toDF("doc_id", "text", "label")
    val w = TextAnalysis.trainPerceptron(docs, 64, 5)
    assert(w.count() == 64L, "one weight row per bucket")
    val scored = TextAnalysis.scoreLinear(docs, w)
      .join(docs.select(col("doc_id"), col("label")), Seq("doc_id"))
    val n = scored.count()
    val correct = scored.filter(
      (col("score_milli") > 0 && col("label") === 1L) ||
        (col("score_milli") < 0 && col("label") === -1L)).count()
    assert(correct >= (n * 9) / 10,
      s"learned weights must separate the domains: $correct/$n correct")
  }

  test("codeDetect separates planted code from prose") {
    val code =
      "def f(x):\n  return g(x);\nstruct A {\n  void y();\n}\nwhile (x) { printf(x); }"
    // prose with if/for/while — ordinary English must not read as code
    val prose = "the meadow lay quiet for a while under a pale morning " +
      "sky and if birdsong drifted over the hedgerows nobody hurried"
    val df = Seq((1L, code), (2L, prose)).toDF("doc_id", "text")
    val r = TextAnalysis.codeDetect(df).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("is_code") == 1L)
    assert(r(2L).getAs[Long]("is_code") == 0L)
    assert(r(1L).getAs[Long]("n_kw") == 4L)      // def struct void printf
    assert(r(2L).getAs[Long]("n_kw") == 0L)
    assert(r(2L).getAs[Long]("n_punct") == 0L)
    assert(r(1L).getAs[Long]("n_indent_lines") == 2L)
  }

  test("mojibakeRepair fixes every family and leaves clean text alone") {
    val rows = Seq(
      (1L, "cafÃ© itâ€™s fine"), // Ã© + â€™
      (2L, "Â lead ghost"),                      // Â+NBSP
      (3L, "plain ascii"),
      (4L, "dash â€“ here"))                // en-dash ghost
    val out = TextAnalysis.mojibakeRepair(rows.toDF("doc_id", "text"))
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(out(1L).getAs[Long]("changed") == 1L)
    // "café it’s fine" = 14 chars
    assert(out(1L).getAs[Long]("n_chars_fixed") == 14L)
    assert(out(2L).getAs[Long]("changed") == 1L)
    assert(out(2L).getAs[Long]("n_chars_fixed") == 11L) // " lead ghost"
    assert(out(3L).getAs[Long]("changed") == 0L)
    assert(out(4L).getAs[Long]("changed") == 1L)
    assert(out(4L).getAs[Long]("n_chars_fixed") == 11L) // "dash – here"
  }

  test("parseChatTurns folds continuations and drops preamble") {
    val conv = "junk preamble\nsystem: be kind\nuser: hi\nthere\n" +
      "assistant: hello\nworld\nagain\nuser: bye"
    val out = TextAnalysis.parseChatTurns(
      Seq((7L, conv)).toDF("doc_id", "conv")).collect()
      .sortBy(_.getAs[Long]("turn_idx"))
    assert(out.map(_.getAs[String]("role")).toSeq ==
      Seq("system", "user", "assistant", "user"))
    // "be kind"=7; "hi\nthere"=8; "hello\nworld\nagain"=17; "bye"=3
    assert(out.map(_.getAs[Long]("n_chars")).toSeq == Seq(7L, 8L, 17L, 3L))
  }

  test("heapsGrowth counts new types at first occurrence, cumulative exact") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a"), (1L, "b c"),  // bucket 0: 5 tokens, types a,b,c
      (2L, "c d d"), (3L, "a e")   // bucket 1: 5 tokens, new d,e
    ).toDF("doc_id", "text")
    val out = TextAnalysis.heapsGrowth(docs, bucketWidth = 2L)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out === Seq((0L, 5L, 3L, 5L, 3L), (1L, 5L, 2L, 10L, 5L)))
  }


  test("skipgramStats counts windowed pairs and exact integer ratios") {
    import spark.implicits._
    // "x y" adjacent 6 times; x,y,z each frequent enough for the floor
    val docs = (0L until 6L).map(i => (i, "x y z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.skipgramStats(docs, window = 2, topK = 10,
      minPair = 3L, minTok = 5L).collect()
      .map(r => (r.getAs[String]("tok_a"), r.getAs[String]("tok_b")) ->
        (r.getAs[Long]("n_pair"), r.getAs[Long]("ratio_ppm"))).toMap
    // N = 18 tokens; each unigram n = 6; pairs x->y, y->z (offset 1),
    // x->z (offset 2), each 6 times: ratio = 6*18*1e6 / 36 = 3e6
    assert(out.keySet === Set(("x","y"), ("y","z"), ("x","z")))
    assert(out.values.forall(_ == (6L, 3000000L)))
  }


  test("sentences splits on terminal punctuation + space, keeps positions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "First one. Second! Third? trailing."),
      (2L, "no punctuation at all"),
      (3L, "Multi  space.   padded. ")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.sentences(docs).orderBy("doc_id", "sent_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq === Seq(
      (1L, 0L, "First one."), (1L, 1L, "Second!"), (1L, 2L, "Third?"),
      (1L, 3L, "trailing."),
      (2L, 0L, "no punctuation at all"),
      (3L, 0L, "Multi  space."), (3L, 1L, "padded.")))
  }


  test("zipfProfile: planted geometric corpus has slope exactly -1") {
    import spark.implicits._
    // 1 token x16, 2 x8, 4 x4, 8 x2, 16 x1: every term satisfies
    // lf = 6 - lr, so the least-squares slope is exactly -1.0
    val toks =
      Seq.fill(16)("t0") ++
        (1 to 2).flatMap(i => Seq.fill(8)(s"u$i")) ++
        (1 to 4).flatMap(i => Seq.fill(4)(s"v$i")) ++
        (1 to 8).flatMap(i => Seq.fill(2)(s"w$i")) ++
        (1 to 16).map(i => s"x$i")
    val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
    val rows = TextAnalysis.zipfProfile(docs).collect()
      .map(r => r.getAs[Long]("rank_bucket") ->
        (r.getAs[Long]("n_terms"), r.getAs[Long]("sum_freq"),
          r.getAs[Double]("zipf_slope"))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(rows(1L)._1 == 1L && rows(1L)._2 == 16L)
    assert(rows(3L)._1 == 4L && rows(3L)._2 == 16L)
    assert(rows(5L)._1 == 16L && rows(5L)._2 == 16L)
    assert(rows(1L)._3 == -1.0)
  }


  test("textRank ranks the hub word first with monotone scores") {
    import spark.implicits._
    val docs = Seq((1L, "hub x1 hub x2 hub x3 hub x4"),
      (2L, "hub y1 hub y2 hub y3")).toDF("doc_id", "text")
    val out = TextAnalysis.textRank(docs, window = 2, iters = 3, topK = 5)
      .orderBy("rk").collect()
    assert(out.head.getAs[String]("term") == "hub")
    val scores = out.map(_.getAs[Long]("rank_scaled")).toSeq
    assert(scores == scores.sorted.reverse)
    assert(out.map(_.getAs[Long]("rk")).toSeq == (1L to out.length.toLong))
  }


  test("maxSimTopK pools per-chunk tf so a dense passage beats dilution") {
    import spark.implicits._
    // doc 10: 'needle' 3x inside ONE 4-token chunk then padding;
    // doc 11: 'needle' 3x spread across three chunks (max tf 1);
    // flat tf ties them - max pooling must rank doc 10 first
    val pad = (1 to 12).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (10L, "needle needle needle x " + pad),
      (11L, "needle a b c needle d e f needle g h i " + pad))
      .toDF("doc_id", "text")
    val qs = Seq((1L, "needle")).toDF("query_id", "query_text")
    val out = TextAnalysis.maxSimTopK(docs, qs, k = 2, chunkTokens = 4)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 11L))
    // df = 2 docs -> weight 500000; doc 10 best-chunk tf 3, doc 11 tf 1
    assert(out(0).getAs[Long]("score") == 1500000L)
    assert(out(1).getAs[Long]("score") == 500000L)
  }

  test("scriptProfile counts classes and elects the dominant script") {
    val docs = Seq(
      (1L, "hello world 42"),
      (2L, "\u043f\u0440\u0438\u0432\u0435\u0442 world"), // 6 cyrillic + 5 latin
      (3L, "\u4f60\u597d"),                                   // 2 cjk
      (4L, "12345 !!!"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6), r.getBoolean(8))).toMap
    assert(out(1L) == ((10L, 0L, 0L, 2L, "latin", false)))
    assert(out(2L) == ((5L, 6L, 0L, 0L, "cyrillic", true)))
    assert(out(3L) == ((0L, 0L, 2L, 0L, "cjk", false)))
    assert(out(4L) == ((0L, 0L, 0L, 5L, "none", false)))
  }

  test("compressionCard computes exact bytes-per-token by source") {
    val docs = Seq(
      (1L, "ab cd", "s1"),  // 5 bytes, 2 word tokens
      (2L, "a 1!", "s1"),   // 4 bytes, 3 tokens (word + num + other)
      (3L, "xyz", "s2"))    // 3 bytes, 1 token
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.compressionCard(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("s1") == ((2L, 9L, 5L, 9L * 1000000L / 5L)))
    assert(out("s2") == ((1L, 3L, 1L, 3000000L)))
  }

  test("langIdEval builds the confusion matrix with exact recall ppm") {
    val docs = Seq(
      (1L, "the cat and the dog of the house is it", "en"),
      (2L, "der hund und die katze das ist gut", "de"),
      (3L, "el gato los perros que es una casa", "es"),
      (4L, "zzz qqq xxx", "en")) // no markers -> und
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langIdEval(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("en", "en")) == ((1L, 2L, 500000L)))
    assert(out(("en", "und")) == ((1L, 2L, 500000L)))
    assert(out(("de", "de")) == ((1L, 1L, 1000000L)))
    assert(out(("es", "es")) == ((1L, 1L, 1000000L)))
  }

  test("vocabOverlap: type jaccard and occurrence-weighted OOV rates") {
    val train = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val eval0 = Seq((2L, "a a a zz b")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabOverlap(train, eval0).collect().head
    assert(r.getAs[Long]("n_train_types") == 4L)
    assert(r.getAs[Long]("n_eval_types") == 3L)  // a, zz, b
    assert(r.getAs[Long]("n_shared_types") == 2L)
    assert(r.getAs[Long]("n_eval_tokens") == 5L)
    assert(r.getAs[Long]("n_oov_tokens") == 1L)  // the single zz
    assert(r.getAs[Long]("type_jaccard_ppm") == 1000000L * 2L / 5L)
    assert(r.getAs[Long]("oov_type_ppm") == 333333L)
    assert(r.getAs[Long]("oov_token_ppm") == 200000L)
  }

  test("gazetteerMatch counts overlapping occurrences, keeps zero-hit terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the hash join beats sort merge join on a a a"),
      (2L, "hash join again and a table scan"),
      (3L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gazetteerMatch(docs,
        Seq("hash join", "sort merge join", "table scan", "a a", "query plan"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("plen"), r.getAs[Long]("n_matches"),
          r.getAs[Long]("n_docs"))).toMap
    assert(out("hash join") == ((2L, 2L, 2L)))
    assert(out("sort merge join") == ((3L, 1L, 1L)))
    assert(out("table scan") == ((2L, 1L, 1L)))
    // "a a a" holds TWO overlapping "a a" occurrences
    assert(out("a a") == ((2L, 2L, 1L)))
    // zero-hit dictionary terms stay in the report
    assert(out("query plan") == ((2L, 0L, 0L)))
  }

  test("bm25TopKIndexed equals the on-the-fly bm25 and prunes partitions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "spark caches hot data in memory"),
      (3L, "ducks swim across the pond"),
      (4L, "the pond holds cold data")).toDF("doc_id", "text")
    val qs = Seq((10L, "spark data"), (11L, "pond"))
      .toDF("query_id", "query_text")
    val dir = java.nio.file.Files.createTempDirectory("searchidx").toString
    try {
      TextAnalysis.writeSearchIndex(docs, dir, buckets = 16)
      val indexed = TextAnalysis.bm25TopKIndexed(spark, dir, qs, k = 3,
        buckets = 16)
      val direct = TextAnalysis.bm25TopK(docs, qs, k = 3)
      assert(indexed.collect().map(_.toString).sorted.toSeq ==
        direct.collect().map(_.toString).sorted.toSeq,
        "index-time df must reproduce the on-the-fly scores exactly")
      val plan = indexed.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
        s"expected bucket partition pruning:\n$plan")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("sftQuality gates alternation, terminal role, and short turns") {
    val turns = Seq(
      // doc 1: clean system/user/assistant — keep
      (1L, 1L, "system", 20L), (1L, 2L, "user", 30L),
      (1L, 3L, "assistant", 40L),
      // doc 2: double user — alternation violation
      (2L, 1L, "user", 30L), (2L, 2L, "user", 30L),
      (2L, 3L, "assistant", 40L),
      // doc 3: ends on user
      (3L, 1L, "user", 30L), (3L, 2L, "assistant", 40L),
      (3L, 3L, "user", 10L),
      // doc 4: assistant turn too short
      (4L, 1L, "user", 30L), (4L, 2L, "assistant", 3L),
      // doc 5: system in the middle
      (5L, 1L, "user", 30L), (5L, 2L, "system", 9L),
      (5L, 3L, "assistant", 40L))
      .toDF("doc_id", "turn_idx", "role", "n_chars")
    val r = TextAnalysis.sftQuality(turns).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Boolean]("keep")).toMap
    assert(r == Map(1L -> true, 2L -> false, 3L -> false,
      4L -> false, 5L -> false))
  }

  test("extractiveSummary ranks rare-term sentences first, ties to earlier") {
    // 'zebra' appears in ONE doc (max idf); 'common' in all three
    val docs = Seq(
      (1L, "common words here. the zebra sentence! common words again."),
      (2L, "common words here. common words again."),
      (3L, "common filler text."))
      .toDF("doc_id", "text")
    val r = TextAnalysis.extractiveSummary(docs, 1).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("sent_idx")).toMap
    assert(r(1L) == 1L, "the zebra sentence must win doc 1")
    // doc 2's sentences tie exactly (same distinct common tokens except
    // here/again) — earlier sentence wins on a true tie; just assert
    // determinism and presence
    assert(r.contains(2L) && r.contains(3L))
    val again = TextAnalysis.extractiveSummary(docs, 1).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("sent_idx")).toMap
    assert(again == r)
  }

  test("rougeN: identity pair scores 1e6, disjoint pair scores 0") {
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat sat on the mat"),
      (2L, "aa bb cc dd", "xx yy zz ww"),
      (3L, "aa aa bb", "aa cc cc"))
      .toDF("pair_id", "cand", "ref")
    val r1 = TextAnalysis.rougeN(pairs, 1).collect()
      .map(x => x.getAs[Long]("pair_id") ->
        (x.getAs[Long]("n_match"), x.getAs[Long]("f1_ppm"))).toMap
    assert(r1(1L) == ((6L, 1000000L)))
    assert(r1(2L) == ((0L, 0L)))
    // clipping: cand has aa×2, ref aa×1 → min 1 (never 2)
    assert(r1(3L)._1 == 1L)
    val r2 = TextAnalysis.rougeN(pairs, 2).collect()
      .map(x => x.getAs[Long]("pair_id") -> x.getAs[Long]("n_match")).toMap
    assert(r2(1L) == 5L) // 5 bigrams, all matched
    assert(r2(3L) == 0L) // no shared bigram
  }

  test("appendSearchIndex batches reproduce the baked index exactly") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_sidx_t").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val qs = docs.filter(col("doc_id") < 3).select(
      col("doc_id").as("query_id"),
      array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " ")
        .as("query_text"))
    TextAnalysis.appendSearchIndex(docs.filter(col("doc_id") % 2 === 0), dir)
    TextAnalysis.appendSearchIndex(docs.filter(col("doc_id") % 2 === 1), dir)
    val inc = TextAnalysis.bm25TopKIndexedInc(spark, dir, qs, k = 3)
    val direct = TextAnalysis.bm25TopK(docs, qs, k = 3)
    assert(inc.collect().map(_.toString).sorted.toSeq ==
      direct.collect().map(_.toString).sorted.toSeq,
      "segment-summed df/totals must reproduce on-the-fly scores")
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition pruning on the postings read:\n$plan")
  }

  test("bpeTrainDecode: every vocab word round-trips through its subwords") {
    val docs = Seq((1L, "low lower lowest low low"),
      (2L, "new newer newest new"), (3L, "low new"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bpeTrainDecode(docs, 4).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Boolean]("roundtrip_ok"),
        s"word ${row.getAs[String]("word")} decoded to " +
          row.getAs[String]("decoded"))
      assert(row.getAs[String]("decoded") == row.getAs[String]("word"))
    }
    // merges genuinely happened: some word must encode to < length chars
    assert(r.exists(row => row.getAs[Long]("n_sub") <
      row.getAs[String]("word").length))
  }

  test("sourceTvd: identical sources → 0, disjoint vocabularies → 1e6") {
    val docs = Seq(
      (1L, "aa bb cc", "s1"), (2L, "aa bb cc", "s2"), // identical dists
      (3L, "xx yy", "s3"))                            // disjoint from both
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.sourceTvd(docs).collect()
      .map(x => (x.getAs[String]("source_a"), x.getAs[String]("source_b")) ->
        x.getAs[Long]("tvd_ppm")).toMap
    assert(r(("s1", "s2")) == 0L)
    // disjoint-vocab pairs never share a word → the INNER join drops
    // them entirely; the operator contract covers pairs with overlap
    assert(!r.contains(("s1", "s3")))
    // partial overlap: s4 = {aa: 1/2, zz: 1/2} vs s1 = {aa,bb,cc: 1/3}
    // TVD = ½(|1/2−1/3| + 1/3 + 1/3 + 1/2) = ½·(1/6+7/6... = 2/3
    val docs2 = Seq((1L, "aa bb cc", "s1"), (4L, "aa zz", "s4"))
      .toDF("doc_id", "text", "source")
    val r2 = TextAnalysis.sourceTvd(docs2).collect().head
    assert(r2.getAs[Long]("tvd_ppm") == 666666L)
  }

  test("bleuCard: an identical pair scores full precision, no brevity") {
    val pairs = Seq((1L, "a b c d", "a b c d")).toDF("pair_id", "cand", "ref")
    val r = TextAnalysis.bleuCard(pairs).collect().head
    assert(r.getAs[Long]("p1_ppm") == 1000000L)
    assert(r.getAs[Long]("p2_ppm") == 1000000L)
    assert(r.getAs[Long]("bleu2_sq_e12") == 1000000000000L)
    assert(!r.getAs[Boolean]("bp_applied"))
    assert(r.getAs[Long]("len_ratio_ppm") == 1000000L)
  }

  test("bleuCard clips repeated grams and guards single-token candidates") {
    val pairs = Seq((1L, "a a a", "a b"), (2L, "a", "a b c"))
      .toDF("pair_id", "cand", "ref")
    val rows = TextAnalysis.bleuCard(pairs).orderBy("pair_id").collect()
    val r1 = rows(0)
    assert(r1.getAs[Long]("m1") == 1L, "cand 'a'x3 clips to ref's one 'a'")
    assert(r1.getAs[Long]("p1_ppm") == 333333L)
    assert(r1.getAs[Long]("m2") == 0L, "'a a' never appears in the ref")
    assert(r1.getAs[Long]("p2_ppm") == 0L)
    val r2 = rows(1)
    assert(r2.isNullAt(r2.fieldIndex("p2_ppm")), "no bigrams → NULL, not a throw")
    assert(r2.isNullAt(r2.fieldIndex("bleu2_sq_e12")))
    assert(r2.getAs[Boolean]("bp_applied"), "1 cand token < 3 ref tokens")
  }

  test("prfExpandTerms ranks feedback terms by tf-idf, query terms excluded") {
    // query 'alpha' retrieves docs 1 and 2; 'rare' (df=1) must outrank
    // 'common' (df=3) despite equal feedback tf; 'alpha' never expands
    val corpus = Seq(
      (1L, "alpha rare common"),
      (2L, "alpha common zz"),
      (3L, "common other words here")).toDF("doc_id", "text")
    val qs = Seq((100L, "alpha")).toDF("query_id", "query_text")
    val out = TextAnalysis.prfExpandTerms(corpus, qs, kDocs = 2, mTerms = 3)
      .orderBy("rank").collect()
    assert(!out.exists(_.getString(2) == "alpha"), "query term anti-joined")
    assert(out.head.getString(2) == "rare")
    assert(out.head.getLong(5) == 1000000L)       // 1 * (1e6 div 1)
    val common = out.find(_.getString(2) == "common").get
    assert(common.getLong(3) == 2L && common.getLong(4) == 3L)
    assert(common.getLong(5) == 2L * (1000000L / 3L))
  }
}
