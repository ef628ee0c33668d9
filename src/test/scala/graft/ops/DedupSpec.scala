package graft.ops

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private def docs = Seq(
    (0L, base),
    (1L, base),                                  // exact dup of 0
    (2L, base + " tomorrow"),                    // near dup of 0/1
    (3L, "completely different words about spark catalyst tungsten shuffles"),
    (4L, "ab")                                   // < 3 tokens: no shingles
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest doc_id and counts copies") {
    val out = Dedup.exact(docs).orderBy("doc_id").collect()
    assert(out.length == 4)
    val first = out.head
    assert(first.getAs[Long]("doc_id") == 0L)
    assert(first.getAs[Long]("n_copies") == 2L)
  }

  test("weightedJaccard counts gram multiplicity where set-jaccard can't") {
    import spark.implicits._
    // A's grams: "a b c"×2, "b c a", "c a b" (w=4); B: "a b c"×1 (w=1)
    // Σmin = 1, Σmax = 4+1−1 = 4 → J_w = 250000 ppm; the SET form would
    // say 1/3 — the weighted form sees A's repetition
    val docs = Seq((1L, "a b c a b c"), (2L, "a b c"))
      .toDF("doc_id", "text")
    val out = Dedup.weightedJaccard(docs, tauPpm = 100000L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getAs[Long]("common_w") == 1L)
    assert(r.getAs[Long]("a_w") == 4L && r.getAs[Long]("b_w") == 1L)
    assert(r.getAs[Long]("jw_ppm") == 250000L)
  }

  test("ngramJaccard finds exact and near duplicates, skips unrelated") {
    val pairs = Dedup.ngramJaccard(docs, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)), "exact pair missed")
    assert(keys.contains((0L, 2L)) && keys.contains((1L, 2L)), "near pair missed")
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc matched")
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 1.0)
  }

  test("minHashLsh finds near-dup pairs as a superset of exact dups, no cross product") {
    val df = Dedup.minHashLsh(docs, tau = 0.5)
    assertNoCrossProduct(df, "minHashLsh")
    val keys = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((0L, 1L)), "exact dup pair must always collide")
  }

  test("incrementalMinHash equals full LSH restricted to batch-touching pairs") {
    // batch = odd ids (1 is an exact dup of index doc 0; 5 is a fresh
    // near-dup of batch doc 7) — exercises both the vs-index and the
    // within-batch candidate paths
    val all = Seq(
      (0L, base), (1L, base), (2L, base + " tomorrow"),
      (3L, "completely different words about spark catalyst tungsten shuffles"),
      (5L, base + " yesterday evening"), (7L, base + " yesterday evening"))
      .toDF("doc_id", "text")
    val batch = all.filter($"doc_id" % 2 === 1)
    val index = all.filter($"doc_id" % 2 === 0)
    val inc = Dedup.incrementalMinHash(batch, index)
    assertNoCrossProduct(inc, "incrementalMinHash")
    val got = inc.collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[String]("via"))).toSet
    val fullRestricted = Dedup.minHashLsh(all)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
      .map(p => (p._1, p._2,
        if (p._1 % 2 == 1 && p._2 % 2 == 1) "batch" else "index")).toSet
    assert(got == fullRestricted, s"got $got vs full-restricted $fullRestricted")
    assert(got.exists(_._3 == "batch") && got.exists(_._3 == "index"),
      "fixture must exercise both candidate paths")
  }

  test("minHashLshStar caps hot buckets with star edges, same components") {
    // 40 exact copies (one hot cluster) + the distinct docs
    val cluster = (100L until 140L).map(i => (i, base + " shared tail words"))
    val big = (cluster ++ Seq(
      (0L, base), (1L, base),
      (3L, "completely different words about spark catalyst tungsten shuffles")))
      .toDF("doc_id", "text")
    val full = Dedup.minHashLsh(big, tau = 0.5)
    val star = Dedup.minHashLshStar(big, tau = 0.5, hotBucket = 10)
    assertNoCrossProduct(star, "minHashLshStar")
    val nFull = full.count()
    val nStar = star.count()
    // the clique collapses: C(40,2)=780 intra-cluster pairs become 39 star
    // edges (plus the 0-1 pair)
    assert(nFull >= 780L, s"clique baseline missing pairs: $nFull")
    assert(nStar <= 60L, s"star did not cap the hot bucket: $nStar")
    // identical connected components either way
    def comps(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.resolveClusters(pairs.select("a_id", "b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(comps(star) == comps(full), "star edges must preserve components")
  }

  test("minHashLsh default fence caps a >64-copy family; uncapped is opt-in") {
    // 80 exact copies — over the default hotBucket=64 fence — plus
    // distinct docs; the r14 fence makes the DEFAULT call emit star
    // edges for the hot family instead of the C(80,2) clique
    val family = (200L until 280L).map(i => (i, base + " hot family tail"))
    val big = (family ++ Seq(
      (0L, base), (1L, base),
      (3L, "completely different words about spark catalyst tungsten shuffles")))
      .toDF("doc_id", "text")
    val capped = Dedup.minHashLsh(big, tau = 0.5)
    val uncapped = Dedup.minHashLsh(big, tau = 0.5, hotBucket = Int.MaxValue)
    val cappedPairs = capped.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncappedPairs = uncapped.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // C(80,2) = 3160 family pairs uncapped; the star keeps O(D) edges
    assert(uncappedPairs.size >= 3160,
      s"uncapped clique missing pairs: ${uncappedPairs.size}")
    assert(cappedPairs.size <= 200L,
      s"default fence did not cap the hot family: ${cappedPairs.size}")
    assert(cappedPairs.subsetOf(uncappedPairs),
      "capped pair set must be a subset of the exact pair set")
    // identical connected components either way
    def comps(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.resolveClusters(pairs.select("a_id", "b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(comps(capped) == comps(uncapped),
      "fence must preserve duplicate components")
  }

  test("semanticDedup keeps one representative per duplicate group") {
    val e = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (10L, Seq(1.0f, 0.0f)), // exact copy of 0: dropped
      (20L, Seq(0.0f, 1.0f)), (21L, Seq(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(e, k = 2, tau = 0.999)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(0L, 1L, 20L, 21L))
  }

  test("paragraphDedup keeps first occurrence, reassembles in order") {
    val paras = Seq(
      (0L, 1L, "alpha beta"), (0L, 2L, "gamma delta"),
      (1L, 1L, "gamma delta"),                      // copy of (0,2): dropped
      (1L, 2L, "epsilon zeta"),
      (2L, 1L, "alpha beta"), (2L, 2L, "alpha beta") // both dropped
    ).toDF("doc_id", "para_idx", "para")
    val out = Dedup.paragraphDedup(paras).orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_dropped")).toSeq == Seq(0L, 1L, 2L))
    assert(out(0).getAs[String]("clean_text") == "alpha beta gamma delta")
    assert(out(1).getAs[String]("clean_text") == "epsilon zeta")
    assert(out(2).getAs[String]("clean_text") == "")
    assert(out.map(_.getAs[Long]("n_paras")).toSeq == Seq(2L, 2L, 2L))
    // boilerplate rule at df >= 2: "alpha beta" (docs 0,2) and
    // "gamma delta" (docs 0,1) vanish EVERYWHERE, first copies included;
    // only the df=1 "epsilon zeta" survives
    val bp = Dedup.paragraphDedup(paras, boilerplateDf = 2L)
      .orderBy("doc_id").collect()
    assert(bp.map(_.getAs[String]("clean_text")).toSeq ==
      Seq("", "epsilon zeta", ""))
    assert(bp.map(_.getAs[Long]("n_dropped")).toSeq == Seq(2L, 1L, 2L))
  }

  test("crossMinHash matches corpus docs against the reference set only") {
    val ref = Seq((0L, base)).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, base),                 // exact copy: must collide
      (11L, base + " tomorrow"),   // near dup: should collide
      (12L, "completely different words about spark catalyst tungsten"),
      (13L, "xy")                  // too short: no shingles
    ).toDF("doc_id", "text")
    val df = Dedup.crossMinHash(ref, corpus)
    assertNoCrossProduct(df, "crossMinHash")
    val out = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((0L, 10L)), "exact copy must always collide")
    assert(!out.exists(_._2 == 12L), "unrelated doc matched")
    // pairs are ref x corpus only — never corpus x corpus
    assert(out.forall(_._1 == 0L))
  }

  test("simHash flags identical docs at hamming 0, no cross product") {
    val df = Dedup.simHash(docs, maxHamming = 3)
    assertNoCrossProduct(df, "simHash")
    val rows = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(rows.get((0L, 1L)).contains(0L), "identical docs must have hamming 0")
  }

  test("resolveClusters finds connected components; keepRepresentative keeps cluster minima") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L),                   // chain → cluster 1
      (5L, 6L),                             // pair → cluster 5
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L) // longer chain → cluster 10
    ).toDF("a_id", "b_id")
    val clusters = Dedup.resolveClusters(pairs)
    val byDoc = clusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(byDoc(_) == 1L))
    assert(Seq(5L, 6L).forall(byDoc(_) == 5L))
    assert(Seq(10L, 11L, 12L, 13L, 14L).forall(byDoc(_) == 10L),
      s"chain must converge to its minimum: $byDoc")

    val corpus = (1L to 14L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val kept = Dedup.keepRepresentative(corpus, clusters)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(1L, 4L, 5L, 7L, 8L, 9L, 10L),
      "one representative per cluster + every unclustered doc")
  }

  test("resolveClustersStar matches hash-min on chain/star/clique/self-loop graphs") {
    val cases: Seq[(String, Seq[(Long, Long)])] = Seq(
      "long chain" -> (1L to 9L).map(i => (i, i + 1)),
      "star" -> Seq((7L, 1L), (7L, 2L), (7L, 3L), (7L, 4L)),
      "K4 clique" -> Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)),
      "two components + self-loop" ->
        Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L)),
      "reversed/duplicated edges" ->
        Seq((5L, 4L), (4L, 5L), (4L, 3L), (5L, 3L), (3L, 2L))
    )
    cases.foreach { case (name, edges) =>
      val pairs = edges.toDF("a_id", "b_id")
      val expected = Dedup.resolveClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
      val got = Dedup.resolveClustersStar(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(got == expected, s"$name: star=$got hashMin=$expected")
    }
  }

  test("incrementalExact keeps only novel content, deduped within batch") {
    val known = Seq((1L, "seen before"), (2L, "also seen")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen before"),   // duplicate of the index -> dropped
      (11L, "brand new"),     // novel
      (12L, "brand new"),     // within-batch copy -> folded into 11
      (13L, "also novel")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalExact(batch, Dedup.exact(known).select("checksum"))
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies"))
    assert(out.toSeq == Seq(11L -> 2L, 13L -> 1L))
  }

  test("cluster propagation round plans equi-joins, no cross product") {
    // resolveClusters executes eagerly behind localCheckpoint, so the
    // QueryPlanSpec sweep over registered queries only sees a
    // post-checkpoint scan for dedup_clusters — the per-round join
    // topology must be asserted on the lazily-planned round itself
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val labels = edges.select($"src".as("id")).distinct()
      .withColumn("label", $"id")
    assertNoCrossProduct(Dedup.propagationRound(labels, edges), "propagationRound")
  }

  test("winnowNearDup surfaces a shared passage between different docs, no cross product") {
    val passage = (1 to 12).map(i => s"p$i").mkString(" ") // >= w+k-1 tokens
    val corpus = Seq(
      (0L, s"alpha beta gamma $passage delta epsilon zeta"),
      (1L, s"one two three four five $passage six seven eight"),
      (2L, "unrelated words entirely about catalyst shuffles and tungsten"),
      (3L, "more unrelated text that shares nothing with anyone here")
    ).toDF("doc_id", "text")
    val df = Dedup.winnowNearDup(corpus)
    assertNoCrossProduct(df, "winnowNearDup")
    val pairs = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)),
      "docs sharing a 12-token passage must share fingerprints")
    assert(!pairs.exists(p => p._1 >= 2L || p._2 >= 2L), "unrelated docs matched")
  }

  test("embeddingNearDup catches planted duplicate vectors, no cross product") {
    val vec = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val near = vec.clone(); near(0) = near(0) + 0.001f
    val other = Array.tabulate(16)(i => math.cos(3 * i + 2).toFloat)
    val emb = Seq((0L, vec.toSeq), (1L, vec.toSeq), (2L, near.toSeq), (3L, other.toSeq))
      .toDF("vec_id", "embedding")
    val df = Dedup.embeddingNearDup(emb, tau = 0.95)
    assertNoCrossProduct(df, "embeddingNearDup")
    val keys = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((0L, 1L)), "identical vectors missed")
    assert(keys.contains((0L, 2L)), "0.001-perturbed vector missed")
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L), "unrelated vector matched")
  }

  test("duplicatedSpans recovers the maximal copied passage in both docs") {
    val corpus = Seq(
      (1L, "a b c d e f g x y z"),
      (2L, "q r a b c d e f g w")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(corpus, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // shared run "a b c d e f g" spans tokens 0..6 in doc 1, 2..8 in doc 2
    assert(got == Set((1L, 0L, 6L, 7L), (2L, 2L, 8L, 7L)))
  }

  test("duplicatedSpans merges intra-document repetition into one island") {
    val corpus = Seq((1L, "m n m n m n")).toDF("doc_id", "text")
    // every 3-gram repeats within the doc: the whole doc is one span
    val got = Dedup.duplicatedSpans(corpus, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 0L, 5L)))
  }

  test("duplicatedSpans keeps disjoint copied regions as separate spans") {
    val corpus = Seq(
      (1L, "a b c d ZZ1 ZZ2 ZZ3 ZZ4 w x y z"),
      (2L, "a b c d q8 q9 r8 r9 w x y z")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(corpus, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    // "a b c d" (0..3) and "w x y z" (8..11) duplicate; middles differ
    assert(got == Set((1L, 0L, 3L), (1L, 8L, 11L),
      (2L, 0L, 3L), (2L, 8L, 11L)))
  }

  test("tokenJaccardPrefix equals the brute-force jaccard pair set") {
    // overlapping vocab slices force a range of true jaccards around tau
    val corpus = (0 until 30).map { i =>
      val toks = (0 until 12).map(j => s"w${(i / 3) * 2 + j}")
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val tau = 0.5
    val got = Dedup.tokenJaccardPrefix(corpus, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = (0 until 30).map { i =>
      i.toLong -> (0 until 12).map(j => s"w${(i / 3) * 2 + j}").toSet
    }.toMap
    val brute = (for {
      a <- 0L until 30L; b <- (a + 1) until 30L
      inter = sets(a).intersect(sets(b)).size.toDouble
      union = sets(a).union(sets(b)).size.toDouble
      if union > 0 && inter / union >= tau
    } yield (a, b)).toSet
    assert(brute.nonEmpty, "test corpus must produce matching pairs")
    assert(got == brute, "prefix filter must be lossless")
  }

  test("tokenJaccardPrefix computes shingles once: none in the pair plan") {
    // r15: docSets is materialized before the posting explode and the
    // two verification joins, so the shingle-producer expression must
    // be absent from the composed pair plan (it ran once at checkpoint
    // time); a regression re-attaching the lazy chain would re-shingle
    // the corpus per reference
    val corpus = (0 until 20).map { i =>
      (i.toLong, (0 until 10).map(j => s"t${i / 2}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val plan = Dedup.tokenJaccardPrefix(corpus, 0.5, ngram = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("graft_shingles"),
      s"pair plan re-computes shingles:\n${plan.take(4000)}")
  }

  test("tokenJaccardPrefix in shingle mode equals uncapped ngramJaccard") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val corpus = Seq(
      (1L, base), (2L, base),                          // identical
      (3L, base.replace("lazy", "sleepy")),            // near-dup
      (4L, "completely different text with no overlap at all in any shingle window here")
    ).toDF("doc_id", "text")
    val got = Dedup.tokenJaccardPrefix(corpus, 0.5, ngram = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(corpus, 0.5, dfMax = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((1L, 2L)) && exact.contains((1L, 3L)))
    assert(got == exact, "shingle-mode prefix join must equal exact jaccard")
  }

  test("evalPairs scores predictions against truth in exact ppm") {
    // truth: (1,2) (3,4) (5,6); predicted: (2,1) dup+flipped, (3,4), (7,8)
    // -> tp=2, fp=1, fn=1; p = 2/3, r = 2/3, f1 = 2pr/(p+r)
    val pred = Seq((2L, 1L), (1L, 2L), (3L, 4L), (7L, 8L))
      .toDF("a_id", "b_id")
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a_id", "b_id")
    val r = Dedup.evalPairs(pred, truth).collect()(0)
    assert(r.getAs[Long]("n_predicted") == 3L) // canonicalized + deduped
    assert(r.getAs[Long]("n_truth") == 3L)
    assert(r.getAs[Long]("tp") == 2L)
    assert(r.getAs[Long]("fp") == 1L && r.getAs[Long]("fn") == 1L)
    assert(r.getAs[Long]("precision_ppm") == 666666L)
    assert(r.getAs[Long]("recall_ppm") == 666666L)
    // 2*666666*666666 div 1333332 = 666666 exactly
    assert(r.getAs[Long]("f1_ppm") == 666666L)
  }

  test("evalPairs handles empty predictions without dividing by zero") {
    val pred = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val truth = Seq((1L, 2L)).toDF("a_id", "b_id")
    val r = Dedup.evalPairs(pred, truth).collect()(0)
    assert(r.getAs[Long]("n_predicted") == 0L)
    assert(r.getAs[Long]("precision_ppm") == 0L)
    assert(r.getAs[Long]("recall_ppm") == 0L && r.getAs[Long]("f1_ppm") == 0L)
  }

  test("cdcChunks: early insertion shifts one chunk, later chunks keep identity") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val docs2 = Seq((1L, text), (2L, "INSERTED " + text)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs2, divisor = 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("n_toks"), r.getAs[String]("checksum")))
    val a = chunks.filter(_._1 == 1L)
    val b = chunks.filter(_._1 == 2L)
    // reassembly: chunk token counts cover the doc exactly
    assert(a.map(_._3).sum == 200L)
    assert(b.map(_._3).sum == 201L)
    // content-defined boundaries: every chunk of doc 1 except the first
    // (which absorbed the insertion shift) reappears verbatim in doc 2
    val aSums = a.map(_._4).toSet
    val bSums = b.map(_._4).toSet
    val shared = (aSums & bSums).size
    assert(a.length >= 5, s"divisor 8 over 200 tokens must cut chunks: ${a.length}")
    assert(shared >= a.length - 1,
      s"insertion must shift at most one chunk: $shared of ${a.length} shared")
  }

  test("mergeClusters: label edges + new pairs == from-scratch components") {
    import spark.implicits._
    // chain 1-2-3 resolved first; new pairs 3-4 and 5-6 arrive later
    val oldPairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val newPairs = Seq((3L, 4L), (5L, 6L)).toDF("a_id", "b_id")
    val labels = Dedup.resolveClustersStar(oldPairs)
    val merged = Dedup.mergeClusters(labels, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.resolveClustersStar(
      oldPairs.unionByName(newPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === full)
    assert(merged === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L))
  }


  test("containmentJoin finds the quote pair jaccard suppresses") {
    import spark.implicits._
    val quoted = "alpha beta gamma delta epsilon"
    val long = "x1 x2 x3 x4 " + quoted + " y1 y2 y3 y4 y5 y6 y7 y8"
    val docs = Seq((1L, quoted), (2L, long), (3L, "unrelated words only here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentJoin(docs, tau = 0.8, ngram = 3).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Double]("containment")).toMap
    // every 3-gram of the quote appears in the long doc: C(1→2) = 1.0
    assert(pairs.keySet === Set((1L, 2L)))
    assert(pairs((1L, 2L)) === 1.0)
    // while jaccard at the same threshold sees nothing
    assert(Dedup.tokenJaccardPrefix(docs, tau = 0.8, ngram = 3)
      .collect().isEmpty)
  }

  test("containmentJoin emits both directions for identical docs") {
    import spark.implicits._
    val t = "one two three four five six"
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val pairs = Dedup.containmentJoin(docs, tau = 0.8, ngram = 3).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs === Set((1L, 2L), (2L, 1L)))
  }

  test("duplicationWeights gives each copy 1/n of the content's mass") {
    import spark.implicits._
    val docs = Seq((1L, "aa"), (2L, "aa"), (3L, "aa"), (4L, "bb"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicationWeights(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((3L, 333333L)) && out(2L) == ((3L, 333333L)) &&
      out(3L) == ((3L, 333333L)))
    assert(out(4L) == ((1L, 1000000L)))
  }

  test("repeatedSpans merges shared grams into maximal cross-doc spans") {
    import spark.implicits._
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("s", 12)   // 12 shared tokens -> 5 grams (w=8)
    val shared2 = words("z", 9)   // 9 shared tokens -> 2 grams
    val docs = Seq(
      // doc 1: shared passage at positions 4..15, second at 21..29
      (1L, words("a", 3) + " " + shared + " " + words("b", 5) + " " + shared2),
      // doc 2: the same passages at different offsets
      (2L, shared + " " + words("c", 6) + " " + shared2),
      // doc 3: a WITHIN-doc repeat only (8 tokens twice) — not flagged,
      // the df bar counts DISTINCT docs
      (3L, words("r", 8) + " " + words("r", 8)),
      (4L, words("d", 10)),
      // docs 5/6/7: doc 5's grams at positions 1 and 4 are shared with
      // DIFFERENT partners (positions 2-3 unique) — the overlapping
      // intervals [1,8] and [4,11] must union into ONE span [1,11]
      (5L, words("p", 3) + " " + words("q", 5) + " " + words("u", 3)),
      (6L, words("p", 3) + " " + words("q", 5)),
      (7L, words("q", 5) + " " + words("u", 3))).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // doc 1: tokens 4..15 (one maximal span from gram positions 4..8)
    // and 21..29 (gram positions 21..22)
    assert(out.contains((1L, 4L, 15L, 12L)))
    assert(out.contains((1L, 21L, 29L, 9L)))
    // doc 2: same passages at its own offsets
    assert(out.contains((2L, 1L, 12L, 12L)))
    assert(out.contains((2L, 19L, 27L, 9L)))
    assert(!out.exists(_._1 == 3L), "within-doc repeats are not cross-doc")
    assert(!out.exists(_._1 == 4L))
    // overlapping intervals shared with different partners: one span
    assert(out.contains((5L, 1L, 11L, 11L)),
      s"overlapping [1,8] and [4,11] must union: ${out.filter(_._1 == 5L)}")
    assert(out.contains((6L, 1L, 8L, 8L)))
    assert(out.contains((7L, 1L, 8L, 8L)))
    assert(out.size == 7, s"exactly the seven planted spans: $out")
  }

  test("removeRepeatedSpans cuts exactly the detected spans") {
    import spark.implicits._
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("s", 12)
    val shared2 = words("z", 9)
    val docs = Seq(
      (1L, words("a", 3) + " " + shared + " " + words("b", 5) + " " + shared2),
      (2L, shared + " " + words("c", 6) + " " + shared2),
      (3L, words("r", 8) + " " + words("r", 8)),
      (4L, words("d", 10))).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((words("a", 3) + " " + words("b", 5), 8L, 21L)),
      s"doc 1 keeps only its private tokens: ${out(1L)}")
    assert(out(2L) == ((words("c", 6), 6L, 21L)))
    assert(out(3L) == ((words("r", 8) + " " + words("r", 8), 16L, 0L)),
      "within-doc repeats are never cut")
    assert(out(4L) == ((words("d", 10), 10L, 0L)))
  }

  test("thresholdSweep counts tp/fp/fn per cut and elects the best") {
    // scored: true pair at .9, true pair at .5, false pair at .6;
    // truth additionally holds (7,8) that the scorer never surfaced
    val scored = Seq((1L, 2L, 0.9), (3L, 4L, 0.5), (5L, 6L, 0.6))
      .toDF("a_id", "b_id", "jaccard")
    val truth = Seq((1L, 2L), (3L, 4L), (7L, 8L)).toDF("a_id", "b_id")
    val out = Dedup.thresholdSweep(scored, truth, Seq(40, 60, 80))
      .collect()
      .map(r => r.getAs[Long]("thr_e2") ->
        (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          r.getAs[Long]("f1_ppm"), r.getAs[Boolean]("is_best"))).toMap
    // t=.4: tp 2, fp 1, fn 1 → F1 = 4/6; t=.6: tp 1, fp 1, fn 2 →
    // F1 = 2/5; t=.8: tp 1, fp 0, fn 2 → F1 = 2/4
    assert(out(40L) == ((2L, 1L, 1L, 666666L, true)))
    assert(out(60L) == ((1L, 1L, 2L, 400000L, false)))
    assert(out(80L) == ((1L, 0L, 2L, 500000L, false)))
  }

  test("keepBest elects the richest doc per cluster, min-id on ties") {
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 5L))
      .toDF("doc_id", "q")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster_id")
    val r = Dedup.keepBest(docs, clusters, "q").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Boolean]("keep"), x.getAs[Long]("canonical_id"))).toMap
    // cluster 1: docs 2 and 3 tie at q=30 → min id 2 wins
    assert(r(1L) == ((false, 2L)))
    assert(r(2L) == ((true, 2L)))
    assert(r(3L) == ((false, 2L)))
    assert(r(4L) == ((true, 4L))) // singleton keeps itself
  }

  test("noveltyCurve: only strictly-earlier batches make a doc a dup") {
    val staged = Seq(
      (0L, "a"), (0L, "b"), (0L, "b"), // within-batch dup does NOT count
      (1L, "a"), (1L, "c"),            // 'a' seen in batch 0 → dup
      (2L, "a"), (2L, "c"), (2L, "d")  // 'a', 'c' dups; 'd' novel
    ).toDF("batch", "text")
    val out = Dedup.noveltyCurve(staged).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(out(0L) == ((3L, 0L, 1000000L)))
    assert(out(1L) == ((2L, 1L, 500000L)))
    assert(out(2L) == ((3L, 2L, 333333L)), "the curve decays as re-crawls repeat")
  }
}
