package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Log

/** Deduplication operators over a `documents(doc_id, text, ...)` corpus.
  *
  * Scale invariant shared by every near-dup variant: candidate generation is
  * a *bucketed equi-join* (LSH band, simhash chunk, shingle inverted index)
  * — never an all-pairs product. At 100 TB the only shuffles are on bucket
  * keys, and document-frequency pruning bounds the fanout of any single
  * bucket.
  */
object Dedup {

  /** Word 3-gram shingle set of a document (empty when < 3 tokens).
    * Native single-pass expression — see
    * [[graft.functions.WordShingles]] for why the lambda formulation is
    * pathological under projection collapse.
    */
  def shinglesCol(textCol: String = "text", n: Int = 3): Column =
    expr(s"graft_shingles($textCol, $n)").alias("shingles")

  private def withShingles(docs: DataFrame): DataFrame =
    docs.withColumn("shingles", shinglesCol())

  /** Exact dedup: content hash → keep the lowest doc_id per hash.
    * Map-side partial aggregation; one shuffle on the 64-hex hash.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .withColumn("checksum", sha2(col("text"), 256))
      .groupBy(col("checksum"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("checksum"), col("n_copies"))

  /** CROSS-document repeated-substring spans — the leakage/contamination
    * flavor of [[duplicatedSpans]] (ExactSubstr family,
    * arXiv:2107.06499): every maximal token span whose w-grams each
    * occur in ≥ `minDocs` DISTINCT documents. Where duplicatedSpans
    * counts ANY repetition (a chorus repeated within one song is
    * flagged), this op's df counts distinct docs — within-doc repeats
    * are the document's own structure and leak nothing; only
    * cross-document copying matters for train/eval splits and
    * benchmark contamination. Overlapping/adjacent repeated gram
    * intervals merge by the running-max-end island rule (a copied
    * 20-token passage is ONE span per side, and two overlapping
    * passages shared with DIFFERENT partners still merge). Positions
    * are 1-based token indices, span ends inclusive.
    *
    * Scale shape — deliberately JOIN-FREE at the pair level: posting
    * explode (one row per token position), ONE shuffle keyed on the
    * gram for the distinct-doc count, a semi-join back on the same key
    * (ReusedExchange), then a per-doc islands window. Cost is linear in
    * corpus tokens regardless of how many documents share a passage —
    * where pair-level dedup is quadratic in the duplication factor
    * (the minHashLshStar lesson), span detection never pairs documents
    * at all.
    */
  def repeatedSpans(docs: DataFrame, w: Int = 8,
                    minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w >= 2 && minDocs >= 2)
    val grams = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= w)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(t) - ${w - 1}),
           |  i -> struct(CAST(i AS BIGINT) AS pos,
           |    array_join(slice(t, i, $w), ' ') AS gram))""".stripMargin))
        .as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))
    val repeatedGrams = grams.select(col("gram"), col("doc_id")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select(col("gram"))
    // interval union (the duplicatedSpans island rule): a new span
    // starts when this gram begins past the running max end + 1
    val w1 = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    grams.join(repeatedGrams, Seq("gram"), "left_semi")
      .withColumn("prev_end", max(col("pos") + lit((w - 1).toLong))
        .over(w1.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("island",
        when(col("prev_end").isNull || col("prev_end") + 1 < col("pos"), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("island")).over(w1))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit((w - 1).toLong)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("n_tokens"))
  }

  /** The span-removal TRANSFORM composing [[repeatedSpans]] — C4-style:
    * cut every cross-document repeated span out of the text and return
    * the cleaned documents plus kept/dropped token counts. A token is
    * dropped iff some repeated w-gram starting at or before it still
    * covers it — decided by a running max of gram-interval ends over
    * the per-doc position order (the interval-coverage sweep), so the
    * whole removal is ONE doc-keyed window after the same
    * gram-df/semi-join pipeline as the detector: no span table is
    * joined back, no per-span fan-out. Docs shorter than w tokens pass
    * through untouched.
    */
  def removeRepeatedSpans(docs: DataFrame, w: Int = 8,
                          minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w >= 2 && minDocs >= 2)
    val toks = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .select(col("doc_id"),
        posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("tok"))
    val grams = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= w)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(t) - ${w - 1}),
           |  i -> struct(CAST(i AS BIGINT) AS pos,
           |    array_join(slice(t, i, $w), ' ') AS gram))""".stripMargin))
        .as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))
    val repeatedGrams = grams.select(col("gram"), col("doc_id")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= minDocs)
      .select(col("gram"))
    // union-tag sweep: gram rows (tag 0) carry their interval end; a
    // token (tag 1) is covered iff the running max end at its position
    // reaches it. At equal pos the gram sorts first (its interval
    // includes its own start token).
    val marks = grams.join(repeatedGrams, Seq("gram"), "left_semi")
      .select(col("doc_id"), col("pos"), lit(0).as("tag"),
        (col("pos") + lit((w - 1).toLong)).as("end"),
        lit(null).cast("string").as("tok"))
    val sweep = Window.partitionBy(col("doc_id"))
      .orderBy(col("pos"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .select(col("doc_id"), col("pos"), lit(1).as("tag"),
        lit(null).cast("long").as("end"), col("tok"))
      .unionByName(marks)
      .withColumn("cov_end", max(col("end")).over(sweep))
      .filter(col("tag") === 1)
      .withColumn("kept",
        col("cov_end").isNull || col("cov_end") < col("pos"))
      .groupBy(col("doc_id"))
      .agg(
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN kept THEN " +
            "struct(pos, tok) END)), s -> s.tok)"), " ").as("clean_text"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dropped"))
  }

  /** Soft-dedup training weights: every copy survives but carries
    * weight 1/n_copies, so each distinct content contributes total mass
    * 1 to the training mix — the de-duplication alternative when hard
    * dropping would lose provenance/source diversity (the copies may
    * differ in metadata even when text is identical). Integer ppm
    * (`1e6 div n`) keeps the weight engine-exact. One checksum-keyed
    * window whose partitions are duplicate-cluster-sized; the corpus
    * shuffles once on the content hash.
    */
  def duplicationWeights(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("checksum", sha2(col("text"), 256))
      .withColumn("n_copies",
        count(lit(1)).over(Window.partitionBy("checksum")))
      .select(col("doc_id"), col("n_copies"),
        expr("1000000L div n_copies").as("weight_ppm"))
  }

  /** Per-group duplication profile: doc/unique/duplicate counts and the
    * within-group duplicate rate — the "which source is flooding us with
    * copies" report that decides per-source sampling weights. Duplicates
    * are counted WITHIN each group (a checksum shared across groups is
    * unique in each). Two partial-aggregated shuffles, output
    * cardinality = |groups|.
    */
  def dedupReport(docs: DataFrame, groupCol: String = "source"): DataFrame =
    docs
      .withColumn("checksum", sha2(col("text"), 256))
      .groupBy(col(groupCol), col("checksum"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(groupCol))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_unique"),
        (sum(col("n")) - count(lit(1))).as("n_dup"))
      .withColumn("dup_rate",
        col("n_dup").cast("double") / col("n_docs").cast("double"))

  /** Exact n-gram Jaccard over a df-pruned shingle space.
    *
    * Semantics (mirrored exactly by the DuckDB oracle): drop shingles with
    * document frequency > `dfMax` (stop-shingles that would explode the
    * inverted index), then for every pair sharing >=1 surviving shingle
    * compute J = |A∩B| / |A∪B| over surviving shingles and keep J >= `tau`.
    *
    * Plan shape: explode → df-count (partial agg) → self-equi-join on
    * shingle → pair count agg. All shuffles are on shingle / pair keys.
    */
  def ngramJaccard(docs: DataFrame, tau: Double = 0.5, dfMax: Int = 25): DataFrame = {
    val posting = withShingles(docs)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    // df-pruning via count-over-window: ONE shuffle on shingle computes
    // the document frequency and leaves the postings partitioned by
    // shingle for the pair join (ReusedExchange on both sides). Two
    // measured-worse alternatives, kept for the record: groupBy +
    // SEMI-join on the surviving set (3x slower — two extra posting
    // shuffles, duplicated across the self-join) and broadcast ANTI-join
    // against the small stop-shingle set (1.5x slower at sf0.1 — the
    // self-join loses the window's reusable shingle partitioning and
    // re-shuffles the postings anyway).
    val pruned = posting
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
      .filter(col("df") <= dfMax)
      .drop("df")
    val sizes = pruned.groupBy("doc_id").agg(count(lit(1)).as("set_size"))
    val pairs = pruned.as("l")
      .join(pruned.as("r"), col("l.shingle") === col("r.shingle") &&
        col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("set_size", "a_size"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("set_size", "b_size"), "b_id")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("a_size") + col("b_size") - col("common")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** TF-WEIGHTED Jaccard near-dup — [[ngramJaccard]] with multiplicity:
    * J_w(A,B) = Σ_t min(tf_A, tf_B) / Σ_t max(tf_A, tf_B) over 3-gram
    * term frequencies (`graft_ngrams` — ALL grams, duplicates kept),
    * the bag-of-n-grams similarity that set-Jaccard
    * flattens (a doc that repeats one template line 50 times and one
    * that says it once are "identical" to the set form; the weighted
    * form sees the mass). Exact and division-free until the close:
    * Σ max == size_A + size_B − Σ min (summing max over the union), so
    * the ONE posting join computing Σ min(tf, tf) per pair closes the
    * whole similarity — no second pass, no per-pair re-join (the
    * jaccard_prefix rule), and the ppm emission is portable integer
    * division.
    *
    * Scale shape: identical to [[ngramJaccard]] — tf profiles from one
    * (doc, token) partial agg, df-pruning via the count-over-window
    * form (df counts DOCS, not occurrences — tf profiles are already
    * one row per (doc, token)), pair aggregation keyed on the token.
    * The same duplication-quadratic pair-OUTPUT caveat applies at low
    * τ on undeduped corpora — run after exact dedup (PLANS r10).
    */
  def weightedJaccard(docs: DataFrame, tauPpm: Long = 300000L,
                      dfMax: Int = 25): DataFrame = {
    val tf = docs
      .select(col("doc_id"),
        explode(expr("graft_ngrams(text, 3)")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val pruned = tf
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("token")))
      .filter(col("df") <= dfMax)
      .drop("df")
    val sizes = pruned.groupBy("doc_id").agg(sum(col("tf")).as("w_size"))
    val pairs = pruned.as("l")
      .join(pruned.as("r"), col("l.token") === col("r.token") &&
        col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
      .agg(sum(least(col("l.tf"), col("r.tf"))).as("common_w"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("w_size", "a_w"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("w_size", "b_w"), "b_id")
      .withColumn("jw_ppm", expr(
        "1000000L * common_w div (a_w + b_w - common_w)"))
      .filter(col("jw_ppm") >= tauPpm)
      .select(col("a_id"), col("b_id"), col("common_w"), col("a_w"),
        col("b_w"), col("jw_ppm"))
  }

  /** Incremental exact dedup: a new batch against an existing checksum
    * index — the rolling-ingestion shape (daily crawl vs everything
    * already in the corpus). Within-batch dedup first (keep lowest
    * doc_id per hash), then a LEFT ANTI join against the index: the only
    * shuffles are keyed on the checksum, and the index side streams —
    * nothing is collected or broadcast, so a multi-billion-row index is
    * fine (at scale, bucket both sides on `checksum` to make the anti
    * join co-located and shuffle-free; see sources.Bucketing).
    *
    * Output: the new-batch survivors (doc_id, checksum, n_copies) —
    * exactly [[exact]]'s contract restricted to genuinely novel content.
    */
  def incrementalExact(newDocs: DataFrame, knownChecksums: DataFrame): DataFrame =
    exact(newDocs)
      .join(knownChecksums.select(col("checksum")), Seq("checksum"), "left_anti")
      .select(col("doc_id"), col("checksum"), col("n_copies"))

  // --- Bucketed dedup indexes ---------------------------------------------
  // The rolling-ingestion endgame at 100 TB: the corpus-side index is far
  // larger than any day's batch and joined EVERY day, so it should never
  // shuffle again after being written. Persisting it bucketed on the join
  // key makes the daily anti/equi join shuffle ONLY the batch (Catalyst
  // plans the index side as a bucketed scan with zero Exchange —
  // BucketingSpec asserts this on both index shapes).

  /** Persist the exact-dedup checksum index as a managed parquet table
    * bucketed+sorted on `checksum`. Rewrite (or append a compacted delta
    * with the same bucket spec) per ingestion cycle.
    */
  def writeChecksumIndex(docs: DataFrame, table: String,
                         buckets: Int = 32): Unit =
    graft.sources.Bucketing.writeBucketed(
      exact(docs).select(col("checksum")), table, "checksum", buckets)

  /** [[incrementalExact]] against a [[writeChecksumIndex]] table: the
    * LEFT ANTI join shuffles only the (already checksum-partitioned)
    * batch aggregate; the index side is a co-located bucketed scan.
    */
  def incrementalExactIndexed(spark: org.apache.spark.sql.SparkSession,
                              newDocs: DataFrame, table: String): DataFrame =
    incrementalExact(newDocs, spark.table(table))

  /** Cross-document sentence-level duplication census — C4's
    * sentence-granular dedup signal one level below
    * [[paragraphDedup]]: a sentence repeated across documents marks
    * boilerplate, quotation chains, or template text that
    * paragraph/document dedup both miss (the repeated unit is smaller
    * than a paragraph and embedded in otherwise-unique text). Expects
    * a pre-segmented `(doc_id, sentence)` frame; emits the `topK`
    * most-repeated cross-doc sentences with occurrence and distinct-doc
    * counts plus the earliest carrier (the survivorship hook).
    *
    * Scale shape: ONE partial-aggregated groupBy on the sentence text
    * (shuffle cardinality = distinct sentences), a df filter, and a
    * TakeOrdered top-k — the rank window runs over ≤ topK rows, never
    * the sentence vocabulary.
    */
  def sentenceDuplication(sentences: DataFrame, minDocs: Long = 2L,
                          topK: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dups = sentences
      .groupBy(col("sentence"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(desc("n_occurrences"), desc("n_docs"), asc("sentence"))
      .limit(topK)
    dups.withColumn("rank", row_number().over(
        Window.orderBy(desc("n_occurrences"), desc("n_docs"),
          asc("sentence"))).cast("long"))
      .select(col("rank"), col("sentence"), col("n_docs"),
        col("n_occurrences"), col("first_doc"))
  }

  // --- MinHash + LSH ------------------------------------------------------

  /** Fixed affine-permutation parameters for minhash signatures. Seeds are
    * compile-time constants so signatures are reproducible across runs and
    * cluster sizes.
    */
  val MinHashPrime: Long = 2147483647L // 2^31 - 1
  def minHashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map(i => (2L * i + 1, (i.toLong * 104729 + 12345) % MinHashPrime))

  /** Banded minhash signatures — (doc_id, sig, band, bucket) — the shared
    * projection under [[minHashLsh]]-family candidate generation, exposed
    * package-private so the streaming twin
    * ([[graft.streaming.EventStreams.streamingNearDup]]) buckets arriving
    * docs with the exact batch signature pipeline (a stateless
    * projection, legal on a streaming DataFrame). `carry` names input
    * columns to keep alongside the signature (e.g. the event-time column
    * a streaming consumer's watermark/TTL rides on).
    */
  private[graft] def bandedSignatures(docs: DataFrame, numHashes: Int = 32,
                                      bands: Int = 8,
                                      carry: Seq[String] = Nil): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    withShingles(docs)
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", expr(s"graft_minhash(shingles, $numHashes)"))
      .select(col("doc_id") +: col("sig") +: carry.map(col) :+
        posexplode(expr(s"graft_bandbuckets(sig, $bands)"))
          .as(Seq("band", "bucket")): _*)
  }

  /** Near-dup candidate pairs via MinHash-LSH banding.
    *
    * numHashes k, bands b, rows r = k/b. Two docs land in the same bucket
    * for a band when their signature slice matches exactly; candidates are
    * generated by an equi-join on (band, slice) — shuffle on bucket keys,
    * no cross product. Pairs are kept when the full-signature agreement
    * fraction >= `tau` (the unbiased Jaccard estimate).
    *
    * SCALE FENCE (default ON): a D-copy duplicate family puts all D docs
    * in the same buckets and the all-pairs join emits C(D,2) rows —
    * quadratic in the OUTPUT, the one cost no join strategy fixes
    * (measured 148× at 100× data on a 100-dup corpus). Buckets with df >
    * `hotBucket` therefore fall back to star edges against the bucket-min
    * representative ([[minHashLshStar]] semantics: identical connected
    * components, O(D) edges); organic corpora never trip it (measured
    * bucket-df max: 3 at sf0.01, 11 at sf0.1 — the fence only fires on
    * pathological duplicate families). Pass `hotBucket = Int.MaxValue`
    * to opt in to the exact full pair set ON A DEDUPED OR BOUNDED CORPUS
    * — the unfenced form is quadratic by construction.
    */
  def minHashLsh(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
                 tau: Double = 0.5, hotBucket: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    if (hotBucket != Int.MaxValue)
      return minHashLshStar(docs, numHashes, bands, tau, hotBucket)
    val sigged = withShingles(docs)
      .filter(size(col("shingles")) > 0)
      // native single-pass signature (graft.functions.MinHashSignature);
      // the equivalent transform/array_min lambda pipeline is ~10x slower
      .withColumn("sig", expr(s"graft_minhash(shingles, $numHashes)"))
      .select(col("doc_id"), col("sig"))
    val banded = sigged.select(
      col("doc_id"), col("sig"),
      // native one-pass band hashing (graft.functions.BandBuckets); the
      // transform/slice/concat_ws form built `bands` strings per row
      posexplode(expr(s"graft_bandbuckets(sig, $bands)"))
        .as(Seq("band", "bucket"))
    )
    val cands = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"),
        col("l.sig").as("a_sig"), col("r.sig").as("b_sig"))
      .dropDuplicates("a_id", "b_id")
    cands
      // native agreement count (graft_eqfrac): same arithmetic as the
      // zip_with/filter lambda chain, one tight loop per candidate pair
      .withColumn("est_jaccard", expr("graft_eqfrac(a_sig, b_sig)"))
      .filter(col("est_jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("est_jaccard"))
  }

  /** Incremental MinHash-LSH: near-dup pairs for a NEW BATCH against an
    * already-ingested corpus — the rolling-crawl production shape at
    * 100 TB, where re-running [[minHashLsh]]'s self-join over the whole
    * corpus per day is absurd and [[crossMinHash]]'s broadcast contract
    * (reference side fits in memory) doesn't hold for a full day's crawl.
    * Both sides band-bucket as usual; candidates are (a) the batch's own
    * within-batch bucket self-join and (b) a batch⋈index equi-join on
    * (band, bucket) — both keyed shuffles where the INDEX side streams
    * (at scale, persist the index's banded postings partitioned by
    * (band, bucket) and only the batch shuffles; nothing is broadcast,
    * nothing is quadratic in corpus size). Verification is the same
    * full-signature agreement filter, so the result is EXACTLY
    * [[minHashLsh]] over (batch ∪ index) restricted to pairs touching at
    * least one batch doc — the invariant DedupSpec asserts and the
    * oracle re-derives. Output: (a_id, b_id, via) with `via` = 'batch'
    * for batch-internal pairs, 'index' for batch-vs-corpus pairs.
    * Batch and index id spaces must be DISJOINT: a doc_id present on both
    * sides would meet itself in every bucket and emit a degenerate
    * self-pair (est 1.0) — the vsIndex join guards with `l != r`, so such
    * a doc contributes only its genuine cross pairs.
    */
  def incrementalMinHash(newDocs: DataFrame, indexDocs: DataFrame,
                         numHashes: Int = 32, bands: Int = 8,
                         tau: Double = 0.5): DataFrame =
    incrementalMinHashFrom(bandedSignatures(newDocs, numHashes, bands),
      bandedSignatures(indexDocs, numHashes, bands), tau)

  /** Persist a corpus's banded minhash postings — (doc_id, sig, band,
    * bucket), the [[bandedSignatures]] projection — as a managed parquet
    * table bucketed on (band, bucket): the daily
    * [[incrementalMinHashIndexed]] equi-join then shuffles only the
    * batch's postings, and the corpus-side signature scan is never
    * recomputed or re-shuffled.
    */
  def writeBandedIndex(docs: DataFrame, table: String, numHashes: Int = 32,
                       bands: Int = 8, buckets: Int = 32): Unit =
    graft.sources.Bucketing.writeBucketed(
      bandedSignatures(docs, numHashes, bands), table,
      "band", buckets, "bucket")

  /** [[incrementalMinHash]] against a [[writeBandedIndex]] table (same
    * signature/band parameters as at write time). Identical output;
    * the index side is a co-located bucketed scan with zero Exchange.
    */
  def incrementalMinHashIndexed(spark: org.apache.spark.sql.SparkSession,
                                newDocs: DataFrame, table: String,
                                numHashes: Int = 32, bands: Int = 8,
                                tau: Double = 0.5): DataFrame =
    incrementalMinHashFrom(bandedSignatures(newDocs, numHashes, bands),
      spark.table(table), tau)

  private[graft] def incrementalMinHashFrom(nb: DataFrame, ib: DataFrame,
                                            tau: Double): DataFrame = {
    val withinBatch = nb.as("l")
      .join(nb.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"),
        col("l.sig").as("a_sig"), col("r.sig").as("b_sig"),
        lit("batch").as("via"))
    val vsIndex = nb.as("l")
      .join(ib.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") =!= col("r.doc_id"))
      .select(least(col("l.doc_id"), col("r.doc_id")).as("a_id"),
        greatest(col("l.doc_id"), col("r.doc_id")).as("b_id"),
        col("l.sig").as("a_sig"), col("r.sig").as("b_sig"),
        lit("index").as("via"))
    withinBatch.unionByName(vsIndex)
      .dropDuplicates("a_id", "b_id")
      .withColumn("est_jaccard", expr("graft_eqfrac(a_sig, b_sig)"))
      .filter(col("est_jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("via"), col("est_jaccard"))
  }

  /** Web-scale variant of [[minHashLsh]] with hot-bucket star fallback.
    *
    * A corpus with a massive duplicate cluster (the normal case on web
    * data: one boilerplate page copied D times) puts all D docs in the
    * same band buckets, and the all-pairs bucket join emits C(D,2) pairs —
    * quadratic in the cluster size, in the OUTPUT itself, so no join
    * strategy can save it. When the pairs feed cluster resolution
    * (connected components), the full clique is redundant: a STAR — every
    * bucket member paired with the bucket's minimum doc_id — preserves
    * exactly the same connectivity in O(D) edges.
    *
    * Buckets with df <= `hotBucket` keep the exact all-pairs behavior;
    * hotter buckets emit star edges to the bucket representative (each
    * still passing the full-signature agreement filter, so a hot-bucket
    * member whose true similarity to the representative is below tau is
    * dropped — the same probabilistic-recall class as LSH itself).
    * The df window and the representative join share one (band, bucket)
    * partitioning. Since r14 this IS the default [[minHashLsh]] path
    * (hotBucket = 64); the exact full pair set is the explicit opt-in
    * `minHashLsh(..., hotBucket = Int.MaxValue)`.
    */
  def minHashLshStar(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
                     tau: Double = 0.5, hotBucket: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val banded = withShingles(docs)
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", expr(s"graft_minhash(shingles, $numHashes)"))
      .select(col("doc_id"), col("sig"),
        posexplode(expr(s"graft_bandbuckets(sig, $bands)"))
          .as(Seq("band", "bucket")))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
    val cold = banded.filter(col("df") <= hotBucket)
    val coldPairs = cold.as("l")
      .join(cold.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"),
        col("l.sig").as("a_sig"), col("r.sig").as("b_sig"))
    val hot = banded.filter(col("df") > hotBucket)
    val reps = hot.groupBy("band", "bucket")
      .agg(min_by(struct(col("doc_id"), col("sig")), col("doc_id")).as("rep"))
    val starEdges = hot.join(reps, Seq("band", "bucket"))
      .filter(col("doc_id") > col("rep.doc_id"))
      .select(col("rep.doc_id").as("a_id"), col("doc_id").as("b_id"),
        col("rep.sig").as("a_sig"), col("sig").as("b_sig"))
    coldPairs.unionAll(starEdges)
      .dropDuplicates("a_id", "b_id")
      .withColumn("est_jaccard", expr("graft_eqfrac(a_sig, b_sig)"))
      .filter(col("est_jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("est_jaccard"))
  }

  /** Cross-corpus near-dup matching — the decontamination join: find
    * corpus documents that near-duplicate any document of a (small)
    * reference set, e.g. an eval benchmark, before training data ships.
    * The same fixed-seed signatures and banding as [[minHashLsh]], so
    * both sides bucket identically; the reference postings BROADCAST
    * (benchmark-sized) against the corpus postings, so the corpus never
    * shuffles — one scan, one broadcast-hash join, the full-signature
    * agreement check, and a per-pair dedup. At 100 TB the cost is the
    * corpus signature scan; the benchmark side is constant.
    * Returns (ref_id, doc_id, est_jaccard).
    */
  def crossMinHash(refDocs: DataFrame, corpus: DataFrame,
                   numHashes: Int = 32, bands: Int = 8,
                   tau: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def banded(df: DataFrame) = withShingles(df)
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", expr(s"graft_minhash(shingles, $numHashes)"))
      .select(col("doc_id"), col("sig"),
        posexplode(expr(s"graft_bandbuckets(sig, $bands)"))
          .as(Seq("band", "bucket")))
    val ref = banded(refDocs).select(col("doc_id").as("ref_id"),
      col("sig").as("ref_sig"), col("band"), col("bucket"))
    banded(corpus)
      .join(broadcast(ref), Seq("band", "bucket"))
      .select(col("ref_id"), col("doc_id"), col("ref_sig"), col("sig"))
      .dropDuplicates("ref_id", "doc_id")
      .withColumn("est_jaccard", expr("graft_eqfrac(ref_sig, sig)"))
      .filter(col("est_jaccard") >= tau)
      .select(col("ref_id"), col("doc_id"), col("est_jaccard"))
  }

  // --- SimHash ------------------------------------------------------------

  /** 64-bit SimHash over token xxhash64 values, then near-dup pairs whose
    * Hamming distance <= `maxHamming`, found via the chunk trick: split the
    * 64-bit signature into `chunks` pieces; any pair within distance d <
    * chunks must agree on >=1 chunk, so candidates come from an equi-join
    * on (chunk index, chunk value).
    */
  def simHash(docs: DataFrame, maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    val chunkBits = 64 / chunks
    val sigged = docs
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) > 0)
      .withColumn("simhash", expr("graft_simhash(array_distinct(toks))"))
      .select(col("doc_id"), col("simhash"))
    val chunked = sigged.select(
      col("doc_id"), col("simhash"),
      posexplode(expr(
        s"transform(sequence(0, ${chunks - 1}), c -> " +
          s"(simhash >> (c * $chunkBits)) & ${(1L << chunkBits) - 1})"
      )).as(Seq("chunk", "cval"))
    )
    chunked.as("l")
      .join(chunked.as("r"),
        col("l.chunk") === col("r.chunk") && col("l.cval") === col("r.cval") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"),
        expr("bit_count(l.simhash ^ r.simhash)").cast("long").as("hamming"))
      // hamming filter BEFORE the distinct: the cheap per-row predicate
      // prunes the candidate fan-out ahead of the dedup shuffle
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Resolve near-dup pairs into duplicate CLUSTERS (connected
    * components): every document adopts the minimum doc_id reachable
    * through the pair graph, so each cluster is identified by its lowest
    * member. Iterative min-label propagation — per iteration one
    * edge⋈label join + per-node min aggregation, all distributed; the
    * driver only checks convergence. Iterations needed = graph diameter;
    * duplicate clusters are small and dense in practice, and `maxIter`
    * bounds pathological chains (at web scale swap in the
    * large-star/small-star variant, which converges in O(log n) rounds).
    *
    * Input: (a_id, b_id) pairs from any near-dup operator. Output:
    * (doc_id, cluster_id) for every document that appears in a pair.
    */
  def resolveClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialize the pair generation ONCE before mirroring: both union
    // branches would otherwise recompute the (expensive) upstream
    // near-dup join during the first pass over the edge list
    val directed = pairs.select(col("a_id").cast("long").as("src"),
      col("b_id").cast("long").as("dst")).cache()
    directed.count()
    val edges = directed
      .union(directed.select(col("dst").as("src"), col("src").as("dst")))
      .cache()
    // localCheckpoint (not cache!) EVERY round: caching keeps the
    // LOGICAL plan, which the self-join grows ~4x per round —
    // exponential analysis cost that OOMs the driver by ~iteration 10.
    // Checkpointing truncates lineage so every round starts from a flat
    // plan. Chaining rounds lazily between barriers was MEASURED WORSE
    // (12.6s vs 4.9s at sf0.1): the round references its input labels
    // in four join branches, and without a materialization in between
    // each branch re-executes the whole previous round — Spark reuses
    // exchanges, not arbitrary common subplans.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val next = propagationRound(labels, edges).localCheckpoint(true)
      // convergence comes from the round's in-plan `changed` flag
      // (propagation is a deterministic function of the labels: a round
      // that changes nothing is a fixed point) — a filter over the
      // just-checkpointed label table, never an old-vs-new shuffle join
      done = next.filter(col("changed")).limit(1).count() == 0L
      labels = next.drop("changed")
      iter += 1
    }
    Log.getLogger("graft.Dedup").info(
      s"resolveClusters converged=${done} after $iter iteration(s)")
    edges.unpersist(blocking = false)
    directed.unpersist(blocking = false)
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** One label-propagation round — hash-min then pointer-jumping — as a
    * lazily-planned DataFrame of (id, label, changed). Exposed
    * (package-private) because [[resolveClusters]] executes eagerly behind
    * `localCheckpoint`, so a registered-query plan sweep only ever sees
    * the post-checkpoint scan; the per-round join topology (the part that
    * could degenerate into a cross product) is asserted directly on this
    * method's plan in DedupSpec.
    */
  private[graft] def propagationRound(labels: DataFrame,
                                      edges: DataFrame): DataFrame = {
    // hash-min step: adopt the minimum among self and neighbors; the
    // pre-round label rides along so the round can emit its own
    // convergence flag
    val nbrMin = edges
      .join(labels.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
      .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
    val hashMin = labels
      .join(nbrMin, labels("id") === nbrMin("src"), "left")
      .select(col("id"), col("label").as("old_label"),
        least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
    // pointer-jumping step: follow the label chain one hop
    // (label := label(label)) — turns O(diameter) hash-min rounds into
    // O(log diameter)
    val jumped = coalesce(col("llabel"), col("a.label"))
    hashMin.as("a")
      .join(hashMin.select(col("id").as("lid"), col("label").as("llabel")),
        col("a.label") === col("lid"), "left")
      .select(col("a.id").as("id"), jumped.as("label"),
        (jumped =!= col("a.old_label")).as("changed"))
  }

  /** Connected components via alternating large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the web-scale alternative to [[resolveClusters]]'s
    * hash-min propagation: converges in O(log n) rounds on ANY graph
    * (hash-min needs O(diameter) rounds, which bites on long chains),
    * with every step an equi-join/aggregation on node keys.
    *
    *  - large-star: every node u connects its strictly-larger neighbors
    *    to m(u) = min(Γ(u) ∪ u)
    *  - small-star: every node u connects its not-larger neighbors and
    *    itself to m(u)
    *
    * The fixed point is a forest of stars rooted at each component's
    * minimum id. Same contract as [[resolveClusters]]: input (a_id,
    * b_id) pairs, output (doc_id, cluster_id) for every id appearing in
    * a pair (self-loop-only ids label themselves).
    */
  def resolveClustersStar(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    val undirected = pairs.select(col("a_id").cast("long").as("a"),
      col("b_id").cast("long").as("b")).cache()
    undirected.count() // materialize the (possibly expensive) pair source once
    val nodes = undirected.select(col("a").as("id"))
      .union(undirected.select(col("b").as("id"))).distinct()
      .localCheckpoint(true)
    // canonical (lo, hi) storage, self-loops dropped
    var edges = undirected
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct().localCheckpoint(true)
    undirected.unpersist(blocking = false)

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("lo").as("a"), col("hi").as("b"))
        .union(e.select(col("hi").as("a"), col("lo").as("b")))
      val mins = sym.groupBy(col("a")).agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("mn"), col("a")).as("m"))
      sym.join(mins, Seq("a"))
        .filter(col("b") > col("a"))
        .select(col("m").as("lo"), col("b").as("hi")) // m <= a < b
        .filter(col("lo") =!= col("hi")).distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(col("hi").as("a"), col("lo").as("b"))
      val mins = oriented.groupBy(col("a")).agg(min(col("b")).as("m"))
      oriented.join(mins, Seq("a"))
        .select(col("b").as("v"), col("m"))
        .union(mins.select(col("a").as("v"), col("m")))
        .filter(col("v") =!= col("m"))
        .select(col("m").as("lo"), col("v").as("hi")) // m = min(Γ⁻(a) ∪ a)
        .distinct()
    }

    // convergence = the (count, order-free hash-sum) signature of the
    // canonical edge set reaching a fixed point — two cheap aggregates,
    // never an old-vs-new join; maxIter bounds the astronomically
    // unlikely hash-collision miss
    def sig(e: DataFrame): (Long, java.math.BigDecimal) = {
      // decimal accumulator: a plain long sum of 2^63-range hashes
      // overflows (ANSI mode throws)
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("lo"), col("hi")).cast("decimal(38,0)"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }

    var s = sig(edges)
    var iter = 0
    var done = edges.isEmpty
    while (!done && iter < maxIter) {
      // checkpoint between the half-steps too: each half-step references
      // its input in two branches (sym/oriented union + the mins join) —
      // lazy chaining would re-execute the previous half-step per branch
      // (the resolveClusters lesson; Spark reuses exchanges, not subplans)
      val afterLarge = largeStar(edges).localCheckpoint(true)
      edges = smallStar(afterLarge).localCheckpoint(true)
      val s2 = sig(edges)
      done = s2 == s
      s = s2
      iter += 1
    }
    Log.getLogger("graft.Dedup").info(
      s"resolveClustersStar converged=$done after $iter round(s)")
    // converged stars: hi -> lo labels roots implicitly; nodes outside
    // any surviving edge (self-loop-only inputs) label themselves
    val labels = edges.select(col("hi").as("id"), col("lo").as("label"))
    nodes.join(labels, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("label"), col("id")).as("cluster_id"))
  }

  /** Incremental connected components: fold `newPairs` into an existing
    * `(doc_id, cluster_id)` labeling WITHOUT re-joining the original
    * pair set. The labeling itself is a component-preserving edge set
    * (each member → its cluster root, the star shape the resolver
    * converges to), so running [[resolveClustersStar]] over
    * label-edges ∪ new-pairs yields labels row-identical to resolving
    * old ∪ new from scratch — at cost proportional to
    * |labels| + |newPairs|, never the historical pair volume. The
    * batch-ingest twin of [[incrementalMinHash]]: per batch, LSH the
    * batch against the index, then merge only the fresh pairs here.
    *
    * Contract (inherited from the resolver's nodes-in-edges output): a
    * SINGLETON label row (doc_id == cluster_id) contributes no edge, so
    * it reappears in the output only if the batch pairs touch it —
    * union untouched singletons back in downstream if the full roster
    * is needed.
    */
  def mergeClusters(labels: DataFrame, newPairs: DataFrame,
                    maxIter: Int = 30): DataFrame = {
    val labelEdges = labels.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("a_id"), col("cluster_id").as("b_id"))
    resolveClustersStar(
      labelEdges.unionByName(newPairs.select(col("a_id"), col("b_id"))),
      maxIter)
  }

  /** Keep one representative per duplicate cluster: a document survives
    * when it is in no cluster, or when it IS its cluster's id (the lowest
    * member). The join against the (small) cluster table broadcasts.
    */
  def keepRepresentative(docs: DataFrame, clusters: DataFrame): DataFrame =
    docs.join(broadcast(clusters), Seq("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .drop("cluster_id")

  /** SemDeDup-style semantic deduplication: cluster the embedding space,
    * find near-duplicate pairs WITHIN each semantic cluster (sign-LSH
    * candidates + exact cosine re-check, bucket keys scoped by cluster so
    * unrelated regions never co-bucket), resolve pairs into connected
    * components, and keep one representative (minimum vec_id) per
    * component. Returns the SURVIVORS as (vec_id, cluster).
    *
    * Scale shape: the k-means fit is a bounded driver-side sample; the
    * assignment is a broadcast-centroid scan; candidate generation is the
    * [[embeddingNearDup]] bucketed join with (cluster, band, bucket) keys;
    * components resolve via [[resolveClusters]]. Hot semantic clusters at
    * 100 TB take the [[minHashLshStar]] treatment — cap the bucket and
    * star to the representative.
    */
  def semanticDedup(embeddings: DataFrame, k: Int = 16,
                    tau: Double = 0.95): DataFrame = {
    // assigned re-runs the whole k-means fit per reference (scoped join
    // + the final anti-join) and banded is self-joined — materialize
    // each once (r15: 8 source scans, 4 duplicated fit subtrees)
    val assigned = Similarity.kmeansCluster(embeddings, k)
      .select(col("vec_id"), col("cluster"))
      .localCheckpoint(true)
    val scoped = embeddings.select(col("vec_id"), col("embedding"))
      .join(assigned, "vec_id")
      .withColumn("nrm",
        sqrt(Similarity.dotCol(col("embedding"), col("embedding"))))
    val banded = Similarity.explodeBuckets(scoped, "vec_id", "embedding")
      .localCheckpoint(true)
    val pairs = banded.as("l")
      .join(banded.as("r"),
        col("l.cluster") === col("r.cluster") &&
          col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a_id"), col("r.vec_id").as("b_id"),
        col("l.embedding").as("a_emb"), col("r.embedding").as("b_emb"),
        col("l.nrm").as("a_nrm"), col("r.nrm").as("b_nrm"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("cosine",
        Similarity.dotCol(col("a_emb"), col("b_emb"))
          / (col("a_nrm") * col("b_nrm")))
      .filter(col("cosine") >= tau)
      .select(col("a_id"), col("b_id"))
    val dropped = resolveClusters(pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("vec_id"))
    assigned.join(dropped, Seq("vec_id"), "left_anti")
  }

  /** Paragraph-level exact dedup — the C4/RefinedWeb-style pass that
    * removes REPEATED SPANS across the corpus while keeping the documents
    * themselves: the first occurrence (lexicographically smallest
    * (doc_id, para_idx)) of each distinct paragraph survives; every later
    * copy is dropped and the documents are reassembled from their kept
    * paragraphs in order.
    *
    * Input is pre-segmented (doc_id, para_idx, para) — segmentation policy
    * (blank-line split, sentence split, fixed token windows) is the
    * caller's, keeping the operator corpus-agnostic. Two keyed shuffles at
    * corpus scale: keeper election is a partial-aggregated min per
    * content hash, the join back is on the same hash, and reassembly is
    * one groupBy(doc_id). Nothing driver-side; the per-doc collect_list
    * holds one document's paragraphs, bounded by document length.
    *
    * `boilerplateDf` adds the C4 boilerplate rule: a paragraph appearing
    * in >= that many DISTINCT documents (a license header, a nav bar) is
    * removed from EVERY document — no keeper survives. The df rides the
    * same keeper aggregation, so the rule costs nothing extra.
    *
    * Output: (doc_id, n_paras, n_dropped, clean_text).
    */
  def paragraphDedup(paras: DataFrame,
                     boilerplateDf: Long = Long.MaxValue): DataFrame = {
    val keyed = paras.select(col("doc_id"), col("para_idx"), col("para"),
      md5(col("para")).as("ph"))
    val keepers = keyed.groupBy("ph")
      .agg(min(struct(col("doc_id"), col("para_idx"))).as("k"),
        countDistinct(col("doc_id")).as("df"))
    keyed.join(keepers, "ph")
      .withColumn("kept", col("doc_id") === col("k.doc_id") &&
        col("para_idx") === col("k.para_idx") &&
        col("df") < boilerplateDf)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("para_idx"), col("para"))))),
            x => x.getField("para")),
          " ").as("clean_text"))
  }

  /** Partial-overlap near-dup via shared winnowing fingerprints — the
    * scalable approximation of substring dedup: two documents sharing any
    * token run of >= w+k-1 tokens are guaranteed >= 1 common fingerprint
    * (see [[graft.functions.Winnow]]), so a long passage copied between
    * otherwise-different documents surfaces here even when whole-document
    * similarity (minhash/simhash) stays low.
    *
    * Same inverted-index shape as [[ngramJaccard]]: explode fingerprints,
    * df-prune boilerplate fingerprints, self-equi-join on fingerprint,
    * keep pairs sharing >= `minShared`. All shuffles on fingerprint/pair
    * keys.
    */
  def winnowNearDup(docs: DataFrame, k: Int = 3, w: Int = 4,
                    minShared: Int = 2, dfMax: Int = 25): DataFrame = {
    val posting = docs.select(col("doc_id"),
      explode(expr(s"graft_winnow(text, $k, $w)")).as("fp"))
    val pruned = posting
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("df") <= dfMax)
      .drop("df")
    pruned.as("l")
      .join(pruned.as("r"),
        col("l.fp") === col("r.fp") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Embedding near-dup: sign-LSH bucketed candidate join + exact cosine
    * re-check (>= tau). Delegates candidate generation to
    * [[Similarity.signBuckets]] so ANN and near-dup share one LSH family.
    */
  def embeddingNearDup(embeddings: DataFrame, tau: Double = 0.95): DataFrame = {
    // norm computed once per vector, before the pair fan-out
    val normed = embeddings
      .withColumn("nrm", sqrt(Similarity.dotCol(col("embedding"), col("embedding"))))
    val banded = Similarity.explodeBuckets(normed, "vec_id", "embedding")
    val cands = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a_id"), col("r.vec_id").as("b_id"),
        col("l.embedding").as("a_emb"), col("r.embedding").as("b_emb"),
        col("l.nrm").as("a_nrm"), col("r.nrm").as("b_nrm"))
      .dropDuplicates("a_id", "b_id")
    cands
      .withColumn("cosine",
        Similarity.dotCol(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cosine") >= tau)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** Exact duplicated-substring spans — the span-level counterpart of
    * [[paragraphDedup]]: every maximal token range whose length-`n`
    * token grams ALL occur 2+ times anywhere in the corpus (intra- or
    * inter-document). This is the relational form of suffix-array
    * substring dedup: a copied passage of >= n tokens is a run of
    * duplicated grams, and merging overlapping/adjacent gram intervals
    * recovers the maximal copied span without materializing suffixes.
    * Returns `(doc_id, span_id, start_pos, end_pos, span_tokens)` in
    * token coordinates (0-based, inclusive).
    *
    * Scale shape: tokenize once per row (native [[graft.functions.WordNgrams]]
    * single pass), ONE shuffle on the gram for the occurrence count (the
    * jaccard count-over-window form — postings shuffle exactly once),
    * then one doc-keyed shuffle shared by the interval-merge windows and
    * the span rollup. A boilerplate gram at df=N contributes N posting
    * rows, never N² — there is no pair join anywhere.
    */
  def duplicatedSpans(docs: DataFrame, n: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs.select(col("doc_id"),
      posexplode(expr(s"graft_ngrams(text, $n)")).as(Seq("pos", "gram")))
    val dupPos = grams
      .withColumn("occ", count(lit(1)).over(Window.partitionBy("gram")))
      .filter(col("occ") > 1)
      .select(col("doc_id"), col("pos"))
    // union of intervals [pos, pos+n-1]: a new island starts when this
    // gram begins past the running max end + 1 (merge overlap AND touch)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    dupPos
      .withColumn("prev_end", max(col("pos") + lit(n - 1))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("island",
        when(col("prev_end").isNull || col("prev_end") + 1 < col("pos"), 1L)
          .otherwise(0L))
      .withColumn("span_id", sum(col("island")).over(w))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).cast("long").as("start_pos"),
        (max(col("pos")) + lit(n - 1)).cast("long").as("end_pos"))
      .withColumn("span_tokens", col("end_pos") - col("start_pos") + 1)
  }

  /** Content-defined chunking — the storage-dedup primitive (LBFS/CDC
    * family): chunk boundaries are HASH-determined, not positional, so
    * an insertion early in a document shifts only the chunk it lands in
    * while every later chunk keeps its identity — exactly what
    * fixed-width segmentation ([[paragraphDedup]]'s 10-token paragraphs)
    * cannot do, and why storage dedup and incremental-sync systems
    * chunk this way. Token-level variant: a boundary falls AFTER token
    * `i` when `md5int(token_i) % divisor == 0` (md5-prefix integer —
    * engine-portable, expected chunk length = `divisor` tokens), chunk
    * id is the running boundary count, and each chunk's identity is the
    * md5 of its space-joined tokens. Output per (doc_id, chunk_idx):
    * token count + checksum; feed the checksum column to [[exact]]-style
    * rollups for cross-corpus chunk-level dedup ratios.
    *
    * Scale shape: per-row tokenize + posexplode, ONE doc-keyed shuffle
    * shared by the boundary-count window and the chunk rollup (the
    * duplicatedSpans pattern); no global state, no pair joins.
    */
  def cdcChunks(docs: DataFrame, divisor: Int = 32): DataFrame = {
    require(divisor >= 2)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .withColumn("boundary",
        when(conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
          % divisor === 0L, 1L).otherwise(0L))
      // chunk of token i = boundaries strictly BEFORE i (boundary cuts
      // after its token, so the boundary token itself closes its chunk)
      .withColumn("chunk_idx",
        coalesce(sum(col("boundary"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_toks"),
        md5(array_join(transform(array_sort(collect_list(
          struct(col("pos"), col("tok")))), s => s.getField("tok")), " "))
          .as("checksum"))
  }

  /** Prefix-filtered token-set similarity self-join (AllPairs/PPJoin
    * family): EXACT jaccard >= `tau` pairs over word-token sets, with
    * candidate generation restricted to each document's PREFIX — its
    * `|x| - ceil(tau·|x|) + 1` globally rarest tokens. Completeness:
    * under any global total order, two sets with J >= tau overlap in at
    * least `ceil(tau/(1+tau)·(|x|+|y|))` tokens, which forces a shared
    * token inside both symmetric prefixes — so unlike [[ngramJaccard]]'s
    * df-cap (which DROPS hot shingles and needs a corpus-gap argument),
    * the prefix filter is lossless at every threshold.
    *
    * Scale shape: rarest-first ordering means stopwords land at the END
    * of every token list and never enter the index — posting-list fanout
    * concentrates on rare tokens where df is small by definition. One
    * token-keyed shuffle for df, one doc-keyed shuffle for ranking, one
    * prefix-token-keyed shuffle for the candidate join, one pair-keyed
    * shuffle for verification. The verify join streams only candidate
    * docs' postings, keyed on token. The length filter
    * (`tau·|x| <= |y|`) drops size-incompatible candidates before they
    * reach verification.
    *
    * `ngram >= 2` switches the set elements from word tokens to word
    * n-gram shingles ([[shinglesCol]]'s similarity space). That choice
    * is load-bearing for the filter's effectiveness: prefix filtering
    * prunes in proportion to how RARE the rarest set elements are, and
    * a small word vocabulary (every token hot) gives it nothing to work
    * with — measured 140s at sf0.1 on word sets vs ~2s on 3-gram sets,
    * whose key space is combinatorially larger so prefix dfs are tiny.
    */
  def tokenJaccardPrefix(docs: DataFrame, tau: Double = 0.5,
                         ngram: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val elems =
      if (ngram <= 1) array_distinct(split(trim(col("text")), "\\s+"))
      else expr(s"graft_shingles(text, $ngram)")
    // set size is a narrow size() BEFORE the explode (el aliased once so
    // CollapseProject can't duplicate the shingle producer) — the r6 plan
    // ran a second doc_id count-window over the whole posting stream for
    // a value already known per doc. The element ARRAY is kept alongside:
    // verification intersects the two doc arrays directly instead of
    // re-joining the posting stream per pair (r7: the postings-verify
    // fanned every candidate pair out to |x| rows and shuffled ~50M rows
    // at Stress 10x — 263s; the array-intersect verify is one codegen'd
    // set intersection per pair — 45s, identical 250,600 rows).
    // docSets feeds the posting explode AND both verification sides —
    // materialize once so the shingle producer runs a single time (r15:
    // the composed plan re-ran it per reference). prefix stays LAZY:
    // checkpointing it measured 1.5x SLOWER on the tau=0.3 sweep — the
    // self-join's sides share the ranking window's exchange via
    // ReusedExchange, which a checkpoint destroys (the nodesim lesson).
    val docSets = docs.select(col("doc_id"), elems.as("el"))
      .select(col("doc_id"), col("el"), size(col("el")).cast("long").as("sz"))
      .localCheckpoint(true)
    val toks = docSets
      .select(col("doc_id"), col("sz"), explode(col("el")).as("tok"))
    val ranked = toks
      .withColumn("df", count(lit(1)).over(Window.partitionBy("tok")))
      .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
        .orderBy(asc("df"), asc("tok"))))
    val prefix = ranked
      .filter(col("rk") <= col("sz") - ceil(lit(tau) * col("sz")) + 1)
      .select(col("doc_id"), col("tok"), col("sz"))
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
          // length filter: J >= tau forces tau·|x| <= |y| and vice versa
          col("a.sz") * lit(tau) <= col("b.sz") &&
          col("b.sz") * lit(tau) <= col("a.sz"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sz").as("a_sz"), col("b.sz").as("b_sz"))
      .distinct()
    cands
      .join(docSets.select(col("doc_id").as("a_id"), col("el").as("a_el")),
        Seq("a_id"))
      .join(docSets.select(col("doc_id").as("b_id"), col("el").as("b_el")),
        Seq("b_id"))
      .withColumn("common",
        size(array_intersect(col("a_el"), col("b_el"))).cast("long"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("a_sz") + col("b_sz") - col("common")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** EXACT asymmetric containment self-join: all ordered pairs (a, b)
    * with C(a→b) = |A∩B| / |A| >= `tau` over word n-gram shingle sets —
    * the quote/subset detector jaccard cannot express (a short document
    * fully quoted inside a long one has high containment but LOW jaccard,
    * since the union is dominated by the long side). This is the primitive
    * behind "is this doc mostly content we already have" curation gates
    * and prompt/completion overlap checks.
    *
    * Candidate generation is one-sided prefix filtering: C(a→b) >= tau
    * means a misses at most |A| − ceil(tau·|A|) elements of B, so one of
    * a's `|A| − ceil(tau·|A|) + 1` globally RAREST elements must appear
    * in B — the probe side indexes only that prefix, while the indexed
    * side posts its FULL element set (containment puts no lower bound on
    * which of b's elements are shared, so b cannot be prefix-pruned;
    * that asymmetry is inherent to containment joins). Lossless at every
    * threshold. The size filter `|B| >= ceil(tau·|A|)` drops
    * impossible candidates before verification, and verification is the
    * codegen'd per-pair `array_intersect` close (the jaccard_prefix
    * recipe — never re-join the posting stream per pair).
    *
    * Scale shape: one tok-keyed shuffle for df (window reuses the
    * partitioning for the index side of the join), one doc-keyed shuffle
    * for prefix ranking, the candidate equi-join on tok, one pair-keyed
    * shuffle to verify. Rare-first prefixes keep probe-side fanout tiny;
    * index-side hot-token posting lists only pair with probes whose
    * PREFIX contains the hot token — i.e. short or hot-dominated docs —
    * so the join output stays far under df² per token. `ngram >= 2`
    * (default 3) is load-bearing exactly as in [[tokenJaccardPrefix]]:
    * a combinatorial shingle space keeps prefix dfs small.
    */
  def containmentJoin(docs: DataFrame, tau: Double = 0.8,
                      ngram: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val elems =
      if (ngram <= 1) array_distinct(split(trim(col("text")), "\\s+"))
      else expr(s"graft_shingles(text, $ngram)")
    // docSets feeds the explode + both verification sides — materialize
    // once so the shingle producer runs a single time (r15). toks stays
    // LAZY: its tok-keyed exchange is shared between the df window and
    // the candidate b-side via ReusedExchange, which a checkpoint would
    // destroy (the nodesim lesson).
    val docSets = docs.select(col("doc_id"), elems.as("el"))
      .select(col("doc_id"), col("el"), size(col("el")).cast("long").as("sz"))
      .filter(col("sz") > 0)
      .localCheckpoint(true)
    val toks = docSets
      .select(col("doc_id"), col("sz"), explode(col("el")).as("tok"))
    val ranked = toks
      .withColumn("df", count(lit(1)).over(Window.partitionBy("tok")))
      .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
        .orderBy(asc("df"), asc("tok"))))
    val prefix = ranked
      .filter(col("rk") <= col("sz") - ceil(lit(tau) * col("sz")) + 1)
      .select(col("doc_id").as("a_id"), col("tok"), col("sz").as("a_sz"))
    val cands = prefix.join(
        toks.select(col("doc_id").as("b_id"), col("tok"),
          col("sz").as("b_sz")), Seq("tok"))
      .filter(col("a_id") =!= col("b_id") &&
        col("b_sz") >= ceil(lit(tau) * col("a_sz")))
      .select(col("a_id"), col("b_id"), col("a_sz"))
      .distinct()
    cands
      .join(docSets.select(col("doc_id").as("a_id"), col("el").as("a_el")),
        Seq("a_id"))
      .join(docSets.select(col("doc_id").as("b_id"), col("el").as("b_el")),
        Seq("b_id"))
      .withColumn("containment",
        size(array_intersect(col("a_el"), col("b_el"))).cast("double") /
          col("a_sz").cast("double"))
      .filter(col("containment") >= tau)
      .select(col("a_id"), col("b_id"), col("containment"))
  }

  /** Pair-level dedup quality evaluation against a ground-truth pair
    * set — the harness that turns "we ran MinHash" into "MinHash found
    * 96% of the planted duplicates at 99% precision". Both sides
    * canonicalize to unordered `(min, max)` pairs; one full-outer join
    * classifies every pair as tp/fp/fn; precision, recall, and F1 come
    * out in exact integer parts-per-million
    * (`f1 = 2·p·r div (p + r)` over the already-scaled p and r).
    *
    * Scale shape: one keyed join on the pair identity + a one-row
    * global rollup (two-stage partial agg). Output is ONE row — the
    * metric card a dedup sweep logs per (method, threshold).
    * Inputs need `(a_id, b_id)`.
    */
  def evalPairs(predicted: DataFrame, truth: DataFrame): DataFrame = {
    def canon(df: DataFrame) = df.select(
      least(col("a_id"), col("b_id")).as("a"),
      greatest(col("a_id"), col("b_id")).as("b")).distinct()
    canon(predicted).withColumn("in_p", lit(1L))
      .join(canon(truth).withColumn("in_t", lit(1L)),
        Seq("a", "b"), "full_outer")
      .select(coalesce(col("in_p"), lit(0L)).as("in_p"),
        coalesce(col("in_t"), lit(0L)).as("in_t"))
      .agg(sum(col("in_p")).as("n_predicted"),
        sum(col("in_t")).as("n_truth"),
        sum(col("in_p") * col("in_t")).as("tp"))
      .select(col("n_predicted"), col("n_truth"), col("tp"),
        (col("n_predicted") - col("tp")).as("fp"),
        (col("n_truth") - col("tp")).as("fn"),
        expr("CASE WHEN n_predicted = 0 THEN 0L" +
          " ELSE 1000000L * tp div n_predicted END").as("precision_ppm"),
        expr("CASE WHEN n_truth = 0 THEN 0L" +
          " ELSE 1000000L * tp div n_truth END").as("recall_ppm"))
      .withColumn("f1_ppm",
        expr("CASE WHEN precision_ppm + recall_ppm = 0 THEN 0L" +
          " ELSE 2L * precision_ppm * recall_ppm" +
          " div (precision_ppm + recall_ppm) END"))
  }

  /** Threshold calibration sweep: given scored candidate pairs and a
    * planted-gold truth set, report tp/fp/fn and exact F1 at each
    * candidate threshold, and elect the best — the auto-tuning step
    * between "we can score pairs" and "we picked 0.8 because the last
    * team did". All integer: F1 as 2tp·10⁶ div (2tp+fp+fn) per
    * threshold, election by max f1_ppm with the LOWEST threshold as
    * tie-break (prefer recall at equal F1) — no float ever emitted or
    * compared except the score-vs-threshold cut itself, which is one
    * IEEE division + comparison identical in both engines. Pairs the
    * scorer never surfaced count as fn at every threshold (the sweep
    * inherits the generator's recall ceiling — that is the point).
    *
    * Scale shape: one full-outer join of scored pairs against truth
    * (pair-keyed), a bounded explode (|thresholds| per pair), one
    * partial-agg groupBy to |thresholds| rows; the election window
    * runs over those rows only.
    */
  def thresholdSweep(scored: DataFrame, truth: DataFrame,
                     thresholdsE2: Seq[Int] =
                       Seq(30, 40, 50, 60, 70, 80, 90)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = truth.select(col("a_id"), col("b_id"))
      .withColumn("is_true", lit(true))
    val joined = scored.select(col("a_id"), col("b_id"), col("jaccard"))
      .join(t, Seq("a_id", "b_id"), "full")
      .withColumn("thr_e2",
        explode(lit(thresholdsE2.map(_.toLong).toArray)))
      .withColumn("hit",
        col("jaccard").isNotNull &&
          col("jaccard") >= col("thr_e2").cast("double") / lit(100.0))
    joined
      .groupBy(col("thr_e2"))
      .agg(
        sum(when(col("hit") && col("is_true").isNotNull, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("hit") && col("is_true").isNull, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(!col("hit") && col("is_true").isNotNull, 1L)
          .otherwise(0L)).as("fn"))
      .withColumn("f1_ppm", expr(
        """CASE WHEN 2 * tp + fp + fn = 0 THEN 0L
           ELSE 2000000L * tp div (2 * tp + fp + fn) END"""))
      .withColumn("is_best", rank().over(
        Window.orderBy(col("f1_ppm").desc, col("thr_e2").asc)) === 1)
      .select(col("thr_e2"), col("tp"), col("fp"), col("fn"),
        col("f1_ppm"), col("is_best"))
      .orderBy("thr_e2")
  }

  /** Canonical-document election (survivorship) over duplicate
    * clusters: after ANY clustering step ([[resolveClusters]],
    * [[resolveClustersStar]], or an exact-hash family), exactly one
    * member per cluster survives — the highest-`quality` document, ties
    * broken by minimum doc_id (fully deterministic, so a re-run keeps
    * the SAME canonical copies and downstream incremental exports never
    * churn). This is the "which copy do we keep" half that cluster
    * resolution alone leaves open; [[duplicationWeights]] is the
    * soft-dedup alternative when dropping is too blunt.
    *
    * Input: `docs` with (doc_id, `qualityCol`), `clusters` with
    * (doc_id, cluster_id). Output: one row per CLUSTERED doc —
    * (cluster_id, doc_id, quality, keep, canonical_id).
    *
    * Scale shape: one hash join on doc_id, then a single
    * cluster-partitioned window (one shuffle on cluster_id) — the
    * election never materializes pairs and runs at |clustered docs|,
    * not corpus size.
    */
  def keepBest(docs: DataFrame, clusters: DataFrame,
               qualityCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    docs.select(col("doc_id"), col(qualityCol).cast("long").as("quality"))
      .join(clusters.select(col("doc_id"), col("cluster_id")), "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .withColumn("canonical_id",
        first(col("doc_id")).over(w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("cluster_id"), col("doc_id"), col("quality"),
        col("keep"), col("canonical_id"))
  }

  /** Cross-batch novelty curve — how much of each ingestion batch is
    * already known from STRICTLY earlier batches (the data-value-decay
    * readout that decides whether the next crawl is worth its compute:
    * each re-crawl of the same sources yields less). Expects
    * `(batch, text)` — batch is the crawl/ingestion label with a total
    * order. A doc is a prior-dup iff its exact checksum appeared in any
    * earlier batch — within-batch duplicates intentionally do NOT count
    * (they belong to within-batch dedup, row 17).
    *
    * Scale shape: checksum → min(batch) is ONE partial-aggregated
    * groupBy on the checksum (cardinality = distinct payloads); the
    * verdict join is checksum-keyed; the curve rollup is |batches|
    * rows. Output per batch: `(batch, n_docs, n_dup_prior,
    * novelty_ppm)`.
    */
  def noveltyCurve(docs: DataFrame): DataFrame = {
    val b = docs.select(col("batch").cast("long").as("batch"),
      md5(col("text")).as("ck"))
    val firstSeen = b.groupBy(col("ck"))
      .agg(min(col("batch")).as("first_batch"))
    b.join(firstSeen, "ck")
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("batch") > col("first_batch"), 1L).otherwise(0L))
          .as("n_dup_prior"))
      .withColumn("novelty_ppm",
        expr("1000000L * (n_docs - n_dup_prior) div n_docs"))
  }
}
