package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training pipelines: deterministic
  * splits and distribution profiling. Splitting is keyed on a content-
  * independent id hash so assignment is reproducible across runs,
  * engines, and cluster sizes — and expressible in the DuckDB oracle
  * (md5 is engine-portable where murmur seeds are not).
  */
object Sampling {

  /** Deterministic train/valid/test assignment from the first hex char of
    * md5(id): 0-b → train (12/16), c-d → valid (2/16), e-f → test (2/16).
    * Stable under corpus growth: a row's split never changes when other
    * rows are added, unlike fraction-based `randomSplit`.
    */
  def splitCol(id: Column): Column = {
    val h = substring(md5(id.cast("string")), 1, 1)
    when(h.isin("c", "d"), lit("valid"))
      .when(h.isin("e", "f"), lit("test"))
      .otherwise(lit("train"))
  }

  def splitAssign(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("split", splitCol(col(idCol)))

  /** Leakage-safe train/val split: near-duplicate CLUSTERS are assigned
    * to a split atomically, so no near-dup pair ever straddles the
    * boundary — the standard fix for eval contamination, where a
    * training document's near-copy lands in the validation set and
    * inflates every metric. `pairs` is any near-dup pair set
    * ((a_id, b_id): minhash/jaccard/simhash output); components come
    * from [[graft.ops.Dedup.resolveClustersStar]] large-star/small-star
    * rounds by default — near-dup CHAINS (A~B~C~... each pair under the
    * threshold) are exactly the leakage scenario this operator exists
    * for, and a chain's component diameter equals its length, so the
    * O(log n)-round star resolver is the scale-safe default where
    * min-label propagation needs diameter rounds (or silently truncates
    * at maxIter). Both resolvers emit identical hash-min components, so
    * the choice never changes the output — `resolver` accepts the
    * diameter-round [[graft.ops.Dedup.resolveClusters]] for small dense
    * pair sets where its per-round cost is lower. Unpaired docs are
    * their own singleton cluster, and the split is
    * decided by the first md5 BYTE of the CLUSTER id (`< 64` of 256 →
    * 'val', i.e. 25%) — the [[splitCol]] determinism recipe lifted from
    * doc to cluster granularity, so assignment is stable under corpus
    * growth AND engine-portable. Scale shape: the pair-graph components
    * are the dominant cost (pairs-sized keyed joins per round); the rest
    * is one docs⋈components left join and a narrow md5 projection.
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       valPct: Int = 25,
                       resolver: DataFrame => DataFrame =
                         Dedup.resolveClustersStar(_)): DataFrame = {
    require(valPct >= 1 && valPct <= 99, "valPct must be 1..99")
    val threshold = 256L * valPct / 100L
    val clusters = resolver(pairs)
      .select(col("doc_id"), col("cluster_id").as("cid"))
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cid"), col("doc_id")))
      .withColumn("split",
        when(conv(substring(md5(col("cluster_id").cast("string")), 1, 2),
          16, 10).cast("long") < threshold, lit("val"))
          .otherwise(lit("train")))
      .select(col("doc_id"), col("cluster_id"), col("split"))
  }

  /** k-fold cross-validation assignment: `fold = int(md5(id)[0:8]) mod
    * k`. Deterministic and stable under corpus growth — a row's fold
    * never changes when other rows arrive (the same property
    * [[splitAssign]] gives train/val/test), and the md5-prefix integer
    * is engine-portable. Pure narrow projection, zero shuffles.
    */
  def kFoldAssign(df: DataFrame, idCol: String, k: Int = 5): DataFrame = {
    require(k >= 2)
    df.withColumn("fold",
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % k)
  }

  /** Per-source sampling rates that reshape the corpus into a target
    * mix WITHOUT upsampling: `scale = min_s(n_s / share_s)` is the
    * largest output size at which no source must repeat documents, and
    * `rate_s = share_s · scale / n_s` (the bottleneck source gets rate
    * 1.0). Feed the result to [[mixtureResample]] — together with
    * [[graft.ops.Dedup.dedupReport]] this closes the loop: measure the
    * mix, compute rates, resample deterministically. Sources absent
    * from `targets` are dropped (rate 0). One partial-aggregated count
    * keyed on the source + a one-row scale broadcast.
    */
  def ratesForTarget(docs: DataFrame, targets: Seq[(String, Double)],
                     srcCol: String = "source"): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "targets must be non-empty positive shares")
    val sp = docs.sparkSession
    import sp.implicits._
    val tgt = targets.toDF(srcCol, "share")
    val counts = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("n_docs"))
      .join(broadcast(tgt), srcCol)
    val scale = counts
      .agg(min(col("n_docs").cast("double") / col("share")).as("scale"))
    counts.crossJoin(broadcast(scale))
      .select(col(srcCol), col("n_docs"), col("share"),
        (col("share") * col("scale") / col("n_docs").cast("double"))
          .as("rate"))
  }

  /** Temperature-flattened sampling rates (the multilingual-pretraining
    * mix rule): source weight `n_s^(1/T)` damps the head so rare sources
    * keep a larger fraction — T=1 is proportional (rate 1 everywhere),
    * larger T flattens toward uniform. No-upsampling normalization as in
    * [[ratesForTarget]]: `n_s / w_s = n_s^(1-1/T)` is smallest for the
    * RAREST source, so `scale = min_s(n_s / w_s)` keeps all of it
    * (rate 1) and downsamples every larger source toward the flattened
    * mix with `rate_s = w_s · scale / n_s`.
    *
    * T is restricted to powers of two so the root is ITERATED `sqrt` —
    * IEEE-correctly-rounded in every engine, unlike `pow`/`ln` whose
    * last-ulp drift breaks cross-engine exactness. No float sum anywhere:
    * the normalizer is a `min` (order-free), each rate is three IEEE ops
    * in a fixed tree. One source-keyed count + a one-row broadcast.
    */
  def temperatureRates(docs: DataFrame, temperature: Int = 4,
                       srcCol: String = "source"): DataFrame = {
    require(Seq(1, 2, 4, 8).contains(temperature),
      "temperature must be 1, 2, 4, or 8 (iterated-sqrt exactness)")
    val roots = (math.log(temperature) / math.log(2)).round.toInt
    def weight(c: Column): Column =
      (0 until roots).foldLeft(c.cast("double"))((acc, _) => sqrt(acc))
    val counts = docs.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", weight(col("n_docs")))
    val scale = counts
      .agg(min(col("n_docs").cast("double") / col("weight")).as("scale"))
    counts.crossJoin(broadcast(scale))
      .select(col(srcCol), col("n_docs"), col("weight"),
        (col("weight") * col("scale") / col("n_docs").cast("double"))
          .as("rate"))
  }

  /** Per-label counts and fractions — the class-balance check before
    * training. One partial-aggregated shuffle on the label.
    */
  def labelBalance(df: DataFrame, labelCol: String): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("fraction", col("n").cast("double") / lit(total))
  }

  /** Corpus profile: per-language token-length distribution (doc count,
    * mean, p50/p90, min/max) — the length-histogram report behind context-
    * window and truncation decisions.
    *
    * `exact = true` uses exact `percentile` (holds each group's values;
    * fine up to millions of docs per group, and DuckDB-oracle-matchable).
    * At 100 TB pass `exact = false`: `approx_percentile` is a t-digest
    * sketch with full partial aggregation — constant memory per group.
    */
  def corpusStats(docs: DataFrame, exact: Boolean = true): DataFrame = {
    val pct = if (exact) "percentile" else "approx_percentile"
    docs
      .withColumn("n_toks",
        size(TextAnalysis.tokensCol(col("text"))).cast("long"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("n_toks")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_tokens"),
        expr(s"$pct(n_toks, 0.5)").cast("double").as("p50_tokens"),
        expr(s"$pct(n_toks, 0.9)").cast("double").as("p90_tokens"),
        min(col("n_toks")).as("min_tokens"),
        max(col("n_toks")).as("max_tokens"))
  }

  /** Training-mixture composition: per (source, lang) document and token
    * counts plus each cell's share of all corpus tokens — the data-mix
    * report behind sampling-weight decisions.
    *
    * One partially-aggregated shuffle on (source, lang); the share window
    * runs over the aggregated result (|sources|×|langs| rows), never the
    * corpus.
    */
  def sourceMix(docs: DataFrame): DataFrame = {
    val perCell = docs
      .withColumn("n_toks",
        size(TextAnalysis.tokensCol(col("text"))).cast("long"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    perCell.withColumn("token_share",
      col("n_tokens").cast("double") /
        sum(col("n_tokens")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()).cast("double"))
  }

  /** Deterministic mixture resampling: keep each document with a
    * per-source rate — the operator that reshapes a raw crawl into a
    * target training mix (downweight boilerplate-heavy sources, keep all
    * of scarce ones).
    *
    * The keep decision compares the first 8 hex chars of `md5(doc_id)`
    * against the rate mapped to an 8-hex-digit threshold — lowercase hex
    * compares identically as a STRING in every engine (ASCII '0'-'9' <
    * 'a'-'f'), so the sample is reproducible across runs, engines, and
    * cluster sizes, and stable under corpus growth (a kept doc stays kept
    * when other rows arrive — unlike `sample()`, whose output depends on
    * partitioning). Pure narrow projection + filter: no shuffle at any
    * scale.
    */
  def mixtureResample(docs: DataFrame, rates: Seq[(String, Double)],
                      defaultRate: Double = 1.0): DataFrame = {
    def thresholdHex(rate: Double): String =
      f"${math.min((rate * 4294967296.0).toLong, 4294967295L)}%08x"
    val h = substring(md5(col("doc_id").cast("string")), 1, 8)
    def keep(rate: Double): Column =
      if (rate >= 1.0) lit(true) else h < lit(thresholdHex(rate))
    val kept = rates.foldRight(keep(defaultRate)) { case ((src, rate), els) =>
      when(col("source") === src, keep(rate)).otherwise(els)
    }
    docs.filter(kept)
  }

  /** Greedy sequential sequence packing — concatenate documents in doc_id
    * order and chop every `seqLen` tokens, the standard pretraining
    * batch-assembly step. Emits, per document: its packed sequence id, the
    * token offset where it starts inside that sequence, and whether it
    * crosses a sequence boundary (gets split across training examples).
    *
    * Packing is per `shardCol` group (sequence ids are (shard, seq_id)
    * pairs): the running token sum is a window ordered by doc_id WITHIN a
    * shard, so the only shuffle is on the shard key and no global sort
    * exists at any scale — at 100 TB shards are file groups or sources,
    * each packed independently, exactly how distributed pretraining
    * tokenizers shard their output. A single global pack (shardCol = a
    * constant) would be the one-partition window anti-pattern.
    */
  def packSequences(docs: DataFrame, seqLen: Long = 2048L,
                    shardCol: String = "source"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col("doc_id"))
    docs
      .withColumn("n_toks",
        size(TextAnalysis.tokensCol(col("text"))).cast("long"))
      .withColumn("start_off",
        coalesce(sum(col("n_toks")).over(w) - col("n_toks"), lit(0L)))
      .select(
        col("doc_id"), col(shardCol).as("shard"), col("n_toks"),
        // integral `div`, not `/` + cast: double division loses exactness
        // once a shard's running token count passes 2^53
        expr(s"start_off div $seqLen").as("seq_id"),
        (col("start_off") % seqLen).as("seq_offset"),
        // a doc crosses a boundary when its first and last token land in
        // different seqLen-sized windows (empty docs never cross)
        (col("n_toks") > 0L &&
          expr(s"start_off div $seqLen") =!=
            expr(s"(start_off + n_toks - 1) div $seqLen"))
          .as("crosses_boundary"))
  }

  /** Length-bucketed micro-batch assembly — the inference/eval cousin of
    * [[packSequences]]: instead of concatenating docs into fixed token
    * windows, group SIMILAR-LENGTH docs into batches so per-batch
    * padding (every sequence padded to the batch max) is minimized —
    * the standard dynamic-batching trick for transformer inference.
    *
    * Within each `shardCol` group docs order by (n_toks DESC, doc_id) —
    * descending length puts near-equal lengths adjacent, the unique id
    * makes the order total and engine-portable — and greedy contiguous
    * fill assigns `batch_id = (cumsum − n_toks) div maxTokensPerBatch`
    * (a batch's token sum exceeds the budget by at most its last doc —
    * the doc-atomic variant of [[packSequences]]' boundary crossing).
    * Per-(shard, batch) rollup reports the padding economics:
    * `padded_tokens = max_len · n_docs` is what the accelerator
    * actually processes, `waste_ppm` the padding overhead.
    *
    * Scale shape: the window is PER SHARD (the packSequences rule — a
    * global sort would be the one-partition anti-pattern); one shuffle
    * on the shard key, one partial-aggregated rollup on (shard, batch).
    */
  def lengthBatches(docs: DataFrame, maxTokensPerBatch: Long = 2048L,
                    shardCol: String = "source"): DataFrame = {
    require(maxTokensPerBatch >= 1L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol))
      .orderBy(col("n_toks").desc, col("doc_id"))
    docs
      .withColumn("n_toks",
        size(TextAnalysis.tokensCol(col("text"))).cast("long"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      .select(col("doc_id"), col(shardCol).as("shard"), col("n_toks"),
        expr(s"(cum - n_toks) div ${maxTokensPerBatch}L").as("batch_id"))
      .groupBy(col("shard"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("batch_tokens"),
        max(col("n_toks")).as("max_len"))
      .withColumn("padded_tokens", col("max_len") * col("n_docs"))
      .withColumn("waste_ppm",
        expr("CASE WHEN padded_tokens = 0 THEN 0L ELSE " +
          "(padded_tokens - batch_tokens) * 1000000L div padded_tokens END"))
  }

  /** Deterministic fixed-size sample per key — `n` documents from every
    * `keyCol` group, chosen by md5(doc_id) order (engine-portable,
    * uniform, and stable: a group's sample only changes where new ids
    * hash below its current cutoff). The eval-set / spot-check / debug
    * sampler: "give me 100 random-but-reproducible docs per source".
    *
    * One shuffle on the key for the rank window. When groups are huge
    * and n is small, the same semantics can run as a partial top-k
    * (min_by over the hash) instead of a full window sort — noted here
    * because the window form sorts each group; at n ≪ group size prefer
    * `groupBy.agg(min_by)` fan-in.
    */
  /** Bootstrap confidence interval for a per-group fixed-point mean,
    * deterministic and engine-exact: `b` half-sample replicas per
    * group, each keeping the rows whose md5 over `(id, replica)` has a
    * leading hex digit below 8 (Bernoulli(1/2), the portable sampling
    * threshold from [[splitCol]]); replica means are truncated-integer
    * `sum div count`, and the interval is (min, doubled-exact median,
    * max) over the `b` replica means — exact order statistics on a
    * b-row frame. The standard Poisson-bootstrap shape: the only cost
    * is the ×b replica explode, which runs at scan parallelism; no
    * state ever exceeds groups × b rows after the first aggregation.
    *
    * Expects `(group, id, v100)` — two-decimal fixed-point values.
    */
  def bootstrapMean(df: DataFrame, b: Int = 32): DataFrame = {
    require(b >= 2 && b % 2 == 0, "need an even replica count >= 2")
    val reps = df
      .select(col("group"), col("id"), col("v100"),
        explode(expr(s"sequence(0, ${b - 1})")).as("r"))
      .filter(conv(substring(md5(concat(col("id").cast("string"),
        lit(":"), col("r").cast("string"))), 1, 1), 16, 10)
        .cast("long") < 8)
      .groupBy(col("group"), col("r"))
      .agg(expr("sum(v100) div count(1)").as("mean_c"))
    val point = df.groupBy(col("group"))
      .agg(expr("sum(v100) div count(1)").as("point_c"),
        count(lit(1)).as("n_rows"))
    reps.groupBy(col("group"))
      .agg(count(lit(1)).as("n_replicas"),
        min(col("mean_c")).as("ci_lo_c"),
        expr("CAST(round(2 * percentile(mean_c, 0.5D)) AS BIGINT)")
          .as("median_x2_c"),
        max(col("mean_c")).as("ci_hi_c"))
      .join(point, Seq("group"))
      .select(col("group"), col("n_rows"), col("point_c"),
        col("n_replicas"), col("ci_lo_c"), col("median_x2_c"),
        col("ci_hi_c"))
  }

  def samplePerKey(docs: DataFrame, keyCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("h"), col("doc_id"))))
      .filter(col("sample_rank") <= n)
      .drop("h")
      .withColumn("sample_rank", col("sample_rank").cast("long"))
  }

  /** Curriculum staging — the deterministic training-order transform:
    * documents are split into `stages` difficulty tiers by a score
    * column (easy → hard via `ntile`, which agrees across engines given
    * the pinned (score, doc_id) total order — the r6 bucket-split
    * recipe), then SHUFFLED within each stage by an md5 rank so a
    * training run reads stage 1 in random-but-reproducible order before
    * stage 2. `(stage, pos)` is the complete curriculum order; no
    * column depends on partitioning or engine iteration order.
    *
    * Scale shape: two windows — the global ntile runs over (score, id)
    * and is the one range-exchange (Spark's Window ORDER BY without
    * PARTITION BY is a single partition at this size; the documented
    * huge-corpus path is a range-partitioned global sort feeding
    * percent_rank-derived tiers), the within-stage rank shares the
    * stage partitioning.
    */
  def curriculumOrder(docs: DataFrame, scoreCol: String,
      stages: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("stage", ntile(stages).over(
        Window.orderBy(col(scoreCol), col("doc_id"))).cast("long"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("stage"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
        .cast("long"))
  }

  /** Preference-pair mining for reward-model / DPO training: per group
    * (prompt, source, …), pair the best-scored candidate with the
    * worst-scored one, keeping pairs whose margin clears `minMargin`.
    * Deterministic tie-breaks (equal score → smaller id on BOTH ends)
    * make the pair set engine-reproducible; single-member groups and
    * zero-margin groups emit nothing.
    *
    * Scale shape: no rank window over group members — both extremes are
    * partial-aggregable `min/max(struct)` argmin/argmax (the
    * part_best_supplier pattern), so a group of any size costs one
    * combine per partition and the shuffle carries two structs per
    * group.
    */
  def preferencePairs(scored: DataFrame, groupCol: String, idCol: String,
                      scoreCol: String, minMargin: Long = 1L): DataFrame =
    scored
      .groupBy(col(groupCol))
      .agg(
        max(struct(col(scoreCol).as("s"), (-col(idCol)).as("negid"))).as("b"),
        min(struct(col(scoreCol).as("s"), col(idCol).as("id"))).as("w"))
      .select(col(groupCol),
        (-col("b.negid")).as("chosen_id"), col("b.s").as("chosen_score"),
        col("w.id").as("rejected_id"), col("w.s").as("rejected_score"))
      .withColumn("margin", col("chosen_score") - col("rejected_score"))
      .filter(col("margin") >= minMargin &&
        col("chosen_id") =!= col("rejected_id"))

  /** EXACT weighted sampling WITHOUT replacement (k draws): the
    * Efraimidis–Spirakis A-ES scheme, derandomized to the replica-
    * min-hash recipe. Each row with integer weight w materializes w
    * salted md5 replicas and keeps its minimum hash; the k globally
    * smallest minima ARE the weighted sample — P(row first) = w/Σw
    * exactly, then recursively over survivors, because min of w iid
    * uniforms ~ the u^(1/w) A-ES key (identical law by the reflection
    * u ↦ 1−u). md5 in place of RNG makes the draw reproducible across
    * runs, engines, and cluster sizes — and oracle-exact.
    *
    * Scale shape: the explode is Σw rows of (id, hash) pairs — bound
    * `weightCol` (quantize: weight 1 + chars/64, not raw chars) so Σw
    * stays a small multiple of the corpus; per-row min collapses in
    * the partial agg, and the global k smallest is a TakeOrdered
    * (per-partition heads + k-row merge), never a global sort.
    * `weightCol` must be integral ≥ 1.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = df
      .select(col(idCol).as("id"), col(weightCol).cast("long").as("w"))
      // fail closed on malformed weights: sequence(0, w-1) DESCENDS for
      // w <= 0 (two replicas for w = 0!) while the DuckDB twin's
      // range(w) yields zero rows — drop non-positive weights so both
      // engines agree that such a row can never win a draw (ADVICE r10)
      .filter(col("w") >= 1L)
      .withColumn("r", explode(expr("sequence(0L, w - 1L)")))
      .withColumn("h", md5(concat(col("id").cast("string"), lit(":"),
        col("r").cast("string"))))
      .groupBy(col("id"), col("w"))
      .agg(min(col("h")).as("h"))
      .orderBy(col("h").asc, col("id").asc)
      .limit(k)
    hashed
      .withColumn("draw",
        row_number().over(Window.orderBy(col("h").asc, col("id").asc))
          .cast("long"))
      .select(col("draw"), col("id"), col("w"), col("h"))
  }

  /** Leave-one-out target encoding: replace a categorical feature with
    * the mean label of OTHER rows sharing its value — the standard
    * high-cardinality-categorical encoder, in the leakage-safe LOO form
    * (a row never sees its own label; naive per-category means leak the
    * target and inflate every downstream validation score). Exact
    * integer ppm: (Σ_k − y_i) · 10⁶ div (n_k − 1); singleton categories
    * surface NULL portably (no global-prior imputation — downstream
    * picks its own fallback).
    *
    * Scale shape: one partial-aggregated groupBy to the category
    * domain, broadcast back onto the stream — corpus rows never
    * shuffle. (For category domains too big to broadcast, the same
    * two-frame plan holds with a shuffled hash join on the category.)
    */
  def targetEncodeLOO(df: DataFrame, catCol: String, labelCol: String,
                      idCol: String): DataFrame = {
    val y = when(col(labelCol), 1L).otherwise(0L)
    val perCat = df.groupBy(col(catCol))
      .agg(count(lit(1)).as("n_k"), sum(y).as("sum_k"))
    df.select(col(idCol), col(catCol), y.as("y"))
      .join(broadcast(perCat), Seq(catCol))
      .withColumn("loo_ppm", expr(
        """CASE WHEN n_k <= 1 THEN NULL
           ELSE 1000000L * (sum_k - y) div (n_k - 1) END"""))
      .select(col(idCol), col(catCol), col("y"), col("n_k"),
        col("loo_ppm"))
  }

  /** Neyman-optimal stratified sample allocation: stratum h of a fixed
    * budget n gets n·N_h·S_h / Σ N_h·S_h — proportional-to-size×spread,
    * the variance-minimizing design for estimating a corpus mean from a
    * bounded labeling/eval budget (a high-variance stratum needs more
    * probes than its row share). Engine-portable determinism: the
    * stratum variance is ONE double division of exact DECIMAL(38,0)
    * moments ((n·Σx² − (Σx)²)/(n(n−1)) — both operands exact, the
    * division IEEE-rounds identically), S_h its IEEE sqrt, and the
    * weight is FLOORED to an integer before the cross-stratum sum —
    * integer sums are order-free where a double Σ N_h·S_h would depend
    * on reduction order. Singleton strata carry zero spread weight.
    *
    * Scale shape: one partial-aggregated groupBy to the stratum domain,
    * one one-row weight total broadcast back — corpus rows move once.
    */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: String,
                       budget: Long): DataFrame = {
    val stats = df
      .select(col(stratumCol).as("stratum"),
        col(valueCol).cast("long").as("x"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_h"), sum(col("x")).as("s1"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("s2"))
      .withColumn("w_h", expr(
        """CASE WHEN n_h <= 1 THEN 0L ELSE
           CAST(floor(n_h * sqrt(
             CAST(CAST(n_h AS DECIMAL(38,0)) * s2
                  - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
             / CAST(CAST(n_h AS DECIMAL(38,0)) * (n_h - 1) AS DOUBLE)))
           AS BIGINT) END"""))
    stats
      .withColumn("alloc", expr(
        s"""CASE WHEN sum(w_h) OVER () = 0 THEN 0L
            ELSE ${budget}L * w_h div sum(w_h) OVER () END"""))
      .select(col("stratum"), col("n_h"), col("w_h"), col("alloc"))
      .orderBy("stratum")
  }

  /** Leave-one-source-out ablation card: every per-source row reports
    * the corpus metric RECOMPUTED WITHOUT that source — the cheap first
    * pass of a data-mixture ablation (which source is dragging mean
    * quality / shifting the language mix), exact from one set of global
    * and per-source sums (ΣT − Σ_h over N_T − N_h), no per-source
    * rescan. Deltas subtract independently-floored quantities, so every
    * reported value is exactly reproducible.
    *
    * Scale shape: ONE partial-aggregated groupBy to the source domain;
    * the global row is a window over that bounded frame. Corpus rows
    * move once.
    */
  def sourceAblation(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("source"), col("n_chars").cast("long").as("x"),
        when(col("lang") === "en", 1L).otherwise(0L).as("en"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("sx"),
        sum(col("en")).as("sen"))
    per
      .withColumn("tot_n", expr("sum(n_docs) OVER ()"))
      .withColumn("tot_x", expr("sum(sx) OVER ()"))
      .withColumn("tot_en", expr("sum(sen) OVER ()"))
      .withColumn("mean_chars_e2", expr("100L * tot_x div tot_n"))
      .withColumn("mean_without_e2", expr(
        """CASE WHEN tot_n = n_docs THEN NULL
           ELSE 100L * (tot_x - sx) div (tot_n - n_docs) END"""))
      .withColumn("en_ppm_without", expr(
        """CASE WHEN tot_n = n_docs THEN NULL
           ELSE 1000000L * (tot_en - sen) div (tot_n - n_docs) END"""))
      .withColumn("delta_mean_e2",
        col("mean_without_e2") - col("mean_chars_e2"))
      .select(col("source"), col("n_docs"), col("mean_chars_e2"),
        col("mean_without_e2"), col("en_ppm_without"),
        col("delta_mean_e2"))
      .orderBy("source")
  }

  /** Deterministic negative sampling for contrastive / word2vec-style
    * training pairs: for every positive (center, context) skip-gram,
    * draw k negatives from the unigram^(3/4)-smoothed vocabulary
    * distribution — the Mikolov smoothing that keeps rare words
    * sampleable without letting stopwords dominate. f^(3/4) computes as
    * `sqrt(f·sqrt(f))` — IEEE sqrt/·//floor are all correctly rounded,
    * so the smoothed weights are bit-identical in any engine (the one
    * libm-free spelling of a fractional power).
    *
    * Sampling is the alias-table idea done relationally: integer
    * weights (bounded resolution `res`, so the table is vocab-sized no
    * matter the corpus) lay out cumulative [lo, hi) ranges; each draw
    * is a salted md5 point u ∈ [0, W) that lands in exactly ONE range.
    * The containment probe routes through fixed cells (the rangeJoin
    * trick): ranges explode into the ≤64 cells they cover, probes
    * equi-join on their cell, a codegen'd residual BETWEEN closes it —
    * no BNLJ, no per-probe scan of the vocabulary. Collisions with the
    * positive context are FLAGGED, never silently resampled (the
    * undecided-leftovers convention).
    *
    * Scale shape: one corpus scan for counts, a top-V take, bounded
    * range/cell frames broadcast; the probe frame is pairs×k rows
    * moving through one hash join. Deterministic given (doc, pos, j).
    */
  def negativeSamples(docs: DataFrame, topV: Int = 20, k: Int = 3,
                      res: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topV >= 2 && k >= 1 && res >= 1)
    def f34(c: Column): Column = sqrt(c.cast("double") * sqrt(c.cast("double")))
    val top = docs
      .select(explode(TextAnalysis.tokensCol(lower(col("text"))))
        .as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("token")).limit(topV)
    val mx = top.agg(max(f34(col("f"))).as("m"))
    val w = top.crossJoin(broadcast(mx))
      .withColumn("w", greatest(lit(1L),
        floor(lit(res.toDouble) * f34(col("f")) / col("m")).cast("long")))
    // bounded: topV rows; feeds the total, the cells, and the verify
    val ranges = w
      .withColumn("hi", sum(col("w")).over(Window.orderBy("token")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("lo", col("hi") - col("w"))
      .select(col("token").as("neg_token"), col("lo"), col("hi"))
      .localCheckpoint(true)
    val tot = ranges.agg(max(col("hi")).as("wsum"))
      .withColumn("cw", expr("greatest(1L, wsum div 64L)"))
    val cells = ranges.crossJoin(broadcast(tot))
      .select(col("neg_token"), col("lo"), col("hi"),
        explode(expr("sequence(lo div cw, (hi - 1) div cw)")).as("cell"))
    val pairs = docs.filter(col("doc_id") < 50)
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokensCol(lower(col("text"))))
          .as(Seq("pos", "center")))
      .withColumn("context", lead(col("center"), 1).over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .filter(col("context").isNotNull)
    val probes = pairs
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("center"), col("context"),
        explode(array((0 until k).map(j => lit(j.toLong)): _*)).as("j"))
      .crossJoin(broadcast(tot))
      .withColumn("u", expr(
        "CAST(conv(substring(md5(concat('neg:', CAST(doc_id AS STRING)," +
          " ':', CAST(pos AS STRING), ':', CAST(j AS STRING)))," +
          " 1, 12), 16, 10) AS BIGINT) % wsum"))
      .withColumn("cell", expr("u div cw"))
    probes.join(cells, Seq("cell"))
      .filter(col("u") >= col("lo") && col("u") < col("hi"))
      .select(col("doc_id"), col("pos"), col("center"), col("context"),
        col("j"), col("neg_token"),
        (col("neg_token") === col("context")).as("is_collision"))
      .orderBy("doc_id", "pos", "j")
  }

  /** Class-balanced batch assembly — the batcher for contrastive /
    * classification training where every batch must carry the SAME
    * per-class composition: within each class, rows order by a salted
    * md5 of the id (deterministic shuffle, the shard_shuffled recipe),
    * slot r fills batch (r−1) div `perClass`. Trailing batches where
    * some class ran dry are flagged `complete = false` (the trainer
    * drops or pads them — visible, never silent). A global row_number
    * would serialize the corpus; per-class windows shuffle once on the
    * class key and the completeness check is a bounded
    * (batch, class)-cell rollup.
    *
    * Input: (`idCol`, `classCol`); output one row per input row:
    * (id, cls, batch, slot, complete).
    */
  def balancedBatches(df: DataFrame, classCol: String, idCol: String,
                      perClass: Int = 4): DataFrame = {
    require(perClass >= 1)
    import org.apache.spark.sql.expressions.Window
    val nClasses = df.select(col(classCol)).distinct().count() // 1 scalar
    val ranked = df
      .select(col(idCol).as("id"), col(classCol).cast("long").as("cls"))
      .withColumn("h",
        md5(concat(lit("bb:"), col("id").cast("string"))))
      .withColumn("r", row_number().over(
        Window.partitionBy("cls").orderBy("h", "id")).cast("long"))
      .withColumn("batch", expr(s"(r - 1) div ${perClass}L"))
      .withColumn("slot", expr(s"(r - 1) % ${perClass}L"))
    val full = ranked.groupBy(col("batch"), col("cls"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n_classes"), min(col("n")).as("min_n"))
      .select(col("batch"),
        (col("n_classes") === nClasses &&
          col("min_n") === perClass.toLong).as("complete"))
    ranked.join(full, "batch")
      .select(col("id"), col("cls"), col("batch"), col("slot"),
        col("complete"))
  }

  /** Exact Shapley data valuation of SOURCES on vocabulary coverage —
    * the axiomatic sibling of [[docs_ablation]]'s leave-one-out: the
    * characteristic function v(T) = distinct token types covered by
    * source coalition T is submodular (coverage), so marginal and
    * Shapley views genuinely differ, and the bounded group count makes
    * the 2^c coalition table exact (the `events_shapley` machinery).
    * The top `topK` sources by doc count (ties by name) are valued
    * individually; the long tail pools into `other` — the realistic
    * shape when source counts are unbounded.
    *
    * Scale shape: one vocab-sized distinct + bit-OR groupBy compresses
    * the corpus to ≤ 2^(topK+1) mask cells; the coalition zeta and the
    * factorial-weighted marginals run on the driver over that bounded
    * frame (the bounded-pull class). φ·c! stays integral; efficiency
    * Σφ·c! = c!·v(full) is asserted.
    */
  def shapleyVocabValue(docs: DataFrame, topK: Int = 5): DataFrame = {
    require(topK >= 1 && topK <= 11)
    val top = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("source")).limit(topK)
      .collect().map(_.getString(0)).toSeq // bounded: topK rows
    // The generated SQL twin sizes its coalition table to topK + 1 at
    // registration time; a corpus with fewer sources would silently
    // shrink c here and diverge — fail loudly instead.
    require(top.length == topK,
      s"shapleyVocabValue: corpus has only ${top.length} sources, " +
        s"need >= $topK (lower topK to match)")
    val c = top.length + 1
    val grpExpr = top.zipWithIndex.foldRight(lit(top.length.toLong)) {
      case ((s, i), els) => when(col("source") === s, lit(i.toLong))
        .otherwise(els)
    }
    val cells = docs
      .select(grpExpr.as("grp"),
        explode(array_distinct(
          split(trim(lower(col("text"))), "\\s+"))).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct()
      .groupBy(col("tok"))
      .agg(sum(expr("shiftleft(1L, CAST(grp AS INT))")).as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("n"))
      .collect()                        // bounded: <= 2^c cells
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = (1L << c) - 1L
    // coverage: v(T) = # tokens whose source mask intersects T
    val v = (0L to full).map { t =>
      t -> cells.collect { case (m, n) if (m & t) != 0L => n }.sum
    }.toMap
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val cFact = fact(c)
    val labels = top.zipWithIndex.map { case (s, i) => (i.toLong, s) } :+
      ((top.length.toLong, "other"))
    val rows = labels.map { case (i, label) =>
      val bit = 1L << i.toInt
      val phiScaled = (0L to full).filter(t => (t & bit) == 0L).map { t =>
        val size = java.lang.Long.bitCount(t)
        fact(size) * fact(c - 1 - size) * (v(t | bit) - v(t))
      }.sum
      (i, label, cells.getOrElse(bit, 0L), phiScaled,
        1000000L * phiScaled / math.max(cFact * v(full), 1L))
    }
    assert(rows.map(_._4).sum == cFact * v(full),
      "Shapley efficiency violated (v(empty) = 0 for coverage)")
    val spark = docs.sparkSession
    import spark.implicits._
    rows.toDF("grp", "source", "n_exclusive_tokens", "phi_scaled",
      "phi_ppm").orderBy("grp")
  }

  /** DoReMi-shaped domain reweighting — the multiplicative-weights
    * update that tilts the training mixture toward domains with the
    * largest EXCESS loss, run here with a deterministic loss proxy so
    * the update arithmetic (the part a real run reuses verbatim) is
    * engine-exact. Per domain: `signal_e6 = (Σ n_chars · 10⁶) div n`
    * (mean doc length, the proxy a production run replaces with
    * per-domain model loss), `excess_e6 = max(signal − ref, 0)` against
    * the corpus-wide mean — the clamp is the Warner rule (a negative
    * operand is where Spark div and DuckDB // disagree). Then `rounds`
    * multiplicative steps, all BIGINT:
    *
    *   w ← w + (w · excess) div max_excess   (multiplier ∈ [1, 2])
    *   w ← w·10⁶ div Σw                      (re-normalize to ppm)
    *
    * A zero-excess corpus (all domains at the mean) keeps the uniform
    * mix — the max_excess guard makes the degenerate branch real. The
    * domain frame is |sources|-sized: every join is a one-row or
    * bounded broadcast, and the corpus is touched by exactly ONE
    * partial-aggregated groupBy. Fixed `rounds` keeps the unrolled
    * DuckDB oracle exact. Output: `(source, n_docs, signal_e6,
    * excess_e6, weight_ppm)`.
    */
  def doremiWeights(docs: DataFrame, rounds: Int = 5,
                    srcCol: String = "source"): DataFrame = {
    require(rounds >= 1 && rounds <= 20)
    val per = docs.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("chars"))
      .withColumn("signal_e6",
        expr("cast(cast(chars AS DECIMAL(38,0)) * 1000000 div n_docs" +
          " AS BIGINT)"))
    val ref = per.agg(
      expr("cast(cast(sum(chars) AS DECIMAL(38,0)) * 1000000" +
        " div sum(n_docs) AS BIGINT)").as("ref_e6"))
    val dom = per.crossJoin(broadcast(ref))
      .withColumn("excess_e6",
        greatest(col("signal_e6") - col("ref_e6"), lit(0L)))
      .localCheckpoint(true) // tiny; referenced every round
    val maxE = dom.agg(max(col("excess_e6")).as("max_e6"))
    var w = dom.select(col(srcCol), col("n_docs"), col("signal_e6"),
      col("excess_e6"), lit(1000000L).as("w"))
    var i = 0
    while (i < rounds) {
      val raw = w.crossJoin(broadcast(maxE))
        .withColumn("w_raw",
          when(col("max_e6") <= 0L, col("w"))
            .otherwise(col("w") +
              expr("(w * excess_e6) div max_e6")))
      val tot = raw.agg(sum(col("w_raw")).as("w_tot"))
      w = raw.crossJoin(broadcast(tot))
        .select(col(srcCol), col("n_docs"), col("signal_e6"),
          col("excess_e6"),
          expr("(w_raw * 1000000L) div w_tot").as("w"))
        .localCheckpoint(true) // raw referenced by its sum AND the rescale
      i += 1
    }
    w.select(col(srcCol), col("n_docs"), col("signal_e6"),
      col("excess_e6"), col("w").as("weight_ppm"))
  }
}
