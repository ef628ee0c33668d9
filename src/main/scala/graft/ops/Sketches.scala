package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size mergeable sketches — the cardinality / frequency /
  * membership summaries a 100 TB pipeline keeps instead of exact state.
  * All three are built from md5-prefix hashes (the engine-portable
  * integer-hash recipe: the first k hex chars of the digest equal the
  * first 4k bits), so every sketch here is bit-reproducible across runs,
  * partitionings, AND engines — the DuckDB oracle rebuilds identical
  * registers/counters/bits in plain SQL and the registered queries are
  * hash-exact, where a murmur- or seed-dependent sketch could only ever
  * be checked rows-only.
  *
  * Scale shape shared by all three: per-partition partial aggregation
  * collapses input rows to a bounded cell space (2^b registers, d·w
  * counters, m bit positions) BEFORE any exchange, so the shuffle volume
  * is O(sketch size × groups), independent of input row count; sketches
  * merge associatively (max / sum / union) for multi-day or multi-corpus
  * rollups.
  */
object Sketches {

  /** Payload bit width: a 60-bit hash (15 hex chars — fits a signed
    * BIGINT in both engines) split into `b` register-index bits and
    * `60-b` payload bits.
    */
  private val HashHexChars = 15

  /** HyperLogLog registers for `countDistinct(valueCol)` per group:
    * one row per non-empty register, `(groupCols*, bucket, rho_max)`.
    *
    * bucket = top `b` hash bits; rho = leading-zero count of the
    * remaining `60-b` payload bits + 1, computed portably as
    * `(60-b) + 1 - length(ltrim(bin(payload),'0'))` (zero payload gives
    * the empty string, length 0 — the rho = 61-b maximum falls out
    * without a special case). Registers merge by `max`, so partial
    * aggregation bounds per-partition state at 2^b longs per group
    * regardless of input cardinality — the whole point of the sketch.
    */
  def hllRegisters(df: DataFrame, valueCol: String,
                   groupCols: Seq[String], b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, s"register bits out of range: $b")
    val payloadBits = 60 - b
    val payloadMod = 1L << payloadBits
    val h = conv(substring(md5(col(valueCol).cast("string")), 1,
      HashHexChars), 16, 10).cast("long")
    df.withColumn("h", h)
      .withColumn("bucket", expr(s"h div ${payloadMod}L"))
      .withColumn("rho",
        lit(payloadBits + 1) -
          length(ltrim(bin(col("h") % payloadMod), "0")))
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).cast("long").as("rho_max"))
  }

  /** Raw HyperLogLog estimate per group from [[hllRegisters]]:
    * `(groupCols*, n_registers, sum_scaled, est)`.
    *
    * Engine-exact arithmetic: instead of summing dyadic fractions
    * 2^-M[j] in floating point (whose rounding would depend on reduction
    * order), each register contributes the INTEGER 2^(maxRho - M[j]) and
    * empty registers 2^maxRho, so `sum_scaled` is an exact BIGINT and
    * the estimate alpha_m·m²·2^maxRho / sum_scaled is ONE IEEE double
    * division of a literal by an integer — identical in any engine. The
    * raw estimate is reported without the small-range linear-counting
    * correction (it needs `ln`, which drifts across libm builds; callers
    * needing small-range accuracy have exact countDistinct).
    */
  def hllCount(df: DataFrame, valueCol: String,
               groupCols: Seq[String], b: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, valueCol, groupCols, b), groupCols, b)

  /** Estimate from a register table (as produced by [[hllRegisters]], or
    * any max-merge of such tables): `(groupCols*, n_registers,
    * sum_scaled, est)`. Exposed separately so merged sketches — union
    * register tables, `max(rho_max)` per (group, bucket) — reuse the
    * identical arithmetic.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
                  b: Int = 8): DataFrame = {
    val m = 1 << b
    val maxRho = 60 - b + 1
    val alphaScaled = // alpha_m * m^2 * 2^maxRho, folded once in Scala
      0.7213 / (1.0 + 1.079 / m) * m * m * Math.pow(2.0, maxRho)
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_registers"),
        sum(expr(s"shiftleft(cast(1 as bigint), $maxRho - rho_max)"))
          .as("present_scaled"))
      .withColumn("sum_scaled",
        col("present_scaled") +
          (lit(m.toLong) - col("n_registers")) * lit(1L << maxRho))
      .withColumn("est", lit(alphaScaled) / col("sum_scaled").cast("double"))
      .drop("present_scaled")
  }

  /** Rolling N-day distinct counts from merged daily HLL sketches — the
    * canonical production pattern for "distinct users over the trailing
    * week" at 100 TB: the exact form re-scans N days of raw rows per
    * day, while this keeps ONE register table per day (≤ 2^b rows) and
    * answers every day's window by max-merging ≤ N·2^b register rows.
    * Each day's registers contribute to the `windowDays` windows ending
    * on or after it (the same forward-contribution trick as
    * `Events.rollingActiveUsers`), restricted to days present in the
    * data.
    */
  def rollingDistinctHll(df: DataFrame, valueCol: String, dayCol: String,
                         windowDays: Int = 7, b: Int = 8): DataFrame = {
    require(windowDays >= 1)
    val regs = hllRegisters(df, valueCol, Seq(dayCol), b)
    val days = df.select(col(dayCol)).distinct()
    val contrib = regs
      .select(col(dayCol), col("bucket"), col("rho_max"),
        explode(expr(s"sequence(0, ${windowDays - 1})")).as("g"))
      .select((col(dayCol) + col("g")).as(dayCol), col("bucket"),
        col("rho_max"))
    val merged = contrib.join(broadcast(days), Seq(dayCol))
      .groupBy(col(dayCol), col("bucket"))
      .agg(max(col("rho_max")).as("rho_max"))
    hllEstimate(merged, Seq(dayCol), b)
  }

  /** Count-min sketch of `itemCol` frequencies: `depth` independent
    * md5-salted hash rows of `width` counters, one output row per
    * non-empty cell `(depth, cell, cnt)`. Merging two sketches is
    * cell-wise addition; estimates never undercount. The input collapses
    * to ≤ depth·width cells through partial aggregation — constant
    * shuffle volume at any corpus size.
    */
  def cmsSketch(items: DataFrame, itemCol: String,
                depth: Int = 4, width: Int = 1024): DataFrame =
    cmsSketchWeighted(
      items.groupBy(col(itemCol).as("item")).agg(count(lit(1)).as("w")),
      "item", "w", depth, width)

  /** [[cmsSketch]] over pre-aggregated `(item, weight)` counts — the
    * shape to use when item frequencies are already rolled up (or when
    * the raw item stream would explode `depth`× before aggregating:
    * aggregating FIRST shrinks the explode input from stream size to
    * vocabulary size).
    */
  def cmsSketchWeighted(counts: DataFrame, itemCol: String,
                        weightCol: String, depth: Int = 4,
                        width: Int = 1024): DataFrame =
    counts
      .select(explode(expr(s"sequence(0, ${depth - 1})")).as("depth"),
        col(itemCol).as("item"), col(weightCol).as("w"))
      .withColumn("cell",
        conv(substring(md5(concat(col("depth").cast("string"), lit(":"),
          col("item"))), 1, 8), 16, 10).cast("long") % width)
      .groupBy(col("depth"), col("cell"))
      .agg(sum(col("w")).as("cnt"))

  /** Count-min frequency estimates for a candidate item set:
    * `(item, est)` where `est = min over rows of cnt[row][h_row(item)]`
    * (the classic min-over-depths upper bound; collisions only ever
    * inflate). The candidate side joins the ≤ depth·width-cell sketch —
    * broadcast-sized by construction — so the probe never shuffles the
    * sketch and the join is keyed, never all-pairs.
    */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame,
                  itemCol: String, depth: Int = 4,
                  width: Int = 1024): DataFrame =
    candidates
      .select(col(itemCol).as("item"))
      .distinct()
      .select(col("item"),
        explode(expr(s"sequence(0, ${depth - 1})")).as("depth"))
      .withColumn("cell",
        conv(substring(md5(concat(col("depth").cast("string"), lit(":"),
          col("item"))), 1, 8), 16, 10).cast("long") % width)
      .join(broadcast(sketch), Seq("depth", "cell"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** KMV (k minimum values) set sketch: the `k` smallest distinct
    * 60-bit md5-prefix hashes per set — the fixed-size summary that,
    * unlike HLL, supports set INTERSECTION estimates (audience overlap,
    * corpus contamination rate) because the minima are a uniform sample
    * of each set's hash space. Deterministic: the k smallest distinct
    * hashes are a pure set property, independent of partitioning.
    *
    * Two-level selection keeps every reducer bounded: per-(set,
    * input-partition) k-minima first (the ANN partial-top-k shape), then
    * the global k over the ≤ k·P survivors — no set's full distinct
    * stream ever lands on one reducer.
    */
  def kmvSketch(df: DataFrame, setCol: String, valueCol: String,
                k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 16)
    val hashed = df.select(col(setCol).as("set_id"),
      conv(substring(md5(col(valueCol).cast("string")), 1, HashHexChars),
        16, 10).cast("long").as("h"))
      .distinct()
    val partial = hashed
      .withColumn("pid", spark_partition_id())
      .withColumn("rn",
        row_number().over(Window.partitionBy("set_id", "pid").orderBy("h")))
      .filter(col("rn") <= k).drop("pid", "rn")
    partial
      .withColumn("rn",
        row_number().over(Window.partitionBy("set_id").orderBy("h")))
      .filter(col("rn") <= k)
      .select(col("set_id"), col("h"))
  }

  /** Pairwise overlap estimates from a [[kmvSketch]]: for every set
    * pair (a < b), merge the two k-minima lists, keep the union's k
    * smallest, and estimate
    *
    *   jaccard_est = |both-present among union minima| / n_union
    *   union_est   = n_union if the sketch holds the whole union,
    *                 else (k-1)·2^60 / theta   (theta = k-th minimum)
    *   inter_est   = jaccard_est · union_est
    *
    * Every step is deterministic integer work plus single-rounded double
    * expressions, so the DuckDB twin hash-matches. Pair enumeration
    * crosses the DISTINCT set ids — bounded by |sets|², the number of
    * corpora/segments being compared, never data-sized; per-pair state
    * is ≤ 2k rows.
    */
  def kmvOverlapPairs(sketch: DataFrame, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // |sets|² pair enumeration: a broadcast cross of the DISTINCT set
    // ids — set-count-sized (corpora/segments), never data-sized
    val sets = sketch.select(col("set_id")).distinct()
    val pairs = sets.select(col("set_id").as("set_a"))
      .crossJoin(broadcast(sets.select(col("set_id").as("set_b"))))
      .filter(col("set_a") < col("set_b"))
    val contrib = sketch.join(pairs, col("set_id") === col("set_a"))
      .select(col("set_a"), col("set_b"), col("h"), lit("a").as("side"))
      .unionByName(sketch.join(pairs, col("set_id") === col("set_b"))
        .select(col("set_a"), col("set_b"), col("h"), lit("b").as("side")))
    val uniq = contrib.groupBy(col("set_a"), col("set_b"), col("h"))
      .agg(countDistinct(col("side")).as("sides"))
    val ranked = uniq.withColumn("rn", row_number().over(
        Window.partitionBy("set_a", "set_b").orderBy("h")))
      .filter(col("rn") <= k)
    ranked.groupBy(col("set_a"), col("set_b"))
      .agg(max(col("h")).as("theta"), count(lit(1)).as("n_union"),
        sum(when(col("sides") === 2, lit(1L)).otherwise(lit(0L)))
          .as("n_common"))
      .withColumn("jaccard_est",
        col("n_common").cast("double") / col("n_union").cast("double"))
      .withColumn("union_est",
        when(col("n_union") < k, col("n_union").cast("double"))
          .otherwise(lit((k - 1).toDouble * math.pow(2.0, 60))
            / col("theta").cast("double")))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
  }

  /** Bloom-filter bit positions for a key set: `k` md5-salted hashes
    * into `[0, m)`, deduplicated — the compact membership summary a
    * runtime filter broadcasts. At most `m` rows regardless of key
    * count; build cost is one partial-aggregated distinct on the
    * position.
    */
  def bloomBits(keys: DataFrame, keyCol: String,
                k: Int = 3, m: Int = 65536): DataFrame =
    keys
      .select(explode(expr(s"sequence(0, ${k - 1})")).as("salt"),
        col(keyCol).cast("string").as("key"))
      .select((conv(substring(md5(concat(col("salt").cast("string"),
        lit(":"), col("key"))), 1, 8), 16, 10).cast("long") % m).as("pos"))
      .distinct()

  /** Bloom-filter probe: keep probe rows whose key tests positive in
    * `bits` (every one of the `k` positions present). Each of the `k`
    * membership tests is a broadcast LEFT SEMI join against the ≤ m-row
    * bit set, so the probe side NEVER shuffles — the runtime-filter
    * pattern that prunes a fact scan before an expensive join. False
    * positives pass by design (rate ≈ (1-e^{-kn/m})^k); there are no
    * false negatives.
    */
  def bloomFilter(probe: DataFrame, keyCol: String, bits: DataFrame,
                  k: Int = 3, m: Int = 65536): DataFrame =
    (0 until k).foldLeft(probe) { (df, salt) =>
      df.join(broadcast(bits),
        conv(substring(md5(concat(lit(salt.toString), lit(":"),
          col(keyCol).cast("string"))), 1, 8), 16, 10).cast("long") % m
          === bits("pos"),
        "left_semi")
    }

  /** AMS second-frequency-moment (F2) sketch: `depth` independent ±1
    * md5-sign sums, one row per salt `(salt, s_sum, est)` where
    * `s_sum = Σ_key f_key · sign_salt(key)` and `est = s_sum²` is an
    * unbiased F2 estimate. F2 = Σ f² is the self-join size / skew
    * measure a planner wants BEFORE running the join, and the sketch
    * gets it in one pass with `depth` longs of state instead of per-key
    * counts. Take the median of `est` across salts (depth odd → an
    * exact order statistic, no averaging) as the combined estimate.
    *
    * Scale shape (the CMS lesson): rows first collapse to the `(key, n)`
    * vocabulary by partial-aggregated count, and the ×depth salt
    * expansion runs over the VOCABULARY, not the stream; the final
    * aggregation is `depth` groups. Everything is integer arithmetic on
    * md5-prefix signs, so the sketch is bit-reproducible across engines.
    */
  def amsF2(df: DataFrame, keyCol: String, depth: Int = 7): DataFrame = {
    require(depth >= 1 && depth % 2 == 1, s"depth must be odd: $depth")
    df.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), col("n"),
        explode(sequence(lit(0), lit(depth - 1))).as("salt"))
      .withColumn("sign", lit(1) -
        lit(2) * (conv(substring(md5(concat(col("k"), lit(":"),
          col("salt").cast("string"))), 1, 8), 16, 10).cast("long") % 2))
      .groupBy(col("salt").cast("long").as("salt"))
      .agg(sum(col("n") * col("sign")).as("s_sum"))
      .withColumn("est", col("s_sum") * col("s_sum"))
  }

  /** AMS inner-product join-size estimate: with the SAME signs on both
    * sides, `E[S_A·S_B] = Σ_k fA(k)·fB(k)` — the equi-join output size —
    * so a planner can size `A ⋈ B` from two `depth`-long sketches built
    * in one pass over each side, long before running the join. Returns
    * one row per salt `(salt, s_a, s_b, est = s_a·s_b)`; combine with
    * the odd-depth median as in [[amsF2]]. Sketch build cost is the
    * amsF2 shape (vocabulary-sized salt expansion, `depth` groups); the
    * combine is a `depth`-row equi-join.
    */
  def amsJoinSize(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
                  depth: Int = 7): DataFrame = {
    val skA = amsF2(a, aKey, depth).select(col("salt"), col("s_sum").as("s_a"))
    val skB = amsF2(b, bKey, depth).select(col("salt"), col("s_sum").as("s_b"))
    skA.join(skB, Seq("salt"))
      .withColumn("est", col("s_a") * col("s_b"))
  }

  /** Mergeable quantile sketch via a DERANDOMIZED bottom-k row sample:
    * keep the k rows with the smallest `md5("qs:" || id)` — a uniform
    * sample whose membership is a pure function of the row id, so (a)
    * it is bit-reproducible across runs/partitionings/engines (the
    * replica-min-hash family, and unlike Spark's approxQuantile whose
    * GK merge is accumulation-order-dependent), and (b) it MERGES: the
    * bottom-k of a union is computable from the per-shard bottom-k's,
    * the property that lets per-partition/per-day sketches roll up
    * without rescanning. Estimates: quantile q ≈ the ceil(q·k')-th
    * order statistic of the sampled values (k' = |sample|), with the
    * deterministic (value, id) tie order.
    *
    * Scale shape: the sample is a TakeOrdered over the md5 column —
    * per-partition k-row heads merged once on the driver side of the
    * plan, never a global sort; the quantile close runs on the k-row
    * frame. One full scan total (plus the count for n_total, a
    * column-pruned second scan — pass a known total to skip it).
    * Error: standard bottom-k sampling bounds, ~1/√k on the rank.
    *
    * Output: one row per requested ppm quantile
    * (q_ppm, est, n_sample, n_total).
    */
  def quantileSketch(df: DataFrame, valueCol: String, idCol: String,
                     k: Int = 1024,
                     qsPpm: Seq[Long] = Seq(100000L, 250000L, 500000L,
                       750000L, 900000L)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2 && qsPpm.nonEmpty)
    val spark = df.sparkSession
    import spark.implicits._
    val tagged = df.select(col(valueCol).cast("long").as("v"),
        col(idCol).cast("string").as("id"))
      .withColumn("h", md5(concat(lit("qs:"), col("id"))))
    val sample = tagged.orderBy(col("h").asc, col("id").asc).limit(k)
    val ranked = sample.withColumn("r", row_number().over(
      Window.orderBy(col("v"), col("id"))).cast("long"))
    val nSample = ranked.agg(max(col("r")).as("n_sample"))
    val nTotal = df.agg(count(lit(1)).as("n_total"))
    qsPpm.toDF("q_ppm")
      .crossJoin(broadcast(nSample))
      .crossJoin(broadcast(nTotal))
      .withColumn("r", greatest(lit(1L),
        expr("(q_ppm * n_sample + 999999) div 1000000")))
      .join(ranked.select(col("r"), col("v").as("est")), Seq("r"))
      .select(col("q_ppm"), col("est"), col("n_sample"), col("n_total"))
  }

  /** Power-of-two DDSketch — RELATIVE-error quantiles from a mergeable
    * bucket-count table, the complement of [[quantileSketch]]'s
    * rank-error bottom-k: bucket(v) = bit_length(v) (γ = 2, so any
    * quantile answer is within 2× of the true value at ANY corpus size
    * with ~64 buckets of state, exactly mergeable by count addition —
    * the latency-histogram industry shape). bit_length is the portable
    * `length(ltrim(bin(v), '0'))` (zero falls out to bucket 0, the HLL
    * rho recipe); the quantile walk returns the bucket midpoint
    * 3·2^(b−2) — all integers, no libm anywhere.
    *
    * Scale shape: one partial-agg shuffle to ≤ 64 bucket cells;
    * quantile extraction is a window over that bounded frame. Strictly
    * positive values expected (cents/micros); zeros land in bucket 0
    * with midpoint 0.
    */
  def ddSketch(df: DataFrame, valueCol: String,
               qsPpm: Seq[Long] = Seq(500000L, 900000L, 990000L))
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qsPpm.nonEmpty && qsPpm.forall(q => q >= 1 && q <= 1000000))
    val spark = df.sparkSession
    import spark.implicits._
    // TRIM(LEADING ...) — Spark's two-arg ltrim is the legacy
    // (trimStr, str) order (the r12 packed-HLL rho trap)
    val buckets = df
      .select(expr(s"length(TRIM(LEADING '0' FROM bin($valueCol)))")
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val walked = buckets
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(buckets.agg(sum(col("n")).as("n_total"))))
    qsPpm.toDF("q_ppm")
      .join(walked,
        col("cum") >= expr("(q_ppm * n_total + 999999) div 1000000"))
      .groupBy(col("q_ppm"))
      .agg(min(col("bucket")).cast("long").as("bucket"),
        max(col("n_total")).as("n_total"))
      .select(col("q_ppm"), col("bucket"),
        expr("CASE WHEN bucket >= 2 THEN 3L * shiftleft(1L, " +
          "CAST(bucket AS INT) - 2) ELSE bucket END").as("est_mid"),
        col("n_total"))
  }

  /** Two-phase distributed heavy hitters — every item whose global
    * count strictly exceeds `n/c`, EXACTLY, without ever shuffling or
    * collecting the full vocabulary (the Misra-Gries/SpaceSaving role,
    * derandomized). Rows are spread across `buckets` cells by an
    * md5-prefix hash of `rowKeyCol` (a unique-per-row key — fold the
    * VALUE in when ids repeat, the r11 sample-id rule); phase 1 keeps,
    * per bucket, only items with `cnt_b·c > n_b` — by pigeonhole any
    * global heavy hitter (G > n/c = Σ n_b/c) must exceed the local
    * threshold in at least one bucket, so the candidate set is a
    * SUPERSET of the answer and is bounded by buckets·c rows regardless
    * of vocabulary size. Phase 2 recounts ONLY the candidates (broadcast
    * semi-join — the item stream never reshuffles on the full key space)
    * and applies the exact global cut. Both phases are plain count
    * algebra → the DuckDB twin is the identical SQL and the registered
    * query is hash-exact.
    *
    * Scale shape: phase 1 is one partial-aggregated groupBy keyed
    * (bucket, item) — at 100 TB the combine collapses each partition to
    * its local distinct items before the exchange; phase 2's candidate
    * side is ≤ buckets·c rows (broadcast), so the recount is a
    * map-side filter + one bounded-key shuffle. Output:
    * `(item, n_occurrences, share_ppm)` for items with cnt·c > n.
    */
  def heavyHitters(items: DataFrame, itemCol: String, rowKeyCol: String,
                   c: Int = 200, buckets: Int = 32): DataFrame = {
    require(c >= 2 && buckets >= 1)
    val bucketed = items.select(col(itemCol).as("item"),
      (conv(substring(md5(col(rowKeyCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % buckets).as("bucket"))
    val perBucket = bucketed.groupBy(col("bucket"), col("item"))
      .agg(count(lit(1)).as("cnt_b"))
    val bucketTotals = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_b"))
    val candidates = perBucket.join(bucketTotals, "bucket")
      .filter(col("cnt_b") * c > col("n_b"))
      .select(col("item")).distinct() // <= buckets*c rows by construction
    val total = items.agg(count(lit(1)).as("n_total"))
    items.select(col(itemCol).as("item"))
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("n_occurrences"))
      .crossJoin(broadcast(total))
      .filter(col("n_occurrences") * c > col("n_total"))
      .select(col("item"), col("n_occurrences"),
        expr("n_occurrences * 1000000L div n_total").as("share_ppm"))
  }
}
