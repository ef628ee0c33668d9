package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join/aggregation pipelines exercising the engine end-to-end (bench
  * headliners). Monetary sums go through `decimal(18,2|4)` so the result is
  * exact and engine-independent, then back to double for a stable schema.
  */
object Analytics {

  /** Exact, order-independent sum of a double column: round to a decimal
    * at fixed scale, sum exactly, cast back.
    */
  def exactSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Pricing summary (TPC-H Q1 shape): per-flag totals over lineitem. */
  def q1(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order").cast("double"))

  /** Revenue top-k (TPC-H Q3 shape): segment-filtered customer⋈orders⋈
    * lineitem; orders/customer are the small sides and broadcast.
    */
  def q3(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
         segment: String = "BUILDING", k: Int = 10): DataFrame =
    lineitem
      .join(broadcast(orders), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(k)

  /** Regional revenue rollup (TPC-H Q5 shape): the dim chain
    * region⋈nation⋈customer is broadcast; the only shuffles are the
    * lineitem⋈orders join and the final small aggregation.
    */
  def q5(region: DataFrame, nation: DataFrame, customer: DataFrame,
         orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"),
        count(lit(1)).as("n_items"))

  /** Table profile — per-column data-quality stats (row/null/distinct
    * counts, numeric min/max), long form: the sweep a pipeline runs
    * before trusting a new 100 TB drop. One aggregation per column, each
    * over a scan PRUNED to that single column, so total IO equals one
    * multi-column pass (parquet is columnar) without the row fan-out
    * Spark's Expand inserts for multiple exact count-distincts in a
    * single aggregate. Swap `count_distinct` for
    * `approx_count_distinct` when a ±2% HLL answer is acceptable and
    * the distinct cardinality is huge.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(col(c)).agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_v"),
        max(col(c)).cast("double").as("max_v"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionByName _)

  /** Cheapest supplier per part (TPC-H Q2's argmin-per-group core):
    * aggregate cost per (part, supplier), then keep each part's minimum
    * by a rank window with a deterministic supplier tie-break. Two
    * keyed shuffles — the second partitions on part alone, a strict
    * coarsening of the first — and per-part state is one row, so no
    * group ever concentrates memory. The window form (over `min_by`)
    * keeps the full costed row and a portable tie-break.
    */
  def bestSupplier(lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(exactSum(col("l_extendedprice")).as("total_cost"),
        count(lit(1)).as("n_items"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("l_partkey")
          .orderBy(asc("total_cost"), asc("l_suppkey"))))
      .filter(col("rk") === 1)
      .select(col("l_partkey"), col("l_suppkey"), col("total_cost"),
        col("n_items"))
  }

  /** Market-basket association rules — the co-purchase staple: for every
    * frequently co-occurring item pair, support counts and both
    * directional confidences (conf(a→b) = |ab| / |a|, one exact integer
    * division each). Lift needs the global basket count; left out so the
    * plan stays free of single-row broadcasts — divide by
    * `baskets.count()` downstream if needed.
    *
    * Scale shape: per-basket pair fan-out is bounded by `maxGroupSize`
    * (the coOccurrence cap: a mega-basket contributes g² pairs), pair
    * counting is one partial-aggregated shuffle on the pair key, item
    * counts join back keyed on item. `minPairCount` prunes the long tail
    * before the joins — at 100 TB the pair table below min-support is
    * the bulk of the output and never survives.
    */
  def basketRules(baskets: DataFrame, groupCol: String, itemCol: String,
                  minPairCount: Long = 3L,
                  maxGroupSize: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // referenced three times (item counts / both pair self-join sides /
    // the triple legs): materialize so the distinct + size window run
    // once (r15)
    val b = baskets.select(col(groupCol).as("g"), col(itemCol).as("item"))
      .distinct()
      .withColumn("gsz", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("gsz") <= maxGroupSize)
      .drop("gsz")
      .localCheckpoint(true)
    val itemCounts = b.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairCounts = b.as("l")
      .join(b.as("r"),
        col("l.g") === col("r.g") && col("l.item") < col("r.item"))
      .groupBy(col("l.item").as("item_a"), col("r.item").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairCount)
    pairCounts
      .join(itemCounts.select(col("item").as("item_a"),
        col("n_item").as("n_a")), "item_a")
      .join(itemCounts.select(col("item").as("item_b"),
        col("n_item").as("n_b")), "item_b")
      .select(col("item_a"), col("item_b"), col("n_pair"), col("n_a"),
        col("n_b"),
        (col("n_pair").cast("double") / col("n_a").cast("double"))
          .as("conf_a_to_b"),
        (col("n_pair").cast("double") / col("n_b").cast("double"))
          .as("conf_b_to_a"))
  }

  /** Small-quantity-order revenue probe (TPC-H Q17 shape): the classic
    * CORRELATED-AGGREGATE query — sum the revenue of lineitems whose
    * quantity is below 20% of their part's average quantity — that
    * separates engines which decorrelate (per-part averages computed
    * ONCE and joined back) from engines that re-run the subquery per
    * row. Here the decorrelation is explicit: one partial-agg pass to
    * per-part (n, Σqty), then a keyed join and the integer-exact
    * comparison `qty·10·n < 2·Σqty` (both sides BIGINT — quantities
    * are integral; no float threshold, no division), then one global
    * aggregate. The avg-threshold division never happens at all.
    */
  def q17(lineitem: DataFrame): DataFrame = {
    val perPart = lineitem
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_li"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
    lineitem
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"))
      .join(perPart, "l_partkey")
      .filter(expr("qty * 10 * n_li < 2 * sum_qty"))
      .agg(count(lit(1)).as("n_rows"),
        (exactSum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** Large-volume-order report (TPC-H Q18 shape): the classic
    * HAVING-subquery pattern — orders whose total lineitem quantity
    * reaches `minQty`, with the customer attached and the top rows by
    * volume. The "subquery" is one partial-aggregated groupBy whose
    * survivors (a tiny fraction) then drive KEYED joins back to orders
    * and customer — the fact table is touched once for the aggregate
    * and never again; the global top-k is a TakeOrdered. Quantities
    * sum as BIGINT (integral in the data model), so the threshold and
    * ordering are engine-exact.
    */
  def q18(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
          minQty: Long = 250L, topK: Int = 100): DataFrame = {
    val big = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") >= minQty)
    big
      .join(orders.select(col("o_orderkey").as("l_orderkey"),
        col("o_custkey"), col("o_totalprice")), "l_orderkey")
      .join(customer.select(col("c_custkey").as("o_custkey"),
        col("c_name")), "o_custkey")
      .select(col("o_custkey").as("c_custkey"), col("c_name"),
        col("l_orderkey").as("o_orderkey"), col("total_qty"),
        col("o_totalprice"))
      .orderBy(desc("total_qty"), asc("o_orderkey"))
      .limit(topK)
  }

  /** Sole-late-supplier blame report (TPC-H Q21 shape): suppliers who
    * were the ONLY late shipper in a multi-supplier order — the classic
    * DOUBLE-CORRELATED pattern (EXISTS another supplier ∧ NOT EXISTS
    * another LATE supplier) decorrelated into per-order supplier
    * aggregates: one pass to per-(order, supplier) any-late cells, one
    * pass to per-order (n_suppliers, n_late_suppliers), and the blame
    * predicate becomes a plain filter `n_supp ≥ 2 ∧ n_late = 1 ∧
    * this supplier late` — no correlated subquery ever executes.
    * Lateness is integer epoch-day arithmetic (ship − order > lateDays)
    * — exact in both engines, no interval/calendar semantics. Output:
    * per-supplier blame counts, top-k with a pinned order.
    */
  def q21(lineitem: DataFrame, orders: DataFrame, lateDays: Long = 90L,
          topK: Int = 50): DataFrame = {
    // cells feed BOTH the per-order rollup and the blame join — the
    // reco rule: checkpoint the frame whose re-derivation (join +
    // groupBy) multiplies past the exchange boundary
    val cells = lineitem
      .join(orders.select(col("o_orderkey").as("l_orderkey"),
        col("o_orderdate")), "l_orderkey")
      .select(col("l_orderkey"), col("l_suppkey"),
        when(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000" +
          " - unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000") >
          lateDays, 1L).otherwise(0L).as("late"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("supp_late"))
      .localCheckpoint()
    val perOrder = cells.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("supp_late")).as("n_late"))
    cells
      .join(perOrder, "l_orderkey")
      .filter(col("supp_late") === 1L && col("n_supp") >= 2L &&
        col("n_late") === 1L)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_blamed_orders"))
      .orderBy(desc("n_blamed_orders"), asc("l_suppkey"))
      .limit(topK)
  }

  /** A-priori frequent 3-itemsets: the level-3 step market-basket
    * mining runs after [[basketRules]]' pairs — triples of items
    * co-purchased in ≥ `minCount` baskets, with the classic downward-
    * closure PRUNE: a triple is enumerated only when ALL THREE of its
    * item pairs are already frequent, so the per-basket C(D,3) blowup
    * never materializes for items outside the frequent-pair graph.
    *
    * Scale shape: the basket frame prunes to items appearing in a
    * frequent pair (semi-join), baskets over `maxGroupSize` drop (the
    * C(D,2) window guard from the pair level), the triple enumeration
    * is two basket-keyed self-joins with `a < b < c`, and the closure
    * check is one more keyed semi-join of the (b, c) leg against the
    * frequent-pair set BEFORE counting. The pruned basket frame feeds
    * three self-join sides → localCheckpoint (the reco rule).
    */
  def basketTriples(baskets: DataFrame, groupCol: String, itemCol: String,
                    minCount: Long = 3L,
                    maxGroupSize: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // referenced three times (item counts / both pair self-join sides /
    // the triple legs): materialize so the distinct + size window run
    // once (r15)
    val b = baskets.select(col(groupCol).as("g"), col(itemCol).as("item"))
      .distinct()
      .withColumn("gsz", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("gsz") <= maxGroupSize)
      .drop("gsz")
      .localCheckpoint(true)
    val pairs = b.as("l")
      .join(b.as("r"),
        col("l.g") === col("r.g") && col("l.item") < col("r.item"))
      .groupBy(col("l.item").as("pa"), col("r.item").as("pb"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
      .select(col("pa"), col("pb"))
      .localCheckpoint()
    val freq = pairs.select(col("pa").as("item"))
      .union(pairs.select(col("pb").as("item"))).distinct()
    val pb = b.join(freq, "item").localCheckpoint()
    pb.as("x")
      .join(pb.as("y"), col("x.g") === col("y.g") &&
        col("x.item") < col("y.item"))
      // downward closure on the (a, b) leg
      .join(pairs, col("x.item") === col("pa") &&
        col("y.item") === col("pb"), "left_semi")
      .join(pb.as("z"), col("x.g") === col("z.g") &&
        col("y.item") < col("z.item"))
      // closure on the (b, c) leg; (a, c) follows from counting, but
      // pruning it here bounds the candidate stream before the shuffle
      .join(pairs, col("y.item") === col("pa") &&
        col("z.item") === col("pb"), "left_semi")
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"),
        col("z.item").as("item_c"))
      .agg(count(lit(1)).as("n_support"))
      .filter(col("n_support") >= minCount)
  }

  /** Fixed-width histogram of a numeric column: bin id, row count, and
    * the exact value bounds observed in each bin — the distribution
    * profile behind data-quality dashboards and partition-skew checks.
    * One partial-agg shuffle keyed on the bin id; output cardinality is
    * the bin count, never the input. `floor` of a single IEEE division is
    * engine-exact (round-half rules never enter).
    */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double): DataFrame =
    df.select(floor(col(valueCol) / lit(binWidth)).cast("long").as("bin"),
        col(valueCol).as("v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"), min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))

  /** Mergeable-histogram quantiles — the 100 TB path where exact
    * `percentile` (which buffers each group's values) and t-digest
    * (engine-private) both fall short: two partial-aggregated passes
    * (exact bounds, then fixed-bin counts) reduce ANY input to ≤ `bins`
    * rows, and each quantile is answered from the cumulative bin counts
    * with resolution (hi-lo)/bins. Bin histograms merge by cell-wise
    * addition across corpora/days.
    *
    * Engine-exact: bin index is `floor` of one IEEE divide chain,
    * the target rank `ceil(q·n)` and the bin edge estimate
    * `lo + bin·w` are single-rounded double expressions written
    * identically in the DuckDB twin, and the cumulative window runs
    * over ≤ `bins` rows (never the input). Degenerate lo == hi inputs
    * collapse to bin 0.
    *
    * Output: one row per requested quantile `(q, bin, est, n_le)` where
    * `est` is the bin's lower edge and `n_le` the rows at-or-below it.
    */
  /** EXACT distributed order-statistic selection — the real "median of
    * 100 TB" answer next to the two approximations ([[binQuantiles]]'s
    * bin-width error, `Sketches.quantileSketch`'s sampling error):
    * find the k-th smallest value (k = ceil(q·n), selection semantics —
    * never interpolation, so the result is a VALUE FROM THE DATA and
    * engine-portable with no float hazards) by iterative range
    * refinement. Each level scans once, histograms the current [lo, hi]
    * candidate range into ≤ 2¹⁶ equal-width integer buckets (one
    * partial-aggregated groupBy; ≤ 2¹⁶ rows to the driver), and walks
    * the bucket counts to the one containing the target rank; the range
    * shrinks ≥ 2¹⁶× per level, so 64-bit domains finish in ≤ 4 scans
    * REGARDLESS of row count — no value buffering anywhere, unlike
    * exact `percentile` whose aggregation state holds every value.
    *
    * Output: one row per requested ppm quantile (q_ppm, value, n).
    * `valueCol` must be integral (integerize first — the cents recipe).
    */
  def exactSelect(df: DataFrame, valueCol: String,
                  qsPpm: Seq[Long] = Seq(500000L, 900000L)): DataFrame = {
    // q > 1e6 would push the rank past the in-range count and walk lo
    // below the valid range (ADVICE r11) — fail loudly at entry instead
    require(qsPpm.nonEmpty && qsPpm.forall(q => q >= 1L && q <= 1000000L),
      "qsPpm must be in [1, 1000000]")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(valueCol).cast("long").as("v"))
    val bounds = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
      count(lit(1)).as("n")).collect()(0) // bounded: one row
    val n = bounds.getAs[Long]("n")
    require(n > 0, "exactSelect over an empty frame")
    val results = qsPpm.map { q =>
      var k = math.max(1L, (q * n + 999999L) / 1000000L) // rank among [lo,hi]
      var lo = bounds.getAs[Long]("lo")
      var hi = bounds.getAs[Long]("hi")
      // full-range domains (lo < 0 <= hi spanning > 2^63) overflow both
      // the span arithmetic AND the per-row (v - lo) bucket expression:
      // split once at 0 (one bounded count) so every later level has
      // hi - lo < 2^63 and v - lo fits a BIGINT (ADVICE r11)
      if (lo < 0L && hi >= 0L &&
          (BigInt(hi) - BigInt(lo) + 1) > BigInt(Long.MaxValue)) {
        val nNeg = v.filter(col("v") < 0L).count() // bounded: one scalar
        if (k <= nNeg) hi = -1L else { k -= nNeg; lo = 0L }
      }
      while (lo < hi) {
        // BigInt span: hi - lo + 1 == 2^63 (e.g. [-2^62, 2^62-1] after
        // the split above) still wraps a Long — width math stays exact
        val span = BigInt(hi) - BigInt(lo) + 1
        val width = ((span + 65535) / 65536).max(1).toLong
        // bounded: <= 65536 bucket-count rows per level
        val hist = v.filter(col("v") >= lo && col("v") <= hi)
          .groupBy(expr(s"(v - ${lo}L) div ${width}L").as("b"))
          .agg(count(lit(1)).as("c"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
          .sortBy(_._1)
        var acc = 0L
        var bucket = -1L
        hist.iterator.takeWhile(_ => bucket < 0).foreach { case (b, c) =>
          if (acc + c >= k) bucket = b else acc += c
        }
        assert(bucket >= 0L,
          s"exactSelect: rank $k not found in [$lo, $hi] — in-range count " +
            s"shrank below the target rank")
        k -= acc
        val newLo = lo + bucket * width
        hi = math.min(hi, if (newLo > hi - (width - 1)) hi
                          else newLo + width - 1)
        lo = newLo
      }
      (q, lo)
    }
    results.toDF("q_ppm", "value").withColumn("n", lit(n))
  }

  /** EXACT distributed WEIGHTED order-statistic selection — the
    * [[exactSelect]] range-refinement with per-value weights: find the
    * smallest value whose cumulative weight reaches k = ceil(q·W),
    * where W = Σ weights. This is the "weighted median of 100 TB"
    * primitive a duplication-weighted corpus needs (e.g. quality-score
    * medians under `dedup_weights` soft-dedup weights): selection
    * semantics, a value FROM the data, ≤ 4 scans for 64-bit domains,
    * never a value buffer. `weightCol` must be integral and >= 1
    * (fail-closed — fractional or zero weights have no exact rank
    * semantics).
    */
  def exactSelectWeighted(df: DataFrame, valueCol: String,
                          weightCol: String,
                          qsPpm: Seq[Long] = Seq(500000L, 900000L)): DataFrame = {
    require(qsPpm.nonEmpty && qsPpm.forall(q => q >= 1L && q <= 1000000L),
      "qsPpm must be in [1, 1000000]")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(valueCol).cast("long").as("v"),
      col(weightCol).cast("long").as("w"))
    val bad = v.filter(col("w") < 1L).limit(1).count() // bounded: 0/1
    require(bad == 0L, "exactSelectWeighted needs integer weights >= 1")
    val bounds = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
      sum(col("w")).as("wt")).collect()(0) // bounded: one row
    val wTotal = bounds.getAs[Long]("wt")
    require(wTotal > 0, "exactSelectWeighted over an empty frame")
    val results = qsPpm.map { q =>
      var k = math.max(1L, (q * wTotal + 999999L) / 1000000L)
      var lo = bounds.getAs[Long]("lo")
      var hi = bounds.getAs[Long]("hi")
      if (lo < 0L && hi >= 0L &&
          (BigInt(hi) - BigInt(lo) + 1) > BigInt(Long.MaxValue)) {
        val wNeg = v.filter(col("v") < 0L)
          .agg(coalesce(sum(col("w")), lit(0L))).collect()(0)
          .getLong(0) // bounded: one scalar
        if (k <= wNeg) hi = -1L else { k -= wNeg; lo = 0L }
      }
      while (lo < hi) {
        val span = BigInt(hi) - BigInt(lo) + 1
        val width = ((span + 65535) / 65536).max(1).toLong
        // bounded: <= 65536 bucket-weight rows per level
        val hist = v.filter(col("v") >= lo && col("v") <= hi)
          .groupBy(expr(s"(v - ${lo}L) div ${width}L").as("b"))
          .agg(sum(col("w")).as("c"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
          .sortBy(_._1)
        var acc = 0L
        var bucket = -1L
        hist.iterator.takeWhile(_ => bucket < 0).foreach { case (b, c) =>
          if (acc + c >= k) bucket = b else acc += c
        }
        assert(bucket >= 0L,
          s"exactSelectWeighted: weighted rank $k not found in [$lo, $hi]")
        k -= acc
        val newLo = lo + bucket * width
        hi = math.min(hi, if (newLo > hi - (width - 1)) hi
                          else newLo + width - 1)
        lo = newLo
      }
      (q, lo)
    }
    results.toDF("q_ppm", "value").withColumn("w_total", lit(wTotal))
  }

  def binQuantiles(df: DataFrame, valueCol: String, bins: Int = 64,
                   qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(bins >= 2 && qs.nonEmpty)
    val bounds = df.agg(min(col(valueCol)).cast("double").as("lo"),
      max(col(valueCol)).cast("double").as("hi"),
      count(lit(1)).as("n"))
    val counts = df.select(col(valueCol).cast("double").as("v"))
      .crossJoin(broadcast(bounds))
      .select(
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((col("v") - col("lo")) /
              ((col("hi") - col("lo")) / lit(bins.toDouble))).cast("long"),
            lit(bins - 1L))).as("bin"),
        col("lo"), col("hi"), col("n"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_bin"), min(col("lo")).as("lo"),
        min(col("hi")).as("hi"), min(col("n")).as("n"))
    val cum = counts.withColumn("n_le",
      sum(col("n_bin")).over(org.apache.spark.sql.expressions.Window
        .orderBy("bin").rowsBetween(Long.MinValue, 0)))
    cum.select(col("bin"), col("n_bin"), col("n_le"), col("lo"),
        col("hi"), col("n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .filter(col("n_le") >= ceil(col("q") * col("n").cast("double")) &&
        col("n_le") - col("n_bin") <
          ceil(col("q") * col("n").cast("double")))
      .select(col("q"), col("bin"),
        (col("lo") + col("bin").cast("double") *
          ((col("hi") - col("lo")) / lit(bins.toDouble))).as("est"),
        col("n_le"))
  }

  /** Winsorization: clamp a value column to its group's [lo, hi] exact
    * percentiles — the standard outlier-taming step before aggregate
    * features reach a model. Exact `percentile` keeps the oracle
    * bit-for-bit (Spark's exact percentile ≡ DuckDB `quantile_cont`, the
    * identity events_quantiles established); at billions of rows per
    * group swap in `approx_percentile` (t-digest, mergeable) — same
    * shape, bounded memory.
    *
    * Scale shape: one partial-agg shuffle computes the per-group bounds
    * (group-count-sized result, broadcast back); the clamp itself is a
    * narrow projection over the co-partitioned join.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    val bounds = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, $lo)").as("p_lo"),
        expr(s"percentile($valueCol, $hi)").as("p_hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("clamped",
        least(greatest(col(valueCol), col("p_lo")), col("p_hi")))
  }

  /** Hierarchical rollup (GROUP BY ROLLUP): per-(a,b) cells plus per-a
    * subtotals plus the grand total in one pass — Spark expands the
    * grouping sets BEFORE the shuffle, so partial aggregation still
    * applies and subtotal rows cost no second scan. Grouping keys are
    * COALESCEd to a sentinel so every engine (and the driver's row sort)
    * sees the same scalar values; `lvl` is the grouping_id.
    */
  def rollupAgg(df: DataFrame, a: String, b: String,
                valueCol: String): DataFrame =
    df.rollup(col(a), col(b))
      .agg(count(lit(1)).as("n_rows"),
        exactSum(col(valueCol)).as("sum_v"),
        grouping_id().as("lvl"))
      .select(coalesce(col(a), lit("ALL")).as(a),
        coalesce(col(b), lit("ALL")).as(b),
        col("n_rows"), col("sum_v"), col("lvl"))

  /** Pareto / cumulative-share analysis: value per key ranked descending
    * with the running share of the grand total — "which 20% of parts
    * carry 80% of revenue". The unpartitioned window is safe because it
    * runs over the AGGREGATED rows (key cardinality, never input rows);
    * the rollup's partial aggregation did the heavy lifting. Values stay
    * decimal through the cumulative sum and export as integer cents, so
    * every column is engine-exact (the one division divides two
    * exactly-agreed integers).
    */
  def paretoShare(df: DataFrame, keyCol: String,
                  valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.orderBy(desc("rev"), col(keyCol))
    val agg = df.groupBy(col(keyCol))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("rev"))
    val tot = agg.agg(sum(col("rev")).as("total"))
    agg.crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum", sum(col("rev")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(keyCol), col("rank"),
        (col("rev") * 100).cast("long").as("rev_cents"),
        ((col("cum") * 100).cast("long").cast("double") /
          (col("total") * 100).cast("long").cast("double")).as("cum_share"))
  }

  /** Within-group percentile-rank normalization: each row's value mapped
    * to [0, 1] by its rank inside its group — the scale-free feature
    * transform (and the quality-tiering step: "top decile per language").
    * The order key includes `idCol`, so ranks are unique and the result
    * deterministic under ties; percent_rank's (rank−1)/(n−1) is one
    * division of two exact integers — portable. One shuffle on the group
    * key; groups larger than a partition need the range-partitioned
    * global-sort variant, the documented huge-group path.
    */
  def percentileRank(df: DataFrame, idCol: String, groupCol: String,
                     valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(col(idCol), col(groupCol), col(valueCol))
      .withColumn("pct_rank", percent_rank().over(
        Window.partitionBy(groupCol).orderBy(col(valueCol), col(idCol))))
  }

  /** CUBE twin of [[rollupAgg]]: all four grouping sets — (a,b), (a),
    * (b), () — in the same single pre-shuffle Expand, so the per-`b`
    * subtotals ROLLUP lacks cost no extra scan either. Output cardinality
    * is the sum of the four groupings' key spaces, still
    * aggregate-bounded. */
  def cubeAgg(df: DataFrame, a: String, b: String,
              valueCol: String): DataFrame =
    df.cube(col(a), col(b))
      .agg(count(lit(1)).as("n_rows"),
        exactSum(col(valueCol)).as("sum_v"),
        grouping_id().as("lvl"))
      .select(coalesce(col(a), lit("ALL")).as(a),
        coalesce(col(b), lit("ALL")).as(b),
        col("n_rows"), col("sum_v"), col("lvl"))

  /** Concentration card for a categorical dimension — how unevenly the
    * corpus is spread across its categories. One row per requested
    * dimension with the exact Gini coefficient of the per-category row
    * counts (sorted-rank formula: `G = Σ(2i − n − 1)·x_i / (n·Σx)` over
    * counts ascending) and the largest category's share, both as
    * integer ppm (numerator ×1e6 `div` denominator — order-free,
    * engine-exact). This is the data-mixture governance number: a
    * training corpus whose source Gini drifts toward 1 is quietly
    * becoming one domain's corpus.
    *
    * The rank window runs over the CATEGORY table (one row per distinct
    * value — dimension-vocabulary bounded, never corpus bounded), with
    * (count, category) as the pinned total order so ties can't make
    * ranks ambiguous. Scale shape: one partial-agg shuffle per
    * dimension on the category key; the windowed reduction touches only
    * the aggregated category rows.
    */
  def concentration(df: DataFrame, dimCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    dimCols.map { dc =>
      // null categories fold to '' so the (n, cat) tie order is pinned
      // identically under Spark's NULLS FIRST and DuckDB's NULLS LAST
      val counts = df.groupBy(coalesce(col(dc).cast("string"), lit(""))
          .as("cat"))
        .agg(count(lit(1)).as("n"))
      val ranked = counts.withColumn("i",
        row_number().over(Window.orderBy("n", "cat")).cast("long"))
      // Σ(2i−n−1)·x = 2·Σ(i·x) − (n+1)·Σx: the rank-weighted sum and the
      // plain sum are both order-free BIGINTs, combined after the agg
      ranked.agg(
        count(lit(1)).as("n_categories"),
        sum(col("n")).as("total"),
        sum(col("i") * col("n")).as("sum_in"),
        max(col("n")).as("top_n"))
        .select(lit(dc).as("dim"), col("n_categories"), col("total"),
          expr("""(2 * sum_in - (n_categories + 1) * total) * 1000000L
                  div (n_categories * total)""").as("gini_ppm"),
          expr("top_n * 1000000L div total").as("top_share_ppm"))
    }.reduce(_.unionByName(_))
  }

  /** Selective-scan revenue probe (TPC-H Q6 shape): a tight conjunctive
    * predicate over one fact table, one global aggregate. The POINT of
    * this query is the plan, not the math: the date range and the
    * quantity bound sit on RAW columns and reach the parquet scan as
    * pushed filters, so the scan skips row groups via min/max stats —
    * at 100 TB this is the difference between reading a year and
    * reading the lake. The discount band is a derived expression
    * (`floor(d·100) BETWEEN lo AND hi` — never float equality) that
    * parquet cannot push; it evaluates post-scan over the rows the
    * pushed predicates let through, which is the right trade (date is
    * the selective clustered axis; discount is uniform).
    * Precondition for oracle exactness on the TIMESTAMP (non-NTZ)
    * branch: the session timezone must be UTC (Verify/Bench/tests pin
    * it); NTZ literals are timezone-free either way.
    */
  def q6(lineitem: DataFrame, dateLo: String = "1996-01-01",
         dateHi: String = "1997-01-01", centLo: Long = 5L,
         centHi: Long = 7L, maxQty: Double = 24.0): DataFrame = {
    // literals typed to the column's own timestamp flavor so the range
    // lands on the RAW column (a function/cast wrap would block the
    // scan pushdown this query exists to demonstrate); the generator
    // has shipped both NTZ and TZ encodings across rounds
    val kind = lineitem.schema("l_shipdate").dataType match {
      case org.apache.spark.sql.types.TimestampNTZType => "TIMESTAMP_NTZ"
      case _ => "TIMESTAMP"
    }
    lineitem
      .filter(col("l_shipdate") >= expr(s"$kind '$dateLo 00:00:00'") &&
        col("l_shipdate") < expr(s"$kind '$dateHi 00:00:00'") &&
        floor(col("l_discount") * 100).between(centLo, centHi) &&
        col("l_quantity") < maxQty)
      .agg(count(lit(1)).as("n_rows"),
        exactSum(col("l_extendedprice") * col("l_discount"), 4)
          .as("revenue"))
  }

  /** Customer order-count distribution (TPC-H Q13 shape): how many
    * customers placed 0, 1, 2, … orders — the classic LEFT-OUTER-JOIN +
    * double-aggregation query. The textbook form joins |customer| ×
    * |orders| rows wide and counts after; here the fact side is
    * pre-aggregated to per-customer counts FIRST (one partial-agg
    * shuffle on `o_custkey`), so the outer join moves |customers| count
    * rows instead of |orders| order rows — at 100 TB that is the whole
    * query. Zero-order customers fall out of the LEFT join's null via
    * `coalesce(0)`; the final distribution groupBy runs over at most
    * max-orders-per-customer distinct keys.
    */
  def q13(customer: DataFrame, orders: DataFrame,
          excludePriority: String = "1-URGENT"): DataFrame = {
    val perCust = orders
      .filter(col("o_orderpriority") =!= excludePriority)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    customer.select(col("c_custkey").as("o_custkey"))
      .join(perCust, Seq("o_custkey"), "left")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** Idle high-balance customers by nation (TPC-H Q22 shape): customers
    * whose balance exceeds the global average of positive balances AND
    * who placed no order since `idleSince` — the classic scalar-subquery
    * + NOT-EXISTS pair. The scalar subquery decorrelates to a ONE-ROW
    * (n_pos, Σbal) aggregate broadcast onto the customer scan, and the
    * threshold is the integer cross-multiply `bal·n > Σbal` (balances in
    * exact cents — no float average, no division; bal ≤ 10^6 cents ×
    * n ≤ 10^12 customers stays inside BIGINT). NOT EXISTS is a LEFT ANTI
    * join keyed on custkey, with the date predicate pushed INTO the anti
    * side's scan — at scale the orders side filters then pre-shuffles on
    * its join key and nothing is ever re-scanned per customer.
    */
  def q22(customer: DataFrame, orders: DataFrame,
          idleSince: String = "2001-01-01"): DataFrame = {
    val cut = java.time.LocalDate.parse(idleSince).toEpochDay
    val recent = orders
      .filter(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
        " div 86400000000") >= lit(cut))
      .select(col("o_custkey").as("c_custkey"))
    val c = customer.select(col("c_custkey"), col("c_nationkey"),
      (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").as("bal_c"))
    // bounded: one-row global positive-balance moments
    val glob = c.filter(col("bal_c") > 0)
      .agg(count(lit(1)).as("n_pos"), sum(col("bal_c")).as("sum_pos"))
    c.crossJoin(broadcast(glob))
      .filter(col("bal_c") * col("n_pos") > col("sum_pos"))
      .join(recent, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"), sum(col("bal_c")).as("total_bal_c"))
      .orderBy("c_nationkey")
  }

  /** Top-revenue supplier (TPC-H Q15 shape): the supplier(s) whose
    * revenue over a shipping quarter equals the global maximum — the
    * classic view + scalar-MAX-subquery query. Revenue is exact integer
    * e4 units (`cents(extendedprice) · (100 − cents(discount))` — both
    * factors exact by the decimal-cents recipe), so the MAX-equality
    * predicate is portable integer comparison, never float. The
    * per-supplier rollup is one partial-aggregated shuffle; its one-row
    * MAX broadcasts back as an equi-join on the revenue value (a
    * broadcast hash join, not a nested loop), and the aggregated frame
    * feeds both sides → `localCheckpoint` (the reuses-exchanges rule).
    * Date bounds are integer epoch-day arithmetic on the scan.
    */
  def q15(lineitem: DataFrame, supplier: DataFrame,
          dayLo: String = "1996-01-01", dayHi: String = "1996-04-01"): DataFrame = {
    val epDay = expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
    val lo = java.time.LocalDate.parse(dayLo).toEpochDay
    val hi = java.time.LocalDate.parse(dayHi).toEpochDay
    val rev = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long") *
      (lit(100L) - (col("l_discount").cast("decimal(9,2)") * 100).cast("long"))
    val per = lineitem
      .filter(epDay >= lit(lo) && epDay < lit(hi))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev).as("total_rev_e4"))
      .localCheckpoint()
    val mx = per.agg(max(col("total_rev_e4")).as("mx"))
    per.join(broadcast(mx), col("total_rev_e4") === col("mx")).drop("mx")
      .join(broadcast(supplier.select(col("s_suppkey").as("l_suppkey"),
        col("s_name"))), "l_suppkey")
      .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
        col("total_rev_e4"))
      .orderBy("s_suppkey")
  }

  /** Exact-moment Pearson correlation matrix over a set of numeric
    * columns — the feature-drift / feature-redundancy card a training
    * pipeline runs over every tabular snapshot. One scan computes every
    * raw moment (n, Σx per column, Σx·y per column pair) with map-side
    * partial aggregation; the pair rows then unfold from the single
    * aggregated row, so the whole matrix costs one pass + a one-row
    * shuffle regardless of corpus size.
    *
    * Engine-exactness: each cell is integerized FIRST
    * (`floor(x·10^scale)` — one IEEE multiply + floor, bit-identical in
    * any engine), so every aggregation is an order-free integer sum
    * (DECIMAL(28,0) vs the 6·10^19 Σx² overflow at sf0.1), and the
    * final Pearson formula runs in pure double arithmetic over those
    * exact integers — casts of exact integers and IEEE ·,−,/,sqrt are
    * all correctly rounded, so the DuckDB twin matches bit-for-bit.
    * The computed quantity is the exact correlation of the
    * 10^-scale-quantized data (not of the raw doubles) — the
    * deterministic-surrogate trade the gram-matrix recipe established.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String],
                 scale: Int = 2): DataFrame = {
    require(cols.size >= 2)
    val f = math.pow(10, scale)
    val base = df.select(cols.map(c =>
      floor(col(c) * f).cast("long").as(s"x_$c")): _*)
    val aggs = Seq(count(lit(1)).cast("long").as("n")) ++
      cols.map(c => sum(col(s"x_$c").cast("decimal(28,0)")).as(s"s_$c")) ++
      (for { i <- cols.indices; j <- i until cols.size } yield
        sum((col(s"x_${cols(i)}") * col(s"x_${cols(j)}"))
          .cast("decimal(28,0)")).as(s"p_${i}_$j"))
    val m = base.agg(aggs.head, aggs.tail: _*)
    def d(c: String): Column = col(c).cast("double")
    val pairRows = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield {
        val (a, b) = (cols(i), cols(j))
        struct(lit(a).as("col_x"), lit(b).as("col_y"),
          ((d("n") * d(s"p_${i}_$j") - d(s"s_$a") * d(s"s_$b")) /
            (sqrt(d("n") * d(s"p_${i}_$i") - d(s"s_$a") * d(s"s_$a")) *
              sqrt(d("n") * d(s"p_${j}_$j") - d(s"s_$b") * d(s"s_$b"))))
            .as("corr"))
      }
    m.select(col("n"), explode(array(pairRows: _*)).as("pr"))
      .select(col("pr.col_x").as("col_x"), col("pr.col_y").as("col_y"),
        col("n"), col("pr.corr").as("corr"))
  }

  /** Exact integer e4 revenue: cents(extendedprice) · (100 − cents(disc))
    * — both factors exact by the decimal-cents recipe, so any sum of it
    * is order-free and engine-portable (the q15 recipe, shared here by
    * the q7/q8/q10/q14/q19 probes).
    */
  private def revE4: Column =
    (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long") *
      (lit(100L) - (col("l_discount").cast("decimal(9,2)") * 100).cast("long"))

  private def shipEpochDay: Column =
    expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")

  /** Promotion revenue share (TPC-H Q14 shape): the conditional-
    * aggregation probe — one pass computes promo and total revenue with
    * `sum(CASE WHEN …)`, never two scans or a self-join. The part dim
    * carries only (key, is_promo boolean) into the broadcast, and the
    * share is an exact integer ppm division over the e4 revenues. The
    * month bound is epoch-day arithmetic on the lineitem scan; at 100 TB
    * that partition-prunes a date-laid-out lake before the join.
    */
  def q14(lineitem: DataFrame, part: DataFrame,
          dayLo: String = "1996-03-01", dayHi: String = "1996-04-01"): DataFrame = {
    val lo = java.time.LocalDate.parse(dayLo).toEpochDay
    val hi = java.time.LocalDate.parse(dayHi).toEpochDay
    lineitem
      .filter(shipEpochDay >= lit(lo) && shipEpochDay < lit(hi))
      .join(broadcast(part.select(col("p_partkey").as("l_partkey"),
        (col("p_type") === "PROMO").as("is_promo"))), Seq("l_partkey"))
      .agg(
        sum(when(col("is_promo"), revE4).otherwise(0L)).as("promo_rev_e4"),
        sum(revE4).as("total_rev_e4"),
        count(lit(1)).as("n_items"))
      .withColumn("promo_ppm",
        expr("1000000L * promo_rev_e4 div total_rev_e4"))
  }

  /** Returned-item reporting (TPC-H Q10 shape): top-k customers by
    * revenue lost to returns in an order quarter. The plan every
    * engine should pick: both FACT filters (returnflag on lineitem,
    * date on orders) land on their scans BEFORE the orderkey shuffle
    * join — the only big exchange — then customer and nation enrich via
    * broadcast, and the top-k is a TakeOrdered, never a global sort.
    */
  def q10(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
          nation: DataFrame, dayLo: String = "1996-01-01",
          dayHi: String = "1996-04-01", k: Int = 20): DataFrame = {
    val lo = java.time.LocalDate.parse(dayLo).toEpochDay
    val hi = java.time.LocalDate.parse(dayHi).toEpochDay
    val oDay = expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
    lineitem
      .filter(col("l_returnflag") === "R")
      .join(orders.filter(oDay >= lit(lo) && oDay < lit(hi))
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        Seq("l_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"),
        col("c_nationkey"))), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("c_nationkey"),
        col("n_name"))), Seq("c_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(revE4).as("lost_rev_e4"), count(lit(1)).as("n_returns"))
      .orderBy(desc("lost_rev_e4"), asc("c_custkey"))
      .limit(k)
  }

  /** Disjunctive-predicate probe (TPC-H Q19 shape): revenue over an
    * OR-of-ANDs of (brand, size band, quantity band) — the query
    * optimizers historically mishandled by either never pushing
    * anything or exploding to a union. The scale move spelled out here:
    * the disjunction's JOIN-INDEPENDENT ENVELOPE (`l_quantity` within
    * the union of all bands) is applied to the lineitem scan BEFORE the
    * join — Catalyst does not derive envelopes from cross-table ORs, so
    * the operator states it; at 100 TB that is the difference between
    * joining every row and joining the qualifying sliver. Each band's
    * residual lands post-join on the broadcast-enriched row.
    */
  def q19(lineitem: DataFrame, part: DataFrame,
          bands: Seq[(String, Int, Long)] = Seq(
            ("Brand#1", 5, 1L), ("Brand#2", 10, 10L), ("Brand#3", 15, 20L)),
          qtySpan: Long = 10L): DataFrame = {
    val qtyLo = bands.map(_._3).min
    val qtyHi = bands.map(_._3).max + qtySpan
    val residual = bands.map { case (brand, sizeHi, bandLo) =>
      col("p_brand") === brand &&
        col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(bandLo.toDouble, (bandLo + qtySpan).toDouble)
    }.reduce(_ || _)
    lineitem
      // join-independent envelope of the disjunction, pushed to the scan
      .filter(col("l_quantity").between(qtyLo.toDouble, qtyHi.toDouble))
      .join(broadcast(part.select(col("p_partkey").as("l_partkey"),
        col("p_brand"), col("p_size"))), Seq("l_partkey"))
      .filter(residual)
      .agg(sum(revE4).as("revenue_e4"), count(lit(1)).as("n_items"))
  }

  /** Bilateral shipping volume (TPC-H Q7 shape): revenue flowing between
    * two nations per direction per year. Both dims are PRE-FILTERED to
    * the two nations before broadcasting, so fact rows for any other
    * supplier/customer drop AT THE JOIN — the broadcast carries
    * thousands of keys, not the full dim. One orderkey shuffle join is
    * the only big exchange; the (supp_nation, cust_nation) disjunction
    * is a residual on the enriched row, and the rollup groups on a
    * 2×2×years key domain.
    */
  def q7(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
         supplier: DataFrame, nation: DataFrame,
         nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val nat = nation.filter(col("n_name").isin(nationA, nationB))
    val supp = supplier.join(broadcast(nat),
      col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer.join(broadcast(nat),
      col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("o_custkey"), col("n_name").as("cust_nation"))
    // cust lands on the ORDERS SCAN (broadcast, zero extra shuffle):
    // only ~|2 nations|/|nations| of orders ever reach the orderkey
    // shuffle — at 10× stress this is the difference between shuffling
    // the full orders table and 8% of it
    val ord = orders.select(col("o_orderkey").as("l_orderkey"),
      col("o_custkey")).join(broadcast(cust), Seq("o_custkey"))
    lineitem
      .join(broadcast(supp), Seq("l_suppkey"))
      .join(ord, Seq("l_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .withColumn("l_year",
        year(col("l_shipdate").cast("timestamp")).cast("long"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(revE4).as("revenue_e4"), count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** National market share (TPC-H Q8 shape): of all revenue for one part
    * type sold to customers of one region, the share supplied by one
    * nation, per order year — the share-of-group probe. Solved with ONE
    * conditional aggregation (`sum(CASE WHEN supp_nation …)`) over the
    * star join, never a second pass or a windowed re-scan; the share is
    * exact integer ppm. Part (type-filtered) and the customer→nation→
    * region chain broadcast; the orderkey shuffle is the only big
    * exchange.
    */
  def q8(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
         supplier: DataFrame, nation: DataFrame, region: DataFrame,
         part: DataFrame, targetNation: String = "NATION_3",
         targetRegion: String = "EUROPE", partType: String = "PROMO"): DataFrame = {
    val pt = part.filter(col("p_type") === partType)
      .select(col("p_partkey").as("l_partkey"))
    val supp = supplier.join(broadcast(nation),
      col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === targetRegion)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey").as("o_custkey"))
    // the region filter lands on the ORDERS SCAN via the broadcast cust
    // semi-set — orders shrink to the region's share BEFORE the orderkey
    // shuffle (the q7 move; measured 16.6s → single-digit at 10× stress)
    val ord = orders.select(col("o_orderkey").as("l_orderkey"),
      col("o_custkey"), col("o_orderdate"))
      .join(broadcast(cust), Seq("o_custkey"))
    lineitem
      .join(broadcast(pt), Seq("l_partkey"))
      .join(broadcast(supp), Seq("l_suppkey"))
      .join(ord, Seq("l_orderkey"))
      .withColumn("o_year",
        year(col("o_orderdate").cast("timestamp")).cast("long"))
      .groupBy(col("o_year"))
      .agg(sum(when(col("supp_nation") === targetNation, revE4)
        .otherwise(0L)).as("nation_rev_e4"),
        sum(revE4).as("total_rev_e4"))
      .withColumn("share_ppm",
        expr("1000000L * nation_rev_e4 div total_rev_e4"))
      .orderBy("o_year")
  }

  /** Order-priority EXISTS probe (TPC-H Q4 shape): orders in a date
    * range with at least one returned lineitem, counted per priority —
    * the canonical LEFT SEMI join. The one plan every engine should
    * pick: the EXISTS never counts duplicates (semi stops at first
    * match — no distinct, no post-join dedup), the date bound lands on
    * the orders scan, the flag filter on the lineitem scan, and the
    * probe side never grows the row count. (Classic Q4 tests
    * commit-vs-receipt lateness; this corpus carries no commit dates,
    * so the returned-flag plays the EXISTS predicate.)
    */
  def q4(orders: DataFrame, lineitem: DataFrame,
         dayLo: String = "1996-01-01", dayHi: String = "1996-04-01"): DataFrame = {
    val lo = java.time.LocalDate.parse(dayLo).toEpochDay
    val hi = java.time.LocalDate.parse(dayHi).toEpochDay
    val oDay = expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
    orders
      .filter(oDay >= lit(lo) && oDay < lit(hi))
      .join(lineitem.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o_orderkey")),
        Seq("o_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Shipping-priority split (TPC-H Q12 shape): per line status in a
    * ship-date window, how many lines belong to critical-priority
    * orders vs the rest — the canonical fact-fact join feeding a
    * CONDITIONAL COUNT pair (`sum(CASE WHEN priority critical …)`), one
    * pass, never two filtered scans. Plan shape under test: the date
    * band lands on the lineitem SCAN before the only big exchange (the
    * orderkey shuffle join — at 100 TB on a date-laid-out lake it
    * partition-prunes), orders carries just (key, priority) through the
    * shuffle, and the output domain is |statuses| rows. (Classic Q12
    * splits by ship mode and bounds receipt-vs-commit lateness; this
    * corpus carries neither column, so line status plays the group key
    * and the ship-date band the scan filter — the join/conditional-agg
    * skeleton is the probe.)
    */
  def q12(lineitem: DataFrame, orders: DataFrame,
          dayLo: String = "1996-01-01", dayHi: String = "1996-07-01",
          critical: Seq[String] = Seq("1-URGENT", "2-HIGH")): DataFrame = {
    val lo = java.time.LocalDate.parse(dayLo).toEpochDay
    val hi = java.time.LocalDate.parse(dayHi).toEpochDay
    lineitem
      .filter(shipEpochDay >= lit(lo) && shipEpochDay < lit(hi))
      .select(col("l_orderkey").as("o_orderkey"), col("l_linestatus"))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority")),
        Seq("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin(critical: _*), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin(critical: _*), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** Product-profit star (TPC-H Q9 shape): profit per supplier nation
    * per order year over a part-name-filtered slice — the SIGNED
    * measure probe (profit = revenue − cost can go negative, so every
    * sum must be order-free-exact, not just approximately stable).
    * Amount is exact integer e4: the shared revE4 minus cost·qty with
    * cost in exact cents. The name-filtered part set and the
    * supplier→nation chain broadcast ONTO THE LINEITEM SCAN — the
    * fact stream shrinks to the matching slice before the orderkey
    * shuffle (the only big exchange; the q8 move), and orders carries
    * just (key, year). (Classic Q9 prices cost from partsupp; this
    * corpus has no partsupp table, so a fixed 20%-of-retail stand-in
    * cost — exact cents via integer division — keeps the plan and the
    * signed-measure semantics intact.)
    */
  def q9(lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
         nation: DataFrame, part: DataFrame,
         namePattern: String = "red"): DataFrame = {
    val pt = part.filter(col("p_name").contains(namePattern))
      .select(col("p_partkey").as("l_partkey"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " div 5").as("cost_c"))
    val supp = supplier.join(broadcast(nation),
      col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("n_name").as("nation"))
    val ord = orders.select(col("o_orderkey").as("l_orderkey"),
      year(col("o_orderdate").cast("timestamp")).cast("long").as("o_year"))
    lineitem
      .join(broadcast(pt), Seq("l_partkey"))
      .join(broadcast(supp), Seq("l_suppkey"))
      .join(ord, Seq("l_orderkey"))
      .withColumn("amount_e4",
        revE4 - col("cost_c") * 100L * col("l_quantity").cast("long"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("amount_e4")).as("profit_e4"),
        count(lit(1)).as("n_items"))
      .orderBy("nation", "o_year")
  }

  /** 2-D skyline (Pareto front, minimize both axes) — "no other row is
    * at most as expensive AND at most as large, strictly better in one":
    * the multi-objective shortlist query (cheapest-per-size-class
    * suppliers, best quality-per-cost corpora) that naive SQL writes as
    * an O(n²) NOT EXISTS. Distributed shape: a GRID PRUNE first — bucket
    * x into ≤`buckets` ranges off a one-row (min, max) broadcast,
    * per-bucket min-y in one partial-agg groupBy, strict-prefix
    * cumulative min over the ≤buckets frontier rows — keeps only points
    * below every strictly-lower bucket's best y. Dominance is transitive,
    * so every skyline point survives the prune and every pruned point is
    * provably dominated; the EXACT sweep (strict-x-range window + same-x
    * min) then runs over the bounded survivor set, never the corpus. The
    * survivor bound is ~O(buckets + |skyline| + per-bucket prefix
    * minima); a corpus concentrated in ONE x-bucket degrades toward the
    * global sort — widen `buckets` with the x-range, it only costs
    * frontier rows. Tie semantics: duplicate (x, y) points are mutual
    * non-dominators and ALL belong to the skyline.
    */
  def skyline2d(df: DataFrame, keyCol: String, xCol: String, yCol: String,
                buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = df.select(col(keyCol).as("pkey"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    // bounded: one-row global x-range for the grid
    val span = pts.agg(min(col("x")).as("x_min"), max(col("x")).as("x_max"))
    val bucketed = pts.crossJoin(broadcast(span))
      .withColumn("bx", expr(
        s"(x - x_min) * ${buckets}L div (x_max - x_min + 1)"))
    val wPrev = Window.orderBy(col("bx").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // ≤buckets rows: the strict-prefix frontier
    val frontier = bucketed.groupBy(col("bx"))
      .agg(min(col("y")).as("by_min"))
      .withColumn("y_before", min(col("by_min")).over(wPrev))
      .select(col("bx"), col("y_before"))
    val survivors = bucketed.join(broadcast(frontier), Seq("bx"))
      .filter(col("y_before").isNull || col("y") < col("y_before"))
      .select(col("pkey"), col("x"), col("y"))
    // exact dominance over the bounded survivors: strictly-smaller-x
    // best y (RANGE frame excludes same-x peers) + same-x strict min
    val prevX = Window.orderBy(col("x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val atX = Window.partitionBy(col("x"))
    survivors
      .withColumn("min_y_lt_x", min(col("y")).over(prevX))
      .withColumn("min_y_at_x", min(col("y")).over(atX))
      .filter((col("min_y_lt_x").isNull || col("y") < col("min_y_lt_x")) &&
        col("y") === col("min_y_at_x"))
      .select(col("pkey"), col("x"), col("y"))
      .orderBy("x", "y", "pkey")
  }

  /** Supplier-diversity probe (TPC-H Q16 shape): distinct suppliers per
    * surviving (brand, type, size) part class, with a brand/type/size
    * exclusion list and a bad-supplier anti-join — the COUNT(DISTINCT)
    * -over-a-reconstructed-bridge plan shape. (Classic Q16 reads
    * partsupp and excludes complaint suppliers by comment; this corpus
    * has neither, so the part↔supplier bridge is the DISTINCT
    * (l_partkey, l_suppkey) projection of lineitem and the stand-in
    * exclusion is s_acctbal < 0 — same plan, same semantics.)
    *
    * Scale shape: the filtered part class list broadcasts ONTO THE
    * LINEITEM SCAN (fact shrinks to matching parts before anything
    * shuffles); the excluded suppliers are a broadcast LEFT ANTI (fact
    * side never shuffles for it); the distinct-supplier count is the
    * standard two-stage agg — partial distinct on (class, suppkey),
    * then the class rollup. One orderkey-free shuffle pair, both
    * map-side combining.
    */
  def q16(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
          excludeBrand: String = "Brand#45",
          excludeType: String = "PROMO",
          sizes: Seq[Int] = Seq(1, 14, 23, 45, 19, 3, 36, 9)): DataFrame = {
    val pt = part
      .filter(col("p_brand") =!= excludeBrand &&
        col("p_type") =!= excludeType &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey").as("l_partkey"), col("p_brand"),
        col("p_type"), col("p_size").cast("long").as("p_size"))
    val bad = supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("l_suppkey"))
    lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(pt), Seq("l_partkey"))
      .join(broadcast(bad), Seq("l_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Important-stock probe (TPC-H Q11 shape): parts whose revenue share
    * exceeds `bp`/10000 (basis points) of the grand total — the HAVING-against-a-
    * scalar-subquery plan shape. Exact integer threshold: the share
    * test cross-multiplies (1000·rev_e4 > permille·total_e4) through
    * DECIMAL(38,0), so no division ever happens and the cut is
    * bit-reproducible (10000·rev_e4 > bp·total_e4). (Classic Q11
    * values partsupp stock; this corpus
    * prices the part's lineitem revenue — same plan: one keyed partial
    * agg, one ONE-ROW total broadcast back, a filter, a sort.)
    *
    * Scale shape: the groupBy compresses the fact table to the part
    * domain before the one-row total crosses back — nothing
    * corpus-sized moves twice; the final sort is over the filtered
    * survivor list only.
    */
  /** Dominant-supplier probe (TPC-H Q20 shape): suppliers who shipped
    * MORE THAN HALF of some name-filtered part's total volume inside a
    * date band — the nested-semi-join-with-correlated-aggregate plan
    * that separates decorrelating engines from per-row re-executors.
    * Decorrelation is explicit: per-(supplier, part) quantities
    * aggregate ONCE, per-part totals RE-AGGREGATE from that frame (no
    * second scan), and the half test cross-multiplies (2·qty_sp >
    * qty_p, exact BIGINT — quantities are integral). (Classic Q20
    * thresholds partsupp availqty; this corpus has no partsupp, so
    * "stocks more than half" becomes "shipped more than half" — the
    * identical join/agg shape.)
    *
    * Scale shape: the name-filtered part list broadcasts ONTO the
    * lineitem scan (with the date band) before anything shuffles; one
    * (supp, part) partial agg, one part-keyed re-agg joined back, one
    * supplier rollup, one broadcast name join.
    */
  def q20(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
          namePattern: String = "red",
          dayLo: String = "1996-01-01", dayHi: String = "1997-01-01")
  : DataFrame = {
    val lo = java.time.LocalDate.parse(dayLo).toEpochDay
    val hi = java.time.LocalDate.parse(dayHi).toEpochDay
    val pt = part.filter(col("p_name").contains(namePattern))
      .select(col("p_partkey").as("l_partkey"))
    val sp = lineitem
      .filter(shipEpochDay >= lit(lo) && shipEpochDay < lit(hi))
      .join(broadcast(pt), Seq("l_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty_sp"))
    val totals = sp.groupBy(col("l_partkey"))
      .agg(sum(col("qty_sp")).as("qty_p"))
    sp.join(totals, Seq("l_partkey"))
      .filter(col("qty_sp") * 2L > col("qty_p"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominated"))
      .join(broadcast(supplier.select(col("s_suppkey").as("l_suppkey"),
        col("s_name"))), Seq("l_suppkey"))
      .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
        col("n_dominated"))
      .orderBy(col("n_dominated").desc, col("s_suppkey"))
  }

  def q11(lineitem: DataFrame, bp: Long = 7L): DataFrame = {
    val perPart = lineitem
      .select(col("l_partkey"), revE4.as("rev_e4"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("rev_e4")).as("rev_e4"))
    perPart
      .withColumn("total_e4", expr("sum(rev_e4) OVER ()"))
      .filter(expr(
        s"""CAST(rev_e4 AS DECIMAL(38,0)) * 10000
            > CAST(total_e4 AS DECIMAL(38,0)) * ${bp}L"""))
      .select(col("l_partkey"), col("rev_e4"))
      .orderBy(col("rev_e4").desc, col("l_partkey"))
  }

  /** Cost-based join-order election from key histograms — the
    * optimizer's first decision, surfaced as data: for the chain
    * A ⋈_k1 B ⋈_k2 C, the EXACT intermediate cardinalities are
    * |A⋈B| = Σ_k cntA(k)·cntB(k) and |B⋈C| = Σ_k cntB(k)·cntC(k) —
    * computable from per-key COUNT frames without materializing either
    * join (the exact twin of [[Sketches.amsJoinSize]]'s estimate; what
    * Spark's CBO does from column statistics). The smaller intermediate
    * goes first. Count frames are key-cardinality sized; the pairwise
    * products ride keyed equi-joins, DECIMAL(38,0)-cast before the
    * multiply (hot keys square).
    */
  def joinOrderCard(a: DataFrame, aKey: String, b: DataFrame,
                    bKey1: String, bKey2: String, c: DataFrame,
                    cKey: String): DataFrame = {
    def counts(df: DataFrame, k: String) =
      df.groupBy(col(k).as("k")).agg(count(lit(1)).as("n"))
    def joinSize(x: DataFrame, y: DataFrame) =
      x.select(col("k"), col("n").as("nx"))
        .join(y.select(col("k"), col("n").as("ny")), Seq("k"))
        .agg(sum(expr("CAST(nx AS DECIMAL(38,0)) * ny")).as("rows"))
    val sizes = joinSize(counts(a, aKey), counts(b, bKey1))
      .select(col("rows").cast("long").as("ab_rows"))
      .crossJoin(broadcast(joinSize(counts(b, bKey2), counts(c, cKey))
        .select(col("rows").cast("long").as("bc_rows"))))
    val totals = a.agg(count(lit(1)).as("n_a"))
      .crossJoin(broadcast(b.agg(count(lit(1)).as("n_b"))))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_c"))))
    sizes.crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"), col("n_c"), col("ab_rows"),
        col("bc_rows"),
        when(col("ab_rows") <= col("bc_rows"), lit("ab_first"))
          .otherwise(lit("bc_first")).as("recommended"))
  }

  /** Stratified (directly standardized) treatment effect — the
    * confounder-adjusted estimate when treatment correlates with a
    * discrete covariate: per stratum s, the treat−control mean gap in
    * exact ppm cents, combined as ATE = Σ n_s·Δ_s div n (stratum-size
    * weights — direct standardization). Strata missing either arm drop
    * out (reported via n_strata). The weighted combine uses the
    * POSITIVE-OFFSET floor mean (Δ can be negative and Spark `div`
    * truncates where DuckDB `//` floors — the Warner-RR negative-operand
    * trap), with K = 10¹¹ » any ppm-cent gap.
    *
    * Scale shape: one partial-agg shuffle to the bounded stratum frame;
    * everything after is bounded arithmetic.
    */
  def adjustedAteCard(events: DataFrame): DataFrame = {
    val cells = events
      .select(col("event_type").as("stratum"),
        when(expr("CAST(conv(substring(md5(CAST(user_id AS STRING))," +
          " 1, 1), 16, 10) AS BIGINT)") < 8, 1L).otherwise(0L).as("t"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_s"), sum(col("t")).as("n_t"),
        sum(when(col("t") === 1L, col("cents")).otherwise(0L)).as("sum_t"),
        sum(when(col("t") === 0L, col("cents")).otherwise(0L)).as("sum_c"))
      .filter(col("n_t") > 0 && col("n_s") - col("n_t") > 0)
      .withColumn("diff_ppm", expr(
        "1000000L * sum_t div n_t - 1000000L * sum_c div (n_s - n_t)"))
    cells.groupBy()
      .agg(sum(col("n_s")).as("n_used"), count(lit(1)).as("n_strata"),
        sum(expr("n_s * diff_ppm")).as("wsum"))
      .select(col("n_used"), col("n_strata"),
        expr("(wsum + 100000000000L * n_used) div n_used" +
          " - 100000000000L").as("ate_ppm_cents"))
  }

  /** Difference-in-differences card — the pre/post × treat/control
    * estimate that separates a treatment effect from a level shift
    * everyone experienced. Unit = (user, period) value sums in cents;
    * the four cell means are exact ppm-cent integers (truncating
    * division, shared), and
    * DiD = (T_post − T_pre) − (C_post − C_pre) on those integers.
    * Treatment is the md5-parity split (the [[Events.abTest]] recipe),
    * period splits at `pivotDay`. One partial-agg shuffle to FOUR
    * cells; everything after is bounded arithmetic.
    */
  def didCard(events: DataFrame, pivotDay: Long): DataFrame = {
    val cells = events
      .select(
        when(expr("CAST(conv(substring(md5(CAST(user_id AS STRING))," +
          " 1, 1), 16, 10) AS BIGINT)") < 8, lit("T")).otherwise(lit("C"))
          .as("grp"),
        when(expr(s"ts div 86400000000 >= ${pivotDay}L"), lit("post"))
          .otherwise(lit("pre")).as("period"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("grp"), col("period"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c_sum"))
      .withColumn("mean_ppm", expr("1000000L * c_sum div n"))
    def cell(g: String, p: String) =
      sum(when(col("grp") === g && col("period") === p,
        col("mean_ppm")).otherwise(0L)).as(s"${g.toLowerCase}_$p")
    cells.groupBy()
      .agg(cell("T", "pre"), cell("T", "post"), cell("C", "pre"),
        cell("C", "post"), sum(col("n")).as("n_obs"))
      .select(col("n_obs"), col("t_pre"), col("t_post"), col("c_pre"),
        col("c_post"),
        expr("(t_post - t_pre) - (c_post - c_pre)").as("did_ppm_cents"))
  }
}
