package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model/filter evaluation cards — the exact-integer statistics a
  * training pipeline runs to judge a quality classifier, a dedup gate,
  * or a drift monitor before letting it touch 100 TB of data. Every
  * statistic here is rank/count algebra (no libm), so each query is
  * hash-exact against the SQL oracle.
  */
object Eval {

  /** Exact ROC AUC via the Mann–Whitney rank-sum identity — THE metric
    * for a corpus quality classifier, computed without materializing
    * pairs or a global sort of rows. AUC = P(score⁺ > score⁻) +
    * ½P(score⁺ = score⁻); per distinct score s with (p_s, n_s) class
    * counts, the doubled pair count is Σ p_s·(2·negBelow(s) + n_s), and
    * AUC = that / (2·P·N) — ties handled exactly, no midranks, no
    * floats until the final ppm division (DECIMAL(38,0) cross-multiply,
    * overflow-free at any corpus size).
    *
    * Scale shape: ONE partial-aggregated groupBy on the score compresses
    * the corpus to its distinct-score domain; the cumulative window then
    * runs over that aggregated frame (scores are integerized by the
    * caller — quantize to the granularity that bounds the domain), never
    * over rows. `scoreCol` must be integral, `labelCol` boolean.
    */
  def aucExact(df: DataFrame, scoreCol: String = "score",
               labelCol: String = "label"): DataFrame = {
    val perScore = df
      .groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("p_s"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("n_s"))
    val below = Window.orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("neg_below", coalesce(sum(col("n_s")).over(below), lit(0L)))
      .agg(
        sum(col("p_s")).as("n_pos"),
        sum(col("n_s")).as("n_neg"),
        count(lit(1)).as("n_scores"),
        // promote to DECIMAL(38,0) BEFORE the multiply, not just before
        // the sum: the per-score product p_s·(2·neg_below+n_s) itself
        // nears 2·P·N and would overflow BIGINT (ANSI throws) once
        // P·N ~ 9.2e18 (~3e9 pos × 3e9 neg); decimal operands keep the
        // whole chain in the oracle's HUGEINT range (ADVICE r10/r11)
        sum(col("p_s").cast("decimal(38,0)") *
          (lit(2L) * col("neg_below").cast("decimal(38,0)") + col("n_s")))
          .as("num2"))
      .withColumn("auc_ppm",
        expr("""CAST(CAST(num2 AS DECIMAL(38,0)) * 1000000
                div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg) AS BIGINT)"""))
      .drop("num2")
  }

  /** Threshold confusion card: TP/FP/FN/TN plus precision, recall, F1
    * and accuracy in exact ppm — ONE conditional aggregation over the
    * scored corpus, nothing else. Zero-denominator cells surface as
    * NULL (portably — never a divide-by-zero, which one engine nulls
    * and the other throws). `scoreCol` integral, `labelCol` boolean;
    * predicted positive ⇔ score ≥ threshold.
    */
  def confusionCard(df: DataFrame, threshold: Long,
                    scoreCol: String = "score",
                    labelCol: String = "label"): DataFrame = {
    val pred = col(scoreCol) >= threshold
    val lab = col(labelCol)
    def n(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    df.agg(
      n(lab && pred).as("tp"), n(!lab && pred).as("fp"),
      n(lab && !pred).as("fn"), n(!lab && !pred).as("tn"))
      .withColumn("precision_ppm", expr(
        "CASE WHEN tp + fp = 0 THEN NULL" +
          " ELSE 1000000L * tp div (tp + fp) END"))
      .withColumn("recall_ppm", expr(
        "CASE WHEN tp + fn = 0 THEN NULL" +
          " ELSE 1000000L * tp div (tp + fn) END"))
      .withColumn("f1_ppm", expr(
        "CASE WHEN 2 * tp + fp + fn = 0 THEN NULL" +
          " ELSE 1000000L * 2 * tp div (2 * tp + fp + fn) END"))
      .withColumn("accuracy_ppm", expr(
        "1000000L * (tp + tn) div (tp + fp + fn + tn)"))
  }

  /** Matthews correlation coefficient card — the single-number
    * confusion summary that stays honest under class imbalance (F1
    * ignores TN entirely; accuracy saturates at the base rate). Same
    * threshold framing as [[confusionCard]]. The numerator TP·TN −
    * FP·FN routes through DECIMAL(38,0) (each product nears N²/4, past
    * BIGINT at ~6e9 rows) and the denominator factors as
    * `sqrt((TP+FP)(TP+FN))·sqrt((TN+FP)(TN+FN))` — two exact-integer
    * products cast to double under IEEE-correct sqrt, one fixed
    * expression tree, so the double is engine-portable (the welch
    * argument). Any zero margin → NULL, never ÷0.
    */
  def mccCard(df: DataFrame, threshold: Long,
              scoreCol: String = "score",
              labelCol: String = "label"): DataFrame = {
    val pred = col(scoreCol) >= threshold
    val lab = col(labelCol)
    def n(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    df.agg(
      n(lab && pred).as("tp"), n(!lab && pred).as("fp"),
      n(lab && !pred).as("fn"), n(!lab && !pred).as("tn"))
      .withColumn("mcc", expr(
        """CASE WHEN tp + fp = 0 OR tp + fn = 0
                  OR tn + fp = 0 OR tn + fn = 0 THEN NULL
           ELSE CAST(CAST(tp AS DECIMAL(38,0)) * tn
                   - CAST(fp AS DECIMAL(38,0)) * fn AS DOUBLE)
             / (sqrt(CAST(CAST(tp + fp AS DECIMAL(38,0))
                   * (tp + fn) AS DOUBLE))
              * sqrt(CAST(CAST(tn + fp AS DECIMAL(38,0))
                   * (tn + fn) AS DOUBLE)))
           END"""))
  }

  /** Per-group exact AUC — the per-domain/per-source quality audit, and
    * the form that actually scales: every window PARTITIONS on the
    * group, so no global ordering exists anywhere in the plan (the
    * global [[aucExact]] is the one-metric special case; this is what
    * a 100 TB multi-source corpus should run). Groups missing a class
    * surface as NULL AUC portably (never ÷0).
    */
  def aucByGroup(df: DataFrame, groupCol: String,
                 scoreCol: String = "score",
                 labelCol: String = "label"): DataFrame = {
    val perScore = df
      .groupBy(col(groupCol).as("g"), col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("p_s"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("n_s"))
    val below = Window.partitionBy("g").orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    perScore
      .withColumn("neg_below", coalesce(sum(col("n_s")).over(below), lit(0L)))
      .groupBy(col("g"))
      .agg(
        sum(col("p_s")).as("n_pos"),
        sum(col("n_s")).as("n_neg"),
        // same decimal-before-multiply promotion as [[aucExact]]: a
        // single hot group can hold the whole corpus, so the per-group
        // product has the identical ~2·P·N overflow ceiling
        sum(col("p_s").cast("decimal(38,0)") *
          (lit(2L) * col("neg_below").cast("decimal(38,0)") + col("n_s")))
          .as("num2"))
      .withColumn("auc_ppm", expr(
        """CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
           ELSE CAST(CAST(num2 AS DECIMAL(38,0)) * 1000000
             div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg) AS BIGINT) END"""))
      .select(col("g").as(groupCol), col("n_pos"), col("n_neg"),
        col("auc_ppm"))
      .orderBy(groupCol)
  }

  /** Binned reliability (calibration) card: equal-width score bins with
    * observed positive rate and mean score per bin — the diagram behind
    * "is the quality score a probability or just a ranking". Bin edges
    * derive from a ONE-ROW (min, max) aggregate broadcast onto the
    * stream (the skew_profile single-row-cross pattern); the bin id is
    * one exact integer expression, so the whole card is one extra
    * partial-aggregated groupBy over ≤ nBins keys. Mean score rides the
    * plain floor division (scores are non-negative offsets from minS).
    */
  def calibrationCard(df: DataFrame, nBins: Int = 10,
                      scoreCol: String = "score",
                      labelCol: String = "label"): DataFrame = {
    val src = df.select(col(scoreCol).as("s"),
      when(col(labelCol), 1L).otherwise(0L).as("y"))
    // bounded: one-row global score range
    val span = src.agg(min(col("s")).as("s_min"), max(col("s")).as("s_max"))
    src.crossJoin(broadcast(span))
      .withColumn("bin", expr(
        s"(s - s_min) * ${nBins}L div (s_max - s_min + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("s")).as("s_sum"), min(col("s")).as("s_lo"),
        max(col("s")).as("s_hi"))
      .withColumn("pos_rate_ppm", expr("1000000L * n_pos div n"))
      .withColumn("mean_score", expr("s_sum div n"))
      .select(col("bin"), col("n"), col("n_pos"), col("pos_rate_ppm"),
        col("mean_score"), col("s_lo"), col("s_hi"))
      .orderBy("bin")
  }

  /** Precision–recall curve over score-bin thresholds — the readout
    * that matters where positives are RARE and ROC flatters (a 99.9%-
    * negative corpus-quality classifier can have a great-looking AUC
    * and useless precision). At each threshold "predict positive for
    * bins ≥ b" (descending down the [[calibrationCard]] bins):
    * cumulative TP and predicted-positive counts close precision and
    * recall as exact ppm integer divisions. Degenerate zero-positive
    * data surfaces NULL recall portably.
    *
    * Scale shape: the corpus collapses to ≤ nBins rows in one
    * partial-agg groupBy (after the one-row span broadcast); the
    * cumulative windows and the one-row positive total run over that
    * bounded frame only.
    */
  def prCurve(df: DataFrame, nBins: Int = 10, scoreCol: String = "score",
              labelCol: String = "label"): DataFrame = {
    require(nBins >= 2)
    val src = df.select(col(scoreCol).as("s"),
      when(col(labelCol), 1L).otherwise(0L).as("y"))
    // bounded: one-row global score range
    val span = src.agg(min(col("s")).as("s_min"), max(col("s")).as("s_max"))
    // bounded ≤ nBins rows; feeds the windows AND the positive total
    val binned = src.crossJoin(broadcast(span))
      .withColumn("bin", expr(
        s"(s - s_min) * ${nBins}L div (s_max - s_min + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .localCheckpoint()
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("tp_cum", sum(col("n_pos")).over(w))
      .withColumn("pred_pos", sum(col("n")).over(w))
      .crossJoin(broadcast(binned.groupBy()
        .agg(sum(col("n_pos")).as("total_pos"))))
      .withColumn("precision_ppm", expr("1000000L * tp_cum div pred_pos"))
      .withColumn("recall_ppm", expr(
        "CASE WHEN total_pos = 0 THEN NULL" +
          " ELSE 1000000L * tp_cum div total_pos END"))
      .select(col("bin"), col("n"), col("n_pos"), col("tp_cum"),
        col("pred_pos"), col("precision_ppm"), col("recall_ppm"))
      .orderBy(col("bin").desc)
  }

  /** Two-sample Kolmogorov–Smirnov distance between the value
    * distributions of two event types — the distribution-drift test
    * with an EXACT rational answer: D = max over thresholds of
    * |F₁(v) − F₂(v)| = max |c₁(v)·n₂ − c₂(v)·n₁| / (n₁·n₂), all
    * integer until the final ppm division. Values are quantized to 1e-6
    * first (one IEEE multiply + floor, bit-identical in any engine) —
    * the computed D is exact FOR THE QUANTIZED DATA, the deterministic-
    * surrogate trade every float operator here makes.
    *
    * Scale shape: the corpus compresses to per-(quantized value) class
    * counts in one partial-aggregated groupBy; the cumulative windows
    * run over that distinct-value domain. Reported location is the
    * SMALLEST value attaining the max (deterministic argmax).
    */
  def ksTest(events: DataFrame, typeA: String, typeB: String,
             valueCol: String = "value"): DataFrame = {
    val v6 = floor(col(valueCol) * 1e6).cast("long")
    val perV = events
      .filter(col("event_type").isin(typeA, typeB))
      .select(col("event_type").as("t"), v6.as("v6"))
      .groupBy(col("v6"))
      .agg(sum(when(col("t") === typeA, 1L).otherwise(0L)).as("a"),
        sum(when(col("t") === typeB, 1L).otherwise(0L)).as("b"))
    val run = Window.orderBy(col("v6").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.orderBy(col("v6").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val dev = perV
      .withColumn("ca", sum(col("a")).over(run))
      .withColumn("cb", sum(col("b")).over(run))
      .withColumn("n1", sum(col("a")).over(whole))
      .withColumn("n2", sum(col("b")).over(whole))
      .withColumn("dev", abs(col("ca") * col("n2") - col("cb") * col("n1")))
      .withColumn("mx", max(col("dev")).over(whole))
    dev.filter(col("dev") === col("mx"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("dev")).as("d_num"), min(col("v6")).as("ks_at_v6"))
      .withColumn("d_ppm",
        expr("""CAST(CAST(d_num AS DECIMAL(38,0)) * 1000000
                div (n1 * n2) AS BIGINT)"""))
      .select(col("n1"), col("n2"), col("d_num"), col("d_ppm"),
        col("ks_at_v6"))
  }

  /** Daily-count autocorrelation function per event type, lags
    * 0…`maxLag` — the seasonality/burst-memory card behind forecast
    * model selection. The series is the GAP-FILLED daily event count
    * (missing days are real zeros, not skipped — ACF over an irregular
    * grid is not an ACF), and the estimator is the standard
    * fixed-denominator form r_k = Σₜ(xₜ−x̄)(xₜ₊ₖ−x̄) / Σₜ(xₜ−x̄)²,
    * computed EXACTLY by scaling through n²: numerator terms
    * (n·xₜ−S)(n·xₜ₊ₖ−S) are products of integers (|n·x| must stay under
    * ~3e9 for BIGINT products — days·daily-max, generous for any real
    * series; sums ride DECIMAL(38,0)). The ppm close rides the
    * positive-offset recipe ((num·1e6 + den·1e6) div den − 1e6) so the
    * possibly-NEGATIVE ratio floors identically in both engines.
    *
    * Scale shape: the corpus compresses to per-(type, day) counts in
    * one partial-aggregated groupBy; the grid, the lag pairing (an
    * equi-join on (type, day+k) — portable, unlike per-k lead windows),
    * and the moment rollup all run over the days×types×lags domain.
    */
  def acf(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = events
      .select(col("event_type"), expr("ts div 1000").as("us"))
      .withColumn("day", expr("us div 86400000000"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x"))
    val grid = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint() // feeds moments + both lag-join sides
    val mom = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val g = grid.join(broadcast(mom), Seq("event_type"))
      .select(col("event_type"), col("day"),
        (col("n") * col("x") - col("s")).as("c"), col("n"))
    val den = g.groupBy(col("event_type"))
      .agg(sum((col("c") * col("c")).cast("decimal(38,0)")).as("den"),
        max(col("n")).as("n_days"))
    val lags = (0 to maxLag).map(k => lit(k.toLong)).toArray
    // each row fans to maxLag+1 (day, lag) keys; the right side re-keys
    // the same fan-out to (day+lag → day), so the equi-join pairs
    // (x_t, x_{t+k}) — both sides re-derive off the checkpointed grid
    val gl = g.select(col("event_type"), col("day"), col("c"),
      explode(array(lags: _*)).as("lag"))
    val pairs = gl
      .join(gl.select(col("event_type"),
        (col("day") - col("lag")).as("day"), col("lag"),
        col("c").as("c_lead")),
        Seq("event_type", "day", "lag"))
      .groupBy(col("event_type"), col("lag"))
      .agg(sum((col("c") * col("c_lead")).cast("decimal(38,0)")).as("num"),
        count(lit(1)).as("n_pairs"))
    pairs.join(broadcast(den), Seq("event_type"))
      .withColumn("acf_ppm", expr(
        """CAST((num * 1000000 + den * 1000000) div den - 1000000
           AS BIGINT)"""))
      .select(col("event_type"), col("lag"), col("n_days"), col("n_pairs"),
        col("acf_ppm"))
      .orderBy("event_type", "lag")
  }
  /** Cumulative gains / lift card at score-group granularity — the
    * "top-decile capture" readout a targeting or data-selection model
    * ships with: rank the corpus by score descending, cut at each
    * cumulative nBins-tile boundary, and report what fraction of all
    * positives the prefix captures (capture) and how much better than
    * random that is (lift). Cuts land on DISTINCT-SCORE group edges
    * (no arbitrary intra-tie split — ties are never divided, so the
    * card is deterministic and engine-portable by construction; a
    * score group straddling a boundary rolls wholly into the later
    * bin). Both ratios are exact integer ppm via DECIMAL(38,0)
    * cross-multiplication — overflow-free at any corpus size.
    *
    * Scale shape: the [[aucExact]] skeleton — ONE partial-aggregated
    * groupBy compresses rows to the distinct-score domain, and both
    * cumulative windows share one ordering over that aggregated frame
    * (a single WindowExec), never over corpus rows.
    */
  def gainsCard(df: DataFrame, nBins: Int = 10,
                scoreCol: String = "score",
                labelCol: String = "label"): DataFrame = {
    val perScore = df
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n_s"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("p_s"))
    val cum = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perScore
      .withColumn("cum_n", sum(col("n_s")).over(cum))
      .withColumn("cum_pos", sum(col("p_s")).over(cum))
      .withColumn("tot_n", sum(col("n_s")).over(tot))
      .withColumn("tot_pos", sum(col("p_s")).over(tot))
      .withColumn("bin",
        expr(s"(cum_n * ${nBins}L + tot_n - 1) div tot_n"))
      .groupBy(col("bin"))
      .agg(max(col("cum_n")).as("rows_cum"),
        max(col("cum_pos")).as("pos_cum"),
        max(col("tot_n")).as("n"), max(col("tot_pos")).as("n_pos"))
      .withColumn("capture_ppm", expr(
        """CAST(CAST(pos_cum AS DECIMAL(38,0)) * 1000000
           div n_pos AS BIGINT)"""))
      .withColumn("lift_ppm", expr(
        """CAST(CAST(pos_cum AS DECIMAL(38,0)) * 1000000 * n
           div (CAST(n_pos AS DECIMAL(38,0)) * rows_cum) AS BIGINT)"""))
      .orderBy("bin")
  }

  /** Chi-square test of independence over a two-way contingency table —
    * "is event mix independent of day-of-week", the categorical drift /
    * association audit. Exact integer identity: with cell count O,
    * margins R, C and total N, each cell contributes
    * (O·N − R·C)² / (N·R·C); the statistic is reported as chi2_e6
    * (×10⁶, floor-divided per cell through DECIMAL(38,0) — portable
    * and reduction-order-free), with Cramér's V in ppm off the one
    * final IEEE sqrt (portable; both engines run the identical op
    * sequence). Exactness bound: the squared residual times 10⁶ must
    * fit DECIMAL(38,0), which holds through N ≈ 5·10⁷ observations —
    * beyond that, pre-aggregate (e.g. per day) before testing.
    *
    * Scale shape: ONE partial-aggregated groupBy compresses the corpus
    * to |A|×|B| cells; margins are windows OVER THE CELL FRAME (each
    * partition ≤ the opposite domain's cardinality), so nothing
    * corpus-sized ever moves after the first agg.
    */
  def chi2Independence(df: DataFrame, aCol: String,
                       bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val wa = Window.partitionBy("a")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wb = Window.partitionBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("r", sum(col("o")).over(wa))
      .withColumn("c", sum(col("o")).over(wb))
      .withColumn("n", sum(col("o")).over(wAll))
      .withColumn("contrib_e6", expr(
        """CAST((CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
             * (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
             * 1000000
           div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"""))
      .agg(max(col("n")).as("n"),
        countDistinct(col("a")).as("ra"),
        countDistinct(col("b")).as("cb"),
        sum(col("contrib_e6")).as("chi2_e6"))
      .withColumn("dof", expr("(ra - 1) * (cb - 1)"))
      .withColumn("cramer_ppm", expr(
        """CAST(floor(sqrt((CAST(chi2_e6 AS DOUBLE)
             / CAST('1000000' AS DOUBLE))
             / CAST(n * (least(ra, cb) - 1) AS DOUBLE))
           * CAST('1000000' AS DOUBLE)) AS BIGINT)"""))
  }

  /** Isotonic (monotone) calibration curve via the minimax identity —
    * the non-parametric recalibration step between a scorer and a
    * threshold decision: fitted_i = max_{j≤i} min_{k≥i} mean(y[j..k]),
    * the closed form of the PAVA solution, which needs no sequential
    * pooling loop and so distributes. Exactness: means are ppm
    * floor-divisions of prefix-sum differences (all-BIGINT; the product
    * 10⁶·Σy fits through corpora of 9·10¹² rows), and because floor is
    * nondecreasing it commutes with both the min and the max — the
    * output IS floor(10⁶ · isotonic fit), not an approximation of it.
    *
    * Scale shape: one partial-aggregated groupBy compresses the corpus
    * to ≤`maxBins` quantized score bins (`quant` is the deterministic-
    * surrogate knob, the ksTest trade), then the j≤k pair frame is
    * bins², built by broadcasting the bounded bin frame against itself
    * (whitelisted bounded BNLJ, the ann_brute class); two windows
    * (suffix-min over k within j, then max over j within i) finish it.
    * Nothing corpus-sized moves after the first agg.
    */
  def isotonicCard(df: DataFrame, quant: Long = 16L,
                   scoreCol: String = "score",
                   labelCol: String = "label"): DataFrame = {
    val bins = df
      .groupBy(expr(s"CAST($scoreCol AS BIGINT) div ${quant}L").as("s"))
      .agg(count(lit(1)).as("n_s"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("p_s"))
    val cum = Window.orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val idx = bins
      .withColumn("cum_n", sum(col("n_s")).over(cum))
      .withColumn("cum_p", sum(col("p_s")).over(cum))
    val left = broadcast(idx.select(col("s").as("j"),
      (col("cum_n") - col("n_s")).as("n_before_j"),
      (col("cum_p") - col("p_s")).as("p_before_j")))
    val pairs = left
      .join(idx.select(col("s").as("k"), col("cum_n").as("n_k"),
        col("cum_p").as("p_k")), col("j") <= col("k"))
      .withColumn("mean_ppm", expr(
        "1000000L * (p_k - p_before_j) div (n_k - n_before_j)"))
    val sufMin = Window.partitionBy(col("j")).orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    pairs
      .withColumn("minmean_ppm", min(col("mean_ppm")).over(sufMin))
      .groupBy(col("k").as("s"))
      .agg(max(col("minmean_ppm")).as("iso_ppm"))
      .join(bins, Seq("s"))
      .select(col("s"), col("n_s"), col("p_s"), col("iso_ppm"))
      .orderBy("s")
  }

  /** Off-policy bandit evaluation by replay: learn a greedy per-context
    * policy (dow → highest-total-reward event type) on an md5-coin
    * train split, then score it on the held-out logs by REPLAY — only
    * logged events whose arm matches the policy's choice count, the
    * unbiased-under-uniform-logging estimator (Li et al.'s replay
    * method) and the standard "would this targeting rule have paid off"
    * readout before an online test. Exact end to end: rewards are
    * floored cents, the argmax is the deterministic
    * complement-struct-min (DuckDB twin: row_number ORDER BY reward
    * DESC, arm), the split is the portable md5-hex threshold, and means
    * are integer cent divisions (values non-negative, no div corner).
    *
    * Scale shape: the policy is a two-stage bounded agg (|dow|×|arms|
    * cells → |dow| rows) broadcast back onto the held-out stream — one
    * partial-agg shuffle each side, nothing corpus-sized re-moves.
    */
  def policyReplay(events: DataFrame): DataFrame = {
    val base = events.select(
      expr("ts div 86400000000000 % 7").as("dow"),
      col("event_type"),
      expr("CAST(floor(value * 100) AS BIGINT)").as("cents"),
      (substring(md5(col("event_id").cast("string")), 1, 1) < lit("8"))
        .as("is_train"))
    val policy = base.filter(col("is_train"))
      .groupBy(col("dow"), col("event_type"))
      .agg(sum(col("cents")).as("r"))
      .groupBy(col("dow"))
      .agg(min(struct((lit(1L << 62) - col("r")).as("c"),
        col("event_type").as("t"))).as("best"))
      .select(col("dow"), col("best.t").as("chosen_type"))
    base.filter(!col("is_train"))
      .join(broadcast(policy), Seq("dow"))
      .groupBy(col("dow"), col("chosen_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("event_type") === col("chosen_type"), 1L)
          .otherwise(0L)).as("n_matched"),
        sum(when(col("event_type") === col("chosen_type"), col("cents"))
          .otherwise(0L)).as("matched_c"),
        sum(col("cents")).as("all_c"))
      .withColumn("match_ppm", expr("1000000L * n_matched div n_eval"))
      .withColumn("replay_mean_e2", expr(
        "CASE WHEN n_matched = 0 THEN NULL ELSE matched_c div n_matched END"))
      .withColumn("base_mean_e2", expr("all_c div n_eval"))
      .select(col("dow"), col("chosen_type"), col("n_eval"),
        col("n_matched"), col("match_ppm"), col("replay_mean_e2"),
        col("base_mean_e2"))
      .orderBy("dow")
  }

  /** Murphy decomposition of the Brier score — the one-row card that
    * says WHERE a probabilistic scorer loses: reliability (calibration
    * gap, lower better), resolution (how far bin outcomes move from
    * the base rate, higher better), uncertainty (the data's own
    * irreducible ō(1−ō)); binned Brier ≈ REL − RES + UNC. All terms
    * are exact ppm² integers (1e12 = 1.0): the raw score min-max maps
    * to a ppm probability (the [[calibrationCard]] span broadcast),
    * per-bin means use truncating division shared by both engines,
    * and every square is DECIMAL(38,0)-cast BEFORE the multiply. The
    * card also closes the EXACT unbinned Brier Σ(p−10⁶y)² div N —
    * the decomposition's binning error is visible as the difference.
    *
    * Scale shape: one corpus pass to ≤ nBins cells, then bounded-frame
    * arithmetic (one-row span + one-row totals broadcasts).
    */
  def brierDecomposition(df: DataFrame, nBins: Int = 10,
                         scoreCol: String = "score",
                         labelCol: String = "label"): DataFrame = {
    require(nBins >= 2)
    val src = df.select(col(scoreCol).as("s"),
      when(col(labelCol), 1L).otherwise(0L).as("y"))
    // bounded: one-row global score range
    val span = src.agg(min(col("s")).as("s_min"), max(col("s")).as("s_max"))
    val scored = src.crossJoin(broadcast(span))
      .withColumn("p_ppm", expr(
        "1000000L * (s - s_min) div (s_max - s_min + 1)"))
      .withColumn("bin", expr(s"p_ppm * ${nBins}L div 1000000"))
    val bins = scored.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("p_ppm")).as("p_sum"),
        sum(expr("CAST(p_ppm - 1000000 * y AS DECIMAL(38,0))" +
          " * (p_ppm - 1000000 * y)")).as("se"))
      .withColumn("p_bar", expr("p_sum div n"))
      .withColumn("o_bar", expr("1000000L * n_pos div n"))
    val tot = bins.groupBy().agg(sum(col("n")).as("n_total"),
      sum(col("n_pos")).as("pos_total"), sum(col("se")).as("se_total"))
      .withColumn("o_ppm", expr("1000000L * pos_total div n_total"))
    bins.crossJoin(broadcast(tot))
      .groupBy()
      .agg(max(col("n_total")).as("n"),
        max(col("o_ppm")).as("base_rate_ppm"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * (p_bar - o_bar)" +
          " * (p_bar - o_bar)")).as("rel_num"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * (o_bar - o_ppm)" +
          " * (o_bar - o_ppm)")).as("res_num"),
        max(col("se_total")).as("se_num"))
      .select(col("n"), col("base_rate_ppm"),
        expr("CAST(se_num div n AS BIGINT)").as("brier_ppm2"),
        expr("CAST(rel_num div n AS BIGINT)").as("rel_ppm2"),
        expr("CAST(res_num div n AS BIGINT)").as("res_ppm2"),
        expr("base_rate_ppm * (1000000 - base_rate_ppm)").as("unc_ppm2"))
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * labelings (a heuristic classifier vs the dataset label, or two
    * annotators in a labeling pipeline). Multi-class, exact:
    * κ = (n·Σdiag − Σₖ rowₖ·colₖ) / (n² − Σₖ rowₖ·colₖ), emitted as a
    * floored ppm alongside the raw observed/expected agreement — raw
    * accuracy (`eval_confusion` / `text_langid_eval`) overstates
    * agreement whenever one class dominates; kappa is the release-gate
    * number.
    *
    * Scale shape: ONE partial-aggregated groupBy compresses the corpus
    * to its (a, b) label-pair cells; the marginal products run over
    * that bounded frame (|classes|² rows). DECIMAL(38,0) before every
    * product — n² overflows BIGINT past ~3e9 rows.
    */
  def kappaCard(df: DataFrame, aCol: String = "label_a",
                bCol: String = "label_b"): DataFrame = {
    val cells = df.groupBy(col(aCol).as("la"), col(bCol).as("lb"))
      .agg(count(lit(1)).as("c"))
    val rows = cells.groupBy(col("la")).agg(sum(col("c")).as("row_n"))
    val cols = cells.groupBy(col("lb")).agg(sum(col("c")).as("col_n"))
    val chance = rows.join(cols, col("la") === col("lb"))
      .agg(sum(expr("CAST(row_n AS DECIMAL(38,0)) * col_n")).as("pe_num"))
    cells
      .agg(sum(col("c")).as("n"),
        sum(when(col("la") === col("lb"), col("c")).otherwise(0L))
          .as("n_agree"))
      .crossJoin(broadcast(chance)) // one row × one row
      .select(col("n"), col("n_agree"),
        expr("1000000L * n_agree div n").as("po_ppm"),
        expr("""CAST(pe_num * 1000000 div (CAST(n AS DECIMAL(38,0)) * n)
                AS BIGINT)""").as("pe_ppm"),
        expr("""CASE WHEN CAST(n AS DECIMAL(38,0)) * n = pe_num THEN NULL
                ELSE CAST((CAST(n AS DECIMAL(38,0)) * n_agree - pe_num) * 1000000
                div (CAST(n AS DECIMAL(38,0)) * n - pe_num)
                AS BIGINT) END""").as("kappa_ppm"))
  }

  /** McNemar paired-classifier comparison: are model A and model B
    * DIFFERENT, judged only on the rows where they disagree? b = A
    * right & B wrong, c = A wrong & B right; the continuity-free
    * statistic (b−c)²/(b+c) in exact ppm (χ²₁ > 3.84 ⇔ ppm >
    * 3_840_000). The A/B test for swapping a quality filter: marginal
    * accuracies can tie while one model dominates the disagreement
    * cells. ONE conditional aggregation; b+c = 0 surfaces NULL, never a
    * throw.
    */
  def mcnemarCard(df: DataFrame, labelCol: String = "label",
                  predAcol: String = "pred_a",
                  predBcol: String = "pred_b"): DataFrame = {
    val aOk = col(predAcol) === col(labelCol)
    val bOk = col(predBcol) === col(labelCol)
    df.agg(
        count(lit(1)).as("n"),
        sum(when(aOk, 1L).otherwise(0L)).as("a_correct"),
        sum(when(bOk, 1L).otherwise(0L)).as("b_correct"),
        sum(when(aOk && !bOk, 1L).otherwise(0L)).as("b_cell"),
        sum(when(!aOk && bOk, 1L).otherwise(0L)).as("c_cell"))
      .withColumn("chi2_ppm", expr(
        """CASE WHEN b_cell + c_cell = 0 THEN NULL
           ELSE CAST(1000000 * CAST(b_cell - c_cell AS DECIMAL(38,0))
                * (b_cell - c_cell)
                div (b_cell + c_cell) AS BIGINT) END"""))
  }

  /** Per-class precision/recall/F1 card for a MULTI-CLASS classifier
    * (langid, topic router, quality tier), plus a `__macro__` summary
    * row — the release gate where binary [[confusionCard]] doesn't
    * apply. F1 uses the single-division identity 2·tp/(n_pred +
    * n_true) (= 2tp/(2tp+fp+fn)), so every ppm is one exact integer
    * div, never a composition of two rounded ratios. The macro row
    * carries micro accuracy (= Σtp/n, which is micro-P = micro-R =
    * micro-F1 for single-label data) in the precision/recall columns
    * and the unweighted mean of per-class f1_ppm in f1_ppm.
    *
    * Scale shape: ONE partial-aggregated groupBy compresses the corpus
    * to its (label, pred) cells; everything after runs on that bounded
    * |classes|² frame. Classes missing on one side surface with 0
    * counts and NULL ratios, never dropped.
    */
  def macroF1Card(df: DataFrame, labelCol: String = "label",
                  predCol: String = "pred"): DataFrame = {
    val cells = df.groupBy(col(labelCol).as("lab"), col(predCol).as("prd"))
      .agg(count(lit(1)).as("c"))
    val classes = cells.select(col("lab").as("cls"))
      .unionByName(cells.select(col("prd").as("cls"))).distinct()
    val tp = cells.filter(col("lab") === col("prd"))
      .select(col("lab").as("cls"), col("c").as("tp"))
    val nTrue = cells.groupBy(col("lab").as("cls"))
      .agg(sum(col("c")).as("n_true"))
    val nPred = cells.groupBy(col("prd").as("cls"))
      .agg(sum(col("c")).as("n_pred"))
    val perClass = classes
      .join(tp, Seq("cls"), "left")
      .join(nTrue, Seq("cls"), "left")
      .join(nPred, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision_ppm", expr(
        "CASE WHEN n_pred = 0 THEN NULL ELSE 1000000L * tp div n_pred END"))
      .withColumn("recall_ppm", expr(
        "CASE WHEN n_true = 0 THEN NULL ELSE 1000000L * tp div n_true END"))
      .withColumn("f1_ppm", expr(
        """CASE WHEN n_pred + n_true = 0 THEN NULL
           ELSE 1000000L * 2 * tp div (n_pred + n_true) END"""))
    val summary = perClass.agg(
        sum(col("n_true")).as("n_true"),
        sum(col("n_pred")).as("n_pred"),
        sum(col("tp")).as("tp"),
        count(lit(1)).as("k"),
        sum(coalesce(col("f1_ppm"), lit(0L))).as("f1sum"))
      .select(lit("__macro__").as("cls"), col("n_true"), col("n_pred"),
        col("tp"),
        expr("1000000L * tp div n_true").as("precision_ppm"),
        expr("1000000L * tp div n_true").as("recall_ppm"),
        expr("f1sum div k").as("f1_ppm"))
    perClass.unionByName(summary)
  }

  /** Exact Spearman rank correlation — Pearson over DOUBLED midranks
    * (tie group of size t starting after b rows below has average rank
    * b + (t+1)/2, i.e. doubled rank 2b + t + 1, an integer — no float
    * ever enters the rank algebra). The co-moments num = n·Σxy − Σx·Σy
    * and d1/d2 stay DECIMAL(38,0); rho = num/√(d1·d2) goes through TWO
    * separate IEEE sqrts (√d1·√d2 — d1·d2 would need a decimal→double
    * cast, the one conversion DuckDB double-rounds) and one floor to
    * ppm. NULL when either margin is constant.
    *
    * Scale shape: each rank map is ONE partial-aggregated groupBy on
    * the value plus a window over the bounded DISTINCT-value domain
    * (the [[aucExact]] recipe — callers integerize/quantize values so
    * the domain stays bounded), then two keyed joins back and one
    * total aggregation. The final BIGINT casts of num/d1/d2 throw
    * loudly past 2^63 (≈ n·Σr² at n ≈ 10⁶ rows with raw ranks) —
    * quantize ranks to a coarser grid at that scale.
    */
  def spearmanCard(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val rows = df.select(col(xCol).as("x"), col(yCol).as("y"))
    def ranks2(c: String): DataFrame = {
      val w = Window.orderBy(col(c).asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      rows.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .withColumn("below", coalesce(sum(col("cnt")).over(w), lit(0L)))
        .select(col(c),
          (lit(2L) * col("below") + col("cnt") + lit(1L)).as(s"r2$c"))
    }
    rows.join(ranks2("x"), "x").join(ranks2("y"), "y")
      .agg(count(lit(1)).as("n"),
        sum(col("r2x")).as("sx"), sum(col("r2y")).as("sy"),
        sum(col("r2x").cast("decimal(38,0)") * col("r2x")).as("sxx"),
        sum(col("r2y").cast("decimal(38,0)") * col("r2y")).as("syy"),
        sum(col("r2x").cast("decimal(38,0)") * col("r2y")).as("sxy"))
      .select(col("n"),
        expr("CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT)")
          .as("num"),
        expr("CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT)")
          .as("d1"),
        expr("CAST(n * syy - CAST(sy AS DECIMAL(38,0)) * sy AS BIGINT)")
          .as("d2"))
      .withColumn("rho_ppm", expr(
        """CASE WHEN d1 = 0 OR d2 = 0 THEN NULL
           ELSE CAST(floor(CAST('1000000' AS DOUBLE) * num /
                (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE))))
             AS BIGINT) END"""))
  }

  /** Rank-biased overlap (RBO, Webber et al.) between two top-`k`
    * rankings per query at persistence p = 9/10 — the ranking-drift
    * number for comparing retrieval stacks (BM25 vs hybrid, index v1
    * vs v2): RBO = (1−p)·Σ_d p^(d−1)·|A_1..d ∩ B_1..d|/d, top-weighted
    * where plain overlap is not. Every term is floored to ppm
    * INDIVIDUALLY — X_d·9^(d−1)·10⁶ div (10^d·d), pure integer — so
    * the sum is engine-exact (the scaled-term recipe). `k ≤ 15` keeps
    * 10^d·d in BIGINT; the 9/10-power constants join in as a k-row
    * literal table.
    *
    * Scale shape: one equi-join of the two rank frames on (query, doc)
    * — both sides are top-k projections, so the frame is ≤ k rows per
    * query; the depth explode runs on the ≤ k aggregated (query, m)
    * cells, never the corpus. Output: (query_id, n_common, rbo_ppm);
    * disjoint rankings emit rbo_ppm = 0 via the left join against the
    * query universe.
    */
  def rboCard(rankA: DataFrame, rankB: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 15, "k <= 15 keeps 10^d * d in BIGINT")
    val sp = rankA.sparkSession
    import sp.implicits._
    val a = rankA.select(col("query_id"), col("doc_id"),
      col("rnk").as("ra")).filter(col("ra") <= k)
    val b = rankB.select(col("query_id"), col("doc_id"),
      col("rnk").as("rb")).filter(col("rb") <= k)
    val joined = a.join(b, Seq("query_id", "doc_id"))
      .select(col("query_id"), greatest(col("ra"), col("rb")).as("m"))
    val consts = (1 to k).map { d =>
      (d.toLong, BigInt(9).pow(d - 1).toLong * 1000000L,
        BigInt(10).pow(d).toLong * d)
    }.toDF("d", "w_num", "w_den")
    val terms = joined.groupBy(col("query_id"), col("m"))
      .agg(count(lit(1)).as("cm"))
      .select(col("query_id"), explode(expr(s"sequence(m, ${k}L)")).as("d"),
        col("cm"))
      .groupBy(col("query_id"), col("d")).agg(sum(col("cm")).as("x_d"))
      .join(broadcast(consts), Seq("d"))
      .select(col("query_id"),
        expr("CAST(x_d AS DECIMAL(38,0)) * w_num div w_den").as("term_ppm"),
        col("x_d"), col("d"))
    val queries = a.select(col("query_id")).distinct()
    queries.join(
        terms.groupBy(col("query_id"))
          .agg(sum(col("term_ppm")).as("rbo_ppm"),
            max(when(col("d") === k, col("x_d"))).as("n_common")),
        Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("rbo_ppm"), lit(0L)).as("rbo_ppm"))
  }

  /** Split-conformal calibration card — the distribution-free coverage
    * gate: hold out a calibration split (md5-parity of the id —
    * portable, deterministic), take q = the ⌈(1−α)(n_cal+1)⌉-th
    * smallest nonconformity score, and report achieved coverage
    * P(s ≤ q) on the OTHER split. Conformal's guarantee says coverage
    * ≥ 1−α up to quantization regardless of the model — a card reading
    * far from target_ppm means the split is not exchangeable (drifted
    * or leaked), which is exactly what a pipeline wants to catch.
    * All rank algebra: the quantile is an exact order statistic
    * (ceil via (num + den − 1) div den), coverage an exact count
    * ratio.
    *
    * Scale shape: one groupBy compresses the calibration split to its
    * distinct score domain; the cumulative window runs over that
    * bounded frame ([[aucExact]] recipe); coverage is one conditional
    * aggregation against the broadcast one-row threshold.
    */
  def conformalCard(df: DataFrame, yCol: String, yhatCol: String,
                    idCol: String = "doc_id",
                    alphaPct: Int = 10): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 50)
    val scored = df.select(
      abs(col(yCol).cast("long") - col(yhatCol).cast("long")).as("s"),
      (conv(substring(md5(concat(lit("conf:"), col(idCol).cast("string"))),
        1, 8), 16, 10).cast("long") % 2 === 0).as("is_cal"))
    val cal = scored.filter(col("is_cal"))
    val w = Window.orderBy(col("s").asc)
    val cum = cal.groupBy(col("s")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    val q = cum.crossJoin(broadcast(nCal))
      .filter(col("cum") >=
        expr(s"(${100 - alphaPct} * (n_cal + 1) + 99) div 100"))
      .agg(min(col("s")).as("q"))
    scored.filter(!col("is_cal"))
      .crossJoin(broadcast(q))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("s") <= col("q"), 1L).otherwise(0L)).as("n_covered"),
        max(col("q")).as("q")) // constant within the broadcast row
      .crossJoin(broadcast(nCal))
      .select(col("n_cal"), col("n_test"), col("q"),
        expr("CASE WHEN n_test = 0 THEN NULL" +
          " ELSE 1000000L * n_covered div n_test END").as("coverage_ppm"),
        lit((100L - alphaPct) * 10000L).as("target_ppm"))
  }

  /** Decision-stump split election — distributed training of the
    * simplest model: the threshold on an integer score that minimizes
    * weighted Gini impurity (left = score ≤ v), with deterministic
    * min-value tie-breaks. cost_ppm = 10⁶·(2p_L q_L/n_L + 2p_R q_R/n_R)
    * /n cross-multiplied into ONE exact integer division
    * (2·(p_L·q_L·n_R + p_R·q_R·n_L) over n_L·n_R·n, DECIMAL(38,0)
    * products); gain_ppm is the drop from the unsplit Gini. The
    * feature-split primitive a tree trainer fans out per column.
    *
    * Scale shape: one partial-aggregated groupBy on the score value,
    * two cumulative windows over the bounded distinct-score domain
    * ([[aucExact]] recipe), a one-row total broadcast, and a
    * partial-aggregable min(struct) argmin. Callers integerize scores.
    */
  def bestSplitCard(df: DataFrame, scoreCol: String = "score",
                    labelCol: String = "label"): DataFrame = {
    val perScore = df.groupBy(col(scoreCol).as("v"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("p"),
        count(lit(1)).as("m"))
    val w = Window.orderBy(col("v").asc)
    val cum = perScore
      .withColumn("pl", sum(col("p")).over(w))
      .withColumn("nl", sum(col("m")).over(w))
    val tot = perScore.agg(sum(col("p")).as("pt"), sum(col("m")).as("nt"))
    val splits = cum.crossJoin(broadcast(tot))
      .filter(col("nl") < col("nt"))
      .withColumn("cost_ppm", expr(
        """CAST(1000000 * 2 * (CAST(pl AS DECIMAL(38,0)) * (nl - pl)
                  * (nt - nl)
                + CAST(pt - pl AS DECIMAL(38,0)) * ((nt - nl) - (pt - pl))
                  * nl)
           div (CAST(nl AS DECIMAL(38,0)) * (nt - nl) * nt) AS BIGINT)"""))
    splits
      .agg(min(struct(col("cost_ppm"), col("v"), col("pl"), col("nl")))
        .as("b"))
      .crossJoin(broadcast(tot))
      .select(col("b.v").as("split_value"),
        col("b.nl").as("n_left"),
        (col("nt") - col("b.nl")).as("n_right"),
        col("b.pl").as("pos_left"),
        col("b.cost_ppm").as("cost_ppm"),
        expr("""CAST(1000000 * 2 * CAST(pt AS DECIMAL(38,0)) * (nt - pt)
                div (CAST(nt AS DECIMAL(38,0)) * nt) AS BIGINT)""")
          .as("base_ppm"))
      .withColumn("gain_ppm", col("base_ppm") - col("cost_ppm"))
  }

  /** Group-fairness card — demographic-parity and equalized-odds gaps
    * per group in exact ppm: selection rate (P(pred)), TPR, FPR per
    * group, each minus the corresponding OVERALL rate. The release
    * audit for any classifier that gates content by source/language —
    * a large dp_gap on one group means the filter fires
    * disproportionately there. Gaps are differences of
    * already-truncated ppm integers (deterministic, engine-exact);
    * degenerate cells (no positives / no negatives in a group)
    * surface NULL, never a throw.
    *
    * Scale shape: ONE conditional aggregation per group plus a one-row
    * overall broadcast — nothing corpus-sized past the first groupBy.
    */
  def fairnessCard(df: DataFrame, groupCol: String = "grp",
                   labelCol: String = "label",
                   predCol: String = "pred"): DataFrame = {
    def rates(g: DataFrame): DataFrame = g
      .withColumn("sel_ppm", expr("1000000L * n_pos_pred div n"))
      .withColumn("tpr_ppm", expr(
        "CASE WHEN n_pos_true = 0 THEN NULL" +
          " ELSE 1000000L * tp div n_pos_true END"))
      .withColumn("fpr_ppm", expr(
        "CASE WHEN n - n_pos_true = 0 THEN NULL" +
          " ELSE 1000000L * fp div (n - n_pos_true) END"))
    val agg = Seq(
      count(lit(1)).as("n"),
      sum(when(col(predCol), 1L).otherwise(0L)).as("n_pos_pred"),
      sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos_true"),
      sum(when(col(predCol) && col(labelCol), 1L).otherwise(0L)).as("tp"),
      sum(when(col(predCol) && !col(labelCol), 1L).otherwise(0L)).as("fp"))
    val per = rates(df.groupBy(col(groupCol).as("grp"))
      .agg(agg.head, agg.tail: _*))
    val overall = rates(df.agg(agg.head, agg.tail: _*))
      .select(col("sel_ppm").as("o_sel"), col("tpr_ppm").as("o_tpr"),
        col("fpr_ppm").as("o_fpr"))
    per.crossJoin(broadcast(overall))
      .select(col("grp"), col("n"), col("sel_ppm"), col("tpr_ppm"),
        col("fpr_ppm"),
        (col("sel_ppm") - col("o_sel")).as("dp_gap_ppm"),
        (col("tpr_ppm") - col("o_tpr")).as("tpr_gap_ppm"),
        (col("fpr_ppm") - col("o_fpr")).as("fpr_gap_ppm"))
  }
}
