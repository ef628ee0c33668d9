package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operations a production training pipeline must run before
  * data leaves the lake: right-to-be-forgotten deletion with an audit
  * trail, and deterministic pseudonymization of user identifiers.
  *
  * The deletion list is request-sized (tiny next to the corpus), so
  * every join here broadcasts it — the fact side never shuffles, which
  * is what makes a purge affordable to run on every export at 100 TB.
  */
object Privacy {

  /** Remove every row belonging to a user on the deletion list — a
    * broadcast LEFT ANTI join, the minimal-cost purge. */
  def purgeUsers(events: DataFrame, deletions: DataFrame): DataFrame =
    events.join(broadcast(deletions.select(col("user_id")).distinct()),
      Seq("user_id"), "left_anti")

  /** Per-event-type audit of a purge — the evidence row a compliance
    * reviewer wants: rows before, rows removed, rows after, distinct
    * users removed, and an order-free checksum (BIGINT sum of event
    * ids) of the surviving rows so a later re-run can prove the purge
    * held. One partial-aggregated shuffle on `event_type`; the deletion
    * flag rides in on a broadcast join.
    */
  def purgeAudit(events: DataFrame, deletions: DataFrame): DataFrame = {
    val flagged = events.join(
      broadcast(deletions.select(col("user_id")).distinct()
        .withColumn("_del", lit(1L))),
      Seq("user_id"), "left")
      .withColumn("_del", coalesce(col("_del"), lit(0L)))
    flagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("rows_before"),
        sum(col("_del")).as("rows_removed"),
        sum(lit(1L) - col("_del")).as("rows_after"),
        countDistinct(when(col("_del") === 1L, col("user_id")))
          .as("users_removed"),
        sum(when(col("_del") === 0L, col("event_id"))
          .otherwise(lit(0L))).as("checksum_after"))
  }

  /** Replace `user_id` with a salted md5-prefix pseudonym — stable
    * across runs and tables (the same user maps to the same pseudonym
    * everywhere, so joins still work), irreversible without the salt,
    * and engine-portable: the first 8 digest bytes are the leading 16
    * hex chars, so DuckDB rebuilds the exact pseudonym with
    * `CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)`. 15 nibbles
    * (60 bits) keeps the value positive and inside BIGINT. Narrow
    * projection — no shuffle.
    */
  def pseudonymize(events: DataFrame, salt: String): DataFrame =
    events.withColumn("pseudo_id",
      expr(s"CAST(conv(substring(md5(concat('$salt', ':', " +
        "CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"))
      .drop("user_id")

  /** k-anonymity / l-diversity audit over quasi-identifier columns — the
    * re-identification check a release gate runs before data leaves the
    * lake: every equivalence class (unique QID combination) must contain
    * at least `k` rows (else its members are linkable from public
    * attributes alone) AND at least `l` distinct values of the sensitive
    * column (else the class leaks the sensitive value even at size ≥ k —
    * the homogeneity attack k-anonymity misses).
    *
    * Output is one row per equivalence class with its size, sensitive
    * diversity, and both violation flags — class-space-sized, never
    * corpus-sized. ONE partial-aggregated shuffle on the QID key
    * (count-distinct expands to a two-phase partial agg, same key);
    * generalize QIDs (band, truncate) upstream and re-run to find the
    * coarsening that clears the gate.
    */
  def kAnonymityAudit(df: DataFrame, qidCols: Seq[String],
                      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(qidCols.nonEmpty && k >= 1 && l >= 1)
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("violates_k", col("class_size") < k)
      .withColumn("violates_l", col("l_diversity") < l)
  }

  /** Warner randomized response (the RAPPOR primitive): privatize a 0/1
    * `bitCol` per row by flipping it with probability 1/4 — the flip
    * coin is two md5 bits of the row id, so the mechanism is
    * deterministic given the id (engine-reproducible, and a re-export
    * reports the SAME noise — the memoization RAPPOR requires so
    * repeated releases do not average the noise away). Plausible
    * deniability: a reported 1 is the true bit only with probability
    * 3/4 (ε = ln 3 local DP per release). Zero shuffles — a narrow
    * projection that drops the true bit.
    */
  def randomizedResponse(rows: DataFrame, idCol: String,
                         bitCol: String): DataFrame = {
    val flip = (conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":rr"))), 1, 8), 16, 10).cast("long") % 4) === 0
    rows.withColumn("reported",
      when(flip, lit(1L) - col(bitCol)).otherwise(col(bitCol)))
      .drop(bitCol)
  }

  /** Debiased per-group estimate from [[randomizedResponse]] output:
    * with flip probability 1/4, E[obs] = y·3/4 + (n−y)/4, so
    * ŷ = (4·obs − n)/2; reported as a ppm rate clamped at 0 (the
    * estimator goes negative when the true rate is ~0 and flips
    * dominate — and a negative numerator would also hit the one
    * integer-division corner where Spark `div` truncates but DuckDB
    * `//` floors). One partial-aggregated shuffle on the group key.
    */
  def rrEstimate(privatized: DataFrame, groupCols: Seq[String]): DataFrame =
    privatized.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("reported")).as("obs_yes"))
      .withColumn("est_yes_ppm",
        expr("greatest(4 * obs_yes - n, 0L) * 1000000L div (2 * n)"))

  /** Central-DP noisy count release via the BINOMIAL MECHANISM (Dwork
    * et al. 2006): each released group count carries additive
    * Binomial(64, ½) − 32 noise (σ = 4) — the discrete, finite-support
    * mechanism that needs no libm sampling and so stays exact in both
    * engines. The 64 coins are md5 bits of the salted group key:
    * deterministic given (salt, key), so a re-export releases the SAME
    * noise (the memoization rule — fresh noise per release would
    * average away under repeated queries). A production deployment
    * derives the salt from a SECRET key (the noise must be
    * unpredictable to the analyst); the fixed salt here is what makes
    * the release testable. Released counts clamp at 0 (the one
    * negative-operand div/floor divergence corner, and counts below 0
    * leak sign information anyway).
    *
    * Scale: one partial-aggregated groupBy to the group domain; the
    * noise is a per-GROUP expression over two 32-bit md5 words —
    * nothing row-sized ever re-moves.
    */
  def dpCounts(df: DataFrame, groupCols: Seq[String],
               salt: String = "dp"): DataFrame = {
    val keyed = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_true"))
    val key = concat(lit(salt + ":"),
      concat_ws("", groupCols.map(c => col(c).cast("string")): _*))
    keyed
      .withColumn("h", md5(key))
      .withColumn("noise",
        (bit_count(conv(substring(col("h"), 1, 8), 16, 10).cast("long")) +
          bit_count(conv(substring(col("h"), 9, 8), 16, 10).cast("long")) -
          lit(32)).cast("long"))
      .withColumn("released", greatest(col("n_true") + col("noise"), lit(0L)))
      .select(groupCols.map(col) :+ col("released"): _*)
  }

  /** DP noisy top-k release — the private "most frequent values"
    * publication: every candidate's count gets the [[dpCounts]]
    * binomial(64, ½)−32 noise (md5-bit derandomized, so the release is
    * reproducible and oracle-exact), values whose NOISY count falls
    * below `threshold` are suppressed (the protection for rare values —
    * a value seen once can never clear a threshold ≫ noise spread), and
    * the top `k` survivors are released by noisy count with a
    * deterministic tie-break. True counts never leave the frame — only
    * `released` is emitted, so the output is post-processing of the
    * noisy counts alone. Sensitivity bounding (one contribution per
    * user) is the caller's dedupe step upstream, as with dpCounts.
    *
    * Scale shape: one partial-aggregated vocabulary groupBy, then
    * `orderBy(...).limit(k)` — a TakeOrdered (per-partition heads +
    * k-row merge, the textrank rule), never a vocabulary-wide rank
    * window; the rank numbers are minted over the k survivors only.
    */
  def dpTopK(items: DataFrame, itemCol: String, k: Int = 20,
             threshold: Long = 10L, salt: String = "dptopk"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && threshold >= 0)
    val noisy = dpCounts(items, Seq(itemCol), salt)
    val top = noisy.filter(col("released") >= threshold)
      .orderBy(desc("released"), col(itemCol)).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(desc("released"), col(itemCol))).cast("long"))
      .select(col("rank"), col(itemCol), col("released"))
  }

  /** k-anonymity ENFORCEMENT by minimal full-domain generalization —
    * the transform next to [[kAnonymityAudit]]'s check: given a FIXED
    * generalization ladder (each `levels(l)` serializes the
    * quasi-identifier tuple at coarseness l; level 0 finest, last level
    * coarsest), release the equivalence classes at the SMALLEST level
    * where no class falls below k. Deterministic by construction (no
    * search heuristics — a fixed single-path ladder is the auditable
    * form; a lattice search trades reproducibility for utility), so the
    * published coarsening is stable across reruns and engines. If even
    * the coarsest level violates (n < k total), its residual classes
    * are flagged `suppressed` rather than silently released.
    *
    * Scale shape: the corpus projects once to the L serialized keys
    * (checkpointed — referenced L+1 times), each level costs one
    * partial-aggregated groupBy whose ROW count is the class space, the
    * level election is an L-row union of one-row aggregates, and the
    * final class rollup crosses the one-row choice back in (broadcast).
    * L is a handful by construction.
    */
  def generalizeKAnon(df: DataFrame, levels: Seq[Column],
                      k: Long): DataFrame = {
    require(levels.nonEmpty && k >= 1)
    val keyed = df.select(levels.zipWithIndex.map {
      case (c, l) => c.as(s"q$l")
    }: _*).localCheckpoint(true)
    val stats = levels.indices.map { l =>
      keyed.groupBy(col(s"q$l")).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(when(col("n") < k, col("n"))), lit(0L))
          .as("viol"))
        .select(lit(l.toLong).as("lvl"), col("viol"))
    }.reduce(_ unionByName _)
    val chosen = stats.agg(
        min(when(col("viol") === 0, col("lvl"))).as("l0"),
        max(col("lvl")).as("lmax"))
      .select(coalesce(col("l0"), col("lmax")).as("lvl"))
    val pick = levels.indices.map(l => s"WHEN $l THEN q$l")
      .mkString("CASE lvl ", " ", " END")
    keyed.crossJoin(broadcast(chosen))
      .select(col("lvl"), expr(pick).as("qid"))
      .groupBy(col("lvl"), col("qid")).agg(count(lit(1)).as("class_size"))
      .withColumn("suppressed", col("class_size") < k)
      .orderBy("qid")
  }

  /** t-closeness audit — the release gate k-anonymity and l-diversity
    * miss: a class can be large AND diverse yet still leak because its
    * SENSITIVE DISTRIBUTION differs from the corpus (everyone in the
    * class is high-balance). For an ORDERED sensitive attribute binned
    * to `bins`, the earth-mover distance has the closed form
    * EMD = Σ_b |cum_class(b) − cum_global(b)| / (bins − 1) — exact in
    * ppm integers (truncating per-class cumulative shares; both
    * engines share the fold). Classes with emd_ppm > t·10⁶ breach.
    *
    * Scale shape: one (class, bin) partial agg; cumulative windows run
    * per class over ≤ bins rows; the bins-row global distribution
    * broadcasts (whitelisted one-frame cross).
    */
  def tClosenessAudit(df: DataFrame, qidCols: Seq[String],
                      binCol: String, bins: Int,
                      tPpm: Long): DataFrame = {
    require(qidCols.nonEmpty && bins >= 2 && tPpm >= 0)
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val qid = concat_ws("|", qidCols.map(c => col(c).cast("string")): _*)
    val rows = df.select(qid.as("qid"), col(binCol).cast("long").as("b"))
    val cells = rows.groupBy(col("qid"), col("b"))
      .agg(count(lit(1)).as("n"))
    // densify: the cumulative step function must cover EMPTY bins too
    // (a class missing a bin still diverges from the corpus there)
    val binsDf = (0L until bins.toLong).toDF("b")
    val dense = cells.select(col("qid")).distinct()
      .crossJoin(broadcast(binsDf))
      .join(cells, Seq("qid", "b"), "left")
      .select(col("qid"), col("b"), coalesce(col("n"), lit(0L)).as("n"))
    val classCum = Window.partitionBy("qid").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byClass = dense
      .withColumn("n_class", sum(col("n")).over(
        Window.partitionBy("qid")))
      .withColumn("cum", sum(col("n")).over(classCum))
      .withColumn("cum_ppm", expr("1000000L * cum div n_class"))
    val gtot = rows.agg(count(lit(1)).as("gt"))
    val glob = binsDf
      .join(rows.groupBy(col("b")).agg(count(lit(1)).as("gn")),
        Seq("b"), "left")
      .select(col("b"), coalesce(col("gn"), lit(0L)).as("gn"))
      .withColumn("gcum", sum(col("gn")).over(Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(gtot))
      .select(col("b"), expr("1000000L * gcum div gt").as("gcum_ppm"))
    byClass.join(broadcast(glob), Seq("b"))
      .groupBy(col("qid"))
      .agg(max(col("n_class")).as("class_size"),
        sum(expr("abs(cum_ppm - gcum_ppm)")).as("cum_gap"))
      .select(col("qid"), col("class_size"),
        expr(s"cum_gap div ${bins - 1}L").as("emd_ppm"))
      .withColumn("breaches_t", col("emd_ppm") > tPpm)
  }
}
