package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the validation
  * gate an ETL runs before anything reaches the load path (the reference
  * trusts its parquet inputs blindly; a production blue/green flow aborts
  * the green build when the snapshot is malformed, which is exactly the
  * ABORT path `sinks.ArrowGraphClient` exposes). Each rule compiles to a
  * bounded aggregate; the report is one row per rule.
  *
  * Scale shape: NOT NULL and range rules are a conditional count inside
  * ONE shared scan-aggregate (no per-rule pass); uniqueness is a partial
  * agg on the key; referential integrity is a LEFT ANTI join against the
  * dimension (broadcast when small, shuffle otherwise — Spark picks).
  * Nothing returns row-level data, so the report is constant-sized no
  * matter the input: safe to run on every snapshot of a 100 TB lake.
  */
object Quality {

  sealed trait Rule { def id: String }
  /** `column` must be non-null. */
  final case class NotNull(column: String) extends Rule {
    def id = s"not_null:$column"
  }
  /** `column` must lie in [lo, hi] (nulls don't violate; see NotNull). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Rule {
    def id = s"in_range:$column"
  }
  /** `columns` must be unique together. Violations = rows beyond the
    * first of each duplicated key. */
  final case class Unique(columns: Seq[String]) extends Rule {
    def id = s"unique:${columns.mkString("+")}"
  }
  /** Every non-null `column` must exist in `dimColumn` of `dim`. */
  final case class RefIntegrity(column: String, dim: DataFrame,
                                dimColumn: String) extends Rule {
    def id = s"ref:$column"
  }

  /** Scalar-rule aggregate columns (NotNull / InRange), aliased by rule
    * id — the shared compile step for [[violations]] and [[observe]]. */
  private def scalarCols(rules: Seq[Rule]): Seq[(String, Column)] =
    rules.collect {
      case r: NotNull =>
        r.id -> sum(when(col(r.column).isNull, 1L).otherwise(0L))
      case r: InRange =>
        r.id -> sum(when(col(r.column).isNotNull &&
          (col(r.column) < r.lo || col(r.column) > r.hi), 1L).otherwise(0L))
    }

  /** Attach the scalar rules (NotNull / InRange) to `df` IN FLIGHT via
    * Spark's observable-metrics API: the counters piggyback on whatever
    * action consumes the frame — zero extra scans, zero extra shuffles —
    * and `observation.get` yields them after the action. The free-monitor
    * pattern: a 100 TB load shouldn't pay a second pass just to learn its
    * null rates; key rules (Unique/RefIntegrity) need their own shuffle
    * and belong in [[violations]].
    */
  def observe(df: DataFrame,
              observation: org.apache.spark.sql.Observation,
              rules: Seq[Rule]): DataFrame = {
    val cols = scalarCols(rules).map { case (id, c) =>
      coalesce(c, lit(0L)).as(id)
    }
    require(cols.nonEmpty, "observe needs at least one NotNull/InRange rule")
    df.observe(observation, cols.head, cols.tail: _*)
  }

  /** Violation report: one row per rule — (rule_id, n_violations),
    * ordered by rule_id. A clean table yields all zeros, not an empty
    * frame, so downstream gates can assert on every rule's presence.
    */
  def violations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "violations needs at least one rule")
    // all scalar-count rules share ONE aggregate over one scan
    val scalarRules = scalarCols(rules)
    val scalarReport: Option[DataFrame] =
      if (scalarRules.isEmpty) None
      else {
        val agged = df.agg(scalarRules.head._2.as("c0"),
          scalarRules.tail.zipWithIndex.map { case ((_, c), i) =>
            c.as(s"c${i + 1}")
          }: _*)
        Some(agged.select(explode(map(
          scalarRules.zipWithIndex.flatMap { case ((id, _), i) =>
            Seq(lit(id), coalesce(col(s"c$i"), lit(0L)))
          }: _*)).as(Seq("rule_id", "n_violations"))))
      }
    val keyReports = rules.collect {
      case r: Unique =>
        df.groupBy(r.columns.map(col): _*)
          .agg(count(lit(1)).as("n"))
          .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_violations"))
          .select(lit(r.id).as("rule_id"), col("n_violations"))
      case r: RefIntegrity =>
        df.select(col(r.column)).filter(col(r.column).isNotNull)
          .join(r.dim.select(col(r.dimColumn).as(r.column)).distinct(),
            Seq(r.column), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(r.id).as("rule_id"), col("n_violations"))
    }
    (scalarReport.toSeq ++ keyReports)
      .reduce(_ unionByName _)
      .orderBy("rule_id")
  }

  /** Category-distribution drift between two snapshots: the chi-square
    * statistic of independence, per category — the portable alternative
    * to PSI/KL (both need `ln`, which drifts across libm builds). Each
    * category's contribution (o-e)²/e is computed against the pooled
    * expectation and floor-scaled to an exact BIGINT (the gram-matrix
    * recipe: per-cell floor(x·10⁶) before summing keeps the statistic
    * order-free AND engine-exact); callers sum `chi2_scaled` and compare
    * against a critical value for |categories|-1 degrees of freedom.
    *
    * Scale shape: one partial-aggregated count per side keyed on the
    * category, a full-outer merge on category, one one-row total crossed
    * back — output cardinality is |categories|, never the input.
    */
  def drift(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    val ca = a.groupBy(col(catCol).as("cat")).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(col(catCol).as("cat")).agg(count(lit(1)).as("n_b"))
    val merged = ca.join(cb, Seq("cat"), "full_outer")
      .select(col("cat"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = merged.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
    merged.crossJoin(broadcast(tot))
      .withColumn("e_a",
        (col("n_a") + col("n_b")).cast("double") * col("ta").cast("double")
          / (col("ta") + col("tb")).cast("double"))
      .withColumn("e_b",
        (col("n_a") + col("n_b")).cast("double") * col("tb").cast("double")
          / (col("ta") + col("tb")).cast("double"))
      .select(col("cat"), col("n_a"), col("n_b"),
        (floor((col("n_a").cast("double") - col("e_a")) *
          (col("n_a").cast("double") - col("e_a")) / col("e_a") * 1e6) +
         floor((col("n_b").cast("double") - col("e_b")) *
          (col("n_b").cast("double") - col("e_b")) / col("e_b") * 1e6))
          .cast("long").as("chi2_scaled"))
  }

  /** Referential-integrity audit between a fact table and a dimension:
    * counts fact rows (and distinct keys) whose foreign key has no
    * match — the orphan check every lake contract needs before a join
    * silently drops rows. NULL keys are reported separately (they are
    * not orphans; they're missing data). One keyed LEFT ANTI join for
    * the orphans plus partial-aggregated counts; the dimension side is
    * reduced to DISTINCT keys first, so the fact side shuffles once on
    * the key and nothing is ever collected.
    */
  def orphans(fact: DataFrame, factKey: String,
              dim: DataFrame, dimKey: String): DataFrame = {
    val keys = dim.select(col(dimKey).as(factKey)).distinct()
    val nonNull = fact.filter(col(factKey).isNotNull)
    val orphan = nonNull.join(keys, Seq(factKey), "left_anti")
      .agg(coalesce(count(lit(1)), lit(0L)).as("orphan_rows"),
        coalesce(countDistinct(col(factKey)), lit(0L)).as("orphan_keys"))
    val totals = fact.agg(count(lit(1)).as("fact_rows"),
      sum(when(col(factKey).isNull, 1L).otherwise(0L)).as("null_keys"))
    totals.crossJoin(orphan)
      .select(col("fact_rows"), col("null_keys"), col("orphan_rows"),
        col("orphan_keys"),
        expr("1000000L * orphan_rows div greatest(1L, fact_rows)")
          .as("orphan_ppm"))
  }

  /** Functional-dependency audit: does `keyCol → depCol` hold? Emits
    * one row per VIOLATING key (more than one distinct dependent
    * value) with its row count, distinct-value count, and the min/max
    * witnesses — the schema-contract check behind denormalization,
    * dimension conformance, and join-key selection (a violated FD
    * means the "lookup" join fans out). NULL dependents count as a
    * value (a key mapping to both NULL and x is a violation).
    *
    * Scale shape: two partial-aggregated shuffles — corpus → (key,
    * value) cells, cells → per-key profile — so the wide table never
    * shuffles twice and output is bounded by the violating-key count.
    * `countDistinct` is deliberately avoided (no partial aggregation);
    * the two-level groupBy IS the scalable exact-distinct plan.
    */
  def fdViolations(df: DataFrame, keyCol: String,
                   depCol: String): DataFrame =
    df.groupBy(col(keyCol).as("k"), col(depCol).as("v"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("k"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_values"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"))
      .filter(col("n_values") > 1)

  /** Benford's-law first-digit ppm values, floor(log10(1+1/d)·10^6) for
    * d = 1…9 — integer constants shared verbatim with the oracle twin
    * (computed once; never a runtime libm call in either engine).
    */
  val benfordPpm: Seq[Long] =
    Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L, 51152L,
      45757L)

  /** Benford first-digit audit — the fraud/synthetic-data smoke test run
    * over every monetary or count column before trusting a new drop:
    * observed first-significant-digit shares vs the Benford expectation,
    * per digit, in exact ppm. The value is integerized to cents FIRST
    * (the decimal-cents recipe), then the first digit falls out of a
    * constant CASE ladder over the magnitude (`v < 10 → v, v < 100 →
    * v div 10, …` — no log10, no float formatting, portable to any
    * engine); zero/NULL cents are excluded (they have no significant
    * digit). One partial-aggregated groupBy on a NINE-key domain, then
    * the share window runs over ≤ 9 rows — bounded at any corpus size.
    * Expected shares are the [[benfordPpm]] integer literals; the
    * deviation column is a plain integer difference.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = abs((col(valueCol).cast("decimal(18,2)") * 100)
      .cast("long"))
    // first-digit CASE ladder: price columns are bounded by 10^16 cents;
    // each rung is an exact integer division
    val ladder = (1 to 16).map { k =>
      val b = math.pow(10, k).toLong
      s"WHEN cents < ${b}L THEN cents div ${b / 10}L"
    }.mkString("CASE ", " ", " END")
    val exp = benfordPpm.zipWithIndex.tail.foldLeft(
      when(col("digit") === 1, lit(benfordPpm.head))) {
      case (acc, (p, i)) => acc.when(col("digit") === (i + 1), lit(p))
    }
    df.select(cents.as("cents")).filter(col("cents") > 0)
      .withColumn("digit", expr(ladder))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      // bounded: the window runs over at most 9 aggregated rows
      .withColumn("total", sum(col("n_obs")).over(Window.partitionBy()))
      .withColumn("obs_ppm", expr("1000000L * n_obs div total"))
      .withColumn("exp_ppm", exp)
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .select(col("digit"), col("n_obs"), col("obs_ppm"), col("exp_ppm"),
        col("dev_ppm"))
      .orderBy("digit")
  }

  /** Candidate-key audit: for each proposed column combination, row
    * count, distinct-combination count, rows with a NULL component,
    * and whether the combo is a usable key (distinct == rows, no
    * nulls) — the check that runs BEFORE a merge/upsert or CDC
    * pipeline trusts "the id column is unique" ([[fdViolations]]'s
    * sibling: FD audits value agreement, this audits identity).
    *
    * Scale shape: one aggregation per combo (the [[Analytics.profile]]
    * pattern — each pass scans only that combo's columns, so total IO
    * equals one multi-column pass of a columnar source and no Expand
    * fan-out for multi-distinct); each is a partial-agg groupBy-free
    * global aggregate.
    */
  def keyAudit(df: DataFrame, combos: Seq[Seq[String]]): DataFrame =
    combos.map { cs =>
      val anyNull = cs.map(col(_).isNull).reduce(_ || _)
      df.select(cs.map(col): _*).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(struct(cs.map(col): _*)).as("n_distinct"),
        sum(when(anyNull, 1L).otherwise(0L)).as("n_null_rows"))
        .select(lit(cs.mkString("+")).as("combo"), col("n_rows"),
          col("n_distinct"), col("n_null_rows"),
          (col("n_distinct") === col("n_rows") &&
            col("n_null_rows") === 0L).as("is_key"))
    }.reduce(_ unionByName _).orderBy("combo")

  /** Row-level quarantine split — [[violations]] says HOW MANY rows
    * break each rule; production pipelines also need the rows
    * THEMSELVES routed: pass rows flow on, quarantined rows land in a
    * side table WITH their reasons, so reprocessing after a fix is a
    * filter, not a re-scan. Each row gets the comma-joined ids of the
    * row-wise rules (NotNull / InRange) it violates, in declaration
    * order — `concat_ws` skips the non-violated NULL slots identically
    * in both engines. Pure narrow projection: zero shuffles on the
    * fact stream; key rules (Unique/RefIntegrity) are aggregate-level
    * and stay in [[violations]].
    */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val rowRules: Seq[(String, Column)] = rules.collect {
      case r: NotNull => r.id -> col(r.column).isNull
      case r: InRange => r.id -> (col(r.column).isNotNull &&
        (col(r.column) < r.lo || col(r.column) > r.hi))
    }
    require(rowRules.nonEmpty,
      "quarantine needs at least one NotNull/InRange rule")
    val reasons = concat_ws(",", rowRules.map { case (id, c) =>
      when(c, lit(id)).otherwise(lit(null))
    }: _*)
    df.withColumn("reasons", reasons)
      .withColumn("quarantined", col("reasons") =!= "")
  }
}
