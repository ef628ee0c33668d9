package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between snapshot generations — the data-level twin
  * of the reference's snapshot watcher (orchestrator.py:216-287 discovers
  * `data/{customer}/{timestamp}` directories; a real deployment also needs
  * to know WHAT changed between two of them, and a bulk re-load can shrink
  * to an incremental one when the delta is small).
  *
  * Scale shape: one full-outer equi-join on the entity key — both sides
  * shuffle once, partial aggregation everywhere, no window over the whole
  * table. Compared columns collapse into a single md5 so arbitrarily wide
  * rows diff with one string compare per row; with bucketed snapshots
  * (sources.Bucketing) the join is shuffle-free.
  */
object Cdc {

  /** Diff two snapshots keyed by `key`: one output row per entity that was
    * inserted, deleted, or updated (unchanged entities are filtered out —
    * at 100 TB the delta is the only thing worth materializing). `compare`
    * lists the value columns that define row identity.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   key: String, compare: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, side: String) =
      df.select(col(key),
        md5(concat_ws("", compare.map(c => col(c).cast("string")): _*))
          .as(s"${side}_hash"))
    hashed(oldSnap, "old")
      .join(hashed(newSnap, "new"), Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("old_hash").isNull, lit("insert"))
          .when(col("new_hash").isNull, lit("delete"))
          .when(col("old_hash") =!= col("new_hash"), lit("update")))
      .filter(col("change_type").isNotNull)
      .select(col(key), col("change_type"))
  }

  /** Apply a changeset to a base snapshot: `changes` carries the full new
    * row plus an `op` column (`upsert` | `delete`). Anti-join drops every
    * touched key from the base, upserts union back in — two shuffles on
    * the key, both co-partitioned, and the base never rewrites untouched
    * rows through a window. applyChanges(old, diff-derived changes) ≡ new
    * snapshot — the algebraic identity the CdcSpec and the DuckDB oracle
    * both check.
    */
  def applyChanges(base: DataFrame, changes: DataFrame,
                   key: String): DataFrame = {
    val touched = changes.select(col(key))
    base.join(touched, Seq(key), "left_anti")
      .unionByName(
        changes.filter(col("op") === "upsert").drop("op"))
  }

  /** Incremental aggregate (materialized-view) maintenance: fold a
    * delta stream into a per-group `(n, total)` aggregate WITHOUT
    * recomputing untouched groups — the IVM identity
    * `maintain(agg(S), Δ(S→S')) == agg(S')` that lets a 100 TB rollup
    * absorb a daily changeset at changeset cost. `changes` carries
    * `(grp, op ∈ insert|delete, v)` in integer units (an update is
    * delete(old) + insert(new) — the standard delta-stream encoding);
    * groups whose count reaches zero drop out, groups born in the delta
    * appear. One partial-aggregated shuffle over the DELTA plus a keyed
    * full-outer join against the aggregate table; the base fact rows
    * are never read.
    */
  def maintainAggregate(agg: DataFrame, changes: DataFrame): DataFrame = {
    val delta = changes.groupBy(col("grp"))
      .agg(sum(when(col("op") === "insert", 1L).otherwise(-1L)).as("dn"),
        sum(when(col("op") === "insert", col("v")).otherwise(-col("v")))
          .as("dv"))
    agg.join(delta, Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("dv"), lit(0L)))
          .as("total"))
      .filter(col("n") > 0)
  }

  /** Incremental JOIN view maintenance (insert-only deltas) — the join
    * twin of [[maintainAggregate]]: a materialized A⋈B absorbs new
    * rows at DELTA cost via the bilinear delta rule
    * Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB — the base view is never
    * recomputed and the base fact tables are only probed on the keyed
    * join, so a 100 TB materialized join absorbs a daily changeset at
    * changeset × match-rate cost. Deltas must be disjoint from their
    * bases (the insert-only contract; updates arrive as
    * [[applyChanges]]-style delete+insert pairs upstream). The
    * correctness identity `maintain(A₀⋈B₀, Δ) == (A₀∪ΔA)⋈(B₀∪ΔB)` IS
    * the oracle (the cdc_ivm convention).
    */
  def maintainJoin(view: DataFrame, a0: DataFrame, b0: DataFrame,
                   dA: DataFrame, dB: DataFrame,
                   key: String): DataFrame =
    view
      .unionByName(dA.join(b0, key))
      .unionByName(a0.join(dB, key))
      .unionByName(dA.join(dB, key))

  /** Order-free per-partition content checksums — the planning step of
    * incremental ETL: recompute ONLY partitions whose checksum moved.
    * Each row contributes the first 8 hex digits of md5 over its
    * compare columns (pre-normalized to integer units by the caller —
    * float→string casts diverge between engines at the scientific-
    * notation threshold); the partition digest is (n_rows, Σh₃₂,
    * bit_xor h₃₂): the sum is reduction-order-free and stays inside
    * BIGINT to ~4·10⁹ rows per partition, the xor is overflow-free
    * forever and catches permutation-preserving edits the sum might
    * alias. ONE partial-agg shuffle keyed on the partition.
    */
  def partitionChecksums(df: DataFrame, partCol: String,
                         compare: Seq[String]): DataFrame =
    df.select(col(partCol).as("part"),
        expr("CAST(conv(substring(md5(concat_ws('|', " +
          compare.mkString(", ") + ")), 1, 8), 16, 10) AS BIGINT)")
          .as("h"))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("sum_ck"),
        expr("bit_xor(h)").as("xor_ck"))

  /** Diff two [[partitionChecksums]] frames: per partition
    * added / removed / changed / unchanged — the recompute work-list.
    * One keyed full-outer join over the partition-count-sized frames.
    */
  def changedPartitions(oldCk: DataFrame, newCk: DataFrame): DataFrame =
    oldCk.select(col("part"), col("n_rows").as("old_rows"),
        col("sum_ck").as("old_sum"), col("xor_ck").as("old_xor"))
      .join(newCk.select(col("part"), col("n_rows").as("new_rows"),
        col("sum_ck").as("new_sum"), col("xor_ck").as("new_xor")),
        Seq("part"), "full_outer")
      .withColumn("status",
        when(col("old_rows").isNull, lit("added"))
          .when(col("new_rows").isNull, lit("removed"))
          .when(col("old_rows") =!= col("new_rows") ||
            col("old_sum") =!= col("new_sum") ||
            col("old_xor") =!= col("new_xor"), lit("changed"))
          .otherwise(lit("unchanged")))
      .select(col("part"), col("status"),
        coalesce(col("old_rows"), lit(0L)).as("old_rows"),
        coalesce(col("new_rows"), lit(0L)).as("new_rows"))

  /** Bitemporal as-of lookup — the corrections-aware point read a
    * warehouse needs when facts get RESTATED: each log row carries
    * `valid_from` (when the value became true in the world) and
    * `sys_from` (when the warehouse learned it). "What did we believe
    * at system time S about the state at valid time V" = restrict to
    * sys_from ≤ S, then elect max(valid_from) ≤ V with the LATEST
    * correction (max sys_from) breaking ties — one partial-aggregable
    * `max(struct(valid_from, sys_from, value))` per key after the two
    * range filters, so the whole lookup is one keyed partial-agg
    * shuffle (no window, no self-join). Reproducing yesterday's report
    * is the same call with yesterday's S — restatements never destroy
    * auditability.
    */
  def bitemporalAsOf(log: DataFrame, key: String, validTime: Long,
                     sysTime: Long): DataFrame =
    log.filter(col("sys_from") <= sysTime &&
        col("valid_from") <= validTime)
      .groupBy(col(key))
      .agg(max(struct(col("valid_from"), col("sys_from"), col("value")))
        .as("m"))
      .select(col(key), col("m.valid_from").as("valid_from"),
        col("m.sys_from").as("sys_from"), col("m.value").as("value"))

  /** Slowly-changing-dimension Type-2 history from an attribute change
    * log: `log` carries `(key, attr, seq)` observations ordered by the
    * monotonic `seq` within each key (ties broken by `tieCol`, a unique
    * column — a change-log sequence number or source row id). Consecutive
    * observations with an UNCHANGED attribute collapse into one validity
    * interval; each surviving version gets `valid_from` (its first seq),
    * `valid_to` (the next version's seq, NULL while current),
    * `version` (1-based per key) and `is_current` — the standard
    * warehouse dimension-history build downstream of a CDC feed
    * ([[snapshotDiff]] emits the change events; this materializes their
    * time dimension).
    *
    * Scale shape: two windows and the final projection all share ONE
    * hash partitioning on `key` (Spark reuses the exchange across the
    * lag-filter and lead steps — the twap/runs single-shuffle pattern);
    * state per key is O(1). No corpus-wide window, no self-join. Exact
    * in both engines: the collapse rule compares attribute VALUES
    * (string equality), never floats.
    */
  def scd2(log: DataFrame, key: String, attr: String, seq: String,
           tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(col(seq), col(tieCol))
    // keep only observations where the attribute actually changed
    val changed = log
      .withColumn("_prev", lag(col(attr), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(attr))
      .drop("_prev")
    val w2 = Window.partitionBy(key).orderBy(col(seq), col(tieCol))
    changed
      .withColumn("valid_from", col(seq))
      .withColumn("valid_to", lead(col(seq), 1).over(w2))
      .withColumn("version", row_number().over(w2).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(seq, tieCol)
  }

  /** Last-writer-wins conflict audit over a change log — the hygiene
    * check before trusting LWW merge semantics ([[applyChanges]] and
    * every upsert sink assume "latest timestamp wins" is
    * well-defined): two writers landing DIFFERENT values on the same
    * key at the SAME timestamp make LWW ambiguous, and most engines
    * resolve it silently and differently. Per key: change count,
    * conflicting instants (same ts, >1 distinct value), the resolved
    * LWW value under the EXPLICIT deterministic total order
    * (ts, value) — ties break to max value, stated rather than
    * implementation-defined — and a clean flag.
    *
    * Scale shape: one (key, ts) partial agg then one key-keyed rollup
    * — two keyed shuffles, nothing else; `max(struct)` keeps the LWW
    * election partial-aggregable (never a window over the log).
    */
  def lwwAudit(log: DataFrame, keyCol: String, tsCol: String,
               valCol: String): DataFrame = {
    val perInstant = log
      .groupBy(col(keyCol).as("k"), col(tsCol).as("t"))
      .agg(countDistinct(col(valCol)).as("nv"),
        max(col(valCol)).as("v"))
    perInstant.groupBy(col("k"))
      .agg(sum(lit(1L)).as("n_instants"),
        sum(when(col("nv") > 1, 1L).otherwise(0L))
          .as("n_conflict_instants"),
        max(col("t")).as("latest_ts"),
        max(struct(col("t"), col("v"))).getField("v").as("lww_value"))
      .withColumn("is_clean", col("n_conflict_instants") === 0L)
  }
}
