package graft.ops

import org.apache.spark.sql.DataFrame
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
}
