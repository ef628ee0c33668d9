package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Event-stream analytics (batch form; the streaming twin lives in
  * [[graft.streaming.EventStreams]] and shares this aggregation shape).
  *
  * The events table carries parquet TIMESTAMP(NANOS), which Spark's
  * micros-based TimestampType can't hold — it is read with
  * `spark.sql.legacy.parquet.nanosAsLong=true`, so `ts` may be either a
  * timestamp or an INT64 nanos column. Nanos math stays integral
  * (`div`, never double division — 1e18 nanos exceeds double's 2^53
  * exact-integer range).
  */
object Events {

  /** Epoch seconds of `ts` as a long column, for either encoding. */
  private def epochSeconds(events: DataFrame): Column =
    events.schema("ts").dataType match {
      case LongType => expr("ts div 1000000000")
      case _        => unix_timestamp(col("ts"))
    }

  /** Hourly rollup per event type: count, exact value sum, distinct users.
    * Partial (map-side) aggregation handles the heavy lifting; the shuffle
    * key (hour, event_type) has bounded cardinality.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withColumn("hour_ts",
        ((epochSeconds(events).cast("long") / lit(3600L)).cast("long") * lit(3600L))
          .cast("long"))
      .groupBy(col("hour_ts"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Analytics.exactSum(col("value"), 4).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))

  /** Per-user session stats with a gap-based session id computed via a lag
    * window: a new session starts after `gapSeconds` of inactivity.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("secs", "event_id")
    events
      .withColumn("secs", epochSeconds(events).cast("long"))
      .withColumn("prev_secs", lag(col("secs"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_secs").isNull ||
          col("secs") - col("prev_secs") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("secs")).as("session_start"),
        max(col("secs")).as("session_end"))
  }
}
