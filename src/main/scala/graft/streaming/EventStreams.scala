package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twin of [[graft.ops.Events]]: the same hourly
  * rollup as an incremental, watermarked query. In production this reads
  * `spark.readStream` from a file/Kafka source; the aggregation shape is
  * identical to the batch path so results converge.
  */
object EventStreams {

  /** Watermarked hourly rollup over a streaming DataFrame with columns
    * (ts: timestamp, event_type: string, value: double, user_id: long).
    *
    * Late data beyond the watermark is dropped; state for closed windows
    * is evicted, so executor state stays bounded by (open windows ×
    * event types) regardless of stream length — the property that matters
    * at 100 TB/day.
    *
    * `count_distinct` is not incrementally computable without holding all
    * user ids in state, so the streaming rollup uses
    * `approx_count_distinct` (HLL sketch, mergeable, bounded state) — the
    * deliberate batch/stream divergence.
    */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(
        unix_timestamp(col("window.start")).as("hour_ts"),
        col("event_type"), col("n_events"), col("sum_value"),
        col("n_users_approx"))

  /** Gap-session aggregation via flatMapGroupsWithState lives on the
    * batch path ([[graft.ops.Events.sessionize]]); the streaming variant
    * would use `session_window`, which shares the same output schema.
    */
  def sessionRollup(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("user_id"), col("n_events"))
}
