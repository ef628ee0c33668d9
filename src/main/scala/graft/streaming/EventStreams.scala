package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Streaming exact dedup: keep the first document per content
    * fingerprint, via `dropDuplicatesWithinWatermark` keyed on the
    * fingerprint. Plain `dropDuplicates("fp")` would NEVER evict state
    * (Spark only cleans dedup state when the event-time column is part
    * of the key), so every fingerprint ever seen would accumulate until
    * executor OOM; the within-watermark variant expires each fingerprint
    * once the watermark passes its first sighting, bounding state to the
    * late-data horizon — the only formulation that survives an unbounded
    * stream. Duplicates separated by more than the watermark delay can
    * re-emit, the standard horizon trade-off.
    */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** The training-data text pipeline on a document stream: watermarked
    * content dedup, then the (stateless, narrow) quality filter applied
    * UNCHANGED from the batch path — the ops library is engine-mode
    * agnostic, so batch backfill and streaming ingest share one code
    * path. Emits only kept documents.
    */
  def streamingTextPipeline(docs: DataFrame,
                            watermark: String = "1 hour"): DataFrame =
    graft.ops.TextAnalysis.qualityFilter(streamingDedup(docs, watermark))
      .filter(col("keep"))

  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Custom streaming state via `mapGroupsWithState`: running per-user
    * event counts and value totals, updated each micro-batch — the
    * KeyValueGroupedDataset state API the built-in aggregates can't
    * express (e.g. when the update rule isn't a monoid over rows).
    */
  def runningUserTotals(events: DataFrame)(implicit spark: SparkSession): Dataset[UserTotal] = {
    import spark.implicits._
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          var (c, v) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { r => c += 1; v += r._2 }
          state.update((c, v))
          UserTotal(user, c, v)
      }
  }

  final case class TrailingFeature(event_id: Long, user_id: Long,
                                   trailing_events: Long,
                                   trailing_value: Double)

  /** Streaming twin of [[graft.ops.Events.trailingActivity]] via
    * `flatMapGroupsWithState`: per-user rolling count/sum over the
    * trailing `windowUs` microseconds, emitted per event as it arrives.
    * The RANGE-window formulation of the batch path has no incremental
    * equivalent, so this is the custom-state API earning its keep:
    *
    *  - state per user = only the events inside the trailing window
    *    (pruned on every update), so executor state is bounded by
    *    window span × arrival rate, never stream length;
    *  - idle users are evicted by an event-time timeout once the
    *    watermark passes their horizon — without it, one-visit users
    *    would accumulate state forever.
    *
    * Input: (event_id, user_id, ts: long microseconds, value, ts_time:
    * timestamp) — `ts_time` carries the watermark. Within a micro-batch
    * rows process in (ts, event_id) order; results match the batch
    * operator for in-order arrivals.
    */
  def streamingTrailing(events: DataFrame, windowUs: Long,
                        watermark: String = "1 hour",
                        idleTimeoutMs: Long = 3600000L)
                       (implicit spark: SparkSession): Dataset[TrailingFeature] = {
    import spark.implicits._
    events
      .withWatermark("ts_time", watermark)
      // ts_time rides along: the unsupported-operation checker requires
      // the watermarked column to reach the stateful operator's input
      .selectExpr("event_id", "user_id", "ts", "value", "ts_time")
      .as[(Long, Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, Double, java.sql.Timestamp)],
         state: GroupState[List[(Long, Double)]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var buf = state.getOption.getOrElse(Nil)
            val batch = rows.toSeq
            val out = batch.sortBy(r => (r._3, r._1)).map {
              case (eid, _, t, v, _) =>
                buf = (t, v) :: buf.filter(_._1 >= t - windowUs)
                val inWin = buf.filter(e => e._1 <= t)
                TrailingFeature(eid, user, inWin.size.toLong,
                  inWin.map(_._2).sum)
            }
            state.update(buf)
            // anchor the idle timeout to the group's OWN latest event
            // time: watermark-relative timeouts expire spuriously on the
            // first real watermark advance (the initial watermark is 0)
            state.setTimeoutTimestamp(
              batch.map(_._5.getTime).max + idleTimeoutMs)
            out.iterator
          }
      }
  }

  final case class AnomalyFlag(event_id: Long, user_id: Long,
                               event_type: String, v100: Long,
                               group_n: Long, is_anomaly: Boolean)

  /** Online twin of [[graft.ops.Events.anomalies]]: every event is flagged
    * against its (user, event_type) group's running statistics — the
    * same division-and-sqrt-free BIGINT z-score test, applied to the
    * prefix seen so far instead of the closed batch group. Classic
    * streaming fraud/alerting shape.
    *
    * State per key is exactly three longs (n, Σv, Σv²) — O(1) per key no
    * matter how long the stream runs, so no timeout-based eviction is
    * needed for state SIZE; add one if key cardinality itself is
    * unbounded. Within a micro-batch rows process in event_id order.
    */
  def streamingAnomalies(events: DataFrame, nSigma: Int = 2, minN: Long = 3L)
                        (implicit spark: SparkSession): Dataset[AnomalyFlag] = {
    import spark.implicits._
    events.selectExpr("event_id", "user_id", "event_type", "value")
      .as[(Long, Long, String, Double)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: (Long, String), rows: Iterator[(Long, Long, String, Double)],
         state: GroupState[(Long, Long, Long)]) =>
          var (n, s, ss) = state.getOption.getOrElse((0L, 0L, 0L))
          val out = rows.toSeq.sortBy(_._1).map { case (eid, uid, et, v) =>
            val v100 = math.floor(v * 100 + 0.5).toLong
            n += 1; s += v100; ss += v100 * v100
            val dev = n * v100 - s
            val varTerm = n * ss - s * s
            AnomalyFlag(eid, uid, et, v100, n,
              n >= minN && dev * dev > nSigma.toLong * nSigma * varTerm)
          }
          state.update((n, s, ss))
          out.iterator
      }
  }

  /** Gap-session aggregation via flatMapGroupsWithState lives on the
    * streaming path above ([[streamingTrailing]]); this variant uses the
    * built-in `session_window`, which shares the batch output schema.
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

  /** Stream-stream interval join — attribute each click to the same
    * user's purchase within the trailing `windowSeconds` (the streaming
    * twin of [[graft.ops.Events.rangeJoin]]'s attribution query). Both
    * sides carry watermarks and the join condition bounds click time
    * between purchase time and purchase time + window, so Spark can
    * evict buffered rows once the watermark passes the interval end —
    * state stays proportional to the open window, not the stream, which
    * is the only shape that survives an unbounded 100 TB/day feed.
    *
    * Inputs: purchases (user_id, p_id, p_ts), clicks (user_id, c_id,
    * c_ts), both streaming.
    */
  def purchaseAttribution(purchases: DataFrame, clicks: DataFrame,
                          windowSeconds: Long = 3600L,
                          watermark: String = "1 hour"): DataFrame = {
    val p = purchases.withWatermark("p_ts", watermark).as("p")
    val c = clicks.withWatermark("c_ts", watermark).as("c")
    p.join(c,
      col("p.user_id") === col("c.user_id") &&
        col("c_ts") >= col("p_ts") &&
        col("c_ts") <= col("p_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("p.user_id").as("user_id"), col("p_id"), col("c_id"),
        col("p_ts"), col("c_ts"))
  }

  /** Stream-static enrichment: join an unbounded event stream against a
    * bounded dimension table. The static side is broadcast, so the stream
    * NEVER shuffles and no join state accumulates — unlike a
    * stream-stream join there is nothing to watermark, which is why
    * dimension lookups must be expressed this way and not as two streams.
    * The static frame re-resolves per micro-batch, picking up dimension
    * reloads between batches (the blue/green pattern applied to a
    * lookup table).
    */
  def enrichEvents(events: DataFrame, dims: DataFrame,
                   key: String = "user_id"): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dims), Seq(key),
      "left")

  final case class HllRegister(group: String, bucket: Long, rho_max: Long)

  /** Streaming distinct counting via HyperLogLog register maintenance —
    * the streaming twin of [[graft.ops.Sketches.hllRegisters]], sharing
    * its md5-prefix hash split so batch and stream produce IDENTICAL
    * registers. State per (group, bucket) is ONE long (the max rho), so
    * total executor state is bounded by groups × 2^b no matter how long
    * the stream runs or how many distinct values arrive — where
    * `dropDuplicates`-based streaming distinct state grows with
    * cardinality until the watermark saves it. The max update is
    * idempotent and commutative, so replays and out-of-order arrival
    * cannot corrupt the sketch. Each micro-batch emits the updated
    * registers; feed any snapshot to `Sketches.hllEstimate` for the
    * count estimate.
    *
    * Input columns: `group` (string), `value` (string-castable).
    */
  final case class CmsCell(depth: Int, cell: Long, cnt: Long)

  /** Streaming frequency sketching via count-min cell maintenance — the
    * streaming twin of [[graft.ops.Sketches.cmsSketch]] with the same
    * md5-salted hashing, so batch and stream produce IDENTICAL cells.
    * State is one long per (depth, cell): bounded by depth × width
    * forever, regardless of stream length or item cardinality. Cell
    * addition is commutative/associative, so arrival order cannot
    * change the sketch; estimates come from
    * `Sketches.cmsEstimate(broadcast-able snapshot, candidates)`.
    *
    * Input column: `item` (string).
    */
  def streamingFrequencyCells(rows: DataFrame, depth: Int = 4,
                              width: Int = 1024)(
      implicit spark: SparkSession): Dataset[CmsCell] = {
    import spark.implicits._
    rows
      .select(explode(expr(s"sequence(0, ${depth - 1})")).as("depth"),
        col("item"))
      .withColumn("cell",
        conv(substring(md5(concat(col("depth").cast("string"), lit(":"),
          col("item"))), 1, 8), 16, 10).cast("long") % width)
      .select(col("depth"), col("cell")).as[(Int, Long)]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rs: Iterator[(Int, Long)],
         state: GroupState[Long]) =>
          val c = state.getOption.getOrElse(0L) + rs.size
          state.update(c)
          CmsCell(key._1, key._2, c)
      }
  }

  final case class SpanState(user_id: Long, event_type: String,
                             first_ts: Long, last_ts: Long)

  /** Streaming twin of the (user, type) activity spans behind
    * [[graft.ops.Events.seqRules]]: one (first_ts, last_ts) pair per
    * live (user, type) key carried in mapGroupsWithState — state is
    * the bounded |users|×|types| frame, two longs each. min/max folds
    * are order-INsensitive, so out-of-order and cross-batch arrival
    * can never disturb the state (no watermark needed for
    * correctness). Sequential A-before-B rules are a pure bounded
    * aggregation over spans, so span equality with the batch groupBy
    * IS rule equality — the spec asserts it.
    *
    * `evictAfterMs` (ADVICE r10): on a live stream the (user, type)
    * key space can grow without bound — pass Some(ms) to evict a key
    * once the watermark passes last_ts + ms (the stream must carry a
    * `withWatermark` on `eventTimeCol` upstream; the column is kept
    * through the projection because pruning it would prune the
    * watermark attribute the event-time timeout is checked against).
    * The evicted key's final span is emitted once more on timeout,
    * then its two longs are freed. The timeout timestamp is clamped
    * STRICTLY above the current watermark (the r8 rule — Spark
    * throws on a stale target).
    */
  def streamingSeqSpans(events: DataFrame,
                        evictAfterMs: Option[Long] = None,
                        eventTimeCol: String = "ts_time")(
      implicit spark: SparkSession): Dataset[SpanState] = {
    import spark.implicits._
    val timeoutConf =
      if (evictAfterMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    // project the watermarked attribute UNCAST: an Alias over an
    // AttributeReference keeps the event-time watermark metadata the
    // timeout check looks for; wrapping it in a Cast strips it
    val eventTime =
      if (evictAfterMs.isDefined) col(eventTimeCol)
      else lit(null).cast("timestamp")
    events
      .select(col("user_id"), col("event_type"), col("ts"),
        eventTime.as("et"))
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._2))
      .mapGroupsWithState(timeoutConf) {
        (key: (Long, String),
         rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            val (f, l) = state.get
            state.remove()
            SpanState(key._1, key._2, f, l)
          } else {
            var (f, l) = state.getOption
              .getOrElse((Long.MaxValue, Long.MinValue))
            rows.foreach { r =>
              if (r._3 < f) f = r._3
              if (r._3 > l) l = r._3
            }
            state.update((f, l))
            evictAfterMs.foreach { ms =>
              // ts is nanos; timeouts are event-time ms
              state.setTimeoutTimestamp(math.max(l / 1000000L + ms,
                state.getCurrentWatermarkMs() + 1L))
            }
            SpanState(key._1, key._2, f, l)
          }
      }
  }

  final case class AsOfEnriched(user_id: Long, probe_id: Long, ts: Long,
                                asof_time: java.lang.Long,
                                asof_v: java.lang.Long)

  /** Streaming twin of [[graft.ops.Events.joinAsOf]] — point-in-time
    * enrichment AT INGEST, the feature-store read path moved into the
    * stream. The union-tag contract mirrors the batch operator's
    * internal union: ONE stream carries both state updates
    * (tag 0: (user_id, ts, v)) and probes (tag 1: (user_id, ts,
    * probe_id)); each probe is emitted once, enriched with the latest
    * state row at or before its ts (inclusive <=, like the batch op
    * and DuckDB ASOF). State per key is ONE (time, value) pair — the
    * last state row seen — so executor state is bounded by |keys|
    * forever, never by stream length. Within a micro-batch rows fold
    * in (ts, tag) order (a state row beats a probe at the same ts —
    * exactly the batch window's `orderBy(ts, _tag)` with state tag 0);
    * ACROSS batches exactness holds when batches arrive in event-time
    * order — the streamingEwma contract — and the spec asserts
    * stream == batch on a staged two-batch stream. Probes with no
    * prior state surface NULL asof columns, same as the batch op.
    */
  def streamingAsOfEnrich(rows: DataFrame)(
      implicit spark: SparkSession): Dataset[AsOfEnriched] = {
    import spark.implicits._
    rows.select(col("user_id"), col("ts"), col("tag"), col("v"),
        col("probe_id"))
      .as[(Long, Long, Int, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (user: Long, rs: Iterator[(Long, Long, Int, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var cur = state.getOption
          val out = Vector.newBuilder[AsOfEnriched]
          rs.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            if (r._3 == 0) cur = Some((r._2, r._4))
            else out += AsOfEnriched(user, r._5, r._2,
              cur.map(c => java.lang.Long.valueOf(c._1)).orNull,
              cur.map(c => java.lang.Long.valueOf(c._2)).orNull)
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  final case class GroupQuantiles(group: String, q_ppm: Long, est: Long,
                                  n_sample: Long)

  /** Streaming twin of [[graft.ops.Sketches.quantileSketch]], per
    * group: the md5 bottom-k sample is MERGEABLE (bottom-k of a union
    * derives from bottom-k's of the parts), so the carried state is
    * exactly the k smallest (hash, id, value) triples per group — k
    * rows forever, never stream-length state — and each trigger's
    * emission equals the batch sketch over everything seen
    * (spec-asserted). The same derandomized membership (md5("qs:" ||
    * id), the batch op's hash verbatim) makes batch and stream land on
    * identical samples, so this is the batch/stream feature-parity
    * story for approximate quantiles at ingest: p50/p90 dashboards
    * that agree with the nightly batch job to the bit.
    *
    * Input columns: `group` (string), `v` (long-castable value), `id`
    * (string row id — unique, or ties are full duplicates as in the
    * batch op).
    */
  def streamingQuantileSketch(rows: DataFrame, k: Int = 256,
                              qsPpm: Seq[Long] = Seq(250000L, 500000L,
                                750000L))(
      implicit spark: SparkSession): Dataset[GroupQuantiles] = {
    import spark.implicits._
    require(k >= 2 && qsPpm.nonEmpty)
    rows.select(col("group"), col("v").cast("long").as("v"),
        col("id").cast("string").as("id"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (g: String, rs: Iterator[(String, Long, String)],
         state: GroupState[Seq[(String, String, Long)]]) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          def hex(s: String): String =
            md.digest(s.getBytes("UTF-8"))
              .map(b => f"$b%02x").mkString
          val merged = (state.getOption.getOrElse(Seq.empty) ++
            rs.map(r => (hex("qs:" + r._3), r._3, r._2)))
            .sortBy(t => (t._1, t._2)).take(k)
          state.update(merged)
          val sample = merged.map(t => (t._3, t._2)).sorted
          val n = sample.length.toLong
          qsPpm.iterator.map { q =>
            val r = math.max(1L, (q * n + 999999L) / 1000000L)
            GroupQuantiles(g, q, sample((r - 1).toInt)._1, n)
          }
      }
  }

  final case class EwmaState(user_id: Long, n_events: Long,
                             ewma_scaled: Long)

  /** Streaming twin of [[graft.ops.Events.ewma]]: the same fixed-point
    * recurrence `s += (x − s) div 2^k` carried in mapGroupsWithState —
    * state per user is (count, level), two longs forever. Within a
    * micro-batch the group's rows fold in `(ts, event_id)` order (an
    * EWMA is order-sensitive, and the iterator order is not
    * guaranteed); ACROSS batches exactness holds when batches arrive in
    * event-time order — the same in-order contract the batch operator's
    * sorted fold encodes, checked batch-vs-stream in the spec. Input
    * columns: `(user_id, ts, event_id, value)`.
    */
  def streamingEwma(events: DataFrame, k: Int = 3)(
      implicit spark: SparkSession): Dataset[EwmaState] = {
    import spark.implicits._
    val d = 1L << k
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(floor(value * 100) AS BIGINT) * 1000000L").as("x"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var (n, s) = state.getOption.getOrElse((0L, 0L))
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            s = if (n == 0L) r._4 else s + ((r._4 - s) / d)
            n += 1
          }
          state.update((n, s))
          EwmaState(user, n, s)
      }
  }

  final case class DailyTop(day: Long, rank: Long, event_type: String,
                            n: Long)

  /** Streaming twin of [[graft.ops.Events.dailyTopK]]: the per-day
    * trending leaderboard maintained at ingest. State per day is the
    * per-type count map — bounded by the event-type VOCABULARY, not the
    * stream (the same bounded-key argument as the batch op's
    * (day, type) cells) — and each trigger re-emits the day's current
    * top-k with the batch tie-break (count desc, type asc), so in
    * Update mode the latest emission per day always equals the batch
    * operator over everything seen (spec-asserted across batches).
    * Days never close here (a late event may always arrive); compose
    * with an upstream watermark filter when day eviction is the
    * contract.
    */
  def streamingDailyTopK(events: DataFrame, k: Int = 3)(
      implicit spark: SparkSession): Dataset[DailyTop] = {
    import spark.implicits._
    events.select(col("day"), col("event_type")).as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout) {
        (day: Long, rows: Iterator[(Long, String)],
         state: GroupState[Map[String, Long]]) =>
          val m = rows.foldLeft(
            state.getOption.getOrElse(Map.empty[String, Long])) {
            case (acc, (_, t)) => acc.updated(t, acc.getOrElse(t, 0L) + 1L)
          }
          state.update(m)
          m.toSeq.sortBy { case (t, n) => (-n, t) }.take(k).zipWithIndex
            .map { case ((t, n), i) => DailyTop(day, i + 1L, t, n) }
            .iterator
      }
  }

  final case class NearDupPair(a_id: Long, b_id: Long, est_jaccard: Double)

  /** Streaming near-dup detection at ingest — the streaming twin of
    * [[graft.ops.Dedup.incrementalMinHash]]: arriving docs run the exact
    * batch signature pipeline (`Dedup.bandedSignatures`, a stateless
    * projection), then each (band, bucket) group holds its member
    * signatures in state and every new doc emits a pair against each
    * stored member whose full-signature agreement passes `tau` — the
    * same arithmetic as the batch `graft_eqfrac` filter, so the DISTINCT
    * emitted pair set equals batch [[graft.ops.Dedup.minHashLsh]] over
    * everything seen (asserted in the spec; a pair sharing two bands
    * emits once per band — the consumer's `dropDuplicates`, exactly like
    * the batch op's, folds them).
    *
    * State discipline: ≤ `hotBucket` signatures per bucket — the
    * [[graft.ops.Dedup.minHashLshStar]] hot-bucket cap. Docs beyond the
    * cap still compare against the stored members (every hot-bucket doc
    * pairs with the earliest arrivals — the star shape: connectivity is
    * preserved through stored members). Cap edge case: the star anchor
    * set is the FIRST `hotBucket` arrivals, not matched ones — if a hot
    * bucket fills with mutually-dissimilar docs (all est < tau), two
    * identical over-cap arrivals pair only if a stored member bridges
    * them, which none does. The cap assumes hot buckets are hot because
    * of a duplicate cluster (the empirical web-data case minHashLshStar
    * is built on); a bucket that is hot from LSH collisions alone can
    * drop over-cap pairs.
    *
    * STATE IS THE LSH INDEX: an ingest dedup must remember the corpus,
    * so by default (`retentionMs = None`) per-bucket state never expires
    * and the state store grows with the number of distinct buckets ever
    * touched — exactly the banded-postings index the batch operator
    * would persist, capped at `hotBucket` signatures per bucket. When a
    * retention window is the contract instead ("dedup against the last
    * 30 days of crawl"), pass `retentionMs`: the input must then carry a
    * `ts_time` timestamp column, the stream watermarks on it
    * (`watermark` delay), and a bucket whose latest arrival is older
    * than the retention window is evicted by event-time timeout — new
    * arrivals in an evicted bucket start a fresh index, so pairs against
    * pre-expiry docs are no longer emitted and total state is bounded by
    * the buckets touched inside one retention window.
    */
  def streamingNearDup(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
                       tau: Double = 0.5, hotBucket: Int = 64,
                       retentionMs: Option[Long] = None,
                       watermark: String = "1 hour")(
      implicit spark: SparkSession): Dataset[NearDupPair] = {
    import spark.implicits._
    val src = retentionMs match {
      case Some(_) => docs.withWatermark("ts_time", watermark)
      case None => docs
    }
    val banded = graft.ops.Dedup.bandedSignatures(src, numHashes, bands,
      carry = if (retentionMs.isDefined) Seq("ts_time") else Nil)
    val keyed = (retentionMs match {
      case Some(_) => banded.select(col("band").cast("int"),
        col("bucket").cast("long"), col("doc_id").cast("long"), col("sig"),
        col("ts_time"))
      case None => banded.select(col("band").cast("int"),
        col("bucket").cast("long"), col("doc_id").cast("long"), col("sig"),
        lit("1970-01-01 00:00:00").cast("timestamp").as("ts_time"))
    }).as[(Int, Long, Long, Seq[Long], java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._2))
    val timeoutConf = retentionMs match {
      case Some(_) => GroupStateTimeout.EventTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    keyed.flatMapGroupsWithState(
      org.apache.spark.sql.streaming.OutputMode.Append(), timeoutConf) {
        (_: (Int, Long),
         rows: Iterator[(Int, Long, Long, Seq[Long], java.sql.Timestamp)],
         state: GroupState[List[(Long, Seq[Long])]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var seen = state.getOption.getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupPair]
            var maxTsMs = Long.MinValue
            rows.toSeq.sortBy(_._3).foreach { case (_, _, did, sig, ts) =>
              if (ts.getTime > maxTsMs) maxTsMs = ts.getTime
              if (!seen.exists(_._1 == did)) {
                seen.foreach { case (od, osig) =>
                  val n = math.min(sig.length, osig.length)
                  if (n > 0) {
                    var eq = 0
                    var i = 0
                    while (i < n) {
                      if (sig(i) == osig(i)) eq += 1
                      i += 1
                    }
                    val est = eq.toDouble / n.toDouble
                    if (est >= tau)
                      out += NearDupPair(math.min(did, od), math.max(did, od), est)
                  }
                }
                if (seen.size < hotBucket) seen = (did, sig) :: seen
              }
            }
            state.update(seen)
            retentionMs.foreach { r =>
              // same watermark clamp as streamingAttribution: Spark
              // rejects a timeout not strictly later than the watermark
              val proposed = maxTsMs + r
              val floor = state.getCurrentWatermarkMs() + 1L
              state.setTimeoutTimestamp(math.max(proposed, floor))
            }
            out.iterator
          }
      }
  }

  /** The streaming twin of the batch `pipeline_e2e` composition: ONE
    * document ingest stream fanned into the two stateful legs a
    * training-data pipeline runs at the front door —
    *
    *  1. `kept`: watermarked exact dedup → quality gate → deterministic
    *     md5 split ([[streamingTextPipeline]] + the batch
    *     `Sampling.splitAssign` applied UNCHANGED — split is stateless,
    *     so batch backfill and streaming ingest share the code path);
    *  2. `pairs`: near-dup pair mining ([[streamingNearDup]]) over the
    *     quality-passing slice of the SAME stream (the gate re-runs
    *     with `carry = text` — a narrow stateless projection — because
    *     joining leg 1's output back to the source would be a
    *     stream-stream join).
    *
    * The legs FAN OUT rather than chain serially: Spark's streaming
    * checker constrains `flatMapGroupsWithState` composed downstream of
    * another stateful operator, and near-dup mining is
    * dedup-insensitive anyway (an exact duplicate surfaces as a
    * sim≈1.0 pair — which the batch twin `minHashLsh` also emits), so
    * the fan-out output pair equals the serial batch pipeline while
    * each leg keeps exactly one bounded-state stateful operator.
    * EventStreamsSpec asserts stream == batch on a staged corpus for
    * both legs.
    */
  def streamingIngestPipeline(docs: DataFrame, watermark: String = "1 hour",
                              numHashes: Int = 32, bands: Int = 8,
                              tau: Double = 0.5)(
      implicit spark: SparkSession): (DataFrame, Dataset[NearDupPair]) = {
    val kept = graft.ops.Sampling.splitAssign(
      streamingTextPipeline(docs, watermark), "doc_id")
    val qualityDocs = graft.ops.TextAnalysis
      .qualityFilter(docs, carry = Seq("text"))
      .filter(col("keep")).select(col("doc_id"), col("text"))
    (kept, streamingNearDup(qualityDocs, numHashes, bands, tau))
  }

  /** Streaming twin of [[graft.ops.Events.ohlcBars]]: per-user daily
    * OHLC bars as a WATERMARK-EVICTABLE windowed aggregation — the day
    * bucket is a `window(ts_time, "1 day")` (not a derived groupBy
    * column, which Spark would keep in state forever; only event-time
    * windows age out), and every OHLC field is a declarative aggregate
    * (min/max over (ts, event_id, value) structs for open/close — no
    * custom state needed), so the bar is incrementally maintained and
    * finalized by the watermark. Emits the batch operator's exact
    * schema; the latest Update-mode emission per (user, day) equals
    * [[graft.ops.Events.ohlcBars]] over everything seen.
    * Input: (user_id, ts: long microseconds, event_id, value,
    * ts_time: timestamp carrying the watermark).
    */
  def streamingOhlc(events: DataFrame,
                    watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts_time", watermark)
      .select(col("user_id"), col("ts"), col("event_id"), col("ts_time"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v100"))
      .groupBy(col("user_id"), window(col("ts_time"), "1 day"))
      .agg(count(lit(1)).as("n_events"),
        min(struct(col("ts"), col("event_id"), col("v100")))
          .getField("v100").as("open_c"),
        max(col("v100")).as("high_c"),
        min(col("v100")).as("low_c"),
        max(struct(col("ts"), col("event_id"), col("v100")))
          .getField("v100").as("close_c"),
        sum(col("v100")).as("sum_c"))
      .select(col("user_id"),
        expr("unix_micros(window.start) div 86400000000").as("day"),
        col("n_events"), col("open_c"), col("high_c"), col("low_c"),
        col("close_c"), col("sum_c"))

  /** Stream-STREAM interval join — the Structured Streaming capability
    * the rest of this module's single-input stateful ops don't
    * exercise: impressions and clicks arrive as two live streams and
    * pair on user within `[imp_time, imp_time + horizon]`. Spark
    * retains each side's rows in state only until the other side's
    * watermark passes the join-condition horizon (both watermarks are
    * REQUIRED for state cleanup on an inner time-bound join), so state
    * is bounded by horizon × arrival rate per side, never stream
    * length. Emits one row per (impression, in-window click) with the
    * exact microsecond lag — the matched pairs a downstream
    * attribution/labeling stage consumes. Inputs:
    * impressions (imp_id, user_id, imp_us, imp_time),
    * clicks (click_id, user_id, click_us, click_time).
    */
  def streamingClickMatch(impressions: DataFrame, clicks: DataFrame,
                          horizon: String = "30 minutes",
                          watermark: String = "10 minutes"): DataFrame = {
    val imp = impressions.withWatermark("imp_time", watermark)
    val clk = clicks.withColumnRenamed("user_id", "click_user")
      .withWatermark("click_time", watermark)
    imp.join(clk,
      expr(s"""click_user = user_id AND
               click_time >= imp_time AND
               click_time <= imp_time + INTERVAL $horizon"""))
      .select(col("user_id"), col("imp_id"), col("click_id"),
        (col("click_us") - col("imp_us")).as("lag_us"))
  }

  /** LEFT OUTER stream-stream interval join — [[streamingClickMatch]]'s
    * missing half: the UNCLICKED impressions. Spark can only emit the
    * null-padded side once the watermark proves no match can still
    * arrive (imp_time + horizon has passed on the click stream), so
    * unmatched rows appear with watermark delay — the correct streaming
    * semantics for "impressions that never converted", and the state
    * bound is identical to the inner form (both sides pruned by the
    * interval + watermark).
    *
    * Output adds `clicked`; click columns are NULL on the outer rows
    * (lag_us NULL — a subtraction against NULL, never a sentinel).
    */
  def streamingClickMatchOuter(impressions: DataFrame, clicks: DataFrame,
                               horizon: String = "30 minutes",
                               watermark: String = "10 minutes"): DataFrame = {
    val imp = impressions.withWatermark("imp_time", watermark)
    val clk = clicks.withColumnRenamed("user_id", "click_user")
      .withWatermark("click_time", watermark)
    imp.join(clk,
        expr(s"""click_user = user_id AND
                 click_time >= imp_time AND
                 click_time <= imp_time + INTERVAL $horizon"""),
        "left_outer")
      .select(col("user_id"), col("imp_id"), col("click_id"),
        (col("click_us") - col("imp_us")).as("lag_us"),
        col("click_id").isNotNull.as("clicked"))
  }

  final case class AttributionCredit(conv_id: Long, touch_type: String,
                                     n_pairs: Long, n_touches: Long,
                                     first_touch_wins: Long,
                                     last_touch_wins: Long,
                                     linear_credit_ppm: Long)

  /** Streaming twin of [[graft.ops.Events.attribution]]: per-user state
    * is ONLY the touches inside the trailing lookback window (pruned on
    * every update — bounded by lookback span × per-user touch rate,
    * never stream length; idle users evicted by event-time timeout, the
    * [[streamingTrailing]] state discipline). A conversion is credited
    * the moment it arrives: its in-window touches are all in state, so
    * n_touches, the `(ts, event_id)` first/last election, and the
    * integer `1e6 div n` linear credit are computed exactly once and
    * emitted as one APPEND row per (conversion, touch type) — the batch
    * operator's per-pair rollup input. The global per-type rollup stays
    * a stateless downstream aggregation (spec sums the sink), so this
    * stage's output is replayable and the unbounded-counter state lives
    * in the consumer's agg, not here.
    *
    * Within a micro-batch rows process in (ts, conv-after-touch,
    * event_id) order so a touch at the conversion's own timestamp
    * counts (`touch_ts <= conv_ts`, the batch predicate); results match
    * the batch operator for in-order arrivals.
    * Input: (event_id, user_id, ts: long microseconds, event_type,
    * ts_time: timestamp carrying the watermark).
    */
  def streamingAttribution(events: DataFrame,
                           convType: String = "purchase",
                           touchTypes: Seq[String] = Seq("click", "view"),
                           lookbackUs: Long = 7L * 86400000000L,
                           watermark: String = "1 hour",
                           idleTimeoutMs: Long = 3600000L)(
      implicit spark: SparkSession): Dataset[AttributionCredit] = {
    import spark.implicits._
    val relevant = convType +: touchTypes
    events
      .withWatermark("ts_time", watermark)
      .filter(col("event_type").isin(relevant: _*))
      .selectExpr("event_id", "user_id", "ts", "event_type", "ts_time")
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long,
         rows: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
         state: GroupState[List[(Long, Long, String)]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var touches = state.getOption.getOrElse(Nil)
            val batch = rows.toSeq
            val out = scala.collection.mutable.ArrayBuffer
              .empty[AttributionCredit]
            batch
              .sortBy(r => (r._3, r._4 == convType, r._1))
              .foreach { case (eid, _, t, tpe, _) =>
                if (tpe == convType) {
                  // upper bound matters for OUT-OF-ORDER arrivals the
                  // watermark admits: a touch with ts > conv ts may already
                  // sit in state (delivered in an earlier micro-batch), and
                  // the batch operator's `touch_ts <= conv_ts` predicate
                  // must exclude it — without `<= t` a late conversion
                  // would credit a FUTURE touch
                  val inWin = touches.filter(x =>
                    x._1 > t - lookbackUs && x._1 <= t)
                  if (inWin.nonEmpty) {
                    val n = inWin.size.toLong
                    val first = inWin.minBy(x => (x._1, x._2))
                    val last = inWin.maxBy(x => (x._1, x._2))
                    inWin.groupBy(_._3).foreach { case (tt, ms) =>
                      out += AttributionCredit(eid, tt, ms.size.toLong, n,
                        if (first._3 == tt && ms.contains(first)) 1L else 0L,
                        if (last._3 == tt && ms.contains(last)) 1L else 0L,
                        ms.size.toLong * (1000000L / n))
                    }
                  }
                } else {
                  touches = (t, eid, tpe) ::
                    touches.filter(_._1 > t - lookbackUs)
                }
              }
            state.update(touches)
            // Spark throws IllegalArgumentException when the event-time
            // timeout is not strictly later than the current watermark; a
            // batch of rows admitted just inside the watermark with a small
            // idleTimeoutMs would land exactly there — clamp to a
            // watermark-derived floor so the query degrades (idle eviction
            // waits one more interval) instead of dying
            val proposed = batch.map(_._5.getTime).max + idleTimeoutMs
            val floor = state.getCurrentWatermarkMs() + idleTimeoutMs + 1L
            state.setTimeoutTimestamp(math.max(proposed, floor))
            out.iterator
          }
      }
  }

  final case class ChangePointState(event_type: String, change_day: Long,
                                    peak_abs_dev: Long, peak_dev: Long,
                                    n_days: Long, n_events: Long)

  /** Streaming twin of [[graft.ops.Events.changePoint]]: per event type
    * the state is one count per OBSERVED DAY — exactly the (type, day)
    * cells the batch operator partial-aggregates to, so state is
    * days-bounded (≤ a few thousand longs per type after a decade),
    * never event-bounded. Each micro-batch folds its events into the
    * cells and re-walks the CUSUM `S_t = Σ(x_i·d − s)` over the ≤ d
    * cells in pure BIGINT with the batch op's exact
    * (−|S|, day)-min tie-break, emitting the current change point —
    * identical to running the batch operator over everything seen so
    * far (asserted stream==batch in the spec). The final-mean CUSUM
    * needs the full day frame by definition (d and s change with every
    * batch), so cell state IS the minimal exact state.
    * Input columns: `(event_type, day)`.
    */
  def streamingChangePoint(events: DataFrame)(
      implicit spark: SparkSession): Dataset[ChangePointState] = {
    import spark.implicits._
    events.select(col("event_type"), col("day").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[(String, Long)],
         state: GroupState[Map[Long, Long]]) =>
          var cells = state.getOption.getOrElse(Map.empty[Long, Long])
          rows.foreach { r =>
            cells = cells.updated(r._2, cells.getOrElse(r._2, 0L) + 1L)
          }
          state.update(cells)
          val d = cells.size.toLong
          val s = cells.valuesIterator.sum
          var cum = 0L
          var bestNeg = Long.MaxValue
          var bestDay = 0L
          var bestCum = 0L
          cells.toSeq.sortBy(_._1).foreach { case (day, x) =>
            cum += x * d - s
            val neg = -math.abs(cum)
            if (neg < bestNeg) { bestNeg = neg; bestDay = day; bestCum = cum }
          }
          ChangePointState(tpe, bestDay, -bestNeg, bestCum, d, s)
      }
  }

  def streamingDistinctRegisters(rows: DataFrame, b: Int = 8)(
      implicit spark: SparkSession): Dataset[HllRegister] = {
    import spark.implicits._
    val payloadBits = 60 - b
    val payloadMod = 1L << payloadBits
    val keyed = rows
      .select(col("group"),
        conv(substring(md5(col("value").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .select(col("group"), expr(s"h div ${payloadMod}L").as("bucket"),
        (lit(payloadBits + 1) -
          length(ltrim(bin(col("h") % payloadMod), "0")))
          .cast("long").as("rho"))
      .as[(String, Long, Long)]
    keyed.groupByKey(r => (r._1, r._2))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rs: Iterator[(String, Long, Long)],
         state: GroupState[Long]) =>
          val top = math.max(state.getOption.getOrElse(0L),
            rs.map(_._3).max)
          state.update(top)
          HllRegister(key._1, key._2, top)
      }
  }

  final case class BurstLeader(user_id: Long, event_type: String,
    leader_event_id: Long, secs: Long)

  /** Streaming twin of [[graft.ops.Events.debounceBursts]]' leader
    * stream — debounce at ingest. State per (user, type) is ONE long
    * (the last seen event time): an arriving event whose gap from it
    * exceeds `gapSeconds` is a new burst leader and is emitted;
    * everything else is suppressed. Within a trigger, rows are walked
    * in (secs, event_id) order, so a single batch reproduces the batch
    * operator's lag-gap rule exactly; across triggers the carried
    * last-seen time continues the burst, so a chain that spans
    * micro-batches still collapses to its first event.
    *
    * Contract (same as every twin here): arrivals are in event-time
    * order across triggers. An out-of-order arrival earlier than the
    * carried last-seen time can only be MORE suppressed than batch
    * (its gap measures from a later event), never a spurious leader.
    * `ts` is the [[graft]] nanos-long convention.
    */
  def streamingDebounce(events: DataFrame, gapSeconds: Long = 300L)(
      implicit spark: SparkSession): Dataset[BurstLeader] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts div 1000000000").as("secs"))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rs: Iterator[(Long, String, Long, Long)],
         state: GroupState[Long]) =>
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = scala.collection.mutable.ArrayBuffer[BurstLeader]()
          rs.toSeq.sortBy(r => (r._4, r._3)).foreach { r =>
            if (last == Long.MinValue || r._4 - last > gapSeconds)
              out += BurstLeader(key._1, key._2, r._3, r._4)
            last = r._4
          }
          state.update(last)
          out.iterator
      }
  }

  final case class SessionRow(user_id: Long, session_idx: Long,
    session_start: Long, session_end: Long, n_events: Long)

  /** Streaming twin of [[graft.ops.Events.sessionize]] — gap
    * sessionization at ingest. A session closes when a same-user event
    * arrives more than `gapSeconds` after the session end, or when the
    * event-time watermark passes `session_end + gapSeconds` (idle users
    * do not hold state forever: one open-session tuple per active user,
    * evicted on emission). In-order arrivals reproduce the batch session
    * set and indices exactly (spec-asserted); an out-of-order arrival
    * inside the watermark extends the open session the way the batch
    * operator would, but cannot reopen an already-emitted session — the
    * horizon trade-off every streaming sessionizer makes.
    *
    * The timeout is clamped strictly above the current watermark (Spark
    * rejects a timeout at or before it); if the watermark already passed
    * the session's natural close, the session closes on the next
    * trigger instead of killing the query.
    */
  def streamingSessions(events: DataFrame, gapSeconds: Long = 1800L,
                        watermark: String = "1 hour")(
      implicit spark: SparkSession): Dataset[SessionRow] = {
    import spark.implicits._
    events
      .withWatermark("ts_time", watermark)
      .selectExpr("user_id", "event_id", "ts div 1000000000 AS secs",
        "ts_time")
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long,
         rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (idx, st0, en, n) = state.get
            state.remove()
            Iterator.single(SessionRow(user, idx, st0, en, n))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
            var cur = state.getOption
            val batch = rows.toSeq
            batch.sortBy(r => (r._3, r._2)).foreach { case (_, _, sec, _) =>
              cur match {
                case None => cur = Some((1L, sec, sec, 1L))
                case Some((idx, st0, en, n)) =>
                  if (sec - en > gapSeconds) {
                    out += SessionRow(user, idx, st0, en, n)
                    cur = Some((idx + 1, sec, sec, 1L))
                  } else {
                    cur = Some((idx, math.min(st0, sec),
                      math.max(en, sec), n + 1))
                  }
              }
            }
            state.update(cur.get)
            val proposed = batch.map(_._4.getTime).max + gapSeconds * 1000L
            val floor = state.getCurrentWatermarkMs() + 1L
            state.setTimeoutTimestamp(math.max(proposed, floor))
            out.iterator
          }
      }
  }


  final case class FunnelConversion(user_id: Long, completed_at: Long,
    step_times: String)

  /** Streaming twin of [[graft.ops.Events.funnel]]: per-user greedy
    * step matching at ingest, emitting one row the moment a user
    * completes the final step. State is exactly `steps.size` longs per
    * user (the matched time per step, Long.MinValue = unmatched) — the
    * batch recursion `t_i = min step-i time > t_{i-1}` folds greedily,
    * and for IN-ORDER arrivals the greedy fold IS the batch recursion
    * (an event can only match step i after the step-(i-1) match, which
    * precedes it in event time, so it was processed first) —
    * spec-asserted equal to the batch funnel's conversion set. An
    * out-of-order arrival inside the watermark can only DELAY a match
    * the batch operator would make (it never mismatches): the horizon
    * caveat shared with [[streamingSessions]].
    */
  def streamingFunnel(events: DataFrame, steps: Seq[String],
                      watermark: String = "1 hour")(
      implicit spark: SparkSession): Dataset[FunnelConversion] = {
    require(steps.size >= 2, "funnel needs at least two steps")
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events
      .withWatermark("ts_time", watermark)
      .filter(col("event_type").isin(steps: _*))
      .selectExpr("user_id", "event_id", "ts", "event_type", "ts_time")
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (user: Long,
         rows: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
         state: GroupState[Seq[Long]]) =>
          var t = state.getOption
            .getOrElse(Seq.fill(steps.size)(Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[FunnelConversion]
          rows.toSeq.sortBy(r => (r._3, r._2)).foreach {
            case (_, _, ts, tpe, _) =>
              val i = stepIdx(tpe)
              if (i == 0) {
                if (t(0) == Long.MinValue) t = t.updated(0, ts)
              } else if (t(i) == Long.MinValue &&
                  t(i - 1) != Long.MinValue && ts > t(i - 1)) {
                t = t.updated(i, ts)
                if (i == steps.size - 1)
                  out += FunnelConversion(user, ts, t.mkString("->"))
              }
          }
          state.update(t)
          out.iterator
      }
  }

  /** Per-key token-bucket rate limiter — the ingest-protection
    * primitive in front of any per-user quota (API abuse, runaway
    * producers, crawl politeness): allow at most `maxPerWindow` events
    * per user per tumbling `windowUs` window, suppress the rest AT THE
    * STREAM, before they cost a shuffle downstream. State per user is
    * TWO longs (current window index + its count) forever — bounded by
    * |keys|, never stream length; only a NEWER window resets the
    * budget. A late event from an OLDER window than the stored one is
    * dropped outright (its own window's budget already closed with the
    * state advanced past it) — rewinding would grant the current
    * window a fresh budget and break the at-most-maxPerWindow
    * contract across micro-batches. Within a micro-batch rows fold in
    * (ts, event_id) order, so replays admit the same events
    * deterministically.
    *
    * Output: the admitted (user_id, event_id, ts) rows. Expects
    * microsecond-long `ts`.
    */
  def streamingRateLimit(events: DataFrame, maxPerWindow: Int,
                         windowUs: Long)(
      implicit spark: SparkSession): Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    require(maxPerWindow >= 1 && windowUs >= 1)
    events.selectExpr("user_id", "event_id", "ts")
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var (win, used) = state.getOption.getOrElse((Long.MinValue, 0L))
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
          rows.toSeq.sortBy(r => (r._3, r._2)).foreach {
            case (u, id, ts) =>
              val w = ts / windowUs
              if (w > win) { win = w; used = 0L }
              if (w == win && used < maxPerWindow) {
                used += 1L
                out += ((u, id, ts))
              }
          }
          state.update((win, used))
          out.iterator
      }
  }

  /** Approximate streaming dedup with CONSTANT state — the 100 TB/day
    * answer where [[streamingDedup]]'s exact per-fingerprint state is
    * bounded only by the watermark horizon: each of `nShards` keyed
    * groups holds ONE m-bit Bloom filter (mBits/8 bytes, forever), a
    * new document is dropped iff all k of its md5-salted bits are
    * already set, else it sets them and emits. Total executor state =
    * nShards × mBits/8 bytes regardless of stream length or horizon;
    * the price is a bounded false-positive rate (size mBits ≈ 17 bits
    * per expected distinct doc per shard — the [[graft.sources.BloomIndex]]
    * geometry) and no re-emission window at all (a duplicate is
    * suppressed FOREVER, unlike the watermark variant's horizon).
    * Sharding by a fingerprint prefix spreads both load and filter
    * occupancy uniformly; within a batch rows fold in (doc_id, fp)
    * order so replays are deterministic.
    *
    * Output: (doc_id, fp) of kept documents. Expects (doc_id, text).
    */
  def streamingBloomDedup(docs: DataFrame, nShards: Int = 64,
                          mBits: Int = 1 << 16, k: Int = 3)(
      implicit spark: SparkSession): Dataset[(Long, String)] = {
    import spark.implicits._
    require(nShards >= 1 && mBits >= 64 && mBits % 8 == 0 &&
      k >= 1 && k <= 8)
    val fps = docs
      .withColumn("fp",
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
      .withColumn("shard",
        expr(s"CAST(conv(substring(fp, 1, 4), 16, 10) AS BIGINT)") %
          nShards)
      .selectExpr("shard", "doc_id", "fp").as[(Long, Long, String)]
    fps.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], (Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[Array[Byte]]) =>
          val bloom = state.getOption.getOrElse(new Array[Byte](mBits / 8))
          val md = java.security.MessageDigest.getInstance("MD5")
          val kept = scala.collection.mutable.ArrayBuffer[(Long, String)]()
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, id, fp) =>
            val bits = (1 to k).map { h =>
              val d = md.digest(s"$h:$fp".getBytes("UTF-8"))
              md.reset()
              (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
                ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % mBits
            }
            val dup = bits.forall { b =>
              (bloom(b.toInt / 8) & (1 << (b.toInt % 8))) != 0
            }
            if (!dup) {
              bits.foreach { b =>
                bloom(b.toInt / 8) =
                  (bloom(b.toInt / 8) | (1 << (b.toInt % 8))).toByte
              }
              kept += ((id, fp))
            }
          }
          state.update(bloom)
          kept.iterator
      }
  }

}
