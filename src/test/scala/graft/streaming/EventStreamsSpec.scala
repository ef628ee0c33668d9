package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {

  test("streaming hourly rollup aggregates windows incrementally") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val rollup = EventStreams.hourlyRollup(
      mem.toDF.toDF("ts", "event_type", "value", "user_id"))
    val q = rollup.writeStream
      .format("memory").queryName("hourly_test")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      mem.addData(
        (ts(10, 5), "click", 1.0, 1L),
        (ts(10, 45), "click", 2.0, 2L),
        (ts(11, 5), "click", 4.0, 1L),
        (ts(10, 30), "view", 8.0, 3L))
      q.processAllAvailable()
      val rows = spark.table("hourly_test")
        .orderBy("hour_ts", "event_type").collect()
      assert(rows.length == 3)
      val clicks10 = rows(0)
      assert(clicks10.getAs[Long]("n_events") == 2L)
      assert(clicks10.getAs[Double]("sum_value") == 3.0)
      assert(clicks10.getAs[Long]("n_users_approx") == 2L)
      // late-but-within-watermark data folds into the existing window
      mem.addData((ts(10, 50), "click", 10.0, 9L))
      q.processAllAvailable()
      val updated = spark.table("hourly_test")
        .orderBy("hour_ts", "event_type").collect()
      assert(updated(0).getAs[Long]("n_events") == 3L)
      assert(updated(0).getAs[Double]("sum_value") == 13.0)
    } finally q.stop()
  }

  test("streaming dedup keeps first doc per fingerprint within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, String)]
    val deduped = EventStreams.streamingDedup(
      mem.toDF.toDF("ts", "doc_id", "text"))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      mem.addData(
        (ts(0), 1L, "hello world"),
        (ts(1), 2L, "hello   WORLD"), // same canonical form (lower + collapse)
        (ts(2), 3L, "hello world"),   // exact dup of doc 1
        (ts(3), 4L, "something else"))
      q.processAllAvailable()
      val docs = spark.table("dedup_test").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(docs.contains(1L) && docs.contains(4L), "firsts kept")
      assert(!docs.contains(2L) && !docs.contains(3L),
        "canonical-form duplicates dropped")
    } finally q.stop()
  }

  test("streamingRateLimit admits per-window budgets across batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sec = 1000000L
    val mem = MemoryStream[(Long, Long, Long)]
    val limited = EventStreams.streamingRateLimit(
      mem.toDF.toDF("user_id", "event_id", "ts"),
      maxPerWindow = 2, windowUs = 60L * sec)
    val q = limited.writeStream
      .format("memory").queryName("ratelimit_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // window 0: user 1 sends 3 (third suppressed); user 2 sends 1
      mem.addData((1L, 10L, 1L * sec), (1L, 11L, 2L * sec),
        (1L, 12L, 3L * sec), (2L, 20L, 1L * sec))
      q.processAllAvailable()
      // batch 2, still window 0: user 1's budget is SPENT (carried
      // state); user 2 has one left; window 1 resets user 1
      mem.addData((1L, 13L, 10L * sec), (2L, 21L, 11L * sec),
        (2L, 22L, 12L * sec), (1L, 14L, 70L * sec))
      q.processAllAvailable()
      val kept = spark.table("ratelimit_test").collect()
        .map(_.getAs[Long]("_2")).toSet
      assert(kept == Set(10L, 11L, 20L, 21L, 14L),
        s"unexpected admit set: $kept")
    } finally q.stop()
  }

  test("streamingRateLimit ignores cross-batch late events from older windows") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sec = 1000000L
    val mem = MemoryStream[(Long, Long, Long)]
    val limited = EventStreams.streamingRateLimit(
      mem.toDF.toDF("user_id", "event_id", "ts"),
      maxPerWindow = 2, windowUs = 60L * sec)
    val q = limited.writeStream
      .format("memory").queryName("ratelimit_late_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: user 1 spends the FULL window-1 budget
      mem.addData((1L, 10L, 70L * sec), (1L, 11L, 71L * sec))
      q.processAllAvailable()
      // batch 2: a LATE window-0 straggler arrives out of order. It
      // must NOT rewind the state to window 0 (which would hand the
      // following window-1 events a fresh budget — the r12 advice
      // bug); it is dropped, and window 1 stays spent.
      mem.addData((1L, 5L, 10L * sec), (1L, 12L, 72L * sec),
        (1L, 13L, 73L * sec))
      q.processAllAvailable()
      // batch 3: window 2 legitimately resets the budget
      mem.addData((1L, 20L, 130L * sec))
      q.processAllAvailable()
      val kept = spark.table("ratelimit_late_test").collect()
        .map(_.getAs[Long]("_2")).toSet
      assert(kept == Set(10L, 11L, 20L),
        s"late straggler must not reopen window-1 budget: $kept")
    } finally q.stop()
  }

  test("streamingBloomDedup suppresses duplicates forever on constant state") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val deduped = EventStreams.streamingBloomDedup(
      mem.toDF.toDF("doc_id", "text"), nShards = 4, mBits = 1 << 14)
    val q = deduped.writeStream
      .format("memory").queryName("bloomdedup_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData((1L, "hello world"), (2L, "hello   WORLD"),
        (3L, "something else"))
      q.processAllAvailable()
      // batch 2 replays doc 1's content LONG after any watermark
      // horizon would have expired it, plus a fresh doc
      mem.addData((4L, "hello world"), (5L, "third thing"))
      q.processAllAvailable()
      val kept = spark.table("bloomdedup_test").collect()
        .map(_.getAs[Long]("_1")).toSet
      assert(kept.contains(1L) && kept.contains(3L) && kept.contains(5L),
        "firsts kept")
      assert(!kept.contains(2L), "canonical-form duplicate dropped")
      assert(!kept.contains(4L), "cross-batch duplicate dropped with " +
        "no horizon — the constant-state win over streamingDedup")
    } finally q.stop()
  }

  test("streaming text pipeline dedups then quality-filters on the batch code path") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long, String)]
    val piped = EventStreams.streamingTextPipeline(
      mem.toDF.toDF("ts", "doc_id", "text"))
    val q = piped.writeStream
      .format("memory").queryName("textpipe_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      val good = "the cat sat on a mat and it was that simple story"
      mem.addData(
        (ts(0), 1L, good),
        (ts(1), 2L, good),        // duplicate → dropped by dedup
        (ts(2), 3L, "too short"), // unique but fails the quality filter
        (ts(3), 4L, "the dog ran over a hill and it was that fast there"))
      q.processAllAvailable()
      val rows = spark.table("textpipe_test").collect()
      assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 4L),
        "only unique, quality-passing docs flow through")
      assert(rows.forall(_.getAs[Boolean]("keep")))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user totals across batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]
    val totals = EventStreams.runningUserTotals(
      mem.toDF.toDF("user_id", "value"))
    val q = totals.toDF.writeStream
      .format("memory").queryName("totals_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      mem.addData((1L, 5.0))
      q.processAllAvailable()
      val byUser = spark.table("totals_test").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .view.mapValues(_.maxBy(_.getAs[Long]("n_events"))).toMap
      assert(byUser(1L).getAs[Long]("n_events") == 3L)
      assert(byUser(1L).getAs[Double]("total_value") == 10.0)
      assert(byUser(2L).getAs[Double]("total_value") == 10.0)
    } finally q.stop()
  }

  test("streamingEwma equals the batch fold when batches arrive in order") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // (user_id, ts, event_id, value); second batch continues user 1's
    // series and starts user 2's — the carried (n, s) state must make
    // the stream land exactly on the batch operator's fold
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val out = EventStreams.streamingEwma(
      mem.toDF.toDF("user_id", "ts", "event_id", "value"))
    val q = out.toDF.writeStream
      .format("memory").queryName("ewma_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 9.0))
      q.processAllAvailable()
      mem.addData((1L, 30L, 3L, 0.0), (2L, 10L, 4L, 5.0))
      q.processAllAvailable()
      val streamed = spark.table("ewma_test").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .view.mapValues(_.maxBy(_.getAs[Long]("n_events"))).toMap
      val batch = graft.ops.Events.ewma(
        Seq((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 9.0), (1L, 30L, 3L, 0.0),
          (2L, 10L, 4L, 5.0)).toDF("user_id", "ts", "event_id", "value"))
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("ewma_scaled"))).toMap
      for ((u, (n, sc)) <- batch) {
        assert(streamed(u).getAs[Long]("n_events") == n)
        assert(streamed(u).getAs[Long]("ewma_scaled") == sc,
          s"user $u stream/batch EWMA mismatch")
      }
      // out-of-order WITHIN one batch is still exact (sorted fold)
      assert(batch(1L)._2 == 200000000L - 25000000L)
    } finally q.stop()
  }

  test("streamingSeqSpans equals the batch spans under disorder") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // second batch arrives OUT OF ORDER (earlier ts for user 1's
    // click) — min/max state must still land on the batch groupBy
    val all = Seq((1L, "click", 200L), (1L, "buy", 300L),
      (2L, "click", 100L), (1L, "click", 50L), (2L, "click", 400L))
    val mem = MemoryStream[(Long, String, Long)]
    val out = EventStreams.streamingSeqSpans(
      mem.toDF.toDF("user_id", "event_type", "ts"))
    val q = out.toDF.writeStream
      .format("memory").queryName("spans_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData(all.take(3): _*)
      q.processAllAvailable()
      mem.addData(all.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("spans_test").collect()
        .groupBy(r => (r.getAs[Long]("user_id"),
          r.getAs[String]("event_type")))
        .view.mapValues(rs => (rs.map(_.getAs[Long]("first_ts")).min,
          rs.map(_.getAs[Long]("last_ts")).max)).toMap
      val batch = all.toDF("user_id", "event_type", "ts")
        .groupBy("user_id", "event_type")
        .agg(org.apache.spark.sql.functions.min("ts").as("f"),
          org.apache.spark.sql.functions.max("ts").as("l"))
        .collect().map(r => (r.getLong(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(streamed == batch,
        "span state must equal the batch groupBy — rule equality follows")
    } finally q.stop()
  }

  test("streamingAsOfEnrich equals the batch joinAsOf on a staged stream") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // (user_id, ts, tag, v, probe_id); tag 0 = state update, 1 = probe.
    // Covers: probe before any state (NULLs), same-ts state+probe
    // (inclusive <= — state wins), state carried across batches.
    val b1 = Seq((1L, 10L, 0, 100L, 0L), (1L, 20L, 1, 0L, 901L),
      (2L, 15L, 1, 0L, 902L))
    val b2 = Seq((1L, 30L, 0, 200L, 0L), (1L, 30L, 1, 0L, 903L),
      (2L, 40L, 0, 300L, 0L), (2L, 50L, 1, 0L, 904L))
    val mem = MemoryStream[(Long, Long, Int, Long, Long)]
    val out = EventStreams.streamingAsOfEnrich(
      mem.toDF.toDF("user_id", "ts", "tag", "v", "probe_id"))
    val q = out.toDF.writeStream.format("memory").queryName("asof_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      def snap(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
        r.getAs[Long]("probe_id") ->
          ((Option(r.getAs[java.lang.Long]("asof_time")),
            Option(r.getAs[java.lang.Long]("asof_v"))))
      }.toMap
      val streamed = snap(spark.table("asof_test").collect())
      val all = b1 ++ b2
      val batch = snap(graft.ops.Events.joinAsOf(
        all.filter(_._3 == 1).map(r => (r._1, r._2, r._5))
          .toDF("user_id", "ts", "probe_id"),
        all.filter(_._3 == 0).map(r => (r._1, r._2, r._4))
          .toDF("user_id", "ts", "v"),
        "user_id", "ts", Seq("v")).collect())
      assert(streamed == batch,
        "stream enrichment must equal the batch as-of join")
      assert(streamed(903L)._2.flatMap(v => Option(v.longValue))
        .contains(200L), "same-ts state row is visible (inclusive <=)")
      assert(streamed(902L)._1.isEmpty, "no prior state surfaces NULL")
      assert(streamed(904L)._2.flatMap(v => Option(v.longValue))
        .contains(300L), "state carried across the batch boundary")
    } finally q.stop()
  }

  test("streamingQuantileSketch emission equals the batch sketch over all seen") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // (group, v, id): one group, 60 rows split across two batches
    val all = (1 to 60).map(i => ("g", (i * 37 % 101).toLong, s"row$i"))
    val mem = MemoryStream[(String, Long, String)]
    val out = EventStreams.streamingQuantileSketch(
      mem.toDF.toDF("group", "v", "id"), k = 32)
    val q = out.toDF.writeStream.format("memory").queryName("qsk_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(all.take(25): _*)
      q.processAllAvailable()
      mem.addData(all.drop(25): _*)
      q.processAllAvailable()
      val streamed = spark.table("qsk_test").collect()
        .groupBy(_.getAs[Long]("q_ppm"))
        .view.mapValues(_.maxBy(_.getAs[Long]("n_sample")))
        .map { case (qp, r) => qp -> (r.getAs[Long]("est"),
          r.getAs[Long]("n_sample")) }.toMap
      val batch = graft.ops.Sketches.quantileSketch(
        all.toDF("group", "v", "id"), "v", "id", k = 32,
        qsPpm = Seq(250000L, 500000L, 750000L))
        .collect().map(r => r.getAs[Long]("q_ppm") ->
          (r.getAs[Long]("est"), r.getAs[Long]("n_sample"))).toMap
      assert(streamed == batch,
        "latest stream emission must equal the batch bottom-k sketch")
    } finally q.stop()
  }

  test("streamingSeqSpans evicts dead keys past the watermark (evictAfterMs)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // event times offset from epoch (the r8 rule: epoch-0 rows sit ON
    // the initial watermark and drop); ts nanos aligned to ts_time so
    // the timeout target (last_ts/1e6 + evictAfterMs) is meaningful
    def t(sec: Int) = Timestamp.valueOf(f"2026-01-01 10:00:$sec%02d")
    def nanos(sec: Int) = t(sec).getTime * 1000000L
    val mem = MemoryStream[(Long, String, Long, Timestamp)]
    val out = EventStreams.streamingSeqSpans(
      mem.toDF.toDF("user_id", "event_type", "ts", "ts_time")
        .withWatermark("ts_time", "0 seconds"),
      evictAfterMs = Some(1000L))
    val q = out.toDF.writeStream
      .format("memory").queryName("spans_evict_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData((1L, "click", nanos(1), t(1)), (1L, "click", nanos(2), t(2)))
      q.processAllAvailable()
      // advance the watermark far past user 1's last_ts + 1s via key 2,
      // then one more trigger — timeouts fire on the batch AFTER the
      // watermark advances
      mem.addData((2L, "view", nanos(30), t(30)))
      q.processAllAvailable()
      mem.addData((2L, "view", nanos(31), t(31)))
      q.processAllAvailable()
      // user 1 returns AFTER eviction: span must start fresh
      mem.addData((1L, "click", nanos(40), t(40)))
      q.processAllAvailable()
      val u1 = spark.table("spans_evict_test").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
        .map(r => (r.getAs[Long]("first_ts"), r.getAs[Long]("last_ts")))
        .toSet
      assert(u1.contains((nanos(1), nanos(2))), "pre-eviction span emitted")
      assert(u1.contains((nanos(40), nanos(40))),
        "post-eviction span must start fresh — two longs were freed")
      assert(!u1.contains((nanos(1), nanos(40))),
        "evicted state must not leak into the returning key")
    } finally q.stop()
  }

  test("streamingChangePoint equals the batch CUSUM over everything seen") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // a level shift on day 4 for type "click", split across two
    // micro-batches — the day-cell state must make batch 2's emission
    // identical to running the batch operator over the union
    val b1 = Seq.tabulate(6)(i => ("click", (i / 2 + 1).toLong)) // d1..d3 ×2
    val b2 = Seq.tabulate(10)(i => ("click", (i / 5 + 4).toLong)) // d4,d5 ×5
    val mem = MemoryStream[(String, Long)]
    val out = EventStreams.streamingChangePoint(
      mem.toDF.toDF("event_type", "day"))
    val q = out.toDF.writeStream
      .format("memory").queryName("cusum_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val last = spark.table("cusum_test").collect()
        .filter(_.getAs[String]("event_type") == "click")
        .maxBy(_.getAs[Long]("n_events"))
      val batch = graft.ops.Events.changePoint(
        (b1 ++ b2).toDF("event_type", "day")).collect().head
      for (c <- Seq("change_day", "peak_abs_dev", "peak_dev", "n_days",
        "n_events"))
        assert(last.getAs[Long](c) == batch.getAs[Long](c),
          s"$c stream/batch mismatch")
    } finally q.stop()
  }

  test("streamingIngestPipeline: both legs equal the batch pipeline on one corpus") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // doc 1 good; doc 2 exact dup of 1 (dedup leg drops it; pair leg
    // emits the sim-1.0 pair); doc 3 near-dup of 1; doc 4 good distinct;
    // doc 5 fails the quality gate (too short) and must reach NEITHER leg
    val corpus = Seq(
      (1L, base),
      (2L, base),
      (3L, base + " tomorrow"),
      (4L, "the spark catalyst engine is fast and it shuffles data over many nodes"),
      (5L, "too short"))
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val mem = MemoryStream[(Timestamp, Long, String)]
    val (kept, pairs) = EventStreams.streamingIngestPipeline(
      mem.toDF.toDF("ts", "doc_id", "text"))
    val q1 = kept.writeStream.format("memory").queryName("ingest_kept")
      .outputMode(OutputMode.Append()).start()
    val q2 = pairs.toDF.writeStream.format("memory").queryName("ingest_pairs")
      .outputMode(OutputMode.Append()).start()
    try {
      // two micro-batches so the dedup/bucket state carries across
      mem.addData(corpus.take(2).map { case (id, t) => (ts(id.toInt), id, t) }: _*)
      q1.processAllAvailable(); q2.processAllAvailable()
      mem.addData(corpus.drop(2).map { case (id, t) => (ts(id.toInt), id, t) }: _*)
      q1.processAllAvailable(); q2.processAllAvailable()

      val docsDF = corpus.toDF("doc_id", "text")
      // batch twin of leg 1: first doc per canonical fingerprint (the
      // streamingDedup rule; arrival order == doc_id order here), then
      // the same quality gate and the same stateless split
      val firstPerFp = docsDF
        .withColumn("fp",
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
        .groupBy("fp").agg(min("doc_id").as("doc_id"))
      val batchKept = graft.ops.Sampling.splitAssign(
        graft.ops.TextAnalysis.qualityFilter(
          docsDF.join(firstPerFp.select("doc_id"), "doc_id"))
          .filter(col("keep")), "doc_id")
        .select("doc_id", "split").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val streamKept = spark.table("ingest_kept")
        .select("doc_id", "split").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamKept == batchKept, s"kept: $streamKept vs $batchKept")
      assert(streamKept.map(_._1) == Set(1L, 3L, 4L))

      // batch twin of leg 2: minHashLsh over the quality-passing slice
      val qualityDocs = docsDF.join(
        graft.ops.TextAnalysis.qualityFilter(docsDF)
          .filter(col("keep")).select("doc_id"), "doc_id")
      val batchPairs = graft.ops.Dedup.minHashLsh(qualityDocs)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val streamPairs = spark.table("ingest_pairs")
        .select("a_id", "b_id").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamPairs == batchPairs, s"pairs: $streamPairs vs $batchPairs")
      assert(streamPairs.contains((1L, 2L)), "exact dup surfaces as a pair")
      assert(!streamPairs.exists(p => p._1 == 5L || p._2 == 5L),
        "gate-failing doc reaches neither leg")
    } finally { q1.stop(); q2.stop() }
  }

  test("streamingNearDup distinct pairs equal batch minHashLsh over all seen") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // batch 1 seeds docs 0/1 (exact dups); batch 2 adds a near-dup of
    // them plus an unrelated doc — the cross-batch pair (0,2)/(1,2)
    // must come out of carried bucket state
    val b1 = Seq((0L, base), (1L, base))
    val b2 = Seq((2L, base + " tomorrow"),
      (3L, "completely different words about spark catalyst tungsten shuffles"))
    val mem = MemoryStream[(Long, String)]
    val out = EventStreams.streamingNearDup(
      mem.toDF.toDF("doc_id", "text"))
    val q = out.toDF.writeStream
      .format("memory").queryName("neardup_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("neardup_test")
        .select("a_id", "b_id").distinct().collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
      val batch = graft.ops.Dedup.minHashLsh((b1 ++ b2).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(batch.contains((0L, 2L)) || batch.contains((1L, 2L)),
        "fixture must produce a cross-batch pair")
    } finally q.stop()
  }

  test("streamingNearDup retention expires idle buckets (no pairs vs pre-expiry docs)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val other = "completely different words about spark catalyst tungsten shuffles"
    def ts(day: Int) = Timestamp.valueOf(f"2026-01-$day%02d 00:00:00")
    val mem = MemoryStream[(Long, String, Timestamp)]
    // 1-day retention, zero watermark delay so event time IS the watermark
    val out = EventStreams.streamingNearDup(
      mem.toDF.toDF("doc_id", "text", "ts_time"),
      retentionMs = Some(86400000L), watermark = "0 seconds")
    val q = out.toDF.writeStream
      .format("memory").queryName("neardup_ttl_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // b1: exact dups at day 1 → pair (0,1); bucket timeout = day 2
      mem.addData((0L, base, ts(1)), (1L, base, ts(1)))
      q.processAllAvailable()
      // b2: unrelated doc far in the future advances the watermark past
      // the base bucket's timeout (watermark updates at end of batch)
      mem.addData((9L, other, ts(20)))
      q.processAllAvailable()
      // b3: another unrelated doc — THIS trigger fires the base bucket's
      // timeout (timeouts process against the watermark set after b2)
      mem.addData((8L, other + " and more tokens here", ts(20)))
      q.processAllAvailable()
      // b4: a near-dup of the day-1 docs arrives after expiry → the
      // bucket index restarted, so no pair against doc 0/1 may appear
      mem.addData((2L, base + " tomorrow", ts(20)))
      q.processAllAvailable()
      val pairs = spark.table("neardup_ttl_test")
        .select("a_id", "b_id").distinct().collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
      assert(pairs == Set((0L, 1L)),
        s"expected only the pre-expiry pair (0,1); got $pairs")
    } finally q.stop()
  }

  test("streamingAttribution credit rows sum to the batch attribution rollup") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // (event_id, user_id, ts us, event_type, ts_time) — two users, touches
    // split across micro-batches so a batch-2 purchase must credit
    // batch-1 clicks out of carried state; user 7's second purchase
    // shares touches with the first (n_convs > n_pairs check); one
    // click outside the lookback window must not be credited
    val look = 1000L
    def tt(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val b1 = Seq(
      (1L, 7L, 100L, "click", tt(0)),
      (2L, 7L, 150L, "view", tt(0)),
      (3L, 8L, 10L, "click", tt(0)),   // outside lookback of 8's purchase
      (4L, 8L, 900L, "click", tt(1)))
    val b2 = Seq(
      (5L, 7L, 400L, "purchase", tt(2)),
      (6L, 7L, 500L, "purchase", tt(2)),
      (7L, 8L, 1500L, "purchase", tt(2)))
    val mem = MemoryStream[(Long, Long, Long, String, Timestamp)]
    val credits = EventStreams.streamingAttribution(
      mem.toDF.toDF("event_id", "user_id", "ts", "event_type", "ts_time"),
      lookbackUs = look)
    val q = credits.toDF.writeStream
      .format("memory").queryName("attr_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      import org.apache.spark.sql.{functions => F}
      val streamed = spark.table("attr_test")
        .groupBy(F.col("touch_type"))
        .agg(F.sum("n_pairs").as("n_pairs"),
          F.countDistinct("conv_id").as("n_convs"),
          F.sum("first_touch_wins").as("first_touch_wins"),
          F.sum("last_touch_wins").as("last_touch_wins"),
          F.sum("linear_credit_ppm").as("linear_credit_ppm"))
        .collect().map(r => r.getAs[String]("touch_type") ->
          (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_convs"),
            r.getAs[Long]("first_touch_wins"), r.getAs[Long]("last_touch_wins"),
            r.getAs[Long]("linear_credit_ppm"))).toMap
      val batch = graft.ops.Events.attribution(
        (b1 ++ b2).map(r => (r._1, r._2, r._3, r._4))
          .toDF("event_id", "user_id", "ts", "event_type"),
        lookbackUs = look)
        .collect().map(r => r.getAs[String]("touch_type") ->
          (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_convs"),
            r.getAs[Long]("first_touch_wins"), r.getAs[Long]("last_touch_wins"),
            r.getAs[Long]("linear_credit_ppm"))).toMap
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(batch("click")._1 >= 2, "fixture exercises multi-pair credit")
    } finally q.stop()
  }

  test("streamingAttribution never credits a future-timestamped touch (out-of-order)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // touch B (ts=1200) reaches state in batch 1; the conversion (ts=600)
    // arrives LATE in batch 2 — inside the 1-hour watermark, so it is
    // admitted — and must credit only touch A (ts=500): the batch
    // operator's touch_ts <= conv_ts predicate excludes B
    def tt(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val mem = MemoryStream[(Long, Long, Long, String, Timestamp)]
    val credits = EventStreams.streamingAttribution(
      mem.toDF.toDF("event_id", "user_id", "ts", "event_type", "ts_time"),
      lookbackUs = 1000L)
    val q = credits.toDF.writeStream
      .format("memory").queryName("attr_ooo_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData((1L, 7L, 500L, "click", tt(5)), (2L, 7L, 1200L, "click", tt(20)))
      q.processAllAvailable()
      mem.addData((3L, 7L, 600L, "purchase", tt(10)))
      q.processAllAvailable()
      val rows = spark.table("attr_ooo_test").collect()
      assert(rows.length == 1, s"one credit row expected: ${rows.toSeq}")
      assert(rows.head.getAs[Long]("n_touches") == 1L,
        "the future touch must not be credited")
      assert(rows.head.getAs[Long]("linear_credit_ppm") == 1000000L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState trailing features roll across micro-batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // (event_id, user_id, ts us, value, ts_time)
    val mem = MemoryStream[(Long, Long, Long, Double, Timestamp)]
    val feats = EventStreams.streamingTrailing(
      mem.toDF.toDF("event_id", "user_id", "ts", "value", "ts_time"),
      windowUs = 100L)
    val q = feats.toDF.writeStream
      .format("memory").queryName("trailing_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def tt(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      mem.addData(
        (1L, 7L, 100L, 1.0, tt(0)),
        (2L, 7L, 150L, 2.0, tt(1)))
      q.processAllAvailable()
      // next batch: state carries the (150, 2.0) event into 2's window
      mem.addData(
        (3L, 7L, 220L, 4.0, tt(2)),  // window [120,220] -> events 2,3
        (4L, 8L, 220L, 8.0, tt(2)))  // fresh user
      q.processAllAvailable()
      val byId = spark.table("trailing_test").collect()
        .map(r => r.getAs[Long]("event_id") ->
          (r.getAs[Long]("trailing_events"), r.getAs[Double]("trailing_value")))
        .toMap
      assert(byId(1L) == ((1L, 1.0)))
      assert(byId(2L) == ((2L, 3.0)))
      assert(byId(3L) == ((2L, 6.0)), "cross-batch state: event 2 still in window")
      assert(byId(4L) == ((1L, 8.0)))
    } finally q.stop()
  }

  test("streamingAnomalies flags online outliers with state across batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, String, Double)]
    val flags = EventStreams.streamingAnomalies(
      mem.toDF.toDF("event_id", "user_id", "event_type", "value"))
    val q = flags.toDF.writeStream
      .format("memory").queryName("anomaly_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: nine steady 10.00s — nothing anomalous
      mem.addData((1L to 9L).map(i => (i, 1L, "t", 10.0)): _*)
      q.processAllAvailable()
      // batch 2: the spike arrives; running stats carried over flag it
      // (prefix stats here equal the batch operator's closed-group stats)
      mem.addData((10L, 1L, "t", 50.0), (11L, 2L, "t", 50.0))
      q.processAllAvailable()
      val rows = spark.table("anomaly_test").collect()
        .map(r => r.getAs[Long]("event_id") ->
          (r.getAs[Boolean]("is_anomaly"), r.getAs[Long]("group_n"))).toMap
      assert(rows.size == 11)
      assert((1L to 9L).forall(!rows(_)._1), "steady values never flag")
      assert(rows(10L) == ((true, 10L)), "spike flagged with carried state")
      assert(rows(11L) == ((false, 1L)), "fresh key below minN never flags")
    } finally q.stop()
  }

  test("session rollup groups by gap-separated session windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long)]
    val sessions = EventStreams.sessionRollup(
      mem.toDF.toDF("ts", "user_id"), gap = "30 minutes")
    val q = sessions.writeStream
      .format("memory").queryName("session_test")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      mem.addData((ts(9, 0), 1L), (ts(9, 10), 1L), (ts(12, 0), 1L))
      q.processAllAvailable()
      val rows = spark.table("session_test").orderBy("session_start").collect()
      assert(rows.length == 2, "gap > 30min must split sessions")
      assert(rows(0).getAs[Long]("n_events") == 2L)
      assert(rows(1).getAs[Long]("n_events") == 1L)
    } finally q.stop()
  }

  test("stream-stream purchase attribution joins within the interval only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = EventStreams.purchaseAttribution(
      purchases.toDF.toDF("user_id", "p_id", "p_ts"),
      clicks.toDF.toDF("user_id", "c_id", "c_ts"),
      windowSeconds = 3600L)
    val q = joined.writeStream
      .format("memory").queryName("attrib_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
      purchases.addData((1L, 100L, ts(10, 0)), (2L, 200L, ts(10, 0)))
      clicks.addData(
        (1L, 1000L, ts(10, 30)),  // inside window, same user -> joins
        (1L, 1001L, ts(12, 0)),   // outside window -> dropped
        (2L, 2000L, ts(9, 0)),    // before the purchase -> dropped
        (3L, 3000L, ts(10, 15)))  // no purchase for user 3 -> dropped
      q.processAllAvailable()
      val rows = spark.table("attrib_test").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("p_id"),
          r.getAs[Long]("c_id")))
      assert(rows.toSet === Set((1L, 100L, 1000L)))
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dimension, keeps unmatched") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]
    val dims = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val enriched = EventStreams.enrichEvents(
      mem.toDF.toDF("user_id", "value"), dims)
    val q = enriched.writeStream
      .format("memory").queryName("enrich_test")
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData((1L, 10.0), (3L, 30.0))
      q.processAllAvailable()
      mem.addData((2L, 20.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_test").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"),
          Option(r.getAs[String]("tier")))).toSet
      assert(rows === Set(
        (1L, 10.0, Some("gold")),
        (3L, 30.0, None),          // left join: unmatched events survive
        (2L, 20.0, Some("basic"))))
    } finally q.stop()
  }

  test("streaming CMS cells equal the batch sketch after two batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    import spark.implicits._
    val mem = MemoryStream[String]
    val cells = EventStreams.streamingFrequencyCells(
      mem.toDF.toDF("item"), depth = 3, width = 64)
    val q = cells.writeStream
      .format("memory").queryName("cms_stream_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      val batch1 = (1 to 100).map(i => s"tok${i % 10}")
      val batch2 = (1 to 50).map(i => s"tok${i % 5}")
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // latest count per cell (update mode re-emits changed cells)
      val streamed = spark.table("cms_stream_test")
        .groupBy("depth", "cell")
        .agg(org.apache.spark.sql.functions.max("cnt").as("cnt"))
        .collect().map(r => (r.getAs[Int]("depth"), r.getAs[Long]("cell"))
          -> r.getAs[Long]("cnt")).toMap
      val batch = graft.ops.Sketches.cmsSketch(
        (batch1 ++ batch2).toDF("tok"), "tok", depth = 3, width = 64)
        .collect().map(r => (r.getAs[Int]("depth"), r.getAs[Long]("cell"))
          -> r.getAs[Long]("cnt")).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming HLL registers converge to the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    import spark.implicits._
    val mem = MemoryStream[(String, Long)]
    val regs = EventStreams.streamingDistinctRegisters(
      mem.toDF.toDF("group", "value"))
    val q = regs.writeStream
      .format("memory").queryName("hll_stream_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData((1 to 600).map(i => ("g", i.toLong)): _*)
      q.processAllAvailable()
      mem.addData((401 to 1000).map(i => ("g", i.toLong)): _*)
      q.processAllAvailable()
      // latest state per register (update mode re-emits changed rows)
      val streamed = spark.table("hll_stream_test")
        .groupBy("group", "bucket")
        .agg(org.apache.spark.sql.functions.max("rho_max").as("rho_max"))
      val streamedEst = graft.ops.Sketches
        .hllEstimate(streamed, Seq("group"))
        .select("est").as[Double].head()
      // identical hash split -> identical registers as the batch sketch
      val batchEst = graft.ops.Sketches.hllCount(
        (1 to 1000).map(i => ("g", i.toLong)).toDF("group", "value"),
        "value", Seq("group"))
        .select("est").as[Double].head()
      assert(streamedEst == batchEst)
      // bounded state: never more than 2^8 registers for the group
      assert(streamed.count() <= 256L)
    } finally q.stop()
  }

  test("streamingDebounce emits exactly the batch burst leaders") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sec = 1000000000L
    // (user_id, event_type, event_id, ts): user 1 bursts at 0/100/250s,
    // the 250s row arrives in batch 2 — carried state must keep
    // suppressing it; 900s opens a new burst; user 2 independent
    val b1 = Seq((1L, "a", 10L, 0L * sec), (1L, "a", 11L, 100L * sec),
      (2L, "a", 30L, 0L * sec))
    val b2 = Seq((1L, "a", 12L, 250L * sec), (1L, "a", 13L, 900L * sec),
      (1L, "b", 20L, 0L * sec))
    val mem = MemoryStream[(Long, String, Long, Long)]
    val out = EventStreams.streamingDebounce(
      mem.toDF.toDF("user_id", "event_type", "event_id", "ts"))
    val q = out.toDF.writeStream.format("memory")
      .queryName("debounce_test").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("debounce_test").collect()
        .map(_.getAs[Long]("leader_event_id")).toSet
      val batchLeaders = graft.ops.Events.debounceBursts(
        (b1 ++ b2).toDF("user_id", "event_type", "event_id", "ts"), 300L)
        .collect().map(_.getAs[Long]("leader_event_id")).toSet
      assert(batchLeaders == Set(10L, 13L, 20L, 30L))
      assert(streamed == batchLeaders,
        s"stream $streamed != batch $batchLeaders")
    } finally q.stop()
  }

  test("streamingSessions equals batch sessions; idle timeout closes state") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(sec: Long) = new Timestamp(sec * 1000L)
    def ns(sec: Long) = sec * 1000000000L
    val mem = MemoryStream[(Long, Long, Long, Timestamp)]
    val out = EventStreams.streamingSessions(
      mem.toDF.toDF("user_id", "event_id", "ts", "ts_time"),
      gapSeconds = 1800L, watermark = "10 seconds")
    val q = out.toDF.writeStream.format("memory").queryName("sess_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // base offset keeps event times off the epoch-0 initial watermark
      mem.addData((1L, 1L, ns(1000), t(1000)), (1L, 2L, ns(1100), t(1100)),
        (2L, 9L, ns(1050), t(1050)))
      q.processAllAvailable()
      // gap-exceeding arrival closes user 1's first session in-function
      mem.addData((1L, 3L, ns(3000), t(3000)))
      q.processAllAvailable()
      // watermark jump: user 1's open session and user 2's only session
      // must close via EVENT-TIME TIMEOUT (no further events for them)
      mem.addData((3L, 99L, ns(10000), t(10000)))
      q.processAllAvailable()
      mem.addData((3L, 100L, ns(20000), t(20000)))
      q.processAllAvailable()
      val got = spark.table("sess_test").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"),
          r.getAs[Long]("session_start"), r.getAs[Long]("session_end"),
          r.getAs[Long]("n_events"))).toSet
      assert(got === Set(
        (1L, 1L, 1000L, 1100L, 2L),  // closed by the 3000s arrival
        (1L, 2L, 3000L, 3000L, 1L),  // closed by timeout
        (2L, 1L, 1050L, 1050L, 1L),  // closed by timeout
        (3L, 1L, 10000L, 10000L, 1L) // closed by the 20000s arrival
      ))
    } finally q.stop()
  }


  test("streamingFunnel conversions equal the batch funnel across batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(sec: Long) = new Timestamp(sec * 1000L)
    def ns(sec: Long) = sec * 1000000000L
    val mem = MemoryStream[(Long, Long, Long, String, Timestamp)]
    val out = EventStreams.streamingFunnel(
      mem.toDF.toDF("user_id", "event_id", "ts", "event_type", "ts_time"),
      Seq("a", "b", "c"))
    val q = out.toDF.writeStream.format("memory").queryName("funnel_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 completes across two batches; user 2 stalls at step b;
      // user 3's step-b arrives BEFORE any step-a: never matches
      mem.addData((1L, 1L, ns(1000), "a", t(1000)),
        (2L, 2L, ns(1000), "a", t(1000)),
        (3L, 3L, ns(1000), "b", t(1000)))
      q.processAllAvailable()
      mem.addData((1L, 4L, ns(1100), "b", t(1100)),
        (1L, 5L, ns(1200), "c", t(1200)),
        (2L, 6L, ns(1100), "b", t(1100)),
        (3L, 7L, ns(1100), "c", t(1100)))
      q.processAllAvailable()
      val got = spark.table("funnel_test").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("completed_at")))
      assert(got.toSeq === Seq((1L, ns(1200))))
      // batch twin agrees on who converts
      val batch = graft.ops.Events.funnel(
        Seq((1L, "a", 1000L), (1L, "b", 1100L), (1L, "c", 1200L),
          (2L, "a", 1000L), (2L, "b", 1100L),
          (3L, "b", 1000L), (3L, "c", 1100L))
          .toDF("user_id", "event_type", "ts"), Seq("a", "b", "c"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(batch(3L) === 1L) // only user 1 reaches step 3
    } finally q.stop()
  }


  test("streamingDailyTopK's latest emission equals the batch leaderboard") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val out = EventStreams.streamingDailyTopK(
      mem.toDF.toDF("day", "event_type"), k = 2)
    val q = out.toDF.writeStream
      .format("memory").queryName("dtopk_test")
      .outputMode(OutputMode.Update())
      .start()
    try {
      mem.addData((0L, "a"), (0L, "a"), (0L, "b"), (1L, "c"))
      q.processAllAvailable()
      // batch 2 flips day 0's leader to b and extends day 1
      mem.addData((0L, "b"), (0L, "b"), (1L, "c"), (1L, "d"), (1L, "d"),
        (1L, "d"))
      q.processAllAvailable()
      // latest emission per (day, rank): b leads day 0 (3 > 2), d day 1
      val rows = spark.table("dtopk_test").collect()
        .groupBy(r => (r.getAs[Long]("day"), r.getAs[Long]("rank")))
        .view.mapValues(_.maxBy(_.getAs[Long]("n"))).toMap
      val batch = graft.ops.Events.dailyTopK(
        Seq((0L, "a"), (0L, "a"), (0L, "b"), (1L, "c"), (0L, "b"),
          (0L, "b"), (1L, "c"), (1L, "d"), (1L, "d"), (1L, "d"))
          .toDF("day", "event_type"), k = 2).collect()
        .map(r => (r.getAs[Long]("day"), r.getAs[Long]("rank")) ->
          (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toMap
      assert(batch.nonEmpty)
      for (((day, rank), (t, n)) <- batch) {
        assert(rows((day, rank)).getAs[String]("event_type") == t,
          s"day $day rank $rank type mismatch")
        assert(rows((day, rank)).getAs[Long]("n") == n)
      }
    } finally q.stop()
  }

  test("streamingOhlc latest emissions equal the batch daily bars") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val us = 86400000000L
    // (user_id, ts us, event_id, value, ts_time); two batches so day-0
    // bars update incrementally across triggers
    def row(u: Long, t: Long, e: Long, v: Double) =
      (u, t, e, v, new Timestamp(t / 1000L))
    val b1 = Seq(row(1L, 10L, 1L, 1.50), row(1L, 20L, 2L, 3.25))
    val b2 = Seq(row(1L, 5L, 3L, 0.75),              // new day-0 open
      row(1L, us + 7L, 4L, 9.00), row(2L, 30L, 5L, 2.00))
    val mem = MemoryStream[(Long, Long, Long, Double, Timestamp)]
    val out = EventStreams.streamingOhlc(
      mem.toDF.toDF("user_id", "ts", "event_id", "value", "ts_time"))
    val q = out.writeStream.format("memory").queryName("ohlc_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val latest = spark.table("ohlc_test").collect()
        .groupBy(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
        .view.mapValues(_.maxBy(_.getAs[Long]("n_events"))).toMap
      val batch = graft.ops.Events.ohlcBars(
        (b1 ++ b2).map(t => (t._1, t._2, t._3, t._4))
          .toDF("user_id", "ts", "event_id", "value")).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")) -> r)
        .toMap
      assert(batch.keySet == latest.keySet)
      for ((k, b) <- batch; s = latest(k)) {
        for (c <- Seq("n_events", "open_c", "high_c", "low_c", "close_c",
          "sum_c"))
          assert(s.getAs[Long](c) == b.getAs[Long](c), s"$k $c")
      }
      // the day-0 open flipped to the late-arriving earlier event
      assert(latest((1L, 0L)).getAs[Long]("open_c") == 75L)
    } finally q.stop()
  }

  test("streamingClickMatchOuter emits unmatched impressions after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    def us(m: Int) = ts(m).getTime * 1000L
    val imps = MemoryStream[(Long, Long, Long, Timestamp)]
    val clks = MemoryStream[(Long, Long, Long, Timestamp)]
    val out = EventStreams.streamingClickMatchOuter(
      imps.toDF.toDF("imp_id", "user_id", "imp_us", "imp_time"),
      clks.toDF.toDF("click_id", "user_id", "click_us", "click_time"))
    val q = out.writeStream.format("memory").queryName("ssjoin_outer_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 7 clicks in-window; user 8 never clicks
      imps.addData((1L, 7L, us(0), ts(0)), (2L, 8L, us(0), ts(0)))
      clks.addData((10L, 7L, us(20), ts(20)))
      q.processAllAvailable()
      val matched = spark.table("ssjoin_outer_test").collect()
      assert(matched.length == 1 && matched(0).getAs[Boolean]("clicked"),
        s"expected only the matched row first: ${matched.toSeq}")
      // push both watermarks past imp_time + horizon (10:00 + 30min)
      // + the 10min delay: the unmatched impression must then emit
      // null-padded
      imps.addData((99L, 99L, us(55), ts(55)))
      clks.addData((98L, 98L, us(55), ts(55)))
      q.processAllAvailable()
      imps.addData((97L, 97L, us(56), ts(56)))
      q.processAllAvailable()
      val rows = spark.table("ssjoin_outer_test").collect()
        .filter(_.getLong(1) == 2L)
      assert(rows.length == 1, s"unmatched impression not emitted: " +
        s"${spark.table("ssjoin_outer_test").collect().toSeq}")
      val r = rows.head
      assert(!r.getAs[Boolean]("clicked") && r.isNullAt(2) && r.isNullAt(3),
        s"outer row must be null-padded: $r")
    } finally q.stop()
  }

  test("streamingClickMatch pairs streams within the horizon only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    def us(m: Int) = ts(m).getTime * 1000L
    val imps = MemoryStream[(Long, Long, Long, Timestamp)]
    val clks = MemoryStream[(Long, Long, Long, Timestamp)]
    val out = EventStreams.streamingClickMatch(
      imps.toDF.toDF("imp_id", "user_id", "imp_us", "imp_time"),
      clks.toDF.toDF("click_id", "user_id", "click_us", "click_time"))
    val q = out.writeStream.format("memory").queryName("ssjoin_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: impressions only — nothing can match yet
      imps.addData((1L, 7L, us(0), ts(0)), (2L, 8L, us(5), ts(5)))
      q.processAllAvailable()
      assert(spark.table("ssjoin_test").count() == 0)
      // batch 2: clicks — user 7 in-window, user 8 beyond 30 min,
      // user 9 has no impression
      clks.addData((10L, 7L, us(20), ts(20)), (11L, 8L, us(40), ts(40)),
        (12L, 9L, us(1), ts(1)))
      q.processAllAvailable()
      val rows = spark.table("ssjoin_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq == Seq((7L, 1L, 10L, 20L * 60L * 1000000L)),
        s"got ${rows.toSeq}")
    } finally q.stop()
  }
}
