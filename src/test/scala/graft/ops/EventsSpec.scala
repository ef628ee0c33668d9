package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("latenessProfile measures high-water-mark lateness in pow2 buckets") {
    // user 1 arrival order (event_id): ts 5ms, then 2ms (3ms late ->
    // bucket bit_length(3)=2), then 7ms (on time -> bucket 0)
    val ev = Seq(
      (1L, 1L, "click", 5000000L),
      (2L, 1L, "click", 2000000L),
      (3L, 1L, "click", 7000000L)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.latenessProfile(ev).collect()
      .map(x => x.getAs[Long]("late_bucket") ->
        (x.getAs[Long]("n_events"), x.getAs[Long]("max_late_ms"))).toMap
    assert(r(0L) == (2L, 0L)) // first arrival + the in-order one
    assert(r(2L) == (1L, 3L)) // 3ms late -> bucket 2
  }

  test("hourlyRollup handles timestamp columns") {
    val df = Seq(
      (1L, ts(10, 5), 1L, "click", 1.5),
      (2L, ts(10, 55), 2L, "click", 2.5),
      (3L, ts(11, 0), 1L, "view", 4.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.hourlyRollup(df).orderBy("hour_ts", "event_type").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(0).getAs[Double]("sum_value") == 4.0)
    assert(out(0).getAs[Long]("n_users") == 2L)
  }

  test("hourlyRollup handles raw INT64 nanos with exact integral math") {
    val h10 = ts(10, 0).getTime / 1000 * 1000000000L
    val df = Seq(
      (1L, h10 + 5L * 60 * 1000000000L, 1L, "click", 1.0),
      (2L, h10 + 59L * 60 * 1000000000L, 2L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.hourlyRollup(df).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("hour_ts") == h10 / 1000000000L)
  }

  test("joinAsOf attaches the latest preceding state, inclusive at ties") {
    import spark.implicits._
    val probe = Seq(
      (1L, 10L, 100L), // before any state -> nulls
      (2L, 10L, 200L), // exactly at state ts 200 -> inclusive
      (3L, 10L, 350L), // between states 200 and 400 -> 200
      (4L, 10L, 450L), // after 400 -> 400
      (5L, 99L, 500L)  // keyed user with no state at all
    ).toDF("event_id", "user_id", "ts")
    val state = Seq(
      (10L, 200L, 2.5), (10L, 400L, 4.5)
    ).toDF("user_id", "ts", "value")
    val out = Events.joinAsOf(probe, state, "user_id", "ts", Seq("value"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(out(0) == ((1L, None, None)))
    assert(out(1) == ((2L, Some(200L), Some(2.5))))
    assert(out(2) == ((3L, Some(200L), Some(2.5))))
    assert(out(3) == ((4L, Some(400L), Some(4.5))))
    assert(out(4) == ((5L, None, None)))
  }

  test("trailingActivity counts same-user events in the inclusive trailing window") {
    import spark.implicits._
    val ev = Seq(
      (1L, 7L, 100L, 1.0),
      (2L, 7L, 150L, 2.0),  // within 100 of t=100
      (3L, 7L, 300L, 4.0),  // window [200,300] -> only itself
      (4L, 8L, 150L, 8.0)   // other user
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Events.trailingActivity(ev, 100L).orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("trailing_events"),
        r.getAs[Double]("trailing_value")))
    assert(out.toSeq == Seq((1L, 1L, 1.0), (2L, 2L, 3.0), (3L, 1L, 4.0),
      (4L, 1L, 8.0)))
  }

  test("rangeJoin pairs probes with containing intervals, once each, no cross product") {
    import spark.implicits._
    val probe = Seq(
      (10L, 5L), (10L, 15L), (10L, 25L), // user 10 at t=5,15,25
      (20L, 15L)                          // other user, same time
    ).toDF("user_id", "ts")
    val intervals = Seq(
      (1L, 10L, 0L, 20L),   // user 10, [0,20] spans 3 cells at bucket 10
      (2L, 10L, 14L, 16L),  // user 10, [14,16] within one cell
      (3L, 20L, 0L, 9L)     // user 20, misses its probe at t=15
    ).toDF("interval_id", "user_id", "start_ts", "end_ts")
    val joined = Events.rangeJoin(probe, intervals, Seq("user_id"), 10L)
    assertNoCrossProduct(joined, "rangeJoin")
    val pairs = joined.select("interval_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pairs.toSeq == Seq((1L, 5L), (1L, 15L), (2L, 15L)),
      s"each containment exactly once, got ${pairs.toSeq}")
  }

  test("sessionize splits on the inactivity gap") {
    val df = Seq(
      (1L, ts(9, 0), 7L, "c", 0.0),
      (2L, ts(9, 10), 7L, "c", 0.0),
      (3L, ts(12, 0), 7L, "c", 0.0),
      (4L, ts(9, 5), 8L, "c", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.sessionize(df, gapSeconds = 1800)
      .orderBy("user_id", "session_idx").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2L) // user 7 session 1
    assert(out(1).getAs[Long]("n_events") == 1L) // user 7 session 2
    assert(out(2).getAs[Long]("user_id") == 8L)
  }

  test("funnel requires strictly ordered step times per user") {
    val ev = Seq(
      // user 1 completes a->b->c in order
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      // user 2 did b BEFORE its first a: reaches a only
      (2L, "b", 5L), (2L, "a", 10L),
      // user 3 reaches a and b; its c ties b's timestamp (not strictly after)
      (3L, "a", 1L), (3L, "b", 2L), (3L, "c", 2L)
    ).toDF("user_id", "event_type", "ts")
    val out = Events.funnel(ev, Seq("a", "b", "c")).orderBy("step_idx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "a", 3L), (2L, "b", 2L), (3L, "c", 1L)))
  }

  test("retention buckets by first-activity day and counts later days") {
    val ev = Seq(
      (1L, 100L), (1L, 100L), (1L, 102L), // cohort 100, offsets 0 and 2
      (2L, 100L), (2L, 101L),             // cohort 100, offsets 0 and 1
      (3L, 101L)                          // cohort 101, offset 0
    ).toDF("user_id", "day")
    val out = Events.retention(ev).orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (100L, 0L, 2L), (100L, 1L, 1L), (100L, 2L, 1L), (101L, 0L, 1L)))
  }

  test("anomalies flags only values beyond n sigma, in pure integer math") {
    // group: nine 10.00s and one 50.00 -> mean 14, sigma 12 -> 50 is the
    // only value with |v-mu| = 36 > 2*12
    val rows = (1L to 9L).map(i => (i, 1L, "t", 10.0)) :+ (10L, 1L, "t", 50.0)
    val ev = rows.toDF("event_id", "user_id", "event_type", "value")
    val out = Events.anomalies(ev, nSigma = 2).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L))
    assert(out(0).getAs[Long]("v100") == 5000L)
    assert(out(0).getAs[Long]("group_n") == 10L)
    // groups below the minimum size never flag
    val tiny = Seq((1L, 2L, "t", 1.0), (2L, 2L, "t", 99.0))
      .toDF("event_id", "user_id", "event_type", "value")
    assert(Events.anomalies(tiny).count() == 0L)
  }

  test("pivotDaily widens event types to count columns, zero-filled") {
    // day 0 has clicks+view, day 1 only purchase -> other cells are 0
    val us = 86400000000L
    val ev = Seq((0L * us, "click"), (1L, "click"), (2L, "view"),
      (1L * us + 5L, "purchase")).map { case (t, e) => (t * 1000L, e) }
      .toDF("ts", "event_type")
    val out = Events.pivotDaily(ev, Seq("click", "purchase", "view"))
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 2L, 0L, 1L), (1L, 0L, 1L, 0L)))
  }

  test("interarrival computes per-user gaps with null-first semantics") {
    val ev = Seq((1L, 7L, 100L), (2L, 7L, 250L), (3L, 8L, 10L))
      .toDF("event_id", "user_id", "ts")
    val out = Events.interarrival(ev).orderBy("event_id").collect()
    assert(out.map(_.getAs[Long]("seq_idx")).toSeq == Seq(0L, 1L, 0L))
    assert(out(0).isNullAt(out(0).fieldIndex("gap_us")))
    assert(out(1).getAs[Long]("gap_us") == 150L)
    assert(out(2).isNullAt(out(2).fieldIndex("gap_us")))
  }

  test("gapFillDaily zero-fills missing days and carries the running total") {
    // user 1 active on days 10 and 13 -> grid must cover 11 and 12 with
    // zero events while the cumulative sum carries through the gap
    val ev = Seq((1L, 10L, 2.5), (1L, 10L, 1.5), (1L, 13L, 3.0),
      (2L, 5L, 1.0)).toDF("user_id", "day", "value")
    val out = Events.gapFillDaily(ev).orderBy("user_id", "day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("day_value"), r.getAs[Double]("cum_value")))
    assert(out.toSeq == Seq(
      (1L, 10L, 2L, 4.0, 4.0),
      (1L, 11L, 0L, 0.0, 4.0),
      (1L, 12L, 0L, 0.0, 4.0),
      (1L, 13L, 1L, 3.0, 7.0),
      (2L, 5L, 1L, 1.0, 1.0)))
  }

  test("runs collapses consecutive same-type events per user") {
    val ev = Seq(
      (1L, 1L, 0L, "view"), (2L, 1L, 1L, "view"), (3L, 1L, 2L, "click"),
      (4L, 1L, 3L, "view"),
      (5L, 2L, 9L, "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.runs(ev).orderBy("user_id", "run_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 0L, "view", 2L, 0L, 1L),
      (1L, 1L, "click", 1L, 2L, 2L),
      (1L, 2L, "view", 1L, 3L, 3L),
      (2L, 0L, "click", 1L, 9L, 9L)))
  }

  test("transitionMatrix counts consecutive pairs with exact conditionals") {
    val ev = Seq(
      (1L, 1L, 0L, "view"), (2L, 1L, 1L, "view"), (3L, 1L, 2L, "click"),
      (4L, 2L, 0L, "view"), (5L, 2L, 1L, "click"),
      (6L, 3L, 0L, "view")  // single event: no transition
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.transitionMatrix(ev)
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // from view: view->view once, view->click twice
    assert(out.toSeq == Seq(
      ("view", "click", 2L, 3L, 2.0 / 3.0),
      ("view", "view", 1L, 3L, 1.0 / 3.0)))
  }

  test("rollingActiveUsers counts trailing-window distinct users per active day") {
    val ev = Seq(
      (1L, 0L), (2L, 0L),   // day 0: users 1,2
      (1L, 1L),             // day 1: user 1 again
      (3L, 9L)              // day 9: far gap — day 0/1 users expired
    ).toDF("user_id", "day")
    val out = Events.rollingActiveUsers(ev, windowDays = 3).orderBy("day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // day 0: {1,2}; day 1: {1,2} (day-0 users still in window); day 9: {3}
    assert(out.toSeq == Seq((0L, 2L), (1L, 2L), (9L, 1L)))
  }

  test("twap weights values by holding duration; single-event users drop") {
    val ev = Seq(
      (1L, 1L, 0L, 10.0),  // held 2us
      (2L, 1L, 2L, 20.0),  // held 4us
      (3L, 1L, 6L, 30.0),  // last event: no span, contributes nothing
      (4L, 2L, 5L, 99.0)   // single event: user dropped
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Events.twap(ev).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(0) == 1L)
    assert(r.getAs[Long]("n_segments") == 2L)
    assert(r.getAs[Long]("span_us") == 6L)
    // (10*2 + 20*4) / 6
    assert(r.getAs[Double]("twap") == 100.0 / 6.0)
  }

  test("abTest splits by md5 parity and computes the exact z-score") {
    // users 1..40; conversion = a 'purchase' event for that user
    val ev = (1L to 40L).flatMap { u =>
      val base = Seq((u, "view"))
      if (u % 4 == 0) base :+ (u, "purchase") else base
    }.toDF("user_id", "event_type")
    val r = Events.abTest(ev,
      org.apache.spark.sql.functions.col("event_type") === "purchase").collect()(0)
    val (na, ca, nb, cb) = (r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("conv_b"))
    assert(na + nb == 40L, "every user lands in exactly one variant")
    assert(ca + cb == 10L, "conversions must be counted once per user")
    // recompute the z-score the same way and demand bit equality
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val p = (ca + cb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(r.getAs[Double]("z_score") == z)
    // variant assignment is the md5 recipe, not arbitrary
    val md = java.security.MessageDigest.getInstance("MD5")
    val aCount = (1L to 40L).count { u =>
      ((md.digest(u.toString.getBytes("UTF-8"))(0) >> 4) & 0xf) < 8
    }
    assert(na == aCount, "A-variant size must match the md5 recipe")
  }

  test("frequencyCapAudit counts capped users and suppressed excess") {
    val day = 86400000000L
    // day 0: u1 sends 3 (cap 2 -> 1 suppressed), u2 sends 2 (at cap);
    // day 1: u1 sends 1
    val ev = (Seq.fill(3)(1L) ++ Seq.fill(2)(2L)).zipWithIndex.map {
      case (u, i) => (u, i.toLong)
    } :+ ((1L, day))
    val r = Events.frequencyCapAudit(
      ev.toDF("user_id", "ts"), cap = 2L).orderBy("day").collect()
    assert(r.length == 2)
    assert((r(0).getAs[Long]("active_users"),
      r(0).getAs[Long]("capped_users"),
      r(0).getAs[Long]("suppressed_events"),
      r(0).getAs[Long]("suppressed_ppm")) == ((2L, 1L, 1L, 200000L)))
    assert((r(1).getAs[Long]("active_users"),
      r(1).getAs[Long]("capped_users")) == ((1L, 0L)))
  }

  test("seqTriples mines consecutive length-3 patterns with support") {
    // user 1: a b c a b c -> triples abc, bca, cab, abc; support 2
    // keeps only a->b->c
    val ev = Seq("a", "b", "c", "a", "b", "c").zipWithIndex.map {
      case (t, i) => (1L, (i + 1).toLong, i.toLong * 1000L, t)
    }.toDF("user_id", "event_id", "ts", "event_type")
    val out = Events.seqTriples(ev, minSupport = 2L, topK = 5).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Long]("rank"), r.getAs[String]("t1"),
      r.getAs[String]("t2"), r.getAs[String]("t3"),
      r.getAs[Long]("n")) == ((1L, "a", "b", "c", 2L)))
  }

  test("mahalanobisOutliers: exact adjugate scores and degenerate guard") {
    // features (count, floor-value sum): u1 (1,1), u2 (2,2), u3 (3,3),
    // u4 (2,1). n=4, S = [[8,8],[8,11]], det 24; hand scores:
    // u4 72e6/24=3000000, u1=u3 56e6/24=2333333 (tie -> user asc),
    // u2 8e6/24=333333 — u4 tops despite both features being moderate:
    // it breaks the corpus correlation (the card's whole point)
    val ev = Seq(
      (1L, 1.0),
      (2L, 1.0), (2L, 1.0),
      (3L, 1.0), (3L, 1.0), (3L, 1.0),
      (4L, 1.0), (4L, 0.3)
    ).toDF("user_id", "value")
    val out = Events.mahalanobisOutliers(ev, topK = 5).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("md2_ppm")))
    assert(out.toSeq == Seq((4L, 3000000L), (1L, 2333333L),
      (3L, 2333333L), (2L, 333333L)))
    // perfectly collinear features -> det 0 -> NULL scores, no error
    val lin = Seq((1L, 1.0), (2L, 1.0), (2L, 1.0),
      (3L, 1.0), (3L, 1.0), (3L, 1.0)).toDF("user_id", "value")
    val nulls = Events.mahalanobisOutliers(lin, topK = 5).collect()
    assert(nulls.length == 3 && nulls.forall(_.isNullAt(3)))
  }

  test("permutationTest: perfect signal earns the minimal add-one p") {
    // conversion == observed variant-A membership (computed with the
    // same md5 recipe) -> |t_obs| is the maximum n_a*n_b; no random
    // relabel of 40 users reproduces perfect correlation, so
    // n_extreme stays ~0 and p sits at the add-one floor
    val md = java.security.MessageDigest.getInstance("MD5")
    val varA = (1L to 40L).filter { u =>
      ((md.digest(u.toString.getBytes("UTF-8"))(0) >> 4) & 0xf) < 8
    }.toSet
    val ev = (1L to 40L).map { u =>
      (u, if (varA(u)) "purchase" else "view", 200.0)
    }.toDF("user_id", "event_type", "value")
    val r = Events.permutationTest(ev,
      org.apache.spark.sql.functions.col("event_type") === "purchase" &&
        org.apache.spark.sql.functions.col("value") > 180,
      reps = 99).collect().head
    assert(r.getAs[Long]("n_a") == varA.size.toLong)
    assert(r.getAs[Long]("conv_a") == varA.size.toLong)
    assert(r.getAs[Long]("conv_b") == 0L)
    assert(r.getAs[Long]("t_obs") ==
      varA.size.toLong * (40L - varA.size.toLong))
    val p = r.getAs[Long]("p_ppm")
    assert(p == 1000000L * (r.getAs[Long]("n_extreme") + 1L) / 100L,
      "add-one identity")
    assert(p <= 100000L, s"perfect signal must be extreme: p=$p")
  }

  test("ewma folds the integer recurrence in timestamp order") {
    // user 1: values 1.00 then 9.00 -> x = 100e6 then 900e6;
    // s = 100e6 + (900e6 - 100e6)/8 = 200e6 -> ewma 2.0
    // user 2: single event keeps its own value
    val ev = Seq((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 9.0),
      (2L, 10L, 3L, 5.0)).toDF("user_id", "ts", "event_id", "value")
    val r = Events.ewma(ev, k = 3).orderBy("user_id").collect()
    assert(r(0).getAs[Long]("n_events") == 2L)
    assert(r(0).getAs[Long]("ewma_scaled") == 200000000L)
    assert(r(0).getAs[Double]("ewma") == 2.0)
    assert(r(1).getAs[Long]("ewma_scaled") == 500000000L)
    // order matters: swapping arrival order changes the fold
    val swapped = Seq((1L, 10L, 1L, 9.0), (1L, 20L, 2L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val s = Events.ewma(swapped, k = 3).collect()(0)
    assert(s.getAs[Long]("ewma_scaled") == 800000000L) // 9 -> step toward 1
  }

  test("ewma truncates negative deltas toward zero like the oracle") {
    // delta = -1 cent scaled: (-1000000)/8 = -125000 exactly; then a
    // non-divisible delta: s=99875000, x=0 -> (0-s)/8 = -12484375
    val ev = Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 0.99), (1L, 3L, 3L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Events.ewma(ev, k = 3).collect()(0)
    assert(r.getAs[Long]("ewma_scaled") == 100000000L - 125000L - 12484375L)
  }

  test("dailyTopK keeps k types per day with deterministic ties") {
    val ev = (Seq.fill(5)(("a", 1L)) ++ Seq.fill(3)(("b", 1L)) ++
      Seq.fill(3)(("c", 1L)) ++ Seq.fill(1)(("d", 1L)) ++
      Seq.fill(2)(("x", 2L))).map(p => (p._2, p._1))
      .toDF("day", "event_type")
    val r = Events.dailyTopK(ev, k = 3).orderBy("day", "rank").collect()
      .map(x => (x.getAs[Long]("day"), x.getAs[String]("event_type"),
        x.getAs[Long]("n"), x.getAs[Long]("rank"))).toSeq
    // day 1: a(5) then the b/c tie broken alphabetically; d cut at k=3
    assert(r == Seq((1L, "a", 5L, 1L), (1L, "b", 3L, 2L), (1L, "c", 3L, 3L),
      (2L, "x", 2L, 1L)))
  }

  test("trendSlope recovers an exact linear ramp and nulls single-day types") {
    // type 'up': y = 3 + 2x on days 10..14; type 'one': single day
    val ev = (0 until 5).flatMap { x =>
      Seq.fill(3 + 2 * x)(("up", 10L + x))
    } ++ Seq(("one", 5L), ("one", 5L))
    val out = Events.trendSlope(ev.toDF("event_type", "day"))
      .orderBy("event_type").collect()
    val one = out(0)
    assert(one.getAs[String]("event_type") == "one")
    assert(one.isNullAt(one.fieldIndex("slope")) &&
      one.isNullAt(one.fieldIndex("intercept")))
    val up = out(1)
    assert(up.getAs[Long]("n_days") == 5L && up.getAs[Long]("n_events") == 35L)
    assert(up.getAs[Double]("slope") == 2.0)
    assert(up.getAs[Double]("intercept") == 3.0)
  }

  test("attribution credits first/last/linear within the lookback only") {
    // user 1: click@10, view@20, click@30, purchase@40 (conv 100)
    //         -> first = click@10, last = click@30, 3 touches
    // user 1: purchase@15 (conv 101) -> only click@10 in window: 1 touch
    // user 2: view@5 then purchase@1000 with lookback 100 -> no touches
    val ev = Seq(
      (1L, 1L, 10L, "click"), (2L, 1L, 20L, "view"), (3L, 1L, 30L, "click"),
      (100L, 1L, 40L, "purchase"), (101L, 1L, 15L, "purchase"),
      (4L, 2L, 5L, "view"), (102L, 2L, 1000L, "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.attribution(ev, lookbackUs = 100L)
      .orderBy("touch_type").collect()
    assert(out.length == 2)
    val click = out(0)
    assert(click.getAs[String]("touch_type") == "click")
    assert(click.getAs[Long]("n_pairs") == 3L)     // 2 for conv100 + 1 for conv101
    assert(click.getAs[Long]("n_convs") == 2L)
    assert(click.getAs[Long]("first_touch_wins") == 2L)
    assert(click.getAs[Long]("last_touch_wins") == 2L)
    // conv100: two clicks at 333333 each; conv101: one click at 1000000
    assert(click.getAs[Long]("linear_credit_ppm") == 2L * 333333L + 1000000L)
    val view = out(1)
    assert(view.getAs[Long]("n_pairs") == 1L)
    assert(view.getAs[Long]("first_touch_wins") == 0L)
    assert(view.getAs[Long]("last_touch_wins") == 0L)
    assert(view.getAs[Long]("linear_credit_ppm") == 333333L)
  }

  test("ohlcBars elects open/close by time and tracks high/low exactly") {
    val day = 86400000000L
    val ev = Seq(
      (1L, 1L, day + 30L, 5.00),  // first -> open 500
      (2L, 1L, day + 10L, 9.00),  // wait, earlier: THIS is open
      (3L, 1L, day + 50L, 1.00),  // low 100
      (4L, 1L, day + 99L, 7.00),  // last -> close 700
      (5L, 2L, day + 1L, 2.00))
      .toDF("event_id", "user_id", "ts", "value")
    val out = Events.ohlcBars(ev).orderBy("user_id").collect()
    val u1 = out(0)
    assert(u1.getAs[Long]("day") == 1L && u1.getAs[Long]("n_events") == 4L)
    assert(u1.getAs[Long]("open_c") == 900L)   // value at earliest ts
    assert(u1.getAs[Long]("high_c") == 900L)
    assert(u1.getAs[Long]("low_c") == 100L)
    assert(u1.getAs[Long]("close_c") == 700L)
    assert(u1.getAs[Long]("sum_c") == 2200L)
    assert(out(1).getAs[Long]("open_c") == 200L)
    assert(out(1).getAs[Long]("close_c") == 200L)
  }

  test("changePoint locates the level shift in the deviation walk") {
    // type 'a': 5 days at 10 then 5 days at 30 -> mean 20/day; the
    // cumulative deviation peaks at the last low day (day 5)
    val ev = ((1 to 5).flatMap(d => Seq.fill(10)(("a", d.toLong))) ++
      (6 to 10).flatMap(d => Seq.fill(30)(("a", d.toLong))))
      .toDF("event_type", "day")
    val r = Events.changePoint(ev).collect()(0)
    assert(r.getAs[Long]("change_day") == 5L)
    // S_5 = 5*(10*10 - 200) = -500; peak_abs = 500
    assert(r.getAs[Long]("peak_dev") == -500L)
    assert(r.getAs[Long]("peak_abs_dev") == 500L)
    assert(r.getAs[Long]("n_days") == 10L && r.getAs[Long]("n_events") == 200L)
  }

  test("conversionLatency measures first-to-first gaps, ignoring earlier buys") {
    // user 1: signup@100, purchase@50 (BEFORE signup - ignored),
    //         purchase@300 -> lat 200
    // user 2: signup@10, purchase@110 and @500 -> first after = 100
    // user 3: signup@10, never purchases -> started, not converted
    val ev = Seq(
      (1L, 100L, "signup"), (1L, 50L, "purchase"), (1L, 300L, "purchase"),
      (2L, 10L, "signup"), (2L, 110L, "purchase"), (2L, 500L, "purchase"),
      (3L, 10L, "signup"), (4L, 99L, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = Events.conversionLatency(ev).collect()(0)
    assert(r.getAs[Long]("n_started") == 3L)   // user 4 never signed up
    assert(r.getAs[Long]("n_converted") == 2L)
    assert(r.getAs[Long]("min_us") == 100L && r.getAs[Long]("max_us") == 200L)
    assert(r.getAs[Long]("p50_x2_us") == 300L) // median of {100,200} = 150
    assert(r.getAs[Long]("sum_us") == 300L && r.getAs[Long]("mean_us") == 150L)
  }

  test("burstDays flags only the spike day via the integer Poisson test") {
    // type 'a': nine quiet days at 10, one day at 100
    val ev = ((1 to 9).flatMap(d => Seq.fill(10)(("a", d.toLong))) ++
      Seq.fill(100)(("a", 10L)) ++
      Seq.fill(5)(("b", 1L))).toDF("event_type", "day")
    val r = Events.burstDays(ev, k = 3).collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("event_type") == "a" &&
      r(0).getAs[Long]("day") == 10L)
    assert(r(0).getAs[Long]("x") == 100L && r(0).getAs[Long]("d") == 10L &&
      r(0).getAs[Long]("s") == 190L)
    // quiet days sit below the mean (dev < 0): never flagged, and the
    // single-day type 'b' has dev = 0 -> not flagged
  }

  test("rfm bins users by quantile with deterministic ties") {
    val day = 86400000000L
    // 5 users: recency 0..4 days (user 5 most recent), frequency and
    // monetary increasing with user_id
    val ev = (1 to 5).flatMap { u =>
      (1 to u).map(i => (u.toLong, (10L - u) * day + i, u * 1.0))
    }.toDF("user_id", "ts", "value")
    val r = Events.rfm(ev, nBins = 5).orderBy("user_id").collect()
    // user 1 has the latest event (day 9) -> recency 0 -> r_bin 1;
    // user 5's last event sits ~4 days earlier -> recency 3 -> r_bin 5
    assert(r(0).getAs[Long]("recency_days") == 0L)
    assert(r(0).getAs[Long]("r_bin") == 1L)
    assert(r(4).getAs[Long]("recency_days") == 3L)
    assert(r(4).getAs[Long]("r_bin") == 5L)
    // frequency/monetary rise with user_id -> bins follow exactly
    assert(r.map(_.getAs[Long]("f_bin")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(r.map(_.getAs[Long]("m_bin")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(r(2).getAs[String]("segment") == "3-3-3")
  }

  test("covisitation pairs types within sessions and computes exact lift") {
    val gap = 1800L * 1000000L
    // user 1 session A: a+b; user 1 session B (after gap): a only;
    // user 2 session C: a+b -> N=3, c_a=3, c_b=2, c_ab=2
    val ev = Seq(
      (1L, 0L, "a"), (1L, 1000L, "b"),
      (1L, gap * 2, "a"),
      (2L, 0L, "a"), (2L, 500L, "b"))
      .toDF("user_id", "ts", "event_type")
    val r = Events.covisitation(ev).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[String]("type_a") == "a" &&
      row.getAs[String]("type_b") == "b")
    assert(row.getAs[Long]("n_sessions") == 3L)
    assert(row.getAs[Long]("c_a") == 3L && row.getAs[Long]("c_b") == 2L)
    assert(row.getAs[Long]("c_ab") == 2L)
    // lift = 1e6 * 3 * 2 div (3 * 2) = 1e6 exactly (independence)
    assert(row.getAs[Long]("lift_ppm") == 1000000L)
  }

  test("madOutliers flags the heavy tail the z-score misses") {
    // 9 values at 10.00 +- 0.02 and one at 500.00: the outlier inflates
    // mean/sigma (z-score at 2 sigma still flags it, but a SECOND large
    // value would mask it); MAD stays ~2 cents so 500 flags decisively
    val vals = Seq(10.00, 10.01, 9.99, 10.02, 9.98, 10.00, 10.01, 9.99,
      10.00, 500.00)
    val ev = vals.zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
      .toDF("event_id", "event_type", "value")
    val out = Events.madOutliers(ev, k = 3).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("event_id") == 9L)
    assert(out(0).getAs[Long]("med2") == 2000L)   // median 10.00 -> v100 1000
    // dev2 for the others: <= 2*2 = 4; mad4 = 4*MAD = 2*median(dev2)
    // dev2 values: 0,2,2,4,4,0,2,2,0,98000 -> sorted median = 2 -> mad4 = 4
    assert(out(0).getAs[Long]("mad4") == 4L)
  }

  test("madOutliers is exact when the median interpolates on a half") {
    // even n with distinct middles: median of (100, 200, 300, 400) = 250
    // -> med2 = 500 exactly, no float drift
    val ev = Seq((1L, "t", 1.00), (2L, "t", 2.00), (3L, "t", 3.00),
      (4L, "t", 4.00)).toDF("event_id", "event_type", "value")
    val dev = Events.madOutliers(ev, k = 100).collect() // k huge: no flags
    assert(dev.isEmpty)
    val med = Events.madOutliers(ev, k = 0).collect()   // k=0: all nonzero dev
    assert(med.length == 4 && med.forall(_.getAs[Long]("med2") == 500L))
  }

  test("debounceBursts collapses rapid-fire chains to leader + size/span") {
    import spark.implicits._
    // user 1 / type a: 0s,100s,250s chain (gaps <= 300) then 900s alone;
    // type b and user 2 each their own burst
    val ev = Seq(
      (10L, 1L, "a", 0L), (11L, 1L, "a", 100L), (12L, 1L, "a", 250L),
      (13L, 1L, "a", 900L), (20L, 1L, "b", 0L), (30L, 2L, "a", 0L))
      .map { case (id, u, t, secs) => (id, u, t, secs * 1000000000L) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.debounceBursts(ev, 300L).collect()
      .map(x => ((x.getAs[Long]("user_id"), x.getAs[String]("event_type"),
        x.getAs[Long]("burst_idx")),
        (x.getAs[Long]("leader_event_id"), x.getAs[Long]("n_events"),
          x.getAs[Long]("span_secs")))).toMap
    assert(r.size == 4)
    assert(r((1L, "a", 1L)) == ((10L, 3L, 250L)))
    assert(r((1L, "a", 2L)) == ((13L, 1L, 0L)))
    assert(r((1L, "b", 1L)) == ((20L, 1L, 0L)))
    assert(r((2L, "a", 1L)) == ((30L, 1L, 0L)))
  }

  test("seasonalNaiveBacktest: planted weekly cycle scores MAE 0") {
    import spark.implicits._
    // type a: 2 events every day 0..13 (perfect weekly repeat);
    // type b: 1 event day 0, 3 events day 7 (error |3-1| = 2)
    val a = for (d <- 0 until 14; i <- 0 until 2)
      yield (d * 100L + i, 1L, "a", (d * 86400L + i) * 1000000000L)
    val b = Seq((9000L, 2L, "b", 0L)) ++
      (0 until 3).map(i => (9100L + i, 2L, "b", (7L * 86400L + i) * 1000000000L))
    val ev = (a ++ b).toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.seasonalNaiveBacktest(ev, 7).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("a").getAs[Long]("n_days_scored") == 7L)
    assert(r("a").getAs[Long]("mae_sum") == 0L)
    assert(r("a").getAs[Long]("bias_sum") == 0L)
    assert(r("a").getAs[Long]("mae_ppm") == 0L)
    assert(r("b").getAs[Long]("n_days_scored") == 1L)
    assert(r("b").getAs[Long]("mae_sum") == 2L)
    assert(r("b").getAs[Long]("bias_sum") == 2L)
    assert(r("b").getAs[Long]("actual_sum") == 3L)
    assert(r("b").getAs[Long]("mae_ppm") == 666666L)
  }

  test("freshness reports staleness vs the globally freshest source") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "a", 0L), (2L, 1L, "a", 172800L * 1000000000L),
      (3L, 2L, "b", 100000L * 1000000000L))
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.freshness(ev).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("a").getAs[Long]("last_secs") == 172800L)
    assert(r("a").getAs[Long]("staleness_secs") == 0L)
    assert(r("a").getAs[Long]("n_events") == 2L)
    assert(r("a").getAs[Long]("n_last_day") == 1L) // only the last event
    assert(r("b").getAs[Long]("staleness_secs") == 72800L)
    assert(r("b").getAs[Long]("n_last_day") == 1L)
  }

  test("sessionPaths mines ordered opening paths with pinned tie ranks") {
    import spark.implicits._
    // two "a>b" sessions, one "a>b>c>d>e" truncation case (7 events, only
    // first 5 types appear), one "b>a" (order matters)
    val rows = Seq(
      (1L, Seq("a", "b")), (2L, Seq("a", "b")),
      (3L, Seq("a", "b", "c", "d", "e", "f", "g")),
      (4L, Seq("b", "a")))
    val ev = rows.flatMap { case (u, types) =>
      types.zipWithIndex.map { case (t, i) =>
        (u * 100 + i, u, t, i.toLong * 1000000000L)
      }
    }.toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.sessionPaths(ev, gapSeconds = 1800L, maxSteps = 5,
      topK = 20).collect().sortBy(_.getAs[Long]("rank"))
    assert(r.map(_.getAs[String]("path")).toSeq ==
      Seq("a>b", "a>b>c>d>e", "b>a"))
    assert(r.map(_.getAs[Long]("n_sessions")).toSeq == Seq(2L, 1L, 1L))
  }

  test("hazardTable: churn/censor split and at-risk cumulative are exact") {
    import spark.implicits._
    // horizon = 10; censorDays = 3 -> censored iff last_day >= 8
    val ev = Seq(
      (1L, 0L), (1L, 4L),   // lifetime 4, churned
      (2L, 2L), (2L, 6L),   // lifetime 4, churned
      (3L, 0L), (3L, 10L),  // lifetime 10, censored
      (4L, 9L),             // lifetime 0, censored
      (5L, 1L), (5L, 3L)    // lifetime 2, churned
    ).toDF("user_id", "day")
    val out = Events.hazardTable(ev, censorDays = 3L)
      .orderBy("lifetime").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out === Seq(
      (0L, 5L, 0L, 1L, 0L),
      (2L, 4L, 1L, 0L, 250000L),
      (4L, 3L, 2L, 0L, 666666L),
      (10L, 1L, 0L, 1L, 0L)))
  }


  test("markovEval learns the argmax transition and scores it exactly") {
    import spark.implicits._
    // user 1: a->b, b->a, a->b ; user 2: a->c
    // from a: b twice, c once -> predict b; correct 2/3
    // from b: a once -> predict a; correct 1/1
    val ev = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "a"),
      (1L, 4L, 40L, "b"), (2L, 5L, 10L, "a"), (2L, 6L, 20L, "c")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Events.markovEval(ev).collect()
      .map(r => r.getAs[String]("prev_type") ->
        (r.getAs[String]("predicted"), r.getAs[Long]("n_correct"),
          r.getAs[Long]("n_total"), r.getAs[Long]("acc_ppm"))).toMap
    assert(out("a") === (("b", 2L, 3L, 666666L)))
    assert(out("b") === (("a", 1L, 1L, 1000000L)))
  }


  test("funnelWindowed: steps count only within the window, greedily") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", 0L), (1L, "b", 50L),     // converts: b within W=100
      (2L, "a", 0L), (2L, "b", 150L),    // b too late
      (3L, "a", 0L), (3L, "a", 200L), (3L, "b", 250L)
      // GREEDY: t1 = 0 (earliest a), b at 250 > 0+100 -> no conversion,
      // even though the later a at 200 would have matched
    ).toDF("user_id", "event_type", "ts")
    val out = Events.funnelWindowed(ev, Seq("a", "b"), windowSize = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(1L -> 3L, 2L -> 1L))
  }


  test("seasonalProfile computes exact independence lifts per (type, dow)") {
    import spark.implicits._
    val day = 86400000000000L // nanos
    // type A: 2 events day 0 (dow 3), 1 event day 1 (dow 4); type B: 1 on day 0
    val ev = Seq(
      (0L * day, "A"), (0L * day + 5L, "A"), (1L * day, "A"),
      (0L * day + 7L, "B")).toDF("ts", "event_type")
    val out = Events.seasonalProfile(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dow")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("lift_ppm"))).toMap
    // overall 4; type totals A=3, B=1; dow totals dow3=3, dow4=1
    assert(out === Map(
      ("A", 3L) -> (2L, 2L * 4L * 1000000L / (3L * 3L)),
      ("A", 4L) -> (1L, 1L * 4L * 1000000L / (3L * 1L)),
      ("B", 3L) -> (1L, 1L * 4L * 1000000L / (1L * 3L))))
  }

  test("welchTTest matches the hand-computed Welch statistic on the md5 split") {
    import org.apache.spark.sql.functions._
    // many users, deterministic values: recompute the same md5 split and
    // the Welch algebra in plain Scala, then require bit-equality
    val ev = (1L to 40L).map(u => (u, (u * 7 % 13).toDouble + u * 0.01))
      .toDF("user_id", "value")
    val got = Events.welchTTest(ev).collect().head
    val split = ev.select(
      when(expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 1)" +
        ", 16, 10) AS BIGINT)") < 8, "A").otherwise("B").as("v"),
      expr("CAST(floor(value * 100) AS BIGINT)").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def m(v: String) = {
      val xs = split.filter(_._1 == v).map(_._2)
      (xs.length.toDouble, xs.sum.toDouble, xs.map(x => x * x).sum.toDouble)
    }
    val (na, sa, ssa) = m("A"); val (nb, sb, ssb) = m("B")
    assert(na > 1 && nb > 1) // both variants populated at this n
    val va = (na * ssa - sa * sa) / (na * (na - 1.0))
    val vb = (nb * ssb - sb * sb) / (nb * (nb - 1.0))
    val sea = va / na; val seb = vb / nb
    val t = (sa / na - sb / nb) / math.sqrt(sea + seb)
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0))
    assert(got.getAs[Long]("n_a") == na.toLong)
    assert(got.getAs[Long]("n_b") == nb.toLong)
    assert(got.getAs[Double]("t_welch") == t)
    assert(got.getAs[Double]("df_welch") == df)
  }

  test("welchTTest returns NULL t/df when a variant has fewer than 2 rows") {
    val ev = Seq((1L, 5.0)).toDF("user_id", "value")
    val r = Events.welchTTest(ev).collect().head
    assert(r.isNullAt(r.fieldIndex("t_welch")))
    assert(r.isNullAt(r.fieldIndex("df_welch")))
  }

  test("decayedPopularity halves weight per day of age, capped") {
    val ev = Seq(("A", 0L), ("A", 0L), ("A", 1L), ("B", 1L), ("C", -30L))
      .toDF("event_type", "day")
    val out = Events.decayedPopularity(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // max day 1: A = 2*500000 (age 1) + 1*1000000 = 2000000
    assert(out("A") == ((3L, 2000000L)))
    assert(out("B") == ((1L, 1000000L)))
    // age 31 capped to 19 -> weight 1000000 div 2^19 = 1
    assert(out("C") == ((1L, 1L)))
  }

  test("dispersionCard computes exact VMR over the gap-filled grid") {
    val day = 86400000000000L // nanos
    // days 0,2,3 with counts 1,2,3; day 1 is a REAL zero via the grid:
    // x=[1,0,2,3], n=4, S1=6, S2=14 -> VMR = (4*14-36)/(3*6) = 10/9
    val ev = (Seq.fill(1)(0L) ++ Seq.fill(2)(2 * day) ++
      Seq.fill(3)(3 * day)).map(("a", _)).toDF("event_type", "ts")
    val r = Events.dispersionCard(ev).collect().head
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Long]("n_events") == 6L)
    assert(r.getAs[Long]("mean_e2") == 150L)
    assert(r.getAs[Long]("dispersion_ppm") == 1111111L)
  }

  test("olsTrend fits a perfect line exactly; degenerate span NULLs") {
    import spark.implicits._
    val day = 86400000000000L
    // type "a": daily counts 3,5,7,9 over days 0..3 — y = 2x + 3 exactly
    val a = for (d <- 0 to 3; i <- 0 until (2 * d + 3))
      yield (d * day + i, "a")
    // type "b": one day only — zero x-variance, everything NULL
    val b = Seq((0L + 1L, "b"), (0L + 2L, "b"))
    val out = Events.olsTrend((a ++ b).toDF("ts", "event_type"))
      .collect().map(r => r.getString(0) -> r).toMap
    val ra = out("a")
    assert(ra.getAs[Long]("n_days") == 4L)
    assert(ra.getAs[Long]("slope_ppm") == 2000000L)
    assert(ra.getAs[Long]("intercept_ppm") == 3000000L)
    assert(ra.getAs[Long]("r2_ppm") == 1000000L, "perfect fit r2 = 1")
    val rb = out("b")
    assert(rb.getAs[Long]("n_days") == 1L)
    assert(rb.isNullAt(rb.fieldIndex("slope_ppm")) &&
      rb.isNullAt(rb.fieldIndex("intercept_ppm")) &&
      rb.isNullAt(rb.fieldIndex("r2_ppm")),
      "one-day span surfaces NULLs, never a divide-by-zero")
  }

  test("flowSymmetry measures reciprocated transition mass exactly") {
    import spark.implicits._
    // user 1: A->B, B->A, A->B (reciprocated mass 1 on {A,B});
    // user 2: A->C only (strict funnel edge)
    val ev = Seq(
      (1L, 1L, 10L, "A"), (2L, 1L, 20L, "B"), (3L, 1L, 30L, "A"),
      (4L, 1L, 40L, "B"), (5L, 2L, 10L, "A"), (6L, 2L, 20L, "C"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.flowSymmetry(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_ab"), r.getAs[Long]("n_ba"),
          r.getAs[Long]("reciprocated"),
          r.getAs[Long]("reciprocity_ppm"))).toMap
    // 4 directed off-diagonal transitions, 2 reciprocated -> r = 1/2
    assert(out(("A", "B")) == ((2L, 1L, 1L, 500000L)))
    assert(out(("A", "C")) == ((1L, 0L, 0L, 500000L)))
  }

  test("kaplanMeier folds the exact survival product, censoring-aware") {
    import spark.implicits._
    // lifetimes: u1,u2 -> 0 (churned), u3 -> 1 (churned), u4 -> 2
    // (active at horizon -> censored under censorDays=1)
    val ev = Seq((1L, 0L), (2L, 0L), (3L, 0L), (3L, 1L),
      (4L, 0L), (4L, 1L), (4L, 2L)).toDF("user_id", "day")
    val out = Events.kaplanMeier(ev, censorDays = 1L)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("churned"),
          r.getAs[Long]("censored"), r.getAs[Long]("survival_ppm"))).toMap
    assert(out(0L) == ((4L, 2L, 0L, 500000L)))
    assert(out(1L) == ((2L, 1L, 0L, 250000L)))
    // the censored user contributes risk time but no death: S stays flat
    assert(out(2L) == ((1L, 0L, 1L, 250000L)))
  }

  test("upliftDeciles: planted treated-only conversions read 1e6 uplift") {
    import spark.implicits._
    val day = 86400000000000L
    def treated(u: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      ((h(0) >> 4) & 0xf) >= 8
    }
    val users = (1L to 40L).toSeq
    // pre-period activity = the score; post-period: ONLY treated users
    // make a high-value purchase
    val ev = users.map(u => (u, "view", 0L * day + u, u.toDouble)) ++
      users.filter(treated).map(u =>
        (u, "purchase", 10L * day + u, 500.0))
    val out = Events.upliftDeciles(
        ev.toDF("user_id", "event_type", "ts", "value"), deciles = 4)
      .collect()
    assert(out.length == 4)
    for (r <- out) {
      val up = Option(r.get(r.fieldIndex("uplift_ppm")))
        .map(_.asInstanceOf[Long])
      assert(up.forall(_ == 1000000L),
        s"decile ${r.getLong(0)}: planted uplift must be exactly 1e6, " +
          s"got $up")
    }
    val last = out.last
    assert(last.getAs[Long]("cum_uplift_ppm") == 1000000L)
  }

  test("joinAsOfForward picks the earliest state at or after the probe") {
    import spark.implicits._
    val probe = Seq((1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 20L),
      (4L, 2L, 1L)).toDF("event_id", "user_id", "ts")
    val state = Seq((1L, 10L, 100.0), (1L, 15L, 150.0))
      .toDF("user_id", "ts", "value")
    val out = Events.joinAsOfForward(probe, state, "user_id", "ts",
        Seq("value"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == ((Some(10L), Some(100.0))), "next state after t=5")
    assert(out(2L) == ((Some(10L), Some(100.0))),
      "equal-timestamp state matches (inclusive)")
    assert(out(3L) == ((None, None)), "no future state -> NULLs")
    assert(out(4L) == ((None, None)), "other user never leaks")
  }

  test("holtWintersForecast learns the weekly dip into its seasonal cell") {
    import spark.implicits._
    val day = 86400000000000L
    // 28 days of 8 events, dipping to 1 on every day ≡ 0 (mod 7);
    // grid row i (1-based) = d + 1, so slot (i−1) mod 7 == d mod 7
    val ev = for (d <- 0 until 28; i <- 0 until (if (d % 7 == 0) 1 else 8))
      yield (d * day + i, "a")
    val r = Events.holtWintersForecast(ev.toDF("ts", "event_type"))
      .collect().head
    assert(r.getAs[Long]("n_days") == 28L)
    val s = (0 until 7).map(k => r.getAs[Long](s"s${k}_e6"))
    assert(s(0) == s.min && s(0) < -1000000L,
      s"dip slot 0 must carry the most negative seasonal cell: $s")
    assert(s.tail.forall(_ > s(0)))
    // day 29 lands on the dip slot (28 % 7 == 0): the one-step forecast
    // must predict BELOW the level — the thing trend-only Holt cannot do
    assert(r.getAs[Long]("fc1_e6") < r.getAs[Long]("level_e6"))
  }

  test("crossCorrelation finds the planted lead at the right lag") {
    import spark.implicits._
    val day = 86400000000000L
    // A: counts 1,5,2,8,3 on days 0..4; B = A shifted +1 day (days 1..5)
    // with both series 0-padded over the joint span [0, 5]:
    //   A = 1,5,2,8,3,0 ; B = 0,1,5,2,8,3
    // lag +1 aligns a_t with b_{t+1} over the 5-day overlap — the
    // UNSHIFTED pairs — corr = +1 exactly; lag 0 pairs a_t with the
    // padded mixture and must be strictly smaller
    val counts = Seq(1, 5, 2, 8, 3)
    val ev =
      (for { (c, d) <- counts.zipWithIndex; i <- 0 until c }
        yield (d * day + i, "click")) ++
      (for { (c, d) <- counts.zipWithIndex; i <- 0 until c }
        yield ((d + 1) * day + i, "purchase"))
    val out = Events.crossCorrelation(ev.toDF("ts", "event_type"),
        "click", "purchase", maxLag = 2)
      .collect().map(r => r.getAs[Long]("lag") -> r).toMap
    assert(out.keySet == (-2L to 2L).toSet)
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_days") == 5L, "overlap shrinks by |lag|")
    assert(r1.getAs[Double]("corr") == 1.0, "shifted copy: exact +1")
    assert(out(0L).getAs[Double]("corr") < 1.0)
    assert(out(1L).getAs[Long]("n_a_events") == 19L)
  }

  test("theilSen picks the lower-median pairwise slope, sign-exact") {
    val day = 86400000000000L
    // up: counts 1,2,4 on days 0,1,2 -> slopes 1, 1.5, 2 -> median 3/2
    val up = (Seq.fill(1)(0L) ++ Seq.fill(2)(day) ++ Seq.fill(4)(2 * day))
      .map(("up", _))
    // down: counts 4,2,1 -> slopes -2, -1.5, -1 -> median -3/2
    val down = (Seq.fill(4)(0L) ++ Seq.fill(2)(day) ++ Seq.fill(1)(2 * day))
      .map(("down", _))
    val out = Events.theilSen((up ++ down).toDF("event_type", "ts"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("dy"),
          r.getAs[Long]("dx"), r.getAs[Long]("slope_ppm"))).toMap
    assert(out("up") == ((3L, 3L, 2L, 1500000L)))
    assert(out("down") == ((3L, -3L, 2L, -1500000L)))
  }

  test("simpsonCard reports exact concentration and effective users") {
    // user 1 x3 events, user 2 x1: lambda = (9+1)/16, eff = 16/10
    val ev = (Seq.fill(3)(1L) ++ Seq(2L)).map(u => ("a", u, 0L))
      .toDF("event_type", "user_id", "ts")
    val r = Events.simpsonCard(ev).collect().head
    assert(r.getAs[Long]("n_events") == 4L)
    assert(r.getAs[Long]("n_users") == 2L)
    assert(r.getAs[Long]("simpson_ppm") == 625000L)
    assert(r.getAs[Long]("eff_users_e2") == 160L)
  }

  test("holtForecast matches the hand-traced bit-shift recursion") {
    val day = 86400000000000L
    // daily counts 2, 4, 6: l = 2e6→3e6→4.75e6, t = 0→.5e6→1.125e6
    val ev = (Seq.fill(2)(0L) ++ Seq.fill(4)(1L) ++ Seq.fill(6)(2L))
      .zipWithIndex.map { case (d, i) => (i.toLong, 1L, "a", d * day + i) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.holtForecast(ev).collect().head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("level_e6") == 4750000L)
    assert(r.getAs[Long]("trend_e6") == 1125000L)
    assert(r.getAs[Long]("fc7_e6") == 4750000L + 7L * 1125000L)
  }

  test("holtForecast fills gap days with zeros and floors negatives") {
    val day = 86400000000000L
    // d0=5 events, d1 missing → 0, d2=1; reference fold with
    // Math.floorDiv proves the positive-offset halving IS floor division
    val ev = ((1 to 5).map(i => (i.toLong, 1L, "a", 0L * day + i)) ++
      Seq((9L, 1L, "a", 2L * day + 1)))
      .toDF("event_id", "user_id", "event_type", "ts")
    var l = 5000000L
    var t = 0L
    for (x <- Seq(0L, 1L)) {
      val lNew = Math.floorDiv(x * 1000000L + l + t, 2L)
      t = Math.floorDiv(t + lNew - l, 2L)
      l = lNew
    }
    assert(t < 0, "fixture must exercise a negative trend")
    val r = Events.holtForecast(ev).collect().head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("level_e6") == l)
    assert(r.getAs[Long]("trend_e6") == t)
  }

  test("cohortLtv builds the cumulative cents matrix per cohort") {
    val wk = 604800000000000L
    // user 1 joins week 0: spends 1.00 (w0), 2.00 (w1);
    // user 2 joins week 0: spends 4.00 (w0); user 3 joins week 1: 8.00
    val ev = Seq(
      (1L, 1L, 0L * wk + 1, 1.0), (2L, 1L, 1L * wk + 1, 2.0),
      (3L, 2L, 0L * wk + 2, 4.0), (4L, 3L, 1L * wk + 3, 8.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val r = Events.cohortLtv(ev).collect()
      .map(x => (x.getAs[Long]("cohort_week"), x.getAs[Long]("age_weeks")) ->
        (x.getAs[Long]("cohort_size"), x.getAs[Long]("n_active"),
          x.getAs[Long]("cum_rev_c"), x.getAs[Long]("ltv_per_user_e2")))
      .toMap
    assert(r((0L, 0L)) == ((2L, 2L, 500L, 250L)))
    assert(r((0L, 1L)) == ((2L, 1L, 700L, 350L)))
    assert(r((1L, 0L)) == ((1L, 1L, 800L, 800L)))
    assert(r.size == 3)
  }

  test("holtBacktest scores one-step errors before each update") {
    val day = 86400000000000L
    // counts 2, 4, 6: holt errs |4e6−2e6| + |6e6−3.5e6| = 4.5e6 → mae
    // 2.25e6; naive errs 2e6 + 2e6 = 4e6 → mae 2e6 → naive wins (the
    // α=½ lag loses to last-value on a clean linear ramp)
    val ev = (Seq.fill(2)(0L) ++ Seq.fill(4)(1L) ++ Seq.fill(6)(2L))
      .zipWithIndex.map { case (d, i) => (i.toLong, 1L, "a", d * day + i) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.holtBacktest(ev).collect().head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("mae_holt_e6") == 2250000L)
    assert(r.getAs[Long]("mae_naive_e6") == 2000000L)
    assert(r.getAs[String]("winner") == "naive")
  }

  test("seqRules counts users with A strictly before B") {
    // user 1: a@100, b@200 → only a→b; user 2: b@100, a@200, b@300 →
    // both directions (first(a)=200 < last(b)=300; first(b)=100 < 200)
    val ev = Seq(
      (1L, 1L, "a", 100L), (2L, 1L, "b", 200L),
      (3L, 2L, "b", 100L), (4L, 2L, "a", 200L), (5L, 2L, "b", 300L)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.seqRules(ev).collect()
      .map(x => (x.getAs[String]("a"), x.getAs[String]("b")) ->
        (x.getAs[Long]("support"), x.getAs[Long]("users_a"),
          x.getAs[Long]("confidence_ppm"))).toMap
    assert(r.size == 2)
    assert(r(("a", "b")) == ((2L, 2L, 1000000L)))
    assert(r(("b", "a")) == ((1L, 2L, 500000L)))
  }

  test("botCard: metronome user has VMR 0, bursty user does not") {
    // ts in ns; gaps computed in µs. user 1: gaps 10,10,10 µs → VMR 0;
    // user 2: gaps 10,40 → VMR (2·1700−2500)·1e6/(1·50) = 18e6;
    // user 3 has 2 events → filtered by minEvents=3
    val ev = Seq(
      (1L, 1L, "a", 0L), (2L, 1L, "a", 10000L),
      (3L, 1L, "b", 20000L), (4L, 1L, "a", 30000L),
      (5L, 2L, "a", 0L), (6L, 2L, "a", 10000L), (7L, 2L, "a", 50000L),
      (8L, 3L, "a", 0L), (9L, 3L, "a", 1000L)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val r = Events.botCard(ev).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("n_events"), x.getAs[Long]("n_types"),
          x.getAs[Long]("median_gap_us"), x.getAs[Long]("gap_vmr_ppm")))
      .toMap
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L) == ((4L, 2L, 10L, 0L)))
    assert(r(2L) == ((3L, 1L, 10L, 18000000L)))
  }

  test("markovAttribution credits the channel that feeds conversion") {
    // u1: click → purchase; u2: view → (no conversion).
    // chain: start→{click, view} ½ each; click→conv; view→null.
    // v(start) = 500000. Removing click: start→click redirects to null
    // → v = 0 → removal 1e6. Removing view changes nothing → 0.
    val ev = Seq(
      (1L, 1L, "click", 100L), (2L, 1L, "purchase", 200L),
      (3L, 2L, "view", 100L)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Events.markovAttribution(ev,
      channels = Seq("click", "view")).collect()
      .map(x => x.getAs[String]("channel") ->
        (x.getAs[Long]("v_full_ppm"), x.getAs[Long]("v_removed_ppm"),
          x.getAs[Long]("removal_ppm"))).toMap
    assert(out("click") == ((500000L, 0L, 1000000L)))
    assert(out("view") == ((500000L, 500000L, 0L)))
  }

  test("markovAttribution truncates journeys at the FIRST conversion") {
    // events after the first purchase must not mint transitions:
    // without truncation purchase→click would exist and click would
    // absorb credit it never earned
    val ev = Seq(
      (1L, 1L, "view", 100L), (2L, 1L, "purchase", 200L),
      (3L, 1L, "click", 300L), (4L, 1L, "purchase", 400L)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Events.markovAttribution(ev,
      channels = Seq("click", "view")).collect()
      .map(x => x.getAs[String]("channel") ->
        x.getAs[Long]("removal_ppm")).toMap
    assert(out("view") == 1000000L, "view is the only path to conv")
    assert(out("click") == 0L, "post-conversion click earns nothing")
  }

  test("shapleyAttribution: exact credits, efficiency, symmetry") {
    // journeys (user, day 0, us ts): u1 {click}→conv, u2 {view}→conv,
    // u3 {click,view}→conv, u4 {click} no conv.
    // v(0)=0 v({c})=1 v({v})=1 v({c,v})=3; c!=2:
    // φ_click·2 = (1-0)+(3-1)=3, φ_view·2 = (1-0)+(3-1)=3 — symmetric,
    // Σ = 2!·v(full) = 6, shares 500000 ppm each.
    val ev = Seq(
      (1L, "click", 10L), (1L, "purchase", 20L),
      (2L, "view", 10L), (2L, "purchase", 20L),
      (3L, "click", 10L), (3L, "view", 15L), (3L, "purchase", 20L),
      (4L, "click", 10L)
    ).toDF("user_id", "event_type", "ts")
    val out = Events.shapleyAttribution(ev,
      channels = Seq("click", "view")).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("phi_scaled"), r.getAs[Long]("phi_ppm"))).toMap
    assert(out("click") == ((3L, 500000L)))
    assert(out("view") == ((3L, 500000L)))
  }

  test("shapleyAttribution: asymmetric worth and per-day journeys") {
    // u1 day0 {click}→conv; u1 day1 {click,view}→conv (same user, two
    // journeys); u2 day0 {view} no conv.
    // v(0)=0 v({c})=1 v({v})=0 v({c,v})=2:
    // φ_click·2 = 1+2 = 3 (750000 ppm), φ_view·2 = 0+1 = 1 (250000).
    val day = 86400000000L
    val ev = Seq(
      (1L, "click", 10L), (1L, "purchase", 20L),
      (1L, "click", day + 10L), (1L, "view", day + 15L),
      (1L, "purchase", day + 20L),
      (2L, "view", 10L)
    ).toDF("user_id", "event_type", "ts")
    val out = Events.shapleyAttribution(ev,
      channels = Seq("click", "view")).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("phi_scaled"), r.getAs[Long]("phi_ppm"))).toMap
    assert(out("click") == ((3L, 750000L)))
    assert(out("view") == ((1L, 250000L)))
  }

  test("intervalCoverage merges overlaps and counts islands exactly") {
    // user 1 (ts ns, value s): [0,5s), [3s,8s) overlap → one island
    // [0,8s); [10s,11s) separate. covered 9s, span 11s.
    val ev = Seq(
      (1L, 1L, 0L, 5.0),
      (2L, 1L, 3L * 1000000000L, 5.0),
      (3L, 1L, 10L * 1000000000L, 1.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val r = Events.intervalCoverage(ev).collect().head
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Long]("n_islands") == 2L)
    assert(r.getAs[Long]("covered_us") == 9000000L)
    assert(r.getAs[Long]("span_us") == 11000000L)
    assert(r.getAs[Long]("utilization_ppm") == 1000000L * 9L / 11L)
  }

  test("intervalCoverage: touching endpoints merge (half-open meets)") {
    // [0,5s) then [5s,6s): start == running max end → NOT a new island
    // under the s > prev_max_e rule (adjacency counts as continuous)
    val ev = Seq((1L, 1L, 0L, 5.0), (2L, 1L, 5L * 1000000000L, 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val r = Events.intervalCoverage(ev).collect().head
    assert(r.getAs[Long]("n_islands") == 1L)
    assert(r.getAs[Long]("covered_us") == 6000000L)
  }

  test("seasonalAnomalies flags a planted spike, not the weekly pattern") {
    // 8 weeks of weekly traffic (dow 0 heavy) with mild deterministic
    // daily noise (keeps MAD > 0) + one spike day
    val day0 = 0L
    val rows = (0L until 56L).flatMap { d =>
      val base = (if (d % 7 == 0) 20 else 10) + ((d * 7919) % 3).toInt
      val n = if (d == 30L) base + 200 else base // spike on day 30
      (0 until n).map(i => (d * 1000 + i, 1L,
        (day0 + d) * 86400000000000L + i * 1000000L, 1.0))
    }.toDF("event_id", "user_id", "ts", "value")
    val r = Events.seasonalAnomalies(rows, 3).collect()
      .map(x => x.getAs[Long]("day") -> x.getAs[Boolean]("is_anomaly"))
      .toMap
    assert(r(30L), "the planted spike must be flagged")
    // the recurring dow-0 heavy days OUTSIDE the spike's ±3-day trend
    // window are SEASONAL, not anomalous (the spike leaks into the
    // centered moving average for days 27..33 — textbook STL behavior)
    assert(!r(14L) && !r(21L) && !r(35L) && !r(42L))
    r.filter(_._2).keys.foreach(d =>
      assert(d >= 27L && d <= 33L, s"flag outside the spike window: $d"))
  }

  test("croston folds z/p on demand days only, zero days skipped") {
    // type a: demands 2.00 on day 0, 4.00 on day 2, 1.00 on day 3;
    // a zero-value day 1 must not perturb the interval EWMA
    val ev = Seq(("a", 0L, 2.0), ("a", 1L, 0.0), ("a", 2L, 4.0),
      ("a", 3L, 1.0), ("b", 5L, 3.0))
      .toDF("event_type", "day", "value")
    val r = Events.croston(ev).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("n_demand_days"), x.getAs[Long]("z_e6"),
          x.getAs[Long]("p_e6"), x.getAs[Long]("forecast_ppm"))).toMap
    // a: z: 2e8 → (2e8+4e8)/2=3e8 → (3e8+1e8)/2=2e8
    //    p: 1e6 → (1e6+2e6)/2=1.5e6 → (1.5e6+1e6)/2=1.25e6
    assert(r("a") == ((3L, 200000000L, 1250000L, 160000000L)))
    // b: single demand initializes z, p = one day
    assert(r("b") == ((1L, 300000000L, 1000000L, 300000000L)))
  }

  test("stickiness: daily user scores 1e6, drive-by scores 1e6/days") {
    // period 0 (days 0..27): user 1 active days 0,1,2; user 2 only day 0
    val du = Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (1L, 1L))
      .toDF("user_id", "day")
    val r = Events.stickiness(du, 28).collect().head
    assert(r.getAs[Long]("period") == 0L)
    assert(r.getAs[Long]("active_days") == 3L)
    assert(r.getAs[Long]("mau") == 2L)
    assert(r.getAs[Long]("dau_sum") == 4L) // 2 + 1 + 1 (dup row deduped)
    // avgDAU/MAU = (4/3)/2 = 2/3
    assert(r.getAs[Long]("stickiness_ppm") == 666666L)
    // everyone active every day → exactly 1e6
    val full = Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L))
      .toDF("user_id", "day")
    assert(Events.stickiness(full, 28).collect().head
      .getAs[Long]("stickiness_ppm") == 1000000L)
  }

  test("rollingMedian: doubled median is exact for odd and even windows") {
    // one key, days 1..4 with a day-2 spike the median must shrug off
    val perDay = Seq(("k", 1L, 1L), ("k", 2L, 100L), ("k", 3L, 3L),
      ("k", 4L, 5L)).toDF("key", "day", "v")
    val out = Events.rollingMedian(perDay, 7).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3),
        r.getAs[Long]("mean_ppm"))).toMap
    assert(out(1L) == ((1L, 2L, 1000000L)))          // [1]
    assert(out(2L) == ((2L, 101L, 50500000L)))       // [1,100] → 1+100
    assert(out(3L) == ((3L, 6L, 34666666L)))         // [1,100,3] → 2·3
    assert(out(4L) == ((4L, 8L, 27250000L)),         // [1,100,3,5] → 3+5
      "the spike drags the mean but not the doubled median")
  }

  test("rollingMedian only emits window days present in the data") {
    val perDay = Seq(("k", 10L, 7L)).toDF("key", "day", "v")
    val out = Events.rollingMedian(perDay, 7).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L),
      "forward contribution must be cut to the active-day grid")
  }

  test("effectSizeCard agrees with welch in sign and applies the g shrink") {
    // deterministic many-user fixture; values differ by user parity so
    // the md5 arm split sees two non-degenerate distributions
    val ev = (1 to 200).map(u => (u.toLong, (u % 7 + u % 3).toDouble))
      .toDF("user_id", "value")
    val es = Events.effectSizeCard(ev).collect().head
    val w = Events.welchTTest(ev).collect().head
    assert(es.getLong(0) == w.getLong(0) && es.getLong(1) == w.getLong(1),
      "same arm split as welch")
    val d = es.getAs[Double]("cohen_d")
    val t = w.getAs[Double]("t_welch")
    assert(math.signum(d) == math.signum(t),
      "effect direction matches the t statistic")
    val n = es.getLong(0) + es.getLong(1)
    val g = es.getAs[Double]("hedges_g")
    assert(g == d * (1.0 - 3.0 / (4.0 * n - 9.0)))
    assert(math.abs(g) < math.abs(d), "the small-sample correction shrinks")
  }
}
