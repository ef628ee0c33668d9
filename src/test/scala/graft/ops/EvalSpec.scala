package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("aucExact matches the hand-counted pair fraction with ties") {
    // pos scores {2,3}, neg {1,2}: wins (2,1),(3,1),(3,2), tie (2,2)
    // → AUC = 3.5/4 = 0.875
    val df = Seq((1L, false), (2L, false), (2L, true), (3L, true))
      .toDF("score", "label")
    val r = Eval.aucExact(df).collect()(0)
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("n_scores") == 3L)
    assert(r.getAs[Long]("auc_ppm") == 875000L)
  }

  test("aucExact is 1e6 for a perfect ranking and 500000 for a coin flip") {
    val perfect = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("score", "label")
    assert(Eval.aucExact(perfect).collect()(0)
      .getAs[Long]("auc_ppm") == 1000000L)
    // all scores identical → every pair is a tie → exactly 1/2
    val flat = Seq((5L, false), (5L, true), (5L, false), (5L, true))
      .toDF("score", "label")
    assert(Eval.aucExact(flat).collect()(0)
      .getAs[Long]("auc_ppm") == 500000L)
  }

  test("confusionCard counts cells and ppm metrics exactly") {
    val df = Seq((1L, false), (2L, false), (2L, true), (3L, true))
      .toDF("score", "label")
    val r = Eval.confusionCard(df, 2L).collect()(0)
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("fp") == 1L)
    assert(r.getAs[Long]("fn") == 0L && r.getAs[Long]("tn") == 1L)
    assert(r.getAs[Long]("precision_ppm") == 666666L)
    assert(r.getAs[Long]("recall_ppm") == 1000000L)
    assert(r.getAs[Long]("f1_ppm") == 800000L)
    assert(r.getAs[Long]("accuracy_ppm") == 750000L)
    // threshold above every score → zero predicted positives → NULL
    // precision, zero recall (portably, never a divide-by-zero)
    val none = Eval.confusionCard(df, 99L).collect()(0)
    assert(none.isNullAt(none.fieldIndex("precision_ppm")))
    assert(none.getAs[Long]("recall_ppm") == 0L)
  }

  test("aucByGroup partitions per group and NULLs one-class groups") {
    val df = Seq(
      ("g1", 1L, false), ("g1", 2L, false), ("g1", 2L, true),
      ("g1", 3L, true),
      ("g2", 7L, true), ("g2", 9L, true)) // no negatives → NULL AUC
      .toDF("source", "score", "label")
    val r = Eval.aucByGroup(df, "source").collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("g1").getAs[Long]("auc_ppm") == 875000L)
    assert(r("g2").isNullAt(r("g2").fieldIndex("auc_ppm")))
  }

  test("calibrationCard bins exactly and reports exact per-bin rates") {
    val df = (0L to 9L).map(s => (s, s % 2 == 0)).toDF("score", "label")
    val r = Eval.calibrationCard(df, nBins = 2).collect()
      .map(x => x.getAs[Long]("bin") -> x).toMap
    assert(r(0L).getAs[Long]("n") == 5L)
    assert(r(0L).getAs[Long]("pos_rate_ppm") == 600000L) // 0,2,4 of 0..4
    assert(r(0L).getAs[Long]("mean_score") == 2L)
    assert(r(1L).getAs[Long]("pos_rate_ppm") == 400000L) // 6,8 of 5..9
    assert(r(1L).getAs[Long]("mean_score") == 7L)
    assert(r(0L).getAs[Long]("s_lo") == 0L &&
      r(1L).getAs[Long]("s_hi") == 9L)
  }

  test("skyline2d matches brute-force dominance incl. duplicate points") {
    val pts = Seq((1L, 1L, 5L), (2L, 2L, 3L), (3L, 3L, 3L), (4L, 3L, 8L),
      (5L, 5L, 1L), (6L, 5L, 1L)).toDF("pkey", "x", "y")
    // (3,3,3) and (3,8) dominated by (2,3); duplicates (5,1) both kept
    val got = Analytics.skyline2d(pts, "pkey", "x", "y", buckets = 2)
      .collect().map(_.getAs[Long]("pkey")).toSet
    assert(got == Set(1L, 2L, 5L, 6L))
    // brute-force cross-check on a pseudo-random cloud, tiny bucket
    // count to force cross-bucket pruning
    val cloud = (1L to 60L)
      .map(k => (k, (k * 7919L) % 40L, (k * 104729L) % 40L))
    val cdf = cloud.toDF("pkey", "x", "y")
    val expect = cloud.filter { case (_, x, y) =>
      !cloud.exists { case (_, px, py) =>
        px <= x && py <= y && (px < x || py < y)
      }
    }.map(_._1).toSet
    val got2 = Analytics.skyline2d(cdf, "pkey", "x", "y", buckets = 4)
      .collect().map(_.getAs[Long]("pkey")).toSet
    assert(got2 == expect)
  }

  test("ksTest finds the exact max CDF gap at its smallest location") {
    // A = {1, 2}, B = {2, 9}: dev(v) = |c1·n2 − c2·n1| = 2, 2, 0
    // → D = 2/(2·2) = 0.5, first attained at v = 1
    val ev = Seq(("click", 1.0), ("click", 2.0), ("view", 2.0),
      ("view", 9.0), ("error", 5.0)).toDF("event_type", "value")
    val r = Eval.ksTest(ev, "click", "view").collect()(0)
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("d_num") == 2L)
    assert(r.getAs[Long]("d_ppm") == 500000L)
    assert(r.getAs[Long]("ks_at_v6") == 1000000L)
  }

  test("acf matches hand-computed lags and gap-fills missing days") {
    val day = 86400000000L * 1000L // one day of ts nanos
    // type a: x = [1,2,3] on days 0,1,2 → c = [−3,0,3], den = 18
    //   lag1: 0 → 0 ppm; lag2: −9/18 → −500000 ppm
    // type b: events on days 0 and 2 ONLY → gap-filled x = [1,0,2],
    //   c = [0,−3,3], den = 18; lag1: −9/18 → −500000; lag2: 0
    val rows = Seq.fill(1)(("a", 0L)) ++ Seq.fill(2)(("a", day)) ++
      Seq.fill(3)(("a", 2 * day)) ++
      Seq(("b", 0L), ("b", 2 * day), ("b", 2 * day))
    val ev = rows.toDF("event_type", "ts")
    val r = Eval.acf(ev, maxLag = 2).collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("lag")) ->
        (x.getAs[Long]("n_days"), x.getAs[Long]("n_pairs"),
          x.getAs[Long]("acf_ppm"))).toMap
    assert(r(("a", 0L)) == ((3L, 3L, 1000000L)))
    assert(r(("a", 1L)) == ((3L, 2L, 0L)))
    assert(r(("a", 2L)) == ((3L, 1L, -500000L)))
    assert(r(("b", 1L))._3 == -500000L)
    assert(r(("b", 2L))._3 == 0L)
  }

  test("gainsCard cuts on score-group edges with exact capture and lift") {
    // desc groups: s=4 (2 rows, 1 pos), s=3 (1 row, 1 pos),
    //   s=2 (2 rows, 0 pos), s=1 (1 row, 1 pos); n=6, pos=3, nBins=2
    // ceil-edge bins: cum 2→1, 3→1, 5→2, 6→2
    val df = Seq((4L, true), (4L, false), (3L, true), (2L, false),
      (2L, false), (1L, true)).toDF("score", "label")
    val r = Eval.gainsCard(df, nBins = 2).collect()
      .map(x => x.getAs[Long]("bin") ->
        (x.getAs[Long]("rows_cum"), x.getAs[Long]("pos_cum"),
          x.getAs[Long]("capture_ppm"), x.getAs[Long]("lift_ppm"))).toMap
    assert(r(1L) == ((3L, 2L, 666666L, 1333333L)))
    assert(r(2L) == ((6L, 3L, 1000000L, 1000000L)))
  }

  test("gainsCard never splits a tie group across bins") {
    // ALL rows share one score → exactly one bin (the last), whole corpus
    val flat = Seq((7L, true), (7L, false), (7L, false), (7L, true))
      .toDF("score", "label")
    val rows = Eval.gainsCard(flat, nBins = 4).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("bin") == 4L)
    assert(rows.head.getAs[Long]("rows_cum") == 4L)
  }

  test("chi2Independence matches the hand-computed 2x2 statistic") {
    // cells x/0=3, x/1=1, y/0=1, y/1=3: every |O·N−R·C| = 8,
    // contrib = 10^6·64/(8·4·4) = 500000 each → chi2 = 2.0, dof 1,
    // V = sqrt(2/(8·1)) = 0.5
    val rows = Seq.fill(3)(("x", 0L)) ++ Seq(("x", 1L), ("y", 0L)) ++
      Seq.fill(3)(("y", 1L))
    val r = Eval.chi2Independence(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Long]("ra") == 2L && r.getAs[Long]("cb") == 2L)
    assert(r.getAs[Long]("chi2_e6") == 2000000L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Long]("cramer_ppm") == 500000L)
  }

  test("chi2Independence is zero for an exactly independent table") {
    // perfect independence: O = R·C/N for every cell → residuals 0
    val rows = for { a <- Seq("x", "y"); b <- 0L to 1L; _ <- 1 to 2 }
      yield (a, b)
    val r = Eval.chi2Independence(rows.toDF("a", "b"), "a", "b")
      .collect().head
    assert(r.getAs[Long]("chi2_e6") == 0L)
    assert(r.getAs[Long]("cramer_ppm") == 0L)
  }

  test("isotonicCard leaves already-monotone bins untouched") {
    // quant 16: scores 0/16/32 → bins 0,1,2 with means .25, .5, .75
    val rows =
      Seq.fill(1)((0L, true)) ++ Seq.fill(3)((0L, false)) ++
        Seq.fill(2)((16L, true)) ++ Seq.fill(2)((16L, false)) ++
        Seq.fill(3)((32L, true)) ++ Seq.fill(1)((32L, false))
    val r = Eval.isotonicCard(rows.toDF("score", "label")).collect()
      .map(x => x.getAs[Long]("s") -> x.getAs[Long]("iso_ppm")).toMap
    assert(r == Map(0L -> 250000L, 1L -> 500000L, 2L -> 750000L))
  }

  test("isotonicCard pools adjacent violators to their weighted mean") {
    // bin0 mean .8, bin1 mean .2 → PAVA pools both to 5/10 = .5
    val rows =
      Seq.fill(4)((0L, true)) ++ Seq.fill(1)((0L, false)) ++
        Seq.fill(1)((16L, true)) ++ Seq.fill(4)((16L, false))
    val r = Eval.isotonicCard(rows.toDF("score", "label")).collect()
      .map(x => x.getAs[Long]("s") -> x.getAs[Long]("iso_ppm")).toMap
    assert(r == Map(0L -> 500000L, 1L -> 500000L))
  }

  test("isotonicCard equals sequential PAVA and is monotone") {
    // pseudo-random bins; reference = classic pool-adjacent-violators
    // with exact rational block means (cross-multiplied merge test),
    // floored to ppm only at the end — the minimax identity must agree
    val rows = for {
      bin <- 0 until 12
      j <- 0 until (1 + bin % 4)
    } yield (bin.toLong * 16, ((bin * 31 + j * 17) % 5) < 2)
    val binStats = rows.groupBy(_._1 / 16).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        (rs.size.toLong, rs.count(_._2).toLong)
      }
    // PAVA: merge a block into its left neighbor while the left mean
    // is >= the right mean (p1/n1 >= p2/n2 ⟺ p1·n2 >= p2·n1)
    val blocks = collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    binStats.foreach { case (n, p) =>
      var (cn, cp, cc) = (n, p, 1)
      while (blocks.nonEmpty &&
        blocks.last._2 * cn >= cp * blocks.last._1) {
        val (ln, lp, lc) = blocks.remove(blocks.size - 1)
        cn += ln; cp += lp; cc += lc
      }
      blocks += ((cn, cp, cc))
    }
    val expected = blocks.flatMap { case (n, p, c) =>
      Seq.fill(c)(Math.floorDiv(1000000L * p, n))
    }.toSeq
    val got = Eval.isotonicCard(rows.toDF("score", "label"))
      .orderBy("s").collect().map(_.getAs[Long]("iso_ppm")).toSeq
    assert(got == expected)
    assert(got == got.sorted, "fit must be monotone non-decreasing")
  }

  test("policyReplay learns the greedy arm on train, scores by replay") {
    val day = 86400000000000L
    // dow 0 only; arm "hi" pays 3.00, arm "lo" pays 1.00; ids 1..40
    // alternate arms — expected values recomputed with the same md5 coin
    val events = (1 to 40).map { i =>
      val arm = if (i % 2 == 0) "hi" else "lo"
      val v = if (arm == "hi") 3.0 else 1.0
      (i.toLong, 1L, arm, (i % 7) * day + i, v)
    }
    def isTrain(id: Long) = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      h.charAt(0) < '8'
    }
    val df = events.toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Eval.policyReplay(df).collect()
    // per dow, recompute expectation from the same split
    val byDow = events.groupBy(e => (e._4 / day) % 7)
    out.foreach { r =>
      val dow = r.getAs[Long]("dow")
      val (train, eval) = byDow(dow).partition(e => isTrain(e._1))
      val rewards = train.groupBy(_._3)
        .map { case (a, es) => a -> es.map(e => (e._5 * 100).toLong).sum }
      val chosen = rewards.toSeq.sortBy { case (a, rw) => (-rw, a) }.head._1
      assert(r.getAs[String]("chosen_type") == chosen, s"dow $dow")
      assert(r.getAs[Long]("n_eval") == eval.size.toLong)
      val matched = eval.filter(_._3 == chosen)
      assert(r.getAs[Long]("n_matched") == matched.size.toLong)
      if (matched.nonEmpty)
        assert(r.getAs[Long]("replay_mean_e2") ==
          matched.map(e => (e._5 * 100).toLong).sum / matched.size)
    }
  }

  test("prCurve sweeps thresholds with exact cumulative precision/recall") {
    import spark.implicits._
    // scores 1..10, positive iff score >= 8; nBins=5 puts 8 in bin 3
    // and 9,10 in bin 4
    val df = (1L to 10L).map(s => (s, s >= 8L)).toDF("score", "label")
    val out = Eval.prCurve(df, nBins = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("tp_cum"), r.getAs[Long]("pred_pos"),
          r.getAs[Long]("precision_ppm"), r.getAs[Long]("recall_ppm")))
      .toMap
    assert(out(4L) == ((2L, 2L, 1000000L, 666666L)))
    assert(out(3L) == ((3L, 4L, 750000L, 1000000L)))
    assert(out(2L) == ((3L, 6L, 500000L, 1000000L)))
    assert(out(0L) == ((3L, 10L, 300000L, 1000000L)))
  }

  test("brierDecomposition: hand-exact terms and the Murphy identity") {
    import spark.implicits._
    // scores {0, 100}, labels match: p_ppm 0 (bin 0) and 990099 (bin 9)
    // se: bin9 2*(990099-1e6)^2 = 196059602; brier = that // 4 = 49014900
    // rel = same (bin0 gap 0); res = (2*5e5^2 + 2*5e5^2) // 4 = 25e10
    // unc = 5e5*(1e6-5e5) = 25e10 -> brier == rel - res + unc exactly
    val df = Seq((0L, false), (0L, false), (100L, true), (100L, true))
      .toDF("score", "label")
    val r = Eval.brierDecomposition(df, nBins = 10).collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("base_rate_ppm") == 500000L)
    assert(r.getAs[Long]("brier_ppm2") == 49014900L)
    assert(r.getAs[Long]("rel_ppm2") == 49014900L)
    assert(r.getAs[Long]("res_ppm2") == 250000000000L)
    assert(r.getAs[Long]("unc_ppm2") == 250000000000L)
    assert(r.getAs[Long]("brier_ppm2") ==
      r.getAs[Long]("rel_ppm2") - r.getAs[Long]("res_ppm2") +
        r.getAs[Long]("unc_ppm2"))
    // an anti-correlated scorer must score strictly worse
    val bad = Seq((0L, true), (0L, true), (100L, false), (100L, false))
      .toDF("score", "label")
    val rb = Eval.brierDecomposition(bad, nBins = 10).collect().head
    assert(rb.getAs[Long]("brier_ppm2") > r.getAs[Long]("brier_ppm2"))
  }

  test("kappaCard: perfect agreement is 1e6, independence is ~0") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a"))
      .toDF("label_a", "label_b")
    val p = Eval.kappaCard(perfect).collect().head
    assert(p.getAs[Long]("po_ppm") == 1000000L)
    assert(p.getAs[Long]("kappa_ppm") == 1000000L)
    // a rater that always says "a" against a 50/50 truth: po == pe → κ=0
    val indep = Seq(("a", "a"), ("a", "b"), ("a", "a"), ("a", "b"))
      .toDF("label_a", "label_b")
    val i = Eval.kappaCard(indep).collect().head
    assert(i.getAs[Long]("po_ppm") == 500000L)
    assert(i.getAs[Long]("pe_ppm") == 500000L)
    assert(i.getAs[Long]("kappa_ppm") == 0L)
  }

  test("kappaCard: textbook 2x2 worked example") {
    // 20 aa, 5 ab, 10 ba, 15 bb: po=.7, pe=.5·.6+.5·.4=.5, κ=.4
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val r = Eval.kappaCard(rows.toDF("label_a", "label_b")).collect().head
    assert(r.getAs[Long]("n") == 50L)
    assert(r.getAs[Long]("po_ppm") == 700000L)
    assert(r.getAs[Long]("pe_ppm") == 500000L)
    assert(r.getAs[Long]("kappa_ppm") == 400000L)
  }

  test("mcnemarCard counts disagreement cells; equal cells → 0") {
    // label true; A right on 1,2,3; B right on 3,4 → b=2 (A∧¬B), c=1
    val df = Seq(
      (true, true, false), (true, true, false), (true, true, true),
      (true, false, true), (true, false, false))
      .toDF("label", "pred_a", "pred_b")
    val r = Eval.mcnemarCard(df).collect().head
    assert(r.getAs[Long]("b_cell") == 2L)
    assert(r.getAs[Long]("c_cell") == 1L)
    // (2-1)²/3 in ppm = 333333
    assert(r.getAs[Long]("chi2_ppm") == 333333L)
    // all-agree case: b+c = 0 → NULL statistic, never a throw
    val agree = Seq((true, true, true), (false, false, false))
      .toDF("label", "pred_a", "pred_b")
    assert(Eval.mcnemarCard(agree).collect().head.isNullAt(
      Eval.mcnemarCard(agree).columns.indexOf("chi2_ppm")))
  }
}
