package graft.ops

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports per-column rows, nulls, distincts, and bounds") {
    val df = Seq(
      (Some(1), Some(2.5)), (Some(1), None), (Some(3), Some(-1.0))
    ).toDF("a", "b")
    val rows = Analytics.profile(df, Seq("a", "b")).orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows(0) == (("a", 3L, 3L, 2L, 1.0, 3.0)))
    assert(rows(1) == (("b", 3L, 2L, 2L, -1.0, 2.5)))
  }

  test("bestSupplier picks the min-cost supplier with a stable tie-break") {
    val li = Seq(
      (1L, 10L, 5.0), (1L, 10L, 5.0),  // part 1, supp 10: 10.0
      (1L, 20L, 8.0),                  // part 1, supp 20: 8.0 -> wins
      (2L, 30L, 4.0), (2L, 10L, 4.0)   // part 2 ties: lower supp 10 wins
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val rows = Analytics.bestSupplier(li).orderBy("l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 20L, 8.0, 1L), (2L, 10L, 4.0, 1L)))
  }

  test("basketRules counts pair support and directional confidence") {
    val b = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"),
      (4L, "x"), (4L, "z"),
      (5L, "y") // y alone
    ).toDF("basket", "item")
    val rules = Analytics.basketRules(b, "basket", "item", minPairCount = 2L)
    assertNoCrossProduct(rules, "basketRules")
    val byPair = rules.collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    // x,y co-occur 3x; |x|=4, |y|=4; x,z twice; y,z once (pruned)
    assert(byPair(("x", "y")) == ((3L, 4L, 4L, 0.75, 0.75)))
    assert(byPair(("x", "z")) == ((2L, 4L, 2L, 0.5, 1.0)))
    assert(!byPair.contains(("y", "z")), "below min support")
  }

  test("histogram bins values by fixed width with exact bounds") {
    val df = Seq(0.5, 1.5, 9.9, 10.0, 19.9, 25.0).toDF("v")
    val out = Analytics.histogram(df, "v", 10.0).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (0L, 3L, 0.5, 9.9), (1L, 2L, 10.0, 19.9), (2L, 1L, 25.0, 25.0)))
  }

  test("winsorize clamps to per-group exact percentiles") {
    // group g: 1..100 -> p01=1.99, p99=99.01; 0.5 clamps up, 100 down
    val rows = (1 to 100).map(i => ("g", i.toDouble)) :+ (("h", 5.0))
    val df = rows.toDF("grp", "v")
    val out = Analytics.winsorize(df, "grp", "v", 0.01, 0.99)
      .filter($"v" === 1.0 || $"v" === 100.0 || $"grp" === "h")
      .orderBy("grp", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getAs[Double]("clamped")))
    assert(out(0) == (("g", 1.0, 1.99)))
    assert(out(1) == (("g", 100.0, 99.01)))
    assert(out(2) == (("h", 5.0, 5.0)), "single-value group is its own bound")
  }

  test("rollupAgg emits detail, subtotal, and grand-total levels") {
    val df = Seq(("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0))
      .toDF("f1", "f2", "v")
    val out = Analytics.rollupAgg(df, "f1", "f2", "v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(out === Set(
      ("a", "x", 1L, 1.0, 0L), ("a", "y", 1L, 2.0, 0L),
      ("b", "x", 1L, 4.0, 0L),
      ("a", "ALL", 2L, 3.0, 1L), ("b", "ALL", 1L, 4.0, 1L),
      ("ALL", "ALL", 3L, 7.0, 3L)))
  }

  test("paretoShare ranks keys by value with exact cumulative shares") {
    val df = Seq(
      ("a", 50.0), ("a", 10.0), // a: 60
      ("b", 30.0),              // b: 30
      ("c", 10.0)               // c: 10; total 100
    ).toDF("k", "v")
    val out = Analytics.paretoShare(df, "k", "v").orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", 1L, 6000L, 0.6),
      ("b", 2L, 3000L, 0.9),
      ("c", 3L, 1000L, 1.0)))
  }

  test("percentileRank maps values to [0,1] per group, deterministic ties") {
    val df = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L),
      (4L, "en", 30L), // tie with 3 — id breaks it
      (5L, "de", 7L)   // singleton group -> rank 0
    ).toDF("doc_id", "lang", "n")
    val out = Analytics.percentileRank(df, "doc_id", "lang", "n")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 0.0), (2L, 1.0 / 3.0), (3L, 2.0 / 3.0), (4L, 1.0), (5L, 0.0)))
  }

  test("cubeAgg adds the per-b grouping set rollup lacks") {
    val df = Seq(("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0))
      .toDF("g1", "g2", "v")
    val out = Analytics.cubeAgg(df, "g1", "g2", "v")
      .orderBy("lvl", "g1", "g2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("a", "x", 1L, 1.0, 0L), ("a", "y", 1L, 2.0, 0L),
      ("b", "x", 1L, 4.0, 0L),
      ("a", "ALL", 2L, 3.0, 1L), ("b", "ALL", 1L, 4.0, 1L),
      ("ALL", "x", 2L, 5.0, 2L), ("ALL", "y", 1L, 2.0, 2L),
      ("ALL", "ALL", 3L, 7.0, 3L)))
  }

  test("exactSelectWeighted finds weighted order statistics; rejects w<1") {
    import spark.implicits._
    // W = 8: cumweights 10→1, 20→6, 30→8. q=.5 ⇒ k=4 ⇒ 20;
    // q=.875 ⇒ k=7 ⇒ 30
    val df = Seq((10L, 1L), (20L, 5L), (30L, 2L)).toDF("v", "w")
    val r = Analytics
      .exactSelectWeighted(df, "v", "w", Seq(500000L, 875000L))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(500000L -> 20L, 875000L -> 30L), s"got $r")
    // unit weights reduce to the unweighted selection
    val uw = Analytics.exactSelectWeighted(
      df.withColumn("w", org.apache.spark.sql.functions.lit(1L)),
      "v", "w", Seq(500000L)).collect()(0).getLong(1)
    val plain = Analytics.exactSelect(df.select($"v"), "v", Seq(500000L))
      .collect()(0).getLong(1)
    assert(uw == plain)
    intercept[IllegalArgumentException] {
      Analytics.exactSelectWeighted(
        Seq((1L, 0L)).toDF("v", "w"), "v", "w")
    }
  }

  test("exactSelect finds exact order statistics, wide ranges refine") {
    import spark.implicits._
    val vals = Seq(5L, 1L, 9L, 3L, 7L).toDF("v")
    val out = Analytics
      .exactSelect(vals, "v", Seq(100000L, 500000L, 900000L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(100000L) == 1L, "k = 1")
    assert(out(500000L) == 5L, "k = ceil(2.5) = 3")
    assert(out(900000L) == 9L, "k = ceil(4.5) = 5")
    // a ~1e12 value range forces multiple bucket-refinement levels; the
    // selected value must still be EXACTLY the k-th smallest
    val wide = (1 to 1000).map(i => i.toLong * 1000000007L).toDF("v")
    val w = Analytics.exactSelect(wide, "v", Seq(500000L)).collect()(0)
    assert(w.getLong(1) == 500L * 1000000007L)
    assert(w.getLong(2) == 1000L)
  }

  test("binQuantiles lands within one bin width of the exact quantile") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val out = Analytics.binQuantiles(df, "v", bins = 100,
      qs = Seq(0.5, 0.9)).orderBy("q").collect()
    assert(out.length == 2)
    val w = (1000.0 - 1.0) / 100
    val est = out.map(r => r.getAs[Double]("q") -> r.getAs[Double]("est"))
      .toMap
    assert(math.abs(est(0.5) - 500.0) <= w + 1e-9)
    assert(math.abs(est(0.9) - 900.0) <= w + 1e-9)
    // n_le at the selected bin covers at least the target rank
    assert(out.forall(r => r.getAs[Long]("n_le") >=
      math.ceil(r.getAs[Double]("q") * 1000).toLong))
  }

  test("binQuantiles handles a constant column (single bin)") {
    val df = Seq.fill(10)(7.5).toDF("v")
    val out = Analytics.binQuantiles(df, "v", bins = 8, qs = Seq(0.5))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("bin") == 0L)
    assert(out.head.getAs[Double]("est") == 7.5)
  }

  test("concentration: uniform mixture has Gini 0, skew matches by hand") {
    // uniform: 4 categories x 5 rows -> gini 0, top share 5/20
    val uni = (0 until 20).map(i => ("c" + (i % 4))).toDF("src")
    val u = Analytics.concentration(uni, Seq("src")).collect().head
    assert(u.getAs[Long]("n_categories") == 4L)
    assert(u.getAs[Long]("gini_ppm") == 0L)
    assert(u.getAs[Long]("top_share_ppm") == 250000L)
    // counts (1, 1, 2, 16): numerator (-3)(1)+(-1)(1)+(1)(2)+(3)(16) = 46
    // -> 46e6 div (4*20) = 575000; top 16/20 = 800000
    val skew = (Seq.fill(16)("big") ++ Seq("a", "b") ++ Seq.fill(2)("c"))
      .toDF("src")
    val s = Analytics.concentration(skew, Seq("src")).collect().head
    assert(s.getAs[Long]("gini_ppm") == 575000L)
    assert(s.getAs[Long]("top_share_ppm") == 800000L)
  }

  test("corrMatrix: planted perfect, anti, and self-consistent pairs") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0),
      (4.0, 8.0, -4.0)).toDF("x", "y", "z")
    val out = Analytics.corrMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getAs[String]("col_x"), r.getAs[String]("col_y")) ->
        r.getAs[Double]("corr")).toMap
    assert(out.size == 3)
    assert(out.forall { case (_, v) => !v.isNaN })
    assert(math.abs(out(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(out(("x", "z")) + 1.0) < 1e-12)
    assert(math.abs(out(("y", "z")) + 1.0) < 1e-12)
  }

  test("q6: hand-computed revenue and date/qty predicates pushed to the scan") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("q6").toFile.getAbsolutePath
    Seq(
      ("1996-06-01", 0.06, 10.0, 100.0), // in: 6.00
      ("1996-12-31", 0.05, 23.0, 200.0), // in: 10.00
      ("1997-01-01", 0.06, 10.0, 100.0), // out: date hi is exclusive
      ("1996-06-01", 0.04, 10.0, 100.0), // out: discount below band
      ("1996-06-01", 0.06, 24.0, 100.0)  // out: qty bound is strict
    ).toDF("d", "l_discount", "l_quantity", "l_extendedprice")
      .withColumn("l_shipdate", to_timestamp(col("d")))
      .drop("d").write.mode("overwrite").parquet(dir)
    val li = spark.read.parquet(dir)
    val q = Analytics.q6(li)
    val r = q.collect().head
    assert(r.getAs[Long]("n_rows") == 2L)
    assert(r.getAs[Double]("revenue") == 16.0)
    // the POINT of this query: date range + quantity bound reach the
    // parquet scan as pushed data filters (row-group min/max skipping)
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("LessThan(l_quantity"), pushed)
  }

  test("basketTriples counts supported triples, closure-pruned") {
    val b = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "b"),
      // (x,y) and (y,z) frequent but (x,z) never co-occurs twice:
      // the (a=x,b=y,c=z) candidate dies at support, and the closure
      // prune drops it before counting anyway
      (4L, "x"), (4L, "y"), (5L, "x"), (5L, "y"),
      (6L, "y"), (6L, "z"), (7L, "y"), (7L, "z"),
      (8L, "x"), (8L, "y"), (8L, "z"))
      .toDF("basket", "item")
    val out = Analytics.basketTriples(b, "basket", "item", minCount = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(out == Map(("a", "b", "c") -> 2L))
  }

  test("q17 keeps only rows below 20 percent of the part's average qty") {
    val li = Seq(
      (1L, 1.0, 100.0),   // part 1: qtys 1, 50, 49 -> avg 100/3; 0.2*avg = 6.67
      (1L, 50.0, 200.0),  //   qty 1 qualifies (1 < 6.67); 50/49 do not
      (1L, 49.0, 300.0),
      (2L, 10.0, 400.0)   // part 2: avg 10, threshold 2 -> nothing
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val r = Analytics.q17(li).collect().head
    assert(r.getAs[Long]("n_rows") == 1L)
    assert(r.getAs[Double]("avg_yearly") == 100.0 / 7.0)
  }

  test("q21 blames only the sole late supplier of multi-supplier orders") {
    import org.apache.spark.sql.functions._
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2026-01-${d + 1}%02d 00:00:00")
    def t2(d: Int) = java.sql.Timestamp.valueOf(f"2026-07-${d + 1}%02d 00:00:00")
    // order 1: supp 10 late, supp 20 on time -> blame 10
    // order 2: supps 10 and 20 BOTH late -> nobody blamed
    // order 3: single supplier late -> not blamed (no co-suppliers)
    val li = Seq(
      (1L, 10L, t2(0)), (1L, 20L, t(2)),
      (2L, 10L, t2(0)), (2L, 20L, t2(0)),
      (3L, 10L, t2(0)))
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val o = Seq((1L, t(0)), (2L, t(0)), (3L, t(0)))
      .toDF("o_orderkey", "o_orderdate")
    val out = Analytics.q21(li, o).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 1L))
  }

  test("q12 splits critical vs other priorities inside the date band") {
    import org.apache.spark.sql.functions._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"1996-$m%02d-15 00:00:00")
    // order 1 urgent, order 2 low, order 3 high; line for order 3 ships
    // outside the band and must not count
    val li = Seq(
      (1L, "O", t(2)), (1L, "F", t(3)), (2L, "O", t(2)), (3L, "O", t(8)))
      .toDF("l_orderkey", "l_linestatus", "l_shipdate")
    val o = Seq((1L, "1-URGENT"), (2L, "5-LOW"), (3L, "2-HIGH"))
      .toDF("o_orderkey", "o_orderpriority")
    val out = Analytics.q12(li, o).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("O" -> ((1L, 1L)), "F" -> ((1L, 0L))))
  }

  test("q9 computes signed e4 profit on the name-filtered slice only") {
    import org.apache.spark.sql.functions._
    // part 1 matches 'red', cost cents = 1000/5 = 200; part 2 excluded
    val pt = Seq((1L, "red widget", 10.00), (2L, "blue bolt", 99.0))
      .toDF("p_partkey", "p_name", "p_retailprice")
    // rev = 10000c * 90 = 900000 e4; cost = 200c*100*qty2 = 40000 e4
    val li = Seq((1L, 1L, 10L, 2.0, 100.0, 0.10),
      (2L, 2L, 10L, 1.0, 50.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    val o = Seq((1L, java.sql.Timestamp.valueOf("1996-03-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("1997-03-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val su = Seq((10L, 7)).toDF("s_suppkey", "s_nationkey")
    val na = Seq((7, "N1")).toDF("n_nationkey", "n_name")
    val out = Analytics.q9(li, o, su, na, pt).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("nation") == "N1")
    assert(r.getAs[Long]("o_year") == 1996L)
    assert(r.getAs[Long]("profit_e4") == 860000L)
    assert(r.getAs[Long]("n_items") == 1L)
  }

  test("q16 counts distinct suppliers per class with exclusions") {
    import org.apache.spark.sql.functions._
    // part 1 survives; part 2 excluded brand; part 3 excluded size
    val pt = Seq((1L, "Brand#1", "SMALL", 14),
      (2L, "Brand#45", "SMALL", 14), (3L, "Brand#1", "SMALL", 2))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    // suppliers 10, 11 ok; 12 has the negative-balance complaint mark
    val su = Seq((10L, 5.0), (11L, 1.0), (12L, -3.0))
      .toDF("s_suppkey", "s_acctbal")
    // part 1 ships from 10 (twice — distinct must dedup), 11, and the
    // excluded 12; parts 2/3 ship but never count
    val li = Seq((1L, 10L), (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (3L, 11L))
      .toDF("l_partkey", "l_suppkey")
    val out = Analytics.q16(li, pt, su).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("p_brand") == "Brand#1")
    assert(r.getAs[Long]("p_size") == 14L)
    assert(r.getAs[Long]("supplier_cnt") == 2L)
  }

  test("q11 keeps only parts above the cross-multiplied share bound") {
    import org.apache.spark.sql.functions._
    // rev units: part 1 → 10 rows, parts 2/3 → 1 row each (e4 = 10000
    // per row at price 1.00, discount 0). At 5000 bp (50%) only part 1
    // (10/12 ≈ 83%) survives.
    val li = ((1 to 10).map(_ => 1L) ++ Seq(2L, 3L))
      .map(p => (p, 1.00, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = Analytics.q11(li, bp = 5000L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("l_partkey") == 1L)
    assert(out.head.getAs[Long]("rev_e4") == 100000L)
  }

  test("q20 keeps suppliers shipping strictly more than half a part") {
    import org.apache.spark.sql.functions._
    val ts = java.sql.Timestamp.valueOf("1996-06-01 00:00:00")
    val pt = Seq((1L, "red widget"), (2L, "blue bolt"))
      .toDF("p_partkey", "p_name")
    val su = Seq((10L, "S10"), (11L, "S11"), (12L, "S12"))
      .toDF("s_suppkey", "s_name")
    // part 1: supplier 10 ships 6 of 10 (dominant), 11 ships 4;
    // part 2 never counts (name excluded); exact-half must NOT pass
    val li = Seq(
      (1L, 10L, 6.0, ts), (1L, 11L, 4.0, ts),
      (2L, 12L, 9.0, ts))
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val out = Analytics.q20(li, pt, su).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("s_suppkey") == 10L)
    assert(out.head.getAs[Long]("n_dominated") == 1L)
    // exact half: 5 vs 5 → nobody dominates
    val liHalf = Seq((1L, 10L, 5.0, ts), (1L, 11L, 5.0, ts))
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    assert(Analytics.q20(liHalf, pt, su).isEmpty)
  }

  test("joinOrderCard: exact intermediate sizes, smaller join first") {
    import spark.implicits._
    val a = Seq(Tuple1(1L), Tuple1(2L)).toDF("ak")
    val b = Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("bk1", "bk2")
    val c = Seq(Tuple1(10L), Tuple1(10L), Tuple1(11L), Tuple1(10L))
      .toDF("ck")
    val r = Analytics.joinOrderCard(a, "ak", b, "bk1", "bk2", c, "ck")
      .collect().head
    // |A⋈B| = 1*2 + 1*1 = 3; |B⋈C| = 1*3 + 1*1 = 4
    assert(r.getAs[Long]("ab_rows") == 3L)
    assert(r.getAs[Long]("bc_rows") == 4L)
    assert(r.getAs[String]("recommended") == "ab_first")
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("n_c")) == ((2L, 3L, 4L)))
  }

  test("adjustedAteCard: stratum-weighted exact effect, empty arms drop") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def isT(u: Long) =
      ((md.digest(u.toString.getBytes("UTF-8"))(0) >> 4) & 0xf) < 8
    // stratum a: T 3.00 vs C 1.00 (gap 2e8 ppm-cents); stratum b: no
    // gap; stratum z has only treated users -> drops out
    val ev = (1L to 20L).flatMap { u =>
      Seq((u, "a", if (isT(u)) 3.0 else 1.0),
        (u, "b", 2.0)) ++
        (if (isT(u)) Seq((u, "z", 9.0)) else Nil)
    }.toDF("user_id", "event_type", "value")
    val r = Analytics.adjustedAteCard(ev).collect().head
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(r.getAs[Long]("n_used") == 40L)
    // ATE = (20*2e8 + 20*0) div 40 = 1e8 ppm-cents = +1.00
    assert(r.getAs[Long]("ate_ppm_cents") == 100000000L)
  }

  test("didCard: a treatment-only lift survives the common level shift") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def isT(u: Long) =
      ((md.digest(u.toString.getBytes("UTF-8"))(0) >> 4) & 0xf) < 8
    val day = 86400000000L
    // pre (day 0): everyone 1.00; post (day 1): T 3.00, C 2.00 —
    // the +1.00 common shift cancels, DiD isolates T's extra +1.00
    val ev = (1L to 20L).flatMap { u =>
      Seq((u, 0L, 1.0),
        (u, day, if (isT(u)) 3.0 else 2.0))
    }.toDF("user_id", "ts", "value")
    val r = Analytics.didCard(ev, pivotDay = 1L).collect().head
    assert(r.getAs[Long]("n_obs") == 40L)
    assert(r.getAs[Long]("t_pre") == 100000000L)
    assert(r.getAs[Long]("t_post") == 300000000L)
    assert(r.getAs[Long]("c_pre") == 100000000L)
    assert(r.getAs[Long]("c_post") == 200000000L)
    assert(r.getAs[Long]("did_ppm_cents") == 100000000L)
  }
}
