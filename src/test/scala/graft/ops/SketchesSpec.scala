package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllCount estimates distinct cardinality within HLL error bounds") {
    // 2000 distinct users, each appearing 1-3 times
    val rows = (1 to 2000).flatMap(u => (0 until (u % 3 + 1)).map(_ =>
      (u.toLong, "g")))
    val df = rows.toDF("user_id", "grp")
    val out = Sketches.hllCount(df, "user_id", Seq("grp"), b = 8).collect()
    assert(out.length == 1)
    val est = out.head.getAs[Double]("est")
    // raw HLL at m=256: sigma ~ 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert(math.abs(est - 2000.0) / 2000.0 < 0.26, s"est=$est")
    // registers bounded by m regardless of cardinality
    assert(out.head.getAs[Long]("n_registers") <= 256L)
  }

  test("hllCount registers merge: union of halves equals whole") {
    val a = (1 to 1000).map(i => (i.toLong, "g")).toDF("user_id", "grp")
    val b = (501 to 1500).map(i => (i.toLong, "g")).toDF("user_id", "grp")
    val whole = Sketches.hllCount(a.unionAll(b), "user_id", Seq("grp"))
      .select("sum_scaled").as[Long].head()
    // merge = max per bucket over the union of register tables
    val merged = Sketches.hllRegisters(a, "user_id", Seq("grp"))
      .unionAll(Sketches.hllRegisters(b, "user_id", Seq("grp")))
      .groupBy("grp", "bucket").agg(max("rho_max").as("rho_max"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_registers"),
        sum(expr("shiftleft(cast(1 as bigint), 53 - rho_max)")).as("p"))
      .select(col("p") + (lit(256L) - col("n_registers")) * lit(1L << 53))
      .as[Long].head()
    assert(whole == merged)
  }

  test("cmsEstimate never undercounts and is exact absent collisions") {
    val items = (Seq.fill(50)("hot") ++ (1 to 200).map(i => s"tok$i"))
      .toDF("tok")
    val sk = Sketches.cmsSketch(items, "tok", 4, 1024)
    // sketch is bounded by depth x width cells
    assert(sk.count() <= 4L * 1024L)
    val est = Sketches.cmsEstimate(sk, items, "tok", 4, 1024)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("est"))
      .toMap
    assert(est("hot") >= 50L)
    (1 to 200).foreach(i => assert(est(s"tok$i") >= 1L))
    // 201 distinct items over 4x1024 cells: the min over 4 rows is
    // almost surely collision-free for the hot item
    assert(est("hot") <= 60L)
  }

  test("bloomFilter has no false negatives and prunes most non-members") {
    val members = (1 to 300).map(i => i.toLong * 7).toDF("k")
    val bits = Sketches.bloomBits(members, "k", 3, 65536)
    val probe = (1 to 5000).map(_.toLong).toDF("k")
    val kept = Sketches.bloomFilter(probe, "k", bits, 3, 65536)
      .as[Long].collect().toSet
    // every true member in probe range passes
    (1 to 300).map(_.toLong * 7).filter(_ <= 5000L)
      .foreach(m => assert(kept.contains(m), s"false negative $m"))
    // 3 hashes into 65536 bits for <=900 set bits: fp rate ~ 2e-6;
    // allow a generous margin
    val trueMembers = (1 to 300).map(_.toLong * 7).filter(_ <= 5000).toSet
    assert((kept -- trueMembers).size <= 5, s"${(kept -- trueMembers).size} fp")
  }

  test("rollingDistinctHll tracks the exact trailing-window distinct") {
    // 10 days x 500 disjoint users/day: trailing-7 exact = 3500 once
    // the window fills, 500 on day 0
    val rows = for (d <- 0 until 10; u <- 0 until 500)
      yield (d.toLong, (d * 1000 + u).toLong)
    val df = rows.toDF("day", "user_id")
    val est = Sketches.rollingDistinctHll(df, "user_id", "day")
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Double]("est"))
      .toMap
    assert(est.size == 10)
    assert(math.abs(est(0L) - 500.0) / 500.0 < 0.26)
    (6L to 9L).foreach(d =>
      assert(math.abs(est(d) - 3500.0) / 3500.0 < 0.26,
        s"day $d est ${est(d)}"))
    // merged-window estimate == the estimate of the union computed
    // directly (register max-merge is lossless)
    val window9 = Sketches.hllCount(
      df.filter(col("day") >= 3 && col("day") <= 9)
        .withColumn("g", lit(1L)), "user_id", Seq("g"))
      .select("est").as[Double].head()
    assert(est(9L) == window9)
  }

  test("kmvSketch keeps the k smallest distinct hashes per set") {
    val df = (1 to 500).map(i => ("s", i.toLong)).toDF("grp", "v")
    val full = Sketches.kmvSketch(df, "grp", "v", k = 1000)
      .select("h").as[Long].collect().sorted
    assert(full.length == 500) // all distinct hashes, under k
    val sk = Sketches.kmvSketch(df, "grp", "v", k = 64)
      .select("h").as[Long].collect().sorted
    assert(sk.toSeq == full.take(64).toSeq) // exactly the 64 minima
  }

  test("kmvOverlapPairs estimates jaccard/union/intersection") {
    // A = 1..1000, B = 501..1500 (true J=1/3), C disjoint, D == A
    val rows =
      (1 to 1000).map(i => ("a", i.toLong)) ++
      (501 to 1500).map(i => ("b", i.toLong)) ++
      (90001 to 91000).map(i => ("c", i.toLong)) ++
      (1 to 1000).map(i => ("d", i.toLong))
    val sk = Sketches.kmvSketch(rows.toDF("grp", "v"), "grp", "v", 256)
    val out = Sketches.kmvOverlapPairs(sk, 256)
      .collect().map(r => (r.getAs[String]("set_a"),
        r.getAs[String]("set_b")) ->
        (r.getAs[Double]("jaccard_est"), r.getAs[Double]("union_est"),
          r.getAs[Double]("inter_est"))).toMap
    assert(out.size == 6) // C(4,2) pairs
    val (jab, uab, iab) = out(("a", "b"))
    assert(math.abs(jab - 1.0 / 3) < 0.15, s"jaccard $jab")
    assert(math.abs(uab - 1500.0) / 1500.0 < 0.25, s"union $uab")
    assert(math.abs(iab - 500.0) / 500.0 < 0.45, s"inter $iab")
    // disjoint sets share no hashes: jaccard exactly 0
    assert(out(("a", "c"))._1 == 0.0)
    // identical value sets produce identical minima: jaccard exactly 1
    assert(out(("a", "d"))._1 == 1.0)
  }

  test("amsF2 median estimate tracks the exact second moment") {
    import spark.implicits._
    // skewed stream: key i repeated i times, F2 = sum i^2 for i=1..20
    val rows = (1 to 20).flatMap(i => Seq.fill(i)(i.toLong)).toDF("k")
    val sk = Sketches.amsF2(rows, "k", depth = 7).collect()
    assert(sk.length === 7)
    val exact = (1 to 20).map(i => i.toLong * i).sum
    val ests = sk.map(_.getAs[Long]("est")).sorted
    val median = ests(3)
    // each est is unbiased with variance <= 2·F2²; the 7-way median is
    // within 4x of truth for any fixed hash draw this deterministic
    assert(median > 0 && median < 8 * exact,
      s"median $median vs exact $exact")
    // s_sum magnitude can never exceed the stream length
    assert(sk.forall(r => math.abs(r.getAs[Long]("s_sum")) <= 210))
  }

  test("amsF2 is invariant to input partitioning (mergeable signs)") {
    import spark.implicits._
    val rows = (1 to 200).map(i => (i % 13).toLong).toDF("k")
    val a = Sketches.amsF2(rows.repartition(1), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Sketches.amsF2(rows.repartition(17), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("amsJoinSize: self-join product equals amsF2, disjoint keys small") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (i % 7).toLong).toDF("k")
    val self = Sketches.amsJoinSize(rows, "k", rows, "k")
      .collect().map(r => (r.getAs[Long]("salt"), r.getAs[Long]("est"))).toMap
    val f2 = Sketches.amsF2(rows, "k")
      .collect().map(r => (r.getAs[Long]("salt"), r.getAs[Long]("est"))).toMap
    assert(self === f2) // S_A == S_B when the inputs coincide
  }

  test("quantileSketch: exact order stats when k >= n; mergeable bottom-k") {
    import spark.implicits._
    val rows = (1L to 10L).map(i => (i * 11L, s"id$i")).toDF("v", "id")
    val out = Sketches.quantileSketch(rows, "v", "id", k = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k >= n: the sample IS the data, so quantiles are exact order
    // statistics at rank ceil(q*10)
    assert(out(500000L) == 55L)   // rank 5
    assert(out(100000L) == 11L)   // rank 1
    assert(out(900000L) == 99L)   // rank 9
    // mergeability: the sketch of a union equals the sketch rebuilt
    // from the two shards' bottom-k samples (same md5 membership)
    val big = (1L to 200L).map(i => (i * 7L % 101L, s"k$i")).toDF("v", "id")
    val shardA = big.filter($"id" < "k5")  // string split, deterministic
    val shardB = big.filter($"id" >= "k5")
    def sample(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("h", org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("qs:"), $"id")))
      .orderBy("h", "id").limit(32).select("v", "id")
    val merged = Sketches.quantileSketch(
      sample(shardA).unionByName(sample(shardB)), "v", "id", k = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = Sketches.quantileSketch(big, "v", "id", k = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == direct,
      "bottom-k of the shard bottom-k union must equal the direct sketch")
  }

  test("sketch plans stay bucketed: no cross product anywhere") {
    val items = (1 to 100).map(i => s"t$i").toDF("tok")
    val sk = Sketches.cmsSketch(items, "tok")
    assertNoCrossProduct(Sketches.cmsEstimate(sk, items, "tok"), "cms")
    val bits = Sketches.bloomBits((1 to 50).map(_.toLong).toDF("k"), "k")
    assertNoCrossProduct(
      Sketches.bloomFilter((1 to 100).map(_.toLong).toDF("k"), "k", bits),
      "bloom")
  }

  test("ddSketch: pow2 buckets, ceil walk, midpoint within 2x") {
    // values {1,2,3,4,8,100} -> buckets 1,2,2,3,4,7; cum 1,3,4,5,6.
    // q50: k=3 -> bucket 2, midpoint 3 (true median 3-4).
    // q90: k=ceil(5.4)=6 -> bucket 7, midpoint 96 (true 100, <2x off).
    val v = Seq(1L, 2L, 3L, 4L, 8L, 100L).toDF("x")
    val out = Sketches.ddSketch(v, "x", Seq(500000L, 900000L))
      .collect()
      .map(r => r.getAs[Long]("q_ppm") ->
        (r.getAs[Long]("bucket"), r.getAs[Long]("est_mid"),
          r.getAs[Long]("n_total"))).toMap
    assert(out(500000L) == ((2L, 3L, 6L)))
    assert(out(900000L) == ((7L, 96L, 6L)))
    // zero lands in bucket 0 with midpoint 0 (the ltrim-bin fallout)
    val z = Sketches.ddSketch(Seq(0L, 0L, 5L).toDF("x"), "x",
      Seq(500000L)).collect().head
    assert(z.getAs[Long]("bucket") == 0L && z.getAs[Long]("est_mid") == 0L)
  }

  test("heavyHitters returns exactly the items above n/c with exact counts") {
    // n = 100 rows, c = 10 → strict threshold 10: A(40) and B(11) pass
    val rows = (Seq.fill(40)("A") ++ Seq.fill(11)("B") ++
      (1 to 49).map(i => s"u$i")).zipWithIndex
      .map { case (it, i) => (it, s"row$i") }
    val hh = Sketches.heavyHitters(rows.toDF("item", "row_key"),
      "item", "row_key", c = 10, buckets = 8).collect()
    assert(hh.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("A", 40L), ("B", 11L)),
      "pigeonhole recall is a theorem — B(11) must survive any bucketing")
    assert(hh.find(_.getString(0) == "A").get.getLong(2) == 400000L)
  }

  test("heavyHitters: an item exactly AT n/c is excluded (strict cut)") {
    val rows = (Seq.fill(10)("X") ++ (1 to 90).map(i => s"u$i")).zipWithIndex
      .map { case (it, i) => (it, s"r$i") }
    val hh = Sketches.heavyHitters(rows.toDF("item", "row_key"),
      "item", "row_key", c = 10, buckets = 4).collect()
    assert(hh.isEmpty)
  }
}
