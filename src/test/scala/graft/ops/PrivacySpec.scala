package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, expr}

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityAudit flags small classes and homogeneous classes") {
    // class (1,"A"): 3 rows, 2 sensitive values -> k-violation at k=3? no
    //   (size 3 >= 3) but l ok; class (1,"B"): 2 rows -> k-violation;
    // class (2,"A"): 3 rows all sensitive=9 -> l-violation only
    val rows = Seq(
      (1L, "A", 1L), (1L, "A", 1L), (1L, "A", 2L),
      (1L, "B", 1L), (1L, "B", 2L),
      (2L, "A", 9L), (2L, "A", 9L), (2L, "A", 9L)
    ).toDF("q1", "q2", "sens")
    val audit = Privacy.kAnonymityAudit(rows, Seq("q1", "q2"), "sens",
      k = 3, l = 2).collect()
      .map(r => (r.getAs[Long]("q1"), r.getAs[String]("q2")) ->
        (r.getAs[Long]("class_size"), r.getAs[Long]("l_diversity"),
          r.getAs[Boolean]("violates_k"), r.getAs[Boolean]("violates_l")))
      .toMap
    assert(audit((1L, "A")) == (3L, 2L, false, false))
    assert(audit((1L, "B")) == (2L, 2L, true, false))
    assert(audit((2L, "A")) == (3L, 1L, false, true))
  }

  test("kAnonymityAudit: generalizing a QID clears violations") {
    // two singleton bands violate k=2; coarsening the band merges them
    val rows = Seq((10L, 1L), (11L, 2L)).toDF("band", "sens")
    val fine = Privacy.kAnonymityAudit(rows, Seq("band"), "sens", 2, 1)
      .collect()
    assert(fine.forall(_.getAs[Boolean]("violates_k")))
    val coarse = Privacy.kAnonymityAudit(
      rows.withColumn("band", expr("band div 10")),
      Seq("band"), "sens", 2, 1).collect()
    assert(coarse.length == 1 && !coarse.head.getAs[Boolean]("violates_k"))
  }

  test("randomizedResponse flips ~1/4 deterministically; estimate debiases") {
    import spark.implicits._
    val rows = (1L to 2000L).map(i => (i, "g", if (i <= 600) 1L else 0L))
      .toDF("id", "grp", "bit")
    val priv = Privacy.randomizedResponse(rows, "id", "bit")
    // deterministic: same ids -> identical reports across runs
    val r1 = priv.collect().map(r => (r.getLong(0), r.getAs[Long]("reported")))
    val r2 = Privacy.randomizedResponse(rows, "id", "bit")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("reported")))
    assert(r1.toSet === r2.toSet)
    val est = Privacy.rrEstimate(priv, Seq("grp")).collect().head
    assert(est.getAs[Long]("n") === 2000L)
    // true rate 30%; debiased estimate within a few points for a fixed
    // md5 coin draw (sd of the estimator ~ 2.2% at n=2000)
    val ppm = est.getAs[Long]("est_yes_ppm")
    assert(ppm > 200000L && ppm < 400000L, s"est $ppm")
    // flip count is binomial(2000, 1/4): deterministic draw sits well
    // inside 5 sigma of 500
    val flips = priv.join(rows, "id")
      .filter(col("reported") =!= col("bit")).count()
    assert(flips > 400L && flips < 600L, s"flips $flips")
  }

  test("dpCounts adds the deterministic binomial coins and clamps at 0") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def noise(key: String): Long = {
      val h = md5hex("dp:" + key)
      java.lang.Long.bitCount(java.lang.Long.parseLong(h.substring(0, 8), 16)) +
        java.lang.Long.bitCount(java.lang.Long.parseLong(h.substring(8, 16), 16)) -
        32L
    }
    val df = (Seq.fill(100)("click") ++ Seq.fill(2)("view"))
      .toDF("event_type")
    val out = Privacy.dpCounts(df, Seq("event_type")).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("released")).toMap
    assert(out("click") === math.max(0L, 100L + noise("click")))
    assert(out("view") === math.max(0L, 2L + noise("view")))
    // binomial(64, 1/2) - 32 noise is bounded by ±32 by construction
    assert(math.abs(noise("click")) <= 32L)
  }


  test("generalizeKAnon picks the smallest level with no class under k") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, expr, lit}
    // zip-like QID: 6 rows in '11x', 6 in '12x' — full zip classes of 3
    // violate k=5; the 2-digit prefix level makes classes of 6; the
    // 1-digit level would over-generalize and must NOT be chosen
    val rows = Seq("111", "111", "111", "112", "112", "112",
      "121", "121", "121", "122", "122", "122").toDF("zip")
    val levels = Seq(col("zip"),
      concat(expr("substring(zip, 1, 2)"), lit("*")),
      concat(expr("substring(zip, 1, 1)"), lit("**")))
    val out = Privacy.generalizeKAnon(rows, levels, k = 5L)
      .collect().map(r => r.getString(1) ->
        (r.getLong(0), r.getAs[Long]("class_size"),
          r.getAs[Boolean]("suppressed"))).toMap
    assert(out.keySet == Set("11*", "12*"), s"wrong level: ${out.keySet}")
    assert(out("11*") == ((1L, 6L, false)) && out("12*") == ((1L, 6L, false)))
  }

  test("generalizeKAnon falls back to the coarsest level, flags residuals") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // 3 rows total: even '*' can't reach k=5 -> coarsest level, suppressed
    val rows = Seq("a", "b", "c").toDF("v")
    val out = Privacy.generalizeKAnon(rows,
        Seq(col("v"), lit("*")), k = 5L).collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "*" && out.head.getLong(0) == 1L)
    assert(out.head.getAs[Boolean]("suppressed"))
  }

  test("tClosenessAudit: skewed classes breach, matched class scores 0") {
    import spark.implicits._
    // global over 2 bins is 50/50; g1 sits all in bin 0, g2 all in
    // bin 1 (both EMD 1/2), g3 mirrors the corpus (EMD 0)
    val df = Seq(("g1", 0L), ("g1", 0L), ("g2", 1L), ("g2", 1L),
      ("g3", 0L), ("g3", 1L)).toDF("grp", "bin")
    val out = Privacy.tClosenessAudit(df, Seq("grp"), "bin",
      bins = 2, tPpm = 400000L).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("emd_ppm"), r.getAs[Boolean]("breaches_t"))).toMap
    assert(out("g1") == ((500000L, true)))
    assert(out("g2") == ((500000L, true)))
    assert(out("g3") == ((0L, false)))
  }

  test("dpTopK suppresses below-threshold values and never emits true counts") {
    // 'hot' appears 100x (clears any +-32 noise at threshold 50);
    // 'rare' appears once (noise tops out at +32 < 50 -> suppressed)
    val items = (Seq.fill(100)("hot") ++ Seq.fill(60)("warm") ++
      Seq("rare")).toDF("token")
    val out = Privacy.dpTopK(items, "token", k = 5, threshold = 50L)
      .collect()
    assert(out.map(_.getString(1)).toSet == Set("hot", "warm"))
    assert(!out.exists(_.getString(1) == "rare"), "a singleton can never clear 50")
    val hot = out.find(_.getString(1) == "hot").get
    assert(hot.getLong(0) == 1L, "hot leads the noisy ranking")
    assert(math.abs(hot.getLong(2) - 100L) <= 32L, "binomial noise is bounded")
    val again = Privacy.dpTopK(items, "token", k = 5, threshold = 50L)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq,
      "md5-derandomized noise replays exactly")
  }
}
