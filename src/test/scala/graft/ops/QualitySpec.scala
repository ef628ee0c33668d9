package graft.ops

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("violations reports every rule, zeros included, in one frame") {
    val df = Seq(
      (1L, Some(5.0), 10L),
      (2L, Some(50.0), 10L),  // out of range
      (3L, None, 11L),        // null
      (4L, Some(7.0), 12L),
      (4L, Some(8.0), 13L)    // duplicate id
    ).toDF("id", "v", "ref")
    val dim = Seq(10L, 11L, 12L).toDF("k") // 13 is an orphan
    val out = Quality.violations(df, Seq(
      Quality.NotNull("v"),
      Quality.InRange("v", 0, 10),
      Quality.Unique(Seq("id")),
      Quality.RefIntegrity("ref", dim, "k"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "not_null:v" -> 1L,
      "in_range:v" -> 1L,   // nulls don't double-count as range misses
      "unique:id" -> 1L,    // one row beyond the first for id=4
      "ref:ref" -> 1L))     // the orphan 13
  }

  test("observe piggybacks DQ counters on the consuming action") {
    val obs = new org.apache.spark.sql.Observation("dq")
    val df = Seq((1L, Some(5.0)), (2L, Some(50.0)), (3L, None))
      .toDF("id", "v")
    val observed = Quality.observe(df, obs, Seq(
      Quality.NotNull("v"), Quality.InRange("v", 0, 10)))
    observed.count() // the only action: metrics ride on it
    val m = obs.get
    assert(m("not_null:v") == 1L)
    assert(m("in_range:v") == 1L)
  }

  test("a clean table yields all-zero rows, not an empty frame") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val out = Quality.violations(df, Seq(
      Quality.NotNull("v"), Quality.Unique(Seq("id")))).collect()
    assert(out.length == 2)
    assert(out.forall(_.getLong(1) == 0L))
  }

  test("drift is zero for identical distributions, positive when shifted") {
    val a = (Seq.fill(60)("x") ++ Seq.fill(40)("y")).toDF("c")
    val same = Quality.drift(a, a, "c").collect()
    assert(same.forall(_.getAs[Long]("chi2_scaled") == 0L))
    // b flips the mix 60/40 -> 20/80: every category contributes
    val b = (Seq.fill(20)("x") ++ Seq.fill(80)("y")).toDF("c")
    val drifted = Quality.drift(a, b, "c")
      .collect().map(r => r.getAs[String]("cat") ->
        r.getAs[Long]("chi2_scaled")).toMap
    assert(drifted("x") > 0L && drifted("y") > 0L)
    // hand check: x pooled e=40 per side, (60-40)^2/40 = 10 each side
    assert(drifted("x") == 20000000L)
  }

  test("drift counts categories missing from one side") {
    val a = Seq("x", "x", "y").toDF("c")
    val b = Seq("x", "x", "x").toDF("c")
    val out = Quality.drift(a, b, "c")
      .collect().map(r => (r.getAs[String]("cat"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))).toSet
    assert(out == Set(("x", 2L, 3L), ("y", 1L, 0L)))
  }

  test("orphans counts unmatched foreign keys, nulls reported separately") {
    val fact = Seq(Some(1L), Some(1L), Some(9L), Some(8L), None)
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val r = Quality.orphans(fact, "fk", dim, "id").collect()(0)
    assert(r.getAs[Long]("fact_rows") == 5L)
    assert(r.getAs[Long]("null_keys") == 1L)
    assert(r.getAs[Long]("orphan_rows") == 2L)   // keys 9 and 8
    assert(r.getAs[Long]("orphan_keys") == 2L)
    assert(r.getAs[Long]("orphan_ppm") == 400000L) // 2/5
  }

  test("orphans on a fully-covered fact table is all zeros") {
    val fact = Seq(1L, 2L).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val r = Quality.orphans(fact, "fk", dim, "id").collect()(0)
    assert(r.getAs[Long]("orphan_rows") == 0L &&
      r.getAs[Long]("orphan_keys") == 0L &&
      r.getAs[Long]("orphan_ppm") == 0L)
  }

  test("fdViolations emits only violating keys with witness bounds") {
    val df = Seq(
      (1L, "a"), (1L, "a"),           // key 1 holds the FD -> absent
      (2L, "a"), (2L, "b"), (2L, "b"),// key 2 violates: 2 values, 3 rows
      (3L, null.asInstanceOf[String]), (3L, "c") // NULL counts as a value
    ).toDF("k0", "v0")
    val out = Quality.fdViolations(df, "k0", "v0").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3)), Option(r.getString(4))))
    assert(out.toSeq == Seq(
      (2L, 3L, 2L, Some("a"), Some("b")),
      (3L, 2L, 2L, Some("c"), Some("c"))))
  }

  test("keyAudit verdicts: unique key, dup single column, null combo") {
    import spark.implicits._
    val df = Seq((1L, Some(10L), "a"), (2L, Some(10L), "b"),
      (3L, None: Option[Long], "c"))
      .toDF("id", "grp", "tag")
    val out = Quality.keyAudit(df,
      Seq(Seq("id"), Seq("grp"), Seq("grp", "tag"))).collect()
      .map(r => r.getAs[String]("combo") ->
        (r.getAs[Long]("n_distinct"), r.getAs[Long]("n_null_rows"),
          r.getAs[Boolean]("is_key"))).toMap
    assert(out("id") == ((3L, 0L, true)))
    assert(out("grp") == ((2L, 1L, false)), "dup 10 + a null row")
    assert(out("grp+tag") == ((3L, 1L, false)),
      "distinct but a NULL component disqualifies a key")
  }

  test("quarantine routes rows with declaration-ordered reason strings") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5.0), Some(0.01)),    // clean
      (2L, Some(99.0), Some(0.01)),   // quantity breach
      (3L, Some(99.0), Some(0.5)),    // both breaches, rule order
      (4L, None, Some(0.5))           // null quantity passes NotNull-less
    ).toDF("id", "q", "d")
    val out = Quality.quarantine(df, Seq(
      Quality.InRange("q", 1, 40), Quality.InRange("d", 0, 0.05)))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("reasons"), r.getAs[Boolean]("quarantined")))
      .toMap
    assert(out(1L) == (("", false)))
    assert(out(2L) == (("in_range:q", true)))
    assert(out(3L) == (("in_range:q,in_range:d", true)))
    assert(out(4L) == (("in_range:d", true)),
      "nulls don't violate InRange; only the real breach is tagged")
  }
}
