package graft.ops

import graft.SparkSpec

class LinkageSpec extends SparkSpec {

  test("blockedMatch pairs within-block names at edit distance <= maxDist") {
    import spark.implicits._
    val recs = Seq(
      (1L, "acme corp", "ac"),
      (2L, "acme c0rp", "ac"),   // dist 1 from #1
      (3L, "acme inc", "ac"),    // dist 4 from #1 — above cutoff
      (4L, "zenith", "ze"),
      (5L, "acme corp", "zz")    // identical name, DIFFERENT block: no pair
    ).toDF("rec_id", "name", "block")
    val got = Linkage.blockedMatch(recs, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 1L)))
  }

  test("oversized blocks are dropped by the cap") {
    import spark.implicits._
    val big = (1L to 20L).map(i => (i, s"name$i", "hot"))
    val ok = Seq((100L, "x", "cold"), (101L, "x", "cold"))
    val recs = (big ++ ok).toDF("rec_id", "name", "block")
    val got = Linkage.blockedMatch(recs, maxDist = 2, maxBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((100L, 101L)))
  }

  test("symspellJoin matches exactly the pairs within levenshtein 1") {
    import spark.implicits._
    val clean = Seq((1L, "customer"), (2L, "castomer"), (3L, "zzz"))
      .toDF("rec_id", "name")
    val dirty = Seq(
      (10L, "custmer"),   // deletion of 'o' → dist 1 to #1 only
      (11L, "customer"),  // dist 0 to #1 AND dist 1 to #2 (u→a sub)
      (12L, "cstomr"),    // two deletions → dist 2 to #1: candidate, filtered
      (13L, "qqq")        // unrelated
    ).toDF("rec_id", "name")
    val got = Linkage.symspellJoin(dirty, clean)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((10L, 1L, 1L), (11L, 1L, 0L), (11L, 2L, 1L)))
  }

  test("symspellJoin finds substitutions through the shared-deletion variant") {
    import spark.implicits._
    val clean = Seq((1L, "abcd")).toDF("rec_id", "name")
    val dirty = Seq((10L, "abXd"), (11L, "Xbcd"), (12L, "abcX"))
      .toDF("rec_id", "name")
    val got = Linkage.symspellJoin(dirty, clean)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((10L, 1L, 1L), (11L, 1L, 1L), (12L, 1L, 1L)))
  }

  test("symspellJoin plans an equi-join, not a cross product") {
    import spark.implicits._
    val l = Seq((1L, "ab")).toDF("rec_id", "name")
    val r = Seq((2L, "ac")).toDF("rec_id", "name")
    assertNoCrossProduct(Linkage.symspellJoin(l, r), "symspellJoin")
  }

  test("blockedMatch plans an equi-join, not a cross product") {
    import spark.implicits._
    val recs = Seq((1L, "a", "b1"), (2L, "b", "b1")).toDF("rec_id", "name", "block")
    assertNoCrossProduct(Linkage.blockedMatch(recs), "blockedMatch")
  }

  test("goldenRecords folds components with deterministic survivorship") {
    import spark.implicits._
    val recs = Seq(
      (1L, "acme corp", 10.0),
      (2L, "acme corp", 30.0),
      (3L, "acme inc", 20.0),   // linked via pair (2,3)
      (4L, "zenith", 99.0)      // unmatched singleton
    ).toDF("rec_id", "name", "acctbal")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val out = Linkage.goldenRecords(recs, pairs).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[String]("canonical_name"),
          r.getAs[Double]("max_acctbal"), r.getAs[Long]("n_members"))).toMap
    assert(out.keySet === Set(1L, 4L))
    // most frequent name wins (acme corp x2 beats acme inc x1)
    assert(out(1L) === ((1L, "acme corp", 30.0, 3L)))
    assert(out(4L) === ((4L, "zenith", 99.0, 1L)))
  }


  test("emLinkage separates planted matches without labels") {
    import spark.implicits._
    // 4 latent matches (all features agree) among 16 clear non-matches
    // (all disagree) plus 4 ambiguous pairs (name only)
    val pairs = (Seq.fill(4)((true, true, true)) ++
      Seq.fill(16)((false, false, false)) ++
      Seq.fill(4)((true, false, false)))
      .toDF("f_name", "f_phone", "f_bal")
    val out = Linkage.emLinkage(pairs, Seq("f_bal", "f_name", "f_phone"),
        rounds = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size == 3)
    for ((f, r) <- out) {
      assert(r.getAs[Long]("m_ppm") > r.getAs[Long]("u_ppm"),
        s"$f: m must exceed u after EM")
      assert(r.getAs[Long]("n_pairs") == 24L)
    }
    // full-agreement pairs classify as matches; all-disagree ones don't
    val matched = out("f_name").getAs[Long]("n_matched")
    assert(matched >= 4L && matched <= 8L,
      s"posterior matches $matched outside the planted band")
    val p = out("f_name").getAs[Long]("p_ppm")
    assert(p > 100000L && p < 400000L, s"prevalence $p off the ~1/6-1/3 band")
  }

  test("phoneticBlocking: classic soundex pairs, verified by edit distance") {
    import spark.implicits._
    val toks = Seq("robert", "rupert", "red", "rod", "blue")
      .map(Tuple1(_)).toDF("t")
    val out = Linkage.phoneticBlocking(toks, "t", maxLev = 3).collect()
      .map(r => (r.getAs[String]("code"), r.getAs[String]("tok_a"),
        r.getAs[String]("tok_b"), r.getAs[Long]("lev"))).toSet
    // robert/rupert share the textbook R163; red/rod share R300;
    // blue (B400) blocks alone
    assert(out == Set(("R163", "robert", "rupert", 2L),
      ("R300", "red", "rod", 1L)))
  }
}
