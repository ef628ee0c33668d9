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

  test("blockedMatch plans an equi-join, not a cross product") {
    import spark.implicits._
    val recs = Seq((1L, "a", "b1"), (2L, "b", "b1")).toDF("rec_id", "name", "block")
    assertNoCrossProduct(Linkage.blockedMatch(recs), "blockedMatch")
  }
}
