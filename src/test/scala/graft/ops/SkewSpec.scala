package graft.ops

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows") {
    // heavily skewed: 90% of facts on key 1
    val facts = ((1 to 900).map(i => (1L, s"row$i")) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, s"tail$i")))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "name")
    val plain = facts.join(dim, "k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(facts, dim, "k", salts = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("column-identical duplicate rows of a hot key still join correctly") {
    // the pathological case for content-only salting: every row identical
    val facts = (1 to 1000).map(_ => (1L, "same")).toDF("k", "v").repartition(8)
    val dim = Seq((1L, "hot")).toDF("k", "name")
    assert(Skew.saltedJoin(facts, dim, "k").count() == 1000L)
  }

  test("reserved __salt column is rejected up front") {
    val facts = Seq((1L, 0)).toDF("k", "__salt")
    val dim = Seq((1L, "x")).toDF("k", "name")
    intercept[IllegalArgumentException](Skew.saltedJoin(facts, dim, "k"))
  }

  test("keyProfile surfaces the heaviest keys with exact shares") {
    val df = (Seq.fill(6)(7L) ++ Seq.fill(3)(8L) ++ Seq(9L))
      .map(Tuple1(_)).toDF("k")
    val out = Skew.keyProfile(df, "k", topN = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((7L, 6L, 10L, 0.6), (8L, 3L, 10L, 0.3)))
  }

  test("joinCardinality predicts the exact join bill with top contributors") {
    import spark.implicits._
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("k0")     // counts: 1->3, 2->1, 3->1
    val r = Seq(1L, 1L, 2L, 4L).toDF("k1")          // counts: 1->2, 2->1, 4->1
    val out = Skew.joinCardinality(l, "k0", r, "k1", topK = 1).collect()
    val total = out.find(_.getString(0) == "total").get
    // matched keys: 1 (3*2=6), 2 (1*1=1) -> bill 7
    assert(total.getLong(4) == 7L)
    val top = out.find(_.getString(0) == "key").get
    assert(top.getLong(1) == 1L && top.getLong(4) == 6L)
    // the bill equals the actual join size
    assert(l.join(r, $"k0" === $"k1").count() == 7L)
  }
}
