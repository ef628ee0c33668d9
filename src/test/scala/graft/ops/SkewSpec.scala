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

  test("salts spread a hot key across sub-keys") {
    val facts = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val dim = Seq((1L, "hot")).toDF("k", "name")
    val saltCounts = facts
      .withColumn("__salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(
            facts.columns.map(org.apache.spark.sql.functions.col): _*),
          org.apache.spark.sql.functions.lit(8)))
      .groupBy("__salt").count().collect()
    assert(saltCounts.length == 8, "hot key must split across all salts")
    assert(saltCounts.map(_.getLong(1)).max < 1000L)
    // correctness under the hot key
    assert(Skew.saltedJoin(facts, dim, "k").count() == 1000L)
  }
}
