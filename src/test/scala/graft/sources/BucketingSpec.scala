package graft.sources

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("identically-bucketed tables join with zero Exchange operators") {
    val facts = (1L to 1000L).map(i => (i % 50, s"f$i")).toDF("k", "fact")
    val dims = (0L until 50L).map(i => (i, s"d$i")).toDF("k", "dim")
    Bucketing.writeBucketed(facts, "graft_bucket_facts", "k", buckets = 8)
    Bucketing.writeBucketed(dims, "graft_bucket_dims", "k", buckets = 8)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Bucketing.bucketJoin(spark, "graft_bucket_facts",
        "graft_bucket_dims", "k")
      assert(joined.count() == 1000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_dims")
    }
  }

  /** The join side that READS the bucketed index must contain no
    * ShuffleExchange between the scan and the join — the bucketed layout
    * satisfies the join's required partitioning directly (downstream
    * exchanges above the join, e.g. a pair-dedup aggregation, are fine
    * and expected). AQE is disabled for the assertion so the plan tree
    * is concrete (the production plan shape is identical).
    */
  private def assertIndexSideShuffleFree(
      df: org.apache.spark.sql.DataFrame, table: String): Unit = {
    val plan = df.queryExecution.executedPlan
    val joinSides = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        Seq(j.left, j.right)
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        Seq(j.left, j.right)
    }.flatten.filter(_.toString.contains(table))
    assert(joinSides.nonEmpty,
      s"some join must read the bucketed $table:\n$plan")
    joinSides.foreach { side =>
      val shuffles = side.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(shuffles.isEmpty,
        s"index side of the join must not re-shuffle $table:\n$side")
    }
  }

  private def withPlanAssertConf(f: => Unit): Unit = {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      f
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("bucketed checksum index: incremental exact anti-join never re-shuffles the index") {
    val corpus = (1L to 200L).map(i => (i, s"known doc number ${i % 40}"))
      .toDF("doc_id", "text")
    // batch: 20 docs duplicating known content + 10 novel
    val batch = ((1L to 20L).map(i => (1000L + i, s"known doc number ${i % 40}")) ++
      (1L to 10L).map(i => (2000L + i, s"novel content $i"))).toDF("doc_id", "text")
    graft.ops.Dedup.writeChecksumIndex(corpus, "graft_cs_index", buckets = 4)
    try withPlanAssertConf {
      val inc = graft.ops.Dedup.incrementalExactIndexed(
        spark, batch, "graft_cs_index")
      assert(inc.count() == 10L, "only the 10 novel docs survive")
      assertIndexSideShuffleFree(inc, "graft_cs_index")
      val full = graft.ops.Dedup.incrementalExact(
        batch, spark.table("graft_cs_index")).collect().map(_.getLong(0)).toSet
      assert(full == inc.collect().map(_.getLong(0)).toSet)
    } finally spark.sql("DROP TABLE IF EXISTS graft_cs_index")
  }

  test("bucketed banded-postings index: incremental minhash never re-shuffles the index") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = (1L to 50L).map(i =>
      (i, if (i % 10 == 0) base else s"unique corpus text $i with words " +
        s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")).toDF("doc_id", "text")
    val batch = Seq((9001L, base + " tomorrow"), (9002L, "completely novel " +
      "words about spark catalyst tungsten shuffles and exchanges"))
      .toDF("doc_id", "text")
    graft.ops.Dedup.writeBandedIndex(corpus, "graft_lsh_index", buckets = 4)
    try withPlanAssertConf {
      val inc = graft.ops.Dedup.incrementalMinHashIndexed(
        spark, batch, "graft_lsh_index")
      val pairs = inc.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the near-dup of the planted duplicate cluster must pair vs index
      assert(pairs.exists { case (a, b) => b == 9001L && a % 10 == 0 },
        s"batch near-dup must pair with corpus copies; got $pairs")
      assert(!pairs.exists { case (a, b) => a == 9002L || b == 9002L },
        "novel doc must not pair")
      assertIndexSideShuffleFree(inc, "graft_lsh_index")
      // identical output to the unbucketed operator over the same frames
      val plain = graft.ops.Dedup.incrementalMinHash(batch, corpus)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(plain == pairs, s"indexed $pairs vs plain $plain")
    } finally spark.sql("DROP TABLE IF EXISTS graft_lsh_index")
  }
}
