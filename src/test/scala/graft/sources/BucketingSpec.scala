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
}
