package graft.ops

import graft.SparkSpec

class RecoSpec extends SparkSpec {
  import spark.implicits._

  // users 1-3 all bought {10, 11}; user 4 bought {10} only — CF must
  // recommend 11 to user 4 (3 co-purchase paths), and nothing to users
  // who already own everything co-visible
  private def purchases = Seq(
    (1L, 10L), (1L, 11L),
    (2L, 10L), (2L, 11L),
    (3L, 10L), (3L, 11L),
    (4L, 10L),
    (5L, 12L)) // isolated user: no co-occurrence, no recs
    .toDF("customer", "part")

  test("itemCf recommends the co-purchased item with exact path counts") {
    val out = Reco.itemCf(purchases, "customer", "part",
      topK = 3, maxBasket = 100, minCo = 2L).collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out.head
    assert(r.getAs[Long]("u") == 4L)
    assert(r.getAs[Long]("cand") == 11L)
    assert(r.getAs[Long]("score") == 3L) // users 1,2,3 bridge 10->11
    assert(r.getAs[Long]("n_via") == 1L) // via the single owned item 10
    assert(r.getAs[Long]("rank") == 1L)
  }

  test("itemCf drops owned candidates and respects minCo") {
    // with minCo above the co-count nothing survives
    val none = Reco.itemCf(purchases, "customer", "part",
      topK = 3, maxBasket = 100, minCo = 4L).collect()
    assert(none.isEmpty)
  }

  test("leaveLastOutEval recovers a co-occurrence-supported holdout") {
    // u1 holds out 20; u2/u3 keep {10,20} in train, so sim(10,20)=2
    // reaches minCo and u1's owned {10} recommends 20 at rank 1.
    // u2/u3 hold out items nothing co-occurs with -> misses.
    val inter = Seq(
      (1L, 10L, 1L), (1L, 20L, 2L),
      (2L, 10L, 1L), (2L, 20L, 2L), (2L, 30L, 3L),
      (3L, 10L, 1L), (3L, 20L, 2L), (3L, 40L, 3L)
    ).toDF("u", "it", "t")
    val r = Reco.leaveLastOutEval(inter, topK = 3, minCo = 2L)
      .collect().head
    assert(r.getAs[Long]("n_users_eval") == 3L)
    assert(r.getAs[Long]("n_hits") == 1L)
    assert(r.getAs[Long]("hit_ppm") == 333333L)
    assert(r.getAs[Long]("mrr_ppm") == 333333L)
  }

  test("coverageCard: coverage and popularity mass are exact") {
    val inter = purchases
      .select($"customer".as("u"), $"part".as("it"))
    val recs = Reco.itemCf(purchases, "customer", "part",
      topK = 3, maxBasket = 100, minCo = 2L)
    val r = Reco.coverageCard(recs, inter).collect().head
    // one rec row: item 11 to user 4
    assert(r.getAs[Long]("n_users") == 1L)
    assert(r.getAs[Long]("n_rec_rows") == 1L)
    assert(r.getAs[Long]("n_rec_items") == 1L)
    assert(r.getAs[Long]("n_catalog_items") == 3L) // items 10, 11, 12
    assert(r.getAs[Long]("coverage_ppm") == 333333L)
    // pop(11) = 3 users, max_pop = 4 (item 10) → 3/4
    assert(r.getAs[Long]("mean_pop_ppm") == 750000L)
  }

  test("itemCfIndexed == fused itemCf and never re-shuffles the index") {
    val inter = purchases.select($"customer".as("u"), $"part".as("it"))
    Reco.writeItemIndex(inter.distinct(), "graft_reco_idx_spec",
      maxBasket = 100, minCo = 2L, simTopM = 20, buckets = 4)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val indexed = Reco.itemCfIndexed(spark, "graft_reco_idx_spec",
        inter, topK = 3, maxBasket = 100)
      val fused = Reco.itemCf(purchases, "customer", "part",
        topK = 3, maxBasket = 100, minCo = 2L)
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[Long]("u"), r.getAs[Long]("rank"), r.getAs[Long]("cand"),
          r.getAs[Long]("score"), r.getAs[Long]("n_via"))
      assert(indexed.collect().map(key).toSet ==
        fused.collect().map(key).toSet)
      // the index side of the candidate-generation join must be a
      // co-located bucketed scan: no ShuffleExchange between the scan
      // and the join (the BucketingSpec walk-the-join-side pattern)
      val plan = indexed.queryExecution.executedPlan
      // only the join side whose subtree IS the index scan (no nested
      // join): upstream anti-join/agg sides also contain the scan's
      // string and carry legitimate exchanges (the r8 walk-the-join-
      // side rule)
      val joinSides = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          Seq(j.left, j.right)
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          Seq(j.left, j.right)
      }.flatten.filter(s => s.toString.contains("graft_reco_idx_spec") &&
        s.collect {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
          case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
            j
        }.isEmpty)
      assert(joinSides.nonEmpty,
        s"some join must read the bucketed index:\n$plan")
      joinSides.foreach { side =>
        val shuffles = side.collect {
          case e: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeLike => e
        }
        assert(shuffles.isEmpty,
          s"index side of the join must not re-shuffle:\n$side")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS graft_reco_idx_spec")
    }
  }

  test("itemCf basket prune removes power users from similarity") {
    // user 9's giant basket links EVERYTHING; pruning it leaves only
    // the organic 10-11 signal
    val power = (100L to 140L).map(it => (9L, it)).toDF("customer", "part")
    val df = purchases.unionByName(power)
    val out = Reco.itemCf(df, "customer", "part",
      topK = 3, maxBasket = 10, minCo = 2L).collect()
    assert(out.length == 1 && out.head.getAs[Long]("u") == 4L)
    assertNoCrossProduct(
      Reco.itemCf(df, "customer", "part", 3, 10, 2L), "itemCf")
  }
}
