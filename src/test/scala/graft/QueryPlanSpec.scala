package graft

import graft.SparkSpec

/** Structural scale guard over the ENTIRE driver contract: no registered
  * query may plan a CartesianProduct, and only the two queries that
  * intentionally broadcast a tiny side against the corpus scan
  * (ann_brute's query set, ann_ivf's centroid table) may use a
  * BroadcastNestedLoopJoin. Catches any future operator change that
  * silently degenerates into an all-pairs product.
  */
class QueryPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  // intentional BNLJ: a bounded broadcast side (|Q| queries / nLists
  // centroids / label_knn's unlabeled set) streamed against the corpus —
  // the designed scale shape
  // skew_profile and sales_pareto join a ONE-ROW total aggregate onto
  // key-cardinality counts — a broadcast of a single row, the cheapest
  // possible BNLJ
  private val broadcastNlAllowed =
    Set("ann_brute", "ann_ivf", "ann_pq", "label_knn", "embed_cluster",
      "skew_profile", "sales_pareto")

  // dedup_clusters executes its iterative joins eagerly behind
  // localCheckpoint while fn() builds the frame, so this sweep only sees
  // its post-checkpoint scan; the per-round join topology is asserted
  // directly in DedupSpec ("cluster propagation round plans equi-joins").
  test("no registered query plans a cross product") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name: CartesianProduct in plan")
      if (!broadcastNlAllowed.contains(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name: unexpected BroadcastNestedLoopJoin")
    }
  }
}
