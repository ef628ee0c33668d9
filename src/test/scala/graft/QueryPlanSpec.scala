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
  // bloom_prune / value_quantile_bins / events_drift cross ONE-ROW
  // aggregates (pass-stats, bounds, totals) onto the stream — a
  // single-row broadcast, the cheapest possible BNLJ
  private val broadcastNlAllowed =
    Set("ann_brute", "ann_ivf", "ann_pq", "label_knn", "embed_cluster",
      "ann_ivfpq", // same nLists-row centroid broadcast as ann_ivf
      "ann_ivf_incremental", // same bounded centroid broadcast, read
                             // back from the index layout for the
                             // append-path probe assignment
      "corpus_zipf", // one-row slope aggregate onto ~log2(vocab) rows
      "graph_degree_dist", // one-row slope onto ~log2(maxdeg) bucket rows
      "embed_isotropy", // three one-row aggregates crossed (1x1x1)
      "graph_transitivity", // three one-row census aggregates crossed
                            // (1x1x1) at the card close
      "vocab_overlap",  // five one-row aggregates crossed at the close
      "graph_modularity", // one-row edge total onto the community frame
      "embed_align", // exact pair mining broadcasts the bounded tgt set
                     // (ANN candidates replace the cross at scale)
      "dedup_semantic", // kmeans centroid table broadcast (k rows)
      "skew_profile", "sales_pareto",
      "bloom_prune", "value_quantile_bins", "events_drift",
      // |sets|² pair enumeration over DISTINCT set ids (5 event types);
      // the constant-key equi-join is folded back to a BNLJ by constant
      // propagation, but the broadcast side is set-count-sized
      "events_audience_overlap",
      "q22_idle",  // one-row positive-balance moments onto the customer scan
      "mix_rates",  // one-row scale aggregate crossed onto |sources| rows
      "mix_temperature", // same one-row scale-election broadcast
      "text_bm25", // one-row (corpus_len, n_docs) total crossed onto the
                   // matched posting slice
      "search_hybrid", // fuses the bm25 chain (same one-row total) with
                       // the ann_brute broadcast query set
      "eval_retrieval", // the same bm25-chain one-row (corpus_len,
                        // n_docs) total under the metric close
      "eval_ndcg", // the same bm25-chain one-row totals under the
                   // literal-discount DCG close
      "search_rerank", // contains the bm25 chain's one-row totals
      "search_indexed", // same bm25 one-row totals over the pruned
                        // postings read
      "search_indexed_incremental", // same one-row totals (summed
                                    // across segment rows) over the
                                    // pruned postings read
      "search_hard_negatives", // same bm25 chain
      "search_prf", // same bm25-chain one-row totals under the
                    // feedback-term expansion close
      "embed_label_noise", // the ann_brute probe BNLJ (bruteTopK) for
                           // the sampled kNN majority vote
      "sketch_heavy_hitters", // one-row n_total crossed onto the
                              // bounded candidate recount frame
      "graph_closeness", // one-row seed-count broadcast onto the
                         // node-keyed distance rollup
      "graph_eigenvector", // one-row L-inf max broadcast for the final
                           // round's integer rescale
      "graph_katz", // the same one-row L-inf max broadcast per round
      "events_sax", // one-row quartile-cuts frame crossed onto the
                    // bounded (type, window) PAA frame
      "events_path_distance", // one-row modal-path election broadcast
                              // onto the bounded distinct-path frame
      "eval_fairness", // one-row overall-rates frame crossed onto the
                       // bounded per-group cells
      "eval_conformal", // one-row order-statistic threshold broadcast
                        // onto the held-out split
      "eval_best_split", // one-row class-total broadcast under the
                         // cumulative Gini windows
      "events_permutation", // observed one-row stat broadcast onto the
                            // bounded reps-row null frame
      "value_ddsketch", // |qs|-row targets non-equi-joined onto the
                        // <=64-row bucket walk
      "events_mahalanobis", // one-row moment frame broadcast onto the
                            // per-user feature frame
      "eval_brier", // one-row span + one-row totals onto <=nBins cells
      "graph_richclub", // two one-row threshold-sweep aggregates crossed
      "join_plan_card", // five one-row cardinality aggregates crossed
      "graph_conductance", // one-row total volume onto the community
                           // frame
      "privacy_tcloseness", // 10-row bin ladder densified onto the
                            // class frame + one-row global total
      "text_novelty", // three one-row gram counts crossed
      "events_rfm",    // one-row corpus-max instant onto |users| rows
      "events_covisit", // one-row session total onto type² pair rows
      "embed_truncation", // one-row total energy onto |dims| rows
      "dq_orphans",    // two one-row audit aggregates crossed together
      "text_kneser_ney", // one-row bigram-type total onto the type table
      "zonemap_audit", // bounded probes × layout-sized zone map (the
                       // corpus itself is scanned once, joins never)
      "bloom_index_audit", // one-row parts_total crossed onto the
                           // bounded probe frame
      "eval_calibration", // one-row (min, max) score span onto the stream
      "eval_pr", // same one-row span + a one-row positive total onto
                 // the bounded bin frame
      "events_flow_symmetry", // one-row reciprocated-mass total onto
                              // the bounded type-pair frame
      "embed_hubness", // the ann_brute probe BNLJ + a one-row-total cross
                       // for the zero-occurrence row
      "graph_diameter", // three ONE-ROW election frames crossed at the
                        // close; the BFS itself is keyed joins only
      "events_cuped", // one-row day-span and one-row θ broadcasts onto
                      // the stream / per-user frame
      "events_uplift", // the cuped one-row day-span broadcast onto the
                       // event stream (decile close is bounded)
      "privacy_generalize", // one-row chosen-level election crossed
                            // back onto the QID key projection
      "sample_negatives", // one-row (W, cell-width) total crossed onto
                          // the topV range frame and the probe stream;
                          // the draw itself is a cell-keyed HASH join
      "part_skyline", // one-row x-range for the grid prune; the frontier
                      // join itself is a keyed broadcast HASH join
      "graph_hits", // L1 normalization divides by a ONE-ROW integer total
                    // each half-round — the same single-row broadcast
      "eval_isotonic", // the minimax j≤k pair frame: bins² over the
                       // BOUNDED quantized score domain, broadcast by
                       // construction (the ann_brute class)
      "sketch_quantiles", // two one-row aggregates (n_sample, n_total)
                          // crossed onto the |qs|-row quantile frame;
                          // the corpus contributes only the TakeOrdered
                          // k-row sample
      "eval_kappa", // one-row chance-agreement aggregate crossed onto
                    // the one-row observed-agreement frame (1×1)
      "reco_coverage", // one-row catalog (count, max-pop) frame crossed
                       // onto the one-row recommendation aggregate (1×1)
      "events_anomaly_seasonal", // one-row median + one-row MAD frames
                                 // crossed onto the bounded daily frame
      "graph_butterflies", // one-row census × one-row size frames (1×1)
      "events_kendall", // day-pair theta self-join over the BOUNDED
                        // day-span frame (C(n,2) on ~90 rows — the
                        // eval_isotonic bounded-domain class)
      "web_robots") // the rule table is a bounded policy artifact
                    // broadcast against the URL stream (prefix theta)

  // dedup_clusters executes its iterative joins eagerly behind
  // localCheckpoint while fn() builds the frame, so this sweep only sees
  // its post-checkpoint scan; the per-round join topology is asserted
  // directly in DedupSpec ("cluster propagation round plans equi-joins").
  // Single-reducer guard for the ANN paths: the per-query ranking over a
  // corpus-scale candidate stream must be two-level (per-partition partial
  // top-k via mapPartitions, then a merge window over |Q|·k·P survivors) —
  // a Window.partitionBy(query_id) directly over the scored corpus sends
  // every row for a query to ONE reducer. The topmost query_id-partitioned
  // window is the merge (or a downstream bounded rank); requiring a
  // MapPartitions partial beneath it catches a revert to the single-window
  // form. Inner query_id windows (ivf's probe-list rank) run over bounded
  // broadcast-side inputs and are exempt by construction.
  // text_search/text_bm25 joined the guard in r7: their matched-doc slice
  // is corpus-sized for a common query term, the same failure shape.
  test("ANN per-query top-k is two-level, never a corpus-wide window") {
    Seq("ann_brute", "ann_pq", "ann_ivf", "ann_lsh", "label_knn",
      "text_search", "text_bm25").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
      val qWindows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.length == 1 &&
            w.partitionSpec.head.toString.contains("query_id") => w
      }
      assert(qWindows.nonEmpty, s"$name: expected a per-query merge window")
      val partials = qWindows.head.collect {
        case m: org.apache.spark.sql.execution.MapPartitionsExec => m
      }
      assert(partials.nonEmpty,
        s"$name: query_id window has no per-partition partial top-k beneath it")
    }
  }

  // textRank's global top-20 over the vocabulary must be a TakeOrdered
  // (per-partition heads + k-row merge); its only unpartitioned window
  // may mint rank numbers over the k survivors, never over the whole
  // vocab (the r9 verdict's one structural scale-killer).
  test("text_textrank top-k is a TakeOrdered, not a vocab-wide window") {
    val exec = SparkEntry.queries("text_textrank")(spark, sfDir)
      .queryExecution.sparkPlan
    val takeOrdered = exec.collect {
      case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
    }
    assert(takeOrdered.nonEmpty, "expected TakeOrderedAndProject")
    exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }.foreach { w =>
      assert(w.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty,
        "unpartitioned window must rank a TakeOrdered-bounded input")
    }
  }

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
