package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over normalized edge lists — the algorithms the
  * reference's consumers run inside Neo4j GDS after the ETL lands
  * (reference: load_with_aliases.py loads nodes/edges for downstream
  * graph processing). A complete Spark-native replacement offers them
  * directly over the edge DataFrames, so the 100 TB pre-aggregation and
  * the graph pass share one engine. Companion to
  * [[Dedup.resolveClusters]] (connected components over near-dup pairs).
  */
object Graph {

  /** Per-node degree statistics over a directed edge list
    * `(src, dst)`: out-degree, in-degree, total. Two partial-aggregated
    * shuffles (one per direction) merged by a full outer join on node id —
    * every shuffle is keyed on node id; cardinality is |V|, not |E|.
    */
  def degreeStats(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
      .withColumn("total_deg", col("out_deg") + col("in_deg"))
  }

  /** PageRank in fixed-point integer arithmetic — bit-reproducible across
    * runs, partitionings, and engines, unlike double accumulation whose
    * result depends on shuffle reduction order. Ranks are scaled by
    * `Scale` (10^12); each of `iters` rounds computes
    *
    *   r'(v) = (15·S) div 100  +  (85 · Σ_{(u,v)∈E} r(u) div outdeg(u)) div 100
    *
    * entirely in BIGINT `div` — the deterministic twin of damping 0.85
    * (truncation loses < 1e-12 of mass per term; the ranking is
    * unaffected and the arithmetic is engine-exact, so the DuckDB oracle
    * hash-matches instead of drifting in the last float ulp).
    *
    * Scale shape: out-degrees are joined to the edge list ONCE up front;
    * each round is one edges⋈ranks equi-join + a partial-aggregated
    * shuffle on dst + a left join back to the node set — all keyed on
    * node id, never all-pairs. Unlike [[Dedup.resolveClusters]]'s
    * self-join (whose lineage grows exponentially without truncation),
    * `ranks` is referenced once per round, so the plan grows LINEARLY —
    * rounds chain lazily into one multi-stage job, with a
    * `localCheckpoint` only every `checkpointEvery` rounds to bound
    * optimizer time on long runs. Dangling nodes (no
    * out-edges) simply leak their mass, the common simplification; add a
    * redistribution term if true probability conservation is needed.
    */
  val Scale: Long = 1000000000000L // 10^12

  /** `init`: optional warm-start ranks `(id, r)` in `Scale` units — the
    * incremental-maintenance form: resume from yesterday's fixed point
    * after an edge delta instead of recomputing from uniform; nodes the
    * init doesn't cover (new today) seed at `Scale`. Warm-starting is
    * EXACT in the unrolled-recursion sense: resume(k rounds) from a
    * j-round state == cold (j+k)-round run on an unchanged graph.
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
               checkpointEvery: Int = 10,
               init: Option[DataFrame] = None): DataFrame = {
    val base = 15L * Scale / 100L
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true) // referenced twice per round: compute once
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // degree rides on the edge list once; rounds only join ranks
    val edgesDeg = e.join(outdeg, "src").localCheckpoint(true)
    var ranks = init match {
      case Some(w) => nodes
        .join(w.select(col("id"), col("r")), Seq("id"), "left")
        .select(col("id"), coalesce(col("r"), lit(Scale)).as("r"))
        .localCheckpoint(true)
      case None => nodes.withColumn("r", lit(Scale))
    }
    var i = 0
    while (i < iters) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
      ranks = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(base) + expr("(85 * coalesce(cin, 0L)) div 100")).as("r"))
      i += 1
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("id"), col("r").as("rank_scaled"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** Degree-distribution power-law card: node counts per log2-degree
    * bucket plus the least-squares slope of log2(count) vs
    * log2(degree) — is this graph scale-free, and is its hub tail
    * growing between snapshots? (The skew forecast that decides salting
    * and hub caps BEFORE a join melts down.) Both axes quantize via the
    * portable bit-length log2 (`length(ltrim(bin(x), '0'))`), the slope
    * derives from four order-free integer sums with ONE final double
    * division (the zipfProfile recipe — a negative-numerator `div`
    * would hit the truncate-vs-floor trap), and the one-row slope
    * broadcasts onto the bounded bucket rows. Degenerate single-bucket
    * graphs report a NULL slope (0/0), never a wrong one.
    */
  def degreeDistribution(edges: DataFrame): DataFrame = {
    def log2i(c: Column): Column = length(ltrim(bin(c), "0")).cast("long")
    val deg = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val buckets = deg
      .groupBy(log2i(col("deg")).as("deg_bucket"))
      .agg(count(lit(1)).as("n_nodes"), min(col("deg")).as("min_deg"),
        max(col("deg")).as("max_deg"))
    val pts = buckets.select(col("deg_bucket").as("x"),
      log2i(col("n_nodes")).as("y"))
    val slope = pts.agg(
      count(lit(1)).as("nb"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
      .select(when(col("nb") * col("sxx") - col("sx") * col("sx") =!= 0,
        (col("nb") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("nb") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("powerlaw_slope"))
    buckets.crossJoin(broadcast(slope))
  }

  /** GraphSAGE-style neighborhood feature aggregation: per node, the
    * count/sum/min/max over 1-hop neighbor features and the
    * PATH-WEIGHTED 2-hop sum (Σ over neighbors of their own 1-hop
    * sums — exactly a 2-layer GNN sum-aggregator's receptive field,
    * path multiplicity included) — the tabular feature-engineering
    * pass that turns a graph into trainable per-node columns without
    * ever materializing neighborhoods.
    *
    * The 2-hop layer composes on the AGGREGATED hop-1 frame (one more
    * node-keyed equi-join), so cost is |E| per layer — never the
    * neighbor-of-neighbor explosion Σdeg² that a literal 2-hop
    * enumeration pays on hub nodes. Integer features make every
    * aggregate order-free exact. hop-1 is referenced twice (output +
    * the hop-2 join) and is node-sized → localCheckpoint, the
    * reco_itemcf rule. Expects edges `(src, dst)` (mirror first for
    * undirected) and features `(id, f)`.
    */
  def neighborAgg(edges: DataFrame, feats: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val h1 = e
      .join(feats.select(col("id").as("dst"), col("f")), "dst")
      .groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"), sum(col("f")).as("h1_sum"),
        min(col("f")).as("h1_min"), max(col("f")).as("h1_max"))
      .localCheckpoint()
    val h2 = e
      .join(h1.select(col("id").as("dst"), col("h1_sum").as("nh")), "dst")
      .groupBy(col("src").as("id"))
      .agg(sum(col("nh")).as("h2_sum"))
    h1.join(h2, Seq("id"), "left")
  }

  /** DeepWalk-style embedding training corpus END TO END: random walks
    * become "sentences", and the skip-gram (center, context) pair
    * counts over them are exactly what a word2vec-family trainer (or
    * the NetMF matrix factorization view) consumes. Composes
    * [[randomWalks]] with the per-offset equi-join pair generation of
    * `TextAnalysis.skipgramStats` — pairs are (earlier node, later
    * node) within `window` walk positions, counted.
    *
    * Scale shape: the walk frame tokenizes once and is
    * localCheckpointed (it feeds all `window` offset joins — the
    * reco_itemcf multi-reference lesson); each offset is a keyed
    * (walk_id, pos+k) equi-join — linear in total walk length, never a
    * per-walk position cross product; the close is one partial-agg
    * count on the (a, b) pair key, bounded by the co-occurrence
    * structure, not the corpus.
    */
  def walkCorpus(edges: DataFrame, seeds: DataFrame, steps: Int = 4,
                 window: Int = 2): DataFrame = {
    require(window >= 1)
    val toks = randomWalks(edges, seeds, steps)
      .select(col("walk_id"),
        posexplode(split(col("path"), "->")).as(Seq("pos", "tok")))
      .select(col("walk_id"), col("pos"), col("tok").cast("long").as("node"))
      .localCheckpoint()
    (1 to window).map { k =>
      toks.as("a").join(toks.as("b"),
        col("a.walk_id") === col("b.walk_id") &&
          col("b.pos") === col("a.pos") + k)
        .select(col("a.node").as("a"), col("b.node").as("b"))
    }.reduce(_ unionByName _)
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
  }

  /** Weighted PageRank: transition mass splits ∝ integer edge weights
    * (co-occurrence counts, interaction frequencies) instead of
    * uniformly over out-neighbors — the GDS `relationshipWeightProperty`
    * variant the unweighted walk cannot express (a 100-count edge and a
    * 1-count edge carry the same mass unweighted). Identical fixed-point
    * BIGINT topology to [[pageRank]]; the per-edge contribution
    * `floor(r·w / W)` (W = Σ out-weights) computes WITHOUT the r·w
    * overflow as `w·(r div W) + ((r mod W)·w) div W` — exact because
    * r = (r div W)·W + (r mod W), and BIGINT-safe whenever
    * (r mod W)·w < 9.2·10^18, i.e. W·w_max < 9.2·10^18 (w_max ~ 10^6
    * edges of weight ~ 10^6 per node) — far past any real degree
    * distribution, where naive r·w overflows at w ≈ 10^6 already.
    * Expects `(src, dst, w)` with positive integer weights; rounds
    * chain lazily (ranks referenced once per round), static frames
    * checkpoint once.
    */
  def weightedPageRank(edges: DataFrame, iters: Int = 5,
                       checkpointEvery: Int = 10): DataFrame = {
    val base = 15L * Scale / 100L
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true) // referenced twice per round: compute once
    val wout = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val edgesW = e.join(wout, "src").localCheckpoint(true)
    var ranks = nodes.withColumn("r", lit(Scale))
    var i = 0
    while (i < iters) {
      val contribs = edgesW
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"),
          expr("w * (r div wout) + ((r % wout) * w) div wout").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
      ranks = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(base) + expr("(85 * coalesce(cin, 0L)) div 100")).as("r"))
      i += 1
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("id"), col("r").as("rank_scaled"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** ArticleRank — the GDS PageRank variant that damps hub influence by
    * adding the MEAN out-degree to every per-node divisor:
    *
    *   r'(v) = 0.15·S + (85 · Σ_{(u,v)∈E} r(u) div (outdeg(u) + avgdeg)) div 100
    *
    * with `avgdeg = Σ outdeg div |src nodes|` (floored once, a one-row
    * aggregate broadcast onto the edge frame — never a driver pull). A
    * node pointing at thousands of targets contributes barely more per
    * target than one pointing at few, so citation-farm hubs stop
    * dominating. Same fixed-point BIGINT `div` arithmetic, linear
    * lazy-chained lineage, and unrolled-CTE oracle shape as [[pageRank]];
    * the registered query is engine-exact.
    */
  def articleRank(edges: DataFrame, iters: Int = 5,
                  checkpointEvery: Int = 10): DataFrame = {
    val base = 15L * Scale / 100L
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true) // referenced twice per round: compute once
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val avg = outdeg.agg(
      expr("sum(outdeg) div count(*)").as("avgdeg")) // one-row scalar
    val edgesDeg = e.join(outdeg, "src").crossJoin(broadcast(avg))
      .withColumn("den", col("outdeg") + col("avgdeg"))
      .localCheckpoint(true)
    var ranks = nodes.withColumn("r", lit(Scale))
    var i = 0
    while (i < iters) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("r div den").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
      ranks = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .select(col("id"),
          (lit(base) + expr("(85 * coalesce(cin, 0L)) div 100")).as("r"))
      i += 1
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("id"), col("r").as("rank_scaled"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** Eigenvector centrality by fixed-round power iteration with
    * max-normalization — the remaining GDS centrality this library
    * lacked (PageRank's damping-free ancestor: a node is central when
    * its IN-neighbors are central, with no teleport floor). Each round
    * computes y(v) = Σ_{(u,v)∈E} x(u) and rescales to
    * `x := y·10⁶ div max(y)` so the leader always reads 10⁶ — the
    * integer twin of L∞ normalization, keeping every value bounded (no
    * overflow at any degree) and the whole recursion BIGINT-exact. The
    * max is a one-row aggregate broadcast back onto the frame — never a
    * driver pull. Fixed `iters` rounds make the result deterministic
    * and oracle-exact regardless of spectral-gap convergence (the
    * fixed-round recipe); pass the MIRRORED edge list for the
    * undirected GDS default. Each round's raw-sum frame is referenced
    * twice (its own max + the rescale) → localCheckpoint per round (the
    * clusters rule). An edgeless graph emits all-zero scores, never a
    * division error. Output: `(id, x_scaled)` with x_scaled ∈ [0, 10⁶].
    */
  def eigenvectorCentrality(edges: DataFrame, iters: Int = 5): DataFrame = {
    val S6 = 1000000L
    // static frame referenced once per PER-ITER JOB (y checkpoints each
    // iter, so exchange reuse cannot cross rounds): checkpoint once
    // instead of re-scanning the source every iteration (r15)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    var x = nodes.withColumn("x", lit(S6))
    var i = 0
    while (i < iters) {
      val y = nodes
        .join(e.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst")).agg(sum(col("x")).as("y")),
          nodes("id") === col("dst"), "left")
        .select(col("id"), coalesce(col("y"), lit(0L)).as("y"))
        .localCheckpoint(true) // referenced by its own max AND the rescale
      val m = y.agg(max(col("y")).as("m"))
      // rescale numerator through DECIMAL(38,0): y ≤ 10⁶·indeg, so the
      // LONG product y·10⁶ would wrap once indeg exceeds ~9.2e6 (hub
      // nodes at the 100 TB target); `div` on decimals returns BIGINT
      // and the quotient is bounded by 10⁶ by construction
      x = y.crossJoin(broadcast(m))
        .select(col("id"),
          when(col("m") <= 0L, lit(0L))
            .otherwise(
              expr(s"CAST(y AS DECIMAL(38,0)) * ${S6}L div m")).as("x"))
      i += 1
    }
    x.select(col("id"), col("x").as("x_scaled"))
  }

  /** Personalized PageRank: the teleport mass returns to a SEED set
    * instead of spreading uniformly — "importance relative to these
    * entities", the graph-expansion score behind related-item and
    * fraud-neighborhood queries (the seeded variant of the GDS algorithm
    * the reference's consumers run post-ETL). Identical fixed-point
    * BIGINT `div` arithmetic and round topology to [[pageRank]]; the only
    * change is the reset term: seeds receive `0.15·Scale` each round and
    * everyone else receives 0, so mass decays everywhere except along
    * paths out of the seed neighborhood. Seed ids absent from the edge
    * list are ignored. `ranks` is referenced once per round → rounds
    * chain lazily (linear lineage), periodic checkpoint only.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iters: Int = 5,
                           checkpointEvery: Int = 10): DataFrame = {
    val base = 15L * Scale / 100L
    val e = edges.select(col("src"), col("dst"))
    // seed flag rides on the node set once; rounds only join ranks
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .join(seeds.select(col("id"), lit(1L).as("is_seed")), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgesDeg = e.join(outdeg, "src").localCheckpoint(true)
    var ranks = nodes.select(col("id"), (col("is_seed") * lit(Scale)).as("r"))
    var i = 0
    while (i < iters) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
      ranks = nodes
        .join(contribs, nodes("id") === contribs("dst"), "left")
        .select(nodes("id"),
          (col("is_seed") * lit(base) +
            expr("(85 * coalesce(cin, 0L)) div 100")).as("r"))
      i += 1
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("id"), col("r").as("rank_scaled"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** Weighted single-source (multi-seed) shortest paths, bounded at
    * `maxHops` relaxation rounds — Bellman-Ford with a hop budget, the
    * weighted twin of [[bfs]] (GDS sourceTarget/deltaStepping territory;
    * a hop-bounded answer is what neighborhood-cost queries actually
    * need, and the FIXED round count gives a plan a bounded oracle can
    * reproduce). Directed; mirror the edge list first for undirected
    * cost. Integer weights keep every distance exact.
    *
    * Scale shape per round: one dist⋈edges equi-join on the source id +
    * a min partial-agg on dst + a left join back to the node set — all
    * keyed shuffles. `dist` is referenced twice per round (relaxation
    * input AND the least() merge), so every round localCheckpoints —
    * the [[Dedup.resolveClusters]] rule, not [[pageRank]]'s lazy chain.
    */
  def shortestPaths(edges: DataFrame, seeds: DataFrame,
                    maxHops: Int = 4): DataFrame = {
    // dist checkpoints per round, so each relaxation is its own job:
    // checkpoint the static weighted edge frame once (r15)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    var dist = nodes
      .join(seeds.select(col("id"), lit(0L).as("dist")), Seq("id"), "left")
      .localCheckpoint(true)
    var i = 0
    while (i < maxHops) {
      val relaxed = e
        .join(dist.select(col("id").as("src"), col("dist").as("sd")), "src")
        .filter(col("sd").isNotNull)
        .select(col("dst").as("id"), (col("sd") + col("w")).as("nd"))
        .groupBy(col("id")).agg(min(col("nd")).as("nd"))
      // least() skips nulls in both Spark and DuckDB — unreached stays
      // null until a candidate arrives
      dist = dist.join(relaxed, Seq("id"), "left")
        .select(col("id"), least(col("dist"), col("nd")).as("dist"))
        .localCheckpoint(true)
      i += 1
    }
    dist.filter(col("dist").isNotNull)
      .select(col("id"), col("dist"))
  }

  /** Widest (max-capacity / bottleneck) paths, the max-min twin of
    * [[shortestPaths]]: cap(v) = best over paths seed→v of the MINIMUM
    * edge weight along the path — network-throughput / reliability
    * routing, and the similarity-graph "strongest connection chain"
    * readout. (max, min) is a semiring, so hop-bounded Bellman-Ford
    * relaxation is sound at any round budget: after k rounds cap(v) is
    * exact over paths of ≤ k edges (monotone — extra rounds only
    * improve toward the fixed point, the [[shortestPaths]]
    * convention). Seeds start at Long.MaxValue (min(∞, w) = w on the
    * first relaxation); `greatest()` skips NULLs in both engines
    * exactly like `least()`, so unreached nodes stay NULL until a
    * candidate arrives. Integer weights keep every capacity exact;
    * plan shape and per-round localCheckpoint discipline are
    * [[shortestPaths]]'s (dist is referenced twice per round).
    */
  def widestPaths(edges: DataFrame, seeds: DataFrame,
                  maxHops: Int = 4): DataFrame = {
    // cap checkpoints per round, so each relaxation is its own job:
    // checkpoint the static weighted edge frame once (r15)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    var cap = nodes
      .join(seeds.select(col("id"), lit(Long.MaxValue).as("cap")),
        Seq("id"), "left")
      .localCheckpoint(true)
    var i = 0
    while (i < maxHops) {
      val relaxed = e
        .join(cap.select(col("id").as("src"), col("cap").as("sc")), "src")
        .filter(col("sc").isNotNull)
        .select(col("dst").as("id"), least(col("sc"), col("w")).as("nc"))
        .groupBy(col("id")).agg(max(col("nc")).as("nc"))
      cap = cap.join(relaxed, Seq("id"), "left")
        .select(col("id"), greatest(col("cap"), col("nc")).as("cap"))
        .localCheckpoint(true)
      i += 1
    }
    cap.filter(col("cap").isNotNull)
      .select(col("id"), col("cap"))
  }

  /** Rich-club coefficient sweep — does the network's high-degree core
    * wire to ITSELF (hubs trading with hubs — the topology that makes
    * hub failures catastrophic and hub-first sampling effective)? For
    * each degree threshold k: φ(k) = 2·E_k / (N_k·(N_k−1)) over the
    * subgraph of nodes with degree > k, as exact ppm (N_k < 2 → NULL).
    * Undirected simple graph: edges canonicalize to (lo, hi) distinct
    * before degrees, so multi-edges never inflate either count.
    *
    * Scale shape: degree agg + two keyed joins stamp (deg_a, deg_b)
    * onto every edge; ALL thresholds then close in ONE pass each over
    * edges and nodes as conditional partial aggs (one row per frame),
    * crossed and re-exploded to |ks| rows — no per-k scan.
    */
  def richClub(edges: DataFrame,
               ks: Seq[Int] = Seq(1, 2, 4, 8, 16, 32)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 0))
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()                 // feeds degrees AND both joins
    val deg = und.select(col("a").as("id"))
      .unionByName(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val stamped = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(least(col("da"), col("db")).as("dmin"))
    val eRow = stamped.groupBy().agg(
      ks.map(k => sum(when(col("dmin") > k, 1L).otherwise(0L))
        .as(s"e_$k")).head,
      ks.map(k => sum(when(col("dmin") > k, 1L).otherwise(0L))
        .as(s"e_$k")).tail: _*)
    val nRow = deg.groupBy().agg(
      ks.map(k => sum(when(col("deg") > k, 1L).otherwise(0L))
        .as(s"n_$k")).head,
      ks.map(k => sum(when(col("deg") > k, 1L).otherwise(0L))
        .as(s"n_$k")).tail: _*)
    val wide = eRow.crossJoin(broadcast(nRow))
    ks.map { k =>
      wide.select(lit(k.toLong).as("k"),
        col(s"n_$k").as("n_nodes"), col(s"e_$k").as("n_edges"),
        when(col(s"n_$k") >= 2,
          expr(s"2000000L * e_$k div (n_$k * (n_$k - 1))"))
          .as("phi_ppm"))
    }.reduce(_ unionByName _)
  }

  /** GraphSAGE-style k-hop neighborhood sampling — the GNN-minibatch
    * primitive: from each seed, keep at most `fanouts(h)` neighbors per
    * frontier node per hop, so a minibatch touches Π fanouts edges
    * instead of the full exponential neighborhood (the only way GNN
    * training survives a power-law graph). Sampling is DERANDOMIZED
    * uniform-without-replacement: rank neighbors by
    * md5("nbr:" ‖ hop ‖ ":" ‖ src ‖ ":" ‖ dst) and keep the smallest
    * `fanout` — reproducible across runs/engines, and a re-run of the
    * same epoch sees the same subgraph (the curriculum-stability
    * requirement). Per hop: one frontier-keyed join + one per-src rank
    * window bounded by the node's adjacency; the frontier never holds
    * more than Π fanouts · |seeds| nodes.
    */
  def sampleNeighbors(edges: DataFrame, seeds: DataFrame,
                      fanouts: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(fanouts.nonEmpty && fanouts.forall(_ >= 1))
    val e = edges.select(col("src"), col("dst")).distinct()
    var frontier = seeds.select(col("id")).distinct()
    var out: Option[DataFrame] = None
    fanouts.zipWithIndex.foreach { case (f, h) =>
      val sampled = e
        .join(frontier.select(col("id").as("src")), "src")
        .withColumn("r", row_number().over(
          Window.partitionBy("src").orderBy(
            md5(concat(lit(s"nbr:$h:"), col("src").cast("string"),
              lit(":"), col("dst").cast("string"))), col("dst"))))
        .filter(col("r") <= f)
        .select(lit(h.toLong).as("hop"), col("src"), col("dst"))
        .localCheckpoint()            // feeds output AND next frontier
      out = Some(out.fold(sampled)(_ unionByName sampled))
      frontier = sampled.select(col("dst").as("id")).distinct()
    }
    out.get
  }

  /** Community conductance card — the CUT-quality readout that
    * complements modularity's density view: for each community c,
    * φ(c) = cut / min(vol(c), vol(rest)) as exact ppm — how much of
    * the community's edge volume leaks out (low = well-separated,
    * ~1e6 = the labeling fights the topology). Works on ANY labeling
    * (attribute communities, labelprop output, shard assignments —
    * the partitioner-quality use case at 100 TB: φ IS the cross-shard
    * traffic share).
    *
    * Scale shape: canonical distinct edges + two keyed label joins
    * stamp (ca, cb); per-community internal/cut close in one
    * partial-agg over an endpoint explode (internal edges emit once —
    * no double count); vol = 2·internal + cut needs no degree pass;
    * one-row total volume broadcasts (whitelisted).
    */
  def conductance(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()                  // feeds stamping AND nodes
    val lab = labels.select(col("id"), col("c"))
    val st = und
      .join(lab.select(col("id").as("a"), col("c").as("ca")), "a")
      .join(lab.select(col("id").as("b"), col("c").as("cb")), "b")
      .localCheckpoint()                  // feeds both endpoint emits
    val perC = st.select(col("ca").as("c"),
        when(col("ca") === col("cb"), 1L).otherwise(0L).as("internal"),
        when(col("ca") =!= col("cb"), 1L).otherwise(0L).as("cut"))
      .unionByName(st.filter(col("ca") =!= col("cb"))
        .select(col("cb").as("c"), lit(0L).as("internal"),
          lit(1L).as("cut")))
      .groupBy(col("c"))
      .agg(sum(col("internal")).as("internal"), sum(col("cut")).as("cut"))
      .withColumn("vol", expr("2L * internal + cut"))
    val nodes = und.select(col("a").as("id"))
      .unionByName(und.select(col("b").as("id"))).distinct()
      .join(lab, "id").groupBy(col("c"))
      .agg(count(lit(1)).as("n_nodes"))
    val total = st.agg((count(lit(1)) * 2L).as("total_vol"))
    nodes.join(perC, Seq("c"))
      .crossJoin(broadcast(total))
      .select(col("c"), col("n_nodes"), col("internal"), col("cut"),
        col("vol"),
        expr("1000000L * cut div greatest(least(vol, total_vol - vol)," +
          " 1L)").as("phi_ppm"))
  }

  /** Canonical undirected co-occurrence edges: two items are connected
    * when they share a group (parts in the same order, entities in the
    * same document, ...). The within-group self-join is the only fan-out,
    * and `maxGroupSize` caps it — the co-occurrence twin of jaccard's
    * stop-shingle df-pruning: a hot group of size g contributes g² pairs,
    * so at 100 TB ungated groups (a viral document, a mega-order) would
    * dominate the shuffle; gated ones are bounded and the cap is an
    * explicit, documented knob.
    */
  def coOccurrence(df: DataFrame, groupCol: String, itemCol: String,
                   maxGroupSize: Int = 100): DataFrame = {
    // Size-prune BEFORE collecting: the count-over-window caps every
    // group at maxGroupSize rows, so the collect_list aggregation buffer
    // that follows is bounded even when one viral group holds millions of
    // items. The groupBy then runs on the window's own hash partitioning
    // (both key on g) — no extra exchange.
    val pruned = df.select(col(groupCol).as("g"), col(itemCol).as("item"))
      .distinct()
      .withColumn("gsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .filter(col("gsz") <= maxGroupSize && col("gsz") >= 2)
      .drop("gsz")
    // Emit each group's C(g,2) ordered pairs straight from the sorted item
    // array — replacing the posting self-join, which shuffled nothing new
    // (ReusedExchange) but materialized every pair twice through join
    // machinery. Generation is one interpreted lambda per GROUP (not per
    // row), consumed once by the explode, so projection collapse cannot
    // re-evaluate it.
    pruned
      .groupBy(col("g")).agg(sort_array(collect_list(col("item"))).as("items"))
      .select(explode(orderedPairs("items")).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
      .distinct()
  }

  /** Borůvka minimum spanning forest — the distributed MST classic and
    * the backbone of single-linkage clustering (feed similarity-graph
    * edges with w = −strength and the forest IS the dendrogram's merge
    * order). Per round, every component elects its minimum outgoing
    * edge under the TOTAL order (w, lo, hi) — ties broken, so the MST
    * is unique and the safety lemma certifies every chosen edge is in
    * it AT ANY ROUND BUDGET (monotone-sound, the kTruss convention);
    * `rounds` halves the component count each time, so R rounds finish
    * any graph with ≤ 2^R initial components per tree. Within a round
    * the chosen-edge merge groups collapse by min-label propagation
    * run to CONVERGENCE (capped + require()d — a partially merged
    * label would let the next round elect an intra-component edge and
    * break the certificate).
    *
    * Scale shape: per round, two label-keyed joins stamp edge
    * endpoints, one partial-agg min(struct) elects per component, and
    * the merge propagation runs over the COMPONENT graph (≤ one node
    * per component — shrinks 2× per round); labels localCheckpoint
    * every round (multi-consumer, the kCore rule). Returns the chosen
    * forest edges (round, lo, hi, w).
    */
  def boruvkaForest(edges: DataFrame, rounds: Int = 3,
                    mergeCap: Int = 6): DataFrame = {
    // rounds = 0 never initializes the forest frame (NPE at the final
    // select); guard like the sibling iterative ops (ADVICE r11)
    require(rounds >= 1 && mergeCap >= 1,
      "boruvkaForest needs rounds >= 1 and mergeCap >= 1")
    val spark = edges.sparkSession
    val canon = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"), col("w").cast("long"))
      .filter(col("lo") =!= col("hi"))
      .groupBy(col("lo"), col("hi")).agg(min(col("w")).as("w"))
      .localCheckpoint(true)
    var labels = canon.select(col("lo").as("id"))
      .union(canon.select(col("hi").as("id"))).distinct()
      .withColumn("lab", col("id"))
      .localCheckpoint(true)
    var forest: DataFrame = null
    for (r <- 0 until rounds) {
      val stamped = canon
        .join(labels.select(col("id").as("lo"), col("lab").as("la")), Seq("lo"))
        .join(labels.select(col("id").as("hi"), col("lab").as("lb")), Seq("hi"))
        .filter(col("la") =!= col("lb"))
      val chosen = stamped
        .select(explode(array(col("la"), col("lb"))).as("c"),
          struct(col("w"), col("lo"), col("hi"),
            col("la"), col("lb")).as("e"))
        .groupBy(col("c")).agg(min(col("e")).as("e"))
        .select(col("e.w").as("w"), col("e.lo").as("lo"),
          col("e.hi").as("hi"), col("e.la").as("la"), col("e.lb").as("lb"))
        .distinct()
        .localCheckpoint(true) // feeds the forest AND the merge graph
      val newEdges = chosen.select(lit(r.toLong).as("round"),
        col("lo"), col("hi"), col("w"))
      forest = if (forest == null) newEdges else forest.unionByName(newEdges)
      // merge group labels: min-label propagation over the chosen-edge
      // component graph, run to convergence (component-count-sized)
      val mg = chosen.select(col("la").as("a"), col("lb").as("b"))
        .union(chosen.select(col("lb").as("a"), col("la").as("b")))
      var m = labels.select(col("lab").as("c")).distinct()
        .withColumn("root", col("c"))
      var converged = false
      var step = 0
      while (!converged && step < mergeCap) {
        val prop = m
          .join(mg.withColumnRenamed("a", "c"), Seq("c"), "left")
          .join(m.select(col("c").as("b"), col("root").as("nroot")),
            Seq("b"), "left")
          .groupBy(col("c"))
          .agg(least(min(col("root")), min(col("nroot"))).as("root"))
          .localCheckpoint(true) // referenced twice by the jump self-join
        // pointer jump (root := root(root)): doubles the reach per step
        // so `mergeCap` bounds chains of length ~2^mergeCap, not
        // mergeCap — the sf10 densified chosen-edge chains exceeded a
        // hop-per-step cap (BENCH_sf10_r14 graph_mst failure). The
        // merge still runs to the SAME converged min-label fixed point,
        // so the single-hop unrolled oracle is unchanged.
        val next = prop
          .join(prop.select(col("c").as("root"), col("root").as("rroot")),
            Seq("root"), "left")
          .select(col("c"), coalesce(col("rroot"), col("root")).as("root"))
          .localCheckpoint(true)
        converged = next.alias("n")
          .join(m.alias("p"), col("n.c") === col("p.c"))
          .filter(col("n.root") =!= col("p.root")).isEmpty
        m = next
        step += 1
      }
      require(converged,
        s"boruvkaForest: merge propagation exceeded $mergeCap steps")
      labels = labels
        .join(m.select(col("c").as("lab"), col("root")), Seq("lab"))
        .select(col("id"), col("root").as("lab"))
        .localCheckpoint(true)
    }
    forest.select(col("round"), col("lo"), col("hi"), col("w"))
  }

  /** Kahn layer decomposition (topological levels) over a DAG — the
    * dependency-scheduling primitive: layer(v) = length of the longest
    * path from a source into v, computed by repeatedly peeling
    * zero-in-degree nodes (layer r = nodes whose every in-edge comes
    * from layers < r). Nodes still unassigned after `maxRounds` peels —
    * members of a cycle, or deeper than the budget — surface a NULL
    * layer honestly (the coloring/MIS leftovers rule), never a wrong
    * level; a DAG whose depth fits the budget is fully assigned, and
    * extra rounds past exhaustion are no-ops so the fixed-round
    * unrolled oracle is exact.
    *
    * Scale shape: each peel is two anti-joins keyed on the node id
    * (frontier election against remaining in-edge targets; edge
    * retirement by source) — the kcore drop-set lesson applies: the
    * frontier and remaining frames shrink monotonically and are
    * checkpointed per round, and the loop exits early on an empty
    * frontier.
    */
  def kahnLayers(edges: DataFrame, maxRounds: Int = 8): DataFrame = {
    require(maxRounds >= 1)
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    var remaining = e.localCheckpoint(true)
    var unassigned = nodes
    var assigned: DataFrame = null
    var r = 0
    var done = false
    while (r < maxRounds && !done) {
      val frontier = unassigned
        .join(remaining.select(col("dst").as("id")).distinct(),
          Seq("id"), "left_anti")
        .withColumn("layer", lit(r.toLong))
        .localCheckpoint(true)
      if (frontier.isEmpty) done = true
      else {
        assigned =
          if (assigned == null) frontier else assigned.unionByName(frontier)
        unassigned = unassigned
          .join(frontier.select(col("id")), Seq("id"), "left_anti")
          .localCheckpoint(true)
        remaining = remaining
          .join(frontier.select(col("id").as("src")), Seq("src"),
            "left_anti")
          .localCheckpoint(true)
        r += 1
      }
    }
    val got = if (assigned == null) {
      nodes.withColumn("layer", lit(null).cast("long")).limit(0)
    } else assigned
    nodes.join(got, Seq("id"), "left")
      .select(col("id"), col("layer"))
  }

  /** Time-respecting earliest-arrival reachability over a TEMPORAL edge
    * list (src, dst, ts): a path is valid only if its edge timestamps
    * never decrease past each node's arrival time — the
    * epidemiology/influence/contact-tracing semantics a static BFS
    * gets WRONG (a static path may use an edge that fired before the
    * walker arrived). Per hop, ea(v) relaxes to min(ea(v), min ts of
    * an in-edge usable at or after ea(u)) — a Bellman–Ford-style
    * integer `least()` merge, so the frame is exact and
    * engine-portable. Seeds start at `startTs`; nodes never reached
    * within `maxHops` are absent (the hop budget certifies an UPPER
    * bound on arrival, mirroring diameterSweep's lower-bound
    * convention).
    *
    * Scale shape: per hop, ONE edges⋈state equi-join keyed on src with
    * the time filter as a residual, a partial-aggregated min per dst,
    * and a full-outer `least` merge; state is the REACHED set only.
    * The merge references state twice (join + coalesce side) →
    * localCheckpoint every hop (the kCore rule).
    */
  def temporalReachability(edges: DataFrame, seeds: DataFrame,
                           maxHops: Int = 4,
                           startTs: Long = 0L): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("ts").cast("long"))
      .distinct().localCheckpoint(true)
    var state = seeds.select(col("id")).distinct()
      .withColumn("ea", lit(startTs))
      .localCheckpoint(true)
    for (_ <- 0 until maxHops) {
      val relax = e.join(state.withColumnRenamed("id", "src"), Seq("src"))
        .filter(col("ts") >= col("ea"))
        .groupBy(col("dst"))
        .agg(min(col("ts")).as("cand"))
        .select(col("dst").as("id"), col("cand"))
      state = state.join(relax, Seq("id"), "full_outer")
        .select(col("id"), least(col("ea"), col("cand")).as("ea"))
        .localCheckpoint(true)
    }
    state
  }

  /** Jones–Plassmann greedy graph coloring with fixed md5 priorities —
    * the parallel-coloring classic (register allocation, conflict-free
    * scheduling, SGD partitioning over a conflict graph). Per round,
    * every UNcolored node that holds the highest (md5-priority, id)
    * among its uncolored neighbours takes the smallest color absent
    * from its already-colored neighbourhood (the mex); everyone else
    * waits. Fixed priorities + fixed `rounds` make the run
    * deterministic AND oracle-exact (the Luby-MIS r8 recipe), and
    * nodes still uncolored at the budget surface `color = NULL` —
    * labeled undecided, never guessed. Colored nodes form a PROPER
    * partial coloring by construction: two adjacent winners can never
    * tie on (priority, id).
    *
    * Scale shape: per round, one adjacency⋈state join keyed on the
    * node (neighbour colors + the uncolored-max election ride the same
    * frame), a mex via a bounded explode (pigeonhole: mex ≤ #used
    * colors, so `sequence(0, m)` is neighbourhood-bounded — no HOF
    * fold in the hot path), and the state update. State references the
    * adjacency twice per round → localCheckpoint every round (the
    * kCore rule).
    */
  def greedyColoring(edges: DataFrame, rounds: Int = 6): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    def pri(c: Column): Column =
      conv(substring(md5(concat(lit("col:"), c.cast("string"))), 1, 8),
        16, 10).cast("long")
    var state = und.select(col("src").as("id")).distinct()
      .withColumn("pri", pri(col("id")))
      .withColumn("color", lit(null).cast("long"))
      .localCheckpoint(true)
    for (_ <- 0 until rounds) {
      val nbrs = und.join(
        state.select(col("id").as("dst"), col("pri").as("n_pri"),
          col("color").as("n_color")), Seq("dst"))
        .select(col("src").as("id"), col("dst").as("nbr"),
          col("n_pri"), col("n_color"))
        .localCheckpoint(true) // feeds the election, used set, and mex
      val maxUnc = nbrs.filter(col("n_color").isNull)
        .groupBy(col("id"))
        .agg(max(struct(col("n_pri").as("p"), col("nbr").as("i"))).as("mx"))
      val used = nbrs.filter(col("n_color").isNotNull)
        .select(col("id"), col("n_color").as("c")).distinct()
      val mex = used.groupBy(col("id")).agg(count(lit(1)).as("m"))
        .select(col("id"), explode(expr("sequence(0L, m)")).as("k"))
        .join(used.withColumnRenamed("c", "k"), Seq("id", "k"), "left_anti")
        .groupBy(col("id")).agg(min(col("k")).as("mex"))
      state = state
        .join(maxUnc, Seq("id"), "left")
        .join(mex, Seq("id"), "left")
        .withColumn("color",
          when(col("color").isNotNull, col("color"))
            .when(col("mx").isNull ||
              struct(col("pri").as("p"), col("id").as("i")) > col("mx"),
              coalesce(col("mex"), lit(0L)))
            .otherwise(lit(null).cast("long")))
        .select(col("id"), col("pri"), col("color"))
        .localCheckpoint(true)
    }
    state.select(col("id"), col("color"))
  }

  /** All C(n,2) ordered (src < dst) pairs of a sorted array column. The
    * aggregation buffer feeding this must be capped upstream (hot-group /
    * hub pruning) so no group collects unbounded items.
    */
  private def orderedPairs(itemsCol: String) = expr(
    s"""flatten(transform($itemsCol, (x, i) ->
       |  transform(slice($itemsCol, i + 2, size($itemsCol)),
       |    y -> named_struct('src', x, 'dst', y))))""".stripMargin)

  /** Per-node triangle participation counts over an undirected graph
    * (edges in either orientation; self-loops dropped). Nodes in no
    * triangle are absent (zero).
    *
    * Degree-ordered compact-forward enumeration: every edge is oriented
    * from its lower-(degree, id) endpoint to the higher one, wedges are
    * generated at each triangle's LOWEST-degree vertex (out-neighbor
    * pairs of u), and closed by an equi-join back to the oriented edge
    * list. Orientation bounds each vertex's wedge fan-out by its oriented
    * out-degree — O(E^1.5) total wedges regardless of skew, where naive
    * id-ordering lets one low-id hub generate deg² wedges. All joins are
    * equi-joins on node/edge keys. The enumerated triangle SET is
    * orientation-independent, so an engine-exact oracle can use the
    * simple id-ordered enumeration.
    */
  /** Degree-ordered triangle enumeration over a canonical `(a, b)` edge
    * list — each triangle exactly once as `(x, y, z)`. The orientation
    * bounds wedge fan-out by the smaller endpoint's degree (the classic
    * hub-killer); shared by [[triangleCounts]] and [[kTruss]].
    */
  private def triangleRows(canon: DataFrame): DataFrame = {
    val deg = canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    // orient each edge toward the higher (degree, id) endpoint, carrying
    // the destination's order key for the wedge-pair comparison
    val oriented = canon
      .join(deg.select(col("id").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("b")).otherwise(col("a")).as("v"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          col("db")).otherwise(col("da")).as("dv"))
    // referenced THREE times (both wedge sides + the closing join):
    // materialize once instead of re-running the canon→deg→orient chain
    // per reference (r15: graph_triangles read its source 30×)
    val o = oriented.localCheckpoint(true)
    o.as("e1")
      .join(o.as("e2"),
        col("e1.u") === col("e2.u") &&
          struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v")))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
      .join(o.select(col("u").as("y"), col("v").as("z")), Seq("y", "z"))
  }

  /** Local clustering coefficient per node: `2·T(v) / (deg·(deg−1))`
    * as an exact integer ppm — how tightly each node's neighborhood
    * closes (the community-ness / spam-farm-ness signal per node,
    * where [[triangleCounts]] alone leaves the degree normalization to
    * the reader). Composes the degree-ordered triangle enumeration
    * (wedge fan-out bounded by the smaller endpoint's degree) with the
    * canonical degree table; nodes with deg < 2 report 0. All operands
    * positive → `div` is floor in both engines.
    */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true) // feeds deg + the triangle orientation (r15)
    val deg = canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val tri = triangleRows(canon)
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    deg.join(tri, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          expr("2000000L * coalesce(n_triangles, 0L)" +
            " div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("cc_ppm"))
  }

  def triangleCounts(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true) // referenced 3x inside the orientation (r15)
    triangleRows(canon)
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Global transitivity census — 3·triangles / wedges, the one-number
    * cohesion statistic next to the per-node
    * [[clusteringCoefficient]] (global transitivity weights hubs by
    * their wedge count where the mean local coefficient weights every
    * node equally — the two disagree on skewed graphs, which is why a
    * graph report carries both). One-row card: nodes, edges, wedges,
    * triangles, transitivity ppm.
    *
    * Scale shape: wedges fold per node from the degree table
    * (C(deg,2) through DECIMAL(38,0) — a 1e9-degree hub alone holds
    * 5e17 wedges, and the SUM can pass BIGINT); triangles ride the
    * degree-ordered orientation of [[triangleRows]] (wedge fan-out
    * bounded by the smaller endpoint). Two one-row frames cross-joined
    * at the close.
    */
  def transitivityCard(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true) // feeds degrees AND the triangle join
    val deg = canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val base = deg.agg(count(lit(1)).as("n_nodes"),
      // per-node C(deg,2): product through DECIMAL(38,0) (a 1e9-degree
      // hub's deg² wraps LONG), integral div 2 back to LONG, decimal sum
      sum(expr("CAST(deg AS DECIMAL(38,0)) * (deg - 1) div 2")
        .cast("decimal(38,0)")).as("wedges_d"))
    val tri = triangleRows(canon).agg(count(lit(1)).as("n_triangles"))
    val edgesN = canon.agg(count(lit(1)).as("n_edges"))
    base.crossJoin(broadcast(tri)).crossJoin(broadcast(edgesN))
      .select(col("n_nodes"), col("n_edges"),
        col("wedges_d").cast("long").as("n_wedges"), col("n_triangles"),
        expr("""CASE WHEN wedges_d = 0 THEN NULL
                ELSE CAST(CAST(n_triangles AS DECIMAL(38,0)) * 3000000
                  div wedges_d AS BIGINT) END""").as("transitivity_ppm"))
  }

  /** Per-edge embeddedness — |N(a) ∩ N(b)| for every edge (a, b), the
    * tie-strength signal from Granovetter-style network analysis (an
    * edge with zero common neighbors is a local bridge; high
    * embeddedness marks intra-community ties). Exactly the triangle
    * support of the edge, so it reuses [[triangleRows]]'s degree-
    * ordered enumeration: each triangle votes +1 for its three edges,
    * one partial-aggregated groupBy on the canonical pair collects the
    * votes, and a left join back to the edge list keeps the
    * zero-support bridges visible.
    */
  def edgeEmbeddedness(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true) // feeds the triangle join AND the close
    val support = triangleRows(canon)
      .select(explode(array(
        struct(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b")),
        struct(least(col("x"), col("z")).as("a"),
          greatest(col("x"), col("z")).as("b")),
        struct(least(col("y"), col("z")).as("a"),
          greatest(col("y"), col("z")).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_common"))
    canon.join(support, Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
  }

  /** Katz-attenuated centrality by fixed-round damped power iteration
    * with integer L∞ normalization — [[eigenvectorCentrality]]'s
    * better-conditioned sibling (GDS's other spectral centrality):
    * every node gets a unit base mass each round and in-neighbor mass
    * arrives attenuated by β = ½, so peripheral nodes keep nonzero
    * scores and the recursion never degenerates onto the dominant
    * eigenvector alone. Round: `y(v) = 10⁶ + (Σ_{(u,v)∈E} x(u)) div 2`
    * (the bit-shift attenuation recipe — no libm), then the eigenvector
    * rescale `x := y·10⁶ div max(y)` with the numerator through
    * DECIMAL(38,0). All-integer, fixed `iters` rounds → unrolled-CTE
    * exact oracle. Same per-round shape as eigenvector: one keyed
    * contribution join + partial agg, one-row max broadcast,
    * localCheckpoint per round (y feeds its own max AND the rescale).
    */
  def katzCentrality(edges: DataFrame, iters: Int = 5): DataFrame = {
    val S6 = 1000000L
    // checkpoint the static edge frame once — each iter is its own job
    // (y checkpoints), so lazy e re-scans the source per round (r15)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    var x = nodes.withColumn("x", lit(S6))
    var i = 0
    while (i < iters) {
      // LONG sum is safe: x ≤ 10⁶ after the rescale, so the in-sum
      // wraps only past ~9.2e12 incident edges per node — and ANSI
      // throws loudly there rather than wrapping
      val y = nodes
        .join(e.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst"))
            .agg(sum(col("x")).as("yin")),
          nodes("id") === col("dst"), "left")
        .select(col("id"),
          (lit(S6) + expr("coalesce(yin, 0L) div 2")).as("y"))
        .localCheckpoint(true) // referenced by its own max AND the rescale
      val m = y.agg(max(col("y")).as("m"))
      x = y.crossJoin(broadcast(m))
        .select(col("id"),
          when(col("m") <= 0L, lit(0L))
            .otherwise(
              expr(s"CAST(y AS DECIMAL(38,0)) * ${S6}L div m")).as("x"))
      i += 1
    }
    x.select(col("id"), col("x").as("x_scaled"))
  }

  /** Derandomized independent-cascade influence spread — the
    * Monte-Carlo estimator behind influence maximization (Kempe et
    * al.), made engine-reproducible: edge (u, v) is ACTIVE in trial t
    * iff `md5(u:v:t) % 10⁶ < pPpm` (the md5-threshold Bernoulli
    * recipe), and the spread of the seed set in a trial is its
    * hop-bounded reach over that trial's active subgraph. Fixed salts
    * make every trial a deterministic subgraph, so the whole estimate
    * is hash-oracled — no RNG, no approximate check.
    *
    * Scale shape: the trial fan is |E|·trials rows filtered to
    * ~p·|E|·trials active edges ONCE (checkpointed — it feeds every
    * hop); each hop is one (trial, node)-keyed equi-join + distinct;
    * all trials advance together (the betweenness all-seeds pattern).
    * Output per trial: active edges and nodes reached.
    */
  def independentCascade(edges: DataFrame, seeds: DataFrame,
                         pPpm: Long = 300000L, trials: Int = 3,
                         maxHops: Int = 3): DataFrame = {
    require(trials >= 1 && maxHops >= 1 && pPpm >= 0 && pPpm <= 1000000L)
    val tfan = explode(lit((0 until trials).map(_.toLong).toArray))
    val act = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).distinct()
      .withColumn("trial", tfan)
      .filter(expr(
        """CAST(conv(substring(md5(concat(CAST(src AS STRING), ':',
          |CAST(dst AS STRING), ':', CAST(trial AS STRING))), 1, 8),
          |16, 10) AS BIGINT) % 1000000""".stripMargin) < pPpm)
      .select(col("trial"), col("src"), col("dst"))
      .localCheckpoint(true) // feeds every hop
    var reach = seeds.select(col("id").cast("long").as("id")).distinct()
      .withColumn("trial", tfan).select(col("trial"), col("id"))
      .localCheckpoint(true)
    (1 to maxHops).foreach { _ =>
      val step = reach.join(act,
          reach("trial") === act("trial") && reach("id") === act("src"))
        .select(act("trial").as("trial"), col("dst").as("id"))
      reach = reach.unionByName(step).distinct().localCheckpoint(true)
    }
    val spread = reach.groupBy(col("trial"))
      .agg(count(lit(1)).as("n_reached"))
    act.groupBy(col("trial")).agg(count(lit(1)).as("n_active_edges"))
      .join(spread, Seq("trial"), "full")
      .select(col("trial"),
        coalesce(col("n_active_edges"), lit(0L)).as("n_active_edges"),
        coalesce(col("n_reached"), lit(0L)).as("n_reached"))
  }

  /** Bipartite butterfly (2×2 biclique / 4-cycle) census — the bipartite
    * graph's analogue of the triangle count, THE cohesion statistic for
    * user–item / order–part interaction graphs (triangles are
    * structurally impossible there). A butterfly is two left nodes
    * sharing two right nodes; counting goes through wedges: for every
    * right-node pair with co-support c (shared left neighbors),
    * butterflies += C(c, 2). Emits a one-row census card: edges, left/
    * right node counts, wedges, co-supported pairs, butterflies, and
    * the per-edge bipartite clustering signal (4·butterflies per wedge,
    * ppm).
    *
    * Scale shape: edges are deduped once; wedge generation self-joins
    * on the LEFT key, so its fan-out is Σ C(deg_left, 2) — callers put
    * the BOUNDED-degree side on the left (orders hold ≤ 7 lineitems;
    * user sessions are capped), exactly how production butterfly
    * counters (ParButterfly) pick the low-degree side. The co-support
    * aggregation is one partial-aggregated groupBy on right-pair keys;
    * C(c,2) folds per pair before the final one-row rollup, so nothing
    * corpus-sized ever sits in one reducer.
    */
  def butterflyCensus(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").as("l"), col("dst").as("r"))
      .distinct().localCheckpoint(true) // feeds three branches below
    val pairs = e.as("x").join(e.as("y"), col("x.l") === col("y.l") &&
        col("x.r") < col("y.r"))
      .groupBy(col("x.r").as("r1"), col("y.r").as("r2"))
      .agg(count(lit(1)).as("c"))
    val census = pairs.agg(
      sum(col("c")).as("n_wedges"),
      sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_cosupported_pairs"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * (c - 1) div 2"))
        .cast("long").as("n_butterflies"))
    val sizes = e.agg(count(lit(1)).as("n_edges"),
      countDistinct(col("l")).as("n_left"),
      countDistinct(col("r")).as("n_right"))
    sizes.crossJoin(broadcast(census)) // one row × one row
      // a butterfly-free graph yields an EMPTY pair frame, whose
      // ungrouped agg is NULL — coalesce so the zero branch is real
      .withColumn("n_wedges", coalesce(col("n_wedges"), lit(0L)))
      .withColumn("n_cosupported_pairs",
        coalesce(col("n_cosupported_pairs"), lit(0L)))
      .withColumn("n_butterflies", coalesce(col("n_butterflies"), lit(0L)))
      .withColumn("coherence_ppm", expr(
        """CASE WHEN n_wedges = 0 THEN 0L
           ELSE CAST(CAST(n_butterflies AS DECIMAL(38,0)) * 4000000
                div n_wedges AS BIGINT) END"""))
  }

  /** k-truss peel: iteratively remove edges supported by fewer than
    * `k-2` triangles in the CURRENT graph. Removal is monotone-sound —
    * support only falls as edges leave, so a dropped edge is provably
    * outside the k-truss at ANY round budget. The loop stops early when
    * a round removes nothing, at which point the survivors are EXACTLY
    * the k-truss (`status = truss`); if the budget runs out first they
    * are reported `candidate`, never overclaimed (the scc soundness
    * rule). The edge analogue of [[kCore]] — the cohesive-subgraph
    * filter community detection and spam-cluster mining start from.
    *
    * Scale shape per round: one degree-ordered triangle enumeration
    * ([[triangleRows]] — wedge fan-out bounded by the smaller
    * endpoint's degree), one keyed count to per-edge support, a
    * left-join drop test, and an anti-join removal; the edge frame is
    * localCheckpointed (it feeds the enumeration's three self-join
    * branches). Output: `(lo, hi, status ∈ removed_<round> | truss |
    * candidate)` for every input edge.
    */
  def kTruss(edges: DataFrame, k: Int = 4, rounds: Int = 3): DataFrame = {
    require(k >= 3 && rounds >= 1)
    var e = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .localCheckpoint(true)
    var removed = e.limit(0).withColumn("status", lit(""))
    var r = 0
    var lastDrop = -1L
    while (r < rounds && lastDrop != 0) {
      val sup = triangleRows(e.select(col("lo").as("a"), col("hi").as("b")))
        .select(explode(array(
          struct(least(col("x"), col("y")).as("lo"),
            greatest(col("x"), col("y")).as("hi")),
          struct(least(col("x"), col("z")).as("lo"),
            greatest(col("x"), col("z")).as("hi")),
          struct(least(col("y"), col("z")).as("lo"),
            greatest(col("y"), col("z")).as("hi")))).as("t"))
        .select(col("t.lo"), col("t.hi"))
        .groupBy(col("lo"), col("hi")).agg(count(lit(1)).as("s"))
      val dropped = e.join(sup, Seq("lo", "hi"), "left")
        .filter(coalesce(col("s"), lit(0L)) < k - 2)
        .select(col("lo"), col("hi"))
        .localCheckpoint(true)
      lastDrop = dropped.count()
      if (lastDrop > 0) {
        removed = removed.unionByName(
          dropped.withColumn("status", lit(s"removed_${r + 1}")))
        e = e.join(dropped, Seq("lo", "hi"), "left_anti")
          .localCheckpoint(true)
      }
      r += 1
    }
    val finalStatus = if (lastDrop == 0L) "truss" else "candidate"
    removed.unionByName(e.withColumn("status", lit(finalStatus)))
  }

  /** Node similarity — Jaccard over out-neighbor sets, the GDS
    * `nodeSimilarity` the reference's consumers run after a load: two
    * source nodes score |N(a) ∩ N(b)| / |N(a) ∪ N(b)|, reported top-k per
    * node above a cutoff.
    *
    * Inverted-index shape (the same scale skeleton as shingle-based
    * near-dup): a pair is generated per SHARED neighbor, so candidate
    * generation is an equi-join on the neighbor id — never node×node.
    * Hub neighbors (degree > `dfMax`) are pruned by a count-over-window
    * before the self-join, capping per-neighbor fan-out exactly like
    * stop-shingle pruning; GDS's own degreeCutoff plays this role.
    * Degrees for the union term come from a groupBy on the src key, and
    * the intersection division is one exact IEEE op — engine-portable.
    */
  def nodeSimilarity(edges: DataFrame, topK: Int = 10,
                     minScore: Double = 0.0, dfMax: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r15 measured NEGATIVE, left alone on purpose: checkpointing
    // adj/deg/pruned here read as a win in the static plan audit (16
    // duplicate scans) but ran 1.5-1.6x SLOWER x5 at sf0.1 — the
    // self-join's two sides share the nbr-window's exchange via
    // ReusedExchange at runtime, so the "duplicated" subtree is already
    // free, and a checkpoint DESTROYS the window partitioning (LogicalRDD
    // reports unknown), forcing two fresh |postings| exchanges for the
    // join. The window-feeds-self-join form shuffles postings exactly
    // once; keep it lazy (the r2 jaccard lesson, rediscovered).
    val adj = edges.select(col("src").cast("long").as("id"),
      col("dst").cast("long").as("nbr")).distinct()
    val deg = adj.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val pruned = adj
      .withColumn("ndeg", count(lit(1)).over(Window.partitionBy("nbr")))
      .filter(col("ndeg") <= dfMax)
      .drop("ndeg")
    // posting self-join, NOT the sorted-array pair explode that won in
    // coOccurrence: measured 2x slower here (3.2s -> 5.5-6.3s at sf0.1).
    // The interpreted nested-transform lambda builds ~C(df,2) structs per
    // neighbor row where the join streams codegen'd rows, and with no
    // downstream distinct to amortize, the join's ReusedExchange side is
    // already free. coOccurrence's win came from eliminating duplicate
    // pair materialization ahead of a distinct.
    val inter = pruned.as("l")
      .join(pruned.as("r"),
        col("l.nbr") === col("r.nbr") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("a"), col("r.id").as("b"))
      .agg(count(lit(1)).as("n_inter"))
    val scored = inter
      .join(deg.select(col("id").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("deg_b")), "b")
      .withColumn("n_union", col("deg_a") + col("deg_b") - col("n_inter"))
      .withColumn("score",
        col("n_inter").cast("double") / col("n_union").cast("double"))
      .filter(col("score") >= minScore)
    // emit each qualifying pair from both endpoints, then keep each
    // node's top-k by (score desc, partner asc) — deterministic ranks
    val sym = scored.select(col("a").as("id"), col("b").as("other"),
        col("n_inter"), col("n_union"), col("score"))
      .unionByName(scored.select(col("b").as("id"), col("a").as("other"),
        col("n_inter"), col("n_union"), col("score")))
    sym.withColumn("rank", row_number().over(
        Window.partitionBy("id").orderBy(desc("score"), asc("other"))))
      .filter(col("rank") <= topK)
      .select(col("id"), col("rank").cast("long").as("rank"), col("other"),
        col("n_inter"), col("n_union"), col("score"))
  }

  /** Multi-source BFS: minimum hop distance from a seed set, level-
    * synchronous over an UNDIRECTED view of the edge list (mirror the
    * edges first if reachability should follow direction). The GDS
    * shortestPath/BFS twin for hop-limited neighborhoods — "everything
    * within k hops of these entities" is the standard graph-expansion
    * query after an ETL load.
    *
    * Scale shape per round: frontier ⋈ edges equi-join on the node id +
    * one distinct + a LEFT ANTI join against the visited set — all keyed
    * shuffles, frontier-sized (not graph-sized) on the probe side. Like
    * [[Dedup.resolveClusters]] the visited set is re-referenced every
    * round, so each new level is `localCheckpoint`ed; unlike hash-min
    * propagation the rounds are exactly `maxHops`, giving a fixed plan
    * the DuckDB oracle reproduces with a bounded recursive CTE.
    */
  /** Link prediction over an undirected graph: for every NON-adjacent
    * 2-hop pair, the common-neighbor count and the resource-allocation
    * index Σ_{z∈Γ(a)∩Γ(b)} 1/deg(z) (Zhou/Lü/Zhang) — RA is the
    * degree-discounted variant that beats raw common-neighbors on dense
    * co-occurrence graphs, and unlike Adamic-Adar's 1/log(deg) it has an
    * engine-exact integer form: each wedge contributes
    * `1000000 div deg(z)` BEFORE the order-free BIGINT sum.
    *
    * Scale shape: wedges generate at the CENTER node (one self-join of
    * the center-keyed adjacency), so fan-out is Σ deg(z)² — the
    * `maxDeg` hub cap drops centers above it ENTIRELY (deterministic,
    * oracle-expressible; a hub center contributes ≤ 1e6/maxDeg per
    * wedge, so what the cap removes is exactly the near-zero-weight
    * mass, the same pragmatic cut every production RA/CN system makes).
    * Candidate scoring is one (a, b)-keyed partial agg; existing edges
    * leave via LEFT ANTI on the canonical pair; the final per-source
    * rank window runs over each node's own candidate set (2-hop
    * neighborhood, hub-capped — bounded by maxDeg·avg-deg).
    *
    * Output: (src, dst, rank, common_neighbors, ra_ppm) — src < dst,
    * top `topK` predictions per src by (ra, cn, dst) — plus nothing for
    * nodes with no non-adjacent 2-hop peers.
    */
  def linkPredict(edges: DataFrame, topK: Int = 5,
                  maxDeg: Int = 100): DataFrame = {
    // adj is referenced three times (both mirror branches + the final
    // anti-join) and the input chain may itself be expensive (the
    // linkpred query feeds a coOccurrence pair-generation chain in):
    // materialize once (r15: the final plan re-ran the whole upstream
    // chain per reference — 10 parquet scans)
    val adj = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .localCheckpoint(true)
    val und = adj.select(col("lo").as("z"), col("hi").as("n"))
      .unionByName(adj.select(col("hi").as("z"), col("lo").as("n")))
    // center-keyed adjacency with degree; ONE z-keyed shuffle feeds the
    // count window, the hub cap, and both sides of the wedge self-join —
    // materialized so the self-join reads it instead of re-running the
    // window per side (r15)
    val centered = und
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("z")))
      .filter(col("deg") <= maxDeg)
      .withColumn("w", expr("1000000L div deg"))
      .localCheckpoint(true)
    val scored = centered.as("l")
      .join(centered.as("r"),
        col("l.z") === col("r.z") && col("l.n") < col("r.n"))
      .groupBy(col("l.n").as("src"), col("r.n").as("dst"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("l.w")).as("ra_ppm"))
      .join(adj, col("src") === col("lo") && col("dst") === col("hi"),
        "left_anti")
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src")
          .orderBy(desc("ra_ppm"), desc("common_neighbors"), asc("dst")))
        .cast("long"))
      .filter(col("rank") <= topK)
      .select(col("src"), col("dst"), col("rank"),
        col("common_neighbors"), col("ra_ppm"))
  }

  /** Degree assortativity (Newman): the Pearson correlation of the
    * degree pair across every directed edge endpoint — positive means
    * hubs attach to hubs (social graphs), negative means hubs attach to
    * leaves (hub-and-spoke, bipartite order/customer shapes). THE
    * one-number structure card that tells a partitioner whether hot
    * keys cluster.
    *
    * Pure composition: degrees from one keyed agg on the mirrored edge
    * list, two broadcast-or-shuffle joins to attach endpoint degrees,
    * then [[Analytics.corrMatrix]] at scale=0 (degrees are already
    * exact integers) — one scan, exact DECIMAL moments, pure-double
    * Pearson close, so the oracle is the same formula over HUGEINT
    * sums. Output: one row (n_endpoints, assortativity).
    */
  def assortativity(edges: DataFrame): DataFrame = {
    val adj = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
    val und = adj.select(col("lo").as("src"), col("hi").as("dst"))
      .unionByName(adj.select(col("hi").as("src"), col("lo").as("dst")))
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val ep = und
      .join(deg.select(col("id").as("src"), col("deg").as("deg_src")),
        "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("deg_dst")),
        "dst")
    Analytics.corrMatrix(ep, Seq("deg_src", "deg_dst"), scale = 0)
      .select(col("n").as("n_endpoints"), col("corr").as("assortativity"))
  }

  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int = 4): DataFrame = {
    // referenced every hop from per-hop checkpointed jobs: checkpoint
    // once instead of re-building the mirrored view per round (r15)
    val undirected = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint(true)
    var known = seeds.select(col("id")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    var frontier = known
    var hop = 1
    while (hop <= maxHops && !frontier.isEmpty) {
      val fresh = frontier.join(undirected, col("id") === col("u"))
        .select(col("v").as("id")).distinct()
        .join(known, Seq("id"), "left_anti")
        .withColumn("dist", lit(hop.toLong)).localCheckpoint(true)
      known = known.unionByName(fresh)
      frontier = fresh
      hop += 1
    }
    known
  }

  /** Hop-budgeted diameter estimate via the classic DOUBLE SWEEP: BFS
    * from a deterministic seed (the minimum node id), re-BFS from the
    * farthest node found, report that eccentricity — on real graphs the
    * sweep's bound is usually the exact diameter, at the cost of two
    * BFS passes instead of all-pairs (which is not a 100 TB operation).
    * Both argmax elections are deterministic (max dist, then min id),
    * and the hop budget caps every pass, so the result is a certified
    * LOWER bound: `diameter_lb` hops between `u_id` and `v_id`,
    * exact-oracle-reproducible by two chained bounded recursive CTEs.
    *
    * Scale shape: two [[bfs]] runs (frontier-sized keyed shuffles per
    * level) plus three ONE-ROW elections assembled by single-row
    * broadcasts — nothing corpus-sized beyond the BFS itself.
    */
  def diameterSweep(edges: DataFrame, maxHops: Int = 4): DataFrame = {
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
    // bounded: one-row deterministic seed election
    val seed0 = nodes.agg(min(col("id")).as("id")).localCheckpoint(true)
    val d1 = bfs(edges, seed0, maxHops)
    // bounded: one-row farthest-from-seed election
    val u = d1.orderBy(desc("dist"), asc("id")).limit(1)
      .select(col("id")).localCheckpoint(true)
    val d2 = bfs(edges, u, maxHops)
    val far = d2.orderBy(desc("dist"), asc("id")).limit(1)
    seed0.select(col("id").as("seed_id"))
      .crossJoin(broadcast(u.select(col("id").as("u_id"))))
      .crossJoin(broadcast(far.select(col("id").as("v_id"),
        col("dist").as("diameter_lb"))))
      .crossJoin(broadcast(d2.agg(count(lit(1)).as("n_reached_u"))))
  }

  /** HyperANF neighborhood function (Boldi–Rosa–Vigna): per-node
    * HyperLogLog estimates of |ball(v, h)| — how many distinct nodes are
    * reachable within h hops — for every hop 0..maxHops. This is the
    * effective-diameter / ball-growth answer [[diameterSweep]] cannot
    * give at 100×: the sweep's exact BFS passes ARE its cost ceiling,
    * while ANF carries a FIXED 2^b-register sketch per node, so each hop
    * is one |E|-keyed register propagation regardless of how large the
    * balls themselves grow (|ball| can reach |V|; the state never does).
    *
    * Register recipe is [[Sketches.hllRegisters]]'s verbatim (md5-prefix
    * 60-bit hash, top-b bucket bits, portable rho), so the sketch of
    * ball(v, h) is IDENTICAL to the sketch HLL would build over the
    * exact ball membership — GraphSpec asserts that equality against
    * hand BFS balls — and every register, count, and scaled sum is an
    * exact BIGINT the DuckDB oracle rebuilds in ROW form (the
    * engine-exact hllEstimate arithmetic: per-register 2^(maxRho-rho)
    * contributions, empty registers 2^maxRho, ONE double division by a
    * Scala-folded literal for `est`).
    *
    * State is PACKED: one m-byte BINARY register vector per node
    * (`graft_hllinit` / `graft_hllmax` / `graft_hllcard` natives), so a
    * hop's propagation join moves |E| fixed-width ROWS — the true
    * HyperANF cost model — where the row-per-register frame would move
    * |E|·m rows (measured prohibitive on dense graphs: a 100×-densified
    * part node carries all 64 registers on every one of its edges). The
    * bytewise-max aggregate is partial-aggregable, so each exchange
    * carries one row per (node, partition).
    *
    * Per hop: state(v) := max-merge of state(v) and state(u) over edges
    * v→u (pass a mirrored edge list for undirected semantics). The round
    * references its state twice (join + union), so every round
    * `localCheckpoint`s — the kCore lesson. Output: one row per
    * (hop, id) with `(n_registers, sum_scaled, est)`.
    */
  def hyperAnf(edges: DataFrame, maxHops: Int = 3, b: Int = 6): DataFrame = {
    require(maxHops >= 1 && b >= 4 && b <= 16,
      "hyperAnf needs maxHops >= 1 and register bits in [4, 16]")
    val payloadBits = 60 - b
    val payloadMod = 1L << payloadBits
    val maxRho = payloadBits + 1
    val m = 1 << b
    val alphaScaled = // alpha_m * m^2 * 2^maxRho, folded once in Scala
      0.7213 / (1.0 + 1.079 / m) * m * m * math.pow(2.0, maxRho)
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    var state = nodes
      .withColumn("h", conv(substring(md5(col("id").cast("string")), 1, 15),
        16, 10).cast("long"))
      // NOTE: Spark SQL's two-arg ltrim is the legacy (trimStr, str)
      // order — the REVERSE of the DataFrame API — so the portable
      // zero-strip must be written TRIM(LEADING ... FROM ...) in SQL text
      .select(col("id"), expr(
        s"""graft_hllinit(h div ${payloadMod}L,
           |$maxRho - length(trim(LEADING '0' FROM bin(h % ${payloadMod}L))),
           |$m)""".stripMargin).as("regs"))
      .localCheckpoint(true)
    def card(st: DataFrame, hop: Int): DataFrame =
      st.select(lit(hop.toLong).as("hop"), col("id"),
          expr("graft_hllcard(regs)").as("c"))
        .select(col("hop"), col("id"),
          col("c.n_registers").as("n_registers"),
          col("c.sum_scaled").as("sum_scaled"))
        .withColumn("est", lit(alphaScaled) / col("sum_scaled").cast("double"))
    val perHop = scala.collection.mutable.ArrayBuffer(card(state, 0))
    var i = 1
    while (i <= maxHops) {
      state = e.join(state.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("regs"))
        .union(state.select(col("id"), col("regs")))
        .groupBy(col("id"))
        .agg(expr("graft_hllmax(regs)").as("regs"))
        .localCheckpoint(true)
      perHop += card(state, i)
      i += 1
    }
    perHop.reduce(_ unionByName _)
  }

  /** Effective-radius histogram from [[hyperAnf]] — the number ANF is
    * actually run for: per node, the smallest hop h whose estimated
    * ball already holds ≥ 90% of the hop-H ball (est(h) ≥ 0.9·est(H)),
    * then the node count per radius. The 90% test is EXACT integer
    * arithmetic on the scaled register sums: est ∝ 1/sum_scaled and
    * sums shrink as balls grow, so with d = sum(h) − sum(H) ≥ 0 the
    * predicate 10·d ≤ sum(h) is written overflow-free as
    * `d <= sum(h) div 10` (d integer ⇒ the forms are equivalent; both
    * engines floor positive division identically).
    */
  def effectiveRadius(edges: DataFrame, maxHops: Int = 2,
                      b: Int = 6): DataFrame = {
    val anf = hyperAnf(edges, maxHops, b)
      .select(col("hop"), col("id"), col("sum_scaled"))
      .localCheckpoint(true) // referenced twice (final frame + all hops)
    val fin = anf.filter(col("hop") === maxHops.toLong)
      .select(col("id"), col("sum_scaled").as("sf"))
    anf.join(fin, "id")
      .filter(col("sum_scaled") - col("sf") <= expr("sum_scaled div 10"))
      .groupBy(col("id")).agg(min(col("hop")).as("eff_hops"))
      .groupBy(col("eff_hops")).agg(count(lit(1)).as("n_nodes"))
  }

  /** k-core decomposition: iteratively peel nodes of degree < k from an
    * UNDIRECTED view of the edge list until only the k-core remains —
    * the density filter behind "drop weakly-connected entities before
    * community detection" (a standard GDS pass after the reference's
    * ETL lands). Returns surviving `(id, deg)` with the within-core
    * degree.
    *
    * Runs a FIXED `rounds` peels (extra rounds past convergence are
    * no-ops), so the DuckDB oracle unrolls the identical rounds as CTEs
    * and hash-matches — the [[pageRank]] bounded-iteration recipe. The
    * peel usually converges in a handful of rounds; at web scale size
    * `rounds` ~ log(n) or iterate until `isEmpty` of the dropped set.
    *
    * Scale shape per round: one partial-aggregated degree count keyed on
    * node id + two LEFT ANTI joins of the edge list against the DROP set
    * (nodes below k) — all keyed shuffles, never all-pairs. Filtering
    * against the drop set rather than the keep set matters: the survivor
    * set stays graph-sized while the drop set shrinks every round (and is
    * EMPTY once converged), so the per-round join side is broadcastable
    * after the first peel — measured 4.6s → 2.5s at sf0.1. The edge list
    * is referenced twice per round (both endpoint filters), so every
    * round `localCheckpoint`s — the [[Dedup.resolveClusters]] lesson:
    * lazy chaining would re-execute the previous round per join branch.
    */
  def kCore(edges: DataFrame, k: Int = 3, rounds: Int = 5): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var e = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    while (i < rounds && !converged) {
      // checkpoint the (small, shrinking) drop set: the two anti-join
      // branches would otherwise each recompute the full degree agg
      // over the graph-sized edge frame — at 100x that one duplicate
      // pass per round was a measured cost driver
      val drop = e.groupBy(col("a")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") < k).select(col("a").as("n"))
        .localCheckpoint(true)
      if (drop.isEmpty) {
        // converged: every remaining round is a no-op — skip its joins
        // AND its graph-sized checkpoint. Oracle-exact by the k-truss
        // precedent: post-convergence rounds change nothing, so early
        // exit equals the fixed SQL unroll
        converged = true
      } else {
        e = e.join(drop, col("a") === col("n"), "left_anti")
          .join(drop, col("b") === col("n"), "left_anti")
          .localCheckpoint(true)
        i += 1
      }
    }
    e.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
  }

  /** Per-node coreness (k-core decomposition NUMBER) via the
    * distributed h-index iteration (Montresor et al.): start from
    * degree and repeatedly set c(v) to the h-index of its neighbors'
    * values — the largest h with ≥ h neighbors at value ≥ h. The
    * sequence is monotone nonincreasing from the degree init and its
    * fixed point is exactly the coreness; a FIXED `rounds` budget
    * reports `core_ub`, a certified UPPER bound that equals coreness
    * once converged (the kCore/k-truss honest-leftovers convention,
    * and the fixed unroll keeps the DuckDB oracle finite).
    * [[kCore]] answers "who survives at k"; this answers "every node's
    * k" in one pass family.
    *
    * Engine-exact with NO tie-break: the h-index `max(least(rn, val))`
    * over the value-desc ranking depends only on the sorted multiset,
    * so equal-value orderings cannot change it. Per round: one
    * frontier-scoped |E|-keyed join (see the frontier note in the body
    * — round 1 is the only full-|E| pass) + one window PARTITIONED on
    * the node id + one nonincreasing merge; state is referenced twice
    * per round → localCheckpoint each round.
    */
  def coreness(edges: DataFrame, rounds: Int = 6): DataFrame = {
    require(rounds >= 1)
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
      .localCheckpoint(true)
    var c = und.groupBy(col("a").as("id")).agg(count(lit(1)).as("val"))
      .localCheckpoint(true)
    // FRONTIER SHRINKING (the kCore drop-set lesson applied to value
    // iteration — this was the 449s sf10 ceiling as a full-|E| rescan
    // per round): h(v) depends only on v's neighbors' values, so v can
    // change in round r+1 ONLY if a neighbor changed in round r — for
    // everyone else val ≤ h holds from last round and the merge is a
    // no-op. Each round recomputes h only over edges whose a-endpoint
    // neighbors a changed node; `changed` converges to empty, at which
    // point every remaining round is a no-op and the early exit equals
    // the fixed SQL unroll (the kcore/k-truss precedent). Values,
    // per-round results, and the final frame are IDENTICAL to the full
    // rescan.
    val nNodes = c.count() // one scalar off the checkpointed init
    var changed = c.select(col("id"))
    var nChanged = nNodes
    var r = 0
    while (r < rounds && nChanged > 0) {
      // Frontier scoping pays two extra |E|-keyed shuffles (distinct +
      // semi-join); spend them only when (a) the change set is
      // genuinely small AND (b) the graph is big enough that a full
      // rescan dominates the extra stages' scheduler overhead —
      // measured at sf0.1 (~25k nodes) the two added stages cost MORE
      // than the rescan they save (+3s/run), while the sf10
      // densification tail (449s r13 ceiling) is exactly where they
      // pay. Small graphs keep the plain rescan + the convergence
      // probe.
      val scoped =
        if (8L * nChanged >= nNodes || nNodes < 200000L) und
        else {
          val front = und.join(changed.select(col("id").as("b")), "b")
            .select(col("a")).distinct()
          und.join(front, Seq("a"), "left_semi")
        }
      val nb = scoped.join(c.select(col("id").as("b"), col("val")), "b")
        .select(col("a").as("id"), col("val"))
      val h = nb.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("id").orderBy(desc("val"))))
        .groupBy(col("id"))
        .agg(max(least(col("rn").cast("long"), col("val"))).as("h"))
      val cNew = c.join(h, Seq("id"), "left")
        .select(col("id"),
          least(col("val"), coalesce(col("h"), col("val"))).as("val"),
          (col("h").isNotNull && col("h") < col("val")).as("chg"))
        .localCheckpoint(true) // feeds c, changed, AND the count probe
      changed = cNew.filter(col("chg")).select(col("id"))
      c = cNew.select(col("id"), col("val"))
      nChanged = changed.count() // cheap: materialized node-sized frame
      r += 1
    }
    c.select(col("id"), col("val").as("core_ub"))
  }

  /** Label-propagation community detection, made DETERMINISTIC (classic
    * LPA is order-dependent): every node starts with its own id as the
    * label, and each synchronous round adopts the most frequent label
    * among its undirected neighbors with ties broken by the SMALLER
    * label — expressed as `min(struct(Long.MaxValue - n, lbl))`, an
    * ordinary partial-aggregable min. Fixed `rounds`, so the DuckDB
    * oracle unrolls identical rounds ([[pageRank]] recipe) and the
    * result is reproducible across runs, partitionings, and engines.
    *
    * Scale shape per round: one edges⋈labels equi-join on the node id +
    * two partial-aggregated shuffles ((node,label) counts, then argmax
    * per node) — never all-pairs. `labels` is referenced ONCE per round,
    * so rounds chain lazily with linear lineage (the pageRank lesson:
    * per-round barriers cost 2.5x); periodic localCheckpoint only.
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 3,
                       checkpointEvery: Int = 10): DataFrame = {
    require(rounds >= 1)
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .localCheckpoint(true) // referenced every round: compute once
    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
    var i = 0
    while (i < rounds) {
      labels = und
        .join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("n"))
        .groupBy(col("a"))
        .agg(min(struct((lit(Long.MaxValue) - col("n")).as("neg"),
          col("lbl").as("lbl"))).as("k"))
        .select(col("a").as("id"), col("k.lbl").as("lbl"))
      i += 1
      if (i % checkpointEvery == 0 && i < rounds)
        labels = labels.localCheckpoint(true)
    }
    labels
  }

  /** One level of Louvain modularity optimization — deterministic local
    * moves, fixed `rounds`. [[labelPropagation]] spreads majority labels
    * with no objective; this op MOVES nodes to the neighbor community
    * with the best exact modularity gain, the optimization step behind
    * every production community pipeline. Gain is kept in integers by
    * scaling ΔQ by 2m²: for node i with degree k_i, community candidate
    * c scores `s(c) = 2m·e(i,c) − k_i·(tot_c − [c = own]·k_i)` and
    * ΔQ(own→c)·2m² = s(c) − s(own), so the argmax over s (tie-break:
    * prefer staying, then min community id) IS the best strict-gain
    * move with zero float arithmetic.
    *
    * Scheduling: per round, only nodes whose per-round salted md5
    * priority is a STRICT LOCAL MAXIMUM among their neighbors may move
    * (the Luby/Jones–Plassmann convention) — adjacent nodes never move
    * simultaneously, so the label-swap oscillation of synchronous
    * sweeps cannot occur, every round is deterministic, and the DuckDB
    * oracle replays it exactly (md5 hex strings compare identically in
    * both engines). Fixed rounds keep the unrolled-CTE oracle finite;
    * leftovers simply keep their label — the honest Luby/JP contract.
    *
    * Scale shape: ONE |E| pass per round (the neighbor-community count;
    * the move schedule is label-independent, so all rounds' mover sets
    * are hoisted into a single up-front |E| pass) plus node-sized
    * community-mass/candidate-merge stages — never all-pairs. Labels
    * are referenced several times per round → localCheckpoint every
    * round (the kCore lesson). BIGINT-safe while 2m·k_i < 2^63.
    */
  def louvainOneLevel(edges: DataFrame, rounds: Int = 10): DataFrame = {
    require(rounds >= 1)
    val und = edges.select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .localCheckpoint(true)
    val e = und.select(col("lo").as("src"), col("hi").as("dst"))
      .union(und.select(col("hi").as("src"), col("lo").as("dst")))
      .withColumn("w", lit(1L))
      .localCheckpoint(true)
    val deg = e.groupBy(col("src").as("id")).agg(sum(col("w")).as("k"))
      .localCheckpoint(true)
    val m2 = 2L * und.count() // bounded: one scalar, 2m
    louvainRounds(e, deg, m2, rounds, "lv")
  }

  /** Weighted Louvain local-move rounds — the shared core of
    * [[louvainOneLevel]] (unit weights) and [[louvainTwoLevel]]'s
    * coarsened phase. `e` is a SYMMETRIC weighted edge frame
    * (src, dst, w) with NO self-loops (a self-loop moves with its node
    * and cancels in every ΔQ comparison, so it belongs in `deg` mass
    * only); `deg` is the per-node incident weight INCLUDING any
    * self-loop mass; `m2` = 2·(total undirected edge weight). Gains,
    * scheduling, and determinism are exactly the one-level contract —
    * `saltPrefix` keeps the per-round md5 move schedule distinct
    * between levels so the unrolled oracle replays each level verbatim.
    */
  private def louvainRounds(e: DataFrame, deg: DataFrame, m2: Long,
                            rounds: Int, saltPrefix: String): DataFrame = {
    // r15 optimization, same election round for round (probe-verified
    // label-identical at sf0.1; hash-exact vs the unrolled oracle):
    // (a) the salted md5 move schedule is LABEL-INDEPENDENT, so every
    //     round's strict-local-max mover set is computable in ONE |E|
    //     pass up front instead of an e⋈pri join + |E| agg per round;
    // (b) the own-community candidate no longer rides a |E|-sized
    //     union + regroup: the neighbor argmax aggregates directly off
    //     the eic frame and the own candidate merges node-sized via
    //     least() — a DUPLICATE own row can never win the election
    //     because s_real − s_own0 = m2·e(i,own) > 0 whenever the real
    //     (i, own) row exists, and when it does not the 0-row IS the
    //     original union row;
    // (c) the static degree mass k rides inside the labels frame, so
    //     per-round scoring joins labels once instead of labels+deg+own.
    val priAll = deg.select(col("id") +: (0 until rounds).map(r =>
      md5(concat(lit(s"$saltPrefix$r:"), col("id").cast("string")))
        .as(s"p$r")): _*)
    val nbrMaxAll = e
      .join(priAll.withColumnRenamed("id", "dst"), "dst")
      .groupBy(col("src").as("id"))
      .agg(max(col("p0")).as("pm0"),
        (1 until rounds).map(r => max(col(s"p$r")).as(s"pm$r")): _*)
    val movers = priAll.join(nbrMaxAll, "id")
      .select(col("id") +: (0 until rounds).map(r =>
        (col(s"p$r") > col(s"pm$r")).as(s"mv$r")): _*)
      .localCheckpoint(true)
    var labels = deg.select(col("id"), col("id").as("lbl"), col("k"))
      .localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      val tot = labels.groupBy(col("lbl").as("c")).agg(sum(col("k")).as("tot"))
      val eic = e
        .join(labels.select(col("id").as("dst"), col("lbl").as("c")), "dst")
        .groupBy(col("src").as("id"), col("c"))
        .agg(sum(col("w")).as("eic"))
      // partial-aggregable k=1 argmax (the house deterministic-argmax
      // recipe): min(struct(-s, stay, c)) == the (s desc, stay asc,
      // c asc) row_number election, but map-side-combinable — no
      // per-id sort over the |E|-sized candidate frame. -s is safe:
      // |s| ≤ m2·k_i < 2^63 by the BIGINT contract above.
      val nbrBest = eic
        .join(labels.select(col("id"), col("lbl").as("own"), col("k")), "id")
        .join(tot, "c")
        .withColumn("s", lit(m2) * col("eic") - col("k") *
          (col("tot") - when(col("c") === col("own"), col("k"))
            .otherwise(lit(0L))))
        .withColumn("stay",
          when(col("c") === col("own"), lit(0)).otherwise(lit(1)))
        .groupBy(col("id"))
        .agg(min(struct((-col("s")).as("ns"), col("stay"), col("c")))
          .as("nb"))
      // the own community is always a candidate, even with no
      // intra-community edge: eic=0, stay=0 ⇒ ns = k·(tot−k)
      val ownCand = labels.join(tot, col("lbl") === col("c"))
        .select(col("id"), col("lbl").as("own"), col("k"),
          struct((col("k") * (col("tot") - col("k"))).as("ns"),
            lit(0).as("stay"), col("lbl").as("c")).as("ob"))
      // `gain` rides the round's single materialization: true iff the
      // node HAS a strictly-positive-gain candidate (best != own),
      // regardless of whether the salted schedule let it move — the
      // only SCHEDULE-INDEPENDENT convergence signal (the md5 schedule
      // changes per round, so "nothing moved" does not bound future
      // rounds, but "no gain exists anywhere" fixes the labels under
      // ANY schedule and every later round — here and in the unrolled
      // oracle — is a no-op; the kcore post-convergence argument).
      val updated = ownCand.join(nbrBest, Seq("id"), "left")
        .join(movers.select(col("id"), col(s"mv$r").as("mv")), "id")
        .withColumn("b", least(col("ob"), coalesce(col("nb"), col("ob"))))
        .select(col("id"),
          when(col("mv"), col("b.c")).otherwise(col("own")).as("lbl"),
          (col("b.c") =!= col("own")).as("gain"),
          col("k"))
        .localCheckpoint(true)
      labels = updated.select(col("id"), col("lbl"), col("k"))
      r += 1
      // cheap scan of the materialized node-sized frame
      if (updated.filter(col("gain")).isEmpty) r = rounds
    }
    labels.select(col("id"), col("lbl"))
  }

  /** Two-level Louvain — the phase the one-level pass is named for:
    * after `rounds1` local-move rounds, COLLAPSE each community into a
    * super-node (inter-community edge weights summed; intra-community
    * mass folds into super-node degree, where it cancels in every ΔQ
    * and so never materializes as a self-loop edge) and run `rounds2`
    * weighted local-move rounds on the community graph. A super-node
    * move is exactly "move that whole community at once" in the
    * original graph, the move the one-level pass can never make — and
    * every executed move has strictly positive ΔQ (ties keep `own` by
    * the stay-then-min-c order), so Q(two-level) ≥ Q(one-level) always.
    *
    * Scale shape: the coarsened graph is community-sized — |V₂| =
    * #communities, |E₂| ≤ min(|E|, |V₂|²) — so phase 2 costs a small
    * fraction of phase 1 (the r12 sf10 louvain ceiling was pure
    * phase-1 round cost; the coarse rounds ride frames 100–1000×
    * smaller). Both label frames are localCheckpoint-ed per round; the
    * compose join is keyed on the phase-1 label.
    *
    * Output: (id, lbl) where lbl is the phase-2 community of the
    * node's phase-1 community — directly comparable to
    * [[louvainOneLevel]] under [[modularity]].
    */
  def louvainTwoLevel(edges: DataFrame, rounds1: Int = 6,
                      rounds2: Int = 4): DataFrame = {
    require(rounds1 >= 1 && rounds2 >= 1)
    val und = edges.select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .localCheckpoint(true)
    val e = und.select(col("lo").as("src"), col("hi").as("dst"))
      .union(und.select(col("hi").as("src"), col("lo").as("dst")))
      .withColumn("w", lit(1L))
      .localCheckpoint(true)
    val deg = e.groupBy(col("src").as("id")).agg(sum(col("w")).as("k"))
      .localCheckpoint(true)
    val m2 = 2L * und.count() // bounded: one scalar, 2m
    val l1 = louvainRounds(e, deg, m2, rounds1, "lv")
    // coarsen: label both endpoints, keep inter-community weight as
    // canonical (lo, hi) super-edges; intra edges vanish into deg2
    val ce = und
      .join(l1.select(col("id").as("lo"), col("lbl").as("c1")), "lo")
      .join(l1.select(col("id").as("hi"), col("lbl").as("c2")), "hi")
      .filter(col("c1") =!= col("c2"))
      .select(least(col("c1"), col("c2")).as("lo"),
        greatest(col("c1"), col("c2")).as("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("w"))
    val e2 = ce.select(col("lo").as("src"), col("hi").as("dst"), col("w"))
      .unionByName(
        ce.select(col("hi").as("src"), col("lo").as("dst"), col("w")))
      .localCheckpoint(true)
    // super-node degree = member degree mass (intra edges included —
    // that is exactly the self-loop weight the edge frame omits)
    val deg2 = l1.join(deg, "id")
      .groupBy(col("lbl").as("id")).agg(sum(col("k")).as("k"))
      .localCheckpoint(true)
    val l2 = louvainRounds(e2, deg2, m2, rounds2, "lw")
    l1.select(col("id"), col("lbl").as("c"))
      .join(l2.select(col("id").as("c"), col("lbl")), "c")
      .select(col("id"), col("lbl"))
  }

  /** Modularity Q of a community labeling over an undirected graph —
    * the number that turns "label propagation ran" into "the communities
    * are real": Q = Σ_c [e_c/m − (d_c/2m)²], with e_c the intra-community
    * edge count and d_c the community degree mass. Emitted as the exact
    * integer pair `q_num = Σ_c (4·m·e_c − d_c²)`, `q_den = 4m²` (Q could
    * be negative, and integer `div` on negatives is the truncate-vs-floor
    * trap — the single double division is portable instead).
    *
    * Scale shape: canonical edge set checkpointed once (referenced for
    * m, intra edges, and degrees), two label joins keyed on the node id,
    * per-community partial aggs, a one-row total broadcast onto the
    * community-cardinality frame. BIGINT-safe while 4m² < 2^63
    * (m ≲ 1.5·10^9 undirected edges; shard or go DECIMAL beyond).
    * `labels` needs (id, lbl) — [[labelPropagation]]'s contract.
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    // labels is referenced three times (both intra-edge endpoint joins
    // + the degree-mass rollup); when the caller passes a LAZY labeling
    // chain (graph_modularity feeds 3-round labelPropagation straight
    // in) every reference re-executed the whole chain — 32 source scans
    // and 56 exchanges measured in the composed plan. Materialize the
    // node-sized labeling once (r15).
    val lbl = labels.localCheckpoint(true)
    val adj = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .localCheckpoint(true)
    val mRow = adj.agg(count(lit(1)).as("m"))
    val intra = adj
      .join(lbl.select(col("id").as("lo"), col("lbl").as("la")), "lo")
      .join(lbl.select(col("id").as("hi"), col("lbl").as("lb")), "hi")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("lbl")).agg(count(lit(1)).as("e_in"))
    val deg = adj.select(col("lo").as("id"))
      .unionByName(adj.select(col("hi").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val dc = lbl.join(deg, "id")
      .groupBy(col("lbl")).agg(sum(col("deg")).as("d_c"))
    dc.join(intra, Seq("lbl"), "left").na.fill(0L, Seq("e_in"))
      .crossJoin(broadcast(mRow))
      .agg(min(col("m")).as("m_edges"),
        count(lit(1)).as("n_communities"),
        sum(expr("4L * m * e_in - d_c * d_c")).as("q_num"),
        min(expr("4L * m * m")).as("q_den"))
      .select(col("m_edges"), col("n_communities"), col("q_num"),
        col("q_den"),
        (col("q_num").cast("double") / col("q_den").cast("double"))
          .as("modularity"))
  }

  /** Per-seed hop distances: [[bfs]] generalized to keep the SEED
    * identity — level-synchronous over the undirected view with the
    * frontier keyed on `(seed, id)`, returning every `(seed, id, dist)`
    * with `dist ≤ maxHops`. State is |seeds|·reached — callers pass a
    * BOUNDED seed sample (the standard centrality-estimation setup:
    * exact distances from a pivot set, not all-pairs).
    *
    * Same per-round shape as [[bfs]] (frontier⋈edges equi-join on the
    * node id, distinct, LEFT ANTI vs the visited set, all keyed on
    * (seed, id)); visited is re-referenced every round so each level
    * localCheckpoints.
    */
  def seedDistances(edges: DataFrame, seeds: DataFrame,
                    maxHops: Int = 4): DataFrame = {
    // referenced every hop from per-hop checkpointed jobs: checkpoint
    // once instead of re-building the mirrored view per round (r15)
    val undirected = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint(true)
    var known = seeds.select(col("id")).distinct()
      .select(col("id").as("seed"), col("id"))
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    var frontier = known
    var hop = 1
    while (hop <= maxHops && !frontier.isEmpty) {
      val fresh = frontier.join(undirected, col("id") === col("u"))
        .select(col("seed"), col("v").as("id")).distinct()
        .join(known, Seq("seed", "id"), "left_anti")
        .withColumn("dist", lit(hop.toLong)).localCheckpoint(true)
      known = known.unionByName(fresh)
      frontier = fresh
      hop += 1
    }
    known
  }

  /** Landmark (2-hop-cover-style) distance oracle: exact hop-bounded
    * BFS distances from a SMALL landmark set, then
    * `est(u, v) = min_l d(u, l) + d(l, v)` for query pairs — the
    * standard web-scale answer to "distance between two nodes" when
    * pairwise BFS is unaffordable (an upper bound on the true
    * distance; exact whenever some shortest path crosses a landmark).
    * Pairs with no landmark reaching both sides surface NULL honestly
    * (n_common = 0), never a guess.
    *
    * Scale shape: state is |landmarks|·|reached| (the [[seedDistances]]
    * contract — landmarks are a bounded pivot set); query answering is
    * two hash joins keyed on the pair endpoints and (seed, v), one
    * (u, v)-keyed min — no BFS per query, which is the whole point.
    * The distance table is referenced from both sides of the pair join
    * → localCheckpoint once.
    */
  def landmarkDistances(edges: DataFrame, landmarks: DataFrame,
                        pairs: DataFrame, maxHops: Int = 4): DataFrame = {
    val dist = seedDistances(edges, landmarks, maxHops)
      .localCheckpoint(true)
    val est = pairs
      .join(dist.select(col("seed"), col("id").as("u"),
        col("dist").as("du")), "u")
      .join(dist.select(col("seed"), col("id").as("v"),
        col("dist").as("dv")), Seq("seed", "v"))
      .groupBy(col("u"), col("v"))
      .agg(min(col("du") + col("dv")).as("est_dist"),
        count(lit(1)).as("n_common"))
    pairs.join(est, Seq("u", "v"), "left")
      .select(col("u"), col("v"), col("est_dist"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
  }

  /** Hop-bounded harmonic-closeness centrality from a pivot seed set:
    * `harmonic(v) = Σ_seeds 1/d(seed, v)` over seeds within `maxHops`,
    * the standard sampled-pivot centrality estimate (exact all-pairs
    * closeness is O(V·E) — at web scale everyone samples pivots and
    * bounds the radius; with seeds = all nodes this IS harmonic
    * centrality). Unreached pairs contribute 0 by harmonic convention —
    * no infinite-distance special case, which is why harmonic beats
    * classic closeness on disconnected graphs.
    *
    * Engine-exact: each term is `scale div d` with
    * `scale = lcm(1..maxHops)` (maxHops ≤ 4 → 12), so every reciprocal
    * is an exact integer and the per-node sum is order-free BIGINT —
    * `h_scaled / 12.0` only at the end, one IEEE division. Scale shape:
    * [[seedDistances]] rounds + ONE partial-aggregated shuffle on the
    * node id; output is node-sized.
    */
  def harmonicCloseness(edges: DataFrame, seeds: DataFrame,
                        maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1 && maxHops <= 4, "lcm scaling table covers 1..4")
    val scale = 12L
    seedDistances(edges, seeds, maxHops)
      .filter(col("dist") > 0)
      .groupBy(col("id"))
      .agg(sum(expr(s"$scale div dist")).as("h_scaled"),
        count(lit(1)).as("n_reached"))
      .withColumn("harmonic",
        col("h_scaled").cast("double") / lit(scale.toDouble))
  }

  /** Wasserman–Faust closeness centrality from a pivot seed set — the
    * GDS CLOSENESS companion to [[harmonicCloseness]], component-size
    * corrected so a node central in a small component cannot outscore a
    * genuinely central node: over the seeds reaching v within `maxHops`,
    * `closeness_ppm = 10⁶ · r² div (|seeds| · Σd)` (r = reached seed
    * count) — the sampled-pivot form of ((r−1)/(n−1))·((r−1)/Σd).
    * All-integer: the cross-multiplied numerator rides DECIMAL(38,0),
    * ONE floored division, no reciprocal table needed (unlike harmonic,
    * the distance sum is used directly). Same [[seedDistances]] BFS
    * rounds + one node-keyed partial agg + a one-row seed-count
    * broadcast; unreached nodes simply emit no row.
    */
  def closenessCentrality(edges: DataFrame, seeds: DataFrame,
                          maxHops: Int = 4): DataFrame = {
    val nSeeds = seeds.select(col("id")).distinct()
      .agg(count(lit(1)).as("n_seeds"))
    seedDistances(edges, seeds, maxHops)
      .filter(col("dist") > 0)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_reached"), sum(col("dist")).as("dist_sum"))
      .crossJoin(broadcast(nSeeds))
      .withColumn("closeness_ppm",
        expr("CAST(CAST(n_reached AS DECIMAL(38,0)) * n_reached * 1000000" +
          " div (CAST(n_seeds AS DECIMAL(38,0)) * dist_sum) AS BIGINT)"))
      .select(col("id"), col("n_reached"), col("dist_sum"),
        col("closeness_ppm"))
  }

  /** HITS hubs-and-authorities in fixed-point integer arithmetic — the
    * link-analysis pair score (a good hub points at good authorities; a
    * good authority is pointed at by good hubs), run on the same
    * post-ETL graphs as [[pageRank]]. Each round:
    *
    *   a'(v) = Σ_{(u,v)∈E} h(u),  then L1-normalize to mass `Scale`
    *   h'(u) = Σ_{(u,v)∈E} a'(v), then L1-normalize
    *
    * L1 (sum) normalization instead of the classical L2: the ranking is
    * invariant to the norm choice, and dividing by the integer total
    * keeps every score an exact BIGINT — `v div greatest(1, total div
    * Scale)` is engine-portable where an L2 sqrt-of-sum-of-squares float
    * chain is reduction-order-dependent. The `greatest(1, …)` guard
    * covers mass draining into sinks (total < Scale).
    *
    * Scale shape per half-round: one edges⋈scores equi-join keyed on the
    * node id + a partial-aggregated shuffle to the receiving side + a
    * node-sized total (two-stage global agg, broadcast back as ONE row —
    * the bounded-broadcast pattern, never a corpus-side shuffle). The
    * raw table is referenced twice (rows + its total), so each
    * half-round localCheckpoints a node-sized table — the
    * [[Dedup.resolveClusters]] rule, not [[pageRank]]'s lazy chain.
    */
  def hits(edges: DataFrame, iters: Int = 3): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    // raw is node-sized and referenced twice (rows + total): checkpoint,
    // then divide by the broadcast one-row total
    def l1Normalize(raw: DataFrame): DataFrame = {
      val m = raw.localCheckpoint(true)
      val total = m.groupBy()
        .agg(greatest(lit(1L), expr(s"sum(raw) div ${Scale}L")).as("t"))
      m.crossJoin(broadcast(total))
        .select(col("id"), expr("raw div t").as("r"))
    }
    var hub = nodes.withColumn("r", lit(Scale))
    var auth = nodes.withColumn("r", lit(0L))
    var i = 0
    while (i < iters) {
      auth = l1Normalize(nodes.join(
        e.join(hub.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id")).agg(sum(col("r")).as("raw")),
        Seq("id"), "left")
        .select(col("id"), coalesce(col("raw"), lit(0L)).as("raw")))
      hub = l1Normalize(nodes.join(
        e.join(auth.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id")).agg(sum(col("r")).as("raw")),
        Seq("id"), "left")
        .select(col("id"), coalesce(col("raw"), lit(0L)).as("raw")))
      i += 1
    }
    hub.select(col("id"), col("r").as("hub_scaled"))
      .join(auth.select(col("id"), col("r").as("auth_scaled")), "id")
      .select(col("id"), col("hub_scaled"), col("auth_scaled"),
        (col("hub_scaled").cast("double") / lit(Scale.toDouble)).as("hub"),
        (col("auth_scaled").cast("double") / lit(Scale.toDouble)).as("auth"))
  }

  /** One combined min-label propagation step: the forward label pulls
    * the minimum over out-neighbors, the backward label over
    * in-neighbors — two equi-joins + keyed partial-agg mins against ONE
    * state frame, so each hop materializes a single checkpoint instead
    * of two. `least` skips the NULL a neighborless node produces —
    * identical semantics in DuckDB. */
  private def sccStep(st: DataFrame, edges: DataFrame): DataFrame = {
    val fn = edges.join(st.select(col("id").as("dst"), col("flbl")), "dst")
      .groupBy(col("src").as("id")).agg(min(col("flbl")).as("fn"))
    val bn = edges.join(st.select(col("id").as("src"), col("blbl")), "src")
      .groupBy(col("dst").as("id")).agg(min(col("blbl")).as("bn"))
    st.join(fn, Seq("id"), "left").join(bn, Seq("id"), "left")
      .select(col("id"), least(col("flbl"), col("fn")).as("flbl"),
        least(col("blbl"), col("bn")).as("blbl"))
  }

  /** Strongly connected components by forward-backward min-label
    * peeling (the FW-BW / coloring family): per peel round, propagate
    * the minimum reachable id forward (`f`) and backward (`b`) for
    * `hops` fixed steps; a node with `f == b == m` provably sits in
    * SCC(m) — m reaches it and it reaches m — so every emitted
    * assignment is EXACT regardless of budget. Assigned nodes and their
    * edges peel off, letting SCCs previously shadowed by a smaller
    * upstream/downstream id resolve in the next round.
    *
    * Soundness under the budget: a peel's removals are only safe when
    * the labels reached their fixed point (a converged min-label is the
    * true closure minimum, which is SCC-invariant — the whole SCC
    * assigns or none of it does). After the fixed rounds one extra
    * verification step checks stability; a non-converged round stops
    * the peel instead of removing a possibly-split SCC, leaving the
    * remainder honestly NULL. Choose `hops` ≥ the graph's min-label
    * propagation diameter to resolve everything the peel budget allows.
    *
    * Scale shape: every step is one edges⋈labels equi-join on a node id
    * plus a keyed partial-agg min — never a transitive-closure join.
    * Labels are referenced twice per step (self + neighbor pull) →
    * per-step localCheckpoint, the [[Dedup.resolveClusters]] rule; the
    * peel's anti-joins shrink edges monotonically. Output: `(id,
    * scc_id)` with NULL for nodes unresolved within the budget.
    */
  def scc(edges: DataFrame, peels: Int = 2, hops: Int = 4): DataFrame = {
    require(peels >= 1 && hops >= 1, "peels and hops must be positive")
    val e0 = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint(true)
    val allNodes = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    var remaining = allNodes
    var e = e0
    var assignedAll: Option[DataFrame] = None
    var p = 0
    var live = true
    while (p < peels && live && !remaining.isEmpty) {
      var st = remaining.select(col("id"), col("id").as("flbl"),
        col("id").as("blbl"))
      var i = 0
      while (i < hops) {
        st = sccStep(st, e).localCheckpoint(true)
        i += 1
      }
      // stability check: one more step must change nothing, else the
      // closure minima aren't final and removal could split an SCC
      val v = sccStep(st, e)
        .withColumnRenamed("flbl", "flbl2").withColumnRenamed("blbl", "blbl2")
        .join(st, "id")
      val unstable = v.filter(col("flbl2") =!= col("flbl") ||
        col("blbl2") =!= col("blbl")).count()
      if (unstable > 0) {
        graft.util.Log.getLogger("graft.Graph").warn(
          s"scc peel $p not converged within $hops hops " +
            s"($unstable labels still moving); stopping with partial cover")
        live = false
      } else {
        val assigned = st.filter(col("flbl") === col("blbl"))
          .select(col("id"), col("flbl").as("scc_id")).localCheckpoint(true)
        assignedAll = Some(assignedAll.fold(assigned)(_.union(assigned)))
        remaining = st.filter(col("flbl") =!= col("blbl"))
          .select(col("id")).localCheckpoint(true)
        val ids = assigned.select(col("id"))
        e = e.join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
          .join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
          .select(col("src"), col("dst")).localCheckpoint(true)
      }
      p += 1
    }
    val found = assignedAll.getOrElse(
      allNodes.withColumn("scc_id", lit(null).cast("long")).limit(0))
    allNodes.join(found, Seq("id"), "left")
  }

  /** Deterministic random-walk corpus generation — the data-gen primitive
    * behind DeepWalk/node2vec-style graph embeddings (walks become the
    * "sentences" a skip-gram model trains on). One walk starts per seed;
    * at step t the walk at node c moves to the out-neighbor d minimizing
    * the md5-prefix hash of `walkId:t:d` — a pseudo-uniform choice that is
    * bit-reproducible across runs, partitionings, and engines (the
    * md5-prefix recipe), unlike RNG-seeded sampling whose result depends
    * on task placement. A walk that reaches a node with no out-neighbors
    * stops growing (its path freezes); mirror the edge list first for
    * undirected walks.
    *
    * Scale shape per step: one state⋈edges equi-join on the current node
    * + a partial-aggregable `min(struct(hash, dst))` argmin keyed on the
    * walk — never a window over all candidates, never all-pairs. State is
    * referenced once per step → steps chain lazily with linear lineage
    * (the [[pageRank]] rule); `steps` is small and fixed, so the whole
    * generation is one multi-stage job. Skew note: a hub node with out-
    * degree D contributes D candidate rows per walk currently sitting on
    * it — bounded by walks×maxdeg, the same envelope as one adjacency
    * expansion.
    */
  def randomWalks(edges: DataFrame, seeds: DataFrame,
                  steps: Int = 4): DataFrame = {
    require(steps >= 1, "steps must be positive")
    // one adjacency reference per step, but the caller's upstream chain
    // (distinct + mirror) re-executed per step in the composed plan —
    // materialize the static frame once (r15)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var st = seeds.select(col("id").as("walk_id"), col("id").as("cur"),
      col("id").cast("string").as("path"))
    var t = 1
    while (t <= steps) {
      val cand = st.join(e, st("cur") === e("src"), "left")
      val h = expr(("conv(substr(md5(concat(cast(walk_id AS string), ':', " +
        s"'$t', ':', cast(dst AS string))), 1, 8), 16, 10)"))
        .cast("long")
      st = cand
        .withColumn("hh", when(col("dst").isNotNull, h))
        .groupBy(col("walk_id"), col("cur"), col("path"))
        .agg(min(when(col("dst").isNotNull,
          struct(col("hh"), col("dst")))).as("pick"))
        .select(col("walk_id"),
          coalesce(col("pick.dst"), col("cur")).as("cur"),
          when(col("pick.dst").isNotNull,
            concat(col("path"), lit("->"), col("pick.dst")))
            .otherwise(col("path")).as("path"))
      t += 1
    }
    st.select(col("walk_id"), col("cur").as("end_node"), col("path"))
  }

  /** node2vec-biased walk corpus (Grover & Leskovec's 2nd-order walks):
    * the return/in-out bias that tunes walks between BFS-like
    * (community structure) and DFS-like (structural roles) exploration,
    * which [[randomWalks]]' 1st-order uniform step cannot express. At
    * node c having arrived from p, a candidate d weighs `wReturn` if
    * d == p, `wNear` if (p, d) is an edge (distance 1 from p), else
    * `wFar` — integer weights standing in for node2vec's 1/p, 1, 1/q
    * (defaults (1, 2, 4) == p=2, q=0.5 scaled by 2; the first step has
    * no predecessor and is uniform).
    *
    * Deterministic weighted sampling via REPLICA MIN-HASH: each
    * candidate explodes into w salted rows and the walk takes the
    * candidate holding the minimal md5-prefix hash — the min of w iid
    * uniforms beats the min of w' iid uniforms with probability
    * w/(w+w'), so the choice is EXACTLY categorical ∝ w in
    * distribution, yet bit-reproducible across runs, partitionings,
    * and engines (the md5-prefix recipe; DuckDB twin = the same
    * replicas via `UNNEST(range(w))` + a per-walk rank). Frozen walks
    * (no out-neighbor) keep their position AND predecessor.
    *
    * Scale shape per step: the state⋈edges adjacency equi-join, ONE
    * extra keyed equi-join against the edge list on (prev, dst) for
    * the distance-1 flag, a ≤max(w)-factor explode, and the same
    * partial-aggregable `min(struct(hash, dst))` argmin keyed on the
    * walk — never a window over candidates. State is referenced once
    * per step → lazy chaining with linear lineage (the [[pageRank]]
    * rule); the static edge frame is referenced twice per step through
    * its own reusable exchange.
    */
  def biasedWalks(edges: DataFrame, seeds: DataFrame, steps: Int = 4,
                  wReturn: Int = 1, wNear: Int = 2,
                  wFar: Int = 4): DataFrame = {
    require(steps >= 1, "steps must be positive")
    require(wReturn >= 1 && wNear >= 1 && wFar >= 1,
      "weights must be positive integers")
    // the edge frame is referenced TWICE per step (adjacency + the
    // distance-1 flag) across all steps of one lazily-chained job, and
    // exchange reuse does NOT fire across the per-step aliases — the
    // composed plan re-ran the upstream distinct 30 times. Materialize
    // once; `near` is a rename riding the same checkpoint (r15).
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    val near = e.select(col("src").as("p_src"), col("dst").as("p_dst"))
    var st = seeds.select(col("id").as("walk_id"),
      lit(null).cast("long").as("prev"), col("id").as("cur"),
      col("id").cast("string").as("path"))
    var t = 1
    while (t <= steps) {
      val cand = st.join(e, st("cur") === e("src"), "left")
      val flagged = cand.join(near,
        cand("prev") === near("p_src") && cand("dst") === near("p_dst"),
        "left")
        .select(col("walk_id"), col("prev"), col("cur"), col("path"),
          col("dst"),
          when(col("dst").isNull, lit(1))
            .when(col("dst") === col("prev"), lit(wReturn))
            .when(col("p_src").isNotNull, lit(wNear))
            .otherwise(lit(wFar)).as("w"))
      val h = expr(("conv(substr(md5(concat(cast(walk_id AS string), ':', " +
        s"'$t', ':', cast(dst AS string), ':', cast(salt AS string)" +
        ")), 1, 8), 16, 10)")).cast("long")
      st = flagged
        .withColumn("salt", explode(expr("sequence(0, w - 1)")))
        .withColumn("hh", when(col("dst").isNotNull, h))
        .groupBy(col("walk_id"), col("prev"), col("cur"), col("path"))
        .agg(min(when(col("dst").isNotNull,
          struct(col("hh"), col("dst")))).as("pick"))
        .select(col("walk_id"),
          when(col("pick.dst").isNotNull, col("cur"))
            .otherwise(col("prev")).as("prev"),
          coalesce(col("pick.dst"), col("cur")).as("cur"),
          when(col("pick.dst").isNotNull,
            concat(col("path"), lit("->"), col("pick.dst")))
            .otherwise(col("path")).as("path"))
      t += 1
    }
    st.select(col("walk_id"), col("cur").as("end_node"), col("path"))
  }

  /** Luby-style maximal independent set with FIXED md5 priorities: each
    * round, an active node whose `(h(id), id)` priority beats every
    * active neighbor's joins the set, its neighbors drop out, and the
    * loop repeats on the shrunken active graph. Fixed priorities make
    * the result the unique greedy MIS in priority order — deterministic
    * and engine-reproducible — and random-looking md5 priorities give
    * the textbook O(log n) expected round count. Fixed `rounds` keeps
    * the operator oracle-exact (the pageRank recipe): nodes still
    * active after the budget are reported `undecided`, never guessed.
    *
    * Output: one row per node appearing in `edges` —
    * `(id, status ∈ {mis, out, undecided})`. Scale shape: per round two
    * semi-joins restrict edges to the active set, one partial-aggregated
    * min picks each node's best neighbor priority, and the active frame
    * is localCheckpointed (it feeds BOTH edge-endpoint semi-joins — the
    * self-join rule from resolveClusters/kCore).
    */
  /** Greedy maximal matching with fixed md5 edge priorities (the
    * Israeli–Itai local-minimum rule): each round, an edge whose
    * priority is the minimum at BOTH endpoints joins the matching, its
    * endpoints leave the graph, and the loop repeats. Fixed priorities
    * make the result the unique greedy matching in priority order;
    * fixed `rounds` keeps it oracle-exact — surviving edges whose
    * endpoints are both unmatched report `undecided`, never guessed.
    * The one-to-one pairing primitive: contrastive training pairs from
    * a near-dup graph, load balancing, dedup merge planning.
    *
    * Output: `(lo, hi, status ∈ {matched, undecided})` — edges dropped
    * because an endpoint matched elsewhere are not emitted. Scale
    * shape per round: one explode to incident rows, one
    * partial-aggregated per-vertex min, two equi-joins, two anti-joins;
    * the edge frame is checkpointed (it feeds both endpoint joins).
    */
  def maximalMatching(edges: DataFrame, rounds: Int = 4): DataFrame = {
    require(rounds >= 1)
    val hp = (a: Column, b: Column) =>
      conv(substring(md5(concat(a.cast("string"), lit(":"),
        b.cast("string"))), 1, 8), 16, 10).cast("long")
    var e = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .withColumn("h", hp(col("lo"), col("hi")))
      .localCheckpoint(true)
    var decided = e.limit(0).select(col("lo"), col("hi"))
      .withColumn("status", lit("matched"))
    var r = 0
    var drained = false
    // rounds past an empty edge frame are no-ops — break early, the
    // fixed-round oracle agrees
    while (r < rounds && !drained) {
      drained = e.isEmpty
      if (!drained) {
        val inc =
          e.select(col("lo").as("v"), col("h"), col("lo"), col("hi"))
            .unionByName(
              e.select(col("hi").as("v"), col("h"), col("lo"), col("hi")))
        val vmin = inc.groupBy(col("v"))
          .agg(min(struct(col("h"), col("lo"), col("hi"))).as("m"))
        val matched = e
          .join(vmin.select(col("v").as("lo"), col("m").as("mlo")), Seq("lo"))
          .join(vmin.select(col("v").as("hi"), col("m").as("mhi")), Seq("hi"))
          .filter(struct(col("h"), col("lo"), col("hi")) === col("mlo") &&
            struct(col("h"), col("lo"), col("hi")) === col("mhi"))
          .select(col("lo"), col("hi"))
          .localCheckpoint(true)
        decided = decided.unionByName(
          matched.withColumn("status", lit("matched")))
        val mv = matched.select(col("lo").as("v"))
          .unionByName(matched.select(col("hi").as("v"))).distinct()
        e = e.join(mv.select(col("v").as("lo")), Seq("lo"), "left_anti")
          .join(mv.select(col("v").as("hi")), Seq("hi"), "left_anti")
          .select(col("lo"), col("hi"), col("h"))
          .localCheckpoint(true)
      }
      r += 1
    }
    decided.unionByName(
      e.select(col("lo"), col("hi")).withColumn("status", lit("undecided")))
  }

  def maximalIndependentSet(edges: DataFrame, rounds: Int = 6): DataFrame = {
    require(rounds >= 1)
    val h = (c: Column) =>
      conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    var active = und.select(col("a").as("id")).distinct()
    var decided: DataFrame = null
    var r = 0
    var drained = false
    // fixed-round contract: rounds past an empty active set are no-ops,
    // so breaking early changes nothing (the unrolled oracle agrees)
    while (r < rounds && !drained) {
      val act = active.localCheckpoint(true)
      drained = act.isEmpty
      if (!drained) {
        val eAct = und
          .join(act.select(col("id").as("a")), Seq("a"), "left_semi")
          .join(act.select(col("id").as("b")), Seq("b"), "left_semi")
        val nbrMin = eAct.withColumn("hb", h(col("b")))
          .groupBy(col("a").as("id"))
          .agg(min(struct(col("hb"), col("b"))).as("m"))
          .select(col("id"), col("m.hb").as("nh"), col("m.b").as("nid"))
        val chosen = act.withColumn("hv", h(col("id")))
          .join(nbrMin, Seq("id"), "left")
          .filter(col("nh").isNull || col("hv") < col("nh") ||
            (col("hv") === col("nh") && col("id") < col("nid")))
          .select(col("id"))
        val removed = eAct
          .join(chosen.select(col("id").as("a")), Seq("a"), "left_semi")
          .select(col("b").as("id")).distinct()
        val dec = chosen.withColumn("status", lit("mis"))
          .unionByName(removed.withColumn("status", lit("out")))
          .localCheckpoint(true)
        decided = if (decided == null) dec else decided.unionByName(dec)
        active = act.join(dec.select("id"), Seq("id"), "left_anti")
      }
      r += 1
    }
    if (decided == null) active.withColumn("status", lit("undecided"))
    else decided.unionByName(active.withColumn("status", lit("undecided")))
  }

  /** k-source Brandes betweenness (hop-bounded): run Brandes'
    * shortest-path counting from a bounded pivot set and accumulate
    * each node's dependency — the sampled estimator for "which nodes
    * do paths funnel through" that exact betweenness (all-sources,
    * O(V·E)) cannot afford at scale; pivot sampling is the standard
    * trade (Brandes–Pich). Deterministic and oracle-exact: the forward
    * level-BFS counts shortest paths σ in exact BIGINT (every parent
    * at depth h−1 contributes its σ to each depth-h child, one
    * partial-agg groupBy per hop), and the backward pass accumulates
    * δ(v) = Σ_children floor(σ_v·(10⁶+δ_w)/σ_w) in e6 fixed point —
    * one floor per edge term, non-negative operands, identical in SQL.
    * All sources advance TOGETHER: every frame is keyed (seed, node),
    * so a hop is one keyed join + one partial agg regardless of |S|.
    *
    * Scale shape: 2·maxHops bounded rounds, each localCheckpointed
    * (the per-depth frames feed BOTH the next hop and the backward
    * pass — the kCore double-reference rule); edges dedup once up
    * front (σ counts simple paths, not multi-edges). σ fits BIGINT
    * through ~10¹² parallel shortest paths per (seed, node) — beyond
    * that (dense small-world graphs at high hop budgets) lower
    * maxHops. Betweenness excludes endpoints (δ at the seed itself is
    * dropped), summed across seeds as an order-free integer.
    */
  def betweenness(edges: DataFrame, seeds: DataFrame,
                  maxHops: Int = 3): DataFrame = {
    val und = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(edges.select(col("dst").as("u"), col("src").as("v")))
      .distinct().localCheckpoint(true)
    val f0 = seeds.select(col("id").as("s")).distinct()
      .select(col("s"), col("s").as("v"), lit(0L).as("dist"),
        lit(1L).as("sig")).localCheckpoint(true)
    var known = f0
    var frontier = f0
    var levels = List(f0)           // depth-indexed, head = deepest
    var hop = 1
    while (hop <= maxHops && !frontier.isEmpty) {
      val fresh = frontier
        .select(col("s"), col("v").as("u"), col("sig"))
        .join(und, Seq("u"))
        .groupBy(col("s"), col("v"))
        .agg(sum(col("sig")).as("sig"))
        .join(known.select(col("s"), col("v")), Seq("s", "v"), "left_anti")
        .select(col("s"), col("v"), lit(hop.toLong).as("dist"), col("sig"))
        .localCheckpoint(true)
      known = known.unionByName(fresh)
      levels = fresh :: levels
      frontier = fresh
      hop += 1
    }
    // backward dependency accumulation, deepest level has delta 0
    var below = levels.head.withColumn("delta", lit(0L))
      .localCheckpoint(true)
    var acc = below
    levels.tail.foreach { lvl =>
      val contrib = lvl
        .select(col("s"), col("v"), col("sig"))
        .withColumnRenamed("v", "u")
        .join(und, Seq("u"))
        .join(below.select(col("s"), col("v"),
          col("sig").as("csig"), col("delta").as("cdelta")),
          Seq("s", "v"))
        .groupBy(col("s"), col("u").as("gv"))
        .agg(sum(expr("sig * (1000000L + cdelta) div csig")).as("delta"))
        .withColumnRenamed("gv", "v")
      val withDelta = lvl
        .join(contrib, Seq("s", "v"), "left")
        .select(col("s"), col("v"), col("dist"), col("sig"),
          coalesce(col("delta"), lit(0L)).as("delta"))
        .localCheckpoint(true)
      below = withDelta
      acc = acc.unionByName(withDelta)
    }
    acc.filter(col("dist") > 0L)
      .groupBy(col("v").as("id"))
      .agg(sum(col("delta")).as("betweenness_e6"),
        count(lit(1)).as("n_sources"))
      .filter(col("betweenness_e6") > 0L)
      .orderBy(col("betweenness_e6").desc, col("id"))
  }
}
