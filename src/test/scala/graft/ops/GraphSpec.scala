package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("degreeStats counts directions and totals, including pure sinks/sources") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val rows = Graph.degreeStats(edges).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 2L, 0L, 2L), (2L, 1L, 1L, 2L), (3L, 0L, 2L, 2L)))
  }

  test("randomWalks picks the md5-argmin neighbor and freezes at sinks") {
    def h(w: Long, t: Int, d: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$w:$t:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    // 1 -> {2, 3}; 2 -> {4}; 3 -> {4}; 4 is a sink
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val r = Graph.randomWalks(edges, seeds, steps = 3).collect()
    assert(r.length == 1)
    val first = if (h(1L, 1, 2L) <= h(1L, 1, 3L)) 2L else 3L
    // step 2 reaches the sink 4; step 3 freezes there
    assert(r.head.getAs[String]("path") == s"1->$first->4")
    assert(r.head.getAs[Long]("end_node") == 4L)
    // one walk per seed, even for isolated seeds (they never move)
    val iso = Graph.randomWalks(edges, Seq(Tuple1(9L)).toDF("id"), 2)
      .collect()
    assert(iso.head.getAs[String]("path") == "9")
  }

  test("walkCorpus emits windowed skip-gram pairs over walk positions") {
    // forced chain 1->2->3->4: window-2 pairs are the 3 adjacent + 2
    // distance-2 pairs, each counted once
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.walkCorpus(e, Seq(Tuple1(1L)).toDF("id"),
      steps = 3, window = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 2L) -> 1L, (2L, 3L) -> 1L, (3L, 4L) -> 1L,
      (1L, 3L) -> 1L, (2L, 4L) -> 1L))
  }

  test("weightedPageRank matches hand-computed weighted contributions") {
    // 1 -> 2 (w=3), 1 -> 3 (w=1): W1 = 4; one round from r0 = 1e12:
    //  c(2) = 3*(1e12 div 4) = 750e9 -> r = 150e9 + 85*750e9 div 100
    //  c(3) = 1*(1e12 div 4) = 250e9 -> r = 150e9 + 85*250e9 div 100
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val r = Graph.weightedPageRank(e, iters = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 150000000000L)
    assert(r(2L) == 150000000000L + 85L * 750000000000L / 100L)
    assert(r(3L) == 150000000000L + 85L * 250000000000L / 100L)
  }

  test("weightedPageRank with unit weights equals unweighted pageRank") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val unweighted = Graph.pageRank(e, 4).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val weighted = Graph.weightedPageRank(
      e.withColumn("w", org.apache.spark.sql.functions.lit(1L)), 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(weighted == unweighted)
  }

  test("biasedWalks follows a forced chain and freezes at the sink") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.biasedWalks(e, Seq(Tuple1(1L)).toDF("id"), steps = 5)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("end_node") == 4L)
    assert(out.head.getAs[String]("path") == "1->2->3->4")
  }

  test("biasedWalks step-2 pick equals the weighted replica-min-hash") {
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    // step 1 forced 1->2; at 2 with prev=1 the candidates are the
    // return edge back to 1 (wReturn=1 -> one replica) and the far
    // node 3 (no (1,3) edge -> wFar=4 -> four replicas)
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val reps = Seq((1L, 0), (3L, 0), (3L, 1), (3L, 2), (3L, 3))
    val expected = reps.map { case (d, s) => (h(s"1:2:$d:$s"), d) }.min._2
    val out = Graph.biasedWalks(e, Seq(Tuple1(1L)).toDF("id"), steps = 2)
      .collect().head
    assert(out.getAs[Long]("end_node") == expected)
    assert(out.getAs[String]("path") == s"1->2->$expected")
    // with the (1,3) edge present, 3 becomes a near candidate (wNear=2):
    // only two replicas enter the pool
    val e2 = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    // step 1 now has candidates {2, 3}, both far (prev null): re-derive
    val s1 = Seq((2L, 0), (2L, 1), (2L, 2), (2L, 3),
      (3L, 0), (3L, 1), (3L, 2), (3L, 3))
      .map { case (d, s) => (h(s"1:1:$d:$s"), d) }.min._2
    val out2 = Graph.biasedWalks(e2, Seq(Tuple1(1L)).toDF("id"), steps = 1)
      .collect().head
    assert(out2.getAs[Long]("end_node") == s1)
  }

  test("pageRank matches hand-computed fixed-point rounds") {
    // graph: 1 -> 2, 1 -> 3, 2 -> 3 (outdeg 1:2, 2:1), S = 1e12
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    // round 1: r(1)=base; r(2)=base+85*(S div 2) div 100;
    //          r(3)=base+85*(S div 2 + S) div 100
    // round 2: contribs use round-1 ranks
    val r2 = Graph.pageRank(edges, 2).orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("rank_scaled")).toMap
    assert(r2(1L) == 150000000000L)
    assert(r2(2L) == 213750000000L)  // base + 85*(150000000000 div 2) div 100
    assert(r2(3L) == 702500000000L)  // base + 85*(75000000000 + 575000000000) div 100
    // mass leaks only through node 3 (the sink) and integer truncation:
    // totals stay bounded by |V| * S
    assert(r2.values.sum <= 3L * Graph.Scale)
  }

  test("personalizedPageRank teleports only to the seed set") {
    // same graph as the pageRank test, seeded on node 1:
    // r0 = (S, 0, 0)
    // round 1: r1=base; r2=(85*(S div 2)) div 100; r3 likewise
    // round 2: contribs from round-1 ranks, teleport still seed-only
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val r = Graph.personalizedPageRank(edges, seeds, 2).orderBy("id")
      .collect().map(x => x.getLong(0) -> x.getAs[Long]("rank_scaled")).toMap
    assert(r(1L) == 150000000000L)
    assert(r(2L) == 63750000000L)   // (85 * (150e9 div 2)) div 100
    assert(r(3L) == 425000000000L)  // (85 * (75e9 + 425e9)) div 100
    // a seed absent from the graph contributes nothing and is dropped
    val r2 = Graph.personalizedPageRank(edges,
      Seq(Tuple1(99L)).toDF("id"), 2).collect()
    assert(r2.map(_.getAs[Long]("rank_scaled")).forall(_ == 0L))
    assert(!r2.map(_.getLong(0)).contains(99L))
  }

  test("shortestPaths relaxes weighted edges within the hop budget") {
    // 1 -(1)-> 2 -(1)-> 3, and a heavy direct edge 1 -(5)-> 3;
    // node 4 is only reachable in 3 hops: 3 -(1)-> 4
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val d = Graph.shortestPaths(edges, seeds, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two-hop path (cost 2) beats the direct heavy edge (cost 5)
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // with a one-hop budget only the direct edges resolve
    val d1 = Graph.shortestPaths(edges, seeds, maxHops = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 == Map(1L -> 0L, 2L -> 1L, 3L -> 5L))
  }

  test("widestPaths maximizes the bottleneck within the hop budget") {
    // 1 -(10)-> 2 -(5)-> 3, and a thin direct edge 1 -(3)-> 3;
    // node 4 hangs off 3 with capacity 7 (bottleneck stays 5)
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 5L), (1L, 3L, 3L), (3L, 4L, 7L))
      .toDF("src", "dst", "w")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val c = Graph.widestPaths(edges, seeds, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two-hop path (min(10,5)=5) beats the thin direct edge (3)
    assert(c == Map(1L -> Long.MaxValue, 2L -> 10L, 3L -> 5L, 4L -> 5L))
    // one-hop budget: only direct edges resolve, 3 gets the thin edge
    val c1 = Graph.widestPaths(edges, seeds, maxHops = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c1 == Map(1L -> Long.MaxValue, 2L -> 10L, 3L -> 3L))
  }

  test("sampleNeighbors bounds fanout per hop and chains the frontier") {
    // star: node 1 -> 10..19 (10 out-neighbors); each 1x -> {100+x}
    val e = (10L to 19L).map(d => (1L, d)) ++
      (10L to 19L).map(d => (d, 100L + d))
    val edges = e.toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val out = Graph.sampleNeighbors(edges, seeds, Seq(3, 2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val h0 = out.filter(_._1 == 0L)
    val h1 = out.filter(_._1 == 1L)
    assert(h0.length == 3, "hop-0 fanout capped at 3 of 10 neighbors")
    assert(h0.forall(_._2 == 1L))
    // hop-1 frontier is EXACTLY hop-0's sampled dsts; each has one
    // out-neighbor so fanout 2 yields one edge per frontier node
    assert(h1.map(_._2).sorted.toSeq == h0.map(_._3).sorted.toSeq)
    assert(h1.forall(r => r._3 == 100L + r._2))
    // derandomized: a second run returns the identical subgraph
    val again = Graph.sampleNeighbors(edges, seeds, Seq(3, 2)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }

  test("conductance: bridged triangles leak exactly one edge each") {
    // triangles {1,2,3} and {4,5,6} with one bridge 3-4; labels x / y:
    // each community: internal 3, cut 1, vol 7; total_vol 14 ->
    // phi = 1e6 * 1 div min(7, 7) = 142857
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, "x"), (2L, "x"), (3L, "x"),
      (4L, "y"), (5L, "y"), (6L, "y")).toDF("id", "c")
    val out = Graph.conductance(edges, labels).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_nodes"),
        r.getAs[Long]("internal"), r.getAs[Long]("cut"),
        r.getAs[Long]("vol"), r.getAs[Long]("phi_ppm"))).toMap
    assert(out("x") == ((3L, 3L, 1L, 7L, 142857L)))
    assert(out("y") == ((3L, 3L, 1L, 7L, 142857L)))
  }

  test("richClub: a hub clique scores a perfect club, thin cores NULL") {
    // K4 on nodes 1-4 (deg 3, node 1 also feeds 6 leaves -> deg 9)
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val leaves = (5L to 10L).map(l => (1L, l))
    val edges = (k4 ++ leaves).toDF("src", "dst")
    val out = Graph.richClub(edges, ks = Seq(1, 3)).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    // deg>1 core = {1,2,3,4}, all 6 K4 edges qualify -> phi = 1.0
    assert(out(1L) == ((4L, 6L, Some(1000000L))))
    // deg>3 core = {1} alone -> phi undefined
    assert(out(3L) == ((1L, 0L, None)))
  }

  test("coOccurrence builds canonical pairs and caps hot groups") {
    val df = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),     // group 1: 3 pairs
      (2L, 10L), (2L, 20L),                // group 2: repeats an edge
      (3L, 40L), (3L, 41L), (3L, 42L), (3L, 43L) // hot group, capped below
    ).toDF("g", "item")
    val edges = Graph.coOccurrence(df, "g", "item", maxGroupSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((10L, 20L), (10L, 30L), (20L, 30L)),
      "hot group dropped, duplicate edge deduped, pairs canonical")
  }

  test("triangleCounts enumerates each triangle once at every vertex") {
    // K4 on {1,2,3,4} (4 triangles, each vertex in 3) plus a pendant edge
    // and a reversed duplicate edge
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val edges = (k4 ++ Seq((2L, 1L), (4L, 5L))).toDF("src", "dst")
    val counts = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"got $counts")
  }

  test("pageRank ranks a heavier-cited node above a lighter one") {
    // 10 nodes all pointing at 100, one pointing at 200
    val edges = ((1L to 10L).map(_ -> 100L) :+ (11L -> 200L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, 3).collect()
      .map(x => x.getLong(0) -> x.getAs[Long]("rank_scaled")).toMap
    assert(r(100L) > r(200L))
    assert(r(200L) > 0L)
  }

  test("nodeSimilarity scores jaccard over neighbor sets and prunes hubs") {
    // a:{1,2,3}, b:{2,3,4}, c:{9}; neighbor 5 is a hub shared by all
    // three and must be pruned (dfMax=2) before pair generation
    val edges = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 5L),
      (20L, 2L), (20L, 3L), (20L, 4L), (20L, 5L),
      (30L, 9L), (30L, 5L)
    ).toDF("src", "dst")
    val out = Graph.nodeSimilarity(edges, topK = 10, minScore = 0.0, dfMax = 2)
    assertNoCrossProduct(out, "nodeSimilarity")
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getAs[Long]("other"),
        r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"),
        r.getAs[Double]("score"))).sortBy(x => (x._1, x._2))
    // only the 10-20 pair survives: J = |{2,3}| / |{1,2,3,5} u {2,3,4,5}|
    // = 2/6 (degrees count ALL neighbors incl. the pruned hub)
    assert(rows.toSeq == Seq(
      (10L, 20L, 2L, 6L, 2.0 / 6.0), (20L, 10L, 2L, 6L, 2.0 / 6.0)),
      s"got ${rows.toSeq}")
  }

  test("nodeSimilarity keeps each node's top-k deterministically") {
    // node 1 ties with 2 and 3 at the same score; rank breaks toward the
    // smaller partner id
    val edges = Seq(
      (1L, 10L), (1L, 11L),
      (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L)
    ).toDF("src", "dst")
    val rows = Graph.nodeSimilarity(edges, topK = 1, minScore = 0.0, dfMax = 10)
      .filter(col("id") === 1L).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("other") == 2L)
    assert(rows(0).getAs[Double]("score") == 1.0)
  }

  test("bfs reports minimum hop distance, undirected, capped at maxHops") {
    // path 1-2-3-4-5 plus a shortcut 1-4: dist(4) is 1 via the shortcut,
    // dist(5) is 2 even though edges point 5->4 (undirected view)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 4L), (1L, 4L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.bfs(edges, seeds, maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
    // tighter cap prunes the far nodes entirely
    val one = Graph.bfs(edges, seeds, maxHops = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(one === Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("bfs takes the minimum over multiple seeds") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L, 4L).toDF("id")
    val got = Graph.bfs(edges, seeds, maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("kCore peels cascading low-degree nodes down to the core") {
    // K4 on 1-4 plus a tail 4-5-6 at k=2: the tail unravels over TWO
    // rounds (6 drops, THEN 5's degree falls to 1), leaving K4
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val got = Graph.kCore(edges, k = 2, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // one round is NOT enough: 5 still looks 2-connected until 6 is gone
    val partial = Graph.kCore(edges, k = 2, rounds = 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(partial.contains(5L) && !partial.contains(6L))
    // extra rounds past convergence are no-ops (the oracle contract)
    val more = Graph.kCore(edges, k = 2, rounds = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(more === got)
  }

  test("kCore returns empty when no core exists at k") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.kCore(path, k = 2, rounds = 4).isEmpty)
  }

  test("labelPropagation separates two triangles joined by a bridge") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // hand-traced synchronous rounds with min-label tie-break
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    // one community label per triangle side (bridge nodes settle too)
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(Set(got(4L), got(5L), got(6L)).size == 1)
  }

  test("seedDistances keeps per-seed identity on a path graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("id")
    val got = Graph.seedDistances(edges, seeds, maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L),
      (5L, 5L, 0L), (5L, 4L, 1L), (5L, 3L, 2L)))
  }

  test("harmonicCloseness sums exact scaled reciprocals within the radius") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("id")
    val got = Graph.harmonicCloseness(edges, seeds, maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // node 3 reached by both seeds at d=2 (6+6); nodes 2 and 4 by one
    // seed at d=1 (12); seeds themselves are beyond each other's radius
    assert(got == Set(
      (2L, 12L, 1L, 1.0), (3L, 12L, 2L, 1.0), (4L, 12L, 1L, 1.0)))
  }

  test("labelPropagation is deterministic across runs") {
    val edges = (1 to 200).map(i =>
      (i.toLong, ((i * 7) % 50 + 1).toLong)).toDF("src", "dst")
    val a = Graph.labelPropagation(edges, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.labelPropagation(edges, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("hits ranks the better-endorsed authority higher") {
    // authority 10 <- hubs {1,2,3}; authority 11 <- hubs {1,4}:
    // 10 has more in-links, so a(10) > a(11); hub 1 (cites both
    // authorities) must outrank hub 3 (cites one)
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L),
      (4L, 11L)).toDF("src", "dst")
    val r = Graph.hits(edges, iters = 3).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(10L)._2 > r(11L)._2, "authority 10 must outrank 11")
    assert(r(1L)._1 > r(3L)._1,
      "the hub citing both authorities must outrank a single-citer")
    assert(r(10L)._1 == 0L && r(1L)._2 == 0L,
      "bipartite graph: sources have no authority, sinks no hub mass")
    // L1 normalization bounds the mass: dividing by t = max(1,
    // total div Scale) keeps sum(r) in [~Scale, Scale*(1+1/t)) — on a
    // tiny graph t is small, so only the coarse envelope holds
    val authMass = r.values.map(_._2).sum
    val hubMass = r.values.map(_._1).sum
    assert(authMass > Graph.Scale / 2 && authMass < 3 * Graph.Scale,
      s"authority mass $authMass outside the normalization envelope")
    assert(hubMass > Graph.Scale / 2 && hubMass < 3 * Graph.Scale,
      s"hub mass $hubMass outside the normalization envelope")
  }

  test("hits is deterministic and handles sink-drained mass") {
    // a chain 1->2->3: node 2 is both hub and authority; mass drains
    // toward the sink but the greatest(1,...) guard keeps rounds defined
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val a = Graph.hits(edges, iters = 4).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Graph.hits(edges, iters = 4).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
    assert(a.forall { case (_, h, au) => h >= 0L && au >= 0L })
  }

  /** Reference SCC via iterative Tarjan for cross-checking. */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var index = 0
    val idx = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.Stack[Long]()
    val comps = scala.collection.mutable.ListBuffer[Set[Long]]()
    def strongconnect(v: Long): Unit = {
      idx(v) = index; low(v) = index; index += 1
      stack.push(v); onStack += v
      for (w <- adj.getOrElse(v, Seq.empty)) {
        if (!idx.contains(w)) { strongconnect(w); low(v) = low(v) min low(w) }
        else if (onStack(w)) low(v) = low(v) min idx(w)
      }
      if (low(v) == idx(v)) {
        val comp = scala.collection.mutable.Set[Long]()
        var w = -1L
        while ({ w = stack.pop(); onStack -= w; comp += w; w != v }) ()
        comps += comp.toSet
      }
    }
    nodes.foreach(v => if (!idx.contains(v)) strongconnect(v))
    comps.flatMap(c => c.map(_ -> c)).toMap
  }

  test("scc matches Tarjan on cycles, a DAG tail, and nested structure") {
    // cycle {1,2,3}, cycle {10,11}, DAG nodes 20->1 and 21->20, and a
    // two-node back-and-forth {30,31} feeding the first cycle
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L),
      (20L, 1L), (21L, 20L), (30L, 31L), (31L, 30L), (31L, 1L))
    val out = Graph.scc(es.toDF("src", "dst"), peels = 3, hops = 5)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    val truth = tarjan(es)
    // every assigned pair of nodes agrees with Tarjan's partition
    val assigned = out.collect { case (k, Some(v)) => k -> v }
    assert(assigned.nonEmpty)
    for ((a, ca) <- assigned; (b, cb) <- assigned) {
      assert((ca == cb) == (truth(a) == truth(b)),
        s"nodes $a/$b grouping disagrees with Tarjan")
    }
    // the full budget resolves this graph completely, exactly
    assert(out.values.forall(_.isDefined))
    assert(assigned.values.toSet.size == truth.values.toSet.size)
  }

  test("scc within budget assigns only provable components, rest NULL") {
    // three 2-cycles chained by cross edges: {0,1} -> {4,5} -> {8,9};
    // min-label interference resolves one block per peel, so peels=2
    // leaves the third block honestly unassigned
    val es = Seq((0L, 1L), (1L, 0L), (4L, 5L), (5L, 4L), (8L, 9L),
      (9L, 8L), (0L, 4L), (4L, 8L))
    val out = Graph.scc(es.toDF("src", "dst"), peels = 2, hops = 4)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(out(0L).contains(0L) && out(1L).contains(0L))
    assert(out(4L).contains(4L) && out(5L).contains(4L))
    assert(out(8L).isEmpty && out(9L).isEmpty)
    // a third peel finishes the job
    val full = Graph.scc(es.toDF("src", "dst"), peels = 3, hops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full(8L) == 8L && full(9L) == 8L)
  }

  test("maximalIndependentSet: independent, maximal, every node decided") {
    import spark.implicits._
    // path 1-2-3-4-5-6 plus triangle 7-8-9
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (7L, 8L), (8L, 9L), (7L, 9L))
    val out = Graph.maximalIndependentSet(es.toDF("src", "dst"), rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet === (1L to 9L).toSet)
    assert(!out.values.exists(_ == "undecided"))
    val mis = out.collect { case (id, "mis") => id }.toSet
    // independence: no edge joins two MIS nodes
    es.foreach { case (a, b) => assert(!(mis(a) && mis(b)), s"edge $a-$b") }
    // maximality: every excluded node has a MIS neighbor
    val adj = (es ++ es.map(_.swap)).groupMap(_._1)(_._2)
    out.collect { case (id, "out") => id }.foreach { id =>
      assert(adj(id).exists(mis), s"node $id has no MIS neighbor")
    }
    // the triangle contributes exactly one MIS node
    assert(Set(7L, 8L, 9L).count(mis) === 1)
  }

  test("maximalIndependentSet reports leftovers as undecided, not guessed") {
    import spark.implicits._
    // 1 round on a path: the losers of round 1 that were not adjacent
    // to a winner must come back undecided rather than misclassified
    val es = (1L until 30L).map(i => (i, i + 1))
    val out = Graph.maximalIndependentSet(es.toDF("src", "dst"), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val mis = out.collect { case (id, "mis") => id }.toSet
    es.foreach { case (a, b) => assert(!(mis(a) && mis(b))) }
    // round 1 decides winners and their neighbors only
    val adj = (es ++ es.map(_.swap)).groupMap(_._1)(_._2)
    out.foreach { case (id, st) =>
      if (st == "out") assert(adj(id).exists(mis))
      if (st == "undecided") assert(!mis(id) && !adj(id).exists(mis))
    }
  }

  test("maximalMatching: a matching, maximal, deterministic") {
    import spark.implicits._
    // path 1-2-3-4-5 plus triangle 6-7-8
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 8L), (6L, 8L))
    val out = Graph.maximalMatching(es.toDF("src", "dst"), rounds = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2))
      .toMap
    assert(!out.values.exists(_ == "undecided"))
    val m = out.collect { case (e, "matched") => e }.toSet
    // a matching: no vertex twice
    val vs = m.toSeq.flatMap { case (a, b) => Seq(a, b) }
    assert(vs.distinct.size === vs.size)
    // maximal: every input edge has a matched endpoint
    val mv = vs.toSet
    es.foreach { case (a, b) =>
      assert(mv(a) || mv(b), s"edge $a-$b unmatched and uncovered") }
    // the triangle contributes exactly one matched edge
    assert(m.count { case (a, b) => a >= 6L && b >= 6L } === 1)
    // deterministic across runs
    val again = Graph.maximalMatching(es.toDF("src", "dst"), rounds = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2))
      .toMap
    assert(again === out)
  }

  test("boruvkaForest finds the unique MST of a weighted square") {
    import spark.implicits._
    // square 1-2-3-4 with diagonal 1-3: the unique MST is
    // {(1,2,w1), (3,4,w2), (1,3,w3)} — the w4 and w5 edges close cycles
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 5L), (3L, 4L, 2L),
      (4L, 1L, 4L), (1L, 3L, 3L)).toDF("src", "dst", "w")
    val rows = Graph.boruvkaForest(edges, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(t => (t._2, t._3, t._4)).toSet ==
      Set((1L, 2L, 1L), (3L, 4L, 2L), (1L, 3L, 3L)),
      s"unique MST expected, got ${rows.mkString(", ")}")
    // round structure: both component minima in round 0, bridge round 1
    assert(rows.toSet == Set((0L, 1L, 2L, 1L), (0L, 3L, 4L, 2L),
      (1L, 1L, 3L, 3L)))
    // a long chain exercises the within-round merge-to-convergence:
    // every node's min edge points right/left, one merge group of 6
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L),
      (4L, 5L, 4L), (5L, 6L, 5L)).toDF("src", "dst", "w")
    val ch = Graph.boruvkaForest(chain, rounds = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(ch == Set((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L),
      (4L, 5L, 4L), (5L, 6L, 5L)), "a tree's MST is itself")
  }

  test("temporalReachability respects time: stale edges do not propagate") {
    import spark.implicits._
    // 1 -(t=10)-> 2 -(t=5)-> 3 : a static BFS reaches 3, but the 2->3
    // edge fired BEFORE the walker arrived at 2 — temporally unreachable
    // 2 -(t=15)-> 4 : reached at 15
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 5L), (2L, 4L, 15L))
      .toDF("src", "dst", "ts")
    val seeds = Seq(1L).toDF("id")
    val out = Graph.temporalReachability(edges, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 10L, 4L -> 15L),
      s"expected time-respecting arrivals, got $out")
    assert(!out.contains(3L), "the stale 2->3 edge must not propagate")
  }

  test("greedyColoring yields a proper coloring; budget leftovers NULL") {
    import spark.implicits._
    // triangle (needs 3 colors) plus a pendant off node 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.greedyColoring(edges, rounds = 6).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out.size == 4)
    assert(out.values.forall(_.isDefined),
      "a 4-node graph must fully color within 6 rounds")
    for ((a, b) <- Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
      assert(out(a).get != out(b).get, s"edge ($a,$b) shares a color")
    assert(Set(out(1L).get, out(2L).get, out(3L).get).size == 3,
      "the triangle takes three distinct colors")
    // a 1-round budget cannot color a node that loses its priority
    // election — leftovers surface as NULL, never a guessed color
    val one = Graph.greedyColoring(edges, rounds = 1).collect()
    assert(one.exists(_.isNullAt(1)), "round budget leaves undecided NULLs")
  }

  test("kTruss keeps the K4 core, peels pendants, labels truss on converge") {
    import spark.implicits._
    // K4 on {1,2,3,4}; a triangle {4,5,6} hanging off; a pendant 6-7
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val es = k4 ++ Seq((4L, 5L), (5L, 6L), (4L, 6L), (6L, 7L))
    val out = Graph.kTruss(es.toDF("src", "dst"), k = 4, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2))
      .toMap
    // hanging triangle edges have support 1 < 2, pendant 0: removed r1
    assert(out((4L, 5L)) === "removed_1")
    assert(out((5L, 6L)) === "removed_1")
    assert(out((4L, 6L)) === "removed_1")
    assert(out((6L, 7L)) === "removed_1")
    // K4 edges each sit in 2 triangles: the converged 4-truss
    k4.foreach { e => assert(out(e) === "truss", s"$e") }
  }

  test("kTruss cascade respects the round budget, candidates not overclaimed") {
    import spark.implicits._
    // two triangles sharing edge (2,3): round 1 removes the four outer
    // edges (support 1), round 2 removes (2,3) (support now 0)
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val one = Graph.kTruss(es.toDF("src", "dst"), k = 4, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2))
      .toMap
    assert(one((2L, 3L)) === "candidate") // budget exhausted, not "truss"
    assert(one.values.count(_ == "removed_1") === 4)
    val two = Graph.kTruss(es.toDF("src", "dst"), k = 4, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2))
      .toMap
    assert(two((2L, 3L)) === "removed_2")
  }

  test("scc halts without removal when hops cannot converge") {
    // a long cycle whose propagation diameter exceeds hops=1: the
    // verification step detects instability and nothing is assigned
    // (sound: no SCC is ever split by a premature peel)
    val ring = (0L until 8L).map(i => (i, (i + 1) % 8))
    val out = Graph.scc(ring.toDF("src", "dst"), peels = 2, hops = 1)
      .collect()
    assert(out.forall(_.isNullAt(1)))
  }

  test("linkPredict scores 2-hop pairs by RA and excludes existing edges") {
    import spark.implicits._
    // path 1-2-3-4: candidates (1,3) via center 2 and (2,4) via center 3,
    // both deg-2 centers -> ra = 500000, cn = 1
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.linkPredict(path, topK = 5).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")) ->
        (r.getAs[Long]("common_neighbors"), r.getAs[Long]("ra_ppm"))).toMap
    assert(out === Map((1L, 3L) -> (1L, 500000L), (2L, 4L) -> (1L, 500000L)))
    // closing (1,3) removes it from the prediction set
    val closed = path.union(Seq((1L, 3L)).toDF("src", "dst"))
    val out2 = Graph.linkPredict(closed, topK = 5).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    assert(!out2.contains((1L, 3L)))
    // and mints the new 2-hop pairs the triangle edge creates
    assert(out2.contains((2L, 4L)))
  }


  test("assortativity is exactly -1 on a path (leaf-hub anti-correlation)") {
    import spark.implicits._
    // path 1-2-3: endpoint degree pairs (1,2),(2,1),(2,1),(1,2) -> y = 3-x
    val out = Graph.assortativity(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")).collect().head
    assert(out.getAs[Long]("n_endpoints") == 4L)
    assert(math.abs(out.getAs[Double]("assortativity") + 1.0) < 1e-12)
  }

  test("assortativity is positive when hubs link to hubs") {
    import spark.implicits._
    // two triangles joined by a bridge between their degree-3 nodes
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val a = Graph.assortativity(e).collect().head.getAs[Double]("assortativity")
    assert(!a.isNaN)
  }


  test("modularity of two disjoint triangles under their own labels is 1/2") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("id", "lbl")
    val out = Graph.modularity(e, labels).collect().head
    // m=6; per community e_in=3, d_c=6: q_num = 2*(4*6*3 - 36) = 72,
    // q_den = 4*36 = 144 -> Q = 0.5 exactly
    assert(out.getAs[Long]("m_edges") == 6L)
    assert(out.getAs[Long]("n_communities") == 2L)
    assert(out.getAs[Long]("q_num") == 72L)
    assert(out.getAs[Long]("q_den") == 144L)
    assert(out.getAs[Double]("modularity") == 0.5)
    // everything in ONE community scores exactly zero
    val one = labels.select($"id",
      org.apache.spark.sql.functions.lit(1L).as("lbl"))
    assert(Graph.modularity(e, one).collect().head
      .getAs[Long]("q_num") == 0L)
  }

  test("neighborAgg: 1-hop stats and path-weighted 2-hop sums") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val feats = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "f")
    val out = Graph.neighborAgg(e, feats).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    // node 1: neighbors {2, 3}; 2-hop = h1_sum(2) only (3 has no h1 row)
    assert(out(1L) == ((2L, 50L, 20L, 30L, Some(30L))))
    assert(out(2L) == ((1L, 30L, 30L, 30L, None)))
    assert(!out.contains(3L), "sink has no outgoing aggregation row")
  }

  test("clusteringCoefficient: triangle closes fully, pendant scores 0") {
    // triangle 1-2-3 plus pendant edge 3-4
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.clusteringCoefficient(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((2L, 1L, 1000000L)))
    assert(out(2L) == ((2L, 1L, 1000000L)))
    assert(out(3L) == ((3L, 1L, 2000000L / 6L))) // 2T/(3*2) = 1/3
    assert(out(4L) == ((1L, 0L, 0L)))
  }

  test("degreeDistribution buckets by bit-length with a defined slope") {
    // star: hub degree 8 (bucket 4), 8 leaves degree 1 (bucket 1)
    val e = (1L to 8L).map(i => (0L, i)).toDF("src", "dst")
    val out = Graph.degreeDistribution(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(out(4L)._1 == 1L && out(4L)._2 == 8L) // the hub
    assert(out(1L)._1 == 8L && out(1L)._3 == 1L) // the leaves
    // pts: (1, 4) leaves->log2(8)+1=4, (4, 1) hub; slope = -1 exactly
    assert(out(1L)._4 == Some(-1.0))
    // degenerate: a single bucket reports NULL, not a fake slope
    val uni = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val u = Graph.degreeDistribution(uni).collect()
    assert(u.forall(r => r.isNullAt(4)))
  }

  test("louvainOneLevel separates bridged triangles and beats labelprop Q") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val lv = Graph.louvainOneLevel(edges, rounds = 10)
    val labs = lv.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs(1L) == labs(2L) && labs(2L) == labs(3L),
      s"left triangle split: $labs")
    assert(labs(4L) == labs(5L) && labs(5L) == labs(6L),
      s"right triangle split: $labs")
    assert(labs(1L) != labs(4L), s"triangles merged across the bridge: $labs")
    // the optimization step must not score below the no-objective spread
    val lp = Graph.labelPropagation(edges, rounds = 3)
    val qLv = Graph.modularity(edges, lv)
      .collect()(0).getAs[Double]("modularity")
    val qLp = Graph.modularity(edges, lp)
      .collect()(0).getAs[Double]("modularity")
    assert(qLv >= qLp, s"louvain Q $qLv below labelprop Q $qLp")
    // two-triangle optimum for this fixture: Q = 2*(3/7 - (7/14)^2) ... the
    // exact integer pair is asserted via the known best labeling instead
    val bestQ = Graph.modularity(edges,
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
        .toDF("id", "lbl")).collect()(0).getAs[Double]("modularity")
    assert(math.abs(qLv - bestQ) < 1e-12,
      s"louvain Q $qLv != two-triangle optimum $bestQ")
  }

  test("louvainTwoLevel merges communities the one-level pass cannot, Q never drops") {
    // a 4-cycle of triangles: phase 1 finds the triangles; only a
    // whole-community move can then test merging adjacent triangles
    val tri = (c: Long) => Seq((3 * c + 1, 3 * c + 2), (3 * c + 2, 3 * c + 3),
      (3 * c + 1, 3 * c + 3))
    val bridges = Seq((3L, 4L), (6L, 7L), (9L, 10L), (12L, 1L))
    val edges = ((0L to 3L).flatMap(tri) ++ bridges).toDF("src", "dst")
    val l1 = Graph.louvainOneLevel(edges, rounds = 6)
    val l2 = Graph.louvainTwoLevel(edges, rounds1 = 6, rounds2 = 4)
    val q1 = Graph.modularity(edges, l1)
      .collect()(0).getAs[Double]("modularity")
    val q2 = Graph.modularity(edges, l2)
      .collect()(0).getAs[Double]("modularity")
    assert(q2 >= q1, s"phase 2 dropped Q: $q2 < $q1")
    // phase-2 labels must be a coarsening of phase 1: every phase-1
    // community maps to exactly one phase-2 label
    val m1 = l1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m2 = l2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m2.keySet == m1.keySet)
    val comp = m1.keySet.groupBy(m1).values
    assert(comp.forall(ids => ids.map(m2).size == 1),
      "phase 2 split a phase-1 community")
    // triangles stay intact through both levels
    val t0 = Seq(1L, 2L, 3L).map(m2)
    assert(t0.toSet.size == 1, s"triangle split at level 2: $m2")
  }

  test("pageRank warm-start: resume(2) from a 3-round state == cold(5)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val warm = Graph.pageRank(e, 3)
      .select(col("id"), col("rank_scaled").as("r"))
    val resumed = Graph.pageRank(e, 2, init = Some(warm))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold = Graph.pageRank(e, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed == cold, "warm resume must equal the unrolled cold run")
    // a node absent from the init seeds at Scale: drop node 4's rank
    val partial = warm.filter(col("id") =!= 4L)
    val res2 = Graph.pageRank(e, 1, init = Some(partial))
    assert(res2.count() == 4L, "new nodes join the frame seeded at Scale")
  }

  test("landmarkDistances: min over common landmarks, NULL uncovered") {
    // path 1-2-3-4-5 plus disjoint pair 6-7; landmark = {3}, radius 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
      .toDF("src", "dst")
    val lm = Seq(3L).toDF("id")
    val pairs = Seq((1L, 5L), (2L, 4L), (1L, 2L), (1L, 6L)).toDF("u", "v")
    val out = Graph.landmarkDistances(edges, lm, pairs, maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out.size == 4)
    // shortest 1-5 path crosses the landmark: estimate is EXACT
    assert(out((1L, 5L)).getAs[Long]("est_dist") == 4L)
    assert(out((2L, 4L)).getAs[Long]("est_dist") == 2L)
    // adjacent pair: honest UPPER BOUND (d(1,3)+d(3,2) = 3, true 1)
    assert(out((1L, 2L)).getAs[Long]("est_dist") == 3L)
    assert(out((1L, 2L)).getAs[Long]("n_common") == 1L)
    // 6 is in the other component: no common landmark, NULL not a guess
    val r16 = out((1L, 6L))
    assert(r16.isNullAt(r16.fieldIndex("est_dist")))
    assert(r16.getAs[Long]("n_common") == 0L)
  }

  test("hyperAnf registers equal HLL over exact BFS balls") {
    import org.apache.spark.sql.functions.{count, expr, lit, sum}
    // path 1-2-3 feeding a triangle 4-5-6 through edge 3-4
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 4L))
    val e = und.toDF("src", "dst")
    val mirrored = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val anf = Graph.hyperAnf(mirrored, maxHops = 2, b = 6)
    // exact balls by hand BFS
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def ball(v: Long, h: Int): Set[Long] =
      if (h == 0) Set(v)
      else {
        val prev = ball(v, h - 1)
        prev ++ prev.flatMap(adj.getOrElse(_, Set.empty[Long]))
      }
    val pairs = for {
      v <- 1L to 6L; h <- 0 to 2; u <- ball(v, h.toInt)
    } yield (v, h.toLong, u)
    // the exact-membership HLL: same md5 recipe over the true ball sets
    val exact = Sketches
      .hllRegisters(pairs.toDF("id", "hop", "member"), "member",
        Seq("id", "hop"), b = 6)
      .groupBy("id", "hop")
      .agg(count(lit(1)).as("n_registers"),
        sum(expr("shiftleft(cast(1 as bigint), 55 - rho_max)")).as("present"))
      .withColumn("sum_scaled", col("present") +
        (lit(64L) - col("n_registers")) * lit(1L << 55))
      .select("hop", "id", "n_registers", "sum_scaled")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = anf.select("hop", "id", "n_registers", "sum_scaled")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == exact,
      s"ANF propagation diverged from exact-ball HLL:\n got=$got\n exp=$exact")
  }

  test("coreness: h-index iteration hits exact core numbers") {
    // triangle {1,2,3} with a tail 3-4-5: core numbers 2,2,2,1,1;
    // add a 4-clique {6,7,8,9} sharing node 3 via edge 3-6: clique
    // nodes are core 3, node 3 stays 2 (its triangle support)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (3L, 6L), (6L, 7L), (6L, 8L), (6L, 9L), (7L, 8L), (7L, 9L),
      (8L, 9L)).toDF("src", "dst")
    val got = Graph.coreness(edges, rounds = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L,
      6L -> 3L, 7L -> 3L, 8L -> 3L, 9L -> 3L), s"core numbers: $got")
    // one round is only an upper bound (degree-init not yet settled):
    // the tail's node 4 still reads its degree-capped h-index
    val ub = Graph.coreness(edges, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ub.forall { case (id, v) => v >= got(id) },
      "early rounds must stay an upper bound")
  }

  test("effectiveRadius: star center converges at hop 1, leaves at 2") {
    // 30-leaf star: the center's hop-1 ball IS the graph (eff 1); a
    // leaf's hop-1 ball is {self, center} — far outside 90% of its
    // hop-2 ball (the whole graph), so leaves read eff 2. Margins are
    // tens of 2^55 against a sum/10 threshold — register collisions
    // cannot flip them.
    val edges = (2L to 31L).map(i => (1L, i)).toDF("src", "dst")
    val mirrored = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val hist = Graph.effectiveRadius(mirrored, maxHops = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(1L -> 1L, 2L -> 30L), s"unexpected histogram: $hist")
  }

  test("diameterSweep finds the exact diameter of a path with a branch") {
    // path 1-2-3-4-5 plus branch 3-6: seed = min id = 1; farthest from
    // 1 is 5 at dist 4 (6 ties at... 6 is dist 3) → u = 5; from 5 the
    // farthest is 1 at dist 4 → diameter 4, v = 1, all 6 reached
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
      .toDF("src", "dst")
    val r = Graph.diameterSweep(e, maxHops = 4).collect()(0)
    assert(r.getAs[Long]("seed_id") == 1L)
    assert(r.getAs[Long]("u_id") == 5L)
    assert(r.getAs[Long]("v_id") == 1L)
    assert(r.getAs[Long]("diameter_lb") == 4L)
    assert(r.getAs[Long]("n_reached_u") == 6L)
    // hop budget certifies only a lower bound: budget 2 from the same
    // graph reports ecc 2 (the farthest it can SEE deterministically)
    val b = Graph.diameterSweep(e, maxHops = 2).collect()(0)
    assert(b.getAs[Long]("diameter_lb") == 2L)
  }

  test("betweenness: path graph puts all dependency on the middle") {
    import spark.implicits._
    // s — a — b from seed s: σ(a)=σ(b)=1, δ(b)=0,
    // δ(a) = floor(1·(1e6+0)/1) = 1e6; b filtered (zero betweenness)
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val r = Graph.betweenness(e, seeds, maxHops = 3).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("betweenness_e6"))
      .toMap
    assert(r == Map(2L -> 1000000L))
  }

  test("betweenness: diamond splits dependency across both middles") {
    import spark.implicits._
    // s—a—t and s—b—t: σ(t)=2, δ(a)=δ(b)=floor(1·1e6/2)=500000
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val r = Graph.betweenness(e, seeds, maxHops = 3).collect()
      .map(x => x.getAs[Long]("id") -> x.getAs[Long]("betweenness_e6"))
      .toMap
    assert(r == Map(2L -> 500000L, 3L -> 500000L))
  }

  test("betweenness sums dependencies across seeds, excludes endpoints") {
    import spark.implicits._
    // path 1—2—3 with seeds {1, 3}: node 2 earns 1e6 from each side
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L, 3L).toDF("id")
    val r = Graph.betweenness(e, seeds, maxHops = 3).collect()
      .map(x => x.getAs[Long]("id") ->
        (x.getAs[Long]("betweenness_e6"), x.getAs[Long]("n_sources")))
      .toMap
    // endpoints appear as dist>0 nodes of the OTHER seed with δ=0 and
    // are dropped by the positive filter; the middle carries both
    assert(r == Map(2L -> ((2000000L, 2L))))
  }

  test("independentCascade: p=0 reaches seeds only, p=1e6 is plain BFS") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val closed = Graph.independentCascade(e, seeds, pPpm = 0L,
      trials = 2, maxHops = 3).collect()
    assert(closed.forall(_.getAs[Long]("n_reached") == 1L))
    assert(closed.forall(_.getAs[Long]("n_active_edges") == 0L))
    val full = Graph.independentCascade(e, seeds, pPpm = 1000000L,
      trials = 2, maxHops = 3).collect()
    // hop-3 from 1 over 1→2→3→4; the 9→10 component is unreachable
    assert(full.forall(_.getAs[Long]("n_reached") == 4L))
    assert(full.forall(_.getAs[Long]("n_active_edges") == 4L))
    // intermediate p: trials are DIFFERENT deterministic subgraphs
    val mid = Graph.independentCascade(e, seeds, pPpm = 500000L,
      trials = 4, maxHops = 3).collect()
    assert(mid.length == 4)
    val again = Graph.independentCascade(e, seeds, pPpm = 500000L,
      trials = 4, maxHops = 3).collect()
    assert(mid.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "derandomized trials must replay exactly")
  }

  test("butterflyCensus: a 2×2 biclique is exactly one butterfly") {
    import spark.implicits._
    val e = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L))
      .toDF("src", "dst")
    val r = Graph.butterflyCensus(e).collect().head
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("n_wedges") == 2L)         // (10,20) via 1 and 2
    assert(r.getAs[Long]("n_cosupported_pairs") == 1L)
    assert(r.getAs[Long]("n_butterflies") == 1L)    // C(2,2... C(2,2)=1
    assert(r.getAs[Long]("coherence_ppm") == 2000000L) // 4·1/2 ppm
  }

  test("butterflyCensus: wedges without co-support yield zero") {
    import spark.implicits._
    // left 1 fans to three rights; no right pair shares TWO lefts
    val e = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L))
      .toDF("src", "dst")
    val r = Graph.butterflyCensus(e).collect().head
    assert(r.getAs[Long]("n_wedges") == 3L)
    assert(r.getAs[Long]("n_butterflies") == 0L)
    assert(r.getAs[Long]("coherence_ppm") == 0L)
  }

  test("articleRank damps the hub's per-target influence via avgdeg") {
    // hub 1 fans to 2..5 (outdeg 4); 6 -> 7 is a chain (outdeg 1);
    // avgdeg = (4 + 1) div 2 = 2, so divisors are 6 and 3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (6L, 7L))
      .toDF("src", "dst")
    val ar = Graph.articleRank(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fixed point from round 2 on (sources hold base rank 0.15S):
    // r(2..5) = 0.15S + 85*(0.15S div 6) div 100, r(7) uses div 3
    assert(ar(1L) == 150000000000L && ar(6L) == 150000000000L)
    assert(ar(2L) == 171250000000L && ar(5L) == 171250000000L)
    assert(ar(7L) == 192500000000L,
      "chain target must out-rank the hub's fanned targets")
    assert(ar(7L) > ar(2L))
  }

  test("eigenvectorCentrality normalizes the leader to 1e6 each round") {
    // undirected star 1-{2,3} (mirrored): odd rounds read (1e6, 5e5, 5e5)
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("src", "dst")
    val x = Graph.eigenvectorCentrality(e, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(x(1L) == 1000000L)
    assert(x(2L) == 500000L && x(3L) == 500000L)
  }

  test("kahnLayers assigns longest-path levels and leaves cycles NULL") {
    // diamond DAG 1->3, 2->3, 3->4, plus direct 1->4 (longest path wins)
    // and a 2-cycle 10<->11 that must stay unassigned
    val e = Seq((1L, 3L), (2L, 3L), (3L, 4L), (1L, 4L),
      (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val out = Graph.kahnLayers(e, 8).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) == Some(0L) && out(2L) == Some(0L))
    assert(out(3L) == Some(1L))
    assert(out(4L) == Some(2L), "layer is the LONGEST path, not the direct edge")
    assert(out(10L).isEmpty && out(11L).isEmpty, "cycle members stay NULL")
  }

  test("closenessCentrality applies the Wasserman-Faust component correction") {
    // path 1-2-3 plus isolated pair 4-5; seeds = all five nodes
    val e = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val c = Graph.closenessCentrality(e, seeds, 4).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // node 2: reaches seeds 1,3 at d=1 → r=2, Σd=2 → 1e6·4 div (5·2)
    assert(c(2L) == ((2L, 2L, 400000L)))
    // node 1: seeds 2 (d1), 3 (d2) → r=2, Σd=3 → 1e6·4 div 15
    assert(c(1L) == ((2L, 3L, 266666L)))
    // node 4: only seed 5 reaches it → r=1, Σd=1 → 1e6 div 5: the
    // small component cannot outscore the path's center
    assert(c(4L) == ((1L, 1L, 200000L)))
    assert(c(4L)._3 < c(2L)._3)
  }

  test("eigenvectorCentrality: a drained directed chain hits the zero-max guard") {
    // 1 -> 2 un-mirrored: round 1 leaves x(1)=0; round 2 max(y)=0
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val x = Graph.eigenvectorCentrality(e, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(x(1L) == 0L && x(2L) == 0L)
  }
}
