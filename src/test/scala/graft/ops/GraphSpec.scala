package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("degreeStats counts directions and totals, including pure sinks/sources") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val rows = Graph.degreeStats(edges).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 2L, 0L, 2L), (2L, 1L, 1L, 2L), (3L, 0L, 2L, 2L)))
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
}
