package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  // 3 parts × 10 disjoint keys each — the clustered point-lookup layout
  private def corpus = (0L until 30L).map(i => (i, i / 10L))
    .toDF("key", "part")

  test("build emits deterministic in-range bits, deduped per part") {
    val idx = BloomIndex.build(corpus, "part", "key", m = 256, k = 3)
    val rows = idx.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.distinct.length)
    assert(rows.forall { case (_, bit) => bit >= 0L && bit < 256L })
    // ≤ k·keys bits per part, > 0
    rows.groupBy(_._1).foreach { case (_, bs) =>
      assert(bs.nonEmpty && bs.length <= 30)
    }
    val again = BloomIndex.build(corpus, "part", "key", m = 256, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.sorted.sameElements(rows.sorted))
  }

  test("audit never misses the containing part and prunes absent keys") {
    val idx = BloomIndex.build(corpus, "part", "key", m = 16384, k = 3)
    val probes = Seq(5L, 15L, 25L, 777L).toDF("probe")
    val out = BloomIndex.audit(idx, probes, m = 16384, k = 3)
      .collect()
      .map(r => r.getAs[Long]("probe") ->
        (r.getAs[Long]("parts_scanned"), r.getAs[Long]("parts_total")))
      .toMap
    assert(out.keySet == Set(5L, 15L, 25L, 777L))
    assert(out.values.forall(_._2 == 3L))
    // no false negatives: every present key's filter claims >= 1 part
    Seq(5L, 15L, 25L).foreach { p =>
      assert(out(p)._1 >= 1L, s"present key $p must be claimed")
    }
    // at 3 salted hashes over m=16384 with 10 keys/part the fp odds are
    // ~1e-8 per part — the absent key scans nothing (deterministic)
    assert(out(777L)._1 == 0L, "absent key must prune every part")
  }
}
