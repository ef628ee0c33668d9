package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardsSpec extends SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("sharded export preserves rows; manifest verifies clean") {
    val path = Files.createTempDirectory("graft_shards").toString
    val m = Shards.write(docs, path, "doc_id", "text", 4)
    val counts = m.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0L, 1L, 2L, 3L))
    assert(counts.values.sum == docs.count())
    // round-trip: every row lands in its assigned shard
    val back = spark.read.parquet(path)
    assert(back.count() == docs.count())
    val misplaced = Shards.assign(back.drop("shard"), "doc_id", 4)
      .as("recomputed")
      .join(back.select(col("doc_id"), col("shard").as("stored")), "doc_id")
      .filter(col("shard") =!= col("stored")).count()
    assert(misplaced == 0, "assignment must be recomputable from content")
    assert(Shards.verify(spark, path, "doc_id", "text", 4).isEmpty)
  }

  test("range shards are value-contiguous, balanced, and round-trip") {
    val vals = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"))
    val nShards = 8
    val bs = Shards.rangeBoundaries(vals, "n_chars", "doc_id", nShards)
    assert(bs.length == nShards - 1 && bs == bs.sorted,
      s"boundaries must be sorted: $bs")
    val path = Files.createTempDirectory("graft_range").toString
    val m = Shards.writeRange(vals, path, "n_chars", "doc_id", nShards)
    val rows = m.collect().sortBy(_.getLong(0))
    // total preserved; every shard's observed zone sits inside its slice
    assert(rows.map(_.getAs[Long]("n_rows")).sum == vals.count())
    rows.foreach { r =>
      val (lo, hi) = (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))
      val (mn, mx) = (r.getAs[Long]("min_v"), r.getAs[Long]("max_v"))
      lo.foreach(b => assert(mn >= b, s"shard ${r.getLong(0)}: min $mn < lo $b"))
      hi.foreach(b => assert(mx < b, s"shard ${r.getLong(0)}: max $mx >= hi $b"))
    }
    // contiguity: zone maps of consecutive shards never overlap
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_v") <= b.getAs[Long]("min_v"),
          "consecutive shard zones overlap")
      case _ => ()
    }
    // sketch balance: no shard holds more than 3x its fair share
    val fair = vals.count().toDouble / nShards
    assert(rows.map(_.getAs[Long]("n_rows")).max <= 3 * fair,
      "a range shard is pathologically unbalanced")
    // round-trip: the written layout reproduces the manifest counts
    val back = spark.read.parquet(path)
      .groupBy("shard").count().collect()
      .map(r => r.getAs[Number]("shard").longValue() -> r.getLong(1)).toMap
    assert(back == rows.map(r => r.getLong(0) -> r.getAs[Long]("n_rows")).toMap)
  }

  test("verify flags a damaged shard") {
    val path = Files.createTempDirectory("graft_shards_dmg").toString
    Shards.write(docs, path, "doc_id", "text", 4)
    // drop one shard directory entirely
    val dir = new java.io.File(s"$path/shard=2")
    dir.listFiles().foreach(_.delete())
    dir.delete()
    val bad = Shards.verify(spark, path, "doc_id", "text", 4).collect()
    assert(bad.map(_.getAs[Long]("shard")).toSeq == Seq(2L))
    assert(bad.head.isNullAt(bad.head.fieldIndex("actual_rows")))
  }

  test("delta finds only unexported keys; merged manifest == full recompute") {
    val first = docs.filter(col("doc_id") % 3 =!= 0)
    val d = Shards.delta(docs, "doc_id", first.select(col("doc_id")))
    assert(d.collect().map(_.getAs[Long]("doc_id")).forall(_ % 3 == 0))
    assert(d.count() == docs.filter(col("doc_id") % 3 === 0).count())
    val merged = Shards.mergeManifests(
      Shards.manifest(first, "doc_id", "text", 8),
      Shards.manifest(d, "doc_id", "text", 8))
      .collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_bytes"),
          r.getAs[Long]("checksum"))).toMap
    val full = Shards.manifest(docs, "doc_id", "text", 8)
      .collect().map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_bytes"),
          r.getAs[Long]("checksum"))).toMap
    assert(merged == full)
  }

  test("assignment is growth-stable: adding rows never moves old rows") {
    val half = docs.filter(col("doc_id") < 75)
    val a1 = Shards.assign(half, "doc_id", 8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    val a2 = Shards.assign(docs, "doc_id", 8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    assert(a1.forall { case (id, s) => a2(id) == s })
  }

  test("rendezvousShard matches a brute-force MessageDigest argmin") {
    val got = docs.limit(50)
      .select(col("doc_id"), Shards.rendezvousShard("doc_id", 5).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    got.foreach { case (id, s) =>
      val want = (0 until 5).minBy(k => hex(s"$id:$k"))
      assert(s == want.toLong, s"doc $id")
    }
  }

  test("shuffled export replays one global md5 permutation on read-back") {
    val path = Files.createTempDirectory("graft_shuf").toString
    val m = Shards.writeShuffled(docs, path, "doc_id", "text", "t13", 8)
      .orderBy("shard").collect()
    assert(m.map(_.getAs[Long]("n_rows")).sum == docs.count())
    // manifest offsets are consistent running sums
    m.foldLeft(0L) { (acc, r) =>
      assert(r.getAs[Long]("global_offset") == acc)
      acc + r.getAs[Long]("n_rows")
    }
    // read shards in shard order, each sorted by (h, doc_id): the
    // concatenated doc_id stream must equal the global md5 total order
    val got = (0 until 8).flatMap { s =>
      val dir = new java.io.File(s"$path/shard=$s")
      if (!dir.exists()) Seq.empty
      else spark.read.parquet(dir.toString)
        .orderBy("h", "doc_id") // parquet re-read loses row order; the
                                // FILE was written sorted — order here
                                // stands in for a sequential reader
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    }
    val want = docs
      .select(col("doc_id"), Shards.shuffleHashCol("doc_id", "t13").as("h"))
      .orderBy("h", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == want, "shard-order read-back must be the global shuffle")
    // same salt → same permutation; different salt → different one
    val again = Shards.shuffleManifest(docs, "doc_id", "text", "t13", 8)
      .orderBy("shard").collect().map(_.toSeq)
    assert(again.toSeq == m.map(_.toSeq).toSeq)
    val other = Shards.shuffleManifest(docs, "doc_id", "text", "other", 8)
      .orderBy("shard").collect().map(_.getAs[Long]("first_key")).toSeq
    assert(other != m.map(_.getAs[Long]("first_key")).toSeq)
  }

  test("rebalancePlan 8→9 moves rows ONLY onto the new shard") {
    val plan = Shards.rebalancePlan(docs, "doc_id", 8, 9).collect()
    val total = plan.map(_.getAs[Long]("n_rows")).sum
    assert(total == docs.count())
    plan.filter(_.getAs[Boolean]("moved")).foreach { r =>
      assert(r.getAs[Long]("new_shard") == 8L,
        "a rendezvous grow step may only populate the added shard")
    }
    val movedShare = plan.filter(_.getAs[Boolean]("moved"))
      .map(_.getAs[Long]("n_rows")).sum.toDouble / total
    // expected 1/9 of the corpus; generous band for a 150-doc sample
    assert(movedShare > 0.01 && movedShare < 0.4)
  }
}
