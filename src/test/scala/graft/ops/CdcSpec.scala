package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {

  private def snaps() = {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("id", "p", "v")
    val newSnap = Seq(
      (2L, "b", 20.0),   // unchanged
      (3L, "C", 30.0),   // p changed
      (4L, "d", 41.0),   // v changed
      (5L, "e", 50.0)    // inserted
    ).toDF("id", "p", "v")
    (oldSnap, newSnap)
  }

  test("snapshotDiff classifies insert/delete/update and drops unchanged") {
    val (oldSnap, newSnap) = snaps()
    val diff = Cdc.snapshotDiff(oldSnap, newSnap, "id", Seq("p", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(diff === Map(1L -> "delete", 3L -> "update", 4L -> "update",
      5L -> "insert"))
  }

  test("applyChanges over the diff reproduces the new snapshot") {
    val (oldSnap, newSnap) = snaps()
    val diff = Cdc.snapshotDiff(oldSnap, newSnap, "id", Seq("p", "v"))
    val changes = diff.join(newSnap, Seq("id"), "left")
      .withColumn("op", when(col("change_type") === "delete", lit("delete"))
        .otherwise(lit("upsert")))
      .drop("change_type")
    val applied = Cdc.applyChanges(oldSnap, changes, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = newSnap.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(applied.toSeq === expected.toSeq)
  }

  test("diff of identical snapshots is empty") {
    val (oldSnap, _) = snaps()
    assert(Cdc.snapshotDiff(oldSnap, oldSnap, "id", Seq("p", "v")).isEmpty)
  }

  test("scd2 collapses unchanged runs into versioned validity intervals") {
    import spark.implicits._
    val log = Seq(
      ("a", "x", 1L, 1L), ("a", "x", 2L, 2L), ("a", "y", 3L, 3L),
      ("a", "x", 5L, 5L), // back to x: a NEW version, not merged with v1
      ("b", "z", 10L, 10L)
    ).toDF("k", "attr", "seq", "tie")
    val got = Cdc.scd2(log, "k", "attr", "seq", "tie")
      .orderBy("k", "version").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4),
        r.getBoolean(5)))
    assert(got.toSeq == Seq(
      ("a", "x", 1L, Some(3L), 1L, false),
      ("a", "y", 3L, Some(5L), 2L, false),
      ("a", "x", 5L, None, 3L, true),
      ("b", "z", 10L, None, 1L, true)))
  }

  test("scd2 with a constant attribute yields one current version per key") {
    import spark.implicits._
    val log = (1 to 9).map(i => ("k" + (i % 3), "same", i.toLong, i.toLong))
      .toDF("k", "attr", "seq", "tie")
    val got = Cdc.scd2(log, "k", "attr", "seq", "tie").collect()
    assert(got.length == 3)
    assert(got.forall(_.getBoolean(5)))
  }

  test("maintainAggregate == recompute; groups die at zero and are born") {
    import spark.implicits._
    val agg0 = Seq(("a", 2L, 30L), ("b", 1L, 5L)).toDF("grp", "n", "total")
    val changes = Seq(
      ("a", "delete", 10L), ("a", "insert", 7L),   // update: 30-10+7
      ("b", "delete", 5L),                          // group dies
      ("c", "insert", 4L), ("c", "insert", 6L)      // group born
    ).toDF("grp", "op", "v")
    val out = Cdc.maintainAggregate(agg0, changes).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map("a" -> ((2L, 27L)), "c" -> ((2L, 10L))))
  }

  test("maintainJoin: delta rule equals the recomputed join exactly") {
    import spark.implicits._
    val a0 = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val dA = Seq((3L, "a3")).toDF("k", "av")
    val b0 = Seq((1L, "b1"), (3L, "b3")).toDF("k", "bv")
    val dB = Seq((2L, "b2"), (3L, "b3x")).toDF("k", "bv")
    val maintained = Cdc.maintainJoin(a0.join(b0, "k"), a0, b0, dA, dB, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val recomputed = a0.unionByName(dA).join(b0.unionByName(dB), "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(maintained.sorted.toSeq == recomputed.sorted.toSeq)
    // the delta touched every quadrant: dA⋈b0 (3,b3), a0⋈dB (2,b2),
    // dA⋈dB (3,b3x) — all present exactly once
    assert(maintained.count(_ == ((3L, "a3", "b3"))) == 1)
    assert(maintained.count(_ == ((2L, "a2", "b2"))) == 1)
    assert(maintained.count(_ == ((3L, "a3", "b3x"))) == 1)
  }

  test("bitemporalAsOf: corrections visible only after their sys time") {
    import spark.implicits._
    // key 1: fact (valid 10, learned 10, v 100), RESTATED at sys 20 to
    // 110, and a later fact (valid 30, learned 30, v 200)
    val log = Seq((1L, 10L, 10L, 100L), (1L, 10L, 20L, 110L),
      (1L, 30L, 30L, 200L)).toDF("key", "valid_from", "sys_from", "value")
    def at(v: Long, s: Long) =
      Cdc.bitemporalAsOf(log, "key", v, s).collect().head.getAs[Long]("value")
    assert(at(15L, 15L) == 100L, "before the restatement we believed 100")
    assert(at(15L, 25L) == 110L, "after sys 20 the correction wins")
    assert(at(40L, 40L) == 200L, "later valid time elects the later fact")
    assert(at(15L, 40L) == 110L,
      "valid-time filter keeps the v=30 fact out of a V=15 read")
  }

  test("changedPartitions names added/removed/changed/unchanged exactly") {
    import spark.implicits._
    // partitions: 0 unchanged, 1 value-changed, 2 removed, 3 added,
    // 4 same (n, sum-aliasing swap caught by... here a real change)
    val olds = Seq((0L, 1L, 10L), (0L, 2L, 20L),
      (1L, 1L, 10L), (2L, 1L, 10L)).toDF("p", "id", "v")
    val news = Seq((0L, 1L, 10L), (0L, 2L, 20L),
      (1L, 1L, 11L), (3L, 1L, 10L)).toDF("p", "id", "v")
    val cols = Seq("id", "v")
    val out = Cdc.changedPartitions(
      Cdc.partitionChecksums(olds, "p", cols),
      Cdc.partitionChecksums(news, "p", cols)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(0L -> "unchanged", 1L -> "changed",
      2L -> "removed", 3L -> "added"))
  }

  test("lwwAudit flags same-instant divergent writers, ties to max value") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, 5L), (1L, 20L, 7L),            // clean key
      (2L, 10L, 5L), (2L, 10L, 9L), (2L, 5L, 1L), // conflict AT t=10
      (3L, 10L, 5L), (3L, 10L, 5L))             // same value twice: clean
      .toDF("k", "t", "v")
    val r = Cdc.lwwAudit(log, "k", "t", "v").collect()
      .map(x => x.getAs[Long]("k") ->
        (x.getAs[Long]("n_instants"), x.getAs[Long]("n_conflict_instants"),
          x.getAs[Long]("lww_value"), x.getAs[Boolean]("is_clean"))).toMap
    assert(r(1L) == ((2L, 0L, 7L, true)))
    // conflict instant is the LATEST one: LWW resolves to max value 9
    assert(r(2L) == ((2L, 1L, 9L, false)))
    assert(r(3L) == ((1L, 0L, 5L, true)),
      "identical duplicate writes are not a conflict")
  }
}
