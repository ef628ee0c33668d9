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
}
