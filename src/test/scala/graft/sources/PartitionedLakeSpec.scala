package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PartitionedLakeSpec extends SparkSpec {
  import spark.implicits._

  private val us = 86400000000L // one day in microseconds

  test("writeDaily lays out day= directories; readDays prunes partitions") {
    val dir = Files.createTempDirectory("lake").toFile.getAbsolutePath
    val ev = Seq(
      (1L, 0L * us + 5L, 1.0), (2L, 1L * us + 5L, 2.0),
      (3L, 2L * us + 5L, 3.0), (4L, 3L * us + 5L, 4.0)
    ).toDF("event_id", "ts", "value")
    PartitionedLake.writeDaily(ev, dir)
    val days = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("day=")).map(_.getName).sorted
    assert(days.toSeq == Seq("day=0", "day=1", "day=2", "day=3"))

    val read = PartitionedLake.readDays(spark, dir, 1L, 2L)
    assert(read.select("event_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(2L, 3L))
    // the bound must prune the LISTING (PartitionFilters), not merely
    // the row scan (PushedFilters)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    assert(plan.replaceAll("\\s", "").contains("day#") &&
      plan.contains(">= 1") && plan.contains("<= 2"), plan.take(800))
  }

  test("expireDays drops only partitions beyond the retention window") {
    val dir = Files.createTempDirectory("lake3").toFile.getAbsolutePath
    val ev = Seq(
      (1L, 0L * us, 1.0), (2L, 1L * us, 2.0),
      (3L, 2L * us, 3.0), (4L, 3L * us, 4.0)
    ).toDF("event_id", "ts", "value")
    PartitionedLake.writeDaily(ev, dir)
    val dropped = PartitionedLake.expireDays(spark, dir, keepDays = 2)
    assert(dropped == Seq(0L, 1L))
    val days = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("day=")).map(_.getName).sorted
    assert(days.toSeq == Seq("day=2", "day=3"))
  }

  test("readEvolved unifies additive schema drift across days") {
    val dir = Files.createTempDirectory("lake4").toFile.getAbsolutePath
    Seq((1L, 0L * us, 1.0)).toDF("event_id", "ts", "value")
      .write.parquet(s"$dir/day=0")
    // day 1 gained a column
    Seq((2L, 1L * us, 2.0, "mobile")).toDF("event_id", "ts", "value", "device")
      .write.parquet(s"$dir/day=1")
    val out = PartitionedLake.readEvolved(spark, dir)
      .select("event_id", "device").orderBy("event_id").collect()
    assert(out.map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ==
      Seq((1L, None), (2L, Some("mobile"))))
  }

  test("dynamic overwrite replaces only the re-written day") {
    val dir = Files.createTempDirectory("lake2").toFile.getAbsolutePath
    val v1 = Seq((1L, 0L * us, 1.0), (2L, 1L * us, 2.0))
      .toDF("event_id", "ts", "value")
    PartitionedLake.writeDaily(v1, dir)
    // backfill day 1 only; day 0 must survive
    val v2 = Seq((9L, 1L * us, 9.0)).toDF("event_id", "ts", "value")
    PartitionedLake.writeDaily(v2, dir)
    val ids = spark.read.parquet(dir).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 9L))
  }
}
