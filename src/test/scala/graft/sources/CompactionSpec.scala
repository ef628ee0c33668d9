package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction merges a fragmented directory without losing rows") {
    val dir = Files.createTempDirectory("graft-frag").toString
    val out = Files.createTempDirectory("graft-compact").toString
    (1L to 1000L).map(i => (i, s"row$i")).toDF("id", "v")
      .repartition(20).write.mode("overwrite").parquet(dir)

    val before = Compaction.plan(spark, dir, targetBytes = 1L << 30)
    assert(before.nFiles == 20L)
    assert(before.targetPartitions == 1)
    assert(before.worthCompacting)

    val after = Compaction.compact(spark, dir, out, targetBytes = 1L << 30,
      sortCol = Some("id"))
    assert(after.nFiles == 1L)
    assert(spark.read.parquet(out).count() == 1000L)
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted
      .sameElements(1L to 1000L))
    // already-compact output is left alone by the threshold guard
    assert(Compaction.compactIfWorthwhile(spark, out,
      out + "-again", targetBytes = 1L << 30).isEmpty)
  }

  test("packingPlan packs order-preserving bins near the target size") {
    import spark.implicits._
    val files = Seq(("a", 60L), ("b", 60L), ("c", 60L), ("d", 60L),
      ("e", 60L)).toDF("file", "bytes")
    val out = Compaction.packingPlan(files, "file", "bytes", 100L)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    // cum-before 0,60,120,180,240 -> bins 0,0,1,1,2; order preserved
    assert(out.toSeq == Seq((0L, 2L, 120L, "a", "b"),
      (1L, 2L, 120L, "c", "d"), (2L, 1L, 60L, "e", "e")))
  }
}
