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
}
