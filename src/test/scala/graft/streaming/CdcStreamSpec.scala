package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class CdcStreamSpec extends SparkSpec {

  test("streaming merge folds change batches into a generation-swapped table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, String, Long)]
    val dir = Files.createTempDirectory("cdctab").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("cdctab-ckpt").toFile.getAbsolutePath
    val q = CdcStream.applyStream(
      mem.toDF.toDF("k", "v", "op", "seq"), dir, "k", "seq")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((1L, "a", "upsert", 1L), (2L, "b", "upsert", 2L))
      q.processAllAvailable()
      val t1 = CdcStream.currentTable(spark, dir).get.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(t1 == Set((1L, "a"), (2L, "b")))

      // update 1, delete 2, insert 3 twice (later seq must win)
      mem.addData((1L, "a2", "upsert", 3L), (2L, "", "delete", 4L),
        (3L, "c", "upsert", 5L), (3L, "c2", "upsert", 6L))
      q.processAllAvailable()
      val t2 = CdcStream.currentTable(spark, dir).get.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(t2 == Set((1L, "a2"), (3L, "c2")))

      // generation dirs pruned to the newest two (reader + fallback)
      val gens = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("gen=")).map(_.getName)
      assert(gens.length <= 2, gens.mkString(","))
    } finally q.stop()
  }

  test("half-written generations are invisible to readers and reclaimed") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, String, Long)]
    val dir = Files.createTempDirectory("cdcpart").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("cdcpart-ckpt").toFile.getAbsolutePath
    val q = CdcStream.applyStream(
      mem.toDF.toDF("k", "v", "op", "seq"), dir, "k", "seq")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((1L, "a", "upsert", 1L))
      q.processAllAvailable()

      // simulate a crash mid-write of the NEXT generation: parquet data
      // present, no _SUCCESS marker
      val partial = new java.io.File(dir, "gen=99")
      Seq((1L, "CORRUPT")).toDF("k", "v").write
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(partial.getAbsolutePath)
      assert(!new java.io.File(partial, "_SUCCESS").exists())

      // readers never observe the partial generation as current
      val cur = CdcStream.currentTable(spark, dir).get.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(cur == Set((1L, "a")), s"partial gen leaked into reads: $cur")

      // the next batch reclaims the partial dir and merges off the last
      // COMPLETE generation
      mem.addData((2L, "b", "upsert", 2L))
      q.processAllAvailable()
      assert(!partial.exists(), "crashed partial generation not reclaimed")
      val t = CdcStream.currentTable(spark, dir).get.collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(t == Set((1L, "a"), (2L, "b")))
    } finally q.stop()
  }
}
