package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class LakeIngestSpec extends SparkSpec {
  import spark.implicits._

  test("file-source stream ingests each arriving file exactly once") {
    val lake = Files.createTempDirectory("ingest").toFile.getAbsolutePath
    val out = Files.createTempDirectory("ingest-out").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("ingest-ckpt").toFile.getAbsolutePath
    val schema = Seq((1L, 1.0)).toDF("event_id", "value").schema

    // landing zone -> file sink: the source's checkpointed file log gives
    // ingest-once across restarts; the sink's _spark_metadata log makes
    // the output exactly-once too (a killed batch never double-lands)
    def runOnce(): Unit = {
      val q = LakeIngest.stream(spark, lake, schema)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    Seq((1L, 1.0), (2L, 2.0)).toDF("event_id", "value")
      .write.mode("append").parquet(lake)
    runOnce()
    assert(spark.read.parquet(out).count() == 2)

    // a second drop lands; a restarted stream on the SAME checkpoint
    // must pick up only the new files
    Seq((3L, 3.0)).toDF("event_id", "value")
      .write.mode("append").parquet(lake)
    runOnce()
    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), "each file ingested exactly once")
  }
}
