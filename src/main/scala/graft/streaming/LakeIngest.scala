package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Incremental file-source ingestion: treat a growing parquet directory
  * (the reference's `data/{customer}/{timestamp}` drop zone, or any
  * landing path) as an unbounded stream. Structured Streaming's file
  * source tracks processed files in the checkpoint log, so every file is
  * ingested exactly once across restarts — the snapshot watcher's
  * "which files are new?" bookkeeping (orchestrator.py:216-287) for
  * free, at executor parallelism instead of a driver loop.
  */
object LakeIngest {

  /** Open `path` as a file-source stream. `maxFilesPerTrigger` bounds
    * each micro-batch so one giant backlog drop cannot produce an
    * unbounded batch — the knob that keeps recovery after downtime
    * incremental. The schema is explicit: a streaming source must not
    * pay a listing+footer inference pass per restart, and inference is
    * disabled for file streams by default anyway.
    */
  def stream(spark: SparkSession, path: String, schema: StructType,
             maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
}
