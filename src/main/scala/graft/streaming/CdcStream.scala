package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.hadoop.fs.Path

import graft.ops.Cdc

/** Streaming CDC table maintenance — the blue/green pattern applied at
  * table granularity. A change stream (`op` = upsert | delete, plus a
  * monotonic sequence column) folds into a keyed parquet table via
  * `foreachBatch`: each micro-batch collapses to its latest change per
  * key, merges against the CURRENT generation with [[Cdc.applyChanges]],
  * writes the result as a NEW `gen=N+1` directory, and prunes to the
  * newest two generations — readers never observe a half-written table
  * (they read the previous generation until the new one is complete),
  * and the keep-2 window mirrors the reference orchestrator's database
  * cleanup (orchestrator.py keep-newest-2).
  *
  * Scale shape: the merge is applyChanges' two keyed shuffles; the batch
  * side is micro-batch-sized. Rewriting the base each batch is the
  * format's cost — swap the generation writer for a MERGE INTO on a
  * table format with deletion vectors when one is available; the stream
  * topology is unchanged.
  */
object CdcStream {

  /** Generation directories carrying Spark's `_SUCCESS` commit marker,
    * ascending. A gen dir without the marker is a crashed half-write: it
    * must never be picked as a merge base or served to a reader (the
    * reader-never-sees-partial guarantee), so it is invisible here and
    * reclaimed by [[applyStream]]'s next batch.
    */
  private def generations(spark: SparkSession, path: String): Seq[(Int, Path)] = {
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("gen=\\d+") &&
        fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(s => (s.getPath.getName.stripPrefix("gen=").toInt, s.getPath))
      .sortBy(_._1)
  }

  /** Delete crashed half-written generation dirs (no `_SUCCESS`) so a
    * stale partial can never shadow a later complete write of the same
    * generation number.
    */
  private def reclaimPartials(spark: SparkSession, path: String): Unit = {
    val base = new Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base))
      fs.listStatus(base).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.matches("gen=\\d+") &&
          !fs.exists(new Path(s.getPath, "_SUCCESS")))
        .foreach(s => fs.delete(s.getPath, true))
  }

  /** The table's current (newest complete) generation, or None before the
    * first batch lands. */
  def currentTable(spark: SparkSession, path: String): Option[DataFrame] =
    generations(spark, path).lastOption
      .map { case (_, p) => spark.read.parquet(p.toString) }

  /** Wire `changes` into a generation-swapping merge sink. Caller sets
    * the checkpoint and starts the query. `changes` must carry `key`,
    * the value columns, an `op` column (`upsert` | `delete`), and
    * `seqCol` ordering concurrent changes to one key.
    */
  def applyStream(changes: DataFrame, path: String, key: String,
                  seqCol: String): DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.expressions.Window
        // collapse the batch to its last change per key
        val latest = batch
          .withColumn("_rn", row_number().over(
            Window.partitionBy(key).orderBy(desc(seqCol), desc("op"))))
          .filter(col("_rn") === 1).drop("_rn", seqCol)
        // a crash between parquet write and commit leaves a marker-less
        // gen dir — reclaim it before choosing the merge base
        reclaimPartials(spark, path)
        val gens = generations(spark, path)
        val next = gens.lastOption match {
          case Some((_, p)) =>
            Cdc.applyChanges(spark.read.parquet(p.toString), latest, key)
          case None =>
            latest.filter(col("op") === "upsert").drop("op")
        }
        val nextNo = gens.lastOption.map(_._1 + 1).getOrElse(0)
        next.write.mode("overwrite").parquet(s"$path/gen=$nextNo")
        // keep-newest-2: the just-written generation and its predecessor
        val fs = new Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        generations(spark, path).dropRight(2)
          .foreach { case (_, p) => fs.delete(p, true) }
    }
}
