package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned lake layout: the standard `day=N` directory scheme
  * that turns time-bounded queries into directory pruning. Writing 100 TB
  * once costs the same either way; every incremental reader afterwards
  * touches only the partitions its predicate names — the listing itself
  * shrinks, before a single parquet footer is opened. Combine with
  * [[ZOrder.clusterByZ]] inside each partition for two-level skipping
  * (partition dir → row-group stats), and [[Compaction]] when streaming
  * writers fragment a day.
  */
object PartitionedLake {

  /** Write `df` partitioned by the integer epoch-day of its
    * microsecond-long `tsCol`. Dynamic partition overwrite replaces only
    * the days present in `df` — the idempotent re-run semantics an
    * orchestrated backfill needs (re-loading one late day must not wipe
    * the rest of the lake).
    */
  def writeDaily(df: DataFrame, path: String, tsCol: String = "ts"): Unit =
    df.withColumn("day", expr(s"$tsCol div 86400000000"))
      .write
      .partitionBy("day")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)

  /** Read a closed day range. The `between` lands in the plan's
    * PartitionFilters (not PushedFilters): Spark prunes the directory
    * listing itself, so unmatched days cost zero IO and zero tasks.
    */
  def readDays(spark: SparkSession, path: String,
               fromDay: Long, toDay: Long): DataFrame =
    spark.read.parquet(path).filter(col("day").between(fromDay, toDay))

  /** Retention: drop `day=` partitions older than `keepDays` behind the
    * newest one — directory deletes from the listing only, no data scan
    * (the lake-level twin of the orchestrator's keep-newest-2 database
    * cleanup). Returns the dropped day numbers.
    */
  def expireDays(spark: SparkSession, path: String, keepDays: Int): Seq[Long] = {
    require(keepDays >= 1)
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Seq.empty
    // numeric-only match: null-partition dirs (day=__HIVE_DEFAULT_PARTITION__)
    // and other non-numeric names are skipped, not crashed on
    val days = fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("day=-?\\d+"))
      .map(s => (s.getPath.getName.stripPrefix("day=").toLong, s.getPath))
      .sortBy(_._1)
    days.map(_._1).maxOption match {
      case None => Seq.empty
      case Some(newest) =>
        val cutoff = newest - keepDays + 1
        days.filter(_._1 < cutoff).map { case (d, p) =>
          fs.delete(p, true); d
        }
    }
  }

  /** Read with schema merging across partitions: additive drift (a day
    * that gained a column) unifies to the superset schema with nulls for
    * the missing days — the read-side counterpart of
    * [[SchemaCheck.diff]]'s "additive is compatible" rule. Merging pays a
    * footer pass per file, so it is the explicit slow path; steady-state
    * readers use the plain `readDays`.
    */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
