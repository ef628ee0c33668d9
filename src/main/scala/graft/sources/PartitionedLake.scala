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
}
