package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table once at write time so
  * every later equi-join on the bucket key is co-located and shuffle-free.
  * At 100 TB this converts the recurring per-query shuffle of the largest
  * table into a one-time layout cost — the standard warehouse pattern for
  * repeatedly-joined fact tables.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. Multiple keys
    * bucket on the tuple — an equi-join must then cover ALL of them for
    * the bucketed scan to satisfy the join's required partitioning.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, moreKeys: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .saveAsTable(table)

  /** Join two identically-bucketed tables on their bucket key. With both
    * sides bucketed on `key` into the same bucket count, Catalyst plans a
    * SortMergeJoin with zero Exchange operators.
    */
  def bucketJoin(spark: SparkSession, left: String, right: String,
                 key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
