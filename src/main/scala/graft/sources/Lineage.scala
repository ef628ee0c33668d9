package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level lineage stamping: every ingested row carries WHERE it came
  * from and WHICH run brought it in — the audit columns that let a 100 TB
  * lake answer "which snapshot produced this record?" without a separate
  * bookkeeping table (the reference keeps this in orchestrator state
  * files; stamping rows makes it queryable with the data). Both columns
  * are metadata-only: `input_file_name` resolves inside the scan
  * (no shuffle, no IO) and the batch tag is a literal.
  */
object Lineage {

  /** Add `src_file` (the exact input file of each row) and `batch_id`
    * (the caller's run identifier — pass a stable id, not a timestamp,
    * so re-runs are idempotent).
    */
  def stamp(df: DataFrame, batchId: String): DataFrame =
    df.withColumn("src_file", input_file_name())
      .withColumn("batch_id", lit(batchId))
}
