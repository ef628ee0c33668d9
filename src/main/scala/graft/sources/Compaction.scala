package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the operational chore every snapshot-based
  * pipeline accumulates (the reference's fragment directories,
  * neo4j_pq.py:109-134, are exactly the layout that degenerates into
  * thousands of tiny parquet files after many incremental drops). Tiny
  * files tax every later scan: one task + one footer read each, and at
  * 100 TB the NameNode/listing cost alone dominates.
  *
  * The rewrite is a single distributed pass: read → coalesce to
  * ceil(bytes / targetBytes) partitions → write. `coalesce` (not
  * `repartition`) so the read tasks feed writers without a shuffle —
  * compaction moves bytes once. Optionally sort-within-partitions on a
  * clustering column so rewritten row groups carry tight min/max stats
  * for data skipping.
  */
object Compaction {

  final case class Plan(nFiles: Long, totalBytes: Long, targetPartitions: Int) {
    def worthCompacting: Boolean = nFiles > targetPartitions * 2L
  }

  /** Inspect a parquet directory and size the compaction. Listing only —
    * no data read.
    */
  def plan(spark: SparkSession, dir: String,
           targetBytes: Long = 128L * 1024 * 1024): Plan = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    Plan(files.length.toLong, bytes,
      math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt)
  }

  /** Rewrite `dir` into `outDir` at the planned partition count,
    * optionally clustered by `sortCol` for row-group skipping. Returns
    * the compacted frame's plan for inspection.
    */
  def compact(spark: SparkSession, dir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              sortCol: Option[String] = None): Plan = {
    val p = plan(spark, dir, targetBytes)
    val df = spark.read.parquet(dir).coalesce(p.targetPartitions)
    val clustered = sortCol.fold(df)(c => df.sortWithinPartitions(c))
    clustered.write.mode("overwrite").parquet(outDir)
    plan(spark, outDir, targetBytes)
  }

  /** Convenience: compact only when fragmentation crosses the threshold
    * (idempotent housekeeping for a watcher loop).
    */
  def compactIfWorthwhile(spark: SparkSession, dir: String, outDir: String,
                          targetBytes: Long = 128L * 1024 * 1024): Option[Plan] = {
    val p = plan(spark, dir, targetBytes)
    if (p.worthCompacting) Some(compact(spark, dir, outDir, targetBytes))
    else None
  }

  private[graft] def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** File-level compaction PLAN as data — the OPTIMIZE planning step
    * when the file list itself is a table (a lake manifest): pack
    * files into target-size output groups with ORDER-PRESERVING
    * cumulative packing, `bin = floor(cum_bytes_before / target)` —
    * the deterministic SQL-able packing a rewrite that must preserve
    * sort order uses (first-fit-decreasing would reorder the
    * clustering); every bin lands in [target − max_file, target +
    * max_file). The running sum is a single global-order window —
    * correct here because the input is file METADATA (≤ millions of
    * rows at 100 TB), never data.
    */
  def packingPlan(files: DataFrame, fileCol: String, bytesCol: String,
                  targetBytes: Long): DataFrame = {
    require(targetBytes >= 1)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.orderBy(fileCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    files.select(col(fileCol).as("file"),
        col(bytesCol).cast("long").as("bytes"))
      .withColumn("cum_before", coalesce(sum(col("bytes")).over(w),
        lit(0L)))
      .withColumn("bin", expr(s"cum_before div ${targetBytes}L"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
        min(col("file")).as("first_file"), max(col("file")).as("last_file"))
  }
}
