package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping.
  *
  * A lake laid out by a linear sort prunes min/max statistics on its
  * leading column only; interleaving the bits of two filter columns and
  * range-partitioning on the combined z-value makes every output file
  * cover a small *square* in (x, y) space, so parquet row-group stats
  * prune BOTH dimensions. This is the layout step a 100 TB deployment
  * runs after [[Compaction]]: same shuffle-count (one range exchange),
  * strictly better skipping for two-column predicates.
  */
object ZOrder {

  /** Morton z-value: interleaves the low `bits` bits of two non-negative
    * integer columns (x → even bit positions, y → odd). Pure shift/and/or
    * arithmetic — whole-stage-codegen'd in Spark and reproducible
    * bit-for-bit in any engine with 64-bit integer ops.
    */
  def zValue(x: Column, y: Column, bits: Int = 20): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    // classic bit dilation: spread the low 32 bits two apart with five
    // shift-or-mask rounds (each round halves the group size)
    def dilate(c: Column): Column = {
      val masks = Seq(
        0x0000FFFF0000FFFFL -> 16, 0x00FF00FF00FF00FFL -> 8,
        0x0F0F0F0F0F0F0F0FL -> 4, 0x3333333333333333L -> 2,
        0x5555555555555555L -> 1)
      masks.foldLeft(c.cast("long")) { case (v, (mask, shift)) =>
        v.bitwiseOR(shiftleft(v, shift)).bitwiseAND(lit(mask))
      }
    }
    val mask = (1L << bits) - 1
    dilate(x.cast("long").bitwiseAND(lit(mask)))
      .bitwiseOR(shiftleft(dilate(y.cast("long").bitwiseAND(lit(mask))), 1))
  }

  /** Rewrite `df` clustered along the z-curve over (xCol, yCol):
    * range-partition on the z-value, sort within partitions, drop the
    * helper column. Each output partition then spans a compact z-range —
    * a near-square region of (x, y) space — so per-file min/max column
    * statistics are tight on both columns. One range exchange, no other
    * shuffle; write the result with any sink to materialize the layout.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
                 numPartitions: Int, bits: Int = 20): DataFrame =
    df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")

  /** Zone-map pruning audit — measures what a LAYOUT is worth before
    * paying for the rewrite: given rows already assigned a partition id,
    * build the per-partition (min, max) zone map of `valCol` and count,
    * for each probe value, how many partitions a point lookup MUST read
    * (min ≤ v ≤ max). `parts_scanned / parts_total` is the skipping
    * ratio parquet row-group stats would deliver; a hash layout scans
    * ~everything, a range/z layout scans ~1 — run the audit on both
    * and the difference is the rewrite's justification.
    *
    * Scale shape: the zone map is ONE partial-agg shuffle on the
    * partition id (output = #partitions rows); probes×zonemap is a
    * broadcast nested-loop over two BOUNDED sides (probes are a
    * handful, the zone map is layout-sized) — the corpus itself is
    * read exactly once.
    */
  def zoneMapAudit(df: DataFrame, partCol: String, valCol: String,
                   probes: DataFrame): DataFrame = {
    val zm = df.groupBy(col(partCol).as("part"))
      .agg(min(col(valCol)).as("zmin"), max(col(valCol)).as("zmax"))
    val total = zm.select(count(lit(1)).as("parts_total"))
    probes.crossJoin(broadcast(zm))
      .withColumn("hit",
        (col("probe") >= col("zmin") && col("probe") <= col("zmax"))
          .cast("long"))
      .groupBy(col("probe"))
      .agg(sum(col("hit")).as("parts_scanned"))
      .crossJoin(broadcast(total))
  }
}
