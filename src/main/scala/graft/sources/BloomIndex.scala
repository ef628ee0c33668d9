package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** File-level Bloom-filter skipping index — the point-lookup companion
  * of [[ZOrder.zoneMapAudit]]'s range pruning. Zone maps skip files by
  * (min, max); a per-file Bloom over a high-cardinality key skips files
  * for EQUALITY probes even when the key is unsorted within the file
  * (the parquet bloom_filter_enabled / Delta dataSkippingStatsColumns
  * shape). The index is built ONCE per layout from one scan; a point
  * lookup then touches only the files whose filter claims the key —
  * false positives cost an extra file read, never a wrong answer.
  *
  * The filter state is kept in the ORACLE-FRIENDLY row form: the set of
  * set bit positions as distinct (part, bit) rows (the HLL
  * packed-vs-row lesson: row form for the SQL twin; a production sink
  * would pack the same bits into an m-bit blob per file — identical
  * integers, one row per file). Every bit derives from an md5-salted
  * hash, so both engines rebuild the index bit for bit. Size `m` at
  * ~17 bits per expected distinct key per file (the measured ~0.4% fp
  * point); 3 salted hashes oversaturate below ~2 bits/key.
  */
object BloomIndex {

  /** Build the row-form index: for each of `k` salts, bit =
    * md5(salt ‖ ':' ‖ key) mod m, deduped per partition. One scan +
    * one distinct shuffle keyed on (part, bit); output ≤ parts·k·keys
    * rows (≤ parts·m once saturated).
    */
  def build(df: DataFrame, partCol: String, keyCol: String,
            m: Int = 16384, k: Int = 3): DataFrame = {
    require(m >= 8 && k >= 1 && k <= 8, "bounded bloom geometry")
    (1 to k).map { h =>
      df.select(col(partCol).as("part"),
        expr(s"CAST(conv(substring(md5(CONCAT('$h', ':', " +
          s"CAST($keyCol AS STRING))), 1, 8), 16, 10) AS BIGINT) % $m")
          .as("bit"))
    }.reduce(_ unionByName _).distinct()
  }

  /** Probe the index: a partition must be scanned for a probe key iff
    * ALL k of the key's bits are present in its filter. Output per
    * probe: `parts_scanned` (claimed by the filter, false positives
    * included) and `parts_total`. Join is keyed on `bit` (the k
    * probe-side rows against the bounded index), then a (probe, part)
    * count closes the all-k-bits conjunction — the corpus itself is
    * never read.
    */
  def audit(index: DataFrame, probes: DataFrame,
            m: Int = 16384, k: Int = 3): DataFrame = {
    // distinct per probe: two salts may collide into one bit, so the
    // conjunction closes against the probe's OWN distinct-bit count,
    // never the literal k
    val pb = probes
      .select(col("probe"), explode(expr(s"sequence(1, $k)")).as("h"))
      .select(col("probe"),
        expr(s"CAST(conv(substring(md5(CONCAT(CAST(h AS STRING), ':', " +
          s"CAST(probe AS STRING))), 1, 8), 16, 10) AS BIGINT) % $m")
          .as("bit"))
      .distinct()
    val nreq = pb.groupBy(col("probe")).agg(count(lit(1)).as("nreq"))
    val total = index.agg(countDistinct(col("part")).as("parts_total"))
    val scanned = pb.join(index, Seq("bit"))
      .groupBy(col("probe"), col("part"))
      .agg(count(lit(1)).as("nbits"))
      .join(broadcast(nreq), Seq("probe"))
      .filter(col("nbits") === col("nreq"))
      .groupBy(col("probe"))
      .agg(count(lit(1)).as("parts_scanned"))
    // keep zero-scan probes (the absent-key win the index exists for)
    probes.select(col("probe")).distinct()
      .join(scanned, Seq("probe"), "left")
      .select(col("probe"),
        coalesce(col("parts_scanned"), lit(0L)).as("parts_scanned"))
      .crossJoin(broadcast(total))
  }
}
