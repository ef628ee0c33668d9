package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave: bit i of x → bit 2i, bit i of y → bit 2i+1. */
  private def naiveZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (z, i) =>
      z | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("zValue matches the naive bit interleave exhaustively on 8x8 bits") {
    val xs = for (x <- 0L until 256L; y <- 0L until 256L if (x + y) % 17 == 0)
      yield (x, y)
    val out = xs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (x, y, z) => assert(z == naiveZ(x, y, 8), s"($x,$y)") }
  }

  test("zValue masks inputs to the requested bit width") {
    val out = Seq((1027L, 5L)).toDF("x", "y") // 1027 = 0b10000000011
      .select(ZOrder.zValue(col("x"), col("y"), 2).as("z"))
      .head().getLong(0)
    assert(out == naiveZ(3L, 1L, 2)) // only the low 2 bits survive
  }

  test("clusterByZ bounds BOTH column spans per partition") {
    // 32x32 grid into 16 partitions: a z-clustered layout puts ~8x8
    // blocks in each partition, so both per-partition spans stay small;
    // a linear sort on x alone would leave the y span at 31 everywhere.
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val spans = ZOrder.clusterByZ(grid, "x", "y", 16, bits = 5)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    val avgX = spans.map(_.getAs[Long]("xs")).sum.toDouble / spans.length
    val avgY = spans.map(_.getAs[Long]("ys")).sum.toDouble / spans.length
    assert(avgX <= 16.0, s"x span $avgX")
    assert(avgY <= 16.0, s"y span $avgY")
  }

  test("zoneMapAudit: range layout prunes to one partition, modulo layout to all") {
    val rows = (0L until 100L).toDF("v")
    val probes = Seq(5L, 55L).toDF("probe")
    def scans(df: org.apache.spark.sql.DataFrame) =
      ZOrder.zoneMapAudit(df, "part", "v", probes).collect()
        .map(r => r.getAs[Long]("probe") ->
          (r.getAs[Long]("parts_scanned"), r.getAs[Long]("parts_total")))
        .toMap
    // modulo layout: partition p spans [p, 90+p] — probe 5 overlaps the
    // six partitions with zmin <= 5, probe 55 overlaps all ten
    val mod = scans(rows.withColumn("part", col("v") % 10))
    assert(mod(5L) == (6L, 10L) && mod(55L) == (10L, 10L))
    // range layout: exactly one partition covers each probe
    val rng = scans(rows.withColumn("part", expr("v div 10")))
    assert(rng(5L) == (1L, 10L) && rng(55L) == (1L, 10L))
  }
}
