package graft.functions

import graft.SparkSpec

class LayoutFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_hilbert: bijection with perfect step locality on 8x8") {
    val grid = for { x <- 0L until 8L; y <- 0L until 8L } yield (x, y)
    val out = grid.toDF("x", "y")
      .selectExpr("x", "y", "graft_hilbert(x, y, 3) AS h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // bijection onto [0, 64)
    assert(out.map(_._3).sorted.toSeq == (0L until 64L).toSeq)
    // the Hilbert property the z-curve lacks: every consecutive curve
    // position is a Manhattan-adjacent cell (no pow2-seam jumps)
    val byH = out.sortBy(_._3)
    byH.sliding(2).foreach { w =>
      val (a, b) = (w(0), w(1))
      assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1,
        s"curve jump between $a and $b")
    }
    assert(byH.head._1 == 0L && byH.head._2 == 0L, "curve starts at origin")
  }

  test("graft_hilbert masks coordinates into the grid and stays stable") {
    val r1 = Seq((5L, 6L)).toDF("x", "y")
      .selectExpr("graft_hilbert(x, y, 3) AS h").collect().head.getLong(0)
    // 5 + 8, 6 + 8 wrap onto the same 8x8 cell under the bits mask
    val r2 = Seq((13L, 14L)).toDF("x", "y")
      .selectExpr("graft_hilbert(x, y, 3) AS h").collect().head.getLong(0)
    assert(r1 == r2)
  }
}
