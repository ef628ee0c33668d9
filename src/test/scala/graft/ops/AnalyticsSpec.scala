package graft.ops

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports per-column rows, nulls, distincts, and bounds") {
    val df = Seq(
      (Some(1), Some(2.5)), (Some(1), None), (Some(3), Some(-1.0))
    ).toDF("a", "b")
    val rows = Analytics.profile(df, Seq("a", "b")).orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows(0) == (("a", 3L, 3L, 2L, 1.0, 3.0)))
    assert(rows(1) == (("b", 3L, 2L, 2L, -1.0, 2.5)))
  }
}
