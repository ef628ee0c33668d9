package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("hourlyRollup handles timestamp columns") {
    val df = Seq(
      (1L, ts(10, 5), 1L, "click", 1.5),
      (2L, ts(10, 55), 2L, "click", 2.5),
      (3L, ts(11, 0), 1L, "view", 4.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.hourlyRollup(df).orderBy("hour_ts", "event_type").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(0).getAs[Double]("sum_value") == 4.0)
    assert(out(0).getAs[Long]("n_users") == 2L)
  }

  test("hourlyRollup handles raw INT64 nanos with exact integral math") {
    val h10 = ts(10, 0).getTime / 1000 * 1000000000L
    val df = Seq(
      (1L, h10 + 5L * 60 * 1000000000L, 1L, "click", 1.0),
      (2L, h10 + 59L * 60 * 1000000000L, 2L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.hourlyRollup(df).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("hour_ts") == h10 / 1000000000L)
  }

  test("sessionize splits on the inactivity gap") {
    val df = Seq(
      (1L, ts(9, 0), 7L, "c", 0.0),
      (2L, ts(9, 10), 7L, "c", 0.0),
      (3L, ts(12, 0), 7L, "c", 0.0),
      (4L, ts(9, 5), 8L, "c", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.sessionize(df, gapSeconds = 1800)
      .orderBy("user_id", "session_idx").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2L) // user 7 session 1
    assert(out(1).getAs[Long]("n_events") == 1L) // user 7 session 2
    assert(out(2).getAs[Long]("user_id") == 8L)
  }
}
