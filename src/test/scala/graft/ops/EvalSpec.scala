package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("aucExact matches the hand-counted pair fraction with ties") {
    // pos scores {2,3}, neg {1,2}: wins (2,1),(3,1),(3,2), tie (2,2)
    // → AUC = 3.5/4 = 0.875
    val df = Seq((1L, false), (2L, false), (2L, true), (3L, true))
      .toDF("score", "label")
    val r = Eval.aucExact(df).collect()(0)
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("n_scores") == 3L)
    assert(r.getAs[Long]("auc_ppm") == 875000L)
  }

  test("aucExact is 1e6 for a perfect ranking and 500000 for a coin flip") {
    val perfect = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("score", "label")
    assert(Eval.aucExact(perfect).collect()(0)
      .getAs[Long]("auc_ppm") == 1000000L)
    // all scores identical → every pair is a tie → exactly 1/2
    val flat = Seq((5L, false), (5L, true), (5L, false), (5L, true))
      .toDF("score", "label")
    assert(Eval.aucExact(flat).collect()(0)
      .getAs[Long]("auc_ppm") == 500000L)
  }

  test("confusionCard counts cells and ppm metrics exactly") {
    val df = Seq((1L, false), (2L, false), (2L, true), (3L, true))
      .toDF("score", "label")
    val r = Eval.confusionCard(df, 2L).collect()(0)
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("fp") == 1L)
    assert(r.getAs[Long]("fn") == 0L && r.getAs[Long]("tn") == 1L)
    assert(r.getAs[Long]("precision_ppm") == 666666L)
    assert(r.getAs[Long]("recall_ppm") == 1000000L)
    assert(r.getAs[Long]("f1_ppm") == 800000L)
    assert(r.getAs[Long]("accuracy_ppm") == 750000L)
    // threshold above every score → zero predicted positives → NULL
    // precision, zero recall (portably, never a divide-by-zero)
    val none = Eval.confusionCard(df, 99L).collect()(0)
    assert(none.isNullAt(none.fieldIndex("precision_ppm")))
    assert(none.getAs[Long]("recall_ppm") == 0L)
  }

  test("ksTest finds the exact max CDF gap at its smallest location") {
    // A = {1, 2}, B = {2, 9}: dev(v) = |c1·n2 − c2·n1| = 2, 2, 0
    // → D = 2/(2·2) = 0.5, first attained at v = 1
    val ev = Seq(("click", 1.0), ("click", 2.0), ("view", 2.0),
      ("view", 9.0), ("error", 5.0)).toDF("event_type", "value")
    val r = Eval.ksTest(ev, "click", "view").collect()(0)
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("d_num") == 2L)
    assert(r.getAs[Long]("d_ppm") == 500000L)
    assert(r.getAs[Long]("ks_at_v6") == 1000000L)
  }

  test("acf matches hand-computed lags and gap-fills missing days") {
    val day = 86400000000L * 1000L // one day of ts nanos
    // type a: x = [1,2,3] on days 0,1,2 → c = [−3,0,3], den = 18
    //   lag1: 0 → 0 ppm; lag2: −9/18 → −500000 ppm
    // type b: events on days 0 and 2 ONLY → gap-filled x = [1,0,2],
    //   c = [0,−3,3], den = 18; lag1: −9/18 → −500000; lag2: 0
    val rows = Seq.fill(1)(("a", 0L)) ++ Seq.fill(2)(("a", day)) ++
      Seq.fill(3)(("a", 2 * day)) ++
      Seq(("b", 0L), ("b", 2 * day), ("b", 2 * day))
    val ev = rows.toDF("event_type", "ts")
    val r = Eval.acf(ev, maxLag = 2).collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("lag")) ->
        (x.getAs[Long]("n_days"), x.getAs[Long]("n_pairs"),
          x.getAs[Long]("acf_ppm"))).toMap
    assert(r(("a", 0L)) == ((3L, 3L, 1000000L)))
    assert(r(("a", 1L)) == ((3L, 2L, 0L)))
    assert(r(("a", 2L)) == ((3L, 1L, -500000L)))
    assert(r(("b", 1L))._3 == -500000L)
    assert(r(("b", 2L))._3 == 0L)
  }
}
