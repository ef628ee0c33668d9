package graft.ops

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("split assignment is deterministic and stable under corpus growth") {
    val small = (1L to 100L).map(Tuple1.apply).toDF("doc_id")
    val big = (1L to 1000L).map(Tuple1.apply).toDF("doc_id")
    val a = Sampling.splitAssign(small, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.splitAssign(big, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (k, v) => b(k) == v },
      "adding rows must never move an existing row's split")
    val fracs = b.values.groupBy(identity).view.mapValues(_.size / 1000.0).toMap
    assert(math.abs(fracs("train") - 12.0 / 16) < 0.08, fracs.toString)
    assert(math.abs(fracs("valid") - 2.0 / 16) < 0.05, fracs.toString)
    assert(math.abs(fracs("test") - 2.0 / 16) < 0.05, fracs.toString)
  }

  test("labelBalance fractions sum to 1") {
    val df = (1 to 100).map(i => (i.toLong, i % 3)).toDF("id", "label")
    val rows = Sampling.labelBalance(df, "label").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 100L)
    assert(math.abs(rows.map(_.getAs[Double]("fraction")).sum - 1.0) < 1e-12)
  }

  test("corpusStats profiles token-length distribution per language") {
    val docs = Seq(
      (0L, "a b c", "en"), (1L, "a b c d e", "en"), (2L, "a b c d e f g", "en"),
      (3L, "x", "de")
    ).toDF("doc_id", "text", "lang")
    val exact = Sampling.corpusStats(docs).orderBy("lang").collect()
    assert(exact(0).getAs[Long]("n_docs") == 1L)          // de
    assert(exact(1).getAs[Double]("mean_tokens") == 5.0)  // en: (3+5+7)/3
    assert(exact(1).getAs[Double]("p50_tokens") == 5.0)
    assert(exact(1).getAs[Long]("min_tokens") == 3L)
    assert(exact(1).getAs[Long]("max_tokens") == 7L)
    // the sketch path returns the same medians on tiny groups
    val approx = Sampling.corpusStats(docs, exact = false).orderBy("lang").collect()
    assert(approx(1).getAs[Double]("p50_tokens") == 5.0)
  }

  test("sourceMix reports per-cell counts and corpus token shares") {
    val docs = Seq(
      (0L, "a b c", "en", "web"),
      (1L, "d e", "en", "web"),
      (2L, "f g h i", "de", "web"),
      (3L, "j", "en", "books")
    ).toDF("doc_id", "text", "lang", "source")
    val rows = Sampling.sourceMix(docs).collect()
    val byCell = rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("token_share"))).toMap
    assert(byCell(("web", "en")) == ((2L, 5L, 0.5)))
    assert(byCell(("web", "de"))._2 == 4L)
    assert(byCell(("books", "en"))._1 == 1L)
    assert(math.abs(rows.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-12)
  }
}
