package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("leakageSafeSplit never lets a near-dup pair straddle the boundary") {
    import spark.implicits._
    // two 2-clusters + a 3-chain + singletons; the chain's ends are not
    // directly paired, so atomicity must come from the transitive
    // component, not the pair list
    val docs = (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (2L, 3L), (4L, 5L), (5L, 6L))
      .toDF("a_id", "b_id")
    val out = Sampling.leakageSafeSplit(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[String]("split"))).toMap
    assert(out.size == 10, "every doc gets a row")
    // cluster atomicity, including across the transitive 4-5-6 chain
    for ((a, b) <- Seq((0L, 1L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L)))
      assert(out(a) == out(b), s"pair ($a,$b) split apart: ${out(a)} ${out(b)}")
    // singletons cluster to themselves
    for (s <- Seq(7L, 8L, 9L)) assert(out(s)._1 == s)
    // deterministic across runs
    val again = Sampling.leakageSafeSplit(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[String]("split"))).toMap
    assert(again == out)
  }

  test("kFoldAssign is stable under growth and spreads folds") {
    val small = (1L to 200L).map(Tuple1.apply).toDF("doc_id")
    val big = (1L to 2000L).map(Tuple1.apply).toDF("doc_id")
    val a = Sampling.kFoldAssign(small, "doc_id", 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.kFoldAssign(big, "doc_id", 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // growth never reassigns an existing row's fold
    assert(a.forall { case (id, f) => b(id) == f })
    assert(a.values.forall(f => f >= 0 && f < 5))
    // every fold is populated and no fold hogs the corpus
    val sizes = b.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.keys.toSet == Set(0L, 1L, 2L, 3L, 4L))
    assert(sizes.values.forall(n => n > 200 && n < 600))
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

  test("mixtureResample keeps per-source rates deterministically and stably") {
    val docs = (1L to 2000L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val rates = Seq("src0" -> 0.0, "src1" -> 0.25, "src2" -> 1.0)
    val kept = Sampling.mixtureResample(docs, rates, 0.5).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!bySrc.contains("src0"), "rate 0.0 must drop the source entirely")
    assert(bySrc("src2") == 500, "rate 1.0 must keep every row")
    assert(math.abs(bySrc("src1") - 125) < 40, bySrc.toString) // ~0.25 * 500
    assert(math.abs(bySrc("src3") - 250) < 55, bySrc.toString) // default 0.5
    // stability: the same doc stays kept/dropped when the corpus grows
    val grown = (1L to 4000L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val keptGrown = Sampling.mixtureResample(grown, rates, 0.5).collect()
      .map(r => r.getLong(0)).toSet
    assert(kept.forall { case (id, _) => keptGrown(id) })
  }

  test("packSequences packs shard token streams into fixed windows") {
    val docs = Seq(
      (0L, "t " * 100, "a"), // 100 toks: seq 0, off 0
      (1L, "t " * 200, "a"), // starts at 100: seq 0, off 100, crosses into seq 1
      (2L, "t " * 56, "a"),  // starts at 300: seq 1, off 44
      (3L, "t " * 10, "b")   // other shard packs independently
    ).toDF("doc_id", "text", "source")
    val rows = Sampling.packSequences(docs, 256L).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("shard"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"),
        r.getAs[Boolean]("crosses_boundary")))
    assert(rows(0) == ((0L, "a", 0L, 0L, false)))
    assert(rows(1) == ((1L, "a", 0L, 100L, true)))
    assert(rows(2) == ((2L, "a", 1L, 44L, false)))
    assert(rows(3) == ((3L, "b", 0L, 0L, false)))
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

  test("bootstrapMean brackets the point estimate with exact order stats") {
    // one group, values 100..199 cents: every half-sample replica's
    // truncated mean sits near 149, and min <= point <= max must hold
    val rows = (0 until 100).map(i => ("g", i.toLong, 100L + i))
      .toDF("group", "id", "v100")
    val r = Sampling.bootstrapMean(rows, b = 32).collect()(0)
    assert(r.getAs[Long]("n_rows") == 100L)
    assert(r.getAs[Long]("n_replicas") == 32L)
    val (lo, hi) = (r.getAs[Long]("ci_lo_c"), r.getAs[Long]("ci_hi_c"))
    val point = r.getAs[Long]("point_c")
    assert(point == 149L)
    assert(lo <= point && point <= hi, s"CI [$lo, $hi] must cover $point")
    assert(hi - lo < 30L, s"half-sample spread [$lo, $hi] implausibly wide")
    // deterministic: the same call reproduces the identical interval
    val r2 = Sampling.bootstrapMean(rows, b = 32).collect()(0)
    assert(r2.getAs[Long]("ci_lo_c") == lo && r2.getAs[Long]("ci_hi_c") == hi)
  }

  test("samplePerKey draws a stable fixed-size sample per key") {
    val docs = (0L until 40L).map(i =>
      (i, s"text $i", "en", if (i % 2 == 0) "web" else "books"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Sampling.samplePerKey(docs, "source", 5)
    val rows = out.collect()
    assert(rows.length == 10)
    assert(rows.groupBy(_.getAs[String]("source")).forall(_._2.length == 5))
    assert(rows.map(_.getAs[Long]("sample_rank")).forall(r => r >= 1 && r <= 5))
    // deterministic: a second evaluation picks the identical ids
    val again = Sampling.samplePerKey(docs, "source", 5).collect()
    assert(rows.map(_.getLong(0)).sorted.sameElements(
      again.map(_.getLong(0)).sorted))
    // groups smaller than n return whole groups
    val small = Sampling.samplePerKey(docs.filter(col("doc_id") < 3), "source", 5)
    assert(small.count() == 3L)
  }

  test("ratesForTarget caps the bottleneck source at rate 1, no upsampling") {
    // a: 100 docs wanted at 50%, b: 900 at 25%, c: 500 at 25%
    // scale = min(100/.5, 900/.25, 500/.25) = 200 -> a is the bottleneck
    val docs = ((1 to 100).map(i => (i.toLong, "a")) ++
      (1 to 900).map(i => (i.toLong + 1000, "b")) ++
      (1 to 500).map(i => (i.toLong + 10000, "c")) ++
      (1 to 50).map(i => (i.toLong + 100000, "untargeted")))
      .toDF("doc_id", "source")
    val got = Sampling.ratesForTarget(docs,
      Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("rate"))).toMap
    assert(got.keySet == Set("a", "b", "c")) // untargeted dropped
    assert(got("a") == ((100L, 1.0)))        // bottleneck: keep all
    assert(got("b") == ((900L, 0.25 * 200 / 900)))
    assert(got("c") == ((500L, 0.25 * 200 / 500)))
    // resulting mix matches the target shares exactly
    val outSizes = got.map { case (_, (n, r)) => n * r }
    assert(math.abs(outSizes.sum - 200.0) < 1e-9)
  }

  test("temperatureRates keeps the rarest source and flattens the head") {
    import spark.implicits._
    val docs = ((1 to 100).map(i => (i.toLong, "big")) ++
      (1 to 16).map(i => (i.toLong + 1000, "small")) ++
      (1 to 81).map(i => (i.toLong + 2000, "mid")))
      .toDF("doc_id", "source")
    val got = Sampling.temperatureRates(docs, temperature = 2)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("rate"))).toMap
    // weights are sqrt(n): 10, 4, 9; scale = min(n/w) = 4 (rarest)
    assert(got("small") == ((16L, 1.0)), "rarest source keeps everything")
    assert(got("big") == ((100L, 10.0 * 4.0 / 100.0)))
    assert(got("mid") == ((81L, 9.0 * 4.0 / 81.0)))
    // flattening: output ratio big/small (40/16) < input ratio (100/16)
    assert(100.0 * got("big")._2 / 16.0 < 100.0 / 16.0)
  }

  test("temperatureRates at T=1 is proportional (all rates 1)") {
    import spark.implicits._
    val docs = ((1 to 30).map(i => (i.toLong, "a")) ++
      (1 to 7).map(i => (i.toLong + 100, "b"))).toDF("doc_id", "source")
    val rates = Sampling.temperatureRates(docs, temperature = 1)
      .collect().map(_.getAs[Double]("rate"))
    assert(rates.forall(_ == 1.0))
  }

  test("lengthBatches fills token budgets in descending-length order per shard") {
    import org.apache.spark.sql.functions.col
    // shard A lengths (desc): 10,10,10,5 with budget 20 →
    // batches [10,10] (exact fit, zero waste) and [10,5] (25% padding)
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(10), "A"), (2L, words(5), "A"),
      (3L, words(10), "A"), (4L, words(10), "A"),
      (5L, words(7), "B"))
      .toDF("doc_id", "text", "source")
    val got = Sampling.lengthBatches(docs, maxTokensPerBatch = 20L)
      .orderBy("shard", "batch_id").collect()
      .map(r => (r.getAs[String]("shard"), r.getAs[Long]("batch_id"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("batch_tokens"),
        r.getAs[Long]("max_len"), r.getAs[Long]("padded_tokens"),
        r.getAs[Long]("waste_ppm"))).toSeq
    assert(got == Seq(
      ("A", 0L, 2L, 20L, 10L, 20L, 0L),
      ("A", 1L, 2L, 15L, 10L, 20L, 250000L),
      ("B", 0L, 1L, 7L, 7L, 7L, 0L)), got.toString)
    // zero shuffles beyond the shard window + batch rollup: no global sort
    val plan = Sampling.lengthBatches(docs, 20L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"no global sort allowed:\n$plan")
  }

  test("curriculumOrder tiers by score and shuffles within stages") {
    val docs = (1L to 20L).map(i => (i, i * 10L)).toDF("doc_id", "n_chars")
    val out = Sampling.curriculumOrder(docs, "n_chars", 4).collect()
    val byStage = out.groupBy(_.getAs[Long]("stage"))
    assert(byStage.keySet == Set(1L, 2L, 3L, 4L))
    // ntile over 20 rows: stages of 5; tiers respect the score order
    assert(byStage.values.forall(_.length == 5))
    val maxOf = (st: Long) => byStage(st).map(_.getAs[Long]("n_chars")).max
    val minOf = (st: Long) => byStage(st).map(_.getAs[Long]("n_chars")).min
    assert(maxOf(1L) < minOf(2L) && maxOf(2L) < minOf(3L) &&
      maxOf(3L) < minOf(4L))
    // pos is a permutation of 1..5 within each stage, and NOT the score
    // order in at least one stage (the md5 shuffle does something)
    assert(byStage.values.forall(
      _.map(_.getAs[Long]("pos")).sorted.sameElements(1L to 5L)))
    val inScoreOrder = byStage.values.count { rows =>
      rows.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("n_chars"))
        .sameElements(rows.map(_.getAs[Long]("n_chars")).sorted)
    }
    assert(inScoreOrder < 4, "md5 shuffle must break score order somewhere")
    // determinism: a second run yields the identical assignment
    val again = Sampling.curriculumOrder(docs, "n_chars", 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("stage"),
        r.getAs[Long]("pos"))).toSet
    assert(again == out.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("stage"), r.getAs[Long]("pos"))).toSet)
  }

  test("preferencePairs picks deterministic extremes, drops degenerate groups") {
    import spark.implicits._
    val scored = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 1L), // tie -> min id wins
      ("b", 4L, 5L),                                 // singleton: dropped
      ("c", 5L, 7L), ("c", 6L, 7L)                   // margin 0: dropped
    ).toDF("source", "doc_id", "score")
    val out =
      Sampling.preferencePairs(scored, "source", "doc_id", "score", 1L)
        .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("source") === "a")
    assert(r.getAs[Long]("chosen_id") === 1L)
    assert(r.getAs[Long]("rejected_id") === 3L)
    assert(r.getAs[Long]("chosen_score") === 10L)
    assert(r.getAs[Long]("rejected_score") === 1L)
    assert(r.getAs[Long]("margin") === 9L)
  }

  test("weightedSample draws the exact A-ES prefix of replica minima") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Seq((1L, 3L), (2L, 1L), (3L, 5L), (4L, 2L))
    val expected = rows.map { case (id, w) =>
      (id, w, (0L until w).map(r => md5hex(s"$id:$r")).min)
    }.sortBy(t => (t._3, t._1)).take(3)
      .zipWithIndex.map { case ((id, w, h), i) => (i + 1L, id, w, h) }
    val out = Sampling.weightedSample(rows.toDF("doc_id", "w"),
      "doc_id", "w", 3).collect()
      .map(r => (r.getAs[Long]("draw"), r.getAs[Long]("id"),
        r.getAs[Long]("w"), r.getAs[String]("h"))).toSeq
    assert(out === expected)
  }

  test("targetEncodeLOO excludes the row's own label, NULLs singletons") {
    import spark.implicits._
    // cat A: labels (T, F, T) -> LOO for the Ts is 1/2, for the F is 1
    val df = Seq((1L, "A", true), (2L, "A", false), (3L, "A", true),
      (4L, "B", true)).toDF("id", "cat", "lab")
    val out = Sampling.targetEncodeLOO(df, "cat", "lab", "id").collect()
      .map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("loo_ppm"))) None
         else Some(r.getAs[Long]("loo_ppm")))).toMap
    assert(out(1L) === Some(500000L))
    assert(out(2L) === Some(1000000L))
    assert(out(3L) === Some(500000L))
    assert(out(4L) === None)
  }

  test("neymanAllocation weights by N_h·S_h, zero for constant strata") {
    import spark.implicits._
    // stratum a: constant values → S=0 → no budget; stratum b: {0, 20}
    // has sample variance 200, S = sqrt(200), w = floor(2·S) = 28
    val df = Seq(("a", 10L), ("a", 10L), ("a", 10L),
      ("b", 0L), ("b", 20L), ("c", 7L)).toDF("src", "v")
    val out = Sampling.neymanAllocation(df, "src", "v", 100L).collect()
      .map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("w_h"), r.getAs[Long]("alloc"))).toMap
    assert(out("a") == (0L, 0L))
    assert(out("c") == (0L, 0L), "singleton stratum carries no spread")
    assert(out("b")._1 == math.floor(2.0 * math.sqrt(200.0)).toLong)
    assert(out("b")._2 == 100L, "the only spread stratum takes it all")
  }

  test("sourceAblation recomputes metrics without each source") {
    import spark.implicits._
    val df = Seq((1L, "a", "en", 100L), (2L, "a", "en", 200L),
      (3L, "b", "de", 300L), (4L, "b", "de", 400L))
      .toDF("doc_id", "source", "lang", "n_chars")
    val out = Sampling.sourceAblation(df).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("mean_chars_e2"), r.getAs[Long]("mean_without_e2"),
          r.getAs[Long]("en_ppm_without"), r.getAs[Long]("delta_mean_e2")))
      .toMap
    // global mean 250 → 25000 e2; without a: 350; without b: 150
    assert(out("a") == (25000L, 35000L, 0L, 10000L))
    assert(out("b") == (25000L, 15000L, 1000000L, -10000L))
  }

  test("negativeSamples follows the smoothed weights, deterministically") {
    import spark.implicits._
    // 'big' dominates the unigram table (f=60 -> w=1000); the four
    // rare tokens get the floor weight (f=1 -> w=46 each)
    val docs = Seq((0L, ("big " * 60 + "rare small tiny word").trim))
      .toDF("doc_id", "text")
    val out = Sampling.negativeSamples(docs, topV = 5, k = 4)
    val rows = out.collect()
    assert(rows.length == 63 * 4, "63 pairs x 4 draws")
    val byTok = rows.groupBy(_.getAs[String]("neg_token"))
      .view.mapValues(_.length).toMap
    assert(byTok("big") > rows.length / 2,
      s"dominant token must dominate the draws: $byTok")
    assert(byTok.keySet.subsetOf(Set("big", "rare", "small", "tiny",
      "word")))
    // md5 draws: a second run is bit-identical
    val again = Sampling.negativeSamples(docs, topV = 5, k = 4).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // collisions with the positive context are flagged, present, honest
    assert(rows.exists(_.getAs[Boolean]("is_collision")))
  }

  test("balancedBatches: equal class composition, ragged tail flagged") {
    // class 0: 9 rows, class 1: 8 rows, perClass 4 → batches 0,1 full
    // for class 1; class 0 has a 9th row → batch 2 ragged
    val df = ((0L until 9L).map(i => (i, 0L)) ++
      (100L until 108L).map(i => (i, 1L))).toDF("vid", "lab")
    val r = Sampling.balancedBatches(df, "lab", "vid", 4).collect()
    val byBatch = r.groupBy(_.getAs[Long]("batch"))
    // batches 0 and 1 carry exactly 4 of EACH class and are complete
    Seq(0L, 1L).foreach { b =>
      val rows = byBatch(b)
      assert(rows.count(_.getAs[Long]("cls") == 0L) == 4)
      assert(rows.count(_.getAs[Long]("cls") == 1L) == 4)
      assert(rows.forall(_.getAs[Boolean]("complete")))
    }
    // batch 2: one leftover class-0 row, flagged incomplete
    assert(byBatch(2L).length == 1 &&
      !byBatch(2L).head.getAs[Boolean]("complete"))
    // slots within (batch, class) are 0..3, and runs are deterministic
    assert(r.map(_.getAs[Long]("slot")).forall(s => s >= 0 && s < 4))
    val again = Sampling.balancedBatches(df, "lab", "vid", 4).collect()
    assert(r.map(_.toSeq).toSeq.sortBy(_.toString) ==
      again.map(_.toSeq).toSeq.sortBy(_.toString))
  }

  test("shapleyVocabValue: symmetry, efficiency, exclusive counts") {
    // source a covers {x, y}, source b covers {y, z} — symmetric
    // coverage, one exclusive token each; 'other' pool is empty
    val docs = Seq(
      (1L, "x y", "a"), (2L, "x", "a"), // a twice → elected grp 0
      (3L, "y z", "b"))
      .toDF("doc_id", "text", "source")
    val r = Sampling.shapleyVocabValue(docs, topK = 2).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_exclusive_tokens"),
          x.getAs[Long]("phi_scaled"))).toMap
    assert(r("a")._1 == 1L && r("b")._1 == 1L) // x and z exclusive
    assert(r("a")._2 == r("b")._2, "symmetric coverage → equal Shapley")
    assert(r("other") == ((0L, 0L)), "empty pool earns nothing")
    // efficiency: Σφ·c! == c!·v(full) = 6 · 3 distinct tokens
    assert(r.values.map(_._2).sum == 18L)
  }

  test("doremiWeights: a zero-excess corpus keeps the uniform mix") {
    val docs = (0 until 20).map(i => (i.toLong, s"s${i % 4}", 100L))
      .toDF("doc_id", "source", "n_chars")
    val w = Sampling.doremiWeights(docs, 3).collect()
    assert(w.forall(_.getAs[Long]("excess_e6") == 0L))
    assert(w.forall(_.getAs[Long]("weight_ppm") == 250000L))
  }

  test("doremiWeights tilts toward the excess domain, staying normalized") {
    val docs = ((0 until 10).map(i => (i.toLong, "long", 900L)) ++
      (10 until 20).map(i => (i.toLong, "short", 100L)))
      .toDF("doc_id", "source", "n_chars")
    val rows = Sampling.doremiWeights(docs, 5).collect()
    val w = rows.map(r => r.getString(0) -> r.getAs[Long]("weight_ppm")).toMap
    assert(w("long") > 600000L && w("short") < 400000L)
    // floor slack: each round's renormalize floors once per domain
    assert(math.abs(w.values.sum - 1000000L) <= w.size)
    val ex = rows.map(r => r.getString(0) -> r.getAs[Long]("excess_e6")).toMap
    assert(ex("long") == 400000000L && ex("short") == 0L)
  }
}
