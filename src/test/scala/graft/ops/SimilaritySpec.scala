package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  test("bruteTopK returns k ranked neighbors per query, self excluded") {
    val out = Similarity.bruteTopK(emb, queries, k = 10).collect()
    assert(out.length == 50)
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 10L))
      assert(!rows.map(_.getLong(2)).contains(q), s"query $q returned itself")
    }
  }

  test("lshTopK has no cross product on the real embeddings table") {
    val lsh = Similarity.lshTopK(emb, queries, k = 10)
    assertNoCrossProduct(lsh, "lshTopK")
    assert(lsh.collect().nonEmpty)
  }

  test("lshTopK recall >= 0.8 vs brute force on clustered vectors") {
    import spark.implicits._
    // 20 centers x 25 members, members = center + small noise: the regime
    // LSH is built for (near neighbors at cosine ~0.95+). Isotropic random
    // vectors (neighbors at cosine ~0.35) are out of scope by design.
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(20)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val vecs = for {
      c <- centers.indices
      m <- 0 until 25
    } yield ((c * 25 + m).toLong,
      centers(c).map(v => v + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    val corpus = vecs.toDF("vec_id", "embedding")
    val qs = corpus.filter($"vec_id" % 25 === 0).limit(5)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val brute = Similarity.bruteTopK(corpus, qs, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(corpus, qs, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.8, f"recall $recall%.2f below 0.8")
  }

  test("ivfTopK recall >= 0.8 vs brute force on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(10)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val vecs = for { c <- centers.indices; m <- 0 until 30 } yield
      ((c * 30 + m).toLong,
        centers(c).map(v => v + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    val corpus = vecs.toDF("vec_id", "embedding")
    val qs = corpus.filter($"vec_id" % 30 === 0).limit(4)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val brute = Similarity.bruteTopK(corpus, qs, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(corpus, qs, k = 10, nLists = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.8, f"IVF recall $recall%.2f below 0.8")
  }

  test("ivfTopKIndexed equals ivfTopK and prunes unprobed list partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(10)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val vecs = for { c <- centers.indices; m <- 0 until 30 } yield
      ((c * 30 + m).toLong,
        centers(c).map(v => v + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    val corpus = vecs.toDF("vec_id", "embedding")
    val qs = corpus.filter($"vec_id" % 30 === 0).limit(4)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    try {
      Similarity.writeIvfIndex(corpus, dir, nLists = 8)
      val indexed = Similarity.ivfTopKIndexed(spark, qs, dir, k = 10, nProbe = 2)
      // same deterministic centroids -> identical output to the
      // recompute-everything operator
      val a = indexed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val b = Similarity.ivfTopK(corpus, qs, k = 10, nLists = 8, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(a == b, s"indexed $a vs recomputed $b")
      // the scan must carry a list_id partition filter (probed lists only)
      val plan = indexed.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
        s"expected list_id partition pruning:\n$plan")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("ivfAppend equals a from-scratch rebuild and keeps partition pruning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(10)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val vecs = for { c <- centers.indices; m <- 0 until 30 } yield
      ((c * 30 + m).toLong,
        centers(c).map(v => v + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    val corpus = vecs.toDF("vec_id", "embedding")
    // base holds the trainSample lowest vec_ids, so the from-scratch
    // rebuild fits the SAME centroids the append path reuses — the
    // equality below is exact, not approximate
    val base = corpus.filter($"vec_id" < 240)
    val batch = corpus.filter($"vec_id" >= 240)
    val qs = corpus.filter($"vec_id" % 30 === 0).limit(4)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val dirA = java.nio.file.Files.createTempDirectory("graft_ivf_inc").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivf_full").toString
    try {
      Similarity.writeIvfIndex(base, dirA, nLists = 8, trainSample = 200)
      Similarity.ivfAppend(spark, batch, dirA)
      Similarity.writeIvfIndex(corpus, dirB, nLists = 8, trainSample = 200)
      val inc = Similarity.ivfTopKIndexed(spark, qs, dirA, k = 10, nProbe = 2)
      val a = inc.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val b = Similarity.ivfTopKIndexed(spark, qs, dirB, k = 10, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(a == b, s"append-then-query $a vs rebuilt $b")
      // appended files land inside the list_id directory tree, so the
      // probe scan still prunes to the probed lists only
      val plan = inc.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
        s"expected list_id partition pruning after append:\n$plan")
      // the appended rows are really there (index grew by |batch|)
      val nIdx = spark.read.parquet(s"$dirA/index").count()
      assert(nIdx == corpus.count(), s"index rows $nIdx != corpus size")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dirA)).deleteRecursively()
      new Directory(new java.io.File(dirB)).deleteRecursively()
    }
  }

  test("marginAlign ranks planted translation pairs above hub similarity") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    def noisy(base: Array[Float], eps: Float) =
      base.map(v => v + eps * rnd.nextGaussian().toFloat).toSeq
    // 6 src docs; tgt side = true translations (src + tiny noise) for
    // ids 0-2, plus a HUB vector (mean-ish direction, similar to
    // everything) and two unrelated vectors
    val bases = Array.fill(6)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val hub = Array.tabulate(32)(j => bases.map(_(j)).sum / 6f)
    val src = bases.zipWithIndex.map { case (b, i) => (i.toLong, b.toSeq) }
    val tgt = Seq(
      (100L, noisy(bases(0), 0.02f)),
      (101L, noisy(bases(1), 0.02f)),
      (102L, noisy(bases(2), 0.02f)),
      (103L, hub.toSeq),
      (104L, Array.fill(32)(rnd.nextGaussian().toFloat).toSeq),
      (105L, Array.fill(32)(rnd.nextGaussian().toFloat).toSeq))
    val out = Similarity.marginAlign(
      src.toSeq.toDF("vec_id", "embedding"),
      tgt.toDF("vec_id", "embedding"),
      k = 3, minMarginX2k = Long.MinValue).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    // each planted pair must be its src's best margin, beating any
    // src-hub pairing
    for ((s, t) <- Seq((0L, 100L), (1L, 101L), (2L, 102L))) {
      val planted = out((s, t))
      val hubMargin = out.get((s, 103L))
      assert(hubMargin.forall(_ < planted),
        s"src $s: planted margin $planted must beat hub ${hubMargin}")
      val bestForSrc = out.collect { case ((`s`, tt), m) => (m, tt) }.max
      assert(bestForSrc._2 == t, s"src $s best pair should be $t: $bestForSrc")
    }
  }

  test("pqTopK recall >= 0.8 vs brute force on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(10)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val vecs = for { c <- centers.indices; m <- 0 until 30 } yield
      ((c * 30 + m).toLong,
        centers(c).map(v => v + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    val corpus = vecs.toDF("vec_id", "embedding")
    val qs = corpus.filter($"vec_id" % 30 === 0).limit(4)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val brute = Similarity.bruteTopK(corpus, qs, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = Similarity.pqTopK(corpus, qs, k = 10, m = 8, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.8, f"PQ recall $recall%.2f below 0.8")
  }

  test("kmeansCluster groups planted clusters together (purity >= 0.9)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat * 3f))
    val vecs = for { c <- centers.indices; m <- 0 until 50 } yield
      ((c * 50 + m).toLong,
        centers(c).map(v => v + 0.1f * rnd.nextGaussian().toFloat).toSeq)
    val corpus = vecs.toDF("vec_id", "embedding")
    val out = Similarity.kmeansCluster(corpus, k = 4, trainSample = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 200)
    // purity: each planted group's rows should mostly share one cluster id
    val purity = out.groupBy(_._1 / 50).values.map { grp =>
      grp.groupBy(_._2).values.map(_.size).max.toDouble / grp.size
    }.min
    assert(purity >= 0.9, f"cluster purity $purity%.2f below 0.9")
    // cluster_size is consistent with the assignment multiset
    val sizes = Similarity.kmeansCluster(corpus, k = 4, trainSample = 200)
      .select("cluster", "cluster_size").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val counted = out.groupBy(_._2).map { case (c, xs) => (c, xs.size.toLong) }
    assert(sizes === counted)
  }

  test("kmeansClusterDistributed equals the driver-fit assignments " +
    "on a separated corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat * 3f))
    val vecs = for { c <- centers.indices; m <- 0 until 50 } yield
      ((c * 50 + m).toLong,
        centers(c).map(v => v + 0.1f * rnd.nextGaussian().toFloat).toSeq)
    val corpus = vecs.toDF("vec_id", "embedding")
    // same init rule, same rounds; the distributed fit's 1e-6 centroid
    // quantization cannot flip an assignment on well-separated groups,
    // so the two operators must agree row for row — the "driver fits
    // the model" asterisk removed without changing answers
    val driver = Similarity.kmeansCluster(corpus, k = 4, trainSample = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dist = Similarity.kmeansClusterDistributed(corpus, k = 4, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dist == driver,
      "distributed Lloyd must reproduce the driver-fit clustering")
    // determinism across invocations (integer updates, md5-free argmin)
    val again = Similarity.kmeansClusterDistributed(corpus, k = 4, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == dist)
  }

  test("kCenterCoreset picks farthest points greedily, ties by max id") {
    import spark.implicits._
    // 1:(0,0) seeds; 2:(10,0) and 3:(0,10) tie at d2=100 (max id 3
    // wins round 2); round 3 takes 2 (dmin 100); 4:(1,1) never picked
    val emb = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(10f, 0f)),
      (3L, Seq(0f, 10f)), (4L, Seq(1f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.kCenterCoreset(emb, k = 3).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq((1L, 1L, None), (2L, 3L, Some(100000000L)),
      (3L, 2L, Some(100000000L))))
  }

  test("embeddingDrift: exact per-dim L1 drift and worst dimension") {
    import spark.implicits._
    // old (vec 0): [1.0, 2.0]; new (vec 1): [1.5, 2.0] ->
    // dim-1 drift 500000 scaled, dim-2 zero
    val emb = Seq((0L, Seq(1.0f, 2.0f)), (1L, Seq(1.5f, 2.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.embeddingDrift(emb,
      org.apache.spark.sql.functions.col("vec_id") % 2 === 0)
      .collect().head
    assert(r.getAs[Long]("n_dims") == 2L)
    assert(r.getAs[Long]("l1_drift_scaled") == 500000L)
    assert(r.getAs[Long]("max_dim_drift") == 500000L)
    assert(r.getAs[Long]("worst_dim") == 1L)
  }

  test("clusterQualityCard: tight separated clusters score near zero") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat * 3f))
    val vecs = for { c <- centers.indices; m <- 0 until 50 } yield
      ((c * 50 + m).toLong,
        centers(c).map(v => v + 0.1f * rnd.nextGaussian().toFloat).toSeq)
    val tight = Similarity.clusterQualityCard(
      vecs.toDF("vec_id", "embedding"), k = 4, iters = 5).collect()
    assert(tight.length == 4)
    assert(tight.map(_.getAs[Long]("size")).sum == 200L)
    // noise sd 0.1 vs centers sd 3: per-member s2 ≈ dim·0.01 scaled by
    // 1e6, separations ≈ dim·18e6 — worst ratio far under 10%
    tight.foreach { r =>
      assert(r.getAs[Long]("s2_scaled") > 0L)
      assert(r.getAs[Long]("worst_ratio_ppm") < 100000L,
        s"separated clusters must score tight: $r")
    }
    // 10x noisier corpus must score strictly worse on every cluster
    val loose = (for { c <- centers.indices; m <- 0 until 50 } yield
      ((c * 50 + m).toLong,
        centers(c).map(v => v + 1.0f * rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val looseWorst = Similarity.clusterQualityCard(loose, k = 4, iters = 5)
      .collect().map(_.getAs[Long]("worst_ratio_ppm")).min
    assert(looseWorst > tight.map(_.getAs[Long]("worst_ratio_ppm")).max,
      "noisier corpus must have worse separation ratios")
  }

  test("labelCentroids averages per (label, dim) in order-free fixed point") {
    import spark.implicits._
    val e = Seq(
      (0, Seq(1.0f, 3.0f)), (0, Seq(3.0f, 5.0f)), // label 0: centroid (2, 4)
      (1, Seq(-1.5f, 0.5f))                       // label 1: itself
    ).toDF("label", "embedding")
    val rows = Similarity.labelCentroids(e).orderBy("label", "dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows(0) == ((0, 1L, 2.0)) && rows(1) == ((0, 2L, 4.0)))
    assert(rows(2) == ((1, 1L, -1.5)) && rows(3) == ((1, 2L, 0.5)))
  }

  test("cosine of identical vectors is 1.0 exactly on unit-normalizable input") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .select(Similarity.cosineCol(col("a"), col("b")).as("c"))
    assert(math.abs(df.head.getDouble(0) - 1.0) < 1e-12)
  }

  test("quantizeInt8 maps to [-127,127] with per-vector scale; zero vector safe") {
    import spark.implicits._
    val e = Seq(
      (1L, Seq(2.0f, -4.0f, 1.0f)),  // scale 4: q = floor(63.5), -127, floor(31.75)
      (2L, Seq(0.0f, 0.0f, 0.0f))    // zero vector -> all-zero q
    ).toDF("vec_id", "embedding")
    val rows = Similarity.quantizeInt8(e).orderBy("vec_id").collect()
    assert(rows(0).getAs[Double]("scale") == 4.0)
    assert(rows(0).getAs[scala.collection.Seq[Long]]("q").toSeq == Seq(63L, -127L, 31L))
    assert(rows(1).getAs[Double]("scale") == 0.0)
    assert(rows(1).getAs[scala.collection.Seq[Long]]("q").toSeq == Seq(0L, 0L, 0L))
  }

  test("randomProject is deterministic, dOut-dimensional, and norm-preserving") {
    import spark.implicits._
    // deterministic pseudo-random 64-dim vectors (no Math.random in specs)
    def vec(seed: Int): Seq[Float] =
      (0 until 64).map(i => (((seed * 73 + i * 37) % 19) - 9) / 3.0f)
    val e = Seq((1L, vec(1)), (2L, vec(1)), (3L, vec(5))).toDF("vec_id", "embedding")
    val out = Similarity.randomProject(e, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(out.size == 3 * 16, "every vector must emit exactly dOut dims")
    // identical inputs -> identical projections, exactly
    (0 until 16).foreach(j => assert(out((1L, j.toLong)) == out((2L, j.toLong))))
    // E[||proj||^2] = ||v||^2 for sign-JL; at dOut=16 allow a loose 3x band
    val inNorm2 = vec(1).map(x => x.toDouble * x).sum
    val projNorm2 = (0 until 16).map(j => math.pow(out((1L, j.toLong)), 2)).sum
    assert(projNorm2 > inNorm2 / 3 && projNorm2 < inNorm2 * 3,
      s"norm must be approximately preserved ($projNorm2 vs $inNorm2)")
  }

  test("knnClassify takes the majority label with ties toward the smaller") {
    import spark.implicits._
    // query at (1,0): nearest 5 by cosine are the x-axis-ish vectors;
    // labels 2,2,1,1,9 -> tie 2v2 between labels 1 and 2 -> pick 1
    val labeled = Seq(
      (10L, Seq(1.0f, 0.01f), 2), (11L, Seq(1.0f, 0.02f), 2),
      (12L, Seq(1.0f, 0.03f), 1), (13L, Seq(1.0f, 0.04f), 1),
      (14L, Seq(1.0f, 0.05f), 9),
      (15L, Seq(0.0f, 1.0f), 7) // far away, outside k=5
    ).toDF("vec_id", "embedding", "label")
    val q = Seq((1L, Seq(1.0f, 0.0f))).toDF("query_id", "q_emb")
    val out = Similarity.knnClassify(labeled, q, 5).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Int]("pred_label") == 1)
    assert(out(0).getAs[Long]("votes") == 2L)
  }

  test("standardize z-scores per dimension; constant dims go to zero") {
    import spark.implicits._
    val e = Seq(
      (1L, Seq(1.0f, 5.0f)),
      (2L, Seq(3.0f, 5.0f))).toDF("vec_id", "embedding")
    val out = Similarity.standardize(e).orderBy("vec_id", "dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // dim 1: mean 2, sd 1 -> z = -1, +1 exactly (integer fixed point);
    // dim 2: zero variance -> 0 by convention
    assert(out.toSeq == Seq(
      (1L, 1L, -1.0), (1L, 2L, 0.0), (2L, 1L, 1.0), (2L, 2L, 0.0)))
  }

  test("gramMatrix matches a driver-side exact computation") {
    import spark.implicits._
    val e = Seq(
      (1L, Seq(0.5f, -1.25f, 2.0f)),
      (2L, Seq(1.0f, 0.25f, -0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.gramMatrix(e).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val rows = Seq(Seq(0.5, -1.25, 2.0), Seq(1.0, 0.25, -0.5))
    for (i <- 0 until 3; j <- i until 3) {
      val want = rows.map(v => math.floor(v(i) * v(j) * 1e6).toLong).sum
      assert(out((i, j)) == want, s"cell ($i,$j)")
    }
    assert(out.size == 6)
  }

  test("jacobiEigen diagonalizes; pcaWhiten output has unit variance, " +
    "decorrelated dims") {
    // covariance with a known dominant direction
    val a = Array(Array(4.0, 2.0), Array(2.0, 3.0))
    val (vals, vecs) = Similarity.jacobiEigen(a)
    // eigenvalues of [[4,2],[2,3]]: (7±sqrt(17))/2
    val want = Seq((7.0 + math.sqrt(17)) / 2, (7.0 - math.sqrt(17)) / 2)
    assert(vals.sorted.reverse.zip(want).forall { case (g, w) =>
      math.abs(g - w) < 1e-9 })
    // columns orthonormal
    for (c <- 0 until 2) {
      val nrm = math.sqrt(vecs.map(r => r(c) * r(c)).sum)
      assert(math.abs(nrm - 1.0) < 1e-9)
    }
    // whiten a correlated 2-d cloud: sample covariance of the projection
    // must be ~identity (unit variance, zero cross-correlation)
    import spark.implicits._
    val pts = (0 until 200).map { t =>
      val u = math.sin(t * 0.7) * 2.0
      val v = math.cos(t * 1.3)
      (t.toLong, Seq((u + v).toFloat, (u - v).toFloat))
    }.toDF("vec_id", "embedding")
    val proj = Similarity.pcaWhiten(pts, k = 2).collect()
      .map(r => r.getSeq[Double](1))
    val n = proj.length.toDouble
    val m0 = proj.map(_(0)).sum / n
    val m1 = proj.map(_(1)).sum / n
    val c00 = proj.map(p => (p(0) - m0) * (p(0) - m0)).sum / n
    val c11 = proj.map(p => (p(1) - m1) * (p(1) - m1)).sum / n
    val c01 = proj.map(p => (p(0) - m0) * (p(1) - m1)).sum / n
    assert(math.abs(c00 - 1.0) < 0.05, s"var0 $c00")
    assert(math.abs(c11 - 1.0) < 0.05, s"var1 $c11")
    assert(math.abs(c01) < 0.05, s"cross $c01")
  }

  test("recallAtK counts intersections per query plus a micro-average") {
    import spark.implicits._
    val truth = Seq((1L, 1L, 10L), (1L, 2L, 11L), (2L, 1L, 12L),
      (2L, 2L, 13L)).toDF("query_id", "rank", "neighbor_id")
    val pred = Seq((1L, 1L, 10L), (1L, 2L, 99L), (2L, 1L, 12L),
      (2L, 2L, 13L)).toDF("query_id", "rank", "neighbor_id")
    val r = Similarity.recallAtK(pred, truth).collect()
      .map(x => x.getAs[Long]("query_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_hit") == 1L)
    assert(r(1L).getAs[Long]("recall_ppm") == 500000L)
    assert(r(2L).getAs[Long]("n_hit") == 2L)
    assert(r(2L).getAs[Long]("recall_ppm") == 1000000L)
    assert(r(-1L).getAs[Long]("n_truth") == 4L)
    assert(r(-1L).getAs[Long]("n_hit") == 3L)
    assert(r(-1L).getAs[Long]("recall_ppm") == 750000L)
  }

  test("recallAtK measures lsh-vs-brute recall >= 0.8 on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val vecs = for { c <- centers.indices; m <- 0 until 20 }
      yield ((c * 20 + m).toLong,
        centers(c).map(v => v + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    val corpus = vecs.toDF("vec_id", "embedding")
    val qs = corpus.filter($"vec_id" % 20 === 0).limit(4)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val overall = Similarity.recallAtK(
      Similarity.lshTopK(corpus, qs, k = 10),
      Similarity.bruteTopK(corpus, qs, k = 10))
      .filter($"query_id" === -1L).collect().head
    assert(overall.getAs[Long]("n_truth") == 40L)
    assert(overall.getAs[Long]("recall_ppm") >= 800000L,
      s"recall ${overall.getAs[Long]("recall_ppm")} ppm below 0.8")
  }

  test("truncationEval reports exact prefix energy shares") {
    import spark.implicits._
    // front-loaded vectors: energy 4+1 in dims 1-2, tail zero
    val emb = Seq(
      (1L, Array(2.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(2.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Similarity.truncationEval(emb, dims = Seq(1, 2, 4))
      .orderBy("dim").collect()
      .map(x => (x.getAs[Long]("dim"), x.getAs[Long]("energy_scaled"),
        x.getAs[Long]("energy_ppm")))
    // per vector: floor(4e6) + floor(1e6) = 5e6; two vectors -> 10e6
    assert(r(0) == (1L, 8000000L, 800000L))
    assert(r(1) == (2L, 10000000L, 1000000L))
    assert(r(2) == (4L, 10000000L, 1000000L))
  }

  test("mmrSelect trades relevance for diversity with exact integer scores") {
    import spark.implicits._
    // doc 1 and 2 share a direction (cos exactly 1.0), doc 3 orthogonal
    val sl = Seq(
      (9L, 1L, 3L, Array(1.0f, 0.0f)),
      (9L, 2L, 2L, Array(2.0f, 0.0f)),
      (9L, 3L, 1L, Array(0.0f, 1.0f))
    ).toDF("query_id", "doc_id", "rel", "d_emb")
    // lambda = 1/3: pick1 = best rel (doc 1); pick2: doc2 scores
    // 2e6 - 2*1e6 = 0 < doc3's 1e6 -> diversity wins; pick3 = doc2
    val out = Similarity.mmrSelect(sl, k = 3, lamNum = 1L, lamDen = 2L)
      .collect().map(r => r.getAs[Long]("pick") -> r.getAs[Long]("doc_id"))
      .toMap
    assert(out === Map(1L -> 1L, 2L -> 3L, 3L -> 2L))
    // with relevance-heavy lambda the redundant doc 2 comes second
    val rel = Similarity.mmrSelect(sl, k = 2, lamNum = 7L, lamDen = 3L)
      .collect().map(r => r.getAs[Long]("pick") -> r.getAs[Long]("doc_id"))
      .toMap
    assert(rel === Map(1L -> 1L, 2L -> 2L))
  }

  test("mmrSelect refuses a shortlist over the two-stage bound") {
    import spark.implicits._
    val sl = Seq(
      (9L, 1L, 3L, Array(1.0f, 0.0f)),
      (9L, 2L, 2L, Array(2.0f, 0.0f)),
      (9L, 3L, 1L, Array(0.0f, 1.0f))
    ).toDF("query_id", "doc_id", "rel", "d_emb")
    val ex = intercept[IllegalArgumentException] {
      Similarity.mmrSelect(sl, k = 2, maxShortlistRows = 2L)
    }
    assert(ex.getMessage.contains("two-stage"),
      s"fence message should name the contract: ${ex.getMessage}")
  }


  test("ivfPqTopK recall >= 0.8 vs brute force on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val vecs = for { c <- centers.indices; m <- 0 until 20 }
      yield ((c * 20 + m).toLong,
        centers(c).map(v => v + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    val corpus = vecs.toDF("vec_id", "embedding")
    val qs = corpus.filter($"vec_id" % 20 === 0).limit(4)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
    val overall = Similarity.recallAtK(
      Similarity.ivfPqTopK(corpus, qs, k = 10),
      Similarity.bruteTopK(corpus, qs, k = 10))
      .filter($"query_id" === -1L).collect().head
    assert(overall.getAs[Long]("recall_ppm") >= 800000L,
      s"ivfpq recall ${overall.getAs[Long]("recall_ppm")} ppm below 0.8")
  }

  test("ivfPqTopK surfaces a planted identical copy at rank 1") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val base = (0L until 200L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq))
    val corpus = (base ++ base.take(3).map { case (i, e) => (i + 1000L, e) })
      .toDF("vec_id", "embedding")
    val qs = base.take(3)
      .map { case (i, e) => (i, e) }.toDF("query_id", "q_emb")
    val top1 = Similarity.ivfPqTopK(corpus, qs, k = 5)
      .filter($"rank" === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(top1 === Map(0L -> 1000L, 1L -> 1001L, 2L -> 1002L))
  }

  test("embeddingOutliers flags the planted far vector, integer-exact") {
    import spark.implicits._
    // label 0: eight near-origin vectors + one far outlier (with few
    // points the outlier dominates the mean and d2 <= k2*mean always
    // holds; 8 inliers put the outlier at ~9x the mean)
    val inliers = (1L to 8L).map(i =>
      (i, Seq((i % 3).toFloat * 0.1f, (i % 2).toFloat * 0.1f), 0))
    val rows = (inliers.toSeq ++ Seq(
      (9L, Seq(9.0f, 9.0f), 0),
      (10L, Seq(1.0f, 1.0f), 1))) // singleton label: d2 = 0, not outlier
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingOutliers(rows).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(9L)._2, "far vector flagged")
    (1L to 8L).foreach(i => assert(!out(i)._2, s"inlier $i not flagged"))
    assert(out(10L) == ((0L, false)))
    // hand check vec 1's distance against the floored integer centroid
    val v6 = (1L to 8L).map(i =>
      ((i % 3) * 100000L, (i % 2) * 100000L)) :+ (9000000L, 9000000L)
    val c = (v6.map(_._1).sum / 9L, v6.map(_._2).sum / 9L)
    val d1 = (v6.head._1 - c._1) * (v6.head._1 - c._1) +
      (v6.head._2 - c._2) * (v6.head._2 - c._2)
    assert(out(1L)._1 == d1)
  }

  test("isotropyCard matches the pairwise-sum identity by hand") {
    import spark.implicits._
    // v1 = (1, 0), v2 = (0, 1): dot = 0 -> mean_dot 0, anisotropy 0
    val ortho = Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val o = Similarity.isotropyCard(ortho).collect().head
    assert(o.getAs[Long]("n") == 2L)
    assert(o.getAs[Double]("mean_norm2") == 1.0)
    assert(o.getAs[Double]("mean_dot") == 0.0)
    // collapsed cone: identical unit vectors -> anisotropy 1
    val same = Seq((1L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0),
      (3L, Seq(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val s = Similarity.isotropyCard(same).collect().head
    assert(s.getAs[Double]("anisotropy") == 1.0)
  }

  test("labelNoiseAudit flags the planted mislabel, not the clean probe") {
    import spark.implicits._
    // two tight clusters in 2-D; vec 0 sits in cluster A but wears
    // label 9 (the plant); vec 17 sits in cluster B with B's label
    val rows =
      Seq((0L, Seq(1.0f, 0.01f), 9)) ++                    // planted probe
        (1 to 6).map(i => (i.toLong, Seq(1.0f, i * 0.001f), 1)) ++
        Seq((17L, Seq(-1.0f, 0.02f), 2)) ++                // clean probe
        (18 to 23).map(i => (i.toLong, Seq(-1.0f, i * 0.001f), 2))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.labelNoiseAudit(emb, k = 5, sampleMod = 17)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getAs[Boolean]("flagged"))).toMap
    assert(out.keySet == Set(0L, 17L), "probes are the id-sample only")
    assert(out(0L) == ((9L, 1L, 0L, true)), "majority label 1 beats the plant")
    assert(out(17L)._1 == 2L && out(17L)._2 == 2L && !out(17L)._4)
    assert(out(17L)._3 >= 5L, "clean probe's neighbors all agree")
  }
}
