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
}
