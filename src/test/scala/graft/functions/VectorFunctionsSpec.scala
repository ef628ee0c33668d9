package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style checks of the native expressions' algebraic guarantees,
  * driven through SQL (the registration path users hit).
  */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(123)
  private def randomDoc(n: Int): String =
    Seq.fill(n)("w" + rnd.nextInt(40)).mkString(" ")

  test("winnowing guarantee: any shared run of >= w+k-1 tokens shares a fingerprint") {
    // k=3, w=4: shared runs of >= 6 tokens must produce a common selected hash
    val shared = Seq.fill(6)("s" + rnd.nextInt(1000)).mkString(" ")
    val pairs = (1 to 20).map { i =>
      (i.toLong, s"${randomDoc(10)} $shared ${randomDoc(10)}",
        s"${randomDoc(12)} $shared ${randomDoc(8)}")
    }
    val df = pairs.toDF("id", "a", "b").selectExpr(
      "id", "graft_winnow(a, 3, 4) AS fa", "graft_winnow(b, 3, 4) AS fb")
    df.collect().foreach { r =>
      val fa = r.getAs[scala.collection.Seq[Long]]("fa").toSet
      val fb = r.getAs[scala.collection.Seq[Long]]("fb").toSet
      assert((fa & fb).nonEmpty, s"pair ${r.getLong(0)} shared no fingerprint")
    }
  }

  test("minhash signature agreement estimates Jaccard within tolerance") {
    // doc pairs with known shingle-set overlap via shared prefixes
    val base = Seq.fill(60)("t" + rnd.nextInt(10000))
    val a = base.mkString(" ")                             // full set
    val b = (base.take(45) ++ Seq.fill(15)("u" + rnd.nextInt(10000))).mkString(" ")
    val df = Seq((a, b)).toDF("a", "b").selectExpr(
      "graft_minhash(graft_shingles(a, 3), 128) AS sa",
      "graft_minhash(graft_shingles(b, 3), 128) AS sb",
      "graft_shingles(a, 3) AS sha", "graft_shingles(b, 3) AS shb")
    val r = df.head
    val sa = r.getAs[scala.collection.Seq[Long]]("sa")
    val sb = r.getAs[scala.collection.Seq[Long]]("sb")
    val sha = r.getAs[scala.collection.Seq[String]]("sha").toSet
    val shb = r.getAs[scala.collection.Seq[String]]("shb").toSet
    val trueJ = (sha & shb).size.toDouble / (sha | shb).size
    val estJ = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.size
    assert(math.abs(trueJ - estJ) < 0.15, f"true $trueJ%.3f vs est $estJ%.3f")
  }

  test("signatures and buckets are stable across separate evaluations") {
    val docs = (1 to 50).map(i => (i.toLong, randomDoc(30))).toDF("doc_id", "text")
    def sigs() = docs.selectExpr("doc_id",
      "graft_minhash(graft_shingles(text, 3), 32) AS sig",
      "graft_simhash(array_distinct(split(trim(text), '\\\\s+'))) AS sh")
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Long]](1).toSeq, r.getLong(2))).toSeq
    assert(sigs() == sigs())
    val emb = (1 to 20).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    def buckets() = emb.selectExpr("vec_id",
      "graft_signbuckets(embedding, 5, 12) AS b")
      .collect().map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Long]](1).toSeq)).toSeq
    assert(buckets() == buckets())
  }

  test("graft_dot equals the HOF aggregate formulation bit-for-bit") {
    val df = (1 to 30).map(i =>
      (Seq.fill(16)(rnd.nextFloat()), Seq.fill(16)(rnd.nextFloat())))
      .toDF("a", "b")
    val both = df.selectExpr(
      "graft_dot(a, b) AS nat",
      "aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), " +
        "cast(0 as double), (acc, v) -> acc + v) AS hof")
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("graft_eqfrac matches the zip_with/filter formulation exactly") {
    val df = (1 to 30).map(_ =>
      (Seq.fill(32)(rnd.nextLong(8)), Seq.fill(32)(rnd.nextLong(8))))
      .toDF("a", "b")
    df.selectExpr(
      "graft_eqfrac(a, b) AS nat",
      "cast(size(filter(zip_with(a, b, (x, y) -> x = y), v -> v)) as double) / 32.0 AS hof")
      .collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("graft_bandbuckets: equal slices collide, differing slices (almost surely) do not") {
    val sig = Seq.fill(32)(rnd.nextLong())
    val sameBand0 = sig.take(4) ++ Seq.fill(28)(rnd.nextLong())   // band 0 slice equal
    val allDiff = Seq.fill(32)(rnd.nextLong())
    val df = Seq((sig, sameBand0, allDiff)).toDF("a", "b", "c").selectExpr(
      "graft_bandbuckets(a, 8) AS ba",
      "graft_bandbuckets(b, 8) AS bb",
      "graft_bandbuckets(c, 8) AS bc")
    val r = df.head
    val ba = r.getAs[scala.collection.Seq[Long]]("ba")
    val bb = r.getAs[scala.collection.Seq[Long]]("bb")
    val bc = r.getAs[scala.collection.Seq[Long]]("bc")
    assert(ba.size == 8)
    assert(ba(0) == bb(0), "equal band-0 slices must share a bucket")
    assert(ba.tail != bb.tail, "differing slices must not all collide")
    assert(ba.zip(bc).forall { case (x, y) => x != y })
    // determinism across evaluations
    assert(df.head.getAs[scala.collection.Seq[Long]]("ba") == ba)
  }

  test("graft_bandbuckets rejects a signature length not divisible by bands") {
    val df = Seq(Seq.fill(30)(rnd.nextLong())).toDF("sig")
      .selectExpr("graft_bandbuckets(sig, 8) AS b")
    val e = intercept[Exception](df.collect())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("not divisible")),
      s"expected a divisibility error, got $e")
  }

  test("graft_tokstats matches the split/filter/array_distinct formulation") {
    val df = Seq(
      "the cat sat on the mat for a while",
      "",               // empty text → one empty token, like split(trim(x))
      "  padded   whitespace the the  ",
      "nostopwordshere atall").toDF("text")
    val stops = "the,a,of,and,to,in,is,it,that,for"
    val rows = df.selectExpr(
      s"graft_tokstats(text, '$stops') AS st",
      "size(split(trim(text), '\\\\s+')) AS n_tokens_ref",
      s"size(filter(split(trim(text), '\\\\s+'), x -> x in (${stops.split(",").map("'" + _ + "'").mkString(",")}))) AS n_stop_ref",
      "size(array_distinct(split(trim(text), '\\\\s+'))) AS n_distinct_ref")
      .collect()
    rows.foreach { r =>
      val st = r.getStruct(0)
      assert(st.getLong(0) == r.getAs[Int]("n_tokens_ref").toLong)
      assert(st.getLong(1) == r.getAs[Int]("n_stop_ref").toLong)
      assert(st.getLong(2) == r.getAs[Int]("n_distinct_ref").toLong)
    }
  }

  test("empty and sub-n inputs yield empty signatures, not errors") {
    val df = Seq((1L, ""), (2L, "one two")).toDF("id", "text")
      .selectExpr("id", "graft_shingles(text, 3) AS sh", "graft_winnow(text, 3, 4) AS w")
    df.collect().foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("sh").isEmpty)
      assert(r.getAs[scala.collection.Seq[Long]]("w").isEmpty)
    }
  }
}
