package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, encode, lit}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello multimodal world"),
    (2L, "short"),
    (3L, "")
  ).toDF("doc_id", "text")

  test("asMedia wraps text as binary payloads with mime metadata") {
    val m = Multimodal.asMedia(docs).orderBy("media_id").collect()
    assert(m.map(_.getString(1)).forall(_ == "text/plain"))
    assert(new String(m(0).getAs[Array[Byte]]("payload"), "UTF-8") ==
      "hello multimodal world")
  }

  test("sampleFrames decodes once and emits every nth frame") {
    implicit val s = spark
    val media = Seq(
      (1L, "video/fake", Array.fill[Byte](25)(7)), // 1 + 25 % 30 = 26 frames
      (2L, "text/plain", Array[Byte](1, 2, 3))     // non-video: 1 frame
    ).toDF("media_id", "mime", "payload")
    val frames = Multimodal.sampleFrames(media, everyNth = 10).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    assert(frames.count(_.media_id == 1L) == 3) // frames 0, 10, 20
    assert(frames.count(_.media_id == 2L) == 1)
    assert(frames.map(_.frame_md5).distinct.length == frames.length,
      "frame checksums differ per frame index")
  }

  test("resize preserves aspect ratio, never upscales, shrinks payload by area") {
    implicit val s = spark
    val big = Array.fill[Byte](4096)(100)   // decodes to 164x164
    val tiny = Array[Byte](1, 2)            // decodes to 65x66 (< maxDim)
    val media = Seq(
      (1L, "image/fake", big),
      (2L, "image/fake", tiny)
    ).toDF("media_id", "mime", "payload")
    val out = Multimodal.resize(media, maxDim = 82).collect().sortBy(_.media_id)
    val r1 = out(0)
    assert(math.max(r1.width, r1.height) == 82, "longer side scaled to maxDim")
    assert(math.abs(r1.width.toDouble / r1.height -
      r1.src_width.toDouble / r1.src_height) < 0.05, "aspect preserved")
    assert(r1.n_bytes < 4096, "payload shrinks with area")
    val r2 = out(1)
    assert((r2.width, r2.height) == (r2.src_width, r2.src_height),
      "small media never upscaled")
    assert(r2.n_bytes == 2L)
  }

  test("extractFeatures runs batched per partition and is deterministic") {
    implicit val s = spark
    val feats = Multimodal.extractFeatures(Multimodal.asMedia(docs).repartition(2))
      .collect().sortBy(_.media_id)
    assert(feats.length == 3)
    assert(feats(0).n_bytes == "hello multimodal world".length)
    assert(feats(0).width >= 64 && feats(0).height >= 64 && feats(0).n_frames == 1)
    // checksum equals column-expression md5 of the same payload
    val metaSums = Multimodal.payloadMeta(docs).orderBy("media_id")
      .collect().map(_.getAs[String]("checksum"))
    assert(feats.map(_.checksum).toSeq == metaSums.toSeq)
    // deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.asMedia(docs).repartition(3))
      .collect().sortBy(_.media_id)
    assert(again.map(f => (f.width, f.height, f.checksum)).toSeq ==
      feats.map(f => (f.width, f.height, f.checksum)).toSeq)
  }

  test("blockHashSignature: equal payloads collide, local edits flip few bits") {
    import spark.implicits._
    val base = "x" * 140 // 14 blocks of 10 bytes
    val media = Seq(
      (1L, base), (2L, base),                       // exact copy
      (3L, base.dropRight(3) + "YYY"),              // last block perturbed
      (4L, base.map(c => ('a' + c % 7).toChar).mkString) // unrelated
    ).toDF("media_id", "text")
      .select(col("media_id"), lit("text/plain").as("mime"),
        encode(col("text"), "utf-8").as("payload"))
    val sigs = Multimodal.blockHashSignature(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L), "identical payloads must collide")
    val ham13 = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    assert(ham13 <= 4, s"one perturbed block flips at most one nibble ($ham13)")
    assert(sigs.values.forall(s => s >= 0L && s < (1L << 56)))
  }

  test("mediaNearDup pair set equals brute-force hamming over signatures") {
    import spark.implicits._
    val base = "some synthetic payload content repeated " * 5
    val rows = (0 until 20).map { i =>
      // 5 perturbed copies of doc 0, the rest distinct
      val text = if (i < 5) base.dropRight(3) + s"Y$i%02d" else base + s" tail unique $i " * 3
      (i.toLong, text)
    }
    val media = rows.toDF("media_id", "text")
      .select(col("media_id"), lit("text/plain").as("mime"),
        encode(col("text"), "utf-8").as("payload"))
    val sigs = Multimodal.blockHashSignature(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- 0L until 20L; b <- (a + 1) until 20L
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 4
    } yield (a, b)).toSet
    val got = Multimodal.mediaNearDup(media, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, "pigeonhole candidate join must be exhaustive")
    assert(brute.nonEmpty, "perturbed copies must produce near-dup pairs")
  }

  test("mediaNearDup pairs resolve copy families into one cluster each") {
    import spark.implicits._
    val a = "alpha payload body " * 8
    val b = "beta payload body completely different words " * 4
    val media = Seq(
      (1L, a), (2L, a), (3L, a.dropRight(2) + "ZZ"), // family A: exact + near
      (10L, b), (11L, b),                            // family B: exact
      (20L, a.reverse)                               // unrelated
    ).toDF("media_id", "text")
      .select(col("media_id"), lit("text/plain").as("mime"),
        encode(col("text"), "utf-8").as("payload"))
    val pairs = Multimodal.mediaNearDup(media, maxHamming = 4)
      .select(col("a_id"), col("b_id"))
    val clusters = Dedup.resolveClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(10L) == 10L && clusters(11L) == 10L)
    assert(!clusters.contains(20L), "unrelated media must stay a singleton")
  }

  test("framePlan matches the typed sampleFrames plumbing frame-for-frame") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Seq(
      (3L, "a video-length payload body with some words in it"),
      (6L, "x" * 95), // 95 bytes → 1 + 95 % 30 = 6 frames → idx 0 only
      (7L, "a still image payload"),
      (9L, "y" * 41)  // 41 bytes → 12 frames → idx 0, 10
    ).toDF("doc_id", "text")
    val media = Multimodal.asMediaMixed(docs)
    val plan = Multimodal.framePlan(media, 10)
      .select("media_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val typed = Multimodal.sampleFrames(media, 10).collect()
      .map(f => (f.media_id, f.frame_idx.toLong)).toSet
    assert(plan == typed, "pure plan and mapPartitions path must agree")
    // stills emit exactly frame 0; the 41-byte video emits 0 and 10
    assert(plan.filter(_._1 == 7L) == Set((7L, 0L)))
    assert(plan.filter(_._1 == 9L) == Set((9L, 0L), (9L, 10L)))
  }

  test("alignScore: deterministic BIGINT dot, 1:1 join, keep gate at zero") {
    val docs = Seq((0L, "hello world"), (1L, "another doc"),
      (5L, "no embedding for this one")).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs)
    val emb = Seq(
      (0L, (1 to 16).map(i => i.toFloat / 16f).toArray),
      (1L, (1 to 16).map(i => -i.toFloat / 16f).toArray))
      .toDF("vec_id", "embedding")
    val out = Multimodal.alignScore(media, emb, 16)
      .orderBy("media_id").collect()
    assert(out.length == 2, "docs without an embedding drop (inner join)")
    val r0 = out(0)
    assert(r0.getAs[Long]("n_bytes") == 11L)
    assert(r0.getAs[Boolean]("keep") ==
      (r0.getAs[Long]("align_score") >= 0L))
    val again = Multimodal.alignScore(media, emb, 16)
      .orderBy("media_id").collect()
    assert(out.map(_.getAs[Long]("align_score")).toSeq ==
      again.map(_.getAs[Long]("align_score")).toSeq,
      "md5 stub features are run-stable")
  }

  test("mediaNearDup digests each payload once: no md5 in the pair plan") {
    import spark.implicits._
    val media = (0 until 8).map(i => (i.toLong, s"payload body $i" * 10))
      .toDF("media_id", "text")
      .select(col("media_id"), lit("text/plain").as("mime"),
        encode(col("text"), "utf-8").as("payload"))
    // r15: the (media_id, sig) frame is materialized before the chunk
    // self-join, so the 14-per-row md5 signature expressions must be
    // absent from the composed pair plan (they ran once at checkpoint
    // time); a regression re-attaching the lazy signature chain to both
    // join sides would re-digest every payload twice
    val plan = Multimodal.mediaNearDup(media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("md5("),
      s"pair plan re-computes payload digests:\n$plan")
  }
}
