package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads travel as opaque `binary`
  * columns with typed metadata, and expensive per-item work (decode,
  * resize, frame-sample) runs batched inside `mapPartitions` so one task
  * amortizes decoder setup over its whole partition — the Scala analogue
  * of a batched Pandas UDF.
  *
  * The sandbox has no image/audio codecs, so [[StubDecoder]] is a
  * clearly-marked deterministic fake; the Spark-side plumbing (schema,
  * partitioning, batch shape) is real and is what the tests cover.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           checksum: String)

  /** STUB — deterministic fake decoder standing in for a real codec
    * (libjpeg / ffmpeg are absent in this container). Derives plausible
    * dimensions from payload bytes so downstream plumbing is testable.
    * A production build swaps only this object.
    */
  object StubDecoder {
    def decode(mime: String, payload: Array[Byte]): (Int, Int, Int) = {
      val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      val frames = if (mime.startsWith("video/")) 1 + (payload.length % 30) else 1
      (64 + b0 % 1024, 64 + b1 % 1024, frames)
    }
  }

  /** Wrap a text corpus as binary media records (utf-8 payloads) — the
    * shape a real pipeline gets from raw object-store bytes.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime"),
      encode(col("text"), "utf-8").as("payload"))

  /** Batched feature extraction: one decoder instance per partition, rows
    * streamed through it. No driver collect; output is a typed Dataset.
    */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition decoder setup would happen here (amortized)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { rec =>
        val (w, h, f) = StubDecoder.decode(rec.mime, rec.payload)
        md.reset()
        val sum = md.digest(rec.payload).map("%02x".format(_)).mkString
        MediaFeatures(rec.media_id, rec.mime, rec.payload.length.toLong, w, h, f, sum)
      }
    }
  }

  case class ResizedMedia(media_id: Long, mime: String, src_width: Int,
                          src_height: Int, width: Int, height: Int,
                          n_bytes: Long, checksum: String)

  /** Resize plumbing: decode once per item inside `mapPartitions`, scale
    * the longer side down to `maxDim` (never upscale) preserving aspect
    * ratio, and emit the transformed payload's metadata. The pixel
    * transform itself is a STUB (no codec in this container — the payload
    * stands in truncated proportionally to the area ratio); the schema,
    * batching, and aspect math are the real plumbing a production scaler
    * drops into.
    */
  def resize(media: DataFrame, maxDim: Int = 256)
            (implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { rec =>
        val (w, h, _) = StubDecoder.decode(rec.mime, rec.payload)
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val (nw, nh) = (math.max(1, math.round(w * scale).toInt),
          math.max(1, math.round(h * scale).toInt))
        // STUB payload transform: length shrinks with the area ratio
        val outLen = math.max(1, (rec.payload.length * scale * scale).toInt)
        val out = java.util.Arrays.copyOf(rec.payload, outLen)
        md.reset()
        ResizedMedia(rec.media_id, rec.mime, w, h, nw, nh, outLen.toLong,
          md.digest(out).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Perceptual-hash stand-in over the raw payload BYTES (blockhash/PDQ
    * family shape): split the payload into `blocks` equal byte ranges,
    * digest each, keep one hex nibble per block, and pack the nibbles
    * into a single BIGINT signature. Equal payloads always collide; a
    * localized byte edit flips exactly the nibbles of the blocks it
    * touches, so nibble-aligned bit hamming measures how MUCH of the
    * payload changed — the plumbing a real DCT perceptual hash drops
    * into (swap the per-block digest for a frequency-domain feature).
    *
    * 14 blocks × 4 bits = 56 bits: the top nibble's weight 16^13 stays
    * far below 2^63, so the packed signature never overflows signed
    * BIGINT in any engine. Single narrow projection — no shuffle, no
    * UDF; every digest is md5-prefix so the signature is engine-portable
    * (the DuckDB twin rebuilds it from the text form of the payload).
    */
  def blockHashSignature(media: DataFrame, blocks: Int = 14): DataFrame = {
    val sig = (0 until blocks).map { b =>
      s"""CAST(conv(substr(md5(substring(payload,
         | CAST($b * blkw + 1 AS INT), CAST(blkw AS INT))), 1, 1),
         | 16, 10) AS BIGINT) * ${math.pow(16, b).toLong}L""".stripMargin
    }.mkString(" + ")
    media
      .withColumn("blkw",
        expr(s"(octet_length(payload) + ${blocks - 1}) div $blocks"))
      .withColumn("sig", expr(sig))
      .select(col("media_id"), col("sig"))
  }

  /** Media near-dup pairs at bit-hamming <= `maxHamming` over
    * [[blockHashSignature]]s — the image/audio twin of
    * [[graft.ops.Dedup.simHash]]: signatures split into `chunks` 8-bit
    * chunks, candidates share at least one chunk value (pigeonhole: with
    * 7 chunks every pair at hamming <= 6 shares an untouched chunk, so
    * the candidate join is EXHAUSTIVE for the default threshold — the
    * pair set is exact, not approximate). Shuffles are keyed on
    * (chunk_idx, chunk_value) and the pair key; nothing corpus-sized
    * funnels through one reducer.
    */
  def mediaNearDup(media: DataFrame, maxHamming: Int = 4,
                   blocks: Int = 14, chunks: Int = 7): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    // the signature projection runs 14 md5 digests over payload slices;
    // the chunk self-join references it from BOTH sides, so materialize
    // the (media_id, sig) frame once — payloads are digested exactly
    // once and the join reads the tiny long-pair RDD (r15: the plan
    // re-decoded every payload twice, 6 parquet scans → 1 digest pass)
    val sigs = blockHashSignature(media, blocks).localCheckpoint(true)
    val chunked = sigs.select(col("media_id"), col("sig"),
      explode(array((0 until chunks).map(c =>
        struct(lit(c).as("c"),
          expr(s"(sig div ${math.pow(256, c).toLong}L) % 256L").as("v"))
      ): _*)).as("ch"))
      .select(col("media_id"), col("sig"),
        col("ch.c").as("c"), col("ch.v").as("v"))
    chunked.as("a").join(chunked.as("b"),
        col("a.c") === col("b.c") && col("a.v") === col("b.v") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"),
        expr("bit_count(a.sig ^ b.sig)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  case class FrameSample(media_id: Long, frame_idx: Int, width: Int,
                         height: Int, frame_md5: String)

  /** Frame sampling: decode each media item once per partition, emit
    * every `everyNth` frame's features. The explode happens inside
    * `mapPartitions` so the (large) payload is decoded exactly once per
    * item and frames never materialize as whole-payload copies.
    */
  def sampleFrames(media: DataFrame, everyNth: Int = 10)
                  (implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { rec =>
        val (w, h, frames) = StubDecoder.decode(rec.mime, rec.payload)
        (0 until frames by everyNth).iterator.map { idx =>
          md.reset()
          md.update(rec.payload)
          // STUB: frame bytes stand-in = payload + frame index
          md.update(idx.toByte)
          FrameSample(rec.media_id, idx, w, h,
            md.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Payload metadata as pure column expressions (oracle-checkable):
    * byte length + md5 checksum per media item.
    */
  def payloadMeta(docs: DataFrame): DataFrame =
    asMedia(docs).select(
      col("media_id"),
      col("mime"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("checksum"))

  /** Mixed-mime wrapper: every third document poses as a (multi-frame)
    * video payload, the rest as stills — the fixture shape for the
    * frame-sampling path.
    */
  def asMediaMixed(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("video/mp4"))
        .otherwise(lit("image/png")).as("mime"),
      encode(col("text"), "utf-8").as("payload"))

  /** Frame-sampling PLAN as pure column expressions — the
    * oracle-checkable twin of [[sampleFrames]]: the same frame count
    * the [[StubDecoder]] derives (videos carry `1 + n_bytes % 30`
    * frames, stills one), the same every-`everyNth` stride, one row per
    * sampled frame with an engine-portable frame fingerprint
    * (md5 over media_id : frame_idx : payload-md5 — a real pipeline
    * swaps the fingerprint for decoded-frame features; the row shape,
    * stride, and partitioning are what downstream batch-embedding
    * consumes either way).
    *
    * Scale shape: one narrow projection plus a bounded explode (≤ 30/
    * everyNth rows per video, 1 per still) — no shuffle at all; the
    * downstream embedding batcher repartitions as it likes.
    */
  def framePlan(media: DataFrame, everyNth: Int = 10): DataFrame = {
    require(everyNth >= 1)
    media
      .withColumn("n_frames",
        when(col("mime").startsWith("video/"),
          lit(1L) + expr("octet_length(payload) % 30"))
          .otherwise(lit(1L)).cast("long"))
      .withColumn("frame_idx",
        explode(expr(s"sequence(0L, n_frames - 1, ${everyNth}L)")))
      .select(col("media_id"), col("mime"), col("n_frames"),
        col("frame_idx").cast("long").as("frame_idx"),
        md5(concat(col("media_id").cast("string"), lit(":"),
          col("frame_idx").cast("string"), lit(":"),
          md5(col("payload")))).as("frame_hash"))
  }

  /** Cross-modal alignment-score card — the CLIP-score filtering shape
    * (keep image/text pairs whose embeddings agree) with the media
    * ENCODER stubbed and every downstream step real. The stub projects
    * the payload to `dims` int8 features via md5-prefix hashes
    * (`(h_j % 255) − 127` per salted digest — deterministic and
    * engine-portable; a production build swaps exactly this projection
    * for the vision tower's output). The text side rides
    * [[Similarity.quantizeInt8]]'s int8 embedding, so the alignment
    * score is a pure BIGINT dot product — order-free exact — and the
    * keep/drop gate (`score >= 0`) is the decision a real CLIP-filter
    * makes against a tuned threshold. Plumbing is one 1:1 equi-join
    * (media_id = vec_id — bucketable on the shared key at scale) plus a
    * narrow projection: no shuffle beyond the join, no UDF, the
    * per-row md5 chain stays in codegen like the phash path.
    */
  def alignScore(media: DataFrame, embeddings: DataFrame,
                 dims: Int = 16): DataFrame = {
    require(dims >= 1 && dims <= 64)
    val q = graft.ops.Similarity.quantizeInt8(embeddings)
      .select(col("vec_id"), col("q"))
    val score = (0 until dims).map { j =>
      val f = conv(substring(md5(concat(col("payload").cast("string"),
        lit(s":$j"))), 1, 8), 16, 10).cast("long") % 255 - 127
      element_at(col("q"), j + 1) * f
    }.reduce(_ + _)
    media.join(q, media("media_id") === q("vec_id"))
      .select(col("media_id"),
        expr("octet_length(payload)").cast("long").as("n_bytes"),
        score.as("align_score"))
      .withColumn("keep", col("align_score") >= 0L)
  }
}
