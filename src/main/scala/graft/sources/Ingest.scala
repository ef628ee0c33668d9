package graft.sources

import org.apache.spark.sql.DataFrame

/** Text-format ingestion front doors: JSONL and CSV, the two interchange
  * formats crawl dumps and vendor feeds actually arrive in. Each round
  * trip (write → read back under the explicit schema) is the PROOF
  * obligation the registered `load_jsonl`/`load_csv` queries check
  * hash-exactly: quotes, embedded newlines, and unicode must survive the
  * serializer/parser pair byte-for-byte, or every downstream checksum
  * dedup and fingerprint silently diverges between the lake and the
  * source of truth.
  *
  * Scale: JSONL is THE splittable shape — the writer escapes newlines
  * inside values (`\n`), so a reader task can split files at any raw
  * line boundary and both directions run at full scan parallelism with
  * zero shuffles. CSV with embedded newlines is the compat path only:
  * `multiLine=true` forces whole-file parsing (parallelism collapses to
  * the file count — acceptable here because the write side already
  * emits one file per upstream partition, but a single 100 GB vendor
  * CSV would serialize; re-shard or convert to JSONL first).
  */
object Ingest {

  /** Dump `df` as JSON Lines under `stagingDir` and read it back with
    * df's own schema (schema inference on 100 TB means a second full
    * scan — never infer what is already known).
    */
  def jsonlRoundTrip(df: DataFrame, stagingDir: String): DataFrame = {
    df.write.mode("overwrite").json(stagingDir)
    df.sparkSession.read.schema(df.schema).json(stagingDir)
  }

  /** Dump `df` as RFC-4180 CSV (header, `"`-escaped quotes) and read it
    * back under the explicit schema. `multiLine=true` on the read side
    * is what makes embedded newlines survive — see the object scaladoc
    * for the parallelism cost that option carries.
    *
    * Two default-semantics traps are pinned here (IngestSpec breaks if
    * either is dropped): the WRITER trims leading/trailing whitespace
    * by default (`ignoreLeading/TrailingWhiteSpace` default true on
    * write, false on read), and the READER folds `""` to null because
    * the read-side `nullValue` default is the empty string — a NUL
    * sentinel that cannot occur in text keeps empty-vs-null distinct in
    * both directions.
    */
  def csvRoundTrip(df: DataFrame, stagingDir: String): DataFrame = {
    df.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("nullValue", "\u0000")
      .csv(stagingDir)
    df.sparkSession.read.schema(df.schema)
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .option("nullValue", "\u0000")
      .csv(stagingDir)
  }

  /** Dump `df` as ORC and read it back under the explicit schema — the
    * OTHER columnar lake format (Hive-lineage warehouses interchange in
    * ORC the way crawl feeds interchange in JSONL). Unlike the text
    * round trips above there is no escaping obligation; the proof here
    * is type fidelity — ORC's own writer/reader pair must preserve
    * strings and integers bit-for-bit against the parquet source of
    * truth, or a lake migration silently corrupts every checksum.
    * Scale: ORC stripes are splittable and carry min/max indexes, so
    * read-side predicate pushdown and column pruning behave like
    * parquet — full scan parallelism, zero shuffles in either
    * direction.
    */
  def orcRoundTrip(df: DataFrame, stagingDir: String): DataFrame = {
    df.write.mode("overwrite").orc(stagingDir)
    df.sparkSession.read.schema(df.schema).orc(stagingDir)
  }

  /** Media-file ingestion seam: stage one raw payload file per document
    * and read the directory back through Spark's `binaryFile` source —
    * the front door a multimodal corpus (images, audio, arbitrary
    * blobs) actually arrives through, landing each file as one row of
    * (path, length, content BINARY) ready for the
    * [[graft.ops.Multimodal]] signature/near-dup ops. The id is parsed
    * from the file name (the path IS metadata — the lineage-stamp
    * convention); the payload integrity check is an md5 over the raw
    * bytes, which for UTF-8 text payloads equals md5 of the string in
    * any engine.
    *
    * Scale: binaryFile reads files in parallel across executors with
    * zero shuffles (one row per file; `pathGlobFilter` prunes at
    * listing time). The STAGING side here is a driver loop because it
    * fabricates the fixture; production payloads already sit in object
    * storage and only the read path runs.
    */
  def binaryRoundTrip(docs: DataFrame, stagingDir: String,
                      maxDocs: Int = 100): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = new java.io.File(stagingDir)
    if (dir.exists()) dir.listFiles().foreach(_.delete())
    dir.mkdirs()
    // bounded: maxDocs fixture payloads staged from the driver
    docs.filter(col("doc_id") < maxDocs).select("doc_id", "text")
      .collect().foreach { r =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(stagingDir, f"${r.getLong(0)}%06d.bin"),
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    docs.sparkSession.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin").load(stagingDir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long")
          .as("doc_id"),
        col("length"), md5(col("content")).as("payload_md5"))
  }
}
