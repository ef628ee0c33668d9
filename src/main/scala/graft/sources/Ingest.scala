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
}
