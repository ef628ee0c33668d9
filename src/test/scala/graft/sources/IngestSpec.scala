package graft.sources

import graft.SparkSpec

class IngestSpec extends SparkSpec {
  import spark.implicits._

  // the adversarial corpus: quotes, embedded newlines, commas,
  // backslashes, unicode, leading/trailing space, empty string
  private def nasty = Seq(
    (1L, "plain text"),
    (2L, "comma, separated, values"),
    (3L, "a \"quoted\" phrase"),
    (4L, "line one\nline two\nline three"),
    (5L, "back\\slash and tab\there"),
    (6L, "unicode: é中文 😀"),
    (7L, "  padded  "),
    (8L, "")).toDF("doc_id", "text")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("jsonlRoundTrip preserves every adversarial string exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ingest_jsonl").toString
    assert(asMap(Ingest.jsonlRoundTrip(nasty, dir)) === asMap(nasty))
  }

  test("csvRoundTrip preserves every adversarial string exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ingest_csv").toString
    assert(asMap(Ingest.csvRoundTrip(nasty, dir)) === asMap(nasty))
  }

  test("orcRoundTrip preserves every adversarial string and the schema") {
    val dir = java.nio.file.Files.createTempDirectory("ingest_orc").toString
    val back = Ingest.orcRoundTrip(nasty, dir)
    // file sources relax every field to nullable on read (the scan can't
    // prove absence of nulls) — fidelity here means names + types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      nasty.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(asMap(back) === asMap(nasty))
  }

  test("binaryRoundTrip lands one row per file with exact byte fidelity") {
    val dir = java.nio.file.Files.createTempDirectory("ingest_bin").toString
    // non-empty payloads only (a 0-byte media file is a broken upload);
    // unicode proves the length column is BYTES, not characters
    val docs = nasty.filter("doc_id <> 8")
    val back = Ingest.binaryRoundTrip(docs, dir, maxDocs = 100)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("length"), r.getString(2))).toMap
    val want = docs.collect().map { r =>
      val bytes = r.getString(1)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      r.getLong(0) -> (bytes.length.toLong,
        java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString)
    }.toMap
    assert(back === want)
    assert(back(6L)._1 > "unicode: é中文 😀".length,
      "length is UTF-8 bytes, not chars")
  }
}
