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
}
