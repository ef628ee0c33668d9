package graft.sources

import graft.SparkSpec

class GraphFramesSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeNodes renames positionally and splits comma labels") {
    val df = Seq(
      (1L, "Person,Customer", "alice", 10.5),
      (2L, "Person", "bob", 20.0)
    ).toDF("id", "label_str", "name", "score")
    val out = GraphFrames.normalizeNodes(df)
    assert(out.columns.toSeq == Seq("nodeId", "labels", "name", "score"))
    val rows = out.orderBy("nodeId").collect()
    assert(rows(0).getAs[scala.collection.Seq[String]]("labels").toSeq ==
      Seq("Person", "Customer"))
    assert(rows(1).getAs[scala.collection.Seq[String]]("labels").toSeq ==
      Seq("Person"))
    assert(rows(0).getAs[Long]("nodeId") == 1L)
  }

  test("normalizeNodes rejects frames with fewer than 2 columns") {
    val df = Seq(1L, 2L).toDF("only")
    intercept[IllegalArgumentException](GraphFrames.normalizeNodes(df))
  }

  test("normalizeEdges renames the first three columns") {
    val df = Seq((1L, 2L, "KNOWS", 0.5)).toDF("src", "dst", "typ", "w")
    val out = GraphFrames.normalizeEdges(df)
    assert(out.columns.toSeq ==
      Seq("sourceNodeId", "targetNodeId", "relationshipType", "w"))
    assert(out.head.getString(2) == "KNOWS")
  }

  test("readNodes recurses into per-label fragment subdirectories") {
    val base = java.nio.file.Files.createTempDirectory("graft-nodes")
    Seq((1L, "A", "x"), (2L, "A", "y")).toDF("id", "labels", "p")
      .write.parquet(s"$base/LabelA/part")
    Seq((3L, "B", "z")).toDF("id", "labels", "p")
      .write.parquet(s"$base/LabelB/part")
    val df = GraphFrames.readNodes(spark, base.toString)
    assert(df.count() == 3)
  }

  test("csv and json fragment dirs normalize identically to parquet") {
    val rows = Seq((1L, "Person,Customer", "alice"), (2L, "Person", "bob"))
    def normalized(df: org.apache.spark.sql.DataFrame) =
      GraphFrames.normalizeNodes(df).orderBy("nodeId").collect()
        .map(r => (r.getAs[Long]("nodeId"),
          r.getAs[scala.collection.Seq[String]]("labels").toSeq)).toSeq

    val csvBase = java.nio.file.Files.createTempDirectory("graft-csv")
    rows.toDF("id", "labels", "name").write
      .option("header", "true").csv(s"$csvBase/Person/part")
    val fromCsv = GraphFrames.readNodesAs(spark, csvBase.toString, "csv")
      .withColumn("id", $"id".cast("long")) // csv inference yields int

    val jsonBase = java.nio.file.Files.createTempDirectory("graft-json")
    rows.toDF("id", "labels", "name").write.json(s"$jsonBase/Person/part")
    // json columns sort alphabetically; the API demands positional order
    val fromJson = GraphFrames.readNodesAs(spark, jsonBase.toString, "json",
      columns = Seq("id", "labels", "name"))

    val expected = Seq(1L -> Seq("Person", "Customer"), 2L -> Seq("Person"))
    assert(normalized(fromCsv) == expected)
    assert(normalized(fromJson) == expected)

    // json without an explicit column order is refused, not mislabeled
    intercept[IllegalArgumentException] {
      GraphFrames.readNodesAs(spark, jsonBase.toString, "json")
    }
  }

  test("flagship entry() returns rows with built-in functions only") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
