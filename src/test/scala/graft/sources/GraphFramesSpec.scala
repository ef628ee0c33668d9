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
}
