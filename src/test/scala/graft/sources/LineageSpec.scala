package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class LineageSpec extends SparkSpec {
  import spark.implicits._

  test("stamp records the exact source file and batch id per row") {
    val dir = Files.createTempDirectory("lineage").toFile.getAbsolutePath
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/part1")
    Seq((2L, "b")).toDF("id", "v").write.parquet(s"$dir/part2")
    val stamped = Lineage.stamp(
      spark.read.parquet(s"$dir/part1", s"$dir/part2"), "run-42")
    val rows = stamped.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("src_file"),
        r.getAs[String]("batch_id")))
    assert(rows.forall(_._3 == "run-42"))
    val byId = rows.map(t => t._1 -> t._2).toMap
    assert(byId(1L).contains("part1") && byId(2L).contains("part2"))
    assert(byId.values.forall(_.endsWith(".parquet")))
  }
}
