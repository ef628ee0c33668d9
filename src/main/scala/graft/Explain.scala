package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: dumps the formatted physical plan of every registered
  * query (args: [sfDir] [outFile]) so scan pruning, pushdown, join
  * strategies, and shuffle counts can be reviewed per round.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/plans.txt")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sb.append(s"\n${"=" * 72}\n== $name\n${"=" * 72}\n")
      try {
        val df = fn(spark, sfDir)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => sb.append(s"EXPLAIN FAILED: ${e.getMessage}\n") }
    }
    java.nio.file.Files.writeString(java.nio.file.Path.of(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
