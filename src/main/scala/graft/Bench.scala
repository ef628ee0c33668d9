package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first timed query isn't charged for
    // session spin-up (scan + shuffle + window machinery)
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    // Optional args = query-name filter (repeat runs: "name xN"); the
    // driver invokes with no args and times the full registry once.
    val (repeat, names) = args.partition(_.startsWith("x"))
    val reps = repeat.headOption.map(_.drop(1).toInt).getOrElse(1)
    val selected =
      if (names.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => names.contains(k) }
    // A failed query is reported as -1 (never a timing) so a regression
    // can't masquerade as a speedup; failures also go to stderr.
    val results = Seq.fill(reps)(selected).flatten.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => graft.util.Json.quote(k) + ":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => graft.util.Json.quote(k) }
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
