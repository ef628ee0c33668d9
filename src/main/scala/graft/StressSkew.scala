package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-resilience stress: the two skew shapes web corpora actually have,
  * run against the dedup joins at 10x scale.
  *
  *  1. BOILERPLATE: every document shares a license-header prefix, so a
  *     handful of shingles have df = N. The jaccard/winnow inverted-index
  *     joins must stay bounded via df-pruning (hot postings dropped before
  *     the pair join) — the designed stop-shingle behavior.
  *  2. HOT CLUSTER: one page duplicated D times. All D copies share every
  *     minhash band bucket, so the all-pairs join emits C(D,2) pairs —
  *     the quadratic shape [[graft.ops.Dedup.minHashLshStar]] caps with
  *     star edges while preserving connected components.
  *
  * Run: `runMain graft.StressSkew [factor] [clusterSize]` (defaults 10,
  * 5000). Prints per-operator seconds + output rows; record in PLANS.md.
  */
object StressSkew {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val clusterSize = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs  ($n rows)")
    }

    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val nd = docs0.count()

    // --- scenario 1: universal boilerplate prefix at 10x ------------------
    val boiler = "copyright license terms apply to this document all rights reserved"
    val boilerCorpus = (0 until factor).map { i =>
      docs0.select((col("doc_id") + lit(i * nd)).as("doc_id"),
        concat(lit(boiler + " "), col("text"), lit(s" replica$i")).as("text"))
    }.reduce(_ unionAll _).repartition(32).cache()
    println(s"boilerplate corpus: ${boilerCorpus.count()} docs, " +
      s"shared ${boiler.split(' ').length}-token prefix (df = N shingles)")
    time("dedup_jaccard (df-pruned)")(
      graft.ops.Dedup.ngramJaccard(boilerCorpus).count())
    time("dedup_winnow (df-pruned)")(
      graft.ops.Dedup.winnowNearDup(boilerCorpus).count())
    time("dedup_minhash (boilerplate)")(
      graft.ops.Dedup.minHashLsh(boilerCorpus).count())
    time("dedup_minhash_star (boilerplate)")(
      graft.ops.Dedup.minHashLshStar(boilerCorpus).count())
    boilerCorpus.unpersist()

    // --- scenario 2: one hot duplicate cluster ----------------------------
    val hotText = docs0.filter(col("doc_id") === 7).select("text")
      .as[String].head()
    val hotCluster = spark.range(clusterSize).select(
      (col("id") + 1000000L).as("doc_id"), lit(hotText).as("text"))
    val clusterCorpus = docs0.select("doc_id", "text").unionAll(hotCluster)
      .repartition(32).cache()
    println(s"hot-cluster corpus: ${clusterCorpus.count()} docs, " +
      s"one page x$clusterSize exact copies")
    time(s"minHashLsh      (clique C($clusterSize,2))")(
      graft.ops.Dedup.minHashLsh(clusterCorpus).count())
    time(s"minHashLshStar  (hotBucket=64)")(
      graft.ops.Dedup.minHashLshStar(clusterCorpus).count())
    time("resolveClusters over star edges")(
      graft.ops.Dedup.resolveClusters(
        graft.ops.Dedup.minHashLshStar(clusterCorpus).select("a_id", "b_id"))
        .count())
    spark.stop()
  }
}
