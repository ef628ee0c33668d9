package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writes a factor-replicated copy of the sf0.1 testdata so the FULL
  * registered suite can be benched at 10× scale in one run (`runMain
  * graft.Bench` with SPARK_GRAFT_SF_DIR pointing here) — the suite-level
  * scale reading VERDICT r10 item #4 asked for, complementing the
  * per-operator `Stress` slices.
  *
  * Replication keeps every key relationship the queries join on:
  * lineitem.l_orderkey ↔ orders.o_orderkey shift together per replica,
  * orders.o_custkey ↔ customer.c_custkey shift together; part/supplier/
  * nation/region stay 1× (facts scale over fixed dims). Documents get
  * the Stress-style per-replica text suffix so replica families are
  * genuine near-dups (pair-level operators see realistic candidate
  * structure, not byte-identical floods); embeddings/events shift ids
  * and users. The events `ts` column is copied verbatim, whatever the
  * round's encoding — every consumer goes through the rdEvents seam.
  *
  * Run: `runMain graft.ScaleData [factor] [outDir]` (defaults 10,
  * /tmp/sf1). Not part of the library surface; a bench utility like
  * Stress/Explain.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val out = args.drop(1).headOption.getOrElse("/tmp/sf1")
    val in = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def rd(t: String): DataFrame = spark.read.parquet(s"$in/$t.parquet")
    def wr(df: DataFrame, t: String): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scale] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionByName _)

    // Replica shifts must exceed max(id), not row count: sparse or
    // offset id domains would otherwise collide across replicas and
    // silently corrupt the scaled corpus (ADVICE r11). Fixed spans are
    // checked against the actual key maxima; per-table spans below are
    // derived from max(id) + 1.
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c)).cast("long")).head.getLong(0) // bounded: one row
    def span(df: DataFrame, c: String): Long = maxOf(df, c) + 1L

    val okSpan = 100000000L
    val ckSpan = 10000000L
    require(maxOf(rd("lineitem"), "l_orderkey") < okSpan &&
      maxOf(rd("orders"), "o_orderkey") < okSpan,
      "orderkey domain exceeds okSpan — replicas would collide")
    require(maxOf(rd("orders"), "o_custkey") < ckSpan &&
      maxOf(rd("customer"), "c_custkey") < ckSpan,
      "custkey domain exceeds ckSpan — replicas would collide")
    wr(rep(rd("lineitem")) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * okSpan))
    }, "lineitem")
    wr(rep(rd("orders")) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * okSpan))
        .withColumn("o_custkey", col("o_custkey") + lit(i * ckSpan))
    }, "orders")
    wr(rep(rd("customer")) { (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * ckSpan))
    }, "customer")
    for (t <- Seq("part", "supplier", "nation", "region"))
      wr(rd(t), t)

    val docs0 = rd("documents")
    val nd = span(docs0, "doc_id")
    wr(rep(docs0) { (d, i) =>
      val base = d.withColumn("doc_id", col("doc_id") + lit(i * nd))
      if (i == 0) base
      else base.withColumn("text", concat(col("text"), lit(s" replica$i")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    val emb0 = rd("embeddings")
    val ne = span(emb0, "vec_id")
    wr(rep(emb0) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * ne))
    }, "embeddings")

    val ev0 = rd("events")
    val nEv = span(ev0, "event_id")
    val uSpan = span(ev0, "user_id").max(1000000L)
    wr(rep(ev0) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * nEv))
        .withColumn("user_id", col("user_id") + lit(i * uSpan))
    }, "events")

    println(s"[scale] wrote ${factor}x corpus to $out")
    spark.stop()
  }
}
