package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training pipelines: deterministic
  * splits and distribution profiling. Splitting is keyed on a content-
  * independent id hash so assignment is reproducible across runs,
  * engines, and cluster sizes — and expressible in the DuckDB oracle
  * (md5 is engine-portable where murmur seeds are not).
  */
object Sampling {

  /** Deterministic train/valid/test assignment from the first hex char of
    * md5(id): 0-b → train (12/16), c-d → valid (2/16), e-f → test (2/16).
    * Stable under corpus growth: a row's split never changes when other
    * rows are added, unlike fraction-based `randomSplit`.
    */
  def splitCol(id: Column): Column = {
    val h = substring(md5(id.cast("string")), 1, 1)
    when(h.isin("c", "d"), lit("valid"))
      .when(h.isin("e", "f"), lit("test"))
      .otherwise(lit("train"))
  }

  def splitAssign(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("split", splitCol(col(idCol)))

  /** Per-label counts and fractions — the class-balance check before
    * training. One partial-aggregated shuffle on the label.
    */
  def labelBalance(df: DataFrame, labelCol: String): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(labelCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("fraction", col("n").cast("double") / lit(total))
  }

  /** Corpus profile: per-language token-length distribution (doc count,
    * mean, p50/p90, min/max) — the length-histogram report behind context-
    * window and truncation decisions.
    *
    * `exact = true` uses exact `percentile` (holds each group's values;
    * fine up to millions of docs per group, and DuckDB-oracle-matchable).
    * At 100 TB pass `exact = false`: `approx_percentile` is a t-digest
    * sketch with full partial aggregation — constant memory per group.
    */
  def corpusStats(docs: DataFrame, exact: Boolean = true): DataFrame = {
    val pct = if (exact) "percentile" else "approx_percentile"
    docs
      .withColumn("n_toks",
        size(TextAnalysis.tokensCol(col("text"))).cast("long"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("n_toks")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_tokens"),
        expr(s"$pct(n_toks, 0.5)").cast("double").as("p50_tokens"),
        expr(s"$pct(n_toks, 0.9)").cast("double").as("p90_tokens"),
        min(col("n_toks")).as("min_tokens"),
        max(col("n_toks")).as("max_tokens"))
  }

  /** Training-mixture composition: per (source, lang) document and token
    * counts plus each cell's share of all corpus tokens — the data-mix
    * report behind sampling-weight decisions.
    *
    * One partially-aggregated shuffle on (source, lang); the share window
    * runs over the aggregated result (|sources|×|langs| rows), never the
    * corpus.
    */
  def sourceMix(docs: DataFrame): DataFrame = {
    val perCell = docs
      .withColumn("n_toks",
        size(TextAnalysis.tokensCol(col("text"))).cast("long"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    perCell.withColumn("token_share",
      col("n_tokens").cast("double") /
        sum(col("n_tokens")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()).cast("double"))
  }
}
