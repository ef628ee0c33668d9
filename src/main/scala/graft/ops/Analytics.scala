package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join/aggregation pipelines exercising the engine end-to-end (bench
  * headliners). Monetary sums go through `decimal(18,2|4)` so the result is
  * exact and engine-independent, then back to double for a stable schema.
  */
object Analytics {

  /** Exact, order-independent sum of a double column: round to a decimal
    * at fixed scale, sum exactly, cast back.
    */
  def exactSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Pricing summary (TPC-H Q1 shape): per-flag totals over lineitem. */
  def q1(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order").cast("double"))

  /** Revenue top-k (TPC-H Q3 shape): segment-filtered customer⋈orders⋈
    * lineitem; orders/customer are the small sides and broadcast.
    */
  def q3(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
         segment: String = "BUILDING", k: Int = 10): DataFrame =
    lineitem
      .join(broadcast(orders), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(k)

  /** Regional revenue rollup (TPC-H Q5 shape): the dim chain
    * region⋈nation⋈customer is broadcast; the only shuffles are the
    * lineitem⋈orders join and the final small aggregation.
    */
  def q5(region: DataFrame, nation: DataFrame, customer: DataFrame,
         orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"),
        count(lit(1)).as("n_items"))

  /** Table profile — per-column data-quality stats (row/null/distinct
    * counts, numeric min/max), long form: the sweep a pipeline runs
    * before trusting a new 100 TB drop. One aggregation per column, each
    * over a scan PRUNED to that single column, so total IO equals one
    * multi-column pass (parquet is columnar) without the row fan-out
    * Spark's Expand inserts for multiple exact count-distincts in a
    * single aggregate. Swap `count_distinct` for
    * `approx_count_distinct` when a ±2% HLL answer is acceptable and
    * the distinct cardinality is huge.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(col(c)).agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_v"),
        max(col(c)).cast("double").as("max_v"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_v"), col("max_v"))
    }.reduce(_ unionByName _)
}
