package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for joins whose key distribution AQE can't fix
  * (e.g. one customer owning 30% of a 100 TB fact table).
  *
  * [[saltedJoin]] splinters each hot key into `salts` sub-keys: the
  * skewed (large) side gets a per-row salt, the small side is replicated
  * once per salt value, and the join runs on (key, salt) — spreading each
  * hot key over `salts` reducers. Result rows are identical to the plain
  * join; only the partitioning changes.
  */
object Skew {

  /** Inner-join `large` with `small` on `key`, salting the large side.
    * `small` is replicated `salts` times — keep it broadcast-sized or the
    * replication cost outweighs the skew win.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    require(salts > 0)
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt column name is reserved by saltedJoin")
    // per-row salt: row-content hash mixed with the row's position, so a
    // hot key spreads even when its rows are column-identical duplicates
    val saltCol: Column = pmod(
      hash((large.columns.map(col) :+ monotonically_increasing_id()): _*),
      lit(salts))
    val saltedLarge = large.withColumn("__salt", saltCol)
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge
      .join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Key-distribution diagnosis: the `topN` heaviest keys with row count
    * and corpus share — the profiling query you run BEFORE deciding a
    * join needs [[saltedJoin]], a co-occurrence cap, or an AQE skew hint.
    * One partial-agg shuffle on the key plus a key-cardinality-sized
    * top-k sort (never the input); the total rides in from a one-row
    * aggregate broadcast. Counts are exact integers; share is one
    * portable double division.
    */
  def keyProfile(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val total = df.agg(count(lit(1)).as("total"))
    counts.crossJoin(broadcast(total))
      .orderBy(desc("n_rows"), col(keyCol))
      .limit(topN)
      .select(col(keyCol), col("n_rows"), col("total"),
        (col("n_rows").cast("double") / col("total").cast("double"))
          .as("share"))
  }
}
