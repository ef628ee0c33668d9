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

  /** Pre-flight join-cardinality guard: the EXACT output size of
    * `left ⋈ right` on an equi-key — Σ_k n_left(k)·n_right(k) — plus
    * the top contributing keys, computed from key-count tables WITHOUT
    * running the join (cost = two partial aggs + a key-cardinality
    * join, never the output size). The dry-run a pipeline runs before
    * a self-join or enrichment that might explode on a hot key: the
    * top rows name exactly which keys to salt/cap ([[saltedJoin]] /
    * the maxBasket-style guards), and the total row is the bill.
    *
    * One output frame: `kind = 'key'` rows (top `topK` contributors,
    * fully ordered) + one `kind = 'total'` row (key NULL). Both
    * branches aggregate the SAME key-count join subtree inside one
    * plan, so its exchanges are reused, not recomputed.
    */
  def joinCardinality(left: DataFrame, leftKey: String,
                      right: DataFrame, rightKey: String,
                      topK: Int = 10): DataFrame = {
    val la = left.groupBy(col(leftKey).as("k"))
      .agg(count(lit(1)).as("n_left"))
    val ra = right.groupBy(col(rightKey).as("k"))
      .agg(count(lit(1)).as("n_right"))
    val j = la.join(ra, "k")
      .withColumn("contrib", col("n_left") * col("n_right"))
    val top = j.orderBy(desc("contrib"), asc("k")).limit(topK)
      .select(lit("key").as("kind"), col("k"), col("n_left"),
        col("n_right"), col("contrib"))
    val total = j.agg(sum(col("n_left")).as("n_left"),
      sum(col("n_right")).as("n_right"),
      sum(col("contrib")).as("contrib"))
      .select(lit("total").as("kind"),
        // null typed as the PROBED key's type, not a hardcoded long —
        // unionByName would reject a string-keyed probe (ADVICE r10)
        lit(null).cast(left.schema(leftKey).dataType).as("k"),
        col("n_left"), col("n_right"), col("contrib"))
    top.unionByName(total)
  }

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
