package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export: assign every row a stable shard, write the
  * corpus as one directory per shard, and emit a manifest the training
  * job (or a later integrity check) can trust.
  *
  * The webdataset/TFRecord-style contract a large-scale training run
  * needs from its data pipeline:
  *  - ASSIGNMENT is content-stable: `shard = int(md5(key)[0:8]) mod n`
  *    (the [[graft.ops.Sampling.kFoldAssign]] recipe) — a row's shard
  *    never changes when other rows arrive, re-exports are idempotent,
  *    and any engine can recompute it.
  *  - The MANIFEST carries per-shard row counts, payload bytes, and an
  *    order-free integer checksum (sum of md5-prefix ints of the
  *    payload), so a reader can verify a shard without re-reading the
  *    whole export, in any engine.
  *
  * Plan shape: assignment is a narrow projection; the write shuffles on
  * the shard key once (`repartition(shard)` → one file per shard dir
  * instead of tasks×shards fragments); the manifest is one partial-
  * aggregated groupBy on n keys.
  */
object Shards {

  /** Stable shard id in [0, n). */
  def assign(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    require(n >= 1, "need at least one shard")
    df.withColumn("shard",
      conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
        .cast("long") % n)
  }

  /** Per-shard manifest: (shard, n_rows, n_bytes, checksum). */
  def manifest(df: DataFrame, keyCol: String, payloadCol: String,
               n: Int): DataFrame =
    assign(df, keyCol, n)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(length(col(payloadCol)).cast("long")).as("n_bytes"),
        sum(conv(substring(md5(col(payloadCol)), 1, 8), 16, 10)
          .cast("long")).as("checksum"))

  /** Write the sharded export (`path/shard=K/...`) plus
    * `path/_manifest` (parquet), returning the manifest. One shuffle on
    * the shard key so each shard directory holds one file per shard —
    * the reader-friendly layout — rather than one fragment per
    * (task × shard).
    */
  def write(df: DataFrame, path: String, keyCol: String, payloadCol: String,
            n: Int): DataFrame = {
    assign(df, keyCol, n)
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val m = manifest(df, keyCol, payloadCol, n)
    m.coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
    m
  }

  /** Rows of `corpus` not yet exported — a keyed LEFT ANTI join against
    * the exported-key set. Content-stable assignment makes incremental
    * export exactly this: new rows land in their md5-determined shard
    * and nothing already written ever moves. Bucket both sides on the
    * key for the shuffle-free variant (the
    * [[graft.ops.Dedup.incrementalExactIndexed]] pattern).
    */
  def delta(corpus: DataFrame, keyCol: String,
            exportedKeys: DataFrame): DataFrame =
    corpus.join(exportedKeys.select(col(keyCol)).distinct(),
      Seq(keyCol), "left_anti")

  /** Merge manifests by shard — row counts, byte totals, and the
    * order-free md5-prefix checksum are all ADDITIVE, so the manifest of
    * (old export + delta) is a shard-keyed sum of the two manifests:
    * the corpus is never re-read to refresh its manifest. Shard-count
    * sized input, one tiny keyed agg.
    */
  def mergeManifests(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("shard")
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_bytes")).as("n_bytes"),
        sum(col("checksum")).as("checksum"))

  /** Re-derive the manifest from a written export and compare with the
    * stored one: empty result = intact; otherwise one row per damaged
    * shard. The integrity check a training job runs before trusting a
    * shard directory.
    */
  def verify(spark: SparkSession, path: String, keyCol: String,
             payloadCol: String, n: Int): DataFrame = {
    val stored = spark.read.parquet(s"$path/_manifest")
    val actual = manifest(spark.read.parquet(path), keyCol, payloadCol, n)
    stored.as("s").join(actual.as("a"), Seq("shard"), "full")
      .filter(
        col("s.n_rows").isNull || col("a.n_rows").isNull ||
          col("s.n_rows") =!= col("a.n_rows") ||
          col("s.n_bytes") =!= col("a.n_bytes") ||
          col("s.checksum") =!= col("a.checksum"))
      .select(col("shard"),
        col("s.n_rows").as("manifest_rows"), col("a.n_rows").as("actual_rows"),
        col("s.checksum").as("manifest_checksum"),
        col("a.checksum").as("actual_checksum"))
  }

  /** Balanced range-shard boundaries from the mergeable bottom-k
    * quantile sketch ([[graft.ops.Sketches.quantileSketch]]): the
    * (i/nShards)-quantile estimates, i = 1..nShards-1, as a sorted
    * array. Hash sharding ([[assign]]/[[rendezvousShard]]) is stable but
    * ORDER-FREE — a reader wanting ordered scans, merge joins, or range
    * pruning on the shard key gets nothing from it; range sharding
    * gives each shard a contiguous (lo, hi] value slice with
    * sketch-balanced row counts (~1/√k rank error on each cut).
    *
    * Deterministic end to end: the sketch sample is md5-derandomized,
    * so the SAME corpus always yields the SAME boundaries in any engine
    * — the `shard_range` oracle rebuilds them in DuckDB and matches
    * bit-for-bit. One scan for the sketch; the boundary pull is
    * nShards-1 rows.
    */
  def rangeBoundaries(df: DataFrame, valueCol: String, idCol: String,
                      nShards: Int, k: Int = 1024): Seq[Long] = {
    require(nShards >= 2, "range sharding needs at least two shards")
    val qs = (1 until nShards).map(i => i.toLong * 1000000L / nShards)
    graft.ops.Sketches.quantileSketch(df, valueCol, idCol, k, qs)
      .select(col("q_ppm"), col("est"))
      .collect() // bounded: nShards-1 boundary rows
      .sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
  }

  /** Range-shard id for `valueCol` given sorted boundaries: the count
    * of boundaries <= v — shard s holds values in [b(s-1), b(s)) with
    * b(-1) = -inf, b(nShards-1) = +inf. A folded chain of codegen'd
    * comparisons (no HOF lambda, no join) over nShards-1 literals;
    * duplicate boundaries (a skewed value domain) simply leave the
    * shards between equal cuts empty, honestly.
    */
  def rangeShardCol(valueCol: String, boundaries: Seq[Long]): Column =
    boundaries.map(b =>
        when(col(valueCol) >= lit(b), 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))

  /** Per-shard range manifest: (shard, lo, hi, n_rows, min_v, max_v)
    * where (lo, hi) are the assigned boundary slice (NULL-open at the
    * ends) and min_v/max_v the values actually observed — the reader's
    * zone map. One partial-aggregated groupBy on <= nShards keys plus a
    * broadcast join against the nShards-row bounds table.
    */
  def rangeManifest(df: DataFrame, valueCol: String,
                    boundaries: Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = boundaries.length + 1
    val bounds = (0 until n).map { s =>
      (s.toLong,
        if (s == 0) None else Some(boundaries(s - 1)),
        if (s == n - 1) None else Some(boundaries(s)))
    }.toDF("shard", "lo", "hi")
    df.select(col(valueCol).cast("long").as("v"))
      .withColumn("shard", rangeShardCol("v", boundaries))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .join(broadcast(bounds), Seq("shard"), "left")
      .select(col("shard"), col("lo"), col("hi"),
        col("n_rows"), col("min_v"), col("max_v"))
  }

  /** Write the range-sharded export (`path/shard=K/...`) plus its range
    * manifest at `path/_manifest`, returning the manifest. Same
    * one-shuffle layout contract as [[write]], but shard directories
    * are value-contiguous: downstream ordered scans and merge joins
    * read shards in key order, and a range predicate prunes whole
    * directories via the manifest's (lo, hi].
    */
  def writeRange(df: DataFrame, path: String, valueCol: String,
                 idCol: String, nShards: Int, k: Int = 1024): DataFrame = {
    val boundaries = rangeBoundaries(df, valueCol, idCol, nShards, k)
    df.withColumn("shard",
        rangeShardCol(valueCol, boundaries).cast("long"))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val m = rangeManifest(df, valueCol, boundaries)
    m.coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
    m
  }

  /** Deterministic GLOBAL-SHUFFLE shard assignment: a content-stable
    * pseudorandom total order `h = int(md5(key || salt)[0:8 hex])`
    * (uniform in [0, 2^32)), cut into `n` equi-width h-ranges
    * (`shard = h div (2^32 / n)`). Because h is uniform, equi-width
    * cuts are balanced without a quantile sketch, and because the cuts
    * are CONTIGUOUS in h, reading shard directories in shard order —
    * each sorted by (h, key) — replays one fixed global permutation of
    * the corpus: the reproducible "shuffled once, stream in order"
    * layout pretraining runs need (re-exports with the same salt yield
    * byte-identical batch order; changing the salt is a fresh shuffle).
    * Hash/range sharding ([[assign]]/[[rangeShardCol]]) can't give this:
    * hash order is not a permutation a reader can stream, and range
    * order preserves the ORIGINAL key order — correlated, not shuffled.
    */
  def shuffleHashCol(keyCol: String, salt: String): Column =
    conv(substring(md5(concat(col(keyCol).cast("string"), lit(":" + salt))),
      1, 8), 16, 10).cast("long")

  def shuffleShardCol(keyCol: String, salt: String, n: Int): Column = {
    require(n >= 1 && (n & (n - 1)) == 0,
      "shard count must be a power of two for exact equi-width h-cuts")
    val shift = 32 - Integer.numberOfTrailingZeros(n)
    shiftright(shuffleHashCol(keyCol, salt), shift).cast("long")
  }

  /** Per-shard manifest of the shuffled export: `(shard, n_rows,
    * global_offset, min_h, max_h, first_key, checksum)` — global_offset
    * is the number of rows in earlier shards (so row r of shard s has
    * global position offset+r: the batch plan `batch = pos div B` needs
    * no global sort), first_key is the key that leads the shard's
    * stream, checksum is the order-free md5-prefix payload sum of
    * [[manifest]]. One partial-aggregated groupBy on ≤ n keys plus an
    * n-row window for the running offset.
    */
  def shuffleManifest(df: DataFrame, keyCol: String, payloadCol: String,
                      salt: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(col(keyCol).cast("long").as("k"),
        shuffleHashCol(keyCol, salt).as("h"),
        shuffleShardCol(keyCol, salt, n).as("shard"),
        col(payloadCol).as("payload"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min(col("h")).as("min_h"), max(col("h")).as("max_h"),
        min(struct(col("h"), col("k"))).getField("k").as("first_key"),
        sum(conv(substring(md5(col("payload")), 1, 8), 16, 10)
          .cast("long")).as("checksum"))
      .withColumn("global_offset",
        coalesce(sum(col("n_rows")).over(
          Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("shard"), col("n_rows"), col("global_offset"),
        col("min_h"), col("max_h"), col("first_key"), col("checksum"))
  }

  /** Write the shuffled export (`path/shard=K/...`, each shard file
    * sorted by (h, key)) plus its manifest at `path/_manifest`,
    * returning the manifest. One shuffle on the shard key; the
    * within-shard sort rides the same exchange (`repartition` →
    * `sortWithinPartitions`), so the export costs exactly one pass —
    * a global `orderBy` of the corpus is never executed.
    */
  def writeShuffled(df: DataFrame, path: String, keyCol: String,
                    payloadCol: String, salt: String, n: Int): DataFrame = {
    df.withColumn("h", shuffleHashCol(keyCol, salt))
      .withColumn("shard", shuffleShardCol(keyCol, salt, n))
      .repartition(col("shard"))
      .sortWithinPartitions(col("h"), col(keyCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val m = shuffleManifest(df, keyCol, payloadCol, salt, n)
    m.coalesce(1).write.mode("overwrite").parquet(s"$path/_manifest")
    m
  }

  /** Rendezvous (highest-random-weight) shard id in [0, n): the shard
    * whose salted hash of the key is smallest. Unlike `md5 mod n`
    * ([[assign]]), growing n → n+1 moves ONLY the keys the new shard
    * wins (expected 1/(n+1) of the corpus) — every surviving
    * assignment is untouched, so a resharding re-export rewrites one
    * new directory instead of all of them. Pure per-row expression:
    * a `least` over n (hash, shard) structs, codegen'd (no HOF lambda
    * — the per-row hot-loop rule), O(n) hashes per row; for shard
    * counts in the hundreds, jump-consistent-hash is the O(log n)
    * successor, same seam.
    */
  def rendezvousShard(keyCol: String, n: Int): Column = {
    require(n >= 1, "need at least one shard")
    val candidates = (0 until n).map(s =>
      struct(md5(concat(col(keyCol).cast("string"), lit(s":$s"))).as("h"),
        lit(s.toLong).as("sid")))
    (if (n == 1) candidates.head else least(candidates: _*)).getField("sid")
  }

  /** Rebalance plan for growing `nOld` → `nNew` shards under rendezvous
    * assignment: the (old_shard, new_shard) movement matrix with
    * per-cell counts and the per-cell share of the corpus in ppm.
    * Stable cells (old == new) dominate; for nNew = nOld + 1 every
    * moved row lands on the NEW shard — the matrix is the audit that
    * proves the resharding touches the minimum data before anything
    * is rewritten.
    *
    * Scale shape: two per-row codegen'd expressions and one
    * partial-aggregated groupBy on ≤ nOld·nNew cells — one bounded
    * shuffle, nothing else moves.
    */
  def rebalancePlan(df: DataFrame, keyCol: String,
                    nOld: Int, nNew: Int): DataFrame = {
    val assigned = df.select(
      rendezvousShard(keyCol, nOld).as("old_shard"),
      rendezvousShard(keyCol, nNew).as("new_shard"))
    assigned
      .groupBy(col("old_shard"), col("new_shard"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("moved", col("old_shard") =!= col("new_shard"))
      .withColumn("share_ppm",
        expr("1000000L * n_rows div sum(n_rows) OVER ()"))
      .select(col("old_shard"), col("new_shard"), col("moved"),
        col("n_rows"), col("share_ppm"))
      .orderBy("old_shard", "new_shard")
  }
}
