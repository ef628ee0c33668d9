package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k against a *small broadcast query
  *    set* — O(N·|Q|) with zero shuffles on the corpus side; the correct
  *    baseline and itself scale-sane when |Q| is small.
  *  - [[lshTopK]]: sign-random-projection LSH buckets so candidate
  *    generation is an equi-join on (band, bucket) — the 100 TB path.
  *
  * All hyperplanes are derived from xxhash64 with compile-time constants:
  * reproducible across runs, executors, and cluster sizes with no
  * broadcast of plane matrices.
  */
object Similarity {

  /** Sequential-fold dot product in double precision. Left-to-right
    * summation makes the result bit-deterministic (and matchable by a
    * DuckDB oracle using `list_dot_product` on DOUBLE[]).
    */
  def dotCol(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))

  /** LSH family parameters: `planes` = bands * bitsPerBand sign bits. */
  val Bands: Int = 5
  val BitsPerBand: Int = 12

  /** Rademacher (+1/-1) pseudo-random hyperplane component for plane `p`,
    * dimension `j`, derived from xxhash64 — no materialized plane matrix.
    */
  private def planeSignExpr: String =
    "if(((xxhash64(p * 131 + j) >> 7) & 1) = 1, cast(1 as double), cast(-1 as double))"

  /** Per-row LSH banding: returns (idCol, embedding, band, bucket) with one
    * row per band. Bucket = the band's sign-bit pattern as an int.
    */
  def signBuckets(embeddings: DataFrame, idCol: String, embCol: String,
                  bands: Int = Bands, bitsPerBand: Int = BitsPerBand): DataFrame = {
    val planes = bands * bitsPerBand
    val bitsExpr =
      s"transform(sequence(0, ${planes - 1}), p -> " +
        s"if(aggregate(sequence(0, size($embCol) - 1), cast(0 as double), " +
        s"(acc, j) -> acc + cast(element_at($embCol, j + 1) as double) * $planeSignExpr) >= 0, 1L, 0L))"
    embeddings
      .withColumn("lsh_bits", expr(bitsExpr))
      .select(
        col(idCol), col(embCol),
        posexplode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> " +
            s"aggregate(sequence(0, ${bitsPerBand - 1}), 0L, " +
            s"(acc, i) -> acc + shiftleft(element_at(lsh_bits, b * $bitsPerBand + i + 1), i)))"
        )).as(Seq("band", "bucket")))
  }

  /** Exact brute-force cosine top-k. `queries` must be small (broadcast):
    * the plan is a BroadcastNestedLoopJoin over the corpus — a single
    * corpus scan, no corpus shuffle until the final per-query top-k, which
    * is a window over |Q|·N rows partitioned by query.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosineCol(col("embedding"), col("q_emb")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"))
  }

  /** LSH-bucketed approximate top-k: candidates are corpus vectors sharing
    * at least one (band, bucket) with the query, re-ranked by exact cosine.
    * Candidate generation is a shuffle equi-join — no cross product.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              bands: Int = Bands, bitsPerBand: Int = BitsPerBand): DataFrame = {
    val corpusB = signBuckets(corpus, "vec_id", "embedding", bands, bitsPerBand)
    val queryB = signBuckets(
      queries.select(col("query_id").as("vec_id"), col("q_emb").as("embedding")),
      "vec_id", "embedding", bands, bitsPerBand)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("band"), col("bucket"))
    val cands = corpusB
      .join(queryB, Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "embedding", "q_emb")
      .dropDuplicates("query_id", "vec_id")
    cands
      .withColumn("cosine", cosineCol(col("embedding"), col("q_emb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), col("cosine"))
  }
}
