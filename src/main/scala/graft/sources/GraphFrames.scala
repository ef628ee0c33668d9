package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-shaped parquet ingestion, re-expressed Spark-first.
  *
  * The reference reads parquet "fragment" directories with pyarrow and
  * renames columns per-batch inside each pool worker
  * (reference: src/blue_green_etl/neo4j_pq.py:43-108, fan-out at :165-225).
  * In Spark the fragment fan-out IS the task scheduler: one parquet
  * directory read becomes N file-split tasks, and normalization is a narrow
  * projection that stays inside whole-stage codegen — no pool, no pandas
  * round-trip, no UDF.
  */
object GraphFrames {

  /** Read a node dataset rooted at `path` (e.g. `.../nodes/` containing one
    * subdirectory per label with parquet fragments), like the reference's
    * `pq.ParquetDataset(data)` over `.../nodes` (neo4j_pq.py:230-246).
    */
  def readNodes(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(path)

  /** Read a relationship dataset rooted at `path` (neo4j_pq.py:247-252). */
  def readEdges(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(path)

  /** Format-generic variants: the same fragment-directory layout served
    * from csv/json/orc sources — a Spark-native widening the pyarrow
    * reference cannot express (it is parquet-only).
    *
    * Positional normalization needs the frame's column ORDER to match the
    * layout. CSV (header) and ORC preserve file column order, but JSON
    * schema inference returns fields ALPHABETICALLY — feeding that
    * straight into normalizeNodes would silently mislabel columns
    * whenever layout order isn't alphabetical. Pass `columns` (the layout
    * order) for JSON — it is `require`d there; for other formats it is an
    * optional re-projection. Production pins a full explicit schema,
    * which also skips the inference pass.
    */
  def readNodesAs(spark: SparkSession, path: String, format: String,
                  columns: Seq[String] = Seq.empty): DataFrame =
    ordered(reader(spark, format).load(path), format, columns)

  def readEdgesAs(spark: SparkSession, path: String, format: String,
                  columns: Seq[String] = Seq.empty): DataFrame =
    ordered(reader(spark, format).load(path), format, columns)

  private def ordered(df: DataFrame, format: String,
                      columns: Seq[String]): DataFrame = {
    require(format != "json" || columns.nonEmpty,
      "json infers fields in alphabetical order; pass columns= with the " +
        "layout's positional order")
    if (columns.isEmpty) df else df.select(columns.map(col): _*)
  }

  private def reader(spark: SparkSession, format: String) = {
    val base = spark.read.format(format)
      .option("recursiveFileLookup", "true")
    if (format == "csv") base.option("header", "true").option("inferSchema", "true")
    else base
  }

  /** Node schema normalization (neo4j_pq.py:43-85): positionally rename
    * col0 → `nodeId`, col1 → `labels`, and split a comma-separated label
    * string into `array<string>`. The reference does the split through a
    * pandas `.apply` per batch; here it is the built-in `split` expression,
    * codegen'd and shuffle-free.
    */
  def normalizeNodes(df: DataFrame): DataFrame = {
    val cols = df.columns
    require(cols.length >= 2, s"node frame needs >=2 columns, got ${cols.length}")
    val renamed = df
      .withColumnRenamed(cols(0), "nodeId")
      .withColumnRenamed(cols(1), "labels")
    renamed.withColumn("labels", split(col("labels"), ","))
  }

  /** Edge schema normalization (neo4j_pq.py:87-108): positionally rename
    * col0/col1/col2 → `sourceNodeId`/`targetNodeId`/`relationshipType`.
    */
  def normalizeEdges(df: DataFrame): DataFrame = {
    val cols = df.columns
    require(cols.length >= 3, s"edge frame needs >=3 columns, got ${cols.length}")
    df.withColumnRenamed(cols(0), "sourceNodeId")
      .withColumnRenamed(cols(1), "targetNodeId")
      .withColumnRenamed(cols(2), "relationshipType")
  }
}
