package graft.sinks

import org.apache.spark.sql.DataFrame

import graft.sources.GraphFrames

/** Partition-parallel bulk load — the Spark-native replacement for the
  * reference's multiprocessing fan-out (neo4j_pq.py:165-260).
  *
  * Where the reference forks a pool and feeds each worker one parquet
  * fragment, here each Spark partition IS a worker: the driver-side
  * client (already moved to its feeding state by `createDatabase()` /
  * `nodesDone()`) is serialized into the `foreachPartition` closure —
  * the exact analogue of the reference handing `client.copy()` to each
  * pool worker (neo4j_pq.py:36-41, 189). Each task deserializes its own
  * copy, lazily opens its own transport on the executor, and streams its
  * partition's rows. Nothing is collected to the driver; totals come back
  * through accumulators. At 1000 executors this fans out to 1000
  * concurrent writers with zero driver involvement.
  */
object GraphWriter {

  /** Normalize + stream a node DataFrame through `client` (must be in
    * FEEDING_NODES — call `createDatabase()` first). Returns
    * (rows, approxBytes).
    */
  def writeNodes(nodes: DataFrame, client: ArrowGraphClient): (Long, Long) =
    write(GraphFrames.normalizeNodes(nodes), client, edges = false)

  /** Normalize + stream an edge DataFrame (client in FEEDING_EDGES). */
  def writeEdges(edges: DataFrame, client: ArrowGraphClient): (Long, Long) =
    write(GraphFrames.normalizeEdges(edges), client, edges = true)

  private def write(df: DataFrame, client: ArrowGraphClient,
                    edges: Boolean): (Long, Long) = {
    val spark = df.sparkSession
    val schema = df.schema
    val rowsAcc = spark.sparkContext.longAccumulator("graft.write.rows")
    val bytesAcc = spark.sparkContext.longAccumulator("graft.write.bytes")
    df.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      val worker = client.copy() // task-local client over a task-local transport
      try {
        val (r, b) =
          if (edges) worker.writeEdges(schema, it)
          else worker.writeNodes(schema, it)
        rowsAcc.add(r)
        bytesAcc.add(b)
      } finally worker.close()
    }
    (rowsAcc.value, bytesAcc.value)
  }
}
