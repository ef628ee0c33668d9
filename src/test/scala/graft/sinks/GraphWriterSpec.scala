package graft.sinks

import graft.SparkSpec

/** Executor-side transport shared via a JVM-static registry: local-mode
  * tasks run in this JVM, so the fake observes every partition's puts.
  */
object SharedTransport {
  val transport = new InMemoryFlightTransport
}

class GraphWriterSpec extends SparkSpec {
  import spark.implicits._

  test("writeNodes fans out per partition, executor-side, nothing collected") {
    val t = SharedTransport.transport
    val before = t.putCalls.get()
    val nodes = (1L to 100L).map(i => (i, s"Person,N$i", s"name$i"))
      .toDF("id", "labels", "name").repartition(8)
    val client = new ArrowGraphClient(() => SharedTransport.transport, "dbw",
      maxRetries = 1, retryDelayMs = 0, sleep = _ => ())
    client.createDatabase()
    val (rows, bytes) = GraphWriter.writeNodes(nodes, client)
    assert(rows == 100L, s"accumulated rows: $rows")
    assert(bytes > 0)
    assert(t.putCalls.get() - before == 8, "one doPut per partition")
    // driver client still in FEEDING_NODES: lifecycle continues on driver
    assert(client.state == ArrowGraphClient.FeedingNodes)
    assert(client.nodesDone() >= 100L)
  }

  test("writeEdges requires the edge state on the shipped client") {
    val edges = Seq((1L, 2L, "KNOWS")).toDF("s", "t", "r")
    val client = new ArrowGraphClient(() => SharedTransport.transport, "dbw2",
      maxRetries = 1, retryDelayMs = 0, sleep = _ => ())
    // still READY: every task's copy fails, surfacing as a Spark job error
    intercept[org.apache.spark.SparkException] {
      GraphWriter.writeEdges(edges, client)
    }
  }
}
