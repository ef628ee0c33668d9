package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ArrowGraphClient._

class ArrowClientSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("nodeId", LongType), StructField("labels", StringType)))

  private def mkClient(t: InMemoryFlightTransport, retries: Int = 3) =
    new ArrowGraphClient(() => t, "db1", concurrency = 2,
      maxRetries = retries, retryDelayMs = 1L, sleep = _ => ())

  test("lifecycle walks READY -> FEEDING_NODES -> FEEDING_EDGES -> AWAITING_GRAPH") {
    val t = new InMemoryFlightTransport
    val c = mkClient(t)
    assert(c.state == Ready)
    c.createDatabase()
    assert(c.state == FeedingNodes)
    val (rows, bytes) = c.writeNodes(schema, Iterator(Row(1L, "A"), Row(2L, "B")))
    assert(rows == 2 && bytes > 0)
    assert(c.nodesDone() == 2L)
    assert(c.state == FeedingEdges)
    c.writeEdges(schema, Iterator(Row(1L, "X")))
    assert(c.edgesDone() == 1L)
    assert(c.state == AwaitingGraph)
    assert(t.actions.toArray.map(_.asInstanceOf[(String, String)]._1).toSeq ==
      Seq("CREATE_DATABASE", "NODE_LOAD_DONE", "RELATIONSHIP_LOAD_DONE"))
  }

  test("writes in the wrong state throw StateError") {
    val t = new InMemoryFlightTransport
    val c = mkClient(t)
    intercept[StateError](c.writeNodes(schema, Iterator.empty))
    c.createDatabase()
    intercept[StateError](c.writeEdges(schema, Iterator.empty))
    intercept[StateError](c.edgesDone())
  }

  test("createDatabase retries through transient failures") {
    val t = new InMemoryFlightTransport
    t.failNextActions.set(2)
    val c = mkClient(t, retries = 3)
    c.createDatabase()
    assert(c.state == FeedingNodes)
    assert(t.actions.size == 3) // two failures + one success
  }

  test("createDatabase rethrows once retries are exhausted") {
    val t = new InMemoryFlightTransport
    t.failNextActions.set(5)
    val c = mkClient(t, retries = 3)
    intercept[RuntimeException](c.createDatabase())
    assert(c.state == Ready)
  }

  test("abort of a live import succeeds and resets to READY") {
    val t = new InMemoryFlightTransport
    val c = mkClient(t)
    c.createDatabase()
    assert(c.abort())
    assert(c.state == Ready)
  }

  test("abort with no import is a silent false (NOT_FOUND swallowed)") {
    val t = new InMemoryFlightTransport
    val c = mkClient(t)
    assert(!c.abort())
    assert(c.state == Ready)
  }

  test("copy preserves state, default import config matches reference") {
    val t = new InMemoryFlightTransport
    val c = mkClient(t)
    c.createDatabase()
    assert(c.copy().state == FeedingNodes)
    val cfg = defaultImportConfig("db1", 4)
    assert(cfg("force") == true && cfg("record_format") == "aligned" &&
      cfg("id_type") == "INTEGER" && cfg("high_io") == true)
  }

  test("client round-trips through java serialization with its state") {
    val t = new InMemoryFlightTransport
    val c = mkClient(t)
    c.createDatabase()
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(c)
    val c2 = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[ArrowGraphClient]
    assert(c2.state == FeedingNodes)
    assert(c2.database == "db1")
  }
}
