package graft.sinks

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Pluggable transport to the bulk-import Flight service.
  *
  * The sandbox ships no Arrow Flight jars and no Neo4j server, so the
  * client logic binds to this trait; a production deployment implements it
  * over gRPC Flight `do_action`/`do_put` (reference
  * neo4j_arrow_client.py:131-206). Implementations must be Serializable:
  * factories ship to executors for partition-parallel writes.
  */
trait FlightTransport extends Serializable {

  /** Flight `do_action`: JSON request → JSON response (may throw; callers
    * run the result through [[ArrowErrors.interpret]]).
    */
  def doAction(action: String, bodyJson: String): String

  /** Flight `do_put`: stream rows for the descriptor; returns
    * (rows, approxBytes) like the reference's `_write_batches`.
    */
  def doPut(descriptorJson: String, schema: StructType, rows: Iterator[Row]): (Long, Long)

  def close(): Unit = ()
}

/** In-memory fake service with the observable behavior the client needs:
  * tracks actions, counts puts, injects failures, and answers NOT_FOUND
  * for aborts of unknown imports. Thread-safe — executor tasks hit it
  * concurrently in local-mode tests.
  */
final class InMemoryFlightTransport extends FlightTransport {

  val actions = new ConcurrentLinkedQueue[(String, String)]()
  val putRows = new AtomicLong(0)
  val nodeRows = new AtomicLong(0)
  val edgeRows = new AtomicLong(0)
  val putCalls = new AtomicInteger(0)
  @volatile var importExists: Boolean = false
  /** Number of upcoming doAction calls that throw (retry testing). */
  val failNextActions = new AtomicInteger(0)
  @volatile var failMessage: String = "UNKNOWN: injected failure"

  private def name(bodyJson: String): String =
    "\"name\"\\s*:\\s*\"([^\"]*)\"".r.findFirstMatchIn(bodyJson)
      .map(_.group(1)).getOrElse("")

  override def doAction(action: String, bodyJson: String): String = {
    actions.add((action, bodyJson))
    if (failNextActions.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new RuntimeException(failMessage)
    action match {
      case "CREATE_DATABASE" | "CREATE_GRAPH" =>
        importExists = true
        s"""{"name": "${name(bodyJson)}"}"""
      case "NODE_LOAD_DONE" =>
        s"""{"name": "${name(bodyJson)}", "node_count": ${nodeRows.get}}"""
      case "RELATIONSHIP_LOAD_DONE" =>
        s"""{"name": "${name(bodyJson)}", "relationship_count": ${edgeRows.get}}"""
      case "ABORT" =>
        if (!importExists)
          throw new RuntimeException(s"NOT_FOUND: no arrow process for ${name(bodyJson)} not found")
        importExists = false
        s"""{"name": "${name(bodyJson)}"}"""
      case other =>
        throw new RuntimeException(s"INVALID_ARGUMENT: unsupported action $other")
    }
  }

  override def doPut(descriptorJson: String, schema: StructType,
                     rows: Iterator[Row]): (Long, Long) = {
    putCalls.incrementAndGet()
    var n = 0L
    var bytes = 0L
    rows.foreach { r =>
      n += 1
      bytes += RowSize.estimate(schema, r)
    }
    putRows.addAndGet(n)
    // match the discriminating field, not a bare substring — an import
    // *named* "relationship" must still count as its entity_type says
    if (descriptorJson.contains("\"entity_type\": \"relationship\""))
      edgeRows.addAndGet(n)
    else nodeRows.addAndGet(n)
    (n, bytes)
  }
}

/** Rough per-row payload size, standing in for Arrow buffer sizes in
  * throughput reporting.
  */
object RowSize {
  def estimate(schema: StructType, row: Row): Long = {
    var total = 0L
    var i = 0
    while (i < row.length) {
      total += (row.get(i) match {
        case null => 1L
        case s: String => 4L + s.length
        case a: Seq[_] => 4L + a.map {
          case s: String => 4L + s.length
          case _ => 8L
        }.sum
        case b: Array[Byte] => 4L + b.length
        case _ => 8L
      })
      i += 1
    }
    total
  }
}
