package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.util.Retry

/** Bulk-import client: the lifecycle state machine of the reference's
  * Neo4jArrowClient (neo4j_arrow_client.py:30-295) over a pluggable
  * [[FlightTransport]].
  *
  * Lifecycle: READY --createDatabase--> FEEDING_NODES --nodesDone-->
  * FEEDING_EDGES --edgesDone--> AWAITING_GRAPH; abort() from anywhere
  * back to READY.
  *
  * Serializable with `copy()` semantics like the reference's
  * `__getstate__`: the transport is created lazily per JVM from the
  * factory, so a client configured on the driver can ship to executors.
  */
object ArrowGraphClient {
  sealed abstract class State(val name: String)
  case object Ready extends State("ready")
  case object FeedingNodes extends State("feeding_nodes")
  case object FeedingEdges extends State("feeding_edges")
  case object AwaitingGraph extends State("awaiting_graph")
  case object GraphReady extends State("done")

  final class StateError(msg: String) extends IllegalStateException(msg)

  /** Default import config (reference create_database defaults,
    * neo4j_arrow_client.py:226-243).
    */
  def defaultImportConfig(database: String, concurrency: Int): Map[String, Any] =
    Map("name" -> database, "concurrency" -> concurrency, "high_io" -> true,
      "force" -> true, "record_format" -> "aligned", "id_property" -> "id",
      "id_type" -> "INTEGER")

  private[sinks] def toJson(m: Map[String, Any]): String =
    m.map { case (k, v) =>
      val jv = v match {
        case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        case b: Boolean => b.toString
        case n: Long => n.toString
        case n: Int => n.toString
        case n: Double => n.toString
        case other => "\"" + other.toString + "\""
      }
      s""""$k": $jv"""
    }.mkString("{", ", ", "}")

  private[sinks] def jsonField(json: String, field: String): Option[String] = {
    val str = ("\"" + field + "\"\\s*:\\s*\"([^\"]*)\"").r
    val num = ("\"" + field + "\"\\s*:\\s*(-?\\d+)").r
    str.findFirstMatchIn(json).map(_.group(1))
      .orElse(num.findFirstMatchIn(json).map(_.group(1)))
  }
}

final class ArrowGraphClient(
    transportFactory: () => FlightTransport,
    val database: String,
    val concurrency: Int = 4,
    val projection: Option[String] = None,
    maxRetries: Int = 10,
    retryDelayMs: Long = 3000L,
    sleep: Long => Unit = Thread.sleep) extends Serializable {

  import ArrowGraphClient._

  @volatile private var _state: State = Ready
  def state: State = _state

  @transient private lazy val transport: FlightTransport = transportFactory()

  private def importName: String = projection.getOrElse(database)

  /** Copy with the current state, minus the live transport — the
    * reference's `copy()` for handing to pool workers.
    */
  def copy(): ArrowGraphClient = {
    val c = new ArrowGraphClient(transportFactory, database, concurrency,
      projection, maxRetries, retryDelayMs, sleep)
    c._state = _state
    c
  }

  private def sendAction(action: String, body: Map[String, Any]): String =
    try transport.doAction(action, toJson(body))
    catch { case e: Throwable => throw ArrowErrors.interpret(e) }

  /** CREATE_DATABASE with retry-on-failure (10 × 3s in the reference,
    * neo4j_arrow_client.py:225-243). Success moves to FEEDING_NODES.
    */
  def createDatabase(config: Map[String, Any] = Map.empty): String = {
    val cfg = if (config.nonEmpty) config
      else defaultImportConfig(database, concurrency)
    val result = Retry.withRetry(maxRetries, retryDelayMs, sleep) {
      sendAction("CREATE_DATABASE", cfg)
    }
    if (result.nonEmpty) _state = FeedingNodes
    result
  }

  /** CREATE_GRAPH (GDS projection) — requires READY. */
  def createProjection(config: Map[String, Any] = Map.empty): String = {
    if (_state != Ready)
      throw new StateError(s"createProjection requires READY, was ${_state.name}")
    val cfg = if (config.nonEmpty) config
      else Map("name" -> projection.getOrElse(database),
        "database_name" -> database, "concurrency" -> concurrency)
    val result = sendAction("CREATE_GRAPH", cfg)
    if (result.nonEmpty) _state = FeedingNodes
    result
  }

  /** Stream one partition of node rows. Requires FEEDING_NODES. */
  def writeNodes(schema: StructType, rows: Iterator[Row]): (Long, Long) = {
    if (_state != FeedingNodes)
      throw new StateError(s"writeNodes requires FEEDING_NODES, was ${_state.name}")
    val desc = toJson(Map("name" -> importName, "entity_type" -> "node"))
    transport.doPut(desc, schema, rows)
  }

  /** NODE_LOAD_DONE → FEEDING_EDGES; returns the server node count. */
  def nodesDone(): Long = {
    if (_state != FeedingNodes)
      throw new StateError(s"nodesDone requires FEEDING_NODES, was ${_state.name}")
    val result = sendAction("NODE_LOAD_DONE", Map("name" -> importName))
    _state = FeedingEdges
    jsonField(result, "node_count").map(_.toLong).getOrElse(0L)
  }

  /** Stream one partition of edge rows. Requires FEEDING_EDGES. */
  def writeEdges(schema: StructType, rows: Iterator[Row]): (Long, Long) = {
    if (_state != FeedingEdges)
      throw new StateError(s"writeEdges requires FEEDING_EDGES, was ${_state.name}")
    val desc = toJson(Map("name" -> importName, "entity_type" -> "relationship"))
    transport.doPut(desc, schema, rows)
  }

  /** RELATIONSHIP_LOAD_DONE → AWAITING_GRAPH; returns the edge count. */
  def edgesDone(): Long = {
    if (_state != FeedingEdges)
      throw new StateError(s"edgesDone requires FEEDING_EDGES, was ${_state.name}")
    val result = sendAction("RELATIONSHIP_LOAD_DONE", Map("name" -> importName))
    _state = AwaitingGraph
    jsonField(result, "relationship_count").map(_.toLong).getOrElse(0L)
  }

  /** Abort an import. Returns true when one was aborted; false when none
    * exists — NOT_FOUND is the normal no-op case and is swallowed
    * silently (neo4j_arrow_client.py:97-129).
    */
  def abort(name: Option[String] = None): Boolean = {
    val target = name.getOrElse(database)
    try {
      val result = sendAction("ABORT", Map("name" -> target))
      if (jsonField(result, "name").contains(target)) {
        _state = Ready
        true
      } else throw new ArrowErrors.UnknownError(
        s"invalid response for abort of graph $database, got $result")
    } catch {
      case _: ArrowErrors.NotFound => false
    }
  }

  def close(): Unit = transport.close()
}
