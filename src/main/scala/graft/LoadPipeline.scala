package graft

import java.nio.file.Path

import org.apache.spark.sql.SparkSession

import graft.config.ConfigLoader
import graft.orchestrate.{BlueGreen, Orchestrator, Snapshots}
import graft.sinks.{ArrowGraphClient, FlightTransport, GraphWriter}
import graft.sources.GraphFrames
import graft.util.Log

/** End-to-end blue/green load — the Spark-native form of the reference's
  * `load_database` + `load_and_switch` flow (scripts/load_with_aliases.py:
  * 35-249):
  *
  *  1. abort any stuck import for the target db (silent when none),
  *  2. CREATE_DATABASE through the retrying client,
  *  3. stream `nodes/` — read parquet fragment dirs, normalize, fan out
  *     partition-parallel through executor-side transports,
  *  4. NODE_LOAD_DONE, then the same for `relationships/`,
  *  5. RELATIONSHIP_LOAD_DONE, and emit the alias-switch statement plan.
  *
  * The `system` hook receives the alias/cleanup statements the reference
  * runs against Neo4j's system database; production binds it to a bolt
  * session, tests to a buffer.
  */
object LoadPipeline {

  final case class LoadResult(database: String, nodeCount: Long,
                              relationshipCount: Long, nodeBytes: Long,
                              relationshipBytes: Long,
                              aliasStatements: Seq[String])

  private val logger = Log.getLogger("graft.LoadPipeline")

  def loadDatabase(spark: SparkSession, customerId: String, timestamp: Long,
                   dataPath: Path, transportFactory: () => FlightTransport,
                   concurrency: Int = 4): LoadResult = {
    val dbName = BlueGreen.dbName(customerId, timestamp)
    logger.info(s"Loading $customerId data to database: $dbName")

    val client = new ArrowGraphClient(transportFactory, dbName, concurrency)
    client.abort(Some(dbName)) // clean up any stuck import; false is normal

    client.createDatabase(ArrowGraphClient.defaultImportConfig(dbName, concurrency)
      ++ Map("id_type" -> "STRING")) // reference load uses STRING ids
    val nodes = GraphFrames.readNodes(spark, dataPath.resolve("nodes").toString)
    val (nodeRows, nodeBytes) = GraphWriter.writeNodes(nodes, client)
    val nodeCount = client.nodesDone()
    logger.info(f"Loaded $nodeRows%,d nodes (~$nodeBytes%,d bytes)")

    val edges = GraphFrames.readEdges(spark, dataPath.resolve("relationships").toString)
    val (edgeRows, edgeBytes) = GraphWriter.writeEdges(edges, client)
    val relCount = client.edgesDone()
    logger.info(f"Loaded $edgeRows%,d relationships (~$edgeBytes%,d bytes)")

    LoadResult(dbName, nodeCount, relCount, nodeBytes, edgeBytes, Seq.empty)
  }

  /** Load + alias switch when latest + keep-2 cleanup, mirroring one
    * orchestrator worker step over a discovered snapshot.
    */
  def loadAndSwitch(spark: SparkSession, customerId: String, timestamp: Long,
                    dataBasePath: Path, transportFactory: () => FlightTransport,
                    existingDbs: Seq[String], currentAliases: Map[String, String],
                    system: String => Unit, switchAlias: Boolean = true,
                    concurrency: Int = 4): LoadResult = {
    val dataPath = dataBasePath.resolve(customerId).resolve(timestamp.toString)
    require(java.nio.file.Files.isDirectory(dataPath), s"Data path not found: $dataPath")
    // redeploy of an existing db name: drop its aliases + the db first,
    // clearing stuck state (load_with_aliases.py:56-88)
    val dbName = BlueGreen.dbName(customerId, timestamp)
    val preDrop = BlueGreen.preloadCleanupPlan(dbName, existingDbs, currentAliases)
    preDrop.foreach(system)
    val dbsAfterPreDrop = existingDbs.filterNot(_ == dbName)
    val aliasesAfterPreDrop = currentAliases.filterNot(_._2 == dbName)
    val result = loadDatabase(spark, customerId, timestamp, dataPath,
      transportFactory, concurrency)
    val dbsAfter = dbsAfterPreDrop :+ result.database
    val statements =
      (if (switchAlias && BlueGreen.isLatestDeployment(customerId, timestamp, dbsAfter))
        BlueGreen.setAliasPlan(aliasesAfterPreDrop, customerId, result.database)
      else Seq.empty) ++
        BlueGreen.cleanupPlan(customerId, dbsAfter, aliasesAfterPreDrop)
    statements.foreach(system)
    result.copy(aliasStatements = preDrop ++ statements)
  }

  /** CLI: scan a snapshot base dir and load everything new, like one
    * orchestrator cycle. Args: <dataBasePath> [configPath].
    */
  def main(args: Array[String]): Unit = {
    val base = Path.of(args.headOption.getOrElse("data"))
    val concurrency = args.lift(1)
      .map(p => ConfigLoader.load(Path.of(p)))
      .flatMap(c => ConfigLoader.get(c, "worker", "concurrency"))
      .collect { case i: Int => i }.getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one JVM-shared fake service for the local demo (in production the
    // factory opens a Flight connection to the same server from each task)
    val snaps = Snapshots.newSnapshots(Snapshots.scan(base), Set.empty)
    snaps.foreach { s =>
      val r = loadAndSwitch(spark, s.customerId, s.timestamp, base,
        DemoTransport.factory, existingDbs = Seq.empty,
        currentAliases = Map.empty,
        system = stmt => logger.info(s"system> $stmt"), concurrency = concurrency)
      logger.info(s"Complete! Database: ${r.database} nodes=${r.nodeCount} rels=${r.relationshipCount}")
    }
    spark.stop()
  }
}

/** JVM-wide fake service endpoint for [[LoadPipeline.main]] local runs. */
object DemoTransport {
  lazy val shared = new graft.sinks.InMemoryFlightTransport
  val factory: () => FlightTransport = () => DemoTransport.shared
}

/** Resettable JVM-wide transport for the registered `load_e2e` query:
  * executor tasks resolve the singleton through the object reference
  * (local-mode only — production factories open one Flight connection
  * per executor), and `reset()` gives each query invocation fresh
  * counters so repeated Verify/Bench runs stay deterministic.
  */
object E2eTransport {
  @volatile var current = new graft.sinks.InMemoryFlightTransport
  def reset(): graft.sinks.InMemoryFlightTransport = {
    current = new graft.sinks.InMemoryFlightTransport
    current
  }
  val factory: () => FlightTransport = () => E2eTransport.current
}
