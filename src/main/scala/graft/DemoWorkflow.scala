package graft

import java.nio.file.Path

import org.apache.spark.sql.SparkSession

import graft.orchestrate.{BlueGreen, Snapshots, SystemCatalog}
import graft.sinks.FlightTransport
import graft.util.Log

/** The reference's end-to-end demo (scripts/demo_workflow.py) as a library
  * flow over the real pipeline pieces:
  *
  *  - Phase 1 (blue): load each customer's oldest snapshot and switch its
  *    alias to it.
  *  - Phase 2 (green): load each customer's newest snapshot WITHOUT
  *    switching — both deployments online, alias still on blue.
  *  - Phase 3 (cutover): atomically repoint every alias at the latest
  *    deployment.
  *  - Verification: read alias targets and database state back from the
  *    system catalog and report which database is active per customer
  *    (demo_workflow.py:87-135).
  */
object DemoWorkflow {

  final case class CustomerStatus(customerId: String, aliasTarget: Option[String],
                                  active: Boolean, databases: Seq[String])

  private val logger = Log.getLogger("graft.DemoWorkflow")

  def run(spark: SparkSession, base: Path,
          transportFactory: () => FlightTransport,
          catalog: SystemCatalog, concurrency: Int = 4): Seq[CustomerStatus] = {
    val snaps = Snapshots.scan(base).filter(_.complete)
    val byCustomer = snaps.groupBy(_.customerId).toSeq.sortBy(_._1)

    def load(customerId: String, ts: Long, switchAlias: Boolean): Unit = {
      // snapshot the catalog BEFORE registering the new db so the plans
      // see the pre-load world, then register it (the import creates it)
      val existing = catalog.showDatabases
      val aliases = catalog.showAliases
      catalog.createDatabase(BlueGreen.dbName(customerId, ts))
      val r = LoadPipeline.loadAndSwitch(spark, customerId, ts, base,
        transportFactory, existing, aliases, catalog.execute,
        switchAlias = switchAlias, concurrency = concurrency)
      logger.info(s"loaded ${r.database} (switch=$switchAlias)")
    }

    // Phase 1: blue — oldest snapshot per customer, alias switched
    byCustomer.foreach { case (c, ss) => load(c, ss.map(_.timestamp).min, switchAlias = true) }
    // Phase 2: green — newest snapshot per customer, no switch
    byCustomer.foreach { case (c, ss) =>
      val newest = ss.map(_.timestamp).max
      if (!catalog.showDatabases.contains(BlueGreen.dbName(c, newest)))
        load(c, newest, switchAlias = false)
    }
    // Phase 3: cutover — repoint every alias at the latest deployment
    byCustomer.foreach { case (c, _) =>
      val latest = catalog.showDatabases
        .flatMap(BlueGreen.parseDb).collect { case (`c`, ts) => ts }.max
      BlueGreen.setAliasPlan(catalog.showAliases, c, BlueGreen.dbName(c, latest))
        .foreach(catalog.execute)
    }
    // Verification: alias target + online state per customer
    byCustomer.map { case (c, _) =>
      val dbsForCustomer = catalog.showDatabases
        .filter(db => BlueGreen.parseDb(db).exists(_._1 == c)).sorted
      val target = catalog.showAliases.get(c)
      CustomerStatus(c, target, active = target.exists(dbsForCustomer.contains),
        dbsForCustomer)
    }
  }
}
