package graft.orchestrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blue/green alias planning — the pure-logic core of the reference's
  * alias scripts (scripts/load_with_aliases.py:177-249,
  * scripts/manage_aliases.py:21-105, cleanup at scripts/orchestrator.py:386-430),
  * lifted out of the Neo4j driver so it is unit-testable and the statements
  * can be replayed against any system-database session.
  */
object BlueGreen {

  /** Neo4j database name for a customer snapshot: dash-separated (the
    * reference notes Neo4j disallows underscores in db names).
    */
  def dbName(customerId: String, timestamp: Long): String =
    s"$customerId-$timestamp"

  private def quote(db: String): String = s"`$db`"

  /** Statements to point `alias` at `target`: drop-then-create, dropping
    * only when the alias currently exists (the reference's ignore-error
    * drop becomes an explicit plan).
    */
  def setAliasPlan(currentAliases: Map[String, String], alias: String,
                   target: String): Seq[String] = {
    val drop = if (currentAliases.contains(alias))
      Seq(s"DROP ALIAS $alias FOR DATABASE") else Seq.empty
    drop :+ s"CREATE ALIAS $alias FOR DATABASE ${quote(target)}"
  }

  /** Is `timestamp` the latest deployment among `existingDbs` (names in
    * `customer-timestamp` form) for this customer? True when no parseable
    * peer exists — matching the reference (`orchestrator.py:358-380`).
    */
  def isLatestDeployment(customerId: String, timestamp: Long,
                         existingDbs: Seq[String]): Boolean = {
    val peers = existingDbs.flatMap(parseDb).collect {
      case (c, ts) if c == customerId => ts
    }
    peers.isEmpty || timestamp >= peers.max
  }

  /** Parse `customer-timestamp`; the timestamp is the last dash segment. */
  def parseDb(db: String): Option[(String, Long)] = {
    val i = db.lastIndexOf('-')
    if (i <= 0) None
    else db.substring(i + 1).toLongOption.map(ts => (db.substring(0, i), ts))
  }

  /** Keep-newest-2 cleanup: databases to drop for a customer, never
    * dropping one an alias still points at (`orchestrator.py:386-430`).
    */
  def cleanupPlan(customerId: String, existingDbs: Seq[String],
                  aliases: Map[String, String], keep: Int = 2): Seq[String] = {
    val parsed = existingDbs.flatMap(db => parseDb(db).map { case (c, ts) => (c, ts, db) })
      .filter(_._1 == customerId)
      .sortBy(-_._2)
    parsed.drop(keep)
      .filterNot { case (_, _, db) => aliases.values.exists(_ == db) }
      .map { case (_, _, db) => s"DROP DATABASE ${quote(db)} IF EXISTS" }
  }

  /** Pre-load cleanup for a redeploy of the same db name
    * (load_with_aliases.py:56-88): when the target database already
    * exists, drop any alias pointing at it, then drop the database —
    * clearing stuck state from a previous failed load.
    */
  def preloadCleanupPlan(dbName: String, existingDbs: Seq[String],
                         aliases: Map[String, String]): Seq[String] =
    if (!existingDbs.contains(dbName)) Seq.empty
    else aliases.toSeq.sortBy(_._1).collect {
      case (alias, target) if target == dbName => s"DROP ALIAS $alias FOR DATABASE"
    } :+ s"DROP DATABASE ${quote(dbName)} IF EXISTS"

  /** Full teardown plan for a set of customers — the reference's demo
    * cleanup (scripts/cleanup_demo.py): drop every alias belonging to a
    * customer, then every `customer-timestamp` database, aliases first so
    * no alias ever dangles.
    */
  def teardownPlan(customers: Seq[String], existingDbs: Seq[String],
                   aliases: Map[String, String]): Seq[String] = {
    val customerSet = customers.toSet
    // an alias belongs to the teardown if it is named after a customer OR
    // points at one of the customer's databases (custom alias names must
    // not dangle after their target drops)
    val aliasDrops = aliases.toSeq.sortBy(_._1)
      .filter { case (name, target) =>
        customerSet.contains(name) ||
          parseDb(target).exists(p => customerSet.contains(p._1))
      }
      .map { case (name, _) => s"DROP ALIAS $name FOR DATABASE" }
    val dbDrops = customers.distinct.sorted.flatMap(c =>
      cleanupPlan(c, existingDbs, aliases = Map.empty, keep = 0))
    aliasDrops ++ dbDrops
  }

  /** DataFrame form of keep-newest-2 at fleet scale: input
    * (customer_id, snapshot_ts, entity_id), output the deployments beyond
    * the newest `keep` per customer. Window over customer partitions —
    * shuffles once on customer_id, no driver loop.
    */
  def keepNewestK(deployments: DataFrame, keep: Int = 2): DataFrame = {
    val w = Window.partitionBy("customer_id")
      .orderBy(desc("snapshot_ts"), desc("entity_id"))
    deployments
      .withColumn("drop_rank", row_number().over(w).cast("long"))
      .filter(col("drop_rank") > keep)
      .withColumn("db_name",
        concat(col("customer_id").cast("string"), lit("-"),
          col("snapshot_ts").cast("string")))
      .select(col("customer_id"), col("db_name"), col("drop_rank"))
  }
}
