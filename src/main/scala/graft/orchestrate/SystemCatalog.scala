package graft.orchestrate

/** In-memory system-database double: applies the alias/database DDL the
  * [[BlueGreen]] planners emit and answers SHOW-style queries — the
  * test-side stand-in for the reference's Neo4j system session
  * (scripts/demo_workflow.py:87-135 reads `SHOW ALIASES FOR DATABASE` /
  * `SHOW DATABASES`, scripts/manage_aliases.py:21-105 the same). A
  * production deployment replays the identical statement strings against a
  * real bolt session; this class exists so every pipeline test can assert
  * the *resulting* catalog state, not just the statement text.
  *
  * Semantics mirrored from the reference: DROP ALIAS is ignore-missing
  * (the reference swallows that error), CREATE ALIAS requires the target
  * database to exist, and a database still pointed at by an alias refuses
  * to drop (Neo4j's own behavior, which the keep-2 planner must respect).
  */
final class SystemCatalog {

  private val dbs = scala.collection.mutable.LinkedHashSet[String]()
  private val aliasMap = scala.collection.mutable.LinkedHashMap[String, String]()

  /** Register a database (the side effect of a completed bulk import). */
  def createDatabase(name: String): Unit = synchronized { dbs += name }

  private val CreateAlias = """CREATE ALIAS (\S+) FOR DATABASE `(.+)`""".r
  private val DropAlias = """DROP ALIAS (\S+) FOR DATABASE""".r
  private val DropDb = """DROP DATABASE `(.+)` IF EXISTS""".r

  def execute(stmt: String): Unit = synchronized {
    stmt match {
      case CreateAlias(alias, target) =>
        require(dbs.contains(target), s"alias target does not exist: $target")
        require(!aliasMap.contains(alias),
          s"alias already exists: $alias (plan must drop first)")
        aliasMap(alias) = target
      case DropAlias(alias) =>
        aliasMap.remove(alias) // ignore-missing, like the reference
      case DropDb(db) =>
        require(!aliasMap.values.exists(_ == db),
          s"cannot drop $db: an alias still points at it")
        dbs -= db
      case other =>
        throw new IllegalArgumentException(s"unsupported statement: $other")
    }
  }

  def showAliases: Map[String, String] = synchronized(aliasMap.toMap)
  def showDatabases: Seq[String] = synchronized(dbs.toSeq)
}
