package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The coverage contract (SURVEY.md §2) must track the registered query
  * inventory — round 6's verdict found 11 shipped, passing queries with
  * no §2 row, which makes the judged operator table under-count real
  * work. This spec is the scriptable check VERDICT r6 item #3 asked
  * for: every key of [[SparkEntry.queries]] must be mentioned (as a
  * backticked name) somewhere inside §2. It reads the checked-in
  * SURVEY.md, so it runs wherever `sbt test` runs and fails the build
  * the moment a query is registered without a contract row.
  */
class SurveyCoverageSpec extends AnyFunSuite {

  test("every registered query has a SURVEY §2 row") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val start = survey.indexOf("## §2")
    val end = survey.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md must contain §2 and §3")
    val section2 = survey.substring(start, end)
    val mentioned = "`([a-z0-9_]+)`".r
      .findAllMatchIn(section2).map(_.group(1)).toSet
    val unlisted = SparkEntry.queries.keySet.diff(mentioned).toSeq.sorted
    assert(unlisted.isEmpty,
      s"registered queries missing from SURVEY §2: ${unlisted.mkString(", ")}")
  }

  /** VERDICT r10 item #2: §2 row ids duplicated twice in a row (r9: 13
    * collisions, r10: 7) because nothing mechanized uniqueness — the
    * judge's line-by-line table diff miscounts when two rows share an
    * id. Every `| <id> |` leading cell in §2 must be unique.
    */
  test("SURVEY §2 row ids are unique") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val start = survey.indexOf("## §2")
    val end = survey.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md must contain §2 and §3")
    val ids = survey.substring(start, end).linesIterator
      .flatMap("^\\| ([0-9][0-9a-z]*) \\|".r.findFirstMatchIn(_))
      .map(_.group(1)).toSeq
    val dups = ids.groupBy(identity).collect {
      case (id, hits) if hits.length > 1 => s"$id (x${hits.length})"
    }.toSeq.sorted
    assert(dups.isEmpty, s"duplicate SURVEY §2 row ids: ${dups.mkString(", ")}")
  }

  test("every oracle key is a registered query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty,
      s"oracleSql keys with no matching query: ${orphans.mkString(", ")}")
  }

  /** Reverse direction (VERDICT r7 item #8): a §2 row whose Gate cites a
    * query that is no longer registered is a DEAD row — the judged table
    * would over-count. Gate cells lead with spec/query names and keep
    * explanatory backticked tokens (DuckDB function names etc.) inside
    * parentheses, so the check strips parenthesized text and requires
    * every remaining backticked lowercase token to be a live query key.
    */
  test("every query name cited in a SURVEY §2 gate is registered") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val start = survey.indexOf("## §2")
    val end = survey.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md must contain §2 and §3")
    val gateCells = survey.substring(start, end).linesIterator
      .filter(l => l.startsWith("|") && !l.startsWith("| #") &&
        !l.startsWith("|--") && !l.startsWith("|---"))
      .map(_.split("\\|").map(_.trim).filter(_.nonEmpty))
      .collect { case cells if cells.length >= 3 => cells.last }
    val cited = gateCells.flatMap { cell =>
      val noParens = cell.replaceAll("\\([^()]*\\)", "")
        .replaceAll("\\([^()]*\\)", "") // one nesting level
      "`([a-z0-9_]+)`".r.findAllMatchIn(noParens).map(_.group(1))
    }.toSet
    val dead = cited.diff(SparkEntry.queries.keySet).toSeq.sorted
    assert(dead.isEmpty,
      s"SURVEY §2 gates cite unregistered queries: ${dead.mkString(", ")}")
  }

  /** VERDICT r13 item #8: query citations are checked both directions,
    * but a Gate cell citing `FooSpec` was not — renaming or deleting a
    * suite would silently orphan every spec-gated row. Every `FooSpec`
    * token in a §2 Gate cell must be a real suite file under src/test.
    */
  test("every spec name cited in a SURVEY §2 gate is a real test suite") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val start = survey.indexOf("## §2")
    val end = survey.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md must contain §2 and §3")
    val gateCells = survey.substring(start, end).linesIterator
      .filter(l => l.startsWith("|") && !l.startsWith("| #") &&
        !l.startsWith("|--") && !l.startsWith("|---"))
      .map(_.split("\\|").map(_.trim).filter(_.nonEmpty))
      .collect { case cells if cells.length >= 3 => cells.last }
    val cited = gateCells.flatMap { cell =>
      "\\b([A-Z][A-Za-z0-9]*Spec)\\b".r.findAllMatchIn(cell).map(_.group(1))
    }.toSet
    val suiteFiles = {
      val root = java.nio.file.Paths.get("src/test")
      val stream = java.nio.file.Files.walk(root)
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith("Spec.scala"))
        .map(_.stripSuffix(".scala"))
        .toSet
      finally stream.close()
    }
    val missing = cited.diff(suiteFiles).toSeq.sorted
    assert(missing.isEmpty,
      s"SURVEY §2 gates cite nonexistent test suites: ${missing.mkString(", ")}")
  }
}
