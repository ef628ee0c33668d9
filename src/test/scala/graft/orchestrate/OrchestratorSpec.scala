package graft.orchestrate

import org.scalatest.funsuite.AnyFunSuite

import graft.orchestrate.Orchestrator._

class OrchestratorSpec extends AnyFunSuite {

  private val task = SnapshotTask("c1", 300L, "/data/c1/300")

  test("happy path: load, switch alias (latest), run keep-2 cleanup") {
    val executed = scala.collection.mutable.Buffer[String]()
    val stats = new Stats(() => 0L)
    val out = processTask(task,
      healthCheck = () => Health.Status(healthy = true, "ok"),
      load = t => Right(BlueGreen.dbName(t.customerId, t.timestamp)),
      existingDbs = () => Seq("c1-100", "c1-200", "c1-300"),
      currentAliases = () => Map("c1" -> "c1-200"),
      execute = executed += _,
      stats = stats)
    assert(out == Completed("c1-300", aliasSwitched = true))
    assert(executed == Seq(
      "DROP ALIAS c1 FOR DATABASE",
      "CREATE ALIAS c1 FOR DATABASE `c1-300`",
      "DROP DATABASE `c1-100` IF EXISTS"))
    assert(stats.snapshot()("tasks_completed") == 1L)
  }

  test("an older snapshot loads without stealing the alias") {
    val executed = scala.collection.mutable.Buffer[String]()
    val out = processTask(task.copy(timestamp = 150L),
      healthCheck = () => Health.Status(healthy = true, "ok"),
      load = t => Right(BlueGreen.dbName(t.customerId, t.timestamp)),
      existingDbs = () => Seq("c1-150", "c1-200"),
      currentAliases = () => Map("c1" -> "c1-200"),
      execute = executed += _,
      stats = new Stats(() => 0L))
    assert(out == Completed("c1-150", aliasSwitched = false))
    assert(executed.isEmpty)
  }

  test("unhealthy gate defers without loading") {
    var loaded = false
    val out = processTask(task,
      healthCheck = () => Health.Status(healthy = false, "Too many databases (50 >= 50)"),
      load = _ => { loaded = true; Right("x") },
      existingDbs = () => Nil, currentAliases = () => Map.empty,
      execute = _ => (), stats = new Stats(() => 0L))
    assert(out == Deferred("Too many databases (50 >= 50)"))
    assert(!loaded)
  }

  test("failures back off exponentially then exhaust") {
    val o1 = decideRetry(task, "boom", maxRetries = 3, backoffBase = 2)
    val RetryScheduled(t1, d1) = o1: @unchecked
    assert(d1 == 2 && t1.retryCount == 1 && t1.lastError.contains("boom"))
    val RetryScheduled(t2, d2) = decideRetry(t1, "boom", 3, 2): @unchecked
    assert(d2 == 4)
    val RetryScheduled(t3, d3) = decideRetry(t2, "boom", 3, 2): @unchecked
    assert(d3 == 8)
    assert(decideRetry(t3, "boom", 3, 2) == Failed("boom"))
  }

  test("scanStep discovers, enqueues, marks processed, updates stats") {
    val base = java.nio.file.Files.createTempDirectory("graft-orch")
    val d = base.resolve("c9/500")
    java.nio.file.Files.createDirectories(d.resolve("nodes/E"))
    java.nio.file.Files.writeString(d.resolve("nodes/E/p.parquet"), "x")
    java.nio.file.Files.createDirectories(d.resolve("relationships/R"))
    java.nio.file.Files.writeString(d.resolve("relationships/R/p.parquet"), "x")
    val q = new java.util.concurrent.ConcurrentLinkedQueue[SnapshotTask]()
    val processed = scala.collection.mutable.Set[(String, Long)]()
    val stats = new Stats(() => 0L)
    val found = scanStep(base, processed, q, stats)
    assert(found.map(_.customerId) == Seq("c9"))
    assert(q.size == 1 && processed.contains(("c9", 500L)))
    // second scan: nothing new
    assert(scanStep(base, processed, q, stats).isEmpty)
    assert(stats.snapshot(q.size)("tasks_discovered") == 1L)
  }

  test("stats snapshot math") {
    var t = 0L
    val s = new Stats(() => t)
    s.recordDiscovery(); s.recordDiscovery(); s.recordCompletion(); s.recordRetry()
    t = 5000L
    val snap = s.snapshot(queueSize = 3)
    assert(snap("uptime_seconds") == 5L)
    assert(snap("tasks_discovered") == 2L)
    assert(snap("success_rate") == 50.0)
    assert(snap("queue_size") == 3)
  }
}
