package graft.orchestrate

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class OrchestratorRunnerSpec extends AnyFunSuite {

  private def mkSnapshot(base: java.nio.file.Path, customer: String, ts: Long): Unit = {
    val d = base.resolve(customer).resolve(ts.toString)
    Files.createDirectories(d.resolve("nodes/E"))
    Files.writeString(d.resolve("nodes/E/p.parquet"), "x")
    Files.createDirectories(d.resolve("relationships/R"))
    Files.writeString(d.resolve("relationships/R/p.parquet"), "x")
  }

  private def await(deadlineMs: Long = 5000L)(cond: => Boolean): Boolean = {
    val end = System.currentTimeMillis() + deadlineMs
    while (!cond && System.currentTimeMillis() < end) Thread.sleep(10L)
    cond
  }

  test("runner discovers, loads, switches aliases, and writes status") {
    val base = Files.createTempDirectory("graft-runner")
    mkSnapshot(base, "c1", 100L)
    mkSnapshot(base, "c1", 200L)
    val loaded = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val statements = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val status = Files.createTempFile("graft-status", ".json")
    val runner = new OrchestratorRunner(
      base,
      healthCheck = () => Health.Status(healthy = true, "ok"),
      load = t => { loaded.add(s"${t.customerId}-${t.timestamp}"); Right(s"${t.customerId}-${t.timestamp}") },
      existingDbs = () => loaded.toArray.map(_.toString).toSeq,
      currentAliases = () => Map.empty,
      execute = statements.add(_),
      numWorkers = 2, scanIntervalMs = 50L, statusIntervalMs = 30L,
      statusFile = Some(status))
    runner.start()
    try {
      assert(await()(loaded.size == 2), s"loaded: $loaded")
      assert(await()(statements.toArray.exists(
        _ == "CREATE ALIAS c1 FOR DATABASE `c1-200`")), s"stmts: $statements")
      assert(await()(Files.readString(status).contains("\"tasks_completed\": 2")))
      // a snapshot dropped while running is picked up on the next scan
      mkSnapshot(base, "c2", 300L)
      assert(await()(loaded.toArray.map(_.toString).contains("c2-300")))
    } finally runner.stopAndDrain(2000L)
    val finalStatus = Files.readString(status)
    assert(finalStatus.contains("\"status\": \"stopped\""))
    assert(runner.queueSize == 0)
  }

  test("unhealthy gate defers work instead of loading") {
    val base = Files.createTempDirectory("graft-runner2")
    mkSnapshot(base, "c9", 1L)
    var loads = 0
    val runner = new OrchestratorRunner(
      base,
      healthCheck = () => Health.Status(healthy = false, "Too many databases (50 >= 50)"),
      load = _ => { loads += 1; Right("x") },
      existingDbs = () => Nil, currentAliases = () => Map.empty,
      execute = _ => (), numWorkers = 1, scanIntervalMs = 30L,
      statusIntervalMs = 1000L)
    runner.start()
    try {
      assert(await(500L)(runner.queueSize >= 1), "task should sit queued")
      assert(loads == 0)
    } finally runner.stopAndDrain(0L)
  }
}
