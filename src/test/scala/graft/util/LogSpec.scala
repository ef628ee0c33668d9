package graft.util

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class LogSpec extends AnyFunSuite {

  test("writes reference-format lines to file, honors level, flushes per write") {
    val f = Files.createTempFile("graft-log", ".log")
    val cfg = Log.setup(Some(f), console = false, minLevel = Log.Info)
    try {
      val logger = Log.getLogger("orchestrator")
      logger.debug("hidden")
      logger.info("starting up")
      logger.warn("pressure high")
      // no close needed before read: the handler flushes per write
      val lines = Files.readAllLines(f)
      assert(lines.size == 2)
      assert(lines.get(0).matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} - orchestrator - INFO - starting up"""))
      assert(lines.get(1).endsWith("orchestrator - WARNING - pressure high"))
    } finally {
      cfg.close()
      Log.setup(None, console = true)
    }
  }
}
