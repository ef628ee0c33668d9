package graft.util

import java.io.{FileWriter, PrintWriter}
import java.nio.file.{Files, Path}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

/** Minimal structured logging in the shape of the reference's
  * logging_config.py: timestamped `name - LEVEL - message` lines to an
  * append-only, flush-per-write file plus optional console. Spark itself
  * logs through log4j; this covers the orchestration components that the
  * reference logs through its own root logger.
  */
object Log {

  sealed abstract class Level(val rank: Int, val label: String)
  case object Debug extends Level(0, "DEBUG")
  case object Info extends Level(1, "INFO")
  case object Warn extends Level(2, "WARNING")
  case object Error extends Level(3, "ERROR")

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneOffset.UTC)

  final class Logger private[Log] (val name: String) {
    // resolve the config at call time: a later setup() retargets every
    // existing logger, like reconfiguring the root logger in the reference
    def log(level: Level, msg: String): Unit = {
      val cfg = config
      if (level.rank >= cfg.minLevel.rank) cfg.emit(
        s"${fmt.format(Instant.now())} - $name - ${level.label} - $msg")
    }
    def debug(msg: String): Unit = log(Debug, msg)
    def info(msg: String): Unit = log(Info, msg)
    def warn(msg: String): Unit = log(Warn, msg)
    def error(msg: String): Unit = log(Error, msg)
  }

  final class Config(logFile: Option[Path], console: Boolean,
                     private[Log] val minLevel: Level) {
    private val writer: Option[PrintWriter] = logFile.map { p =>
      Option(p.getParent).foreach(Files.createDirectories(_))
      new PrintWriter(new FileWriter(p.toFile, true), true) // flush-per-line
    }
    private[Log] def emit(line: String): Unit = synchronized {
      writer.foreach(_.println(line))
      if (console) System.out.println(line)
    }
    def close(): Unit = writer.foreach(_.close())
  }

  @volatile private var config = new Config(None, console = true, Info)

  /** Reconfigure the sink (reference setup_logging: file + console). */
  def setup(logFile: Option[Path] = None, console: Boolean = true,
            minLevel: Level = Info): Config = {
    val c = new Config(logFile, console, minLevel)
    config = c
    c
  }

  def getLogger(name: String): Logger = new Logger(name)
}
