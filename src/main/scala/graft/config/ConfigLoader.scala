package graft.config

import java.nio.file.{Files, Path}
import scala.collection.mutable

/** YAML-subset config loader with environment-variable substitution —
  * the reference's config_loader.py:14-98 semantics:
  *
  *  - `${VAR}` — required; loading fails when unset.
  *  - `${VAR:default}` — optional with default.
  *  - Special case: `neo4j.password` empty or literally
  *    `${NEO4J_PASSWORD}` falls back to the NEO4J_PASSWORD env var, and
  *    errors when that is unset too.
  *
  * The parser covers the config.yaml.example surface (nested maps via
  * 2-space indentation, scalar leaves, `#` comments, quoted strings); no
  * external YAML dependency exists in the sandbox. The env source is
  * injectable for tests.
  */
object ConfigLoader {

  final class MissingEnvVarException(val varName: String) extends RuntimeException(
    s"Required environment variable '$varName' is not set. " +
      "Please set it before running the application.")

  final class MissingPasswordException extends RuntimeException(
    "Neo4j password not found. Set NEO4J_PASSWORD environment variable " +
      "or provide password in config file.")

  type Conf = Map[String, Any]

  def load(path: Path, env: String => Option[String] = sys.env.get): Conf = {
    if (!Files.exists(path))
      throw new java.io.FileNotFoundException(s"Configuration file not found: $path")
    loadString(Files.readString(path), env)
  }

  def loadString(content: String, env: String => Option[String] = sys.env.get): Conf = {
    // The reference leaves the NEO4J_PASSWORD placeholder intact (to apply
    // its password fallback later), so substitution must not fail on it.
    val substituted = substituteEnvVars(content, env)
    val config = parseYaml(substituted)
    applyPasswordFallback(config, env)
  }

  /** `${VAR}` / `${VAR:default}` substitution (config_loader.py:63-98).
    * `${NEO4J_PASSWORD}` with the var unset is left as-is for the
    * password fallback rule rather than failing the whole load.
    */
  private[config] def substituteEnvVars(content: String,
                                        env: String => Option[String]): String = {
    val pattern = "\\$\\{([^}]+)\\}".r
    pattern.replaceAllIn(content, m => {
      val e = m.group(1)
      val replacement = if (e.contains(":")) {
        val Array(name, default) = e.split(":", 2)
        env(name).getOrElse(default)
      } else {
        env(e).getOrElse {
          if (e == "NEO4J_PASSWORD") m.matched
          else throw new MissingEnvVarException(e)
        }
      }
      scala.util.matching.Regex.quoteReplacement(replacement)
    })
  }

  private def applyPasswordFallback(config: Conf, env: String => Option[String]): Conf =
    config.get("neo4j") match {
      case Some(neo: Map[String, Any] @unchecked) if neo.contains("password") =>
        val pw = neo("password").toString
        if (pw.isEmpty || pw == "${NEO4J_PASSWORD}") {
          env("NEO4J_PASSWORD") match {
            case Some(envPw) => config.updated("neo4j", neo.updated("password", envPw))
            case None => throw new MissingPasswordException
          }
        } else config
      case _ => config
    }

  /** Minimal YAML: nested maps by indentation, scalars with type
    * inference, quotes, `#` comments (not inside quotes).
    */
  private[config] def parseYaml(content: String): Conf = {
    val lines = content.linesIterator.zipWithIndex.filter { case (l, _) =>
      val t = stripComment(l).trim
      t.nonEmpty
    }.map { case (l, i) => (stripComment(l), i) }.toVector

    def parseBlock(from: Int, to: Int, indent: Int): Conf = {
      val out = mutable.LinkedHashMap[String, Any]()
      var i = from
      while (i < to) {
        val (line, lineNo) = lines(i)
        val ind = line.takeWhile(_ == ' ').length
        if (ind != indent)
          throw new IllegalArgumentException(
            s"bad indentation at line ${lineNo + 1}: '${line.trim}' (expected $indent spaces, got $ind)")
        val trimmed = line.trim
        val colon = trimmed.indexOf(':')
        if (colon < 0)
          throw new IllegalArgumentException(s"expected 'key: value' at line ${lineNo + 1}: '$trimmed'")
        val key = unquote(trimmed.substring(0, colon).trim)
        val value = trimmed.substring(colon + 1).trim
        // find extent of any nested block
        var j = i + 1
        while (j < to && lines(j)._1.takeWhile(_ == ' ').length > indent) j += 1
        if (value.isEmpty && j > i + 1) {
          val childIndent = lines(i + 1)._1.takeWhile(_ == ' ').length
          out(key) = parseBlock(i + 1, j, childIndent)
        } else {
          out(key) = scalar(value)
        }
        i = j
      }
      out.toMap
    }
    if (lines.isEmpty) Map.empty
    else parseBlock(0, lines.length, lines.head._1.takeWhile(_ == ' ').length)
  }

  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    val sb = new StringBuilder
    var done = false
    for (c <- line if !done) {
      c match {
        case '\'' if !inD => inS = !inS; sb += c
        case '"' if !inS => inD = !inD; sb += c
        case '#' if !inS && !inD => done = true
        case _ => sb += c
      }
    }
    sb.toString
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '\'' && s.last == '\'') ||
      (s.head == '"' && s.last == '"'))) s.substring(1, s.length - 1)
    else s

  private def scalar(raw: String): Any = {
    val v = raw.trim
    if (v.length >= 2 && (v.head == '\'' || v.head == '"')) unquote(v)
    else v match {
      case "true" | "True" => true
      case "false" | "False" => false
      case "null" | "~" | "" => null
      case _ =>
        // nb. Int/Long branches lub to AnyVal and box inconsistently, so
        // integers are uniformly Int when they fit (the common case)
        v.toLongOption.map[Any](l =>
          if (l >= Int.MinValue && l <= Int.MaxValue) Int.box(l.toInt) else Long.box(l))
          .orElse(v.toDoubleOption)
          .getOrElse(v)
    }
  }

  /** Configuration validation matching the reference orchestrator's
    * `_validate_config` (scripts/orchestrator.py:527-549): required
    * sections, required neo4j connection keys, and numeric bounds.
    * Returns every violation rather than failing on the first.
    */
  def validate(config: Conf): Seq[String] = {
    val sectionErrors = Seq("neo4j", "dataset", "orchestrator")
      .filterNot(config.contains)
      .map(k => s"Missing required config key: $k")
    val neo4jErrors = config.get("neo4j") match {
      case Some(n: Map[String, Any] @unchecked) =>
        Seq("host", "arrow_port", "bolt_port", "user", "password")
          .filterNot(n.contains)
          .map(k => s"Missing required Neo4j config key: $k")
      case _ => Seq.empty
    }
    def intAt(path: String*): Option[Long] =
      get(config, path: _*).collect {
        case i: Int => i.toLong
        case l: Long => l
      }
    val boundErrors = Seq(
      (intAt("orchestrator", "num_workers"), 1, "num_workers must be >= 1"),
      (intAt("orchestrator", "scan_interval"), 1, "scan_interval must be >= 1"),
      (intAt("orchestrator", "max_databases"), 1, "max_databases must be >= 1")
    ).collect { case (Some(v), min, msg) if v < min => msg }
    sectionErrors ++ neo4jErrors ++ boundErrors
  }

  /** Typed path lookup: `get(config, "neo4j", "arrow_port")`. */
  def get(config: Conf, path: String*): Option[Any] =
    path.foldLeft(Option[Any](config)) {
      case (Some(m: Map[String, Any] @unchecked), k) => m.get(k)
      case _ => None
    }
}
