package graft.config

import org.scalatest.funsuite.AnyFunSuite

import graft.config.ConfigLoader._

class ConfigLoaderSpec extends AnyFunSuite {

  private val example =
    """neo4j:
      |  host: localhost
      |  arrow_port: 8491  # Arrow protocol port
      |  bolt_port: 7687
      |  user: neo4j
      |  password: ${NEO4J_PASSWORD}
      |  tls: false
      |  concurrency: 10
      |
      |dataset:
      |  base_path: 'data'  # quoted, with a trailing comment
      |
      |orchestrator:
      |  heap_threshold_percent: 85
      |  retry_backoff_base: 2
      |""".stripMargin

  test("parses the example shape with nesting, types, comments, quotes") {
    val env = Map("NEO4J_PASSWORD" -> "pw").get _
    val c = loadString(example, env)
    assert(get(c, "neo4j", "host").contains("localhost"))
    assert(get(c, "neo4j", "arrow_port").contains(8491))
    assert(get(c, "neo4j", "tls").contains(false))
    assert(get(c, "dataset", "base_path").contains("data"))
    assert(get(c, "orchestrator", "retry_backoff_base").contains(2))
  }

  test("password resolves from NEO4J_PASSWORD when placeholder") {
    val c = loadString(example, Map("NEO4J_PASSWORD" -> "secret").get _)
    assert(get(c, "neo4j", "password").contains("secret"))
  }

  test("missing NEO4J_PASSWORD raises the password error") {
    intercept[MissingPasswordException](loadString(example, _ => None))
  }

  test("empty password string also falls back to the env var") {
    val cfg = "neo4j:\n  password: ''\n"
    val c = loadString(cfg, Map("NEO4J_PASSWORD" -> "fromenv").get _)
    assert(get(c, "neo4j", "password").contains("fromenv"))
  }

  test("required ${VAR} missing fails; ${VAR:default} falls back") {
    intercept[MissingEnvVarException](loadString("a: ${SOME_VAR}\n", _ => None))
    val c = loadString("a: ${SOME_VAR:fallback}\nb: ${SET_VAR:unused}\n",
      Map("SET_VAR" -> "real").get _)
    assert(c("a") == "fallback")
    assert(c("b") == "real")
  }

  test("validate reports missing sections, neo4j keys, and bad bounds") {
    val env = Map("NEO4J_PASSWORD" -> "pw").get _
    assert(validate(loadString(example, env)).isEmpty)
    val broken = loadString(
      """neo4j:
        |  host: localhost
        |orchestrator:
        |  num_workers: 0
        |  scan_interval: 5
        |""".stripMargin, env)
    val errors = validate(broken)
    assert(errors.contains("Missing required config key: dataset"))
    assert(errors.contains("Missing required Neo4j config key: arrow_port"))
    assert(errors.contains("num_workers must be >= 1"))
    assert(!errors.exists(_.contains("scan_interval")))
  }

  test("nonexistent file raises FileNotFoundException") {
    intercept[java.io.FileNotFoundException](
      load(java.nio.file.Path.of("/nonexistent/config.yaml")))
  }

  test("loads the reference-shaped file from disk") {
    val p = java.nio.file.Files.createTempFile("graft-cfg", ".yaml")
    java.nio.file.Files.writeString(p, example)
    val c = load(p, Map("NEO4J_PASSWORD" -> "pw").get _)
    assert(get(c, "neo4j", "concurrency").contains(10))
  }
}
