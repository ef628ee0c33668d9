package graft.sinks

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

class ArrowAuthSpec extends AnyFunSuite {

  private def b64(s: String) =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  test("sends lowercase basic authorization before any token") {
    val a = new ArrowAuth("neo4j", "s3cret")
    assert(a.sendingHeaders() == Map("authorization" -> s"Basic ${b64("neo4j:s3cret")}"))
  }

  test("reference mode (ttl=0) keeps sending basic even after a bearer arrives") {
    val a = new ArrowAuth("u", "p", tokenTtlSeconds = 0)
    a.receivedHeaders(Map("Authorization" -> "Bearer tok123"))
    assert(a.sendingHeaders()("authorization").startsWith("Basic "))
  }

  test("with a TTL the captured bearer is reused until it expires") {
    var t = 1000L
    val a = new ArrowAuth("u", "p", tokenTtlSeconds = 600, now = () => t)
    a.receivedHeaders(Map("Authorization" -> "Bearer tok123"))
    assert(a.sendingHeaders() == Map("authorization" -> "Bearer tok123"))
    t += 601
    assert(a.sendingHeaders()("authorization").startsWith("Basic "))
  }

  test("non-bearer and missing auth headers are ignored") {
    val a = new ArrowAuth("u", "p", tokenTtlSeconds = 600)
    a.receivedHeaders(Map("Authorization" -> "Basic xyz"))
    a.receivedHeaders(Map("content-type" -> "application/grpc"))
    assert(a.sendingHeaders()("authorization").startsWith("Basic "))
  }
}
