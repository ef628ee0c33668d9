package graft.util

import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  test("succeeds after transient failures, sleeping between attempts") {
    var calls = 0
    val sleeps = scala.collection.mutable.Buffer[Long]()
    val out = Retry.withRetry(5, 30L, sleeps += _) {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"fail $calls")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(sleeps.toSeq == Seq(30L, 30L))
  }

  test("rethrows the last error after maxRetries attempts") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withRetry(3, 0L, _ => ()) { calls += 1; throw new RuntimeException(s"fail $calls") }
    }
    assert(calls == 3 && e.getMessage == "fail 3")
  }

  test("onRetry observes each failure with its attempt number") {
    val seen = scala.collection.mutable.Buffer[(String, Int)]()
    intercept[RuntimeException] {
      Retry.withRetry(3, 0L, _ => (), (e, n) => seen += ((e.getMessage, n))) {
        throw new RuntimeException("x")
      }
    }
    assert(seen.toSeq == Seq(("x", 1), ("x", 2)))
  }

  test("exponential backoff matches the reference schedule (2s, 4s, 8s)") {
    assert((1 to 3).map(Backoff.exponentialSeconds(2, _)) == Seq(2L, 4L, 8L))
    assert(Backoff.exponentialSeconds(3, 2) == 9L)
  }
}
