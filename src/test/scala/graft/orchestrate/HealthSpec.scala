package graft.orchestrate

import org.scalatest.funsuite.AnyFunSuite

class HealthSpec extends AnyFunSuite {

  test("db count gate fails at the threshold, passes below") {
    assert(Health.checkDbCount(49, 50).healthy)
    val s = Health.checkDbCount(50, 50)
    assert(!s.healthy && s.message == "Too many databases (50 >= 50)")
  }

  test("heap gate: percent math, threshold inclusive, unavailable is None") {
    assert(Health.checkHeap(84, 100, 85.0).exists(_.healthy))
    val bad = Health.checkHeap(85, 100, 85.0).get
    assert(!bad.healthy && bad.message.contains("heap: 85.0%"))
    assert(Health.checkHeap(10, 0).isEmpty, "no JMX -> no verdict, not a failure")
  }

  test("combine returns first unhealthy, else healthy") {
    val ok = Health.Status(healthy = true, "Healthy")
    val bad = Health.Status(healthy = false, "nope")
    assert(Health.combine(Seq(ok, bad, ok)) == bad)
    assert(Health.combine(Seq(ok, ok)).healthy)
    assert(Health.combine(Nil).healthy)
  }
}
