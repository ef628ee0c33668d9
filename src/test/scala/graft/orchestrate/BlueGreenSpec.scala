package graft.orchestrate

import org.scalatest.funsuite.AnyFunSuite

class BlueGreenSpec extends AnyFunSuite {

  test("setAliasPlan: create only when alias absent, drop-then-create when present") {
    assert(BlueGreen.setAliasPlan(Map.empty, "customer1", "customer1-100") ==
      Seq("CREATE ALIAS customer1 FOR DATABASE `customer1-100`"))
    assert(BlueGreen.setAliasPlan(Map("customer1" -> "customer1-50"),
      "customer1", "customer1-100") ==
      Seq("DROP ALIAS customer1 FOR DATABASE",
        "CREATE ALIAS customer1 FOR DATABASE `customer1-100`"))
  }

  test("parseDb splits on the last dash and requires a numeric timestamp") {
    assert(BlueGreen.parseDb("customer1-1767741427").contains(("customer1", 1767741427L)))
    assert(BlueGreen.parseDb("multi-part-name-99").contains(("multi-part-name", 99L)))
    assert(BlueGreen.parseDb("no_timestamp").isEmpty)
    assert(BlueGreen.parseDb("trailing-alpha").isEmpty)
  }

  test("isLatestDeployment matches reference semantics incl. empty peer set") {
    val dbs = Seq("c1-100", "c1-200", "c2-999")
    assert(BlueGreen.isLatestDeployment("c1", 200, dbs))
    assert(!BlueGreen.isLatestDeployment("c1", 150, dbs))
    assert(BlueGreen.isLatestDeployment("c3", 1, dbs), "no peers -> latest")
  }

  test("cleanupPlan drops beyond newest 2, never an aliased db") {
    val dbs = Seq("c1-100", "c1-200", "c1-300", "c1-400", "c2-1")
    val plan = BlueGreen.cleanupPlan("c1", dbs, aliases = Map("c1" -> "c1-400"))
    assert(plan == Seq("DROP DATABASE `c1-200` IF EXISTS",
      "DROP DATABASE `c1-100` IF EXISTS"))
    val protectedPlan = BlueGreen.cleanupPlan("c1", dbs,
      aliases = Map("old" -> "c1-100"))
    assert(protectedPlan == Seq("DROP DATABASE `c1-200` IF EXISTS"),
      "aliased old db must survive")
  }

  test("keep-2 of fewer than 3 deployments drops nothing") {
    assert(BlueGreen.cleanupPlan("c2", Seq("c2-1", "c2-2"), Map.empty).isEmpty)
  }

  test("teardownPlan drops aliases before databases, only for named customers") {
    val plan = BlueGreen.teardownPlan(
      customers = Seq("customer1", "customer2"),
      existingDbs = Seq("customer1-100", "customer1-200", "customer3-7", "other"),
      aliases = Map("customer1" -> "customer1-200", "customer3" -> "customer3-7"))
    assert(plan == Seq(
      "DROP ALIAS customer1 FOR DATABASE",
      "DROP DATABASE `customer1-200` IF EXISTS",
      "DROP DATABASE `customer1-100` IF EXISTS"))
  }

  test("teardownPlan also drops custom-named aliases pointing at a customer's db") {
    val plan = BlueGreen.teardownPlan(
      customers = Seq("customer1"),
      existingDbs = Seq("customer1-200"),
      aliases = Map("customer1-prod" -> "customer1-200", "keepme" -> "other-5"))
    assert(plan == Seq(
      "DROP ALIAS customer1-prod FOR DATABASE",
      "DROP DATABASE `customer1-200` IF EXISTS"))
  }
}
