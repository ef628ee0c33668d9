package graft

import java.nio.file.{Files, Path}

import graft.orchestrate.{Snapshots, SystemCatalog}
import graft.SparkSpec

class DemoWorkflowSpec extends SparkSpec {
  import spark.implicits._

  private def mkSource(dir: Path): Unit = {
    Seq((1L, "Entity,Company", "acme"), (2L, "Entity", "globex"))
      .toDF("id", "labels", "name")
      .write.parquet(dir.resolve("nodes/Entity").toString)
    Seq((1L, 2L, "OWNS")).toDF("src", "dst", "typ")
      .write.parquet(dir.resolve("relationships/OWNS").toString)
  }

  test("seedLayout + demo workflow: blue load, green load, cutover, verify") {
    val source = Files.createTempDirectory("graft-demo-src")
    mkSource(source)
    val base = Files.createTempDirectory("graft-demo-data")
    val n = Snapshots.seedLayout(source, base,
      Seq("customer1", "customer2"), Seq(100L, 200L))
    assert(n == 4)
    assert(Snapshots.scan(base).count(_.complete) == 4)

    val catalog = new SystemCatalog
    val report = DemoWorkflow.run(spark, base, PipelineTransport.factory, catalog)
    assert(report.map(_.customerId) == Seq("customer1", "customer2"))
    report.foreach { st =>
      assert(st.aliasTarget.contains(s"${st.customerId}-200"),
        s"cutover must point ${st.customerId} at the latest deployment: $st")
      assert(st.active, s"alias target must be an online database: $st")
      assert(st.databases == Seq(s"${st.customerId}-100", s"${st.customerId}-200"),
        "both blue and green stay online after cutover (keep-2)")
    }
  }

  test("simulateSnapshot copies an existing snapshot to a new timestamp") {
    val source = Files.createTempDirectory("graft-sim-src")
    mkSource(source)
    val base = Files.createTempDirectory("graft-sim-data")
    Snapshots.seedLayout(source, base, Seq("c1"), Seq(100L))
    assert(Snapshots.simulateSnapshot(base, "c1", sourceTs = 100L, newTs = 999L).isDefined)
    val scanned = Snapshots.scan(base)
    assert(scanned.map(_.timestamp).toSet == Set(100L, 999L))
    assert(scanned.forall(_.complete), "copied snapshot must be complete")
    assert(Snapshots.simulateSnapshot(base, "c1", sourceTs = 555L, newTs = 1000L).isEmpty,
      "missing source snapshot yields None")
  }

  test("system catalog enforces reference DDL semantics") {
    val cat = new SystemCatalog
    cat.createDatabase("c1-100")
    intercept[IllegalArgumentException] {
      cat.execute("CREATE ALIAS c1 FOR DATABASE `missing-1`")
    }
    cat.execute("CREATE ALIAS c1 FOR DATABASE `c1-100`")
    intercept[IllegalArgumentException] {
      cat.execute("DROP DATABASE `c1-100` IF EXISTS") // alias still points there
    }
    cat.execute("DROP ALIAS c1 FOR DATABASE")
    cat.execute("DROP ALIAS never-existed FOR DATABASE") // ignore-missing
    cat.execute("DROP DATABASE `c1-100` IF EXISTS")
    assert(cat.showDatabases.isEmpty && cat.showAliases.isEmpty)
  }

  test("asOfPerCustomer elects the newest snapshot at or before T") {
    val snaps = Seq(("c1", 100L), ("c1", 200L), ("c1", 300L),
      ("c2", 250L), ("c3", 400L))
      .toDF("customer_id", "snapshot_ts")
    val out = Snapshots.asOfPerCustomer(snaps, 250L).collect()
      .map(r => r.getAs[String]("customer_id") ->
        (r.getAs[Long]("asof_ts"), r.getAs[Long]("n_at_asof"),
          r.getAs[Long]("n_after"))).toMap
    assert(out == Map(
      "c1" -> ((200L, 2L, 1L)),   // 300 exists but postdates T
      "c2" -> ((250L, 1L, 0L)))) // inclusive bound; c3 born after T
  }
}
