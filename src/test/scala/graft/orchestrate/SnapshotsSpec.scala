package graft.orchestrate

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class SnapshotsSpec extends AnyFunSuite {

  private def mkSnapshot(base: java.nio.file.Path, customer: String, ts: Long,
                         nodes: Boolean, rels: Boolean): Unit = {
    val d = base.resolve(customer).resolve(ts.toString)
    Files.createDirectories(d)
    if (nodes) {
      val n = d.resolve("nodes/Entity")
      Files.createDirectories(n)
      Files.writeString(n.resolve("part.parquet"), "x")
    }
    if (rels) {
      val r = d.resolve("relationships/KNOWS")
      Files.createDirectories(r)
      Files.writeString(r.resolve("part.parquet"), "x")
    }
  }

  test("scan finds complete snapshots and flags incomplete ones") {
    val base = Files.createTempDirectory("graft-snap")
    mkSnapshot(base, "customer1", 100, nodes = true, rels = true)
    mkSnapshot(base, "customer1", 200, nodes = true, rels = false)
    mkSnapshot(base, "customer2", 300, nodes = true, rels = true)
    Files.createDirectories(base.resolve("customer3/not-a-timestamp"))
    val snaps = Snapshots.scan(base)
    assert(snaps.map(s => (s.customerId, s.timestamp, s.complete)) == Seq(
      ("customer1", 100L, true), ("customer1", 200L, false),
      ("customer2", 300L, true)))
  }

  test("newSnapshots returns only complete, unprocessed ones") {
    val base = Files.createTempDirectory("graft-snap2")
    mkSnapshot(base, "c1", 100, nodes = true, rels = true)
    mkSnapshot(base, "c1", 200, nodes = true, rels = true)
    val scanned = Snapshots.scan(base)
    val fresh = Snapshots.newSnapshots(scanned, processed = Set(("c1", 100L)))
    assert(fresh.map(_.timestamp) == Seq(200L))
  }

  test("scan of a missing base path is empty, not an error") {
    assert(Snapshots.scan(java.nio.file.Path.of("/nonexistent/base")).isEmpty)
  }
}
