package graft

import java.nio.file.{Files, Path}

import graft.sinks.{FlightTransport, InMemoryFlightTransport}
import graft.SparkSpec

/** Shared fake service for pipeline tests (local mode: tasks in-JVM). */
object PipelineTransport {
  val shared = new InMemoryFlightTransport
  val factory: () => FlightTransport = () => PipelineTransport.shared
}

class LoadPipelineSpec extends SparkSpec {
  import spark.implicits._

  // Build a reference-layout snapshot: data/{customer}/{ts}/nodes/{Label}
  // and relationships/{TYPE}, parquet fragments inside each.
  private def mkSnapshot(base: Path, customer: String, ts: Long): Unit = {
    val d = base.resolve(customer).resolve(ts.toString)
    Seq((1L, "Entity,Company", "acme"), (2L, "Entity", "globex"))
      .toDF("id", "labels", "name")
      .write.parquet(d.resolve("nodes/Entity").toString)
    Seq((10L, "Address,Mailing", "1 Main St"))
      .toDF("id", "labels", "addr")
      .write.parquet(d.resolve("nodes/Address").toString)
    Seq((1L, 10L, "HAS_MAILING_ADDRESS"), (2L, 10L, "HAS_MAILING_ADDRESS"))
      .toDF("src", "dst", "typ")
      .write.parquet(d.resolve("relationships/HAS_MAILING_ADDRESS").toString)
  }

  test("loadAndSwitch runs the full reference flow over a snapshot dir") {
    val base = Files.createTempDirectory("graft-pipe")
    mkSnapshot(base, "customer1", 1767741427L)
    val statements = scala.collection.mutable.Buffer[String]()
    val before = PipelineTransport.shared.putRows.get()
    val r = LoadPipeline.loadAndSwitch(spark, "customer1", 1767741427L, base,
      PipelineTransport.factory,
      existingDbs = Seq("customer1-100", "customer1-50", "customer1-25"),
      currentAliases = Map("customer1" -> "customer1-100"),
      system = statements += _)
    assert(r.database == "customer1-1767741427")
    assert(PipelineTransport.shared.putRows.get() - before == 5,
      "3 nodes + 2 edges streamed through the service")
    assert(r.nodeBytes > 0 && r.relationshipBytes > 0)
    // alias switched (new db is latest) and keep-2 cleanup dropped the
    // oldest unaliased dbs
    assert(statements.contains("DROP ALIAS customer1 FOR DATABASE"))
    assert(statements.contains("CREATE ALIAS customer1 FOR DATABASE `customer1-1767741427`"))
    assert(statements.contains("DROP DATABASE `customer1-50` IF EXISTS"))
    assert(statements.contains("DROP DATABASE `customer1-25` IF EXISTS"))
    assert(!statements.exists(_.contains("customer1-100")) ||
      !statements.contains("DROP DATABASE `customer1-100` IF EXISTS"),
      "aliased db never dropped (alias points there until switch)")
    assert(r.aliasStatements == statements.toSeq)
  }

  test("redeploying an existing db drops its aliases and the db first") {
    val base = Files.createTempDirectory("graft-pipe3")
    mkSnapshot(base, "customer2", 500L)
    val statements = scala.collection.mutable.Buffer[String]()
    val r = LoadPipeline.loadAndSwitch(spark, "customer2", 500L, base,
      PipelineTransport.factory,
      existingDbs = Seq("customer2-500", "customer2-400"),
      currentAliases = Map("customer2" -> "customer2-500"),
      system = statements += _)
    assert(statements.take(2) == Seq(
      "DROP ALIAS customer2 FOR DATABASE",
      "DROP DATABASE `customer2-500` IF EXISTS"),
      s"pre-drop must come first: $statements")
    // after the pre-drop the alias is gone, so the switch is a bare CREATE
    assert(statements.contains("CREATE ALIAS customer2 FOR DATABASE `customer2-500`"))
    assert(!statements.drop(2).contains("DROP ALIAS customer2 FOR DATABASE"))
    assert(r.aliasStatements == statements.toSeq)
  }

  test("missing snapshot path fails fast") {
    val base = Files.createTempDirectory("graft-pipe2")
    intercept[IllegalArgumentException] {
      LoadPipeline.loadAndSwitch(spark, "nobody", 1L, base,
        PipelineTransport.factory, Seq.empty, Map.empty, _ => ())
    }
  }
}
