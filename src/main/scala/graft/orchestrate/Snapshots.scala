package graft.orchestrate

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot discovery over a `data/{customer}/{timestamp}/` layout.
  *
  * Mirrors the reference watcher semantics (scripts/orchestrator.py:216-287):
  * a snapshot is a numeric-named timestamp directory under a customer
  * directory, and it is *complete* only when both `nodes/` and
  * `relationships/` exist and are non-empty. Already-processed snapshots
  * are skipped by key (customer, timestamp).
  */
object Snapshots {

  case class Snapshot(customerId: String, timestamp: Long, path: String,
                      complete: Boolean)

  /** Materialized directory listing — the NIO stream is closed before
    * returning (an unclosed Files.list holds a directory fd open until
    * process exit, and the watcher rescans every cycle).
    */
  private def listDir(p: Path): Seq[Path] =
    if (!Files.isDirectory(p)) Seq.empty
    else Using.resource(Files.list(p))(_.iterator().asScala.toList)

  private def nonEmptyDir(p: Path): Boolean = listDir(p).nonEmpty

  /** One filesystem scan (driver-side, like the reference — this is a
    * control-plane listing of O(customers × snapshots) dirs, not data).
    */
  def scan(base: Path): Seq[Snapshot] = {
    (for {
      customerDir <- listDir(base)
      if Files.isDirectory(customerDir)
      tsDir <- listDir(customerDir)
      if Files.isDirectory(tsDir)
      ts <- tsDir.getFileName.toString.toLongOption
    } yield {
      val complete = nonEmptyDir(tsDir.resolve("nodes")) &&
        nonEmptyDir(tsDir.resolve("relationships"))
      Snapshot(customerDir.getFileName.toString, ts, tsDir.toString, complete)
    }).toSeq.sortBy(s => (s.customerId, s.timestamp))
  }

  /** New, complete snapshots not yet processed. */
  def newSnapshots(scanned: Seq[Snapshot],
                   processed: Set[(String, Long)]): Seq[Snapshot] =
    scanned.filter(s => s.complete && !processed.contains((s.customerId, s.timestamp)))

  /** DataFrame form of latest-snapshot-per-customer selection: a partial
    * (map-side combinable) max aggregation — the scalable twin of the
    * reference's `max(customer_timestamps)` loop
    * (scripts/orchestrator.py:358-380).
    */
  def latestPerCustomer(snapshots: DataFrame): DataFrame =
    snapshots
      .groupBy(col("customer_id"))
      .agg(max(col("snapshot_ts")).as("latest_ts"),
        count(lit(1)).as("n_snapshots"))

  /** Time-travel variant of [[latestPerCustomer]]: the newest snapshot
    * at or before `asOf` — "what did the lake serve last Tuesday", the
    * reproducibility primitive for re-running a load or an audit
    * against the exact inputs a past run saw. Customers whose first
    * snapshot postdates `asOf` drop out (they did not exist then); the
    * count of later snapshots is reported so the caller can see how
    * far history has moved on. Same partial-agg shape — conditional
    * max/count, one keyed shuffle, map-side combining.
    */
  def asOfPerCustomer(snapshots: DataFrame, asOf: Long): DataFrame =
    snapshots
      .groupBy(col("customer_id"))
      .agg(max(when(col("snapshot_ts") <= asOf, col("snapshot_ts")))
        .as("asof_ts"),
        sum(when(col("snapshot_ts") <= asOf, 1L).otherwise(0L))
          .as("n_at_asof"),
        sum(when(col("snapshot_ts") > asOf, 1L).otherwise(0L))
          .as("n_after"))
      .filter(col("asof_ts").isNotNull)

  def toDF(spark: SparkSession, snaps: Seq[Snapshot]): DataFrame = {
    import spark.implicits._
    snaps.toDF()
  }

  private def copyTree(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst)
    listDir(src).foreach { p =>
      val t = dst.resolve(p.getFileName.toString)
      if (Files.isDirectory(p)) copyTree(p, t)
      else Files.copy(p, t, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Seed a demo snapshot layout (scripts/setup_demo_data.py): copy a
    * source dir holding parquet fragments under `nodes/{Label}` and
    * `relationships/{TYPE}` into `targetBase/{customer}/{timestamp}/` for
    * every customer × timestamp. Returns the number of datasets created.
    */
  def seedLayout(sourceDir: Path, targetBase: Path, customers: Seq[String],
                 timestamps: Seq[Long]): Int = {
    val nodes = sourceDir.resolve("nodes")
    val rels = sourceDir.resolve("relationships")
    require(Files.isDirectory(nodes) && Files.isDirectory(rels),
      s"Source data not found. Expected: $nodes and $rels")
    for (c <- customers; ts <- timestamps) {
      val target = targetBase.resolve(c).resolve(ts.toString)
      copyTree(nodes, target.resolve("nodes"))
      copyTree(rels, target.resolve("relationships"))
    }
    customers.size * timestamps.size
  }

  /** Simulate a new snapshot drop (scripts/simulate_snapshot.py): copy an
    * existing `customer/sourceTs` snapshot to `customer/newTs` so the
    * watcher discovers it on its next scan. Returns the new snapshot path,
    * or None when the source snapshot does not exist. `newTs` is injected
    * (the reference uses wall-clock now) so tests are deterministic.
    */
  def simulateSnapshot(base: Path, customerId: String, sourceTs: Long,
                       newTs: Long): Option[Path] = {
    val source = base.resolve(customerId).resolve(sourceTs.toString)
    if (!Files.isDirectory(source)) None
    else {
      val target = base.resolve(customerId).resolve(newTs.toString)
      copyTree(source, target)
      Some(target)
    }
  }
}
