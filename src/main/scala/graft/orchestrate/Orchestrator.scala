package graft.orchestrate

import java.util.concurrent.atomic.AtomicLong
import java.util.concurrent.{ConcurrentLinkedQueue, TimeUnit}

import graft.util.Backoff

/** Deployment orchestration: the task-queue + retry decision core of the
  * reference service (scripts/orchestrator.py:40-52, 289-470), with time
  * injectable and side effects (load, alias switch, cleanup) passed in as
  * functions so the control flow is testable without Neo4j.
  */
object Orchestrator {

  final case class SnapshotTask(customerId: String, timestamp: Long,
                                dataPath: String, retryCount: Int = 0,
                                lastError: Option[String] = None)

  sealed trait Outcome
  /** Loaded; alias switched when it was the latest deployment. */
  final case class Completed(dbName: String, aliasSwitched: Boolean) extends Outcome
  /** Health gate failed — task requeued untouched (orchestrator.py:305-312). */
  final case class Deferred(reason: String) extends Outcome
  /** Load failed, retry scheduled after backoff (orchestrator.py:330-352). */
  final case class RetryScheduled(task: SnapshotTask, backoffSeconds: Long) extends Outcome
  /** Load failed and retries are exhausted. */
  final case class Failed(error: String) extends Outcome

  /** Pure retry decision: schedule with exponential backoff until
    * `maxRetries`, then fail.
    */
  def decideRetry(task: SnapshotTask, error: String, maxRetries: Int = 3,
                  backoffBase: Long = 2): Outcome =
    if (task.retryCount < maxRetries) {
      val next = task.copy(retryCount = task.retryCount + 1, lastError = Some(error))
      RetryScheduled(next, Backoff.exponentialSeconds(backoffBase, next.retryCount))
    } else Failed(error)

  /** One worker step over a task (orchestrator.py:289-356): health gate →
    * load → alias switch if latest → keep-2 cleanup.
    */
  def processTask(task: SnapshotTask,
                  healthCheck: () => Health.Status,
                  load: SnapshotTask => Either[String, String],
                  existingDbs: () => Seq[String],
                  currentAliases: () => Map[String, String],
                  execute: String => Unit,
                  stats: Stats,
                  maxRetries: Int = 3,
                  backoffBase: Long = 2): Outcome = {
    val health = healthCheck()
    if (!health.healthy) return Deferred(health.message)
    load(task) match {
      case Right(dbName) =>
        val latest = BlueGreen.isLatestDeployment(task.customerId, task.timestamp,
          existingDbs())
        if (latest)
          BlueGreen.setAliasPlan(currentAliases(), task.customerId, dbName)
            .foreach(execute)
        BlueGreen.cleanupPlan(task.customerId, existingDbs(), currentAliases())
          .foreach(execute)
        stats.recordCompletion()
        Completed(dbName, latest)
      case Left(err) =>
        val outcome = decideRetry(task, err, maxRetries, backoffBase)
        outcome match {
          case _: RetryScheduled => stats.recordRetry()
          case _: Failed => stats.recordFailure()
          case _ => ()
        }
        outcome
    }
  }

  /** Watcher step: discover new complete snapshots and enqueue them
    * (orchestrator.py:226-275).
    */
  def scanStep(base: java.nio.file.Path,
               processed: scala.collection.mutable.Set[(String, Long)],
               queue: ConcurrentLinkedQueue[SnapshotTask],
               stats: Stats): Seq[SnapshotTask] = {
    val fresh = Snapshots.newSnapshots(Snapshots.scan(base), processed.toSet)
    fresh.foreach { s =>
      val t = SnapshotTask(s.customerId, s.timestamp, s.path)
      queue.add(t)
      processed.add((s.customerId, s.timestamp))
      stats.recordDiscovery()
    }
    fresh.map(s => SnapshotTask(s.customerId, s.timestamp, s.path))
  }
}

/** Thread-safe run statistics (orchestrator.py:168-214) with an
  * injectable clock.
  */
final class Stats(now: () => Long = System.currentTimeMillis) {
  private val startTime = now()
  private val discovered = new AtomicLong(0)
  private val completed = new AtomicLong(0)
  private val failed = new AtomicLong(0)
  private val retried = new AtomicLong(0)
  @volatile private var lastActivity: Option[Long] = None

  def recordDiscovery(): Unit = { discovered.incrementAndGet(); touch() }
  def recordCompletion(): Unit = { completed.incrementAndGet(); touch() }
  def recordFailure(): Unit = { failed.incrementAndGet(); touch() }
  def recordRetry(): Unit = retried.incrementAndGet()
  private def touch(): Unit = lastActivity = Some(now())

  def snapshot(queueSize: Int = 0): Map[String, Any] = Map(
    "uptime_seconds" -> TimeUnit.MILLISECONDS.toSeconds(now() - startTime),
    "tasks_discovered" -> discovered.get,
    "tasks_completed" -> completed.get,
    "tasks_failed" -> failed.get,
    "tasks_retried" -> retried.get,
    "success_rate" -> (completed.get.toDouble / math.max(discovered.get, 1L) * 100.0),
    "queue_size" -> queueSize,
    "last_activity" -> lastActivity.orNull,
    "status" -> "running")
}
