package graft.orchestrate

import java.nio.file.{Files, Path}
import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import graft.util.{Json, Log}

/** Threaded orchestration service — the runnable form of the reference's
  * Orchestrator (scripts/orchestrator.py:473-656): a watcher thread
  * scanning for snapshots, N worker threads draining the queue through
  * [[Orchestrator.processTask]], and a status thread writing a JSON
  * snapshot file. All side effects (load, system statements, health) are
  * injected; intervals are configurable down to milliseconds for tests.
  */
final class OrchestratorRunner(
    base: Path,
    healthCheck: () => Health.Status,
    load: Orchestrator.SnapshotTask => Either[String, String],
    existingDbs: () => Seq[String],
    currentAliases: () => Map[String, String],
    execute: String => Unit,
    numWorkers: Int = 1,
    scanIntervalMs: Long = 30000L,
    statusIntervalMs: Long = 5000L,
    statusFile: Option[Path] = None,
    maxRetries: Int = 3,
    backoffBase: Long = 2,
    backoffToMs: Long => Long = _ * 1000L) {

  private val logger = Log.getLogger("graft.OrchestratorRunner")
  val stats = new Stats()
  private val queue = new ConcurrentLinkedQueue[Orchestrator.SnapshotTask]()
  private val processed = scala.collection.mutable.Set[(String, Long)]()
  private val stop = new AtomicBoolean(false)
  private var threads: Seq[Thread] = Seq.empty
  // Retries are re-enqueued from a daemon scheduler thread (the reference
  // does the same with threading.Thread, orchestrator.py:330-352) so a
  // failing task never head-of-line-blocks the worker for its backoff.
  private val retryExec = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-retry"); t.setDaemon(true); t
  })
  private val pendingRetries = new AtomicInteger(0)
  // After a failed health gate, workers stand down until this instant
  // instead of re-polling (and re-checking health) every ~20ms.
  @volatile private var deferredUntil = 0L

  def queueSize: Int = queue.size()

  private def loopEvery(intervalMs: Long)(body: => Unit): Runnable = () => {
    while (!stop.get()) {
      try body
      catch { case e: Throwable => logger.error(s"loop error: ${e.getMessage}") }
      var waited = 0L
      while (waited < intervalMs && !stop.get()) {
        Thread.sleep(math.min(20L, intervalMs - waited).max(1L)); waited += 20L
      }
    }
  }

  private def workerLoop(id: Int): Runnable = loopEvery(20L) {
    var task =
      if (System.currentTimeMillis() < deferredUntil) null else queue.poll()
    while (task != null && !stop.get()) {
      Orchestrator.processTask(task, healthCheck, load, existingDbs,
        currentAliases, execute, stats, maxRetries, backoffBase) match {
        case Orchestrator.Completed(db, switched) =>
          logger.info(s"worker $id: loaded $db (alias switched: $switched)")
        case Orchestrator.Deferred(reason) =>
          logger.warn(s"worker $id: deferred, $reason")
          queue.add(task) // requeue like the reference's health-gate path
          deferredUntil = System.currentTimeMillis() + scanIntervalMs
          task = null
        case Orchestrator.RetryScheduled(next, backoffSec) =>
          logger.warn(s"worker $id: retry ${next.retryCount} in ${backoffSec}s")
          pendingRetries.incrementAndGet()
          try retryExec.schedule(new Runnable {
            override def run(): Unit = {
              if (!stop.get()) queue.add(next)
              pendingRetries.decrementAndGet()
            }
          }, backoffToMs(backoffSec), TimeUnit.MILLISECONDS)
          catch {
            // the scheduler is shut down (stopAndDrain raced an in-flight
            // task): record the task as failed instead of silently losing
            // it, and release the counter so a later drain can't spin on it
            case _: java.util.concurrent.RejectedExecutionException =>
              pendingRetries.decrementAndGet()
              stats.recordFailure()
              logger.error(
                s"worker $id: giving up: retry of ${next.customerId}/${next.timestamp} " +
                  "rejected, orchestrator stopping")
          }
        case Orchestrator.Failed(err) =>
          logger.error(s"worker $id: giving up: $err")
      }
      task = if (task == null) null else queue.poll()
    }
  }

  private def writeStatus(status: String): Unit = statusFile.foreach { p =>
    val snap = stats.snapshot(queue.size()) ++ Map(
      "workers" -> numWorkers, "scan_interval" -> scanIntervalMs,
      "data_path" -> base.toString, "status" -> status)
    val json = snap.map { case (k, v) =>
      val jv = v match {
        case null => "null"
        case s: String => Json.quote(s)
        case d: Double => d.toString
        case other => other.toString
      }
      s"${Json.quote(k)}: $jv"
    }.mkString("{", ", ", "}")
    Files.writeString(p, json)
  }

  def start(): Unit = synchronized {
    require(threads.isEmpty, "already started")
    logger.info(s"orchestrator starting: $base, $numWorkers workers")
    val watcher = new Thread(loopEvery(scanIntervalMs) {
      Orchestrator.scanStep(base, processed, queue, stats)
    }, "graft-watcher")
    val workers = (1 to numWorkers).map(i =>
      new Thread(workerLoop(i), s"graft-worker-$i"))
    val status = new Thread(loopEvery(statusIntervalMs) {
      writeStatus("running")
    }, "graft-status")
    threads = (watcher +: workers) :+ status
    threads.foreach { t => t.setDaemon(true); t.start() }
  }

  /** Stop, waiting up to `drainMs` for queued tasks (and scheduled
    * retries) to finish first.
    */
  def stopAndDrain(drainMs: Long = 300000L): Unit = synchronized {
    val deadline = System.currentTimeMillis() + drainMs
    while ((queue.size() > 0 || pendingRetries.get() > 0) &&
      System.currentTimeMillis() < deadline)
      Thread.sleep(10L)
    if (queue.size() > 0) logger.warn("drain timeout; tasks incomplete")
    stop.set(true)
    retryExec.shutdownNow()
    threads.foreach(_.join(2000L))
    writeStatus("stopped")
    logger.info("orchestrator stopped")
  }
}
