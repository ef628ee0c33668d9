package graft.orchestrate

/** Pre-load health gating — the pure math of the reference's
  * Neo4jHealthChecker (scripts/orchestrator.py:53-165), separated from any
  * live connection so it is unit-testable and reusable against whatever
  * metrics source a deployment has (JMX, metrics endpoint, cloud API).
  */
object Health {

  final case class Status(healthy: Boolean, message: String)

  /** Too many databases indicates resource pressure
    * (orchestrator.py:78-84; default max 50).
    */
  def checkDbCount(dbCount: Long, maxDatabases: Long = 50): Status =
    if (dbCount >= maxDatabases)
      Status(healthy = false, s"Too many databases ($dbCount >= $maxDatabases)")
    else Status(healthy = true, "Healthy")

  /** Heap usage percentage vs threshold (orchestrator.py:108-131; default
    * threshold 85%). `maxBytes <= 0` means the metric is unavailable,
    * which is not a failure (Community Edition has no JMX).
    */
  def checkHeap(usedBytes: Long, maxBytes: Long,
                thresholdPercent: Double = 85.0): Option[Status] =
    if (maxBytes <= 0) None
    else {
      val pct = usedBytes.toDouble / maxBytes.toDouble * 100.0
      if (pct >= thresholdPercent)
        Some(Status(healthy = false,
          f"Memory usage too high - heap: $pct%.1f%% (threshold: ${thresholdPercent}%%)"))
      else Some(Status(healthy = true, "Memory healthy"))
    }

  /** Combine checks: first unhealthy wins (orchestrator.py:62-95). */
  def combine(checks: Seq[Status]): Status =
    checks.find(!_.healthy).getOrElse(Status(healthy = true, "Healthy"))
}
