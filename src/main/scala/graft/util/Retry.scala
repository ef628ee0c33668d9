package graft.util

/** Retry helpers — the Spark-side twin of the reference's
  * `retry_on_failure` decorator (neo4j_arrow_client.py:208-224) and the
  * orchestrator's exponential backoff (orchestrator.py:330-352).
  * The sleeper is injectable so tests run without wall-clock waits.
  */
object Retry {

  /** Run `f`, retrying up to `maxRetries` total attempts with a fixed
    * `delayMs` between attempts (reference semantics: warn per failure,
    * rethrow after the last).
    */
  def withRetry[T](maxRetries: Int, delayMs: Long,
                   sleep: Long => Unit = Thread.sleep,
                   onRetry: (Throwable, Int) => Unit = (_, _) => ())(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Throwable =>
          attempt += 1
          if (attempt >= maxRetries) throw e
          onRetry(e, attempt)
          sleep(delayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Exponential backoff schedule: base^attempt seconds (orchestrator.py:
  * `retry_backoff_base ** task.retry_count` — 2s, 4s, 8s for base 2).
  */
object Backoff {
  def exponentialSeconds(base: Long, attempt: Int): Long = {
    require(attempt >= 0)
    math.pow(base.toDouble, attempt.toDouble).toLong
  }
}
