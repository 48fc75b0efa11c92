package graft

import scala.util.control.NonFatal

/** Driver-level retry with exponential backoff (F11) — the reference
  * wraps Glue job starts in 5 attempts with 2^n-second sleeps
  * (/root/reference/airflow-setup/dags/final_DAG.py:216-230). Spark's
  * own task retries cover executor-level failures; this covers
  * driver-level orchestration (a whole [[Pipeline.runOnce]], a flaky
  * JDBC load) the same way the reference guards its job submissions.
  */
object Retry {

  /** Run `body`, retrying up to `maxAttempts` times with delays of
    * baseDelayMs·2^attempt between tries.
    *
    * @param retryOn  which failures are retryable (default: any
    *                 non-fatal). The last failure always rethrows.
    * @param sleep    injectable for tests; production default blocks
    *                 the (driver) thread like the reference's
    *                 time.sleep.
    */
  def withBackoff[A](
      maxAttempts: Int = 5,
      baseDelayMs: Long = 1000L,
      retryOn: Throwable => Boolean = NonFatal.apply,
      sleep: Long => Unit = Thread.sleep)(body: => A): A = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: Throwable =>
          if (attempt >= maxAttempts - 1 || !retryOn(e)) throw e
          // cap the exponent: an uncapped shift overflows Long around
          // attempt 63 and Thread.sleep(negative) would then mask the
          // real failure with an IllegalArgumentException
          sleep(baseDelayMs << math.min(attempt, 20))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
