package graft.sources

/** Bounded retry-with-delay for transient extract/load failures — the
  * engine-side analog of the reference's Prefect task policy
  * (/root/reference/flows/download_era5_land.py:60,
  * `@task(retries=2, retry_delay_seconds=30)`): an operation gets
  * `retries` additional attempts with a fixed delay between them, and
  * a failure past the budget surfaces as the DEFINED terminal error
  * [[Retry.RetryExhaustedException]] carrying the attempt count and
  * the last cause — so an orchestrator can distinguish "transient,
  * gave up" from a code bug, which propagates raw on first throw.
  *
  * Only errors the policy classifies transient are retried:
  * by default I/O faults and torn/corrupt tiles
  * (grid.GridFiles.CorruptTileException — the re-extractable state a
  * concurrent backfill repairs), never arbitrary exceptions: retrying
  * a deterministic bug just burns `retries × delay` before failing
  * with a misleading wrapper.
  *
  * The sleeper is injectable so specs (and schedulers with their own
  * wait machinery) don't block a thread for the production 30 s.
  */
object Retry {

  /** Terminal give-up error after the retry budget is exhausted. */
  final class RetryExhaustedException(val attempts: Int, cause: Throwable)
    extends RuntimeException(
      s"gave up after $attempts attempts: ${cause.getMessage}", cause)

  /** Which failures are worth re-attempting: transient I/O and
    * corrupt-tile states a rerun/repair can fix.
    */
  def transient(t: Throwable): Boolean = t match {
    case _: grid.GridFiles.CorruptTileException => true
    case _: java.io.IOException => true
    case _ => false
  }

  /** `retries` = ADDITIONAL attempts after the first (Prefect's
    * convention: retries=2 ⇒ at most 3 executions).
    */
  final case class Policy(retries: Int = 2, delayMs: Long = 30000L,
      retryOn: Throwable => Boolean = transient,
      sleep: Long => Unit = Thread.sleep) {
    require(retries >= 0, s"retries must be >= 0, got $retries")
    require(delayMs >= 0, s"delayMs must be >= 0, got $delayMs")
  }

  /** No-op policy: first failure is terminal (and raw — no wrapper). */
  val noRetry: Policy = Policy(retries = 0, delayMs = 0L)

  def apply[T](policy: Policy)(body: => T): T = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case t: Throwable if policy.retryOn(t) =>
          if (attempt > policy.retries) {
            // a zero-retry policy fails with the bare cause — there
            // was no retry story to report
            if (policy.retries == 0) throw t
            throw new RetryExhaustedException(attempt, t)
          }
          policy.sleep(policy.delayMs)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
