package graft.operators

/** Bounded retry with exponential backoff — the task-level resilience
  * semantics the reference configures on every Airflow task
  * (`orchestration/dags/bronze_to_silver.py:20-35`: `retries` +
  * `retry_delay` + `retry_exponential_backoff` in `default_args`).
  *
  * A stage write on a real cluster fails transiently (executor loss,
  * object-store 503s, speculative-task races); re-running the same
  * idempotent overwrite is the standard recovery. Deterministic data
  * failures (the quality gate) must NOT pass through this — callers
  * raise those AFTER the retried block, as [[PipelineRun]] does.
  */
object Retry {

  /** Run `body`, retrying up to `retries` additional times on any
    * exception, sleeping `backoffMs * 2^attempt` between attempts.
    * Returns the first successful result; after the final attempt the
    * last failure propagates with prior failures attached as
    * suppressed exceptions (nothing is swallowed). */
  def withRetries[A](retries: Int, backoffMs: Long, label: String)(body: => A): A = {
    require(retries >= 0, s"retries must be >= 0, got $retries")
    var failures = List.empty[Throwable]
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: Throwable if attempt < retries =>
          org.apache.log4j.Logger.getLogger(getClass).warn(
            s"$label attempt ${attempt + 1}/${retries + 1} failed " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}); retrying")
          failures ::= e
          val sleep = backoffMs * (1L << attempt)
          if (sleep > 0) Thread.sleep(sleep)
          attempt += 1
        case e: Throwable =>
          failures.foreach(e.addSuppressed)
          throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
