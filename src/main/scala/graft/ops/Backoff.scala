package graft.ops

/** O16 — generic retry policy with cubic backoff.
  *
  * Formula parity with reference `retry.clj:11-19` (`default-backoff`):
  * `seconds(attempt) = max(5, 5 * round(attempt^3 / 5))`, max 10 retries,
  * attempt counter resets on success. The reference's version is dead code
  * (no require site) but encodes the intended supervisor policy; we use it
  * live in [[graft.streaming.Supervisor]].
  */
object Backoff {
  val MaxRetries = 10

  /** Backoff in seconds before retry `attempt` (1-based). */
  def seconds(attempt: Int): Long =
    math.max(5L, 5L * math.round(attempt.toDouble * attempt * attempt / 5.0))

  def millis(attempt: Int): Long = seconds(attempt) * 1000L

  /** Run `f` with up to [[MaxRetries]] retries for failures `recoverable`
    * deems transient; `sleep` is injectable for tests. Returns Right(result)
    * or Left(last error).
    */
  def retry[A](f: () => A,
               recoverable: Throwable => Boolean = _ => true,
               maxRetries: Int = MaxRetries,
               sleep: Long => Unit = Thread.sleep): Either[Throwable, A] = {
    var attempt = 0
    while (true) {
      try return Right(f())
      catch {
        case e: Throwable =>
          attempt += 1
          if (attempt > maxRetries || !recoverable(e)) return Left(e)
          sleep(millis(attempt))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
