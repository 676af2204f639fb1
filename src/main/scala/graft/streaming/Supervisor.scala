package graft.streaming

import graft.ops.Backoff
import org.apache.spark.sql.streaming.StreamingQuery

/** O15/O16 — query supervisor: restart a streaming query on failure with
  * the reference's cubic backoff (retry.clj:11-19), up to
  * [[Backoff.MaxRetries]] restarts; the counter resets after a clean run.
  * Replayable source + checkpoint give at-least-once across restarts
  * (the Spark analogue of JMS no-ack redelivery, jms_publisher.clj:173-176).
  */
object Supervisor {

  /** Supervise `start` until it terminates cleanly or retries are exhausted.
    * `sleep` injectable for tests. Returns the number of restarts. */
  def superviseStreaming(start: () => StreamingQuery,
                         maxRestarts: Int = Backoff.MaxRetries,
                         sleep: Long => Unit = Thread.sleep): Int = {
    var restarts = 0
    var done = false
    while (!done) {
      val q = start()
      try {
        q.awaitTermination()
        done = true
      } catch {
        case e: Exception =>
          restarts += 1
          if (restarts > maxRestarts) throw e
          sleep(Backoff.millis(restarts))
      }
    }
    restarts
  }
}
