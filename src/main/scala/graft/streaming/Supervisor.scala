package graft.streaming

import graft.ops.Backoff
import org.apache.spark.sql.streaming.StreamingQuery

/** O15/O16 — query supervisor: restart a streaming query on failure with
  * the reference's cubic backoff (retry.clj:11-19), up to
  * [[Backoff.MaxRetries]] consecutive restarts. A query that runs healthily
  * for at least `minHealthyMillis` before failing resets the consecutive
  * counter — the Spark analogue of the reference's reset-on-`:ok` retry loop
  * (retry.clj:21-28), so a long-lived query with occasional transient faults
  * never exhausts a lifetime budget. Replayable source + checkpoint give
  * at-least-once across restarts (the Spark analogue of JMS no-ack
  * redelivery, jms_publisher.clj:173-176).
  */
object Supervisor {

  /** Supervise `start` until it terminates cleanly or `maxRestarts`
    * consecutive quick failures occur. `sleep` and `now` injectable for
    * tests. Returns the total number of restarts performed. */
  def superviseStreaming(start: () => StreamingQuery,
                         maxRestarts: Int = Backoff.MaxRetries,
                         sleep: Long => Unit = Thread.sleep,
                         minHealthyMillis: Long = 60000L,
                         now: () => Long = System.currentTimeMillis): Int = {
    var consecutive = 0
    var total = 0
    var done = false
    while (!done) {
      val startedAt = now()
      val q = start()
      try {
        q.awaitTermination()
        done = true
      } catch {
        case e: Exception =>
          if (now() - startedAt >= minHealthyMillis) consecutive = 0
          consecutive += 1
          total += 1
          if (consecutive > maxRestarts) throw e
          sleep(Backoff.millis(consecutive))
      }
    }
    total
  }

  /** A per-queue data-plane query wrapped with asynchronous supervision:
    * a daemon watchdog restarts the underlying query on failure (cubic
    * backoff) until `maxRestarts` consecutive failures, then calls
    * `onExhausted` — the hook GraftSystem uses to write the error-status
    * CCD back to the control plane (reference README.md:19-22). The wrapper
    * itself implements StreamingQuery so the orchestrator's registry can
    * hold and stop it like any other query; `stop()` halts supervision and
    * the current incarnation. */
  final class SupervisedQueueQuery(queue: String,
                                   startOnce: () => StreamingQuery,
                                   maxRestarts: Int = Backoff.MaxRetries,
                                   sleep: Long => Unit = Thread.sleep,
                                   onExhausted: (String, Throwable) => Unit = (_, _) => ())
      extends StreamingQuery {

    @volatile private var stopped = false
    @volatile private var current: StreamingQuery = startOnce()

    private val watchdog = new Thread(s"graft-supervise-$queue") {
      override def run(): Unit = {
        var consecutive = 0
        while (!stopped) {
          try {
            current.awaitTermination() // clean drain (AvailableNow) or stop()
            return
          } catch {
            case e: Exception =>
              if (stopped) return
              consecutive += 1
              if (consecutive > maxRestarts) { onExhausted(queue, e); return }
              sleep(Backoff.millis(consecutive))
              if (stopped) return
              try {
                current = startOnce()
                // stop() may have raced the restart and stopped only the
                // previous incarnation — shut the fresh one down too
                if (stopped) { try current.stop() catch { case _: Exception => () }; return }
              } catch { case e2: Exception => onExhausted(queue, e2); return }
          }
        }
      }
    }
    watchdog.setDaemon(true)
    watchdog.start()

    override def stop(): Unit = {
      stopped = true
      try current.stop() catch { case _: Exception => () }
    }

    override def name: String = current.name
    override def id: java.util.UUID = current.id
    override def runId: java.util.UUID = current.runId
    override def sparkSession: org.apache.spark.sql.SparkSession = current.sparkSession
    override def isActive: Boolean = !stopped && (current.isActive || watchdog.isAlive)
    override def exception: Option[org.apache.spark.sql.streaming.StreamingQueryException] =
      current.exception
    override def status: org.apache.spark.sql.streaming.StreamingQueryStatus = current.status
    override def recentProgress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] =
      current.recentProgress
    override def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress =
      current.lastProgress
    override def awaitTermination(): Unit = current.awaitTermination()
    override def awaitTermination(timeoutMs: Long): Boolean = current.awaitTermination(timeoutMs)
    override def processAllAvailable(): Unit = current.processAllAvailable()
    override def explain(): Unit = current.explain()
    override def explain(extended: Boolean): Unit = current.explain(extended)
  }
}
