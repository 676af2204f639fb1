package graft

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central lifecycle registry for the engine's session-scoped
  * derived-artifact caches (minhash signatures, shingle and gram
  * relations, DSIR counts, trained BPE merge tables, PQ/IVF/IVFADC
  * codebooks). Each cache map self-registers at class-init via
  * [[GraftCaches.register]]; every cache key starts with
  * `identityHashCode(session)|` (the shared convention), which is what
  * makes per-session eviction a prefix scan.
  *
  * Why this exists: the caches deliberately never expire on their own —
  * each cached artifact is an index-build product that is correct for the
  * life of a (session, corpus-version) pair, and dropping it early would
  * re-pay a corpus-scale pass. But a LONG-LIVED service that walks many
  * corpus versions through one session (or many sessions through one JVM)
  * would grow the maps and their persisted relations without bound.
  * [[release]] is the eviction hook: call it when a session is done (or a
  * corpus version is superseded) and every map entry for that session is
  * dropped and every cached relation unpersisted.
  */
object GraftCaches {

  private val registries =
    new java.util.concurrent.CopyOnWriteArrayList[ConcurrentHashMap[String, _]]()

  /** Register a cache map for lifecycle management (returns it, so call
    * sites stay one-liners). */
  private[graft] def register[V](m: ConcurrentHashMap[String, V]): ConcurrentHashMap[String, V] = {
    registries.add(m)
    m
  }

  /** The session-scoped key prefix every registered cache uses. */
  def sessionPrefix(s: SparkSession): String = s"${System.identityHashCode(s)}|"

  /** Drop every cached artifact belonging to `session`: map entries are
    * removed and cached `DataFrame` values unpersisted (non-blocking).
    * Safe to call at any time — the next consumer simply rebuilds. */
  def release(session: SparkSession): Unit =
    releaseWhere(_.startsWith(sessionPrefix(session)))

  /** Corpus-version-scoped eviction: drop only the artifacts of
    * `(session, dir)` — the call for a multi-corpus service superseding
    * ONE corpus version while its siblings stay live and persisted. `dir`
    * is the cache tag (the table dir for corpus forms, the caller-chosen
    * stable string for derived relations); the match is the key segment
    * convention `session|dir` or `session|dir|...`, so `/data/v1` never
    * sweeps `/data/v10`. */
  def release(session: SparkSession, dir: String): Unit = {
    val exact = sessionPrefix(session) + dir
    val scoped = exact + "|"
    releaseWhere(k => k == exact || k.startsWith(scoped))
  }

  private def releaseWhere(drop: String => Boolean): Unit = {
    registries.forEach { m =>
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (drop(e.getKey)) {
          e.getValue match {
            case df: DataFrame => try df.unpersist() catch { case _: Throwable => () }
            case _ => ()
          }
          it.remove()
        }
      }
    }
  }

  /** Live entry count across all registered caches (diagnostics/tests). */
  def totalEntries: Int = {
    var n = 0
    registries.forEach(m => n += m.size())
    n
  }

  /** Live entry count for one session (diagnostics/tests). */
  def entriesFor(session: SparkSession): Int = {
    val p = sessionPrefix(session)
    var n = 0
    registries.forEach { m =>
      m.keySet().forEach(k => if (k.startsWith(p)) n += 1)
    }
    n
  }

  /** Live entry count for one (session, corpus dir/tag) — the scope
    * [[release(session:org\.apache\.spark\.sql\.SparkSession,dir:String)* release(session, dir)]] evicts. */
  def entriesFor(session: SparkSession, dir: String): Int = {
    val exact = sessionPrefix(session) + dir
    val scoped = exact + "|"
    var n = 0
    registries.forEach { m =>
      m.keySet().forEach(k => if (k == exact || k.startsWith(scoped)) n += 1)
    }
    n
  }
}
