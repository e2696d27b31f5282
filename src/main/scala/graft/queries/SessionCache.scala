package graft.queries

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for persisted intermediates shared across queries.
  *
  * Query builders are `(SparkSession, dir) => DataFrame` — they return a
  * LAZY plan and the consuming action runs in the harness, so a builder
  * cannot `unpersist` in a try/finally without killing its own cache
  * before the action. Per-invocation `persist()` instead leaked one cached
  * copy per call (bench reps × queries). This memo bounds storage to ONE
  * persisted DataFrame per (session, dir, key): repeat invocations — and
  * sibling queries sharing an intermediate, e.g. the ANN recall audits
  * reusing the brute-force baseline and the LSH hash relation — get the
  * already-cached plan. Blocks are MEMORY_AND_DISK and evictable; they are
  * freed with the session.
  */
object SessionCache {

  private val cache = new ConcurrentHashMap[(String, String), DataFrame]()

  /** Memoized `build.persist()` for this session — `key` must encode every
    * input that changes the result (the data dir, parameters). Keyed by
    * the session's UUID (unique — an identityHashCode key could collide
    * with a stopped session's and hand out a plan bound to a dead
    * SparkContext). Entries for stopped sessions are inert map rows; the
    * harness runs one session per JVM, so growth is bounded. */
  def df(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent((sessionKey(s), key), _ => build.persist())

  /** Unique per-session id. Spark 4 exposes sessionUUID on the classic
    * implementation only (via GraftSqlBridge); identityHashCode is the
    * (collision-prone, hence non-preferred) fallback for exotic session
    * types. */
  def sessionKey(s: SparkSession): String =
    org.apache.spark.sql.GraftSqlBridge.sessionUUID(s)
      .getOrElse("idhash-" + System.identityHashCode(s))
}
