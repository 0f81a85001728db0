package graft.engine

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoization for persisted silver DataFrames (the
  * order-basket and verified-pair silvers). Replaces the per-site
  * `WeakHashMap[SparkSession, Map[String, DataFrame]]` pattern, which
  * could never evict: a persisted Dataset's `sparkSession` field
  * strongly references the weak KEY, so the weak entry was
  * unreclaimable by construction and persisted blocks pinned storage
  * for the life of the JVM.
  *
  * Design:
  *   - sessions map to a synthetic id through a WeakHashMap whose
  *     values are plain Strings — that map holds no strong reference
  *     to the session, so ITS entries collect normally;
  *   - the DataFrame store is keyed by the synthetic id, and an
  *     application-end listener (registered once per session) evicts
  *     and unpersists the session's memos, releasing the last strong
  *     references so a stopped session can be collected in a JVM
  *     that outlives it;
  *   - memo keys embed [[tableFingerprint]] of the backing table, so
  *     a corpus rewritten in place mid-session builds fresh silver
  *     instead of serving stale results (the staleness caveat the
  *     old caches documented is now closed for DataFrame memos).
  *
  * Residual (documented): a session discarded WITHOUT stopping its
  * context keeps its memos until [[invalidate]] — Spark exposes no
  * per-session (vs per-context) end event to hook. Long-lived
  * multi-session servers should call [[invalidate]] when retiring a
  * session.
  *
  * NESTING HAZARD: [[getOrBuild]] runs the builder inside
  * `ConcurrentHashMap.computeIfAbsent`, so a builder that itself
  * calls getOrBuild on the SAME session throws
  * IllegalStateException("Recursive update"). Derived silvers must
  * resolve their upstream silver BEFORE entering their own memo
  * (see `RelationalOps.adamicAdar`'s basket hoist).
  */
object SessionMemo {
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private val memos =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, DataFrame]]()
  private val plans =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, DataFrame]]()

  private def idOf(s: SparkSession): String = {
    var fresh = false
    val id = ids.synchronized {
      var v = ids.get(s)
      if (v == null) {
        v = java.util.UUID.randomUUID().toString
        ids.put(s, v)
        fresh = true
      }
      v
    }
    if (fresh) {
      val sid = id
      try s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            e: SparkListenerApplicationEnd): Unit = clearId(sid)
      }) catch { case _: Throwable => () }
    }
    id
  }

  private def clearId(id: String): Unit = {
    val m = memos.remove(id)
    if (m != null) m.values.forEach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    plans.remove(id)
  }

  /** Drop (and unpersist) everything memoized for this session. */
  def invalidate(s: SparkSession): Unit = clearId(idOf(s))

  /** Count of live memo entries for this session (test hook). */
  private[graft] def size(s: SparkSession): Int = {
    val m = memos.get(idOf(s))
    if (m == null) 0 else m.size()
  }

  /** Cheap local-fs fingerprint of the table file/dir backing a
    * memo: canonical path + a recursive (name, mtime, length) fold.
    * One directory listing per memoized call — noise next to the
    * scan the query itself plans. A corpus rewritten in place changes
    * the fingerprint, keying a fresh build.
    */
  def tableFingerprint(sfDir: String, table: String): String = {
    val root = new java.io.File(new java.io.File(sfDir), table + ".parquet")
    def fold(f: java.io.File): Long = {
      val own = f.getName.hashCode * 1000003L ^
        f.lastModified() ^ (f.length() * 31L)
      val kids = Option(f.listFiles()).getOrElse(
        Array.empty[java.io.File])
      kids.sortBy(_.getName)
        .foldLeft(own)((acc, k) => acc * 1000003L ^ fold(k))
    }
    root.getCanonicalPath + "@" + java.lang.Long.toHexString(fold(root))
  }

  /** Memoize `build` — persisted — under (session, key). The same
    * key returns the SAME persisted frame; unpersist via
    * [[invalidate]] or context stop.
    */
  def getOrBuild(s: SparkSession, key: String)(
      build: => DataFrame): DataFrame = {
    val per = memos.computeIfAbsent(idOf(s),
      _ => new ConcurrentHashMap[String, DataFrame]())
    per.computeIfAbsent(key, _ => build.persist())
  }

  /** Memoize an UNPERSISTED plan (no storage blocks — just the
    * analyzed logical plan) under (session, key). Used by
    * [[Tables.load]] to cache resolved parquet relations: re-reading
    * a table otherwise re-lists files and re-reads footers on every
    * query, a fixed per-query planning tax that dwarfs cheap queries
    * at 224-query sweep scale. Cleared with [[invalidate]] / context
    * stop like the persisted memos.
    */
  def getOrBuildPlan(s: SparkSession, key: String)(
      build: => DataFrame): DataFrame = {
    val per = plans.computeIfAbsent(idOf(s),
      _ => new ConcurrentHashMap[String, DataFrame]())
    per.computeIfAbsent(key, _ => build)
  }
}
