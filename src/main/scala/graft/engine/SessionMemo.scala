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
  *     instead of serving stale results — up to the fingerprint
  *     cache's short TTL window (`graft.fingerprint.ttlMs`, default
  *     5 s; 0 restores immediate detection).
  *
  * Residual (documented): a session discarded WITHOUT stopping its
  * context keeps its memos until [[invalidate]] — Spark exposes no
  * per-session (vs per-context) end event to hook. Long-lived
  * multi-session servers should call [[invalidate]] when retiring a
  * session.
  *
  * Builders run OUTSIDE the map's locks (probe, build, putIfAbsent —
  * see [[getOrBuild]]), so a builder may recursively resolve other
  * memos on the same session without deadlock or
  * IllegalStateException. Derived silvers still PREFER resolving
  * their upstream silver before entering their own memo (the
  * `RelationalOps.adamicAdar` basket hoist): a nested resolve inside
  * the builder runs on every race loser too, and hoisting keeps the
  * duplicate-build window minimal.
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
  def invalidate(s: SparkSession): Unit = {
    clearId(idOf(s))
    expireFingerprints()
  }

  /** Count of live memo entries for this session (test hook). */
  private[graft] def size(s: SparkSession): Int = {
    val m = memos.get(idOf(s))
    if (m == null) 0 else m.size()
  }

  /** Fingerprint of the table file/dir backing a memo: qualified
    * path + a (name, mtime, length) fold over the recursive file
    * listing, resolved through Hadoop `FileSystem` so hdfs://, s3a://
    * and any other configured scheme fingerprint correctly (the old
    * java.io.File walk silently degenerated to a constant off the
    * local FS, which would have let plan/silver memos serve stale
    * results after a remote rewrite). One listing RPC batch per
    * memoized call — noise next to the scan the query itself plans.
    * A corpus rewritten in place changes the fingerprint, keying a
    * fresh build.
    *
    * Listing-tax escape hatch: `-Dgraft.fingerprint.shallow=true`
    * folds only the ROOT status (mtime/length, one stat call) — for
    * deployments whose writers replace the whole table path
    * atomically (Spark's `mode("overwrite")`, rename-commit jobs),
    * where the root status already changes on every rewrite. The
    * default stays the deep fold: it is the only mode that detects a
    * single part-file rewritten in place under an untouched root.
    */
  def tableFingerprint(sfDir: String, table: String): String = {
    // thread-local fallback resolution, kept for call sites that have
    // no session in hand (tests); operators use the session-threaded
    // overload below — getActiveSession on a sessionless thread would
    // fall back to a bare Configuration, which for hdfs://s3a:// paths
    // can resolve a differently-configured FileSystem than the one
    // that built the memo (missing credentials → throw or a
    // fingerprint inconsistent with the session's)
    fingerprintWith(sfDir, table,
      SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new org.apache.hadoop.conf.Configuration()))
  }

  /** [[tableFingerprint]] resolved through THIS session's Hadoop conf
    * — the overload every operator call site uses, so the FileSystem
    * that fingerprints a table is always the one whose session built
    * (and will serve) the memo, regardless of which thread runs the
    * call.
    */
  def tableFingerprint(s: SparkSession, sfDir: String,
      table: String): String =
    fingerprintWith(sfDir, table, s.sessionState.newHadoopConf())

  /** Short-TTL fingerprint cache: a 286-query sweep calls
    * [[tableFingerprint]] several times per query (every
    * `Tables.load` plus every silver-memo key), and each call paid a
    * recursive listing even when the plan/silver memo it keyed was a
    * hit — a pure listing tax. Entries expire after
    * `graft.fingerprint.ttlMs` (default 5000 ms; 0 disables), so
    * invalidation semantics on rewrite are unchanged beyond that
    * window: a table rewritten in place fingerprints fresh on the
    * first call after expiry, exactly as before. The window is a
    * deliberate staleness bound — within one sweep's back-to-back
    * queries the corpus is immutable, and a deployment rewriting
    * tables mid-flight sets the TTL to 0.
    */
  private val fpCache =
    new ConcurrentHashMap[String, (Long, String)]()

  private def fpTtlNanos: Long =
    java.lang.Long.getLong("graft.fingerprint.ttlMs", 5000L) * 1000000L

  /** Drop every cached fingerprint (test hook + [[invalidate]]). */
  private[graft] def expireFingerprints(): Unit = fpCache.clear()

  private def fingerprintWith(sfDir: String, table: String,
      conf: org.apache.hadoop.conf.Configuration): String = {
    val ttl = fpTtlNanos
    // the cache key carries the conf's filesystem identity: two
    // sessions whose confs resolve the same path string to DIFFERENT
    // filesystems (fs.defaultFS divergence -- the axis that changes
    // which bytes a relative/unqualified path names) must not serve
    // each other's cached fingerprints. NUL separators keep the key
    // collision-free for any legal path characters ('|' is legal in
    // a path; NUL is not). Divergences the key cannot see (per-scheme
    // endpoint remaps, credential-dependent views of one URI) are the
    // documented reason such deployments set graft.fingerprint.ttlMs
    // to 0.
    val ck = conf.get("fs.defaultFS", "file:///") + "\u0000" +
      sfDir + "\u0000" + table
    if (ttl > 0L) {
      val hit = fpCache.get(ck)
      if (hit != null && System.nanoTime() - hit._1 < ttl) return hit._2
    }
    val fp = fingerprintUncached(sfDir, table, conf)
    if (ttl > 0L) fpCache.put(ck, (System.nanoTime(), fp))
    fp
  }

  private def fingerprintUncached(sfDir: String, table: String,
      conf: org.apache.hadoop.conf.Configuration): String = {
    val path = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(sfDir), table + ".parquet")
    val fs = path.getFileSystem(conf)
    val qual = fs.makeQualified(path)
    def statHash(st: org.apache.hadoop.fs.FileStatus): Long =
      st.getPath.getName.hashCode * 1000003L ^
        st.getModificationTime ^ (st.getLen * 31L)
    val h =
      if (!fs.exists(qual)) 0L
      else {
        val root = fs.getFileStatus(qual)
        if (root.isFile
            || java.lang.Boolean.getBoolean("graft.fingerprint.shallow"))
          statHash(root)
        else {
          val it = fs.listFiles(qual, true)
          val files = scala.collection.mutable.ArrayBuffer.empty[
            (String, Long)]
          while (it.hasNext) {
            val st = it.next()
            files += ((st.getPath.toString, statHash(st)))
          }
          files.sortBy(_._1)
            .foldLeft(statHash(root))((acc, kv) => acc * 1000003L ^ kv._2)
        }
      }
    qual.toString + "@" + java.lang.Long.toHexString(h)
  }

  /** Evict (and optionally unpersist) sibling entries of `key`: same
    * prefix up to the LAST '@' (i.e. same memo kind + table path),
    * different fingerprint suffix. Without this, a table rewritten in
    * place mid-session keys a fresh build but the superseded build's
    * persisted blocks stay pinned until invalidate/context stop —
    * repeated rewrites would accumulate dead cached frames. Keys
    * embedding several fingerprints evict on the LAST table's rewrite
    * only (the earlier fingerprints are part of the prefix); that
    * residual leak is bounded by rewrites of the non-final table.
    */
  private def evictSiblings(per: ConcurrentHashMap[String, DataFrame],
      key: String, unpersist: Boolean): Unit = {
    val at = key.lastIndexOf('@')
    if (at < 0) return
    val prefix = key.substring(0, at + 1)
    val it = per.keySet().iterator()
    val stale = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val k = it.next()
      if (k != key && k.startsWith(prefix)) stale += k
    }
    stale.foreach { k =>
      val df = per.remove(k)
      if (df != null && unpersist)
        try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
  }

  /** Memoize `build` — persisted — under (session, key). The same
    * key returns the SAME persisted frame; unpersist via
    * [[invalidate]] or context stop.
    *
    * The builder runs OUTSIDE the map's bin lock (the
    * `Pairs.probeCache` posture): several memoized silvers run eager
    * Spark jobs in their builders (the components fixpoint's
    * per-round localCheckpoints, the wide-form min/max probe), and
    * `computeIfAbsent` would hold the bin lock for the build's whole
    * duration — minutes at scale — stalling every concurrent memo
    * user hashing into the same bin. The race cost is an occasional
    * duplicate build whose loser is unpersisted immediately.
    */
  def getOrBuild(s: SparkSession, key: String)(
      build: => DataFrame): DataFrame = {
    val per = memos.computeIfAbsent(idOf(s),
      _ => new ConcurrentHashMap[String, DataFrame]())
    evictSiblings(per, key, unpersist = true)
    val hit = per.get(key)
    if (hit != null) return hit
    val built = build.persist()
    val prior = per.putIfAbsent(key, built)
    if (prior != null) {
      // losing the race: release the duplicate build's storage — but
      // ONLY if its plan is distinct from the winner's. CacheManager
      // keys cached data by CANONICALIZED plan, so when both builders
      // produced the same plan (the common deterministic case) they
      // share ONE cache entry and unpersisting the loser would uncache
      // the winner too, leaving the memoized frame silently
      // recomputing forever. Distinct plans (e.g. localCheckpoint
      // builders, whose RDD-backed plans are unique per build) hold
      // separate entries and the loser's must be dropped or it leaks.
      val distinctPlan =
        try !built.queryExecution.analyzed.sameResult(
          prior.queryExecution.analyzed)
        catch { case _: Throwable => false }
      if (distinctPlan)
        try built.unpersist(blocking = false)
        catch { case _: Throwable => () }
      prior
    } else built
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
    evictSiblings(per, key, unpersist = false)
    // same build-outside-the-lock posture as getOrBuild: resolving a
    // parquet relation lists files and reads footers — not a Spark
    // job, but still I/O a bin lock shouldn't serialize
    val hit = per.get(key)
    if (hit != null) return hit
    val built = build
    val prior = per.putIfAbsent(key, built)
    if (prior != null) prior else built
  }
}
