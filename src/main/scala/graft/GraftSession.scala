package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a session builder with the engine's canonical
  * configuration — UTC semantics (oracle parity), AQE on, the graft
  * SQL functions registered, and shuffle parallelism sized to the
  * cluster instead of Spark's 200-partition default.
  */
object GraftSession {

  /** Pre-configured builder; caller adds master/appName and builds. */
  def builder(shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // collect_list/collect_set run as ObjectHashAggregate, whose
      // sort-based fallback triggers at 128 in-memory keys by default
      // — the posting-list builds here aggregate tens of thousands of
      // keys per partition, so the default silently degrades them to
      // a full sort. Entries are (key, small list) pairs; 4M keys is
      // still well inside executor memory at our partition sizing.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4000000")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)

  /** Register every graft SQL function family imperatively —
    * idempotent per name. The safety net for sessions where the
    * extensions config cannot apply (getOrCreate over an existing
    * SparkContext freezes static confs): without it, SQL callers
    * would only see a function after some DataFrame operator happened
    * to register its family.
    */
  def registerAll(s: SparkSession): Unit = {
    graft.functions.VectorExprs.register(s)
    graft.functions.TextExprs.register(s)
    graft.functions.MinHashAgg.register(s)
    graft.functions.TopKAgg.register(s)
    graft.functions.GramAgg.register(s)
    graft.functions.CorrMomentsAgg.register(s)
    graft.functions.BloomFns.register(s)
    graft.functions.MisraGriesAgg.register(s)
    graft.functions.ZOrderExpr.register(s)
  }

  /** Local session for tests/demos. Functions are also registered
    * imperatively: `getOrCreate` may return a pre-existing session
    * whose extensions config is frozen, and registration is
    * idempotent.
    */
  def local(cores: Int = 4): SparkSession = {
    val s = builder(cores)
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    registerAll(s)
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
