package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-pair generation from posting lists, with an automatic
  * fallback past the packed-long fast path's 31-bit id precondition.
  *
  * Every LSH-family candidate pipeline (dedup_near, dedup_minhash,
  * dedup_embed_blocked) reduces to the same tail: explode the C(k,2)
  * id pairs of short posting lists, then aggregate per pair (distinct
  * or co-occurrence count). The fast path packs a pair into ONE long
  * (`i << 32 | j`, functions.PackedPairs), so the aggregation hashes
  * an 8-byte key and the explode emits primitive longs — but it
  * requires ids in [0, 2³¹). A real 100 TB corpus id space overflows
  * that, and the old fail-fast would CRASH the pipeline there rather
  * than degrade; instead callers probe the id space once
  * (`needsWideForm`) and these generators transparently switch to the
  * struct-pair form (functions.PairCombinations: 16-byte keys, same
  * plan shape, measured ~25% slower on the pair stage) when the
  * packed form cannot hold the ids. DedupPropertiesSpec drives the
  * dedup operators through both forms.
  */
object Pairs {

  /** True when the id column cannot ride the packed-long fast path
    * (any id < 0 or ≥ 2³¹). One min/max aggregation over the source
    * id column — on parquet a single-column scan, trivial next to the
    * pair pipeline it guards. NOTE this makes *constructing* a
    * dedup-family DataFrame eager by exactly that one job (plan
    * inspection without execution still pays it); pipelines that know
    * their id-space bound statically (e.g. ids minted by a ledger)
    * keep construction lazy by passing `wide` to the generators
    * directly.
    *
    * The probe can be skipped entirely (keeping DataFrame
    * construction fully lazy — e.g. for plan-only inspection) via the
    * session conf `spark.graft.pairs.wideForm`: `wide` forces the
    * always-correct struct form, `packed` asserts the caller's ids
    * fit 31 bits (misassertion degrades to PackedPairs' loud
    * fail-fast, never wrong pairs), `auto` (default) probes.
    *
    * Memoized per (session, file roots + probed schema) — but ONLY
    * when the plan between the probed column and its file leaves is
    * row-preserving (projections/aliases): a verdict measured through
    * a Filter/Limit/Join would describe a subset of the files, and a
    * later full-table probe of the same root would wrongly reuse its
    * (possibly narrower) answer. Non-row-preserving plans are probed
    * every call. A stale cached entry for the same files (rewritten
    * in place with wider ids mid-session) can only under-report
    * width, which degrades to PackedPairs' loud fail-fast — never to
    * silently wrong pairs.
    */
  def needsWideForm(ids: DataFrame, idCol: String): Boolean = {
    ids.sparkSession.conf.get(WideFormConf, "auto") match {
      case "wide"   => return true
      case "packed" => return false
      case "auto"   => ()
      case other    => throw new IllegalArgumentException(
        s"$WideFormConf must be auto|packed|wide, got '$other'")
    }
    // cache key = the file roots of every leaf + the probed column's
    // schema: session-free strings (a plan object would strongly
    // reference the SparkSession through its file relations,
    // defeating the weak keying below) with source identity spelled
    // out — a plan's toString TRUNCATES the location, so two
    // different parquet tables would otherwise collide on one key
    // and reuse the wrong verdict. Plans with any non-file leaf
    // (in-memory test frames, views over synthetic data) return None
    // and are probed every call: that probe is cheap exactly when
    // the data isn't a 100 TB file source. The probe job itself runs
    // OUTSIDE the map's locks (computeIfAbsent would hold a bin lock
    // for the job's whole duration — minutes at scale, stalling
    // unrelated same-bin probes); the race cost is only an
    // occasional duplicate probe of the same answer.
    val projected = ids.select(col(idCol))
    val key = cacheKey(projected.queryExecution.analyzed)
    val perSession = probeCache.computeIfAbsent(ids.sparkSession,
      _ => new java.util.concurrent.ConcurrentHashMap[String,
        java.lang.Boolean]())
    key.flatMap(k => Option(perSession.get(k))) match {
      case Some(cached) => cached.booleanValue()
      case None =>
        val r = ids.agg(
          min(col(idCol).cast("long")).as("lo"),
          max(col(idCol).cast("long")).as("hi")).head()
        val wide = !r.isNullAt(0) &&
          (r.getLong(0) < 0L || r.getLong(1) > Int.MaxValue.toLong)
        key.foreach(k =>
          perSession.putIfAbsent(k, java.lang.Boolean.valueOf(wide)))
        wide
    }
  }

  /** Public name of the probe-bypass conf (see [[needsWideForm]]). */
  val WideFormConf = "spark.graft.pairs.wideForm"

  private def cacheKey(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.{Project, SubqueryAlias}
    // a cached verdict must describe the FILES, so it is only sound
    // when (a) every row of the leaves reaches the probe — any
    // row-dropping/row-adding node (Filter, Limit, Join, Sample, …)
    // above the leaves means a narrow filtered probe could cache
    // wide=false for the root — and (b) the probed VALUES are the
    // leaf column's values untransformed: a value-mapping projection
    // (e.g. doc_id % 100) has the same file roots and schema as the
    // raw table and would otherwise cache its narrowed verdict under
    // the raw table's key. So only pass-through Projects (attributes
    // and bare renames) are cacheable; anything else probes per call.
    val cacheable = plan.collect { case _ => () }.size == plan.collect {
      case p: Project if p.projectList.forall {
            case _: AttributeReference => true
            case a: Alias => a.child.isInstanceOf[AttributeReference]
            case _ => false
          } => ()
      case _: SubqueryAlias => ()
      case leaf if leaf.children.isEmpty => ()
    }.size
    if (!cacheable) return None
    val roots = plan.collectLeaves().map {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            Some(fs.location.rootPaths.mkString(";"))
          case _ => None
        }
      case _ => None
    }
    if (roots.nonEmpty && roots.forall(_.isDefined))
      Some(roots.flatten.mkString("|") + "#" + plan.schema.catalogString)
    else None
  }

  private val probeCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]]())

  /** Distinct (i, j) candidate id pairs (i < j) from posting lists —
    * `listCol` is an array<long> of the ids sharing one bucket.
    */
  def distinctPairs(s: SparkSession, lists: DataFrame, listCol: String,
      wide: Boolean): DataFrame =
    unpack(explodedPairs(s, lists, listCol, wide).distinct(), wide)

  /** Distinct (i, j) pairs from RAW bucket-membership rows (one row
    * per (bucket, id)), with hot-bucket splitting: a bucket larger
    * than `hotCap` members would otherwise become ONE task computing
    * C(k,2) pairs after `collect_list` — at 100 TB a single viral
    * band bucket is a straggler measured in hours, and the collected
    * array itself outgrows the aggregation buffer. Members of hot
    * buckets are hashed into `groups` salt groups; pairs then come
    * from `groups` intra-group lists (C(k/g, 2) each) plus
    * C(groups, 2) cross-group list×list rows, repartitioned so each
    * bounded chunk of the quadratic work is its own task. Cold
    * buckets ride the exact [[distinctPairs]] plan. Output is
    * IDENTICAL to the unsplit form (HotBucketSpec pins it, both pair
    * forms): every unordered pair within a bucket appears in exactly
    * one branch — same group ⇒ intra, different ⇒ cross.
    *
    * Cost when nothing is hot: one tiny bucket-size aggregation plus
    * a size join the cold groupBy's partitioning reuses — the
    * detection overhead `heavyHitters`-style observability would pay
    * anyway. Singleton buckets drop at the size join (the `> 1`
    * filter the list form applies post-collect).
    */
  def distinctPairsFromMembers(s: SparkSession, members: DataFrame,
      bucketCols: Seq[String], idCol: String, wide: Boolean,
      hotCap: Int, groups: Int = 16): DataFrame =
    unpack(explodedPairsFromMembers(s, members, bucketCols, idCol, wide,
      hotCap, groups).distinct(), wide)

  /** (i, j, `cntName`) co-occurrence counts from raw membership rows
    * with hot-bucket splitting — the [[countedPairs]] twin of
    * [[distinctPairsFromMembers]].
    */
  def countedPairsFromMembers(s: SparkSession, members: DataFrame,
      bucketCols: Seq[String], idCol: String, cntName: String,
      wide: Boolean, hotCap: Int, groups: Int = 16): DataFrame =
    unpack(explodedPairsFromMembers(s, members, bucketCols, idCol, wide,
      hotCap, groups)
      .groupBy(col("p")).agg(count(lit(1)).as(cntName)), wide, col(cntName))

  /** The shared exploded-pair stream of the FromMembers forms —
    * `private[graft]` so the spec can measure per-task pair counts
    * with `spark_partition_id` before the distinct collapses them.
    */
  private[graft] def explodedPairsFromMembers(s: SparkSession,
      members: DataFrame, bucketCols: Seq[String], idCol: String,
      wide: Boolean, hotCap: Int, groups: Int): DataFrame = {
    require(hotCap > 1, s"hotCap must exceed 1, got $hotCap")
    require(groups > 1, s"groups must exceed 1, got $groups")
    val bkey = bucketCols.map(col)
    val sizes = members.groupBy(bkey: _*).agg(count(lit(1)).as("_bsz"))
      .where(col("_bsz") > 1)
    val m = members.join(sizes, bucketCols)
    val cold = m.where(col("_bsz") <= hotCap)
      .groupBy(bkey: _*).agg(collect_list(col(idCol)).as("ds"))
    val coldPairs = explodedPairs(s, cold, "ds", wide)
    // hot members salt on a hash of the ID (deterministic, id-unique
    // — the Skew.saltedJoin entropy rule), partitioning each viral
    // bucket into `groups` disjoint lists
    val hot = m.where(col("_bsz") > hotCap)
      .withColumn("_g", pmod(xxhash64(col(idCol)), lit(groups.toLong)))
    val hotLists = hot.groupBy((bkey :+ col("_g")): _*)
      .agg(collect_list(col(idCol)).as("ds"))
    val intra = explodedPairs(s,
      hotLists.where(size(col("ds")) > 1), "ds", wide)
    val aSide = hotLists.select(
      (bkey :+ col("_g").as("_ga") :+ col("ds").as("_dsa")): _*)
    val bSide = hotLists.select(
      (bkey :+ col("_g").as("_gb") :+ col("ds").as("_dsb")): _*)
    // one row per (bucket, group-pair), each carrying two ≤k/g-member
    // arrays; the repartition spreads a single bucket's C(groups, 2)
    // quadratic chunks across tasks instead of leaving them hashed
    // together on the bucket key
    val cross = aSide.join(bSide, bucketCols)
      .where(col("_ga") < col("_gb"))
      .repartition((bkey ++ Seq(col("_ga"), col("_gb"))): _*)
      .select(explode(col("_dsa")).as("_x"), col("_dsb"))
      .select(col("_x"), explode(col("_dsb")).as("_y"))
      .select(crossPair(wide).as("p"))
    coldPairs.union(intra).union(cross)
  }

  /** Order one cross-group (x, y) into the branch-shared pair shape.
    * The packed form re-checks the 31-bit precondition inline: unlike
    * the list branches (PackedPairs fails fast inside the
    * expression), a silent overflow here would emit WRONG pairs, not
    * an error.
    */
  private def crossPair(wide: Boolean): org.apache.spark.sql.Column =
    if (wide)
      struct(least(col("_x"), col("_y")).as("i"),
        greatest(col("_x"), col("_y")).as("j"))
    else
      expr(s"""CASE WHEN _x BETWEEN 0 AND ${Int.MaxValue}
                     AND _y BETWEEN 0 AND ${Int.MaxValue}
               THEN shiftleft(least(_x, _y), 32) + greatest(_x, _y)
               ELSE CAST(raise_error(
                 'packed cross pair requires ids in [0, 2^31)') AS BIGINT)
               END""")

  /** (i, j, `cntName`) pair co-occurrence counts from posting lists —
    * the Jaccard-numerator shape (a pair appears once per shared
    * bucket).
    */
  def countedPairs(s: SparkSession, lists: DataFrame, listCol: String,
      cntName: String, wide: Boolean): DataFrame =
    unpack(explodedPairs(s, lists, listCol, wide)
      .groupBy(col("p")).agg(count(lit(1)).as(cntName)), wide, col(cntName))

  /** One exploded pair column "p" per C(k,2) combination — a packed
    * long on the fast path, a struct<i,j> on the wide path. The
    * aggregation (distinct vs count) goes on top; [[unpack]] recovers
    * (i, j) either way, so the two public shapes share one pipeline.
    */
  private def explodedPairs(s: SparkSession, lists: DataFrame,
      listCol: String, wide: Boolean): DataFrame =
    if (wide)
      lists.select(explode(graft.functions.PairCombinations.pairs(
        s, sort_array(col(listCol)))).as("p"))
    else
      lists.select(explode(graft.functions.PackedPairs.packedPairs(
        s, col(listCol))).as("p"))

  private def unpack(pairs: DataFrame, wide: Boolean,
      extra: org.apache.spark.sql.Column*): DataFrame = {
    val ij =
      if (wide) Seq(col("p.i").as("i"), col("p.j").as("j"))
      else Seq(shiftright(col("p"), 32).as("i"),
        col("p").bitwiseAND(lit(0xffffffffL)).as("j"))
    pairs.select(ij ++ extra: _*)
  }
}
