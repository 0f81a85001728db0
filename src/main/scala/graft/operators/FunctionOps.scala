package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Determinism.r6
import graft.engine.Tables

/** E11–E15: scalar/aggregate function catalog (SURVEY.md §2.2) —
  * distinct (exact + HLL), JSON, string, date/time, and array
  * higher-order functions. All built-ins ⇒ whole-stage codegen; no
  * UDFs in any hot path.
  */
object FunctionOps {

  /** E11 `distinct_users` — exact distinct per group. At 100 TB
    * `count(distinct)` is a two-phase shuffle (expand + re-agg);
    * the HLL twin below is the constant-memory scale path.
    */
  def distinctUsers(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** E11b `distinct_users_approx` — HLL++ sketch variant (no oracle:
    * approximate by design). rsd=0.01 keeps the sketch ~constant
    * memory per group regardless of cardinality.
    */
  def distinctUsersApprox(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.01).as("n_users_approx"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** E11c `distinct_users_kmv` — K-minimum-values cardinality
    * estimate: the PORTABLE sketch twin of `distinct_users_approx`.
    * HLL internals are engine-specific (that row stays rows-only
    * gated); KMV is pure arithmetic — keep the k smallest distinct
    * portable hashes per group, estimate n̂ = (k−1)·M/h₍ₖ₎ — so a
    * second engine reproduces the ESTIMATE bit-for-bit and the row
    * is hash-gated like any exact query. Groups under k distinct
    * values degenerate to the exact count (the kept set IS the
    * distinct set — standard KMV rule).
    *
    * Scale shape: the distinct shuffles 16-byte (group, hash) rows —
    * the same exchange an exact count-distinct pays — and the sketch
    * itself is the bounded `graft_topk` aggregate (score = −h):
    * O(k) state at every partial/merge, so the post-distinct
    * aggregation never buffers a group's full hash set. k = 64 here
    * so the estimator branch is exercised at test cardinalities
    * (~150 users); production sizes k into the thousands for ~2%
    * error (1/√(k−2)). SketchQualitySpec holds the estimate within
    * 25% of the exact count at this k.
    */
  def distinctUsersKmv(s: SparkSession, d: String): DataFrame = {
    val k = 64
    val h = pmod(
      pmod(col("user_id"), lit(1048573L)) * lit(2654435761L)
        + pmod(col("user_id"), lit(8191L)) * lit(131L),
      lit(2147483647L)) + lit(1L)
    Tables.events(s, d)
      .select(col("event_type"), h.as("h"))
      .distinct()
      .groupBy(col("event_type"))
      .agg(graft.functions.TopKAgg.topk(s,
        -col("h").cast("double"), col("h"), k).as("t"))
      .select(col("event_type"),
        when(size(col("t")) < k, size(col("t")).cast("long"))
          .otherwise(floor(
            lit((k - 1).toDouble) * lit(2147483647.0)
              / expr("""CAST(aggregate(t, CAST(0 AS BIGINT),
                          (acc, x) -> greatest(acc, x.vec_id)) AS DOUBLE)""")
              + 0.5).cast("long"))
          .as("n_users_kmv"))
      .orderBy("event_type")
  }

  /** E12 `json_extract` — JSON scalar path extraction from
    * `events.props` ('{"k": <int>}') + grouped stats over it.
    */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_with_k"),
        sum(col("k").cast("long")).as("sum_k"),
        r6(avg(col("k"))).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** E13 `string_funcs` — string scalar catalog over `documents`:
    * length, split/size, element access, case, substring, position.
    */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        length(col("text")).as("text_len"),
        size(split(col("text"), " ")).as("n_tokens"),
        element_at(split(col("text"), " "), 1).as("first_token"),
        upper(substring(col("text"), 1, 10)).as("prefix_upper"),
        instr(col("text"), "spark").as("spark_pos"),
        col("lang"))
      .orderBy("doc_id")

  /** E14 `date_math` — date/time scalar catalog over `orders`:
    * component extraction, truncation, day arithmetic, datediff.
    * weekday(): Monday=0 (oracle twin: DuckDB isodow-1).
    */
  def dateMath(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        weekday(col("o_orderdate")).as("dow"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
          .as("days_since_epoch"))
      .orderBy("o_orderkey")

  /** `map_funcs` — map-type coverage: per-document token histogram
    * built as a real MapType column (explode → count → map_from_entries),
    * then interrogated with map functions. Only scalar projections are
    * emitted (map column layouts aren't hash-stable across engines).
    */
  def mapFuncs(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("tok"), col("cnt"))))
        .as("histo"))
      .select(
        col("doc_id"),
        size(col("histo")).as("n_distinct_tokens"),
        array_max(map_values(col("histo"))).as("top_token_count"),
        coalesce(element_at(col("histo"), "data"), lit(0L)).as("count_data"))
      .orderBy("doc_id")
  }

  /** `data_profile` — per-column data-quality profile of the events
    * table: row count, null count, exact distinct count, and typed
    * min/max per column, one output row per column. The pass every
    * ingest pipeline runs before training jobs trust a new drop —
    * schema drift, null floods, and constant columns all surface here
    * (the engine-side generalization of the reference's `have_samples`
    * freshness check, dataCollector.py:83-94).
    *
    * One scan, one aggregation: all six columns' stats ride a single
    * agg (Spark plans the multi-distinct via one expand — 6× the scan
    * rows through the aggregate, still one pass over the parquet),
    * then the single result row unpivots via `stack` into the
    * (column, stats) long form. Min/max are emitted as DOUBLE for
    * numeric/timestamp columns (int64→double and epoch-µs→double are
    * the same correctly-rounded cast in any engine — deterministic
    * even where µs counts exceed 2⁵³) and NULL for strings, whose
    * cross-engine collation is not hash-stable. At 100 TB the exact
    * distinct is the cost dial: swap `countDistinct` for the KMV/HLL
    * sketch rows' machinery (`distinct_users_kmv`) per column when the
    * expand shuffle stops paying.
    */
  def dataProfile(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val agg = ev.agg(
      count(lit(1)).as("n"),
      // event_id
      count(col("event_id")).as("nn_event_id"),
      countDistinct(col("event_id")).as("nd_event_id"),
      min(col("event_id")).cast("double").as("mn_event_id"),
      max(col("event_id")).cast("double").as("mx_event_id"),
      // ts
      count(col("ts")).as("nn_ts"),
      countDistinct(col("ts")).as("nd_ts"),
      unix_micros(min(col("ts"))).cast("double").as("mn_ts"),
      unix_micros(max(col("ts"))).cast("double").as("mx_ts"),
      // user_id
      count(col("user_id")).as("nn_user_id"),
      countDistinct(col("user_id")).as("nd_user_id"),
      min(col("user_id")).cast("double").as("mn_user_id"),
      max(col("user_id")).cast("double").as("mx_user_id"),
      // event_type
      count(col("event_type")).as("nn_event_type"),
      countDistinct(col("event_type")).as("nd_event_type"),
      // value
      count(col("value")).as("nn_value"),
      countDistinct(col("value")).as("nd_value"),
      min(col("value")).as("mn_value"),
      max(col("value")).as("mx_value"),
      // props
      count(col("props")).as("nn_props"),
      countDistinct(col("props")).as("nd_props"))
    agg.selectExpr(
      """stack(6,
           'event_id',   n - nn_event_id,   nd_event_id,
             mn_event_id, mx_event_id,
           'event_type', n - nn_event_type, nd_event_type,
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           'props',      n - nn_props,      nd_props,
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           'ts',         n - nn_ts,         nd_ts,   mn_ts,   mx_ts,
           'user_id',    n - nn_user_id,    nd_user_id,
             mn_user_id, mx_user_id,
           'value',      n - nn_value,      nd_value, mn_value, mx_value
         ) AS (col_name, n_null, n_distinct, min_v, max_v)""",
      "n")
      .select(col("col_name"), col("n"), col("n_null"),
        col("n_distinct"), col("min_v"), col("max_v"))
      .orderBy("col_name")
  }

  /** E15 `array_funcs` — higher-order array functions over the
    * 64-dim float embeddings: size, fold (sum of squares), zip_with
    * (dot with reversed self), element min/max. All arithmetic is
    * cast to double *before* multiply and folded in list order so the
    * oracle reproduces bit-identical values (then rounded 6 dp).
    */
  def arrayFuncs(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorExprs
    val e = Tables.embeddings(s, d)
    val sq = VectorExprs.dot(s, col("embedding"), col("embedding"))
    val dotRev = VectorExprs.dot(s, col("embedding"), reverse(col("embedding")))
    e.select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      r6(sq).as("norm_sq"),
      r6(dotRev).as("dot_rev"),
      array_min(col("embedding")).cast("double").as("vmin"),
      array_max(col("embedding")).cast("double").as("vmax"),
      col("label"))
      .orderBy("vec_id")
  }
}
