package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables

/** Data-engineering audit surface: rule-based data-quality checks and
  * CDC snapshot reconciliation — the operators that run BEFORE a
  * training pipeline trusts a drop (reference posture: the collector
  * trusts its own writes; a 100 TB lake can't).
  *
  * Scale posture shared by both: row-local rules fold into ONE
  * conditional-sum aggregate per table scan (never one scan per
  * rule), referential rules are key-projected anti/outer joins that
  * shuffle 8-byte keys, and every verdict reduces to a handful of
  * rows before the driver sees it.
  */
object AuditOps {

  /** `dq_audit` — the dbt-style data-quality rule sweep over the
    * star schema, one row per rule: null keys, domain membership,
    * value ranges, primary-key uniqueness, and the two referential
    * edges (lineitem→orders, orders→customer).
    *
    * Shape: all row-local lineitem rules ride ONE scan as
    * conditional sums (4 rules, one pass); same for orders (2
    * rules); PK uniqueness is one groupBy counting rows beyond the
    * first per key; each referential rule is a key-projected LEFT
    * ANTI join (nothing but the 8-byte key shuffles — at 100 TB the
    * orphan check costs one key exchange, not a table exchange).
    * The per-rule frames union to ≤ 8 rows total.
    */
  def dqAudit(s: SparkSession, d: String): DataFrame =
    dqAuditFrames(Tables.lineitem(s, d), Tables.orders(s, d),
      Tables.customer(s, d))

  /** Frame-parameterized core of [[dqAudit]] — the seam the spec
    * uses to prove each rule actually FIRES on an injected
    * violation (the gated corpus is clean, so the dir-level query
    * alone only proves the all-pass row).
    */
  def dqAuditFrames(li: DataFrame, ord: DataFrame,
      cust: DataFrame): DataFrame = {
    def rule(name: String, violations: Column, checked: Column): Column =
      struct(lit(name).as("rule"), violations.cast("long").as("violations"),
        checked.cast("long").as("checked"))
    def cnt(p: Column): Column = sum(when(p, 1L).otherwise(0L))

    // one lineitem pass → 4 row-local rules
    val liRules = li.agg(
      rule("lineitem_null_keys",
        cnt(col("l_orderkey").isNull || col("l_partkey").isNull ||
          col("l_suppkey").isNull), count(lit(1))).as("r1"),
      rule("lineitem_nonpositive_price",
        cnt(col("l_extendedprice") <= 0.0), count(lit(1))).as("r2"),
      rule("lineitem_discount_range",
        cnt(col("l_discount") < 0.0 || col("l_discount") > 1.0),
        count(lit(1))).as("r3"),
      rule("lineitem_returnflag_domain",
        cnt(!col("l_returnflag").isin("A", "N", "R")),
        count(lit(1))).as("r4"))
      .select(explode(array(col("r1"), col("r2"), col("r3"), col("r4")))
        .as("r"))

    // one orders pass → 2 row-local rules
    val ordRules = ord.agg(
      rule("orders_null_custkey", cnt(col("o_custkey").isNull),
        count(lit(1))).as("r1"),
      rule("orders_status_domain",
        cnt(!col("o_orderstatus").isin("F", "O", "P")),
        count(lit(1))).as("r2"))
      .select(explode(array(col("r1"), col("r2"))).as("r"))

    // PK uniqueness: rows beyond the first per o_orderkey
    val pkRule = ord.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - lit(1L)).as("extra"), sum(col("c")).as("n"))
      .select(struct(lit("orders_dup_pk").as("rule"),
        col("extra").cast("long").as("violations"),
        col("n").cast("long").as("checked")).as("r"))

    // referential edges: key-projected anti joins
    def orphans(name: String, fact: DataFrame, factKey: String,
        dim: DataFrame, dimKey: String): DataFrame = {
      val total = fact.agg(count(lit(1)).as("n"))
      fact.select(col(factKey))
        .join(dim.select(col(dimKey)), col(factKey) === col(dimKey),
          "left_anti")
        .agg(count(lit(1)).as("v"))
        .crossJoin(broadcast(total))
        .select(struct(lit(name).as("rule"),
          col("v").cast("long").as("violations"),
          col("n").cast("long").as("checked")).as("r"))
    }
    val ref1 = orphans("lineitem_orphan_orderkey", li, "l_orderkey",
      ord, "o_orderkey")
    val ref2 = orphans("orders_orphan_custkey", ord, "o_custkey",
      cust, "c_custkey")

    liRules.unionAll(ordRules).unionAll(pkRule).unionAll(ref1)
      .unionAll(ref2)
      .select(col("r.rule").as("rule"), col("r.violations").as("violations"),
        col("r.checked").as("checked"),
        when(col("r.violations") === 0L, lit("pass")).otherwise(lit("fail"))
          .as("status"))
      .orderBy("rule")
  }

  /** `cdc_snapshot_diff` — change-data-capture reconciliation of two
    * order snapshots: classify every key as insert / delete /
    * update / unchanged via ONE full-outer join on the key, then
    * reduce to per-class counts and exact-cents checksums — the
    * merge-planning report an incremental pipeline runs before
    * applying a drop.
    *
    * The snapshots are deterministic hash slices of `orders` (the
    * portable multiplicative hash of [[LlmTextOps.trainValSplit]],
    * two decorrelated streams): OLD = slices 1–9, NEW = slices 0–8,
    * with NEW bumping price by exactly cents DIV 10 on a second
    * 1-in-7 hash stream — so inserts, deletes, updates, and
    * unchanged rows all exist with known proportions, and every
    * compared value is an exact integer (cents), never a float.
    *
    * Scale: prices travel as 8-byte cents beside the 8-byte key;
    * the join shuffles both snapshots once on the key (AQE handles
    * skew); the classification is row-local post-join; output is 4
    * rows. With real snapshot directories the same plan applies
    * unchanged — and if both snapshots are bucketed by key (the
    * CorpusSilver discipline), the join is zero-exchange.
    */
  def cdcSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val P = 1000000007L
    val base = Tables.orders(s, d).select(col("o_orderkey"),
      ((col("o_totalprice").cast(DecimalType(18, 2))
        .cast(DecimalType(20, 2)) * lit(100))
        .cast(DecimalType(22, 0)).cast("long")).as("cents"),
      (((col("o_orderkey") % P) * lit(2654435761L) % P) % 10).as("h10"),
      (((col("o_orderkey") % P) * lit(1779033703L) % P) % 7).as("h7"))
    val old = base.where(col("h10") =!= 0)
      .select(col("o_orderkey").as("k_old"), col("cents").as("cents_old"))
    val neu = base.where(col("h10") =!= 9)
      .select(col("o_orderkey").as("k_new"),
        (col("cents") + when(col("h7") === 0,
          expr("cents DIV 10")).otherwise(0L)).as("cents_new"))
    old.join(neu, col("k_old") === col("k_new"), "full_outer")
      .select(
        when(col("k_old").isNull, lit("insert"))
          .when(col("k_new").isNull, lit("delete"))
          .when(col("cents_old") =!= col("cents_new"), lit("update"))
          .otherwise(lit("unchanged")).as("change_type"),
        coalesce(col("cents_old"), lit(0L)).as("co"),
        coalesce(col("cents_new"), lit(0L)).as("cn"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("co")).as("old_cents"),
        sum(col("cn")).as("new_cents"))
      .orderBy("change_type")
  }

  /** `key_skew_audit` — the shuffle-key skew report that feeds the
    * salting machinery (`engine.Skew`, `join_skew_salted`): for the
    * two hottest join/aggregate keys in the schema — `events.user_id`
    * and `lineitem.l_partkey` — the key-count profile a planner (or
    * an engineer sizing `spark.sql.shuffle.partitions`) reads before
    * a 100 TB run: row count, distinct keys, the heaviest key's row
    * count, and the top-1 / top-10 key shares. AQE's skew-join split
    * reacts at runtime; this row is the OFFLINE audit that says which
    * keys will trigger it and whether pre-salting is worth wiring.
    *
    * Portability: everything is exact integer counts until the two
    * fenced share divisions; the top-10 cut rides a (count desc, key
    * asc) TOTAL order. Scale shape: one map-side-combined count
    * aggregate per table, then folds over the (bounded) key-count
    * frame; the top-10 is TakeOrderedAndProject, never a global sort.
    *
    * The `recommendation` column turns the audit ACTIONABLE — the
    * one-line verdict an engineer (or a planner rule) hands to the
    * join wiring, decided on EXACT integer predicates over the
    * measured counts (no new shuffle — computed on the same 1-row
    * stats frame), first match wins:
    *   - `salt_8x`: the hottest key holds ≥ 1/16 of all rows
    *     (`max_key_rows · 16 ≥ n_rows`) — one reducer gets ≥ n/16 of
    *     the table REGARDLESS of partition count, past what AQE's
    *     split can fix cheaply → pre-salt via
    *     [[graft.engine.Skew.saltedJoin]] (the documented hand-off);
    *   - `broadcast`: the key domain is dimension-sized
    *     (`n_keys ≤ 1024`) — the keyed side aggregates/builds to a
    *     frame any executor holds, so broadcast it and skip the
    *     fact-side shuffle entirely;
    *   - `aqe_ok`: neither trips — AQE's runtime skew split
    *     (`spark.sql.adaptive.skewJoin`, on by default) covers the
    *     residual imbalance.
    */
  def keySkewAudit(s: SparkSession, d: String): DataFrame = {
    def audit(name: String, keyed: DataFrame): DataFrame = {
      val counts = keyed.groupBy(col("k")).agg(count(lit(1)).as("c"))
      val stats = counts.agg(sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"), max(col("c")).as("max_key_rows"))
      val top10 = counts.orderBy(col("c").desc, col("k").asc).limit(10)
        .agg(sum(col("c")).as("top10_rows"))
      stats.crossJoin(top10)
        .select(lit(name).as("audited_key"), col("n_rows"),
          col("n_keys"), col("max_key_rows"), col("top10_rows"),
          graft.engine.Determinism.r6(col("max_key_rows").cast("double")
            / col("n_rows").cast("double")).as("top1_share"),
          graft.engine.Determinism.r6(col("top10_rows").cast("double")
            / col("n_rows").cast("double")).as("top10_share"),
          when(col("max_key_rows") * lit(16L) >= col("n_rows"),
            lit("salt_8x"))
            .when(col("n_keys") <= lit(1024L), lit("broadcast"))
            .otherwise(lit("aqe_ok")).as("recommendation"))
    }
    audit("events.user_id",
      Tables.events(s, d).select(col("user_id").as("k")))
      .unionByName(audit("lineitem.l_partkey",
        Tables.lineitem(s, d).select(col("l_partkey").as("k"))))
      .orderBy("audited_key")
  }

  /** `scd2_history` — build a type-2 slowly-changing dimension from
    * the change stream (Kimball's SCD2, the interval form every
    * warehouse dimension load materializes): per user, each maximal
    * RUN of consecutive equal `event_type` values becomes one
    * version row with [valid_from, valid_to) micro-timestamps, a
    * 1-based version number, the run's event count, and the
    * is_current flag (open interval). This is the gaps-and-islands
    * classic: a change marker (lag ≠ current under the (us,
    * event_id) total order), a running sum turning markers into
    * island ids, one aggregate per island, and a lead() closing each
    * interval with its successor's start — `cdc_snapshot_diff` plans
    * a merge between two snapshots; this one turns the full stream
    * INTO the dimension history table.
    *
    * Scale shape: ONE per-user shuffle+sort serves the lag, the
    * running sum, and (after the island aggregate, which reuses the
    * same hash partitioning) the lead — the lag_features plan; no
    * step is wider than the user key. All values are exact integers
    * / strings; no float ops at all, so the row hash-gates.
    */
  def scd2History(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
    val marked = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull
          || lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = marked.groupBy(col("user_id"), col("version"))
      .agg(max(col("event_type")).as("attr_value"),
        min(col("us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy("user_id").orderBy(col("version"))
    islands
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w2))
      .select(col("user_id"), col("version"), col("attr_value"),
        col("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"), col("n_events"))
      .orderBy("user_id", "version")
  }
}
