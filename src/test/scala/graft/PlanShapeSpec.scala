package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Locks the 100 TB-relevant physical plan shapes (SURVEY §4): column
  * pruning at the scan, broadcast for dims, TakeOrderedAndProject for
  * top-k, no shuffle where none is needed. Regressions here are
  * invisible to the correctness gate but fatal at scale.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def planOf(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def planString(name: String): String = planOf(name).toString

  test("pricing_summary prunes the lineitem scan to the 5 needed columns") {
    val scans = planString("pricing_summary")
    assert(scans.contains("ReadSchema"))
    // none of the untouched columns may reach the scan
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_shipdate").foreach { c =>
      assert(!scans.contains(c), s"unpruned column $c in scan")
    }
  }

  test("dedup_near shuffles hashed shingles and packed pairs; sizes broadcast") {
    val p = planString("dedup_near")
    // the posting-list pipeline must key on 8-byte shingle hashes and
    // single-long packed pairs (compiled expressions in-plan), and the
    // per-doc size joins must be broadcast, not shuffled
    assert(p.contains("graft_shingle_hash3"), p.take(1500))
    assert(p.contains("graft_packed_pairs"), p.take(1500))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "size join fell back to SMJ")
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("dedup_near's two size joins share ONE broadcast build (ReusedExchange)") {
    // the i-side and j-side size joins broadcast the same doc→size
    // subplan; AQE must dedupe them into a single build (one document
    // scan + shingle pass, not two) — collect first so the adaptive
    // plan is final
    val df = SparkEntry.queries("dedup_near")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      "size broadcast built twice:\n" + p.take(2000))
  }

  test("dedup_components rounds are narrow equi-shuffles — no cartesian, no nested loop") {
    // the fixpoint loop runs before the returned frame materializes;
    // the output plan (members ∪ roots over the converged edge set)
    // plus a largeStar/smallStar round must all stay shuffle/broadcast
    val out = SparkEntry.queries("dedup_components")(spark, sf)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("basket_pairs: posting-list pair explode, no self-join of lineitem") {
    // baskets build inside ONE collect_set aggregate over lineitem;
    // pair candidates explode map-side from the basket arrays (packed
    // longs). The single BroadcastNestedLoopJoin is the INTENDED
    // 1-row global-N broadcast (lit(true) join against a 1-row agg) —
    // what must not appear is a cartesian pair scan or a second
    // lineitem-vs-lineitem join
    val p = planString("basket_pairs")
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("graft_packed_pairs"), "map-side packed pair explode")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must not global-sort")
    assert(p.contains("collect_set"), "baskets built in the aggregate")
  }

  test("join_broadcast uses BroadcastHashJoin for both dimension joins") {
    val p = planString("join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"))
  }

  test("topk_orders lowers to TakeOrderedAndProject (no global sort)") {
    val p = planString("topk_orders")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("ShuffleExchange") || p.contains("TakeOrderedAndProject"))
  }

  test("similarity_topk broadcasts the probe side (nested loop, no cartesian shuffle)") {
    val p = planString("similarity_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup_simhash is equi-join blocked — no cartesian/nested-loop pair scan") {
    val p = planString("dedup_simhash")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("dedup_embed_blocked is bucket-join blocked — no cartesian/nested-loop") {
    val p = planString("dedup_embed_blocked")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("join_range keeps the equi key driving the join — no cartesian/nested-loop") {
    val p = planString("join_range")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("pack_sequences is one window pass + partial/final agg — no join") {
    val p = planString("pack_sequences")
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("Window"), p.take(2000))
  }

  test("dedup_exact_digest shuffles 8-byte digests, not document text") {
    // string form (the AQE wrapper hides Exchange nodes from collect);
    // the digest alias inlines as _groupingexpression in the agg keys
    val p = planString("dedup_exact_digest")
    assert("hashpartitioning\\((digest|_groupingexpression)".r
      .findFirstIn(p).isDefined, p.take(2000))
    assert(!p.contains("hashpartitioning(text"), p.take(2000))
  }

  test("promo_revenue broadcasts the part dimension (no pre-agg shuffle)") {
    val p = planString("promo_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("join_skew_salted distributes the join on (user_id, _salt)") {
    val p = planString("join_skew_salted")
    assert(p.contains("_salt"), p.take(2000))
  }

  test("funnel_steps joins stay broadcast/hash — no cartesian, no nested loop") {
    val p = planString("funnel_steps")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("window_ntile is a single window pass — one shuffle on o_custkey, no join") {
    val p = planString("window_ntile")
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("Window"), p.take(2000))
  }

  test("ingest_raw is a scan+project+sort — no aggregation, no join") {
    val p = planString("ingest_raw")
    assert(!p.contains("HashAggregate") && !p.contains("Join"))
  }

  test("ohlc_hourly is a two-phase hash aggregate (map-side partials)") {
    val p = planString("ohlc_hourly")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final")
  }

  test("similarity_topk_q8 broadcasts probes and prunes top-k map-side") {
    val p = planString("similarity_topk_q8")
    // probe filter must reach the scan; the probe side must broadcast
    // (5 rows, never shuffled); WindowGroupLimit must prune each
    // partition to <=10 rows BEFORE the single window exchange — the
    // shape that keeps the corpus scan the only full-data stage
    assert(p.contains("PushedFilters"), p.take(1500))
    assert(p.contains("Broadcast"), p.take(1500))
    assert(p.contains("WindowGroupLimit"), p.take(1500))
    assert(p.contains("graft_int8_quantize"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("embed_quantize and stratified_sample are shuffle-free maps (plus final sort)") {
    // both are row-local passes: the ONLY exchange allowed is the
    // presentation sort's range partitioning — a groupBy/join shuffle
    // appearing here means the map op silently grew a wide stage
    Seq("embed_quantize", "stratified_sample").foreach { q =>
      val p = planString(q)
      assert(!p.contains("Join"), s"$q grew a join:\n" + p.take(1500))
      assert(!p.contains("HashAggregate"), s"$q grew an aggregate")
      assert("Exchange".r.findAllIn(p).size <= 1,
        s"$q has more than the presentation-sort exchange:\n" + p.take(1500))
    }
  }

  test("corr_matrix is ONE two-phase aggregation — 15 moments in a single pass") {
    val p = planString("corr_matrix")
    // all 15 moment sums ride one partial+final aggregate pair (the
    // compiled graft_corr_moments buffer → ObjectHashAggregate); a
    // second aggregation pair would mean the moments split into
    // multiple corpus scans
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2,
      "moments split across aggregations:\n" + p.take(1500))
    assert(p.contains("graft_corr_moments"), p.take(1500))
    assert(!p.contains("Join"), p.take(1500))
    // scan pruned to exactly the four measure columns
    Seq("l_orderkey", "l_shipdate", "l_returnflag").foreach { c =>
      assert(!p.contains(c), s"unpruned column $c in corr_matrix scan")
    }
  }

  test("decontaminate pushes both source filters to the scan and broadcasts the benchmark") {
    val p = planString("decontaminate")
    // benchmark gram set is the build side — the corpus side must
    // probe a broadcast, never shuffle into a sort-merge join
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "benchmark join fell back to SMJ")
    // the source predicate reaches the parquet scan on BOTH branches
    assert(p.contains("PushedFilters: [In(source"), p.take(1500))
    assert(p.contains("PushedFilters: [Not(In(source"), p.take(1500))
    // grams travel as 8-byte hashes: the join key is the xxhash64
    // column, and document text must not survive past the Generate
    assert(p.contains("xxhash64"), p.take(1500))
  }

  test("repetition_stats is a shuffle-free map (plus final sort)") {
    val p = planString("repetition_stats")
    assert(!p.contains("Join"), p.take(1500))
    assert(!p.contains("HashAggregate"),
      "the map-side run-length fold grew a corpus aggregate:\n"
        + p.take(1500))
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"more than the presentation-sort exchange:\n" + p.take(1500))
  }

  test("embed_gram is ONE object-hash aggregation pair over the pruned embedding scan") {
    val p = planString("embed_gram")
    // the compiled gram kernel is a TypedImperativeAggregate: one
    // partial+final ObjectHashAggregate pair, no explode-side
    // HashAggregate on 2080 keys, no join
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2,
      "gram moments split across aggregations:\n" + p.take(1500))
    assert(!p.contains("Join"), p.take(1500))
    assert(p.contains("graft_gram_agg"), p.take(1500))
    assert(!p.contains("vec_id"), "unpruned vec_id in embed_gram scan")
  }

  test("top_docs_per_lang is a bounded aggregate — no Window, no per-group sort") {
    val p = planString("top_docs_per_lang")
    // the graft_topk aggregate replaces the window top-k: partial
    // buffers are O(k), so no WindowExec and no corpus-wide sort may
    // appear (the only sort is the presentation orderBy)
    assert(p.contains("graft_topk"), p.take(1500))
    assert("ObjectHashAggregate".r.findAllIn(p).size == 2, p.take(1500))
    assert(!p.contains("Window"), "bounded top-k fell back to a window:\n"
      + p.take(1500))
  }

  test("lineitem_unpivot pushes the order filter and stays join/agg-free") {
    val p = planString("lineitem_unpivot")
    assert(!p.contains("Join"), p.take(1500))
    assert(!p.contains("HashAggregate"), p.take(1500))
    // the slice predicate reaches the scan stage (modulo isn't a
    // parquet-pushable filter, but it must sit directly on the scan,
    // before the 4× generate)
    assert(p.contains("Filter"), p.take(1500))
  }

  test("value_anomalies broadcasts the stats side — no sort-merge, one agg pair") {
    val p = planString("value_anomalies")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "stats join fell back to SMJ")
    // the moment aggregation is one partial+final pair
    assert("HashAggregate".r.findAllIn(p).size == 2, p.take(1500))
  }

  test("dedup_chunks shuffles 8-byte digests, never chunk text") {
    val df = SparkEntry.queries("dedup_chunks")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1500))
    // every exchange must carry digest/count rows only — chunk_text
    // reduces to xxhash64 before the first shuffle
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("chunk_text")),
      "chunk text crossed a shuffle:\n" + exchanges.mkString("\n"))
  }

  test("bigram_novelty: no df rejoin — window df over hashed keys, joins gone") {
    // r14 rewrite: df attaches as a window count over the
    // xxhash64(bigram)-keyed partition instead of re-aggregating a
    // df table and joining it back — there must be NO join of any
    // strategy left, the window must be keyed (never partition-less),
    // and no shuffle may carry the bigram STRING (keys reduce to
    // 8 bytes before the exchange, the dedup_chunks posture).
    val df = SparkEntry.queries("bigram_novelty")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "df rejoin came back:\n" + p.take(2000))
    assert(p.contains("windowspecdefinition(bg"),
      "df window lost its bigram partitioning:\n" + p.take(2000))
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("bgs")),
      "bigram strings crossed a shuffle:\n" + exchanges.mkString("\n"))
  }

  test("the _served PQ rows plan over the stored index, the plain rows inline") {
    // the gate rows exist to put the index-served code path under the
    // oracle — their plans must SCAN the managed gate index (file
    // sources under graft_ann_gate), while the plain rows with the
    // conf unset must not touch any index (self-contained inline
    // training, the Verify posture)
    for (name <- Seq("similarity_topk_pq_served", "similarity_ivf_pq_served")) {
      val p = planString(name)
      assert(p.contains("graft_ann_gate"),
        s"$name does not read the gate index:\n" + p.take(1500))
    }
    for (name <- Seq("similarity_topk_pq", "similarity_ivf_pq")) {
      val p = planString(name)
      assert(!p.contains("graft_ann_gate"),
        s"$name leaked the gate index into the inline path:\n" + p.take(1500))
    }
  }

  test("mixture_sample: thresholds broadcast, the corpus side never shuffles") {
    val df = SparkEntry.queries("mixture_sample")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    // the only exchanges allowed carry the tiny per-source aggregate
    // (or the presentation sort) — document text must never shuffle
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(_.contains("text#")),
      "document text crossed a shuffle:\n" + exchanges.mkString("\n"))
  }

  test("zorder_layout is a row-local map: no exchange except the presentation sort") {
    val p = planString("zorder_layout")
    assert(p.contains("graft_zorder"), p.take(1500))
    // one range exchange for the ORDER BY, nothing else — the key
    // computation itself must never shuffle
    val exchanges = p.linesIterator.filter(l =>
      l.contains("Exchange") && !l.contains("rangepartitioning")).toSeq
    assert(exchanges.isEmpty,
      "zkey computation shuffled:\n" + exchanges.mkString("\n"))
  }

  test("quantile_bins broadcasts the bounds; assignment is map-side") {
    val df = SparkEntry.queries("quantile_bins")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("SortMergeJoin"), "bounds join fell back to SMJ")
  }

  test("bm25_rank: constants ride ONE 1-row broadcast; no corpus explode") {
    val p = planString("bm25_rank")
    // per-term tf is a row-local array scan — an explode of the token
    // stream would be the corpus explode the scaladoc forbids for a
    // 3-term query (the only Generate allowed is the 20-row
    // posexplode of the top-k buffer)
    assert(!p.contains("Generate explode"),
      "corpus explode in bm25:\n" + p.take(2000))
    assert(p.contains("graft_topk"), p.take(1500))
  }

  test("duplicate_passages scans + tokenizes the text exactly once") {
    val p = planString("duplicate_passages")
    // the df count must ride the postings (count-over-window), not a
    // second scan of documents joined back — at 100 TB the second
    // text scan would double the dominant cost
    val scans = p.linesIterator.count(l =>
      l.contains("Scan parquet") || l.contains("FileScan parquet"))
    assert(scans == 1, s"expected 1 documents scan, got $scans:\n" + p.take(2000))
    // and nothing wider than (doc_id, 8-byte key [, count]) shuffles
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(_.contains("text#")),
      "document text crossed a shuffle:\n" + exchanges.mkString("\n"))
  }

  // pagerank_docs' edge build is localCheckpoint-ed (lineage truncated),
  // so its corpus-scan plan is not visible from the final query's
  // executedPlan — the CosineScan machinery pin lives in
  // VectorExprsSpec's join-twin equality tests instead.

  test("dedup_embed runs the cut-form corpus scan; pair rows never materialize") {
    val p = planString("dedup_embed")
    assert(p.contains("graft_cosine_scan"), p.take(2000))
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"expected at most the 1-row corpus crossJoin, got $bnlj")
  }

  test("NO registered query plans an UnboundedFollowing window frame") {
    // Asymptotic lint (r8, the gapfill_linear lesson): Spark's
    // UnboundedFollowingWindowFunctionFrame re-scans from the current
    // row to the partition end for EVERY row — O(n²) per partition —
    // while the running (unboundedPreceding → current) frame is O(n).
    // Correctness gates and row counts can't see the difference; at
    // sf0.1 it was 255.9 s vs 0.7 s on identical data, and at 100 TB
    // it's a hard scale-killer. Any forward-looking carry must ride a
    // running frame over the REVERSED sort (gapfillLinear,
    // asofJoinForward show the recipe) or a bounded lead()/frame.
    // The WHOLE-partition frame (unboundedpreceding →
    // unboundedfollowing, what a partitionBy-only aggregate gets) is
    // fine — Spark's UnboundedWindowFunctionFrame computes it once
    // per partition — so the lint targets exactly the quadratic
    // class: upper bound unboundedfollowing with any lower bound
    // other than unboundedpreceding.
    // \s*+ possessive: without it the whitespace backtracks and the
    // negative lookahead gets bypassed by starting [^,]+ at the space
    val bad = java.util.regex.Pattern.compile(
      "specifiedwindowframe\\((?:Row|Range)Frame,\\s*+(?!unboundedpreceding)" +
        "[^,]+,\\s*+unboundedfollowing",
      java.util.regex.Pattern.CASE_INSENSITIVE)
    // empirical canaries against REAL Spark plans (robust to print-
    // format drift): the lint must catch the quadratic frame the old
    // gapfill_linear planned, and must NOT flag the O(n) whole-
    // partition frame a partitionBy-only aggregate gets
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{col => c, first, count, lit}
    import spark.implicits._
    val tiny = Seq((1, 10), (1, 20), (2, 30)).toDF("k", "v")
    val quad = tiny.withColumn("nv", first(c("v")).over(
      W.partitionBy("k").orderBy("v")
        .rowsBetween(W.currentRow, W.unboundedFollowing)))
      .queryExecution.executedPlan.toString
    assert(bad.matcher(quad).find(),
      "lint lost the quadratic frame pattern:\n" + quad.take(1500))
    val whole = tiny.withColumn("n", count(lit(1)).over(W.partitionBy("k")))
      .queryExecution.executedPlan.toString
    assert(!bad.matcher(whole).find(),
      "lint wrongly flags the whole-partition frame:\n" + whole.take(1500))
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
      val p = planString(n)
      if (bad.matcher(p).find()) Some(n) else None
    }
    assert(offenders.isEmpty,
      s"O(n²) UnboundedFollowing window frame in: $offenders")
  }

  test("basket_pairs takes its top-20 before the part-count decoration joins") {
    // in the plan tree string, parents print before children: the
    // decoration joins (above) must appear BEFORE the
    // TakeOrderedAndProject (below) — the reverse order would shuffle
    // the full pair stream through two joins just to drop it
    val p = planString("basket_pairs")
    val toap = p.indexOf("TakeOrderedAndProject")
    val firstJoin = p.indexOf("Join")
    assert(toap >= 0, "limit must lower to TakeOrderedAndProject")
    assert(firstJoin >= 0 && firstJoin < toap,
      "the decoration joins must sit above the limit")
  }

  test("semdedup: broadcast codebook assignment; within-cell pairs are equi-joined") {
    val p = planString("semdedup")
    assert(p.contains("BroadcastNestedLoopJoin")
      || p.contains("BroadcastExchange"),
      "the Lloyd codebook must broadcast (never shuffle the corpus to it)")
    assert(p.contains("CartesianProduct") == false,
      "within-cell pairs must ride the cent_id equi-join, not a cartesian")
  }

  test("dedup_substring_removal: window postings, no cartesian/nested-loop pair scan") {
    val p = planString("dedup_substring_removal")
    assert(!p.contains("CartesianProduct"),
      "pairs must come from window posting lists")
    // the ONLY nested-loop allowed is none: every join is equi
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "no nested-loop join in the removal plan")
  }

  test("banded substring route: candidate-gated equi-joins, no cartesian, no posting explode") {
    spark.conf.set(graft.operators.LlmTextOps.SubstrSourceConf, "minhash")
    try {
      val p = planString("dedup_substring_removal")
      assert(!p.contains("CartesianProduct"),
        "banded aligner input must ride equi-joins")
      // the exact route's k-squared explode reads posting lists via
      // collect_list of (doc_id, pos) structs; the banded route never
      // aggregates window postings into lists at all
      assert(!p.contains("collect_list(struct(doc_id"),
        "banded route must not build window posting lists")
    } finally spark.conf.unset(graft.operators.LlmTextOps.SubstrSourceConf)
  }

  test("bpe_encode: vocab-sized encode map broadcasts; corpus text never shuffles") {
    val p = planString("bpe_encode")
    assert(p.contains("BroadcastHashJoin"),
      "the word -> n_sub mapping must broadcast onto the counts")
    assert(!p.contains("CartesianProduct"))
  }

  test("quality_nb_cv: no cartesian; the weight join keys on token") {
    val p = planString("quality_nb_cv")
    assert(!p.contains("CartesianProduct"),
      "the only cross joins are 1-row broadcast constants")
  }

  test("risk panel + ljung_box: no cartesian, bounded-side joins broadcast") {
    Seq("sortino_ratio", "omega_ratio").foreach { name =>
      val p = planString(name)
      assert(!p.contains("CartesianProduct"), name)
      assert(!p.contains("SortMergeJoin"), s"$name: unexpected wide join")
    }
    // capm-style market join and ljung_box's per-symbol global-moment
    // join are both |symbols|-bounded → must broadcast
    // materialize first: AQE only proves the cached tick silver's
    // partitioning/ordering at execution, so the UNEXECUTED plan
    // still carries EnsureRequirements' provisional exchange+sort
    val lbDf = SparkEntry.queries("ljung_box")(spark, sf)
    lbDf.collect()
    val lb = lbDf.queryExecution.executedPlan.toString
    assert(lb.contains("BroadcastHashJoin"),
      "global moments must broadcast onto the per-lag rows")
    assert(!lb.contains("CartesianProduct"))
    // the per-symbol sort lives in the SHARED tick silver (printed
    // inside InMemoryRelation, possibly twice under AQE's
    // initial/final framing) — the CONSUMER region above the cache
    // must not re-sort or re-shuffle on symbol; only the output
    // orderBy's range sort may appear there
    val consumer = lb.indexOf("InMemoryRelation") match {
      case -1 => lb // silver off: fall back to the whole plan
      case at => lb.substring(0, at)
    }
    // the window's OWN signature — the (symbol, us, event_id) sort.
    // (Exchange checks can't discriminate here: the per-lag and
    // final aggregations legitimately exchange on symbol keys.)
    assert("Sort \\[symbol#\\d+ ASC NULLS FIRST, us#".r
      .findFirstIn(consumer).isEmpty,
      s"ljung_box re-ran the window sort above the tick silver: " +
        s"${consumer.take(1200)}")
  }

  test("scd2_history: ONE user-keyed exchange serves lag, cumsum, and lead") {
    val p = planString("scd2_history")
    // the island aggregate and the lead() window reuse the user hash
    // partitioning — only the initial per-user exchange may appear
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"scd2_history exchanges = $exchanges:\n" +
      p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("multimodal_phash: payloads never shuffle; signature pairs ride chunk keys") {
    val p = planString("multimodal_phash")
    assert(!p.contains("CartesianProduct"),
      "pair generation must be chunk-blocked, not brute-force")
    // the exchange carries (ch, ck, doc_id, sig) — never hx/text
    val exch = p.linesIterator.filter(_.contains("Exchange")).mkString
    assert(!exch.contains("hx") && !exch.contains("text"),
      s"payload columns crossed an exchange: $exch")
  }

  test("clustering_ari / ann_recall_trunc: broadcast codebook and probes, no wide join") {
    Seq("clustering_ari", "ann_recall_trunc").foreach { name =>
      val p = planString(name)
      assert(p.contains("BroadcastNestedLoopJoin")
        || p.contains("BroadcastHashJoin"), s"$name: probe side must broadcast")
      assert(!p.contains("CartesianProduct"), name)
    }
  }

  test("dynamic partition pruning: dim filter prunes the date-partitioned fact at runtime") {
    import org.apache.spark.sql.functions.{col => c}
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dpp").toString
    try {
      graft.pipeline.CorpusSilver.writeEventsByDate(spark,
        TestSpark.sf0001, s"$dir/events_by_date")
      graft.pipeline.CorpusSilver.writeDateDim(spark,
        TestSpark.sf0001, s"$dir/date_dim")
      val nDates = spark.read.parquet(s"$dir/date_dim").count()
      val matching = spark.read.parquet(s"$dir/date_dim")
        .where(c("dow") === 2).count()
      assert(matching > 0 && matching < nDates,
        s"fixture must make pruning observable: $matching/$nDates")
      def partitionsRead(dppEnabled: Boolean): (Long, Long, String) = {
        spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.enabled",
          dppEnabled.toString)
        try {
          val q = graft.pipeline.CorpusSilver.eventsOnDow(spark,
            s"$dir/events_by_date", s"$dir/date_dim", 2)
          // collect() (not count()) so the metrics land on THIS plan
          val n = q.collect().length.toLong
          // recurse through AQE stage boundaries to the leaf scans
          import org.apache.spark.sql.execution.adaptive.{
            AdaptiveSparkPlanExec, QueryStageExec}
          def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
            case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
            case qs: QueryStageExec => scans(qs.plan)
            case f: FileSourceScanExec => Seq(f)
            case other => other.children.flatMap(scans) ++
              other.subqueries.flatMap(scans)
          }
          val scan = scans(q.queryExecution.executedPlan)
            .find(_.relation.location.rootPaths.exists(
              _.toString.contains("events_by_date")))
            .getOrElse(fail("no fact FileSourceScanExec found"))
          (scan.metrics("numPartitions").value, n,
            q.queryExecution.executedPlan.toString)
        } finally spark.conf.unset(
          "spark.sql.optimizer.dynamicPartitionPruning.enabled")
      }
      val (prunedParts, nOn, planOn) = partitionsRead(dppEnabled = true)
      val (allParts, nOff, _) = partitionsRead(dppEnabled = false)
      assert(planOn.contains("dynamicpruning"),
        "fact scan must carry the runtime pruning subquery")
      assert(nOn == nOff, "DPP must not change the result")
      assert(allParts == nDates,
        s"without DPP the scan reads every date dir: $allParts/$nDates")
      assert(prunedParts == matching,
        s"with DPP the scan reads exactly the dim-surviving dates: " +
          s"$prunedParts vs $matching")
      info(s"DPP partitions read: $prunedParts of $allParts")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }

  test("the IVF assignment scan stays fenced below an exchange under Generate") {
    // the Generate re-evaluation hazard (BASELINE round-12): a
    // compiled scan folded into a Generate's projection re-evaluates
    // once per GENERATED row — measured 64× (170 s vs 15.6 s) in the
    // Lloyd trainer, ~nprobe× in this build. The fix is a repartition
    // materialization fence between the scan and the explode; this
    // pin fails if the fence is ever removed: every plan line chain
    // from a Generate down to the n×k assignment scan
    // (graft_cosine_scan, NOT the per-list _scored scans that
    // legitimately live inside explode) must cross an exchange.
    // Executed plan after collect — AQE finalizes stages at runtime.
    // The check walks the plan TREE (not line indices): only a scan
    // that is an actual DESCENDANT of a Generate with no exchange /
    // query-stage / cache boundary on the path is the hazard — a
    // sibling Generate subtree printed above an unrelated scan is
    // benign and must not trip the pin.
    val df = graft.operators.LlmVectorOps
      .knnEdges3Ivf(spark, TestSpark.sf001, 8, "seed")
    df.collect()
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    def hasAssignScan(p: SparkPlan): Boolean =
      p.expressions.exists(_.toString.contains("graft_cosine_scan("))
    val root = df.queryExecution.executedPlan
    val all = TestSpark.planNodes(root)
    assert(all.exists(hasAssignScan), "expected the assignment scan")
    assert(all.exists(_.isInstanceOf[GenerateExec]),
      "expected Generate nodes in the plan")
    def walk(p: SparkPlan, underGen: Boolean): Unit = {
      val fence = p.isInstanceOf[Exchange] ||
        p.isInstanceOf[QueryStageExec] ||
        p.isInstanceOf[InMemoryTableScanExec]
      val ug = underGen && !fence
      // a Generate's OWN generator may hold a scan legitimately
      // (explode(scan(...)) evaluates per INPUT row); the hazard is a
      // scan in a STRICT descendant below a Generate with no fence —
      // that one re-evaluates per generated row
      assert(!(ug && hasAssignScan(p)),
        s"assignment scan under Generate with no exchange fence at:\n$p")
      val childUg = ug || p.isInstanceOf[GenerateExec]
      TestSpark.planKids(p).foreach(walk(_, childUg))
    }
    walk(root, underGen = false)
  }

  test("no registered query plans a partition-less window over corpus-sized input") {
    // the degree_gini lesson (round 12 verdict): an unpartitioned
    // WindowExec sorts its whole input in ONE task — fine over an
    // alphabet/offsets frame (corpus_shuffle's 64 ranges, the degree
    // alphabet), the one shape that cannot scale over corpus rows.
    // Static lint over every registered query's physical plan: a
    // global window whose subtree reaches a table scan WITHOUT
    // passing a row-bounding node (aggregate / limit / top-k) is a
    // single-task sort over corpus-sized input. Runs on sparkPlan
    // (pre-AQE physical plan) — no execution needed, so the sweep
    // covers all queries cheaply.
    import org.apache.spark.sql.execution.{CollectLimitExec,
      FileSourceScanExec, GlobalLimitExec, LocalLimitExec, RDDScanExec,
      SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec,
      ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def bounding(p: SparkPlan): Boolean = p match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec
         | _: SortAggregateExec | _: GlobalLimitExec | _: LocalLimitExec
         | _: CollectLimitExec | _: TakeOrderedAndProjectExec => true
      case _ => false
    }
    def corpusScan(p: SparkPlan): Boolean = p match {
      case _: FileSourceScanExec | _: InMemoryTableScanExec
         | _: RDDScanExec => true
      case _ => false
    }
    def reachesScanUnbounded(p: SparkPlan): Boolean =
      !bounding(p) && (corpusScan(p) ||
        TestSpark.planKids(p).exists(reachesScanUnbounded))
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, TestSpark.sf0001).queryExecution.sparkPlan
          catch { case e: Throwable =>
            fail(s"$name failed to plan at sf0.001: $e")
          }
        TestSpark.planNodes(plan).collect {
          case w: WindowExec
              if w.partitionSpec.isEmpty && reachesScanUnbounded(w.child) =>
            name
        }.distinct
    }
    assert(offenders.isEmpty,
      s"partition-less window over corpus-sized input in: " +
        offenders.distinct.sorted.mkString(", "))
  }
}
