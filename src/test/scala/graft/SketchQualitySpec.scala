package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnalyticOps, FunctionOps}

/** Accuracy floors for the two sketch aggregates that have no oracle
  * (approximate by design) and, until now, no quality gate either —
  * the AnnQualitySpec posture applied to HLL and t-digest: measure
  * the sketch against its exact twin and fail on degradation, so a
  * parameter change (rsd, accuracy) that trashes the estimates can't
  * ship silently.
  */
class SketchQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  test("distinct_users_approx HLL estimate within 5% of exact per group") {
    // rsd = 0.01 targets ~1% relative standard deviation; 5% is the
    // hard floor with generous margin for sketch-seed drift
    val exact = FunctionOps.distinctUsers(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = FunctionOps.distinctUsersApprox(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, n) =>
      val est = approx(g)
      val relErr = math.abs(est - n).toDouble / n
      assert(relErr <= 0.05,
        f"HLL off by ${relErr * 100}%.2f%% on group $g (exact=$n est=$est)")
    }
  }

  test("distinct_users_kmv estimate within 25% of exact, exact below k") {
    import org.apache.spark.sql.functions.col
    val exact = graft.operators.FunctionOps
      .distinctUsers(spark, TestSpark.sf001)
      .select("event_type", "n_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kmv = graft.operators.FunctionOps
      .distinctUsersKmv(spark, TestSpark.sf001)
      .select("event_type", "n_users_kmv").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kmv.keySet == exact.keySet)
    val k = 64
    kmv.foreach { case (g, est) =>
      val ex = exact(g)
      if (ex < k) assert(est == ex,
        s"$g: below-k group must report the exact count ($est vs $ex)")
      else assert(math.abs(est - ex) <= 0.25 * ex,
        s"$g: KMV estimate $est vs exact $ex exceeds 25% (k=$k)")
    }
    // the estimator branch must actually run at this sf — otherwise
    // the oracle only ever checks the degenerate path
    assert(exact.values.exists(_ >= k),
      "no group reaches k distinct users; raise sf or lower k")
  }

  test("value_percentiles_sampled rank error within 8% of target quantile") {
    // a deterministic 20% sample of ~2000-row groups gives m ≈ 400:
    // rank se ≈ √(0.5·0.5/400) ≈ 2.5% at the median — gate at ~3×
    val values = graft.engine.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    val sampled = AnalyticOps.valuePercentilesSampled(spark, sf)
      .collect().map(r => r.getString(0) ->
        Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2),
          0.99 -> r.getDouble(3))).toMap
    assert(sampled.keySet == values.keySet)
    sampled.foreach { case (g, ests) =>
      val vs = values(g)
      ests.foreach { case (q, est) =>
        val rank = vs.count(_ <= est).toDouble / vs.length
        assert(math.abs(rank - q) <= 0.08,
          f"$g p$q: sampled estimate $est sits at exact rank $rank%.3f")
      }
    }
  }

  test("value_percentiles_approx rank error within 1% of target quantile") {
    // approx_percentile(accuracy=1000) guarantees rank error <= 1/1000;
    // gate at 10x that so only a real sketch regression trips it.
    // Rank of the estimate = fraction of the group's values <= it,
    // computed exactly against the raw events
    val values = graft.engine.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    val approx = AnalyticOps.valuePercentilesApprox(spark, sf)
      .collect().map(r => r.getString(0) ->
        Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2),
          0.99 -> r.getDouble(3))).toMap
    assert(approx.keySet == values.keySet)
    approx.foreach { case (g, qs) =>
      val sorted = values(g)
      qs.foreach { case (q, est) =>
        // the estimate's achievable rank is the whole BRACKET
        // [count(< est), count(<= est)] / n: with ties at the
        // returned value, every rank in the bracket corresponds to
        // the same (correct) answer, so the gate passes iff the
        // bracket touches [q - ε, q + ε] — tie-proof by construction
        def countWhere(pred: Double => Boolean): Int = {
          var lo = 0; var hi = sorted.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (pred(sorted(mid))) lo = mid + 1 else hi = mid
          }
          lo
        }
        val rankLo = countWhere(_ < est).toDouble / sorted.length
        val rankHi = countWhere(_ <= est).toDouble / sorted.length
        assert(rankLo - 0.01 <= q && q <= rankHi + 0.01,
          f"approx p$q on $g outside rank bracket [$rankLo%.4f, $rankHi%.4f] (est=$est)")
      }
    }
  }

  test("dedup_incremental_bloom equals dedup_incremental exactly") {
    val exact = graft.operators.LlmTextOps.dedupIncremental(spark, sf)
      .collect().toSeq
    val bloom = graft.operators.LlmTextOps.dedupIncrementalBloom(spark, sf)
      .collect().toSeq
    assert(bloom == exact)
  }

  test("bloom incremental dedup passes the whole batch through an empty ledger") {
    // an empty ledger aggregates to a NULL bloom; the operator must
    // return every batch row (dedup_incremental semantics), not drop
    // them all through a null probe
    val docs = graft.engine.Tables.documents(spark, TestSpark.sf0001)
      .where(org.apache.spark.sql.functions.col("doc_id") >= 250)
    val out = graft.operators.LlmTextOps
      .dedupIncrementalBloomFrom(spark, docs)
    assert(out.count() == docs.count())
  }

  test("bloom prefilter prunes the anti-join probe to dups + a small FP tail") {
    import org.apache.spark.sql.functions._
    val docs = graft.engine.Tables.documents(spark, sf)
      .withColumn("digest", xxhash64(col("text")))
    val ledger = docs.where(col("doc_id") < 250).select("digest")
    val bloomBytes = ledger
      .agg(graft.functions.BloomFns.bloomAgg(spark, col("digest"),
        lit(1000000L), lit(8000000L)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val batch = docs.where(col("doc_id") >= 250)
    val nBatch = batch.count()
    val nMaybe = batch.where(graft.functions.BloomFns.mightContain(spark,
      lit(bloomBytes), col("digest"))).count()
    val nTrueDups = batch.join(ledger, Seq("digest"), "left_semi").count()
    // no false negatives: every true dup passes the filter
    assert(nMaybe >= nTrueDups)
    // the 1 MiB sketch over a small ledger should be near-exact: allow
    // a 1% FP tail before calling the prefilter broken
    assert(nMaybe <= nTrueDups + math.ceil(nBatch * 0.01).toLong,
      s"bloom passes $nMaybe of $nBatch batch rows but only $nTrueDups are dups")
  }

  test("MG summary is exact below capacity, regardless of partitioning") {
    import org.apache.spark.sql.functions._
    val ev = graft.engine.Tables.events(spark, sf)
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // capacity ≥ distinct users ⇒ zero evictions ⇒ the FULL summary
    // equals the exact count map, under any partitioning
    for (parts <- Seq(1, 7, 32)) {
      val got = ev.repartition(parts)
        .agg(graft.functions.MisraGriesAgg.mg(spark, col("user_id"), 256)
          .as("mg"))
        .selectExpr("explode(mg) AS e").select("e.key", "e.cnt")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exact, s"parts=$parts: MG below capacity must be exact")
    }
  }

  test("heavy_hitters_mg regime guard: capacity clears sf0.1 cardinality") {
    import org.apache.spark.sql.functions._
    // the gated row's exact-count oracle is valid ONLY while no
    // eviction fires; this pins the assumption against the LARGEST
    // shipped corpus so a regenerated testdata drop fails loudly
    // (user cardinality grows with sf: 15/150/1500)
    val distinct01 = graft.engine.Tables.events(spark, "/root/testdata/sf0.1")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    assert(distinct01 * 2 <= AnalyticOps.HhMgCapacity,
      s"per-group cardinality $distinct01 too close to MG capacity " +
        s"${AnalyticOps.HhMgCapacity} — raise it or the gate breaks")
  }

  test("MG eviction regime honors the n/(capacity+1) guarantees on a skewed stream") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // heavy key 0 at 500 rows, 200 tail keys at 2 rows each: n = 900
    val rows = Seq.fill(500)(0L) ++ (1L to 200L).flatMap(k => Seq(k, k))
    val df = spark.sparkContext.parallelize(rows, 13).toDF("user_id")
    val cap = 8
    val got = df.agg(graft.functions.MisraGriesAgg.mg(spark,
        col("user_id"), cap).as("mg"))
      .selectExpr("explode(mg) AS e").select("e.key", "e.cnt")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = rows.length
    val maxUndercount = n / (cap + 1) // 100
    // any key with true frequency > n/(cap+1) must survive: key 0
    // (500 > 100) — and its reported count undercounts by ≤ n/(cap+1)
    assert(got.contains(0L), s"heavy hitter evicted: $got")
    assert(got(0L) >= 500L - maxUndercount && got(0L) <= 500L,
      s"count ${got(0L)} outside [${500L - maxUndercount}, 500]")
    // bounded summary: never more than capacity counters
    assert(got.size <= cap)
    // no tail key may report above its true frequency
    got.foreach { case (k, c) =>
      val truth = if (k == 0L) 500L else 2L
      assert(c <= truth, s"key $k over-reports $c > $truth")
    }
  }
}
