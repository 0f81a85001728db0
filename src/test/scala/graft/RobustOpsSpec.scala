package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnalyticOps, LlmTextOps, LlmVectorOps}

/** Round-7 additions: winsorized moments, cross-doc passage
  * duplication, and IVF-blocked embedding dedup — each new scalable
  * formulation pinned to a naive twin, plus the semantic edges the
  * oracle can't see (intra-doc passages, blocking recall).
  */
class RobustOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("winsorized_stats == the naive clamp-then-aggregate twin") {
    val s = spark
    val got = AnalyticOps.winsorizedStats(s, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    // naive: materialize the clamped column and aggregate doubles
    // directly — same bounds arithmetic (r6'd exact percentiles), so
    // count fields must be EXACT and the float fields agree to well
    // under the 6-dp grid (decimal-vs-double ordering noise only)
    val ev = graft.engine.Tables.events(s, TestSpark.sf0001)
    val bounds = ev.groupBy(col("event_type")).agg(
      graft.engine.Determinism.r6(expr("percentile(value, 0.05)")).as("p05"),
      graft.engine.Determinism.r6(expr("percentile(value, 0.95)")).as("p95"))
    val want = ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn("w", least(greatest(col("value"), col("p05")), col("p95")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("p05"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("value") > col("p95"), 1L).otherwise(0L)).as("n_high"),
        max(col("p05")).as("p05"), max(col("p95")).as("p95"),
        avg(col("w")).as("mean_w"),
        stddev_samp(col("w")).as("sd_w"))
      .orderBy("event_type")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4,
        s"count fields: $g vs $w")
      assert(g._5 == w._5 && g._6 == w._6, s"bounds: $g vs $w")
      assert(math.abs(g._7 - w._7) < 1e-6, s"mean_w: $g vs $w")
      assert(math.abs(g._8 - w._8) < 1e-6, s"sd_w: $g vs $w")
    }
    // winsorization properties: ~5% in each tail, robust sd ≤ raw sd,
    // mean inside the clamp interval
    val rawSd = ev.groupBy(col("event_type"))
      .agg(stddev_samp(col("value")).as("sd")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { case (et, n, nLow, nHigh, p05, p95, meanW, sdW) =>
      assert(nLow <= n * 0.06 && nHigh <= n * 0.06, s"$et tails too fat")
      assert(nLow >= n * 0.03 && nHigh >= n * 0.03, s"$et tails too thin")
      assert(sdW < rawSd(et), s"$et winsorized sd must shrink")
      assert(meanW >= p05 && meanW <= p95, s"$et mean outside clamp")
    }
  }

  test("duplicate_passages == the string-shingle twin (hash fold is faithful)") {
    val s = spark
    val got = LlmTextOps.duplicatePassages(s, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // naive twin over raw 8-token STRING windows — verifies the
    // polynomial fold introduced no collisions on this corpus and
    // the window/count bookkeeping is right
    val shp = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 8)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(toks) - 8),
             i -> array_join(slice(toks, i + 1, 8), ' '))""")).as("sh"))
    val perDoc = shp.groupBy("doc_id", "sh").agg(count(lit(1)).as("n_pos"))
    val dfTab = perDoc.groupBy("sh").agg(count(lit(1)).as("n_docs"))
    val want = perDoc.join(dfTab, Seq("sh"))
      .groupBy("doc_id")
      .agg(sum(col("n_pos")).as("n_windows"),
        sum(when(col("n_docs") >= 2, col("n_pos")).otherwise(0L))
          .as("n_shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == want.toSet)
    assert(got.exists(_._3 > 0), "corpus has near-dups; some doc must share")
    assert(got.exists(_._3 == 0), "some doc must be fully novel")
  }

  test("duplicate_passages counts CROSS-doc sharing only, >=8-token docs only") {
    val s = spark
    val tmp = java.nio.file.Files
      .createTempDirectory("passages").toString
    try {
      import s.implicits._
      val eight = "alpha beta gamma delta epsilon zeta eta theta"
      Seq(
        // A and B share the same single 8-token window
        (1L, eight, "en", "web", 47L),
        (2L, eight + " tail", "en", "web", 52L),
        // C repeats its own window twice but shares with nobody:
        // intra-doc repetition must contribute ZERO to n_shared
        (3L, "one two three four five six seven eight nine " +
          "one two three four five six seven eight nine", "en", "web", 89L),
        // D is under 8 tokens: excluded entirely
        (4L, "too short for any window", "en", "web", 24L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$tmp/documents.parquet")
      val got = LlmTextOps.duplicatePassages(s, tmp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // A: 1 window, shared; B: 2 windows, the first shared with A;
      // C: 11 windows, all values repeat intra-doc only => 0 shared
      assert(got.map(t => (t._1, t._2, t._3)) ==
        Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 11L, 0L)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("dedup_embed_ann emits a subset of the exact pairs, same scores, recall floor") {
    val s = spark
    val ann = LlmVectorOps.dedupEmbedAnn(s, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = LlmVectorOps.dedupEmbed(s, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exactMap = exact.map(t => (t._1, t._2) -> t._3).toMap
    // same cosine, same cut => every ANN pair is an exact pair with
    // the identical r6 score (blocking can only LOSE pairs)
    ann.foreach { case (i, j, c) =>
      assert(exactMap.get((i, j)).contains(c), s"pair ($i,$j,$c) not exact")
    }
    // data-adaptive blocking must find a usable share of the true
    // pairs on this clustered corpus (AnnQualitySpec posture: a
    // measured floor, not a tautology). Measured 23/66 at sf0.001.
    val recall = ann.length.toDouble / exact.length
    assert(recall >= 0.25, s"IVF-blocked pair recall $recall below floor")
    assert(ann.nonEmpty)
  }

  test("anomaly_mad == local median/MAD recomputation; robust to contamination") {
    val s = spark
    import s.implicits._
    val got = AnalyticOps.anomalyMad(s, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3)))
    // local recomputation of the full flag set from raw values — the
    // operator's two-pass broadcast shape must reproduce the direct
    // per-group definition exactly (same r6 grid on med and MAD)
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def medianOf(xs: Seq[Double]): Double = {
      val v = xs.sorted
      val h = (v.length - 1) * 0.5
      val lo = v(h.toInt)
      val hi = v(math.ceil(h).toInt)
      lo + (hi - lo) * (h - h.toInt)
    }
    val raw = graft.engine.Tables.events(s, TestSpark.sf0001)
      .select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val want = raw.groupBy(_._2).toSeq.flatMap { case (et, rows) =>
      val med = r6d(medianOf(rows.map(_._3).toSeq))
      val mad = r6d(medianOf(rows.map(t => math.abs(t._3 - med)).toSeq))
      if (mad <= 0.0) Seq.empty
      else rows.filter(t => math.abs((t._3 - med) / (1.4826 * mad)) > 3.5)
        .map(t => (t._1, et, t._3, r6d((t._3 - med) / (1.4826 * mad))))
    }.sortBy(_._1)
    assert(got.toSeq == want, s"${got.length} vs ${want.length} flagged")
    assert(got.nonEmpty)
    // robustness: med/MAD of a contaminated group (1% of rows pushed
    // to 100×) must keep flagging the ORIGINAL outliers — the property
    // that breaks for mean/σ (value_anomalies), where the contamination
    // inflates σ and hides them
    val vals = raw.filter(_._2 == raw.head._2).map(_._3).toSeq
    val med0 = r6d(medianOf(vals))
    val mad0 = r6d(medianOf(vals.map(v => math.abs(v - med0))))
    val contaminated = vals ++ Seq.fill(vals.length / 100)(vals.max * 100)
    val med1 = r6d(medianOf(contaminated))
    val mad1 = r6d(medianOf(contaminated.map(v => math.abs(v - med1))))
    assert(math.abs(med1 - med0) / med0 < 0.05, "median moved under 1% contamination")
    assert(math.abs(mad1 - mad0) / mad0 < 0.10, "MAD moved under 1% contamination")
  }

  test("bm25_rank == local BM25 recomputation; ranking properties hold") {
    val s = spark
    val got = LlmTextOps.bm25Rank(s, TestSpark.sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // local recomputation from raw text — same constants, same grid
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val qTerms = Seq("spark", "merge", "window")
    val k1 = 1.2; val b = 0.75
    val docs = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val nDocs = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / nDocs
    val dfT = qTerms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val idfT = qTerms.map { t =>
      t -> r6d(math.log((nDocs - dfT(t) + 0.5) / (dfT(t) + 0.5) + 1.0))
    }.toMap
    val want = docs.map { case (id, toks) =>
      val dl = toks.length.toDouble
      val score = qTerms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf > 0)
          idfT(t) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
        else 0.0
      }.reduceLeft(_ + _)
      (id, score)
    }.filter(_._2 > 0.0)
      .sortBy { case (id, sc) => (-sc, id) }
      .take(20).zipWithIndex
      .map { case ((id, sc), i) => (i + 1, id, r6d(sc)) }
    assert(got.toSeq == want.toSeq)
    assert(got.length == 20)
    // scores non-increasing with rank
    got.sliding(2).foreach { case Array(a, c) => assert(a._3 >= c._3) }
  }

  test("gapfill_resample forward-fills the latest tick at or before each minute") {
    val s = spark
    val got = AnalyticOps.gapfillResample(s, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        r.getDouble(2), r.getTimestamp(3)))
    assert(got.nonEmpty)
    val ticks = graft.engine.Tables.events(s, TestSpark.sf0001)
      .select("event_type", "ts", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      .groupBy(_._1)
    got.groupBy(_._1).foreach { case (sym, rows) =>
      val symTicks = ticks(sym).sortBy(_._2.getTime)
      rows.foreach { case (_, m, price, lts) =>
        // the filled value is the price of the newest tick ≤ m
        val expect = symTicks.takeWhile(_._2.getTime <= m.getTime).last
        assert(price == expect._3 && lts == expect._2,
          s"$sym @ $m: got ($price,$lts), want (${expect._3},${expect._2})")
        assert(lts.getTime <= m.getTime)
      }
      // grid is a dense minute sequence from the first tick's minute
      val minutes = rows.map(_._2.getTime).sorted
      minutes.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1) - w(0) == 60000L, s"$sym grid gap ${w(1) - w(0)}")
      }
      assert(minutes.length >= symTicks.length / 2,
        s"$sym grid suspiciously small")
    }
  }

  test("gapfill_linear reversed-sort running frame == naive unboundedFollowing frame") {
    // r8 re-plan: the forward bracket (next tick strictly after the
    // slot) moved from first(...) over an unboundedFollowing frame
    // (O(n²) per partition — 255.9 s at sf0.1) to last(...) over a
    // running frame on the REVERSED sort (O(n)). This pin proves the
    // two formulations are bit-identical, including the tie rule
    // (a tick exactly ON a slot is prev with ratio 0, never next).
    //
    // The comparison runs over a TIME-BOUNDED copy of the sf0.001
    // ticks (first 2 days), written to a temp corpus both sides read:
    // the naive unboundedFollowing frame is O(n²) in the per-symbol
    // minute-grid length, and sf0.001's full multi-month span made
    // this one pin 677 s of an ~32 min suite. Two days keeps real
    // data, real gaps, AND the tie rule exercised — one tick per
    // symbol is injected exactly ON a minute slot (the case the tie
    // ordering exists for), which the raw µs feed never lands on.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val s = spark
    import graft.engine.Determinism.r6
    val full = graft.engine.Tables.events(s, TestSpark.sf0001)
    val cutoff = full.agg(min(col("ts"))).head().getTimestamp(0)
      .toInstant.plusSeconds(2L * 86400)
    val bounded = full.where(col("ts") <=
      lit(java.sql.Timestamp.from(cutoff)))
    // one synthetic tick per symbol exactly on a minute boundary,
    // 10 min after that symbol's first (bounded) tick
    val onSlot = bounded.groupBy(col("event_type"))
      .agg(min(col("ts")).as("t0"), max(col("user_id")).as("uid"))
      .select((lit(900000000L)
          + row_number().over(Window.orderBy("event_type")).cast("long"))
          .as("event_id"),
        (date_trunc("minute", col("t0")) + expr("interval 10 minutes"))
          .as("ts"),
        col("uid").as("user_id"), col("event_type"),
        lit(42.42).as("value"), lit("{\"k\": 7}").as("props"))
    val d = java.nio.file.Files
      .createTempDirectory("gapfill_pin").toString
    bounded.unionByName(onSlot
        .select("event_id", "ts", "user_id", "event_type", "value",
          "props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val ev = graft.engine.Tables.events(s, d)
      .select(col("event_type").as("symbol"), col("ts"),
        unix_micros(col("ts")).as("us"),
        floor(col("value").cast("double") * lit(100.0) + lit(0.5))
          .cast("long").as("c"), col("event_id"))
    val grid = ev.groupBy(col("symbol"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      .select(col("symbol"), explode(expr(
        """sequence(date_trunc('minute', t0), date_trunc('minute', t1),
             interval 1 minute)""")).as("ord"))
      .withColumn("us", lit(null).cast("long"))
      .withColumn("c", lit(null).cast("long"))
      .withColumn("event_id", lit(null).cast("long"))
      .withColumn("is_grid", lit(1))
    val ticks = ev
      .select(col("symbol"), col("ts").as("ord"), col("us"), col("c"),
        col("event_id"), lit(0).as("is_grid"))
    val ord = Seq(col("ord"), col("is_grid"), col("event_id"))
    val wPrev = Window.partitionBy("symbol").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("symbol").orderBy(ord: _*)
      .rowsBetween(0, Window.unboundedFollowing)
    val naive = ticks.unionByName(grid.select(col("symbol"), col("ord"),
        col("us"), col("c"), col("event_id"), col("is_grid")))
      .withColumn("pc", last(col("c"), ignoreNulls = true).over(wPrev))
      .withColumn("pus", last(col("us"), ignoreNulls = true).over(wPrev))
      .withColumn("nc", first(col("c"), ignoreNulls = true).over(wNext))
      .withColumn("nus", first(col("us"), ignoreNulls = true).over(wNext))
      .where(col("is_grid") === 1 && col("pc").isNotNull &&
        col("nc").isNotNull)
      .select(col("symbol"), col("ord").as("m"),
        r6((col("pc").cast("double")
          + (col("nc") - col("pc")).cast("double")
            * (unix_micros(col("ord")) - col("pus")).cast("double")
            / nullif((col("nus") - col("pus")).cast("double"), lit(0.0)))
          / lit(100.0)).as("price"))
      .orderBy("symbol", "m")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    val fast = AnalyticOps.gapfillLinear(s, d)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    assert(fast.nonEmpty && fast.toSeq == naive.toSeq)
  }

  test("diversity_sample == local assignment + hash-rank recomputation") {
    val s = spark
    val got = LlmVectorOps.diversitySample(s, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    // local twin: keep-1 nearest seed centroid (cosine, cent_id
    // tie-break), then the 8 smallest (h, vec_id) per cell
    val embs = graft.engine.Tables.embeddings(s, TestSpark.sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def norm(v: Array[Float]): Double =
      math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    val cents = embs.filter(_._1 % 100 == 0)
    val assigned = embs.map { case (id, v) =>
      val nv = norm(v)
      val best = cents.map { case (cid, cv) =>
        val dot = v.zip(cv).map { case (a, c) => a.toDouble * c.toDouble }.sum
        (cid, dot / (nv * norm(cv)))
      }.maxBy { case (cid, sim) => (sim, -cid) }
      (id, best._1)
    }
    val want = assigned.groupBy(_._2).toSeq.flatMap { case (cell, members) =>
      members.map { case (id, _) => (id, (id % 1000000007L) * 374761393L % 1000000007L) }
        .sortBy { case (id, h) => (h, id) }
        .take(8).zipWithIndex
        .map { case ((id, h), i) => (cell, i + 1, id, h) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
    // balance property: no cell contributes more than 8
    got.groupBy(_._1).values.foreach(g => assert(g.length <= 8))
  }

  test("entropy_stats == local plug-in entropy; degenerate docs at zero") {
    val s = spark
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def lgQ(x: Double): Double =
      math.floor(math.log(x) / math.log(2.0) * 1e6 + 0.5)
    val got = LlmTextOps.entropyStats(s, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val want = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1).toSeq
        val counts = toks.groupBy(identity).map(_._2.size.toLong)
        val dl = toks.length.toLong
        val q = counts.map(c => c * lgQ(c.toDouble).toLong).sum
        (r.getLong(0), dl, counts.size.toLong,
          r6d(lgQ(dl.toDouble) / 1e6 - (q.toDouble / 1e6) / dl))
      }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // plug-in entropy bounds: 0 ≤ H ≤ log2(dl)
    got.foreach { case (id, dl, _, h) =>
      assert(h >= -1e-6 && h <= math.log(dl.toDouble) / math.log(2.0) + 1e-6,
        s"doc $id entropy $h out of range")
    }
    // a single-token-repeated doc must score exactly 0
    val tmp = java.nio.file.Files.createTempDirectory("entropy").toString
    try {
      import s.implicits._
      Seq((1L, "a a a a a a", "en", "web", 11L),
        (2L, "b c d e f g", "en", "web", 11L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$tmp/documents.parquet")
      val e = LlmTextOps.entropyStats(s, tmp).collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(e(1L) == 0.0, s"constant doc: ${e(1L)}")
      assert(math.abs(e(2L) - math.log(6.0) / math.log(2.0)) < 1e-5,
        s"uniform doc: ${e(2L)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("cooccurrence_pmi == local PMI recomputation over occurrence counts") {
    val s = spark
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val got = LlmTextOps.cooccurrencePmi(s, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val docs = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .select("text").collect().map(_.getString(0).split(" ", -1).toSeq)
    val unis = docs.flatten
    val cx = unis.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTok = unis.size.toLong
    val prs = docs.filter(_.length >= 2).flatMap(t => t.zip(t.tail))
    val cxy = prs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nPairs = prs.size.toLong
    val want = cxy.toSeq.filter(_._2 >= 5).map { case ((w1, w2), c) =>
      val ratio = c.toDouble * nTok.toDouble * nTok.toDouble /
        nPairs.toDouble / (cx(w1) * cx(w2)).toDouble
      (w1, w2, c, ratio)
    }.sortBy { case (w1, w2, _, ratio) => (-ratio, w1, w2) }
      .take(20)
      .map { case (w1, w2, c, ratio) =>
        (w1, w2, c, r6d(math.log(ratio) / math.log(2.0))) }
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
    assert(got.length == 20)
  }

  test("quantile_bins matches ntile-style depth balance and bound semantics") {
    val s = spark
    val got = AnalyticOps.quantileBins(s, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getInt(3)))
    assert(got.nonEmpty)
    // every decile in [1, 10]; within each type the bins are
    // monotone in value and near-balanced (equi-depth ±1 on ties)
    got.groupBy(_._2).foreach { case (et, rows) =>
      assert(rows.forall(r => r._4 >= 1 && r._4 <= 10))
      val sorted = rows.sortBy(_._3)
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(0)._4 <= w(1)._4, s"$et: bins not monotone in value")
      }
      val byBin = rows.groupBy(_._4).view.mapValues(_.size)
      val n = rows.size.toDouble
      byBin.foreach { case (b, cnt) =>
        assert(cnt <= n * 0.2, s"$et bin $b holds $cnt of $n — not equi-depth")
      }
      assert(byBin.size >= 9, s"$et uses only ${byBin.size} bins")
    }
  }

  test("join_bloom_pruned == plain join; the prefilter actually prunes") {
    val s = spark
    import org.apache.spark.sql.functions.col
    val got = graft.operators.RelationalOps
      .joinBloomPruned(s, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val cust = graft.engine.Tables.customer(s, TestSpark.sf0001)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val want = graft.engine.Tables.orders(s, TestSpark.sf0001)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        col("o_totalprice"))
      .orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
    // the sketch must do real work: the pruned big side is a strict
    // subset (non-matching segments exist), within a 1% FP tail of
    // the true match count
    val orders = graft.engine.Tables.orders(s, TestSpark.sf0001)
    val bloom = cust.agg(graft.functions.BloomFns.bloomAgg(s,
        col("c_custkey"), org.apache.spark.sql.functions.lit(100000L),
        org.apache.spark.sql.functions.lit(800000L)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val nAll = orders.count()
    val nPruned = orders.where(graft.functions.BloomFns.mightContain(s,
      org.apache.spark.sql.functions.lit(bloom), col("o_custkey"))).count()
    val nTrue = want.length.toLong
    assert(nPruned >= nTrue, "Bloom dropped a true match")
    assert(nPruned <= nTrue + math.ceil(nAll * 0.01).toLong,
      s"prefilter too weak: $nPruned of $nAll pass for $nTrue matches")
    assert(nPruned < nAll, "prefilter pruned nothing")
  }

  test("vocab_drift == local chi-square recomputation over the hash slices") {
    val s = spark
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val got = LlmTextOps.vocabDrift(s, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val docs = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val sliced = docs.flatMap { case (id, toks) =>
      val bucket = id % 1000000007L * 2654435761L % 1000000007L % 10L
      if (bucket <= 8) toks.map(t => (t, bucket == 8L)) else Seq.empty
    }
    val counts = sliced.groupBy(_._1).view.mapValues { xs =>
      (xs.count(!_._2).toLong, xs.count(_._2).toLong)
    }.toMap
    val nT = counts.values.map(_._1).sum
    val nV = counts.values.map(_._2).sum
    val want = counts.toSeq.filter { case (_, (t, v)) => t + v >= 20 }
      .map { case (tok, (oT, oV)) =>
        val eT = (oT + oV).toDouble * nT.toDouble / (nT + nV).toDouble
        val eV = (oT + oV).toDouble * nV.toDouble / (nT + nV).toDouble
        val chi2 = (oT - eT) * (oT - eT) / eT + (oV - eV) * (oV - eV) / eV
        (tok, oT, oV, chi2)
      }.sortBy { case (tok, _, _, chi2) => (-chi2, tok) }
      .take(20)
      .map { case (tok, oT, oV, chi2) => (tok, oT, oV, r6d(chi2)) }
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got.length == 20)
  }

  test("label_centroids: grid means partition-stable and within 2^-20 of float avg") {
    val s = spark
    import org.apache.spark.sql.functions._
    val base = LlmVectorOps.labelCentroids(s, TestSpark.sf0001)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(base.nonEmpty)
    // the fixed-point mean must be bit-stable under any partitioning
    // (the property a plain float avg() lacks)
    val reparted = graft.engine.Tables.embeddings(s, TestSpark.sf0001)
      .repartition(13)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("v").cast("double") * 1048576.0 + 0.5).cast("long"))
          .cast("double") / (count(lit(1)) * 1048576.0)).as("m"))
      .orderBy("label", "dim")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(base.toSeq == reparted.toSeq, "grid mean not partition-stable")
    // and it approximates the true mean to the grid resolution
    val floatAvg = graft.engine.Tables.embeddings(s, TestSpark.sf0001)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim")).agg(avg(col("v")).as("m"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    base.foreach { case (l, dim, _, m) =>
      assert(math.abs(m - floatAvg((l, dim))) < 1.0 / (1 << 20) + 1e-9,
        s"($l, $dim) grid mean drifted from the float mean")
    }
  }

  test("source_quality == local per-source recomputation") {
    val s = spark
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val got = LlmTextOps.sourceQuality(s, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getDouble(6)))
    val docs = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .select("source", "lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val want = docs.groupBy(_._1).toSeq.map { case (src, rows) =>
      val nDocs = rows.length.toLong
      val totalChars = rows.map(_._3).sum
      val totalToks = rows.map(_._4.split(" ", -1).length.toLong).sum
      val nEn = rows.count(_._2 == "en").toLong
      val nDups = rows.groupBy(_._4).values.map(_.size - 1L).sum
      (src, nDocs, totalChars, r6d(totalToks.toDouble / nDocs),
        r6d(nEn.toDouble / nDocs), nDups, r6d(nDups.toDouble / nDocs))
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("data_profile matches per-column direct aggregates") {
    val s = spark
    val got = graft.operators.FunctionOps.dataProfile(s, TestSpark.sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = graft.engine.Tables.events(s, TestSpark.sf0001)
    val n = ev.count()
    for (c <- Seq("event_id", "ts", "user_id", "event_type", "value", "props")) {
      val nn = ev.where(col(c).isNotNull).count()
      val nd = ev.select(col(c)).distinct().count()
      assert(got(c) == ((n, n - nn, nd)), s"column $c: ${got(c)}")
    }
    assert(got.size == 6)
  }
}
