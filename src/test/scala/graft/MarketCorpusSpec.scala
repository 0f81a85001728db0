package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnalyticOps, LlmTextOps}

/** Round-8 wave 5: Brown–Forsythe spread test, TWAP, realized
  * volatility, and the corpus richness/burstiness pair — replayed
  * driver-side from textbook per-row definitions (median-centered
  * deviations, interval-weighted means, raw squared-return sums,
  * dictionary counting), decorrelated from the grid/cell SQL the
  * operators and their DuckDB oracles share.
  */
class MarketCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def r6(x: Double): Double =
    math.floor(x * 1e6 + 0.5) / 1e6

  /** (symbol, us, event_id, centi) sorted per symbol at sf0.001. */
  private def ticks(): Array[(String, Long, Long, Long)] = {
    val s = spark
    import org.apache.spark.sql.functions._
    graft.engine.Tables.events(s, TestSpark.sf0001)
      .select(col("event_type"), unix_micros(col("ts")),
        col("event_id"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
  }

  test("levene_test == textbook median-centered ANOVA replay") {
    val all = ticks()
    val Array(row) = AnalyticOps.leveneTest(spark, TestSpark.sf0001)
      .collect()
    val (n, k, df1, df2, w) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getDouble(4))
    val groups = all.groupBy(_._1).view
      .mapValues(_.map(_._4.toDouble)).toMap
    assert(n == all.length && k == groups.size)
    assert(df1 == k - 1 && df2 == n - k)
    // textbook: interpolated median, |x - med| deviations, plain
    // one-way ANOVA F over the deviation samples
    def median(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val lo = (s.length + 1) / 2
      val hi = s.length / 2 + 1
      (s(lo - 1) + s(hi - 1)) / 2.0
    }
    val devs = groups.view.mapValues { vs =>
      val m = median(vs.toSeq)
      vs.map(x => math.abs(x - m))
    }.toMap
    val gm = devs.values.flatten.sum / n
    val ssb = devs.values.map { ds =>
      val m = ds.sum / ds.length
      ds.length * (m - gm) * (m - gm)
    }.sum
    val ssw = devs.values.map { ds =>
      val m = ds.sum / ds.length
      ds.map(x => (x - m) * (x - m)).sum
    }.sum
    val wW = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(w - wW) < 1e-3, s"W $w vs $wW")
    assert(w >= 0.0)
  }

  test("twap_hourly == interval-weighted replay; TWAP inside price band") {
    val all = ticks()
    val got = AnalyticOps.twapHourly(spark, TestSpark.sf0001).collect()
      .map(r => ((r.getDate(0).toString, r.getInt(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val want = all.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      sorted.zip(sorted.tail).map { case (cur, nxt) =>
        val hourUs = cur._2 - math.floorMod(cur._2, 3600000000L)
        ((java.time.Instant.ofEpochSecond(hourUs / 1000000L)
          .toString.take(10),
          ((hourUs / 1000000L) % 86400L).toInt / 3600,
          cur._1), (cur._4, nxt._2 - cur._2))
      }
    }.groupBy(_._1).view.mapValues { g =>
      val rows = g.map(_._2).toSeq
      (rows.length.toLong, rows.map(_._2).sum,
        r6(rows.map(t => t._1.toDouble * t._2).sum
          / (100.0 * rows.map(_._2).sum)))
    }.toMap
    assert(got.keySet == want.keySet, "hour-symbol key sets differ")
    got.foreach { case (key, (nG, spanG, twapG)) =>
      val (nW, spanW, twapW) = want(key)
      assert(nG == nW && spanG == spanW, s"$key counts")
      assert(math.abs(twapG - twapW) < 1e-6, s"$key twap")
    }
  }

  test("realized_vol == raw squared-log-return replay per symbol-day") {
    val all = ticks()
    val got = AnalyticOps.realizedVol(spark, TestSpark.sf0001).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), r.getDouble(3)))).toMap
    val want = all.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      sorted.zip(sorted.tail).collect {
        case (prev, cur) if prev._4 > 0 && cur._4 > 0 =>
          val day = java.time.Instant
            .ofEpochSecond(cur._2 / 1000000L).toString.take(10)
          val r = math.log(cur._4.toDouble / prev._4)
          ((cur._1, day), r * r)
      }
    }.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, math.sqrt(g.map(_._2).sum)))
      .toMap
    assert(got.keySet == want.keySet, "symbol-day key sets differ")
    got.foreach { case (key, (nG, rvG)) =>
      val (nW, rvW) = want(key)
      assert(nG == nW, s"$key n_returns")
      assert(math.abs(rvG - rvW) < 1e-4, s"$key rv $rvG vs $rvW")
    }
  }

  /** (symbol, us, event_id, centi, vol) at sf0.001. */
  private def ticksVol(): Array[(String, Long, Long, Long, Long)] = {
    val s = spark
    import org.apache.spark.sql.functions._
    graft.engine.Tables.events(s, TestSpark.sf0001)
      .select(col("event_type"), unix_micros(col("ts")),
        col("event_id"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long"),
        coalesce(get_json_object(col("props"), "$.k").cast("long"),
          lit(0L)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
  }

  private def deltas(sym: String): Seq[(Long, Long, Long, Long)] = {
    val sorted = ticksVol().filter(_._1 == sym).sortBy(e => (e._2, e._3))
    sorted.zip(sorted.tail).map { case (p, c) =>
      (c._2, c._4 - p._4, c._5, c._2) // (us, dc, vol, us)
    }
  }

  test("order_flow_imbalance == per-tick sign replay") {
    val all = ticksVol()
    val got = AnalyticOps.orderFlowImbalance(spark, TestSpark.sf0001)
      .collect()
      .map(r => ((r.getDate(0).toString, r.getInt(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    val want = all.groupBy(_._1).toSeq.flatMap { case (sym, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      sorted.zip(sorted.tail).map { case (p, c) =>
        val hourUs = c._2 - math.floorMod(c._2, 3600000000L)
        ((java.time.Instant.ofEpochSecond(hourUs / 1000000L)
          .toString.take(10),
          ((hourUs / 1000000L) % 86400L).toInt / 3600, sym),
          (c._4 - p._4).signum)
      }
    }.groupBy(_._1).view.mapValues { g =>
      val ss = g.map(_._2).toSeq
      val (up, dn, z) = (ss.count(_ > 0).toLong,
        ss.count(_ < 0).toLong, ss.count(_ == 0).toLong)
      (up, dn, z,
        if (up + dn > 0) Some(r6((up - dn).toDouble / (up + dn)))
        else None)
    }.toMap
    assert(got == want, "hour-level ofi mismatch")
    // every imbalance bounded; zero-move ticks counted, not signed
    assert(got.values.forall(_._4.forall(o => o >= -1.0 && o <= 1.0)))
  }

  test("kyle_lambda == through-origin regression replay per symbol") {
    val got = AnalyticOps.kyleLambda(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq ==
      Seq("click", "error", "purchase", "signup", "view"))
    got.foreach { case (sym, n, lam) =>
      val ds = deltas(sym)
      assert(n == ds.length, s"$sym n")
      val sv = ds.map { case (_, dc, v, _) => (dc, dc.signum * v) }
      val want = sv.map { case (dc, s) => (dc * s).toDouble }.sum /
        sv.map { case (_, s) => (s * s).toDouble }.sum
      assert(math.abs(lam - want) < 1e-6, s"$sym lambda $lam vs $want")
    }
  }

  test("roll_spread == serial-covariance replay per symbol") {
    val got = AnalyticOps.rollSpread(spark, TestSpark.sf0001).collect()
    got.foreach { r =>
      val sym = r.getString(0)
      val dcs = deltas(sym).map(_._2)
      val pairs = dcs.zip(dcs.tail).map { case (a, b) => (b, a) }
      assert(r.getLong(1) == pairs.length, s"$sym n_pairs")
      val m = pairs.length
      val ma = pairs.map(_._1.toDouble).sum / m
      val mb = pairs.map(_._2.toDouble).sum / m
      val cov = pairs.map { case (a, b) => (a - ma) * (b - mb) }.sum /
        (m - 1)
      assert(math.abs(r.getDouble(2) - cov) < 1e-4,
        s"$sym autocov ${r.getDouble(2)} vs $cov")
      if (cov < 0) {
        assert(!r.isNullAt(3), s"$sym spread should exist")
        assert(math.abs(r.getDouble(3) - 2 * math.sqrt(-cov) / 100)
          < 1e-6, s"$sym spread")
      } else assert(r.isNullAt(3), s"$sym trending regime must be null")
    }
  }

  test("amihud_illiquidity == daily open/close ratio replay") {
    val all = ticksVol()
    val got = AnalyticOps.amihudIlliquidity(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    got.foreach { case (sym, nDays, illiq) =>
      val byDay = all.filter(_._1 == sym)
        .groupBy(e => e._2 / 86400000000L)
      val ratios = byDay.values.toSeq.flatMap { evs =>
        val sorted = evs.sortBy(e => (e._2, e._3))
        val (open, close) = (sorted.head._4, sorted.last._4)
        val dvol = sorted.map(e => e._4 * e._5).sum
        if (open > 0 && dvol > 0)
          Some(math.abs(close - open).toDouble / open /
            (dvol / 100.0) * 1e6)
        else None
      }
      assert(nDays == ratios.length, s"$sym n_days")
      val want = ratios.sum / ratios.length
      assert(math.abs(illiq - want) < 1e-5, s"$sym illiq $illiq vs $want")
    }
  }

  test("hapax_ratio == dictionary-count replay per source") {
    val s = spark
    import org.apache.spark.sql.functions._
    val docs = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = LlmTextOps.hapaxRatio(s, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(7))))
      .toMap
    docs.groupBy(_._1).foreach { case (src, g) =>
      val toks = g.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      val counts = toks.groupBy(identity).view.mapValues(_.length)
      val (nT, vocab) = (toks.length.toLong, counts.size.toLong)
      val hapax = counts.count(_._2 == 1).toLong
      val dis = counts.count(_._2 == 2).toLong
      val (gnT, gv, gh, gd, ghs, gttr) = got(src)
      assert(gnT == nT && gv == vocab && gh == hapax && gd == dis,
        s"$src counts")
      assert(ghs == r6(hapax.toDouble / vocab), s"$src hapax_share")
      assert(gttr == r6(vocab.toDouble / nT), s"$src ttr")
    }
  }

  test("token_burstiness == per-doc moment replay; head tokens bursty-ranked") {
    val s = spark
    import org.apache.spark.sql.functions._
    val docs = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.length.toDouble
    val cells = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).map(tok => (tok, id))
    }.groupBy(identity).view.mapValues(_.length).toMap
    val byTok = cells.toSeq.map { case ((tok, _), x) => (tok, x) }
      .groupBy(_._1).view.mapValues { g =>
        val xs = g.map(_._2.toLong)
        (xs.sum, xs.map(x => x * x).sum, xs.length.toLong)
      }.toMap
    val want = byTok.toSeq
      .sortBy { case (tok, (total, _, _)) => (-total, tok) }.take(20)
      .map { case (tok, (total, sx2, df)) =>
        (tok, total, df,
          r6(sx2.toDouble / total - total / nDocs))
      }
    val got = LlmTextOps.tokenBurstiness(s, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == want, s"top-20 mismatch:\n got=$got\nwant=$want")
    // head tokens in synthetic space-tokenized text repeat within
    // docs, so Fano must exceed the Poisson floor somewhere and
    // never go below the theoretical minimum
    assert(got.forall(_._4 > -1.0 + 1e-9))
  }

  private def ticks(sf: String): Array[(String, Long, Long, Double)] = {
    import org.apache.spark.sql.functions._
    graft.engine.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")), col("event_id"),
        col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
  }

  test("garman_klass_vol == per-day driver OHLC + formula replay") {
    import org.apache.spark.sql.functions._
    val s = spark
    val rows = graft.engine.Tables.events(s, TestSpark.sf0001)
      .select(to_date(col("ts")).cast("string"), col("event_type"),
        unix_micros(col("ts")), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val want = rows.groupBy(t => (t._1, t._2)).toSeq
      .filter { case (_, g) => g.map(_._5).min > 0.0 }
      .map { case ((date, sym), g) =>
        val o = g.minBy(t => (t._3, t._4))._5
        val c = g.maxBy(t => (t._3, t._4))._5
        val h = g.map(_._5).max
        val l = g.map(_._5).min
        (date, sym, g.length.toLong,
          r6(0.5 * math.log(h / l) * math.log(h / l)
            - (2.0 * math.log(2.0) - 1.0)
              * math.log(c / o) * math.log(c / o)))
      }.toSet
    val got = AnalyticOps.garmanKlassVol(s, TestSpark.sf0001)
      .select(col("date").cast("string"), col("symbol"), col("n_ticks"),
        col("gk_var"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.nonEmpty)
  }

  test("arch_effect == driver Pearson replay over squared returns") {
    val s = spark
    val bySym = ticks(TestSpark.sf0001).groupBy(_._1)
    val want = bySym.map { case (sym, g) =>
      val ps = g.sortBy(t => (t._2, t._3))
        .map(t => math.floor(t._4 * 100.0 + 0.5).toLong)
      val xs = ps.sliding(2).collect { case Array(a, b) => (b - a) * (b - a) }
        .toArray
      val pairsXY = xs.sliding(2).collect { case Array(y, x) => (x, y) }
        .toArray
      val n = pairsXY.length.toLong
      val sx = pairsXY.map(_._1).map(BigInt(_)).sum
      val sy = pairsXY.map(_._2).map(BigInt(_)).sum
      val sxy = pairsXY.map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val sxx = pairsXY.map { case (x, _) => BigInt(x) * BigInt(x) }.sum
      val syy = pairsXY.map { case (_, y) => BigInt(y) * BigInt(y) }.sum
      val num = (BigInt(n) * sxy - sx * sy).toDouble
      val den = math.sqrt((BigInt(n) * sxx - sx * sx).toDouble) *
        math.sqrt((BigInt(n) * syy - sy * sy).toDouble)
      (sym, n, if (den == 0.0) null else r6(num / den))
    }.filter(_._2 > 0L).toSet
    val got = AnalyticOps.archEffect(s, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("momentum_rank == driver daily-bar lag-7 rank replay") {
    val s = spark
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val rets = ticks(TestSpark.sf0001).groupBy(_._1).toSeq.flatMap {
      case (sym, g) =>
        val bars = g.groupBy(t => t._2 / 86400000000L).toSeq.map {
          case (day, rows) =>
            (day, math.floor(rows.maxBy(_._2)._4 * 100.0 + 0.5).toLong)
        }.sortBy(_._1)
        bars.indices.drop(7).map { i =>
          (bars(i)._1, sym,
            r6((bars(i)._2 - bars(i - 7)._2).toDouble
              / bars(i - 7)._2.toDouble))
        }
    }
    val expected = rets.groupBy(_._1).flatMap { case (day, rows) =>
      rows.sortBy { case (_, sym, r) => (-r, sym) }.zipWithIndex
        .map { case ((_, sym, r), idx) => (day, sym, r, idx + 1) }
    }.toSet
    val got = AnalyticOps.momentumRank(s, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    // ranks are a per-day permutation of 1..k
    got.groupBy(_._1).foreach { case (day, rows) =>
      assert(rows.map(_._4).toSeq.sorted == (1 to rows.size), s"day $day")
    }
  }

  test("event_paths == driver trigram counting replay") {
    val s = spark
    import org.apache.spark.sql.functions._
    val events = graft.engine.Tables.events(s, TestSpark.sf0001)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trigrams = events.groupBy(_._1).toSeq.flatMap { case (uid, g) =>
      g.sortBy(t => (t._2, t._3)).map(_._4).toSeq.sliding(3)
        .collect { case Seq(a, b, c) => (s"$a > $b > $c", uid) }
        .toSeq
    }
    val expected = trigrams.groupBy(_._1).toSeq
      .map { case (p, rows) =>
        (p, rows.length.toLong, rows.map(_._2).distinct.length.toLong)
      }
      .sortBy { case (p, n, _) => (-n, p) }.take(20)
    val got = AnalyticOps.eventPaths(s, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == expected, s"\n got=$got\nwant=$expected")
  }

  test("seasonal_decompose == driver STL-strength replay") {
    val s = spark
    val want = ticks(TestSpark.sf0001).groupBy(_._1).map { case (sym, g) =>
      val bars = g.groupBy(t => t._2 / 3600000000L).toSeq.map {
        case (h, rows) =>
          (h, math.floor(rows.maxBy(_._2)._4 * 100.0 + 0.5).toLong)
      }.sortBy(_._1)
      val closes = bars.map(_._2)
      val trend = bars.indices.map { i =>
        val lo = math.max(0, i - 12); val hi = math.min(bars.length - 1, i + 12)
        val win = closes.slice(lo, hi + 1)
        win.sum.toDouble / win.length
      }
      val dq = bars.indices.map(i =>
        math.floor((closes(i) - trend(i)) * 1.0e6 + 0.5).toLong)
      val hod = bars.map(_._1 % 24)
      val sm = hod.zip(dq).groupBy(_._1).view
        .mapValues(g2 => g2.map(_._2).sum.toDouble / g2.length).toMap
      val rq = bars.indices.map(i =>
        math.floor(dq(i).toDouble - sm(hod(i)) + 0.5).toLong)
      val tq = bars.indices.map(i =>
        math.floor((closes(i) * 1000000L).toDouble - sm(hod(i)) + 0.5).toLong)
      def varNum(xs: Seq[Long]): Double = {
        val n = BigInt(xs.length)
        val sx = xs.map(BigInt(_)).sum
        val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
        (n * sxx - sx * sx).toDouble
      }
      val fT = math.max(0.0, r6(1.0 - varNum(rq) / varNum(tq)))
      val fS = math.max(0.0, r6(1.0 - varNum(rq) / varNum(dq)))
      (sym, bars.length.toLong, fT, fS)
    }.toSet
    val got = AnalyticOps.seasonalDecompose(s, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // strengths live in [0, 1] by construction
    assert(got.forall(t => t._3 >= 0.0 && t._3 <= 1.0
      && t._4 >= 0.0 && t._4 <= 1.0))
  }

  test("theil_sen_slope == driver pairwise-slope median replay") {
    val s = spark
    val want = ticks(TestSpark.sf0001).groupBy(_._1).flatMap {
      case (sym, g) =>
        val bars = g.groupBy(t => t._2 / 86400000000L).toSeq.map {
          case (h, rows) =>
            (h, math.floor(rows.maxBy(_._2)._4 * 100.0 + 0.5).toLong)
        }
        val slopes = (for {
          (hi, ci) <- bars; (hj, cj) <- bars if hi < hj
        } yield ((cj - ci).toDouble / (hj - hi).toDouble, hi, hj))
          .sortBy(t => (t._1, t._2, t._3))
        val cnt = slopes.length
        if (cnt == 0) None
        else {
          val lo = slopes((cnt + 1) / 2 - 1)._1
          val hi2 = slopes((cnt + 2) / 2 - 1)._1
          Some((sym, cnt.toLong, r6((lo + hi2) / 2.0)))
        }
    }.toSet
    val got = graft.operators.AnalyticOps.theilSenSlope(s, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.nonEmpty)
  }

  test("dedup_threshold_sweep is monotone and agrees with dedup_near at 0.8") {
    val s = spark
    val sweep = LlmTextOps.dedupThresholdSweep(s, TestSpark.sf001)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // pair and removal counts must be non-increasing in tau
    sweep.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 >= b._2 && a._3 >= b._3, s"not monotone: $a -> $b")
      case _ =>
    }
    // the 0.8 row IS dedup_near's pair set and dedup_survivors'
    // removal count — same silver, same algebra
    val nPairs = LlmTextOps.dedupNearPairs(s, TestSpark.sf001).count()
    val removed = LlmTextOps.dedupNearPairs(s, TestSpark.sf001)
      .select("j").distinct().count()
    val at08 = sweep.find(_._1 == 0.8).get
    assert(at08._2 == nPairs && at08._3 == removed,
      s"0.8 row $at08 != ($nPairs, $removed)")
  }

  /** Daily close-to-close 1e-6 returns per symbol, replayed from the
    * raw ticks (event-time-last close per day). */
  private def dailyReturns(): Map[String, Seq[(Long, Long)]] = {
    val byDay = ticks().groupBy(t => (t._1, t._2 / 86400000000L))
      .map { case ((sym, day), ts) =>
        (sym, day, ts.maxBy(t => (t._2, t._3))._4) // last-by-(us,id) close
      }.toSeq
    byDay.groupBy(_._1).map { case (sym, bars) =>
      val sorted = bars.sortBy(_._2)
      sym -> sorted.zip(sorted.tail).collect {
        case ((_, _, pc), (_, day, c)) if pc != 0L =>
          (day, math.floor((c - pc).toDouble / pc * 1e6 + 0.5).toLong)
      }.toSeq
    }
  }

  test("var_es == driver replay: exact 5th percentile + worst-ceil(n/20) mean") {
    val rets = dailyReturns()
    val got = AnalyticOps.varEs(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(got.nonEmpty)
    got.foreach { case (sym, (nDays, v95, es95)) =>
      val rs = rets(sym).map(_._2).sorted
      assert(rs.size == nDays)
      // exact percentile with linear interpolation at p = 0.05
      val idx = 0.05 * (rs.size - 1)
      val lo = rs(idx.toInt)
      val hi = rs(math.min(idx.toInt + 1, rs.size - 1))
      val q = lo + (idx - idx.toInt) * (hi - lo)
      assert(math.abs(v95 - r6(q / 1e6)) < 2e-6, s"$sym VaR: $v95 vs $q")
      val k = (rs.size + 19) / 20
      val es = rs.take(k).sum.toDouble / (k * 1e6)
      assert(math.abs(es95 - r6(es)) < 2e-6, s"$sym ES: $es95 vs $es")
      assert(es95 <= v95 + 1e-9, s"$sym: ES must sit at or below VaR")
    }
  }

  test("sharpe_ratio == driver replay from exact integer moments") {
    val rets = dailyReturns()
    val got = AnalyticOps.sharpeRatio(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(got.nonEmpty)
    got.foreach { case (sym, (n, meanRet, sharpe)) =>
      val rs = rets(sym).map(_._2)
      assert(rs.size == n && n >= 2)
      val sr = rs.map(BigInt(_)).sum
      val srr = rs.map(r => BigInt(r) * BigInt(r)).sum
      assert(math.abs(meanRet
        - r6(sr.toDouble / (n * 1000000L))) < 2e-6)
      val varD = (BigInt(n) * srr - sr * sr).toDouble / (n * (n - 1L))
      val exp = r6(sr.toDouble / n / math.sqrt(varD) * math.sqrt(365.0))
      assert(math.abs(sharpe - exp) < 2e-6, s"$sym: $sharpe vs $exp")
    }
  }

  test("capm_beta == driver replay; the market's own beta-weighted mean is ~1") {
    val rets = dailyReturns()
    // market return per day: mean of that day's symbol returns,
    // re-quantized
    val mkt = rets.values.flatten.groupBy(_._1).map { case (day, rs) =>
      day -> math.floor(
        rs.map(_._2).sum.toDouble / rs.size + 0.5).toLong
    }
    val got = AnalyticOps.capmBeta(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(got.nonEmpty)
    got.foreach { case (sym, (n, beta, corr)) =>
      val xy = rets(sym).map { case (day, r) => (mkt(day), r) }
      assert(xy.size == n)
      val sx = xy.map(p => BigInt(p._1)).sum
      val sy = xy.map(p => BigInt(p._2)).sum
      val sxx = xy.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val syy = xy.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val sxy = xy.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val num = (BigInt(n) * sxy - sx * sy).toDouble
      val den = (BigInt(n) * sxx - sx * sx).toDouble
      assert(math.abs(beta - r6(num / den)) < 2e-6, s"$sym beta")
      val expCorr = r6(num / (math.sqrt(den)
        * math.sqrt((BigInt(n) * syy - sy * sy).toDouble)))
      assert(math.abs(corr - expCorr) < 2e-6, s"$sym corr")
      assert(corr >= -1.0 - 1e-9 && corr <= 1.0 + 1e-9)
    }
  }

  test("sortino_ratio == driver replay; downside-only denominator") {
    val rets = dailyReturns()
    val rows = AnalyticOps.sortinoRatio(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sym, n, nDown) = (r.getString(0), r.getLong(1), r.getLong(2))
      val rs = rets(sym).map(_._2)
      assert(rs.size == n && n >= 2)
      assert(nDown == rs.count(_ < 0L), s"$sym n_down")
      val sr = rs.map(BigInt(_)).sum
      assert(math.abs(r.getDouble(3)
        - r6(sr.toDouble / (n * 1000000L))) < 2e-6, s"$sym mean")
      val sdd = rs.filter(_ < 0L).map(x => BigInt(x) * BigInt(x)).sum
      if (sdd == 0) assert(r.isNullAt(4), s"$sym: all-gain must null")
      else {
        val exp = r6(sr.toDouble / n
          / math.sqrt(sdd.toDouble / n) * math.sqrt(365.0))
        assert(math.abs(r.getDouble(4) - exp) < 2e-6, s"$sym sortino")
        // downside vol <= total vol pointwise => |sortino| >= |sharpe|
        // whenever both exist and the mean is nonzero (sanity link)
      }
    }
  }

  test("calmar_ratio == driver replay: running-peak drawdown over daily bars") {
    val byDay = ticks().groupBy(t => (t._1, t._2 / 86400000000L))
      .map { case ((sym, day), ts) =>
        (sym, day, ts.maxBy(t => (t._2, t._3))._4)
      }.toSeq.groupBy(_._1)
    val rows = AnalyticOps.calmarRatio(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sym = r.getString(0)
      val bars = byDay(sym).sortBy(_._2).map(_._3)
      assert(r.getLong(1) == bars.size, s"$sym n_days")
      val mddQ = bars.scanLeft(Long.MinValue)(math.max).tail
        .zip(bars).map { case (peak, c) =>
          if (peak > 0L)
            math.floor((peak - c).toDouble / peak * 1e6 + 0.5).toLong
          else 0L
        }.max
      val retQ = bars.sliding(2).collect {
        case Seq(pc, c) if pc != 0L =>
          math.floor((c - pc).toDouble / pc * 1e6 + 0.5).toLong
      }.toSeq
      val annRet =
        retQ.map(BigInt(_)).sum.toDouble / retQ.size / 1e6 * 365.0
      assert(math.abs(r.getDouble(2) - r6(mddQ / 1e6)) < 2e-6, s"$sym mdd")
      assert(math.abs(r.getDouble(3) - r6(annRet)) < 2e-6, s"$sym ann")
      if (mddQ == 0L) assert(r.isNullAt(4), s"$sym: dd-free must null")
      else assert(math.abs(r.getDouble(4)
        - r6(annRet / (mddQ / 1e6))) < 2e-6, s"$sym calmar")
    }
  }

  test("omega_ratio == driver replay: gain mass over loss mass") {
    val rets = dailyReturns()
    val rows = AnalyticOps.omegaRatio(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sym = r.getString(0)
      val rs = rets(sym).map(_._2)
      assert(r.getLong(1) == rs.size)
      assert(r.getLong(2) == rs.count(_ > 0L))
      assert(r.getLong(3) == rs.count(_ < 0L))
      val g = rs.filter(_ > 0L).map(BigInt(_)).sum
      val l = rs.filter(_ < 0L).map(x => BigInt(-x)).sum
      assert(math.abs(r.getDouble(4) - r6(g.toDouble / 1e6)) < 2e-6)
      assert(math.abs(r.getDouble(5) - r6(l.toDouble / 1e6)) < 2e-6)
      if (l == 0) assert(r.isNullAt(6), s"$sym: loss-free must null")
      else assert(math.abs(r.getDouble(6)
        - r6(g.toDouble / l.toDouble)) < 2e-6, s"$sym omega")
    }
  }

  test("underwater_duration == driver spell replay off daily bars") {
    val byDay = ticks().groupBy(t => (t._1, t._2 / 86400000000L))
      .map { case ((sym, day), ts) =>
        (sym, day, ts.maxBy(t => (t._2, t._3))._4)
      }.toSeq.groupBy(_._1)
    val rows = AnalyticOps.underwaterDuration(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sym = r.getString(0)
      val closes = byDay(sym).sortBy(_._2).map(_._3)
      assert(r.getLong(1) == closes.size.toLong, s"$sym n_days")
      var peak = Long.MinValue
      val under = closes.map { c => peak = math.max(peak, c); c < peak }
      val spells = scala.collection.mutable.ArrayBuffer[Long]()
      var cur = 0L
      under.foreach { u =>
        if (u) cur += 1L
        else { if (cur > 0L) spells += cur; cur = 0L }
      }
      val open = cur
      if (cur > 0L) spells += cur
      assert(r.getLong(2) == spells.size.toLong, s"$sym n_spells")
      assert(r.getLong(3) ==
        (if (spells.isEmpty) 0L else spells.max), s"$sym max spell")
      assert(r.getLong(4) == open, s"$sym open spell")
      // invariants: the open spell is one of the spells; lengths
      // bound by the calendar
      assert(r.getLong(4) <= r.getLong(3))
      assert(r.getLong(3) < r.getLong(1))
    }
  }

  test("ljung_box == textbook full-series-mean acf + Q replay") {
    val bySym = ticks().groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._2, t._3)).map(_._4)).toMap
    val rows = AnalyticOps.ljungBox(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty && rows.length == bySym.size)
    rows.foreach { r =>
      val sym = r.getString(0)
      val xs = bySym(sym)
      val n = xs.length.toLong
      assert(r.getLong(1) == n && n >= 6)
      val s = xs.map(BigInt(_)).sum
      val ss = xs.map(x => BigInt(x) * BigInt(x)).sum
      val den = BigInt(n) * (BigInt(n) * ss - s * s)
      val rhos = (1 to 5).map { k =>
        val pairs = xs.drop(k).zip(xs.dropRight(k))
        val sxy = pairs.map(p => BigInt(p._1) * BigInt(p._2)).sum
        val sa = pairs.map(p => BigInt(p._1)).sum
        val sb = pairs.map(p => BigInt(p._2)).sum
        r6((BigInt(n) * BigInt(n) * sxy - BigInt(n) * s * (sa + sb)
          + (BigInt(n) - k) * s * s).toDouble / den.toDouble)
      }
      (0 until 5).foreach { i =>
        assert(math.abs(r.getDouble(2 + i) - rhos(i)) < 2e-6,
          s"$sym rho${i + 1}: ${r.getDouble(2 + i)} vs ${rhos(i)}")
        assert(rhos(i) >= -1.0 - 1e-9 && rhos(i) <= 1.0 + 1e-9)
      }
      val q = r6((n * (n + 2)).toDouble
        * (rhos(0) * rhos(0) / (n - 1).toDouble
          + rhos(1) * rhos(1) / (n - 2).toDouble
          + rhos(2) * rhos(2) / (n - 3).toDouble
          + rhos(3) * rhos(3) / (n - 4).toDouble
          + rhos(4) * rhos(4) / (n - 5).toDouble))
      assert(math.abs(r.getDouble(7) - q) < 2e-5, s"$sym Q")
      assert(r.getDouble(7) >= -1e-9, "Q is a sum of squares")
    }
  }
}
