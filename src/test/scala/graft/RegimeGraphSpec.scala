package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnalyticOps, RelationalOps}

/** Round-8 regime/structure wave: one-way ANOVA, Markov entropy rate,
  * Hurst R/S, and the co-purchase clustering coefficient — each
  * replayed driver-side from textbook definitions (raw-double moments,
  * per-user transition walks, brute-force per-block R/S, Set-based
  * triangle counting), decorrelated from the integer-grid SQL the
  * operator and its DuckDB oracle share.
  */
class RegimeGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def r6(x: Double): Double =
    math.floor(x * 1e6 + 0.5) / 1e6

  /** (event_type, user_id, ts-µs, event_id, centi value) at sf0.001. */
  private def events(): Array[(String, Long, Long, Long, Long)] = {
    val s = spark
    import org.apache.spark.sql.functions._
    graft.engine.Tables.events(s, TestSpark.sf0001)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")), col("event_id"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
  }

  test("anova_oneway == textbook SS decomposition replay") {
    val all = events()
    val Array(row) = AnalyticOps.anovaOneway(spark, TestSpark.sf0001)
      .collect()
    val (n, k, df1, df2, ssb, ssw, f, eta) = (row.getLong(0),
      row.getLong(1), row.getLong(2), row.getLong(3), row.getDouble(4),
      row.getDouble(5), row.getDouble(6), row.getDouble(7))
    val groups = all.groupBy(_._1).view.mapValues(_.map(_._5 / 100.0))
      .toMap
    assert(n == all.length && k == groups.size)
    assert(df1 == k - 1 && df2 == n - k)
    val gm = all.map(_._5 / 100.0).sum / n
    val ssbW = groups.values.map { vs =>
      val m = vs.sum / vs.length
      vs.length * (m - gm) * (m - gm)
    }.sum
    val sswW = groups.values.map { vs =>
      val m = vs.sum / vs.length
      vs.map(x => (x - m) * (x - m)).sum
    }.sum
    // the operator quantizes per-GROUP contributions at 1e-6; the raw
    // replay differs by fold order + k half-ulps only
    assert(math.abs(ssb - ssbW) < 1e-3, s"ssb $ssb vs $ssbW")
    assert(math.abs(ssw - sswW) < 1e-3, s"ssw $ssw vs $sswW")
    val fW = (ssbW / (k - 1)) / (sswW / (n - k))
    assert(math.abs(f - fW) < 1e-4, s"F $f vs $fW")
    assert(math.abs(eta - ssbW / (ssbW + sswW)) < 1e-6)
    assert(eta >= 0.0 && eta <= 1.0 && f >= 0.0)
  }

  test("sequence_entropy == per-user transition-walk replay") {
    val all = events()
    val Array(row) = AnalyticOps.sequenceEntropy(spark, TestSpark.sf0001)
      .collect()
    val (nTr, nSt, h, h0, gain) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    val trans = all.groupBy(_._2).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._3, e._4)).map(_._1)
      sorted.zip(sorted.tail)
    }.toSeq
    val cells = trans.groupBy(identity).view.mapValues(_.length).toMap
    val marg = trans.groupBy(_._1).view.mapValues(_.length).toMap
    val nn = trans.length.toDouble
    assert(nTr == trans.length && nSt == marg.size)
    val ln2 = math.log(2.0)
    val hW = cells.map { case ((a, _), c) =>
      c / nn * math.log(marg(a).toDouble / c)
    }.sum / ln2
    val h0W = marg.values.map(c => c / nn * math.log(nn / c)).sum / ln2
    assert(math.abs(h - hW) < 1e-4, s"H $h vs $hW")
    assert(math.abs(h0 - h0W) < 1e-4, s"H0 $h0 vs $h0W")
    assert(math.abs(gain - (h0 - h)) < 2e-6, "gain == H0 - H")
    // conditioning cannot raise entropy; both bounded by ln|states|
    assert(h >= 0.0 && h <= h0 + 1e-9)
    assert(h0 <= math.log(nSt.toDouble) / ln2 + 1e-9)
  }

  test("hurst_exponent == brute-force per-block R/S replay") {
    val all = events()
    val got = AnalyticOps.hurstExponent(spark, TestSpark.sf0001).collect()
    assert(got.map(_.getString(0)).toSeq ==
      Seq("click", "error", "purchase", "signup", "view"))
    got.foreach { r =>
      val sym = r.getString(0)
      val xs = all.filter(_._1 == sym).sortBy(e => (e._3, e._4))
        .map(_._5 / 100.0)
      assert(r.getLong(1) == xs.length, s"$sym n_ticks")
      def rsMean(m: Int): (Long, Double) = {
        val rss = xs.take(xs.length / m * m).grouped(m).toSeq.flatMap {
          blk =>
            val mu = blk.sum / m
            val z = blk.scanLeft(0.0)(_ + _ - mu).tail
            val s2 = blk.map(x => (x - mu) * (x - mu)).sum / m
            if (s2 > 0) Some((z.max - z.min) / math.sqrt(s2)) else None
        }
        (rss.length.toLong, rss.sum / rss.length)
      }
      val (nb8, rs8) = rsMean(8)
      val (nb32, rs32) = rsMean(32)
      val (nb128, rs128) = rsMean(128)
      assert(r.getLong(2) == nb8 && r.getLong(3) == nb32
        && r.getLong(4) == nb128, s"$sym block counts")
      assert(math.abs(r.getDouble(5) - rs8) < 1e-3, s"$sym rs8")
      assert(math.abs(r.getDouble(6) - rs32) < 1e-3, s"$sym rs32")
      assert(math.abs(r.getDouble(7) - rs128) < 1e-3, s"$sym rs128")
      val hW = (math.log(rs128) - math.log(rs8)) / math.log(16.0)
      assert(math.abs(r.getDouble(8) - hW) < 1e-3, s"$sym hurst")
      // R/S grows with m for any non-degenerate series; H in a sane
      // band for a bounded synthetic price stream
      assert(rs128 > rs8, s"$sym R/S not increasing")
      assert(r.getDouble(8) > 0.0 && r.getDouble(8) < 1.2, s"$sym H")
    }
  }

  test("clustering_coeff == Set-based triangle replay") {
    val s = spark
    import org.apache.spark.sql.functions._
    val li = graft.engine.Tables.lineitem(s, TestSpark.sf0001)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).values.map(_.map(_._2).toSet)
    val co = baskets.flatMap { ds =>
      ds.toSeq.sorted.combinations(2).map { case Seq(a, b) => (a, b) }
    }.groupBy(identity).view.mapValues(_.size).toMap
    // NOTE: Map.collect with a pair-producing function rebuilds a MAP
    // (collapsing edges sharing a first node) — keySet avoids it
    val edges = co.filter(_._2 >= 2).keySet
    val nbrs = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = nbrs.collect { case (k, ns) if ns.size >= 2 =>
      val tri = ns.toSeq.sorted.combinations(2).count {
        case Seq(a, b) => edges.contains((a, b))
      }
      (k, ns.size.toLong, tri.toLong,
        r6(2.0 * tri / (ns.size.toDouble * (ns.size - 1.0))))
    }.toSeq
      .sortBy { case (p, dg, _, cc) => (-cc, -dg, p) }.take(20)
    val got = RelationalOps.clusteringCoeff(s, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == want, s"top-20 mismatch:\n got=$got\nwant=$want")
  }
}
