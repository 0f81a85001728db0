package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnalyticOps

/** Round-8 nonparametric/robust inference quartet: each operator's
  * distributed value-grid formulation replayed driver-side from first
  * principles (textbook per-row ranks / textbook moment formulas) —
  * decorrelated from the SQL both the operator and its DuckDB oracle
  * share, so a formulation bug can't cancel across the gate.
  */
class StatTestsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def r6(x: Double): Double =
    math.floor(x * 1e6 + 0.5) / 1e6

  /** (event_type, centi value, volume k) rows at sf0.001. */
  private def rows(): Array[(String, Long, Long)] = {
    val s = spark
    import org.apache.spark.sql.functions._
    graft.engine.Tables.events(s, TestSpark.sf0001)
      .select(col("event_type"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long"),
        coalesce(get_json_object(col("props"), "$.k").cast("long"),
          lit(0L)))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  /** Textbook tie-averaged ranks (1-based) of a value sequence. */
  private def avgRanks(vs: Seq[Long]): Map[Long, Double] = {
    val sorted = vs.sorted
    sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) => v -> (g.map(_._2 + 1.0).sum / g.size) }
  }

  test("welch_t_test == textbook Welch replay vs the view baseline") {
    val all = rows()
    val got = AnalyticOps.welchTTest(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8)))
    assert(got.map(_._1).toSeq == Seq("click", "error", "purchase",
      "signup"), "every non-baseline arm, ordered")
    def stats(et: String): (Long, Double, Double) = {
      val vs = all.filter(_._1 == et).map(_._2 / 100.0)
      val n = vs.length
      val m = vs.sum / n
      val v = vs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n.toLong, m, v)
    }
    val (nb, mb, vb) = stats("view")
    got.foreach { case (et, n, nView, mean, meanV, vg, vv, t, df) =>
      val (na, ma, va) = stats(et)
      assert(n == na && nView == nb, s"$et sizes")
      assert(math.abs(mean - ma) < 1e-6 && math.abs(meanV - mb) < 1e-6)
      // centi grid is exact, so the replay variance (different fold
      // order) agrees to float noise only
      assert(math.abs(vg - va) < 1e-5, s"$et var $vg vs $va")
      assert(math.abs(vv - vb) < 1e-5)
      val sa = va / na; val sb = vb / nb
      val tw = (ma - mb) / math.sqrt(sa + sb)
      val dfw = (sa + sb) * (sa + sb) /
        (sa * sa / (na - 1) + sb * sb / (nb - 1))
      assert(math.abs(t - tw) < 1e-4, s"$et t $t vs $tw")
      assert(math.abs(df - dfw) < 1e-2, s"$et df $df vs $dfw")
      // Welch-Satterthwaite bracket: min(n)-1 <= df <= n_a+n_b-2
      assert(df >= math.min(na, nb) - 1 && df <= na + nb - 2, s"$et df")
    }
  }

  test("mann_whitney == textbook per-row rank-sum replay") {
    val all = rows()
    val a = all.filter(_._1 == "purchase").map(_._2)
    val b = all.filter(_._1 == "click").map(_._2)
    val Array(row) = AnalyticOps.mannWhitney(spark, TestSpark.sf0001)
      .collect()
    val (na, nb, u, z, rb) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(na == a.length && nb == b.length)
    val ranks = avgRanks((a ++ b).toSeq)
    val ra = a.map(ranks).sum
    val uw = ra - na * (na + 1.0) / 2.0
    assert(u == r6(uw), s"U $u vs $uw")
    val n = na + nb
    val ties = (a ++ b).groupBy(identity).values.map(_.length.toLong)
    val tie3 = ties.map(t => t * t * t - t).sum
    val mu = na * nb / 2.0
    val sig2 = na.toDouble * nb / 12.0 *
      ((n + 1.0) - tie3.toDouble / (n.toDouble * (n - 1.0)))
    assert(math.abs(z - (uw - mu) / math.sqrt(sig2)) < 1e-5)
    assert(math.abs(rb - (1.0 - 2.0 * uw / (na.toDouble * nb))) < 1e-6)
    assert(rb >= -1.0 && rb <= 1.0)
  }

  test("spearman_corr == textbook rank-Pearson replay per symbol") {
    val all = rows()
    val got = AnalyticOps.spearmanCorr(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) ==
      Seq("click", "error", "purchase", "signup", "view"))
    got.foreach { case (sym, n, rho) =>
      val g = all.filter(_._1 == sym)
      assert(n == g.length)
      val rx = avgRanks(g.map(_._2).toSeq)
      val ry = avgRanks(g.map(_._3).toSeq)
      val xs = g.map(t => rx(t._2)); val ys = g.map(t => ry(t._3))
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val sx = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum)
      val sy = math.sqrt(ys.map(y => (y - my) * (y - my)).sum)
      val want = cov / (sx * sy)
      assert(math.abs(rho - want) < 1e-6, s"$sym rho $rho vs $want")
      assert(rho >= -1.0 && rho <= 1.0)
    }
  }

  test("chi2_independence == textbook contingency replay; V in [0,1]") {
    val s = spark
    import org.apache.spark.sql.functions._
    val docs = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val Array(row) = AnalyticOps.chi2Independence(s, TestSpark.sf0001)
      .collect()
    val (nDocs, nCells, dof, chi2, v) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getDouble(3), row.getDouble(4))
    assert(nDocs == docs.length)
    val cells = docs.groupBy(identity).view.mapValues(_.length).toMap
    assert(nCells == cells.size)
    val langs = docs.map(_._1).distinct.length
    val srcs = docs.map(_._2).distinct.length
    assert(dof == (langs - 1L) * (srcs - 1L))
    val rt = docs.groupBy(_._1).view.mapValues(_.length).toMap
    val ct = docs.groupBy(_._2).view.mapValues(_.length).toMap
    // replay quantizes per cell exactly like the operator, so chi2
    // must match on the 1e-6 grid bit-for-bit
    val qsum = cells.map { case ((l, c), o) =>
      val e = rt(l).toDouble * ct(c).toDouble / docs.length
      math.floor((o - e) * (o - e) / e * 1e6 + 0.5).toLong
    }.sum
    assert(chi2 == r6(qsum / 1e6), s"chi2 $chi2 vs ${qsum / 1e6}")
    val vw = math.sqrt(qsum / 1e6 /
      (docs.length.toDouble * math.min(langs - 1, srcs - 1)))
    assert(math.abs(v - vw) < 1e-6 && v >= 0.0 && v <= 1.0)
  }
}
