package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnalyticOps, LlmTextOps, LlmVectorOps}

/** Round-7 continuation: distribution drift (KS), local volatility
  * bands, and hybrid-retrieval fusion — each pinned to a local
  * recomputation sharing no code with the operator.
  */
class DriftRetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("ks_drift == local ECDF sup recomputation over the time split") {
    val s = spark
    val rows = graft.engine.Tables.events(s, TestSpark.sf0001)
      .select(col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val mid = (rows.map(_._3).min + rows.map(_._3).max) / 2
    val want = rows.groupBy(_._1).collect {
      case (et, xs)
          if xs.exists(_._3 <= mid) && xs.exists(_._3 > mid) =>
        val a = xs.filter(_._3 <= mid).map(_._2)
        val b = xs.filter(_._3 > mid).map(_._2)
        val d = xs.map(_._2).distinct.map { v =>
          math.abs(a.count(_ <= v).toDouble / a.length
            - b.count(_ <= v).toDouble / b.length)
        }.max
        et -> ((a.length.toLong, b.length.toLong, r6d(d)))
    }
    val got = AnalyticOps.ksDrift(s, TestSpark.sf0001).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (wa, wb, wk) = want(r.getString(0))
      assert(r.getLong(1) == wa && r.getLong(2) == wb, r.getString(0))
      assert(r.getDouble(3) == wk,
        s"${r.getString(0)} ks ${r.getDouble(3)} vs $wk")
    }
    // the statistic is a probability-difference sup
    got.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("value_bands == local 20-row frame recomputation (exact decimal)") {
    val s = spark
    val rows = graft.engine.Tables.events(s, TestSpark.sf0001)
      .select(col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val want = rows.groupBy(_._2).values.flatMap { g =>
      val xs = g.sortBy(t => (t._4, t._1))
      xs.zipWithIndex.map { case ((id, sym, v, _), i) =>
        val frame = xs.slice(math.max(0, i - 19), i + 1)
        val n = frame.length
        def d2(x: Double) =
          BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        val s1 = frame.map(t => d2(t._3)).sum
        val s2 = frame.map(t => { val q = d2(t._3); q * q }).sum
        val midRaw = s1.toDouble / n
        val sigmaRaw = math.sqrt((BigDecimal(n) * s2 - s1 * s1).toDouble) / n
        id -> ((sym, v, n.toLong, r6d(midRaw),
          r6d(midRaw + 2.0 * sigmaRaw), r6d(midRaw - 2.0 * sigmaRaw)))
      }
    }.toMap
    val got = AnalyticOps.valueBands(s, TestSpark.sf0001).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      val (sym, v, n, mid, ub, lb) = want(id)
      assert(r.getString(1) == sym && r.getDouble(2) == v, s"id $id")
      assert(r.getLong(3) == n, s"id $id n")
      assert(r.getDouble(4) == mid, s"id $id mid")
      assert(r.getDouble(5) == ub && r.getDouble(6) == lb, s"id $id bands")
      // band geometry: lower <= mid <= upper always
      assert(lb <= mid && mid <= ub, s"id $id geometry")
    }
  }

  test("rrf_fusion == local fusion of independently recomputed legs") {
    val s = spark
    val emb = graft.engine.Tables.embeddings(s, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val probe = emb.find(_._1 == 0L).get._2
    val pn = math.sqrt(dot(probe, probe))
    val semRank = emb.filter(_._1 != 0L)
      .map { case (id, e) =>
        id -> r6d(dot(probe, e) / (pn * math.sqrt(dot(e, e))))
      }
      .sortBy { case (id, sc) => (-sc, id) }.take(100).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val lexRank = LlmTextOps.bm25Scored(s, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, sc) => (-sc, id) }.take(100).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val want = (lexRank.keySet ++ semRank.keySet).toSeq
      .map { id =>
        val rr =
          lexRank.get(id).map(r => 1.0 / (r + 60).toDouble).getOrElse(0.0) +
            semRank.get(id).map(r => 1.0 / (r + 60).toDouble).getOrElse(0.0)
        (id, rr)
      }
      .sortBy { case (id, rr) => (-rr, id) }.take(20)
    val got = LlmVectorOps.rrfFusion(s, TestSpark.sf0001).collect()
    assert(got.length == want.size && got.nonEmpty)
    val wantMap = want.toMap
    got.foreach { r =>
      val id = r.getLong(0)
      assert(wantMap.contains(id), s"doc $id unexpectedly fused")
      assert(r.getDouble(3) == r6d(wantMap(id)), s"doc $id score")
      val gotLex = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val gotSem = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(gotLex == lexRank.get(id), s"doc $id lex rank")
      assert(gotSem == semRank.get(id), s"doc $id sem rank")
    }
  }

  test("fuzzy_name_match == brute-force levenshtein-1 over all pairs") {
    val s = spark
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val names = graft.engine.Tables.customer(s, TestSpark.sf0001)
      .where(col("c_custkey") < 2000)
      .select(col("c_custkey"), col("c_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (ka, na) <- names; (kb, nb) <- names
      if na < nb && lev(na, nb) == 1
    } yield (ka, na, kb, nb)).sortBy(t => (t._2, t._4))
    val got = graft.operators.RelationalOps
      .fuzzyNameMatch(s, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty, "slice must contain distance-1 name pairs")
  }

  test("pagerank_docs == local power iteration over the local kNN graph") {
    val s = spark
    val Q = 1099511627776.0
    val emb = graft.engine.Tables.embeddings(s, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val norms = emb.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val edges = emb.flatMap { case (src, v) =>
      emb.filter(_._1 != src)
        .map { case (dst, w) =>
          (dst, r6d(dot(v, w) / (norms(src) * norms(dst))))
        }
        .sortBy { case (dst, sc) => (-sc, dst) }.take(3)
        .map { case (dst, _) => (src, dst) }
    }
    val nodes = emb.map(_._1)
    val indeg = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    var pr: Map[Long, Double] = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      val qs = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (src, _) =>
          math.floor(pr(src) / 3 * Q + 0.5).toLong
        }.sum
      }.toMap
      pr = nodes.map { id =>
        id -> (0.15 + 0.85 * (qs.getOrElse(id, 0L).toDouble / Q))
      }.toMap
    }
    val got = LlmVectorOps.pagerankDocs(s, TestSpark.sf0001).collect()
    assert(got.length == nodes.length && got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == indeg.getOrElse(id, 0L), s"doc $id in-degree")
      assert(r.getDouble(2) == r6d(pr(id)), s"doc $id pagerank")
    }
    // the kNN graph's in-degrees vary by construction, so centrality
    // must actually discriminate (unlike a clique family graph)
    assert(got.map(_.getDouble(2)).distinct.length > 1)
  }

  test("hourly_profile == local per-(symbol, hour) recomputation") {
    val s = spark
    val rows = graft.engine.Tables.events(s, TestSpark.sf0001)
      .select(col("event_type"), hour(col("ts")), col("value")).collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getDouble(2)))
    val want = rows.groupBy(_._1).map { case (key, xs) =>
      val vs = xs.map(_._2)
      def d2(x: Double) =
        BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val n = vs.length
      val s1 = vs.map(d2).sum
      val s2 = vs.map(v => { val q = d2(v); q * q }).sum
      val mu = s1.toDouble / n
      val sd = math.sqrt((BigDecimal(n) * s2 - s1 * s1).toDouble) / n
      key -> ((n.toLong, r6d(mu), r6d(sd), vs.min, vs.max))
    }
    val got = AnalyticOps.hourlyProfile(s, TestSpark.sf0001).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val key = (r.getString(0), r.getInt(1))
      val (n, mu, sd, mn, mx) = want(key)
      assert(r.getLong(2) == n, s"$key n")
      assert(r.getDouble(3) == mu && r.getDouble(4) == sd, s"$key moments")
      assert(r.getDouble(5) == mn && r.getDouble(6) == mx, s"$key range")
    }
  }
}
