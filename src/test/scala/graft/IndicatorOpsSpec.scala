package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.{AnalyticOps, LlmTextOps, LlmVectorOps}

/** Round-7 fourth wave: market-indicator, experimentation, and
  * concentration operators. Each test pins the distributed
  * formulation against an independent driver-side recomputation,
  * mirroring the DuckDB gate locally at sf0.001.
  */
class IndicatorOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q6(x: Double): Double =
    math.floor(x * 1e6 + 0.5) / 1e6

  test("rsi_indicator == driver-side trailing-14 recomputation") {
    val s = spark
    val got = AnalyticOps.rsiIndicator(s, TestSpark.sf0001).collect()
    val events = Tables.events(s, TestSpark.sf0001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val expected = events.groupBy(_._3).toSeq.flatMap { case (sym, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      val dq = sorted.indices.map { i =>
        if (i == 0) None
        else Some(math.floor((sorted(i)._4 - sorted(i - 1)._4) * 1e6
          + 0.5).toLong)
      }
      val full = sorted.indices.filter(_ >= 14).map { i =>
        val frame = (math.max(1, i - 13) to i).map(dq(_).get)
        val g = frame.filter(_ > 0).sum
        val l = frame.filter(_ < 0).map(-_).sum
        (sorted(i)._1, sym, sorted(i)._4, g, l,
          if (g + l == 0) None
          else Some(q6(100.0 * g.toDouble / (g + l).toDouble)))
      }
      full.takeRight(20)
    }.map(t => t._1 -> t).toMap
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getLong(1))
      assert(r.getString(0) == e._2)
      assert(r.getDouble(2) == e._3, "price")
      assert(r.getLong(3) == e._4, "gains")
      assert(r.getLong(4) == e._5, "losses")
      assert(Option(r.get(5)).map(_.asInstanceOf[Double]) == e._6, "rsi14")
    }
  }

  test("rsi_indicator frame is exactly 14 moves (pinned on a synthetic ramp)") {
    val s = spark
    import s.implicits._
    // strictly increasing prices: every move is a gain => RSI 100
    val n = 40
    val dir = java.nio.file.Files.createTempDirectory("rsi").toString
    (1 to n).map(i => (i.toLong,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i * 60L)),
      1L, "ramp", i * 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticOps.rsiIndicator(s, dir).collect()
    assert(out.length == 20)
    assert(out.forall(_.getDouble(5) == 100.0))
    // each gain sum = 14 moves of +1.5 on the 6-dp integer grid
    assert(out.forall(_.getLong(3) == 14L * 1500000L))
    assert(out.forall(_.getLong(4) == 0L))
  }

  test("ab_test_z == driver-side two-proportion recomputation") {
    val s = spark
    val got = AnalyticOps.abTestZ(s, TestSpark.sf001).collect()
    assert(got.length == 1)
    val per = Tables.events(s, TestSpark.sf001)
      .select(col("user_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (u, evs) =>
        (u, if (evs.count(_._2 == "purchase") >= 14) 1 else 0)
      }
    val arm = (u: Long) => ((u % 1000000007L) * 3432918353L % 1000000007L) % 2
    val a = per.filter(kv => arm(kv._1) == 0)
    val b = per.filter(kv => arm(kv._1) == 1)
    val (na, nb) = (a.size.toLong, b.size.toLong)
    val (xa, xb) = (a.values.sum.toLong, b.values.sum.toLong)
    val r = got.head
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(r.getLong(2) == xa && r.getLong(3) == xb)
    assert(r.getDouble(4) == q6(xa.toDouble / na.toDouble))
    assert(r.getDouble(5) == q6(xb.toDouble / nb.toDouble))
    val pp = (xa + xb).toDouble / (na + nb).toDouble
    val z = (xa.toDouble / na.toDouble - xb.toDouble / nb.toDouble) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / na.toDouble + 1.0 / nb.toDouble))
    assert(r.getDouble(6) == q6(z))
    // both arms populated: the hash split actually splits
    assert(na > 0 && nb > 0)
  }

  test("gini_concentration == driver-side recomputation; extremes behave") {
    val s = spark
    val got = LlmTextOps.giniConcentration(s, TestSpark.sf0001).collect()
    val docs = Tables.documents(s, TestSpark.sf0001)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val counts = ds.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
      val sorted = counts.toSeq.sortBy { case (t, c) => (c, t) }
      val n = sorted.length.toLong
      val total = sorted.map(_._2).sum
      val wsum = sorted.zipWithIndex.map { case ((_, c), i) =>
        (i + 1) * c
      }.sum
      src -> (n, total,
        q6((2 * wsum - (n + 1) * total).toDouble / (n * total).toDouble))
    }
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert(r.getLong(1) == e._1, "n_types")
      assert(r.getLong(2) == e._2, "total_tokens")
      assert(r.getDouble(3) == e._3, "gini")
    }
    // uniform counts => gini ~ 0; all have 0 <= gini < 1
    got.foreach(r => assert(r.getDouble(3) >= -1e-6 && r.getDouble(3) < 1.0))
  }

  test("zipf_slope == driver-side quantized OLS; slope is negative") {
    val s = spark
    val got = LlmTextOps.zipfSlope(s, TestSpark.sf001).collect()
    assert(got.length == 1)
    val counts = Tables.documents(s, TestSpark.sf001)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(500)
    val q = top.zipWithIndex.map { case ((_, c), i) =>
      (math.floor(math.log((i + 1).toDouble) * 1e6 + 0.5).toLong,
        math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong)
    }
    val n = BigInt(q.length)
    val sx = BigInt(q.map(_._1).sum); val sy = BigInt(q.map(_._2).sum)
    val sxx = q.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val sxy = q.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val icept = (sy * sxx - sx * sxy).toDouble / (n * sxx - sx * sx).toDouble / 1e6
    val r = got.head
    assert(r.getLong(0) == q.length.toLong)
    assert(r.getDouble(1) == q6(slope), "slope")
    assert(r.getDouble(2) == q6(icept), "intercept")
    assert(r.getDouble(1) < 0.0, "rank-frequency slope must be negative")
  }

  test("bootstrap_ci == driver-side replicate recomputation; CI brackets the mean") {
    val s = spark
    val got = AnalyticOps.bootstrapCi(s, TestSpark.sf001).collect()
    assert(got.length == 1)
    val p = Tables.events(s, TestSpark.sf001)
      .where(col("event_type") === "purchase")
      .select(col("event_id"),
        col("value").cast(org.apache.spark.sql.types.DataTypes
          .createDecimalType(18, 6)))
      .collect()
      .map(r => (r.getLong(0), r.getDecimal(1)))
    val means = (0 until 32).map { b =>
      val sel = p.filter { case (id, _) =>
        ((((id % 1000000007L) * 31 + b) % 1000000007L) * 1566083941L
          % 1000000007L) % 2 == 0
      }
      val sum = sel.map(v => BigDecimal(v._2)).sum
      b -> q6(sum.toDouble / sel.length.toDouble)
    }
    val sorted = means.sortBy { case (b, m) => (m, b) }.map(_._2)
    val lo = q6(sorted(0) + 0.775 * (sorted(1) - sorted(0)))
    val hi = q6(sorted(30) + 0.225 * (sorted(31) - sorted(30)))
    val r = got.head
    assert(r.getLong(0) == p.length.toLong, "n_purchases")
    assert(r.getLong(1) == 32L, "n_replicates")
    assert(r.getDouble(3) == lo, "ci_lo")
    assert(r.getDouble(4) == hi, "ci_hi")
    // half-rate subsample means concentrate around the full mean
    assert(r.getDouble(3) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(4),
      "CI must bracket the point estimate")
  }

  test("best_trade == driver-side running-trough scan per symbol") {
    val s = spark
    val got = AnalyticOps.bestTrade(s, TestSpark.sf001).collect()
    val events = Tables.events(s, TestSpark.sf001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val expected = events.groupBy(_._3).map { case (sym, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      var trough = Double.MaxValue
      val scored = sorted.map { case (id, us, _, p) =>
        trough = math.min(trough, p)
        (id, us, p, trough, q6(p - trough))
      }
      val best = scored.minBy { case (id, us, _, _, pr) => (-pr, us, id) }
      sym -> best
    }
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert(r.getLong(1) == e._1, "sell_event_id")
      assert(r.getDouble(2) == e._4, "buy_price")
      assert(r.getDouble(3) == e._3, "sell_price")
      assert(r.getDouble(4) == e._5, "max_profit")
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("attribution_last_touch == driver-side carried-click recomputation") {
    val s = spark
    val got = AnalyticOps.attributionLastTouch(s, TestSpark.sf0001).collect()
    val events = Tables.events(s, TestSpark.sf0001)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    case class P(us: Long, attributed: Boolean, gap: Long)
    val purchases = events.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      var lastClick = Option.empty[Long]
      sorted.flatMap { case (_, _, us, typ) =>
        if (typ == "click") { lastClick = Some(us); None }
        else {
          val attr = lastClick.exists(c =>
            c < us && us - c <= 86400000000L)
          Some(P(us, attr, if (attr) us - lastClick.get else 0L))
        }
      }
    }
    val byHour = purchases.groupBy(p => p.us / 3600000000L)
    assert(got.map(_.getLong(1)).sum == purchases.length.toLong)
    assert(got.map(_.getLong(2)).sum ==
      purchases.count(_.attributed).toLong, "total attributed")
    assert(got.map(_.getLong(3)).sum ==
      purchases.count(!_.attributed).toLong, "total direct")
    assert(got.length == byHour.size, "one row per active hour")
    // mean gap per hour matches on the fenced grid
    got.foreach { r =>
      val hourUs = r.getTimestamp(0).getTime * 1000L
      val ps = byHour(hourUs / 3600000000L)
      val attr = ps.filter(_.attributed)
      if (attr.nonEmpty) {
        val mean = q6(attr.map(_.gap).sum.toDouble / attr.length.toDouble
          / 60000000.0)
        assert(r.getDouble(4) == mean, "mean_gap_min")
      } else assert(r.isNullAt(4))
    }
  }

  test("self_similarity == driver-side pairwise bigram Jaccard over the hash sample") {
    val s = spark
    val got = LlmTextOps.selfSimilarity(s, TestSpark.sf001).collect()
    assert(got.length == 1)
    val docs = Tables.documents(s, TestSpark.sf001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sample = docs.sortBy { case (id, _) =>
      ((id % 1000000007L) * 1181783497L % 1000000007L, id)
    }.take(40)
    val gramSets = sample.map { case (id, text) =>
      val toks = text.split(" ", -1)
      id -> toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val pairs = for {
      i <- gramSets.indices; j <- gramSets.indices if i < j
    } yield {
      val (a, b) = (gramSets(i)._2, gramSets(j)._2)
      val inter = a.intersect(b).size
      if (inter > 0)
        Some(math.floor(inter.toDouble / (a.size + b.size - inter).toDouble
          * 1e6 + 0.5).toLong)
      else None
    }
    val jqs = pairs.flatten
    val n = sample.length.toLong
    val r = got.head
    assert(r.getLong(0) == n, "n_docs")
    assert(r.getLong(1) == jqs.length.toLong, "n_overlapping")
    assert(r.getDouble(2) ==
      q6(jqs.sum.toDouble / (n * (n - 1) / 2).toDouble / 1e6), "mean")
    assert(r.getDouble(3) ==
      (if (jqs.isEmpty) 0.0 else jqs.max.toDouble / 1e6), "max")
  }

  test("similarity_topk_b1 == driver-side sign-bit Hamming ranking; recall floor vs exact") {
    val s = spark
    val got = LlmVectorOps.similarityTopkB1(s, TestSpark.sf001).collect()
    val vecs = Tables.embeddings(s, TestSpark.sf001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def sig(v: Array[Float]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      (0 until 32).foreach { i =>
        if (v(i) > 0) lo |= (1L << i)
        if (v(i + 32) > 0) hi |= (1L << i)
      }
      (lo, hi)
    }
    val sigs = vecs.map { case (id, v) => id -> sig(v) }.toMap
    got.foreach { r =>
      val (pid, vid) = (r.getLong(0), r.getLong(2))
      val (plo, phi) = sigs(pid); val (lo, hi) = sigs(vid)
      val ham = java.lang.Long.bitCount(lo ^ plo) +
        java.lang.Long.bitCount(hi ^ phi)
      assert(r.getInt(3) == ham, s"hamming($pid,$vid)")
    }
    // per probe the ranking is exactly (hamming asc, vec_id asc)
    got.groupBy(_.getLong(0)).foreach { case (pid, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      val keys = byRank.map(r => (r.getInt(3), r.getLong(2)))
      assert(keys.sorted.toSeq == keys.toSeq, s"total order for probe $pid")
      val expected = vecs.filter(_._1 != pid).map { case (id, _) =>
        val (plo, phi) = sigs(pid); val (lo, hi) = sigs(id)
        (java.lang.Long.bitCount(lo ^ plo) +
          java.lang.Long.bitCount(hi ^ phi), id)
      }.sorted.take(10)
      assert(keys.toSeq == expected.toSeq, s"top-10 for probe $pid")
    }
    // quantization quality: binary top-10 retains a measured share of
    // the exact cosine top-10 (1 bit/dim keeps coarse direction info)
    val exact = LlmVectorOps.similarityTopk(s, TestSpark.sf001).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = got.groupBy(_.getLong(0)).map { case (pid, rows) =>
      rows.map(_.getLong(2)).toSet.intersect(exact(pid)).size / 10.0
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.2,
      f"mean recall@10 $meanRecall%.2f below the measured floor")
  }

  test("seasonality_strength == driver-side ANOVA recomputation; R2 in [0,1]") {
    val s = spark
    val got = AnalyticOps.seasonalityStrength(s, TestSpark.sf001).collect()
    val events = Tables.events(s, TestSpark.sf001)
      .select(col("event_type"), hour(col("ts")), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
    val expected = events.groupBy(_._1).map { case (sym, rows) =>
      val byH = rows.groupBy(_._2)
      val terms = byH.map { case (_, hs) =>
        val sh = hs.map(_._3).sum
        math.floor((BigInt(sh) * BigInt(sh)).toDouble
          / hs.length.toDouble + 0.5).toLong
      }
      val n = rows.length.toLong
      val sv = rows.map(_._3).sum
      val ssq = rows.map(r => BigInt(r._3) * BigInt(r._3)).sum
      val corrQ = math.floor((BigInt(sv) * BigInt(sv)).toDouble
        / n.toDouble + 0.5).toLong
      val r2 = q6((terms.sum - corrQ).toDouble
        / (ssq.toDouble - corrQ.toDouble))
      val peak = byH.map { case (h, hs) =>
        (h, q6(hs.map(_._3).sum.toDouble / hs.length.toDouble / 100.0))
      }.toSeq.minBy { case (h, m) => (-m, h) }
      sym -> (n, peak._1, peak._2, r2)
    }
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert(r.getLong(1) == e._1, "n")
      assert(r.getInt(2) == e._2, "peak_hod")
      assert(r.getDouble(3) == e._3, "peak_mean")
      assert(r.getDouble(4) == e._4, "seasonality_r2")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("markov_transitions == driver-side transition recomputation; rows normalize") {
    val s = spark
    val got = AnalyticOps.markovTransitions(s, TestSpark.sf0001).collect()
    val events = Tables.events(s, TestSpark.sf0001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = events.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._1)).map(_._4)
      sorted.sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))
    }
    val counts = trans.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    val fromN = trans.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    assert(got.length == counts.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == counts(key), s"n for $key")
      assert(r.getDouble(3) ==
        q6(counts(key).toDouble / fromN(key._1).toDouble), s"prob for $key")
    }
    // probabilities from one source sum to ~1 (each cell is fenced)
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sum = rows.map(_.getDouble(3)).sum
      assert(math.abs(sum - 1.0) < 1e-4)
    }
  }

  test("cusum_changepoint == driver-side exact-integer argmax per symbol") {
    val s = spark
    val got = AnalyticOps.cusumChangepoint(s, TestSpark.sf001).collect()
    val events = Tables.events(s, TestSpark.sf001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        math.floor(r.getDouble(3) * 100.0 + 0.5).toLong))
    val expected = events.groupBy(_._3).map { case (sym, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      val n = BigInt(sorted.length)
      val sv = BigInt(sorted.map(_._4).sum)
      var pk = BigInt(0)
      val scored = sorted.zipWithIndex.map { case ((id, us, _, vq), i) =>
        pk += vq
        val num = n * pk - BigInt(i + 1) * sv
        (id, us, i + 1, num)
      }
      val best = scored.minBy { case (id, us, _, num) =>
        (-num.abs, us, id)
      }
      sym -> (sorted.length.toLong, best._1, best._3.toLong,
        q6(best._4.toDouble / n.toDouble / 100.0))
    }
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert(r.getLong(1) == e._1, "n")
      assert(r.getLong(2) == e._2, "change_event_id")
      assert(r.getLong(4) == e._3, "change_index")
      assert(r.getDouble(5) == e._4, "cusum_value")
    }
  }

  test("autocorrelation == driver-side decimal-moment recomputation at every lag") {
    val s = spark
    val got = AnalyticOps.autocorrelation(s, TestSpark.sf0001).collect()
    val events = Tables.events(s, TestSpark.sf0001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        math.floor(r.getDouble(3) * 100.0 + 0.5).toLong))
    val expected = events.groupBy(_._3).toSeq.flatMap { case (sym, rows) =>
      val xs = rows.sortBy(r => (r._2, r._1)).map(_._4)
      (1 to 5).flatMap { k =>
        val pairs = xs.drop(k).zip(xs.dropRight(k))
        if (pairs.isEmpty) None
        else {
          val n = BigInt(pairs.length)
          val sx = BigInt(pairs.map(_._1).sum)
          val sy = BigInt(pairs.map(_._2).sum)
          val sxy = pairs.map(p => BigInt(p._1) * BigInt(p._2)).sum
          val sxx = pairs.map(p => BigInt(p._1) * BigInt(p._1)).sum
          val syy = pairs.map(p => BigInt(p._2) * BigInt(p._2)).sum
          val den = math.sqrt((n * sxx - sx * sx).toDouble) *
            math.sqrt((n * syy - sy * sy).toDouble)
          val acf = if (den == 0.0) None
            else Some(q6((n * sxy - sx * sy).toDouble / den))
          Some((sym, k) -> (pairs.length.toLong, acf))
        }
      }
    }.toMap
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected((r.getString(0), r.getInt(1)))
      assert(r.getLong(2) == e._1, "n")
      assert(Option(r.get(3)).map(_.asInstanceOf[Double]) == e._2, "acf")
      e._2.foreach(a => assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9))
    }
  }

  test("benford_deviation == driver-side digit census; shares sum to 1") {
    val s = spark
    val got = AnalyticOps.benfordDeviation(s, TestSpark.sf001).collect()
    val benford = Map(1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939,
      4 -> 0.096910, 5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992,
      8 -> 0.051153, 9 -> 0.045757)
    val digits = Tables.events(s, TestSpark.sf001)
      .select(col("value")).collect()
      .map(r => math.floor(r.getDouble(0) * 100.0 + 0.5).toLong)
      .filter(_ >= 1)
      .map { vq =>
        var v = vq
        while (v >= 10) v /= 10
        v
      }
    val counts = digits.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    val total = digits.length.toLong
    assert(got.length == counts.size)
    got.foreach { r =>
      val dg = r.getLong(0)
      assert(r.getLong(1) == counts(dg), s"n for digit $dg")
      val obs = q6(counts(dg).toDouble / total.toDouble)
      assert(r.getDouble(2) == obs, "obs_share")
      assert(r.getDouble(3) == benford(dg.toInt), "benford_share")
      assert(r.getDouble(4) == q6(obs - benford(dg.toInt)), "deviation")
    }
    assert(math.abs(got.map(_.getDouble(2)).sum - 1.0) < 1e-4)
  }

  test("ab_test_power agrees with the z-test arms and the Fleiss formula") {
    val s = spark
    val z = AnalyticOps.abTestZ(s, TestSpark.sf001).collect().head
    val p = AnalyticOps.abTestPower(s, TestSpark.sf001).collect().head
    assert(p.getLong(0) == z.getLong(0) && p.getLong(1) == z.getLong(1),
      "same arms")
    assert(p.getDouble(2) == z.getDouble(4) && p.getDouble(3) == z.getDouble(5),
      "same fenced rates")
    val (na, nb) = (z.getLong(0).toDouble, z.getLong(1).toDouble)
    val (xa, xb) = (z.getLong(2).toDouble, z.getLong(3).toDouble)
    val (p1, p2) = (xa / na, xb / nb)
    val pbar = (xa + xb) / (na + nb)
    val num = 1.959964 * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
      0.841621 * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
    val want = math.ceil(num * num / ((p1 - p2) * (p1 - p2))).toLong
    assert(p.getLong(5) == want, "n_required_per_arm")
    assert(p.getLong(5) > 0)
  }

  test("survival_km == driver-side KM recomputation; ln-survival is non-increasing") {
    val s = spark
    val got = AnalyticOps.survivalKm(s, TestSpark.sf001).collect()
    val events = Tables.events(s, TestSpark.sf001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val obs = events.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val signups = rows.filter(_._2 == "signup").map(_._3)
      if (signups.isEmpty) None
      else {
        val t0 = signups.min
        val purch = rows.filter(r => r._2 == "purchase" && r._3 > t0)
          .map(_._3)
        if (purch.nonEmpty) Some((purch.min - t0, 1L))
        else Some((rows.map(_._3).max - t0, 0L))
      }
    }
    val byDur = obs.groupBy(_._1).map { case (dur, xs) =>
      (dur, xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong)
    }.toSeq.sortBy(_._1)
    val totalObs = obs.length.toLong
    var seen = 0L
    var lnQ = 0L
    val expected = byDur.flatMap { case (dur, d, c) =>
      val nRisk = totalObs - seen
      seen += d + c
      if (d == 0) None
      else {
        val term = if (nRisk > d)
          Some(math.floor(math.log((nRisk - d).toDouble / nRisk.toDouble)
            * 1e6 + 0.5).toLong)
        else None
        term.foreach(lnQ += _)
        Some((dur, nRisk, d, q6(d.toDouble / nRisk.toDouble),
          if (nRisk > d) Some(lnQ.toDouble / 1e6) else None))
      }
    }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, e) =>
      assert(r.getLong(0) == e._1, "dur_us")
      assert(r.getLong(1) == e._2, "n_risk")
      assert(r.getLong(2) == e._3, "n_events")
      assert(r.getDouble(3) == e._4, "hazard")
      assert(Option(r.get(4)).map(_.asInstanceOf[Double]) == e._5,
        "ln_survival")
    }
    val lns = got.flatMap(r => Option(r.get(4)).map(_.asInstanceOf[Double]))
    assert(lns.sameElements(lns.sorted.reverse), "ln S non-increasing")
  }

  test("session_stats == driver-side session recomputation") {
    val s = spark
    val got = LlmTextOps.sessionStats(s, TestSpark.sf001).collect()
    assert(got.length == 1)
    val events = Tables.events(s, TestSpark.sf001)
      .select(col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sessions = events.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ts = rows.map(_._2).sorted
      val cuts = ts.zipWithIndex.map { case (t, i) =>
        i == 0 || t - ts(i - 1) > 1800000000L
      }
      val ids = cuts.scanLeft(0L)((acc, c) => if (c) acc + 1 else acc).tail
      ts.zip(ids).groupBy(_._2).toSeq.map { case (_, xs) =>
        (xs.length.toLong, xs.map(_._1).max - xs.map(_._1).min)
      }
    }
    def pct(xs: Seq[Double], p: Double): Double = {
      val sorted = xs.sorted
      val r = p * (sorted.length - 1)
      val lo = sorted(r.toInt)
      val hi = sorted(math.min(r.toInt + 1, sorted.length - 1))
      lo + (r - r.toInt) * (hi - lo)
    }
    val n = sessions.length.toLong
    val r = got.head
    assert(r.getLong(0) == n, "n_sessions")
    assert(r.getDouble(1) ==
      q6(sessions.map(_._1).sum.toDouble / n.toDouble), "mean_events")
    assert(r.getDouble(2) ==
      q6(sessions.count(_._1 == 1L).toDouble / n.toDouble), "bounce_share")
    assert(r.getDouble(3) ==
      q6(pct(sessions.map(_._2.toDouble), 0.5)), "p50_dur")
    assert(r.getDouble(4) ==
      q6(pct(sessions.map(_._2.toDouble), 0.9)), "p90_dur")
    assert(r.getDouble(5) ==
      q6(pct(sessions.map(_._1.toDouble), 0.5)), "p50_events")
  }

  test("ann_recall_b1 is consistent with the two rankings it compares") {
    val s = spark
    val got = LlmVectorOps.annRecallB1(s, TestSpark.sf001).collect()
    val exact = LlmVectorOps.similarityTopk(s, TestSpark.sf001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet)
    val b1 = LlmVectorOps.similarityTopkB1(s, TestSpark.sf001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet)
    assert(got.length == exact.size)
    got.foreach { r =>
      val pid = r.getLong(0)
      val hit = exact(pid).intersect(b1(pid)).size.toLong
      assert(r.getLong(1) == hit, s"n_hit for $pid")
      assert(r.getLong(2) == exact(pid).size.toLong)
      assert(r.getDouble(3) == q6(hit.toDouble / exact(pid).size.toDouble))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("ship_delay_stats == driver-side day-diff recomputation per priority") {
    val s = spark
    val got = graft.operators.RelationalOps
      .shipDelayStats(s, TestSpark.sf001).collect()
    val li = Tables.lineitem(s, TestSpark.sf001)
      .select(col("l_orderkey"), to_date(col("l_shipdate"))).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val ord = Tables.orders(s, TestSpark.sf001)
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate"))).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDate(2).toLocalDate))
      .toMap
    val delays = li.flatMap { case (ok, ship) =>
      ord.get(ok).map { case (pri, od) =>
        (pri, java.time.temporal.ChronoUnit.DAYS.between(od, ship))
      }
    }
    def pct(xs: Seq[Double], p: Double): Double = {
      val sorted = xs.sorted
      val r = p * (sorted.length - 1)
      val lo = sorted(r.toInt)
      val hi = sorted(math.min(r.toInt + 1, sorted.length - 1))
      lo + (r - r.toInt) * (hi - lo)
    }
    val expected = delays.groupBy(_._1).map { case (pri, xs) =>
      val ds = xs.map(_._2)
      pri -> (ds.length.toLong, ds.min, ds.max,
        q6(ds.sum.toDouble / ds.length.toDouble),
        q6(pct(ds.map(_.toDouble), 0.5)), q6(pct(ds.map(_.toDouble), 0.9)))
    }
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert(r.getLong(1) == e._1 && r.getLong(2) == e._2
        && r.getLong(3) == e._3)
      assert(r.getDouble(4) == e._4, "mean_days")
      assert(r.getDouble(5) == e._5, "p50_days")
      assert(r.getDouble(6) == e._6, "p90_days")
    }
  }

  test("revenue_concentration == driver-side Pareto recomputation") {
    val s = spark
    val got = graft.operators.RelationalOps
      .revenueConcentration(s, TestSpark.sf001).collect()
    assert(got.length == 1)
    val perCust = Tables.orders(s, TestSpark.sf001)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1)
      .map { case (ck, xs) =>
        (ck, (xs.map(_._2).sum * 100).toLongExact)
      }.toSeq
    val n = perCust.length.toLong
    val total = perCust.map(_._2).sum
    val asc = perCust.sortBy { case (ck, c) => (c, ck) }
    val wsum = asc.zipWithIndex.map { case ((_, c), i) =>
      BigInt(i + 1) * BigInt(c)
    }.sum
    val k = (n + 9) / 10
    val topk = perCust.sortBy { case (ck, c) => (-c, ck) }
      .take(k.toInt).map(_._2).sum
    val r = got.head
    assert(r.getLong(0) == n, "n_customers")
    assert(r.getLong(1) == total, "total_cents")
    assert(r.getDouble(2) == q6(topk.toDouble / total.toDouble),
      "top_decile_share")
    assert(r.getDouble(3) ==
      q6((BigInt(2) * wsum - BigInt(n + 1) * BigInt(total)).toDouble
        / (BigInt(n) * BigInt(total)).toDouble), "gini")
    assert(r.getDouble(2) >= 0.1 - 1e-6 && r.getDouble(2) <= 1.0)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
  }

  test("market_hhi == driver-side concentration recomputation") {
    val s = spark
    val got = graft.operators.RelationalOps
      .marketHhi(s, TestSpark.sf001).collect()
    assert(got.length == 1)
    val cents = Tables.lineitem(s, TestSpark.sf001)
      .select(col("l_suppkey"), col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1)
      .map { case (_, xs) => (xs.map(_._2).sum * 100).toLongExact }
      .toSeq
    val n = cents.length.toLong
    val total = cents.sum
    val sq = cents.map(c => BigInt(c) * BigInt(c)).sum
    val r = got.head
    assert(r.getLong(0) == n && r.getLong(1) == total)
    assert(r.getDouble(2) ==
      q6(sq.toDouble / (BigInt(total) * BigInt(total)).toDouble), "hhi")
    assert(r.getDouble(3) ==
      q6((BigInt(total) * BigInt(total)).toDouble / sq.toDouble),
      "effective_n")
    assert(r.getDouble(4) ==
      q6(cents.max.toDouble / total.toDouble), "top_share")
    // sanity: 1/n <= hhi <= 1 and effective_n <= n
    assert(r.getDouble(2) >= 1.0 / n - 1e-9 && r.getDouble(2) <= 1.0)
    assert(r.getDouble(3) <= n + 1e-6)
  }

  test("lang_confusion == the langId predictions regrouped; shares normalize") {
    val s = spark
    val got = LlmTextOps.langConfusion(s, TestSpark.sf0001).collect()
    val preds = LlmTextOps.langId(s, TestSpark.sf0001).collect()
      .map(r => (r.getString(1), r.getString(3)))
    val counts = preds.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    val trueN = preds.groupBy(_._1).map { case (k, v) =>
      k -> v.length.toLong
    }
    assert(got.length == counts.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == counts(key))
      assert(r.getDouble(3) ==
        q6(counts(key).toDouble / trueN(key._1).toDouble))
    }
    got.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4,
        "per-true-class shares sum to ~1")
    }
  }

  test("centroid_drift == driver-side split-centroid recomputation") {
    val s = spark
    val got = LlmVectorOps.centroidDrift(s, TestSpark.sf0001).collect()
    val grid = (1L << 20).toDouble
    val vecs = Tables.embeddings(s, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def split(id: Long): String =
      if ((id % 1000000007L) * 2654435761L % 1000000007L % 10 < 8) "train"
      else "val"
    val expected = vecs.groupBy(_._3).flatMap { case (lbl, xs) =>
      val tr = xs.filter(v => split(v._1) == "train")
      val va = xs.filter(v => split(v._1) == "val")
      if (tr.isEmpty || va.isEmpty) None
      else {
        val dims = tr.head._2.length
        var dsum = 0L
        (0 until dims).foreach { dim =>
          def mean(part: Array[(Long, Array[Float], Int)]): Double = {
            val sq = part.map(v =>
              math.floor(v._2(dim).toDouble * grid + 0.5).toLong).sum
            sq.toDouble / (part.length * grid)
          }
          val dd = mean(tr) - mean(va)
          dsum += math.floor(dd * dd * 1.0e9 + 0.5).toLong
        }
        Some(lbl -> (tr.length.toLong, va.length.toLong,
          q6(math.sqrt(dsum.toDouble / 1.0e9))))
      }
    }
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getInt(0))
      assert(r.getLong(1) == e._1, "n_train")
      assert(r.getLong(2) == e._2, "n_val")
      assert(r.getDouble(3) == e._3, "drift_l2")
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("ngram_lm_score == driver-side smoothed-bigram recomputation") {
    val s = spark
    val got = LlmTextOps.ngramLmScore(s, TestSpark.sf001).collect()
    assert(got.length == 1)
    val docs = Tables.documents(s, TestSpark.sf001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 2)
    def bucket(id: Long) =
      (id % 1000000007L) * 2654435761L % 1000000007L % 10
    val train = docs.filter(d => bucket(d._1) < 8)
    val vals = docs.filter(d => bucket(d._1) == 8)
    val c2 = train.flatMap(_._2.sliding(2).map(_.mkString(" ")))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = train.flatMap(_._2)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val v = train.flatMap(_._2).distinct.length.toLong
    val lqs = vals.flatMap(_._2.sliding(2).filter(_.length == 2)).map { bg =>
      val big = bg.mkString(" ")
      val w1 = bg(0)
      math.floor(math.log(
        (c2.getOrElse(big, 0L) + 1).toDouble
          / (c1.getOrElse(w1, 0L) + v).toDouble) * 1e6 + 0.5).toLong
    }
    val r = got.head
    assert(r.getLong(0) == lqs.length.toLong, "n_bigrams")
    assert(r.getLong(1) == v, "vocab")
    assert(r.getDouble(2) ==
      q6(-lqs.sum.toDouble / lqs.length.toDouble / 1e6), "ln_ppl")
    assert(r.getDouble(2) > 0.0, "cross-entropy is positive")
  }

  test("quality_vs_dup splits dup/unique correctly on a pinned corpus") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qvd").toString
    // two copies of a low-diversity doc, two distinct richer docs
    val dupText = "the the the the the the the the"
    Seq(
      (1L, dupText, "en", "srcA", dupText.length.toLong),
      (2L, dupText, "en", "srcA", dupText.length.toLong),
      (3L, "a quick brown fox jumps over the lazy dog", "en", "srcB", 41L),
      (4L, "spark shuffles partitions of columnar batches", "en", "srcB", 45L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmTextOps.qualityVsDup(s, dir).collect()
      .map(r => r.getBoolean(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val quality = LlmTextOps.textQuality(s, dir)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(true)._1 == 2L && got(false)._1 == 2L)
    assert(got(true)._2 == q6((quality(1L) + quality(2L)) / 2.0))
    assert(got(false)._2 == q6((quality(3L) + quality(4L)) / 2.0))
    // the repeated-token duplicate scores below the diverse uniques
    assert(got(true)._2 < got(false)._2)
  }

  test("first_touch_mix == driver-side first-event recomputation") {
    val s = spark
    val got = AnalyticOps.firstTouchMix(s, TestSpark.sf001).collect()
    val firsts = Tables.events(s, TestSpark.sf001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._2)
      .map { case (_, rows) => rows.minBy(r => (r._3, r._1))._4 }
      .toSeq
    val counts = firsts.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    assert(got.length == counts.size)
    got.foreach { r =>
      assert(r.getLong(1) == counts(r.getString(0)))
      assert(r.getDouble(2) ==
        q6(counts(r.getString(0)).toDouble / firsts.length.toDouble))
    }
    assert(math.abs(got.map(_.getDouble(2)).sum - 1.0) < 1e-4)
  }

  test("top_dup_clusters matches the component membership it summarizes") {
    val s = spark
    val got = LlmTextOps.topDupClusters(s, TestSpark.sf0001).collect()
    val comp = SparkEntry.queries("dedup_components")(s, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sources = Tables.documents(s, TestSpark.sf0001)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = comp.groupBy(_._2).map { case (cid, xs) =>
      val ids = xs.map(_._1)
      cid -> (ids.length.toLong,
        ids.map(sources).distinct.length.toLong, ids.min, ids.max)
    }.toSeq.sortBy { case (cid, (sz, _, _, _)) => (-sz, cid) }.take(5)
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (cid, e)) =>
      assert(r.getLong(0) == cid, "component_id")
      assert(r.getLong(1) == e._1, "cluster_size")
      assert(r.getLong(2) == e._2, "n_sources")
      assert(r.getLong(3) == e._3, "representative")
      assert(r.getLong(4) == e._4, "sample_member")
      assert(r.getLong(0) == e._3, "representative IS the component id")
    }
  }

  test("dedup_impact stages nest and agree with the ops they summarize") {
    val s = spark
    val got = LlmTextOps.dedupImpact(s, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == Set("1_raw", "2_exact", "3_near"))
    val docs = Tables.documents(s, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rawDocs = docs.length.toLong
    val rawToks = docs.map(_._2.split(" ", -1).length.toLong).sum
    assert(got("1_raw")._1 == rawDocs && got("1_raw")._2 == rawToks)
    assert(got("1_raw")._3 == 1.0 && got("1_raw")._4 == 1.0)
    // exact stage == one doc per distinct text
    assert(got("2_exact")._1 == docs.map(_._2).distinct.length.toLong)
    // near stage == the dedup_survivors row count
    val survivors = SparkEntry.queries("dedup_survivors")(
      s, TestSpark.sf0001).count()
    assert(got("3_near")._1 == survivors, "near stage == survivors")
    // the funnel narrows monotonically
    assert(got("1_raw")._1 >= got("2_exact")._1)
    assert(got("2_exact")._1 >= got("3_near")._1
      || got("3_near")._1 <= got("1_raw")._1)
  }

  test("contrastive_pairs: positives share the label, negatives don't, margin checks out") {
    val s = spark
    val got = LlmVectorOps.contrastivePairs(s, TestSpark.sf001).collect()
    assert(got.length == 32)
    val vecs = Tables.embeddings(s, TestSpark.sf001)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val byId = vecs.map(v => v._1 -> v).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    got.foreach { r =>
      val (aid, lbl) = (r.getLong(0), r.getInt(1))
      val a = byId(aid)
      assert(a._3 == lbl, "anchor label")
      val pos = byId(r.getLong(2)); val neg = byId(r.getLong(4))
      assert(pos._3 == lbl, "positive must share the anchor label")
      assert(neg._3 != lbl, "negative must not share the anchor label")
      // best same/diff-label neighbor on the r6 grid with id tie-break
      val scored = vecs.filter(_._1 != aid)
        .map(v => (v._1, v._3, q6(cos(a._2, v._2))))
      val bestPos = scored.filter(_._2 == lbl)
        .sortBy { case (id, _, sc) => (-sc, id) }.head
      val bestNeg = scored.filter(_._2 != lbl)
        .sortBy { case (id, _, sc) => (-sc, id) }.head
      assert(r.getLong(2) == bestPos._1 && r.getDouble(3) == bestPos._3)
      assert(r.getLong(4) == bestNeg._1 && r.getDouble(5) == bestNeg._3)
      assert(r.getDouble(6) == q6(r.getDouble(3) - r.getDouble(5)), "margin")
    }
  }

  test("obv_indicator == driver-side signed-flow prefix sum") {
    val s = spark
    val got = AnalyticOps.obvIndicator(s, TestSpark.sf0001).collect()
    val events = Tables.events(s, TestSpark.sf0001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value").cast("double"),
        floor(col("value").cast("double") * lit(100.0) + lit(0.5))
          .cast("long"),
        coalesce(get_json_object(col("props"), "$.k").cast("long"),
          lit(0L)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))
    val expected = events.groupBy(_._3).toSeq.flatMap { case (sym, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      var obv = 0L
      val series = sorted.indices.map { i =>
        val flow =
          if (i == 0) 0L
          else {
            val dc = sorted(i)._5 - sorted(i - 1)._5
            if (dc > 0) sorted(i)._6
            else if (dc < 0) -sorted(i)._6
            else 0L
          }
        obv += flow
        (sorted(i)._1, sym, sorted(i)._4, sorted(i)._6, obv)
      }
      series.takeRight(20)
    }.map(t => t._1 -> t).toMap
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getLong(1))
      assert(r.getString(0) == e._2 && r.getDouble(2) == e._3)
      assert(r.getLong(3) == e._4, "vol")
      assert(r.getLong(4) == e._5, "obv")
    }
  }

  test("bollinger_bands == driver-side integer-moment recomputation") {
    val s = spark
    val got = AnalyticOps.bollingerBands(s, TestSpark.sf0001).collect()
    val events = Tables.events(s, TestSpark.sf0001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value").cast("double"),
        floor(col("value").cast("double") * lit(100.0) + lit(0.5))
          .cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    val expected = events.groupBy(_._3).toSeq.flatMap { case (sym, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      val full = sorted.indices.filter(_ >= 19).map { i =>
        val frame = sorted.slice(i - 19, i + 1).map(_._5)
        val sc = frame.sum
        val sc2 = frame.map(c => c * c).sum
        val mid = sc.toDouble / 2000.0
        val sd = math.sqrt((20L * sc2 - sc * sc).toDouble) / 2000.0
        (sorted(i)._1, sym, sorted(i)._4, q6(mid), q6(sd),
          q6(mid - 2.0 * sd), q6(mid + 2.0 * sd),
          if (sorted(i)._5.toDouble / 100.0 > mid + 2.0 * sd) 1 else 0,
          if (sorted(i)._5.toDouble / 100.0 < mid - 2.0 * sd) 1 else 0)
      }
      full.takeRight(20)
    }.map(t => t._1 -> t).toMap
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getLong(1))
      assert(r.getString(0) == e._2 && r.getDouble(2) == e._3)
      assert(r.getDouble(3) == e._4, "mid")
      assert(r.getDouble(4) == e._5, "sd20")
      assert(r.getDouble(5) == e._6, "lower")
      assert(r.getDouble(6) == e._7, "upper")
      assert(r.getInt(7) == e._8 && r.getInt(8) == e._9, "flags")
    }
  }

  test("stochastic_oscillator == driver-side frame-extrema recomputation") {
    val s = spark
    val got = AnalyticOps.stochasticOscillator(s, TestSpark.sf0001).collect()
    val events = Tables.events(s, TestSpark.sf0001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value").cast("double"),
        floor(col("value").cast("double") * lit(100.0) + lit(0.5))
          .cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    val expected = events.groupBy(_._3).toSeq.flatMap { case (sym, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      val full = sorted.indices.filter(_ >= 13).map { i =>
        val frame = sorted.slice(math.max(0, i - 13), i + 1).map(_._5)
        val l = frame.min; val h = frame.max
        (sorted(i)._1, sym, sorted(i)._4,
          l.toDouble / 100.0, h.toDouble / 100.0,
          if (h == l) None
          else Some(q6(100.0 * (sorted(i)._5 - l).toDouble
            / (h - l).toDouble)))
      }
      full.takeRight(20)
    }.map(t => t._1 -> t).toMap
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getLong(1))
      assert(r.getString(0) == e._2 && r.getDouble(2) == e._3)
      assert(r.getDouble(3) == e._4, "low14")
      assert(r.getDouble(4) == e._5, "high14")
      assert(Option(r.get(5)).map(_.asInstanceOf[Double]) == e._6, "pct_k")
    }
  }

  test("vwap_hourly == driver-side integer-fold recomputation") {
    val s = spark
    val got = AnalyticOps.vwapHourly(s, TestSpark.sf0001).collect()
    val events = Tables.events(s, TestSpark.sf0001)
      .select(date_trunc("hour", col("ts")).cast("long").as("h"),
        col("event_type"),
        floor(col("value").cast("double") * lit(100.0) + lit(0.5))
          .cast("long"),
        get_json_object(col("props"), "$.k").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    val expected = events
      .filter(e => e._4.exists(_ > 0))
      .groupBy(e => (e._1, e._2))
      .map { case (k, rows) =>
        val pv = rows.map(e => e._3 * e._4.get).sum
        val v = rows.map(_._4.get).sum
        k -> (rows.length.toLong, v, q6(pv.toDouble / (100.0 * v.toDouble)))
      }
    assert(got.length == expected.size)
    // re-key the Spark rows on (hour epoch-µs, symbol) via the same cast
    val gotKeyed = AnalyticOps.vwapHourly(s, TestSpark.sf0001)
      .withColumn("h",
        col("date").cast("timestamp").cast("long") + col("hour") * 3600L)
      .select("h", "symbol", "n_ticks", "total_vol", "vwap")
      .collect()
    gotKeyed.foreach { r =>
      val e = expected((r.getLong(0), r.getString(1)))
      assert(r.getLong(2) == e._1, "n_ticks")
      assert(r.getLong(3) == e._2, "total_vol")
      assert(r.getDouble(4) == e._3, "vwap")
    }
  }

  test("weighted_percentiles == driver-side multiset expansion") {
    val s = spark
    val got = AnalyticOps.weightedPercentiles(s, TestSpark.sf0001).collect()
    val rows = Tables.events(s, TestSpark.sf0001)
      .select(col("event_type"), col("value").cast("double"),
        get_json_object(col("props"), "$.k").cast("long"))
      .collect()
      .filter(r => !r.isNullAt(2) && r.getLong(2) > 0)
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100.0 + 0.5).toLong, r.getLong(2)))
    def interp(sorted: IndexedSeq[Long], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      if (frac == 0.0) sorted(lo).toDouble
      else sorted(lo) * (1.0 - frac) + sorted(lo + 1) * frac
    }
    val expected = rows.groupBy(_._1).map { case (sym, rs) =>
      val expanded = rs.flatMap(r => Seq.fill(r._3.toInt)(r._2))
        .sorted.toIndexedSeq
      sym -> (rs.length.toLong, rs.map(_._3).sum,
        q6(interp(expanded, 0.1) / 100.0),
        q6(interp(expanded, 0.5) / 100.0),
        q6(interp(expanded, 0.9) / 100.0))
    }
    assert(got.length == expected.size && got.nonEmpty)
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert(r.getLong(1) == e._1 && r.getLong(2) == e._2)
      assert(r.getDouble(3) == e._3, "wp10")
      assert(r.getDouble(4) == e._4, "wp50")
      assert(r.getDouble(5) == e._5, "wp90")
    }
  }

  test("peak_detection == driver-side strict-maxima census") {
    val s = spark
    val got = AnalyticOps.peakDetection(s, TestSpark.sf0001).collect()
    val events = Tables.events(s, TestSpark.sf0001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        math.floor(r.getDouble(3) * 100.0 + 0.5).toLong))
    val expected = events.groupBy(_._3).map { case (sym, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      val peaks = sorted.indices.drop(1).dropRight(1).filter { i =>
        sorted(i)._4 > sorted(i - 1)._4 && sorted(i)._4 > sorted(i + 1)._4
      }
      val proms = peaks.map(i => math.min(sorted(i)._4 - sorted(i - 1)._4,
        sorted(i)._4 - sorted(i + 1)._4))
      val gap = if (peaks.length > 1)
        Some(q6((sorted(peaks.last)._2 - sorted(peaks.head)._2).toDouble
          / 1e6 / (peaks.length - 1).toDouble))
      else None
      sym -> (sorted.length.toLong, peaks.length.toLong,
        q6(proms.max.toDouble / 100.0),
        q6(proms.sum.toDouble / 100.0 / peaks.length.toDouble), gap)
    }
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert(r.getLong(1) == e._1 && r.getLong(2) == e._2)
      assert(r.getDouble(3) == e._3, "max_prominence")
      assert(r.getDouble(4) == e._4, "mean_prominence")
      e._5.foreach(g => assert(r.getDouble(5) == g, "mean_gap"))
    }
  }

  test("runs_test == driver-side Wald–Wolfowitz recomputation; |z| sane") {
    val s = spark
    val got = AnalyticOps.runsTest(s, TestSpark.sf0001).collect()
    val events = Tables.events(s, TestSpark.sf0001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        math.floor(r.getDouble(3) * 100.0 + 0.5).toLong))
    val expected = events.groupBy(_._3).map { case (sym, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      val sgns = sorted.indices.drop(1)
        .map(i => sorted(i)._4 - sorted(i - 1)._4)
        .filter(_ != 0L).map(m => if (m > 0) 1 else -1)
      val n = sgns.length
      val nUp = sgns.count(_ > 0).toLong
      val nDown = sgns.count(_ < 0).toLong
      val runs = 1L + sgns.sliding(2).count {
        case Seq(a, b) => a != b
        case _ => false
      }
      val nD = n.toDouble
      val twoPN = 2.0 * nUp.toDouble * nDown.toDouble
      val mu = twoPN / nD + 1.0
      val sigma = math.sqrt(twoPN * (twoPN - nD) / (nD * nD * (nD - 1.0)))
      sym -> (n.toLong, nUp, nDown, runs, q6((runs.toDouble - mu) / sigma))
    }
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((e._1, e._2, e._3, e._4)))
      assert(r.getDouble(5) == e._5, s"z for ${r.getString(0)}")
      // a random-walk synthetic feed should not be wildly non-random
      assert(math.abs(r.getDouble(5)) < 30.0)
    }
  }

  test("rolling_median == driver-side p·(n−1) interpolation over the centi frame") {
    val s = spark
    val got = AnalyticOps.rollingMedian(s, TestSpark.sf0001).collect()
    val events = Tables.events(s, TestSpark.sf0001)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        math.floor(r.getDouble(3) * 100.0 + 0.5).toLong))
    def interp(sorted: IndexedSeq[Long], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      val frac = pos - lo
      if (frac == 0.0) sorted(lo).toDouble
      else sorted(lo) * (1.0 - frac) + sorted(lo + 1) * frac
    }
    val expected = events.groupBy(_._3).toSeq.flatMap { case (sym, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._1))
      val full = sorted.indices.filter(_ >= 19).map { i =>
        val frame = ((i - 19) to i).map(sorted(_)._4).sorted
        (sorted(i)._1, sym, sorted(i)._4,
          interp(frame, 0.25), interp(frame, 0.5), interp(frame, 0.75))
      }
      full.takeRight(20)
    }.map(t => t._1 -> t).toMap
    assert(got.length == expected.size && got.nonEmpty)
    got.foreach { r =>
      val e = expected(r.getLong(1))
      assert(r.getString(0) == e._2)
      assert(r.getDouble(2) == q6(e._3.toDouble / 100.0), "price")
      assert(r.getDouble(3) == q6(e._5 / 100.0), "median")
      assert(r.getDouble(4) == q6(e._4 / 100.0), "q1")
      assert(r.getDouble(5) == q6(e._6 / 100.0), "q3")
      assert(r.getDouble(6) == q6((e._6 - e._4) / 100.0), "iqr")
    }
  }
}
