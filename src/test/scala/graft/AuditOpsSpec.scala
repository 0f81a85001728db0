package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.{AnalyticOps, AuditOps}

/** Round-7 sixth wave: the data-engineering audit surface. The gated
  * corpus is clean, so beyond mirroring the DuckDB gate these tests
  * prove the rules FIRE: every dq rule on an injected violation, the
  * CDC classes against a driver-side replay of the hash slices, the
  * backtest against a driver-side seasonal-naive fold.
  */
class AuditOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("dq_audit on the clean corpus: every rule passes, checked counts exact") {
    val got = AuditOps.dqAudit(spark, sf).collect()
    assert(got.length == 9)
    assert(got.forall(_.getString(3) == "pass"))
    assert(got.forall(_.getLong(1) == 0L))
    val nLi = Tables.lineitem(spark, sf).count()
    val nOrd = Tables.orders(spark, sf).count()
    got.foreach { r =>
      val expect = if (r.getString(0).startsWith("lineitem")) nLi else nOrd
      assert(r.getLong(2) == expect, r.getString(0))
    }
  }

  test("dq_audit: every rule fires on an injected violation") {
    val s = spark
    import s.implicits._
    val li = Seq(
      // clean row
      (Some(1L), Some(10L), Some(5L), 100.0, 0.05, "A"),
      // null part key                         → lineitem_null_keys
      (Some(1L), None, Some(5L), 100.0, 0.05, "N"),
      // nonpositive price
      (Some(1L), Some(11L), Some(5L), 0.0, 0.05, "R"),
      // discount out of range
      (Some(1L), Some(12L), Some(5L), 100.0, 1.5, "A"),
      // bad returnflag domain
      (Some(1L), Some(13L), Some(5L), 100.0, 0.05, "X"),
      // orphan orderkey
      (Some(99L), Some(14L), Some(5L), 100.0, 0.05, "A"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount", "l_returnflag")
    val ord = Seq(
      (Some(1L), Some(7L), "F"),   // clean
      (Some(2L), None, "O"),       // null custkey
      (Some(3L), Some(7L), "Z"),   // bad status
      (Some(3L), Some(7L), "F"),   // dup pk (with previous row)
      (Some(4L), Some(999L), "O")) // orphan custkey
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val cust = Seq(7L).toDF("c_custkey")
    val got = AuditOps.dqAuditFrames(li, ord, cust).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(got("lineitem_null_keys") == ((1L, "fail")))
    assert(got("lineitem_nonpositive_price") == ((1L, "fail")))
    assert(got("lineitem_discount_range") == ((1L, "fail")))
    assert(got("lineitem_returnflag_domain") == ((1L, "fail")))
    assert(got("lineitem_orphan_orderkey") == ((1L, "fail")))
    assert(got("orders_null_custkey") == ((1L, "fail")))
    assert(got("orders_status_domain") == ((1L, "fail")))
    assert(got("orders_dup_pk") == ((1L, "fail")))
    // orphan custkey: null custkey row is NOT an orphan (left_anti
    // keeps it — counted), plus custkey 999: the anti join keeps
    // both the null row and 999 → 2
    assert(got("orders_orphan_custkey") == ((2L, "fail")))
  }

  test("cdc_snapshot_diff == driver-side hash-slice replay") {
    val got = AuditOps.cdcSnapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val P = 1000000007L
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map { r =>
        val k = r.getLong(0)
        val cents = (BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
        val h10 = ((k % P) * 2654435761L % P) % 10
        val h7 = ((k % P) * 1779033703L % P) % 7
        (k, cents, h10, h7)
      }
    var ins = (0L, 0L, 0L); var del = (0L, 0L, 0L)
    var upd = (0L, 0L, 0L); var unc = (0L, 0L, 0L)
    rows.foreach { case (_, cents, h10, h7) =>
      val newCents = cents + (if (h7 == 0) cents / 10 else 0L)
      if (h10 == 0) ins = (ins._1 + 1, ins._2, ins._3 + newCents)
      else if (h10 == 9) del = (del._1 + 1, del._2 + cents, del._3)
      else if (newCents != cents)
        upd = (upd._1 + 1, upd._2 + cents, upd._3 + newCents)
      else unc = (unc._1 + 1, unc._2 + cents, unc._3 + newCents)
    }
    assert(got("insert") == ins)
    assert(got("delete") == del)
    assert(got("update") == upd)
    assert(got("unchanged") == unc)
    // class partition covers every key exactly once
    assert(got.values.map(_._1).sum == rows.length)
  }

  test("pii_scrub: clean corpus reports zero; every pattern fires on injected PII with exact redaction volume") {
    val clean = graft.operators.LlmTextOps.piiScrub(spark, sf).collect()
    assert(clean.nonEmpty)
    clean.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L &&
        r.getLong(4) == 0L && r.getLong(5) == 0L && r.getLong(6) == 0L,
        s"synthetic corpus must be PII-free: $r")
    }
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("web", "no pii here at all"),
      ("web", "contact bob.smith+x@example.co.uk today"),
      ("web", "call +1 555-867-5309 or 555 123-4567"),
      ("books", "server at 10.0.255.3 and 192.168.1.1 up"),
      ("books", "mix: a@b.io via 8.8.8.8 at 555-000-1111"))
      .toDF("source", "text")
    val got = graft.operators.LlmTextOps.piiScrubFrames(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // independent driver-side recomputation with java.util.regex —
    // the same engine family Spark compiles, but a separate code path
    val pats = graft.operators.LlmTextOps.piiPatterns.map {
      case (n, p) => n -> p.r
    }.toMap
    def census(rows: Seq[(String, String)]) = {
      val n = rows.length.toLong
      val per = rows.map { case (_, t) =>
        val e = pats("email").findAllIn(t).length
        val p = pats("phone").findAllIn(t).length
        val i = pats("ipv4").findAllIn(t).length
        val scrubbed = pats("ipv4").replaceAllIn(
          pats("phone").replaceAllIn(
            pats("email").replaceAllIn(t, ""), ""), "")
        (e, p, i, t.length - scrubbed.length)
      }
      (n, per.count(x => x._1 + x._2 + x._3 > 0).toLong,
        per.map(_._1).sum.toLong, per.map(_._2).sum.toLong,
        per.map(_._3).sum.toLong, per.map(_._4).sum.toLong)
    }
    val docRows = Seq(
      ("web", "no pii here at all"),
      ("web", "contact bob.smith+x@example.co.uk today"),
      ("web", "call +1 555-867-5309 or 555 123-4567"),
      ("books", "server at 10.0.255.3 and 192.168.1.1 up"),
      ("books", "mix: a@b.io via 8.8.8.8 at 555-000-1111"))
    assert(got("web") == census(docRows.filter(_._1 == "web")))
    assert(got("books") == census(docRows.filter(_._1 == "books")))
    // each class individually fired somewhere
    assert(got.values.map(_._3).sum > 0, "emails fired")
    assert(got.values.map(_._4).sum > 0, "phones fired")
    assert(got.values.map(_._5).sum > 0, "ipv4s fired")
  }

  test("pii_scrub_injected: exactly 2 emails / 2 phones / 2 ipv4s per doc; near-misses silent") {
    // the cross-engine regex equivalence itself is hash-gated by the
    // DuckDB oracle (same piiInjectedTextSql, same patterns); this
    // pins the fixture's INTENT so a fixture edit that stops
    // exercising a rule (or starts matching a near-miss) fails loudly
    val got = graft.operators.LlmTextOps.piiScrubInjected(spark, sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nDocs, withPii, e, p, i) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))
      assert(withPii == nDocs, s"every injected doc carries PII: $r")
      assert(e == 2 * nDocs, s"2 emails per doc (greedy-class + paren): $r")
      assert(p == 2 * nDocs, s"2 phones per doc (+dash form + space form): $r")
      assert(i == 2 * nDocs,
        s"2 ipv4s per doc (chain \\b + end-of-string; 999.999.999.9999 silent): $r")
      assert(r.getLong(6) > 0, s"redaction volume positive: $r")
    }
  }

  test("cohort_ltv == driver-side cumulative cohort replay; curve monotone") {
    val got = AnalyticOps.cohortLtv(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .collect()
      .map { r =>
        val d = r.getAs[java.time.LocalDateTime](1).toLocalDate
        val q = d.withDayOfMonth(1).withMonth((d.getMonthValue - 1) / 3 * 3 + 1)
        (r.getLong(0), q,
          (BigDecimal(r.getDouble(2)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
      }
    val cohortOf = orders.groupBy(_._1).map { case (ck, os) =>
      ck -> os.map(_._2).minBy(_.toEpochDay)
    }
    val sizes = cohortOf.values.groupBy(identity).map { case (q, xs) =>
      q -> xs.size.toLong
    }
    val aged = orders.groupBy { o =>
      val cq = cohortOf(o._1)
      (cq, java.time.temporal.ChronoUnit.MONTHS.between(cq, o._2) / 3)
    }.map { case (k, os) =>
      k -> (os.map(_._3).sum, os.size.toLong)
    }
    val expected = aged.keys.toSeq.sortBy(k => (k._1.toEpochDay, k._2))
      .groupBy(_._1).flatMap { case (cq, ks) =>
        var run = 0L
        ks.sortBy(_._2).map { k =>
          run += aged(k)._1
          k -> (sizes(cq), aged(k)._2, aged(k)._1, run,
            math.floor(run.toDouble / 100.0 / sizes(cq).toDouble
              * 1e6 + 0.5) / 1e6)
        }
      }
    assert(got == expected)
    // cumulative revenue is monotone non-decreasing along each curve
    got.groupBy(_._1._1).foreach { case (_, rows) =>
      val curve = rows.toSeq.sortBy(_._1._2).map(_._2._4)
      assert(curve == curve.sorted)
    }
  }

  test("above_avg_orders == driver-side cross-multiplied cut replay") {
    val got = AnalyticOps.aboveAvgOrders(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def d2(x: Double) = BigDecimal(x).setScale(2,
      BigDecimal.RoundingMode.HALF_UP)
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), d2(r.getDouble(1))))
    val stats = orders.groupBy(_._1).map { case (ck, os) =>
      ck -> (os.map(_._2).sum, os.length)
    }
    val seg = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val above = orders.filter { case (ck, p) =>
      val (psum, n) = stats(ck); p * n > psum
    }
    val expected = above.groupBy(o => seg(o._1)).map { case (sg, os) =>
      sg -> (os.length.toLong,
        os.map(o => o._2.setScale(6)).sum.toDouble)
    }
    assert(got == expected)
  }

  test("active_users_7d == driver-side rolling distinct replay") {
    val got = AnalyticOps.activeUsers7d(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> (r.getLong(1), r.getLong(2)))
      .toMap
    val pres = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate)).toSet
    val days = pres.map(_._2)
    val expected = days.map { d =>
      val dau = pres.count(_._2 == d).toLong
      val wau = pres.filter { case (_, pd) =>
        !pd.isAfter(d) && !pd.isBefore(d.minusDays(6))
      }.map(_._1).size.toLong
      d -> (dau, wau)
    }.toMap
    assert(got == expected)
    // WAU dominates DAU everywhere
    got.values.foreach { case (dau, wau) => assert(wau >= dau) }
  }

  test("corpus_datacard == driver-side metric replay; card consistent with itself") {
    val got = graft.operators.LlmTextOps.corpusDatacard(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("lang"), col("n_chars"), col("text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Number](2).longValue, r.getString(3)))
    val toks = docs.map(_._4.split(" ", -1).length.toLong)
    assert(got("n_docs") == docs.length.toDouble)
    assert(got("n_sources") == docs.map(_._1).distinct.length.toDouble)
    assert(got("n_langs") == docs.map(_._2).distinct.length.toDouble)
    assert(got("total_chars") == docs.map(_._3).sum.toDouble)
    assert(got("total_tokens") == toks.sum.toDouble)
    assert(got("vocab_size") ==
      docs.flatMap(_._4.split(" ", -1)).distinct.length.toDouble)
    assert(got("exact_dup_docs") ==
      (docs.length - docs.map(_._4).distinct.length).toDouble)
    // internal consistency: derived rows recompute from the card
    def q6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got("mean_doc_tokens") ==
      q6d(got("total_tokens") / got("n_docs")))
    assert(got("exact_dup_pct") ==
      q6d(100.0 * got("exact_dup_docs") / got("n_docs")))
  }

  test("zone_map_stats: bounds exact; unclustered price column skips nothing") {
    val got = graft.operators.RelationalOps.zoneMapStats(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .select(col("l_shipdate"), col("l_orderkey"), col("l_extendedprice"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate
        .withDayOfMonth(1), r.getLong(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong))
    val expected = li.groupBy(_._1).map { case (m, xs) =>
      m -> (xs.length.toLong, xs.map(_._2).min, xs.map(_._2).max,
        xs.map(_._3).min, xs.map(_._3).max)
    }
    assert(got.length == expected.size)
    got.foreach { r =>
      val e = expected(r.getDate(0).toLocalDate)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == e)
      assert(r.getBoolean(6) == (e._5 < 2000000L || e._4 > 4000000L))
    }
    assert(got.map(_.getLong(1)).sum == li.length.toLong)
    // the honest negative: prices span every month on this corpus
    assert(got.forall(!_.getBoolean(6)),
      "unclustered price column unexpectedly skippable")
  }

  test("cumulative_reach == first-appearance replay; ends at total distinct users") {
    val got = AnalyticOps.cumulativeReach(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    val pres = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val firstDay = pres.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).minBy(_.toEpochDay)
    }
    val newPerDay = firstDay.values.groupBy(identity).map {
      case (d0, xs) => d0 -> xs.size.toLong
    }
    val days = pres.map(_._2).distinct.sortBy(_.toEpochDay)
    var run = 0L
    val expected = days.map { d0 =>
      val n = newPerDay.getOrElse(d0, 0L); run += n; (d0, n, run)
    }.toSeq
    assert(got.toSeq == expected)
    assert(got.last._3 == firstDay.size.toLong)
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted)
  }

  test("forecast_backtest == driver-side seasonal-naive fold") {
    val got = AnalyticOps.forecastBacktest(spark, sf).collect()
    val ticks = Tables.ticks(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("symbol"), col("price"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val hourly = ticks.groupBy(t => (t._2, t._1 / 3600000000L))
      .map { case ((sym, h), ts0) =>
        val close = ts0.maxBy(_._1)._3
        ((sym, h), math.floor(close * 100.0 + 0.5).toLong)
      }
    val scored = hourly.toSeq.flatMap { case ((sym, h), close) =>
      hourly.get((sym, h - 24)).map { pred =>
        val ape = if (close > 0)
          Some(math.floor(math.abs(close - pred).toDouble / close.toDouble
            * 1e6 + 0.5).toLong)
        else None
        (sym, math.abs(close - pred), close - pred, ape)
      }
    }
    val expected = scored.groupBy(_._1).map { case (sym, xs) =>
      val n = xs.length.toLong
      val nApe = xs.count(_._4.isDefined).toLong
      sym -> (n, nApe,
        math.floor(xs.map(_._2).sum.toDouble / (100.0 * n) * 1e6 + 0.5) / 1e6,
        math.floor(xs.map(_._3).sum.toDouble / (100.0 * n) * 1e6 + 0.5) / 1e6,
        math.floor(xs.flatMap(_._4).sum.toDouble / 10000.0 / nApe
          * 1e6 + 0.5) / 1e6)
    }
    assert(got.length == expected.size && got.nonEmpty)
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert(r.getLong(1) == e._1, s"n_pred ${r.getString(0)}")
      assert(r.getLong(2) == e._2, s"n_ape ${r.getString(0)}")
      assert(r.getDouble(3) == e._3, s"mae ${r.getString(0)}")
      assert(r.getDouble(4) == e._4, s"bias ${r.getString(0)}")
      assert(r.getDouble(5) == e._5, s"mape ${r.getString(0)}")
    }
  }

  test("key_skew_audit == driver count-profile replay") {
    def profile(counts: Seq[Long]): (Long, Long, Long, Long) = {
      val sorted = counts.sorted(Ordering[Long].reverse)
      (counts.sum, counts.size.toLong, sorted.head, sorted.take(10).sum)
    }
    val ev = profile(Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getLong(1)).toSeq)
    val li = profile(Tables.lineitem(spark, sf).groupBy("l_partkey")
      .count().collect().map(_.getLong(1)).toSeq)
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = AuditOps.keySkewAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("events.user_id", "lineitem.l_partkey"))
    Seq("events.user_id" -> ev, "lineitem.l_partkey" -> li).foreach {
      case (k, (n, keys, mx, t10)) =>
        val r = got(k)
        assert(r.getLong(1) == n && r.getLong(2) == keys, s"$k counts")
        assert(r.getLong(3) == mx && r.getLong(4) == t10, s"$k tops")
        assert(math.abs(r.getDouble(5) - r6d(mx.toDouble / n)) < 2e-6)
        assert(math.abs(r.getDouble(6) - r6d(t10.toDouble / n)) < 2e-6)
        // shares are ordered and within [0, 1]
        assert(r.getDouble(5) <= r.getDouble(6) + 1e-9)
        assert(r.getDouble(6) <= 1.0 + 1e-9)
    }
  }

  test("scd2_history == driver gaps-and-islands replay; interval invariants") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // driver replay: per-user runs of equal event_type under the
    // (us, event_id) total order
    val expected = events.groupBy(_._1).flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val runs = sorted.foldLeft(List.empty[(String, Long, Long)]) {
        case (acc, (_, _, us, tpe)) => acc match {
          case (t, from, n) :: rest if t == tpe => (t, from, n + 1) :: rest
          case _ => (tpe, us, 1L) :: acc
        }
      }.reverse
      runs.zipWithIndex.map { case ((tpe, from, n), i) =>
        val to = if (i + 1 < runs.size) Some(runs(i + 1)._2) else None
        (uid, (i + 1).toLong) -> ((tpe, from, to, n))
      }
    }
    val got = AuditOps.scd2History(spark, sf).collect()
    assert(got.length == expected.size && got.nonEmpty)
    val currents = scala.collection.mutable.Map.empty[Long, Long]
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val e = expected(key)
      assert(r.getString(2) == e._1, s"$key attr")
      assert(r.getLong(3) == e._2, s"$key from")
      assert((if (r.isNullAt(4)) None else Some(r.getLong(4))) == e._3,
        s"$key to")
      assert(r.getBoolean(5) == e._3.isEmpty, s"$key is_current")
      assert(r.getLong(6) == e._4, s"$key n_events")
      if (r.getBoolean(5))
        currents(r.getLong(0)) = currents.getOrElse(r.getLong(0), 0L) + 1L
      // half-open interval: from strictly before to (ties impossible:
      // the successor island starts at a LATER sequence position with
      // us >= from, and equal us would merge into one run only if the
      // type matched)
      if (!r.isNullAt(4)) assert(r.getLong(3) <= r.getLong(4), s"$key order")
    }
    // exactly one open (current) version per user
    val users = events.map(_._1).distinct
    assert(currents.size == users.length && currents.values.forall(_ == 1L))
  }
}
