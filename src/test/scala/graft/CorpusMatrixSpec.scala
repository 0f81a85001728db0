package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmTextOps

/** Round-8 wave-7 corpus-curation operators: the cross-source
  * contamination matrix, per-language tokenizer fertility, and the
  * length-curriculum stage datacard. Each test recomputes the result
  * from first principles on the driver (Scala collections, no Spark
  * windows) — decorrelated from both the Spark plan and the DuckDB
  * oracle SQL the hash gate uses.
  */
class CorpusMatrixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("dedup_cross_source == driver replay over the verified pair stream") {
    val s = spark
    val sf = TestSpark.sf001 // sf0.001 has too few cross-source pairs
    val srcOf = graft.engine.Tables.documents(s, sf)
      .select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = LlmTextOps.dedupNearPairs(s, sf)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs
      .map { case (i, j) =>
        val (a, b) = (srcOf(i), srcOf(j))
        ((if (a <= b) a else b, if (a <= b) b else a), (i, j))
      }
      .groupBy(_._1)
      .map { case (k, rows) =>
        val docs = rows.flatMap { case (_, (i, j)) => Seq(i, j) }.distinct
        (k._1, k._2, rows.length.toLong, docs.length.toLong)
      }.toSet
    val got = LlmTextOps.dedupCrossSource(s, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // the matrix partitions the pair stream: totals must reconcile
    assert(got.toSeq.map(_._3).sum == pairs.length.toLong)
    assert(got.nonEmpty && got.exists(t => t._1 != t._2),
      "no off-diagonal (cross-source) contamination found — not probative")
  }

  test("tokenizer_fertility == per-doc Scala accounting, exact integers") {
    val s = spark
    val docs = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .select("lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val re = "[a-z0-9]+".r
    val expected = docs.groupBy(_._1).map { case (lang, rows) =>
      val ws = rows.map(_._2.split(" ", -1).length.toLong).sum
      val rt = rows.map(t => re.findAllIn(t._2).size.toLong).sum
      val ch = rows.map(_._2.length.toLong).sum
      (lang, rows.length.toLong, ws, rt, ch,
        r6(rt.toDouble / ws.toDouble), r6(ch.toDouble / rt.toDouble))
    }.toSet
    val got = LlmTextOps.tokenizerFertility(s, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("heaps_law == driver first-appearance regression replay") {
    val s = spark
    val docs = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .select("source", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def lnq(v: Long): Long =
      math.floor(math.log(v.toDouble) * 1.0e9 + 0.5).toLong
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val seen = scala.collection.mutable.Set.empty[String]
      var (cumT, cumV) = (0L, 0L)
      val ckpts = rows.sortBy(_._2).map { case (_, _, text) =>
        val toks = text.split(" ", -1)
        cumT += toks.length
        cumV += toks.distinct.count(seen.add)
        (lnq(cumT), lnq(cumV))
      }
      val n = ckpts.length.toLong
      val sx = ckpts.map(_._1).map(BigInt(_)).sum
      val sy = ckpts.map(_._2).map(BigInt(_)).sum
      val sxy = ckpts.map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val sxx = ckpts.map { case (x, _) => BigInt(x) * BigInt(x) }.sum
      val beta = r6((BigInt(n) * sxy - sx * sy).toDouble
        / (BigInt(n) * sxx - sx * sx).toDouble)
      (src, n, cumT, cumV, beta)
    }.toSet
    val got = LlmTextOps.heapsLaw(s, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // the synthetic 30-word vocabulary saturates in the first docs,
    // so beta sits near 0 (exactly what the metric is FOR — this
    // corpus is all boilerplate by construction); sublinear always
    assert(got.forall(_._5 < 1.0))
  }

  test("doc_features: one row per doc; split/dup/size from first principles") {
    val s = spark
    val sf = TestSpark.sf001
    val removed = LlmTextOps.dedupNearPairs(s, sf)
      .select("j").collect().map(_.getLong(0)).toSet
    val quality = LlmTextOps.textQuality(s, sf)
      .select("doc_id", "quality_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val docs = graft.engine.Tables.documents(s, sf)
      .select("doc_id", "lang", "source", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val got = LlmTextOps.docFeatures(s, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == docs.length, "one row per doc")
    docs.foreach { case (id, lang, source, text) =>
      val row = got(id)
      assert(row.getString(1) == lang && row.getString(2) == source)
      assert(row.getLong(3) == text.split(" ", -1).length.toLong, s"doc $id")
      assert(row.getDouble(7) == quality(id), s"doc $id quality")
      val bucket = ((id % 1000000007L) * 2654435761L % 1000000007L) % 10L
      val split = if (bucket < 8) "train" else if (bucket == 8) "val" else "test"
      assert(row.getString(8) == split, s"doc $id split")
      assert(row.getBoolean(9) == removed(id), s"doc $id dup flag")
    }
  }

  test("curriculum_bins == driver NTILE replay; brackets ordered, sizes even") {
    val s = spark
    val docs = graft.engine.Tables.documents(s, TestSpark.sf0001)
      .select("lang", "doc_id", "text")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ", -1).length.toLong))
    // NTILE(4): first (n mod 4) stages get ceil(n/4) rows, rest floor
    val expected = docs.groupBy(_._1).flatMap { case (lang, rows) =>
      val sorted = rows.sortBy(t => (t._3, t._2))
      val n = sorted.length
      val (q, rem) = (n / 4, n % 4)
      val bounds = (0 to 4).map(k => k * q + math.min(k, rem))
      (1 to 4).filter(st => bounds(st) > bounds(st - 1)).map { st =>
        val slice = sorted.slice(bounds(st - 1), bounds(st))
        (lang, st, slice.length.toLong, slice.map(_._3).sum,
          slice.map(_._3).min, slice.map(_._3).max)
      }
    }.toSet
    val got = LlmTextOps.curriculumBins(s, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // curriculum property: stage brackets are non-overlapping and
    // monotone — stage k's max never exceeds stage k+1's min
    got.groupBy(_._1).foreach { case (lang, rows) =>
      val byStage = rows.toSeq.sortBy(_._2)
      byStage.sliding(2).foreach {
        case Seq(a, b) => assert(a._6 <= b._5, s"$lang: ${a._2} -> ${b._2}")
        case _ =>
      }
    }
  }
}
