package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LlmTextOps, LlmVectorOps}

/** Round-8 wave-8 evaluation operators: the kNN confusion matrix, the
  * O(n·d) exact isotropy scalar, and held-out n-gram coverage. Each
  * test recomputes the result from first principles on the driver —
  * for embedding_isotropy that means the O(n²) pairwise definition the
  * linear-algebra identity replaces, so the test proves the identity,
  * not just the plumbing.
  */
class EmbedEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def embs(sf: String): Array[(Long, Array[Double], Int)] =
    graft.engine.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label")
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(_.toDouble), r.getInt(2)))

  test("knn_confusion == brute-force driver vote replay at sf0.001") {
    val e = embs(TestSpark.sf0001)
    val norm = e.map { case (id, v, _) =>
      id -> math.sqrt(v.map(x => x * x).sum)
    }.toMap
    val labelOf = e.map(t => t._1 -> t._3).toMap
    val preds = e.filter(_._1 < 64L).map { case (pid, pv, plab) =>
      val scored = e.filter(_._1 != pid).map { case (id, v, _) =>
        val dot = pv.zip(v).map { case (a, b) => a * b }.sum
        (id, r6(dot / (norm(pid) * norm(id))))
      }
      val top10 = scored.sortBy { case (id, sc) => (-sc, id) }.take(10)
      val votes = top10.groupBy(t => labelOf(t._1)).view.mapValues(_.length)
      val pred = votes.toSeq.sortBy { case (lab, n) => (-n, lab) }.head._1
      (plab, pred)
    }
    val expected = preds.groupBy(identity).map { case ((t, p), rows) =>
      (t, p, rows.length.toLong)
    }
    val byTrue = expected.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    val withShare = expected.map { case (t, p, n) =>
      (t, p, n, r6(n.toDouble / byTrue(t).toDouble))
    }.toSet
    val got = LlmVectorOps.knnConfusion(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == withShare,
      s"missing=${withShare -- got} extra=${got -- withShare}")
    // the panel is fully accounted for
    assert(got.toSeq.map(_._3).sum == e.count(_._1 < 64L).toLong)
  }

  test("embedding_isotropy == the O(n^2) pairwise definition it replaces") {
    val e = embs(TestSpark.sf0001)
    val grid = (1L << 20).toDouble
    val q = e.map { case (id, v, _) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => math.floor(x / n * grid + 0.5).toLong)
    }
    // brute force: sum of integer pairwise dots, i != j (both orders)
    var acc = BigInt(0)
    for (i <- q.indices; j <- q.indices if i != j)
      acc += BigInt(q(i).zip(q(j)).map { case (a, b) => a * b }.sum)
    val n = q.length.toLong
    val expected = r6(acc.toDouble / (n * (n - 1)).toDouble / 1099511627776.0)
    val got = LlmVectorOps.embeddingIsotropy(spark, TestSpark.sf0001)
      .collect().head
    assert(got.getLong(0) == n)
    assert(got.getDouble(1) == expected,
      s"identity broke: got ${got.getDouble(1)} expected $expected")
  }

  test("ann_mrr: true_nn from brute force, rr algebra, one row per probe") {
    val e = embs(TestSpark.sf0001)
    val norm = e.map { case (id, v, _) =>
      id -> math.sqrt(v.map(x => x * x).sum)
    }.toMap
    // true nearest from first principles (fenced score, vec_id ties)
    val trueNn = e.filter(_._1 < 5L).map { case (pid, pv, _) =>
      val best = e.filter(_._1 != pid).map { case (id, v, _) =>
        (id, r6(pv.zip(v).map { case (a, b) => a * b }.sum
          / (norm(pid) * norm(id))))
      }.minBy { case (id, sc) => (-sc, id) }._1
      pid -> best
    }.toMap
    val pqLists = graft.operators.LlmVectorOps
      .similarityTopkPq(spark, TestSpark.sf0001)
      .select("probe_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    val got = graft.operators.LlmVectorOps.annMrr(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == trueNn.keys.toSeq.sorted,
      "one row per probe, ordered")
    got.foreach { case (pid, nn, fr, rr) =>
      assert(nn == trueNn(pid), s"probe $pid true_nn $nn != ${trueNn(pid)}")
      val inPq = pqLists.getOrElse(pid, Array.empty)
        .find(_._3 == nn).map(_._2)
      assert(fr == inPq.getOrElse(0), s"probe $pid found_rank")
      assert(rr == (if (fr == 0) 0.0 else r6(1.0 / fr)), s"probe $pid rr")
    }
    // probative: the PQ rung finds the true neighbor for at least one
    // probe (AnnQualitySpec floors recall well above this)
    assert(got.exists(_._3 == 1))
  }

  test("ann_recall_pq: per-probe overlap of brute-force exact vs PQ list") {
    val e = embs(TestSpark.sf0001)
    val norm = e.map { case (id, v, _) =>
      id -> math.sqrt(v.map(x => x * x).sum)
    }.toMap
    val exactTop = e.filter(_._1 < 5L).map { case (pid, pv, _) =>
      val top = e.filter(_._1 != pid).map { case (id, v, _) =>
        (id, r6(pv.zip(v).map { case (a, b) => a * b }.sum
          / (norm(pid) * norm(id))))
      }.sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1).toSet
      pid -> top
    }.toMap
    val pqLists = graft.operators.LlmVectorOps
      .similarityTopkPq(spark, TestSpark.sf0001)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = graft.operators.LlmVectorOps.annRecallPq(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    got.foreach { case (pid, k, hits, recall) =>
      val exp = exactTop(pid)
      assert(k == exp.size.toLong)
      assert(hits == exp.intersect(pqLists.getOrElse(pid, Set.empty)).size
        .toLong, s"probe $pid")
      assert(recall == r6(hits.toDouble / k.toDouble))
    }
    assert(got.map(_._1).toSet == exactTop.keySet)
    // AnnQualitySpec floors end-to-end recall; here just non-trivial
    assert(got.exists(_._3 > 0L))
  }

  test("isotropy_centered == the O(n^2) pairwise definition on centered units") {
    val e = embs(TestSpark.sf0001)
    val grid = (1L << 20).toDouble
    val dim = e.head._2.length
    val n = e.length
    // per-dim grid means, exactly as both engines compute them
    val m = Array.tabulate(dim) { d =>
      e.map(t => math.floor(t._2(d) * grid + 0.5).toLong).sum.toDouble /
        (n * grid)
    }
    val q = e.map { case (_, v, _) =>
      val w = v.indices.map(i => v(i) - m(i)).toArray
      val n2q = w.map(x => math.floor(x * x * 1.0e12 + 0.5).toLong).sum
      val wnorm = math.sqrt(n2q.toDouble / 1.0e12)
      w.map(x => math.floor(x / wnorm * grid + 0.5).toLong)
    }
    var acc = BigInt(0)
    for (i <- q.indices; j <- q.indices if i != j)
      acc += BigInt(q(i).zip(q(j)).map { case (a, b) => a * b }.sum)
    val expected = r6(acc.toDouble / (n.toLong * (n - 1)).toDouble
      / 1099511627776.0)
    val got = graft.operators.LlmVectorOps
      .isotropyCentered(spark, TestSpark.sf0001).collect().head
    assert(got.getLong(0) == n.toLong)
    assert(got.getDouble(1) == expected,
      s"identity broke: got ${got.getDouble(1)} expected $expected")
  }

  test("cluster_purity == driver replay of the seed keep-1 assignment") {
    val e = embs(TestSpark.sf001)
    val norm = e.map { case (id, v, _) =>
      id -> math.sqrt(v.map(x => x * x).sum)
    }.toMap
    val cents = e.filter(_._1 % 100L == 0L)
    val assigned = e.map { case (id, v, lab) =>
      val best = cents.map { case (cid, cv, _) =>
        (cid, v.zip(cv).map { case (a, b) => a * b }.sum / (norm(id) * norm(cid)))
      }.minBy { case (cid, sim) => (-sim, cid) }._1
      (best, lab)
    }
    val expected = assigned.groupBy(_._1).map { case (cid, rows) =>
      val byLab = rows.groupBy(_._2).view.mapValues(_.length).toSeq
      val (topLab, topN) = byLab.sortBy { case (lab, n) => (-n, lab) }.head
      (cid, rows.length.toLong, topLab, topN.toLong,
        r6(topN.toDouble / rows.length.toDouble))
    }.toSet
    val got = graft.operators.LlmVectorOps.clusterPurity(spark, TestSpark.sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // the assignment partitions the corpus
    assert(got.toSeq.map(_._2).sum == e.length.toLong)
  }

  test("filter_funnel == driver flag replay; funnel is monotone") {
    val s = spark
    val sf = TestSpark.sf001
    val quality = graft.operators.LlmTextOps.textQuality(s, sf)
      .select("doc_id", "quality_score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val removed = graft.operators.LlmTextOps.dedupNearPairs(s, sf)
      .select("j").collect().map(_.getLong(0)).toSet
    val docs = graft.engine.Tables.documents(s, sf)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val flags = docs.map { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      val g = n >= 50 && n <= 100000
      val gq = g && quality(id) >= 0.62
      val gqd = gq && !removed(id)
      (n, g, gq, gqd)
    }
    val (d0, t0) = (flags.length.toLong, flags.map(_._1).sum)
    def stage(p: ((Long, Boolean, Boolean, Boolean)) => Boolean) = {
      val kept = flags.filter(p)
      (kept.length.toLong, kept.map(_._1).sum)
    }
    val (d1, t1) = stage(_._2); val (d2, t2) = stage(_._3)
    val (d3, t3) = stage(_._4)
    val expected = Set(
      (0, "all", d0, t0, r6(1.0), r6(1.0)),
      (1, "length", d1, t1, r6(d1.toDouble / d0), r6(t1.toDouble / t0)),
      (2, "quality", d2, t2, r6(d2.toDouble / d0), r6(t2.toDouble / t0)),
      (3, "near_dedup", d3, t3, r6(d3.toDouble / d0), r6(t3.toDouble / t0)))
    val got = graft.operators.LlmTextOps.filterFunnel(s, sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    assert(d0 >= d1 && d1 >= d2 && d2 >= d3 && d3 > 0, "funnel not monotone")
    assert(d3 < d0, "no stage filtered anything — not probative")
  }

  test("ngram_coverage == driver Set replay over the split-bucketed grams") {
    val s = spark
    val docs = graft.engine.Tables.documents(s, TestSpark.sf001)
      .select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def splitOf(id: Long): String =
      (((id % 1000000007L) * 2654435761L % 1000000007L) % 10L) match {
        case b if b < 8 => "train"
        case 8          => "val"
        case _          => "test"
      }
    val grams = docs.flatMap { case (id, lang, text) =>
      val toks = text.split(" ", -1)
      if (toks.length < 3) Seq.empty
      else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
        .map(g => (splitOf(id), lang, g))
    }
    val trainVocab = grams.collect { case ("train", _, g) => g }.toSet
    val expected = grams.filter(_._1 != "train")
      .groupBy(t => (t._1, t._2))
      .map { case ((sp, lang), rows) =>
        val covered = rows.count(t => trainVocab(t._3)).toLong
        (sp, lang, rows.length.toLong, covered,
          r6(covered.toDouble / rows.length.toDouble))
      }.toSet
    val got = LlmTextOps.ngramCoverage(s, TestSpark.sf001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
    // probative only if coverage is strictly between 0 and 1 somewhere
    assert(got.exists(t => t._5 > 0.0 && t._5 < 1.0))
  }

  test("hard_negatives: cross-label only, and exactly similarity_topk restricted by label") {
    import org.apache.spark.sql.functions.col
    val d = TestSpark.sf0001
    val labels = graft.engine.Tables.embeddings(spark, d)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = graft.operators.LlmVectorOps.hardNegatives(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getDouble(4)))
    assert(got.nonEmpty && got.length == 5 * 5, "5 probes x top-5")
    got.foreach { case (p, _, v, nl, _) =>
      assert(labels(v) == nl && nl != labels(p),
        s"negative $v must carry a DIFFERENT label than probe $p")
    }
    // independent reference: brute-force driver scores per probe
    val vecs = graft.engine.Tables.embeddings(spark, d)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dt = a.indices.map(i => a(i) * b(i)).sum
      dt / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = vecs.filter(_._1 < 5).flatMap { case (pid, pe, pl) =>
      vecs.filter(v => v._1 != pid && v._3 != pl)
        .map(v => (pid, v._1, v._3, r6d(cos(pe, v._2))))
        .sortBy { case (_, vid, _, s) => (-s, vid) }
        .take(5).zipWithIndex
        .map { case ((p, v, nl, s), i) => (p, i + 1, v, nl, s) }
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq == expected.toSeq,
      s"hard negatives diverged from brute force")
  }

  test("mixture_weights: weights normalize to ~1 and preserve share order flattened") {
    val rows = graft.operators.LlmTextOps
      .mixtureWeights(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
    assert(rows.length > 1, "needs several sources")
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4, "shares sum to 1")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "weights sum to 1")
    // tau < 1 flattens: the largest source's weight is BELOW its raw
    // share, the smallest source's weight ABOVE it; order preserved
    val byShare = rows.sortBy(_._2)
    assert(byShare.map(_._3).sorted.toSeq == byShare.map(_._3).toSeq,
      "sqrt is monotone: weight order == share order")
    assert(byShare.last._3 < byShare.last._2,
      "head source must be down-weighted")
    assert(byShare.head._3 > byShare.head._2,
      "tail source must be up-weighted")
  }

  test("ann_recall_trunc == driver replay of both rankings at sf0.001") {
    val e = embs(TestSpark.sf0001)
    def topk(dims: Int): Map[Long, Set[Long]] =
      e.filter(_._1 < 5L).map { case (pid, pv0, _) =>
        val pv = pv0.take(dims)
        val pn = math.sqrt(pv.map(x => x * x).sum)
        val scored = e.filter(_._1 != pid).map { case (id, v0, _) =>
          val v = v0.take(dims)
          val dot = pv.zip(v).map { case (a, b) => a * b }.sum
          (id, r6(dot / (pn * math.sqrt(v.map(x => x * x).sum))))
        }
        pid -> scored.sortBy { case (id, sc) => (-sc, id) }
          .take(10).map(_._1).toSet
      }.toMap
    val exact = topk(64)
    val trunc = topk(16)
    val got = LlmVectorOps.annRecallTrunc(spark, TestSpark.sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == exact.keySet && got.nonEmpty)
    got.foreach { case (pid, (k, hits, recall)) =>
      assert(k == 10L, s"probe $pid k")
      val expHits = (exact(pid) & trunc(pid)).size.toLong
      assert(hits == expHits, s"probe $pid hits: $hits vs $expHits")
      assert(math.abs(recall - r6(hits.toDouble / 10.0)) < 2e-6)
    }
  }

  test("hits_scores == driver two-round L1 HITS replay on the kNN graph") {
    val e = embs(TestSpark.sf0001)
    val norm = e.map { case (id, v, _) =>
      id -> math.sqrt(v.map(x => x * x).sum)
    }.toMap
    // the shared pagerank edge contract: r6 scores, (score desc, id
    // asc) top-3 per source
    val edges = e.flatMap { case (src, sv, _) =>
      e.filter(_._1 != src).map { case (dst, dv, _) =>
        val dot = sv.zip(dv).map { case (a, b) => a * b }.sum
        (dst, r6(dot / (norm(src) * norm(dst))))
      }.sortBy { case (id, sc) => (-sc, id) }.take(3)
        .map { case (dst, _) => (src, dst) }
    }
    val ids = e.map(_._1)
    val Q = 1099511627776.0
    def half(scores: Map[Long, Double], in: (Long, Long) => Long,
        out: (Long, Long) => Long): Map[Long, Double] = {
      val qs = edges.groupBy(t => out(t._1, t._2)).view.mapValues {
        es => es.map(t =>
          math.floor(scores(in(t._1, t._2)) * Q + 0.5).toLong).sum
      }.toMap.withDefaultValue(0L)
      val t = ids.map(qs).sum
      ids.map(id => id -> qs(id).toDouble / t.toDouble).toMap
    }
    var h = ids.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    for (_ <- 1 to 2) {
      a = half(h, (s, _) => s, (_, d) => d)
      h = half(a, (_, d) => d, (s, _) => s)
    }
    val got = LlmVectorOps.hitsScores(spark, TestSpark.sf0001).collect()
    assert(got.length == ids.length)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(math.abs(r.getDouble(1) - r6(a(id) * 1000.0)) < 2e-6,
        s"$id authority")
      assert(math.abs(r.getDouble(2) - r6(h(id) * 1000.0)) < 2e-6,
        s"$id hub")
    }
    // L1 normalization: each side sums to ~1 (quantization-level slack)
    assert(math.abs(a.values.sum - 1.0) < 1e-6)
    assert(math.abs(h.values.sum - 1.0) < 1e-6)
  }

  test("clustering_ari == driver contingency replay; degenerate bounds") {
    val e = embs(TestSpark.sf0001)
    // keep-1 seed-centroid assignment (vec_id % 100 == 0 codebook)
    val cents = e.filter(_._1 % 100L == 0L)
    def normOf(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val assign = e.map { case (id, v, lab) =>
      val n = normOf(v)
      val best = cents.map { case (cid, cv, _) =>
        val dot = v.zip(cv).map { case (a, b) => a * b }.sum
        (cid, dot / (n * normOf(cv)))
      }.minBy { case (cid, sim) => (-sim, cid) }._1
      (best, lab)
    }
    def c2(x: Long): BigInt = BigInt(x) * BigInt(x - 1) / 2
    val cont = assign.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val i = cont.values.map(c2).sum
    val ai = cont.groupBy(_._1._1).view
      .mapValues(_.values.sum).values.toSeq
    val bj = cont.groupBy(_._1._2).view
      .mapValues(_.values.sum).values.toSeq
    val (a, b) = (ai.map(c2).sum, bj.map(c2).sum)
    val cn = c2(e.length.toLong)
    val expAri = r6((BigInt(2) * (cn * i - a * b)).toDouble
      / (cn * (a + b) - BigInt(2) * a * b).toDouble)
    val row = LlmVectorOps.clusteringAri(spark, TestSpark.sf0001)
      .collect().head
    assert(row.getLong(0) == e.length.toLong)
    assert(row.getLong(1) == ai.length.toLong, "cell count")
    assert(row.getLong(2) == bj.length.toLong, "label count")
    assert(math.abs(row.getDouble(3) - expAri) < 2e-6,
      s"ari ${row.getDouble(3)} vs $expAri")
    // chance-corrected: random-vs-label agreement sits near 0,
    // far from purity's shatter-reward regime
    assert(row.getDouble(3) > -0.5 && row.getDouble(3) < 0.5)
  }
}
