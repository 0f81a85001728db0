package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LlmVectorOps, LlmTextOps}

/** Approximate-operator quality guards: the ANN and blocked-dedup
  * paths have no oracle (approximate by design), so their *recall*
  * against the exact operators is the regression surface. Thresholds
  * sit below the measured values (LSH 0.70, IVF 0.68, blocked dedup
  * 0.66 at sf0.01 — BASELINE.md) with margin for small corpus shifts;
  * a parameter or bucketing change that trashes recall fails here
  * instead of silently shipping.
  */
class AnnQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf001

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact = topkSet(LlmVectorOps.similarityTopk(spark, sf))

  test("similarity_lsh recall@10 >= 0.6 vs brute force at sf0.01") {
    val lsh = topkSet(LlmVectorOps.similarityLsh(spark, sf))
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.6, f"LSH recall@10 degraded: $recall%.3f")
  }

  test("similarity_ivf recall@10 >= 0.55 vs brute force at sf0.01") {
    val ivf = topkSet(LlmVectorOps.similarityIvf(spark, sf))
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.55, f"IVF recall@10 degraded: $recall%.3f")
  }

  test("similarity_ivf_trained holds the same recall floor after Lloyd rounds") {
    val ivf = topkSet(LlmVectorOps.similarityIvfTrained(spark, sf))
    val recall = (exact & ivf).size.toDouble / exact.size
    // training rebalances lists; on this isotropic corpus the recall
    // stays in the same band (measured at or above the seed codebook)
    assert(recall >= 0.55, f"trained IVF recall@10 degraded: $recall%.3f")
  }

  test("similarity_topk_pq recall@10 vs brute force, and exact re-rank scores") {
    val pq = LlmVectorOps.similarityTopkPq(spark, sf)
    val recall = (exact & topkSet(pq)).size.toDouble / exact.size
    // 4-bit codes on an isotropic corpus are the hard case for PQ;
    // the 50-candidate exact re-rank carries the floor
    assert(recall >= 0.5, f"PQ recall@10 degraded: $recall%.3f")
    // every emitted score must be the TRUE cosine (re-rank is exact):
    // compare against the brute-force score for the same (probe, vec)
    val exactScores = LlmVectorOps.similarityTopk(spark, sf)
      .select("probe_id", "vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pq.select("probe_id", "vec_id", "score").collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactScores.get(key).foreach { es =>
        assert(r.getDouble(2) == es, s"PQ emitted a non-exact score at $key")
      }
    }
  }

  test("similarity_ivf_pq recall@10 >= 0.6 with exact re-ranked scores") {
    val ivfpq = LlmVectorOps.similarityIvfPq(spark, sf)
    val recall = (exact & topkSet(ivfpq)).size.toDouble / exact.size
    // residual-encoded codes + nprobe=3 routing measured 0.74 at
    // sf0.01 (raw-code nprobe=2 form measured 0.62 — BASELINE.md);
    // floor at 0.6 with margin for small corpus shifts
    assert(recall >= 0.6, f"IVF-PQ recall@10 degraded: $recall%.3f")
    // exact re-rank: emitted scores must be true cosines
    val exactScores = LlmVectorOps.similarityTopk(spark, sf)
      .select("probe_id", "vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivfpq.select("probe_id", "vec_id", "score").collect().foreach { r =>
      exactScores.get((r.getLong(0), r.getLong(1))).foreach { es =>
        assert(r.getDouble(2) == es)
      }
    }
  }

  test("dedup_embed_blocked recall >= 0.5 vs exact pairs at sf0.01") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex = pairs(LlmVectorOps.dedupEmbed(spark, sf))
    val bl = pairs(LlmVectorOps.dedupEmbedBlocked(spark, sf))
    assert(bl.subsetOf(ex), s"false positives: ${bl -- ex}")
    val recall = (ex & bl).size.toDouble / ex.size
    assert(recall >= 0.5, f"blocked-dedup recall degraded: $recall%.3f")
  }

  test("dedup_embed_blocked recall >= 0.95 on true near-dups (cos >= 0.9)") {
    // The 0.66 recall above is measured on this corpus's weakly-similar
    // pair mass (cos 0.4-0.6), where hyperplane collision odds are
    // genuinely low. Where dedup MATTERS — true near-duplicates — the
    // collision probability p = 1 - θ/π is high and recall should
    // approach 1. Synthesize that slice: 50 corpus vectors plus
    // deterministically perturbed copies at cos ≥ 0.9, then require
    // the blocked path to find ≥ 95% of the planted pairs.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = graft.engine.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val picked = base.where(col("vec_id") < 50)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(picked.length == 50)
    val offset = 100000L
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val perturbed = picked.map { case (id, v) =>
      val rnd = new scala.util.Random(id) // per-id deterministic noise
      val noise = Array.fill(v.length)((rnd.nextDouble() - 0.5).toFloat)
      val vNorm = math.sqrt(v.map(x => x.toDouble * x).sum)
      val nNorm = math.sqrt(noise.map(x => x.toDouble * x).sum)
      val scale = (0.25 * vNorm / nNorm).toFloat
      val p = v.indices.map(i => v(i) + noise(i) * scale).toArray
      // precondition: the planted copy really is a near-dup
      assert(cos(v, p) >= 0.9, s"planted pair $id below cos 0.9")
      (id + offset, p)
    }
    val extended = base.union(perturbed.toSeq.toDF("vec_id", "embedding"))
    val found = LlmVectorOps.dedupEmbedBlockedFrom(spark, extended)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = picked.map { case (id, _) => (id, id + offset) }.toSet
    val recall = (truth & found).size.toDouble / truth.size
    assert(recall >= 0.95,
      f"blocked-dedup recall on true near-dups: $recall%.3f (missed ${truth -- found})")
  }

  test("dedup_minhash finds every exact-duplicate pair at sf0.01") {
    import org.apache.spark.sql.functions.col
    val exactDups = LlmTextOps.dedupNear(spark, sf)
      .where(col("jaccard") >= 0.999)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = LlmTextOps.dedupMinhash(spark, sf)
      .where(col("est_jaccard") >= 0.999)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactDups.subsetOf(mh), s"MinHash missed: ${exactDups -- mh}")
  }

  test("silhouette_score == driver-side centroid replay; bounds hold") {
    import org.apache.spark.sql.functions.col
    val sfd = TestSpark.sf0001
    val got = LlmVectorOps.silhouetteScore(spark, sfd).collect()
    val embs = graft.engine.Tables.embeddings(spark, sfd)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue,
        r.getSeq[Float](2).toArray.map(_.toDouble)))
    val grid = (1L << 20).toDouble
    val byLabel = embs.groupBy(_._2)
    val cents = byLabel.map { case (l, vs) =>
      l -> Array.tabulate(vs.head._3.length) { d =>
        vs.map(v => math.floor(v._3(d) * grid + 0.5).toLong).sum
          .toDouble / (vs.length * grid)
      }
    }
    def d2q(v: Array[Double], m: Array[Double]): Long =
      v.indices.map(i =>
        math.floor((v(i) - m(i)) * (v(i) - m(i)) * 1e9 + 0.5).toLong).sum
    val perVec = embs.map { case (_, l, v) =>
      val a = d2q(v, cents(l))
      val b = cents.filter(_._1 != l).values.map(m => d2q(v, m)).min
      val mx = math.max(a, b)
      (l, if (mx == 0) None
      else Some(math.floor((b - a).toDouble / mx.toDouble * 1e6 + 0.5)
        .toLong))
    }
    val expected = perVec.groupBy(_._1).map { case (l, xs) =>
      val scored = xs.flatMap(_._2)
      l -> (xs.length.toLong, scored.length.toLong,
        scored.count(_ < 0L).toLong,
        math.floor(scored.sum.toDouble / 1e6 / scored.length.toDouble
          * 1e6 + 0.5) / 1e6)
    }
    assert(got.length == expected.size && got.nonEmpty)
    got.foreach { r =>
      val e = expected(r.getAs[Number](0).intValue)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
        ((e._1, e._2, e._3)))
      assert(r.getDouble(4) == e._4, s"mean_silhouette label ${r.get(0)}")
      assert(r.getDouble(4) >= -1.0 - 1e-6 && r.getDouble(4) <= 1.0 + 1e-6)
    }
  }

  test("bitext_mining == driver-side margin replay; margin reranks vs raw cosine") {
    import org.apache.spark.sql.functions.col
    val sfd = TestSpark.sf0001
    val got = LlmVectorOps.bitextMining(spark, sfd).collect()
    val embs = graft.engine.Tables.embeddings(spark, sfd)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue,
        r.getSeq[Float](2).toArray))
    // exact ascending-index dot, the VectorExprs contract
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def q6v(x: Double) = math.floor(x * 1e6 + 0.5)
    val src = embs.filter(e => e._2 < 5 && e._1 < 32)
    val tgt = embs.filter(_._2 >= 5)
    val norm = embs.map(e => e._1 -> math.sqrt(dot(e._3, e._3))).toMap
    val q = (for (x <- src; y <- tgt) yield
      ((x._1, y._1), q6v(dot(x._3, y._3) / (norm(x._1) * norm(y._1)))
        .toLong)).toMap
    val sx = src.map { x =>
      x._1 -> tgt.map(y => (q((x._1, y._1)), y._1))
        .sortBy(t => (-t._1, t._2)).take(4).map(_._1).sum
    }.toMap
    val sy = tgt.map { y =>
      y._1 -> src.map(x => (q((x._1, y._1)), x._1))
        .sortBy(t => (-t._1, t._2)).take(4).map(_._1).sum
    }.toMap
    val expected = src.map { x =>
      val best = tgt.map { y =>
        val m = math.floor(8.0 * q((x._1, y._1)).toDouble
          / (sx(x._1) + sy(y._1)).toDouble * 1e6 + 0.5) / 1e6
        (y._1, m)
      }.minBy(t => (-t._2, t._1))
      x._1 -> best
    }.toMap
    assert(got.length == expected.size && got.nonEmpty)
    got.foreach { r =>
      val (tgtId, margin) = expected(r.getLong(0))
      assert(r.getLong(1) == tgtId, s"mined partner for src ${r.getLong(0)}")
      assert(r.getDouble(3) == margin, "margin")
      assert(r.getBoolean(4) == (margin > 1.0))
    }
    // the margin must actually rerank somewhere on this corpus —
    // otherwise the denominator is dead code
    val rawBest = src.map { x =>
      x._1 -> tgt.map(y => (q((x._1, y._1)), y._1))
        .maxBy(t => (t._1, -t._2))._2
    }.toMap
    assert(src.exists(x => rawBest(x._1) != expected(x._1)._1),
      "margin never disagreed with raw cosine — denominator inert")
  }

  test("semdedup == driver-side brute-force replay of the published rule") {
    // independent formulation: collect the sf0.001 embeddings, re-run
    // seed + 2 fixed-point Lloyd rounds, keep-1 assignment, the
    // within-cluster epsilon cut, and the keep-lowest-centroid-sim
    // rule entirely in driver Scala, then compare removed sets
    val d = TestSpark.sf0001
    def r6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val vecs = graft.engine.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    var cents: Seq[(Long, Array[Double])] =
      vecs.filter(_._1 % 100 == 0).map { case (id, e) => (id, e) }.toSeq
    for (_ <- 1 to 2) {
      val grid = (1L << 20).toDouble
      val asg = vecs.map { case (id, e) =>
        val best = cents.map { case (cid, c) =>
          (dot(e, c) / (nrm(e) * nrm(c)), cid)
        }.maxBy { case (s, cid) => (s, -cid) }
        (best._2, e)
      }
      cents = asg.groupBy(_._1).toSeq.map { case (cid, members) =>
        val m = Array.tabulate(64) { p =>
          members.map(x => math.floor(x._2(p) * grid + 0.5).toLong).sum
            .toDouble / (members.size * grid)
        }
        (cid, m.map(_.toFloat.toDouble))
      }.filter(c => nrm(c._2) > 0.0).sortBy(_._1)
    }
    val assigned = vecs.map { case (id, e) =>
      val best = cents.map { case (cid, c) =>
        (dot(e, c) / (nrm(e) * nrm(c)), cid)
      }.maxBy { case (s, cid) => (s, -cid) }
      (id, e, best._2, r6d(best._1))
    }
    val byCluster = assigned.groupBy(_._3)
    val removed = scala.collection.mutable.Set.empty[Long]
    byCluster.values.foreach { ms =>
      for {
        a <- ms; b <- ms if a._1 < b._1
        cos = r6d(dot(a._2, b._2) / (nrm(a._2) * nrm(b._2)))
        if cos >= LlmVectorOps.SemDedupEps
      } removed += (if (a._4 > b._4 || (a._4 == b._4 && a._1 > b._1)) a._1
                    else b._1)
    }
    val got = LlmVectorOps.semdedup(spark, d)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == removed.toSet,
      s"semdedup diverged: extra=${got -- removed}, missing=${removed -- got}")
    assert(got.nonEmpty, "vacuous semdedup pin at sf0.001")
  }

  test("semdedup hot-cell cap: capped pair generation == uncapped output") {
    // the Σ C(cell, 2) bound: past the cap a Lloyd cell splits through
    // the salted FromMembers generator — the OUTPUT must be identical
    // (full row set, not just ids: cent_id and cent_sim decorations
    // re-attach per candidate on the capped path)
    val d = TestSpark.sf0001
    def rows(): Seq[String] =
      LlmVectorOps.semdedup(spark, d).collect().map(_.toString).toSeq
    val uncapped = rows()
    assert(uncapped.nonEmpty, "vacuous cap pin")
    // cap = 2 forces EVERY multi-member cell through the hot split
    // (the sf0.001 cells hold up to dozens of members), so the salted
    // intra+cross branches — not the cold path — produce the pairs
    spark.conf.set(LlmVectorOps.SemDedupHotCellCapConf, "2")
    try {
      val capped = rows()
      assert(capped == uncapped,
        s"capped semdedup diverged: ${capped.size} vs ${uncapped.size} rows")
    } finally spark.conf.unset(LlmVectorOps.SemDedupHotCellCapConf)
    // a cap no cell reaches must also be output-identical (cold path)
    spark.conf.set(LlmVectorOps.SemDedupHotCellCapConf, "1000000")
    try assert(rows() == uncapped,
      "an unreached cap must leave the output unchanged")
    finally spark.conf.unset(LlmVectorOps.SemDedupHotCellCapConf)
  }

  test("semdedup hot-cell cap spreads a viral cell across tasks") {
    // skewed-cell evidence: a corpus whose embeddings all collapse to
    // (nearly) one direction lands in ONE Lloyd cell; with the cap on,
    // the exploded pair stream of that cell must occupy many tasks
    // instead of one (the 100 TB straggler this conf exists to kill)
    import spark.implicits._
    val base = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val vecs = (0 until 512).map { id =>
      // identical direction for every vector: cosine 1.0 to every
      // centroid, keep-1 tie-break sends ALL of them to one cell.
      // vec_id is INT on purpose: the capped path must normalize the
      // id width before the packed-pair expressions (array<bigint>)
      (id, base.toSeq, id % 10)
    }.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_semdedup_hot").toString
    try {
      vecs.write.parquet(s"$dir/embeddings.parquet")
      val assigned = LlmVectorOps.semdedupAssigned(spark, dir)
      val cells = assigned.groupBy("cent_id").count().collect()
      assert(cells.map(_.getLong(1)).max >= 256L,
        "the constructed corpus must actually have a viral cell")
      // the same width normalization semdedup's capped path applies
      // (vec_id is INT here, the packed form type-checks array<bigint>)
      val members = assigned.select(
        org.apache.spark.sql.functions.col("cent_id"),
        org.apache.spark.sql.functions.col("vec_id").cast("long")
          .as("vec_id"))
      // AQE's tiny-partition coalescing would re-merge the split
      // chunks at TEST scale (the HotBucketSpec caveat) — pin the
      // spread with coalescing off
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
        "false")
      val perTask =
        try graft.engine.Pairs
          .explodedPairsFromMembers(spark, members, Seq("cent_id"),
            "vec_id", wide = false, hotCap = 64, groups = 16)
          .select(org.apache.spark.sql.functions.spark_partition_id()
            .as("pid"))
          .groupBy("pid").count()
          .collect().map(_.getLong(1))
        finally spark.conf.unset(
          "spark.sql.adaptive.coalescePartitions.enabled")
      val total = perTask.sum
      assert(total >= 512L * 511L / 2L, s"pair stream too small: $total")
      assert(perTask.length >= 3,
        s"quadratic work not spread: ${perTask.toSeq}")
      assert(perTask.max <= total / 2,
        s"one task still owns the viral cell: max=${perTask.max} of " +
          s"$total across ${perTask.length} tasks")
      // and the capped query still equals the uncapped on this corpus
      val off = LlmVectorOps.semdedup(spark, dir).collect()
        .map(_.toString).toSeq
      spark.conf.set(LlmVectorOps.SemDedupHotCellCapConf, "64")
      try assert(LlmVectorOps.semdedup(spark, dir).collect()
        .map(_.toString).toSeq == off)
      finally spark.conf.unset(LlmVectorOps.SemDedupHotCellCapConf)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }
}
