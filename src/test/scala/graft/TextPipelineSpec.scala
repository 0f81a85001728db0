package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.LlmTextOps

/** Properties of the round-5 text-pipeline additions: benchmark
  * decontamination, repetition quality metrics, and sliding-window
  * chunking. Each test checks the operator against an independent
  * formulation computed inline (brute force / exploded groupBy /
  * round-trip reconstruction), not against golden values.
  */
class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001
  private val benches = Seq("src0", "src1", "src2", "src3")

  /** All (doc_id, gram-string) rows of distinct 8-token shingles —
    * the brute-force reference side for decontaminate (string grams,
    * no hashing). */
  private def gramRows = Tables.documents(spark, d)
    .withColumn("toks", split(col("text"), " "))
    .where(size(col("toks")) >= 8)
    .select(col("doc_id"), col("source"),
      explode(array_distinct(expr(
        """transform(sequence(0, size(toks) - 8),
             i -> array_join(slice(toks, i + 1, 8), ' '))"""))).as("gram"))

  test("decontaminate equals the brute-force string-gram overlap") {
    val got = LlmTextOps.decontaminate(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val g = gramRows
    val bench = g.where(col("source").isin(benches: _*))
      .select("gram").distinct()
    val expected = g.where(!col("source").isin(benches: _*))
      .join(bench, Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty, "sf0.001 should contain cross-source near-dups")
  }

  test("decontaminate flags no benchmark-slice docs and only true overlaps") {
    val flagged = LlmTextOps.decontaminate(spark, d)
    val srcs = flagged.join(
        Tables.documents(spark, d).select("doc_id", "source"), Seq("doc_id"))
      .select("source").distinct().collect().map(_.getString(0))
    assert(srcs.forall(s => !benches.contains(s)))
    // every reported count is positive and no larger than the doc's
    // own distinct-gram count
    val bad = flagged.join(
        gramRows.groupBy("doc_id").agg(count(lit(1)).as("own")), Seq("doc_id"))
      .where(col("n_shared_grams") <= 0 || col("n_shared_grams") > col("own"))
    assert(bad.count() == 0)
  }

  test("repetition_stats top-bigram run-length equals the exploded groupBy mode") {
    // independent formulation: explode bigram occurrences, count per
    // (doc, bigram), take the per-doc max — the shuffle-heavy twin the
    // map-side sort+fold replaces
    val bg = Tables.documents(spark, d)
      .withColumn("toks", split(col("text"), " "))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        explode(expr(
          """transform(sequence(0, size(toks) - 2),
               i -> concat(toks[i], ' ', toks[i + 1]))""")).as("b"))
    val expected = bg.groupBy("doc_id", "n_tokens", "b")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n_tokens").agg(max(col("c")).as("top_c"))
      .withColumn("frac", graft.engine.Determinism.r6(
        col("top_c") / (col("n_tokens") - 1L)))
      .select("doc_id", "frac")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = LlmTextOps.repetitionStats(spark, d)
      .select("doc_id", "top_bigram_frac")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("repetition_stats fractions are bounded and exact on a known doc") {
    val rows = LlmTextOps.repetitionStats(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dup, top) = (r.getAs[Double]("dup_token_frac"),
        r.getAs[Double]("top_bigram_frac"))
      assert(dup >= 0.0 && dup < 1.0, s"dup_token_frac out of range: $r")
      assert(top > 0.0 && top <= 1.0, s"top_bigram_frac out of range: $r")
    }
  }

  test("chunk_documents round-trips: stride-24 prefixes + last chunk rebuild the doc") {
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    val rebuilt = LlmTextOps.chunkDocuments(spark, d)
      .groupBy("doc_id")
      .agg(expr("array_sort(collect_list(struct(chunk_idx, chunk_text)))")
          .as("cs"),
        max("chunk_idx").as("mx"))
      .select(col("doc_id"), expr(
        """array_join(transform(cs,
             x -> IF(x.chunk_idx = mx, x.chunk_text,
                     array_join(slice(split(x.chunk_text, ' '), 1, 24), ' ')))
           , ' ')""").as("rebuilt"))
    val mismatched = rebuilt.join(docs, Seq("doc_id"))
      .where(col("rebuilt") =!= col("text"))
    assert(mismatched.count() == 0)
  }

  test("dedup_chunks: every chunk of a non-survivor exact copy is a duplicate") {
    val res = LlmTextOps.dedupChunks(spark, d)
    assert(res.where(col("n_dup_chunks") > col("n_chunks")).count() == 0)
    assert(res.agg(sum("n_dup_chunks")).head.getLong(0) > 0)
    // an exact-copy doc that is not its group's survivor repeats every
    // chunk of the survivor, so all its chunks must be flagged
    val docs = Tables.documents(spark, d)
    val nonSurvivors = docs.groupBy("text")
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
      .where(col("n") > 1)
      .join(docs, Seq("text"))
      .where(col("doc_id") =!= col("keep"))
      .select("doc_id")
    val incomplete = res.join(nonSurvivors, Seq("doc_id"))
      .where(col("n_dup_chunks") =!= col("n_chunks"))
    assert(incomplete.count() == 0)
  }

  test("chunk_documents lengths and indices are consistent") {
    val chunks = LlmTextOps.chunkDocuments(spark, d)
      .withColumn("actual_len", size(split(col("chunk_text"), " ")))
    assert(chunks.where(col("actual_len") =!= col("chunk_len")).count() == 0)
    // every chunk is 1..32 tokens; every non-final chunk is exactly 32
    // OR the doc is shorter than one window
    assert(chunks.where(col("chunk_len") < 1 || col("chunk_len") > 32)
      .count() == 0)
    val n = Tables.documents(spark, d)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val idx = chunks.groupBy("doc_id")
      .agg(max("chunk_idx").as("max_idx"), count(lit(1)).as("n_chunks"))
      .join(n, Seq("doc_id"))
      .where(col("n_chunks") =!= col("max_idx") + 1
        || col("max_idx") =!= floor((col("n") - 1) / 24))
    assert(idx.count() == 0)
  }

  test("dedup_containment == driver-side shingle-set replay; C >= J on shared pairs") {
    val got = graft.operators.LlmTextOps.dedupContainment(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got.nonEmpty, "the near-copy tail must produce containment pairs")
    // brute-force reference: raw string 3-shingle sets per doc
    val sets = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split(" ")
        r.getLong(0) -> toks.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.toMap
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val want = (for {
      (i, si) <- sets.toSeq; (j, sj) <- sets.toSeq
      if i < j && si.nonEmpty && sj.nonEmpty
      inter = (si & sj).size
      c = r6d(inter.toDouble / math.min(si.size, sj.size))
      if c >= 0.9
    } yield (i, j) -> c).toMap
    assert(got == want,
      s"extra=${(got.keySet -- want.keySet).take(5)} " +
        s"missing=${(want.keySet -- got.keySet).take(5)}")
    // structural relation: containment dominates Jaccard, so every
    // dedup_near pair must appear here with C >= its J
    val near = graft.operators.LlmTextOps.dedupNear(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    near.foreach { case (k, jac) =>
      assert(got.contains(k) && got(k) >= jac,
        s"pair $k: J=$jac but containment ${got.get(k)}")
    }
  }

  test("quality_gopher == driver-side rule replay; integer boundaries exact") {
    val got = graft.operators.LlmTextOps.qualityGopher(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    assert(got.nonEmpty)
    val stops = Set("the", "be", "to", "of", "and", "that", "have", "with")
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val want = Tables.documents(spark, d)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ")))
      .groupBy(_._1).map { case (src, rows) =>
        val flags = rows.map { case (_, toks) =>
          val n = toks.length.toLong
          val wchars = toks.map(_.length.toLong).sum
          (n < 50 || n > 100000,
            wchars < 3 * n || wchars > 10 * n,
            10L * toks.count(_.exists(_.isLetter)) < 8 * n,
            toks.toSet.intersect(stops).size < 2)
        }
        src -> (rows.length.toLong,
          flags.count(_._1).toLong, flags.count(_._2).toLong,
          flags.count(_._3).toLong, flags.count(_._4).toLong,
          r6d(flags.count(f => !f._1 && !f._2 && !f._3 && !f._4).toDouble
            / rows.length))
      }
    assert(got == want)
    // the synthetic 10-100-token corpus must FAIL the 50-word minimum
    // somewhere and PASS it somewhere — both branches exercised
    val wc = got.values.map(_._2).sum
    assert(wc > 0 && wc < got.values.map(_._1).sum,
      s"word-count rule must split the corpus, failed $wc")
  }

  test("shared_substrings == driver-side suffix replay of the longest common run") {
    val got = graft.operators.LlmTextOps.sharedSubstrings(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty, "the copy tail guarantees shared runs")
    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    // reference: longest common CONTIGUOUS token run via direct
    // alignment scan (O(n·m) per pair — test-scale only), plus the
    // aligned 8-window match count
    def longestRun(a: Array[String], b: Array[String]): (Long, Long) = {
      var best = 0
      var shared = 0L
      for (d0 <- -(b.length - 1) until a.length) {
        var run = 0
        for (ai <- math.max(0, d0) until a.length) {
          val bi = ai - d0
          if (bi >= 0 && bi < b.length) {
            if (a(ai) == b(bi)) run += 1 else run = 0
            if (run > best) best = run
            // every position where an 8-run ends is one aligned
            // 8-window match on this diagonal
            if (run >= 8) shared += 1
          }
        }
      }
      (best.toLong, shared)
    }
    got.foreach { case (i, j, maxRun, nWins) =>
      val (bestRef, winsRef) = longestRun(toks(i), toks(j))
      assert(maxRun == bestRef && nWins == winsRef,
        s"pair ($i,$j): got ($maxRun,$nWins) want ($bestRef,$winsRef)")
    }
    // descending by run length, ties by (i, j)
    got.sliding(2).foreach { case Array(x, y) =>
      assert(x._3 > y._3 ||
        (x._3 == y._3 && (x._1 < y._1 || (x._1 == y._1 && x._2 < y._2))))
    }
    assert(got.length <= 20)
  }

  test("ccnet_buckets == driver-side ntile replay over token_surprisal; bands ordered") {
    val got = LlmTextOps.ccnetBuckets(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(got.nonEmpty)
    val scores = LlmTextOps.tokenSurprisal(spark, d)
      .select(col("doc_id"), col("mean_surprisal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val names = Array("head", "middle", "tail")
    val want = docs.groupBy(_._2).flatMap { case (lang, rows) =>
      val ordered = rows.sortBy(r => (scores(r._1), r._1))
      val n = ordered.length
      val sizes = Array.tabulate(3)(b => n / 3 + (if (b < n % 3) 1 else 0))
      val bounds = sizes.scanLeft(0)(_ + _)
      (0 until 3).filter(b => sizes(b) > 0).map { b =>
        val slice = ordered.slice(bounds(b), bounds(b + 1))
        val qs = slice.map(r =>
          math.floor(scores(r._1) * 1e6 + 0.5).toLong)
        (lang, names(b)) -> (slice.length.toLong,
          slice.map(_._3).sum,
          r6d(qs.sum.toDouble / (slice.length * 1e6)),
          slice.map(r => scores(r._1)).min,
          slice.map(r => scores(r._1)).max)
      }
    }
    assert(got == want,
      s"diff=${(got.toSet -- want.toSet).take(3)}")
    // the bands tile the score axis in order: head.max <= middle.min
    // <= middle.max <= tail.min within every language
    got.keys.map(_._1).toSet.foreach { lang: String =>
      for (Seq(a, b) <- names.toSeq.sliding(2)) {
        (got.get((lang, a)), got.get((lang, b))) match {
          case (Some(x), Some(y)) => assert(x._5 <= y._4 + 1e-12)
          case _ =>
        }
      }
    }
  }

  test("bpe_merges == driver-side textbook (Sennrich get_stats) replay") {
    // reference implementation: dict-based word-freq BPE exactly as
    // published — symbols as Vector[String], pair counts over every
    // adjacent position, greedy leftmost non-overlapping merge,
    // (count DESC, l ASC, r ASC) tie order
    val words = Tables.documents(spark, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val expected =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (round <- 1 to LlmTextOps.BpeMergeRounds) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          stats((p(0), p(1))) = stats.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      assert(stats.nonEmpty, s"corpus exhausted pairs at round $round")
      val ((l, r), c) = stats.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.head
      expected += ((round, l, r, c))
      vocab = vocab.map { case (syms, cnt) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toVector -> cnt
      }.groupMapReduce(_._1)(_._2)(_ + _)
    }
    val got = LlmTextOps.bpeMerges(spark, d)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(4))).toSeq
    assert(got == expected.toSeq,
      s"BPE merge sequence diverged:\n got=$got\n exp=${expected.toSeq}")
  }

  test("dedup_substring_removal: constructed-corpus round trip + sf0.001 accounting") {
    // constructed corpus with hand-computable ExactSubstr spans:
    // A base, B a 54-token slice copy, C a 40-token slice (below the
    // 50 cut), D an exact copy of A, E unrelated, G a second base,
    // F = noise + A[1..50] + noise + G[1..50] (two disjoint spans,
    // plus DUPLICATE intervals via D — the distinct-before-sweep case)
    import spark.implicits._
    val a = (1 to 60).map(i => s"a$i")
    val g = (1 to 50).map(i => s"g$i")
    val docs = Seq(
      (0L, a.mkString(" ")),                                   // A
      (1L, (a.slice(4, 58) ++ (1 to 6).map(i => s"b$i")).mkString(" ")), // B
      (2L, a.slice(10, 50).mkString(" ")),                     // C
      (3L, a.mkString(" ")),                                   // D = A
      (4L, (1 to 20).map(i => s"e$i").mkString(" ")),          // E
      (5L, g.mkString(" ")),                                   // G
      (6L, ((1 to 5).map(i => s"f$i") ++ a.take(50)
        ++ (6 to 9).map(i => s"f$i") ++ g).mkString(" "))      // F
    ).map { case (id, text) =>
      (id, text, "en", "srcT", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_substr_rm").toString
    try {
      docs.write.parquet(s"$dir/documents.parquet")
      val got = LlmTextOps.dedupSubstringRemoval(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      val expected = Seq(
        (0L, 60L, 60L, 0L, 1L),   // A: [1,54]+[1,60]+[1,50] union
        (1L, 60L, 54L, 6L, 1L),   // B: [1,54] (dup via D collapses)
        (3L, 60L, 60L, 0L, 1L),   // D: full copy
        (5L, 50L, 50L, 0L, 1L),   // G: fully inside F
        (6L, 109L, 100L, 9L, 2L)) // F: two disjoint 50-token spans
      assert(got == expected, s"got=$got")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }

  test("dedup_substring_removal accounting holds on the shipped corpus") {
    val rows = LlmTextOps.dedupSubstringRemoval(spark, d).collect()
    assert(rows.nonEmpty, "vacuous at sf0.001 — no >= 50-token spans")
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1),
        s"removed + retained must reconstruct the doc: $r")
      assert(r.getLong(2) >= 50L, s"a cut span is >= 50 tokens: $r")
      assert(r.getLong(4) >= 1L && r.getLong(2) >= r.getLong(4) * 50L,
        s"each region is >= 50 tokens: $r")
    }
    // every affected doc must appear in a >= 50-token shared_substrings
    // pair, and vice versa for the top-20 report's qualifying pairs
    val affected = rows.map(_.getLong(0)).toSet
    val big = LlmTextOps.sharedSubstrings(spark, d)
      .where(col("max_run_tokens") >= 50)
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(big.subsetOf(affected),
      s"report pairs missing from removal: ${big -- affected}")
  }
}
