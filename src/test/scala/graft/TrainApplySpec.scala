package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmTextOps

/** The train→apply closures added in round 10: `bpe_encode` (apply
  * the trained merge table to the corpus) and `quality_nb_cv` (the
  * leakage-free NB evaluation on `cross_val_split`'s folds). Each is
  * pinned against a full driver-side replay from raw text — the
  * textbook greedy-merge BPE encoder, and a from-scratch NB trainer
  * honoring the fold split and the unseen-token Laplace weight.
  */
class TrainApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  /** Textbook BPE application: start from characters, apply the
    * learned merges IN RANK ORDER, each as one greedy leftmost
    * non-overlapping pass (the Sennrich apply loop).
    */
  private def encodeWord(word: String,
      merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    for ((l, r) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("bpe_encode == textbook greedy application of the trained merges") {
    val merges = LlmTextOps.bpeMerges(spark, d)
      .orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.size == 12, "training must produce the 12 merges")
    val docs = graft.engine.Tables.documents(spark, d)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val perSource = docs
      .flatMap { case (src, text) =>
        text.split(" ").filter(_.nonEmpty)
          .map(w => (src, 1L, encodeWord(w, merges).length.toLong))
      }
      .groupBy(_._1)
      .map { case (src, ws) =>
        src -> (ws.map(_._2).sum, ws.map(_._3).sum)
      }
    val nDocs = docs.groupBy(_._1).map { case (s2, xs) => s2 -> xs.length }
    val expected = perSource.toSeq.sortBy(_._1).map {
      case (src, (nw, nb)) =>
        (src, nDocs(src).toLong, nw, nb,
          r6(nb.toDouble / nw.toDouble),
          r6(nb.toDouble / nDocs(src).toDouble))
    }
    val got = LlmTextOps.bpeEncode(spark, d).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected, s"encode diverged:\n got=$got\n exp=$expected")
    // non-vacuity: the tokenizer must actually compress — BPE tokens
    // strictly fewer than characters, strictly more than words
    got.foreach { case (_, _, nw, nb, fert, _) =>
      assert(nb >= nw && fert >= 1.0,
        "a word can never encode to fewer than 1 token")
    }
    assert(got.exists(_._5 > 1.0),
      "some word must stay multi-token after only 12 merges")
  }

  test("bpe merge semantics on disjoint adjacent repeats: two-pass replace == textbook greedy") {
    // the naive-replace hazards: (1) disjoint repeats — a single
    // replace(" a b a b ", " a b ", " ab ") consumes the second
    // occurrence's leading space and under-merges to [ab, a, b] where
    // greedy gives [ab, ab]; (2) same-symbol runs — " a a a a a a "
    // merges the WRONG positions ([aa, a, aa, a] vs greedy
    // [aa, aa, aa]). The corpus below forces learned merges through
    // BOTH shapes ((a,b) over abab-words, (a,a) over a-runs), and
    // both the trainer and the encoder are replayed driver-side with
    // the textbook algorithms
    import spark.implicits._
    val texts = Seq(
      "abab abab abab ababab cd cd",
      "abab ababab cd abab",
      "cd cd cd ab abab",
      "aaaaaa aaaa aaaaaa aa aaa")
    val docs = texts.zipWithIndex.map { case (text, id) =>
      (id.toLong, text, "en", "srcB", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpe_repeat").toString
    try {
      docs.write.parquet(s"$dir/documents.parquet")
      // driver-side textbook trainer: word-freq table, 12 rounds of
      // (weighted adjacent pair count -> argmax -> greedy rewrite)
      var wf = texts
        .flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, xs) =>
          w.map(_.toString).toVector -> xs.length.toLong }
      val expMerges =
        scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      for (_ <- 1 to 12 if wf.keys.exists(_.length >= 2)) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        wf.foreach { case (syms, cnt) =>
          syms.sliding(2).foreach { p =>
            if (p.length == 2)
              counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + cnt
          }
        }
        if (counts.nonEmpty) {
          val ((l, r), _) = counts.toSeq.minBy { case ((l, r), c) =>
            (-c, l, r) }
          expMerges += ((l, r))
          wf = wf.toSeq.map { case (syms, cnt) =>
            encodeWordSyms(syms, Seq((l, r))) -> cnt
          }.groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
      val gotMerges = LlmTextOps.bpeMerges(spark, dir)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      assert(gotMerges == expMerges.toSeq,
        s"merge sequence diverged on the repeat corpus:\n got=$gotMerges" +
          s"\n exp=${expMerges.toSeq}")
      assert(gotMerges.exists { case (l, r) => l == r },
        "the corpus must force an l == r merge (the same-symbol-run " +
          "hazard) or this pin is vacuous")
      // textbook encode with the learned merges
      val enc = LlmTextOps.bpeEncode(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
      val words = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      val expTok = words.map(w =>
        encodeWordSyms(w.map(_.toString).toVector, gotMerges).length.toLong)
        .sum
      assert(enc == Seq(("srcB", words.length.toLong, expTok)),
        s"encode diverged on the repeat corpus: got=$enc " +
          s"exp=(srcB, ${words.length}, $expTok)")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }

  /** Textbook single- or multi-merge greedy application over a symbol
    * vector (shared by the repeat-corpus trainer and encoder replays).
    */
  private def encodeWordSyms(syms0: Vector[String],
      merges: Seq[(String, String)]): Vector[String] = {
    var syms = syms0
    for ((l, r) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  test("bpe_encode train-consumer reuse: the merges memo serves both rows") {
    // bpe_merges and bpe_encode must not train twice — the trainer is
    // memoized per (session, corpus fingerprint)
    val a = LlmTextOps.bpeTrainMerges(spark, d)
    val b = LlmTextOps.bpeTrainMerges(spark, d)
    assert(a eq b, "the trained merge list must memoize")
  }

  test("quality_nb_cv == driver replay of fold-split NB with unseen-token smoothing") {
    val rows = graft.engine.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def fold(id: Long): Long =
      ((id % 1000000007L) * 2654435761L % 1000000007L) % 5L
    def labelGood(text: String): Boolean = {
      val toks = text.split(" ", -1)
      val n = toks.length.toLong
      val wchars = text.length.toLong - (n - 1L)
      val nAlpha = toks.count(_.exists(c =>
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))).toLong
      val fWc = n < 50L || n > 100000L
      val fMwl = wchars < 3L * n || wchars > 10L * n
      val fAlpha = nAlpha * 10L < n * 8L
      !fWc && !fMwl && !fAlpha
    }
    val docs = rows.map { case (id, text) =>
      (id, text, fold(id), labelGood(text)) }
    val train = docs.filter(_._3 != 0L)
    val held = docs.filter(_._3 == 0L)
    assert(train.nonEmpty && held.nonEmpty, "both sides must be non-empty")
    // class-conditional token counts over the TRAIN folds only
    val counts = scala.collection.mutable.Map.empty[String, (Long, Long)]
    train.foreach { case (_, text, _, good) =>
      text.split(" ", -1).foreach { t =>
        val (g0, b0) = counts.getOrElse(t, (0L, 0L))
        counts(t) = if (good) (g0 + 1L, b0) else (g0, b0 + 1L)
      }
    }
    val totalG = counts.valuesIterator.map(_._1).sum
    val totalB = counts.valuesIterator.map(_._2).sum
    val v = counts.size.toLong
    def wq(tg: Long, tb: Long): Long = {
      val ratio = r6(((tg + 1L) * (totalB + v)).toDouble
        / ((tb + 1L) * (totalG + v)).toDouble)
      math.floor(math.log(ratio) * 1e6 + 0.5).toLong
    }
    val w0 = wq(0L, 0L)
    val ng = train.count(_._4).toLong
    val nb = train.count(!_._4).toLong
    assert(nb > 0L, "prior replay needs both classes in train")
    val priorQ =
      math.floor(math.log(r6(ng.toDouble / nb.toDouble)) * 1e6 + 0.5).toLong
    // score the held-out fold; unseen tokens take the w0 weight
    val confusion = held.map { case (_, text, _, good) =>
      val logit = priorQ + text.split(" ", -1).map { t =>
        counts.get(t).map { case (tg, tb) => wq(tg, tb) }.getOrElse(w0)
      }.sum
      ((good, logit > 0L), logit)
    }.groupBy(_._1).toSeq.map { case ((good, pred), xs) =>
      (good, pred, xs.length.toLong,
        r6(xs.map(_._2).sum.toDouble / xs.length / 1e6))
    }.sortBy(x => (x._1, x._2))
    val got = LlmTextOps.qualityNbCv(spark, d).collect().map(r =>
      (r.getBoolean(0), r.getBoolean(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == confusion,
      s"cv confusion diverged:\n got=$got\n exp=$confusion")
    assert(got.map(_._3).sum == held.length.toLong,
      "every held-out doc must be scored exactly once")
  }

  test("quality_nb_cv exercises the unseen-token weight on a constructed corpus") {
    import spark.implicits._
    // doc_id 0 folds to 0 (held out) and carries a token no training
    // doc has — the coalesce(w_q, w0_q) path must fire, not drop the
    // token (an inner join would silently shorten the logit)
    val good = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = (0L to 9L).map { id =>
      val text = if (id == 0L) good + " zzzunseen" else good + s" extra$id"
      (id, text, "en", "srcU", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_nbcv_unseen").toString
    try {
      docs.write.parquet(s"$dir/documents.parquet")
      val out = LlmTextOps.qualityNbCv(spark, dir).collect()
      assert(out.map(_.getLong(2)).sum ==
        (0L to 9L).count(id =>
          ((id % 1000000007L) * 2654435761L % 1000000007L) % 5L == 0L),
        "all fold-0 docs scored despite the unseen token")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }
}
