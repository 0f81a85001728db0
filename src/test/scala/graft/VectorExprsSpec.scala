package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExprs
import graft.operators.LlmVectorOps

/** Unit + property tests for the native Catalyst expressions. */
class VectorExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dotOf(a: Seq[Float], b: Seq[Float]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(VectorExprs.dot(spark, $"a", $"b").as("d"))
      .collect().head.getDouble(0)

  test("DotProduct matches sequential double fold exactly") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(128)
      val a = Seq.fill(n)(rnd.nextFloat() * 2 - 1)
      val b = Seq.fill(n)(rnd.nextFloat() * 2 - 1)
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      assert(dotOf(a, b) == expected) // bit-exact, not approximate
    }
  }

  test("DotProduct: empty arrays give 0, self-dot is non-negative") {
    assert(dotOf(Seq.empty, Seq.empty) == 0.0)
    val v = Seq(0.5f, -0.25f, 3f)
    assert(dotOf(v, v) >= 0.0)
  }

  test("DotProduct survives codegen and interpreted paths equally") {
    val v = Seq.tabulate(64)(i => (i * 0.01f) - 0.3f)
    val viaDf = dotOf(v, v)
    val e = graft.functions.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        v, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        v, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null).asInstanceOf[Double] == viaDf)
  }

  test("inline-codegen expressions compile with fallback disabled (two per stage)") {
    // DotProduct/SimHash64 emit inline generated code; without
    // ctx.freshName'd locals two instances in one stage collide and
    // silently fall back to interpreted (WARN only). fallback=false
    // turns that into a test failure.
    import org.apache.spark.sql.functions._
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val e = graft.engine.Tables.embeddings(spark, TestSpark.sf0001)
      e.select(
        graft.functions.VectorExprs.dot(spark, col("embedding"),
          col("embedding")).as("a"),
        graft.functions.VectorExprs.dot(spark, col("embedding"),
          reverse(col("embedding"))).as("b"))
        .collect()
      val docs = graft.engine.Tables.documents(spark, TestSpark.sf0001)
        .withColumn("th", expr("transform(split(text, ' '), t -> xxhash64(t))"))
      docs.select(
        graft.functions.VectorExprs.simhash64(spark, col("th")).as("a"),
        graft.functions.VectorExprs.simhash64(spark,
          reverse(col("th"))).as("b"))
        .collect()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("SimHash64: identical token multisets => identical signature, order-invariant") {
    val toks = Seq("spark", "join", "agg", "spark", "window")
    def sig(ts: Seq[String]): Long =
      Seq(Tuple1(ts)).toDF("toks")
        .selectExpr("transform(toks, t -> xxhash64(t)) AS th")
        .select(VectorExprs.simhash64(spark, $"th").as("s"))
        .collect().head.getLong(0)
    assert(sig(toks) == sig(toks.reverse))
    assert(sig(toks) != sig(Seq("totally", "different", "words", "here", "now")))
  }

  test("SimHash64: near-identical docs land within small Hamming distance") {
    val base = Seq.tabulate(60)(i => s"tok$i")
    val nearDup = base.updated(3, "changed").updated(40, "words")
    def sig(ts: Seq[String]): Long =
      Seq(Tuple1(ts)).toDF("toks")
        .selectExpr("transform(toks, t -> xxhash64(t)) AS th")
        .select(VectorExprs.simhash64(spark, $"th").as("s"))
        .collect().head.getLong(0)
    val d = java.lang.Long.bitCount(sig(base) ^ sig(nearDup))
    assert(d <= 16, s"hamming $d unexpectedly large for a near-dup")
  }

  test("ByteStats matches a Scala reference fold on random payloads") {
    val rnd = new scala.util.Random(11)
    val payloads = (Seq(0, 1, 7, 8, 9, 63, 64, 65, 5000) ++
      Seq.fill(12)(rnd.nextInt(700))).map { n =>
      val b = new Array[Byte](n); rnd.nextBytes(b); b
    }
    val rows = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "payload")
      .select($"id", graft.functions.ByteStats.byteStats(
        spark, $"payload").as("bs"))
      .select($"id", $"bs.n_bytes", $"bs.byte_sum", $"bs.frames")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getSeq[Int](3))).toMap
    payloads.zipWithIndex.foreach { case (b, i) =>
      val expSum = b.foldLeft(0L)((a, x) => a + (x & 0xff))
      val stride = math.max(1, b.length / 8)
      val expFrames = b.indices.by(stride).take(8).map(k => b(k) & 0xff)
      assert(rows(i.toLong) == ((b.length, expSum, expFrames)),
        s"payload $i len=${b.length}")
    }
  }

  test("ByteStats stays in codegen with fallback disabled") {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = graft.engine.Tables.documents(spark, TestSpark.sf0001)
        .select(graft.functions.ByteStats.byteStats(spark,
          encode(col("text"), "UTF-8")).as("a"),
          graft.functions.ByteStats.byteStats(spark,
            encode(upper(col("text")), "UTF-8")).as("b"))
        .collect()
      assert(out.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("ByteStats rejects non-binary input at analysis time") {
    // without the type gate a string/int child would surface as a
    // runtime ClassCastException mid-job instead of a clean error
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("abc", 1)).toDF("s", "n")
        .select(graft.functions.ByteStats.byteStats(spark, $"s"))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_byte_stats"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(("abc", 1)).toDF("s", "n")
        .select(graft.functions.ByteStats.byteStats(spark, $"n"))
        .collect()
    }
    assert(e2.getMessage.toLowerCase.contains("binary"))
  }

  test("fakeDecode is deterministic and total") {
    val b = "hello world".getBytes("UTF-8")
    assert(LlmVectorOps.fakeDecode(b) == LlmVectorOps.fakeDecode(b))
    assert(LlmVectorOps.fakeDecode(Array.emptyByteArray) == (1, 1, 3))
  }

  test("Int8DotBytes matches a Scala reference fold on random codes") {
    val rnd = new scala.util.Random(13)
    def codes(n: Int): Array[Byte] =
      Array.fill(n)((rnd.nextInt(255) - 127).toByte)
    val pairs = (Seq((0, 0), (1, 1), (64, 64), (64, 63), (3, 64)) ++
      Seq.fill(10)((rnd.nextInt(100), rnd.nextInt(100))))
      .map { case (n, m) => (codes(n), codes(m)) }
    val rows = pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
      .select($"id", graft.functions.Int8DotBytes.int8Dot(
        spark, $"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      val exp = a.zip(b).foldLeft(0L) { case (acc, (x, y)) =>
        acc + x.toLong * y.toLong
      }.toDouble
      assert(rows(i.toLong) == exp, s"pair $i (${a.length}×${b.length})")
    }
  }

  test("the int8 family stays in codegen with fallback disabled (two per stage)") {
    import org.apache.spark.sql.functions._
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val q = graft.engine.Tables.embeddings(spark, TestSpark.sf0001)
        .select(
          graft.functions.Int8Quantize.int8Quantize(spark,
            col("embedding")).as("qa"),
          graft.functions.Int8Quantize.int8Quantize(spark,
            reverse(col("embedding"))).as("qb"))
        .select(
          graft.functions.Int8Pack.int8Pack(spark, col("qa.q")).as("ca"),
          graft.functions.Int8Pack.int8Pack(spark, col("qb.q")).as("cb"))
        .select(
          graft.functions.Int8DotBytes.int8Dot(spark,
            col("ca"), col("ca")).as("da"),
          graft.functions.Int8DotBytes.int8Dot(spark,
            col("ca"), col("cb")).as("db"))
        .collect()
      assert(q.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("CosineScan == the n² join formulation it replaced (knn and cut forms)") {
    import org.apache.spark.sql.functions._
    val s = spark
    val e = graft.engine.Tables.embeddings(s, TestSpark.sf001)
      .withColumn("norm",
        sqrt(VectorExprs.dot(s, col("embedding"), col("embedding"))))
      .select(col("vec_id"), col("embedding"), col("norm"))
    val corpusArr = e.agg(collect_list(
      struct(col("vec_id"), col("embedding"), col("norm"))).as("corpus"))
    // knn form vs the join + window the old pagerank edge build used
    val gotKnn = e.crossJoin(broadcast(corpusArr))
      .select(col("vec_id").as("src"),
        explode(VectorExprs.cosineKnn(s, col("embedding"), col("norm"),
          col("vec_id"), col("corpus"), 3)).as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = e.select(col("vec_id").as("dst"),
      col("embedding").as("demb"), col("norm").as("dnorm"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      .orderBy(col("score").desc, col("dst").asc)
    val wantKnn = e.join(b, col("vec_id") =!= col("dst"))
      .withColumn("score", graft.engine.Determinism.r6(
        VectorExprs.dot(s, col("embedding"), col("demb"))
          / (col("norm") * col("dnorm"))))
      .select(col("vec_id").as("src"), col("dst"), col("score"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotKnn == wantKnn, "knn edge set")
    // cut form vs the i<j join
    val gotCut = e.crossJoin(broadcast(corpusArr))
      .select(col("vec_id").as("i"),
        explode(VectorExprs.cosineCut(s, col("embedding"), col("norm"),
          col("vec_id"), col("corpus"), 0.4)).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a2 = e.select(col("vec_id").as("i"), col("embedding").as("ei"),
      col("norm").as("ni"))
    val b2 = e.select(col("vec_id").as("j"), col("embedding").as("ej"),
      col("norm").as("nj"))
    val wantCut = a2.join(b2, col("i") < col("j"))
      .withColumn("cs", graft.engine.Determinism.r6(
        VectorExprs.dot(s, col("ei"), col("ej")) / (col("ni") * col("nj"))))
      .where(col("cs") >= 0.4)
      .select("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotCut == wantCut, "cut pair set")
  }

  test("CosineScan breaks score ties by the smaller id (pinned corpus)") {
    import org.apache.spark.sql.functions._
    val s = spark
    // three identical unit vectors + one orthogonal: probe 0 ties 1,2
    val rows = Seq(
      (0L, Seq(1f, 0f)), (2L, Seq(1f, 0f)), (1L, Seq(1f, 0f)),
      (3L, Seq(0f, 1f)))
    val e = rows.toDF("vec_id", "embedding")
      .withColumn("norm",
        sqrt(VectorExprs.dot(s, col("embedding"), col("embedding"))))
    val corpusArr = e.agg(collect_list(
      struct(col("vec_id"), col("embedding"), col("norm"))).as("corpus"))
    val out = e.where(col("vec_id") === 0L)
      .crossJoin(broadcast(corpusArr))
      .select(VectorExprs.cosineKnn(s, col("embedding"), col("norm"),
        col("vec_id"), col("corpus"), 3).as("ids"))
      .collect().head.getSeq[Long](0)
    assert(out == Seq(1L, 2L, 3L), s"tie order: $out")
  }

  test("CosineScanScored agrees with CosineScan ids and the r6 join scores") {
    import org.apache.spark.sql.functions._
    val s = spark
    val e = graft.engine.Tables.embeddings(s, TestSpark.sf001)
      .withColumn("norm",
        sqrt(VectorExprs.dot(s, col("embedding"), col("embedding"))))
      .select(col("vec_id"), col("embedding"), col("norm"))
    val corpusArr = e.agg(collect_list(
      struct(col("vec_id"), col("embedding"), col("norm"))).as("corpus"))
    val scored = e.crossJoin(broadcast(corpusArr))
      .select(col("vec_id").as("src"),
        explode(VectorExprs.cosineKnnScored(s, col("embedding"),
          col("norm"), col("vec_id"), col("corpus"), 3)).as("c"))
      .select(col("src"), col("c.id").as("dst"), col("c.score").as("sc"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    // ids identical to the unscored kernel
    val plain = e.crossJoin(broadcast(corpusArr))
      .select(col("vec_id").as("src"),
        explode(VectorExprs.cosineKnn(s, col("embedding"), col("norm"),
          col("vec_id"), col("corpus"), 3)).as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(scored.keySet == plain, "scored ids == unscored ids")
    // scores identical to the r6 join formulation
    val b = e.select(col("vec_id").as("dst"),
      col("embedding").as("demb"), col("norm").as("dnorm"))
    val want = e.join(b, col("vec_id") =!= col("dst"))
      .withColumn("score", graft.engine.Determinism.r6(
        VectorExprs.dot(s, col("embedding"), col("demb"))
          / (col("norm") * col("dnorm"))))
      .select(col("vec_id").as("src"), col("dst"), col("score"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    scored.foreach { case (k, v) =>
      assert(want(k) == v, s"score drift at $k: kernel $v vs join ${want(k)}")
    }
  }

  test("CosineScanScored k <= 0 yields an empty top-k, not a crash") {
    import org.apache.spark.sql.functions._
    val s = spark
    val e = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
      .withColumn("norm",
        sqrt(VectorExprs.dot(s, col("embedding"), col("embedding"))))
    val corpusArr = e.agg(collect_list(
      struct(col("vec_id"), col("embedding"), col("norm"))).as("corpus"))
    for (k <- Seq(0, -1)) {
      val out = e.crossJoin(broadcast(corpusArr))
        .select(VectorExprs.cosineKnnScored(s, col("embedding"),
          col("norm"), col("vec_id"), col("corpus"), k).as("c"))
        .collect().map(_.getSeq[Any](0))
      assert(out.forall(_.isEmpty), s"k=$k must be empty: ${out.toSeq}")
    }
  }

  test("the int8 family rejects wrong input types at analysis time") {
    def analysisError(f: => Unit): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException](f)
      assert(e.getMessage.toLowerCase.contains("graft_int8"))
    }
    val df = Seq((Seq(1.0, 2.0), "abc")).toDF("darr", "s")
    analysisError(df.select(graft.functions.Int8Quantize
      .int8Quantize(spark, $"darr")).collect())       // double array
    analysisError(df.select(graft.functions.Int8Pack
      .int8Pack(spark, $"s")).collect())              // string
    analysisError(df.select(graft.functions.Int8DotBytes
      .int8Dot(spark, $"s", $"s")).collect())         // string, string
  }
}
