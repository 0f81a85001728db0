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

  test("fakeDecode is deterministic and total") {
    val b = "hello world".getBytes("UTF-8")
    assert(LlmVectorOps.fakeDecode(b) == LlmVectorOps.fakeDecode(b))
    assert(LlmVectorOps.fakeDecode(Array.emptyByteArray) == (1, 1, 3))
  }
}
