package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.functions.CorrMomentsAgg

/** The compiled `graft_corr_moments` kernel is equality-pinned —
  * doubles bit-for-bit, not approximately — to the 14-column DECIMAL
  * SUM formulation it replaced in `corr_matrix`: both produce exact
  * fixed-point integer sums converted once to double, so any
  * divergence is a kernel bug (quantization, 128-bit carry, or
  * BigDecimal conversion), never float noise.
  */
class CorrMomentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def decimalTwin(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String]) = {
    def dec(c: String) = col(c).cast(DecimalType(18, 2))
    val aggExprs = Seq(count(lit(1)).cast("double").as("n")) ++
      cols.map(c => sum(dec(c)).cast("double").as(s"s_$c")) ++
      (for { i <- cols.indices; j <- i until cols.length } yield {
        val (a, b) = (cols(i), cols(j))
        sum(dec(a) * dec(b)).cast("double").as(s"p_${a}_$b")
      })
    df.agg(aggExprs.head, aggExprs.tail: _*).head()
  }

  private def kernel(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String]) =
    df.agg(CorrMomentsAgg.corrMoments(spark,
        col(cols(0)), col(cols(1)), col(cols(2)), col(cols(3))).as("mm"))
      .select(col("mm.n"), col("mm.s"), col("mm.p")).head()

  private def compare(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String]): Unit = {
    val slow = decimalTwin(df, cols)
    val fast = kernel(df, cols)
    assert(java.lang.Double.doubleToLongBits(fast.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(slow.getDouble(0)), "n")
    val s = fast.getSeq[Double](1)
    cols.indices.foreach { i =>
      assert(java.lang.Double.doubleToLongBits(s(i)) ==
        java.lang.Double.doubleToLongBits(slow.getDouble(1 + i)),
        s"linear sum ${cols(i)}: kernel=${s(i)} decimal=${slow.getDouble(1 + i)}")
    }
    val p = fast.getSeq[Double](2)
    var cell = 0
    for { i <- cols.indices; j <- i until cols.length } {
      val slowIdx = 1 + cols.length + cell
      assert(java.lang.Double.doubleToLongBits(p(cell)) ==
        java.lang.Double.doubleToLongBits(slow.getDouble(slowIdx)),
        s"product (${cols(i)},${cols(j)}): kernel=${p(cell)} " +
          s"decimal=${slow.getDouble(slowIdx)}")
      cell += 1
    }
  }

  private val measures =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  test("kernel is bit-identical to the decimal twin on lineitem") {
    compare(Tables.lineitem(spark, TestSpark.sf0001), measures)
  }

  test("kernel matches on adversarial doubles incl. shortest-repr ties") {
    // 0.015 / 0.045: nearest double sits BELOW the decimal tie, so
    // exact-binary HALF_UP would round DOWN while Spark's cast
    // (shortest rendering via BigDecimal.valueOf) rounds UP — the
    // exact trap the kernel's quantizer must reproduce; plus
    // max-range prices driving the 128-bit product cells and dyadic
    // exact ties (0.125)
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(2000)((
      rnd.nextInt(5000) / 100.0 + 0.015,
      90000.0 + rnd.nextInt(1500000) / 100.0,
      0.125,
      rnd.nextInt(9) / 100.0 + 0.045))
    val df = rows.toDF(measures: _*)
    compare(df, measures)
  }

  test("merge carries across partitions (128-bit cells survive repartition)") {
    // force many partials so merge() runs with non-trivial carries:
    // max-price squares overflow one long after ~80k rows, so 200k
    // rows of near-max prices exercise hi-word accumulation in both
    // update and merge
    val df = spark.range(200000)
      .select(
        (col("id") % 50 + 1).cast("double").as("l_quantity"),
        lit(104949.50).as("l_extendedprice"),
        lit(0.1).as("l_discount"),
        lit(0.08).as("l_tax"))
      .repartition(32)
    compare(df, measures)
  }

  test("null measure fails loudly") {
    val df = Seq((Some(1.0), 2.0, 3.0, 4.0), (None, 2.0, 3.0, 4.0))
      .toDF(measures: _*)
    val e = intercept[Exception] {
      kernel(df, measures)
    }
    assert(e.getMessage.contains("null measure")
      || Option(e.getCause).exists(_.getMessage.contains("null measure")))
  }
}
