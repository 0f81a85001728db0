package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers that make float-bearing query output hash-stable across
  * Spark (parallel, partial-agg order varies) and the DuckDB oracle
  * (single-threaded). See SURVEY.md §7 "Float determinism for t2".
  */
object Determinism {
  /** Exact sum of a 2-dp-money double column: cast each value to
    * DECIMAL(18,6) (exact — testdata doubles are all 2 dp), sum in
    * decimal (associative & commutative ⇒ shuffle-order-proof), then
    * report as double. Oracle twin:
    * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Round a small-magnitude floating aggregate (avg, cosine, ratio)
    * to 6 dp via explicit floor arithmetic — NOT the engine's round().
    *
    * Engine round() implementations disagree on exact 6 dp ties
    * (Spark HALF_UPs the exact decimal expansion; DuckDB multiplies by
    * 1e6 first and rounds the product), and 2-dp money divided by
    * power-of-two counts *does* land on exact ties (seen at sf0.1:
    * avg = 43.4728125). `floor(x*1e6 + 0.5)/1e6` is the same IEEE op
    * sequence in both engines, so results are identical even on ties.
    * Oracle twin: `floor((x) * 1000000 + 0.5) / 1000000`.
    */
  def r6(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** Exact per-group (n, mu, sigma) over a ≤2-dp value column — the
    * moments recipe hardened against catastrophic cancellation: the
    * population-variance NUMERATOR n·Σv² − (Σv)² is computed entirely
    * IN DECIMAL, where it is exact and ≥ 0 by Cauchy–Schwarz, so
    * `sigma` is NEVER NaN and is exactly 0.0 for a constant group.
    * The double form s2/n − (s1/n)² instead rounds to ±1e-18 on flat
    * groups: sqrt(negative) = NaN, and in Spark `NaN > 0.0` is TRUE
    * (NaN sorts greatest), so a `sigma > 0` guard silently passes and
    * flags every row of the group — while DuckDB *errors* on the
    * negative sqrt. Exact decimal kills both failure modes at the
    * source.
    *
    * `scale` picks the quantization of the value column — inputs with
    * more decimals than `scale` are HALF_UP-rounded before any math,
    * so choose it to cover the data (sub-cent crypto prices need
    * scale 6; a scale-2 cast would flatten their variance to exactly
    * 0 and silently drop them from any σ > 0 consumer).
    *
    * Width budget (every op exact AND under precision 38 in BOTH
    * engines, including Spark's result-precision+1 rule on the
    * subtraction), per supported scale:
    *  - scale 2: |Σv| < 10¹⁴, Σv² < 10¹⁸, n < 10¹⁰
    *  - scale 6: |v| < 10¹⁰, |Σv| < 10¹⁰, Σv² < 10¹³, n < 10¹⁰
    *    (narrower sums — bound the history window, e.g. per-day stats)
    * Past a bound, ANSI decimal overflow throws loudly rather than
    * silently corrupting. Oracle twin for scale 2 (for scale 6
    * substitute DECIMAL(16,6)/DECIMAL(25,12)), byte-for-byte the same
    * op sequence:
    * {{{
    * SELECT g, CAST(COUNT(*) AS DOUBLE) AS n,
    *        CAST(CAST(SUM(CAST(v AS DECIMAL(16,2))) AS DECIMAL(16,2))
    *             AS DOUBLE) / COUNT(*) AS mu,
    *        sqrt(CAST(CAST(COUNT(*) AS DECIMAL(10,0))
    *                    * CAST(SUM(CAST(v AS DECIMAL(16,2))
    *                               * CAST(v AS DECIMAL(16,2)))
    *                           AS DECIMAL(22,4))
    *                  - CAST(SUM(CAST(v AS DECIMAL(16,2)))
    *                         AS DECIMAL(16,2))
    *                    * CAST(SUM(CAST(v AS DECIMAL(16,2)))
    *                           AS DECIMAL(16,2)) AS DOUBLE))
    *          / COUNT(*) AS sigma
    * FROM t GROUP BY g
    * }}}
    */
  def muSigma(df: org.apache.spark.sql.DataFrame, groupCol: String,
      valueCol: String, scale: Int = 2): org.apache.spark.sql.DataFrame = {
    val p2 = scale match {
      case 2 => 22
      case 6 => 25
      case other => throw new IllegalArgumentException(
        s"muSigma supports scale 2 or 6 (width budgets derived in the " +
          s"scaladoc), got $other")
    }
    def dec(c: Column) = c.cast(DecimalType(16, scale))
    val v = col(valueCol)
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(v)).cast(DecimalType(16, scale)).as("s1d"),
        sum(dec(v) * dec(v)).cast(DecimalType(p2, 2 * scale)).as("s2d"))
      .select(col(groupCol),
        col("n"),
        (col("s1d").cast("double") / col("n")).as("mu"),
        (sqrt((col("n").cast(DecimalType(10, 0)) * col("s2d")
            - col("s1d") * col("s1d")).cast("double"))
          / col("n")).as("sigma"))
  }
}
