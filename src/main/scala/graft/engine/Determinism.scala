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
}
