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
    * to 6 dp; accumulation error is ≪ 1e-6 at these magnitudes.
    * Oracle twin: `ROUND(x, 6)`.
    */
  def r6(c: Column): Column = round(c, 6)
}
