package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, MinHash32, Shingle3, SimHash64}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions first-class SQL functions in any session built with
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * so pure-SQL users get `graft_dot(a, b)` / `graft_simhash64(hs)`
  * without touching the Scala API (`VectorExprs` registers the same
  * builders per-session for DataFrame callers).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_dot(array<float>, array<float>) takes 2 arguments, got ${exprs.length}")
        DotProduct(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"graft_simhash64(array<bigint>) takes 1 argument, got ${exprs.length}")
        SimHash64(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_shingle3"),
      new ExpressionInfo(classOf[Shingle3].getName, "graft_shingle3"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"graft_shingle3(array<string>) takes 1 argument, got ${exprs.length}")
        Shingle3(exprs.head)
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_minhash32_arr"),
      new ExpressionInfo(classOf[MinHash32].getName, "graft_minhash32_arr"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"graft_minhash32_arr(array<string>) takes 1 argument, got ${exprs.length}")
        MinHash32(exprs.head)
      }))
  }
}
