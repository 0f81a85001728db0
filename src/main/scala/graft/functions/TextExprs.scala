package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the shingle hot path.
  *
  * `Shingle3` computes the distinct space-joined 3-token shingles of a
  * token array in one compiled pass — byte-for-byte the same strings,
  * in the same first-occurrence order, as the declarative form
  *
  * {{{ array_distinct(transform(sequence(0, size(toks) - 3),
  *       i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) }}}
  *
  * which Spark evaluates as an *interpreted* per-element lambda: on the
  * dedup corpus that one expression dominated the whole shingle family
  * (three queries × two plan branches × ~100 lambda evals per doc).
  * Returns an empty array for arrays with fewer than 3 tokens (the
  * declarative form needs an explicit size guard to avoid the
  * descending-sequence trap).
  */
case class Shingle3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle3"

  override def nullSafeEval(input: Any): Any =
    Shingle3.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // loop lives in compiled Scala; one static call per row keeps the
    // expression inside whole-stage codegen
    defineCodeGen(ctx, ev, a => s"graft.functions.Shingle3.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Shingle3 =
    copy(child = newChild)
}

object Shingle3 {
  private val SPACE = UTF8String.fromString(" ")

  /** Distinct 3-gram join of the token array, first-occurrence order.
    * `UTF8String.concatWs` skips null inputs — the same semantics as
    * SQL `concat_ws` (the tokenizer `split` never yields nulls, so
    * this is parity, not a behavior choice).
    */
  def compute(toks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i <= n - 3) {
      seen.add(UTF8String.concatWs(SPACE, toks.getUTF8String(i),
        toks.getUTF8String(i + 1), toks.getUTF8String(i + 2)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def shingle3(s: SparkSession, tokens: Column): Column = {
    TextExprs.register(s)
    call_function("graft_shingle3", tokens)
  }
}

/** All C(k,2) ordered index pairs of a (sorted) id array, as an
  * `array<struct<i,j>>` built in one compiled pass — replaces the
  * interpreted nested `flatten(transform(sequence…, transform(…)))`
  * lambda in the posting-list pair generation (dedup_near /
  * dedup_embed_blocked and their dependents). Given an ascending
  * input, every emitted struct has i < j, in the same order as the
  * declarative form (`TextExprsSpec` pins the equivalence).
  */
case class PairCombinations(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_pairs"

  override def nullSafeEval(input: Any): Any =
    PairCombinations.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PairCombinations.compute($a)")

  override protected def withNewChildInternal(
      newChild: Expression): PairCombinations = copy(child = newChild)
}

object PairCombinations {
  def compute(ds: ArrayData): GenericArrayData = {
    val n = ds.numElements()
    val out = new Array[Any](if (n < 2) 0 else n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val a = ds.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](a, ds.getLong(j)))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def pairs(s: SparkSession, sortedIds: Column): Column = {
    TextExprs.register(s)
    call_function("graft_pairs", sortedIds)
  }
}

/** Count of array elements that belong to a (small) reference set —
  * the compiled form of `size(filter(arr, t -> t IN (...)))`, which
  * interprets the lambda per element (the stopword-ratio hot path of
  * lang_id / text_quality / corpus_filter). The set side is a literal
  * array; membership is a linear scan, the right shape for
  * function-word lists of a handful of entries.
  */
case class CountInSet(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_count_in_set"

  override def nullSafeEval(arr: Any, set: Any): Any =
    CountInSet.compute(arr.asInstanceOf[ArrayData], set.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CountInSet.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountInSet =
    copy(left = newLeft, right = newRight)
}

object CountInSet {
  def compute(arr: ArrayData, set: ArrayData): Int = {
    val n = arr.numElements()
    val m = set.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        var j = 0
        var found = false
        while (j < m && !found) {
          if (t.equals(set.getUTF8String(j))) found = true
          j += 1
        }
        if (found) cnt += 1
      }
      i += 1
    }
    cnt
  }

  def countInSet(s: SparkSession, arr: Column, set: Seq[String]): Column = {
    TextExprs.register(s)
    call_function("graft_count_in_set", arr,
      org.apache.spark.sql.functions.typedLit(set))
  }
}

object TextExprs {
  def register(s: SparkSession): Unit = {
    // Guard each name individually: a session built via GraftExtensions
    // already has graft_shingle3 injected but not the other two, so a
    // single shared guard would short-circuit and leave graft_pairs /
    // graft_count_in_set unresolvable on the canonical entry point.
    Registration.registerOnce(s, "graft_shingle3",
      exprs => Shingle3(exprs.head))
    Registration.registerOnce(s, "graft_pairs",
      exprs => PairCombinations(exprs.head))
    Registration.registerOnce(s, "graft_count_in_set",
      exprs => CountInSet(exprs(0), exprs(1)))
  }
}

/** Per-name register-once helper shared by all graft function families.
  * `createOrReplaceTempFunction` logs a replace warning on every call,
  * so each name is guarded by its own `functionExists` probe — never a
  * sibling's (extension-injected sessions carry partial overlap).
  */
object Registration {
  def registerOnce(
      s: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = s.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name))) {
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
