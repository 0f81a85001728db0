package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature sketch as a `TypedImperativeAggregate` (SURVEY §7
  * custom piece for E18-at-scale): one mutable `Array[Long]` buffer of
  * `numHashes` running minima per group, updated in a single pass —
  * the sketch-shaped alternative to 32 separate `min(...)` aggregate
  * columns (identical permutation constants, identical signatures).
  *
  * Same modular permutation family as `LlmTextOps.dedupMinhash`:
  * h_p = ((h mod P)·a_p + b_p) mod Q with a_p = 2654435761 + 2p,
  * b_p = 40503·p, P = 1e9+7, Q = 2^32+15 — products stay below 2^63,
  * so ANSI mode can't overflow.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int = 32,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P = 1000000007L
  private val Q = 4294967311L

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val hp = { val m = h % P; if (m < 0) m + P else m }
      var p = 0
      while (p < numHashes) {
        val perm = (hp * (2654435761L + 2L * p) + 40503L * p) % Q
        if (perm < buf(p)) buf(p) = perm
        p += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numHashes) { if (b(p) < a(p)) a(p) = b(p); p += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_minhash"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  def register(s: SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    // register-once per session (see VectorExprs.register)
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash32")))
      reg.createOrReplaceTempFunction(
        "graft_minhash32",
        exprs => MinHashAgg(exprs.head).toAggregateExpression(),
        "built-in")
  }

  /** Aggregate column: 32-long MinHash signature of a LongType hash
    * column.
    */
  def minhash32(s: SparkSession, hashCol: Column): Column = {
    register(s)
    call_function("graft_minhash32", hashCol)
  }
}
