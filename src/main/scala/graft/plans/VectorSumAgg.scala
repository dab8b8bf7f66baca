package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector sum as a native `TypedImperativeAggregate` —
  * the missing Spark primitive for centroid updates and any
  * "mean vector per group" aggregation. The buffer is one
  * `Array[Double]` of the vector dimension, so the plan is
  * `ObjectHashAggregate(partial)` → exchange → final: each input
  * partition reduces its rows to ONE vector before the shuffle.
  *
  * This replaces the posexplode → groupBy(group, component) →
  * re-assemble idiom (3 shuffles, dim× row inflation) with a single
  * shuffle moving one dim-length vector per (partition, group) — the
  * same shape Spark MLlib's k-means uses internally. Dimension
  * mismatches raise (the CosineSimilarity strict-dim lesson: a
  * silently truncated sum is a plausible wrong answer).
  */
case class VectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumBuffer] {

  override def prettyName: String = "vector_sum"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      buf.ensure(n, prettyName)
      var i = 0
      while (i < n) {
        buf.sum(i) += (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
        i += 1
      }
      buf.count += 1
    }
    buf
  }

  override def merge(a: VecSumBuffer, b: VecSumBuffer): VecSumBuffer = {
    if (b.sum != null) {
      a.ensure(b.sum.length, prettyName)
      var i = 0
      while (i < b.sum.length) { a.sum(i) += b.sum(i); i += 1 }
      a.count += b.count
    }
    a
  }

  override def eval(buf: VecSumBuffer): Any =
    if (buf.sum == null) null
    else new GenericArrayData(buf.sum.map(x => x: Any))

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val n = if (buf.sum == null) 0 else buf.sum.length
    val bb = ByteBuffer.allocate(12 + n * 8)
    bb.putLong(buf.count).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sum(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VecSumBuffer
    buf.count = bb.getLong()
    val n = bb.getInt()
    if (n > 0) {
      buf.sum = new Array[Double](n)
      var i = 0
      while (i < n) { buf.sum(i) = bb.getDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = newChildren(0))
}

/** Lazily-sized accumulator: dimension fixes on the first row and any
  * later mismatch raises.
  */
final class VecSumBuffer {
  var sum: Array[Double] = _
  var count: Long = 0L

  def ensure(n: Int, name: String): Unit =
    if (sum == null) sum = new Array[Double](n)
    else if (sum.length != n)
      throw new IllegalArgumentException(
        s"$name: vector dimension mismatch (${sum.length} vs $n)")
}
