package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact-integer Gram/moment sums over a vector column as ONE native
  * `TypedImperativeAggregate` — the distributed half of PCA-style
  * spectral queries (q188). Each input vector is quantized to
  * ⌊x·10⁴⌋ (the engine's established cross-engine exactness scale,
  * q110/q145) and the buffer accumulates, in plain JVM longs,
  *
  *   n, S_i = Σ q_i, G_ij = Σ q_i·q_j (upper triangle, i ≤ j),
  *
  * so the covariance n·G − S·Sᵀ is reconstructible exactly on the
  * driver. The plan is ObjectHashAggregate(partial) → one exchange of
  * a single ~(d²/2+d)-long buffer per partition → final: the corpus
  * is scanned once and NOTHING row-sized shuffles — the alternative
  * posexplode + self-join + (i,j) groupBy shape shuffles N·d rows and
  * inflates N·d² join rows through the aggregate.
  *
  * Overflow headroom: |q| ≤ 10⁴·max|x|; for unit-scale embeddings
  * (|x| ≤ 1) a G term is ≤ 10⁸, so long sums hold to N ≈ 9·10¹⁰ rows
  * — beyond any 100 TB corpus. Dimension mismatches raise (the
  * CosineSimilarity strict-dim lesson).
  *
  * Reference analogue: the R9/R10 aggregate algebra of
  * `reference/src/reducer.c` — here as a buffer-typed aggregate so
  * Spark plans map-side combine exactly like a sum.
  */
case class GramSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramBuffer] {

  override def prettyName: String = "gram_sums"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }

  override def createAggregationBuffer(): GramBuffer = new GramBuffer

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val d = a.numElements()
      buf.ensure(d, prettyName)
      val q = new Array[Long](d)
      var i = 0
      while (i < d) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        q(i) = math.floor(x * 10000d).toLong
        i += 1
      }
      var k = 0
      i = 0
      while (i < d) {
        buf.s(i) += q(i)
        var j = i
        while (j < d) { buf.g(k) += q(i) * q(j); j += 1; k += 1 }
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(a: GramBuffer, b: GramBuffer): GramBuffer = {
    if (b.s != null) {
      a.ensure(b.s.length, prettyName)
      var i = 0
      while (i < b.s.length) { a.s(i) += b.s(i); i += 1 }
      i = 0
      while (i < b.g.length) { a.g(i) += b.g(i); i += 1 }
      a.n += b.n
    }
    a
  }

  /** Flat layout `[d, n, S_0..S_{d-1}, G_tri...]` with G_tri the
    * row-major upper triangle (i ≤ j) — `GramBuffer.triIndex` maps
    * (i,j); the consumer mirrors.
    */
  override def eval(buf: GramBuffer): Any =
    if (buf.s == null) null
    else {
      val out = new Array[Long](2 + buf.s.length + buf.g.length)
      out(0) = buf.s.length.toLong
      out(1) = buf.n
      System.arraycopy(buf.s, 0, out, 2, buf.s.length)
      System.arraycopy(buf.g, 0, out, 2 + buf.s.length, buf.g.length)
      new GenericArrayData(out)
    }

  override def serialize(buf: GramBuffer): Array[Byte] = {
    if (buf.s == null) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(8 * (2 + buf.s.length + buf.g.length))
    bb.putLong(buf.s.length.toLong)
    bb.putLong(buf.n)
    buf.s.foreach(bb.putLong)
    buf.g.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val buf = new GramBuffer
    if (bytes.nonEmpty) {
      val bb = ByteBuffer.wrap(bytes)
      val d = bb.getLong.toInt
      buf.ensure(d, prettyName)
      buf.n = bb.getLong
      var i = 0
      while (i < d) { buf.s(i) = bb.getLong; i += 1 }
      i = 0
      while (i < buf.g.length) { buf.g(i) = bb.getLong; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramSumAgg =
    copy(child = newChildren.head)
}

/** Mutable accumulator: count, per-dim quantized sums, and the upper
  * triangle of the quantized Gram matrix (row-major, i ≤ j).
  */
final class GramBuffer {
  var n: Long = 0L
  var s: Array[Long] = _
  var g: Array[Long] = _

  def ensure(d: Int, name: String): Unit =
    if (s == null) {
      s = new Array[Long](d)
      g = new Array[Long](d * (d + 1) / 2)
    } else if (s.length != d) {
      throw new IllegalArgumentException(
        s"$name: dimension mismatch (${s.length} vs $d)")
    }
}

object GramBuffer {
  /** Index of (i,j), i ≤ j, in the row-major upper-triangle layout. */
  def triIndex(i: Int, j: Int, d: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i)
}
