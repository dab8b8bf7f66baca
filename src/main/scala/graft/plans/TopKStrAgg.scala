package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [[TopKByScore]]'s STRING-id sibling (round 18): bounded top-k by
  * `(score DESC, id ASC)` where the tiebreaker is a string — the
  * "top terms per group" shape (q217's per-source saliency top-5).
  * Same contract: ≤ k pairs of partial state per partition
  * (ObjectHashAggregate partial → exchange → final), output sorted
  * best-first so `posexplode` reconstructs `row_number() OVER
  * (ORDER BY score DESC, id)`. String comparisons are binary UTF-8 —
  * Spark's ORDER BY order and DuckDB's default collation alike.
  */
case class TopKByScoreStr(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKStrBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def prettyName: String = "topk_by_score_str"
  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", StringType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: id must be STRING, got ${id.dataType.sql}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be an INT literal")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // clone: the UTF8String may point into a reused row buffer
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  override def merge(a: TopKStrBuffer, b: TopKStrBuffer): TopKStrBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKStrBuffer): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKStrBuffer): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buf.n) { bytes += 4 + buf.ids(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(8 + buf.n * 8 + bytes)
    bb.putInt(buf.k).putInt(buf.n)
    i = 0
    while (i < buf.n) {
      bb.putDouble(buf.scores(i))
      val b = buf.ids(i).getBytes
      bb.putInt(b.length).put(b)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKStrBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.scores(i) = bb.getDouble()
      val b = new Array[Byte](bb.getInt())
      bb.get(b)
      buf.ids(i) = UTF8String.fromBytes(b)
      i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreStr =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

/** k-bounded buffer kept sorted best-first by (score DESC, id ASC
  * binary UTF-8) — the [[TopKBuffer]] mechanics with string ids.
  */
final class TopKStrBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[UTF8String](k)
  var n: Int = 0

  @inline private def better(s1: Double, i1: UTF8String,
      s2: Double, i2: UTF8String): Boolean =
    s1 > s2 || (s1 == s2 && i1.compareTo(i2) < 0)

  def insert(s: Double, i: UTF8String): Unit = {
    if (n == k && !better(s, i, scores(n - 1), ids(n - 1))) return
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(scores(mid), ids(mid), s, i)) lo = mid + 1 else hi = mid
    }
    val insertAt = lo
    val newN = math.min(n + 1, k)
    val toMove = newN - insertAt - 1
    if (toMove > 0) {
      System.arraycopy(scores, insertAt, scores, insertAt + 1, toMove)
      System.arraycopy(ids, insertAt, ids, insertAt + 1, toMove)
    }
    scores(insertAt) = s
    ids(insertAt) = i
    n = newN
  }
}
