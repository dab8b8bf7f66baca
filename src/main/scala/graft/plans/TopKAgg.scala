package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k by `(score DESC, id ASC)` as a native
  * `TypedImperativeAggregate`. The aggregation buffer holds at most k
  * `(score, id)` pairs, so Spark plans it as
  * `ObjectHashAggregate(partial)` → exchange → `ObjectHashAggregate(final)`:
  * every input partition pre-trims to its LOCAL top-k before the
  * shuffle and the exchange moves ≤ k rows per (partition, group).
  *
  * This is the scale fix for "rank within a low-cardinality group"
  * (q38's 20 query ids): a `row_number()` window shuffles EVERY scored
  * row into at most |groups| reducer partitions — reducer parallelism
  * is capped at 20 forever — while this aggregate's reduce input is
  * k·mapPartitions rows regardless of corpus size. Same contract as
  * the reference's sort-merge reduce (reducer.c:23-38) specialized to
  * a bounded heap.
  *
  * Output: `array<struct<score double, id bigint>>` sorted best-first,
  * ties broken by ascending id — exactly the `row_number() OVER
  * (ORDER BY score DESC, id)` order, so `posexplode` reconstructs the
  * rank column.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def prettyName: String = "topk_by_score"
  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: id must be BIGINT, got ${id.dataType.sql}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be an INT literal")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.scores(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

/** k-bounded buffer kept sorted best-first by (score DESC, id ASC);
  * rejecting a row that can't place is one comparison against the
  * current worst, an accepted row is a binary search + arraycopy —
  * O(log k + k) on the rare improving row, O(1) otherwise.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n: Int = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(s: Double, i: Long): Unit = {
    if (n == k && !better(s, i, scores(n - 1), ids(n - 1))) return
    // binary search for the insertion point in best-first order
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
