package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass MinHash signature as a typed `Aggregator`: input is one
  * 64-bit shingle hash per row, the buffer is the K-slot signature,
  * and each update folds the row into all K affine permutations
  * `(h mod p)·a_i + b_i mod p` (p = 2^31-1) in a tight JVM loop.
  *
  * This replaces a 64× row explosion + groupBy(doc, i).min shape —
  * same result, but the per-row work stays in one imperative update
  * (~96M simple ops at sf0.1 ≈ sub-second) instead of materializing
  * 96M shuffle-agg rows (18 s measured). The buffer is
  * associative/commutative elementwise-min, so Spark's partial+final
  * aggregation (map-side combine) applies as usual — the reference's
  * combiner algebra (mapper.c:75-88) generalized to vector buffers.
  */
object MinHashSignature {
  val K = 64
  private val P = 2147483647L // 2^31 - 1

  // fixed-seed plan-time coefficients — deterministic everywhere
  private val (coefA, coefB) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(K)(1L + math.abs(rnd.nextLong()) % (P - 1)),
      Array.fill(K)(math.abs(rnd.nextLong()) % P))
  }

  object Agg extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.fill(K)(Long.MaxValue)
    def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val hp = ((h % P) + P) % P
      var i = 0
      while (i < K) {
        val v = (hp * coefA(i) + coefB(i)) % P
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < K) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Column function: MinHash signature of a group's hash column. */
  def signature(h: Column): Column = udaf(Agg, ExpressionEncoder[Long]()).apply(h)
}
