package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns
  * (FIXTURES.md `embeddings.embedding`), built entirely from Catalyst
  * higher-order functions — no UDFs, so the expressions serialize to
  * any executor and stay inside the optimized plan.
  *
  * All arithmetic is double-precision left-to-right folds, matching
  * DuckDB's `list_dot_product` evaluation order so oracle comparisons
  * are bit-stable (rounded at output anyway).
  */
object VectorFunctions {

  /** Cast a float vector to double element-wise (compute precision). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two equal-length double vectors: sequential fold
    * over `zip_with` products.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(v: Column): Column = dot(v, v)

  /** Cosine similarity, computed as dot/(sqrt(na*nb)) — the same
    * formula the oracle SQL spells out with `list_dot_product`.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))

  /** Cosine when the squared norms are precomputed columns (saves
    * recomputing per candidate pair in a join).
    */
  def cosineWithNorms(dotAb: Column, normSqA: Column, normSqB: Column): Column =
    dotAb / sqrt(normSqA * normSqB)

  /** Squared euclidean distance. */
  def distSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
}
