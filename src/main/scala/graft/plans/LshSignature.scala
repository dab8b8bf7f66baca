package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Signed-random-projection LSH signature as a native expression:
  * bit i of the result is the sign of the projection of the input
  * vector onto a pseudo-random Rademacher (±1) direction derived by
  * hashing (seed, i, j) per component — so the signature needs NO
  * driver-resident plane matrix and NO knowledge of the vector
  * dimension, which is what lets the similarity-join rewrite rule
  * (plans.SimilarityJoinRewrite) apply to any array<float|double>
  * column statically. Collision probability per bit approximates
  * 1 − θ/π as for Gaussian planes (Rademacher projections share the
  * sign-agreement property at embedding dimensionalities).
  *
  * `lsh_sig(vec, nBits, seed)`: nBits ≤ 64 (packed little-endian into
  * one long), both nBits and seed must be foldable.
  */
case class LshSignature(vec: Expression, nBits: Expression, seed: Expression)
    extends TernaryExpression {

  override def prettyName: String = "lsh_sig"
  override def first: Expression = vec
  override def second: Expression = nBits
  override def third: Expression = seed
  override def dataType: DataType = LongType

  private def vecOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!vecOk(vec.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float|double> vector, got ${vec.dataType.sql}")
    else if (!(nBits.foldable && nBits.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName nBits must be a literal int")
    else if (!(seed.foldable && seed.dataType == LongType ||
        seed.foldable && seed.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName seed must be a literal int/long")
    else {
      val n = nBits.eval().asInstanceOf[Int]
      if (n < 1 || n > 64)
        TypeCheckResult.TypeCheckFailure(s"$prettyName nBits must be in [1, 64]")
      else TypeCheckResult.TypeCheckSuccess
    }

  private lazy val isFloat =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val bits = nBits.eval().asInstanceOf[Int]
  private lazy val seedVal: Long = seed.eval() match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l.toLong
    case other => throw new IllegalArgumentException(s"lsh_sig seed: $other")
  }

  override def nullSafeEval(v: Any, b: Any, s: Any): Any =
    LshSignature.compute(v.asInstanceOf[ArrayData], isFloat, bits, seedVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      s"${ev.value} = graft.plans.LshSignature.compute($v, $isFloat, $bits, ${seedVal}L);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LshSignature =
    copy(vec = f, nBits = s, seed = t)
}

object LshSignature {

  /** Scramble of (seed, bit, component) → lowest bit selects the ±1
    * Rademacher entry. The lane key folds Knuth's LCG constants (both
    * < 2^63) and finishes with the [[Mix64]] kernel, so every step is
    * mod-2^64 arithmetic a DuckDB oracle reproduces exactly in
    * HUGEINT (no 128-bit overflow — that is why the splitmix64
    * constants, which exceed 2^63, are NOT used here). This is what
    * makes the whole hyperplane-LSH band join oracle-checkable (see
    * q60). Shared by interpreted eval and generated code (static
    * forwarder).
    */
  def compute(vec: ArrayData, isFloat: Boolean, nBits: Int, seed: Long): Long = {
    val n = vec.numElements()
    var sig = 0L
    var i = 0
    while (i < nBits) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        val x: Double = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        val z = Mix64.mix(
          seed + i.toLong * 6364136223846793005L + (j.toLong + 1L) * 1442695040888963407L)
        acc += (if ((z & 1L) == 0L) x else -x)
        j += 1
      }
      if (acc > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}
