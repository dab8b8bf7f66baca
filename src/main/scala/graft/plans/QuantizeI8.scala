package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native int8 max-abs scalar quantization of an embedding vector —
  * the standard payload-compression step before large-scale vector
  * search (4× smaller than float32; at 100 TB the shuffle and cache
  * working set shrink by the same factor). Each component maps to
  * floor(x·127/max|x| + 0.5), emitted as exact small integers in a
  * double array so downstream integer dot products stay EXACT in
  * IEEE doubles (|dot| ≤ 127²·dim ≪ 2⁵³) — which is what makes the
  * quantized cosine bit-identical to the DuckDB oracle's
  * `list_transform` twin and hash-comparable with no tolerance.
  *
  * floor(x+0.5) is used instead of round() deliberately: both
  * engines define floor identically, while round() half-way handling
  * diverges (Spark shortest-decimal vs DuckDB binary). A zero vector
  * quantizes to zeros (defensive; the oracle corpus has none).
  * Whole-stage codegen via a shared kernel.
  */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  override def prettyName: String = "quantize_i8"

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    QuantizeI8.quantize(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = isFloat
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.QuantizeI8.quantize($v, $f);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeI8 =
    copy(child = newChild)
}

object QuantizeI8 {
  /** Shared kernel for interpreted eval and generated code. */
  def quantize(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val ax = math.abs(x)
      if (ax > maxAbs) maxAbs = ax
      i += 1
    }
    val out = new Array[Any](n)
    val scale = if (maxAbs == 0.0) 0.0 else 127.0 / maxAbs
    i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = math.floor(x * scale + 0.5)
      i += 1
    }
    new GenericArrayData(out)
  }
}
