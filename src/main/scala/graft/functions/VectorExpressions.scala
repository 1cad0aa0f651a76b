package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two `array<float>` / `array<double>` columns.
  *
  * Semantics match the `zip_with` + `aggregate` composition (sequential
  * left-to-right double accumulation over min(len) elements) but compile to
  * a tight whole-stage-codegen loop — the HOF composition interprets one
  * lambda call per element, which dominates ANN/cosine workloads
  * (~40× slower on 64-dim embeddings).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // a null ELEMENT null-propagates like the zip_with/aggregate
  // composition (and DuckDB's list functions) — the result is null, not
  // a dot product that silently read the hole as 0.0
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left)
    val rf = isFloat(right)
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.VectorKernel.dotOrNull(
         |  $x, $y, $lf, $rf);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Kernel behind [[HyperplaneSig]]: all `bits` sign bits in one compiled
  * pass over the vector. Hash/arithmetic parity with the HOF formulation
  * (`aggregate(zip_with(v, sequence, x*((pmod(xxhash64(p, j), 2001)-1000)
  * /1000)), 0.0, +)` per plane): same xxhash64 seed chain (int p then int
  * j, seed 42), same left-to-right double accumulation. The HOF version
  * interprets one lambda per (plane, element) — 64 planes × 64 dims =
  * 4 096 interpreted calls per row. */
object VectorKernel {
  import org.apache.spark.sql.catalyst.expressions.XxHash64Function

  /** Dot product over min(len) elements; null if either array has a null
    * element in the overlap (parity with HOF null propagation). */
  def dotOrNull(x: ArrayData, y: ArrayData, lf: Boolean,
      rf: Boolean): java.lang.Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def hyperplaneSig(v: ArrayData, offset: Int, bits: Int,
      isFloat: Boolean): Long = {
    val n = v.numElements()
    // parity with the HOF formulation: a null element nullified every
    // projection, and when(null >= 0, bit) took the otherwise(0L) branch
    // for all planes → signature 0
    var i0 = 0
    while (i0 < n) {
      if (v.isNullAt(i0)) return 0L
      i0 += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      val seedP = XxHash64Function.hash(offset + b, IntegerType, 42L)
      var acc = 0.0
      var j = 0
      while (j < n) {
        val h = XxHash64Function.hash(j, IntegerType, seedP)
        val comp = ((((h % 2001L) + 2001L) % 2001L).toDouble - 1000.0) / 1000.0
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        acc += x * comp
        j += 1
      }
      if (acc >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `hyperplane_sig(vec, offset, bits)` — random-hyperplane LSH signature
  * as one codegen'd pass (see [[VectorKernel.hyperplaneSig]]). */
case class HyperplaneSig(child: Expression, offset: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float|double>, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    VectorKernel.hyperplaneSig(v.asInstanceOf[ArrayData], offset, bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernel.hyperplaneSig($c, $offset, $bits, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
