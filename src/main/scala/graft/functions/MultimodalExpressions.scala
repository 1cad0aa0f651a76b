package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Shared kernel for [[DhashBits]] — static and Java-callable so the
  * generated code is ONE call per row. */
object DhashKernel {
  /** 63 adjacent-gradient bits over the first 64 bytes: bit j =
    * [byte_j < byte_{j+1}] unsigned, j = 0..62; comparisons past the
    * payload contribute 0 (the short-frame contract). */
  def bits(b: Array[Byte]): Long = {
    var acc = 0L
    var j = 0
    val n = math.min(63, b.length - 1)
    while (j < n) {
      if ((b(j) & 0xff) < (b(j + 1) & 0xff)) acc |= 1L << j
      j += 1
    }
    acc
  }
}

/** The dHash fingerprint kernel as a codegen'd expression over the RAW
  * binary payload — no hex detour, no per-row array allocation, one
  * tight loop per row (r17: the r16 `transform`/`zip_with`/`aggregate`
  * formulation dropped the whole fingerprint column out of whole-stage
  * codegen into interpreted higher-order functions and tripled m8's
  * isolated median, 1.8 → 5.1 s at sf0.1 — tools/m8_ab_r17.txt; this
  * expression restores codegen AND keeps the parse-each-byte-once
  * property that motivated the r16 rewrite). Bit-identical to both
  * prior formulations on every input (spec-pinned parity). */
case class DhashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dhash_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dhash_bits requires binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(b: Any): Any =
    DhashKernel.bits(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DhashKernel.bits($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
