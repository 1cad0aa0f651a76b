package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Kernels over SPARSE vectors in the parallel-array shape the TF-IDF
  * triple family aggregates into: `buckets` (array<long>, strictly
  * ascending, unique) + `weights` (array<double>, aligned). The sparse
  * formulations are BIT-IDENTICAL to running the dense kernels over the
  * densified vector (zeros at every absent bucket), because a zero
  * coordinate's contribution is `0.0 * comp = ±0.0`, and adding ±0.0 to
  * a non-(-0.0) accumulator never changes its bits — the accumulator
  * starts at +0.0 and `+0.0 + -0.0 = +0.0`, so skipping zeros preserves
  * every partial sum exactly (SparseVecSpec pins the parity). What
  * changes is the COST: the dense kernels pay O(dim) per (row, plane)
  * — ruinous at the hashed-TF-IDF production dims (2^18+) where docs
  * are ~100-sparse — while these pay O(nnz).
  *
  * The ascending-bucket contract is load-bearing for the parity (dense
  * accumulation order IS bucket order); callers build the arrays with
  * `sort_array(collect_list(struct(bucket, weight)))`, which sorts by
  * the leading struct field. Buckets hash as 32-bit coordinates (the
  * dense kernels' `j` loop variable), so they must fit an Int — the
  * TF-IDF `pmod(fingerprint, dim)` contract guarantees it. */
object SparseVecKernel {
  import org.apache.spark.sql.catalyst.expressions.XxHash64Function

  /** Sparse random-hyperplane signature over planes
    * [offset, offset+bits): parity with [[VectorKernel.hyperplaneSig]]
    * on the densified vector — same xxhash64 seed chain (int plane,
    * int coordinate, seed 42), same left-to-right double accumulation
    * (in ascending bucket order), same null contract (any null element
    * in either array → signature 0, matching the dense HOF lineage
    * where a null element nullified every projection). */
  def sparseHyperplaneSig(buckets: ArrayData, weights: ArrayData,
      offset: Int, bits: Int): Long = {
    val n = math.min(buckets.numElements(), weights.numElements())
    var i0 = 0
    while (i0 < n) {
      if (buckets.isNullAt(i0) || weights.isNullAt(i0)) return 0L
      i0 += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      val seedP = XxHash64Function.hash(offset + b, IntegerType, 42L)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val j = buckets.getLong(i).toInt
        val h = XxHash64Function.hash(j, IntegerType, seedP)
        val comp = ((((h % 2001L) + 2001L) % 2001L).toDouble - 1000.0) / 1000.0
        acc += weights.getDouble(i) * comp
        i += 1
      }
      if (acc >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Sparse dot product by ascending-bucket merge: parity with
    * [[VectorKernel.dotOrNull]] on the densified pair (shared buckets
    * contribute in ascending order; disjoint buckets contribute the
    * exact ±0.0 the dense loop adds). Null contract: a null element in
    * either array nulls the result (the VecDot stance — never read a
    * hole as 0.0). */
  def sparseDotMerge(ba: ArrayData, wa: ArrayData, bb: ArrayData,
      wb: ArrayData): java.lang.Double = {
    val na = math.min(ba.numElements(), wa.numElements())
    val nb = math.min(bb.numElements(), wb.numElements())
    var k = 0
    while (k < na) {
      if (ba.isNullAt(k) || wa.isNullAt(k)) return null
      k += 1
    }
    k = 0
    while (k < nb) {
      if (bb.isNullAt(k) || wb.isNullAt(k)) return null
      k += 1
    }
    var acc = 0.0
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val x = ba.getLong(i)
      val y = bb.getLong(j)
      if (x == y) { acc += wa.getDouble(i) * wb.getDouble(j); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** `sparse_hyperplane_sig(buckets, weights, offset, bits)` — the
  * [[HyperplaneSig]] signature computed from sparse postings without
  * densifying (see [[SparseVecKernel]]). */
case class SparseHyperplaneSig(left: Expression, right: Expression,
    offset: Int, bits: Int) extends BinaryExpression {
  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  override def dataType: DataType = LongType
  override def prettyName: String = "sparse_hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "sparse_hyperplane_sig requires (array<bigint>, array<double>), " +
          s"got $other")
    }

  override protected def nullSafeEval(b: Any, w: Any): Any =
    SparseVecKernel.sparseHyperplaneSig(b.asInstanceOf[ArrayData],
      w.asInstanceOf[ArrayData], offset, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, w) =>
      s"graft.functions.SparseVecKernel.sparseHyperplaneSig($b, $w, $offset, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `sparse_dot(buckets_a, weights_a, buckets_b, weights_b)` — the
  * [[VecDot]] cosine verify computed by merging two sorted sparse
  * vectors (see [[SparseVecKernel.sparseDotMerge]]). */
case class SparseDot(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sparse_dot"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _),
            ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "sparse_dot requires (array<bigint>, array<double>, " +
          s"array<bigint>, array<double>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    SparseVecKernel.sparseDotMerge(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      d.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.SparseVecKernel.sparseDotMerge(
         |  $a, $b, $c, $d);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}
