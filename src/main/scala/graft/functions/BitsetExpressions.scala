package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection cardinality of two bitsets stored as `array<bigint>`:
  * Σ popcount(a[i] & b[i]). Codegen'd tight loop — the verification kernel
  * for set-similarity joins over small vocabularies, where a 1000-bit
  * bitset AND beats string-array intersection by orders of magnitude.
  */
case class BitsetInterCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bitset_inter_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"bitset_inter_count requires array<bigint> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($x.getLong($i) & $y.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity of two sets stored as dense bitsets
  * (`array<bigint>`) with their true cardinalities: inter/(sza+szb−inter)
  * in ONE pass. Exists because the composed form
  * `inter/(sza+szb−inter) ≥ θ` names the intersection twice and Catalyst
  * does not CSE inside a join condition — on an all-pairs join that
  * doubles the hot-loop popcount work. Returns 0.0 for an empty union. */
case class BitsetJaccard(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "bitset_jaccard"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bitset_jaccard requires (array<bigint>, array<bigint>, int, int), got " +
          children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
    }

  override def nullSafeEval(a: Any, b: Any, sa: Any, sb: Any): Any =
    BitsetKernel.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      sa.asInstanceOf[Int], sb.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, sa, sb) =>
      s"graft.functions.BitsetKernel.jaccard($a, $b, $sa, $sb)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

/** Builds a dense `array<bigint>` bitset of `nWords` words from an array of
  * bit ids (0-indexed). One compiled pass — replaces the
  * groupBy-per-word + map densify it superseded. Ids outside
  * [0, nWords*64) are ignored defensively. */
case class BitsetFromIds(child: Expression, nWords: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nWords >= 1, "nWords must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitset_from_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitset_from_ids requires array<int>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(ids: Any): Any =
    BitsetKernel.fromIds(ids.asInstanceOf[ArrayData], nWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BitsetKernel.fromIds($c, $nWords)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Jaccard similarity of two DISTINCT-element string sets stored as
  * binary-SORTED `array<string>` (what `sort_array` produces): one merge
  * pass counts the intersection, union = |a|+|b|−inter. Exact — no
  * hashing — and far cheaper than `array_intersect` (no per-pair hash-set
  * build) or a dense-bitset detour (no vocabulary window / id join /
  * bitset materialization stages at all). The set-similarity verify
  * kernel. */
case class SortedStringJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_string_jaccard"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_string_jaccard requires array<string> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitsetKernel.sortedStringJaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BitsetKernel.sortedStringJaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** UPPER BOUND on the Jaccard similarity of two string sets, computed
  * from their SORTED `array<bigint>` xxhash64 images in a primitive merge
  * (no per-element object allocation — ~5× faster than the string merge
  * on short shingles). Hash collisions can only inflate the intersection
  * (each common string contributes its hash to both sides, so the
  * multiset-min merge count ≥ |A∩B|), never deflate it — a `≥ θ` filter
  * on this bound is therefore a LOSSLESS prefilter for true-Jaccard ≥ θ;
  * survivors get the exact [[SortedStringJaccard]]. */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_long_jaccard"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_long_jaccard requires array<bigint> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitsetKernel.sortedLongJaccard(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BitsetKernel.sortedLongJaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Boolean `sorted_long_jaccard(a, b) ≥ theta` with merge early-exit —
  * the all-pairs hot-loop form: most pairs bail long before the merge
  * ends (see [[BitsetKernel.sortedLongJaccardGE]]; result is identical
  * to filtering on the full [[SortedLongJaccard]]). */
case class SortedLongJaccardGE(left: Expression, right: Expression,
    theta: Double) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_long_jaccard_ge"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // theta is interpolated into generated Java source (doGenCode), so
      // a NaN/Infinity — reachable through the registered SQL function —
      // must fail analysis cleanly, not produce uncompilable codegen
      // ("NaN" is not a Java literal)
      case _ if !java.lang.Double.isFinite(theta) || theta < 0 || theta > 1 =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_long_jaccard_ge requires a finite theta in [0, 1], got $theta")
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_long_jaccard_ge requires array<bigint> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitsetKernel.sortedLongJaccardGE(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], theta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BitsetKernel.sortedLongJaccardGE($a, $b, $theta)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitsetKernel {
  /** Multiset merge-intersection Jaccard over sorted long arrays; 0.0 on
    * an empty union. On equal heads both cursors advance, so duplicate
    * hashes contribute min(countA, countB). */
  def sortedLongJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var ia = 0
    var ib = 0
    // skip NULL elements (sort_array places them first): null ∉ multiset
    while (ia < na && a.isNullAt(ia)) ia += 1
    while (ib < nb && b.isNullAt(ib)) ib += 1
    val effA = na - ia
    val effB = nb - ib
    var inter = 0
    while (ia < na && ib < nb) {
      val x = a.getLong(ia)
      val y = b.getLong(ib)
      if (x == y) { inter += 1; ia += 1; ib += 1 }
      else if (x < y) ia += 1
      else ib += 1
    }
    val union = effA + effB - inter
    if (union <= 0) 0.0 else inter.toDouble / union.toDouble
  }

  /** `sortedLongJaccard(a, b) ≥ theta`, with early exit: J is monotone in
    * the final intersection, and inter can grow by at most
    * min(remaining_a, remaining_b), so once that best case falls below a
    * conservatively-slack integer bound (⌈θ(na+nb)/(1+θ)⌉ − 1 — the −1
    * absorbs any fp rounding in the bound itself) the answer is certainly
    * false. The FINAL decision uses the exact division form, identical to
    * `sortedLongJaccard(a, b) >= theta`, so early exit never changes the
    * result. On dissimilar pairs (the overwhelming majority in an
    * all-pairs scan) this bails after ~(1−θ)/(1+θ) of the merge. */
  def sortedLongJaccardGE(a: ArrayData, b: ArrayData, theta: Double): Boolean = {
    val na = a.numElements()
    val nb = b.numElements()
    var ia = 0
    var ib = 0
    while (ia < na && a.isNullAt(ia)) ia += 1
    while (ib < nb && b.isNullAt(ib)) ib += 1
    val s = (na - ia) + (nb - ib)
    if (s == 0) return 0.0 >= theta // empty union → jaccard 0.0 (matches the full form for any theta)
    val neededSafe = math.ceil(theta * s / (1.0 + theta)).toInt - 1
    var inter = 0
    while (ia < na && ib < nb) {
      if (inter + math.min(na - ia, nb - ib) < neededSafe) return false
      val x = a.getLong(ia)
      val y = b.getLong(ib)
      if (x == y) { inter += 1; ia += 1; ib += 1 }
      else if (x < y) ia += 1
      else ib += 1
    }
    // union ≥ 1 here: inter ≤ min(non-null a, non-null b) < s
    inter.toDouble / (s - inter).toDouble >= theta
  }

  /** Merge-intersection Jaccard over binary-sorted distinct string
    * arrays; 0.0 on an empty union. NULL elements are skipped (null ∉
    * set — `sort_array` places them first, so the skip is one leading
    * scan, and the SQL surface can't NPE on arrays containing NULL). */
  def sortedStringJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var ia = 0
    var ib = 0
    while (ia < na && a.isNullAt(ia)) ia += 1
    while (ib < nb && b.isNullAt(ib)) ib += 1
    val effA = na - ia
    val effB = nb - ib
    var inter = 0
    while (ia < na && ib < nb) {
      val c = a.getUTF8String(ia).compareTo(b.getUTF8String(ib))
      if (c == 0) { inter += 1; ia += 1; ib += 1 }
      else if (c < 0) ia += 1
      else ib += 1
    }
    val union = effA + effB - inter
    if (union <= 0) 0.0 else inter.toDouble / union.toDouble
  }

  /** inter/(sza+szb−inter) in one AND-popcount pass (0.0 on empty union). */
  def jaccard(a: ArrayData, b: ArrayData, sza: Int, szb: Int): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var inter = 0
    var i = 0
    while (i < n) {
      inter += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    val union = sza + szb - inter
    if (union <= 0) 0.0 else inter.toDouble / union.toDouble
  }

  def fromIds(ids: ArrayData, nWords: Int): ArrayData = {
    val words = new Array[Long](nWords)
    val n = ids.numElements()
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      if (id >= 0 && id < nWords * 64) words(id >>> 6) |= (1L << (id & 63))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(words)
  }
}
