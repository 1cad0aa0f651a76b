package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * for min/max pruning, the third lake-layout lever next to
  * [[Bucketing]] (join co-location) and Hive partitioning (directory
  * pruning).
  *
  * A table range-sorted on ONE column prunes row groups only for
  * predicates on that column; interleaving the bits of several
  * columns' normalized ranks produces an ordering where every file
  * covers a small HYPERCUBE of the key space, so min/max statistics
  * prune for predicates on ANY of the z-ordered columns. LayoutSpec
  * measures it: per-file bounding boxes shrink by orders of magnitude
  * versus a single-column sort.
  *
  * The z-value is pure column arithmetic (min/max normalize to 16-bit
  * rank space, then 16 shift/mask terms per dimension) — fully
  * codegen'd, no UDF; the only extra cost over a plain sorted write is
  * one min/max aggregate per column. Linear scaling at 100 TB: one
  * tiny stats job + one range shuffle.
  */
object Layout {

  /** Bits per dimension: 16 for 2-3 dims, shrinking so the top bit
    * position (bits·dims − 1) never reaches the long's sign bit at 63 —
    * without this, 4 dims would put a bit in the sign position (negative
    * z-values split the curve) and ≥5 dims would wrap shiftleft mod 64,
    * silently colliding bits across dimensions. */
  private def bitsFor(dims: Int): Int = math.min(16, 63 / dims)

  /** Interleave the low `bits` bits of `xs` (already rank-normalized to
    * [0, 2^bits − 1]) into one Morton code: bit i of dimension d lands
    * at position i·|xs| + d. */
  private[sources] def interleave(xs: Seq[Column],
      bits: Int = 16): Column = {
    val dims = xs.length
    require(bits * dims <= 63, s"$bits bits × $dims dims overflows a long")
    val terms = for {
      i <- 0 until bits
      (x, d) <- xs.zipWithIndex
    } yield shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)),
      i * dims + d)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Adds `zCol` = Morton code of `cols` (numeric), min/max-normalized
    * to [[bitsFor]] bits per dimension. EAGER: one min/max aggregate
    * runs at construction. Constant (or all-null) columns normalize to
    * 0; a row with a NULL in any z-column gets a NULL z-value and lands
    * in the range partitioner's leading null bucket. */
  def withZValue(df: DataFrame, cols: Seq[String],
      zCol: String = "_zvalue"): DataFrame = {
    require(cols.size >= 2, "z-ordering needs at least two columns")
    require(!df.columns.contains(zCol),
      s"input already has a '$zCol' column — pass a different zCol")
    val bits = bitsFor(cols.size)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"mn_$c"),
        max(col(c).cast("double")).as(s"mx_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val ranges = cols.zipWithIndex.map { case (c, i) =>
      // empty frame / all-null column: min and max come back null —
      // treat like a constant column instead of NPE-ing
      if (r.isNullAt(2 * i)) (c, 0.0, 0.0)
      else (c, r.getDouble(2 * i), r.getDouble(2 * i + 1))
    }
    val normalized = ranges.map { case (c, mn, mx) =>
      if (mx == mn) lit(0L)
      else ((col(c).cast("double") - mn) / (mx - mn) * ((1L << bits) - 1))
        .cast("long")
    }
    df.withColumn(zCol, interleave(normalized, bits))
  }

  /** Range-repartition + sort by the z-value: each output partition
    * (→ file at write) covers a compact hypercube of the `cols` space,
    * so min/max stats prune on any of them. Drops the helper column. */
  def zorderBy(df: DataFrame, cols: Seq[String], numFiles: Int,
      zCol: String = "_zvalue"): DataFrame = {
    val z = withZValue(df, cols, zCol)
    z.repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop(zCol)
  }
}
