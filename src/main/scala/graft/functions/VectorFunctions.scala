package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` columns.
  * Pure built-in compositions (`zip_with`/`aggregate`): codegen-friendly,
  * no UDF, sequential left-to-right double accumulation — deterministic
  * and engine-portable (matches DuckDB's `list_cosine_similarity`).
  */
object VectorFunctions {

  /** Dot product in double precision (native codegen'd loop — see
    * [[VecDot]]; identical accumulation semantics to the zip_with/aggregate
    * composition it replaced). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(VecDot(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Element-wise difference over min(len) — the residual step of
    * residual-encoded IVF-PQ ([[VecSub]]; float result only when both
    * inputs are float, zip_with null semantics). */
  def sub(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(VecSub(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Cosine similarity; 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Deterministic random-hyperplane LSH signature: `bits` sign bits of
    * projections onto pseudo-random hyperplanes derived from xxhash64.
    * Component j of plane p is in [-1, 1): (xxhash64(p, j) mod 2001 - 1000)/1000.
    */
  def hyperplaneSignature(v: Column, bits: Int): Column =
    hyperplaneSignatureRange(v, 0, bits)

  /** Integer dot product over two `array<int>` columns (long
    * accumulation, [[VecDotInt]]) — exact candidate scoring for
    * scalar-quantized ANN codes. */
  def dotInt(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(VecDotInt(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Unit-normalize + symmetric scalar quantization to `[-levels,
    * levels]` ints, one codegen pass ([[VecNormQuantI8]]): the ANN-corpus
    * compression step (int8 is 4× narrower than float32 for storage and
    * shuffle). Engine-portable arithmetic: left-to-right double norm,
    * IEEE division, floor. */
  def normQuantI8(v: Column, levels: Int = 127): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(VecNormQuantI8(
      org.apache.spark.sql.graft.ColumnBridge.expression(v), levels))

  /** Per-position fixed-point sums `sum(round(element * scale))` over a
    * vector column as ONE aggregate ([[VecSumFixed]]) — the
    * bit-deterministic vector-mean building block. Element arithmetic is
    * bit-identical to `transform(v, x -> round(x.cast("double") * scale)
    * .cast("long"))` + per-position `sum(element_at(...))` (parity-
    * tested), without the interpreted HOF or the `dim` aggregate
    * columns. */
  def sumFixed(v: Column, scale: Double, dim: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(VecSumFixed(
      org.apache.spark.sql.graft.ColumnBridge.expression(v), scale, dim)
      .toAggregateExpression())

  /** Signature over hyperplanes [offset, offset+bits) of the shared
    * pseudo-random family — lets callers build independent LSH tables.
    * Single codegen'd pass ([[HyperplaneSig]]); bit-identical to the
    * per-plane `aggregate(zip_with(…xxhash64(p, j)…))` HOF formulation it
    * replaced (parity-tested). */
  def hyperplaneSignatureRange(v: Column, offset: Int, bits: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(HyperplaneSig(
      org.apache.spark.sql.graft.ColumnBridge.expression(v), offset, bits))

  /** [[hyperplaneSignatureRange]] computed from a SPARSE vector
    * (ascending `buckets` array<long> + aligned `weights` array<double>)
    * without densifying — bit-identical to the dense kernel over the
    * densified vector ([[SparseVecKernel]]'s parity contract), at
    * O(nnz) instead of O(dim) per plane. The shape hashed-TF-IDF
    * corpora need at production dims (2^18+). */
  def sparseHyperplaneSignatureRange(buckets: Column, weights: Column,
      offset: Int, bits: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(SparseHyperplaneSig(
      org.apache.spark.sql.graft.ColumnBridge.expression(buckets),
      org.apache.spark.sql.graft.ColumnBridge.expression(weights),
      offset, bits))

  /** [[dot]] over two sorted sparse vectors by ascending-bucket merge
    * ([[SparseDot]]) — bit-identical to [[VecDot]] on the densified
    * pair, at O(nnz_a + nnz_b). */
  def sparseDot(bucketsA: Column, weightsA: Column, bucketsB: Column,
      weightsB: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(SparseDot(
      org.apache.spark.sql.graft.ColumnBridge.expression(bucketsA),
      org.apache.spark.sql.graft.ColumnBridge.expression(weightsA),
      org.apache.spark.sql.graft.ColumnBridge.expression(bucketsB),
      org.apache.spark.sql.graft.ColumnBridge.expression(weightsB)))
}
