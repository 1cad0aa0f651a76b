package graft.functions

import graft.{PropHelper, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Bit-parity contract of the sparse kernels against the dense ones
  * they replace (ADVICE r17: crossCosinePairsLsh must not densify):
  * for any sparse vector laid out as sorted (buckets, weights), the
  * sparse hyperplane signature and the sparse merge dot must equal —
  * BIT-exactly, not approximately — the dense kernels run over the
  * densified vector. The parity holds because a zero coordinate
  * contributes ±0.0 to a +0.0-seeded left-to-right accumulator, which
  * never changes its bits; the sparse kernels preserve the ascending
  * accumulation order ([[SparseVecKernel]]'s contract). */
class SparseVecSpec extends SparkTestBase with PropHelper {
  import spark.implicits._

  private val dim = 64

  private val sparseGen: Gen[Seq[(Long, Double)]] = for {
    n <- Gen.choose(0, 24)
    buckets <- Gen.pick(n, 0 until dim)
    ws <- Gen.listOfN(n, Gen.choose(-4.0, 4.0))
  } yield buckets.map(_.toLong).sorted.zip(ws).toSeq

  private def densify(s: Seq[(Long, Double)]): Seq[Double] = {
    val m = s.toMap
    (0 until dim).map(j => m.getOrElse(j.toLong, 0.0))
  }

  test("sparse hyperplane signature == dense signature of the densified vector") {
    forAllGen(sparseGen, trials = 60) { s =>
      val df = Seq((s.map(_._1), s.map(_._2), densify(s)))
        .toDF("b", "w", "v")
        .select(
          VectorFunctions.sparseHyperplaneSignatureRange(
            col("b"), col("w"), offset = 30, bits = 17).as("sp"),
          VectorFunctions.hyperplaneSignatureRange(
            col("v"), offset = 30, bits = 17).as("dn"))
        .head()
      assert(df.getLong(0) === df.getLong(1))
    }
  }

  test("sparse merge dot == dense VecDot of the densified pair") {
    forAllGen2(sparseGen, sparseGen, trials = 60) { (a, b) =>
      val r = Seq((a.map(_._1), a.map(_._2), densify(a),
          b.map(_._1), b.map(_._2), densify(b)))
        .toDF("ab", "aw", "av", "bb", "bw", "bv")
        .select(
          VectorFunctions.sparseDot(col("ab"), col("aw"), col("bb"),
            col("bw")).as("sp"),
          VectorFunctions.dot(col("av"), col("bv")).as("dn"))
        .head()
      // bit equality, not tolerance — the banding θ decision replays
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null contracts match the dense kernels") {
    // null array -> null sig / null dot (nullSafeEval); null ELEMENT ->
    // signature 0 (the dense HOF lineage) and null dot (the VecDot stance)
    val r = Seq((Seq(1L, 2L), Seq(1.0, 2.0)))
      .toDF("b", "w")
      .select(
        VectorFunctions.sparseHyperplaneSignatureRange(
          array(lit(1L), lit(null).cast("long")),
          col("w"), 0, 8).as("sigNullElem"),
        VectorFunctions.sparseDot(col("b"), col("w"),
          array(lit(1L), lit(null).cast("long")), col("w"))
          .as("dotNullElem"),
        VectorFunctions.sparseDot(lit(null).cast("array<long>"),
          col("w"), col("b"), col("w")).as("dotNullArr"))
      .head()
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1))
    assert(r.isNullAt(2))
  }

  test("disjoint and overlapping merges are exact") {
    val r = Seq((Seq(1L, 3L, 7L), Seq(0.5, 2.0, -1.0),
        Seq(2L, 3L, 7L, 9L), Seq(4.0, 3.0, 2.0, 1.0)))
      .toDF("ab", "aw", "bb", "bw")
      .select(VectorFunctions.sparseDot(col("ab"), col("aw"), col("bb"),
        col("bw")).as("d"))
      .head().getDouble(0)
    assert(r === 2.0 * 3.0 + (-1.0) * 2.0)
  }
}
