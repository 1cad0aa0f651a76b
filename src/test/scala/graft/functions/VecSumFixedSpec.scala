package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bit-parity of the [[VecSumFixed]] aggregate against the built-in
  * formulation it replaced in the Lloyd recenter step — `transform(v,
  * x -> round(x.cast("double") * scale).cast("long"))` + per-position
  * `sum(element_at(...))` — the contract that keeps the quantizer means,
  * and therefore every a2–a6 golden hash, bit-identical. Fixtures force
  * the edges: HALF_UP ties away from zero on both signs, values within
  * an ulp of the .5 boundary (the kernel's exact-BigDecimal fallback
  * window), null elements (per-position skip), null vectors (contribute
  * nothing), an all-null position (sum → null element), float and
  * double element types, and multi-partition input (merge path +
  * serialize/deserialize across the partial-aggregation shuffle). */
class VecSumFixedSpec extends SparkTestBase {

  /** The pre-rewrite shape, verbatim (dim separate aggregate columns). */
  private def oracle(df: DataFrame, scale: Double, dim: Int): DataFrame =
    df.withColumn("__sv", transform(col("cv"),
        x => round(x.cast("double") * scale).cast("long")))
      .groupBy(col("k"))
      .agg(sum(element_at(col("__sv"), 1)).as("s0"),
        (1 until dim).map(i =>
          sum(element_at(col("__sv"), i + 1)).as(s"s$i")): _*)

  private def collectOracle(df: DataFrame, scale: Double,
      dim: Int): Map[Any, Seq[Option[Long]]] =
    oracle(df, scale, dim).collect().map { r =>
      r.get(0) -> (0 until dim).map(i =>
        if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1)))
    }.toMap

  private def collectKernel(df: DataFrame, scale: Double,
      dim: Int): Map[Any, Seq[Option[Long]]] =
    df.groupBy(col("k"))
      .agg(VectorFunctions.sumFixed(col("cv"), scale, dim).as("s"))
      .collect().map { r =>
        val s = r.getAs[scala.collection.Seq[Any]]("s")
        assert(s.length == dim)
        r.get(0) -> s.map(e => Option(e).map(_.asInstanceOf[Long])).toSeq
      }.toMap

  private def parity(df: DataFrame, scale: Double, dim: Int): Unit = {
    val want = collectOracle(df, scale, dim)
    val got = collectKernel(df, scale, dim)
    assert(got == want, s"kernel diverged from built-in oracle:\n" +
      s"  kernel: $got\n  oracle: $want")
    assert(got.nonEmpty)
  }

  test("randomized double vectors at the Lloyd scale (2^24), many partitions") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 16
    val rows = (0 until 2000).map(i =>
      (i % 7, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    parity(rows.toDF("k", "cv").repartition(8), (1L << 24).toDouble, dim)
  }

  test("float vectors widen exactly") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val dim = 8
    val rows = (0 until 500).map(i =>
      (i % 3, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
    parity(rows.toDF("k", "cv").repartition(5), (1L << 24).toDouble, dim)
  }

  test("HALF_UP ties away from zero, both signs") {
    val s = spark
    import s.implicits._
    // scale 2.0 makes x.25 elements land EXACTLY on .5 ties
    val rows = Seq(
      (0, Seq(1.25, -1.25, 0.25, -0.25)),
      (0, Seq(2.75, -2.75, 0.75, -0.75)),
      (1, Seq(0.25, 0.25, -0.25, -0.25)))
    parity(rows.toDF("k", "cv"), 2.0, 4)
  }

  test("values within an ulp of the tie take the exact fallback") {
    val s = spark
    import s.implicits._
    // largest double < 0.5, the value whose computed fraction rounds
    // ONTO 0.5; and its mirror — the classifier must defer to the
    // decimal repr, as Spark's round does
    val nearHalf = 0.49999999999999994
    val rows = Seq(
      (0, Seq(nearHalf, -nearHalf, 0.5, -0.5)),
      (1, Seq(1.0 - (nearHalf * 2), 1.5, -1.5, nearHalf)))
    parity(rows.toDF("k", "cv"), 1.0, 4)
  }

  test("null elements skip per position; all-null position yields null sum") {
    val s = spark
    import s.implicits._
    val rows: Seq[(Int, Seq[Option[Double]])] = Seq(
      (0, Seq(Some(1.0), None, Some(3.0), None)),
      (0, Seq(Some(2.0), None, None, None)),
      (1, Seq(Some(5.0), Some(6.0), Some(7.0), None)))
    parity(rows.toDF("k", "cv"), 4.0, 4)
  }

  test("null vectors contribute nothing but groups still evaluate") {
    val s = spark
    import s.implicits._
    val rows: Seq[(Int, Option[Seq[Double]])] = Seq(
      (0, Some(Seq(1.5, 2.5))), (0, None), (1, None))
    parity(rows.toDF("k", "cv"), 2.0, 2)
  }

  test("SQL surface: vec_sum_fixed registered") {
    graft.GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    Seq((0, Seq(1.25, -1.25)), (0, Seq(0.75, 0.25)))
      .toDF("k", "cv").createOrReplaceTempView("vsf_in")
    val r = spark.sql(
      "SELECT vec_sum_fixed(cv, 2.0D, 2) AS s FROM vsf_in GROUP BY k")
      .collect()
    assert(r.length == 1)
    assert(r.head.getAs[scala.collection.Seq[Long]]("s") == Seq(5L, -2L))
  }
}
