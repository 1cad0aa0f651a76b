package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[VecSub]]'s documented contract, pinned: parity with the
  * `zip_with(a, b, (x, y) -> x - y)` built-in it replaces in the
  * residual-encoding path (a CodegenFallback HOF — the reason VecSub
  * exists), the element-width rule (float only when BOTH inputs are
  * float), min-length truncation, and the zip_with null semantics (null
  * ARRAY → null result via null-safe eval; null ELEMENT → null element). */
class VecSubSpec extends SparkTestBase {

  private def df(rows: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])]) = {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("b", ArrayType(FloatType, containsNull = true), nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)
  }

  test("float-float parity with zip_with, min-len, null element/array contract") {
    val rows: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])] = Seq(
      (Seq[java.lang.Float](1.5f, -2.25f, 0.0f), Seq[java.lang.Float](0.5f, 2.75f, -1.0f)),
      (Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](0.5f, 1.0f, null)),
      (Seq[java.lang.Float](1.0f, 2.0f, 3.0f, 4.0f), Seq[java.lang.Float](1.0f, 1.0f)), // min-len
      (null, Seq[java.lang.Float](1.0f)), // null array
      (Seq[java.lang.Float](), Seq[java.lang.Float](1.0f)))
    val d = df(rows)
    val got = d.select(VectorFunctions.sub(col("a"), col("b")).as("r")).collect()
    // zip_with runs over max(len) padding with null — truncate to min(len)
    // to express VecSub's (VecDot-convention) overlap semantics
    val minLen = least(size(col("a")), size(col("b")))
    val want = d.select(zip_with(
      slice(col("a"), lit(1), minLen),
      slice(col("b"), lit(1), minLen),
      (x, y) => x - y).as("r")).collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
    // element type: float when both inputs are float
    assert(d.select(VectorFunctions.sub(col("a"), col("b"))).schema.head
      .dataType == ArrayType(FloatType, containsNull = true))
  }

  test("mixed float/double widens to double, matches double arithmetic") {
    val d = df(Seq((Seq[java.lang.Float](1.1f, 2.2f), Seq[java.lang.Float](0.1f, 0.2f))))
      .withColumn("bd", col("b").cast(ArrayType(DoubleType)))
    val out = d.select(VectorFunctions.sub(col("a"), col("bd")).as("r"))
    assert(out.schema.head.dataType == ArrayType(DoubleType, containsNull = true))
    val r = out.head().getAs[scala.collection.Seq[Double]](0)
    assert(r(0) == 1.1f.toDouble - 0.1f.toDouble)
    assert(r(1) == 2.2f.toDouble - 0.2f.toDouble)
  }

  test("randomized parity with zip_with over mixed lengths, nulls, extremes") {
    val rnd = new scala.util.Random(29)
    def arr(): Seq[java.lang.Float] =
      Seq.fill(rnd.nextInt(6))(rnd.nextInt(10) match {
        case 0 => null
        case 1 => java.lang.Float.valueOf(Float.MaxValue)
        case 2 => java.lang.Float.valueOf(Float.MinPositiveValue)
        case 3 => java.lang.Float.valueOf(Float.NaN)
        case _ => java.lang.Float.valueOf(rnd.nextFloat() * 2e3f - 1e3f)
      })
    val rows: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])] =
      (1 to 200).map(_ => (if (rnd.nextInt(20) == 0) null else arr(),
        if (rnd.nextInt(20) == 0) null else arr()))
    val d = df(rows)
    val minLen = least(size(col("a")), size(col("b")))
    val got = d.select(VectorFunctions.sub(col("a"), col("b")).as("r"))
      .collect().map(_.toString).toSeq
    val want = d.select(zip_with(
      slice(col("a"), lit(1), minLen), slice(col("b"), lit(1), minLen),
      (x, y) => x - y).as("r")).collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("vec_sub is SQL-registered") {
    graft.GraftFunctions.register(spark)
    val r = spark.sql("SELECT vec_sub(array(3.0D, 2.0D), array(1.0D, 0.5D))")
      .head().getAs[scala.collection.Seq[Double]](0)
    assert(r == Seq(2.0, 1.5))
  }

  test("whole-stage codegen and interpreted eval agree") {
    val d = df(Seq((Seq[java.lang.Float](3.0f, null), Seq[java.lang.Float](1.0f, 1.0f))))
    val expr = VectorFunctions.sub(col("a"), col("b"))
    val viaCodegen = d.select(expr.as("r")).collect().map(_.toString).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = d.select(expr.as("r")).collect().map(_.toString).toSeq
      assert(viaCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
