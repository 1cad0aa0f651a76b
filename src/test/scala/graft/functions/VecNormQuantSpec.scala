package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parity of the one-pass [[VecNormQuantI8]] kernel with the built-in
  * HOF composition (aggregate-norm → when-guards → transform-quantize),
  * including the null contract (null vector / null element → null
  * result; zero norm → zeros) and the ±levels boundary (single-hot
  * vectors hit x/‖v‖ = ±1 exactly). */
class VecNormQuantSpec extends SparkTestBase {

  /** The same semantics spelled with built-ins. */
  private def oracleCol(cv: Column, levels: Int): Column = {
    val nrm = sqrt(aggregate(cv, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(nrm.isNull, lit(null).cast("array<int>"))
      .when(nrm === 0.0, transform(cv, _ => lit(0)))
      .otherwise(transform(cv, x =>
        greatest(least(floor(x.cast("double") / nrm * levels),
          lit(levels.toDouble)), lit(-levels.toDouble)).cast("int")))
  }

  private def parity(df: DataFrame, levels: Int): Unit = {
    val rows = df.select(col("k"),
        VectorFunctions.normQuantI8(col("cv"), levels).as("got"),
        oracleCol(col("cv"), levels).as("want"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Any]("got") == r.getAs[Any]("want"),
        s"k=${r.get(0)}: ${r.getAs[Any]("got")} != ${r.getAs[Any]("want")}")
    }
    assert(rows.nonEmpty)
  }

  test("random float vectors match the HOF composition") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0 until 400).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    parity(rows.toDF("k", "cv").repartition(5), 127)
  }

  test("random double vectors, alternate levels") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(37)
    val rows = (0 until 200).map(i =>
      (i, Seq.fill(8)(rnd.nextDouble() * 20 - 10)))
    parity(rows.toDF("k", "cv"), 63)
  }

  test("edges: zero vector, single-hot ±boundary, tiny values") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (0, Seq(0.0, 0.0, 0.0)),          // zero norm → zeros
      (1, Seq(5.0, 0.0, 0.0)),          // x/norm = 1 → exactly +127
      (2, Seq(-5.0, 0.0, 0.0)),         // x/norm = -1 → exactly -127
      (3, Seq(1e-300, 0.0, -1e-300)),   // tiny but nonzero norm
      (4, Seq(3.0, -4.0, 0.0)))         // 3-4-5: clean ratios
    parity(rows.toDF("k", "cv"), 127)
  }

  test("null vector and null element both null the result") {
    val s = spark
    import s.implicits._
    val rows: Seq[(Int, Option[Seq[Option[Double]]])] = Seq(
      (0, None),
      (1, Some(Seq(Some(1.0), None, Some(2.0)))),
      (2, Some(Seq(Some(1.0), Some(2.0), Some(2.0)))))
    parity(rows.toDF("k", "cv"), 127)
    val got = rows.toDF("k", "cv")
      .select(VectorFunctions.normQuantI8(col("cv"), 127).as("q"))
      .collect()
    assert(got(0).isNullAt(0) && got(1).isNullAt(0) && !got(2).isNullAt(0))
  }

  test("SQL surface: vec_norm_quant_i8 registered") {
    graft.GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    Seq((1, Seq(3.0f, -4.0f, 0.0f))).toDF("k", "cv")
      .createOrReplaceTempView("vnq_in")
    val r = spark.sql(
      "SELECT vec_norm_quant_i8(cv, 127) AS q FROM vnq_in").collect()
    assert(r.head.getAs[scala.collection.Seq[Int]]("q") == Seq(76, -102, 0))
  }
}
