package graft.functions

import graft.SparkTestBase
import graft.operators.AnnSearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bit-parity of the codegen'd [[NearestCentroid]] assignment against the
  * broadcast-join + argmax-window formulation it replaced — the contract
  * that keeps every a2–a6 golden hash valid. The window oracle is inlined
  * here exactly as `ivfAssign` used to build it. Fixtures force the
  * edges: sim ties (duplicate centroids), zero vectors and zero
  * centroids (the `when(norm = 0, 0.0)` guard), null elements and null
  * vectors (3VL sim nulls; the all-null row keeps the smallest list_id),
  * length mismatches (min-overlap dots), and both element types. */
class NearestCentroidSpec extends SparkTestBase {

  /** The pre-rewrite shape, verbatim. */
  private def windowAssign(c: DataFrame, cents: DataFrame): DataFrame = {
    val wAssign = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("__sim").desc, col("list_id").asc)
    val assignedIds = c.crossJoin(broadcast(cents))
      .select(col("neighbor_id"), col("list_id"),
        VectorFunctions.cosine(col("cv"), col("centv")).as("__sim"))
      .withColumn("__rn", row_number().over(wAssign))
      .where(col("__rn") === 1)
      .select(col("neighbor_id"), col("list_id"))
    c.join(assignedIds, "neighbor_id")
      .select(col("neighbor_id"), col("cv"), col("list_id"))
  }

  private def assignSet(df: DataFrame): Set[(Long, Any)] =
    df.select("neighbor_id", "list_id").collect()
      .map(r => (r.getLong(0), r.get(1))).toSet

  private def parity(c: DataFrame, cents: DataFrame): Unit = {
    val got = assignSet(AnnSearch.ivfAssign(c, cents))
    val want = assignSet(windowAssign(c, cents))
    assert(got == want,
      s"kernel diverged from window oracle:\n  kernel-only: ${got -- want}" +
        s"\n  oracle-only: ${want -- got}")
    assert(got.nonEmpty)
  }

  test("randomized double corpus matches the window oracle (ties included)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    def vec(d: Int) = Seq.fill(d)(rnd.nextDouble() * 2 - 1)
    val corpus = (0L until 500L).map(id => (id, vec(16))).toDF("neighbor_id", "cv")
    // duplicate centroid vectors force exact sim ties across list ids —
    // the tie-break (smallest list_id) must match
    val dup = vec(16)
    val cents = (Seq((100L, dup), (101L, dup), (99L, vec(16))) ++
      (0L until 5L).map(i => (i, vec(16)))).toDF("list_id", "centv")
    parity(corpus, cents)
  }

  test("float corpus, mismatched lengths, zero vectors, zero centroid") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    def fvec(d: Int) = Seq.fill(d)(rnd.nextFloat() * 2 - 1)
    val corpus = ((0L until 200L).map(id => (id, fvec(8 + (id % 3).toInt))) ++
      Seq((900L, Seq.fill(8)(0.0f)), // zero vector: all sims 0.0, first id wins
          (901L, fvec(1))) // tiny vector: min-overlap dots
      ).toDF("neighbor_id", "cv")
    val cents = (Seq((7L, Seq.fill(9)(0.0f))) ++ // zero centroid: sim 0.0 via guard
      (0L until 4L).map(i => (i, fvec(9)))).toDF("list_id", "centv")
    parity(corpus, cents)
  }

  test("null vectors and null elements resolve like the window shape") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    def vec(d: Int) = Seq.fill(d)(rnd.nextDouble() * 2 - 1)
    val schema = StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("cv", ArrayType(DoubleType, containsNull = true))))
    val rows: java.util.List[Row] = java.util.Arrays.asList(
      Row(1L, vec(8)),
      Row(2L, null), // null vector: all sims null, smallest list_id wins
      Row(3L, Seq[Any](0.1, 0.2, null, 0.4, 0.5, 0.6, 0.7, 0.8)))
    val corpus = spark.createDataFrame(rows, schema)
    val cents = (0L until 4L).map(i => (i, vec(8))).toDF("list_id", "centv")
    parity(corpus, cents)
  }

  test("multi-probe selection matches the windowed top-nprobe set") {
    // the pre-rewrite probe shape from ivfTopKFromAssigned, verbatim
    def windowProbes(q0: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
      val wProbe = Window.partitionBy(col("query_id"))
        .orderBy(col("__sim").desc, col("list_id").asc)
      broadcast(q0).crossJoin(broadcast(cents))
        .withColumn("__sim", VectorFunctions.cosine(col("qv"), col("centv")))
        .withColumn("__rn", row_number().over(wProbe))
        .where(col("__rn") <= nprobe)
        .select(col("query_id"), col("list_id"))
    }
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    def vec(d: Int) = Seq.fill(d)(rnd.nextDouble() * 2 - 1)
    val q0 = ((0L until 50L).map(id => (id, vec(12))) ++
      Seq((800L, Seq.fill(12)(0.0)))) // zero query: all sims 0.0, ties everywhere
      .toDF("query_id", "qv")
    val dup = vec(12)
    val cents = (Seq((30L, dup), (31L, dup)) ++ // exact ties across list ids
      (0L until 8L).map(i => (i, vec(12)))).toDF("list_id", "centv")
    val assigned = (0L until 20L).map(i => (1000L + i, vec(12), i % 10))
      .toDF("neighbor_id", "cv", "list_id")
    for (nprobe <- Seq(1, 3, 10, 20)) { // incl. nprobe > nlist
      val got = AnnSearch.ivfTopKFromAssigned(q0, assigned, cents,
        k = 5, nprobe = nprobe)
      // probe-set parity is what the kernel must preserve; compare the
      // whole scored result (same probes ⇒ same candidates ⇒ same ranks)
      val oracleProbes = windowProbes(q0, cents, nprobe)
      val oracleScored = oracleProbes
        .join(q0, "query_id")
        .join(assigned, "list_id")
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      val oracle = oracleScored.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select("query_id", "neighbor_id", "cosine", "rank")
      assert(got.collect().map(_.toString).toSet ==
        oracle.collect().map(_.toString).toSet, s"diverged at nprobe=$nprobe")
      assert(got.count() > 0)
    }
  }

  test("single centroid and NaN elements") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, Seq(1.0, 2.0, 3.0)),
      (2L, Seq(Double.NaN, 1.0, 1.0)) // NaN sim: Spark orders NaN greatest
    ).toDF("neighbor_id", "cv")
    val one = Seq((5L, Seq(0.5, -0.5, 1.0))).toDF("list_id", "centv")
    parity(corpus, one)
    val two = Seq((5L, Seq(0.5, -0.5, 1.0)), (6L, Seq(1.0, 2.0, 2.9)))
      .toDF("list_id", "centv")
    parity(corpus, two)
  }
}
