package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkTestBase {

  /** Two well-separated 2-D blobs: ids 1-3 near (0,0), ids 4-6 near
    * (10,10). Whatever the hash-rank init picks, two Lloyd rounds must
    * recover the blobs exactly. */
  private def blobs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)),
      (3L, Array(0.2f, 0.2f)),
      (4L, Array(10.0f, 10.1f)), (5L, Array(10.1f, 10.0f)),
      (6L, Array(9.9f, 9.9f)))
      .toDF("id", "v")
  }

  test("separated blobs land in two pure clusters") {
    val got = KMeans.fixedIter(blobs, "id", "v", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    val lo = Set(1L, 2L, 3L).map(got)
    val hi = Set(4L, 5L, 6L).map(got)
    assert(lo.size == 1 && hi.size == 1 && lo != hi,
      s"blobs split impurely: $got")
  }

  test("dist2 is the squared L2 distance to the winning centroid") {
    // after convergence the low blob's centroid is the blob mean
    // (0.1, 0.1); id 1 = (0.0, 0.1) -> dist2 = 0.01
    val r = KMeans.fixedIter(blobs, "id", "v", k = 2, iters = 3)
      .where(col("id") === 1L).head()
    assert(math.abs(r.getDouble(2) - 0.01) < 1e-9, r.getDouble(2))
  }

  test("deterministic: two runs produce identical assignments") {
    val a = KMeans.fixedIter(blobs, "id", "v", k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSet
    val b = KMeans.fixedIter(blobs, "id", "v", k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSet
    assert(a == b)
  }

  test("every point is assigned exactly once; null/empty vectors drop") {
    val s = spark
    import s.implicits._
    val withBad = blobs.unionByName(Seq(
      (7L, null.asInstanceOf[Array[Float]]),
      (8L, Array.empty[Float])).toDF("id", "v"))
    val got = KMeans.fixedIter(withBad, "id", "v", k = 2, iters = 1)
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 6L -> 1L))
  }

  test("empty / all-filtered input yields an empty assignment, not an NPE") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "v")
    assert(KMeans.fixedIter(empty, "id", "v", k = 2, iters = 1)
      .count() == 0)
    val allBad = Seq((1L, null.asInstanceOf[Array[Float]]),
      (2L, Array.empty[Float])).toDF("id", "v")
    assert(KMeans.fixedIter(allBad, "id", "v", k = 2, iters = 1)
      .count() == 0)
  }

  test("ragged vector dimensions are an error, not a garbage cluster") {
    val s = spark
    import s.implicits._
    val ragged = blobs.unionByName(
      Seq((7L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v"))
    val ex = intercept[IllegalArgumentException] {
      KMeans.fixedIter(ragged, "id", "v", k = 2, iters = 1)
    }
    assert(ex.getMessage.contains("ragged"), ex.getMessage)
  }

  test("parameter guards") {
    intercept[IllegalArgumentException] {
      KMeans.fixedIter(blobs, "id", "v", k = 1, iters = 2)
    }
    intercept[IllegalArgumentException] {
      KMeans.fixedIter(blobs, "id", "v", k = 2, iters = 0)
    }
    intercept[IllegalArgumentException] {
      KMeans.fixedIter(blobs, "id", "v", k = 2, iters = 21)
    }
  }
}
