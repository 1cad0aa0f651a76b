package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {

  test("z-order files cover compact boxes; linear sort does not") {
    val s = spark
    import s.implicits._
    // 256×256 grid, shuffled insert order
    val rnd = new scala.util.Random(3)
    val pts = rnd.shuffle((for (x <- 0 until 256; y <- 0 until 256)
      yield (x.toLong, y.toLong)).toList).toDF("x", "y")

    def avgBoxArea(df: org.apache.spark.sql.DataFrame): Double = {
      val boxes = df
        .withColumn("part", spark_partition_id())
        .groupBy("part")
        .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
        .collect().map(r => (r.getLong(1) + 1.0) * (r.getLong(2) + 1.0))
      boxes.sum / boxes.length
    }

    val nFiles = 64
    val zd = Layout.zorderBy(pts, Seq("x", "y"), nFiles)
    val xd = pts.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
    val zArea = avgBoxArea(zd)
    val linearArea = avgBoxArea(xd)
    info(s"avg bounding box: z-order $zArea vs x-sorted $linearArea")
    // unaligned Morton curve segments average a few × the ideal
    // 32×32=1024 tile — the point is that BOTH dimensions are bounded
    // (~50×50), where the x-sort leaves y unconstrained (4×256)
    assert(zArea <= 4 * 1024.0, s"z-order boxes too loose: $zArea")

    // min/max pruning: count files whose stats range can contain a
    // point predicate on each dimension. z-order prunes on BOTH; the
    // linear sort prunes x brilliantly and y not at all.
    def filesTouching(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.withColumn("part", spark_partition_id())
        .groupBy("part").agg(min(c).as("mn"), max(c).as("mx"))
        .where(col("mn") <= 7 && col("mx") >= 7).count()
    val zx = filesTouching(zd, "x"); val zy = filesTouching(zd, "y")
    val lx = filesTouching(xd, "x"); val ly = filesTouching(xd, "y")
    info(s"files touching x=7: z=$zx linear=$lx; y=7: z=$zy linear=$ly")
    assert(zx < nFiles / 2 && zy < nFiles / 2,
      s"z-order should bound both dims: x=$zx y=$zy of $nFiles")
    assert(ly == nFiles, "x-sorted layout cannot prune on y")
    // total files scanned for one x-predicate plus one y-predicate
    assert(zx + zy < lx + ly, s"z ${zx + zy} !< linear ${lx + ly}")
  }

  test("degenerate inputs: empty frame, >3 dims, zCol collision") {
    val s = spark
    import s.implicits._
    // empty frame: null min/max treated as constant columns, no NPE
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(Layout.zorderBy(empty, Seq("x", "y"), 4).count() == 0)
    // 4 dims: bits shrink (63/4 = 15 per dim) so the code stays positive
    val four = Seq((1L, 2L, 3L, 4L), (5L, 6L, 7L, 8L), (0L, 0L, 0L, 0L))
      .toDF("a", "b", "c", "d")
    val z4 = Layout.withZValue(four, Seq("a", "b", "c", "d"))
      .select("_zvalue").collect().map(_.getLong(0))
    assert(z4.forall(_ >= 0L))
    assert(z4.distinct.length == 3) // distinct points keep distinct codes
    // pre-existing zCol name is rejected, not silently destroyed
    val clash = Seq((1L, 2L, 3L)).toDF("x", "y", "_zvalue")
    intercept[IllegalArgumentException] {
      Layout.zorderBy(clash, Seq("x", "y"), 2)
    }
  }

  test("interleave places alternating bits") {
    val s = spark
    import s.implicits._
    val df = Seq((3L, 0L), (0L, 3L), (1L, 1L)).toDF("a", "b")
    val out = df.select(Layout.interleave(Seq(col("a"), col("b"))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a occupies even bits, b odd bits: (3,0)→0b0101=5, (0,3)→0b1010=10,
    // (1,1)→0b11=3
    assert(out == Seq(5L, 10L, 3L))
  }
}
