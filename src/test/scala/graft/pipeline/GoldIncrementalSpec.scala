package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The g3 contract: a GROUP-BY-MAX gold table maintained by
  * [[SilverIndex.refreshMaxRollup]] equals the one-shot aggregation —
  * under arbitrary chunking, replays, and a crashed commit. */
class GoldIncrementalSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/rollup"

  private def rows(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("alpha", "x", 3L), ("alpha", "z", 1L), ("beta", "m", 9L),
      ("beta", "a", 12L), ("gamma", "q", 4L), ("alpha", "y", 7L),
      ("delta", "k", 2L), ("beta", "z", 5L), ("gamma", "a", 4L))
      .toDF("title", "desc", "score")
  }

  private def oneShot(df: DataFrame): Map[String, (String, Long)] =
    df.groupBy("title")
      .agg(max(col("desc")).as("desc"), max(col("score")).as("score"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap

  private def served(path: String): Map[String, (String, Long)] =
    SilverIndex.maxRollupIndex(spark, path)
      .collect().map(r => r.getString(r.fieldIndex("title")) ->
        ((r.getString(r.fieldIndex("desc")),
          r.getLong(r.fieldIndex("score"))))).toMap

  test("randomized chunking-fuzz: any batch split folds to the " +
      "one-shot GROUP BY MAX (keys span batches)") {
    val df = rows(spark)
    val want = oneShot(df)
    val data = df.collect().toSeq
    val rnd = new scala.util.Random(16)
    (1 to 5).foreach { trial =>
      val s = spark
      import s.implicits._
      val path = tmp(s"graft-goldinc-$trial")
      val shuffled = rnd.shuffle(data)
      val k = 1 + rnd.nextInt(4)
      val chunks = shuffled.grouped(math.max(1, shuffled.size / k + 1)).toSeq
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        val batch = chunk.map(r =>
          (r.getString(0), r.getString(1), r.getLong(2)))
          .toDF("title", "desc", "score")
        SilverIndex.refreshMaxRollup(batch, i, Seq("title"),
          Seq("desc", "score"), path)
      }
      assert(served(path) == want, s"trial $trial (k=$k)")
    }
  }

  test("replay of a committed batch id is a no-op; re-folding the SAME " +
      "rows under a NEW id is identity (semilattice)") {
    val s = spark
    import s.implicits._
    val path = tmp("graft-goldinc-replay")
    val df = rows(spark)
    val b0 = df.where(col("score") <= 4L)
    val b1 = df.where(col("score") > 4L)
    SilverIndex.refreshMaxRollup(b0, 0, Seq("title"), Seq("desc", "score"), path)
    SilverIndex.refreshMaxRollup(b1, 1, Seq("title"), Seq("desc", "score"), path)
    val want = served(path)
    // at-least-once delivery: the committed id short-circuits
    val r = SilverIndex.refreshMaxRollup(
      Seq(("zzz", "zzz", 999L)).toDF("title", "desc", "score"),
      1, Seq("title"), Seq("desc", "score"), path)
    assert(r.appended == 0 && served(path) == want)
    // MAX is idempotent: the same rows under a FRESH id change nothing
    SilverIndex.refreshMaxRollup(b1, 2, Seq("title"), Seq("desc", "score"), path)
    assert(served(path) == want)
  }

  test("crash window: an orphan _tmp from a crashed commit is invisible " +
      "to readers and overwritten by the replay") {
    val s = spark
    import s.implicits._
    val path = tmp("graft-goldinc-crash")
    val df = rows(spark)
    SilverIndex.refreshMaxRollup(df.where(col("score") <= 4L), 0,
      Seq("title"), Seq("desc", "score"), path)
    val afterB0 = served(path)
    // simulate a crash AFTER the staging write, BEFORE the rename:
    // junk content proves the replay overwrites rather than adopts
    Seq(("junk", "junk", -1L)).toDF("title", "desc", "score")
      .write.parquet(s"$path/_tmp_v1")
    assert(served(path) == afterB0, "reader ignores the orphan staging dir")
    SilverIndex.refreshMaxRollup(df.where(col("score") > 4L), 1,
      Seq("title"), Seq("desc", "score"), path)
    assert(served(path) == oneShot(df), "replay recovered the crash window")
  }

  test("NULL keys drop (bronze titles are NOT NULL by construction); " +
      "argument guards") {
    val s = spark
    import s.implicits._
    val path = tmp("graft-goldinc-null")
    val batch = Seq((Some("a"), "d1", 1L), (None, "d2", 2L))
      .toDF("title", "desc", "score")
    SilverIndex.refreshMaxRollup(batch, 0, Seq("title"), Seq("desc", "score"), path)
    assert(served(path).keySet == Set("a"))
    intercept[IllegalArgumentException] {
      SilverIndex.refreshMaxRollup(batch, 1, Seq.empty, Seq("score"), path)
    }
  }
}
