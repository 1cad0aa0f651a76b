package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The g6 contract: an SCD2 history maintained by
  * [[SilverIndex.refreshScd2]] equals the one-shot
  * [[graft.operators.Scd2.history]] over the concatenated log — under
  * any TIME-ORDERED chunking (cuts between distinct timestamps, the
  * feed's natural shape), with replays a no-op, out-of-order arrivals
  * an error (SCD2 close is not a semilattice — fold exactness needs
  * the strictly-increasing boundary), and a crashed commit recovered
  * by the replay. */
class Scd2IncrementalSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/scd2"

  // collapse within a batch (A: 1,2 both "x"), transition (A: y at 3,
  // back to x at 5 — a REVISIT must reopen, not merge), cross-batch
  // collapse (B: "m" at 1 and again at 4 — one version regardless of
  // the chunk boundary between them), equal-ts tie-break (D: two
  // states at ts 3, ordered by the attribute in both engines)
  private def log(s: org.apache.spark.sql.SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("A", "x", 1), ("A", "x", 2), ("A", "y", 3), ("A", "x", 5),
      ("B", "m", 1), ("B", "m", 4),
      ("C", "q", 2),
      ("D", "b", 3), ("D", "a", 3), ("D", "b", 6))
      .toDF("user", "state", "ts")
  }

  private def oneShot(df: DataFrame): Set[Seq[Any]] =
    graft.operators.Scd2.history(df, "user", Seq("state"), "ts")
      .collect().map(_.toSeq).toSet

  private def served(path: String): Set[Seq[Any]] =
    SilverIndex.scd2Index(spark, path)
      .select("user", "state", "effective_from", "effective_to",
        "is_current")
      .collect().map(_.toSeq).toSet

  private def fold(df: DataFrame, cuts: Seq[Int], path: String): Unit = {
    val bounds = (Int.MinValue +: cuts :+ Int.MaxValue).sliding(2).toSeq
    bounds.zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      SilverIndex.refreshScd2(
        df.where(col("ts") > lo && col("ts") <= hi),
        batchId = i.toLong, keyCol = "user", attrCols = Seq("state"),
        tsCol = "ts", path = path)
    }
  }

  test("randomized time-ordered chunking-fuzz: any cut set between " +
      "distinct timestamps folds to the one-shot history") {
    val df = log(spark)
    val want = oneShot(df)
    val distinctTs = df.select("ts").distinct()
      .collect().map(_.getInt(0)).sorted
    val rnd = new scala.util.Random(17)
    (1 to 5).foreach { trial =>
      val path = tmp(s"graft-scd2inc-$trial")
      val cuts = distinctTs.filter(_ => rnd.nextBoolean()).toSeq
      fold(df, cuts, path)
      assert(served(path) == want, s"trial $trial (cuts=$cuts)")
    }
    // the explicit cross-batch collapse: B has ONE version spanning
    // the boundary between its two identical arrivals
    val path = tmp("graft-scd2inc-b")
    fold(df, Seq(3), path) // B's m@1 in batch 0, m@4 in batch 1
    assert(served(path) == want)
    val bRows = SilverIndex.scd2Index(spark, path)
      .where(col("user") === "B").collect()
    assert(bRows.length == 1 && bRows.head.getInt(
      bRows.head.fieldIndex("effective_from")) == 1)
  }

  test("replay of a committed batch id is a no-op; an empty batch " +
      "under a new id is identity") {
    val s = spark
    import s.implicits._
    val path = tmp("graft-scd2inc-replay")
    val df = log(spark)
    fold(df, Seq(3), path)
    val want = served(path)
    val r = SilverIndex.refreshScd2(
      Seq(("Z", "zzz", 999)).toDF("user", "state", "ts"),
      batchId = 1L, keyCol = "user", attrCols = Seq("state"),
      tsCol = "ts", path = path)
    assert(r.appended == 0 && served(path) == want,
      "replayed id must short-circuit")
    SilverIndex.refreshScd2(
      Seq.empty[(String, String, Int)].toDF("user", "state", "ts"),
      batchId = 5L, keyCol = "user", attrCols = Seq("state"),
      tsCol = "ts", path = path)
    assert(served(path) == want, "empty batch must be identity")
  }

  test("out-of-order batch (timestamp at or below the high-water mark) " +
      "raises instead of silently corrupting the fold") {
    val s = spark
    import s.implicits._
    val path = tmp("graft-scd2inc-ooo")
    fold(log(spark), Seq.empty, path) // one batch, hwm = 6
    val e = intercept[IllegalArgumentException] {
      SilverIndex.refreshScd2(
        Seq(("A", "w", 4)).toDF("user", "state", "ts"),
        batchId = 9L, keyCol = "user", attrCols = Seq("state"),
        tsCol = "ts", path = path)
    }
    assert(e.getMessage.contains("high-water mark"))
    // equal-to-hwm is also rejected (the cross-batch tie-break cannot
    // be replayed without the full log)
    val e2 = intercept[IllegalArgumentException] {
      SilverIndex.refreshScd2(
        Seq(("A", "w", 6)).toDF("user", "state", "ts"),
        batchId = 10L, keyCol = "user", attrCols = Seq("state"),
        tsCol = "ts", path = path)
    }
    assert(e2.getMessage.contains("high-water mark"))
  }

  test("crash window: an orphan _tmp AND a stale orphaned closed/batch " +
      "partition from a crashed commit are invisible to readers and " +
      "overwritten by the replay") {
    val s = spark
    import s.implicits._
    val path = tmp("graft-scd2inc-crash")
    val df = log(spark)
    SilverIndex.refreshScd2(df.where(col("ts") <= 3), 0L, "user",
      Seq("state"), "ts", path)
    val afterB0 = served(path)
    // crash state 1: staged current segment, never renamed
    Seq(("junk", "junk", -1)).toDF("user", "state", "ts")
      .write.parquet(s"$path/_tmp_v1/history")
    // crash state 2: the crashed fold had already written its closed
    // partition (with rows a re-run would NOT produce — junk proves
    // the replay overwrites rather than adopts, and the reader's
    // batch <= committed-version filter hides it meanwhile)
    Seq(("junk", "junk", -1, -1, false))
      .toDF("user", "state", "effective_from", "effective_to",
        "is_current")
      .write.parquet(s"$path/closed/batch=1")
    assert(served(path) == afterB0,
      "reader must ignore the orphan staging dir AND the orphaned " +
        "closed partition")
    SilverIndex.refreshScd2(df.where(col("ts") > 3), 1L, "user",
      Seq("state"), "ts", path)
    assert(served(path) == oneShot(df), "replay recovered the crash window")
    assert(!served(path).exists(_.head == "junk"),
      "replay adopted the stale closed partition instead of " +
        "overwriting it")
  }

  test("point-in-time serve (g7): asOf == the one-shot reconstruction " +
      "filtered to T at every probe; dead closed batches prune out of " +
      "the scan") {
    val path = tmp("graft-scd2inc-asof")
    val df = log(spark)
    fold(df, Seq(2, 5), path) // three batches: hwm 2, 5, 6
    def asOfSet(t: Int): Set[Seq[Any]] =
      SilverIndex.scd2AsOf(spark, path, lit(t))
        .select("user", "state", "effective_from", "effective_to",
          "is_current")
        .collect().map(_.toSeq).toSet
    def wantAt(t: Int): Set[Seq[Any]] = oneShot(df).filter { r =>
      r(2).asInstanceOf[Int] <= t &&
        (r(3) == null || r(3).asInstanceOf[Int] > t)
    }
    (0 to 7).foreach { t =>
      assert(asOfSet(t) == wantAt(t), s"asOf($t)")
    }
    // the pruning itself: at T past every closed hwm but one, the
    // closed scan's PartitionFilters exclude the dead batches
    val plan = SilverIndex.scd2AsOf(spark, path, lit(6))
      .queryExecution.executedPlan
    val pf = plan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("/closed")) =>
        f.partitionFilters.mkString(" && ")
    }
    assert(pf.nonEmpty && pf.head.contains("NOT batch"),
      s"expected a dead-batch NOT IN partition filter, got: $pf")
  }

  test("orphan guard: a crashed fold's closed partition surfacing " +
      "under a DIFFERENT batch id raises; replaying the SAME id " +
      "recovers") {
    val s = spark
    import s.implicits._
    val path = tmp("graft-scd2inc-orphan")
    val df = log(spark)
    SilverIndex.refreshScd2(df.where(col("ts") <= 3), 0L, "user",
      Seq("state"), "ts", path)
    // crashed fold 1: closed partition written, commit never landed
    Seq(("junk", "junk", -1, -1, false))
      .toDF("user", "state", "effective_from", "effective_to",
        "is_current")
      .write.parquet(s"$path/closed/batch=1")
    // a later batch under a DIFFERENT id must raise, not adopt the
    // orphan once its own commit un-hides it (ADVICE r17)
    val e = intercept[IllegalArgumentException] {
      SilverIndex.refreshScd2(df.where(col("ts") > 3), 2L, "user",
        Seq("state"), "ts", path)
    }
    assert(e.getMessage.contains("orphaned closed partition"))
    // the recovery path: replay under the crashed id, then continue
    SilverIndex.refreshScd2(df.where(col("ts") > 3), 1L, "user",
      Seq("state"), "ts", path)
    assert(served(path) == oneShot(df))
  }

  test("two-segment layout: closed partitions are never rewritten by " +
      "later folds; the current segment stays keys-sized") {
    val path = tmp("graft-scd2inc-seg")
    val df = log(spark)
    fold(df, Seq(2, 5), path) // three batches
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def closedFiles(b: Int) =
      fs.listStatus(new org.apache.hadoop.fs.Path(
          s"$path/closed/batch=$b"))
        .filter(_.isFile).filterNot(_.getPath.getName.startsWith("_"))
        .map(f => f.getPath.getName -> f.getModificationTime).toMap
    val b0Before = closedFiles(0)
    assert(b0Before.nonEmpty, "batch 0 closed versions exist")
    // a further fold must not touch earlier closed partitions
    val s = spark
    import s.implicits._
    SilverIndex.refreshScd2(
      Seq(("A", "z", 99)).toDF("user", "state", "ts"),
      batchId = 9L, keyCol = "user", attrCols = Seq("state"),
      tsCol = "ts", path = path)
    assert(closedFiles(0) == b0Before,
      "an immutable closed partition was rewritten")
    // the current segment holds exactly one open version per key
    val cur = spark.read.parquet(
      s"$path/v9/history")
    val users = df.select("user").distinct().count()
    assert(cur.count() == users && cur.collect().forall(r =>
      r.getBoolean(r.fieldIndex("is_current"))),
      "current segment must be one open version per key")
    assert(served(path) == oneShot(df.unionByName(
      Seq(("A", "z", 99)).toDF("user", "state", "ts"))))
  }
}
