package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SplitsSpec extends SparkTestBase {

  test("split assignment is a pure function of (salt, id): JVM md5 parity") {
    val s = spark
    import s.implicits._
    val df = (0L until 2000L).toDF("id")
    val got = Splits.assignSplit(df, "id", "saltA",
      Seq("val" -> 0.1, "test" -> 0.1, "train" -> 0.8))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    def jvmSplit(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"saltA:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
      if (hex < Splits.thresholdHex(0.1)) "val"
      else if (hex < Splits.thresholdHex(0.2)) "test"
      else "train"
    }
    (0L until 2000L).foreach(id => assert(got(id) == jvmSplit(id), s"id $id"))

    // fractions land near target (binomial tolerance)
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("val") - 200) < 60, counts.toString)
    assert(math.abs(counts("test") - 200) < 60, counts.toString)
  }

  test("assignment survives repartitioning and differs across salts") {
    val s = spark
    import s.implicits._
    val df = (0L until 500L).toDF("id")
    def run(d: org.apache.spark.sql.DataFrame, salt: String) =
      Splits.assignSplit(d, "id", salt, Seq("a" -> 0.5, "b" -> 0.5))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = run(df, "s1")
    assert(run(df.repartition(13), "s1") == base)
    assert(run(df, "s2") != base)
  }
}
