package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkTestBase {

  private def diff(a: Seq[(Long, Option[String], String)],
      b: Seq[(Long, Option[String], String)]): Map[Long, String] = {
    val s = spark
    import s.implicits._
    SnapshotDiff.diff(a.toDF("k", "t", "l"), b.toDF("k", "t", "l"),
        "k", Seq("t", "l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("added / removed / changed classify exactly; identical rows " +
      "emit nothing (delta-sized output)") {
    val a = Seq((1L, Some("x"), "en"), (2L, Some("y"), "en"),
      (3L, Some("z"), "de"))
    val b = Seq((1L, Some("x"), "en"), (2L, Some("Y!"), "en"),
      (4L, Some("w"), "fr"))
    assert(diff(a, b) == Map(2L -> "changed", 3L -> "removed",
      4L -> "added"))
  }

  test("digest semantics: separator blocks concatenation splits; NULLs " +
      "compare equal to NULLs; the '<null>' tag collision is pinned") {
    // ("ab","c") vs ("a","bc") must differ — the unit separator
    assert(diff(Seq((1L, Some("ab"), "c")), Seq((1L, Some("a"), "bc")))
      == Map(1L -> "changed"))
    // (null,"x") vs (null,"x") must match — null-safe equality
    assert(diff(Seq((3L, None, "x")), Seq((3L, None, "x"))) == Map.empty)
    // KNOWN LIMIT, pinned: a literal value equal to the null tag is
    // indistinguishable from NULL in the digest (documented in the
    // scaladoc; acceptable for a changelog, fatal only if someone
    // repurposes the digest as a uniqueness proof — hence this pin)
    assert(diff(Seq((2L, None, "x")), Seq((2L, Some("<null>"), "x")))
      == Map.empty)
  }

  test("NULL keys drop on both sides; empty diffs are empty; guards") {
    val s = spark
    import s.implicits._
    val withNull = Seq((Option.empty[Long], "t", "l"),
      (Some(1L), "t", "l")).toDF("k", "t", "l")
    val out = SnapshotDiff.diff(withNull, withNull.limit(0), "k", Seq("t"))
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(withNull, withNull, "k", Nil)
    }
  }
}
