package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkTestBase {

  private def people = {
    val s = spark
    import s.implicits._
    // (agency, title, outcome): the (agency, title) quasi-groups are
    // sized 3, 2, 1 — at k=3 only the first survives
    Seq(
      ("parks", "analyst", "hired"), ("parks", "analyst", "hired"),
      ("parks", "analyst", "rejected"),
      ("parks", "manager", "hired"), ("parks", "manager", "hired"),
      ("dot", "analyst", "rejected"))
      .toDF("agency", "title", "outcome")
  }

  test("kAnonymityReport flags groups under k; suppress drops exactly them") {
    val rep = Privacy.kAnonymityReport(people, Seq("agency", "title"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(rep == Map(
      ("parks", "analyst") -> ((3L, 0L)),
      ("parks", "manager") -> ((2L, 1L)),
      ("dot", "analyst") -> ((1L, 1L))))

    val released = Privacy.suppress(people, Seq("agency", "title"), k = 3)
    assert(released.count() == 3)
    assert(released.select("title").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("analyst"))
    // every surviving quasi-group reaches k
    val sizes = released.groupBy("agency", "title").count()
      .collect().map(_.getLong(2))
    assert(sizes.forall(_ >= 3))
  }

  test("NULL quasi values form their own (flaggable) group") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("parks"), None, None).map(a => (a, "x"))
      .toDF("agency", "title")
    val rep = Privacy.kAnonymityReport(df, Seq("agency"), k = 2)
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep(None) == ((2L, 0L)))
    assert(rep(Some("parks")) == ((1L, 1L)))
    // and suppress must agree with the report: the NULL group reached
    // k, so its rows SURVIVE the release (null-safe join, not equi)
    val released = Privacy.suppress(df, Seq("agency"), k = 2)
      .collect().map(r => Option(r.getString(0)))
    assert(released.length == 2 && released.forall(_.isEmpty))
  }

  test("lDiversityReport: homogeneous k-anonymous group is not diverse") {
    val rep = Privacy.lDiversityReport(people, Seq("agency", "title"),
        "outcome", l = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // (parks, analyst): 3 rows, 2 outcomes -> diverse
    assert(rep(("parks", "analyst")) == ((3L, 2L, 1L)))
    // (parks, manager): 2 rows but ONE outcome -> k-anonymous yet
    // disclosing, the case l-diversity exists to catch
    assert(rep(("parks", "manager")) == ((2L, 1L, 0L)))
  }

  test("generalizeSuppress: finest level that reaches k, local recoding") {
    val s = spark
    import s.implicits._
    // hierarchy: nations a,b -> region R1; c -> R2
    val hier = Seq(("a", "R1"), ("b", "R1"), ("c", "R2"))
      .toDF("fine", "coarse")
    // title "x": nation a has 3 rows (>= k=3, level 0); nations b and c
    // have 2 each (< k) — b pools into R1 alone (2 < 3, suppressed?
    // no: R1's LEFTOVERS are only b's 2 rows since a released at level
    // 0 — local recoding), c's 2 rows pool into R2 (2 < 3, suppressed)
    val rows = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "x"),
      (4L, "b", "x"), (5L, "b", "x"),
      (6L, "c", "x"), (7L, "c", "x"),
      // title "y": a,b have 2 rows each — neither reaches k alone, but
      // their R1 leftovers pool to 4 >= 3 -> level 1
      (8L, "a", "y"), (9L, "a", "y"),
      (10L, "b", "y"), (11L, "b", "y"))
      .toDF("id", "nation", "title")
    val got = Privacy.generalizeSuppress(rows, "id", "nation",
        hier, "fine", "coarse", Seq("title"), k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getString(3)))).toMap
    // level 0: nation a, title x
    Seq(1L, 2L, 3L).foreach(i => assert(got(i) == ((0L, "a"))))
    // level 2: b-x's R1 leftovers are 2 (< 3) and c-x's R2 leftovers 2
    Seq(4L, 5L, 6L, 7L).foreach(i => assert(got(i) == ((2L, "SUPPRESSED"))))
    // level 1: a-y + b-y pool to 4 in R1
    Seq(8L, 9L, 10L, 11L).foreach(i => assert(got(i) == ((1L, "c:R1"))))
  }

  test("tClosenessReport: homogeneous group far, proportional group at 0") {
    val s = spark
    import s.implicits._
    // global: 6 hired / 6 rejected. Group A mirrors it exactly (tv 0);
    // group B is ALL hired — k-anonymous and l-diverse-looking sizes,
    // but its distribution discloses: tv = |1−0.5|/2 + |0−0.5|/2 = 0.5
    val df = (Seq.fill(3)(("A", "hired")) ++ Seq.fill(3)(("A", "rejected")) ++
      Seq.fill(3)(("B", "hired")) ++ Seq.fill(3)(("C", "rejected")))
      .toDF("grp", "outcome")
    val rep = Privacy.tClosenessReport(df, Seq("grp"), "outcome", t = 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(rep("A") == ((6L, 0.0, 1L)))
    assert(rep("B") == ((3L, 0.5, 0L)))
    assert(rep("C") == ((3L, 0.5, 0L)))
    // NULL sensitive values drop from both distributions
    val withNull = df.unionByName(
      Seq(("B", Option.empty[String])).toDF("grp", "outcome"))
    val rep2 = Privacy.tClosenessReport(withNull, Seq("grp"), "outcome",
        t = 0.3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep2("B") == 3L, "NULL sensitive must not count into group_n")
    intercept[IllegalArgumentException] {
      Privacy.tClosenessReport(df, Seq(), "outcome", 0.3)
    }
    intercept[IllegalArgumentException] {
      Privacy.tClosenessReport(df, Seq("grp"), "outcome", 0.0)
    }
  }

  test("dpCounts: seeded noise replays, responds to salt, stays Laplace-scaled") {
    val a = Privacy.dpCounts(people, Seq("agency"), epsilon = 0.5, "s1")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val b = Privacy.dpCounts(people, Seq("agency"), epsilon = 0.5, "s1")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(a == b, "same salt must replay the identical release")
    val c = Privacy.dpCounts(people, Seq("agency"), epsilon = 0.5, "s2")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(a.keySet.exists(k => a(k)._2 != c(k)),
      "a new salt must draw new noise")
    assert(a.values.forall { case (_, n) => math.abs(n) < 60.0 },
      "P[|Laplace(2)| > 60] = e^-30: a violation means broken math")
    assert(a("parks")._1 == 5L && a("dot")._1 == 1L)
  }

  test("dpCounts: groups differing only by a NULL quasi column draw DIFFERENT noise") {
    val s = spark
    import s.implicits._
    // pre-r15, concat_ws skipped NULLs so both groups seeded from
    // "salt|parks" and drew CORRELATED (identical) noise; the operator
    // now coalesces each quasi column to '<null>' in the seed
    val df = Seq(
      (Option("parks"), Option.empty[String]),
      (Option.empty[String], Option("parks")))
      .toDF("a", "b")
    val noise = Privacy.dpCounts(df, Seq("a", "b"), epsilon = 0.5, "s1")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))
        -> r.getDouble(3)).toMap
    assert(noise.size == 2, "NULL still groups as its own value")
    assert(noise((Some("parks"), None)) != noise((None, Some("parks"))),
      "NULL-differing groups must not share a noise seed")
  }

  test("erasureAudit: accounting identity, NULL keys survive, re-audit zero") {
    val s = spark
    import s.implicits._
    val users = Seq(Some(1L), Some(2L), Some(3L), None)
      .toDF("uid")
    val orders = Seq(1L, 1L, 2L, 9L).toDF("ouid")
    val subjects = Seq(1L).toDF("subject")
    val rep = Privacy.erasureAudit(
        Seq(("users", users, "uid"), ("orders", orders, "ouid")),
        subjects, "subject")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // NULL uid never matches a subject: it counts in n_after
    assert(rep("users") == ((4L, 1L, 3L)))
    assert(rep("orders") == ((4L, 2L, 2L)))
    rep.values.foreach { case (t, r, a) => assert(t == r + a) }

    // the action + re-audit: zero remaining references
    val erased = Privacy.erase(orders, "ouid", subjects, "subject")
    val re = Privacy.erasureAudit(Seq(("orders", erased, "ouid")),
        subjects, "subject")
      .collect().head
    assert(re.getLong(1) == 2L && re.getLong(2) == 0L)
  }

  test("parameter guards") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(people, Seq(), k = 3)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(people, Seq("agency"), k = 1)
    }
    intercept[IllegalArgumentException] {
      Privacy.lDiversityReport(people, Seq("agency"), "outcome", l = 1)
    }
    intercept[IllegalArgumentException] {
      Privacy.dpCounts(people, Seq("agency"), epsilon = 0.0, "s")
    }
  }
}
