package graft.operators

import graft.{PropHelper, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Randomized properties for the r16 operator wave — the R14/R15
  * discipline: JVM-side reference implementations checked exactly
  * against Spark over generated inputs, one generated dataset per
  * Spark action. (The per-operator specs carry their own seeded fuzz
  * for Cdc, Triangles, Scd2 and refreshMaxRollup; this wave covers the
  * operators whose specs pin examples rather than distributions.) */
class R16PropertySpec extends SparkTestBase with PropHelper {

  // ------------------------------------------- KMV set-algebra merge

  test("kmvSetEstimates: the merged sketch's union estimate equals the " +
      "estimate of the sketch built over A ∪ B (merge soundness)") {
    val s = spark
    import s.implicits._
    val k = 32
    val genSets: Gen[(List[Long], List[Long])] = for {
      na <- Gen.choose(5, 400)
      nb <- Gen.choose(5, 400)
      a <- Gen.listOfN(na, Gen.choose(0L, 999L))
      b <- Gen.listOfN(nb, Gen.choose(0L, 999L))
    } yield (a, b)
    forAllGen(genSets, trials = 4) { case (aKeys, bKeys) =>
      def sketch(keys: Seq[Long]): Seq[String] =
        Sketches.kmvDistinct(keys.map(("g", _)).toDF("g", "key"),
            Seq("g"), "key", k)
          .select("kmins").head().getSeq[String](0)
      val (a, b) = (sketch(aKeys), sketch(bKeys))
      val union = sketch(aKeys ++ bKeys)
      val est = Seq((a, b)).toDF("a", "b")
        .select(Sketches.kmvSetEstimates(col("a"), col("b"), k)
          .getField("est_union").as("u"))
        .head().getDouble(0)
      // the merged k-minima ARE the union's k-minima, so the estimate
      // must be IDENTICAL to one computed from a from-scratch union
      // sketch — not just close
      val want = Seq(Tuple1(union)).toDF("m")
        .select(Sketches.kmvEstimate(col("m"), k)).head().getDouble(0)
      assert(est == want,
        s"merged-sketch union estimate $est != from-scratch $want")
      // and below k everything is exact
      val exactU = (aKeys ++ bKeys).distinct.size
      if (exactU < k) assert(est == exactU.toDouble)
    }
  }

  // ------------------------------------------------ DQ expectations

  test("Expectations.report: violation counts equal a JVM fold over " +
      "the same three-valued rule") {
    val s = spark
    import s.implicits._
    val genRows: Gen[List[(Option[Long], Option[Double])]] =
      Gen.listOfN(120, Gen.zip(
        Gen.option(Gen.choose(0L, 30L)),
        Gen.option(Gen.choose(-5.0, 50.0))))
    forAllGen(genRows, trials = 4) { rows =>
      val df = rows.toDF("k", "v")
      val got = Expectations.report(df, "t", Seq(
          Expectations.Check("k_not_null", col("k").isNotNull),
          Expectations.Check("v_in_range", col("v").between(0.0, 40.0))),
        Seq(Expectations.UniqueKey("k_unique", col("k"))))
        .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
      val wantNull = rows.count(_._1.isEmpty).toLong
      // NULL v cannot prove the row valid -> violation
      val wantRange = rows.count(r =>
        !r._2.exists(v => v >= 0.0 && v <= 40.0)).toLong
      val nonNull = rows.flatMap(_._1)
      val wantDup = (nonNull.size - nonNull.distinct.size).toLong
      assert(got("k_not_null") == wantNull)
      assert(got("v_in_range") == wantRange)
      assert(got("k_unique") == wantDup)
    }
  }

  // --------------------------------------------------- level shift

  test("Drift.levelShift: equals a JVM replay of the full-window " +
      "arithmetic over random volume series") {
    val s = spark
    import s.implicits._
    val genSeries: Gen[List[(Int, Int)]] = for {
      n <- Gen.choose(4, 14)
      vols <- Gen.listOfN(n, Gen.choose(1, 12))
    } yield vols.zipWithIndex.map { case (v, i) => (i + 1, v) }
    forAllGen(genSeries, trials = 4) { series =>
      val rows = series.flatMap { case (p, v) => Seq.fill(v)(p) }
      val got = Drift.levelShift(rows.toDF("period"), "period",
          windowN = 2, threshold = 0.5)
        .collect().map(r => r.getInt(0) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      val vols = series.map(_._2)
      val want = (for {
        i <- series.indices
        if i >= 2 && i + 1 < series.size
      } yield {
        val before = (vols(i - 2) + vols(i - 1)).toLong
        val after = (vols(i) + vols(i + 1)).toLong
        series(i)._1 -> ((before, after,
          math.rint(math.abs(after - before).toDouble / before * 1e6) / 1e6))
      }).toMap
      assert(got == want, s"series=$vols")
    }
  }

  // -------------------------------------------------- snapshot diff

  test("SnapshotDiff: random edits classify exactly (JVM reference " +
      "over the same digest rule)") {
    val s = spark
    import s.implicits._
    val genEdit: Gen[(List[(Long, String)], List[Long], List[Long])] = for {
      n <- Gen.choose(10, 60)
      vals <- Gen.listOfN(n, Gen.alphaStr.map(_.take(6)))
      base = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      dropped <- Gen.someOf(base.map(_._1)).map(_.toList)
      changed <- Gen.someOf(base.map(_._1)).map(_.toList)
    } yield (base, dropped, changed)
    forAllGen(genEdit, trials = 4) { case (base, dropped, changed) =>
      val b = base.filterNot(r => dropped.contains(r._1))
        .map { case (k, v) =>
          if (changed.contains(k)) (k, v + "!") else (k, v) }
      val got = SnapshotDiff.diff(base.toDF("k", "v"), b.toDF("k", "v"),
          "k", Seq("v"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = (dropped.map(_ -> "removed") ++
        changed.filterNot(dropped.contains).map(_ -> "changed")).toMap
      assert(got == want,
        s"dropped=$dropped changed=$changed got=$got")
    }
  }
}
