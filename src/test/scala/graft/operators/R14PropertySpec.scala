package graft.operators

import graft.{PropHelper, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import java.sql.Timestamp

/** Randomized properties for the r14 operator wave — each is an
  * invariant a JVM-side reference implementation can check exactly,
  * driven over Spark with generated inputs (the PropHelper discipline:
  * deterministic seeds, no scalatest-scalacheck bridge). Spark jobs are
  * slow relative to property trials, so each property batches ONE
  * generated dataset per Spark action and checks every row. */
class R14PropertySpec extends SparkTestBase with PropHelper {

  private val genRows: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(30, 120)
    rows <- Gen.listOfN(n,
      Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 2000000L)))
  } yield rows

  test("Decay: score equals the exact rational sum for random event sets") {
    val s = spark
    import s.implicits._
    forAllGen(genRows, trials = 6) { rows =>
      val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
      val df = rows.map { case (u, secsBack) =>
        (u, "e", new Timestamp(base - secsBack * 1000L))
      }.toDF("user_id", "event_type", "ts")
      val got = Decay.halfLifeScores(df, "user_id", "event_type", "ts", 7)
        .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
      // JVM reference: identical day-age bucketing from the corpus max
      val days = rows.map { case (u, sb) =>
        val t = base - sb * 1000L
        (u, t / 86400000L) // epoch days (UTC session zone, dates > 0)
      }
      val refDay = days.map(_._2).max
      val want = days.groupBy(_._1).map { case (u, ds) =>
        u -> ds.map { case (_, d) =>
          math.pow(2.0, -math.min(((refDay - d) / 7).toInt, 30))
        }.sum
      }
      assert(got == want, s"decay diverged for ${rows.take(3)}…")
    }
  }

  test("Eval.mrrAtK/ndcgAtK: bounds and consistency on random rankings") {
    val s = spark
    import s.implicits._
    val genRank: Gen[List[(String, Long, Int)]] = for {
      nq <- Gen.choose(2, 5)
      perQ <- Gen.listOfN(nq, Gen.choose(1, 6))
    } yield perQ.zipWithIndex.flatMap { case (k, qi) =>
      // a permutation of items 1..6 cut at k, ranks 1..k
      scala.util.Random.javaRandomToRandom(
        new java.util.Random(qi * 31 + k)).shuffle((1L to 6L).toList)
        .take(k).zipWithIndex
        .map { case (item, r) => (s"q$qi", item, r + 1) }
    }
    forAllGen(Gen.zip(genRank, genRank), trials = 6) { case (ga, gx) =>
      val approx = ga.toDF("q", "item", "rank")
      val exact = gx.toDF("q", "item", "rank")
      val mrr = Eval.mrrAtK(approx, exact, "q", "item", "rank", 6, 3)
        .collect()
      mrr.foreach { r =>
        val (fr, rr, hit) = (r.getLong(2), r.getDouble(3), r.getLong(4))
        assert(rr >= 0.0 && rr <= 1.0)
        assert((hit == 1L) == (fr > 0))
        if (fr > 0)
          assert(math.abs(rr - BigDecimal(1.0 / fr)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0)
      }
      val ndcg = Eval.ndcgAtK(approx, exact, "q", "item", "rank", 6)
        .collect()
      ndcg.foreach { r =>
        val v = r.getDouble(3)
        assert(v >= 0.0 && v <= 1.0 + 1e-9,
          s"ndcg out of range: $v")
      }
      // every exact-side query appears in both reports
      val eq = gx.map(_._1).toSet
      assert(mrr.map(_.getString(0)).toSet == eq)
      assert(ndcg.map(_.getString(0)).toSet == eq)
    }
  }

  test("Privacy: suppress/report agree and erasure identity holds on random tables") {
    val s = spark
    import s.implicits._
    val genTab: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(20, 80)
      rows <- Gen.listOfN(n,
        Gen.zip(Gen.choose(1L, 8L), Gen.choose(1L, 4L)))
    } yield rows
    forAllGen(genTab, trials = 6) { rows =>
      val df = rows.toDF("quasi", "key")
      val k = 5
      val rep = Privacy.kAnonymityReport(df, Seq("quasi"), k)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val want = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(rep.view.mapValues(_._1).toMap == want)
      rep.foreach { case (_, (n, risk)) =>
        assert((risk == 1L) == (n < k)) }
      val released = Privacy.suppress(df, Seq("quasi"), k).count()
      assert(released == want.values.filter(_ >= k).sum)

      val subjects = Seq(1L, 3L).toDF("subject")
      val audit = Privacy.erasureAudit(Seq(("t", df, "key")),
          subjects, "subject").collect().head
      assert(audit.getLong(1) == audit.getLong(2) + audit.getLong(3),
        "n_total must equal n_refs + n_after")
      assert(audit.getLong(2) ==
        rows.count(r => r._2 == 1L || r._2 == 3L))
    }
  }

  test("portable MinHash: estimate equals the JVM replay on random sets") {
    val s = spark
    import s.implicits._
    val genSets: Gen[(List[String], List[String])] = for {
      na <- Gen.choose(5, 40)
      nb <- Gen.choose(5, 40)
      a <- Gen.listOfN(na, Gen.choose(0, 60).map(i => s"g$i"))
      b <- Gen.listOfN(nb, Gen.choose(0, 60).map(i => s"g$i"))
    } yield (a.distinct, b.distinct)
    def jvmSig(set: Seq[String], seeds: Int): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until seeds).map { i =>
        set.map { g =>
          md.reset()
          md.digest(s"$i:$g".getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString.take(12)
        }.min
      }
    }
    forAllGen(genSets, trials = 6) { case (a, b) =>
      val df = Seq(("a", a), ("b", b)).toDF("id", "sh")
      val sigs = df.select(col("id"),
          Sketches.minhashPortable(col("sh"), 8).as("sig"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      assert(sigs("a") == jvmSig(a, 8),
        "Spark signature diverged from the JVM md5 replay")
      assert(sigs("b") == jvmSig(b, 8))
    }
  }
}
