package graft.operators

import graft.{PropHelper, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import java.sql.Timestamp

/** Randomized properties for the r15 operator wave — the R14 discipline:
  * JVM-side reference implementations checked exactly against Spark over
  * generated inputs, one generated dataset per Spark action. */
class R15PropertySpec extends SparkTestBase with PropHelper {

  // ---------------------------------------------------------- dHash

  /** JVM reference of [[Multimodal.dhashFingerprint]]. */
  private def refDhash(b: Array[Byte]): Long =
    (0 until 63).map { j =>
      val x = if (j < b.length) b(j) & 0xff else -1
      val y = if (j + 1 < b.length) b(j + 1) & 0xff else -1
      if (x >= 0 && y >= 0 && x < y) 1L << j else 0L
    }.sum

  test("dhashFingerprint: equals the JVM reference; a one-byte " +
      "perturbation moves at most 2 hamming bits") {
    val s = spark
    import s.implicits._
    val genFrame: Gen[(List[Int], Int, Int)] = for {
      bytes <- Gen.listOfN(64, Gen.choose(0, 255))
      pos <- Gen.choose(0, 63)
      nb <- Gen.choose(0, 255)
    } yield (bytes, pos, nb)
    forAllGen(genFrame, trials = 4) { case (bytes, pos, nb) =>
      val a = bytes.map(_.toByte).toArray
      val b = a.clone(); b(pos) = nb.toByte
      val got = Seq((1L, a), (2L, b)).toDF("id", "frame")
        .select(col("id"), Multimodal.dhashFingerprint(col("frame")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got(1L) == refDhash(a) && got(2L) == refDhash(b),
        s"fingerprint diverged from the JVM reference at pos=$pos")
      val ham = java.lang.Long.bitCount(got(1L) ^ got(2L))
      assert(ham <= 2,
        s"one-byte perturbation at $pos moved $ham bits (> 2)")
    }
  }

  // -------------------------------------------------- heavy hitters

  test("heavyHitters: complete above phi*N, exact-verified, " +
      "overcount-only on random skewed bags") {
    val s = spark
    import s.implicits._
    val genBag: Gen[List[Long]] = for {
      hotMass <- Gen.choose(50, 200)
      coldN <- Gen.choose(100, 400)
      cold <- Gen.listOfN(coldN, Gen.choose(10L, 40L))
    } yield List.fill(hotMass)(1L) ++ cold
    forAllGen(genBag, trials = 4) { bag =>
      val phi = 0.08
      val n = bag.size.toLong
      val thr = math.ceil(phi * n).toLong
      val exact = bag.groupBy(identity).map { case (k, xs) =>
        k -> xs.size.toLong }
      val rep = Sketches.heavyHitters(bag.toDF("k"), "k", phi, 16, 4)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      exact.filter(_._2 >= thr).keys.foreach { k =>
        assert(rep.contains(k) && rep(k)._4 == 1L,
          s"false negative at $k (exact ${exact(k)} >= $thr)")
      }
      rep.foreach { case (k, (total, est, ex, heavy)) =>
        assert(total == n && ex == exact(k) && est >= ex &&
          (heavy == 1L) == (ex >= thr), s"bad report row at $k")
      }
    }
  }

  // ---------------------------------------------------- t-closeness

  test("tClosenessReport: equals the exact-rational JVM reference") {
    val s = spark
    import s.implicits._
    val genRows: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(40, 150)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 5L),
        Gen.oneOf("a", "b", "c")))
    } yield rows
    forAllGen(genRows, trials = 4) { rows =>
      val got = Privacy.tClosenessReport(
          rows.toDF("g", "sv"), Seq("g"), "sv", t = 0.25)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
      val n = rows.size.toLong
      val cs = rows.groupBy(_._2).map { case (v, xs) => v -> xs.size.toLong }
      val want = rows.groupBy(_._1).map { case (g, xs) =>
        val ng = xs.size.toLong
        val cgs = xs.groupBy(_._2).map { case (v, ys) => v -> ys.size.toLong }
        // .toList before map: keys is a SET, and two groups' equal
        // |...| terms would otherwise collapse before the sum
        val num = cs.keys.toList.map { v =>
          (BigInt(cgs.getOrElse(v, 0L)) * n - BigInt(cs(v)) * ng).abs
        }.sum
        val tv = BigDecimal(
            num.toDouble / (2.0 * n.toDouble * ng.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        g -> ((ng, tv, if (tv <= 0.25) 1L else 0L))
      }
      assert(got == want, s"t-closeness diverged: $got vs $want")
    }
  }

  // --------------------------------------------------------- funnel

  test("earliestCompletion: equals the greedy JVM reference on random " +
      "event logs with heavy timestamp ties") {
    val s = spark
    import s.implicits._
    val steps = Seq("v", "c", "p")
    val genEv: Gen[List[(Long, Int, String)]] = for {
      n <- Gen.choose(40, 120)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 8L),
        Gen.choose(0, 6), Gen.oneOf("v", "c", "p", "z")))
    } yield rows
    forAllGen(genEv, trials = 4) { rows =>
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val df = rows.map { case (u, m, et) =>
        (u, new Timestamp(base + m * 60000L), et)
      }.toDF("user_id", "ts", "event_type")
      val got = Funnel.earliestCompletion(df, "user_id", "event_type",
          "ts", steps)
        .collect().map { r =>
          r.getLong(0) -> (1 to 3).map(i =>
            Option(r.getTimestamp(i)).map(_.getTime)).toVector
        }.toMap
      // greedy reference: t1 = min v; t_{i+1} = min step-(i+1) ts >= t_i
      val byUser = rows.groupBy(_._1)
      val want = byUser.flatMap { case (u, xs) =>
        val ts = steps.map(st =>
          xs.filter(_._3 == st).map(x => base + x._2 * 60000L).sorted)
        ts.head.headOption.map { t1 =>
          val t2 = ts(1).find(_ >= t1)
          val t3 = t2.flatMap(v => ts(2).find(_ >= v))
          u -> Vector(Some(t1), t2, t3)
        }
      }
      assert(got == want, "funnel diverged from the greedy reference")
    }
  }
}
