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

  test("sampleByHash: rates nest exactly and respect strata") {
    val s = spark
    import s.implicits._
    val df = (0L until 3000L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
    def ids(rates: Map[String, Double]): Set[Long] =
      Splits.sampleByHash(df, "id", "lang", "mix", rates)
        .collect().map(_.getLong(0)).toSet
    val r10 = ids(Map("lang0" -> 0.1, "lang1" -> 1.0))
    val r20 = ids(Map("lang0" -> 0.2, "lang1" -> 1.0))
    // the 10% sample is EXACTLY contained in the 20% sample (same hash
    // space, higher threshold) — remixing preserves prior picks
    assert(r10.subsetOf(r20), "rate nesting violated")
    // rate 1.0 keeps every row of its stratum; absent strata drop
    val lang1All = df.where($"lang" === "lang1").collect().map(_.getLong(0)).toSet
    assert(r10.filter(_ % 3 == 1) == lang1All)
    assert(r10.forall(_ % 3 != 2)) // lang2 has no rate → dropped
    // fractions land near target
    val kept0 = r20.count(_ % 3 == 0)
    assert(math.abs(kept0 - 200) < 60, s"20% of 1000 ≈ 200, got $kept0")
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

  test("epochShuffle: dense per-shard positions, one address per row") {
    val s = spark
    import s.implicits._
    val df = (0L until 400L).toDF("id")
    val got = Splits.epochShuffle(df, "id", "epoch-spec", epoch = 0,
        nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.length == 400 && got.map(_._1).distinct.length == 400)
    // every shard's positions are exactly 1..count (a loader can stream
    // shards in pos order with no gaps)
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 4)
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not dense")
    }
    // rough uniformity across shards
    assert(got.groupBy(_._2).values.forall(g =>
      g.length > 50 && g.length < 150))
  }

  test("epochShuffle: replays across repartitioning; epochs re-permute") {
    val s = spark
    import s.implicits._
    val df = (0L until 300L).toDF("id")
    def run(d: org.apache.spark.sql.DataFrame, epoch: Int) =
      Splits.epochShuffle(d, "id", "epoch-spec", epoch, nShards = 8)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2))))
        .toMap
    val e0 = run(df, 0)
    assert(run(df.repartition(17), 0) == e0)
    val e1 = run(df, 1)
    assert(e1 != e0)
    // the shuffle actually moves rows: most ids change address
    assert(e0.count { case (id, addr) => e1(id) == addr } < 30)
  }

  test("epochShuffle: parameter guards") {
    val s = spark
    import s.implicits._
    val df = (0L until 10L).toDF("id")
    intercept[IllegalArgumentException](
      Splits.epochShuffle(df, "id", "x", epoch = -1, nShards = 4))
    intercept[IllegalArgumentException](
      Splits.epochShuffle(df, "id", "x", epoch = 0, nShards = 0))
  }

  test("leakFreeSplit: a near-dup cluster never straddles splits") {
    val s = spark
    import s.implicits._
    val docs = (1L to 40L).toDF("doc_id")
    // pairs 1-2 and 5-6-7 form clusters; everything else is singleton
    val pairs = Seq((1L, 2L), (5L, 6L), (6L, 7L)).toDF("doc_a", "doc_b")
    // salt 'y' is CHOSEN so the naive doc-keyed split separates the
    // 1-2 pair (md5('y:1') -> train, md5('y:2') -> test) — the leak
    // this operator exists to prevent
    val naive = Splits.assignSplit(docs, "doc_id", "y",
        Seq("val" -> 0.1, "test" -> 0.1, "train" -> 0.8))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(naive(1L) != naive(2L),
      "salt 'y' no longer demonstrates the doc-keyed leak — pick another")
    val got = Splits.leakFreeSplit(docs, "doc_id", pairs, "y",
        Seq("val" -> 0.1, "test" -> 0.1, "train" -> 0.8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val bySplit = got.map(t => t._1 -> t._3).toMap
    // the clusters move together under the SAME salt that leaked above
    assert(bySplit(1L) == bySplit(2L))
    assert(bySplit(5L) == bySplit(6L) && bySplit(6L) == bySplit(7L))
    // every cluster maps to exactly one split
    got.groupBy(_._2).foreach { case (comp, rows) =>
      assert(rows.map(_._3).distinct.length == 1,
        s"component $comp straddles splits: ${rows.toSeq}")
    }
    // all three splits exist over 38 clusters (sanity, not a contract)
    assert(got.map(_._3).distinct.length == 3)
  }

  test("capPerStratum: binds only above N, hash-ordered, deterministic") {
    val s = spark
    import s.implicits._
    // big.com has 30 docs (cap binds), small.org has 3 (all survive)
    val docs = ((0L until 30L).map(i => (i, "big.com")) ++
      (100L until 103L).map(i => (i, "small.org")))
      .toDF("doc_id", "domain")
    val got = Splits.capPerStratum(docs, "doc_id", "domain",
      "cap-spec", maxRows = 10)
    val byDomain = got.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    // cap binds only above N
    assert(byDomain("big.com").length == 10)
    assert(byDomain("small.org").length == 3)
    assert(byDomain("small.org").map(_._2).toSet == Set(100L, 101L, 102L))
    // survivors are the hash-order head: equal to the window formulation
    val expected = docs
      .withColumn("__hk", Splits.hashKey(col("doc_id"), "cap-spec"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("domain")
          .orderBy(col("__hk"), col("doc_id"))))
      .where(col("rn") <= 10)
      .collect().map(r => (r.getString(1), r.getLong(0),
        r.getInt(3).toLong)).toSet
    assert(got.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet == expected)
    // deterministic across reruns
    val again = Splits.capPerStratum(docs, "doc_id", "domain",
      "cap-spec", maxRows = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == expected)
    // a different salt picks a different (still size-10) head
    val other = Splits.capPerStratum(docs, "doc_id", "domain",
      "cap-spec-2", maxRows = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(other.count(_._1 == "big.com") == 10)
    assert(other != expected.map(e => (e._1, e._2)))
    // guards
    intercept[IllegalArgumentException](
      Splits.capPerStratum(docs, "doc_id", "domain", "cap-spec", 0))
    // NULL strata drop (documented convention), others unaffected
    val withNull = Seq((1L, Option("a.com")), (2L, None: Option[String]))
      .toDF("doc_id", "domain")
    val kept = Splits.capPerStratum(withNull, "doc_id", "domain",
      "cap-spec", 5).collect().map(_.getLong(1)).toSet
    assert(kept == Set(1L), kept.toString)
  }

  test("temperatureBudgets: T=1 proportional, T→∞ uniform, monotone between") {
    val s = spark
    import s.implicits._
    // masses: en 6000, es 1500, de 500 (total 8000)
    val docs = (Seq.fill(6)(("en", 1000L)) ++ Seq.fill(3)(("es", 500L)) ++
      Seq(("de", 500L))).zipWithIndex
      .map { case ((l, n), i) => (i.toLong, l, n) }
      .toDF("doc_id", "lang", "n_tokens")
    def budgets(t: Double) =
      Splits.temperatureBudgets(docs, "lang", "n_tokens",
        totalBudget = 8000L, temperature = t)
    // T = 1: exactly the corpus proportions (shares .75/.1875/.0625)
    assert(budgets(1.0) == Map("en" -> 6000L, "es" -> 1500L, "de" -> 500L))
    // T huge: shares flatten to 1/3 each -> floor(8000/3) = 2666
    val flat = budgets(1e9)
    assert(flat.values.toSet == Set(2666L), flat.toString)
    // monotone: raising T strictly shrinks the head, grows the tail
    val mid = budgets(2.0)
    assert(mid("en") < 6000L && mid("en") > 2666L, mid.toString)
    assert(mid("de") > 500L && mid("de") < 2666L, mid.toString)
    // floor at 1: a near-zero-mass stratum still gets a budget
    val tiny = (docs.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSeq :+
        ((99L, "fr", 1L))).toDF("doc_id", "lang", "n_tokens")
    assert(Splits.temperatureBudgets(tiny, "lang", "n_tokens",
      8000L, 1.0)("fr") == 1L)
    // guards
    intercept[IllegalArgumentException](budgets(0.0))
    intercept[IllegalArgumentException](budgets(Double.PositiveInfinity))
    intercept[IllegalArgumentException](
      Splits.temperatureBudgets(docs, "lang", "n_tokens", 0L, 1.0))
  }

  test("temperatureBudgets degenerate strata: null-token mass is 0, all-zero errors") {
    val s = spark
    import s.implicits._
    // a stratum whose every row has NULL tokens budgets as zero mass
    // (floor-at-1 keeps it alive), not an NPE
    val withNull = Seq((1L, "en", Option(100L)),
      (2L, "xx", None: Option[Long])).toDF("doc_id", "lang", "n_tokens")
    val b = Splits.temperatureBudgets(withNull, "lang", "n_tokens",
      1000L, 1.0)
    assert(b == Map("en" -> 1000L, "xx" -> 1L), b.toString)
    // all-zero total mass is a clear error, not BigDecimal(NaN)
    val zeros = Seq((1L, "en", 0L), (2L, "es", 0L))
      .toDF("doc_id", "lang", "n_tokens")
    val ex = intercept[IllegalArgumentException](
      Splits.temperatureBudgets(zeros, "lang", "n_tokens", 1000L, 1.0))
    assert(ex.getMessage.contains("mass"), ex.getMessage)
  }

  test("thresholdHex rejects f >= 1.0 (13-hex-char silent mis-split guard)") {
    assert(Splits.thresholdHex(0.0) == "000000000000")
    assert(Splits.thresholdHex(0.5) == "800000000000")
    intercept[IllegalArgumentException](Splits.thresholdHex(1.0))
    intercept[IllegalArgumentException](Splits.thresholdHex(1.5))
    intercept[IllegalArgumentException](Splits.thresholdHex(-0.1))
  }
}
