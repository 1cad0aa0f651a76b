package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The sketch aggregates that replace their exact counterparts at
  * 100 TB, each pinned against the exact answer on data where both run:
  * HyperLogLog distinct counts, t-digest-style approximate quantiles,
  * Bloom-filter membership, Count-Min frequency. All are Spark
  * built-ins — the spec documents the error contracts the engine
  * relies on when exact operators (q11 countDistinct, q15 exact
  * quantiles) stop fitting. */
class SketchesSpec extends SparkTestBase {

  private lazy val orders =
    spark.read.parquet(s"${sf("sf0.01")}/orders.parquet").cache()

  test("approx_count_distinct lands within its rsd bound of the exact count") {
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = orders
      .select(approx_count_distinct(col("o_custkey"), rsd = 0.02))
      .head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    info(s"exact=$exact approx=$approx err=$err")
    assert(err <= 0.06, s"HLL error $err beyond 3×rsd") // 3σ of rsd=0.02
  }

  test("approx quantiles bracket the exact order statistics") {
    val eps = 0.01
    val Array(q25, q50, q75) = orders.stat
      .approxQuantile("o_totalprice", Array(0.25, 0.5, 0.75), eps)
    val n = orders.count()
    val sorted = orders.select("o_totalprice").orderBy("o_totalprice")
    def rankOf(v: Double): Long =
      sorted.where(col("o_totalprice") <= v).count()
    for ((q, p) <- Seq(q25 -> 0.25, q50 -> 0.5, q75 -> 0.75)) {
      val r = rankOf(q).toDouble / n
      assert(math.abs(r - p) <= eps + 1.0 / n,
        s"approx p=$p returned rank fraction $r")
    }
  }

  test("bloom filter: zero false negatives, bounded false positives") {
    val fpp = 0.03
    val bf = orders.stat.bloomFilter("o_orderkey", 20000, fpp)
    val keys = orders.select("o_orderkey").collect().map(_.getLong(0))
    assert(keys.forall(bf.mightContain), "bloom filter false negative")
    val absent = (1L to 20000L).map(_ + 10000000L)
    val fp = absent.count(bf.mightContain).toDouble / absent.size
    info(s"false-positive rate $fp (target $fpp)")
    assert(fp <= fpp * 3, s"bloom fp rate $fp far beyond target $fpp")
  }

  test("portable bloom: no false negatives, shard-merge ≡ whole, JVM md5 replay") {
    val s = spark
    import s.implicits._
    val keys = (1L to 400L).map(_ * 7L)
    val df = keys.toDF("k")
    val bloom = Sketches.bloomBuild(df, "k", numHashes = 5, mBits = 4096)
    // every built key answers might_contain = 1 — the hard contract
    val ans = Sketches.bloomMightContain(bloom, df, "k", 5, 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(keys.forall(k => ans(k) == 1L), "portable bloom false negative")
    // absent keys: fp rate sane for 5 x 4096 bits over 400 keys
    val absent = (1L to 1000L).map(_ * 7L + 3L).toDF("k")
    val fp = Sketches.bloomMightContain(bloom, absent, "k", 5, 4096)
      .where(col("might_contain") === 1L).count().toDouble / 1000
    assert(fp < 0.15, s"fp rate $fp out of family")
    // shard sketches UNION+DISTINCT to the whole — the KMV merge algebra
    val shardA = Sketches.bloomBuild(keys.take(200).toDF("k"), "k", 5, 4096)
    val shardB = Sketches.bloomBuild(keys.drop(150).toDF("k"), "k", 5, 4096)
    val merged = shardA.unionByName(shardB).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(merged == bloom.collect().map(_.getLong(0)).toSet,
      "overlapping shard merge diverged from the whole-corpus build")
    // portability: positions replay from plain JVM md5 arithmetic
    val jvm = (for { k <- keys; r <- 0 until 5 } yield {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) % 4096
    }).toSet
    assert(bloom.collect().map(_.getLong(0)).toSet == jvm,
      "stored bit set diverged from the md5 definition")
    // shape guards
    intercept[IllegalArgumentException](
      Sketches.bloomBuild(df, "k", 0, 4096))
    intercept[IllegalArgumentException](
      Sketches.bloomMightContain(bloom, df, "k", 5, 1))
  }

  test("KMV: exact below k, unbiased-estimator error within 4/sqrt(k-2) at k") {
    val s = spark
    import s.implicits._
    val k = 64
    // two groups: one under k distinct (exact regime), one far over
    val df = ((0L until 40L).map(i => ("small", i % 20)) ++
      (0L until 8000L).map(i => ("big", i % 5000)))
      .toDF("g", "key")
    val got = Sketches.kmvDistinct(df, Seq("g"), "key", k)
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getAs[Double]("est_distinct"))).toMap
    assert(got("small") == ((20, 20.0)), "below k must be exact")
    val (nk, est) = got("big")
    assert(nk == k)
    val err = math.abs(est - 5000.0) / 5000.0
    info(s"k=$k est=$est err=$err")
    assert(err <= 4.0 / math.sqrt(k - 2.0), s"KMV error $err beyond 4 sigma")
  }

  test("KMV: partition-invariant, and per-shard sketches merge to the whole") {
    val s = spark
    import s.implicits._
    val k = 16
    val df = (0L until 600L).map(i => ("g", i % 370)).toDF("g", "key")
    def sketch(d: org.apache.spark.sql.DataFrame): Seq[String] =
      Sketches.kmvDistinct(d, Seq("g"), "key", k)
        .select("kmins").head().getSeq[String](0)
    val whole = sketch(df)
    assert(whole == sketch(df.repartition(17, col("key"))),
      "sketch must not depend on partitioning")

    // store-and-merge consumer path: shard sketches, explode the stored
    // hash arrays, re-aggregate through the same bounded insert
    val shards = Sketches.kmvDistinct(df.where(col("key") % 2 === 0),
        Seq("g"), "key", k)
      .unionByName(Sketches.kmvDistinct(df.where(col("key") % 2 =!= 0),
        Seq("g"), "key", k))
    val merged = shards
      .select(col("g"), explode(col("kmins")).as("h"))
      .groupBy("g")
      .agg(udaf(new Sketches.KmvAgg(k)).apply(col("h")).as("kmins"))
      .head().getSeq[String](1)
    assert(merged == whole, "merged shard sketches must equal the whole")
  }

  test("KMV set algebra: exact below k (union/intersect/jaccard), " +
      "estimates within 4/sqrt(k-2) at k, disjoint sides give 0") {
    val s = spark
    import s.implicits._
    val k = 64
    def sk(keys: Seq[Long]): Seq[String] =
      Sketches.kmvDistinct(keys.map(("g", _)).toDF("g", "key"),
          Seq("g"), "key", k)
        .select("kmins").head().getSeq[String](0)
    def ests(a: Seq[String], b: Seq[String], kk: Int = k) = {
      val r = Seq((a, b)).toDF("a", "b")
        .select(Sketches.kmvSetEstimates(col("a"), col("b"), kk).as("e"))
        .select("e.est_union", "e.est_intersect", "e.jaccard")
        .head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    // exact regime: A = 0..29, B = 20..49 -> union 50, intersect 10
    val (u1, i1, j1) = ests(sk(0L until 30L), sk(20L until 50L))
    assert(u1 == 50.0 && i1 == 10.0 && j1 == 10.0 / 50.0)
    // disjoint exact
    val (u2, i2, j2) = ests(sk(0L until 10L), sk(100L until 110L))
    assert(u2 == 20.0 && i2 == 0.0 && j2 == 0.0)
    // saturated regime: |A|=6000, |B|=6000, |A∩B|=2000
    val (u3, i3, j3) = ests(sk(0L until 6000L), sk(4000L until 10000L))
    val tol = 4.0 / math.sqrt(k - 2.0)
    info(s"union=$u3 intersect=$i3 jaccard=$j3 tol=$tol")
    assert(math.abs(u3 - 10000.0) / 10000.0 <= tol)
    assert(math.abs(i3 - 2000.0) / 2000.0 <= 3 * tol,
      "intersection compounds union + ratio noise; 3x tolerance")
    assert(j3 > 0.0 && j3 < 1.0)
    // an input longer than k proves a built-k mismatch and raises
    intercept[Exception] { ests(sk(0L until 6000L), sk(0L until 10L), 8) }
  }

  test("HLL: duplicate-insensitive, shard-merge ≡ whole, error within 4/sqrt(m)") {
    val s = spark
    import s.implicits._
    val df = (0L until 20000L).map(i => ("g", i % 6000)).toDF("g", "key")

    def regs(d: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      Sketches.hllBuild(d, Seq("g"), "key")
        .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap

    val whole = regs(df)
    // duplicate-insensitive: the distinct key set builds the identical
    // register table (register = max over per-key rhos)
    assert(regs(df.distinct()) == whole)
    assert(regs(df.repartition(13, col("key"))) == whole,
      "registers must not depend on partitioning")

    // shard sketches MERGE by per-bucket max to the whole-corpus table
    val shards = Sketches.hllBuild(df.where(col("key") % 2 === 0),
        Seq("g"), "key")
      .unionByName(Sketches.hllBuild(df.where(col("key") % 2 =!= 0),
        Seq("g"), "key"))
    val merged = shards.groupBy("g", "bucket")
      .agg(max(col("reg")).cast("int").as("reg"))
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(merged == whole, "max-merged shard registers must equal the whole")

    val est = Sketches.hllEstimate(
        Sketches.hllBuild(df, Seq("g"), "key"), Seq("g"))
      .select("est_hll").head().getDouble(0)
    val err = math.abs(est - 6000.0) / 6000.0
    info(s"m=${Sketches.HllM} est=$est err=$err")
    assert(err <= 4.0 * 1.04 / math.sqrt(Sketches.HllM.toDouble),
      s"HLL error $err beyond 4 sigma")
  }

  test("HLL: linear counting below 2.5m, exact indicator-sum fingerprint") {
    val s = spark
    import s.implicits._
    // 50 distinct keys: raw << 2.5m with zero registers → the
    // linear-counting branch must be the served estimate
    val df = (0L until 200L).map(i => ("g", i % 50)).toDF("g", "key")
    val row = Sketches.hllEstimate(
        Sketches.hllBuild(df, Seq("g"), "key"), Seq("g"))
      .select("n_buckets", "n_zero", "t_fingerprint", "est_raw", "est_hll")
      .head()
    val (nb, nz) = (row.getLong(0), row.getLong(1))
    assert(nb + nz == Sketches.HllM.toLong)
    val lin = Sketches.HllM *
      math.log(Sketches.HllM.toDouble / nz.toDouble)
    assert(row.getDouble(4) == lin, "small range must serve linear counting")
    assert(math.abs(lin - 50.0) / 50.0 < 0.2)
    // the fingerprint is the exact indicator sum: empty buckets
    // contribute 2^40 each, so it is bounded by m·2^40 and strictly
    // below it whenever any register is set
    assert(row.getLong(2) < Sketches.HllM.toLong * (1L << 40))
    assert(row.getLong(2) > nz * (1L << 40))
  }

  test("portable MinHash: union merges by per-seed min; estimate near truth") {
    val s = spark
    import s.implicits._
    // two sets with known Jaccard 50/150 = 1/3
    val a = (0 until 100).map(i => s"g$i")
    val b = (50 until 200).map(i => s"g$i")
    val df = Seq(("a", a), ("b", b), ("ab", (a ++ b).distinct))
      .toDF("id", "sh")
    val sigs = df.select(col("id"),
        Sketches.minhashPortable(col("sh"), 64).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // mergeability: sig(A ∪ B) = element-wise min of sig(A), sig(B)
    val merged = sigs("a").zip(sigs("b")).map { case (x, y) =>
      if (x <= y) x else y }
    assert(sigs("ab") == merged,
      "union signature must equal the per-seed min merge")
    // estimate: agreements/64 within 4σ of J = 1/3
    val agree = sigs("a").zip(sigs("b")).count { case (x, y) => x == y }
    val est = agree / 64.0
    val sigma = math.sqrt((1.0 / 3) * (2.0 / 3) / 64)
    assert(math.abs(est - 1.0 / 3) <= 4 * sigma,
      s"minhash estimate $est too far from 1/3")
    // identical sets agree everywhere
    val self = Sketches.minhashAgreement(col("sig"), col("sig"))
    val n = df.select(col("id"),
        Sketches.minhashPortable(col("sh"), 8).as("sig"))
      .select(self).head().getInt(0)
    assert(n == 8)
  }

  test("portable CMS: overcount-only, per-row mass conservation, partition-invariant") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(23)
    val rows = (0 until 3000).map(_ => rng.nextInt(80).toLong)
    val df = rows.toDF("k")
    val (w, d) = (16, 4)
    val sketch = Sketches.cmsBuild(df, "k", w, d)

    // every row of counters carries the full mass
    val perRow = sketch.groupBy("row").sum("cnt")
      .collect().map(r => r.getLong(1)).toSet
    assert(perRow == Set(rows.size.toLong))

    val exact = rows.groupBy(identity).map { case (k, xs) =>
      k -> xs.size.toLong }
    val est = Sketches.cmsEstimate(sketch, df, "k", w, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS undercounted $k: ${est(k)} < $n")
    }
    // with width >= distinct keys' spread, a wide sketch goes exact
    val wide = Sketches.cmsEstimate(
      Sketches.cmsBuild(df, "k", 4096, d), df, "k", 4096, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wide == exact, "wide CMS should be collision-free here")

    val repart = Sketches.cmsBuild(df.repartition(13, col("k")), "k", w, d)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val base = sketch
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(repart == base)
  }

  test("heavy hitters: no false negatives above phi*N; candidates " +
      "exact-verified; merged-shard sketch serves the same report") {
    val s = spark
    import s.implicits._
    // skewed stream: key 0 takes 30%, key 1 takes 12%, the rest of the
    // mass spreads over 60 cold keys
    val rng = new scala.util.Random(41)
    val rows = Seq.fill(900)(0L) ++ Seq.fill(360)(1L) ++
      (0 until 1740).map(_ => 2L + rng.nextInt(60))
    val df = rows.toDF("k")
    val (w, d, phi) = (16, 4, 0.1)
    val exact = rows.groupBy(identity).map { case (k, xs) =>
      k -> xs.size.toLong }
    val n = rows.size.toLong
    val thr = math.ceil(phi * n).toLong
    val trueHeavy = exact.filter(_._2 >= thr).keySet

    val rep = Sketches.heavyHitters(df, "k", phi, w, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // contract half 1: every truly-heavy key is reported heavy
    trueHeavy.foreach { k =>
      assert(rep.contains(k) && rep(k)._4 == 1L,
        s"false negative: $k has ${exact(k)} >= $thr but is not heavy")
    }
    // contract half 2: every candidate's exact count is exact, and
    // heavy agrees with the true threshold test
    rep.foreach { case (k, (total, est, ex, heavy)) =>
      assert(total == n && ex == exact(k) && est >= ex)
      assert((heavy == 1L) == (ex >= thr))
    }

    // merge ≡ whole: per-shard sketches sum per (row, bucket) into the
    // corpus sketch, and the served report is identical
    val (s1, s2) = (rows.take(1200), rows.drop(1200))
    val merged = Sketches.cmsBuild(s1.toDF("k"), "k", w, d)
      .unionByName(Sketches.cmsBuild(s2.toDF("k"), "k", w, d))
      .groupBy("row", "bucket").agg(sum(col("cnt")).as("cnt"))
    val repMerged = Sketches
      .heavyHittersFromSketch(merged, df, "k", phi, w, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(repMerged == rep)
  }

  test("heavy hitters: parameter guard") {
    val s = spark
    import s.implicits._
    val df = Seq(1L, 2L).toDF("k")
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(df, "k", phi = 0.0, 16, 4)
    }
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(df, "k", phi = 1.0, 16, 4)
    }
  }

  test("sketch shape metadata: mismatched serve parameters fail " +
      "loudly; the stamp survives parquet; unstamped legacy frames " +
      "still serve") {
    val s = spark
    import s.implicits._
    val df = (1L to 50L).toDF("k")

    // CMS: built at 32x4 — serving at any other shape must throw
    val cms = Sketches.cmsBuild(df, "k", 32, 4)
    intercept[IllegalArgumentException] {
      Sketches.cmsEstimate(cms, df, "k", 16, 4)
    }
    intercept[IllegalArgumentException] {
      Sketches.heavyHittersFromSketch(cms, df, "k", 0.1, 32, 5)
    }
    // the stamp rides the parquet footer schema
    val p = java.nio.file.Files.createTempDirectory("cms-shape")
      .toString + "/t"
    cms.write.parquet(p)
    val back = s.read.parquet(p)
    intercept[IllegalArgumentException] {
      Sketches.cmsEstimate(back, df, "k", 64, 4)
    }
    assert(Sketches.cmsEstimate(back, df, "k", 32, 4).count() == 50)
    // a legacy stamp-stripped frame serves unguarded (by design: the
    // check must not break pre-stamp artifacts)
    val legacy = back.select(col("row"), col("bucket"),
      (col("cnt") + lit(0L)).as("cnt"))
    Sketches.cmsEstimate(legacy, df, "k", 16, 4).count()

    // Bloom: both halves of the shape guarded
    val bloom = Sketches.bloomBuild(df, "k", 5, 1024)
    intercept[IllegalArgumentException] {
      Sketches.bloomMightContain(bloom, df, "k", 4, 1024)
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomMightContain(bloom, df, "k", 5, 2048)
    }
    assert(Sketches.bloomMightContain(bloom, df, "k", 5, 1024)
      .count() == 50)

    // KMV: the checked serve face rejects a foreign k
    val kmv = Sketches.kmvDistinct(df.withColumn("g", lit(1L)),
      Seq("g"), "k", k = 16)
    intercept[IllegalArgumentException] {
      Sketches.kmvEstimateFrom(kmv, "kmins", 32)
    }
    assert(kmv.select(Sketches.kmvEstimateFrom(kmv, "kmins", 16))
      .count() == 1)
  }

  test("heavy hitters: an empty sketch fails loudly instead of " +
      "flagging every key heavy at thr = 0") {
    val s = spark
    import s.implicits._
    val df = Seq(1L, 2L, 2L).toDF("k")
    val emptySketch = Sketches.cmsBuild(df.where(lit(false)), "k", 16, 4)
    val err = intercept[IllegalArgumentException] {
      Sketches.heavyHittersFromSketch(emptySketch, df, "k", 0.1, 16, 4)
    }
    assert(err.getMessage.contains("empty"))
  }

  test("count-min sketch overestimates only, within epsilon of total mass") {
    val eps = 0.001
    val cms = orders.stat.countMinSketch(col("o_orderpriority"),
      eps = eps, confidence = 0.99, seed = 42)
    val exact = orders.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, s"CMS underestimated $k: $est < $n")
      assert(est <= n + (eps * total).toLong + 1,
        s"CMS overestimate for $k beyond eps bound: $est vs $n")
    }
  }

  test("sampleQuantiles: estimates near truth, partition-invariant") {
    val s = spark
    import s.implicits._
    // values ARE 0..9999, so the true q-quantile is ~q*10000
    val df = (0L until 10000L).map(i => (i, i.toDouble)).toDF("id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.sampleQuantiles(d.withColumn("g", lit("all")),
          org.apache.spark.sql.functions.col("id"), "v", Seq("g"),
          "sq-spec", rate = 0.2, qs = Seq(0.25, 0.5, 0.95))
        .collect().map(r => (r.getDouble(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val got = run(df)
    assert(got.size == 3)
    // binomial sample size ~ 2000 ± a few sd
    val n = got.head._2
    assert(math.abs(n - 2000L) < 300, s"sample size $n")
    // sample quantile concentrates: |est - q*10000| within ~5 sd
    got.foreach { case (q, _, est) =>
      val sd = math.sqrt(q * (1 - q) / n) * 10000
      assert(math.abs(est - q * 10000) < 5 * sd + 10, s"q=$q est=$est")
    }
    // pure function of (salt, id): repartitioning changes nothing
    assert(run(df.repartition(13)) == got)
  }

  test("sampleQuantiles: rank-exact selection matches a JVM replay") {
    val s = spark
    import s.implicits._
    val df = (0L until 500L).map(i => (i, (i * 37 % 101).toDouble))
      .toDF("id", "v").withColumn("g", lit("x"))
    val got = Sketches.sampleQuantiles(df,
        org.apache.spark.sql.functions.col("id"), "v", Seq("g"),
        "sq-spec2", rate = 0.3, qs = Seq(0.5))
      .collect().map(r => (r.getLong(2), r.getDouble(3))).head
    // replay: same md5 gate, same (value, hash) order, same ceil rank
    val md = java.security.MessageDigest.getInstance("MD5")
    def hk(id: Long): String =
      md.digest(s"sq-spec2:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
    val thr = Splits.thresholdHex(0.3)
    val sample = (0L until 500L)
      .map(i => ((i * 37 % 101).toDouble, hk(i)))
      .filter(_._2 < thr).sortBy(identity)
    val want = sample(math.ceil(0.5 * sample.size).toInt - 1)._1
    assert(got == ((sample.size.toLong, want)))
  }

  test("sampleQuantiles: parameter guards") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1.0)).toDF("id", "v").withColumn("g", lit("x"))
    val id = org.apache.spark.sql.functions.col("id")
    intercept[IllegalArgumentException](
      Sketches.sampleQuantiles(df, id, "v", Seq.empty, "s", 0.2, Seq(0.5)))
    intercept[IllegalArgumentException](
      Sketches.sampleQuantiles(df, id, "v", Seq("g"), "s", 1.0, Seq(0.5)))
    intercept[IllegalArgumentException](
      Sketches.sampleQuantiles(df, id, "v", Seq("g"), "s", 0.2, Seq(1.5)))
  }
}
