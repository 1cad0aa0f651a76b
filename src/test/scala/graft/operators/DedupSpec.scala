package graft.operators

import graft.SparkTestBase
import graft.queries.Tables.t
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {

  private def docs = t(spark, sf(), "documents")

  test("exact dedup keeps one id per distinct text") {
    val out = Dedup.exact(docs, "text", "doc_id")
    val total = docs.count()
    assert(out.agg(sum("dup_count")).head.getLong(0) == total)
    assert(out.count() == docs.select("text").distinct().count())
  }

  test("exact shingle-jaccard join finds the planted near-dups symmetrically") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 2, theta = 0.5)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("sparse-corpus path (prefix filter) agrees with brute force") {
    val s = spark
    import s.implicits._
    // diverse vocabulary: per-doc unique words + a shared core — Σf² stays
    // far below n²/4, so jaccardPairs takes the PPJoin prefix-filter branch
    val docs2 = (0 until 120).map { i =>
      val shared = s"alpha$i beta$i gamma$i delta${i / 2} epsilon${i / 2}"
      (i.toLong, s"$shared word${i}a word${i}b word${i}c")
    }
    // plant exact near-dups
    val planted = Seq(
      (500L, "the quick brown fox jumps over the lazy dog tonight"),
      (501L, "the quick brown fox jumps over the lazy dog tonight"),
      (502L, "the quick brown fox jumps over the lazy cat tonight"))
    val df = (docs2 ++ planted).toDF("doc_id", "text")

    val fast = Dedup.jaccardPairs(df, "doc_id", "text", n = 2, theta = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    // brute-force oracle over all pairs
    val sets = Dedup.shingleSets(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) intersect sets(b)).size
      uni = (sets(a) union sets(b)).size
      j = if (uni == 0) 0.0 else inter.toDouble / uni
      if j >= 0.5
    } yield ((a, b), j)).toMap

    assert(fast.keySet == brute.keySet,
      s"missed=${brute.keySet -- fast.keySet} extra=${fast.keySet -- brute.keySet}")
    fast.foreach { case (k, j) => assert(math.abs(j - brute(k)) < 1e-12) }
    assert(fast.contains((500L, 501L)) && fast((500L, 501L)) == 1.0)
  }

  test("merge kernels agree with the set formula (fuzz) and hash bound holds") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      def set() = (0 until 1 + rnd.nextInt(40))
        .map(_ => s"w${rnd.nextInt(60)}").distinct
      (i.toLong, set(), set())
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.selectExpr(
      "id",
      "sorted_string_jaccard(sort_array(a), sort_array(b)) AS js",
      """sorted_long_jaccard(sort_array(transform(a, g -> xxhash64(g))),
         sort_array(transform(b, g -> xxhash64(g)))) AS jh""")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { case (id, a, b) =>
      val inter = (a.toSet intersect b.toSet).size
      val uni = (a.toSet union b.toSet).size
      val exact = if (uni == 0) 0.0 else inter.toDouble / uni
      val (js, jh) = out(id)
      assert(js == exact, s"string kernel $js != $exact for $id")
      // hash image is an upper bound (equal here absent 64-bit collisions)
      assert(jh >= exact - 1e-15, s"hash bound $jh < $exact for $id")
    }
    // NULL array elements are skipped, not NPE'd (SQL-surface hardening)
    val nullCase = df.limit(1).selectExpr(
      "sorted_string_jaccard(array(CAST(NULL AS STRING), 'a', 'b'), array('a', 'b')) AS js",
      "sorted_long_jaccard(array(CAST(NULL AS BIGINT), 1L, 2L), array(1L, 2L)) AS jh",
      "sorted_long_jaccard_ge(array(CAST(NULL AS BIGINT), 1L, 2L), array(1L, 2L), 0.9) AS ge")
      .head()
    assert(nullCase.getDouble(0) == 1.0 && nullCase.getDouble(1) == 1.0 &&
      nullCase.getBoolean(2))

    // early-exit GE decisions must equal the full-merge filter exactly
    for (theta <- Seq(0.3, 0.5, 0.6, 0.85)) {
      val cmp = df.selectExpr(
        s"""sorted_long_jaccard_ge(sort_array(transform(a, g -> xxhash64(g))),
            sort_array(transform(b, g -> xxhash64(g))), $theta) AS ge""",
        s"""sorted_long_jaccard(sort_array(transform(a, g -> xxhash64(g))),
            sort_array(transform(b, g -> xxhash64(g)))) >= $theta AS full""")
        .collect()
      cmp.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1),
        s"GE early-exit diverged from full merge at theta=$theta"))
    }
  }

  test("all three jaccard strategies agree with brute force on a dense corpus") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    // small vocab → dense regime; includes planted near-dups
    val vocab = Array.tabulate(40)(i => s"tok$i")
    val base = (0 until 300).map { i =>
      (i.toLong, Array.fill(8 + rnd.nextInt(10))(
        vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val planted = Seq((900L, base(5)._2), (901L, base(5)._2 + " extra"))
    val df = (base ++ planted).toDF("doc_id", "text")

    import Dedup.JaccardStrategy._
    def run(st: Dedup.JaccardStrategy) =
      Dedup.jaccardPairsBy(df, "doc_id",
        graft.functions.word_shingles(col("text"), 2), theta = 0.5,
        strategy = st)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    val sets = Dedup.shingleSets(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .filter(_._2.nonEmpty).toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) intersect sets(b)).size
      uni = (sets(a) union sets(b)).size
      j = if (uni == 0) 0.0 else inter.toDouble / uni
      if j >= 0.5
    } yield ((a, b), j)).toMap

    for (st <- Seq(Sparse, DenseMerge, DenseBitset)) {
      val got = run(st)
      assert(got.keySet == brute.keySet,
        s"$st: missed=${brute.keySet -- got.keySet} extra=${got.keySet -- brute.keySet}")
      got.foreach { case (k, j) => assert(math.abs(j - brute(k)) < 1e-12, s"$st $k") }
    }
  }

  test("jaccard on a corpus with zero shingles returns empty, not an error") {
    val s = spark
    import s.implicits._
    val tiny = Seq((1L, "ab"), (2L, "c"), (3L, "")).toDF("doc_id", "text")
    assert(Dedup.charJaccardPairs(tiny, "doc_id", "text", q = 4, theta = 0.5)
      .count() == 0)
    assert(Dedup.jaccardPairs(tiny, "doc_id", "text", n = 3, theta = 0.5)
      .count() == 0)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(empty, "doc_id", "text", n = 2, theta = 0.5)
      .count() == 0)
  }

  test("minhash LSH recall is total against exact jaccard at theta 0.5") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 2, 64, 4, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("simhash: near-dup docs land within small hamming distance") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 7)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // shingle simhash at hd<=7 should recover most jaccard>=0.9 pairs
    if (exact.nonEmpty) {
      val recall = (exact intersect sim).size.toDouble / exact.size
      info(s"simhash recall over ${exact.size} j>=0.9 pairs = $recall")
      assert(recall >= 0.5, s"simhash recall $recall over ${exact.size} pairs")
    }
    // and every emitted pair is within the distance bound by construction
    val dists = Dedup.simhashPairs(docs, "doc_id", "text", 7).select("hamming").collect()
    assert(dists.forall(_.getInt(0) <= 7))
  }

  test("identical text gives identical simhash (hamming 0)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "a completely different sentence here")).toDF("doc_id", "text")
    val out = Dedup.simhashPairs(df, "doc_id", "text", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 0)))
  }

  test("crossJaccardPairs equals the brute-force cross comparison") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Array.tabulate(60)(i => s"t$i")
    def mkDoc() = Seq.fill(12 + rnd.nextInt(8))(
      vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val corpus = (0 until 120).map(i => (i.toLong, mkDoc()))
    // refs: some verbatim corpus leaks, some perturbed, some clean
    val refs = (0 until 15).map { j =>
      val base = corpus(j * 7)._2
      val text = j % 3 match {
        case 0 => base                                      // exact leak
        case 1 => base.split(" ").drop(2).mkString(" ")     // near leak
        case _ => mkDoc()                                   // independent
      }
      (1000L + j, text)
    }
    val theta = 0.6
    val got = Dedup.crossJaccardPairs(
      corpus.toDF("doc_id", "text"), "doc_id",
      refs.toDF("doc_id", "text"), "doc_id",
      graft.functions.word_shingles(col("text"), 2), theta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    def sh(t: String) = t.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val expected = (for {
      (cid, ct) <- corpus
      (rid, rt) <- refs
      inter = (sh(ct) intersect sh(rt)).size
      j = inter.toDouble / (sh(ct).size + sh(rt).size - inter)
      if j >= theta
    } yield (cid, rid, j)).toSet
    assert(expected.nonEmpty, "fixture produced no leaks — strengthen it")
    assert(got == expected)
  }

  test("ngramOverlap: planted verbatim spans flagged with exact distinct-gram counts") {
    val s = spark
    import s.implicits._
    val span = (1 to 6).map(i => s"leakw$i").mkString(" ") // 6 words
    val evalDf = Seq(
      "the eval benchmark question text " + span,
      "another eval item entirely").toDF("text")
    val train = Seq(
      // shares the whole 6-word span -> 6-4+1 = 3 distinct 4-grams
      (1L, "completely different prefix " + span),
      // shares a 5-word suffix of the span -> 2 distinct 4-grams
      (2L, "short prefix " + span.split(" ").drop(1).mkString(" ")),
      // repeats the span twice -> still 3 DISTINCT shared grams
      (3L, s"$span and again $span"),
      // clean doc
      (4L, "no overlap with anything here at all"),
      // fewer than n words
      (5L, "tiny doc")).toDF("doc_id", "text")
    val out = Dedup.ngramOverlap(train, "doc_id", "text", evalDf, "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 3L -> 3L),
      s"wrong contamination accounting: $out")
    // the eval side must be the broadcast build side — the corpus-side
    // explode never shuffles into a sort-merge join
    val plan = Dedup.ngramOverlap(train, "doc_id", "text", evalDf, "text",
      n = 4).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval grams were not broadcast:\n$plan")
  }

  test("ngramOverlap Bpe mode catches contamination word grams MISS") {
    val s = spark
    import s.implicits._
    // a 4-WORD leaked span: zero word-13-grams exist inside it, but
    // each word BPE-encodes to 5 symbols (leakw1 -> le a k w 1), so
    // its 20-token sequence carries 20-12 = 8 interior BPE 13-grams
    val span = (1 to 4).map(i => s"leakw$i").mkString(" ")
    val evalDf = Seq("benchmark context before " + span).toDF("text")
    val train = Seq(
      (1L, "wholly unrelated preamble here " + span),
      (2L, "clean doc sharing nothing with the benchmark"))
      .toDF("doc_id", "text")
    // word mode: the span is < 13 words and the contexts differ ->
    // nothing to flag
    assert(Dedup.ngramOverlap(train, "doc_id", "text", evalDf, "text",
      n = 13).count() == 0)
    // token mode: the interior token grams match exactly
    val got = Dedup.ngramOverlap(train, "doc_id", "text", evalDf, "text",
        n = 13, gram = Dedup.GramMode.Bpe)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expected = the shared interior windows, computed independently
    // from the kernel's own token sequence for the span
    val spanToks = graft.functions.BpeKernel.encodeText(
      org.apache.spark.unsafe.types.UTF8String.fromString(span)).length
    assert(spanToks >= 13, s"span only $spanToks tokens")
    assert(got == Map(1L -> (spanToks - 12).toLong),
      s"token-mode contamination accounting: $got (span $spanToks toks)")
  }

  test("sharedSpans recovers planted verbatim spans maximally, incl. the one-word-edit shape") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "p1 p2 A B C D E F x y"),
      (2L, "q1 A B C D E F z"),
      // the near-dup shape: one word changed mid-document
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (4L, "w1 w2 w3 XX w5 w6 w7 w8"),
      (5L, "nothing shared here at all")).toDF("doc_id", "text")
    val out = Dedup.sharedSpans(docs, "doc_id", "text", minLen = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4))).toSet
    val expected = Set(
      (1L, 2L, 2, 1, 6L),  // "A B C D E F" — ONE maximal span, not splits
      (3L, 4L, 0, 0, 3L),  // "w1 w2 w3" before the edit
      (3L, 4L, 4, 4, 4L))  // "w5 w6 w7 w8" after it
    assert(out == expected, s"got $out")
  }

  test("dropRepeatedUnits drops exactly the corpus-hot units; anti-join broadcasts") {
    val s = spark
    import s.implicits._
    // the boilerplate unit "COOKIE BANNER" appears in 3 docs (df=3);
    // "SHARED FOOTER" in 2; unique lines once each
    val units = Seq(
      (1L, 0L, "COOKIE BANNER"), (1L, 1L, "unique line one"),
      (2L, 0L, "COOKIE BANNER"), (2L, 1L, "SHARED FOOTER"),
      (3L, 0L, "COOKIE BANNER"), (3L, 1L, "SHARED FOOTER"),
      (3L, 2L, "unique line two"),
      // df counts DISTINCT docs: a unit twice in ONE doc is not hot
      (4L, 0L, "repeated within"), (4L, 1L, "repeated within")
    ).toDF("doc_id", "pos", "unit")
    def kept(maxDf: Long) =
      Dedup.dropRepeatedUnits(units, "doc_id", "unit", maxDf)
        .select(col("doc_id"), col("pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept(1L) == Set((1L, 1L), (3L, 2L), (4L, 0L), (4L, 1L)),
      s"df>1 must drop banner+footer everywhere: ${kept(1L)}")
    assert(kept(2L) == Set((1L, 1L), (2L, 1L), (3L, 1L), (3L, 2L),
      (4L, 0L), (4L, 1L)), "df>2 must keep the footer")
    // the hot set is broadcast, the unit text never shuffles
    val plan = Dedup.dropRepeatedUnits(units, "doc_id", "unit", 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"hot units were not broadcast:\n$plan")
  }

  test("removeSharedSpans cuts exactly the doc_b occurrences, min-id canonical") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "p1 p2 A B C D E F x y"),   // canonical copy of "A B C D E F"
      (2L, "q1 A B C D E F z"),        // doc_b: tokens 1..6 cut
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8"), // canonical of both fragments
      (4L, "w1 w2 w3 XX w5 w6 w7 w8"), // doc_b: [0,3) and [4,8) cut
      (5L, "nothing shared here at all")).toDF("doc_id", "text")
    val out = Dedup.removeSharedSpans(docs, "doc_id", "text", minLen = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      1L -> ("p1 p2 A B C D E F x y", 0L),
      2L -> ("q1 z", 6L),
      3L -> ("w1 w2 w3 w4 w5 w6 w7 w8", 0L),
      4L -> ("XX", 7L),
      5L -> ("nothing shared here at all", 0L)), s"got $out")
    // re-running detection on the cleaned corpus finds nothing: the
    // removal is a fixpoint for this corpus (canonical copies remain,
    // duplicates are gone)
    val again = Dedup.sharedSpans(
      Dedup.removeSharedSpans(docs, "doc_id", "text", minLen = 3)
        .select(col("doc_id"), col("text_clean").as("text")),
      "doc_id", "text", minLen = 3)
    assert(again.count() == 0, "cleaned corpus still reports shared spans")
  }

  test("removeSharedSpans maps NULL text to ('', 0), not (NULL, NULL)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c d"), (2L, null: String), (3L, "   "))
      .toDF("doc_id", "text")
    val out = Dedup.removeSharedSpans(docs, "doc_id", "text", minLen = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out == Map(1L -> ("a b c d", 0L), 2L -> ("", 0L),
      3L -> ("", 0L)), s"got $out")
  }

  test("hot anti-join falls back to a shuffled join when broadcast is off") {
    val s = spark
    import s.implicits._
    val units = Seq((1L, 0L, "X"), (2L, 0L, "X"), (1L, 1L, "y1"),
      (2L, 1L, "y2")).toDF("doc_id", "pos", "unit")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = s.conf.get(key)
    try {
      s.conf.set(key, "-1")
      val out = Dedup.dropRepeatedUnits(units, "doc_id", "unit", 1L)
      // semantics unchanged on the fallback path…
      assert(out.select(col("doc_id"), col("pos")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 1L), (2L, 1L)))
      // …and no mandatory broadcast hint was planted
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"guard must not force a broadcast with the threshold off:\n$plan")
    } finally s.conf.set(key, prev)
  }

  test("sharedSpans maxGramOcc drops exactly the hot-gram seeds (recall contract)") {
    val s = spark
    import s.implicits._
    // boilerplate "H1 H2 H3 H4" shared by ALL docs (its two interior
    // 3-grams "H1 H2 H3" / "H2 H3 H4" occur 6x corpus-wide — once per
    // doc); docs 1/2 additionally share a non-hot span "A B C D E"
    // (each of its 3-grams, and the header/tail straddlers, occurs
    // exactly twice corpus-wide)
    val docs = (1L to 6L).map { i =>
      val tail = if (i <= 2) "A B C D E" else s"u${i}a u${i}b u${i}c u${i}d u${i}e"
      (i, s"H1 H2 H3 H4 $tail")
    }.toDF("doc_id", "text")
    def run(ceiling: Long) =
      Dedup.sharedSpans(docs, "doc_id", "text", minLen = 3, ceiling)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
          r.getLong(4))).toSet
    // ceiling 5 < 6: both hot header grams dropped. The (1,2) pair's
    // maximal span "H1 H2 H3 H4 A B C D E" loses its hot seeds at
    // positions 0-1; seeds at 2..6 survive (header/tail straddlers
    // "H3 H4 A", "H4 A B" occur twice, not hot), so the reported
    // fragment starts at the first surviving seed: (2, 2, 5+3-1 = 7).
    val ceilinged = run(ceiling = 5L)
    assert(ceilinged == Set((1L, 2L, 2, 2, 7L)),
      s"ceilinged output wrong: $ceilinged")
    // the contract's reference formulation: un-ceilinged operator on the
    // corpus behaves as if hot-gram seeds never existed — verified by
    // comparing against ceiling = MaxValue restricted to non-hot seeds:
    // every other doc pair (header-only overlap) must vanish entirely
    val full = run(Long.MaxValue)
    assert(full.size > ceilinged.size &&
      full.exists { case (a, b, _, _, _) => a == 3L || b == 3L },
      s"un-ceilinged run must keep the header-only pairs: $full")
    // a ceiling above every gram count is the identity
    assert(run(1000L) == full, "high ceiling must be a no-op")
  }

  test("sharedSpans matches a diagonal-run reimplementation on randomized corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(77)
    val vocab = Array.tabulate(12)(i => s"v$i") // small vocab → real collisions
    def ref(a: Seq[String], b: Seq[String], L: Int): Set[(Int, Int, Long)] = {
      // independent formulation: per diagonal, run-lengths of matching
      // tokens; report (start_a, start_b, len) for every maximal run of
      // seed matches, len = run + L - 1 over seeds (NOT raw tokens —
      // the operator's contract is L-gram seed runs)
      val seeds = for {
        i <- a.indices if i + L <= a.length
        j <- b.indices if j + L <= b.length
        if a.slice(i, i + L) == b.slice(j, j + L)
      } yield (i, j)
      seeds.groupBy { case (i, j) => i - j }.flatMap { case (_, ss) =>
        // consecutive seeds share (pos_a - rank): each group is one
        // maximal run
        ss.sortBy(_._1).zipWithIndex
          .groupBy { case ((i, _), idx) => i - idx }
          .values.map { run =>
            val (i0, j0) = run.head._1
            (i0, j0, (run.length + L - 1).toLong)
          }
      }.toSet
    }
    (1 to 6).foreach { trial =>
      val L = 2 + rnd.nextInt(2)
      val docs = (1 to 10).map(i =>
        (i.toLong, Seq.fill(4 + rnd.nextInt(10))(
          vocab(rnd.nextInt(vocab.length))).mkString(" ")))
      val got = Dedup.sharedSpans(docs.toDF("doc_id", "text"), "doc_id",
          "text", minLen = L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getInt(2), r.getInt(3), r.getLong(4)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      for {
        (ia, ta) <- toks; (ib, tb) <- toks if ia < ib
      } {
        val expect = ref(ta, tb, L)
        val actual = got.getOrElse((ia, ib), Set.empty)
        assert(actual == expect,
          s"trial $trial L=$L docs ($ia, $ib): $actual vs $expect")
      }
    }
  }

  test("ngramOverlap matches brute-force set intersection on randomized corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1234)
    val vocab = Array.tabulate(30)(i => s"v$i")
    def doc(len: Int): String =
      Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    def grams(text: String, n: Int): Set[String] = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) Set.empty
      else toks.sliding(n).map(_.mkString(" ")).toSet
    }
    (1 to 8).foreach { trial =>
      val n = 2 + rnd.nextInt(3) // 2..4
      val train = (1 to 40).map(i => (i.toLong, doc(3 + rnd.nextInt(15))))
      val evalDocs = (1 to 6).map(_ => doc(3 + rnd.nextInt(10)))
      val evalGrams = evalDocs.flatMap(grams(_, n)).toSet
      val expected = train
        .map { case (id, t) => id -> (grams(t, n) & evalGrams).size.toLong }
        .filter(_._2 > 0).toMap
      val got = Dedup.ngramOverlap(
          train.toDF("doc_id", "text"), "doc_id", "text",
          evalDocs.map(Tuple1(_)).toDF("text"), "text", n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial (n=$n): $got vs $expected")
    }
  }

  test("bloomAntiJoin == plain anti-join exactly; the bloom prunes the verify input") {
    val ref = docs.where(col("doc_id") % 7 === 0)
    val got = Dedup.bloomAntiJoin(docs, ref, col("text"),
        expectedItems = 1000L, fpp = 0.01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = docs.join(ref.select(col("text")).distinct(), Seq("text"),
        "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == plain)
    assert(got.nonEmpty && got.size < docs.count(),
      "fixture must drop some rows and keep some")
    // the pruning claim: rows that reach the verify join (bloom
    // might-contain) are ≈ true hits + fpp of the rest, nowhere near the
    // full corpus — i.e. the bloom actually prunes the join input
    val total = docs.count()
    val hits = total - got.size
    val suspects = docs.where(Dedup.bloomMightContain(ref, col("text"),
      expectedItems = 1000L, fpp = 0.01)).count()
    assert(suspects >= hits, "bloom must have no false negatives")
    assert(suspects < total * 0.5,
      s"bloom pruned nothing: $suspects suspects of $total rows")
  }

  test("bloomAntiJoin at high fpp still returns the exact result") {
    // fpp 0.5 floods the verify join with false positives — semantics
    // must not move (the bloom is cost-shaping only)
    val ref = docs.where(col("doc_id") % 3 === 0)
    val got = Dedup.bloomAntiJoin(docs, ref, col("text"),
        expectedItems = 10L, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = docs.join(ref.select(col("text")).distinct(), Seq("text"),
        "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == plain)
  }

  test("sorted_long_jaccard_ge rejects non-finite / out-of-range theta at analysis") {
    // theta is interpolated into generated Java — NaN must fail cleanly,
    // not produce uncompilable codegen. SQL literals can't spell NaN, so
    // exercise it through the expression API; out-of-range via SQL.
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_long_jaccard_ge(array(1L), array(1L), 1.5)").collect()
    }
    assert(e1.getMessage.contains("finite theta"), e1.getMessage)
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity, -0.1)) {
      val col = org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.SortedLongJaccardGE(
          org.apache.spark.sql.graft.ColumnBridge.expression(
            org.apache.spark.sql.functions.array(
              org.apache.spark.sql.functions.lit(1L))),
          org.apache.spark.sql.graft.ColumnBridge.expression(
            org.apache.spark.sql.functions.array(
              org.apache.spark.sql.functions.lit(1L))),
          bad))
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.range(1).select(col).collect()
      }
      assert(e.getMessage.contains("finite theta"), s"theta=$bad: ${e.getMessage}")
    }
    // boundary values still work
    val ok = spark.sql(
      "SELECT sorted_long_jaccard_ge(array(1L), array(1L), 1.0) AS hi, " +
        "sorted_long_jaccard_ge(array(1L), array(2L), 0.0) AS lo").head()
    assert(ok.getBoolean(0) && ok.getBoolean(1))
  }

  test("re-entering jaccardPairsBy releases the previous cached sets") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "aa bb cc dd"), (2L, "aa bb cc ee"), (3L, "zz yy xx ww"))
      .toDF("doc_id", "text")
    Dedup.jaccardPairs(df, "doc_id", "text", 2, 0.5).count()
    val after1 = graft.ManagedCache.size
    Dedup.jaccardPairs(df, "doc_id", "text", 2, 0.5).count()
    // the slot swapped, not stacked: still one held frame for this call site
    assert(graft.ManagedCache.size == after1)
  }

  test("keepBestPerCluster keeps exactly the best-ranked doc per cluster") {
    val s = spark
    import s.implicits._
    // cluster {1,2,3}: 3 is longest; singleton 10; cluster {20,21}: tie on
    // words, doc 20 wins the lowest-id tiebreak
    val df = Seq(
      (1L, "aa bb cc dd ee", 5L),
      (2L, "aa bb cc dd ff", 5L),
      (3L, "aa bb cc dd ee gg hh", 7L),
      (10L, "zz yy xx ww vv", 5L),
      (20L, "mm nn oo pp qq", 5L),
      (21L, "mm nn oo pp rr", 5L)).toDF("doc_id", "text", "n_words")
    val pairs = Seq((1L, 2L), (2L, 3L), (20L, 21L)).toDF("doc_a", "doc_b")
    val out = Dedup.keepBestPerCluster(df, "doc_id", pairs,
      Seq(col("n_words"), -col("doc_id")))
      .select("doc_id", "component", "cluster_size", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((1L, 3L, 0L)) && out(2L) == ((1L, 3L, 0L)))
    assert(out(3L) == ((1L, 3L, 1L)), "longest doc wins the cluster")
    assert(out(10L) == ((10L, 1L, 1L)), "singleton keeps itself")
    assert(out(20L) == ((20L, 2L, 1L)) && out(21L) == ((20L, 2L, 0L)),
      "word-count tie falls to the lowest id")
    // exactly one survivor per component
    val perComp = out.values.groupBy(_._1).map { case (_, vs) => vs.map(_._3).sum }
    assert(perComp.forall(_ == 1L))
  }

  test("keepBestPerCluster rejects output-column collisions") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2L)).toDF("doc_id", "keep")
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.keepBestPerCluster(df, "doc_id", pairs, Seq(col("doc_id")))
    }
    assert(e.getMessage.contains("keep"))
  }

  test("containmentPairs: a quoted short doc scores 1.0 where Jaccard fails") {
    val s = spark
    import s.implicits._
    val quote = "the quick brown fox jumps over the lazy dog"
    val article = s"intro words here $quote and then a very long tail " +
      "of completely different content stretching on and on with many " +
      "more unique tokens than the quote itself contains overall today"
    val df = Seq((1L, quote), (2L, article),
      (3L, "unrelated text about sailing ships and harbors at dawn"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", n = 3,
        theta = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 2L)
    assert(got.head._3 == 1.0, s"containment ${got.head._3}")
    // the same pair is INVISIBLE to symmetric Jaccard at any useful θ
    val jac = Dedup.jaccardPairs(df, "doc_id", "text", n = 3,
      theta = 0.5).collect()
    assert(jac.isEmpty)
  }

  test("containment dedup composite: the quoted doc loses to its quoting original") {
    val s = spark
    import s.implicits._
    val quote = "the quick brown fox jumps over the lazy dog"
    val article = s"intro words here $quote and then a very long tail " +
      "of completely different content stretching on and on with many " +
      "more unique tokens than the quote itself contains overall today"
    val docs = Seq((1L, quote), (2L, article),
      (3L, "unrelated text about sailing ships and harbors at dawn"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
      theta = 0.8)
    val withQ = docs
      .select(col("doc_id"), col("text"),
        graft.functions.TextFunctions.qualityMetrics(col("text")).as("m"))
      .select(col("doc_id"), col("text"), col("m.n_words").as("n_words"),
        col("m.punct_ratio").as("punct_ratio"))
    val got = Dedup.keepBestPerCluster(withQ, "doc_id", pairs,
        Seq(col("n_words"), -col("punct_ratio"), -col("doc_id")),
        aCol = "doc_small", bCol = "doc_big")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("component"), r.getAs[Long]("cluster_size"),
          r.getAs[Long]("keep")))).toMap
    // the quote and the article form one cluster; the LONGER quoting
    // original (more words) is the canonical survivor, the quoted doc
    // is dropped — the asymmetric criterion made actionable
    assert(got(1L)._1 == got(2L)._1 && got(1L)._2 == 2L)
    assert(got(2L)._3 == 1L && got(1L)._3 == 0L, got.toString)
    assert(got(3L) == ((3L, 1L, 1L)), got.toString)
  }

  test("domain dup-rate shape: pair members count once, clean domains rate 0") {
    val s = spark
    import s.implicits._
    // spam.com: docs 1,2,3 where 1-2 are near-dups; clean.org: 4,5
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val docs2 = Seq(
      (1L, "spam.com", dup), (2L, "spam.com", dup + " iota"),
      (3L, "spam.com", "totally different words here nothing shared"),
      (4L, "clean.org", "first unique document about rivers and stone"),
      (5L, "clean.org", "second unique document about clouds and wind"))
      .toDF("doc_id", "domain", "text")
    val pairs = Dedup.jaccardPairs(docs2, "doc_id", "text", n = 2,
      theta = 0.5)
    val dupDocs = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct().withColumn("__dup", lit(1L))
    val got = docs2.select(col("doc_id"), col("domain"))
      .join(dupDocs, Seq("doc_id"), "left")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("__dup")), lit(0L)).as("n_dup"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("spam.com" -> ((3L, 2L)),
      "clean.org" -> ((2L, 0L))), got.toString)
  }

  test("crossContainment: a benchmark question quoted whole inside a page") {
    val s = spark
    import s.implicits._
    val question = "what is the boiling point of water at sea level"
    val page = s"crawled page preamble content $question and then a long " +
      "tail of unrelated site navigation text footer links copyright " +
      "notices and much more filler stretching far beyond the question"
    val evalDf = Seq((100L, question),
      (101L, "unrelated benchmark item about astronomy facts"))
      .toDF("eval_doc", "text")
    val train = Seq((1L, page),
      (2L, "a clean page about cooking pasta recipes entirely"))
      .toDF("doc_id", "text")
    val got = Dedup.crossContainment(train, "doc_id", "text",
        evalDf, "eval_doc", "text", n = 3, theta = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 100L)
    assert(got.head._3 == 1.0, s"containment ${got.head._3}")
    // the same leak is INVISIBLE to symmetric cross-Jaccard
    val jac = Dedup.crossJaccardPairs(train, "doc_id",
      evalDf.withColumnRenamed("eval_doc", "doc_id"), "doc_id",
      graft.functions.word_shingles(col("text"), 3), theta = 0.5)
    assert(jac.collect().isEmpty)
    // the eval side is the broadcast build side
    val plan = Dedup.crossContainment(train, "doc_id", "text", evalDf,
      "eval_doc", "text", n = 3, theta = 0.9)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("containmentPairs: prefix filter is lossless vs brute force") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val vocab = Vector("red", "blue", "fox", "dog", "ship", "tree",
      "rock", "wind", "rain", "leaf")
    val docs = (1L to 40L).map { i =>
      val len = 5 + rng.nextInt(20)
      (i, Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    // brute force over the same distinct-shingle sets
    def shingles(t: String): Set[String] =
      t.split("\\s+").sliding(2).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, t) => id -> shingles(t) }
    // θ = 0.3 exercises the IEEE boundary ((1−0.3)·sz floors one unit
    // below the exact rational bound) the +2 prefix margin covers
    for (theta <- Seq(0.6, 0.3)) {
      val got = Dedup.containmentPairs(df, "doc_id", "text", n = 2,
          theta = theta)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if sa.size < sb.size || (sa.size == sb.size && ia < ib)
        shared = (sa & sb).size
        if shared.toDouble / sa.size >= theta
      } yield (ia, ib, shared.toLong)).toSet
      assert(got == want,
        s"theta=$theta: got ${got.size} vs brute ${want.size}")
    }
  }

  test("crossCosinePairs: a word-order-scrambled paraphrase shares ZERO " +
      "13-grams (ngramOverlap provably blind) but cosine-flags at 1.0") {
    val s = spark
    import s.implicits._
    val src = "large scale training data pipelines must remove benchmark " +
      "contamination before release because memorized eval answers " +
      "inflate reported model quality and corrupt every comparison"
    // the c28 plant: sort the tokens — every word survives (bag
    // unchanged), no 13-gram does
    val para = src.split(" ").sorted.mkString(" ")
    assert(para != src && src.split(" ").length >= 13)
    val train = Seq((1L, src),
      (2L, "a completely different document about cooking pasta with " +
        "tomatoes garlic basil and olive oil on a sunday afternoon"))
      .toDF("id", "text")
    val evalDf = Seq((100L, para)).toDF("id", "text")
    // the token-overlap family is blind: zero shared word-13-grams
    val ng = Dedup.ngramOverlap(
      train.withColumnRenamed("id", "doc_id"), "doc_id", "text",
      evalDf, "text", n = 13)
    assert(ng.collect().isEmpty, "13-gram decontam must miss a scramble")
    // one shared TF-IDF fit over the union, then the cross-corpus cosine
    val w = TextSearch.hashingTfIdf(
      TextSearch.postings(train.unionByName(evalDf), "id", "text"),
      dim = 64)
    val got = Dedup.crossCosinePairs(
        w.where(col("doc") < 100L), w.where(col("doc") >= 100L),
        theta = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 100L,
      s"expected exactly the (src, paraphrase) pair: ${got.toSeq}")
    assert(got.head._3 == 1.0, s"identical bag must cosine at 1.0: " +
      s"${got.head._3}")
    // the eval side is the broadcast build side
    val plan = Dedup.crossCosinePairs(w.where(col("doc") < 100L),
        w.where(col("doc") >= 100L), theta = 0.75)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("crossCosinePairs hot-bucket valve: valved output equals the " +
      "exact operator over postings with hot buckets deleted; flags " +
      "are a monotone subset; the default ceiling is inert") {
    val s = spark
    import s.implicits._
    // hand-built unit vectors (doc, bucket, weight). Bucket 0 is
    // corpus-hot (every train doc posts it); bucket 10 is rare signal.
    // Train docs 1..4, eval docs 100..102, θ = 0.75:
    //  - (1, 100): rare-bucket mass dominates (w10 = √.96) — the pair
    //    survives the valve on its non-hot term alone
    //  - (2, 101): share ONLY hot 0 at weight 1.0 each (cosine 1.0
    //    unvalved) — ALL shared buckets hot ⇒ invisible under valve
    //  - (3, 102): identical (hot-heavy) vectors, cosine 1.0 unvalved;
    //    the rare term alone is 0.19 < θ — the monotone loss case
    val h = math.sqrt(0.96)
    val r19 = math.sqrt(0.19)
    val tri = Seq(
      (1L, 0L, 0.2), (1L, 10L, h),
      (2L, 0L, 1.0),
      (3L, 0L, 0.9), (3L, 10L, r19),
      (4L, 0L, math.sqrt(0.5)), (4L, 12L, math.sqrt(0.5)),
      (100L, 0L, 0.2), (100L, 10L, h),
      (101L, 0L, 1.0),
      (102L, 0L, 0.9), (102L, 10L, r19)).toDF("doc", "bucket", "weight")
    val train = tri.where(col("doc") < 100L)
    val evalW = tri.where(col("doc") >= 100L)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unvalved = pairs(Dedup.crossCosinePairs(train, evalW, 0.75,
      maxBucketOcc = Long.MaxValue))
    // occupancy of bucket 0 on the train side is 4 > ceiling 3
    val valved = pairs(Dedup.crossCosinePairs(train, evalW, 0.75,
      maxBucketOcc = 3))
    assert(unvalved == Set((1L, 100L), (2L, 101L), (2L, 102L),
      (3L, 101L), (3L, 102L)), unvalved)
    // the recall contract, literally: valved ≡ exact over the postings
    // with hot buckets deleted
    val deleted = pairs(Dedup.crossCosinePairs(
      train.where(col("bucket") =!= 0L), evalW.where(col("bucket") =!= 0L),
      0.75, maxBucketOcc = Long.MaxValue))
    assert(valved == deleted, s"valved $valved != hot-deleted $deleted")
    assert(valved == Set((1L, 100L)), valved)
    assert(valved.subsetOf(unvalved), "the valve may only LOSE flags")
    // default ceiling (2^16) cannot fire on any gate-sized corpus
    val dflt = pairs(Dedup.crossCosinePairs(train, evalW, 0.75))
    assert(dflt == unvalved, "the default ceiling must be inert here")
    intercept[IllegalArgumentException] {
      Dedup.crossCosinePairs(train, evalW, 0.75, maxBucketOcc = 0)
    }
  }

  test("crossCosinePairsLsh: precision exact (approx ⊆ exact pairs), " +
      "identical-bag paraphrases caught surely, recall ≥ 0.7 on the " +
      "gate corpus") {
    val s = spark
    val dir = sf()
    val w = graft.ManagedCache.swap("DedupSpec.c30w",
      TextSearch.hashingTfIdf(TextSearch.postings(
        graft.queries.CurationQueries.semanticUnion(spark, dir),
        "id", "text"), dim = 256))
    val isEval = col("doc") >= 10000000L || col("doc") % 20 === 0
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("train_doc", "eval_doc").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.crossCosinePairs(
      w.where(!isEval), w.where(isEval), theta = 0.9))
    val approx = pairSet(Dedup.crossCosinePairsLsh(
      w.where(!isEval), w.where(isEval), theta = 0.9, dim = 256))
    assert(approx.subsetOf(exact),
      s"banding must never invent a pair: ${(approx -- exact).take(5)}")
    assert(exact.nonEmpty && approx.size >= math.ceil(0.7 * exact.size),
      s"recall ${approx.size}/${exact.size} under the 0.7 floor")
    // every planted (doc, doc+10M) scramble pair has cosine exactly 1.0
    // — identical vectors share every signature, so banding cannot
    // miss one
    val planted = exact.filter { case (t, e) => e == t + 10000000L }
    assert(planted.nonEmpty && planted.subsetOf(approx),
      s"missed planted pairs: ${(planted -- approx).take(5)}")
    // a dim smaller than the fit's raises instead of silently zeroing
    // the out-of-range coordinates (and verifying wrong cosines)
    val e = intercept[Exception] {
      Dedup.crossCosinePairsLsh(
        w.where(!isEval), w.where(isEval), theta = 0.9, dim = 64)
        .collect()
    }
    assert(e.getMessage.contains("dim must match"))
  }

  test("crossCosineAuto: dispatches on the declared broadcast budget — " +
      "exact branch ≡ crossCosinePairs, banded branch ≡ " +
      "crossCosinePairsLsh; the decision rule is the declared bytes") {
    val s = spark
    val w = graft.ManagedCache.swap("DedupSpec.c30w",
      TextSearch.hashingTfIdf(TextSearch.postings(
        graft.queries.CurationQueries.semanticUnion(spark, sf()),
        "id", "text"), dim = 256))
    val isEval = col("doc") >= 10000000L || col("doc") % 20 === 0
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("train_doc", "eval_doc", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = s.conf.get(key)
    try {
      // a generous budget → the exact broadcast bucket join
      s.conf.set(key, (64L << 20).toString)
      assert(rows(Dedup.crossCosineAuto(w.where(!isEval), w.where(isEval),
          theta = 0.9, dim = 256)) ==
        rows(Dedup.crossCosinePairs(w.where(!isEval), w.where(isEval),
          theta = 0.9)))
      // a starved budget → the banded signature path
      s.conf.set(key, "1")
      assert(rows(Dedup.crossCosineAuto(w.where(!isEval), w.where(isEval),
          theta = 0.9, dim = 256)) ==
        rows(Dedup.crossCosinePairsLsh(w.where(!isEval), w.where(isEval),
          theta = 0.9, dim = 256)))
    } finally s.conf.set(key, saved)
    // the rule itself (the knnJoinBroadcastFits discipline): declared
    // bytes = triples × 40, disabled threshold always banded
    assert(Dedup.crossCosineBroadcastFits(100L, 4000L))
    assert(!Dedup.crossCosineBroadcastFits(100L, 3999L))
    assert(!Dedup.crossCosineBroadcastFits(1L, -1L))
  }

  private def editPairsOf(rows: Seq[(Long, String)], d: Int,
      valve: Long = Long.MaxValue): Set[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    Dedup.editPairs(rows.toDF("id", "name"), "id", "name", d, valve)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .toSet
  }

  test("editPairs: substitutions, inserts, deletes at d=1; transposition " +
      "costs 2 (plain Levenshtein); empty strings safe") {
    val rows = Seq((1L, "analyst"), (2L, "analist"),  // substitution
      (3L, "analysts"),                                // insert vs 1
      (4L, "anlyst"),                                  // delete vs 1
      (5L, "naalyst"),                                 // transposition: d=2
      (6L, ""), (7L, "a"))                             // empty + 1-char
    assert(editPairsOf(rows, 1) == Set((1L, 2L, 1L), (1L, 3L, 1L),
      (1L, 4L, 1L), (6L, 7L, 1L)))
    val d2 = editPairsOf(rows, 2)
    assert(d2.contains((1L, 5L, 2L)), "transposition must surface at d=2")
    assert(d2.contains((2L, 4L, 2L)) && d2.contains((3L, 4L, 2L)))
  }

  test("editPairs: blocking is lossless against brute force on random " +
      "short keys (d=1 and d=2); the hot-variant valve only ever drops") {
    val rnd = new scala.util.Random(16)
    val alphabet = "abcd"
    (1 to 2).foreach { trial =>
      val rows = (1L to 60L).map(i =>
        i -> (0 until (3 + rnd.nextInt(4)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      def lev(a: String, b: String): Int = {
        val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
            dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        dp(a.length)(b.length)
      }
      Seq(1, 2).foreach { d =>
        val brute = (for {
          (ia, sa) <- rows; (ib, sb) <- rows
          if ia < ib && lev(sa, sb) <= d
        } yield (ia, ib, lev(sa, sb).toLong)).toSet
        assert(editPairsOf(rows, d) == brute, s"trial $trial d=$d")
      }
      // the valve drops, never invents: results ⊆ unvalved
      val all = editPairsOf(rows, 1)
      assert(editPairsOf(rows, 1, valve = 3L).subsetOf(all))
    }
  }

  test("editPairs: guards") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      Dedup.editPairs(df, "id", "name", 3)
    }
    intercept[IllegalArgumentException] {
      Dedup.editPairs(df, "id", "name", 1, maxVariantOcc = 1L)
    }
  }
}
