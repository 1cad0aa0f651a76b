package graft.operators

import graft.SparkTestBase

class TextSearchSpec extends SparkTestBase with graft.PropHelper {

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a quick tour of the data engine and its query planner"),
    (3L, "dogs and foxes: a field guide"),
    (4L, "THE QUICK, QUICK results page"),
    (5L, "completely unrelated text about sailing ships"),
    (6L, ""))

  /** Independent reference BM25 (plain Scala, same tokenizer contract). */
  private def referenceBm25(query: String, k1: Double = 1.2,
      b: Double = 0.75): Map[Long, Double] = {
    def toks(s: String): Seq[String] = s.toLowerCase
      .replaceAll("[\\p{Punct}]", " ").trim.split("\\s+").toSeq
      .filter(_.nonEmpty)
    val docToks = corpus.map { case (id, t) => id -> toks(t) }
      .filter(_._2.nonEmpty).toMap
    val n = docToks.size
    val avgLen = docToks.values.map(_.size).sum.toDouble / n
    val qTerms = toks(query).distinct
    docToks.flatMap { case (id, ts) =>
      val score = qTerms.map { term =>
        val tf = ts.count(_ == term).toDouble
        if (tf == 0) 0.0
        else {
          val df = docToks.values.count(_.contains(term)).toDouble
          val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
          idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * ts.size / avgLen))
        }
      }.sum
      if (score > 0) Some(id -> score) else None
    }
  }

  test("bm25TopK matches an independent reference implementation") {
    val s = spark
    import s.implicits._
    val df = corpus.toDF("doc_id", "text")
    for (query <- Seq("quick fox", "the dog", "Query PLANNER!", "sailing")) {
      val got = TextSearch.bm25TopK(df, "doc_id", "text", query, k = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expected = referenceBm25(query)
      assert(got.keySet == expected.keySet, s"query '$query' docs")
      got.foreach { case (id, sc) =>
        assert(math.abs(sc - expected(id)) < 1e-12,
          s"query '$query' doc $id: $sc vs ${expected(id)}")
      }
    }
  }

  test("ranking is deterministic and rank-ordered with doc tie-break") {
    val s = spark
    import s.implicits._
    val df = corpus.toDF("doc_id", "text")
    val rows = TextSearch.bm25TopK(df, "doc_id", "text", "quick", k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(rows.map(_._3).toSeq == (1 to rows.length))
    assert(rows.sortBy(r => (-r._2, r._1)).toSeq == rows.toSeq)
    // doc 4 says "quick" twice in a short doc → strongest signal
    assert(rows.head._1 == 4L)
  }

  test("empty or all-blank corpus returns an empty result, not an NPE") {
    val s = spark
    import s.implicits._
    for (rows <- Seq(Seq.empty[(Long, String)], Seq((1L, ""), (2L, "   ")))) {
      val df = rows.toDF("doc_id", "text")
      assert(TextSearch.bm25TopK(df, "doc_id", "text", "anything", 5).count() == 0)
    }
  }

  test("bm25TopKBatch: every query's slice equals its single-query run") {
    val s = spark
    import s.implicits._
    val df = corpus.toDF("doc_id", "text")
    val post = TextSearch.postings(df, "doc_id", "text")
    val queryTexts = Seq("quick fox", "the dog", "Query PLANNER!", "sailing",
      "zzz-no-such-term")
    val queries = queryTexts.zipWithIndex
      .map { case (t, i) => (s"q$i", t) }.toDF("query_id", "qtext")
    val batch = TextSearch.bm25TopKBatch(post, queries, "query_id", "qtext",
      k = 10)
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r =>
        (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq).toMap
    queryTexts.zipWithIndex.foreach { case (t, i) =>
      val single =
        if (t == "zzz-no-such-term") Seq.empty
        else TextSearch.bm25TopKFromPostings(post, t, k = 10)
          .collect().map(r =>
            (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      val got = batch.getOrElse(s"q$i", Seq.empty)
      assert(got.map(r => (r._1, r._3)) == single.map(r => (r._1, r._3)),
        s"query '$t': batch (doc, rank) diverged from single-query run")
      got.zip(single).foreach { case (g, e) =>
        assert(math.abs(g._2 - e._2) < 1e-9,
          s"query '$t' doc ${g._1}: batch score ${g._2} vs single ${e._2}")
      }
    }
  }

  test("few-term narrow path ≡ postings path (ranks exact, scores 1e-9)") {
    val s = spark
    import s.implicits._
    val df = corpus.toDF("doc_id", "text")
    val post = TextSearch.postings(df, "doc_id", "text")
    for (q <- Seq("quick fox", "the dog", "QUICK quick Quick", "sailing",
        "dogs foxes guide field")) {
      // bm25Scores dispatches ≤16-term queries to the narrow path
      val narrow = TextSearch.bm25Scores(df, "doc_id", "text", q)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val viaPost = TextSearch.bm25ScoresFromPostings(post, q)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(narrow.keySet == viaPost.keySet, s"query '$q' doc set")
      narrow.foreach { case (id, sc) =>
        assert(math.abs(sc - viaPost(id)) < 1e-9,
          s"query '$q' doc $id: narrow $sc vs postings ${viaPost(id)}")
      }
    }
  }

  test("few-term plan never explodes the corpus (no Generate node)") {
    val s = spark
    import s.implicits._
    val df = corpus.toDF("doc_id", "text")
    val plan = TextSearch.bm25Scores(df, "doc_id", "text", "quick fox")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      "narrow path must not build postings via explode:\n" + plan)
  }

  test("a >16-term query takes the postings path and matches the reference") {
    val s = spark
    import s.implicits._
    val df = corpus.toDF("doc_id", "text")
    // 17 distinct terms → past fewTermsMax; most miss the corpus
    val q = ("quick fox dog sailing planner engine data tour field guide " +
      "lazy brown jumps over results page ships").ensuring(
      _.split(" ").distinct.length == 17)
    val got = TextSearch.bm25Scores(df, "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = referenceBm25(q)
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, sc) =>
      assert(math.abs(sc - expected(id)) < 1e-9, s"doc $id")
    }
  }

  test("randomized corpora: both dispatch paths match the reference (narrow and postings)") {
    import org.scalacheck.Gen
    val s = spark
    import s.implicits._
    val word = Gen.oneOf("fox", "dog", "DOG!", "ship's", "a", "Quick,",
      "engine", "zz9", "the", "  ", "")
    val docGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(1, 14).flatMap(n => Gen.listOfN(n, docGen))
    // queries: 1..20 distinct-ish terms → exercises the ≤16-term narrow
    // dispatch AND the >16-term postings dispatch
    val qWord = Gen.oneOf("fox", "dog", "ships", "quick", "engine", "zz9",
      "the", "a", "missing1", "missing2", "w1", "w2", "w3", "w4", "w5",
      "w6", "w7", "w8", "w9", "w10", "w11", "w12")
    val queryGen = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, qWord).map(_.distinct.mkString(" ")))

    def reference(corpus: Seq[(Long, String)], query: String)
        : Map[Long, Double] = {
      def toks(t: String) = t.toLowerCase.replaceAll("[\\p{Punct}]", " ")
        .trim.split("\\s+").toSeq.filter(_.nonEmpty)
      val docToks = corpus.map { case (id, t) => id -> toks(t) }
        .filter(_._2.nonEmpty).toMap
      if (docToks.isEmpty) return Map.empty
      val n = docToks.size
      val avgLen = docToks.values.map(_.size).sum.toDouble / n
      val qTerms = toks(query).distinct
      docToks.flatMap { case (id, ts) =>
        val sc = qTerms.map { term =>
          val tf = ts.count(_ == term).toDouble
          if (tf == 0) 0.0
          else {
            val df = docToks.values.count(_.contains(term)).toDouble
            val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * ts.size / avgLen))
          }
        }.sum
        if (sc > 0) Some(id -> sc) else None
      }
    }

    forAllGen2(corpusGen, queryGen, trials = 25) { (docsList, query) =>
      val corpus = docsList.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = corpus.toDF("doc_id", "text")
      val qTerms = query.toLowerCase.replaceAll("[\\p{Punct}]", " ")
        .trim.split("\\s+").filter(_.nonEmpty).distinct
      if (qTerms.nonEmpty) {
        val expected = reference(corpus, query)
        val got = TextSearch.bm25Scores(df, "doc_id", "text", query)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got.keySet == expected.keySet,
          s"doc set for query '$query' over ${corpus.size} docs " +
            s"(${qTerms.length} terms)")
        got.foreach { case (id, sc) =>
          assert(math.abs(sc - expected(id)) < 1e-9,
            s"query '$query' doc $id: $sc vs ${expected(id)}")
        }
      }
    }
  }

  test("keywordsFromPostings: hand-computed top terms, term tie-break, k cut") {
    val s = spark
    import s.implicits._
    // 3 docs: "rare" appears only in doc 1 (df=1) so it must beat the
    // everywhere-word "common" (df=3) at equal tf; doc 3's equal-score
    // terms order alphabetically
    val df = Seq(
      (1L, "rare common common"),
      (2L, "common alpha"),
      (3L, "beta alpha common")).toDF("doc_id", "text")
    val post = TextSearch.postings(df, "doc_id", "text")
    val got = TextSearch.keywordsFromPostings(post, k = 2)
      .orderBy("doc", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // doc 1: common tf=2 df=3 → 2·(ln(4/4)+1) = 2.0 beats
    // rare tf=1 df=1 → 1·(ln(4/2)+1) ≈ 1.693147
    assert(got.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq ==
      Seq((1, "common"), (2, "rare")))
    // doc 3: alpha and beta both tf=1 df-distinct — alpha(df=2) scores
    // below beta(df=1); common(df=3) scores last and falls off at k=2
    val d3 = got.filter(_._1 == 3L).map(t => (t._2, t._3)).toSeq
    assert(d3 == Seq((1, "beta"), (2, "alpha")))
    assert(got.count(_._1 == 1L) == 2 && got.count(_._1 == 2L) == 2)
  }

  test("unigramSurprisal matches an independent reimplementation; ordering is sane") {
    val s = spark
    import s.implicits._
    // 'common' dominates the corpus; doc 3 is all-common, doc 4 all-rare
    val docs = Seq(
      (1L, "common common common common rare1"),
      (2L, "common common common rare2 rare3"),
      (3L, "common common common common common"),
      (4L, "rare4 rare5 rare6"),
      (5L, "")).toDF("doc_id", "text")
    val out = TextSearch.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // independent computation over the same tokenizer
    val toks = Seq(
      1L -> Seq("common", "common", "common", "common", "rare1"),
      2L -> Seq("common", "common", "common", "rare2", "rare3"),
      3L -> Seq("common", "common", "common", "common", "common"),
      4L -> Seq("rare4", "rare5", "rare6"))
    val cf = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val total = toks.map(_._2.size).sum.toDouble
    toks.foreach { case (id, ts) =>
      val expect = -ts.map(t => math.log(cf(t) / total)).sum / ts.size
      val (len, nll) = out(id)
      assert(len == ts.size, s"doc $id token count")
      assert(math.abs(nll - expect) < 1e-9, s"doc $id: $nll vs $expect")
    }
    assert(!out.contains(5L), "an empty doc has no tokens, no row")
    // the quality-signal ordering: all-common boilerplate scores LOWEST,
    // the all-rare doc HIGHEST
    val byNll = out.toSeq.sortBy(_._2._2).map(_._1)
    assert(byNll.head == 3L && byNll.last == 4L, s"ordering: $byNll")
    // identity with the stored-postings path
    val viaPost = TextSearch.surprisalFromPostings(
        TextSearch.postings(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.foreach { case (id, (_, nll)) =>
      assert(math.abs(viaPost(id) - nll) < 1e-12) }
    // and with the index-serving shape (persists the stats side, scans
    // the postings twice — the t13 gate path)
    val viaIx = TextSearch.surprisalFromIndex(
        TextSearch.postings(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.foreach { case (id, (_, nll)) =>
      assert(math.abs(viaIx(id) - nll) < 1e-12) }
  }

  test("dsirLogWeights matches an independent reimplementation; ordering is sane") {
    val s = spark
    import s.implicits._
    // two "domains": docs 1-3 share vocab A (the target), docs 4-5
    // vocab B, doc 6 mixes — its weight must land between the pure docs
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta gamma delta"),
      (3L, "alpha delta beta"),
      (4L, "zeta eta theta zeta eta"),
      (5L, "theta zeta eta"),
      (6L, "alpha beta zeta eta")).toDF("doc_id", "text")
    import org.apache.spark.sql.functions.col
    val target = docs.where(col("doc_id") <= 3).select(col("doc_id"))
    val post = TextSearch.postings(docs, "doc_id", "text")
    val out = TextSearch.dsirLogWeights(post, target)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

    // independent model: plain Scala maps over the same tokenization
    val toks = Map(
      1L -> Seq("alpha", "beta", "gamma", "alpha"),
      2L -> Seq("beta", "gamma", "delta"),
      3L -> Seq("alpha", "delta", "beta"),
      4L -> Seq("zeta", "eta", "theta", "zeta", "eta"),
      5L -> Seq("theta", "zeta", "eta"),
      6L -> Seq("alpha", "beta", "zeta", "eta"))
    val cfS = toks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val cfT = toks.filter(_._1 <= 3L).values.flatten
      .groupBy(identity).view.mapValues(_.size).toMap
    val totalS = toks.values.map(_.size).sum.toDouble
    val totalT = toks.filter(_._1 <= 3L).values.map(_.size).sum.toDouble
    val v = cfS.size.toDouble
    toks.foreach { case (id, ts) =>
      val expect = ts.map { t =>
        math.log((cfT.getOrElse(t, 0) + 1.0) / (totalT + v)) -
          math.log((cfS(t) + 1.0) / (totalS + v))
      }.sum
      val (len, w) = out(id)
      assert(len == ts.size, s"doc $id len")
      assert(math.abs(w - expect) < 1e-9, s"doc $id: $w vs $expect")
    }
    // ordering: target-vocab docs positive, off-domain negative, the
    // mixed doc strictly between
    assert(Seq(1L, 2L, 3L).forall(out(_)._2 > 0))
    assert(Seq(4L, 5L).forall(out(_)._2 < 0))
    assert(out(6L)._2 < out(1L)._2 && out(6L)._2 > out(4L)._2)
  }

  test("hashingTfIdf matches an independent reimplementation; vectors feed ANN") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val docs = corpus.toDF("doc_id", "text")
    val dim = 16
    val post = TextSearch.postings(docs, "doc_id", "text")
    val out = TextSearch.hashingTfIdf(post, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

    // independent model over the same tokenizer contract
    def toks(t: String) = t.toLowerCase
      .replaceAll("[\\p{Punct}]", " ").trim.split("\\s+")
      .filter(_.nonEmpty).toSeq
    def fp31(w: String): Long =
      w.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    val byDoc = corpus.filter(_._2.nonEmpty)
      .map { case (id, t) => id -> toks(t) }.filter(_._2.nonEmpty).toMap
    val btf = byDoc.view.mapValues(ts =>
      ts.groupBy(w => fp31(w) % dim).view.mapValues(_.size).toMap).toMap
    val n = byDoc.size
    val dfb = btf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size).toMap
    btf.foreach { case (id, bm) =>
      val w = bm.map { case (b, tf) =>
        b -> tf * (math.log((n + 1.0) / (dfb(b) + 1.0)) + 1.0) }
      val nrm = math.sqrt(w.values.map(x => x * x).sum)
      w.foreach { case (b, x) =>
        val got = out((id, b))
        assert(math.abs(got - x / nrm) < 1e-9, s"doc $id bucket $b")
      }
      // L2 property
      val l2 = w.keys.toSeq.map(b => out((id, b))).map(x => x * x).sum
      assert(math.abs(l2 - 1.0) < 1e-9, s"doc $id not L2-normalized: $l2")
    }
    // dense form: correct dim, same nonzeros, and it runs through the
    // ANN brute-force entry unchanged (the text→vector bridge)
    val dense = TextSearch.hashingTfIdfVectors(post, dim)
    val vecs = dense.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs.values.forall(_.length == dim))
    btf.foreach { case (id, bm) =>
      bm.keys.foreach(b =>
        assert(math.abs(vecs(id)(b.toInt) - out((id, b))) < 1e-12))
    }
    val knn = AnnSearch.bruteForceTopK(dense, dense, "doc", "vec", k = 2)
      .collect()
    assert(knn.nonEmpty, "hashed vectors must drive ANN end-to-end")
  }

  test("unigramSurprisal matches the reference on randomized corpora") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    (1 to 5).foreach { trial =>
      // small vocab with a skewed head so cf varies meaningfully
      val vocab = Array.tabulate(15)(i => s"w$i")
      def pick(): String =
        vocab(math.min(rnd.nextInt(vocab.length), rnd.nextInt(vocab.length)))
      val docs = (1 to 25).map(i =>
        (i.toLong, Seq.fill(rnd.nextInt(12))(pick()).mkString(" ")))
      val out = TextSearch.unigramSurprisal(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      val toks = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
      val cf = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
      val total = toks.map(_._2.size).sum.toDouble
      toks.foreach { case (id, ts) =>
        if (ts.isEmpty) assert(!out.contains(id), s"trial $trial doc $id")
        else {
          val expect = -ts.map(t => math.log(cf(t) / total)).sum / ts.size
          val (len, nll) = out(id)
          assert(len == ts.size, s"trial $trial doc $id length")
          assert(math.abs(nll - expect) < 1e-9,
            s"trial $trial doc $id: $nll vs $expect")
        }
      }
    }
  }

  test("termStats counts frequencies over the normalized tokens") {
    val s = spark
    import s.implicits._
    val stats = TextSearch.termStats(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats("quick") == (3L, 4L)) // docs 1,2,4; doc 4 twice
    assert(stats("the") == (3L, 4L))   // docs 1 (×2), 2, 4
    assert(!stats.contains(""))
  }

  test("bigramSurprisal matches hand-computed add-one bigram NLLs") {
    val s = spark
    import s.implicits._
    // corpus: doc 1 = "a b a", doc 2 = "b a", doc 3 = "" (no bigrams)
    // unigrams: a×3, b×2, V = 2
    // bigrams:  doc 1 {a b, b a}, doc 2 {b a} → c(a b)=1, c(b a)=2
    // doc 1: −(ln((1+1)/(3+2)) + ln((2+1)/(2+2)))/2
    // doc 2: −ln((2+1)/(2+2))
    val docs = Seq((1L, "a b a"), (2L, "b, a"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = TextSearch.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        math.rint(r.getDouble(2) * 1e6) / 1e6)).toMap
    val d1 = -(math.log(2.0 / 5) + math.log(3.0 / 4)) / 2
    val d2 = -math.log(3.0 / 4)
    assert(out.keySet == Set(1L, 2L), s"doc 3 has no bigram evidence: $out")
    assert(out(1L) == (2L, math.rint(d1 * 1e6) / 1e6), s"got ${out(1L)}")
    assert(out(2L) == (1L, math.rint(d2 * 1e6) / 1e6), s"got ${out(2L)}")
    // template boilerplate (repeated bigrams) scores LOWER than novel
    // word order over the same unigrams — the signal t13 cannot see
    val tpl = (1L to 20L).map(i => (i, "home about contact home about"))
    val odd = Seq((21L, "contact home about about home"))
    val mixed = (tpl ++ odd).toDF("doc_id", "text")
    val sc = TextSearch.bigramSurprisal(mixed, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sc(1L) < sc(21L),
      s"template ${sc(1L)} must score below scrambled ${sc(21L)}")
  }

  test("phraseMatch: adjacency, overlap counting, normalization") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c a b"),          // two "a b" occurrences
      (2L, "a c b"),              // both terms, never adjacent
      (3L, "A, b! then A-b"),     // punctuation/case normalize away
      (4L, "a a a"),              // overlapping "a a" twice
      (5L, "")).toDF("doc_id", "text")
    def run(phrase: String*) =
      TextSearch.phraseMatch(docs, "doc_id", "text", phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run("a", "b") == Map(1L -> 2L, 3L -> 2L))
    assert(run("a", "a") == Map(4L -> 2L))
    assert(run("a", "b", "c") == Map(1L -> 1L))
    assert(run("b", "c", "a") == Map(1L -> 1L))
    assert(run("c", "a", "b") == Map(1L -> 1L))
    assert(run("x", "y").isEmpty)
  }

  test("phraseMatch guards: short or unnormalized phrases are rejected") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      TextSearch.phraseMatch(docs, "doc_id", "text", Seq("a")))
    intercept[IllegalArgumentException](
      TextSearch.phraseMatch(docs, "doc_id", "text", Seq("A", "b")))
  }

  test("positionalPostings: 1-based dense positions, postings-consistent") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "The quick, quick dog")).toDF("doc_id", "text")
    val got = TextSearch.positionalPostings(docs, "doc_id", "text")
      .collect().map(r => (r.getInt(2), r.getString(1))).sorted.toSeq
    assert(got == Seq(1 -> "the", 2 -> "quick", 3 -> "quick", 4 -> "dog"))
  }
}
