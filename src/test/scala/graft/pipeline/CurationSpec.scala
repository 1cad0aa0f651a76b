package graft.pipeline

import graft.SparkTestBase

/** End-to-end check of the c1 corpus-curation composition on a corpus
  * where every stage has a designed victim: an exact duplicate, a
  * near-duplicate, a too-short doc, an unidentifiable-language doc, and
  * a boilerplate-repetitive doc. */
class CurationSpec extends SparkTestBase {

  test("each curation stage drops its designed victim, survivors pass all") {
    val s = spark
    import s.implicits._

    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away to find a quiet place in the sunny meadow today"  // 24 words, en
    val nearDup = base.replace("sunny", "rainy")                        // 1-word edit
    val other = "a tall ship sails to the harbor and the crew is glad " +
      "to see land again after months of storms on the open water"     // unique en doc
    val docs = Seq(
      (1L, base),                                       // survives
      (2L, base),                                       // exact dup of 1 → stage-3 drop
      (3L, nearDup),                                    // near-dup of 1 → stage-4 drop
      (4L, "the cat sat on the mat"),                   // 6 words → length gate
      (5L, Seq.fill(25)("zorp blag").mkString(" ")),    // no stopwords → 'und' gate
      (6L, Seq.fill(15)("the cat").mkString(" ")),      // repetition gate
      (7L, other)                                       // survives
    ).toDF("doc_id", "text")

    val tmp = java.nio.file.Files.createTempDirectory("curation").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val out = graft.queries.CurationQueries
      .queries("c1_corpus_pipeline")(spark, tmp)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1)

    assert(out.map(_._1).toSeq == Seq(1L, 7L),
      s"expected survivors 1 and 7, got ${out.toSeq}")
    assert(out.forall(_._2 == "en"))
    assert(out.head._3 == 24) // doc 1 word count carried through
  }

  test("c11 stacks the classifier and surprisal gates; every gate claims a victim") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._

    // 30 permutation docs over ONE 24-word vocabulary (7 en stopwords
    // so lang-ID fires): every word occurs ~30x corpus-wide, so their
    // shared unigram surprisal ln(total/cf) ≈ ln(24+..) ≈ 3.2 sits in
    // the HEAD bucket; per-doc words are all distinct (rep = 0) and
    // bigram sets of two random permutations barely overlap (no
    // near-dup pairs). The classifier score varies per permutation
    // (different bigram buckets), so some docs fall to the score < 0
    // gate — the accounting below derives which from the kernel
    // itself, then checks the composite agrees.
    val vocab = Seq("the", "and", "of", "to", "in", "is", "a",
      "meadow", "river", "stone", "cloud", "forest", "valley", "hill",
      "breeze", "shadow", "light", "bird", "song", "path", "garden",
      "window", "door", "field")
    val rnd = new scala.util.Random(123)
    val perms = (1 to 30).map(i => (i.toLong, rnd.shuffle(vocab).mkString(" ")))
    // designed victims for each remaining gate
    val tailDoc = (vocab.take(7) ++ (1 to 17).map(j => s"oddword$j"))
      .mkString(" ")                                    // rare tokens → tail
    val docs = (perms ++ Seq(
      (97L, "the cat sat on a mat"),                    // length gate
      (98L, Seq.fill(25)("zorp blag").mkString(" ")),   // 'und' gate
      (99L, ("the is a " + Seq.fill(22)("to to").mkString(" "))), // repetition
      (100L, tailDoc)
    )).toDF("doc_id", "text")

    val tmp = java.nio.file.Files.createTempDirectory("curation11").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // independent gate accounting from the (separately spec'd) kernels
    import graft.functions.TextFunctions._
    val total2g = greatest(tokenCount(col("text")) - 1, lit(0))
    val sig = docs.select(col("doc_id"),
        langId(col("text")).as("lang"),
        tokenCount(col("text")).as("nw"),
        graft.functions.word_shingles(col("text"), 2).as("sh"),
        total2g.as("t2g"),
        graft.functions.linear_text_score(coalesce(col("text"), lit("")),
          graft.queries.TextQueries.qualityModelWeights).as("score"))
      .withColumn("rep", when(col("t2g") === 0, lit(0.0))
        .otherwise(lit(1.0) - size(col("sh")).cast("double")
          / col("t2g").cast("double")))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getDouble(6), r.getLong(5))).toMap
    val nll = graft.operators.TextSearch
      .unigramSurprisal(docs, "doc_id", "text")
      .select(col("doc"), round(col("mean_nll"), 6).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def heur(id: Long) = { val (l, nw, rep, _) = sig(id)
      l != "und" && nw >= 20 && nw <= 1000 && rep <= 0.1 }
    val passCls = sig.keySet.filter(id => heur(id) && sig(id)._4 >= 0)
    val expected = passCls.filter(id => nll(id) < 3.4041)

    // every stacked gate must claim at least one victim on this corpus
    assert(sig.exists(kv => kv._2._1 == "und"), "no und victim")
    assert(sig.exists(kv => kv._2._2 < 20), "no length victim")
    assert(sig.exists(kv => heur(kv._1) == false && kv._2._1 != "und" &&
      kv._2._2 >= 20), "no repetition victim")
    val clsVictims = sig.keySet.filter(id => heur(id) && sig(id)._4 < 0)
    assert(clsVictims.nonEmpty, "no classifier victim among heuristic passers")
    assert(passCls.exists(id => nll(id) >= 3.4041),
      s"no tail-bucket victim: ${passCls.map(nll).toSeq.sorted}")
    assert(expected.contains(100L) == false && passCls.contains(100L),
      "doc 100 must fall to the surprisal tail gate specifically")
    assert(expected.size >= 10, s"survivor pool too small: $expected")

    val out = graft.queries.CurationQueries
      .queries("c11_curation_ccnet")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getString(4)))
    assert(out.map(_._1).toSet == expected,
      s"composite disagrees with per-stage accounting: " +
        s"extra ${out.map(_._1).toSet -- expected}, " +
        s"missing ${expected -- out.map(_._1).toSet}")
    // survivors' carried signals match the kernels, buckets are head
    // (~ln 24+) for the permutation pool
    out.foreach { case (id, lang, nw, score, bucket) =>
      assert(lang == sig(id)._1 && nw == sig(id)._2 && score == sig(id)._4)
      assert(bucket == (if (nll(id) < 3.3998) "head" else "middle"))
    }
  }

  test("c28 id-space guard rides EVERY id entering the union — a real " +
      "doc at >= 10M raises even off the planted branch (ADVICE r16)") {
    val s = spark
    import s.implicits._
    // 10000001 has %20 = 1 and %23 = 15: it rode NEITHER the real-eval
    // nor the planted projection, so the pre-fix guard (planted branch
    // only) let it through to be silently classified as eval
    val docs = Seq((1L, "a normal doc"), (10000001L, "an escapee"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("c28guard").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val e = intercept[Exception] {
      graft.queries.CurationQueries.semanticUnion(spark, tmp).collect()
    }
    assert(e.getMessage.contains("planted-eval id space"))
  }
}
