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
}
