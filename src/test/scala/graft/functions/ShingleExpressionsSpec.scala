package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.{word_shingles, word_shingles_all, minhash_sig, simhash64}
import graft.queries.Tables.t

/** Parity tests: the compiled single-pass kernels must reproduce the
  * higher-order-function compositions they replaced bit-for-bit (shingle
  * sets as sets, MinHash slots and SimHash bits exactly), on the real
  * documents corpus plus adversarial edge strings. */
class ShingleExpressionsSpec extends SparkTestBase {

  private def hofShingles(text: org.apache.spark.sql.Column, n: Int) =
    TextFunctions.wordShingles(text, n)

  private def hofMinhash(sh: org.apache.spark.sql.Column, k: Int) =
    transform(sequence(lit(0), lit(k - 1)), i =>
      coalesce(array_min(transform(sh, g => xxhash64(i, g))), lit(Long.MaxValue)))

  private def corpus = {
    import spark.implicits._
    val edge = Seq(
      "", " ", "   ", "a", "a b", "a  b   c", "  lead trail  ",
      "\tweird\nwhitespacehere", "dup dup dup dup",
      "punct, punct! (punct)", "ünïcode tökens ünïcode tökens",
      "emoji 😀😁😂 pairs 😀x")
      .zipWithIndex.map { case (s, i) => (10000L + i, s) }
    t(spark, sf(), "documents").select(col("doc_id"), col("text"))
      .unionByName(edge.toDF("doc_id", "text"))
  }

  test("word_shingles kernel matches HOF composition (as sets) incl. edges") {
    for (n <- Seq(1, 2, 3)) {
      val diff = corpus.select(
        col("doc_id"),
        array_sort(word_shingles(col("text"), n)).as("k"),
        array_sort(hofShingles(col("text"), n)).as("h"))
        .where(not(col("k") <=> col("h")))
      assert(diff.count() === 0, s"shingle mismatch at n=$n")
    }
  }

  test("char_ngrams kernel matches HOF composition (as sets) incl. edges") {
    for (q <- Seq(1, 3, 4)) {
      val diff = corpus.select(
        col("doc_id"),
        array_sort(graft.functions.char_ngrams(col("text"), q)).as("k"),
        array_sort(TextFunctions.charNgrams(col("text"), q)).as("h"))
        .where(not(col("k") <=> col("h")))
      assert(diff.count() === 0, s"char-ngram mismatch at q=$q")
    }
  }

  test("minhash_sig kernel matches HOF formulation exactly") {
    val sh = corpus.select(col("doc_id"), word_shingles(col("text"), 2).as("sh"))
      .repartition(4)
    val diff = sh.select(
      minhash_sig(col("sh"), 16).as("k"), hofMinhash(col("sh"), 16).as("h"))
      .where(not(col("k") <=> col("h")))
    assert(diff.count() === 0)
  }

  test("kernels match HOF formulations on randomized adversarial strings") {
    import org.scalacheck.Gen
    val charGen = Gen.frequency(
      (8, Gen.alphaNumChar), (3, Gen.const(' ')), (1, Gen.const('\t')),
      (1, Gen.const('\n')), (1, Gen.oneOf("!\"#$%&'()*,./:;ü€ß".toSeq)))
    val strGen = Gen.chooseNum(0, 60).flatMap(n => Gen.stringOfN(n, charGen))
    val samples = {
      var seed = org.scalacheck.rng.Seed(7L)
      (0 until 300).map { _ =>
        val s0 = strGen.pureApply(Gen.Parameters.default, seed)
        seed = seed.next
        s0
      }
    }
    import spark.implicits._
    val df = samples.zipWithIndex.map { case (s0, i) => (i.toLong, s0) }
      .toDF("doc_id", "text").repartition(4)
    val diff = df.select(
      array_sort(word_shingles(col("text"), 2)).as("k1"),
      array_sort(hofShingles(col("text"), 2)).as("h1"),
      array_sort(graft.functions.char_ngrams(col("text"), 3)).as("k2"),
      array_sort(TextFunctions.charNgrams(col("text"), 3)).as("h2"),
      minhash_sig(word_shingles(col("text"), 2), 8).as("k3"),
      hofMinhash(word_shingles(col("text"), 2), 8).as("h3"))
      .where(not(col("k1") <=> col("h1")) || not(col("k2") <=> col("h2")) ||
        not(col("k3") <=> col("h3")))
    assert(diff.count() === 0)
  }

  test("word_shingles_all kernel matches the HOF composition (ordered, all occurrences)") {
    for (n <- Seq(1, 2, 3, 13)) {
      // HOF reference: positional n-grams over the same tokenization
      val toks = split(trim(col("text")), "\\s+")
      val hof = when(length(trim(col("text"))) === 0 || size(toks) < n,
          array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - n + 1),
          i => array_join(slice(toks, i, lit(n)), " ")))
      val bad = corpus
        .select(col("doc_id"), word_shingles_all(col("text"), n).as("k"),
          hof.as("h"))
        .where(not(col("k") <=> col("h")))
        .count()
      assert(bad == 0, s"n=$n: kernel diverged from HOF on $bad docs")
    }
  }

  test("linear_text_score matches an independent Scala reimplementation incl. edges") {
    // independent reference: tokenize the t6 way, bag unigrams+bigrams,
    // t4 rolling fingerprint mod D, integer weight sum
    def ref(text: String, w: Array[Int]): Long = {
      def fp(s: String): Long =
        s.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
      val toks = text.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[\\p{Punct}]", " ").trim.split("\\s+")
        .filter(_.nonEmpty)
      val grams = toks.toSeq ++ toks.toSeq.sliding(2).withFilter(_.size == 2)
        .map(_.mkString(" "))
      grams.map(g => w((fp(g) % w.length).toInt).toLong).sum
    }
    val w = graft.queries.TextQueries.qualityModelWeights
    val rows = corpus.select(col("doc_id"), col("text"),
        linear_text_score(col("text"), w).as("s"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == ref(r.getString(1), w),
        s"doc ${r.getLong(0)}: '${r.getString(1).take(40)}'")
    }
    // bag semantics: a repeated gram counts every occurrence
    val s = spark
    import s.implicits._
    val one = Seq((1L, "alpha beta"), (2L, "alpha beta alpha beta"))
      .toDF("doc_id", "text")
      .select(linear_text_score(col("text"), w).as("s"))
      .collect().map(_.getLong(0))
    // doc 2 has 2x the unigrams, 2x the "alpha beta" bigram, plus the
    // extra "beta alpha" bridge gram — strictly more than double only
    // if the bridge weight is nonzero; assert the exact relation
    val fpBridge = "beta alpha".foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    assert(one(1) == 2 * one(0) + w((fpBridge % w.length).toInt))
  }

  test("linear_text_score parity holds across randomized weight tables and dims") {
    val rnd = new scala.util.Random(99)
    def ref(text: String, w: Array[Int]): Long = {
      def fp(s0: String): Long =
        s0.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
      val toks = text.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[\\p{Punct}]", " ").trim.split("\\s+")
        .filter(_.nonEmpty)
      val grams = toks.toSeq ++ toks.toSeq.sliding(2).withFilter(_.size == 2)
        .map(_.mkString(" "))
      grams.map(g => w((fp(g) % w.length).toInt).toLong).sum
    }
    val s = spark
    import s.implicits._
    for (trial <- 1 to 4) {
      val dim = Seq(7, 64, 257, 4096)(trial - 1) // incl. non-power-of-2
      val w = Array.fill(dim)(rnd.nextInt(4001) - 2000)
      val docs = (1 to 30).map(i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(20))(
          s"tok${rnd.nextInt(40)}").mkString(" ")))
      val out = docs.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"),
          linear_text_score(col("text"), w).as("s"))
        .collect()
      out.foreach { r =>
        assert(r.getLong(2) == ref(r.getString(1), w),
          s"trial $trial dim=$dim doc ${r.getLong(0)}")
      }
    }
  }

  test("hyperplane_sig kernel matches HOF formulation exactly") {
    val emb = t(spark, sf(), "embeddings")
    def hofSig(v: org.apache.spark.sql.Column, offset: Int, bits: Int) = {
      val projections = (0 until bits).map { b =>
        val p = offset + b
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, j) => x.cast("double") *
              ((pmod(xxhash64(lit(p), j), lit(2001L)).cast("double") - 1000.0) / 1000.0)),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
      }
      projections.reduce((a, b) => a.bitwiseOR(b))
    }
    for ((off, bits) <- Seq((0, 8), (24, 8), (3, 16))) {
      val diff = emb.select(
        VectorFunctions.hyperplaneSignatureRange(col("embedding"), off, bits).as("k"),
        hofSig(col("embedding"), off, bits).as("h"))
        .where(col("k") =!= col("h"))
      assert(diff.count() === 0, s"signature mismatch at offset=$off bits=$bits")
    }
  }

  test("simhash64 kernel matches the ±1 vote aggregation exactly") {
    val sh = corpus.select(col("doc_id"), word_shingles(col("text"), 2).as("sh"))
      .repartition(4)
    val kernel = sh.select(col("doc_id"), simhash64(col("sh")).as("s"))
    val toks = sh.select(col("doc_id"), explode(col("sh")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$bit")
    }
    val packed = (0 until 64).map { bit =>
      when(col(s"b$bit") > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    val hof = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("s"))
    val joined = kernel.alias("k").join(hof.alias("h"), "doc_id")
      .where(col("k.s") =!= col("h.s"))
    assert(joined.count() === 0)
    // empty shingle arrays (docs with <2 tokens) get simhash 0 in the kernel
    val empty = sh.where(size(col("sh")) === 0)
      .select(simhash64(col("sh")).as("s")).collect()
    assert(empty.forall(_.getLong(0) == 0L))
  }
}
