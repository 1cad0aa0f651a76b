package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BpeKernel parity and contract tests.
  *
  * The independent reference here is STANDARD BPE (Sennrich et al.
  * 2016): per step, choose the lowest-ranked adjacent pair and fuse
  * ALL its non-overlapping occurrences left to right. The kernel fuses
  * one first-occurrence per step (the SQL-replayable formulation); the
  * randomized suites prove the two agree on the shipped merge table —
  * the learned-merge invariant the kernel's docs claim. */
class BpeSpec extends SparkTestBase {

  /** Standard BPE: fuse every non-overlapping occurrence of the best
    * pair per step. */
  private def refEncode(word: String): Seq[String] = {
    val ranks = BpeKernel.merges.zipWithIndex
      .map { case ((l, r), i) => (l, r) -> i }.toMap
    var syms: Vector[String] = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      val present = syms.indices.dropRight(1)
        .flatMap(i => ranks.get((syms(i), syms(i + 1))))
      if (present.isEmpty) continue = false
      else {
        val (bl, br) = BpeKernel.merges(present.min)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == bl && syms(i + 1) == br) {
            out += (bl + br); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
        if (syms.length == 1) continue = false
      }
    }
    syms
  }

  test("merge table satisfies the learned-merge invariant") {
    // every part is a single char or the output of an EARLIER merge —
    // the precondition for first-occurrence == fuse-all equivalence
    val outputs = scala.collection.mutable.Set.empty[String]
    BpeKernel.merges.foreach { case (l, r) =>
      for (part <- Seq(l, r))
        assert(part.length == 1 || outputs.contains(part),
          s"merge part '$part' is neither a char nor an earlier output")
      outputs += (l + r)
    }
    // and no duplicate pairs (a duplicate would make rank ambiguous)
    val pairs = BpeKernel.merges.toSeq
    assert(pairs.distinct == pairs, "duplicate merge pair")
  }

  test("encodeWord equals standard fuse-all BPE on dictionary-shaped words") {
    val words = Seq("the", "theater", "theaters", "and", "sand", "standard",
      "strand", "streaming", "interesting", "ones", "done", "at", "ate",
      "ates", "rates", "our", "yours", "hours", "string", "strings",
      "rest", "restore", "a", "b", "", "x", "thththth", "aaaa", "erer",
      "ingings", "entity", "all", "tall", "taller", "home", "dome",
      "lesson", "data", "column", "customer")
    words.foreach { w =>
      assert(BpeKernel.encodeWord(w).toSeq == refEncode(w),
        s"word '$w': ${BpeKernel.encodeWord(w).toSeq} vs ${refEncode(w)}")
    }
  }

  test("encodeWord equals standard fuse-all BPE on randomized strings") {
    val rnd = new scala.util.Random(202)
    // skew toward the merge alphabet so merges actually fire, plus
    // out-of-table chars (uppercase, digits, punctuation)
    val alpha = "theansrioudlmgy" + "THEzq09.,-"
    (1 to 2000).foreach { trial =>
      val w = Seq.fill(1 + rnd.nextInt(14))(
        alpha(rnd.nextInt(alpha.length))).mkString
      assert(BpeKernel.encodeWord(w).toSeq == refEncode(w),
        s"trial $trial word '$w'")
    }
  }

  test("tokenCount sums per-word symbol counts with Spark tokenization") {
    assert(BpeKernel.tokenCount(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "  the theater  \t streaming ")) == 1 + 3 + 5)
    assert(BpeKernel.tokenCount(
      org.apache.spark.unsafe.types.UTF8String.fromString("")) == 0L)
    assert(BpeKernel.tokenCount(
      org.apache.spark.unsafe.types.UTF8String.fromString("   \t ")) == 0L)
  }

  test("bpe_token_count column + SQL registration agree with the kernel") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the theater"), (2L, ""), (3L, "strand one"))
      .toDF("id", "text")
    val viaCol = df.select(col("id"),
        graft.functions.bpe_token_count(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCol == Map(1L -> 4L, 2L -> 0L, 3L -> 3L))
    df.createOrReplaceTempView("bpe_in")
    val viaSql = spark
      .sql("SELECT id, bpe_token_count(text) AS n FROM bpe_in")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
    // null text → null count (expression null semantics)
    val withNull = Seq((1L, Option("the")), (2L, None: Option[String]))
      .toDF("id", "text")
      .select(graft.functions.bpe_token_count(col("text")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(withNull.toSeq == Seq(Some(1L), None))
  }

  test("encodeText concatenates per-word sequences in word order") {
    def enc(t: String) = BpeKernel.encodeText(
      org.apache.spark.unsafe.types.UTF8String.fromString(t)).toSeq
    // the -> [the]; cat -> [c, at]  (a t is rank 7; c at not a merge)
    assert(enc("the cat") == Seq("the", "c", "at"))
    assert(enc("  the   cat ") == Seq("the", "c", "at"))
    assert(enc("") == Seq.empty && enc(" \t ") == Seq.empty)
  }

  test("bpe_shingles windows CROSS word boundaries; SQL registration agrees") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "the cat")).toDF("id", "text")
    val got = df.select(
        graft.functions.bpe_shingles(col("text"), 2).as("g"))
      .head().getSeq[String](0)
    // token sequence [the, c, at]: the 2-gram "the c" spans the word
    // boundary — the whole point of the tokenizer denomination
    assert(got == Seq("the c", "c at"), got.toString)
    df.createOrReplaceTempView("bpe_sh_in")
    val viaSql = spark
      .sql("SELECT bpe_shingles(text, 2) AS g FROM bpe_sh_in")
      .head().getSeq[String](0)
    assert(viaSql == got)
    // shorter-than-n sequence -> empty, not null
    assert(Seq((1L, "the")).toDF("id", "text")
      .select(graft.functions.bpe_shingles(col("text"), 2).as("g"))
      .head().getSeq[String](0).isEmpty)
  }
}
