package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** THE shared ASCII/BMP text-hashing contract, pinned in one place
  * (VERDICT r10 task 7). Three kernels hash text and each documents the
  * same caveat independently; this spec makes the supplementary-plane
  * behavior of all three an asserted fact instead of three scattered
  * doc sentences:
  *
  *  - [[graft.functions.ShingleExpressions]]' fp31 (the t12
  *    linear_text_score bucket hash) folds UTF-16 code UNITS: a
  *    supplementary-plane character contributes its TWO surrogates.
  *  - [[graft.functions.BpeExpressions]]' bpe_token_count symbolizes
  *    per UTF-16 unit: a supplementary-plane character starts as TWO
  *    one-unit symbols, and the ASCII-learned merge table never fuses
  *    them.
  *  - [[TextFunctions.fingerprint]] (the t4 rolling hash, also the
  *    t15 hashing-TF-IDF bucket) folds per CODE POINT — Spark `ascii`
  *    and DuckDB `ascii` agree on code points, which is exactly why t4
  *    and t15 hold true oracles beyond ASCII while fp31's cross-engine
  *    parity is pinned only for BMP/ASCII corpora.
  *
  * The whitespace tokenizer itself ([[TextFunctions.tokens]], shared by
  * every operator) is code-unit-agnostic: supplementary characters
  * never split a token.
  *
  * Probe character: 𝄞 U+1D11E (MUSICAL SYMBOL G CLEF) — outside the
  * BMP, unaffected by lowercasing and the punctuation classes. */
class TextHashContractSpec extends SparkTestBase {

  private val M = 1000000007L
  private val gClef = "𝄞"

  test("fp31 (t12 score) folds a supplementary char as its two surrogates") {
    // independent reimplementation of the documented fold
    def fp31(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c) % M)
    val d = 97
    val weights = Array.tabulate(d)(identity)
    val expected = weights((fp31(gClef) % d).toInt).toLong
    // the two-unit fold is NOT the code-point fold — the contract's
    // whole content is this inequality
    assert(fp31(gClef) != 0x1D11E % M)
    val got = spark.range(1)
      .select(graft.functions.linear_text_score(lit(gClef), weights))
      .head().getLong(0)
    assert(got == expected,
      s"fp31 no longer folds surrogate pairs as two units: $got != $expected")
  }

  test("bpe_token_count symbolizes a supplementary char as two unmergeable units") {
    val got = spark.range(1).select(
      graft.functions.bpe_token_count(lit(gClef)).as("a"),
      graft.functions.bpe_token_count(lit(s"x$gClef")).as("b"),
      // ASCII neighbors still merge per the table while the surrogates
      // stay separate ("th" is merge rank 0)
      graft.functions.bpe_token_count(lit(s"th$gClef")).as("c")).head()
    assert(got.getLong(0) == 2L, s"𝄞 must count 2 units, got ${got.getLong(0)}")
    assert(got.getLong(1) == 3L)
    assert(got.getLong(2) == 3L, "'th' must fuse while the surrogates don't")
  }

  test("fingerprint (t4/t15 hash) folds a supplementary char as ONE code point") {
    val got = spark.range(1)
      .select(TextFunctions.fingerprint(lit(gClef))).head().getLong(0)
    assert(got == 0x1D11E % M,
      s"t4 fingerprint must be code-point granular (engine-portable): $got")
    // order-sensitivity across a code-point boundary
    val ab = spark.range(1)
      .select(TextFunctions.fingerprint(lit(s"a$gClef"))).head().getLong(0)
    assert(ab == (('a'.toLong * 31) + 0x1D11E) % M)
  }

  test("the whitespace tokenizer never splits inside a supplementary char") {
    val got = spark.range(1).select(
      TextFunctions.tokenCount(lit(s"$gClef$gClef $gClef x")).as("n"),
      TextFunctions.tokens(lit(s"$gClef$gClef $gClef x")).as("t")).head()
    assert(got.getInt(0) == 3)
    assert(got.getSeq[String](1) == Seq(s"$gClef$gClef", gClef, "x"))
  }
}
