package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.PropHelper

class FuzzyKernelSpec extends AnyFunSuite with PropHelper {
  import FuzzyKernel._

  // --- normalize_title (reference utils.py:22-29) ---
  test("normalizeTitle basic") {
    assert(normalizeTitle("  Senior,  Software-Engineer!! ") == "senior softwareengineer")
    assert(normalizeTitle("POLICE OFFICER") == "police officer")
    assert(normalizeTitle(null) == "")
    assert(normalizeTitle("") == "")
    assert(normalizeTitle("!!!") == "")
    assert(normalizeTitle("a\t\nb   c") == "a b c")
    // all 32 Python string.punctuation chars removed
    assert(normalizeTitle(PunctuationChars) == "")
  }

  test("normalizeTitle idempotent (property)") {
    forAllGen(Gen.asciiPrintableStr) { s =>
      val once = normalizeTitle(s)
      assert(normalizeTitle(once) == once)
    }
  }

  // --- LCS kernels agree ---
  private val smallStr = Gen.chooseNum(0, 63).flatMap(n =>
    Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c', ' ')))

  test("bit-parallel LCS matches DP (property)") {
    forAllGen2(smallStr, smallStr, trials = 500) { (a, b) =>
      val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
      assert(lcsLen64(s, l) == lcsLenDP(s, l), s"a=[$a] b=[$b]")
    }
  }

  test("lcs known values") {
    assert(lcsLen("kitten", "sitting") == 4)
    assert(lcsLen("", "abc") == 0)
    assert(lcsLen("abc", "abc") == 3)
    assert(lcsLen("abcd", "bd") == 2)
  }

  // --- ratio family golden values (hand-derived rapidfuzz semantics) ---
  test("ratio golden") {
    assert(ratio("abcd", "abcd") == 100.0)
    assert(math.abs(ratio("abcd", "abce") - 75.0) < 1e-9)
    assert(math.abs(ratio("kitten", "sitting") - (100.0 * (1.0 - 5.0 / 13.0))) < 1e-9)
    assert(ratio("", "") == 100.0)
    assert(ratio("", "abc") == 0.0)
  }

  test("partialRatio golden") {
    assert(partialRatio("this is a test", "this is a test!") == 100.0)
    assert(partialRatio("test", "this is a test!") == 100.0)
    assert(partialRatio("", "") == 100.0)
    assert(partialRatio("", "abc") == 0.0)
    assert(partialRatio("abc", "abc") == 100.0)
  }

  test("tokenSortRatio golden") {
    assert(tokenSortRatio("fuzzy wuzzy was a bear", "wuzzy fuzzy bear was a") == 100.0)
    // multiset semantics: duplicate tokens are kept
    val v = tokenSortRatio("fuzzy was a bear", "fuzzy fuzzy was a bear")
    assert(math.abs(v - (100.0 * (1.0 - 6.0 / 38.0))) < 1e-9)
  }

  test("tokenSetRatio golden") {
    // set semantics: duplicates collapse
    assert(tokenSetRatio("fuzzy was a bear", "fuzzy fuzzy was a bear") == 100.0)
    // shared subset with one side having no extras → 100
    assert(tokenSetRatio("fuzzy was a bear", "fuzzy was a bear and more") == 100.0)
    assert(tokenSetRatio("", "") == 0.0)
    assert(tokenSetRatio("abc", "") == 0.0)
    assert(tokenSetRatio("police officer", "police officer") == 100.0)
  }

  test("wratio golden") {
    // len_ratio < 1.5 branch: max(ratio, 0.95*token_ratio)
    val v = wratio("this is a test", "this is a test!")
    assert(math.abs(v - (100.0 * 28.0 / 29.0)) < 1e-9)
    assert(wratio("abc", "") == 0.0)
    assert(wratio("same title", "same title") == 100.0)
    // long-side branch engages partial scorers
    val long = wratio("test", "this is a long sentence holding a test somewhere")
    assert(long > 0.0 && long <= 100.0)
  }

  // --- properties ---
  private val titleGen =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '))))

  test("scorers bounded, symmetric, reflexive (property)") {
    forAllGen2(titleGen, titleGen, trials = 300) { (a, b) =>
      for (f <- Seq[(String, String) => Double](
          ratio, partialRatio, tokenSortRatio, tokenSetRatio, wratio)) {
        val v = f(a, b)
        assert(v >= 0.0 && v <= 100.0)
      }
      assert(math.abs(ratio(a, b) - ratio(b, a)) < 1e-9)
      assert(math.abs(tokenSetRatio(a, b) - tokenSetRatio(b, a)) < 1e-9)
      assert(math.abs(tokenSortRatio(a, b) - tokenSortRatio(b, a)) < 1e-9)
      if (a.trim.nonEmpty) {
        assert(ratio(a, a) == 100.0)
        assert(tokenSetRatio(a, a) == 100.0)
        assert(wratio(a, a) == 100.0)
      }
    }
  }
}
