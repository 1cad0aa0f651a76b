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

  // --- WRatio weight regimes (rapidfuzz fuzz.WRatio, all three branches;
  // expected values derived by hand from the public algorithm:
  // ratio = 100*(1 - indel/(|a|+|b|)), indel = |a|+|b| - 2*lcs) ---

  test("wratio regime len_ratio < 1.5: token path wins at exactly 0.95 scale") {
    // token_sort_ratio = 100 (same token multiset), so wratio = 95.0
    // exactly whenever plain ratio stays below 95
    val a = "fuzzy wuzzy was a bear"
    val b = "wuzzy fuzzy bear was a"
    assert(ratio(a, b) < 95.0)
    assert(tokenSortRatio(a, b) == 100.0)
    assert(wratio(a, b) == 95.0)
  }

  test("wratio regime 1.5 <= len_ratio < 8: partial path wins at 0.9 scale") {
    // |a|=4, |b|=16 → len_ratio 4; "test" is a substring → partial = 100;
    // partial_token caps at 100*0.95*0.9 = 85.5; so wratio = 90.0 exactly
    val a = "test"
    val b = "this is a test!!"
    assert(partialRatio(a, b) == 100.0)
    assert(wratio(a, b) == 90.0)
  }

  test("wratio regime len_ratio >= 8: partial scale drops to 0.6") {
    // |a|=4, |b|=39 → len_ratio 9.75; substring match → partial = 100;
    // shared token "test" → partial_token_set = 100, scaled 0.95*0.6 = 57;
    // so wratio = 60.0 exactly
    val a = "test"
    val b = "aaaa bbbb cccc dddd eeee ffff test gggg"
    assert(b.length == 39)
    assert(partialTokenSetRatio(a, b) == 100.0)
    assert(wratio(a, b) == 60.0)
  }

  // --- threshold boundary scores (the joins cut at >= 85 and >= 75 on the
  // RAW score; display rounds afterwards — fuzzy_match_salary.py:136-139,
  // score stored uint8 after round) ---

  test("wratio boundary: exactly 85.0 passes the 85 cutoff") {
    // single tokens → wratio = ratio; lcs=17, indel=6, 100*(1-6/40) = 85.0
    val v = wratio("a" * 20, "a" * 17 + "bbb")
    assert(v == 85.0 && math.round(v) == 85)
  }

  test("wratio boundary: 84.85 rounds to 85 but fails the raw 85 cutoff") {
    // lcs=14, indel=5, |a|+|b|=33 → 100*(1-5/33) = 84.848…: a pair the
    // rounded DISPLAY score calls 85 that the raw threshold must exclude
    val v = wratio("a" * 17, "a" * 14 + "bb")
    assert(math.abs(v - 2800.0 / 33.0) < 1e-9)
    assert(v < 85.0 && math.round(v) == 85)
  }

  test("wratio boundary: 84.42 stays on the 84 side of rounding") {
    // lcs=84, indel=31, |a|+|b|=199 → 100*(1-31/199) = 84.422…
    val v = wratio("a" * 100, "a" * 84 + "b" * 15)
    assert(math.abs(v - (100.0 * (1.0 - 31.0 / 199.0))) < 1e-9)
    assert(v < 85.0 && math.round(v) == 84)
  }

  test("wratio boundary: exactly 75.0 passes the lightcast 75 cutoff") {
    // lcs=15, indel=10 → 100*(1-10/40) = 75.0
    val v = wratio("a" * 20, "a" * 15 + "b" * 5)
    assert(v == 75.0 && math.round(v) == 75)
  }

  test("wratio boundary: 74.37 fails the 75 cutoff and rounds to 74") {
    // lcs=74, indel=51, |a|+|b|=199 → 100*(1-51/199) = 74.371…
    val v = wratio("a" * 100, "a" * 74 + "b" * 25)
    assert(math.abs(v - (100.0 * (1.0 - 51.0 / 199.0))) < 1e-9)
    assert(v < 75.0 && math.round(v) == 74)
  }

  // --- empty / whitespace-only / unicode inputs ---

  test("wratio degenerate inputs: empty and whitespace-only") {
    assert(wratio("", "") == 0.0)       // rapidfuzz WRatio length-0 guard
    assert(wratio("", "abc") == 0.0)
    assert(wratio("abc", "") == 0.0)
    // identical whitespace: ratio path (raw strings) scores 100 even
    // though both tokenize to nothing
    assert(wratio("   ", "   ") == 100.0)
    assert(tokenSetRatio("   ", "   ") == 0.0)
    // whitespace vs text shares no characters at all
    assert(wratio("   ", "x") == 0.0)
  }

  test("unicode titles: non-ASCII chars survive normalization and score") {
    // Python string.punctuation is ASCII-only: the em-dash is NOT removed
    assert(normalizeTitle("Café—Manager") == "café—manager")
    assert(wratio("café", "café") == 100.0)
    // lcs("café","cafe")=3 → indel=2 → 100*(1-2/8) = 75.0, through the
    // generic (non-bit-parallel) LCS path
    assert(ratio("café", "cafe") == 75.0)
    assert(wratio("café", "cafe") == 75.0)
    assert(lcsLen("αβγδ", "αγδ") == 3)
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
