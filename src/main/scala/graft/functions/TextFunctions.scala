package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, shingling, language-ID heuristics, quality scoring,
  * fingerprinting. All are compositions of codegen'd built-ins — no UDFs —
  * so they whole-stage-codegen and push down cleanly at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text; empty input → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count (empty → 0). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: count of maximal runs of word chars plus
    * standalone punctuation marks — approximates tokenizer token counts
    * without a vocab. */
  def approxBpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distinct word-n-gram shingles from an already-computed token array.
    * IMPORTANT: pass a *materialized column* (an attribute), not the
    * `tokens(text)` expression — interpreted HOF evaluation re-runs every
    * subtree reference, so an inline tokens() gets re-split twice per
    * shingle (measured 10× slowdown). Guarded against `sequence`'s
    * descending behavior when stop < start. */
  def wordShinglesFromTokens(ws: Column, n: Int): Column =
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*))))

  /** Distinct word-n-gram shingles ("w1 w2 ... wn" strings) straight from
    * text — fine for small inputs; pipelines should materialize tokens
    * first (see [[wordShinglesFromTokens]]). */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(text), n)

  /** Distinct character q-grams of the raw text. */
  def charNgrams(text: Column, q: Int): Column =
    when(length(text) < q, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(text) - (q - 1)),
        i => substring(text, i, lit(q)))))

  /** Jaccard similarity of two string arrays (exact, set semantics);
    * integer set sizes divided in double — deterministic across engines. */
  def arrayJaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** Language-ID heuristic: per-language stopword hit counts via regex;
    * returns the argmax language code with a fixed priority tie-break.
    * Profiles are tiny on purpose — this is the classic n-gram/stopword
    * heuristic, not a model. */
  val langProfiles: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|a)\\b",
    "es" -> "\\b(el|la|de|que|y|los|una)\\b",
    "de" -> "\\b(der|die|und|das|ist|nicht|ein)\\b",
    "fr" -> "\\b(le|la|les|et|des|est|une)\\b")

  def langHits(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Argmax language with deterministic priority order on ties;
    * "und" (undetermined) when no profile hits. */
  def langId(text: Column): Column = {
    val hits = langProfiles.map { case (code, p) => code -> langHits(text, p) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = langProfiles.reverse.foldLeft(lit("und")) {
      case (acc, (code, p)) =>
        when(langHits(text, p) === best && best > 0, lit(code)).otherwise(acc)
    }
    pick
  }

  /** Quality-score components (length, word stats, punct/stopword ratios).
    * Returns a struct; ratios are int/int double divisions (engine-exact). */
  def qualityMetrics(text: Column): Column = {
    val nChars = length(text)
    val nWords = tokenCount(text)
    val nPunct = size(regexp_extract_all(text, lit("[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]"), lit(0)))
    val nStop = langHits(text, "\\b(the|and|of|to|in|is|a)\\b")
    struct(
      nChars.as("n_chars"),
      nWords.as("n_words"),
      when(nWords === 0, lit(0.0))
        .otherwise(nChars.cast("double") / nWords.cast("double")).as("chars_per_word"),
      when(nChars === 0, lit(0.0))
        .otherwise(nPunct.cast("double") / nChars.cast("double")).as("punct_ratio"),
      when(nWords === 0, lit(0.0))
        .otherwise(nStop.cast("double") / nWords.cast("double")).as("stopword_ratio"))
  }

  /** Polynomial rolling-hash document fingerprint:
    * acc = (acc * 31 + ascii(char)) mod 1e9+7 over the text's characters.
    * Order-sensitive, engine-portable (64-bit exact).
    *
    * Unicode contract (shared with the fp31/BPE kernels and pinned in
    * TextHashContractSpec): THIS hash folds per CODE POINT — Spark and
    * DuckDB `ascii` agree on code points, so t4/t15 oracles hold beyond
    * ASCII — whereas the fp31 (t12) and BPE (c12) kernels fold UTF-16
    * code UNITS, so their cross-engine parity is pinned for BMP/ASCII
    * corpora only. */
  def fingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + ascii(ch).cast("bigint"), lit(1000000007L)))

  /** Hamming distance between two long bit-vectors. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** PII redaction patterns, applied in this order (email first so its
    * digits can't be half-eaten by the numeric patterns; card before
    * phone so a 4-4-4-4 run is one `<CC>`, not fragments). All patterns
    * are DIALECT-PORTABLE by construction — character classes, bounded
    * repetition, and ASCII `\b` only, no lookaround or backreferences —
    * so Java regex (Spark codegen) and RE2 (DuckDB, Go engines) produce
    * byte-identical output; the t7 oracle pins that. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<SSN>",
    "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b" -> "<CC>",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>")

  /** PII scrub — the pretraining-corpus redaction pass: emails, SSNs,
    * card numbers, phone numbers, IPv4 addresses → typed placeholder
    * tokens. A chain of codegen'd `regexp_replace`s (one narrow map, no
    * shuffle, no UDF) — at 100 TB this runs at scan speed. */
  def piiScrub(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) =>
      regexp_replace(c, p, r)
    }

  private def piiFold(text: Column): (Seq[Column], Column) =
    piiPatterns.foldLeft((Seq.empty[Column], text)) {
      case ((acc, cur), (p, r)) =>
        val n = size(regexp_extract_all(cur, lit(p), lit(0)))
          .as(r.stripPrefix("<").stripSuffix(">").toLowerCase + "s")
        (acc :+ n, regexp_replace(cur, p, r))
    }

  /** Count of PII matches by class — the audit-side companion to
    * [[piiScrub]] (how much was redacted, per class). Each class counts
    * on the text AS SCRUBBED BY THE PREVIOUS classes, matching exactly
    * what the scrub chain replaces (a card number is one `cc`, not also
    * phone fragments). */
  def piiCounts(text: Column): Column = struct(piiFold(text)._1: _*)

  /** Scrubbed text AND the per-class counts as one struct — what a
    * redaction pipeline (t7) selects. The counts' progressive chain and
    * the scrub chain share every `regexp_replace` step structurally, so
    * the sharing does not depend on codegen subexpression elimination
    * spotting duplicate subtrees across output columns. */
  def piiAudit(text: Column): Column = {
    val (counts, scrubbed) = piiFold(text)
    struct(scrubbed.as("scrubbed") +: counts: _*)
  }
}
