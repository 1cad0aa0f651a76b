package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-pair-encoding token counting — the GPT-2 merge
  * algorithm (Sennrich et al. 2016; Radford et al. 2019 released the
  * reference implementation publicly) over a FIXED, checked-in merge
  * table, so a token-denominated pipeline stage (packing, budget
  * sampling, data cards) can count in BPE tokens instead of whitespace
  * words and still be replayed exactly by an independent SQL engine.
  *
  * Algorithm (per whitespace pre-token): start from single characters,
  * then repeatedly find the adjacent symbol pair with the LOWEST merge
  * rank and fuse its FIRST occurrence, until no adjacent pair is in the
  * table. Real BPE fuses every occurrence of the chosen pair per step;
  * the two procedures provably agree whenever the table satisfies the
  * learned-BPE invariant (a merge's parts are single characters or
  * outputs of strictly earlier merges — any pair involving a freshly
  * created symbol ranks later than the merge that created it), which
  * [[merges]] does by construction and BpeSpec re-verifies against an
  * independent fuse-all-occurrences implementation on randomized
  * inputs. First-occurrence fusing is what a SQL replay can express as
  * one splice per recursion step.
  *
  * ASCII/BMP contract (the t12 kernel's caveat, stated up front):
  * symbols are UTF-16 code units and the merge table is lowercase
  * ASCII, so supplementary-plane characters count as two one-unit
  * symbols. Counts remain deterministic for any input; cross-engine
  * parity is pinned for ASCII corpora (DuckDB splits per code point).
  * The supplementary-plane behavior of all three text-hashing kernels
  * is asserted in one place: TextHashContractSpec.
  */
object BpeKernel {

  /** The fixed merge table, rank = position. Every entry's parts are
    * single characters or outputs of EARLIER entries (the learned-BPE
    * invariant — see class doc). Mirrored verbatim by the c12 oracle's
    * map literal; do not reorder without regenerating that SQL. */
  val merges: Array[(String, String)] = Array(
    ("t", "h"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"),
    ("r", "e"), ("h", "e"), ("a", "t"), ("o", "r"), ("e", "n"),
    ("a", "l"), ("e", "s"), ("o", "u"), ("i", "t"), ("s", "t"),
    ("e", "d"), ("i", "s"), ("a", "r"), ("l", "e"), ("o", "m"),
    ("th", "e"), ("an", "d"), ("in", "g"), ("er", "s"), ("ou", "r"),
    ("re", "s"), ("at", "e"), ("it", "y"), ("al", "l"), ("st", "r"),
    ("on", "e"), ("en", "t"), ("ar", "e"), ("le", "s"), ("om", "e"),
    ("the", "r"), ("ing", "s"), ("ate", "s"), ("str", "a"))

  /** rank by "left right" (symbols never contain whitespace — they are
    * fragments of whitespace-split pre-tokens). */
  private val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + " " + merges(i)._2, i)
      i += 1
    }
    m
  }

  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** BPE-encode one pre-token; returns the final symbol sequence. */
  def encodeWord(word: String): Array[String] = {
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var done = syms.length <= 1
    while (!done) {
      var best = Int.MaxValue
      var at = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r < best) { best = r; at = j }
        j += 1
      }
      if (at < 0) done = true
      else {
        val next = new Array[String](syms.length - 1)
        System.arraycopy(syms, 0, next, 0, at)
        next(at) = syms(at) + syms(at + 1)
        System.arraycopy(syms, at + 2, next, at + 1, syms.length - at - 2)
        syms = next
        if (syms.length == 1) done = true
      }
    }
    syms
  }

  /** The document's full BPE token SEQUENCE: Spark-semantics trim +
    * `\s+` pre-tokenization, then per-word [[encodeWord]] outputs
    * concatenated in word order — the flat sequence a trainer's
    * tokenizer emits, which token-denominated n-gram operators (the
    * GPT-3 appendix-C 13-gram decontamination rule counts TOKENIZER
    * grams, not whitespace words) slide their windows over, crossing
    * word boundaries. Empty/blank text → empty array. */
  def encodeText(text: UTF8String): Array[String] = {
    val trimmed = text.trim().toString
    if (trimmed.isEmpty) return Array.empty
    val words = WS.split(trimmed, -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) out ++= encodeWord(words(i))
      i += 1
    }
    out.toArray
  }

  /** Distinct n-grams of [[encodeText]]'s token sequence, joined by a
    * single space (symbols never contain whitespace — they are
    * fragments of whitespace-split pre-tokens), first-occurrence
    * order — the BPE-denominated sibling of
    * [[TextKernel.wordShingles]]. Shorter-than-n sequences → empty. */
  def shingles(text: UTF8String, n: Int):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = encodeText(text)
    if (toks.length < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Total BPE token count of a text: Spark-semantics trim + `\s+`
    * pre-tokenization (the [[TextKernel]] discipline), then the sum of
    * per-word symbol counts. Empty/blank text → 0. */
  def tokenCount(text: UTF8String): Long = {
    val trimmed = text.trim().toString
    if (trimmed.isEmpty) return 0L
    val words = WS.split(trimmed, -1)
    var total = 0L
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) total += encodeWord(words(i)).length
      i += 1
    }
    total
  }
}

/** `bpe_token_count(text)` — see [[BpeKernel.tokenCount]]: total BPE
  * token count under the fixed public merge table; a drop-in
  * denominator column for [[graft.operators.Packing]] /
  * [[graft.operators.Splits]] budget operators. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires a string argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    BpeKernel.tokenCount(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeKernel.tokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bpe_shingles(text, n)` — see [[BpeKernel.shingles]]: distinct
  * n-grams of the BPE token sequence (windows cross word boundaries),
  * the token-denominated gram column for
  * [[graft.operators.Dedup.ngramOverlap]]'s Bpe mode. */
case class BpeShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_shingles requires a string argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    BpeKernel.shingles(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeKernel.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
