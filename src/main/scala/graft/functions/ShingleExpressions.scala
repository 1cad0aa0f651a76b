package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass shingling / sketching kernels.
  *
  * The dedup pipeline originally composed these from built-in higher-order
  * functions (`transform`/`aggregate`), but Catalyst evaluates HOF lambdas
  * interpreted, one invocation per element — measured 6.7 s just to shingle
  * 5 000 docs, and a 64-hash MinHash signature re-walks the shingle array
  * 64×. These kernels do the same work in one compiled pass per row and
  * stay inside whole-stage codegen via static calls (same pattern as
  * [[FuzzyKernel]] / [[BitsetInterCount]]).
  *
  * Hash parity: [[MinHashSig]] reproduces `xxhash64(i, g)` (seed 42, int
  * then string fold) and [[SimHash64]] reproduces `xxhash64(g)` exactly, so
  * bucket assignments match the HOF formulations they replaced bit-for-bit.
  */
object TextKernel {

  private val WS = java.util.regex.Pattern.compile("\\s+")
  private val PUNCT = java.util.regex.Pattern.compile("[\\p{Punct}]")

  /** Rolling polynomial fingerprint over the chars — the t4 hash
    * ((h·31 + c) mod 1e9+7 per char), which DuckDB replicates exactly
    * with `list_reduce`/`ascii`, so hashed-feature bucketing built on
    * it is oracle-checkable cross-engine (xxhash64/md5-int would not
    * be without hex parsing). */
  private def fp31(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31 + s.charAt(i)) % 1000000007L
      i += 1
    }
    h
  }

  /** Linear text-classifier score in the fastText shape (Joulin et al.
    * 2016, public), integer-quantized: features are ALL word unigram
    * and bigram occurrences of the retrieval tokenizer (lowercase,
    * punctuation→space, whitespace split — the [[graft.operators
    * .TextSearch]] parity the t6 oracle pins), each hashed into
    * `weights.length` buckets by [[fp31]], and the score is the exact
    * integer sum of the bucket weights. One compiled pass per row, no
    * HOF lambdas, no exchange — the shape of a learned quality filter
    * applied at 100 TB (the weight table is the model; training it is
    * out of scope, serving it is a narrow map). Integer arithmetic end
    * to end → hash-exact DuckDB oracle. Empty text scores 0.
    *
    * ASCII/BMP contract (ADVICE r9): [[fp31]] folds UTF-16 code UNITS
    * (`charAt`) while a per-code-point engine (DuckDB `ascii()` over
    * split characters) folds code points, and `Locale.ROOT`
    * lowercasing can differ from SQL `lower()` outside ASCII — so
    * scores are deterministic for ANY input, but cross-engine parity
    * is guaranteed only for BMP text and pinned (t12) on ASCII
    * corpora. A supplementary-plane character hashes as its two
    * surrogates here and as one code point there; callers replaying
    * the score in another engine must match on that alphabet.
    * (Asserted with the other two kernels' planes in
    * TextHashContractSpec.) */
  def linearTextScore(text: UTF8String, weights: Array[Int]): Long = {
    val norm = PUNCT.matcher(
      text.toString.toLowerCase(java.util.Locale.ROOT)).replaceAll(" ").trim
    if (norm.isEmpty) return 0L
    val toks = WS.split(norm, -1)
    val d = weights.length
    var score = 0L
    var i = 0
    while (i < toks.length) {
      score += weights((fp31(toks(i)) % d).toInt)
      if (i + 1 < toks.length)
        score += weights((fp31(toks(i) + " " + toks(i + 1)) % d).toInt)
      i += 1
    }
    score
  }

  /** Distinct word n-gram shingles ("w1 w2 … wn"), first-occurrence order.
    * Matches `wordShinglesFromTokens(tokens(text), n)`: Spark-semantics
    * trim, split on `\s+`, empty/short input → empty array. */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val grams = gramsOf(text, n)
    if (grams.isEmpty) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](grams.length * 2)
    var i = 0
    while (i < grams.length) { seen.add(grams(i)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-grams in position order ("w1 w2 … wn" per start token)
    * — the shared gram construction behind [[wordShingles]] (which
    * dedups, first-occurrence order) and [[wordShinglesAll]] (which
    * keeps positions): trim, split on `\s+`, empty/short input → empty
    * array. One implementation so the two kernels can never drift on
    * tokenization. */
  private def gramsOf(text: UTF8String, n: Int): Array[String] = {
    val trimmed = text.trim()
    if (trimmed.numBytes() == 0) return Array.empty
    val toks = WS.split(trimmed.toString, -1)
    if (toks.length < n) return Array.empty
    val out = new Array[String](toks.length - n + 1)
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
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** ALL word n-gram occurrences in POSITION order (no dedup) — the
    * positional-seed form behind exact-substring span detection
    * ([[graft.operators.Dedup.sharedSpans]]): element i is the n-gram
    * starting at token position i, so `posexplode` yields (position,
    * gram) pairs directly. Same tokenization as [[wordShingles]]
    * (trim, `\s+` split); short input → empty array. */
  def wordShinglesAll(text: UTF8String, n: Int): ArrayData = {
    val grams = gramsOf(text, n)
    val out = new Array[Any](grams.length)
    var i = 0
    while (i < grams.length) { out(i) = UTF8String.fromString(grams(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct character q-grams, first-occurrence order. Matches
    * `charNgrams(text, q)`: length < q → empty array. Counts CODE POINTS
    * like Spark's `length`/`substring` (a surrogate pair is one
    * character), so supplementary-plane text grams identically to the
    * HOF/DuckDB formulations. */
  def charNgrams(text: UTF8String, q: Int): ArrayData = {
    val s = text.toString
    val cp = s.codePointCount(0, s.length)
    if (cp < q) return new GenericArrayData(Array.empty[Any])
    // UTF-16 offset of each code point boundary
    val offs = new Array[Int](cp + 1)
    var idx = 0
    var c = 0
    while (c < cp) {
      offs(c) = idx
      idx = s.offsetByCodePoints(idx, 1)
      c += 1
    }
    offs(cp) = s.length
    val seen = new java.util.LinkedHashSet[String](cp * 2)
    var i = 0
    while (i + q <= cp) {
      seen.add(s.substring(offs(i), offs(i + q)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var m = 0
    while (it.hasNext) { out(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(out)
  }

  /** k min-hashes of a shingle array in one pass over the shingles.
    * Slot i uses the hash chain xxhash64(i, shingle) — identical values to
    * `array_min(transform(sh, g => xxhash64(i, g)))`; empty input → all
    * Long.MaxValue sentinels. */
  def minhashSig(sh: ArrayData, k: Int): ArrayData = {
    val seeds = new Array[Long](k)
    var i = 0
    while (i < k) {
      seeds(i) = XxHash64Function.hash(i, IntegerType, 42L)
      i += 1
    }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = sh.numElements()
    var s = 0
    while (s < n) {
      if (!sh.isNullAt(s)) { // null elements skip, like array_min
        val g = sh.getUTF8String(s)
        var j = 0
        while (j < k) {
          val h = XxHash64Function.hash(g, StringType, seeds(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** 64-bit SimHash over a (distinct) shingle array: per element
    * xxhash64(g) (seed 42), ±1 vote per bit, bit set iff votes > 0.
    * Identical to the explode + 64×sum(when…) aggregation it replaced. */
  def simhash64(sh: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = sh.numElements()
    var s = 0
    while (s < n) {
      if (!sh.isNullAt(s)) { // null elements cast no votes
        val h = XxHash64Function.hash(sh.getUTF8String(s), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      s += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `linear_text_score(text, weights)` — see
  * [[TextKernel.linearTextScore]]: the hashed-bag linear classifier
  * score (fastText shape, integer-quantized weights). */
case class LinearTextScore(child: Expression, weights: Array[Int])
    extends UnaryExpression {
  require(weights.nonEmpty, "weights must be non-empty")

  override def dataType: DataType = LongType
  override def prettyName: String = "linear_text_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"linear_text_score requires a string argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    TextKernel.linearTextScore(text.asInstanceOf[UTF8String], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the weight table rides along as a referenced object, not a code
    // literal — a 2048-int array inlined as source would blow codegen
    val w = ctx.addReferenceObj("weights", weights, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernel.linearTextScore($c, $w)")
  }

  // two scores are the same computation only if the tables match
  override def equals(other: Any): Boolean = other match {
    case LinearTextScore(c, w) =>
      c == child && java.util.Arrays.equals(w, weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(weights)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_shingles_all(text, n)` — see [[TextKernel.wordShinglesAll]]:
  * ALL n-gram occurrences in position order. */
case class WordShinglesAll(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles_all"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles_all requires a string argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    TextKernel.wordShinglesAll(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernel.wordShinglesAll($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_shingles(text, n)` — see [[TextKernel.wordShingles]]. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    TextKernel.wordShingles(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `char_ngrams(text, q)` — see [[TextKernel.charNgrams]]. */
case class CharNgrams(child: Expression, q: Int) extends UnaryExpression {
  require(q >= 1, "q-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires a string argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    TextKernel.charNgrams(text.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.charNgrams($c, $q)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sig(shingles, k)` — see [[TextKernel.minhashSig]]. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "signature length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(sh: Any): Any =
    TextKernel.minhashSig(sh.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(shingles)` — see [[TextKernel.simhash64]]. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(sh: Any): Any =
    TextKernel.simhash64(sh.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernel.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
