package graft.functions

import java.util.Locale

/** Pure-Scala re-implementation of the rapidfuzz scorer family used by the
  * reference's fuzzy similarity joins.
  *
  * Reference semantics (all public):
  *   - normalization: /root/reference/src/utils.py:20-29 (lowercase, strip
  *     Python `string.punctuation`, collapse whitespace, trim)
  *   - blocking scorer `fuzz.token_set_ratio`: /root/reference/src/fuzzy_match_salary.py:119-126
  *   - exact scorer `fuzz.WRatio`: /root/reference/src/fuzzy_match_salary.py:136-139
  *
  * All scorers return a similarity in [0.0, 100.0] built on the Indel
  * (insert/delete-only edit) distance, itself derived from LCS length:
  * `indel(a,b) = |a| + |b| - 2 * lcs(a,b)`.
  *
  * Every method here is a static (object) method so that generated Catalyst
  * code can call it directly from whole-stage codegen — see
  * [[graft.functions.FuzzyExpressions]].
  */
object FuzzyKernel {

  /** Exactly Python's `string.punctuation` (32 ASCII chars). */
  final val PunctuationChars = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"

  private final val punctLookup: Array[Boolean] = {
    val a = new Array[Boolean](128)
    PunctuationChars.foreach(c => a(c.toInt) = true)
    a
  }

  /** Reference `normalize_title` (utils.py:22-29): non-string → "",
    * lowercase, remove punctuation, collapse runs of whitespace to a single
    * space, trim. Single-pass, allocation-light.
    */
  def normalizeTitle(title: String): String = {
    if (title == null) return ""
    val lower = title.toLowerCase(Locale.ROOT)
    val n = lower.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = lower.charAt(i)
      if (Character.isWhitespace(c)) {
        pendingSpace = sb.length() > 0
      } else if (c < 128 && punctLookup(c.toInt)) {
        // dropped entirely (Python str.translate deletes, leaving no space)
      } else {
        if (pendingSpace) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  // ---------------------------------------------------------------------------
  // Indel / LCS kernel
  // ---------------------------------------------------------------------------

  /** LCS length via dynamic programming; O(|a|*|b|) time, O(min) space. */
  private[graft] def lcsLenDP(a: CharSequence, b: CharSequence): Int = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    val m = s.length
    if (m == 0) return 0
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    var j = 0
    while (j < l.length) {
      val cj = l.charAt(j)
      var i = 0
      while (i < m) {
        cur(i + 1) =
          if (s.charAt(i) == cj) prev(i) + 1
          else math.max(prev(i + 1), cur(i))
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      j += 1
    }
    prev(m)
  }

  /** Per-thread ASCII pattern-mask table for [[lcsLen64]] — reused across
    * calls (cleared after each) so the hot path allocates nothing. */
  private final val tlAsciiMask = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](128)
  }

  /** Bit-parallel LCS length (Hyyrö/Allison-Dix style) for |shorter| <= 63.
    * One 64-bit word per DP row; ~|longer| word ops total. Used on the hot
    * path (titles are short); cross-checked against [[lcsLenDP]] by
    * property tests. All-ASCII shorter strings (the normalized-title case)
    * use a zero-allocation thread-local mask table; otherwise a boxed map.
    */
  private[graft] def lcsLen64(short: CharSequence, long: CharSequence): Int = {
    val m = short.length
    if (m == 0) return 0
    var ascii = true
    var i = 0
    while (i < m) {
      if (short.charAt(i) >= 128) { ascii = false; i = m }
      else i += 1
    }
    if (!ascii) return lcsLen64Generic(short, long)
    val pm = tlAsciiMask.get()
    i = 0
    while (i < m) {
      pm(short.charAt(i).toInt) |= (1L << i)
      i += 1
    }
    var s = -1L // all ones
    var j = 0
    val n = long.length
    while (j < n) {
      val c = long.charAt(j)
      if (c < 128) {
        val matches = pm(c.toInt)
        if (matches != 0L) {
          val u = s & matches
          s = (s + u) | (s - u)
        }
      } // a non-ASCII char of `long` cannot match the all-ASCII `short`
      j += 1
    }
    i = 0
    while (i < m) {
      pm(short.charAt(i).toInt) = 0L
      i += 1
    }
    // zero bits within the low m bits mark LCS members
    java.lang.Long.bitCount(~s & ((1L << m) - 1))
  }

  private def lcsLen64Generic(short: CharSequence, long: CharSequence): Int = {
    val m = short.length
    // positions of each char of `short` as a bitmask
    val pm = new java.util.HashMap[Character, java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      val c = short.charAt(i)
      val old = pm.get(c)
      val bits = if (old == null) 0L else old.longValue()
      pm.put(c, java.lang.Long.valueOf(bits | (1L << i)))
      i += 1
    }
    var s = -1L
    var j = 0
    val n = long.length
    while (j < n) {
      val mObj = pm.get(long.charAt(j))
      if (mObj != null) {
        val matches = mObj.longValue()
        val u = s & matches
        s = (s + u) | (s - u)
      }
      j += 1
    }
    java.lang.Long.bitCount(~s & ((1L << m) - 1))
  }

  /** LCS length — picks the bit-parallel kernel when it fits in a word. */
  def lcsLen(a: CharSequence, b: CharSequence): Int = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.length <= 63) lcsLen64(s, l) else lcsLenDP(s, l)
  }

  /** Indel distance: insertions + deletions to turn a into b. */
  def indelDistance(a: CharSequence, b: CharSequence): Int =
    a.length + b.length - 2 * lcsLen(a, b)

  /** Normalized Indel similarity in [0,1]; 1.0 for two empty strings
    * (matches rapidfuzz `Indel.normalized_similarity`). */
  def indelNormSim(a: CharSequence, b: CharSequence): Double = {
    val total = a.length + b.length
    if (total == 0) 1.0
    else 1.0 - indelDistance(a, b).toDouble / total
  }

  /** `fuzz.ratio`: 100 * normalized Indel similarity. */
  def ratio(a: String, b: String): Double = indelNormSim(a, b) * 100.0

  // ---------------------------------------------------------------------------
  // partial_ratio
  // ---------------------------------------------------------------------------

  /** `fuzz.partial_ratio`: best Indel ratio between the shorter string and
    * any window of the longer string of the shorter's length (windows
    * clipped at the right edge are covered by shorter suffix windows being
    * dominated; edge prefixes/suffixes are also scanned for exactness).
    */
  def partialRatio(a: String, b: String): Double = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    val m = s.length
    val n = l.length
    if (m == 0) return if (n == 0) 100.0 else 0.0
    if (m == n) return ratio(s, l)
    var best = 0.0
    // full-length windows
    var start = 0
    while (start + m <= n) {
      val sim = indelNormSim(s, l.subSequence(start, start + m)) * 100.0
      if (sim > best) best = sim
      if (best == 100.0) return 100.0
      start += 1
    }
    // boundary windows shorter than m (prefixes and suffixes of the longer
    // string) — can win when the shorter string overhangs an edge
    var len = 1
    while (len < m) {
      val simPre = indelNormSim(s, l.subSequence(0, len)) * 100.0
      if (simPre > best) best = simPre
      val simSuf = indelNormSim(s, l.subSequence(n - len, n)) * 100.0
      if (simSuf > best) best = simSuf
      len += 1
    }
    best
  }

  // ---------------------------------------------------------------------------
  // token scorers
  // ---------------------------------------------------------------------------

  /** Whitespace-split tokens, sorted (multiset — duplicates kept). */
  private[graft] def sortedTokens(s: String): Array[String] = {
    val toks = splitTokens(s)
    java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]])
    toks
  }

  private[graft] def splitTokens(s: String): Array[String] = {
    if (s == null || s.isEmpty) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val st = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > st) out += s.substring(st, i)
    }
    out.toArray
  }

  private def joined(tokens: Array[String]): String = tokens.mkString(" ")

  /** `fuzz.token_sort_ratio`: ratio of the space-joined sorted token
    * multisets. */
  def tokenSortRatio(a: String, b: String): Double =
    ratio(joined(sortedTokens(a)), joined(sortedTokens(b)))

  /** Sort in place and drop adjacent duplicates (set semantics). */
  private def sortedUnique(toks: Array[String]): Array[String] = {
    if (toks.length <= 1) return toks
    java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]])
    var w = 1
    var i = 1
    while (i < toks.length) {
      if (toks(i) != toks(w - 1)) { toks(w) = toks(i); w += 1 }
      i += 1
    }
    if (w == toks.length) toks else java.util.Arrays.copyOf(toks, w)
  }

  /** Sorted-unique decomposition (intersection, a-only, b-only) via a
    * two-pointer merge of the sorted unique token arrays — no tree sets,
    * no per-call boxing (hot path of the blocking scorer). Takes the
    * already-split token arrays so callers tokenize exactly once. */
  private def setDecompose(ta: Array[String], tb: Array[String])
      : (Array[String], Array[String], Array[String]) = {
    val sa = sortedUnique(ta)
    val sb = sortedUnique(tb)
    val inter = new scala.collection.mutable.ArrayBuffer[String](sa.length)
    val onlyA = new scala.collection.mutable.ArrayBuffer[String](sa.length)
    val onlyB = new scala.collection.mutable.ArrayBuffer[String](sb.length)
    var i = 0
    var j = 0
    while (i < sa.length && j < sb.length) {
      val c = sa(i).compareTo(sb(j))
      if (c == 0) { inter += sa(i); i += 1; j += 1 }
      else if (c < 0) { onlyA += sa(i); i += 1 }
      else { onlyB += sb(j); j += 1 }
    }
    while (i < sa.length) { onlyA += sa(i); i += 1 }
    while (j < sb.length) { onlyB += sb(j); j += 1 }
    (inter.toArray, onlyA.toArray, onlyB.toArray)
  }

  /** `fuzz.token_set_ratio` — the reference's blocking scorer
    * (fuzzy_match_salary.py:122). Set (unique-token) semantics:
    * t0 = sorted intersection, t1 = t0 ++ sorted(a-only),
    * t2 = t0 ++ sorted(b-only); max of the three pairwise ratios.
    * Returns 0 when either side has no tokens (rapidfuzz semantics).
    */
  def tokenSetRatio(a: String, b: String): Double = {
    val ta = splitTokens(a)
    val tb = splitTokens(b)
    if (ta.isEmpty || tb.isEmpty) return 0.0
    val (inter, onlyA, onlyB) = setDecompose(ta, tb)
    if (inter.nonEmpty && (onlyA.isEmpty || onlyB.isEmpty)) return 100.0
    val t0 = joined(inter)
    val t1 = if (t0.isEmpty) joined(onlyA) else t0 + " " + joined(onlyA)
    val t2 = if (t0.isEmpty) joined(onlyB) else t0 + " " + joined(onlyB)
    math.max(ratio(t0, t1), math.max(ratio(t0, t2), ratio(t1, t2)))
  }

  /** max(token_sort_ratio, token_set_ratio) — rapidfuzz `token_ratio`. */
  def tokenRatio(a: String, b: String): Double =
    math.max(tokenSortRatio(a, b), tokenSetRatio(a, b))

  /** partial_ratio over sorted-joined tokens. */
  def partialTokenSortRatio(a: String, b: String): Double =
    partialRatio(joined(sortedTokens(a)), joined(sortedTokens(b)))

  /** rapidfuzz `partial_token_set_ratio`: 100 on any shared token, else
    * partial_ratio of the joined differences. */
  def partialTokenSetRatio(a: String, b: String): Double = {
    val ta = splitTokens(a)
    val tb = splitTokens(b)
    if (ta.isEmpty || tb.isEmpty) return 0.0
    val (inter, onlyA, onlyB) = setDecompose(ta, tb)
    if (inter.nonEmpty) 100.0
    else partialRatio(joined(onlyA), joined(onlyB))
  }

  def partialTokenRatio(a: String, b: String): Double =
    math.max(partialTokenSortRatio(a, b), partialTokenSetRatio(a, b))

  /** `fuzz.WRatio` — the reference's exact scorer
    * (fuzzy_match_salary.py:136-139). Weighted blend per rapidfuzz:
    * near-equal lengths use max(ratio, 0.95*token_ratio); longer length
    * ratios bring partial variants scaled by 0.9 (len ratio < 8) or 0.6.
    */
  def wratio(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val lenRatio =
      if (la > lb) la.toDouble / lb.toDouble else lb.toDouble / la.toDouble
    val base = ratio(a, b)
    val UnbaseScale = 0.95
    if (lenRatio < 1.5) {
      math.max(base, tokenRatio(a, b) * UnbaseScale)
    } else {
      val partialScale = if (lenRatio < 8.0) 0.9 else 0.6
      val withPartial = math.max(base, partialRatio(a, b) * partialScale)
      math.max(withPartial, partialTokenRatio(a, b) * UnbaseScale * partialScale)
    }
  }

  /** `fuzz.QRatio` — plain ratio with empty-guard (serving parity with the
    * broader rapidfuzz surface). */
  def qratio(a: String, b: String): Double =
    if (a.isEmpty || b.isEmpty) 0.0 else ratio(a, b)
}
