package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** BPE merge-table INDUCTION (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units", public) — the
  * training half of the tokenizer story whose inference half is
  * [[graft.functions.BpeKernel]]: c12/c14/c16 encode and budget with a
  * FIXED merge table; this learns one from the corpus, deterministically.
  *
  * Algorithm (the published greedy induction, exactly): start from
  * per-character symbols over the whitespace pre-tokens (the
  * [[graft.functions.BpeKernel.tokenCount]] pre-tokenization, so a
  * learned table feeds the same inference kernel shape); each round,
  * count adjacent symbol pairs across the weighted word vocabulary
  * (every adjacent position counts — "aaa" holds two (a,a) occurrences),
  * take the most frequent pair with a LEXICOGRAPHIC (left, right)
  * tie-break (the determinism the reference implementation leaves to
  * dict order), merge it greedily left-to-right in every word, repeat.
  * The output table satisfies the learned-BPE invariant the fixed
  * table documents: every entry's parts are single characters or
  * outputs of earlier entries (BpeTrainSpec asserts it on real data).
  *
  * Scale shape: training follows the FAISS/quantizer discipline the
  * IVF family already uses ([[AnnSearch.ivfCentroids]]) — a BOUNDED
  * hash-ordered sample (deterministic: xxhash64-ordered first
  * `maxTrainDocs` docs), whose word-frequency table is aggregated
  * DISTRIBUTED and only then collected (the driver holds the sample's
  * weighted vocabulary, never document text), and the merge rounds run
  * driver-side against that bounded table. At 10¹¹ docs a larger
  * sample buys almost nothing a 10⁴-doc sample doesn't (merge ranks
  * stabilize with vocabulary coverage, the published observation), and
  * a full-corpus pair count per round would be `numMerges` corpus
  * scans for the same table. Re-train on drift by re-running — the
  * output is a plain (rank, left, right) frame a session pins as a
  * broadcast or literal table. */
object BpeTrain {

  /** Learned merges in rank order, with each pair's selection-time
    * frequency. Deterministic for a fixed (corpus, salt-free id order,
    * numMerges, maxTrainDocs). */
  def learnMerges(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int, maxTrainDocs: Int = 4096)
      : IndexedSeq[(String, String, Long)] = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    require(maxTrainDocs > 0, s"maxTrainDocs must be positive: $maxTrainDocs")
    // deterministic bounded sample, then a DISTRIBUTED word count —
    // the driver receives (word, weight) rows only
    val sample = df
      .select(col(idCol).as("__id"), col(textCol).as("__text"))
      .withColumn("__h", xxhash64(col("__id")))
      .orderBy(col("__h"), col("__id"))
      .limit(maxTrainDocs)
    val wordRows = sample
      .select(explode(split(trim(col("__text")), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).cast("long").as("n"))
      .collect()

    // mutable training state: one symbol array per distinct word
    val words: Array[Array[String]] = wordRows.map(_.getString(0))
      .map(w => w.map(String.valueOf(_)).toArray)
    val weights: Array[Long] = wordRows.map(_.getLong(1))

    val out = IndexedSeq.newBuilder[(String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // count adjacent pairs, weighted by word frequency
      val counts = new java.util.HashMap[(String, String), Long]()
      var i = 0
      while (i < words.length) {
        val syms = words(i)
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          counts.merge(k, weights(i), _ + _)
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count; lexicographic (left, right) tie-break
        var best: (String, String) = null
        var bestN = -1L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val n = e.getValue
          val k = e.getKey
          if (n > bestN || (n == bestN &&
              (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
            best = k; bestN = n
          }
        }
        out += ((best._1, best._2, bestN))
        // greedy left-to-right merge in every word
        i = 0
        while (i < words.length) {
          val syms = words(i)
          if (syms.length > 1) {
            val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 &&
                  syms(j + 1) == best._2) {
                next += syms(j) + syms(j + 1)
                j += 2
              } else {
                next += syms(j)
                j += 1
              }
            }
            words(i) = next.toArray
          }
          i += 1
        }
        round += 1
      }
    }
    out.result()
  }

  /** [[learnMerges]] as the gate/artifact frame: (rank, left, right,
    * pair_count) — deterministic integers and strings. */
  def learnedMergeTable(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, numMerges: Int,
      maxTrainDocs: Int = 4096): DataFrame = {
    import spark.implicits._
    learnMerges(df, idCol, textCol, numMerges, maxTrainDocs)
      .zipWithIndex
      .map { case ((l, r, n), i) => (i, l, r, n) }
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Rank-priority BPE inference under an ARBITRARY learned table —
    * the [[graft.functions.BpeKernel.encodeWord]] algorithm
    * generalized from the fixed table (lowest-rank adjacent pair
    * merges first, leftmost on rank ties). Exposed so a learned table
    * is immediately usable for counting/packing and so the spec can
    * assert train/encode consistency. */
  def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(String.valueOf(_)).toArray
    var done = syms.length <= 1
    while (!done) {
      var best = Int.MaxValue
      var at = -1
      var j = 0
      while (j < syms.length - 1) {
        ranks.get((syms(j), syms(j + 1))) match {
          case Some(r) if r < best => best = r; at = j
          case _ =>
        }
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
}
