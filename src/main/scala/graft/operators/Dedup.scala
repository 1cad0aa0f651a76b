package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Deduplication operators for training-data pipelines, each designed
  * shuffle-first (no cross joins on the scale path):
  *
  *  - [[exact]]: hash-groupBy exact dedup.
  *  - [[jaccardPairs]]: exact n-gram-shingle Jaccard similarity join —
  *    PPJoin-style prefix-filtered candidates on sparse corpora, all-pairs
  *    block scoring on dense ones, both verified by a codegen'd
  *    sorted-array merge kernel — cost ∝ surviving pairs, never
  *    materializes the n² matrix on the sparse path.
  *  - [[minhashLshPairs]]: MinHash signatures + banded LSH bucketing →
  *    candidate pairs → exact-Jaccard verification. The classic
  *    shingle→minhash→band→bucket-join pipeline; at 100 TB the bucket join
  *    replaces the quadratic candidate space with hash-partitioned buckets.
  *  - [[simhashPairs]]: 64-bit SimHash + pigeonhole banding on k-bit chunks
  *    (pairs within Hamming distance d share at least one of d+1 chunks).
  */
object Dedup {

  /** Execution-path override for [[jaccardPairsBy]]: `Auto` gates on
    * measured corpus statistics; the forced values exist for testing and
    * for operators who know their corpus shape. All strategies produce
    * identical results (spec-checked) — they differ only in cost. */
  sealed trait JaccardStrategy
  object JaccardStrategy {
    case object Auto extends JaccardStrategy
    /** PPJoin prefix-filter candidates + merge verify. */
    case object Sparse extends JaccardStrategy
    /** All-pairs sorted-hash merge prefilter + exact verify. */
    case object DenseMerge extends JaccardStrategy
    /** All-pairs dense-bitset popcount. */
    case object DenseBitset extends JaccardStrategy
  }

  /** Exact dedup: one surviving row id per identical key, plus the
    * duplicate count. */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("dup_count"))

  /** Per-document distinct shingle sets (word n-grams), built by the
    * compiled single-pass [[graft.functions.TextKernel.wordShingles]]
    * kernel (the HOF composition it replaced evaluated one interpreted
    * lambda per token — 6.7 s for 5 000 docs vs ~0.3 s compiled).
    *
    * The repartition spreads docs across all cores regardless of input
    * file count and materializes the arrays once at the exchange, so
    * downstream self-join branches reuse them (ReuseExchange). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    // spread the RAW text, shingle after the exchange: computing the
    // shingle arrays below the repartition runs the whole kernel as one
    // task on a one-file corpus AND shuffles the (larger) arrays
    // instead of the text
    df.select(col(idCol).as("doc"), col(textCol).as("__text"))
      .transform(Par.spread(_, col("doc")))
      .select(col("doc"),
        graft.functions.word_shingles(col("__text"), n).as("sh"))

  /** inter/(|A|+|B|−inter) over binary-SORTED distinct string arrays in
    * ONE codegen'd merge pass ([[graft.functions.SortedStringJaccard]]) —
    * exact, no per-pair hash-set build (`array_intersect`), and no dense
    * bitset detour (which needed a global vocabulary id assignment: a
    * single-partition window plus a broadcast join and a groupBy, several
    * whole stages of plumbing before the first pair is scored). */
  private def sortedJaccardCol(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SortedStringJaccard(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Exact set-intersection verification of candidate pairs: joins the
    * (sorted) shingle sets back and merge-counts the intersection. AQE
    * turns the set-side joins into broadcasts when they fit. */
  private def verifyJaccard(cands: DataFrame, sets: DataFrame,
      theta: Double): DataFrame = {
    val sorted = sets.select(col("doc"), sort_array(col("sh")).as("sh"))
    val sa = sorted.select(col("doc").as("doc_a"), col("sh").as("sha"))
    val sb = sorted.select(col("doc").as("doc_b"), col("sh").as("shb"))
    cands.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard", sortedJaccardCol(col("sha"), col("shb")))
      .where(col("jaccard") >= theta)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** All-pairs scoring for DENSE corpora — when the shingle vocabulary is
    * so small relative to the corpus that nearly every pair shares a
    * shingle, candidate generation keeps ~all pairs and its explode-join
    * + pair-distinct shuffle costs more than just scoring every pair
    * (measured at sf0.1: 5.49M of 12.5M possible pairs survived prefix
    * blocking; 27 s via the candidate join vs ~2 s all-pairs).
    *
    * The n² hot loop runs on sorted xxhash64 arrays — a primitive-long
    * merge ([[graft.functions.SortedLongJaccard]]) that upper-bounds the
    * true Jaccard (collisions only ever inflate it), so `≥ θ` keeps a
    * lossless candidate superset; the handful of survivors get the exact
    * string-merge verification. The length-ratio conjunct (minsz
    * precomputed per ROW — in the join condition it would be two double
    * ceils per PAIR) prunes before the merge. Beyond broadcast size, a
    * partitioned cartesian still beats candidate generation in this
    * regime: each task scores one (partA, partB) block in codegen. */
  private def hashAllPairs(sets: DataFrame, theta: Double,
      useBroadcast: Boolean): DataFrame = {
    // both branches read this frame; the exchange makes them share one
    // computed copy (ReuseExchange) instead of re-hashing twice
    val hashed = sets.select(col("doc"), col("sz"),
        ceil(lit(theta) * col("sz")).cast("int").as("minsz"),
        sort_array(transform(col("sh"), g => xxhash64(g))).as("hs"))
      .transform(Par.spread(_, col("doc")))
    val ba = hashed.select(col("doc").as("doc_a"), col("sz").as("sza"),
      col("minsz").as("minsza"), col("hs").as("hsa"))
    val bb = hashed.select(col("doc").as("doc_b"), col("sz").as("szb"),
      col("minsz").as("minszb"), col("hs").as("hsb"))
    val cands = ba.crossJoin(if (useBroadcast) broadcast(bb) else bb)
      .where(col("doc_a") < col("doc_b") &&
        col("sza") >= col("minszb") && col("szb") >= col("minsza") &&
        sortedLongJaccardGECol(col("hsa"), col("hsb"), theta))
      .select(col("doc_a"), col("doc_b"))
    verifyJaccard(cands, sets, theta)
  }

  /** Early-exit `hash-jaccard ≥ θ` — identical decisions to filtering on
    * the full merge, but most pairs bail partway. */
  private def sortedLongJaccardGECol(a: Column, b: Column,
      theta: Double): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.SortedLongJaccardGE(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b), theta))

  /** Vocab ceiling for the bitset dense path (bitset bytes per doc =
    * vocab/8; 256k bits = 32 KB). */
  val BitsetVocabMax = 262144

  /** All-pairs scoring via dense BITSETS — for the heavy-dense regime
    * (large sets over a tiny vocabulary, e.g. char-grams on a small
    * alphabet) where the per-pair AND-popcount over vocab/64 words is
    * several times cheaper than merging ~2·|set| sorted hashes (measured
    * at 100k docs / 300-gram sets / 3k vocab: merge 393 s vs bitsets
    * ~90 s). Costs a global vocabulary id assignment (single-partition
    * window over ≤[[BitsetVocabMax]] vocab entries — bounded) plus a
    * broadcast join and a groupBy, which only amortizes when
    * allPairs·avgSz is large — the [[jaccardPairsBy]] gate decides. */
  private def bitsetAllPairs(ex: DataFrame, freq: DataFrame, nWords: Int,
      theta: Double, useBroadcast: Boolean): DataFrame = {
    val vocab = freq.select(col("g"))
      .withColumn("wid", (row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("g"))) - 1)
        .cast("int"))
    val bitsets = ex.join(broadcast(vocab), "g")
      .groupBy("doc", "sz").agg(collect_list(col("wid")).as("wids"))
      .select(col("doc"), col("sz"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.functions.BitsetFromIds(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("wids")),
            nWords)).as("bs"))
      // both pair-join branches share this exchange (ReuseExchange)
      .transform(Par.spread(_, col("doc")))
    val ba = bitsets.select(col("doc").as("doc_a"), col("sz").as("sza"),
      ceil(lit(theta) * col("sz")).cast("int").as("minsza"), col("bs").as("bsa"))
    val bb = bitsets.select(col("doc").as("doc_b"), col("sz").as("szb"),
      ceil(lit(theta) * col("sz")).cast("int").as("minszb"), col("bs").as("bsb"))
    ba.crossJoin(if (useBroadcast) broadcast(bb) else bb)
      .where(col("doc_a") < col("doc_b") &&
        col("sza") >= col("minszb") && col("szb") >= col("minsza"))
      .withColumn("jaccard", org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.BitsetJaccard(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("bsa")),
          org.apache.spark.sql.graft.ColumnBridge.expression(col("bsb")),
          org.apache.spark.sql.graft.ColumnBridge.expression(col("sza")),
          org.apache.spark.sql.graft.ColumnBridge.expression(col("szb")))))
      .where(col("jaccard") >= theta)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact Jaccard ≥ θ pairs via PPJoin-style prefix filtering: only the
    * (1−θ)·|A|+1 globally-rarest shingles of each doc generate candidates
    * (lossless for J ≥ θ under a shared total order), with a length-ratio
    * conjunct — avoids the Σf² quadratic blow-up on frequent shingles that
    * a plain shingle join suffers on skewed corpora. Verification is the
    * sorted-array merge kernel ([[graft.functions.SortedStringJaccard]]).
    * Output: doc_a < doc_b, jaccard (double, int-ratio exact).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, theta: Double): DataFrame =
    jaccardPairsBy(df, idCol,
      graft.functions.word_shingles(col(textCol), n), theta)

  /** Char-q-gram variant: catches character-level edits (typos, OCR noise)
    * that word shingles miss. Same density-adaptive machinery. */
  def charJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      q: Int, theta: Double): DataFrame =
    jaccardPairsBy(df, idCol,
      graft.functions.char_ngrams(col(textCol), q), theta)

  /** Exact Jaccard ≥ θ pairs over an arbitrary shingle-array column.
    *
    * EAGER: the dense-vs-sparse gate needs corpus statistics (vocabulary
    * size, Σf²), so construction runs one stats job plus a metadata count
    * — `explain` on the result (or PlanAudit) therefore triggers cluster
    * jobs. With `cacheSets` (default) the parsed shingle sets are
    * persisted MEMORY_AND_DISK so the expensive shingle lineage computes
    * once, not once for stats and again at execution. The cache lives in
    * a [[graft.ManagedCache]] slot: re-entering this operator releases
    * the previous call's cached sets, so repeated invocation in a
    * long-lived session holds one cached frame, not an accumulating
    * pile — callers embedding this in a larger cached pipeline can pass
    * `cacheSets = false`. */
  def jaccardPairsBy(df: DataFrame, idCol: String, shingles: Column,
      theta: Double, cacheSets: Boolean = true,
      strategy: JaccardStrategy = JaccardStrategy.Auto): DataFrame = {
    // spread the input rows first so the shingle expression runs
    // post-exchange across cores (shingleSets discipline)
    val setsPlan = Par.spread(df, col(idCol))
      .select(col(idCol).as("doc"), shingles.as("sh"))
      .withColumn("sz", size(col("sh")))
      .where(col("sz") > 0)
    val sets = if (cacheSets)
      graft.ManagedCache.swap("Dedup.jaccardPairsBy", setsPlan)
    else setsPlan
    val ex = sets.select(col("doc"), col("sz"), explode(col("sh")).as("g"))
    // Candidate generation runs on 8-byte shingle HASHES: frequency order
    // and blocking only need a consistent global key, and verification is
    // exact over the true shingle sets — a 64-bit collision costs at most
    // a few extra candidates, never a wrong pair. Shuffling longs instead
    // of shingle strings roughly halves the exchange volume at scale.
    val exh = ex.select(col("doc"), col("sz"), xxhash64(col("g")).as("gh"),
      octet_length(col("g")).as("glen"))
    val freqH = exh.groupBy("gh")
      .agg(count(lit(1)).as("gdf"), min(col("glen")).as("glen"))
    // ONE eager stats job over the hashed shingles; the doc count for the
    // gate heuristic comes from the raw input (a metadata-cheap count —
    // counting docs with zero shingles only overestimates allPairs, which
    // biases the gate toward the conservative sparse path)
    val stats = freqH.agg(count(lit(1)).as("vocab"),
      coalesce(sum(col("gdf") * col("gdf")), lit(0L)).as("sumf2"),
      coalesce(sum(col("gdf")), lit(0L)).as("totinst"),
      coalesce(sum(col("gdf") * col("glen")), lit(0L)).as("instbytes")).head()
    val vocabSize = stats.getLong(0)
    val sumF2 = stats.getLong(1)
    val totInstances = stats.getLong(2)
    val instBytes = stats.getLong(3)
    if (vocabSize == 0) { // no doc produced any shingle — empty result
      return sets.select(col("doc").as("doc_a"), col("doc").as("doc_b"),
        lit(0.0).as("jaccard")).where(lit(false))
    }
    val nDocs = df.count()
    val allPairs = nDocs * math.max(nDocs - 1, 0) / 2
    // estimated in-memory bytes of the sorted shingle-set table (string
    // bytes + 16 B/element array overhead + 48 B/row)
    val setsBytes = instBytes.toDouble + 16.0 * totInstances + 48.0 * nDocs
    // dense corpus: blocking would keep most pairs anyway → all-pairs
    // merge scoring beats candidate generation. Broadcast the set table
    // when it fits (≤256 MB); up to 4 GB fall back to a partitioned
    // cartesian (each task scores one block pair); beyond that the corpus
    // is big enough that candidate generation wins again.
    val dense = setsBytes <= 4e9 && sumF2 / 2 >= allPairs / 4
    // broadcast gate on the HASH table (16 B/element + row overhead) —
    // the hot side carries hashes, not strings
    val hashBytes = 16.0 * totInstances + 48.0 * nDocs
    val avgSz = totInstances.toDouble / math.max(nDocs, 1L)
    val nWords = ((vocabSize + 64 + 63) / 64).toInt
    val bitsetBytes = nDocs.toDouble * nWords * 8
    // Two dense representations, chosen by measured per-pair work:
    // the sorted-hash merge costs ~2·avgSz steps/pair with zero setup;
    // dense bitsets cost vocab/64 words/pair but need a vocabulary id
    // pipeline (window + broadcast join + groupBy). Bitsets win in the
    // heavy-dense regime — large sets over a tiny vocabulary — once
    // total pair work amortizes the setup (measured crossover around
    // allPairs·avgSz ≈ 1e10: char-grams at 100k docs ran 393 s merged
    // vs ~90 s bitset; word-shingles at 5k docs the reverse).
    val bitsetWins = vocabSize <= BitsetVocabMax && bitsetBytes <= 4e9 &&
      nWords * 2 < avgSz && allPairs.toDouble * avgSz >= 1e10
    def runBitset() =
      bitsetAllPairs(ex, ex.groupBy("g").agg(count(lit(1)).as("gdf")),
        nWords, theta, useBroadcast = bitsetBytes <= 256e6)
    def runMerge() =
      hashAllPairs(sets, theta, useBroadcast = hashBytes <= 256e6)
    strategy match {
      case JaccardStrategy.DenseBitset =>
        require(vocabSize <= BitsetVocabMax,
          s"DenseBitset needs vocab <= $BitsetVocabMax, measured $vocabSize")
        runBitset()
      case JaccardStrategy.DenseMerge => runMerge()
      case JaccardStrategy.Auto if dense =>
        if (bitsetWins) runBitset() else runMerge()
      case _ => // Sparse forced, or Auto on a sparse corpus
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc")).orderBy(col("gdf").asc, col("gh").asc)
        val prefix = exh.join(freqH, "gh")
          .withColumn("rnk", row_number().over(w))
          .where(col("rnk") <=
            (col("sz") - ceil(lit(theta) * col("sz")) + 1).cast("int"))
          .select(col("doc"), col("sz"), col("gh"))
        val a = prefix.alias("a")
        val b = prefix.alias("b")
        val cands = a.join(b,
            col("a.gh") === col("b.gh") && col("a.doc") < col("b.doc") &&
              col("a.sz") >= ceil(lit(theta) * col("b.sz")) &&
              col("b.sz") >= ceil(lit(theta) * col("a.sz")))
          .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
          .distinct()
        verifyJaccard(cands, sets, theta)
    }
  }

  /** Near-dup SURVIVORS — the keep-one-per-cluster discipline layered on
    * any pair generator: a row survives iff it is the doc_a-side
    * minimum of every pair it appears in, i.e. NO pair names it as
    * doc_b. (One-shot rule, not connected components and not iterative
    * greedy: in a chain a–b–c with pairs (a,b) and (b,c), both b and c
    * are dropped — c's partner b is gone, but c was still named as a
    * doc_b. Deterministic, and one anti-join instead of an iterative
    * components computation at scale.)
    *
    * @param pairs output of [[jaccardPairs]]/[[minhashLshPairs]]/
    *              [[simhashPairs]]-shaped operators: doc_a < doc_b
    */
  def dropNearDups(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("doc_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Cross-corpus near-dup pairs — DECONTAMINATION: find corpus docs
    * whose shingle sets overlap a (small) reference set, e.g. training
    * documents that leak evaluation benchmarks. The reference side
    * broadcasts (benchmarks are tiny next to a training corpus), so the
    * corpus never shuffles ON A JOIN KEY — no hash co-location is needed
    * for a broadcast join. (The one corpus movement is Par.spread's
    * repartition, there to spread single-file test scans across local
    * cores; on a cluster whose scan is already as wide as the executor
    * count it buys nothing and can be dropped.) The scoring itself is
    * one broadcast nested-loop with the same
    * early-exit sorted-hash prefilter + exact sorted-string verify as
    * [[jaccardPairsBy]], cost |corpus|·|ref| prefilter probes with most
    * pairs bailing in a few comparisons. For a reference set too big to
    * broadcast, block with [[minhashLshPairs]]-style banding instead.
    * Output: corpus_id, ref_id, jaccard (exact). */
  def crossJaccardPairs(corpus: DataFrame, corpusId: String,
      ref: DataFrame, refId: String, shingles: Column,
      theta: Double): DataFrame = {
    def prep(df: DataFrame, id: String, side: String): DataFrame =
      df.select(col(id).as(s"${side}_id"), shingles.as("sh"))
        .where(size(col("sh")) > 0)
        .select(col(s"${side}_id"),
          sort_array(col("sh")).as(s"${side}_sh"),
          sort_array(transform(col("sh"), g => xxhash64(g)))
            .as(s"${side}_hs"),
          size(col("sh")).as(s"${side}_sz"))
    // spread the raw corpus BEFORE prep so the shingle/sort kernels run
    // post-exchange across cores (shingleSets discipline) — and
    // MATERIALIZE the prepped corpus: a stream-side projection adjacent
    // to a nested-loop join defers to the per-build-row loop (the
    // pqTopK/knnpq_fold_r8.txt hazard), re-running shingle+sort+hash
    // once per (corpus × ref) PAIR instead of once per corpus row. The
    // broadcast materializes the ref side the same way.
    val c = graft.ManagedCache.swap("Dedup.crossJaccardPairs.corpus",
      prep(Par.spread(corpus, col(corpusId)), corpusId, "corpus"))
    val r = prep(ref, refId, "ref")
    c.crossJoin(broadcast(r))
      .where(col("corpus_sz") >= ceil(lit(theta) * col("ref_sz")) &&
        col("ref_sz") >= ceil(lit(theta) * col("corpus_sz")) &&
        sortedLongJaccardGECol(col("corpus_hs"), col("ref_hs"), theta))
      .withColumn("jaccard",
        sortedJaccardCol(col("corpus_sh"), col("ref_sh")))
      .where(col("jaccard") >= theta)
      .select(col("corpus_id"), col("ref_id"), col("jaccard"))
  }

  /** Exact anti-join via BLOOM SEMI-JOIN REDUCTION — dedup/decontaminate
    * a corpus against a reference KEY SET in the regime between
    * "broadcast the exact set" (up to ~10⁷ keys) and "full shuffle join"
    * (the fallback beyond ~10⁹): the reference keys aggregate
    * distributively into one Bloom filter (`fpp` at `expectedItems` —
    * ~1.2 GB bits at 10⁹ keys / 1% fpp, still plan-shippable where the
    * exact set long since isn't), every corpus row probes the bits as a
    * codegen predicate (Spark's own `BloomFilterMightContain`, the
    * runtime-filter machinery's expression), and ONLY the might-contain
    * rows — true hits + ~fpp of the rest — reach the verifying anti-join.
    * No false negatives by Bloom's contract, and the verify join removes
    * the false positives, so the output is EXACTLY the plain anti-join
    * (the `c9` oracle asserts that): the Bloom changes cost, never
    * semantics. At 100 TB the corpus-side shuffle shrinks from |corpus|
    * rows to |hits| + fpp·|corpus| — the dominant cost of re-crawl
    * dedup, where hit rates are a few percent.
    *
    * Keys probe as `xxhash64(key)` longs on both sides (the filter's
    * domain); the verify join compares the KEY ITSELF, so an xxhash64
    * collision can cost a verification probe, never a wrong drop.
    * Returns corpus rows whose `key` appears in no ref row. */
  def bloomAntiJoin(corpus: DataFrame, ref: DataFrame, key: Column,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val mightContain = bloomMightContain(ref, key, expectedItems, fpp)
    // definitely-clean rows never see a join; suspects verify on the key
    val clean = corpus.where(!mightContain)
    val verified = corpus.where(mightContain)
      .join(ref.select(key.as("__refk")).distinct(),
        key === col("__refk"), "left_anti")
    clean.unionAll(verified)
  }

  /** Benchmark decontamination by exact word-n-gram overlap — the
    * published "13-gram rule" (GPT-3 appx. C, Brown et al. 2020;
    * PaLM/Llama train-set hygiene use the same shape): flag every
    * training document that shares at least one word n-gram with the
    * evaluation set, reporting how many DISTINCT n-grams it shares.
    * [[crossJaccardPairs]] asks "how similar"; this asks the stricter
    * release question "does any eval span appear verbatim" — a single
    * memorized 13-gram contaminates even at negligible Jaccard.
    *
    * Scale shape: the EVAL side is benchmark-sized (thousands of rows)
    * while the train side is the 100 TB corpus — so the eval side's
    * distinct grams broadcast, and the corpus pays ONE narrow
    * explode + broadcast semi-join, with the only shuffle the per-doc
    * count (output-proportional: contaminated (doc, gram) pairs). The
    * corpus never shuffles its text. Gram sets come from
    * [[graft.functions.word_shingles]] (trim, `\s+` split, distinct),
    * so the overlap count is exact and integer → full DuckDB oracle.
    * Output: doc_id, n_shared_grams (train docs with ≥ 1 shared gram).
    *
    * `gram` selects the denominator: [[GramMode.Words]] slides over
    * whitespace words; [[GramMode.Bpe]] slides over the BPE TOKEN
    * sequence ([[graft.functions.bpe_shingles]], windows crossing word
    * boundaries) — the unit the published rule actually counts (GPT-3
    * counted tokenizer grams). The distinction is not cosmetic: an
    * eval span of fewer than n WORDS has zero word n-grams and sails
    * through Words mode, but its ≥ n BPE tokens still produce interior
    * token grams that Bpe mode catches (DedupSpec pins the shape). */
  def ngramOverlap(train: DataFrame, trainId: String, trainText: String,
      eval: DataFrame, evalText: String, n: Int,
      gram: GramMode = GramMode.Words): DataFrame = {
    require(n >= 1, s"n-gram width must be >= 1, got $n")
    def grams(text: Column): Column = gram match {
      case GramMode.Words => graft.functions.word_shingles(text, n)
      case GramMode.Bpe => graft.functions.bpe_shingles(text, n)
    }
    val evalGrams = eval
      .select(explode(grams(col(evalText))).as("gram"))
      .distinct()
    train
      .select(col(trainId).as("doc_id"),
        explode(grams(col(trainText))).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Gram denominator for [[ngramOverlap]]: whitespace words, or BPE
    * tokens under the fixed [[graft.functions.BpeKernel]] merge
    * table. */
  sealed trait GramMode
  object GramMode {
    case object Words extends GramMode
    case object Bpe extends GramMode
  }

  /** CROSS-corpus containment decontamination — the asymmetric release
    * question between [[ngramOverlap]] ("shares ANY eval gram") and
    * [[crossJaccardPairs]] ("similar to an eval doc"): flag train docs
    * that contain MOST of an eval document, C(e, t) = |grams(e) ∩
    * grams(t)| / |grams(e)| ≥ θ — a benchmark question quoted whole
    * inside a long crawled page has C ≈ 1 while its Jaccard vs the page
    * is negligible and a one-gram overlap threshold drowns in noise.
    * [[containmentPairs]] is the within-corpus sibling; here the small
    * side is ALWAYS the eval doc, so no prefix filter is needed — the
    * eval side is benchmark-sized and BROADCASTS whole.
    *
    * Scale shape: the corpus pays one narrow gram explode + broadcast
    * join (never shuffles its text); the count aggregation is
    * output-proportional (shared (train, eval, gram) triples). Distinct
    * gram sets on both sides make n_shared exact → full DuckDB oracle.
    * Output: (train_doc, eval_doc, n_shared, containment). */
  def crossContainment(train: DataFrame, trainId: String,
      trainText: String, eval: DataFrame, evalId: String,
      evalText: String, n: Int, theta: Double): DataFrame = {
    require(n >= 1, s"n-gram width must be >= 1, got $n")
    require(theta > 0.0 && theta <= 1.0,
      s"theta must be in (0, 1]: $theta")
    val eg = eval
      .select(col(evalId).as("eval_doc"),
        graft.functions.word_shingles(col(evalText), n).as("sh"))
      .withColumn("sz", size(col("sh")))
      .where(col("sz") > 0)
      .select(col("eval_doc"), col("sz"), explode(col("sh")).as("gram"))
    val tg = train
      .select(col(trainId).as("train_doc"),
        explode(graft.functions.word_shingles(col(trainText), n))
          .as("gram"))
    tg.join(broadcast(eg), "gram")
      .groupBy("train_doc", "eval_doc", "sz")
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("containment",
        col("n_shared").cast("double") / col("sz"))
      .where(col("containment") >= theta)
      .select(col("train_doc"), col("eval_doc"), col("n_shared"),
        col("containment"))
  }

  /** CROSS-corpus SEMANTIC (paraphrase-level) decontamination — the
    * case every token-overlap decontam operator provably misses: a
    * REWORDED benchmark item shares no 13-gram with its source
    * ([[ngramOverlap]] sees nothing), contains none of it
    * ([[crossContainment]] sees nothing), and its shingle Jaccard is
    * noise ([[crossJaccardPairs]]) — yet its term BAG barely moves, so
    * its TF-IDF vector stays (near-)identical. Flags train docs whose
    * exact cosine against ANY eval item reaches θ. This is the
    * "semantic decontamination" section of every modern data card
    * (reference intent: the audit-completeness framing of
    * `/root/reference/project_report.md` §conclusions).
    *
    * Inputs are SPARSE unit vectors in the [[graft.operators
    * .TextSearch.hashingTfIdf]] triple shape (doc, bucket, weight),
    * both corpora embedded under ONE shared fit (IDF must weigh both
    * sides identically or cosines are not comparable — the caller
    * unions the corpora before vectorizing, c28's composition). The
    * unit-norm contract makes the bucket-join dot product the cosine;
    * round-6 BEFORE thresholding so the θ decision replays across
    * engines (the h1/h2 discipline — reduction-order ulps cannot flip
    * a flag).
    *
    * Scale shape: the eval side is benchmark-sized by contract and
    * BROADCASTS whole (the [[crossContainment]] stance); the corpus
    * pays one bucket-keyed map-side join + a (train, eval) partial
    * aggregation — it never shuffles. At gate dim (64) the triples are
    * dense-equivalent; a 100 TB deployment raises dim to 2^18+ where
    * hashed TF-IDF triples are genuinely sparse and the bucket join
    * prunes to truly-shared terms. When the eval side outgrows a
    * broadcast, the SAME vectors feed [[crossCosinePairsLsh]] (banded
    * candidates, exact verify) with this exact join as the oracle-able
    * baseline.
    *
    * `maxBucketOcc` is the hot-bucket valve (the [[sharedSpans]]
    * `maxGramOcc` discipline, VERDICT r16 task 1a) — the bucket join's
    * output is Σ_buckets |train∩b|·|eval∩b|, which degenerates toward
    * |train|·|eval| whenever one bucket is corpus-hot (the stopword
    * bucket every document posts into). Buckets whose TRAIN-side
    * occupancy exceeds the ceiling are dropped from the join (tiny hot
    * set by construction → broadcast anti-join). RECALL CONTRACT,
    * monotone: the valved dot product sums a SUBSET of each pair's
    * shared-bucket terms and both vectors stay unit-normalized over ALL
    * buckets, so valved cosine ≤ exact cosine — the valve can only
    * LOSE flags past θ, never invent one; output equals the exact
    * operator run over the postings with hot buckets deleted
    * (spec-pinned, DedupSpec). What is lost is exactly the pairs whose
    * θ-mass rides corpus-hot coordinates — and corpus-wide stopword
    * mass is not a paraphrase signal (TF-IDF already drives those
    * weights toward the floor; a pair ALL of whose shared buckets are
    * hot is invisible). Default ON at 2^16: at production scale only
    * stopword-grade buckets (shared by > 65k train docs) hit the
    * ceiling, while every gate corpus sits far below it, so the gate
    * oracle is the UNVALVED exact semantics verbatim. Output:
    * (train_doc, eval_doc, cosine ≥ θ). */
  def crossCosinePairs(train: DataFrame, eval: DataFrame,
      theta: Double,
      maxBucketOcc: Long = CrossCosineMaxBucketOcc): DataFrame = {
    require(theta > 0.0 && theta <= 1.0,
      s"theta must be in (0, 1]: $theta")
    require(maxBucketOcc >= 1, s"maxBucketOcc must be >= 1: $maxBucketOcc")
    val tr = train.select(col("doc").as("train_doc"), col("bucket"),
      col("weight").as("__wt"))
    val ev = eval.select(col("doc").as("eval_doc"), col("bucket"),
      col("weight").as("__we"))
    val trKept =
      if (maxBucketOcc == Long.MaxValue) tr
      else {
        // (doc, bucket) is unique in the TF-IDF triple shape, so the
        // plain count IS the per-bucket train occupancy
        val hot = tr.groupBy("bucket")
          .agg(count(lit(1)).as("__occ"))
          .where(col("__occ") > maxBucketOcc)
          .select(col("bucket"))
        hotAntiJoin(tr, hot, Seq("bucket"), "crossCosinePairs")
      }
    trKept.join(broadcast(ev), "bucket")
      .groupBy("train_doc", "eval_doc")
      .agg(round(sum(col("__wt") * col("__we")), 6).as("cosine"))
      .where(col("cosine") >= theta)
  }

  /** Default train-side bucket-occupancy ceiling for
    * [[crossCosinePairs]]: 65,536 documents. A term bucket this hot is
    * stopword-grade boilerplate at any production corpus size (its
    * +1-smoothed IDF weight is near the floor), while the gate corpora
    * (≤ 5k docs) never reach it — the valve is live at scale and
    * provably inert on the oracle. */
  val CrossCosineMaxBucketOcc: Long = 1L << 16

  /** APPROXIMATE cross-corpus semantic decontamination — the declared
    * beyond-broadcast path for [[crossCosinePairs]] (VERDICT r16 task
    * 1b), now gated with its recall contract (`c30`): when the exact
    * bucket join's Σ|train∩b|·|eval∩b| pair mass is the wall, band the
    * SAME TF-IDF vectors with `tables` independent `bits`-bit
    * random-hyperplane signatures ([[AnnSearch.lshNearDupPairs]]'s
    * machinery over [[graft.functions.VectorFunctions
    * .hyperplaneSignatureRange]]'s shared deterministic family) and
    * verify every banded candidate with the EXACT round-6 cosine.
    *
    * PRECISION is exact by construction (verification recomputes the
    * full-vector dot product and applies the same round-6 θ decision),
    * so output ⊆ the exact operator's pairs; RECALL is the banding
    * miss rate — two vectors at cosine c collide in one table with
    * probability (1 − acos(c)/π)^bits, across any of `tables`. At the
    * c28 parameterization the gate holds recall ≥ 0.7 against the
    * exact flags IN-PLAN (the a5/a11 discipline), and a paraphrase
    * pair at cosine ≈ 1 is caught almost surely (identical vectors
    * share every signature).
    *
    * Scale shape: candidates are (tbl, sig)-bucket collisions — never
    * all pairs; the eval side (sigs + sparse vector) broadcasts; the
    * train corpus pays one doc-keyed sparse aggregation + `tables`
    * signature evaluations, no corpus self-shuffle. Everything stays
    * SPARSE end-to-end (ADVICE r17): each doc travels as its sorted
    * (buckets, weights) arrays — O(nnz) per row — never a dim-length
    * densified vector, so the operator's beyond-broadcast regime
    * (production dim 2^18+, docs ~100-sparse) ships ~1.6 KB/doc
    * through the signature join instead of ~2 MB. Signatures and the
    * verify dot are bit-identical to the dense formulation they
    * replaced ([[graft.functions.SparseVecKernel]]'s parity contract,
    * SparseVecSpec), so the banding decisions — and c30's pinned
    * recall row — are unchanged. Verification cost is collision-count
    * × one codegen'd [[graft.functions.SparseDot]] merge.
    * Inputs are the [[graft.operators.TextSearch.hashingTfIdf]] triple
    * shape under ONE shared fit (the [[crossCosinePairs]] contract);
    * `dim` must be the fit's dim (asserted per bucket — a mismatched
    * fit must raise, not band wrong vectors). Output: (train_doc,
    * eval_doc, cosine ≥ θ) — [[crossCosinePairs]]'s shape. */
  def crossCosinePairsLsh(train: DataFrame, eval: DataFrame,
      theta: Double, dim: Int, bits: Int = 10,
      tables: Int = 12): DataFrame = {
    require(theta > 0.0 && theta <= 1.0,
      s"theta must be in (0, 1]: $theta")
    require(bits >= 1 && bits <= 20 && tables >= 1,
      s"need 1 <= bits <= 20, tables >= 1: bits=$bits tables=$tables")
    val trd = sparseDocVectors(train, dim, "crossCosinePairsLsh")
      .toDF("train_doc", "__tb", "__tw")
      .withColumn("__bk", explode(
        AnnSearch.sparseTableSigs(col("__tb"), col("__tw"), bits, tables)))
      .select(col("train_doc"), col("__tb"), col("__tw"),
        col("__bk.tbl").as("__tbl"), col("__bk.sig").as("__sig"))
    val evd = sparseDocVectors(eval, dim, "crossCosinePairsLsh")
      .toDF("eval_doc", "__eb", "__ew")
      .withColumn("__bk", explode(
        AnnSearch.sparseTableSigs(col("__eb"), col("__ew"), bits, tables)))
      .select(col("eval_doc"), col("__eb"), col("__ew"),
        col("__bk.tbl").as("__tbl"), col("__bk.sig").as("__sig"))
    // exact verify INSIDE the collision output, before the pair-dedup
    // shuffle (the lshNearDupPairs shape); unit-norm inputs make the
    // dot product the cosine, round-6 BEFORE θ — the same decision the
    // exact operator replays. The signature join is UNHINTED (the d16
    // lesson): this path exists precisely for the regime where the
    // eval side outgrows a broadcast, so AQE broadcasts a small eval
    // frame at runtime and falls back to a (tbl, sig)-keyed shuffle
    // join when it is not — the exact operator keeps the broadcast
    // stance because its contract pins the eval side benchmark-sized.
    trd.join(evd, Seq("__tbl", "__sig"))
      .select(col("train_doc"), col("eval_doc"),
        round(graft.functions.VectorFunctions.sparseDot(
          col("__tb"), col("__tw"), col("__eb"), col("__ew")),
          6).as("cosine"))
      .where(col("cosine") >= theta)
      .dropDuplicates("train_doc", "eval_doc")
  }

  /** One row per doc of a TF-IDF triple frame, as the sorted sparse
    * parallel-array shape the sparse kernels consume: (doc, buckets
    * array<long> ascending, weights array<double> aligned). The `dim`
    * guard is the FIT contract: a bucket outside [0, dim) means the
    * caller mixed vectorizer fits, which must raise, never band or
    * verify wrong cosines. */
  private[graft] def sparseDocVectors(triples: DataFrame, dim: Int,
      ctx: String): DataFrame =
    triples.select(col("doc"),
        when(col("bucket") < 0 || col("bucket") >= dim,
          raise_error(concat(lit(s"$ctx: bucket "),
            col("bucket").cast("string"),
            lit(s" outside [0, $dim) — dim must match the "),
            lit("hashingTfIdf fit")))).otherwise(col("bucket"))
          .cast("long").as("bucket"),
        col("weight").cast("double").as("weight"))
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(struct(col("bucket"), col("weight"))))
        .as("__e"))
      .select(col("doc"),
        col("__e.bucket").as("buckets"), col("__e.weight").as("weights"))

  /** AUTO-DISPATCH between the exact ([[crossCosinePairs]]) and banded
    * ([[crossCosinePairsLsh]]) semantic-decontam shapes — the
    * [[AnnSearch.knnJoin]] declared-budget discipline applied here
    * (VERDICT r17 task 3): the exact operator's one non-negotiable is
    * that the EVAL side broadcasts whole (its triples feed a map-side
    * bucket join), so estimate that broadcast — eval triple count ×
    * ~40 B/triple (doc + bucket + weight + row overhead) — against the
    * session's `autoBroadcastJoinThreshold` and dispatch: under it,
    * the exact bucket join (no shuffle, no recall loss); past it, the
    * banded path (signature collisions + exact verify, the only shape
    * that scales once benchmarks outgrow a broadcast). The threshold
    * is the session's DECLARED budget, so the dispatch is portable to
    * a real cluster rather than tuned to local[32]; a disabled
    * threshold (≤ 0) always takes the banded shape. `evalTriplesHint`
    * skips the count when the caller already knows it (catalog stats,
    * a materialized frame). Both branches emit (train_doc, eval_doc,
    * cosine ≥ θ); the banded branch is output-⊆-exact with the c30
    * recall contract. */
  def crossCosineAuto(train: DataFrame, eval: DataFrame, theta: Double,
      dim: Int, bits: Int = 10, tables: Int = 12,
      maxBucketOcc: Long = CrossCosineMaxBucketOcc,
      evalTriplesHint: Long = -1L): DataFrame = {
    val threshold =
      train.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val n = if (evalTriplesHint >= 0) evalTriplesHint else eval.count()
    if (crossCosineBroadcastFits(n, threshold))
      crossCosinePairs(train, eval, theta, maxBucketOcc)
    else crossCosinePairsLsh(train, eval, theta, dim, bits, tables)
  }

  /** The [[crossCosineAuto]] decision rule, exposed for the spec: does
    * the eval side's triple frame fit the session's declared broadcast
    * budget? ~40 B/triple: 8 (doc) + 8 (bucket) + 8 (weight) + ~16 row
    * overhead in the broadcast hash relation. */
  private[graft] def crossCosineBroadcastFits(evalTriples: Long,
      threshold: Long): Boolean =
    threshold > 0 && evalTriples * 40L <= threshold

  /** Exact-substring shared spans — the dedup criterion of Lee et al.
    * 2021 ("Deduplicating Training Data Makes Language Models Better",
    * public), which removes VERBATIM repeated spans of ≥ L tokens
    * across documents (their threshold: 50 BPE tokens; word-token L
    * here). The published implementation builds a corpus-wide suffix
    * array — inherently sequential state. This is the distributed
    * seed-and-extend formulation of the same criterion: any shared
    * span of length s ≥ L contains exactly s − L + 1 of its L-gram
    * seeds at CONSECUTIVE positions in both documents, so
    *  1. seed: positional L-grams ([[graft.functions
    *     .word_shingles_all]] + posexplode, one narrow pass) self-join
    *     on the gram — the only corpus-sized shuffle, proportional to
    *     seed MATCHES, not pairs of documents;
    *  2. extend: matches sharing a (doc_a, doc_b) DIAGONAL (pos_a −
    *     pos_b) are consecutive iff their positions are consecutive —
    *     the classic run-length grouping (pos − row_number) merges each
    *     run in one window pass, recovering the MAXIMAL span exactly:
    *     a run of c seeds is a shared span of c + L − 1 tokens.
    * Deterministic integers end-to-end → hash-exact DuckDB oracle.
    *
    * Scale notes (the two hardened behaviors, VERDICT r9 task 1):
    *  - the self-join keys on `xxhash64(gram)` — 8 bytes — never the
    *    raw L-word string, so the only corpus-sized shuffle carries
    *    ~8 B/seed instead of the ~L·avg-word bytes the string key
    *    would (measured at L=13: ×15.6 per key, ×5.2 total seed-join
    *    shuffle write — 868→168 MiB on the 100k-doc canary corpus,
    *    tools/spanpayload_r10.txt). A 64-bit collision
    *    (~n²/2⁶⁵ for n distinct grams — < 1e-7 even at 10¹² grams)
    *    can at worst seed one phantom single-seed span or extend a
    *    run by one; callers needing certainty re-verify survivors
    *    against the text (the [[bloomAntiJoin]] discipline).
    *  - `maxGramOcc` is the hot-gram valve, the analogue of
    *    SimilarityJoin's token-salt budget: a gram occurring f_a
    *    times in doc A and f_b in doc B seeds f_a·f_b matches, so
    *    corpus-hot boilerplate (license headers shared by millions
    *    of docs, degenerate "a a a …" text) makes the seed join
    *    quadratic. With the ceiling set, grams whose TOTAL corpus
    *    occurrence count exceeds it are dropped before the join
    *    (heavy-hitter set is small by construction → broadcast
    *    anti-join; the counting pass is map-side-combined). RECALL
    *    CONTRACT: output is exactly what the un-ceilinged operator
    *    would report on the corpus with hot-gram seeds deleted — a
    *    span all of whose L-gram seeds are hot disappears entirely
    *    (that is the point: corpus-wide boilerplate is not a
    *    doc-pair duplication signal), and a span with hot INTERIOR
    *    seeds is reported as its surviving fragments (each still
    *    ≥ minLen by the run-length arithmetic). Default disabled
    *    (Long.MaxValue): results are then the exact Lee et al.
    *    criterion, and seed matching at production L (13–50) is
    *    sparse on deduplicated natural text (the c10 measurement:
    *    zero shared 13-grams across 500 docs).
    * Output: doc_a < doc_b, start_a, start_b (token positions),
    * span_len (tokens, ≥ minLen). */
  def sharedSpans(df: DataFrame, idCol: String, textCol: String,
      minLen: Int, maxGramOcc: Long = Long.MaxValue): DataFrame = {
    require(minLen >= 1, s"minimum span length must be >= 1, got $minLen")
    require(maxGramOcc >= 2,
      s"maxGramOcc < 2 would drop every matchable gram, got $maxGramOcc")
    val grams = df
      .select(col(idCol).as("doc"),
        posexplode(graft.functions.word_shingles_all(col(textCol), minLen))
          .as(Seq("pos", "gram")))
      .select(col("doc"), col("pos"), xxhash64(col("gram")).as("gh"))
    val kept =
      if (maxGramOcc == Long.MaxValue) grams
      else {
        // heavy hitters only: the frame is normally tiny (grams ABOVE
        // the ceiling), and the count itself is one map-side-combined
        // aggregation over 8-byte keys; the broadcast is size-guarded
        // because "tiny" is caller-controlled (see [[hotAntiJoin]])
        val hot = grams.groupBy(col("gh"))
          .agg(count(lit(1)).as("__occ"))
          .where(col("__occ") > maxGramOcc)
          .select(col("gh"))
        hotAntiJoin(grams, hot, Seq("gh"), "sharedSpans")
      }
    val a = kept.select(col("doc").as("doc_a"), col("pos").as("pos_a"),
      col("gh"))
    val b = kept.select(col("doc").as("doc_b"), col("pos").as("pos_b"),
      col("gh"))
    val seeds = a.join(b, "gh").where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pos_a"), col("pos_b"))
    seeds
      .withColumn("__grp", col("pos_a") - row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_a"), col("doc_b"),
            col("pos_a") - col("pos_b")).orderBy(col("pos_a"))))
      .groupBy(col("doc_a"), col("doc_b"),
        (col("pos_a") - col("pos_b")).as("__diag"), col("__grp"))
      .agg(min(col("pos_a")).as("start_a"), min(col("pos_b")).as("start_b"),
        (count(lit(1)) + minLen - 1).as("span_len"))
      .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"),
        col("span_len"))
  }

  /** The REMOVAL action of Lee et al. 2021 over [[sharedSpans]]: their
    * pipeline doesn't just detect verbatim repeated spans ≥ L tokens,
    * it CUTS every duplicated occurrence except one from the training
    * text. Deterministic survivor policy (the codebase's min-id
    * discipline): for every reported span the doc_a (smaller-id)
    * occurrence is the canonical copy and the doc_b token interval
    * `[start_b, start_b + span_len)` is removed; a doc's intervals
    * from ALL its pairings apply together (overlaps union naturally —
    * a token is dropped if ANY interval covers it).
    *
    * Output: idCol, text_clean (surviving tokens joined by single
    * spaces — token surgery normalizes whitespace for every doc, cut
    * or not, so the result is engine-replayable), n_removed_tokens.
    * Scale shape: [[sharedSpans]]'s cost plus one doc-keyed
    * `collect_list` of the (tiny) interval set and a narrow per-row
    * filter — the interval check is len(tokens)·|intervals| per doc,
    * and intervals are few by the span-merging arithmetic. Integer
    * positions + pure string surgery → hash-exact DuckDB oracle. */
  def removeSharedSpans(df: DataFrame, idCol: String, textCol: String,
      minLen: Int, maxGramOcc: Long = Long.MaxValue): DataFrame = {
    val spans = sharedSpans(df, idCol, textCol, minLen, maxGramOcc)
    val cuts = spans.groupBy(col("doc_b"))
      .agg(collect_list(array(col("start_b").cast("long"),
        col("span_len"))).as("__ivs"))
    // NULL text participates in the whitespace-normalization contract
    // like empty text (the t12 coalesce discipline): ('', 0), not
    // (NULL, NULL) — NULL would otherwise propagate through trim/split
    val txt = coalesce(col(textCol), lit(""))
    val toks = when(length(trim(txt)) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(txt), "\\s+"))
    df.join(cuts, col(idCol) === cuts("doc_b"), "left")
      .withColumn("__toks", toks)
      .withColumn("__kept", filter(col("__toks"),
        (_, i) => coalesce(
          !exists(col("__ivs"),
            iv => i.cast("long") >= iv.getItem(0) &&
              i.cast("long") < iv.getItem(0) + iv.getItem(1)),
          lit(true))))
      .select(col(idCol),
        array_join(col("__kept"), " ").as("text_clean"),
        (size(col("__toks")) - size(col("__kept"))).cast("long")
          .as("n_removed_tokens"))
  }

  /** Anti-join `big` against a heavy-hitter frame of hash keys, with
    * the broadcast SIZE-GUARDED instead of assumed: the hot set is
    * "small by construction" only for sane ceilings — a caller passing
    * a low `maxGramOcc`/`maxDocFreq` on a highly repetitive corpus makes
    * it corpus-scale, and a forced `broadcast()` hint is mandatory to
    * the planner, so it would OOM the driver.
    *
    * The guard costs NO extra job (VERDICT r11 task 2 — the r11 shape
    * ran an eager `count()` plus a persist per call, ~0.3–0.4 s at
    * bench scale): a broadcast must collect the hot rows to the driver
    * anyway, so the guard IS that collect, capped — fetch at most
    * `cap + 1` rows (`cap` = `autoBroadcastJoinThreshold` over the
    * bytes-per-row implied by the KEY SCHEMA (×2 row overhead — the
    * measured ~16 B for an 8-byte hash key, now generalized to wide
    * keys per ADVICE r11), so a wide-key reuse cannot sneak a
    * threshold-busting set past a row-count check). Within the cap, the
    * collected rows become a broadcast local relation: the join does
    * zero hot-side work. Past it — or with broadcasting disabled
    * (threshold ≤ 0, where the probe is skipped entirely) — the join
    * falls back to the shuffled left_anti: the probe side then
    * exchanges on the hash key too (the unavoidable cost of a hot set
    * too large to replicate), AQE re-plans from runtime sizes, and the
    * hot aggregation is recomputed inside the join (one extra pass,
    * accepted on this rare hostile-ceiling path in exchange for the
    * common path's saved job + persist). */
  private def hotAntiJoin(big: DataFrame, hot: DataFrame,
      keys: Seq[String], slot: String): DataFrame = {
    val spark = big.sparkSession
    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    val rowBytes =
      2L * math.max(8, hot.schema.map(_.dataType.defaultSize).sum)
    val cap = if (threshold > 0)
      math.min(math.max(1L, threshold / rowBytes), Int.MaxValue - 2L).toInt
    else 0
    val probe =
      if (cap > 0) hot.limit(cap + 1).collect() else Array.empty[Row]
    if (cap > 0 && probe.length <= cap) {
      import scala.jdk.CollectionConverters._
      val local = spark.createDataFrame(probe.toSeq.asJava, hot.schema)
      big.join(broadcast(local), keys, "left_anti")
    } else big.join(hot, keys, "left_anti")
  }

  /** Corpus-level repeated-UNIT removal — the line-dedup stage of the
    * MassiveText/RefinedWeb pipelines (Rae et al. 2021 §A.1.2 remove
    * documents' repeated lines; Penedo et al. 2023 dedup lines across
    * the corpus), generalized to any unit column: given an exploded
    * (doc, position, unit) frame, drop every occurrence of a unit
    * whose corpus-wide DOCUMENT frequency exceeds `maxDocFreq` —
    * boilerplate navigation bars, cookie banners, license footers
    * appear verbatim in many documents and are removed from ALL of
    * them (corpus-wide boilerplate is not content; the d10/d11 span
    * machinery handles pairwise duplication where one canonical copy
    * should survive).
    *
    * Scale shape: document frequencies are counted on `xxhash64(unit)`
    * — never the raw unit text — so the DISTINCT (unit, doc) pairs the
    * `countDistinct` shuffles are ~16 B rows instead of the 50–500 B a
    * line/chunk string key would carry (the same key discipline as
    * [[sharedSpans]]'s seeds, measured there at ×15.6 per key; A/B for
    * this operator in tools/unitpayload_r11.txt). Units ABOVE the
    * ceiling are the corpus's boilerplate vocabulary — normally few —
    * so the removal is a broadcast anti-join on the 8-byte hash, with
    * the broadcast size-guarded by [[hotAntiJoin]] for hostile
    * ceilings. The corpus never shuffles its unit text: the df pass
    * exchanges hashed pairs and the anti-join replicates the hot hashes
    * (only the guarded corpus-scale-hot fallback exchanges unit rows,
    * keyed on the hash). A 64-bit hash
    * collision (~n²/2⁶⁵ across distinct units) can at worst delete an
    * innocent unit that collides with a hot one or nudge one df count;
    * callers needing certainty re-verify against the text (the
    * [[bloomAntiJoin]] discipline). Returns the kept rows of `units`
    * unchanged; callers reassemble documents by grouping on position
    * order. */
  def dropRepeatedUnits(units: DataFrame, docCol: String, unitCol: String,
      maxDocFreq: Long): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val hashed = units.withColumn("__uh", xxhash64(col(unitCol)))
    val hot = hashed.groupBy(col("__uh"))
      .agg(countDistinct(col(docCol)).as("__df"))
      .where(col("__df") > maxDocFreq)
      .select(col("__uh"))
    hotAntiJoin(hashed, hot, Seq("__uh"), "dropRepeatedUnits").drop("__uh")
  }

  /** The probe predicate of [[bloomAntiJoin]], standalone: aggregates
    * `ref`'s `xxhash64(key)`s into a Bloom filter (distributive
    * partition-merge, `sketch.BloomFilter`) and returns a codegen
    * might-contain predicate over the same hash (Spark's own
    * `BloomFilterMightContain` — the runtime-filter expression — with
    * the frozen bits as a binary literal). False → key DEFINITELY not in
    * ref; true → verify. Usable alone as a pre-shuffle row filter (the
    * runtime-filter pattern, but against a persisted/cross-job set). */
  def bloomMightContain(ref: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Column = {
    val bloom = ref.select(xxhash64(key).as("__k"))
      .stat.bloomFilter("__k", expectedItems, fpp)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(bytes,
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.graft.ColumnBridge.expression(xxhash64(key))))
  }

  /** MinHash signature column: array of `numHashes` min-hashes of the
    * shingle set, using xxhash64(seed_i, shingle). Empty sets get
    * Long.MaxValue sentinels (never collide with real buckets).
    * Single compiled pass; hash-identical to the
    * `transform(sequence(…), i => array_min(transform(sh, g =>
    * xxhash64(i, g))))` formulation it replaced — including NULL input
    * arrays mapping to the all-sentinel signature (the kernel expression
    * alone null-propagates; the coalesce restores the old contract). */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    coalesce(graft.functions.minhash_sig(sh, numHashes),
      typedLit(Array.fill(numHashes)(Long.MaxValue)))

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification.
    *
    * @param numHashes signature length (bands * rowsPerBand)
    * @param rowsPerBand rows per LSH band
    * @param theta final exact-Jaccard threshold
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int, theta: Double): DataFrame =
    minhashPairsFromSets(minhashSets(df, idCol, textCol, n, numHashes),
      rowsPerBand, theta)

  /** The signature half of [[minhashLshPairs]]: per-doc (doc, sh, sig)
    * rows — shingle set plus MinHash signature. Deterministic per
    * document, which is what makes the frame PERSISTABLE: an incremental
    * refresh ([[SilverIndex.refreshMinhash]]) computes this only for new
    * doc ids and appends, and the union is row-identical to a from-
    * scratch build. */
  def minhashSets(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame =
    // shingleSets already ends in a repartition-by-doc exchange; the
    // single-pass signature kernel computes there directly
    shingleSets(df, idCol, textCol, n)
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

  /** The banding half of [[minhashLshPairs]], runnable from a LIVE
    * [[minhashSets]] frame or a persisted signature table (the signature
    * length is `size(sig)` — not re-derived — so a stored index carries
    * its own configuration). */
  def minhashPairsFromSets(sets: DataFrame, rowsPerBand: Int,
      theta: Double): DataFrame = {
    val banded = bandKeys(sets, rowsPerBand)
    val a = banded.alias("a")
    val b = banded.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()

    verifyJaccard(candidates, sets.select(col("doc"), col("sh")), theta)
  }

  /** The LSH band keys of a signature frame: one (doc, band, bucket)
    * row per band. Band count comes from the data, not a parameter:
    * banding a stored index with a mismatched numHashes would silently
    * change recall. Band key = (band index, hash of the band's
    * signature slice); band rows carry ids only — shingle arrays rejoin
    * at verification. */
  private def bandKeys(sets: DataFrame, rowsPerBand: Int): DataFrame = {
    val numBands = (size(col("sig")) / rowsPerBand).cast("int")
    sets.select(col("doc"),
      posexplode(transform(
        sequence(lit(0), numBands - 1), b =>
          xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** [[minhashPairsFromSets]] restricted to pairs INVOLVING a delta:
    * candidates between `newIds` docs and the FULL signature frame
    * (both orientations, canonicalized to doc_a < doc_b), then the same
    * exact-Jaccard verification. This is the per-micro-batch kernel of
    * STREAMING near-dup maintenance: run against the post-append
    * signature table with the batch's genuinely-new ids, every near-dup
    * pair is emitted exactly once — in the batch where its later-
    * arriving member lands (old–old pairs were emitted in an earlier
    * batch; new–new pairs collapse under the canonicalized distinct).
    * Union over batches ≡ the from-scratch [[minhashPairsFromSets]]
    * output. At scale the all-docs band side comes from the persisted
    * signature table (band keys are per-doc deterministic, so a
    * deployment can persist them append-only alongside the signatures);
    * the join cost is ∝ bucket collisions with the delta, never the
    * corpus pair space. */
  def minhashPairsDelta(sets: DataFrame, newIds: DataFrame,
      rowsPerBand: Int, theta: Double): DataFrame = {
    val banded = bandKeys(sets, rowsPerBand)
    val fresh = banded.join(
      newIds.select(col(newIds.columns.head).as("doc")), Seq("doc"),
      "left_semi")
    val candidates = banded.alias("a").join(fresh.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") =!= col("b.doc"))
      .select(least(col("a.doc"), col("b.doc")).as("doc_a"),
        greatest(col("a.doc"), col("b.doc")).as("doc_b"))
      .distinct()
    verifyJaccard(candidates, sets.select(col("doc"), col("sh")), theta)
  }

  /** 64-bit SimHash per document over distinct word n-gram shingles
    * (n=1 → plain tokens; n≥2 captures ordering like the Jaccard ops).
    * One compiled pass per document ([[graft.functions.TextKernel
    * .simhash64]]) — bit-identical to, and shuffle-free unlike, the
    * explode + 64-column ±1 vote aggregation it replaced. */
  def simhashDocs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2): DataFrame =
    shingleSets(df, idCol, textCol, shingleN)
      .where(size(col("sh")) > 0) // parity: explode+groupBy dropped empty docs
      .select(col("doc"), graft.functions.simhash64(col("sh")).as("simhash"))

  /** SimHash near-dup pairs within Hamming distance `maxDist`, found via
    * pigeonhole banding into `maxDist + 1` chunks. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, shingleN: Int = 2): DataFrame =
    hammingPairs(simhashDocs(df, idCol, textCol, shingleN), maxDist)

  /** The pigeonhole-banding half of [[simhashPairs]], runnable over ANY
    * 64-bit signature frame (doc, simhash) — text SimHashes, perceptual
    * frame fingerprints ([[Multimodal.dhashFingerprint]]), any keyed
    * bit-signature. Two signatures within Hamming distance `maxDist`
    * must agree EXACTLY on at least one of `maxDist + 1` disjoint bit
    * chunks (pigeonhole), so the join keys on (chunk, chunk-value)
    * buckets and never goes all-pairs; the exact Hamming bound filters
    * inside the codegen'd join condition. */
  def hammingPairs(docs: DataFrame, maxDist: Int): DataFrame = {
    val numChunks = maxDist + 1
    val chunkBits = 64 / numChunks
    // chunkBits = 64 (maxDist = 0) would shift-wrap the mask to 0 and
    // send every doc to one bucket — use the full signature as the key
    val chunkMask = if (chunkBits >= 64) -1L else (1L << chunkBits) - 1
    val chunked = docs.select(col("doc"), col("simhash"),
      posexplode(array((0 until numChunks).map { c =>
        shiftrightunsigned(col("simhash"), c * chunkBits)
          .bitwiseAND(lit(chunkMask))
      }: _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "ckey")
    val a = chunked.alias("a")
    val b = chunked.alias("b")
    // hamming filter INSIDE the join condition: buckets are coarse (2^chunkBits
    // per chunk), so at scale most bucket-collision pairs fail the distance
    // bound — rejecting them in the codegen'd join output beats shuffling
    // the full candidate set through the pair-dedup (measured at 100k docs:
    // 155M candidate rows, 68 s → 4 s)
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        col("a.doc") < col("b.doc") &&
        graft.functions.TextFunctions.hamming64(
          col("a.simhash"), col("b.simhash")) <= maxDist)
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        graft.functions.TextFunctions.hamming64(
          col("a.simhash"), col("b.simhash")).cast("int").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Incremental face of [[hammingPairs]] (the [[minhashPairsDelta]]
    * discipline for 64-bit signature frames): pairs within `maxDist`
    * where AT LEAST ONE side is in `newIds` — what a streaming refresh
    * emits for an arriving batch so every pair surfaces exactly once
    * across the feed's lifetime (old↔old pairs were emitted by the
    * batches that introduced them). One side of the pigeonhole-bucket
    * join is the new slice (batch-sized); the full side never
    * self-joins. Pairs are canonicalized (least, greatest) so a
    * new↔new pair appears once. */
  def hammingPairsDelta(docs: DataFrame, newIds: DataFrame,
      maxDist: Int): DataFrame = {
    val numChunks = maxDist + 1
    val chunkBits = 64 / numChunks
    val chunkMask = if (chunkBits >= 64) -1L else (1L << chunkBits) - 1
    val chunked = docs.select(col("doc"), col("simhash"),
      posexplode(array((0 until numChunks).map { c =>
        shiftrightunsigned(col("simhash"), c * chunkBits)
          .bitwiseAND(lit(chunkMask))
      }: _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "ckey")
    val fresh = chunked.join(
      newIds.select(col(newIds.columns.head).as("doc")), Seq("doc"),
      "left_semi")
    chunked.alias("a").join(fresh.alias("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.ckey") === col("b.ckey") &&
          col("a.doc") =!= col("b.doc") &&
          graft.functions.TextFunctions.hamming64(
            col("a.simhash"), col("b.simhash")) <= maxDist)
      .select(least(col("a.doc"), col("b.doc")).as("doc_a"),
        greatest(col("a.doc"), col("b.doc")).as("doc_b"),
        graft.functions.TextFunctions.hamming64(
          col("a.simhash"), col("b.simhash")).cast("int").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** All single-character deletions of `s` (the symmetric-delete
    * neighborhood's generator) — pure built-ins, no UDF: one
    * transform over the character positions. Empty strings have no
    * deletions (and sequence(1, 0) would flip to a DESCENDING range —
    * hence the guard, spec-pinned). */
  private def deletions(s: Column): Column =
    when(length(s) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s), lit(1)),
        i => concat(s.substr(lit(1), i - 1),
          s.substr(i + 1, length(s) - i))))

  /** EDIT-DISTANCE pair finder over short keys (titles, names, codes)
    * — the entity-resolution primitive the token/shingle family cannot
    * express: "HR Specialist" vs "HR Specialist" with one typo shares
    * every token, but "Analyst II" vs "Analyst III" is an EDIT
    * question, and at 10⁸ keys the all-pairs levenshtein the reference
    * effectively runs (rapidfuzz cdist over the full cross product,
    * src/fuzzy_matching.py) is the scale wall.
    *
    * Symmetric-delete blocking (the SymSpell construction — Garbe,
    * public domain): if lev(a, b) ≤ d then a and b share at least one
    * member of their ≤d-deletion neighborhoods (a substitution is one
    * deletion on EACH side; an insert/delete is one deletion on the
    * longer side), so candidates = the self-join on deletion variants,
    * and each candidate VERIFIES with one exact levenshtein INSIDE the
    * join condition (the [[hammingPairs]] lesson: reject in the
    * codegen'd join output, never shuffle the failing candidates).
    * Variants join by `xxhash64` (8 bytes — the d10 key discipline; a
    * hash collision can only ADD a candidate, and verification removes
    * it).
    *
    * Cost: ~|key|^d variants per row (|key| at d=1, pairs-of-positions
    * at d=2), each 8 bytes keyed; nothing all-pairs. `maxVariantOcc`
    * is the hot-variant valve (the d10 maxGramOcc discipline): a
    * variant bucket shared by more than this many keys is dropped
    * whole — bounded recall loss under adversarial key spaces (a
    * million 1-char keys), zero effect on natural ones; the default
    * keeps everything. */
  def editPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxVariantOcc: Long = Long.MaxValue): DataFrame =
    editPairsFromKeys(editVariantKeys(df, idCol, strCol, maxDist),
      maxDist, maxVariantOcc)

  /** The symmetric-delete variant-key table behind [[editPairs]] —
    * (id, str, vk) with one row per distinct ≤`maxDist`-deletion
    * variant hash of each key. Per-ROW deterministic (the deletion
    * neighborhood is a pure function of the string), which is what
    * lets [[graft.pipeline.SilverIndex.refreshEditIndex]] persist it
    * append-only with delta ≡ scratch (d18, the m9 discipline). */
  def editVariantKeys(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"symmetric-delete blocking is exact for maxDist 1 or 2: $maxDist")
    val base = df
      .where(col(idCol).isNotNull && col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("str"))
    val v1 = base.select(col("id"), col("str"),
      explode(array_union(array(col("str")), deletions(col("str"))))
        .as("variant"))
    val vd = if (maxDist == 1) v1
      else v1.select(col("id"), col("str"),
        explode(array_union(array(col("variant")),
          deletions(col("variant")))).as("variant"))
    vd.select(col("id"), col("str"), xxhash64(col("variant")).as("vk"))
      .distinct()
  }

  /** The candidate join + exact-levenshtein verify of [[editPairs]]
    * over an (id, str, vk) variant-key table — scratch-built
    * ([[editVariantKeys]]) or served from the persisted index
    * ([[graft.pipeline.SilverIndex.editPairsFromIndex]]). The
    * hot-variant valve applies HERE, at serve time, because variant
    * occupancy is a corpus-wide property the per-row append cannot
    * know. */
  def editPairsFromKeys(keyed: DataFrame, maxDist: Int,
      maxVariantOcc: Long = Long.MaxValue): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"symmetric-delete blocking is exact for maxDist 1 or 2: $maxDist")
    require(maxVariantOcc >= 2, s"maxVariantOcc must be >= 2: $maxVariantOcc")
    val kept = keptVariantKeys(keyed, maxVariantOcc)
    val a = kept.alias("a")
    val b = kept.alias("b")
    a.join(b, col("a.vk") === col("b.vk") &&
        col("a.id") < col("b.id") &&
        levenshtein(col("a.str"), col("b.str")) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.str").as("str_a"), col("b.str").as("str_b"),
        levenshtein(col("a.str"), col("b.str")).cast("long").as("dist"))
      .dropDuplicates("id_a", "id_b")
  }

  /** The hot-variant valve applied to a variant-key table. */
  private[graft] def keptVariantKeys(keyed: DataFrame,
      maxVariantOcc: Long): DataFrame =
    if (maxVariantOcc == Long.MaxValue) keyed
    else {
      val hot = keyed.groupBy("vk")
        .agg(count(lit(1)).as("__n"))
        .where(col("__n") > maxVariantOcc)
        .select(col("vk"))
      keyed.join(hot, Seq("vk"), "left_anti")
    }

  /** DELTA edit pairs — every candidate pair touching a NEW id, for
    * the streaming face of the persisted edit-pair index (d18): the
    * [[hammingPairsDelta]] shape over variant keys. `keyed` is the
    * full (id, str, vk) table INCLUDING the new rows; `newIds` the
    * one-column frame of ids arriving this batch. Pairs are
    * canonicalized (least, greatest) by id so a new↔new pair appears
    * once; the valve is evaluated over the full table AS OF THE BATCH,
    * so each delta matches what [[editPairsFromKeys]] would emit over
    * that snapshot. NOTE the valve's accumulation semantics (ADVICE
    * r17): variant occupancy grows monotonically, so with a finite
    * `maxVariantOcc` a pair emitted while its variant key was still
    * under the ceiling REMAINS in the accumulated pairs table after
    * the key crosses it, while a from-scratch serve
    * ([[graft.pipeline.SilverIndex.editPairsFromIndex]]) would drop
    * it — the union of deltas equals serve-time output exactly only
    * when the valve is off (`Long.MaxValue`, the default). With the
    * valve on, the accumulated table is a SUPERSET of the serve
    * output restricted to pairs that were cold at emission time —
    * operationally the desirable reading (a pair verified under the
    * exact levenshtein check never un-verifies), but not the serve
    * equality; consumers needing the serve semantics re-filter
    * against [[keptVariantKeys]] at read time. */
  def editPairsDelta(keyed: DataFrame, newIds: DataFrame, maxDist: Int,
      maxVariantOcc: Long = Long.MaxValue): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"symmetric-delete blocking is exact for maxDist 1 or 2: $maxDist")
    require(maxVariantOcc >= 2, s"maxVariantOcc must be >= 2: $maxVariantOcc")
    val kept = keptVariantKeys(keyed, maxVariantOcc)
    val fresh = kept.join(
      newIds.select(col(newIds.columns.head).as("id")), Seq("id"),
      "left_semi")
    kept.alias("a").join(fresh.alias("b"),
        col("a.vk") === col("b.vk") &&
          col("a.id") =!= col("b.id") &&
          levenshtein(col("a.str"), col("b.str")) <= maxDist)
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        when(col("a.id") < col("b.id"), col("a.str"))
          .otherwise(col("b.str")).as("str_a"),
        when(col("a.id") < col("b.id"), col("b.str"))
          .otherwise(col("a.str")).as("str_b"),
        levenshtein(col("a.str"), col("b.str")).cast("long").as("dist"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Quality-aware canonical selection over near-dup clusters — the
    * production dedup shape: instead of keeping an ARBITRARY survivor
    * per duplicate cluster (the [[Components.nearDupComponents]]
    * `component == id` convention), keep the BEST document under a
    * caller-supplied ranking (longest, least punctuation-noisy, …).
    * This is what corpus pipelines actually ship — near-dup clusters
    * frequently contain one clean original and several truncated or
    * boilerplate-wrapped copies, and min-doc_id survivorship keeps a
    * random one of them.
    *
    * `rankCols` are compared as a struct, LARGEST wins; the caller must
    * make the ranking total (end with a unique tiebreaker such as
    * `-col(idCol)`), otherwise `keep` can mark several rows in a
    * cluster.
    *
    * Scale shape: the pair generator and the O(log n) component closure
    * are the dominant cost and are already bucketed ([[jaccardPairs]] /
    * [[minhashLshPairs]] docs); the selection itself is one
    * partial-aggregated `groupBy(component)` producing cluster-
    * cardinality rows, then an equi-join back on `component` — AQE
    * broadcasts the aggregated side whenever clusters ≪ docs (the
    * common case; a window `row_number` would instead force a full
    * sort per cluster and cannot be broadcast). The joined frame is
    * computed once behind a [[ManagedCache]] barrier so the cluster
    * lineage (pairs + closure) is not evaluated twice.
    *
    * Returns the input rows + `component` (cluster root id),
    * `cluster_size`, and `keep` (1 for the per-cluster argmax, else 0).
    */
  def keepBestPerCluster(docs: DataFrame, idCol: String, pairs: DataFrame,
      rankCols: Seq[Column], aCol: String = "doc_a",
      bCol: String = "doc_b"): DataFrame = {
    require(rankCols.nonEmpty, "keepBestPerCluster needs ranking columns")
    graft.Reserved.requireNone(docs, "Dedup.keepBestPerCluster")
    Seq("component", "cluster_size", "keep").foreach(c =>
      require(!docs.columns.contains(c),
        s"keepBestPerCluster emits column '$c'; rename the input column"))
    val ranked = graft.ManagedCache.swap("Dedup.keepBestPerCluster",
      Components.nearDupComponents(docs, idCol, pairs, aCol, bCol)
        .withColumn("__graft_rank", struct(rankCols: _*)))
    val best = ranked.groupBy(col("component"))
      .agg(max(col("__graft_rank")).as("__graft_best"),
        count(lit(1)).as("cluster_size"))
    ranked.join(best, Seq("component"))
      .withColumn("keep",
        (col("__graft_rank") === col("__graft_best")).cast("long"))
      .drop("__graft_rank", "__graft_best")
  }

  /** Exact shingle-CONTAINMENT ≥ θ pairs — the asymmetric near-dup
    * criterion symmetric Jaccard misses: a short doc quoted nearly
    * verbatim inside a long one has C(A,B) = |A∩B|/|A| ≈ 1 while its
    * Jaccard ≈ |A|/|B| ≈ 0 sails under every [[jaccardPairs]]
    * threshold (press-release laundering, quote farms, template
    * embedding).
    *
    * Candidate generation is the ASYMMETRIC prefix filter — lossless:
    * if C(A,B) ≥ θ then A∩B misses at most (1−θ)·|A| of A's shingles,
    * so at least one of A's ⌊(1−θ)·|A|⌋+1 globally-RAREST shingles is
    * in B. Only the smaller side contributes a prefix; the larger side
    * posts all its shingles — never all pairs, and the prefix keys are
    * xxhash64 longs (the d2/d10 discipline: 8-byte hashes for
    * blocking, TRUE shingle sets for verification, so a collision
    * costs a spurious candidate, never a wrong pair). Verification is
    * one exact set intersection per surviving candidate; containment
    * is an int/int ratio → engine-exact.
    *
    * Output: (doc_small, doc_big, n_shared, containment) with the
    * smaller side defined by (|sh|, id) so equal-size pairs appear
    * exactly once.
    *
    * The exploded posting frame `ex` below is consumed three times
    * (gram-frequency agg, prefix side, full posting side) and
    * deliberately NOT persisted: each rebuild is explode+xxhash64 over
    * the already-cached `sets` — cheap CPU next to the downstream
    * shuffles — while caching it would materialize a corpus-sized
    * posting table (A/B'd flat at sf0.1, net-negative at scale; see
    * tools/d14_ab_r14.txt). */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, theta: Double): DataFrame = {
    require(theta > 0.0 && theta <= 1.0,
      s"theta must be in (0, 1]: $theta")
    val sets = graft.ManagedCache.swap("Dedup.containmentPairs",
      Par.spread(df, col(idCol))
        .select(col(idCol).as("doc"),
          graft.functions.word_shingles(col(textCol), n).as("sh"))
        .withColumn("sz", size(col("sh")))
        .where(col("sz") > 0))
    // consumed three times (frequency agg, prefix side, full posting
    // side) and deliberately NOT persisted — see the scaladoc note and
    // tools/d14_ab_r14.txt for the measured rejection
    val ex = sets
      .select(col("doc"), col("sz"), explode(col("sh")).as("g"))
      .select(col("doc"), col("sz"), xxhash64(col("g")).as("gh"))
    val freq = ex.groupBy("gh").agg(count(lit(1)).as("gdf"))
    val rkW = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("gdf"), col("gh"))
    // +2, not the textbook +1: the verification predicate is the IEEE
    // compare shared/sz >= θ, and both floor((1−θ)·sz) here and that
    // compare can each sit one ulp off the exact rational boundary
    // (e.g. θ = 0.3, sz = 10: (1−0.3) rounds BELOW 0.7, the floor
    // lands at 6 where the exact bound needs 7). One extra prefix
    // shingle per doc provably covers both one-unit shortfalls;
    // DedupSpec's brute-force losslessness case runs the θ = 0.3
    // boundary.
    val prefix = ex.join(freq, "gh")
      .withColumn("__rk", row_number().over(rkW))
      .where(col("__rk") <=
        floor(lit(1.0 - theta) * col("sz")).cast("int") + 2)
      .select(col("doc").as("doc_s"), col("sz").as("sz_s"), col("gh"))
    val full = ex.select(col("doc").as("doc_b"), col("sz").as("sz_b"),
      col("gh"))
    val cands = prefix.join(full, "gh")
      .where(col("sz_s") < col("sz_b") ||
        (col("sz_s") === col("sz_b") && col("doc_s") < col("doc_b")))
      .select("doc_s", "doc_b").distinct()
    cands
      .join(sets.select(col("doc").as("doc_s"), col("sh").as("sh_s"),
        col("sz").as("sz_s")), "doc_s")
      .join(sets.select(col("doc").as("doc_b"), col("sh").as("sh_b")),
        "doc_b")
      .withColumn("n_shared",
        size(array_intersect(col("sh_s"), col("sh_b"))).cast("long"))
      .withColumn("containment",
        col("n_shared").cast("double") / col("sz_s"))
      .where(col("containment") >= theta)
      .select(col("doc_s").as("doc_small"), col("doc_b").as("doc_big"),
        col("n_shared"), col("containment"))
  }
}
