package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.queries.Tables.t

/** End-to-end corpus-curation pipeline — the composition a pretraining
  * data pipeline actually runs, as ONE lazy Spark plan (C4/Gopher-style
  * stages; each stage reuses an already-oracle-checked operator):
  *
  *   1. signal extraction: language-ID + token count + repetition ratio
  *      (single projection pass, all codegen'd kernels);
  *   2. quality gate: keep identifiable-language docs of sane length with
  *      low boilerplate repetition;
  *   3. exact dedup: one survivor (min doc_id) per identical text;
  *   4. near-dup drop: word-2-gram Jaccard ≥ θ pairs among survivors
  *      ([[Dedup.jaccardPairs]] — PPJoin/dense-adaptive), dropping the
  *      higher doc_id of every pair.
  *
  * At 100 TB the shape holds: stages 1–2 are a narrow map over the scan
  * (filter pushes to parquet), stage 3 one hash-shuffle on text, stage 4
  * the density-gated similarity join — no driver-side loops anywhere.
  * Stage order matters for cost: the quality gate runs BEFORE any
  * shuffle, so dedup and the pair join only see surviving docs.
  */
object CurationQueries {

  /** The shared c25/c26 corpus construction: planted per-group quote
    * spans (13–17 words) as the eval set; every 23rd train doc embeds
    * its group's span verbatim. ONE definition so the pair gate and
    * the action gate can never drift apart. */
  private def c25Corpora(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val docs = t(s, dir, "documents")
    val g = col("doc_id") % 5
    val span = array_join(
      transform(sequence(lit(1), lit(13) + g),
        p => concat(lit("quote"), g, lit("w"), p)), " ")
    val evalDf = docs.where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_doc"), span.as("text"))
    val train = docs.where(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 23 === 0,
          concat(col("text"), lit(" "), span))
          .otherwise(col("text")).as("text"))
    (train, evalDf)
  }

  /** c28/s16 shared corpus: the train docs plus the eval side with its
    * PLANTED paraphrases — every 23rd train doc re-emitted as a
    * synthetic eval item with its normalized tokens SORTED (a
    * deterministic word-order scramble: destroys every word-13-gram a
    * ≥13-token doc has, preserves the term bag EXACTLY, so the planted
    * pair's cosine is 1.0 while c10 sees zero shared grams). Synthetic
    * eval ids live at +10M; real ids must stay below (the m8 id-space
    * guard, riding the planted id projection). One (id, text) union so
    * both the scratch (c28) and stream-maintained (s16) postings builds
    * see the identical corpus. */
  private[graft] def semanticUnion(s: SparkSession, dir: String): DataFrame = {
    // the id-space guard rides EVERY id entering the union, not just the
    // planted projection: a real doc at >= 10M would otherwise classify
    // as eval in semanticReportFromPostings' isEval and silently drop
    // from the train manifest (ADVICE r16)
    val docs = t(s, dir, "documents")
      .select(when(col("doc_id") >= lit(10000000L),
          raise_error(concat(lit("c28: doc_id "),
            col("doc_id").cast("string"),
            lit(" collides with the planted-eval id space (>= 10000000)"))))
        .otherwise(col("doc_id")).as("doc_id"),
        col("text"))
    val guardedId = col("doc_id") + lit(10000000L)
    val scrambled = array_join(array_sort(
      graft.operators.TextSearch.tokens(col("text"))), " ")
    val evalDf = docs.where(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("id"), col("text"))
      .unionByName(docs
        .where(col("doc_id") % 20 =!= 0 && col("doc_id") % 23 === 0)
        .select(guardedId.as("id"), scrambled.as("text")))
    docs.where(col("doc_id") % 20 =!= 0)
      .select(col("doc_id").as("id"), col("text"))
      .unionByName(evalDf)
  }

  /** The c28 release manifest from a POSTINGS frame over
    * [[semanticUnion]] — scratch-built (c28) or served from the
    * stream-maintained postings index (s16); per-doc-deterministic
    * tokenization makes the two row-identical, and the IDF weighting
    * recomputes from the postings at serve time, so maintained ≡
    * scratch EXACTLY (no frozen-vectorizer approximation needed). Both
    * corpora weigh under ONE shared hashing-TF-IDF fit at dim 256 (at
    * 64, bucket collisions push RANDOM pairs past cosine 0.8); train
    * docs flag at round-6 cosine ≥ 0.9 vs ANY eval item. */
  private[graft] def semanticReportFromPostings(s: SparkSession,
      dir: String, post: DataFrame, auto: Boolean = false): DataFrame = {
    // the weighted triple frame feeds BOTH join sides (train filter +
    // broadcast eval filter) — uncached, the whole postings→TF-IDF DAG
    // (two groupBys, the df join, the norm join) evaluates once per
    // side; the frame is corpus×avg-distinct-buckets rows, exactly
    // what a silver artifact would hold at scale (r17: c28 4.75 →
    // 2.69 s at sf0.1, tools/bench_notes_r17.txt)
    val w = graft.ManagedCache.swap("CurationQueries.semanticW",
      graft.operators.TextSearch.hashingTfIdf(post, dim = 256))
    val isEval = col("doc") >= 10000000L || col("doc") % 20 === 0
    // auto = the c32 dispatch face: same θ, same fit — at gate scale
    // the eval triples fit the declared broadcast budget, so the
    // dispatch takes the exact branch and the report (and oracle) is
    // c28's verbatim; past the budget it degrades to the banded path
    val pairs =
      if (auto) Dedup.crossCosineAuto(
        w.where(!isEval), w.where(isEval), theta = 0.9, dim = 256)
      else Dedup.crossCosinePairs(
        w.where(!isEval), w.where(isEval), theta = 0.9)
    val hits = pairs
      .groupBy("train_doc")
      .agg(count(lit(1)).as("n_eval_hits"), max(col("cosine")).as("mc"))
    t(s, dir, "documents").where(col("doc_id") % 20 =!= 0)
      .select(col("doc_id").as("train_doc"))
      .join(hits, Seq("train_doc"), "left")
      .select(col("train_doc"),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        round(coalesce(col("mc"), lit(0.0)), 6).as("max_cosine"),
        when(col("n_eval_hits").isNotNull, lit("blocked"))
          .otherwise(lit("released")).as("verdict"))
  }

  /** The shared-fit TF-IDF triple frame over [[semanticUnion]] (dim
    * 256, the c28 parameterization), ManagedCache-bounded under the one
    * slot every semantic query shares. */
  private[graft] def semanticW(s: SparkSession, dir: String): DataFrame =
    graft.ManagedCache.swap("CurationQueries.semanticW",
      graft.operators.TextSearch.hashingTfIdf(
        graft.operators.TextSearch.postings(
          semanticUnion(s, dir), "id", "text"), dim = 256))

  private[graft] val semanticIsEval =
    col("doc") >= 10000000L || col("doc") % 20 === 0

  /** The c30 recall-contract row over an (exact, approx) pair of
    * semantic-decontam outputs — precision must be exact (false_pairs
    * = 0, the approx path verifies with the same round-6 θ decision)
    * and recall is measured IN-PLAN with a 0.7 floor (the a5/a11
    * discipline). Shared by the scratch-banded (c30) and index-served
    * (c31) faces. */
  private def semanticRecallContract(exactPairs: DataFrame,
      approxPairs: DataFrame, method: String): DataFrame = {
    val exact = exactPairs
      .select(col("train_doc"), col("eval_doc"), lit(1L).as("__ex"))
    val approx = approxPairs
      .select(col("train_doc"), col("eval_doc"), lit(1L).as("__ap"))
    exact.join(approx, Seq("train_doc", "eval_doc"), "full_outer")
      .agg(
        coalesce(sum(col("__ex")), lit(0L)).as("n_exact"),
        coalesce(sum(col("__ap")), lit(0L)).as("n_lsh"),
        coalesce(sum(col("__ex") * col("__ap")), lit(0L)).as("n_hit"),
        // approx pairs the exact operator does NOT flag — must be 0
        coalesce(sum(when(col("__ex").isNull, col("__ap"))), lit(0L))
          .as("false_pairs"))
      .select(lit(method).as("method"),
        col("n_exact"), col("n_lsh"), col("n_hit"), col("false_pairs"),
        // 0-exact reads recall 0.0 / contract failed, never NULL (the
        // a5 coalesce discipline — the collapse this row guards
        // against must not blank the verdict)
        round(col("n_hit").cast("double") /
          greatest(col("n_exact"), lit(1L)).cast("double"), 4)
          .as("recall"),
        lit(0.7).as("contract_floor"),
        (col("n_exact") > 0 && col("false_pairs") === 0 &&
          col("n_hit").cast("double") >=
            lit(0.7) * col("n_exact").cast("double"))
          .as("meets_contract"))
  }

  /** The PERSISTED banded semantic index over the train side of the
    * shared fit (once per JVM + sf dir) — built through THREE
    * incremental [[graft.pipeline.SilverIndex.refreshSemanticLsh]]
    * folds (docs split by pmod 3, the weekly-arrival shape), so the
    * gate exercises the id-anti-join delta path, not just a one-shot
    * build; delta ≡ scratch because signatures are per-doc
    * deterministic under the frozen fit. */
  private[graft] def semanticIndexPath(s: SparkSession, dir: String): String =
    IndexMemo.path(s"semanticlsh:$dir") { p =>
      val train = semanticW(s, dir).where(!semanticIsEval)
      (0 until 3).foreach { i =>
        graft.pipeline.SilverIndex.refreshSemanticLsh(
          train.where(pmod(col("doc"), lit(3)) === i),
          dim = 256, bits = 10, tables = 12, path = p)
      }
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_corpus_pipeline" -> ((s, dir) => {
      // spread the one-file scan across cores FIRST: the signal kernels
      // (lang-ID regexes, shingles) are the per-row cost, and a single
      // parquet file otherwise evaluates them in one task
      val docs = t(s, dir, "documents")
        .transform(graft.operators.Par.spread(_, col("doc_id")))
      // stage 1: per-doc signals in one projection, computed ONCE — the
      // persist boundary stops Catalyst pushing the (expensive) gate
      // predicate below the spread exchange into the single-task scan,
      // and the three consumers of this frame (exact-dedup grouping,
      // pair stats, final output) share the computation instead of
      // re-running the regex battery per branch. ManagedCache bounds the
      // cache across re-entries. At 100 TB the same persist is how the
      // one-pass-signals/many-consumers shape should run (or a
      // materialized silver table).
      // the distinct word-2-gram SET is cached alongside the scalars:
      // the repetition signal needs its size here, and stage 4's pair
      // join consumes the same arrays — one shingle pass, not two
      val total2g = greatest(tokenCount(col("text")) - 1, lit(0))
      val signals = graft.ManagedCache.swap("CurationQueries.c1.signals",
        docs.select(
            col("doc_id"), col("text"),
            graft.functions.word_shingles(col("text"), 2).as("sh"),
            langId(col("text")).as("lang_guess"),
            tokenCount(col("text")).as("n_words"),
            total2g.as("__t2g"))
          .withColumn("rep", when(col("__t2g") === 0, lit(0.0))
            .otherwise(lit(1.0) - size(col("sh")).cast("double")
              / col("__t2g").cast("double")))
          .drop("__t2g"))
      // stage 2: quality gate (thresholds sized to the corpus: words
      // 20..1000, repetition ≤ 0.1, language identifiable)
      val gated = signals.where(col("lang_guess") =!= "und" &&
        col("n_words").between(20, 1000) && col("rep") <= 0.1)
      // stage 3: exact dedup — keep the min doc_id of each identical text
      val kept = gated.join(
        Dedup.exact(gated, "text", "doc_id")
          .select(col("kept_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      // stage 4: near-dup drop — for every Jaccard≥θ pair, the smaller
      // doc_id survives (Dedup.dropNearDups over the exact pair join,
      // fed the CACHED shingle arrays — no second shingle pass).
      // cacheSets stays ON deliberately: the operator's internal sets
      // persist holds kept-PROJECTED sorted arrays that its stats +
      // candidate + verify branches each read — pointing them at the
      // signals cache instead re-runs the gate semi-join and array sort
      // per branch (measured: warm 3.4 s → 4.9 s). The overlap between
      // the two caches is the array column only, and the slot-swap
      // bounds both across re-entries.
      Dedup.dropNearDups(kept, "doc_id",
          Dedup.jaccardPairsBy(kept, "doc_id", col("sh"), theta = 0.5))
        .select(col("doc_id"), col("lang_guess"), col("n_words"))
    }),

    // The FULL CCNet-style stack (VERDICT r9 task 5): c1's chain with
    // the r9 model signals folded in as first-class gates —
    //   1. narrow signals: lang-ID + tokens + repetition + the t12
    //      hashed-bag classifier score, ONE codegen projection;
    //   2. heuristic gate + classifier gate (score >= 0) — all narrow
    //      filters run BEFORE any shuffle;
    //   3. surprisal bucketing (the CCNet head/middle/tail recipe):
    //      survivors scored against the FROZEN full-corpus unigram
    //      model served from the persisted postings index (the
    //      t11/t13 IndexMemo artifact) — only survivor postings flow
    //      into the scoring join — and the lexically-odd tail bucket
    //      dropped (thresholds fixed at 3.3998/3.4041 on the rounded
    //      nll so both engines bucket identically);
    //   4. exact dedup, 5. near-dup drop — c1's stages verbatim.
    // At 100 TB: stages 1-2 are a narrow scan-side map; the surprisal
    // join is doc-keyed over stored postings pruned to survivors; the
    // model stats are the index's term aggregation.
    "c11_curation_ccnet" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .transform(graft.operators.Par.spread(_, col("doc_id")))
      val total2g = greatest(tokenCount(col("text")) - 1, lit(0))
      val signals = graft.ManagedCache.swap("CurationQueries.c11.signals",
        docs.select(
            col("doc_id"), col("text"),
            graft.functions.word_shingles(col("text"), 2).as("sh"),
            langId(col("text")).as("lang_guess"),
            tokenCount(col("text")).as("n_words"),
            total2g.as("__t2g"),
            graft.functions.linear_text_score(
              coalesce(col("text"), lit("")),
              TextQueries.qualityModelWeights).as("quality_score"))
          .withColumn("rep", when(col("__t2g") === 0, lit(0.0))
            .otherwise(lit(1.0) - size(col("sh")).cast("double")
              / col("__t2g").cast("double")))
          .drop("__t2g"))
      val gated = signals.where(col("lang_guess") =!= "und" &&
        col("n_words").between(20, 1000) && col("rep") <= 0.1 &&
        col("quality_score") >= 0)
      val nll = graft.operators.TextSearch.surprisalFromIndexFor(
          graft.pipeline.SilverIndex.postingsIndex(s,
            TextQueries.bm25IndexPath(s, dir)),
          gated.select(col("doc_id")))
        .select(col("doc").as("doc_id"),
          round(col("mean_nll"), 6).as("rnll"))
      // the survivor frame is SMALL (post-gate) but its lineage carries
      // the surprisal join — persist it so the dedup stage's stats /
      // candidate / verify branches read rows, not re-run the join
      val bucketed = graft.ManagedCache.swap("CurationQueries.c11.bucketed",
        gated.join(nll, "doc_id")
          .withColumn("nll_bucket",
            when(col("rnll") < 3.3998, lit("head"))
              .when(col("rnll") < 3.4041, lit("middle"))
              .otherwise(lit("tail")))
          .where(col("nll_bucket") =!= "tail"))
      val kept = bucketed.join(
        Dedup.exact(bucketed, "text", "doc_id")
          .select(col("kept_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      Dedup.dropNearDups(kept, "doc_id",
          Dedup.jaccardPairsBy(kept, "doc_id", col("sh"), theta = 0.5))
        .select(col("doc_id"), col("lang_guess"), col("n_words"),
          col("quality_score"), col("nll_bucket"))
    }),

    // sequence packing: assign every doc to a 2048-token context-window
    // pack in doc_id order, via the DISTRIBUTED exclusive prefix sum
    // (operators/Packing — no single-task global window; see its
    // Scaladoc for the offset construction)
    "c2_token_packing" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"))
      graft.operators.Packing
        .packByTokenBudget(docs, Seq("doc_id"), "n_tokens", budget = 2048L)
        .select(col("doc_id"), col("n_tokens"), col("cum_before"), col("pack_id"))
    }),

    // BPE-denominated packing (VERDICT r9 task 3): c2's pack assignment
    // with the denominator switched from whitespace words to
    // DETERMINISTIC BPE tokens (functions.bpe_token_count — the GPT-2
    // merge algorithm over the fixed checked-in table, a codegen
    // kernel). The packing operator takes any count column, so the
    // model-tokenizer denominator threads through unchanged — the same
    // swap works for c8's budget sampling and c7's data card. The
    // oracle replays the merge table via a recursive CTE (one
    // first-occurrence fuse per step — provably equal to standard BPE
    // under the table's learned-merge invariant, see BpeKernel docs),
    // so integer token counts are hash-exact cross-engine.
    "c12_bpe_packing" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.bpe_token_count(coalesce(col("text"), lit("")))
            .as("n_bpe_tokens"))
      graft.operators.Packing
        .packByTokenBudget(docs, Seq("doc_id"), "n_bpe_tokens",
          budget = 2048L)
        .select(col("doc_id"), col("n_bpe_tokens"), col("cum_before"),
          col("pack_id"))
    }),

    // Pack ASSEMBLY (the artifact half of c2): each 2048-token pack's
    // member documents concatenated in doc order into the training
    // example a trainer consumes. Deterministic strings and integer
    // sums -> hash-exact oracle.
    "c13_pack_assembly" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          coalesce(col("text"), lit("")).as("text"),
          tokenCount(coalesce(col("text"), lit(""))).as("n_tokens"))
      graft.operators.Packing
        .assemblePacks(docs, "doc_id", "n_tokens", "text", budget = 2048L)
    }),

    // BPE-DENOMINATED mixing + packing composite (r10 built the c12
    // tokenizer kernel; this threads it through the packing family as
    // the tokensCol): per-doc GPT-2-style BPE counts → token-budget
    // language mixing (c8's machinery, budgets in BPE tokens) → pack
    // assembly at a 1024-BPE-token context budget. The denominations a
    // trainer actually bills in, end-to-end. Oracle replays the same
    // merge table via the proven c12 recursive CTE.
    "c14_bpe_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          coalesce(col("text"), lit("")).as("text"),
          graft.functions.bpe_token_count(coalesce(col("text"), lit("")))
            .as("n_bpe_tokens"))
      val sampled = graft.operators.Splits.sampleByTokenBudget(
        docs, "doc_id", "lang", "n_bpe_tokens", "bpe-mix-r11",
        Map("en" -> 6000L, "es" -> 2500L, "de" -> 1200L))
      graft.operators.Packing.assemblePacks(
        sampled.select(col("doc_id"), col("text"), col("n_bpe_tokens")),
        "doc_id", "n_bpe_tokens", "text", budget = 1024L)
    }),

    // sharded trainer export: the c13 packs assigned to fixed-count
    // shards (4 packs/shard) with the artifact manifest a data loader
    // mounts — pack ranges, member totals, per-pack token extremes +
    // exact median (the c7 data card threaded over shards), and an
    // engine-portable md5 content digest per shard
    // (operators/TrainerExport; the write half is spec-verified since
    // Verify compares RESULT frames, not side effects)
    "c15_shard_manifest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          coalesce(col("text"), lit("")).as("text"),
          tokenCount(coalesce(col("text"), lit(""))).as("n_tokens"))
      val packs = graft.operators.Packing
        .assemblePacks(docs, "doc_id", "n_tokens", "text", budget = 2048L)
      graft.operators.TrainerExport.shardManifest(packs, packsPerShard = 4)
    }),

    // the BPE-denominated trainer artifact END-TO-END (r11 VERDICT task
    // 1 — c14 proved BPE mixing+packing, c15 proved the sharded
    // manifest, but c15's artifact was still billed in whitespace
    // tokens): c14's exact composition (BPE counts → BPE-budget
    // language mixing → 1024-BPE packs) rolled into the 4-per-shard
    // manifest, with the c7 data card threaded over the SHARDS — each
    // manifest row carries `lang_mix`, the deterministic per-language
    // doc/BPE-token mix of its member documents. Every column is an
    // integer, a fixed-precision double, or a deterministic string →
    // full DuckDB oracle (the c12 merge-replay CTE feeding the c15
    // shard roll-up)
    "c16_bpe_export" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          coalesce(col("text"), lit("")).as("text"),
          graft.functions.bpe_token_count(coalesce(col("text"), lit("")))
            .as("n_bpe_tokens"))
      val sampled = graft.operators.Splits.sampleByTokenBudget(
        docs, "doc_id", "lang", "n_bpe_tokens", "bpe-mix-r11",
        Map("en" -> 6000L, "es" -> 2500L, "de" -> 1200L))
      graft.operators.TrainerExport.shardManifestWithCard(
        sampled.select(col("doc_id"), col("lang"), col("text"),
          col("n_bpe_tokens")),
        "doc_id", "n_bpe_tokens", "text", "lang",
        packBudget = 1024L, packsPerShard = 4)
    }),

    // BPE merge-table INDUCTION (r12): the training half of the
    // tokenizer story (c12/c14/c16 encode and budget with a FIXED
    // table; this learns one) — Sennrich et al. 2016 greedy merge
    // induction on a deterministic hash-ordered bounded sample (the
    // quantizer-training discipline), word counts aggregated
    // distributed, merge rounds driver-side on the weighted vocab.
    // Deterministic strings + integers -> golden-pinned ×2 sfs (an
    // iterative global-argmax train loop has no tractable SQL oracle;
    // BpeTrainSpec holds the hand-computed truth + the learned-BPE
    // structural invariant on real data).
    "c18_bpe_train" -> ((s, dir) =>
      graft.operators.BpeTrain.learnedMergeTable(s,
        t(s, dir, "documents"), "doc_id", "text",
        numMerges = 32, maxTrainDocs = 2048)),

    // DSIR importance RESAMPLING (r13): the selection step the t14
    // weights exist for (Xie et al. 2023 §3) — rank every doc by its
    // importance log-weight (target = the corpus's en slice, served
    // from the same persisted postings index as t13/t14) and keep the
    // TOP-weighted docs per language until a token budget fills,
    // budgets denominated in the same tokenizer's counts the weights
    // were computed over. Pure composition of proven kernels -> full
    // oracle: the t14 weight CTEs feeding a weight-DESC-ordered c8
    // budget window (Splits.sampleTopByBudget — the importance-ordered
    // sibling of the hash-ordered budget sampler).
    "c19_dsir_resample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val w = graft.operators.TextSearch.dsirLogWeights(
          graft.pipeline.SilverIndex.postingsIndex(s,
            TextQueries.bm25IndexPath(s, dir)),
          docs.where(col("lang") === "en").select(col("doc_id")))
        .select(col("doc").as("doc_id"), col("len"),
          round(col("log_w"), 6).as("log_w"))
      graft.operators.Splits.sampleTopByBudget(
        docs.select(col("doc_id"), col("lang")).join(w, "doc_id")
          .select(col("doc_id"), col("lang"), col("len"), col("log_w")),
        "doc_id", "lang", "len", "log_w",
        Map("en" -> 3000L, "es" -> 1200L, "de" -> 600L))
    }),

    // c21 (r13): the epoch shuffle composed over the TRAINER ARTIFACT —
    // the per-epoch read plan a loader mounts: c15's packs addressed by
    // c20's (read_shard, pos) permutation alongside the file shard that
    // physically holds each pack (TrainerExport.epochReadManifest).
    // Re-epoching rewrites nothing; the plan is manifest-sized. Oracle:
    // the c15 pack CTEs feeding the c20 address CTEs.
    "c21_epoch_read" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          coalesce(col("text"), lit("")).as("text"),
          tokenCount(coalesce(col("text"), lit(""))).as("n_tokens"))
      val packs = graft.operators.Packing
        .assemblePacks(docs, "doc_id", "n_tokens", "text", budget = 2048L)
      graft.operators.TrainerExport.epochReadManifest(packs,
        packsPerShard = 4, salt = "epoch-read-r13", epoch = 1,
        readShards = 8)
    }),

    // c20 (r13): deterministic EPOCH SHUFFLE — the between-epoch global
    // reshuffle a training loader applies, emitted as a portable
    // (shard, pos) address (md5 of salt:epoch:id -> hash-bucket shard,
    // in-shard rank) instead of an engine-private RNG permutation.
    // Streaming shards 0..n-1 in pos order replays the same uniform
    // permutation on any engine; a different epoch re-permutes
    // completely. One hash-partition + per-shard sort, never a global
    // total order (operators/Splits.epochShuffle).
    "c20_epoch_shuffle" -> ((s, dir) =>
      graft.operators.Splits.epochShuffle(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id", "epoch-shuffle-r13", epoch = 1, nShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))),

    // QUALITY-CURRICULUM mixing (r12): the static quality-stratified
    // token-budget mixture a curriculum/data-recipe pipeline samples —
    // t12's fastText-shape quality score buckets the corpus
    // (high/mid/low at the measured score quartile boundaries), then
    // c8's deterministic hash-ordered per-stratum token budget selects
    // within each bucket (budgets in whitespace tokens; the BPE
    // denomination is c14/c16's axis). Pure composition of proven
    // kernels -> full oracle: the t12 scoring CTE feeding the c8
    // budget-window CTE.
    "c17_quality_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(
        col("doc_id"),
        tokenCount(coalesce(col("text"), lit(""))).as("n_tokens"),
        graft.functions.linear_text_score(
          coalesce(col("text"), lit("")),
          TextQueries.qualityModelWeights).as("quality_score"))
      val bucketed = docs.withColumn("bucket",
        when(col("quality_score") >= 8000, "high")
          .when(col("quality_score") >= 0, "mid")
          .otherwise("low"))
      graft.operators.Splits.sampleByTokenBudget(
        bucketed.select(col("doc_id"), col("bucket"), col("n_tokens"),
          col("quality_score")),
        "doc_id", "bucket", "n_tokens", "quality-mix-r12",
        Map("high" -> 8000L, "mid" -> 4000L, "low" -> 1000L))
    }),

    // deterministic 10/10/80 train-split assignment — membership is a
    // pure function of (salt, doc_id) via md5, so it survives reruns,
    // repartitioning, and engine migrations (operators/Splits)
    "c3_hash_split" -> ((s, dir) =>
      graft.operators.Splits.assignSplit(
        t(s, dir, "documents").select(col("doc_id")), "doc_id", "graft-r3",
        Seq("val" -> 0.1, "test" -> 0.1, "train" -> 0.8))),

    // c24 (r14): LEAKAGE-SAFE splits — c3's deterministic assignment,
    // but the split unit is the d8 near-dup CLUSTER (hash keyed on the
    // component root), so a test doc can never keep a near-duplicate
    // in train: the contamination-through-splitting bug (Lee et al.
    // 2021 §6.2) fixed at the assignment, not patched downstream. The
    // corpus's planted near-dup pairs make the guarantee non-vacuous
    // at every sf. Oracle = the d8 closure CTEs + the c3 CASE over the
    // component instead of the doc id.
    "c24_leakfree_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.jaccardPairs(docs, "doc_id",
        "text", n = 2, theta = 0.5)
      graft.operators.Splits.leakFreeSplit(
          docs.select(col("doc_id")), "doc_id", pairs,
          "leakfree-r14", Seq("val" -> 0.1, "test" -> 0.1, "train" -> 0.8))
        .select(col("doc_id"), col("component"), col("split"))
    }),

    // sliding-window chunking: 48-token context windows with 8-token
    // overlap — shuffle-free per-row array work (Packing.chunkTokens)
    "c4_chunking" -> ((s, dir) =>
      graft.operators.Packing.chunkTokens(
        t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 48, overlap = 8)),

    // data mixing: deterministic per-language downsampling (keep all en,
    // half es, quarter de, drop the rest) — a pure (salt, doc_id)
    // function, so remixing at new rates nests exactly
    "c5_mix_sample" -> ((s, dir) =>
      graft.operators.Splits.sampleByHash(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", "mix-r3",
        Map("en" -> 1.0, "es" -> 0.5, "de" -> 0.25))),

    // Decontamination by the published 13-GRAM RULE (GPT-3 appx. C):
    // flag train docs sharing any verbatim word-13-gram with the eval
    // slice, with the count of distinct shared grams. The synthetic
    // corpus shares no natural 13-grams (measured zero at sf0.01), so
    // the query EMBEDS deterministic contamination identically in both
    // engines (the t7/t8 discipline): eval docs (every 97th) carry a
    // group-keyed canary span of 13+(doc_id%5) synthetic words, and
    // every 23rd train doc carries the same span for its group — so a
    // contaminated doc shares exactly (doc_id%5)+1 distinct 13-grams
    // (the windows fully inside the span; boundary windows differ per
    // doc). Integer counts → hash-exact oracle. Scale shape: the
    // eval side's distinct grams broadcast; the corpus pays one narrow
    // explode + broadcast semi-join + an output-sized per-doc count.
    "c10_ngram_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val g = col("doc_id") % 5
      val span = array_join(
        transform(sequence(lit(1), lit(13) + g),
          p => concat(lit("leak"), g, lit("w"), p)), " ")
      val withSpan = concat(col("text"), lit(" "), span)
      val evalDf = docs.where(col("doc_id") % 97 === 0)
        .select(withSpan.as("text"))
      val train = docs.where(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 23 === 0, withSpan)
            .otherwise(col("text")).as("text"))
      graft.operators.Dedup.ngramOverlap(
        train, "doc_id", "text", evalDf, "text", n = 13)
    }),

    // c22 (r14): BPE-DENOMINATED 13-gram decontamination — the unit the
    // published rule actually counts (GPT-3 appx. C counts TOKENIZER
    // grams, not whitespace words; c10 is the word-gram approximation).
    // The planted spans here are deliberately SHORT in words (4+(g%3)
    // 'leak<g>w<p>' words, far under 13) so word-13-gram decontam sees
    // NOTHING inside them, but each word BPE-encodes to ~6 symbols
    // under the fixed merge table, so the span's ≥24-token sequence
    // carries interior BPE 13-grams that token-mode catches — the
    // tokenization-boundary divergence, in the gate. Oracle = the c12
    // merge-replay CTEs (per-word terminal symbol sequences via
    // arg_min) threaded into the c10 gram/overlap CTEs, token windows
    // crossing word boundaries exactly as BpeKernel.shingles does.
    "c22_bpe_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val g = col("doc_id") % 5
      val span = array_join(
        transform(sequence(lit(1), lit(4) + g % 3),
          p => concat(lit("leak"), g, lit("w"), p)), " ")
      val withSpan = concat(col("text"), lit(" "), span)
      val evalDf = docs.where(col("doc_id") % 97 === 0)
        .select(withSpan.as("text"))
      val train = docs.where(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 23 === 0, withSpan)
            .otherwise(col("text")).as("text"))
      graft.operators.Dedup.ngramOverlap(
        train, "doc_id", "text", evalDf, "text", n = 13,
        gram = graft.operators.Dedup.GramMode.Bpe)
    }),

    // c25 (r14): CROSS-corpus containment decontamination — the
    // quoted-whole release question c6 (similarity) and c10 (any-gram)
    // sit either side of: eval docs here are SHORT standalone spans
    // (13+(g%5) 'quote<g>w<p>' words), and every 23rd train doc embeds
    // its group's span verbatim inside its own text — Jaccard vs the
    // long train doc is negligible, but C(eval, train) = 1.0. The eval
    // side broadcasts; the corpus pays one narrow explode. Integer
    // n_shared / int sz -> exact oracle (brute-force list_intersect).
    "c25_containment_decontam" -> ((s, dir) => {
      val (train, evalDf) = c25Corpora(s, dir)
      graft.operators.Dedup.crossContainment(train, "doc_id", "text",
        evalDf, "eval_doc", "text", n = 3, theta = 0.9)
    }),

    // c27 (r14): tokenizer FERTILITY report — the standard multilingual
    // tokenizer eval (tokens per word, bytes per token, per language):
    // a tokenizer that fragments one language 3× harder than another
    // taxes that language's effective context and training budget, and
    // this is the report that shows it BEFORE training. Per-doc BPE
    // counts come from the proven c12 kernel; all sums are integers and
    // each ratio is one IEEE division under round(…,6).
    "c27_bpe_fertility" -> ((s, dir) => {
      val per = t(s, dir, "documents")
        .select(col("lang"),
          coalesce(col("text"), lit("")).as("text"))
        .select(col("lang"),
          graft.functions.bpe_token_count(col("text")).as("n_bpe"),
          when(length(trim(col("text"))) === 0, lit(0))
            .otherwise(size(split(trim(col("text")), "\\s+")))
            .cast("long").as("n_words"),
          octet_length(col("text")).cast("long").as("n_bytes"))
      per.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_bpe")).as("n_bpe_tokens"),
          sum(col("n_bytes")).as("n_bytes"))
        .select(col("lang"), col("n_docs"), col("n_words"),
          col("n_bpe_tokens"), col("n_bytes"),
          when(col("n_words") === 0, lit(0.0))
            .otherwise(round(col("n_bpe_tokens").cast("double") /
              col("n_words"), 6)).as("fertility"),
          when(col("n_bpe_tokens") === 0, lit(0.0))
            .otherwise(round(col("n_bytes").cast("double") /
              col("n_bpe_tokens"), 6)).as("bytes_per_token"))
    }),

    // c26 (r14): the containment-decontam ACTION — c25 emits the
    // (train, eval) hit pairs; this is the release manifest a
    // curation pass actually ships: EVERY train doc with its eval-hit
    // count, worst containment, and the blocked/released verdict
    // (the d15 make-pairs-actionable pattern applied to c25). Exact
    // divisions + counts -> exact oracle (the c25 CTEs + one rollup).
    "c26_decontam_action" -> ((s, dir) => {
      val (train, evalDf) = c25Corpora(s, dir)
      val hits = graft.operators.Dedup.crossContainment(train, "doc_id",
          "text", evalDf, "eval_doc", "text", n = 3, theta = 0.9)
        .groupBy("train_doc")
        .agg(count(lit(1)).as("n_eval_hits"),
          max(col("containment")).as("mc"))
      train.select(col("doc_id").as("train_doc"))
        .join(hits, Seq("train_doc"), "left")
        .select(col("train_doc"),
          coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
          round(coalesce(col("mc"), lit(0.0)), 6).as("max_containment"),
          when(col("n_eval_hits").isNotNull, lit("blocked"))
            .otherwise(lit("released")).as("verdict"))
    }),

    // c28 (r16): SEMANTIC (paraphrase-level) decontamination — the
    // case the WHOLE token-overlap family (c6 Jaccard, c10/c22
    // 13-grams, c25/c26 containment) provably misses: a reworded eval
    // item shares no 13-gram with its source but keeps its term bag,
    // so its hashed-TF-IDF vector barely moves. The gate plants the
    // adversarial case end-to-end in TEXT: every 23rd train doc
    // re-emitted as a synthetic eval item with its normalized tokens
    // SORTED (a deterministic word-order scramble — destroys every
    // word-13-gram a ≥13-token doc has, preserves the bag EXACTLY, so
    // the planted pair's cosine is 1.0 while c10 sees zero shared
    // grams — DedupSpec pins both halves). Both corpora embed under
    // ONE shared hashing-TF-IDF fit (t15's vectorizer at dim 256: at
    // dim 64 bucket collisions push RANDOM pairs past cosine 0.8 and
    // 94% of the corpus would flag; 256 drops the random mass to
    // ≤ 0.9 while bag-preserving paraphrases stay at 1.0 — measured
    // at sf0.01: 20 planted + 9 natural pairs ≥ 0.9, next tier 1458
    // at 0.8); train docs flag at round-6 cosine ≥ 0.9 vs ANY eval
    // item; output is the c26-style release manifest.
    // Exact sparse cosines -> full oracle via the h2 CTEs over the
    // union corpus (the planted bag = the source doc's postings under
    // a shifted id — sorting cannot change a bag).
    "c28_semantic_decontam" -> ((s, dir) =>
      semanticReportFromPostings(s, dir,
        graft.operators.TextSearch.postings(
          semanticUnion(s, dir), "id", "text"))),

    // c30 (r17): the APPROXIMATE semantic-decontam path, gated with
    // its recall contract (VERDICT r16 task 1b — the a5/a11
    // discipline): the SAME shared-fit TF-IDF vectors banded into
    // 12 independent 10-bit hyperplane-signature tables, candidates
    // verified with the exact round-6 cosine. Precision is exact by
    // construction (verification replays the θ decision on the full
    // vectors → false_pairs must be 0); recall is measured IN-PLAN
    // against the exact operator's flags with a 0.7 floor. At the
    // gate's degenerate vocabulary (~29 live buckets, pair cosines
    // median ≈ 0.64) banding is deliberately stress-tested — pairs at
    // θ = 0.9 collide in ≥ 1 of 12 tables w.p. ≈ 0.94, paraphrases at
    // cosine 1.0 almost surely; at production dim (2^18+) the bands
    // separate far harder. One row; rows-only by design — the row
    // itself carries the evidence (golden-pinned, GOLDENS.json).
    "c30_semantic_lsh_recall" -> ((s, dir) => {
      val w = semanticW(s, dir)
      semanticRecallContract(
        Dedup.crossCosinePairs(
          w.where(!semanticIsEval), w.where(semanticIsEval), theta = 0.9),
        Dedup.crossCosinePairsLsh(
          w.where(!semanticIsEval), w.where(semanticIsEval), theta = 0.9,
          dim = 256),
        "lsh_bands")
    }),

    // c31 (r18): the banded semantic-decontam path SERVED FROM THE
    // PERSISTED INDEX (VERDICT r17 task 2) — c30 re-banded the whole
    // train corpus per audit; this serves the identical collision
    // candidates from the SilverIndex signature table (built through
    // three incremental id-anti-join folds) and verifies them with the
    // exact round-6 sparse cosine from the stored vectors, so c30's
    // recall contract (floor 0.7, false_pairs 0) holds over
    // index-served candidates by construction — the row pins it.
    // At 100 TB this is the weekly re-run audit chain amortized:
    // tokenize+vectorize+band once per doc at arrival, each audit pays
    // only eval-sized banding + collision-sized verification.
    // (SilverIndexSpec pins serve ≡ operator, delta ≡ scratch, erase,
    // and the streaming face's exactly-once emission.)
    "c31_semantic_index_recall" -> ((s, dir) => {
      val w = semanticW(s, dir)
      semanticRecallContract(
        Dedup.crossCosinePairs(
          w.where(!semanticIsEval), w.where(semanticIsEval), theta = 0.9),
        graft.pipeline.SilverIndex.semanticPairsFromIndex(
          s, semanticIndexPath(s, dir), w.where(semanticIsEval),
          theta = 0.9),
        "lsh_index")
    }),

    // c32 (r18): AUTO-DISPATCHED semantic decontam (VERDICT r17 task
    // 3) — the a14 knnJoin declared-budget discipline applied to the
    // exact/banded pair: the eval side's triple mass is estimated
    // against the session's autoBroadcastJoinThreshold and the
    // operator picks the exact broadcast bucket join under it, the
    // banded signature path past it. At gate scale the benchmark
    // triples fit any real budget, so the dispatch lands on the exact
    // branch and c28's oracle applies VERBATIM (the s16 stance);
    // DedupSpec forces BOTH branches through a shrunken threshold and
    // pins exact-branch ≡ crossCosinePairs / banded-branch ≡
    // crossCosinePairsLsh row-for-row.
    "c32_semantic_auto" -> ((s, dir) =>
      semanticReportFromPostings(s, dir,
        graft.operators.TextSearch.postings(
          semanticUnion(s, dir), "id", "text"),
        auto = true)),

    // c29 (r16): RELEASE-TO-RELEASE SNAPSHOT DIFF — the changelog
    // between two corpus versions (added / removed / changed keys by
    // content digest), the "changes since v1" section of a data card.
    // Release B is a planted transform of the corpus: every 31st doc
    // dropped (removed), every surviving 37th doc's text suffixed
    // (changed — pure concatenation, engine-identical, unlike case
    // mapping), every 41st re-keyed at +20M (added; id-space guarded).
    // One full-outer join on the key, digests map-side, output
    // delta-sized.
    "c29_dataset_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val a = docs.select(col("doc_id"), col("text"), col("lang"))
      val guardedId = when(col("doc_id") >= lit(20000000L),
        raise_error(concat(lit("c29: doc_id "),
          col("doc_id").cast("string"),
          lit(" collides with the planted-addition id space (>= 20M)"))))
        .otherwise(col("doc_id") + lit(20000000L))
      val b = docs.where(col("doc_id") % 31 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 37 === 0, concat(col("text"), lit(" [v2]")))
            .otherwise(col("text")).as("text"),
          col("lang"))
        .unionByName(docs.where(col("doc_id") % 41 === 0)
          .select(guardedId.as("doc_id"), col("text"), col("lang")))
      graft.operators.SnapshotDiff.diff(a, b, "doc_id",
        Seq("text", "lang"))
    }),

    // decontamination: training docs whose word-2-gram sets overlap a
    // held-out "benchmark" slice (every 25th doc) at Jaccard ≥ 0.5 —
    // the benchmark side broadcasts, the corpus never shuffles
    "c6_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Dedup.crossJaccardPairs(
        docs.where(col("doc_id") % 25 =!= 0), "doc_id",
        docs.where(col("doc_id") % 25 === 0), "doc_id",
        graft.functions.word_shingles(col("text"), 2), theta = 0.5)
    }),

    // token-BUDGET mixing: take ~4000 en / 1500 es / 800 de tokens,
    // selecting docs in deterministic (salt, doc_id)-hash order per
    // language until each budget fills (boundary doc kept) — the
    // absolute-count sibling of c5's rate mixing; the running totals
    // are the distributed per-stratum prefix sum (no single-task
    // stratum window)
    "c8_budget_sample" -> ((s, dir) =>
      graft.operators.Splits.sampleByTokenBudget(
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            tokenCount(col("text")).as("n_tokens")),
        "doc_id", "lang", "n_tokens", "budget-r6",
        Map("en" -> 4000L, "es" -> 1500L, "de" -> 800L))),

    // c23 (r14): TEMPERATURE-scaled mixing — c8's hash-ordered budget
    // selection, but the per-language budgets are COMPUTED from the
    // corpus (share_i ∝ mass_i^(1/T), T = 2 up-weights tail languages)
    // instead of hand-fixed. The budget aggregation is |strata|-sized;
    // shares round HALF_UP to 12 decimals before the multiply so the
    // oracle's pow/sum ulps cannot flip a floor. Oracle = the weight
    // CTEs + the proven c8 window.
    "c23_temperature_mix" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          tokenCount(col("text")).as("n_tokens"))
      val budgets = graft.operators.Splits.temperatureBudgets(
        docs, "lang", "n_tokens", totalBudget = 8000L, temperature = 2.0)
      graft.operators.Splits.sampleByTokenBudget(docs, "doc_id", "lang",
        "n_tokens", "temp-mix-r14", budgets)
    }),

    // Bloom semi-join reduction decontamination: exact anti-join of the
    // corpus against a "seen" reference key set (every 7th doc's text),
    // with the corpus-side join input pruned by a distributively-built
    // Bloom filter — definitely-clean rows (no false negatives) skip the
    // join entirely; ~fpp of the rest verify on the key itself. The
    // Bloom changes cost, never semantics, so this approximate-machinery
    // query carries a REAL oracle (plain NOT EXISTS).
    "c9_bloom_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Dedup.bloomAntiJoin(
        docs, docs.where(col("doc_id") % 7 === 0), col("text"),
        expectedItems = 1000L, fpp = 0.01)
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // Data card: the per-stratum corpus summary a dataset release ships
    // (docs, token totals/extremes, median length per language) —
    // integer aggregates plus the DISTRIBUTED exact median
    // ([[graft.operators.Quantiles]], never buffers a group), so the
    // same query runs on 10⁵ or 10¹¹ documents. One groupBy shuffle on
    // the (tiny) language key + the quantiles range exchange.
    "c7_data_card" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("lang"), tokenCount(col("text")).as("n_tokens"))
      val base = docs.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      val med = graft.operators.Quantiles
        .exactQuantiles(docs, Seq("lang"), "n_tokens", Seq(0.5))
        .select(col("lang"), col("q").as("p50_tokens"))
      base.join(med, Seq("lang"))
    })
  )

  private val oracles0: Map[String, String] = Map(
    // the embedded-contamination construction verbatim (span of
    // 13+(doc_id%5) 'leak<g>w<p>' words on every 97th doc's eval copy
    // and every 23rd train doc), then distinct-13-gram overlap counts;
    // DuckDB list slices are 1-based inclusive, range() stop-exclusive
    "c10_ngram_decontam" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    text || ' ' || array_to_string(list_transform(
        |      range(1, 14 + doc_id % 5),
        |      p -> 'leak' || CAST(doc_id % 5 AS VARCHAR) || 'w' ||
        |           CAST(p AS VARCHAR)), ' ') AS spanned,
        |    text
        |  FROM documents),
        |ev AS (SELECT spanned AS text FROM base WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id,
        |         CASE WHEN doc_id % 23 = 0 THEN spanned ELSE text END AS text
        |       FROM base WHERE doc_id % 97 <> 0),
        |eg AS (
        |  SELECT DISTINCT gram FROM (
        |    SELECT unnest(list_distinct(list_transform(
        |             range(1, len(string_split_regex(trim(text), '\s+')) - 11),
        |             i -> array_to_string(
        |               string_split_regex(trim(text), '\s+')[i : i + 12], ' '))))
        |             AS gram
        |    FROM ev
        |    WHERE len(string_split_regex(trim(text), '\s+')) >= 13)),
        |tg AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |           range(1, len(string_split_regex(trim(text), '\s+')) - 11),
        |           i -> array_to_string(
        |             string_split_regex(trim(text), '\s+')[i : i + 12], ' '))))
        |           AS gram
        |  FROM tr
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 13)
        |SELECT doc_id, count(*) AS n_shared_grams
        |FROM tg JOIN eg USING (gram)
        |GROUP BY doc_id""".stripMargin,

    // c22: the short-span contamination construction, then the c12
    // merge-table replay (recursive first-occurrence fuse; terminal
    // symbol sequence per word via arg_min) flattened into per-doc
    // token sequences in word order, then the c10 distinct-13-gram
    // overlap CTEs over TOKEN windows (crossing word boundaries).
    "c22_bpe_decontam" ->
      """WITH RECURSIVE
        |base AS (
        |  SELECT doc_id,
        |    text || ' ' || array_to_string(list_transform(
        |      range(1, 5 + doc_id % 5 % 3),
        |      p -> 'leak' || CAST(doc_id % 5 AS VARCHAR) || 'w' ||
        |           CAST(p AS VARCHAR)), ' ') AS spanned,
        |    text
        |  FROM documents),
        |ev AS (SELECT doc_id, spanned AS text FROM base WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id,
        |         CASE WHEN doc_id % 23 = 0 THEN spanned ELSE text END AS text
        |       FROM base WHERE doc_id % 97 <> 0),
        |allw AS (
        |  SELECT 't' AS side, doc_id, i, ws[i] AS word
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |        FROM tr WHERE length(trim(text)) > 0) x,
        |       unnest(generate_series(1, len(ws))) AS u(i)
        |  UNION ALL
        |  SELECT 'e', doc_id, i, ws[i]
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |        FROM ev WHERE length(trim(text)) > 0) x,
        |       unnest(generate_series(1, len(ws))) AS u(i)),
        |uw AS (SELECT DISTINCT word FROM allw WHERE word <> ''),
        |enc AS (
        |  SELECT word, string_split(word, '') AS syms FROM uw
        |  UNION ALL
        |  SELECT word,
        |    syms[1:at-1] || [syms[at] || syms[at+1]] || syms[at+2:len(syms)]
        |      AS syms
        |  FROM (
        |    SELECT word, syms, list_position(rk, best) AS at, best
        |    FROM (
        |      SELECT word, syms,
        |        list_transform(range(1, len(syms)),
        |          i -> coalesce(map_extract(mm.m,
        |                 syms[i] || ' ' || syms[i+1])[1], 999999)) AS rk
        |      FROM enc CROSS JOIN (SELECT MAP {
        |        't h':0,'i n':1,'a n':2,'e r':3,'o n':4,'r e':5,'h e':6,
        |        'a t':7,'o r':8,'e n':9,'a l':10,'e s':11,'o u':12,
        |        'i t':13,'s t':14,'e d':15,'i s':16,'a r':17,'l e':18,
        |        'o m':19,'th e':20,'an d':21,'in g':22,'er s':23,
        |        'ou r':24,'re s':25,'at e':26,'it y':27,'al l':28,
        |        'st r':29,'on e':30,'en t':31,'ar e':32,'le s':33,
        |        'om e':34,'the r':35,'ing s':36,'ate s':37,'str a':38}
        |        AS m) mm) t1
        |    CROSS JOIN LATERAL (SELECT list_min(rk) AS best) t2) t3
        |  WHERE best IS NOT NULL AND best < 999999),
        |wsym AS (SELECT word, arg_min(syms, len(syms)) AS syms
        |         FROM enc GROUP BY word),
        |seq AS (
        |  SELECT side, doc_id, flatten(list(s.syms ORDER BY i)) AS toks
        |  FROM allw a JOIN wsym s ON a.word = s.word
        |  WHERE a.word <> ''
        |  GROUP BY side, doc_id),
        |eg AS (
        |  SELECT DISTINCT gram FROM (
        |    SELECT unnest(list_distinct(list_transform(
        |             range(1, len(toks) - 11),
        |             i -> array_to_string(toks[i : i + 12], ' '))))
        |             AS gram
        |    FROM seq WHERE side = 'e' AND len(toks) >= 13)),
        |tg AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |           range(1, len(toks) - 11),
        |           i -> array_to_string(toks[i : i + 12], ' '))))
        |           AS gram
        |  FROM seq WHERE side = 't' AND len(toks) >= 13)
        |SELECT doc_id, count(*) AS n_shared_grams
        |FROM tg JOIN eg USING (gram)
        |GROUP BY doc_id""".stripMargin,

    // the c1 oracle CTEs + the t12 classifier CTEs + the t13 surprisal
    // CTEs (full-corpus model), composed with the fixed nll-bucket
    // thresholds — every fragment is independently oracle-proven by
    // its own gate query
    "c11_curation_ccnet" ->
      """WITH sig AS (
        |  SELECT doc_id, text,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
        |    string_split_regex(trim(text), '\s+') AS ws,
        |    len(regexp_extract_all(text, '\b(the|and|of|to|in|is|a)\b')) AS en,
        |    len(regexp_extract_all(text, '\b(el|la|de|que|y|los|una)\b')) AS es,
        |    len(regexp_extract_all(text, '\b(der|die|und|das|ist|nicht|ein)\b')) AS de,
        |    len(regexp_extract_all(text, '\b(le|la|les|et|des|est|une)\b')) AS fr
        |  FROM documents),
        |lg AS (
        |  SELECT doc_id, text, n_words, ws,
        |    CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
        |         WHEN es > 0 AND es >= en AND es >= de AND es >= fr THEN 'es'
        |         WHEN de > 0 AND de >= en AND de >= es AND de >= fr THEN 'de'
        |         WHEN fr > 0 AND fr >= en AND fr >= es AND fr >= de THEN 'fr'
        |         ELSE 'und' END AS lang_guess,
        |    CASE WHEN n_words <= 1 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct(list_transform(range(1, len(ws)),
        |                i -> ws[i] || ' ' || ws[i+1]))) AS DOUBLE)
        |              / CAST(n_words - 1 AS DOUBLE) END AS rep
        |  FROM sig),
        |ctoks AS (
        |  SELECT doc_id, string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ') AS cws
        |  FROM documents),
        |cg AS (
        |  SELECT doc_id, unnest(cws) AS gram FROM ctoks
        |  UNION ALL
        |  SELECT doc_id, unnest(list_transform(range(1, len(cws)),
        |           i -> cws[i] || ' ' || cws[i+1])) AS gram
        |  FROM ctoks),
        |cb AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(gram, ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (a, c) -> (a * 31 + c) % 1000000007) % 2048 AS bkt
        |  FROM cg WHERE gram <> ''),
        |csc AS (
        |  SELECT doc_id,
        |    CAST(sum((bkt * 2654435761) % 2003 - 1001) AS BIGINT) AS s
        |  FROM cb GROUP BY doc_id),
        |q AS (
        |  SELECT d.doc_id, coalesce(s, 0) AS quality_score
        |  FROM documents d LEFT JOIN csc ON d.doc_id = csc.doc_id),
        |stoks AS (
        |  SELECT doc_id, unnest(cws) AS term FROM ctoks),
        |post AS (
        |  SELECT doc_id, term, count(*) AS tf FROM stoks
        |  WHERE term <> '' GROUP BY doc_id, term),
        |stats AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf
        |          FROM post GROUP BY term),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM post),
        |nll AS (
        |  SELECT doc_id,
        |    round(-sum(tf * ln(cf / CAST(total AS DOUBLE))) / sum(tf), 6)
        |      AS rnll
        |  FROM post JOIN stats USING (term) CROSS JOIN tot
        |  GROUP BY doc_id),
        |gated AS (
        |  SELECT lg.doc_id, lg.text, lg.ws, lg.lang_guess, lg.n_words,
        |    q.quality_score,
        |    CASE WHEN nll.rnll < 3.3998 THEN 'head'
        |         WHEN nll.rnll < 3.4041 THEN 'middle'
        |         ELSE 'tail' END AS nll_bucket
        |  FROM lg JOIN q USING (doc_id) JOIN nll USING (doc_id)
        |  WHERE lang_guess <> 'und' AND n_words BETWEEN 20 AND 1000
        |    AND rep <= 0.1 AND quality_score >= 0 AND nll.rnll < 3.4041),
        |kept AS (
        |  SELECT * FROM gated
        |  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(ws)),
        |           i -> ws[i] || ' ' || ws[i+1])) AS s
        |  FROM kept),
        |losers AS (
        |  SELECT DISTINCT b.doc_id FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5)
        |SELECT doc_id, lang_guess, n_words, quality_score, nll_bucket
        |FROM kept
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,

    // mirrors t3 (lang-id), t1 (tokens), t5 (repetition), d1 (exact
    // dedup), d2 (jaccard pairs) oracle fragments, composed
    "c1_corpus_pipeline" ->
      """WITH sig AS (
        |  SELECT doc_id, text,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
        |    string_split_regex(trim(text), '\s+') AS ws,
        |    len(regexp_extract_all(text, '\b(the|and|of|to|in|is|a)\b')) AS en,
        |    len(regexp_extract_all(text, '\b(el|la|de|que|y|los|una)\b')) AS es,
        |    len(regexp_extract_all(text, '\b(der|die|und|das|ist|nicht|ein)\b')) AS de,
        |    len(regexp_extract_all(text, '\b(le|la|les|et|des|est|une)\b')) AS fr
        |  FROM documents),
        |lg AS (
        |  SELECT doc_id, text, n_words, ws,
        |    CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
        |         WHEN es > 0 AND es >= en AND es >= de AND es >= fr THEN 'es'
        |         WHEN de > 0 AND de >= en AND de >= es AND de >= fr THEN 'de'
        |         WHEN fr > 0 AND fr >= en AND fr >= es AND fr >= de THEN 'fr'
        |         ELSE 'und' END AS lang_guess,
        |    CASE WHEN n_words <= 1 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct(list_transform(range(1, len(ws)),
        |                i -> ws[i] || ' ' || ws[i+1]))) AS DOUBLE)
        |              / CAST(n_words - 1 AS DOUBLE) END AS rep
        |  FROM sig),
        |gated AS (
        |  SELECT * FROM lg
        |  WHERE lang_guess <> 'und' AND n_words BETWEEN 20 AND 1000 AND rep <= 0.1),
        |kept AS (
        |  SELECT * FROM gated
        |  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(ws)),
        |           i -> ws[i] || ' ' || ws[i+1])) AS s
        |  FROM kept),
        |losers AS (
        |  SELECT DISTINCT b.doc_id FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5)
        |SELECT doc_id, lang_guess, n_words FROM kept
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,

    // the BpeKernel merge table as a map literal (rank by 'left right'),
    // replayed by a recursive CTE: per word, fuse the first occurrence
    // of the lowest-ranked adjacent pair until none is in the table
    // (equal to standard fuse-all BPE under the table's learned-merge
    // invariant); final count = min list length over the recursion.
    // Then c2's packing window over the BPE counts.
    "c12_bpe_packing" ->
      """WITH RECURSIVE
        |w AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents WHERE length(trim(text)) > 0),
        |wc AS (SELECT doc_id, word, count(*) AS n FROM w
        |       WHERE word <> '' GROUP BY doc_id, word),
        |uw AS (SELECT DISTINCT word FROM wc),
        |enc AS (
        |  SELECT word, string_split(word, '') AS syms FROM uw
        |  UNION ALL
        |  SELECT word,
        |    syms[1:at-1] || [syms[at] || syms[at+1]] || syms[at+2:len(syms)]
        |      AS syms
        |  FROM (
        |    SELECT word, syms, list_position(rk, best) AS at, best
        |    FROM (
        |      SELECT word, syms,
        |        list_transform(range(1, len(syms)),
        |          i -> coalesce(map_extract(mm.m,
        |                 syms[i] || ' ' || syms[i+1])[1], 999999)) AS rk
        |      FROM enc CROSS JOIN (SELECT MAP {
        |        't h':0,'i n':1,'a n':2,'e r':3,'o n':4,'r e':5,'h e':6,
        |        'a t':7,'o r':8,'e n':9,'a l':10,'e s':11,'o u':12,
        |        'i t':13,'s t':14,'e d':15,'i s':16,'a r':17,'l e':18,
        |        'o m':19,'th e':20,'an d':21,'in g':22,'er s':23,
        |        'ou r':24,'re s':25,'at e':26,'it y':27,'al l':28,
        |        'st r':29,'on e':30,'en t':31,'ar e':32,'le s':33,
        |        'om e':34,'the r':35,'ing s':36,'ate s':37,'str a':38}
        |        AS m) mm) t1
        |    CROSS JOIN LATERAL (SELECT list_min(rk) AS best) t2) t3
        |  WHERE best IS NOT NULL AND best < 999999),
        |wtok AS (SELECT word, min(len(syms)) AS ntok FROM enc GROUP BY word),
        |dtok AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(sum(wc.n * wtok.ntok), 0) AS BIGINT) AS n_bpe_tokens
        |  FROM documents d
        |  LEFT JOIN wc ON d.doc_id = wc.doc_id
        |  LEFT JOIN wtok ON wc.word = wtok.word
        |  GROUP BY d.doc_id)
        |SELECT doc_id, n_bpe_tokens,
        |  CAST(coalesce(sum(n_bpe_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS cum_before,
        |  CAST(floor(CAST(coalesce(sum(n_bpe_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |    / 2048) AS BIGINT) AS pack_id
        |FROM dtok""".stripMargin,

    // the c2 window CTE, then per-pack grouping with an ORDER BY list
    // aggregation — the assembled example text
    "c13_pack_assembly" ->
      """WITH tok AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(coalesce(text, '')), '\s+'))
        |         END AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, n_tokens,
        |    CAST(floor(CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |      / 2048) AS BIGINT) AS pack_id
        |  FROM tok)
        |SELECT pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  array_to_string(list(text ORDER BY doc_id), ' ') AS pack_text
        |FROM c GROUP BY pack_id""".stripMargin,

    // the c12 merge-replay CTE for per-doc BPE counts, then c8's
    // hash-ordered per-language budget window (budgets in BPE tokens),
    // then c13's assembly grouping at a 1024-BPE-token pack budget
    "c14_bpe_mix" ->
      """WITH RECURSIVE
        |w AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents WHERE length(trim(text)) > 0),
        |wc AS (SELECT doc_id, word, count(*) AS n FROM w
        |       WHERE word <> '' GROUP BY doc_id, word),
        |uw AS (SELECT DISTINCT word FROM wc),
        |enc AS (
        |  SELECT word, string_split(word, '') AS syms FROM uw
        |  UNION ALL
        |  SELECT word,
        |    syms[1:at-1] || [syms[at] || syms[at+1]] || syms[at+2:len(syms)]
        |      AS syms
        |  FROM (
        |    SELECT word, syms, list_position(rk, best) AS at, best
        |    FROM (
        |      SELECT word, syms,
        |        list_transform(range(1, len(syms)),
        |          i -> coalesce(map_extract(mm.m,
        |                 syms[i] || ' ' || syms[i+1])[1], 999999)) AS rk
        |      FROM enc CROSS JOIN (SELECT MAP {
        |        't h':0,'i n':1,'a n':2,'e r':3,'o n':4,'r e':5,'h e':6,
        |        'a t':7,'o r':8,'e n':9,'a l':10,'e s':11,'o u':12,
        |        'i t':13,'s t':14,'e d':15,'i s':16,'a r':17,'l e':18,
        |        'o m':19,'th e':20,'an d':21,'in g':22,'er s':23,
        |        'ou r':24,'re s':25,'at e':26,'it y':27,'al l':28,
        |        'st r':29,'on e':30,'en t':31,'ar e':32,'le s':33,
        |        'om e':34,'the r':35,'ing s':36,'ate s':37,'str a':38}
        |        AS m) mm) t1
        |    CROSS JOIN LATERAL (SELECT list_min(rk) AS best) t2) t3
        |  WHERE best IS NOT NULL AND best < 999999),
        |wtok AS (SELECT word, min(len(syms)) AS ntok FROM enc GROUP BY word),
        |dtok AS (
        |  SELECT d.doc_id, d.lang, coalesce(d.text, '') AS text,
        |    CAST(coalesce(sum(wc.n * wtok.ntok), 0) AS BIGINT) AS n_bpe_tokens
        |  FROM documents d
        |  LEFT JOIN wc ON d.doc_id = wc.doc_id
        |  LEFT JOIN wtok ON wc.word = wtok.word
        |  GROUP BY d.doc_id, d.lang, d.text),
        |sel AS (
        |  SELECT doc_id, lang, text, n_bpe_tokens,
        |    CAST(coalesce(sum(n_bpe_tokens) OVER (PARTITION BY lang
        |      ORDER BY substring(md5('bpe-mix-r11:' || CAST(doc_id AS VARCHAR)),
        |               1, 12), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_b
        |  FROM dtok WHERE lang IN ('en', 'es', 'de')),
        |kept AS (
        |  SELECT doc_id, text, n_bpe_tokens FROM sel
        |  WHERE cum_b < CASE lang WHEN 'en' THEN 6000
        |                          WHEN 'es' THEN 2500
        |                          ELSE 1200 END),
        |p AS (
        |  SELECT doc_id, text, n_bpe_tokens,
        |    CAST(floor(CAST(coalesce(sum(n_bpe_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |      / 1024) AS BIGINT) AS pack_id
        |  FROM kept)
        |SELECT pack_id, count(*) AS n_docs,
        |  CAST(sum(n_bpe_tokens) AS BIGINT) AS n_tokens,
        |  array_to_string(list(text ORDER BY doc_id), ' ') AS pack_text
        |FROM p GROUP BY pack_id""".stripMargin,

    // the c13 packing CTE, then the shard roll-up: floor(pack_id/4)
    // shards, data-card integers, and the same md5-of-ordered-pack-md5s
    // content digest (md5 is engine-portable, the Splits argument)
    "c15_shard_manifest" ->
      """WITH tok AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(coalesce(text, '')), '\s+'))
        |         END AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, n_tokens,
        |    CAST(floor(CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |      / 2048) AS BIGINT) AS pack_id
        |  FROM tok),
        |p AS (
        |  SELECT pack_id, count(*) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |    array_to_string(list(text ORDER BY doc_id), ' ') AS pack_text
        |  FROM c GROUP BY pack_id),
        |s AS (SELECT *, CAST(floor(CAST(pack_id AS DOUBLE) / 4) AS BIGINT)
        |        AS shard_id FROM p)
        |SELECT shard_id, count(*) AS n_packs,
        |  min(pack_id) AS pack_id_min, max(pack_id) AS pack_id_max,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  min(n_tokens) AS min_pack_tokens, max(n_tokens) AS max_pack_tokens,
        |  quantile_cont(n_tokens, 0.5) AS p50_pack_tokens,
        |  md5(string_agg(md5(pack_text), '' ORDER BY pack_id)) AS content_hash
        |FROM s GROUP BY shard_id""".stripMargin,

    // c14's merge-replay chain (lang kept through the mixing filter),
    // then c13's pack grouping at the 1024-BPE budget, then c15's shard
    // roll-up PLUS the per-shard language mix (c7's data card as an
    // ordered lang:docs:tokens string)
    "c16_bpe_export" ->
      """WITH RECURSIVE
        |w AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents WHERE length(trim(text)) > 0),
        |wc AS (SELECT doc_id, word, count(*) AS n FROM w
        |       WHERE word <> '' GROUP BY doc_id, word),
        |uw AS (SELECT DISTINCT word FROM wc),
        |enc AS (
        |  SELECT word, string_split(word, '') AS syms FROM uw
        |  UNION ALL
        |  SELECT word,
        |    syms[1:at-1] || [syms[at] || syms[at+1]] || syms[at+2:len(syms)]
        |      AS syms
        |  FROM (
        |    SELECT word, syms, list_position(rk, best) AS at, best
        |    FROM (
        |      SELECT word, syms,
        |        list_transform(range(1, len(syms)),
        |          i -> coalesce(map_extract(mm.m,
        |                 syms[i] || ' ' || syms[i+1])[1], 999999)) AS rk
        |      FROM enc CROSS JOIN (SELECT MAP {
        |        't h':0,'i n':1,'a n':2,'e r':3,'o n':4,'r e':5,'h e':6,
        |        'a t':7,'o r':8,'e n':9,'a l':10,'e s':11,'o u':12,
        |        'i t':13,'s t':14,'e d':15,'i s':16,'a r':17,'l e':18,
        |        'o m':19,'th e':20,'an d':21,'in g':22,'er s':23,
        |        'ou r':24,'re s':25,'at e':26,'it y':27,'al l':28,
        |        'st r':29,'on e':30,'en t':31,'ar e':32,'le s':33,
        |        'om e':34,'the r':35,'ing s':36,'ate s':37,'str a':38}
        |        AS m) mm) t1
        |    CROSS JOIN LATERAL (SELECT list_min(rk) AS best) t2) t3
        |  WHERE best IS NOT NULL AND best < 999999),
        |wtok AS (SELECT word, min(len(syms)) AS ntok FROM enc GROUP BY word),
        |dtok AS (
        |  SELECT d.doc_id, d.lang, coalesce(d.text, '') AS text,
        |    CAST(coalesce(sum(wc.n * wtok.ntok), 0) AS BIGINT) AS n_bpe_tokens
        |  FROM documents d
        |  LEFT JOIN wc ON d.doc_id = wc.doc_id
        |  LEFT JOIN wtok ON wc.word = wtok.word
        |  GROUP BY d.doc_id, d.lang, d.text),
        |sel AS (
        |  SELECT doc_id, lang, text, n_bpe_tokens,
        |    CAST(coalesce(sum(n_bpe_tokens) OVER (PARTITION BY lang
        |      ORDER BY substring(md5('bpe-mix-r11:' || CAST(doc_id AS VARCHAR)),
        |               1, 12), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_b
        |  FROM dtok WHERE lang IN ('en', 'es', 'de')),
        |kept AS (
        |  SELECT doc_id, lang, text, n_bpe_tokens FROM sel
        |  WHERE cum_b < CASE lang WHEN 'en' THEN 6000
        |                          WHEN 'es' THEN 2500
        |                          ELSE 1200 END),
        |p AS (
        |  SELECT doc_id, lang, text, n_bpe_tokens,
        |    CAST(floor(CAST(coalesce(sum(n_bpe_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |      / 1024) AS BIGINT) AS pack_id
        |  FROM kept),
        |pk AS (
        |  SELECT pack_id, count(*) AS n_docs,
        |    CAST(sum(n_bpe_tokens) AS BIGINT) AS n_tokens,
        |    array_to_string(list(text ORDER BY doc_id), ' ') AS pack_text
        |  FROM p GROUP BY pack_id),
        |s AS (SELECT *, CAST(floor(CAST(pack_id AS DOUBLE) / 4) AS BIGINT)
        |        AS shard_id FROM pk),
        |man AS (
        |  SELECT shard_id, count(*) AS n_packs,
        |    min(pack_id) AS pack_id_min, max(pack_id) AS pack_id_max,
        |    CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |    min(n_tokens) AS min_pack_tokens, max(n_tokens) AS max_pack_tokens,
        |    quantile_cont(n_tokens, 0.5) AS p50_pack_tokens,
        |    md5(string_agg(md5(pack_text), '' ORDER BY pack_id)) AS content_hash
        |  FROM s GROUP BY shard_id),
        |pl AS (
        |  SELECT CAST(floor(CAST(pack_id AS DOUBLE) / 4) AS BIGINT) AS shard_id,
        |    lang, count(*) AS n,
        |    CAST(sum(n_bpe_tokens) AS BIGINT) AS tk
        |  FROM p GROUP BY 1, lang),
        |mix AS (
        |  SELECT shard_id,
        |    string_agg(lang || ':' || CAST(n AS VARCHAR) || ':' ||
        |      CAST(tk AS VARCHAR), ',' ORDER BY lang) AS lang_mix
        |  FROM pl GROUP BY shard_id)
        |SELECT man.*, mix.lang_mix FROM man JOIN mix USING (shard_id)""".stripMargin,

    // the oracle states packing as the classic single-window form the
    // operator distributes
    "c2_token_packing" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS cum_before,
        |  CAST(floor(CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |    / 2048) AS BIGINT) AS pack_id
        |FROM tok""".stripMargin,

    // DuckDB range() is stop-EXCLUSIVE where Spark sequence() is
    // stop-inclusive: range(0, len, step) == sequence(0, len-1, step)
    // for positive step
    "c4_chunking" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents WHERE length(trim(text)) > 0),
        |c AS (
        |  SELECT doc_id, s.i AS start_tok,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY s.i) - 1
        |           AS chunk_id,
        |         ws[s.i + 1 : s.i + 48] AS chunk
        |  FROM d, LATERAL (SELECT unnest(range(0, greatest(len(ws) - 8, 1), 40)) AS i) s)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |       CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
        |       array_to_string(chunk, ' ') AS chunk_text
        |FROM c""".stripMargin,

    "c6_decontam" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(
        |      range(1, len(string_split_regex(trim(text), '\s+'))),
        |      i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
        |           string_split_regex(trim(text), '\s+')[i+1])) AS s
        |  FROM documents),
        |c AS (SELECT doc_id AS corpus_id, s FROM sh WHERE doc_id % 25 <> 0),
        |r AS (SELECT doc_id AS ref_id, s FROM sh WHERE doc_id % 25 = 0)
        |SELECT corpus_id, ref_id,
        |       CAST(len(list_intersect(c.s, r.s)) AS DOUBLE) /
        |       CAST(len(c.s) + len(r.s) - len(list_intersect(c.s, r.s)) AS DOUBLE)
        |         AS jaccard
        |FROM c, r
        |WHERE CAST(len(list_intersect(c.s, r.s)) AS DOUBLE) /
        |      CAST(len(c.s) + len(r.s) - len(list_intersect(c.s, r.s)) AS DOUBLE)
        |      >= 0.5""".stripMargin,

    // the Bloom is pure cost-shaping: the exact semantics ARE the plain
    // anti-join, so the oracle is a NOT EXISTS on the key itself
    "c9_bloom_decontam" ->
      """SELECT d.doc_id, d.lang, d.n_chars FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM documents r
        |                  WHERE r.doc_id % 7 = 0 AND r.text = d.text)""".stripMargin,

    // rate thresholds: Splits.thresholdHex(0.5) = 800000000000,
    // thresholdHex(0.25) = 400000000000
    "c5_mix_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (lang = 'en')
        |   OR (lang = 'es' AND substring(md5('mix-r3:' || CAST(doc_id AS VARCHAR)), 1, 12)
        |         < '800000000000')
        |   OR (lang = 'de' AND substring(md5('mix-r3:' || CAST(doc_id AS VARCHAR)), 1, 12)
        |         < '400000000000')""".stripMargin,

    // thresholds are the 12-hex-digit cumulative fractions 0.1 and 0.2
    // (Splits.thresholdHex); lowercase-hex order == numeric order
    "c3_hash_split" ->
      """SELECT doc_id,
        |  CASE WHEN substring(md5('graft-r3:' || CAST(doc_id AS VARCHAR)), 1, 12)
        |            < '199999999999' THEN 'val'
        |       WHEN substring(md5('graft-r3:' || CAST(doc_id AS VARCHAR)), 1, 12)
        |            < '333333333333' THEN 'test'
        |       ELSE 'train' END AS split
        |FROM documents""".stripMargin,

    // c25: the span construction verbatim, distinct 3-gram sets, then
    // brute-force containment of each eval set in each train set
    "c25_containment_decontam" ->
      """WITH sp AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(1, 14 + doc_id % 5),
        |      p -> 'quote' || CAST(doc_id % 5 AS VARCHAR) || 'w' ||
        |           CAST(p AS VARCHAR)), ' ') AS span,
        |    text
        |  FROM documents),
        |ev AS (SELECT doc_id AS eval_doc, span AS text FROM sp
        |       WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id AS train_doc,
        |         CASE WHEN doc_id % 23 = 0 THEN text || ' ' || span
        |              ELSE text END AS text
        |       FROM sp WHERE doc_id % 97 <> 0),
        |es AS (SELECT eval_doc,
        |         list_distinct(list_transform(
        |           range(1, len(string_split_regex(trim(text), '\s+')) - 1),
        |           i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
        |                string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
        |                string_split_regex(trim(text), '\s+')[i+2])) AS sh
        |       FROM ev
        |       WHERE len(string_split_regex(trim(text), '\s+')) >= 3),
        |ts AS (SELECT train_doc,
        |         list_distinct(list_transform(
        |           range(1, len(string_split_regex(trim(text), '\s+')) - 1),
        |           i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
        |                string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
        |                string_split_regex(trim(text), '\s+')[i+2])) AS sh
        |       FROM tr
        |       WHERE len(string_split_regex(trim(text), '\s+')) >= 3),
        |p AS (SELECT t.train_doc, e.eval_doc,
        |        CAST(len(list_intersect(e.sh, t.sh)) AS BIGINT) AS n_shared,
        |        len(e.sh) AS sz
        |      FROM ts t, es e)
        |SELECT train_doc, eval_doc, n_shared,
        |  CAST(n_shared AS DOUBLE) / sz AS containment
        |FROM p WHERE CAST(n_shared AS DOUBLE) / sz >= 0.9""".stripMargin,

    // c27: the c12 merge-replay CTEs for per-doc BPE counts, plus
    // whitespace word counts and UTF-8 byte lengths (NULL text
    // coalesced identically), rolled up per language with one-division
    // round-6 ratios
    "c27_bpe_fertility" ->
      """WITH RECURSIVE
        |w AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents WHERE length(trim(text)) > 0),
        |wc AS (SELECT doc_id, word, count(*) AS n FROM w
        |       WHERE word <> '' GROUP BY doc_id, word),
        |uw AS (SELECT DISTINCT word FROM wc),
        |enc AS (
        |  SELECT word, string_split(word, '') AS syms FROM uw
        |  UNION ALL
        |  SELECT word,
        |    syms[1:at-1] || [syms[at] || syms[at+1]] || syms[at+2:len(syms)]
        |      AS syms
        |  FROM (
        |    SELECT word, syms, list_position(rk, best) AS at, best
        |    FROM (
        |      SELECT word, syms,
        |        list_transform(range(1, len(syms)),
        |          i -> coalesce(map_extract(mm.m,
        |                 syms[i] || ' ' || syms[i+1])[1], 999999)) AS rk
        |      FROM enc CROSS JOIN (SELECT MAP {
        |        't h':0,'i n':1,'a n':2,'e r':3,'o n':4,'r e':5,'h e':6,
        |        'a t':7,'o r':8,'e n':9,'a l':10,'e s':11,'o u':12,
        |        'i t':13,'s t':14,'e d':15,'i s':16,'a r':17,'l e':18,
        |        'o m':19,'th e':20,'an d':21,'in g':22,'er s':23,
        |        'ou r':24,'re s':25,'at e':26,'it y':27,'al l':28,
        |        'st r':29,'on e':30,'en t':31,'ar e':32,'le s':33,
        |        'om e':34,'the r':35,'ing s':36,'ate s':37,'str a':38}
        |        AS m) mm) t1
        |    CROSS JOIN LATERAL (SELECT list_min(rk) AS best) t2) t3
        |  WHERE best IS NOT NULL AND best < 999999),
        |wtok AS (SELECT word, min(len(syms)) AS ntok FROM enc GROUP BY word),
        |dtok AS (
        |  SELECT d.doc_id, d.lang,
        |    CAST(coalesce(sum(wc.n * wtok.ntok), 0) AS BIGINT) AS n_bpe,
        |    CASE WHEN length(trim(coalesce(d.text, ''))) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(coalesce(d.text, '')),
        |                '\s+')) END AS n_words,
        |    octet_length(encode(coalesce(d.text, ''))) AS n_bytes
        |  FROM documents d
        |  LEFT JOIN wc ON d.doc_id = wc.doc_id
        |  LEFT JOIN wtok ON wc.word = wtok.word
        |  GROUP BY d.doc_id, d.lang, d.text),
        |agg AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_words) AS BIGINT) AS n_words,
        |    CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
        |    CAST(sum(n_bytes) AS BIGINT) AS n_bytes
        |  FROM dtok GROUP BY lang)
        |SELECT lang, n_docs, n_words, n_bpe_tokens, n_bytes,
        |  CASE WHEN n_words = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE round(CAST(n_bpe_tokens AS DOUBLE) / n_words, 6) END
        |    AS fertility,
        |  CASE WHEN n_bpe_tokens = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE round(CAST(n_bytes AS DOUBLE) / n_bpe_tokens, 6) END
        |    AS bytes_per_token
        |FROM agg""".stripMargin,

    // c26: the c25 CTEs + the per-train-doc rollup and verdict CASE —
    // every train doc gets a manifest row
    "c26_decontam_action" ->
      """WITH sp AS (
        |  SELECT doc_id,
        |    array_to_string(list_transform(range(1, 14 + doc_id % 5),
        |      p -> 'quote' || CAST(doc_id % 5 AS VARCHAR) || 'w' ||
        |           CAST(p AS VARCHAR)), ' ') AS span,
        |    text
        |  FROM documents),
        |ev AS (SELECT doc_id AS eval_doc, span AS text FROM sp
        |       WHERE doc_id % 97 = 0),
        |tr AS (SELECT doc_id AS train_doc,
        |         CASE WHEN doc_id % 23 = 0 THEN text || ' ' || span
        |              ELSE text END AS text
        |       FROM sp WHERE doc_id % 97 <> 0),
        |es AS (SELECT eval_doc,
        |         list_distinct(list_transform(
        |           range(1, len(string_split_regex(trim(text), '\s+')) - 1),
        |           i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
        |                string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
        |                string_split_regex(trim(text), '\s+')[i+2])) AS sh
        |       FROM ev
        |       WHERE len(string_split_regex(trim(text), '\s+')) >= 3),
        |ts AS (SELECT train_doc,
        |         list_distinct(list_transform(
        |           range(1, len(string_split_regex(trim(text), '\s+')) - 1),
        |           i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
        |                string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
        |                string_split_regex(trim(text), '\s+')[i+2])) AS sh
        |       FROM tr
        |       WHERE len(string_split_regex(trim(text), '\s+')) >= 3),
        |p AS (SELECT t.train_doc, e.eval_doc,
        |        CAST(len(list_intersect(e.sh, t.sh)) AS BIGINT) AS n_shared,
        |        len(e.sh) AS sz
        |      FROM ts t, es e),
        |h AS (SELECT train_doc, CAST(count(*) AS BIGINT) AS n_eval_hits,
        |        max(CAST(n_shared AS DOUBLE) / sz) AS mc
        |      FROM p WHERE CAST(n_shared AS DOUBLE) / sz >= 0.9
        |      GROUP BY train_doc)
        |SELECT tr.train_doc,
        |  coalesce(h.n_eval_hits, 0) AS n_eval_hits,
        |  round(coalesce(h.mc, CAST(0 AS DOUBLE)), 6) AS max_containment,
        |  CASE WHEN h.n_eval_hits IS NOT NULL THEN 'blocked'
        |       ELSE 'released' END AS verdict
        |FROM tr LEFT JOIN h USING (train_doc)""".stripMargin,

    // c28: the h2 TF-IDF CTEs over the UNION corpus at dim 256. The
    // planted scramble needs no text reconstruction in SQL — sorting
    // tokens cannot change the bag, so the planted eval item's
    // postings ARE the source doc's postings under id+10M. Sparse
    // cosine over shared buckets, round-6 before the θ = 0.9
    // threshold, then the c26 manifest rollup.
    // the same digest (md5 over the unit-separated, null-tagged value
    // concatenation) on both engines; chr(31) IS Spark's \u001f
    "c29_dataset_diff" ->
      """WITH a AS (
        |  SELECT doc_id,
        |         md5(coalesce(CAST(text AS VARCHAR), '<null>') || chr(31) ||
        |             coalesce(CAST(lang AS VARCHAR), '<null>')) AS hash_a
        |  FROM documents WHERE doc_id IS NOT NULL),
        |b0 AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 37 = 0 THEN text || ' [v2]'
        |              ELSE text END AS text,
        |         lang
        |  FROM documents WHERE doc_id % 31 <> 0
        |  UNION ALL
        |  SELECT doc_id + 20000000, text, lang
        |  FROM documents WHERE doc_id % 41 = 0),
        |b AS (
        |  SELECT doc_id,
        |         md5(coalesce(CAST(text AS VARCHAR), '<null>') || chr(31) ||
        |             coalesce(CAST(lang AS VARCHAR), '<null>')) AS hash_b
        |  FROM b0 WHERE doc_id IS NOT NULL)
        |SELECT coalesce(a.doc_id, b.doc_id) AS key,
        |       CASE WHEN a.doc_id IS NULL THEN 'added'
        |            WHEN b.doc_id IS NULL THEN 'removed'
        |            ELSE 'changed' END AS status,
        |       hash_a, hash_b
        |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        |WHERE hash_a IS DISTINCT FROM hash_b""".stripMargin,

    "c28_semantic_decontam" ->
      """WITH corp AS (
        |  SELECT doc_id AS id, text FROM documents),
        |toks AS (
        |  SELECT id, unnest(string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ')) AS term
        |  FROM corp),
        |post0 AS (
        |  SELECT id, term, count(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY id, term),
        |post AS (
        |  SELECT id, term, tf FROM post0
        |  UNION ALL
        |  SELECT id + 10000000, term, tf FROM post0
        |  WHERE id % 20 <> 0 AND id % 23 = 0),
        |b AS (
        |  SELECT id, tf,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(term, ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (a, c) -> (a * 31 + c) % 1000000007) % 256 AS bucket
        |  FROM post),
        |bt AS (SELECT id, bucket, CAST(sum(tf) AS BIGINT) AS btf
        |       FROM b GROUP BY id, bucket),
        |nn AS (SELECT CAST(count(DISTINCT id) AS BIGINT) AS n FROM post),
        |dfb AS (SELECT bucket, CAST(count(DISTINCT id) AS BIGINT) AS dfb
        |        FROM bt GROUP BY bucket),
        |w AS (
        |  SELECT id, bucket,
        |    btf * (ln((n + 1.0) / (dfb + 1.0)) + 1.0) AS w
        |  FROM bt JOIN dfb USING (bucket) CROSS JOIN nn),
        |nrm AS (SELECT id, sqrt(sum(w * w)) AS nm FROM w GROUP BY id),
        |wn AS (SELECT id, bucket, w / nm AS wt
        |       FROM w JOIN nrm USING (id)),
        |trv AS (SELECT * FROM wn WHERE id < 10000000 AND id % 20 <> 0),
        |evv AS (SELECT * FROM wn WHERE id >= 10000000 OR id % 20 = 0),
        |sp AS (
        |  SELECT trv.id AS train_doc, evv.id AS eval_doc,
        |    round(sum(trv.wt * evv.wt), 6) AS c
        |  FROM trv JOIN evv ON trv.bucket = evv.bucket
        |  GROUP BY trv.id, evv.id),
        |h AS (SELECT train_doc, CAST(count(*) AS BIGINT) AS n_eval_hits,
        |        max(c) AS mc
        |      FROM sp WHERE c >= 0.9 GROUP BY train_doc),
        |alltr AS (SELECT doc_id AS train_doc FROM documents
        |          WHERE doc_id % 20 <> 0)
        |SELECT alltr.train_doc,
        |  coalesce(h.n_eval_hits, 0) AS n_eval_hits,
        |  round(coalesce(h.mc, CAST(0 AS DOUBLE)), 6) AS max_cosine,
        |  CASE WHEN h.n_eval_hits IS NOT NULL THEN 'blocked'
        |       ELSE 'released' END AS verdict
        |FROM alltr LEFT JOIN h USING (train_doc)""".stripMargin,

    // c24: the d8 recursive-closure CTEs verbatim, then the c3 split
    // CASE keyed on the COMPONENT
    "c24_leakfree_split" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        |s AS (SELECT doc_id,
        |        list_distinct(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS sh
        |      FROM d),
        |j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |        CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
        |      FROM s a, s b WHERE a.doc_id < b.doc_id),
        |p AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= 0.5),
        |e AS (SELECT doc_a AS u, doc_b AS v FROM p
        |      UNION ALL SELECT doc_b AS u, doc_a AS v FROM p),
        |reach(node, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT reach.node, e.v FROM reach JOIN e ON reach.r = e.u),
        |comp AS (SELECT node AS doc_id, min(r) AS component
        |         FROM reach GROUP BY node)
        |SELECT doc_id, component,
        |  CASE WHEN substring(md5('leakfree-r14:' || CAST(component AS VARCHAR)), 1, 12)
        |            < '199999999999' THEN 'val'
        |       WHEN substring(md5('leakfree-r14:' || CAST(component AS VARCHAR)), 1, 12)
        |            < '333333333333' THEN 'test'
        |       ELSE 'train' END AS split
        |FROM comp""".stripMargin,

    // the window states what cumSumBeforeBy distributes; hash order and
    // thresholds mirror Splits (md5 'salt:id', 12 hex digits)
    "c8_budget_sample" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        |    substring(md5('budget-r6:' || CAST(doc_id AS VARCHAR)), 1, 12) AS hk
        |  FROM documents WHERE lang IN ('en', 'es', 'de')),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY hk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_before
        |  FROM d)
        |SELECT doc_id, lang, n_tokens, cum_before FROM c
        |WHERE cum_before < CASE lang WHEN 'en' THEN 4000
        |                             WHEN 'es' THEN 1500
        |                             ELSE 800 END""".stripMargin,

    // c23: the temperature weight CTEs (observed mass -> pow(1/T) ->
    // round-12 share -> floor budget, min 1), then the c8 window with
    // the budget JOINED instead of CASE'd
    "c23_temperature_mix" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        |    substring(md5('temp-mix-r14:' || CAST(doc_id AS VARCHAR)), 1, 12) AS hk
        |  FROM documents WHERE lang IS NOT NULL),
        |m AS (SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS mass
        |      FROM d GROUP BY lang),
        |q AS (SELECT lang, pow(mass, 1.0 / 2.0) AS w FROM m),
        |b AS (SELECT lang,
        |        greatest(CAST(1 AS BIGINT),
        |          CAST(floor(round(w / (SELECT sum(w) FROM q), 12) * 8000)
        |            AS BIGINT)) AS budget
        |      FROM q),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY hk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_before
        |  FROM d)
        |SELECT c.doc_id, c.lang, c.n_tokens, c.cum_before
        |FROM c JOIN b ON c.lang = b.lang
        |WHERE c.cum_before < b.budget""".stripMargin,

    // the t12 scoring CTE (per-doc hashed-gram linear score), the
    // quartile-boundary bucket CASE, then c8's hash-ordered
    // per-stratum budget window
    "c17_quality_mix" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(ws) AS gram FROM toks
        |  UNION ALL
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |           i -> ws[i] || ' ' || ws[i+1])) AS gram
        |  FROM toks),
        |b AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(gram, ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (a, c) -> (a * 31 + c) % 1000000007) % 2048 AS bkt
        |  FROM g WHERE gram <> ''),
        |sc AS (
        |  SELECT doc_id,
        |    CAST(sum((bkt * 2654435761) % 2003 - 1001) AS BIGINT) AS s
        |  FROM b GROUP BY doc_id),
        |d AS (
        |  SELECT d.doc_id,
        |    CASE WHEN length(trim(coalesce(d.text, ''))) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(coalesce(d.text, '')),
        |                  '\s+')) END AS n_tokens,
        |    coalesce(s, 0) AS q
        |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
        |k AS (
        |  SELECT doc_id,
        |    CASE WHEN q >= 8000 THEN 'high'
        |         WHEN q >= 0 THEN 'mid' ELSE 'low' END AS bucket,
        |    n_tokens, q
        |  FROM d),
        |c AS (
        |  SELECT doc_id, bucket, n_tokens, q,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY bucket
        |      ORDER BY substring(md5('quality-mix-r12:' ||
        |               CAST(doc_id AS VARCHAR)), 1, 12), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM k)
        |SELECT doc_id, bucket, n_tokens, q AS quality_score, cum_before
        |FROM c
        |WHERE cum_before < CASE bucket WHEN 'high' THEN 8000
        |                               WHEN 'mid' THEN 4000
        |                               ELSE 1000 END""".stripMargin,

    // the t14 DSIR-weight CTEs (tokenizer/postings, two smoothed
    // unigram models, per-doc tf-weighted log-ratio sum), then a
    // weight-DESC-ordered c8 budget window per language
    "c19_dsir_resample" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY doc_id, term),
        |src AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf_s
        |        FROM post GROUP BY term),
        |tg AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf_t
        |       FROM post JOIN documents USING (doc_id)
        |       WHERE lang = 'en' GROUP BY term),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total_s,
        |               CAST(count(DISTINCT term) AS BIGINT) AS v
        |        FROM post),
        |tott AS (SELECT CAST(coalesce(sum(tf), 0) AS BIGINT) AS total_t
        |         FROM post JOIN documents USING (doc_id)
        |         WHERE lang = 'en'),
        |lr AS (
        |  SELECT term,
        |    ln((coalesce(cf_t, 0) + 1.0) / (total_t + v)) -
        |    ln((cf_s + 1.0) / (total_s + v)) AS lrv
        |  FROM src LEFT JOIN tg USING (term)
        |  CROSS JOIN tot CROSS JOIN tott),
        |w AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len,
        |    round(sum(tf * lrv), 6) AS log_w
        |  FROM post JOIN lr USING (term)
        |  GROUP BY doc_id),
        |d AS (
        |  SELECT w.doc_id, documents.lang, w.len, w.log_w
        |  FROM w JOIN documents USING (doc_id)
        |  WHERE lang IN ('en', 'es', 'de')),
        |c AS (
        |  SELECT doc_id, lang, len, log_w,
        |    CAST(coalesce(sum(len) OVER (PARTITION BY lang
        |      ORDER BY log_w DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM d)
        |SELECT doc_id, lang, len, log_w, cum_before FROM c
        |WHERE cum_before < CASE lang WHEN 'en' THEN 3000
        |                             WHEN 'es' THEN 1200
        |                             ELSE 600 END""".stripMargin,

    // the c15 pack-id CTEs feeding the c20 address CTEs over pack_id
    "c21_epoch_read" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(coalesce(text, '')), '\s+'))
        |         END AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(floor(CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |      / 2048) AS BIGINT) AS pack_id
        |  FROM tok),
        |pk AS (SELECT DISTINCT pack_id FROM c),
        |k AS (SELECT pack_id,
        |        CAST(floor(CAST(pack_id AS DOUBLE) / 4) AS BIGINT)
        |          AS file_shard,
        |        md5('epoch-read-r13:1:' || CAST(pack_id AS VARCHAR)) AS hk
        |      FROM pk),
        |a AS (SELECT pack_id, file_shard, hk,
        |        CAST(CAST('0x' || substring(hk, 1, 6) AS BIGINT) % 8 AS INT)
        |          AS read_shard
        |      FROM k)
        |SELECT pack_id, file_shard, read_shard,
        |  CAST(row_number() OVER (PARTITION BY read_shard
        |                          ORDER BY hk, pack_id) AS BIGINT) AS pos
        |FROM a""".stripMargin,

    // the operator's address arithmetic verbatim: same md5 key, shard
    // from the first 6 hex digits (DuckDB's 0x-cast == Spark's conv),
    // pos as the in-shard rank with the same id tie-break
    "c20_epoch_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    md5('epoch-shuffle-r13:1:' || CAST(doc_id AS VARCHAR)) AS hk
        |  FROM documents),
        |s AS (SELECT doc_id, hk,
        |        CAST(CAST('0x' || substring(hk, 1, 6) AS BIGINT) % 8 AS INT)
        |          AS shard
        |      FROM k)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hk, doc_id)
        |       AS BIGINT) AS pos
        |FROM s""".stripMargin,

    "c7_data_card" ->
      """WITH d AS (
        |  SELECT lang,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        |  FROM documents)
        |SELECT lang,
        |       count(*) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |       min(n_tokens) AS min_tokens,
        |       max(n_tokens) AS max_tokens,
        |       quantile_cont(n_tokens, 0.5) AS p50_tokens
        |FROM d GROUP BY lang""".stripMargin
  )

  // c32's dispatch lands on the exact branch at any real broadcast
  // budget (the eval triples are benchmark-sized), so the report equals
  // c28's row-for-row — its oracle applies verbatim (the s16 stance)
  val oracles: Map[String, String] =
    oracles0 + ("c32_semantic_auto" -> oracles0("c28_semantic_decontam"))
}
