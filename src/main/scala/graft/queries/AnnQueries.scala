package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.AnnSearch
import graft.queries.Tables.t

/** Similarity-search battery over the `embeddings` table: brute-force
  * cosine top-k (oracle: DuckDB `list_cosine_similarity`), LSH-bucketed
  * approximate variant (rows-only + recall assertion in AnnSpec), and
  * embedding-cosine near-dup pairs. */
object AnnQueries {

  /** The a6 IVF index's 75%-of-corpus BASE build, once per (JVM, sf
    * dir) — [[IndexMemo]]. Deliberately NOT the full corpus: a6's
    * in-query `refreshIvf` then performs the real incremental delta
    * (the remaining 25%) on its first invocation, keeping the
    * incremental-refresh machinery inside the gate query, and a cheap
    * no-delta staleness pass on every later one — the steady-state
    * maintenance shape a recurring pipeline actually pays. */
  private[graft] def ivfIndexPath(s: SparkSession, dir: String): String =
    IndexMemo.path(s"ivf:$dir") { path =>
      graft.pipeline.SilverIndex.refreshIvf(
        t(s, dir, "embeddings").where(col("vec_id") % 4 =!= 0),
        "vec_id", "embedding", nlist = 16, path = path)
      ()
    }

  /** Per-(JVM, sf dir) embeddings stats memo — the [[AnnSearch.knnJoin]]
    * hint source (VERDICT r10 task 5): (n, dim) derive ONCE per corpus
    * from a filter-less parquet count (footer metadata under the
    * session's aggregate-pushdown conf, see [[graft.Sessions]]) plus a
    * single first-row dim probe, instead of knnJoin re-running both
    * probe jobs on every call (bench runs the auto path three times a
    * pass). On a real deployment the same numbers come from catalog
    * stats or a stored index's sidecar; the memo is that sidecar for
    * gate tables. */
  private val embStatsMemo =
    scala.collection.concurrent.TrieMap.empty[String, (Long, Int)]
  private[graft] def embStats(s: SparkSession, dir: String): (Long, Int) =
    embStatsMemo.getOrElseUpdate(dir, {
      val emb = t(s, dir, "embeddings")
      val n = emb.count()
      // headOption fallback (ADVICE r11): an empty or all-null/empty
      // vector table degrades to dim 0 — the same graceful shape as
      // knnJoin's own probe — instead of NoSuchElementException
      val dim = emb.select(size(col("embedding")).as("d"))
        .where(col("d") > 0).head(1)
        .headOption.map(_.getInt(0)).getOrElse(0)
      (n, dim)
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_ann_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      AnnSearch.bruteForceTopK(
        emb.where(col("vec_id") % 50 === 0), emb, "vec_id", "embedding", k = 5)
    }),

    // EXACT kNN self-join — a12's declared oracle baseline (the same
    // role a1 plays for a2/a3): every corpus vector's true k nearest
    // neighbors by broadcast brute force. Deterministic doubles (the a1
    // cosine convention both engines agree on bit-exactly) → full
    // DuckDB oracle.
    "a13_knn_exact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      AnnSearch.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 3)
    }),

    "a2_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      AnnSearch.lshTopK(
        emb.where(col("vec_id") % 50 === 0), emb, "vec_id", "embedding",
        k = 5, bits = 8, tables = 8, probeHamming = 1)
    }),

    // Metadata-FILTERED vector search (r12): top-k among only the
    // members satisfying an attribute predicate (label = 2 — the
    // embeddings table's own metadata column), with PRE-filter
    // semantics: the filter composes before ranking, so the result is
    // exactly the top-k of the eligible subset — never a post-filtered
    // top-k that silently returns fewer than k eligible rows. This is
    // the exact baseline (brute force over the filtered corpus, the a1
    // oracle with the predicate pushed into the corpus CTE — full
    // DuckDB oracle); the scale path is the SAME predicate as a
    // semi-join into the persisted IVF index's assignment table
    // (SilverIndex.ivfTopKFromIndexWhere — candidates are probed lists
    // ∩ eligible; SilverIndexSpec pins subset + recall vs this exact
    // baseline).
    "a15_filtered_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      AnnSearch.bruteForceTopK(
        emb.where(col("vec_id") % 50 === 0),
        emb.where(col("label") === 2), "vec_id", "embedding", k = 5)
    }),

    "a3_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      AnnSearch.ivfTopK(
        emb.where(col("vec_id") % 50 === 0), emb, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6)
    }),

    // a18 (r13): recall@5 EVALUATION as a first-class operator
    // (operators/Eval) — the machinery behind every in-gate recall
    // contract, here scoring a8's SQ8-quantized top-5 against a1's
    // exact baseline. Both inputs are themselves ORACLE-proven, so the
    // eval composes to a full oracle (the a8 CTEs ∘ the a1 CTEs).
    "a18_recall_eval" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 50 === 0)
      val exact = AnnSearch.bruteForceTopK(q, emb, "vec_id", "embedding",
        k = 5)
      val approx = AnnSearch.quantizedTopK(q, emb, "vec_id", "embedding",
        k = 5, levels = 127, rescoreMult = 4)
      graft.operators.Eval.recallAtK(approx, exact,
          "query_id", "neighbor_id", "rank", k = 5)
        .select(col("q").as("query_id"), col("n_exact"), col("n_hit"),
          col("recall"))
    }),

    // a19 (r14): MRR/hit@k EVALUATION — a18's recall asks "how much of
    // the truth came back"; this asks "how far DOWN the list was the
    // first true answer" (operators/Eval.mrrAtK), scoring a8's
    // SQ8-quantized top-5 against a1's exact top-3 as the relevance
    // set. Integer ranks + one exact reciprocal -> full oracle (the
    // a8 CTEs ∘ the a1 CTEs ∘ a min-rank rollup).
    "a19_mrr_eval" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 50 === 0)
      val exact = AnnSearch.bruteForceTopK(q, emb, "vec_id", "embedding",
        k = 5)
      val approx = AnnSearch.quantizedTopK(q, emb, "vec_id", "embedding",
        k = 5, levels = 127, rescoreMult = 4)
      graft.operators.Eval.mrrAtK(approx, exact,
          "query_id", "neighbor_id", "rank", k = 5, relK = 3)
        .select(col("q").as("query_id"), col("n_rel"), col("first_rank"),
          col("rr"), col("hit"))
    }),

    // a20 (r14): nDCG@5 EVALUATION — the graded completion of the eval
    // trio (a18 recall: what came back; a19 MRR: where the first
    // answer sat; nDCG: how well the whole ORDER matches). Gains are
    // integers (k−rank+1), log2 rides round(…,6) -> full oracle over
    // the same a8∘a1 CTEs.
    "a20_ndcg_eval" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 50 === 0)
      val exact = AnnSearch.bruteForceTopK(q, emb, "vec_id", "embedding",
        k = 5)
      val approx = AnnSearch.quantizedTopK(q, emb, "vec_id", "embedding",
        k = 5, levels = 127, rescoreMult = 4)
      graft.operators.Eval.ndcgAtK(approx, exact,
          "query_id", "neighbor_id", "rank", k = 5)
        .select(col("q").as("query_id"), col("dcg"), col("idcg"),
          col("ndcg"))
    }),

    // a17 (r13): MMR diversity re-ranking over a1's exact top-10 — the
    // redundancy-suppression pass retrieval pipelines run before
    // serving k results (operators/Mmr). Greedy trajectory pinned
    // (9-decimal MMR rounding, id tie-breaks, the a1 cosine
    // convention) -> exact oracle as 3 unrolled greedy CTEs.
    "a17_mmr_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val top = AnnSearch.bruteForceTopK(
        emb.where(col("vec_id") % 50 === 0), emb, "vec_id", "embedding",
        k = 10)
      val cands = top.join(
        emb.select(col("vec_id").as("neighbor_id"), col("embedding")),
        "neighbor_id")
      graft.operators.Mmr.rerank(cands, "query_id", "neighbor_id",
          "cosine", "embedding", k = 3, lambda = 0.7)
        .select(col("query_id"), col("neighbor_id"), col("mmr_rank"),
          col("mmr_score"))
    }),

    // a16 (r13): engine-replayable fixed-iteration Lloyd k-means — the
    // clustering primitive under SemDeDup blocks / IVF coarse
    // quantizers, pinned (hash-rank init, sequential-fold distances,
    // per-round 12-decimal centroid rounding) so the whole 2-round
    // trajectory replays EXACTLY in DuckDB as unrolled CTEs (the
    // x4 PageRank discipline applied to clustering).
    "a16_kmeans" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.KMeans.fixedIter(emb, "vec_id", "embedding",
          k = 8, iters = 2)
        .select(col("id").as("vec_id"), col("cluster"), col("dist2"))
    }),

    // kNN SELF-join: the whole corpus is the query set (kNN-graph
    // build), served by the partitioned list_id join — no broadcastable
    // side required. Deterministic (frozen Lloyd quantizer, exact
    // cosine, bit-stable ranking) → golden-pinned at both sfs; the a11
    // battery additionally pins EQUALITY vs the broadcast ivfTopK shape
    // on a query sample.
    "a12_knn_join" -> ((s, dir) =>
      AnnSearch.knnJoinIvf(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, nlist = 16, nprobe = 6)),

    // The AUTO-dispatched kNN self-join (r9): knnJoin estimates the
    // probe-side broadcast bytes against the session budget and picks
    // the shape itself — at gate scale that is the broadcast ivfTopK
    // form (6.3 MB probe side at sf0.1 vs the 64 MB budget). Its golden
    // content hash is INTENTIONALLY equal to a12's at both sfs: the
    // dispatcher choosing a different join strategy must never change a
    // row, and the shared pin makes any divergence (or a dispatch
    // regression flipping the regime and then diverging) driver-
    // visible every round. AnnSpec drives the partitioned regime and
    // pins the byte-boundary decision rule.
    // r11: the gate closure supplies the stat hints (embStats memo), so
    // the dispatcher's per-call corpus probes are gone from the auto
    // path — tools/knnhint_r11.txt carries the job-count A/B; hints are
    // a cost knob only (AnnSpec pins hint-invariance of the rows)
    "a14_knn_auto" -> ((s, dir) => {
      val (n, dim) = embStats(s, dir)
      AnnSearch.knnJoin(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, nlist = 16, nprobe = 6, rowCountHint = n, dimHint = dim)
    }),

    // Incremental IVF through the driver gate (no-oracle, golden-pinned):
    // quantizer built and FROZEN on 75% of the corpus, delta refresh
    // folds in the rest (assignments compute only for new ids —
    // SilverIndexSpec pins the counts), queries served from the
    // PERSISTED index. Deterministic end-to-end (hash-sampled seeds +
    // fixed-point Lloyd means + per-row assignment), so the content hash
    // pins it at both scales.
    "a6_incr_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // the 75% base build happens once per (JVM, sf dir) — IndexMemo;
      // the query itself then runs the steady-state maintenance shape:
      // a full incremental refresh (folds in the remaining 25% on the
      // first invocation, a cheap no-delta staleness pass after) and a
      // probe served from the persisted index. ProfA6 +
      // tools/a6_floor_r9.txt carry the from-cold vs steady split.
      val path = ivfIndexPath(s, dir)
      graft.pipeline.SilverIndex.refreshIvf(emb, "vec_id", "embedding",
        nlist = 16, path = path)
      graft.pipeline.SilverIndex.ivfTopKFromIndex(
        emb.where(col("vec_id") % 50 === 0), "vec_id", "embedding",
        path, k = 5, nprobe = 6)
    }),

    // Int8 scalar quantization of the embedding corpus (normalize →
    // floor(x/||v||·127), one codegen pass) — the 4×-narrower ANN
    // storage/shuffle representation. posexplode to scalar rows (the
    // gate compare can't hash arrays, the m3 pattern); the oracle
    // recomputes per-element on DuckDB's own list machinery.
    "a7_vec_quantize" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(graft.functions.VectorFunctions
            .normQuantI8(col("embedding"), 127)).as(Seq("pos", "q")))),

    // SQ8 ANN: int8-code candidate scoring + exact-cosine rescore of the
    // top 4k. Deterministic end-to-end (integer dots have no reduction-
    // order sensitivity), so unlike a2/a3 this approximate path gets a
    // REAL DuckDB oracle.
    "a8_ann_quantized" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      AnnSearch.quantizedTopK(
        emb.where(col("vec_id") % 50 === 0), emb, "vec_id", "embedding",
        k = 5, levels = 127, rescoreMult = 4)
    }),

    "d5_cosine_neardup" -> ((s, dir) =>
      AnnSearch.cosineNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        theta = 0.45)),

    "a4_neardup_lsh" -> ((s, dir) =>
      AnnSearch.lshNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        theta = 0.45, bits = 6, tables = 16)),

    // PQ ANN: 8 subspaces × 32-entry codebooks (m·log2(ksub) = 40 BITS
    // per 64-dim vector, ~51× narrower than float32; SQ8 is 4×),
    // asymmetric-distance candidate scoring + exact rescore of the top
    // 10k. Parameterization from tools/pqprobe_r6.txt (recall@5 0.84 at
    // this setting; coarser m=4 codebooks bottom out at 0.5). The
    // quantizer IS the operator (per-subspace Lloyd), so like a2/a3 it
    // is golden-pinned, with the recall floor held in AnnSpec.
    "a9_ann_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.AnnSearch.pqTopK(
        emb.where(col("vec_id") % 50 === 0), emb, "vec_id", "embedding",
        k = 5, m = 8, ksub = 32, rescoreMult = 10)
    }),

    // IVF-PQ composite (FAISS IndexIVFPQ shape): coarse quantizer prunes
    // the ADC scan to nprobe/nlist of the corpus, candidates score on
    // 40-bit PQ codes, exact rescore of the top 40·k (the r9 retune —
    // the measured recall-vs-bytes curve in tools/pqtune_r9.txt shows
    // the deeper rescore buys 0.25→0.40 smoke recall at the same code
    // budget for single-digit-percent extra rows). Same golden-pin
    // discipline as a3/a9 (the quantizers ARE the operator); AnnSpec
    // holds the recall floor and the probed-lists containment.
    "a10_ann_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.AnnSearch.ivfPqTopK(
        emb.where(col("vec_id") % 50 === 0), emb, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6, m = 8, ksub = 32, rescoreMult = 40)
    }),

    // SemDeDup: semantic near-dup removal with k-means cluster blocking
    // (Abbas et al. 2023) — candidates only within a cluster of the
    // deterministic Lloyd quantizer, survivors keep the min id. No
    // SQL-expressible oracle (the quantizer is the operator), so golden-
    // pinned at both scales; AnnSpec asserts planted-dup recovery and
    // the pairs ⊆ exact-pairs containment.
    "d9_semdedup" -> ((s, dir) =>
      graft.operators.AnnSearch.semanticDedup(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        theta = 0.45, nlist = 16)),

    // Recall CONTRACT query: the driver-visible guard against an LSH/IVF
    // recall collapse that ScalaTest alone would catch only at build time.
    // Emits one row per approximate method with its measured recall@5 vs
    // the exact baseline (same parameterizations as a2/a3) and the
    // in-plan verdict against a PER-METHOD floor — rows-only by design;
    // the row itself carries the evidence.
    //  - lsh floor 0.5: deliberately speed-biased config (the probe/table
    //    params trade recall for candidate volume, AnnQueries scaladoc
    //    above), measures 0.6–0.68; 0.5 separates "configured
    //    approximation" from "bucketing broke" (a collision bug → ~0).
    //  - ivf floor 0.7: the Lloyd-refined quantizer delivers 0.72–0.80
    //    at the a3 parameterization (tools/recallprobe_r6.txt), so 0.7
    //    additionally guards the refinement itself — raw hash-sampled
    //    seeds measure 0.68 and would fail this floor.
    "a5_ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 50 === 0)
      val exact = AnnSearch.bruteForceTopK(emb.where(col("vec_id") % 50 === 0),
        emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      def recallOf(approx: DataFrame, method: String,
          floor: Double): DataFrame =
        exact.join(
          approx.select(col("query_id"), col("neighbor_id"))
            .withColumn("hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left")
          // coalesce: zero overlapping hits must read recall 0.0 /
          // meets_contract false — sum(all-NULL) is NULL, which would
          // make the contract verdict NULL exactly when the collapse
          // this query guards against happens
          .agg((coalesce(sum(col("hit")), lit(0)) / count(lit(1))).as("r"))
          .select(lit(method).as("method"),
            round(col("r"), 4).as("recall_at_5"),
            lit(floor).as("contract_floor"),
            (col("r") >= floor).as("meets_contract"))
      // the two method legs are independent and construction-heavy
      // (IVF trains its quantizer at construction) — build them
      // concurrently, the a11 discipline; content unchanged
      def leg(body: => DataFrame): scala.concurrent.Future[DataFrame] =
        scala.concurrent.Future {
          org.apache.spark.sql.SparkSession.setActiveSession(s); body
        }(contractEc)
      val fLsh = leg(recallOf(
        AnnSearch.lshTopK(q, emb, "vec_id", "embedding",
          k = 5, bits = 8, tables = 8, probeHamming = 1), "lsh", 0.5))
      val fIvf = leg(recallOf(
        AnnSearch.ivfTopK(q, emb, "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 6), "ivf", 0.7))
      val wait = scala.concurrent.duration.Duration(20,
        java.util.concurrent.TimeUnit.MINUTES)
      scala.concurrent.Await.result(fLsh, wait)
        .unionAll(scala.concurrent.Await.result(fIvf, wait))
        .orderBy("method")
    }),

    // Semantic-invariant CONTRACT query for the two golden-pinned
    // operators a hash alone can't explain (r7 verdict task 7): the hash
    // says "unchanged", these rows say "and still CORRECT".
    //  - ivfpq_recall: a10's parameterization vs the exact baseline.
    //    Floor 0.65 (r9): at the retuned rescoreMult=40 both gate sfs
    //    sit AT their coarse-pruning ceilings — 0.72 at sf0.001, 0.80
    //    at sf0.01 (tools/pqtune_r9.txt; r8's mult=10 measured
    //    0.58–0.80); below 0.65 means the composite (coarse pruning ×
    //    residual codes × rescore) broke, not drifted.
    //  - semdedup_pair_exactness: every within-cluster pair d9's
    //    blocking emits must carry the TRUE exact cosine (recomputed
    //    from the embeddings, pair-count-sized join — never quadratic)
    //    and clear θ. Catches a broken blocked-cosine path that a
    //    stable hash would happily pin.
    //  - semdedup_survivor_partition: survivors ∪ dropped ids == corpus
    //    ids, disjointly — the min-id-wins discipline's accounting.
    "a11_ann_contracts" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") % 50 === 0)
      // The four contract legs are independent (each re-derives its own
      // trained state — the non-circularity contract) and their
      // CONSTRUCTION is driver-action-bound (quantizer training
      // collects, ~0.2-0.5 s each warm — tools/a11_stage_r10.txt), so
      // they build CONCURRENTLY on the session's scheduler instead of
      // serially (VERDICT r9 task 7: nothing in the contract says
      // serial). Content is unchanged: every leg is bit-deterministic
      // in isolation and the final union order is fixed by code.
      def leg[T](body: => T): scala.concurrent.Future[T] =
        scala.concurrent.Future {
          org.apache.spark.sql.SparkSession.setActiveSession(s); body
        }(contractEc)
      // brute-force reference shared by the two PQ rows — construction
      // is action-free (no training), so it hoists out of the futures
      val exact = AnnSearch.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      def pqRecallRow(method: String, mult: Int, floor: Double) = leg {
        // distinct cache slot per leg: both legs code the SAME corpus,
        // so a shared slot would have each leg's swap unpersist the
        // frame the other is mid-action on (ADVICE r10)
        val got = AnnSearch.ivfPqTopK(q, emb, "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 6, m = 8, ksub = 32,
          rescoreMult = mult,
          cacheSlot = s"a11.ivfpq.mult$mult")
          .select(col("query_id"), col("neighbor_id")).withColumn("hit", lit(1))
        exact.join(got, Seq("query_id", "neighbor_id"), "left")
          .agg((coalesce(sum(col("hit")), lit(0)) / count(lit(1))).as("r"))
          .select(lit(method).as("method"),
            round(col("r"), 4).as("value"),
            lit(floor).as("contract_floor"),
            (col("r") >= floor).as("meets_contract"))
      }
      val fRecall = pqRecallRow("ivfpq_recall", mult = 40, floor = 0.65)
      // ADVICE r9: at rescoreMult=40 the a10 golden equals a3's
      // (exact rescore recovers everything coarse pruning admits), so
      // the DRIVER gate stopped discriminating the PQ code/ADC stage.
      // At rescoreMult=1 the rescore pool IS the ADC top-k — any
      // codebook/LUT/ADC drift changes which candidates are picked and
      // moves this recall, and the exact VALUE is pinned through a11's
      // content hash at both gate scales. The floor only guards
      // collapse; the hash is the real gate.
      val fCodesDecide =
        pqRecallRow("ivfpq_codes_decide", mult = 1, floor = 0.10)

      val theta = 0.45
      // two consumers (exactness check + dropped set) — materialize once
      val fPairs = leg {
        graft.ManagedCache.swap("a11.pairs",
          AnnSearch.clusterNearDupPairs(emb, "vec_id", "embedding",
            theta = theta, nlist = 16))
      }
      val fSurvivors = leg {
        AnnSearch.semanticDedup(emb, "vec_id", "embedding",
          theta = theta, nlist = 16).select(col("vec_id"))
      }
      val fEquiv = leg {
        val knnSample = AnnSearch.knnJoinIvf(emb, "vec_id", "embedding",
            k = 5, nlist = 16, nprobe = 6)
          .where(col("query_id") % 50 === 0)
          .select(col("query_id"), col("neighbor_id"), col("rank"))
        val bcast = AnnSearch.ivfTopK(q, emb, "vec_id", "embedding",
            k = 5, nlist = 16, nprobe = 6)
          .select(col("query_id"), col("neighbor_id"), col("rank"))
        // symmetric difference empty AND same cardinality ⇒ identical.
        // NON-VACUOUS: an empty union (both paths regressed to zero
        // rows) must FAIL the contract, so the null aggregate coalesces
        // to 0.0 and the equality additionally demands a positive
        // population
        knnSample.unionAll(bcast)
          .groupBy("query_id", "neighbor_id", "rank")
          .agg(count(lit(1)).as("__n"))
          .agg(coalesce(
            ((sum(when(col("__n") === 2, 1).otherwise(0)) === count(lit(1)))
              && sum(col("__n")) > 0)
              .cast("int").cast("double"), lit(0.0)).as("e"))
          .select(lit("knn_join_equiv").as("method"), col("e").as("value"),
            lit(1.0).as("contract_floor"), (col("e") >= 1.0).as("meets_contract"))
      }

      val wait = scala.concurrent.duration.Duration(20,
        java.util.concurrent.TimeUnit.MINUTES)
      val pairs = scala.concurrent.Await.result(fPairs, wait)
      val va = emb.select(col("vec_id").as("vec_a"), col("embedding").as("__ea"))
      val vb = emb.select(col("vec_id").as("vec_b"), col("embedding").as("__eb"))
      val verified = pairs.join(va, "vec_a").join(vb, "vec_b")
        .withColumn("__true_cos",
          graft.functions.VectorFunctions.cosine(col("__ea"), col("__eb")))
        .agg(coalesce(
          sum(when(col("cosine") === col("__true_cos") &&
            col("__true_cos") >= theta, 1).otherwise(0)) /
            count(lit(1)), lit(1.0)).as("f"))
        .select(lit("semdedup_pair_exactness").as("method"),
          round(col("f"), 4).as("value"),
          lit(1.0).as("contract_floor"), (col("f") >= 1.0).as("meets_contract"))

      val survivors = scala.concurrent.Await.result(fSurvivors, wait)
      val dropped = pairs.select(col("vec_b").as("vec_id")).distinct()
      val ids = emb.select(col("vec_id")).distinct()
      // each corpus id must appear EXACTLY once across survivors ∪
      // dropped (disjoint cover): per-id multiplicity 1 and full-outer
      // coverage — an id in both sets, or covered by neither, fails
      val partitionRow = survivors.unionAll(dropped)
        .groupBy("vec_id").agg(count(lit(1)).as("__n"))
        .join(ids.withColumn("__c", lit(1)), Seq("vec_id"), "full_outer")
        .agg((sum(when(col("__n") === 1 && col("__c") === 1, 1).otherwise(0))
          === count(lit(1))).cast("int").cast("double").as("p"))
        .select(lit("semdedup_survivor_partition").as("method"),
          col("p").as("value"),
          lit(1.0).as("contract_floor"), (col("p") >= 1.0).as("meets_contract"))

      // knn_join_equiv (built in fEquiv above): the a12 self-join
      // restricted to the sampled queries must equal the BROADCAST
      // ivfTopK shape row-for-row ((query_id, neighbor_id, rank)
      // triples; same quantizer, same probe kernel, same ranking —
      // only the join strategy differs), so it is an equality
      // contract, not a recall floor. Guards the partitioned-join path
      // against silently diverging candidates.
      val recallRow = scala.concurrent.Await.result(fRecall, wait)
      val codesDecideRow = scala.concurrent.Await.result(fCodesDecide, wait)
      val equivRow = scala.concurrent.Await.result(fEquiv, wait)
      recallRow.unionAll(codesDecideRow).unionAll(verified)
        .unionAll(partitionRow).unionAll(equivRow).orderBy("method")
    })
  )

  /** Small daemon pool for [[queries]]' a11 concurrent contract-leg
    * construction — Spark sessions schedule concurrent driver actions
    * fine; the pool only bounds how many quantizer trainings overlap. */
  private lazy val contractEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4,
        (r: Runnable) => {
          val th = new Thread(r, "a11-contract-leg")
          th.setDaemon(true)
          th
        }))

  val oracles: Map[String, String] = Map(
    // a1's CTEs over the WHOLE corpus as the query set, k=3
    "a13_knn_exact" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |             CAST(embedding AS DOUBLE[]) AS qv FROM embeddings),
        |s AS (SELECT query_id, e.vec_id AS neighbor_id,
        |        list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])) AS cosine
        |      FROM q, embeddings e WHERE e.vec_id <> query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM s)
        |SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 3""".stripMargin,

    "a1_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |             CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
        |           WHERE vec_id % 50 = 0),
        |s AS (SELECT query_id, e.vec_id AS neighbor_id,
        |        list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])) AS cosine
        |      FROM q, embeddings e WHERE e.vec_id <> query_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM s)
        |SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5""".stripMargin,

    // the a1 CTEs with the metadata predicate pushed into the corpus
    // side — pre-filter semantics, rank over eligible members only
    "a15_filtered_ann" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |             CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
        |           WHERE vec_id % 50 = 0),
        |s AS (SELECT query_id, e.vec_id AS neighbor_id,
        |        list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])) AS cosine
        |      FROM q, embeddings e WHERE e.vec_id <> query_id AND e.label = 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM s)
        |SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5""".stripMargin,

    // the a8 quantize/rescore CTEs and the a1 exact CTEs, joined on
    // (query, neighbor) and rolled up per query
    "a18_recall_eval" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
        |q8 AS (SELECT vec_id,
        |         CASE WHEN nrm = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |              ELSE list_transform(v, x -> CAST(greatest(least(
        |                     floor(x / nrm * 127), 127), -127) AS BIGINT)) END AS qv
        |       FROM n),
        |qq AS (SELECT vec_id AS query_id, qv AS qcodes FROM q8 WHERE vec_id % 50 = 0),
        |cand AS (SELECT query_id, c.vec_id AS neighbor_id,
        |           CAST(list_inner_product(qcodes, c.qv) AS BIGINT) AS qscore
        |         FROM qq, q8 c WHERE c.vec_id <> query_id),
        |topc AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY qscore DESC, neighbor_id ASC) AS crank FROM cand),
        |resc AS (SELECT t.query_id, t.neighbor_id,
        |           list_cosine_similarity(q.v, c.v) AS cosine
        |         FROM topc t
        |         JOIN e q ON q.vec_id = t.query_id
        |         JOIN e c ON c.vec_id = t.neighbor_id
        |         WHERE t.crank <= 20),
        |ar AS (SELECT query_id, neighbor_id FROM
        |        (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM resc)
        |       WHERE rank <= 5),
        |xq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id % 50 = 0),
        |xs AS (SELECT query_id, e2.vec_id AS neighbor_id,
        |         list_cosine_similarity(qv, CAST(e2.embedding AS DOUBLE[])) AS cosine
        |       FROM xq, embeddings e2 WHERE e2.vec_id <> query_id),
        |xr AS (SELECT query_id, neighbor_id FROM
        |        (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM xs)
        |       WHERE rank <= 5),
        |nx AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
        |       FROM xr GROUP BY query_id),
        |h AS (SELECT xr.query_id, CAST(count(*) AS BIGINT) AS n_hit
        |      FROM xr JOIN ar ON xr.query_id = ar.query_id
        |        AND xr.neighbor_id = ar.neighbor_id
        |      GROUP BY xr.query_id)
        |SELECT nx.query_id, nx.n_exact,
        |  coalesce(h.n_hit, 0) AS n_hit,
        |  round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / nx.n_exact, 6)
        |    AS recall
        |FROM nx LEFT JOIN h USING (query_id)""".stripMargin,

    // a18's approx CTEs with the rank kept, the exact CTEs cut at
    // rank ≤ 3 (the relevance set), then first_rank = min approx rank
    // over relevant hits and one exact reciprocal
    "a19_mrr_eval" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
        |q8 AS (SELECT vec_id,
        |         CASE WHEN nrm = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |              ELSE list_transform(v, x -> CAST(greatest(least(
        |                     floor(x / nrm * 127), 127), -127) AS BIGINT)) END AS qv
        |       FROM n),
        |qq AS (SELECT vec_id AS query_id, qv AS qcodes FROM q8 WHERE vec_id % 50 = 0),
        |cand AS (SELECT query_id, c.vec_id AS neighbor_id,
        |           CAST(list_inner_product(qcodes, c.qv) AS BIGINT) AS qscore
        |         FROM qq, q8 c WHERE c.vec_id <> query_id),
        |topc AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY qscore DESC, neighbor_id ASC) AS crank FROM cand),
        |resc AS (SELECT t.query_id, t.neighbor_id,
        |           list_cosine_similarity(q.v, c.v) AS cosine
        |         FROM topc t
        |         JOIN e q ON q.vec_id = t.query_id
        |         JOIN e c ON c.vec_id = t.neighbor_id
        |         WHERE t.crank <= 20),
        |ar AS (SELECT query_id, neighbor_id, rank FROM
        |        (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM resc)
        |       WHERE rank <= 5),
        |xq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id % 50 = 0),
        |xs AS (SELECT query_id, e2.vec_id AS neighbor_id,
        |         list_cosine_similarity(qv, CAST(e2.embedding AS DOUBLE[])) AS cosine
        |       FROM xq, embeddings e2 WHERE e2.vec_id <> query_id),
        |xr AS (SELECT query_id, neighbor_id FROM
        |        (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM xs)
        |       WHERE rank <= 3),
        |f AS (SELECT xr.query_id, min(ar.rank) AS first_rank
        |      FROM xr JOIN ar ON xr.query_id = ar.query_id
        |        AND xr.neighbor_id = ar.neighbor_id
        |      GROUP BY xr.query_id),
        |nr AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
        |       FROM xr GROUP BY query_id)
        |SELECT nr.query_id, nr.n_rel,
        |  CAST(coalesce(f.first_rank, -1) AS BIGINT) AS first_rank,
        |  CASE WHEN f.first_rank IS NULL THEN CAST(0 AS DOUBLE)
        |       ELSE round(CAST(1 AS DOUBLE) / f.first_rank, 6) END AS rr,
        |  CAST(f.first_rank IS NOT NULL AS BIGINT) AS hit
        |FROM nr LEFT JOIN f USING (query_id)""".stripMargin,

    // the a19 approx CTEs (rank kept), the exact top-5 with graded
    // integer gains 6−rank, DCG/IDCG as log2-discounted sums under the
    // round-6 discipline
    "a20_ndcg_eval" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
        |q8 AS (SELECT vec_id,
        |         CASE WHEN nrm = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |              ELSE list_transform(v, x -> CAST(greatest(least(
        |                     floor(x / nrm * 127), 127), -127) AS BIGINT)) END AS qv
        |       FROM n),
        |qq AS (SELECT vec_id AS query_id, qv AS qcodes FROM q8 WHERE vec_id % 50 = 0),
        |cand AS (SELECT query_id, c.vec_id AS neighbor_id,
        |           CAST(list_inner_product(qcodes, c.qv) AS BIGINT) AS qscore
        |         FROM qq, q8 c WHERE c.vec_id <> query_id),
        |topc AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY qscore DESC, neighbor_id ASC) AS crank FROM cand),
        |resc AS (SELECT t.query_id, t.neighbor_id,
        |           list_cosine_similarity(q.v, c.v) AS cosine
        |         FROM topc t
        |         JOIN e q ON q.vec_id = t.query_id
        |         JOIN e c ON c.vec_id = t.neighbor_id
        |         WHERE t.crank <= 20),
        |ar AS (SELECT query_id, neighbor_id, rank FROM
        |        (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM resc)
        |       WHERE rank <= 5),
        |xq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id % 50 = 0),
        |xs AS (SELECT query_id, e2.vec_id AS neighbor_id,
        |         list_cosine_similarity(qv, CAST(e2.embedding AS DOUBLE[])) AS cosine
        |       FROM xq, embeddings e2 WHERE e2.vec_id <> query_id),
        |xg AS (SELECT query_id, neighbor_id, rank AS xr,
        |         CAST(5 - rank + 1 AS DOUBLE) AS rel FROM
        |        (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM xs)
        |       WHERE rank <= 5),
        |d AS (SELECT xg.query_id,
        |        sum(xg.rel / log2(CAST(ar.rank + 1 AS DOUBLE))) AS dcg
        |      FROM xg JOIN ar ON xg.query_id = ar.query_id
        |        AND xg.neighbor_id = ar.neighbor_id
        |      GROUP BY xg.query_id),
        |i AS (SELECT query_id,
        |        sum(rel / log2(CAST(xr + 1 AS DOUBLE))) AS idcg
        |      FROM xg GROUP BY query_id)
        |SELECT i.query_id,
        |  round(coalesce(d.dcg, CAST(0 AS DOUBLE)), 6) AS dcg,
        |  round(i.idcg, 6) AS idcg,
        |  round(coalesce(d.dcg, CAST(0 AS DOUBLE)) / i.idcg, 6) AS ndcg
        |FROM i LEFT JOIN d USING (query_id)""".stripMargin,

    // the greedy trajectory unrolled: a1's top-10 CTEs, then three
    // picks — each an argmax over round(λ·rel − (1−λ)·maxSim, 9) with
    // the id tie-break; λ terms built by the same IEEE ops as the
    // operator's lit(0.7)/lit(1.0 − 0.7)
    "a17_mmr_rerank" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |s AS (SELECT query_id, e.vec_id AS nid,
        |        list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])) AS rel,
        |        CAST(e.embedding AS DOUBLE[]) AS v
        |      FROM q, embeddings e WHERE e.vec_id <> query_id),
        |cand AS (SELECT query_id, nid, rel, v FROM
        |          (SELECT *, row_number() OVER (PARTITION BY query_id
        |             ORDER BY rel DESC, nid ASC) AS rank FROM s)
        |         WHERE rank <= 10),
        |lam AS (SELECT CAST(0.7 AS DOUBLE) AS l,
        |               CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE) AS il),
        |m1 AS (SELECT query_id, nid, v,
        |         round(lam.l * rel - lam.il * CAST(0 AS DOUBLE), 9) AS mmr
        |       FROM cand CROSS JOIN lam),
        |p1 AS (SELECT query_id, nid, v, mmr FROM
        |        (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY mmr DESC, nid) AS rn FROM m1) WHERE rn = 1),
        |r2 AS (SELECT c.query_id, c.nid, c.rel, c.v FROM cand c
        |       LEFT JOIN p1 ON c.query_id = p1.query_id AND c.nid = p1.nid
        |       WHERE p1.nid IS NULL),
        |m2 AS (SELECT r.query_id, r.nid, r.v,
        |         round(lam.l * r.rel -
        |               lam.il * list_cosine_similarity(r.v, p1.v), 9) AS mmr
        |       FROM r2 r JOIN p1 ON r.query_id = p1.query_id CROSS JOIN lam),
        |p2 AS (SELECT query_id, nid, v, mmr FROM
        |        (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY mmr DESC, nid) AS rn FROM m2) WHERE rn = 1),
        |sel2 AS (SELECT query_id, nid, v FROM p1
        |         UNION ALL SELECT query_id, nid, v FROM p2),
        |r3 AS (SELECT c.query_id, c.nid, c.rel, c.v FROM cand c
        |       LEFT JOIN sel2 ON c.query_id = sel2.query_id
        |         AND c.nid = sel2.nid
        |       WHERE sel2.nid IS NULL),
        |m3 AS (SELECT r.query_id, r.nid,
        |         round(lam.l * r.rel -
        |               lam.il * max(list_cosine_similarity(r.v, s.v)), 9)
        |           AS mmr
        |       FROM r3 r JOIN sel2 s ON r.query_id = s.query_id
        |       CROSS JOIN lam
        |       GROUP BY r.query_id, r.nid, r.rel, lam.l, lam.il),
        |p3 AS (SELECT query_id, nid, mmr FROM
        |        (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY mmr DESC, nid) AS rn FROM m3) WHERE rn = 1)
        |SELECT query_id, nid AS neighbor_id, CAST(1 AS INT) AS mmr_rank,
        |       mmr AS mmr_score FROM p1
        |UNION ALL SELECT query_id, nid, CAST(2 AS INT), mmr FROM p2
        |UNION ALL SELECT query_id, nid, CAST(3 AS INT), mmr FROM p3""".stripMargin,

    // the operator's trajectory unrolled: hash-rank init (c0), then
    // per round assign (sequential zip-fold squared L2 rounded to 9,
    // argmin with cluster-id tie-break) and update (per-dimension avg
    // rounded to 12, rebuilt in index order) — the same rounding the
    // Spark side applies, so every intermediate is engine-identical
    "a16_kmeans" ->
      """WITH data AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  WHERE embedding IS NOT NULL AND len(embedding) > 0),
        |h AS (SELECT id, v,
        |        substring(md5('kmeans-init:' || CAST(id AS VARCHAR)), 1, 12) AS hk
        |      FROM data),
        |c0 AS (SELECT row_number() OVER (ORDER BY hk, id) - 1 AS c, v AS cv
        |       FROM h ORDER BY hk, id LIMIT 8),
        |s0 AS (SELECT d.id, c0.c,
        |         round(list_sum(list_transform(list_zip(d.v, c0.cv),
        |               s -> (s[1] - s[2]) * (s[1] - s[2]))), 9) AS rd2
        |       FROM data d CROSS JOIN c0),
        |a0 AS (SELECT id, c, rd2 FROM
        |        (SELECT *, row_number() OVER (PARTITION BY id
        |                     ORDER BY rd2, c) AS rn FROM s0)
        |       WHERE rn = 1),
        |e1 AS (SELECT a.c AS c, unnest(generate_series(1, len(d.v))) AS i,
        |              unnest(d.v) AS x
        |       FROM a0 a JOIN data d ON a.id = d.id),
        |m1 AS (SELECT c, i, round(avg(x), 12) AS m FROM e1 GROUP BY c, i),
        |c1 AS (SELECT c, list(m ORDER BY i) AS cv FROM m1 GROUP BY c),
        |s1 AS (SELECT d.id, c1.c,
        |         round(list_sum(list_transform(list_zip(d.v, c1.cv),
        |               s -> (s[1] - s[2]) * (s[1] - s[2]))), 9) AS rd2
        |       FROM data d CROSS JOIN c1),
        |a1 AS (SELECT id, c, rd2 FROM
        |        (SELECT *, row_number() OVER (PARTITION BY id
        |                     ORDER BY rd2, c) AS rn FROM s1)
        |       WHERE rn = 1),
        |e2 AS (SELECT a.c AS c, unnest(generate_series(1, len(d.v))) AS i,
        |              unnest(d.v) AS x
        |       FROM a1 a JOIN data d ON a.id = d.id),
        |m2 AS (SELECT c, i, round(avg(x), 12) AS m FROM e2 GROUP BY c, i),
        |c2 AS (SELECT c, list(m ORDER BY i) AS cv FROM m2 GROUP BY c),
        |s2 AS (SELECT d.id, c2.c,
        |         round(list_sum(list_transform(list_zip(d.v, c2.cv),
        |               s -> (s[1] - s[2]) * (s[1] - s[2]))), 9) AS rd2
        |       FROM data d CROSS JOIN c2),
        |a2 AS (SELECT id, c, rd2 FROM
        |        (SELECT *, row_number() OVER (PARTITION BY id
        |                     ORDER BY rd2, c) AS rn FROM s2)
        |       WHERE rn = 1)
        |SELECT id AS vec_id, c AS cluster, rd2 AS dist2 FROM a2""".stripMargin,

    // norm via list_inner_product on DOUBLE[] (same left-to-right
    // accumulation convention the a1/d5 oracles rely on); per-element
    // floor/clamp/div are IEEE-identical across engines on the same
    // parquet floats
    "a7_vec_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
        |q AS (SELECT vec_id,
        |        CASE WHEN nrm = 0 THEN list_transform(v, x -> 0)
        |             ELSE list_transform(v, x -> CAST(greatest(least(
        |                    floor(x / nrm * 127), 127), -127) AS INT)) END AS ql
        |      FROM n),
        |x AS (SELECT vec_id, ql, unnest(range(0, len(ql))) AS fi FROM q)
        |SELECT vec_id, CAST(fi AS INT) AS pos, CAST(ql[CAST(fi AS INT) + 1] AS INT) AS q
        |FROM x""".stripMargin,

    // quantization replicated per-element as in a7; candidate scoring on
    // BIGINT codes via list_inner_product (exact in doubles — products
    // ≤ 127²·dim ≪ 2⁵³), rescore on the same DOUBLE[] cosine as a1
    "a8_ann_quantized" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
        |q8 AS (SELECT vec_id,
        |         CASE WHEN nrm = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |              ELSE list_transform(v, x -> CAST(greatest(least(
        |                     floor(x / nrm * 127), 127), -127) AS BIGINT)) END AS qv
        |       FROM n),
        |qq AS (SELECT vec_id AS query_id, qv AS qcodes FROM q8 WHERE vec_id % 50 = 0),
        |cand AS (SELECT query_id, c.vec_id AS neighbor_id,
        |           CAST(list_inner_product(qcodes, c.qv) AS BIGINT) AS qscore
        |         FROM qq, q8 c WHERE c.vec_id <> query_id),
        |topc AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY qscore DESC, neighbor_id ASC) AS crank FROM cand),
        |resc AS (SELECT t.query_id, t.neighbor_id,
        |           list_cosine_similarity(q.v, c.v) AS cosine
        |         FROM topc t
        |         JOIN e q ON q.vec_id = t.query_id
        |         JOIN e c ON c.vec_id = t.neighbor_id
        |         WHERE t.crank <= 20),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM resc)
        |SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5""".stripMargin,

    "d5_cosine_neardup" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                              CAST(b.embedding AS DOUBLE[])) AS cosine
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.45""".stripMargin
    // a2_ann_lsh / a3_ann_ivf / a4_neardup_lsh stay rows-only
    // DELIBERATELY: the d3-style total-recall parameterization was
    // evaluated and rejected for this corpus — its near-dup pairs all sit
    // at cosine 0.45–0.51 (weak angular signal, per-bit collision
    // p ≈ 0.65), so parameters guaranteeing recall 1.0 (e.g. 4 bits ×
    // 32 tables) multiply candidate volume ~8× and reduce the query to
    // brute force with extra steps. The approximate configs are instead
    // pinned by AnnSpec recall assertions against the exact baselines.
  )
}
