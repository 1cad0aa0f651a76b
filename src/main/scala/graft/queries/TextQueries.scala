package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.TextFunctions._
import graft.queries.Tables.t

/** Text-analysis battery over the `documents` table: token counting,
  * quality scoring, language-ID heuristic, rolling-hash fingerprinting.
  * All pure built-in compositions with exact DuckDB oracles. */
object TextQueries {

  /** One persisted BM25 index per (JVM, sf dir) — see [[IndexMemo]]:
    * built on first use by the t11 refresh sequence — 75% build then a
    * full incremental refresh (delta≡scratch is spec'd in
    * SilverIndexSpec, so the final artifact equals a from-scratch
    * build); shared by t11 and h1's lexical leg. */
  private[graft] def bm25IndexPath(s: SparkSession, dir: String): String =
    IndexMemo.path(s"bm25:$dir") { path =>
      val docs = t(s, dir, "documents")
      graft.pipeline.SilverIndex.refreshPostings(
        docs.where(col("doc_id") % 4 =!= 0), "doc_id", "text", path)
      graft.pipeline.SilverIndex.refreshPostings(docs, "doc_id", "text", path)
      ()
    }

  /** One persisted hashed-TF-IDF vector table per (JVM, sf dir) — a
    * feature table is a silver artifact a recurring pipeline computes
    * once and stores (the t11/a6/d7 discipline); h2 and any ANN
    * consumer read the stored vectors. Built from the shared postings
    * index, so content equals a live build (the t15 identity). */
  private[graft] def tfidfVectorsPath(s: SparkSession, dir: String): String =
    IndexMemo.path(s"tfidf:$dir") { path =>
      graft.operators.TextSearch.hashingTfIdfVectors(
          graft.pipeline.SilverIndex.postingsIndex(s, bm25IndexPath(s, dir)),
          dim = 64)
        .write.mode("overwrite").parquet(path)
    }

  /** Stored-vector-table row count, memoized per (JVM, sf dir) — the
    * [[AnnSearch.knnJoinIvfPq]] `rowCountHint` source for h4 (the a14
    * embStats discipline: on a real deployment this is the feature
    * table's catalog stat / sidecar; here a one-time footer-metadata
    * count under the session's aggregate-pushdown conf). Cost knob
    * only — AnnSpec pins hint-invariance of knnJoin rows. */
  private val tfidfCountMemo =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  private[graft] def tfidfCount(s: SparkSession, dir: String): Long =
    tfidfCountMemo.getOrElseUpdate(dir,
      s.read.parquet(tfidfVectorsPath(s, dir)).count())

  /** The h2 frame, factored so h3's recall contract scores against the
    * same rows: exact cosine top-3 over the stored TF-IDF vectors.
    *
    * Vectors come from the STORED feature table (tfidfVectorsPath —
    * built once per JVM): a parquet scan per cross-join side. The
    * materialization matters twice over: a live map-lookup array
    * construction would re-evaluate PER PAIR under projection folding
    * (the knnpq hazard — measured ~52 s vs ~3 s at sf0.1), and a
    * recurring pipeline stores its feature table anyway.
    *
    * Ranking is over the FULL neighbor set on the rounded cosine (not
    * a rounded re-rank of an exact-cosine top-k — a rounded tie group
    * straddling the pre-truncation boundary would split the engines);
    * truncation happens after the rounded window — the a13
    * brute-baseline shape. Query side sampled every 10th doc (the a1
    * discipline — the corpus side stays whole, so the bridge is
    * exercised end-to-end while the exact-baseline pair count stays
    * |corpus|·|corpus|/10). Per-query ranking goes through the bounded
    * TopKByKey aggregate (the t10 path — identical (rcos DESC, id ASC)
    * ordering contract to a row_number window, but map-side partial
    * top-k: the |corpus|² pair frame never exchanges, only the
    * output-sized winners do). */
  private def textKnnExact(s: SparkSession, dir: String): DataFrame = {
    val dense = s.read.parquet(tfidfVectorsPath(s, dir))
    val q = dense.where(col("doc") % 10 === 0)
      .select(col("doc").as("query_id"), col("vec").as("qv"))
    val c = dense.select(col("doc").as("neighbor_id"), col("vec").as("cv"))
      .transform(graft.operators.Par.spread(_, col("neighbor_id")))
    val top = broadcast(q).crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.functions.VectorFunctions.cosine(col("qv"), col("cv")),
          6).as("rcos"))
    graft.operators.AnnSearch
      .rankedTopK(top, "query_id", "neighbor_id", "rcos", 3)
      .select(col("query_id").as("doc_id"),
        col("neighbor_id"), col("rcos"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_token_counts" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        approxBpeTokenCount(col("text")).as("n_bpeish"))),

    "t2_quality" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), qualityMetrics(col("text")).as("m"))
        .select(col("doc_id"), col("m.n_chars").as("n_chars"),
          col("m.n_words").as("n_words"),
          col("m.chars_per_word").as("chars_per_word"),
          col("m.punct_ratio").as("punct_ratio"),
          col("m.stopword_ratio").as("stopword_ratio"))),

    "t3_lang_id" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"), col("lang").as("labeled_lang"),
        langId(col("text")).as("lang_guess"),
        langHits(col("text"), langProfiles.head._2).as("en_hits"))),

    // t18 (r13): the language-ID heuristic EVALUATED — t3's per-doc
    // guesses scored against the stored labels as a per-class
    // precision/recall/F1 report (operators/Eval.classReport), the
    // confusion summary a classifier pipeline actually publishes.
    // Integer counts + round-6 divisions -> exact oracle.
    "t18_lang_eval" -> ((s, dir) =>
      graft.operators.Eval.classReport(
        t(s, dir, "documents").select(col("lang"),
          langId(col("text")).as("guess")),
        "lang", "guess")),

    "t4_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"), fingerprint(col("text")).as("fp"))),

    // Hybrid retrieval: BM25 lexical leg fused with an exact-cosine
    // semantic leg (the embedding of doc 0) by reciprocal-rank fusion.
    // RRF uses only RANKS, so the fused score is bit-deterministic for
    // two legs (IEEE addition is commutative) and the whole query gets a
    // real DuckDB oracle. The lexical leg ranks on round(score, 6): the
    // corpus contains docs with identical (tf-profile, length) whose
    // mathematically-equal BM25 sums would otherwise be ordered by
    // reduction-order noise instead of the doc_id tie-break.
    //
    // The lexical leg serves from the PERSISTED BM25 index (the t11
    // artifact, shared per (JVM, sf dir)): stored postings with the
    // 4-term set a pushed parquet predicate + the stored doc-length
    // companion — zero corpus tokenization at query time. Scoring
    // arithmetic is scoreFromPostings either way, so the oracle (and
    // the r8 hash) are unchanged; whichever of h1/t11 runs first in a
    // JVM pays the one-time build.
    "h1_hybrid_rrf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (post, dlen, n, avg) =
        graft.pipeline.SilverIndex.bm25Index(s, bm25IndexPath(s, dir))
      val lexScored = graft.operators.TextSearch
        .scoreFromPostings(post, dlen, n, avg,
          Seq("spark", "vector", "stream", "join"), k1 = 1.2, b = 0.75)
        .withColumn("rscore", round(col("score"), 6))
      val wl = org.apache.spark.sql.expressions.Window
        .orderBy(col("rscore").desc, col("doc").asc)
      val lex = lexScored.orderBy(col("rscore").desc, col("doc").asc)
        .limit(20)
        .withColumn("rank", row_number().over(wl))
        .select(col("doc").as("doc_id"), col("rank"))
      val sem = graft.operators.AnnSearch.bruteForceTopK(
          emb.where(col("vec_id") === 0), emb, "vec_id", "embedding", k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.operators.HybridSearch.rrf(Seq(lex, sem), "doc_id", "rank",
        k = 10)
    }),

    // Batched BM25: a TABLE of queries scored in one pass over the
    // PERSISTED postings index (the shared t11 artifact — per its own
    // scaladoc, recurring batch streams belong on the stored index, not
    // a per-call postings build): the batch's distinct term set becomes
    // a pushed parquet predicate, per-term stats compute once across
    // the batch from the stored doc-length companion + stats sidecar,
    // the corpus never shuffles, per-query windowed top-k. Ranks on
    // round(score, 6) with the doc tie-break (the h1 discipline:
    // mathematically-equal sums must not be ordered by reduction-order
    // noise), and OUTPUTS the rounded score, which both engines agree
    // on at 6 decimals. The oracle scores the live corpus — identical
    // content by the t11 identity.
    "t10_bm25_batch" -> ((s, dir) => {
      import s.implicits._
      val (post, dlen, n, avg) =
        graft.pipeline.SilverIndex.bm25Index(s, bm25IndexPath(s, dir))
      val queries = Seq(
        ("q1", "spark vector stream join"),
        ("q2", "hash merge sort window"),
        ("q3", "customer batch scan")).toDF("query_id", "qtext")
      val scored = graft.operators.TextSearch
        .scoreBatchFromPostings(post, dlen, n, avg, queries,
          "query_id", "qtext", k1 = 1.2, b = 0.75)
        .select(col("query_id"), col("doc"),
          round(col("score"), 6).as("rscore"))
      // per-query ranking through the bounded TopKByKey aggregate (the
      // rankedTopK path) — identical ordering contract to the window
      // formulation (rscore DESC, doc ASC) with an output-sized exchange
      graft.operators.AnnSearch
        .rankedTopK(scored, "query_id", "doc", "rscore", 10)
        .select(col("query_id"), col("doc").as("doc_id"),
          col("rscore"), col("rank"))
    }),

    // BM25 against the PERSISTED index (SilverIndex.refreshPostings ×2:
    // 75% build + 25% incremental refresh, then a query served from the
    // stored doc-length companion + stats sidecar with the term set a
    // pushed parquet predicate — zero corpus-wide aggregation at query
    // time). Semantically identical to scoring the live corpus, which
    // is exactly what the oracle computes; ranks on round(score, 6)
    // with the doc tie-break (the h1 discipline).
    "t11_bm25_index" -> ((s, dir) => {
      val path = bm25IndexPath(s, dir)
      val (post, dlen, n, avg) = graft.pipeline.SilverIndex.bm25Index(s, path)
      val scored = graft.operators.TextSearch
        .scoreFromPostings(post, dlen, n, avg,
          Seq("spark", "vector", "stream", "join"), k1 = 1.2, b = 0.75)
        .select(col("doc"), round(col("score"), 6).as("rscore"))
      val wl = org.apache.spark.sql.expressions.Window
        .orderBy(col("rscore").desc, col("doc").asc)
      scored.orderBy(col("rscore").desc, col("doc").asc).limit(10)
        .withColumn("rank", row_number().over(wl))
        .select(col("doc").as("doc_id"), col("rscore"), col("rank"))
    }),

    // Quality-model scoring: a hashed-bag linear classifier in the
    // fastText shape (unigram+bigram occurrences → 2048 buckets →
    // integer weight sum, one codegen pass per row — TextKernel
    // .linearTextScore) plus the keep/drop gate at threshold 0. In
    // production the weight table is a learned model broadcast to every
    // task; the gate derives a deterministic pseudo-model (weight(b) =
    // (b·2654435761) mod 2003 − 1001) so DuckDB can replicate the
    // integer arithmetic end-to-end — the bucket hash is the t4
    // rolling fingerprint, proven cross-engine.
    // NULL text scores 0 (coalesce BEFORE the kernel — the oracle's
    // LEFT JOIN + coalesce does the same, so a null-bearing corpus
    // cannot split the engines)
    "t12_quality_model" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        graft.functions.linear_text_score(
          coalesce(col("text"), lit("")), qualityModelWeights)
          .as("quality_score"))
        .withColumn("keep", (col("quality_score") >= 0).cast("int"))),

    // Unigram surprisal (CCNet-style perplexity filtering without an
    // external LM — the corpus's own unigram distribution is the
    // model): mean −ln P(token) per doc. Ranking/keeping decisions
    // round first (the h1 discipline); the gate emits round(...,6),
    // which both engines agree on (the BM25 oracles already pin ln/
    // division parity). Low = boilerplate-frequent tokens, high =
    // lexically odd — the standard quality-bucketing signal.
    // Served from the PERSISTED postings index (the shared t11/h1
    // IndexMemo artifact, content-identical to a live tokenize by the
    // delta≡scratch spec) — no corpus tokenize/explode at query time;
    // the one term-keyed shuffle reads stored 3-column parquet
    // (VERDICT r9 task 4).
    "t13_surprisal" -> ((s, dir) =>
      graft.operators.TextSearch.surprisalFromIndex(
        graft.pipeline.SilverIndex.postingsIndex(s, bm25IndexPath(s, dir)))
        .select(col("doc").as("doc_id"), col("len"),
          round(col("mean_nll"), 6).as("mean_nll"))),

    // t17 (r13): exact PHRASE search — consecutive-position match over
    // positional postings (TextSearch.phraseMatch), the capability the
    // bag-of-words BM25 family can't express. Each adjacency is one
    // (doc, pos)-keyed join of the phrase terms' posting lists.
    // Deterministic integers -> exact oracle.
    "t17_phrase_search" -> ((s, dir) =>
      graft.operators.TextSearch.phraseMatch(
        t(s, dir, "documents"), "doc_id", "text", Seq("fast", "table"))
        .select(col("doc").as("doc_id"), col("n_hits"))),

    // Bigram-LM surprisal (r12): the sequence-aware quality signal —
    // add-one-smoothed mean −ln P(w_i | w_{i−1}) over the corpus's own
    // bigram distribution (TextSearch.bigramSurprisal). Catches
    // phrase-level boilerplate and scrambled word order that t13's
    // bag-of-words model cannot see. round(…,6) pins ln/division
    // parity (the t13 discipline); full DuckDB oracle.
    "t16_bigram_lm" -> ((s, dir) =>
      graft.operators.TextSearch.bigramSurprisal(
        t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc").as("doc_id"), col("n_bigrams"),
          round(col("mean_nll2"), 6).as("mean_nll2"))),

    // DSIR importance log-weights (Xie et al. 2023): rank every doc by
    // Σ tf·(ln p_target − ln p_source) with add-1 smoothing over the
    // source vocabulary, target = the corpus's own lang='en' slice (a
    // trusted in-domain set). Served from the persisted postings index
    // like t13; round(...,6) pins the ln/division parity.
    "t14_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.TextSearch.dsirLogWeights(
          graft.pipeline.SilverIndex.postingsIndex(s, bm25IndexPath(s, dir)),
          docs.where(col("lang") === "en").select(col("doc_id")))
        .select(col("doc").as("doc_id"), col("len"),
          round(col("log_w"), 6).as("log_w"))
    }),

    // t20 (r14): per-doc top-3 KEYWORDS by smoothed tf-idf — the
    // corpus-exploration tagging pass, served from the SAME persisted
    // postings index as t11/t15 (one stored artifact, many serving
    // shapes). Round-6 scores with the term tie-break (the h1
    // discipline) -> exact oracle over the t6 tokenizer CTEs.
    "t20_tfidf_keywords" -> ((s, dir) =>
      graft.operators.TextSearch.keywordsFromPostings(
          graft.pipeline.SilverIndex.postingsIndex(s, bm25IndexPath(s, dir)),
          k = 3)
        .select(col("doc").as("doc_id"), col("rank"), col("term"),
          col("tf"), col("doc_freq"), col("tfidf"))),

    // Hashing TF-IDF vectorization (sklearn HashingVectorizer →
    // TfidfTransformer shape): terms → 64 buckets by the t4 rolling
    // fingerprint, smoothed tf-idf weights, per-doc L2 normalization —
    // the text→vector feature bridge, emitted as SPARSE (doc, bucket,
    // weight) triples; served from the persisted postings index.
    "t15_hash_tfidf" -> ((s, dir) =>
      graft.operators.TextSearch.hashingTfIdf(
          graft.pipeline.SilverIndex.postingsIndex(s, bm25IndexPath(s, dir)),
          dim = 64)
        .select(col("doc").as("doc_id"), col("bucket"),
          round(col("weight"), 6).as("weight"))),

    // End-to-end text→vector→kNN (the t15 bridge driven through the
    // ANN family): hashed TF-IDF vectors from the persisted postings
    // index, exact cosine kNN (the a13 brute baseline — the honest
    // reference; the scale path is the same vectors through
    // LSH/IVF/knnJoin), ranks on round(cosine, 6) with the doc
    // tie-break (the h1/t11 discipline — the oracle computes the SAME
    // cosine sparsely, a different reduction order). Top-3 per doc,
    // ranked over the FULL neighbor set on the rounded cosine (see
    // [[textKnnExact]], which h3's recall contract shares).
    "h2_text_knn" -> ((s, dir) => textKnnExact(s, dir)),

    // The h2 bridge's SCALE PATH, gate-checked (VERDICT r10 task 6):
    // the SAME stored TF-IDF vectors through the auto-dispatched kNN
    // self-join (knnJoin — IVF-partitioned past the broadcast budget).
    // No oracle (IVF candidate generation is approximate), so the
    // output is the a5-shape recall CONTRACT against h2's exact rows
    // for the same sampled queries — golden-pinned at both sfs, making
    // both dispatch drift and recall drift driver-visible. Floor 0.7:
    // the measured recall at the gate parameterization is well above
    // (see AnnSpec's TF-IDF case); a bucketing bug reads ~0.
    "h3_text_knn_scale" -> ((s, dir) => {
      val dense = s.read.parquet(tfidfVectorsPath(s, dir))
      // dimHint: the vectorizer dimension is a build constant (64);
      // rowCountHint: the memoized feature-table footer count
      // (tfidfCount) — together they kill both of knnJoin's per-call
      // probe jobs (the a14/h4 hint discipline, r12)
      val approx = graft.operators.AnnSearch.knnJoin(
          dense, "doc", "vec", k = 3, nlist = 16, nprobe = 6,
          rowCountHint = tfidfCount(s, dir), dimHint = 64)
        .where(col("query_id") % 10 === 0)
        .select(col("query_id"), col("neighbor_id"))
      val exact = textKnnExact(s, dir)
        .select(col("doc_id").as("query_id"), col("neighbor_id"))
      exact.join(approx.withColumn("hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left")
        // coalesce: zero overlap must read recall 0.0, not NULL (the
        // a5 discipline)
        .agg((coalesce(sum(col("hit")), lit(0)) / count(lit(1))).as("r"),
          count(lit(1)).as("n_exact"))
        .select(lit("tfidf_knn_auto").as("method"), col("n_exact"),
          round(col("r"), 4).as("recall_at_3"),
          lit(0.7).as("contract_floor"),
          (col("r") >= 0.7).as("meets_contract"))
    }),

    // The h2 bridge's BYTE-BOUND scale path (VERDICT r11 task 3): the
    // same stored TF-IDF vectors through knnJoinIvfPq — SCALE.md's
    // 100 TB answer for text vectors, where the shuffled member side
    // ships m-byte PQ codes instead of dim floats (~100× narrower than
    // the float rows h3's IVF dispatch exchanges) and candidates rank
    // by ADC before an exact top-k·mult rescore. Same recall contract
    // as h3 (floor 0.7 vs h2's exact rows on the same sampled
    // queries), golden-pinned ×2 sfs — PQ code drift, ADC drift, or a
    // rescore-depth regression all move the pinned recall.
    // rowCountHint: the stored feature table's memoized footer count
    // (tfidfCount) — no per-call sizing job (the a14 hint discipline).
    "h4_text_knn_pq" -> ((s, dir) => {
      val dense = s.read.parquet(tfidfVectorsPath(s, dir))
      val approx = graft.operators.AnnSearch.knnJoinIvfPq(
          dense, "doc", "vec", k = 3, nlist = 16, nprobe = 6,
          rowCountHint = tfidfCount(s, dir), dimHint = 64)
        .where(col("query_id") % 10 === 0)
        .select(col("query_id"), col("neighbor_id"))
      val exact = textKnnExact(s, dir)
        .select(col("doc_id").as("query_id"), col("neighbor_id"))
      exact.join(approx.withColumn("hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left")
        .agg((coalesce(sum(col("hit")), lit(0)) / count(lit(1))).as("r"),
          count(lit(1)).as("n_exact"))
        .select(lit("tfidf_knn_ivfpq").as("method"), col("n_exact"),
          round(col("r"), 4).as("recall_at_3"),
          lit(0.7).as("contract_floor"),
          (col("r") >= 0.7).as("meets_contract"))
    }),

    // HARD-NEGATIVE mining (r12): the retriever-training staple — for
    // each sampled query document, the lexically-close (high BM25)
    // documents that are NOT semantic positives. Composition of two
    // proven retrieval legs: BM25 top-10 from the persisted postings
    // index with the query docs' own text as the query set (t10's
    // batch machinery), anti-joined against the dense positives (h2's
    // exact cosine top-3 over the stored TF-IDF vectors) and the query
    // itself, survivors re-ranked hardest-first (rscore DESC, the
    // h1/t10 tie discipline) to the top-5 negatives per query. Both
    // legs have exact DuckDB formulations, so the mined pairs are
    // ORACLE-exact end-to-end. Scale shape: the BM25 leg is
    // posting-shaped (query terms pushed into the stored index scan),
    // the positive set is output-sized (|Q|·3), the anti-join
    // broadcast-sized — nothing corpus-quadratic.
    // h6 (r13): RAG context assembly END-TO-END — the serving-side
    // composition a retrieval pipeline actually runs per query: BM25
    // top-8 from the persisted index (t10 machinery, self excluded),
    // relevance normalized per query, MMR-diversified to 3 over the
    // STORED TF-IDF vectors (a17 machinery), then the context string
    // assembled in mmr_rank order with its token bill. Every stage is
    // a proven kernel -> full oracle (the h5 lex CTEs + dense-vector
    // reconstruction + the a17 greedy unroll + a string_agg roll-up).
    "h6_rag_context" -> ((s, dir) => {
      val (post, dlen, n, avg) =
        graft.pipeline.SilverIndex.bm25Index(s, bm25IndexPath(s, dir))
      val queries = t(s, dir, "documents")
        .where(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("query_id"),
          coalesce(col("text"), lit("")).as("qtext"))
      val lex = graft.operators.TextSearch
        .scoreBatchFromPostings(post, dlen, n, avg, queries,
          "query_id", "qtext", k1 = 1.2, b = 0.75)
        .where(col("query_id") =!= col("doc"))
        .select(col("query_id"), col("doc"),
          round(col("score"), 6).as("rscore"))
      val top = graft.operators.AnnSearch
        .rankedTopK(lex, "query_id", "doc", "rscore", 8)
      val wq = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
      val cands = top
        .withColumn("rel",
          round(col("rscore") / max(col("rscore")).over(wq), 6))
        .join(s.read.parquet(tfidfVectorsPath(s, dir)), "doc")
      val sel = graft.operators.Mmr.rerank(cands, "query_id", "doc",
        "rel", "vec", k = 3, lambda = 0.7)
      val docsTx = t(s, dir, "documents")
        .select(col("doc_id").as("doc"),
          coalesce(col("text"), lit("")).as("dtext"))
      sel.join(docsTx, "doc")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).cast("long").as("n_ctx"),
          sum(graft.functions.TextFunctions.tokenCount(col("dtext")))
            .cast("long").as("context_tokens"),
          array_join(transform(
            array_sort(collect_list(struct(col("mmr_rank"),
              col("dtext")))),
            x => x.getField("dtext")), " ").as("context_text"))
    }),

    "h5_hard_negatives" -> ((s, dir) => {
      val (post, dlen, n, avg) =
        graft.pipeline.SilverIndex.bm25Index(s, bm25IndexPath(s, dir))
      val queries = t(s, dir, "documents")
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("query_id"),
          coalesce(col("text"), lit("")).as("qtext"))
      val lex = graft.operators.TextSearch
        .scoreBatchFromPostings(post, dlen, n, avg, queries,
          "query_id", "qtext", k1 = 1.2, b = 0.75)
        .select(col("query_id"), col("doc"),
          round(col("score"), 6).as("rscore"))
      val lexTop = graft.operators.AnnSearch
        .rankedTopK(lex, "query_id", "doc", "rscore", 10)
        .select(col("query_id"), col("doc").as("doc_id"), col("rscore"))
      val pos = textKnnExact(s, dir)
        .select(col("doc_id").as("query_id"),
          col("neighbor_id").as("doc_id"))
      // the positive set is |Q|·3 by construction (top-3 per sampled
      // query) — broadcast it rather than let the anti-join sort-merge
      val negs = lexTop
        .join(broadcast(pos), Seq("query_id", "doc_id"), "left_anti")
        .where(col("query_id") =!= col("doc_id"))
      graft.operators.AnnSearch
        .rankedTopK(negs, "query_id", "doc_id", "rscore", 5)
        .select(col("query_id"), col("doc_id").as("negative_id"),
          col("rscore"), col("rank"))
    }),

    // Inverted-index statistics build (TextSearch.postings/termStats):
    // per-term document frequency + collection frequency — the linear
    // posting-list construction keyword retrieval needs; integers, so
    // the oracle is exact. BM25 scoring over this index is spec-checked
    // (TextSearchSpec) — its log/division doubles aren't guaranteed
    // bit-identical across engines.
    "t6_term_stats" -> ((s, dir) =>
      graft.operators.TextSearch.termStats(
        t(s, dir, "documents"), "doc_id", "text")),

    // Gopher-style repetition signal: fraction of word 2-grams that are
    // repeats (1 − distinct/total). Degenerate boilerplate/loop docs
    // score high; a standard pretraining quality filter.
    "t5_repetition" -> ((s, dir) => {
      val total = greatest(tokenCount(col("text")) - 1, lit(0))
      val dist = size(graft.functions.word_shingles(col("text"), 2))
      t(s, dir, "documents").select(
        col("doc_id"),
        total.as("total_2grams"),
        dist.as("distinct_2grams"),
        when(total === 0, lit(0.0))
          .otherwise(lit(1.0) - dist.cast("double") / total.cast("double"))
          .as("repetition_ratio"))
    }),

    // PII redaction: the corpus itself is clean, so the query EMBEDS
    // deterministic doc_id-derived PII (email/SSN/phone/IP) identically
    // in both engines, then scrubs it — proving the substitution
    // semantics and the Java-regex/RE2 portability of the patterns with
    // an exact oracle, plus the per-class audit counts.
    // URL/domain analysis — the curation primitive behind domain
    // blocklists and per-source mixing: extract URLs, aggregate per
    // domain (docs containing it + total occurrences). Corpus text has
    // no URLs, so the query embeds deterministic doc_id-derived ones in
    // both engines, like t7. One narrow extract + explode + one hash
    // shuffle on the (low-cardinality) domain at any scale.
    "t8_url_domains" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val embedded = concat(
        col("text"), lit(" see http://site"),
        (col("doc_id") % 20).cast("string"), lit(".example.com/p/"), id,
        lit(" and https://cdn"), (col("doc_id") % 7).cast("string"),
        lit(".example.org/x"))
      t(s, dir, "documents")
        .select(col("doc_id"), embedded.as("embedded"))
        .select(col("doc_id"),
          explode(regexp_extract_all(col("embedded"),
            lit("https?://[A-Za-z0-9.-]+[^\\s]*"), lit(0))).as("url"))
        .withColumn("domain",
          regexp_extract(col("url"), "https?://([A-Za-z0-9.-]+)", 1))
        .groupBy("domain")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_urls"))
    }),

    // t19 (r14): per-domain document CAP — the anti-spam pass domain
    // extraction exists for: at most 10 docs per registered domain
    // (t8's embedded construction; the doc's domain = its first URL's
    // host, 20 domains of ~|corpus|/20 docs each so the cap BINDS),
    // survivors deterministic in (salt, doc_id) md5-hash order. The
    // operator ranks through the bounded TopKByKey aggregate (no
    // per-domain window sort — a hot domain is the attack the cap
    // guards against); the oracle is the window formulation, a
    // genuinely independent ranking of the same order.
    "t19_domain_cap" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val embedded = concat(
        col("text"), lit(" see http://site"),
        (col("doc_id") % 20).cast("string"), lit(".example.com/p/"), id,
        lit(" and https://cdn"), (col("doc_id") % 7).cast("string"),
        lit(".example.org/x"))
      val withDomain = t(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(embedded, "https?://([A-Za-z0-9.-]+)", 1)
            .as("domain"))
      graft.operators.Splits.capPerStratum(withDomain, "doc_id",
        "domain", "domain-cap-r14", maxRows = 10)
    }),

    // Gopher-rule structural repetition (Rae et al. 2021 §A1.1):
    // duplicate-line fraction, duplicate-line CHARACTER fraction, and
    // the most-frequent word-2-gram's share — whole-line boilerplate
    // signals t5's distinct-2-gram ratio can't see. Lines are the token
    // stream regrouped 7 wide (the corpus carries no newlines — derived
    // structure, like t7's embedded PII). operators/QualitySignals.
    "t9_line_repetition" -> ((s, dir) =>
      graft.operators.QualitySignals.lineRepetition(
        t(s, dir, "documents"), "doc_id", "text", lineWidth = 7)),

    "t7_pii_scrub" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val embedded = concat(
        col("text"), lit(" contact user"), id,
        lit("@mail.example.com phone 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ssn 123-45-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ip 10."), (col("doc_id") % 256).cast("string"), lit(".0."),
        ((col("doc_id") * 7) % 256).cast("string"))
      t(s, dir, "documents")
        .select(col("doc_id"), embedded.as("embedded"))
        .select(col("doc_id"), piiAudit(col("embedded")).as("a"))
        .select(col("doc_id"), col("a.scrubbed").as("scrubbed"),
          col("a.emails").as("n_emails"), col("a.ssns").as("n_ssns"),
          col("a.phones").as("n_phones"), col("a.ips").as("n_ips"))
    })
  )

  /** The t12 pseudo-model: 2048 integer weights derived from the bucket
    * index alone, so the oracle regenerates them in SQL arithmetic. */
  private[graft] val qualityModelWeights: Array[Int] =
    Array.tabulate(2048)(b => ((b.toLong * 2654435761L) % 2003L - 1001L).toInt)

  val oracles: Map[String, String] = Map(
    // the t6 tokenizer CTEs; cf/total from the same postings; the
    // per-doc sum rounds at 6 decimals (reduction order is the only
    // divergence — the h1/BM25 discipline)
    "t13_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY doc_id, term),
        |stats AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf
        |          FROM post GROUP BY term),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM post)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len,
        |  round(-sum(tf * ln(cf / CAST(total AS DOUBLE))) / sum(tf), 6)
        |    AS mean_nll
        |FROM post JOIN stats USING (term) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,

    // the t13 tokenizer as a LIST, adjacency checked directly on the
    // 1-based positions (the operator's pos convention)
    "t17_phrase_search" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ') AS ws
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id
        |  FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        |  WHERE ws[i] = 'fast' AND ws[i+1] = 'table')
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM hits GROUP BY doc_id""".stripMargin,

    // the t13 tokenizer as a LIST (empties filtered before pairing),
    // bigrams via the t12 range/list_transform pattern, two count
    // tables + vocab size, the smoothed-ln mean at the same fixed
    // group bags the Spark aggregation sums over
    "t16_bigram_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ') AS ws0
        |  FROM documents),
        |wsf AS (SELECT doc_id, list_filter(ws0, w -> w <> '') AS ws
        |        FROM toks),
        |uni AS (SELECT doc_id, unnest(ws) AS term FROM wsf),
        |cu AS (SELECT term AS lw, CAST(count(*) AS BIGINT) AS cu
        |       FROM uni GROUP BY term),
        |vv AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM uni),
        |bgx AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |          i -> ws[i] || ' ' || ws[i+1])) AS bigram FROM wsf),
        |bg AS (SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS tf2
        |       FROM bgx GROUP BY doc_id, bigram),
        |cb AS (SELECT bigram, CAST(sum(tf2) AS BIGINT) AS cb
        |       FROM bg GROUP BY bigram),
        |j AS (SELECT bg.doc_id, bg.tf2, cb.cb, cu.cu
        |      FROM bg JOIN cb USING (bigram)
        |      JOIN cu ON cu.lw = string_split(bg.bigram, ' ')[1]),
        |vj AS (SELECT j.*, vv.v FROM j CROSS JOIN vv)
        |SELECT doc_id, CAST(sum(tf2) AS BIGINT) AS n_bigrams,
        |  round(-sum(tf2 * ln((cb + 1.0) / CAST(cu + v AS DOUBLE)))
        |    / sum(tf2), 6) AS mean_nll2
        |FROM vj GROUP BY doc_id""".stripMargin,

    // the t15 CTEs through the UNROUNDED normalized weights, then the
    // SPARSE cosine (Σ w_a·w_b over shared buckets — the vectors are
    // L2-normalized so dot IS cosine; zero-overlap pairs coalesce to
    // 0 via the full pair frame), rounded ranking with the doc
    // tie-break
    "h2_text_knn" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY doc_id, term),
        |b AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(term, ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (a, c) -> (a * 31 + c) % 1000000007) % 64 AS bucket,
        |    tf
        |  FROM post),
        |bt AS (SELECT doc_id, bucket, CAST(sum(tf) AS BIGINT) AS btf
        |       FROM b GROUP BY doc_id, bucket),
        |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM post),
        |dfb AS (SELECT bucket, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfb
        |        FROM bt GROUP BY bucket),
        |w AS (
        |  SELECT doc_id, bucket,
        |    btf * (ln((n + 1.0) / (dfb + 1.0)) + 1.0) AS w
        |  FROM bt JOIN dfb USING (bucket) CROSS JOIN nn),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nm FROM w GROUP BY doc_id),
        |wn AS (SELECT doc_id, bucket, w / nm AS wt
        |       FROM w JOIN nrm USING (doc_id)),
        |ds AS (SELECT DISTINCT doc_id FROM wn),
        |qs AS (SELECT doc_id FROM ds WHERE doc_id % 10 = 0),
        |sp AS (
        |  SELECT a.doc_id AS qid, b.doc_id AS nid, sum(a.wt * b.wt) AS c
        |  FROM wn a JOIN wn b ON a.bucket = b.bucket
        |    AND a.doc_id <> b.doc_id
        |  WHERE a.doc_id % 10 = 0
        |  GROUP BY a.doc_id, b.doc_id),
        |cosim AS (
        |  SELECT q.doc_id AS qid, n.doc_id AS nid,
        |    round(coalesce(sp.c, 0), 6) AS rcos
        |  FROM qs q JOIN ds n ON q.doc_id <> n.doc_id
        |  LEFT JOIN sp ON sp.qid = q.doc_id AND sp.nid = n.doc_id),
        |r AS (
        |  SELECT qid, nid, rcos, row_number() OVER (
        |    PARTITION BY qid ORDER BY rcos DESC, nid ASC) AS rank
        |  FROM cosim)
        |SELECT qid AS doc_id, nid AS neighbor_id, rcos, rank
        |FROM r WHERE rank <= 3""".stripMargin,

    // hard-negative mining: the t10 BM25 CTEs with the sampled docs'
    // own text as the query set (lex top-10), the h2 dense CTEs for
    // the positives (cosine top-3), anti-join + self-exclusion, then
    // the hardest-first re-rank to 5 negatives per query
    // the serving composition replayed end-to-end: the h5 lex CTEs
    // (self-excluded top-8), per-query relevance normalization, the
    // t15 bucket weights rebuilt as DENSE 64-vectors (so the cosines
    // are the same dense folds the operator computes — the a17
    // parity), the 3-pick greedy unroll, then the ordered string_agg
    "h6_rag_context" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY doc_id, term),
        |dlen AS (SELECT doc_id, sum(tf) AS len FROM post GROUP BY doc_id),
        |gstats AS (SELECT count(*) AS n, avg(len) AS avglen FROM dlen),
        |qs AS (SELECT doc_id AS query_id, coalesce(text, '') AS qtext
        |       FROM documents WHERE doc_id % 20 = 0),
        |qterm AS (
        |  SELECT DISTINCT query_id, term FROM (
        |    SELECT query_id, unnest(string_split_regex(trim(
        |             regexp_replace(regexp_replace(lower(qtext),
        |               '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |               '\s+', ' ', 'g')), ' ')) AS term
        |    FROM qs) WHERE term <> ''),
        |qp AS (SELECT * FROM post
        |       WHERE term IN (SELECT DISTINCT term FROM qterm)),
        |dft AS (SELECT term, count(*) AS df FROM qp GROUP BY term),
        |w AS (SELECT qp.doc_id, qp.term,
        |        (ln(((CAST(n AS DOUBLE) - df) + 0.5) / (df + 0.5) + 1.0)
        |           * (tf * (1.2 + 1.0)))
        |          / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * len) / avglen)) AS w
        |      FROM qp JOIN dft USING (term) JOIN dlen USING (doc_id)
        |        CROSS JOIN gstats),
        |qw AS (SELECT qt.query_id, w.doc_id, w.w
        |       FROM w JOIN qterm qt USING (term)),
        |lsc AS (SELECT query_id, doc_id, round(sum(w), 6) AS rscore
        |        FROM qw GROUP BY query_id, doc_id),
        |lr AS (SELECT query_id, doc_id, rscore, row_number() OVER
        |         (PARTITION BY query_id
        |          ORDER BY rscore DESC, doc_id ASC) AS rank
        |       FROM lsc WHERE query_id <> doc_id),
        |lex AS (SELECT query_id, doc_id, rscore FROM lr WHERE rank <= 8),
        |rel AS (SELECT query_id, doc_id,
        |          round(rscore / max(rscore) OVER (PARTITION BY query_id), 6)
        |            AS rel
        |        FROM lex),
        |hb AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(term, ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (a, c) -> (a * 31 + c) % 1000000007) % 64 AS bucket,
        |    tf
        |  FROM post),
        |bt AS (SELECT doc_id, bucket, CAST(sum(tf) AS BIGINT) AS btf
        |       FROM hb GROUP BY doc_id, bucket),
        |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM post),
        |dfb AS (SELECT bucket, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfb
        |        FROM bt GROUP BY bucket),
        |dw AS (
        |  SELECT doc_id, bucket,
        |    btf * (ln((n + 1.0) / (dfb + 1.0)) + 1.0) AS w
        |  FROM bt JOIN dfb USING (bucket) CROSS JOIN nn),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nm FROM dw GROUP BY doc_id),
        |wn AS (SELECT doc_id, bucket, w / nm AS wt
        |       FROM dw JOIN nrm USING (doc_id)),
        |cd AS (SELECT DISTINCT doc_id FROM lex),
        |grid AS (SELECT cd.doc_id, gs.b
        |         FROM cd, unnest(generate_series(0, 63)) AS gs(b)),
        |dv AS (SELECT g.doc_id, list(coalesce(wn.wt, 0) ORDER BY g.b) AS v
        |       FROM grid g LEFT JOIN wn ON wn.doc_id = g.doc_id
        |         AND wn.bucket = g.b
        |       GROUP BY g.doc_id),
        |cand AS (SELECT r.query_id, r.doc_id, r.rel, dv.v
        |         FROM rel r JOIN dv ON dv.doc_id = r.doc_id),
        |lam AS (SELECT CAST(0.7 AS DOUBLE) AS l,
        |               CAST(1 AS DOUBLE) - CAST(0.7 AS DOUBLE) AS il),
        |m1 AS (SELECT query_id, doc_id, v,
        |         round(lam.l * rel - lam.il * CAST(0 AS DOUBLE), 9) AS mmr
        |       FROM cand CROSS JOIN lam),
        |p1 AS (SELECT query_id, doc_id, v, mmr FROM
        |        (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY mmr DESC, doc_id) AS rn FROM m1) WHERE rn = 1),
        |r2 AS (SELECT c.query_id, c.doc_id, c.rel, c.v FROM cand c
        |       LEFT JOIN p1 ON c.query_id = p1.query_id AND c.doc_id = p1.doc_id
        |       WHERE p1.doc_id IS NULL),
        |m2 AS (SELECT r.query_id, r.doc_id, r.v,
        |         round(lam.l * r.rel -
        |               lam.il * list_cosine_similarity(r.v, p1.v), 9) AS mmr
        |       FROM r2 r JOIN p1 ON r.query_id = p1.query_id CROSS JOIN lam),
        |p2 AS (SELECT query_id, doc_id, v, mmr FROM
        |        (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY mmr DESC, doc_id) AS rn FROM m2) WHERE rn = 1),
        |sel2 AS (SELECT query_id, doc_id, v FROM p1
        |         UNION ALL SELECT query_id, doc_id, v FROM p2),
        |r3 AS (SELECT c.query_id, c.doc_id, c.rel, c.v FROM cand c
        |       LEFT JOIN sel2 ON c.query_id = sel2.query_id
        |         AND c.doc_id = sel2.doc_id
        |       WHERE sel2.doc_id IS NULL),
        |m3 AS (SELECT r.query_id, r.doc_id,
        |         round(lam.l * r.rel -
        |               lam.il * max(list_cosine_similarity(r.v, s.v)), 9) AS mmr
        |       FROM r3 r JOIN sel2 s ON r.query_id = s.query_id CROSS JOIN lam
        |       GROUP BY r.query_id, r.doc_id, r.rel, lam.l, lam.il),
        |p3 AS (SELECT query_id, doc_id, mmr FROM
        |        (SELECT *, row_number() OVER (PARTITION BY query_id
        |           ORDER BY mmr DESC, doc_id) AS rn FROM m3) WHERE rn = 1),
        |sel AS (SELECT query_id, doc_id, 1 AS mmr_rank FROM p1
        |        UNION ALL SELECT query_id, doc_id, 2 FROM p2
        |        UNION ALL SELECT query_id, doc_id, 3 FROM p3)
        |SELECT s.query_id,
        |  CAST(count(*) AS BIGINT) AS n_ctx,
        |  CAST(sum(CASE WHEN length(trim(coalesce(d.text, ''))) = 0 THEN 0
        |           ELSE len(string_split_regex(trim(coalesce(d.text, '')),
        |                    '\s+')) END) AS BIGINT) AS context_tokens,
        |  string_agg(coalesce(d.text, ''), ' ' ORDER BY s.mmr_rank)
        |    AS context_text
        |FROM sel s JOIN documents d ON d.doc_id = s.doc_id
        |GROUP BY s.query_id""".stripMargin,

    "h5_hard_negatives" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY doc_id, term),
        |dlen AS (SELECT doc_id, sum(tf) AS len FROM post GROUP BY doc_id),
        |gstats AS (SELECT count(*) AS n, avg(len) AS avglen FROM dlen),
        |qs AS (SELECT doc_id AS query_id, coalesce(text, '') AS qtext
        |       FROM documents WHERE doc_id % 10 = 0),
        |qterm AS (
        |  SELECT DISTINCT query_id, term FROM (
        |    SELECT query_id, unnest(string_split_regex(trim(
        |             regexp_replace(regexp_replace(lower(qtext),
        |               '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |               '\s+', ' ', 'g')), ' ')) AS term
        |    FROM qs) WHERE term <> ''),
        |qp AS (SELECT * FROM post
        |       WHERE term IN (SELECT DISTINCT term FROM qterm)),
        |dft AS (SELECT term, count(*) AS df FROM qp GROUP BY term),
        |w AS (SELECT qp.doc_id, qp.term,
        |        (ln(((CAST(n AS DOUBLE) - df) + 0.5) / (df + 0.5) + 1.0)
        |           * (tf * (1.2 + 1.0)))
        |          / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * len) / avglen)) AS w
        |      FROM qp JOIN dft USING (term) JOIN dlen USING (doc_id)
        |        CROSS JOIN gstats),
        |qw AS (SELECT qt.query_id, w.doc_id, w.w
        |       FROM w JOIN qterm qt USING (term)),
        |lsc AS (SELECT query_id, doc_id, round(sum(w), 6) AS rscore
        |        FROM qw GROUP BY query_id, doc_id),
        |lr AS (SELECT query_id, doc_id, rscore, row_number() OVER
        |         (PARTITION BY query_id
        |          ORDER BY rscore DESC, doc_id ASC) AS rank
        |       FROM lsc),
        |lex AS (SELECT query_id, doc_id, rscore FROM lr WHERE rank <= 10),
        |hb AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(term, ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (a, c) -> (a * 31 + c) % 1000000007) % 64 AS bucket,
        |    tf
        |  FROM post),
        |bt AS (SELECT doc_id, bucket, CAST(sum(tf) AS BIGINT) AS btf
        |       FROM hb GROUP BY doc_id, bucket),
        |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM post),
        |dfb AS (SELECT bucket, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfb
        |        FROM bt GROUP BY bucket),
        |dw AS (
        |  SELECT doc_id, bucket,
        |    btf * (ln((n + 1.0) / (dfb + 1.0)) + 1.0) AS w
        |  FROM bt JOIN dfb USING (bucket) CROSS JOIN nn),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nm FROM dw GROUP BY doc_id),
        |wn AS (SELECT doc_id, bucket, w / nm AS wt
        |       FROM dw JOIN nrm USING (doc_id)),
        |ds AS (SELECT DISTINCT doc_id FROM wn),
        |dqs AS (SELECT doc_id FROM ds WHERE doc_id % 10 = 0),
        |sp AS (
        |  SELECT a.doc_id AS qid, b.doc_id AS nid, sum(a.wt * b.wt) AS c
        |  FROM wn a JOIN wn b ON a.bucket = b.bucket
        |    AND a.doc_id <> b.doc_id
        |  WHERE a.doc_id % 10 = 0
        |  GROUP BY a.doc_id, b.doc_id),
        |cosim AS (
        |  SELECT q.doc_id AS qid, n.doc_id AS nid,
        |    round(coalesce(sp.c, 0), 6) AS rcos
        |  FROM dqs q JOIN ds n ON q.doc_id <> n.doc_id
        |  LEFT JOIN sp ON sp.qid = q.doc_id AND sp.nid = n.doc_id),
        |hr AS (
        |  SELECT qid, nid, rcos, row_number() OVER (
        |    PARTITION BY qid ORDER BY rcos DESC, nid ASC) AS rank
        |  FROM cosim),
        |p3 AS (SELECT qid, nid FROM hr WHERE rank <= 3),
        |neg AS (
        |  SELECT l.query_id, l.doc_id, l.rscore FROM lex l
        |  WHERE l.doc_id <> l.query_id
        |    AND NOT EXISTS (SELECT 1 FROM p3
        |                    WHERE p3.qid = l.query_id AND p3.nid = l.doc_id)),
        |rr AS (SELECT query_id, doc_id, rscore, row_number() OVER
        |         (PARTITION BY query_id
        |          ORDER BY rscore DESC, doc_id ASC) AS rank
        |       FROM neg)
        |SELECT query_id, doc_id AS negative_id, rscore, rank
        |FROM rr WHERE rank <= 5""".stripMargin,

    // the t6 tokenizer/postings CTEs; smoothed idf, round-6 score,
    // (score desc, term asc) window cut at 3
    "t20_tfidf_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
        |  WHERE term <> '' GROUP BY doc_id, term),
        |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM post),
        |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq
        |        FROM post GROUP BY term),
        |w AS (
        |  SELECT doc_id, term, tf, doc_freq,
        |    round(tf * (ln((n + 1.0) / (doc_freq + 1.0)) + 1.0), 6)
        |      AS tfidf
        |  FROM post JOIN dft USING (term) CROSS JOIN nn),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, term ASC) AS rank FROM w)
        |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, doc_freq,
        |  tfidf
        |FROM r WHERE rank <= 3""".stripMargin,

    // the t13 tokenizer/postings CTEs; per-term bucket = the t12 fp31
    // list_reduce fold mod 64; smoothed idf + per-doc L2 norm
    "t15_hash_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY doc_id, term),
        |b AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(term, ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (a, c) -> (a * 31 + c) % 1000000007) % 64 AS bucket,
        |    tf
        |  FROM post),
        |bt AS (SELECT doc_id, bucket, CAST(sum(tf) AS BIGINT) AS btf
        |       FROM b GROUP BY doc_id, bucket),
        |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM post),
        |dfb AS (SELECT bucket, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfb
        |        FROM bt GROUP BY bucket),
        |w AS (
        |  SELECT doc_id, bucket,
        |    btf * (ln((n + 1.0) / (dfb + 1.0)) + 1.0) AS w
        |  FROM bt JOIN dfb USING (bucket) CROSS JOIN nn),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nm FROM w GROUP BY doc_id)
        |SELECT doc_id, bucket, round(w / nm, 6) AS weight
        |FROM w JOIN nrm USING (doc_id)""".stripMargin,

    // the t13 tokenizer/postings CTEs; two unigram models (source =
    // corpus, target = lang='en' slice) with add-1 smoothing over the
    // source vocabulary, then the per-doc tf-weighted log-ratio sum
    "t14_dsir_weights" ->
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
        |  CROSS JOIN tot CROSS JOIN tott)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len,
        |  round(sum(tf * lrv), 6) AS log_w
        |FROM post JOIN lr USING (term)
        |GROUP BY doc_id""".stripMargin,

    // tokenizer = the t6 CTEs; grams = ALL unigram + bigram occurrences
    // (no distinct — a bag model); bucket = the t4 rolling fingerprint
    // mod 2048; weight regenerated from the bucket index; docs with no
    // grams (empty text) score 0 via the left join
    "t12_quality_model" ->
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
        |  FROM b GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(s, 0) AS quality_score,
        |  CAST(coalesce(s, 0) >= 0 AS INT) AS keep
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin,

    "t1_token_counts" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish
        |FROM documents""".stripMargin,

    "t2_quality" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    length(text) AS n_chars,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
        |    len(regexp_extract_all(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]')) AS n_punct,
        |    len(regexp_extract_all(text, '\b(the|and|of|to|in|is|a)\b')) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_chars, n_words,
        |  CASE WHEN n_words = 0 THEN 0.0
        |       ELSE CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) END AS chars_per_word,
        |  CASE WHEN n_chars = 0 THEN 0.0
        |       ELSE CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) END AS punct_ratio,
        |  CASE WHEN n_words = 0 THEN 0.0
        |       ELSE CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE) END AS stopword_ratio
        |FROM b""".stripMargin,

    "t3_lang_id" ->
      """WITH h AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    len(regexp_extract_all(text, '\b(the|and|of|to|in|is|a)\b')) AS en,
        |    len(regexp_extract_all(text, '\b(el|la|de|que|y|los|una)\b')) AS es,
        |    len(regexp_extract_all(text, '\b(der|die|und|das|ist|nicht|ein)\b')) AS de,
        |    len(regexp_extract_all(text, '\b(le|la|les|et|des|est|une)\b')) AS fr
        |  FROM documents)
        |SELECT doc_id, labeled_lang,
        |  CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
        |       WHEN es > 0 AND es >= en AND es >= de AND es >= fr THEN 'es'
        |       WHEN de > 0 AND de >= en AND de >= es AND de >= fr THEN 'de'
        |       WHEN fr > 0 AND fr >= en AND fr >= es AND fr >= de THEN 'fr'
        |       ELSE 'und' END AS lang_guess,
        |  en AS en_hits
        |FROM h""".stripMargin,

    // t3's guess CASE feeding three class-cardinality count CTEs;
    // f1 from the round-6 precision/recall, classes never dropped
    "t18_lang_eval" ->
      """WITH h AS (
        |  SELECT lang AS label,
        |    len(regexp_extract_all(text, '\b(the|and|of|to|in|is|a)\b')) AS en,
        |    len(regexp_extract_all(text, '\b(el|la|de|que|y|los|una)\b')) AS es,
        |    len(regexp_extract_all(text, '\b(der|die|und|das|ist|nicht|ein)\b')) AS de,
        |    len(regexp_extract_all(text, '\b(le|la|les|et|des|est|une)\b')) AS fr
        |  FROM documents WHERE lang IS NOT NULL),
        |pairs AS (
        |  SELECT label,
        |    CASE WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
        |         WHEN es > 0 AND es >= en AND es >= de AND es >= fr THEN 'es'
        |         WHEN de > 0 AND de >= en AND de >= es AND de >= fr THEN 'de'
        |         WHEN fr > 0 AND fr >= en AND fr >= es AND fr >= de THEN 'fr'
        |         ELSE 'und' END AS pred
        |  FROM h),
        |t AS (SELECT label AS clazz, CAST(count(*) AS BIGINT) AS n_true
        |      FROM pairs GROUP BY label),
        |p AS (SELECT pred AS clazz, CAST(count(*) AS BIGINT) AS n_pred
        |      FROM pairs GROUP BY pred),
        |c AS (SELECT label AS clazz, CAST(count(*) AS BIGINT) AS n_correct
        |      FROM pairs WHERE label = pred GROUP BY label),
        |b AS (SELECT coalesce(t.clazz, p.clazz) AS clazz,
        |        coalesce(n_true, 0) AS n_true,
        |        coalesce(n_pred, 0) AS n_pred
        |      FROM t FULL JOIN p ON t.clazz = p.clazz),
        |m AS (SELECT b.clazz, b.n_true, b.n_pred,
        |        coalesce(c.n_correct, 0) AS n_correct,
        |        CASE WHEN b.n_pred = 0 THEN 0.0
        |             ELSE round(CAST(coalesce(c.n_correct, 0) AS DOUBLE)
        |                        / b.n_pred, 6) END AS precision,
        |        CASE WHEN b.n_true = 0 THEN 0.0
        |             ELSE round(CAST(coalesce(c.n_correct, 0) AS DOUBLE)
        |                        / b.n_true, 6) END AS recall
        |      FROM b LEFT JOIN c ON b.clazz = c.clazz)
        |SELECT clazz, n_true, n_pred, n_correct, precision, recall,
        |  CASE WHEN precision + recall = 0.0 THEN 0.0
        |       ELSE round(2.0 * precision * recall
        |                  / (precision + recall), 6) END AS f1
        |FROM m""".stripMargin,

    "t4_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (a, c) -> (a * 31 + c) % 1000000007) AS fp
        |FROM documents""".stripMargin,

    // BM25 replicated on the t6 tokenizer (k1=1.2, b=0.75, expression
    // structure mirroring TextSearch.bm25Scores), ranks on
    // round(score, 6); semantic leg is the a1 cosine machinery; RRF
    // contributions mirror HybridSearch.rrf term-for-term
    "h1_hybrid_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY doc_id, term),
        |dlen AS (SELECT doc_id, sum(tf) AS len FROM post GROUP BY doc_id),
        |gstats AS (SELECT count(*) AS n, avg(len) AS avglen FROM dlen),
        |qp AS (SELECT * FROM post
        |       WHERE term IN ('spark', 'vector', 'stream', 'join')),
        |dft AS (SELECT term, count(*) AS df FROM qp GROUP BY term),
        |w AS (SELECT qp.doc_id,
        |        (ln(((CAST(n AS DOUBLE) - df) + 0.5) / (df + 0.5) + 1.0)
        |           * (tf * (1.2 + 1.0)))
        |          / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * len) / avglen)) AS w
        |      FROM qp JOIN dft USING (term) JOIN dlen USING (doc_id)
        |        CROSS JOIN gstats),
        |ls AS (SELECT doc_id, round(sum(w), 6) AS rscore FROM w GROUP BY doc_id),
        |lex AS (SELECT doc_id, row_number() OVER
        |          (ORDER BY rscore DESC, doc_id ASC) AS rank
        |        FROM ls ORDER BY rscore DESC, doc_id ASC LIMIT 20),
        |sem AS (SELECT e.vec_id AS doc_id, row_number() OVER
        |          (ORDER BY list_cosine_similarity(q.v,
        |             CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id ASC) AS rank
        |        FROM embeddings e,
        |          (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |           WHERE vec_id = 0) q
        |        WHERE e.vec_id <> 0
        |        ORDER BY list_cosine_similarity(q.v,
        |          CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id ASC LIMIT 20),
        |u AS (SELECT doc_id, 1.0 / (60.0 + CAST(rank AS DOUBLE)) AS contrib
        |        FROM lex
        |      UNION ALL
        |      SELECT doc_id, 1.0 / (60.0 + CAST(rank AS DOUBLE)) FROM sem),
        |f AS (SELECT doc_id, sum(contrib) AS rrf_score, count(*) AS legs_hit
        |      FROM u GROUP BY doc_id),
        |r AS (SELECT doc_id, rrf_score, legs_hit, row_number() OVER
        |        (ORDER BY rrf_score DESC, doc_id ASC) AS rank
        |      FROM f ORDER BY rrf_score DESC, doc_id ASC LIMIT 10)
        |SELECT doc_id, rrf_score, legs_hit, rank FROM r""".stripMargin,

    // batched BM25 on the h1 tokenizer/arithmetic CTEs, generalized to a
    // VALUES query table: per-term df/weights once across the batch,
    // per-query fan-out via the (query_id, term) join, windowed top-10
    "t10_bm25_batch" ->
      """WITH qs(query_id, qtext) AS (VALUES
        |    ('q1', 'spark vector stream join'),
        |    ('q2', 'hash merge sort window'),
        |    ('q3', 'customer batch scan')),
        |toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY doc_id, term),
        |dlen AS (SELECT doc_id, sum(tf) AS len FROM post GROUP BY doc_id),
        |gstats AS (SELECT count(*) AS n, avg(len) AS avglen FROM dlen),
        |qterm AS (
        |  SELECT DISTINCT query_id, term FROM (
        |    SELECT query_id, unnest(string_split_regex(trim(
        |             regexp_replace(regexp_replace(lower(qtext),
        |               '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |               '\s+', ' ', 'g')), ' ')) AS term
        |    FROM qs) WHERE term <> ''),
        |qp AS (SELECT * FROM post
        |       WHERE term IN (SELECT DISTINCT term FROM qterm)),
        |dft AS (SELECT term, count(*) AS df FROM qp GROUP BY term),
        |w AS (SELECT qp.doc_id, qp.term,
        |        (ln(((CAST(n AS DOUBLE) - df) + 0.5) / (df + 0.5) + 1.0)
        |           * (tf * (1.2 + 1.0)))
        |          / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * len) / avglen)) AS w
        |      FROM qp JOIN dft USING (term) JOIN dlen USING (doc_id)
        |        CROSS JOIN gstats),
        |qw AS (SELECT qt.query_id, w.doc_id, w.w
        |       FROM w JOIN qterm qt USING (term)),
        |sc AS (SELECT query_id, doc_id, round(sum(w), 6) AS rscore
        |       FROM qw GROUP BY query_id, doc_id),
        |r AS (SELECT query_id, doc_id, rscore, row_number() OVER
        |        (PARTITION BY query_id
        |         ORDER BY rscore DESC, doc_id ASC) AS rank
        |      FROM sc)
        |SELECT query_id, doc_id, rscore, rank FROM r WHERE rank <= 10""".stripMargin,

    // the h1 lexical CTEs (the index path is semantically the live
    // corpus score; the oracle neither knows nor cares about the
    // persisted plumbing), top-10 on the rounded score
    "t11_bm25_index" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY doc_id, term),
        |dlen AS (SELECT doc_id, sum(tf) AS len FROM post GROUP BY doc_id),
        |gstats AS (SELECT count(*) AS n, avg(len) AS avglen FROM dlen),
        |qp AS (SELECT * FROM post
        |       WHERE term IN ('spark', 'vector', 'stream', 'join')),
        |dft AS (SELECT term, count(*) AS df FROM qp GROUP BY term),
        |w AS (SELECT qp.doc_id,
        |        (ln(((CAST(n AS DOUBLE) - df) + 0.5) / (df + 0.5) + 1.0)
        |           * (tf * (1.2 + 1.0)))
        |          / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * len) / avglen)) AS w
        |      FROM qp JOIN dft USING (term) JOIN dlen USING (doc_id)
        |        CROSS JOIN gstats),
        |ls AS (SELECT doc_id, round(sum(w), 6) AS rscore FROM w GROUP BY doc_id)
        |SELECT doc_id, rscore, row_number() OVER
        |    (ORDER BY rscore DESC, doc_id ASC) AS rank
        |  FROM ls ORDER BY rscore DESC, doc_id ASC LIMIT 10""".stripMargin,

    "t6_term_stats" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(
        |           regexp_replace(regexp_replace(lower(text),
        |             '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', ' ', 'g'),
        |             '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |post AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term <> '' GROUP BY doc_id, term)
        |SELECT term, count(*) AS doc_freq, CAST(sum(tf) AS BIGINT) AS coll_freq
        |FROM post GROUP BY term""".stripMargin,

    "t5_repetition" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        |    string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN n_tokens <= 1 THEN 0 ELSE n_tokens - 1 END AS total_2grams,
        |    CASE WHEN n_tokens <= 1 THEN 0
        |         ELSE len(list_distinct(list_transform(range(1, len(ws)),
        |                i -> ws[i] || ' ' || ws[i+1]))) END AS distinct_2grams
        |  FROM b)
        |SELECT doc_id, total_2grams, distinct_2grams,
        |  CASE WHEN total_2grams = 0 THEN 0.0
        |       ELSE 1.0 - CAST(distinct_2grams AS DOUBLE)
        |            / CAST(total_2grams AS DOUBLE) END AS repetition_ratio
        |FROM g""".stripMargin,

    // lines = 7-token slices; DuckDB list slices are 1-based inclusive
    // (ws[a:b]), range() stop-exclusive; formulas stay term-for-term
    // with QualitySignals.lineRepetition so the double divisions agree
    // bitwise
    "t9_line_repetition" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS ws
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, unnest(list_transform(
        |           range(0, CAST(ceil(len(ws) / 7.0) AS BIGINT)),
        |           i -> array_to_string(ws[i*7+1 : i*7+7], ' '))) AS line
        |  FROM b),
        |lc AS (SELECT doc_id, line, count(*) AS cnt, length(line) AS len
        |       FROM l GROUP BY doc_id, line),
        |la AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_lines,
        |         count(*) AS n_distinct,
        |         sum((cnt - 1) * len) AS dup_chars,
        |         sum(cnt * len) AS tot_chars
        |       FROM lc GROUP BY doc_id),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |           i -> ws[i] || ' ' || ws[i+1])) AS gram
        |  FROM b),
        |gc AS (SELECT doc_id, gram, count(*) AS cnt
        |       FROM g GROUP BY doc_id, gram),
        |ga AS (SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS tot_grams
        |       FROM gc GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(n_lines, 0) AS n_lines,
        |  CASE WHEN coalesce(n_lines, 0) = 0 THEN 0.0
        |       ELSE 1.0 - CAST(n_distinct AS DOUBLE)
        |            / CAST(n_lines AS DOUBLE) END AS dup_line_frac,
        |  CASE WHEN coalesce(tot_chars, 0) = 0 THEN 0.0
        |       ELSE CAST(dup_chars AS DOUBLE)
        |            / CAST(tot_chars AS DOUBLE) END AS dup_line_char_frac,
        |  CASE WHEN coalesce(tot_grams, 0) = 0 THEN 0.0
        |       ELSE CAST(top_cnt AS DOUBLE)
        |            / CAST(tot_grams AS DOUBLE) END AS top_2gram_frac
        |FROM documents d
        |LEFT JOIN la ON d.doc_id = la.doc_id
        |LEFT JOIN ga ON d.doc_id = ga.doc_id""".stripMargin,

    // the patterns here must stay in lockstep with TextFunctions.piiPatterns
    "t7_pii_scrub" ->
      """WITH e AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |         || '@mail.example.com phone 555-'
        |         || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |         || ' ssn 123-45-'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |         || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
        |         || CAST((doc_id * 7) % 256 AS VARCHAR) AS embedded
        |  FROM documents),
        |c1 AS (SELECT doc_id,
        |    len(regexp_extract_all(embedded, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |    regexp_replace(embedded, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
        |  FROM e),
        |c2 AS (SELECT doc_id, n_emails,
        |    len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssns,
        |    regexp_replace(t, '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS t
        |  FROM c1),
        |c3 AS (SELECT doc_id, n_emails, n_ssns,
        |    regexp_replace(t, '\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b', '<CC>', 'g') AS t
        |  FROM c2),
        |c4 AS (SELECT doc_id, n_emails, n_ssns,
        |    len(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phones,
        |    regexp_replace(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS t
        |  FROM c3),
        |c5 AS (SELECT doc_id, n_emails, n_ssns, n_phones,
        |    len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        |    regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t
        |  FROM c4)
        |SELECT doc_id, t AS scrubbed, n_emails, n_ssns, n_phones, n_ips
        |FROM c5""".stripMargin,

    // t19: the t8 embedded construction (first URL's host), the Splits
    // hash key, then the cap as a row_number window — independent of
    // the operator's bounded-aggregate ranking
    "t19_domain_cap" ->
      """WITH e AS (
        |  SELECT doc_id,
        |    regexp_extract(
        |      text || ' see http://site' || CAST(doc_id % 20 AS VARCHAR)
        |           || '.example.com/p/' || CAST(doc_id AS VARCHAR)
        |           || ' and https://cdn' || CAST(doc_id % 7 AS VARCHAR)
        |           || '.example.org/x',
        |      'https?://([A-Za-z0-9.-]+)', 1) AS domain
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, domain,
        |    substring(md5('domain-cap-r14:' || CAST(doc_id AS VARCHAR)), 1, 12)
        |      AS hk
        |  FROM e),
        |r AS (
        |  SELECT doc_id, domain,
        |    row_number() OVER (PARTITION BY domain ORDER BY hk, doc_id)
        |      AS cap_rank
        |  FROM h)
        |SELECT domain, doc_id, CAST(cap_rank AS BIGINT) AS cap_rank
        |FROM r WHERE cap_rank <= 10""".stripMargin,

    "t8_url_domains" ->
      """WITH e AS (
        |  SELECT doc_id,
        |    text || ' see http://site' || CAST(doc_id % 20 AS VARCHAR)
        |         || '.example.com/p/' || CAST(doc_id AS VARCHAR)
        |         || ' and https://cdn' || CAST(doc_id % 7 AS VARCHAR)
        |         || '.example.org/x' AS embedded
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, unnest(regexp_extract_all(embedded,
        |           'https?://[A-Za-z0-9.-]+[^\s]*')) AS url
        |  FROM e)
        |SELECT regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS domain,
        |       count(DISTINCT doc_id) AS n_docs,
        |       count(*) AS n_urls
        |FROM u GROUP BY 1""".stripMargin
  )
}
