package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyword retrieval over a document corpus — the lexical complement to
  * [[AnnSearch]]'s embedding search.
  *
  *  - [[termStats]]: the inverted-index statistics build — one
  *    explode + two hash aggregations; at 100 TB this is the classic
  *    linear posting-list construction, shuffled once on the term.
  *  - [[bm25TopK]]: Okapi BM25 scoring of a tokenized query — the
  *    (tiny) query-term frame broadcasts against the per-(doc, term)
  *    frequency table, so the corpus never shuffles: score = one
  *    broadcast semi-join + a per-doc sum + a top-k window.
  *
  * Tokenization is lowercase whitespace splitting of
  * [[graft.functions.NormalizeTitle]]-style normalized text (strip
  * punctuation, collapse whitespace) so "Engineer," and "engineer"
  * agree.
  *
  * Unicode contract (shared, pinned in TextHashContractSpec): the
  * tokenizer never splits inside a supplementary-plane character, and
  * downstream term HASHES differ by kernel — [[graft.functions
  * .TextFunctions.fingerprint]] (t15 buckets here) folds per code
  * point (engine-portable beyond ASCII), while the fp31 (t12) and BPE
  * (c12) kernels fold UTF-16 code units (cross-engine parity pinned
  * for BMP/ASCII corpora).
  */
object TextSearch {

  /** Lowercased, punctuation-stripped, whitespace-split tokens — THE
    * tokenization every postings consumer shares. Public so callers
    * that must manipulate token ORDER under the same normalization
    * (c28's deterministic scramble plant) cannot drift from it. */
  def tokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    split(trim(regexp_replace(regexp_replace(lower(c),
      "[\\p{Punct}]", " "), "\\s+", " ")), " ")

  /** Per-(doc, term) term frequency — the postings table. Empty docs
    * contribute nothing. The input spreads across cores BEFORE the
    * tokenize + explode: a one-file corpus otherwise runs the whole
    * normalize/split/partial-agg pipeline as a single task (measured
    * 1.3 s of h1's 1.8 s warm wall at sf0.1), and the groupBy's partial
    * aggregation landing on the hash(doc) partitioning makes the final
    * agg exchange-free. */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"), col(textCol).as("__text"))
      .transform(Par.spread(_, col("doc")))
      .select(col("doc"), explode(tokens(col("__text"))).as("term"))
      .where(col("term") =!= "")
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))

  /** POSITIONAL postings: (doc, term, pos) — pos is the 1-based token
    * index under the same tokenization as [[postings]]. The substrate
    * for phrase/proximity queries; ~len(doc) rows per doc instead of
    * |vocab ∩ doc| (store it only if phrase search is served, the
    * standard positional-index trade). */
  def positionalPostings(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol).as("doc"), col(textCol).as("__text"))
      .transform(Par.spread(_, col("doc")))
      .select(col("doc"), posexplode(tokens(col("__text"))))
      .where(col("col") =!= "")
      .select(col("doc"), col("col").as("term"),
        (col("pos") + 1).as("pos"))

  /** Exact PHRASE match — docs where `phrase`'s terms appear at
    * consecutive token positions, with the occurrence count:
    * (doc, n_hits). Terms must arrive normalized (lowercase, no
    * punctuation — the [[postings]] token form); overlapping
    * occurrences count separately ("a a a" hits "a a" twice).
    *
    * Scale shape: the positional postings are FILTERED to the phrase's
    * terms before anything joins (over a stored positional index that
    * is a pushed `In(term, …)` — only the phrase's posting lists are
    * ever read), then each adjacency is one (doc, pos)-keyed join of
    * those lists with the position shifted — k−1 narrow joins for a
    * k-term phrase, cost ∝ the posting lists, never the corpus. The
    * filtered lists are scanned k times, so they sit behind a persist
    * barrier. */
  def phraseMatch(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, s"phrase needs >= 2 terms: $phrase")
    require(phrase.forall(w => w.nonEmpty && w == w.toLowerCase),
      s"phrase terms must be normalized lowercase tokens: $phrase")
    val pp = graft.ManagedCache.swap("TextSearch.phrase",
      positionalPostings(df, idCol, textCol)
        .where(col("term").isin(phrase.distinct: _*)))
    val base = pp.where(col("term") === phrase.head)
      .select(col("doc"), col("pos"))
    phrase.zipWithIndex.tail
      .foldLeft(base) { case (acc, (w, i)) =>
        acc.join(pp.where(col("term") === w)
            .select(col("doc"), (col("pos") - i).as("pos")),
          Seq("doc", "pos"))
      }
      .groupBy("doc").agg(count(lit(1)).as("n_hits"))
  }

  /** Corpus term statistics: document frequency and collection
    * frequency per term. */
  def termStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    postings(df, idCol, textCol)
      .groupBy("term")
      .agg(count(lit(1)).as("doc_freq"), sum(col("tf")).as("coll_freq"))

  /** Okapi BM25 scores for every matching document — the pre-top-k
    * frame behind [[bm25TopK]]: standard idf `ln((N − df + 0.5)/
    * (df + 0.5) + 1)`, saturation `tf·(k1+1)/(tf + k1·(1 − b +
    * b·len/avglen))`. Output: doc, score (double). EAGER: N and avg doc
    * length are computed at construction (two tiny aggregates over the
    * postings).
    *
    * The score is a float SUM over the doc's matched query terms, so
    * its last bits depend on reduction order: rank orderings built on it
    * should round first (e.g. `round(score, 6)`) if two docs can share
    * a (tf-profile, length) — mathematically equal scores are otherwise
    * ordered by accumulated noise, not the tie-break column. */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
      query: String, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = query.toLowerCase.replaceAll("[\\p{Punct}]", " ")
      .trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "empty query")
    if (qTerms.size <= fewTermsMax)
      bm25ScoresFewTerms(df, idCol, textCol, qTerms, k1, b)
    else
      bm25ScoresFromPostings(
        graft.ManagedCache.swap("TextSearch.bm25TopK",
          postings(df, idCol, textCol)), query, k1, b)
  }

  /** Term-count ceiling for the narrow single-query path. Past this the
    * per-term tf columns stop being "a few extra expressions" and the
    * postings formulation's one explode wins. */
  private val fewTermsMax = 16

  /** BM25 for a FEW-term query without ever building the postings
    * table: per-term tf is a narrow `size(filter(tokens, _ = term))`
    * expression, doc length is `size(tokens)`, and the corpus-global
    * statistics (N, avg length, per-term document frequency) collapse
    * into ONE single-row aggregate. The only exchanges in the whole
    * plan are that 1-row aggregate and whatever the caller ranks with —
    * no (doc, term) shuffle, no postings materialization, nothing
    * proportional to the vocabulary. This is the right 100 TB shape for
    * ad-hoc queries: a 4-term query against a petabyte corpus is two
    * narrow scans (stats, then score), not an index build. Recurring
    * query streams should use [[bm25ScoresFromPostings]] /
    * [[bm25ScoresBatch]] against a persisted index
    * ([[graft.pipeline.SilverIndex.refreshPostings]]) instead.
    *
    * Arithmetic is term-for-term identical to [[bm25ScoresFromPostings]]
    * (same idf/saturation expressions, driver-computed idf since df is
    * known after the stats row); only the per-doc sum's reduction order
    * differs (fixed term order here vs aggregation order there), an
    * ulp-level effect TextSearchSpec pins at 1e-9. */
  private def bm25ScoresFewTerms(df: DataFrame, idCol: String,
      textCol: String, qTerms: Seq[String], k1: Double, b: Double)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tfCols = qTerms.zipWithIndex.map { case (term, i) =>
      size(filter(col("__toks"), t => t === lit(term))).cast("long").as(s"__tf$i")
    }
    val perDoc = graft.ManagedCache.swap("TextSearch.bm25FewTerms",
      df.select(col(idCol).as("doc"), col(textCol).as("__text"))
        .transform(Par.spread(_, col("doc")))
        .select(col("doc"),
          filter(tokens(col("__text")), t => t =!= "").as("__toks"))
        .select(col("doc") +: size(col("__toks")).cast("long").as("len") +:
          tfCols: _*)
        .where(col("len") > 0))
    val statCols = count(lit(1)).as("n") +: avg(col("len")).as("avg") +:
      qTerms.indices.map(i =>
        sum((col(s"__tf$i") > 0).cast("long")).as(s"__df$i"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*).head()
    val nDocs = stats.getLong(0)
    if (nDocs == 0)
      return Seq.empty[(Long, Double)].toDF("doc", "score")
        .select(col("doc").cast(df.schema(idCol).dataType), col("score"))
    val avgLen = stats.getDouble(1)
    val w = qTerms.indices.map { i =>
      val dfT = stats.getLong(2 + i).toDouble
      val idf = math.log((nDocs.toDouble - dfT + 0.5) / (dfT + 0.5) + 1.0)
      val tf = col(s"__tf$i").cast("double")
      when(col(s"__tf$i") > 0,
        lit(idf) * (tf * (k1 + 1)) /
          (tf + lit(k1) * (lit(1 - b) + lit(b) * col("len") / avgLen)))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    perDoc
      .where(qTerms.indices.map(i => col(s"__tf$i") > 0).reduce(_ || _))
      .select(col("doc"), w.as("score"))
  }

  /** [[bm25Scores]] from an ALREADY-BUILT postings table (doc, term, tf)
    * — the recurring-query shape against a persisted index
    * ([[graft.pipeline.SilverIndex.refreshPostings]]): zero tokenize/
    * explode work at query time. */
  def bm25ScoresFromPostings(cached: DataFrame, query: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = cached.sparkSession
    val docLen = cached.groupBy("doc").agg(sum(col("tf")).as("len"))
    val global = docLen.agg(count(lit(1)), avg(col("len"))).head()
    val nDocs = global.getLong(0)

    val qTerms = query.toLowerCase.replaceAll("[\\p{Punct}]", " ")
      .trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "empty query")
    import spark.implicits._
    // a corpus with no non-empty documents scores nothing — return the
    // empty result instead of NPE-ing on avg(len) = null
    if (nDocs == 0)
      return Seq.empty[(Long, Double)].toDF("doc", "score")
        .select(col("doc").cast(cached.schema("doc").dataType), col("score"))
    val avgLen = global.getDouble(1)
    scoreFromPostings(cached, docLen, nDocs, avgLen, qTerms, k1, b)
  }

  /** The postings-side scoring core with the corpus statistics ALREADY
    * known (a real index stores doc lengths and (N, Σlen) at build time
    * — [[graft.pipeline.SilverIndex.refreshPostings]]; deriving doc
    * lengths per query re-aggregates the entire postings table, measured
    * 27 s of the 27 s query-from-postings wall at 1M docs). Query terms
    * are driver-known, so the term filter is an `isin` PREDICATE — it
    * pushes into the parquet scan and, with term-sorted postings files,
    * prunes row groups by min/max term statistics; a broadcast join
    * could never push past the scan. */
  private[graft] def scoreFromPostings(cached: DataFrame, docLen: DataFrame,
      nDocs: Long, avgLen: Double, qTerms: Seq[String],
      k1: Double, b: Double): DataFrame = {
    val qPost = cached.where(col("term").isin(qTerms: _*))
    val dfPerTerm = qPost.groupBy("term").agg(count(lit(1)).as("df"))
    qPost
      .join(broadcast(dfPerTerm), "term")
      .join(docLen, "doc")
      .withColumn("idf", log(
        (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("w", col("idf") * (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / avgLen)))
      .groupBy("doc").agg(sum(col("w")).as("score"))
  }

  /** Per-document unigram surprisal — the in-engine form of CCNet-style
    * perplexity filtering (Wenzek et al. 2020 filter on a KenLM
    * perplexity; with no external LM the corpus's OWN unigram
    * distribution is the honest model): mean negative log-likelihood
    * `−Σ tf·ln(cf/total) / len` over the doc's tokens, where `cf` is
    * the corpus collection frequency. Boilerplate/templated docs score
    * LOW (their tokens are corpus-frequent), lexically odd docs score
    * HIGH — the standard quality-bucketing signal.
    *
    * Built entirely on the postings machinery: one tokenize/explode
    * ([[postings]]), per-term collection frequencies aggregated from
    * the same postings and joined back on the term (at 100 TB this is
    * the one term-keyed shuffle the inverted index already pays —
    * against a PERSISTED index
    * ([[graft.pipeline.SilverIndex.refreshPostings]]) the stats side is
    * a stored table and the join prunes to the corpus being scored),
    * then one per-doc sum. Output: doc, len (tokens), mean_nll
    * (double, nats). Callers ranking on it should round first (the
    * [[bm25Scores]] reduction-order caveat). */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    surprisalFromPostings(postings(df, idCol, textCol))

  /** [[unigramSurprisal]] from an already-built postings table. The
    * input feeds THREE consumers (the eager total, the stats side, and
    * the scored side of the final join), so it is persisted here —
    * without that, a non-persisted postings lineage (a live tokenize/
    * explode/groupBy) would re-run 3×. */
  def surprisalFromPostings(post: DataFrame): DataFrame = {
    val p = graft.ManagedCache.swap("TextSearch.surprisalPostings", post)
    surprisalOver(p)
  }

  /** [[surprisalFromPostings]] against a PERSISTED postings table
    * ([[graft.pipeline.SilverIndex.refreshPostings]]): a stored
    * 3-column parquet is cheap to re-scan, so persisting it wholesale
    * (the live-lineage contract above) only costs memory-write time.
    * Instead the SMALL side — the per-term collection frequencies —
    * is persisted for its two consumers (the total and the scoring
    * join), and the postings scan runs twice from disk with the
    * projection pushed. Same output, index-serving cost shape. */
  def surprisalFromIndex(post: DataFrame): DataFrame = {
    val (stats, total) = indexStats(post)
    surprisalJoin(post, stats, total)
  }

  /** [[surprisalFromIndex]] restricted to a candidate doc set (any
    * one-column frame of doc ids): the unigram MODEL (cf/total) stays
    * the full index — scoring a filtered candidate pool against a
    * frozen corpus LM, the CCNet composition — but only the
    * candidates' postings flow into the scoring join (a doc-keyed
    * semi-join the stored doc-partitioned postings serve cheaply).
    * At 100 TB this is the difference between scoring every document
    * and scoring the curation survivors. */
  def surprisalFromIndexFor(post: DataFrame, docIds: DataFrame)
      : DataFrame = {
    val (stats, total) = indexStats(post)
    surprisalJoin(
      post.join(docIds.select(col(docIds.columns.head).as("doc")),
        Seq("doc"), "left_semi"),
      stats, total)
  }

  /** BIGRAM language-model surprisal with add-one smoothing — the
    * sequence-aware upgrade of [[surprisalFromIndex]]'s unigram model
    * (CCNet's actual filter is an LM perplexity; the corpus's own
    * bigram distribution is the strongest model expressible without an
    * external artifact): per document, `mean −ln P(w_i | w_{i−1})`
    * with `P = (c(w_{i−1} w_i) + 1) / (c(w_{i−1}) + V)` over corpus
    * counts and vocabulary size V. Low = phrase-level boilerplate
    * (navigation chains, templates repeat bigrams verbatim), high =
    * unusual word ORDER even when the unigrams are common — exactly
    * what t13's bag-of-words model cannot see.
    *
    * Everything is built-in codegen'd expressions: tokens via the
    * shared retrieval tokenizer, per-doc bigrams via `zip_with` over
    * two array slices (no UDF, no explode-then-window), counts via two
    * term-keyed aggregations. Scale shape: the bigram/unigram count
    * tables are postings-shaped silver artifacts (a recurring pipeline
    * persists them exactly like the t13 index; V and the count joins
    * are term-keyed shuffles of count-table size, never corpus text).
    * Deterministic ln/division at fixed group bags → exact oracle
    * under round(…, 6), the t13 discipline.
    * Output: doc, n_bigrams, mean_nll2 (unrounded). Documents with
    * fewer than two tokens have no bigram evidence and are absent,
    * like t13's empty docs. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val base = df.select(col(idCol).as("doc"), col(textCol).as("__text"))
      .transform(Par.spread(_, col("doc")))
      .select(col("doc"),
        filter(tokens(col("__text")), w => w =!= "").as("ws"))
    val n1 = greatest(size(col("ws")) - 1, lit(0))
    val bg = base
      .select(col("doc"), explode(zip_with(
        slice(col("ws"), lit(1), n1), slice(col("ws"), lit(2), n1),
        (a, b) => concat(a, lit(" "), b))).as("bigram"))
      .groupBy("doc", "bigram").agg(count(lit(1)).as("tf2"))
    val uni = base.select(col("doc"), explode(col("ws")).as("lw"))
    val cu = uni.groupBy("lw").agg(count(lit(1)).cast("long").as("cu"))
    val v = uni.select(countDistinct(col("lw")).as("v"))
    val cb = bg.groupBy("bigram")
      .agg(sum(col("tf2")).cast("long").as("cb"))
    bg.join(cb, "bigram")
      .withColumn("lw", split(col("bigram"), " ").getItem(0))
      .join(cu, "lw")
      .crossJoin(broadcast(v))
      .groupBy("doc")
      .agg(sum(col("tf2")).cast("long").as("n_bigrams"),
        (-sum(col("tf2") *
            log((col("cb") + 1.0) /
              (col("cu") + col("v")).cast("double"))) /
          sum(col("tf2"))).as("mean_nll2"))
  }

  /** DSIR-style importance log-weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling",
    * public): rank source documents by how target-domain-like their
    * token distribution is, `log w(x) = Σ_term tf · (ln p_t(term) −
    * ln p_s(term))`, with add-1 smoothing over the SOURCE vocabulary
    * for both unigram models so target-absent terms score a finite
    * penalty instead of −∞. The published method hashes n-gram
    * features into buckets; with word unigrams over the retrieval
    * tokenizer the bucket table IS the postings vocabulary — the same
    * machinery, exact and SQL-replayable (the paper's hashing is a
    * memory bound, not a semantic one).
    *
    * Postings-shaped like [[unigramSurprisal]]: both models aggregate
    * from the (persistable) postings table — `targetDocs` (any
    * one-column frame of doc ids, e.g. a trusted in-domain slice)
    * selects the target subset by a semi-join — and scoring is one
    * term-keyed join + one per-doc sum. Callers ranking/sampling on
    * the weight should round first (the h1 discipline). Output: doc,
    * len (tokens), log_w (nats; > 0 ⇒ more target-like than the
    * source average). */
  def dsirLogWeights(post: DataFrame, targetDocs: DataFrame): DataFrame = {
    val p = graft.ManagedCache.swap("TextSearch.dsirPostings", post)
    val tgt = p.join(
      targetDocs.select(col(targetDocs.columns.head).as("doc")),
      Seq("doc"), "left_semi")
    val srcStats = p.groupBy("term").agg(sum(col("tf")).as("cf_s"))
    val tgtStats = tgt.groupBy("term").agg(sum(col("tf")).as("cf_t"))
    val Row2 = p.agg(coalesce(sum(col("tf")), lit(0L)),
      countDistinct(col("term"))).head()
    val (totalS, vocab) = (Row2.getLong(0), Row2.getLong(1))
    val totalT = tgt.agg(coalesce(sum(col("tf")), lit(0L))).head().getLong(0)
    val stats = srcStats.join(tgtStats, Seq("term"), "left")
      .select(col("term"),
        (log((coalesce(col("cf_t"), lit(0L)) + 1.0) /
            (totalT + vocab).toDouble) -
          log((col("cf_s") + 1.0) / (totalS + vocab).toDouble))
          .as("__lr"))
    p.join(stats, "term")
      .groupBy("doc")
      .agg(sum(col("tf")).as("len"),
        sum(col("tf") * col("__lr")).as("log_w"))
  }

  /** Hashing TF-IDF vectorization — the feature-extraction bridge from
    * the text family to the vector family (the sklearn
    * HashingVectorizer→TfidfTransformer composition; also fastText's
    * input layer): terms hash into `dim` buckets by the t4 rolling
    * fingerprint (the engine-portable hash the t12 classifier already
    * pins cross-engine), bucket weights are smoothed TF-IDF
    * `tf · (ln((N+1)/(df_b+1)) + 1)`, and each document L2-normalizes
    * — so dot product IS cosine and the output feeds [[AnnSearch]]
    * directly ([[hashingTfIdfVectors]] for the dense form).
    *
    * Postings-shaped: one narrow bucket map over the (persistable)
    * postings table, a (doc, bucket) partial re-aggregation, the
    * bucket document frequencies (vocabulary-sized — broadcast scale),
    * and a per-doc norm join. Returns SPARSE triples (doc, bucket,
    * weight) — the honest storage shape at any dim. */
  def hashingTfIdf(post: DataFrame, dim: Int): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val p = graft.ManagedCache.swap("TextSearch.tfidfPostings", post)
    val b = p.withColumn("bucket",
        pmod(graft.functions.TextFunctions.fingerprint(col("term")),
          lit(dim.toLong)))
      .groupBy("doc", "bucket").agg(sum(col("tf")).as("btf"))
    val n = p.select(col("doc")).distinct().count()
    val dfb = b.groupBy("bucket").agg(countDistinct(col("doc")).as("dfb"))
    val w = b.join(dfb, "bucket")
      .withColumn("__w", col("btf") *
        (log(lit(n + 1.0) / (col("dfb") + 1.0)) + 1.0))
    val norm = w.groupBy("doc")
      .agg(sqrt(sum(col("__w") * col("__w"))).as("__n"))
    w.join(norm, "doc")
      .select(col("doc"), col("bucket"),
        (col("__w") / col("__n")).as("weight"))
  }

  /** Per-document TOP-K KEYWORDS by smoothed TF-IDF — the
    * document-tagging face of the postings index (the "top tf-idf
    * terms per doc" summarization every corpus-exploration stack
    * ships): each doc's terms ranked by `tf·(ln((N+1)/(df+1))+1)`
    * (the t15 smoothing), rounded to 6 with the term tie-break so the
    * ranking is engine-portable (the h1 discipline — ulp noise in ln
    * can't flip an order the tie-break doesn't then fix).
    *
    * Postings-shaped: term document frequencies (vocabulary-sized),
    * one join back, and a per-doc top-k window over each doc's own
    * |distinct terms| rows — nothing corpus-wide but the one count.
    * Output: (doc, rank, term, tf, doc_freq, tfidf). */
  def keywordsFromPostings(post: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val p = graft.ManagedCache.swap("TextSearch.keywordPostings", post)
    val n = p.select(col("doc")).distinct().count()
    val dft = p.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val w = p.join(dft, "term")
      .withColumn("tfidf",
        round(col("tf") * (log(lit(n + 1.0) / (col("doc_freq") + 1.0))
          + 1.0), 6))
    val win = Window.partitionBy(col("doc"))
      .orderBy(col("tfidf").desc, col("term").asc)
    w.withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select(col("doc"), col("rank"), col("term"), col("tf"),
        col("doc_freq"), col("tfidf"))
  }

  /** [[hashingTfIdf]] as dense `array<double>` vectors (doc, vec) —
    * the [[AnnSearch]] input shape. Dense is only sane at small dim
    * (the classic LSA/LSH regime); keep the sparse triples otherwise. */
  def hashingTfIdfVectors(post: DataFrame, dim: Int): DataFrame =
    hashingTfIdf(post, dim)
      .groupBy("doc")
      .agg(map_from_entries(
        collect_list(struct(col("bucket"), col("weight")))).as("__m"))
      .select(col("doc"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          coalesce(element_at(col("__m"), j.cast("long")), lit(0.0)))
          .as("vec"))

  private def indexStats(post: DataFrame): (DataFrame, Long) = {
    val stats = graft.ManagedCache.swap("TextSearch.surprisalStats",
      post.groupBy("term").agg(sum(col("tf")).as("cf")))
    (stats, stats.agg(coalesce(sum(col("cf")), lit(0L))).head().getLong(0))
  }

  private def surprisalOver(p: DataFrame): DataFrame =
    surprisalJoin(p, p.groupBy("term").agg(sum(col("tf")).as("cf")),
      p.agg(coalesce(sum(col("tf")), lit(0L))).head().getLong(0))

  private def surprisalJoin(p: DataFrame, stats: DataFrame,
      total: Long): DataFrame =
    p.join(stats, "term")
      .groupBy("doc")
      .agg(sum(col("tf")).as("len"),
        (-sum(col("tf") * log(col("cf") / total.toDouble)) /
          sum(col("tf"))).as("mean_nll"))

  /** Okapi BM25 top-k over [[bm25Scores]].
    * Output: doc, score (double), rank — deterministic tie-break on doc. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      query: String, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankTopK(bm25Scores(df, idCol, textCol, query, k1, b), k)

  /** [[bm25TopK]] against a prebuilt postings table. */
  def bm25TopKFromPostings(post: DataFrame, query: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankTopK(bm25ScoresFromPostings(post, query, k1, b), k)

  /** [[bm25TopK]] against a FULL index — postings plus stored per-doc
    * lengths and corpus stats ([[graft.pipeline.SilverIndex]] maintains
    * them with the postings): zero corpus-wide aggregation at query
    * time; the pushed term predicate and the docLen join are the whole
    * plan. An empty index (nDocs = 0) scores nothing — no row ever
    * evaluates the NaN avgLen. */
  def bm25TopKFromIndexParts(post: DataFrame, docLen: DataFrame,
      nDocs: Long, avgLen: Double, query: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = query.toLowerCase.replaceAll("[\\p{Punct}]", " ")
      .trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "empty query")
    rankTopK(scoreFromPostings(post, docLen, nDocs, avgLen, qTerms, k1, b), k)
  }

  /** [[bm25TopKBatch]] against a FULL index — see
    * [[bm25TopKFromIndexParts]]. */
  def bm25TopKBatchFromIndexParts(post: DataFrame, docLen: DataFrame,
      nDocs: Long, avgLen: Double, queries: DataFrame, idCol: String,
      textCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75)
      : DataFrame =
    AnnSearch.rankedTopK(
      if (nDocs == 0) emptyBatch(post, queries, idCol, textCol)
      else scoreBatchFromPostings(post, docLen, nDocs, avgLen, queries,
        idCol, textCol, k1, b),
      "query_id", "doc", "score", k)

  /** Okapi BM25 scores for a whole TABLE of queries in ONE pass over the
    * postings — the batch-retrieval shape (RAG corpus scoring, training-
    * example mining, evaluation suites run thousands of queries, not
    * one). `queries` is (idCol, textCol); output is (query_id, doc,
    * score).
    *
    * Scale shape: the postings NEVER shuffle — the distinct term set of
    * the whole batch broadcasts into the postings scan (one semi-join
    * filters the corpus to matched postings), per-term df and per-(doc,
    * term) weights compute ONCE regardless of how many queries share a
    * term, and the (query_id, term) frame broadcasts onto the weighted
    * postings to fan out per-query contributions. The only shuffle of
    * non-broadcast data is the final (query_id, doc) sum — rows ∝
    * matched postings × queries-sharing-term, the output's own size.
    * Per-term/per-doc arithmetic is identical to [[bm25Scores]], so a
    * batch row equals the single-query run up to the per-doc sum's
    * reduction order (TextSearchSpec pins rank parity and 1e-9 score
    * agreement). */
  def bm25ScoresBatch(cached: DataFrame, queries: DataFrame,
      idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val docLen = cached.groupBy("doc").agg(sum(col("tf")).as("len"))
    val global = docLen.agg(count(lit(1)), avg(col("len"))).head()
    val nDocs = global.getLong(0)
    if (nDocs == 0) return emptyBatch(cached, queries, idCol, textCol)
    scoreBatchFromPostings(cached, docLen, nDocs, global.getDouble(1),
      queries, idCol, textCol, k1, b)
  }

  // a corpus with no non-empty documents scores nothing — typed empty
  // result instead of NPE-ing on avg(len) = null
  private def emptyBatch(cached: DataFrame, queries: DataFrame,
      idCol: String, textCol: String): DataFrame =
    queries.select(col(idCol).as("query_id")).limit(0)
      .withColumn("doc", lit(null).cast(cached.schema("doc").dataType))
      .withColumn("score", lit(0.0))

  /** Distinct-term ceiling under which a batch's term set is pulled to
    * the driver and becomes a pushed `In(term, …)` predicate. One tiny
    * probe job (≤ cap+1 rows) buys parquet row-group skipping on a
    * term-sorted index — the broadcast semi-join can never reach the
    * scan. Bigger batches keep the join (an In-list of 10⁵ terms would
    * bloat the plan and the scan filter for no skipping value). */
  private val batchPushTermsMax = 1024

  /** [[bm25ScoresBatch]]'s scoring core with corpus statistics already
    * known — see [[scoreFromPostings]]; the index-backed batch path
    * ([[graft.pipeline.SilverIndex.bm25TopKBatchFromIndex]]) lands here
    * without ever re-aggregating doc lengths. The batch's term set lives
    * in a DataFrame, so term filtering is a broadcast semi-join — unless
    * the distinct term set fits [[batchPushTermsMax]], in which case it
    * collapses to a driver-known pushed predicate (same rows either
    * way; TextSearchSpec pins batch ≡ single-query regardless). */
  private[graft] def scoreBatchFromPostings(cached: DataFrame,
      docLen: DataFrame, nDocs: Long, avgLen: Double, queries: DataFrame,
      idCol: String, textCol: String, k1: Double, b: Double): DataFrame = {
    // the tokenized query frame feeds THREE consumers (the driver term
    // probe, the postings term filter when the In-list path loses, and
    // the final query_id attach) — persist it once so the probe job
    // doesn't tokenize the batch a first time only for the df join and
    // the attach to re-tokenize it twice more (ADVICE r8)
    val qTerms = graft.ManagedCache.swap("TextSearch.batchQTerms",
      queries
        .select(col(idCol).as("query_id"),
          explode(tokens(col(textCol))).as("term"))
        .where(col("term") =!= "").distinct())

    val probe = qTerms.select("term").distinct()
      .limit(batchPushTermsMax + 1).collect().map(_.getString(0))
    val qPost =
      if (probe.length <= batchPushTermsMax)
        cached.where(col("term").isin(probe.toIndexedSeq: _*))
      else cached.join(broadcast(qTerms.select("term").distinct()), "term")
    val dfPerTerm = qPost.groupBy("term").agg(count(lit(1)).as("df"))
    qPost
      .join(broadcast(dfPerTerm), "term")
      .join(docLen, "doc")
      .withColumn("idf", log(
        (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("w", col("idf") * (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / avgLen)))
      .join(broadcast(qTerms), "term")
      .groupBy("query_id", "doc").agg(sum(col("w")).as("score"))
  }

  /** Per-query BM25 top-k over [[bm25ScoresBatch]]: one windowed top-k
    * partitioned by query — never a global sort, never a per-query
    * driver loop. Output: query_id, doc, score, rank (tie-break on
    * doc, as [[bm25TopK]]). A query whose every token misses the corpus
    * (or is empty) contributes no rows. */
  def bm25TopKBatch(post: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    AnnSearch.rankedTopK(bm25ScoresBatch(post, queries, idCol, textCol,
      k1, b), "query_id", "doc", "score", k)

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    // distributed top-k (TakeOrdered) FIRST; the rank window then runs
    // over ≤ k rows, so its single partition is not a scale hazard
    val top = scored.orderBy(col("score").desc, col("doc").asc).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc").asc)))
      .select(col("doc"), col("score"), col("rank"))
  }
}
