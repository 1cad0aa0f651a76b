package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2
  * (plus the LLM-pipeline extensions); `oracleSql` holds the DuckDB
  * equivalent for every query whose semantics ANSI SQL can express — the
  * driver hash-compares both result sets at sf0.01.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * Full reference-shaped fuzzy similarity join (token_set prefilter +
    * WRatio scoring) over part names. */
  def entry(spark: SparkSession): DataFrame = {
    GraftFunctions.register(spark)
    FuzzyQueries.fuzzySelfJoin(spark, "/root/testdata/sf0.001")
  }

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (FuzzyQueries.queries, FuzzyQueries.oracles),
      (GoldQueries.queries, GoldQueries.oracles),
      (DedupQueries.queries, DedupQueries.oracles),
      (AnnQueries.queries, AnnQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (StreamQueries.queries, StreamQueries.oracles),
      (TemporalQueries.queries, TemporalQueries.oracles),
      (MultimodalQueries.queries, MultimodalQueries.oracles),
      (CurationQueries.queries, CurationQueries.oracles),
      (PrivacyQueries.queries, PrivacyQueries.oracles),
    )

  /** Queries with no DuckDB-expressible oracle — the driver gate checks
    * only their row counts, so on the CORRECTNESS surface each output row
    * additionally carries a [[GoldenHash]] `content_hash` drift contract,
    * pinned by GOLDENS.json and GoldenHashSpec. Attached via
    * [[hashedQuery]] by Verify/GoldenDump/GoldenHashSpec — NOT inside
    * [[queries]] itself, so Bench times the undecorated queries (the
    * digest's cache+broadcast plumbing costs ~0.3–2.8 s of first-
    * execution JIT/cache-build per query in a forked pass, which would
    * read as a phantom regression on exactly the queries the hash is
    * meant to keep honest). */
  val noOracleHashed: Set[String] = Set("a2_ann_lsh", "a3_ann_ivf",
    "a4_neardup_lsh", "a5_ann_recall", "a6_incr_ivf", "a9_ann_pq",
    "a10_ann_ivfpq", "a11_ann_contracts", "a12_knn_join", "a14_knn_auto",
    "c18_bpe_train", "c30_semantic_lsh_recall", "c31_semantic_index_recall",
    "d4_simhash_pairs", "d9_semdedup", "h3_text_knn_scale",
    "h4_text_knn_pq", "j2_simjoin_fuzzy", "s19_stream_semantic_lsh")

  /** The query as the correctness gate runs it: no-oracle queries carry
    * the whole-result `content_hash` column, oracle queries unchanged. */
  def hashedQuery(name: String): (SparkSession, String) => DataFrame = {
    val f = queries(name)
    if (noOracleHashed(name))
      (s: SparkSession, dir: String) => GoldenHash.withContentHash(f(s, dir))
    else f
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] = groups.flatMap(_._2).toMap
}
