package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Privacy

/** The ERASURE CERTIFICATE protocol (p8) — the one run a compliance
  * officer actually executes, composed from the already-proven pieces:
  *
  *   1. build/refresh the derived artifacts from the FULL base
  *      (skipped on rerun once the pre-audit exists — see below);
  *   2. PRE-AUDIT everything and PERSIST it (the p5 counts; written
  *      before any mutation, so a rerun can still state what was);
  *   3. BASE ERASE: anti-join the subjects out of each base table,
  *      written as the clean release copies;
  *   4. ARTIFACT PROPAGATION: [[SilverIndex.erasePostings]] /
  *      [[SilverIndex.eraseMinhash]] / [[SilverIndex.eraseIvf]] (the
  *      p6 staged-swap rewrites — idempotent: erasing the already-
  *      erased is a no-op);
  *   5. SKETCH RESET + RE-FOLD: the insert-only KMV cannot subtract
  *      ([[SilverIndex.resetSketch]]'s rebuild-from-clean contract) —
  *      reset, then re-fold the CLEAN base;
  *   6. CERTIFICATE: one manifest row per table/artifact/sketch with
  *      the pre-audit counts, the p5 accounting identity
  *      (n_total = n_refs + n_after), the re-audit MEASURED on the
  *      rewritten state (re_total, re_refs), and an additive survivor
  *      CONTENT DIGEST ([[Privacy.contentDigestAgg]] — the c15
  *      manifest discipline: certify content, not just counts).
  *
  * CRASH CONVERGENCE (the property CrashRecoverySpec injects): every
  * step is idempotent or guarded, so rerunning the whole protocol
  * after a crash at ANY point converges to the same certificate —
  *   - the artifact builds are guarded on the persisted pre-audit:
  *     without the guard, a rerun AFTER the base erase would re-append
  *     the erased docs through the id-anti-join refresh (they are no
  *     longer in the index, so the anti-join would let them back in);
  *   - the pre-audit itself is immutable once written (rerun reads it);
  *   - base erase recomputes from the immutable SOURCE frames;
  *   - the artifact erases are anti-joins (no-ops on re-run);
  *   - the sketch reset + re-fold is deterministic in the clean base.
  *
  * Digest coverage is the erasure-RELEVANT content: the per-row keys
  * (and for postings the (doc, term, tf) triple) — what proves the
  * subject's rows are gone and the survivors intact. Full-content
  * digests of derived values (minhash signatures, IVF list ids) would
  * need the quantizer replayed in the oracle; the survivor key set is
  * the auditable cross-engine contract. Scale: each leg is one scan +
  * an output-sized aggregate; the digests ride the same scans.
  */
object ErasureProtocol {

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Run (or resume) the protocol under `root`; the certificate lands
    * at `root/certificate`. `docs` needs (doc_id, text, lang); `emb`
    * needs (vec_id, embedding); `subjects` one id column shared by the
    * doc and vector id spaces. */
  def run(spark: SparkSession, root: String, docs: DataFrame,
      emb: DataFrame, subjects: DataFrame, subjectCol: String): Unit = {
    val pre = s"$root/pre"
    // ---- 1. artifacts from the FULL base, guarded (see scaladoc)
    if (!exists(spark, pre)) {
      buildArtifacts(spark, root, docs, emb)
      // ---- 2. pre-audit, persisted BEFORE any mutation
      audits(spark, root, docs, emb, subjects, subjectCol)
        .write.mode("overwrite").parquet(pre)
    }
    // ---- 3. base erase -> the clean release copies
    baseErase(spark, root, docs, emb, subjects, subjectCol)
    // ---- 4. artifact propagation (staged-swap, idempotent)
    SilverIndex.erasePostings(spark, s"$root/post", subjects, subjectCol)
    SilverIndex.eraseMinhash(spark, s"$root/mh", subjects, subjectCol)
    SilverIndex.eraseIvf(spark, s"$root/ivf", subjects, subjectCol)
    // ---- 5. sketch reset + re-fold from the CLEAN base
    val cleanDocs = spark.read.parquet(s"$root/base/documents")
    SilverIndex.resetSketch(spark, s"$root/kmv")
    SilverIndex.refreshKmv(cleanDocs.select(col("lang"), col("doc_id")),
      "lang", "doc_id", k = 32, s"$root/kmv")
    // ---- 6. certificate: pre counts + measured re-audit + digests
    val cleanEmb = spark.read.parquet(s"$root/base/embeddings")
    val post = audits(spark, root, cleanDocs, cleanEmb, subjects,
        subjectCol)
      .select(col("name"), col("n_total").as("re_total"),
        col("n_refs").as("re_refs"), col("digest"))
    spark.read.parquet(pre)
      .select(col("name"), col("kind"), col("n_total"), col("n_refs"),
        col("n_after"))
      .join(post, Seq("name"))
      .write.mode("overwrite").parquet(s"$root/certificate")
  }

  /** Step 1 — the artifact builds, factored out so CrashRecoverySpec
    * can hand-build the exact mid-protocol states with the exact
    * production parameters. */
  private[pipeline] def buildArtifacts(spark: SparkSession, root: String,
      docs: DataFrame, emb: DataFrame): Unit = {
    SilverIndex.refreshPostings(docs, "doc_id", "text", s"$root/post")
    SilverIndex.refreshMinhash(docs, "doc_id", "text", n = 2,
      numHashes = 8, s"$root/mh")
    SilverIndex.refreshIvf(emb, "vec_id", "embedding", nlist = 8,
      s"$root/ivf")
    SilverIndex.refreshKmv(docs.select(col("lang"), col("doc_id")),
      "lang", "doc_id", k = 32, s"$root/kmv")
  }

  /** Step 3 — the base erase, factored for the same reason. */
  private[pipeline] def baseErase(spark: SparkSession, root: String,
      docs: DataFrame, emb: DataFrame, subjects: DataFrame,
      subjectCol: String): Unit = {
    Privacy.erase(docs, "doc_id", subjects, subjectCol)
      .write.mode("overwrite").parquet(s"$root/base/documents")
    Privacy.erase(emb, "vec_id", subjects, subjectCol)
      .write.mode("overwrite").parquet(s"$root/base/embeddings")
  }

  /** One audit pass over every leg: (name, kind, n_total, n_refs,
    * n_after, digest) — counts via [[Privacy.erasureAudit]]'s
    * broadcast-left-join shape, the digest riding a second aggregate
    * on the same scan. The sketch leg has no per-subject rows (the
    * rebuild-from-clean contract), so its n_refs/n_after are NULL and
    * its n_total is the exploded (grp, hash) row count. */
  private[pipeline] def audits(spark: SparkSession, root: String, docs: DataFrame,
      emb: DataFrame, subjects: DataFrame,
      subjectCol: String): DataFrame = {
    val legs: Seq[(String, String, DataFrame, String, Seq[String])] = Seq(
      ("documents", "base", docs.select(col("doc_id")), "doc_id",
        Seq("doc_id")),
      ("embeddings", "base", emb.select(col("vec_id")), "vec_id",
        Seq("vec_id")),
      ("postings", "artifact",
        SilverIndex.postingsIndex(spark, s"$root/post"), "doc",
        Seq("doc", "term", "tf")),
      ("minhash", "artifact",
        SilverIndex.minhashIndex(spark, s"$root/mh"), "doc", Seq("doc")),
      ("ivf", "artifact",
        SilverIndex.ivfAssigned(spark, s"$root/ivf"), "neighbor_id",
        Seq("neighbor_id")))
    val subj = broadcast(
      subjects.select(col(subjectCol).as("__s")).distinct())
    val tableRows = legs.map { case (name, kind, df, keyCol, digCols) =>
      df.join(subj, df(keyCol) === subj("__s"), "left")
        .agg(count(lit(1)).as("n_total"),
          coalesce(sum(when(col("__s").isNotNull, lit(1L))
            .otherwise(lit(0L))), lit(0L)).as("n_refs"),
          Privacy.contentDigestAgg(digCols)
            .cast("string").as("digest"))
        .select(lit(name).as("name"), lit(kind).as("kind"),
          col("n_total"), col("n_refs"),
          (col("n_total") - col("n_refs")).as("n_after"), col("digest"))
    }.reduce(_ unionByName _)
    val kmvRows = SilverIndex.kmvIndex(spark, s"$root/kmv")
      .select(col("grp"), explode(col("kmins")).as("hk"))
      .agg(count(lit(1)).as("n_total"),
        Privacy.contentDigestAgg(Seq("grp", "hk"))
          .cast("string").as("digest"))
      .select(lit("kmv_lang").as("name"), lit("sketch").as("kind"),
        col("n_total"), lit(null).cast("long").as("n_refs"),
        lit(null).cast("long").as("n_after"), col("digest"))
    tableRows.unionByName(kmvRows)
  }
}
