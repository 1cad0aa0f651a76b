package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.{AnnSearch, Dedup, TextSearch}

/** Append-maintained silver tables for the expensive per-document index
  * artifacts — MinHash signatures and IVF list assignments.
  *
  * The reference is a WEEKLY batch (its Prefect crons re-run the whole
  * chain every Sunday), so at 100 TB the dominant recurring cost is not
  * the first build but the re-run: recomputing shingles + signatures (or
  * centroid assignments) for 10¹¹ documents to fold in the 10⁸ that are
  * new. Both artifacts here are per-document deterministic, so an
  * incremental refresh is EXACT, not approximate:
  *
  *  - [[refreshMinhash]] anti-joins the corpus against the indexed doc
  *    ids, computes (doc, sh, sig) for new docs only, and appends —
  *    the union is row-identical to a from-scratch build
  *    (SilverIndexSpec proves it), and the delta run's cost is
  *    ∝ |new docs| (ScaleSmoke's incremental stage measures it).
  *  - [[refreshIvf]] pins the coarse quantizer at FIRST build (the
  *    standard IVF append discipline: centroids freeze, new vectors are
  *    assigned to the frozen lists and appended, partitioned by
  *    `list_id` so probes partition-prune). Assignment is per-row
  *    deterministic against fixed centroids, so incremental == from-
  *    scratch with the same centroids, exactly. Re-quantize by deleting
  *    the index dir when drift warrants (the usual FAISS-style rebuild
  *    cadence decision, left to the operator).
  *
  * Caveat shared by both: rows the operator excludes by construction
  * (empty shingle sets; duplicate ids) are re-derived and re-excluded on
  * every refresh — the anti-join only skips what the index RETAINS.
  * Bounded by the excluded population, which is noise in practice.
  */
object SilverIndex {

  /** What a refresh did: rows appended this run / total index rows. */
  final case class Refresh(appended: Long, total: Long)

  /** True iff `path` holds at least one DATA file — the fs walk alone,
    * no parquet footer read. An append of an EMPTY frame (a quiet
    * streaming micro-batch, a refresh with nothing new on a fresh path)
    * creates the directory with only _SUCCESS in it — and
    * `spark.read.parquet` on that dir fails schema inference, which
    * would wedge every later refresh. "Directory without data files"
    * must mean "no index yet", not an error. */
  private def hasDataFiles(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // manual recursion so HIDDEN SUBTREES are skipped whole — a flat
    // recursive listing would see e.g. _checkpoint/offsets/0 (the
    // streaming checkpoint under the index path) as a data file, because
    // only its own name is visible, not its hidden parent's
    def hasData(dir: Path): Boolean =
      fs.listStatus(dir).exists { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) false
        else if (st.isFile) true
        else hasData(st.getPath)
      }
    fs.exists(p) && hasData(p)
  }

  private def readIfData(spark: SparkSession, path: String)
      : Option[DataFrame] =
    if (hasDataFiles(spark, path)) Some(spark.read.parquet(path)) else None

  // ------------------------------------------------------ row-count sidecar

  /** (data files, total data bytes, max modification time) under `dir`
    * — the freshness fingerprint for the row-count sidecar and the
    * frozen-quantizer caches. The mtime component matters for
    * DELETE-AND-REBUILD: a retrained quantizer over the same nlist/ksub
    * easily reproduces the same file count AND byte count (tiny tables,
    * identical schema and row count), which made a (files, bytes)
    * fingerprint serve STALE centroids after a rebuild
    * (SilverIndexSpec's maintainIvfPq case caught it). Hidden subtrees
    * skipped whole, as [[readIfData]]. */
  private def dataStats(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): (Long, Long, Long) = {
    def walk(d: Path): (Long, Long, Long) =
      fs.listStatus(d).foldLeft((0L, 0L, 0L)) { case ((n, b, t), st) =>
        val name = st.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) (n, b, t)
        else if (st.isFile)
          (n + 1, b + st.getLen, math.max(t, st.getModificationTime))
        else {
          val (cn, cb, ct) = walk(st.getPath)
          (n + cn, b + cb, math.max(t, ct))
        }
      }
    if (fs.exists(dir)) walk(dir) else (0L, 0L, 0L)
  }

  /** The fingerprint string shared by sidecar and caches. */
  private def fingerprint(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): String = {
    val (files, bytes, mtime) = dataStats(fs, new Path(dir))
    s"$files:$bytes:$mtime"
  }

  private def metaFile(dir: String) = new Path(dir, "_rowmeta.json")

  /** The sidecar's row count, IF its fingerprint matches the current
    * data listing — a stale sidecar (crash between append and sidecar
    * write, out-of-band writes, compaction) silently falls back to a
    * real count. The sidecar is why a refresh is a metadata operation:
    * without it every refresh pays two full-table count jobs, and at
    * 10¹¹ indexed rows even a footer-statistics count is a distributed
    * job over every file. */
  private def readMetaRows(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Option[Long] = {
    val f = metaFile(dir)
    if (!fs.exists(f)) None
    else
      try {
        val in = fs.open(f)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val kv = txt.stripPrefix("{").stripSuffix("}").split(",").map { p =>
          val Array(k, v) = p.split(":", 2)
          k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim
        }.toMap
        if (kv("fp").stripPrefix("\"").stripSuffix("\"") ==
            fingerprint(fs, dir))
          Some(kv("rows").toLong)
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def writeMetaRows(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, rows: Long): Unit = {
    val fp = fingerprint(fs, dir)
    val out = fs.create(metaFile(dir), true)
    try out.write(
      s"""{"rows":$rows,"fp":"$fp"}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Rows in the existing table: the validated sidecar when fresh, a
    * count otherwise. */
  private def existingRows(spark: SparkSession, dir: String,
      existing: Option[DataFrame]): Long = existing.fold(0L) { df =>
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    readMetaRows(fs, dir).getOrElse(df.count())
  }

  /** Append `frame` to `dir` as parquet, counting the appended rows with
    * an [[org.apache.spark.sql.Observation]] on the write job itself (no
    * separate count job), then refresh the sidecar with before+appended.
    * `partitionCols` adds `partitionBy`; `shape` lets callers inject the
    * co-locating repartition between the observe point and the write. */
  private def appendCounted(frame: DataFrame, dir: String,
      partitionCols: Seq[String], before: Long,
      shape: DataFrame => DataFrame = identity): Refresh = {
    val spark = frame.sparkSession
    val obs = org.apache.spark.sql.Observation()
    val observed = shape(frame.observe(obs, count(lit(1)).as("n")))
    val w = observed.write.mode("append")
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .parquet(dir)
    val appended = obs.get("n").asInstanceOf[Long]
    val total = before + appended
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    writeMetaRows(fs, dir, total)
    Refresh(appended, total)
  }

  // ---------------------------------------------------------------- MinHash

  /** Bring the signature table at `path` up to date with `docs`:
    * signatures are computed ONLY for doc ids not yet indexed, and
    * appended. Returns counts; read the index back with [[minhashIndex]].
    * Parameters (`n`, `numHashes`) must match the original build — the
    * stored signature length is authoritative downstream, so a mismatch
    * is caught by the width check here rather than silently mixed. */
  def refreshMinhash(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, path: String): Refresh = {
    val spark = docs.sparkSession
    val existing = readIfData(spark, path)
    val newDocs = existing.fold(docs) { ix =>
      // width sanity from ONE stored row (CollectLimit — reads a single
      // row group): the append-only discipline writes uniform widths, so
      // any row exposes a config mismatch, while the previous
      // max(size(sig)) was an unpushable full scan of the signature
      // column on EVERY refresh (~0.5 GB at 1M docs × 64 hashes)
      ix.select(size(col("sig")).as("w")).limit(1).collect()
        .headOption.foreach { width =>
          require(width.isNullAt(0) || width.getInt(0) == numHashes,
            s"index at $path has signature width ${width.get(0)}, " +
              s"refresh requested $numHashes — rebuild, don't mix")
        }
      docs.join(ix.select(col("doc").as(idCol)), Seq(idCol), "left_anti")
    }
    val before = existingRows(spark, path, existing)
    // appended measured by an Observation on the write job itself (and
    // the sidecar carries the running total), so a refresh pays zero
    // count jobs — see appendCounted
    appendCounted(Dedup.minhashSets(newDocs, idCol, textCol, n, numHashes),
      path, Nil, before)
  }

  /** The signature table as [[graft.operators.Dedup.minhashPairsFromSets]]
    * consumes it: (doc, sh, sig). */
  def minhashIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Near-dup pairs from the PERSISTED signatures — the weekly-run shape:
    * zero shingle/signature recompute, banding + exact verification only. */
  def minhashPairs(spark: SparkSession, path: String, rowsPerBand: Int,
      theta: Double): DataFrame =
    Dedup.minhashPairsFromSets(minhashIndex(spark, path), rowsPerBand, theta)

  // -------------------------- perceptual frame FINGERPRINT index (m9)

  /** Bring the perceptual frame-fingerprint table (doc, frame_idx,
    * fingerprint) at `path` up to date with `frames` (the
    * [[graft.operators.Multimodal.sampleFrames]] shape): fingerprints
    * compute ONLY for doc ids not yet indexed, and append — the
    * [[refreshMinhash]] discipline verbatim, because the fingerprint
    * is per-frame deterministic ([[graft.operators.Multimodal
    * .dhashFingerprint]] — pure byte arithmetic), so incremental ==
    * from-scratch exactly. Frames are append-heavy in a real feed
    * (m8's per-run recompute pays the full corpus every time); the
    * index pays only the arriving docs. Append-only: an edited doc
    * means rebuild (or version the path); a SUBJECT doc is erased via
    * [[eraseFingerprints]] (the p6 path). */
  def refreshFingerprints(frames: DataFrame, idCol: String,
      frameIdxCol: String, frameCol: String, path: String): Refresh = {
    val spark = frames.sparkSession
    val existing = readIfData(spark, path)
    val newDocs = existing.fold(frames)(ix => frames.join(
      ix.select(col("doc").as(idCol)).distinct(), Seq(idCol),
      "left_anti"))
    val before = existingRows(spark, path, existing)
    appendCounted(newDocs.select(col(idCol).as("doc"),
      col(frameIdxCol).cast("int").as("frame_idx"),
      graft.operators.Multimodal.dhashFingerprint(col(frameCol))
        .as("fingerprint")),
      path, Nil, before)
  }

  /** The fingerprint table as stored: (doc, frame_idx, fingerprint). */
  def fingerprintIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Frame near-dup pairs from the PERSISTED fingerprints — zero
    * sampling/fingerprint recompute; pigeonhole banding + the exact
    * in-join Hamming bound only ([[Dedup.hammingPairs]] over frame
    * keys `doc·frameStride + frame_idx`). */
  def framePairs(spark: SparkSession, path: String, frameStride: Long,
      maxDist: Int): DataFrame =
    Dedup.hammingPairs(
      fingerprintIndex(spark, path)
        .select((col("doc") * frameStride + col("frame_idx")).as("doc"),
          col("fingerprint").as("simhash")),
      maxDist)

  /** One micro-batch of [[streamingFramePairs]] — the [[nearDupBatch]]
    * protocol verbatim over frame fingerprints: transaction intent
    * (the same crash windows, the same stage-then-rename commit),
    * fingerprint append for the intent's new docs only, then the
    * batch's pairs ([[Dedup.hammingPairsDelta]] — pairs touching a new
    * doc, canonicalized) into a per-batch OVERWRITE partition so a
    * replay re-emits identically instead of duplicating. */
  private[pipeline] def frameNearDupBatch(batch: DataFrame,
      batchId: Long, idCol: String, frameIdxCol: String,
      frameCol: String, frameStride: Long, maxDist: Int,
      sigPath: String, pairsPath: String): Unit = {
    val spark = batch.sparkSession
    val newIds = intentNewIds(spark, sigPath, batchId,
      batch.select(col(idCol).as("doc")).distinct())
    refreshFingerprints(
      batch.join(newIds.withColumnRenamed("doc", idCol), Seq(idCol),
        "left_semi"),
      idCol, frameIdxCol, frameCol, sigPath)
    val keyed = fingerprintIndex(spark, sigPath)
      .select(col("doc"),
        (col("doc") * frameStride + col("frame_idx")).as("fid"),
        col("fingerprint"))
    Dedup.hammingPairsDelta(
        keyed.select(col("fid").as("doc"),
          col("fingerprint").as("simhash")),
        keyed.join(newIds, Seq("doc"), "left_semi").select("fid"),
        maxDist)
      .write.mode("overwrite").parquet(s"$pairsPath/batch=$batchId")
    ()
  }

  /** Continuous frame near-dup maintenance: each micro-batch appends
    * its new docs' fingerprints and emits exactly the pairs involving
    * them (the s6 exactly-once pair contract, m9's streaming face). */
  def streamingFramePairs(frames: DataFrame, idCol: String,
      frameIdxCol: String, frameCol: String, frameStride: Long,
      maxDist: Int, sigPath: String, pairsPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    frames.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        frameNearDupBatch(batch.toDF(), batchId, idCol, frameIdxCol,
          frameCol, frameStride, maxDist, sigPath, pairsPath)
      }
      .option("checkpointLocation", s"$sigPath/_checkpoint")
      .start()

  // ------------------------- symmetric-delete edit-pair index (d18)

  /** Bring the symmetric-delete variant-key table (doc, str, vk, d) at
    * `path` up to date with `df` — the persisted/incremental face d17's
    * [[graft.operators.Dedup.editPairs]] lacked (VERDICT r16 task 3,
    * the m9/d7 discipline): variants compute ONLY for ids not yet
    * indexed and append, and because the deletion neighborhood is a
    * pure per-row function of the string, delta ≡ scratch EXACTLY. The
    * stored `d` column pins the build's maxDist (uniform by the
    * append-only discipline, so ONE row exposes a config mismatch —
    * the [[refreshMinhash]] width probe). Append-only: an edited key
    * means rebuild (or version the path); a subject row is erased via
    * [[eraseEditIndex]] (the p6 path). */
  def refreshEditIndex(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, path: String): Refresh = {
    val spark = df.sparkSession
    val existing = readIfData(spark, path)
    existing.foreach { ix =>
      ix.select(col("d")).limit(1).collect().headOption.foreach { r =>
        require(r.isNullAt(0) || r.getInt(0) == maxDist,
          s"edit index at $path was built at maxDist ${r.get(0)}, " +
            s"refresh requested $maxDist — rebuild, don't mix")
      }
    }
    val newDocs = existing.fold(df)(ix => df.join(
      ix.select(col("doc").as(idCol)).distinct(), Seq(idCol),
      "left_anti"))
    val before = existingRows(spark, path, existing)
    appendCounted(
      graft.operators.Dedup
        .editVariantKeys(newDocs, idCol, strCol, maxDist)
        .select(col("id").as("doc"), col("str"), col("vk"),
          lit(maxDist).as("d")),
      path, Nil, before)
  }

  /** The variant-key table as stored: (doc, str, vk, d). */
  def editIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Edit-distance pairs from the PERSISTED variant keys — the
    * weekly-run shape: zero neighborhood recompute, candidate join +
    * exact in-join levenshtein only. The hot-variant valve applies at
    * serve time (occupancy is a corpus-wide property the per-row
    * append cannot know); `maxDist` must match the stored build (the
    * one-row probe raises otherwise, never silently mixes). */
  def editPairsFromIndex(spark: SparkSession, path: String,
      maxDist: Int, maxVariantOcc: Long = Long.MaxValue): DataFrame = {
    val ix = editIndex(spark, path)
    ix.select(col("d")).limit(1).collect().headOption.foreach { r =>
      require(r.isNullAt(0) || r.getInt(0) == maxDist,
        s"edit index at $path was built at maxDist ${r.get(0)}, " +
          s"serve requested $maxDist")
    }
    graft.operators.Dedup.editPairsFromKeys(
      ix.select(col("doc").as("id"), col("str"), col("vk")),
      maxDist, maxVariantOcc)
  }

  /** One micro-batch of [[streamingEditPairs]] — the [[nearDupBatch]]
    * transaction-intent protocol verbatim over variant keys: intent
    * (same crash windows, same stage-then-rename commit), variant
    * append for the intent's new ids only, then exactly the pairs
    * touching a new id ([[graft.operators.Dedup.editPairsDelta]],
    * canonicalized) into a per-batch OVERWRITE partition so a replay
    * re-emits identically instead of duplicating. */
  private[pipeline] def editPairsBatch(batch: DataFrame, batchId: Long,
      idCol: String, strCol: String, maxDist: Int, maxVariantOcc: Long,
      sigPath: String, pairsPath: String): Unit = {
    val spark = batch.sparkSession
    val newIds = intentNewIds(spark, sigPath, batchId,
      batch.select(col(idCol).as("doc")).distinct())
    refreshEditIndex(
      batch.join(newIds.withColumnRenamed("doc", idCol), Seq(idCol),
        "left_semi"),
      idCol, strCol, maxDist, sigPath)
    graft.operators.Dedup.editPairsDelta(
        editIndex(spark, sigPath)
          .select(col("doc").as("id"), col("str"), col("vk")),
        newIds, maxDist, maxVariantOcc)
      .write.mode("overwrite").parquet(s"$pairsPath/batch=$batchId")
    ()
  }

  /** Continuous edit-pair maintenance: each micro-batch appends its
    * new ids' deletion variants and emits exactly the pairs involving
    * them (the s6 exactly-once pair contract, d18's streaming face). */
  def streamingEditPairs(rows: DataFrame, idCol: String, strCol: String,
      maxDist: Int, sigPath: String, pairsPath: String,
      maxVariantOcc: Long = Long.MaxValue)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        editPairsBatch(batch.toDF(), batchId, idCol, strCol, maxDist,
          maxVariantOcc, sigPath, pairsPath)
      }
      .option("checkpointLocation", s"$sigPath/_checkpoint")
      .start()

  // ---------------- banded semantic-decontam index (c31/s19, r18)

  private def semVecsPath(path: String) = s"${path.stripSuffix("/")}__vecs"

  /** Bring the banded semantic-decontam index at `path` up to date
    * with `train` — the persisted face [[graft.operators.Dedup
    * .crossCosinePairsLsh]] lacked (VERDICT r17 task 2, the d7/m9/d18
    * id-anti-join discipline): c30's banded path recomputed every
    * train-side hyperplane signature per audit, while its exact
    * sibling served from the stream-maintained postings (s16). `train`
    * is the [[graft.operators.TextSearch.hashingTfIdf]] triple shape
    * under a FROZEN vectorizer fit (the [[refreshIvf]] frozen-
    * quantizer stance: signatures are deterministic per doc GIVEN the
    * fit, which is what makes delta ≡ scratch exact — re-fitting the
    * IDF means rebuild, the same contract as a re-trained quantizer).
    *
    * Two tables: `path` holds the signature rows (doc, tbl, sig, bits,
    * tables, dim — the config columns pin the build, uniform by the
    * append-only discipline, so ONE row exposes a mismatch: the d18
    * probe), `path`__vecs the per-doc sorted sparse vectors (doc,
    * buckets, weights) the serve-time exact verify reads. Each table's
    * append anti-joins on ITS OWN doc set, so both appends are
    * individually idempotent at doc grain and every crash window
    * replays clean: vectors append FIRST, so a crash between the
    * writes leaves vec rows whose doc has no signatures yet —
    * invisible to the collision join — and the replay re-appends only
    * the missing signature rows (the vec anti-join skips the doc, no
    * duplicate rows that would double verify pairs). Weekly-audit
    * serve is [[semanticPairsFromIndex]]; erasure
    * [[eraseSemanticLsh]]. */
  def refreshSemanticLsh(train: DataFrame, dim: Int, bits: Int,
      tables: Int, path: String): Refresh = {
    val spark = train.sparkSession
    val existing = readIfData(spark, path)
    existing.foreach { ix =>
      ix.select(col("bits"), col("tables"), col("dim")).limit(1)
        .collect().headOption.foreach { r =>
          require(r.getInt(0) == bits && r.getInt(1) == tables &&
            r.getInt(2) == dim,
            s"semantic index at $path was built at (bits=${r.getInt(0)}, " +
              s"tables=${r.getInt(1)}, dim=${r.getInt(2)}), refresh " +
              s"requested ($bits, $tables, $dim) — rebuild, don't mix")
        }
    }
    val newTriples = existing.fold(train)(ix =>
      train.join(ix.select(col("doc")).distinct(), Seq("doc"), "left_anti"))
    // feeds both table writes — batch-sized by the anti-join
    val vecs = graft.operators.Dedup
      .sparseDocVectors(newTriples, dim, "refreshSemanticLsh")
      .localCheckpoint(true)
    val vdir = semVecsPath(path)
    val existingV = readIfData(spark, vdir)
    val newVecs = existingV.fold(vecs)(vx =>
      vecs.join(vx.select(col("doc")).distinct(), Seq("doc"), "left_anti"))
    appendCounted(newVecs, vdir, Nil,
      existingRows(spark, vdir, existingV))
    val sigs = vecs.withColumn("__bk", explode(
        graft.operators.AnnSearch.sparseTableSigs(
          col("buckets"), col("weights"), bits, tables)))
      .select(col("doc"), col("__bk.tbl").as("tbl"),
        col("__bk.sig").as("sig"), lit(bits).as("bits"),
        lit(tables).as("tables"), lit(dim).as("dim"))
    appendCounted(sigs, path, Nil, existingRows(spark, path, existing))
  }

  /** The signature table as stored: (doc, tbl, sig, bits, tables, dim). */
  def semanticLshIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Banded semantic-decontam pairs served from the PERSISTED index —
    * the weekly-audit shape: zero train-side signature recompute;
    * the benchmark-sized eval triples band on the fly under the
    * STORED build config, candidates are (tbl, sig) collisions against
    * the stored signatures, and every candidate is verified with the
    * exact round-6 sparse cosine from the stored vectors — so output
    * ≡ [[graft.operators.Dedup.crossCosinePairsLsh]] over the same
    * corpora ROW-FOR-ROW (SilverIndexSpec pins it), and c30's recall
    * contract (floor 0.7, false_pairs 0) holds over index-served
    * candidates by construction. */
  def semanticPairsFromIndex(spark: SparkSession, path: String,
      evalTriples: DataFrame, theta: Double): DataFrame = {
    require(theta > 0.0 && theta <= 1.0,
      s"theta must be in (0, 1]: $theta")
    val ix = semanticLshIndex(spark, path)
    val cfg = ix.select(col("bits"), col("tables"), col("dim")).limit(1)
      .collect().headOption
    require(cfg.nonEmpty, s"no semantic index rows under $path")
    val (bits, tables, dim) =
      (cfg.get.getInt(0), cfg.get.getInt(1), cfg.get.getInt(2))
    semanticPairsOver(ix, spark.read.parquet(semVecsPath(path)),
      evalTriples, theta, dim, bits, tables)
  }

  /** The collision-candidates + exact-verify serve over explicit
    * signature/vector frames — shared by the full serve and the
    * per-batch delta (which pre-filters both frames to the batch's
    * new docs). */
  private def semanticPairsOver(sigs: DataFrame, vecs: DataFrame,
      evalTriples: DataFrame, theta: Double, dim: Int, bits: Int,
      tables: Int): DataFrame = {
    // the eval side feeds two consumers (banding + verify) — bound the
    // cache by call site (the c28 semanticW discipline)
    val ev = graft.ManagedCache.swap("SilverIndex.semanticEval",
      graft.operators.Dedup.sparseDocVectors(evalTriples, dim,
        "semanticPairsFromIndex"))
    val evSigs = ev.withColumn("__bk", explode(
        graft.operators.AnnSearch.sparseTableSigs(
          col("buckets"), col("weights"), bits, tables)))
      .select(col("doc").as("eval_doc"), col("__bk.tbl").as("tbl"),
        col("__bk.sig").as("sig"))
    // UNHINTED collision join (the d16 lesson): AQE broadcasts the
    // benchmark-sized eval signatures at runtime and falls back to a
    // (tbl, sig)-keyed shuffle when a giant eval set is not
    val cands = sigs.select(col("doc").as("train_doc"), col("tbl"),
        col("sig"))
      .join(evSigs, Seq("tbl", "sig"))
      .select(col("train_doc"), col("eval_doc"))
      .dropDuplicates("train_doc", "eval_doc")
    // verify: candidates are output-shaped, the vec join back is the
    // a15 semi-into-frozen-assignments stance
    cands
      .join(vecs.select(col("doc").as("train_doc"),
        col("buckets").as("__tb"), col("weights").as("__tw")), "train_doc")
      .join(ev.select(col("doc").as("eval_doc"),
        col("buckets").as("__eb"), col("weights").as("__ew")), "eval_doc")
      .select(col("train_doc"), col("eval_doc"),
        round(graft.functions.VectorFunctions.sparseDot(
          col("__tb"), col("__tw"), col("__eb"), col("__ew")), 6)
          .as("cosine"))
      .where(col("cosine") >= theta)
  }

  /** One micro-batch of [[streamingSemanticPairs]] — the
    * transaction-intent protocol verbatim over hyperplane signatures
    * (the [[editPairsBatch]] shape): intent (same crash windows, same
    * stage-then-rename commit), signature+vector append for the
    * intent's new docs only, then exactly the pairs whose TRAIN doc is
    * new (the eval side is a frozen benchmark frame, so train-only
    * growth makes the union of deltas ≡ the full serve EXACTLY —
    * signatures are per-doc deterministic under the frozen fit, and a
    * pair exists iff its train doc collides, which is decided the
    * batch that doc arrives) into a per-batch OVERWRITE partition so
    * a replay re-emits identically. */
  private[pipeline] def semanticPairsBatch(batch: DataFrame,
      batchId: Long, evalTriples: DataFrame, theta: Double, dim: Int,
      bits: Int, tables: Int, sigPath: String, pairsPath: String): Unit = {
    val spark = batch.sparkSession
    val newIds = intentNewIds(spark, sigPath, batchId,
      batch.select(col("doc")).distinct())
    refreshSemanticLsh(
      batch.join(newIds, Seq("doc"), "left_semi"),
      dim, bits, tables, sigPath)
    val sigs = semanticLshIndex(spark, sigPath)
      .join(newIds, Seq("doc"), "left_semi")
    val vecs = spark.read.parquet(semVecsPath(sigPath))
      .join(newIds, Seq("doc"), "left_semi")
    semanticPairsOver(sigs, vecs, evalTriples, theta, dim, bits, tables)
      .write.mode("overwrite").parquet(s"$pairsPath/batch=$batchId")
    ()
  }

  /** Continuous banded semantic-decontam maintenance: each micro-batch
    * of train-side TF-IDF triples (under the frozen fit) appends its
    * new docs' signatures + vectors and emits exactly the flagged
    * pairs involving them (the s6 exactly-once pair contract — d18's
    * streaming face, one ring out: s19). */
  def streamingSemanticPairs(rows: DataFrame, evalTriples: DataFrame,
      theta: Double, dim: Int, bits: Int, tables: Int, sigPath: String,
      pairsPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        semanticPairsBatch(batch.toDF(), batchId, evalTriples, theta,
          dim, bits, tables, sigPath, pairsPath)
      }
      .option("checkpointLocation", s"$sigPath/_checkpoint")
      .start()

  /** Erasure for the banded semantic index (the p6 path): the
    * subject's signature AND vector rows drop, so
    * [[semanticPairsFromIndex]] can never band or verify an erased doc
    * again — the [[eraseEditIndex]] staged-swap anti-join over both
    * tables. Signatures first: a crash between the two rewrites leaves
    * vec rows no collision can reach. */
  def eraseSemanticLsh(spark: SparkSession, path: String,
      subjects: DataFrame, subjectCol: String): Erased = {
    val r = eraseKeyed(spark, path, "doc", subjects, subjectCol)
    eraseKeyed(spark, semVecsPath(path), "doc", subjects, subjectCol)
    r
  }

  // ----------------------------------------------------------- BM25 postings

  /** Bring the inverted-index postings table (doc, term, tf) at `path`
    * up to date with `docs`: postings compute ONLY for doc ids not yet
    * indexed, and append. Per-document deterministic (tokenize + per-doc
    * term counts), so incremental == from-scratch exactly — and the BM25
    * *statistics* (N, avg length, per-term df) are derived from the
    * postings at query time, so they stay consistent with the appended
    * corpus for free; nothing global needs recomputing on refresh.
    * Append-only like the others: a deleted or edited document means
    * rebuild (or version the path). */
  def refreshPostings(docs: DataFrame, idCol: String, textCol: String,
      path: String): Refresh = {
    val spark = docs.sparkSession
    val existing = readIfData(spark, path)
    val newDocs = existing.fold(docs)(ix => docs.join(
      ix.select(col("doc").as(idCol)).distinct(), Seq(idCol), "left_anti"))
    val before = existingRows(spark, path, existing)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    // was the doclen companion in sync BEFORE this append? (valid meta =
    // fast incremental path; anything else → one idempotent rebuild)
    val auxBefore = readBm25Meta(fs, path)
    // one tokenize/explode pass feeds both the doc-length companion
    // append and the postings append. ORDER MATTERS: `newPost` anti-joins
    // against the postings dir's listing, so every action that evaluates
    // it must run BEFORE the postings append mutates that dir — a cached
    // frame is a best-effort optimization, not a correctness guarantee
    // (evict + re-list after the append would silently empty the delta).
    // The doclen append therefore goes FIRST; a crash between the two
    // leaves the companion ahead of the postings, which the next
    // [[readBm25Meta]] fingerprint check detects (meta not yet written →
    // stale) and [[ensureBm25Aux]] rebuilds wholesale.
    val newPost = graft.ManagedCache.swap("SilverIndex.refreshPostings",
      TextSearch.postings(newDocs, idCol, textCol))
    val r = auxBefore match {
      case Some(st) =>
        val obs = org.apache.spark.sql.Observation()
        newPost.groupBy("doc").agg(sum(col("tf")).as("len"))
          .observe(obs, count(lit(1)).as("n"),
            coalesce(sum(col("len")), lit(0L)).as("s"))
          .write.mode("append").parquet(doclenPath(path))
        // term-sorted within each file: a driver-known query's pushed
        // In(term, …) predicate then skips row groups by min/max stats
        val r0 = appendCounted(newPost, path, Nil, before,
          shape = _.sortWithinPartitions(col("term")))
        writeBm25Meta(fs, path, Bm25Stats(
          st.docs + obs.get("n").asInstanceOf[Long],
          st.totalLen + obs.get("s").asInstanceOf[Long]))
        r0
      case None =>
        val r0 = appendCounted(newPost, path, Nil, before,
          shape = _.sortWithinPartitions(col("term")))
        ensureBm25Aux(spark, path)
        r0
    }
    graft.ManagedCache.release("SilverIndex.refreshPostings")
    r
  }

  // BM25 companion state: per-doc lengths as a SIBLING table
  // (`<path>__doclen` — a `_`-prefixed subdir inside the postings dir
  // would be hidden from the flat postings read as intended, but
  // Spark's hidden-path filter also refuses to read such a dir as a
  // parquet ROOT), plus a stats sidecar carrying (docs, Σlen) with BOTH
  // directory fingerprints — so deleting/rebuilding the postings dir
  // out-of-band makes the companion provably stale, never silently
  // wrong. Deriving doc lengths at query time re-aggregates the whole
  // postings table — measured 27 s of the 27 s query-from-postings wall
  // at 1M docs; an index stores them once.
  private def doclenPath(path: String) = s"${path.stripSuffix("/")}__doclen"
  private def bm25MetaFile(path: String) =
    new Path(doclenPath(path), "_bm25meta.json")

  private[pipeline] case class Bm25Stats(docs: Long, totalLen: Long) {
    def avgLen: Double = totalLen.toDouble / docs
  }

  /** The stats IF both fingerprints are current (doclen untouched since
    * the sidecar write AND postings unchanged since the doclen sync) —
    * a crash between the postings append and the doclen append, a
    * legacy index, or out-of-band writes all invalidate it. */
  private def readBm25Meta(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[Bm25Stats] = {
    val f = bm25MetaFile(path)
    if (!fs.exists(f)) return None
    try {
      val in = fs.open(f)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val kv = txt.stripPrefix("{").stripSuffix("}").split(",").map { p =>
        val Array(k, v) = p.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") ->
          v.trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap
      if (kv("doclen_fp") == fingerprint(fs, doclenPath(path)) &&
          kv("post_fp") == fingerprint(fs, path))
        Some(Bm25Stats(kv("docs").toLong, kv("total_len").toLong))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def writeBm25Meta(fs: org.apache.hadoop.fs.FileSystem,
      path: String, st: Bm25Stats): Unit = {
    val dlFp = fingerprint(fs, doclenPath(path))
    val pFp = fingerprint(fs, path)
    val out = fs.create(bm25MetaFile(path), true)
    try out.write((s"""{"docs":${st.docs},"total_len":${st.totalLen},""" +
      s""""doclen_fp":"$dlFp","post_fp":"$pFp"}""").getBytes("UTF-8"))
    finally out.close()
  }

  /** Doc-length companion + stats, rebuilt wholesale from the postings
    * whenever the sidecar can't prove freshness — ONE idempotent
    * recovery path covers legacy indexes, crashes between the two
    * appends, and out-of-band writes. */
  private def ensureBm25Aux(spark: SparkSession, path: String): Bm25Stats = {
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    readBm25Meta(fs, path).getOrElse {
      spark.read.parquet(path)
        .groupBy("doc").agg(sum(col("tf")).as("len"))
        .write.mode("overwrite").parquet(doclenPath(path))
      val row = spark.read.parquet(doclenPath(path))
        .agg(count(lit(1)), coalesce(sum(col("len")), lit(0L))).head()
      val st = Bm25Stats(row.getLong(0), row.getLong(1))
      writeBm25Meta(fs, path, st)
      st
    }
  }

  /** The persisted postings as [[TextSearch.bm25TopKFromPostings]]
    * consumes them. */
  def postingsIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The postings table re-clustered by DOC — for whole-table
    * DOC-keyed consumers (TF-IDF weighting, per-doc norms: the s16
    * semantic serve path). The stored layout is deliberately
    * TERM-sorted within files so driver-known query terms prune row
    * groups (the BM25 serve path); the flip side is that every scan
    * partition then holds rows for nearly EVERY doc, and a doc-keyed
    * partial aggregation over that layout emits ~|docs|·|groups|
    * partials per partition instead of collapsing locally — measured
    * 5× on the s16 report at sf0.1 (12 s → 2.3 s; the scratch-postings
    * path was never affected because its rows arrive (doc, term)-hash
    * distributed). One narrow exchange of the postings buys doc-local
    * partials for everything downstream. */
  def postingsIndexByDoc(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).repartition(col("doc"))

  /** The full BM25 index for query paths: flat postings, the doc-length
    * companion, and (N, avgLen) from the sidecar — the companion is
    * rebuilt first if anything about it is stale. */
  def bm25Index(spark: SparkSession, path: String)
      : (DataFrame, DataFrame, Long, Double) = {
    val st = ensureBm25Aux(spark, path)
    (spark.read.parquet(path), spark.read.parquet(doclenPath(path)),
      st.docs, st.avgLen)
  }

  /** BM25 top-k against the PERSISTED index — the recurring-query
    * shape: no tokenize/explode over the corpus, no corpus-wide
    * aggregation (lengths and stats are stored), the query terms a
    * PUSHED parquet predicate over the term-sorted postings files. */
  def bm25TopKFromIndex(spark: SparkSession, path: String, query: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (post, docLen, nDocs, avgLen) = bm25Index(spark, path)
    TextSearch.bm25TopKFromIndexParts(post, docLen, nDocs, avgLen,
      query, k, k1, b)
  }

  /** Batched BM25 against the persisted index: a whole (id, text)
    * query table in one pass over the postings, stored lengths/stats —
    * the retrieval-evaluation / training-example-mining shape. */
  def bm25TopKBatchFromIndex(spark: SparkSession, path: String,
      queries: DataFrame, idCol: String, textCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (post, docLen, nDocs, avgLen) = bm25Index(spark, path)
    TextSearch.bm25TopKBatchFromIndexParts(post, docLen, nDocs, avgLen,
      queries, idCol, textCol, k, k1, b)
  }

  // -------------------------------------------------------------------- IVF

  private def centPath(path: String) = s"$path/centroids"
  private def asgPath(path: String) = s"$path/assigned"

  /** Per-path cache of the FROZEN quantizer rows, keyed by the centroid
    * dir's data-file fingerprint: the quantizer freezes at first build
    * (the IVF append discipline), yet every delta refresh and every
    * probe re-read + re-collected its ≤ nlist rows from parquet — two
    * extra jobs per a6-shaped run. The fingerprint (files:bytes) makes a
    * re-trained index (dir deleted + rebuilt) a cache miss, never a
    * stale hit. Values are driver Rows (KBs at any realistic nlist·dim). */
  /** Access-ordered LRU for the driver-side frozen-quantizer caches
    * (ADVICE-class, VERDICT r17 "what's wrong" #2): entries are small
    * (nlist / m·ksub rows) but were never evicted, so a long-lived
    * serving session touching many indexes accumulated them forever.
    * Capacity is re-read per insert from `graft.silverindex.cacheCap`
    * (default 64 entries — generous for any realistic index fan-out;
    * the property exists so the eviction+reload path is spec-testable
    * without 65 index builds). Eviction is harmless by construction:
    * every entry is fingerprint-validated on read, so an evicted path
    * simply reloads from parquet — SilverIndexSpec pins that a capped-
    * out entry serves identical rows after reload. */
  private final class DriverLru[V] {
    private val m = new java.util.LinkedHashMap[String, V](16, 0.75f, true)
    private def cap: Int =
      sys.props.get("graft.silverindex.cacheCap").map(_.toInt).getOrElse(64)
    def get(k: String): Option[V] = m.synchronized(Option(m.get(k)))
    def put(k: String, v: V): Unit = m.synchronized {
      m.put(k, v)
      while (m.size > math.max(1, cap)) {
        val it = m.keySet.iterator(); it.next(); it.remove()
      }
    }
  }

  private val centCache = new DriverLru[
    (String, Array[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType)]

  private def loadCents(spark: SparkSession, path: String): DataFrame = {
    val dir = centPath(path)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val fp = fingerprint(fs, dir)
    val hit = centCache.get(dir)
    val (rows, schema) = hit match {
      case Some((hfp, r, sch)) if hfp == fp => (r, sch)
      case _ =>
        val df = spark.read.parquet(dir)
        val r = df.collect()
        centCache.put(dir, (fp, r, df.schema))
        (r, df.schema)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Seed the cache from a just-written build — the builder already holds
    * the rows driver-side. */
  private def cacheCents(spark: SparkSession, path: String,
      built: DataFrame): Unit = {
    val dir = centPath(path)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    centCache.put(dir, (fingerprint(fs, dir), built.collect(), built.schema))
  }

  /** Bring the IVF index at `path` up to date with `corpus`. First call
    * builds + persists the quantizer (hash-sampled seeds + one Lloyd
    * pass, [[AnnSearch.ivfCentroids]]); later calls FREEZE it and only
    * assign-and-append vectors whose ids are not yet indexed. The
    * assignment table is partitioned by `list_id`, so probe-time reads
    * prune to nprobe/nlist of the files. */
  def refreshIvf(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, path: String): Refresh = {
    val spark = corpus.sparkSession
    val c = AnnSearch.ivfCorpus(corpus, idCol, vecCol)
    // a centroids dir without data files means the quantizer was "built"
    // on an empty corpus (e.g. a quiet first streaming micro-batch) —
    // train it for real on the first non-empty one
    val cents =
      if (hasDataFiles(spark, centPath(path))) loadCents(spark, path)
      else {
        val built = AnnSearch.ivfCentroids(c, nlist)
        built.write.mode("overwrite").parquet(centPath(path))
        cacheCents(spark, path, built)
        built
      }
    val existing = readIfData(spark, asgPath(path))
    val newC = existing.fold(c)(ix =>
      c.join(ix.select(col("neighbor_id")), Seq("neighbor_id"), "left_anti"))
    val before = existingRows(spark, asgPath(path), existing)
    // co-locate each list's rows before the partitioned write: without
    // it every input task emits a file into every list dir (tasks ×
    // nlist tiny files), which the anti-join listing and every probe
    // read then pay for. One narrow shuffle of (id, cv, list_id) rows
    // buys one file per (task, list) with AQE coalescing — at cluster
    // scale, add more write tasks, not more files per list.
    appendCounted(AnnSearch.ivfAssign(newC, cents), asgPath(path),
      Seq("list_id"), before, shape = _.repartition(col("list_id")))
  }

  /** The persisted assignment, shaped for
    * [[AnnSearch.ivfTopKFromAssigned]]: (neighbor_id, cv, list_id) with
    * `list_id` cast back to the centroid table's id type (partition-
    * column inference narrows it on read). */
  def ivfAssigned(spark: SparkSession, path: String): DataFrame = {
    val cents = loadCents(spark, path)
    spark.read.parquet(asgPath(path))
      .withColumn("list_id",
        col("list_id").cast(cents.schema("list_id").dataType))
      .select(col("neighbor_id"), col("cv"), col("list_id"))
  }

  /** ANN top-k against the PERSISTED index: no quantizer build, no
    * corpus-wide assignment — the recurring-query shape. The frozen
    * quantizer serves from the per-path cache ([[loadCents]]), so a
    * probe costs only the partition-pruned assignment scan. */
  def ivfTopKFromIndex(queries: DataFrame, idCol: String, vecCol: String,
      path: String, k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    val cents = loadCents(spark, path)
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    AnnSearch.ivfTopKFromAssigned(q0, ivfAssigned(spark, path), cents,
      k, nprobe)
  }

  /** Metadata-FILTERED ANN against the persisted IVF index (r12): the
    * vector-database "filtered search" semantics — top-k among only the
    * members whose id appears in `eligible` (an attribute predicate
    * resolved to an id frame by the caller: `labels.where(...)`). This
    * is PRE-filtering done right for a frozen index: the filter
    * composes as a semi-join into the assignment table BEFORE any
    * scoring, so candidates are (probed lists ∩ eligible) — never
    * score-then-discard, which silently returns < k eligible rows when
    * the top-k is filter-heavy. The semi-join rides the same
    * partition-pruned read the unfiltered path uses; at 10¹¹ vectors
    * `eligible` is itself an indexed attribute scan and the semi-join
    * hash-partitions on the 8-byte id. Results are exactly
    * `ivfTopKFromIndex` over a corpus restricted to the eligible rows
    * under the SAME frozen quantizer (the assignment is per-row;
    * SilverIndexSpec pins subset + recall vs the filtered brute
    * baseline). */
  def ivfTopKFromIndexWhere(queries: DataFrame, idCol: String,
      vecCol: String, path: String, k: Int, nprobe: Int,
      eligible: DataFrame, eligibleIdCol: String): DataFrame = {
    val spark = queries.sparkSession
    val cents = loadCents(spark, path)
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val members = ivfAssigned(spark, path).join(
      eligible.select(col(eligibleIdCol).as("neighbor_id")).distinct(),
      Seq("neighbor_id"), "left_semi")
    AnnSearch.ivfTopKFromAssigned(q0, members, cents, k, nprobe)
  }

  // ----------------------------------------------------------------- IVF-PQ

  private def bookPath(path: String) = s"$path/codebooks"
  private def codesPath(path: String) = s"$path/codes"

  /** Bring the IVF-PQ index at `path` up to date with `corpus` — the
    * [[AnnSearch.ivfPqTopK]] composite with BOTH quantizers persisted
    * and frozen. First call trains the coarse quantizer and the m
    * per-subspace RESIDUAL codebooks (over `v − centroid(list)`, the
    * FAISS IndexIVFPQ shape — see [[AnnSearch.ivfPqTopK]]) and persists
    * them (`centroids`, `codebooks` keyed by (subspace, list_id)); later
    * calls reload the frozen quantizers and encode ONLY vectors whose
    * ids are not yet in the code table, appending (neighbor_id, codes,
    * rnorm2, list_id) partitioned by `list_id` — `rnorm2` is the stored
    * reconstruction norm ([[AnnSearch.pqReconNorm2]]) that keeps
    * query-time scoring free of any nlist-sized table. Encoding is
    * per-row deterministic against frozen quantizers, so incremental ==
    * from-scratch with the same quantizers, exactly (SilverIndexSpec
    * proves table-level identity). At 10¹¹ vectors this table IS the
    * ANN index: 40 bits of codes + one float norm + a partition key per
    * vector, probes partition-prune to nprobe/nlist of the files, and
    * the weekly refresh costs ∝ |new docs|. Re-train by deleting the
    * index dir (the FAISS-style rebuild cadence decision, as
    * [[refreshIvf]]). Indexes written before residual encoding (no
    * `rnorm2` column) fail loudly at query time — rebuild them. */
  def refreshIvfPq(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, m: Int, ksub: Int, path: String): Refresh = {
    val spark = corpus.sparkSession
    val c = AnnSearch.ivfCorpus(corpus, idCol, vecCol)
    val sub = AnnSearch.pqSubDim(c, m)
    val cents =
      if (hasDataFiles(spark, centPath(path))) loadCents(spark, path)
      else {
        val built = AnnSearch.ivfCentroids(c, nlist)
        built.write.mode("overwrite").parquet(centPath(path))
        cacheCents(spark, path, built)
        built
      }
    val books =
      if (readIfData(spark, bookPath(path)).isDefined)
        loadCodebooks(spark, path, m, sub)
      else {
        // codebooks train on what they will encode: the residuals
        val resid = AnnSearch.ivfAssign(c, cents)
          .join(broadcast(cents), "list_id")
          .select(col("neighbor_id"),
            graft.functions.VectorFunctions.sub(col("cv"), col("centv"))
              .as("cv"))
        val frames = AnnSearch.pqCodebookFrames(resid, m, ksub, sub)
        frames.zipWithIndex.map { case (f, j) =>
            f.select(lit(j).as("subspace"), col("list_id"), col("centv"))
          }.reduce(_ unionAll _)
          .write.mode("overwrite").parquet(bookPath(path))
        frames.map(AnnSearch.centMatrix)
      }
    val existing = readIfData(spark, codesPath(path))
    val newC = existing.fold(c)(ix =>
      c.join(ix.select(col("neighbor_id")), Seq("neighbor_id"), "left_anti"))
    val before = existingRows(spark, codesPath(path), existing)
    val coded = AnnSearch.ivfAssign(newC, cents)
      .join(broadcast(cents), "list_id")
      .withColumn("codes", AnnSearch.pqEncode(
        graft.functions.VectorFunctions.sub(col("cv"), col("centv")),
        books, sub))
      .select(col("neighbor_id"), col("codes"),
        AnnSearch.pqReconNorm2(col("centv"), col("codes"), books, sub)
          .as("rnorm2"),
        col("list_id"))
    appendCounted(coded, codesPath(path), Seq("list_id"), before,
      shape = _.repartition(col("list_id"))) // one file per (task, list) — see refreshIvf
  }

  /** Per-path cache of the FROZEN codebook rows (the centCache pattern):
    * reloading the codebooks cost countDistinct + width check + m
    * filtered collects — m+2 driver actions on every recurring
    * from-index query against a table that froze at first build. */
  private val bookCache = new DriverLru[
    (String, Array[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.DataType)]

  /** The frozen per-subspace codebooks reloaded as the kernel matrices:
    * filtering each subspace and re-running [[AnnSearch.centMatrix]]
    * reproduces the code → matrix-row mapping exactly (list_id-ascending
    * ordering, same driver-side widening — here via the sorted-rows
    * entry point on the cached driver rows). Widths are validated
    * against the refresh parameters so a mismatched re-run fails
    * loudly. */
  /** The fingerprint-validated book rows (shared by [[loadCodebooks]]
    * and the [[bookShape]] stat derivation — one collect per (JVM,
    * frozen-books fingerprint), after which every from-index query is
    * driver-side on the cached rows). */
  private def loadBookRows(spark: SparkSession, path: String)
      : (Array[org.apache.spark.sql.Row],
         org.apache.spark.sql.types.DataType) = {
    val dir = bookPath(path)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val fp = fingerprint(fs, dir)
    bookCache.get(dir) match {
      case Some((hfp, r, t)) if hfp == fp => (r, t)
      case _ =>
        val df = spark.read.parquet(dir)
          .select(col("subspace"), col("list_id"), col("centv"))
        val r = df.collect()
        val t = df.schema("list_id").dataType
        bookCache.put(dir, (fp, r, t))
        (r, t)
    }
  }

  /** (m, sub) of a stored codebook table, from the cached rows — the
    * stats-sidecar answer to the per-call `countDistinct(subspace),
    * max(size(centv))` probe JOB the r11 from-index query path ran
    * (VERDICT r11 task 8: no stat probe on a path whose sidecar already
    * knows the shape). */
  private def bookShape(
      rows: Array[org.apache.spark.sql.Row],
      path: String): (Int, Int) = {
    require(rows.nonEmpty,
      s"codebook table at $path is empty — the index was never built " +
        "or is corrupt; rebuild before querying")
    val m = rows.iterator.map(_.getInt(0)).toSet.size
    val sub = rows.iterator
      .map(r => Option(r.getAs[scala.collection.Seq[Any]](2))
        .fold(0)(_.length)).max
    (m, sub)
  }

  private def loadCodebooks(spark: SparkSession, path: String, m: Int,
      sub: Int): IndexedSeq[AnnSearch.CentMatrix] = {
    val (rows, idType) = loadBookRows(spark, path)
    val bySub = rows.groupBy(_.getInt(0))
    require(bySub.size == m,
      s"index at $path has ${bySub.size} subspaces, refresh requested $m — " +
        "rebuild, don't mix")
    val width = rows.iterator
      .map(r => Option(r.getAs[scala.collection.Seq[Any]](2))
        .fold(0)(_.length)).max
    require(width == sub,
      s"index at $path has subvector width $width, refresh derived $sub — " +
        "rebuild, don't mix")
    AnnSearch.listIdOrdering(idType) match {
      case Some(ord) =>
        (0 until m).map { j =>
          val sorted = bySub(j)
            .map(r => org.apache.spark.sql.Row(r.get(1), r.get(2)))
            .sortWith((a, b) => ord.compare(a.get(0), b.get(0)) < 0)
          AnnSearch.centMatrixFromSortedRows(sorted, idType)
        }
      case None => // exotic id types: the pre-cache distributed path
        val all = spark.read.parquet(bookPath(path))
        (0 until m).map(j => AnnSearch.centMatrix(
          all.where(col("subspace") === j)
            .select(col("list_id"), col("centv"))))
    }
  }

  /** ANN top-k against the PERSISTED IVF-PQ index: no quantizer build,
    * no corpus-wide encode — probes select lists via the frozen coarse
    * quantizer (partition-pruned read of the code table), candidates
    * score on their codes (ADC), and the float `corpus` is touched only
    * by the exact rescore of the top k·rescoreMult (broadcast join into
    * the corpus scan — never a corpus shuffle). */
  def ivfPqTopKFromIndex(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, path: String, k: Int, nprobe: Int,
      rescoreMult: Int = 40): DataFrame = {
    val spark = queries.sparkSession
    val cents = loadCents(spark, path)
    // (m, sub) from the fingerprint-cached book rows (bookShape) — r11
    // ran a countDistinct/max aggregation JOB here on every call against
    // a table that froze at first build (VERDICT r11 task 8)
    val (m, sub) = bookShape(loadBookRows(spark, path)._1, path)
    val books = loadCodebooks(spark, path, m, sub)
    val codes = spark.read.parquet(codesPath(path))
      .withColumn("list_id",
        col("list_id").cast(cents.schema("list_id").dataType))
      .select(col("neighbor_id"), col("codes"), col("rnorm2"), col("list_id"))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // per-probe coarse term dot(q, c_L) via the ≤ nlist centroid rows —
    // the residual-ADC decomposition (AnnSearch.ivfPqTopK)
    val probes = AnnSearch.probeLists(q0, cents, nprobe,
      idTypeFallback = Some(codes.schema("list_id").dataType))
      .join(broadcast(cents), "list_id")
      .withColumn("__qcdot",
        graft.functions.VectorFunctions.dot(col("qv"), col("centv")))
      .drop("centv")
      .withColumn("__lut", AnnSearch.pqQueryLut(col("qv"), books, sub))
      .withColumn("__qn", graft.functions.VectorFunctions.norm(col("qv")))
    val cand = org.apache.spark.sql.functions.broadcast(probes)
      .join(codes, "list_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("qscore", AnnSearch.pqAdcCosineStored(col("__lut"),
        col("__qn"), col("__qcdot"), col("codes"), col("rnorm2"), books))
    val c = AnnSearch.ivfCorpus(corpus, idCol, vecCol)
    AnnSearch.exactRescore(
      AnnSearch.pqCandTop(cand, k * rescoreMult), c, q0, k)
  }

  // ------------------------------------------------- continuous maintenance

  /** Continuous index maintenance: fold every micro-batch of a STREAMING
    * document frame into the index at `path` through `refresh` — the
    * same exact batch refreshes above, driven by Structured Streaming's
    * `foreachBatch`. The refreshes' id anti-join is what makes this
    * safe under streaming semantics: foreachBatch is at-least-once (a
    * batch can replay after a failure between the append and the
    * checkpoint commit), and a replayed batch's doc ids are already
    * indexed, so the anti-join drops them and the replay appends ZERO
    * rows — at-least-once delivery, exactly-once index
    * (StreamingIndexSpec proves replay idempotence with a forced
    * re-run). The checkpoint lives under the index path so the two
    * travel together.
    *
    * This is the "weekly cron → continuous" upgrade of the reference's
    * batch cadence: the index is always as fresh as the last
    * micro-batch, and each batch costs ∝ its own new docs, never a
    * corpus recompute. */
  def streamingRefresh(docs: DataFrame, path: String)(
      refresh: DataFrame => Refresh)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        refresh(batch); ()
      }
      .option("checkpointLocation", s"$path/_checkpoint")
      .start()

  /** Visible (non-hidden) plain FILES directly under `dir` — the
    * pre-versioned flat sketch layout's data files; version subdirs
    * don't match (they are directories). */
  private def flatDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[org.apache.hadoop.fs.Path] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map(_.getPath)
  }

  /** KMV sketch maintenance: fold a batch of (group, key) rows into the
    * per-group sketch table at `path`/sketch — the streaming half of
    * [[graft.operators.Sketches.kmvDistinct]] (the k1 sketch). The fold
    * is union-truncate over the stored k-minima plus the batch's
    * distinct hashes — associative, commutative, DUPLICATE-INSENSITIVE
    * — so a replayed at-least-once micro-batch folds to the identical
    * sketch (idempotence needs no anti-join here: the sketch itself
    * absorbs duplicates), and the final table equals the from-scratch
    * batch sketch REGARDLESS of arrival order or chunking (the s7 gate
    * contract).
    *
    * Scale: the stored side is |groups|·k 12-char hashes, the batch
    * side its own distinct hashes — each fold shuffles O(groups·k +
    * batch-distinct) narrow rows, never historical raw keys (the whole
    * point of maintaining the sketch instead of the key set). The new
    * sketch is eagerly materialized (localCheckpoint) BEFORE the
    * commit, since the lazy plan reads the table being replaced.
    *
    * The commit uses the [[refreshCms]] stage-then-rename discipline
    * (versioned `v<n>` dirs under `path`/sketch, one atomic rename per
    * fold, superseded versions retired AFTER the rename): an in-place
    * overwrite would delete the directory before the job commits, so a
    * crash mid-write would lose the ONLY copy of the accumulated
    * k-minima (raw keys are never stored) and every later estimate
    * would be silently low. Unlike CMS the version number carries no
    * transaction meaning — the fold is duplicate-insensitive, so a
    * replay folding into an already-folded sketch is a no-op by
    * construction — it only orders the copies so readers take max. */
  def refreshKmv(batch: DataFrame, groupCol: String, keyCol: String,
      k: Int, path: String): Refresh = {
    val spark = batch.sparkSession
    val root = s"$path/sketch"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = versionsUnder(fs, root)
    // one-time migration from the pre-versioned layout (parquet files
    // directly under root): fold it in as the stored side WHEN no
    // version exists yet — silently ignoring it would restart the
    // sketch from the batch alone, the exact silent undercount this
    // commit protocol exists to prevent. Retirement below runs on
    // EVERY successful commit (not just the migrating one), so a crash
    // between a past rename and its retirement can't orphan stale flat
    // files forever.
    val flat = flatDataFiles(fs, root)
    val batchHashes = batch
      .where(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .select(col(groupCol).as("grp"),
        graft.operators.Sketches.kmvHash(col(keyCol)).as("hk"))
      .distinct()
    val stored =
      if (committed.nonEmpty)
        Some(spark.read.parquet(s"$root/v${committed.max}"))
      else if (flat.nonEmpty) Some(spark.read.parquet(root))
      else None
    val all = stored
      .map(_.select(col("grp"), explode(col("kmins")).as("hk")))
      .fold(batchHashes)(batchHashes.unionByName(_).distinct())
    val agg = udaf(new graft.operators.Sketches.KmvAgg(k))
    val next = graft.operators.Sketches.stampShape(
      all.groupBy("grp").agg(agg(col("hk")).as("kmins")),
      "kmins", graft.operators.Sketches.KmvKKey -> k.toLong)
      .localCheckpoint(true)
    val groups = next.count()
    // empty fold (first batch with no usable rows): committing an
    // empty v0 would leave a version dir spark.read can't infer a
    // schema from, wedging every later fold — skip, state is unchanged
    if (groups == 0) return Refresh(0, 0)
    val nv = if (committed.isEmpty) 0L else committed.max + 1
    val tmp = s"$root/_tmp_v$nv"
    next.write.mode("overwrite").parquet(tmp)
    // rename failures REPORT false rather than throw — proceeding to
    // the retirement below on a failed rename would delete the only
    // durable copies of the accumulated k-minima
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$root/v$nv")),
      s"KMV commit rename failed: $tmp -> $root/v$nv (old versions kept)")
    committed.foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/v$v"), true))
    flat.foreach(f => fs.delete(f, false))
    Refresh(groups, groups)
  }

  /** Bloom BIT-SET maintenance: fold a batch of keys into the stored
    * distinct-position table — the streaming half of
    * [[graft.operators.Sketches.bloomBuild]] (the k4 sketch). The fold
    * is UNION + DISTINCT over positions — associative, commutative,
    * DUPLICATE-INSENSITIVE (the [[refreshKmv]] merge algebra), so a
    * replayed at-least-once micro-batch folds to the identical bit set
    * and the final table equals the from-scratch batch build
    * regardless of arrival order or chunking (the s10 gate contract).
    * Commits by the same stage-then-rename versioned protocol as the
    * KMV sketch (crash-window rationale there); each fold shuffles
    * O(bits-set + batch-distinct-positions) narrow long rows, never
    * the historical key bag. */
  def refreshBloom(batch: DataFrame, keyCol: String, numHashes: Int,
      mBits: Int, path: String): Refresh = {
    val spark = batch.sparkSession
    val root = s"$path/bloom"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = versionsUnder(fs, root)
    val batchBits = graft.operators.Sketches
      .bloomBuild(batch, keyCol, numHashes, mBits)
    // re-stamp: the union/distinct against the stored side does not
    // reliably keep the builder's shape metadata
    val next = graft.operators.Sketches.stampShape(
      (if (committed.isEmpty) batchBits
        else batchBits
          .unionByName(spark.read.parquet(s"$root/v${committed.max}"))
          .distinct()),
      "pos", graft.operators.Sketches.BloomHashesKey -> numHashes.toLong,
      graft.operators.Sketches.BloomBitsKey -> mBits.toLong)
      .localCheckpoint(true)
    val bits = next.count()
    if (bits == 0) return Refresh(0, 0)
    val nv = if (committed.isEmpty) 0L else committed.max + 1
    val tmp = s"$root/_tmp_v$nv"
    next.write.mode("overwrite").parquet(tmp)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$root/v$nv")),
      s"Bloom commit rename failed: $tmp -> $root/v$nv (old versions kept)")
    committed.foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/v$v"), true))
    Refresh(bits, bits)
  }

  /** [[streamingRefresh]] pre-wired to [[refreshBloom]]. */
  def streamingRefreshBloom(rows: DataFrame, keyCol: String,
      numHashes: Int, mBits: Int, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingRefresh(rows, path)(
      refreshBloom(_, keyCol, numHashes, mBits, path))

  /** The maintained bit set: distinct `pos` rows — the highest
    * committed version under `path`/bloom. */
  def bloomIndex(spark: SparkSession, path: String): DataFrame = {
    val root = s"$path/bloom"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versionsUnder(fs, root)
    require(vs.nonEmpty, s"no committed Bloom bit set under $root")
    spark.read.parquet(s"$root/v${vs.max}")
  }

  /** HyperLogLog register maintenance under streaming arrival — the
    * s7 merge-idempotent discipline verbatim: the per-bucket MAX fold
    * is associative, commutative, and duplicate-insensitive, so an
    * at-least-once replay of any batch is a no-op by construction and
    * the maintained register table is row-identical to the
    * from-scratch batch build (the s12 gate contract — k5's oracle
    * applies verbatim). Commits by the stage-then-rename versioned
    * protocol (crash rationale at refreshKmv). Fold cost: the stored
    * side is ≤ groups·m register rows, the batch side its
    * map-combined partial maxima — O(sketch) per batch, never
    * O(events). */
  def refreshHll(batch: DataFrame, groupCols: Seq[String],
      keyCol: String, path: String): Refresh = {
    val spark = batch.sparkSession
    val root = s"$path/hll"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = versionsUnder(fs, root)
    val batchRegs = graft.operators.Sketches
      .hllBuild(batch, groupCols, keyCol)
    val next = (if (committed.isEmpty) batchRegs
      else batchRegs
        .unionByName(spark.read.parquet(s"$root/v${committed.max}"))
        .groupBy((groupCols :+ "bucket").map(col): _*)
        .agg(max(col("reg")).cast("int").as("reg")))
      .localCheckpoint(true)
    val n = next.count()
    if (n == 0) return Refresh(0, 0)
    val nv = if (committed.isEmpty) 0L else committed.max + 1
    val tmp = s"$root/_tmp_v$nv"
    next.write.mode("overwrite").parquet(tmp)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$root/v$nv")),
      s"HLL commit rename failed: $tmp -> $root/v$nv (old versions kept)")
    committed.foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/v$v"), true))
    Refresh(n, n)
  }

  /** [[streamingRefresh]] pre-wired to [[refreshHll]]. */
  def streamingRefreshHll(rows: DataFrame, groupCols: Seq[String],
      keyCol: String, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingRefresh(rows, path)(
      refreshHll(_, groupCols, keyCol, path))

  /** The maintained register table — the highest committed version
    * under `path`/hll. */
  def hllIndex(spark: SparkSession, path: String): DataFrame = {
    val root = s"$path/hll"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versionsUnder(fs, root)
    require(vs.nonEmpty, s"no committed HLL register table under $root")
    spark.read.parquet(s"$root/v${vs.max}")
  }

  /** Quantile-SAMPLE maintenance: fold a batch into the deterministic
    * hash sample behind [[graft.operators.Sketches.sampleQuantiles]]
    * (the k3 sketch). Membership is a pure per-row function of
    * (salt, id) — a batch contributes exactly its qualifying rows —
    * and the id anti-join makes an at-least-once REPLAY append zero
    * (the [[streamingRefresh]] discipline), so the stored sample is
    * row-identical to the batch gate over everything that arrived and
    * [[graft.operators.Sketches.rankSelect]] serves the identical
    * quantiles. Scale: each fold appends rate·|batch| narrow rows;
    * quantile serving sorts only the stored sample. */
  def refreshQuantileSample(batch: DataFrame, idCol: String,
      valCol: String, groupCols: Seq[String], salt: String, rate: Double,
      path: String): Refresh = {
    val spark = batch.sparkSession
    val samplePath = s"$path/sample"
    val sample = batch
      .where(col(valCol).isNotNull && col(idCol).isNotNull &&
        graft.operators.Splits.hashKey(col(idCol), salt) <
          lit(graft.operators.Splits.thresholdHex(rate)))
      .select(groupCols.map(col) ++ Seq(col(idCol).as("__id"),
        col(valCol).as("__v"),
        graft.operators.Splits.hashKey(col(idCol), salt).as("__hk")): _*)
    val newRows = readIfData(spark, samplePath)
      .fold(sample)(ix => sample.join(ix.select(col("__id")),
        Seq("__id"), "left_anti"))
      .localCheckpoint(true)
    newRows.write.mode("append").parquet(samplePath)
    val appended = newRows.count()
    Refresh(appended, appended)
  }

  /** [[streamingRefresh]] pre-wired to [[refreshQuantileSample]]. */
  def streamingRefreshQuantileSample(rows: DataFrame, idCol: String,
      valCol: String, groupCols: Seq[String], salt: String, rate: Double,
      path: String): org.apache.spark.sql.streaming.StreamingQuery =
    streamingRefresh(rows, path)(
      refreshQuantileSample(_, idCol, valCol, groupCols, salt, rate, path))

  /** Quantiles served from the stored sample — [[graft.operators
    * .Sketches.rankSelect]] over the maintained rows. */
  def quantilesFromSample(spark: SparkSession, path: String,
      groupCols: Seq[String], qs: Seq[Double]): DataFrame =
    graft.operators.Sketches.rankSelect(
      spark.read.parquet(s"$path/sample")
        .select(groupCols.map(col) :+ col("__v") :+ col("__hk"): _*),
      groupCols, qs)

  /** Count-Min sketch maintenance under streaming arrival — the THIRD
    * maintenance discipline, for ADDITIVE state: [[refreshKmv]]'s
    * union-truncate merge absorbs replays by construction,
    * [[refreshQuantileSample]]'s append dedupes on row ids — but CMS
    * counts can do neither (a replayed batch would double-count, and
    * the sketch keeps no ids to anti-join). Exactly-once here is the
    * standard foreachBatch TRANSACTIONAL guard: every fold writes the
    * micro-batch id it committed alongside the counters, and a replay
    * of batch ≤ the stored id is a no-op. foreachBatch delivers batch
    * ids monotonically, so one stored long is the whole transaction
    * log. Fold cost: the stored side is depth·width rows, the batch
    * side its map-side-combined partial counts — O(sketch) per batch,
    * never O(events). */
  /** The committed sketch versions under `path`: one `v<n>` directory
    * per committed fold (CMS: n = batch id; KMV: a plain sequence).
    * For CMS the directory NAME carries the batch id, so one atomic
    * rename commits the counters AND the transaction record together —
    * a separate marker file would leave a window where one is durable
    * without the other (double-count on replay, or a truncated marker
    * wedging every later batch). */
  private def versionsUnder(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") &&
        n.drop(1).forall(_.isDigit) => n.drop(1).toLong }
  }

  def refreshCms(batch: DataFrame, batchId: Long, keyCol: String,
      width: Int, depth: Int, path: String): Refresh = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = versionsUnder(fs, path)
    val last = if (committed.isEmpty) -1L else committed.max
    if (batchId <= last) return Refresh(0, last)
    val part = graft.operators.Sketches
      .cmsBuild(batch, keyCol, width, depth)
    // re-stamp the shape the merge aggregation drops, so the persisted
    // counters always carry it (the serve-time mismatch guard)
    val next = graft.operators.Sketches.stampShape(
      (if (last < 0) part
        else part.unionByName(spark.read.parquet(s"$path/v$last"))
          .groupBy("row", "bucket").agg(sum(col("cnt")).as("cnt"))),
      "cnt", graft.operators.Sketches.CmsWidthKey -> width.toLong,
      graft.operators.Sketches.CmsDepthKey -> depth.toLong)
      .localCheckpoint(true)
    // stage then RENAME: the rename is the commit point. A crash
    // before it leaves an orphan _tmp the replay overwrites; a crash
    // after it makes the replay a no-op (batchId <= last above).
    val tmp = s"$path/_tmp_v$batchId"
    next.write.mode("overwrite").parquet(tmp)
    // rename failures REPORT false rather than throw (e.g. destination
    // left by a duplicate writer) — proceeding to the retirement below
    // on a failed rename would delete the only committed counters
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$path/v$batchId")),
      s"CMS commit rename failed: $tmp -> $path/v$batchId (old versions kept)")
    // best-effort retirement of superseded versions (single-writer
    // foreachBatch; gate reads happen after the stream stops)
    committed.foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/v$v"), true))
    Refresh(batchId, batchId)
  }

  /** [[refreshCms]] driven by Structured Streaming (the batch id comes
    * from foreachBatch itself). */
  def streamingRefreshCms(rows: DataFrame, keyCol: String, width: Int,
      depth: Int, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        refreshCms(batch, id, keyCol, width, depth, path); ()
      }
      .option("checkpointLocation", s"$path/_checkpoint")
      .start()

  /** The maintained counter table: (row, bucket, cnt) — the highest
    * committed version. */
  def cmsIndex(spark: SparkSession, path: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versionsUnder(fs, path)
    require(vs.nonEmpty, s"no committed CMS version under $path")
    spark.read.parquet(s"$path/v${vs.max}")
  }

  // ------------------------------------- drift ledger (s15, additive)

  /** STREAMING maintenance of the drift (period, category, count)
    * ledger — [[graft.operators.Drift.tvDriftFromLedger]]'s substrate.
    * Counts are an ADDITIVE fold over the feed, exactly the CMS
    * counters' algebra: neither merge-idempotent (a replayed batch
    * would double-count) nor id-anti-join-able (there is no row
    * identity after aggregation), so the batch-id transactional
    * discipline applies verbatim — version per committed batch id,
    * stage-then-rename commit, replays of an already-committed id
    * fold to a no-op. NULL periods/categories drop here, mirroring
    * [[graft.operators.Drift.tvDrift]]'s filter, so ledger-served
    * reports equal scan-fed ones exactly.
    *
    * Scale: each refresh aggregates ONLY the arriving batch (map-side
    * combined) and merges with the stored ledger —
    * |periods|·|categories| rows, output-sized; the corpus is never
    * rescanned. */
  def refreshDriftLedger(batch: DataFrame, batchId: Long,
      periodCol: String, catCol: String, path: String): Refresh = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = versionsUnder(fs, path)
    val last = if (committed.isEmpty) -1L else committed.max
    if (batchId <= last) return Refresh(0, last)
    val part = batch
      .where(col(periodCol).isNotNull && col(catCol).isNotNull)
      .select(col(periodCol).as("period"), col(catCol).as("category"))
      .groupBy("period", "category").agg(count(lit(1)).as("cnt"))
    val next = (if (last < 0) part
      else part.unionByName(spark.read.parquet(s"$path/v$last"))
        .groupBy("period", "category").agg(sum(col("cnt")).as("cnt")))
      .localCheckpoint(true)
    val tmp = s"$path/_tmp_v$batchId"
    next.write.mode("overwrite").parquet(tmp)
    // rename failures REPORT false rather than throw — proceeding to
    // the retirement below on a failed rename would delete the only
    // committed ledger
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$path/v$batchId")),
      s"drift-ledger commit rename failed: $tmp -> $path/v$batchId " +
        "(old versions kept)")
    committed.foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/v$v"), true))
    Refresh(batchId, batchId)
  }

  /** [[refreshDriftLedger]] driven by Structured Streaming. */
  def streamingRefreshDriftLedger(rows: DataFrame, periodCol: String,
      catCol: String, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        refreshDriftLedger(batch, id, periodCol, catCol, path); ()
      }
      .option("checkpointLocation", s"$path/_checkpoint")
      .start()

  /** The maintained ledger: (period, category, cnt) — the highest
    * committed version. */
  def driftLedgerIndex(spark: SparkSession, path: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versionsUnder(fs, path)
    require(vs.nonEmpty, s"no committed drift ledger under $path")
    spark.read.parquet(s"$path/v${vs.max}")
  }

  // -------------------------------- gold MAX rollup (g3, semilattice)

  /** INCREMENTAL maintenance of a GROUP-BY-MAX gold table — the
    * reference's `nyc_salary_matches_unique_job_posting_title` CTAS
    * (/root/reference/sql/cleaned.sql:28-42) re-aggregates ALL of
    * bronze on every weekly run; at 100 TB the rollup must instead
    * fold only the new batch: aggregate the arriving rows to per-key
    * partial MAXes (map-side combined, batch-sized), merge with the
    * stored rollup (one row per key — OUTPUT-sized, the corpus is
    * never rescanned), and commit via stage-then-rename.
    *
    * Discipline: MAX over every carried column is a SEMILATTICE merge
    * (associative, commutative, idempotent), so unlike the additive
    * CMS/drift folds a REPLAYED batch cannot corrupt the rollup even
    * without the version guard — max(a, a) = a. The batch-id version
    * is kept anyway: it makes replays free (skip instead of re-merge)
    * and the rename the crash-safe commit point, same protocol as
    * [[refreshCms]]. NULL keys drop (a NULL group key is SQL's one
    * non-mergeable group; the gold CTAS's GROUP BY would keep it as
    * its own row, but bronze titles are NOT NULL by construction and
    * the gate's oracle confirms the equality).
    *
    * `maxCols` values must be max-comparable under Spark's ordering
    * (numerics, strings, dates) — the same requirement the CTAS's MAX
    * has. Read back with [[maxRollupIndex]]; the stored table IS the
    * gold table. */
  def refreshMaxRollup(batch: DataFrame, batchId: Long,
      keyCols: Seq[String], maxCols: Seq[String], path: String): Refresh = {
    require(keyCols.nonEmpty && maxCols.nonEmpty,
      "refreshMaxRollup needs at least one key and one max column")
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = versionsUnder(fs, path)
    val last = if (committed.isEmpty) -1L else committed.max
    if (batchId <= last) return Refresh(0, last)
    val aggs = maxCols.map(c => max(col(c)).as(c))
    val part = batch
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val next = (if (last < 0) part
      else part.unionByName(spark.read.parquet(s"$path/v$last"))
        .groupBy(keyCols.map(col): _*)
        .agg(aggs.head, aggs.tail: _*))
      .localCheckpoint(true)
    val tmp = s"$path/_tmp_v$batchId"
    next.write.mode("overwrite").parquet(tmp)
    // rename failures REPORT false rather than throw — proceeding to
    // the retirement below on a failed rename would delete the only
    // committed rollup
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$path/v$batchId")),
      s"gold-rollup commit rename failed: $tmp -> $path/v$batchId " +
        "(old versions kept)")
    committed.foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/v$v"), true))
    Refresh(batchId, batchId)
  }

  /** [[refreshMaxRollup]] driven by Structured Streaming. */
  def streamingRefreshMaxRollup(rows: DataFrame, keyCols: Seq[String],
      maxCols: Seq[String], path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        refreshMaxRollup(batch, id, keyCols, maxCols, path); ()
      }
      .option("checkpointLocation", s"$path/_checkpoint")
      .start()

  /** The maintained rollup (one row per key, current MAXes) — the
    * highest committed version. */
  def maxRollupIndex(spark: SparkSession, path: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versionsUnder(fs, path)
    require(vs.nonEmpty, s"no committed gold rollup under $path")
    spark.read.parquet(s"$path/v${vs.max}")
  }

  // --------------------- maintained connected components (d19, r18)

  /** INCREMENTAL maintenance of the d8 near-dup component map — the
    * transitive-closure face a CONTINUOUSLY-FED dedup pipeline needs:
    * d8 recomputes large-star/small-star over every pair ever emitted,
    * but component merge is MONOTONE (new edges only ever join
    * components; the root is the member minimum), so each batch folds
    * against the stored roots instead:
    *
    *  1. CONTRACT each arriving edge to its endpoints' stored roots
    *     (unseen nodes contract to themselves); edges whose endpoints
    *     already share a root drop as self-loops — a re-emitted
    *     duplicate pair costs one join probe, nothing else;
    *  2. run [[graft.operators.Components.connectedComponents]] on the
    *     CONTRACTED graph — batch-sized: one node per touched
    *     component or arriving doc, never the corpus;
    *  3. REMAP the stored roots through the (old root → new root)
    *     merge map (merged-components-sized — broadcast scale) and
    *     append the batch's new nodes.
    *
    * Exactness: the root is min(member ids) and min is associative —
    * min(roots ∪ new ids) = min(all members) — so the maintained map
    * equals the from-scratch closure over every pair ever folded
    * EXACTLY (d8's oracle applies verbatim to d19; SilverIndexSpec
    * fuzzes edge chunkings incl. cross-batch bridge merges).
    *
    * Commit discipline: the [[refreshMaxRollup]] family (versioned
    * batch-id + stage-then-rename; replays of a committed id no-op) —
    * and like MAX, the fold is a semilattice (duplicate edges are
    * absorbed by contraction), so replays are harmless by algebra too.
    * The per-fold write is the roots table — output-sized (one row per
    * ever-seen node), never the pair log; a deployment whose node
    * count outgrows a comfortable rewrite buckets the table by
    * pmod(component) and rewrites only buckets holding a remapped
    * root (the merge map names them).
    *
    * Erasure: component merge cannot be subtracted (the map does not
    * know whether an erased doc was the bridge) — the [[resetSketch]]
    * rebuild-from-clean contract applies: erase the base pairs, reset
    * this artifact, re-fold the clean log. */
  def refreshComponents(pairs: DataFrame, batchId: Long, aCol: String,
      bCol: String, path: String): Refresh = {
    val spark = pairs.sparkSession
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = versionsUnder(fs, path)
    val last = if (committed.isEmpty) -1L else committed.max
    if (batchId <= last) return Refresh(0, last)
    val e = pairs
      .select(col(aCol).as("__a"), col(bCol).as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull &&
        col("__a") =!= col("__b"))
    // an empty FIRST batch commits nothing (an empty roots version has
    // no parquet schema to read back); an empty later batch folds
    // through as identity below
    if (last < 0 && e.isEmpty) return Refresh(0, last)
    val next: DataFrame =
      if (last < 0)
        graft.operators.Components.connectedComponents(e, "__a", "__b")
      else {
        val stored = spark.read.parquet(s"$path/v$last")
        val contracted = e
          .join(stored.select(col("node").as("__a"),
            col("component").as("__ra")), Seq("__a"), "left")
          .join(stored.select(col("node").as("__b"),
            col("component").as("__rb")), Seq("__b"), "left")
          .select(coalesce(col("__ra"), col("__a")).as("__ca"),
            coalesce(col("__rb"), col("__b")).as("__cb"))
          .where(col("__ca") =!= col("__cb"))
        // merge map over the contracted graph: (old root | new node) →
        // new root. Feeds the remap join AND the new-node join.
        val m = graft.operators.Components
          .connectedComponents(contracted, "__ca", "__cb")
          .localCheckpoint(true)
        val remapped = stored
          .join(m.select(col("node").as("component"),
            col("component").as("__nr")), Seq("component"), "left")
          .select(col("node"),
            coalesce(col("__nr"), col("component")).as("component"))
        // every new node survives contraction (it contracts to itself
        // and cannot equal a stored root), so the merge map covers it
        val newRoots = e.select(col("__a").as("node"))
          .unionByName(e.select(col("__b").as("node")))
          .distinct()
          .join(stored.select(col("node")), Seq("node"), "left_anti")
          .join(m, Seq("node"))
        remapped.unionByName(newRoots)
      }
    val out = next.localCheckpoint(true)
    val tmp = s"$path/_tmp_v$batchId"
    out.write.mode("overwrite").parquet(tmp)
    require(fs.rename(new Path(tmp), new Path(s"$path/v$batchId")),
      s"components commit rename failed: $tmp -> $path/v$batchId " +
        "(old versions kept)")
    committed.foreach(v => fs.delete(new Path(s"$path/v$v"), true))
    Refresh(batchId, batchId)
  }

  /** The maintained component map (node → component root = min member
    * id) — the highest committed version. Nodes never named by a pair
    * are their own components and are not stored (the
    * [[graft.operators.Components.connectedComponents]] contract —
    * left-join + coalesce on the caller's side). */
  def componentsIndex(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versionsUnder(fs, path)
    require(vs.nonEmpty, s"no committed component map under $path")
    spark.read.parquet(s"$path/v${vs.max}")
  }

  /** [[refreshComponents]] driven by Structured Streaming — the
    * continuously-fed dedup-clustering face (near-dup pairs arrive
    * from [[streamingNearDupPairs]]-style emitters; each micro-batch
    * folds its edges at contracted-graph cost). */
  def streamingRefreshComponents(rows: DataFrame, aCol: String,
      bCol: String, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        refreshComponents(batch.toDF(), id, aCol, bCol, path); ()
      }
      .option("checkpointLocation", s"$path/_checkpoint")
      .start()

  // ------------------------------ maintained SCD2 history (g6, r17)

  /** INCREMENTAL maintenance of an SCD TYPE-2 history — the g4/g5
    * composite (VERDICT r16 task 4): g5 maintains the SNAPSHOT from a
    * change log, g4 rebuilds HISTORY from the full log every run; this
    * folds each change batch into a persisted history table instead
    * (close the open version, open the new one), so cost follows the
    * change log — the full log is never rescanned. Retires the
    * reference's weekly full-refetch chain
    * (/root/reference/src/cleaned_data.py:16-46) at the history layer.
    *
    * Discipline: SCD2 close is NOT a semilattice (closing a version is
    * neither idempotent against replays nor order-free), so BOTH s9
    * guards are load-bearing: the batch-id version makes a replayed
    * batch a no-op (and the stage-then-rename the crash-safe commit
    * point), and a strictly-increasing high-water mark on the change
    * timestamps makes the fold EXACT — a batch carrying a timestamp at
    * or below the stored mark raises, because an event older than an
    * already-collapsed state cannot be stitched without the full log
    * (rebuild for out-of-order feeds). Within those bounds the
    * maintained history equals [[graft.operators.Scd2.history]] over
    * the concatenated log EXACTLY — the batch-boundary stitch drops a
    * batch's first version when it repeats the stored current state
    * (the cross-batch collapse) and closes the stored current at the
    * first surviving batch version's effective_from; g4's oracle
    * applies VERBATIM (gate g6; Scd2IncrementalSpec fuzzes chunkings).
    *
    * Shuffles: one key-partitioned window over the BATCH (batch-sized),
    * one key join against the stored CURRENT segment (keys-sized), one
    * union — the [[refreshMaxRollup]] shape with a non-idempotent fold
    * guarded instead of assumed.
    *
    * Storage is the TWO-SEGMENT layout history needs at scale (unlike
    * a rollup, history grows monotonically, so a per-fold whole-table
    * rewrite would eventually pay for rows that can never change
    * again): every version a fold CLOSES appends to an immutable
    * `closed/batch=N` partition — written by idempotent per-batch
    * OVERWRITE, so a crashed fold's replay re-emits identically (the
    * s6 pairs-partition discipline) — while the keys-sized CURRENT
    * segment (one open version per key) is the only thing the
    * stage-then-rename version commit rewrites. Crash windows: closed
    * is written FIRST, so a crash before the current-segment rename
    * replays the whole fold against the untouched previous current
    * version and overwrites `closed/batch=N` with the identical rows;
    * a replay after the rename no-ops on the batch-id guard with the
    * closed partition already durable. */
  def refreshScd2(batch: DataFrame, batchId: Long, keyCol: String,
      attrCols: Seq[String], tsCol: String, path: String): Refresh = {
    require(attrCols.nonEmpty, "refreshScd2 needs at least one attribute")
    val spark = batch.sparkSession
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = versionsUnder(fs, path)
    val last = if (committed.isEmpty) -1L else committed.max
    if (batchId <= last) return Refresh(0, last)
    // an orphaned closed/batch=N with last < N != batchId is a CRASHED
    // fold whose current-segment commit never landed, arriving now
    // under a DIFFERENT id (ADVICE r17): folding over it would close
    // the same stored-current versions twice with conflicting
    // effective_to values (and silently lose the crashed batch's
    // rows once N <= the new committed version un-hides the orphan in
    // [[scd2Index]]). Replaying the SAME id is the recovery path — the
    // per-batch overwrite re-emits identically — so N == batchId
    // passes; anything else raises before touching state.
    val closedDir = new Path(s"$path/closed")
    if (fs.exists(closedDir)) {
      val orphans = fs.listStatus(closedDir).map(_.getPath.getName)
        .filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong)
        .filter(n => n > last && n != batchId)
      require(orphans.isEmpty,
        s"refreshScd2: orphaned closed partition(s) batch=" +
          s"${orphans.sorted.mkString(",")} from a crashed fold — " +
          s"replay that batch id (the overwrite re-emits identically) " +
          s"or remove the partition; folding batch $batchId over it " +
          "would close the same stored versions twice")
    }
    val valid = batch.where(col(keyCol).isNotNull && col(tsCol).isNotNull)
    // an empty FIRST batch commits nothing (an empty-history version
    // would have no parquet schema to read back); an empty later batch
    // folds through as identity below
    if (last < 0 && valid.isEmpty) return Refresh(0, last)
    // the batch history feeds BOTH segment writes (and, in the stitch,
    // the close-point aggregation too) — materialize it once instead
    // of re-running the batch window per consumer (it is
    // batch-transitions-sized by construction)
    val bh = graft.operators.Scd2
      .history(valid, keyCol, attrCols, tsCol).localCheckpoint(true)
    val attrs = struct(attrCols.map(col): _*)
    val (closedNew: DataFrame, currentNext: DataFrame) =
      if (last < 0)
        (bh.where(!col("is_current")), bh.where(col("is_current")))
      else {
        val stored = spark.read.parquet(s"$path/v$last/history")
        val hwm = spark.read.parquet(s"$path/v$last/hwm")
        // the exactness guard: one broadcast-nested-loop probe of the
        // batch against the single-row mark, first violation suffices
        val viol = valid.join(broadcast(hwm), col(tsCol) <= col("hwm"))
          .limit(1).count()
        require(viol == 0L,
          s"refreshScd2: batch $batchId carries timestamps at or below " +
            "the stored high-water mark — the incremental fold needs " +
            "strictly increasing batch boundaries; rebuild from the " +
            "full log for out-of-order arrivals")
        val firstW = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol))
          .orderBy(col("effective_from") +: attrCols.map(col): _*)
        // the stored CURRENT segment holds exactly the open versions
        val cur = stored.select(col(keyCol), attrs.as("__cs"))
        // drop a batch's FIRST version when it repeats the stored
        // current state — Scd2.history marks every key's first batch
        // row as a change (lag sees NULL), but across the boundary it
        // is only a transition if the state actually moved
        val kept = bh
          .withColumn("__rn", row_number().over(firstW))
          .join(cur, Seq(keyCol), "left")
          .where(col("__rn") =!= 1 || col("__cs").isNull ||
            !(attrs <=> col("__cs")))
          .drop("__rn", "__cs")
          // consumed three times (closed rows, current rows, the
          // close-point aggregation) across two write actions
          .localCheckpoint(true)
        val closeAt = kept.groupBy(col(keyCol))
          .agg(min(col("effective_from")).as("__close"))
        // stored current rows superseded this batch → closed segment;
        // the rest stay current untouched
        val storedClosed = stored.join(closeAt, Seq(keyCol))
          .withColumn("effective_to", col("__close"))
          .drop("__close")
          .withColumn("is_current", lit(false))
        val storedStillCurrent =
          stored.join(closeAt, Seq(keyCol), "left_anti")
        (storedClosed.unionByName(kept.where(!col("is_current"))),
          storedStillCurrent.unionByName(kept.where(col("is_current"))))
      }
    val batchMax = valid.agg(max(col(tsCol)).as("hwm"))
    val hwmNext =
      if (last < 0) batchMax
      else spark.read.parquet(s"$path/v$last/hwm")
        .unionByName(batchMax).agg(max(col("hwm")).as("hwm"))
    // closed partition FIRST (idempotent per-batch overwrite), then the
    // current segment's rename is the commit point
    closedNew.write.mode("overwrite").parquet(s"$path/closed/batch=$batchId")
    // the per-batch high-water manifest behind [[scd2AsOf]]'s partition
    // pruning: every row in closed/batch=N has effective_to <= hwm_N
    // (close points are batch-N effective_from values), so an as-of
    // probe at T skips every batch with hwm <= T without opening it.
    // Same idempotent-overwrite window as the closed partition; both
    // stay invisible until the commit rename below
    hwmNext.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/closedhwm/batch=$batchId")
    val tmp = s"$path/_tmp_v$batchId"
    currentNext.localCheckpoint(true)
      .write.mode("overwrite").parquet(s"$tmp/history")
    hwmNext.coalesce(1).write.mode("overwrite").parquet(s"$tmp/hwm")
    require(fs.rename(new Path(tmp), new Path(s"$path/v$batchId")),
      s"scd2 commit rename failed: $tmp -> $path/v$batchId " +
        "(old versions kept)")
    committed.foreach(v => fs.delete(new Path(s"$path/v$v"), true))
    Refresh(batchId, batchId)
  }

  /** [[refreshScd2]] driven by Structured Streaming. */
  def streamingRefreshScd2(rows: DataFrame, keyCol: String,
      attrCols: Seq[String], tsCol: String, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        refreshScd2(batch, id, keyCol, attrCols, tsCol, path); ()
      }
      .option("checkpointLocation", s"$path/_checkpoint")
      .start()

  /** The maintained history (one row per attribute version): the
    * immutable closed segments unioned with the highest committed
    * current segment. The `batch` partition column is bookkeeping, not
    * history — dropped on read. An orphaned `closed/batch=N` from a
    * fold that crashed before its current-segment commit is EXCLUDED
    * (N > the committed version): its rows would otherwise double with
    * the still-open versions the replay will close again. */
  def scd2Index(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versionsUnder(fs, path)
    require(vs.nonEmpty, s"no committed scd2 history under $path")
    val current = spark.read.parquet(s"$path/v${vs.max}/history")
    readIfData(spark, s"$path/closed")
      .map(_.where(col("batch") <= vs.max).drop("batch")
        .unionByName(current))
      .getOrElse(current)
  }

  /** POINT-IN-TIME serve from the maintained SCD2 history (g7,
    * VERDICT r17 task 4) — the audit question the index exists for
    * ("state of key K at time T") answered WITHOUT the g4
    * reconstruction's full-log scan: versions alive at `asOf` are
    * `effective_from <= T < effective_to` (open versions: effective_to
    * null), and the two-segment layout prunes almost everything —
    *  - the CURRENT segment is keys-sized (one open version per key);
    *  - closed segments prune by the per-batch high-water manifest:
    *    every row in closed/batch=N has effective_to <= hwm_N, so any
    *    batch with hwm_N <= T is entirely dead at T and its partition
    *    is never opened (a PartitionFilter on `batch`, PLANS.md pin —
    *    at 100 TB an audit at a recent T reads the recent batches +
    *    the current segment, not years of closed history).
    * Orphaned partitions (crashed folds) are excluded exactly as in
    * [[scd2Index]]; a legacy index without manifests serves every
    * committed closed partition (row filters still apply — correct,
    * just unpruned). Equals the g4 rebuild filtered to T row-for-row
    * (g7's oracle). */
  def scd2AsOf(spark: SparkSession, path: String,
      asOf: Column): DataFrame = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versionsUnder(fs, path)
    require(vs.nonEmpty, s"no committed scd2 history under $path")
    val t = asOf
    val current = spark.read.parquet(s"$path/v${vs.max}/history")
      .where(col("effective_from") <= t &&
        (col("effective_to").isNull || col("effective_to") > t))
    readIfData(spark, s"$path/closed").fold(current) { cl =>
      // driver-side dead-batch set from the tiny manifest (one row per
      // fold): committed batches whose hwm <= T hold only versions
      // already dead at T
      val dead: Seq[Long] = readIfData(spark, s"$path/closedhwm")
        .fold(Seq.empty[Long]) { m =>
          m.where(col("batch") <= vs.max && col("hwm") <= t)
            .select(col("batch").cast("long")).collect()
            .map(_.getLong(0)).toSeq
        }
      val pruned =
        if (dead.isEmpty) cl.where(col("batch") <= vs.max)
        else cl.where(col("batch") <= vs.max &&
          !col("batch").isin(dead: _*))
      pruned.drop("batch")
        .where(col("effective_from") <= t && col("effective_to") > t)
        .unionByName(current)
    }
  }

  /** [[streamingRefresh]] pre-wired to [[refreshKmv]]. */
  def streamingRefreshKmv(rows: DataFrame, groupCol: String,
      keyCol: String, k: Int, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingRefresh(rows, path)(refreshKmv(_, groupCol, keyCol, k, path))

  /** The sketch table as stored: (grp, kmins) — the highest committed
    * version under `path`/sketch (or the pre-versioned flat layout if
    * no version has been committed yet — see [[refreshKmv]]'s
    * migration note). */
  def kmvIndex(spark: SparkSession, path: String): DataFrame = {
    val root = s"$path/sketch"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = versionsUnder(fs, root)
    if (vs.nonEmpty) spark.read.parquet(s"$root/v${vs.max}")
    else {
      require(flatDataFiles(fs, root).nonEmpty,
        s"no committed KMV sketch under $root")
      spark.read.parquet(root)
    }
  }

  /** [[streamingRefresh]] pre-wired to [[refreshPostings]]. */
  def streamingRefreshPostings(docs: DataFrame, idCol: String,
      textCol: String, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingRefresh(docs, path)(refreshPostings(_, idCol, textCol, path))

  /** [[streamingRefresh]] pre-wired to [[refreshMinhash]]. */
  def streamingRefreshMinhash(docs: DataFrame, idCol: String,
      textCol: String, n: Int, numHashes: Int, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingRefresh(docs, path)(
      refreshMinhash(_, idCol, textCol, n, numHashes, path))

  /** Streaming NEAR-DUP detection: every micro-batch (1) appends its
    * genuinely-new docs' signatures to the table at `sigPath` (the
    * [[refreshMinhash]] anti-join discipline), then (2) emits the
    * near-dup pairs INVOLVING those new docs against the full
    * post-append signature table
    * ([[graft.operators.Dedup.minhashPairsDelta]]) into `pairsPath`.
    * Each pair lands exactly once — in the batch where its later-
    * arriving member arrives — so the accumulated pairs table is
    * row-identical to a from-scratch batch [[graft.operators
    * .Dedup.minhashLshPairs]] over the same corpus (the s6 gate
    * contract), and a REPLAYED batch (foreachBatch is at-least-once)
    * finds zero new ids, appends zero signatures, and emits zero pairs
    * — the same exactly-once-by-anti-join argument as
    * [[streamingRefresh]], extended to the derived pair stream. The
    * new-id frame is eagerly materialized BEFORE the signature append
    * (localCheckpoint), since the append changes what the lazy
    * anti-join would read. */
  def streamingNearDupPairs(docs: DataFrame, idCol: String,
      textCol: String, n: Int, numHashes: Int, rowsPerBand: Int,
      theta: Double, sigPath: String, pairsPath: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        nearDupBatch(batch.toDF(), batchId, idCol, textCol, n,
          numHashes, rowsPerBand, theta, sigPath, pairsPath)
      }
      .option("checkpointLocation", s"$sigPath/_checkpoint")
      .start()

  /** One micro-batch of [[streamingNearDupPairs]] — the foreachBatch
    * body, factored out so a spec can drive the RECOVERY path directly
    * over a hand-built half-committed directory (crash after the
    * intent commit, crash after the signature append, partial intent
    * write) instead of only observing the happy path end-to-end. */
  private[pipeline] def nearDupBatch(batch: DataFrame, batchId: Long,
      idCol: String, textCol: String, n: Int, numHashes: Int,
      rowsPerBand: Int, theta: Double, sigPath: String,
      pairsPath: String): Unit = {
        val spark = batch.sparkSession
        // TRANSACTION INTENT: the batch's new-id set, persisted before
        // any table mutates. The two mutations below (signature append,
        // pair write) are not atomic together — a crash between them
        // would otherwise lose the batch's pairs forever, because a
        // replay's anti-join against the ALREADY-APPENDED signatures
        // finds nothing new. The stored intent makes the replay reuse
        // the original new-id set instead of re-deriving it against
        // mutated state. One tiny file per batch, kept (deleting it
        // would reopen the same window).
        val intentDir = s"$sigPath/_intent/batch$batchId"
        // guard on COMMITTED data files, not bare existence: the dir
        // exists as soon as a write STARTS — fs.exists would send the
        // replay down the read branch into a failing (or empty) read
        // over leftover debris. hasDataFiles skips hidden subtrees.
        // The intent itself commits by STAGE-THEN-RENAME (one file via
        // coalesce(1), staged under _tmp_, one atomic dir rename): a
        // direct multi-file write commits part files one rename at a
        // time, so a crash MID-job-commit could leave a readable but
        // INCOMPLETE id set — the replay would then silently drop the
        // missing ids' signatures and pairs forever. The dir rename
        // makes the intent all-or-nothing; any pre-rename crash leaves
        // no committed data files and the replay re-derives (nothing
        // has mutated before the intent commit).
        val newIds = intentNewIds(spark, sigPath, batchId,
          batch.select(col(idCol).as("doc")).distinct())
        // the batch is pre-filtered to the intent so refreshMinhash's
        // interior anti-join (kept: it is the append's own replay
        // guard) runs on the already-new side only
        refreshMinhash(
          batch.join(newIds.withColumnRenamed("doc", idCol), Seq(idCol),
            "left_semi"),
          idCol, textCol, n, numHashes, sigPath)
        // per-batch partition + OVERWRITE = idempotent pair emission:
        // the replay recomputes the identical pairs (same stored
        // intent, same post-append signature table) into the same
        // partition — a plain append would duplicate them
        graft.operators.Dedup
          .minhashPairsDelta(minhashIndex(spark, sigPath), newIds,
            rowsPerBand, theta)
          .write.mode("overwrite").parquet(s"$pairsPath/batch=$batchId")
        ()
  }

  /** The TRANSACTION-INTENT read-or-derive step factored out of
    * [[nearDupBatch]] (semantics unchanged — the crash rationale lives
    * in the comments there): return the batch's NEW id set, reading
    * the persisted intent when one committed, deriving and committing
    * it (stage-then-rename, single file) otherwise. Shared by the
    * minhash (s6) and frame-fingerprint (m9) incremental pair
    * emitters. `ids` must be the batch's distinct ids as a `doc`
    * column. */
  private def intentNewIds(spark: SparkSession, sigPath: String,
      batchId: Long, ids: DataFrame): DataFrame = {
    val intentDir = s"$sigPath/_intent/batch$batchId"
    if (hasDataFiles(spark, intentDir)) spark.read.parquet(intentDir)
    else {
      val fresh = readIfData(spark, sigPath)
        .fold(ids)(ix =>
          ids.join(ix.select("doc"), Seq("doc"), "left_anti"))
        .localCheckpoint(true)
      val fs = new org.apache.hadoop.fs.Path(sigPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = s"$sigPath/_intent/_tmp_batch$batchId"
      fresh.coalesce(1).write.mode("overwrite").parquet(tmp)
      val dst = new org.apache.hadoop.fs.Path(intentDir)
      if (fs.exists(dst)) fs.delete(dst, true) // pre-fix debris
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
        s"intent commit rename failed: $tmp -> $intentDir")
      fresh
    }
  }

  /** [[streamingRefresh]] pre-wired to [[refreshIvf]] (first batch
    * trains and freezes the quantizer, later batches assign-and-append
    * — the standard IVF append discipline under streaming arrival). */
  def streamingRefreshIvf(docs: DataFrame, idCol: String, vecCol: String,
      nlist: Int, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingRefresh(docs, path)(refreshIvf(_, idCol, vecCol, nlist, path))

  /** [[streamingRefresh]] pre-wired to [[refreshIvfPq]] (first non-empty
    * batch trains BOTH frozen quantizers — coarse centroids and residual
    * codebooks — later batches residual-encode only unseen ids and
    * append, the same discipline at 40 bits + a stored norm per
    * vector). */
  def streamingRefreshIvfPq(docs: DataFrame, idCol: String, vecCol: String,
      nlist: Int, m: Int, ksub: Int, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    streamingRefresh(docs, path)(
      refreshIvfPq(_, idCol, vecCol, nlist, m, ksub, path))

  // ------------------------------------------------------------- erasure

  /** What an erasure fold did: rows removed / rows remaining. */
  final case class Erased(removed: Long, remaining: Long)

  /** Rewrite the table at `dirStr` through `transform` (an erasure
    * anti-join) with the [[compactListTable]] staged-swap commit: the
    * survivors land in a staging dir, then two renames swap them live —
    * a crash leaves either the old or the new table, never a
    * half-deleted one, and a RERUN restores the surviving copy before
    * deleting anything. Both row counts ride Observations on the ONE
    * rewrite job (no separate count jobs); the row-count sidecar is
    * refreshed so post-erasure refreshes stay metadata-only.
    *
    * Scale shape: one scan + one broadcast anti-join + one write —
    * the erasure rewrite is a compaction with a filter, so it batches
    * (collect a compliance window's subjects, fold once) exactly like
    * the weekly refresh. With a doc-bucketed layout only buckets
    * holding subjects need rewriting; this fold rewrites the table
    * wholesale, the correct default for the list-partitioned and flat
    * artifacts here (subject docs scatter across every list/file). */
  private def rewriteSwap(spark: SparkSession, dirStr: String,
      partitionCols: Seq[String],
      shape: DataFrame => DataFrame = identity)(
      transform: DataFrame => DataFrame): Erased = {
    val live = new Path(dirStr)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(dirStr + "__compacting")
    val retired = new Path(dirStr + "__retired")
    // crash recovery BEFORE any delete — the compactListTable
    // discipline (rationale there): prefer the known-good retired
    // copy, else a staging dir (valid only when the live table is
    // gone, i.e. the first rename committed)
    if (!fs.exists(live)) {
      val src = if (fs.exists(retired)) retired
        else if (fs.exists(staging)) staging
        else throw new IllegalStateException(
          s"erase: no table at $live and nothing to recover")
      require(fs.rename(src, live),
        s"erase: could not restore $src to $live")
    }
    fs.delete(staging, true); fs.delete(retired, true)
    val obsB = org.apache.spark.sql.Observation()
    val obsK = org.apache.spark.sql.Observation()
    val src = spark.read.parquet(dirStr)
      .observe(obsB, count(lit(1)).as("n"))
    val out = shape(transform(src).observe(obsK, count(lit(1)).as("n")))
    val w = out.write
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .parquet(staging.toString)
    require(fs.rename(live, retired), s"erase: could not retire $live")
    require(fs.rename(staging, live),
      s"erase: could not activate $staging — old table at $retired")
    fs.delete(retired, true)
    val before = obsB.get("n").asInstanceOf[Long]
    val kept = obsK.get("n").asInstanceOf[Long]
    writeMetaRows(fs, dirStr, kept)
    Erased(before - kept, kept)
  }

  private def eraseKeyed(spark: SparkSession, dirStr: String,
      keyCol: String, subjects: DataFrame, subjectCol: String,
      partitionCols: Seq[String] = Nil,
      shape: DataFrame => DataFrame = identity): Erased = {
    val subj = broadcast(
      subjects.select(col(subjectCol).as("__s")).distinct())
    rewriteSwap(spark, dirStr, partitionCols, shape)(df =>
      df.join(subj, df(keyCol) === col("__s"), "left_anti"))
  }

  /** Right-to-ERASURE for the postings index — the delete path the
    * append-only [[refreshPostings]] lacks (GDPR asks "and the
    * indexes?", not just the base tables: an erased subject's tokens
    * otherwise sit in the postings forever). Drops every posting AND
    * doc-length row whose doc is a subject, then rewrites the stats
    * sidecar from the surviving doc lengths, so served BM25 scores
    * (N, avgLen, df) immediately reflect the smaller corpus — exactly
    * what a from-scratch build over the erased base would serve.
    * Postings rewrite first: a crash before the doclen rewrite leaves
    * the meta fingerprint stale and [[ensureBm25Aux]] rebuilds the
    * companion from the already-erased postings — the recovery path
    * that keeps the pair consistent under any interleaving. */
  def erasePostings(spark: SparkSession, path: String,
      subjects: DataFrame, subjectCol: String): Erased = {
    // a legacy index (postings copied in, companion never built) has no
    // doclen dir for the rewrite below to swap — materialize it first;
    // idempotent and metadata-cheap when the sidecar is already fresh
    ensureBm25Aux(spark, path)
    val r = eraseKeyed(spark, path, "doc", subjects, subjectCol,
      shape = _.sortWithinPartitions(col("term")))
    eraseKeyed(spark, doclenPath(path), "doc", subjects, subjectCol)
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    // readIfData: a FULL-corpus erasure leaves a dir with no data files
    // (empty writes emit no part files), which schema inference rejects
    val st = readIfData(spark, doclenPath(path)).fold(Bm25Stats(0L, 0L)) {
      dl =>
        val row = dl.agg(count(lit(1)), coalesce(sum(col("len")), lit(0L)))
          .head()
        Bm25Stats(row.getLong(0), row.getLong(1))
    }
    writeBm25Meta(fs, path, st)
    r
  }

  /** Erasure for the MinHash signature table: the subject's signature
    * rows drop, so [[minhashPairs]] over the index can never emit a
    * pair naming an erased doc again. */
  def eraseMinhash(spark: SparkSession, path: String,
      subjects: DataFrame, subjectCol: String): Erased =
    eraseKeyed(spark, path, "doc", subjects, subjectCol)

  /** Erasure for the frame-fingerprint table (m9): the subject's frame
    * rows drop, so [[framePairs]] can never pair an erased doc
    * again — the same doc-keyed staged-swap anti-join as
    * [[eraseMinhash]]. */
  def eraseFingerprints(spark: SparkSession, path: String,
      subjects: DataFrame, subjectCol: String): Erased =
    eraseKeyed(spark, path, "doc", subjects, subjectCol)

  /** Erasure for the edit-pair variant-key table (d18): the subject's
    * variant rows drop, so [[editPairsFromIndex]] can never emit a
    * pair naming an erased key again — the same doc-keyed staged-swap
    * anti-join as [[eraseMinhash]]. */
  def eraseEditIndex(spark: SparkSession, path: String,
      subjects: DataFrame, subjectCol: String): Erased =
    eraseKeyed(spark, path, "doc", subjects, subjectCol)

  /** Erasure for the IVF assignment table (the frozen quantizer keeps
    * only aggregate centroids — nothing per-subject survives there,
    * the standard DP/GDPR aggregate carve-out; document it in the
    * release): subject vectors leave every probe's candidate lists. */
  def eraseIvf(spark: SparkSession, path: String,
      subjects: DataFrame, subjectCol: String): Erased =
    eraseKeyed(spark, asgPath(path), "neighbor_id", subjects, subjectCol,
      partitionCols = Seq("list_id"),
      shape = _.repartition(col("list_id")))

  /** Erasure for the IVF-PQ code table — as [[eraseIvf]] (the frozen
    * codebooks, like the centroids, hold only k-means aggregates).
    * [[ivfPqTopKFromIndex]]'s exact-rescore side reads the BASE corpus
    * the caller passes — erase that table first
    * ([[graft.operators.Privacy.erase]], step 1 of the protocol) and
    * the rescore is clean by construction. */
  def eraseIvfPq(spark: SparkSession, path: String,
      subjects: DataFrame, subjectCol: String): Erased =
    eraseKeyed(spark, codesPath(path), "neighbor_id", subjects,
      subjectCol, partitionCols = Seq("list_id"),
      shape = _.repartition(col("list_id")))

  /** REBUILD-FROM-CLEAN contract for the insert-only sketches. The
    * maintained KMV minima, Bloom positions, and HLL registers are
    * MONOTONE folds (truncated union / set union / per-bucket max) and
    * CMS counters are additive without per-key attribution — none can
    * subtract a subject's contribution, mathematically: the sketch does
    * not know whether an erased key was the one that set a register.
    * Erasure for these artifacts is therefore: (1) erase the BASE
    * table ([[graft.operators.Privacy.erase]]), (2) `resetSketch` the
    * maintained state (this call — one recursive delete of the sketch
    * home, including its streaming checkpoint so a re-fold starts a
    * fresh transaction log), (3) re-fold the CLEAN corpus through the
    * same refresh. The rebuilt sketch is bit-identical to one that
    * never saw the subject (every fold here is deterministic in its
    * input set), which is a STRONGER guarantee than any subtraction
    * could give. Cost is one corpus pass per compliance window —
    * batch the window's subjects, reset once. */
  def resetSketch(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    ()
  }

  // ----------------------------------------------------- compaction / stats

  /** Index-health report for an IVF assignment table: list/row/file
    * fragmentation and list-size imbalance. `filesPerList` grows by one
    * per delta refresh per touched list (appends never rewrite), so a
    * long-lived streaming index fragments; `imbalance` (max list rows /
    * mean list rows) drifts as the frozen quantizer ages away from the
    * data distribution. `rebuildRecommended` flags imbalance past
    * `imbalanceThreshold` — the FAISS-style re-train decision, surfaced
    * as a measurement instead of folklore. */
  final case class IvfStats(lists: Long, rows: Long, files: Long,
      maxListRows: Long, meanListRows: Double, imbalance: Double,
      filesPerList: Double, rebuildRecommended: Boolean)

  def ivfStats(spark: SparkSession, path: String,
      imbalanceThreshold: Double = 4.0): IvfStats =
    listTableStats(spark, asgPath(path), imbalanceThreshold)

  /** [[ivfStats]] for the IVF-PQ code table — same layout contract
    * (`list_id`-partitioned appends), same fragmentation/imbalance
    * failure modes. */
  def ivfPqStats(spark: SparkSession, path: String,
      imbalanceThreshold: Double = 4.0): IvfStats =
    listTableStats(spark, codesPath(path), imbalanceThreshold)

  private def listTableStats(spark: SparkSession, dir: String,
      imbalanceThreshold: Double): IvfStats = {
    val byList = spark.read.parquet(dir)
      .groupBy(col("list_id")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("lists"), sum(col("n")).as("rows"),
        max(col("n")).as("maxN"))
      .head()
    val (lists, rows, maxN) =
      (byList.getLong(0), Option(byList.get(1)).fold(0L)(_ => byList.getLong(1)),
        Option(byList.get(2)).fold(0L)(_ => byList.getLong(2)))
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files = dataStats(fs, p)._1
    val mean = if (lists == 0) 0.0 else rows.toDouble / lists
    val imb = if (mean == 0.0) 0.0 else maxN / mean
    IvfStats(lists, rows, files, maxN, mean, imb,
      if (lists == 0) 0.0 else files.toDouble / lists,
      rebuildRecommended = imb > imbalanceThreshold)
  }

  /** Rewrite the IVF assignment table into one sized file per list,
    * undoing append fragmentation (every delta refresh adds a file per
    * touched list — a weekly-refreshed index accumulates refreshes ×
    * nlist objects). Same rows, same layout contract
    * (`list_id`-partitioned), one narrow shuffle; the rewrite lands in
    * a staging dir and swaps in with two renames so a crash leaves
    * either the old or the new table, never a half-deleted one — and a
    * RERUN after a crash between the renames restores the surviving
    * copy before deleting anything (SilverIndexSpec pins the recovery).
    *
    * What compaction buys is the METADATA path: listing/open cost per
    * probe and per refresh (the before/after counts and the anti-join
    * list every file, every run — and object stores bill and throttle
    * per request). A compute-bound probe's wall time is unchanged:
    * tools/compaction_smoke_r7.txt measures 640 → 64 files with
    * identical probe results and parity wall at 1M vectors, where 125M
    * cosine evals dwarf local file opens. Compact on `filesPerList`,
    * not on probe latency. */
  /** What a maintenance sweep decided and did. `stats` is the pre-sweep
    * measurement the decisions were made on. */
  final case class Maintenance(stats: IvfStats, compacted: Boolean,
      rebuilt: Boolean)

  /** The index-lifecycle decisions as ONE cron-able measured sweep — the
    * last manual step ([[IvfStats.rebuildRecommended]], compact-on-
    * fragmentation) turned into code, in the priority order that
    * matters:
    *
    *  1. imbalance past `imbalanceThreshold` → REBUILD: the frozen
    *     quantizer has drifted from the data distribution, so compacting
    *     its lists would just defragment a bad layout. The index dirs
    *     drop and [[refreshIvf]] re-trains from the CURRENT corpus (the
    *     FAISS re-train decision, now fired by the measurement that
    *     motivates it); the per-path quantizer cache misses by
    *     fingerprint construction.
    *  2. fragmentation past `filesPerListThreshold` → [[compactIvf]]
    *     (crash-safe staged swap; sidecar re-derived from the rewrite).
    *  3. healthy → measure only.
    *
    * Wire it to a [[Scheduler]]/[[Cron]] cadence for the reference's
    * weekly rhythm; each sweep costs one stats aggregation unless it
    * acts. */
  def maintainIvf(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, path: String, imbalanceThreshold: Double = 4.0,
      filesPerListThreshold: Double = 10.0): Maintenance = {
    val spark = corpus.sparkSession
    val stats = ivfStats(spark, path, imbalanceThreshold)
    if (stats.rebuildRecommended) {
      val fs = new Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(asgPath(path)), true)
      fs.delete(new Path(centPath(path)), true)
      refreshIvf(corpus, idCol, vecCol, nlist, path)
      Maintenance(stats, compacted = false, rebuilt = true)
    } else if (stats.filesPerList > filesPerListThreshold) {
      compactIvf(spark, path)
      Maintenance(stats, compacted = true, rebuilt = false)
    } else Maintenance(stats, compacted = false, rebuilt = false)
  }

  def compactIvf(spark: SparkSession, path: String): Unit =
    compactListTable(spark, asgPath(path))

  /** [[compactIvf]] for the IVF-PQ code table. */
  def compactIvfPq(spark: SparkSession, path: String): Unit =
    compactListTable(spark, codesPath(path))

  private def compactListTable(spark: SparkSession, dirStr: String): Unit = {
    val live = new Path(dirStr)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new Path(dirStr + "__compacting")
    val retired = new Path(dirStr + "__retired")
    // crash recovery BEFORE any delete: a prior run that died between its
    // two renames leaves the live path empty with the only surviving
    // copies at __retired (the old table) and possibly __compacting (the
    // completed rewrite — same rows). Deleting those while the live dir
    // is missing would be permanent data loss; restore one of them first.
    // Preference: __retired (the known-good pre-compaction table; the
    // rerun below re-compacts it anyway), else a staging dir — which is
    // only a valid recovery source when the live table is GONE, i.e. the
    // first rename committed, which implies the staging write completed.
    if (!fs.exists(live)) {
      val src = if (fs.exists(retired)) retired
        else if (fs.exists(staging)) staging
        else throw new IllegalStateException(
          s"compact: no table at $live and nothing to recover")
      require(fs.rename(src, live), s"compact: could not restore $src to $live")
    }
    fs.delete(staging, true); fs.delete(retired, true)
    val obs = org.apache.spark.sql.Observation()
    spark.read.parquet(dirStr)
      .observe(obs, count(lit(1)).as("n"))
      .withColumn("list_id", col("list_id")) // partition col back into data
      .repartition(col("list_id"))
      .write.partitionBy("list_id").parquet(staging.toString)
    require(fs.rename(live, retired), s"compact: could not retire $live")
    require(fs.rename(staging, live),
      s"compact: could not activate $staging — old table at $retired")
    fs.delete(retired, true)
    // the rewrite job counted the rows for free — refresh the sidecar so
    // post-compaction refreshes stay metadata-only
    writeMetaRows(fs, dirStr, obs.get("n").asInstanceOf[Long])
  }

  /** [[maintainIvf]] for the IVF-PQ index: rebuild on measured drift
    * drops BOTH frozen quantizers (coarse centroids and residual
    * codebooks) with the code table and retrains from the current
    * corpus; fragmentation compacts the code table in place. */
  def maintainIvfPq(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, m: Int, ksub: Int, path: String,
      imbalanceThreshold: Double = 4.0,
      filesPerListThreshold: Double = 10.0): Maintenance = {
    val spark = corpus.sparkSession
    val stats = ivfPqStats(spark, path, imbalanceThreshold)
    if (stats.rebuildRecommended) {
      val fs = new Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new Path(codesPath(path)), true)
      fs.delete(new Path(bookPath(path)), true)
      fs.delete(new Path(centPath(path)), true)
      refreshIvfPq(corpus, idCol, vecCol, nlist, m, ksub, path)
      Maintenance(stats, compacted = false, rebuilt = true)
    } else if (stats.filesPerList > filesPerListThreshold) {
      compactIvfPq(spark, path)
      Maintenance(stats, compacted = true, rebuilt = false)
    } else Maintenance(stats, compacted = false, rebuilt = false)
  }
}
