package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Sharded trainer export — the last mile after [[Packing.assemblePacks]]:
  * a training job does not mount one giant table, it mounts FIXED-COUNT
  * shards (so the data loader can assign shard ranges to workers) plus a
  * MANIFEST that lets it verify and address them without scanning
  * (reference behavior generalized: the NYC platform publishes its GOLD
  * tables as standalone parquet artifacts per consumer view,
  * /root/reference/sql/cleaned.sql; a pretraining consumer needs the
  * same artifact discipline over packed examples).
  *
  * Shard assignment is a pure function of the pack id —
  * `shard_id = ⌊pack_id / packsPerShard⌋` — so it is deterministic,
  * contiguous (each shard holds a dense pack-id range, which is what
  * makes range addressing work), reproducible across reruns and engines
  * (the [[Splits]] portability discipline), and monotone: appending
  * packs only ever ADDS shards, never reassigns existing ones.
  *
  * The manifest is the artifact's certificate, one row per shard:
  * pack range (`pack_id_min`/`pack_id_max`), `n_packs`, member totals
  * (`n_docs`, `n_tokens`), per-pack token extremes and exact median
  * (the [[graft.queries.CurationQueries c7 data-card]] battery threaded
  * over shards — [[Quantiles.exactQuantiles]], so the median is exact
  * at any shard size without buffering a shard in memory), and
  * `content_hash` — md5 over the pack_id-ordered concatenation of the
  * member packs' md5s, an engine-portable digest (md5 agrees
  * everywhere, the [[Splits.hashKey]] argument) that certifies shard
  * CONTENT, not just counts.
  *
  * Scale shape: one groupBy on the (tiny, dense) shard key after
  * whatever built the packs; the per-shard pack-digest list is bounded
  * by `packsPerShard` — a caller-chosen constant — so the collect_list
  * inside the hash never exceeds `packsPerShard` 32-char strings. The
  * write path partitions by shard and writes every shard in parallel;
  * the driver never sees pack text.
  */
object TrainerExport {

  /** Shard assignment column: input ++ `shard_id`. */
  def withShard(packs: DataFrame, packsPerShard: Int): DataFrame = {
    require(packsPerShard > 0,
      s"packsPerShard must be positive, got $packsPerShard")
    require(!packs.columns.contains("shard_id"),
      "input already has a shard_id column — drop or rename it first")
    packs.withColumn("shard_id",
      floor(col("pack_id") / packsPerShard).cast("long"))
  }

  /** One manifest row per shard over an assembled-pack frame
    * ([[Packing.assemblePacks]] schema: pack_id, n_docs, n_tokens,
    * pack_text). Deterministic integers and hex digests end-to-end →
    * exact oracle. */
  def shardManifest(packs: DataFrame, packsPerShard: Int): DataFrame = {
    // persist barrier (r12): the manifest reads the sharded frame in two
    // branches (the per-shard aggregate and the exact-median quantiles),
    // and on a LIVE lineage each branch would re-run everything upstream
    // of the packs — for the gate composites that was the whole
    // tokenize/pack chain re-evaluated per branch (17 source scans in
    // c16's un-barriered plan). ManagedCache lifecycle: deterministic
    // lineage (pack_id is a total order), LRU-released per call site.
    // The at-scale path doesn't rely on this: writeShards manifests FROM
    // the written artifact, one scan by construction.
    val sharded = graft.ManagedCache.swap("TrainerExport.shardManifest",
      withShard(packs, packsPerShard))
    val base = sharded.groupBy(col("shard_id")).agg(
      count(lit(1)).as("n_packs"),
      min(col("pack_id")).as("pack_id_min"),
      max(col("pack_id")).as("pack_id_max"),
      sum(col("n_docs")).cast("long").as("n_docs"),
      sum(col("n_tokens")).cast("long").as("n_tokens"),
      min(col("n_tokens")).as("min_pack_tokens"),
      max(col("n_tokens")).as("max_pack_tokens"),
      md5(array_join(transform(
        array_sort(collect_list(struct(col("pack_id"),
          md5(col("pack_text").cast("binary")).as("h")))),
        s => s.getField("h")), "").cast("binary")).as("content_hash"))
    val med = Quantiles
      .exactQuantiles(sharded.select(col("shard_id"), col("n_tokens")),
        Seq("shard_id"), "n_tokens", Seq(0.5))
      .select(col("shard_id"), col("q").as("p50_pack_tokens"))
    base.join(med, Seq("shard_id"))
      .select(col("shard_id"), col("n_packs"), col("pack_id_min"),
        col("pack_id_max"), col("n_docs"), col("n_tokens"),
        col("min_pack_tokens"), col("max_pack_tokens"),
        col("p50_pack_tokens"), col("content_hash"))
  }

  /** [[shardManifest]] extended with the per-shard LANGUAGE data card —
    * the [[graft.queries.CurationQueries c7]] battery threaded over the
    * artifact a trainer mounts: each manifest row gains `lang_mix`, a
    * deterministic `lang:n_docs:n_tokens` list sorted by language
    * (strings and integers only → exact oracle, the c15 discipline).
    * Takes the MEMBER frame (pre-assembly: one row per document with
    * `langCol` still attached — pack text no longer knows its members'
    * languages), assigns packs ONCE ([[Packing.packByTokenBudget]]),
    * and reuses the assignment for both the assembled manifest and the
    * language roll-up. Two aggregations over the same tiny shard key;
    * the lang roll-up groups on (shard, lang) first so the ordered
    * collect is bounded by the language-alphabet size, never by shard
    * membership. */
  def shardManifestWithCard(members: DataFrame, orderCol: String,
      tokensCol: String, textCol: String, langCol: String,
      packBudget: Long, packsPerShard: Int): DataFrame = {
    // persist barrier on the per-member assignment (r12): the manifest
    // half and the language roll-up both consume it, and the upstream
    // members lineage (BPE counting, budget sampling in c16's shape) is
    // exactly what must not re-run per consumer
    val assigned = graft.ManagedCache.swap("TrainerExport.withCard",
      Packing.packByTokenBudget(members, Seq(orderCol), tokensCol,
        packBudget))
    val packs = Packing.assembleAssigned(assigned, orderCol, tokensCol,
      textCol)
    val manifest = shardManifest(packs, packsPerShard)
    val mix = assigned
      .withColumn("shard_id",
        floor(col("pack_id") / packsPerShard).cast("long"))
      .groupBy(col("shard_id"), col(langCol))
      .agg(count(lit(1)).as("__n"),
        sum(col(tokensCol)).cast("long").as("__tk"))
      .groupBy(col("shard_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(langCol), col("__n"),
          col("__tk")))),
        s => concat_ws(":", s.getField(langCol), s.getField("__n"),
          s.getField("__tk"))), ",").as("lang_mix"))
    manifest.join(mix, Seq("shard_id"))
  }

  /** Write the packs as one parquet directory per shard
    * (`outDir/shard_id=N/`, each shard one pack_id-sorted file) plus the
    * manifest at `outDir/_graft_manifest`. The manifest is computed FROM
    * THE WRITTEN ARTIFACT (the [[readBackManifest]] pass), not from a
    * second evaluation of the live `packs` plan — so a nondeterministic
    * or concurrently-changing input lineage can never store a manifest
    * that fails to describe the files on disk, and the packs lineage is
    * evaluated exactly once (the write). Returns the stored manifest
    * read back from disk for the same reason. One repartition on the
    * shard key: every shard writes in parallel, no driver-side data
    * movement; the certifying pass is one extra scan of the artifact. */
  def writeShards(packs: DataFrame, packsPerShard: Int,
      outDir: String): DataFrame = {
    val spark = packs.sparkSession
    withShard(packs, packsPerShard)
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("pack_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(outDir)
    readBackManifest(spark, outDir, packsPerShard)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/_graft_manifest")
    spark.read.parquet(s"$outDir/_graft_manifest")
  }

  /** Data-loader shard addressing: read shards `[fromShard, untilShard)`
    * of a [[writeShards]] artifact. Because shard assignment is
    * `⌊pack_id / packsPerShard⌋` over dense pack ids, the contract is
    * exact: the result holds precisely the packs with
    * `pack_id ∈ [fromShard·packsPerShard, untilShard·packsPerShard)`
    * that exist — a worker can claim a shard range and know its pack
    * range without consulting anything but the two integers
    * (TrainerExportSpec pins this as an executable contract). The
    * filter is on the PARTITION column, so the scan prunes to the
    * addressed directories — no foreign shard is listed or read. */
  def readShardRange(spark: org.apache.spark.sql.SparkSession,
      outDir: String, fromShard: Long, untilShard: Long): DataFrame = {
    require(fromShard >= 0 && untilShard > fromShard,
      s"need 0 <= fromShard < untilShard, got [$fromShard, $untilShard)")
    spark.read.parquet(outDir)
      .where(col("shard_id") >= fromShard && col("shard_id") < untilShard)
  }

  /** Per-EPOCH read plan over the immutable shard files — how a loader
    * consumes the exported artifact shuffled differently every epoch
    * WITHOUT rewriting a byte of it. Each pack gets its epoch-e address
    * from [[Splits.epochShuffle]] (read_shard, pos — a pure function of
    * (salt, epoch, pack_id)), alongside the FILE shard that physically
    * holds it (the [[withShard]] assignment): a loader streams
    * read_shards 0..n−1 in pos order and fetches each pack from its
    * file_shard partition (the [[readShardRange]] pruned read). The
    * plan is manifest-sized (|packs| rows, one hash partition + an
    * in-shard rank), replays bit-for-bit on any engine, and a new epoch
    * is a new salt fold — same cost, zero state, zero data movement.
    * `packs` must carry `pack_id`. */
  def epochReadManifest(packs: DataFrame, packsPerShard: Int,
      salt: String, epoch: Int, readShards: Int): DataFrame = {
    require(packsPerShard >= 1, s"packsPerShard must be >= 1: $packsPerShard")
    val base = packs.select(col("pack_id"),
      floor(col("pack_id") / packsPerShard).cast("long").as("file_shard"))
    Splits.epochShuffle(base, "pack_id", salt, epoch, readShards)
      .select(col("pack_id"), col("file_shard"),
        col("shard").as("read_shard"), col("pos"))
  }

  /** Recompute the manifest from a [[writeShards]] directory (shard_id
    * comes back as the partition column). Row-identical to the manifest
    * written alongside iff the artifact on disk is intact. */
  def readBackManifest(spark: org.apache.spark.sql.SparkSession,
      outDir: String, packsPerShard: Int): DataFrame =
    shardManifest(
      spark.read.parquet(outDir)
        .select(col("pack_id"), col("n_docs"), col("n_tokens"),
          col("pack_text")),
      packsPerShard)
}
