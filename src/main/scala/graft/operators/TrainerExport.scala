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
    val sharded = withShard(packs, packsPerShard)
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

  /** Write the packs as one parquet directory per shard
    * (`outDir/shard_id=N/`, each shard one pack_id-sorted file) plus the
    * manifest at `outDir/_graft_manifest` — certifying what was HANDED
    * to the writer; [[readBackManifest]] recomputes the same digest from
    * disk so a spec (or an operator) can prove write fidelity. Returns
    * the manifest. One repartition on the shard key: every shard writes
    * in parallel, no driver-side data movement. */
  def writeShards(packs: DataFrame, packsPerShard: Int,
      outDir: String): DataFrame = {
    withShard(packs, packsPerShard)
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("pack_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(outDir)
    val manifest = shardManifest(packs, packsPerShard)
    manifest.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/_graft_manifest")
    manifest
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
