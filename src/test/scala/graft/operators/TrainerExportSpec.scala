package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TrainerExportSpec extends SparkTestBase {

  private def packs() = {
    val s = spark
    import s.implicits._
    // 10 docs of 30-130 tokens, budget 256 → a handful of packs
    val docs = (0L until 10L).map { i =>
      val n = 30 + (i * 11 % 101).toInt
      (i, Seq.fill(n)(s"w${i}t").mkString(" "), n.toLong)
    }.toDF("doc_id", "text", "n_tokens")
    Packing.assemblePacks(docs, "doc_id", "n_tokens", "text", budget = 256L)
  }

  test("shard assignment is contiguous, dense, and count-exact") {
    val p = packs()
    val nPacks = p.count()
    val manifest = TrainerExport.shardManifest(p, packsPerShard = 2)
      .collect().sortBy(_.getLong(0))
    assert(manifest.length == ((nPacks + 1) / 2).toInt,
      s"expected ceil($nPacks/2) shards, got ${manifest.length}")
    manifest.foreach { r =>
      val (shard, nP, lo, hi) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      // dense range: the shard holds EXACTLY the pack ids in [lo, hi]
      assert(hi - lo + 1 == nP, s"shard $shard range not dense: $r")
      assert(lo == shard * 2 && hi <= shard * 2 + 1,
        s"shard $shard holds foreign packs: $r")
    }
    // totals conserve the input
    assert(manifest.map(_.getLong(4)).sum == 10L, "n_docs must conserve")
    val totalTokens = p.agg(sum("n_tokens")).head.getLong(0)
    assert(manifest.map(_.getLong(5)).sum == totalTokens)
  }

  test("manifest digests certify content: any pack-text change flips the hash") {
    val p = packs().cache()
    val base = TrainerExport.shardManifest(p, 2)
      .select("shard_id", "content_hash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tampered = p.withColumn("pack_text",
      when(col("pack_id") === 1L, concat(col("pack_text"), lit(" x")))
        .otherwise(col("pack_text")))
    val after = TrainerExport.shardManifest(tampered, 2)
      .select("shard_id", "content_hash").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after(0L) != base(0L), "shard 0 (packs 0-1) must change")
    assert(after.keySet.filter(_ != 0L).forall(k => after(k) == base(k)),
      "other shards must not change")
    p.unpersist()
  }

  private def withTempDir[T](f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-export")
    try f(dir.toString)
    finally { // ADVICE r11: don't leak a parquet artifact per test run
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("writeShards round-trips: layout, containment, and manifest fidelity") {
    withTempDir { dir =>
    val p = packs()
    val written = TrainerExport.writeShards(p, packsPerShard = 2, dir)
      .collect().map(r => r.getLong(0) -> r).toMap

    // one shard_id=N directory per manifest row, nothing else visible
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
      .map(_.getName.stripPrefix("shard_id=").toLong).toSet
    assert(shardDirs == written.keySet, s"dirs $shardDirs vs ${written.keySet}")

    // each shard directory contains exactly its manifest's pack range
    shardDirs.foreach { sid =>
      val ids = spark.read.parquet(s"$dir/shard_id=$sid")
        .select("pack_id").collect().map(_.getLong(0)).sorted
      val m = written(sid)
      assert(ids.head == m.getLong(2) && ids.last == m.getLong(3) &&
        ids.length == m.getLong(1).toInt,
        s"shard $sid content ${ids.toSeq} disagrees with manifest $m")
    }

    // the recomputed-from-disk manifest is row-identical (content_hash
    // included) to the one written alongside
    val back = TrainerExport.readBackManifest(spark, dir, 2)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(back == written.map { case (k, v) => k -> v.toSeq },
      "read-back manifest diverged from the written artifact")
    val stored = spark.read.parquet(s"$dir/_graft_manifest")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(stored == back, "stored manifest diverged")
    }
  }

  test("readShardRange addresses exactly the manifest's pack ranges") {
    withTempDir { dir =>
      val p = packs()
      val manifest = TrainerExport.writeShards(p, packsPerShard = 2, dir)
        .collect().map(r => r.getLong(0) -> r).toMap
      val lastShard = manifest.keySet.max
      // every contiguous shard range [i, j): the read yields precisely
      // the packs with pack_id in [i*2, j*2) that exist — the two
      // integers ARE the address (TrainerExport contiguity contract)
      val allPacks = p.select("pack_id").collect().map(_.getLong(0)).toSet
      for (i <- 0L to lastShard; j <- (i + 1) to (lastShard + 1)) {
        val got = TrainerExport.readShardRange(spark, dir, i, j)
          .select("pack_id").collect().map(_.getLong(0)).toSet
        val expected = allPacks.filter(id => id >= i * 2 && id < j * 2)
        assert(got == expected,
          s"shards [$i,$j): got $got, expected $expected")
      }
      // the address is served by PARTITION pruning, not a full scan
      val plan = TrainerExport.readShardRange(spark, dir, 1, 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [") &&
        !plan.contains("PartitionFilters: []"),
        s"shard range must prune on the partition column:\n$plan")
    }
  }

  test("shardManifestWithCard: manifest columns unchanged, lang_mix exact") {
    val s = spark
    import s.implicits._
    // 9 docs across 3 languages with known token counts; budget 100 →
    // hand-computable pack and shard assignment in doc_id order
    val n = Seq(40L, 50L, 30L, 70L, 20L, 60L, 45L, 35L, 55L)
    val langs = Seq("en", "es", "en", "de", "en", "es", "de", "en", "es")
    val docs = n.indices.map { i =>
      (i.toLong, langs(i), Seq.fill(n(i).toInt)(s"w$i").mkString(" "), n(i))
    }.toDF("doc_id", "lang", "text", "n_tokens")

    val card = TrainerExport.shardManifestWithCard(docs, "doc_id",
      "n_tokens", "text", "lang", packBudget = 100L, packsPerShard = 2)
      .collect().map(r => r.getLong(0) -> r).toMap

    // the manifest half is IDENTICAL to the plain shardManifest over the
    // equivalently assembled packs (the card adds a column, changes none)
    val plain = TrainerExport.shardManifest(
      Packing.assemblePacks(docs, "doc_id", "n_tokens", "text", 100L),
      packsPerShard = 2)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(card.keySet == plain.keySet)
    card.foreach { case (sid, r) =>
      assert(r.toSeq.init == plain(sid),
        s"shard $sid manifest columns drifted: ${r.toSeq} vs ${plain(sid)}")
    }

    // lang_mix replayed in plain Scala: cum-before packing in doc_id
    // order, shard = pack/2, per-shard langs sorted, lang:docs:tokens
    val cum = n.scanLeft(0L)(_ + _).init
    val shard = cum.map(c => (c / 100L) / 2L)
    val expected = shard.indices.groupBy(shard(_)).map { case (sid, idx) =>
      sid -> idx.groupBy(langs(_)).toSeq.sortBy(_._1)
        .map { case (l, ids) => s"$l:${ids.size}:${ids.map(n(_)).sum}" }
        .mkString(",")
    }
    expected.foreach { case (sid, mix) =>
      assert(card(sid).getString(card(sid).length - 1) == mix,
        s"shard $sid lang_mix: got ${card(sid)}, expected $mix")
    }
  }

  test("appending packs never reassigns existing shards") {
    val s = spark
    import s.implicits._
    val p1 = (0L until 6L).map(i => (i, s"pack $i body", 10L + i))
      .toDF("pack_id", "pack_text", "n_tokens")
      .withColumn("n_docs", lit(1L))
    val p2 = (0L until 9L).map(i => (i, s"pack $i body", 10L + i))
      .toDF("pack_id", "pack_text", "n_tokens")
      .withColumn("n_docs", lit(1L))
    def m(df: org.apache.spark.sql.DataFrame) =
      TrainerExport.shardManifest(df, 3).collect()
        .map(r => r.getLong(0) -> r.toSeq).toMap
    val (m1, m2) = (m(p1), m(p2))
    // shards 0..1 existed before the append and are byte-identical
    assert(m1.keySet == Set(0L, 1L) && m2.keySet == Set(0L, 1L, 2L))
    assert(m1.forall { case (k, v) => m2(k) == v },
      "append must be monotone: existing shards unchanged")
  }

  test("epochReadManifest: every pack addressed once, dense per-shard") {
    val p = packs()
    val nPacks = p.count()
    val plan = TrainerExport.epochReadManifest(p, packsPerShard = 2,
        salt = "er-spec", epoch = 0, readShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3)))
    assert(plan.length == nPacks.toInt &&
      plan.map(_._1).distinct.length == nPacks.toInt)
    // file_shard is the withShard assignment
    plan.foreach { case (pid, fs, _, _) => assert(fs == pid / 2) }
    // positions dense 1..count within each read shard
    plan.groupBy(_._3).foreach { case (rs, rows) =>
      assert(rs >= 0 && rs < 4)
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq,
        s"read shard $rs positions not dense")
    }
  }

  test("epochReadManifest: epochs re-permute, data layout untouched") {
    val p = packs()
    def run(epoch: Int) = TrainerExport.epochReadManifest(p, 2,
        "er-spec", epoch, readShards = 8)
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3))))
      .toMap
    val (e0, e1) = (run(0), run(1))
    assert(e0.keySet == e1.keySet) // same packs, same files
    assert(e0 != e1, "epoch change must re-permute the read order")
  }
}
