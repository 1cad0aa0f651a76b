package graft.operators

import graft.SparkTestBase
import graft.queries.Tables.t
import org.apache.spark.sql.functions._

class AnnSpec extends SparkTestBase {

  private def emb = t(spark, sf(), "embeddings")
  private def queries = emb.where(col("vec_id") % 100 === 0)

  test("brute-force top-k is ranked, bounded, self-excluding") {
    val out = AnnSearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect()
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 5)
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to 5))
      // descending cosine with rank
      assert(sorted.sliding(2).forall { case Array(a, b) =>
        a.getDouble(2) >= b.getDouble(2) })
      assert(rows.forall(_.getLong(1) != q))
      assert(rows.forall(r => r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0))
    }
  }

  test("LSH top-k has useful recall vs brute force and correct local ranking") {
    val bf = AnnSearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = AnnSearch.lshTopK(queries, emb, "vec_id", "embedding", 5,
      bits = 8, tables = 8, probeHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    info(s"ANN LSH recall@5 = $recall")
    assert(recall > 0.2, s"recall $recall too low to be useful")
  }

  test("IVF top-k has useful recall vs brute force and bounded output") {
    val bf = AnnSearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = AnnSearch.ivfTopK(queries, emb, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 6).collect()
    ivf.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length <= 5)
      assert(rows.forall(_.getLong(1) != q))
    }
    val pairs = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect pairs).size.toDouble / bf.size
    info(s"ANN IVF recall@5 = $recall (nprobe 6/16 lists)")
    assert(recall > 0.25, s"recall $recall too low to be useful")
  }

  test("SQ8 quantized top-k: near-exact recall, exact-cosine output") {
    val bf = AnnSearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect()
    val bfPairs = bf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = AnnSearch.quantizedTopK(queries, emb, "vec_id", "embedding", 5,
      levels = 127, rescoreMult = 4).collect()
    sq.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length == 5)
      assert(rows.forall(_.getLong(1) != q))
      assert(rows.sortBy(_.getInt(3)).map(_.getInt(3)).toSeq == (1 to 5))
    }
    // int8 codes at 127 levels keep ≫ the top-5 inside the top-20
    // candidate set on 64-dim embeddings — recall should be near-exact
    val sqPairs = sq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bfPairs intersect sqPairs).size.toDouble / bfPairs.size
    info(s"SQ8 recall@5 = $recall (rescore top-20)")
    assert(recall >= 0.9, s"recall $recall — quantized candidate set broke")
    // where the pair agrees with brute force, the rescored cosine is the
    // EXACT float cosine, bit-identical (rescore reads original vectors)
    val bfCos = bf.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    sq.foreach { r =>
      bfCos.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(c == r.getDouble(2), "rescore must be the exact cosine")
      }
    }
  }

  test("cosine near-dup pairs ordered and thresholded") {
    val out = AnnSearch.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("LSH near-dup pairs are a high-recall subset of the exact pairs") {
    val exact = AnnSearch.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // p(collide/table) = (1 - θ/π)^bits ≈ 0.16 at cosine 0.4 with 4 bits
    // → recall over 16 tables ≈ 1-(1-.16)^16 ≈ 0.94
    val lsh = AnnSearch.lshNearDupPairs(emb, "vec_id", "embedding", 0.4,
      bits = 4, tables = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    if (exact.nonEmpty) {
      val recall = (exact intersect lsh).size.toDouble / exact.size
      info(s"LSH near-dup recall = $recall over ${exact.size} exact pairs")
      assert(recall >= 0.6, s"recall $recall")
    }
  }

  test("PQ top-k: useful recall vs brute force, exact-cosine output, deterministic") {
    val exact = AnnSearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqDf = AnnSearch.pqTopK(queries, emb, "vec_id", "embedding",
      k = 5, m = 8, ksub = 32, rescoreMult = 10)
    val pq = pqDf.collect()
    // per-query bound + local rank ordering
    pq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
        .sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
    // rescored cosines are the EXACT cosines (same pair → same value as
    // brute force)
    val exactCos = AnnSearch.bruteForceTopK(queries, emb, "vec_id",
        "embedding", k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactCos.get(key).foreach(c => assert(c == r.getDouble(2), s"$key"))
    }
    val got = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    info(s"PQ recall@5 = $recall")
    assert(recall >= 0.5, s"PQ recall $recall")
    // deterministic under corpus repartitioning
    val again = AnnSearch.pqTopK(queries, emb.repartition(7), "vec_id",
        "embedding", k = 5, m = 8, ksub = 32, rescoreMult = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(again == pq.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet)
  }

  test("residual ADC decomposition equals naive cosine(q, centroid + reconstruction)") {
    // independent reimplementation of the r8 scoring math: for every
    // (probe, candidate) pair, the plan's qscore — dot(q, c_L) +
    // Σⱼ lut[codeⱼ] over ‖q‖·√(stored rnorm2) — must equal a from-first-
    // principles cosine of the query against centv + concat(codebook
    // entries), allowing only FP-regrouping noise (the decomposition
    // sums per-subspace partials; the naive form is one left-to-right
    // pass)
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val c = AnnSearch.ivfCorpus(emb, "vec_id", "embedding")
    val sub = AnnSearch.pqSubDim(c, 8)
    val cents = AnnSearch.ivfCentroids(c, nlist = 8)
    val assigned = AnnSearch.ivfAssign(c, cents)
    val train = assigned.join(broadcast(cents), "list_id")
      .select(col("neighbor_id"), col("list_id"), col("centv"),
        graft.functions.VectorFunctions.sub(col("cv"), col("centv")).as("cv"))
    val cms = AnnSearch.pqCodebooks(train.select("neighbor_id", "cv"),
      8, 16, sub)
    val coded = train
      .withColumn("codes", AnnSearch.pqEncode(col("cv"), cms, sub))
      .select(col("neighbor_id"), col("list_id"), col("centv"), col("codes"),
        AnnSearch.pqReconNorm2(col("centv"), col("codes"), cms, sub)
          .as("rnorm2"))
    val q0 = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    val probes = AnnSearch.probeLists(q0, cents, nprobe = 3)
      .join(broadcast(cents), "list_id")
      .withColumn("__qcdot",
        graft.functions.VectorFunctions.dot(col("qv"), col("centv")))
      .drop("centv")
      .withColumn("__lut", AnnSearch.pqQueryLut(col("qv"), cms, sub))
      .withColumn("__qn", graft.functions.VectorFunctions.norm(col("qv")))
    val scored = broadcast(probes).join(coded, "list_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("qscore", AnnSearch.pqAdcCosineStored(col("__lut"),
        col("__qn"), col("__qcdot"), col("codes"), col("rnorm2"), cms))
      .select(col("query_id"), col("qv"), col("centv"), col("codes"),
        col("qscore"))
      .collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      val qv = r.getAs[scala.collection.Seq[Float]]("qv").map(_.toDouble)
      val centv = r.getAs[scala.collection.Seq[Float]]("centv").map(_.toDouble)
      val codes = r.getAs[scala.collection.Seq[Int]]("codes")
      // naive reconstruction: centroid + per-subspace codebook entries
      val recon = centv.toArray
      codes.zipWithIndex.foreach { case (code, j) =>
        val entry = cms(j).mats(code)
        (0 until sub).foreach(i => recon(j * sub + i) += entry(i))
      }
      val dot = qv.zip(recon).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
      val qn = math.sqrt(qv.foldLeft(0.0)((a, x) => a + x * x))
      val rn = math.sqrt(recon.foldLeft(0.0)((a, x) => a + x * x))
      val naive = if (qn == 0 || rn == 0) 0.0 else dot / (qn * rn)
      val got = r.getDouble(4)
      assert(math.abs(got - naive) <= 1e-9 * math.max(1.0, math.abs(naive)),
        s"ADC decomposition diverged from naive reconstruction: " +
          s"$got vs $naive (query ${r.getLong(0)})")
    }
  }

  test("IVF-PQ top-k: candidates respect IVF pruning, exact-cosine output, useful recall") {
    val exact = AnnSearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = AnnSearch.ivfPqTopK(queries, emb, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6, m = 8, ksub = 32, rescoreMult = 40)
      .collect()
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length <= 5)
      assert(rows.forall(_.getLong(1) != q))
    }
    // every emitted neighbor sits inside the query's probed lists: the
    // same-parameter IVF-FLAT run at corpus-size k enumerates the FULL
    // probed membership, so a10's pairs must be a subset — a violation
    // means the PQ leg leaked candidates past the coarse quantizer
    val probedAll = AnnSearch.ivfTopK(queries, emb, "vec_id", "embedding",
      k = Int.MaxValue, nlist = 16, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(probedAll), s"leaked: ${got -- probedAll}")
    // rescored cosines are the exact float cosines
    val exactCos = AnnSearch.bruteForceTopK(queries, emb, "vec_id",
        "embedding", k = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactCos.get(key).foreach(c => assert(c == r.getDouble(2), s"$key"))
    }
    val recall = (exact intersect got).size.toDouble / exact.size
    info(s"IVF-PQ recall@5 = $recall (nprobe 6/16, m=8, ksub=32, mult=40)")
    // r9 retune (tools/pqtune_r9.txt): the deeper exact rescore (10→40)
    // lifts this corpus to its coarse-pruning ceiling — measures 0.72
    // here (r8 floor was 0.6 at mult=10); deterministic quantizers, so
    // the number cannot drift without a code change
    assert(recall >= 0.7, s"IVF-PQ recall $recall")
    // residual codes must not rank WORSE than the r7 raw codes at the
    // same 40-bit budget (the entire point of encoding residuals).
    // Compared at mult=10 — the regime where CODE quality decides the
    // outcome; at mult=40 this tiny corpus's rescore pool covers nearly
    // every candidate and both encodings hit the pruning ceiling
    // (residual 0.68 vs raw 0.64 at r8 — tools/residual_probe_r8.txt)
    def recallAtMult10(residual: Boolean): Double = {
      val g = AnnSearch.ivfPqTopK(queries, emb, "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 6, m = 8, ksub = 32, rescoreMult = 10,
          residual = residual)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect g).size.toDouble / exact.size
    }
    val residRecall = recallAtMult10(residual = true)
    val rawRecall = recallAtMult10(residual = false)
    info(s"IVF-PQ mult=10 recall@5: residual=$residRecall raw=$rawRecall")
    assert(residRecall >= rawRecall,
      s"residual recall $residRecall fell below raw-code recall $rawRecall")
    // EXACT pins, deliberately: at mult=40 the gate-scale rescore pool
    // covers nearly every pruned candidate, so a10's golden hash equals
    // a3's ivf-flat hash and no longer discriminates the PQ CODE stage
    // — these mult=10 values are where code quality decides the
    // outcome, and the quantizers are deterministic, so any drift in
    // codebook training / encode / ADC moves them. Regenerate alongside
    // an INTENDED quantizer change, like a golden.
    assert(residRecall == 0.68, s"residual mult=10 recall drifted: $residRecall")
    assert(rawRecall == 0.64, s"raw-code mult=10 recall drifted: $rawRecall")
    // deterministic under corpus repartitioning
    val again = AnnSearch.ivfPqTopK(queries, emb.repartition(7), "vec_id",
        "embedding", k = 5, nlist = 16, nprobe = 6, m = 8, ksub = 32,
        rescoreMult = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet)
  }

  test("SemDeDup pairs are within-cluster exact pairs; survivors drop the max id") {
    val exact = AnnSearch.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = AnnSearch.clusterNearDupPairs(emb, "vec_id", "embedding",
        theta = 0.45, nlist = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(exact), s"false positives: ${pairs -- exact}")

    val survivors = AnnSearch.semanticDedup(emb, "vec_id", "embedding",
        theta = 0.45, nlist = 16)
      .collect().map(_.getLong(0)).toSet
    val dropped = pairs.map(_._2)
    val all = emb.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(survivors == all -- dropped)
  }

  test("SemDeDup recovers planted semantic dups that share a cluster") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(5)
    // 200 base vectors; ids 1000+ are near-copies (tiny perturbation,
    // cosine ≈ 1) of ids 0..19 — SemDeDup must drop every planted copy
    // (a copy lands in its original's cluster: their centroid distances
    // are nearly identical)
    val base = (0 until 200).map { i =>
      i.toLong -> Array.fill(16)(rng.nextGaussian())
    }
    val planted = (0 until 20).map { i =>
      (1000L + i) -> base(i)._2.map(_ * 1.001 + 1e-4)
    }
    val df = (base ++ planted).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val survivors = AnnSearch.semanticDedup(df, "vec_id", "embedding",
        theta = 0.99, nlist = 8)
      .collect().map(_.getLong(0)).toSet
    (0 until 20).foreach { i =>
      assert(!survivors.contains(1000L + i), s"planted dup $i survived")
      assert(survivors.contains(i.toLong), s"original $i was dropped")
    }
    assert(survivors.size == 200)
  }

  test("knnJoinIvf == ivfTopK(corpus, corpus): identical rows, every id covered") {
    val viaJoin = AnnSearch.knnJoinIvf(emb, "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val viaBcast = AnnSearch.ivfTopK(emb, emb, "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(viaJoin == viaBcast,
      "partitioned self-join diverged from the broadcast shape")
    // every corpus id gets neighbors (nprobe lists always hold >k others
    // at this corpus/nlist ratio)
    val n = emb.count()
    assert(viaJoin.map(_._1).size == n)
  }

  test("knnJoinIvf is broadcast-independent: identical under autoBroadcastJoinThreshold=-1") {
    val default = AnnSearch.knnJoinIvf(emb, "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val noBcast = AnnSearch.knnJoinIvf(emb, "vec_id", "embedding",
        k = 3, nlist = 16, nprobe = 6)
      val got = noBcast.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      // inspect AFTER execution so AQE's FINAL join choices are visible
      val plan = noBcast.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"candidate join demanded a broadcast at threshold=-1:\n$plan")
      assert(got == default)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("knnJoin over hashing-TF-IDF vectors: recall vs brute holds; hints don't move rows") {
    // the h3 pairing: text-derived vectors (not the synthetic embedding
    // table) through the auto-dispatched kNN self-join — TF-IDF mass
    // concentrates in few buckets, a different geometry than the
    // gaussian embeddings the other cases cover
    val docs = t(spark, sf(), "documents")
    val vecs = TextSearch.hashingTfIdfVectors(
      TextSearch.postings(docs, "doc_id", "text"), dim = 64).cache()
    val approx = AnnSearch.knnJoin(vecs, "doc", "vec", k = 3,
      nlist = 16, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = AnnSearch.bruteForceTopK(vecs, vecs, "doc", "vec", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.7, f"TF-IDF knnJoin recall $recall%.3f < 0.7 floor")
    // stat hints are a COST knob only: same rows with both provided
    val n = vecs.count()
    val hinted = AnnSearch.knnJoin(vecs, "doc", "vec", k = 3,
      nlist = 16, nprobe = 6, rowCountHint = n, dimHint = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hinted == approx, "rowCountHint/dimHint changed the result")

    // the h4 pairing (VERDICT r11 task 3): the BYTE-BOUND shape over the
    // same text-derived vectors — PQ-coded member side, ADC candidate
    // ranking, exact rescore. The TF-IDF geometry (mass in few buckets)
    // is the adversarial case for subspace quantization, so the floor
    // holding here is the evidence the 100 TB text path keeps recall.
    val pq = AnnSearch.knnJoinIvfPq(vecs, "doc", "vec", k = 3,
      nlist = 16, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqRecall = (pq & exact).size.toDouble / exact.size
    assert(pqRecall >= 0.7, f"TF-IDF knnJoinIvfPq recall $pqRecall%.3f < 0.7")
    // the rowCountHint (h4's tfidfCount memo) is a cost knob only
    val pqHinted = AnnSearch.knnJoinIvfPq(vecs, "doc", "vec", k = 3,
      nlist = 16, nprobe = 6, rowCountHint = n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pqHinted == pq, "knnJoinIvfPq rowCountHint changed the result")
    vecs.unpersist()
  }

  test("knnJoin auto-dispatch: each regime picks the right shape, results identical") {
    // the decision rule itself: probe-side bytes n·nprobe·(8·dim+16)
    // vs the declared broadcast budget
    assert(AnnSearch.knnJoinBroadcastFits(
      n = 1500, dim = 32, nprobe = 6, threshold = 64L << 20))
    assert(!AnnSearch.knnJoinBroadcastFits( // 1M × 64-dim ≈ 2.1 GB probe side
      n = 1000000, dim = 64, nprobe = 4, threshold = 64L << 20))
    assert(!AnnSearch.knnJoinBroadcastFits( // disabled budget → partitioned
      n = 10, dim = 4, nprobe = 2, threshold = -1))
    // boundary: exactly at the budget still broadcasts, one byte past doesn't
    val bytes = 100L * 6 * (8 * 32 + 16)
    assert(AnnSearch.knnJoinBroadcastFits(100, 32, 6, bytes))
    assert(!AnnSearch.knnJoinBroadcastFits(100, 32, 6, bytes - 1))

    // end-to-end: under the session budget (64 MB) the gate corpus takes
    // the broadcast shape (the forced probe-side hint is visible in the
    // executed plan); with the budget disabled it takes the partitioned
    // shape — and the rows are identical either way
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val bcast = AnnSearch.knnJoin(emb, "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 6)
    val bcastRows = rows(bcast)
    assert(bcast.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "small corpus under budget should take the broadcast shape")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val part = AnnSearch.knnJoin(emb, "vec_id", "embedding",
        k = 3, nlist = 16, nprobe = 6)
      val partRows = rows(part)
      assert(!part.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "disabled budget must take the partitioned shape end-to-end")
      assert(partRows == bcastRows,
        "the two dispatch regimes returned different graphs")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("knnJoinIvf recovers planted mutual nearest neighbors at rank 1") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // 60 random vectors + 5 planted tight pairs (partner = tiny nudge)
    val base = (0 until 60).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val planted = (0 until 5).flatMap { p =>
      val v = Seq.fill(16)(rnd.nextFloat() * 2 - 1)
      val w = v.updated(0, v.head + 0.001f)
      Seq((100L + p, v), (200L + p, w))
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val knn = AnnSearch.knnJoinIvf(corpus, "vec_id", "embedding",
      k = 1, nlist = 4, nprobe = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach { p =>
      assert(knn.get(100L + p).contains(200L + p),
        s"planted pair $p not mutual-nearest (got ${knn.get(100L + p)})")
      assert(knn.get(200L + p).contains(100L + p))
    }
  }

  test("randomized corpora/configs: knnJoinIvf == ivfTopK(corpus, corpus) everywhere") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 6) {
      val n = 30 + rnd.nextInt(120)
      val dim = Seq(4, 8, 16)(rnd.nextInt(3))
      val nlist = Seq(2, 4, 8)(rnd.nextInt(3))
      val nprobe = 1 + rnd.nextInt(nlist)
      val k = 1 + rnd.nextInt(4)
      val corpus = (0 until n).map(i =>
        (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
        .toDF("vec_id", "embedding")
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      val a = rows(AnnSearch.knnJoinIvf(corpus, "vec_id", "embedding",
        k, nlist, nprobe))
      val b = rows(AnnSearch.ivfTopK(corpus, corpus, "vec_id", "embedding",
        k, nlist, nprobe))
      assert(a == b,
        s"trial $trial (n=$n dim=$dim nlist=$nlist nprobe=$nprobe k=$k)")
    }
  }

  test("knnJoinIvfPq == ivfPqTopK(corpus, corpus): identical rows incl. exact cosines") {
    val viaJoin = AnnSearch.knnJoinIvfPq(emb, "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 4, m = 8, ksub = 32, rescoreMult = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val viaBcast = AnnSearch.ivfPqTopK(emb, emb, "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 4, m = 8, ksub = 32, rescoreMult = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(viaJoin == viaBcast,
      "PQ self-join diverged from the broadcast IVF-PQ shape")
    assert(viaJoin.map(_._1).size == emb.count())
  }

  test("knnJoinIvfPq rescoreMult auto-tunes from pair bytes vs shuffle capacity") {
    // the rule itself (budget = partitions × target partition bytes;
    // pair row ≈ 32 B): small corpora take the query-set optimum 40,
    // the design-scale corpus floors at the r8-validated 10, and the
    // mid-scale regime degrades proportionally instead of cliffing
    val budget32 = (32, 128L << 20) // 32 × 128 MB = 4 GB declared capacity
    assert(AnnSearch.knnJoinRescoreMult(1500, 3,
      budget32._1, budget32._2) == 40, "gate corpus must take 40")
    assert(AnnSearch.knnJoinRescoreMult(100000000000L, 10,
      budget32._1, budget32._2) == 10, "1e11 corpus must floor at 10")
    // 4 GB / (5M · 3 · 32B) = 8.9 → proportional regime clamps to 10..40
    val mid = AnnSearch.knnJoinRescoreMult(5000000L, 3,
      budget32._1, budget32._2)
    assert(mid == 10, s"5M×k3 sits just under the floor boundary: $mid")
    val mid2 = AnnSearch.knnJoinRescoreMult(2000000L, 3,
      budget32._1, budget32._2)
    assert(mid2 > 10 && mid2 < 40,
      s"2M×k3 must land strictly between the regimes: $mid2")
    // boundary exactness: fits = budget/(n·k·32) at the 40 edge
    val n40 = budget32._1 * budget32._2 / (40L * 3 * 32)
    assert(AnnSearch.knnJoinRescoreMult(n40, 3,
      budget32._1, budget32._2) == 40)
    assert(AnnSearch.knnJoinRescoreMult(n40 + n40 / 40 + 1, 3,
      budget32._1, budget32._2) < 40)

    // end-to-end: the default (auto) resolves to 40 on the gate corpus
    // and must be row-identical to an explicit 40 — one entry point,
    // no behavior fork for callers
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val auto = rows(AnnSearch.knnJoinIvfPq(emb, "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 4))
    val explicit40 = rows(AnnSearch.knnJoinIvfPq(emb, "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 4, rescoreMult = 40))
    assert(auto == explicit40, "auto depth diverged from explicit 40")
    // the rowCountHint path must not change the decision
    val hinted = rows(AnnSearch.knnJoinIvfPq(emb, "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 4, rowCountHint = emb.count()))
    assert(hinted == auto)
  }

  test("a5_ann_recall contract query reports both methods above the floor") {
    val rows = graft.SparkEntry.queries("a5_ann_recall")(spark, sf())
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("ivf", "lsh"))
    rows.foreach { r =>
      val recall = r.getDouble(1)
      info(s"${r.getString(0)} recall@5 = $recall")
      assert(recall >= 0.5 && recall <= 1.0)
      assert(r.getBoolean(3), s"${r.getString(0)} under the contract floor")
    }
  }
}
