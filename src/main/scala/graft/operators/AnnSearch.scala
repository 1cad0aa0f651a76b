package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Column}

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact baseline — broadcast the query set, score
  *    every (query, corpus) pair, per-query top-k window. Correct at any
  *    scale where |queries| is broadcastable; cost |Q|·|C|.
  *  - [[lshTopK]]: scale path — random-hyperplane signatures bucket the
  *    corpus; each query probes its own bucket plus all buckets within
  *    `probeHamming` bits, then exact-scores candidates only. Sub-linear
  *    candidate sets at 100 TB; recall tunable via bits/probes.
  */
object AnnSearch {

  /** (tables × bits) hyperplane-signature structs for bucketing — table t
    * uses planes [t*bits, (t+1)*bits) of the shared family. */
  private def tableSigs(v: Column, bits: Int, tables: Int): Column =
    array((0 until tables).map { tbl =>
      val wide = VectorFunctions.hyperplaneSignatureRange(v, tbl * bits, bits)
      struct(lit(tbl).as("tbl"), wide.as("sig"))
    }: _*)

  /** All bucket ids within `maxFlips` Hamming bits of `sig` (including
    * sig itself): one XOR per mask, masks precomputed on the driver. */
  private def hammingProbes(sig: Column, bits: Int, maxFlips: Int): Column = {
    val masks = Seq(0L) ++ (1 to maxFlips).flatMap(r =>
      (0 until bits).combinations(r).map(_.foldLeft(0L)((m, b) => m | (1L << b))))
    array(masks.map(m => if (m == 0L) sig else sig.bitwiseXOR(lit(m))): _*)
  }

  /** Exact top-k cosine neighbors per query row.
    * Output: query_id, neighbor_id, cosine (double), rank. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // spread the corpus across cores — a single parquet file otherwise
    // plans the whole cross join as one task
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .transform((d: DataFrame) => Par.spread(d, col("neighbor_id")))
    val scored = broadcast(q).crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Multi-table LSH approximate top-k. `tables` independent hyperplane
    * signatures of `bits` bits each; candidates = corpus vectors colliding
    * with the query in any table (plus `probeHamming`-bit probes per
    * table). Classic (L, b) LSH: recall grows with L, candidate cost with
    * L·2^{-b}. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 8, tables: Int = 8,
      probeHamming: Int = 1): DataFrame = {
    require(bits <= 20, "signature must stay bucket-join friendly")
    require(probeHamming <= 3, "probe count grows as C(bits, r) — cap r at 3")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .transform((d: DataFrame) => Par.spread(d, col("neighbor_id"))) // parallelize + materialize before sig
      .withColumn("bk", explode(tableSigs(col("cv"), bits, tables)))
      .select(col("neighbor_id"), col("cv"),
        col("bk.tbl").as("tbl"), col("bk.sig").as("bucket"))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bk", explode(tableSigs(col("qv"), bits, tables)))
      .select(col("query_id"), col("qv"),
        col("bk.tbl").as("tbl"), col("bk.sig").as("qsig"))
    val q = q0.withColumn("bucket",
      explode(hammingProbes(col("qsig"), bits, probeHamming)))
    // score BEFORE the pair-dedup (the cheap-verify-before-dedup shape,
    // as in lshNearDupPairs): a pair colliding in k tables is scored k
    // times (k small, cosine is one codegen'd VecDot), but the dedup
    // shuffle then moves only (ids, cosine) — not both embedding vectors,
    // ~20× fewer bytes at 64 dims (measured 94 s → dominated by the
    // vector-carrying shuffle at 1M docs × 1k queries)
    val scored = q.join(c, Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF-flat approximate top-k: a coarse quantizer partitions the corpus
    * into `nlist` inverted lists; each query exact-scores only the members
    * of its `nprobe` nearest lists.
    *
    * The quantizer is a deterministic sample — the `nlist` corpus vectors
    * with the smallest `xxhash64(id)` (pseudo-random but stable across
    * runs/partitionings, no iterative k-means needed). At 100 TB the list
    * assignment is one broadcast-join pass over the corpus and can be
    * persisted as a bucketed table partitioned by `list_id`, making each
    * query's probe a partition-pruned scan of nprobe/nlist of the data;
    * queries shuffle only to their probed lists.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    // id uniqueness is load-bearing for the slim assignment exchange below:
    // `assignedIds` carries one row per DISTINCT id, and the vector rejoin
    // would fan that back out to every duplicate corpus row — changing
    // candidate sets vs the pre-slim argmax plan (which collapsed
    // duplicates). Enforce one row per id here; dropDuplicates lands on
    // the hash(neighbor_id) partitioning Par.spread just installed, so it
    // costs a map-side aggregate, not another exchange.
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .transform((d: DataFrame) => Par.spread(d, col("neighbor_id")))
      .dropDuplicates("neighbor_id")
    // materialize the nlist centroids once — the frame feeds two broadcast
    // branches, and leaving it lazy would run the corpus-wide
    // TakeOrdered twice
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("list_id",
        c.schema("neighbor_id").dataType),
      org.apache.spark.sql.types.StructField("centv",
        c.schema("cv").dataType)))
    val centRows = c
      .withColumn("__h", xxhash64(col("neighbor_id")))
      .orderBy(col("__h"), col("neighbor_id"))
      .limit(nlist)
      .select(col("neighbor_id").as("list_id"), col("cv").as("centv"))
      .collect()
    val cents = corpus.sparkSession.createDataFrame(
      java.util.Arrays.asList(centRows: _*), centSchema)
    // assign every corpus vector to its single nearest centroid. The
    // argmax window shuffles |corpus|×nlist rows — project down to
    // (id, list_id, sim) FIRST so that exchange carries ~24 B/row, not
    // both embedding vectors (~0.5 KB/row: 34 GB vs 1.5 GB at 1M docs ×
    // 64 lists), then rejoin the vector by id (a slim join AQE can
    // broadcast-convert)
    val wAssign = Window.partitionBy(col("neighbor_id"))
      .orderBy(col("__sim").desc, col("list_id").asc)
    val assignedIds = c.crossJoin(broadcast(cents))
      .select(col("neighbor_id"), col("list_id"),
        VectorFunctions.cosine(col("cv"), col("centv")).as("__sim"))
      .withColumn("__rn", row_number().over(wAssign))
      .where(col("__rn") === 1)
      .select(col("neighbor_id"), col("list_id"))
    val assigned = c.join(assignedIds, "neighbor_id")
      .select(col("neighbor_id"), col("cv"), col("list_id"))
    // each query probes its nprobe nearest lists
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("list_id").asc)
    val probes = broadcast(q0).crossJoin(broadcast(cents))
      .withColumn("__sim", VectorFunctions.cosine(col("qv"), col("centv")))
      .withColumn("__rn", row_number().over(wProbe))
      .where(col("__rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("list_id"))
    // exact-score only candidates inside probed lists (disjoint lists — no dedup)
    val scored = probes.join(assigned, "list_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** LSH-bucketed embedding near-dup pairs — the scale path for
    * [[cosineNearDupPairs]]: candidates are corpus vectors colliding in
    * any of `tables` hyperplane-signature tables, verified by exact
    * cosine. The verification filter runs INSIDE the self-join output,
    * before the pair-dedup shuffle (the cheap-verify-before-dedup shape;
    * cosine is one codegen'd VecDot). Recall grows with `tables`, bucket
    * size shrinks with `bits`. */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      theta: Double, bits: Int = 12, tables: Int = 8): DataFrame = {
    require(bits <= 20, "signature must stay bucket-join friendly")
    val t = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .transform((d: DataFrame) => Par.spread(d, col("id")))
      .withColumn("bk", explode(tableSigs(col("v"), bits, tables)))
      .select(col("id"), col("v"),
        col("bk.tbl").as("tbl"), col("bk.sig").as("bucket"))
    val a = t.alias("a")
    val b = t.alias("b")
    // cosine computed ONCE per collision pair (a projection above the
    // join — Catalyst does not CSE across join condition and projection),
    // filtered before the pair-dedup shuffle
    a.join(b, col("a.tbl") === col("b.tbl") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        VectorFunctions.cosine(col("a.v"), col("b.v")).as("cosine"))
      .where(col("cosine") >= theta)
      .dropDuplicates("vec_a", "vec_b")
  }

  /** Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine ≥ θ).
    * Exact quadratic version — the oracle-checkable baseline;
    * [[lshNearDupPairs]] is the scale path. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      theta: Double): DataFrame = {
    val a = df.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
      .transform((d: DataFrame) => Par.spread(d, col("vec_a"))) // one-file inputs must not serialize the n² scan
    val b = df.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    a.crossJoin(b)
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cosine", VectorFunctions.cosine(col("va"), col("vb")))
      .where(col("cosine") >= theta)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }
}
