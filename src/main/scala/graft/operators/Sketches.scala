package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder}

/** KMV (k-minimum-values) distinct-count sketch — the CROSS-ENGINE
  * REPLAYABLE cardinality sketch (Bar-Yossef et al. 2002; the unbiased
  * (k−1)/U₍ₖ₎ estimator from Beyer et al., SIGMOD 2007).
  *
  * Spark's built-in `approx_count_distinct` (HyperLogLog++) is the
  * day-to-day answer (SketchesSpec pins its error contract), but its
  * register layout is an engine implementation detail: no other system
  * can reproduce or audit the estimate, and two engines never agree
  * bit-for-bit. KMV is the portable alternative: the sketch IS the k
  * lexicographically-smallest `md5` hashes of the key set (the
  * [[Splits.hashKey]] engine-portability discipline — every engine's
  * md5 of the same string agrees, lowercase-hex order == numeric
  * order), so any engine can rebuild the identical sketch, merge
  * sketches from different engines, and derive the identical estimate:
  * with m < k distinct hashes the sketch is EXACT (est = m); otherwise
  * est = (k−1) / U₍ₖ₎ where U₍ₖ₎ = (k-th smallest hash) / 16¹²,
  * rel. std. error ≈ 1/√(k−2) (~9% at k=128).
  *
  * Scale shape: the aggregation state is a BOUNDED sorted vector of
  * ≤ k 12-char strings held as a live object per (partition, group) —
  * Spark's ObjectHashAggregate keeps typed-`Aggregator` buffers
  * unserialized between rows — so the map side reduces each partition
  * to ≤ k rows per group before the ONE shuffle of partial sketches
  * (vs `countDistinct`'s shuffle of every distinct key: the sketch
  * shuffle is O(groups·k), not O(distinct keys), the entire point at
  * 100 TB). Per row the update is an O(1) reject against the current
  * k-th minimum once the sketch warms, O(log k + k) copy on the rare
  * insert. Merge is union-truncate — associative, commutative,
  * duplicate-insensitive — so sketches parallelize across any
  * partitioning and union across shards, days, or engines.
  */
object Sketches {

  /** Hex digits kept per hash: 48 bits — collision-negligible for the
    * estimator (P[any collision] ≈ k²/2⁴⁹ per group) and exact in a
    * double (< 2⁵³), so the estimate arithmetic is portable too. */
  val HexDigits = 12

  // --------------------------------------- sketch SHAPE metadata (r16)
  //
  // Every serve function trusts the caller to re-supply the parameters
  // the sketch was built with — a mismatch silently produces wrong
  // estimates (wrong bucket/position arithmetic), and the
  // stream-maintained sketches persist across sessions where the build
  // parameters are easiest to lose. The builders therefore STAMP the
  // shape into the sketch column's schema metadata — it rides the
  // DataFrame through unions/filters and survives the parquet
  // round-trip (Spark stores column metadata in the footer schema) —
  // and the serve paths require-match it WHEN PRESENT. Pre-stamp
  // tables (or frames whose metadata an aggregation dropped) still
  // serve: the check closes the silent-wrong-answer class without
  // breaking legacy artifacts; the SilverIndex refreshes re-stamp on
  // every commit so maintained sketches never lose the stamp.

  private[graft] val CmsWidthKey = "graft.cms.width"
  private[graft] val CmsDepthKey = "graft.cms.depth"
  private[graft] val BloomHashesKey = "graft.bloom.numHashes"
  private[graft] val BloomBitsKey = "graft.bloom.mBits"
  private[graft] val KmvKKey = "graft.kmv.k"

  /** Re-stamp shape metadata onto `colName` (aggregations and writes
    * of derived frames drop it). */
  private[graft] def stampShape(df: DataFrame, colName: String,
      kv: (String, Long)*): DataFrame = {
    val b = new org.apache.spark.sql.types.MetadataBuilder()
    kv.foreach { case (key, v) => b.putLong(key, v) }
    df.withColumn(colName, col(colName).as(colName, b.build()))
  }

  /** Fail loudly when a sketch's embedded shape contradicts the
    * caller-supplied parameters; absent stamps pass (legacy tables). */
  private def requireShape(df: DataFrame, colName: String,
      expected: (String, Long)*): Unit =
    if (df.schema.fieldNames.contains(colName)) {
      val m = df.schema(colName).metadata
      expected.foreach { case (key, v) =>
        if (m.contains(key)) require(m.getLong(key) == v,
          s"sketch shape mismatch on '$colName': stored $key=" +
            s"${m.getLong(key)}, caller supplied $key=$v — estimates " +
            "would be silently wrong")
      }
    }

  /** 16¹² as a double — the hash-space size U₍ₖ₎ normalizes against. */
  val Space: Double = 281474976710656.0

  /** The per-row sketch key: first 12 lowercase-hex chars of
    * md5(key-as-string). NULL keys yield NULL and are skipped by the
    * aggregator (SQL COUNT(DISTINCT) semantics). */
  def kmvHash(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, HexDigits)

  /** Typed aggregate: the k smallest DISTINCT hash strings, ascending.
    * Buffer = sorted bounded Vector (object-held between rows; encoded
    * only for spill/shuffle). */
  final class KmvAgg(k: Int)
      extends Aggregator[String, Vector[String], Seq[String]] {
    require(k >= 2, s"KMV needs k >= 2: $k")

    override def zero: Vector[String] = Vector.empty

    override def reduce(b: Vector[String], h: String): Vector[String] =
      insert(b, h)

    // fold the smaller sketch into the larger; insert has set
    // semantics, so the result is orientation-independent
    override def merge(a: Vector[String], b: Vector[String]): Vector[String] =
      if (a.length >= b.length) b.foldLeft(a)(insert)
      else a.foldLeft(b)(insert)

    override def finish(b: Vector[String]): Seq[String] = b

    override def bufferEncoder: Encoder[Vector[String]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()

    private def insert(b: Vector[String], h: String): Vector[String] = {
      if (h == null) return b
      // warm-path reject: not smaller than the current k-th minimum
      if (b.length >= k && b.last <= h) return b
      var lo = 0
      var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b(mid).compareTo(h) < 0) lo = mid + 1 else hi = mid
      }
      if (lo < b.length && b(lo) == h) b // already present
      else {
        val nb = (b.take(lo) :+ h) ++ b.drop(lo)
        if (nb.length > k) nb.dropRight(1) else nb
      }
    }
  }

  /** The estimate from a sketch column (ascending array of ≤ k hashes):
    * exact below k, (k−1)/U₍ₖ₎ at k. Shared by [[kmvDistinct]] and any
    * consumer re-deriving the estimate from a STORED sketch. */
  def kmvEstimate(kmins: Column, k: Int): Column =
    when(size(kmins) < k, size(kmins).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(Space) /
        conv(element_at(kmins, -1), 16, 10).cast("long").cast("double"))

  /** Count-Min frequency sketch (Cormode & Muthukrishnan 2005), with
    * the same engine-portability contract as the KMV sketch: the d row
    * hashes are md5-derived (`md5("row:key")` 12-hex prefix mod width),
    * so any engine rebuilds the identical (row, bucket, cnt) table and
    * derives the identical estimates — vs Spark's built-in
    * `stat.countMinSketch`, whose seeded hash family is an
    * implementation detail (SketchesSpec pins its error contract; this
    * is the auditable/mergeable-across-engines variant). Estimates
    * only ever OVERcount (collisions add, never subtract):
    * est(x) = min over rows of cnt[row, h_row(x)], with
    * P[overcount > 2N/width] < (1/2)^depth.
    *
    * Scale: the build is one narrow explode (×depth) into a groupBy —
    * map-side combine bounds each partition's contribution at
    * depth·width rows, so the shuffle is O(partitions·depth·width),
    * never O(events). The sketch itself is depth·width rows — broadcast
    * it to estimate: queries never shuffle. */
  def cmsHash(key: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(row.toString), lit(":"),
      key.cast("string")).cast("binary")), 1, HexDigits), 16, 10)
      .cast("long") % width

  /** The sketch table (row, bucket, cnt) over the BAG of keys (NULLs
    * dropped); rows with multiplicity count multiply, matching
    * frequency semantics. */
  def cmsBuild(df: DataFrame, keyCol: String, width: Int,
      depth: Int): DataFrame = {
    require(width >= 2 && depth >= 1, s"bad CMS shape: $width x $depth")
    stampShape(df.where(col(keyCol).isNotNull)
      .select(posexplode(array((0 until depth).map(r =>
        cmsHash(col(keyCol), r, width)): _*)))
      .groupBy(col("pos").as("row"), col("col").as("bucket"))
      .agg(count(lit(1)).as("cnt")),
      "cnt", CmsWidthKey -> width.toLong, CmsDepthKey -> depth.toLong)
  }

  /** Point estimates for `keys` (deduped) against a sketch built with
    * the same (width, depth): (key, est_n). The sketch side is
    * broadcast — depth·width rows by construction. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      width: Int, depth: Int): DataFrame = {
    requireShape(sketch, "cnt",
      CmsWidthKey -> width.toLong, CmsDepthKey -> depth.toLong)
    val q = keys.select(col(keyCol).as("key")).where(col("key").isNotNull)
      .distinct()
      .select(col("key"), posexplode(array((0 until depth).map(r =>
        cmsHash(col("key"), r, width)): _*)))
      .withColumnRenamed("pos", "row")
      .withColumnRenamed("col", "bucket")
    q.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }

  // ------------------------------------------- k7: heavy hitters (CMS)

  /** HEAVY HITTERS (frequent items / "top talkers") — the seventh
    * portable-sketch question, answered the portable way: the CMS is
    * the sketch, the candidate set is every key whose CMS estimate
    * reaches φ·N, and ONE exact semi-join recount verifies the
    * candidates (Cormode & Muthukrishnan 2005 §4.2's CM-based
    * frequent-items scheme; a Misra-Gries/SpaceSaving counter table
    * would be a second, engine-resident state format — the CMS route
    * reuses k2's already-replayable sketch). The two contract halves:
    *
    *  - NO FALSE NEGATIVES: CMS only ever overcounts, so est(x) ≥
    *    f(x) — every truly-φ-heavy key is a candidate, always.
    *  - candidates are VERIFIED: collision-inflated keys survive the
    *    estimate gate but carry `heavy = 0` after the exact recount
    *    (visible in the output, the k4 both-halves discipline).
    *
    * N derives from the sketch itself (any single row's counters sum
    * to the stream length), so the report needs no extra corpus pass.
    * Output: (key, n_total, est_n, exact_n, heavy), candidates only.
    *
    * Scale: the sketch is depth·width rows; the candidate pass is the
    * k2 estimate shape (distinct keys × depth narrow rows against the
    * broadcast sketch); the recount semi-join carries NO broadcast
    * hint — the candidate set is ≤ 1/φ true heavies plus collision
    * extras, usually tiny, but a hostile (width, φ) can inflate it and
    * AQE should decide from the runtime size (the d16 lesson). Merge ≡
    * whole: shard sketches sum per (row, bucket) into the corpus
    * sketch, then [[heavyHittersFromSketch]] serves from the merge. */
  def heavyHitters(df: DataFrame, keyCol: String, phi: Double,
      width: Int, depth: Int): DataFrame = {
    val keys = df.where(col(keyCol).isNotNull)
      .select(col(keyCol).as("key"))
    heavyHittersFromSketch(cmsBuild(keys, "key", width, depth),
      keys, "key", phi, width, depth)
  }

  /** [[heavyHitters]] served from an already-built (or merged, or
    * stream-maintained — [[graft.pipeline.SilverIndex.refreshCms]])
    * sketch; `df`'s key bag is scanned only for the exact candidate
    * recount. */
  def heavyHittersFromSketch(sketch: DataFrame, df: DataFrame,
      keyCol: String, phi: Double, width: Int, depth: Int): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi must be in (0, 1): $phi")
    requireShape(sketch, "cnt",
      CmsWidthKey -> width.toLong, CmsDepthKey -> depth.toLong)
    val keys = df.where(col(keyCol).isNotNull)
      .select(col(keyCol).as("key"))
    // N from the sketch: each of the depth rows counts every
    // occurrence exactly once, so row 0's counters sum to N
    val n = sketch.where(col("row") === 0)
      .agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
    // an empty (or wrong-path) sketch would make thr = ceil(0) = 0 and
    // flag EVERY distinct key heavy — a silently garbage report; fail
    // loudly instead
    require(n > 0,
      "heavyHittersFromSketch: sketch is empty (N = 0) — wrong sketch " +
        "table, wrong path, or a stream that has not observed a batch")
    val thr = math.ceil(phi * n).toLong
    // candidates are consumed twice (the recount's semi-join probe AND
    // the final join) — eagerly materialize the output-sized frame so
    // the distinct-key estimate pass over the corpus runs once
    val cand = cmsEstimate(sketch, keys, "key", width, depth)
      .where(col("est_n") >= thr)
      .localCheckpoint(true)
    val exact = keys.join(cand.select("key"), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("exact_n"))
    cand.join(exact, Seq("key"))
      .select(col("key"), lit(n).as("n_total"), col("est_n"),
        col("exact_n"),
        (col("exact_n") >= thr).cast("long").as("heavy"))
  }

  // ------------------------------------------------- k4: Bloom filter

  /** Portable BLOOM FILTER (Bloom 1970, public) under the family
    * contract: bit positions are md5-derived ([[cmsHash]] — a Bloom is
    * structurally a bit-valued CMS row set), so any engine rebuilds
    * the IDENTICAL bit set and membership answers replay exactly. The
    * filter is stored as distinct `pos` ROWS, not a packed bitmap:
    * row-shape makes it mergeable by plain UNION + DISTINCT —
    * associative, commutative, DUPLICATE-INSENSITIVE, the same
    * replay-absorbing merge algebra as the KMV sketch (shard sketches
    * union to the whole-corpus sketch; an at-least-once replayed batch
    * folds to a no-op). Standard guarantees: NO false negatives ever;
    * false-positive rate ≈ (1 − e^(−kn/m))^k.
    *
    * Scale: the stored side is ≤ m rows (bits set), the build shuffles
    * the map-side-DISTINCTed positions — O(min(k·distinct, m)), never
    * the key bag; membership probes join against the BROADCAST bit
    * set. */
  def bloomBuild(df: DataFrame, keyCol: String, numHashes: Int,
      mBits: Int): DataFrame = {
    require(numHashes >= 1 && mBits >= 2,
      s"bad Bloom shape: $numHashes hashes x $mBits bits")
    stampShape(df.where(col(keyCol).isNotNull)
      .select(explode(array((0 until numHashes).map(r =>
        cmsHash(col(keyCol), r, mBits)): _*)).as("pos"))
      .distinct(),
      "pos", BloomHashesKey -> numHashes.toLong,
      BloomBitsKey -> mBits.toLong)
  }

  /** Membership answers for `probes` (deduped) against a filter built
    * with the same (numHashes, mBits): (key, n_pos, n_hit,
    * might_contain). A key CONTAINS iff every one of its DISTINCT
    * positions is set (two of a key's hashes may collide onto one
    * position — counting matched rows against the constant k would
    * then report a false NEGATIVE, so both sides count distinct
    * positions). */
  def bloomMightContain(bloom: DataFrame, probes: DataFrame,
      keyCol: String, numHashes: Int, mBits: Int): DataFrame = {
    require(numHashes >= 1 && mBits >= 2,
      s"bad Bloom shape: $numHashes hashes x $mBits bits")
    requireShape(bloom, "pos",
      BloomHashesKey -> numHashes.toLong, BloomBitsKey -> mBits.toLong)
    val pp = probes.select(col(keyCol).as("key"))
      .where(col("key").isNotNull).distinct()
      .select(col("key"), explode(array((0 until numHashes).map(r =>
        cmsHash(col("key"), r, mBits)): _*)).as("pos"))
      .distinct()
    pp.join(broadcast(bloom.withColumn("__hit", lit(1L))), Seq("pos"),
        "left")
      .groupBy("key")
      .agg(count(lit(1)).as("n_pos"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .withColumn("might_contain",
        (col("n_pos") === col("n_hit")).cast("long"))
  }

  // ------------------------------------------------ k5: HyperLogLog

  /** HLL precision: p = 10 → m = 1024 registers per group,
    * rel. std. error ≈ 1.04/√m ≈ 3.3%. */
  val HllP = 10
  val HllM: Int = 1 << HllP

  /** Register values cap at 40 so the indicator sum Σ 2^(40−reg) stays
    * an EXACT BIGINT ≤ 2⁵⁰ (m·2⁴⁰) — exactly representable in a
    * double, so the estimate replays bit-for-bit in any engine
    * regardless of summation order. P[any rho > 40] ≈ m·2⁻⁴⁰ per
    * group: the cap never binds in practice, it only bounds the
    * arithmetic. */
  val HllRegCap = 40

  /** α₁₀₂₄ · m² — the bias constant of Flajolet, Fusy, Gandouet &
    * Meunier 2007 (§4: α_m = 0.7213/(1 + 1.079/m) for m ≥ 128),
    * evaluated in the same IEEE sequence the DuckDB oracle writes:
    * 0.7213 / (1 + 1.079/1024) * 1048576. */
  val HllAlphaM2: Double = 0.7213 / (1.0 + 1.079 / 1024.0) * 1048576.0

  /** Portable HYPERLOGLOG (Flajolet et al. 2007) under the family
    * contract: the 52-bit hash is the 13-hex md5 prefix (the k1/k2
    * rolling-parse discipline), the register index its low p bits, and
    * rho the position of the highest set bit in the remaining 42-bit
    * window — computed as 43 − bitlength(w) via the engine's exact
    * binary-string `bin()` (NEVER floor(log2): libm rounding at exact
    * powers of two would flip registers between engines). Any engine
    * rebuilds the IDENTICAL register table from the same md5s — vs the
    * built-in `approx_count_distinct`, whose HLL++ register layout is
    * an engine implementation detail (SketchesSpec pins its error
    * contract; this is the auditable/mergeable-across-engines variant,
    * the same positioning as the KMV sketch at ~9× less state per
    * group for comparable error).
    *
    * Registers MERGE by per-bucket max — associative, commutative,
    * duplicate-insensitive — so sketches union across partitions,
    * shards, days, or engines, and the s7 streaming-maintenance
    * discipline (merge-idempotent fold, versioned commit) applies
    * unchanged. Scale: one groupBy(group, bucket) max — map-side
    * combine bounds each partition's contribution at m rows per group,
    * so the shuffle is O(groups·m), never O(distinct keys).
    *
    * Output: `groupCols ++ (bucket, reg)` — nonempty registers only
    * (absent bucket ≡ register 0). */
  def hllBuild(df: DataFrame, groupCols: Seq[String],
      keyCol: String): DataFrame = {
    require(groupCols.nonEmpty, "hllBuild needs grouping columns")
    val h = conv(substring(md5(col(keyCol).cast("string")
      .cast("binary")), 1, 13), 16, 10).cast("long")
    df.where(col(keyCol).isNotNull)
      .select(groupCols.map(col) :+ h.as("__h"): _*)
      .withColumn("bucket", col("__h").bitwiseAND(lit((HllM - 1).toLong)))
      .withColumn("__w", shiftright(col("__h"), HllP))
      .withColumn("__rho", least(
        when(col("__w") === 0L, lit(43))
          .otherwise(lit(43) - length(bin(col("__w")))),
        lit(HllRegCap)))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("__rho")).cast("int").as("reg"))
  }

  /** The HLL estimate from a register table: raw harmonic-mean
    * estimate α_m·m²/S with S = Σ_buckets 2^(−reg) computed EXACTLY
    * (integer Σ 2^(40−reg) over nonempty registers + 2⁴⁰ per empty
    * one, then one exact scale-down), plus the small-range
    * linear-counting correction m·ln(m/V) when raw ≤ 2.5m and zero
    * registers remain (the published regime switch — ln is the one
    * non-exact step, absorbed by the caller's round(…,6)).
    *
    * Output: `groupCols ++ (n_buckets, n_zero, t_fingerprint, est_raw,
    * est_hll)` — `t_fingerprint` is the exact BIGINT indicator sum,
    * the register table's portable digest. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val scale = (1L << HllRegCap).toDouble
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRegCap - reg)"))
          .as("__t_non"))
      .withColumn("n_zero", lit(HllM.toLong) - col("n_buckets"))
      .withColumn("t_fingerprint",
        col("__t_non") + col("n_zero") * lit(1L << HllRegCap))
      .withColumn("est_raw",
        lit(HllAlphaM2) / (col("t_fingerprint").cast("double") / lit(scale)))
      .withColumn("est_hll",
        when(col("est_raw") <= lit(2.5 * HllM) && col("n_zero") > 0,
          lit(HllM.toDouble) *
            log(lit(HllM.toDouble) / col("n_zero").cast("double")))
          .otherwise(col("est_raw")))
      .drop("__t_non")
  }

  // ------------------------------------------- k6: portable MinHash

  /** Portable MINHASH signature (Broder 1997) — the sixth portable
    * sketch: set-SIMILARITY, where k1/k5 answer cardinality, k2
    * frequency, k3 quantiles, k4 membership. Per seed i, the signature
    * element is the lexicographically smallest 12-hex
    * md5("i:element") over the set (hex order == numeric order — the
    * k1 discipline), so ANY engine rebuilds the identical signature
    * and two engines' signatures compare directly:
    * P[sig_a(i) = sig_b(i)] = J(A, B), est = agreements / numHashes,
    * rel. std. error ≈ √(J(1−J)/numHashes).
    *
    * This is the CROSS-ENGINE variant of the dedup family's
    * xxhash64-kernel signatures ([[Dedup.minhashSignature]] — faster,
    * but its hash family is a JVM implementation detail): store THESE
    * when another system must reproduce, merge (per-seed min), or
    * audit the sketch; use the kernel inside a single-engine LSH
    * pipeline. Per-row cost is |set|·numHashes md5s — one narrow
    * projection, no shuffle.
    *
    * EMPTY-set contract: `array_min` of an empty array is NULL, so an
    * empty token set signs as an all-NULL signature, and
    * [[minhashAgreement]] (null-rejecting `===`) then scores ANY pair
    * involving one as 0 — including two identical empty sets, whose
    * Jaccard is undefined, not 0. Filter empty sets before signing
    * (the k6 gate keeps only `size(sh) > 0` pairs) or treat an
    * all-NULL signature as "no estimate". */
  def minhashPortable(sh: Column, numHashes: Int): Column = {
    require(numHashes >= 1, s"numHashes must be >= 1: $numHashes")
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(sh, g =>
        substring(md5(concat(i.cast("string"), lit(":"), g)
          .cast("binary")), 1, HexDigits))))
  }

  /** Signature-agreement count between two equal-length portable
    * signatures — `n_agree / numHashes` estimates the Jaccard. */
  def minhashAgreement(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), m => m))

  /** Per-group KMV sketch + estimate over `keyCol`. Output:
    * `groupCols ++ (n_kept, kth_hash, kmins, est_distinct)` — `kmins`
    * is the mergeable sketch itself (store it; union + re-aggregate
    * re-derives the global sketch), `kth_hash` the k-th minimum the
    * estimate divides by. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int = 128): DataFrame = {
    require(groupCols.nonEmpty, "kmvDistinct needs grouping columns")
    val agg = udaf(new KmvAgg(k))
    stampShape(df.where(col(keyCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(kmvHash(col(keyCol))).as("kmins"))
      .select(groupCols.map(col) ++ Seq(
        size(col("kmins")).as("n_kept"),
        element_at(col("kmins"), -1).as("kth_hash"),
        col("kmins"),
        kmvEstimate(col("kmins"), k).as("est_distinct")): _*),
      "kmins", KmvKKey -> k.toLong)
  }

  /** [[kmvEstimate]] against a STORED sketch table, shape-checked:
    * validates the frame's embedded k (when stamped — see the shape-
    * metadata block above) before handing back the estimate column. */
  def kmvEstimateFrom(sketch: DataFrame, kminsCol: String,
      k: Int): Column = {
    requireShape(sketch, kminsCol, KmvKKey -> k.toLong)
    kmvEstimate(col(kminsCol), k)
  }

  /** SET-OPERATION estimates from TWO KMV sketches over the same hash
    * space (Beyer, Haas, Reinwald, Sismanis & Gemulla, SIGMOD'07 —
    * public literature; the theta-sketch set algebra): the question a
    * pair of maintained sketches can answer that two numbers cannot —
    * "how many distinct keys do feeds A and B share / cover together?"
    * without ever co-scanning the feeds.
    *
    *  - merged = the k smallest of a ∪ b (itself a valid KMV sketch of
    *    A ∪ B — mergeability is the whole point of the family);
    *  - est_union from [[kmvEstimate]] over merged;
    *  - ρ = |{h ∈ merged : h ∈ a ∧ h ∈ b}| / |merged| — every merged
    *    hash from A is ≤ a's k-th minimum, so membership in the STORED
    *    sketch decides membership in the side (the Beyer et al.
    *    argument), making ρ an unbiased Jaccard estimate;
    *  - est_intersect = ρ · est_union (inclusion via the union sketch,
    *    not inclusion-exclusion of two noisy estimates).
    *
    * When |merged| < k BOTH sides were exhaustive (|merged| ≥ each
    * side's size), and the SAME formulas are automatically exact:
    * est_union = |merged| = |A ∪ B| and ρ·est_union = |{common
    * hashes}| = |A ∩ B| — the exact-below-k contract [[kmvEstimate]]
    * carries extends to the set algebra with no branch. Pure array
    * arithmetic over the stored hash strings: engine-portable, no
    * corpus rescans. Returns struct(est_union, est_intersect,
    * jaccard).
    *
    * `k` must be ≤ the k the sketches were BUILT with (truncating a
    * KMV sketch to fewer minima is sound; the k smallest of a larger
    * minima set are the true smaller-k sketch). The reverse — passing
    * a larger k — would silently misread a saturated sketch as
    * exhaustive; an input LONGER than k proves that mismatch and
    * raises, and persisted sketch tables should be validated against
    * their stamped [[KmvKKey]] (the [[kmvEstimateFrom]] discipline)
    * before their arrays reach this column expression. */
  def kmvSetEstimates(aKmins: Column, bKmins: Column, k: Int): Column = {
    def guarded(c: Column, side: String): Column =
      when(size(c) > k, raise_error(concat(
        lit(s"kmvSetEstimates: $side sketch holds "), size(c).cast("string"),
        lit(s" minima > k=$k — built with a larger k; re-serve with the "
          + "built k or truncate explicitly")))).otherwise(c)
    val merged = slice(array_sort(array_union(
      guarded(aKmins, "left"), guarded(bKmins, "right"))), 1, k)
    val common = size(filter(merged,
      h => array_contains(aKmins, h) && array_contains(bKmins, h)))
    val estU = kmvEstimate(merged, k)
    val rho = when(size(merged) === 0, lit(0.0))
      .otherwise(common.cast("double") / size(merged).cast("double"))
    struct(
      estU.as("est_union"),
      (rho * estU).as("est_intersect"),
      rho.as("jaccard"))
  }

  /** Deterministic hash-sample QUANTILE sketch — the third portable
    * sketch next to KMV (distincts) and CMS (frequencies). Spark's
    * `percentile_approx` (a GK variant) is the day-to-day answer, but
    * its compaction schedule is an engine implementation detail: no
    * other system reproduces its estimates. Here the sample IS the
    * sketch: a row is in iff `md5(salt:id) < threshold(rate)` (the
    * [[Splits]] purity contract — any engine draws the IDENTICAL
    * sample), and each quantile is then RANK-EXACT over the sample
    * (type-1/lower: the value at rank ⌈q·n⌉, ordered by value with the
    * row's hash as tie-break) — pure row selection, no interpolation
    * floats, so estimates replay bit-for-bit anywhere. Sample-quantile
    * error concentrates as O(1/√(rate·N)) around the true quantile.
    *
    * Scale shape: the hash gate is a narrow codegen'd filter AT THE
    * SCAN (only rate·N rows ever move); ranking is one window sort per
    * group over the sample, and the rank targets join back per group —
    * output is |groups|·|qs| rows. At 100 TB you size `rate` so a
    * group's sample fits one partition (1e-5 of 1e12 rows = 1e7 — and
    * the window never sees more than that); the UNSAMPLED alternative
    * sorts the full corpus per group. */
  def sampleQuantiles(df: DataFrame, idCol: Column, valCol: String,
      groupCols: Seq[String], salt: String, rate: Double,
      qs: Seq[Double]): DataFrame = {
    require(groupCols.nonEmpty, "sampleQuantiles needs grouping columns")
    require(rate > 0.0 && rate < 1.0, s"rate must be in (0, 1): $rate")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1]: $qs")
    val g = groupCols.map(col)
    val sample = df
      .where(col(valCol).isNotNull &&
        Splits.hashKey(idCol, salt) < lit(Splits.thresholdHex(rate)))
      .select(g :+ col(valCol).as("__v") :+
        Splits.hashKey(idCol, salt).as("__hk"): _*)
    rankSelect(sample, groupCols, qs)
  }

  /** The rank-exact selection half of [[sampleQuantiles]] over an
    * ALREADY-DRAWN sample frame (`groupCols ++ (__v, __hk)`) — shared
    * with the streaming-maintained sample ([[graft.pipeline
    * .SilverIndex.refreshQuantileSample]]), whose stored rows ARE this
    * frame. */
  private[graft] def rankSelect(sample: DataFrame,
      groupCols: Seq[String], qs: Seq[Double]): DataFrame = {
    val g = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__v"), col("__hk"))
    val ranked = sample.withColumn("__rn", row_number().over(w))
    val targets = sample.groupBy(g: _*)
      .agg(count(lit(1)).as("n_sample"))
      .select(g :+ col("n_sample") :+
        explode(array(qs.map(lit): _*)).as("q"): _*)
      .withColumn("__rq", ceil(col("q") * col("n_sample")).cast("int"))
    targets.join(ranked,
        groupCols.map(c => targets(c) === ranked(c))
          .reduce(_ && _) && col("__rq") === col("__rn"))
      .select(groupCols.map(targets(_)) ++ Seq(col("q"),
        col("n_sample"), col("__v").as("est_value")): _*)
  }
}
