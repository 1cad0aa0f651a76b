package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** ENGINE-PORTABLE fixed-iteration Lloyd k-means (Lloyd 1982) — the
  * clustering primitive embedding pipelines partition corpora with
  * (SemDeDup blocks, IVF coarse quantizers, topic bucketing). The IVF
  * trainer ([[AnnSearch]]) already runs k-means internally with
  * engine-specific sampling; THIS variant pins every source of
  * nondeterminism so the whole trajectory replays bit-for-bit in any
  * engine (the d13/x4 discipline), making cluster assignments a
  * portable, auditable artifact rather than a training accident:
  *
  *  - init: the k vectors with the SMALLEST md5 hash of their id
  *    ([[Splits.hashKey]] — a deterministic uniform sample; cluster c =
  *    hash rank);
  *  - assignment: argmin over squared L2 distance computed as a
  *    SEQUENTIAL fold in doubles (both engines add in the same order →
  *    identical IEEE results), rounded to 9 decimals with a cluster-id
  *    tie-break;
  *  - update: per-dimension mean rounded to 12 decimals (the one
  *    order-dependent float sum — rounding absorbs the ~1e-16 drift,
  *    the x4 PageRank argument);
  *  - fixed `iters` rounds, then one final assignment against the last
  *    centroids. An empty cluster simply drops (both engines agree).
  *
  * Scale shape: centroids are k rows — BROADCAST to every assignment,
  * so the data never shuffles for assignment; the update is one
  * explode(dim)-groupBy per round (shuffle of |data|·dim narrow rows —
  * at 100 TB you'd pre-aggregate partial (sum, count) per partition,
  * which Spark's map-side combine already does here). Per-round eager
  * localCheckpoint truncates the centroid lineage ([[Components]]'
  * discipline); the vector frame is persisted once and reused every
  * round. */
object KMeans {

  /** Final assignments → (id, cluster, dist2). `dist2` is the squared
    * L2 distance to the winning centroid, rounded to 9 decimals (the
    * same value the argmin ranked on). */
  def fixedIter(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): DataFrame = {
    require(k >= 2 && k <= 4096, s"k must be in [2, 4096]: $k")
    require(iters >= 1 && iters <= 20,
      s"iters must be in [1, 20]: $iters (fixed-round contract)")
    val data = graft.ManagedCache.swap("KMeans.data",
      df.select(col(idCol).as("id"),
          transform(col(vecCol), x => x.cast("double")).as("v"))
        .where(col("v").isNotNull && size(col("v")) > 0))
    // uniform-dimension gate (the refreshMinhash width discipline): a
    // ragged vector makes zip_with null-pad, rd2 go NULL, and the
    // ascending argmin (NULLS FIRST) CROWN the garbage distance — an
    // error beats a silent wrong assignment. One 1-row agg over the
    // frame the iterations cache anyway.
    val dims = data.agg(min(size(col("v"))).as("lo"),
      max(size(col("v"))).as("hi")).head()
    // NULL aggregates = zero usable rows after the null/empty-vector
    // filter: fall through to the (empty) assignment like pre-gate
    // code did, instead of NPE-ing inside the gate
    if (!dims.isNullAt(0)) {
      require(dims.getInt(0) == dims.getInt(1),
        s"ragged vector input: size($vecCol) ranges " +
          s"[${dims.getInt(0)}, ${dims.getInt(1)}] — k-means needs one " +
          "uniform dimension")
    }
    // id tie-break alongside the hash (the epochShuffle/rankSelect
    // discipline): a 48-bit hash-prefix collision — ~n²/2⁴⁹, material
    // at corpus scale — must not make the init order engine- or
    // partitioning-dependent
    val rankW = Window.orderBy(col("__hk"), col("id"))
    var cents = data
      .withColumn("__hk", Splits.hashKey(col("id"), "kmeans-init"))
      .orderBy(col("__hk"), col("id")).limit(k)
      .withColumn("c", row_number().over(rankW) - 1)
      .select(col("c"), col("v").as("cv"))
      .localCheckpoint(true)

    def assign(cs: DataFrame): DataFrame = {
      // sequential fold => engine-identical doubles; round 9 is what
      // the argmin ranks on, so a knife-edge between two centroids is
      // resolved identically everywhere (then the id tie-break)
      val d2 = aggregate(
        zip_with(col("v"), col("cv"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, z) => acc + z)
      val rw = Window.partitionBy("id").orderBy(col("rd2"), col("c"))
      data.crossJoin(broadcast(cs))
        .select(col("id"), col("v"), col("c"), round(d2, 9).as("rd2"))
        .withColumn("__rn", row_number().over(rw))
        .where(col("__rn") === 1)
        .select(col("id"), col("v"), col("c"), col("rd2"))
    }

    for (_ <- 1 to iters) {
      val asg = assign(cents)
      cents = asg.select(col("c"), posexplode(col("v")))
        .groupBy(col("c"), (col("pos") + 1).as("i"))
        .agg(round(avg(col("col")), 12).as("m"))
        .groupBy("c")
        .agg(array_sort(collect_list(struct(col("i"), col("m")))).as("s"))
        .select(col("c"), transform(col("s"), x => x("m")).as("cv"))
        .localCheckpoint(true)
    }
    assign(cents)
      .select(col("id"), col("c").as("cluster"), col("rd2").as("dist2"))
  }
}
