package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines, each designed
  * shuffle-first (no cross joins on the scale path):
  *
  *  - [[exact]]: hash-groupBy exact dedup.
  *  - [[jaccardPairs]]: exact n-gram-shingle Jaccard similarity join via
  *    shingle-explode + equi-join + group-count (|A∩B| from shared-shingle
  *    counts, |A∪B| = |A|+|B|−|A∩B|) — cost ∝ shared-shingle pairs, never
  *    materializes the n² matrix.
  *  - [[minhashLshPairs]]: MinHash signatures + banded LSH bucketing →
  *    candidate pairs → exact-Jaccard verification. The classic
  *    shingle→minhash→band→bucket-join pipeline; at 100 TB the bucket join
  *    replaces the quadratic candidate space with hash-partitioned buckets.
  *  - [[simhashPairs]]: 64-bit SimHash + pigeonhole banding on k-bit chunks
  *    (pairs within Hamming distance d share at least one of d+1 chunks).
  */
object Dedup {

  /** Exact dedup: one surviving row id per identical key, plus the
    * duplicate count. */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("dup_count"))

  /** Per-document distinct shingle sets (word n-grams). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc"), TextFunctions.wordShingles(col(textCol), n).as("sh"))

  /** Exact Jaccard ≥ θ pairs via distributed shingle join (no cross join).
    * Output: doc_a < doc_b, jaccard (double, int-ratio exact).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, theta: Double): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, n)
      .withColumn("sz", size(col("sh")))
    val ex = sets.select(col("doc"), col("sz"), explode(col("sh")).as("g"))
    val a = ex.alias("a")
    val b = ex.alias("b")
    val inter = a.join(b, col("a.g") === col("b.g") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .groupBy("doc_a", "doc_b", "sza", "szb")
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double"))
      .where(col("jaccard") >= theta)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash signature column: array of `numHashes` min-hashes of the
    * shingle set, using xxhash64(seed_i, shingle). Empty sets get
    * Long.MaxValue sentinels (never collide with real buckets). */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      coalesce(
        array_min(transform(sh, g => xxhash64(i, g))),
        lit(Long.MaxValue)))

  /** MinHash+LSH near-dup pairs with exact-Jaccard verification.
    *
    * @param numHashes signature length (bands * rowsPerBand)
    * @param rowsPerBand rows per LSH band
    * @param theta final exact-Jaccard threshold
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int, theta: Double): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val numBands = numHashes / rowsPerBand
    val sets = shingleSets(df, idCol, textCol, n)
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    // band key = (band index, hash of the band's signature slice)
    val banded = sets.select(col("doc"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)), b =>
        xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

    val a = banded.alias("a")
    val b = banded.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.sh").as("sha"), col("b.sh").as("shb"))
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .withColumn("jaccard", TextFunctions.arrayJaccard(col("sha"), col("shb")))
      .where(col("jaccard") >= theta)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash per document over distinct word n-gram shingles
    * (n=1 → plain tokens; n≥2 captures ordering like the Jaccard ops). */
  def simhashDocs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2): DataFrame = {
    val features =
      if (shingleN <= 1) array_distinct(TextFunctions.tokens(col(textCol)))
      else TextFunctions.wordShingles(col(textCol), shingleN)
    val toks = df.select(col(idCol).as("doc"), explode(features).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$bit")
    }
    val packed = (0 until 64).map { bit =>
      when(col(s"b$bit") > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    toks.groupBy(col("doc")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc"), packed.as("simhash"))
  }

  /** SimHash near-dup pairs within Hamming distance `maxDist`, found via
    * pigeonhole banding into `maxDist + 1` chunks. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, shingleN: Int = 2): DataFrame = {
    val numChunks = maxDist + 1
    val chunkBits = 64 / numChunks
    val docs = simhashDocs(df, idCol, textCol, shingleN)
    val chunked = docs.select(col("doc"), col("simhash"),
      posexplode(array((0 until numChunks).map { c =>
        shiftrightunsigned(col("simhash"), c * chunkBits)
          .bitwiseAND(lit((1L << chunkBits) - 1))
      }: _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "ckey")
    val a = chunked.alias("a")
    val b = chunked.alias("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.simhash").as("sha"), col("b.simhash").as("shb"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", graft.functions.TextFunctions.hamming64(col("sha"), col("shb")))
      .where(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
  }
}
