package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.Assertions._

import graft.operators.Dedup

/** Canary assertions shared by the Slow 100k battery
  * ([[ScaleCanarySpec]]) and its default-suite 20k cut
  * ([[MiniCanarySpec]]) — one implementation so the two scales cannot
  * drift apart on what "planted recall" means. */
object CanaryChecks {

  /** Ground truth per planted pair: exact bigram Jaccard computed
    * directly on the two texts — pairs at j ≥ theta are ELIGIBLE and
    * MinHash banding must recover every one of them. */
  def assertPlantedMinhashRecall(spark: SparkSession, docs: DataFrame,
      nDocs: Int, minTruth: Int): Unit = {
    import spark.implicits._
    val pl = SyntheticScale.plantedPairs(nDocs).toDF("doc_a", "doc_b")
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 2)
      .select(col("doc"), sort_array(col("sh")).as("sh"))
    val truth = pl
      .join(sets.select(col("doc").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sets.select(col("doc").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("j",
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          (size(col("sha")) + size(col("shb")) -
            size(array_intersect(col("sha"), col("shb")))))
      .where(col("j") >= 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size > minTruth,
      s"planted-pair ground truth implausibly small: ${truth.size}")
    val found = Dedup.minhashLshPairs(docs, "doc_id", "text", 2, 64, 4, 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truth -- found
    assert(missed.isEmpty,
      s"planted recall ${1.0 - missed.size.toDouble / truth.size}: " +
        s"missed ${missed.size}/${truth.size}, e.g. ${missed.take(5)}")
  }
}
