package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Drift gate for the no-oracle queries (VERDICT r4 tasks 1+8): the
  * driver's correctness gate sees only row counts for these, so `sbt
  * test` pins the [[GoldenHash]] content hash of each full result at
  * sf0.001. A wrong-but-same-cardinality regression (e.g. a broken
  * WRatio edge, an LSH banding bug that still emits 50 rows) fails here
  * instead of surviving until a judge round.
  *
  * The pinned values live in GOLDENS.json (with their sf0.01
  * counterparts, which the driver-run Verify parquet carries in its
  * `content_hash` column). After an INTENDED semantic change: re-run
  * `sbt "runMain graft.tools.GoldenDump"`, eyeball the diff, update
  * GOLDENS.json and these constants together.
  */
class GoldenHashSpec extends SparkTestBase {

  private val pinnedSf0001 = Map(
    "a10_ann_ivfpq" -> (50L, "1af51358e9ee08ab"),
    // 5 rows since r10: + ivfpq_codes_decide (rescoreMult=1 — the
    // PQ code/ADC stage decides the output, so code drift moves the
    // pinned value even though a10's deep-rescore hash equals a3's)
    "a11_ann_contracts" -> (5L, "76e20e05cbbbd406"),
    "a12_knn_join" -> (1500L, "57d2fc79acdec69e"),
    // INTENTIONALLY equal to a12's hash: the auto-dispatcher picking a
    // different join strategy must never change a row (AnnSpec pins the
    // decision rule and the partitioned regime)
    "a14_knn_auto" -> (1500L, "57d2fc79acdec69e"),
    "a2_ann_lsh" -> (50L, "6b243e12a60eee0a"),
    "a3_ann_ivf" -> (50L, "1af51358e9ee08ab"),
    "a4_neardup_lsh" -> (5L, "31b91f09d61ba1c1"),
    "a5_ann_recall" -> (2L, "53a52499814a2b46"),
    "a6_incr_ivf" -> (50L, "fb1f0e7b543084a7"),
    "a9_ann_pq" -> (50L, "9b30196313781817"),
    // learned merge table (32 rounds, 2048-doc hash sample) — training
    // drift (sample, tie-break, counting) moves the pin; BpeTrainSpec
    // holds the hand-computed truth + the structural invariant
    "c18_bpe_train" -> (32L, "3ae1eef05d46f2f0"),
    // the a5-shape recall contract of the banded semantic-decontam
    // path vs c28's exact flags (recall 0.9722 ≥ floor 0.7, zero false
    // pairs — r17); banding, densify, or verify drift moves the pin
    "c30_semantic_lsh_recall" -> (1L, "fbffb956dfb95a0c"),
    // the same contract row SERVED FROM THE PERSISTED INDEX (c31, r18)
    // — identical counts to c30 by the serve ≡ scratch-banding
    // equality SilverIndexSpec pins; only the method label differs, so
    // the hash differs while every number matches
    "c31_semantic_index_recall" -> (1L, "1b81ab36569fdf7c"),
    "d4_simhash_pairs" -> (26L, "d915b0b484a83525"),
    "d9_semdedup" -> (497L, "e092d07e88b87eeb"),
    // the a5-shape recall contract of the stored-TF-IDF knnJoin scale
    // path vs h2's exact rows (recall 0.9133 ≥ floor 0.7 —
    // tools/h3_recall_r11.txt); a dispatch or bucketing drift moves
    // the pinned recall
    "h3_text_knn_scale" -> (1L, "fda2dea7d3d0cfa6"),
    // the byte-bound twin: same sampled queries through knnJoinIvfPq
    // (recall 0.9133 ≥ floor 0.7 — tools/h4_recall_r12.txt); PQ code,
    // ADC, or rescore-depth drift moves the pinned recall
    "h4_text_knn_pq" -> (1L, "4cfbaaa7967a7370"),
    "j2_simjoin_fuzzy" -> (632L, "5a4d83a7da164979"),
    // the streaming face's accumulated pairs — exactly the banded
    // operator's 35 flags at sf0.001 (exactly-once emission,
    // SilverIndexSpec); a protocol or banding drift moves the pin
    "s19_stream_semantic_lsh" -> (35L, "adce41c34df72daa"))

  test("digest is partitioning/order independent; pair boundaries don't collide") {
    val s = spark
    import s.implicits._
    val df = Seq(("1b=2", "3"), ("1", "2b=3"), ("x", "y")).toDF("a", "b")
    def hashOf(d: org.apache.spark.sql.DataFrame): String =
      GoldenHash.withContentHash(d).select(GoldenHash.column)
        .head().getString(0)
    // same rows, any physical layout -> same digest
    assert(hashOf(df) == hashOf(df.repartition(7)))
    assert(hashOf(df) == hashOf(df.orderBy(org.apache.spark.sql.functions.desc("b"))))
    // values that would be byte-identical without a pair separator
    // ("a=1b=2" + "b=3" vs "a=1" + "b=2b=3") digest differently
    assert(hashOf(Seq(("1b=2", "3")).toDF("a", "b")) !=
      hashOf(Seq(("1", "2b=3")).toDF("a", "b")))
    // NULL digests differently from an empty string
    assert(hashOf(Seq((null.asInstanceOf[String], "y")).toDF("a", "b")) !=
      hashOf(Seq(("", "y")).toDF("a", "b")))
  }

  test("the hashed set IS the no-oracle set (no query escapes both gates)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == SparkEntry.noOracleHashed)
    assert(pinnedSf0001.keySet == SparkEntry.noOracleHashed)
  }

  // the driver's CORRECTNESS gate runs at sf0.01 — pin that scale too so
  // a drift visible only at the gate's scale still fails sbt test
  private val pinnedSf01 = Map(
    "a10_ann_ivfpq" -> "b604970f3c6f060e",
    "a11_ann_contracts" -> "8c37efc4c77d90d9",
    "a12_knn_join" -> "dc8528fe358dab26",
    "a14_knn_auto" -> "dc8528fe358dab26", // == a12, see sf0.001 note
    "a2_ann_lsh" -> "221d7e490852c370",
    "a3_ann_ivf" -> "b604970f3c6f060e",
    "a4_neardup_lsh" -> "33464f57b6c9d31e",
    "a5_ann_recall" -> "3ba15df77338632d",
    "a6_incr_ivf" -> "635a548f0b12b371",
    "a9_ann_pq" -> "1ba543ab527ee29a",
    "c18_bpe_train" -> "eed8080744ca685a",
    "d4_simhash_pairs" -> "c015e8e4ac029638",
    "d9_semdedup" -> "f023a2b1aec517f2",
    "h3_text_knn_scale" -> "986470c5970ba7e5",
    "h4_text_knn_pq" -> "545aae7504ec8fa9",
    "j2_simjoin_fuzzy" -> "53f9c25d8c7976b7")

  test("sf0.01 content hashes match GOLDENS.json (the driver-gate scale)") {
    for ((name, hash) <- pinnedSf01.toSeq.sortBy(_._1)) {
      val got = SparkEntry.hashedQuery(name)(spark, sf("sf0.01"))
        .select(GoldenHash.column).head().getString(0)
      assert(got == hash, s"sf0.01 content drift in $name")
    }
  }

  for ((name, (rows, hash)) <- pinnedSf0001.toSeq.sortBy(_._1))
    test(s"$name content pinned at sf0.001: $rows rows, hash $hash") {
      val df = SparkEntry.hashedQuery(name)(spark, sf())
      val hashes = df.select(GoldenHash.column).distinct().collect()
        .map(_.getString(0)).toSeq
      // every row carries the digest of the WHOLE result, so exactly one
      // distinct value — and it must be the committed golden
      assert(hashes == Seq(hash),
        s"content drift in $name: got $hashes, pinned $hash — if the " +
          "change is intended, regenerate with graft.tools.GoldenDump")
      assert(df.count() == rows)
    }
}
