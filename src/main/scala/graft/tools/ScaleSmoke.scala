package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnnSearch, Blocking, Dedup, SimilarityJoin, SimilarityJoinConfig}

/** Scale-path smoke: drives the dedup/ANN operators on a seeded synthetic
  * corpus 20-100× the bench documents table, where the DIVERSE-vocabulary
  * (sparse) branches must engage — the opposite regime from the dense
  * sf0.1 corpus. Prints per-operator wall times and output counts; the
  * planted near-dup pairs are the recall canary.
  *
  * Run: `sbt "runMain graft.tools.ScaleSmoke [nDocs]"` (default 100000).
  * Heap: local-mode executors live in the sbt JVM, so
  * `spark.driver.memory` set via builder config is a no-op — for the
  * 1M-doc runs pass the heap to sbt itself, e.g.
  * `sbt -J-Xmx8g "runMain graft.tools.ScaleSmoke 1000000"`.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // seeded corpus: 40-80 words from a 50k vocab; every 100th doc is a
    // near-dup of its predecessor with one word changed
    val rnd = new scala.util.Random(42)
    val vocab = Array.tabulate(50000)(i => s"w${i}x${i % 97}")
    val rows = new Array[(Long, String)](nDocs)
    var i = 0
    while (i < nDocs) {
      if (i % 100 == 99 && i > 0) {
        val words = rows(i - 1)._2.split(" ")
        words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.length))
        rows(i) = (i.toLong, words.mkString(" "))
      } else {
        val len = 40 + rnd.nextInt(41)
        rows(i) = (i.toLong,
          Array.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      i += 1
    }
    val s = spark
    import s.implicits._
    val docs = spark.createDataset(rows.toSeq).toDF("doc_id", "text")
      .repartition(64).cache()
    docs.count()

    // deterministic synthetic embeddings, 64-dim, built executor-side
    val emb = spark.range(nDocs.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (pmod(xxhash64(col("id"), j), lit(2000L)).cast("double") - 1000.0) / 1000.0)
        .as("embedding"))
      .repartition(64).cache()
    emb.count()

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[scale] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val planted = nDocs / 100
    println(s"[scale] corpus: $nDocs docs, ~$planted planted near-dup pairs")
    time("exact_dedup")(Dedup.exact(docs, "text", "doc_id"))
    // exact Jaccard's candidate space grows with Σf²; past 500k synthetic
    // docs the sketch operators are the point of the run
    if (nDocs <= 500000)
      time("jaccard_pairs(sparse)")(
        Dedup.jaccardPairs(docs, "doc_id", "text", n = 2, theta = 0.5))
    time("minhash_lsh")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 2, 64, 4, 0.5))
    time("simhash_pairs")(
      Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 7))
    // char grams on this synthetic corpus (tiny char alphabet) are the
    // degenerate exact regime — ~all pairs share a gram, so cost is
    // inherently quadratic; skip at the largest sizes
    if (nDocs <= 100000)
      time("char_jaccard(sparse)")(
        Dedup.charJaccardPairs(docs, "doc_id", "text", q = 4, theta = 0.6))
    time("ann_lsh_topk")(
      AnnSearch.lshTopK(emb.where(col("vec_id") % 1000 === 0), emb,
        "vec_id", "embedding", k = 5, bits = 12, tables = 8, probeHamming = 1))
    time("ann_ivf_topk")(
      AnnSearch.ivfTopK(emb.where(col("vec_id") % 1000 === 0), emb,
        "vec_id", "embedding", k = 5, nlist = 64, nprobe = 8))

    // similarity join: 100k payroll rows over a ~2.5k-title vocabulary vs
    // 5k postings with injected typos — the reference's workload shape at
    // 20× its distinct-title cardinality, Token (shuffle) blocking
    val adjs = Array("senior", "junior", "lead", "principal", "staff",
      "associate", "assistant", "deputy")
    val nouns = Array("software", "data", "systems", "network", "security",
      "budget", "policy", "program", "project", "operations")
    val roles = Array("engineer", "analyst", "manager", "director",
      "specialist", "coordinator", "administrator", "architect")
    val grades = Array("i", "ii", "iii")
    def mkTitle(): String =
      s"${adjs(rnd.nextInt(adjs.length))} ${nouns(rnd.nextInt(nouns.length))} " +
        roles(rnd.nextInt(roles.length)) +
        (if (rnd.nextInt(4) == 0) " " + grades(rnd.nextInt(3)) else "")
    def typo(s: String): String = {
      val i = 1 + rnd.nextInt(s.length - 2)
      if (rnd.nextBoolean()) s.substring(0, i) + s.substring(i + 1) // drop
      else s.substring(0, i) + s.charAt(i - 1) + s.substring(i) // double
    }
    val payroll = spark.createDataset(
      (0 until nDocs).map(i => (i.toLong, mkTitle(), 40000.0 + rnd.nextInt(120000)))
    ).toDF("pay_id", "pay_title", "base_salary").repartition(64).cache()
    payroll.count()
    val jobs = spark.createDataset(
      (0 until nDocs / 20).map { i =>
        val base = mkTitle()
        (i.toLong, if (i % 3 == 0) typo(base) else base)
      }).toDF("job_id", "job_title").repartition(16).cache()
    jobs.count()
    time("similarity_join(token)")(SimilarityJoin(jobs, payroll,
      SimilarityJoinConfig(leftKey = "job_title", rightKey = "pay_title",
        preThreshold = 85, scoreThreshold = 85, blocking = Blocking.Token,
        topKPerLeft = Some(5), topKTieBreak = Seq(col("pay_id")))))

    // round-3 kernels: distributed prefix sum / packing, hash splits,
    // exact quantiles by order statistics — all linear-shaped.
    // Aggregate over the COMPUTED columns: a bare count() would let
    // ColumnPruning strip the very expressions being timed (the md5
    // keys, the prefix-sum window) and time an empty scan instead.
    time("token_packing")(graft.operators.Packing.packByTokenBudget(
      docs.select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens")),
      Seq("doc_id"), "n_tokens", budget = 4096L)
      .groupBy(col("pack_id")).agg(sum(col("cum_before"))))
    time("hash_split")(graft.operators.Splits.assignSplit(
      docs.select(col("doc_id")), "doc_id", "scale",
      Seq("val" -> 0.1, "test" -> 0.1, "train" -> 0.8))
      .groupBy(col("split")).count())
    time("exact_quantiles")(graft.operators.Quantiles.exactQuantiles(
      payroll.withColumn("grade", pmod(xxhash64(col("pay_id")), lit(8L))),
      Seq("grade"), "base_salary", Seq(0.25, 0.5, 0.75, 0.99)))
    spark.stop()
  }
}
