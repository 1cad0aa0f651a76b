package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Seeded synthetic corpora for the scale smoke and the asserted scale
  * canary suite (ScaleCanarySpec) — one definition so the suite asserts
  * against EXACTLY the corpus the smoke measures.
  *
  * All generators are deterministic (fixed seeds / executor-side xxhash
  * formulas), so canary assertions are stable run-to-run.
  */
object SyntheticScale {

  /** Diverse-vocabulary doc corpus: 40–80 words from a 50k vocab; every
    * 100th doc is a near-dup of its predecessor with ONE word changed —
    * the planted pairs are the recall canary. Cached + materialized. */
  def docs(spark: SparkSession, nDocs: Int, seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
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
    val df = spark.createDataset(rows.toSeq).toDF("doc_id", "text")
      .repartition(64).cache()
    df.count()
    df
  }

  /** Planted near-dup ids: (i-1, i) for every 100th doc. */
  def plantedPairs(nDocs: Int): Seq[(Long, Long)] =
    (99 until nDocs by 100).filter(_ > 0).map(i => ((i - 1).toLong, i.toLong))

  /** Boilerplate-heavy corpus — the adversarial shape for
    * [[graft.operators.Dedup.sharedSpans]]'s seed join: every doc opens
    * with the SAME 30-word license header (whose all-header 13-grams
    * are corpus-hot: one occurrence per doc), followed by a 40-word
    * doc-unique tail; every 200th doc is a near-dup of its predecessor
    * (same tail, ONE word substituted at tail position 20), and the
    * last two ids are degenerate "a a a …" docs (500 tokens — a single
    * 13-gram occurring ~488× in EACH, the f_a·f_b hot case). Without a
    * gram-occurrence ceiling the header alone seeds 18 · n²/2 matches;
    * with one, only the per-pair unique spans survive. */
  def boilerplateDocs(spark: SparkSession, nDocs: Int): DataFrame = {
    val header = Array.tabulate(30)(j => s"lic${j}hdr").mkString(" ")
    val rows = new Array[(Long, String)](nDocs + 2)
    var i = 0
    while (i < nDocs) {
      val tail =
        if (i % 200 == 199 && i > 0) {
          val w = rows(i - 1)._2.split(" ").drop(30)
          w(20) = s"sub${i}x"
          w.mkString(" ")
        } else Array.tabulate(40)(j => s"d${i}w$j").mkString(" ")
      rows(i) = (i.toLong, s"$header $tail")
      i += 1
    }
    rows(nDocs) = (nDocs.toLong, Array.fill(500)("a").mkString(" "))
    rows(nDocs + 1) = ((nDocs + 1).toLong, Array.fill(500)("a").mkString(" "))
    val s = spark
    import s.implicits._
    val df = spark.createDataset(rows.toSeq).toDF("doc_id", "text")
      .repartition(64).cache()
    df.count()
    df
  }

  /** Deterministic 64-dim embeddings, built executor-side. */
  def embeddings(spark: SparkSession, n: Long): DataFrame = {
    val df = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (pmod(xxhash64(col("id"), j), lit(2000L)).cast("double") - 1000.0)
          / 1000.0)
        .as("embedding"))
      .repartition(64).cache()
    df.count()
    df
  }

  /** Reference-shaped title tables: `nPay` payroll rows over a ~2.5k-title
    * vocabulary, `nJobs` postings of which every third carries a typo.
    * Returns (payroll, jobs), both cached + materialized. */
  def titleTables(spark: SparkSession, nPay: Int, nJobs: Int,
      seed: Long = 7L): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
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
    val s = spark
    import s.implicits._
    val payroll = spark.createDataset(
      (0 until nPay).map(i =>
        (i.toLong, mkTitle(), 40000.0 + rnd.nextInt(120000)))
    ).toDF("pay_id", "pay_title", "base_salary").repartition(64).cache()
    payroll.count()
    val jobs = spark.createDataset(
      (0 until nJobs).map { i =>
        val base = mkTitle()
        (i.toLong, if (i % 3 == 0) typo(base) else base)
      }).toDF("job_id", "job_title").repartition(16).cache()
    jobs.count()
    (payroll, jobs)
  }

  /** Component-structured edge frame, generated EXECUTOR-SIDE: nodes
    * 0..n-1 in components of `k` consecutive ids (ground-truth root of
    * id = (id/k)*k). Within each component every non-base node links to
    * a deterministic pseudo-random EARLIER node — a random recursive
    * tree, the low-diameter shape of real near-dup clusters — except
    * the LAST component, which links sequentially: one chain of length
    * k-1, the worst-case diameter for propagation-style algorithms.
    * Edge count = n - n/k. */
  def componentEdges(spark: SparkSession, n: Long, k: Int): DataFrame = {
    val base = col("id") - pmod(col("id"), lit(k.toLong)) // exact int math
    val off = col("id") - base
    val lastBase = ((n - 1) / k) * k
    spark.range(n).where(col("id") % k =!= 0)
      .select(col("id").as("doc_a"),
        when(lit(lastBase) === base, col("id") - 1) // the planted chain
          .otherwise(base + pmod(xxhash64(col("id")), off)).as("doc_b"))
  }

  /** Planted-hot-token skew tables at a parameterizable scale — the
    * simjoin skew stage's shape: `hotLeft` of `nLeft` left keys and
    * `hotRight` of `nRight` right keys share the hot token (the hot
    * bucket is hotLeft×hotRight candidates), and the last `planted`
    * right keys are EXACT copies of left keys 0..planted-1 so result
    * identity is asserted on a non-empty match set. Executor-side
    * deterministic. Returns (left, right). */
  def skewTables(spark: SparkSession, nLeft: Int, nRight: Int,
      hotLeft: Int, hotRight: Int, planted: Int): (DataFrame, DataFrame) = {
    val hot = "metropolitan"
    def leftKeyExpr(id: Column): Column =
      when(id < hotLeft, concat(lit(s"$hot area"), id,
        lit(" post"), (id * 11 + 5).cast("string")))
        .otherwise(concat(lit("area"), id, lit(" post"),
          (id * 11 + 5).cast("string"), lit(" beat"),
          (id * 13 + 7).cast("string")))
    val right = spark.range(nRight.toLong).select(
      when(col("id") < hotRight, concat(lit(s"$hot zone"), col("id"),
        lit(" sec"), (col("id") * 7 + 3).cast("string")))
        .when(col("id") >= (nRight - planted).toLong,
          leftKeyExpr(col("id") - (nRight - planted).toLong))
        .otherwise(concat(lit("zone"), col("id"), lit(" sec"),
          (col("id") * 7 + 3).cast("string"), lit(" ward"),
          (col("id") * 3 + 1).cast("string")))
        .as("pay_title"))
      .repartition(64).cache()
    right.count()
    val left = spark.range(nLeft.toLong)
      .select(leftKeyExpr(col("id")).as("job_title"))
      .repartition(8).cache()
    left.count()
    (left, right)
  }
}
