package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Blocking, SimilarityJoin, SimilarityJoinConfig}

/** Scratch profiler for the similarity join's phases at ScaleSmoke size. */
object ProfileSimJoin {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rnd = new scala.util.Random(42)
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
      if (rnd.nextBoolean()) s.substring(0, i) + s.substring(i + 1)
      else s.substring(0, i) + s.charAt(i - 1) + s.substring(i)
    }
    val s = spark
    import s.implicits._
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

    def time(name: String)(df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[simjoin] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
      n
    }

    val cfg = SimilarityJoinConfig(leftKey = "job_title", rightKey = "pay_title",
      preThreshold = 85, scoreThreshold = 85, blocking = Blocking.Token,
      topKPerLeft = Some(5), topKTieBreak = Seq(col("pay_id")))

    import graft.functions.normalizeTitleCol
    val distinctL = jobs.select(col("job_title").as("key_l")).where(col("key_l").isNotNull)
      .distinct().withColumn("nl", normalizeTitleCol(col("key_l")))
    val distinctR = payroll.select(col("pay_title").as("key_r")).where(col("key_r").isNotNull)
      .distinct().withColumn("nr", normalizeTitleCol(col("key_r")))
    time("distinct_left")(distinctL)
    time("distinct_right")(distinctR)
    val lt = distinctL.withColumn("__tok", explode(array_distinct(split(col("nl"), " "))))
      .where(col("__tok") =!= "")
    val rt = distinctR.withColumn("__tok", explode(array_distinct(split(col("nr"), " "))))
      .where(col("__tok") =!= "")
    val joined = lt.join(rt, "__tok").drop("__tok")
    time("token_join_raw")(joined)
    val cand = joined.dropDuplicates("key_l", "key_r")
    time("cand_dedup")(cand)
    val pre = cand.where(graft.functions.token_set_ratio(col("nl"), col("nr")) >= 85)
    time("prefilter_tsr")(pre)
    val scored = pre.withColumn("score", graft.functions.wratio(col("nl"), col("nr")))
      .where(col("score") >= 85)
    time("scored_pairs")(scored)
    time("full_join")(SimilarityJoin(jobs, payroll, cfg))
    spark.stop()
  }
}
