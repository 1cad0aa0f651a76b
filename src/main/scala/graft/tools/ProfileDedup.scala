package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Scratch profiler: times dedup sub-phases at a given SF dir so
  * optimization targets measurements, not guesses. Not part of the driver
  * contract. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val d = df
      d.write.format("noop").mode("overwrite").save()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warmup
    docs.select(count(lit(1))).write.format("noop").mode("overwrite").save()

    time("tokens")(docs.select(TextFunctions.tokens(col("text")).as("t")))
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 2)
      .withColumn("sz", size(col("sh"))).where(col("sz") > 0)
    time("shingleSets")(sets)
    val ex = sets.select(col("doc"), col("sz"), explode(col("sh")).as("g"))
    time("explode+freq")(ex.groupBy("g").agg(count(lit(1)).as("gdf")))
    val freq = ex.groupBy("g").agg(count(lit(1)).as("gdf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("gdf").asc, col("g").asc)
    val theta = 0.5
    val prefix = ex.join(freq, "g")
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= (col("sz") - ceil(lit(theta) * col("sz")) + 1).cast("int"))
      .select(col("doc"), col("sz"), col("g"))
    time("prefix")(prefix)
    val a = prefix.alias("a"); val b = prefix.alias("b")
    val candsRaw = a.join(b,
      col("a.g") === col("b.g") && col("a.doc") < col("b.doc") &&
        col("a.sz") >= ceil(lit(theta) * col("b.sz")) &&
        col("b.sz") >= ceil(lit(theta) * col("a.sz")))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
    time("cand join (pre-distinct)")(candsRaw)
    println(s"[profile] raw candidate rows = ${candsRaw.count()}")
    val cands = candsRaw.distinct()
    println(s"[profile] distinct candidate pairs = ${cands.count()}")
    time("cand distinct")(cands)
    time("d2 full")(Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.5))

    time("minhash sig")(sets.repartition(col("doc"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 64)))
    time("d3 full")(Dedup.minhashLshPairs(docs, "doc_id", "text", 2, 64, 4, 0.5))

    time("simhash docs")(Dedup.simhashDocs(docs, "doc_id", "text", 2))
    time("d4 full")(Dedup.simhashPairs(docs, "doc_id", "text", 7, 2))

    spark.stop()
  }
}
