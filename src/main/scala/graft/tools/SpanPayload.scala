package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measures the seed-join shuffle payload of [[Dedup.sharedSpans]]
  * (VERDICT r9 task 1a): the r9 operator joined positional 13-grams on
  * the RAW gram string — every corpus token crossing the wire ~13× as
  * string payload; r10 keys on xxhash64(gram) (8 bytes). This probe
  * runs BOTH shapes over the gate corpus (sf0.01 documents, the d10
  * embedded-span construction) and reports total shuffle-WRITE bytes
  * from stage metrics plus the analytic per-key sizes. Output committed
  * as tools/spanpayload_r10.txt. Not part of the driver contract. */
object SpanPayload {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.local("span-payload", 32)
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleWrite.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    docs.count()

    // analytic key sizes at L = 13 over the raw corpus
    val grams = docs.select(
      explode(graft.functions.word_shingles_all(col("text"), 13)).as("gram"))
    val Array(nGrams, avgBytes) = grams
      .agg(count(lit(1)).cast("double"), avg(octet_length(col("gram"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    println(f"[payload] gram rows            ${nGrams.toLong}%12d")
    println(f"[payload] avg gram string      $avgBytes%8.1f B vs 8 B hash " +
      f"(x${avgBytes / 8.0}%.1f per key)")

    def run(name: String)(df: => DataFrame): Unit = {
      spark.sparkContext.setJobGroup(name, name)
      shuffleWrite.set(0L)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      // listener events are posted asynchronously
      Thread.sleep(1500)
      println(f"[payload] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
        f"shuffleWrite ${shuffleWrite.get() / 1048576.0}%8.1f MiB")
    }

    def stringKeyed(df: DataFrame): DataFrame = stringKeyed2(df, "doc_id")

    // the r9 shape, reconstructed: raw-string seed key
    def stringKeyed2(df: DataFrame, id: String): DataFrame = {
      val g = df.select(col(id).as("doc"),
        posexplode(graft.functions.word_shingles_all(col("text"), 13))
          .as(Seq("pos", "gram")))
      val a = g.select(col("doc").as("doc_a"), col("pos").as("pos_a"),
        col("gram"))
      val b = g.select(col("doc").as("doc_b"), col("pos").as("pos_b"),
        col("gram"))
      a.join(b, "gram").where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("pos_a"), col("pos_b"))
    }

    // at gate sf the tiny gram frame broadcasts (no shuffle at all —
    // itself worth recording); the 100 TB question is the SMJ regime,
    // so force it and measure on the 100k-doc canary corpus where the
    // exchange is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    val big = SyntheticScale.docs(spark, 100000)
    val bigGrams = big.select(
      explode(graft.functions.word_shingles_all(col("text"), 13)).as("gram"))
    val Array(nBig, avgBig) = bigGrams
      .agg(count(lit(1)).cast("double"), avg(octet_length(col("gram"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    println(f"[payload] 100k-doc gram rows   ${nBig.toLong}%12d  avg string " +
      f"$avgBig%8.1f B vs 8 B hash (x${avgBig / 8.0}%.1f per key)")
    for (trial <- 1 to 2) {
      println(s"[payload] --- trial $trial (SMJ forced, 100k docs) ---")
      run("seed join, string key")(stringKeyed2(big, "doc_id"))
      run("seed join, hash key")(
        Dedup.sharedSpans(big, "doc_id", "text", minLen = 13))
    }
    spark.stop()
  }
}
