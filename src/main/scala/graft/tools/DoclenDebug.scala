package graft.tools

import org.apache.spark.sql.functions._

object DoclenDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("doclen-debug", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("dl-dbg").toString + "/ix"
    def dump(tag: String): Unit = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val metaP = new org.apache.hadoop.fs.Path(s"${path}__doclen/_bm25meta.json")
      val meta = if (fs.exists(metaP)) {
        val in = fs.open(metaP)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      } else "<none>"
      val dl = try spark.read.parquet(s"${path}__doclen").count() catch { case e: Exception => -1L }
      println(s"[dbg] $tag meta=$meta doclenRows=$dl")
    }
    val r1 = graft.pipeline.SilverIndex.refreshPostings(
      docs.where(col("doc_id") % 4 =!= 0), "doc_id", "text", path)
    println(s"[dbg] r1 appended=${r1.appended} total=${r1.total}"); dump("after r1")
    val r2 = graft.pipeline.SilverIndex.refreshPostings(docs, "doc_id", "text", path)
    println(s"[dbg] r2 appended=${r2.appended} total=${r2.total}"); dump("after r2")
    val (post, dlen, n, avg) = graft.pipeline.SilverIndex.bm25Index(spark, path)
    println(s"[dbg] bm25Index nDocs=$n avgLen=$avg doclen=${dlen.count()} postRows=${post.count()}")
    spark.stop()
  }
}
