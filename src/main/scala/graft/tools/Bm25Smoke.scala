package graft.tools

import org.apache.spark.sql.functions._

/** 1M-doc smoke for the ad-hoc (few-term) BM25 path: one query against a
  * corpus it has never indexed, narrow formulation vs building the
  * postings first. Also checks rank parity between the two.
  *   sbt "runMain graft.tools.Bm25Smoke [nDocs]"
  */
object Bm25Smoke {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.fold(1000000)(_.toInt)
    val spark = graft.Sessions.local("bm25-smoke", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = SyntheticScale.docs(spark, nDocs)
    val query = "w100x3 w200x6 w300x9 w17x17"
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bm25smoke] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass (nDocs=$nDocs)")
      graft.ManagedCache.release("TextSearch.bm25FewTerms")
      graft.ManagedCache.release("TextSearch.bm25TopK")
      val narrow = timed("narrow few-term top-20 (total)") {
        graft.operators.TextSearch
          .bm25TopK(docs, "doc_id", "text", query, k = 20).collect()
      }
      val post = timed("postings build (explode+agg)") {
        val p = graft.ManagedCache.swap("Bm25Smoke.post",
          graft.operators.TextSearch.postings(docs, "doc_id", "text"))
        p.count(); p
      }
      val viaPost = timed("query from built postings") {
        graft.operators.TextSearch
          .bm25TopKFromPostings(post, query, k = 20).collect()
      }
      graft.ManagedCache.release("Bm25Smoke.post")
      val parity = narrow.map(r => (r.getLong(0), r.getInt(2))).toSeq ==
        viaPost.map(r => (r.getLong(0), r.getInt(2))).toSeq
      println(s"[bm25smoke] rank parity narrow==postings: $parity " +
        s"(top doc ${narrow.headOption.map(_.getLong(0))})")
      require(parity, "rank parity failed")

      // the PERSISTED index path: build once (postings + doclen
      // companion + stats sidecar), then query with zero corpus-wide
      // aggregation and a pushed term predicate
      val path = java.nio.file.Files
        .createTempDirectory("bm25-smoke").toString + "/ix"
      timed("SilverIndex.refreshPostings") {
        graft.pipeline.SilverIndex.refreshPostings(docs, "doc_id", "text", path)
      }
      val fromIx = timed("query from persisted index") {
        graft.pipeline.SilverIndex
          .bm25TopKFromIndex(spark, path, query, k = 20).collect()
      }
      val fromIx2 = timed("query from persisted index (2nd)") {
        graft.pipeline.SilverIndex
          .bm25TopKFromIndex(spark, path, "w42x42 w777x0 w1234x68", k = 20)
      }
      fromIx2.count()
      val ixParity = narrow.map(r => (r.getLong(0), r.getInt(2))).toSeq ==
        fromIx.map(r => (r.getLong(0), r.getInt(2))).toSeq
      println(s"[bm25smoke] rank parity narrow==index: $ixParity")
      require(ixParity, "index rank parity failed")
    }
    spark.stop()
  }
}
